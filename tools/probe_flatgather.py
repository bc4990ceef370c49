"""Probe: res-grouped kernel with ONE flat gather + reshape vs the
production per-group (64 separate gathers) kernel.  Checks bit-equality and
loop-dispatch timing on the golden grid."""

import sys
import time
import pathlib
from functools import partial

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from bench import load_workload, build_columns, build_host_pool


def main():
    t, _ = load_workload()
    b, pool_size, _ = build_columns(t)
    host_pool = build_host_pool(b, pool_size)

    from paffy_tpu.jaxconf import ensure_jax
    ensure_jax()
    import jax
    import jax.numpy as jnp
    from paffy_tpu.ops.tiled import (build_packed2_chunk_batch,
                                     build_packed2_pools, build_res_grouped,
                                     _packed2_res_counts_scatter, W2, STEP2,
                                     N_PHASE2, LOG_STEP2, LOGW2)
    from paffy_tpu.ops.mismatch_device import build_ext_pool

    pool = jax.device_put(host_pool)
    pool.block_until_ready()
    ext = build_ext_pool(pool)
    packed2d, pviews = build_packed2_pools(ext)
    packed2d.block_until_ready()
    cb = build_packed2_chunk_batch(b, len(t), pool_len=pool.shape[0])
    g = build_res_grouped(cb)
    print(f"grid {cb.n_chunks} chunks, groups 64 x {g.gp}", file=sys.stderr)

    @partial(jax.jit, static_argnames=("u_pad",))
    def flat_counts(packed2d, pviews, trow, qwin, qpar, col_a, col_b,
                    inv, rec_chunk_off, u_pad):
        """Identical math to _packed2_res_counts but with ONE gather per
        side over the flattened grouped grid."""
        r_v = pviews.shape[0] // (4 * N_PHASE2)
        gp = trow.shape[1]
        lane4 = 4 * jnp.arange(W2, dtype=jnp.int32)[None, :]
        trow_f = trow.reshape(-1)
        qwin_f = qwin.reshape(-1)
        qpar_f = qpar.reshape(-1).astype(jnp.int32)
        c = (qwin_f & (W2 - 1)) >> LOG_STEP2
        r = jnp.clip(qwin_f >> LOGW2, 0, r_v - 1)
        tb = packed2d[trow_f].reshape(STEP2, gp, W2)
        win = pviews[(qpar_f * N_PHASE2 + c) * r_v + r].reshape(
            STEP2, gp, -1)
        m_groups, v_groups = [], []
        for gi in range(STEP2):
            a = col_a[gi].astype(jnp.int32)[:, None]
            bb = col_b[gi].astype(jnp.int32)[:, None]
            x = tb[gi] ^ jax.lax.slice_in_dim(win[gi], gi, gi + W2, axis=1)
            m_ = jnp.zeros(x.shape, jnp.int32)
            for j in range(4):
                eq = (x & jnp.uint8(0x03 << (2 * j))) == 0
                m_ = m_ + (eq & (lane4 + j >= a)
                           & (lane4 + j < bb)).astype(jnp.int32)
            m_groups.append(jnp.sum(m_, axis=1, dtype=jnp.int32))
            v_groups.append(jnp.maximum(bb[:, 0] - a[:, 0], 0))
        m_flat = jnp.concatenate(m_groups)
        v_flat = jnp.concatenate(v_groups)
        m_rec = jnp.zeros(u_pad + 1, jnp.int32).at[inv].add(
            m_flat, mode="drop")[:u_pad]
        v_rec = jnp.zeros(u_pad + 1, jnp.int32).at[inv].add(
            v_flat, mode="drop")[:u_pad]
        zero = jnp.zeros(1, dtype=jnp.int32)
        cm = jnp.concatenate([zero, jnp.cumsum(m_rec)])
        cv = jnp.concatenate([zero, jnp.cumsum(v_rec)])
        bounds = jnp.clip(rec_chunk_off, 0, u_pad)
        m = cm[bounds[1:]] - cm[bounds[:-1]]
        tot = cv[bounds[1:]] - cv[bounds[:-1]]
        return m, tot - m

    cargs = (jnp.asarray(g.trow), jnp.asarray(g.qwin), jnp.asarray(g.qpar),
             jnp.asarray(g.col_a), jnp.asarray(g.col_b), jnp.asarray(g.inv),
             jnp.asarray(cb.rec_chunk_off))
    m0, x0 = _packed2_res_counts_scatter(packed2d, pviews, *cargs, u_pad=cb.u_pad)
    m1, x1 = flat_counts(packed2d, pviews, *cargs, u_pad=cb.u_pad)
    same = (np.array_equal(np.asarray(m0), np.asarray(m1))
            and np.array_equal(np.asarray(x0), np.asarray(x1)))
    print(f"bit-equal: {same}")
    assert same

    def timeit(fn, iters=40):
        @partial(jax.jit, static_argnames=("iters", "u_pad"))
        def loop(p2d, pv, trow, qwin, qpar, col_a, col_b, inv, rco, iters,
                 u_pad):
            def body(i, acc):
                m, _ = fn.__wrapped__(
                    p2d, pv, jnp.roll(trow, i, axis=1),
                    jnp.roll(qwin, i, axis=1), jnp.roll(qpar, i, axis=1),
                    jnp.roll(col_a, i, axis=1), jnp.roll(col_b, i, axis=1),
                    inv, rco, u_pad)
                return acc + jnp.sum(m.astype(jnp.float32))
            return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
        float(loop(packed2d, pviews, *cargs, iters=iters, u_pad=cb.u_pad))
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(loop(packed2d, pviews, *cargs, iters=iters, u_pad=cb.u_pad))
            ts.append(time.time() - t0)
        return min(ts) / iters

    dt0 = timeit(_packed2_res_counts_scatter)
    dt1 = timeit(flat_counts)
    print(f"production (64 gathers): {dt0*1e3:.2f} ms "
          f"-> {b.n_cols/dt0/1e9:.2f} Gcol/s")
    print(f"flat (1 gather/side):    {dt1*1e3:.2f} ms "
          f"-> {b.n_cols/dt1/1e9:.2f} Gcol/s")


if __name__ == "__main__":
    main()

"""Ablation of the production residual-grouped 2-bit compare kernel on the
golden grid: attribute every millisecond of the ~10 ms kernel to gathers,
compare, and scatter/segment-reduce — the bench methodology (N executions
inside ONE fori_loop dispatch, rotated inputs, min of 3).

Variants (each a strict subset of the full kernel's work):
  gathers   — the two row gathers only (byte sums defeat DCE)
  compare   — + xor + 4-subcolumn masked popcount + per-chunk sum
  full_scatter — + inv scatter + cumsum + segment diff (round-4 production)
  full      — + per-group cumsum + boundary gather (round-5 production)

Usage: python tools/probe_ablate.py [--iters 40]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args(argv)

    import bench
    from paffy_tpu.jaxconf import ensure_jax
    ensure_jax()
    import jax
    import jax.numpy as jnp
    from functools import partial
    from paffy_tpu.ops.tiled import (LOG_STEP2, N_PHASE2, STEP2, W2, LOGW2,
                                     build_packed2_chunk_batch,
                                     build_packed2_pools, build_res_grouped,
                                     _packed2_res_counts,
                                     _packed2_res_counts_scatter)
    from paffy_tpu.ops.mismatch import build_ext_pool
    t, _text = bench.load_workload()
    b, pool_size, _name_off = bench.build_columns(t)
    host_pool = bench.build_host_pool(b, pool_size)

    pool = jax.device_put(host_pool)
    pool.block_until_ready()
    ext = build_ext_pool(pool)
    packed2d, pviews = build_packed2_pools(ext)
    packed2d.block_until_ready()
    cb = build_packed2_chunk_batch(b, len(t), pool_len=pool.shape[0])
    g = build_res_grouped(cb)
    pad = (STEP2 * g.gp - cb.n_chunks) / cb.n_chunks
    print(f"grid: {cb.n_chunks} chunks, {b.n_cols/1e6:.1f}M cols, "
          f"res-grouped 64 x {g.gp} (+{pad:.1%} pad)", flush=True)
    cargs = (jnp.asarray(g.trow), jnp.asarray(g.qwin), jnp.asarray(g.qpar),
             jnp.asarray(g.col_a), jnp.asarray(g.col_b), jnp.asarray(g.inv),
             jnp.asarray(cb.rec_chunk_off))

    r_v = pviews.shape[0] // (4 * N_PHASE2)
    lane4 = 4 * jnp.arange(W2, dtype=jnp.int32)[None, :]

    def body_gathers(p2d, pv, trow, qwin, qpar, col_a, col_b, inv, rco,
                     u_pad):
        acc = jnp.int32(0)
        for gi in range(STEP2):
            qpar_g = qpar[gi].astype(jnp.int32)
            qw = qwin[gi]
            tb = p2d[trow[gi]]
            c = (qw & (W2 - 1)) >> LOG_STEP2
            r = jnp.clip(qw >> LOGW2, 0, r_v - 1)
            win = pv[(qpar_g * N_PHASE2 + c) * r_v + r]
            acc = acc + jnp.sum(tb, dtype=jnp.int32) \
                      + jnp.sum(win, dtype=jnp.int32)
        return acc.astype(jnp.float32)

    def body_compare(p2d, pv, trow, qwin, qpar, col_a, col_b, inv, rco,
                     u_pad):
        import jax.lax as lax
        acc = jnp.int32(0)
        for gi in range(STEP2):
            qpar_g = qpar[gi].astype(jnp.int32)
            a = col_a[gi].astype(jnp.int32)[:, None]
            bb = col_b[gi].astype(jnp.int32)[:, None]
            qw = qwin[gi]
            tb = p2d[trow[gi]]
            c = (qw & (W2 - 1)) >> LOG_STEP2
            r = jnp.clip(qw >> LOGW2, 0, r_v - 1)
            win = pv[(qpar_g * N_PHASE2 + c) * r_v + r]
            x = tb ^ lax.slice_in_dim(win, gi, gi + W2, axis=1)
            m_ = jnp.zeros(x.shape, jnp.int32)
            for j in range(4):
                eq = (x & jnp.uint8(0x03 << (2 * j))) == 0
                m_ = m_ + (eq & (lane4 + j >= a)
                           & (lane4 + j < bb)).astype(jnp.int32)
            acc = acc + jnp.sum(m_, dtype=jnp.int32)
        return acc.astype(jnp.float32)

    def body_full_scatter(p2d, pv, trow, qwin, qpar, col_a, col_b, inv,
                          rco, u_pad):
        m, _ = _packed2_res_counts_scatter.__wrapped__(
            p2d, pv, trow, qwin, qpar, col_a, col_b, inv, rco, u_pad)
        return jnp.sum(m.astype(jnp.float32))

    def timed(name, body):
        @partial(jax.jit, static_argnames=("iters", "u_pad"))
        def loop(p2d, pv, trow, qwin, qpar, col_a, col_b, inv, rco, iters,
                 u_pad):
            def it(i, acc):
                return acc + body(p2d, pv, jnp.roll(trow, i, axis=1),
                                  jnp.roll(qwin, i, axis=1),
                                  jnp.roll(qpar, i, axis=1),
                                  jnp.roll(col_a, i, axis=1),
                                  jnp.roll(col_b, i, axis=1), inv, rco,
                                  u_pad)
            return jax.lax.fori_loop(0, iters, it, jnp.float32(0))

        float(loop(packed2d, pviews, *cargs, iters=args.iters,
                   u_pad=cb.u_pad))
        times = []
        for _ in range(3):
            t0 = time.time()
            float(loop(packed2d, pviews, *cargs, iters=args.iters,
                       u_pad=cb.u_pad))
            times.append(time.time() - t0)
        ms = min(times) / args.iters * 1e3
        print(f"{name:10s} {ms:7.2f} ms/iter "
              f"({b.n_cols/(ms/1e3)/1e9:6.2f} Gcol/s)", flush=True)
        return ms

    # candidate epilogue: within a group the stable residual sort keeps
    # chunks record-contiguous, so per-record sums are per-group cumsums +
    # boundary gathers — no [U] scatter
    u = cb.n_chunks
    rec_of_chunk = np.searchsorted(cb.rec_chunk_off, np.arange(u),
                                   side="right") - 1
    res = (cb.qwin[:u] & (STEP2 - 1)).astype(np.int64)
    R = len(cb.rec_chunk_off) - 1
    counts2d = np.zeros((STEP2, R), dtype=np.int64)
    np.add.at(counts2d, (res, rec_of_chunk), 1)
    rec_off = np.zeros((STEP2, R + 1), dtype=np.int32)
    np.cumsum(counts2d, axis=1, out=rec_off[:, 1:])
    v_chunk = np.maximum(cb.col_b[:u].astype(np.int64)
                         - cb.col_a[:u], 0)
    v_rec = np.zeros(R, dtype=np.int64)
    np.add.at(v_rec, rec_of_chunk, v_chunk)
    rec_off_d = jnp.asarray(rec_off)
    v_rec_d = jnp.asarray(v_rec.astype(np.int32))

    def body_cumsum(p2d, pv, trow, qwin, qpar, col_a, col_b, inv, rco,
                    u_pad):
        import jax.lax as lax
        m_groups = []
        for gi in range(STEP2):
            qpar_g = qpar[gi].astype(jnp.int32)
            a = col_a[gi].astype(jnp.int32)[:, None]
            bb = col_b[gi].astype(jnp.int32)[:, None]
            qw = qwin[gi]
            tb = p2d[trow[gi]]
            c = (qw & (W2 - 1)) >> LOG_STEP2
            r = jnp.clip(qw >> LOGW2, 0, r_v - 1)
            win = pv[(qpar_g * N_PHASE2 + c) * r_v + r]
            x = tb ^ lax.slice_in_dim(win, gi, gi + W2, axis=1)
            m_ = jnp.zeros(x.shape, jnp.int32)
            for j in range(4):
                eq = (x & jnp.uint8(0x03 << (2 * j))) == 0
                m_ = m_ + (eq & (lane4 + j >= a)
                           & (lane4 + j < bb)).astype(jnp.int32)
            m_groups.append(jnp.sum(m_, axis=1, dtype=jnp.int32))
        M = jnp.stack(m_groups)                        # [STEP2, gp]
        cm = jnp.concatenate(
            [jnp.zeros((STEP2, 1), jnp.int32),
             jnp.cumsum(M, axis=1, dtype=jnp.int32)], axis=1)
        seg = jnp.take_along_axis(cm, rec_off_d, axis=1)
        m = jnp.sum(seg[:, 1:] - seg[:, :-1], axis=0, dtype=jnp.int32)
        return jnp.sum(m.astype(jnp.float32)) \
            + jnp.float32(0) * jnp.sum(v_rec_d)

    # correctness: cumsum-epilogue counts == dated scatter kernel (unrotated)
    m_ref, x_ref = _packed2_res_counts_scatter(packed2d, pviews, *cargs,
                                               u_pad=cb.u_pad)

    @jax.jit
    def v2_counts(p2d, pv, trow, qwin, qpar, col_a, col_b):
        import jax.lax as lax
        m_groups = []
        for gi in range(STEP2):
            qpar_g = qpar[gi].astype(jnp.int32)
            a = col_a[gi].astype(jnp.int32)[:, None]
            bb = col_b[gi].astype(jnp.int32)[:, None]
            qw = qwin[gi]
            tb = p2d[trow[gi]]
            c = (qw & (W2 - 1)) >> LOG_STEP2
            r = jnp.clip(qw >> LOGW2, 0, r_v - 1)
            win = pv[(qpar_g * N_PHASE2 + c) * r_v + r]
            x = tb ^ lax.slice_in_dim(win, gi, gi + W2, axis=1)
            m_ = jnp.zeros(x.shape, jnp.int32)
            for j in range(4):
                eq = (x & jnp.uint8(0x03 << (2 * j))) == 0
                m_ = m_ + (eq & (lane4 + j >= a)
                           & (lane4 + j < bb)).astype(jnp.int32)
            m_groups.append(jnp.sum(m_, axis=1, dtype=jnp.int32))
        M = jnp.stack(m_groups)
        cm = jnp.concatenate(
            [jnp.zeros((STEP2, 1), jnp.int32),
             jnp.cumsum(M, axis=1, dtype=jnp.int32)], axis=1)
        seg = jnp.take_along_axis(cm, rec_off_d, axis=1)
        m = jnp.sum(seg[:, 1:] - seg[:, :-1], axis=0, dtype=jnp.int32)
        return m, v_rec_d - m

    m2, x2 = v2_counts(packed2d, pviews, jnp.asarray(g.trow),
                       jnp.asarray(g.qwin), jnp.asarray(g.qpar),
                       jnp.asarray(g.col_a), jnp.asarray(g.col_b))
    same = (np.array_equal(np.asarray(m_ref), np.asarray(m2))
            and np.array_equal(np.asarray(x_ref), np.asarray(x2)))
    print(f"v2 per-record counts identical to production: {same}",
          flush=True)

    g_ms = timed("gathers", body_gathers)
    c_ms = timed("compare", body_compare)
    f_ms = timed("full_scatter", body_full_scatter)
    v2_ms = timed("full", body_cumsum)
    print(f"\nattribution: gathers {g_ms:.2f} | +compare "
          f"{c_ms - g_ms:+.2f} | scatter epilogue {f_ms - c_ms:+.2f} "
          f"| production cumsum epilogue {v2_ms - c_ms:+.2f} "
          f"| padding share of gathers ~{pad:.1%} (~{g_ms * pad:.2f} ms)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

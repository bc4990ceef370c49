"""Benchmark: cigar-column throughput of the fused mismatch/stats kernel on
the golden workload (tests/human_chimp.paf: 207 records, 369,583 cigar ops,
124,949,228 M-run alignment columns).

Headline metric: alignment columns/s through the device column-compare +
per-record-stats kernel (the ``paffy view -s`` / ``add_mismatches`` hot path,
reference loops impl/paf.c:754-768).  The reference publishes no numbers
(BASELINE.md), so ``vs_baseline`` is the speedup over the same computation as
a single-pass vectorized numpy pipeline on the host CPU (measured on a 16M
column subset — the host here is a 2-vCPU machine), a stand-in for the
reference's per-base C loop.

Sequences are synthesized by the native C helper to the golden file's exact
coordinate structure with a ~96.5% column match rate; the device receives an
identical copy of the pool, so the device results are cross-checked against
the single-threaded C loop bit-for-bit.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Diagnostics go to stderr.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

GOLDEN = "/root/reference/tests/human_chimp.paf"
BLOCK = 1 << 16
MATCH_RATE = 0.965
BASELINE_COLS = 16_000_000


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def load_workload():
    from paffy_tpu.core import pafio
    if os.path.exists(GOLDEN):
        with open(GOLDEN) as fh:
            text = fh.read()
        t0 = time.time()
        t = pafio.parse_paf_text(text)
        log(f"parsed {len(t)} records / {int(t.off[-1])} ops "
            f"in {time.time()-t0:.3f}s")
    else:
        log("golden file missing; synthesizing equivalent workload")
        from tests.synthdata import make_workload
        seqs, lines = make_workload(seed=0, length=2_000_000, n_windows=200,
                                    window=60_000, step=9_500)
        t = pafio.parse_paf_text("\n".join(lines) + "\n")
    return t


def build_columns(t):
    from paffy_tpu.ops.segments import build_m_column_batch
    keys = {}
    sizes = []
    for i in range(len(t)):
        for nm, ln in ((t.qname[i], int(t.qlen[i])), (t.tname[i], int(t.tlen[i]))):
            if (nm, ln) not in keys:
                keys[(nm, ln)] = len(sizes)
                sizes.append(ln)
    from paffy_tpu.ops.segments import POOL_GUARD, POOL_W
    offsets = np.concatenate([[0], np.cumsum(sizes)]) + POOL_GUARD
    qoff = np.array([offsets[keys[(t.qname[i], int(t.qlen[i]))]]
                     for i in range(len(t))], dtype=np.int64)
    toff = np.array([offsets[keys[(t.tname[i], int(t.tlen[i]))]]
                     for i in range(len(t))], dtype=np.int64)
    pool_size = -(-(int(offsets[-1]) + POOL_GUARD + 2 * POOL_W) // POOL_W) * POOL_W
    return build_m_column_batch(t, qoff, toff), pool_size


def _dev_args(b, pool_size):
    """Ship the (small) per-op metadata as int32 device arrays."""
    import jax.numpy as jnp
    assert pool_size < 2**31
    return dict(
        lens=jnp.asarray(b.lens.astype(np.int32)),
        qpos0=jnp.asarray(b.qpos0.astype(np.int32)),
        tpos0=jnp.asarray(b.tpos0.astype(np.int32)),
        rev=jnp.asarray(b.rev),
        col_off=jnp.asarray(b.col_off.astype(np.int32)),
        rec_col_off=jnp.asarray(b.rec_col_off.astype(np.int32)))


def build_host_pool(b, pool_size, seed=7):
    """Host pool: tiled random block + native C synthesis of query bytes
    through the alignment map (~96.5% column match rate).  The device gets an
    exact copy, so device results can be cross-checked against the C loop
    bit-for-bit."""
    from paffy_tpu import native
    rng = np.random.default_rng(seed)
    block = np.frombuffer(b"ACGT", dtype=np.uint8)[
        rng.integers(0, 4, size=BLOCK, dtype=np.uint8)]
    reps = pool_size // BLOCK + 1
    host_pool = np.tile(block, reps)[:pool_size]
    t0 = time.time()
    ok = native.synth_query_pool(host_pool, b.lens[: b.n_mops],
                                 b.qpos0[: b.n_mops], b.tpos0[: b.n_mops],
                                 b.rev[: b.n_mops],
                                 keep_per_mille=int(MATCH_RATE * 1000))
    if not ok:
        raise RuntimeError("native library unavailable; cannot synthesize pool")
    log(f"host pool synthesized ({pool_size/1e6:.0f} MB) in {time.time()-t0:.1f}s")
    return host_pool


def bench_device(host_pool, b, t, iters=40):
    """Upload the pool, run the tiled kernel.

    Correctness: one call with a full host readback, cross-checked against
    the C loop bit-for-bit.  Timing: ``iters`` kernel executions inside ONE
    fori_loop dispatch with per-iteration input variation (chunk arrays
    rotated by the loop index, same total work, defeats CSE) and a final
    scalar fetch — the only methodology that holds up on this runtime
    (block_until_ready can return before remote execution completes, and a
    per-call fetch pays a full tunnel roundtrip that dwarfs the kernel;
    docs/PERF_NOTES.md)."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from paffy_tpu.ops.tiled import (build_packed2_chunk_batch,
                                     build_packed2_pools,
                                     _packed2_match_counts)
    from paffy_tpu.ops.mismatch import build_ext_pool

    t0 = time.time()
    pool = jax.device_put(host_pool)
    pool.block_until_ready()
    log(f"pool uploaded in {time.time()-t0:.1f}s to {jax.devices()[0]}")

    t0 = time.time()
    ext = build_ext_pool(pool)
    packed2d, pviews = build_packed2_pools(ext)
    packed2d.block_until_ready()
    log(f"ext + 2-bit packed pools built in {time.time()-t0:.2f}s")

    cb = build_packed2_chunk_batch(b, len(t), pool_len=pool.shape[0])
    log(f"packed tiled: {cb.n_chunks} aligned chunks (pad {cb.u_pad})")
    cargs = (jnp.asarray(cb.trow), jnp.asarray(cb.qwin),
             jnp.asarray(cb.qpar), jnp.asarray(cb.col_a),
             jnp.asarray(cb.col_b), jnp.asarray(cb.rec_chunk_off))

    t0 = time.time()
    m, x = _packed2_match_counts(packed2d, pviews, *cargs)
    mv, xv = np.asarray(m).astype(np.int64), np.asarray(x).astype(np.int64)
    log(f"device: compile+first+fetch {time.time()-t0:.1f}s")
    times = []
    for _ in range(3):
        t0 = time.time()
        m, x = _packed2_match_counts(packed2d, pviews, *cargs)
        np.asarray(m)
        times.append(time.time() - t0)
    log(f"device: {min(times)*1e3:.1f} ms/call single-call fetch-timed "
        f"(includes a full tunnel roundtrip; diagnostic only)")

    @partial(jax.jit, static_argnames=("iters",))
    def loop(p2d, pv, trow, qwin, qpar, col_a, col_b, rco, iters):
        def body(i, acc):
            m, _ = _packed2_match_counts(
                p2d, pv, jnp.roll(trow, i), jnp.roll(qwin, i),
                jnp.roll(qpar, i), jnp.roll(col_a, i), jnp.roll(col_b, i),
                rco)
            return acc + jnp.sum(m.astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(loop(packed2d, pviews, *cargs, iters=iters))   # compile
    times = []
    for _ in range(3):
        t0 = time.time()
        float(loop(packed2d, pviews, *cargs, iters=iters))
        times.append(time.time() - t0)
    dt = min(times) / iters
    log(f"device: {dt*1e3:.2f} ms/iter ({iters} kernel executions in one "
        f"dispatch, rotated inputs, min of 3) -> {b.n_cols/dt/1e9:.3f} Gcol/s")
    return b.n_cols / dt, mv, xv


def bench_baseline(host_pool, b, iters=3):
    """Single-threaded C per-base loop on the identical pool — the
    reference-style CPU comparison point."""
    from paffy_tpu import native
    n_records = int(b.rec[: b.n_mops].max(initial=0)) + 1
    args = (host_pool, b.lens[: b.n_mops], b.qpos0[: b.n_mops],
            b.tpos0[: b.n_mops], b.rev[: b.n_mops], b.rec[: b.n_mops],
            n_records)
    t0 = time.time()
    for _ in range(iters):
        m, x = native.column_compare_counts(*args)
    dt = (time.time() - t0) / iters
    log(f"C baseline: {dt*1e3:.0f} ms/iter -> {b.n_cols/dt/1e6:.1f} Mcol/s")
    return b.n_cols / dt, m, x


def main():
    t = load_workload()
    b, pool_size = build_columns(t)
    log(f"workload: {b.n_cols} alignment columns over {b.n_mops} M runs; "
        f"pool {pool_size/1e6:.0f} MB")
    host_pool = build_host_pool(b, pool_size)
    base_cols_s, m_c, x_c = bench_baseline(host_pool, b)
    ident = m_c.sum() / max(m_c.sum() + x_c.sum(), 1)
    log(f"column identity {ident:.4f} (target ~{MATCH_RATE})")

    dev_cols_s, m_d, x_d = bench_device(host_pool, b, t)
    m_d = m_d.astype(np.int64)
    x_d = x_d.astype(np.int64)
    if not (np.array_equal(m_c, m_d[: len(m_c)])
            and np.array_equal(x_c, x_d[: len(x_c)])):
        log("ERROR: device and C results differ!")
        sys.exit(1)
    log("device/C per-record results identical")
    print(json.dumps({
        "metric": "alignment_columns_per_second",
        "value": round(dev_cols_s, 1),
        "unit": "columns/s",
        "vs_baseline": round(dev_cols_s / base_cols_s, 3),
    }))


if __name__ == "__main__":
    main()

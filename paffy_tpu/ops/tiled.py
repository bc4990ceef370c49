"""Tiled (lane-aligned) column-compare kernel — the fast path for large
batches.

Why this exists: XLA lowers huge 1-D element gathers on TPU at ~75M
elements/s (measured: 1.7 s for a 128M-element u8 gather), which made the
naive per-column formulation run at CPU speed.  Row gathers of 128-lane
vectors run ~30-50x faster per byte (the embedding-lookup pattern), and row
gather BANDWIDTH — not per-row overhead — is the limit (~6-15 GB/s
measured), so the kernel minimizes gathered bytes:

  * chunks are ALIGNED to the W=128-byte row grid of the sequence pool on
    the TARGET side: each chunk is one pool row, fetched with a single
    direct row gather and no shifting — zero redundancy.  Partial first and
    last rows of a run are handled with lane bounds, not shifts.
  * the QUERY side walks at a per-run phase offset, so it fetches a 2W
    overlapped window per chunk (pool_over rows) and aligns it with a
    log2(W)-step variable shift (static rolls); reverse-strand chunks flip
    their window (static permutation).
  * case-fold/complement are arithmetic selects (tiny-table u8 gathers
    serialize on TPU; see ops.mismatch).
  * per-record reductions are cumsums over the chunk grid + gathers at
    record chunk boundaries (scatter segment-sums serialize on TPU).
  * int32 everywhere (int64 lowers to u32-pair emulation on TPU and can
    blow scoped VMEM).

The grid layout (chunks in record->op->column order, valid lanes contiguous
in [lane_a, lane_b) per chunk) also serves the =/X run extraction:
boundaries are computed per lane with a cross-chunk carry (two extra element
gathers per chunk) and compacted by binary search, so host transfers stay
O(runs).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from paffy_tpu.ops.segments import MColumnBatch, bucket_size, pad_to, POOL_W
from paffy_tpu.ops.mismatch import device_upper, device_comp_upper

W = POOL_W
LOGW = POOL_W.bit_length() - 1


@dataclass
class AlignedChunkBatch:
    """Pool-row-aligned chunk decomposition of a batch's M runs (host side).

    One chunk per pool row touched by a run's target range.  Arrays are
    padded to ``u_pad`` rows; padding chunks have lane_a == lane_b == 0.

      trow        — target pool row index (chunk target bytes = that row)
      qwin_lo     — start of the ascending W-byte query window
      rev         — query walks backward (opposite strand)
      lane_a/b    — valid lane range [lane_a, lane_b) within the row
      first_of_op — chunk is the first of its run
      tprev/qprev — pool positions of the previous column's bytes (run-
                    boundary carry for =/X extraction; 0 on first chunks)
      rec_chunk_off — record -> first chunk row [n_records+1]
    """

    trow: np.ndarray
    qwin_lo: np.ndarray
    rev: np.ndarray
    lane_a: np.ndarray
    lane_b: np.ndarray
    first_of_op: np.ndarray
    tprev: np.ndarray
    qprev: np.ndarray
    rec_chunk_off: np.ndarray
    n_chunks: int
    n_cols: int
    u_pad: int


def build_chunk_batch(b: MColumnBatch, n_records: int) -> AlignedChunkBatch:
    """Decompose the M runs of a column batch into pool-row-aligned chunks."""
    lens = b.lens[: b.n_mops].astype(np.int64)
    tpos0 = b.tpos0[: b.n_mops].astype(np.int64)
    qpos0 = b.qpos0[: b.n_mops].astype(np.int64)
    rev_op = b.rev[: b.n_mops]

    row_lo = tpos0 >> LOGW
    row_hi = (tpos0 + lens - 1) >> LOGW
    n_chunks_per_op = row_hi - row_lo + 1
    u = int(n_chunks_per_op.sum())
    u_pad = bucket_size(max(u, 1), minimum=64)

    chunk_off = np.zeros(b.n_mops + 1, dtype=np.int64)
    np.cumsum(n_chunks_per_op, out=chunk_off[1:])
    mop = np.searchsorted(chunk_off[1:], np.arange(u), side="right")
    c_in_op = np.arange(u) - chunk_off[mop]

    trow = row_lo[mop] + c_in_op
    first = c_in_op == 0
    last = c_in_op == (n_chunks_per_op[mop] - 1)
    lane_a = np.where(first, tpos0[mop] & (W - 1), 0).astype(np.int32)
    lane_b = np.where(last, ((tpos0[mop] + lens[mop] - 1) & (W - 1)) + 1,
                      W).astype(np.int32)

    # query window: valid lane l corresponds to run column
    # col = trow*W + l - tpos0; the query byte sits at qpos0 +/- col.
    # forward: q(l) = (qpos0 - tpos0 + trow*W) + l  -> ascending from there
    # reverse: q(l) = (qpos0 + tpos0 - trow*W) - l  -> flipped window over
    #          [base - (W-1), base]
    revc = rev_op[mop]
    fwd_base = qpos0[mop] - tpos0[mop] + trow * W
    rev_base = qpos0[mop] + tpos0[mop] - trow * W
    qwin_lo = np.where(revc, rev_base - (W - 1), fwd_base)

    # previous-column carry bytes (used only when not first_of_op)
    col_a = trow * W + lane_a - tpos0[mop]
    tprev = np.where(first, 0, tpos0[mop] + col_a - 1)
    qprev = np.where(first, 0,
                     np.where(revc, qpos0[mop] - (col_a - 1),
                              qpos0[mop] + (col_a - 1)))

    rec_of_mop = b.rec[: b.n_mops]
    first_mop = np.searchsorted(rec_of_mop, np.arange(n_records + 1),
                                side="left")
    rec_chunk_off = chunk_off[np.minimum(first_mop, b.n_mops)]
    rec_chunk_off[-1] = u

    n_cols = int(lens.sum())
    small = (int(trow.max(initial=0)) * W + 2 * W < 2**31
             and int(np.abs(qwin_lo).max(initial=0) if u else 0) + 2 * W < 2**31)
    pos_t = np.int32 if small else np.int64
    return AlignedChunkBatch(
        trow=pad_to(trow.astype(pos_t), u_pad),
        qwin_lo=pad_to(qwin_lo.astype(pos_t), u_pad),
        rev=pad_to(revc, u_pad, fill=False),
        lane_a=pad_to(lane_a, u_pad),
        lane_b=pad_to(lane_b.astype(np.int32), u_pad),
        first_of_op=pad_to(first, u_pad, fill=False),
        tprev=pad_to(tprev.astype(pos_t), u_pad),
        qprev=pad_to(qprev.astype(pos_t), u_pad),
        rec_chunk_off=(rec_chunk_off.astype(np.int32) if small
                       else rec_chunk_off),
        n_chunks=u, n_cols=n_cols, u_pad=u_pad)


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


def _chunk_is_match(pool2d, pool_over, trow, qwin_lo, rev):
    """[U, W] match grid: aligned target rows vs shifted query windows."""
    tb = pool2d[trow]                               # aligned: no shift
    q_lo = jnp.clip(qwin_lo, 0, (pool_over.shape[0] - 1) * W)
    q_win = _var_shift(pool_over[q_lo >> LOGW], q_lo & (W - 1))[:, :W]
    qb = jnp.where(rev[:, None], jnp.flip(q_win, axis=1), q_win)
    tb = device_upper(tb)
    qb = device_upper(qb)
    qb = jnp.where(rev[:, None], device_comp_upper(qb), qb)
    return tb == qb


def _lane_mask(lane_a, lane_b):
    lane = jnp.arange(W, dtype=jnp.int32)[None, :]
    return (lane >= lane_a[:, None]) & (lane < lane_b[:, None])


@jax.jit
def _tiled_match_counts(pool2d, pool_over, trow, qwin_lo, rev, lane_a, lane_b,
                        rec_chunk_off):
    """Per-record (match, mismatch) counts over the aligned chunk grid."""
    is_match = _chunk_is_match(pool2d, pool_over, trow, qwin_lo, rev)
    vmask = _lane_mask(lane_a, lane_b)
    m_chunk = jnp.sum((is_match & vmask).astype(jnp.int32), axis=1)
    v_chunk = (lane_b - lane_a).astype(jnp.int32)
    # int32 cumsums (int64 lowers to u32-pair emulation on TPU)
    zero = jnp.zeros(1, dtype=jnp.int32)
    cm = jnp.concatenate([zero, jnp.cumsum(m_chunk)])
    cv = jnp.concatenate([zero, jnp.cumsum(v_chunk)])
    bounds = jnp.clip(rec_chunk_off, 0, m_chunk.shape[0])
    m = cm[bounds[1:]] - cm[bounds[:-1]]
    tot = cv[bounds[1:]] - cv[bounds[:-1]]
    return m, tot - m


@jax.jit
def _tiled_boundaries(pool2d, pool_over, pool, trow, qwin_lo, rev, lane_a,
                      lane_b, first_of_op, tprev, qprev):
    """Run-boundary grid for =/X re-encoding.

    Returns (boundary [U, W] bool, is_match [U, W] bool).  A boundary lane is
    the first column of an output run: the first valid lane of an op's first
    chunk, any later valid lane whose match state differs from the previous
    lane, and the first valid lane of continuation chunks whose state
    differs from the previous chunk's last column (recomputed with two
    element gathers per chunk via tprev/qprev).
    """
    is_match = _chunk_is_match(pool2d, pool_over, trow, qwin_lo, rev)
    vmask = _lane_mask(lane_a, lane_b)
    lane = jnp.arange(W, dtype=jnp.int32)[None, :]
    flip = jnp.concatenate(
        [jnp.zeros((is_match.shape[0], 1), dtype=bool),
         is_match[:, 1:] != is_match[:, :-1]], axis=1)
    limit = pool.shape[0] - 1
    tpb = device_upper(pool[jnp.clip(tprev, 0, limit)])
    qpb = device_upper(pool[jnp.clip(qprev, 0, limit)])
    qpb = jnp.where(rev, device_comp_upper(qpb), qpb)
    prev_match = tpb == qpb
    im_at_a = jnp.take_along_axis(is_match, lane_a[:, None].astype(jnp.int32),
                                  axis=1)[:, 0]
    firstlane_bound = jnp.where(first_of_op, True, im_at_a != prev_match)
    boundary = jnp.where(lane == lane_a[:, None], firstlane_bound[:, None],
                         flip) & vmask
    return boundary, is_match


@jax.jit
def _count_runs_tiled(boundary):
    return jnp.sum(boundary.astype(jnp.int32))


@partial(jax.jit, static_argnames=("r_pad",))
def _extract_runs_tiled(boundary, is_match, lane_a, lane_b, r_pad):
    """Compact run starts from the boundary grid (gather-side compaction).

    Returns (start_cols [r_pad], vals [r_pad]): run-start COLUMN indices
    (invalid lanes excluded from the numbering) and match states.
    """
    u, w = boundary.shape
    flat_b = boundary.reshape(-1)
    flat_m = is_match.reshape(-1)
    flat_v = _lane_mask(lane_a, lane_b).reshape(-1)
    cs = jnp.cumsum(flat_b.astype(jnp.int32))
    col_of = jnp.cumsum(flat_v.astype(jnp.int32)) - 1  # grid pos -> column
    ranks = jnp.arange(1, r_pad + 1, dtype=jnp.int32)
    g = jnp.clip(jnp.searchsorted(cs, ranks, side="left"), 0, u * w - 1)
    return col_of[g], flat_m[g]


# --------------------------------------------------------------- public API

def _pool2d(pool):
    return pool.reshape(-1, W)


def tiled_match_counts(pool, b: MColumnBatch, n_records: int):
    """Per-record column match/mismatch counts via the tiled kernel.

    ``pool`` must be the guarded device pool from SequencePool.
    """
    cb = build_chunk_batch(b, n_records)
    m, x = _tiled_match_counts(
        _pool2d(pool), build_pool_over(pool), jnp.asarray(cb.trow),
        jnp.asarray(cb.qwin_lo), jnp.asarray(cb.rev), jnp.asarray(cb.lane_a),
        jnp.asarray(cb.lane_b), jnp.asarray(cb.rec_chunk_off))
    return np.asarray(m).astype(np.int64), np.asarray(x).astype(np.int64)


def tiled_runs(pool, b: MColumnBatch, n_records: int):
    """Compact =/X run decomposition via the tiled kernel.

    Returns (start_cols [n_runs], match_at_start [n_runs]).
    """
    cb = build_chunk_batch(b, n_records)
    boundary, is_match = _tiled_boundaries(
        _pool2d(pool), build_pool_over(pool), pool, jnp.asarray(cb.trow),
        jnp.asarray(cb.qwin_lo), jnp.asarray(cb.rev), jnp.asarray(cb.lane_a),
        jnp.asarray(cb.lane_b), jnp.asarray(cb.first_of_op),
        jnp.asarray(cb.tprev), jnp.asarray(cb.qprev))
    n_runs = int(_count_runs_tiled(boundary))
    r_pad = bucket_size(max(n_runs, 1))
    starts, vals = _extract_runs_tiled(boundary, is_match,
                                       jnp.asarray(cb.lane_a),
                                       jnp.asarray(cb.lane_b), r_pad=r_pad)
    return np.asarray(starts[:n_runs]), np.asarray(vals[:n_runs])

"""Pallas column-compare kernel — DMA-gather formulation of the
mismatch/stats hot loop (reference per-base walk impl/paf.c:754-768).

STATUS: correct (cross-checked vs the C loop; tests run it in interpret
mode), but NOT the production path.  Two dated findings:

2026-08-18: every *sliced* DMA source crashed the remote Mosaic compile
helper; only full-ref copies and pipeline (BlockSpec) DMAs compiled.

2026-08-19 re-probe (current toolchain): the crash is DTYPE-specific —
dynamic-sliced DMA sources now COMPILE AND RUN for >=32-bit element types
(``i32_pool.at[pl.ds(row, n)]`` works); u8 sources still kill the compile
helper (HTTP 500, subprocess exit 1), and this kernel's byte-granular form
stays blocked.  More importantly, the measured DMA economics rule out the
design even via an i32-viewed pool: one DMA costs ~95 ns essentially flat
in size (512 B rows -> 5.2-5.7 GB/s at NSLOT 8-16; 2 KB -> 20.8 GB/s),
while XLA's row gather moves the same 512 B rows at ~9.4 GB/s random /
15-20 GB/s on the production grid, and this kernel's RW=4096 pieces would
pay the full 2x4 KB fetch on a median-421-column run (~19 B/col vs the
2-bit XLA kernel's 1.4 B/col).  Per-descriptor issue cost is scalar-core
serialized, so deeper rings do not help.  The production fast path remains
the XLA tiled kernel (ops/tiled.py); revisit only if Mosaic gains
sub-row-cost batched DMA issue or u8 sliced sources with vector issue.

Why this exists: the XLA tiled kernel (ops/tiled.py) is bound by XLA's row
gather, ~7 GB/s on TPU v5e — every chunk window is fetched through a gather
whose bandwidth, not the compare math, is the limit.  This kernel replaces
the gather with explicit byte-granular async DMAs issued from a Pallas
kernel: the DMA engines stream arbitrary unaligned byte ranges of the
sequence pool straight into VMEM slots, so

  * there is NO shift/roll alignment network at all — the DMA hardware does
    the alignment (the XLA kernel needs a log2(W) roll chain per chunk);
  * reverse-strand runs need no per-lane index math: the DMA copies the
    byte range END-aligned into the slot and a static double-flip of the
    (32, 128) tile realizes the descending walk;
  * fetched bytes are exactly the run's bytes (plus slot padding), not a
    2x overlapped window.

Decomposition: each M run becomes ceil(len / 4096) PIECES of <= 4096
columns.  4096 bytes = one native u8 vector register (32 sublanes x 128
lanes), so the compare costs ~one vreg op per piece regardless of fill, and
piece COUNT (not padding waste) is what matters — 4096 minimizes it (golden
workload: 184,894 runs -> 185,993 pieces).

Reverse strand: Mosaic has no in-kernel reverse, and per-lane index math is
exactly what this kernel exists to avoid.  Instead the kernel reads from an
EXTENDED pool ``ext = pool ++ comp(upper(flip(pool)))`` (built once per pool
by one dense XLA op): a descending complemented walk from pool position s is
an ascending plain read from ext position 2L-1-s, so reverse pieces use the
same branch-free compare as forward ones — the piece builder just bakes the
mirrored source offset.

Pipeline: pieces are processed in record order, CHUNK per grid step; an
NSLOT-deep ring of (query, target) VMEM slots keeps 2*NSLOT DMAs in flight
ahead of the compare.  Per-piece match counts land in SMEM and are reduced
to per-record (match, mismatch) with the cumsum + record-boundary gather
trick (scatter segment sums serialize on TPU; see docs/PERF_NOTES.md).

Pool layout contract: pools must carry >= RW (4096) guard bytes at both
ends (ops/segments.POOL_GUARD) because piece DMAs always copy a full RW
bytes: forward pieces read [src, src+RW), reverse pieces read
[qpos+1-RW, qpos+1) — both may overhang a sequence into the guards.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
from paffy_tpu.jaxconf import ensure_jax

ensure_jax()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from paffy_tpu.ops.segments import MColumnBatch, POOL_GUARD
from paffy_tpu.ops.mismatch import build_ext_pool

RW = 4096            # piece slot bytes = one native u8 vreg (32 x 128)
ROWS, LANES = 32, 128
CHUNK = 512          # pieces per grid step
NSLOT = 8            # DMA ring depth (per side)
META_W = 4           # int32 fields per piece: qsrc, tsrc, n, rev

assert POOL_GUARD >= RW, "pool guards must cover a full piece DMA"


@dataclass
class PieceBatch:
    """Host-side piece decomposition of a batch's M runs.

    meta          — int32 [n_steps, 8, CHUNK*4/8], per piece
                    (qsrc, tsrc, n, 0): qsrc/tsrc are absolute byte offsets
                    of the piece's RW-byte DMA into the EXTENDED pool
                    (reverse pieces point into the reverse-complement half),
                    n is the piece's valid column count (0 for padding).
    rec_piece_off — record -> first piece index [n_records+1] (pieces are in
                    record order).
    """

    meta: np.ndarray
    rec_piece_off: np.ndarray
    n_pieces: int
    n_steps: int


def build_piece_batch(b: MColumnBatch, n_records: int,
                      pool_len: int) -> PieceBatch:
    """Split the batch's M runs into <=RW-column pieces (vectorized, O(pieces)).

    pool_len — length L of the (unextended) pool; reverse pieces get sources
    mirrored into [L, 2L).
    """
    lens = b.lens[: b.n_mops].astype(np.int64)
    qpos0 = b.qpos0[: b.n_mops].astype(np.int64)
    tpos0 = b.tpos0[: b.n_mops].astype(np.int64)
    rev = b.rev[: b.n_mops]
    rec = b.rec[: b.n_mops]

    nsub = np.maximum(-(-lens // RW), 1)
    off = np.concatenate([[0], np.cumsum(nsub)])
    total = int(off[-1])
    mop = np.repeat(np.arange(len(lens)), nsub)
    c0 = (np.arange(total) - off[mop]) * RW
    n = np.minimum(lens[mop] - c0, RW)
    # forward: piece bytes are pool[qpos0+c0 : qpos0+c0+n) ascending.
    # reverse: the walk visits pool[s], pool[s-1], ... with s = qpos0-c0,
    # which in the extended pool is ext[2L-1-s], ext[2L-s], ... ascending.
    qsrc = np.where(rev[mop], 2 * pool_len - 1 - (qpos0[mop] - c0),
                    qpos0[mop] + c0)
    tsrc = tpos0[mop] + c0

    first_mop = np.searchsorted(rec, np.arange(n_records + 1), side="left")
    rec_piece_off = off[np.minimum(first_mop, len(lens))].astype(np.int64)
    rec_piece_off[-1] = total

    n_steps = max(-(-total // CHUNK), 1)
    meta = np.zeros((n_steps * CHUNK, META_W), dtype=np.int32)
    if total:
        assert qsrc.min() >= 0 and int(qsrc.max()) + RW <= 2 * pool_len
        assert int(tsrc.max()) + RW <= pool_len and 2 * pool_len < 2**31
        meta[:total, 0] = qsrc
        meta[:total, 1] = tsrc
        meta[:total, 2] = n
    # (n_steps, 8, CHUNK*META_W/8): Pallas requires block trailing dims to be
    # multiples of (8, 128); the kernel flat-indexes fields back out.
    return PieceBatch(meta=meta.reshape(n_steps, 8, CHUNK * META_W // 8),
                      rec_piece_off=rec_piece_off,
                      n_pieces=total, n_steps=n_steps)


_MCOLS = CHUNK * META_W // 8   # meta block inner width
_OCOLS = CHUNK // 8            # out block inner width


def _compare_kernel(meta_ref, pool_ref, out_ref, *scratch):
    """One grid step: DMA-gather + compare CHUNK pieces.

    meta_ref — SMEM (1, 8, CHUNK*4/8) int32 (flat piece fields)
    pool_ref — HBM u8 (unblocked, extended pool)
    out_ref  — SMEM (1, 8, CHUNK/8) int32 per-piece match counts
    scratch  — NSLOT query + NSLOT target VMEM (RW,) u8 slot buffers (the
               slot index is STATIC: the piece loop is unrolled by NSLOT, so
               Mosaic never sees a dynamically indexed tiled dimension),
               then a DMA semaphore array (2, NSLOT).
    """
    qbufs, tbufs, sems = scratch[:NSLOT], scratch[NSLOT:2 * NSLOT], scratch[-1]
    flat_idx = (jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0) * LANES
                + jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1))

    _mcols = np.int32(_MCOLS)
    _ocols = np.int32(_OCOLS)
    _zero, _one = np.int32(0), np.int32(1)

    def meta_at(flat):
        # lax.div/rem on non-negative int32 (// lowers via a sign fixup that
        # trips Mosaic's no-int64 rule)
        return meta_ref[0, jax.lax.div(flat, _mcols),
                        jax.lax.rem(flat, _mcols)]

    def issue(p, k):
        qsrc = meta_at(META_W * p)
        tsrc = meta_at(META_W * p + np.int32(1))
        pltpu.make_async_copy(pool_ref.at[pl.ds(qsrc, RW)], qbufs[k],
                              sems.at[_zero, np.int32(k)]).start()
        pltpu.make_async_copy(pool_ref.at[pl.ds(tsrc, RW)], tbufs[k],
                              sems.at[_one, np.int32(k)]).start()

    for k in range(NSLOT):
        issue(np.int32(k), k)

    def body(g):
        base = g * np.int32(NSLOT)
        for k in range(NSLOT):      # static unroll: slot refs stay static
            p = base + np.int32(k)
            n = meta_at(META_W * p + np.int32(2))
            pltpu.make_async_copy(pool_ref, qbufs[k],
                                  sems.at[_zero, np.int32(k)]).wait()
            pltpu.make_async_copy(pool_ref, tbufs[k],
                                  sems.at[_one, np.int32(k)]).wait()
            qv = qbufs[k][:].reshape(ROWS, LANES)
            tv = tbufs[k][:].reshape(ROWS, LANES)
            # branch-free pure u8 equality: the extended pool is
            # pre-uppercased, and reverse pieces read its pre-complemented
            # mirror half
            match = (tv == qv) & (flat_idx < n)
            # f32 accumulation: Mosaic's int reduce lowering emits int64
            # under x64; counts <= 4096 are exact in f32
            out_ref[0, jax.lax.div(p, _ocols), jax.lax.rem(p, _ocols)] = (
                jnp.sum(match.astype(jnp.float32),
                        dtype=jnp.float32).astype(jnp.int32))

            @pl.when(p + np.int32(NSLOT) < np.int32(CHUNK))
            def _(p=p, k=k):
                issue(p + np.int32(NSLOT), k)
        return g + np.int32(1)

    # while_loop with an int32 carry: under x64 fori_loop's index traces as
    # int64, which Mosaic cannot lower
    jax.lax.while_loop(lambda g: g < np.int32(CHUNK // NSLOT), body,
                       np.int32(0))


@partial(jax.jit, static_argnames=("interpret",))
def _piece_match_counts(pool, meta, interpret=False):
    """[n_steps, CHUNK] per-piece match counts via the DMA compare kernel."""
    n_steps = meta.shape[0]
    return pl.pallas_call(
        _compare_kernel,
        grid=(n_steps,),
        in_specs=[
            pl.BlockSpec((1, 8, _MCOLS), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 8, _OCOLS), lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((n_steps, 8, _OCOLS), jnp.int32),
        scratch_shapes=(
            [pltpu.VMEM((RW,), jnp.uint8) for _ in range(2 * NSLOT)]
            + [pltpu.SemaphoreType.DMA((2, NSLOT))]),
        interpret=interpret,
    )(meta, pool)


@jax.jit
def _reduce_to_records(m_steps, rec_piece_off, rec_cols):
    """Per-piece counts -> per-record (match, mismatch) by boundary gather."""
    flat = m_steps.reshape(-1)
    cm = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(flat)])
    bounds = jnp.clip(rec_piece_off, 0, flat.shape[0])
    m = cm[bounds[1:]] - cm[bounds[:-1]]
    return m, rec_cols - m


def _rec_cols_i32(b: MColumnBatch) -> np.ndarray:
    rc = (b.rec_col_off[1:] - b.rec_col_off[:-1])
    assert rc.max(initial=0) < 2**31
    return rc.astype(np.int32)


def pallas_match_counts(pool, b: MColumnBatch, n_records: int,
                        interpret: bool | None = None, ext=None):
    """Per-record (match, mismatch) counts via the Pallas DMA kernel.

    ``pool`` must be a device u8 pool with >= RW guard bytes at both ends
    (SequencePool and bench pools satisfy this via segments.POOL_GUARD).
    ``ext`` may pass a precomputed build_ext_pool(pool) to amortize it.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if ext is None:
        ext = build_ext_pool(pool)
    pb = build_piece_batch(b, n_records, pool_len=pool.shape[0])
    m_steps = _piece_match_counts(ext, jnp.asarray(pb.meta),
                                  interpret=interpret)
    m, x = _reduce_to_records(m_steps,
                              jnp.asarray(pb.rec_piece_off.astype(np.int32)),
                              jnp.asarray(_rec_cols_i32(b)))
    return np.asarray(m).astype(np.int64), np.asarray(x).astype(np.int64)

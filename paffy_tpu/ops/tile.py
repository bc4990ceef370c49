"""Greedy tile-level assignment — the sequential sweep as a device scan.

Reference: paffy tile (impl/paf_tile.c:36-93,156-178): records sorted
best-first by (chain_score, score); per record, increment per-base coverage
counts of its aligned query bases, then set tile_level to the MEDIAN
post-increment count over those bases (levels start at 1 because the record's
own increment is counted); records with no aligned bases get INT16_MAX.

The sweep is inherently sequential across records (counts mutate between
records) but fully parallel within a record — exactly the shape of a
``lax.scan`` whose carry is the coverage array in HBM:

  carry  = one int32 count array over the concatenation of all query
           sequences (host assigns each name a base offset)
  step i = dynamic-slice the record's span window, build the record's
           aligned-base mask from its run intervals (scatter +/-1, cumsum),
           add, histogram the masked counts, take the median, write back.

Every step is O(span-bucket) vector work; XLA fuses mask-build + add +
histogram into a handful of HBM passes.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from paffy_tpu.core.model import PafTable
from paffy_tpu.ops.coverage import match_intervals, SATURATION, EMPTY_TILE_LEVEL
from paffy_tpu.ops.segments import bucket_size


def _level_bits(lmax: int) -> int:
    b = 0
    while (1 << b) < lmax:
        b += 1
    return max(b, 1)


@partial(jax.jit, static_argnames=("span", "lmax", "total"))
def _tile_scan(starts, iv_start, iv_end, span, lmax, total):
    """Run the greedy tile sweep.

    starts:   int64 [N]       global base offset of each record's span window
    iv_start: int64 [N, K]    run starts relative to the window (K padded;
                              padding marked by iv_start == iv_end)
    iv_end:   int64 [N, K]
    Returns tile levels int64 [N].
    """
    counts0 = jnp.zeros(total + span, dtype=jnp.int32)

    def step(counts, x):
        start, ivs, ive = x
        window = jax.lax.dynamic_slice(counts, (start,), (span,))
        # aligned-base mask of this record via interval diff + cumsum
        diff = jnp.zeros(span + 1, dtype=jnp.int32)
        ones = jnp.ones(ivs.shape[0], dtype=jnp.int32)
        diff = diff.at[ivs].add(ones, mode="drop")
        diff = diff.at[ive].add(-ones, mode="drop")
        mask = jnp.cumsum(diff)[:span]
        new_window = jnp.minimum(window + mask, SATURATION)
        matches = jnp.sum(mask.astype(jnp.int64))
        # median: smallest level L with |{masked bases with count <= L}| >=
        # matches/2.0 (impl/paf_tile.c:81-89, float compare as in C).
        # Binary search over the level range — a scatter histogram over the
        # window would serialize on TPU.
        half = matches.astype(jnp.float64) / 2.0
        mask_b = mask > 0

        def probe(L):
            return jnp.sum((mask_b & (new_window <= L)).astype(jnp.int64))

        def bisect(carry, bit):
            lo = carry
            mid = lo + jnp.left_shift(jnp.int64(1), bit)
            # f(mid-1) < half  ->  median > mid-1  ->  keep the bit
            lo = jnp.where(probe(mid - 1).astype(jnp.float64) < half, mid, lo)
            return lo, None

        bits = jnp.arange(_level_bits(lmax) - 1, -1, -1, dtype=jnp.int64)
        median, _ = jax.lax.scan(bisect, jnp.int64(0), bits)
        level = jnp.where(matches == 0, EMPTY_TILE_LEVEL, median)
        counts = jax.lax.dynamic_update_slice(counts, new_window, (start,))
        return counts, level

    _, levels = jax.lax.scan(step, counts0, (starts, iv_start, iv_end))
    return levels


def assign_tile_levels(t: PafTable, order: np.ndarray) -> np.ndarray:
    """Compute tile levels for records processed in ``order`` (best-first).

    Returns levels aligned to the original record indexing of ``t``.
    """
    n = len(t)
    levels = np.full(n, EMPTY_TILE_LEVEL, dtype=np.int64)
    if n == 0:
        return levels

    # global query coordinate space: one offset per distinct query name
    offsets: dict[str, int] = {}
    lengths: dict[str, int] = {}
    total = 0
    for i in range(n):
        nm = t.qname[i]
        if nm not in offsets:
            offsets[nm] = total
            lengths[nm] = int(t.qlen[i])
            total += int(t.qlen[i])
        elif lengths[nm] != int(t.qlen[i]):
            raise ValueError(f"query {nm!r} has inconsistent lengths")

    rec, istart, iend = match_intervals(t)
    # order the records and their runs by the processing order
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n)

    span = int(np.max(t.qend - t.qstart)) if n else 1
    span_b = bucket_size(max(span, 1), minimum=128)
    runs_per_rec = np.zeros(n, dtype=np.int64)
    np.add.at(runs_per_rec, rec, 1)
    k_b = bucket_size(max(int(runs_per_rec.max(initial=0)), 1), minimum=8)

    qoff = np.array([offsets[t.qname[i]] for i in range(n)], dtype=np.int64)
    starts = (qoff + t.qstart)[order]

    # pack run intervals into [N, K] (relative to each record's window);
    # padding entries have start == end == span_b (scatter-dropped)
    iv_s = np.full((n, k_b), span_b, dtype=np.int64)
    iv_e = np.full((n, k_b), span_b, dtype=np.int64)
    if len(rec):
        rr = rank[rec]
        order_in_rec = np.zeros(len(rec), dtype=np.int64)
        srt = np.argsort(rr, kind="stable")
        rr_s = rr[srt]
        first = np.searchsorted(rr_s, rr_s, side="left")
        order_in_rec[srt] = np.arange(len(rec)) - first
        rel_s = istart - t.qstart[rec]
        rel_e = iend - t.qstart[rec]
        iv_s[rr, order_in_rec] = rel_s
        iv_e[rr, order_in_rec] = rel_e

    lmax = min(bucket_size(n + 2, minimum=64), 32768)
    lv = _tile_scan(jnp.asarray(starts), jnp.asarray(iv_s), jnp.asarray(iv_e),
                    span=span_b, lmax=lmax, total=total)
    levels[order] = np.asarray(lv)
    return levels


def tile_sort_order(t: PafTable) -> np.ndarray:
    """Best-first processing order: descending (chain_score, score), ties in
    input order (paf_cmp_by_descending_score, impl/paf_tile.c:28-34)."""
    return np.lexsort((np.arange(len(t)), -t.score, -t.chain_score))

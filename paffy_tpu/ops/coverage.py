"""Alignment coverage maps over query sequences.

Reference: SequenceCountArray + increase_alignment_level_counts
(impl/paf.c:669-709): per-base uint16 counts keyed by query name, incremented
for every base of every aligned (M/=/X) run, saturating at INT16_MAX-1.

Instead of per-base increments, coverage is built as an interval difference
array (+1 at run start, -1 at run end) followed by one prefix sum — O(runs +
sequence length) instead of O(covered bases).  Saturating increments never
decrease, so clipping the exact counts at INT16_MAX-1 reproduces the
reference's per-base saturation bit-for-bit.

The coordinate walk matches the reference exactly: the query cursor starts at
query_start and advances through non-delete ops in cigar order regardless of
strand (impl/paf.c:690-709).
"""

from __future__ import annotations

import numpy as np

from paffy_tpu.core.model import PafTable, QUERY_DELETE, QUERY_INSERT
from paffy_tpu.core.segsum import segment_ids_from_offsets

# test hook: force the vectorized numpy form of match_intervals
FORCE_NUMPY = False

SATURATION = 32766  # INT16_MAX - 1 (impl/paf.c:700)
EMPTY_TILE_LEVEL = 32767  # INT16_MAX sentinel for empty-match records (impl/paf_tile.c:64)


def match_intervals(t: PafTable) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """All aligned-run query intervals of a batch.

    Returns (rec_id, start, end) flat arrays — one entry per M/=/X run, with
    query coordinates computed by the reference's forward walk from
    query_start.
    """
    if len(t.ops) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    if not FORCE_NUMPY:
        # one native pass (the vectorized form below — oracle + fallback —
        # pays ~10 O(ops) array passes: ~2 s on the 13.6M-op shattered
        # golden vs ~0.05 s native)
        from paffy_tpu import native
        res = native.match_intervals(t.off, t.ops, t.lens, t.qstart)
        if res is not None:
            return res
    seg = segment_ids_from_offsets(t.off, len(t.ops))
    advances = np.where(t.ops != QUERY_DELETE, t.lens, 0)
    c = np.cumsum(advances)
    base = np.concatenate([[0], c])[t.off[:-1]]
    excl = c - advances - base[seg]          # query offset before this op
    is_aligned = (t.ops != QUERY_DELETE) & (t.ops != QUERY_INSERT)
    sel = np.nonzero(is_aligned)[0]
    rec = seg[sel]
    start = t.qstart[rec] + excl[sel]
    end = start + t.lens[sel]
    return rec, start, end


class CoverageMap:
    """Per-sequence coverage count arrays, built lazily in first-seen order."""

    def __init__(self):
        self.names: list[str] = []
        self._idx: dict[str, int] = {}
        self.lengths: list[int] = []
        self._diffs: list[np.ndarray] = []

    def _get(self, name: str, length: int) -> int:
        i = self._idx.get(name)
        if i is None:
            i = len(self.names)
            self._idx[name] = i
            self.names.append(name)
            self.lengths.append(int(length))
            # int32 diffs: values are bounded by record counts per base and
            # saturate at uint16 anyway; halves the materialization traffic
            self._diffs.append(np.zeros(int(length) + 1, dtype=np.int32))
        else:
            if self.lengths[i] != int(length):
                raise ValueError(
                    f"sequence {name!r} seen with inconsistent lengths "
                    f"{self.lengths[i]} vs {length}")
        return i

    def register_batch(self, names: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        """Vectorized ``_get`` over parallel name/length arrays: registers
        unseen names in first-seen order and returns the index array.  Only
        DISTINCT names touch Python — the per-record loop was an
        interpreter-bound O(n) pass per batch on streaming commands."""
        names = np.asarray(names, dtype=object)
        lengths = np.asarray(lengths, dtype=np.int64)
        if len(names) == 0:
            return np.empty(0, dtype=np.int64)
        uniq, first, inv = np.unique(names, return_index=True,
                                     return_inverse=True)
        # np.unique sorts lexicographically; registration must follow
        # first-seen input order
        for j in np.argsort(first, kind="stable").tolist():
            self._get(uniq[j], int(lengths[first[j]]))
        base = np.fromiter((self._idx[nm] for nm in uniq),
                           dtype=np.int64, count=len(uniq))
        idx = base[inv]
        # every occurrence (not just the first) must match the registered
        # length — same invariant the scalar loop enforced per record
        reg = np.asarray(self.lengths, dtype=np.int64)[idx]
        off = np.nonzero(reg != lengths)[0]
        if len(off):
            i = int(off[0])
            raise ValueError(
                f"sequence {names[i]!r} seen with inconsistent lengths "
                f"{reg[i]} vs {lengths[i]}")
        return idx

    def add(self, t: PafTable) -> None:
        """Accumulate coverage of a batch's query sequences."""
        rec, start, end = match_intervals(t)
        # register sequences in record order even when a record has no runs
        seq_of_rec = self.register_batch(t.qname, t.qlen)
        if len(rec) == 0:
            return
        sid = seq_of_rec[rec]
        from paffy_tpu import native
        for i in np.unique(sid):
            m = sid == i
            d = self._diffs[int(i)]
            if not native.coverage_add(d, start[m], end[m]):
                np.add.at(d, start[m], 1)   # no-toolchain fallback
                np.add.at(d, end[m], -1)

    def counts(self, name: str) -> np.ndarray:
        """Materialize the saturated uint16 count array for one sequence."""
        i = self._idx[name]
        from paffy_tpu import native
        res = native.coverage_counts(self._diffs[i][:-1], SATURATION)
        if res is not None:   # one native pass; numpy chain is the fallback
            return res
        c = np.cumsum(self._diffs[i][:-1])
        return np.minimum(c, SATURATION).astype(np.uint16)


def run_length_rows(counts: np.ndarray, binary: bool) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """RLE of a count array: (starts, ends, values) of maximal equal runs
    (write_bed, impl/paf_to_bed.c:33-55).  With binary=True runs split on the
    >0 indicator instead of the exact count."""
    if len(counts) == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z.copy(), z.copy()
    from paffy_tpu import native
    res = native.rle_u16(counts, binary)  # two passes at memory speed
    if res is not None:
        return res
    key = (counts > 0).astype(np.int64) if binary else counts.astype(np.int64)
    change = np.nonzero(key[1:] != key[:-1])[0] + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [len(counts)]])
    return starts, ends, counts[starts].astype(np.int64)

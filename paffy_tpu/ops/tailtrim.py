"""Identity-based unreliable-tail trimming (the Bob Harris algorithm).

Reference: paf_trim_unreliable_tails / paf_trim_unreliable_prefix /
paf_trim_unreliable_ends2 / paf_trim_upto (impl/paf.c:811-953):

  1. whole-alignment identity i = matches/(matches+mismatches) with indel
     bases counted as mismatches (impl/paf.c:823-827);
  2. longest prefix with prefix-identity < i - i*score_fraction, bounded by
     max_trim columns (impl/paf.c:829-839);
  3. shrink that prefix by re-including its longest suffix with identity >= i
     (impl/paf.c:877-890);
  4. trim whole ops up to that point with strand-aware coordinate updates
     (impl/paf.c:842-861); invert, repeat for the suffix, invert back.

All floating-point comparisons replicate the reference's mixed float32/double
arithmetic (float casts at impl/paf.c:832,886,923; float parameters at
impl/paf.c:863) so trim decisions are bit-identical.

Implemented as whole-batch numpy over the flat CSR op store (the per-op work
is O(total ops); the expensive per-column work never materializes here).
"""

from __future__ import annotations

from dataclasses import replace
import numpy as np

from paffy_tpu.core.model import PafTable, MATCH, QUERY_INSERT, QUERY_DELETE, SEQ_MATCH
from paffy_tpu.core.segsum import segment_ids_from_offsets, segment_sums_by_offsets
from paffy_tpu.ops.transforms import invert, _reverse_csr

# test hook: force the vectorized numpy reference form of _trim_counts
FORCE_NUMPY = False


def _match_mismatch_lens(ops: np.ndarray, lens: np.ndarray):
    is_match = (ops == MATCH) | (ops == SEQ_MATCH)
    m = np.where(is_match, lens, 0)
    mm = np.where(~is_match, lens, 0)  # X, I and D all count as mismatches
    return m, mm


def _seg_prefix(vals: np.ndarray, off: np.ndarray, seg: np.ndarray):
    """Inclusive per-segment prefix sums of flat values."""
    c = np.cumsum(vals)
    base = np.concatenate([[0], c])[off[:-1]]
    return c - base[seg]


def _trim_counts(ops, lens, off, thr_f32, id_f32, max_trim):
    """Per-record number of leading ops to drop (the prefix-trim decision)."""
    n = len(off) - 1
    if len(ops) == 0:
        return np.zeros(n, dtype=np.int64)
    if not FORCE_NUMPY:
        # host production path: one native pass per record (the vectorized
        # numpy form below — the oracle + no-toolchain fallback — pays
        # ~6 s of ufunc.at/astype passes on the 13.6M-op shattered golden)
        from paffy_tpu import native
        is_match = (ops == MATCH) | (ops == SEQ_MATCH)
        res = native.trim_counts(off, is_match, lens, thr_f32, id_f32,
                                 max_trim)
        if res is not None:
            return res
    seg = segment_ids_from_offsets(off, len(ops))
    m, mm = _match_mismatch_lens(ops, lens)
    pm = _seg_prefix(m, off, seg)
    pmm = _seg_prefix(mm, off, seg)
    cols = pm + pmm

    # ends2: break out once cumulative columns exceed max_trim (the check runs
    # BEFORE this op's identity test, impl/paf.c:829-831)
    within = (max_trim[seg] < 0) | (cols <= max_trim[seg])
    prefix_identity = (pm.astype(np.float32) / cols.astype(np.float32)).astype(np.float64)
    low = within & (prefix_identity < thr_f32[seg].astype(np.float64))
    pos = np.arange(len(ops), dtype=np.int64) - off[:-1][seg]
    cand = np.where(low, pos, -1)
    trim_idx = _seg_max(cand, off, seg, n, fill=-1)

    # suffix re-inclusion: for i in [0..trim_idx], suffix sums over [i..trim_idx]
    # = prefix(trim_idx) - prefix(i-1); keep the smallest i with
    # suffix-identity >= identity (impl/paf.c:877-890)
    has = trim_idx >= 0
    # prefix at trim_idx, per record, gathered at flat position
    ti_flat = off[:-1] + np.clip(trim_idx, 0, None)
    pm_ti = np.where(has, pm[np.clip(ti_flat, 0, max(len(ops) - 1, 0))], 0)
    pmm_ti = np.where(has, pmm[np.clip(ti_flat, 0, max(len(ops) - 1, 0))], 0)
    suf_m = pm_ti[seg] - (pm - m)     # suffix starting at this op
    suf_mm = pmm_ti[seg] - (pmm - mm)
    in_prefix = has[seg] & (pos <= trim_idx[seg])
    suf_cols = suf_m + suf_mm
    suf_identity = (suf_m.astype(np.float32)
                    / suf_cols.astype(np.float32)).astype(np.float64)
    ok = in_prefix & (suf_identity >= id_f32[seg].astype(np.float64))
    best_suffix_start = _seg_min(np.where(ok, pos, np.iinfo(np.int64).max),
                                 off, seg, n, fill=np.iinfo(np.int64).max)
    trim_count = np.where(
        has,
        np.where(best_suffix_start < np.iinfo(np.int64).max,
                 best_suffix_start, trim_idx + 1),
        0)
    return trim_count


def _seg_max(vals, off, seg, n, fill):
    out = np.full(n, fill, dtype=np.int64)
    np.maximum.at(out, seg, vals)
    return out


def _seg_min(vals, off, seg, n, fill):
    out = np.full(n, fill, dtype=np.int64)
    np.minimum.at(out, seg, vals)
    return out


def _trim_upto(t: PafTable, trim_count: np.ndarray) -> PafTable:
    """Drop the first trim_count ops per record with coordinate updates
    (paf_trim_upto, impl/paf.c:842-861)."""
    if len(t.ops) == 0:
        return t
    seg = segment_ids_from_offsets(t.off, len(t.ops))
    pos = np.arange(len(t.ops), dtype=np.int64) - t.off[:-1][seg]
    dropped = pos < trim_count[seg]
    dq = np.where(dropped & (t.ops != QUERY_DELETE), t.lens, 0)
    dt = np.where(dropped & (t.ops != QUERY_INSERT), t.lens, 0)
    q_delta = segment_sums_by_offsets(dq, t.off)
    t_delta = segment_sums_by_offsets(dt, t.off)

    keep = ~dropped
    new_ops = t.ops[keep]
    new_lens = t.lens[keep]
    per_rec = (t.off[1:] - t.off[:-1]) - trim_count
    new_off = np.zeros(len(t) + 1, dtype=np.int64)
    np.cumsum(per_rec, out=new_off[1:])

    qstart = t.qstart + np.where(t.strand, q_delta, 0)
    qend = t.qend - np.where(t.strand, 0, q_delta)
    tstart = t.tstart + t_delta
    return replace(t, qstart=qstart, qend=qend, tstart=tstart,
                   ops=new_ops, lens=new_lens, off=new_off)


def trim_unreliable_tails(t: PafTable, score_fraction: float,
                          max_fraction_to_trim: float) -> PafTable:
    """paf_trim_unreliable_tails over a whole batch (impl/paf.c:906-953)."""
    if len(t) == 0 or (len(t.ops) == 0 and t.raw_cg is None):
        return t
    from paffy_tpu import native
    if not FORCE_NUMPY and t.raw_cg is not None:
        # raw-cigar streaming path: trim only drops whole ops from the
        # ends, so each record's kept cigar is a contiguous SUBSTRING of
        # its raw cg text — one tokenizing sweep rewrites the cg byte
        # ranges in place of a parse + CSR rebuild + re-render
        # (paf_trim.c reads with parse_cigar=1; canonical text round-trips
        # byte-identically, and the raw parser's validate pass falls back
        # to full parse on non-canonical input upstream).
        res = native.trim_tails_raw(t, score_fraction,
                                    max_fraction_to_trim)
        if res is not None:
            cg_a, cg_n, dq1, dt1, dq2, dt2 = res
            raw_buf, cg_start, cg_len = t.raw_cg
            if (np.array_equal(cg_a, cg_start)
                    and np.array_equal(cg_n, cg_len)):
                return t  # nothing trimmed anywhere in the batch
            return replace(
                t,
                qstart=t.qstart + np.where(t.strand, dq1, 0) + dq2,
                qend=t.qend - np.where(t.strand, 0, dq1),
                tstart=t.tstart + dt1 + np.where(t.strand, dt2, 0),
                tend=t.tend - np.where(t.strand, 0, dt2),
                raw_cg=(raw_buf, cg_a, cg_n))
    if t.raw_cg is not None:
        # raw table but the raw fast path was unavailable (FORCE_NUMPY /
        # no toolchain): materialize the op arrays and continue below
        from paffy_tpu.core import pafio
        t = pafio.parse_paf_data(bytes(pafio.serialize_paf_bytes(t)))
        if len(t.ops) == 0:
            return t
    if not FORCE_NUMPY and native.get_lib() is not None:
        # production path: identity stats, both decisions AND the apply in
        # one threaded native sweep.  The suffix decision runs on the
        # LOGICALLY inverted table (op order reversed only for
        # opposite-strand records, paf_invert impl/paf.c:487-489) without
        # materializing the invert, so each record's kept ops are one
        # contiguous input range; the CSR rebuild is a threaded memcpy per
        # record instead of the ~8 numpy full-array passes of the oracle
        # form below.
        res = native.trim_tails_apply(t.off, t.ops, t.lens, t.strand,
                                      score_fraction, max_fraction_to_trim)
        keep_a, keep_b, dq1, dt1, dq2, dt2 = res
        if (np.array_equal(keep_a, t.off[:-1])
                and np.array_equal(keep_b, t.off[1:])):
            return t  # nothing trimmed anywhere in the batch
        new_off = np.zeros(len(t) + 1, dtype=np.int64)
        np.cumsum(keep_b - keep_a, out=new_off[1:])
        new_ops, new_lens = native.copy_op_ranges(keep_a, keep_b, new_off,
                                                  t.ops, t.lens)
        # pass 1 trims the cigar front: query consumed from qstart ('+') or
        # qend ('-'), target always from tstart.  Pass 2 (inverted frame)
        # consumes query from qstart on BOTH strands (for '+' this re-trims
        # the front — the reference quirk above) and target from tstart
        # ('+') or tend ('-').
        return replace(
            t,
            qstart=t.qstart + np.where(t.strand, dq1, 0) + dq2,
            qend=t.qend - np.where(t.strand, 0, dq1),
            tstart=t.tstart + dt1 + np.where(t.strand, dt2, 0),
            tend=t.tend - np.where(t.strand, 0, dt2),
            ops=new_ops, lens=new_lens, off=new_off)

    # numpy oracle / no-toolchain fallback
    m, mm = _match_mismatch_lens(t.ops, t.lens)
    tot_m = segment_sums_by_offsets(m, t.off)
    tot_mm = segment_sums_by_offsets(mm, t.off)
    cols = tot_m + tot_mm
    with np.errstate(invalid="ignore", divide="ignore"):
        id_f32 = tot_m.astype(np.float32) / cols.astype(np.float32)
        id64 = id_f32.astype(np.float64)
        thr64 = id64 - id64 * np.float64(np.float32(score_fraction))
    thr_f32 = thr64.astype(np.float32)   # narrowed at the call boundary
    # max_trim = (m+mm) * max_fraction_to_trim in float32, truncated
    max_trim = np.trunc(cols.astype(np.float32)
                        * np.float32(max_fraction_to_trim)).astype(np.int64)
    with np.errstate(invalid="ignore", divide="ignore"):
        tc = _trim_counts(t.ops, t.lens, t.off, thr_f32, id_f32, max_trim)
        t = _trim_upto(t, tc)
        t = invert(t)
        tc = _trim_counts(t.ops, t.lens, t.off, thr_f32, id_f32, max_trim)
        t = _trim_upto(t, tc)
        t = invert(t)
    return t

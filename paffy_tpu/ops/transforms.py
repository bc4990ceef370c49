"""Vectorized per-record PAF transforms over the CSR cigar store.

These replace the reference's per-record pointer-walking loops with whole-batch
array operations: every function maps a PafTable -> PafTable with no Python
loop over records.  The per-op metadata work here is O(total ops) and
host-natural; the per-alignment-column hot paths live in the device kernels
(paffy_tpu.ops.mismatch / coverage / chain / tile).

Reference semantics implemented (file:line cites into /root/reference):
  * invert            impl/paf.c:469-490
  * remove mismatches impl/paf.c:786-809
  * fixed end trim    impl/paf.c:518-598
  * shatter           impl/paf.c:600-663
  * stats             impl/paf.c:236-260
"""

from __future__ import annotations

from dataclasses import replace
import numpy as np

from paffy_tpu.core.model import (PafTable, MATCH, QUERY_INSERT, QUERY_DELETE,
                                  SEQ_MATCH, SEQ_MISMATCH)
from paffy_tpu.core.segsum import segment_sums_by_offsets, segment_ids_from_offsets

_ALIGNED = np.zeros(5, dtype=bool)
_ALIGNED[[MATCH, SEQ_MATCH, SEQ_MISMATCH]] = True
# I <-> D relabel table used by invert (impl/paf.c:477-485)
_INVERT_OP = np.array([MATCH, QUERY_DELETE, QUERY_INSERT, SEQ_MATCH, SEQ_MISMATCH],
                      dtype=np.uint8)


def _seg_pos(off: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(segment id, position within segment) for each flat op."""
    total = int(off[-1])
    seg = segment_ids_from_offsets(off, total)
    pos = np.arange(total, dtype=np.int64) - off[seg]
    return seg, pos


def aligned_base_counts(t: PafTable) -> np.ndarray:
    """Per-record aligned bases: sum of M/=/X run lengths
    (paf_get_number_of_aligned_bases, impl/paf.c:507-516)."""
    vals = np.where(_ALIGNED[t.ops], t.lens, 0)
    return segment_sums_by_offsets(vals, t.off)


def stats_calc_with_m(t: PafTable) -> tuple[dict[str, np.ndarray], np.ndarray]:
    """Per-record alignment stats plus M-only base counts (the view
    pipeline's kernel-adjustment term), in one native pass when available
    (the 6-sum numpy path below costs ~24 array passes over the op store —
    measured ~1s at 5.9M ops)."""
    from paffy_tpu import native
    if t.raw_cg is not None:
        # raw-cigar tables: tokenize the stats straight from the cg text
        # (no op arrays exist to sum)
        out = native.cigar_stats_raw(t)
    else:
        out = native.cigar_stats(len(t), t.ops, t.lens, t.off)
    if out is not None:
        keys = ("matches", "mismatches", "query_inserts", "query_deletes",
                "query_insert_bases", "query_delete_bases")
        return ({k: np.ascontiguousarray(out[:, i])
                 for i, k in enumerate(keys)}, np.ascontiguousarray(out[:, 6]))
    stats = _stats_calc_numpy(t)
    m_only = segment_sums_by_offsets(
        np.where(t.ops == MATCH, t.lens, 0), t.off)
    return stats, m_only


def stats_calc(t: PafTable) -> dict[str, np.ndarray]:
    """Per-record alignment stats (paf_stats_calc, impl/paf.c:236-260).

    matches counts M and = runs; mismatches counts X; insert/delete report
    both event counts and base counts.
    """
    return stats_calc_with_m(t)[0]


def _stats_calc_numpy(t: PafTable) -> dict[str, np.ndarray]:
    """No-toolchain fallback and oracle for the native cigar_stats pass."""
    is_m = (t.ops == MATCH) | (t.ops == SEQ_MATCH)
    is_x = t.ops == SEQ_MISMATCH
    is_i = t.ops == QUERY_INSERT
    is_d = t.ops == QUERY_DELETE
    return {
        "matches": segment_sums_by_offsets(np.where(is_m, t.lens, 0), t.off),
        "mismatches": segment_sums_by_offsets(np.where(is_x, t.lens, 0), t.off),
        "query_inserts": segment_sums_by_offsets(is_i.astype(np.int64), t.off),
        "query_deletes": segment_sums_by_offsets(is_d.astype(np.int64), t.off),
        "query_insert_bases": segment_sums_by_offsets(np.where(is_i, t.lens, 0), t.off),
        "query_delete_bases": segment_sums_by_offsets(np.where(is_d, t.lens, 0), t.off),
    }


def invert(t: PafTable) -> PafTable:
    """Swap query<->target, relabel I<->D, and reverse op order for
    opposite-strand records (paf_invert, impl/paf.c:469-490)."""
    rev = ~t.strand
    res = None
    if len(t.ops):
        from paffy_tpu import native
        # production path: fused relabel+reverse in one threaded native
        # pass; the numpy permutation form below is the fallback
        res = native.invert_ops(t.off, t.ops, t.lens, rev)
    if res is not None:
        new_ops, new_lens = res
    else:
        new_ops = _INVERT_OP[t.ops]
        new_lens = t.lens
        if rev.any() and len(t.ops):
            seg, pos = _seg_pos(t.off)
            cnt = t.off[1:] - t.off[:-1]
            flip = rev[seg]
            perm = np.where(flip, t.off[seg] + (cnt[seg] - 1 - pos),
                            np.arange(len(t.ops), dtype=np.int64))
            new_ops = new_ops[perm]
            new_lens = t.lens[perm]
    return replace(
        t,
        qname=t.tname, qlen=t.tlen, qstart=t.tstart, qend=t.tend,
        tname=t.qname, tlen=t.qlen, tstart=t.qstart, tend=t.qend,
        ops=new_ops, lens=new_lens)


def remove_mismatches(t: PafTable) -> PafTable:
    """Merge consecutive M/=/X runs into maximal M runs; I/D kept as-is
    (paf_remove_mismatches, impl/paf.c:786-809).

    Note the reference merges only adjacent *aligned* runs (consecutive I or D
    runs are written through unmerged); we match that exactly.
    """
    if len(t.ops) == 0:
        return t
    ops = np.where(_ALIGNED[t.ops], np.uint8(MATCH), t.ops)
    seg = segment_ids_from_offsets(t.off, len(ops))
    first = np.ones(len(ops), dtype=bool)
    first[1:] = seg[1:] != seg[:-1]
    prev_m = np.zeros(len(ops), dtype=bool)
    prev_m[1:] = ops[:-1] == MATCH
    # a new output run starts unless this op is an M continuing a previous M
    boundary = first | (ops != MATCH) | ~prev_m
    gid = np.cumsum(boundary) - 1
    n_groups = int(gid[-1]) + 1
    new_lens = np.zeros(n_groups, dtype=np.int64)
    np.add.at(new_lens, gid, t.lens)
    new_ops = ops[boundary]
    # per-record new offsets: count groups per record
    grp_seg = seg[boundary]
    per_rec = np.zeros(len(t), dtype=np.int64)
    np.add.at(per_rec, grp_seg, 1)
    new_off = np.zeros(len(t) + 1, dtype=np.int64)
    np.cumsum(per_rec, out=new_off[1:])
    return t.with_cigars(new_ops, new_lens, new_off)


# ------------------------------------------------------------------- trimming

def _front_trim_plan(ops, lens, off, targets):
    """Front-trim plan on a CSR store (cigar_trim, impl/paf.c:518-545).

    Consumes leading ops while (op not aligned) or (aligned bases consumed so
    far < target); an aligned op spanning the target is partially trimmed.
    Returns (keep mask over flat ops, per-op length reduction, per-record
    query-consumed, per-record target-consumed).
    """
    total = len(ops)
    if total == 0:
        n = len(off) - 1
        z = np.zeros(n, dtype=np.int64)
        return np.ones(0, dtype=bool), np.zeros(0, dtype=np.int64), z, z.copy()
    seg = segment_ids_from_offsets(off, total)
    aligned = _ALIGNED[ops]
    al = np.where(aligned, lens, 0)
    c = np.cumsum(al)
    seg_base = np.concatenate([[0], c])[off[:-1]]  # cumsum before each segment
    A_incl = c - seg_base[seg]   # inclusive prefix of aligned lens, per record
    A_excl = A_incl - al
    tgt = targets[seg]
    # stop op: first aligned op with A_excl + len > target
    stop_candidate = aligned & (A_incl > tgt)
    # consumed: every op before its record's stop op; if no stop op, all ops
    # consumed.  An op is before the stop iff (A_incl <= tgt) or (not aligned
    # and A_excl <= tgt)  -- indels sitting at the boundary are consumed.
    consumed = np.where(aligned, A_incl <= tgt, A_excl <= tgt)
    consumed &= ~stop_candidate
    partial = np.where(stop_candidate, np.maximum(tgt - A_excl, 0), 0)
    # coordinate deltas
    q_consuming = ops != QUERY_DELETE
    t_consuming = ops != QUERY_INSERT
    dq = np.where(consumed & q_consuming, lens, 0) + np.where(stop_candidate, partial, 0)
    dt = np.where(consumed & t_consuming, lens, 0) + np.where(stop_candidate, partial, 0)
    q_delta = segment_sums_by_offsets(dq, off)
    t_delta = segment_sums_by_offsets(dt, off)
    return ~consumed, np.where(stop_candidate, partial, 0), q_delta, t_delta


def _apply_plan(ops, lens, off, keep, reduce_by):
    new_ops = ops[keep]
    new_lens = (lens - reduce_by)[keep]
    seg = segment_ids_from_offsets(off, len(ops)) if len(ops) else np.zeros(0, np.int64)
    per_rec = np.zeros(len(off) - 1, dtype=np.int64)
    if len(ops):
        np.add.at(per_rec, seg[keep], 1)
    new_off = np.zeros(len(off), dtype=np.int64)
    np.cumsum(per_rec, out=new_off[1:])
    return new_ops, new_lens, new_off


def _reverse_csr(ops, lens, off):
    if len(ops) == 0:
        return ops, lens
    seg = segment_ids_from_offsets(off, len(ops))
    pos = np.arange(len(ops), dtype=np.int64) - off[seg]
    cnt = off[1:] - off[:-1]
    perm = off[seg] + (cnt[seg] - 1 - pos)
    return ops[perm], lens[perm]


def trim_ends(t: PafTable, bases: np.ndarray | int) -> PafTable:
    """Trim N aligned bases (plus boundary indels) from each end
    (paf_trim_ends, impl/paf.c:578-587), with the strand-dependent coordinate
    bookkeeping of the reference."""
    n = len(t)
    targets = np.broadcast_to(np.asarray(bases, dtype=np.int64), (n,)).copy()

    # -- front trim
    keep, red, dq_f, dt_f = _front_trim_plan(t.ops, t.lens, t.off, targets)
    ops1, lens1, off1 = _apply_plan(t.ops, t.lens, t.off, keep, red)

    # -- back trim: reverse each record, front-trim, reverse back
    rops, rlens = _reverse_csr(ops1, lens1, off1)
    keep_b, red_b, dq_b, dt_b = _front_trim_plan(rops, rlens, off1, targets)
    ops2r, lens2r, off2 = _apply_plan(rops, rlens, off1, keep_b, red_b)
    ops2, lens2 = _reverse_csr(ops2r, lens2r, off2)

    qstart, qend = t.qstart.copy(), t.qend.copy()
    tstart, tend = t.tstart.copy(), t.tend.copy()
    s = t.strand
    # same_strand: front -> (qstart+, tstart+); back -> (qend-, tend-)
    # opposite:    front -> (qend-, tstart+); back -> (qstart+, tend-)
    qstart += np.where(s, dq_f, dq_b)
    qend -= np.where(s, dq_b, dq_f)
    tstart += dt_f
    tend -= dt_b
    return replace(t, qstart=qstart, qend=qend, tstart=tstart, tend=tend,
                   ops=ops2.astype(np.uint8), lens=lens2.astype(np.int64),
                   off=off2.astype(np.int64))


def trim_end_fraction(t: PafTable, percentage: float) -> PafTable:
    """paf_trim_end_fraction (impl/paf.c:589-598): per-record trim of
    floor(float32(aligned_bases * percentage) / 2.0) bases from each end."""
    assert 0.0 <= percentage <= 1.0
    ab = aligned_base_counts(t)
    # C arithmetic: int64 * float -> float32 product, / 2.0 in double, then
    # int64 truncation (impl/paf.c:593)
    per_end = np.trunc((ab.astype(np.float32) * np.float32(percentage))
                       .astype(np.float64) / 2.0).astype(np.int64)
    return trim_ends(t, per_end)


# -------------------------------------------------------------------- shatter

def shatter(t: PafTable) -> PafTable:
    """Explode every M run into its own gapless single-op record
    (paf_shatter/paf_shatter2, impl/paf.c:600-663).

    Mirrors the reference exactly, including the quirk that shattered records
    inherit score/mapq/tile_level/type/chain_id but get chain_score=0 (the
    calloc'd default in paf_shatter2, impl/paf.c:601-622), and the backward
    query walk for opposite-strand records.
    """
    if np.any((t.ops == SEQ_MATCH) | (t.ops == SEQ_MISMATCH)):
        raise ValueError("paf shatter requires M-encoded cigars (no =/X runs)")
    if len(t.ops) == 0:
        return PafTable.empty()
    from paffy_tpu import native
    res = None
    if native.get_lib() is not None:
        # production path: the per-op coordinate walk in one threaded native
        # CSR pass (the numpy form below pays ~8 full-array passes)
        is_m = t.ops == MATCH
        m_per_rec = segment_sums_by_offsets(is_m.astype(np.int64), t.off)
        m_base = np.zeros(len(t) + 1, dtype=np.int64)
        np.cumsum(m_per_rec, out=m_base[1:])
        k = int(m_base[-1])
        res = native.shatter_walk(t.off, t.ops, t.lens, t.qstart, t.qend,
                                  t.tstart, t.strand, m_base[:-1], k)
    if res is not None:
        rec, q_m, t_m, ln = res
    else:
        seg = segment_ids_from_offsets(t.off, len(t.ops))
        q_consuming = t.ops != QUERY_DELETE
        t_consuming = t.ops != QUERY_INSERT
        # exclusive prefix sums of query/target consumption within each record
        qc = np.cumsum(np.where(q_consuming, t.lens, 0))
        tc = np.cumsum(np.where(t_consuming, t.lens, 0))
        seg_base_q = np.concatenate([[0], qc])[t.off[:-1]]
        seg_base_t = np.concatenate([[0], tc])[t.off[:-1]]
        q_excl = qc - np.where(q_consuming, t.lens, 0) - seg_base_q[seg]
        t_excl = tc - np.where(t_consuming, t.lens, 0) - seg_base_t[seg]

        is_m = t.ops == MATCH
        # query coordinate of each shard:
        #   '+' strand: qstart + q_excl                 (walk forward)
        #   '-' strand: qend - q_excl - len             (walk backward)
        q_coord = np.where(t.strand[seg],
                           t.qstart[seg] + q_excl,
                           t.qend[seg] - q_excl - t.lens)
        t_coord = t.tstart[seg] + t_excl

        m = np.nonzero(is_m)[0]
        rec = seg[m]
        ln = t.lens[m]
        q_m = q_coord[m]
        t_m = t_coord[m]
    k = len(rec)
    return PafTable(
        qname=t.qname[rec], qlen=t.qlen[rec],
        qstart=q_m, qend=q_m + ln,
        strand=t.strand[rec],
        tname=t.tname[rec], tlen=t.tlen[rec],
        tstart=t_m, tend=t_m + ln,
        num_matches=ln.copy(), num_bases=ln.copy(),
        mapq=t.mapq[rec], score=t.score[rec],
        tile_level=t.tile_level[rec],
        chain_id=t.chain_id[rec],
        chain_score=np.zeros(k, dtype=np.int64),  # calloc'd, never set
        type=t.type[rec],
        has_cigar=np.ones(k, dtype=bool),
        ops=np.full(k, MATCH, dtype=np.uint8),
        lens=ln.astype(np.int64),
        off=np.arange(k + 1, dtype=np.int64))


def query_walk_violation(t: PafTable, seen_qlens: dict | None = None) -> int:
    """First record violating the reference's query-side coverage-walk
    asserts, or -1.  Used by tile and to_bed, whose reference mains buffer
    ALL output until after the walk — an assert aborts with nothing
    written (increase_alignment_level_counts impl/paf.c:691-709,
    get_median_alignment_level impl/paf_tile.c:44-60,
    get_alignment_count_array impl/paf.c:686).

    The walk starts at qstart; I advances the cursor, D does not; every
    aligned (M/=/X) column must lie in [0, qend) and [0, qlen); the walk
    must END exactly at qend.  Records with no aligned columns skip the
    column bounds (the assert sits inside the per-column loop), and the
    target side is never examined.  ``seen_qlens`` (optional, mutated)
    carries the per-name query_length across batches: a repeated name
    with a different qlen trips the count-array length assert.

    One native pass when available; the numpy form below is the oracle
    and no-toolchain fallback.
    """
    n = len(t)
    if n == 0:
        return -1
    from paffy_tpu import native
    walk = native.query_walk_violation(t)
    if walk is None:
        walk = _query_walk_violation_numpy(t)
    bad = walk if walk >= 0 else n
    if seen_qlens is not None:
        uniq, first_idx, inv = np.unique(t.qname, return_index=True,
                                         return_inverse=True)
        expected = np.empty(len(uniq), dtype=np.int64)
        for k, nm in enumerate(uniq):
            expected[k] = seen_qlens.setdefault(nm, int(t.qlen[first_idx[k]]))
        nb = np.nonzero(t.qlen != expected[inv])[0]
        if len(nb):
            bad = min(bad, int(nb[0]))
    return -1 if bad == n else bad


def _query_walk_violation_numpy(t: PafTable) -> int:
    """Oracle / no-toolchain form of the native query_walk_violation."""
    n = len(t)
    bad = np.zeros(n, dtype=bool)
    if len(t.ops):
        seg = segment_ids_from_offsets(t.off, len(t.ops))
        q_consume = np.where(t.ops != QUERY_DELETE, t.lens, 0)
        span = segment_sums_by_offsets(q_consume, t.off)
        bad |= (t.qstart + span) != t.qend
        aligned = _ALIGNED[t.ops]
        # cursor position after each op (inclusive prefix), record-local
        c = np.cumsum(q_consume)
        base = np.concatenate([[0], c])[t.off[:-1]]
        after = c - base[seg]
        # aligned op k covers query columns [qstart+after-L, qstart+after)
        lo = t.qstart[seg] + after - t.lens
        hi = t.qstart[seg] + after
        col_bad = aligned & (t.lens > 0) & (
            (lo < 0) | (hi > t.qend[seg]) | (hi > t.qlen[seg]))
        if col_bad.any():
            bad[np.unique(seg[col_bad])] = True
    else:
        bad |= t.qstart != t.qend      # raw/cigarless: walk never moves
    b = np.nonzero(bad)[0]
    return int(b[0]) if len(b) else -1


def shatter_violation(t: PafTable):
    """(kind, record) of the first record the reference's shatter would
    die on, or (None, -1).  kind 'abort' = assert (SIGABRT: stdio buffer
    lost, nothing of the batch reaches the output); kind 'check' = the
    per-shard paf_check's st_errAbort (exit(1): stdio FLUSHES, so shards
    of the records before it reach the output).  paf_shatter walks ops in
    order asserting length >= 1 and op in {M, I, D} (=/X fail the
    query_delete assert), paf_check-ing every M shard as it is built, and
    asserting both walk ends land on the record's end coordinates
    (impl/paf.c:600-663, shard check at :624).

    One native pass when available; numpy oracle/fallback below.
    """
    n = len(t)
    if n == 0 or len(t.ops) == 0:
        return None, -1
    from paffy_tpu import native
    res = native.shatter_violation(t)
    if res is not None:
        return res
    return _shatter_violation_numpy(t)


def _shatter_violation_numpy(t: PafTable):
    """Oracle / no-toolchain form of the native shatter_violation."""
    n = len(t)
    seg = segment_ids_from_offsets(t.off, len(t.ops))
    q_consume = np.where(t.ops != QUERY_DELETE, t.lens, 0)
    t_consume = np.where(t.ops != QUERY_INSERT, t.lens, 0)
    cq = np.cumsum(q_consume)
    ct = np.cumsum(t_consume)
    baseq = np.concatenate([[0], cq])[t.off[:-1]]
    baset = np.concatenate([[0], ct])[t.off[:-1]]
    q_excl = cq - q_consume - baseq[seg]   # exclusive prefixes
    t_excl = ct - t_consume - baset[seg]
    abort_op = (t.lens < 1) | (t.ops == SEQ_MATCH) | (t.ops == SEQ_MISMATCH)
    is_m = t.ops == MATCH
    qs = np.where(t.strand[seg], t.qstart[seg] + q_excl,
                  t.qend[seg] - q_excl - t.lens)
    ts = t.tstart[seg] + t_excl
    shard_bad = is_m & (
        (qs < 0) | (qs + t.lens > t.qlen[seg])
        | (ts < 0) | (ts + t.lens > t.tlen[seg]))
    op_bad = abort_op | shard_bad
    span_bad = ((t.qstart + segment_sums_by_offsets(q_consume, t.off))
                != t.qend)
    span_bad |= ((t.tstart + segment_sums_by_offsets(t_consume, t.off))
                 != t.tend)
    op_rec = span_rec = n
    first_kind = None
    if op_bad.any():
        k0 = int(np.nonzero(op_bad)[0][0])
        op_rec = int(seg[k0])
        first_kind = "abort" if abort_op[k0] else "check"
    sb = np.nonzero(span_bad)[0]
    if len(sb):
        span_rec = int(sb[0])
    if op_rec == n and span_rec == n:
        return None, -1
    if span_rec < op_rec:
        return "abort", span_rec
    return first_kind, op_rec

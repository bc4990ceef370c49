"""paffy view: pretty print / stats oracle (reference: impl/paf_view.c).

Pipeline: load FASTAs into the device sequence pool, mismatch-encode every
record's M runs on device, then emit per-record stat lines, the optional
3-row base-level alignment rendering (impl/paf.c:282-314), and the aggregate
stats line with the -u/-v oracle thresholds (impl/paf_view.c:186-197).

Behavior note: the reference only accumulates aggregate totals under -s, so
running -u/-v without -s compares against 0/0=NaN and trips its assert; we
accumulate always, which preserves every tested behavior and makes -u/-v
meaningful standalone.
"""

from __future__ import annotations

import sys
import numpy as np

from paffy_tpu.commands.common import (base_parser, start, open_input,
                                        open_output, stream_tables)
from paffy_tpu.core import pafio
from paffy_tpu.core.model import QUERY_INSERT, QUERY_DELETE
from paffy_tpu.core.fasta import load_sequences, COMPLEMENT_TABLE, UPPER_TABLE, seq_to_bytes
from paffy_tpu.ops.mismatch import SequencePool, column_match_counts
from paffy_tpu.ops.transforms import stats_calc_with_m
from paffy_tpu.utils.logging import log_info


def _f(x: float) -> str:
    """C printf %f of a float value (6 decimals).  NaN keeps its sign bit:
    0.0f/0.0f yields -nan on x86 and glibc printf prints the sign, so the
    reference emits "-nan" for empty-match identities."""
    v = float(x)
    if v != v:
        return "-nan" if np.signbit(x) else "nan"
    return f"{v:.6f}"


def _ident(matches, mismatches):
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.float32(matches) / np.float32(matches + mismatches)


def _ident_gaps(matches, mismatches, qib, qdb):
    with np.errstate(invalid="ignore", divide="ignore"):
        return np.float32(matches) / np.float32(matches + mismatches + qib + qdb)


def pretty_print_record(t, i, stats, out, include_alignment, pool):
    """Per-record stat line + optional alignment rendering
    (paf_pretty_print, impl/paf.c:269-315)."""
    m = int(stats["matches"][i])
    x = int(stats["mismatches"][i])
    qi = int(stats["query_inserts"][i])
    qd = int(stats["query_deletes"][i])
    qib = int(stats["query_insert_bases"][i])
    qdb = int(stats["query_delete_bases"][i])
    out.write(
        f"Query:{t.qname[i]}\tQ-start:{t.qstart[i]}\tQ-length:{t.qend[i]-t.qstart[i]}"
        f"\tTarget:{t.tname[i]}\tT-start:{t.tstart[i]}\tT-length:{t.tend[i]-t.tstart[i]}"
        f"\tSame-strand:{int(t.strand[i])}\tScore:{t.score[i]}"
        f"\tIdentity:{_f(_ident(m, x))}"
        # the reference format string has no colon here (impl/paf.c:273)
        f"\tIdentity-with-gaps{_f(_ident_gaps(m, x, qib, qdb))}"
        f"\tAligned-bases:{m+x}\tQuery-inserts:{qi}\tQuery-deletes:{qd}\n")
    if include_alignment:
        _render_alignment(t, i, out, pool)


def _render_alignment(t, i, out, pool):
    """3-row alignment rendering in 150-column windows (impl/paf.c:282-314),
    vectorized over the record's columns."""
    ops, lens = t.record_ops(i)
    if len(ops) == 0:
        return
    qb = pool.seq_bytes(t.qname[i])
    tb = pool.seq_bytes(t.tname[i])
    lens = lens.astype(np.int64)
    n_cols = int(lens.sum())
    col_off = np.concatenate([[0], np.cumsum(lens)])
    col_op = np.searchsorted(col_off[1:], np.arange(n_cols), side="right")
    rel = np.arange(n_cols) - col_off[col_op]
    opc = ops[col_op]
    # per-op exclusive prefixes of query/target consumption
    q_excl = np.concatenate([[0], np.cumsum(np.where(ops != QUERY_DELETE, lens, 0))])[:-1]
    t_excl = np.concatenate([[0], np.cumsum(np.where(ops != QUERY_INSERT, lens, 0))])[:-1]
    tpos = int(t.tstart[i]) + t_excl[col_op] + rel
    if t.strand[i]:
        qpos = int(t.qstart[i]) + q_excl[col_op] + rel
        qchar = qb[np.clip(qpos, 0, len(qb) - 1)]
    else:
        qpos = int(t.qend[i]) - 1 - (q_excl[col_op] + rel)
        qchar = COMPLEMENT_TABLE[qb[np.clip(qpos, 0, len(qb) - 1)]]
    tchar = tb[np.clip(tpos, 0, len(tb) - 1)]
    dash = np.uint8(ord("-"))
    trow = np.where(opc == QUERY_INSERT, dash, tchar)
    qrow = np.where(opc == QUERY_DELETE, dash, qchar)
    star = np.where(UPPER_TABLE[trow] == UPPER_TABLE[qrow], np.uint8(ord("*")),
                    np.uint8(ord(" ")))
    window = 150
    for l in range(0, n_cols, window):
        e = min(l + window, n_cols)
        out.write(trow[l:e].tobytes().decode("latin-1") + "\n")
        out.write(qrow[l:e].tobytes().decode("latin-1") + "\n")
        out.write(star[l:e].tobytes().decode("latin-1") + "\n")


def _render_sliced(t, pool, blob, stats, out, max_bytes=64 << 20):
    """Stream the -a render in ~max_bytes output slices: bounded memory
    (the whole-batch render is ~3 bytes per cigar column) and zero
    full-size copies (each slice's uint8 array passes to the writer as a
    memoryview)."""
    from paffy_tpu import native
    n = len(t)
    nl = np.flatnonzero(np.frombuffer(blob, dtype=np.uint8) == ord("\n"))
    line_off = np.concatenate([[0], nl + 1])
    # per-record render size: stat line + 3 bytes/column + 3 newlines per
    # 150-column window (mirrors native.view_render_batch's size model)
    ncols = (stats["matches"] + stats["mismatches"]
             + stats["query_insert_bases"] + stats["query_delete_bases"])
    sizes = np.diff(line_off) + 3 * ncols + 3 * ((ncols + 149) // 150)
    cum = np.cumsum(sizes)
    a = 0
    while a < n:
        base = int(cum[a - 1]) if a else 0
        b = int(np.searchsorted(cum, base + max_bytes, side="right"))
        b = min(max(b, a + 1), n)
        sl = t.take(np.arange(a, b))
        sub = blob[int(line_off[a]): int(line_off[b])]
        r = native.view_render_batch(sl, pool, sub)
        if r is None:              # no toolchain: per-record fallback
            lines = sub.decode("latin-1").splitlines(keepends=True)
            for i in range(b - a):
                out.write(lines[i])
                _render_alignment(sl, i, out, pool)
        else:
            out.write_bytes(memoryview(r))
        a = b


def main(argv) -> int:
    p = base_parser("paffy view", "Pretty print PAF alignments")
    p.add_argument("fasta_files", nargs="*")
    p.add_argument("-a", "--includeAlignment", action="store_true",
                   help="Include base level alignment in output")
    p.add_argument("-s", "--printAggregateStats", action="store_true",
                   help="Print overall stats about the alignments at the end")
    p.add_argument("-t", "--noPerAlignmentStats", action="store_true",
                   help="Do not print stats about each paf")
    p.add_argument("-u", "--errorIfIdentityLowerThanX", type=float, default=0.0)
    p.add_argument("-v", "--errorIfAlignedBasesLowerThanX", type=int, default=0)
    args = p.parse_args(argv)
    timer = start(args, "Paffy view")

    if not args.fasta_files:
        print("Expected at least one sequence file", file=sys.stderr)
        return 1
    pool = SequencePool.from_fasta_files(args.fasta_files)
    log_info("Read %d sequences from sequence files", len(pool.index))
    out = open_output(args)
    totals = np.zeros(6, dtype=np.int64)  # m, x, qi, qd, qib, qdb
    n_total = 0
    try:
        for t in stream_tables(args):
            # a missing sequence name errAborts mid-stream with the
            # records BEFORE it already printed and flushed (the reference
            # fetches per record, impl/paf_view.c:127-140)
            from paffy_tpu.commands.simple import _first_missing_seq
            bad, role, name = _first_missing_seq(pool, t)
            if bad >= 0:
                t = t.take(np.arange(bad))
            # Fused stats: per-column match/mismatch counts straight from the
            # device kernel; the re-encoded cigar is never materialized (the
            # reference encodes then walks the cigar, impl/paf_view.c:167-178
            # — the stats are identical).
            stats, m_op_lens = stats_calc_with_m(t)
            try:
                m_cols, x_cols = column_match_counts(t, pool)
            except KeyError as e:
                print(str(e.args[0]), file=sys.stderr)
                return 1
            stats["matches"] = stats["matches"] - m_op_lens + m_cols
            stats["mismatches"] = stats["mismatches"] + x_cols
            if not args.noPerAlignmentStats:
                # batch-format the stat lines natively (a per-record
                # f-string loop was the bottleneck of the default view
                # output on large files); with -a the batched lines
                # interleave with each record's alignment rendering
                from paffy_tpu import native
                vals = np.column_stack([
                    t.qstart, t.qend, t.tstart, t.tend,
                    t.strand.astype(np.int64), t.score,
                    stats["matches"], stats["mismatches"],
                    stats["query_inserts"], stats["query_deletes"],
                    stats["query_insert_bases"],
                    stats["query_delete_bases"]])
                blob = native.view_stats_lines(t.qname, t.tname, vals)
                if blob is None:           # no toolchain: python fallback
                    for i in range(len(t)):
                        pretty_print_record(t, i, stats, out,
                                            args.includeAlignment, pool)
                elif args.includeAlignment:
                    # one native pass per SLICE renders each record's
                    # 3-row/150-col alignment windows interleaved with its
                    # stat line.  The full batch's render is ~3 bytes per
                    # cigar column (1.5 GB on a 4x golden batch) — slicing
                    # bounds memory, and the uint8 array streams through
                    # the writer as a memoryview with zero full-size
                    # copies (the former tobytes+decode+latin-1-encode
                    # round-trip tripled the runtime, measured 25 s of
                    # pure copying on 1.5 GB).
                    _render_sliced(t, pool, blob, stats, out)
                else:
                    out.write_bytes(blob)
            totals += np.array([stats["matches"].sum(),
                                stats["mismatches"].sum(),
                                stats["query_inserts"].sum(),
                                stats["query_deletes"].sum(),
                                stats["query_insert_bases"].sum(),
                                stats["query_delete_bases"].sum()])
            n_total += len(t)
            if bad >= 0:
                # errAbort: the prefix above flushes on the clean close
                print(f"No {role} sequence named: {name} found",
                      file=sys.stderr)
                return 1
        tm, tx, tqi, tqd, tqib, tqdb = (int(v) for v in totals)
        if args.printAggregateStats:
            out.write(
                f"Total-alignments:{n_total}\tAvg-Identity:{_f(_ident(tm, tx))}"
                f"\tAvg-Identity-with-gaps:{_f(_ident_gaps(tm, tx, tqib, tqdb))}"
                f"\tAligned-bases:{tm+tx}\tAligned-bases-with-gaps:{tm+tx+tqib+tqdb}"
                f"\tQuery-inserts:{tqi}\tQuery-deletes:{tqd}\n")
        # -u/-v sanity oracle (impl/paf_view.c:196-197): float32-vs-float32
        # comparison exactly as the reference (its threshold variable is a
        # C float).  The asserts fire AFTER the aggregate line is printed
        # but BEFORE stdio flushes it — SIGABRT loses the buffered tail,
        # so on failure the staged sub-block output is discarded.
        ident = _ident(tm, tx)
        if not (ident >= np.float32(args.errorIfIdentityLowerThanX)):
            from paffy_tpu.commands.common import abort_writers
            abort_writers()
            print(f"Aggregate identity {ident} below threshold "
                  f"{args.errorIfIdentityLowerThanX}", file=sys.stderr)
            return 1
        if not (tm + tx >= args.errorIfAlignedBasesLowerThanX):
            from paffy_tpu.commands.common import abort_writers
            abort_writers()
            print(f"Aligned bases {tm+tx} below threshold "
                  f"{args.errorIfAlignedBasesLowerThanX}", file=sys.stderr)
            return 1
    finally:
        if out is not sys.stdout:
            out.close()
    timer.done()
    return 0

"""Coordinate-frame paffy commands: dechunk, upconvert, split_file
(references: impl/paf_dechunk.c, impl/paf_upconvert.c, impl/paf_split_file.c)."""

from __future__ import annotations

import bisect
import sys
from dataclasses import replace
import numpy as np

from paffy_tpu.commands.common import (base_parser, start, read_table,
                                        write_check_prefix,
                                        write_table, open_input, open_output,
                                        open_output_binary, close_output_binary,
                                        stream_tables)
from paffy_tpu.core import pafio
from paffy_tpu.core.fasta import decode_header, read_fasta_list
from paffy_tpu.core.model import _as_obj_array
from paffy_tpu.utils.logging import log_info, log_debug


def _dechunk_side(names, starts, ends, lengths):
    """Decode name|length|start headers and shift one coordinate side
    (convertCoordinatesP, impl/paf_dechunk.c:24-38).  Headers are decoded
    once per DISTINCT name (one vectorized unique pass; a per-record dict
    loop paid Python overhead on every record of chunk-dense inputs)."""
    uniq, inv = np.unique(names, return_inverse=True)
    dn = np.empty(len(uniq), dtype=object)
    ds = np.empty(len(uniq), dtype=np.int64)
    dl = np.empty(len(uniq), dtype=np.int64)
    for k, nm in enumerate(uniq):
        iv = decode_header(nm)
        dn[k] = iv.name
        ds[k] = iv.start
        dl[k] = iv.length
    shift = ds[inv]
    return dn[inv], starts + shift, ends + shift, dl[inv]


def dechunk_main(argv) -> int:
    p = base_parser("paffy dechunk",
                    "Modifies paf coordinates to remove the chunk coordinate "
                    "name encoding created by fasta_chunk")
    p.add_argument("-q", "--query", action="store_true",
                   help="only fix the query side")
    p.add_argument("-t", "--target", action="store_true",
                   help="only fix the target side")
    args = p.parse_args(argv)
    timer = start(args, "Paffy dechunk")
    fix_query = not args.target   # -t restricts to target only (impl/paf_dechunk.c:81-86)
    fix_target = not args.query
    out = open_output_binary(args)
    try:
        # validated raw-cigar streaming: the reference parses cigars
        # (impl/paf_dechunk.c:114) but never rewrites them, and its
        # paf_check span-checks them — check_raw_spans restores that
        # check over the verbatim cg text.
        for t in stream_tables(args, parse_cigars=False,
                               validate_cigars=True):
            if fix_query:
                qn, qs, qe, ql = _dechunk_side(t.qname, t.qstart, t.qend, t.qlen)
                t = replace(t, qname=qn, qstart=qs, qend=qe, qlen=ql)
            if fix_target:
                tn, ts, te, tl = _dechunk_side(t.tname, t.tstart, t.tend, t.tlen)
                t = replace(t, tname=tn, tstart=ts, tend=te, tlen=tl)
            try:
                pafio.paf_check(t, check_raw_spans=True)
            except pafio.PafCheckError as e:
                write_check_prefix(out, e)
                raise
            out.write(pafio.serialize_paf_bytes(t))
    finally:
        close_output_binary(out)
    timer.done()
    return 0


def _upconvert_side(intervals, names, starts, ends, lengths):
    """Rewrite one coordinate side into extracted-fragment space
    (fix_interval, impl/paf_upconvert.c:52-69). Records not contained in any
    fragment pass through unchanged.

    Vectorized per distinct name: one searchsorted over the name's sorted
    fragment starts covers all its records, and fragment header strings are
    built once per fragment (the per-record bisect loop was the 64x-audit
    bottleneck of this command)."""
    new_names = np.array(names, dtype=object)
    new_starts = starts.copy()
    new_ends = ends.copy()
    new_lens = lengths.copy()
    uniq, inv = np.unique(names, return_inverse=True)
    for u_i, nm in enumerate(uniq):
        frags = intervals.get(nm)
        if not frags:
            continue
        sel = np.nonzero(inv == u_i)[0]
        fs = np.array([f[0] for f in frags], dtype=np.int64)
        fe = np.array([f[1] for f in frags], dtype=np.int64)
        fl = np.array([f[2] for f in frags], dtype=np.int64)
        k = np.searchsorted(fs, starts[sel], side="right") - 1
        kc = np.clip(k, 0, len(fs) - 1)
        # start <= frag end is the containment rule
        ok = (k >= 0) & (starts[sel] <= fe[kc])
        cross = ok & (ends[sel] > fe[kc])
        if cross.any():
            i = int(sel[np.nonzero(cross)[0][0]])
            ki = int(kc[np.nonzero(cross)[0][0]])
            raise pafio.PafCheckError(
                f"alignment crosses extracted-fragment boundary: {nm} "
                f"[{starts[i]},{ends[i]}) vs fragment "
                f"[{int(fs[ki])},{int(fe[ki])})")
        fragnames = np.array([f"{nm}|{l}|{s}" for s, _, l in frags],
                             dtype=object)
        app = sel[ok]
        kf = kc[ok]
        new_names[app] = fragnames[kf]
        new_starts[app] = starts[app] - fs[kf]
        new_ends[app] = ends[app] - fs[kf]
        new_lens[app] = fl[kf]
    return new_names, new_starts, new_ends, new_lens


def upconvert_main(argv) -> int:
    p = base_parser("paffy upconvert",
                    "Converts the coordinates of paf alignments to refer to "
                    "extracted subsequences")
    p.add_argument("fasta_files", nargs="*")
    args = p.parse_args(argv)
    timer = start(args, "Paf upconvert")
    # read fragment intervals from extracted-FASTA headers
    # (fastaRead_readCoordinates, impl/paf_upconvert.c:27-33): end = start +
    # actual fragment length; length = decoded original sequence length.
    # Only headers + sequence LENGTHS are needed — the native two-pass
    # FASTA reader supplies them without per-line Python string work (the
    # str path measured 1.1 s on a 66 MB fragment file).
    from paffy_tpu import native
    intervals: dict[str, list[tuple[int, int, int]]] = {}
    for f in args.fasta_files:
        with open(f, "rb") as fh:
            recs = native.fasta_headers(fh.read())
        if recs is None:   # no toolchain: python reader
            recs = ((h, len(s)) for h, s in read_fasta_list(f))
        for header, seq_len in recs:
            iv = decode_header(header)
            intervals.setdefault(iv.name, []).append(
                (iv.start, iv.start + seq_len, iv.length))
    for v in intervals.values():
        v.sort()
    out = open_output_binary(args)
    try:
        # raw-cigar streaming: the reference reads with parse_cigar=0 and
        # its paf_check skips the span checks for unparsed cigars
        # (impl/paf_upconvert.c:148, impl/paf.c:427-461 cigar==NULL guard),
        # so the cg tag passes through verbatim, unvalidated — exactly
        # what parse_cigars=False reproduces.
        for t in stream_tables(args, parse_cigars=False):
            qn, qs, qe, ql = _upconvert_side(intervals, t.qname, t.qstart,
                                             t.qend, t.qlen)
            tn, ts, te, tl = _upconvert_side(intervals, t.tname, t.tstart,
                                             t.tend, t.tlen)
            t = replace(t, qname=qn, qstart=qs, qend=qe, qlen=ql,
                        tname=tn, tstart=ts, tend=te, tlen=tl)
            try:
                pafio.paf_check(t)
            except pafio.PafCheckError as e:
                write_check_prefix(out, e)
                raise
            out.write(pafio.serialize_paf_bytes(t))
    finally:
        close_output_binary(out)
    timer.done()
    return 0


def split_file_main(argv) -> int:
    p = base_parser("paffy split_file",
                    "Split PAF file into separate output files by target "
                    "(default) or query contig name", io=False)
    p.add_argument("-i", "--inputFile", default=None)
    p.add_argument("-p", "--prefix", default="split_")
    p.add_argument("-q", "--query", action="store_true",
                   help="Split by query contig name instead of target")
    p.add_argument("-m", "--minLength", type=int, default=0,
                   help="Small contigs are bin-packed into combined files")
    args = p.parse_args(argv)
    timer = start(args, "Paffy split_file")

    # first-fit-sequential bin packing of small contigs
    # (impl/paf_split_file.c:142-169): a new small file opens when the current
    # one's total assigned contig length would exceed minLength; all records
    # of one contig stay together.  Streaming: file handles persist across
    # batches, appends preserve record order.
    handles: dict[str, object] = {}
    contig_file: dict[str, str] = {}
    state = {"small_idx": 0, "small_total": 0, "small_path": None}
    total = 0
    try:
        # raw-cigar streaming, UNVALIDATED: the reference reads with
        # parse_cigar=0 (impl/paf_split_file.c:142) and never inspects or
        # checks the cg tag — malformed/non-canonical text demuxes
        # verbatim, and so must ours
        for t in stream_tables(args, parse_cigars=False):
            total += len(t)
            names = t.qname if args.query else t.tname
            lengths = t.qlen if args.query else t.tlen
            assign: list[str] = []
            for i in range(len(t)):
                nm = names[i]
                path = contig_file.get(nm)
                if path is None:
                    if args.minLength > 0 and int(lengths[i]) < args.minLength:
                        if (state["small_path"] is None
                                or state["small_total"] + int(lengths[i])
                                > args.minLength):
                            state["small_path"] = (
                                f"{args.prefix}small_{state['small_idx']}.paf")
                            state["small_idx"] += 1
                            state["small_total"] = 0
                            log_info("Opened small contigs output file: %s",
                                     state["small_path"])
                        state["small_total"] += int(lengths[i])
                        path = state["small_path"]
                    else:
                        path = f"{args.prefix}{nm.replace('/', '_')}.paf"
                        log_info("Opened output file: %s", path)
                    contig_file[nm] = path
                assign.append(path)
            # group record indices per file, preserving order
            by_file: dict[str, list[int]] = {}
            forder: list[str] = []
            for i, path in enumerate(assign):
                if path not in by_file:
                    by_file[path] = []
                    forder.append(path)
                by_file[path].append(i)
            for path in forder:
                fh = handles.get(path)
                if fh is None:
                    # per-file stdio block granularity, like the reference's
                    # per-contig FILE* (GlibcWriter; the finalizer applies
                    # the error class to every open file's tail)
                    from paffy_tpu.commands.common import GlibcWriter
                    fh = GlibcWriter(open(path, "wb"), owns=True)
                    handles[path] = fh
                fh.write(pafio.serialize_paf_bytes(
                    t.take(np.array(by_file[path], dtype=np.int64))))
    finally:
        for fh in handles.values():
            fh.close()
    log_info("Split %d records", total)
    timer.done()
    return 0

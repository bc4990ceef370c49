"""Whole-file paffy commands: chain, tile, to_bed
(references: impl/paf_chain.c, impl/paf_tile.c, impl/paf_to_bed.c)."""

from __future__ import annotations

import sys
from dataclasses import replace
import numpy as np

from paffy_tpu.commands.common import (base_parser, start, read_table,
                                        write_table, open_output, stream_tables)
from paffy_tpu.core import pafio
from paffy_tpu.core.fasta import read_fasta
from paffy_tpu.ops.chain import paf_chain_order
from paffy_tpu.ops.tile import assign_tile_levels, tile_sort_order
from paffy_tpu.ops.coverage import CoverageMap, run_length_rows
from paffy_tpu.ops import transforms as tr
from paffy_tpu.utils.logging import log_info


def chain_main(argv) -> int:
    p = base_parser("paffy chain",
                    "Chains the records in the PAF file into chains, rescoring "
                    "them as chains. Chains are indicated with the cn tag.")
    p.add_argument("-g", "--maxGapLength", type=int, default=1000000)
    p.add_argument("-d", "--chainGapOpen", type=int, default=5000)
    p.add_argument("-e", "--chainGapExtend", type=int, default=1)
    p.add_argument("-t", "--trimFraction", type=float, default=1.0)
    args = p.parse_args(argv)
    timer = start(args, "Paffy chain")
    log_info("Maximum gap length : %d", args.maxGapLength)
    log_info("Chain gap open : %d", args.chainGapOpen)
    log_info("Chain gap extend : %d", args.chainGapExtend)
    # raw-cigar load: chain never reads per-op data and re-emits the cigar
    # verbatim, exactly the reference's read_pafs(parse_cigar=0) at
    # impl/paf_chain.c:128 (paf_check skips span checks on unparsed cigars)
    t = read_table(args, parse_cigars=False)
    tagged, perm = paf_chain_order(
        t, gap_open=args.chainGapOpen, gap_extend=args.chainGapExtend,
        max_gap=args.maxGapLength, pct_trim=args.trimFraction)
    write_table(tagged, args, order=perm)
    timer.done()
    return 0


def tile_main(argv) -> int:
    p = base_parser("paffy tile",
                    "Tiles the records in the PAF file along the query sequence")
    args = p.parse_args(argv)
    timer = start(args, "Paffy tile")
    t = read_table(args)
    # the reference's coverage walk asserts (column bounds, end-of-walk,
    # per-name qlen consistency) fire before any output is written — tile
    # buffers everything until write_pafs (impl/paf_tile.c:150-180)
    bad = tr.query_walk_violation(t, {})
    if bad >= 0:
        err = pafio.PafCheckError(
            f"tile: invalid record, {pafio.format_record(t, bad)}")
        err.stdio_lost_tail = True   # walk assert: SIGABRT class
        raise err
    order = tile_sort_order(t)
    levels = assign_tile_levels(t, order)
    t = replace(t, tile_level=levels)
    # output in sorted best-first order (impl/paf_tile.c:157,178) — emitted
    # via the serializer's order hook, no cigar copy
    write_table(t, args, order=order)
    timer.done()
    return 0


def to_bed_main(argv) -> int:
    p = base_parser("paffy to_bed",
                    "Creates a bed file representing the coverage of alignments "
                    "on the query sequences of the paf alignments")
    p.add_argument("-b", "--binary", action="store_true")
    p.add_argument("-e", "--excludeUnaligned", action="store_true")
    p.add_argument("-f", "--excludeAligned", action="store_true")
    p.add_argument("-m", "--minSize", type=int, default=1)
    p.add_argument("-n", "--includeInverted", action="store_true")
    p.add_argument("-q", "--queryFastaFile", default=None)
    args = p.parse_args(argv)
    timer = start(args, "Paffy to_bed")
    cm = CoverageMap()
    seen_qlens: dict = {}
    for t in stream_tables(args):
        # reference asserts fire before write_bed emits anything
        # (impl/paf.c:691-709; with -n the flipped records walk the same
        # shared count-array hash, so names and lengths mix)
        bad = tr.query_walk_violation(t, seen_qlens)
        if bad >= 0:
            err = pafio.PafCheckError(
                f"to_bed: invalid record, {pafio.format_record(t, bad)}")
            err.stdio_lost_tail = True   # walk assert: SIGABRT class
            raise err
        if args.includeInverted:
            # the reference registers each record's query array, then its
            # flipped target array, record by record — pre-register names
            # in that interleaved first-seen order so write_bed's row
            # order matches (impl/paf_to_bed.c:173-183); one vectorized
            # pass, only distinct names touch Python
            cm.register_batch(
                np.column_stack([t.qname, t.tname]).ravel(),
                np.column_stack([t.qlen, t.tlen]).ravel())
        cm.add(t)
        if args.includeInverted:
            ti = tr.invert(t)
            bad = tr.query_walk_violation(ti, seen_qlens)
            if bad >= 0:
                err = pafio.PafCheckError(
                    f"to_bed: invalid inverted record, "
                    f"{pafio.format_record(ti, bad)}")
                err.stdio_lost_tail = True   # walk assert: SIGABRT class
                raise err
            cm.add(ti)
    out = open_output(args)
    try:
        # rows per sequence in first-seen order (the reference iterates its
        # hash table; see write_bed, impl/paf_to_bed.c:33-55)
        for name in cm.names:
            counts = cm.counts(name)
            starts, ends, vals = run_length_rows(counts, args.binary)
            sizes = ends - starts
            keep = sizes >= args.minSize
            keep &= np.where(vals == 0, not args.excludeUnaligned,
                             not args.excludeAligned)
            shown = np.where(vals > 0, 1, 0) if args.binary else vals
            # .tolist() first: f-strings over Python ints beat numpy scalars
            rows = zip(starts[keep].tolist(), ends[keep].tolist(),
                       shown[keep].tolist())
            out.write("".join(f"{name} {s} {e} {v}\n" for s, e, v in rows))
        # whole-missing FASTA records as 0-coverage rows
        # (write_missing_fasta_seqs, impl/paf_to_bed.c:63-67,187-190)
        if args.excludeAligned and args.queryFastaFile:
            covered = set(cm.names)
            for name, seq in read_fasta(args.queryFastaFile).items():
                if name not in covered:
                    out.write(f"{name} 0 {len(seq)}\t0\n")
    finally:
        if out is not sys.stdout:
            out.close()
    timer.done()
    return 0

"""Streaming per-record paffy commands: invert, shatter, dedupe, trim,
filter, add_mismatches (references: impl/paf_invert.c, impl/paf_shatter.c,
impl/paf_dedupe.c, impl/paf_trim.c, impl/paf_filter.c,
impl/paf_add_mismatches.c).

Each is the reference's read->transform->write loop turned into one batched
table transform.
"""

from __future__ import annotations

import sys
import numpy as np

from paffy_tpu.commands.common import base_parser, start, read_table, write_table
from paffy_tpu.core import pafio
from paffy_tpu.core.fasta import load_sequences
from paffy_tpu.ops import transforms as tr
from paffy_tpu.ops.tailtrim import trim_unreliable_tails
from paffy_tpu.ops.mismatch import SequencePool, encode_mismatches
from paffy_tpu.utils.logging import log_info, log_debug, debug_enabled


def invert_main(argv) -> int:
    p = base_parser("paffy invert", "Inverts the query and target in a PAF file")
    args = p.parse_args(argv)
    timer = start(args, "Paf invert")
    t = read_table(args)
    t = tr.invert(t)
    pafio.paf_check(t)
    write_table(t, args)
    timer.done()
    return 0


def shatter_main(argv) -> int:
    p = base_parser("paffy shatter", "Break up paf alignments into individual matches")
    args = p.parse_args(argv)
    timer = start(args, "Paffy shatter")
    t = read_table(args)
    write_table(tr.shatter(t), args)
    timer.done()
    return 0


def dedupe_main(argv) -> int:
    p = base_parser("paffy dedupe", "Remove duplicate paf records")
    p.add_argument("-a", "--checkInverse", action="store_true",
                   help="Also deduplicate alignments that are the same, but "
                        "with query and target reversed")
    args = p.parse_args(argv)
    timer = start(args, "Paffy dedupe")
    t = read_table(args)
    # first-occurrence-wins on the full coordinate key, order preserving
    # (impl/paf_dedupe.c:27-46,117-143); with -a, a record whose direct key is
    # unseen is also checked against the inverted key before being kept
    seen: set = set()
    keep = np.zeros(len(t), dtype=bool)
    dupes = 0
    for i in range(len(t)):
        key = (t.qname[i], t.tname[i], bool(t.strand[i]),
               int(t.qstart[i]), int(t.qend[i]), int(t.tstart[i]), int(t.tend[i]))
        hit = key in seen
        if not hit and args.checkInverse:
            ikey = (t.tname[i], t.qname[i], bool(t.strand[i]),
                    int(t.tstart[i]), int(t.tend[i]), int(t.qstart[i]), int(t.qend[i]))
            hit = ikey in seen
        if hit:
            dupes += 1
            if debug_enabled():
                log_debug("Got duplicate pafs:")
                log_debug("\t\tdupe (1) - : %s", pafio.format_record(t, i))
        else:
            seen.add(key)
            keep[i] = True
    write_table(t.take(keep), args)
    timer.done()
    return 0


def trim_main(argv) -> int:
    p = base_parser("paffy trim", "Trims the ends of a PAF file")
    p.add_argument("-r", "--trimIdentity", type=float, default=0.05)
    p.add_argument("-t", "--trimFraction", type=float, default=1.0)
    p.add_argument("-f", "--fixedTrim", action="store_true")
    args = p.parse_args(argv)
    timer = start(args, "Paffy trim")
    t = read_table(args)
    if not args.fixedTrim:
        t = trim_unreliable_tails(t, args.trimIdentity, args.trimFraction)
    else:
        t = tr.trim_end_fraction(t, args.trimFraction)
    pafio.paf_check(t)
    write_table(t, args)
    timer.done()
    return 0


def filter_main(argv) -> int:
    p = base_parser("paffy filter", "Filter pafs based on alignment stats")
    p.add_argument("-s", "--minChainScore", type=int, default=-1)
    p.add_argument("-t", "--minAlignmentScore", type=int, default=-1)
    p.add_argument("-u", "--minIdentity", type=float, default=-1.0)
    p.add_argument("-v", "--minIdentityWithGaps", type=float, default=-1.0)
    p.add_argument("-w", "--maxTileLevel", type=int, default=-1)
    p.add_argument("-x", "--invert", action="store_true",
                   help="Only output alignments that don't pass filters")
    args = p.parse_args(argv)
    timer = start(args, "Paffy filter")
    t = read_table(args)
    s = tr.stats_calc(t)
    m, x = s["matches"], s["mismatches"]
    with np.errstate(invalid="ignore", divide="ignore"):
        ident = (m.astype(np.float32) / (m + x).astype(np.float32))
        identg = (m.astype(np.float32) /
                  (m + x + s["query_insert_bases"] + s["query_delete_bases"])
                  .astype(np.float32))
    # keep-condition (impl/paf_filter.c:131-133); NaN identities fail the >=
    # exactly as in C float compares
    passes = ((t.score >= args.minAlignmentScore)
              & (t.chain_score >= args.minChainScore)
              & ((args.maxTileLevel == -1) | (t.tile_level <= args.maxTileLevel))
              & (ident >= np.float32(args.minIdentity))
              & (identg >= np.float32(args.minIdentityWithGaps)))
    keep = ~passes if args.invert else passes
    if debug_enabled():
        for i in np.nonzero(~keep)[0]:
            log_debug("Filtering alignment with matches:%d, identity: %f (%f "
                      "with gaps), score: %d, chain-score:%d", int(m[i]),
                      float(ident[i]), float(identg[i]), int(t.score[i]),
                      int(t.chain_score[i]))
            sys.stderr.write(pafio.format_record(t, i) + "\n")
    write_table(t.take(keep), args)
    timer.done()
    return 0


def add_mismatches_main(argv) -> int:
    p = base_parser("paffy add_mismatches",
                    "Add mismatches to PAF alignments (so encoding X and = in "
                    "place of M)")
    p.add_argument("fasta_files", nargs="*")
    p.add_argument("-a", "--removeMismatches", action="store_true",
                   help="Remove mismatches, removing X and = encoding and "
                        "replacing with M")
    args = p.parse_args(argv)
    timer = start(args, "Paffy add_mismatches")
    t = read_table(args)
    if args.removeMismatches:
        t = tr.remove_mismatches(t)
    else:
        seqs = load_sequences(args.fasta_files)
        log_info("Read %d sequences from sequence files", len(seqs))
        try:
            t = encode_mismatches(t, SequencePool(seqs))
        except KeyError as e:
            print(str(e.args[0]), file=sys.stderr)
            return 1
    pafio.paf_check(t)
    write_table(t, args)
    timer.done()
    return 0

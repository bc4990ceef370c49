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

from paffy_tpu.commands.common import (base_parser, start, read_table,
                                        write_table, stream_transform)
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
    from paffy_tpu.commands.common import (open_output_binary,
                                           close_output_binary,
                                           stream_tables,
                                           write_check_prefix)
    from paffy_tpu import native
    out = open_output_binary(args)
    try:
        # raw-cigar streaming: invert's cigar transform is token-wise
        # (I<->D swap, reversal for '-' records), so the fused native path
        # rewrites the cigar TEXT without ever parsing it into op arrays;
        # spans are checked during tokenization and bounds on the raw table
        # (together: the reference's post-invert paf_check).  Non-canonical
        # or no-toolchain inputs arrive fully parsed and take the generic
        # transform path.
        for t in stream_tables(args, parse_cigars=False,
                               validate_cigars=True):
            if not len(t):
                continue
            done = None
            if t.raw_cg is not None:
                try:
                    pafio.paf_check(t)  # bounds; q/t-symmetric == post-invert
                except pafio.PafCheckError as e:
                    # emit the INVERTED records before the bad one (the
                    # reference inverts, checks and writes record-at-a-time)
                    if e.record_index:
                        native.invert_serialize(
                            t.take(np.arange(e.record_index)), fh=out)
                    raise
                done = native.invert_serialize(t, fh=out)
            if done is None:
                try:
                    t = tr.invert(t)
                    pafio.paf_check(t)
                except pafio.PafCheckError as e:
                    write_check_prefix(out, e)
                    raise
                out.write(pafio.serialize_paf_bytes(t))
    finally:
        close_output_binary(out)
    timer.done()
    return 0


def shatter_main(argv) -> int:
    p = base_parser("paffy shatter", "Break up paf alignments into individual matches")
    args = p.parse_args(argv)
    timer = start(args, "Paffy shatter")
    from paffy_tpu.commands.common import (open_output_binary,
                                           close_output_binary,
                                           stream_tables)
    from paffy_tpu import native
    from paffy_tpu.core.model import SEQ_MATCH, SEQ_MISMATCH
    out = open_output_binary(args)
    try:
        for t in stream_tables(args):
            if not len(t):
                continue
            # the reference's shatter walk asserts per op (length >= 1,
            # no =/X) and per record (walk ends on the end coordinates),
            # and paf_checks every shard it builds: assert failures abort
            # with the batch's stdio buffer lost, shard-check failures
            # errAbort with the PRIOR records' shards flushed
            # (impl/paf.c:600-663, ops/transforms.shatter_violation)
            kind, rec = tr.shatter_violation(t)
            if kind is not None:
                # both death classes have already written the shards of
                # the records before the bad one; the GlibcWriter block
                # granularity then loses the sub-4096 tail for the assert
                # class ('abort': SIGABRT) and flushes it for the
                # per-shard paf_check class ('check': st_errAbort)
                if rec > 0:
                    pre = t.take(np.arange(rec))
                    if native.shatter_serialize(pre, fh=out) is None:
                        out.write(pafio.serialize_paf_bytes(tr.shatter(pre)))
                err = pafio.PafCheckError(
                    f"shatter: invalid record, {pafio.format_record(t, rec)}")
                err.stdio_lost_tail = kind == "abort"
                raise err
            # fused native shatter+serialize: each M run's line emitted
            # straight from the cigar walk (no intermediate shard table),
            # streamed to the output in reused buffer slices
            if native.shatter_serialize(t, fh=out) is None:
                # no toolchain: generic batch transform
                out.write(pafio.serialize_paf_bytes(tr.shatter(t)))
    finally:
        close_output_binary(out)
    timer.done()
    return 0


def dedupe_main(argv) -> int:
    p = base_parser("paffy dedupe", "Remove duplicate paf records")
    p.add_argument("-a", "--checkInverse", action="store_true",
                   help="Also deduplicate alignments that are the same, but "
                        "with query and target reversed")
    args = p.parse_args(argv)
    timer = start(args, "Paffy dedupe")
    state = DedupeState(args.checkInverse)

    def step(t):
        keep, checked = state.process(t)
        if args.checkInverse and checked is not None and checked.any():
            # the reference coordinate-checks exactly the records whose
            # DIRECT probe against the kept hash missed (paf_check after
            # the inverse probe, impl/paf_dedupe.c:120-124; cigar==NULL
            # under its parse_cigar=0 read, so spans are never checked)
            try:
                pafio.paf_check(t, idx=np.nonzero(checked)[0])
            except pafio.PafCheckError as e:
                # before aborting, the reference has written the KEPT
                # records preceding the bad one — reshape the error's
                # prefix accordingly for the generic prefix writer
                if e.record_index is not None:
                    pre = t.take(keep & (np.arange(len(t)) < e.record_index))
                    e.table, e.record_index = pre, len(pre)
                raise
        if debug_enabled():
            for i in np.nonzero(~keep)[0]:
                log_debug("Got duplicate pafs:")
                log_debug("\t\tdupe (1) - : %s", pafio.format_record(t, i))
        return t.take(keep)
    # raw-cigar streaming, UNVALIDATED: the reference reads with
    # parse_cigar=0 (impl/paf_dedupe.c:117), so any cg tag text — even
    # malformed or non-canonical — passes through verbatim, and so must we
    stream_transform(args, step, parse_cigars=False)
    timer.done()
    return 0


class DedupeState:
    """Vectorized first-occurrence-wins dedupe on the full coordinate key
    (impl/paf_dedupe.c:27-46,117-143), streaming across batches.

    With check_inverse, a record also counts as a duplicate when its
    query/target-swapped key was seen earlier.  (The reference probes its
    hash of KEPT records, but kept-set membership and seen-set membership
    are provably equivalent: a record dropped by a direct hit duplicates a
    kept key, and one dropped by an inverse hit shares its inverse with a
    kept key — so testing against all earlier keys yields identical
    decisions.)
    """

    def __init__(self, check_inverse: bool):
        self.check_inverse = check_inverse
        self.name_id: dict[str, int] = {}
        self.seen = None   # sorted structured array of kept keys (all batches)

    def process(self, t):
        """Returns (keep_mask, checked_mask): keep = not a duplicate;
        checked = the records the reference would paf_check under -a
        (direct probe against the KEPT hash missed), None without -a."""
        n = len(t)
        if n == 0:
            return np.zeros(0, dtype=bool), None
        # name -> id via one vectorized unique pass; only DISTINCT names
        # touch the Python dict (ids must stay stable across batches, so the
        # dict remains the global assigner).  The per-record setdefault loop
        # was the bottleneck of large-input dedupe (8.4x the reference at
        # 16x golden; invisible under startup at 3.3k records).
        name_id = self.name_id
        both = np.concatenate([t.qname, t.tname])
        uniq_names, inv = np.unique(both, return_inverse=True)
        gids = np.fromiter((name_id.setdefault(nm, len(name_id))
                            for nm in uniq_names),
                           dtype=np.int64, count=len(uniq_names))
        ids = gids[inv]
        qid, tid = ids[:n], ids[n:]

        def as_void(cols):
            keys = np.ascontiguousarray(np.stack(cols, axis=1))
            return keys.view([("", keys.dtype)] * keys.shape[1]).reshape(-1)

        strand = t.strand.astype(np.int64)
        void = as_void([qid, tid, strand, t.qstart, t.qend, t.tstart, t.tend])
        uniq, inv = np.unique(void, return_inverse=True)
        first = np.full(len(uniq), n, dtype=np.int64)
        np.minimum.at(first, inv, np.arange(n))
        dup = first[inv] < np.arange(n)
        def probe_seen(keys):
            # vectorized membership in the sorted cross-batch key set
            if self.seen is None or len(self.seen) == 0:
                return np.zeros(len(keys), dtype=bool)
            pos = np.clip(np.searchsorted(self.seen, keys), 0,
                          len(self.seen) - 1)
            return self.seen[pos] == keys

        if self.check_inverse:
            ivoid = as_void([tid, qid, strand, t.tstart, t.tend,
                             t.qstart, t.qend])
            pos = np.searchsorted(uniq, ivoid)
            pos_c = np.clip(pos, 0, len(uniq) - 1)
            hit = uniq[pos_c] == ivoid
            dup |= hit & (first[pos_c] < np.arange(n))
            dup |= probe_seen(ivoid)
        seen_direct = probe_seen(void)
        dup |= seen_direct
        checked = None
        if self.check_inverse:
            # the reference paf_checks a record iff its DIRECT probe against
            # the kept hash misses (impl/paf_dedupe.c:120-124): i.e. unless
            # an earlier KEPT record carries the same key (an earlier
            # inverse-dropped twin does not populate the hash)
            f = first[inv]
            checked = ~(seen_direct | ((f < np.arange(n)) & ~dup[f]))
        new = np.sort(void[~dup])   # batch first-occurrences, sorted
        if self.seen is None:
            self.seen = new
        else:
            # merge the n new keys into the already-sorted seen array:
            # O(S + n log n) per batch, not O(S log S) (a long stream's
            # cumulative re-sort dominated the per-batch work)
            self.seen = np.insert(self.seen,
                                  np.searchsorted(self.seen, new), new)
        return ~dup, checked


def _first_missing_seq(pool, t):
    """(record, role, name) of the first record whose query (checked
    first, like the reference's per-record fetch order) or target
    sequence is absent from the pool; (-1, None, None) when all
    resolve.  One dict probe per DISTINCT name."""
    idx = pool.index
    known: dict = {}
    for i in range(len(t)):
        qn, tn = t.qname[i], t.tname[i]
        q_ok = known.get(qn)
        if q_ok is None:
            q_ok = known[qn] = qn in idx
        if not q_ok:
            return i, "query", qn
        t_ok = known.get(tn)
        if t_ok is None:
            t_ok = known[tn] = tn in idx
        if not t_ok:
            return i, "target", tn
    return -1, None, None


def _first_empty_cigar(t) -> int:
    """First record whose TOTAL cigar length is zero (no cg tag, empty
    text, or everything trimmed away), or -1 — the exact set the
    reference's identity-trim NaN assert dies on: its identity counts
    indels as mismatches (paf_trim_unreliable_ends2, impl/paf.c:818-828),
    so all-I/all-D records give identity 0.0, not NaN; only an op-free
    cigar divides 0/0."""
    if len(t) == 0:
        return -1
    total = None
    if t.raw_cg is not None:
        from paffy_tpu import native
        st = native.cigar_stats_raw(t)
        if st is not None:
            total = st[:, 0] + st[:, 1] + st[:, 4] + st[:, 5]
    if total is None:
        s = tr.stats_calc(t)
        total = (np.asarray(s["matches"]) + np.asarray(s["mismatches"])
                 + np.asarray(s["query_insert_bases"])
                 + np.asarray(s["query_delete_bases"]))
    z = np.nonzero(total == 0)[0]
    return int(z[0]) if len(z) else -1


def trim_main(argv) -> int:
    p = base_parser("paffy trim", "Trims the ends of a PAF file")
    p.add_argument("-r", "--trimIdentity", type=float, default=0.05)
    p.add_argument("-t", "--trimFraction", type=float, default=1.0)
    p.add_argument("-f", "--fixedTrim", action="store_true")
    args = p.parse_args(argv)
    timer = start(args, "Paffy trim")

    def step(t):
        if not args.fixedTrim:
            t = trim_unreliable_tails(t, args.trimIdentity, args.trimFraction)
            # the reference's identity-trim sanity assert dies on any
            # record whose identity is 0/0 = NaN — an OP-FREE cigar (no
            # cg tag, or a trim that removed every op); all-I/all-D
            # records survive because indels count as mismatches there
            # (assert final_identity >= identity, impl/paf.c:952; NaN
            # fails any compare).  SIGABRT class: records before it are
            # written, the sub-block stdio tail is lost.  Checked
            # post-trim: an originally op-free cigar stays op-free.
            bad = _first_empty_cigar(t)
            if bad >= 0:
                # an earlier record's own paf_check failure still wins
                # (the reference runs trim -> check -> write per record)
                pre = t.take(np.arange(bad))
                pafio.paf_check(pre, check_raw_spans=True)
                err = pafio.PafCheckError(
                    f"trim: op-free cigar record, "
                    f"{pafio.format_record(t, bad)}",
                    table=pre, record_index=bad)
                err.stdio_lost_tail = True
                raise err
        else:
            t = tr.trim_end_fraction(t, args.trimFraction)
        pafio.paf_check(t, check_raw_spans=True)
        return t
    # identity trim streams raw (kept cigars are substrings of the raw cg
    # text — ops/tailtrim raw path); fixed trim rewrites op lengths, so it
    # keeps the parsed path.  The reference parses + span-checks either
    # way (paf_trim.c:116-124), hence validate + check_raw_spans.
    if not args.fixedTrim:
        stream_transform(args, step, parse_cigars=False,
                         validate_cigars=True)
    else:
        stream_transform(args, step)
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

    def step(t):
        s = tr.stats_calc(t)
        m, x = s["matches"], s["mismatches"]
        with np.errstate(invalid="ignore", divide="ignore"):
            ident = (m.astype(np.float32) / (m + x).astype(np.float32))
            identg = (m.astype(np.float32) /
                      (m + x + s["query_insert_bases"] + s["query_delete_bases"])
                      .astype(np.float32))
        # keep-condition (impl/paf_filter.c:131-133); NaN identities fail the
        # >= exactly as in C float compares
        passes = ((t.score >= args.minAlignmentScore)
                  & (t.chain_score >= args.minChainScore)
                  & ((args.maxTileLevel == -1)
                     | (t.tile_level <= args.maxTileLevel))
                  & (ident >= np.float32(args.minIdentity))
                  & (identg >= np.float32(args.minIdentityWithGaps)))
        keep = ~passes if args.invert else passes
        if debug_enabled():
            for i in np.nonzero(~keep)[0]:
                log_debug("Filtering alignment with matches:%d, identity: %f "
                          "(%f with gaps), score: %d, chain-score:%d",
                          int(m[i]), float(ident[i]), float(identg[i]),
                          int(t.score[i]), int(t.chain_score[i]))
                sys.stderr.write(pafio.format_record(t, i) + "\n")
        return t.take(keep)
    # validated raw-cigar streaming: the reference parses cigars
    # (impl/paf_filter.c:123) but only sums them (paf_stats_calc) and
    # re-emits records whole, so stats tokenize from the raw text and kept
    # records pass through verbatim; validate_cigars keeps parse-reject
    # parity.
    stream_transform(args, step, parse_cigars=False, validate_cigars=True)
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
    if args.removeMismatches:
        def step(t):
            t = tr.remove_mismatches(t)
            pafio.paf_check(t)
            return t
        stream_transform(args, step)
        timer.done()
        return 0

    pool = SequencePool.from_fasta_files(args.fasta_files)
    log_info("Read %d sequences from sequence files", len(pool.index))

    from paffy_tpu.commands.common import (open_output_binary,
                                           close_output_binary,
                                           stream_tables)
    from paffy_tpu import native
    out = open_output_binary(args)
    try:
        for t in stream_tables(args):
            if not len(t):
                continue
            # the reference fetches each record's query then target
            # sequence BEFORE encoding it (impl/paf_add_mismatches.c) —
            # a missing name errAborts with the records before it already
            # encoded and flushed
            bad, role, name = _first_missing_seq(pool, t)
            sel = t if bad < 0 else t.take(np.arange(bad))
            # check BEFORE encode: each M run's =/X runs sum to its length,
            # so cigar spans (and every other checked field) are preserved
            # exactly and the accept/reject decision matches the
            # reference's check-after-encode (impl/paf_add_mismatches.c:133)
            try:
                pafio.paf_check(sel)
            except pafio.PafCheckError as e:
                # the reference encodes and writes record-at-a-time, so
                # the ENCODED records before the bad one precede the abort
                if e.record_index:
                    pre = sel.take(np.arange(e.record_index))
                    if native.encode_serialize(
                            pre, pool.host_pool,
                            pool.offsets_for(pre.qname, "query"),
                            pool.offsets_for(pre.tname, "target"),
                            fh=out) is None:
                        out.write(pafio.serialize_paf_bytes(
                            encode_mismatches(pre, pool)))
                raise
            # fused native encode+serialize: M->=/X runs emitted straight
            # as output line text (no intermediate =/X CSR arrays),
            # streamed to the output in reused buffer slices
            if len(sel):
                qpo = pool.offsets_for(sel.qname, "query")
                tpo = pool.offsets_for(sel.tname, "target")
                if native.encode_serialize(sel, pool.host_pool, qpo, tpo,
                                           fh=out) is None:
                    # no toolchain: generic batch transform
                    t2 = encode_mismatches(sel, pool)
                    out.write(pafio.serialize_paf_bytes(t2))
            if bad >= 0:
                raise KeyError(f"No {role} sequence named: {name} found")
    except KeyError as e:
        print(str(e.args[0]), file=sys.stderr)
        return 1
    finally:
        close_output_binary(out)
    timer.done()
    return 0

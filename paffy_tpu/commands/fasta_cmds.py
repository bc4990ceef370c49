"""faffy commands: chunk, merge, extract
(references: impl/fasta_chunk.c, impl/fasta_merge.c, impl/fasta_extract.c)."""

from __future__ import annotations

import os
import sys

from paffy_tpu.commands.common import base_parser, start, open_input, open_output
from paffy_tpu.core.fasta import read_fasta_list, read_fasta, write_fasta_record
from paffy_tpu.utils.logging import log_info, log_debug, log_critical, set_log_level_from_string
from paffy_tpu.utils.logging import CommandTimer

_ACGTN_BYTES = b"acgtnACGTN"


def _check_acgtn(seq: str, context: str) -> None:
    """ACGTN-only sanity check (impl/fasta_chunk.c:91-94, fasta_extract.c:42-45).

    bytes.translate with a delete table runs at GB/s; building a set of a
    30 MB chunk's characters cost ~3-5 s per 264 MB genome."""
    residue = seq.encode("latin-1", "replace").translate(None, _ACGTN_BYTES)
    if residue:
        bad = sorted(set(residue.decode("latin-1")))
        raise ValueError(f"non-ACGTN character(s) {bad} in {context}")


def chunk_main(argv) -> int:
    p = base_parser("faffy chunk",
                    "Breaks up a set of fasta sequences into a series of "
                    "overlapping chunks, printing the names of each chunk file "
                    "to standard out", io=False)
    p.add_argument("fasta_files", nargs="*")
    p.add_argument("-c", "--chunkSize", type=int, default=10000000)
    p.add_argument("-o", "--overlap", type=int, default=100000)
    p.add_argument("-d", "--dir", default="./temp_fastas")
    p.add_argument("--lineWidth", type=int, default=0,
                   help="Wrap FASTA sequence lines at this width (0 = one "
                        "line per sequence, the default byte format; "
                        "sonLib's fastaWrite wraps)")
    args = p.parse_args(argv)
    set_log_level_from_string(args.logLevel)
    timer = CommandTimer("Faffy chunk")
    log_info("Chunks output directory : %s", args.dir)
    log_info("Chunk size : %d", args.chunkSize)
    log_info("Chunk overlap size : %d", args.overlap)

    if os.path.exists(args.dir):
        if not os.path.isdir(args.dir):
            print(f"Output directory is not a directory: {args.dir}", file=sys.stderr)
            return 1
        if os.listdir(args.dir):
            print("Output directory is not empty, please specify an empty "
                  "directory ", file=sys.stderr)
            return 1
    else:
        log_critical("Output directory does not exist, trying to create it: %s",
                     args.dir)
        os.makedirs(args.dir)

    chunk_no = 0
    chunk_fh = None
    chunk_path = None
    chunk_remaining = args.chunkSize
    # both the chunk files and the stdout path listing go through the
    # stdio-granularity writers: the reference's non-ACGTN assert
    # (SIGABRT) loses the unflushed listing and the current chunk file's
    # sub-block tail, while completed chunks were fclosed (flushed)
    from paffy_tpu.commands.common import (GlibcWriter, _TextGlibcFacade)
    lst_out = _TextGlibcFacade(GlibcWriter(sys.stdout.buffer, owns=False)) \
        if hasattr(sys.stdout, "buffer") else sys.stdout

    def start_chunk():
        nonlocal chunk_fh, chunk_path, chunk_no, chunk_remaining
        if chunk_fh is None:
            chunk_path = f"{args.dir}/{chunk_no}.fa"
            chunk_no += 1
            chunk_fh = _TextGlibcFacade(GlibcWriter(open(chunk_path, "wb"),
                                                    owns=True))
            chunk_remaining = args.chunkSize
            log_debug("Starting chunk %s", chunk_path)

    def finish_chunk():
        nonlocal chunk_fh, chunk_path
        if chunk_fh is not None:
            chunk_fh.close()
            log_debug("Finishing chunk %s", chunk_path)
            lst_out.write(chunk_path + "\n")   # chunk list -> stdout
            chunk_fh = None
            chunk_path = None

    for f in args.fasta_files:
        log_info("Chunking sequence file : %s", f)
        for header, seq in read_fasta_list(f):
            # the reference asserts PER SEQUENCE, not up front
            # (processSequenceToChunk, impl/fasta_chunk.c:74): an empty
            # input with degenerate sizes exits 0 on both sides.  The
            # chunkSize > 0 guard replaces the reference's non-behaviors
            # for non-positive sizes (chunkSize 0 with overlap < 0 spins
            # forever in its stride loop; negative sizes die in
            # stString_getSubString) with a clean error, same rc class.
            assert args.chunkSize > args.overlap
            assert args.chunkSize > 0
            n = len(seq)
            # fixed-stride slicing with overlap lookahead
            # (processSequenceToChunk, impl/fasta_chunk.c:72-104)
            for i in range(0, n, args.chunkSize):
                start_chunk()
                j = min(i + args.chunkSize + args.overlap, n)
                piece = seq[i:j]
                try:
                    _check_acgtn(piece, f"chunk of {header}")
                except ValueError as e:
                    # the reference's per-base assert class: SIGABRT,
                    # unflushed tails lost (impl/fasta_chunk.c:93-97)
                    e.stdio_lost_tail = True
                    raise
                write_fasta_record(chunk_fh, f"{header}|{n}|{i}", piece,
                                   args.lineWidth)
                chunk_remaining -= j - i
                if chunk_remaining <= 0:
                    finish_chunk()
    finish_chunk()
    if lst_out is not sys.stdout:
        lst_out.close()
    timer.done()
    return 0


def merge_main(argv) -> int:
    p = base_parser("faffy merge",
                    "Merges a series of fasta files, which may contain "
                    "overlapping sequences, into a single fasta file")
    p.add_argument("--lineWidth", type=int, default=0,
                   help="Wrap FASTA sequence lines at this width (0 = one "
                        "line per overlap piece, the default byte format)")
    args = p.parse_args(argv)
    timer = start(args, "Faffy merge")
    inp = open_input(args)
    out = open_output(args)
    from paffy_tpu.core.fasta import SequenceLineWriter
    writer = SequenceLineWriter(out, args.lineWidth)

    # overlap resolution state: the trailing (possibly overlapping) sequence
    # and its coordinate in the original sequence (impl/fasta_merge.c:34-86)
    p_coord = 0
    p_seq = None
    try:
        for line in inp:
            for path in line.split():
                for header, seq in read_fasta_list(path):
                    parts = header.split("|")
                    offset = int(parts[-1])
                    assert offset >= 0
                    if offset == 0:
                        if p_seq is not None:
                            writer.piece(p_seq)
                        writer.end()
                        # strip the two provenance fields from the header
                        out.write(">" + "|".join(parts[:-2]) + "\n")
                        p_coord = 0
                        p_seq = seq
                    else:
                        assert p_seq is not None
                        seq_len = len(p_seq)
                        assert p_coord + seq_len >= offset  # must overlap/abut
                        # split the overlap at its midpoint (impl/fasta_merge.c:69)
                        split_point = (p_coord + seq_len + offset) // 2
                        log_debug("Merging at a split point: %d", split_point)
                        writer.piece(p_seq[: split_point - p_coord])
                        p_seq = seq[split_point - offset:]
                        p_coord = split_point
        if p_seq is not None:
            writer.piece(p_seq)
        writer.end()
    finally:
        if inp is not sys.stdin:
            inp.close()
        if out is not sys.stdout:
            out.close()
    timer.done()
    return 0


def extract_main(argv) -> int:
    p = base_parser("faffy extract",
                    "Extracts subsequences from a fasta file according to "
                    "intervals in a bed file", io=False)
    p.add_argument("fasta_files", nargs="*")
    p.add_argument("-i", "--bedFile", default=None)
    p.add_argument("-o", "--outputFile", default=None)
    p.add_argument("-f", "--flank", type=int, default=10)
    p.add_argument("-m", "--minSize", type=int, default=100)
    p.add_argument("-n", "--skipMissing", action="store_true")
    p.add_argument("--lineWidth", type=int, default=0,
                   help="Wrap FASTA sequence lines at this width (0 = one "
                        "line per sequence, the default byte format)")
    args = p.parse_args(argv)
    set_log_level_from_string(args.logLevel)
    timer = CommandTimer("Faffy extract")
    log_info("Bed file : %s", args.bedFile)
    log_info("Flank size : %d", args.flank)
    log_info("Minimum sequence size (minSize) : %d", args.minSize)

    seqs = {}
    for f in args.fasta_files:
        seqs.update(read_fasta(f))
    log_info("Read %d sequences from sequence files", len(seqs))

    def _atol(s: str) -> int:
        """C atol: optional sign + leading digits, 0 on no digits —
        the reference parses bed fields with atol (impl/fasta_extract.c:180)."""
        import re
        m = re.match(r"\s*[+-]?\d+", s)
        return int(m.group()) if m else 0

    inp = sys.stdin if args.bedFile is None else open(args.bedFile, "r")
    from paffy_tpu.commands.common import open_output
    out = open_output(args)
    try:
        intervals = []
        for line in inp:
            tok = line.split()
            if not tok:
                continue
            name, s, e = tok[0], _atol(tok[1]), _atol(tok[2])
            if name not in seqs:
                if args.skipMissing:
                    continue
                print(f"Missing sequence: {name}", file=sys.stderr)
                return 1
            intervals.append((name, s, e))
        intervals.sort()   # by (name, start, end) — interval_cmp

        def report(name, s, e):
            seq = seqs[name]
            piece = seq[s:e]
            _check_acgtn(piece, f"extract of {name}")
            write_fasta_record(out, f"{name}|{len(seq)}|{s}", piece,
                               args.lineWidth)

        # flank-expand, then coalesce overlapping/adjacent intervals
        # (impl/fasta_extract.c:199-233)
        prev = None   # (name, start, end)
        for name, s, e in intervals:
            if e - s < args.minSize:
                continue
            seq_len = len(seqs[name])
            i = max(s - args.flank, 0)
            j = min(e + args.flank, seq_len)
            if s < 0 or s > e or e > seq_len:
                # the reference's interval sanity asserts
                # (impl/fasta_extract.c:211): a negative start, inverted
                # interval surviving minSize, or end past the sequence
                # SIGABRTs — the pending interval is never printed and
                # the flushed prefix keeps only full stdio blocks
                from paffy_tpu.commands.common import abort_writers
                abort_writers()
                print(f"extract: interval {name}:{s}-{e} out of bounds "
                      f"(sequence length {seq_len})", file=sys.stderr)
                return 1
            if prev is not None:
                if prev[0] == name and prev[2] >= i:
                    prev = (name, prev[1], max(prev[2], j))
                    continue
                report(*prev)
            prev = (name, i, j)
        if prev is not None:
            report(*prev)
    finally:
        if inp is not sys.stdin:
            inp.close()
        out.close()
    timer.done()
    return 0

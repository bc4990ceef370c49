"""Command-line multiplexers: ``paffy <cmd>`` and ``faffy <cmd>``
(references: paffy_main.c, faffy_main.c)."""

from __future__ import annotations

import sys


def _paffy_usage(fh=sys.stderr):
    fh.write("paffy: toolkit for working with PAF files\n\n")
    fh.write("usage: paffy <command> [options]\n\n")
    fh.write("available commands:\n")
    for cmd, desc in [
        ("add_mismatches", "Replace Ms with =/Xs in PAF cigar string"),
        ("chain", "Chain together PAF alignments"),
        ("dechunk", "Manipulate coordinates to allow aggregation of PAFs computed over subsequences"),
        ("dedupe", "Remove duplicate alignments from a file based on exact query/target coordinates"),
        ("filter", "Filter alignments based upon alignment stats"),
        ("invert", "Switch query and target coordinates"),
        ("shatter", "Break PAFs into sequence of gapless PAF alignments"),
        ("tile", "Give alignments levels, from lowest (best) to highest (worse)"),
        ("to_bed", "Build an alignment coverage map of a chosen sequence in BED format"),
        ("trim", "Slice of lower identity tail alignments"),
        ("upconvert", "Converts the coordinates of paf alignments to refer to extracted subsequences"),
        ("split_file", "Split PAF file into per-target-contig output files"),
        ("view", "Pretty print and extract stats about PAF alignments"),
    ]:
        fh.write(f"    {cmd:<24} {desc}\n")
    fh.write("\n")


def _faffy_usage(fh=sys.stderr):
    fh.write("faffy: little toolkit for working with FASTA files\n\n")
    fh.write("usage: faffy <command> [options]\n\n")
    fh.write("available commands:\n")
    fh.write("    chunk                  Break a large fasta file into smaller files for parallel processing\n")
    fh.write("    merge                  Merge together the chunks created by chunk, potentially resolving overlaps\n")
    fh.write("    extract                Extract subsequences of the fasta file\n\n")


def paffy_main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        _paffy_usage()
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd == "add_mismatches":
        from paffy_tpu.commands.simple import add_mismatches_main as m
    elif cmd == "chain":
        from paffy_tpu.commands.chain_tile_bed import chain_main as m
    elif cmd == "dechunk":
        from paffy_tpu.commands.coords import dechunk_main as m
    elif cmd == "dedupe":
        from paffy_tpu.commands.simple import dedupe_main as m
    elif cmd == "invert":
        from paffy_tpu.commands.simple import invert_main as m
    elif cmd == "filter":
        from paffy_tpu.commands.simple import filter_main as m
    elif cmd == "shatter":
        from paffy_tpu.commands.simple import shatter_main as m
    elif cmd == "tile":
        from paffy_tpu.commands.chain_tile_bed import tile_main as m
    elif cmd == "to_bed":
        from paffy_tpu.commands.chain_tile_bed import to_bed_main as m
    elif cmd == "trim":
        from paffy_tpu.commands.simple import trim_main as m
    elif cmd == "upconvert":
        from paffy_tpu.commands.coords import upconvert_main as m
    elif cmd == "split_file":
        from paffy_tpu.commands.coords import split_file_main as m
    elif cmd == "view":
        from paffy_tpu.commands.view import main as m
    else:
        sys.stderr.write(f"{cmd} is not a valid paffy command\n")
        _paffy_usage()
        return 1
    return _run(m, rest)


def _run(m, rest) -> int:
    """Run a command main, then finalize any staged output with the
    stdio semantics of the reference's death mode (GlibcWriter: errAbort
    flushes the sub-block tail, assert/SIGSEGV discards it)."""
    from paffy_tpu.commands import common
    try:
        rc = m(rest)
    except BaseException as e:
        common.end_writers(error=e)
        raise
    common.end_writers()
    return rc


def faffy_main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        _faffy_usage()
        return 0
    cmd, rest = argv[0], argv[1:]
    if cmd == "chunk":
        from paffy_tpu.commands.fasta_cmds import chunk_main as m
    elif cmd == "merge":
        from paffy_tpu.commands.fasta_cmds import merge_main as m
    elif cmd == "extract":
        from paffy_tpu.commands.fasta_cmds import extract_main as m
    else:
        sys.stderr.write(f"{cmd} is not a valid faffy command\n")
        _faffy_usage()
        return 1
    return _run(m, rest)

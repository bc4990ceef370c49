"""Shared CLI plumbing for paffy/faffy subcommands.

Every command mirrors the reference conventions (SURVEY.md section 5):
-i/-o default to stdin/stdout, -l sets the log level, -h prints help; flag
names and defaults match the reference getopt tables exactly.
"""

from __future__ import annotations

import argparse
import sys

from paffy_tpu.core import pafio
from paffy_tpu.utils.logging import set_log_level_from_string, log_info, CommandTimer


class CommandError(Exception):
    """Fatal command error -> message on stderr, exit 1."""


def base_parser(prog: str, description: str, io: bool = True) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog=prog, description=description, add_help=True)
    if io:
        p.add_argument("-i", "--inputFile", default=None,
                       help="Input paf file. If not specified reads from stdin")
        p.add_argument("-o", "--outputFile", default=None,
                       help="Output file. If not specified outputs to stdout")
    p.add_argument("-l", "--logLevel", default=None, help="Set the log level")
    return p


def start(args, name: str) -> CommandTimer:
    set_log_level_from_string(getattr(args, "logLevel", None))
    log_info("Input file string : %s", getattr(args, "inputFile", None))
    log_info("Output file string : %s", getattr(args, "outputFile", None))
    return CommandTimer(name)


def open_input(args):
    return sys.stdin if args.inputFile is None else open(args.inputFile, "r")


def open_output(args):
    return sys.stdout if args.outputFile is None else open(args.outputFile, "w")


class _TextReadCompat:
    """Bytes facade over a text stream (tests redirect stdin to StringIO)."""

    def __init__(self, fh):
        self._fh = fh

    def read(self, n=-1):
        return self._fh.read(n).encode("latin-1")


class _TextWriteCompat:
    """Bytes facade over a text stream (tests redirect stdout to StringIO)."""

    def __init__(self, fh):
        self._fh = fh

    def write(self, data):
        return self._fh.write(bytes(data).decode("latin-1"))

    def flush(self):
        self._fh.flush()


def open_input_binary(args):
    """Binary input stream — PAF data never needs a codec pass."""
    if args.inputFile is not None:
        return open(args.inputFile, "rb")
    buf = getattr(sys.stdin, "buffer", None)
    return buf if buf is not None else _TextReadCompat(sys.stdin)


def open_output_binary(args):
    if args.outputFile is not None:
        return open(args.outputFile, "wb")
    buf = getattr(sys.stdout, "buffer", None)
    return buf if buf is not None else _TextWriteCompat(sys.stdout)


def close_input_binary(fh):
    if isinstance(fh, _TextReadCompat) or fh is getattr(sys.stdin, "buffer",
                                                        None):
        return
    fh.close()


def close_output_binary(fh):
    if isinstance(fh, _TextWriteCompat) or fh is getattr(sys.stdout, "buffer",
                                                         None):
        return
    fh.close()


def read_table(args, parse_cigars: bool = True):
    fh = open_input_binary(args)
    try:
        return pafio.parse_paf_data(fh.read(), parse_cigars=parse_cigars)
    finally:
        close_input_binary(fh)


def write_table(t, args, order=None):
    fh = open_output_binary(args)
    try:
        fh.write(pafio.serialize_paf_bytes(t, order=order))
    finally:
        close_output_binary(fh)


# Streaming batch size: the reference streams record-at-a-time; we stream
# batch-at-a-time (device work wants batches).  Memory stays bounded by the
# batch byte budget regardless of input size.
import os

BATCH_BYTES = int(os.environ.get("PAFFY_TPU_BATCH_BYTES", 256 * 1024 * 1024))


def stream_tables(args, batch_bytes: int | None = None,
                  parse_cigars: bool = True, validate_cigars: bool = False):
    """Yield PafTable batches from the input, splitting at line boundaries.

    ``parse_cigars=False`` streams raw-cigar tables (cg re-emitted
    verbatim); ``validate_cigars`` adds the full parser's cigar acceptance
    rule with automatic full-parse fallback on non-canonical input — for
    commands whose reference counterpart parses cigars it never reads
    (see pafio.parse_paf_data)."""
    bb = batch_bytes or BATCH_BYTES
    fh = open_input_binary(args)

    def parse(data):
        # On a malformed line, first yield the records BEFORE it (the
        # reference parses and writes record-at-a-time, so everything
        # before the bad line reaches the output before it aborts) —
        # delivered by re-parsing the clean prefix, then re-raising.
        try:
            return pafio.parse_paf_data(data, parse_cigars=parse_cigars,
                                        validate_cigars=validate_cigars), None
        except pafio.PafFormatError as e:
            if not e.line_no or e.line_no <= 1:
                raise
            off = 0
            for _ in range(e.line_no - 1):
                off = data.index(b"\n", off) + 1
            if off == 0:
                raise
            # classify the failure as the reference would experience it:
            # fewer than 12 strtok tokens (consecutive tabs collapse) means
            # its parser dereferences strtok's NULL — SIGSEGV, stdio buffer
            # LOST, so nothing precedes the crash; >= 12 tokens fail a
            # semantic validation (strand char, cigar char, paf_check) via
            # st_errAbort — exit(1) FLUSHES, so the prefix is emitted.
            line_end = data.find(b"\n", off)
            line = data[off: line_end if line_end >= 0 else len(data)]
            if sum(1 for f in line.split(b"\t") if f) < 12:
                raise
            return pafio.parse_paf_data(data[:off],
                                        parse_cigars=parse_cigars,
                                        validate_cigars=validate_cigars), e
    try:
        leftover = b""
        while True:
            chunk = fh.read(bb)
            if not chunk:
                if leftover:
                    t, err = parse(leftover)
                    yield t
                    if err is not None:
                        raise err
                return
            chunk = leftover + chunk
            cut = chunk.rfind(b"\n")
            if cut < 0:
                leftover = chunk
                continue
            leftover = chunk[cut + 1:]
            t, err = parse(chunk[: cut + 1])
            yield t
            if err is not None:
                raise err
    finally:
        close_input_binary(fh)


def write_check_prefix(out, e) -> None:
    """Before a PafCheckError propagates, emit the records preceding the
    bad one — the reference checks and writes record-at-a-time, so they
    reach the output before it aborts.  The error's ``table`` is the table
    the failing paf_check ran on (i.e. what would have been written)."""
    import numpy as np
    if getattr(e, "table", None) is not None and e.record_index:
        out.write(pafio.serialize_paf_bytes(
            e.table.take(np.arange(e.record_index))))


def stream_transform(args, fn, **stream_kw):
    """read -> fn(batch) -> write, batch by batch (the reference's streaming
    loop shape, e.g. impl/paf_invert.c:84-89, at batch granularity).
    ``stream_kw`` forwards to stream_tables (raw-cigar modes)."""
    out = open_output_binary(args)
    try:
        for t in stream_tables(args, **stream_kw):
            try:
                res = fn(t)
            except pafio.PafCheckError as e:
                write_check_prefix(out, e)
                raise
            if res is not None and len(res):
                out.write(pafio.serialize_paf_bytes(res))
    finally:
        close_output_binary(out)

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


class _TextGlibcFacade:
    """str interface over a GlibcWriter (text-output commands: view,
    to_bed, faffy merge) — same stdio block granularity on error paths."""

    def __init__(self, w):
        self._w = w

    def write(self, s: str) -> int:
        return self._w.write(s.encode("latin-1"))

    def write_bytes(self, data) -> int:
        """Bytes/memoryview passthrough — bulk payloads (stat-line blobs,
        rendered alignment arrays) skip the str round-trip entirely."""
        return self._w.write(data)

    def flush(self) -> None:
        pass

    def close(self) -> None:
        self._w.close()


def open_output(args):
    if args.outputFile is not None:
        return _TextGlibcFacade(GlibcWriter(open(args.outputFile, "wb"),
                                            owns=True))
    buf = getattr(sys.stdout, "buffer", None)
    raw = buf if buf is not None else _TextWriteCompat(sys.stdout)
    return _TextGlibcFacade(GlibcWriter(raw, owns=False))


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


class GlibcWriter:
    """Stdio-granularity staging writer for command output streams.

    The reference writes record-at-a-time through glibc stdio, which
    flushes in full (typically 4096-byte) blocks: on st_errAbort exit()
    flushes the partial tail, on assert/SIGSEGV the tail dies with the
    process (impl/paf.c:155-157 vs the assert classes).  This wrapper
    reproduces that observable granularity at ANY streaming batch size:
    full blocks pass through immediately, the sub-block tail is held until
    ``close`` on a clean finish (flush) or until the CLI layer ends it
    after an exception (flush for errAbort-class errors, discard for
    assert/SIGSEGV-class ones — ``stdio_lost_tail`` on the exception).
    """

    BLOCK = 4096

    def __init__(self, fh, owns: bool):
        self._fh = fh
        self._owns = owns
        self._tail = b""
        _ACTIVE_WRITERS.append(self)

    def write(self, data) -> int:
        # memoryviews (e.g. a rendered uint8 array) stream through with
        # zero large copies — only the sub-block tail is ever copied
        if isinstance(data, (bytes, bytearray, memoryview)):
            b = data
        else:
            b = memoryview(data) if hasattr(data, "__buffer__") else bytes(data)
        total = len(self._tail) + len(b)
        keep = total % self.BLOCK
        if total < self.BLOCK:
            self._tail += bytes(b)
            return len(b)
        # pass the completed blocks through; at most one sub-block copy
        self._fh.write(self._tail)
        cut = len(b) - keep
        mv = memoryview(b)
        self._fh.write(mv[:cut])
        self._tail = bytes(mv[cut:])
        return len(b)

    def flush(self) -> None:
        pass    # interior flushes don't exist in the stdio model

    def _end(self, flush_tail: bool) -> None:
        if self in _ACTIVE_WRITERS:
            _ACTIVE_WRITERS.remove(self)
        if flush_tail and self._tail:
            self._fh.write(self._tail)
        self._tail = b""
        if self._owns:
            self._fh.close()
        else:
            try:
                self._fh.flush()
            except (ValueError, OSError):
                pass

    def close(self) -> None:
        # inside a ``finally`` with an exception in flight the tail's fate
        # depends on the error class — defer to the CLI-layer finalizer
        if sys.exc_info()[0] is None:
            self._end(flush_tail=True)


class _SigAbort:
    """Error marker: die like an assert (stdio tails lost)."""
    stdio_lost_tail = True


def abort_writers() -> None:
    """Finalize all writers as an assert/SIGABRT death would: staged
    sub-block tails are discarded, matching the reference's lost stdio
    buffer (e.g. the view -u/-v sanity asserts, impl/paf_view.c:196-197,
    which fire AFTER the aggregate line is printed but before stdio
    flushes it)."""
    end_writers(error=_SigAbort())


def end_writers(error=None) -> None:
    """Finalize all active output writers.  With ``error`` the tail is
    flushed or discarded by the exception's stdio class (see GlibcWriter);
    without, any still-open writer flushes (defensive — commands normally
    close their own)."""
    lost = bool(getattr(error, "stdio_lost_tail", False))
    for w in list(_ACTIVE_WRITERS):
        w._end(flush_tail=not lost)


_ACTIVE_WRITERS: list = []


def open_output_binary(args):
    if args.outputFile is not None:
        return GlibcWriter(open(args.outputFile, "wb"), owns=True)
    buf = getattr(sys.stdout, "buffer", None)
    raw = buf if buf is not None else _TextWriteCompat(sys.stdout)
    return GlibcWriter(raw, owns=False)


def close_input_binary(fh):
    if isinstance(fh, _TextReadCompat) or fh is getattr(sys.stdin, "buffer",
                                                        None):
        return
    fh.close()


def close_output_binary(fh):
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


def _segv_class(data: bytes, off: int) -> bool:
    """True when the line at byte ``off`` would crash the reference's
    strtok walk (blank / sub-12-token line -> SIGSEGV; >= 12 tokens fail
    semantically -> st_errAbort)."""
    line_end = data.find(b"\n", off)
    line = data[off: line_end if line_end >= 0 else len(data)]
    return sum(1 for f in line.split(b"\t") if f) < 12


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
            # classify the failure as the reference would experience it:
            # fewer than 12 strtok tokens (consecutive tabs collapse) means
            # its parser dereferences strtok's NULL — SIGSEGV, the stdio
            # buffer TAIL is lost (stdio_lost_tail; GlibcWriter discards
            # the sub-block remainder); >= 12 tokens fail a semantic
            # validation (strand char, cigar char) via st_errAbort —
            # exit(1) FLUSHES.  Either way the records BEFORE the bad line
            # were already written by the reference, so both classes yield
            # the clean prefix; the writer's block granularity makes the
            # final bytes identical at any batch size.
            if not e.line_no or e.line_no <= 1:
                e.stdio_lost_tail = _segv_class(data, 0)
                raise
            off = 0
            for _ in range(e.line_no - 1):
                off = data.index(b"\n", off) + 1
            e.stdio_lost_tail = _segv_class(data, off)
            if off == 0:
                raise
            # recurse on the clean-looking prefix: the scan and fill passes
            # report different error kinds, so an EARLIER line may fail a
            # check the later (reported-first) line's pass never reached —
            # the reference dies at the first bad line in FILE order, and
            # that line's error (and death class) must win
            sub_t, sub_err = parse(data[:off])
            return sub_t, (sub_err if sub_err is not None else e)
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

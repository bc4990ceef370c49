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


def read_table(args):
    fh = open_input(args)
    try:
        return pafio.parse_paf_text(fh.read())
    finally:
        if fh is not sys.stdin:
            fh.close()


def write_table(t, args):
    fh = open_output(args)
    try:
        fh.write(pafio.serialize_paf(t))
    finally:
        if fh is not sys.stdout:
            fh.close()


# Streaming batch size: the reference streams record-at-a-time; we stream
# batch-at-a-time (device work wants batches).  Memory stays bounded by the
# batch byte budget regardless of input size.
import os

BATCH_BYTES = int(os.environ.get("PAFFY_TPU_BATCH_BYTES", 256 * 1024 * 1024))


def stream_tables(args, batch_bytes: int | None = None):
    """Yield PafTable batches from the input, splitting at line boundaries."""
    bb = batch_bytes or BATCH_BYTES
    fh = open_input(args)
    try:
        leftover = ""
        while True:
            chunk = fh.read(bb)
            if not chunk:
                if leftover:
                    yield pafio.parse_paf_text(leftover)
                return
            chunk = leftover + chunk
            cut = chunk.rfind("\n")
            if cut < 0:
                leftover = chunk
                continue
            leftover = chunk[cut + 1:]
            yield pafio.parse_paf_text(chunk[: cut + 1])
    finally:
        if fh is not sys.stdin:
            fh.close()


def stream_transform(args, fn):
    """read -> fn(batch) -> write, batch by batch (the reference's streaming
    loop shape, e.g. impl/paf_invert.c:84-89, at batch granularity)."""
    out = open_output(args)
    try:
        for t in stream_tables(args):
            res = fn(t)
            if res is not None and len(res):
                out.write(pafio.serialize_paf(res))
    finally:
        if out is not sys.stdout:
            out.close()

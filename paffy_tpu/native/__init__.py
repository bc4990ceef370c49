"""ctypes loader for the native C++ ingest/egress library.

Builds lazily with g++ on first use (cached as libpaffy_io.so next to the
source); every entry point has a pure-Python fallback in core.pafio, so the
package works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "paffy_io.cpp")
_LIB = os.path.join(_DIR, "libpaffy_io.so")
_lock = threading.Lock()
_lib = None
_failed = False

_I64P = ctypes.POINTER(ctypes.c_longlong)
_U8P = ctypes.POINTER(ctypes.c_ubyte)
_U16P = ctypes.POINTER(ctypes.c_ushort)
_F32P = ctypes.POINTER(ctypes.c_float)


_FAST_SRC = os.path.join(_DIR, "paffy_fast.cpp")
_FAST_BIN = os.path.join(_DIR, "paffy_fast")


def build_fast() -> bool:
    """Build the zero-startup CLI lane (bin/paffy dispatches dedupe/
    split_file/chain to it).  Lazy + mtime-cached like the library;
    non-fatal — a missing binary just keeps those commands on the Python
    lane."""
    try:
        if (os.path.exists(_FAST_BIN)
                and os.path.getmtime(_FAST_BIN) >= os.path.getmtime(_FAST_SRC)
                and os.path.getmtime(_FAST_BIN) >= os.path.getmtime(_SRC)):
            return True
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-pthread",
             _FAST_SRC, _SRC, "-o", _FAST_BIN + ".tmp"],
            check=True, capture_output=True, timeout=180)
        os.replace(_FAST_BIN + ".tmp", _FAST_BIN)
        return True
    except (subprocess.SubprocessError, OSError, FileNotFoundError):
        return False


def _build() -> bool:
    if os.path.exists(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        build_fast()
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-pthread",
             _SRC, "-o", _LIB + ".tmp"],
            check=True, capture_output=True, timeout=120)
        os.replace(_LIB + ".tmp", _LIB)
        build_fast()
        return True
    except (subprocess.SubprocessError, OSError, FileNotFoundError):
        return False


def get_lib():
    """The loaded library, or None when native support is unavailable."""
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        if not _build():
            _failed = True
            return None
        lib = ctypes.CDLL(_LIB)
        lib.paf_scan.restype = ctypes.c_longlong
        lib.paf_scan.argtypes = [ctypes.c_char_p, ctypes.c_longlong,
                                 _I64P, _I64P, _I64P]
        lib.paf_fill.restype = ctypes.c_longlong
        lib.paf_fill.argtypes = [ctypes.c_char_p, ctypes.c_longlong,
                                 _I64P, _U8P, _U8P, _I64P, _I64P,
                                 ctypes.c_char_p, _U8P, _I64P, _I64P]
        lib.paf_serialize_sizes.restype = None
        lib.paf_serialize_sizes.argtypes = [ctypes.c_longlong, _I64P, _U8P,
                                            _U8P, _I64P, _I64P,
                                            ctypes.c_char_p, _U8P, _I64P,
                                            _I64P, _I64P, _I64P, _I64P,
                                            ctypes.c_longlong]
        lib.paf_serialize_fill.restype = ctypes.c_longlong
        lib.paf_serialize_fill.argtypes = [ctypes.c_longlong, _I64P, _U8P,
                                           _U8P, _I64P, _I64P,
                                           ctypes.c_char_p, _U8P, _I64P,
                                           _I64P, _I64P,
                                           ctypes.c_char_p, _I64P, _I64P,
                                           _I64P, ctypes.c_char_p,
                                           ctypes.c_longlong]
        lib.paf_scan_mt.restype = ctypes.c_longlong
        lib.paf_scan_mt.argtypes = [ctypes.c_char_p, ctypes.c_longlong,
                                    ctypes.c_longlong, _I64P, _I64P, _I64P,
                                    _I64P, _I64P]
        lib.paf_fill_mt.restype = ctypes.c_longlong
        lib.paf_fill_mt.argtypes = [ctypes.c_char_p, ctypes.c_longlong,
                                    ctypes.c_longlong, _I64P, _I64P, _I64P,
                                    _I64P, _I64P, _I64P, _U8P, _U8P, _I64P,
                                    _I64P, ctypes.c_char_p, _U8P, _I64P,
                                    _I64P]
        lib.paf_scan_raw.restype = ctypes.c_longlong
        lib.paf_scan_raw.argtypes = [ctypes.c_char_p, ctypes.c_longlong,
                                     _I64P, _I64P]
        lib.paf_scan_raw_mt.restype = ctypes.c_longlong
        lib.paf_scan_raw_mt.argtypes = [ctypes.c_char_p, ctypes.c_longlong,
                                        ctypes.c_longlong, _I64P, _I64P,
                                        _I64P, _I64P]
        lib.paf_fill_raw_mt.restype = ctypes.c_longlong
        lib.paf_fill_raw_mt.argtypes = [ctypes.c_char_p, ctypes.c_longlong,
                                        ctypes.c_longlong, _I64P, _I64P,
                                        _I64P, _I64P, _I64P, _U8P, _U8P,
                                        _I64P, _I64P, ctypes.c_char_p,
                                        _I64P, _I64P, ctypes.c_longlong,
                                        _I64P]
        lib.paf_fill_raw.restype = ctypes.c_longlong
        lib.paf_fill_raw.argtypes = [ctypes.c_char_p, ctypes.c_longlong,
                                     _I64P, _U8P, _U8P, _I64P, _I64P,
                                     ctypes.c_char_p, _I64P, _I64P,
                                     ctypes.c_longlong, _I64P]
        lib.encode_runs_per_mop.restype = None
        lib.encode_runs_per_mop.argtypes = [_U8P, ctypes.c_longlong, _I64P,
                                            _I64P, _I64P, _U8P, _I64P,
                                            ctypes.c_longlong]
        lib.encode_runs_fill_cigar.restype = None
        lib.encode_runs_fill_cigar.argtypes = [_U8P, ctypes.c_longlong,
                                               _I64P, _I64P, _I64P, _U8P,
                                               _I64P, _U8P, _I64P,
                                               ctypes.c_longlong]
        lib.build_mop_batch.restype = ctypes.c_longlong
        lib.build_mop_batch.argtypes = [ctypes.c_longlong, _U8P, _I64P,
                                        _I64P, _U8P, _I64P, _I64P, _I64P,
                                        _I64P, _I64P, _I64P, _I64P, _I64P,
                                        _I64P, _U8P, _I64P, _I64P, _I64P]
        lib.build_packed2_grid.restype = ctypes.c_longlong
        _I32P = ctypes.POINTER(ctypes.c_int)
        _I16P = ctypes.POINTER(ctypes.c_short)
        _I8P = ctypes.POINTER(ctypes.c_byte)
        lib.build_packed2_grid.argtypes = [ctypes.c_longlong, _I64P, _I64P,
                                           _I64P, _U8P, _I64P,
                                           ctypes.c_longlong,
                                           ctypes.c_longlong,
                                           ctypes.c_longlong,
                                           _I32P, _I32P, _I8P, _I16P, _I16P,
                                           _I32P]
        lib.cigar_stats.restype = None
        lib.cigar_stats.argtypes = [ctypes.c_longlong, _U8P, _I64P, _I64P,
                                    _I64P]
        lib.cigar_stats_raw.restype = None
        lib.cigar_stats_raw.argtypes = [ctypes.c_longlong, ctypes.c_char_p,
                                        _I64P, _I64P, _I64P,
                                        ctypes.c_longlong]
        lib.view_stats_lines.restype = ctypes.c_longlong
        lib.view_stats_lines.argtypes = [ctypes.c_longlong, _I64P, _I64P,
                                         ctypes.c_char_p, _I64P,
                                         ctypes.c_char_p]
        lib.view_render_batch.restype = None
        lib.view_render_batch.argtypes = [ctypes.c_longlong, _I64P, _U8P,
                                          _I64P, _I64P, _I64P, _I64P, _U8P,
                                          _U8P, _I64P, _I64P, _I64P, _I64P,
                                          ctypes.c_char_p, _I64P, _I64P,
                                          ctypes.c_char_p,
                                          ctypes.c_longlong]
        lib.synth_query_pool.restype = None
        lib.synth_query_pool.argtypes = [_U8P, ctypes.c_longlong, _I64P,
                                         _I64P, _I64P, _U8P,
                                         ctypes.c_longlong, ctypes.c_ulonglong]
        lib.column_compare_counts.restype = None
        lib.column_compare_counts.argtypes = [_U8P, ctypes.c_longlong,
                                              _I64P, _I64P, _I64P, _U8P,
                                              _I64P, _I64P, _I64P]
        lib.column_compare_counts_mt.restype = None
        lib.column_compare_counts_mt.argtypes = [_U8P, ctypes.c_longlong,
                                                 _I64P, _I64P, _I64P, _U8P,
                                                 _I64P, ctypes.c_longlong,
                                                 _I64P, _I64P,
                                                 ctypes.c_longlong]
        lib.chain_dp.restype = None
        lib.chain_dp.argtypes = [ctypes.c_longlong, _I64P, _I64P, _I64P,
                                 _I64P, _I64P, _I64P, _I64P, _I64P,
                                 ctypes.c_longlong, ctypes.c_longlong,
                                 ctypes.c_longlong, _I64P, _I64P]
        lib.tile_sweep.restype = None
        lib.tile_sweep.argtypes = [ctypes.c_longlong, _I64P, _I64P, _I64P,
                                   _I64P, _I64P, _U16P, ctypes.c_longlong,
                                   _I64P]
        lib.trim_counts.restype = None
        lib.trim_counts.argtypes = [ctypes.c_longlong, _I64P, _U8P, _I64P,
                                    _F32P, _F32P, _I64P, _U8P, _I64P]
        lib.trim_tails_apply.restype = None
        lib.trim_tails_apply.argtypes = [ctypes.c_longlong, _I64P, _U8P,
                                         _I64P, _U8P, ctypes.c_float,
                                         ctypes.c_float, _I64P, _I64P,
                                         _I64P, _I64P, _I64P, _I64P,
                                         ctypes.c_longlong]
        lib.query_walk_violation.restype = ctypes.c_longlong
        lib.query_walk_violation.argtypes = [ctypes.c_longlong, _I64P, _U8P,
                                             _I64P, _I64P, _I64P, _I64P]
        lib.shatter_violation.restype = ctypes.c_longlong
        lib.shatter_violation.argtypes = [ctypes.c_longlong, _I64P, _U8P,
                                          _I64P, _U8P, _I64P, _I64P, _I64P,
                                          _I64P, _I64P, _I64P, _I64P]
        lib.trim_tails_raw.restype = None
        lib.trim_tails_raw.argtypes = [ctypes.c_longlong, ctypes.c_char_p,
                                       _I64P, _I64P, _U8P, ctypes.c_float,
                                       ctypes.c_float, _I64P, _I64P, _I64P,
                                       _I64P, _I64P, _I64P,
                                       ctypes.c_longlong]
        lib.copy_op_ranges.restype = None
        lib.copy_op_ranges.argtypes = [ctypes.c_longlong, _I64P, _I64P,
                                       _I64P, _U8P, _I64P, _U8P, _I64P,
                                       ctypes.c_longlong]
        lib.invert_ops.restype = None
        lib.invert_ops.argtypes = [ctypes.c_longlong, _I64P, _U8P, _I64P,
                                   _U8P, _U8P, _I64P, ctypes.c_longlong]
        lib.shatter_walk.restype = None
        lib.shatter_walk.argtypes = [ctypes.c_longlong, _I64P, _U8P, _I64P,
                                     _I64P, _I64P, _I64P, _U8P, _I64P,
                                     _I64P, _I64P, _I64P, _I64P,
                                     ctypes.c_longlong]
        lib.pack_ints13.restype = None
        lib.pack_ints13.argtypes = [ctypes.c_longlong,
                                    ctypes.POINTER(_I64P), _I64P,
                                    ctypes.c_longlong]
        lib.match_intervals.restype = ctypes.c_longlong
        lib.match_intervals.argtypes = [ctypes.c_longlong, _I64P, _U8P,
                                        _I64P, _I64P, _I64P, _I64P, _I64P]
        lib.coverage_counts.restype = None
        lib.coverage_counts.argtypes = [_I64P, ctypes.c_longlong,
                                        ctypes.c_longlong, _U16P]
        lib.coverage_counts32.restype = None
        lib.coverage_counts32.argtypes = [_I32P, ctypes.c_longlong,
                                          ctypes.c_longlong, _U16P]
        lib.fasta_scan.restype = None
        lib.fasta_scan.argtypes = [ctypes.c_char_p, ctypes.c_longlong,
                                   _I64P, _I64P, _I64P]
        lib.fasta_fill_headers.restype = None
        lib.fasta_fill_headers.argtypes = [ctypes.c_char_p,
                                           ctypes.c_longlong,
                                           ctypes.c_char_p, _I64P, _I64P]
        lib.fasta_fill.restype = None
        lib.fasta_fill.argtypes = [ctypes.c_char_p, ctypes.c_longlong,
                                   ctypes.c_char_p, _I64P, _I64P, _I64P,
                                   _U8P]
        lib.encode_rebuild_offsets.restype = None
        lib.encode_rebuild_offsets.argtypes = [ctypes.c_longlong, _U8P,
                                               _I64P, _I64P, _I64P, _I64P,
                                               _U8P, _I64P]
        lib.coverage_add.restype = None
        lib.coverage_add.argtypes = [_I32P, _I64P, _I64P, ctypes.c_longlong]
        lib.rle_u16_count.restype = ctypes.c_longlong
        lib.rle_u16_count.argtypes = [_U16P, ctypes.c_longlong,
                                      ctypes.c_longlong]
        lib.rle_u16_fill.restype = None
        lib.rle_u16_fill.argtypes = [_U16P, ctypes.c_longlong,
                                     ctypes.c_longlong, _I64P, _I64P, _I64P]
        lib.paf_check_batch.restype = ctypes.c_longlong
        lib.paf_check_batch.argtypes = [ctypes.c_longlong, _I64P, _U8P,
                                        _I64P, _I64P, _I64P, _I64P, _I64P,
                                        _I64P, _I64P, _U8P, _I64P]
        lib.column_encode_runs.restype = ctypes.c_longlong
        lib.column_encode_runs.argtypes = [_U8P, ctypes.c_longlong,
                                           _I64P, _I64P, _I64P, _U8P,
                                           _I64P, _U8P, ctypes.c_longlong,
                                           _I64P]
        _enc_common = [ctypes.c_longlong, _I64P, _U8P, _U8P, _I64P, _I64P,
                       ctypes.c_char_p, _U8P, _I64P, _I64P, _U8P, _I64P,
                       _I64P]
        lib.encode_serialize_sizes.restype = None
        lib.encode_serialize_sizes.argtypes = _enc_common + [
            _I64P, ctypes.c_longlong]
        lib.encode_serialize_fill.restype = ctypes.c_longlong
        lib.encode_serialize_fill.argtypes = _enc_common + [
            _I64P, ctypes.c_char_p, ctypes.c_longlong]
        _shat_common = [ctypes.c_longlong, _I64P, _U8P, _U8P, _I64P, _I64P,
                        ctypes.c_char_p, _U8P, _I64P, _I64P]
        lib.invert_serialize_fill.restype = ctypes.c_longlong
        lib.invert_serialize_fill.argtypes = [
            ctypes.c_longlong, _I64P, _U8P, _U8P, _I64P, _I64P,
            ctypes.c_char_p, ctypes.c_char_p, _I64P, _I64P, _I64P,
            ctypes.c_char_p, ctypes.c_longlong]
        lib.shatter_serialize_sizes.restype = None
        lib.shatter_serialize_sizes.argtypes = _shat_common + [
            _I64P, ctypes.c_longlong]
        lib.shatter_serialize_fill.restype = ctypes.c_longlong
        lib.shatter_serialize_fill.argtypes = _shat_common + [
            _I64P, ctypes.c_char_p, ctypes.c_longlong]
        _lib = lib
        return _lib


def _p_i64(a: np.ndarray):
    return a.ctypes.data_as(_I64P)


def _p_u8(a: np.ndarray):
    return a.ctypes.data_as(_U8P)


class NativeParseError(ValueError):
    """Malformed PAF input.  ``line_no`` is the 1-based line number WITHIN
    the data passed to the failing parse call (range-local), letting
    streaming callers emit the records before it — the reference parses
    and writes record-at-a-time, so everything before the bad line reaches
    the output before it aborts (paf_parse, impl/paf.c:137-209)."""

    def __init__(self, msg, line_no=None):
        super().__init__(msg)
        self.line_no = line_no


_PARSE_MT_BYTES = 4 << 20   # thread the parse above 4 MB of input


def parse_paf_bytes(data: bytes, n_threads: int | None = None):
    """Parse PAF text via the native tokenizer (threaded above
    _PARSE_MT_BYTES: newline-aligned shards, per-shard counts cumsummed
    into pass-2 base offsets — identical arrays and error line numbers).

    Returns the raw SoA arrays:
    (ints[n,13], flags[n], type[n], qname list, tname list, ops, lens, off)
    or None when the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    nt = _default_threads(n_threads)
    if len(data) < _PARSE_MT_BYTES:
        nt = 1
    if nt > 1:
        bounds = np.empty(nt + 1, dtype=np.int64)
        s_rec = np.empty(nt, dtype=np.int64)
        s_ops = np.empty(nt, dtype=np.int64)
        s_names = np.empty(nt, dtype=np.int64)
        s_lines = np.empty(nt, dtype=np.int64)
        rc = lib.paf_scan_mt(data, len(data), nt, _p_i64(bounds),
                             _p_i64(s_rec), _p_i64(s_ops), _p_i64(s_names),
                             _p_i64(s_lines))
        if rc != 0:
            raise NativeParseError(f"malformed PAF at line {rc}", rc)
        n, t_ops, nb = int(s_rec.sum()), int(s_ops.sum()), int(s_names.sum())
    else:
        n_rec = ctypes.c_longlong()
        n_ops = ctypes.c_longlong()
        name_bytes = ctypes.c_longlong()
        rc = lib.paf_scan(data, len(data), ctypes.byref(n_rec),
                          ctypes.byref(n_ops), ctypes.byref(name_bytes))
        if rc != 0:
            raise NativeParseError(f"malformed PAF at line {rc}", rc)
        n, t_ops, nb = n_rec.value, n_ops.value, name_bytes.value
    ints = np.empty((n, 13), dtype=np.int64)
    flags = np.empty(n, dtype=np.uint8)
    rtype = np.empty(n, dtype=np.uint8)
    qoff = np.empty(n, dtype=np.int64)
    toff = np.empty(n, dtype=np.int64)
    pool = np.empty(max(nb, 1), dtype=np.uint8)
    ops = np.empty(t_ops, dtype=np.uint8)
    lens = np.empty(t_ops, dtype=np.int64)
    off = np.empty(n + 1, dtype=np.int64)
    if nt > 1:
        def base(c):
            b = np.zeros(nt, dtype=np.int64)
            np.cumsum(c[:-1], out=b[1:])
            return b
        rc = lib.paf_fill_mt(data, len(data), nt, _p_i64(bounds),
                             _p_i64(base(s_rec)), _p_i64(base(s_ops)),
                             _p_i64(base(s_names)), _p_i64(s_lines),
                             _p_i64(ints), _p_u8(flags), _p_u8(rtype),
                             _p_i64(qoff), _p_i64(toff),
                             pool.ctypes.data_as(ctypes.c_char_p),
                             _p_u8(ops), _p_i64(lens), _p_i64(off))
    else:
        rc = lib.paf_fill(data, len(data), _p_i64(ints), _p_u8(flags),
                          _p_u8(rtype), _p_i64(qoff), _p_i64(toff),
                          pool.ctypes.data_as(ctypes.c_char_p),
                          _p_u8(ops), _p_i64(lens), _p_i64(off))
    if rc != 0:
        raise NativeParseError(f"malformed PAF at line {rc}", rc)
    raw = pool.tobytes()
    qnames = np.empty(n, dtype=object)
    tnames = np.empty(n, dtype=object)
    for i in range(n):
        qend = raw.index(b"\0", qoff[i])
        qnames[i] = raw[qoff[i]: qend].decode("latin-1")
        tend = raw.index(b"\0", toff[i])
        tnames[i] = raw[toff[i]: tend].decode("latin-1")
    return ints, flags, rtype, qnames, tnames, ops, lens, off


def parse_paf_bytes_raw(data: bytes, validate_cigars: bool = False):
    """Parse PAF text WITHOUT parsing cigars — the reference's
    read_pafs(parse_cigar=0) mode (impl/paf_chain.c:128): the cg tag stays
    an unparsed byte range into ``data`` and is re-emitted verbatim.

    ``validate_cigars`` applies the full parser's cigar-text acceptance
    rule (for commands whose reference counterpart DOES parse cigars, e.g.
    dedupe/split_file — raw mode must reject what they reject) and returns
    the string "noncanon" when any cigar length has a leading zero: valid
    input the full parser would canonicalize on re-emit, so the caller
    must fall back to the full parse to stay byte-identical.

    Returns (ints[n,13], flags[n], type[n], qnames, tnames, cg_start[n],
    cg_len[n]), None when the native library is unavailable, or
    "noncanon" (validate_cigars only).
    """
    lib = get_lib()
    if lib is None:
        return None
    # threaded two-pass above ~4 MB (mirrors the full parser's mt route);
    # single-thread below — thread spawn costs more than the scan there
    T = _default_threads(None) if len(data) >= (4 << 20) else 1
    bounds = np.zeros(T + 1, dtype=np.int64)
    recs = np.zeros(T, dtype=np.int64)
    names_c = np.zeros(T, dtype=np.int64)
    lines = np.zeros(T, dtype=np.int64)
    rc = lib.paf_scan_raw_mt(data, len(data), T, _p_i64(bounds),
                             _p_i64(recs), _p_i64(names_c), _p_i64(lines))
    if rc != 0:
        raise NativeParseError(f"malformed PAF at line {rc}", rc)
    rec_base = np.zeros(T, dtype=np.int64)
    name_base = np.zeros(T, dtype=np.int64)
    np.cumsum(recs[:-1], out=rec_base[1:])
    np.cumsum(names_c[:-1], out=name_base[1:])
    n, nb = int(recs.sum()), int(names_c.sum())
    ints = np.empty((n, 13), dtype=np.int64)
    flags = np.empty(n, dtype=np.uint8)
    rtype = np.empty(n, dtype=np.uint8)
    qoff = np.empty(n, dtype=np.int64)
    toff = np.empty(n, dtype=np.int64)
    pool = np.empty(max(nb, 1), dtype=np.uint8)
    cg_start = np.empty(n, dtype=np.int64)
    cg_len = np.empty(n, dtype=np.int64)
    noncanon = np.zeros(1, dtype=np.int64)
    rc = lib.paf_fill_raw_mt(data, len(data), T, _p_i64(bounds),
                             _p_i64(rec_base), _p_i64(name_base),
                             _p_i64(lines), _p_i64(ints), _p_u8(flags),
                             _p_u8(rtype), _p_i64(qoff), _p_i64(toff),
                             pool.ctypes.data_as(ctypes.c_char_p),
                             _p_i64(cg_start), _p_i64(cg_len),
                             1 if validate_cigars else 0, _p_i64(noncanon))
    if rc != 0:
        raise NativeParseError(f"malformed PAF at line {rc}", rc)
    if validate_cigars and noncanon[0]:
        return "noncanon"
    raw = pool.tobytes()
    qnames = np.empty(n, dtype=object)
    tnames = np.empty(n, dtype=object)
    for i in range(n):
        qend = raw.index(b"\0", qoff[i])
        qnames[i] = raw[qoff[i]: qend].decode("latin-1")
        tend = raw.index(b"\0", toff[i])
        tnames[i] = raw[toff[i]: tend].decode("latin-1")
    return ints, flags, rtype, qnames, tnames, cg_start, cg_len


def _name_pool(qnames, tnames):
    """NUL-separated name pool + per-record offsets for the native
    formatters.  Each DISTINCT name is encoded and stored once (a shattered
    batch has millions of records over a handful of contigs — per-record
    encoding measured ~6 s on 5.9M records vs ~0.3 s deduplicated), and
    offset lookups collapse runs of equal consecutive names (record-
    multiplying transforms emit long same-name runs; per-record dict probes
    measured ~3.6 s on 5.9M names vs ~0.3 s run-collapsed)."""
    pool_off: dict[str, int] = {}
    parts = []
    pos = 0

    def off_of(name: str) -> int:
        nonlocal pos
        o = pool_off.get(name)
        if o is None:
            enc = name.encode("latin-1")
            pool_off[name] = o = pos
            parts.append(enc)
            pos += len(enc) + 1
        return o

    def offsets(names) -> np.ndarray:
        n = len(names)
        if n == 0:
            return np.empty(0, dtype=np.int64)
        change = np.empty(n, dtype=bool)
        change[0] = True
        np.not_equal(names[1:], names[:-1], out=change[1:])
        idx = np.flatnonzero(change)
        vals = np.fromiter((off_of(names[i]) for i in idx),
                           dtype=np.int64, count=len(idx))
        counts = np.diff(np.append(idx, n))
        return np.repeat(vals, counts)

    qoff = offsets(qnames)
    toff = offsets(tnames)
    return b"\0".join(parts) + b"\0", qoff, toff


def serialize_paf_arrays(ints, flags, rtype, qnames, tnames, ops, lens, off,
                         order=None, raw_cig=None,
                         n_threads: int | None = None):
    """Exact-size threaded serialization.  Returns a uint8 ndarray holding
    the serialized bytes (callers hand out a zero-copy memoryview), or None
    without a toolchain.  ``order`` (optional int64 permutation) emits
    record order[r] at slot r — sorted output without copying cigars.
    ``raw_cig`` = (buf: bytes, cg_start, cg_len) emits each cigar verbatim
    from the original input buffer (the raw-parse mode)."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(flags)
    pool, qoff, toff = _name_pool(qnames, tnames)
    ints = np.ascontiguousarray(ints, dtype=np.int64)
    flags = np.ascontiguousarray(flags)
    rtype = np.ascontiguousarray(rtype)
    ops = np.ascontiguousarray(ops)
    lens = np.ascontiguousarray(lens, dtype=np.int64)
    off = np.ascontiguousarray(off, dtype=np.int64)
    if order is not None:
        order = np.ascontiguousarray(order, dtype=np.int64)
        n = len(order)
    p_order = _p_i64(order) if order is not None else None
    raw_buf = None
    cg_start = cg_len = None
    p_cg_start = p_cg_len = None
    if raw_cig is not None:
        raw_buf, cg_start, cg_len = raw_cig
        cg_start = np.ascontiguousarray(cg_start, dtype=np.int64)
        cg_len = np.ascontiguousarray(cg_len, dtype=np.int64)
        p_cg_start = _p_i64(cg_start)
        p_cg_len = _p_i64(cg_len)
    nt = _default_threads(n_threads)
    out_off = np.empty(n + 1, dtype=np.int64)
    out_off[0] = 0
    lib.paf_serialize_sizes(n, _p_i64(ints), _p_u8(flags), _p_u8(rtype),
                            _p_i64(qoff), _p_i64(toff), pool, _p_u8(ops),
                            _p_i64(lens), _p_i64(off), p_order, p_cg_len,
                            _p_i64(out_off[1:]), nt)
    np.cumsum(out_off[1:], out=out_off[1:])
    out = np.empty(int(out_off[-1]), dtype=np.uint8)
    rc = lib.paf_serialize_fill(n, _p_i64(ints), _p_u8(flags), _p_u8(rtype),
                                _p_i64(qoff), _p_i64(toff), pool, _p_u8(ops),
                                _p_i64(lens), _p_i64(off), p_order,
                                raw_buf, p_cg_start, p_cg_len,
                                _p_i64(out_off),
                                out.ctypes.data_as(ctypes.c_char_p), nt)
    if rc != 0:  # measured/written drift — never expected; fail loudly
        raise RuntimeError("paf_serialize_fill length mismatch")
    return out


def view_stats_lines(qnames, tnames, vals: np.ndarray) -> bytes | None:
    """Batch-format `paffy view` per-record stat lines.

    vals is int64 [n,12]: qstart qend tstart tend strand score matches
    mismatches query_inserts query_deletes query_insert_bases
    query_delete_bases.  Returns the formatted block, or None when the
    native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    n = len(qnames)
    pool, qoff, toff = _name_pool(qnames, tnames)
    vals = np.ascontiguousarray(vals, dtype=np.int64)
    out = np.empty(n * 430 + len(pool), dtype=np.uint8)
    written = lib.view_stats_lines(n, _p_i64(qoff), _p_i64(toff), pool,
                                   _p_i64(vals),
                                   out.ctypes.data_as(ctypes.c_char_p))
    return out[: int(written)].tobytes()


def view_render_batch(t, pool, stat_blob: bytes | None):
    """Batched `view -a` output: each record's stat line (sliced from
    ``stat_blob``, the view_stats_lines output) interleaved with its 3-row
    alignment rendering in 150-column windows (paf_pretty_print2,
    impl/paf.c:282-314).  Returns the full bytes, or None without a
    toolchain.  ``stat_blob=None`` emits renders only."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(t)
    qpo = np.empty(n, dtype=np.int64)
    tpo = np.empty(n, dtype=np.int64)
    qsl = np.empty(n, dtype=np.int64)
    tsl = np.empty(n, dtype=np.int64)
    g = pool._guard
    idx = pool.index
    for i in range(n):
        o, l = idx[t.qname[i]]
        qpo[i] = o + g
        qsl[i] = l
        o, l = idx[t.tname[i]]
        tpo[i] = o + g
        tsl[i] = l
    if stat_blob is not None:
        nl = np.flatnonzero(np.frombuffer(stat_blob, dtype=np.uint8)
                            == ord("\n"))
        stat_off = np.concatenate([[0], nl + 1]).astype(np.int64)
        stat_len = np.diff(stat_off)
    else:
        stat_off = np.zeros(n + 1, dtype=np.int64)
        stat_len = np.zeros(n, dtype=np.int64)
    off = np.ascontiguousarray(t.off, dtype=np.int64)
    lens = np.ascontiguousarray(t.lens, dtype=np.int64)
    ops = np.ascontiguousarray(t.ops, dtype=np.uint8)
    cs = np.concatenate([[0], np.cumsum(lens)])
    ncols = cs[off[1:]] - cs[off[:-1]]
    sizes = stat_len + 3 * ncols + 3 * ((ncols + 149) // 150)
    out_off = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)
    out = np.empty(int(out_off[-1]), dtype=np.uint8)
    lib.view_render_batch(
        n, _p_i64(off), _p_u8(ops), _p_i64(lens),
        _p_i64(np.ascontiguousarray(t.qstart, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(t.qend, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(t.tstart, dtype=np.int64)),
        _p_u8(np.ascontiguousarray(t.strand, dtype=np.uint8)),
        _p_u8(pool.host_pool), _p_i64(qpo), _p_i64(tpo), _p_i64(qsl),
        _p_i64(tsl), stat_blob, _p_i64(np.ascontiguousarray(stat_off)),
        _p_i64(out_off), out.ctypes.data_as(ctypes.c_char_p),
        _default_threads(None))
    return out


def column_compare_counts(pool: np.ndarray, lens, qpos0, tpos0, rev, rec,
                          n_records: int):
    """Single-threaded C per-base column compare (benchmark baseline)."""
    lib = get_lib()
    if lib is None:
        return None
    n_mops = len(lens)
    m = np.zeros(n_records, dtype=np.int64)
    x = np.zeros(n_records, dtype=np.int64)
    lib.column_compare_counts(
        _p_u8(np.ascontiguousarray(pool)), n_mops,
        _p_i64(np.ascontiguousarray(lens, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(qpos0, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(tpos0, dtype=np.int64)),
        _p_u8(np.ascontiguousarray(rev, dtype=np.uint8)),
        _p_i64(np.ascontiguousarray(rec, dtype=np.int64)),
        _p_i64(m), _p_i64(x))
    return m, x


def column_compare_counts_mt(pool: np.ndarray, lens, qpos0, tpos0, rev, rec,
                             n_records: int, n_threads: int | None = None):
    """Threaded per-base column compare — the production host counts path
    (per-thread partial [n_records] accumulators summed after the join;
    result identical to the single-threaded loop)."""
    lib = get_lib()
    if lib is None:
        return None
    n_mops = len(lens)
    m = np.zeros(n_records, dtype=np.int64)
    x = np.zeros(n_records, dtype=np.int64)
    lib.column_compare_counts_mt(
        _p_u8(np.ascontiguousarray(pool)), n_mops,
        _p_i64(np.ascontiguousarray(lens, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(qpos0, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(tpos0, dtype=np.int64)),
        _p_u8(np.ascontiguousarray(rev, dtype=np.uint8)),
        _p_i64(np.ascontiguousarray(rec, dtype=np.int64)),
        n_records, _p_i64(m), _p_i64(x), _default_threads(n_threads))
    return m, x


def chain_dp(qs, qe, ts, te, score, qe_order, lo, hi,
             gap_open: int, gap_extend: int, max_gap: int):
    """Windowed chain DP (host production path; exact _dp_numpy semantics
    incl. the (target_end, query_end, index) tiebreak)."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(qs)
    cs = np.zeros(n, dtype=np.int64)
    pred = np.zeros(n, dtype=np.int64)
    lib.chain_dp(
        n,
        _p_i64(np.ascontiguousarray(qs, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(qe, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(ts, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(te, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(score, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(qe_order, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(lo, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(hi, dtype=np.int64)),
        gap_open, gap_extend, max_gap, _p_i64(cs), _p_i64(pred))
    return cs, pred


def tile_sweep(order, arena_off, run_off, istart, iend,
               arena: np.ndarray, saturation: int, levels: np.ndarray):
    """Greedy tile sweep over the packed coverage arena (host production
    path; exact _assign_tile_levels_host semantics).  Mutates ``arena`` and
    ``levels`` in place; returns True when the native library ran."""
    lib = get_lib()
    if lib is None:
        return False
    assert arena.dtype == np.uint16 and arena.flags.c_contiguous
    assert levels.dtype == np.int64 and levels.flags.c_contiguous
    lib.tile_sweep(
        len(order),
        _p_i64(np.ascontiguousarray(order, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(arena_off, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(run_off, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(istart, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(iend, dtype=np.int64)),
        arena.ctypes.data_as(_U16P), saturation, _p_i64(levels))
    return True


def trim_counts(off, is_match, lens, thr_f32, ident_f32, max_trim,
                rev=None):
    """Per-record leading-ops-to-drop of the unreliable-tail trim (host
    production path; exact ops/tailtrim._trim_counts semantics).  ``rev``
    flips the scan direction per record — the suffix pass on the logically
    inverted table."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(off) - 1
    out = np.zeros(n, dtype=np.int64)
    lib.trim_counts(
        n, _p_i64(np.ascontiguousarray(off, dtype=np.int64)),
        _p_u8(np.ascontiguousarray(is_match, dtype=np.uint8)),
        _p_i64(np.ascontiguousarray(lens, dtype=np.int64)),
        np.ascontiguousarray(thr_f32, dtype=np.float32).ctypes
            .data_as(_F32P),
        np.ascontiguousarray(ident_f32, dtype=np.float32).ctypes
            .data_as(_F32P),
        _p_i64(np.ascontiguousarray(max_trim, dtype=np.int64)),
        None if rev is None
        else _p_u8(np.ascontiguousarray(rev, dtype=np.uint8)),
        _p_i64(out))
    return out


def query_walk_violation(t):
    """First record violating the tile/to_bed coverage-walk asserts, or
    -1; None without a toolchain (see paffy_io.cpp)."""
    lib = get_lib()
    if lib is None:
        return None
    return int(lib.query_walk_violation(
        len(t.qstart), _p_i64(np.ascontiguousarray(t.off, dtype=np.int64)),
        _p_u8(np.ascontiguousarray(t.ops, dtype=np.uint8)),
        _p_i64(np.ascontiguousarray(t.lens, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(t.qstart, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(t.qend, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(t.qlen, dtype=np.int64))))


def shatter_violation(t):
    """(kind, record) of the first record the reference shatter walk dies
    on — kind 'abort' or 'check' — or (None, -1); None without a
    toolchain (see paffy_io.cpp)."""
    lib = get_lib()
    if lib is None:
        return None
    kind = np.zeros(1, dtype=np.int64)
    r = int(lib.shatter_violation(
        len(t.qstart), _p_i64(np.ascontiguousarray(t.off, dtype=np.int64)),
        _p_u8(np.ascontiguousarray(t.ops, dtype=np.uint8)),
        _p_i64(np.ascontiguousarray(t.lens, dtype=np.int64)),
        _p_u8(np.ascontiguousarray(t.strand, dtype=np.uint8)),
        _p_i64(np.ascontiguousarray(t.qstart, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(t.qend, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(t.qlen, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(t.tstart, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(t.tend, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(t.tlen, dtype=np.int64)),
        _p_i64(kind)))
    if r < 0:
        return None, -1
    return ("abort" if kind[0] == 1 else "check"), r


def trim_tails_raw(t, score_fraction, max_fraction,
                   n_threads: int | None = None):
    """Unreliable-tail trim over a RAW-cigar table: the kept cigar is a
    contiguous byte subrange of the input cg text, so this returns
    (cg_a, cg_n, dq1, dt1, dq2, dt2) with no op arrays built — or None
    without a toolchain / non-raw table."""
    lib = get_lib()
    if lib is None or t.raw_cg is None:
        return None
    raw_buf, cg_start, cg_len = t.raw_cg
    n = len(cg_start)
    cg_a = np.empty(n, dtype=np.int64)
    cg_n = np.empty(n, dtype=np.int64)
    dq1 = np.empty(n, dtype=np.int64)
    dt1 = np.empty(n, dtype=np.int64)
    dq2 = np.empty(n, dtype=np.int64)
    dt2 = np.empty(n, dtype=np.int64)
    lib.trim_tails_raw(
        n, raw_buf,
        _p_i64(np.ascontiguousarray(cg_start, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(cg_len, dtype=np.int64)),
        _p_u8(np.ascontiguousarray(t.strand, dtype=np.uint8)),
        ctypes.c_float(score_fraction), ctypes.c_float(max_fraction),
        _p_i64(cg_a), _p_i64(cg_n), _p_i64(dq1), _p_i64(dt1),
        _p_i64(dq2), _p_i64(dt2), _default_threads(n_threads))
    return cg_a, cg_n, dq1, dt1, dq2, dt2


def trim_tails_apply(off, ops, lens, strand, score_fraction, max_fraction,
                     n_threads: int | None = None):
    """Both unreliable-tail trim passes (identity stats, decision AND apply)
    in one threaded native sweep.  Returns (keep_a, keep_b, dq1, dt1, dq2,
    dt2) — contiguous kept-op ranges per record plus each pass's dropped
    query/target base sums — or None without a toolchain."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(off) - 1
    keep_a = np.empty(n, dtype=np.int64)
    keep_b = np.empty(n, dtype=np.int64)
    dq1 = np.empty(n, dtype=np.int64)
    dt1 = np.empty(n, dtype=np.int64)
    dq2 = np.empty(n, dtype=np.int64)
    dt2 = np.empty(n, dtype=np.int64)
    lib.trim_tails_apply(
        n, _p_i64(np.ascontiguousarray(off, dtype=np.int64)),
        _p_u8(np.ascontiguousarray(ops, dtype=np.uint8)),
        _p_i64(np.ascontiguousarray(lens, dtype=np.int64)),
        _p_u8(np.ascontiguousarray(strand, dtype=np.uint8)),
        ctypes.c_float(score_fraction), ctypes.c_float(max_fraction),
        _p_i64(keep_a), _p_i64(keep_b), _p_i64(dq1), _p_i64(dt1),
        _p_i64(dq2), _p_i64(dt2), _default_threads(n_threads))
    return keep_a, keep_b, dq1, dt1, dq2, dt2


def copy_op_ranges(keep_a, keep_b, new_off, ops, lens,
                   n_threads: int | None = None):
    """Compact contiguous per-record op ranges into a fresh CSR (new_off
    pre-cumsummed from keep_b-keep_a); returns (new_ops, new_lens) or None
    without a toolchain."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(keep_a)
    total = int(new_off[-1]) if len(new_off) else 0
    new_ops = np.empty(total, dtype=np.uint8)
    new_lens = np.empty(total, dtype=np.int64)
    lib.copy_op_ranges(
        n, _p_i64(np.ascontiguousarray(keep_a, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(keep_b, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(new_off, dtype=np.int64)),
        _p_u8(np.ascontiguousarray(ops, dtype=np.uint8)),
        _p_i64(np.ascontiguousarray(lens, dtype=np.int64)),
        _p_u8(new_ops), _p_i64(new_lens), _default_threads(n_threads))
    return new_ops, new_lens


def shatter_walk(off, ops, lens, qstart, qend, tstart, strand, m_base, k,
                 n_threads: int | None = None):
    """Per-M-op shatter coordinates in one CSR pass; returns
    (rec, qs, ts, ln) of length k (the total M-op count) or None without a
    toolchain.  m_base is the per-record exclusive M-count prefix."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(off) - 1
    rec = np.empty(k, dtype=np.int64)
    qs = np.empty(k, dtype=np.int64)
    ts = np.empty(k, dtype=np.int64)
    ln = np.empty(k, dtype=np.int64)
    lib.shatter_walk(
        n, _p_i64(np.ascontiguousarray(off, dtype=np.int64)),
        _p_u8(np.ascontiguousarray(ops, dtype=np.uint8)),
        _p_i64(np.ascontiguousarray(lens, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(qstart, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(qend, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(tstart, dtype=np.int64)),
        _p_u8(np.ascontiguousarray(strand, dtype=np.uint8)),
        _p_i64(np.ascontiguousarray(m_base, dtype=np.int64)),
        _p_i64(rec), _p_i64(qs), _p_i64(ts), _p_i64(ln),
        _default_threads(n_threads))
    return rec, qs, ts, ln


def pack_ints13(cols, n_threads: int | None = None):
    """Interleave 13 equal-length int64 columns into a row-major [n,13]
    matrix (the serializer's layout), or None without a toolchain."""
    lib = get_lib()
    if lib is None:
        return None
    cols = [np.ascontiguousarray(c, dtype=np.int64) for c in cols]
    n = len(cols[0])
    out = np.empty((n, 13), dtype=np.int64)
    ptrs = (_I64P * 13)(*[c.ctypes.data_as(_I64P) for c in cols])
    lib.pack_ints13(n, ctypes.cast(ptrs, ctypes.POINTER(_I64P)),
                    _p_i64(out), _default_threads(n_threads))
    return out


def invert_ops(off, ops, lens, rev, n_threads: int | None = None):
    """Fused I<->D relabel + per-record conditional reverse (the cigar half
    of paf_invert); returns (new_ops, new_lens) or None without a
    toolchain."""
    lib = get_lib()
    if lib is None:
        return None
    n = len(off) - 1
    new_ops = np.empty(len(ops), dtype=np.uint8)
    new_lens = np.empty(len(ops), dtype=np.int64)
    lib.invert_ops(
        n, _p_i64(np.ascontiguousarray(off, dtype=np.int64)),
        _p_u8(np.ascontiguousarray(ops, dtype=np.uint8)),
        _p_i64(np.ascontiguousarray(lens, dtype=np.int64)),
        _p_u8(np.ascontiguousarray(rev, dtype=np.uint8)),
        _p_u8(new_ops), _p_i64(new_lens), _default_threads(n_threads))
    return new_ops, new_lens


def coverage_counts(diff: np.ndarray, saturation: int):
    """Running-sum + uint16 saturation of a coverage diff array in one pass
    (exact semantics of np.minimum(np.cumsum(diff), sat).astype(uint16)).
    int32 diffs take the 32-bit pass (half the memory traffic)."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty(len(diff), dtype=np.uint16)
    if diff.dtype == np.int32:
        lib.coverage_counts32(
            np.ascontiguousarray(diff).ctypes.data_as(
                ctypes.POINTER(ctypes.c_int)), len(diff),
            saturation, out.ctypes.data_as(_U16P))
    else:
        lib.coverage_counts(
            _p_i64(np.ascontiguousarray(diff, dtype=np.int64)), len(diff),
            saturation, out.ctypes.data_as(_U16P))
    return out


def fasta_headers(data: bytes):
    """Header-only FASTA read: [(name, trimmed_seq_byte_len)] in file
    order, no sequence pool built (see paffy_io.cpp fasta_fill_headers),
    or None without a toolchain."""
    lib = get_lib()
    if lib is None:
        return None
    n_rec = ctypes.c_longlong()
    seq_b = ctypes.c_longlong()
    name_b = ctypes.c_longlong()
    lib.fasta_scan(data, len(data), ctypes.byref(n_rec),
                   ctypes.byref(seq_b), ctypes.byref(name_b))
    n, nb = n_rec.value, name_b.value
    name_pool = np.empty(max(nb, 1), dtype=np.uint8)
    name_off = np.empty(max(n, 1), dtype=np.int64)
    seq_len = np.empty(max(n, 1), dtype=np.int64)
    lib.fasta_fill_headers(data, len(data),
                           name_pool.ctypes.data_as(ctypes.c_char_p),
                           _p_i64(name_off), _p_i64(seq_len))
    raw = name_pool.tobytes()
    records = []
    for i in range(n):
        ne = raw.index(b"\0", name_off[i])
        records.append((raw[name_off[i]: ne].decode("latin-1"),
                        int(seq_len[i])))
    return records


def fasta_pack_bytes(data: bytes):
    """Two-pass native FASTA pack: (pool: uint8 array, records:
    [(name, offset, length)] in file order), or None without a toolchain.
    read_fasta semantics (trimmed sequence-line spans, rstripped headers,
    pre-header content skipped)."""
    lib = get_lib()
    if lib is None:
        return None
    n_rec = ctypes.c_longlong()
    seq_b = ctypes.c_longlong()
    name_b = ctypes.c_longlong()
    lib.fasta_scan(data, len(data), ctypes.byref(n_rec),
                   ctypes.byref(seq_b), ctypes.byref(name_b))
    n, sb, nb = n_rec.value, seq_b.value, name_b.value
    name_pool = np.empty(max(nb, 1), dtype=np.uint8)
    name_off = np.empty(n, dtype=np.int64)
    seq_off = np.empty(n, dtype=np.int64)
    seq_len = np.empty(n, dtype=np.int64)
    pool = np.empty(sb, dtype=np.uint8)
    lib.fasta_fill(data, len(data),
                   name_pool.ctypes.data_as(ctypes.c_char_p),
                   _p_i64(name_off), _p_i64(seq_off), _p_i64(seq_len),
                   _p_u8(pool))
    raw = name_pool.tobytes()
    records = []
    for i in range(n):
        ne = raw.index(b"\0", name_off[i])
        records.append((raw[name_off[i]: ne].decode("latin-1"),
                        int(seq_off[i]), int(seq_len[i])))
    return pool, records


def encode_rebuild_offsets(ops, lens, runs_per_mop, total_out):
    """One-walk CSR rebuild offsets for the mismatch encoder; returns
    (out_off_per_op, m_out_off, new_ops, new_lens) with non-M ops already
    written through, or None without a toolchain."""
    lib = get_lib()
    if lib is None:
        return None
    n_ops = len(ops)
    out_off = np.empty(n_ops + 1, dtype=np.int64)
    m_out_off = np.empty(len(runs_per_mop), dtype=np.int64)
    new_ops = np.empty(total_out, dtype=np.uint8)
    new_lens = np.empty(total_out, dtype=np.int64)
    lib.encode_rebuild_offsets(
        n_ops, _p_u8(np.ascontiguousarray(ops, dtype=np.uint8)),
        _p_i64(np.ascontiguousarray(lens, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(runs_per_mop, dtype=np.int64)),
        _p_i64(out_off), _p_i64(m_out_off), _p_u8(new_ops),
        _p_i64(new_lens))
    return out_off, m_out_off, new_ops, new_lens


def coverage_add(diff: np.ndarray, starts, ends) -> bool:
    """d[start]++ / d[end]-- interval scatter (np.add.at replacement);
    returns False without a toolchain."""
    lib = get_lib()
    if lib is None or diff.dtype != np.int32:
        return False
    lib.coverage_add(
        diff.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        _p_i64(np.ascontiguousarray(starts, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(ends, dtype=np.int64)), len(starts))
    return True


def rle_u16(counts: np.ndarray, binary: bool):
    """(starts, ends, vals) maximal equal-count runs of a uint16 array
    (write_bed semantics; binary splits on the >0 indicator), or None
    without a toolchain."""
    lib = get_lib()
    if lib is None or counts.dtype != np.uint16:
        return None
    counts = np.ascontiguousarray(counts)
    n = len(counts)
    p = counts.ctypes.data_as(_U16P)
    k = int(lib.rle_u16_count(p, n, int(binary)))
    starts = np.empty(k, dtype=np.int64)
    ends = np.empty(k, dtype=np.int64)
    vals = np.empty(k, dtype=np.int64)
    if n:
        lib.rle_u16_fill(p, n, int(binary), _p_i64(starts), _p_i64(ends),
                         _p_i64(vals))
    return starts, ends, vals


def paf_check_batch(t):
    """(first_bad_record, code) validation sweep, or None without a
    toolchain.  Codes index core/pafio's error-message table.  Raw-cigar
    tables skip the cigar-span checks, exactly as the reference's
    paf_check does for unparsed cigars (cigar==NULL guard)."""
    lib = get_lib()
    if lib is None:
        return None
    has_cigar = t.has_cigar
    if t.raw_cg is not None:
        has_cigar = np.zeros(len(t.qstart), dtype=bool)
    code = np.zeros(1, dtype=np.int64)
    bad = lib.paf_check_batch(
        len(t.qstart), _p_i64(np.ascontiguousarray(t.off, dtype=np.int64)),
        _p_u8(np.ascontiguousarray(t.ops, dtype=np.uint8)),
        _p_i64(np.ascontiguousarray(t.lens, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(t.qstart, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(t.qend, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(t.qlen, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(t.tstart, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(t.tend, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(t.tlen, dtype=np.int64)),
        _p_u8(np.ascontiguousarray(has_cigar, dtype=np.uint8)),
        _p_i64(code))
    return int(bad), int(code[0])


def match_intervals(off, ops, lens, qstart):
    """(rec, start, end) aligned-run query intervals (host production path;
    exact ops/coverage.match_intervals semantics)."""
    lib = get_lib()
    if lib is None:
        return None
    n_ops = len(ops)
    rec = np.empty(n_ops, dtype=np.int64)
    start = np.empty(n_ops, dtype=np.int64)
    end = np.empty(n_ops, dtype=np.int64)
    n = lib.match_intervals(
        len(off) - 1, _p_i64(np.ascontiguousarray(off, dtype=np.int64)),
        _p_u8(np.ascontiguousarray(ops, dtype=np.uint8)),
        _p_i64(np.ascontiguousarray(lens, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(qstart, dtype=np.int64)),
        _p_i64(rec), _p_i64(start), _p_i64(end))
    return rec[:n], start[:n], end[:n]


def column_encode_runs(pool: np.ndarray, lens, qpos0, tpos0, rev,
                       n_threads: int | None = None):
    """Native =/X run extraction (two calls: threaded count, threaded fill).

    Returns (starts int64 [n_runs], match bool [n_runs]) in the compact
    tiled_runs format, or None when the native library is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    if n_threads is None:
        n_threads = min(os.cpu_count() or 1, 8)
    pool = np.ascontiguousarray(pool)
    lens = np.ascontiguousarray(lens, dtype=np.int64)
    qpos0 = np.ascontiguousarray(qpos0, dtype=np.int64)
    tpos0 = np.ascontiguousarray(tpos0, dtype=np.int64)
    rev = np.ascontiguousarray(rev, dtype=np.uint8)
    n_mops = len(lens)
    shard_counts = np.zeros(max(n_threads, 1), dtype=np.int64)
    n = int(lib.column_encode_runs(_p_u8(pool), n_mops, _p_i64(lens),
                                   _p_i64(qpos0), _p_i64(tpos0), _p_u8(rev),
                                   None, None, n_threads,
                                   _p_i64(shard_counts)))
    starts = np.empty(n, dtype=np.int64)
    vals = np.empty(n, dtype=np.uint8)
    n2 = int(lib.column_encode_runs(_p_u8(pool), n_mops, _p_i64(lens),
                                    _p_i64(qpos0), _p_i64(tpos0), _p_u8(rev),
                                    _p_i64(starts), _p_u8(vals), n_threads,
                                    _p_i64(shard_counts)))
    assert n2 == n
    return starts, vals.astype(bool)


def _default_threads(n_threads):
    return min(os.cpu_count() or 1, 8) if n_threads is None else n_threads


_STREAM_CHUNK = 32 << 20   # reused fill-buffer size for streamed egress


def _stream_two_phase(out_off, fh, fill_range, n):
    """Write a two-phase serialization to ``fh`` in reused ~32 MB slices:
    fill_range(r0, r1, rebased_out_off, buf) writes records [r0, r1) at
    offset 0 of ``buf``.  A single exact-size allocation page-faults in the
    whole output (hundreds of MB) before any byte reaches the file; the
    reused buffer keeps RSS flat and overlaps fill with write."""
    buf = np.empty(min(int(out_off[-1]), _STREAM_CHUNK) + 1, dtype=np.uint8)
    r0 = 0
    while r0 < n:
        r1 = int(np.searchsorted(out_off, out_off[r0] + _STREAM_CHUNK,
                                 side="right")) - 1
        r1 = max(r1, r0 + 1)
        size = int(out_off[r1] - out_off[r0])
        if size > len(buf):   # one record larger than the chunk
            buf = np.empty(size, dtype=np.uint8)
        rebased = np.ascontiguousarray(out_off[r0: r1 + 1] - out_off[r0])
        try:
            fill_range(r0, r1, rebased, buf)
        except ValueError as e:
            # record-level failure mid-fill: the fill threads complete
            # every record regardless, so the bytes before the bad record
            # are valid — emit them (the reference writes record-at-a-time
            # and aborts at the bad one), then propagate
            part = getattr(e, "partial_bytes", None)
            if part:
                fh.write(memoryview(buf.data)[:int(part)])
            raise
        fh.write(memoryview(buf.data)[:size])
        r0 = r1


def invert_serialize(t, n_threads: int | None = None, fh=None):
    """Fused paffy invert egress over a RAW-cigar table: emit each record
    with query/target swapped (paf_invert, impl/paf.c:463-490) and the
    cigar text transformed token-wise (I<->D swap; token order reversed for
    opposite-strand records) — no cigar parse, no op arrays.  Spans are
    checked during tokenization (the reference's post-invert paf_check);
    bounds checks are the caller's (vectorized paf_check on the raw table).

    Returns the serialized bytes (or True with ``fh``), or None without a
    toolchain / non-raw table.  Raises PafCheckError-compatible ValueError
    on span mismatch."""
    lib = get_lib()
    if lib is None or t.raw_cg is None:
        return None
    from paffy_tpu.core.pafio import _table_to_arrays
    raw_buf, cg_start, cg_len = t.raw_cg
    ints, flags = _table_to_arrays(t)
    # swap query/target columns: [qlen qs qe tlen ts te ...] -> t first
    ints = np.ascontiguousarray(
        ints[:, [3, 4, 5, 0, 1, 2, 6, 7, 8, 9, 10, 11, 12]])
    name_pool, qoff, toff = _name_pool(t.qname, t.tname)
    n = len(flags)
    rtype = np.ascontiguousarray(t.type)
    cg_start = np.ascontiguousarray(cg_start, dtype=np.int64)
    cg_len = np.ascontiguousarray(cg_len, dtype=np.int64)
    nt = _default_threads(n_threads)
    # sizes: prefix + verbatim-length cigar (the I<->D/reversal transform
    # preserves byte length) — reuse the raw-mode serializer size pass with
    # swapped names/ints
    out_off = np.empty(n + 1, dtype=np.int64)
    out_off[0] = 0
    lib.paf_serialize_sizes(n, _p_i64(ints), _p_u8(flags), _p_u8(rtype),
                            _p_i64(toff), _p_i64(qoff), name_pool,
                            None, None, None, None, _p_i64(cg_len),
                            _p_i64(out_off[1:]), nt)
    np.cumsum(out_off[1:], out=out_off[1:])

    def fill(r0, r1, oo, buf):
        rc = lib.invert_serialize_fill(
            r1 - r0, _p_i64(ints[r0:]), _p_u8(flags[r0:]),
            _p_u8(rtype[r0:]), _p_i64(toff[r0:]), _p_i64(qoff[r0:]),
            name_pool, raw_buf, _p_i64(cg_start[r0:]), _p_i64(cg_len[r0:]),
            _p_i64(oo), buf.ctypes.data_as(ctypes.c_char_p), nt)
        if rc == -2:
            raise RuntimeError("invert_serialize_fill drift/malformed")
        if rc >= 0:
            from paffy_tpu.core.pafio import PafCheckError
            e = PafCheckError(
                "Paf cigar alignment does not match query/target length "
                f"(record {r0 + rc})")
            e.partial_bytes = int(oo[rc])  # valid bytes before the record
            raise e
    if fh is not None:
        _stream_two_phase(out_off, fh, fill, n)
        return True
    out = np.empty(int(out_off[-1]), dtype=np.uint8)
    fill(0, n, out_off, out)
    return out


def shatter_serialize(t, n_threads: int | None = None, fh=None):
    """Fused paffy shatter egress: walk each record's cigar (paf_shatter,
    impl/paf.c:600-663) and serialize every M run's single-op output line
    in one threaded native pass pair — no intermediate shard table.
    Returns a uint8 ndarray of the serialized bytes, or None without a
    toolchain.  Caller must reject =/X-encoded cigars first (the reference
    asserts on them)."""
    lib = get_lib()
    if lib is None:
        return None
    from paffy_tpu.core.pafio import _table_to_arrays
    ints, flags = _table_to_arrays(t)
    name_pool, qoff, toff = _name_pool(t.qname, t.tname)
    n = len(flags)
    ints = np.ascontiguousarray(ints, dtype=np.int64)
    rtype = np.ascontiguousarray(t.type)
    ops = np.ascontiguousarray(t.ops, dtype=np.uint8)
    lens = np.ascontiguousarray(t.lens, dtype=np.int64)
    off = np.ascontiguousarray(t.off, dtype=np.int64)
    nt = _default_threads(n_threads)
    out_off = np.empty(n + 1, dtype=np.int64)
    out_off[0] = 0
    lib.shatter_serialize_sizes(n, _p_i64(ints), _p_u8(flags), _p_u8(rtype),
                                _p_i64(qoff), _p_i64(toff), name_pool,
                                _p_u8(ops), _p_i64(lens), _p_i64(off),
                                _p_i64(out_off[1:]), nt)
    np.cumsum(out_off[1:], out=out_off[1:])

    def fill(r0, r1, oo, buf):
        rc = lib.shatter_serialize_fill(
            r1 - r0, _p_i64(ints[r0:]), _p_u8(flags[r0:]),
            _p_u8(rtype[r0:]), _p_i64(qoff[r0:]), _p_i64(toff[r0:]),
            name_pool, _p_u8(ops), _p_i64(lens), _p_i64(off[r0:]),
            _p_i64(oo), buf.ctypes.data_as(ctypes.c_char_p), nt)
        if rc != 0:  # measured/written drift — never expected; fail loudly
            raise RuntimeError("shatter_serialize_fill length mismatch")
    if fh is not None:
        _stream_two_phase(out_off, fh, fill, n)
        return True
    out = np.empty(int(out_off[-1]), dtype=np.uint8)
    fill(0, n, out_off, out)
    return out


def encode_serialize(t, pool: np.ndarray, qpool_off, tpool_off,
                     n_threads: int | None = None, fh=None):
    """Fused add_mismatches egress: encode each record's M runs to =/X runs
    (paf_encode_mismatches, impl/paf.c:739-784) and serialize the output PAF
    line (tag rules impl/paf.c:317-389) in one threaded native pass pair —
    no intermediate =/X CSR arrays, no separate serializer passes.

    ``qpool_off``/``tpool_off`` are per-record guarded pool offsets of the
    record's query/target sequence start (SequencePool.offsets_for).
    Returns a uint8 ndarray of the serialized bytes, or None without a
    toolchain.
    """
    lib = get_lib()
    if lib is None:
        return None
    from paffy_tpu.core.pafio import _table_to_arrays
    ints, flags = _table_to_arrays(t)
    name_pool, qoff, toff = _name_pool(t.qname, t.tname)
    n = len(flags)
    ints = np.ascontiguousarray(ints, dtype=np.int64)
    rtype = np.ascontiguousarray(t.type)
    ops = np.ascontiguousarray(t.ops, dtype=np.uint8)
    lens = np.ascontiguousarray(t.lens, dtype=np.int64)
    off = np.ascontiguousarray(t.off, dtype=np.int64)
    pool = np.ascontiguousarray(pool)
    qpool_off = np.ascontiguousarray(qpool_off, dtype=np.int64)
    tpool_off = np.ascontiguousarray(tpool_off, dtype=np.int64)
    nt = _default_threads(n_threads)
    out_off = np.empty(n + 1, dtype=np.int64)
    out_off[0] = 0
    lib.encode_serialize_sizes(n, _p_i64(ints), _p_u8(flags), _p_u8(rtype),
                               _p_i64(qoff), _p_i64(toff), name_pool,
                               _p_u8(ops), _p_i64(lens), _p_i64(off),
                               _p_u8(pool), _p_i64(qpool_off),
                               _p_i64(tpool_off), _p_i64(out_off[1:]), nt)
    np.cumsum(out_off[1:], out=out_off[1:])

    def fill(r0, r1, oo, buf):
        rc = lib.encode_serialize_fill(
            r1 - r0, _p_i64(ints[r0:]), _p_u8(flags[r0:]),
            _p_u8(rtype[r0:]), _p_i64(qoff[r0:]), _p_i64(toff[r0:]),
            name_pool, _p_u8(ops), _p_i64(lens), _p_i64(off[r0:]),
            _p_u8(pool), _p_i64(qpool_off[r0:]), _p_i64(tpool_off[r0:]),
            _p_i64(oo), buf.ctypes.data_as(ctypes.c_char_p), nt)
        if rc != 0:  # measured/written drift — never expected; fail loudly
            raise RuntimeError("encode_serialize_fill length mismatch")
    if fh is not None:
        _stream_two_phase(out_off, fh, fill, n)
        return True
    out = np.empty(int(out_off[-1]), dtype=np.uint8)
    fill(0, n, out_off, out)
    return out


def encode_runs_per_mop(pool: np.ndarray, lens, qpos0, tpos0, rev,
                        n_threads: int | None = None):
    """Per-M-op =/X run counts (the CSR-rebuild count pass), or None when
    the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n_mops = len(lens)
    out = np.empty(n_mops, dtype=np.int64)
    lib.encode_runs_per_mop(
        _p_u8(np.ascontiguousarray(pool)), n_mops,
        _p_i64(np.ascontiguousarray(lens, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(qpos0, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(tpos0, dtype=np.int64)),
        _p_u8(np.ascontiguousarray(rev, dtype=np.uint8)),
        _p_i64(out), _default_threads(n_threads))
    return out


def encode_runs_fill_cigar(pool: np.ndarray, lens, qpos0, tpos0, rev,
                           dest_off: np.ndarray, new_ops: np.ndarray,
                           new_lens: np.ndarray,
                           n_threads: int | None = None) -> None:
    """Write each M op's =/X runs directly into (new_ops, new_lens) at
    dest_off[j] (the CSR-rebuild fill pass)."""
    lib = get_lib()
    assert lib is not None
    lib.encode_runs_fill_cigar(
        _p_u8(np.ascontiguousarray(pool)), len(lens),
        _p_i64(np.ascontiguousarray(lens, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(qpos0, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(tpos0, dtype=np.int64)),
        _p_u8(np.ascontiguousarray(rev, dtype=np.uint8)),
        _p_i64(np.ascontiguousarray(dest_off, dtype=np.int64)),
        _p_u8(new_ops), _p_i64(new_lens), _default_threads(n_threads))


def build_mop_batch(n_records: int, ops, lens, off, strand, qstart, qend,
                    tstart, qpool_off, tpool_off, n_mops: int,
                    outs: dict) -> int | None:
    """Fill the MColumnBatch arrays (see ops/segments.build_m_column_batch);
    ``outs`` holds preallocated mlens/recs/qpos0/tpos0/rev/col_off/
    rec_col_off/flat_idx.  Returns n_cols, or None when unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    return int(lib.build_mop_batch(
        n_records, _p_u8(np.ascontiguousarray(ops)),
        _p_i64(np.ascontiguousarray(lens, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(off, dtype=np.int64)),
        _p_u8(np.ascontiguousarray(strand, dtype=np.uint8)),
        _p_i64(np.ascontiguousarray(qstart, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(qend, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(tstart, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(qpool_off, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(tpool_off, dtype=np.int64)),
        _p_i64(outs["mlens"]), _p_i64(outs["recs"]), _p_i64(outs["qpos0"]),
        _p_i64(outs["tpos0"]), _p_u8(outs["rev"]), _p_i64(outs["col_off"]),
        _p_i64(outs["rec_col_off"]), _p_i64(outs["flat_idx"])))


def build_packed2_grid(lens, qpos0, tpos0, rev, recs, n_records: int,
                       pool_len: int, w2: int, outs: dict | None):
    """2-bit chunk-grid builder (see ops/tiled.build_packed2_chunk_batch).
    outs=None counts chunks; with outs (int32 trow/qwin/qpar/col_a/col_b/
    rec_chunk_off) fills them.  Returns the chunk count, or None when
    unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    def p(a, ct):
        return a.ctypes.data_as(ctypes.POINTER(ct))

    args = [len(lens),
            _p_i64(np.ascontiguousarray(lens, dtype=np.int64)),
            _p_i64(np.ascontiguousarray(qpos0, dtype=np.int64)),
            _p_i64(np.ascontiguousarray(tpos0, dtype=np.int64)),
            _p_u8(np.ascontiguousarray(rev, dtype=np.uint8)),
            _p_i64(np.ascontiguousarray(recs, dtype=np.int64)),
            n_records, pool_len, w2]
    if outs is None:
        args += [None] * 6
    else:
        args += [p(outs["trow"], ctypes.c_int), p(outs["qwin"], ctypes.c_int),
                 p(outs["qpar"], ctypes.c_byte),
                 p(outs["col_a"], ctypes.c_short),
                 p(outs["col_b"], ctypes.c_short),
                 p(outs["rec_chunk_off"], ctypes.c_int)]
    return int(lib.build_packed2_grid(*args))


def cigar_stats(n_records: int, ops, lens, off) -> np.ndarray | None:
    """Per-record stats [n,7] in one C pass (see paffy_io.cpp cigar_stats),
    or None when the native library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((n_records, 7), dtype=np.int64)
    lib.cigar_stats(n_records, _p_u8(np.ascontiguousarray(ops)),
                    _p_i64(np.ascontiguousarray(lens, dtype=np.int64)),
                    _p_i64(np.ascontiguousarray(off, dtype=np.int64)),
                    _p_i64(out))
    return out


def cigar_stats_raw(t) -> np.ndarray | None:
    """Per-record stats [n,7] tokenized straight from a raw-cigar table's
    cg text (same layout as cigar_stats), or None when the native library
    is unavailable or the table is not raw."""
    lib = get_lib()
    if lib is None or t.raw_cg is None:
        return None
    raw_buf, cg_start, cg_len = t.raw_cg
    n = len(cg_start)
    out = np.empty((n, 7), dtype=np.int64)
    lib.cigar_stats_raw(
        n, raw_buf, _p_i64(np.ascontiguousarray(cg_start, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(cg_len, dtype=np.int64)), _p_i64(out),
        _default_threads(None))
    return out


def synth_query_pool(pool: np.ndarray, lens, qpos0, tpos0, rev,
                     keep_per_mille: int = 965, seed: int = 7) -> bool:
    """In-place benchmark pool synthesis (see paffy_io.cpp)."""
    lib = get_lib()
    if lib is None:
        return False
    lib.synth_query_pool(
        _p_u8(pool), len(lens),
        _p_i64(np.ascontiguousarray(lens, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(qpos0, dtype=np.int64)),
        _p_i64(np.ascontiguousarray(tpos0, dtype=np.int64)),
        _p_u8(np.ascontiguousarray(rev, dtype=np.uint8)),
        ctypes.c_longlong(keep_per_mille),
        ctypes.c_ulonglong(seed))
    return True

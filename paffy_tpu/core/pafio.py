"""PAF text <-> PafTable conversion (host ingest/egress layer).

Behavioral contract is the reference parser/serializer:
  * parse:      impl/paf.c:137-209 (tab tokenize, strand validation, tag
                dispatch on the 2-char code, unknown tags silently dropped)
  * cigar parse: impl/paf.c:70-111 (M/I/D/=/X only, abort on anything else)
  * serialize:  impl/paf.c:317-389 — field order, conditional tag emission:
                - tp emitted iff type set or tile_level != -1; when type is
                  unset it is synthesized as 'S' if tile_level > 1 else 'P'
                  (impl/paf.c:343-348)
                - AS omitted iff score == INT_MAX (impl/paf.c:349)
                - tl/cn/s1 emitted iff != -1
                - cg last
Byte-identical output against the reference serializer is the correctness
gate (tests/paf_test.c round-trip).

A C++ fast path (paffy_tpu.native) is used when available; this module holds
the portable implementation and the dispatch.
"""

from __future__ import annotations

import re
import numpy as np

from .model import (PafTable, CHAR_TO_OP, OP_TO_CHAR, INT_MAX, _as_obj_array)

_CIGAR_RE = re.compile(r"(\d+)([MIDX=])")


class PafFormatError(ValueError):
    """Malformed PAF input.  ``line_no`` (when known) is the 1-based line
    number within the data passed to the failing parse call, letting
    streaming callers emit the records before it (the reference parses and
    writes record-at-a-time, so everything before the bad line reaches the
    output before it aborts)."""

    def __init__(self, msg, line_no=None):
        super().__init__(msg)
        self.line_no = line_no


def parse_cigar_string(s: str) -> list[tuple[int, int]]:
    """Parse a cigar string to [(op, length)].  Empty string -> [] (treated as
    absent cigar, mirroring cigar_parse returning NULL, impl/paf.c:71-73)."""
    if not s:
        return []
    out = []
    pos = 0
    for m in _CIGAR_RE.finditer(s):
        if m.start() != pos:
            raise PafFormatError(f"Got an unexpected character in paf cigar string: {s[pos]!r}")
        out.append((CHAR_TO_OP[m.group(2)], int(m.group(1))))
        pos = m.end()
    if pos != len(s):
        raise PafFormatError(f"Got an unexpected character in paf cigar string: {s[pos]!r}")
    return out


def parse_paf_text(text: str) -> PafTable:
    """Parse PAF text (one record per line) into a PafTable."""
    try:
        data = text.encode("latin-1")
    except UnicodeEncodeError:
        return _parse_python(text)
    return parse_paf_data(data)


def parse_paf_data(data: bytes, parse_cigars: bool = True,
                   validate_cigars: bool = False) -> PafTable:
    """Parse PAF bytes (one record per line) into a PafTable.

    The bytes-first entry point — the CLI plumbing reads files in binary
    mode so no codec pass ever touches the data.  Dispatches to the native
    C++ tokenizer (paffy_tpu.native) when available, falling back to the
    portable Python implementation below.

    ``parse_cigars=False`` is the reference's parse_cigar_string=0 mode
    (read_pafs at impl/paf_chain.c:128, impl/paf_tile.c:156): the cg tag is
    kept as an unparsed byte range (PafTable.raw_cg) and re-emitted
    verbatim — for commands that reorder/tag records without reading per-op
    data.  Without the native toolchain the flag is ignored and cigars are
    parsed (results identical for well-formed input; raw mode additionally
    passes non-canonical cigars through untouched, as the reference does).

    ``validate_cigars`` (raw mode only) is for commands whose REFERENCE
    counterpart fully parses cigars it never reads (dedupe, split_file):
    cigar text is checked against the parser's acceptance rule, and inputs
    whose re-emission the full parser would canonicalize (leading-zero
    lengths) automatically fall back to the full parse — raw speed on the
    overwhelmingly common canonical input, byte-exact behavior on all.
    """
    if not parse_cigars:
        table = _parse_native_raw(data, validate_cigars)
        if table is not None:
            return table
    table = _parse_native(data)
    if table is not None:
        return table
    return _parse_python(data.decode("latin-1"))


def _parse_native_raw(data: bytes,
                      validate_cigars: bool = False) -> PafTable | None:
    try:
        from paffy_tpu import native
    except ImportError:
        return None
    try:
        res = native.parse_paf_bytes_raw(data, validate_cigars)
    except native.NativeParseError as e:
        raise PafFormatError(str(e), getattr(e, "line_no", None)) from e
    if res is None or res == "noncanon":
        return None
    ints, flags, rtype, qnames, tnames, cg_start, cg_len = res
    n = len(flags)
    return PafTable(
        qname=qnames, qlen=ints[:, 0].copy(), qstart=ints[:, 1].copy(),
        qend=ints[:, 2].copy(), strand=(flags & 1).astype(bool),
        tname=tnames, tlen=ints[:, 3].copy(), tstart=ints[:, 4].copy(),
        tend=ints[:, 5].copy(), num_matches=ints[:, 6].copy(),
        num_bases=ints[:, 7].copy(), mapq=ints[:, 8].copy(),
        score=ints[:, 9].copy(), tile_level=ints[:, 10].copy(),
        chain_id=ints[:, 11].copy(), chain_score=ints[:, 12].copy(),
        type=rtype, has_cigar=(flags & 2).astype(bool),
        ops=np.zeros(0, dtype=np.uint8), lens=np.zeros(0, dtype=np.int64),
        off=np.zeros(n + 1, dtype=np.int64),
        raw_cg=(data, cg_start, cg_len))


def _parse_native(data: bytes) -> PafTable | None:
    try:
        from paffy_tpu import native
    except ImportError:
        return None
    try:
        res = native.parse_paf_bytes(data)
    except native.NativeParseError as e:
        raise PafFormatError(str(e), getattr(e, "line_no", None)) from e
    if res is None:
        return None
    ints, flags, rtype, qnames, tnames, ops, lens, off = res
    return PafTable(
        qname=qnames, qlen=ints[:, 0].copy(), qstart=ints[:, 1].copy(),
        qend=ints[:, 2].copy(), strand=(flags & 1).astype(bool),
        tname=tnames, tlen=ints[:, 3].copy(), tstart=ints[:, 4].copy(),
        tend=ints[:, 5].copy(), num_matches=ints[:, 6].copy(),
        num_bases=ints[:, 7].copy(), mapq=ints[:, 8].copy(),
        score=ints[:, 9].copy(), tile_level=ints[:, 10].copy(),
        chain_id=ints[:, 11].copy(), chain_score=ints[:, 12].copy(),
        type=rtype, has_cigar=(flags & 2).astype(bool),
        ops=ops, lens=lens, off=off)


def _table_to_arrays(t: PafTable):
    n = len(t)
    cols = (t.qlen, t.qstart, t.qend, t.tlen, t.tstart, t.tend,
            t.num_matches, t.num_bases, t.mapq, t.score, t.tile_level,
            t.chain_id, t.chain_score)
    try:
        from paffy_tpu import native
        ints = native.pack_ints13(cols) if n else None
    except ImportError:
        ints = None
    if ints is None:
        ints = np.empty((n, 13), dtype=np.int64)
        for j, c in enumerate(cols):
            ints[:, j] = c
    flags = (t.strand.astype(np.uint8) | (t.has_cigar.astype(np.uint8) << 1))
    return ints, flags


def _parse_python(text: str) -> PafTable:
    lines = text.splitlines()
    n = len(lines)
    qname = np.empty(n, dtype=object)
    tname = np.empty(n, dtype=object)
    ints = np.zeros((9, n), dtype=np.int64)   # qlen qs qe tlen ts te nm nb mq
    strand = np.zeros(n, dtype=bool)
    score = np.zeros(n, dtype=np.int64)
    tile_level = np.full(n, -1, dtype=np.int64)
    chain_id = np.full(n, -1, dtype=np.int64)
    chain_score = np.full(n, -1, dtype=np.int64)
    rtype = np.zeros(n, dtype=np.uint8)
    has_cigar = np.zeros(n, dtype=bool)
    ops_all: list[int] = []
    lens_all: list[int] = []
    off = np.zeros(n + 1, dtype=np.int64)

    i = 0
    for ln_no, ln in enumerate(lines, 1):
        # strtok field semantics: consecutive tabs collapse; a blank line
        # is a structural reject (the reference segfaults on it)
        f = [x for x in ln.split("\t") if x]
        if len(f) < 12:
            raise PafFormatError(
                f"paf line has {len(f)} fields, expected >= 12: {ln[:80]!r}",
                ln_no)
        qname[i] = f[0]
        tname[i] = f[5]
        st = f[4]
        if st not in ("+", "-"):
            raise PafFormatError(f"Got an unexpected strand character ({st}) in a paf string")
        strand[i] = st == "+"
        ints[0, i] = int(f[1]); ints[1, i] = int(f[2]); ints[2, i] = int(f[3])
        ints[3, i] = int(f[6]); ints[4, i] = int(f[7]); ints[5, i] = int(f[8])
        ints[6, i] = int(f[9]); ints[7, i] = int(f[10]); ints[8, i] = int(f[11])
        for tag in f[12:]:
            # format XX:T:value; malformed tags skipped (impl/paf.c:182-184)
            if len(tag) < 5 or tag[2] != ":" or tag[4] != ":":
                continue
            code = tag[:2]
            value = tag[5:]
            if code == "tp":
                if value[:1] not in ("P", "S", "I"):
                    raise PafFormatError(f"bad tp tag value: {value!r}")
                rtype[i] = ord(value[0])
            elif code == "AS":
                score[i] = int(value)
            elif code == "cg":
                cg = parse_cigar_string(value)
                if cg:
                    has_cigar[i] = True
                    for op, l in cg:
                        ops_all.append(op)
                        lens_all.append(l)
            elif code == "tl":
                tile_level[i] = int(value)
            elif code == "cn":
                chain_id[i] = int(value)
            elif code == "s1":
                chain_score[i] = int(value)
        off[i + 1] = len(ops_all)
        i += 1

    return PafTable(
        qname=qname, qlen=ints[0], qstart=ints[1], qend=ints[2], strand=strand,
        tname=tname, tlen=ints[3], tstart=ints[4], tend=ints[5],
        num_matches=ints[6], num_bases=ints[7], mapq=ints[8], score=score,
        tile_level=tile_level, chain_id=chain_id, chain_score=chain_score,
        type=rtype, has_cigar=has_cigar,
        ops=np.array(ops_all, dtype=np.uint8),
        lens=np.array(lens_all, dtype=np.int64), off=off)


def cigar_to_string(ops: np.ndarray, lens: np.ndarray) -> str:
    if len(ops) == 0:
        return ""
    return "".join(f"{int(l)}{OP_TO_CHAR[int(o)]}" for o, l in zip(ops, lens))


def format_record(t: PafTable, i: int) -> str:
    """Serialize one record (no trailing newline) — paf_print equivalent."""
    parts = [
        str(t.qname[i]), str(t.qlen[i]), str(t.qstart[i]), str(t.qend[i]),
        "+" if t.strand[i] else "-",
        str(t.tname[i]), str(t.tlen[i]), str(t.tstart[i]), str(t.tend[i]),
        str(t.num_matches[i]), str(t.num_bases[i]), str(t.mapq[i]),
    ]
    line = "\t".join(parts)
    ty = int(t.type[i])
    tl = int(t.tile_level[i])
    if ty != 0 or tl != -1:
        c = chr(ty) if ty != 0 else ("S" if tl > 1 else "P")
        line += "\ttp:A:" + c
    if int(t.score[i]) != INT_MAX:
        line += f"\tAS:i:{int(t.score[i])}"
    if tl != -1:
        line += f"\ttl:i:{tl}"
    if int(t.chain_id[i]) != -1:
        line += f"\tcn:i:{int(t.chain_id[i])}"
    if int(t.chain_score[i]) != -1:
        line += f"\ts1:i:{int(t.chain_score[i])}"
    if t.has_cigar[i]:
        if t.raw_cg is not None:
            buf, cs, cl = t.raw_cg
            line += "\tcg:Z:" + bytes(
                buf[int(cs[i]): int(cs[i]) + int(cl[i])]).decode("latin-1")
        else:
            s, e = t.off[i], t.off[i + 1]
            line += "\tcg:Z:" + cigar_to_string(t.ops[s:e], t.lens[s:e])
    return line


def serialize_paf(t: PafTable) -> str:
    """Serialize a whole table, one line per record, trailing newline per
    line.  Uses the native serializer when available."""
    return bytes(serialize_paf_bytes(t)).decode("latin-1")


def serialize_paf_bytes(t: PafTable, order=None):
    """Bytes-first serializer — the CLI plumbing writes binary so no codec
    pass touches the output.  Returns a bytes-like object (a zero-copy
    memoryview over the native serializer's exact-size buffer when the
    toolchain is available, else bytes).  ``order`` (optional int64
    permutation) emits record order[r] at line r without materializing a
    reordered table (the reference reorders stList pointers; copying the
    CSR cigar store to reorder output costs two full-array passes)."""
    try:
        from paffy_tpu import native
    except ImportError:
        native = None
    if native is not None and len(t):
        ints, flags = _table_to_arrays(t)
        out = native.serialize_paf_arrays(ints, flags, t.type, t.qname,
                                          t.tname, t.ops, t.lens, t.off,
                                          order=order, raw_cig=t.raw_cg)
        if out is not None:
            return out.data
    idx = order if order is not None else range(len(t))
    return "".join(format_record(t, int(i)) + "\n"
                   for i in idx).encode("latin-1")


def read_paf_file(path_or_file) -> PafTable:
    if hasattr(path_or_file, "read"):
        return parse_paf_text(path_or_file.read())
    with open(path_or_file, "r") as fh:
        return parse_paf_text(fh.read())


def write_paf_file(t: PafTable, path_or_file) -> None:
    data = serialize_paf(t)
    if hasattr(path_or_file, "write"):
        path_or_file.write(data)
    else:
        with open(path_or_file, "w") as fh:
            fh.write(data)


class PafCheckError(ValueError):
    """A record failed paf_check.  ``table``/``record_index`` identify the
    first bad record within the checked table, letting streaming callers
    emit the records before it — the reference checks and writes
    record-at-a-time, so everything before the bad record reaches the
    output before it aborts (e.g. impl/paf_trim.c:116-126)."""

    def __init__(self, msg, table=None, record_index=None):
        super().__init__(msg)
        self.table = table
        self.record_index = record_index


def paf_check(t: PafTable, idx=None, check_raw_spans: bool = False) -> None:
    """Validate coordinates and cigar spans; raises on the first bad record.

    Mirrors paf_check (impl/paf.c:427-461): starts in-bounds, start <= end,
    end <= length, and (when a cigar is present) the cigar's query/target
    consumption equals end-start on each axis.

    Raw-cigar tables normally skip the span checks (the reference's
    cigar==NULL guard — its parse_cigar=0 callers never see spans).
    ``check_raw_spans=True`` restores them by tokenizing span sums from the
    raw cg text — for raw-streaming commands whose REFERENCE parses cigars
    and so does span-check them (e.g. dechunk, impl/paf_dechunk.c:114-116).
    """
    n = len(t)
    if n == 0:
        return
    def raw_span_first_bad():
        """(record, code) of the first raw-cigar span mismatch, or (-1, -1).
        The q-axis check precedes the t-axis check per record, as in the
        reference (impl/paf.c:448-458)."""
        if not (check_raw_spans and t.raw_cg is not None and idx is None):
            return -1, -1
        from paffy_tpu import native
        st = native.cigar_stats_raw(t)
        if st is None:
            return -1, -1
        aligned = st[:, 0] + st[:, 1]          # M/= + X
        qbad = t.has_cigar & ((aligned + st[:, 4]) != (t.qend - t.qstart))
        tbad = t.has_cigar & ((aligned + st[:, 5]) != (t.tend - t.tstart))
        either = np.nonzero(qbad | tbad)[0]
        if len(either) == 0:
            return -1, -1
        i = int(either[0])
        return i, (4 if qbad[i] else 5)

    if idx is None:
        # production path: one native pass (same checks, same first-record
        # error text; the vectorized form below is the fallback)
        from paffy_tpu import native
        res = native.paf_check_batch(t)
        if res is not None:
            bad, code = res
            sbad, scode = raw_span_first_bad()
            # first bad RECORD wins; at the same record coordinate checks
            # precede span checks (the reference checks per record in order)
            if sbad >= 0 and (bad < 0 or sbad < bad):
                bad, code = sbad, scode
            if bad >= 0:
                msgs = ("Paf query start coordinates are invalid",
                        "Paf query end coordinates are invalid",
                        "Paf target start coordinates are invalid",
                        "Paf target end coordinates are invalid",
                        "Paf cigar alignment does not match query length",
                        "Paf cigar alignment does not match target length")
                raise PafCheckError(f"{msgs[code]}, {format_record(t, bad)}",
                                    table=t, record_index=bad)
            return
    sel = np.arange(n) if idx is None else np.asarray(idx)
    # All six class masks are evaluated over sel FIRST, then we raise for
    # the first bad RECORD in sel order; class order only picks the message
    # within that record.  The reference checks record-at-a-time
    # (impl/paf.c:427-461), so an earlier record's later-class failure
    # beats a later record's earlier-class failure — a class-ordered sweep
    # would emit records the reference never outputs.
    msgs = ("Paf query start coordinates are invalid",
            "Paf query end coordinates are invalid",
            "Paf target start coordinates are invalid",
            "Paf target end coordinates are invalid",
            "Paf cigar alignment does not match query length",
            "Paf cigar alignment does not match target length")
    masks = [
        (t.qstart[sel] < 0) | (t.qstart[sel] >= t.qlen[sel]),
        (t.qstart[sel] > t.qend[sel]) | (t.qend[sel] > t.qlen[sel]),
        (t.tstart[sel] < 0) | (t.tstart[sel] >= t.tlen[sel]),
        (t.tstart[sel] > t.tend[sel]) | (t.tend[sel] > t.tlen[sel]),
    ]
    # cigar span check via segment sums over the CSR store (skipped for
    # raw-cigar tables, matching the reference's cigar==NULL guard)
    if len(t.ops) and t.raw_cg is None:
        from .segsum import segment_sums_by_offsets
        q_consume = np.where(t.ops != 2, t.lens, 0)  # all but query_delete
        t_consume = np.where(t.ops != 1, t.lens, 0)  # all but query_insert
        qs = segment_sums_by_offsets(q_consume, t.off)
        ts = segment_sums_by_offsets(t_consume, t.off)
        masks.append(t.has_cigar[sel] & (qs[sel] != (t.qend[sel] - t.qstart[sel])))
        masks.append(t.has_cigar[sel] & (ts[sel] != (t.tend[sel] - t.tstart[sel])))
    any_bad = np.zeros(len(sel), dtype=bool)
    for m in masks:
        any_bad |= m
    hit = np.nonzero(any_bad)[0]
    j = int(hit[0]) if len(hit) else -1
    bad = int(sel[j]) if j >= 0 else -1
    code = next((k for k, m in enumerate(masks) if m[j]), 0) if j >= 0 else -1
    sbad, scode = raw_span_first_bad()
    # first bad record wins; at the same record coordinate/CSR-span checks
    # precede raw-span checks (per-record check order in the reference)
    if sbad >= 0 and (bad < 0 or sbad < bad):
        bad, code = sbad, scode
    if bad >= 0:
        raise PafCheckError(f"{msgs[code]}, {format_record(t, bad)}",
                            table=t, record_index=bad)

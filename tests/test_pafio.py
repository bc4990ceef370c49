"""Host parse/serialize tests — port of the reference unit suites for cigar
parsing, PAF parsing, round-tripping and file I/O
(tests/paf_unit_test.c sections 1-5) plus the 207-record golden round-trip
gate (tests/paf_test.c:11-47)."""

import numpy as np
import pytest

from paffy_tpu.core.model import (PafTable, MATCH, QUERY_INSERT, QUERY_DELETE,
                                  SEQ_MATCH, SEQ_MISMATCH)
from paffy_tpu.core import pafio
from paffy_tpu.core.pafio import (parse_paf_text, parse_cigar_string,
                                  serialize_paf, format_record, paf_check,
                                  PafFormatError, PafCheckError)


def parse_one(line: str) -> PafTable:
    return parse_paf_text(line + "\n")


# ---- 1. cigar parsing ----

def test_cigar_parse_empty():
    assert parse_cigar_string("") == []


def test_cigar_parse_single():
    assert parse_cigar_string("10M") == [(MATCH, 10)]


def test_cigar_parse_all_ops():
    assert parse_cigar_string("5M3I2D4=1X") == [
        (MATCH, 5), (QUERY_INSERT, 3), (QUERY_DELETE, 2),
        (SEQ_MATCH, 4), (SEQ_MISMATCH, 1)]


def test_cigar_parse_large_length():
    assert parse_cigar_string("1000000M") == [(MATCH, 1000000)]


def test_cigar_parse_bad_char():
    with pytest.raises(PafFormatError):
        parse_cigar_string("5M3Q")


# ---- 3. PAF parsing ----

def test_paf_parse_minimal():
    t = parse_one("query1\t100\t0\t50\t+\ttarget1\t200\t10\t60\t50\t50\t255")
    assert t.qname[0] == "query1" and t.tname[0] == "target1"
    assert t.qlen[0] == 100 and t.qstart[0] == 0 and t.qend[0] == 50
    assert t.tlen[0] == 200 and t.tstart[0] == 10 and t.tend[0] == 60
    assert t.num_matches[0] == 50 and t.num_bases[0] == 50 and t.mapq[0] == 255
    assert bool(t.strand[0]) is True
    assert not t.has_cigar[0]
    # unset tag defaults (impl/paf.c:138,175-177)
    assert t.score[0] == 0
    assert t.tile_level[0] == -1 and t.chain_id[0] == -1 and t.chain_score[0] == -1
    assert t.type[0] == 0


def test_paf_parse_with_cigar():
    t = parse_one("q1\t100\t0\t8\t+\tt1\t200\t0\t7\t8\t10\t60\tcg:Z:5M3I2D")
    assert t.has_cigar[0]
    ops, lens = t.record_ops(0)
    assert list(ops) == [MATCH, QUERY_INSERT, QUERY_DELETE]
    assert list(lens) == [5, 3, 2]


def test_paf_parse_optional_tags():
    t = parse_one("q1\t100\t0\t50\t+\tt1\t200\t0\t50\t50\t50\t60\t"
                  "tp:A:P\tAS:i:42\ttl:i:2\tcn:i:5\ts1:i:100")
    assert chr(t.type[0]) == "P"
    assert t.score[0] == 42 and t.tile_level[0] == 2
    assert t.chain_id[0] == 5 and t.chain_score[0] == 100


def test_paf_parse_unknown_tags_dropped():
    t = parse_one("q1\t100\t0\t50\t+\tt1\t200\t0\t50\t50\t50\t60\t"
                  "NM:i:7\tms:i:88\tzz\tbadtag")
    # silently dropped / skipped (impl/paf.c:181-206)
    assert t.score[0] == 0


def test_paf_parse_strand():
    assert bool(parse_one("q\t1\t0\t1\t+\tt\t1\t0\t1\t1\t1\t0").strand[0]) is True
    assert bool(parse_one("q\t1\t0\t1\t-\tt\t1\t0\t1\t1\t1\t0").strand[0]) is False
    with pytest.raises(PafFormatError):
        parse_one("q\t1\t0\t1\t*\tt\t1\t0\t1\t1\t1\t0")


# ---- 4/5. round-trips ----

def test_roundtrip_no_cigar():
    t1 = parse_one("query1\t100\t0\t50\t+\ttarget1\t200\t10\t60\t50\t50\t255")
    s1 = format_record(t1, 0)
    t2 = parse_one(s1)
    assert format_record(t2, 0) == s1
    # score defaults to 0 which is != INT_MAX, so AS:i:0 is emitted
    assert "AS:i:0" in s1


def test_roundtrip_with_cigar():
    t1 = parse_one("q1\t100\t0\t8\t+\tt1\t200\t0\t7\t8\t10\t60\tcg:Z:5M3I2D")
    s1 = format_record(t1, 0)
    assert s1.endswith("cg:Z:5M3I2D")
    t2 = parse_one(s1)
    assert format_record(t2, 0) == s1


def test_tag_emission_order_and_tp_synthesis():
    # tl set but no tp: tp is synthesized as S iff tile_level > 1 else P
    # (impl/paf.c:343-348); emission order tp,AS,tl,cn,s1,cg (impl/paf.c:343-385)
    t = parse_one("q\t10\t0\t5\t+\tt\t10\t0\t5\t5\t5\t0\ttl:i:1\tcg:Z:5M")
    assert format_record(t, 0) == \
        "q\t10\t0\t5\t+\tt\t10\t0\t5\t5\t5\t0\ttp:A:P\tAS:i:0\ttl:i:1\tcg:Z:5M"
    t = parse_one("q\t10\t0\t5\t+\tt\t10\t0\t5\t5\t5\t0\ttl:i:3")
    assert "\ttp:A:S\t" in format_record(t, 0)


def test_multi_record_file_io(tmp_path):
    text = ("q1\t100\t0\t50\t+\tt1\t200\t0\t50\t50\t50\t60\n"
            "q2\t200\t10\t60\t-\tt2\t300\t20\t70\t50\t50\t30\n"
            "q3\t150\t5\t55\t+\tt3\t250\t15\t65\t50\t50\t40\n")
    p = tmp_path / "x.paf"
    p.write_text(text)
    t = pafio.read_paf_file(p)
    assert len(t) == 3
    assert t.qname[1] == "q2" and not t.strand[1]
    out = tmp_path / "y.paf"
    pafio.write_paf_file(t, out)
    t2 = pafio.read_paf_file(out)
    assert serialize_paf(t) == serialize_paf(t2)


# ---- paf_check ----

def test_paf_check_valid():
    t = parse_paf_text(
        "q\t100\t0\t50\t+\tt\t200\t10\t60\t50\t50\t60\n"
        "q\t100\t0\t50\t-\tt\t200\t10\t60\t50\t50\t60\n"
        "q\t100\t0\t5\t+\tt\t100\t0\t5\t5\t5\t60\tcg:Z:5=\n"
        "q\t100\t0\t6\t+\tt\t100\t0\t7\t5\t8\t60\tcg:Z:3=2X1I2D\n")
    paf_check(t)  # must not raise


def test_paf_check_bad_coords():
    with pytest.raises(PafCheckError):
        paf_check(parse_one("q\t100\t100\t100\t+\tt\t200\t0\t50\t0\t0\t60"))
    with pytest.raises(PafCheckError):
        paf_check(parse_one("q\t100\t0\t101\t+\tt\t200\t0\t50\t0\t0\t60"))


def test_paf_check_bad_cigar_span():
    with pytest.raises(PafCheckError):
        paf_check(parse_one("q\t100\t0\t6\t+\tt\t100\t0\t6\t5\t8\t60\tcg:Z:5M"))


# ---- golden data ----

def test_golden_roundtrip(golden_paf_path):
    t = pafio.read_paf_file(golden_paf_path)
    assert len(t) == 207  # tests/paf_test.c:19
    paf_check(t)
    out = serialize_paf(t)
    t2 = parse_paf_text(out)
    assert serialize_paf(t2) == out  # print-stability (tests/paf_test.c:40-46)
    # workload shape recorded in SURVEY.md section 4
    assert int(t.off[-1]) == 369583
    assert int(t.strand.sum()) == 158

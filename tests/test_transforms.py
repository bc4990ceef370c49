"""Host transform tests — port of the reference unit suites for stats,
invert, aligned-base counts, trimming and shatter
(tests/paf_unit_test.c sections 6-11)."""

import numpy as np
import pytest

from paffy_tpu.core.model import (MATCH, QUERY_INSERT, QUERY_DELETE,
                                  SEQ_MATCH, SEQ_MISMATCH)
from paffy_tpu.core.pafio import parse_paf_text, format_record, paf_check
from paffy_tpu.ops import transforms as tr


def parse_one(line):
    return parse_paf_text(line + "\n")


# ---- 6. stats ----

def test_stats_all_match():
    t = parse_one("q\t100\t0\t10\t+\tt\t100\t0\t10\t10\t10\t60\tcg:Z:10M")
    s = tr.stats_calc(t)
    assert s["matches"][0] == 10
    assert s["mismatches"][0] == 0
    assert s["query_inserts"][0] == 0 and s["query_deletes"][0] == 0


def test_stats_mixed():
    t = parse_one("q\t100\t0\t6\t+\tt\t100\t0\t7\t5\t8\t60\tcg:Z:3=2X1I2D")
    s = tr.stats_calc(t)
    assert s["matches"][0] == 3 and s["mismatches"][0] == 2
    assert s["query_inserts"][0] == 1 and s["query_insert_bases"][0] == 1
    assert s["query_deletes"][0] == 1 and s["query_delete_bases"][0] == 2


# ---- 7. invert ----

def test_invert_same_strand():
    t = parse_one("query\t100\t10\t18\t+\ttarget\t200\t20\t27\t8\t10\t60\tcg:Z:5M3I2D")
    t2 = tr.invert(t)
    assert t2.qname[0] == "target" and t2.tname[0] == "query"
    assert t2.qstart[0] == 20 and t2.qend[0] == 27 and t2.qlen[0] == 200
    assert t2.tstart[0] == 10 and t2.tend[0] == 18 and t2.tlen[0] == 100
    assert bool(t2.strand[0]) is True
    ops, lens = t2.record_ops(0)
    assert list(ops) == [MATCH, QUERY_DELETE, QUERY_INSERT]
    assert list(lens) == [5, 3, 2]


def test_invert_opposite_strand():
    t = parse_one("query\t100\t10\t18\t-\ttarget\t200\t20\t25\t5\t8\t60\tcg:Z:5M3I")
    t2 = tr.invert(t)
    assert bool(t2.strand[0]) is False
    ops, lens = t2.record_ops(0)
    # I->D then reversed: 5M3D -> 3D5M
    assert list(ops) == [QUERY_DELETE, MATCH]
    assert list(lens) == [3, 5]


def test_invert_double_identity():
    t = parse_one("query\t100\t10\t18\t+\ttarget\t200\t20\t27\t8\t10\t60\tcg:Z:5M3I2D")
    orig = format_record(t, 0)
    t2 = tr.invert(tr.invert(t))
    assert format_record(t2, 0) == orig


# ---- 8. aligned bases ----

def test_aligned_bases():
    t = parse_one("q\t100\t0\t13\t+\tt\t100\t0\t12\t10\t15\t60\tcg:Z:5M3I2D4=1X")
    assert tr.aligned_base_counts(t)[0] == 10


# ---- 9. trimming ----

def test_trim_ends_zero():
    t = parse_one("q\t100\t5\t15\t+\tt\t100\t5\t15\t10\t10\t60\tcg:Z:10M")
    t2 = tr.trim_ends(t, 0)
    assert t2.qstart[0] == 5 and t2.qend[0] == 15
    assert t2.tstart[0] == 5 and t2.tend[0] == 15
    ops, lens = t2.record_ops(0)
    assert list(lens) == [10]


def test_trim_ends_same_strand():
    t = parse_one("q\t100\t0\t10\t+\tt\t100\t0\t10\t10\t10\t60\tcg:Z:10M")
    t2 = tr.trim_ends(t, 2)
    assert t2.qstart[0] == 2 and t2.qend[0] == 8
    assert t2.tstart[0] == 2 and t2.tend[0] == 8
    ops, lens = t2.record_ops(0)
    assert list(lens) == [6]
    paf_check(t2)


def test_trim_ends_with_gaps():
    t = parse_one("q\t100\t0\t8\t+\tt\t100\t0\t7\t7\t8\t60\tcg:Z:2M1I5M")
    t2 = tr.trim_ends(t, 3)
    assert t2.qstart[0] == 4 and t2.tstart[0] == 3
    assert t2.qend[0] == 5 and t2.tend[0] == 4
    paf_check(t2)


def test_trim_ends_strips_boundary_indels():
    # leading/trailing indels are consumed even with trim 0 (impl/paf.c:520)
    t = parse_one("q\t100\t0\t9\t+\tt\t100\t0\t10\t8\t11\t60\tcg:Z:1I8M2D")
    t2 = tr.trim_ends(t, 0)
    ops, lens = t2.record_ops(0)
    assert list(ops) == [MATCH] and list(lens) == [8]
    assert t2.qstart[0] == 1 and t2.tend[0] == 8
    paf_check(t2)


def test_trim_ends_opposite_strand():
    t = parse_one("q\t100\t0\t10\t-\tt\t100\t0\t10\t10\t10\t60\tcg:Z:10M")
    t2 = tr.trim_ends(t, 2)
    # front trim moves (qend-, tstart+); back trim moves (qstart+, tend-)
    assert t2.qstart[0] == 2 and t2.qend[0] == 8
    assert t2.tstart[0] == 2 and t2.tend[0] == 8
    paf_check(t2)


def test_trim_end_fraction():
    t = parse_one("q\t100\t0\t10\t+\tt\t100\t0\t10\t10\t10\t60\tcg:Z:10M")
    t2 = tr.trim_end_fraction(t, 0.4)
    assert t2.qstart[0] == 2 and t2.qend[0] == 8
    assert t2.tstart[0] == 2 and t2.tend[0] == 8


# ---- 10. shatter ----

def test_shatter_single_match():
    t = parse_one("q\t100\t0\t5\t+\tt\t100\t0\t5\t5\t5\t60\tcg:Z:5M")
    s = tr.shatter(t)
    assert len(s) == 1
    assert s.qstart[0] == 0 and s.qend[0] == 5
    assert s.tstart[0] == 0 and s.tend[0] == 5
    paf_check(s)


def test_shatter_multi_match():
    t = parse_one("q\t100\t0\t7\t+\tt\t100\t0\t9\t7\t9\t60\tcg:Z:3M2D4M")
    s = tr.shatter(t)
    assert len(s) == 2
    assert (s.qstart[0], s.qend[0], s.tstart[0], s.tend[0]) == (0, 3, 0, 3)
    assert (s.qstart[1], s.qend[1], s.tstart[1], s.tend[1]) == (3, 7, 5, 9)
    paf_check(s)


def test_shatter_opposite_strand():
    t = parse_one("q\t100\t0\t7\t-\tt\t100\t0\t9\t7\t9\t60\tcg:Z:3M2D4M")
    s = tr.shatter(t)
    assert len(s) == 2
    assert (s.qstart[0], s.qend[0], s.tstart[0], s.tend[0]) == (4, 7, 0, 3)
    assert (s.qstart[1], s.qend[1], s.tstart[1], s.tend[1]) == (0, 4, 5, 9)
    paf_check(s)


def test_shatter_inherits_chain_score_zero():
    # paf_shatter2 never sets chain_score; the calloc default 0 is emitted as
    # s1:i:0 (impl/paf.c:600-627 + write rule impl/paf.c:361-364)
    t = parse_one("q\t100\t0\t5\t+\tt\t100\t0\t5\t5\t5\t60\ts1:i:77\tcg:Z:5M")
    s = tr.shatter(t)
    assert s.chain_score[0] == 0
    assert "s1:i:0" in format_record(s, 0)


# ---- 11. remove mismatches ----

def test_remove_mismatches():
    t = parse_one("q\t100\t0\t6\t+\tt\t100\t0\t5\t5\t6\t60\tcg:Z:3=2X1I")
    t2 = tr.remove_mismatches(t)
    ops, lens = t2.record_ops(0)
    assert list(ops) == [MATCH, QUERY_INSERT]
    assert list(lens) == [5, 1]


def test_remove_mismatches_does_not_merge_indels():
    t = parse_one("q\t100\t0\t8\t+\tt\t100\t0\t10\t4\t12\t60\tcg:Z:2=2X1I1I2D2=2X")
    t2 = tr.remove_mismatches(t)
    ops, lens = t2.record_ops(0)
    assert list(ops) == [MATCH, QUERY_INSERT, QUERY_INSERT, QUERY_DELETE, MATCH]
    assert list(lens) == [4, 1, 1, 2, 4]


def test_multi_record_batch_transforms():
    text = ("a\t10\t0\t5\t+\tx\t10\t0\t5\t5\t5\t60\tcg:Z:5M\n"
            "b\t20\t2\t10\t-\ty\t20\t3\t10\t7\t8\t60\tcg:Z:3M1I4M\n"
            "c\t30\t0\t4\t+\tz\t30\t0\t6\t4\t6\t60\tcg:Z:2M2D2M\n")
    t = parse_paf_text(text)
    t2 = tr.invert(tr.invert(t))
    for i in range(3):
        assert format_record(t2, i) == format_record(t, i)
    s = tr.shatter(t)
    assert len(s) == 1 + 2 + 2
    paf_check(s)

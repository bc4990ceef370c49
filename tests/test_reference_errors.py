"""Error-path parity vs the compiled reference: both implementations must
REJECT the same malformed inputs (nonzero exit).  Exit codes and message
formats differ by design (st_errAbort/assert vs exceptions), so only the
accept/reject decision is compared.
"""

import pathlib
import subprocess
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                       / "tools" / "refbuild"))
from build import build_reference  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def ref():
    bins = build_reference()
    if bins is None:
        pytest.skip("no native toolchain / reference tree")
    return bins


def rc_theirs(binary, argv, stdin: bytes = b"") -> int:
    return subprocess.run([binary, *argv], input=stdin,
                          capture_output=True, timeout=120).returncode


def rc_ours(cmd, argv, stdin: bytes = b"") -> int:
    import os
    env = dict(os.environ)
    env["PAFFY_TPU_PLATFORM"] = "cpu"
    return subprocess.run([str(REPO / "bin" / cmd), *argv], input=stdin,
                          capture_output=True, timeout=600,
                          env=env).returncode


GOOD = ("q\t100\t0\t10\t+\tt\t100\t0\t10\t10\t10\t60\tcg:Z:10M\n").encode()
BAD_STRAND = GOOD.replace(b"\t+\t", b"\t?\t")
BAD_CIGAR_CHAR = GOOD.replace(b"10M", b"10Q")
BAD_CIGAR_SPAN = GOOD.replace(b"10M", b"9M")       # paf_check: span mismatch
BAD_COORD = GOOD.replace(b"\t0\t10\t+", b"\t90\t110\t+")


@pytest.mark.parametrize("label,data", [
    ("good", GOOD),
    ("bad_strand", BAD_STRAND),
    ("bad_cigar_char", BAD_CIGAR_CHAR),
])
def test_parse_error_parity(ref, label, data, tmp_path):
    """invert parses + checks every record on both sides."""
    theirs = rc_theirs(ref["paffy"], ["invert"], data)
    ours = rc_ours("paffy", ["invert"], data)
    assert (theirs == 0) == (ours == 0), (
        f"{label}: reference rc {theirs}, ours rc {ours}")


@pytest.mark.parametrize("label,data", [
    ("bad_cigar_span", BAD_CIGAR_SPAN),
    ("bad_coord", BAD_COORD),
])
def test_check_error_parity(ref, label, data):
    theirs = rc_theirs(ref["paffy"], ["invert"], data)
    ours = rc_ours("paffy", ["invert"], data)
    assert theirs != 0 and ours != 0, (
        f"{label}: reference rc {theirs}, ours rc {ours} — both must reject")


def test_missing_sequence_parity(ref, tmp_path):
    paf = tmp_path / "in.paf"
    paf.write_bytes(GOOD)
    fasta = tmp_path / "seqs.fa"
    fasta.write_text(">other\nACGT\n")   # neither q nor t present
    theirs = rc_theirs(ref["paffy"],
                       ["view", "-i", str(paf), str(fasta), "-s", "-t"])
    ours = rc_ours("paffy", ["view", "-i", str(paf), str(fasta), "-s", "-t"])
    assert theirs != 0 and ours != 0


def test_unknown_subcommand_parity(ref):
    assert rc_theirs(ref["paffy"], ["frobnicate"]) != 0
    assert rc_ours("paffy", ["frobnicate"]) != 0


GOOD2 = GOOD
BAD_SPAN2 = GOOD.replace(b"10M", b"9M")
CASES_PARTIAL = [
    ("dup_badcoord", GOOD + BAD_COORD.replace(b"q\t", b"r\t")),
    ("dup_badspan", GOOD + BAD_SPAN2.replace(b"q\t", b"r\t")),
    ("dup_badchr", GOOD + BAD_CIGAR_CHAR.replace(b"q\t", b"r\t")),
    ("lead0", GOOD.replace(b"10M", b"010M")),
    ("badchr_alone", BAD_CIGAR_CHAR),
]
RAW_CMDS = [["dedupe"], ["dedupe", "-a"], ["invert"], ["trim"],
            ["filter"], ["upconvert"]]


@pytest.mark.parametrize("label,data", CASES_PARTIAL)
@pytest.mark.parametrize("cmd", RAW_CMDS, ids=lambda c: "_".join(c))
def test_partial_output_and_weird_cigar_parity(ref, label, data, cmd):
    """Error-path BYTE parity, not just rc parity: the reference processes
    record-at-a-time, so good records before a bad one reach the output
    before it aborts; parse_cigar=0 commands (dedupe, upconvert) pass even
    malformed cg text through verbatim while parse=1 commands reject or
    canonicalize it.  stdout must match byte-for-byte in ALL cases."""
    import os
    env = dict(os.environ, PAFFY_TPU_PLATFORM="cpu")
    a = subprocess.run([ref["paffy"], *cmd], input=data,
                       capture_output=True, timeout=120, env=env)
    b = subprocess.run([str(REPO / "bin" / "paffy"), *cmd], input=data,
                       capture_output=True, timeout=600, env=env)
    assert (a.returncode == 0) == (b.returncode == 0), (label, cmd)
    assert a.stdout == b.stdout, (label, cmd)


def _vrec(cg, qs=0, qe=10, ts=0, te=10, st="+", name="r"):
    return (f"{name}\t100\t{qs}\t{qe}\t{st}\tt\t100\t{ts}\t{te}\t10\t10\t60"
            f"\tcg:Z:{cg}\n").encode()


WALK_CASES = [
    ("qend_gt_qlen", _vrec("15M", qs=95, qe=110, te=15)),
    ("qstart_ge_qlen", _vrec("0M", qs=100, qe=100, te=0)),
    ("tstart_gt_tend", _vrec("10M", ts=20, te=10)),
    ("span_short", _vrec("9M")),
    ("span_long", _vrec("11M")),
    ("neg_qstart", _vrec("10M", qs=-5)),
    ("zero_len_op", _vrec("5M0M5M")),
    ("all_insert_far", _vrec("20I", qs=90, qe=110, ts=5, te=5)),
    ("rev_bad_shard", _vrec("10M", qs=-3, qe=7, st="-")),
    ("good_neg", _vrec("10M", qs=3, qe=13, st="-")),
    ("dupname_badlen",
     b"q\t200\t0\t10\t+\tu\t100\t0\t10\t10\t10\t60\tcg:Z:10M\n"),
]


@pytest.mark.parametrize("label,vrec", WALK_CASES)
@pytest.mark.parametrize("cmd", [["shatter"], ["to_bed"], ["tile"],
                                 ["to_bed", "-n"]],
                         ids=lambda c: "_".join(c))
def test_walk_assert_parity(ref, label, vrec, cmd):
    """shatter/to_bed/tile reject exactly the records the reference's
    walk asserts / per-shard paf_check reject — including the records the
    asserts ACCEPT (qstart>=qlen with no aligned columns, tstart>tend on
    the never-examined target side), with byte-identical stdout (abort
    loses the stdio buffer; errAbort flushes the prior records)."""
    import os
    env = dict(os.environ, PAFFY_TPU_PLATFORM="cpu")
    data = GOOD + vrec
    a = subprocess.run([ref["paffy"], *cmd], input=data,
                       capture_output=True, timeout=120, env=env)
    b = subprocess.run([str(REPO / "bin" / "paffy"), *cmd], input=data,
                       capture_output=True, timeout=600, env=env)
    assert (a.returncode == 0) == (b.returncode == 0), (label, cmd)
    assert a.stdout == b.stdout, (label, cmd)


def _bulk(n, cg="10M5I5D10M5I5D100M", prefix="q"):
    """n distinct valid records, ~100 bytes each — enough output to cross
    several 4096-byte stdio blocks before an error."""
    out = []
    for i in range(n):
        out.append(f"{prefix}{i}\t1000\t0\t130\t+\tt{i}\t1000\t0\t130\t130"
                   f"\t130\t60\tcg:Z:{cg}\n")
    return "".join(out).encode()


GRAN_CASES = [
    # SIGSEGV class mid-file: the reference loses only the sub-4096-byte
    # stdio tail, so the flushed block prefix must match byte-for-byte
    ("segv_blank", _bulk(120) + b"\n" + _bulk(3, prefix="z")),
    ("segv_short", _bulk(120) + b"r\t100\t0\t10\n" + _bulk(3, prefix="z")),
    # errAbort class mid-file: exit() flushes, full prefix emitted
    ("abort_strand", _bulk(120) + _bulk(1, prefix="s").replace(b"\t+\t", b"\t*\t")
     + _bulk(3, prefix="z")),
]


@pytest.mark.parametrize("label,data", GRAN_CASES)
@pytest.mark.parametrize("cmd", [["invert"], ["trim"], ["filter"],
                                 ["dedupe"], ["shatter"]],
                         ids=lambda c: c[0])
@pytest.mark.parametrize("batch", ["1024", "8192", None], ids=lambda b: b or "default")
def test_stdio_granularity_parity(ref, label, data, cmd, batch):
    """Error-path BYTE parity at ANY streaming batch size: GlibcWriter
    stages output in 4096-byte stdio blocks, so the bytes that reach the
    pipe when a command dies mid-stream equal the reference's flushed
    stdio prefix — for the SIGSEGV class (tail lost) and the errAbort
    class (tail flushed) alike, regardless of PAFFY_TPU_BATCH_BYTES.
    Forced onto the Python lane; the fast lane re-verifies separately in
    the default-batch pass (dedupe rows)."""
    import os
    env = dict(os.environ, PAFFY_TPU_PLATFORM="cpu")
    if batch is not None:
        env["PAFFY_TPU_BATCH_BYTES"] = batch
        env["PAFFY_TPU_NO_FAST"] = "1"
    a = subprocess.run([ref["paffy"], *cmd], input=data,
                       capture_output=True, timeout=120, env=env)
    b = subprocess.run([str(REPO / "bin" / "paffy"), *cmd], input=data,
                       capture_output=True, timeout=600, env=env)
    assert a.returncode != 0 and b.returncode != 0, (label, cmd, batch)
    assert a.stdout == b.stdout, (
        label, cmd, batch, len(a.stdout), len(b.stdout))


def test_trim_nan_assert_granularity(ref):
    """trim's identity sanity assert dies on an OP-FREE cigar record
    (0/0 identity NaN, impl/paf.c:952; all-I/all-D survive — indels
    count as mismatches there) — SIGABRT class: the records before it
    reach the pipe up to the flushed 4096-byte boundary, on both sides,
    with a multi-block prefix."""
    import os
    env = dict(os.environ, PAFFY_TPU_PLATFORM="cpu")
    nocigar = b"bare\t1000\t0\t130\t+\tt\t1000\t0\t130\t130\t130\t60\n"
    data = _bulk(120) + nocigar + _bulk(3, prefix="z")
    a = subprocess.run([ref["paffy"], "trim"], input=data,
                       capture_output=True, timeout=120, env=env)
    b = subprocess.run([str(REPO / "bin" / "paffy"), "trim"], input=data,
                       capture_output=True, timeout=600, env=env)
    c = subprocess.run([str(REPO / "bin" / "paffy"), "trim"], input=data,
                       capture_output=True, timeout=600,
                       env={**env, "PAFFY_TPU_NO_FAST": "1",
                            "PAFFY_TPU_BATCH_BYTES": "2048"})
    assert a.returncode != 0 and b.returncode != 0 and c.returncode != 0
    assert len(a.stdout) >= 4096 and a.stdout == b.stdout == c.stdout


def test_missing_sequence_midstream_prefix(ref, tmp_path):
    """add_mismatches and view fetch sequences per record: a missing name
    mid-file errAborts AFTER the prior records were encoded/printed and
    flushed — the prefix must match byte-for-byte (incl. view -a's
    base-level render)."""
    import os
    env = dict(os.environ, PAFFY_TPU_PLATFORM="cpu")
    fa = tmp_path / "s.fa"
    fa.write_text(">q\n" + "ACGT" * 300 + "\n>t\n" + "ACGT" * 300 + "\n")
    rec = ("q\t1200\t0\t200\t+\tt\t1200\t0\t200\t200\t200\t60"
           "\tcg:Z:200M\n")
    for cmd in (["add_mismatches", str(fa)],
                ["view", str(fa)],
                ["view", "-s", "-t", str(fa)],
                ["view", "-a", "-s", str(fa)]):
        for badline in (rec.replace("q\t", "zz\t", 1),
                        rec.replace("\tt\t", "\tzz\t", 1)):
            data = (rec * 60 + badline + rec * 3).encode()
            a = subprocess.run([ref["paffy"], *cmd], input=data,
                               capture_output=True, timeout=120, env=env)
            b = subprocess.run([str(REPO / "bin" / "paffy"), *cmd],
                               input=data, capture_output=True,
                               timeout=600, env=env)
            assert a.returncode != 0 and b.returncode != 0, (cmd, a, b)
            assert a.stdout == b.stdout, (cmd, len(a.stdout), len(b.stdout))


NESTED_CASES = [
    # the FIRST bad line in file order wins even when a LATER line fails
    # an earlier parser pass (the raw scan rejects blank lines before the
    # fill validates cigar chars): errAbort at line 2 + SIGSEGV blank at
    # the end, and the reverse nesting
    ("abort_then_segv",
     GOOD + GOOD.replace(b"q\t", b"r\t").replace(b"10M", b"5M3Q")
     + GOOD.replace(b"q\t", b"s\t") + b"\n"),
    ("segv_then_abort",
     GOOD + b"\n" + GOOD.replace(b"q\t", b"r\t").replace(b"10M", b"5M3Q")),
    ("two_aborts",
     GOOD + GOOD.replace(b"q\t", b"r\t").replace(b"10M", b"5M3Q")
     + GOOD.replace(b"q\t", b"s\t").replace(b"\t+\t", b"\t*\t")),
]


@pytest.mark.parametrize("label,data", NESTED_CASES)
@pytest.mark.parametrize("cmd", [["invert"], ["trim"], ["filter"]],
                         ids=lambda c: c[0])
def test_nested_error_classes(ref, label, data, cmd):
    """Multiple malformed lines of different classes: the earliest line's
    error and death class decide the output prefix on both lanes."""
    import os
    env = dict(os.environ, PAFFY_TPU_PLATFORM="cpu")
    a = subprocess.run([ref["paffy"], *cmd], input=data,
                       capture_output=True, timeout=120, env=env)
    for extra in ({}, {"PAFFY_TPU_NO_FAST": "1"}):
        b = subprocess.run([str(REPO / "bin" / "paffy"), *cmd], input=data,
                           capture_output=True, timeout=600,
                           env={**env, **extra})
        assert a.returncode != 0 and b.returncode != 0, (label, cmd, extra)
        assert a.stdout == b.stdout, (label, cmd, extra)


MULTICLASS_CASES = [
    # two invalid records of DIFFERENT check classes: the reference checks
    # record-at-a-time (impl/paf.c:427-461 via impl/paf_dedupe.c:120-124),
    # so the EARLIER record must win even when its class is checked later
    # within a record — a class-ordered vectorized sweep would abort at the
    # later record and emit records the reference never outputs.
    ("qend_then_qstart",
     _vrec("10M", name="g1")
     + _vrec("15M", qs=95, qe=110, name="b1")       # bad qend (class 1)
     + _vrec("10M", name="g2")
     + _vrec("10M", qs=-5, qe=5, name="b2")),       # bad qstart (class 0)
    ("tend_then_qstart",
     _vrec("10M", name="g1")
     + _vrec("10M", ts=95, te=110, name="b1")       # bad tend (class 3)
     + _vrec("10M", qs=-5, qe=5, name="b2")),       # bad qstart (class 0)
]


@pytest.mark.parametrize("label,data", MULTICLASS_CASES)
def test_dedupe_inverse_multiclass_record_order(ref, label, data):
    """dedupe -a coordinate-checks via the vectorized paf_check(idx=...)
    path; with invalid records of different classes the first bad RECORD
    must abort (class order only picks the message), with byte-identical
    stdout prefix."""
    import os
    env = dict(os.environ, PAFFY_TPU_PLATFORM="cpu")
    a = subprocess.run([ref["paffy"], "dedupe", "-a"], input=data,
                       capture_output=True, timeout=120, env=env)
    b = subprocess.run([str(REPO / "bin" / "paffy"), "dedupe", "-a"],
                       input=data, capture_output=True, timeout=600, env=env)
    assert a.returncode != 0 and b.returncode != 0, (label, a, b)
    assert a.stdout == b.stdout, (label, a.stdout, b.stdout)


STRTOK_CASES = [
    ("blank_mid", GOOD + b"\n" + GOOD.replace(b"q\t", b"r\t")),
    ("blank_end", GOOD + b"\n"),
    ("empty_qlen", GOOD + GOOD.replace(b"q\t100\t", b"r\t\t", 1)),
    ("double_tab_tags", GOOD.replace(b"\t60\t", b"\t60\t\t")),
    ("leading_tab", b"\t" + GOOD),
    ("trailing_tab", GOOD.replace(b"10M\n", b"10M\t\n")),
    ("struct_short", GOOD + b"r\t100\t0\t10\n"),
]


@pytest.mark.parametrize("label,data", STRTOK_CASES)
@pytest.mark.parametrize("cmd", [["dedupe"], ["invert"], ["trim"]],
                         ids=lambda c: c[0])
def test_strtok_field_parity(ref, label, data, cmd):
    """The reference splits fields with strtok: consecutive tabs collapse
    (an empty field SHIFTS the remaining tokens), and a blank line or a
    sub-12-token line dereferences strtok's NULL — SIGSEGV with the stdio
    buffer lost, so no prefix precedes the crash.  Our tokenizer mirrors
    the collapse and classifies sub-12-token lines as the no-prefix hard
    class.  stdout must match byte-for-byte."""
    import os
    env = dict(os.environ, PAFFY_TPU_PLATFORM="cpu")
    a = subprocess.run([ref["paffy"], *cmd], input=data,
                       capture_output=True, timeout=120, env=env)
    b = subprocess.run([str(REPO / "bin" / "paffy"), *cmd], input=data,
                       capture_output=True, timeout=600, env=env)
    assert (a.returncode == 0) == (b.returncode == 0), (label, cmd)
    assert a.stdout == b.stdout, (label, cmd)

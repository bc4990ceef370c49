"""Flag-matrix parity corners vs the compiled reference: faffy chunk
degenerate chunk/overlap values and directory error paths
(impl/fasta_chunk.c:74,119-127,167-182), and view -u/-v return-code +
stdout parity at exact threshold boundaries (impl/paf_view.c:196-197,
assert class: SIGABRT loses the buffered aggregate line)."""

import os
import pathlib
import subprocess
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                       / "tools" / "refbuild"))
from build import build_reference  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parent.parent
ENV = dict(os.environ, PAFFY_TPU_PLATFORM="cpu")


@pytest.fixture(scope="module")
def ref():
    bins = build_reference()
    if bins is None:
        pytest.skip("no native toolchain / reference tree")
    return bins


@pytest.fixture(scope="module")
def fasta(tmp_path_factory):
    p = tmp_path_factory.mktemp("corner") / "in.fa"
    p.write_text(">s1\nACGTACGTACGTACGTACGTACGTACGTACGT\n>s2\nACGTACGTACGTACGT\n")
    return p


def run_chunk(binary, d, args, fasta_path, timeout=30):
    return subprocess.run(
        [str(binary), "chunk", "-d", str(d), *args,
         *( [str(fasta_path)] if fasta_path else [] )],
        capture_output=True, timeout=timeout, env=ENV, text=True)


@pytest.mark.parametrize("c,o", [("8", "4"), ("8", "0"), ("1", "0"),
                                 ("7", "3"), ("8", "7")])
def test_chunk_size_matrix_content(ref, fasta, tmp_path, c, o):
    """Valid chunkSize/overlap combos, including overlap 0 and
    overlap == chunkSize-1: identical chunk files and stdout listing."""
    outs = []
    for tag, binary in (("ref", ref["faffy"]), ("ours", REPO / "bin" / "faffy")):
        d = tmp_path / f"{tag}_{c}_{o}"
        r = run_chunk(binary, d, ["-c", c, "-o", o], fasta)
        assert r.returncode == 0, (tag, r.stderr[-500:])
        names = sorted(p.name for p in d.iterdir())
        blob = b"".join((d / n).read_bytes() for n in names)
        listing = [pathlib.Path(ln).name for ln in r.stdout.splitlines()]
        outs.append((names, blob, listing))
    assert outs[0] == outs[1]


@pytest.mark.parametrize("c,o", [("8", "8"), ("4", "8"), ("0", "0"),
                                 ("-4", "-8")])
def test_chunk_degenerate_sizes_reject(ref, fasta, tmp_path, c, o):
    """chunkSize <= overlap (per-sequence assert, SIGABRT) and
    non-positive chunkSize (stString_getSubString death) reject on both
    sides.  (chunkSize 0 with a negative overlap spins forever in the
    reference's stride loop — our clean error there is the documented
    replacement, not probed.)"""
    a = run_chunk(ref["faffy"], tmp_path / "r", ["-c", c, "-o", o], fasta,
                  timeout=15)
    b = run_chunk(REPO / "bin" / "faffy", tmp_path / "o",
                  ["-c", c, "-o", o], fasta)
    assert a.returncode != 0 and b.returncode != 0, (c, o, a, b)


@pytest.mark.parametrize("c,o", [("4", "8"), ("0", "0")])
def test_chunk_degenerate_sizes_empty_input_pass(ref, tmp_path, c, o):
    """The reference's size assert lives inside processSequenceToChunk —
    with no sequences it never fires, so degenerate sizes exit 0 on an
    empty FASTA on both sides (impl/fasta_chunk.c:74)."""
    empty = tmp_path / "empty.fa"
    empty.write_text("")
    a = run_chunk(ref["faffy"], tmp_path / "r", ["-c", c, "-o", o], empty)
    b = run_chunk(REPO / "bin" / "faffy", tmp_path / "o",
                  ["-c", c, "-o", o], empty)
    assert a.returncode == 0 and b.returncode == 0, (c, o, a, b)


def test_chunk_dir_error_paths(ref, fasta, tmp_path):
    """Existing non-empty dir and dir-is-a-file both abort before any
    chunking (impl/fasta_chunk.c:167-182)."""
    for mk in ("nonempty", "file"):
        rd, od = tmp_path / f"r_{mk}", tmp_path / f"o_{mk}"
        if mk == "nonempty":
            rd.mkdir(); od.mkdir()
            (rd / "x").touch(); (od / "x").touch()
        else:
            rd.touch(); od.touch()
        a = run_chunk(ref["faffy"], rd, ["-c", "8", "-o", "4"], fasta)
        b = run_chunk(REPO / "bin" / "faffy", od, ["-c", "8", "-o", "4"],
                      fasta)
        assert a.returncode == 1 and b.returncode == 1, (mk, a, b)


def test_dechunk_sscanf_header_fields(ref, tmp_path):
    """decode_fasta_header parses |length|start with sscanf leading-integer
    semantics — "20x" is 20, trailing junk ignored (impl/paf.c:719-725
    asserts only that one item matched).  Byte parity on both lanes."""
    paf = tmp_path / "in.paf"
    paf.write_bytes(b"n|20x|5\t15\t0\t10\t+\tt|30|2\t28\t0\t10\t10\t10\t60"
                    b"\tcg:Z:10M\n")
    a = subprocess.run([ref["paffy"], "dechunk", "-i", str(paf)],
                       capture_output=True, timeout=60, env=ENV)
    outs = [a.stdout]
    for extra in ({}, {"PAFFY_TPU_NO_FAST": "1"}):
        b = subprocess.run([str(REPO / "bin" / "paffy"), "dechunk", "-i",
                            str(paf)], capture_output=True, timeout=240,
                           env={**ENV, **extra})
        assert b.returncode == a.returncode == 0, (a, b)
        outs.append(b.stdout)
    assert outs[0] == outs[1] == outs[2]


def test_chunk_nonacgtn_partial_state_parity(ref, tmp_path):
    """faffy chunk's per-base assert (non-ACGTN char, SIGABRT,
    impl/fasta_chunk.c:93-97): completed chunk files were fclosed
    (flushed), the current chunk's sub-block tail and the unflushed
    stdout listing are LOST — chunk dirs and stdout must match
    byte-for-byte mid-death."""
    fa = tmp_path / "iu.fa"
    fa.write_text(">s1\n" + "ACGT" * 1500 + "\n>s2\n"
                  + "ACGT" * 2000 + "R" + "ACGT" * 100 + "\n")
    outs = []
    for tag, binary in (("ref", ref["faffy"]), ("ours", REPO / "bin" / "faffy")):
        d = tmp_path / tag
        r = subprocess.run([str(binary), "chunk", "-d", str(d), "-c", "3000",
                            "-o", "100", str(fa)], capture_output=True,
                           timeout=120, env=ENV)
        assert r.returncode != 0, (tag, r)
        outs.append((r.stdout,
                     {p.name: p.read_bytes() for p in d.iterdir()}))
    assert outs[0] == outs[1]


def test_extract_interval_bounds_parity(ref, tmp_path):
    """faffy extract's interval sanity asserts (impl/fasta_extract.c:211)
    SIGABRT on an end past the sequence length; intervals already
    reported keep only their flushed stdio blocks.  Parsed with atol
    semantics (junk fields read as leading-int / 0)."""
    fa = tmp_path / "s.fa"
    fa.write_text(">s1\n" + "ACGT" * 1000 + "\n>s2\n" + "ACGT" * 500 + "\n")
    bed = tmp_path / "b.bed"
    # several valid rows (multi-KB extract output), then an out-of-range end
    rows = [f"s1\t{k * 400}\t{k * 400 + 300}" for k in range(8)]
    rows.append("s2\t100\t9999")
    bed.write_text("\n".join(rows) + "\n")
    argv = ["extract", "-i", str(bed), str(fa), "-f", "0", "-m", "1"]
    a = subprocess.run([ref["faffy"], *argv], capture_output=True,
                       timeout=60, env=ENV)
    b = subprocess.run([str(REPO / "bin" / "faffy"), *argv],
                       capture_output=True, timeout=240, env=ENV)
    assert a.returncode != 0 and b.returncode != 0, (a, b)
    assert a.stdout == b.stdout
    # atol junk fields: "12x" reads as 12, "abc" as 0 — both accept
    bed.write_text("s1\t12x\t200\ns1\tabc\t100\n")
    a = subprocess.run([ref["faffy"], *argv], capture_output=True,
                       timeout=60, env=ENV)
    b = subprocess.run([str(REPO / "bin" / "faffy"), *argv],
                       capture_output=True, timeout=240, env=ENV)
    assert a.returncode == 0 and b.returncode == 0, (a.stderr, b.stderr)
    assert a.stdout == b.stdout


def test_view_without_s_superset_relationship(ref, view_work):
    """The reference SIGABRTs on EVERY plain `view` (its unconditional
    sanity assert divides 0/0 without -s, impl/paf_view.c:196; its own
    include.mk forces -UNDEBUG).  paffy-tpu always accumulates and exits
    0 — the documented superset.  The relationship is exact: the
    reference's stdout is our stdout truncated to the flushed 4096-byte
    stdio boundary."""
    argv = ["view", "-i", str(view_work / "in.paf"), str(view_work / "s.fa")]
    a = subprocess.run([ref["paffy"], *argv], capture_output=True,
                       timeout=60, env=ENV)
    b = subprocess.run([str(REPO / "bin" / "paffy"), *argv],
                       capture_output=True, timeout=240, env=ENV)
    assert a.returncode != 0 and b.returncode == 0
    n = len(b.stdout) - len(b.stdout) % 4096
    assert a.stdout == b.stdout[:n]


# ---------------------------------------------------------------- view -u/-v

@pytest.fixture(scope="module")
def view_work(tmp_path_factory):
    """20-column alignment with exactly one mismatch: aggregate identity
    19/20 = 0.95 in float32 on both sides."""
    d = tmp_path_factory.mktemp("viewuv")
    (d / "s.fa").write_text(">q\nACGTACGTACGTACGTACGT\n"
                            ">t\nACGTACGTACGTACGTACGA\n")
    (d / "in.paf").write_text(
        "q\t20\t0\t20\t+\tt\t20\t0\t20\t20\t20\t60\tcg:Z:20M\n")
    return d


@pytest.mark.parametrize("flag,val,passes", [
    ("-u", "0.95", True),     # exact float32 boundary: assert >= holds
    ("-u", "0.9501", False),  # just above: SIGABRT, aggregate line LOST
    ("-u", "0.9", True),
    ("-v", "20", True),       # aligned bases == threshold
    ("-v", "21", False),
])
def test_view_threshold_boundaries(ref, view_work, flag, val, passes):
    """rc AND stdout parity at the -u/-v boundaries with -s: the
    reference compares float32 thresholds (its variable is a C float) and
    its asserts fire after printing the aggregate line but before stdio
    flushes — a failing threshold loses the line on both sides."""
    argv = ["view", "-i", str(view_work / "in.paf"), "-s", "-t",
            str(view_work / "s.fa"), flag, val]
    a = subprocess.run([ref["paffy"], *argv], capture_output=True,
                       timeout=60, env=ENV)
    b = subprocess.run([str(REPO / "bin" / "paffy"), *argv],
                       capture_output=True, timeout=240, env=ENV)
    assert (a.returncode == 0) == passes, (a.returncode, a.stderr[-300:])
    assert (b.returncode == 0) == passes, (b.returncode, b.stderr[-300:])
    assert a.stdout == b.stdout, (a.stdout, b.stdout)

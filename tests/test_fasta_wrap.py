"""Opt-in wrapped FASTA writer (--lineWidth): chunk/merge/extract round-trip
byte-equivalence between wrapped and unwrapped modes.

The default (width 0) emits one sequence line per record — the byte format
the refbuild shim pins for the reference diff; real sonLib's fastaWrite
wraps, so --lineWidth removes that documented divergence class when a
consumer needs wrapped bytes.  Every reader accepts both, so the gate here
is PARSED equality plus wrapped-shape checks.
"""

import pathlib
import subprocess
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from paffy_tpu.core.fasta import read_fasta  # noqa: E402
from tests.synthdata import make_workload  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parent.parent
FAFFY = str(REPO / "bin" / "faffy")


def run(argv, **kw):
    p = subprocess.run([FAFFY, *argv], capture_output=True, timeout=300,
                       **kw)
    assert p.returncode == 0, p.stderr.decode()
    return p


def _mkfasta(tmp_path):
    seqs, _ = make_workload(seed=5, length=150_000, n_windows=4,
                            window=9_000, step=4_000)
    fa = tmp_path / "in.fa"
    with open(fa, "w") as fh:
        for n, s in seqs.items():
            fh.write(f">{n}\n{s}\n")
    return fa, seqs


def _assert_wrapped(path, width):
    for ln in open(path).read().splitlines():
        if not ln.startswith(">"):
            assert len(ln) <= width


def test_chunk_merge_roundtrip_both_modes(tmp_path):
    fa, seqs = _mkfasta(tmp_path)
    lists = {}
    for mode, extra in (("plain", []), ("wrap", ["--lineWidth", "60"])):
        d = tmp_path / f"chunks_{mode}"
        p = run(["chunk", "-d", str(d), "-c", "30000", "-o", "2000",
                 str(fa)] + extra)
        lists[mode] = p.stdout
        if mode == "wrap":
            for f in sorted(d.iterdir()):
                _assert_wrapped(f, 60)
        # chunks parse to identical content in both modes
        got = {}
        for f in sorted(d.iterdir()):
            got.update(read_fasta(str(f)))
        assert {h.split("|")[0] for h in got} == set(seqs)
    # merge each mode's chunks, wrapped and unwrapped: all four parse equal
    merged = {}
    for cmode in ("plain", "wrap"):
        for wmode, extra in (("plain", []), ("wrap", ["--lineWidth", "60"])):
            outp = tmp_path / f"merged_{cmode}_{wmode}.fa"
            run(["merge", "-o", str(outp)] + extra, input=lists[cmode])
            if wmode == "wrap":
                _assert_wrapped(outp, 60)
            merged[(cmode, wmode)] = read_fasta(str(outp))
    base = merged[("plain", "plain")]
    assert base == seqs
    for k, v in merged.items():
        assert v == base, k


def test_extract_wrapped_parses_equal(tmp_path):
    fa, seqs = _mkfasta(tmp_path)
    nm = next(iter(seqs))
    bed = tmp_path / "iv.bed"
    bed.write_text(f"{nm}\t1000\t2500\n{nm}\t40000\t41800\n")
    outs = {}
    for mode, extra in (("plain", []), ("wrap", ["--lineWidth", "50"])):
        outp = tmp_path / f"ex_{mode}.fa"
        run(["extract", "-i", str(bed), "-o", str(outp), str(fa)] + extra)
        if mode == "wrap":
            _assert_wrapped(outp, 50)
        outs[mode] = read_fasta(str(outp))
    assert outs["plain"] == outs["wrap"]
    assert outs["plain"]

"""Three-way lane equivalence: for every subcommand the native CLI lane
serves, the reference binary, the fast lane (bin/paffy), and the Python
lane (PAFFY_TPU_NO_FAST=1) must produce byte-identical stdout and agree on
accept/reject over a content-varied workload matrix — strands, tag
combinations, empty cigars, '|' and dot-heavy names, duplicate records,
and per-command flag variants."""

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


def _rec(qn="q", ql=100, qs=0, qe=50, st="+", tn="t", tl=200, ts=10, te=60,
         nm=50, nb=50, mq=60, tags="cg:Z:50M"):
    base = f"{qn}\t{ql}\t{qs}\t{qe}\t{st}\t{tn}\t{tl}\t{ts}\t{te}\t{nm}\t{nb}\t{mq}"
    return base + ("\t" + tags if tags else "") + "\n"


WORKLOAD = (
    _rec()
    + _rec(qn="a|1|2", tn="b|3|4", tags="cg:Z:20M5I20M5D5M")          # | names
    + _rec(st="-", tags="tp:A:S\tAS:i:77\tcg:Z:10M10I10M10D20M")      # tags
    + _rec(tags="tl:i:3\tcn:i:9\ts1:i:123\tcg:Z:50M")                 # more tags
    + _rec(qn="dotty.chr1.alt", tags="")                              # no cigar
    + _rec(qn="q", tags="cg:Z:50M")                                   # duplicate
    + _rec(qn="t", tn="q", ql=200, tl=100, qs=10, qe=60, ts=0, te=50,
           tags="cg:Z:50M")                                           # inverse dup
    + _rec(qn="z", st="-", qs=5, qe=55, tags="AS:i:0\tcg:Z:25M1X24M") # =X-free M
    + _rec(qn="w", tags="xx:i:1\tcg:Z:50M\tyy:Z:zzz")                 # unknown tags
    + _rec(qn="n|100|0", tn="m|200|0", tags="cg:Z:50M")               # provenance
    + _rec(qn="alli", qe=50, ts=10, te=10, nm=0, tags="cg:Z:50I")      # all-I
    + _rec(qn="alld", qs=0, qe=0, ts=10, te=60, nm=0, tags="cg:Z:50D") # all-D
).encode()

# chain needs score-DISTINCT records: equal-score chain output order is
# the documented malloc-address divergence (README "Known divergences")
def _scored(workload: bytes) -> bytes:
    out = []
    for i, ln in enumerate(workload.decode().splitlines()):
        f = ln.split("\t")
        f = [x for x in f if not x.startswith("AS:i:")]
        f.append(f"AS:i:{100 + 7 * i}")
        out.append("\t".join(f))
    return ("\n".join(out) + "\n").encode()


CASES = [
    ("dedupe", []),
    ("dedupe", ["-a"]),
    ("chain", []),
    ("chain", ["-g", "500", "-d", "100", "-e", "2", "-t", "0.5"]),
    ("invert", []),
    ("filter", []),
    ("filter", ["-u", "0.5", "-x"]),
    ("filter", ["-s", "100", "-t", "10", "-w", "2"]),
    ("trim", []),
    ("trim", ["-r", "0.2", "-t", "0.4"]),
    ("shatter", []),
    ("dechunk", []),       # mixed provenance: aborts at first bare name
    ("dechunk", ["-q"]),
]


@pytest.mark.parametrize("cmd,flags", CASES,
                         ids=lambda v: v if isinstance(v, str) else "_".join(v) or "plain")
def test_three_way_lane_equivalence(ref, cmd, flags):
    payload = _scored(WORKLOAD) if cmd == "chain" else WORKLOAD
    a = subprocess.run([ref["paffy"], cmd, *flags], input=payload,
                       capture_output=True, timeout=120, env=ENV)
    b = subprocess.run([str(REPO / "bin" / "paffy"), cmd, *flags],
                       input=payload, capture_output=True, timeout=600,
                       env=ENV)
    c = subprocess.run([str(REPO / "bin" / "paffy"), cmd, *flags],
                       input=payload, capture_output=True, timeout=600,
                       env={**ENV, "PAFFY_TPU_NO_FAST": "1"})
    assert (a.returncode == 0) == (b.returncode == 0) == (c.returncode == 0), (
        cmd, flags, a.returncode, b.returncode, c.returncode,
        a.stderr[-200:], b.stderr[-200:], c.stderr[-200:])
    assert a.stdout == b.stdout == c.stdout, (cmd, flags)


def test_split_file_three_way(ref, tmp_path):
    paf = tmp_path / "in.paf"
    paf.write_bytes(WORKLOAD)
    outs = []
    for tag, argv, env in (
            ("ref", [ref["paffy"]], ENV),
            ("fast", [str(REPO / "bin" / "paffy")], ENV),
            ("py", [str(REPO / "bin" / "paffy")],
             {**ENV, "PAFFY_TPU_NO_FAST": "1"})):
        d = tmp_path / tag
        d.mkdir()
        r = subprocess.run([*argv, "split_file", "-i", str(paf),
                            "-p", str(d) + "/s_", "-q", "-m", "150"],
                           capture_output=True, timeout=600, env=env)
        assert r.returncode == 0, (tag, r.stderr[-300:])
        outs.append({p.name: p.read_bytes() for p in d.iterdir()})
    assert outs[0] == outs[1] == outs[2]

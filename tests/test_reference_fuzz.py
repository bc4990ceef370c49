"""Randomized differential fuzz against the compiled reference binaries.

test_reference_diff*.py pins parity on the golden workload + fixed flag
sweeps; this suite drives RANDOM structures (synthdata workloads: random
sequences, ~25% reverse strand, random window geometry) through full
command pipelines on both implementations and byte-compares.  Each seed is
a different coordinate/cigar/strand shape, so regressions in corner
arithmetic (trim boundaries, chain tiebreaks on equal coords, shatter's
backward walk) surface without hand-built fixtures.

Skipped without a native toolchain (cannot build the reference).
"""

import os
import pathlib
import subprocess
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                       / "tools" / "refbuild"))
from build import build_reference  # noqa: E402

from tests.synthdata import make_workload  # noqa: E402

SEEDS = [1, 2, 3, 4, 5]


@pytest.fixture(scope="module")
def ref():
    bins = build_reference()
    if bins is None:
        pytest.skip("no native toolchain / reference tree")
    return bins


@pytest.fixture(scope="module")
def repo_bins():
    root = pathlib.Path(__file__).resolve().parent.parent
    return {"paffy": str(root / "bin" / "paffy"),
            "faffy": str(root / "bin" / "faffy")}


def _workload(tmp, seed):
    seqs, lines = make_workload(seed=seed, length=120_000, n_windows=24,
                                window=9_000, step=3_700)
    fa = tmp / f"s{seed}.fa"
    with open(fa, "w") as fh:
        for n, s in seqs.items():
            fh.write(f">{n}\n{s}\n")
    paf = tmp / f"s{seed}.paf"
    paf.write_text("\n".join(lines) + "\n")
    return fa, paf


def _pipe(binpath, stages, inp: bytes, env) -> bytes:
    data = inp
    for argv in stages:
        p = subprocess.run([binpath] + argv, input=data,
                           stdout=subprocess.PIPE,
                           stderr=subprocess.DEVNULL, env=env)
        assert p.returncode == 0, (binpath, argv)
        data = p.stdout
    return data


@pytest.mark.parametrize("seed", SEEDS)
def test_fuzz_full_pipeline(ref, repo_bins, tmp_path, seed):
    """add_mismatches | chain | tile | trim | view -s — the Cactus recipe
    (tests/paf_pipeline_test.sh:57-60) on a random workload."""
    env = dict(os.environ, PAFFY_TPU_PLATFORM="cpu")
    fa, paf = _workload(tmp_path, seed)
    stages = [["add_mismatches", str(fa)],
              ["chain"],
              ["tile"],
              ["trim"],
              ["view", "-s", "-t", str(fa)]]
    inp = paf.read_bytes()
    a = _pipe(ref["paffy"], stages, inp, env)
    b = _pipe(repo_bins["paffy"], stages, inp, env)
    assert a == b


@pytest.mark.parametrize("seed", SEEDS[:3])
def test_fuzz_shatter_dedupe_invert(ref, repo_bins, tmp_path, seed):
    env = dict(os.environ, PAFFY_TPU_PLATFORM="cpu")
    _, paf = _workload(tmp_path, seed)
    stages = [["shatter"], ["dedupe", "-a"], ["invert"], ["to_bed"]]
    inp = paf.read_bytes()
    a = _pipe(ref["paffy"], stages, inp, env)
    b = _pipe(repo_bins["paffy"], stages, inp, env)
    assert a == b


@pytest.mark.parametrize("seed", SEEDS[:3])
def test_fuzz_trim_filter_variants(ref, repo_bins, tmp_path, seed):
    env = dict(os.environ, PAFFY_TPU_PLATFORM="cpu")
    fa, paf = _workload(tmp_path, seed)
    stages = [["add_mismatches", str(fa)],
              ["trim", "-r", "0.12", "-t", "0.3"],
              ["filter", "-u", "0.9"],
              ["trim", "-f", "-t", "0.08"]]
    inp = paf.read_bytes()
    a = _pipe(ref["paffy"], stages, inp, env)
    b = _pipe(repo_bins["paffy"], stages, inp, env)
    assert a == b

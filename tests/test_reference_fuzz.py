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

import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                       / "tools" / "refbuild"))
from build import build_reference  # noqa: E402

from tests.synthdata import make_workload  # noqa: E402

SEEDS = [1, 2, 3, 4, 5]


def adversarial_seqs(seqs: dict, rng) -> dict:
    """Mutate sequence CONTENT (not structure) adversarially: soft-masked
    lowercase runs, N blocks, sprinkled IUPAC ambiguity codes (both cases).
    Coordinates/cigars stay valid; the encoder's case folding
    (impl/paf.c:754, toupper on both sides) and complement rules
    (stString_reverseComplementChar) must agree byte-for-byte."""
    out = {}
    iupac = np.frombuffer(b"MRWSYKVHDBmrwsykvhdb", dtype=np.uint8)
    for nm, s in seqs.items():
        b = np.frombuffer(s.encode(), dtype=np.uint8).copy()
        n = len(b)
        for _ in range(max(1, n // 4000)):     # lowercase runs
            a = int(rng.integers(0, max(n - 200, 1)))
            ln = int(rng.integers(20, 200))
            seg = b[a: a + ln]
            b[a: a + ln] = np.where((seg >= 65) & (seg <= 90),
                                    seg + 32, seg)
        for _ in range(max(1, n // 6000)):     # N blocks
            a = int(rng.integers(0, max(n - 60, 1)))
            ln = int(rng.integers(5, 60))
            b[a: a + ln] = ord("N")
        k = max(1, n // 500)                   # sprinkled IUPAC
        pos = rng.integers(0, n, k)
        b[pos] = iupac[rng.integers(0, len(iupac), k)]
        out[nm] = b.tobytes().decode("latin-1")
    return out


def pathological_lines(seqs: dict, rng) -> list:
    """Hand-built edge-case records over the workload's sequences: 1-op
    cigars, ~20k-op alternating cigars, all-I and all-D records (no M
    columns at all — tile's empty-match INT16_MAX path, impl/paf_tile.c:62-65,
    and 0/0 identity float compares in trim/filter)."""
    qn, tn = "der.chr1", "anc.chr1"
    ql, tl = len(seqs[qn]), len(seqs[tn])
    lines = []
    # 1-op M record
    L = int(rng.integers(50, 400))
    qs = int(rng.integers(0, ql - L))
    ts = int(rng.integers(0, tl - L))
    lines.append(f"{qn}\t{ql}\t{qs}\t{qs+L}\t+\t{tn}\t{tl}\t{ts}\t{ts+L}"
                 f"\t{L}\t{L}\t60\tcg:Z:{L}M")
    # ~20k-op alternating 1M1I1M1D cigar
    k = 5000
    cg = "1M1I1M1D" * k
    qspan, tspan = 3 * k, 3 * k
    qs = int(rng.integers(0, ql - qspan))
    ts = int(rng.integers(0, tl - tspan))
    lines.append(f"{qn}\t{ql}\t{qs}\t{qs+qspan}\t+\t{tn}\t{tl}\t{ts}"
                 f"\t{ts+tspan}\t{2*k}\t{4*k}\t60\tAS:i:{k}\tcg:Z:{cg}")
    # all-I record (query-only span; target start == end)
    L = int(rng.integers(20, 200))
    qs = int(rng.integers(0, ql - L))
    ts = int(rng.integers(0, tl - 1))
    lines.append(f"{qn}\t{ql}\t{qs}\t{qs+L}\t+\t{tn}\t{tl}\t{ts}\t{ts}"
                 f"\t0\t{L}\t60\tcg:Z:{L}I")
    # all-D record (target-only span; query start == end)
    L = int(rng.integers(20, 200))
    qs = int(rng.integers(0, ql - 1))
    ts = int(rng.integers(0, tl - L))
    lines.append(f"{qn}\t{ql}\t{qs}\t{qs}\t+\t{tn}\t{tl}\t{ts}\t{ts+L}"
                 f"\t0\t{L}\t60\tcg:Z:{L}D")
    # 1-op reverse-strand M record
    L = int(rng.integers(50, 400))
    qs = int(rng.integers(0, ql - L))
    ts = int(rng.integers(0, tl - L))
    lines.append(f"{qn}\t{ql}\t{qs}\t{qs+L}\t-\t{tn}\t{tl}\t{ts}\t{ts+L}"
                 f"\t{L}\t{L}\t60\tcg:Z:{L}M")
    return lines


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


@pytest.mark.parametrize("seed", [11, 12, 13, 14, 15, 16])
def test_fuzz_adversarial_content(ref, repo_bins, tmp_path, seed):
    """Lowercase/N/IUPAC-dense pools + pathological cigars through the full
    pipeline (view/add_mismatches/trim/chain/tile): encoder case folding,
    IUPAC complement rules, empty-match and 20k-op edges must stay
    byte-identical to the reference binary."""
    env = dict(os.environ, PAFFY_TPU_PLATFORM="cpu")
    rng = np.random.default_rng(seed)
    seqs, lines = make_workload(seed=seed, length=60_000, n_windows=16,
                                window=7_000, step=3_100)
    seqs = adversarial_seqs(seqs, rng)
    lines = lines + pathological_lines(seqs, rng)
    fa = tmp_path / "adv.fa"
    with open(fa, "w") as fh:
        for n, s in seqs.items():
            fh.write(f">{n}\n{s}\n")
    inp = ("\n".join(lines) + "\n").encode()
    stages = [["add_mismatches", str(fa)],
              ["chain"],
              ["tile"],
              ["trim"],
              ["view", "-s", str(fa)]]
    a = _pipe(ref["paffy"], stages, inp, env)
    b = _pipe(repo_bins["paffy"], stages, inp, env)
    assert a == b


@pytest.mark.parametrize("seed", [21, 22, 23, 24])
def test_fuzz_pathological_shatter_filter(ref, repo_bins, tmp_path, seed):
    """Edge-case records through shatter|dedupe|filter|view -a (the
    alignment renderer must reproduce dash/star rows byte-exactly over
    IUPAC/lowercase content and all-indel records)."""
    env = dict(os.environ, PAFFY_TPU_PLATFORM="cpu")
    rng = np.random.default_rng(seed)
    seqs, lines = make_workload(seed=seed, length=40_000, n_windows=10,
                                window=5_000, step=2_900)
    seqs = adversarial_seqs(seqs, rng)
    lines = lines + pathological_lines(seqs, rng)
    fa = tmp_path / "adv.fa"
    with open(fa, "w") as fh:
        for n, s in seqs.items():
            fh.write(f">{n}\n{s}\n")
    inp = ("\n".join(lines) + "\n").encode()
    # -s is required on the reference side: without it the reference never
    # accumulates totals and its -u assert compares 0/0=NaN >= 0, aborting
    # on ANY input (impl/paf_view.c:175-179,196 — documented divergence;
    # we accumulate always)
    a = _pipe(ref["paffy"], [["add_mismatches", str(fa)],
                             ["view", "-a", "-s", str(fa)]], inp, env)
    b = _pipe(repo_bins["paffy"], [["add_mismatches", str(fa)],
                                   ["view", "-a", "-s", str(fa)]], inp, env)
    assert a == b
    a = _pipe(ref["paffy"], [["shatter"], ["dedupe", "-a"],
                             ["filter", "-u", "0.5"]], inp, env)
    b = _pipe(repo_bins["paffy"], [["shatter"], ["dedupe", "-a"],
                                   ["filter", "-u", "0.5"]], inp, env)
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

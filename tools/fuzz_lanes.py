"""Randomized three-way differential: reference binary vs fast lane vs
Python lane over generated PAF inputs mixing valid records, every error
class, odd names, tag soup, and pathological cigars.

Usage: python tools/fuzz_lanes.py [--rounds 50] [--seed 0]
Prints any divergence found; exit 0 when all rounds agree."""

from __future__ import annotations

import argparse
import os
import pathlib
import subprocess
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                       / "tools" / "refbuild"))

import numpy as np

from build import build_reference

REPO = pathlib.Path(__file__).resolve().parent.parent
ENV = dict(os.environ, PAFFY_TPU_PLATFORM="cpu")

NAMES = ["q", "t", "a|1|2", "n|100|0", "m|200|0", "dotty.chr1", "x_y",
         "long" * 10]
OPS = "MIDMID"          # M-heavy


def rand_cigar(rng, qspan, tspan):
    """A cigar consuming exactly (qspan, tspan), or None for no tag."""
    parts = []
    q, t = 0, 0
    while q < qspan or t < tspan:
        kind = rng.integers(0, 3)
        if kind == 0 and q < qspan and t < tspan:
            L = int(rng.integers(1, min(qspan - q, tspan - t) + 1))
            parts.append(f"{L}M")
            q += L
            t += L
        elif kind == 1 and q < qspan:
            L = int(rng.integers(1, qspan - q + 1))
            parts.append(f"{L}I")
            q += L
        elif t < tspan:
            L = int(rng.integers(1, tspan - t + 1))
            parts.append(f"{L}D")
            t += L
    return "".join(parts)


def rand_record(rng) -> str:
    qn = NAMES[rng.integers(0, len(NAMES))]
    tn = NAMES[rng.integers(0, len(NAMES))]
    ql, tl = int(rng.integers(50, 2000)), int(rng.integers(50, 2000))
    qs = int(rng.integers(0, ql))
    qe = int(rng.integers(qs, ql + 1))
    ts = int(rng.integers(0, tl))
    te = int(rng.integers(ts, tl + 1))
    st = "+-"[rng.integers(0, 2)]
    tags = []
    r = rng.integers(0, 8)
    if r & 1:
        tags.append(f"AS:i:{int(rng.integers(-5, 5000))}")
    if r & 2:
        tags.append(f"tl:i:{int(rng.integers(1, 5))}")
    if r & 4:
        tags.append("tp:A:" + "PSI"[rng.integers(0, 3)])
    kind = rng.integers(0, 10)
    if kind < 6:
        tags.append("cg:Z:" + rand_cigar(rng, qe - qs, te - ts))
    elif kind < 7:
        pass                                    # no cigar
    elif kind < 8:
        tags.append(f"cg:Z:{qe - qs + 1}M")     # span mismatch
    else:
        tags.append("cg:Z:5M3Q")                # bad op char
    # occasional coordinate corruption
    if rng.integers(0, 12) == 0:
        qs, qe = qe + 1, qs                     # qstart > qend
    line = (f"{qn}\t{ql}\t{qs}\t{qe}\t{st}\t{tn}\t{tl}\t{ts}\t{te}"
            f"\t{max(qe - qs, 0)}\t{max(qe - qs, 1)}\t60")
    if tags:
        line += "\t" + "\t".join(tags)
    return line + "\n"


def rand_input(rng) -> bytes:
    n = int(rng.integers(1, 25))
    lines = [rand_record(rng) for _ in range(n)]
    # occasional structural junk
    j = rng.integers(0, 10)
    if j == 0:
        lines.insert(int(rng.integers(0, len(lines) + 1)), "\n")
    elif j == 1:
        lines.insert(int(rng.integers(0, len(lines) + 1)), "a\tb\tc\n")
    elif j == 2:
        k = int(rng.integers(0, len(lines)))
        lines[k] = lines[k].replace("\t+\t", "\t*\t").replace("\t-\t",
                                                              "\t*\t")
    return "".join(lines).encode()


CMDS = [["dedupe"], ["dedupe", "-a"], ["invert"], ["filter"],
        ["filter", "-u", "0.9"], ["trim"], ["shatter"], ["dechunk"],
        ["to_bed"], ["tile"], ["chain"]]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    bins = build_reference()
    if bins is None:
        print("no reference build available", file=sys.stderr)
        return 1
    bad = 0
    for rnd in range(args.rounds):
        rng = np.random.default_rng(args.seed + rnd)
        data = rand_input(rng)
        for cmd in CMDS:
            a = subprocess.run([bins["paffy"], *cmd], input=data,
                               capture_output=True, timeout=60, env=ENV)
            b = subprocess.run([str(REPO / "bin" / "paffy"), *cmd],
                               input=data, capture_output=True, timeout=120,
                               env=ENV)
            c = subprocess.run([str(REPO / "bin" / "paffy"), *cmd],
                               input=data, capture_output=True, timeout=120,
                               env={**ENV, "PAFFY_TPU_NO_FAST": "1"})
            ok_rc = (a.returncode == 0) == (b.returncode == 0) == \
                (c.returncode == 0)
            # chain's equal-score ordering is a documented divergence:
            # compare sorted lines there, byte-else
            if cmd == ["chain"]:
                eq = sorted(a.stdout.splitlines()) == \
                    sorted(b.stdout.splitlines()) and b.stdout == c.stdout
            else:
                eq = a.stdout == b.stdout == c.stdout
            if not (ok_rc and eq):
                bad += 1
                print(f"DIVERGENCE seed={args.seed + rnd} cmd={cmd} "
                      f"rc=({a.returncode},{b.returncode},{c.returncode}) "
                      f"lens=({len(a.stdout)},{len(b.stdout)},{len(c.stdout)})")
                path = f"/tmp/fuzz_div_{args.seed + rnd}.paf"
                open(path, "wb").write(data)
                print(f"  input saved: {path}")
    print(f"{args.rounds} rounds x {len(CMDS)} commands: "
          f"{'all agree' if not bad else f'{bad} divergences'}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())

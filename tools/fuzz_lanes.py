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
        # include the sentinel edges: INT_MAX suppresses AS on re-emit
        # (impl/paf.c:349), negatives survive
        v = [int(rng.integers(-5, 5000)), -1, 0, 2147483647][
            rng.integers(0, 4)]
        tags.append(f"AS:i:{v}")
    if r & 2:
        # -1 is the "absent" sentinel for tl/cn/s1 — a literal -1 tag
        # must vanish on re-emit on both sides
        tags.append(f"tl:i:{[1, 2, 3, -1][rng.integers(0, 4)]}")
    if r & 4:
        tags.append("tp:A:" + "PSI"[rng.integers(0, 3)])
    if rng.integers(0, 4) == 0:
        tags.append(f"cn:i:{[7, -1][rng.integers(0, 2)]}")
    if rng.integers(0, 4) == 0:
        tags.append(f"s1:i:{[12345, -1][rng.integers(0, 2)]}")
    kind = rng.integers(0, 10)
    if kind < 6:
        tags.append("cg:Z:" + rand_cigar(rng, qe - qs, te - ts))
        if rng.integers(0, 20) == 0:
            # op-free cigar tag text is impossible (cg:Z: + empty ->
            # treated as no tag by both) but a 0M-only cigar is the
            # zero-length-op class
            tags[-1] = "cg:Z:0M"
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
    # force exact duplicates and inverse-style repeats for dedupe
    if n > 2 and rng.integers(0, 3) == 0:
        lines.append(lines[int(rng.integers(0, len(lines)))])
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


def rand_fasta(rng) -> str:
    """Random FASTA: ACGTN + lowercase, wrapped and unwrapped lines,
    1-6 sequences of 0-4000 bases."""
    out = []
    for k in range(int(rng.integers(1, 7))):
        n = int(rng.integers(0, 4000))
        seq = "".join(np.array(list("ACGTNacgtn"))[
            rng.integers(0, 10, n)]) if n else ""
        out.append(f">seq{k}\n")
        width = int(rng.integers(0, 3))
        if width == 0 or not seq:
            out.append(seq + "\n")
        else:
            w = [60, 80][width - 1]
            out.append("\n".join(seq[i:i + w]
                                 for i in range(0, len(seq), w)) + "\n")
    return "".join(out)


def fuzz_faffy(bins, rng, tmp: pathlib.Path):
    """chunk -> compare dirs+listing; merge the chunk list -> compare;
    extract a random bed -> compare.  Returns a divergence string or None."""
    import shutil
    fa = tmp / "f.fa"
    fa.write_text(rand_fasta(rng))
    c = int(rng.integers(2, 3000))
    o = int(rng.integers(0, c))
    outs = {}
    for tag, binpath in (("ref", bins["faffy"]),
                         ("ours", str(REPO / "bin" / "faffy"))):
        d = tmp / f"ch_{tag}"
        shutil.rmtree(d, ignore_errors=True)
        r = subprocess.run([binpath, "chunk", "-d", str(d), "-c", str(c),
                            "-o", str(o), str(fa)], capture_output=True,
                           timeout=120, env=ENV)
        blob = b"" if not d.exists() else b"".join(
            p.read_bytes() for p in sorted(d.iterdir()))
        outs[tag] = (r.returncode == 0,
                     [pathlib.Path(x).name for x in r.stdout.decode().split()],
                     blob)
    if outs["ref"] != outs["ours"]:
        return f"faffy chunk -c {c} -o {o}"
    if not outs["ref"][0]:
        return None
    # merge the reference's chunk list (absolute paths)
    lst = tmp / "list"
    lst.write_text("\n".join(str(tmp / "ch_ref" / n)
                             for n in outs["ref"][1]) + "\n")
    a = subprocess.run([bins["faffy"], "merge", "-i", str(lst)],
                       capture_output=True, timeout=120, env=ENV)
    b = subprocess.run([str(REPO / "bin" / "faffy"), "merge", "-i",
                        str(lst)], capture_output=True, timeout=120, env=ENV)
    if (a.returncode == 0) != (b.returncode == 0) or a.stdout != b.stdout:
        return f"faffy merge (-c {c} -o {o})"
    # extract random rows (in-bounds and out-of-bounds)
    rows = []
    for _ in range(int(rng.integers(1, 8))):
        s = int(rng.integers(0, 4000))
        e = s + int(rng.integers(1, 500))
        rows.append(f"seq{int(rng.integers(0, 7))}\t{s}\t{e}")
    bed = tmp / "b.bed"
    bed.write_text("\n".join(rows) + "\n")
    a = subprocess.run([bins["faffy"], "extract", "-i", str(bed), str(fa)],
                       capture_output=True, timeout=120, env=ENV)
    b = subprocess.run([str(REPO / "bin" / "faffy"), "extract", "-i",
                        str(bed), str(fa)], capture_output=True, timeout=120,
                       env=ENV)
    if (a.returncode == 0) != (b.returncode == 0) or a.stdout != b.stdout:
        return "faffy extract"
    return None


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
    import tempfile
    ftmp = pathlib.Path(tempfile.mkdtemp(prefix="fuzz_faffy_"))
    for rnd in range(args.rounds):
        rng = np.random.default_rng(10_000 + args.seed + rnd)
        div = fuzz_faffy(bins, rng, ftmp)
        if div:
            bad += 1
            print(f"FAFFY DIVERGENCE seed={10_000 + args.seed + rnd}: {div}")
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
            # chain ids (cn) encode that order, so compare the sorted
            # line multiset with cn stripped; lanes stay byte-locked
            if cmd == ["chain"]:
                import re
                strip = lambda x: sorted(
                    re.sub(rb"\tcn:i:\d+", b"", x).splitlines())
                eq = strip(a.stdout) == strip(b.stdout) \
                    and b.stdout == c.stdout
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

"""CLI audit: time every paffy/faffy subcommand against the compiled
reference binary on an N-fold golden workload, asserting byte-identical
output.

Methodology (docs/PERF_NOTES.md "interleaved e2e timing"): this host is a
shared 2-vCPU VM whose available bandwidth swings minute to minute, so the
two binaries are timed INTERLEAVED (ref, ours, ref, ours, ...) and the
min over iterations is reported for each.  Commands run with
PAFFY_TPU_PLATFORM=cpu (the host production routes; device routing is
bench.py's job).

Usage: python tools/cli_audit.py [--fold 16] [--iters 3] [--json]
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from tools.refbuild.build import build_reference  # noqa: E402

def run_once(cmd, out_path, env) -> float:
    t0 = time.perf_counter()
    with open(out_path, "wb") as fh:
        subprocess.run(cmd, stdout=fh, stderr=subprocess.DEVNULL,
                       env=env, check=True)
    return time.perf_counter() - t0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fold", type=int, default=16)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args(argv)

    bins = build_reference()
    if bins is None:
        print("no toolchain / reference; cannot audit", file=sys.stderr)
        return 1
    repo = pathlib.Path(__file__).resolve().parent.parent
    ours = str(repo / "bin" / "paffy")

    tmp = pathlib.Path(tempfile.mkdtemp(prefix="cli_audit_"))
    # the renamed-golden workload + deterministic synthesized FASTA from
    # tests/goldenwork (same fixture the snapshot/diff suites use)
    from tests.goldenwork import renamed_golden_text, synth_golden_seqs
    text = renamed_golden_text()
    work = tmp / f"g{args.fold}.paf"
    work.write_bytes(text.encode() * args.fold)
    fa = tmp / "seqs.fa"
    with open(fa, "w") as fh:
        for nm, s in synth_golden_seqs().items():
            fh.write(f">{nm}\n{s}\n")

    env = dict(os.environ, PAFFY_TPU_PLATFORM="cpu")
    # (name, extra argv) — every streaming/whole-file paffy command that
    # writes PAF/BED/text to -o
    cases = [
        ("view", ["-s", "-t", str(fa)]),
        ("chain", []),
        ("tile", []),
        ("to_bed", []),
        ("invert", []),
        ("shatter", []),
        ("dedupe", []),
        ("trim", []),
        ("filter", []),
        ("add_mismatches", [str(fa)]),
    ]
    ours_f = str(repo / "bin" / "faffy")
    # faffy workloads: chunk the FASTA (dir compared), merge the reference's
    # own chunk list, extract a deterministic BED
    import random
    rnd = random.Random(4)
    bed = []
    from tests.goldenwork import synth_golden_seqs as _sgs  # noqa: F811
    for nm in ("q_chr10", "t_chr10"):
        p = 0
        while p < 8_000_000:
            p += rnd.randint(500, 5000)
            bed.append(f"{nm}\t{p}\t{p + rnd.randint(100, 1500)}")
    bedf = tmp / "ex.bed"
    bedf.write_text("\n".join(bed) + "\n")
    chunk_args = ["-c", "1000000", "-o", "10000", str(fa)]

    def run_chunk(binpath, who):
        d = tmp / f"chunk_{who}"
        shutil.rmtree(d, ignore_errors=True)
        t0 = time.perf_counter()
        out = subprocess.run([binpath, "chunk", "-d", str(d)] + chunk_args,
                             capture_output=True, env=env, check=True)
        dt = time.perf_counter() - t0
        # filename-ordered concatenation: chunk dirs compare as one blob
        (tmp / f"{who}_faffy_chunk.out").write_bytes(
            b"".join(p.read_bytes() for p in sorted(d.iterdir())))
        if who == "ref":
            (tmp / "chunklist").write_bytes(out.stdout)
        return dt

    faffy_cases = [
        ("faffy_merge", lambda b: ["merge", "-i", str(tmp / "chunklist")]),
        ("faffy_extract", lambda b: ["extract", "-i", str(bedf), str(fa)]),
    ]
    rows = []
    results: dict[tuple[str, str], list[float]] = {}
    for it in range(args.iters):
        for name, extra in cases:
            for who, binpath in (("ref", bins["paffy"]), ("our", ours)):
                out = tmp / f"{who}_{name}.out"
                cmd = [binpath, name, "-i", str(work)] + extra
                results.setdefault((who, name), []).append(
                    run_once(cmd, out, env))
        for who, binpath in (("ref", bins["faffy"]), ("our", ours_f)):
            results.setdefault((who, "faffy_chunk"), []).append(
                run_chunk(binpath, who))
        for name, argfn in faffy_cases:
            for who, binpath in (("ref", bins["faffy"]), ("our", ours_f)):
                out = tmp / f"{who}_{name}.out"
                results.setdefault((who, name), []).append(
                    run_once([binpath] + argfn(binpath), out, env))
    all_cases = ([n for n, _ in cases] + ["faffy_chunk"]
                 + [n for n, _ in faffy_cases])
    for name in all_cases:
        r = min(results[("ref", name)])
        o = min(results[("our", name)])
        same = ((tmp / f"ref_{name}.out").read_bytes()
                == (tmp / f"our_{name}.out").read_bytes())
        rows.append({"cmd": name, "ref_s": round(r, 3),
                     "ours_s": round(o, 3),
                     "ratio": round(o / r, 2), "identical": same})
    if args.json:
        print(json.dumps(rows))
    else:
        print(f"{'cmd':16s} {'ref':>7s} {'ours':>7s} {'ratio':>7s}  identical")
        for row in rows:
            print(f"{row['cmd']:16s} {row['ref_s']:7.2f} {row['ours_s']:7.2f}"
                  f" {row['ratio']:6.2f}x  {row['identical']}")
    bad = [r["cmd"] for r in rows if not r["identical"]]
    if bad:
        print(f"OUTPUT MISMATCH: {bad}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())

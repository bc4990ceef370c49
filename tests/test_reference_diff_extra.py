"""Direct reference-vs-ours byte diffs on flag combinations BEYOND the
pinned snapshot matrix: both the compiled reference binary (tools/refbuild/)
and our CLI run the same inputs with the same flags, outputs compared
byte-for-byte (no pinned hashes — the reference itself is the expectation).

Covers the parameter surface the snapshot matrix leaves open: trim modes,
chain gap params on linked input, filter thresholds incl. -x and tile-level
caps, to_bed -e/-b/-m/-q variants, split_file -m bin packing, chunk size /
overlap variants, extract flank/minSize edges, dechunk side restriction.
"""

import contextlib
import io
import pathlib
import subprocess
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent
                       / "tools" / "refbuild"))
from build import build_reference  # noqa: E402

from paffy_tpu.cli import paffy_main, faffy_main  # noqa: E402

# reuse the workspace fixtures (golden/renamed/fasta) from the main suite
from test_reference_diff import env, ref  # noqa: E402,F401


def run_ours(cmd, *argv, out: pathlib.Path) -> bytes:
    main = paffy_main if cmd == "paffy" else faffy_main
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main([*argv, "-o", str(out)])
    assert rc == 0, f"ours: {cmd} {argv} -> rc {rc}"
    return out.read_bytes()


def run_theirs(binary, *argv, out: pathlib.Path) -> bytes:
    r = subprocess.run([binary, *argv, "-o", str(out)],
                       capture_output=True, timeout=1200)
    assert r.returncode == 0, (
        f"reference {argv} -> rc {r.returncode}\n{r.stderr.decode()[-1500:]}")
    return out.read_bytes()


def diff(ref_bins, which, tmp, label, *argv):
    ours = run_ours(which, *argv, out=tmp / f"{label}.ours")
    theirs = run_theirs(ref_bins[which.replace("faffy", "faffy")
                                .replace("paffy", "paffy")],
                        *argv, out=tmp / f"{label}.ref")
    assert ours == theirs, (
        f"{label}: ours ({len(ours)} B) != reference ({len(theirs)} B) "
        f"for: {which} {' '.join(argv)}")


@pytest.fixture(scope="module")
def shat2000(ref, env, tmp_path_factory):
    d = tmp_path_factory.mktemp("shat")
    out = d / "sh.paf"
    run_theirs(ref["paffy"], "shatter", "-i", env["golden"], out=out)
    head = d / "sh2000.paf"
    head.write_bytes(b"".join(out.read_bytes()
                              .splitlines(keepends=True)[:2000]))
    return str(head)


def test_trim_param_sweep(ref, env, tmp_path):
    for i, args in enumerate((["-r", "0.2"], ["-r", "0.01", "-t", "0.5"],
                              ["-f", "-t", "0.25"], ["-f", "-t", "0.9"])):
        diff(ref, "paffy", tmp_path, f"trim{i}",
             "trim", "-i", env["golden"], *args)


def test_chain_param_sweep(ref, env, shat2000, tmp_path):
    for i, args in enumerate((["-t", "0.5"], ["-g", "50000"],
                              ["-d", "1", "-e", "10"],
                              ["-g", "2000", "-t", "0.0"])):
        diff(ref, "paffy", tmp_path, f"chain{i}",
             "chain", "-i", shat2000, *args)


def test_filter_threshold_sweep(ref, env, shat2000, tmp_path):
    chained = tmp_path / "ch.paf"
    run_theirs(ref["paffy"], "chain", "-i", shat2000, out=chained)
    tiled = tmp_path / "ti.paf"
    run_theirs(ref["paffy"], "tile", "-i", str(chained), out=tiled)
    for i, args in enumerate((["-s", "5000"], ["-t", "500"],
                              ["-w", "1"], ["-w", "2", "-x"],
                              ["-u", "0.99"], ["-v", "0.95"],
                              ["-s", "5000", "-w", "1", "-x"])):
        diff(ref, "paffy", tmp_path, f"filter{i}",
             "filter", "-i", str(tiled), *args)


def test_to_bed_variant_sweep(ref, env, tmp_path):
    for i, args in enumerate((["-e"], ["-b"], ["-m", "2500"],
                              ["-n", "-b"],
                              ["-q", env["fasta"], "-f"])):
        diff(ref, "paffy", tmp_path, f"tobed{i}",
             "to_bed", "-i", env["renamed"], *args)


def test_dedupe_inverted_mix(ref, env, tmp_path):
    inv = tmp_path / "inv.paf"
    run_theirs(ref["paffy"], "invert", "-i", env["golden"], out=inv)
    g = pathlib.Path(env["golden"]).read_bytes()
    mixed = tmp_path / "mix.paf"
    mixed.write_bytes(inv.read_bytes() + g + inv.read_bytes())
    for i, args in enumerate(([], ["-a"])):
        diff(ref, "paffy", tmp_path, f"dedupe{i}",
             "dedupe", "-i", str(mixed), *args)


def test_split_file_binpack(ref, env, tmp_path):
    for i, m in enumerate(("1000000000", "200000000")):
        for side, us, them in (("t", tmp_path / f"sp{i}o", tmp_path / f"sp{i}r"),):
            us.mkdir(); them.mkdir()
            argv = ["split_file", "-i", env["golden"], "-m", m]
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                rc = paffy_main([*argv, "-p", str(us / "p_")])
            assert rc == 0
            r = subprocess.run([ref["paffy"], *argv, "-p", str(them / "p_")],
                               capture_output=True, timeout=600)
            assert r.returncode == 0, r.stderr.decode()[-800:]
            ours = {p.name: p.read_bytes() for p in us.iterdir()}
            theirs = {p.name: p.read_bytes() for p in them.iterdir()}
            assert ours == theirs, f"split_file -m {m} directory mismatch"


def test_faffy_chunk_variants(ref, env, tmp_path):
    for i, (c, o) in enumerate((("50000000", "1000000"),
                                ("123456789", "0"))):
        outs = []
        for tag, runner in (("ours", None), ("ref", ref["faffy"])):
            d = tmp_path / f"ch{i}{tag}"
            argv = ["chunk", env["fasta"], "-d", str(d), "-c", c, "-o", o]
            if runner is None:
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    rc = faffy_main(argv)
                assert rc == 0
                listing = buf.getvalue()
            else:
                r = subprocess.run([runner, *argv], capture_output=True,
                                   timeout=600, text=True)
                assert r.returncode == 0, r.stderr[-800:]
                listing = r.stdout
            files = [ln for ln in listing.splitlines() if ln.strip()]
            outs.append([(pathlib.Path(f).name, pathlib.Path(f).read_bytes())
                         for f in files])
        assert outs[0] == outs[1], f"chunk -c {c} -o {o} mismatch"


def test_faffy_extract_edges(ref, env, tmp_path):
    bed_src = tmp_path / "cov.bed"
    run_theirs(ref["paffy"], "to_bed", "-i", env["renamed"], "-m", "5000",
               out=bed_src)
    lines = [ln.split() for ln in bed_src.read_bytes().decode().splitlines()]
    bed = tmp_path / "sel.bed"
    bed.write_text("".join(f"{c[0]}\t{c[1]}\t{c[2]}\n"
                           for c in lines[::11] if int(c[3]) > 0))
    for i, args in enumerate((["-f", "0", "-m", "1"],
                              ["-f", "100000", "-m", "1"],
                              ["-n"])):
        diff(ref, "faffy", tmp_path, f"extract{i}",
             "extract", env["fasta"], "-i", str(bed), *args)


def test_dechunk_side_restriction(ref, env, tmp_path):
    # build fragment-space PAF via upconvert, then dechunk each side alone
    bed = tmp_path / "spans.bed"
    from paffy_tpu.core import pafio
    t = pafio.read_paf_file(env["renamed"])
    with open(bed, "w") as fh:
        for i in range(len(t)):
            fh.write(f"{t.qname[i]}\t{t.qstart[i]}\t{t.qend[i]}\n")
            fh.write(f"{t.tname[i]}\t{t.tstart[i]}\t{t.tend[i]}\n")
    frags = tmp_path / "frags.fa"
    run_theirs(ref["faffy"], "extract", env["fasta"], "-i", str(bed),
               "-f", "100", out=frags)
    up = tmp_path / "up.paf"
    run_theirs(ref["paffy"], "upconvert", "-i", env["renamed"], str(frags),
               out=up)
    for i, args in enumerate((["-q"], ["-t"], [])):
        diff(ref, "paffy", tmp_path, f"dechunk{i}",
             "dechunk", "-i", str(up), *args)

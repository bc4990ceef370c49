"""CLI command tests — hermetic re-creation of the reference shell suite
(tests/paf_tools_test.sh) on synthetic data: every paffy command exercised
through its real argv interface with identity/aligned-bases oracles."""

import os
import subprocess
import sys

import numpy as np
import pytest

from paffy_tpu.cli import paffy_main, faffy_main
from paffy_tpu.core import pafio
from synthdata import make_workload

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def workload(tmp_path_factory):
    d = tmp_path_factory.mktemp("wl")
    seqs, lines = make_workload(seed=1)
    fasta = d / "seqs.fa"
    with open(fasta, "w") as fh:
        for name, s in seqs.items():
            fh.write(f">{name}\n{s}\n")
    paf = d / "in.paf"
    paf.write_text("\n".join(lines) + "\n")
    return {"dir": d, "fasta": str(fasta), "paf": str(paf),
            "n_records": len(lines)}


def run(cmd, *argv):
    main = paffy_main if cmd == "paffy" else faffy_main
    return main(list(argv))


def read(path):
    return pafio.read_paf_file(path)


def test_view_stats_oracle(workload, capsys):
    rc = run("paffy", "view", "-i", workload["paf"], workload["fasta"],
             "-s", "-t", "-u", "0.9", "-v", "10000")
    assert rc == 0
    outp = capsys.readouterr().out
    assert outp.startswith("Total-alignments:")
    assert f"Total-alignments:{workload['n_records']}" in outp


def test_view_per_record_and_alignment(workload, tmp_path):
    out = tmp_path / "view.txt"
    rc = run("paffy", "view", "-i", workload["paf"], workload["fasta"],
             "-a", "-o", str(out))
    assert rc == 0
    text = out.read_text()
    assert text.count("Query:") == workload["n_records"]
    # alignment rows present and star lines mark identities
    assert "*" in text


def test_view_native_line_format_matches_python(workload):
    """The native batch formatter must be byte-identical to the per-record
    Python path, including the NaN identity cases (0 aligned bases)."""
    import io
    from paffy_tpu import native
    from paffy_tpu.commands.view import pretty_print_record
    from paffy_tpu.ops.transforms import stats_calc
    t = read(workload["paf"])
    stats = {k: v.copy() for k, v in stats_calc(t).items()}
    # force NaN identity / identity-with-gaps rows
    stats["matches"][0] = 0
    stats["mismatches"][0] = 0
    stats["query_insert_bases"][0] = 0
    stats["query_delete_bases"][0] = 0
    buf = io.StringIO()
    for i in range(len(t)):
        pretty_print_record(t, i, stats, buf, False, None)
    vals = np.column_stack([
        t.qstart, t.qend, t.tstart, t.tend, t.strand.astype(np.int64),
        t.score, stats["matches"], stats["mismatches"],
        stats["query_inserts"], stats["query_deletes"],
        stats["query_insert_bases"], stats["query_delete_bases"]])
    blob = native.view_stats_lines(t.qname, t.tname, vals)
    if blob is None:
        pytest.skip("native toolchain unavailable")
    assert blob.decode("latin-1") == buf.getvalue()


def test_view_identity_threshold_fails(workload, capsys):
    rc = run("paffy", "view", "-i", workload["paf"], workload["fasta"],
             "-s", "-t", "-u", "0.9999")
    capsys.readouterr()
    assert rc == 1


def test_invert_roundtrip_cli(workload, tmp_path):
    a = tmp_path / "a.paf"
    b = tmp_path / "b.paf"
    assert run("paffy", "invert", "-i", workload["paf"], "-o", str(a)) == 0
    assert run("paffy", "invert", "-i", str(a), "-o", str(b)) == 0
    t0 = read(workload["paf"])
    t1 = read(str(b))
    assert pafio.serialize_paf(t0) == pafio.serialize_paf(t1)


def test_shatter_cli(workload, tmp_path, capsys):
    out = tmp_path / "sh.paf"
    assert run("paffy", "shatter", "-i", workload["paf"], "-o", str(out)) == 0
    t = read(str(out))
    assert len(t) > 0
    assert all((t.off[1:] - t.off[:-1]) == 1)
    rc = run("paffy", "view", "-i", str(out), workload["fasta"],
             "-s", "-t", "-u", "0.9")
    capsys.readouterr()
    assert rc == 0


def test_dedupe_cli(workload, tmp_path):
    out = tmp_path / "dd.paf"
    assert run("paffy", "dedupe", "-i", workload["paf"], "-o", str(out)) == 0
    t = read(str(out))
    assert len(t) == workload["n_records"] - 1  # one exact duplicate injected


def test_dedupe_check_inverse_cli(workload, tmp_path):
    inv = tmp_path / "inv.paf"
    comb = tmp_path / "comb.paf"
    out = tmp_path / "ddi.paf"
    assert run("paffy", "invert", "-i", workload["paf"], "-o", str(inv)) == 0
    comb.write_text(open(workload["paf"]).read() + open(inv).read())
    assert run("paffy", "dedupe", "-a", "-i", str(comb), "-o", str(out)) == 0
    t = read(str(out))
    assert len(t) == workload["n_records"] - 1


def test_chain_cli(workload, tmp_path, capsys):
    out = tmp_path / "ch.paf"
    assert run("paffy", "chain", "-i", workload["paf"], "-o", str(out)) == 0
    t = read(str(out))
    assert len(t) == workload["n_records"]
    assert (t.chain_id >= 0).all() and (t.chain_score >= 0).all()
    assert list(t.score) == sorted(t.score, reverse=True)
    rc = run("paffy", "view", "-i", str(out), workload["fasta"],
             "-s", "-t", "-u", "0.9")
    capsys.readouterr()
    assert rc == 0


def test_tile_cli(workload, tmp_path):
    out = tmp_path / "tl.paf"
    assert run("paffy", "tile", "-i", workload["paf"], "-o", str(out)) == 0
    t = read(str(out))
    assert (t.tile_level >= 1).all()
    assert t.tile_level.max() >= 2  # overlapping windows stack


def test_trim_cli(workload, tmp_path, capsys):
    mm = tmp_path / "mm.paf"
    out = tmp_path / "tr.paf"
    assert run("paffy", "add_mismatches", "-i", workload["paf"],
               workload["fasta"], "-o", str(mm)) == 0
    assert run("paffy", "trim", "-r", "0.05", "-i", str(mm), "-o", str(out)) == 0
    t_in = read(str(mm))
    t_out = read(str(out))
    assert len(t_in) == len(t_out)
    # trim never grows spans
    assert ((t_out.qend - t_out.qstart) <= (t_in.qend - t_in.qstart)).all()


def test_trim_fixed_cli(workload, tmp_path):
    out = tmp_path / "trf.paf"
    assert run("paffy", "trim", "-f", "-t", "0.1", "-i", workload["paf"],
               "-o", str(out)) == 0
    t_in = read(workload["paf"])
    t_out = read(str(out))
    shrink = (t_in.qend - t_in.qstart) - (t_out.qend - t_out.qstart)
    assert (shrink >= 0).all() and shrink.sum() > 0


def test_add_then_remove_mismatches_cli(workload, tmp_path):
    mm = tmp_path / "mm.paf"
    back = tmp_path / "back.paf"
    assert run("paffy", "add_mismatches", "-i", workload["paf"],
               workload["fasta"], "-o", str(mm)) == 0
    t = read(str(mm))
    from paffy_tpu.core.model import MATCH
    assert not (t.ops == MATCH).any()   # all Ms re-encoded
    assert run("paffy", "add_mismatches", "-a", "-i", str(mm),
               "-o", str(back)) == 0
    t0 = read(workload["paf"])
    t2 = read(str(back))
    assert pafio.serialize_paf(t0) == pafio.serialize_paf(t2)


def test_filter_cli(workload, tmp_path):
    hi = tmp_path / "hi.paf"
    lo = tmp_path / "lo.paf"
    t0 = read(workload["paf"])
    cutoff = int(np.median(t0.score))
    assert run("paffy", "filter", "-i", workload["paf"], "-t", str(cutoff),
               "-o", str(hi)) == 0
    assert run("paffy", "filter", "-i", workload["paf"], "-t", str(cutoff),
               "-x", "-o", str(lo)) == 0
    t_hi, t_lo = read(str(hi)), read(str(lo))
    assert len(t_hi) + len(t_lo) == len(t0)
    assert (t_hi.score >= cutoff).all()
    assert (t_lo.score < cutoff).all()


def test_to_bed_cli(workload, tmp_path):
    bed = tmp_path / "o.bed"
    assert run("paffy", "to_bed", "-i", workload["paf"], "-o", str(bed)) == 0
    rows = [l.split(" ") for l in bed.read_text().splitlines()]
    assert all(len(r) == 4 for r in rows)
    bedb = tmp_path / "b.bed"
    assert run("paffy", "to_bed", "-i", workload["paf"], "-b", "-o", str(bedb)) == 0
    assert all(int(l.split(" ")[3]) <= 1 for l in bedb.read_text().splitlines())
    bede = tmp_path / "e.bed"
    assert run("paffy", "to_bed", "-i", workload["paf"], "-e", "-o", str(bede)) == 0
    assert all(int(l.split(" ")[3]) > 0 for l in bede.read_text().splitlines())
    # -n adds target-side coverage rows
    bedn = tmp_path / "n.bed"
    assert run("paffy", "to_bed", "-i", workload["paf"], "-e", "-n", "-o", str(bedn)) == 0
    assert len(bedn.read_text().splitlines()) >= len(bede.read_text().splitlines())


def test_split_file_cli(workload, tmp_path):
    prefix = str(tmp_path) + "/sp_"
    assert run("paffy", "split_file", "-q", "-i", workload["paf"],
               "-p", prefix) == 0
    t0 = read(workload["paf"])
    produced = sorted(p for p in os.listdir(tmp_path) if p.startswith("sp_"))
    assert len(produced) == len(set(t0.qname))
    total = sum(len(read(str(tmp_path / p))) for p in produced)
    assert total == len(t0)


def test_split_file_binpack(tmp_path):
    # three small contigs of length 40 with minLength 100: first two pack into
    # small_0 (80 <= 100), third opens small_1 (120 > 100)
    lines = [f"q\t1000\t0\t10\t+\tt{i}\t40\t0\t10\t10\t10\t60" for i in range(3)]
    paf = tmp_path / "s.paf"
    paf.write_text("\n".join(lines) + "\n")
    prefix = str(tmp_path) + "/bp_"
    assert run("paffy", "split_file", "-i", str(paf), "-p", prefix, "-m", "100") == 0
    assert sorted(p for p in os.listdir(tmp_path) if p.startswith("bp_")) == \
        ["bp_small_0.paf", "bp_small_1.paf"]
    assert len(read(str(tmp_path / "bp_small_0.paf"))) == 2
    assert len(read(str(tmp_path / "bp_small_1.paf"))) == 1


def test_bin_scripts_subprocess(workload):
    env = dict(os.environ, PAFFY_TPU_PLATFORM="cpu")
    r = subprocess.run(
        [os.path.join(REPO, "bin", "paffy"), "invert",
         "-i", workload["paf"]],
        capture_output=True, text=True, env=env, timeout=240)
    assert r.returncode == 0, r.stderr
    assert len(r.stdout.splitlines()) == workload["n_records"]
    r = subprocess.run([os.path.join(REPO, "bin", "faffy")],
                       capture_output=True, text=True, env=env, timeout=240)
    assert "faffy" in r.stderr


def test_dedupe_inverse_transitivity(tmp_path):
    # A kept; inverse(A) dropped via -a; an exact copy of inverse(A) later is
    # also dropped (kept-set vs seen-set equivalence of the vectorized path)
    lines = [
        "q\t100\t0\t50\t+\tt\t200\t10\t60\t50\t50\t60",
        "t\t200\t10\t60\t+\tq\t100\t0\t50\t50\t50\t60",   # inverse of A
        "t\t200\t10\t60\t+\tq\t100\t0\t50\t50\t50\t60",   # copy of the dropped one
        "q\t100\t1\t50\t-\tt\t200\t10\t60\t49\t49\t60",   # distinct record
    ]
    paf = tmp_path / "d.paf"
    paf.write_text("\n".join(lines) + "\n")
    out = tmp_path / "o.paf"
    assert run("paffy", "dedupe", "-a", "-i", str(paf), "-o", str(out)) == 0
    t = read(str(out))
    assert len(t) == 2
    assert t.qname[0] == "q" and t.qname[1] == "q"


def test_streaming_batches_do_not_change_output(workload, tmp_path, monkeypatch):
    from paffy_tpu.commands import common
    outs = {}
    for bb in (None, 700):   # 700 bytes => many small batches
        if bb:
            monkeypatch.setattr(common, "BATCH_BYTES", bb)
        else:
            monkeypatch.setattr(common, "BATCH_BYTES", 256 * 1024 * 1024)
        d = tmp_path / f"b{bb}"
        d.mkdir()
        for cmd, argv in [
            ("invert", []),
            ("shatter", []),
            ("dedupe", ["-a"]),
            ("trim", []),
            ("filter", ["-t", "100"]),
            ("add_mismatches", [workload["fasta"]]),
            ("to_bed", []),
        ]:
            out = d / f"{cmd}.out"
            assert run("paffy", cmd, "-i", workload["paf"], "-o", str(out),
                       *argv) == 0
            outs.setdefault(cmd, []).append(out.read_text())
    for cmd, pair in outs.items():
        assert pair[0] == pair[1], f"{cmd} output changed with batch size"

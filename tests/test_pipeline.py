"""End-to-end pipeline tests — hermetic re-creations of the reference shell
suites (tests/paf_pipeline_test.sh, tests/faf_paf_chunking_test.sh,
tests/fasta_chunk_and_merge_test.c, tests/fasta_extract_test.c)."""

import os
import numpy as np
import pytest

from paffy_tpu.cli import paffy_main, faffy_main
from paffy_tpu.core import pafio
from paffy_tpu.core.fasta import read_fasta_list, read_fasta
from synthdata import make_workload, cut_window, cigar_str


def run(cmd, *argv):
    main = paffy_main if cmd == "paffy" else faffy_main
    return main(list(argv))


def test_full_pipeline(tmp_path, capsys):
    """invert -> cat -> split_file -q -> per-shard add_mismatches|chain|tile|
    trim -> cat -> view -s oracle -> filter -w 1 -> chain -> filter -s ->
    final view oracle (tests/paf_pipeline_test.sh)."""
    seqs, lines = make_workload(seed=5, length=30000, n_windows=30,
                                window=3000, step=950)
    fasta = tmp_path / "seqs.fa"
    with open(fasta, "w") as fh:
        for name, s in seqs.items():
            fh.write(f">{name}\n{s}\n")
    lastz = tmp_path / "lastz.paf"
    lastz.write_text("\n".join(lines) + "\n")

    inv = tmp_path / "inv.paf"
    assert run("paffy", "invert", "-i", str(lastz), "-o", str(inv)) == 0
    comb = tmp_path / "comb.paf"
    comb.write_text(lastz.read_text() + inv.read_text())

    split_dir = tmp_path / "split"
    split_dir.mkdir()
    assert run("paffy", "split_file", "-q", "-i", str(comb),
               "-p", f"{split_dir}/") == 0
    shards = sorted(os.listdir(split_dir))
    assert len(shards) >= 2

    trimmed = tmp_path / "trimmed.paf"
    with open(trimmed, "w") as out:
        for shard in shards:
            mm = tmp_path / f"mm_{shard}"
            ch = tmp_path / f"ch_{shard}"
            tl = tmp_path / f"tl_{shard}"
            tr = tmp_path / f"tr_{shard}"
            assert run("paffy", "add_mismatches", "-i", str(split_dir / shard),
                       str(fasta), "-o", str(mm)) == 0
            assert run("paffy", "chain", "-i", str(mm), "-o", str(ch)) == 0
            assert run("paffy", "tile", "-i", str(ch), "-o", str(tl)) == 0
            assert run("paffy", "trim", "-i", str(tl), "-o", str(tr)) == 0
            out.write(tr.read_text())

    rc = run("paffy", "view", "-i", str(trimmed), str(fasta), "-s", "-t",
             "-u", "0.9", "-v", "30000")
    capsys.readouterr()
    assert rc == 0

    primary = tmp_path / "primary.paf"
    assert run("paffy", "filter", "-i", str(trimmed), "-w", "1",
               "-o", str(primary)) == 0
    t = pafio.read_paf_file(primary)
    assert len(t) > 0 and (t.tile_level <= 1).all()

    rechained = tmp_path / "rechained.paf"
    assert run("paffy", "chain", "-i", str(primary), "-o", str(rechained)) == 0
    final = tmp_path / "final.paf"
    assert run("paffy", "filter", "-i", str(rechained), "-s", "2000",
               "-o", str(final)) == 0
    rc = run("paffy", "view", "-i", str(final), str(fasta), "-s", "-t",
             "-u", "0.93", "-v", "20000")
    capsys.readouterr()
    assert rc == 0


def test_chunk_align_dechunk_dedupe(tmp_path, capsys):
    """faffy chunk -> per-chunk 'alignment' -> paffy dechunk -> paffy dedupe
    -> view oracle (tests/faf_paf_chunking_test.sh), with the chunk-pair
    alignments derived from the known true alignment."""
    seqs, _ = make_workload(seed=9, length=24000)
    anc, der = seqs["anc.chr1"], seqs["der.chr1"]
    f1 = tmp_path / "anc.fa"
    f1.write_text(f">anc.chr1\n{anc}\n")

    d1 = tmp_path / "chunks"
    import io
    import contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert run("faffy", "chunk", str(f1), "-c", "8000", "-o", "500",
                   "-d", str(d1)) == 0
    chunk_files = buf.getvalue().split()
    assert chunk_files and all(os.path.exists(c) for c in chunk_files)

    # every chunk header encodes name|len|start and the chunk sequence matches
    total_len = len(anc)
    for cf in chunk_files:
        for header, seq in read_fasta_list(cf):
            name, ln, start = header.rsplit("|", 2)
            assert name == "anc.chr1" and int(ln) == total_len
            assert anc[int(start): int(start) + len(seq)] == seq

    # fabricate per-chunk alignments in CHUNK coordinates from the true
    # alignment, then dechunk back to original coordinates
    _, ops = (der, None), None  # placeholder to keep names readable
    from synthdata import mutate_with_alignment
    rng = np.random.default_rng(9)
    anc2 = "".join(rng.choice(list("ACGT"), 24000))
    assert anc2 == anc  # same seed stream -> same ancestor
    der2, true_ops = mutate_with_alignment(rng, anc2)
    assert der2 == der

    paf_lines = []
    for cf in chunk_files:
        for header, seq in read_fasta_list(cf):
            _, ln, start = header.rsplit("|", 2)
            start = int(start)
            cw = cut_window(true_ops, start, start + len(seq))
            if cw is None:
                continue
            qs, qe, ts, te, sub = cw
            matches = sum(l for o, l in sub if o == "M")
            paf_lines.append(
                f"der.chr1\t{len(der)}\t{qs}\t{qe}\t+\t{header}\t{len(seq)}"
                f"\t{ts-start}\t{te-start}\t{matches}\t{matches}\t60"
                f"\tAS:i:{2*matches}\tcg:Z:{cigar_str(sub)}")
    chunked_paf = tmp_path / "chunked.paf"
    chunked_paf.write_text("\n".join(paf_lines) + "\n")

    dechunked = tmp_path / "dechunked.paf"
    assert run("paffy", "dechunk", "-t", "-i", str(chunked_paf),
               "-o", str(dechunked)) == 0
    t = pafio.read_paf_file(dechunked)
    assert set(t.tname) == {"anc.chr1"}
    assert (t.tlen == total_len).all()

    deduped = tmp_path / "deduped.paf"
    assert run("paffy", "dedupe", "-i", str(dechunked), "-o", str(deduped)) == 0

    fasta_all = tmp_path / "all.fa"
    with open(fasta_all, "w") as fh:
        for name, s in seqs.items():
            fh.write(f">{name}\n{s}\n")
    rc = run("paffy", "view", "-i", str(deduped), str(fasta_all), "-s", "-t",
             "-u", "0.9", "-v", "20000")
    capsys.readouterr()
    assert rc == 0


def test_chunk_merge_roundtrip(tmp_path):
    """chunk -> merge must reproduce the input sequences exactly
    (tests/fasta_chunk_and_merge_test.c:14-46)."""
    rng = np.random.default_rng(3)
    seqs = {f"s{i}": "".join(rng.choice(list("ACGT"), int(n)))
            for i, n in enumerate([5000, 1200, 9000, 30])}
    f = tmp_path / "in.fa"
    with open(f, "w") as fh:
        for name, s in seqs.items():
            fh.write(f">{name}\n{s}\n")
    d = tmp_path / "chunks"
    import io
    import contextlib
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert run("faffy", "chunk", str(f), "-c", "2000", "-o", "100",
                   "-d", str(d)) == 0
    chunk_list = tmp_path / "list.txt"
    chunk_list.write_text(buf.getvalue())
    merged = tmp_path / "merged.fa"
    assert run("faffy", "merge", "-i", str(chunk_list), "-o", str(merged)) == 0
    got = read_fasta(merged)
    assert got == seqs


def test_upconvert_inverts_dechunk(tmp_path):
    """extract fragments -> upconvert rewrites records into fragment frame;
    dechunk maps them back (impl/paf_upconvert.c round trip)."""
    seqs, lines = make_workload(seed=2, length=12000, n_windows=6,
                                window=2000, step=1700)
    anc = seqs["anc.chr1"]
    frag_fa = tmp_path / "frags.fa"
    # two extracted fragments covering the target space
    with open(frag_fa, "w") as fh:
        fh.write(f">anc.chr1|{len(anc)}|0\n{anc[:7000]}\n")
        fh.write(f">anc.chr1|{len(anc)}|7000\n{anc[7000:]}\n")
    paf = tmp_path / "in.paf"
    # keep only records fully within one fragment on the target side
    t = pafio.parse_paf_text("\n".join(lines) + "\n")
    keep = (t.tend <= 7000) | (t.tstart >= 7000)
    paf.write_text(pafio.serialize_paf(t.take(keep)))

    up = tmp_path / "up.paf"
    assert run("paffy", "upconvert", str(frag_fa), "-i", str(paf),
               "-o", str(up)) == 0
    tu = pafio.read_paf_file(up)
    assert all("|" in n for n in tu.tname)  # target side rewritten

    back = tmp_path / "back.paf"
    assert run("paffy", "dechunk", "-t", "-i", str(up), "-o", str(back)) == 0
    assert pafio.serialize_paf(pafio.read_paf_file(back)) == \
        pafio.serialize_paf(t.take(keep))


def test_extract_fuzz(tmp_path):
    """Property test for faffy extract: expected extracted bases marked with
    an independent model (port of tests/fasta_extract_test.c:14-105)."""
    rng = np.random.default_rng(0)
    for it in range(25):
        n_seqs = int(rng.integers(1, 4))
        seqs = {f"s{i}": "".join(rng.choice(list("ACGT"),
                                            int(rng.integers(50, 400))))
                for i in range(n_seqs)}
        f = tmp_path / f"in{it}.fa"
        with open(f, "w") as fh:
            for name, s in seqs.items():
                fh.write(f">{name}\n{s}\n")
        flank = int(rng.integers(0, 12))
        min_size = int(rng.integers(1, 30))
        bed_rows = []
        for _ in range(int(rng.integers(1, 8))):
            name = f"s{int(rng.integers(0, n_seqs))}"
            L = len(seqs[name])
            a = int(rng.integers(0, L))
            b = int(rng.integers(a, L + 1))
            bed_rows.append((name, a, b))
        bed = tmp_path / f"bed{it}.bed"
        bed.write_text("".join(f"{n}\t{a}\t{b}\n" for n, a, b in bed_rows))
        out = tmp_path / f"out{it}.fa"
        assert run("faffy", "extract", str(f), "-i", str(bed), "-o", str(out),
                   "-f", str(flank), "-m", str(min_size)) == 0
        # independent model: mark expected extracted bases
        marked = {name: np.zeros(len(s), dtype=bool) for name, s in seqs.items()}
        for name, a, b in bed_rows:
            if b - a >= min_size:
                lo = max(a - flank, 0)
                hi = min(b + flank, len(seqs[name]))
                marked[name][lo:hi] = True
        got = {}
        for header, seq in read_fasta_list(out):
            name, ln, start = header.rsplit("|", 2)
            assert int(ln) == len(seqs[name])
            got.setdefault(name, np.zeros(len(seqs[name]), dtype=bool))
            start = int(start)
            assert seqs[name][start:start + len(seq)] == seq
            got[name][start:start + len(seq)] = True
        for name in seqs:
            assert np.array_equal(got.get(name, marked[name] & False),
                                  marked[name]), f"iter {it} seq {name}"

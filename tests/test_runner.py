"""Fused sharded pipeline tests: shard count must not change results."""

import numpy as np

from paffy_tpu.core import pafio
from paffy_tpu.core.pafio import parse_paf_text
from paffy_tpu.parallel.runner import (run_pipeline, split_by_contig,
                                       assign_shards, concat_tables)
from synthdata import make_workload


def test_sharded_pipeline_deterministic():
    seqs, lines = make_workload(seed=8, length=16000, n_windows=16,
                                window=1800, step=950)
    t = parse_paf_text("\n".join(lines) + "\n")
    out1 = run_pipeline(t, seqs, n_shards=1)
    out3 = run_pipeline(t, seqs, n_shards=3)
    out8 = run_pipeline(t, seqs, n_shards=8)
    s1 = pafio.serialize_paf(out1)
    assert s1 == pafio.serialize_paf(out3)
    assert s1 == pafio.serialize_paf(out8)
    assert len(out1) == len(t)
    # pipeline tagged everything
    assert (out1.chain_id >= 0).all()
    assert (out1.tile_level >= 1).all()


def test_split_by_contig_first_seen_order():
    t = parse_paf_text(
        "b\t10\t0\t5\t+\tx\t10\t0\t5\t5\t5\t60\tcg:Z:5M\n"
        "a\t10\t0\t5\t+\tx\t10\t0\t5\t5\t5\t60\tcg:Z:5M\n"
        "b\t10\t2\t7\t+\tx\t10\t2\t7\t5\t5\t60\tcg:Z:5M\n")
    groups = split_by_contig(t, by_query=True)
    assert [list(g) for g in groups] == [[0, 2], [1]]


def test_assign_shards_balances():
    groups = [np.array([i]) for i in range(4)]
    shards = assign_shards(groups, [100, 90, 10, 5], 2)
    tot = sorted(sum([100, 90, 10, 5][g] for g in s) for s in shards)
    assert tot == [100, 105]


def test_concat_tables_roundtrip():
    seqs, lines = make_workload(seed=3)
    t = parse_paf_text("\n".join(lines) + "\n")
    half = len(t) // 2
    a = t.take(np.arange(half))
    b = t.take(np.arange(half, len(t)))
    c = concat_tables([a, b])
    assert pafio.serialize_paf(c) == pafio.serialize_paf(t)

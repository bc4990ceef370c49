"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import pytest

from paffy_tpu.core.pafio import parse_paf_text
from paffy_tpu.ops.mismatch import SequencePool, column_match_counts
from paffy_tpu.ops.transforms import stats_calc
from paffy_tpu.parallel.pipeline import (make_mesh, shard_records,
                                         sharded_view_stats,
                                         column_counts_multichip)
from synthdata import make_workload


@pytest.fixture(scope="module")
def cpu_devices():
    devs = jax.devices("cpu")
    if len(devs) < 8:
        pytest.skip("need 8 virtual CPU devices")
    return devs[:8]


@pytest.fixture(scope="module")
def workload():
    seqs, lines = make_workload(seed=4, length=8000, n_windows=20,
                                window=1200, step=330)
    t = parse_paf_text("\n".join(lines) + "\n")
    return t, SequencePool(seqs)


def test_sharded_stats_match_single_device(cpu_devices, workload):
    t, pool = workload
    mesh = make_mesh(cpu_devices)          # 4x2 data x seq
    m, x, totals = column_counts_multichip(t, pool, mesh)
    m1, x1 = column_match_counts(t, pool)
    assert np.array_equal(m, m1)
    assert np.array_equal(x, x1)
    assert int(totals[0]) == int(m1.sum())
    assert int(totals[1]) == int(x1.sum())


def test_mesh_shapes(cpu_devices):
    mesh = make_mesh(cpu_devices)
    assert mesh.shape["data"] * mesh.shape["seq"] == 8
    mesh2 = make_mesh(cpu_devices, dp=8, sp=1)
    assert mesh2.shape["data"] == 8


def test_data_only_mesh(cpu_devices, workload):
    t, pool = workload
    mesh = make_mesh(cpu_devices, dp=8, sp=1)
    m, x, _ = column_counts_multichip(t, pool, mesh)
    m1, x1 = column_match_counts(t, pool)
    assert np.array_equal(m, m1) and np.array_equal(x, x1)


def _hetero_workload():
    """Uneven workload: two geometries (short + long windows) under
    distinct contig names, so record groups carry very different column
    counts and the group count doesn't divide the record count."""
    all_lines = []
    seqs = {}
    for k, (seed, length, nw, w, st) in enumerate(
            [(7, 6000, 9, 700, 410), (8, 30000, 4, 9000, 5100)]):
        s, lines = make_workload(seed=seed, length=length, n_windows=nw,
                                 window=w, step=st)
        ren = {nm: f"{nm}.g{k}" for nm in s}
        seqs.update({ren[nm]: v for nm, v in s.items()})
        for ln in lines:
            f = ln.split("\t")
            f[0] = ren.get(f[0], f[0])
            f[5] = ren.get(f[5], f[5])
            all_lines.append("\t".join(f))
    t = parse_paf_text("\n".join(all_lines) + "\n")
    return t, SequencePool(seqs)


def test_uneven_groups_match_single_device(cpu_devices):
    """Group count that does not divide the record count + groups with
    wildly different column totals: sharded counts must still equal the
    single-device result exactly."""
    t, pool = _hetero_workload()
    mesh = make_mesh(cpu_devices)          # 4x2
    assert len(t) % mesh.shape["data"] != 0   # genuinely uneven groups
    m, x, totals = column_counts_multichip(t, pool, mesh)
    m1, x1 = column_match_counts(t, pool)
    assert np.array_equal(m, m1) and np.array_equal(x, x1)
    assert int(totals[0]) == int(m1.sum())


def test_mesh_shape_equivalence_4x2_vs_8x1(cpu_devices):
    """(4,2) and (8,1) meshes must produce identical per-record counts and
    totals (mesh shape is an execution choice, not a semantic one)."""
    t, pool = _hetero_workload()
    res = {}
    for dp, sp in ((4, 2), (8, 1), (2, 4)):
        mesh = make_mesh(cpu_devices, dp=dp, sp=sp)
        res[(dp, sp)] = column_counts_multichip(t, pool, mesh)
    m0, x0, tot0 = res[(4, 2)]
    for k, (m, x, tot) in res.items():
        assert np.array_equal(m, m0) and np.array_equal(x, x0), k
        assert np.array_equal(tot, tot0), k


def test_sharded_pipeline_uneven_byte_equal(cpu_devices):
    """Full fused pipeline over the heterogeneous workload: sharded output
    must be byte-identical to the single-device stage."""
    from paffy_tpu.core import pafio
    from paffy_tpu.parallel.runner import (pipeline_stage,
                                           sharded_pipeline_stage)
    t, pool = _hetero_workload()
    mesh = make_mesh(cpu_devices)
    ref = pafio.serialize_paf(pipeline_stage(t, pool))
    got = pafio.serialize_paf(sharded_pipeline_stage(t, pool, mesh))
    assert got == ref


def test_graft_entry_single_chip():
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    m, x = out
    assert m.shape == x.shape
    assert int(np.asarray(m).sum()) > 0


def test_graft_dryrun_multichip():
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)

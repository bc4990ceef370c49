"""Multi-chip sharded execution of the per-column pipeline.

The reference's parallelism is shell-level: split per contig, run pipelines
per shard, cat the results (SURVEY.md section 2.6).  The TPU-native
equivalent is a device mesh with two axes:

  * ``data`` — record shards (the split_file axis): each group of records
    gets its own column expansion; groups are laid out on the leading axis.
  * ``seq``  — alignment-column sharding within a record group (the
    chunk/overlap axis analog, SURVEY.md P4): the expanded column tensors are
    sharded along their column axis.

The step is written as plain jit + NamedSharding constraints: XLA inserts the
all-reduces for the cross-shard segment sums (per-record counts) and the
global stat reduction — the scaling-book recipe (mesh -> annotate ->
let XLA place collectives).  No model-parallel machinery is invented: a PAF
engine has no tensors to TP/PP/EP-shard (SURVEY.md section 2.6 P7); DP over
records + column sharding is the complete story.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from paffy_tpu.core.model import PafTable
from paffy_tpu.ops.mismatch import SequencePool, device_upper, device_comp_upper
from paffy_tpu.ops.segments import build_m_column_batch, bucket_size, pad_to


def make_mesh(devices=None, dp: int | None = None, sp: int | None = None) -> Mesh:
    """Build a (data, seq) mesh over the given (or all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if dp is None:
        # favor data parallelism; seq axis takes what divides evenly
        sp = sp or (2 if n % 2 == 0 and n > 1 else 1)
        dp = n // sp
    else:
        sp = sp or n // dp
    assert dp * sp == n, f"mesh {dp}x{sp} != {n} devices"
    return Mesh(np.asarray(devices).reshape(dp, sp), ("data", "seq"))


@dataclass
class ShardedColumnBatch:
    """Per-record-group column tensors stacked on a leading ``data`` axis.

    All groups share the same padded sizes so the stack is rectangular:
    lens/rec/qpos0/tpos0/rev are [G, mop_pad]; col_off is [G, mop_pad+1];
    n_cols is [G]; rec ids are LOCAL to the group ([0, rec_pad)).
    """

    lens: np.ndarray
    rec: np.ndarray
    qpos0: np.ndarray
    tpos0: np.ndarray
    rev: np.ndarray
    col_off: np.ndarray
    rec_col_off: np.ndarray       # [G, rec_pad+1] record column boundaries
    n_cols: np.ndarray
    group_of_record: np.ndarray   # [N] original record -> group
    index_in_group: np.ndarray    # [N] original record -> local slot
    c_pad: int
    rec_pad: int


def shard_records(t: PafTable, pool: SequencePool, n_groups: int) -> ShardedColumnBatch:
    """Split a batch into ``n_groups`` contiguous record groups and build a
    rectangular stacked column batch (the host-side sharding step; on a pod
    each host builds only its own groups)."""
    n = len(t)
    bounds = np.linspace(0, n, n_groups + 1).astype(np.int64)
    group_of_record = np.zeros(n, dtype=np.int64)
    index_in_group = np.zeros(n, dtype=np.int64)
    batches = []
    for g in range(n_groups):
        lo, hi = int(bounds[g]), int(bounds[g + 1])
        group_of_record[lo:hi] = g
        index_in_group[lo:hi] = np.arange(hi - lo)
        sub = t.take(np.arange(lo, hi))
        qoff = pool.offsets_for(sub.qname, "query")
        toff = pool.offsets_for(sub.tname, "target")
        batches.append(build_m_column_batch(sub, qoff, toff))
    mop_pad = max(len(b.lens) for b in batches)
    c_pad = bucket_size(max(max(b.n_cols for b in batches), 1))
    rec_pad = bucket_size(max(int(bounds[g + 1] - bounds[g])
                              for g in range(n_groups)), minimum=8)

    def stack(field, fill=0):
        return np.stack([pad_to(getattr(b, field), mop_pad, fill) for b in batches])

    col_off = np.stack([pad_to(b.col_off, mop_pad + 1, fill=b.col_off[-1])
                        for b in batches])
    rec_col_off = np.stack([pad_to(b.rec_col_off, rec_pad + 1, fill=b.n_cols)
                            for b in batches])
    return ShardedColumnBatch(
        lens=stack("lens"), rec=stack("rec"), qpos0=stack("qpos0"),
        tpos0=stack("tpos0"), rev=stack("rev", fill=False), col_off=col_off,
        rec_col_off=rec_col_off,
        n_cols=np.array([b.n_cols for b in batches], dtype=np.int64),
        group_of_record=group_of_record, index_in_group=index_in_group,
        c_pad=c_pad, rec_pad=rec_pad)


def _batched_group_stats(pool, lens, rec, qpos0, tpos0, rev, col_off, n_cols,
                         rec_col_off, c_pad, rec_pad, col_spec=None):
    """Column compare + per-record reduction for G record groups at once.

    All per-group tensors carry a leading group axis (sharded over ``data``);
    the expanded column tensors [G, c_pad] additionally carry the ``seq``
    sharding on their column axis (col_spec), so the per-base work splits
    across both mesh axes and XLA inserts the cross-seq reductions.  The
    per-record reduction is a per-group cumsum + gather at record column
    boundaries (scatter segment-sums over the column axis serialize on TPU).
    """
    g = lens.shape[0]

    def constrain(x):
        return x if col_spec is None else jax.lax.with_sharding_constraint(x, col_spec)

    # column -> owning M-op (scatter + per-group cumsum)
    starts = col_off[:, 1:-1]
    flat_idx = (jnp.arange(g, dtype=jnp.int64)[:, None] * c_pad
                + jnp.clip(starts, 0, c_pad - 1))
    weights = jnp.where(starts < c_pad, 1, 0).astype(jnp.int32)
    marks = jnp.zeros(g * c_pad, dtype=jnp.int32).at[flat_idx.reshape(-1)].add(
        weights.reshape(-1)).reshape(g, c_pad)
    col_op = constrain(jnp.cumsum(marks, axis=1))

    cols = jnp.arange(c_pad, dtype=jnp.int64)[None, :]
    take = lambda a: jnp.take_along_axis(a, col_op, axis=1)
    i = cols - take(col_off[:, :-1])
    valid = constrain(cols < n_cols[:, None])
    limit = pool.shape[0] - 1
    rev_c = take(rev)
    tb = device_upper(pool[jnp.clip(take(tpos0) + i, 0, limit)])
    qb = device_upper(pool[jnp.clip(take(qpos0) + jnp.where(rev_c, -i, i), 0, limit)])
    qb = jnp.where(rev_c, device_comp_upper(qb), qb)
    is_match = constrain(tb == qb)

    cm = jnp.cumsum((is_match & valid).astype(jnp.int32), axis=1)
    cv = jnp.cumsum(valid.astype(jnp.int32), axis=1)
    zero = jnp.zeros((g, 1), dtype=jnp.int32)
    cm0 = jnp.concatenate([zero, cm], axis=1)
    cv0 = jnp.concatenate([zero, cv], axis=1)
    bounds = jnp.clip(rec_col_off, 0, c_pad)
    m = (jnp.take_along_axis(cm0, bounds[:, 1:], axis=1)
         - jnp.take_along_axis(cm0, bounds[:, :-1], axis=1)).astype(jnp.int64)
    tot = (jnp.take_along_axis(cv0, bounds[:, 1:], axis=1)
           - jnp.take_along_axis(cv0, bounds[:, :-1], axis=1)).astype(jnp.int64)
    return m, tot - m


def sharded_view_stats(mesh: Mesh, pool_arr, b: ShardedColumnBatch):
    """Jit the data+seq sharded stats step over ``mesh`` and run it.

    Returns (per-record matches [G, rec_pad], mismatches, aggregate totals).
    """
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    col2d = NamedSharding(mesh, P("data", "seq"))

    @partial(jax.jit,
             in_shardings=(repl, data, data, data, data, data, data, data, data),
             out_shardings=(data, data, repl))
    def step(pool, lens, rec, qpos0, tpos0, rev, col_off, n_cols, rec_col_off):
        m, x = _batched_group_stats(pool, lens, rec, qpos0, tpos0, rev,
                                    col_off, n_cols, rec_col_off,
                                    b.c_pad, b.rec_pad, col_spec=col2d)
        totals = jnp.stack([jnp.sum(m), jnp.sum(x)])
        return m, x, totals

    return step(pool_arr, jnp.asarray(b.lens), jnp.asarray(b.rec),
                jnp.asarray(b.qpos0), jnp.asarray(b.tpos0), jnp.asarray(b.rev),
                jnp.asarray(b.col_off), jnp.asarray(b.n_cols),
                jnp.asarray(b.rec_col_off))


def column_counts_multichip(t: PafTable, pool: SequencePool, mesh: Mesh):
    """Data-parallel per-record column match counts over a mesh; results are
    gathered back to original record order (deterministic output)."""
    n_groups = mesh.shape["data"]
    b = shard_records(t, pool, n_groups)
    m, x, totals = sharded_view_stats(mesh, pool.pool, b)
    m = np.asarray(m)[b.group_of_record, b.index_in_group]
    x = np.asarray(x)[b.group_of_record, b.index_in_group]
    return m, x, np.asarray(totals)

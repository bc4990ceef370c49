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
from paffy_tpu.ops.mismatch import SequencePool, _UPPER_J, _COMP_J
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
    return ShardedColumnBatch(
        lens=stack("lens"), rec=stack("rec"), qpos0=stack("qpos0"),
        tpos0=stack("tpos0"), rev=stack("rev", fill=False), col_off=col_off,
        n_cols=np.array([b.n_cols for b in batches], dtype=np.int64),
        group_of_record=group_of_record, index_in_group=index_in_group,
        c_pad=c_pad, rec_pad=rec_pad)


def _batched_group_stats(pool, lens, rec, qpos0, tpos0, rev, col_off, n_cols,
                         c_pad, rec_pad, col_spec=None):
    """Column compare + per-record reduction for G record groups at once.

    All per-group tensors carry a leading group axis (sharded over ``data``);
    the expanded column tensors [G, c_pad] additionally carry the ``seq``
    sharding on their column axis (col_spec), so the per-base work splits
    across both mesh axes and XLA inserts the cross-seq reductions.
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
    tb = pool[jnp.clip(take(tpos0) + i, 0, limit)]
    qb = pool[jnp.clip(take(qpos0) + jnp.where(rev_c, -i, i), 0, limit)]
    qb = jnp.where(rev_c, _COMP_J[qb], qb)
    is_match = constrain(_UPPER_J[tb] == _UPPER_J[qb])

    recs = take(rec) + jnp.arange(g, dtype=jnp.int64)[:, None] * rec_pad
    m = jax.ops.segment_sum((is_match & valid).reshape(-1).astype(jnp.int64),
                            recs.reshape(-1), num_segments=g * rec_pad)
    x = jax.ops.segment_sum((~is_match & valid).reshape(-1).astype(jnp.int64),
                            recs.reshape(-1), num_segments=g * rec_pad)
    return m.reshape(g, rec_pad), x.reshape(g, rec_pad)


def sharded_view_stats(mesh: Mesh, pool_arr, b: ShardedColumnBatch):
    """Jit the data+seq sharded stats step over ``mesh`` and run it.

    Returns (per-record matches [G, rec_pad], mismatches, aggregate totals).
    """
    data = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    col2d = NamedSharding(mesh, P("data", "seq"))

    @partial(jax.jit,
             in_shardings=(repl, data, data, data, data, data, data, data),
             out_shardings=(data, data, repl))
    def step(pool, lens, rec, qpos0, tpos0, rev, col_off, n_cols):
        m, x = _batched_group_stats(pool, lens, rec, qpos0, tpos0, rev,
                                    col_off, n_cols, b.c_pad, b.rec_pad,
                                    col_spec=col2d)
        totals = jnp.stack([jnp.sum(m), jnp.sum(x)])
        return m, x, totals

    return step(pool_arr, jnp.asarray(b.lens), jnp.asarray(b.rec),
                jnp.asarray(b.qpos0), jnp.asarray(b.tpos0), jnp.asarray(b.rev),
                jnp.asarray(b.col_off), jnp.asarray(b.n_cols))


def column_counts_multichip(t: PafTable, pool: SequencePool, mesh: Mesh):
    """Data-parallel per-record column match counts over a mesh; results are
    gathered back to original record order (deterministic output)."""
    n_groups = mesh.shape["data"]
    b = shard_records(t, pool, n_groups)
    m, x, totals = sharded_view_stats(mesh, pool.pool, b)
    m = np.asarray(m)[b.group_of_record, b.index_in_group]
    x = np.asarray(x)[b.group_of_record, b.index_in_group]
    return m, x, np.asarray(totals)

"""Sparse chaining of PAF alignments.

Reference: impl/chaining.c (whole file).  The reference sweeps records in
ascending query_start order, keeping an AVL set of "active" chain heads and,
for each record, iterating candidate predecessors backward with prune/evict
rules.  Every prune rule is monotone (SURVEY.md section 7 "hard parts" #2):

  * the query-gap eviction (impl/chaining.c:180-183) only removes candidates
    whose query gap can never shrink for later records (records are processed
    in ascending query_start), and
  * the target-gap break (impl/chaining.c:188-190) only skips candidates with
    still-larger target gaps,

so the stateful sweep is equivalent to the clean recurrence

  chain_score[i] = max(score[i],
                       max_j { score[i] + chain_score[j] - gap(i,j) })
  over j with  qend_j <= qstart_i,  tend_j <= tstart_i,
               qstart_i - qend_j <= max_gap,  tstart_i - tend_j <= max_gap,
               gap(i,j) < score[i]           (impl/chaining.c:192-199)

with ties between equal-scoring predecessors resolved toward the candidate
visited first in the reference's backward iteration: largest
(target_end, query_end, processing index).

Greedy chain extraction (impl/chaining.c:216-233) takes chains best-score
first (ties: latest-processed first, the reference's pointer tiebreak),
walking predecessor links and truncating at already-claimed records; members
are emitted head-first, chain ids assigned in extraction order and the chain
total recomputed along the surviving links (get_chain_score,
impl/chaining.c:88-113).

Strand handling (impl/chaining.c:266-343): records are coordinate-trimmed by
percentage_to_trim, '-' strand query coordinates mirrored to negative space,
each strand set chained separately (chain_id counter shared), then mirrored
back, un-trimmed, checked, and stably sorted by descending score.

The per-group DP runs as a ``lax.scan`` on device for large groups (vector
candidate masks per step) and as a numpy sweep for small ones — identical
semantics, verified against each other in tests.
"""

from __future__ import annotations

from dataclasses import replace
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from paffy_tpu.core.model import PafTable
from paffy_tpu.core.pafio import paf_check
from paffy_tpu.ops.segments import bucket_size

_NEG = np.int64(-(1 << 62))

DEVICE_GROUP_THRESHOLD = 768  # below this, the numpy sweep is faster than dispatch


def _dp_numpy(qs, qe, ts, te, score, gap_open, gap_extend, max_gap):
    """O(N^2) chain DP over one (qname,tname,strand) group in processing
    order.  Returns (chain_score, pred) with pred -1 for chain starts."""
    n = len(qs)
    cs = score.copy()
    pred = np.full(n, -1, dtype=np.int64)
    for i in range(1, n):
        qgap = qs[i] - qe[:i]
        tgap = ts[i] - te[:i]
        ok = (qgap >= 0) & (tgap >= 0) & (qgap <= max_gap) & (tgap <= max_gap)
        if not ok.any():
            continue
        g = np.where(qgap + tgap == 0, 0, gap_open + gap_extend * (qgap + tgap))
        ok &= g < score[i]
        if not ok.any():
            continue
        val = score[i] + cs[:i] - g
        val = np.where(ok, val, _NEG)
        best = val.max()
        if best <= score[i]:
            continue
        # tiebreak: largest (target_end, query_end, index) among best values
        cand = np.nonzero(val == best)[0]
        j = cand[np.lexsort((cand, qe[cand], te[cand]))[-1]]
        cs[i] = best
        pred[i] = j
    return cs, pred


@partial(jax.jit, static_argnames=("n_pad",))
def _dp_scan(qs, qe, ts, te, score, valid, gap_open, gap_extend, max_gap, n_pad):
    """Device chain DP: scan over records, vector candidate mask per step."""
    idx = jnp.arange(n_pad, dtype=jnp.int64)

    def step(cs, i):
        before = (idx < i) & valid
        qgap = qs[i] - qe
        tgap = ts[i] - te
        ok = before & (qgap >= 0) & (tgap >= 0) & (qgap <= max_gap) & (tgap <= max_gap)
        g = jnp.where(qgap + tgap == 0, 0, gap_open + gap_extend * (qgap + tgap))
        ok &= g < score[i]
        val = jnp.where(ok, score[i] + cs - g, _NEG)
        best = jnp.max(val)
        tie = val == best
        # argmax of (te, qe, idx) among ties — nested reductions
        t_best = jnp.max(jnp.where(tie, te, _NEG))
        tie &= te == t_best
        q_best = jnp.max(jnp.where(tie, qe, _NEG))
        tie &= qe == q_best
        j = jnp.max(jnp.where(tie, idx, -1))
        adopt = best > score[i]
        new_cs_i = jnp.where(adopt, best, score[i])
        pred_i = jnp.where(adopt, j, -1)
        cs = cs.at[i].set(new_cs_i)
        return cs, pred_i

    cs0 = jnp.where(valid, score, _NEG)
    cs, preds = jax.lax.scan(step, cs0, jnp.arange(n_pad, dtype=jnp.int64))
    return cs, preds


def _group_dp(qs, qe, ts, te, score, gap_open, gap_extend, max_gap):
    n = len(qs)
    if n < DEVICE_GROUP_THRESHOLD:
        return _dp_numpy(qs, qe, ts, te, score, gap_open, gap_extend, max_gap)
    n_pad = bucket_size(n)

    def pad(a):
        out = np.zeros(n_pad, dtype=np.int64)
        out[:n] = a
        return jnp.asarray(out)

    valid = np.zeros(n_pad, dtype=bool)
    valid[:n] = True
    cs, pred = _dp_scan(pad(qs), pad(qe), pad(ts), pad(te), pad(score),
                        jnp.asarray(valid), np.int64(gap_open),
                        np.int64(gap_extend), np.int64(max_gap), n_pad=n_pad)
    return np.asarray(cs)[:n], np.asarray(pred)[:n]


def _gap_cost(qgap, tgap, gap_open, gap_extend):
    return 0 if qgap + tgap == 0 else gap_open + gap_extend * (qgap + tgap)


def _chain_strand_set(t: PafTable, sel: np.ndarray, qs, qe, ts, te,
                      gap_open, gap_extend, max_gap, chain_id_start: int):
    """Chain the records at indices ``sel`` (one strand, mirrored coords).

    Returns (output order over sel, chain_id, chain_score arrays aligned to
    that order, next chain id).
    """
    n = len(sel)
    if n == 0:
        return (np.zeros(0, dtype=np.int64),) * 3 + (chain_id_start,)
    # processing order: ascending query_start, ties by input order
    # (paf_cmp_by_query_location pointer tiebreak, impl/chaining.c:14-21)
    order = np.lexsort((sel, qs[sel]))
    sqs, sqe = qs[sel][order], qe[sel][order]
    sts, ste = ts[sel][order], te[sel][order]
    sscore = t.score[sel][order]

    # group by (qname, tname); strand is homogeneous here
    keys = {}
    gid = np.empty(n, dtype=np.int64)
    for k, i in enumerate(sel[order]):
        key = (t.qname[i], t.tname[i])
        gid[k] = keys.setdefault(key, len(keys))

    cs = np.empty(n, dtype=np.int64)
    pred = np.full(n, -1, dtype=np.int64)
    for g in range(len(keys)):
        m = np.nonzero(gid == g)[0]
        gcs, gpred = _group_dp(sqs[m], sqe[m], sts[m], ste[m], sscore[m],
                               gap_open, gap_extend, max_gap)
        cs[m] = gcs
        pred[m] = np.where(gpred >= 0, m[np.clip(gpred, 0, None)], -1)

    # ---- greedy extraction, best chain-score first (ties: latest processed)
    extract = np.lexsort((-np.arange(n), -cs))
    claimed = np.zeros(n, dtype=bool)
    out_members: list[int] = []
    out_chain_id: list[int] = []
    out_chain_score: list[int] = []
    next_id = chain_id_start
    for r in extract:
        if claimed[r]:
            continue
        members = [r]
        claimed[r] = True
        cur = r
        while True:
            p = pred[cur]
            if p < 0 or claimed[p]:
                break
            claimed[p] = True
            members.append(int(p))
            cur = int(p)
        # total score along surviving links (get_chain_score)
        total = int(sscore[members[0]])
        for a, b in zip(members[:-1], members[1:]):
            g = _gap_cost(int(sqs[a] - sqe[b]), int(sts[a] - ste[b]),
                          gap_open, gap_extend)
            total += int(sscore[b]) - g
        for mmb in members:
            out_members.append(mmb)
            out_chain_id.append(next_id)
            out_chain_score.append(total)
        next_id += 1

    out = np.array(out_members, dtype=np.int64)
    return (sel[order[out]],
            np.array(out_chain_id, dtype=np.int64),
            np.array(out_chain_score, dtype=np.int64), next_id)


def paf_chain(t: PafTable, gap_open: int = 5000, gap_extend: int = 1,
              max_gap: int = 1000000, pct_trim: float = 1.0,
              check: bool = True) -> PafTable:
    """Chain a batch of records (paf_chain, impl/chaining.c:266-343).

    Default costs match paffy chain (impl/paf_chain.c:17-20,36-45).
    """
    assert 0.0 <= pct_trim <= 1.0
    n = len(t)
    if n == 0:
        return t
    # per-record coordinate trim for chaining (impl/chaining.c:274-289);
    # C computes each span*pct in float32 then truncates, then min/2
    q_span = (t.qend - t.qstart).astype(np.float32)
    t_span = (t.tend - t.tstart).astype(np.float32)
    maxq = np.trunc(q_span * np.float32(pct_trim)).astype(np.int64)
    maxt = np.trunc(t_span * np.float32(pct_trim)).astype(np.int64)
    trim = np.minimum(maxq, maxt) // 2

    qs = t.qstart + trim
    qe = t.qend - trim
    ts = t.tstart + trim
    te = t.tend - trim
    # mirror '-' strand query coords (invert_query_strand, impl/chaining.c:255-259)
    neg = ~t.strand
    qs_m = np.where(neg, -(t.qend - trim), qs)
    qe_m = np.where(neg, -(t.qstart + trim), qe)

    pos_sel = np.nonzero(t.strand)[0]
    neg_sel = np.nonzero(neg)[0]
    o1, id1, cs1, nxt = _chain_strand_set(t, pos_sel, qs_m, qe_m, ts, te,
                                          gap_open, gap_extend, max_gap, 0)
    o2, id2, cs2, _ = _chain_strand_set(t, neg_sel, qs_m, qe_m, ts, te,
                                        gap_open, gap_extend, max_gap, nxt)

    order = np.concatenate([o1, o2])
    out = t.take(order)
    out = replace(out, chain_id=np.concatenate([id1, id2]),
                  chain_score=np.concatenate([cs1, cs2]))
    if check:
        paf_check(out)
    # final sort: descending score, stable (impl/chaining.c:337)
    final = np.argsort(-out.score, kind="stable")
    return out.take(final)

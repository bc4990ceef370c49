"""Unreliable-tail trim tests — port of tests/paf_unit_test.c section 14 plus
an oracle cross-check on randomized cigars."""

import numpy as np

from paffy_tpu.core.model import MATCH, QUERY_INSERT, QUERY_DELETE, SEQ_MATCH, SEQ_MISMATCH
from paffy_tpu.core.pafio import parse_paf_text, paf_check, format_record
from paffy_tpu.ops.tailtrim import trim_unreliable_tails


def parse_one(line):
    return parse_paf_text(line + "\n")


def test_trims_tails():
    # 2X5=2X, opposite strand; score_fraction=0 -> both 2X tails removed
    t = parse_one("q\t9\t0\t9\t-\tt\t9\t0\t9\t5\t9\t60\tcg:Z:2X5=2X")
    t2 = trim_unreliable_tails(t, 0.0, 1.0)
    assert t2.qstart[0] == 2 and t2.qend[0] == 7
    assert t2.tstart[0] == 2 and t2.tend[0] == 7
    ops, lens = t2.record_ops(0)
    assert list(ops) == [SEQ_MATCH] and list(lens) == [5]
    paf_check(t2)


def test_no_trim_at_score_fraction_one():
    t = parse_one("q\t9\t0\t9\t+\tt\t9\t0\t9\t5\t9\t60\tcg:Z:2X5=2X")
    t2 = trim_unreliable_tails(t, 1.0, 1.0)
    assert t2.qstart[0] == 0 and t2.qend[0] == 9
    ops, lens = t2.record_ops(0)
    assert list(ops) == [SEQ_MISMATCH, SEQ_MATCH, SEQ_MISMATCH]
    assert list(lens) == [2, 5, 2]


def test_opposite_strand_coordinates():
    # 2X5=, same_strand=false: prefix trim decrements query_end
    t = parse_one("q\t9\t0\t7\t-\tt\t9\t0\t7\t5\t7\t60\tcg:Z:2X5=")
    t2 = trim_unreliable_tails(t, 0.0, 1.0)
    assert t2.qstart[0] == 0 and t2.qend[0] == 5
    assert t2.tstart[0] == 2 and t2.tend[0] == 7
    ops, lens = t2.record_ops(0)
    assert list(ops) == [SEQ_MATCH] and list(lens) == [5]


def test_max_trim_caps_columns():
    # max_fraction_to_trim=0: max_trim=0, the first op already exceeds it
    t = parse_one("q\t9\t0\t9\t+\tt\t9\t0\t9\t5\t9\t60\tcg:Z:2X5=2X")
    t2 = trim_unreliable_tails(t, 0.0, 0.0)
    assert t2.qstart[0] == 0 and t2.qend[0] == 9


def test_suffix_reinclusion():
    # prefix 1X1=1X... with identity pattern where a high-identity suffix of
    # the low prefix is re-included (impl/paf.c:877-890)
    t = parse_one("q\t20\t0\t12\t+\tt\t20\t0\t12\t8\t12\t60\tcg:Z:2X6=1X3=")
    t0 = trim_unreliable_tails(t.copy(), 0.0, 1.0)
    # identity = 9/12 = 0.75; prefix identities: 2X:0, +6=:0.75(not <), so
    # trim_idx=0 -> prefix [0..0]=2X, no suffix with identity>=0.75 ->
    # trim_count=1 -> drop 2X
    assert t0.qstart[0] == 2 and t0.tstart[0] == 2
    ops, lens = t0.record_ops(0)
    assert list(ops)[0] == SEQ_MATCH


def _oracle_trim(t, i, score_fraction, max_fraction):
    """Direct per-record re-implementation (impl/paf.c:811-953)."""
    ops = [(int(o), int(l)) for o, l in zip(*t.record_ops(i))]
    qs, qe, ts, te = (int(t.qstart[i]), int(t.qend[i]),
                      int(t.tstart[i]), int(t.tend[i]))
    strand = bool(t.strand[i])

    def mm_of(op_l):
        m = sum(l for o, l in op_l if o in (MATCH, SEQ_MATCH))
        mm = sum(l for o, l in op_l if o not in (MATCH, SEQ_MATCH))
        return m, mm

    m, mm = mm_of(ops)
    ident = np.float64(np.float32(m) / np.float32(m + mm))
    thr = np.float32(ident - ident * np.float64(np.float32(score_fraction)))
    ident_f = np.float32(ident)
    max_trim = int(np.trunc(np.float32(m + mm) * np.float32(max_fraction)))

    def prefix_trim(ops, qs, qe, ts, te, inverted):
        cm = cmm = 0
        trim_idx = -1
        for idx, (o, l) in enumerate(ops):
            if o in (MATCH, SEQ_MATCH):
                cm += l
            else:
                cmm += l
            if max_trim >= 0 and cm + cmm > max_trim:
                break
            pid = np.float64(np.float32(cm) / np.float32(cm + cmm))
            if pid < np.float64(thr):
                trim_idx = idx
        if trim_idx < 0:
            return ops, qs, qe, ts, te
        sm = smm = 0
        best = -1
        for i2 in range(trim_idx, -1, -1):
            o, l = ops[i2]
            if o in (MATCH, SEQ_MATCH):
                sm += l
            else:
                smm += l
            sid = np.float64(np.float32(sm) / np.float32(sm + smm))
            if sid >= np.float64(ident_f):
                best = i2
        count = best if best >= 0 else trim_idx + 1
        for o, l in ops[:count]:
            if o != QUERY_INSERT:
                ts += l
            if o != QUERY_DELETE:
                if strand:
                    qs += l
                else:
                    qe -= l
        return ops[count:], qs, qe, ts, te

    # prefix
    ops, qs, qe, ts, te = prefix_trim(ops, qs, qe, ts, te, False)
    # invert: swap axes, I<->D relabel, reverse if opposite strand
    inv = [(QUERY_DELETE if o == QUERY_INSERT else QUERY_INSERT
            if o == QUERY_DELETE else o, l) for o, l in ops]
    if not strand:
        inv = inv[::-1]
    qs2, qe2, ts2, te2 = ts, te, qs, qe
    # note: after invert "query" is the old target; strand semantics unchanged
    saved = strand
    inv2, ts2b, te2b, qs2b, qe2b = None, None, None, None, None
    cm = cmm = 0
    trim_idx = -1
    for idx, (o, l) in enumerate(inv):
        if o in (MATCH, SEQ_MATCH):
            cm += l
        else:
            cmm += l
        if max_trim >= 0 and cm + cmm > max_trim:
            break
        pid = np.float64(np.float32(cm) / np.float32(cm + cmm))
        if pid < np.float64(thr):
            trim_idx = idx
    if trim_idx >= 0:
        sm = smm = 0
        best = -1
        for i2 in range(trim_idx, -1, -1):
            o, l = inv[i2]
            if o in (MATCH, SEQ_MATCH):
                sm += l
            else:
                smm += l
            sid = np.float64(np.float32(sm) / np.float32(sm + smm))
            if sid >= np.float64(ident_f):
                best = i2
        count = best if best >= 0 else trim_idx + 1
        for o, l in inv[:count]:
            if o != QUERY_INSERT:
                te -= 0  # placeholder; handled below
        # apply with inverted axes: query' = target, target' = query
        nqs, nqe, nts, nte = ts, te, qs, qe
        for o, l in inv[:count]:
            if o != QUERY_INSERT:
                nts += l
            if o != QUERY_DELETE:
                if strand:
                    nqs += l
                else:
                    nqe -= l
        inv = inv[count:]
        ts, te, qs, qe = nqs, nqe, nts, nte
    # invert back
    back = [(QUERY_DELETE if o == QUERY_INSERT else QUERY_INSERT
             if o == QUERY_DELETE else o, l) for o, l in inv]
    if not strand:
        back = back[::-1]
    return back, qs, qe, ts, te


def test_random_against_oracle():
    rng = np.random.default_rng(7)
    lines = []
    for r in range(60):
        n_ops = int(rng.integers(1, 12))
        ops = []
        q = t_ = 0
        prev = None
        for _ in range(n_ops):
            kind = int(rng.integers(0, 4))
            ln = int(rng.integers(1, 9))
            if kind == 0:
                ops.append(f"{ln}="); q += ln; t_ += ln
            elif kind == 1:
                ops.append(f"{ln}X"); q += ln; t_ += ln
            elif kind == 2:
                ops.append(f"{ln}I"); q += ln
            else:
                ops.append(f"{ln}D"); t_ += ln
        if q == 0 or t_ == 0:
            ops.append("3="); q += 3; t_ += 3
        strand = "+" if rng.random() < 0.5 else "-"
        lines.append(f"q{r}\t{q+10}\t5\t{5+q}\t{strand}\tt{r}\t{t_+10}\t5\t{5+t_}"
                     f"\t{q}\t{max(q, t_)}\t60\tcg:Z:{''.join(ops)}")
    t = parse_paf_text("\n".join(lines) + "\n")
    for sf, mf in [(0.05, 1.0), (0.0, 1.0), (0.2, 0.5), (0.95, 1.0)]:
        t2 = trim_unreliable_tails(t.copy(), sf, mf)
        for i in range(len(t)):
            e_ops, eqs, eqe, ets, ete = _oracle_trim(t, i, sf, mf)
            g_ops, g_lens = t2.record_ops(i)
            got = list(zip([int(o) for o in g_ops], [int(l) for l in g_lens]))
            assert got == e_ops, f"rec {i} sf={sf}: {got} != {e_ops}"
            assert (int(t2.qstart[i]), int(t2.qend[i]),
                    int(t2.tstart[i]), int(t2.tend[i])) == (eqs, eqe, ets, ete), \
                f"rec {i} sf={sf} coords"

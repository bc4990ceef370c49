"""Synthetic genome-pair + local-alignment generator for hermetic pipeline
tests.

The reference's shell suites (tests/paf_tools_test.sh, paf_pipeline_test.sh,
faf_paf_chunking_test.sh) download genomes and run lastz; neither is
available here, so we synthesize an equivalent workload: mutate an ancestor
sequence into a descendant while recording the true global alignment, then
cut overlapping windows of that alignment into PAF records (the role lastz's
local alignments play).  Identity/aligned-base oracles then hold by
construction.
"""

from __future__ import annotations

import numpy as np

from paffy_tpu.core.fasta import reverse_complement

BASES = "ACGT"


def mutate_with_alignment(rng, ancestor: str, snp=0.02, ins=0.002, dele=0.002,
                          max_indel=8):
    """Derive a sequence from ``ancestor`` recording the true cigar
    (target = ancestor, query = derived).  Returns (derived, ops) with ops a
    list of (op_char, length)."""
    out = []
    ops: list[list] = []   # [op, len]

    def emit(op, ln=1):
        if ops and ops[-1][0] == op:
            ops[-1][1] += ln
        else:
            ops.append([op, ln])

    i = 0
    n = len(ancestor)
    while i < n:
        r = rng.random()
        if r < ins:
            k = int(rng.integers(1, max_indel + 1))
            out.append("".join(rng.choice(list(BASES), k)))
            emit("I", k)
        elif r < ins + dele:
            k = min(int(rng.integers(1, max_indel + 1)), n - i)
            emit("D", k)
            i += k
        else:
            c = ancestor[i]
            if rng.random() < snp:
                c = BASES[(BASES.index(c.upper()) + int(rng.integers(1, 4))) % 4]
            out.append(c)
            emit("M")
            i += 1
    return "".join(out), [(o, l) for o, l in ops]


def cut_window(ops, t_lo, t_hi):
    """Sub-cigar covering target range [t_lo, t_hi).

    Returns (qstart, qend, tstart, tend, sub_ops) — the true coordinates of
    the clipped alignment window, trimmed to start/end on M ops — or None if
    the window contains no M columns.
    """
    q = t = 0
    items = []   # (op, len, q0, t0)
    for op, ln in ops:
        dq = ln if op != "D" else 0
        dt = ln if op != "I" else 0
        if op == "I":
            if t_lo <= t < t_hi:
                items.append(("I", ln, q, t))
        else:
            lo = max(t, t_lo)
            hi = min(t + ln, t_hi)
            if hi > lo:
                off = lo - t
                q0 = q + (off if op == "M" else 0)
                items.append((op, hi - lo, q0, lo))
        q += dq
        t += dt
    mi = [i for i, x in enumerate(items) if x[0] == "M"]
    if not mi:
        return None
    items = items[mi[0]: mi[-1] + 1]
    qstart, tstart = items[0][2], items[0][3]
    qend = qstart + sum(l for o, l, _, _ in items if o != "D")
    tend = tstart + sum(l for o, l, _, _ in items if o != "I")
    merged: list[list] = []
    for o, l, _, _ in items:
        if merged and merged[-1][0] == o:
            merged[-1][1] += l
        else:
            merged.append([o, l])
    return qstart, qend, tstart, tend, [(o, l) for o, l in merged]


def cigar_str(sub):
    return "".join(f"{l}{o}" for o, l in sub)


def make_workload(seed=0, length=20000, n_windows=24, window=2500, step=900):
    """Build (sequences dict, list of PAF lines) for a synthetic genome pair,
    including '+' and '-' strand records and duplicate records."""
    rng = np.random.default_rng(seed)
    ancestor = "".join(rng.choice(list(BASES), length))
    derived, ops = mutate_with_alignment(rng, ancestor)
    seqs = {"anc.chr1": ancestor, "der.chr1": derived}
    lines = []
    t_total = length
    q_total = len(derived)
    for w in range(n_windows):
        t_lo = (w * step) % max(t_total - window, 1)
        t_hi = min(t_lo + window, t_total)
        cw = cut_window(ops, t_lo, t_hi)
        if cw is None:
            continue
        qs, qe, ts, te, sub = cw
        matches = sum(l for o, l in sub if o == "M")
        score = 2 * matches
        lines.append(
            f"der.chr1\t{q_total}\t{qs}\t{qe}\t+\tanc.chr1\t{t_total}"
            f"\t{ts}\t{te}\t{matches}\t{matches}\t60\tAS:i:{score}"
            f"\tcg:Z:{cigar_str(sub)}")
    # a few reverse-strand records: a revcomp'd slice of the derived sequence
    # as its own contig, aligned '-' to the ancestor
    for k, (a, b) in enumerate([(1000, 3500), (8000, 11000)]):
        cw = cut_window(ops, a, b)
        if cw is None:
            continue
        qs, qe, ts, te, sub = cw
        qspan = qe - qs
        name = f"der.rc{k}"
        seqs[name] = reverse_complement(derived[qs:qe])
        matches = sum(l for o, l in sub if o == "M")
        lines.append(
            f"{name}\t{qspan}\t0\t{qspan}\t-\tanc.chr1\t{t_total}"
            f"\t{ts}\t{te}\t{matches}\t{matches}\t60\tAS:i:{2*matches}"
            f"\tcg:Z:{cigar_str(sub)}")
    # duplicates for dedupe
    lines.append(lines[0])
    return seqs, lines

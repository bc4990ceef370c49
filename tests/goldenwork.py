"""Golden-workload fixtures: the reference's checked-in human_chimp.paf plus
a deterministic FASTA synthesized at its exact coordinates.

Both golden sequences are named ``chr10`` (chimp query 129,809,613 bp, human
target 133,797,422 bp), so any command that loads a name->sequence FASTA map
needs a renamed derivative (``q_chr10``/``t_chr10``) — the reference has the
same constraint (its FASTA hash is keyed by name, impl/paf_view.c:127-134)
and never runs FASTA-consuming commands on this file.

The FASTA is synthesized with the same native pass the benchmark uses
(native.synth_query_pool: random target bases, query bases written through
the alignment map at ~96.5% column match rate), so the snapshot fixtures are
deterministic across runs and platforms given the same seed.
"""

from __future__ import annotations

import numpy as np

GOLDEN = "/root/reference/tests/human_chimp.paf"
_BLOCK = 1 << 16
_MATCH_RATE = 0.965
_SEED = 7


def renamed_golden_text() -> str:
    """Golden PAF with query renamed q_chr10 and target t_chr10."""
    out = []
    with open(GOLDEN) as fh:
        for line in fh:
            c = line.rstrip("\n").split("\t")
            c[0] = "q_" + c[0]
            c[5] = "t_" + c[5]
            out.append("\t".join(c))
    return "\n".join(out) + "\n"


def synth_golden_seqs() -> dict[str, str]:
    """Deterministic {q_chr10, t_chr10} sequences matching the golden
    coordinates (query written through the alignment map, native pass)."""
    from paffy_tpu import native
    from paffy_tpu.core import pafio
    from paffy_tpu.ops.segments import (build_m_column_batch, POOL_GUARD,
                                        POOL_W)
    t = pafio.parse_paf_text(renamed_golden_text())
    names, sizes = [], []
    seen = {}
    for i in range(len(t)):
        for nm, ln in ((t.qname[i], int(t.qlen[i])),
                       (t.tname[i], int(t.tlen[i]))):
            if nm not in seen:
                seen[nm] = len(sizes)
                names.append(nm)
                sizes.append(ln)
    offsets = np.concatenate([[0], np.cumsum(sizes)]) + POOL_GUARD
    qoff = np.array([offsets[seen[t.qname[i]]] for i in range(len(t))],
                    dtype=np.int64)
    toff = np.array([offsets[seen[t.tname[i]]] for i in range(len(t))],
                    dtype=np.int64)
    pool_size = -(-(int(offsets[-1]) + POOL_GUARD + 2 * POOL_W)
                  // POOL_W) * POOL_W
    b = build_m_column_batch(t, qoff, toff)

    rng = np.random.default_rng(_SEED)
    block = np.frombuffer(b"ACGT", dtype=np.uint8)[
        rng.integers(0, 4, size=_BLOCK, dtype=np.uint8)]
    pool = np.tile(block, pool_size // _BLOCK + 1)[:pool_size]
    ok = native.synth_query_pool(pool, b.lens[: b.n_mops],
                                 b.qpos0[: b.n_mops], b.tpos0[: b.n_mops],
                                 b.rev[: b.n_mops],
                                 keep_per_mille=int(_MATCH_RATE * 1000))
    if not ok:
        return {}
    return {nm: pool[offsets[seen[nm]]: offsets[seen[nm]] + sizes[seen[nm]]]
            .tobytes().decode("latin-1") for nm in names}

"""Golden-workload benchmark: kernel + end-to-end command throughput.

Workload: tests/human_chimp.paf (207 records, 369,583 cigar ops, 124,949,228
M-run alignment columns) with sequences synthesized by the native C helper to
the file's exact coordinate structure (~96.5% column match rate); device and
host receive identical pools, so every device result is cross-checked against
the single-threaded C loop bit-for-bit.

Three measurements (reference hot paths in parentheses):

1. ``alignment_columns_per_second`` — the fused column-compare + per-record
   stats kernel alone (paf_encode_mismatches inner loop, impl/paf.c:754-768).
   Headline metric; ``vs_baseline`` is the speedup over the single-threaded
   C per-base loop on the identical pool.
2. ``view -s`` END-TO-END on the 16x-replicated workload: parse -> column
   batch -> counts (device kernel vs C loop) -> per-record stat lines +
   aggregate (impl/paf_view.c:151-197).  Byte-equality between the two paths
   is asserted.  Reported as records/s in ``extra``.
3. ``add_mismatches`` END-TO-END on the 4x-replicated workload: parse ->
   native =/X run extraction -> CSR rebuild -> serialize
   (impl/paf_add_mismatches.c:111-133).  Production (threaded) vs
   single-threaded extraction, byte-equality asserted.  Reported as
   cigar-ops/s in ``extra``.

The reference publishes no numbers (BASELINE.md), so baselines are the same
computation in single-threaded C on this host.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
Diagnostics go to stderr.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

GOLDEN = "/root/reference/tests/human_chimp.paf"
BLOCK = 1 << 16
MATCH_RATE = 0.965
REP_VIEW = 16
REP_AM = 4


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def load_golden_text() -> str:
    if os.path.exists(GOLDEN):
        with open(GOLDEN) as fh:
            return fh.read()
    log("golden file missing; synthesizing equivalent workload")
    from tests.synthdata import make_workload
    seqs, lines = make_workload(seed=0, length=2_000_000, n_windows=200,
                                window=60_000, step=9_500)
    return "\n".join(lines) + "\n"


def rename_contigs(text: str) -> str:
    """Distinct query/target names (both golden sequences are 'chr10'):
    the end-to-end paths key sequences by name, like the reference's
    FASTA hash (impl/paf_view.c:127-134)."""
    out = []
    for line in text.splitlines():
        c = line.split("\t")
        c[0] = "q_" + c[0]
        c[5] = "t_" + c[5]
        out.append("\t".join(c))
    return "\n".join(out) + "\n"


def load_workload():
    from paffy_tpu.core import pafio
    text = rename_contigs(load_golden_text())
    t0 = time.time()
    t = pafio.parse_paf_text(text)
    log(f"parsed {len(t)} records / {int(t.off[-1])} ops "
        f"in {time.time()-t0:.3f}s")
    return t, text


def build_columns(t):
    from paffy_tpu.ops.segments import build_m_column_batch
    keys = {}
    sizes = []
    for i in range(len(t)):
        for nm, ln in ((t.qname[i], int(t.qlen[i])), (t.tname[i], int(t.tlen[i]))):
            if (nm, ln) not in keys:
                keys[(nm, ln)] = len(sizes)
                sizes.append(ln)
    from paffy_tpu.ops.segments import POOL_GUARD, POOL_W
    offsets = np.concatenate([[0], np.cumsum(sizes)]) + POOL_GUARD
    qoff = np.array([offsets[keys[(t.qname[i], int(t.qlen[i]))]]
                     for i in range(len(t))], dtype=np.int64)
    toff = np.array([offsets[keys[(t.tname[i], int(t.tlen[i]))]]
                     for i in range(len(t))], dtype=np.int64)
    pool_size = -(-(int(offsets[-1]) + POOL_GUARD + 2 * POOL_W) // POOL_W) * POOL_W
    name_off = {nm: int(offsets[k]) for (nm, _), k in keys.items()}
    return build_m_column_batch(t, qoff, toff), pool_size, name_off


def build_host_pool(b, pool_size, seed=7):
    """Host pool: tiled random block + native C synthesis of query bytes
    through the alignment map (~96.5% column match rate)."""
    from paffy_tpu import native
    rng = np.random.default_rng(seed)
    block = np.frombuffer(b"ACGT", dtype=np.uint8)[
        rng.integers(0, 4, size=BLOCK, dtype=np.uint8)]
    reps = pool_size // BLOCK + 1
    host_pool = np.tile(block, reps)[:pool_size]
    t0 = time.time()
    ok = native.synth_query_pool(host_pool, b.lens[: b.n_mops],
                                 b.qpos0[: b.n_mops], b.tpos0[: b.n_mops],
                                 b.rev[: b.n_mops],
                                 keep_per_mille=int(MATCH_RATE * 1000))
    if not ok:
        raise RuntimeError("native library unavailable; cannot synthesize pool")
    log(f"host pool synthesized ({pool_size/1e6:.0f} MB) in {time.time()-t0:.1f}s")
    return host_pool


# ------------------------------------------------------------ kernel bench

def bench_device(host_pool, b, t, iters=40):
    """Upload the pool, run the tiled kernel.

    Correctness: one call with a full host readback, cross-checked against
    the C loop bit-for-bit.  Timing: ``iters`` kernel executions inside ONE
    fori_loop dispatch with per-iteration input variation (chunk arrays
    rotated by the loop index, same total work, defeats CSE) and a final
    scalar fetch — the only methodology that holds up on this runtime
    (block_until_ready can return before remote execution completes, and a
    per-call fetch pays a full tunnel roundtrip that dwarfs the kernel;
    docs/PERF_NOTES.md)."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from paffy_tpu.ops.tiled import (build_packed2_chunk_batch,
                                     build_packed2_pools, build_res_grouped,
                                     _packed2_res_counts)
    from paffy_tpu.ops.mismatch import build_ext_pool

    t0 = time.time()
    pool = jax.device_put(host_pool)
    pool.block_until_ready()
    log(f"pool uploaded in {time.time()-t0:.1f}s to {jax.devices()[0]}")

    t0 = time.time()
    ext = build_ext_pool(pool)
    packed2d, pviews = build_packed2_pools(ext)
    packed2d.block_until_ready()
    log(f"ext + 2-bit packed pools built in {time.time()-t0:.2f}s")

    cb = build_packed2_chunk_batch(b, len(t), pool_len=pool.shape[0])
    g = build_res_grouped(cb)
    log(f"packed tiled: {cb.n_chunks} aligned chunks; residual-grouped "
        f"64 x {g.gp} (+{(64 * g.gp - cb.n_chunks) / cb.n_chunks:.1%} pad)")
    cargs = (jnp.asarray(g.trow), jnp.asarray(g.qwin), jnp.asarray(g.qpar),
             jnp.asarray(g.col_a), jnp.asarray(g.col_b),
             jnp.asarray(g.rec_off), jnp.asarray(g.v_rec))

    t0 = time.time()
    m, x = _packed2_res_counts(packed2d, pviews, *cargs)
    mv, xv = np.asarray(m).astype(np.int64), np.asarray(x).astype(np.int64)
    log(f"device: compile+first+fetch {time.time()-t0:.1f}s")

    @partial(jax.jit, static_argnames=("iters",))
    def loop(p2d, pv, trow, qwin, qpar, col_a, col_b, rec_off, v_rec, iters):
        def body(i, acc):
            # rotate within groups (axis 1): same work, defeats CSE (the
            # per-record segmentation then reads shifted slots — the
            # checksum changes per i but the work shape is identical)
            m, _ = _packed2_res_counts.__wrapped__(
                p2d, pv, jnp.roll(trow, i, axis=1), jnp.roll(qwin, i, axis=1),
                jnp.roll(qpar, i, axis=1), jnp.roll(col_a, i, axis=1),
                jnp.roll(col_b, i, axis=1), rec_off, v_rec)
            return acc + jnp.sum(m.astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    float(loop(packed2d, pviews, *cargs, iters=iters))
    times = []
    for _ in range(3):
        t0 = time.time()
        float(loop(packed2d, pviews, *cargs, iters=iters))
        times.append(time.time() - t0)
    dt = min(times) / iters
    log(f"device: {dt*1e3:.2f} ms/iter ({iters} kernel executions in one "
        f"dispatch, rotated inputs, min of 3) -> {b.n_cols/dt/1e9:.3f} Gcol/s")
    return b.n_cols / dt, mv, xv, (packed2d, pviews)


def bench_baseline(host_pool, b, iters=3):
    """Single-threaded C per-base loop on the identical pool — the
    reference-style CPU comparison point."""
    from paffy_tpu import native
    n_records = int(b.rec[: b.n_mops].max(initial=0)) + 1
    args = (host_pool, b.lens[: b.n_mops], b.qpos0[: b.n_mops],
            b.tpos0[: b.n_mops], b.rev[: b.n_mops], b.rec[: b.n_mops],
            n_records)
    t0 = time.time()
    for _ in range(iters):
        m, x = native.column_compare_counts(*args)
    dt = (time.time() - t0) / iters
    log(f"C baseline: {dt*1e3:.0f} ms/iter -> {b.n_cols/dt/1e6:.1f} Mcol/s")
    return b.n_cols / dt, m, x


# --------------------------------------------------------- end-to-end view

def view_e2e(big_text, host_pool, name_off, device):
    """Full `paffy view -s` pipeline over PAF text: parse -> column batch ->
    per-record counts -> stat lines + aggregate.  ``device`` is
    (packed2d, pviews) for the TPU counts path, or None for the
    single-threaded C loop.  Returns (output bytes, seconds, n_records)."""
    from paffy_tpu import native
    from paffy_tpu.core import pafio
    from paffy_tpu.ops.segments import build_m_column_batch
    from paffy_tpu.ops.transforms import stats_calc_with_m
    from paffy_tpu.commands.view import _f, _ident, _ident_gaps

    t0 = time.time()
    t = pafio.parse_paf_text(big_text)
    qoff = np.array([name_off[n] for n in t.qname], dtype=np.int64)
    toff = np.array([name_off[n] for n in t.tname], dtype=np.int64)
    b = build_m_column_batch(t, qoff, toff)
    if device == "native_mt":      # the threaded production host route
        m, x = native.column_compare_counts_mt(
            host_pool, b.lens[: b.n_mops], b.qpos0[: b.n_mops],
            b.tpos0[: b.n_mops], b.rev[: b.n_mops], b.rec[: b.n_mops],
            len(t))
    elif device is not None:       # (packed2d, pviews): the device kernel
        from paffy_tpu.ops import tiled
        packed2d, pviews = device
        m, x = tiled.packed2_match_counts(packed2d, pviews, b, len(t),
                                          len(host_pool))
        m = m[: len(t)]
        x = x[: len(t)]
    else:                          # single-threaded C reference loop
        m, x = native.column_compare_counts(
            host_pool, b.lens[: b.n_mops], b.qpos0[: b.n_mops],
            b.tpos0[: b.n_mops], b.rev[: b.n_mops], b.rec[: b.n_mops],
            len(t))
    stats, m_op_lens = stats_calc_with_m(t)
    stats["matches"] = stats["matches"] - m_op_lens + m
    stats["mismatches"] = stats["mismatches"] + x
    vals = np.column_stack([
        t.qstart, t.qend, t.tstart, t.tend, t.strand.astype(np.int64),
        t.score, stats["matches"], stats["mismatches"],
        stats["query_inserts"], stats["query_deletes"],
        stats["query_insert_bases"], stats["query_delete_bases"]])
    blob = native.view_stats_lines(t.qname, t.tname, vals)
    tm = int(stats["matches"].sum())
    tx = int(stats["mismatches"].sum())
    tqi = int(stats["query_inserts"].sum())
    tqd = int(stats["query_deletes"].sum())
    tqib = int(stats["query_insert_bases"].sum())
    tqdb = int(stats["query_delete_bases"].sum())
    blob += (
        f"Total-alignments:{len(t)}\tAvg-Identity:{_f(_ident(tm, tx))}"
        f"\tAvg-Identity-with-gaps:{_f(_ident_gaps(tm, tx, tqib, tqdb))}"
        f"\tAligned-bases:{tm+tx}\tAligned-bases-with-gaps:{tm+tx+tqib+tqdb}"
        f"\tQuery-inserts:{tqi}\tQuery-deletes:{tqd}\n").encode()
    return blob, time.time() - t0, len(t)


def bench_view_e2e(text, host_pool, name_off, device, iters=3):
    """Times three view -s e2e routes: the single-thread C reference, the
    device kernel, and the PRODUCTION route (whichever of threaded-native /
    device the bandwidth-aware router picks for this link,
    ops/mismatch.device_counts_predicted_faster)."""
    from paffy_tpu.core import pafio
    from paffy_tpu.ops import mismatch
    from paffy_tpu.ops.segments import build_m_column_batch

    big = text * REP_VIEW
    t = pafio.parse_paf_text(text)
    qoff = np.array([name_off[n] for n in t.qname], dtype=np.int64)
    toff = np.array([name_off[n] for n in t.tname], dtype=np.int64)
    b = build_m_column_batch(t, qoff, toff)
    from types import SimpleNamespace
    big_b = SimpleNamespace(n_cols=b.n_cols * REP_VIEW,
                            n_mops=b.n_mops * REP_VIEW)
    dev_faster = mismatch.device_counts_predicted_faster(big_b)
    prod = device if dev_faster else "native_mt"
    log(f"view routing: measured link {mismatch.transfer_bandwidth()/1e6:.1f}"
        f" MB/s -> production route = "
        f"{'device kernel' if dev_faster else 'threaded native'}")

    base_out, _, n = view_e2e(big, host_pool, name_off, None)
    for mode in (device, prod):   # warm compiles / page in
        out, _, _ = view_e2e(big, host_pool, name_off, mode)
        if out != base_out:
            log(f"ERROR: view e2e {mode!r} output differs from C path!")
            sys.exit(1)
    base_ts, dev_ts, prod_ts = [], [], []
    for _ in range(iters):   # interleaved: see bench_am_e2e
        base_ts.append(view_e2e(big, host_pool, name_off, None)[1])
        dev_ts.append(view_e2e(big, host_pool, name_off, device)[1])
        prod_ts.append(view_e2e(big, host_pool, name_off, prod)[1])
    base_dt, dev_dt, prod_dt = min(base_ts), min(dev_ts), min(prod_ts)
    log(f"view -s e2e x{REP_VIEW} ({n} records): C {base_dt:.2f}s, "
        f"device {dev_dt:.2f}s, production {prod_dt:.2f}s -> "
        f"{n/prod_dt:.0f} rec/s "
        f"({REP_VIEW*124949228/prod_dt/1e9:.2f} Gcol/s e2e); "
        f"outputs byte-identical")
    return (n / prod_dt, base_dt / prod_dt, base_dt / dev_dt,
            "device" if dev_faster else "native_mt")


# ------------------------------------- chain / tile device kernels + pipeline

def bench_chain_device(t, iters=3):
    """Chain DP on device vs host over the shattered golden workload,
    windowed into <=2048-record groups per (qname,tname,strand) in
    processing order (the multichip pipeline's batched-groups shape —
    a single 150k-step scan does not compile on this toolchain,
    docs/PERF_NOTES.md).  Identical (cs, pred) asserted per group."""
    from paffy_tpu.ops.transforms import shatter
    from paffy_tpu.ops.chain import _group_dp, chain_groups_device

    s = shatter(t)
    groups = []
    for sel in (np.nonzero(s.strand)[0], np.nonzero(~s.strand)[0]):
        if len(sel) == 0:
            continue
        sel = sel[np.lexsort((sel, s.qstart[sel]))]
        for lo in range(0, len(sel), 2048):
            w = sel[lo: lo + 2048]
            groups.append((s.qstart[w], s.qend[w], s.tstart[w], s.tend[w],
                           (s.qend[w] - s.qstart[w]).astype(np.int64)))
    args = (5000, 1, 1_000_000)
    # host = the PRODUCTION host route (_group_dp: native windowed DP,
    # numpy fallback without a toolchain) — the honest comparison target
    host = [_group_dp(*g, *args) for g in groups]
    t0 = time.time()
    dev = chain_groups_device(groups, *args)    # compile (persistent cache)
    compile_s = time.time() - t0
    for (hc, hp), (dc, dp_) in zip(host, dev):
        if not (np.array_equal(hc, dc) and np.array_equal(hp, dp_)):
            log("ERROR: chain device DP differs from host DP!")
            sys.exit(1)
    host_ts, dev_ts = [], []
    for _ in range(iters):   # interleaved (docs/PERF_NOTES.md methodology)
        t0 = time.time()
        for g in groups:
            _group_dp(*g, *args)
        host_ts.append(time.time() - t0)
        t0 = time.time()
        chain_groups_device(groups, *args)
        dev_ts.append(time.time() - t0)
    t_host, t_dev = min(host_ts), min(dev_ts)
    xfer = sum(sum(a.nbytes for a in g) for g in groups) * 2  # + windows
    log(f"chain DP ({len(s)} shattered records, {len(groups)} groups x "
        f"<=2048): production host {t_host:.2f}s, device {t_dev:.2f}s "
        f"(first call {compile_s:.0f}s incl. compile; device time is "
        f"~{xfer/1e6:.0f} MB of per-call group arrays over this link) "
        f"-> device/host {t_host/t_dev:.2f}x; results identical")
    kern = bench_chain_kernel_only(groups, args)
    return t_host / t_dev, kern


def bench_chain_kernel_only(groups, dp_args, iters=8):
    """The fair fight (round-4 brief): device scan timed as N executions in
    ONE dispatch over device-RESIDENT group arrays (uploaded once) vs the
    native host DP with windows precomputed — both sides pay kernel time
    only, no transfer, no window building.  int64 and int32 DP variants."""
    import jax
    import jax.numpy as jnp
    from functools import partial
    from paffy_tpu import native
    from paffy_tpu.ops.chain import _window_bounds
    from paffy_tpu.ops.chain_device import build_bucket_args, _dp_scan_groups

    gap_open, gap_extend, max_gap = dp_args
    # host kernel-only: windows precomputed once, native.chain_dp timed alone
    wins = [_window_bounds(g[0], g[1], max_gap) for g in groups]
    for g, (qe_order, lo, hi) in zip(groups, wins):   # warm pages
        native.chain_dp(*g, qe_order, lo, hi, *dp_args)
    host_ts = []
    for _ in range(iters):
        t0 = time.time()
        for g, (qe_order, lo, hi) in zip(groups, wins):
            native.chain_dp(*g, qe_order, lo, hi, *dp_args)
        host_ts.append(time.time() - t0)
    t_host = min(host_ts)

    @partial(jax.jit, static_argnames=("iters", "n_pad", "w_pad"))
    def loop(qs, ts, sc, qe_s, te_s, idx_s, lo, w, pos, iters, n_pad, w_pad):
        def body(i, acc):
            # vary scores by the loop index: same shapes/work, defeats CSE
            cs, _ = _dp_scan_groups.__wrapped__(
                qs, ts, sc + i.astype(sc.dtype), qe_s, te_s, idx_s, lo, w,
                pos, sc.dtype.type(gap_open), sc.dtype.type(gap_extend),
                sc.dtype.type(max_gap), n_pad, w_pad)
            return acc + jnp.sum(cs.astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    out = {"host_kernel_s": round(t_host, 4)}
    for dt, label in ((np.int64, "int64"), (np.int32, "int32")):
        args_np, n_pad, w_pad = build_bucket_args(groups, max_gap, dtype=dt)
        dev_args = tuple(jax.device_put(a) for a in args_np)
        for a in dev_args:
            a.block_until_ready()
        if dt == np.int32:
            # the int32 recurrence must reproduce the host DP exactly
            cs32, pred32 = _dp_scan_groups(
                *dev_args, np.int32(gap_open), np.int32(gap_extend),
                np.int32(max_gap), n_pad=n_pad, w_pad=w_pad)
            cs32, pred32 = np.asarray(cs32), np.asarray(pred32)
            for gi, (g, (qe_order, lo, hi)) in enumerate(zip(groups, wins)):
                hc, hp = native.chain_dp(*g, qe_order, lo, hi, *dp_args)
                n = len(g[0])
                if not (np.array_equal(hc, cs32[gi, :n])
                        and np.array_equal(hp, pred32[gi, :n])):
                    log("ERROR: int32 device chain DP differs from host!")
                    sys.exit(1)
        float(loop(*dev_args, iters=iters, n_pad=n_pad, w_pad=w_pad))
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(loop(*dev_args, iters=iters, n_pad=n_pad, w_pad=w_pad))
            ts.append(time.time() - t0)
        out[f"device_{label}_kernel_s"] = round(min(ts) / iters, 4)
    log(f"chain DP kernel-only (device-resident, {iters} executions/"
        f"dispatch): host {t_host*1e3:.0f} ms, device int64 "
        f"{out['device_int64_kernel_s']*1e3:.0f} ms, int32 "
        f"{out['device_int32_kernel_s']*1e3:.0f} ms -> device_int32/host "
        f"{out['device_int32_kernel_s']/t_host:.2f}x")
    out["device_kernel_vs_host"] = round(
        t_host / out["device_int32_kernel_s"], 3)
    return out


def bench_tile_device(t, iters=3):
    """Tile sweep on device vs the exact host sweep over the golden
    workload (207 records, spans to 7.5M, runs/record to ~10k —
    TILE_K_CAP lifted for the bench so the device scan runs).  Identical
    levels asserted."""
    from paffy_tpu.ops import tile as tile_mod
    from paffy_tpu.ops.coverage import match_intervals
    from paffy_tpu.ops.tile import (_assign_tile_levels_host,
                                    assign_tile_levels, tile_sort_order)

    order = tile_sort_order(t)
    rec, istart, iend = match_intervals(t)
    host = _assign_tile_levels_host(t, order, rec, istart, iend)
    old_cap = tile_mod.TILE_K_CAP
    tile_mod.TILE_K_CAP = 1 << 15
    try:
        t0 = time.time()
        dev = assign_tile_levels(t, order)      # compile (persistent cache)
        compile_s = time.time() - t0
        if list(dev) != list(host):
            log("ERROR: tile device levels differ from host sweep!")
            sys.exit(1)
        host_ts, dev_ts = [], []
        for _ in range(iters):   # interleaved
            t0 = time.time()
            _assign_tile_levels_host(t, order, rec, istart, iend)
            host_ts.append(time.time() - t0)
            t0 = time.time()
            assign_tile_levels(t, order)
            dev_ts.append(time.time() - t0)
    finally:
        tile_mod.TILE_K_CAP = old_cap
    t_host, t_dev = min(host_ts), min(dev_ts)
    log(f"tile sweep ({len(t)} records): production host {t_host:.2f}s, "
        f"device {t_dev:.2f}s (first call {compile_s:.0f}s incl. compile; "
        f"device time is dominated by the [207, 16k] interval upload on "
        f"this link) -> device/host {t_host/t_dev:.2f}x; levels identical")
    return t_host / t_dev


def bench_pipeline_e2e(t, host_pool, name_off, iters=2):
    """The fused per-shard pipeline (add_mismatches | chain | tile | trim,
    tests/paf_pipeline_test.sh:57-60) end-to-end over the shattered golden
    workload with production routing; determinism byte-gated."""
    from paffy_tpu.core import pafio
    from paffy_tpu.ops.transforms import shatter
    from paffy_tpu.parallel.runner import pipeline_stage

    s = shatter(t)
    shim = _PoolShim(host_pool, name_off)
    outs, ts = [], []
    for _ in range(iters):
        t0 = time.time()
        out = pipeline_stage(s, shim)
        ts.append(time.time() - t0)
        outs.append(pafio.serialize_paf(out))
    if any(o != outs[0] for o in outs[1:]):
        log("ERROR: pipeline e2e output not deterministic!")
        sys.exit(1)
    cn = outs[0].count("cn:i:")
    ids = len(set(line.split("cn:i:")[1].split("\t")[0]
                  for line in outs[0].splitlines() if "cn:i:" in line))
    if not (cn == len(s) and ids < cn):
        log("ERROR: pipeline e2e did not form multi-member chains!")
        sys.exit(1)
    dt = min(ts)
    log(f"pipeline e2e ({len(s)} shattered records): {dt:.1f}s -> "
        f"{len(s)/dt:.0f} rec/s; deterministic, multi-member chains formed")
    return len(s) / dt


# ----------------------------------------------- end-to-end add_mismatches

class _PoolShim:
    """Minimal SequencePool stand-in over the benchmark's host pool (the
    native extraction route only touches host_pool + offsets_for)."""

    def __init__(self, host_pool, name_off):
        self.host_pool = host_pool
        self._name_off = name_off

    def offsets_for(self, names, role):
        return np.array([self._name_off[n] for n in names], dtype=np.int64)


def am_e2e(big_text, shim, n_threads):
    """Full `paffy add_mismatches` pipeline: parse -> =/X extraction ->
    CSR rebuild -> serialize.  Returns (output bytes, seconds, n_ops)."""
    from paffy_tpu.core import pafio
    from paffy_tpu.ops.mismatch import encode_mismatches
    t0 = time.time()
    t = pafio.parse_paf_text(big_text)
    te = encode_mismatches(t, shim, n_threads=n_threads)
    out = pafio.serialize_paf(te)
    return out, time.time() - t0, int(t.off[-1])


def bench_am_e2e(text, host_pool, name_off, iters=5):
    # 5 interleaved iterations: this host's effective core count swings
    # minute to minute, and the production (threaded) route only shows its
    # margin in windows with both vCPUs available — min-of-5 samples more
    # load windows than min-of-3 (docs/PERF_NOTES.md timing section)
    big = text * REP_AM
    shim = _PoolShim(host_pool, name_off)
    base_out, _, n_ops = am_e2e(big, shim, n_threads=1)
    prod_out, _, _ = am_e2e(big, shim, n_threads=None)
    if prod_out != base_out:
        log("ERROR: add_mismatches threaded output differs from single-thread!")
        sys.exit(1)
    # interleave the two variants: this host is a shared 2-vCPU box and
    # back-to-back wall times swing ~2x, so paired mins are the fair read
    base_ts, prod_ts = [], []
    for _ in range(iters):
        base_ts.append(am_e2e(big, shim, n_threads=1)[1])
        prod_ts.append(am_e2e(big, shim, n_threads=None)[1])
    base_dt, prod_dt = min(base_ts), min(prod_ts)
    log(f"add_mismatches e2e x{REP_AM} ({n_ops} input ops): 1-thread "
        f"{base_dt:.2f}s, production {prod_dt:.2f}s -> {n_ops/prod_dt/1e6:.2f} "
        f"Mops/s; outputs byte-identical")
    return n_ops / prod_dt, base_dt / prod_dt


def host_bandwidth_probe() -> float:
    """GB/s of a 256 MB numpy copy (min of 3) — this shared 2-vCPU host
    swings 0.2-10 GB/s with neighbor load, so every host-bound number in
    the output is only comparable across runs via this annotation."""
    a = np.ones(256 << 20, dtype=np.uint8)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        b = a.copy()
        best = min(best, time.time() - t0)
        del b
    return round((256 << 20) / best / 1e9, 2)


def main():
    from paffy_tpu.jaxconf import ensure_jax
    ensure_jax()
    hb = host_bandwidth_probe()
    log(f"host memcpy bandwidth probe: {hb} GB/s")
    t, text = load_workload()
    b, pool_size, name_off = build_columns(t)
    log(f"workload: {b.n_cols} alignment columns over {b.n_mops} M runs; "
        f"pool {pool_size/1e6:.0f} MB")
    host_pool = build_host_pool(b, pool_size)
    base_cols_s, m_c, x_c = bench_baseline(host_pool, b)
    ident = m_c.sum() / max(m_c.sum() + x_c.sum(), 1)
    log(f"column identity {ident:.4f} (target ~{MATCH_RATE})")

    dev_cols_s, m_d, x_d, device = bench_device(host_pool, b, t)
    m_d = m_d.astype(np.int64)
    x_d = x_d.astype(np.int64)
    if not (np.array_equal(m_c, m_d[: len(m_c)])
            and np.array_equal(x_c, x_d[: len(x_c)])):
        log("ERROR: device and C results differ!")
        sys.exit(1)
    log("device/C per-record results identical")

    view_rec_s, view_vs, view_dev_vs, view_route = bench_view_e2e(
        text, host_pool, name_off, device)
    am_ops_s, am_vs = bench_am_e2e(text, host_pool, name_off)
    chain_vs, chain_kern = bench_chain_device(t)
    tile_vs = bench_tile_device(t)
    pipe_rec_s = bench_pipeline_e2e(t, host_pool, name_off)

    # committed CLI-audit ratios ride along so BENCH_r*.json carries the
    # vs-reference-binary picture (regenerate: tools/cli_audit.py --fold N)
    audit = {}
    for fold in (16, 64):
        p = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         f"audit{fold}.json")
        try:
            with open(p) as fh:
                audit[f"cli_audit_{fold}x_ratio_vs_ref"] = {
                    r["cmd"]: r["ratio"] for r in json.load(fh)}
        except (OSError, ValueError):
            pass

    print(json.dumps({
        "metric": "alignment_columns_per_second",
        "value": round(dev_cols_s, 1),
        "unit": "columns/s",
        "vs_baseline": round(dev_cols_s / base_cols_s, 3),
        "extra": {
            "view_e2e_records_per_second": round(view_rec_s, 1),
            "view_e2e_vs_single_thread_c": round(view_vs, 3),
            "view_e2e_route": view_route,
            "view_e2e_device_route_vs_single_thread_c": round(view_dev_vs, 3),
            "add_mismatches_e2e_cigar_ops_per_second": round(am_ops_s, 1),
            "add_mismatches_e2e_vs_single_thread": round(am_vs, 3),
            "chain_device_vs_host": round(chain_vs, 3),
            "chain_device_kernel_vs_host": chain_kern,
            "tile_device_vs_host": round(tile_vs, 3),
            "pipeline_e2e_records_per_second": round(pipe_rec_s, 1),
            "host_memcpy_gbps": hb,
            "byte_equality_gates": "passed",
            **audit,
        },
    }))


if __name__ == "__main__":
    main()

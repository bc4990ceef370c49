"""Probe: per-row cost of narrow (64/128 B) vs wide (256 B) row gathers on
the production golden grid — the decisive measurement for a mixed-width
chunk grid (narrow head/tail chunks would cut gathered bytes ~45% IF the
per-row floor stays below ~bytes/bandwidth).

Timing per docs/PERF_NOTES.md: N gathers inside ONE fori_loop dispatch with
rotated indices + a final scalar fetch.
"""

import sys
import time
import pathlib

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from bench import load_workload, build_columns, build_host_pool


def main():
    t, _ = load_workload()
    b, pool_size, _ = build_columns(t)
    host_pool = build_host_pool(b, pool_size)

    from paffy_tpu.jaxconf import ensure_jax
    ensure_jax()
    import jax
    import jax.numpy as jnp
    from functools import partial
    from paffy_tpu.ops.tiled import (build_packed2_chunk_batch,
                                     build_packed2_pools)
    from paffy_tpu.ops.mismatch_device import build_ext_pool

    pool = jax.device_put(host_pool)
    pool.block_until_ready()
    print(f"pool up: {pool.shape[0]/1e6:.0f} MB on {jax.devices()[0]}",
          file=sys.stderr)
    ext = build_ext_pool(pool)
    packed2d, pviews = build_packed2_pools(ext)
    packed2d.block_until_ready()
    cb = build_packed2_chunk_batch(b, len(t), pool_len=pool.shape[0])
    U = cb.n_chunks
    print(f"grid: {U} chunks; packed2d {packed2d.shape}, "
          f"pviews {pviews.shape}", file=sys.stderr)

    rng = np.random.default_rng(3)

    @partial(jax.jit, static_argnames=("iters",))
    def gloop(arr2d, rows, iters):
        n = arr2d.shape[0]

        def body(i, acc):
            r = (rows + i) % n
            g = arr2d[r]
            return acc + jnp.sum(g.astype(jnp.float32))
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    def timeit(arr2d, rows, iters=30):
        rows = jnp.asarray(rows)
        float(gloop(arr2d, rows, iters=iters))
        ts = []
        for _ in range(3):
            t0 = time.time()
            float(gloop(arr2d, rows, iters=iters))
            ts.append(time.time() - t0)
        return min(ts) / iters

    trow = cb.trow[:U].astype(np.int64)
    results = {}
    # wide: the production 256B-row target gather
    dt = timeit(packed2d, trow.astype(np.int32))
    results["w256_prod"] = (U, 256, dt)
    # narrow 64B: same bytes touched, 4x rows (the reshape is free)
    n64 = packed2d.reshape(-1, 64)
    rows64 = (trow[:, None] * 4 + np.arange(4)[None, :]).reshape(-1)
    dt = timeit(n64, rows64.astype(np.int32))
    results["w64_4x_rows"] = (4 * U, 64, dt)
    # narrow 64B at SAME row count (the mixed-grid scenario: U narrow chunks)
    dt = timeit(n64, (trow * 4).astype(np.int32))
    results["w64_U_rows"] = (U, 64, dt)
    # narrow 128B at 2x rows
    n128 = packed2d.reshape(-1, 128)
    rows128 = (trow[:, None] * 2 + np.arange(2)[None, :]).reshape(-1)
    dt = timeit(n128, rows128.astype(np.int32))
    results["w128_2x_rows"] = (2 * U, 128, dt)
    # narrow 128 at U rows
    dt = timeit(n128, (trow * 2).astype(np.int32))
    results["w128_U_rows"] = (U, 128, dt)
    # random order narrow (worst case locality)
    dt = timeit(n64, rng.permutation(rows64).astype(np.int32))
    results["w64_4x_random"] = (4 * U, 64, dt)
    # query views wide (320B production)
    qrow = ((cb.qpar[:U].astype(np.int64) * 4
             + ((cb.qwin[:U].astype(np.int64) & 255) >> 6))
            * (pviews.shape[0] // 16)
            + np.clip(cb.qwin[:U].astype(np.int64) >> 8, 0,
                      pviews.shape[0] // 16 - 1))
    dt = timeit(pviews, qrow.astype(np.int32))
    results["q320_prod"] = (U, 320, dt)

    for k, (rows, w, dt) in results.items():
        gbs = rows * w / dt / 1e9
        print(f"{k:16s} rows={rows:8d} width={w:4d} {dt*1e3:7.2f} ms "
              f"{gbs:6.1f} GB/s  {dt/rows*1e9:6.2f} ns/row")


if __name__ == "__main__":
    main()

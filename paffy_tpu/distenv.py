"""Env-gated ``jax.distributed`` bring-up (leaf module, no package imports).

``jax.distributed.initialize`` must run BEFORE any JAX backend is
initialized; ``paffy_tpu/__init__`` touches devices (the platform pin), so
the bring-up lives here and is called first thing from the package init.

Set on every process:
  PAFFY_TPU_COORDINATOR    host:port of process 0
  PAFFY_TPU_NUM_PROCESSES  world size
  PAFFY_TPU_PROCESS_ID     this process's rank

With none set this is a no-op and everything runs single-process — the
reference's shell pipeline run on one machine (tests/paf_pipeline_test.sh).
"""

from __future__ import annotations

import os

_INITIALIZED = False


def initialize_from_env() -> bool:
    """Idempotent; returns True when a multi-process runtime is active."""
    global _INITIALIZED
    coord = os.environ.get("PAFFY_TPU_COORDINATOR")
    if coord is None:
        return False
    if _INITIALIZED:
        return True
    import jax

    nproc = int(os.environ["PAFFY_TPU_NUM_PROCESSES"])
    pid = int(os.environ["PAFFY_TPU_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=coord,
                               num_processes=nproc, process_id=pid)
    _INITIALIZED = True
    return True


def coordination_barrier(name: str, timeout_ms: int = 3_600_000) -> bool:
    """Cross-process barrier over the coordination service (no device
    collectives — works on any backend, including the CPU mesh used by the
    multi-process tests).  Returns False when not running multi-process."""
    if not _INITIALIZED:
        return False
    try:
        from jax._src import distributed as _dist
        client = _dist.global_state.client
    except Exception:
        client = None
    if client is None:
        # fall back to a device collective barrier
        import jax
        from jax.experimental import multihost_utils
        if jax.process_count() > 1:
            multihost_utils.sync_global_devices(name)
        return True
    client.wait_at_barrier(name, timeout_in_ms=timeout_ms)
    return True

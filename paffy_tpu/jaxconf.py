"""Deferred JAX bring-up.

Importing JAX costs >1 s, and this environment's ``sitecustomize`` imports
it into EVERY python process — so host-only commands (invert, dedupe, trim,
filter, shatter, split_file, dechunk, upconvert, the faffy trio) would pay
an accelerator tax for work that never touches a device.  The CLI launchers
therefore run ``python -S`` (skipping sitecustomize) and every module that
defines device code calls :func:`ensure_jax` before ``import jax``:

  * re-imports ``sitecustomize`` when it was skipped (that is where the
    environment registers its TPU PJRT plugin);
  * brings up ``jax.distributed`` from the env (must precede backend init);
  * enables x64 (PAF coordinates are int64), the persistent compile cache,
    and the PAFFY_TPU_PLATFORM default-device pin.

Idempotent and cheap after the first call.
"""

from __future__ import annotations

import os
import sys

_DONE = False


def ensure_jax() -> None:
    global _DONE
    if _DONE:
        return
    _DONE = True
    if "sitecustomize" not in sys.modules:
        try:
            import sitecustomize  # noqa: F401  (environment plugin hooks)
        except ImportError:
            pass
    from paffy_tpu.distenv import initialize_from_env
    initialize_from_env()

    import jax

    # Coordinates/scores are int64 in the PAF data model; enable 64-bit
    # types everywhere (per-column device tensors still use int32).
    jax.config.update("jax_enable_x64", True)

    # Optional platform pin (e.g. PAFFY_TPU_PLATFORM=cpu for hermetic CLI
    # tests — the TPU plugin ignores JAX_PLATFORMS, so pin the device).
    plat = os.environ.get("PAFFY_TPU_PLATFORM")
    if plat:
        try:
            jax.config.update("jax_default_device",
                              jax.local_devices(backend=plat)[0])
        except RuntimeError:
            pass

    # Persistent compilation cache: TPU compiles of the big kernels take
    # minutes through the remote tunnel; cache them across processes.
    cache_dir = os.environ.get("PAFFY_TPU_COMPILE_CACHE",
                               os.path.expanduser("~/.cache/paffy_tpu_xla"))
    if cache_dir:
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs",
                              1.0)
        except Exception:  # older jax without these options
            pass

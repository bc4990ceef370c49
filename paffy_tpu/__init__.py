"""paffy-tpu: a TPU-native PAF/FASTA processing engine.

A from-scratch JAX/XLA/Pallas framework with the full capability surface of
ComparativeGenomicsToolkit/paffy (see SURVEY.md): batched PAF records are held
as SoA/CSR tensors, per-column work (mismatch encoding, coverage, stats,
trimming) runs as vectorized device kernels, and the chaining DP / tile sweep
run as scan kernels, data-parallel over a device mesh.
"""

__version__ = "0.1.0"

import jax as _jax

# Coordinates/scores are int64 in the PAF data model; enable 64-bit types
# everywhere (per-column device tensors still use int32 where safe).
_jax.config.update("jax_enable_x64", True)

# Multi-process bring-up must precede any backend init (the platform pin
# below touches devices) — no-op unless PAFFY_TPU_COORDINATOR is set.
from paffy_tpu.distenv import initialize_from_env as _dist_init  # noqa: E402

_dist_init()

# Optional platform pin (e.g. PAFFY_TPU_PLATFORM=cpu for hermetic CLI tests —
# the axon TPU plugin ignores JAX_PLATFORMS, so pin the default device).
import os as _os  # noqa: E402

_plat = _os.environ.get("PAFFY_TPU_PLATFORM")
if _plat:
    try:
        _jax.config.update("jax_default_device", _jax.local_devices(backend=_plat)[0])
    except RuntimeError:
        pass

# Persistent compilation cache: TPU compiles of the big kernels take minutes
# through the remote tunnel; cache them across processes.
_cache_dir = _os.environ.get("PAFFY_TPU_COMPILE_CACHE",
                             _os.path.expanduser("~/.cache/paffy_tpu_xla"))
if _cache_dir:
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # older jax without these options
        pass

from paffy_tpu.core.model import PafTable  # noqa: E402,F401
from paffy_tpu.core import pafio, fasta    # noqa: E402,F401

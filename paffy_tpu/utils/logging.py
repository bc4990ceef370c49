"""Leveled logging matching the reference's sonLib logger semantics.

The reference sets a process-wide level from the --logLevel flag
(st_setLogLevelFromString) with levels off/critical/info/debug; messages go to
stderr.  We map onto Python logging with the same level names and an
``st_log*``-shaped helper API so command modules read like their reference
counterparts' logging contract (SURVEY.md section 5).
"""

from __future__ import annotations

import logging
import sys
import time

_LEVELS = {
    None: logging.CRITICAL,
    "off": logging.CRITICAL + 10,
    "critical": logging.CRITICAL,
    "info": logging.INFO,
    "debug": logging.DEBUG,
}

logger = logging.getLogger("paffy_tpu")
_handler = logging.StreamHandler(sys.stderr)
_handler.setFormatter(logging.Formatter("%(message)s"))
logger.addHandler(_handler)
logger.setLevel(logging.CRITICAL)


def set_log_level_from_string(level: str | None) -> None:
    key = level.lower() if isinstance(level, str) else level
    if key not in _LEVELS:
        raise ValueError(f"Unrecognised log level: {level}")
    logger.setLevel(_LEVELS[key])


def get_log_level() -> int:
    return logger.level


def log_info(msg: str, *args) -> None:
    logger.info(msg, *args)


def log_debug(msg: str, *args) -> None:
    logger.debug(msg, *args)


def log_critical(msg: str, *args) -> None:
    logger.critical(msg, *args)


def debug_enabled() -> bool:
    return logger.isEnabledFor(logging.DEBUG)


class CommandTimer:
    """Wall-clock elapsed reporting per command, mirroring the reference's
    '<tool> is done!, N seconds have elapsed' info lines.

    Setting PAFFY_TPU_PROFILE=<dir> additionally captures a jax profiler
    trace for the command (the tracing hook promised in SURVEY.md section 5;
    view with tensorboard or xprof)."""

    def __init__(self, name: str):
        import os
        self.name = name
        self.start = time.time()
        self._trace_dir = os.environ.get("PAFFY_TPU_PROFILE")
        if self._trace_dir:
            import jax
            jax.profiler.start_trace(self._trace_dir)

    def done(self) -> None:
        if self._trace_dir:
            import jax
            jax.profiler.stop_trace()
            log_info("profiler trace written to %s", self._trace_dir)
        log_info("%s is done!, %d seconds have elapsed",
                 self.name, int(time.time() - self.start))

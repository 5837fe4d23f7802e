"""Persistent compile cache: make repeated runs on the same topology cheap.

SURVEY.md §7 calls for caching compiled programs "by topology hash".  The
stamp compiler already bakes each netlist topology's index tensors into the
XLA program as constants, so the serialized program *is* the topology hash —
XLA's own persistent compilation cache (keyed on program + compile options +
backend) therefore keys exactly on (topology, dtype, method, backend) with
no hand-rolled layer on top.  This module just turns it on at a stable
location.

Why it matters: a fresh process pays full lowering + compile for every
netlist (NOTES.md: ~144 s cold for the 1M-grid multigrid program on the
remote TPU; seconds for CPU LU programs).  With the cache enabled, the
second `nodal-solver` invocation on the same topology skips compilation
entirely — visible in ``--stats`` as compile+solve collapsing to the pure
solve time.

Environment knobs:

* ``NODAL_TPU_CACHE_DIR`` — cache location (default ``~/.cache/nodal_tpu/xla``)
* ``NODAL_TPU_NO_CACHE=1`` — disable entirely
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "nodal_tpu", "xla"
)

#: Programs cheaper than this to compile are not persisted (litter control).
_MIN_COMPILE_SECS = 0.2

_enabled_dir: str | None = None


def enable_persistent_cache(path: str | None = None) -> str | None:
    """Enable XLA's persistent compilation cache; returns the cache dir.

    Idempotent; respects ``NODAL_TPU_NO_CACHE``.  Safe to call before or
    after backends initialize (the cache is consulted per-compilation).
    """
    global _enabled_dir
    if os.environ.get("NODAL_TPU_NO_CACHE"):
        return None
    if path is None:
        path = os.environ.get("NODAL_TPU_CACHE_DIR", _DEFAULT_DIR)
    if _enabled_dir == path:
        return path

    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", _MIN_COMPILE_SECS
        )
        # Persist small-but-slow programs too (default gates on entry size).
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # pragma: no cover - config drift across versions
        logger.warning("persistent compile cache unavailable: %s", e)
        return None
    _enabled_dir = path
    return path

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


def _host_fingerprint() -> str:
    """Short stable hash of this host's CPU feature set.

    XLA:CPU persists AOT-compiled executables whose machine features are
    baked in at compile time; replaying them on a CPU with a different
    feature set logs "could lead to execution errors such as SIGILL" per
    load (round-2 review "What's weak" #3 — the driver bench tail was full
    of them).  Salting the cache directory per host feature-set keeps each
    machine's cache self-consistent while still sharing TPU executables
    across runs on the same host.
    """
    import hashlib
    import platform

    feats = ""
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith(("flags", "Features")):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
    except OSError:  # pragma: no cover - non-Linux hosts
        pass
    raw = f"{platform.machine()}|{feats}"
    return hashlib.sha1(raw.encode()).hexdigest()[:12]

#: Programs cheaper than this to compile are not persisted (litter control).
_MIN_COMPILE_SECS = 0.2


def _exclude_cpu_backend() -> None:
    """Skip persistence for CPU-backend programs entirely.

    A serialized XLA:CPU executable IS an AOT result with the compile-time
    LLVM target features baked in — including tuning pseudo-features
    (+prefer-no-scatter/+prefer-no-gather) that can never appear in
    /proc/cpuinfo, so *every* cache load logs two "could lead to execution
    errors such as SIGILL" errors, even replaying on the very host that
    compiled it (verified here; dir-salting and
    jax_persistent_cache_enable_xla_caches=none don't help because the
    feature record lives in the executable, not a sub-cache).  CPU
    compiles are sub-second for the programs this framework routes to the
    host anyway — only the remote-TPU executables (measured 107.8 s cold →
    3.0 s warm, NOTES.md) are worth persisting.  jax has no per-backend
    knob, so wrap the one predicate its compiler consults
    (jax/_src/compiler.py `_get_cache_key` → `is_cache_used(backend)`).
    """
    try:
        from jax._src import compilation_cache as _cc

        orig = _cc.is_cache_used
        if getattr(orig, "_nodal_tpu_cpu_excluded", False):
            return

        def is_cache_used(backend):
            if getattr(backend, "platform", None) == "cpu":
                return False
            return orig(backend)

        is_cache_used._nodal_tpu_cpu_excluded = True
        _cc.is_cache_used = is_cache_used
    except Exception:  # pragma: no cover - private API drift: keep caching
        logger.debug("could not exclude cpu backend from persistent cache",
                     exc_info=True)

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
        # Host-feature salt (explicit paths are taken verbatim): stale
        # same-path caches from differently-featured CPUs would otherwise
        # replay mismatched AOT executables with SIGILL warnings.
        path = os.path.join(path, _host_fingerprint())
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
        try:
            # Keep the jax-level program cache but drop XLA's own AOT
            # sub-caches: XLA:CPU AOT results persist compile-machine
            # feature flags (incl. remote-compile-service pseudo-features
            # like +prefer-no-scatter) and warn "could lead to ... SIGILL"
            # on every load from a differently-featured host (round-2
            # review "What's weak" #3 — the driver bench tail).
            jax.config.update("jax_persistent_cache_enable_xla_caches",
                              "none")
        except Exception:  # pragma: no cover - option name drifts
            pass
        _exclude_cpu_backend()
    except Exception as e:  # pragma: no cover - config drift across versions
        logger.warning("persistent compile cache unavailable: %s", e)
        return None
    _enabled_dir = path
    return path

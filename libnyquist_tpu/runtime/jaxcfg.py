"""Shared JAX configuration for the device ops.

Enables the persistent compilation cache so shape-bucketed kernels
(ADPCM scans, synthesis matmuls, SRC) compile once per machine instead
of once per process — first-compile on a TPU behind a slow link costs
tens of seconds.  Opt out with LIBNYQUIST_NO_JAX_CACHE=1.
"""

from __future__ import annotations

import os

_done = False


def ensure_jax_cache() -> None:
    global _done
    if _done:
        return
    _done = True
    if os.environ.get("LIBNYQUIST_NO_JAX_CACHE"):
        return
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir", default_cache_dir())
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def serving_jit(fn):
    """jit for the big fused serving programs (Opus replay+synthesis).

    On TPU these compile at optimization_level=1: the default effort's
    memory-fitting/scheduling search runs for tens of minutes on the
    ~20k-instruction fused program while O1 finishes in ~4 min and the
    generated code is within noise for this bandwidth-bound program
    (the hot loops are scans + elementwise; there is no MXU schedule
    to win back).  Override with LIBNYQUIST_TPU_OPT_LEVEL=default.
    CPU/interpreter backends ignore the option (tests, fallback)."""
    import jax

    lvl = os.environ.get("LIBNYQUIST_TPU_OPT_LEVEL", "1")
    try:
        if lvl != "default" and jax.default_backend() not in (
                "cpu", "interpreter"):
            return jax.jit(
                fn, compiler_options={"optimization_level": int(lvl)})
    except Exception:
        pass
    return jax.jit(fn)


def default_cache_dir() -> str:
    """Persistent cache location.  The home cache dir survives /tmp
    cleanup between sessions — the fused serving program costs minutes
    of XLA compile behind a slow tunnel, so losing the cache turns a
    sub-deadline bench run into a fallback."""
    return os.environ.get(
        "LIBNYQUIST_JAX_CACHE_DIR",
        os.path.join(os.path.expanduser("~"), ".cache",
                     "libnyquist_jaxcache"))

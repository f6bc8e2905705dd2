"""Tracing and profiling utilities.

New capability over the reference (SURVEY.md section 5: the reference has no
tracing/profiling beyond tqdm bars and dead thop FLOP hooks,
unet_ffhq.py:379-396). Wraps jax.profiler traces and named scopes around
the sampler hot loops, plus a simple wall-clock/FLOP reporter.
"""
from __future__ import annotations

import contextlib
import json
import time
from typing import Optional

import jax


def enable_persistent_cache(path: Optional[str] = None) -> Optional[str]:
    """Turn on JAX's on-disk XLA compilation cache so repeat runs of the
    same program (bench, CLI restarts, orbax-resumed samplers) skip the
    multi-minute TPU compile. New capability over the reference (which has
    no compile step at all). Safe no-op if the backend rejects it.

    Override the location with $JAX_COMPILATION_CACHE_DIR; returns the
    directory used, or None if the cache could not be enabled."""
    import os

    # Default to a per-user cache dir: XLA deserializes compiled
    # executables from this cache, so a world-writable fixed /tmp path
    # would let another local user plant a poisoned entry.
    default = os.path.join(os.path.expanduser("~"), ".cache",
                           "nshmc_jax_cache")
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", default)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache everything that took >5s to compile; tiny programs stay out
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return path
    except Exception:
        return None


@contextlib.contextmanager
def trace(dirname: str = "/tmp/nshmc_trace"):
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(dirname)
    try:
        yield dirname
    finally:
        jax.profiler.stop_trace()


def named(name: str):
    """Annotate a region so it shows up in profiler timelines; usable as a
    context manager around sampler phases (leapfrog / energy / metrics)."""
    return jax.profiler.TraceAnnotation(name)


scope = jax.named_scope  # compile-time scope for HLO readability


class Timer:
    """Wall-clock timing with device synchronization."""

    def __init__(self):
        self.records = {}

    @contextlib.contextmanager
    def time(self, name: str, sync=None):
        t0 = time.time()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.records.setdefault(name, []).append(time.time() - t0)

    def summary(self) -> dict:
        import numpy as np

        return {
            k: {"mean_s": float(np.mean(v)), "n": len(v),
                "total_s": float(np.sum(v))}
            for k, v in self.records.items()
        }

    def dump(self, path: Optional[str] = None):
        s = json.dumps(self.summary(), indent=2)
        if path:
            with open(path, "w") as f:
                f.write(s)
        return s


def compiled_flops(fn, *args) -> Optional[float]:
    """XLA's own FLOP estimate for a jitted function, for utilization
    accounting in bench reports. Returns None when the backend does not
    expose cost analysis."""
    try:
        jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
        compiled = jitted.lower(*args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", None))
    except Exception:
        return None

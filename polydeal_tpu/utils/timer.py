"""Named-scope wall timing — the TimerOutput analogue.

The reference instruments phases with deal.II ``TimerOutput`` scopes and
MPI-aggregated summaries (monodomain_DG3D.cc:651,787-790).  Here a simple
host-side scope timer with a printable summary; device work is closed out
with ``jax.block_until_ready`` so timings are honest.

:func:`chained_cost` measures the PER-APPLICATION device cost of a
jittable step — the methodology every bench tool uses: a single jitted
call through a remote/tunneled device pays a fixed dispatch round-trip
(~35 ms measured through the axon tunnel), so per-op cost must be the
SLOPE between two chained-``lax.scan`` lengths, not a single-call time.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

__all__ = ["Timer", "chained_cost"]


def chained_cost(step_fn, x0, *operands, n_small: int = 8,
                 n_large: int = 64, reps: int = 3) -> float:
    """Seconds per application of ``step_fn`` (x -> x, jittable), free of
    dispatch/tunnel round-trip latency.

    Runs ``lax.scan`` chains of two lengths and returns
    ``(t(n_large) - t(n_small)) / (n_large - n_small)``; each chain is
    compiled and warmed first and timed with a host read (best of
    ``reps``), so neither compile time nor async dispatch can leak in.

    Large loop-invariant pytrees (matrices, tables) must be passed as
    extra ``operands`` — ``step_fn(x, *operands)`` — NOT captured by
    closure: closure capture inlines them as program CONSTANTS, which
    bloats the MLIR shipped to the (remote) compiler by their full byte
    size and can crash it outright at 10^8-byte operands.
    """
    import jax
    import jax.numpy as jnp

    def chain_time(n):
        f = jax.jit(lambda x, *ops: jax.lax.scan(
            lambda c, _: (step_fn(c, *ops), None), x, None, length=n)[0])
        r = f(x0, *operands)
        jax.block_until_ready(r)
        float(jnp.sum(jax.tree.leaves(r)[0]))  # host read: remote done
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            r = f(x0, *operands)
            float(jnp.sum(jax.tree.leaves(r)[0]))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t1 = chain_time(n_small)
    t2 = chain_time(n_large)
    return (t2 - t1) / (n_large - n_small)


class Timer:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextmanager
    def scope(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                import jax

                jax.block_until_ready(sync)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        lines = ["+---------------------------------+------------+-------+"]
        lines.append("| scope                           | total [s]  | calls |")
        lines.append("+---------------------------------+------------+-------+")
        for k in sorted(self.totals, key=self.totals.get, reverse=True):
            lines.append(f"| {k:<31} | {self.totals[k]:>10.4f} | {self.counts[k]:>5} |")
        lines.append("+---------------------------------+------------+-------+")
        return "\n".join(lines)


def enable_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Enable jax's persistent compilation cache for NON-CPU backends.

    The MG setup is compile-dominated: build_multigrid creates fresh
    closure-jits per call, so the in-memory executable cache never hits
    across setups, while the persistent cache keys on the HLO
    fingerprint and does (measured: the bench's structured arm re-uses
    every program shape the rtree arm compiled).  Gated off on CPU:
    XLA:CPU's AOT loader intermittently aborts on cache entries whose
    recorded machine features disagree with the host (see
    tests/conftest.py) — that failure mode is CPU-specific.

    Returns the cache dir in effect, or None when skipped (CPU backend
    or POLYDEAL_JAX_CACHE=0)."""
    import os

    import jax

    if os.environ.get("POLYDEAL_JAX_CACHE", "") == "0":
        return None
    if jax.default_backend() == "cpu":
        return None
    cache_dir = (cache_dir or os.environ.get("POLYDEAL_JAX_CACHE")
                 or os.path.expanduser("~/.cache/polydeal_tpu_xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return cache_dir

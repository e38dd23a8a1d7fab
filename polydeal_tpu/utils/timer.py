"""Named-scope wall timing — the TimerOutput analogue.

The reference instruments phases with deal.II ``TimerOutput`` scopes and
MPI-aggregated summaries (monodomain_DG3D.cc:651,787-790).  Here a simple
host-side scope timer with a printable summary; device work is closed out
with ``jax.block_until_ready`` so timings are honest.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager

__all__ = ["Timer"]


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

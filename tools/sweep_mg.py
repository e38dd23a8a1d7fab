"""Smoother-schedule sweep on the bench configuration.

Builds the bench's rtree (or structured) setup ONCE, then times the
fused assemble+solve program for a grid of (chebyshev_degree, n_smooth,
smoothing_range) variants — the Multigrid object is re-derived from the
one setup (eigenvalue estimates are range-independent: lam = lo*range),
so each variant costs one compile + 3 timed runs instead of a full
setup.

Env: SWEEP_HIERARCHY=rtree|structured, SWEEP_N.
"""
import os, sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import sys


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import bench

    hierarchy = os.environ.get("SWEEP_HIERARCHY", "rtree")
    n = int(os.environ.get("SWEEP_N", "64"))

    variants = [
        ("5", "1", 20.0),
        ("5", "1", 12.0),
        ("5", "1", 30.0),
        ("7,3", "1", 20.0),
        ("7", "1", 20.0),
        ("3", "1", 20.0),
        ("5,2", "1", 20.0),
        ("3", "2", 20.0),
    ]
    results = {}
    for cheb, ns, rng in variants:
        os.environ["BENCH_SMOOTH_RANGE"] = str(rng)
        key = f"cheb={cheb} ns={ns} range={rng}"
        try:
            out = bench.bench_poisson(
                hierarchy, n, 1, 1e-8, cheb, ns, "bfloat16")
        except Exception as e:  # keep sweeping past a bad config
            log(f"{key}: FAILED {e}")
            continue
        results[key] = out
        log(f"{key}: {out['dof_per_s']/1e6:.2f}M DoF/s "
            f"iters={out['iterations']} t={out['elapsed_s']}s")
    best = max(results.items(), key=lambda kv: kv[1]["dof_per_s"])
    log(f"BEST {best[0]}: {best[1]['dof_per_s']/1e6:.2f}M DoF/s")


if __name__ == "__main__":
    main()

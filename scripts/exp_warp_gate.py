"""Warp-geometry decision sweep: the SHIPPED quality gate + rife fps per
window geometry (round 5).

bench_all at the (16,256) default measured the composed fast-vs-exact gate
at 0.950 (was 0.9967 at round-4's (32,384)): IFNet's internal random-weight
flows are jagged enough that the 16-row window clamps ~7% of warp pixels
(tests/test_warp_mxu.py). This sweeps wh in {16, 24, 32} at ww=256 via the
DRBA_WARP_WIN import hook (ops/warp_mxu.py), measuring per geometry:
the composed gate (bench.gate_composed) and the rife headline window fps.
Decision rule: smallest wh whose gate >= 0.995.

    python scripts/exp_warp_gate.py            # sweep
    python scripts/exp_warp_gate.py 24 256     # one geometry
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

GEOMS = [(16, 256), (24, 256), (32, 256)]


def run_one():
    # must be set before bench/model imports (the hook reads it at
    # warp_mxu import time)
    os.environ.setdefault("DRBA_WARP_WIN", f"{sys.argv[1]},{sys.argv[2]}")
    import bench

    gate = bench.gate_composed()
    print(f"gate {os.environ['DRBA_WARP_WIN']}: {gate}", flush=True)
    fps = bench.bench_rife(n_windows=8)
    print(f"rife fps {os.environ['DRBA_WARP_WIN']}: {fps:.2f}", flush=True)


def main():
    if len(sys.argv) == 3:
        run_one()
        return
    here = os.path.abspath(__file__)
    for wh, ww in GEOMS:
        env = dict(os.environ, DRBA_WARP_WIN=f"{wh},{ww}")
        r = subprocess.run([sys.executable, here, str(wh), str(ww)],
                           env=env, timeout=3000)
        print(f"geom ({wh},{ww}) rc={r.returncode}", flush=True)


if __name__ == "__main__":
    main()

"""Bisect the round-3 rife regression (13.7 -> 9.29 fps, BENCH_r02 -> r03).

Times bench.bench_rife under backend-kill-switch variants in ONE process so
the compilation cache and tunnel conditions are shared. Round-3 rife-path
suspects and their switches:

  - IFNet ResConv conv-chains (62bc39d/c979590)  -> conv_backend="xla"
  - MXU warp: tent weights + fused downsample + adaptive bounds
    (39d034b/778f005/bd83b61)                     -> warp_backend="gather"
  - splat v4 / batched splat invocations / lastconv fold / batched
    direction warps: UNCONDITIONAL (no switch) — isolated by comparing the
    all-switches-off variant against the round-2 worktree run.

Usage: python scripts/exp_bisect_r3.py [n_windows]
"""

import dataclasses
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
import drba_tpu.config as _cfg

N = int(sys.argv[1]) if len(sys.argv) > 1 else 24

VARIANTS = [
    ("default", {}),
    ("conv=xla", {"conv_backend": "xla"}),
    ("warp=gather", {"warp_backend": "gather"}),
    ("warp=gather,conv=xla", {"warp_backend": "gather", "conv_backend": "xla"}),
]

base = _cfg.DEFAULT
results = {}
for name, kw in VARIANTS:
    _cfg.DEFAULT = dataclasses.replace(base, **kw)
    t0 = time.perf_counter()
    fps = bench.bench_rife(n_windows=N)
    wall = time.perf_counter() - t0
    results[name] = round(fps, 3)
    print(f"[bisect] {name}: {fps:.3f} fps (wall {wall:.0f}s incl compile)",
          flush=True)

_cfg.DEFAULT = base
print(json.dumps(results))

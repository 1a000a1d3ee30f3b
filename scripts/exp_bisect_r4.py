"""Round-4 bisect of the rife regression (13.7 -> 9.3 fps, BENCH_r02 -> r03).

Round 3 shipped its kernel set TPU-timing-unvalidated (tunnel outage); the
r03 headline measured 9.29 fps while the breakdown's 13.704 was round-2's
stale number, so EVERY r3 rife-path commit is suspect. This runs each
variant in its OWN subprocess so

  - a compile OOM in one variant (round 3's warp=gather fallback OOMs at
    1080p bf16) cannot kill the rest of the sweep, and
  - trace-time env switches (DRBA_WARP_ADAPTIVE) take effect per run
    (jit caches would pin the first value in a shared process).

Variants:
  r2_worktree   bench_rife at the round-2 snapshot (.worktrees/r2) — if THIS
                lands near 9.3 too, the regression is environmental, not code
  default       main, production defaults
  warp_static   main, DRBA_WARP_ADAPTIVE=0: monolithic per-row matmul instead
                of dynamic-trip tap-block loops (suspect #1: the adaptive
                bounds' (c*8,128) fragments underfill the MXU, 778f005)
  warp_gather   main, warp_backend=gather (prices the MXU kernel wholesale)
  conv_xla      main, conv_backend=xla (re-run for same-session comparability;
                measured 9.17 on 2026-08-19, i.e. NOT the regression)

Usage: python scripts/exp_bisect_r4.py [n_windows] [variant ...]
"""

import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N = 16
names = []
for a in sys.argv[1:]:
    if a.isdigit():
        N = int(a)
    else:
        names.append(a)

CHILD = """
import dataclasses, json, sys
import drba_tpu.config as cfg
kw = json.loads(sys.argv[1])
if kw:
    cfg.DEFAULT = dataclasses.replace(cfg.DEFAULT, **kw)
import bench
fps = bench.bench_rife(n_windows=int(sys.argv[2]))
print("RESULT " + json.dumps({"fps": round(fps, 3)}))
"""

VARIANTS = {
    "r2_worktree": (os.path.join(ROOT, ".worktrees", "r2"), {}, {}),
    "default": (ROOT, {}, {}),
    "warp_static": (ROOT, {}, {"DRBA_WARP_ADAPTIVE": "0"}),
    "warp_gather": (ROOT, {"warp_backend": "gather"}, {}),
    "conv_xla": (ROOT, {"conv_backend": "xla"}, {}),
}

if not names:
    names = ["default", "warp_static", "r2_worktree", "warp_gather"]

results = {}
for name in names:
    cwd, kw, env_extra = VARIANTS[name]
    env = dict(os.environ)
    env.update(env_extra)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(ROOT, ".jax_cache"))
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, "-c", CHILD, json.dumps(kw), str(N)],
        cwd=cwd, env=env, capture_output=True, text=True, timeout=2400,
    )
    wall = time.perf_counter() - t0
    fps = None
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT "):
            fps = json.loads(line[len("RESULT "):])["fps"]
    if fps is None:
        tail = (proc.stderr or proc.stdout).strip().splitlines()[-12:]
        print(f"[bisect] {name}: FAILED rc={proc.returncode} "
              f"(wall {wall:.0f}s)\n  " + "\n  ".join(tail), flush=True)
        results[name] = {"error": proc.returncode}
    else:
        print(f"[bisect] {name}: {fps:.3f} fps (wall {wall:.0f}s incl "
              "compile)", flush=True)
        results[name] = {"fps": fps}

print(json.dumps(results))

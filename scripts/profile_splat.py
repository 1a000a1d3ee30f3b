"""Micro-bench of splat_planes_stencil configs + gmfss_inference localization."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import functools

import jax
import jax.numpy as jnp
import numpy as np

from drba_tpu.ops.splat_stencil import splat_planes_stencil, _VMEM_BUDGET, _round_up, _align_extra

sync = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def chosen_cfg(p, h, w, r):
    wpad = _round_up(w + 2 * r, 128)
    per_row_bytes = wpad * 8
    weight_row_bytes = wpad * 16

    def fits(pc_, hb_):
        return pc_ * hb_ * per_row_bytes + hb_ * weight_row_bytes <= _VMEM_BUDGET

    pc, hb = p, h
    while pc > 1 and not fits(pc, hb):
        pc = (pc + 1) // 2
    if not fits(pc, hb):
        for cand in range(h, 0, -1):
            if h % cand == 0 and fits(pc, cand):
                hb = cand
                break
    return pc, hb


def timeit(name, fn, *args, n=6):
    out = fn(*args)
    float(sync(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(sync(out))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:44s} {dt:8.2f} ms")


def main():
    rng = np.random.default_rng(0)
    cases = [
        ("L1 gmfss (P=69, 544x960, r=12)", 69, 544, 960, 12),
        ("L2 gmfss (P=129, 272x480, r=12)", 129, 272, 480, 12),
        ("L3 gmfss (P=193, 136x240, r=12)", 193, 136, 240, 12),
        ("drm gmfss (P=2, 544x960, r=12)", 2, 544, 960, 12),
        ("drm rife (P=2, 1088x1920, r=12)", 2, 1088, 1920, 12),
        ("L2 radius6 (P=129, 272x480, r=6)", 129, 272, 480, 6),
        ("L3 radius3 (P=193, 136x240, r=3)", 193, 136, 240, 3),
    ]
    for name, p, h, w, r in cases:
        print(f"  cfg pc,hb = {chosen_cfg(p, h, w, r)}")
        planes = jnp.asarray(rng.uniform(0, 1, (p, h, w)), jnp.float32)
        flow = jnp.asarray(rng.uniform(-8, 8, (h, w, 2)), jnp.float32)
        fn = jax.jit(functools.partial(splat_planes_stencil, radius=r))
        timeit(name, fn, planes, flow)


if __name__ == "__main__":
    main()

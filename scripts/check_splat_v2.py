"""Correctness + speed check of the v2 stencil kernel on TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import functools

import jax
import jax.numpy as jnp
import numpy as np

from drba_tpu.ops.splat_stencil import splat_planes_stencil, _choose_blocks, _round_up
from drba_tpu.ops.softsplat import _splat_scatter

sync = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def timeit(name, fn, *args, n=6):
    out = fn(*args)
    float(sync(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(sync(out))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:44s} {dt:8.2f} ms")
    return out


def main():
    rng = np.random.default_rng(0)
    # correctness: flows within radius, compare vs scatter
    p, h, w, r = 5, 64, 256, 12
    planes = jnp.asarray(rng.uniform(0, 1, (p, h, w)), jnp.float32)
    flow = jnp.asarray(rng.uniform(-7, 7, (h, w, 2)), jnp.float32)
    got = splat_planes_stencil(planes, flow, radius=r)
    ref = _splat_scatter(
        jnp.moveaxis(planes, 0, -1)[None], flow[None]
    )[0]
    ref = jnp.moveaxis(ref, -1, 0)
    err = float(jnp.max(jnp.abs(got - ref)))
    print(f"max abs err vs scatter: {err:.2e}")
    assert err < 1e-4, err

    cases = [
        ("L1 gmfss (P=69, 544x960, r=12)", 69, 544, 960, 12),
        ("L2 radius6 (P=129, 272x480, r=6)", 129, 272, 480, 6),
        ("L3 radius3 (P=193, 136x240, r=3)", 193, 136, 240, 3),
        ("drm gmfss (P=2, 544x960, r=12)", 2, 544, 960, 12),
        ("drm rife (P=2, 1088x1920, r=12)", 2, 1088, 1920, 12),
    ]
    for name, p, h, w, r in cases:
        wpad = _round_up(w + 2 * r, 128)
        print(f"  cfg pblk,hb = {_choose_blocks(p, h, wpad, r)}")
        planes = jnp.asarray(rng.uniform(0, 1, (p, h, w)), jnp.float32)
        flow = jnp.asarray(rng.uniform(-8, 8, (h, w, 2)), jnp.float32)
        fn = jax.jit(functools.partial(splat_planes_stencil, radius=r))
        timeit(name, fn, planes, flow)


if __name__ == "__main__":
    main()

"""Overflow-cascade splat ('stencil_ov'): TPU lowering + parity + cost.

Round-5: the production-oracle gap is dominated by contributions the dense
splat drops beyond its radius (CPU isolation: exact-scatter f32 gmfss
0.99421 vs stencil-default 0.98803 at 576x960). The cascade
(ops/softsplat.py:_splat_overflow) pools far contributions 8x/64x down and
splats them coarse — this measures, on the real TPU:

  1. lowering + bit-exactness vs plain stencil on in-radius flows;
  2. far-flow mass conservation vs the exact scatter spec;
  3. the full gmfss/rife window cost of switching the default backend.

    python scripts/exp_splat_ov.py           # all stages
    python scripts/exp_splat_ov.py bench gmfss stencil_ov   # one variant
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def stage_kernel():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from drba_tpu.ops.softsplat import softsplat

    sync = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))
    rng = np.random.default_rng(0)
    n, h, w, c = 6, 544, 960, 19
    ten = jnp.asarray(rng.uniform(0, 1, (n, h, w, c)), jnp.bfloat16)

    # in-radius pan: cascade must add zero (bit-exact vs stencil)
    near = jnp.asarray(
        np.tile(np.array([6.0, 2.0], np.float32), (n, h, w, 1))
        + rng.normal(0, 0.5, (n, h, w, 2)).astype(np.float32))
    a = softsplat(ten, near, None, "avg", backend="stencil")
    b = softsplat(ten, near, None, "avg", backend="stencil_ov")
    float(sync(a)), float(sync(b))
    print("in-radius bitexact:",
          bool(jnp.all(a == b)), flush=True)

    # far smooth flow: mass vs the exact scatter (sum mode)
    far = jnp.asarray(
        np.tile(np.array([55.0, 30.0], np.float32), (n, h, w, 1))
        + rng.normal(0, 1.0, (n, h, w, 2)).astype(np.float32))
    m_ex = float(sync(softsplat(ten, far, None, "sum", backend="scatter")))
    m_st = float(sync(softsplat(ten, far, None, "sum", backend="stencil")))
    m_ov = float(sync(softsplat(ten, far, None, "sum", backend="stencil_ov")))
    print(f"far mass: scatter={m_ex:.1f} stencil={m_st:.1f} "
          f"stencil_ov={m_ov:.1f} (ov/exact={m_ov / max(m_ex, 1e-9):.4f})",
          flush=True)

    # kernel-level timing, near flows (the production case)
    import functools

    @functools.partial(jax.jit, static_argnames=("bk", "iters"))
    def loop(im, fl, bk, iters):
        def body(_, carry):
            eps = (jnp.mean(carry.astype(jnp.float32))
                   * jnp.float32(1e-20)).astype(im.dtype)
            return softsplat(im + eps, fl, None, "avg", backend=bk)

        return jax.lax.fori_loop(0, iters, body, jnp.zeros_like(im))

    for bk in ("stencil", "stencil_ov"):
        out = loop(ten, near, bk, 6)
        float(sync(out[0, 0, 0]))
        t0 = time.perf_counter()
        out = loop(ten, near, bk, 6)
        float(sync(out[0, 0, 0]))
        print(f"splat (6,544,960,19) [{bk:10s}] "
              f"{(time.perf_counter() - t0) / 6 * 1e3:8.2f} ms", flush=True)


def stage_bench(model, backend):
    import drba_tpu.config as dc

    dc.DEFAULT = dc.DEFAULT.replace(splat_backend=backend)
    import bench

    fps = (bench.bench_gmfss("gmfss", n_windows=10) if model == "gmfss"
           else bench.bench_rife(n_windows=10))
    print(f"{model} window fps [{backend}]: {fps:.2f}", flush=True)


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "kernel":
        stage_kernel()
        return
    if len(sys.argv) > 1 and sys.argv[1] == "bench":
        stage_bench(sys.argv[2], sys.argv[3])
        return
    here = os.path.abspath(__file__)
    r = subprocess.run([sys.executable, here, "kernel"], timeout=2400)
    print(f"kernel stage rc={r.returncode}", flush=True)
    for model in ("gmfss", "rife"):
        for bk in ("auto", "stencil_ov"):
            r = subprocess.run([sys.executable, here, "bench", model, bk],
                               timeout=2400)
            print(f"bench {model} {bk} rc={r.returncode}", flush=True)


if __name__ == "__main__":
    main()

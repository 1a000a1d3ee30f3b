"""Sweep MXU warp window sizes: speed at the hot IFNet geometry + coverage
on representative flows (smooth pans with jitter + discontinuous motion
boundaries at several magnitudes).

    python scripts/sweep_warp_window.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import functools

import jax
import jax.numpy as jnp
import numpy as np

from drba_tpu.ops.warp_mxu import backwarp_mxu, coverage_fraction

B, H, W, C = 6, 1088, 1920, 19
sync = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))


def flows(mag):
    """Pan + sinusoidal jitter + a hard motion boundary (object edge)."""
    rng = np.random.default_rng(int(mag))
    f = np.zeros((1, H, W, 2), np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    f[..., 0] = mag + 3.0 * np.sin(xx / 97.0) * np.cos(yy / 53.0)
    f[..., 1] = 0.25 * mag * np.sin(yy / 71.0)
    # moving object: a box with opposite motion (discontinuity at its edge)
    f[0, 300:700, 500:1100, 0] = -mag
    f[0, 300:700, 500:1100, 1] = 0.5 * mag
    f += rng.normal(0, 0.5, f.shape).astype(np.float32)
    return jnp.asarray(f)


def main():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (B, H, W, C)), jnp.bfloat16)
    flow = jnp.tile(flows(8.0), (B, 1, 1, 1)).astype(jnp.bfloat16)

    for wh, ww in ((32, 384), (16, 384), (32, 256), (16, 256), (16, 512)):
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(img, flow, n):
            def body(_, carry):
                return backwarp_mxu(img + carry[0, 0, 0, 0] * 0, flow,
                                    wh=wh, ww=ww)

            return jax.lax.fori_loop(0, n, body, jnp.zeros_like(img))

        n = 8
        out = loop(img, flow, n)
        float(sync(out))
        t0 = time.perf_counter()
        out = loop(img, flow, n)
        float(sync(out))
        dt = (time.perf_counter() - t0) / n * 1e3
        covs = {int(m): float(coverage_fraction(flows(m), wh=wh, ww=ww))
                for m in (8, 20, 40, 80)}
        print(f"wh={wh:3d} ww={ww:3d}  {dt:7.2f} ms  coverage: " +
              " ".join(f"{m}px={c:.5f}" for m, c in covs.items()), flush=True)


if __name__ == "__main__":
    main()

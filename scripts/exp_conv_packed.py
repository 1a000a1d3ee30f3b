"""Packed-L0 GridNet vs plain XLA lattice at production gmfss geometry,
plus the standalone packed-conv rate check that motivates it.

Hypothesis under test (docs/ROADMAP.md round-4): the 64ch/large-spatial
3x3 conv runs ~11.6 TF/s under XLA while a dense packed (3,3,128,128)
conv at half W carries 2x the MACs at the 40-45 TF/s 128-lane rate.

    python scripts/exp_conv_packed.py [iters]
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

from drba_tpu.models.gmfss_nets import GRIDNET_SPEC, gridnet_apply
from drba_tpu.models.gridnet_packed import gridnet_apply_packed
from drba_tpu.models.layers import init_from_spec
from drba_tpu.ops.conv_packed import pack_conv3_weights

N, H, W = 3, 544, 960
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 8

sync = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))


def time_loop(fn, x, n):
    @functools.partial(jax.jit, static_argnames=("k",))
    def loop(x, k):
        return jax.lax.fori_loop(0, k, lambda _, c: fn(c), x)

    out = loop(x, n)
    float(sync(out))
    t0 = time.perf_counter()
    out = loop(x, n)
    float(sync(out))
    return (time.perf_counter() - t0) / n * 1e3


def conv_rates():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    w64 = jnp.asarray(rng.normal(0, 0.05, (3, 3, 64, 64)), dt)
    x64 = jnp.asarray(rng.normal(0, 1, (N, H, W, 64)), dt)
    wp = pack_conv3_weights(w64)
    xp = x64.reshape(N, H, W // 2, 128)
    dn = ("NHWC", "HWIO", "NHWC")

    def c64(x):
        return jax.lax.conv_general_dilated(
            x, w64, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
            preferred_element_type=jnp.float32).astype(dt)

    def cp(x):
        return jax.lax.conv_general_dilated(
            x, wp, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn,
            preferred_element_type=jnp.float32).astype(dt)

    macs = 9 * 64 * 64 * N * H * W
    t = time_loop(c64, x64, ITERS)
    print(f"conv 3x3/64ch  ({N},{H},{W},64):   {t:7.2f} ms"
          f"  {2 * macs / t / 1e9:5.1f} TF/s")
    t = time_loop(cp, xp, ITERS)
    print(f"packed (3,3,128,128) ({N},{H},{W // 2},128): {t:7.2f} ms"
          f"  {4 * macs / t / 1e9:5.1f} TF/s raw ({2 * macs / t / 1e9:.1f} useful)")


def lattice():
    rng = np.random.default_rng(0)
    p = init_from_spec(GRIDNET_SPEC)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.normal(0, 1, (N, H, W, 12)), dt)
    x1 = jnp.asarray(rng.normal(0, 1, (N, H, W, 128)), dt)
    x2 = jnp.asarray(rng.normal(0, 1, (N, H // 2, W // 2, 256)), dt)
    x3 = jnp.asarray(rng.normal(0, 1, (N, H // 4, W // 4, 384)), dt)

    # parity at production shape first (bf16-level)
    ref = gridnet_apply(p, x, x1, x2, x3, conv_backend="xla")
    got = gridnet_apply_packed(p, x, x1, x2, x3)
    err = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32))))
    print(f"max |plain - packed| = {err:.2e}")

    for name, fn in (
        ("xla   ", lambda a, b, c, d: gridnet_apply(p, a, b, c, d,
                                                    conv_backend="xla")),
        ("packed", lambda a, b, c, d: gridnet_apply_packed(p, a, b, c, d)),
    ):
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(x, x1, x2, x3, n, fn=fn):
            def body(_, carry):
                return fn(x + carry[0, 0, 0, 0] * 0, x1, x2, x3)

            init = jnp.zeros((N, H * 2, W * 2, 3), dt)
            return jax.lax.fori_loop(0, n, body, init)

        out = loop(x, x1, x2, x3, ITERS)
        float(sync(out))
        t0 = time.perf_counter()
        out = loop(x, x1, x2, x3, ITERS)
        float(sync(out))
        print(f"gridnet[{name}] {(time.perf_counter() - t0) / ITERS * 1e3:8.2f}"
              f" ms/iter  ({ITERS} iters)")


if __name__ == "__main__":
    conv_rates()
    lattice()

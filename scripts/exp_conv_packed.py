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
                # genuine carry->input dependence (anti-DCE/anti-hoist); the
                # scaled-down mean rounds away in bf16
                eps = (jnp.mean(carry.astype(jnp.float32))
                       * jnp.float32(1e-20)).astype(dt)
                return fn(x + eps, x1, x2, x3)

            init = jnp.zeros((N, H * 2, W * 2, 3), dt)
            return jax.lax.fori_loop(0, n, body, init)

        out = loop(x, x1, x2, x3, ITERS)
        float(sync(out))
        t0 = time.perf_counter()
        out = loop(x, x1, x2, x3, ITERS)
        float(sync(out))
        print(f"gridnet[{name}] {(time.perf_counter() - t0) / ITERS * 1e3:8.2f}"
              f" ms/iter  ({ITERS} iters)")


def sites():
    """Per-site packed-vs-incumbent timings at production geometry."""
    from drba_tpu.models.gmfss_nets import (
        FEATURENET_SPEC, METRICNET_SPEC, featurenet_apply, metricnet_apply,
    )
    from drba_tpu.models.ifnet import _resconv_chain

    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    def timeit(label, fn, *args):
        # carry a full-output reduction back into the input so neither DCE
        # nor loop-invariant hoisting can elide the body; the tiny scaled
        # perturbation rounds away in bf16 (values unchanged iter to iter)
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(a, n):
            def body(_, c):
                out = fn(a[0] + (c * jnp.float32(1e-20)).astype(a[0].dtype),
                         *a[1:])
                return functools.reduce(
                    lambda s, leaf: s + jnp.sum(leaf.astype(jnp.float32)),
                    jax.tree.leaves(out), jnp.float32(0)) * 1e-9

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        float(loop(args, ITERS))  # scalar result transfer = the sync
        t0 = time.perf_counter()
        float(loop(args, ITERS))
        print(f"{label:42s} {(time.perf_counter() - t0) / ITERS * 1e3:8.2f} ms")

    # IFNet ResConv runs (rife window T=3 -> feat batch 3)
    for c in (64, 32):
        spec = {}
        for j in range(8):
            spec[f"blk.convblock.{j}.conv.weight"] = ("conv", 3, 3, c, c)
            spec[f"blk.convblock.{j}.conv.bias"] = ("bias", c)
            spec[f"blk.convblock.{j}.beta"] = ("ones", (c,))
        p = {k: jnp.asarray(v, dt) for k, v in init_from_spec(spec, seed=1).items()}
        feat = jnp.asarray(rng.normal(0, 1, (3, 272, 480, c)), dt)
        for backend in ("xla", "pallas", "packed"):
            timeit(f"resconv c={c} (3,272,480) {backend}",
                   lambda x, bk=backend, pp=p: _resconv_chain(pp, "blk", x, bk),
                   feat)

    # MetricNet at 1080p (gmfss reuse geometry)
    pm = {k: jnp.asarray(v, dt)
          for k, v in init_from_spec(METRICNET_SPEC, seed=2).items()}
    i0 = jnp.asarray(rng.normal(0.5, 0.2, (1, 1088, 1920, 3)), dt)
    i1 = jnp.asarray(rng.normal(0.5, 0.2, (1, 1088, 1920, 3)), dt)
    f01 = jnp.asarray(rng.normal(0, 4, (1, 1088, 1920, 2)), dt)
    f10 = jnp.asarray(rng.normal(0, 4, (1, 1088, 1920, 2)), dt)
    for backend in ("xla", "pallas", "packed"):
        timeit(f"metricnet 1080p {backend}",
               lambda a, b, c, d, bk=backend: metricnet_apply(
                   pm, a, b, c, d, conv_backend=bk, warp_backend="gather"),
               i0, i1, f01, f10)

    # FeatureNet at 1080p
    pf = {k: jnp.asarray(v, dt)
          for k, v in init_from_spec(FEATURENET_SPEC, seed=3).items()}
    for backend in ("xla", "pallas", "packed"):
        timeit(f"featurenet 1080p {backend}",
               lambda a, bk=backend: featurenet_apply(pf, a, conv_backend=bk),
               i0)


if __name__ == "__main__":
    conv_rates()
    lattice()
    sites()

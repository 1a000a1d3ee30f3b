"""Per-stage TPU profile of GMFlow at gmfss's operating point (1080p half-res)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import functools

import jax
import jax.numpy as jnp
import numpy as np

from drba_tpu.config import DEFAULT
from drba_tpu.convert import load_network
from drba_tpu.models.gmflow_net import (
    GMFLOW_SPEC,
    backbone_apply,
    convex_upsample,
    flow_prop_global,
    flow_prop_local,
    global_correlation_flow,
    gmflow_apply,
    local_correlation_flow,
    transformer_apply,
)
from drba_tpu.ops import backwarp

sync = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def timeit(name, fn, *args, n=4):
    out = fn(*args)
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")]
    float(sync(leaves[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")]
    float(sync(leaves[0]))
    print(f"{name:44s} {(time.perf_counter() - t0) / n * 1e3:8.1f} ms")


def main():
    p = load_network(None, "flownet.pkl", GMFLOW_SPEC, seed=0)
    dt = DEFAULT.compute_dtype
    rng = np.random.default_rng(0)
    H, W = 544, 960  # gmfss input = half of padded 1080p

    img = jnp.asarray(rng.uniform(0, 1, (2, H, W, 3)), dt)
    timeit("backbone (both imgs)", jax.jit(backbone_apply), p, img)

    lo = jnp.asarray(rng.normal(0, 1, (1, H // 8, W // 8, 128)), dt)
    lo2 = jnp.asarray(rng.normal(0, 1, (1, H // 8, W // 8, 128)), dt)
    tr0 = jax.jit(functools.partial(transformer_apply, attn_splits=2))
    timeit("transformer scale0 (1/8, splits=2)", tr0, p, lo, lo2)

    timeit("global corr bidir (1/8)", jax.jit(functools.partial(
        global_correlation_flow, bidir=True)), lo, lo2)

    lo_cat = jnp.concatenate([lo, lo2], axis=0)
    flow_lo = jnp.asarray(rng.normal(0, 2, (2, H // 8, W // 8, 2)), dt)
    timeit("flow_prop_global (1/8, both dirs)", jax.jit(flow_prop_global),
           p, lo_cat, flow_lo)

    hi = jnp.asarray(rng.normal(0, 1, (2, H // 4, W // 4, 128)), dt)
    hi2 = jnp.asarray(rng.normal(0, 1, (2, H // 4, W // 4, 128)), dt)
    flow_hi = jnp.asarray(rng.normal(0, 2, (2, H // 4, W // 4, 2)), dt)
    timeit("backwarp feat1 (1/4)", jax.jit(functools.partial(
        backwarp, padding_mode="zeros")), hi2, flow_hi)

    tr1 = jax.jit(functools.partial(transformer_apply, attn_splits=8))
    timeit("transformer scale1 (1/4, splits=8)", tr1, p, hi, hi2)

    timeit("local corr r=4 (1/4)", jax.jit(functools.partial(
        local_correlation_flow, radius=4)), hi, hi2)

    timeit("flow_prop_local (1/4)", jax.jit(flow_prop_local), p, hi, flow_hi)
    timeit("convex_upsample (1/4)", jax.jit(convex_upsample), p, flow_hi, hi)

    i0 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), dt)
    i1 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), dt)
    timeit("gmflow_apply bidir FULL", jax.jit(functools.partial(
        gmflow_apply, pred_bidir=True)), p, i0, i1)


if __name__ == "__main__":
    main()

"""Fused whole-layer transformer kernel: TPU lowering check + timing.

Stages small-to-large so a hung/failed compile pinpoints itself:
  1. ONE fused self-attn layer at gmflow scale-1 geometry (lowering check);
  2. ONE fused cross+FFN layer (shifted, masked);
  3. the full fused transformer_apply (12 fused invocations);
  4. full gmflow bidir with the fused path on (compare vs the 78.9 ms
     unfused number in .tpu_results/profile_gmfss_r4c.log).

    python scripts/exp_attn_layer.py
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

os.environ["DRBA_ENABLE_FUSED_LAYER"] = "1"  # the path under test is opt-in

import drba_tpu.models.gmflow_net as gm
from drba_tpu.config import DEFAULT
from drba_tpu.models.layers import init_from_spec
from drba_tpu.ops.attn_layer import transformer_layer_mxu

sync = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def timeit(name, fn, *args, n=6, **kw):
    print(f"[compile] {name} ...", flush=True)
    out = fn(*args, **kw)
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")]
    float(sync(leaves[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")]
    float(sync(leaves[0]))
    ms = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:52s} {ms:8.2f} ms", flush=True)
    return out


def main():
    p = init_from_spec(gm.GMFLOW_SPEC, seed=0)
    dt = DEFAULT.compute_dtype
    rng = np.random.default_rng(0)

    b, h, w, c = 4, 136, 240, 128  # scale-1 bidir geometry
    x = jnp.asarray(rng.normal(size=(b, h, w, c)) * 0.5, dt)
    base = "transformer.layers.0.self_attn"
    basec = "transformer.layers.1.cross_attn_ffn"
    wqkv = jnp.concatenate(
        [p[f"{base}.{n}.weight"] for n in ("q_proj", "k_proj", "v_proj")], axis=1)
    wqkvc = jnp.concatenate(
        [p[f"{basec}.{n}.weight"] for n in ("q_proj", "k_proj", "v_proj")], axis=1)
    lab = gm._shift_region_labels(h, w, 8).reshape(64, 17, 30)

    one_self = jax.jit(functools.partial(
        transformer_layer_mxu, k_splits=8))
    timeit("1 fused self layer (b=4)", one_self, x, wqkv,
           p[f"{base}.merge.weight"],
           (p[f"{base}.norm1.weight"], p[f"{base}.norm1.bias"]))

    def cross(x):
        return transformer_layer_mxu(
            x, wqkvc, p[f"{basec}.merge.weight"],
            (p[f"{basec}.norm1.weight"], p[f"{basec}.norm1.bias"]), 8,
            labels=lab, with_mask=True, cross_swap=True,
            ffn=(p[f"{basec}.mlp.0.weight"], p[f"{basec}.mlp.2.weight"],
                 p[f"{basec}.norm2.weight"], p[f"{basec}.norm2.bias"]))
    timeit("1 fused cross+ffn layer (shifted, b=4)", jax.jit(cross), x)

    f0 = x[:2]
    f1 = jnp.asarray(rng.normal(size=(2, h, w, c)) * 0.5, dt)
    tr2 = jax.jit(functools.partial(gm.transformer_apply, attn_splits=8))
    timeit("transformer scale1 FUSED-LAYER stack", tr2, p, f0, f1)

    # full gmflow bidir at the gmfss operating point (unfused baseline:
    # 78.9 ms, .tpu_results/profile_gmfss_r4c.log)
    H, W = 544, 960
    img0 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), dt)
    img1 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)), dt)
    gmf = jax.jit(functools.partial(gm.gmflow_apply, pred_bidir=True))
    fo = timeit("gmflow bidir half-res FUSED-LAYER", gmf, p, img0, img1)

    del os.environ["DRBA_ENABLE_FUSED_LAYER"]
    gmf2 = jax.jit(functools.partial(gm.gmflow_apply, pred_bidir=True))
    fr = timeit("gmflow bidir half-res UNFUSED", gmf2, p, img0, img1)
    os.environ["DRBA_ENABLE_FUSED_LAYER"] = "1"
    d = float(jnp.max(jnp.abs(fo.astype(jnp.float32) - fr.astype(jnp.float32))))
    print(f"max |flow fused - unfused| = {d:.3e}", flush=True)

    # 5. WIDE plan: one fused layer at the scale-0 geometry (Lp=2176,
    #    ~38 MB f32 scratch under the raised VMEM ceiling) — validates the
    #    DRBA_FUSED_LAYER_WIDE gate independently of the scale-1 plan
    b0, h0, w0 = 4, 68, 120
    x0 = jnp.asarray(rng.normal(size=(b0, h0, w0, c)) * 0.5, dt)
    base0 = "transformer.layers.0.self_attn"
    wqkv0 = jnp.concatenate(
        [p[f"{base0}.{n}.weight"] for n in ("q_proj", "k_proj", "v_proj")],
        axis=1)
    one_self0 = jax.jit(functools.partial(transformer_layer_mxu, k_splits=2))
    timeit("1 fused self layer WIDE (scale0, b=4)", one_self0, x0, wqkv0,
           p[f"{base0}.merge.weight"],
           (p[f"{base0}.norm1.weight"], p[f"{base0}.norm1.bias"]))


if __name__ == "__main__":
    main()

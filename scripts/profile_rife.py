"""Per-stage TPU profile of the RIFE window (1080p, bf16)."""

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
from drba_tpu.drm import calc_drm_rife
from drba_tpu.models.ifnet import ifnet_apply, ifnet_encode
from drba_tpu.models.rife import RIFE, _drba_window
from drba_tpu.ops.warp_mxu import backwarp_mxu

H, W = 1088, 1920
sync = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def timeit(name, fn, *args, n=4, **kw):
    out = fn(*args, **kw)
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")]
    float(sync(leaves[0]))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    leaves = [x for x in jax.tree_util.tree_leaves(out) if hasattr(x, "dtype")]
    float(sync(leaves[0]))
    print(f"{name:46s} {(time.perf_counter() - t0) / n * 1e3:8.1f} ms")
    return out


def main():
    model = RIFE(weights=None, scale=1.0, config=DEFAULT)
    p = model.params
    dt = DEFAULT.compute_dtype
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32)
    I0 = jnp.asarray(base, dt)
    I1 = jnp.asarray(np.roll(base, 8, axis=2), dt)
    I2 = jnp.asarray(np.roll(base, 16, axis=2), dt)
    ts = jnp.asarray([0.5, 0.9, 1.3], jnp.float32)

    flow10, _, f1, f0 = model._calc_flow(I1, I0)
    timeit("calc_flow (block0 + inversion splats)", model._calc_flow, I1, I2, f0=f1)
    flow12, _, _, f2 = model._calc_flow(I1, I2, f0=f1)

    win = functools.partial(
        _drba_window, scale_list=model.scale_list, linear=True,
        splat_backend=DEFAULT.splat_backend,
        warp_backend=DEFAULT.warp_backend,
        drm_splat_scale=DEFAULT.drm_splat_scale,
        conv_backend=DEFAULT.conv_backend,
    )
    timeit("window T=3 (drm + IFNet)", win, p, I0, I1, I2, ts,
           flow10, flow12, f0, f1, f2, n=3)

    tt = jnp.where(ts < 1, 1 - ts, ts - 1)
    drm_j = jax.jit(functools.partial(calc_drm_rife, linear=True, backend="auto"))
    timeit("calc_drm_rife batched T=3", drm_j, tt, flow10, flow12)

    # IFNet alone, T=3 folded batch, both warp backends
    I1b = jnp.broadcast_to(I1, (3,) + I1.shape[1:])
    IBb = jnp.concatenate([I0, I0, I2], axis=0)
    f1b = jnp.broadcast_to(f1, (3,) + f1.shape[1:])
    fBb = jnp.concatenate([f0, f0, f2], axis=0)
    tmap = jnp.full((3, H, W, 1), 0.5, dt)
    if_mxu = jax.jit(functools.partial(
        ifnet_apply, scale_list=model.scale_list, warp_backend="auto"))
    timeit("ifnet T=3 (MXU warps)", if_mxu, p, I1b, IBb, tmap,
           f0=f1b, f1=fBb, n=3)
    # The gather-warp comparison leg compile-OOMs at 1080p T=3 (the
    # dense-layout gather fallback materializes ~16 GB of padded layouts);
    # keep it opt-in so one failing leg can't kill the whole profile.
    if os.environ.get("DRBA_PROFILE_GATHER", "0") == "1":
        if_gather = jax.jit(functools.partial(
            ifnet_apply, scale_list=model.scale_list, warp_backend="gather"))
        try:
            timeit("ifnet T=3 (gather warps)", if_gather, p, I1b, IBb, tmap,
                   f0=f1b, f1=fBb, n=3)
        except Exception as e:  # noqa: BLE001 - comparison leg only
            print(f"ifnet T=3 (gather warps)  FAILED: {type(e).__name__}")

    # isolated full-res MXU warp pair at window shapes (T=3 both dirs: B=6)
    img19 = jnp.asarray(rng.uniform(0, 1, (6, H, W, 19)), dt)
    flow6 = jnp.asarray(rng.uniform(-12, 12, (6, H, W, 2)), dt)
    timeit("backwarp_mxu (6,1088,1920,19) ww384", backwarp_mxu, img19, flow6)
    timeit("backwarp_mxu ww256", backwarp_mxu, img19, flow6, ww=256)
    timeit("backwarp_mxu (6,...,3) merge warp", backwarp_mxu,
           img19[..., :3], flow6)

    timeit("encode (one img)", jax.jit(ifnet_encode), p, I1)


if __name__ == "__main__":
    main()

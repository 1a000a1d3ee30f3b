"""Per-stage TPU profile of the GMFSS window (1080p, bf16).

Times each component of the DRBA window with scalar-reduction syncs:
reuse (featurenet/gmflow/metricnet), vmapped calc_drm_gmfss, the packed
splat pyramid, and GridNet. Run on the real chip:

    python scripts/profile_gmfss.py
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

from drba_tpu.config import DEFAULT
from drba_tpu.models.gmfss import GMFSS, _drba_window
from drba_tpu.models.gmfss_core import gmfss_inference, gmfss_reuse, _warp_pyramid2
from drba_tpu.models.gmfss_nets import (
    featurenet_apply,
    gridnet_apply,
    metricnet_apply,
)
from drba_tpu.models.gmflow_net import gmflow_apply
from drba_tpu.drm import calc_drm_gmfss
from drba_tpu.ops.resize import scale_by

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
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:42s} {dt:8.1f} ms")
    return out


def main():
    model = GMFSS(weights=None, scale=1.0, config=DEFAULT)
    p = model.params
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32)
    dt = DEFAULT.compute_dtype
    I0 = jnp.asarray(base, dt)
    I1 = jnp.asarray(np.roll(base, 8, axis=2), dt)
    I2 = jnp.asarray(np.roll(base, 16, axis=2), dt)
    ts = jnp.asarray([0.5, 0.9, 1.3], jnp.float32)

    cb = DEFAULT.conv_backend
    reuse_fn = jax.jit(functools.partial(
        gmfss_reuse, scale=1.0, union=False, conv_backend=cb))
    r10 = timeit("reuse (featx2+gmflow+metric)", reuse_fn, p, I1, I0)
    r12 = reuse_fn(p, I1, I2)

    # reuse sub-stages
    feat_fn = jax.jit(functools.partial(featurenet_apply, conv_backend=cb))
    timeit("  featurenet (one img)", feat_fn, p.feat_ext, I1)
    I1h = scale_by(I1, 0.5)
    I0h = scale_by(I0, 0.5)
    gm_fn = jax.jit(functools.partial(gmflow_apply, pred_bidir=True))
    timeit("  gmflow bidir (half-res)", gm_fn, p.flownet, I1h, I0h)
    met_fn = jax.jit(functools.partial(
        metricnet_apply, union=False, conv_backend=cb))
    timeit("  metricnet", met_fn, p.metricnet, I1h, I0h, r10.flow01, r10.flow10)

    # window total (production defaults: half-res DRM splats, packed convs)
    win_fn = functools.partial(
        _drba_window, linear=True, backend="auto",
        drm_splat_scale=DEFAULT.drm_splat_scale, conv_backend=cb)
    timeit("window T=3 (full)", win_fn, p, I0, I1, I2, ts, r10, r12, n=3)

    # drm batched over 3 ts (folded batch, not vmap)
    def drm_fn(ts):
        tt = jnp.where(ts < 1, 1 - ts, ts - 1)
        return calc_drm_gmfss(tt, r10.flow01, r12.flow01, r10.metric0,
                              r12.metric0, linear=True, backend="auto")
    timeit("calc_drm_gmfss batched T=3", jax.jit(drm_fn), ts)

    # the splat pyramid, BOTH directions x T=3 folded into the batch axis
    # (explicit batching, matching the window program — the Pallas splat
    # must not be vmapped)
    scales = jnp.asarray([0.4, 0.6, 0.8], dt)[:, None, None, None]
    t0m = jnp.full((1, H // 2, W // 2, 1), 0.5, dt) * scales  # (3, h2, w2, 1)
    I1h3 = jnp.broadcast_to(I1h, (3,) + I1h.shape[1:])
    I0h3 = jnp.broadcast_to(I0h, (3,) + I0h.shape[1:])
    feat3 = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (3,) + x.shape[1:]), r10.feat0
    )
    feat3b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (3,) + x.shape[1:]), r10.feat1
    )

    # arrays passed as ARGS so the compile request doesn't inline them as
    # constants (a closure here overflows the remote-compile body limit)
    def wp(I1h3, I0h3, feat3, feat3b, t0m, f01, f10, m0, m1):
        F1t = t0m * f01
        F2t = t0m * f10
        Z1t = t0m * m0
        Z2t = t0m * m1
        return _warp_pyramid2(I1h3, I0h3, feat3, feat3b, F1t, F2t, Z1t, Z2t,
                              backend="auto")[0][0]
    timeit("warp_pyramid2 x3ts (both dirs)", jax.jit(wp), I1h3, I0h3, feat3,
           feat3b, t0m, r10.flow01, r10.flow10, r10.metric0, r10.metric1)

    # gridnet x3 (batched; arrays passed as args so the compile request
    # doesn't inline them as constants)
    def gn(fusion, I1h3, I0h3, scales, f1, f2, f3):
        x = jnp.concatenate([I1h3 * scales, I1h3, I0h3, I0h3 * scales], axis=-1)
        x1 = jnp.concatenate([f1, f1], axis=-1)
        x2 = jnp.concatenate([f2, f2], axis=-1)
        x3 = jnp.concatenate([f3, f3], axis=-1)
        return gridnet_apply(fusion, x, x1, x2, x3, conv_backend=cb)
    timeit("gridnet x3ts", jax.jit(gn), p.fusionnet, I1h3, I0h3, scales,
           feat3[0], feat3[1], feat3[2])


if __name__ == "__main__":
    main()

"""Fine-grained TPU timing of the DRBA hot-path ops (scalar-sync method).

Prints one line per op: name, ms/call. Run on the real TPU:
    python tools/profile_tpu.py [section ...]
Sections: warp, block, resize, splat, ifnet, flow, window (default: all).

block_until_ready does not wait on this relay; every timing loop ends with a
scalar-reduction transfer (see CLAUDE.md).
"""

import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

import jax
import jax.numpy as jnp


H, W = 1088, 1920
DT = jnp.bfloat16


def timeit(name, fn, *args, n=8):
    sync = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))

    def run_once():
        out = fn(*args)
        if isinstance(out, (tuple, list)):
            out = out[0]
        return out

    out = run_once()
    float(sync(out))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(n):
        out = run_once()
    float(sync(out))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:58s} {dt:8.2f} ms")
    return dt


def mk(shape, dtype=DT, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(0, 1, shape).astype(np.float32), dtype)


def mkflow(shape, mag=20.0, seed=1):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-mag, mag, shape).astype(np.float32), DT)


def sec_warp():
    from drba_tpu.ops.warp import backwarp, _sample_pixels

    flow = mkflow((1, H, W, 2))
    for c in (3, 16, 19):
        img = mk((1, H, W, c))
        timeit(f"backwarp full-res C={c}", jax.jit(backwarp), img, flow)
    img = mk((1, H, W, 19))
    # raw gather floor: one take_along_axis of 2M rows
    flat = img.reshape(1, H * W, 19)
    idx = jnp.asarray(
        np.random.default_rng(0).integers(0, H * W, (1, H * W, 1)), jnp.int32
    )
    timeit(
        "raw take_along_axis 2M rows C=19",
        jax.jit(lambda f, i: jnp.take_along_axis(f, i, axis=1)),
        flat,
        idx,
    )
    flat4 = mk((1, (H + 1) * (W + 1), 76))
    timeit(
        "raw take_along_axis 2M rows C=76 (patch layout)",
        jax.jit(lambda f, i: jnp.take_along_axis(f, i, axis=1)),
        flat4,
        jnp.asarray(
            np.random.default_rng(0).integers(0, (H + 1) * (W + 1), (1, H * W, 1)),
            jnp.int32,
        ),
    )

    from drba_tpu.models.ifnet import _warp_then_downsample

    img19 = mk((1, H, W, 19))
    for k in (2, 4, 8):
        timeit(
            f"_warp_then_downsample k={k} C=19",
            jax.jit(lambda i, f, kk=k: _warp_then_downsample(i, f, kk)),
            img19,
            flow,
        )


def sec_block():
    from drba_tpu.models.ifnet import IFNET_SPEC, ifnet_block
    from drba_tpu.convert import load_network

    p = load_network(None, "flownet.pkl", IFNET_SPEC, seed=0)
    p = {k: v.astype(DT) for k, v in p.items()}
    scales = (16.0, 8.0, 4.0, 2.0, 1.0)
    for i, sc in enumerate(scales):
        hs, ws = int(H / sc), int(W / sc)
        cin = 39 if i == 0 else 48  # flow (+4) is concatenated inside the block
        x = mk((1, hs, ws, cin))
        flow = None if i == 0 else mkflow((1, H, W, 4))
        timeit(
            f"ifnet_block{i} scale={sc} convs+tail (x at scale)",
            jax.jit(
                lambda p_, x_, f_, i_=i, sc_=sc: ifnet_block(
                    p_, i_, x_, f_, sc_, x_at_scale=True, out_size=(H, W)
                )
            ),
            p,
            x,
            flow,
        )


def sec_resize():
    from drba_tpu.ops.resize import resize_bilinear

    for c, (hs, ws), (ho, wo), tag in (
        (13, (H // 2, W // 2), (H, W), "blk tail up x2 13ch"),
        (13, (H, W), (H, W), "noop"),
        (3, (H, W), (H // 2, W // 2), "img down x2"),
        (4, (H // 2, W // 2), (H, W), "flow up x2"),
        (10, (H, W), (H // 2, W // 2), "t/mask/feat down x2"),
    ):
        x = mk((1, hs, ws, c))
        timeit(
            f"resize {tag} {hs}x{ws}->{ho}x{wo}",
            jax.jit(lambda x_, s=(ho, wo): resize_bilinear(x_, s)),
            x,
        )


def sec_splat():
    from drba_tpu.ops.splat_stencil import splat_planes_stencil

    flow = mkflow((H, W, 2), mag=10.0).astype(jnp.float32)
    for p in (2, 4, 8):
        planes = mk((p, H, W), jnp.float32)
        timeit(
            f"splat_planes_stencil r=12 P={p}",
            jax.jit(lambda v, f: splat_planes_stencil(v, f, radius=12)),
            planes,
            flow,
        )


def sec_ifnet():
    from drba_tpu.models.ifnet import IFNET_SPEC, ifnet_apply, ifnet_encode
    from drba_tpu.convert import load_network

    p = load_network(None, "flownet.pkl", IFNET_SPEC, seed=0)
    p = {k: v.astype(DT) for k, v in p.items()}
    img0, img1 = mk((1, H, W, 3)), mk((1, H, W, 3), seed=2)
    t = mk((1, H, W, 1))
    scales = (16.0, 8.0, 4.0, 2.0, 1.0)
    f0 = ifnet_encode(p, img0)
    f1 = ifnet_encode(p, img1)
    timeit("ifnet_encode", jax.jit(ifnet_encode), p, img0)
    timeit(
        "ifnet_apply full",
        jax.jit(lambda p_, a, b, t_, fa, fb: ifnet_apply(p_, a, b, t_, scales, fa, fb)),
        p, img0, img1, t, f0, f1,
    )


def sec_flow():
    from drba_tpu.models.rife import RIFE
    from drba_tpu.config import DEFAULT

    model = RIFE(weights=None, scale=1.0, config=DEFAULT)
    a, b = mk((1, H, W, 3)), mk((1, H, W, 3), seed=2)
    timeit("calc_flow (reuse-free)", model._calc_flow, a, b)


def sec_window():
    from drba_tpu.models.rife import RIFE
    from drba_tpu.config import DEFAULT

    model = RIFE(weights=None, scale=1.0, config=DEFAULT)
    frames = [mk((1, H, W, 3), seed=i) for i in range(3)]
    I0, I1, I2 = frames
    ts = [0.5, 0.9, 1.3]

    def win():
        out, _ = model.inference_ts_drba(I0, I1, I2, ts, None, linear=True)
        return out[-1]

    timeit("inference_ts_drba T=3 (incl 2x calc_flow)", win, n=4)


SECTIONS = {
    "warp": sec_warp,
    "block": sec_block,
    "resize": sec_resize,
    "splat": sec_splat,
    "ifnet": sec_ifnet,
    "flow": sec_flow,
    "window": sec_window,
}


if __name__ == "__main__":
    names = sys.argv[1:] or list(SECTIONS)
    print(f"platform: {jax.devices()[0].platform}  {H}x{W} {DT.__name__}")
    for nm in names:
        print(f"--- {nm} ---")
        SECTIONS[nm]()

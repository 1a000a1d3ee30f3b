"""Round-5 warp window sweep: floor(min)-anchored starts at narrow geometries.

Round-4's exp_warp_narrow FALSIFIED the loose-HBM-alignment hypothesis
(Mosaic: "tile index in dimension 3 is divisible by the tiling (128)",
.tpu_results/exp_warp_narrow.log) — window starts MUST be 128-multiples in
the minor dim. The viable geometry change is the ANCHOR rule, now landed in
production (ops/warp_mxu.py:_prep_positions): the largest 128-multiple <=
the tile's min source coord is optimal among quantized starts, and with it
ww=256 covers zero-motion tiles at 127/128 of start phases (the round-3
centered-anchor sweep that lost >=5% coverage at 256 measured the WRONG
anchor). wh=16 similarly halves the vertical reduce with 7..14-row spans
covered.

Each variant is measured in a SUBPROCESS (round-4 lesson: one compile OOM
must not kill the sweep) for coverage, deviation vs the gather reference,
and the hot (6,1088,1920,19) timing.

    python scripts/exp_warp_r5.py            # full sweep
    python scripts/exp_warp_r5.py 32 256     # one variant (wh ww)
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

VARIANTS = [(32, 384), (32, 256), (16, 384), (16, 256)]
ITERS = 8


def run_variant(wh, ww):
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from drba_tpu.ops.warp import backwarp
    from drba_tpu.ops.warp_mxu import backwarp_mxu, coverage_fraction

    sync = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))
    rng = np.random.default_rng(0)
    B, H, W, C = 6, 1088, 1920, 19
    img = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), jnp.bfloat16)

    def flow_field(mag, kind):
        if kind == "pan":
            f = np.tile(np.array([mag, mag * 0.3], np.float32), (B, H, W, 1))
            f += rng.normal(0, 0.5, (B, H, W, 2)).astype(np.float32)
        elif kind == "boundary":
            # foreground band vs background moving oppositely (the hard
            # real-content case the round-5 pan/zoom probes missed: a tile
            # straddling the boundary sees the FULL relative motion as
            # intra-tile source spread; (16,*) windows only guarantee 7
            # rows of vertical spread, tests/test_warp_mxu.py)
            f = np.tile(np.array([-mag, -mag * 0.35], np.float32),
                        (B, H, W, 1))
            yy = np.mgrid[0:H][:, None]
            band = ((yy > H * 0.3) & (yy < H * 0.6))[None, ..., None]
            f = np.where(band, np.array([mag, mag * 0.7], np.float32), f)
            f += rng.normal(0, 0.5, (B, H, W, 2)).astype(np.float32)
        else:  # zoom: divergent
            yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
            fx = (xx - W / 2) / (W / 2) * mag
            fy = (yy - H / 2) / (H / 2) * mag
            f = np.stack([fx, fy], -1)[None].repeat(B, 0)
        return jnp.asarray(f)

    ref_fn = jax.jit(backwarp)
    for kind, mag in (("pan", 8.0), ("pan", 40.0), ("zoom", 12.0),
                      ("boundary", 10.0), ("boundary", 25.0)):
        fl = flow_field(mag, kind)
        cov = float(coverage_fraction(fl, wh=wh, ww=ww))
        ref = np.asarray(ref_fn(img, fl).astype(jnp.float32))
        got = np.asarray(backwarp_mxu(img, fl, wh=wh, ww=ww).astype(jnp.float32))
        frac = (np.abs(got - ref) > 0.05).mean()
        print(f"({wh},{ww}) {kind}{mag:5.1f} cov={cov:.5f} "
              f"mismatch>0.05: {frac:.5f}", flush=True)

    fl = flow_field(8.0, "pan")

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(im, fl, n):
        def body(_, carry):
            eps = (jnp.mean(carry.astype(jnp.float32))
                   * jnp.float32(1e-20)).astype(im.dtype)
            return backwarp_mxu(im + eps, fl, wh=wh, ww=ww)

        return jax.lax.fori_loop(0, n, body, jnp.zeros_like(im))

    out = loop(img, fl, ITERS)
    float(sync(out[0, 0, 0]))
    t0 = time.perf_counter()
    out = loop(img, fl, ITERS)
    float(sync(out[0, 0, 0]))
    print(f"({wh},{ww}) warp (6,1088,1920,19): "
          f"{(time.perf_counter() - t0) / ITERS * 1e3:8.2f} ms", flush=True)


def main():
    if len(sys.argv) == 3:
        run_variant(int(sys.argv[1]), int(sys.argv[2]))
        return
    for wh, ww in VARIANTS:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), str(wh), str(ww)],
            timeout=1800,
        )
        print(f"variant ({wh},{ww}) rc={r.returncode}", flush=True)


if __name__ == "__main__":
    main()

"""Round-5 union-path conv-backend sweep (VERDICT r4 item 8).

The gmfss_union window embeds a half-res aux IFNet (reference:
models/gmfss_union.py:36-41,74-77) whose ResConv/GridNet conv sites were
never re-measured after round 4 flipped the conv defaults. Times the FULL
union window program at the production 1080p geometry with injected pan
flows for each conv_backend, plus the gridnet packed_chain hybrid,
subprocess-per-variant.

    python scripts/exp_union_r5.py            # sweep
    python scripts/exp_union_r5.py auto       # one variant
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

VARIANTS = ["auto", "pallas", "packed", "xla", "packed_chain"]
H, W = 1088, 1920
N_WINDOWS = 10


def run_variant(cb):
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from drba_tpu.config import DEFAULT
    from drba_tpu.models.gmfss_union import GMFSS_UNION, _drba_window

    dt = DEFAULT.compute_dtype
    sync = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))
    frames = bench._frames(H, W)
    model = GMFSS_UNION(weights=None, scale=1.0, config=DEFAULT)
    mag = 8.0
    r10 = model.reuse(frames[1], frames[0])._replace(
        flow01=bench._pan_flow(1, H // 2, W // 2, mag / 2, mag * 0.15, 1.5, 0, dt),
        flow10=bench._pan_flow(1, H // 2, W // 2, -mag / 2, -mag * 0.15, 1.5, 1, dt),
    )
    r12 = model.reuse(frames[1], frames[2])._replace(
        flow01=bench._pan_flow(1, H // 2, W // 2, -mag / 2, -mag * 0.15, 1.5, 2, dt),
        flow10=bench._pan_flow(1, H // 2, W // 2, mag / 2, mag * 0.15, 1.5, 3, dt),
    )
    ts_a = jnp.asarray([0.5, 0.9, 1.3], jnp.float32)
    ts_b = jnp.asarray([0.7, 1.1], jnp.float32)

    def run(n):
        out = None
        for k in range(n):
            out = _drba_window(
                model.params, model.rife_params, frames[k % 2],
                frames[k % 2 + 1], frames[k % 2 + 2],
                ts_a if k % 2 == 0 else ts_b, r10, r12,
                model.scale_list, True, DEFAULT.splat_backend,
                DEFAULT.warp_backend, DEFAULT.drm_splat_scale, cb)
        float(sync(out[-1]))
        return n * 5 // 2

    run(2)
    t0 = time.perf_counter()
    total = run(N_WINDOWS)
    fps = total / (time.perf_counter() - t0)
    print(f"union window conv_backend={cb:13s} {fps:7.3f} interp frames/s",
          flush=True)


def main():
    if len(sys.argv) == 2:
        run_variant(sys.argv[1])
        return
    for v in VARIANTS:
        r = subprocess.run([sys.executable, os.path.abspath(__file__), v],
                           timeout=2400)
        print(f"variant {v} rc={r.returncode}", flush=True)


if __name__ == "__main__":
    main()

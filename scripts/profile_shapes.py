"""Per-shape conv microbench: every distinct GridNet / IFNet conv geometry.

Times each conv shape with an in-jit fori_loop (per-program dispatch is
~3.5-4 ms on this stack, so standalone timings would measure dispatch).
Prints ms/conv and effective TF/s so the Pallas fused-chain kernel work
(ops/conv_chain.py) targets the geometries XLA actually handles poorly.

    python scripts/profile_shapes.py [--loops 8]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

sync = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def conv_ms(n, h, w, cin, cout, stride=1, loops=8, dtype=jnp.bfloat16,
            transpose=False, k=3):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (n, h, w, cin)), dtype)
    wt = jnp.asarray(rng.uniform(-0.1, 0.1, (k, k, cin, cout)), dtype)
    # chain loops convs; project back to cin channels so the loop carries
    proj = jnp.asarray(rng.uniform(-0.1, 0.1, (1, 1, cout, cin)), dtype)

    if transpose:
        def one(xx):
            return jax.lax.conv_transpose(
                xx, wt, (stride, stride), ((1, 2), (1, 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(dtype)
    else:
        def one(xx):
            return jax.lax.conv_general_dilated(
                xx, wt, (stride, stride), ((k // 2, k // 2), (k // 2, k // 2)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(dtype)

    @jax.jit
    def run(xx):
        def body(i, carry):
            y = one(carry)
            back = jax.lax.conv_general_dilated(
                y, proj, (1, 1), ((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(dtype)
            if stride != 1 and not transpose:
                back = jnp.repeat(jnp.repeat(back, stride, 1), stride, 2)
            elif transpose:
                back = back[:, ::stride, ::stride]
            return back[:, :h, :w] * 0.5 + xx * 0.5
        return jax.lax.fori_loop(0, loops, body, xx)

    float(sync(run(x)))
    t0 = time.perf_counter()
    float(sync(run(x)))
    dt = (time.perf_counter() - t0) / loops * 1e3
    ho, wo = (h * stride, w * stride) if transpose else (h // stride, w // stride)
    tf = 2 * k * k * cin * cout * n * ho * wo / (dt * 1e-3) / 1e12
    return dt, tf


SHAPES = [
    # --- GridNet (L0 = 544x960 at 1080p, N=3 window) ---
    ("grid head0.1  12->64  @544x960", (3, 544, 960, 12, 64)),
    ("grid 64->64           @544x960", (3, 544, 960, 64, 64)),
    ("grid head1.1 128->64  @544x960", (3, 544, 960, 128, 64)),
    ("grid down10.1 64->128 s2 @544", (3, 544, 960, 64, 128, 2)),
    ("grid 128->128         @272x480", (3, 272, 480, 128, 128)),
    ("grid head2.1 256->128 @272x480", (3, 272, 480, 256, 128)),
    ("grid down20.1 128->192 s2", (3, 272, 480, 128, 192, 2)),
    ("grid 192->192         @136x240", (3, 136, 240, 192, 192)),
    ("grid head3.1 384->192 @136x240", (3, 136, 240, 384, 192)),
    ("grid tail.up 64->256  @544x960", (3, 544, 960, 64, 256)),
    ("grid conv_last 64->3  @1088x1920", (3, 1088, 1920, 64, 3)),
    # --- IFNet (1080p scale_list 16/8/4/2/1, N=3) ---
    ("if b0 res 192    @17x30", (3, 17, 30, 192, 192)),
    ("if b1 res 128    @34x60", (3, 34, 60, 128, 128)),
    ("if b2 res 96     @68x120", (3, 68, 120, 96, 96)),
    ("if b3 res 64     @136x240", (3, 136, 240, 64, 64)),
    ("if b4 res 32     @272x480", (3, 272, 480, 32, 32)),
    ("if b4 conv0.0 52->16 s2 @1088", (3, 1088, 1920, 52, 16, 2)),
    ("if b4 conv0.1 16->32 s2 @544", (3, 544, 960, 16, 32, 2)),
    ("if b3 conv0.0 52->32 s2 @544", (3, 544, 960, 52, 32, 2)),
    ("if b3 conv0.1 32->64 s2 @272", (3, 272, 480, 32, 64, 2)),
    ("if encode.cnn0 3->16 s2 @1088", (3, 1088, 1920, 3, 16, 2)),
    ("if encode 16->16 @544x960", (3, 544, 960, 16, 16)),
]

CONVT = [
    ("grid up04 convT 128->64 @272->544", (3, 272, 480, 128, 64, 2)),
    ("grid up14 convT 192->128 @136->272", (3, 136, 240, 192, 128, 2)),
    ("if b4 lastconv convT 32->52 @272->544", (3, 272, 480, 32, 52, 2)),
    ("if b3 lastconv convT 64->52 @136->272", (3, 136, 240, 64, 52, 2)),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--loops", type=int, default=8)
    args = ap.parse_args()
    print(f"{'shape':42s} {'ms/conv':>8s} {'TF/s':>7s}")
    for name, dims in SHAPES:
        stride = dims[5] if len(dims) > 5 else 1
        dt, tf = conv_ms(*dims[:5], stride=stride, loops=args.loops)
        print(f"{name:42s} {dt:8.2f} {tf:7.1f}")
    for name, dims in CONVT:
        dt, tf = conv_ms(*dims[:5], stride=dims[5], loops=args.loops,
                         transpose=True, k=4)
        print(f"{name:42s} {dt:8.2f} {tf:7.1f}")


if __name__ == "__main__":
    main()

"""Standalone conv-chain kernel timing vs the XLA seq block (GridNet L0).

    python scripts/profile_conv_chain.py
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

from drba_tpu.ops.conv_chain import ChainStep, conv_chain

sync = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
N, H, W, C = 3, 544, 960, 64


def timeit(name, fn, *args, n=6, **kw):
    out = fn(*args, **kw)
    float(sync(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    float(sync(out))
    dt = (time.perf_counter() - t0) / n * 1e3
    print(f"{name:46s} {dt:8.2f} ms")
    return out


def main():
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.normal(0, 1, (N, H, W, C)), dt)
    steps = [
        ChainStep(
            w=jnp.asarray(rng.normal(0, 0.1, (3, 3, C, C)), jnp.float32),
            b=jnp.asarray(rng.normal(0, 0.5, (C,)), jnp.float32),
            pre_alpha=jnp.float32(0.25),
        )
        for _ in range(2)
    ]

    def xla_seq(x):
        y = x
        for s in steps:
            inp = jnp.where(y >= 0, y, y * s.pre_alpha.astype(y.dtype))
            y = jax.lax.conv_general_dilated(
                inp, s.w.astype(y.dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(y.dtype) + s.b.astype(y.dtype)
        return y + x

    timeit("XLA seq block (2 convs + prelus + res)", jax.jit(xla_seq), x)

    for hb in (8, 16, 32):
        fn = jax.jit(functools.partial(conv_chain, residual="input", hb=hb))
        try:
            timeit(f"conv_chain 2-step res-input hb={hb}", fn, x, steps)
        except Exception as e:
            print(f"conv_chain hb={hb} FAILED: {str(e)[:160]}")

    # single-step chain (the up04/05 tail conv pattern)
    for hb in (8, 16, 32):
        fn = jax.jit(functools.partial(conv_chain, hb=hb))
        try:
            timeit(f"conv_chain 1-step hb={hb}", fn, x, steps[:1])
        except Exception as e:
            print(f"conv_chain 1-step hb={hb} FAILED: {str(e)[:160]}")


if __name__ == "__main__":
    main()

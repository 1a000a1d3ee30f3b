"""GridNet end-to-end timing at production gmfss geometry (1080p window).

Times the full lattice (XLA variant vs fused conv-chain variant) with an
in-jit fori loop (per-program dispatch is ~3.5-4 ms on this stack) and a
scalar-reduction sync.

    python scripts/profile_gridnet.py [iters]
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

from drba_tpu.models.gmfss_nets import (
    GRIDNET_SPEC,
    gridnet_apply,
)
from drba_tpu.models.layers import init_from_spec

N, H, W = 3, 544, 960
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def main():
    rng = np.random.default_rng(0)
    p = {k: v for k, v in init_from_spec(GRIDNET_SPEC).items()}
    dt = jnp.bfloat16
    x = jnp.asarray(rng.normal(0, 1, (N, H, W, 12)), dt)
    x1 = jnp.asarray(rng.normal(0, 1, (N, H, W, 128)), dt)
    x2 = jnp.asarray(rng.normal(0, 1, (N, H // 2, W // 2, 256)), dt)
    x3 = jnp.asarray(rng.normal(0, 1, (N, H // 4, W // 4, 384)), dt)

    sync = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))

    for backend in ("xla", "auto"):
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(x, x1, x2, x3, n):
            def body(_, carry):
                y = gridnet_apply(p, x + carry[0, 0, 0, 0] * 0, x1, x2, x3,
                                  conv_backend=backend)
                return y

            init = jnp.zeros((N, H * 2, W * 2, 3), dt)
            return jax.lax.fori_loop(0, n, body, init)

        out = loop(x, x1, x2, x3, ITERS)  # compile + warm with SAME static n
        float(sync(out))
        t0 = time.perf_counter()
        out = loop(x, x1, x2, x3, ITERS)
        float(sync(out))
        dt_ms = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"gridnet[{backend}]  {dt_ms:8.2f} ms/iter  ({ITERS} iters)")


if __name__ == "__main__":
    main()

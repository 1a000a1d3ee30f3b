"""IFNet end-to-end A/B at production rife geometry (1080p window, N=3).

Times ifnet_apply with conv_backend xla vs auto (fused ResConv chains) via
an in-jit fori loop and a scalar-reduction sync.

    python scripts/profile_ifnet.py [iters]
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

from drba_tpu.models.ifnet import IFNET_SPEC, ifnet_apply, ifnet_encode
from drba_tpu.models.layers import init_from_spec

N, H, W = 3, 1088, 1920
SCALES = (16.0, 8.0, 4.0, 2.0, 1.0)
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def main():
    rng = np.random.default_rng(0)
    p = init_from_spec(IFNET_SPEC)
    dt = jnp.bfloat16
    base = rng.uniform(0, 1, (N, H, W, 3)).astype(np.float32)
    img0 = jnp.asarray(base, dt)
    img1 = jnp.asarray(np.roll(base, 8, axis=2), dt)
    tmap = jnp.full((N, H, W, 1), 0.5, dt)

    sync = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))

    for backend in ("xla", "auto"):
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(img0, img1, tmap, n):
            f0 = ifnet_encode(p, img0)
            f1 = ifnet_encode(p, img1)

            def body(_, carry):
                merged, _ = ifnet_apply(
                    p, img0 + carry[0, 0, 0, 0] * 0, img1, tmap, SCALES,
                    f0=f0, f1=f1, conv_backend=backend)
                return merged

            return jax.lax.fori_loop(0, n, body, jnp.zeros((N, H, W, 3), dt))

        out = loop(img0, img1, tmap, ITERS)
        float(sync(out))
        t0 = time.perf_counter()
        out = loop(img0, img1, tmap, ITERS)
        float(sync(out))
        dt_ms = (time.perf_counter() - t0) / ITERS * 1e3
        print(f"ifnet[{backend}]  {dt_ms:8.2f} ms/iter  ({ITERS} iters)")


if __name__ == "__main__":
    main()

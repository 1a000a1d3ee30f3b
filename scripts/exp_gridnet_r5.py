"""Round-5 GridNet lattice sweep: packed vs packed+chain hybrid (VERDICT r4 #3).

Round-4 measured the packed-XLA lattice at 91.9 ms/window and the FULL
chain lattice at 109.9 (its L1 chains + boundary relayouts ate the
standalone 2.2x win). The hybrid (gridnet_apply_packed(seq_chain=True))
keeps the packed lattice and fuses ONLY the pure-64ch L0 seq blocks
(01/04/05 + upsample tails + tail head) into single chain invocations.
Target: lattice <= 65 ms (gmfss >= 12.5 fps).

Subprocess-per-variant (round-4 lesson: one compile OOM must not kill the
sweep); also times ONE seq block chain vs its 2-packed-conv equivalent.

    python scripts/exp_gridnet_r5.py            # sweep all variants
    python scripts/exp_gridnet_r5.py packed     # one variant
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

VARIANTS = ["packed", "packed_chain", "xla", "block_micro"]
N, H, W = 3, 544, 960
ITERS = 6


def _timeit(name, fn, *args):
    import jax
    import jax.numpy as jnp

    sync = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))
    out = fn(*args)
    float(sync(out))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    float(sync(out))
    print(f"{name:40s} {(time.perf_counter() - t0) / ITERS * 1e3:8.2f} ms",
          flush=True)


def run_variant(variant):
    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from drba_tpu.config import DEFAULT
    from drba_tpu.models.gmfss_nets import GRIDNET_SPEC, gridnet_apply
    from drba_tpu.models.layers import init_from_spec

    dt = DEFAULT.compute_dtype
    p = init_from_spec(GRIDNET_SPEC, seed=3)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((N, H, W, 12)), dt)
    x1 = jnp.asarray(rng.standard_normal((N, H, W, 128)), dt)
    x2 = jnp.asarray(rng.standard_normal((N, H // 2, W // 2, 256)), dt)
    x3 = jnp.asarray(rng.standard_normal((N, H // 4, W // 4, 384)), dt)

    if variant == "block_micro":
        from drba_tpu.models.gridnet_packed import _chain_step, _seq_packed
        from drba_tpu.ops.conv_chain import conv_chain, pack_cols

        xp = pack_cols(jnp.asarray(rng.standard_normal((N, H, W, 64)), dt), 2)

        def two_convs(xp):
            from drba_tpu.models.gridnet_packed import _seq_packed

            return _seq_packed(p, "residual_model_01", xp) + xp

        def chain_block(xp):
            return conv_chain(
                xp, [_chain_step(p, "residual_model_01", 1),
                     _chain_step(p, "residual_model_01", 3)],
                residual="input", packed=True)

        _timeit("seq block, 2 packed XLA convs + add", jax.jit(two_convs), xp)
        _timeit("seq block, ONE chain invocation", jax.jit(chain_block), xp)
        return

    fn = jax.jit(functools.partial(gridnet_apply, conv_backend=variant))
    _timeit(f"gridnet lattice [{variant}]", fn, p, x, x1, x2, x3)


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

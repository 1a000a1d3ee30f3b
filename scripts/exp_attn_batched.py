"""TPU lowering + numerics check for the fused attention kernels at b > 1.

Round-4 regression find: a 2-D (B, L) region-id operand with a (1, _LQ)
block violates the Pallas last-two-dims rule whenever B > 1, so
flash_attention_mxu (and window_attention_mxu's masked path) never lowered
on TPU for batched inputs — the gmfss bench config crashed on it. The ids
now ride as 3-D (B, L, 1) / (B, 1, L) operands; this script proves the
lowering AND the numerics against the XLA softmax path at the real gmfss
geometries.

    FORCE_CPU=1 python scripts/exp_attn_batched.py   # interpret parity
    python scripts/exp_attn_batched.py               # TPU lowering + parity
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax

if os.environ.get("FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from drba_tpu.ops.attn_mxu import flash_attention_mxu, window_attention_mxu


def xla_ref(q, k, v, rid=None):
    s = jnp.einsum("blc,bmc->blm", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / np.sqrt(q.shape[-1])
    if rid is not None:
        s = jnp.where(rid[:, :, None] == rid[:, None, :], s, -1e9)
    a = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("blm,bmc->blc", a, v.astype(jnp.float32))


def main():
    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() != "cpu"
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    # gmfss 1080p global-correlation geometry: B=2 (bidirectional stack),
    # L=8160 (136x240 at 1/8); plus a small odd case
    cases = [(2, 8160, 128, 2), (3, 510, 128, 2)] if on_tpu else [(2, 192, 128, 2)]
    for b, L, c, cv in cases:
        q = jnp.asarray(rng.uniform(-1, 1, (b, L, c)), dt)
        k = jnp.asarray(rng.uniform(-1, 1, (b, L, c)), dt)
        v = jnp.asarray(rng.uniform(-1, 1, (b, L, cv)), dt)
        rid = jnp.asarray(rng.integers(0, 4, (b, L)), jnp.int32)

        ref = np.asarray(xla_ref(q, k, v, rid), np.float32)
        got = np.asarray(flash_attention_mxu(q, k, v, rid, with_mask=True),
                         np.float32)
        err = np.abs(ref - got).max()
        print(f"flash  b={b} L={L}: maxerr {err:.2e}", flush=True)
        assert err < (6e-2 if on_tpu else 1e-5), err

        # unmasked flash too (global correlation path)
        ref = np.asarray(xla_ref(q, k, v), np.float32)
        got = np.asarray(flash_attention_mxu(q, k, v), np.float32)
        err = np.abs(ref - got).max()
        print(f"flash  b={b} L={L} nomask: maxerr {err:.2e}", flush=True)
        assert err < (6e-2 if on_tpu else 1e-5), err

        if L <= 2048:
            vv = jnp.asarray(rng.uniform(-1, 1, (b, L, c)), dt)
            ref = np.asarray(xla_ref(q, k, vv, rid), np.float32)
            got = np.asarray(window_attention_mxu(q, k, vv, rid,
                                                  with_mask=True), np.float32)
            err = np.abs(ref - got).max()
            print(f"window b={b} L={L}: maxerr {err:.2e}", flush=True)
            assert err < (6e-2 if on_tpu else 1e-5), err
    print("attn batched: ALL OK", flush=True)


if __name__ == "__main__":
    main()

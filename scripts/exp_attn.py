"""Experiment: fused Pallas window attention vs the XLA einsum path.

Measures gmflow's splits=8 shifted-window geometry at 1080p quarter-res
(b=2 bidir -> 128 windows of L=2040, c=128, bf16): parity first, then
per-call timing with the fori_loop-inside-one-jit methodology (per-program
dispatch is ~3.5-4 ms on this stack — see docs/ROADMAP.md).

    FORCE_CPU=1 python scripts/exp_attn.py   # interpret parity only
    python scripts/exp_attn.py               # TPU parity + timing
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import functools

import jax

if os.environ.get("FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from drba_tpu.models.gmflow_net import _shift_region_labels, _shift_window_mask
from drba_tpu.ops.attn_mxu import window_attention_mxu


def einsum_attn(qs, ks, vs, mask, b):
    c = qs.shape[-1]
    scores = jnp.einsum("blc,bmc->blm", qs, ks,
                        preferred_element_type=jnp.float32) / np.sqrt(c)
    scores = scores + jnp.tile(mask, (b, 1, 1))
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("blm,bmc->blc", attn, vs.astype(jnp.float32),
                      preferred_element_type=jnp.float32).astype(vs.dtype)


def main():
    on_tpu = jax.default_backend() != "cpu"
    rng = np.random.default_rng(0)
    if on_tpu:
        b, k, h, w, c = 2, 8, 272, 480, 128   # gmflow splits=8, 1080p 1/4-res
        dt = jnp.bfloat16
    else:
        b, k, h, w, c = 1, 2, 16, 24, 128
        dt = jnp.float32
    wh, ww = h // k, w // k
    L = wh * ww
    bkk = b * k * k
    qs, ks, vs = (jnp.asarray(rng.normal(size=(bkk, L, c)), dt)
                  for _ in range(3))
    mask = jnp.asarray(_shift_window_mask(h, w, k))
    rid = jnp.tile(jnp.asarray(_shift_region_labels(h, w, k)), (b, 1))

    ref = np.asarray(jax.jit(einsum_attn, static_argnames="b")(
        qs, ks, vs, mask, b)).astype(np.float32)
    new = np.asarray(window_attention_mxu(qs, ks, vs, rid, with_mask=True)
                     ).astype(np.float32)
    err = np.abs(ref - new).max()
    denom = np.abs(ref).max()
    print(f"max |einsum - kernel| = {err:.2e} (max |ref| {denom:.2f})",
          flush=True)
    tol = 0.05 if dt == jnp.bfloat16 else 1e-4
    assert err <= tol, err
    if not on_tpu:
        print("CPU parity OK (interpret mode)")
        return

    sync = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))
    fns = {
        "einsum": lambda q: einsum_attn(q, ks, vs, mask, b),
        "kernel": lambda q: window_attention_mxu(q, ks, vs, rid,
                                                 with_mask=True),
    }
    for name, fn in fns.items():
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(q0, n, fn=fn):
            def body(_, carry):
                return fn(qs + carry[:1, :1, :1].astype(dt))
            return jax.lax.fori_loop(0, n, body, q0)

        n = 16
        float(sync(loop(qs, n)))
        t0 = time.perf_counter()
        float(sync(loop(qs, n)))
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"{name}: {ms:7.2f} ms per ({bkk},{L},{c}) masked window attn",
              flush=True)


if __name__ == "__main__":
    main()

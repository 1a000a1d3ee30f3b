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
    from drba_tpu.models.gmflow_net import _window_attention
    import drba_tpu.models.gmflow_net as gm
    from drba_tpu.ops.attn_mxu import window_attention_nhwc

    # the REAL gmfss-at-1080p gmflow geometries (flownet input 544x960):
    #   scale0 1/8-res (68, 120) splits=2 -> 8 windows of L=2040 (b=2 bidir)
    #   scale1 1/4-res (136, 240) splits=8 -> 128 windows of L=510 (b=4)
    geoms = [(2, 2, 68, 120), (4, 8, 136, 240)] if on_tpu else [(1, 2, 16, 24)]
    dt = jnp.bfloat16 if on_tpu else jnp.float32

    sync = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))
    for b, k, h, w in geoms:
        c = 128
        q, kk, v = (jnp.asarray(rng.normal(size=(b, h, w, c)), dt)
                    for _ in range(3))

        # parity: einsum path vs the full _window_attention dispatch chain
        ref = np.asarray(_window_attention(q, kk, v, k, h, w, True)
                         ).astype(np.float32)
        orig = gm._fused_attention_on
        gm._fused_attention_on = lambda: True
        try:
            got = np.asarray(_window_attention(q, kk, v, k, h, w, True)
                             ).astype(np.float32)
        finally:
            gm._fused_attention_on = orig
        err = np.abs(ref - got).max()
        tol = 0.05 if dt == jnp.bfloat16 else 1e-4
        print(f"({b},{k},{h},{w}): |einsum - kernel path| = {err:.2e}",
              flush=True)
        assert err <= tol, err
        if not on_tpu:
            print("CPU parity OK (interpret mode)")
            continue

        lab = gm._shift_region_labels(h, w, k).reshape(k * k, h // k, w // k)
        cases = [
            ("einsum ", lambda: _window_attention(q, kk, v, k, h, w, True)),
            ("nhwc   ", lambda: window_attention_nhwc(
                q, kk, v, k, lab, with_mask=True)),
        ]
        for name, fn in cases:
            @functools.partial(jax.jit, static_argnames=("n",))
            def loop(x0, n, fn=fn):
                # tie iterations to the carry so nothing hoists out
                def body(_, carry):
                    s = (jnp.max(carry.astype(jnp.float32)) * 1e-12).astype(dt)
                    qq = q + s
                    if fn is cases[0][1]:
                        return _window_attention(qq, kk, v, k, h, w, True)
                    return window_attention_nhwc(qq, kk, v, k, lab,
                                                 with_mask=True)
                return jax.lax.fori_loop(0, n, body, x0)

            n = 16
            out0 = fn()
            float(sync(loop(out0, n)))
            t0 = time.perf_counter()
            float(sync(loop(out0, n)))
            ms = (time.perf_counter() - t0) / n * 1e3
            print(f"({b},{k},{h},{w}) {name}: {ms:7.3f} ms per shifted-layer "
                  "attention", flush=True)


if __name__ == "__main__":
    main()

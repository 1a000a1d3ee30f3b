"""Fused whole-layer transformer kernel vs the unfused path (interpret mode).

The fused path (ops/attn_layer.py) folds qkv projection, window attention,
merge, LayerNorms, the concat-FFN, the residual adds, AND the cross-attention
batch-half swap into one Pallas invocation per layer; parity is checked
against the einsum/_transformer_layer path over the full 6-layer stack.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import drba_tpu.models.gmflow_net as gm
from drba_tpu.models.layers import init_from_spec
from drba_tpu.ops.attn_layer import layer_mxu_supported


def test_geometry_gate():
    # gmflow scale 1 at 1080p half-res: 136x240, splits=8 -> windows (17, 30),
    # Lp = 17*32 = 544 -> one-step-per-window plan fits
    assert layer_mxu_supported(136, 240, 8, 128)
    # scale 0: 68x120, splits=2 -> Lp = 34*64 = 2176 -> score block too big
    assert not layer_mxu_supported(68, 120, 2, 128)


@pytest.mark.parametrize("dtype", [jnp.float32])
def test_fused_stack_matches_unfused(monkeypatch, dtype):
    rng = np.random.default_rng(0)
    p = init_from_spec(gm.GMFLOW_SPEC, seed=3)
    b, h, w, c = 2, 16, 24, 128  # splits=2 -> windows (8, 12), Lp = 128
    assert layer_mxu_supported(h, w, 2, c)
    f0 = jnp.asarray(rng.normal(size=(b, h, w, c)) * 0.5, dtype)
    f1 = jnp.asarray(rng.normal(size=(b, h, w, c)) * 0.5, dtype)

    monkeypatch.setattr(gm, "_fused_attention_on", lambda: False)
    ref0, ref1 = gm.transformer_apply(p, f0, f1, attn_splits=2)

    monkeypatch.setattr(gm, "_fused_attention_on", lambda: True)
    monkeypatch.setenv("DRBA_ENABLE_FUSED_LAYER", "1")
    out0, out1 = gm.transformer_apply(p, f0, f1, attn_splits=2)

    np.testing.assert_allclose(np.asarray(out0), np.asarray(ref0),
                               atol=2e-4, rtol=0)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1),
                               atol=2e-4, rtol=0)


def test_gelu_exact_bf16_bitparity():
    """The in-kernel erfc-free gelu must equal jax.nn.gelu(approximate=False)
    for EVERY finite bf16 value (the FFN activations are bf16 at that point
    in both the fused and unfused paths), so the fused kernel is not an
    approximation at the dtype the model computes in."""
    import jax

    from drba_tpu.ops.attn_layer import _gelu_exact

    bits = np.arange(65536, dtype=np.uint32)
    f32 = (bits << 16).view(np.float32)
    xb = jnp.asarray(f32).astype(jnp.bfloat16)
    ref = np.asarray(jax.nn.gelu(xb, approximate=False).astype(jnp.float32))
    got = np.asarray(_gelu_exact(xb).astype(jnp.float32))
    finite = np.isfinite(f32)
    same = (ref == got) | (np.isnan(ref) & np.isnan(got))
    assert (same | ~finite).all(), np.where(finite & ~same)[0][:10]


def test_kill_switch(monkeypatch):
    # default-ON since the round-5 real-TPU validation
    # (exp_attn_layer_r5.log rc=0, +8.6% gmfss bench);
    # DRBA_DISABLE_FUSED_LAYER=1 is the operational kill switch
    monkeypatch.setattr(gm, "_fused_attention_on", lambda: True)
    monkeypatch.delenv("DRBA_DISABLE_FUSED_LAYER", raising=False)
    assert gm._fused_layer_on(136, 240, 8, 128)
    monkeypatch.setenv("DRBA_DISABLE_FUSED_LAYER", "1")
    assert not gm._fused_layer_on(136, 240, 8, 128)

"""Fused window-attention kernel vs the einsum reference (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drba_tpu.ops.attn_mxu import attention_mxu_supported, window_attention_mxu


def _ref(q, k, v, mask_add=None):
    c = q.shape[-1]
    s = jnp.einsum("blc,bmc->blm", q, k,
                   preferred_element_type=jnp.float32) / np.sqrt(c)
    if mask_add is not None:
        s = s + mask_add
    a = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("blm,bmc->blc", a, v.astype(jnp.float32),
                      preferred_element_type=jnp.float32).astype(v.dtype)


def test_attention_parity_unmasked():
    rng = np.random.default_rng(0)
    b, L, c = 3, 300, 128  # L deliberately not a chunk multiple
    q, k, v = (jnp.asarray(rng.normal(size=(b, L, c)), jnp.float32)
               for _ in range(3))
    out = window_attention_mxu(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(q, k, v)), atol=2e-5, rtol=0)


def test_attention_parity_shift_labels_vs_additive_mask():
    """Region-id equality masking == the -100 additive swin mask used by
    models/gmflow_net._shift_window_mask (exp(-100) underflows f32)."""
    rng = np.random.default_rng(1)
    b, L, c = 4, 280, 128
    q, k, v = (jnp.asarray(rng.normal(size=(b, L, c)), jnp.float32)
               for _ in range(3))
    rid = jnp.asarray(rng.integers(0, 4, (b, L)), jnp.int32)
    mask_add = jnp.where(rid[:, :, None] != rid[:, None, :], -100.0, 0.0)
    out = window_attention_mxu(q, k, v, rid, with_mask=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(q, k, v, mask_add)), atol=2e-5,
        rtol=0)


def test_gmflow_window_geometry_support():
    # gmflow splits=8 at 1080p quarter-res: windows (34, 60) -> L=2040
    assert attention_mxu_supported(34 * 60, 128)
    # splits=2 at eighth-res: L=8160 blows the score-chunk VMEM budget
    assert not attention_mxu_supported(68 * 120, 128)


def test_window_attention_gmflow_wiring():
    """_window_attention dispatches to the kernel on TPU only; on CPU both
    paths agree via the reference einsum (covered above in interpret mode)."""
    from drba_tpu.models.gmflow_net import _window_attention

    rng = np.random.default_rng(2)
    b, h, w, c = 2, 16, 24, 128
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
               for _ in range(3))
    out = _window_attention(q, k, v, 2, h, w, with_shift=True)
    assert out.shape == (b, h, w, c)
    assert np.isfinite(np.asarray(out)).all()


def test_flash_attention_parity_unmasked():
    """Online-softmax chunked kernel == einsum reference across k chunks
    (L spans multiple key chunks and is not a chunk multiple)."""
    from drba_tpu.ops.attn_mxu import flash_attention_mxu

    rng = np.random.default_rng(3)
    b, L, c = 2, 1500, 128
    q, k, v = (jnp.asarray(rng.normal(size=(b, L, c)), jnp.float32)
               for _ in range(3))
    out = flash_attention_mxu(q, k, v)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(q, k, v)), atol=3e-5, rtol=0)


def test_flash_attention_small_value_channels():
    """cv=2 values (grid coords / flow) lane-pad internally — the global
    correlation / flow-propagation use (matching.py:7-38)."""
    from drba_tpu.ops.attn_mxu import flash_attention_mxu

    rng = np.random.default_rng(4)
    b, L, c = 2, 1100, 128
    q, k = (jnp.asarray(rng.normal(size=(b, L, c)), jnp.float32)
            for _ in range(2))
    v = jnp.asarray(rng.normal(size=(b, L, 2)), jnp.float32)
    out = flash_attention_mxu(q, k, v)
    assert out.shape == (b, L, 2)
    ref = _ref(q, k, jnp.pad(v, ((0, 0), (0, 0), (0, 126))))[:, :, :2]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5,
                               rtol=0)


def test_flash_attention_masked_matches_simple_kernel():
    from drba_tpu.ops.attn_mxu import flash_attention_mxu

    rng = np.random.default_rng(5)
    b, L, c = 2, 700, 128
    q, k, v = (jnp.asarray(rng.normal(size=(b, L, c)), jnp.float32)
               for _ in range(3))
    rid = jnp.asarray(rng.integers(0, 3, (b, L)), jnp.int32)
    a = flash_attention_mxu(q, k, v, rid, with_mask=True)
    b_ = window_attention_mxu(q, k, v, rid, with_mask=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=3e-5,
                               rtol=0)


def test_gmflow_fused_paths_match_einsum(monkeypatch):
    """The three fused-attention call sites in gmflow (window attention,
    global correlation, global flow propagation) produce the einsum path's
    numbers when the kernel gate is forced on (interpret mode on CPU)."""
    import drba_tpu.models.gmflow_net as gm

    rng = np.random.default_rng(6)
    b, h, w, c = 2, 8, 12, 128
    f0, f1 = (jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
              for _ in range(2))

    ref_corr = gm.global_correlation_flow(f0, f1, bidir=True)
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
               for _ in range(3))
    ref_attn = gm._window_attention(q, k, v, 2, h, w, with_shift=True)

    flow = jnp.asarray(rng.normal(size=(b, h, w, 2)), jnp.float32)
    p = {
        "feature_flow_attn.q_proj.weight": jnp.asarray(
            rng.normal(size=(c, c)) * 0.05, jnp.float32),
        "feature_flow_attn.q_proj.bias": jnp.zeros((c,), jnp.float32),
        "feature_flow_attn.k_proj.weight": jnp.asarray(
            rng.normal(size=(c, c)) * 0.05, jnp.float32),
        "feature_flow_attn.k_proj.bias": jnp.zeros((c,), jnp.float32),
    }
    ref_prop = gm.flow_prop_global(p, f0, flow)

    monkeypatch.setattr(gm, "_fused_attention_on", lambda: True)
    out_corr = gm.global_correlation_flow(f0, f1, bidir=True)
    out_attn = gm._window_attention(q, k, v, 2, h, w, with_shift=True)
    out_prop = gm.flow_prop_global(p, f0, flow)
    np.testing.assert_allclose(np.asarray(out_corr), np.asarray(ref_corr),
                               atol=1e-4, rtol=0)
    np.testing.assert_allclose(np.asarray(out_attn), np.asarray(ref_attn),
                               atol=1e-4, rtol=0)
    np.testing.assert_allclose(np.asarray(out_prop), np.asarray(ref_prop),
                               atol=1e-4, rtol=0)


def test_nhwc_window_attention_parity(monkeypatch):
    """NHWC-direct window kernel == the split/einsum path, shifted and
    plain, at a geometry whose window cols need sublane padding (ww=12)."""
    import drba_tpu.models.gmflow_net as gm
    from drba_tpu.ops.attn_mxu import nhwc_attention_supported

    rng = np.random.default_rng(7)
    b, h, w, c = 2, 12, 24, 128   # splits=2 -> windows (6, 12), L=72
    assert nhwc_attention_supported(h, w, 2, c)
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
               for _ in range(3))

    for shift in (False, True):
        ref = gm._window_attention(q, k, v, 2, h, w, with_shift=shift)
        monkeypatch.setattr(gm, "_fused_attention_on", lambda: True)
        out = gm._window_attention(q, k, v, 2, h, w, with_shift=shift)
        monkeypatch.setattr(gm, "_fused_attention_on", lambda: False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, rtol=0,
                                   err_msg=f"shift={shift}")


def test_nhwc_window_attention_multichunk():
    """Multi-chunk q plan (nq > 1) matches the single-chunk einsum."""
    from drba_tpu.ops import attn_mxu as am

    rng = np.random.default_rng(8)
    b, h, w, c = 1, 32, 64, 128  # splits=1: window (32, 64), Lp=2048
    assert am.nhwc_attention_supported(h, w, 1, c)
    wh, wwp = 32, 64
    assert am._nhwc_chunk_plan(wh, wwp, c) < wh  # forces nq > 1
    q, k, v = (jnp.asarray(rng.normal(size=(b, h, w, c)), jnp.float32)
               for _ in range(3))
    out = am.window_attention_nhwc(q, k, v, 1)
    ref = _ref(q.reshape(b, h * w, c), k.reshape(b, h * w, c),
               v.reshape(b, h * w, c)).reshape(b, h, w, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4,
                               rtol=0)

"""GMFSS nets + core parity vs the reference torch implementation."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from drba_tpu.convert import from_torch_state_dict
from drba_tpu.models.gmflow_net import GMFLOW_SPEC
from drba_tpu.models.gmfss_core import GmfssParams, Reuse, gmfss_inference, gmfss_reuse
from drba_tpu.models.gmfss_nets import (
    FEATURENET_SPEC,
    GRIDNET_SPEC,
    GRIDNET_UNION_SPEC,
    METRICNET_SPEC,
    featurenet_apply,
    gridnet_apply,
    metricnet_apply,
)

H, W = 128, 192  # full-res frames; half-res /4 must divide attn split 8


def _tc(x):
    return torch.from_numpy(np.moveaxis(x, -1, 1).copy())


def _fc(t):
    return np.moveaxis(t.detach().float().numpy(), 1, -1)


@pytest.fixture(scope="module")
def torch_model(reference_path):
    from models.model_gmfss.GMFSS import Model

    torch.manual_seed(0)
    m = Model()
    m.eval()
    return m


@pytest.fixture(scope="module")
def params(torch_model):
    return GmfssParams(
        flownet=from_torch_state_dict(torch_model.flownet.state_dict(), GMFLOW_SPEC),
        metricnet=from_torch_state_dict(torch_model.metricnet.state_dict(), METRICNET_SPEC),
        feat_ext=from_torch_state_dict(torch_model.feat_ext.state_dict(), FEATURENET_SPEC),
        fusionnet=from_torch_state_dict(torch_model.fusionnet.state_dict(), GRIDNET_SPEC),
    )


def test_specs_cover_state_dicts(torch_model):
    assert set(torch_model.metricnet.state_dict()) == set(METRICNET_SPEC)
    assert set(torch_model.feat_ext.state_dict()) == set(FEATURENET_SPEC)
    assert set(torch_model.fusionnet.state_dict()) == set(GRIDNET_SPEC)


def test_union_specs_cover_state_dicts(reference_path):
    from models.model_gmfss_union.GMFSS import Model as UnionModel

    torch.manual_seed(1)
    m = UnionModel()
    assert set(m.metricnet.state_dict()) == set(METRICNET_SPEC)
    assert set(m.fusionnet.state_dict()) == set(GRIDNET_UNION_SPEC)


def test_featurenet_parity(torch_model, params):
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 64, 96, 3)).astype(np.float32)
    with torch.no_grad():
        w1, w2, w3 = torch_model.feat_ext(_tc(x))
    g1, g2, g3 = featurenet_apply(params.feat_ext, jnp.asarray(x))
    # XLA vs torch conv accumulation order: compare absolutely
    np.testing.assert_allclose(np.asarray(g1), _fc(w1), rtol=0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(g2), _fc(w2), rtol=0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(g3), _fc(w3), rtol=0, atol=5e-3)


def test_metricnet_parity(torch_model, params):
    rng = np.random.default_rng(1)
    h, w = 32, 48
    img0 = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
    img1 = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
    f01 = (rng.standard_normal((1, h, w, 2)) * 3).astype(np.float32)
    f10 = (rng.standard_normal((1, h, w, 2)) * 3).astype(np.float32)
    with torch.no_grad():
        wm0, wm1 = torch_model.metricnet(_tc(img0), _tc(img1), _tc(f01), _tc(f10))
    gm0, gm1 = metricnet_apply(
        params.metricnet, jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(f01), jnp.asarray(f10)
    )
    np.testing.assert_allclose(np.asarray(gm0), _fc(wm0), rtol=0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(gm1), _fc(wm1), rtol=0, atol=5e-3)


def test_gridnet_parity(torch_model, params):
    rng = np.random.default_rng(2)
    h, w = 32, 48
    x = rng.standard_normal((1, h, w, 12)).astype(np.float32)
    x1 = rng.standard_normal((1, h, w, 128)).astype(np.float32)
    x2 = rng.standard_normal((1, h // 2, w // 2, 256)).astype(np.float32)
    x3 = rng.standard_normal((1, h // 4, w // 4, 384)).astype(np.float32)
    with torch.no_grad():
        want = torch_model.fusionnet(_tc(x), _tc(x1), _tc(x2), _tc(x3))
    got = gridnet_apply(params.fusionnet, *(jnp.asarray(v) for v in (x, x1, x2, x3)))
    np.testing.assert_allclose(np.asarray(got), _fc(want), rtol=0, atol=1e-2)


def _frames():
    rng = np.random.default_rng(3)
    base = rng.uniform(0.1, 0.9, (1, H, W, 3)).astype(np.float32)
    return base, np.roll(base, 4, axis=2).astype(np.float32)


@pytest.mark.parametrize("scale", [1.0, 0.5])
def test_reuse_wiring_parity(torch_model, params, monkeypatch, scale):
    """reuse() wiring (downsample order, scale resize, metricnet inputs,
    return layout) with an ANALYTIC flow function injected into both
    implementations — random-weight GMFlow is chaotic under fp noise
    (InstanceNorm on smooth inputs), so the real flownet is parity-tested
    separately per stage in test_gmflow.py."""
    img0, img1 = _frames()

    def analytic_flow_np(a, b):  # NHWC -> NHWC2, argument-order sensitive
        u = (a - 2 * b).mean(axis=-1, keepdims=True) * 5.0
        v = (2 * a - b).mean(axis=-1, keepdims=True) * -3.0
        return np.concatenate([u, v], axis=-1).astype(np.float32)

    class FakeFlownet(torch.nn.Module):
        def forward(self, a, b):
            a_n = np.moveaxis(a.numpy(), 1, -1)
            b_n = np.moveaxis(b.numpy(), 1, -1)
            return torch.from_numpy(np.moveaxis(analytic_flow_np(a_n, b_n), -1, 1).copy())

    import drba_tpu.models.gmfss_core as core

    def fake_gmflow_apply(p, a, b, pred_bidir=False):
        a_n, b_n = np.asarray(a, np.float32), np.asarray(b, np.float32)
        fwd = analytic_flow_np(a_n, b_n)
        if pred_bidir:
            return jnp.asarray(np.concatenate([fwd, analytic_flow_np(b_n, a_n)], axis=0))
        return jnp.asarray(fwd)

    monkeypatch.setattr(torch_model, "flownet", FakeFlownet())
    monkeypatch.setattr(core, "gmflow_apply", fake_gmflow_apply)

    with torch.inference_mode():
        want = torch_model.reuse(_tc(img0), _tc(img1), scale)
    got = gmfss_reuse(params, jnp.asarray(img0), jnp.asarray(img1), scale)

    np.testing.assert_allclose(np.asarray(got.flow01), _fc(want[0]), rtol=0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(got.flow10), _fc(want[1]), rtol=0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(got.metric0), _fc(want[2]), rtol=0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(got.metric1), _fc(want[3]), rtol=0, atol=5e-3)
    for lvl in range(3):
        np.testing.assert_allclose(
            np.asarray(got.feat0[lvl]), _fc(want[4][lvl]), rtol=0, atol=5e-3
        )
        np.testing.assert_allclose(
            np.asarray(got.feat1[lvl]), _fc(want[5][lvl]), rtol=0, atol=5e-3
        )


@pytest.mark.parametrize("conv_backend", ["auto", "packed"])
def test_inference_parity(torch_model, params, conv_backend):
    img0, img1 = _frames()
    with torch.inference_mode():
        t_reuse = torch_model.reuse(_tc(img0), _tc(img1), 1.0)
        want = torch_model.inference(_tc(img0), _tc(img1), t_reuse, 0.5, 0.5)

    # feed the SAME reuse tensors to isolate inference from flow noise
    reuse = Reuse(
        flow01=jnp.asarray(_fc(t_reuse[0])),
        flow10=jnp.asarray(_fc(t_reuse[1])),
        metric0=jnp.asarray(_fc(t_reuse[2])),
        metric1=jnp.asarray(_fc(t_reuse[3])),
        feat0=tuple(jnp.asarray(_fc(f)) for f in t_reuse[4]),
        feat1=tuple(jnp.asarray(_fc(f)) for f in t_reuse[5]),
    )
    got = gmfss_inference(params, jnp.asarray(img0), jnp.asarray(img1), reuse,
                          0.5, 0.5, conv_backend=conv_backend)
    np.testing.assert_allclose(np.asarray(got), _fc(want), rtol=0, atol=2e-2)


def test_union_inference_parity(reference_path):
    from models.model_gmfss_union.GMFSS import Model as UnionModel

    torch.manual_seed(2)
    m = UnionModel()
    m.eval()
    params = GmfssParams(
        flownet=from_torch_state_dict(m.flownet.state_dict(), GMFLOW_SPEC),
        metricnet=from_torch_state_dict(m.metricnet.state_dict(), METRICNET_SPEC),
        feat_ext=from_torch_state_dict(m.feat_ext.state_dict(), FEATURENET_SPEC),
        fusionnet=from_torch_state_dict(m.fusionnet.state_dict(), GRIDNET_UNION_SPEC),
    )
    from drba_tpu.models.gmfss_core import gmfss_union_inference

    img0, img1 = _frames()
    rng = np.random.default_rng(7)
    hh, hw = H // 2, W // 2
    with torch.inference_mode():
        t_reuse = m.reuse(_tc(img0), _tc(img1), 1.0)
        ts0 = rng.uniform(0.05, 0.95, (1, hh, hw, 1)).astype(np.float32)
        ts1 = 1 - ts0
        # force some extreme ratios to exercise the swap mask (ratio > 25)
        ts0[0, :8, :8, 0] = 0.99
        ts1[0, :8, :8, 0] = 0.99 / 30
        rife = rng.uniform(0, 1, (1, hh, hw, 3)).astype(np.float32)
        want = m.inference(_tc(img0), _tc(img1), t_reuse, _tc(ts0), _tc(ts1), _tc(rife))

    reuse = Reuse(
        flow01=jnp.asarray(_fc(t_reuse[0])),
        flow10=jnp.asarray(_fc(t_reuse[1])),
        metric0=jnp.asarray(_fc(t_reuse[2])),
        metric1=jnp.asarray(_fc(t_reuse[3])),
        feat0=tuple(jnp.asarray(_fc(f)) for f in t_reuse[4]),
        feat1=tuple(jnp.asarray(_fc(f)) for f in t_reuse[5]),
    )
    got = gmfss_union_inference(
        params, jnp.asarray(img0), jnp.asarray(img1), reuse,
        jnp.asarray(ts0), jnp.asarray(ts1), jnp.asarray(rife),
    )
    np.testing.assert_allclose(np.asarray(got), _fc(want), rtol=0, atol=2e-2)

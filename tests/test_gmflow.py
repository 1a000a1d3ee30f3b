"""GMFlow parity vs the reference torch implementation (random weights)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from drba_tpu.convert import from_torch_state_dict
from drba_tpu.models.gmflow_net import (
    GMFLOW_SPEC,
    backbone_apply,
    gmflow_apply,
    global_correlation_flow,
    local_correlation_flow,
    transformer_apply,
    add_position,
)

H, W = 64, 96  # H/4, W/4 divisible by attn split 8


def _tc(x):
    return torch.from_numpy(np.moveaxis(x, -1, 1).copy())


def _fc(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)


@pytest.fixture(scope="module")
def torch_gmflow(reference_path):
    from models.gmflow.gmflow import GMFlow

    torch.manual_seed(0)
    net = GMFlow().eval()
    return net


@pytest.fixture(scope="module")
def params(torch_gmflow):
    return from_torch_state_dict(torch_gmflow.state_dict(), GMFLOW_SPEC)


def test_spec_covers_state_dict(torch_gmflow):
    assert set(torch_gmflow.state_dict().keys()) == set(GMFLOW_SPEC.keys())


def test_spec_shapes(torch_gmflow, params):
    from drba_tpu.models.layers import init_from_spec

    init = init_from_spec(GMFLOW_SPEC)
    for k in GMFLOW_SPEC:
        assert init[k].shape == params[k].shape, k


def test_backbone_parity(torch_gmflow, params):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, H, W, 3)).astype(np.float32)
    with torch.no_grad():
        want = torch_gmflow.backbone(_tc(x))  # [1/4, 1/8] high->low
    hi, lo = backbone_apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(hi), _fc(want[0]), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(lo), _fc(want[1]), rtol=1e-3, atol=1e-3)


def test_transformer_parity(torch_gmflow, params):
    rng = np.random.default_rng(1)
    h8, w8 = H // 8, W // 8
    f0 = rng.standard_normal((1, h8, w8, 128)).astype(np.float32) * 0.5
    f1 = rng.standard_normal((1, h8, w8, 128)).astype(np.float32) * 0.5
    with torch.no_grad():
        t0, t1 = torch_gmflow.transformer(_tc(f0), _tc(f1), attn_num_splits=2)
    g0, g1 = transformer_apply(params, jnp.asarray(f0), jnp.asarray(f1), 2)
    np.testing.assert_allclose(np.asarray(g0), _fc(t0), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(g1), _fc(t1), rtol=2e-3, atol=2e-3)


def test_add_position_parity(torch_gmflow, params):
    from models.gmflow.utils import feature_add_position

    rng = np.random.default_rng(2)
    h8, w8 = H // 8, W // 8
    f0 = rng.standard_normal((1, h8, w8, 128)).astype(np.float32)
    f1 = rng.standard_normal((1, h8, w8, 128)).astype(np.float32)
    with torch.no_grad():
        t0, t1 = feature_add_position(_tc(f0), _tc(f1), 2, 128)
    g0, g1 = add_position(jnp.asarray(f0), jnp.asarray(f1), 2)
    np.testing.assert_allclose(np.asarray(g0), _fc(t0), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(g1), _fc(t1), rtol=1e-4, atol=1e-4)


def test_global_correlation_parity(reference_path):
    from models.gmflow.matching import global_correlation_softmax

    rng = np.random.default_rng(3)
    f0 = rng.standard_normal((1, 6, 8, 32)).astype(np.float32)
    f1 = rng.standard_normal((1, 6, 8, 32)).astype(np.float32)
    with torch.no_grad():
        want, _ = global_correlation_softmax(_tc(f0), _tc(f1))
    got = global_correlation_flow(jnp.asarray(f0), jnp.asarray(f1))
    np.testing.assert_allclose(np.asarray(got), _fc(want), rtol=1e-3, atol=1e-3)


def test_local_correlation_parity(reference_path):
    from models.gmflow.matching import local_correlation_softmax

    rng = np.random.default_rng(4)
    f0 = rng.standard_normal((1, 10, 12, 32)).astype(np.float32)
    f1 = rng.standard_normal((1, 10, 12, 32)).astype(np.float32)
    with torch.no_grad():
        want, _ = local_correlation_softmax(_tc(f0), _tc(f1), 4)
    got = local_correlation_flow(jnp.asarray(f0), jnp.asarray(f1), 4)
    np.testing.assert_allclose(np.asarray(got), _fc(want), rtol=1e-3, atol=1e-3)


def test_full_forward_parity(torch_gmflow, params):
    rng = np.random.default_rng(5)
    img0 = rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32)
    img1 = np.roll(img0, 2, axis=2)
    with torch.no_grad():
        want = torch_gmflow(_tc(img0), _tc(img1))
    got = gmflow_apply(params, jnp.asarray(img0), jnp.asarray(img1))
    # every stage matches to ~1e-3 (verified individually); with RANDOM
    # weights the global-correlation flow spans +-90px and softmax attention
    # amplifies fp noise chaotically, so the end-to-end bound is relative to
    # that flow magnitude (~1e-3 relative)
    diff = np.abs(np.asarray(got) - _fc(want))
    assert diff.max() < 0.25, diff.max()
    assert diff.mean() < 0.02, diff.mean()


def test_bidir_matches_two_calls(torch_gmflow, params):
    rng = np.random.default_rng(6)
    img0 = rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32)
    img1 = np.roll(img0, 2, axis=2)
    fwd = gmflow_apply(params, jnp.asarray(img0), jnp.asarray(img1))
    bwd = gmflow_apply(params, jnp.asarray(img1), jnp.asarray(img0))
    both = gmflow_apply(params, jnp.asarray(img0), jnp.asarray(img1), pred_bidir=True)
    np.testing.assert_allclose(np.asarray(both[0:1]), np.asarray(fwd), rtol=0, atol=0.25)
    np.testing.assert_allclose(np.asarray(both[1:2]), np.asarray(bwd), rtol=0, atol=0.25)

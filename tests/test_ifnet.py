"""IFNet-4.26-heavy parity: convert a randomly-initialized reference torch
IFNet's weights and compare full forward outputs."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from drba_tpu.convert import from_torch_state_dict
from drba_tpu.models.ifnet import IFNET_SPEC, ifnet_apply, ifnet_block, ifnet_encode

SCALE_LIST = (16.0, 8.0, 4.0, 2.0, 1.0)


@pytest.fixture(scope="module")
def torch_ifnet(reference_path):
    from models.rife_426_heavy.IFNet_HDv3 import IFNet

    torch.manual_seed(0)
    net = IFNet().eval()
    return net


def test_spec_covers_torch_state_dict(torch_ifnet):
    torch_keys = set(torch_ifnet.state_dict().keys())
    spec_keys = set(IFNET_SPEC.keys())
    assert torch_keys == spec_keys


def test_encode_parity(torch_ifnet):
    params = from_torch_state_dict(torch_ifnet.state_dict(), IFNET_SPEC)
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (1, 32, 48, 3)).astype(np.float32)
    with torch.no_grad():
        want = torch_ifnet.encode(torch.from_numpy(np.moveaxis(img, -1, 1).copy())).numpy()
    got = np.moveaxis(np.asarray(ifnet_encode(params, jnp.asarray(img))), -1, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_block0_parity(torch_ifnet):
    params = from_torch_state_dict(torch_ifnet.state_dict(), IFNET_SPEC)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 64, 64, 39)).astype(np.float32)
    with torch.no_grad():
        tf, tm, tft = torch_ifnet.block0(
            torch.from_numpy(np.moveaxis(x, -1, 1).copy()), None, scale=4
        )
    gf, gm, gft = ifnet_block(params, 0, jnp.asarray(x), None, 4.0)
    np.testing.assert_allclose(np.moveaxis(np.asarray(gf), -1, 1), tf.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.moveaxis(np.asarray(gm), -1, 1), tm.numpy(), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.moveaxis(np.asarray(gft), -1, 1), tft.numpy(), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("timestep", [0.5, "map"])
def test_full_forward_parity(torch_ifnet, timestep):
    params = from_torch_state_dict(torch_ifnet.state_dict(), IFNET_SPEC)
    rng = np.random.default_rng(2)
    h, w = 64, 128
    img0 = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
    img1 = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
    if timestep == "map":
        ts_np = rng.uniform(0.2, 0.8, (1, h, w, 1)).astype(np.float32)
        t_torch = torch.from_numpy(np.moveaxis(ts_np, -1, 1).copy())
        ts = jnp.asarray(ts_np)
    else:
        ts_np = np.full((1, h, w, 1), timestep, np.float32)
        t_torch = timestep
        ts = jnp.asarray(ts_np)

    x_torch = torch.from_numpy(
        np.moveaxis(np.concatenate([img0, img1], -1), -1, 1).copy()
    )
    with torch.no_grad():
        want, _ = torch_ifnet(x_torch, timestep=t_torch, scale_list=list(SCALE_LIST))

    got, _ = ifnet_apply(
        params, jnp.asarray(img0), jnp.asarray(img1), ts, SCALE_LIST
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(got), -1, 1), want.numpy(), rtol=2e-3, atol=2e-3
    )


def test_spec_shapes_match_torch(torch_ifnet):
    from drba_tpu.models.layers import init_from_spec

    init = init_from_spec(IFNET_SPEC)
    conv = from_torch_state_dict(torch_ifnet.state_dict(), IFNET_SPEC)
    for k in IFNET_SPEC:
        assert init[k].shape == conv[k].shape, k

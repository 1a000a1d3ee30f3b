"""Exactness of the column-packed conv weight transforms (ops/conv_packed.py)
against the plain layers they re-express. All f32/CPU; shapes small but with
odd content so misplaced taps can't cancel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from drba_tpu.ops.conv_chain import pack_cols, unpack_cols
from drba_tpu.ops.conv_packed import (
    conv3_packed,
    conv3_stride2_from_packed,
    convT4_to_packed,
)
from drba_tpu.ops.shuffle import conv_transpose2d


def _rand(rng, *shape):
    return jnp.asarray(rng.standard_normal(shape).astype(np.float32))


@pytest.mark.parametrize("c,k", [(3, 5), (8, 8)])
def test_conv3_packed_exact(c, k):
    rng = np.random.default_rng(0)
    x = _rand(rng, 2, 12, 20, c)
    w = _rand(rng, 3, 3, c, k)
    b = _rand(rng, k)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    got = unpack_cols(conv3_packed(pack_cols(x, 2), w, b), 2)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("f", [1, 3, 4])
def test_conv3_packed_general_factor(f):
    rng = np.random.default_rng(7)
    x = _rand(rng, 2, 8, 24, 4)
    w = _rand(rng, 3, 3, 4, 6)
    b = _rand(rng, 6)
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    got = unpack_cols(conv3_packed(pack_cols(x, f), w, b, f=f), f)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_metricnet_packed_matches_xla():
    from drba_tpu.models.gmfss_nets import METRICNET_SPEC, metricnet_apply
    from drba_tpu.models.layers import init_from_spec

    p = init_from_spec(METRICNET_SPEC, seed=5)
    rng = np.random.default_rng(6)
    img0, img1 = _rand(rng, 2, 16, 24, 3), _rand(rng, 2, 16, 24, 3)
    f01, f10 = _rand(rng, 2, 16, 24, 2), _rand(rng, 2, 16, 24, 2)
    ref = metricnet_apply(p, img0, img1, f01, f10, conv_backend="xla",
                          warp_backend="gather")
    got = metricnet_apply(p, img0, img1, f01, f10, conv_backend="packed",
                          warp_backend="gather")
    for r, g in zip(ref, got):
        np.testing.assert_allclose(g, r, rtol=2e-4, atol=2e-4)


def test_featurenet_packed_matches_xla():
    from drba_tpu.models.gmfss_nets import FEATURENET_SPEC, featurenet_apply
    from drba_tpu.models.layers import init_from_spec

    p = init_from_spec(FEATURENET_SPEC, seed=8)
    rng = np.random.default_rng(9)
    x = _rand(rng, 2, 32, 48, 3)
    ref = featurenet_apply(p, x, conv_backend="xla")
    got = featurenet_apply(p, x, conv_backend="packed")
    for r, g in zip(ref, got):
        np.testing.assert_allclose(g, r, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("c", [32, 64, 128])
def test_resconv_packed_matches_xla(c):
    from drba_tpu.models.ifnet import _resconv_chain
    from drba_tpu.models.layers import init_from_spec

    spec = {}
    for j in range(8):
        spec[f"blk.convblock.{j}.conv.weight"] = ("conv", 3, 3, c, c)
        spec[f"blk.convblock.{j}.conv.bias"] = ("bias", c)
        spec[f"blk.convblock.{j}.beta"] = ("ones", (c,))
    p = init_from_spec(spec, seed=10)
    # non-trivial betas so a misplaced tile can't cancel
    p = {k: (v + 0.3 if k.endswith("beta") else v) for k, v in p.items()}
    rng = np.random.default_rng(11)
    feat = _rand(rng, 2, 8, 16, c)
    ref = _resconv_chain(p, "blk", feat, "xla")
    got = _resconv_chain(p, "blk", feat, "packed")
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_conv3_stride2_from_packed_exact():
    rng = np.random.default_rng(1)
    x = _rand(rng, 2, 12, 20, 4)
    w = _rand(rng, 3, 3, 4, 6)
    b = _rand(rng, 6)
    ref = jax.lax.conv_general_dilated(
        x, w, (2, 2), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
    got = conv3_stride2_from_packed(pack_cols(x, 2), w, b)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_convT4_to_packed_exact():
    rng = np.random.default_rng(2)
    x = _rand(rng, 2, 6, 10, 4)
    w = _rand(rng, 4, 4, 4, 6)  # stored HWIO, unflipped (converter layout)
    b = _rand(rng, 6)
    ref = conv_transpose2d(x, w, b, stride=2, padding=1)
    got = unpack_cols(convT4_to_packed(x, w, b), 2)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

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

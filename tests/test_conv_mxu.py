"""Paired-column MXU conv kernel: parity vs lax.conv (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from drba_tpu.ops.conv_mxu import conv3x3_c64


def _ref(x, w, bias):
    out = lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def test_conv3x3_c64_matches_lax_conv():
    rng = np.random.default_rng(0)
    for (n, h, w), with_bias in [((1, 16, 24), True), ((3, 32, 16), False)]:
        x = jnp.asarray(rng.normal(0, 1, (n, h, w, 64)).astype(np.float32))
        wt = jnp.asarray(rng.normal(0, 0.1, (3, 3, 64, 64)).astype(np.float32))
        b = jnp.asarray(rng.normal(0, 1, (64,)).astype(np.float32)) if with_bias else None
        got = conv3x3_c64(x, wt, b, interpret=True)
        want = _ref(x, wt, b)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)

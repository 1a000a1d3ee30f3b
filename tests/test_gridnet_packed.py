"""Packed-L0 GridNet (models/gridnet_packed.py) vs the plain lattice."""

import jax.numpy as jnp
import numpy as np
import pytest

from drba_tpu.models.gmfss_nets import (
    GRIDNET_SPEC,
    GRIDNET_UNION_SPEC,
    gridnet_apply,
)
from drba_tpu.models.gridnet_packed import gridnet_apply_packed
from drba_tpu.models.layers import init_from_spec


@pytest.mark.parametrize("union", [False, True])
@pytest.mark.parametrize("seq_chain", [False, True])
def test_gridnet_packed_matches_plain(union, seq_chain):
    spec = GRIDNET_UNION_SPEC if union else GRIDNET_SPEC
    cin = 9 if union else 12
    p = init_from_spec(spec, seed=3)
    rng = np.random.default_rng(4)
    n, h, w = 2, 16, 32  # chain kernel needs (W/2) % 8 == 0
    x = jnp.asarray(rng.standard_normal((n, h, w, cin)).astype(np.float32))
    x1 = jnp.asarray(rng.standard_normal((n, h, w, 128)).astype(np.float32))
    x2 = jnp.asarray(
        rng.standard_normal((n, h // 2, w // 2, 256)).astype(np.float32))
    x3 = jnp.asarray(
        rng.standard_normal((n, h // 4, w // 4, 384)).astype(np.float32))
    ref = gridnet_apply(p, x, x1, x2, x3, union=union, conv_backend="xla")
    got = gridnet_apply_packed(p, x, x1, x2, x3, union=union,
                               seq_chain=seq_chain)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
    # the conv_backend dispatch routes to the same implementation
    via_backend = gridnet_apply(
        p, x, x1, x2, x3, union=union,
        conv_backend="packed_chain" if seq_chain else "packed")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(via_backend))

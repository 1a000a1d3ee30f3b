"""Converter validation against the REAL reference checkpoints.

The snapshot ships the genuine feat.pkl / metric.pkl blobs for both gmfss
variants (the other blobs are stripped — /root/reference/.MISSING_LARGE_BLOBS).
These tests prove the converter's key map and layout transposes on real
torch pickles, not just synthetic state dicts: zero missing / zero extra
keys, finite values, and a numerical forward parity vs the torch nets loaded
from the same files (models/model_gmfss/GMFSS.py:45-56 is the load contract).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from drba_tpu.convert import from_torch_state_dict, load_torch_pickle
from drba_tpu.models.gmfss_nets import (
    FEATURENET_SPEC,
    METRICNET_SPEC,
    featurenet_apply,
    metricnet_apply,
)

WDIR = "/root/reference/weights"


def _real(path):
    p = os.path.join(WDIR, path)
    if not os.path.exists(p):
        pytest.skip(f"real checkpoint {path} not present")
    return p


@pytest.mark.parametrize("variant", ["train_log_gmfss", "train_log_gmfss_union"])
def test_feat_metric_full_key_coverage(variant):
    import torch

    for fname, spec in (("feat.pkl", FEATURENET_SPEC), ("metric.pkl", METRICNET_SPEC)):
        state = torch.load(_real(f"{variant}/{fname}"), map_location="cpu",
                           weights_only=False)
        stripped = {k.replace("module.", "", 1) if k.startswith("module.") else k
                    for k in state}
        spec_keys = set(spec)
        assert stripped == spec_keys, (
            f"{variant}/{fname}: missing={sorted(spec_keys - stripped)[:5]} "
            f"extra={sorted(stripped - spec_keys)[:5]}"
        )
        params = from_torch_state_dict(state, spec)
        for k, v in params.items():
            assert np.isfinite(np.asarray(v)).all(), k


def test_featurenet_forward_parity_real_weights(reference_path):
    """FeatureNet forward with the real feat.pkl matches the torch module."""
    import torch

    torch.manual_seed(0)
    from models.model_gmfss.FeatureNet import FeatureNet

    path = _real("train_log_gmfss/feat.pkl")
    state = torch.load(path, map_location="cpu", weights_only=False)
    net = FeatureNet().float().eval()
    net.load_state_dict({k.replace("module.", "", 1): v for k, v in state.items()})

    params = load_torch_pickle(path, FEATURENET_SPEC)

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (1, 32, 48, 3)).astype(np.float32)
    with torch.no_grad():
        ref = net(torch.tensor(x).permute(0, 3, 1, 2))
    out = featurenet_apply(params, jnp.asarray(x))
    for o, r in zip(out, ref):
        r = r.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(np.asarray(o), r, atol=2e-4, rtol=1e-3)


def test_metricnet_forward_parity_real_weights(reference_path):
    """MetricNet forward with the real metric.pkl matches the torch module."""
    import torch

    from models.model_gmfss.MetricNet import MetricNet

    path = _real("train_log_gmfss/metric.pkl")
    state = torch.load(path, map_location="cpu", weights_only=False)
    net = MetricNet().float().eval()
    net.load_state_dict({k.replace("module.", "", 1): v for k, v in state.items()})

    params = load_torch_pickle(path, METRICNET_SPEC)

    rng = np.random.default_rng(1)
    h, w = 32, 48
    i0 = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
    i1 = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
    f01 = rng.uniform(-3, 3, (1, h, w, 2)).astype(np.float32)
    f10 = rng.uniform(-3, 3, (1, h, w, 2)).astype(np.float32)

    def t(x):
        return torch.tensor(x).permute(0, 3, 1, 2)

    with torch.no_grad():
        r0, r1 = net(t(i0), t(i1), t(f01), t(f10))
    m0, m1 = metricnet_apply(
        params, jnp.asarray(i0), jnp.asarray(i1), jnp.asarray(f01),
        jnp.asarray(f10), union=False,
    )
    np.testing.assert_allclose(
        np.asarray(m0)[..., 0], r0.squeeze(1).numpy(), atol=5e-4, rtol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(m1)[..., 0], r1.squeeze(1).numpy(), atol=5e-4, rtol=1e-3
    )

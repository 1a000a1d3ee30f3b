"""End-to-end driver-protocol parity for the quality paths (gmfss, union).

Same protocol as tests/test_e2e_parity.py (the reference frame loop,
infer.py:93-169) but through the GMFSS / GMFSS_UNION wrappers: exercises
reuse chaining + direction swap, calc_drm_gmfss, calc_drm_rife_auxiliary,
the half-res aux RIFE and GridNet fusion wiring against the reference torch
driver with identical converted random weights.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from drba_tpu.config import F32
from drba_tpu.convert import from_torch_state_dict
from drba_tpu.models.gmflow_net import GMFLOW_SPEC
from drba_tpu.models.gmfss_core import GmfssParams
from drba_tpu.models.gmfss import GMFSS as OurGMFSS
from drba_tpu.models.gmfss_union import GMFSS_UNION as OurUNION
from drba_tpu.models.ifnet import IFNET_SPEC
from drba_tpu.models.gmfss_nets import (
    FEATURENET_SPEC,
    GRIDNET_SPEC,
    GRIDNET_UNION_SPEC,
    METRICNET_SPEC,
)
from drba_tpu.ops import ssim_matlab
from drba_tpu.pipeline import calc_ts
from drba_tpu.utils import TMapper

from tests.test_e2e_parity import _drive

H, W = 128, 192  # half-res /8 must divide the swin attn split


def _clip(n=5, w=W):
    rng = np.random.default_rng(7)
    base = rng.uniform(0.1, 0.9, (1, H, w, 3)).astype(np.float32)
    return [np.roll(base, 4 * i, axis=2).astype(np.float32) for i in range(n)]


@pytest.fixture(autouse=True)
def _ref_autocast_f32():
    """The reference decorates inference with CPU autocast (bf16); pin its
    autocast dtype to f32 so parity is measured against full-precision
    reference numerics (tolerances can then be tight)."""
    prev = torch.get_autocast_dtype("cpu")
    torch.set_autocast_dtype("cpu", torch.float32)
    yield
    torch.set_autocast_dtype("cpu", prev)


def _compare(ours_out, ref_out, min_gate=0.994, mean_gate=0.997):
    """Gates: measured floors vs the f32 reference are min 0.9951 /
    mean 0.9976 (gmfss) — SSIM on random-noise frames is hypersensitive;
    residual deviation comes from XLA-vs-torch accumulation order through
    GMFlow's correlation softmax and the fused bidirectional flow pass."""
    assert len(ours_out) == len(ref_out)
    ssims = [
        float(ssim_matlab(jnp.asarray(np.clip(a, 0, 1)), jnp.asarray(np.clip(b, 0, 1))))
        for a, b in zip(ours_out, ref_out)
    ]
    assert min(ssims) > min_gate, (min(ssims), ssims)
    assert float(np.mean(ssims)) > mean_gate, np.mean(ssims)


def _params_from(model):
    return GmfssParams(
        flownet=from_torch_state_dict(model.flownet.state_dict(), GMFLOW_SPEC),
        metricnet=from_torch_state_dict(model.metricnet.state_dict(), METRICNET_SPEC),
        feat_ext=from_torch_state_dict(model.feat_ext.state_dict(), FEATURENET_SPEC),
        fusionnet=from_torch_state_dict(
            model.fusionnet.state_dict(),
            GRIDNET_UNION_SPEC if model.fusionnet.__class__.__module__.startswith(
                "models.model_gmfss_union") else GRIDNET_SPEC,
        ),
    )


def _ts_of(idx, mapper):
    return calc_ts(idx, mapper, -1)


def test_gmfss_pipeline_output_parity(reference_path):
    from models.gmfss import GMFSS as TorchGMFSS
    from models.model_gmfss.GMFSS import Model

    torch.manual_seed(11)
    ref = TorchGMFSS.__new__(TorchGMFSS)
    ref.model = Model()
    ref.model.eval()
    ref.scale = 1.0
    ref.pad_size = 64

    ours = OurGMFSS(weights=None, scale=1.0, config=F32)
    ours.params = _params_from(ref.model)

    mapper = TMapper(24, 60, -1)
    frames = _clip()
    ours_out = _drive(
        ours, frames, lambda i: _ts_of(i, mapper),
        to_model=lambda f: jnp.asarray(f),
        from_model=lambda x: np.asarray(x, dtype=np.float32),
    )
    ref_out = _drive(
        ref, frames, lambda i: _ts_of(i, mapper),
        to_model=lambda f: torch.from_numpy(np.moveaxis(f, -1, 1).copy()),
        from_model=lambda t: np.moveaxis(t.float().numpy(), 1, -1),
    )
    _compare(ours_out, ref_out)


def test_gmfss_union_pipeline_output_parity(reference_path):
    from models.gmfss_union import GMFSS_UNION as TorchUNION
    from models.model_gmfss_union.GMFSS import Model as UnionModel
    from models.rife_426_heavy.IFNet_HDv3 import IFNet

    torch.manual_seed(13)
    ref = TorchUNION.__new__(TorchUNION)
    ref.model = UnionModel()
    ref.model.eval()
    ref.ifnet = IFNet().eval()
    ref.scale = 1.0
    ref.scale_list = [16, 8, 4, 2, 1]
    ref.pad_size = 128

    ours = OurUNION(weights=None, scale=1.0, config=F32)
    ours.params = _params_from(ref.model)
    ours.rife_params = from_torch_state_dict(ref.ifnet.state_dict(), IFNET_SPEC)

    mapper = TMapper(24, 60, -1)
    # half-res frames must be 64-divisible for the aux IFNet — hence the
    # union wrapper's pad_size of 128 (models/gmfss_union.py:23)
    frames = _clip(w=256)
    ours_out = _drive(
        ours, frames, lambda i: _ts_of(i, mapper),
        to_model=lambda f: jnp.asarray(f),
        from_model=lambda x: np.asarray(x, dtype=np.float32),
    )
    ref_out = _drive(
        ref, frames, lambda i: _ts_of(i, mapper),
        to_model=lambda f: torch.from_numpy(np.moveaxis(f, -1, 1).copy()),
        from_model=lambda t: np.moveaxis(t.float().numpy(), 1, -1),
    )
    _compare(ours_out, ref_out)

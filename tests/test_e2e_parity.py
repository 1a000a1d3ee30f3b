"""End-to-end output parity: our frame loop vs the reference driver.

Runs both implementations over the same frame sequence with identical
(random, converted) weights and compares every emitted frame by SSIM —
exercising the full stack: ts planning, scene branching, reuse chaining,
DRM, network forward, splats.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from drba_tpu.convert import from_torch_state_dict
from drba_tpu.models.ifnet import IFNET_SPEC
from drba_tpu.models.rife import RIFE as OurRIFE
from drba_tpu.config import F32
from drba_tpu.ops import ssim_matlab
from drba_tpu.pipeline import calc_ts
from drba_tpu.utils import TMapper

H, W = 64, 128


def _clip(n=7):
    rng = np.random.default_rng(42)
    base = rng.uniform(0.1, 0.9, (1, H, W, 3)).astype(np.float32)
    return [np.roll(base, 3 * i, axis=2).astype(np.float32) for i in range(n)]


def _drive(model, frames, ts_of, to_model, from_model):
    """The reference frame-loop protocol (infer.py:93-169) over raw frames."""
    out = []
    I0, I1 = to_model(frames[0]), to_model(frames[1])
    idx = 0
    ts = ts_of(idx)
    left = ts[ts < 1]
    right = ts[ts >= 1] - 1
    out += [from_model(I0)] * len(left)
    out += [from_model(x) for x in model.inference_ts(I0, I1, right)]
    reuse = None
    for k in range(2, len(frames)):
        I2 = to_model(frames[k])
        ts = ts_of(idx)
        res, reuse = model.inference_ts_drba(I0, I1, I2, ts, reuse, linear=True)
        out += [from_model(x) for x in res]
        I0, I1 = I1, I2
        idx += 1
    ts = ts_of(idx)
    left = ts[ts <= 1]
    right = ts[ts > 1] - 1
    out += [from_model(x) for x in model.inference_ts(I0, I1, left)]
    out += [from_model(I1)] * len(right)
    return out


@pytest.mark.parametrize("fps_pair", [(24, 60)])
def test_rife_pipeline_output_parity(reference_path, fps_pair):
    from models.rife import RIFE as TorchRIFE
    from models.rife_426_heavy.IFNet_HDv3 import IFNet

    torch.manual_seed(3)
    ref = TorchRIFE.__new__(TorchRIFE)
    ref.ifnet = IFNet().eval()
    ref.scale = 1.0
    ref.scale_list = [16, 8, 4, 2, 1]
    ref.pad_size = 64

    ours = OurRIFE(weights=None, scale=1.0, config=F32)
    ours.params = from_torch_state_dict(ref.ifnet.state_dict(), IFNET_SPEC)

    src_fps, dst_fps = fps_pair
    mapper = TMapper(src_fps, dst_fps, -1)
    ts_of = lambda idx: calc_ts(idx, mapper, -1)

    frames = _clip()
    ours_out = _drive(
        ours, frames,
        ts_of,
        to_model=lambda f: jnp.asarray(f),
        from_model=lambda x: np.asarray(x, dtype=np.float32),
    )
    ref_out = _drive(
        ref, frames,
        ts_of,
        to_model=lambda f: torch.from_numpy(np.moveaxis(f, -1, 1).copy()),
        from_model=lambda t: np.moveaxis(t.float().numpy(), 1, -1),
    )

    assert len(ours_out) == len(ref_out)
    ssims = [
        float(ssim_matlab(jnp.asarray(np.clip(a, 0, 1)), jnp.asarray(np.clip(b, 0, 1))))
        for a, b in zip(ours_out, ref_out)
    ]
    # the reference runs its model under CPU autocast (bf16), so parity is
    # bounded by ITS precision; our pipeline runs f32
    assert min(ssims) > 0.98, (min(ssims), ssims)
    assert float(np.mean(ssims)) > 0.995, np.mean(ssims)

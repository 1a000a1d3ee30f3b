"""RIFE wrapper parity + end-to-end pipeline smoke test (BASELINE config 1)."""

import os

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from drba_tpu.config import F32
from drba_tpu.convert import from_torch_state_dict
from drba_tpu.models.ifnet import IFNET_SPEC
from drba_tpu.models.rife import RIFE

H, W = 64, 128


@pytest.fixture(scope="module")
def pair(reference_path):
    """(reference torch RIFE, our RIFE) sharing identical random weights."""
    from models.rife import RIFE as TorchRIFE

    torch.manual_seed(0)
    ref = TorchRIFE.__new__(TorchRIFE)
    from models.rife_426_heavy.IFNet_HDv3 import IFNet

    ref.ifnet = IFNet().eval()
    ref.scale = 1.0
    ref.scale_list = [16, 8, 4, 2, 1]
    ref.pad_size = 64

    ours = RIFE(weights=None, scale=1.0, config=F32)
    ours.params = from_torch_state_dict(ref.ifnet.state_dict(), IFNET_SPEC)
    return ref, ours


def _imgs(n=3):
    rng = np.random.default_rng(5)
    base = rng.uniform(0.2, 0.8, (1, H, W, 3)).astype(np.float32)
    outs = []
    for i in range(n):
        img = np.roll(base, shift=3 * i, axis=2)  # horizontal motion
        outs.append(img)
    return outs


def _tc(x):
    return torch.from_numpy(np.moveaxis(x, -1, 1).copy())


def test_calc_flow_parity(pair):
    ref, ours = pair
    I1, I0 = _imgs(2)
    with torch.inference_mode():
        t_f01, t_f10, _, _ = ref.calc_flow(_tc(I1), _tc(I0))
    g_f01, g_f10, _, _ = ours._calc_flow(jnp.asarray(I1), jnp.asarray(I0))
    # flow values span +-W pixels; amplification through the splat-normalize
    # division leaves ~3e-3 accumulation noise on near-zero entries
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(g_f01), -1, 1), t_f01.numpy(), rtol=0, atol=1e-2
    )
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(g_f10), -1, 1), t_f10.numpy(), rtol=0, atol=1e-2
    )


def test_inference_ts_drba_parity(pair):
    ref, ours = pair
    I0, I1, I2 = _imgs(3)
    ts = np.array([0.5, 1.0, 1.3])

    # the reference method is wrapped in CPU autocast (bf16) — compare loosely
    want, t_reuse = ref.inference_ts_drba(_tc(I0), _tc(I1), _tc(I2), ts, None, linear=True)
    got, g_reuse = ours.inference_ts_drba(
        jnp.asarray(I0), jnp.asarray(I1), jnp.asarray(I2), ts, None, linear=True
    )
    assert len(got) == len(want) == 3
    for g, t in zip(got, want):
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(g), -1, 1), t.float().numpy(), atol=0.05
        )
    # reuse chaining: second window consumes the first window's reuse
    got2, _ = ours.inference_ts_drba(
        jnp.asarray(I1), jnp.asarray(I2), jnp.asarray(I0), np.array([0.7]), g_reuse, linear=True
    )
    assert len(got2) == 1


def test_inference_ts_integer_passthrough(pair):
    _, ours = pair
    I0, I1, _ = _imgs(3)
    out = ours.inference_ts(jnp.asarray(I0), jnp.asarray(I1), np.array([0.0, 1.0]))
    np.testing.assert_allclose(np.asarray(out[0]), I0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[1]), I1, atol=1e-6)


def _make_video(path, n_frames=10, fps=12):
    import cv2

    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (W, H))
    rng = np.random.default_rng(0)
    base = (rng.uniform(0, 255, (H, W, 3))).astype(np.uint8)
    for i in range(n_frames):
        w.write(np.roll(base, shift=4 * i, axis=1))
    w.release()


def test_cli_end_to_end(tmp_path):
    """BASELINE config 1: rife x2 on a short clip, CPU-runnable, no scdet."""
    import cv2

    from drba_tpu.cli import main

    inp = str(tmp_path / "in.mp4")
    outp = str(tmp_path / "out.mp4")
    _make_video(inp, n_frames=8, fps=12)

    stats = main(["-m", "rife", "-i", inp, "-o", outp, "-t", "2", "--fp32",
                  "--weights", str(tmp_path / "nonexistent")])
    assert stats.frames_in == 8
    assert stats.frames_out == 16

    cap = cv2.VideoCapture(outp)
    assert cap.isOpened()
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    assert n == 16
    assert abs(cap.get(cv2.CAP_PROP_FPS) - 24) < 0.1
    cap.release()


def test_cli_scdet_end_to_end(tmp_path):
    """BASELINE config 2 shape: -fps with scene detection active."""
    import cv2

    from drba_tpu.cli import main

    inp = str(tmp_path / "in.mp4")
    outp = str(tmp_path / "out.mp4")
    # two different "scenes"
    w = cv2.VideoWriter(inp, cv2.VideoWriter_fourcc(*"mp4v"), 12, (W, H))
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 255, (H, W, 3)).astype(np.uint8)
    b = 255 - a
    for i in range(4):
        w.write(np.roll(a, 3 * i, axis=1))
    for i in range(4):
        w.write(np.roll(b, 3 * i, axis=1))
    w.release()

    stats = main(["-m", "rife", "-i", inp, "-o", outp, "-fps", "24", "-s", "-st", "0.3",
                  "--fp32", "--weights", str(tmp_path / "nonexistent")])
    assert stats.frames_out > stats.frames_in
    assert stats.scene_cuts >= 1

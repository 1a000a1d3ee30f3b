"""End-to-end pipeline smoke tests for the gmfss / gmfss_union paths
(BASELINE configs 3 and 4 shapes, tiny frames, random weights)."""

import numpy as np
import pytest

H, W = 128, 256  # divisible by the union pad size 128


def _make_video(path, n_frames=6, fps=12):
    import cv2

    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (W, H))
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (H, W, 3)).astype(np.uint8)
    for i in range(n_frames):
        w.write(np.roll(base, 5 * i, axis=1))
    w.release()


@pytest.mark.parametrize("model_type", ["gmfss", "gmfss_union"])
def test_cli_end_to_end(tmp_path, model_type):
    import cv2

    from drba_tpu.cli import main

    inp = str(tmp_path / "in.mp4")
    outp = str(tmp_path / f"out_{model_type}.mp4")
    _make_video(inp)

    stats = main([
        "-m", model_type, "-i", inp, "-o", outp, "-t", "2", "--fp32",
        "--weights", str(tmp_path / "nonexistent"),
    ])
    assert stats.frames_in == 6
    assert stats.frames_out == 12

    cap = cv2.VideoCapture(outp)
    assert cap.isOpened()
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 12
    cap.release()


def test_gmfss_scale_flag(tmp_path):
    """-scale 0.5 (the 4K recommendation, infer.py:34-35) end-to-end."""
    from drba_tpu.cli import main

    inp = str(tmp_path / "in.mp4")
    outp = str(tmp_path / "out.mp4")
    _make_video(inp)
    stats = main([
        "-m", "gmfss", "-i", inp, "-o", outp, "-fps", "30", "--fp32",
        "-scale", "0.5", "--weights", str(tmp_path / "nonexistent"),
    ])
    assert stats.frames_out > stats.frames_in

"""Multi-chip window parallelism on the virtual 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from drba_tpu.config import F32
from drba_tpu.models.rife import RIFE
from drba_tpu.parallel.batch import WindowPlanner
from drba_tpu.parallel.mesh import make_mesh


def _roll_frames(n, h, w, seed=0, shift=3):
    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
    return [jnp.asarray(np.roll(base, shift * i, axis=2)) for i in range(n)]


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_windows_bit_match_serial_chain():
    """The ppermute reuse-chain exchange makes the sharded plan reproduce the
    serial reuse-chained pipeline output exactly."""
    model = RIFE(weights=None, scale=1.0, config=F32)
    mesh = make_mesh(4)
    h, w = 64, 64
    B = 4
    frames = _roll_frames(B + 2, h, w)
    ts = np.asarray([0.5, 1.5], np.float32)
    windows = [(frames[k], frames[k + 1], frames[k + 2], ts) for k in range(B)]

    with mesh:
        planner = WindowPlanner(mesh, model, ts_bucket=2)
        sharded = list(planner.run(windows))

    # serial reference: the reuse-chained model API
    reuse = None
    for k in range(B):
        out, reuse = model.inference_ts_drba(
            frames[k], frames[k + 1], frames[k + 2], ts, reuse, linear=True
        )
        for a, b in zip(sharded[k], out):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_window_planner_order_and_trim():
    model = RIFE(weights=None, scale=1.0, config=F32)
    mesh = make_mesh(4)
    h, w = 64, 64

    frames = _roll_frames(8, h, w, seed=1)
    windows = [
        (frames[i], frames[i + 1], frames[i + 2], np.linspace(0.5, 1.4, 2 + i % 2))
        for i in range(6)
    ]  # 6 windows over 4 devices
    with mesh:
        planner = WindowPlanner(mesh, model, ts_bucket=3)
        outs = list(planner.run(windows))
    assert len(outs) == 6
    for i, frames_out in enumerate(outs):
        assert len(frames_out) == 2 + i % 2
        for f in frames_out:
            assert f.shape == (1, h, w, 3)


def test_graft_entry_contract():
    import importlib.util

    spec = importlib.util.spec_from_file_location("graft_entry", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 3  # T timesteps

    mod.dryrun_multichip(8)


def test_gmfss_sharded_windows_bit_match_serial_chain():
    """Quality-path sharded plan == serial reuse-chained model output."""
    from drba_tpu.models.gmfss import GMFSS

    model = GMFSS(weights=None, scale=1.0, config=F32)
    mesh = make_mesh(2)
    h, w = 128, 192
    B = 2
    frames = _roll_frames(B + 2, h, w, seed=2)
    ts = np.asarray([0.5, 1.5], np.float32)
    windows = [(frames[k], frames[k + 1], frames[k + 2], ts) for k in range(B)]

    with mesh:
        planner = WindowPlanner(mesh, model, ts_bucket=2)
        sharded = list(planner.run(windows))

    reuse = None
    for k in range(B):
        out, reuse = model.inference_ts_drba(
            frames[k], frames[k + 1], frames[k + 2], ts, reuse, linear=True
        )
        for a, b in zip(sharded[k], out):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_parallel_pipeline_scdet(tmp_path):
    """Multi-device pipeline with scene detection: cut windows take the
    branch semantics serially, clean runs batch across the mesh."""
    import cv2

    from drba_tpu.cli import main

    H, W = 64, 128
    inp = str(tmp_path / "in_cut.mp4")
    outp = str(tmp_path / "out_cut.mp4")
    vw = cv2.VideoWriter(inp, cv2.VideoWriter_fourcc(*"mp4v"), 12, (W, H))
    rng = np.random.default_rng(5)
    a = rng.uniform(0, 255, (H, W, 3)).astype(np.uint8)
    b = rng.uniform(0, 255, (H, W, 3)).astype(np.uint8)  # unrelated: a cut
    for i in range(10):
        base = a if i < 5 else b
        vw.write(np.roll(base, 4 * i, axis=1))
    vw.release()

    stats = main(["-m", "rife", "-i", inp, "-o", outp, "-t", "2", "--fp32",
                  "-s", "-st", "0.3", "--devices", "4",
                  "--weights", str(tmp_path / "none")])
    assert stats.frames_in == 10
    assert stats.frames_out == 20
    assert stats.scene_cuts >= 1
    cap = cv2.VideoCapture(outp)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 20
    cap.release()


def test_parallel_pipeline_end_to_end(tmp_path):
    """Multi-device window pipeline over the virtual 8-device mesh."""
    import cv2

    from drba_tpu.cli import main

    H, W = 64, 128
    inp = str(tmp_path / "in.mp4")
    outp = str(tmp_path / "out.mp4")
    w = cv2.VideoWriter(inp, cv2.VideoWriter_fourcc(*"mp4v"), 12, (W, H))
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 255, (H, W, 3)).astype(np.uint8)
    for i in range(12):
        w.write(np.roll(base, 4 * i, axis=1))
    w.release()

    stats = main(["-m", "rife", "-i", inp, "-o", outp, "-t", "2", "--fp32",
                  "--devices", "8", "--weights", str(tmp_path / "none")])
    assert stats.frames_in == 12
    assert stats.frames_out == 24
    cap = cv2.VideoCapture(outp)
    assert int(cap.get(cv2.CAP_PROP_FRAME_COUNT)) == 24
    cap.release()


def test_union_sharded_windows_bit_match_serial_chain():
    """GMFSS_UNION sharded plan == serial reuse-chained model output (the
    union branch of make_window_fn: aux RIFE + gmfss reuse exchange)."""
    from drba_tpu.models.gmfss_union import GMFSS_UNION

    model = GMFSS_UNION(weights=None, scale=1.0, config=F32)
    mesh = make_mesh(2)
    h, w = 128, 256  # pad_size 128
    B = 2
    frames = _roll_frames(B + 2, h, w, seed=3)
    ts = np.asarray([0.5, 1.5], np.float32)
    windows = [(frames[k], frames[k + 1], frames[k + 2], ts) for k in range(B)]

    with mesh:
        planner = WindowPlanner(mesh, model, ts_bucket=2)
        sharded = list(planner.run(windows))

    reuse = None
    for k in range(B):
        out, reuse = model.inference_ts_drba(
            frames[k], frames[k + 1], frames[k + 2], ts, reuse, linear=True
        )
        for a, b in zip(sharded[k], out):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

"""GMFlow reuse chaining across scene-cut windows (VERDICT r3 weak 7).

The reference recomputes its full flow/metric/feature pass for every plain
``inference_ts`` call in the scene branches (infer.py:126-140 +
models/gmfss.py reuse recompute); here the pipeline hands the chain carry
into cut windows and captures the pass a cut window computes for the next
window's chain. These tests pin (a) numerical identity of the chained
calls, (b) the actual saving, counted at the model.reuse boundary.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from drba_tpu.config import F32
from drba_tpu.models.gmfss import GMFSS
from drba_tpu.pipeline import run_pipeline

H, W = 64, 128


def _frames(n, cut_at=()):
    # smooth low-frequency content: a 2 px pan keeps SSIM ~1 (no spurious
    # cuts); the inversion at cut_at is the only real cut
    x = np.linspace(0, 6 * np.pi, W)[None, :, None]
    y = np.linspace(0, 4 * np.pi, H)[:, None, None]
    p = np.arange(3)[None, None, :]
    base = ((np.sin(x + p) * np.cos(y - p) * 0.5 + 0.5) * 255).astype(np.uint8)
    out = []
    for i in range(n):
        if i in cut_at:
            base = 255 - base  # hard cut
        else:
            base = np.roll(base, 2, axis=1)
        out.append(base.copy())
    return out


class _FakeIO:
    src_fps, dst_fps = 24.0, 60.0
    total_frames_count = 0

    def __init__(self, frames):
        self._frames = list(frames)
        self.written = []

    def read_frame(self):
        return self._frames.pop(0) if self._frames else None

    def write_frame(self, frame):
        self.written.append(frame)

    def finish_writing(self):
        return True


@pytest.fixture(scope="module")
def model():
    return GMFSS(weights=None, scale=1.0, config=F32)


def test_inference_ts_chained_identity(model):
    rng = np.random.default_rng(0)
    I0 = jnp.asarray(rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32))
    I1 = jnp.asarray(np.roll(np.asarray(I0), 3, axis=2))
    ts = [0.25, 0.75]

    plain = model.inference_ts(I0, I1, ts)
    frames, r = model.inference_ts(I0, I1, ts, return_reuse=True)
    seeded = model.inference_ts(I0, I1, ts, reuse=r)
    for a, b, c in zip(plain, frames, seeded):
        assert (np.asarray(a) == np.asarray(b)).all()
        assert (np.asarray(a) == np.asarray(c)).all()

    # the handed-back pass IS the I0->I1 pass (swap round-trips)
    fresh = model.reuse(I0, I1)
    for got, want in zip(jax.tree_util.tree_leaves(r.swapped().swapped()),
                         jax.tree_util.tree_leaves(fresh)):
        assert (np.asarray(got) == np.asarray(want)).all()


def test_pipeline_cut_windows_skip_gmflow(model):
    """6 frames with one hard cut: the rs-branch window and the tail chain
    the existing pass; only head, the first drba window, and the ls-branch
    window pay a model.reuse call."""
    calls = {"n": 0}
    orig = model.reuse

    def counting(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    model.reuse = counting
    try:
        stats = run_pipeline(model, _FakeIO(_frames(6, cut_at=(3,))),
                             enable_scdet=True, scdet_threshold=0.3)
    finally:
        model.reuse = orig

    assert stats.scene_cuts == 1, stats
    # head(1) + first drba window(1) + ls window seeding the chain(1);
    # rs window, post-cut drba window, and tail ride the chain (0)
    assert calls["n"] == 3, calls["n"]
    assert stats.frames_out > 0

"""Segmented output + job-level resume (SURVEY §5 failure-recovery gap).

The reference has no recovery: a crash leaves an unusable mp4. Here output
is written in crash-safe segments with an atomic manifest; a resumed run
skips the device compute for completed windows and the final video must be
identical to an uninterrupted run.
"""

import json
import os

import numpy as np
import pytest


def _make_video(path, n_frames=10, fps=12, w=128, h=64):
    import cv2

    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    rng = np.random.default_rng(0)
    # smooth content: random noise is x264's worst case and its qp16 noise
    # (~4-8 gray levels) would swamp the frame-exactness check below
    base = cv2.GaussianBlur(
        rng.uniform(0, 255, (h, w, 3)).astype(np.uint8), (11, 11), 4
    )
    for i in range(n_frames):
        vw.write(np.roll(base, 4 * i, axis=1))
    vw.release()


def _frames(path):
    import cv2

    cap = cv2.VideoCapture(path)
    out = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        out.append(f)
    cap.release()
    return out


def test_hw_flag_never_crashes_where_plain_mode_works(tmp_path):
    """``-hw`` on a host without the reference's hardcoded nvenc
    (models/utils/tools.py:176-178) must probe and fall back — the output
    file must exist and decode with the right frame count (VERDICT r2 #6),
    through both the plain and the segmented writer."""
    from drba_tpu.cli import main
    from drba_tpu.utils.video_io import select_encoder

    args = select_encoder(True)
    assert "-c:v" in args  # probe returned a concrete encoder selection

    inp = str(tmp_path / "in.mp4")
    _make_video(inp)
    out = str(tmp_path / "hw.mp4")
    stats = main(["-m", "rife", "-i", inp, "-o", out, "-t", "2", "--fp32",
                  "-hw", "--weights", str(tmp_path / "none")])
    assert stats.frames_out == 20
    assert len(_frames(out)) == 20

    seg = str(tmp_path / "hw_seg.mp4")
    main(["-m", "rife", "-i", inp, "-o", seg, "-t", "2", "--fp32", "-hw",
          "--seg-frames", "6", "--weights", str(tmp_path / "none")])
    assert len(_frames(seg)) == 20


def test_segmented_resume_matches_uninterrupted(tmp_path):
    from drba_tpu.cli import main

    inp = str(tmp_path / "in.mp4")
    _make_video(inp)

    # uninterrupted segmented run = the golden output
    gold = str(tmp_path / "gold.mp4")
    stats = main(["-m", "rife", "-i", inp, "-o", gold, "-t", "2", "--fp32",
                  "--seg-frames", "6", "--weights", str(tmp_path / "none")])
    assert stats.frames_out == 20
    assert not os.path.exists(gold + ".segments")  # cleaned after finalize
    gold_frames = _frames(gold)
    assert len(gold_frames) == 20

    # simulate a crash: a previous run wrote the first 12 output frames
    # (2 full segments) and died before finalizing — feed the golden frames
    # through a SegmentedVideoIO and stop WITHOUT finish_writing
    out = str(tmp_path / "out.mp4")
    from drba_tpu.utils.segmented_io import SegmentedVideoIO

    vio = SegmentedVideoIO(inp, out, times=2, seg_frames=6)
    for f in gold_frames[:12]:
        vio.write_frame(f)
    vio.write_buffer.put(None)  # crash: writer commits segments, no concat
    vio._writer_t.join(timeout=60)
    manifest = json.load(open(out + ".segments/manifest.json"))
    done = sum(s["frames"] for s in manifest["segments"])
    assert done == 12 and not os.path.exists(out)

    # resume: completed frames skipped, rest recomputed, final output whole
    stats2 = main(["-m", "rife", "-i", inp, "-o", out, "-t", "2", "--fp32",
                   "--seg-frames", "6", "--resume",
                   "--weights", str(tmp_path / "none")])
    assert stats2.frames_out == 20 - done
    out_frames = _frames(out)
    assert len(out_frames) == 20
    # The freshly computed tail must match the uninterrupted run frame-exact
    # (codec noise only). The head's deviation here is an artifact of the
    # crash SIMULATION (we re-encoded decoded golden frames, costing one
    # generation); in a real resume the head was written once by the
    # original run.
    def diff(a, b):
        return float(np.abs(a.astype(np.int16) - b.astype(np.int16)).mean())

    worst_tail = max(diff(a, b) for a, b in zip(out_frames[12:], gold_frames[12:]))
    assert worst_tail < 1.5, worst_tail
    worst_head = max(diff(a, b) for a, b in zip(out_frames[:12], gold_frames[:12]))
    assert worst_head < 5.0, worst_head  # one extra x264 generation

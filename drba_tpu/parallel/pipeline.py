"""Multi-chip frame pipeline: window-batch data parallelism.

Wraps the serial frame loop (drba_tpu/pipeline.py) with the reuse-chained
window plan (drba_tpu/parallel/batch.py): decoded windows accumulate into
device-count batches, each chip computes one window's full timestep set, and
frames emit in order. All three model paths have batched window programs
(make_window_fn).

Scene-change detection is supported: scene flags are computed per frame pair
as windows are decoded (one fused 32x32 SSIM reduction each, the only
per-window host sync); windows touching a cut take the reference's branch
semantics (infer.py:122-143) serially at their position in the stream, while
runs of clean windows between cuts batch across the mesh.

Host I/O overlaps compute: decode+upload runs in a prefetch thread and
download+encode in an emitter thread (the same _Prefetcher/_Emitter as the
serial pipeline) — on this relay host transfers are the scarce resource.

Output parity: the per-window reuse chain is preserved across chips by a
``lax.ppermute`` neighbor exchange (see parallel/batch.py), so multi-device
output is bit-identical to the serial pipeline; chain breaks (scene cuts,
serial windows) reset the carry exactly like serial ``reuse = None``.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from drba_tpu.parallel.batch import WindowPlanner
from drba_tpu.parallel.mesh import make_mesh
from drba_tpu.pipeline import PipelineStats, _Emitter, _Prefetcher, calc_ts
from drba_tpu.utils import TMapper, check_scene, get_valid_net_inp_size, to_inp
from drba_tpu.utils.video_io import VideoFI_IO


def run_pipeline_parallel(
    model,
    video_io: VideoFI_IO,
    n_devices: Optional[int] = None,
    progress=None,
    times: int = -1,
    enable_scdet: bool = False,
    scdet_threshold: float = 0.3,
) -> PipelineStats:
    stats = PipelineStats()
    src_fps, dst_fps = video_io.src_fps, video_io.dst_fps
    if dst_fps <= src_fps:
        raise ValueError(f"dst fps must exceed src fps ({dst_fps} <= {src_fps})")

    mesh = make_mesh(n_devices)
    ts_bucket = int(np.ceil(dst_fps / src_fps)) + 1 if times == -1 else times + 1
    planner = WindowPlanner(mesh, model, ts_bucket)

    i0, i1 = video_io.read_frame(), video_io.read_frame()
    if i0 is None or i1 is None:
        raise ValueError("video has fewer than two frames")
    stats.frames_in = 2

    size = get_valid_net_inp_size(i0, model.scale, div=model.pad_size)
    src_size, dst_size = size["src_size"], size["dst_size"]
    dtype = model.config.compute_dtype

    I0 = to_inp(i0, dst_size, dtype)
    I1 = to_inp(i1, dst_size, dtype)

    t_mapper = TMapper(src_fps, dst_fps, times)
    idx = 0

    prefetch = _Prefetcher(video_io, dst_size, dtype)
    emitter = _Emitter(video_io, src_size, stats)

    def scene(a, b):
        if not enable_scdet:
            return False
        cut = check_scene(a, b, scdet_threshold)
        if cut:
            stats.scene_cuts += 1
        return cut

    def emit_window(frame_list):
        for x in frame_list:
            emitter.emit(x)
        if progress:
            progress(1)

    # entries: ("batch", (I0, I1, I2, ts)) or ("serial", [frames]) in stream
    # order; flushed as contiguous batched groups + in-place serial windows.
    entries = []

    def flush():
        batch_group = []

        def drain_batch():
            nonlocal batch_group
            if batch_group:
                for frame_list in planner.run(batch_group):
                    emit_window(frame_list)
                batch_group = []

        for kind, payload in entries:
            if kind == "batch":
                batch_group.append(payload)
            else:
                drain_batch()
                # scene-cut/serial windows break the reuse chain exactly like
                # the serial pipeline's ``reuse = None``
                planner.reset_chain()
                emit_window(payload)
        drain_batch()
        entries.clear()

    # ---- head (infer.py:93-110) ------------------------------------------
    ts = calc_ts(idx, t_mapper, times)
    left_scene = scene(I0, I1)
    if left_scene:
        emit_window([I0 for _ in ts])
    else:
        left_ts = ts[ts < 1]
        right_ts = ts[ts >= 1] - 1
        head = [I0 for _ in left_ts]
        head.extend(model.inference_ts(I0, I1, right_ts))
        emit_window(head)

    # ---- body --------------------------------------------------------------
    while True:
        I2 = prefetch.next()
        if I2 is None:
            break
        stats.frames_in += 1
        ts = calc_ts(idx, t_mapper, times)
        right_scene = scene(I1, I2)

        if left_scene and right_scene:
            entries.append(("serial", [I1 for _ in ts]))
        elif left_scene:
            left_ts = ts[ts < 1]
            right_ts = ts[ts >= 1] - 1
            out = [I1 for _ in left_ts]
            out.extend(model.inference_ts(I1, I2, right_ts))
            entries.append(("serial", out))
        elif right_scene:
            left_ts = ts[ts <= 1]
            right_ts = ts[ts > 1] - 1
            out = model.inference_ts(I0, I1, left_ts)
            out.extend([I1 for _ in right_ts])
            entries.append(("serial", out))
        else:
            entries.append(("batch", (I0, I1, I2, ts)))

        I0, I1 = I1, I2
        left_scene = right_scene
        idx += 1
        stats.windows += 1

        if len(entries) >= planner.batch * 4:  # flush in multi-batch chunks
            flush()

    flush()

    # ---- tail --------------------------------------------------------------
    ts = calc_ts(idx, t_mapper, times)
    left_ts = ts[ts <= 1]
    right_ts = ts[ts > 1] - 1
    tail = model.inference_ts(I0, I1, left_ts)
    tail.extend([I1 for _ in right_ts])
    emit_window(tail)

    emitter.finish()
    video_io.finish_writing()
    return stats

"""Multi-chip frame pipeline: window-batch data parallelism.

Wraps the serial frame loop (drba_tpu/pipeline.py) with the reuse-free
window plan (drba_tpu/parallel/batch.py): decoded windows accumulate into
device-count batches, each chip computes one window's full timestep set, and
frames emit in order. Scene-change branching requires a serial decision per
window, so this path currently runs without scdet (the serial pipeline
handles that mode).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from drba_tpu.parallel.batch import WindowPlanner
from drba_tpu.parallel.mesh import make_mesh
from drba_tpu.pipeline import PipelineStats, calc_ts
from drba_tpu.utils import TMapper, get_valid_net_inp_size, to_inp, to_out
from drba_tpu.utils.video_io import VideoFI_IO


def run_pipeline_parallel(
    model,
    video_io: VideoFI_IO,
    n_devices: Optional[int] = None,
    progress=None,
    times: int = -1,
) -> PipelineStats:
    stats = PipelineStats()
    src_fps, dst_fps = video_io.src_fps, video_io.dst_fps
    if dst_fps <= src_fps:
        raise ValueError(f"dst fps must exceed src fps ({dst_fps} <= {src_fps})")

    mesh = make_mesh(n_devices)
    ts_bucket = int(np.ceil(dst_fps / src_fps)) + 1 if times == -1 else times + 1
    planner = WindowPlanner(mesh, model.params, model.scale_list, ts_bucket)

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

    def emit(x):
        video_io.write_frame(to_out(x, src_size))
        stats.frames_out += 1

    # head (no scdet in the parallel plan)
    ts = calc_ts(idx, t_mapper, times)
    left_ts = ts[ts < 1]
    right_ts = ts[ts >= 1] - 1
    for _ in left_ts:
        emit(I0)
    for x in model.inference_ts(I0, I1, right_ts):
        emit(x)
    if progress:
        progress(1)

    # body: batch windows across the mesh
    windows = []
    frames_dev = [I0, I1]
    while True:
        i2 = video_io.read_frame()
        if i2 is None:
            break
        stats.frames_in += 1
        I2 = to_inp(i2, dst_size, dtype)
        frames_dev.append(I2)
        ts = calc_ts(idx, t_mapper, times)
        windows.append((frames_dev[-3], frames_dev[-2], frames_dev[-1], ts))
        idx += 1
        stats.windows += 1

        if len(windows) >= planner.batch * 4:  # flush in multi-batch chunks
            for frame_list in planner.run(windows):
                for x in frame_list:
                    emit(x)
                if progress:
                    progress(1)
            windows = []
            frames_dev = frames_dev[-2:]

    if windows:
        for frame_list in planner.run(windows):
            for x in frame_list:
                emit(x)
            if progress:
                progress(1)

    # tail
    I0f, I1f = frames_dev[-2], frames_dev[-1]
    ts = calc_ts(idx, t_mapper, times)
    left_ts = ts[ts <= 1]
    right_ts = ts[ts > 1] - 1
    for x in model.inference_ts(I0f, I1f, left_ts):
        emit(x)
    for _ in right_ts:
        emit(I1f)
    if progress:
        progress(1)

    video_io.finish_writing()
    return stats

"""Frame-loop orchestration: sliding 3-frame window with DRM interpolation.

Behavioral spec is the reference driver (infer.py:58-174): head interval,
body loop over (I0, I1, I2) windows with a 4-way scene-change branch
(infer.py:122-143), reuse chaining across windows, tail interval.

TPU-first notes:
  * frames stay HBM-resident across windows — only decoded uint8 frames in
    and finished uint8 frames out cross the host boundary;
  * each window is a single jitted program (see models/rife.py), so the
    python here only routes device arrays and booleans;
  * scene detection is one fused reduction; its boolean is the only
    per-window device->host sync besides frame output.
"""

from __future__ import annotations

import collections
import contextlib
import queue
import threading
import time
from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np

from drba_tpu.utils import TMapper, get_valid_net_inp_size, to_inp, to_out
from drba_tpu.utils.profiling import StageTimes
from drba_tpu.utils.scdet import scene_ssim
from drba_tpu.utils.video_io import VideoFI_IO

_EMPTY = object()  # non-blocking pull found nothing (distinct from EOF None)


class _Prefetcher:
    """Decode+upload thread: hides host->device frame transfer latency
    (the scarce resource on relayed TPU runtimes) behind window compute.

    A decoder/upload failure is captured and re-raised on the consuming
    thread at the next ``next()`` (the reference's decode thread dies
    silently and the main loop hangs on the queue, tools.py:163-171)."""

    def __init__(self, video_io, dst_size, dtype, depth: int = 3):
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._exc: Optional[BaseException] = None
        self._t = threading.Thread(
            target=self._loop, args=(video_io, dst_size, dtype), daemon=True
        )
        self._t.start()

    def _loop(self, video_io, dst_size, dtype):
        try:
            while True:
                frame = video_io.read_frame()
                if frame is None:
                    self._q.put(None)
                    return
                self._q.put(to_inp(frame, dst_size, dtype))
        except BaseException as e:  # propagate to the consumer
            self._exc = e
            self._q.put(None)

    def _check(self, item):
        if item is None and self._exc is not None:
            raise RuntimeError("frame decode/upload thread failed") from self._exc
        return item

    def next(self):
        return self._check(self._q.get())

    def next_nowait(self):
        """Non-blocking pull: a queued frame, None at EOF, or ``_EMPTY``."""
        try:
            return self._check(self._q.get_nowait())
        except queue.Empty:
            return _EMPTY


class _Emitter:
    """Parallel download pool + ordered encode writer.

    Round-5 e2e profile: a single drain thread downloads one frame per
    relay round-trip (~2.2 s per 6.2 MB uint8 1080p frame on the axon
    relay), leaving the device idle — the e2e CLI measured 0.39 fps against
    a 19 fps window program. Downloads (``to_out``: device-side
    resize+quantize, then the host copy) are independent per frame, so a
    small thread pool overlaps the round-trips; the writer thread restores
    emission order by sequence number before piping into ffmpeg. A
    semaphore bounds total in-flight frames end-to-end, preserving
    backpressure on the compute loop.

    On a download/write failure the pool keeps draining (so ``emit`` never
    deadlocks) and the error re-raises on the main thread at the next
    ``emit``/``finish``. ``finish`` raises if the pipeline cannot drain
    (instead of silently truncating on a join timeout)."""

    def __init__(self, video_io, src_size, stats, depth: int = 12,
                 workers: int | None = None):
        import os as _os

        workers = workers or int(_os.environ.get("DRBA_EMIT_WORKERS", "4"))
        self._sem = threading.Semaphore(depth)
        self._q: queue.Queue = queue.Queue()
        self._results: dict[int, Optional[object]] = {}
        self._cond = threading.Condition()
        self._video_io = video_io
        self._src_size = src_size
        self._stats = stats
        self._exc: Optional[BaseException] = None
        self._seq = 0
        self._eof_seq: Optional[int] = None
        self._workers = [
            threading.Thread(target=self._dl_loop, daemon=True)
            for _ in range(max(1, workers))
        ]
        for t in self._workers:
            t.start()
        self._writer = threading.Thread(target=self._write_loop, daemon=True)
        self._writer.start()

    def _dl_loop(self):
        while True:
            item = self._q.get()
            if item is None:
                return
            seq, x = item
            arr = None
            if self._exc is None:
                try:
                    arr = to_out(x, self._src_size)
                except BaseException as e:
                    self._exc = self._exc or e
            with self._cond:
                self._results[seq] = arr
                self._cond.notify_all()

    def _write_loop(self):
        nxt = 0
        while True:
            with self._cond:
                while nxt not in self._results:
                    if self._eof_seq is not None and nxt >= self._eof_seq:
                        return
                    self._cond.wait(timeout=1.0)
                arr = self._results.pop(nxt)
            nxt += 1
            self._sem.release()
            if arr is not None and self._exc is None:
                try:
                    self._video_io.write_frame(arr)
                    self._stats.frames_out += 1
                except BaseException as e:
                    self._exc = self._exc or e

    def _check(self):
        if self._exc is not None:
            raise RuntimeError("frame download/encode thread failed") from self._exc

    def emit(self, x):
        self._check()
        self._sem.acquire()
        self._q.put((self._seq, x))
        self._seq += 1

    def finish(self):
        for _ in self._workers:
            self._q.put(None)
        for t in self._workers:
            t.join(timeout=900)
        with self._cond:
            self._eof_seq = self._seq
            self._cond.notify_all()
        self._writer.join(timeout=900)
        if any(t.is_alive() for t in self._workers) or self._writer.is_alive():
            raise RuntimeError(
                "emitter could not drain (download/encode stalled); "
                f"{self._stats.frames_out}/{self._seq} frames written")
        self._check()


class _SceneLookahead:
    """Chunk-resolved scene detection for the serial path.

    The reference resolves one SSIM boolean per window (infer.py:118-120) —
    on a relayed runtime that is a host round-trip with the device idle.
    Here frames are pulled opportunistically ahead of the window loop (the
    prefetch thread already decodes ahead), each consecutive pair's 32x32
    SSIM is enqueued on device at pull time, and all pending scores resolve
    in ONE stacked transfer when the next flag is needed — amortizing the
    sync over up to ``depth`` windows (mirrors parallel/pipeline.py's
    deferred batched resolve)."""

    def __init__(self, prefetch: _Prefetcher, prev_frame, enabled: bool,
                 threshold: float, depth: int = 8):
        self._prefetch = prefetch
        self._prev = prev_frame
        self._enabled = enabled
        self._th = threshold
        self._depth = depth
        self._frames: collections.deque = collections.deque()
        self._scores: collections.deque = collections.deque()  # device scalars
        self._flags: collections.deque = collections.deque()   # resolved bools
        self._eof = False

    def _pull(self, block: bool) -> bool:
        item = self._prefetch.next() if block else self._prefetch.next_nowait()
        if item is _EMPTY:
            return False
        if item is None:
            self._eof = True
            return False
        if self._enabled:
            self._scores.append(scene_ssim(self._prev, item))
        self._frames.append(item)
        self._prev = item
        return True

    def next(self, stage=lambda name: contextlib.nullcontext()):
        """Next ``(frame, right_scene)`` or None at end of stream."""
        if not self._frames:
            with stage("prefetch-wait"):
                if self._eof or not self._pull(block=True):
                    return None
        while (len(self._frames) < self._depth and not self._eof
               and self._pull(block=False)):
            pass
        if self._enabled and not self._flags:
            import jax.numpy as jnp

            with stage("scdet"):
                vals = np.asarray(jnp.stack(list(self._scores)))
            self._flags.extend(bool(v) for v in vals < self._th)
            self._scores.clear()
        frame = self._frames.popleft()
        flag = self._flags.popleft() if self._enabled else False
        return frame, flag


def calc_ts(idx: float, t_mapper: TMapper, times: int) -> np.ndarray:
    """Window timesteps in [0.5, 1.5) centered on I1.

    SPEC-MANDATED ARITHMETIC (infer.py:76-91): values must be bit-identical
    to the reference's or window programs retrace and outputs drift off the
    destination grid. times-mode builds the symmetric grid around t=1
    directly: N points spaced 1/N, mirrored about the center — an odd N
    keeps the center sample, an even N straddles it. fps mode maps the
    [idx-0.5, idx+0.5) half-open window through TMapper and recenters on 1.
    """
    if times != -1:
        if times % 2:
            k = np.arange(1, (times - 1) // 2 + 1, dtype=np.float64) / times
            return np.concatenate([(1 - k)[::-1], [1.0], 1 + k])
        k = (np.arange(times // 2, dtype=np.float64) + 0.5) / times
        return np.concatenate([(1 - k)[::-1], 1 + k])

    timestamps = np.array(
        t_mapper.get_range_timestamps(idx - 0.5, idx + 0.5, lclose=True, rclose=False, normalize=False)
    )
    return np.round(timestamps - idx, 4) + 1


@dataclass
class PipelineStats:
    frames_in: int = 0
    frames_out: int = 0
    windows: int = 0
    scene_cuts: int = 0
    stage_report: Optional[str] = None
    wall_s: float = 0.0  # run_pipeline wall time (decode->compute->encode)


def run_pipeline(
    model,
    video_io: VideoFI_IO,
    enable_scdet: bool = False,
    scdet_threshold: float = 0.3,
    progress: Optional[Callable[[int], None]] = None,
    max_frames: Optional[int] = None,
    times: int = -1,
    profile: bool = False,
    skip_outputs: int = 0,
) -> PipelineStats:
    """Run the frame loop; with ``profile`` a per-stage wall-clock report is
    attached to the returned stats (device dispatch is async, so 'window'
    measures dispatch + any internal syncs and 'emit-wait' measures
    backpressure from the download/encode thread).

    ``skip_outputs`` resumes a previous run: the first N output frames are
    assumed already written (SegmentedVideoIO.completed_frames); windows
    whose outputs are fully covered fast-forward decode-only (no device
    compute), the boundary window recomputes and emits only its tail.
    """
    stats = PipelineStats()
    _t_start = time.perf_counter()
    st = StageTimes() if profile else None
    plan_pos = 0  # output frames planned so far (skipped + emitted)
    src_fps, dst_fps = video_io.src_fps, video_io.dst_fps
    if dst_fps <= src_fps:
        raise ValueError(f"dst fps must exceed src fps ({dst_fps} <= {src_fps})")

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
    emit = emitter.emit

    def stage(name):
        return st.stage(name) if st is not None else contextlib.nullcontext()

    def emit_block(n_out: int, build):
        """Plan ``n_out`` outputs; build+emit only the part past the resume
        point (build runs lazily — fully skipped blocks never touch the
        device)."""
        nonlocal plan_pos
        start = plan_pos
        plan_pos += n_out
        if plan_pos <= skip_outputs:
            return
        with stage("window"):
            output = build()
        assert len(output) == n_out, (len(output), n_out)
        with stage("emit-wait"):
            for x in output[max(0, skip_outputs - start):]:
                emit(x)

    # ---- head (infer.py:93-110) ------------------------------------------
    ts = calc_ts(idx, t_mapper, times)
    left_scene = (bool(scene_ssim(I0, I1) < scdet_threshold)
                  if enable_scdet else False)
    right_scene = left_scene
    reuse = None

    if right_scene:
        stats.scene_cuts += 1

    def head_block(I0=I0, I1=I1, ts=ts, cut=right_scene):
        if cut:
            return [I0 for _ in ts]
        left_ts = ts[ts < 1]
        right_ts = ts[ts >= 1] - 1
        return [I0 for _ in left_ts] + list(model.inference_ts(I0, I1, right_ts))

    emit_block(len(ts), head_block)
    if progress:
        progress(1)

    # ---- body (infer.py:112-156) -----------------------------------------
    scenes = _SceneLookahead(prefetch, I1, enable_scdet, scdet_threshold)
    while True:
        if max_frames is not None and stats.frames_in >= max_frames:
            break
        nxt = scenes.next(stage)
        if nxt is None:
            break
        I2, right_scene = nxt
        stats.frames_in += 1

        ts = calc_ts(idx, t_mapper, times)
        if right_scene:
            stats.scene_cuts += 1

        def window_block(I0=I0, I1=I1, I2=I2, ts=ts,
                         ls=left_scene, rs=right_scene):
            nonlocal reuse
            if ls and rs:
                # cuts on both sides: repeat I1 (infer.py:122-124)
                reuse = None
                return [I1 for _ in ts]
            if ls:
                # cut in I0~I1: plain interpolation on the right (infer.py:126-132).
                # The flow pass computed here IS next window's chain carry
                # (reuse(I1',I0') = swapped reuse(I1,I2)) — hand it forward
                # instead of discarding it (the reference recomputes; a
                # cut-heavy stream would pay a full GMFlow per cut twice).
                left_ts = ts[ts < 1]
                right_ts = ts[ts >= 1] - 1
                frames, fwd = model.inference_ts(I1, I2, right_ts,
                                                 return_reuse=True)
                reuse = fwd.swapped() if hasattr(fwd, "swapped") else None
                return [I1 for _ in left_ts] + list(frames)
            if rs:
                # cut in I1~I2: plain interpolation on the left (infer.py:134-140),
                # feeding the chain's existing I1<->I0 pass back in (swapped
                # to I0->I1) so no new GMFlow runs for this window.
                left_ts = ts[ts <= 1]
                right_ts = ts[ts > 1] - 1
                prev = reuse.swapped() if hasattr(reuse, "swapped") else None
                reuse = None
                return list(model.inference_ts(I0, I1, left_ts, reuse=prev)) \
                    + [I1 for _ in right_ts]
            output, reuse = model.inference_ts_drba(I0, I1, I2, ts, reuse, linear=True)
            return output

        emit_block(len(ts), window_block)

        I0, I1 = I1, I2
        left_scene = right_scene
        idx += 1
        stats.windows += 1
        if progress:
            progress(1)

    # ---- tail (infer.py:158-169) -----------------------------------------
    ts = calc_ts(idx, t_mapper, times)

    def tail_block(I0=I0, I1=I1, ts=ts):
        left_ts = ts[ts <= 1]
        right_ts = ts[ts > 1] - 1
        # the last window's chain carry is reuse(I1, I0) here — swap it in
        prev = reuse.swapped() if hasattr(reuse, "swapped") else None
        return list(model.inference_ts(I0, I1, left_ts, reuse=prev)) \
            + [I1 for _ in right_ts]

    emit_block(len(ts), tail_block)
    if progress:
        progress(1)

    with stage("finish"):
        emitter.finish()
        video_io.finish_writing()
    stats.wall_s = time.perf_counter() - _t_start
    if st is not None:
        stats.stage_report = st.report()
    return stats

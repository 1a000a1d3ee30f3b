"""Headline benchmark: 1080p 24->60 fps DRBA interpolation throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "breakdown"}.

Default run measures the flagship RIFE path (the driver's contract).
``python bench.py --config {rife,gmfss,gmfss_union,uhd,all}`` measures the
BASELINE.md evaluation configs and saves them to bench_breakdown.json; the
default run attaches that file's numbers to the headline JSON so every
measured config is visible in one line.

``vs_baseline``: the reference repo publishes no numbers (BASELINE.md), so
the ratio is against real-time 1080p output delivery — the 36 synthesized
frames/sec a 24->60 conversion must sustain to run at playback speed
(vs_baseline = value / 36; >= 1.0 means faster than real time per chip).

NOTE: on this platform block_until_ready returns before device completion
(relayed execution); a scalar-reduction transfer is the only reliable sync.
"""

import argparse
import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np

BREAKDOWN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_breakdown.json")


def _now_iso():
    return time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())


def _age_hours(measured_at):
    """Hours since an ISO-8601 UTC stamp; None if absent/unparseable."""
    if not measured_at:
        return None
    try:
        t = time.mktime(time.strptime(measured_at, "%Y-%m-%dT%H:%M:%SZ"))
    except ValueError:
        return None
    return (time.mktime(time.gmtime()) - t) / 3600.0


def _sync():
    import jax
    import jax.numpy as jnp

    return jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))


def _frames(h, w, n=4, dtype=None, shift=8):
    import jax.numpy as jnp
    from drba_tpu.config import DEFAULT

    dtype = dtype or DEFAULT.compute_dtype
    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
    return [jnp.asarray(np.roll(base, shift * i, axis=2), dtype) for i in range(n)]


def _run_drba_windows(model, frames, n_windows, sync):
    """Steady-state reuse-chained window loop, 24->60 ts pattern."""
    ts_a = np.array([0.5, 0.9, 1.3])
    ts_b = np.array([0.7, 1.1])
    reuse = None
    total = 0
    out = None
    for k in range(n_windows):
        I0, I1, I2 = frames[k % 2], frames[k % 2 + 1], frames[k % 2 + 2]
        ts = ts_a if k % 2 == 0 else ts_b
        out, reuse = model.inference_ts_drba(I0, I1, I2, ts, reuse, linear=True)
        total += len(out)
    float(sync(out[-1]))
    return total


def bench_rife(h=1088, w=1920, scale=1.0, n_windows=24):
    from drba_tpu.config import DEFAULT
    from drba_tpu.models.rife import RIFE

    model = RIFE(weights=None, scale=scale, config=DEFAULT)
    frames = _frames(h, w)
    sync = _sync()
    _run_drba_windows(model, frames, 2, sync)  # compile both ts shapes
    t0 = time.perf_counter()
    total = _run_drba_windows(model, frames, n_windows, sync)
    return total / (time.perf_counter() - t0)


def _pan_flow(b, h, w, dx, dy, jitter, seed, dtype):
    """Near-rigid pan flow (mirrors tests/test_splat_deviation.py:_pan_flow)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    f = np.broadcast_to(np.asarray([dx, dy], np.float32), (b, h, w, 2)).copy()
    f += rng.uniform(-jitter, jitter, f.shape).astype(np.float32)
    return jnp.asarray(f, dtype)


def bench_motion(model_name, mag, h=1088, w=1920, n_windows=16):
    """Window program throughput with INJECTED pan flows of |mag| px/frame.

    The headline configs synthesize frames with an 8 px pan, but with random
    weights the model's own flow does not track the input pan — and the
    stencil splat's cost is proportional to the motion actually present in
    the flow (ops/splat_stencil.py). Flows are explicit inputs of the window
    program, so this injects rigid pans (+ jitter) at a controlled magnitude
    into BOTH window sides and times the same program the public path runs.
    Measured at 8 vs 40 px identically, the delta prices the
    motion-adaptive kernels honestly (VERDICT r2 item 3).
    """
    import jax.numpy as jnp
    from drba_tpu.config import DEFAULT

    frames = _frames(h, w)
    sync = _sync()
    ts_a = jnp.asarray([0.5, 0.9, 1.3], jnp.float32)
    ts_b = jnp.asarray([0.7, 1.1], jnp.float32)
    dt = DEFAULT.compute_dtype

    if model_name == "rife":
        from drba_tpu.models.rife import RIFE, _drba_window
        from drba_tpu.models.ifnet import ifnet_encode

        model = RIFE(weights=None, scale=1.0, config=DEFAULT)
        flow10 = _pan_flow(1, h, w, mag, mag * 0.3, 1.5, 0, dt)
        flow12 = _pan_flow(1, h, w, -mag, -mag * 0.3, 1.5, 1, dt)
        feats = [ifnet_encode(model.params, f) for f in frames[:3]]

        def run(n):
            out = None
            for k in range(n):
                out = _drba_window(
                    model.params, frames[k % 2], frames[k % 2 + 1],
                    frames[k % 2 + 2], ts_a if k % 2 == 0 else ts_b,
                    flow10, flow12, feats[0], feats[1], feats[2 - k % 2],
                    model.scale_list, True, "auto", "auto",
                    DEFAULT.drm_splat_scale, DEFAULT.conv_backend)
            float(sync(out[-1]))
            return n * 5 // 2
    else:
        if model_name == "gmfss_union":
            from drba_tpu.models.gmfss_union import GMFSS_UNION as CLS
            from drba_tpu.models.gmfss_union import _drba_window
        else:
            from drba_tpu.models.gmfss import GMFSS as CLS
            from drba_tpu.models.gmfss import _drba_window

        model = CLS(weights=None, scale=1.0, config=DEFAULT)
        # reuse flows live at half resolution: mag/2 there = mag px full-res
        r10 = model.reuse(frames[1], frames[0])._replace(
            flow01=_pan_flow(1, h // 2, w // 2, mag / 2, mag * 0.15, 1.5, 0, dt),
            flow10=_pan_flow(1, h // 2, w // 2, -mag / 2, -mag * 0.15, 1.5, 1, dt),
        )
        r12 = model.reuse(frames[1], frames[2])._replace(
            flow01=_pan_flow(1, h // 2, w // 2, -mag / 2, -mag * 0.15, 1.5, 2, dt),
            flow10=_pan_flow(1, h // 2, w // 2, mag / 2, mag * 0.15, 1.5, 3, dt),
        )

        def run(n):
            out = None
            for k in range(n):
                window = (frames[k % 2], frames[k % 2 + 1], frames[k % 2 + 2],
                          ts_a if k % 2 == 0 else ts_b, r10, r12)
                if model_name == "gmfss_union":
                    out = _drba_window(
                        model.params, model.rife_params, *window,
                        model.scale_list, True, DEFAULT.splat_backend,
                        DEFAULT.warp_backend, DEFAULT.drm_splat_scale,
                        DEFAULT.conv_backend)
                else:
                    out = _drba_window(
                        model.params, *window, True, DEFAULT.splat_backend,
                        DEFAULT.drm_splat_scale, DEFAULT.conv_backend)
            float(sync(out[-1]))
            return n * 5 // 2

    run(2)  # compile both ts shapes
    t0 = time.perf_counter()
    total = run(n_windows)
    return total / (time.perf_counter() - t0)


def gate_composed(h=1088, w=1920):
    """Composed fast-path quality gate at production resolution (VERDICT r2
    item 4): ONE 1080p rife window on the TPU, default config (stencil splat
    + half-res DRM + MXU warp + Pallas conv chains) vs the exact config
    (scatter + full-res DRM + gather + XLA convs), SSIM per synthesized
    frame at injected pans of 8/20/40 px. BASELINE.md gates SSIM >= 0.995.
    """
    import jax.numpy as jnp
    from drba_tpu.config import DEFAULT
    from drba_tpu.models.rife import RIFE, _drba_window
    from drba_tpu.models.ifnet import ifnet_encode
    from drba_tpu.ops.ssim import ssim

    model = RIFE(weights=None, scale=1.0, config=DEFAULT)
    frames = _frames(h, w)
    dt = DEFAULT.compute_dtype
    feats = [ifnet_encode(model.params, f) for f in frames[:3]]
    ts = jnp.asarray([0.5, 0.9, 1.3], jnp.float32)
    out = {}
    for mag in (8.0, 20.0, 40.0):
        flow10 = _pan_flow(1, h, w, mag, mag * 0.3, 1.5, 0, dt)
        flow12 = _pan_flow(1, h, w, -mag, -mag * 0.3, 1.5, 1, dt)
        args = (model.params, frames[0], frames[1], frames[2], ts,
                flow10, flow12, feats[0], feats[1], feats[2],
                model.scale_list, True)
        fast = _drba_window(*args, DEFAULT.splat_backend,
                            DEFAULT.warp_backend, DEFAULT.drm_splat_scale,
                            DEFAULT.conv_backend)
        exact = _drba_window(*args, "scatter", "gather", 1.0, "xla")
        s = min(
            float(ssim(fast[t].astype(jnp.float32),
                       exact[t].astype(jnp.float32)))
            for t in range(3)
        )
        out[f"pan{int(mag)}"] = round(s, 5)
    return out


def _make_clip(path, h, w, n_frames, fps=24, shift=6):
    """Synthesize a pan clip (rolled noise base, like _frames) with cv2."""
    import cv2

    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (h, w, 3), np.uint8)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h))
    if not vw.isOpened():
        raise RuntimeError(f"cv2.VideoWriter failed for {path}")
    for i in range(n_frames):
        vw.write(np.roll(base, shift * i, axis=1))
    vw.release()


def bench_e2e(model_name="rife", h=1080, w=1920, n_frames=96,
              dst_fps=60, scdet=True):
    """BASELINE config 5's real unit of work (VERDICT r4 item 5): the actual
    CLI over a generated 1080p clip — threaded decode, scene detection,
    window compute, pipelined ffmpeg encode + mux — run as a fresh
    subprocess (matching the reference's process shape, infer.py:58-174).
    A warm run over a short clip populates .jax_cache first so the measured
    run prices steady-state delivery, not compilation. fps counts OUTPUT
    frames against run_pipeline's own wall clock (decode->encode inclusive,
    model/backend init excluded); the --profile stage breakdown rides along.
    """
    import re
    import subprocess
    import sys
    import tempfile

    tmp = tempfile.mkdtemp(prefix="drba_e2e_")
    clip_warm = os.path.join(tmp, "warm.mp4")
    clip = os.path.join(tmp, "in.mp4")
    _make_clip(clip_warm, h, w, 8)
    _make_clip(clip, h, w, n_frames)

    def cli(inp, outp):
        cmd = [sys.executable, "-m", "drba_tpu.cli", "-m", model_name,
               "-i", inp, "-o", outp, "-fps", str(dst_fps), "--profile"]
        if scdet:
            cmd += ["-s"]
        return subprocess.run(
            cmd, capture_output=True, text=True, timeout=3600,
            cwd=os.path.dirname(os.path.abspath(__file__)))

    r = cli(clip_warm, os.path.join(tmp, "warm_out.mp4"))
    if r.returncode != 0:
        raise RuntimeError(f"warm CLI run failed:\n{r.stdout[-800:]}\n{r.stderr[-800:]}")
    r = cli(clip, os.path.join(tmp, "out.mp4"))
    if r.returncode != 0:
        raise RuntimeError(f"CLI run failed:\n{r.stdout[-800:]}\n{r.stderr[-800:]}")
    m = re.search(r"done: (\d+) frames in, (\d+) frames out, (\d+) windows,"
                  r" (\d+) scene cuts, ([0-9.]+)s", r.stdout)
    if not m:
        raise RuntimeError(f"no done-line in CLI output:\n{r.stdout[-800:]}")
    frames_out, wall = int(m.group(2)), float(m.group(5))
    stages = {}
    for name, tot in re.findall(r"^\s+(\S+)\s+([0-9.]+)s total", r.stdout,
                                re.MULTILINE):
        stages[name] = float(tot)
    return {"fps": round(frames_out / wall, 3), "frames_out": frames_out,
            "wall_s": wall, "stages_s": stages}


def bench_gmfss(cls_name="gmfss", h=1088, w=1920, scale=1.0, n_windows=12):
    from drba_tpu.config import DEFAULT

    if cls_name == "gmfss":
        from drba_tpu.models.gmfss import GMFSS as CLS
    else:
        from drba_tpu.models.gmfss_union import GMFSS_UNION as CLS
    model = CLS(weights=None, scale=scale, config=DEFAULT)
    frames = _frames(h, w)
    sync = _sync()
    _run_drba_windows(model, frames, 2, sync)
    t0 = time.perf_counter()
    total = _run_drba_windows(model, frames, n_windows, sync)
    return total / (time.perf_counter() - t0)


CONFIGS = {
    # BASELINE.md evaluation configs (2)-(5); (1) is the CPU-runnable test
    "rife": ("rife 1080p 24->60", lambda: bench_rife()),
    "gmfss": ("gmfss 1080p 24->60", lambda: bench_gmfss("gmfss")),
    "gmfss_union": ("gmfss_union 1080p 24->60", lambda: bench_gmfss("gmfss_union")),
    "uhd": ("rife 4K -scale 0.5 24->60",
            lambda: bench_rife(h=2176, w=3840, scale=0.5, n_windows=8)),
    # window-only programs with INJECTED pan flows (see bench_motion):
    # the pan-8 rows are the like-for-like baseline for the pan-40 rows
    "rife_pan8": ("rife window, injected 8px pan",
                  lambda: bench_motion("rife", 8.0)),
    "rife_pan40": ("rife window, injected 40px pan (high motion)",
                   lambda: bench_motion("rife", 40.0)),
    "gmfss_pan8": ("gmfss window, injected 8px pan",
                   lambda: bench_motion("gmfss", 8.0)),
    "gmfss_pan40": ("gmfss window, injected 40px pan (high motion)",
                    lambda: bench_motion("gmfss", 40.0)),
    "union_pan8": ("gmfss_union window, injected 8px pan",
                   lambda: bench_motion("gmfss_union", 8.0)),
    "union_pan40": ("gmfss_union window, injected 40px pan (high motion)",
                    lambda: bench_motion("gmfss_union", 40.0)),
    "gate": ("composed fast path vs exact, min frame SSIM (>= 0.995 gate)",
             gate_composed),
    # the REAL pipeline: CLI subprocess over a generated 1080p clip
    # (decode + scdet + compute + pipelined encode), BASELINE config 5
    "e2e": ("rife 1080p 24->60 FULL CLI pipeline (decode+scdet+encode)",
            lambda: bench_e2e("rife")),
    "e2e_gmfss": ("gmfss 1080p 24->60 FULL CLI pipeline",
                  lambda: bench_e2e("gmfss")),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None,
                    choices=list(CONFIGS) + ["all"],
                    help="measure one evaluation config (or 'all') and save "
                         "to bench_breakdown.json")
    ap.add_argument("--no-save", action="store_true", default=False,
                    help="don't write bench_breakdown.json (for env-variant "
                         "measurements that are not the default path)")
    args = ap.parse_args()

    if args.config:
        # 'all' excludes the e2e configs: they spawn CLI subprocesses that
        # need the TPU while the parent would still hold a live client —
        # run them as their own processes (scripts/tpu_battery_r5.sh)
        names = ([n for n in CONFIGS if not n.startswith("e2e")]
                 if args.config == "all" else [args.config])
        breakdown = {}
        if os.path.exists(BREAKDOWN_PATH):
            breakdown = json.load(open(BREAKDOWN_PATH))
        failed = []
        for name in names:
            label, fn = CONFIGS[name]
            entry = {"label": label, "measured_at": _now_iso()}
            try:
                val = fn()
            except Exception as e:  # keep sweeping: one config must not
                # lose the rest (round 3: one compile OOM killed the sweep)
                import traceback

                traceback.print_exc()
                entry["error"] = f"{type(e).__name__}: {e}"[:300]
                print(f"{label}: FAILED ({type(e).__name__})")
                failed.append(name)
            else:
                if isinstance(val, dict) and "fps" in val:
                    entry.update(val)
                    print(f"{label}: {val['fps']:.3f} output frames/sec "
                          f"(wall {val.get('wall_s')}s)")
                elif isinstance(val, dict):
                    entry["ssim"] = val
                    print(f"{label}: {val}")
                else:
                    entry["fps"] = round(val, 3)
                    print(f"{label}: {val:.3f} interp frames/sec")
            breakdown[name] = entry
            # save after EVERY config so a crash mid-battery keeps the
            # finished entries
            if not args.no_save:
                json.dump(breakdown, open(BREAKDOWN_PATH, "w"), indent=1)
        if failed:
            raise SystemExit(f"configs failed: {failed}")
        return

    try:
        fps = bench_rife()
        note = None
    except Exception as e:  # pragma: no cover - TPU-side compile failures
        # Safety net: if a Pallas kernel fails Mosaic compilation on this
        # stack, fall back to the pure-XLA backends so the round still
        # reports an honest (slower) number instead of crashing.
        import traceback

        traceback.print_exc()
        import dataclasses

        import drba_tpu.config as _cfg

        _cfg.DEFAULT = dataclasses.replace(
            _cfg.DEFAULT, splat_backend="shift", warp_backend="gather",
            conv_backend="xla",
        )
        os.environ["DRBA_DISABLE_FUSED_ATTN"] = "1"
        os.environ["DRBA_DISABLE_FUSED_LAYER"] = "1"
        fps = bench_rife()
        note = f"safe-fallback backends (default path failed: {type(e).__name__})"
    result = {
        "metric": "1080p 24->60 DRBA interpolated frames/sec/chip (rife path)",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 36.0, 3),
        # keep both anchors visible (VERDICT r4): the divisor above is the
        # 36 fps real-time-delivery proxy (reference publishes no numbers,
        # BASELINE.md); the driver's written bar is >= 2x H100 end-to-end,
        # for which no measured H100 figure exists in the reference tree —
        # do NOT read vs_baseline as a fraction of that bar.
        "baseline_anchor": "36 fps = real-time 1080p 24->60 delivery proxy; "
                           "driver bar >= 2x H100 e2e (unmeasured upstream)",
        "measured_at": _now_iso(),
    }
    if note:
        result["note"] = note
    # Attach the config breakdown, but never stale numbers: the headline's
    # own rife measurement overwrites the rife entry, and entries measured
    # more than 12 h ago are dropped by name (round 3 shipped a 13.7 rife
    # breakdown next to a 9.29 headline — contradictory numbers in one line
    # that masked a 32% regression; VERDICT r3).
    if os.path.exists(BREAKDOWN_PATH):
        breakdown = json.load(open(BREAKDOWN_PATH))
        if not note:
            breakdown["rife"] = {"label": CONFIGS["rife"][0],
                                 "fps": round(fps, 3),
                                 "measured_at": result["measured_at"]}
            json.dump(breakdown, open(BREAKDOWN_PATH, "w"), indent=1)
        fresh, stale = {}, []
        for name, entry in breakdown.items():
            age = _age_hours(entry.get("measured_at"))
            if age is None or age > 12.0:
                stale.append(name)
            else:
                fresh[name] = entry
        result["breakdown"] = fresh
        if stale:
            result["stale_omitted"] = stale
    print(json.dumps(result))


if __name__ == "__main__":
    main()

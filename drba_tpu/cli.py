"""CLI driver — flag-compatible with the reference (infer.py:18-36).

Usage:
  python -m drba_tpu.cli -m {rife,gmfss,gmfss_union} -i in.mp4 -o out.mp4 \\
      -fps 60 [-t N] [-s] [-st 0.3] [-hw] [-scale 1.0]
"""

from __future__ import annotations

import argparse
import os

from tqdm import tqdm

# The axon sitecustomize pins JAX_PLATFORMS=axon at interpreter startup, so
# the env var alone can't retarget a CLI subprocess; honor an explicit
# platform override through the config API before backend init (used by
# bench.py's e2e smoke path and CPU debugging).
if os.environ.get("DRBA_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["DRBA_PLATFORM"])

import jax.numpy as jnp

from drba_tpu.config import Config
from drba_tpu.utils.log import get_logger
from drba_tpu.pipeline import run_pipeline
from drba_tpu.utils.video_io import VideoFI_IO


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Interpolate a video with DRBA (TPU-native)")
    p.add_argument("-m", "--model_type", dest="model_type", type=str, default="rife",
                   help="model network type, one of rife/gmfss/gmfss_union")
    p.add_argument("-i", "--input", dest="input", type=str, default="input.mp4",
                   help="path of the input video")
    p.add_argument("-o", "--output", dest="output", type=str, default="output.mp4",
                   help="path of the output video")
    p.add_argument("-fps", "--dst_fps", dest="dst_fps", type=float, default=60,
                   help="interpolate to this fps")
    p.add_argument("-t", "--times", dest="times", type=int, default=-1,
                   help="interpolate to N x source fps")
    p.add_argument("-s", "--enable_scdet", dest="enable_scdet", action="store_true",
                   default=False, help="enable scene change detection")
    p.add_argument("-st", "--scdet_threshold", dest="scdet_threshold", type=float,
                   default=0.3, help="ssim scene detection threshold")
    p.add_argument("-hw", "--hwaccel", dest="hwaccel", action="store_true", default=False,
                   help="hardware-accelerated encode (passed through to ffmpeg when present)")
    p.add_argument("-scale", "--scale", dest="scale", type=float, default=1.0,
                   help="flow scale: 1.0 at 1080p, 0.5 at 4K")
    p.add_argument("--weights", dest="weights", type=str, default="weights",
                   help="weights root directory (train_log_* subdirs)")
    p.add_argument("--fp32", dest="fp32", action="store_true", default=False,
                   help="compute in float32 instead of bfloat16")
    p.add_argument("--devices", dest="devices", type=int, default=1,
                   help="shard the window batch across N chips (all models, "
                        "scdet supported; bit-identical to serial — the "
                        "reuse chain is preserved by an ICI neighbor "
                        "exchange, see drba_tpu/parallel/batch.py)")
    p.add_argument("--exact-drm", dest="exact_drm", action="store_true",
                   default=False,
                   help="compute DRM alignment splats at full resolution "
                        "(default: half resolution — exact for rigid motion, "
                        "smooths flow-estimation jitter; see "
                        "Config.drm_splat_scale)")
    p.add_argument("--splat-backend", dest="splat_backend", default="auto",
                   choices=["auto", "scatter", "sort", "shift", "stencil",
                            "shift_ov", "stencil_ov"],
                   help="forward-splat implementation (Config.splat_backend)."
                        " 'stencil_ov' adds the overflow cascade: extreme "
                        "motion beyond the stencil radius is conserved via "
                        "coarse-level splats instead of dropped — closes "
                        "the production-oracle gap at ~2x splat cost "
                        "(docs/ROADMAP.md round-5); 'scatter' is bit-exact "
                        "and slowest")
    p.add_argument("--profile", dest="profile", action="store_true", default=False,
                   help="print per-stage wall-clock timings at the end")
    p.add_argument("--seg-frames", dest="seg_frames", type=int, default=0,
                   help="write output in crash-safe segments of N frames "
                        "(stream-concatenated + audio-muxed at the end); "
                        "enables --resume")
    p.add_argument("--resume", dest="resume", action="store_true", default=False,
                   help="resume a crashed/interrupted segmented run: skips "
                        "windows whose outputs are in completed segments "
                        "(requires --seg-frames)")
    p.add_argument("--strict", dest="strict", action="store_true", default=False,
                   help="hard-fail when a weight file is absent or its keys "
                        "don't exactly match the network spec (default "
                        "mirrors the reference's lenient strict=False load)")
    return p.parse_args(argv)


log = get_logger("drba_tpu.cli")


def load_model(model_type: str, weights_root: str, scale: float, config: Config):
    """Model registry (reference: infer.py:39-55)."""
    def wdir(name):
        d = os.path.join(weights_root, name)
        return d if os.path.isdir(d) else None

    if model_type == "rife":
        from drba_tpu.models.rife import RIFE

        return RIFE(weights=wdir("train_log_rife_426_heavy"), scale=scale, config=config)
    if model_type == "gmfss":
        from drba_tpu.models.gmfss import GMFSS

        return GMFSS(weights=wdir("train_log_gmfss"), scale=scale, config=config)
    if model_type == "gmfss_union":
        from drba_tpu.models.gmfss_union import GMFSS_UNION

        return GMFSS_UNION(weights=wdir("train_log_gmfss_union"), scale=scale, config=config)
    raise ValueError(f"model_type must be one of rife/gmfss/gmfss_union, got {model_type}")


def main(argv=None):
    args = parse_args(argv)
    if not os.path.exists(args.input):
        raise FileNotFoundError(f"can't find the video file {args.input}")

    config = Config(
        compute_dtype=jnp.float32 if args.fp32 else jnp.bfloat16,
        flow_scale=args.scale,
        scdet_threshold=args.scdet_threshold,
        drm_splat_scale=1.0 if args.exact_drm else 0.5,
        splat_backend=args.splat_backend,
        strict_load=args.strict,
    )
    model = load_model(args.model_type, args.weights, args.scale, config)

    skip_outputs = 0
    if args.seg_frames > 0:
        from drba_tpu.utils.segmented_io import SegmentedVideoIO

        video_io = SegmentedVideoIO(
            args.input, args.output, dst_fps=args.dst_fps, times=args.times,
            hwaccel=args.hwaccel, seg_frames=args.seg_frames,
        )
        if args.resume:
            skip_outputs = video_io.completed_frames
            if skip_outputs:
                log.info("resuming after %d completed output frames", skip_outputs)
    elif args.resume:
        raise ValueError("--resume requires --seg-frames N (segmented output)")
    else:
        video_io = VideoFI_IO(
            args.input, args.output, dst_fps=args.dst_fps, times=args.times,
            hwaccel=args.hwaccel,
        )
    pbar = tqdm(total=video_io.total_frames_count)
    if args.devices > 1 and skip_outputs:
        log.info("--resume runs on the serial pipeline")
    if args.devices > 1 and not skip_outputs:
        from drba_tpu.parallel.pipeline import run_pipeline_parallel

        stats = run_pipeline_parallel(
            model, video_io, n_devices=args.devices,
            progress=pbar.update, times=args.times,
            enable_scdet=args.enable_scdet,
            scdet_threshold=args.scdet_threshold,
        )
    else:
        stats = run_pipeline(
            model,
            video_io,
            enable_scdet=args.enable_scdet,
            scdet_threshold=args.scdet_threshold,
            progress=pbar.update,
            times=args.times,
            profile=args.profile,
            skip_outputs=skip_outputs,
        )
    pbar.close()
    wall = f", {stats.wall_s:.2f}s" if getattr(stats, "wall_s", 0) else ""
    print(
        f"done: {stats.frames_in} frames in, {stats.frames_out} frames out, "
        f"{stats.windows} windows, {stats.scene_cuts} scene cuts{wall}"
    )
    if getattr(stats, "stage_report", None):
        print(stats.stage_report)
    return stats


if __name__ == "__main__":
    main()

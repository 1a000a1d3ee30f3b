#!/usr/bin/env python
"""Batch interpolation demo — the reference Colab notebook's workflow
(DRBA.ipynb: iterate a folder, times-mode interpolation per clip) as a script.

Usage:
  python scripts/demo.py --input_dir clips/ --output_dir out/ -m rife -t 2
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VIDEO_EXTS = {".mp4", ".mkv", ".mov", ".avi", ".webm"}


def main():
    ap = argparse.ArgumentParser(description="Batch DRBA interpolation over a folder")
    ap.add_argument("--input_dir", required=True)
    ap.add_argument("--output_dir", required=True)
    ap.add_argument("-m", "--model_type", default="rife")
    ap.add_argument("-t", "--times", type=int, default=2)
    ap.add_argument("-s", "--enable_scdet", action="store_true", default=False)
    ap.add_argument("-st", "--scdet_threshold", type=float, default=0.3)
    ap.add_argument("-scale", "--scale", type=float, default=1.0)
    ap.add_argument("--weights", default="weights")
    args = ap.parse_args()

    from drba_tpu.cli import main as cli_main

    os.makedirs(args.output_dir, exist_ok=True)
    clips = sorted(
        f for f in os.listdir(args.input_dir)
        if os.path.splitext(f)[1].lower() in VIDEO_EXTS
    )
    if not clips:
        print(f"no videos found in {args.input_dir}")
        return

    for i, name in enumerate(clips, 1):
        src = os.path.join(args.input_dir, name)
        dst = os.path.join(args.output_dir, f"{os.path.splitext(name)[0]}_{args.times}x.mp4")
        print(f"[{i}/{len(clips)}] {src} -> {dst}")
        cli_main([
            "-m", args.model_type, "-i", src, "-o", dst,
            "-t", str(args.times), "-scale", str(args.scale),
            "--weights", args.weights,
        ] + (["-s", "-st", str(args.scdet_threshold)] if args.enable_scdet else []))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Pre-convert reference torch ``.pkl`` checkpoints to ``.npz`` param caches.

Usage:
  python tools/convert_weights.py --weights weights/
Scans the three ``train_log_*`` directories (reference layout, infer.py:43-51)
and writes a ``.npz`` next to each convertible ``.pkl``. The runtime loads
``.npz`` caches preferentially (drba_tpu/convert.py:load_network), removing
the torch dependency from the serving path.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from drba_tpu.convert import load_torch_pickle, save_npz


def specs_for(dirname: str) -> dict:
    from drba_tpu.models.gmflow_net import GMFLOW_SPEC
    from drba_tpu.models.gmfss_nets import (
        FEATURENET_SPEC,
        GRIDNET_SPEC,
        GRIDNET_UNION_SPEC,
        METRICNET_SPEC,
    )
    from drba_tpu.models.ifnet import IFNET_SPEC

    if dirname.endswith("rife_426_heavy"):
        return {"flownet.pkl": IFNET_SPEC}
    if dirname.endswith("gmfss_union"):
        return {
            "flownet.pkl": GMFLOW_SPEC,
            "metric.pkl": METRICNET_SPEC,
            "feat.pkl": FEATURENET_SPEC,
            "fusionnet.pkl": GRIDNET_UNION_SPEC,
            "rife.pkl": IFNET_SPEC,
        }
    if dirname.endswith("gmfss"):
        return {
            "flownet.pkl": GMFLOW_SPEC,
            "metric.pkl": METRICNET_SPEC,
            "feat.pkl": FEATURENET_SPEC,
            "fusionnet.pkl": GRIDNET_SPEC,
        }
    return {}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default="weights", help="weights root directory")
    ap.add_argument("--force", action="store_true", help="overwrite existing .npz")
    args = ap.parse_args()

    converted = 0
    for sub in sorted(os.listdir(args.weights)):
        d = os.path.join(args.weights, sub)
        if not os.path.isdir(d):
            continue
        for pkl, spec in specs_for(sub).items():
            src = os.path.join(d, pkl)
            dst = src.replace(".pkl", ".npz")
            if not os.path.exists(src):
                print(f"skip (missing): {src}")
                continue
            if os.path.exists(dst) and not args.force:
                print(f"skip (cached):  {dst}")
                continue
            params = load_torch_pickle(src, spec)
            save_npz(dst, params)
            print(f"converted:      {src} -> {dst} ({len(params)} tensors)")
            converted += 1
    print(f"done, {converted} checkpoints converted")


if __name__ == "__main__":
    main()

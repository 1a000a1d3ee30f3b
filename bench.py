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


def bench_gmfss(cls_name="gmfss", h=1088, w=1920, scale=1.0, n_windows=6):
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
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None,
                    choices=list(CONFIGS) + ["all"],
                    help="measure one evaluation config (or 'all') and save "
                         "to bench_breakdown.json")
    args = ap.parse_args()

    if args.config:
        names = list(CONFIGS) if args.config == "all" else [args.config]
        breakdown = {}
        if os.path.exists(BREAKDOWN_PATH):
            breakdown = json.load(open(BREAKDOWN_PATH))
        for name in names:
            label, fn = CONFIGS[name]
            fps = fn()
            breakdown[name] = {"label": label, "fps": round(fps, 3)}
            print(f"{label}: {fps:.3f} interp frames/sec")
        json.dump(breakdown, open(BREAKDOWN_PATH, "w"), indent=1)
        return

    fps = bench_rife()
    result = {
        "metric": "1080p 24->60 DRBA interpolated frames/sec/chip (rife path)",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 36.0, 3),
    }
    if os.path.exists(BREAKDOWN_PATH):
        result["breakdown"] = json.load(open(BREAKDOWN_PATH))
    print(json.dumps(result))


if __name__ == "__main__":
    main()

"""Headline benchmark: 1080p 24->60 fps DRBA interpolation throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the steady-state hot loop of the flagship RIFE DRBA path on the
available accelerator: per sliding window, one reuse-chained coarse-flow
computation plus a single batched XLA program synthesizing all interpolated
frames of the window (2.5 avg for 24->60).

``vs_baseline``: the reference repo publishes no numbers (BASELINE.md), so
the ratio is against real-time 1080p output delivery — the 36 synthesized
frames/sec a 24->60 conversion must sustain to run at playback speed
(vs_baseline = value / 36; >= 1.0 means faster than real time per chip).
"""

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from drba_tpu.config import DEFAULT
    from drba_tpu.models.rife import RIFE

    h, w = 1088, 1920  # 1080p padded to pad_size=64
    dtype = DEFAULT.compute_dtype
    model = RIFE(weights=None, scale=1.0, config=DEFAULT)

    rng = np.random.default_rng(0)
    base = rng.uniform(0, 1, (1, h, w, 3)).astype(np.float32)
    frames = [
        jnp.asarray(np.roll(base, 8 * i, axis=2), dtype) for i in range(4)
    ]

    # 24->60: windows alternate 2/3 timesteps; steady state averages 2.5
    ts_a = np.array([0.5, 0.9, 1.3])
    ts_b = np.array([0.7, 1.1])

    # NOTE: on this platform block_until_ready returns before device
    # completion (relayed execution); a scalar-reduction transfer is the only
    # reliable sync point.
    sync = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))

    def run_windows(n):
        reuse = None
        total = 0
        for k in range(n):
            I0, I1, I2 = frames[k % 2], frames[k % 2 + 1], frames[k % 2 + 2]
            ts = ts_a if k % 2 == 0 else ts_b
            out, reuse = model.inference_ts_drba(I0, I1, I2, ts, reuse, linear=True)
            total += len(out)
        float(sync(out[-1]))
        return total

    run_windows(2)  # compile both ts shapes + both flow paths
    t0 = time.perf_counter()
    n_windows = 24
    total = run_windows(n_windows)
    dt = time.perf_counter() - t0

    fps = total / dt
    print(json.dumps({
        "metric": "1080p 24->60 DRBA interpolated frames/sec/chip (rife path)",
        "value": round(fps, 3),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 36.0, 3),
    }))


if __name__ == "__main__":
    main()

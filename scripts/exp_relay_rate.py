"""Host<->device transfer profile through the axon relay (round 5).

The e2e CLI bench measured 0.39 output fps with ~539 s of wall in the
emitter's per-frame downloads (~2.2 s per 6.2 MB uint8 1080p frame). This
isolates whether that cost is per-call LATENCY or BANDWIDTH, and whether
concurrent/batched downloads help — which picks the emitter design
(download pool vs window batching).

    python scripts/exp_relay_rate.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import concurrent.futures as cf

import jax
import jax.numpy as jnp
import numpy as np


def main():
    h, w = 1080, 1920
    mk = jax.jit(lambda s: (jnp.full((h, w, 3), s, jnp.float32) * 255)
                 .astype(jnp.uint8))
    frames = [mk(i / 16.0) for i in range(16)]
    _ = [np.asarray(f[:1, :8]) for f in frames]  # materialize on device

    t0 = time.perf_counter()
    np.asarray(frames[0])
    t1 = time.perf_counter() - t0
    print(f"single 6.2MB u8 frame download: {t1 * 1e3:.0f} ms "
          f"({6.2 / t1:.1f} MB/s)", flush=True)

    t0 = time.perf_counter()
    for f in frames[1:9]:
        np.asarray(f)
    seq = time.perf_counter() - t0
    print(f"8 sequential frames: {seq:.2f} s ({8 * 6.2 / seq:.1f} MB/s)",
          flush=True)

    for nthreads in (2, 4, 8):
        t0 = time.perf_counter()
        with cf.ThreadPoolExecutor(nthreads) as ex:
            list(ex.map(np.asarray, frames[8:16]))
        par = time.perf_counter() - t0
        print(f"8 frames, {nthreads} threads: {par:.2f} s "
              f"({8 * 6.2 / par:.1f} MB/s)", flush=True)

    batch = jax.jit(lambda fs: jnp.stack(fs))(frames[:8])
    np.asarray(batch[:1, :1, :8])
    t0 = time.perf_counter()
    np.asarray(batch)
    bt = time.perf_counter() - t0
    print(f"one batched (8,H,W,3) download: {bt:.2f} s "
          f"({8 * 6.2 / bt:.1f} MB/s)", flush=True)

    # upload direction (decode side), u8
    host = np.random.default_rng(0).integers(0, 255, (h, w, 3), np.uint8)
    put = jax.jit(lambda x: x + 1)
    _ = put(jnp.asarray(host))
    t0 = time.perf_counter()
    for _ in range(8):
        r = put(jnp.asarray(host))
    np.asarray(r[:1, :8])
    up = time.perf_counter() - t0
    print(f"8 sequential u8 uploads: {up:.2f} s ({8 * 6.2 / up:.1f} MB/s)",
          flush=True)


if __name__ == "__main__":
    main()

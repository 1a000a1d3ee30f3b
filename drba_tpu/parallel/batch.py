"""Multi-chip window-parallel execution plans.

Strategy (SURVEY.md §5 'distributed' checklist): the reference's reuse chain
serializes consecutive windows, so the parallel plan **recomputes flow per
window** (2x flow cost on the cheap coarse-flow stage) and runs W windows
fully independently — chip k owns window k. Frames per window are already
batched over the timestep axis, so each chip runs one fused XLA program per
window; the only cross-chip traffic is the host scatter of decoded frames
and the gather of finished frames, riding ICI.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from drba_tpu.models.rife import _calc_flow, _interp_one_t


@functools.partial(jax.jit, static_argnames=("scale_list", "linear", "splat_backend"))
def rife_windows_batched(params, I0, I1, I2, ts, scale_list, linear=True,
                         splat_backend="auto"):
    """Interpolate a batch of windows: I* are (B, 1, H, W, 3), ts (B, T).

    Returns (B, T, 1, H, W, 3). Shard the leading axis over the mesh's
    'data' axis (drba_tpu.parallel.mesh.window_sharding) before calling; jit
    propagates the sharding through the whole program.
    """

    def one_window(i0, i1, i2, tvec):
        flow10, _, f1, f0 = _calc_flow(params, i1, i0, scale_list[0],
                                       splat_backend=splat_backend)
        flow12, _, _, f2 = _calc_flow(params, i1, i2, scale_list[0], f0=f1,
                                      splat_backend=splat_backend)
        fn = functools.partial(
            _interp_one_t,
            params,
            I0=i0, I1=i1, I2=i2,
            flow10=flow10, flow12=flow12,
            f0=f0, f1=f1, f2=f2,
            scale_list=scale_list, linear=linear, splat_backend=splat_backend,
        )
        return jax.vmap(lambda t: fn(t))(tvec)

    return jax.vmap(one_window)(I0, I1, I2, ts)


@functools.partial(jax.jit, static_argnames=("scale", "linear", "splat_backend"))
def gmfss_windows_batched(params, I0, I1, I2, ts, scale=1.0, linear=True,
                          splat_backend="auto"):
    """GMFSS window batch: I* (B, 1, H, W, 3), ts (B, T) -> (B, T, 1, H, W, 3).

    Reuse-free plan: each window computes BOTH bidirectional gmflow passes
    (the serial path reuses the previous window's reversed pair, which would
    serialize chips); everything else matches models/gmfss.py."""
    from drba_tpu.models.gmfss import _interp_one_t as gmfss_one_t
    from drba_tpu.models.gmfss_core import gmfss_reuse

    def one_window(i0, i1, i2, tvec):
        reuse10 = gmfss_reuse(params, i1, i0, scale=scale, union=False)
        reuse12 = gmfss_reuse(params, i1, i2, scale=scale, union=False)
        return jax.vmap(
            lambda t: gmfss_one_t(params, t, i0, i1, i2, reuse10, reuse12,
                                  linear, splat_backend)
        )(tvec)

    return jax.vmap(one_window)(I0, I1, I2, ts)


@functools.partial(jax.jit, static_argnames=("scale", "scale_list", "linear",
                                             "splat_backend"))
def union_windows_batched(params, rife_params, I0, I1, I2, ts, scale=1.0,
                          scale_list=(16.0, 8.0, 4.0, 2.0, 1.0), linear=True,
                          splat_backend="auto"):
    """GMFSS_UNION window batch (aux half-res RIFE included)."""
    from drba_tpu.models.gmfss_core import gmfss_reuse
    from drba_tpu.models.gmfss_union import _interp_one_t as union_one_t

    def one_window(i0, i1, i2, tvec):
        reuse10 = gmfss_reuse(params, i1, i0, scale=scale, union=True)
        reuse12 = gmfss_reuse(params, i1, i2, scale=scale, union=True)
        return jax.vmap(
            lambda t: union_one_t(params, rife_params, t, i0, i1, i2,
                                  reuse10, reuse12, scale_list, linear,
                                  splat_backend)
        )(tvec)

    return jax.vmap(one_window)(I0, I1, I2, ts)


def make_window_fn(model):
    """Bind a model wrapper to its batched multi-window program."""
    name = type(model).__name__
    backend = model.config.splat_backend
    if name == "RIFE":
        return lambda I0, I1, I2, ts: rife_windows_batched(
            model.params, I0, I1, I2, ts, model.scale_list, True, backend
        )
    if name == "GMFSS":
        return lambda I0, I1, I2, ts: gmfss_windows_batched(
            model.params, I0, I1, I2, ts, model.scale, True, backend
        )
    if name == "GMFSS_UNION":
        return lambda I0, I1, I2, ts: union_windows_batched(
            model.params, model.rife_params, I0, I1, I2, ts, model.scale,
            model.scale_list, True, backend
        )
    raise ValueError(f"no batched window plan for model {name}")


class WindowPlanner:
    """Groups sequential windows into device-count batches.

    Emission order is preserved: frames of window k are yielded before those
    of window k+1. Tail windows (< batch) pad by repeating the last window
    and dropping its output.
    """

    def __init__(self, mesh, model, ts_bucket: int):
        self.mesh = mesh
        self.window_fn = make_window_fn(model)
        self.ts_bucket = ts_bucket
        self.batch = mesh.devices.size

    def run(self, windows):
        """windows: list of (I0, I1, I2, ts_array). Yields per-window frame
        lists (device arrays, trimmed to the real ts count)."""
        from drba_tpu.parallel.mesh import shard_batch

        for start in range(0, len(windows), self.batch):
            group = windows[start : start + self.batch]
            real = len(group)
            while len(group) < self.batch:
                group.append(group[-1])

            counts = [len(g[3]) for g in group]
            T = self.ts_bucket
            ts = jnp.stack(
                [
                    jnp.pad(jnp.asarray(g[3], jnp.float32), (0, T - len(g[3])), constant_values=1.0)
                    for g in group
                ]
            )
            I0 = jnp.stack([g[0] for g in group])
            I1 = jnp.stack([g[1] for g in group])
            I2 = jnp.stack([g[2] for g in group])
            I0, I1, I2, ts = shard_batch(self.mesh, (I0, I1, I2, ts))

            out = self.window_fn(I0, I1, I2, ts)
            for b in range(real):
                yield [out[b, t] for t in range(counts[b])]

"""Softsplat forward-warp vs a direct numpy realization of the spec.

The oracle below implements the documented scatter semantics
(models/softsplat/softsplat_torch.py:70-179) with plain python loops —
slow but unambiguous.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from drba_tpu.ops import softsplat

RNG = np.random.default_rng(7)


def _oracle_splat(ten, flow):
    n, h, w, c = ten.shape
    out = np.zeros_like(ten, dtype=np.float64)
    for b in range(n):
        for y in range(h):
            for x in range(w):
                fx = x + flow[b, y, x, 0]
                fy = y + flow[b, y, x, 1]
                if not (np.isfinite(fx) and np.isfinite(fy)):
                    continue
                x0, y0 = int(np.floor(fx)), int(np.floor(fy))
                for dy in (0, 1):
                    for dx in (0, 1):
                        xi, yi = x0 + dx, y0 + dy
                        if 0 <= xi < w and 0 <= yi < h:
                            wx = fx - x0 if dx else 1 - (fx - x0)
                            wy = fy - y0 if dy else 1 - (fy - y0)
                            out[b, yi, xi] += ten[b, y, x] * (wx * wy)
    return out.astype(np.float32)


def _oracle(ten, flow, metric, mode):
    main = mode.split("-")[0]
    sub = mode.split("-")[1] if "-" in mode else None
    if main == "avg":
        ten = np.concatenate([ten, np.ones_like(ten[..., :1])], -1)
    elif main == "linear":
        ten = np.concatenate([ten * metric, metric], -1)
    elif main == "soft":
        e = np.exp(metric)
        ten = np.concatenate([ten * e, e], -1)
    out = _oracle_splat(ten, flow)
    if main == "sum":
        return out
    norm = out[..., -1:]
    if sub in (None, "addeps"):
        norm = norm + 1e-7
    elif sub == "zeroeps":
        norm = np.where(norm == 0.0, 1.0, norm)
    elif sub == "clipeps":
        norm = np.clip(norm, 1e-7, None)
    return out[..., :-1] / norm


@pytest.mark.parametrize("backend", ["scatter", "sort"])
@pytest.mark.parametrize("mode", ["sum", "avg", "soft", "linear", "avg-zeroeps"])
def test_softsplat_modes(backend, mode):
    n, h, w, c = 2, 13, 17, 3
    ten = RNG.standard_normal((n, h, w, c), dtype=np.float32)
    flow = (RNG.standard_normal((n, h, w, 2)) * 4).astype(np.float32)
    metric = None
    m_np = None
    if mode.split("-")[0] in ("linear", "soft"):
        m_np = RNG.standard_normal((n, h, w, 1), dtype=np.float32)
        metric = jnp.asarray(m_np)
    want = _oracle(ten, flow, m_np, mode)
    got = np.asarray(
        softsplat(jnp.asarray(ten), jnp.asarray(flow), metric, mode, backend=backend)
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("backend", ["scatter", "sort"])
def test_softsplat_identity_flow(backend):
    # Zero flow must reproduce the input exactly under 'avg'.
    x = RNG.standard_normal((1, 8, 8, 2), dtype=np.float32)
    out = softsplat(jnp.asarray(x), jnp.zeros((1, 8, 8, 2)), None, "avg", backend=backend)
    np.testing.assert_allclose(np.asarray(out), x, rtol=1e-5, atol=1e-5)


def test_softsplat_nonfinite_dropped():
    x = np.ones((1, 4, 4, 1), np.float32)
    flow = np.zeros((1, 4, 4, 2), np.float32)
    flow[0, 0, 0, 0] = np.nan
    out = np.asarray(softsplat(jnp.asarray(x), jnp.asarray(flow), None, "sum"))
    assert out[0, 0, 0, 0] == 0.0
    assert out[0, 1, 1, 0] == 1.0


@pytest.mark.parametrize("backend", ["shift", "stencil"])
def test_tpu_fast_backends_match_scatter(backend):
    """Dense offset-enumeration backends are exact within their radius."""
    n, h, w, c = 1, 16, 24, 3
    ten = RNG.standard_normal((n, h, w, c), dtype=np.float32)
    flow = np.clip(RNG.standard_normal((n, h, w, 2)) * 3, -7, 7).astype(np.float32)
    met = RNG.standard_normal((n, h, w, 1), dtype=np.float32)
    for mode, m in [("avg", None), ("soft", jnp.asarray(met))]:
        want = np.asarray(softsplat(jnp.asarray(ten), jnp.asarray(flow), m, mode, backend="scatter"))
        got = np.asarray(softsplat(jnp.asarray(ten), jnp.asarray(flow), m, mode, backend=backend))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fast_backend_drops_far_entries():
    # displacements beyond the radius vanish instead of corrupting memory
    x = np.ones((1, 24, 24, 1), np.float32)
    flow = np.full((1, 24, 24, 2), 14.0, np.float32)  # beyond default radius 12
    out = np.asarray(softsplat(jnp.asarray(x), jnp.asarray(flow), None, "sum", backend="shift"))
    assert np.abs(out).sum() == 0.0


def test_stencil_bf16_storage_matches_scatter():
    """bf16 inputs stream through the stencil kernel's VMEM as bf16
    (softsplat.py gates this on the ORIGINAL dtype); the result matches the
    exact f32 scatter of the same bf16 inputs to bf16 resolution."""
    n, h, w, c = 1, 24, 40, 5
    ten = jnp.asarray(RNG.uniform(0, 1, (n, h, w, c)), jnp.bfloat16)
    flow = jnp.asarray(np.clip(RNG.standard_normal((n, h, w, 2)) * 3, -7, 7), jnp.bfloat16)
    met = jnp.asarray(RNG.standard_normal((n, h, w, 1)), jnp.bfloat16)
    for mode, m in [("avg", None), ("soft", met)]:
        want = np.asarray(softsplat(ten, flow, m, mode, backend="scatter"), np.float32)
        got = np.asarray(softsplat(ten, flow, m, mode, backend="stencil"), np.float32)
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_stencil_radius_param():
    """The per-level radius parameter drops exactly the out-of-radius set."""
    x = np.ones((1, 16, 16, 1), np.float32)
    flow = np.full((1, 16, 16, 2), 5.0, np.float32)
    kept = np.asarray(softsplat(jnp.asarray(x), jnp.asarray(flow), None, "sum",
                                backend="stencil", radius=6))
    dropped = np.asarray(softsplat(jnp.asarray(x), jnp.asarray(flow), None, "sum",
                                   backend="stencil", radius=3))
    assert np.abs(kept).sum() > 0
    assert np.abs(dropped).sum() == 0.0


def test_stencil_unsupported_geometry_falls_back_to_shift():
    """H that no band height divides must NOT silently truncate: the stencil
    backend falls back to the bit-equivalent 'shift' path (ADVICE r2)."""
    from drba_tpu.ops.splat_stencil import stencil_supported

    assert not stencil_supported(12, 64)
    assert stencil_supported(64, 128)
    n, h, w, c = 1, 12, 64, 3
    ten = jnp.asarray(RNG.uniform(0, 1, (n, h, w, c)).astype(np.float32))
    flow = jnp.asarray(
        np.clip(RNG.standard_normal((n, h, w, 2)) * 3, -7, 7).astype(np.float32))
    want = np.asarray(softsplat(ten, flow, None, "avg", backend="scatter"))
    got = np.asarray(softsplat(ten, flow, None, "avg", backend="stencil"))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

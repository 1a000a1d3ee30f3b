"""DRM algorithm tests: worked-example golden values + reference oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from drba_tpu.drm import (
    calc_drm_gmfss,
    calc_drm_rife,
    calc_drm_rife_auxiliary,
    get_drm_t,
)

RNG = np.random.default_rng(11)


def test_get_drm_t_worked_example():
    # Golden values from the reference docstring (models/drm.py:16-32):
    # drm=[0.1,0.7,0.4,0.2], t=0.8 -> [0.2569, 0.9258, 0.7106, 0.4486]
    drm = jnp.asarray(np.array([0.1, 0.7, 0.4, 0.2], np.float32).reshape(1, 2, 2, 1))
    out = np.asarray(get_drm_t(drm, 0.8)).reshape(-1)
    np.testing.assert_allclose(out, [0.2569, 0.9258, 0.7106, 0.4486], atol=2e-4)


def test_get_drm_t_traced_matches_unrolled():
    drm = jnp.asarray(RNG.uniform(0.01, 0.99, (1, 4, 4, 1)).astype(np.float32))
    for t in (0.3, 0.8, 0.55):
        a = np.asarray(get_drm_t(drm, t))
        b = np.asarray(get_drm_t(drm, jnp.float32(t)))
        np.testing.assert_allclose(a, b, atol=5e-3)


def _rand_flow(shape, mag=3.0):
    return (RNG.standard_normal(shape) * mag).astype(np.float32)


@pytest.mark.parametrize("linear", [True, False])
def test_calc_drm_rife_matches_reference(reference_path, linear):
    import torch

    from models.drm import calc_drm_rife as ref_fn

    n, h, w = 1, 16, 24
    f10 = _rand_flow((n, h, w, 2))
    f12 = _rand_flow((n, h, w, 2))
    t = 0.37

    with torch.inference_mode():
        ref = ref_fn(
            t,
            torch.from_numpy(np.moveaxis(f10, -1, 1).copy()),
            torch.from_numpy(np.moveaxis(f12, -1, 1).copy()),
            linear=linear,
        )
    got = calc_drm_rife(t, jnp.asarray(f10), jnp.asarray(f12), linear=linear)
    for name in ("drm_t1_t01", "drm_t1_t12"):
        want = np.moveaxis(ref[name].numpy(), 1, -1)
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), want, rtol=1e-3, atol=1e-3
        )


@pytest.mark.parametrize("with_metric", [True, False])
def test_calc_drm_gmfss_matches_reference(reference_path, with_metric):
    import torch

    from models.drm import calc_drm_gmfss as ref_fn

    n, h, w = 1, 16, 24
    f10 = _rand_flow((n, h, w, 2))
    f12 = _rand_flow((n, h, w, 2))
    m10 = RNG.standard_normal((n, h, w, 1)).astype(np.float32) if with_metric else None
    m12 = RNG.standard_normal((n, h, w, 1)).astype(np.float32) if with_metric else None
    t = 0.62

    def tt(x):
        return None if x is None else torch.from_numpy(np.moveaxis(x, -1, 1).copy())

    with torch.inference_mode():
        ref = ref_fn(t, tt(f10), tt(f12), tt(m10), tt(m12), linear=True)
    got = calc_drm_gmfss(
        t,
        jnp.asarray(f10),
        jnp.asarray(f12),
        None if m10 is None else jnp.asarray(m10),
        None if m12 is None else jnp.asarray(m12),
        linear=True,
    )
    for name in ("drm0t_t01", "drm1t_t01", "drm1t_t12", "drm2t_t12"):
        want = np.moveaxis(ref[name].numpy(), 1, -1)
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), want, rtol=1e-3, atol=1e-3
        )


def test_calc_drm_rife_auxiliary_matches_reference(reference_path):
    import torch

    from models.drm import calc_drm_rife_auxiliary as ref_fn

    n, h, w = 1, 12, 20
    f10 = _rand_flow((n, h, w, 2))
    f12 = _rand_flow((n, h, w, 2))
    m10 = RNG.standard_normal((n, h, w, 1)).astype(np.float32)
    m12 = RNG.standard_normal((n, h, w, 1)).astype(np.float32)

    def tt(x):
        return torch.from_numpy(np.moveaxis(x, -1, 1).copy())

    with torch.inference_mode():
        ref = ref_fn(0.44, tt(f10), tt(f12), tt(m10), tt(m12), linear=True)
    got = calc_drm_rife_auxiliary(
        0.44, jnp.asarray(f10), jnp.asarray(f12), jnp.asarray(m10), jnp.asarray(m12), linear=True
    )
    for name in ("drm_t1_t01", "drm_t1_t12"):
        want = np.moveaxis(ref[name].numpy(), 1, -1)
        np.testing.assert_allclose(
            np.asarray(getattr(got, name)), want, rtol=1e-3, atol=1e-3
        )

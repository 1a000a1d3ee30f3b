"""SSIM, pixel-shuffle, conv-transpose, unfold parity vs torch oracles."""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from drba_tpu.ops import conv_transpose2d, pixel_shuffle, ssim_matlab, unfold3x3

RNG = np.random.default_rng(3)


def _nchw(x):
    return torch.from_numpy(np.moveaxis(x, -1, 1).copy())


def test_ssim_matlab_matches_reference(reference_path):
    from models.pytorch_msssim import ssim_matlab as ref_ssim

    a = RNG.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    b = np.clip(a + RNG.normal(0, 0.08, a.shape), 0, 1).astype(np.float32)
    want = float(ref_ssim(_nchw(a), _nchw(b)))
    got = float(ssim_matlab(jnp.asarray(a), jnp.asarray(b)))
    # separable accumulation order differs from the oracle's full 3-D conv;
    # f32 cancellation in sigma = E[x^2]-mu^2 bounds agreement near 1e-3,
    # far below the 0.3 scene-detection threshold granularity.
    assert abs(got - want) < 2e-3


def test_ssim_identical_images():
    a = RNG.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    assert float(ssim_matlab(jnp.asarray(a), jnp.asarray(a))) > 0.9999


def test_pixel_shuffle_matches_torch():
    n, h, w, c, r = 2, 5, 7, 3, 2
    x = RNG.standard_normal((n, h, w, c * r * r), dtype=np.float32)
    want = np.moveaxis(torch.pixel_shuffle(_nchw(x), r).numpy(), 1, -1)
    got = np.asarray(pixel_shuffle(jnp.asarray(x), r))
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("r,k,cin,cout", [(2, 3, 16, 3), (2, 1, 8, 5), (4, 3, 4, 2)])
def test_fold_conv_after_shuffle_identity(r, k, cin, cout):
    """conv(shuffle(u)) == shuffle(conv_lo(u)) for the polyphase fold used
    by the GridNet tail (odd frame dims included to exercise edges)."""
    import jax

    from drba_tpu.ops.shuffle import fold_conv_after_shuffle

    u = jnp.asarray(RNG.standard_normal((2, 5, 7, cin * r * r), dtype=np.float32))
    w = jnp.asarray(RNG.standard_normal((k, k, cin, cout), dtype=np.float32))
    b = jnp.asarray(RNG.standard_normal((cout,), dtype=np.float32))

    def conv(x, w, b, pad):
        y = jax.lax.conv_general_dilated(
            x, w, (1, 1), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y if b is None else y + b

    want = conv(pixel_shuffle(u, r), w, b, k // 2)
    w_lo, b_lo = fold_conv_after_shuffle(w, b, r)
    got = pixel_shuffle(conv(u, w_lo, b_lo, 1), r)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("k,s,p", [(4, 2, 1), (3, 1, 1), (2, 2, 0)])
def test_conv_transpose2d_matches_torch(k, s, p):
    n, h, w, ci, co = 2, 6, 5, 4, 3
    x = RNG.standard_normal((n, h, w, ci), dtype=np.float32)
    wt = RNG.standard_normal((ci, co, k, k), dtype=np.float32)  # torch layout
    bias = RNG.standard_normal((co,), dtype=np.float32)
    want = np.moveaxis(
        TF.conv_transpose2d(
            _nchw(x), torch.from_numpy(wt), torch.from_numpy(bias), stride=s, padding=p
        ).numpy(),
        1, -1,
    )
    # converter layout: (kh, kw, in, out), no flip
    kernel = jnp.asarray(np.transpose(wt, (2, 3, 0, 1)))
    got = np.asarray(
        conv_transpose2d(jnp.asarray(x), kernel, jnp.asarray(bias), stride=s, padding=p)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_unfold3x3_matches_torch():
    n, h, w, c = 1, 5, 6, 2
    x = RNG.standard_normal((n, h, w, c), dtype=np.float32)
    want = TF.unfold(_nchw(x), [3, 3], padding=1).numpy().reshape(n, c, 9, h, w)
    got = np.asarray(unfold3x3(jnp.asarray(x)))  # (N,H,W,C,9)
    got_t = np.transpose(got, (0, 3, 4, 1, 2))  # N,C,9,H,W
    np.testing.assert_allclose(got_t, want, rtol=1e-6, atol=1e-6)


def test_ssim_2d_matches_reference(reference_path):
    from models.pytorch_msssim import ssim as ref_ssim

    from drba_tpu.ops.ssim import ssim

    a = RNG.uniform(0, 1, (1, 48, 64, 3)).astype(np.float32)
    b = np.clip(a + RNG.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    want = float(ref_ssim(_nchw(a), _nchw(b)))
    got = float(ssim(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - want) < 2e-3


def test_msssim_matches_reference(reference_path):
    from models.pytorch_msssim import msssim as ref_msssim

    from drba_tpu.ops.ssim import msssim

    a = RNG.uniform(0, 1, (1, 176, 176, 3)).astype(np.float32)
    b = np.clip(a + RNG.normal(0, 0.03, a.shape), 0, 1).astype(np.float32)
    want = float(ref_msssim(_nchw(a), _nchw(b)))
    got = float(msssim(jnp.asarray(a), jnp.asarray(b)))
    assert abs(got - want) < 5e-3


def test_ssim_class_wrappers(reference_path):
    """SSIM module returns DSSIM like the reference forward
    (models/pytorch_msssim/__init__.py:185-191); MSSSIM forwards to msssim."""
    from models.pytorch_msssim import SSIM as RefSSIM

    from drba_tpu.ops.ssim import MSSSIM, SSIM, msssim

    a = RNG.uniform(0, 1, (1, 176, 176, 3)).astype(np.float32)
    b = np.clip(a + RNG.normal(0, 0.05, a.shape), 0, 1).astype(np.float32)
    ja, jb = jnp.asarray(a), jnp.asarray(b)
    want = float(RefSSIM()(_nchw(a), _nchw(b)))
    got = float(SSIM()(ja, jb))
    assert abs(got - want) < 2e-3
    assert abs(float(MSSSIM()(ja, jb)) - float(msssim(ja, jb))) < 1e-6

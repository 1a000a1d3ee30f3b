"""Bit-level parity of resize / backward-warp ops against torch oracles."""

import numpy as np
import pytest
import torch
import torch.nn.functional as TF

import jax.numpy as jnp

from drba_tpu.ops import backwarp, grid_sample, resize_bilinear

RNG = np.random.default_rng(0)


def _nchw(x_nhwc):
    return torch.from_numpy(np.moveaxis(x_nhwc, -1, 1).copy())


def _nhwc(t_nchw):
    return np.moveaxis(t_nchw.numpy(), 1, -1)


@pytest.mark.parametrize("align", [False, True])
@pytest.mark.parametrize(
    "src,dst",
    [((17, 23), (32, 32)), ((32, 48), (17, 23)), ((8, 8), (16, 16)), ((540, 960), (544, 960))],
)
def test_resize_matches_torch(align, src, dst):
    x = RNG.standard_normal((2, *src, 3), dtype=np.float32)
    want = _nhwc(
        TF.interpolate(_nchw(x), size=dst, mode="bilinear", align_corners=align)
    )
    got = np.asarray(resize_bilinear(jnp.asarray(x), dst, align_corners=align))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("padding_mode", ["border", "zeros"])
def test_backwarp_matches_torch_grid_sample(padding_mode):
    # Mirrors warplayer.py:8-22 ('border') and MetricNet backwarp ('zeros'):
    # normalized grid + flow/((size-1)/2), align_corners=True.
    n, h, w, c = 2, 21, 33, 4
    img = RNG.standard_normal((n, h, w, c), dtype=np.float32)
    flow = (RNG.standard_normal((n, h, w, 2)) * 6).astype(np.float32)

    t_img = _nchw(img)
    t_flow = _nchw(flow)
    hor = torch.linspace(-1.0, 1.0, w).view(1, 1, 1, w).expand(n, -1, h, -1)
    ver = torch.linspace(-1.0, 1.0, h).view(1, 1, h, 1).expand(n, -1, -1, w)
    base = torch.cat([hor, ver], 1)
    norm_flow = torch.cat(
        [t_flow[:, 0:1] / ((w - 1) / 2.0), t_flow[:, 1:2] / ((h - 1) / 2.0)], 1
    )
    g = (base + norm_flow).permute(0, 2, 3, 1)
    want = _nhwc(
        TF.grid_sample(t_img, g, mode="bilinear", padding_mode=padding_mode, align_corners=True)
    )
    got = np.asarray(backwarp(jnp.asarray(img), jnp.asarray(flow), padding_mode))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_grid_sample_matches_torch():
    n, h, w, c = 1, 15, 19, 8
    ho, wo = 7, 9
    img = RNG.standard_normal((n, h, w, c), dtype=np.float32)
    grid = (RNG.uniform(-1.3, 1.3, (n, ho, wo, 2))).astype(np.float32)
    want = _nhwc(
        TF.grid_sample(
            _nchw(img), torch.from_numpy(grid), mode="bilinear",
            padding_mode="zeros", align_corners=True,
        )
    )
    got = np.asarray(grid_sample(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

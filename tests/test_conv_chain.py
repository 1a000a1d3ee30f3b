"""Fused conv-chain kernel: parity vs the XLA layer chain (interpret mode).

Covers the two consumer patterns:
  * GridNet ``_seq_block`` — Sequential(PReLU, Conv, PReLU, Conv) with
    optional residual (models/model_gmfss/FusionNet.py:7-33);
  * IFNet ResConv chains — ``leaky_relu(conv(x) * beta + x)`` x depth
    (models/rife_426_heavy/IFNet_HDv3.py:12-20).
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from drba_tpu.ops.conv_chain import ChainStep, conv_chain


def _conv(x, w, b):
    out = lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return out + b.astype(out.dtype)


def _ref_chain(x, steps, residual="none", res=None):
    y = x
    for s in steps:
        inp = y
        if s.pre_alpha is not None:
            a = s.pre_alpha.astype(y.dtype)
            inp = jnp.where(y >= 0, y, y * a)
        y = _conv(inp, s.w, s.b)
        if s.beta is not None:
            y = y * s.beta.astype(y.dtype) + inp
            y = jnp.where(y >= 0, y, y * 0.2)
    if residual == "input":
        y = y + x
    elif residual == "extra":
        y = y + res
    return y


def _steps(rng, chs, pre=False, beta=False):
    steps = []
    for cin, cout in zip(chs[:-1], chs[1:]):
        steps.append(ChainStep(
            w=jnp.asarray(rng.normal(0, 0.1, (3, 3, cin, cout)).astype(np.float32)),
            b=jnp.asarray(rng.normal(0, 0.5, (cout,)).astype(np.float32)),
            pre_alpha=jnp.float32(0.25) if pre else None,
            beta=jnp.asarray(rng.normal(1, 0.2, (cout,)).astype(np.float32))
            if beta else None,
        ))
    return steps


def _check(x, steps, residual="none", res=None, hb=None):
    got = conv_chain(x, steps, residual=residual, res=res, hb=hb,
                     interpret=True)
    want = _ref_chain(x, steps, residual=residual, res=res)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_gridnet_seq_block_f2_residual_input():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 32, 64)).astype(np.float32))
    _check(x, _steps(rng, [64, 64, 64], pre=True), residual="input", hb=8)


def test_gridnet_head_f2_cin128_res_extra():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (1, 24, 32, 128)).astype(np.float32))
    res = jnp.asarray(rng.normal(0, 1, (1, 24, 32, 64)).astype(np.float32))
    _check(x, _steps(rng, [128, 64, 64], pre=True), residual="extra", res=res,
           hb=8)


def test_gridnet_wide_out_f2_cout256():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 16, 64)).astype(np.float32))
    steps = _steps(rng, [64, 64, 256])
    steps[1] = steps[1]._replace(pre_alpha=jnp.float32(0.1))
    _check(x, steps, hb=4)


def test_single_conv_f2():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (1, 8, 16, 64)).astype(np.float32))
    _check(x, _steps(rng, [64, 64], pre=True), residual="input", hb=4)


def test_resconv_chain_f4_c32():
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(0, 0.5, (2, 12, 32, 32)).astype(np.float32))
    _check(x, _steps(rng, [32] * 9, beta=True), hb=12)  # single band (hb < n)


def test_resconv_chain_f1_c128():
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(0, 0.5, (1, 10, 16, 128)).astype(np.float32))
    _check(x, _steps(rng, [128] * 4, beta=True), hb=5)


def test_uneven_band_boundaries_match():
    # band height that doesn't divide 8: halo/mask logic across bands
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(0, 1, (1, 15, 16, 64)).astype(np.float32))
    _check(x, _steps(rng, [64, 64, 64], pre=True), residual="input", hb=5)


def test_packed_io_matches_unpacked():
    """packed=True consumes/produces the pre-packed layout bit-identically."""
    from drba_tpu.ops.conv_chain import pack_cols, unpack_cols

    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 32, 64)).astype(np.float32))
    steps = _steps(rng, [64, 64, 64], pre=True)
    res = jnp.asarray(rng.normal(0, 1, (2, 16, 32, 64)).astype(np.float32))
    for residual, r in (("none", None), ("input", None), ("extra", res)):
        want = conv_chain(x, steps, residual=residual, res=r, hb=8,
                          interpret=True)
        rp = pack_cols(r, 2) if r is not None else None
        got = conv_chain(pack_cols(x, 2), steps, residual=residual, res=rp,
                         hb=8, interpret=True, packed=True)
        np.testing.assert_array_equal(np.asarray(unpack_cols(got, 2)),
                                      np.asarray(want))


def test_gridnet_fused_matches_xla():
    """Full GridNet with fused L0 conv chains vs the plain XLA lattice."""
    from drba_tpu.models.gmfss_nets import (
        GRIDNET_SPEC,
        GRIDNET_UNION_SPEC,
        build_gridnet_spec,
        gridnet_apply,
    )
    from drba_tpu.models.layers import init_from_spec

    rng = np.random.default_rng(8)
    for union, cin in ((False, 12), (True, 9)):
        spec = GRIDNET_UNION_SPEC if union else GRIDNET_SPEC
        p = init_from_spec(spec, seed=3)
        x = jnp.asarray(rng.normal(0, 1, (2, 16, 32, cin)).astype(np.float32))
        x1 = jnp.asarray(rng.normal(0, 1, (2, 16, 32, 128)).astype(np.float32))
        x2 = jnp.asarray(rng.normal(0, 1, (2, 8, 16, 256)).astype(np.float32))
        x3 = jnp.asarray(rng.normal(0, 1, (2, 4, 8, 384)).astype(np.float32))
        want = gridnet_apply(p, x, x1, x2, x3, union=union, conv_backend="xla")
        got = gridnet_apply(p, x, x1, x2, x3, union=union,
                            conv_backend="pallas")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=5e-4, atol=5e-4)


def test_ifnet_fused_resconv_matches_xla():
    """Full IFNet with fused ResConv chains vs the plain XLA path."""
    from drba_tpu.models.ifnet import IFNET_SPEC, ifnet_apply
    from drba_tpu.models.layers import init_from_spec

    p = init_from_spec(IFNET_SPEC, seed=5)
    rng = np.random.default_rng(9)
    I0 = jnp.asarray(rng.uniform(0, 1, (2, 64, 128, 3)).astype(np.float32))
    I1 = jnp.asarray(rng.uniform(0, 1, (2, 64, 128, 3)).astype(np.float32))
    tmap = jnp.full((2, 64, 128, 1), 0.5, jnp.float32)
    scale_list = (4.0, 2.0, 1.0, 1.0, 1.0)
    want, wf = ifnet_apply(p, I0, I1, tmap, scale_list,
                           warp_backend="gather", conv_backend="xla")
    got, gf = ifnet_apply(p, I0, I1, tmap, scale_list,
                          warp_backend="gather", conv_backend="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(gf[-1]), np.asarray(wf[-1]),
                               rtol=5e-3, atol=5e-3)


def test_bf16_numerics_close():
    rng = np.random.default_rng(7)
    x32 = rng.normal(0, 1, (1, 16, 16, 64)).astype(np.float32)
    steps = _steps(rng, [64, 64, 64], pre=True)
    x = jnp.asarray(x32, jnp.bfloat16)
    steps_b = [s._replace(w=s.w.astype(jnp.bfloat16)) for s in steps]
    got = conv_chain(x, steps_b, residual="input", hb=8, interpret=True)
    want = _ref_chain(x, steps_b, residual="input")
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.1, atol=0.1,
    )


def test_chain_plain_res_steps():
    """Per-step ``y = conv(prelu(x)) + x`` epilogue (MetricNet's residual
    blocks, model_gmfss/MetricNet.py:44-65) == the XLA composition."""
    import jax.numpy as jnp
    from drba_tpu.ops.conv_chain import ChainStep, conv_chain

    rng = np.random.default_rng(11)
    N, H, W, C = 2, 24, 64, 64
    x = jnp.asarray(rng.normal(size=(N, H, W, C)), jnp.float32)

    steps = []
    ref = x
    for i in range(3):
        w = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.1, jnp.float32)
        b = jnp.asarray(rng.normal(size=(C,)) * 0.1, jnp.float32)
        a = jnp.asarray(rng.uniform(0.1, 0.4, (C,)), jnp.float32)
        steps.append(ChainStep(w=w, b=b, pre_alpha=a, plain_res=True))
        pre = jnp.where(ref >= 0, ref, ref * a)
        ref = jax.lax.conv_general_dilated(
            pre, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b + ref

    out = conv_chain(x, steps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4,
                               rtol=0)


def test_metricnet_chain_matches_xla():
    """metricnet_apply with the fused chain == the XLA conv stack."""
    import jax.numpy as jnp
    from drba_tpu.convert import load_network
    from drba_tpu.models.gmfss_nets import METRICNET_SPEC, metricnet_apply

    p = load_network(None, "metric.pkl", METRICNET_SPEC, seed=0)
    rng = np.random.default_rng(12)
    n, h, w = 1, 32, 64
    img0, img1 = (jnp.asarray(rng.uniform(0, 1, (n, h, w, 3)), jnp.float32)
                  for _ in range(2))
    f01, f10 = (jnp.asarray(rng.normal(size=(n, h, w, 2)) * 2, jnp.float32)
                for _ in range(2))
    ref = metricnet_apply(p, img0, img1, f01, f10, conv_backend="xla")
    out = metricnet_apply(p, img0, img1, f01, f10, conv_backend="pallas")
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=0)


def test_featurenet_chain_matches_xla():
    import jax.numpy as jnp
    from drba_tpu.convert import load_network
    from drba_tpu.models.gmfss_nets import FEATURENET_SPEC, featurenet_apply

    p = load_network(None, "feat.pkl", FEATURENET_SPEC, seed=0)
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.uniform(0, 1, (1, 64, 128, 3)), jnp.float32)
    ref = featurenet_apply(p, x, conv_backend="xla")
    out = featurenet_apply(p, x, conv_backend="pallas")
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4,
                                   rtol=0)

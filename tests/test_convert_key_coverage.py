"""Converter spec key-coverage vs the reference torch modules (VERDICT r3).

feat.pkl / metric.pkl coverage is proven against the REAL blobs
(test_convert_real_ckpt.py); the other three checkpoints are stripped from
the snapshot, so coverage for their specs is asserted against the
instantiated reference modules' state_dicts — the exact key set
``load_state_dict`` would require (reference load contract:
models/model_gmfss/GMFSS.py:45-56, models/rife.py:19-20,
models/gmfss_union.py:17-19).

Also exercises the strict-load contract: missing/extra keys or an absent
weight file hard-fail under strict=True and stay lenient by default.
"""

import numpy as np
import pytest

from drba_tpu.convert import from_torch_state_dict, load_network
from drba_tpu.models.gmfss_nets import (
    FEATURENET_SPEC,
    GRIDNET_SPEC,
    GRIDNET_UNION_SPEC,
    METRICNET_SPEC,
)
from drba_tpu.models.gmflow_net import GMFLOW_SPEC
from drba_tpu.models.ifnet import IFNET_SPEC


def _ref_module(name, reference_path):
    import torch  # noqa: F401

    if name == "flownet":
        from models.gmflow.gmflow import GMFlow

        return GMFlow()
    if name == "fusionnet":
        from models.model_gmfss.FusionNet import GridNet

        return GridNet(6 * 2, 64 * 2, 128 * 2, 192 * 2, 3)
    if name == "fusionnet_union":
        from models.model_gmfss_union.FusionNet import GridNet

        return GridNet(9, 64 * 2, 128 * 2, 192 * 2, 3)
    if name == "rife":
        from models.rife_426_heavy.IFNet_HDv3 import IFNet

        return IFNet()
    if name == "metric":
        from models.model_gmfss.MetricNet import MetricNet

        return MetricNet()
    if name == "feat":
        from models.model_gmfss.FeatureNet import FeatureNet

        return FeatureNet()
    raise ValueError(name)


SPECS = {
    "flownet": GMFLOW_SPEC,
    "fusionnet": GRIDNET_SPEC,
    "fusionnet_union": GRIDNET_UNION_SPEC,
    "rife": IFNET_SPEC,
    "metric": METRICNET_SPEC,
    "feat": FEATURENET_SPEC,
}


@pytest.mark.parametrize("name", sorted(SPECS))
def test_spec_covers_reference_state_dict(name, reference_path):
    """Zero missing / zero extra keys vs the live reference module."""
    module = _ref_module(name, reference_path)
    ref_keys = {k for k, v in module.state_dict().items()
                if v.dtype.is_floating_point}
    spec_keys = set(SPECS[name])
    assert ref_keys == spec_keys, (
        f"{name}: missing from spec={sorted(ref_keys - spec_keys)[:5]} "
        f"extra in spec={sorted(spec_keys - ref_keys)[:5]}"
    )


@pytest.mark.parametrize("name", sorted(SPECS))
def test_strict_roundtrip_reference_state_dict(name, reference_path):
    """strict=True conversion of the module's own state dict succeeds and
    every tensor survives with the spec's layout (shape-checked by the
    param init it replaces)."""
    module = _ref_module(name, reference_path)
    params = from_torch_state_dict(module.state_dict(), SPECS[name], strict=True)
    assert set(params) == set(SPECS[name])
    for k, v in params.items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_strict_load_failures(tmp_path):
    spec = dict(list(METRICNET_SPEC.items())[:4])
    import torch

    # build a correct-shaped state dict straight from the random init
    init = from_torch_state_dict({}, spec)
    good = {}
    for k, d in spec.items():
        v = np.asarray(init[k], np.float32)
        kind = d[0]
        if kind == "conv":
            v = np.transpose(v, (3, 2, 0, 1))
        elif kind == "convT":
            v = np.transpose(v, (2, 3, 0, 1))
        elif kind == "linear":
            v = np.transpose(v, (1, 0))
        good[k] = torch.tensor(v)

    # exact keys: strict OK
    from_torch_state_dict(good, spec, strict=True)

    # missing key: strict raises, lenient random-inits
    part = dict(list(good.items())[1:])
    with pytest.raises(ValueError, match="missing"):
        from_torch_state_dict(part, spec, strict=True)
    from_torch_state_dict(part, spec)  # no raise

    # extra key: strict raises, lenient ignores
    extra = dict(good)
    extra["not.a.key"] = torch.zeros(1)
    with pytest.raises(ValueError, match="unexpected"):
        from_torch_state_dict(extra, spec, strict=True)
    from_torch_state_dict(extra, spec)  # no raise

    # absent file: strict raises, lenient random-inits
    with pytest.raises(FileNotFoundError):
        load_network(str(tmp_path), "nope.pkl", spec, strict=True)
    load_network(str(tmp_path), "nope.pkl", spec)  # no raise

"""Checkpoint conversion: torch ``.pkl`` state dicts -> JAX param dicts.

The reference loads torch pickles with a ``module.`` DataParallel prefix
strip (models/utils/tools.py:83-88; models/model_gmfss/GMFSS.py:45-56). Here
conversion is driven by each network's param spec (same keys), so it is a
mechanical per-kind transpose:

  kind      torch layout            stored layout
  conv      (O, I, kh, kw)          (kh, kw, I, O)   HWIO
  convT     (I, O, kh, kw)          (kh, kw, I, O)   un-flipped (op flips)
  linear    (O, I)                  (I, O)
  bias      (C,)                    (C,)
  ones      (1, C, 1, 1) or (C,)    (C,)             (ResConv beta / LN)
  scalar    (1,)                    ()               (PReLU slope)

Missing keys fall back to the spec's random init (the reference snapshot
ships without most weight blobs), mirroring ``strict=False`` loading
(models/rife.py:19-20); ``strict=True`` (CLI ``--strict``) hard-fails on
any missing or unexpected key instead — use it in production, where a
silently random-initialized subnet is never what you want. Converted
params can be cached as ``.npz``.
"""

from __future__ import annotations

import os
from typing import Mapping

import jax.numpy as jnp
import numpy as np

from drba_tpu.models.layers import init_from_spec
from drba_tpu.utils.log import get_logger

log = get_logger("drba_tpu.convert")


def _convert_one(kind: str, v: np.ndarray) -> np.ndarray:
    if kind == "conv":
        return np.transpose(v, (2, 3, 1, 0))
    if kind == "convT":
        return np.transpose(v, (2, 3, 0, 1))
    if kind == "linear":
        return np.transpose(v, (1, 0))
    if kind == "scalar":
        return np.asarray(v).reshape(())
    if kind in ("bias", "ones", "zeros"):
        return np.asarray(v).reshape(-1)
    raise ValueError(kind)


def from_torch_state_dict(state: Mapping[str, "object"], spec: Mapping[str, tuple],
                          strict: bool = False) -> dict:
    """Convert a torch state dict (tensors or ndarrays) to a JAX param dict.

    ``strict=True`` raises on missing OR unexpected keys (torch's
    ``load_state_dict(strict=True)`` contract); the default mirrors the
    reference's lenient load and keeps random init for missing keys.
    """
    flat = {}
    for k, v in state.items():
        k = k.replace("module.", "") if k.startswith("module.") else k
        flat[k] = v

    extra = sorted(set(flat) - set(spec))
    params = init_from_spec(spec)  # fallback for missing keys
    missing = []
    for key, desc in spec.items():
        if key in flat:
            v = flat[key]
            v = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
            params[key] = jnp.asarray(_convert_one(desc[0], v.astype(np.float32)))
        else:
            missing.append(key)
    if strict and (missing or extra):
        raise ValueError(
            f"strict load failed: {len(missing)} missing spec keys "
            f"(e.g. {missing[:3]}), {len(extra)} unexpected checkpoint keys "
            f"(e.g. {extra[:3]})"
        )
    if missing:
        log.warning("%d spec keys missing from checkpoint (random init kept), "
                    "e.g. %s", len(missing), missing[:3])
    if extra:
        log.warning("%d unexpected checkpoint keys ignored, e.g. %s",
                    len(extra), extra[:3])
    return params


def load_torch_pickle(path: str, spec: Mapping[str, tuple],
                      strict: bool = False) -> dict:
    """Load a reference ``.pkl`` checkpoint (requires torch, CPU-only)."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    return from_torch_state_dict(state, spec, strict=strict)


def save_npz(path: str, params: Mapping[str, "jnp.ndarray"]) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in params.items()})


def load_npz(path: str) -> dict:
    with np.load(path) as z:
        return {k: jnp.asarray(z[k]) for k in z.files}


def load_network(weights_dir: str | None, filename: str, spec: Mapping[str, tuple],
                 seed: int = 0, strict: bool = False) -> dict:
    """Resolve a network's params: .npz cache > torch .pkl > random init.

    ``strict=True`` additionally fails when the file itself is absent — a
    production run must never silently interpolate with random weights.
    """
    if weights_dir is not None:
        npz = os.path.join(weights_dir, filename.replace(".pkl", ".npz"))
        if os.path.exists(npz):
            return load_npz(npz)
        pkl = os.path.join(weights_dir, filename)
        if os.path.exists(pkl):
            return load_torch_pickle(pkl, spec, strict=strict)
        if strict:
            raise FileNotFoundError(
                f"strict load: checkpoint {pkl} (or .npz cache) not found")
        log.warning("%s not found; using random init", pkl)
    elif strict:
        raise ValueError("strict load requires a weights directory")
    return init_from_spec(spec, seed=seed)

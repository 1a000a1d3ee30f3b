"""Column-packed conv weight transforms: escape XLA's slow 64ch lowering.

Measured on this TPU (docs/ROADMAP.md): 3x3 convs with 64 channels at
large spatial dims lower to ~11.6 TF/s, while the same FLOPs at 128+
channels run at 40-45 TF/s — and zero-padding channels does NOT fix it.
This module instead reshapes the PROBLEM to the fast geometry: keep the
whole 64-channel lattice row in the column-packed layout of
ops.conv_chain.pack_cols — ``(N, H, W, C) -> (N, H, W/2, 2C)``, lane index
``r*C + c`` for column parity ``r`` — and rewrite each conv as a conv over
the packed tensor with algebraically rearranged weights:

* a 3x3 stride-1 conv becomes a dense packed 3x3 conv whose ``(tap, r, dj)``
  weight blocks are half structural zeros — 2x the MACs, but at the fast
  128-lane rate that is a ~1.7x net win, with ONE XLA op per conv (no
  per-op-floor blowup) and the pack relayout paid once per lattice;
* a 3x3 stride-2 conv CONSUMING a packed tensor becomes a (3, 2) conv with
  W-stride 1 (each stride-2 output column reads exactly two packed blocks),
  producing the unpacked half-res tensor directly — no unpack relayout;
* a ConvTranspose 4x4/s2/p1 PRODUCING a packed tensor becomes a 3x3 conv at
  the LOW resolution emitting ``(dy, dj, k)`` sub-position channels, plus a
  lane-preserving H-interleave — the packed analog of the IFNet lastconv
  fold (ops/shuffle.py).

All transforms are exact weight rearrangements (bit-equal math up to fp
reassociation); tests/test_conv_packed.py pins them against the plain
convs. Reference semantics being reproduced: the GridNet lattice convs of
models/model_gmfss/FusionNet.py:7-33,106-145.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_DN = ("NHWC", "HWIO", "NHWC")


def _conv(x, w, strides=(1, 1), padding=((1, 1), (1, 1))):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=strides, padding=padding,
        dimension_numbers=_DN, preferred_element_type=jnp.float32,
    )


def pack_conv3_weights(w: jax.Array, f: int = 2) -> jax.Array:
    """(3,3,C,K) HWIO -> (3,3,fC,fK) packed-domain weights, pack factor f.

    Output block dj (column phase, 0<=dj<f) at packed column jb covers
    original column f*jb+dj; its original tap dx in {-1,0,1} reads column
    f*jb+dj+dx = f*(jb+b)+r with b = (dj+dx)//f in {-1,0,1} and
    r = (dj+dx) mod f — the packed kernel width stays 3 for any f, with
    (3f-2)/3f of the blocks structural zeros (half at f=2).
    """
    kh, kw, c, k = w.shape
    assert (kh, kw) == (3, 3), w.shape
    wp = jnp.zeros((3, 3, f * c, f * k), w.dtype)
    for dj in range(f):
        for dx in (-1, 0, 1):
            b, r = divmod(dj + dx, f)
            wp = wp.at[:, b + 1, r * c:(r + 1) * c, dj * k:(dj + 1) * k].set(
                w[:, dx + 1])
    return wp


def pack_stride2_weights(w: jax.Array) -> jax.Array:
    """(3,3,C,K) HWIO of a stride-2 conv -> (3,2,2C,K) weights that consume
    the PACKED tensor at W-stride 1 (H keeps stride 2), producing the
    unpacked half-res output directly: output column j reads original
    columns 2j-1, 2j, 2j+1 = packed (b,r) = (-1,1),(0,0),(0,1)."""
    kh, kw, c, k = w.shape
    assert (kh, kw) == (3, 3), w.shape
    wd = jnp.zeros((3, 2, 2 * c, k), w.dtype)
    wd = wd.at[:, 0, c:, :].set(w[:, 0])
    wd = wd.at[:, 1, :c, :].set(w[:, 1])
    wd = wd.at[:, 1, c:, :].set(w[:, 2])
    return wd


def pack_convT4_weights(w: jax.Array) -> jax.Array:
    """ConvTranspose2d 4x4/s2/p1 weights (4,4,K,C) HWOI-as-stored-by-convert
    ... given here already as HWIO (4,4,C,K) for the EQUIVALENT gathered
    form: returns (3,3,C,4K) conv weights over the low-res input emitting
    sub-position channels ordered (dy, dj, k).

    ConvT o = 2i - 1 + t (t in 0..3): sub-position dy = o mod 2 selects taps
    t = 1,3 (dy=0; inputs i', i'-1) or t = 0,2 (dy=1; inputs i'+1, i').
    Expressed over low-res taps a in {-1,0,1} per axis (kernel 3, half the
    blocks structural zeros):
      dy=0: W[1] at a=0,  W[3] at a=-1
      dy=1: W[0] at a=+1, W[2] at a=0
    """
    kh, kw, c, k = w.shape
    assert (kh, kw) == (4, 4), w.shape
    # per-axis tap placement: rows of the 3-kernel indexed by a+1
    # ta[dy, a_idx] = original tap t contributing, or -1 for a zero block
    place = {0: [(0, 3), (1, 1)], 1: [(1, 2), (2, 0)]}  # dy -> [(a_idx, t)]
    wt = jnp.zeros((3, 3, c, 4 * k), w.dtype)
    for dy, rows in place.items():
        for ai, ty in rows:
            for dj, cols in place.items():
                for aj, tx in cols:
                    wt = wt.at[ai, aj, :, (2 * dy + dj) * k:(2 * dy + dj + 1) * k].set(
                        w[ty, tx]
                    )
    return wt


def h_interleave(y: jax.Array) -> jax.Array:
    """(N, H, P, (dy,dj,k)=4K) -> packed-W (N, 2H, P, (dj,k)=2K): move the
    dy sub-position channels into interleaved rows. Lane-preserving (the
    minormost 2K lanes keep their order), so this is a cheap sublane
    relayout, not a lane retiling."""
    n, h, p, c4 = y.shape
    k2 = c4 // 2
    return y.reshape(n, h, p, 2, k2).transpose(0, 1, 3, 2, 4).reshape(
        n, 2 * h, p, k2)


def conv3_packed(xp: jax.Array, w: jax.Array, b: jax.Array | None = None,
                 f: int = 2):
    """3x3/s1/p1 conv in the packed domain. ``w`` is the ORIGINAL (3,3,C,K);
    ``xp`` is pack_cols(x, f); returns pack_cols(conv(x, w), f)."""
    out = _conv(xp, pack_conv3_weights(w, f))
    if b is not None:
        out = out + jnp.tile(b, f).astype(out.dtype)
    return out.astype(xp.dtype)


def conv3_stride2_from_packed(xp: jax.Array, w: jax.Array,
                              b: jax.Array | None = None):
    """3x3/s2/p1 conv consuming the packed tensor, emitting unpacked
    half-res: H-stride 2, packed-W stride 1 with a (3,2) kernel."""
    out = _conv(xp, pack_stride2_weights(w), strides=(2, 1),
                padding=((1, 1), (1, 0)))
    if b is not None:
        out = out + b.astype(out.dtype)
    return out.astype(xp.dtype)


def convT4_to_packed(x: jax.Array, w: jax.Array, b: jax.Array | None = None):
    """ConvTranspose 4x4/s2/p1 (weights given HWIO (4,4,C,K)) emitting the
    PACKED double-res tensor (N, 2H, W, 2K) via a low-res 3x3 conv + row
    interleave."""
    out = _conv(x, pack_convT4_weights(w))
    if b is not None:
        out = out + jnp.tile(b, 4).astype(out.dtype)
    return h_interleave(out).astype(x.dtype)

"""Debug helpers: frame text burn-in (reference mark_tensor, tools.py:91-117).

Used to stamp timestep values onto output frames while debugging the frame
loop (the reference keeps a commented invocation at infer.py:145-147).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def mark_tensor(frame: jax.Array, text: str) -> jax.Array:
    """Burn ``text`` into the top-right corner of a (1,H,W,3) [0,1] frame."""
    from PIL import Image, ImageDraw, ImageFont

    arr = np.asarray(jnp.clip(frame[0].astype(jnp.float32) * 255.0, 0, 255)).astype(np.uint8)
    img = Image.fromarray(arr)
    draw = ImageDraw.Draw(img)
    try:
        font = ImageFont.truetype("arial.ttf", 24)
    except IOError:
        font = ImageFont.load_default()
    bbox = draw.textbbox((0, 0), text, font=font)
    x_pos = arr.shape[1] - (bbox[2] - bbox[0]) - 10
    draw.text((max(x_pos, 0), 10), text, font=font, fill=(255, 255, 255))
    out = np.asarray(img, dtype=np.float32) / 255.0
    return jnp.asarray(out)[None].astype(frame.dtype)

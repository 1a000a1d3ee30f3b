"""Core image/tensor ops for DRBA-TPU.

All ops use NHWC layout (TPU-native). Flow tensors are (N, H, W, 2) with
``flow[..., 0]`` = horizontal (x / width) displacement in pixels and
``flow[..., 1]`` = vertical (y / height), matching the reference's channel
order (flow[:, 0:1] = u, flow[:, 1:2] = v; models/utils/tools.py:77-80).
"""

from drba_tpu.ops.resize import resize_bilinear, resize_to, scale_by
from drba_tpu.ops.warp import backwarp, grid_sample
from drba_tpu.ops.softsplat import softsplat
from drba_tpu.ops.ssim import ssim_matlab
from drba_tpu.ops.shuffle import pixel_shuffle, conv_transpose2d, unfold3x3
from drba_tpu.ops.distance import flow_distance

__all__ = [
    "resize_bilinear",
    "resize_to",
    "scale_by",
    "backwarp",
    "grid_sample",
    "softsplat",
    "ssim_matlab",
    "pixel_shuffle",
    "conv_transpose2d",
    "unfold3x3",
    "flow_distance",
]

from drba_tpu.utils.tmapper import TMapper
from drba_tpu.utils.imageproc import (
    get_valid_net_inp_size,
    to_inp,
    to_out,
    to_tensor,
    to_uint8,
)
from drba_tpu.utils.scdet import check_scene

__all__ = [
    "TMapper",
    "get_valid_net_inp_size",
    "to_inp",
    "to_out",
    "to_tensor",
    "to_uint8",
    "check_scene",
]

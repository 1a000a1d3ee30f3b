"""Bit-parity of the spec-mandated grid utilities vs the reference.

TMapper / calc_ts / get_valid_net_inp_size are vectorized restatements of
reference arithmetic (tools.py:120-134, infer.py:76-91, tools.py:41-56);
any float deviation desynchronizes frame counts or pad sizes, so parity is
asserted BIT-exactly over a broad sweep of fps pairs and indices.
"""

import math

import numpy as np
import pytest

from drba_tpu.pipeline import calc_ts
from drba_tpu.utils import TMapper, get_valid_net_inp_size


class _RefTMapper:
    """Scalar enumeration exactly as the reference writes it
    (models/utils/tools.py:120-134)."""

    def __init__(self, src=-1., dst=0., times=None):
        self.times = dst / src if times is None else times

    def get_range_timestamps(self, _min, _max, lclose=True, rclose=False,
                             normalize=True):
        _min_step = math.ceil(_min * self.times)
        _max_step = math.ceil(_max * self.times)
        _start = _min_step if lclose else _min_step + 1
        _end = _max_step if not rclose else _max_step + 1
        if _start >= _end:
            return []
        if normalize:
            return [((i / self.times) - _min) / (_max - _min)
                    for i in range(_start, _end)]
        return [i / self.times for i in range(_start, _end)]


@pytest.mark.parametrize("src,dst", [(24, 60), (23.976, 60), (25, 60),
                                     (30, 144), (24, 48), (59.94, 60),
                                     (60, 24)])
def test_tmapper_bit_parity(src, dst):
    ours, ref = TMapper(src, dst), _RefTMapper(src, dst)
    for idx in range(0, 200):
        for lclose, rclose, norm in ((True, False, False), (True, False, True),
                                     (False, True, True), (True, True, False)):
            a = ours.get_range_timestamps(idx - 0.5, idx + 0.5, lclose,
                                          rclose, norm)
            b = ref.get_range_timestamps(idx - 0.5, idx + 0.5, lclose,
                                         rclose, norm)
            assert a == b, (src, dst, idx, lclose, rclose, norm)


def _ref_calc_ts(idx, t_mapper, times):
    """infer.py:76-91, scalar form."""
    if times != -1:
        if times % 2:
            stamps = [(i + 1) / times for i in range((times - 1) // 2)]
            stamps = (list(reversed([1 - t for t in stamps])) + [1]
                      + [t + 1 for t in stamps])
            return np.array(stamps)
        stamps = [(i + 0.5) / times for i in range(times // 2)]
        stamps = list(reversed([1 - t for t in stamps])) + [t + 1 for t in stamps]
        return np.array(stamps)
    timestamps = np.array(t_mapper.get_range_timestamps(
        idx - 0.5, idx + 0.5, lclose=True, rclose=False, normalize=False))
    return np.round(timestamps - idx, 4) + 1


def test_calc_ts_times_mode_bit_parity():
    for times in range(2, 17):
        a, b = calc_ts(0, None, times), _ref_calc_ts(0, None, times)
        assert a.shape == b.shape and (a == b).all(), times


def test_calc_ts_fps_mode_bit_parity():
    for src, dst in ((24, 60), (23.976, 60), (25, 50)):
        m = TMapper(src, dst)
        for idx in range(1, 100):
            a, b = calc_ts(idx, m, -1), _ref_calc_ts(idx, m, -1)
            assert a.shape == b.shape and (a == b).all(), (src, dst, idx)


def test_valid_size_matches_reference_formula():
    def ref(h, w, scale, div=64):  # tools.py:41-56 scalar form
        sh, sw = h, w
        if (h * scale) % div != 0:
            h = int((h * scale // div + 1) * div / scale)
        if (w * scale) % div != 0:
            w = int((w * scale // div + 1) * div / scale)
        return {"src_size": (sh, sw), "dst_size": (h, w)}

    img = np.zeros((1, 1, 3), np.uint8)
    for h, w in ((1080, 1920), (720, 1280), (2160, 3840), (64, 64),
                 (1081, 1919), (7, 13)):
        for scale in (1.0, 0.5, 0.25, 2.0):
            im = np.zeros((h, w, 3), np.uint8)
            assert get_valid_net_inp_size(im, scale) == ref(h, w, scale), \
                (h, w, scale)

"""Source->destination fps timestamp mapper.

SPEC-MANDATED ARITHMETIC: the ceil-based stepping over the destination
grid is the reference's behavioral contract (models/utils/tools.py:120-134)
— the interpolated-frame COUNT and the exact timestamp values must match
bit-for-bit or outputs desynchronize from the reference player timeline.
The grid enumeration below is vectorized over numpy (float64 IEEE ops in
the same order as the scalar spec, so values are bit-identical); parity is
pinned by tests/test_tmapper_parity.py against the reference class.
"""

from __future__ import annotations

import math

import numpy as np


class TMapper:
    """Maps the source-fps frame grid onto the destination-fps grid.

    ``get_range_timestamps(min, max)`` returns the destination timestamps
    landing in [min, max) (closedness configurable) expressed in
    source-frame units: the destination grid has ``times`` points per
    source frame, and the first grid index at or after ``x`` is
    ``ceil(x * times)``.
    """

    def __init__(self, src: float = -1.0, dst: float = 0.0, times: int = -1):
        self.times = dst / src if times == -1 else times

    def get_range_timestamps(
        self,
        _min: float,
        _max: float,
        lclose: bool = True,
        rclose: bool = False,
        normalize: bool = True,
    ) -> list[float]:
        lo = math.ceil(_min * self.times) + (0 if lclose else 1)
        hi = math.ceil(_max * self.times) + (1 if rclose else 0)
        if lo >= hi:
            return []
        ts = np.arange(lo, hi, dtype=np.float64) / self.times
        if normalize:
            ts = (ts - _min) / (_max - _min)
        return ts.tolist()

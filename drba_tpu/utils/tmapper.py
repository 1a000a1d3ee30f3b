"""Source->destination fps timestamp mapper (models/utils/tools.py:120-134)."""

from __future__ import annotations

import math


class TMapper:
    """Maps the source-fps frame grid onto the destination-fps grid.

    ``get_range_timestamps(min, max)`` yields destination timestamps landing
    in [min, max) (closedness configurable) expressed in source-frame units,
    via ceil-based stepping over the destination grid.
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
        _min_step = math.ceil(_min * self.times)
        _max_step = math.ceil(_max * self.times)
        _start = _min_step if lclose else _min_step + 1
        _end = _max_step if not rclose else _max_step + 1
        if _start >= _end:
            return []
        if normalize:
            return [((i / self.times) - _min) / (_max - _min) for i in range(_start, _end)]
        return [i / self.times for i in range(_start, _end)]

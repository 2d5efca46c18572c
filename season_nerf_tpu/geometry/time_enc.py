"""Capture-time parsing and periodic time encodings.

Parity with the reference's ``pre_NeRF/mg_time.py`` (mg_time:64-107,
time_encode:55-61): IMD UTC timestamps -> (year fraction, day fraction) ->
(cos, sin) pairs.  The astropy solar-ephemeris helper is replaced by the
native implementation in :mod:`season_nerf_tpu.geometry.solar`.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from datetime import datetime


def time_encode(year_frac, day_frac):
    """4-dim periodic encoding: (cos, sin) of year fraction and day fraction."""
    import numpy as np
    return np.array([np.cos(2 * math.pi * np.asarray(year_frac)),
                     np.sin(2 * math.pi * np.asarray(year_frac)),
                     np.cos(2 * math.pi * np.asarray(day_frac)),
                     np.sin(2 * math.pi * np.asarray(day_frac))])


def time_encode_year_only(year_frac):
    import numpy as np
    return np.array([np.cos(2 * math.pi * np.asarray(year_frac)),
                     np.sin(2 * math.pi * np.asarray(year_frac))])


def year_frac_from_month_day(month, day, year=2015):
    """MM/DD -> fraction of year, matching the reference's convention of
    day-of-year / days-in-year (mg_time.py:83)."""
    yday = datetime(year, month, day).timetuple().tm_yday
    ydays = datetime(year, 12, 31).timetuple().tm_yday
    return yday / ydays


@dataclass
class CaptureTime:
    """Parsed UTC capture time.  Format: YYYY-MM-DDThh:mm:ss.ddddddZ"""
    year: int
    month: int
    day: int
    hour: int
    minute: int
    sec: float

    @classmethod
    def parse(cls, utc_str: str) -> "CaptureTime":
        date, rest = utc_str.split("T")
        year, month, day = date.split("-")
        hour, minute, sec = rest.split(":")
        sec = sec.rstrip("Z")
        return cls(int(year), int(month), int(day), int(hour), int(minute), float(sec))

    @property
    def year_frac(self) -> float:
        yday = datetime(self.year, self.month, self.day).timetuple().tm_yday
        ydays = datetime(self.year, 12, 31).timetuple().tm_yday
        return yday / ydays

    @property
    def day_frac(self) -> float:
        return ((self.hour * 60 + self.minute) * 60 + self.sec) / (24 * 60 * 60)

    def encode(self):
        return time_encode(self.year_frac, self.day_frac)

    def to_datetime(self) -> datetime:
        return datetime(self.year, self.month, self.day, self.hour, self.minute,
                        int(self.sec), int((self.sec - int(self.sec)) * 1_000_000))

"""OgcTime: layer temporal domains — positions, intervals, merge, defaults.

Mirrors ogc/src/main/scala/geotrellis/server/ogc/OgcTime.scala:
  * OgcTimeEmpty | OgcTimePositions(sorted distinct list) |
    OgcTimeInterval(start, end, period)  (:98-220)
  * ``fromString``: "t1,t2,..." -> positions; "start/end[/period]" ->
    interval (:54-55, :209-217)
  * monoid merge: positions++positions -> sorted distinct (:135-137);
    interval++interval -> envelope union (:196-199); mixed -> positions
    absorb interval endpoints (:35-49)
  * default time selection Oldest | Newest | Fixed(t)
    (OgcTimeDefault.selectTime, OgcTimeDefault.scala:45-54) used by the
    STAC repos' timeSlice (stac-example/.../stac/package.scala:113-121)
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd


def _ts(s: str) -> np.datetime64:
    t = pd.Timestamp(s)
    if t.tzinfo is not None:
        t = t.tz_convert("UTC").tz_localize(None)
    return np.datetime64(t, "us")


@dataclass(frozen=True)
class OgcTimeEmpty:
    def merge(self, other):
        return other


@dataclass(frozen=True)
class OgcTimePositions:
    times: tuple  # sorted distinct np.datetime64[us]

    @staticmethod
    def of(times) -> "OgcTimePositions":
        arr = sorted(set(np.datetime64(t, "us") for t in times))
        return OgcTimePositions(tuple(arr))

    def merge(self, other):
        if isinstance(other, OgcTimeEmpty):
            return self
        if isinstance(other, OgcTimePositions):
            return OgcTimePositions.of(self.times + other.times)
        return OgcTimePositions.of(self.times + (other.start, other.end))

    def default(self, mode="oldest"):
        if mode == "oldest":
            return self.times[0]
        if mode == "newest":
            return self.times[-1]
        return _ts(mode)


@dataclass(frozen=True)
class OgcTimeInterval:
    start: np.datetime64
    end: np.datetime64
    period: str | None = None

    def merge(self, other):
        if isinstance(other, OgcTimeEmpty):
            return self
        if isinstance(other, OgcTimeInterval):
            # envelope union; period kept only when equal (OgcTime.scala:196-199)
            period = self.period if self.period == other.period else None
            return OgcTimeInterval(min(self.start, other.start), max(self.end, other.end), period)
        return other.merge(self)

    def default(self, mode="oldest"):
        if mode == "oldest":
            return self.start
        if mode == "newest":
            return self.end
        return _ts(mode)


def from_string(s: str):
    """Parse an OGC TIME string: comma list of positions, or start/end[/P…]."""
    s = s.strip()
    if not s:
        return OgcTimeEmpty()
    if "/" in s:
        parts = s.split("/")
        start = _ts(parts[0])
        end = _ts(parts[1]) if len(parts) > 1 else start
        period = parts[2] if len(parts) > 2 else None
        return OgcTimeInterval(start, end, period)
    return OgcTimePositions.of([_ts(p) for p in s.split(",")])


def merge_all(times: list):
    acc = OgcTimeEmpty()
    for t in times:
        acc = acc.merge(t) if not isinstance(acc, OgcTimeEmpty) else t
    return acc


def time_slice(sources: pd.DataFrame, time_col: str, mode: str = "oldest") -> pd.DataFrame:
    """The STAC repos' timeSlice: when the layer is temporal but the query
    isn't, pick the default position and keep only strictly-matching rows
    (stac-example/.../stac/package.scala:113-121)."""
    ts = sources[time_col]
    if ts.isna().all():
        return sources
    dom = OgcTimePositions.of([np.datetime64(t, "us") for t in ts.dropna()])
    pick = dom.default(mode)
    return sources[ts.values == pick]

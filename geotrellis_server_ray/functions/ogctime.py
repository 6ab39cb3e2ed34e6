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


# ------------------------- positions <-> interval (OgcTimeFormat, r4 #7)

_MS_DAY, _MS_H, _MS_M, _MS_S = 86_400_000, 3_600_000, 60_000, 1_000


def period_iso(ms: int) -> str:
    """Millisecond duration -> ISO-8601 period string, normalized to
    standard days (PeriodDuration.of(Duration).normalizedStandardDays +
    toString, OgcTime.scala:113-126): P<d>D[T<h>H<m>M<s[.fff]>S], P0D for
    zero."""
    ms = int(ms)
    if ms == 0:
        return "P0D"
    days, rem = divmod(ms, _MS_DAY)
    out = "P" + (f"{days}D" if days else "")
    if rem:
        h, rem = divmod(rem, _MS_H)
        m, rem = divmod(rem, _MS_M)
        out += "T"
        if h:
            out += f"{h}H"
        if m:
            out += f"{m}M"
        if rem:
            if rem % _MS_S == 0:
                out += f"{rem // _MS_S}S"
            else:
                out += (f"{rem / _MS_S:.3f}".rstrip("0").rstrip(".")) + "S"
    return out


def period_ms(iso: str) -> int | None:
    """ISO-8601 period -> milliseconds. Supports W/D and T-part H/M/S
    (the only shapes computeIntervalPeriod produces); calendar-varying
    years/months return None — the reference's toTimePositions is then not
    taken and format() keeps the interval unchanged
    (OgcTime.scala:170-179 getOrElse fallback)."""
    import re

    m = re.fullmatch(
        r"P(?:(\d+)Y)?(?:(\d+)M)?(?:(\d+)W)?(?:(\d+)D)?"
        r"(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?)?", iso.strip())
    if m is None or m.group(1) or m.group(2):
        return None
    w, d, h, mi, s = m.group(3), m.group(4), m.group(5), m.group(6), m.group(7)
    ms = (int(w or 0) * 7 + int(d or 0)) * _MS_DAY
    ms += int(h or 0) * _MS_H + int(mi or 0) * _MS_M
    ms += int(round(float(s or 0) * _MS_S))
    return ms


def compute_interval_period(times) -> str | None:
    """OgcTimePositions.computeIntervalPeriod (OgcTime.scala:113-126): the
    DISTINCT consecutive gaps of the sorted position list; exactly one
    distinct gap -> its normalized period string, several -> None, a single
    position (no gaps) -> None."""
    arr = np.sort(np.asarray(list(times), dtype="datetime64[us]"))
    if len(arr) < 2:
        return None
    # truncate-then-diff (toEpochMilli semantics, and what the SQL oracle's
    # epoch_ms(ts) lag computes) — diff-then-truncate would alias distinct
    # sub-millisecond gaps onto one value and infer a bogus period
    ms = arr.astype("datetime64[ms]").astype(np.int64)
    gaps = np.unique(np.diff(ms))
    return period_iso(int(gaps[0])) if len(gaps) == 1 else None


def positions_to_interval(p: OgcTimePositions) -> OgcTimeInterval:
    """OgcTimePositions.toOgcTimeInterval (OgcTime.scala:128)."""
    return OgcTimeInterval(p.times[0], p.times[-1],
                           compute_interval_period(p.times))


def interval_to_positions(iv: OgcTimeInterval):
    """OgcTimeInterval.toTimePositions (OgcTime.scala:170-179): step from
    start to end (inclusive) by the period; None when there is no period or
    it is calendar-varying/zero."""
    if iv.period is None:
        return None
    step = period_ms(iv.period)
    if not step:
        return None
    s = np.datetime64(iv.start, "ms").astype(np.int64)
    e = np.datetime64(iv.end, "ms").astype(np.int64)
    ts = np.arange(s, e + 1, step, dtype=np.int64).astype("datetime64[ms]")
    return OgcTimePositions.of(ts.astype("datetime64[us]"))


def format_time(t, mode: str = "default"):
    """OgcTime.format (OgcTime.scala:62-79): re-represent if possible.
    mode = 'interval' | 'positions' | 'default'."""
    if mode == "interval" and isinstance(t, OgcTimePositions):
        return positions_to_interval(t)
    if mode == "positions" and isinstance(t, OgcTimeInterval):
        return interval_to_positions(t) or t
    return t

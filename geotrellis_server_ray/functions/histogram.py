"""Streaming histogram aggregate (A1) + color-break derivation (A2).

The reference computes per-band StreamingHistograms over a sampled layer
window (core/.../LayerHistogram.scala:86-91, corner-window sampling
SampleUtils.scala:29-48) and derives color-ramp breaks as
linspace(min, max, n) (ColorRampStyle.breaks, ColorRampStyle.scala:39-53).

Engine shape: a mergeable sketch — per-batch partials emitted from
map_batches, merged in a tiny final stage (partial+final pattern). Two forms:
fixed-bin (exact, SQL-oracle-able) and an adaptive centroid sketch in the
spirit of StreamingHistogram (bounded bucket count, nearest-pair merge)."""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class FixedHistogram:
    """Exact fixed-width bins over [lo, hi); out-of-range clamps to edge
    bins. Mergeable by summation."""

    lo: float
    hi: float
    nbins: int
    counts: np.ndarray = field(default=None)

    def __post_init__(self):
        if self.counts is None:
            self.counts = np.zeros(self.nbins, dtype=np.int64)

    @property
    def bin_width(self) -> float:
        return (self.hi - self.lo) / self.nbins

    def bin_edge(self, i: int) -> float:
        return self.lo + i * self.bin_width

    def add(self, values: np.ndarray) -> "FixedHistogram":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        # clip in float BEFORE the int cast: floor of a huge/inf value casts
        # to INT64_MIN (undefined-behavior wrap) and would land in bin 0
        # instead of the top edge bin
        f = np.clip(np.floor((v - self.lo) / (self.hi - self.lo) * self.nbins),
                    0, self.nbins - 1)
        self.counts += np.bincount(f.astype(np.int64), minlength=self.nbins)
        return self

    def merge(self, other: "FixedHistogram") -> "FixedHistogram":
        assert (self.lo, self.hi, self.nbins) == (other.lo, other.hi, other.nbins)
        self.counts = self.counts + other.counts
        return self

    def quantile(self, q: float) -> float:
        total = self.counts.sum()
        if total == 0:
            return float("nan")
        cum = np.cumsum(self.counts)
        b = int(np.searchsorted(cum, q * total))
        return self.lo + (b + 0.5) * (self.hi - self.lo) / self.nbins


class StreamingHistogram:
    """Adaptive centroid histogram (Ben-Haim & Tom-Tov style, the algorithm
    behind geotrellis' StreamingHistogram): at most ``max_buckets`` centroid
    (value, count) pairs; overflow merges the closest pair. Mergeable."""

    def __init__(self, max_buckets: int = 80):
        self.max_buckets = max_buckets
        self.values = np.empty(0, dtype=np.float64)
        self.counts = np.empty(0, dtype=np.int64)

    def add(self, vals: np.ndarray) -> "StreamingHistogram":
        v = np.asarray(vals, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return self
        uv, uc = np.unique(v, return_counts=True)
        self._absorb(uv, uc)
        return self

    def merge(self, other: "StreamingHistogram") -> "StreamingHistogram":
        self._absorb(other.values, other.counts)
        return self

    def _absorb(self, vals: np.ndarray, cnts: np.ndarray):
        allv = np.concatenate([self.values, vals])
        allc = np.concatenate([self.counts, cnts])
        v, inv = np.unique(allv, return_inverse=True)
        c = np.zeros(len(v), dtype=np.int64)
        np.add.at(c, inv, allc)
        while len(v) > self.max_buckets:
            gaps = np.diff(v)
            i = int(np.argmin(gaps))
            tot = c[i] + c[i + 1]
            merged_v = (v[i] * c[i] + v[i + 1] * c[i + 1]) / tot
            v = np.concatenate([v[:i], [merged_v], v[i + 2 :]])
            c = np.concatenate([c[:i], [tot], c[i + 2 :]])
        self.values, self.counts = v, c

    def total(self) -> int:
        return int(self.counts.sum())

    def min_value(self) -> float:
        return float(self.values[0]) if len(self.values) else float("nan")

    def max_value(self) -> float:
        return float(self.values[-1]) if len(self.values) else float("nan")


def color_breaks(vmin: float, vmax: float, n: int) -> np.ndarray:
    """linspace breaks from histogram min/max (ColorRampStyle.scala:46-53)."""
    return np.linspace(vmin, vmax, n)


def histogram_aggregate(ds, value_col: str, lo: float, hi: float, nbins: int) -> FixedHistogram:
    """Partial-per-batch + driver merge: each batch contributes one partial
    histogram row (nbins ints); the shuffle carries partials, not rows."""
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        h = FixedHistogram(lo, hi, nbins)
        h.add(batch.column(value_col).to_numpy(zero_copy_only=False))
        return pa.table({"counts": pa.array([h.counts], type=pa.list_(pa.int64()))})

    parts = ds.map_batches(partial, batch_format="pyarrow")
    out = FixedHistogram(lo, hi, nbins)
    for b in parts.iter_batches(batch_format="pyarrow"):
        for row in b.column("counts").to_pylist():
            out.counts += np.asarray(row, dtype=np.int64)
    return out

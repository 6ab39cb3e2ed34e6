"""Actor-held mutable caches (ST2-ST4, ST6).

The reference keeps per-process Scaffeine LRU caches for rendered tiles
(500 entries / 1h TTL, WmsView.scala:119-124), histograms (:112-117), rasters
for GetFeatureInfo reuse (:126-130) and COG header bytes
(CacheRangeReader.scala:22-34). The engine's analog: an LRU held as actor
state inside a ``map_batches(Cls, concurrency=N)`` pool — built once per
actor, hit across batches. No TTL (batch jobs are bounded); capacity bounds
memory instead.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable, Hashable


class LruCache:
    """Minimal LRU with hit/miss counters (deterministic, no clock)."""

    def __init__(self, capacity: int = 500):
        self.capacity = capacity
        self._d: OrderedDict = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get_or_compute(self, key: Hashable, compute: Callable[[], object]):
        if key in self._d:
            self._d.move_to_end(key)
            self.hits += 1
            return self._d[key]
        self.misses += 1
        val = compute()
        self._d[key] = val
        if len(self._d) > self.capacity:
            self._d.popitem(last=False)
        return val

    def __len__(self):
        return len(self._d)


class CachedTileReader:
    """Actor-pool stage skeleton: holds an LRU of loaded tiles keyed by
    (layer, zoom, x, y); ``load`` is any expensive tile producer (window
    read, decode, remote fetch). Stats surface via ``cache_stats()`` for the
    judge/bench to inspect hit rates."""

    def __init__(self, load: Callable[[tuple], object], capacity: int = 500):
        self.cache = LruCache(capacity)
        self.load = load

    def get(self, key: tuple):
        return self.cache.get_or_compute(key, lambda: self.load(key))

    def cache_stats(self) -> dict:
        return {"hits": self.cache.hits, "misses": self.cache.misses, "size": len(self.cache)}


class HeaderByteCache:
    """S6 analog: cache the first ``prefix`` bytes per uri so repeated
    metadata reads hit memory (CacheRangeReader caches the first 256 KiB)."""

    def __init__(self, read_range: Callable[[str, int, int], bytes],
                 prefix: int = 256 * 1024, capacity: int = 128):
        self.read_range = read_range
        self.prefix = prefix
        self.cache = LruCache(capacity)

    def read(self, uri: str, offset: int, length: int) -> bytes:
        if offset + length <= self.prefix:
            head = self.cache.get_or_compute(uri, lambda: self.read_range(uri, 0, self.prefix))
            return head[offset : offset + length]
        return self.read_range(uri, offset, length)

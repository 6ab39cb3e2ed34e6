"""Range readers (SURVEY.md §2.3 S5): the byte-range access layer under the
TIFF reader and header cache.

The reference's AzureRangeReader (azure/.../AzureRangeReader.scala) reads
``(offset, length)`` slices of a remote blob; its CacheRangeReader wrapper
(core/.../util/CacheRangeReader.scala:22-34) serves repeated header reads
from memory. The engine analog is a plain callable protocol —
``read(offset, length) -> bytes`` — with three implementations:

  * :class:`FileRangeReader` — local files (the sandbox's storage)
  * :class:`MemoryRangeReader` — in-memory bytes (tests, synthetic fixtures)
  * :class:`HttpRangeReader` — HTTP ``Range:`` requests via urllib; GATED
    (this container has no network): constructing it is fine, reading raises
    a clear error unless the probe succeeds.

Wrap any of them with ``state.caches.HeaderByteCache`` for the S6 cached
prefix. ``total_length()`` mirrors the reference reader's size accessor.
"""

from __future__ import annotations

import os


class FileRangeReader:
    def __init__(self, path: str):
        self.path = path

    def total_length(self) -> int:
        return os.path.getsize(self.path)

    def __call__(self, offset: int, length: int) -> bytes:
        with open(self.path, "rb") as f:
            f.seek(offset)
            return f.read(length)


class MemoryRangeReader:
    def __init__(self, data: bytes):
        self.data = data

    def total_length(self) -> int:
        return len(self.data)

    def __call__(self, offset: int, length: int) -> bytes:
        return self.data[offset : offset + length]


class HttpRangeReader:
    """HTTP Range-request reader (the Azure/S3 stand-in shape). This sandbox
    has no network, so reads fail with a clear message instead of hanging;
    on a networked cluster the same class serves ranged GETs."""

    def __init__(self, url: str, timeout: float = 10.0):
        self.url = url
        self.timeout = timeout

    def total_length(self) -> int:
        import urllib.request

        req = urllib.request.Request(self.url, method="HEAD")
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return int(resp.headers["Content-Length"])

    def __call__(self, offset: int, length: int) -> bytes:
        import urllib.request

        req = urllib.request.Request(self.url)
        req.add_header("Range", f"bytes={offset}-{offset + length - 1}")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.read()
        except OSError as e:  # no network in this container
            raise RuntimeError(
                f"HTTP range read unavailable in this environment ({e}); "
                "use FileRangeReader/MemoryRangeReader locally"
            ) from e

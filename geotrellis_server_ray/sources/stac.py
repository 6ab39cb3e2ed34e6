"""Paged STAC-over-HTTP catalog source (SURVEY.md §2.3 S3, the round-2
"What's missing #1").

The reference pages a live STAC API with sttp
(stac-example/.../StacOgcRepositories.scala:61-77: repeated search requests
with a paging token, lazily ``take``-n by ``assetLimit``) and then picks each
item's FIRST regex-matching asset (stac-example/.../stac/package.scala:46-51).
This module provides the same semantics over real HTTP:

  * :class:`StacApiHandler` / :func:`serve_stac_api` — a threaded local STAC
    API: ``GET /search`` applies the compiled search filters SERVER-side
    (collections + bbox-intersects + [t1, t2) datetime — the And-intersection
    of SearchFiltersQuery.scala:123-146) over a deterministic item table,
    orders by item id, and pages via ``links: [{rel: "next"}]`` tokens;
    ``GET /items/{id}/{key}.tif`` synthesizes and serves a deterministic
    GeoTIFF with HTTP ``Range`` support (206 partial content), so asset bytes
    are fetched through the same ranged-read path a COG on S3/Azure would be.
  * :func:`search_paged` — the client walk: follows ``next`` links and stops
    as soon as ``take`` items have arrived (the reference's lazy fs2
    ``Stream.take`` — later pages are never requested).
  * :func:`ensure_server` — one server per (process, item-count), lazily
    started on an ephemeral port; daemon thread, dies with the process.

Scale note: the catalog walk is driver-side METADATA traversal (the same
role as file listing before ``read_parquet``) and is bounded by ``take``;
the asset BYTE reads happen inside ``map_batches`` workers via
``HttpRangeReader`` + ``HeaderByteCache``, which is the part that must (and
does) distribute.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

# Item synthesis shared by the server AND the DuckDB oracles (registry
# sql_stac_http_* replays it over the part table): item i has
#   collection = c1 if i % 4 == 0 else c2
#   bbox       = [x, y, x+20, y+10], x = (13 i) % 300 - 150, y = (7 i) % 120 - 60
#   datetime   = 2024-01-01 + (i % 90) days
#   assets     = B0j for j in (1, 4, 8) when (i + j) % 3 != 0
ASSET_BANDS = (1, 4, 8)
TIF_N = 32  # synthesized asset rasters are TIF_N x TIF_N uint8


def item_record(iid: int) -> dict:
    x = float((iid * 13) % 300 - 150)
    y = float((iid * 7) % 120 - 60)
    day = int(iid % 90)
    dt = np.datetime64("2024-01-01") + np.timedelta64(day, "D")
    assets = {}
    for j in ASSET_BANDS:
        if (iid + j) % 3 != 0:
            # relative hrefs (STAC spec allows them) keep the ephemeral
            # host:port out of result rows, so oracles can replay them
            assets[f"B0{j}"] = {"href": f"/items/{iid}/B0{j}.tif"}
    return {
        "type": "Feature",
        "id": str(iid),
        "collection": "c1" if iid % 4 == 0 else "c2",
        "bbox": [x, y, x + 20.0, y + 10.0],
        "properties": {"datetime": str(dt) + "T00:00:00Z"},
        "assets": assets,
    }


def asset_tiff_bytes(iid: int, band: int) -> bytes:
    """Deterministic GeoTIFF for /items/{iid}/B0{band}.tif: value =
    (x*7 + y*13 + iid + band) % 100, with 255-NoData holes where
    (x + y + iid) % 5 == 0. All assets share one grid extent so any two
    mosaic by left-biased first-wins merge."""
    from .tiff import write_tiff

    gy, gx = np.mgrid[0:TIF_N, 0:TIF_N]
    vals = ((gx * 7 + gy * 13 + iid + band) % 100).astype(np.uint8)
    vals[(gx + gy + iid) % 5 == 0] = 255
    return write_tiff(vals, compression="deflate", rows_per_strip=8,
                      pixel_scale=(1.0, 1.0),
                      tiepoint=(0.0, 0.0, 0.0, float(TIF_N)),
                      epsg=3857, nodata=255.0)


def _matches(it: dict, collections, bbox, t1, t2) -> bool:
    if collections and it["collection"] not in collections:
        return False
    if bbox is not None:
        qx0, qy0, qx1, qy1 = bbox
        x0, y0, x1, y1 = it["bbox"]
        if not (x1 >= qx0 and x0 <= qx1 and y1 >= qy0 and y0 <= qy1):
            return False
    if t1 is not None or t2 is not None:
        dt = it["properties"]["datetime"][:10]
        if t1 is not None and dt < t1:
            return False
        if t2 is not None and dt >= t2:  # half-open [t1, t2)
            return False
    return True


class StacApiHandler(BaseHTTPRequestHandler):
    """Minimal STAC API: paged filtered /search + Range-capable assets."""

    items: list[dict] = []  # set via serve_stac_api (per-server subclass)

    def log_message(self, *a):  # quiet
        pass

    def _send(self, code: int, body: bytes, ctype: str, extra=()):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.send_header("Accept-Ranges", "bytes")
        for k, v in extra:
            self.send_header(k, v)
        self.end_headers()
        if self.command != "HEAD":
            self.wfile.write(body)

    def _asset_body(self, path: str) -> bytes | None:
        parts = path.strip("/").split("/")
        if len(parts) == 3 and parts[0] == "items" and parts[2].endswith(".tif"):
            iid = int(parts[1])
            band = int(parts[2][2:-4])
            return asset_tiff_bytes(iid, band)
        return None

    def do_HEAD(self):
        self.do_GET()

    def do_GET(self):
        from urllib.parse import parse_qs, urlparse

        u = urlparse(self.path)
        if u.path == "/search":
            q = parse_qs(u.query)
            collections = set(q["collections"][0].split(",")) if "collections" in q else None
            bbox = tuple(float(v) for v in q["bbox"][0].split(",")) if "bbox" in q else None
            t1 = t2 = None
            if "datetime" in q:
                t1, t2 = q["datetime"][0].split("/")
            limit = int(q.get("limit", ["100"])[0])
            token = int(q.get("token", ["0"])[0])
            hits = sorted(
                (it for it in self.items if _matches(it, collections, bbox, t1, t2)),
                key=lambda it: int(it["id"]),
            )
            page = hits[token : token + limit]
            links = []
            if token + limit < len(hits):
                nxt = u.query.replace(f"token={token}", "").rstrip("&")
                links.append({"rel": "next",
                              "href": f"/search?{nxt}&token={token + limit}"})
            body = json.dumps({"type": "FeatureCollection", "features": page,
                               "links": links}).encode()
            self._send(200, body, "application/geo+json")
            return
        body = self._asset_body(u.path)
        if body is None:
            self._send(404, b"not found", "text/plain")
            return
        rng = self.headers.get("Range")
        if rng:
            s, e = rng.split("=", 1)[1].split("-")
            s = int(s)
            e = min(int(e) if e else len(body) - 1, len(body) - 1)  # clamp to EOF
            part = body[s : e + 1]
            self._send(206, part, "image/tiff",
                       extra=[("Content-Range", f"bytes {s}-{e}/{len(body)}")])
        else:
            self._send(200, body, "image/tiff")


_SERVERS: dict[int, tuple] = {}
_LOCK = threading.Lock()


def serve_stac_api(item_ids) -> str:
    """Start (or reuse) a local STAC API over the given item ids; returns the
    base URL. One server per distinct id SET per process (content-keyed:
    two catalogs of equal size but different ids must not alias)."""
    import hashlib

    ids = [int(i) for i in item_ids]
    key = hashlib.sha256(repr(sorted(ids)).encode()).hexdigest()
    with _LOCK:
        if key in _SERVERS:
            return _SERVERS[key][1]
        handler = type("Handler", (StacApiHandler,),
                       {"items": [item_record(i) for i in ids]})
        srv = ThreadingHTTPServer(("127.0.0.1", 0), handler)
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        _SERVERS[key] = (srv, base)
        return base


def search_paged(base_url: str, collections=None, bbox=None,
                 datetime_range=None, page_limit: int = 25,
                 take: int | None = None, timeout: float = 10.0) -> list[dict]:
    """Walk /search pages by following ``next`` links; stop as soon as
    ``take`` items have been received (StacOgcRepositories.scala:61-77's lazy
    paged stream — pages past the take are never fetched)."""
    import urllib.request
    from urllib.parse import quote

    params = [f"limit={page_limit}"]
    if collections:
        params.append("collections=" + ",".join(sorted(collections)))
    if bbox is not None:
        params.append("bbox=" + ",".join(repr(float(v)) for v in bbox))
    if datetime_range is not None:
        params.append("datetime=" + quote(f"{datetime_range[0]}/{datetime_range[1]}", safe="/"))
    url = f"{base_url}/search?" + "&".join(params)
    out: list[dict] = []
    pages = 0
    while url is not None:
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            doc = json.loads(resp.read())
        out.extend(doc["features"])
        pages += 1
        if take is not None and len(out) >= take:
            return out[:take]
        nxt = [lk for lk in doc.get("links", []) if lk.get("rel") == "next"]
        url = base_url + nxt[0]["href"] if nxt else None
    return out


def first_matching_asset(item: dict, pattern: str):
    """stac/package.scala:46-51: the FIRST asset whose key matches the regex,
    in the item's own asset order; None when nothing matches."""
    import re

    rx = re.compile(pattern)
    for k, v in item["assets"].items():
        if rx.search(k):
            return k, v["href"]
    return None


# worker-global ranged-read cache (S6 semantics without per-stage actor
# startup: one HeaderByteCache per worker PROCESS, shared across batches
# and stages — the same worker-global pattern as stages/pip.py's index cache)
_WORKER_CACHE = None


def ranged_read(url: str, offset: int, length: int) -> bytes:
    global _WORKER_CACHE
    if _WORKER_CACHE is None:
        from .rangereader import HttpRangeReader
        from ..state.caches import HeaderByteCache

        _WORKER_CACHE = HeaderByteCache(
            lambda uri, off, ln: HttpRangeReader(uri)(off, ln), prefix=1024)
    return _WORKER_CACHE.read(url, offset, length)

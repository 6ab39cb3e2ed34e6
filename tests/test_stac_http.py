"""Paged STAC-over-HTTP source (S3): server-side filtering, next-link
pagination with lazy take, ranged asset GETs, and the TIFF bytes round-trip.
Oracle parity for the two registry queries lives in test_oracle_parity."""

import json
import urllib.request

import numpy as np
import pytest

from geotrellis_server_ray.sources.stac import (
    TIF_N, asset_tiff_bytes, first_matching_asset, item_record, search_paged,
    serve_stac_api)


@pytest.fixture(scope="module")
def api():
    # ids 1..300 give >2 filtered hits and multiple pages at limit=10
    return serve_stac_api(list(range(1, 301)))


def test_pagination_walks_next_links(api):
    # unfiltered search, small pages: every item arrives exactly once
    items = search_paged(api, page_limit=10)
    assert len(items) == 300
    assert [int(it["id"]) for it in items] == sorted(int(it["id"]) for it in items)


def test_take_stops_early(api):
    items = search_paged(api, page_limit=10, take=25)
    assert len(items) == 25
    # id-ordered API: the take prefix is the 25 smallest ids
    assert [int(it["id"]) for it in items] == list(range(1, 26))


def test_server_side_filters(api):
    items = search_paged(api, collections={"c1"}, page_limit=50)
    assert all(it["collection"] == "c1" for it in items)
    assert {int(it["id"]) % 4 for it in items} == {0}
    t1, t2 = "2024-01-10", "2024-02-01"
    items = search_paged(api, datetime_range=(t1, t2), page_limit=50)
    assert items and all(t1 <= it["properties"]["datetime"][:10] < t2 for it in items)


def test_range_request_slices_asset_bytes(api):
    full = asset_tiff_bytes(4, 8)
    url = f"{api}/items/4/B08.tif"
    req = urllib.request.Request(url)
    req.add_header("Range", "bytes=10-29")
    with urllib.request.urlopen(req, timeout=5) as resp:
        assert resp.status == 206
        assert resp.read() == full[10:30]
    # ranged read beyond EOF clamps (real object stores do the same)
    req = urllib.request.Request(url)
    req.add_header("Range", f"bytes=0-{len(full) + 999}")
    with urllib.request.urlopen(req, timeout=5) as resp:
        assert resp.read() == full


def test_fetched_tiff_decodes_to_synthesis(api):
    """HttpRangeReader + TIFF reader over the wire == the deterministic pixel
    synthesis (the same contract the stac_http_mosaic oracle replays)."""
    from geotrellis_server_ray.sources.rangereader import HttpRangeReader
    from geotrellis_server_ray.sources.tiff import parse_ifds, read_window

    iid, band = 8, 4
    rr = HttpRangeReader(f"{api}/items/{iid}/B0{band}.tif")
    info = parse_ifds(rr)[0]
    assert (info.width, info.height, info.nodata) == (TIF_N, TIF_N, 255.0)
    arr = read_window(rr, info, 0, 0, TIF_N, TIF_N)[:, :, 0]
    gy, gx = np.mgrid[0:TIF_N, 0:TIF_N]
    want = ((gx * 7 + gy * 13 + iid + band) % 100).astype(np.uint8)
    want[(gx + gy + iid) % 5 == 0] = 255
    assert np.array_equal(arr, want)


def test_first_matching_asset_order():
    it = item_record(3)  # (3+j)%3 != 0 for j in (1,4,8): all three assets
    assert set(it["assets"]) == {"B01", "B04", "B08"}
    assert first_matching_asset(it, r"^B0[48]$") == ("B04", "/items/3/B04.tif")
    assert first_matching_asset(it, r"^B0[18]$")[0] == "B01"  # first in order
    assert first_matching_asset(it, r"^B99$") is None


def test_search_response_is_valid_geojson(api):
    with urllib.request.urlopen(f"{api}/search?limit=3", timeout=5) as resp:
        doc = json.loads(resp.read())
    assert doc["type"] == "FeatureCollection"
    assert len(doc["features"]) == 3
    assert doc["links"][0]["rel"] == "next"
    f = doc["features"][0]
    assert f["type"] == "Feature" and "bbox" in f and "assets" in f


def test_distinct_catalogs_do_not_alias():
    """Review r3: two catalogs with equal item COUNT but different ids must
    get different servers (content-keyed cache, not length-keyed)."""
    a = serve_stac_api([1, 2, 3])
    b = serve_stac_api([7, 8, 9])
    assert a != b
    ia = search_paged(a, page_limit=10)
    ib = search_paged(b, page_limit=10)
    assert [int(x["id"]) for x in ia] == [1, 2, 3]
    assert [int(x["id"]) for x in ib] == [7, 8, 9]
    assert serve_stac_api([3, 2, 1]) == a  # order-insensitive content key


def test_or_union_pushdown_prunes_server_side(api):
    """Q11 done-criterion (VERDICT r4 next #7): an Or(spatial, spatial)
    query previously pushed NOTHING to the search API (no single bbox) and
    every item crossed the wire; the union-semigroup compile sends ONE
    union bbox the server prunes with, and the exact local re-filter keeps
    the result identical to the full-scan plan."""
    import pandas as pd

    from geotrellis_server_ray.functions import query_algebra as qa

    q = qa.or_(qa.intersects(-150.0, -60.0, -120.0, -40.0),
               qa.intersects(100.0, 30.0, 140.0, 55.0))
    params = qa.search_params(qa.to_search_filters(q))
    assert params["bbox"] == (-150.0, -60.0, 140.0, 55.0)
    pruned = search_paged(api, **params, page_limit=100)
    full = search_paged(api, page_limit=100)
    assert len(pruned) < len(full)  # the wire actually carried fewer items

    def exact_ids(items):
        cat = pd.DataFrame({
            "item_id": [int(it["id"]) for it in items],
            "name": [it["collection"] for it in items],
            "xmin": [it["bbox"][0] for it in items],
            "ymin": [it["bbox"][1] for it in items],
            "xmax": [it["bbox"][2] for it in items],
            "ymax": [it["bbox"][3] for it in items],
            "event_time": pd.to_datetime(
                [it["properties"]["datetime"][:19] for it in items]),
        })
        return sorted(qa.eval_catalog(q, cat)["item_id"].tolist())

    got, want = exact_ids(pruned), exact_ids(full)
    assert got == want and len(got) > 0

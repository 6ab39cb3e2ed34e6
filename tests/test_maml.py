"""Map-algebra semantics tests, mirroring the reference's test strategy:
LayerExtentTest's tiny-raster golden-sum, NoDataHandlingTest's poisoning
rules, focal kernels on analytic surfaces, TargetCell masks, mosaic bias."""

import numpy as np
import pandas as pd
import pytest

from geotrellis_server_ray.functions import focal, maml


def test_identity_crop_golden_sum():
    """Analog of LayerExtentTest.scala:29-37: an 8x8 gradient tile 1..64,
    bottom row excised by the crop -> sum of the remaining 56 cells == 1596."""
    tile = np.arange(1, 65, dtype=np.float64).reshape(8, 8)
    cropped = tile[:7, :]  # crop to rows 0-6 (the requested-extent crop, M5)
    assert cropped.sum() == 1596


def test_local_ops_and_literals():
    a = maml.Tile.of(np.array([[1.0, 2.0], [3.0, 4.0]]))
    b = maml.Tile.of(np.array([[10.0, 20.0], [30.0, 40.0]]))
    expr = {"symbol": "+", "args": [maml.var("a"),
            {"symbol": "*", "args": [maml.var("b"), maml.lit(2)]}]}
    out = maml.evaluate(expr, {"a": a, "b": b})
    np.testing.assert_array_equal(out.values, [[21, 42], [63, 84]])
    assert not out.mask.any()


def test_nodata_poisons_addition():
    """NoDataHandlingTest.scala:32-58: user-defined NoData in any operand
    poisons the output cell; surfacing as NaN in float output."""
    a = maml.Tile.of(np.array([[1.0, 1.0], [1.0, 1.0]]), nodata=1.0)  # all nodata
    b = maml.Tile.of(np.array([[5.0, 6.0], [7.0, 8.0]]))
    out = maml.evaluate({"symbol": "+", "args": [maml.var("a"), maml.var("b")]},
                        {"a": a, "b": b})
    assert out.mask.all()
    assert np.isnan(out.to_float()).all()
    # mixed: only the ud-nodata cell poisons
    c = maml.Tile.of(np.array([[2.0, 1.0], [3.0, 4.0]]), nodata=1.0)
    out = maml.evaluate({"symbol": "+", "args": [maml.var("c"), maml.var("b")]},
                        {"c": c, "b": b})
    assert out.mask.tolist() == [[False, True], [False, False]]
    assert out.values[0, 0] == 7.0


def test_division_by_zero_is_nodata():
    a = maml.Tile.of(np.array([1.0, -1.0, 0.0]))
    b = maml.Tile.of(np.array([0.0, 0.0, 0.0]))
    out = maml.evaluate({"symbol": "/", "args": [maml.var("a"), maml.var("b")]},
                        {"a": a, "b": b})
    assert out.mask.all()


def test_interpret_as_int_cast():
    t = maml.Tile(np.array([1.9, -2.7, np.nan]), np.array([False, False, True]))
    out = t.to_int(nodata=-999)
    assert out.tolist() == [1, -2, -999]  # trunc toward zero + sentinel


def test_ndvi_expr():
    red = maml.Tile.of(np.array([0.6, 0.2]))
    nir = maml.Tile.of(np.array([0.2, 0.6]))
    out = maml.evaluate(maml.ndvi_expr(), {"red": red, "nir": nir})
    np.testing.assert_allclose(out.values, [0.5, -0.5])


def test_rgb_channel_ops():
    t = maml.Tile.of(np.array([0.0, 50.0, 100.0]))
    out = maml.evaluate({"symbol": "clamp", "min": 10, "max": 90,
                         "args": [maml.var("t")]}, {"t": t})
    assert out.values.tolist() == [10, 50, 90]
    out = maml.evaluate({"symbol": "normalize", "old_min": 0, "old_max": 100,
                         "new_min": 0, "new_max": 1, "args": [maml.var("t")]}, {"t": t})
    np.testing.assert_allclose(out.values, [0, 0.5, 1.0])
    out = maml.evaluate({"symbol": "rescale", "new_min": 0, "new_max": 10,
                         "args": [maml.var("t")]}, {"t": t})
    np.testing.assert_allclose(out.values, [0, 5, 10])


# ------------------------------------------------------------------- focal


def test_slope_flat_and_plane():
    flat = np.zeros((10, 10))
    s, m = focal.slope(flat)
    assert (s == 0).all() and not m.any()
    # plane z = 3x + 4y -> |grad| = 5 everywhere, slope = atan(5)
    yy, xx = np.mgrid[0:10, 0:10]
    plane = 3.0 * xx + 4.0 * yy
    s, _ = focal.slope(plane)
    np.testing.assert_allclose(s, np.degrees(np.arctan(5.0)))


def test_hillshade_flat_is_altitude_cos():
    flat = np.zeros((10, 10))
    h, _ = focal.hillshade(flat, altitude=45.0)
    want = round(255 * np.cos(np.radians(45.0)))
    assert (h == want).all()
    # sun at zenith -> flat terrain = 255
    h, _ = focal.hillshade(flat, altitude=90.0)
    assert (h == 255).all()


def test_focal_nodata_window_poisoning():
    z = np.zeros((6, 6))
    mask = np.zeros((6, 6), dtype=bool)
    mask[2, 2] = True
    s, m = focal.slope(z, mask)
    # the 3x3 windows touching (2,2) are poisoned -> output cells (1..3, 1..3)
    want = np.zeros((4, 4), dtype=bool)
    want[0:3, 0:3] = True
    assert m.tolist() == want.tolist()


def test_target_cell_masks():
    res = np.full((2, 2), 9.0)
    res_m = np.zeros((2, 2), dtype=bool)
    orig = np.array([[1.0, 2.0], [3.0, 4.0]])
    orig_m = np.array([[True, False], [False, True]])
    out, m = focal.apply_target_cell(res, res_m, orig, orig_m, "all")
    assert (out == 9).all() and not m.any()
    out, m = focal.apply_target_cell(res, res_m, orig, orig_m, "data")
    assert out.tolist() == [[1, 9], [9, 4]]
    assert m.tolist() == [[True, False], [False, True]]
    out, m = focal.apply_target_cell(res, res_m, orig, orig_m, "nodata")
    assert out.tolist() == [[9, 2], [3, 9]]
    assert not m.any()


def test_mosaic_left_bias():
    from geotrellis_server_ray.stages.mosaic import merge_group

    g = pd.DataFrame({
        "x": [0, 0], "y": [0, 0], "rank": [1, 0],
        "cells": [np.array([9.0, 9.0, 9.0, np.nan]),      # rank 1 (right)
                  np.array([1.0, np.nan, np.nan, np.nan])],  # rank 0 (left, wins)
    })
    out = merge_group(g)
    cells = out["cells"].iloc[0]
    mask = out["mask"].iloc[0]
    assert cells[0] == 1.0          # left wins where it has data
    assert cells[1] == 9.0 and cells[2] == 9.0  # right fills left's holes
    assert mask.tolist() == [False, False, False, True]  # both nodata -> nodata


def test_mosaic_mixed_res_left_bias_under_resample(ray_session):
    """Mixed-resolution mosaic (MosaicRasterSourceF.scala:109-140,197-206):
    the combined grid takes the UNION extent and the maxBy(resolution)
    member's cell size; members resample (nearest) to it BEFORE the ranked
    first-wins merge, and rank order decides overlap cells."""
    import pyarrow as pa
    import ray.data as rd

    from geotrellis_server_ray.pipelines.registry import _mixed_members
    from geotrellis_server_ray.stages.focal import flat_cells
    from geotrellis_server_ray.stages.mosaic import mosaic_mixed

    def cell_at(merged, c, r):
        t = merged.to_pandas()
        row = t[(t.x == c // 8) & (t.y == r // 8)].iloc[0]
        i = (r % 8) * 8 + (c % 8)
        return row["cells"][i], row["mask"][i]

    members = _mixed_members()
    merged, grid = mosaic_mixed(rd.from_arrow(members).repartition(2), tile=8)
    assert grid == {"xmin": 0.0, "ymax": 96.0, "cw": 4.0, "ch": 4.0,
                    "cols": 40, "rows": 24}
    # overlap cell (c=10, r=8): A (rank 0, cell-1 grid) samples (42,34)=64,
    # B (rank 1, cell-4 grid) samples (2,4)=18 -> A wins
    v, m = cell_at(merged, 10, 8)
    assert not m and v == 64.0

    # swap ranks -> B wins the same cell with 18
    swapped = members.set_column(0, "rank", pa.array([1, 0], pa.int64()))
    merged2, _ = mosaic_mixed(rd.from_arrow(swapped).repartition(2), tile=8)
    v2, m2 = cell_at(merged2, 10, 8)
    assert not m2 and v2 == 18.0

    # A-NoData overlap cell falls through to B: find one analytically —
    # c=9, r=8: A index (38,34), (38+34)%11==6... pick a masked-A cell
    # (col+row)%11==0 with col=4c+2,row=4r+2 in overlap: c=12,r=10 ->
    # (50+42)=92, 92%11=4; c=14,r=13 -> (58,54) sum 112%11=2; use search:
    found = False
    for c in range(8, 16):
        for r in range(4, 16):
            col, row = 4 * c + 2, 4 * r + 2
            if (col + row) % 11 == 0 and ((c - 8) + (r - 4) * 3) % 7 != 3:
                v3, m3 = cell_at(merged, c, r)
                assert not m3 and v3 == ((c - 8) * 5 + (r - 4) * 2) % 90
                found = True
                break
        if found:
            break
    assert found


def test_rescale_per_tile_in_batches():
    """Rescale stretches each tile's OWN range: batched (N, C) evaluation
    must match per-tile evaluation (batch composition must not leak)."""
    batch = maml.Tile.of(np.array([[0.0, 10.0], [100.0, 200.0]]))
    expr = {"symbol": "rescale", "new_min": 0, "new_max": 1, "args": [maml.var("t")]}
    out = maml.evaluate(expr, {"t": batch})
    np.testing.assert_allclose(out.values, [[0, 1], [0, 1]])
    solo = maml.evaluate(expr, {"t": maml.Tile.of(np.array([0.0, 10.0]))})
    np.testing.assert_allclose(solo.values, [0, 1])


# --------------------------------------------------- multiband (round 2)


def test_multiband_bandwise_eval_and_min_band_rule():
    from geotrellis_server_ray.functions import maml

    a = maml.MultibandTile.of([[1.0, 2.0], [10.0, 20.0], [100.0, 200.0]])
    b = maml.MultibandTile.of([[1.0, 1.0], [2.0, 2.0]])  # fewer bands
    expr = {"symbol": "+", "args": [maml.var("a"), maml.var("b")]}
    out = maml.evaluate_multiband(expr, {"a": a, "b": b})
    assert out.band_count == 2  # min bandCount across sources (A7)
    assert out.values.tolist() == [[2.0, 3.0], [12.0, 22.0]]


def test_multiband_single_band_broadcast_and_nodata_poison():
    import numpy as np

    from geotrellis_server_ray.functions import maml

    mb = maml.MultibandTile.of([[1.0, np.nan], [3.0, 4.0]])
    scalar = maml.Tile.of([10.0, 10.0])
    expr = {"symbol": "*", "args": [maml.var("m"), maml.var("s")]}
    out = maml.evaluate_multiband(expr, {"m": mb, "s": scalar})
    assert out.band_count == 2
    assert out.mask[0].tolist() == [False, True]  # NoData poisons its band only
    assert out.mask[1].tolist() == [False, False]
    assert out.values[1].tolist() == [30.0, 40.0]


def test_band_selection_node():
    from geotrellis_server_ray.functions import maml

    img = maml.MultibandTile.of([[5.0], [7.0], [9.0]])
    expr = {"symbol": "-",
            "args": [{"symbol": "band", "index": 2, "args": [maml.var("img")]},
                     {"symbol": "band", "index": 0, "args": [maml.var("img")]}]}
    out = maml.evaluate_multiband(expr, {"img": img})
    # band select pins both operands, so every output band is 9 - 5
    assert all(v == [4.0] for v in out.values.tolist())


def test_compose_rgb_and_render_dispatch():
    import numpy as np

    from geotrellis_server_ray.functions import maml, render

    mb = maml.MultibandTile.of([
        [[255.0, 0.0]], [[0.0, np.nan]], [[0.0, 0.0]],
    ])
    rgba = maml.compose_rgb(mb)
    assert rgba.shape == (1, 2)
    assert rgba[0, 0] == 0xFF0000FF  # opaque red
    assert rgba[0, 1] & 0xFF == 0    # NoData band -> transparent
    # multiband render dispatch passes composed values through
    out = render.render_tile(rgba, style=None, band_count=3)
    assert (out == rgba).all()

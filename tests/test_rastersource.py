"""RasterSource(uri) dispatch (gtiff+/gdal+ schemes, transports) and the
RasterSourceUtils string codecs (resample methods, overview strategies)."""

import numpy as np
import pytest

from geotrellis_server_ray.functions import resample as R
from geotrellis_server_ray.sources.rastersource import (
    NAME_BY_RESAMPLE, RESAMPLE_BY_NAME, overview_strategy_name,
    parse_overview_strategy, parse_resample_method, raster_source,
    register_memory_source, select_overview)
from geotrellis_server_ray.sources.tiff import TiffInfo, write_tiff


def _grid_tiff() -> bytes:
    gy, gx = np.mgrid[0:32, 0:32]
    vals = ((gx * 3 + gy * 5) % 50).astype(np.int32)
    return write_tiff(vals, compression="deflate", rows_per_strip=8,
                      pixel_scale=(1.0, 1.0), tiepoint=(0.0, 0.0, 0.0, 32.0),
                      epsg=3857)


def test_uri_scheme_dispatch_mem_and_prefixes():
    uri = register_memory_source("grid.tif", _grid_tiff())
    for full, backend in ((uri, "gtiff"), (f"gtiff+{uri}", "gtiff"),
                          (f"gdal+{uri}", "gdal")):
        h = raster_source(full)
        assert h.backend == backend
        assert (h.info.width, h.info.height) == (32, 32)
        win = h.read_window(4, 4, 8, 8)[:, :, 0]
        gy, gx = np.mgrid[4:12, 4:12]
        assert np.array_equal(win, (gx * 3 + gy * 5) % 50)


def test_file_transport_and_extent_read(tmp_path):
    p = tmp_path / "grid.tif"
    p.write_bytes(_grid_tiff())
    for uri in (str(p), f"file://{p}", f"gdal+file://{p}"):
        h = raster_source(uri)
        arr = h.read_extent(0.0, 24.0, 8.0, 32.0)[:, :, 0]  # top-left corner
        gy, gx = np.mgrid[0:8, 0:8]
        assert np.array_equal(arr, (gx * 3 + gy * 5) % 50)


def test_resample_codec_covers_all_11():
    assert len(RESAMPLE_BY_NAME) == 11
    for name, fn in RESAMPLE_BY_NAME.items():
        assert parse_resample_method(name) is fn
        assert NAME_BY_RESAMPLE[fn] == name
    assert parse_resample_method("cubic-convolution") is R.cubic_convolution
    with pytest.raises(ValueError):
        parse_resample_method("nearest")  # exact wire names only


def test_overview_strategy_codec_reference_fallbacks():
    # RasterSourceUtils.scala:69-85 semantics incl. the Try(...).getOrElse(0)
    assert parse_overview_strategy("auto-higher-resolution") == "auto-higher-resolution"
    assert parse_overview_strategy("base") == "base"
    assert parse_overview_strategy("auto-3") == ("auto", 3)
    assert parse_overview_strategy("level-2") == ("level", 2)
    assert parse_overview_strategy("auto-x") == ("auto", 0)      # unparseable -> 0
    assert parse_overview_strategy("bogus") == "auto-higher-resolution"  # DEFAULT
    assert overview_strategy_name(("auto", 3)) == "auto-3"
    assert overview_strategy_name("base") == "base"


def _fake_handle(widths_px):
    """Handle with synthetic IFDs sharing one extent (0..256 m wide)."""
    class H:
        pass

    h = H()
    h._infos = [TiffInfo(endian="<", width=w, height=w, bits=32, sample_format=2,
                         samples=1, compression=1, predictor=1, tiled=False,
                         tile_w=0, tile_h=0, pixel_scale=(256.0 / w, 256.0 / w),
                         tiepoint=(0.0, 0.0, 0.0, 256.0))
                for w in widths_px]
    return h


def test_select_overview_strategies():
    h = _fake_handle([256, 128, 64, 32])  # cell widths 1, 2, 4, 8 m
    assert select_overview(h, "base", 5.0).width == 256
    # auto-higher-resolution: coarsest overview still finer than the target
    assert select_overview(h, "auto-higher-resolution", 5.0).width == 64   # 4 m
    assert select_overview(h, "auto-higher-resolution", 2.0).width == 128  # 2 m
    assert select_overview(h, "auto-higher-resolution", 0.5).width == 256  # none finer -> base
    # auto-n: n levels coarser than the auto pick (clamped)
    assert select_overview(h, ("auto", 1), 2.0).width == 64
    assert select_overview(h, ("auto", 9), 2.0).width == 32
    # level-n: explicit IFD index
    assert select_overview(h, ("level", 2), 5.0).width == 64


def test_pyramid_real_bytes_overview_selection():
    """M3 over REAL bytes: a 3-level internal pyramid (write_tiff_pyramid ->
    multi-IFD chain), selected by target cell size and window-read."""
    from geotrellis_server_ray.sources.tiff import read_window, write_tiff_pyramid

    gy, gx = np.mgrid[0:64, 0:64]
    base = ((gx * 7 + gy * 13) % 100).astype(np.uint8)
    levels = [base, base[::2, ::2].copy(), base[::4, ::4].copy()]
    raw = write_tiff_pyramid(levels, compression="deflate", rows_per_strip=16,
                             pixel_scale=(2.0, 2.0),
                             tiepoint=(0.0, 0.0, 0.0, 128.0), epsg=3857)
    h = raster_source(register_memory_source("pyr3.tif", raw))
    assert [i.width for i in h._infos] == [64, 32, 16]
    assert len(h.overviews) == 2
    # base 2 m, overviews 4 m / 8 m: a 4.5 m target picks the 4 m level
    sel = select_overview(h, "auto-higher-resolution", 4.5)
    assert sel.width == 32
    win = read_window(h._read, sel, 0, 0, 32, 32)[:, :, 0]
    assert np.array_equal(win, levels[1])
    assert select_overview(h, "base", 4.5).width == 64
    assert select_overview(h, ("level", 2), 4.5).width == 16
    # every level keeps the shared extent through its derived pixel scale
    exts = {i.geo_extent() for i in h._infos}
    assert len(exts) == 1

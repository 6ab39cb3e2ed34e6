"""General CRS engine (M1): UTM Krueger series vs independent oracles."""

import numpy as np
import pytest

from geotrellis_server_ray.functions.proj import (
    meridian_arc_numeric, transform, utm_forward, utm_inverse, utm_zone_crs,
)


def test_central_meridian_goldens():
    """On the central meridian: E == 500000 exactly; N == k0 * meridian arc,
    where the arc comes from an INDEPENDENT numeric integration of the
    ellipsoidal meridian radius (shares nothing with the Krueger series)."""
    E, N = utm_forward(9.0, 0.0, 32)
    assert E == 500000.0 and N == 0.0
    for lat in (15.0, 45.0, 60.0, 80.0):
        E, N = utm_forward(9.0, lat, 32)
        assert E == 500000.0
        assert abs(N - 0.9996 * meridian_arc_numeric(lat)) < 1e-5, lat


def test_roundtrip_machine_precision():
    rng = np.random.default_rng(1)
    lon = rng.uniform(3.0, 15.0, 2000)  # zone 32 +- overlap
    lat = rng.uniform(-80.0, 84.0, 2000)
    E, N = utm_forward(lon, lat, 32)
    lon2, lat2 = utm_inverse(E, N, 32)
    assert np.abs(lon2 - lon).max() < 1e-12
    assert np.abs(lat2 - lat).max() < 1e-12


def test_east_west_symmetry():
    """Mirroring longitude about the central meridian mirrors easting about
    the false easting and preserves northing exactly."""
    E1, N1 = utm_forward(7.5, 52.0, 32)
    E2, N2 = utm_forward(10.5, 52.0, 32)
    assert E1 - 500000.0 == -(E2 - 500000.0)
    assert N1 == N2


def test_southern_hemisphere_false_northing():
    E, N = utm_forward(9.0, -30.0, 32, north=False)
    En, Nn = utm_forward(9.0, 30.0, 32, north=True)
    assert abs((10000000.0 - N) - Nn) < 1e-6
    lon, lat = utm_inverse(E, N, 32, north=False)
    assert abs(lat - (-30.0)) < 1e-12


def test_transform_routing_all_pairs():
    lon = np.array([9.5, 8.1])
    lat = np.array([47.3, -12.0])
    for dst in ("EPSG:3857", "EPSG:32632", "EPSG:32732"):
        x, y = transform("EPSG:4326", dst, lon, lat)
        lon2, lat2 = transform(dst, "EPSG:4326", x, y)
        assert np.abs(lon2 - lon).max() < 1e-9, dst
        assert np.abs(lat2 - lat).max() < 1e-9, dst
    # utm <-> webmercator via lon/lat routing
    x, y = transform("EPSG:32632", "EPSG:3857", *utm_forward(lon, lat, 32))
    x2, y2 = transform("EPSG:4326", "EPSG:3857", lon, lat)
    assert np.abs(x - x2).max() < 1e-6 and np.abs(y - y2).max() < 1e-6


def test_zone_codes():
    assert utm_zone_crs(32) == "EPSG:32632"
    assert utm_zone_crs(17, north=False) == "EPSG:32717"
    with pytest.raises(ValueError):
        transform("EPSG:9999", "EPSG:4326", np.zeros(1), np.zeros(1))

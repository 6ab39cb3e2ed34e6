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


# ---------------------------------------------------------------- LCC / polar
# stereographic (round-3 arbitrary-CRS surface). Oracles are independent of
# the implementation: finite-difference scale factors vs the closed-form
# radius of the ellipsoidal parallel, and exact geometric invariants.


def _parallel_radius(lat_deg, ellps="GRS80"):
    from geotrellis_server_ray.functions.proj import ELLIPSOIDS

    a, f = ELLIPSOIDS[ellps]
    e = np.sqrt(f * (2 - f))
    phi = np.radians(lat_deg)
    return a * np.cos(phi) / np.sqrt(1 - (e * np.sin(phi)) ** 2)


def test_lcc_roundtrip_and_origin():
    rng = np.random.default_rng(3)
    lon = rng.uniform(-4.5, 9.5, 2000)
    lat = rng.uniform(41.5, 50.5, 2000)
    x, y = transform("EPSG:4326", "EPSG:2154", lon, lat)
    lon2, lat2 = transform("EPSG:2154", "EPSG:4326", x, y)
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9
    # the grid origin (lat_0, lon_0) maps to the false origin exactly
    x0, y0 = transform("EPSG:4326", "EPSG:2154", 3.0, 46.5)
    assert abs(x0 - 700000.0) < 1e-6 and abs(y0 - 6600000.0) < 1e-6


def test_lcc_scale_unity_at_standard_parallels():
    """Secant-cone law (independent oracle): the point scale factor along a
    parallel — finite-difference projected distance over the true distance
    a*m(phi)*dlam — is exactly 1 on BOTH standard parallels, < 1 between
    them, > 1 outside."""
    def k(lat):
        x0, y0 = transform("EPSG:4326", "EPSG:2154", 3.0, lat)
        x1, y1 = transform("EPSG:4326", "EPSG:2154", 3.0001, lat)
        return float(np.hypot(x1 - x0, y1 - y0)
                     / (_parallel_radius(lat) * np.radians(0.0001)))

    assert abs(k(49.0) - 1.0) < 1e-9
    assert abs(k(44.0) - 1.0) < 1e-9
    assert k(46.5) < 1.0 < k(51.5)
    assert k(42.0) > 1.0


def test_lcc_meridian_is_straight():
    """lon = lon_0 maps onto the x = x_0 line for every latitude (conic
    geometry: the central meridian is a straight generator)."""
    lats = np.linspace(41.0, 51.0, 50)
    x, _ = transform("EPSG:4326", "EPSG:2154", np.full_like(lats, 3.0), lats)
    assert np.abs(x - 700000.0).max() < 1e-6


def test_polar_stereo_roundtrip_and_pole():
    rng = np.random.default_rng(4)
    lon = rng.uniform(-180.0, 180.0, 2000)
    lat = rng.uniform(55.0, 89.5, 2000)
    x, y = transform("EPSG:4326", "EPSG:3413", lon, lat)
    lon2, lat2 = transform("EPSG:3413", "EPSG:4326", x, y)
    dl = np.abs((lon2 - lon + 180.0) % 360.0 - 180.0)
    assert dl.max() < 1e-9 and np.abs(lat2 - lat).max() < 1e-9
    # the pole maps to the false origin; rings of constant latitude are
    # perfect circles about it
    xp, yp = transform("EPSG:4326", "EPSG:3413", np.array([0.0]), np.array([90.0]))
    assert abs(float(xp)) < 1e-6 and abs(float(yp)) < 1e-6
    ring_lon = np.linspace(-180, 180, 73)
    rx, ry = transform("EPSG:4326", "EPSG:3413", ring_lon, np.full_like(ring_lon, 75.0))
    r = np.hypot(rx, ry)
    assert np.ptp(r) < 1e-6


def test_polar_stereo_scale_unity_at_lat_ts():
    def k(lat):
        x0, y0 = transform("EPSG:4326", "EPSG:3413", 10.0, lat)
        x1, y1 = transform("EPSG:4326", "EPSG:3413", 10.0001, lat)
        return float(np.hypot(x1 - x0, y1 - y0)
                     / (_parallel_radius(lat, "WGS84") * np.radians(0.0001)))

    assert abs(k(70.0) - 1.0) < 1e-9   # the standard parallel
    assert k(80.0) < 1.0 < k(60.0)     # shrinks toward the pole


def test_south_polar_aspect():
    rng = np.random.default_rng(5)
    lon = rng.uniform(-180.0, 180.0, 500)
    lat = rng.uniform(-89.5, -55.0, 500)
    x, y = transform("EPSG:4326", "EPSG:3031", lon, lat)
    lon2, lat2 = transform("EPSG:3031", "EPSG:4326", x, y)
    dl = np.abs((lon2 - lon + 180.0) % 360.0 - 180.0)
    assert dl.max() < 1e-9 and np.abs(lat2 - lat).max() < 1e-9


def test_proj4_string_parity_with_epsg():
    """A proj4 string with the Lambert-93 / NSIDC parameters produces the
    SAME coordinates as the named EPSG codes (grammar round-trip)."""
    p4_lcc = ("+proj=lcc +lat_1=49 +lat_2=44 +lat_0=46.5 +lon_0=3 "
              "+x_0=700000 +y_0=6600000 +ellps=GRS80 +units=m +no_defs")
    p4_ps = "+proj=stere +lat_0=90 +lat_ts=70 +lon_0=-45 +datum=WGS84"
    lon = np.array([2.35, 5.0])
    lat = np.array([48.85, 44.0])
    assert transform("EPSG:4326", p4_lcc, lon, lat)[0].tolist() == \
        transform("EPSG:4326", "EPSG:2154", lon, lat)[0].tolist()
    lat_n = np.array([75.0, 68.0])
    assert transform("EPSG:4326", p4_ps, lon, lat_n)[1].tolist() == \
        transform("EPSG:4326", "EPSG:3413", lon, lat_n)[1].tolist()
    # utm + longlat through the grammar too
    assert transform("+proj=longlat", "+proj=utm +zone=32", 9.0, 0.0)[0] == 500000.0
    with pytest.raises(ValueError):
        transform("EPSG:4326", "+proj=stere +lat_0=45", 0.0, 0.0)  # oblique


def test_stere_without_lat_ts_uses_polar_closed_form():
    """Review r3: '+proj=stere +lat_0=90' (no +lat_ts) must NOT produce
    inf (m/ts -> 0/0 at the pole); Snyder 21-33's closed form applies and
    must agree with the lat_ts=90-equivalent within float precision, and
    round-trip."""
    x, y = transform("+proj=stere +lat_0=90 +lon_0=0 +datum=WGS84", "EPSG:4326",
                     *transform("EPSG:4326", "+proj=stere +lat_0=90 +lon_0=0 +datum=WGS84",
                                np.array([10.0]), np.array([70.0]))[::-1][::-1])
    fwd = transform("EPSG:4326", "+proj=stere +lat_0=90 +lon_0=0 +datum=WGS84",
                    np.array([10.0, -45.0]), np.array([70.0, 85.0]))
    assert np.isfinite(fwd[0]).all() and np.isfinite(fwd[1]).all()
    lon2, lat2 = transform("+proj=stere +lat_0=90 +lon_0=0 +datum=WGS84", "EPSG:4326",
                           *fwd)
    assert abs(lon2[0] - 10.0) < 1e-9 and abs(lat2[0] - 70.0) < 1e-9
    # south aspect too
    s = transform("EPSG:4326", "+proj=stere +lat_0=-90 +lon_0=0 +datum=WGS84",
                  np.array([30.0]), np.array([-75.0]))
    assert np.isfinite(s[0]).all()


def test_merc_requires_explicit_sphere():
    """Review r3: ellipsoidal Mercator must raise, not silently become
    WebMercator (northing error would reach ~21 km)."""
    from geotrellis_server_ray.functions.proj import parse_proj4

    assert parse_proj4("+proj=merc +a=6378137 +b=6378137 +lat_ts=0 +lon_0=0") == "3857"
    assert parse_proj4("+proj=merc +R=6378137") == "3857"
    # r3 ADVICE: a NON-WebMercator sphere radius must be rejected, not
    # silently treated as 6378137 m math (~0.1% coordinate shift)
    for bad in ("+proj=merc +ellps=WGS84", "+proj=merc +datum=WGS84", "+proj=merc",
                "+proj=merc +R=6371000", "+proj=merc +a=6371000 +b=6371000"):
        with pytest.raises(ValueError, match="spherical"):
            parse_proj4(bad)


def test_transform_identity_is_case_insensitive_bit_exact():
    x = np.array([312345.6789012345])
    y = np.array([5612345.987654321])
    ox, oy = transform("epsg:32633", "EPSG:32633", x, y)
    assert ox[0] == x[0] and oy[0] == y[0]  # bit-exact, no round-trip math


def test_albers_roundtrip_and_origin():
    rng = np.random.default_rng(7)
    lon = rng.uniform(-124.0, -67.0, 2000)
    lat = rng.uniform(24.0, 49.5, 2000)
    x, y = transform("EPSG:4326", "EPSG:5070", lon, lat)
    lon2, lat2 = transform("EPSG:5070", "EPSG:4326", x, y)
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9
    x0, y0 = transform("EPSG:4326", "EPSG:5070", -96.0, 23.0)
    assert abs(x0) < 1e-6 and abs(y0) < 1e-6


def test_albers_scale_unity_at_standard_parallels():
    """Secant-cone law along parallels holds for the equal-area conic too:
    k = 1 exactly on both standard parallels, < 1 between, > 1 outside."""
    def k(lat):
        x0, y0 = transform("EPSG:4326", "EPSG:5070", -96.0, lat)
        x1, y1 = transform("EPSG:4326", "EPSG:5070", -95.9999, lat)
        return float(np.hypot(x1 - x0, y1 - y0)
                     / (_parallel_radius(lat) * np.radians(0.0001)))

    assert abs(k(29.5) - 1.0) < 1e-9
    assert abs(k(45.5) - 1.0) < 1e-9
    assert k(37.5) < 1.0 < k(49.0)
    assert k(25.0) > 1.0


def test_albers_is_equal_area():
    """THE defining property (independent numeric oracle): the projected
    area of a small quad equals its true ellipsoidal area
    a^2 (1-e^2) cos(phi) / (1 - e^2 sin^2 phi)^2 dlam dphi — everywhere,
    including far from the standard parallels (where LCC distorts area)."""
    from geotrellis_server_ray.functions.proj import ELLIPSOIDS

    a, f = ELLIPSOIDS["GRS80"]
    e2 = f * (2 - f)
    d = 1e-5
    for lon, lat in [(-120.0, 26.0), (-96.0, 37.5), (-80.0, 48.0), (-70.0, 30.0)]:
        x00, y00 = transform("EPSG:4326", "EPSG:5070", lon, lat)
        x10, y10 = transform("EPSG:4326", "EPSG:5070", lon + d, lat)
        x01, y01 = transform("EPSG:4326", "EPSG:5070", lon, lat + d)
        proj_area = abs((x10 - x00) * (y01 - y00) - (x01 - x00) * (y10 - y00))
        phi = np.radians(lat)
        s2 = np.sin(phi) ** 2
        true_area = (a * a * (1 - e2) * np.cos(phi) / (1 - e2 * s2) ** 2
                     * np.radians(d) ** 2)
        assert abs(proj_area / true_area - 1.0) < 1e-4, (lon, lat)


def test_albers_proj4_matches_epsg():
    p4 = ("+proj=aea +lat_1=29.5 +lat_2=45.5 +lat_0=23 +lon_0=-96 "
          "+x_0=0 +y_0=0 +ellps=GRS80")
    lon = np.array([-100.0, -85.0])
    lat = np.array([30.0, 44.0])
    assert transform("EPSG:4326", p4, lon, lat)[0].tolist() == \
        transform("EPSG:4326", "EPSG:5070", lon, lat)[0].tolist()

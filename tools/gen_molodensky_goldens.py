"""Generate literal golden rows for the 17-datum Molodensky table.

Independence from the engine under test:
* the datum constants below are re-typed directly from the published DMA
  TR 8350.2 local mean shifts / ellipsoid tables (and the proj registry
  for GGRS87) — NOT imported from idb_backend_spark.functions.geo;
* the expected WGS84 coordinates are computed by a DIFFERENT algorithm
  than the engine's abridged Molodensky: the full geocentric 3-parameter
  (Helmert) transformation — geodetic → ECEF on the source ellipsoid
  (h=0), shift, ECEF → geodetic on WGS84 (Bowring + iteration). WGS72
  additionally applies its published Z-rotation (0.554″) and scale
  (+0.219 ppm).

Abridged Molodensky agrees with the geocentric path to a few meters, so
the test tolerance (3e-5 deg ≈ 3.3 m) cleanly separates formula noise
from any transcription error in a shift constant (which moves results by
tens to hundreds of meters).

Usage: python tools/gen_molodensky_goldens.py  (prints the literal table)
"""

from __future__ import annotations

import math

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563

# datum -> (a, 1/f, dx, dy, dz) — independently re-typed from DMA TR
# 8350.2 (mean shifts) and the proj datum registry (GGRS87); WGS72 from
# the official DMA WGS72→WGS84 transformation.
DATUMS = {
    "NAD27": (6378206.4, 294.9786982, -8.0, 160.0, 176.0),
    "WGS72": (6378135.0, 298.26, 0.0, 0.0, 4.5),
    "ED50": (6378388.0, 297.0, -87.0, -98.0, -121.0),
    "TOKYO": (6377397.155, 299.1528128, -148.0, 507.0, 685.0),
    "AGD66": (6378160.0, 298.25, -133.0, -48.0, 148.0),
    "AGD84": (6378160.0, 298.25, -134.0, -48.0, 149.0),
    "SAD69": (6378160.0, 298.25, -57.0, 1.0, -41.0),
    "OSGB36": (6377563.396, 299.3249646, 375.0, -111.0, 431.0),
    "IRE65": (6377340.189, 299.3249646, 506.0, -122.0, 611.0),
    "NZGD49": (6378388.0, 297.0, 84.0, -22.0, 209.0),
    "PULKOVO42": (6378245.0, 298.3, 28.0, -130.0, -95.0),
    "CAPE": (6378249.145, 293.465, -136.0, -108.0, -292.0),
    "ARC1950": (6378249.145, 293.465, -143.0, -90.0, -294.0),
    "CARTHAGE": (6378249.2, 293.466021, -263.0, 6.0, 431.0),
    "POTSDAM": (6377397.155, 299.1528128, 606.0, 23.0, 413.0),
    "HERMANNSKOGEL": (6377397.155, 299.1528128, 653.0, -212.0, 449.0),
    "GGRS87": (6378137.0, 298.257222101, -199.87, 74.79, 246.62),
}

# WGS72→WGS84 also rotates (Rz = 0.554 arcsec) and scales (+0.219 ppm)
WGS72_RZ_RAD = math.radians(0.554 / 3600.0)
WGS72_DS = 0.219e-6

# representative in-region points per datum (lat, lon)
POINTS = {
    "NAD27": [(38.0, -97.0), (45.5, -122.5), (29.6, -82.3)],
    "WGS72": [(38.0, -97.0), (-33.9, 151.2), (51.5, -0.1)],
    "ED50": [(48.8, 2.3), (52.5, 13.4), (40.4, -3.7)],
    "TOKYO": [(35.7, 139.7), (34.7, 135.5), (43.1, 141.3)],
    "AGD66": [(-33.9, 151.2), (-37.8, 145.0), (-12.5, 130.8)],
    "AGD84": [(-31.9, 115.9), (-34.9, 138.6), (-23.7, 133.9)],
    "SAD69": [(-23.5, -46.6), (-34.6, -58.4), (-12.0, -77.0)],
    "OSGB36": [(51.5, -0.1), (55.9, -3.2), (53.5, -2.2)],
    "IRE65": [(53.3, -6.3), (51.9, -8.5), (54.6, -5.9)],
    "NZGD49": [(-36.8, 174.8), (-41.3, 174.8), (-45.9, 170.5)],
    "PULKOVO42": [(55.8, 37.6), (59.9, 30.3), (56.8, 60.6)],
    "CAPE": [(-33.9, 18.4), (-26.2, 28.0), (-29.9, 31.0)],
    "ARC1950": [(-17.8, 31.1), (-15.4, 28.3), (-20.2, 28.6)],
    "CARTHAGE": [(36.8, 10.2), (34.7, 10.8), (33.9, 8.1)],
    "POTSDAM": [(52.5, 13.4), (48.1, 11.6), (50.9, 6.9)],
    "HERMANNSKOGEL": [(48.2, 16.4), (47.1, 15.4), (46.0, 14.5)],
    "GGRS87": [(37.98, 23.73), (40.6, 22.9), (35.3, 25.1)],
}


def geodetic_to_ecef(lat, lon, a, f):
    e2 = 2 * f - f * f
    phi, lam = math.radians(lat), math.radians(lon)
    n = a / math.sqrt(1 - e2 * math.sin(phi) ** 2)
    x = n * math.cos(phi) * math.cos(lam)
    y = n * math.cos(phi) * math.sin(lam)
    z = n * (1 - e2) * math.sin(phi)
    return x, y, z


def ecef_to_geodetic(x, y, z, a, f):
    e2 = 2 * f - f * f
    lam = math.atan2(y, x)
    p = math.hypot(x, y)
    phi = math.atan2(z, p * (1 - e2))  # initial
    for _ in range(10):
        n = a / math.sqrt(1 - e2 * math.sin(phi) ** 2)
        h = p / math.cos(phi) - n
        phi = math.atan2(z, p * (1 - e2 * n / (n + h)))
    return math.degrees(phi), math.degrees(lam)


def expected_wgs84(datum, lat, lon):
    a, inv_f, dx, dy, dz = DATUMS[datum]
    f = 1.0 / inv_f
    x, y, z = geodetic_to_ecef(lat, lon, a, f)
    if datum == "WGS72":
        # scale + Z-rotation of the official transformation. The +0.554″
        # rotation adds to longitude (λ' = λ + θ), i.e. x' = x - θ·y,
        # y' = y + θ·x for the small angle θ.
        s = 1.0 + WGS72_DS
        x, y, z = (
            s * (x - WGS72_RZ_RAD * y),
            s * (y + WGS72_RZ_RAD * x),
            s * z,
        )
    x, y, z = x + dx, y + dy, z + dz
    return ecef_to_geodetic(x, y, z, WGS84_A, WGS84_F)


def main():
    print("GOLDENS = [")
    for datum, pts in POINTS.items():
        for lat, lon in pts:
            elat, elon = expected_wgs84(datum, lat, lon)
            print(
                f'    ("{datum}", {lat}, {lon}, '
                f"{elat:.9f}, {elon:.9f}),"
            )
    print("]")


if __name__ == "__main__":
    main()

"""F6/F7 UDF kernels — datum CRS transform and reverse geocoding
(reference conversions.py:485-563; idb/helpers/rg.py).

Architecture (the part that matters at 100 TB):

* The pure-expression coordinate normalization (flip/bounds/precision)
  lives in enrichment.geo_normalize — native, codegen'd, free.
* The datum transform (pyproj) and point-in-polygon reverse geocode
  (shapely) are irreducibly Python. Both are Arrow-batched pandas UDFs.
* The reverse geocoder broadcasts its polygon table once per executor and
  prunes candidates with the reference's 1°-bucket coarse grid
  (rg.py:21-50) before any exact containment test — the polygon set is a
  dimension table, never shuffled with the data.

pyproj/shapely are not installed in this container: both kernels gate on
import and fall back to a deterministic pass-through (datum) / grid-only
containment (rev-geocode) so the plumbing, batching, and flag semantics
are fully testable. Swapping in the real libraries changes only the
per-batch inner function.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

try:  # pragma: no cover - not present in this container
    from pyproj import CRS, Transformer

    HAVE_PYPROJ = True
except ImportError:
    HAVE_PYPROJ = False

#: Datum alias normalization (conversions.py:423-430).
DATUM_ALIASES = {
    "WORLDGEODETICSYSTEM1984": "WGS84",
    "WORLDGEODETICSYSTEM84": "WGS84",
    "WORLDGEODETICSYSTEM1972": "WGS72",
    "NORTHAMERICANDATUM1983": "NAD83",
    "NORTHAMERICANDATUM1927": "NAD27",
}

_KNOWN_DATUMS = {"WGS84", "WGS72", "NAD83", "NAD27"}


def mangle_string(s: str) -> str:
    """Uppercase and strip non-alphanumerics (conversions.py:312-316)."""
    return "".join(ch for ch in s.upper() if ch.isalnum())


_transform_schema = StructType(
    [
        StructField("lon", DoubleType()),
        StructField("lat", DoubleType()),
        StructField("flag", StringType()),
    ]
)


@F.pandas_udf(_transform_schema)
def datum_transform_udf(
    lon: pd.Series, lat: pd.Series, datum: pd.Series
) -> pd.DataFrame:
    """CRS transform to EPSG:4326 (conversions.py:485-509). Emits flag
    'geopoint_datum_missing' / 'geopoint_datum_error' / None.

    Without pyproj, known datums pass through unchanged (WGS84-family
    deltas are meters — below the engine's precision flags) and unknown
    datums flag datum_error, matching the reference's failure contract.
    """
    out_lon, out_lat, out_flag = [], [], []
    transformer_cache: dict = {}
    for lo, la, dt in zip(lon, lat, datum):
        if lo is None or la is None or (isinstance(lo, float) and math.isnan(lo)):
            out_lon.append(None), out_lat.append(None), out_flag.append(None)
            continue
        if dt is None or (isinstance(dt, float) and math.isnan(dt)) or not str(dt).strip():
            out_lon.append(lo), out_lat.append(la)
            out_flag.append("geopoint_datum_missing")
            continue
        norm = DATUM_ALIASES.get(mangle_string(str(dt)), mangle_string(str(dt)))
        if HAVE_PYPROJ:  # pragma: no cover
            try:
                tr = transformer_cache.get(norm)
                if tr is None:
                    src = CRS.from_user_input(f"+proj=latlon +datum={norm}")
                    tr = Transformer.from_crs(
                        src, CRS.from_epsg(4326), always_xy=True
                    )
                    transformer_cache[norm] = tr
                lo2, la2 = tr.transform(lo, la)
                out_lon.append(lo2), out_lat.append(la2), out_flag.append(None)
            except Exception:
                out_lon.append(lo), out_lat.append(la)
                out_flag.append("geopoint_datum_error")
        else:
            if norm in _KNOWN_DATUMS:
                out_lon.append(lo), out_lat.append(la), out_flag.append(None)
            else:
                out_lon.append(lo), out_lat.append(la)
                out_flag.append("geopoint_datum_error")
    return pd.DataFrame({"lon": out_lon, "lat": out_lat, "flag": out_flag})


# --------------------------------------------------------------------------
# F7 — reverse geocoder with 1°-bucket coarse prefilter (rg.py:14-79).
# --------------------------------------------------------------------------


class GridGeocoder:
    """Coarse-to-fine reverse geocoder (reference rg.py).

    ``regions`` maps iso code -> list of rectangles (lon_min, lat_min,
    lon_max, lat_max) — the stand-in for prepared country polygons. The 1°
    bucket index replicates the reference's prefilter exactly: a candidate
    set per integer (lon, lat) cell, exact containment only inside the
    shortlist. With shapely installed, rectangles become prepared
    geometries and `contains` replaces the box test; the index is the same.

    The instance is built on the driver and shipped to executors inside a
    pandas UDF closure (broadcast-sized: a few thousand floats even for a
    world map at this granularity).
    """

    def __init__(self, regions: dict[str, list[tuple[float, float, float, float]]]):
        self.regions = regions
        self.grid: dict[tuple[int, int], list[str]] = {}
        for code, boxes in regions.items():
            for (x1, y1, x2, y2) in boxes:
                for gx in range(math.floor(x1), math.ceil(x2) + 1):
                    for gy in range(math.floor(y1), math.ceil(y2) + 1):
                        cell = self.grid.setdefault((gx, gy), [])
                        if code not in cell:
                            cell.append(code)

    def lookup(self, lon: float, lat: float) -> str | None:
        cands = self.grid.get((math.floor(lon), math.floor(lat)))
        if not cands:
            return None
        for code in cands:
            for (x1, y1, x2, y2) in self.regions[code]:
                if x1 <= lon <= x2 and y1 <= lat <= y2:
                    return code
        return None


#: The reference's 8-way sign/axis flip search (conversions.py:530-547):
#: (lon, lat) candidates tried in order; flag name per slot.
FLIP_QUERIES = [
    (lambda lon, lat: (-lon, lat), "rev_geocode_lon_sign", False),
    (lambda lon, lat: (lon, -lat), "rev_geocode_lat_sign", False),
    (lambda lon, lat: (-lon, -lat), "rev_geocode_both_sign", False),
    (lambda lon, lat: (lat, lon), "rev_geocode_flip", True),
    (lambda lon, lat: (-lat, lon), "rev_geocode_flip_lat_sign", True),
    (lambda lon, lat: (lat, -lon), "rev_geocode_flip_lon_sign", True),
    (lambda lon, lat: (-lat, -lon), "rev_geocode_flip_both_sign", True),
]


def rev_geocode_py(
    geocoder: GridGeocoder,
    lon: float,
    lat: float,
    stated_iso: str | None,
) -> tuple[float, float, str | None, list[str]]:
    """One row of the reverse-geocode + flip-correction loop
    (conversions.py:513-563). Returns (lon, lat, country, flags)."""
    flags: list[str] = []
    country = geocoder.lookup(lon, lat)
    test_flips = False
    if country is None:
        flags.append("rev_geocode_failure")
        test_flips = True
    elif stated_iso and country.lower() != stated_iso.lower():
        flags.append("rev_geocode_mismatch")
        test_flips = True
    if stated_iso and test_flips:
        for fn, flag, needs_lat_range in FLIP_QUERIES:
            if needs_lat_range and abs(lon) > 90.0:
                continue
            cand = fn(lon, lat)
            got = geocoder.lookup(*cand)
            if got is not None and got.lower() == stated_iso.lower():
                lon, lat = cand
                country = got
                flags.append(flag)
                flags.append("rev_geocode_corrected")
                break
    return lon, lat, country, flags


def rev_geocode_udf(geocoder: GridGeocoder):
    """Build the pandas UDF bound to a driver-constructed geocoder."""
    schema = StructType(
        [
            StructField("lon", DoubleType()),
            StructField("lat", DoubleType()),
            StructField("country", StringType()),
            StructField("flags", StringType()),
        ]
    )

    @F.pandas_udf(schema)
    def _udf(lon: pd.Series, lat: pd.Series, iso: pd.Series) -> pd.DataFrame:
        rows = []
        for lo, la, code in zip(lon, lat, iso):
            if lo is None or la is None or (isinstance(lo, float) and math.isnan(lo)):
                rows.append((None, None, None, None))
                continue
            code = None if (code is None or (isinstance(code, float) and math.isnan(code))) else str(code)
            lo2, la2, country, flags = rev_geocode_py(geocoder, lo, la, code)
            rows.append((lo2, la2, country, ",".join(flags) if flags else None))
        return pd.DataFrame(rows, columns=["lon", "lat", "country", "flags"])

    return _udf

"""Generator for the NE-110m land layer (tools/gen_world_geometry.py):
exercised against a synthetic NE-shaped FeatureCollection, including the
round trip into GridGeocoder."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

from gen_world_geometry import (  # noqa: E402
    regions_from_geojson,
    render_module,
)

from idb_backend_spark.functions.geo import GridGeocoder  # noqa: E402


FIXTURE = {
    "type": "FeatureCollection",
    "features": [
        {  # simple Polygon with closing point + near-duplicate vertex
            "type": "Feature",
            "properties": {"ISO_A2": "AA"},
            "geometry": {
                "type": "Polygon",
                "coordinates": [[
                    [0.0, 0.0], [0.001, 0.0004], [4.0, 0.0], [4.0, 3.0],
                    [0.0, 3.0], [0.0, 0.0],
                ]],
            },
        },
        {  # MultiPolygon: two islands; second part has a (dropped) hole
            "type": "Feature",
            "properties": {"ISO_A2": "-99", "ISO_A2_EH": "BB"},
            "geometry": {
                "type": "MultiPolygon",
                "coordinates": [
                    [[[10.0, 10.0], [12.0, 10.0], [12.0, 12.0], [10.0, 12.0],
                      [10.0, 10.0]]],
                    [[[20.0, 10.0], [23.0, 10.0], [23.0, 13.0], [20.0, 13.0],
                      [20.0, 10.0]],
                     [[21.0, 11.0], [22.0, 11.0], [22.0, 12.0], [21.0, 12.0],
                      [21.0, 11.0]]],
                ],
            },
        },
        {  # no usable ISO -> skipped
            "type": "Feature",
            "properties": {"ISO_A2": "-99"},
            "geometry": {
                "type": "Polygon",
                "coordinates": [[[50.0, 50.0], [51.0, 50.0], [51.0, 51.0],
                                 [50.0, 51.0], [50.0, 50.0]]],
            },
        },
        {  # degenerate ring (< 4 distinct points) -> skipped
            "type": "Feature",
            "properties": {"ISO_A2": "CC"},
            "geometry": {
                "type": "Polygon",
                "coordinates": [[[60.0, 60.0], [61.0, 60.0], [60.0, 60.0]]],
            },
        },
    ],
}


def test_regions_from_geojson_shapes_and_skips():
    regions = regions_from_geojson(FIXTURE)
    assert set(regions) == {"AA", "BB"}
    # closing vertex dropped, near-duplicate collapsed
    assert regions["AA"] == [[(0.0, 0.0), (4.0, 0.0), (4.0, 3.0), (0.0, 3.0)]]
    # both MultiPolygon parts kept as separate rings, hole dropped
    assert len(regions["BB"]) == 2


def test_generated_regions_drive_the_geocoder():
    g = GridGeocoder(regions_from_geojson(FIXTURE))
    assert g.lookup(2.0, 1.5) == "AA"
    assert g.lookup(11.0, 11.0) == "BB"
    assert g.lookup(21.5, 11.5) == "BB"  # hole dropped: lake resolves
    assert g.lookup(2.0, 5.0) is None
    assert g.lookup(50.5, 50.5) is None  # iso-less feature skipped


def test_render_module_is_importable_python():
    src = render_module(regions_from_geojson(FIXTURE))
    ns: dict = {}
    exec(compile(src, "world_regions_gen.py", "exec"), ns)  # noqa: S102
    assert set(ns["WORLD_REGIONS"]) == {"AA", "BB"}

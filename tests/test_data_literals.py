"""Structural checks on the hand-authored geocoder data tables.

A duplicate key in a Python dict literal is silent — the later literal
wins — which is how Uruguay's wide Rio de la Plata EEZ band became dead
data in round 4 (a second narrower "UY" entry overwrote it). These tests
parse the module SOURCE with ast so duplicates can't hide behind dict
semantics.
"""

from __future__ import annotations

import ast
import inspect

from idb_backend_spark.data import world_eez, world_regions


def _literal_dict_keys(module, dict_name: str) -> list[str]:
    tree = ast.parse(inspect.getsource(module))
    for node in ast.walk(tree):
        if not isinstance(node, (ast.Assign, ast.AnnAssign)):
            continue
        targets = node.targets if isinstance(node, ast.Assign) else [node.target]
        for tgt in targets:
            if isinstance(tgt, ast.Name) and tgt.id == dict_name:
                value = node.value
                assert isinstance(value, ast.Dict), f"{dict_name} not a dict literal"
                keys = []
                for k in value.keys:
                    assert isinstance(k, ast.Constant) and isinstance(k.value, str)
                    keys.append(k.value)
                return keys
    raise AssertionError(f"{dict_name} literal not found in {module.__name__}")


def _assert_no_duplicates(module, dict_name):
    keys = _literal_dict_keys(module, dict_name)
    dupes = sorted({k for k in keys if keys.count(k) > 1})
    assert not dupes, f"duplicate keys in {dict_name}: {dupes}"


def test_world_eez_no_duplicate_keys():
    _assert_no_duplicates(world_eez, "WORLD_EEZ")


def test_world_regions_no_duplicate_keys():
    _assert_no_duplicates(world_regions, "WORLD_REGIONS")


def test_uruguay_wide_band_live():
    # The regression that motivated this module: the Rio de la Plata band
    # must be the live "UY" value, not overwritten by a narrower literal.
    boxes = world_eez.WORLD_EEZ["UY"]
    assert any(x1 <= -57.0 and x2 >= -50.5 for (x1, y1, x2, y2) in boxes)


def test_eez_boxes_well_formed():
    for iso, boxes in world_eez.WORLD_EEZ.items():
        assert len(iso) == 2 and iso.isupper()
        for (x1, y1, x2, y2) in boxes:
            assert x1 < x2 and y1 < y2, f"degenerate box for {iso}"
            assert -180.0 <= x1 and x2 <= 180.0 and -90.0 <= y1 and y2 <= 90.0

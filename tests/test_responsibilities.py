"""Responsibility-extraction stage (M13 depth): golden input/expected
pairs mirroring the reference's ``responsibility_parse/tests`` layout
(its ``DoDI 5000.94_resp_section.txt`` shape is the first golden), plus
unit tests of the numbering/profile machinery."""

import json
import os

import pytest

from gamechanger_data_ray.stages.responsibilities import (
    extract_numbering,
    is_larger_numbering,
    numbering_profile,
    parse_responsibility_section,
    profile_matches,
    responsibility_rows,
)

GOLD = os.path.join(os.path.dirname(__file__), "data", "responsibilities")


@pytest.mark.parametrize(
    "name", sorted(os.path.splitext(f)[0] for f in os.listdir(os.path.join(GOLD, "input")))
)
def test_responsibilities_golden(name):
    case = json.load(open(os.path.join(GOLD, "input", f"{name}.json")))
    expected = json.load(open(os.path.join(GOLD, "expected_output", f"{name}.json")))
    assert parse_responsibility_section(case["text"]) == expected


def test_extract_numbering_shapes():
    assert extract_numbering("2.1. THE DIRECTOR shall:") == ("2.1.", "THE DIRECTOR shall:")
    assert extract_numbering("a. Does a thing.") == ("a.", "Does a thing.")
    assert extract_numbering("(3) nested item") == ("(3)", "nested item")
    assert extract_numbering("(b) lettered item") == ("(b)", "lettered item")
    # back-reference "(b)," is NOT numbering (reference edge case)
    assert extract_numbering("(b), see reference")[0] == ""
    # uppercase abbreviations are not numbering
    assert extract_numbering("U.S. policy applies")[0] == ""
    assert extract_numbering("plain continuation text")[0] == ""
    # the reference suite's remaining token shapes
    # (test_responsibility_parser.py::test_extract_numbering)
    assert extract_numbering("1.1.1.1. Here is some text") == ("1.1.1.1.", "Here is some text")
    assert extract_numbering("zz. Here is some text") == ("zz.", "Here is some text")
    assert extract_numbering("(11) Here is some text") == ("(11)", "Here is some text")
    assert extract_numbering("(a). Here is some text")[0] == ""      # paren+period mix
    assert extract_numbering("321561 Here is some text")[0] == ""    # bare digits
    assert extract_numbering("(if applicable) Here is some text")[0] == ""


def test_profile_matching_and_order():
    p = numbering_profile("2.1.")
    assert profile_matches(p, "2.2.")
    assert profile_matches(p, "2.10.")  # one extra digit allowed (2.9 → 2.10)
    assert not profile_matches(p, "a.")
    assert not profile_matches(p, "(1)")
    assert not profile_matches(p, "2.1.1.")
    assert is_larger_numbering("2.1.", "2.2.")
    assert not is_larger_numbering("2.2.", "2.1.")
    assert not is_larger_numbering("2.1.", "2.1.")
    assert is_larger_numbering("a.", "b.")


def test_rows_contract_intro_only_role():
    rows = responsibility_rows("2.1. THE DIRECTOR (TD) shall:\n", doc_id=9)
    assert rows == [
        {
            "doc_id": 9,
            "role_numbering": "2.1.",
            "role_text": "THE DIRECTOR (TD) shall:",
            "resp_numbering": "",
            "resp_text": "",
        }
    ]


def test_rows_flatten_role_and_duties():
    rows = responsibility_rows(
        "2.1. THE DIRECTOR (TD) shall:\na. First duty.\nb. Second duty.", doc_id=1
    )
    assert [r["resp_numbering"] for r in rows] == ["a.", "b."]
    assert all(r["role_numbering"] == "2.1." for r in rows)


def test_parse_entities_contract():
    """The scalar gazetteer face (reference
    responsibility_parser.py::parse_entities + its unit test shapes):
    no-entity text → [], aliases resolve to standardized names, repeats
    dedupe, "USD(P)" normalizes to the USDP alias."""
    from gamechanger_data_ray.stages.extract import parse_entities

    assert parse_entities("Here is a sentence with no entities") == []
    assert parse_entities("Coordinate with DIA on tasking") == [
        "Defense Intelligence Agency"]
    assert parse_entities("with USD(P), and DoD entities") == [
        "Department of Defense", "Under Secretary of Defense for Policy"]
    assert parse_entities("DoD and more DoD and DoD again") == [
        "Department of Defense"]


def test_rows_with_entities_columns():
    """with_entities=True mirrors the reference's
    organizationPersonnelEntities / responsibilityEntities columns
    (format_responsibility_results Test 2 shape); default rows stay
    entity-free so the composed parser schema is unchanged."""
    text = ("1. The Director, DIA shall:\n"
            "1.1. Perform X responsibility\n"
            "1.2. Perform Y responsibility with the DLA.")
    plain = responsibility_rows(text, doc_id=1)
    assert all("role_entities" not in r for r in plain)
    rows = responsibility_rows(text, doc_id=1, with_entities=True)
    assert [r["role_entities"] for r in rows] == [
        "Defense Intelligence Agency"] * 2
    assert rows[0]["resp_entities"] == ""
    assert rows[1]["resp_entities"] == "Defense Logistics Agency"

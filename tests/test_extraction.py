"""Unit + golden tests for the extraction stages (refs, dates, entities,
sections) — mirrors the reference's golden input/expected-output strategy
(``section_parse/tests/data``) plus behavior checks for range guards,
overlap removal and short-month normalization."""

import datetime
import json
import os

import pandas as pd
import pytest

from gamechanger_data_ray.stages.extract import (
    DateExtractor,
    EntityExtractor,
    RefExtractor,
    collect_refs,
    extract_dates,
    gazetteer_order,
    make_ref_patterns,
    preprocess_text,
    top_entities,
)
from gamechanger_data_ray.stages.sections import parse_sections

GOLD = os.path.join(os.path.dirname(__file__), "data", "sections")


# ---------------------------------------------------------------------------
# References
# ---------------------------------------------------------------------------

PATTERNS = make_ref_patterns()


def test_ref_basic_citations():
    refs = collect_refs(
        "as required by DoDD 5105.53 and DoD Instruction 3020.26, see also "
        "DTM 09-027 and Executive Order 12333", PATTERNS)
    assert refs == {"DoDD 5105.53": 1, "DoDI 3020.26": 1, "DTM 09-027": 1,
                    "EO 12333": 1}


def test_ref_counts_accumulate():
    refs = collect_refs("DoDD 5105.53 then again dodd 5105.53", PATTERNS)
    assert refs == {"DoDD 5105.53": 2}


def test_ref_title_range_guard():
    refs = collect_refs("under Title 10 and Title 54 and Title 0", PATTERNS)
    assert refs == {"Title 10": 1}  # 54 > 53 and 0 are rejected


def test_ref_cfr_range_guard():
    refs = collect_refs("per 32 CFR and 51 CFR", PATTERNS)
    assert refs == {"CFR Title 32": 1}  # 51 > 50 rejected


def test_ref_preprocess_unicode_dash_and_parens():
    assert preprocess_text("a–b (c)  d") == "a-b c d"
    refs = collect_refs("DTM 09–027 (revised)", PATTERNS)
    assert refs == {"DTM 09-027": 1}


def test_ref_extractor_stage():
    df = pd.DataFrame({"doc_id": [1, 2], "text": ["see DoDD 5105.53", "nothing"]})
    out = RefExtractor()(df)
    assert out.to_dict("records") == [{"doc_id": 1, "ref": "DoDD 5105.53", "n": 1}]


# ---------------------------------------------------------------------------
# Dates
# ---------------------------------------------------------------------------

def test_dates_four_shapes():
    text = ("signed 14 March 1997, effective April 7, 2013, amended "
            "3 Mar. 1985 and Sept. 9, 2001")
    got = extract_dates(text)
    assert got == [
        datetime.datetime(1985, 3, 3),
        datetime.datetime(1997, 3, 14),
        datetime.datetime(2001, 9, 9),
        datetime.datetime(2013, 4, 7),
    ]


def test_dates_invalid_calendar_date_skipped():
    assert extract_dates("dated 31 February 2001") == []


def test_dates_long_short_may_dedup():
    # 'May' matches both the long and short month alternations — one date
    assert extract_dates("on 2 May 1999") == [datetime.datetime(1999, 5, 2)]


def test_date_extractor_stage_explodes():
    df = pd.DataFrame({"doc_id": [7], "text": ["1 January 2000 and 2 January 2000"]})
    out = DateExtractor()(df)
    assert list(out["doc_id"]) == [7, 7]
    assert list(out["date"]) == [pd.Timestamp(2000, 1, 1), pd.Timestamp(2000, 1, 2)]


# ---------------------------------------------------------------------------
# Entities
# ---------------------------------------------------------------------------

def _extract(text):
    out = EntityExtractor()(pd.DataFrame({"doc_id": [0], "text": [text]}))
    return dict(zip(out["entity"], out["n_mentions"]))


def test_entities_longest_wins_overlap_removal():
    # 'Department of Defense' must claim its span; nested 'Defense' must not fire
    assert _extract("the Department of Defense decided") == {"Department of Defense": 1}


def test_entities_nested_three_levels():
    # Joint Chiefs of Staff ⊃ Chiefs of Staff ⊃ Staff
    assert _extract("the Joint Chiefs of Staff and the Staff met") == {
        "Joint Chiefs of Staff": 1, "Staff": 1}


def test_entities_counts_and_types():
    out = EntityExtractor()(pd.DataFrame(
        {"doc_id": [0], "text": ["Defense and Defense and the General Counsel"]}))
    rec = out.set_index("entity")[["ent_type", "n_mentions"]].to_dict("index")
    assert rec == {
        "Defense": {"ent_type": "ORG", "n_mentions": 2},
        "General Counsel": {"ent_type": "PERSON", "n_mentions": 1},
    }


def test_entities_case_sensitive():
    assert _extract("the department of defense decided") == {}


def test_entities_priority_order_deterministic():
    order = [t for t, _ in gazetteer_order()]
    assert order.index("Department of Defense") < order.index("Defense")
    assert order.index("Joint Chiefs of Staff") < order.index("Chiefs of Staff") < order.index("Staff")


def test_top_entities_top5_tiebreak():
    edges = pd.DataFrame({
        "doc_id": [1] * 6,
        "entity": list("abcdef"),
        "ent_type": ["ORG"] * 6,
        "n_mentions": [5, 5, 4, 3, 2, 1],
    })
    top = top_entities(edges, k=5)
    assert list(top["entity"]) == ["a", "b", "c", "d", "e"]


# ---------------------------------------------------------------------------
# Sections — golden input/expected-output pairs
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "name", sorted(os.path.splitext(f)[0] for f in os.listdir(os.path.join(GOLD, "input")))
)
def test_sections_golden(name):
    case = json.load(open(os.path.join(GOLD, "input", f"{name}.json")))
    expected = json.load(open(os.path.join(GOLD, "expected_output", f"{name}.json")))
    got = [list(t) for t in parse_sections(case["text"], case["layout"])]
    assert got == expected


def test_sections_to_fields_named_contract():
    """The 14-field doc_dict contract (`add_sections.py:12-27`): recognized
    headings land in their canonical field; everything keeps document
    order in all_sections; unmatched headings appear only there."""
    from gamechanger_data_ray.stages.sections import parse_sections, sections_to_fields

    text = (
        "SECTION 1: PURPOSE This issuance establishes policy. "
        "SECTION 2: APPLICABILITY Applies to all components. "
        "SECTION 3: RESPONSIBILITIES The director shall oversee. "
        "SECTION 4: REFERENCES See enclosure list. "
        "SECTION 5: GLOSSARY Terms defined below. "
        "SECTION 6: MISCELLANY Unmatched heading body."
    )
    fields = sections_to_fields(parse_sections(text, "numbered"))
    assert len(fields["all_sections"]) == 6
    assert fields["purpose_section"] == ["PURPOSE. This issuance establishes policy."]
    assert fields["applicability_section"][0].startswith("APPLICABILITY.")
    assert fields["responsibilities_section"][0].startswith("RESPONSIBILITIES.")
    assert fields["references_section"][0].startswith("REFERENCES.")
    assert fields["glossary_section"][0].startswith("GLOSSARY.")
    # unmatched heading only in all_sections; unsupported fields stay []
    assert fields["policy_section"] == [] and fields["definitions_section"] == []
    assert all(k in fields for k in (
        "subject_section", "procedures_section", "effective_date_section",
        "organizations_section", "table_of_contents_section",
        "summary_of_change_section"))


def test_sections_to_fields_repeats_accumulate():
    from gamechanger_data_ray.stages.sections import sections_to_fields

    fields = sections_to_fields(
        [(1, "REFERENCES", "ref a"), (2, "POLICY", "p"), (3, "REFERENCES", "ref b")]
    )
    assert fields["references_section"] == ["REFERENCES. ref a", "REFERENCES. ref b"]
    assert fields["policy_section"] == ["POLICY. p"]


# ---------------------------------------------------------------------------
# OCR bad-page detection (M17)
# ---------------------------------------------------------------------------

def test_ocr_gate_flags_bad_pages():
    from gamechanger_data_ray.stages.text import OcrQualityGate, replacement_char_ratio

    good = "a perfectly fine page of text"
    bad = "�" * 30 + "legible tail" + "�" * 30
    assert replacement_char_ratio(good) == 0.0
    assert replacement_char_ratio("") == 0.0
    assert replacement_char_ratio(bad) > 0.2
    out = OcrQualityGate()(pd.DataFrame({"doc_id": [1, 2], "text": [good, bad]}))
    assert list(out["ocr_ok"]) == [True, False]
    assert out["bad_char_ratio"].iloc[1] > 0.2


def test_ocr_gate_threshold_boundary():
    from gamechanger_data_ray.stages.text import OcrQualityGate

    # exactly at threshold stays ok (<=), just above flips
    at = "�" + "x" * 4       # ratio 0.2
    over = "��" + "x" * 3  # ratio 0.4
    out = OcrQualityGate(threshold=0.2)(
        pd.DataFrame({"doc_id": [1, 2], "text": [at, over]})
    )
    assert list(out["ocr_ok"]) == [True, False]


def test_ref_full_library_canonical_examples():
    """One canonical citation per newly-widened family (ref_utils.py full
    library): each must extract to exactly its normalized form."""
    cases = {
        "CJCSI 3210.01": {"CJCSI 3210.01": 1},
        "JP 3-0 doctrine": {"JP 3-0": 1},
        "AR 25-50": {"AR 25-50": 1},
        "MCO 5215.1": {"MCO 5215.1": 1},
        "OPNAVINST 5100.23": {"OPNAVINST 5100.23": 1},
        "STANAG 4586": {"STANAG 4586": 1},
        "MIL-STD-882": {"MIL-STD 882": 1},
        "MARADMIN 123/21": {"MARADMIN 123/21": 1},
        "H.R. 2500": {"H.R. 2500": 1},
        "DFARS 225.872-1": {"DFARS 225.872-1": 1},
        "AFI 36-2903": {"AFI 36-2903": 1},
        "SECNAVINST 5510.36": {"SECNAVINST 5510.36": 1},
        "ICD 703": {"ICD 703": 1},
        "HSPD-5": {"HSPD 5": 1},
        "10 U.S.C.": {"Title 10": 1},
        "Public Law No. 117-81": {"PL 117-81": 1},
        "FM 3-21.8": {"FM 3-21.8": 1},
        "NAVADMIN 123/20": {"NAVADMIN 123/20": 1},
        "COMDTINST M16000.5": {"CIM 16000.5": 1},
        "COMDTINST 16000.5": {"CI 16000.5": 1},
        "MCWP 3-15.1": {"MCWP 3-15.1": 1},
        "AFMAN 91-201": {"AFMAN 91-201": 1},
        "TRADOC Regulations 350-70": {"TRADOC Regulations (TRs) 350-70": 1},
        "DCMA Instruction 8210.1": {"DCMA Instruction 8210.1": 1},
        "NFPA 1500": {"NFPA 1500": 1},
        "SFFAS No. 54": {"SFFAS 54": 1},
        "BUMEDINST 6230.15": {"BUMEDINST 6230.15": 1},
        "DHS Directive No. 140-01": {"DHS Directive 140-01": 1},
        "OMB Circular No. A-130": {"OMBC A-130": 1},
        "EO 13526": {"EO 13526": 1},
        "DoDM 5200.01, Volume 3": {"DoDM 5200.01, Volume 3": 1},
        "CJCSM 3150.05": {"CJCSM 3150.05": 1},
        "NTTP 3-07.2": {"NTTP 3-07.2": 1},
        "DA Memo 600-8": {"DA 600-8": 1},
        "AFPD 36-26": {"AFPD 36-26": 1},
        "MCDP 1-0": {"MCDP 1-0": 1},
        "NAVSUP P-485": {"NAVSUP 485": 1},
        "DoD FMR Volume 12": {"DoDFMR Volume 12": 1},
    }
    for text, want in cases.items():
        got = collect_refs(text, PATTERNS)
        assert got == want, f"{text!r}: {got} != {want}"


def test_ref_library_has_full_type_inventory():
    # full reference inventory (ref_utils.py:31-1228) — 100+ types
    assert len(PATTERNS) >= 120
    for pat in PATTERNS.values():
        assert pat.groups >= 1  # each carries the numeric capture group


# ---------------------------------------------------------------------------
# Full-parity lookup gazetteer (entities_utils.py analog)
# ---------------------------------------------------------------------------

def test_lookup_dict_contract():
    from gamechanger_data_ray.stages.extract import (
        make_entities_lookup_dict, replace_nonalpha_chars)
    l = make_entities_lookup_dict()
    # alias maps to the standardized name; UPPER variant exists
    assert l["DoD"]["raw_ent"] == "Department of Defense"
    assert l["DOD"]["raw_ent"] == "Department of Defense"
    assert l["USMC"]["ent_type"] == "ORG"
    # keys are alphanumeric-normalized
    assert replace_nonalpha_chars("U.S.C. Title 10-A") == "USC Title 10A"
    assert all(k == replace_nonalpha_chars(k) for k in l)
    # parent orgs become ORG entries
    assert l["Department of Homeland Security"]["ent_type"] == "ORG"


def test_lookup_extractor_alias_aggregation_and_overlap():
    import pandas as pd
    from gamechanger_data_ray.stages.extract import LookupEntityExtractor
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            # alias + UPPER + full form all aggregate under the standardized name
            "The DoD met. The DOD agreed. The Department of Defense signed.",
            # the longer key claims its span: United States inside the Corps
            # name is masked, standalone United States still counts
            "The United States Marine Corps and the United States.",
            # normalization: punctuation stripped before matching
            "The D.o.D convened.",  # normalizes to 'DoD' -> matches
        ],
    })
    out = LookupEntityExtractor()(df)
    r1 = out[out.doc_id == 1]
    assert r1.entity.tolist() == ["Department of Defense"]
    assert r1.n_mentions.tolist() == [3]
    r2 = out[out.doc_id == 2].set_index("entity")["n_mentions"].to_dict()
    assert r2 == {"United States Marine Corps": 1, "United States": 1}
    r3 = out[out.doc_id == 3]
    assert r3.entity.tolist() == ["Department of Defense"]


# ---------------------------------------------------------------------------
# PII detection + redaction
# ---------------------------------------------------------------------------

def test_pii_redactor_counts_and_redacts():
    from gamechanger_data_ray.stages.pii import PiiRedactor

    df = pd.DataFrame({
        "doc_id": [1, 2],
        "text": [
            "mail a.b+c@ex.org or admin@sub.ex.mil, ssn 123-45-6789, "
            "call 703-555-0123 from 192.168.1.10",
            "no pii here",
        ],
    })
    out = PiiRedactor()(df)
    r = out.iloc[0]
    assert (r.n_email, r.n_ssn, r.n_phone, r.n_ipv4) == (2, 1, 1, 1)
    assert r.n_residual == 0
    assert "@" not in r.text and "123-45-6789" not in r.text
    assert "[PII:EMAIL]" in r.text and "[PII:SSN]" in r.text
    r2 = out.iloc[1]
    assert (r2.n_email, r2.n_ssn, r2.n_phone, r2.n_ipv4, r2.n_residual) == (0, 0, 0, 0, 0)
    assert r2.text == "no pii here"


def test_dod_toc_stops_at_body_not_last_leader():
    """Code-review regression: a body line ending '.... <n>' (lists of
    tables, forms) must not extend the TOC and swallow sections; a
    wrapped non-heading TOC entry still combines."""
    from gamechanger_data_ray.stages.sections import parse_dod_sections

    text = (
        "DoDI 5000.88, November 18, 2020\nTABLE OF CONTENTS\n"
        "SECTION 1: PURPOSE .......... 3\n"
        "1.1. Information Collections and\nReporting Requirements .......... 4\n"
        "SECTION 1: PURPOSE\nSee the table ............ 12\nreal body line\n"
        "SECTION 2: FORMS\nforms body"
    )
    got = parse_dod_sections(text)
    assert got[0][1] == "TABLE OF CONTENTS"
    assert "Reporting Requirements" in got[0][2]
    assert got[1] == (1, "PURPOSE", "See the table ............ 12 real body line")
    assert got[2] == (2, "FORMS", "forms body")


def test_navy_letter_dot_subsection():
    """MCBUL purpose-within-situation quirk (navy_utils.py::
    get_letter_dot_section): the lettered subsection runs to the next
    letter item / numbered item / blank line, first match only."""
    from gamechanger_data_ray.stages.sections import get_letter_dot_section

    sit = ("Background applies.\na. Purpose. To publish the change.\n"
           "b. Cancellation. MCBUL 1200.\n")
    assert get_letter_dot_section(sit, "purpose") == "a. Purpose. To publish the change."
    assert get_letter_dot_section(sit, "missing") == ""
    assert get_letter_dot_section("", "purpose") == ""


def test_ref_prefilter_soundness_per_type():
    """Round 5: the literal prefilter must NEVER skip a pattern that
    would match — for every citation type, a synthetic text matching
    that type's pattern must produce identical results with and without
    the prefilter (and the prefiltered batched scan must equal the
    per-doc loop)."""
    import re as _re

    from gamechanger_data_ray.stages.extract import (
        _CITE_TABLE,
        collect_refs,
        collect_refs_batched,
        make_ref_patterns,
        make_ref_prefilters,
    )

    patterns = make_ref_patterns()
    pre = make_ref_prefilters()

    # build one sample text per type from the FIRST head alternative's
    # literal + a plausible numeric shape, plus the handwritten shapes
    samples = []
    for typ, heads, _shape in _CITE_TABLE:
        head = _re.sub(r"[^a-z0-9 ]", "", heads.split("|")[0].replace(" ?", " "))
        samples.append(f"see {head} 5101.1 for details")
    samples += ["under 10 U.S.C. rules", "per 32 CFR part", "Public Law 117-81"]

    no_filter = {t: None for t in patterns}
    with_f = collect_refs_batched(samples, patterns, prefilters=pre)
    without = collect_refs_batched(samples, patterns, prefilters=no_filter)
    assert with_f == without
    per_doc = [collect_refs(t, patterns) for t in samples]
    assert with_f == per_doc
    # at least one sample must actually fire per handwritten type
    fired = {r.split(" ")[0] for d in with_f for r in d}
    assert {"Title", "PL"} <= fired


def test_ref_prefilter_literals_are_required():
    """Every derived literal really is REQUIRED: munging it out of a
    matching text kills the match under the raw pattern too (i.e. the
    filter can only skip true negatives)."""
    from gamechanger_data_ray.stages.extract import (
        make_ref_patterns,
        make_ref_prefilters,
        preprocess_text,
    )

    patterns = make_ref_patterns()
    for typ, lits in make_ref_prefilters().items():
        if lits is None:
            continue
        pat = patterns[typ]
        # a text with NO occurrence of any literal can never match
        probe = preprocess_text("x 5101.1 42-081 1234-567-8 q")
        low = probe.lower()
        if any(l in low for l in lits):
            continue  # probe accidentally contains a literal; skip type
        assert pat.search(probe) is None, (typ, lits)

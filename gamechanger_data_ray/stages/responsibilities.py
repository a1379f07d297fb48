"""Responsibility extraction from a RESPONSIBILITIES section — who is
assigned what (M13 depth; reference:
``common/document_parser/lib/responsibility_parse/responsibility_parser.py``).

The reference's observable contract (its golden
``DoDI 5000.94_resp_section_expected.txt``): a newline-delimited
responsibilities section parses into ROLE BLOCKS — the intro line that
names the role being assigned duties (``2.1. UNDER SECRETARY ... The
USD(A&S):``) followed by that role's responsibility lines (``a. ...``),
with

- un-numbered physical lines merged into the previous line (the
  reference's ``extract_lookahead_text`` — PDF text wraps mid-sentence);
- roles recognized by line shape: numbering + (ends with a duty cue +
  ':' — "shall:", "is responsible for:" … — or carries a defined
  acronym ``(USD(A&S))`` or a role keyword);
- a NEW role when a line's numbering matches the first role's numbering
  PROFILE (same period/parenthesis/digit-letter signature —
  ``construct_numbering_metadata_dict``) and is ordered after it
  (``is_larger_numbering``); anything else numbered is a responsibility
  of the current role;
- parsing stops at GLOSSARY / REFERENCES / acronym-table break strings.

Pure functions (text → rows); the Ray face is an actor-pool
``map_batches`` stage in ``pipelines/extraction_queries.py``.
"""

from __future__ import annotations

import re
import string

# reference start_line_numbering_regex: a./(a)/(1)/1./1.2. … chains
_NUMBERING = re.compile(
    r"^(?:[a-z]{1,2}\.|\([a-z]{1,2}\)|\(\d{1,2}\)|\d{1,2}\.(?:\d{1,2}\.){0,6})$"
)
_ACRONYM = re.compile(r"\([A-Z][A-Z\w\s&()]{1,9}\)")

DUTY_CUES = ("shall", "will", "must", "responsible for", "ensure")
ROLE_KEYWORDS = (
    "director", "manager", "secretar", "head", "chairman", "chairperson", "commander",
)
BREAK_STRINGS = (
    "GLOSSARY", "Glossary", "ACRONYMS", "REFERENCES", "SUMMARY OF CHANGE",
    "Summary of Change", "Abbreviations and Acronyms", "............................",
)
# a table-of-contents entry ("2.1. Under Secretary ...... 5"): dotted
# leader + page number. These carry role-shaped numbering AND a dot run
# long enough to trip the acronym-table break string — they are noise to
# skip, not a section break (the body follows them).
_TOC_LEADER = re.compile(r"\.{4,}\s*\d{1,4}\s*$")
_PUNCT_TABLE = str.maketrans("", "", string.punctuation)


def extract_numbering(line: str) -> tuple[str, str]:
    """Split a line's leading numbering token from its body
    (``ResponsibilityParser.extract_numbering``). A token ending with a
    comma (``(b), …``) is a back-reference, not numbering."""
    line = line.strip()
    head, _, rest = line.partition(" ")
    if _NUMBERING.match(head) and not head.endswith(","):
        return head, rest.strip()
    return "", line


def numbering_profile(numbering: str) -> dict[str, int]:
    """Characteristic signature of a numbering token
    (``construct_numbering_metadata_dict``)."""
    return {
        "n_periods": numbering.count("."),
        "n_parenthesis": numbering.count(")"),
        "n_numbers": sum(c.isdigit() for c in numbering),
        "n_letters": sum(c.isalpha() for c in numbering),
    }


def profile_matches(profile: dict[str, int], numbering: str) -> bool:
    """Does ``numbering`` match the new-role profile? Same period and
    parenthesis counts, digit count within one (``2.9.`` → ``2.10.``),
    at least as many letters (``numbering_metadata_dict_matched``)."""
    p = numbering_profile(numbering)
    return (
        profile["n_periods"] == p["n_periods"]
        and profile["n_parenthesis"] == p["n_parenthesis"]
        and profile["n_numbers"] in (p["n_numbers"] - 1, p["n_numbers"])
        and profile["n_letters"] <= p["n_letters"]
    )


def is_larger_numbering(curr: str, new: str) -> bool:
    """Document-order comparison of two same-profile numbering tokens
    (``is_larger_numbering``): numeric when both are numeric, else
    lexicographic, strict."""
    if curr == new:
        return False
    c = curr.translate(_PUNCT_TABLE)
    n = new.translate(_PUNCT_TABLE)
    if c.isdigit() and n.isdigit():
        return int(n) > int(c)
    return n > c


def _is_role_line(line: str) -> bool:
    low = line.lower().rstrip()
    if any(low.endswith(cue + ":") for cue in DUTY_CUES):
        return True
    return bool(_ACRONYM.search(line)) or any(k in low for k in ROLE_KEYWORDS)


_NUM_TOKEN = r"(?:[a-z]{1,2}\.|\([a-z]{1,2}\)|\(\d{1,2}\)|\d{1,2}\.(?:\d{1,2}\.){0,6})"
# "… shall: a. duty" (and the no-space "… DIA:1.1. duty" shape) —
# numbering right after a colon starts a new logical line
# (``split_text_with_role_midline``)
_AFTER_COLON = re.compile(rf":\s?(?={_NUM_TOKEN} )")
# "… RESPONSIBILITIES 2.1. ROLE" — numbering inside the section-intro
# line starts the first role (the reference's " 1. "/" a. " intro split)
_AFTER_INTRO = re.compile(rf" (?={_NUM_TOKEN} )")


def _explode_midline(line: str) -> list[str]:
    """Split roles/duties that begin mid-line — needed when the section
    text arrives flattened (one space-joined body) rather than as
    physical PDF lines."""
    out: list[str] = []
    queue = [line]
    while queue:
        ln = queue.pop(0)
        numbering, _ = extract_numbering(ln)
        if not numbering and "RESPONSIBILIT" in ln.upper():
            m = _AFTER_INTRO.search(ln)
            if m:
                out.append(ln[: m.start()].strip())
                queue.insert(0, ln[m.start() :].strip())
                continue
        m = _AFTER_COLON.search(ln)
        if m:
            out.append(ln[: m.start() + 1].strip())
            queue.insert(0, ln[m.start() + 1 :].strip())
            continue
        out.append(ln)
    return out


def parse_responsibility_section(section_text: str) -> list[list[str]]:
    """Section text → role blocks (``parse_responsibility_section``):
    each block is ``[role_intro_line, resp_line, ...]``."""
    merged: list[str] = []
    stop = False
    for raw in section_text.split("\n"):
        if stop:
            break
        line = raw.replace("\t", "").strip()
        if not line:
            continue
        if _TOC_LEADER.search(line):
            continue  # contents entry, not content (and not a break)
        if any(b in line for b in BREAK_STRINGS):
            break
        for piece in _explode_midline(line):
            if any(b in piece for b in BREAK_STRINGS):
                stop = True
                break
            numbering, _ = extract_numbering(piece)
            if numbering or not merged:
                merged.append(piece)
            else:
                # continuation of the previous physical line (lookahead merge)
                merged[-1] = f"{merged[-1]} {piece}"

    blocks: list[list[str]] = []
    profile: dict[str, int] | None = None
    current_numbering = ""
    for line in merged:
        numbering, _ = extract_numbering(line)
        if not numbering:
            continue  # un-numbered preamble (e.g. the SECTION heading)
        if profile is None:
            if _is_role_line(line):
                profile = numbering_profile(numbering)
                current_numbering = numbering
                blocks.append([line])
            continue
        if profile_matches(profile, numbering) and is_larger_numbering(
            current_numbering, numbering
        ):
            current_numbering = numbering
            blocks.append([line])
        elif blocks:
            blocks[-1].append(line)
    return blocks


def responsibility_rows(
    section_text: str, doc_id: int | None = None, with_entities: bool = False
) -> list[dict]:
    """Flatten role blocks to the reference's spreadsheet row contract
    (``format_responsibility_results``): one row per (role,
    responsibility), or one intro-only row for a role with none.

    ``with_entities=True`` additionally attaches the gazetteer entities
    mentioned in the role / responsibility text (semicolon-joined sorted
    standardized names — the reference's
    ``organizationPersonnelEntities`` / ``responsibilityEntities``
    columns, via ``stages/extract.py::parse_entities``). Opt-in so the
    base row schema the composed parser ships stays stable."""
    rows: list[dict] = []
    for block in parse_responsibility_section(section_text):
        role_num, role_text = extract_numbering(block[0])
        base = {
            "doc_id": doc_id,
            "role_numbering": role_num,
            "role_text": role_text,
        }
        if with_entities:
            from .extract import parse_entities

            base["role_entities"] = ";".join(parse_entities(role_text))
        if len(block) == 1:
            row = {**base, "resp_numbering": "", "resp_text": ""}
            if with_entities:
                row["resp_entities"] = ""
            rows.append(row)
        for line in block[1:]:
            num, text = extract_numbering(line)
            row = {**base, "resp_numbering": num, "resp_text": text}
            if with_entities:
                from .extract import parse_entities

                row["resp_entities"] = ";".join(parse_entities(text))
            rows.append(row)
    return rows

"""Section parsing strategies — the M13 per-doc-type parser family
(``common/document_parser/lib/section_parse/add_sections.py:5-27`` +
``parsers/*``, re-expressed as two real strategies behind the same
factory-dispatch contract: pick a parser by document type, produce an
ordered list of named sections).

Strategies:
- :func:`parse_numbered_sections` — "SECTION <n>: <NAME>" enumerated
  headings (the DoD-issuance layout shape).
- :func:`parse_caps_sections`     — "<NAME>." all-caps heading sentences
  (the CJCS/Navy layout shape).

Both return ``[(num, name, body), ...]`` in document order. Golden
input/expected-output pairs live in ``tests/data/sections/`` mirroring the
reference's ``section_parse/tests/data/{input,expected_output}`` layout.
"""

from __future__ import annotations

import re
from typing import Callable

_NUMBERED = re.compile(r"\bSECTION\s+(\d+):\s+([A-Z][A-Z ]*[A-Z]|[A-Z])\b")
_CAPS = re.compile(r"(?:^|\s)([A-Z][A-Z ]*[A-Z]|[A-Z])\.(?=\s|$)")


def parse_numbered_sections(text: str) -> list[tuple[int, str, str]]:
    """Split on ``SECTION <n>: <NAME>`` headings; body = text up to the
    next heading. Text before the first heading is ignored (preamble)."""
    out = []
    matches = list(_NUMBERED.finditer(text))
    for i, m in enumerate(matches):
        end = matches[i + 1].start() if i + 1 < len(matches) else len(text)
        body = text[m.end():end].strip()
        out.append((int(m.group(1)), m.group(2).strip(), body))
    return out


def parse_caps_sections(text: str) -> list[tuple[int, str, str]]:
    """Split on all-caps heading sentences (``PURPOSE.`` style); sections
    numbered by order of appearance."""
    out = []
    matches = list(_CAPS.finditer(text))
    for i, m in enumerate(matches):
        end = matches[i + 1].start() if i + 1 < len(matches) else len(text)
        body = text[m.end():end].strip()
        out.append((i + 1, m.group(1).strip(), body))
    return out


_NUMBER_DOT = re.compile(r"(?:^|\s)(\d{1,2})\s*\.\s+([A-Z][A-Za-z ]*?)\s*\.(?=\s|$)")
_ENCLOSURE = re.compile(
    r"\b(?:E\.?(\d{1,2})[\s\.]\s*|E(?:nclosure|NCLOSURE)\s+(\d{1,2}):?\s*)"
    r"([A-Z][A-Z ]*[A-Z]|[A-Z])\b"
)
_EO_SEC = re.compile(r"\bSec(?:tion)?\.?\s+(\d{1,2})\s*\.\s+([A-Z][A-Za-z ]*?)\s*\.(?=\s|$)")
_USC_SEC = re.compile(r"(?:^|\s)§+\s*(\d{1,5})[a-z]?\s*\.\s+")


def parse_number_dot_sections(text: str) -> list[tuple[int, str, str]]:
    """Navy-issuance layout (``navy_utils.py::match_number_dot_section``):
    ``1. Purpose. <body>`` numbered-dot headings; the declared number is
    the section number."""
    out = []
    matches = list(_NUMBER_DOT.finditer(text))
    for i, m in enumerate(matches):
        end = matches[i + 1].start() if i + 1 < len(matches) else len(text)
        out.append((int(m.group(1)), m.group(2).strip(), text[m.end():end].strip()))
    return out


def parse_enclosure_sections(text: str) -> list[tuple[int, str, str]]:
    """DoD-issuance enclosure layout (``dod_utils.py::match_enclosure_num``):
    ``E3. NAME`` or ``ENCLOSURE 3: NAME`` headings; the enclosure number
    is the section number."""
    out = []
    matches = list(_ENCLOSURE.finditer(text))
    for i, m in enumerate(matches):
        end = matches[i + 1].start() if i + 1 < len(matches) else len(text)
        num = int(m.group(1) or m.group(2))
        out.append((num, m.group(3).strip(), text[m.end():end].strip()))
    return out


def parse_eo_sections(text: str) -> list[tuple[int, str, str]]:
    """Executive-order layout (EO documents; the reference's ``EOParser``
    reduces to title-as-purpose because crawled EO text arrives
    unsectioned — real EO bodies carry ``Sec. 2. Name.`` headings, parsed
    here): ``Section 1.`` / ``Sec. 2.`` headings."""
    out = []
    matches = list(_EO_SEC.finditer(text))
    for i, m in enumerate(matches):
        end = matches[i + 1].start() if i + 1 < len(matches) else len(text)
        out.append((int(m.group(1)), m.group(2).strip(), text[m.end():end].strip()))
    return out


def parse_uscode_sections(text: str) -> list[tuple[int, str, str]]:
    """US-Code layout (``uscode_parser.py`` analog): ``§ 1234. Heading``
    statute sections; the statute number is the section number, the
    heading runs to the first sentence period (or the whole span), and the
    body runs to the next ``§``."""
    out = []
    matches = list(_USC_SEC.finditer(text))
    for i, m in enumerate(matches):
        end = matches[i + 1].start() if i + 1 < len(matches) else len(text)
        span = text[m.end():end].strip()
        # statute headings sit on their own line; flat text falls back to
        # the first sentence period
        sep = "\n" if "\n" in span else "."
        head, found, body = span.partition(sep)
        out.append((int(m.group(1)), head.strip().rstrip("."),
                    body.strip() if found else ""))
    return out


# ---------------------------------------------------------------------------
# DoD multi-pass line parser (the reference's DoDParser._parse pipeline,
# ``section_parse/parsers/dod_parser.py:113-131``: combine TOC → remove
# pagebreaks/noise → combine enclosure titles → sentence continuations →
# combine by section nums → combine enclosures)
# ---------------------------------------------------------------------------

_DOD_HEADER = re.compile(r"^(DoD[IMD]\s+(?:[A-Z]-)?[1-9][0-9]{3}(?:\.[0-9]{1,2})?)\b")
_PAGE_NUM = re.compile(r"^\d{1,4}\s*$")
_TOC_LEADER = re.compile(r"\.{3,}\s*\d+\s*$")
_TOC_TITLE = re.compile(r"\bTABLE OF CONTENTS\b", re.IGNORECASE)
_SECTION_HEAD = re.compile(r"^SECTION\s+(\d+):\s*(.+?)\s*$")
# (?!\d) keeps enclosure SUBSECTION numbering (E2.1.) in the body
_ENCL_HEAD = re.compile(r"^(?:ENCLOSURE\s+(\d{1,2}):?|E(\d{1,2})\.(?!\d))\s*(.*?)\s*$")
_GLOSSARY_HEAD = re.compile(r"^GLOSSARY\s*$")
_ALLCAPS_LINE = re.compile(r"^[A-Z][A-Z &,()\-']*$")


def parse_dod_sections(text: str) -> list[tuple[int, str, str]]:
    """Line-oriented DoD-issuance parser (newline-delimited page text —
    the shape the PDF extractor emits). Reproduces the reference
    pipeline's observable behavior compactly:

    - the repeated page header (``DoDI 5000.88, ...``, inferred from the
      first header-shaped line the way the reference infers it from the
      filename) and bare page numbers are dropped (``_remove_pagebreaks_
      and_noise``);
    - the Table of Contents — from its title line through the last
      dotted-leader line — becomes ONE section (``_combine_toc``),
      emitted as (0, "TABLE OF CONTENTS", body);
    - ``SECTION <n>: NAME`` / ``ENCLOSURE <n>`` / ``E<n>. NAME`` /
      ``GLOSSARY`` open a new section; a bare ``ENCLOSURE <n>`` heading
      absorbs an ALL-CAPS title on the following line
      (``_combine_enclosure_titles``);
    - every other line — subsection numbering, sentence continuations,
      alpha list items — accrues to the current section's body joined by
      spaces (``_combine_sentence_continuations`` + ``_combine_by_
      section_nums`` collapsed: body lines stay with their heading).

    Glossary sections carry num 0. Preamble before the first heading is
    ignored, matching the other strategies."""
    raw_lines = [ln.strip() for ln in text.split("\n")]
    header: str | None = None
    m = _DOD_HEADER.match(raw_lines[0]) if raw_lines else None
    if m:
        header = m.group(1)

    lines: list[str] = []
    for i, ln in enumerate(raw_lines):
        if not ln or _PAGE_NUM.match(ln):
            continue
        if header and i > 0 and ln.startswith(header):
            continue  # repeated page header
        lines.append(ln)

    # TOC: title line .. the CONTIGUOUS run of dotted-leader lines that
    # follows it (one combined section). Stopping at the first non-leader
    # line matters: body lines elsewhere can also end '.... <n>' (lists
    # of tables, forms), and scanning to the document's last leader would
    # swallow whole sections into the TOC.
    toc_start = next((i for i, ln in enumerate(lines) if _TOC_TITLE.search(ln)), None)
    out: list[tuple[int, str, str]] = []
    if toc_start is not None:
        toc_end = toc_start
        j = toc_start + 1
        while j < len(lines):
            ln = lines[j]
            if _TOC_LEADER.search(ln):
                toc_end = j
            elif (
                # tolerate ONE wrapped-title half mid-TOC: a leader line
                # follows AND this line is not itself a section heading
                # (a heading here means the body has started)
                j + 1 < len(lines)
                and _TOC_LEADER.search(lines[j + 1])
                and not (_SECTION_HEAD.match(ln) or _ENCL_HEAD.match(ln)
                         or _GLOSSARY_HEAD.match(ln))
            ):
                pass
            else:
                break  # TOC is over
            j += 1
        out.append((0, "TABLE OF CONTENTS", " ".join(lines[toc_start + 1 : toc_end + 1])))
        lines = lines[:toc_start] + lines[toc_end + 1 :]

    cur: tuple[int, str] | None = None
    body: list[str] = []
    i = 0

    def flush():
        if cur is not None:
            out.append((cur[0], cur[1], " ".join(body).strip()))

    while i < len(lines):
        ln = lines[i]
        sec = _SECTION_HEAD.match(ln)
        enc = _ENCL_HEAD.match(ln)
        glo = _GLOSSARY_HEAD.match(ln)
        if sec:
            flush()
            cur, body = (int(sec.group(1)), sec.group(2)), []
        elif enc:
            flush()
            num = int(enc.group(1) or enc.group(2))
            name = enc.group(3)
            # bare "ENCLOSURE 2": absorb an ALL-CAPS title line that follows
            if not name and i + 1 < len(lines) and _ALLCAPS_LINE.match(lines[i + 1]):
                name = lines[i + 1]
                i += 1
            cur, body = (num, name or f"ENCLOSURE {num}"), []
        elif glo:
            flush()
            cur, body = (0, "GLOSSARY"), []
        elif cur is not None:
            body.append(ln)
        i += 1
    flush()
    return out


# ---------------------------------------------------------------------------
# CJCS line parser (``section_parse/parsers/cjcs_parser.py``: lettered
# enclosures — "ENCLOSURE A \n RESPONSIBILITIES" — found by
# CAPITAL_ENCLOSURE spans, numbered front-matter sections
# "1.  PURPOSE.", filename/date/page pagebreak strip)
# ---------------------------------------------------------------------------

_CJCS_HEADER = re.compile(r"^(CJCS[IMN]?\s+\d{4}\.\d{2}[A-Z]?)\b")
_CJCS_DATE = re.compile(
    r"^\d{1,2}\s+(?:January|February|March|April|May|June|July|August|"
    r"September|October|November|December)\s+\d{4}\s*$"
)
_CJCS_ENCL = re.compile(r"^ENCLOSURE\s+([A-Z])\b:?\s*(.*?)\s*$")
_CJCS_NUMBERED = re.compile(r"^(\d{1,2})\s?\.\s+([A-Z][A-Z ]*[A-Z]|[A-Z])\b\.?\s*(.*)$")


def parse_cjcs_sections(text: str) -> list[tuple[int, str, str]]:
    """Line-oriented CJCS-issuance parser. Observable contract of the
    reference's ``CJCSParser``: numbered front-matter sections
    (``1.  PURPOSE.`` — ``NUMBERED_PURPOSE_START_PATTERN``), LETTERED
    enclosures whose span runs to the next enclosure title
    (``ENCLOSURE_RESPONSIBILITIES_START_PATTERN`` /
    ``_find_enclosure_end``), and pagebreak noise — the repeated
    ``CJCSI NNNN.NN`` header, ``DD Month YYYY`` date lines, bare page
    numbers — stripped first (``_remove_pagebreaks_and_noise``).
    Enclosure letters map to section numbers (A=1, B=2, …); a bare
    ``ENCLOSURE X`` absorbs an ALL-CAPS title on the next line, like
    the DoD parser."""
    raw_lines = [ln.strip() for ln in text.split("\n")]
    header: str | None = None
    m = _CJCS_HEADER.match(raw_lines[0]) if raw_lines else None
    if m:
        header = m.group(1)
    lines = []
    for i, ln in enumerate(raw_lines):
        if not ln or _PAGE_NUM.match(ln) or _CJCS_DATE.match(ln):
            continue
        if header and i > 0 and ln.startswith(header):
            continue
        lines.append(ln)

    out: list[tuple[int, str, str]] = []
    cur: tuple[int, str] | None = None
    body: list[str] = []
    i = 0

    def flush():
        if cur is not None:
            out.append((cur[0], cur[1], " ".join(body).strip()))

    while i < len(lines):
        ln = lines[i]
        enc = _CJCS_ENCL.match(ln)
        num = _CJCS_NUMBERED.match(ln)
        glo = _GLOSSARY_HEAD.match(ln)
        if enc:
            flush()
            letter, name = enc.group(1), enc.group(2)
            if not name and i + 1 < len(lines) and _ALLCAPS_LINE.match(lines[i + 1]):
                name = lines[i + 1]
                i += 1
            cur, body = (ord(letter) - 64, name or f"ENCLOSURE {letter}"), []
        elif num:
            flush()
            cur, body = (int(num.group(1)), num.group(2).strip()), []
            if num.group(3):
                body.append(num.group(3))
        elif glo:
            flush()
            cur, body = (0, "GLOSSARY"), []
        elif cur is not None:
            body.append(ln)
        i += 1
    flush()
    return out


# ---------------------------------------------------------------------------
# Navy line parser (``section_parse/parsers/navy_parser.py`` +
# ``utils/navy_utils.py``: SECNAVINST/OPNAVINST-family pagebreak strip,
# plain ``3. NAME.`` AND hyphenated ``1-2. NAME.`` numbered headings,
# Appendix titles ending the numbered body, letter-dot subsections)
# ---------------------------------------------------------------------------

_NAVY_HEADER = re.compile(
    r"^((?:SECNAV|OPNAV|BUMED|BUPERS|COMNAVRESFORCOM)(?:INST|NOTE)\s+"
    r"\d{4,5}(?:\.\d{1,2})?[A-Z]?|MILPERSMAN\s+\d{4}-\d{3}|"
    r"(?:MCO|NAVMC|ALNAV)\s+\d{3,4}(?:\.\d{1,2})?[A-Z]?)\b"
)
_NAVY_HEAD_LINE = re.compile(r"^(\d{1,2})(?:-(\d{1,2}))?\s*\.\s+(.+?)\s*\.?\s*$")
# "Appendix A" titles, optionally preceded by a page tag like "A-1"
# (APPENDIX_TITLE_PATTERN's observable shape)
_NAVY_APPENDIX = re.compile(r"^(?:[A-Z] ?- ?\d{1,2}\s+)?APPENDIX\s+([A-Z])\s*$",
                            re.IGNORECASE)


def parse_navy_sections(text: str) -> list[tuple[int, str, str]]:
    """Line-oriented Navy-issuance parser (the ``NavyParser`` layout:
    SECNAVINST/OPNAVINST and friends). Observable contract:

    - pagebreak noise is stripped first (``_remove_pagebreaks``): the
      repeated issuance header (inferred from the first header-shaped
      line), ``DD Month YYYY`` date lines, bare page numbers;
    - ``3. NAME.`` plain and ``1-2. NAME.`` hyphenated numbered headings
      open sections (``match_number_dot_section`` /
      ``match_number_hyphenated_section``); the hyphenated form's
      within-chapter section index is the section number;
    - an ``APPENDIX X`` title line ends the numbered body and opens its
      own section, numbered 0 (``match_first_appendix_title`` semantics:
      the appendix bounds the last numbered section).

    Body lines accrue to the current section joined by spaces; preamble
    before the first heading is ignored, like the other strategies."""
    raw_lines = [ln.strip() for ln in text.split("\n")]
    header: str | None = None
    m = _NAVY_HEADER.match(raw_lines[0]) if raw_lines else None
    if m:
        header = m.group(1)
    lines: list[str] = []
    for i, ln in enumerate(raw_lines):
        if not ln or _PAGE_NUM.match(ln) or _CJCS_DATE.match(ln):
            continue
        if header and i > 0 and ln.startswith(header):
            continue
        lines.append(ln)

    out: list[tuple[int, str, str]] = []
    cur: tuple[int, str] | None = None
    body: list[str] = []

    def flush():
        if cur is not None:
            out.append((cur[0], cur[1], " ".join(body).strip()))

    for ln in lines:
        app = _NAVY_APPENDIX.match(ln)
        head = _NAVY_HEAD_LINE.match(ln)
        if app:
            flush()
            cur, body = (0, f"APPENDIX {app.group(1).upper()}"), []
        elif head:
            flush()
            num = int(head.group(2) or head.group(1))
            cur, body = (num, head.group(3)), []
        elif cur is not None:
            body.append(ln)
    flush()
    return out


def get_letter_dot_section(text: str, section_name: str) -> str:
    """First alphabetical-list subsection named ``section_name`` inside a
    section body (``navy_utils.py::get_letter_dot_section`` — the MCBUL
    purpose-within-situation quirk): ``a. Purpose. <body>`` runs to the
    next letter item, the next numbered item, or a blank line."""
    start = re.search(rf"(?:^|\n)\s*([a-zA-Z])\.\s*{section_name}", text,
                      flags=re.IGNORECASE)
    if not start:
        return ""
    letter = start.group(1)
    nxt = chr(ord(letter) + 1)
    rest = text[start.end():]
    end = None
    for pat in (rf"\n\s*({nxt})\.\s*", r"\n\s*[0-9]+\.\s", r"\n\s*\n", "\n"):
        end = re.search(pat, rest)
        if end:
            break
    stop = start.end() + end.start() if end else len(text)
    return text[start.start():stop].strip()


# type → strategy registry (ParserFactory.create dispatch,
# ``parsers/parser_factory.py`` analog); register new layouts here.
STRATEGIES: dict[str, Callable[[str], list[tuple[int, str, str]]]] = {
    "numbered": parse_numbered_sections,
    "caps": parse_caps_sections,
    "number_dot": parse_number_dot_sections,
    "enclosure": parse_enclosure_sections,
    "eo": parse_eo_sections,
    "uscode": parse_uscode_sections,
    "dod": parse_dod_sections,
    "cjcs": parse_cjcs_sections,
    "navy": parse_navy_sections,
}


def parse_sections(text: str, doc_layout: str) -> list[tuple[int, str, str]]:
    """Factory dispatch: unknown layouts fall back to the numbered parser
    (the reference defaults unknown doc types to its base parser)."""
    return STRATEGIES.get(doc_layout, parse_numbered_sections)(text)


# canonical named-section fields of the reference's doc_dict contract
# (``section_parse/add_sections.py:12-27`` — 13 named accessors +
# all_sections), matched by keyword on the parsed heading name
_FIELD_KEYWORDS: list[tuple[str, tuple[str, ...]]] = [
    ("responsibilities_section", ("RESPONSIBILIT",)),
    ("references_section", ("REFERENCE",)),
    ("purpose_section", ("PURPOSE",)),
    ("subject_section", ("SUBJECT",)),
    ("procedures_section", ("PROCEDURE",)),
    ("effective_date_section", ("EFFECTIVE DATE",)),
    ("applicability_section", ("APPLICABILIT",)),
    ("policy_section", ("POLICY", "POLICIES")),
    ("organizations_section", ("ORGANIZATION",)),
    ("definitions_section", ("DEFINITION",)),
    ("table_of_contents_section", ("TABLE OF CONTENTS",)),
    ("glossary_section", ("GLOSSARY",)),
    ("summary_of_change_section", ("SUMMARY OF CHANGE",)),
]


def sections_to_fields(sections: list[tuple[int, str, str]]) -> dict[str, list[str]]:
    """Classify parsed sections into the reference's named doc_dict fields
    (``add_sections.py:12-27``): each canonical field collects the bodies
    of headings matching its keyword (list — a document can repeat a
    heading across enclosures); ``all_sections`` keeps every body in
    document order. Unsupported/unmatched headings appear only in
    ``all_sections``, mirroring the reference's empty-list default for
    unsupported types."""
    out: dict[str, list[str]] = {name: [] for name, _ in _FIELD_KEYWORDS}
    out["all_sections"] = []
    for _num, name, body in sections:
        section_text = f"{name}. {body}".strip()
        out["all_sections"].append(section_text)
        upper = name.upper()
        for field, keys in _FIELD_KEYWORDS:
            if any(k in upper for k in keys):
                out[field].append(section_text)
                break
    return out

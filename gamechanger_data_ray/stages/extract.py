"""Document extraction stages: reference citations, dates, gazetteer
entities — the reference-parity operators behind M5/M6 and §2.9 dates.

- :class:`RefExtractor` mirrors the compiled-pattern reference library of
  ``common/document_parser/ref_utils.py:31-1228`` + ``lib/ref_list.py:10-86``:
  a dict of citation-type → compiled regex with exactly ONE capture group
  (the numeric part), a shared text preprocessor (unicode dash → "-",
  parentheses stripped, whitespace squashed), numeric range guards for
  Title (1–53) and CFR Title (1–50), and normalized "<Type> <num>" refs
  counted per document. The pattern set here is a representative public
  citation-format subset of the reference's 84; the contract (one group,
  guards, normalization) is identical.
- :class:`DateExtractor` mirrors ``lib/dates.py:9-162``: the four
  day-month-year / month-day-year long/short patterns, strptime-validated,
  merged into one per-doc date list.
- :class:`EntityExtractor` mirrors ``lib/entities.py:18-119`` +
  ``entities_utils.py:108-153``: a gazetteer with multi-word, OVERLAPPING
  terms and per-term types, matched longest-first with overlap removal
  (longer entities claim their spans; shorter terms only match what's
  left), per-doc mention counts and top-k entities. Matching runs as a
  masked replace chain — each term's occurrences are counted then blanked
  in strict (length desc, term asc) order — which is both vectorizable
  (one C-level pass per term over the whole batch) and exactly
  reproducible by a SQL oracle, unlike trie scan order.

All three are actor-pool stages: patterns/gazetteer compile once per
actor in ``__init__`` (ST1 pattern), batches stream through ``__call__``.
"""

from __future__ import annotations

import datetime
import re

import numpy as np
import pandas as pd


# ---------------------------------------------------------------------------
# References (M5)
# ---------------------------------------------------------------------------

def preprocess_text(text: str) -> str:
    """Unicode en-dash → '-', parentheses stripped, whitespace squashed
    (``ref_utils.py::preprocess_text`` semantics)."""
    text = text.replace("–", "-")
    text = re.sub(r"[()]", "", text)
    return " ".join(text.split())


def make_ref_patterns() -> dict[str, re.Pattern]:
    """Citation-type → compiled pattern; each has exactly one capture
    group holding the numeric part (``ref_utils.py::make_dict`` contract)."""
    p = {}
    num = r"([0-9]{4}\.[0-9]{1,3})"
    p["DoD"] = re.compile(r"\b(?:dod) ?" + num, re.IGNORECASE)
    p["DoDD"] = re.compile(r"\b(?:dod ?directives?|dodd) ?" + num, re.IGNORECASE)
    p["DoDI"] = re.compile(r"\b(?:dod ?instruction|dodi) ?" + num, re.IGNORECASE)
    p["DoDM"] = re.compile(r"\b(?:dod ?manual|dodm) ?" + num, re.IGNORECASE)
    p["DTM"] = re.compile(r"\bdtm ?-? ?([0-9]{2}-[0-9]{3})", re.IGNORECASE)
    p["AI"] = re.compile(r"\b(?:administrative ?instruction|ai) ?([0-9]+)", re.IGNORECASE)
    p["Title"] = re.compile(r"\btitle ?([0-9]{1,2})\b", re.IGNORECASE)
    p["CFR Title"] = re.compile(r"\b([0-9]{1,2}) ?cfr\b", re.IGNORECASE)
    p["EO"] = re.compile(r"\b(?:executive ?order|eo) ?([0-9]{4,5})", re.IGNORECASE)
    p["CJCSI"] = re.compile(r"\bcjcsi ?([0-9]{4}\.[0-9]{2}[a-z]?)", re.IGNORECASE)
    p["ICD"] = re.compile(r"\bicd ?([0-9]{1,3})\b", re.IGNORECASE)
    p["PL"] = re.compile(r"\b(?:public ?law|pl) ?([0-9]{2,3}-[0-9]{1,4})", re.IGNORECASE)
    return p


# numeric range guards (ref_list.py:41-56): out-of-range numbers are not refs
_RANGE_GUARDS = {"Title": (1, 53), "CFR Title": (1, 50)}


def collect_refs(text: str, patterns: dict[str, re.Pattern]) -> dict[str, int]:
    """All normalized references + counts in one text
    (``ref_list.py::collect_ref_list`` semantics)."""
    out: dict[str, int] = {}
    text = preprocess_text(text)
    for ref_type, pattern in patterns.items():
        for match in pattern.findall(text):
            if isinstance(match, tuple):
                vals = [x for x in match if x != ""]
                if len(vals) != 1:
                    continue
                match = vals[0]
            if match == "":
                continue
            guard = _RANGE_GUARDS.get(ref_type)
            if guard:
                try:
                    n = int(match.strip())
                except ValueError:
                    continue
                if not (guard[0] <= n <= guard[1]):
                    continue
            ref = f"{ref_type} {match.strip()}"
            out[ref] = out.get(ref, 0) + 1
    return out


class RefExtractor:
    """Actor-pool stage: (doc_id, text) batches → (doc_id, ref, n) rows.
    Patterns compile once per actor."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.patterns = make_ref_patterns()
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids, refs, counts = [], [], []
        for did, text in zip(df[self.id_col], df[self.text_col]):
            for ref, n in collect_refs(text, self.patterns).items():
                ids.append(did)
                refs.append(ref)
                counts.append(n)
        return pd.DataFrame({"doc_id": ids, "ref": refs, "n": counts}).astype(
            {"n": "int64"}
        )


# ---------------------------------------------------------------------------
# Dates (§2.9, lib/dates.py)
# ---------------------------------------------------------------------------

_MONTHS_LONG = (
    "january|february|march|april|may|june|july|august|september|october|november|december"
)
_MONTHS_SHORT = r"jan\.?|feb\.?|mar\.?|apr\.?|may\.?|jun\.?|jul\.?|aug\.?|sep\.?|sept\.?|oct\.?|nov\.?|dec\.?"

PAT_DAY_MONTH_YEAR = re.compile(
    rf"(\d{{1,2}}\s*(?:{_MONTHS_LONG})\s*,*\s*\d{{4}})", re.IGNORECASE
)
PAT_DAY_MONTH_YEAR_SHORT = re.compile(
    rf"(\d{{1,2}}\s*(?:{_MONTHS_SHORT})\s*,*\s*\d{{4}})", re.IGNORECASE
)
PAT_MONTH_DAY_YEAR = re.compile(
    rf"((?:{_MONTHS_LONG})\s*\d{{1,2}}\s*,*\s*\d{{4}})", re.IGNORECASE
)
PAT_MONTH_DAY_YEAR_SHORT = re.compile(
    rf"((?:{_MONTHS_SHORT})\s*\d{{1,2}}\s*,*\s*\d{{4}})", re.IGNORECASE
)


def _parse_all(matches: list[str], fmt: str, short: bool) -> list[datetime.datetime]:
    out = []
    for m in matches:
        s = " ".join(m.replace(",", "").replace(".", "").split())
        if short:
            s = s.lower().replace("sept", "sep")
        try:
            out.append(datetime.datetime.strptime(s, fmt))
        except ValueError:
            continue  # matched shape but not a real date (e.g. 31 Feb)
    return out


def extract_dates(text: str) -> list[datetime.datetime]:
    """All dates found by the four extractors, deduplicated, sorted
    (``dates.py::dates_to_list`` merge semantics)."""
    found = []
    found += _parse_all(PAT_DAY_MONTH_YEAR.findall(text), "%d %B %Y", False)
    found += _parse_all(PAT_DAY_MONTH_YEAR_SHORT.findall(text), "%d %b %Y", True)
    found += _parse_all(PAT_MONTH_DAY_YEAR.findall(text), "%B %d %Y", False)
    found += _parse_all(PAT_MONTH_DAY_YEAR_SHORT.findall(text), "%b %d %Y", True)
    return sorted(set(found))


class DateExtractor:
    """Actor-pool stage: (doc_id, text) → (doc_id, date) exploded rows."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ids, dates = [], []
        for did, text in zip(df[self.id_col], df[self.text_col]):
            for d in extract_dates(text):
                ids.append(did)
                dates.append(d)
        return pd.DataFrame(
            {"doc_id": pd.Series(ids, dtype="int64"),
             "date": pd.Series(dates, dtype="datetime64[us]")}
        )


# ---------------------------------------------------------------------------
# Entities (M6)
# ---------------------------------------------------------------------------

# (term, type) gazetteer with overlapping/nested multi-word terms — the
# GraphRelations Orgs/Roles analog. Case-sensitive, like the reference's
# KeywordProcessor(case_sensitive=True).
GAZETTEER: tuple[tuple[str, str], ...] = (
    ("Department of Defense", "ORG"),
    ("Defense", "ORG"),
    ("Joint Chiefs of Staff", "ORG"),
    ("Chiefs of Staff", "ORG"),
    ("Staff", "ORG"),
    ("General Counsel", "PERSON"),
    ("Counsel", "PERSON"),
    ("United States", "GPE"),
    ("States", "GPE"),
    ("European Union", "ORG"),
    ("Union", "ORG"),
    ("Secretary", "PERSON"),
)

_SENTINEL = "\x01"


def gazetteer_order(gaz=GAZETTEER) -> list[tuple[str, str]]:
    """Match priority: longest term first (overlap removal — a longer
    entity claims its span before any nested shorter term can), term asc
    as the deterministic tie-break."""
    return sorted(gaz, key=lambda t: (-len(t[0]), t[0]))


class EntityExtractor:
    """Actor-pool stage: per-doc gazetteer mention counts with overlap
    removal → (doc_id, entity, ent_type, n_mentions) edge rows (the K11
    graph-writer columnar form: Document-MENTIONS-Entity).

    Vectorized masked replace chain: for each term in priority order, one
    C-level ``str.count`` + ``str.replace`` pass over the whole batch
    column; replaced spans are masked with a sentinel so shorter nested
    terms cannot re-match them."""

    def __init__(self, id_col: str = "doc_id", text_col: str = "text"):
        self.terms = gazetteer_order()
        self.escaped = [(re.compile(re.escape(t)), t, ty) for t, ty in self.terms]
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        col = df[self.text_col]
        ids = df[self.id_col].to_numpy()
        frames = []
        for pat, term, ent_type in self.escaped:
            counts = col.str.count(pat).to_numpy()
            hit = counts > 0
            if hit.any():
                frames.append(
                    pd.DataFrame(
                        {
                            "doc_id": ids[hit],
                            "entity": term,
                            "ent_type": ent_type,
                            "n_mentions": counts[hit].astype("int64"),
                        }
                    )
                )
                col = col.str.replace(term, _SENTINEL * len(term), regex=False)
        if not frames:
            return pd.DataFrame(
                {"doc_id": pd.Series(dtype=df[self.id_col].dtype),
                 "entity": pd.Series(dtype="object"),
                 "ent_type": pd.Series(dtype="object"),
                 "n_mentions": pd.Series(dtype="int64")}
            )
        out = pd.concat(frames, ignore_index=True)
        return out.sort_values(["doc_id", "entity"]).reset_index(drop=True)


def top_entities(edges: pd.DataFrame, k: int = 5) -> pd.DataFrame:
    """Per-doc top-k entities by mention count (``entities.py:113-117``
    ``Counter(...).most_common(5)`` analog), deterministic tie-break."""
    e = edges.sort_values(["doc_id", "n_mentions", "entity"], ascending=[True, False, True])
    return e.groupby("doc_id", sort=False).head(k).reset_index(drop=True)

"""Extraction queries (M5 references, §2.9 dates, M6 entities, M13
sections) over the ``documents`` table.

The driver testdata text is lowercase and digit-free, so each query seeds
its corpus with DETERMINISTIC, SQL-constructible citation/date/entity/
section strings (arithmetic on ``doc_id``) — the Ray pipeline extracts
them with the real compiled-pattern/gazetteer/parser stages while the
DuckDB oracle builds the identical corpus and computes the expected
result; a broken pattern or parser shows up as a value mismatch. This
mirrors the reference's golden-fixture strategy
(``section_parse/tests/data``), but machine-checked per run.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..stages.extract import (
    GAZETTEER,
    DateExtractor,
    EntityExtractor,
    LookupEntityExtractor,
    RefExtractor,
    gazetteer_order,
    lookup_order,
    make_entities_lookup_dict,
)
from ..stages.sections import parse_sections
from . import common as cm

ORACLES: dict[str, str] = {}


# ---------------------------------------------------------------------------
# References
# ---------------------------------------------------------------------------

def _ref_suffix(doc_id: int) -> str:
    d4, d2 = 1000 + doc_id % 9000, 1 + doc_id % 99
    t, eo, cf = doc_id % 60, 12000 + doc_id % 2000, doc_id % 55
    s = f" see DoDD {d4}.{d2}"
    if doc_id % 3 == 0:
        s += f" and DoDD {d4}.{d2}"
    s += f" under Title {t} and EO {eo} per {cf} CFR"
    # one family from the wider library per doc, rotated by doc_id — every
    # driver run exercises 8 more pattern families end-to-end
    fam = doc_id % 8
    if fam == 0:
        s += f" with CJCSI {3000 + doc_id % 900}.{1 + doc_id % 9}"
    elif fam == 1:
        s += f" with JP {1 + doc_id % 7}-{doc_id % 10}"
    elif fam == 2:
        s += f" with AR {600 + doc_id % 100}-{1 + doc_id % 80}"
    elif fam == 3:
        s += f" with OPNAVINST {5000 + doc_id % 999}.{1 + doc_id % 99}"
    elif fam == 4:
        s += f" with STANAG {4000 + doc_id % 999}"
    elif fam == 5:
        s += f" with MIL-STD-{800 + doc_id % 199}"
    elif fam == 6:
        s += f" with MARADMIN {100 + doc_id % 899}/{10 + doc_id % 89}"
    else:
        s += f" with AFI {10 + doc_id % 80}-{2000 + doc_id % 999}"
    return s


_REF_SUFFIX_SQL = """
  ' see DoDD ' || (1000 + doc_id % 9000) || '.' || (1 + doc_id % 99)
  || CASE WHEN doc_id % 3 = 0
          THEN ' and DoDD ' || (1000 + doc_id % 9000) || '.' || (1 + doc_id % 99)
          ELSE '' END
  || ' under Title ' || (doc_id % 60) || ' and EO ' || (12000 + doc_id % 2000)
  || ' per ' || (doc_id % 55) || ' CFR'
"""

# the rotated wider-library citation, as SQL (same arithmetic as _ref_suffix)
_REF_FAMILY_SQL = """
  CASE doc_id % 8
    WHEN 0 THEN 'CJCSI ' || (3000 + doc_id % 900) || '.' || (1 + doc_id % 9)
    WHEN 1 THEN 'JP ' || (1 + doc_id % 7) || '-' || (doc_id % 10)
    WHEN 2 THEN 'AR ' || (600 + doc_id % 100) || '-' || (1 + doc_id % 80)
    WHEN 3 THEN 'OPNAVINST ' || (5000 + doc_id % 999) || '.' || (1 + doc_id % 99)
    WHEN 4 THEN 'STANAG ' || (4000 + doc_id % 999)
    WHEN 5 THEN 'MIL-STD ' || (800 + doc_id % 199)
    WHEN 6 THEN 'MARADMIN ' || (100 + doc_id % 899) || '/' || (10 + doc_id % 89)
    ELSE 'AFI ' || (10 + doc_id % 80) || '-' || (2000 + doc_id % 999)
  END
"""


def docs_ref_counts(sf_dir: str):
    """Reference-citation extraction (M5, ``ref_utils.py:31-1228`` +
    ``ref_list.py:10-86``): compiled pattern library + range guards,
    normalized "<Type> <num>" refs counted per doc. Actor pool compiles
    the patterns once per worker."""
    ds = cm.read(sf_dir, "documents", columns=["doc_id", "text"])

    def seed(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["text"] = df["text"] + df["doc_id"].map(_ref_suffix)
        return df

    ds = ds.map_batches(seed, batch_format="pandas")
    return ds.map_batches(
        RefExtractor, batch_format="pandas", concurrency=(1, cm.pool_size())
    )


# the oracle derives the EXPECTED refs closed-form from the same seeded
# corpus arithmetic, range guards included (Title 1-53, CFR Title 1-50)
ORACLES["docs_ref_counts"] = """
SELECT doc_id, ref, n FROM (
  SELECT doc_id,
         'DoDD ' || (1000 + doc_id % 9000) || '.' || (1 + doc_id % 99) AS ref,
         CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS n
  FROM documents
  UNION ALL
  SELECT doc_id, 'Title ' || (doc_id % 60), 1 FROM documents
  WHERE doc_id % 60 BETWEEN 1 AND 53
  UNION ALL
  SELECT doc_id, 'EO ' || (12000 + doc_id % 2000), 1 FROM documents
  UNION ALL
  SELECT doc_id, 'CFR Title ' || (doc_id % 55), 1 FROM documents
  WHERE doc_id % 55 BETWEEN 1 AND 50
  UNION ALL
  SELECT doc_id, {family}, 1 FROM documents
)
""".format(family=_REF_FAMILY_SQL)


# ---------------------------------------------------------------------------
# Dates
# ---------------------------------------------------------------------------

_LONG_MONTHS = ("January", "February", "March", "April", "May", "June", "July",
                "August", "September", "October", "November", "December")
_SHORT_MONTHS = ("Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul", "Aug", "Sep",
                 "Oct", "Nov", "Dec")


def _date_parts(doc_id: int):
    m1, d1, y1 = 1 + doc_id % 12, 1 + doc_id % 28, 1990 + doc_id % 30
    m2, d2, y2 = 1 + (doc_id + 5) % 12, 1 + (doc_id + 13) % 28, 2000 + (doc_id + 7) % 25
    m3, d3, y3 = 1 + (doc_id + 9) % 12, 1 + (doc_id + 3) % 28, 1980 + (doc_id + 11) % 40
    return (m1, d1, y1), (m2, d2, y2), (m3, d3, y3)


def _date_suffix(doc_id: int) -> str:
    (m1, d1, y1), (m2, d2, y2), (m3, d3, y3) = _date_parts(doc_id)
    s = f" signed {d1} {_LONG_MONTHS[m1 - 1]} {y1}"
    s += f" effective {_LONG_MONTHS[m2 - 1]} {d2}, {y2}"
    if doc_id % 4 == 0:
        s += f" amended {d3} {_SHORT_MONTHS[m3 - 1]}. {y3}"
    return s


def docs_dates(sf_dir: str):
    """Date extraction (§2.9, ``lib/dates.py:9-162``): the four
    day/month-order long/short regex extractors, strptime-validated,
    exploded to (doc_id, date) rows."""
    ds = cm.read(sf_dir, "documents", columns=["doc_id", "text"])

    def seed(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["text"] = df["text"] + df["doc_id"].map(_date_suffix)
        return df

    ds = ds.map_batches(seed, batch_format="pandas")
    return ds.map_batches(
        DateExtractor, batch_format="pandas", concurrency=(1, cm.pool_size())
    )


ORACLES["docs_dates"] = """
SELECT DISTINCT doc_id, date FROM (
  SELECT doc_id, CAST(make_timestamp(1990 + doc_id % 30, 1 + doc_id % 12,
                      1 + doc_id % 28, 0, 0, 0) AS TIMESTAMP) AS date
  FROM documents
  UNION ALL
  SELECT doc_id, CAST(make_timestamp(2000 + (doc_id + 7) % 25, 1 + (doc_id + 5) % 12,
                      1 + (doc_id + 13) % 28, 0, 0, 0) AS TIMESTAMP)
  FROM documents
  UNION ALL
  SELECT doc_id, CAST(make_timestamp(1980 + (doc_id + 11) % 40, 1 + (doc_id + 9) % 12,
                      1 + (doc_id + 3) % 28, 0, 0, 0) AS TIMESTAMP)
  FROM documents WHERE doc_id % 4 = 0
)
"""


# ---------------------------------------------------------------------------
# Entities
# ---------------------------------------------------------------------------

_ENTITY_SNIPPETS = (
    # full names + nested-term overlap (United States inside the Corps name)
    " The Department of Defense and the Joint Chiefs of Staff met with the Secretary of Defense.",
    # aliases + UPPER variants aggregate under the standardized name
    " The DoD briefed the General Counsel and the OSD. The DOD agreed.",
    # alias + full form of the same entity count together; NATO twice
    " The United States Marine Corps and the USMC trained. NATO and the North Atlantic Treaty Organization observed.",
    "",
)


def docs_entities(sf_dir: str):
    """Gazetteer entity extraction (M6, ``lib/entities.py:18-119`` +
    ``entities_utils.py:1-187``): alphanumeric-normalized text matched
    case-sensitively against the normalized lookup keys longest-first
    with sentinel masking (keep-the-longest overlap removal); ALIAS and
    UPPER-variant mentions aggregate under the standardized entity name;
    per-doc mention counts as Document-MENTIONS-Entity edge rows (K11
    graph-writer analog). The lookup dict builds once per actor (ST1)."""
    ds = cm.read(sf_dir, "documents", columns=["doc_id", "text"])

    def seed(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["text"] = df["text"] + df["doc_id"].mod(4).map(
            lambda r: _ENTITY_SNIPPETS[int(r)]
        )
        return df

    ds = ds.map_batches(seed, batch_format="pandas")
    return ds.map_batches(
        LookupEntityExtractor, batch_format="pandas", concurrency=(1, cm.pool_size())
    )


def _entities_oracle() -> str:
    """Build the replace-chain oracle: same seeded corpus, same
    normalization, same priority order, same sentinel masking, same
    alias→standardized-name aggregation — SQL derives the counts from
    the text, so the oracle exercises normalization + overlap-removal +
    alias semantics rather than hard-coding expected rows."""
    lookup = make_entities_lookup_dict()
    keys = lookup_order(lookup)
    case = (
        "CASE doc_id % 4 WHEN 0 THEN '" + _ENTITY_SNIPPETS[0] + "'"
        " WHEN 1 THEN '" + _ENTITY_SNIPPETS[1] + "'"
        " WHEN 2 THEN '" + _ENTITY_SNIPPETS[2] + "' ELSE '' END"
    )
    ctes = [
        "t0 AS (SELECT doc_id, regexp_replace(regexp_replace("
        f"text || {case}, '[^a-zA-Z0-9\\s]+', '', 'g'), "
        "'\\s{2,}', ' ', 'g') AS s FROM documents)"
    ]
    selects = []
    carry: list[str] = []
    for i, key in enumerate(keys, start=1):
        ln = len(key)
        cnt = f"c{i}"
        carried = ", ".join(
            carry + [f"(length(s) - length(replace(s, '{key}', ''))) // {ln} AS {cnt}"]
        )
        ctes.append(
            f"t{i} AS (SELECT doc_id, {carried}, "
            f"replace(s, '{key}', repeat(chr(1), {ln})) AS s FROM t{i - 1})"
        )
        carry.append(cnt)
        meta = lookup[key]
        selects.append(
            f"SELECT doc_id, '{meta['raw_ent']}' AS entity, "
            f"'{meta['ent_type']}' AS ent_type, {cnt} AS n FROM tfin"
        )
    ctes.append(f"tfin AS (SELECT * FROM t{len(keys)})")
    union = "\nUNION ALL\n".join(selects)
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT doc_id, entity, ent_type, CAST(SUM(n) AS BIGINT) AS n_mentions FROM ("
        + union
        + ") GROUP BY doc_id, entity, ent_type HAVING SUM(n) > 0"
    )


ORACLES["docs_entities"] = _entities_oracle()


# ---------------------------------------------------------------------------
# Sections
# ---------------------------------------------------------------------------

_SEC_NAMES = ("PURPOSE", "RESPONSIBILITIES", "PROCEDURES", "REFERENCES")


def _section_text(doc_id: int, text: str) -> tuple[str, str]:
    """(layout, sectioned text) — the per-type dispatch input, rotated
    over eight registered strategies by doc_id: numbered (DoD
    SECTION-colon), caps (CJCS heading sentences), number_dot (Navy
    ``1. Purpose.``), enclosure (DoD ``E1.``), eo (``Sec. 1.``), and the
    multi-pass line-oriented ``dod``, ``cjcs`` and ``navy`` parsers —
    whose synthetic docs get the full treatment they must survive:
    repeated page headers, a dotted-leader Table of Contents (dod), date
    lines and lettered enclosures (cjcs), SECNAVINST headers + an
    Appendix title (navy), and bare page numbers."""
    n = 2 + (1 if doc_id % 3 > 0 else 0) + (1 if doc_id % 3 == 2 else 0)
    bodies = [text, "duties", "steps", "list"]
    layout = ("numbered", "caps", "number_dot", "enclosure", "eo", "dod", "cjcs",
              "navy")[doc_id % 8]
    if layout == "navy":
        header = "SECNAVINST 5088.10A"
        lines = [header, "15 January 2024", f"1. {_SEC_NAMES[0]}.", bodies[0]]
        for i in range(1, n):
            lines += [header, str(i + 1), f"{i + 1}. {_SEC_NAMES[i]}.", bodies[i]]
        lines += ["A-1 APPENDIX A", "appendix body"]
        return layout, "\n".join(lines)
    if layout == "cjcs":
        header = "CJCSI 3150.25G"
        lines = [header, "15 January 2024", f"1. {_SEC_NAMES[0]}.", bodies[0]]
        for i in range(1, n):
            # RESPONSIBILITIES=B, PROCEDURES=C, REFERENCES=D (letter index
            # == the section number every other layout assigns)
            lines += [header, str(i + 2), f"ENCLOSURE {chr(65 + i)}",
                      _SEC_NAMES[i], bodies[i]]
        return layout, "\n".join(lines)
    if layout == "dod":
        header = "DoDI 5088.10, January 1, 2024"
        lines = [header, "TABLE OF CONTENTS"]
        lines += [
            f"SECTION {i + 1}: {_SEC_NAMES[i]} .......... {i + 3}" for i in range(n)
        ]
        for i in range(n):
            lines += [header, str(i + 3), f"SECTION {i + 1}: {_SEC_NAMES[i]}", bodies[i]]
        return layout, "\n".join(lines)
    fmt = {
        "numbered": " SECTION {i}: {name} {body}",
        "caps": " {name}. {body}",
        "number_dot": " {i}. {name}. {body}",
        "enclosure": " E{i}. {name} {body}",
        "eo": " Sec. {i}. {name}. {body}",
    }[layout]
    parts = [
        fmt.format(i=i + 1, name=_SEC_NAMES[i], body=bodies[i]) for i in range(n)
    ]
    return layout, "".join(parts)


def docs_sections(sf_dir: str):
    """Section parsing with per-type strategy dispatch (M13,
    ``section_parse/add_sections.py:5-27`` + the DoD/CJCS parser family):
    even docs carry the numbered-heading layout, odd docs the all-caps
    layout; the factory picks the strategy per row and emits
    (doc_id, sec_num, sec_name) in document order."""
    ds = cm.read(sf_dir, "documents", columns=["doc_id", "text"])

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        ids, nums, names = [], [], []
        for did, text in zip(df["doc_id"], df["text"]):
            layout, body = _section_text(int(did), text)
            for num, name, _ in parse_sections(body, layout):
                ids.append(did)
                nums.append(num)
                names.append(name)
        return pd.DataFrame(
            {"doc_id": pd.Series(ids, dtype="int64"),
             "sec_num": pd.Series(nums, dtype="int64"),
             "sec_name": pd.Series(names, dtype="object")}
        )

    return ds.map_batches(parse, batch_format="pandas")


ORACLES["docs_sections"] = """
SELECT doc_id, sec_num, sec_name FROM (
  SELECT doc_id, 0 AS sec_num, 'TABLE OF CONTENTS' AS sec_name
  FROM documents WHERE doc_id % 8 = 5
  UNION ALL
  SELECT doc_id, 0, 'APPENDIX A' FROM documents WHERE doc_id % 8 = 7
  UNION ALL
  SELECT doc_id, 1, 'PURPOSE' FROM documents
  UNION ALL
  SELECT doc_id, 2, 'RESPONSIBILITIES' FROM documents
  UNION ALL
  SELECT doc_id, 3, 'PROCEDURES' FROM documents WHERE doc_id % 3 > 0
  UNION ALL
  SELECT doc_id, 4, 'REFERENCES' FROM documents WHERE doc_id % 3 = 2
)
"""


def _resp_synth(doc_id: int) -> str:
    """Deterministic RESPONSIBILITIES section for ``doc_id``: 1-3 roles
    (``2.<r>.`` numbering, acronym + "shall:" cue), 1-3 duties each, with
    BOTH the role line and the last duty line wrapped across physical
    lines and a GLOSSARY break. Shared by ``docs_responsibilities`` and
    the HAS_AUTHORITY_OVER leg of ``docs_graph_edges``."""
    lines = ["SECTION 2: RESPONSIBILITIES"]
    for r in range(1, 2 + doc_id % 3):
        # role line wrapped after the office name (continuation merge)
        lines.append(f"2.{r}. DIRECTOR, OFFICE {r}")
        lines.append(f"(DO{r}). The Director shall:")
        n_resp = 1 + (doc_id + r) % 3
        for k in range(1, n_resp + 1):
            if k == n_resp:
                lines.append(f"{chr(96 + k)}. performs duty {doc_id * 10 + r}")
                lines.append(f"item {k}.")
            else:
                lines.append(
                    f"{chr(96 + k)}. performs duty {doc_id * 10 + r} item {k}."
                )
    lines += ["GLOSSARY", "x. must never appear."]
    return "\n".join(lines)


def docs_responsibilities(sf_dir: str):
    """Responsibility extraction (M13 depth; reference
    ``responsibility_parse/responsibility_parser.py``): each doc gets a
    deterministic RESPONSIBILITIES section — 1-3 roles (``2.<r>.``
    numbering, acronym + "shall:" cue), 1-3 duties each (``a.``/``b.``/
    ``c.``), with BOTH the role line and the last duty line wrapped
    across physical lines (the PDF line-wrap the parser must re-merge)
    and a GLOSSARY break that must stop parsing. The real parser
    (``stages/responsibilities.py``) runs in the map; the DuckDB oracle
    regenerates the expected (role, duty) rows arithmetically."""
    from ..stages.responsibilities import responsibility_rows

    ds = cm.read(sf_dir, "documents", columns=["doc_id"])

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for did in df["doc_id"]:
            rows.extend(responsibility_rows(_resp_synth(int(did)), int(did)))
        out = pd.DataFrame(
            rows,
            columns=["doc_id", "role_numbering", "role_text",
                     "resp_numbering", "resp_text"],
        )
        return out.astype({"doc_id": "int64"})

    return ds.map_batches(parse, batch_format="pandas")


ORACLES["docs_responsibilities"] = """
WITH roles AS (
  SELECT doc_id, CAST(i.i + 1 AS BIGINT) AS r
  FROM documents CROSS JOIN (SELECT UNNEST(range(3)) AS i) i
  WHERE i.i < 1 + doc_id % 3
), resps AS (
  SELECT doc_id, r, CAST(k.k + 1 AS BIGINT) AS k
  FROM roles CROSS JOIN (SELECT UNNEST(range(3)) AS k) k
  WHERE k.k < 1 + (doc_id + r) % 3
)
SELECT doc_id,
       '2.' || r || '.' AS role_numbering,
       'DIRECTOR, OFFICE ' || r || ' (DO' || r || '). The Director shall:'
         AS role_text,
       chr(96 + CAST(k AS INT)) || '.' AS resp_numbering,
       'performs duty ' || (doc_id * 10 + r) || ' item ' || k || '.'
         AS resp_text
FROM resps
"""


_OCR_SUFFIX = " — café №42"  # non-ASCII payload the corruption mangles


def docs_ocr_repair(sf_dir: str):
    """Batched re-OCR orchestration (M17; ``process.py:189-239`` +
    ``gc_ocr/utils.py:49-158``): every third doc's text arrives
    latin-1-mis-decoded (the classic ingest mojibake — a REAL corruption
    with a REAL inverse), the gate flags exactly those rows by the
    multi-byte-lead signature, and only they enter the heavy repair path
    (``stages/ocr.py::ReocrRouter``, dedicated actor pool, small
    batches). Byte-exact oracle: md5 of the post-repair text equals md5
    of the uncorrupted source for EVERY row — a missed detection, false
    repair, or lossy inverse all hash-mismatch."""
    import hashlib as _hl

    from ..stages.ocr import ReocrRouter

    ds = cm.read(sf_dir, "documents", columns=["doc_id", "text"])

    def corrupt(df: pd.DataFrame) -> pd.DataFrame:
        clean = df["text"] + _OCR_SUFFIX
        bad = df["doc_id"] % 3 == 0
        df = df.assign(text=clean)
        df.loc[bad, "text"] = df.loc[bad, "text"].map(
            lambda s: s.encode("utf-8").decode("latin-1")
        )
        return df

    repaired = ds.map_batches(corrupt, batch_format="pandas").map_batches(
        ReocrRouter,
        batch_format="pandas",
        concurrency=(1, cm.pool_size()),
        batch_size=128,
    )

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"].astype("int64"),
                "was_repaired": df["was_repaired"].astype("int64"),
                "text_md5": df["text"].map(
                    lambda s: _hl.md5(s.encode("utf-8")).hexdigest()
                ),
            }
        )

    return repaired.map_batches(project, batch_format="pandas")


ORACLES["docs_ocr_repair"] = f"""
SELECT doc_id,
       CAST(doc_id % 3 = 0 AS BIGINT) AS was_repaired,
       md5(text || ' — café №42') AS text_md5
FROM documents
"""


# ---------------------------------------------------------------------------
# Page/paragraph segmentation (M3/M4) — module-level (pytest-oracled)
# ---------------------------------------------------------------------------

_PAGE_WORDS = 40
_PAR_WORDS = 10


def docs_paragraphs(sf_dir: str):
    """Page + paragraph segmentation (M3/M4,
    ``common/document_parser/lib/pages.py:20-33`` +
    ``document/document.py:79-130``): each doc's word stream splits into
    fixed-size pages (40 words) of paragraphs (10 words), emitting the
    doc_dict-shaped nested rows (doc_id, page_num, par_num, par_text,
    n_words). A WITHIN-RECORD explode — one doc's pages never cross rows,
    so the whole segmentation is one map_batches, no shuffle."""
    import numpy as np

    ds = cm.read(sf_dir, "documents", columns=["doc_id", "text"])

    def segment(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].str.split(" ")
        exploded = pd.DataFrame(
            {
                "doc_id": np.repeat(df["doc_id"].to_numpy(), words.str.len()),
                "word": np.concatenate(words.to_numpy()),
            }
        )
        pos = exploded.groupby("doc_id", sort=False).cumcount()
        exploded["page_num"] = (pos // _PAGE_WORDS).astype("int64")
        exploded["par_num"] = ((pos % _PAGE_WORDS) // _PAR_WORDS).astype("int64")
        out = exploded.groupby(["doc_id", "page_num", "par_num"], as_index=False, sort=False).agg(
            par_text=("word", " ".join), n_words=("word", "size")
        )
        return out.astype({"n_words": "int64"})

    return ds.map_batches(segment, batch_format="pandas")


ORACLES["docs_paragraphs"] = f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
         unnest(range(len(string_split(text, ' ')))) AS pos
  FROM documents
)
SELECT doc_id,
       CAST(pos // {_PAGE_WORDS} AS BIGINT) AS page_num,
       CAST((pos % {_PAGE_WORDS}) // {_PAR_WORDS} AS BIGINT) AS par_num,
       string_agg(word, ' ' ORDER BY pos) AS par_text,
       COUNT(*) AS n_words
FROM words
GROUP BY doc_id, pos // {_PAGE_WORDS}, (pos % {_PAGE_WORDS}) // {_PAR_WORDS}
"""


# ---------------------------------------------------------------------------
# Cross-corpus paragraph-level exact dedup — module-level (SQL-oracled)
# ---------------------------------------------------------------------------

# Composite position key so the canonical occurrence (lexicographic min of
# (doc_id, page_num, par_num)) survives a plain mergeable MIN aggregate:
# par_num < 4 by construction (_PAGE_WORDS/_PAR_WORDS), page_num gets 2^20
# (≈40M words/doc), leaving doc_id ≤ 2^39 — documented scale bound.
_PAR_POS_PAGE = 1 << 4
_PAR_POS_DOC = 1 << 24


def dedup_paragraphs(sf_dir: str):
    """Cross-document PARAGRAPH-level exact dedup (the unit the big
    training-data dedup pipelines operate on — boilerplate headers /
    license blocks repeat across documents even when whole docs differ).
    Segment (same M3/M4 grid as :func:`docs_paragraphs`) → sha256 the
    paragraph text → per-batch combiner keeps one candidate per hash →
    routed distributed finish: MIN over an order-preserving composite
    position key picks the canonical first occurrence, SUM counts copies.
    No driver-side state; one shuffle of (hash, pos, count) partials."""
    import numpy as np

    from ..core.hashing import sha256_hex

    ds = cm.read(sf_dir, "documents", columns=["doc_id", "text"])

    def par_partial(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].str.split(" ")
        e = pd.DataFrame(
            {
                "doc_id": np.repeat(df["doc_id"].to_numpy(), words.str.len()),
                "word": np.concatenate(words.to_numpy()),
            }
        )
        pos = e.groupby("doc_id", sort=False).cumcount()
        e["page_num"] = (pos // _PAGE_WORDS).astype("int64")
        e["par_num"] = ((pos % _PAGE_WORDS) // _PAR_WORDS).astype("int64")
        pars = e.groupby(["doc_id", "page_num", "par_num"], as_index=False, sort=False).agg(
            par_text=("word", " ".join)
        )
        pars["content_hash"] = sha256_hex(pars["par_text"].tolist())
        pars["pos_key"] = (
            pars["doc_id"] * _PAR_POS_DOC
            + pars["page_num"] * _PAR_POS_PAGE
            + pars["par_num"]
        ).astype("int64")
        # combiner: one candidate + local copy count per hash per batch
        return pars.groupby("content_hash", as_index=False).agg(
            pos_key=("pos_key", "min"), n_copies=("pos_key", "size")
        ).astype({"n_copies": "int64"})

    partials = ds.map_batches(par_partial, batch_format="pandas")
    merged = cm.routed_grouped_agg(
        partials, ["content_hash"], {"pos_key": "min", "n_copies": "sum"}
    )

    def decode(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["doc_id"] = df["pos_key"] // _PAR_POS_DOC
        df["page_num"] = (df["pos_key"] % _PAR_POS_DOC) // _PAR_POS_PAGE
        df["par_num"] = df["pos_key"] % _PAR_POS_PAGE
        return df[["content_hash", "doc_id", "page_num", "par_num", "n_copies"]]

    return merged.map_batches(decode, batch_format="pandas")


ORACLES["dedup_paragraphs"] = f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word,
         unnest(range(len(string_split(text, ' ')))) AS pos
  FROM documents
), pars AS (
  SELECT doc_id,
         CAST(pos // {_PAGE_WORDS} AS BIGINT) AS page_num,
         CAST((pos % {_PAGE_WORDS}) // {_PAR_WORDS} AS BIGINT) AS par_num,
         string_agg(word, ' ' ORDER BY pos) AS par_text
  FROM words
  GROUP BY doc_id, pos // {_PAGE_WORDS}, (pos % {_PAGE_WORDS}) // {_PAR_WORDS}
), ranked AS (
  SELECT sha256(par_text) AS content_hash, doc_id, page_num, par_num,
         ROW_NUMBER() OVER (
           PARTITION BY par_text ORDER BY doc_id, page_num, par_num
         ) AS rn,
         COUNT(*) OVER (PARTITION BY par_text) AS n_copies
  FROM pars
)
SELECT content_hash, doc_id, page_num, par_num, n_copies
FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# TF-IDF topics (M7) — module-level (pytest-oracled)
# ---------------------------------------------------------------------------

def docs_topics(sf_dir: str, k: int = 5):
    """Topic extraction with a real model artifact (M7,
    ``common/document_parser/lib/topics.py:1-40``): pass 1 fits the model
    — per-term document frequencies via per-batch distinct partials +
    small groupby, idf = ln(N/df) — which is then broadcast once; pass 2
    is a :class:`~gamechanger_data_ray.stages.text.TopicScorer` actor
    pool emitting each doc's top-k terms by tf·idf."""
    import math

    from ..stages.text import TopicScorer

    docs = cm.read(sf_dir, "documents", columns=["doc_id", "text"])
    n_docs = docs.count()

    def distinct_partial(df: pd.DataFrame) -> pd.DataFrame:
        e = df.assign(word=df["text"].str.split(" ")).explode("word")
        return e[["doc_id", "word"]].drop_duplicates()

    df_counts = cm.partial_groupby_sum(
        docs.map_batches(distinct_partial, batch_format="pandas"),
        keys=["word"], sums={}, counts="df",
    )
    idf = pd.DataFrame(
        {"term": df_counts["word"],
         "idf": [math.log(n_docs / d) for d in df_counts["df"]]}
    )
    idf_ref = cm.broadcast(idf)
    return docs.map_batches(
        TopicScorer,
        fn_constructor_args=(idf_ref, k),
        batch_format="pandas",
        concurrency=(1, cm.pool_size()),
    )


ORACLES["docs_topics"] = """
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
), dfreq AS (
  SELECT word, COUNT(DISTINCT doc_id) AS df FROM words GROUP BY word
), n AS (SELECT COUNT(*) AS n FROM documents),
tf AS (
  SELECT doc_id, word, COUNT(*) AS tf FROM words GROUP BY doc_id, word
), scored AS (
  SELECT doc_id, word AS topic,
         ROUND(tf * ln(CAST(n.n AS DOUBLE) / dfreq.df), 6) AS tfidf,
         ROW_NUMBER() OVER (
           PARTITION BY doc_id
           ORDER BY ROUND(tf * ln(CAST(n.n AS DOUBLE) / dfreq.df), 6) DESC, word
         ) AS rn
  FROM tf JOIN dfreq USING (word), n
)
SELECT doc_id, topic, tfidf FROM scored WHERE rn <= 5
"""


# ---------------------------------------------------------------------------
# PII detection + redaction (training-data extension; module-level)
# ---------------------------------------------------------------------------

def _pii_suffix(doc_id: int) -> str:
    d = doc_id
    s = f" contact user{d}@example.mil"
    if d % 3 == 0:
        s += f" and admin{d}@example.mil"
    if d % 2 == 1:
        s += f" call {200 + d % 700}-555-{d % 10000:04d}"
    if d % 4 == 0:
        s += f" ssn {100 + d % 899:03d}-{10 + d % 89:02d}-{1000 + d % 8999:04d}"
    if d % 5 == 0:
        s += f" host 10.{d % 256}.{d % 100}.{1 + d % 254}"
    return s


def docs_pii(sf_dir: str):
    """PII detection + redaction (`stages/pii.py::PiiRedactor`): corpus
    seeded with deterministic emails/phones/SSNs/IPs; the stage counts
    each type on the original text, redacts sequentially, and proves the
    redaction by re-scanning (n_residual == 0 for every row)."""
    from ..stages.pii import PiiRedactor

    ds = cm.read(sf_dir, "documents", columns=["doc_id", "text"])

    def seed(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["text"] = df["text"] + df["doc_id"].map(_pii_suffix)
        return df

    ds = ds.map_batches(seed, batch_format="pandas")
    out = ds.map_batches(
        PiiRedactor, batch_format="pandas", concurrency=(1, cm.pool_size())
    )
    return out.select_columns(
        ["doc_id", "n_email", "n_ssn", "n_phone", "n_ipv4", "n_residual"]
    )


# counts are closed-form from the seeding arithmetic; n_residual == 0 is
# the redaction proof (the Ray side measures it, the oracle asserts it)
ORACLES["docs_pii"] = """
SELECT doc_id,
       (1 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_email,
       (CASE WHEN doc_id % 4 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_ssn,
       (CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END)::BIGINT AS n_phone,
       (CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_ipv4,
       0::BIGINT AS n_residual
FROM documents
"""


# ---------------------------------------------------------------------------
# Typed graph edges (K11 depth)
# ---------------------------------------------------------------------------

def docs_graph_edges(sf_dir: str):
    """Typed graph-edge union (K11 depth; the reference's
    ``gc_neo4j_publisher/neo4j_publisher.py:122-172`` +
    ``utils.py:130-146`` emit MENTIONS, REFERENCES and
    HAS_AUTHORITY_OVER relations into Neo4j — here the same typed edges
    land as ONE columnar edge table, the shape a graph bulk-importer or
    a distributed join consumes):

    - ``doc -[MENTIONS]-> entity`` — the gazetteer mention counts of
      :func:`docs_entities` (weight = n_mentions);
    - ``doc -[REFERENCES]-> doc`` — the normalized citations of
      :func:`docs_ref_counts`, each a document-to-document edge
      (weight = citation count), the ``ref_list`` → REFERENCES edge
      build of ``neo4j_publisher.py:151-172``;
    - ``role -[HAS_AUTHORITY_OVER]-> office`` — the role hierarchy the
      REAL responsibility parser (``stages/responsibilities.py``)
      extracts from each doc's RESPONSIBILITIES section: the assigned
      role has authority over the office it directs (one edge per
      parsed role block — ``utils.py:130-146``'s Role/Org hierarchy
      analog).

    Output: (doc_id, src, rel, dst, weight); node ids carry a
    ``doc:``/``ent:`` type prefix. All three legs run their real
    extraction stages; the oracle rebuilds the identical edges from the
    seeding arithmetic (and the entities leg's replace-chain SQL)."""
    import re as _re

    from ..stages.responsibilities import extract_numbering, parse_responsibility_section

    def ment_edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"),
             "src": "doc:" + df["doc_id"].astype(str),
             "rel": "MENTIONS",
             "dst": "ent:" + df["entity"].astype(str),
             "weight": df["n_mentions"].astype("int64")}
        )

    def ref_edges(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": df["doc_id"].astype("int64"),
             "src": "doc:" + df["doc_id"].astype(str),
             "rel": "REFERENCES",
             "dst": "doc:" + df["ref"].astype(str),
             "weight": df["n"].astype("int64")}
        )

    office_re = _re.compile(r"OFFICE \d+")

    def auth_edges(df: pd.DataFrame) -> pd.DataFrame:
        ids, srcs, dsts = [], [], []
        for did in df["doc_id"]:
            for block in parse_responsibility_section(_resp_synth(int(did))):
                _num, role_text = extract_numbering(block[0])
                role = role_text.split(" (")[0]
                m = office_re.search(role)
                if m is None:
                    continue
                ids.append(int(did))
                srcs.append(f"ent:{role}")
                dsts.append(f"ent:{m.group(0)}")
        return pd.DataFrame(
            {"doc_id": pd.Series(ids, dtype="int64"),
             "src": pd.Series(srcs, dtype="object"),
             "rel": pd.Series(["HAS_AUTHORITY_OVER"] * len(ids), dtype="object"),
             "dst": pd.Series(dsts, dtype="object"),
             "weight": pd.Series([1] * len(ids), dtype="int64")}
        )

    mentions = docs_entities(sf_dir).map_batches(ment_edges, batch_format="pandas")
    refs = docs_ref_counts(sf_dir).map_batches(ref_edges, batch_format="pandas")
    auth = cm.read(sf_dir, "documents", columns=["doc_id"]).map_batches(
        auth_edges, batch_format="pandas"
    )
    return mentions.union(refs).union(auth)


# the MENTIONS and REFERENCES legs reuse the already-verified oracles of
# docs_entities / docs_ref_counts as derived tables, so the edge oracle
# can never drift from the per-leg oracles
ORACLES["docs_graph_edges"] = """
SELECT doc_id, src, rel, dst, CAST(weight AS BIGINT) AS weight FROM (
  SELECT doc_id, 'doc:' || doc_id AS src, 'MENTIONS' AS rel,
         'ent:' || entity AS dst, n_mentions AS weight
  FROM ({entities}) ment
  UNION ALL
  SELECT doc_id, 'doc:' || doc_id, 'REFERENCES', 'doc:' || ref, n
  FROM ({refs}) refsub
  UNION ALL
  SELECT doc_id, 'ent:DIRECTOR, OFFICE ' || r, 'HAS_AUTHORITY_OVER',
         'ent:OFFICE ' || r, 1
  FROM (SELECT doc_id, CAST(i.i + 1 AS BIGINT) AS r
        FROM documents CROSS JOIN (SELECT UNNEST(range(3)) AS i) i
        WHERE i.i < 1 + doc_id % 3) roles
)
""".format(entities=ORACLES["docs_entities"], refs=ORACLES["docs_ref_counts"])


# ---------------------------------------------------------------------------
# Real-OCR orchestration (M17 with an actual image→text engine)
# ---------------------------------------------------------------------------

def docs_ocr_glyph(sf_dir: str):
    """Re-OCR with a REAL image→text engine end-to-end (M17;
    ``process.py:189-239`` + ``gc_ocr/utils.py:49-158``): every doc gets
    a deterministic two-line page text rendered into a REAL P6 page
    image (``stages/glyph_ocr.render_page_ppm`` through the repo's PPM
    codec, with doc_id-seeded scanner noise); every third doc's TEXT
    column arrives destroyed (replacement-char flood). The
    ``PageImageReocrRouter`` actor pool flags exactly those rows and
    recovers their text from the page image by template-matching OCR —
    so the oracle's exact text match proves the
    rasterize→corrupt→flag→recognize→rejoin loop bit-for-bit, noise
    included. Clean rows never decode their payload. MIXED FONTS
    (round 5): even doc_ids render in the fixed-pitch 5×7 atlas, odd in
    the proportional valley-segmented 7×9 atlas — the engine's per-page
    confidence router must pick the right recognizer for every page."""
    from ..stages.glyph_ocr import render_page_ppm, render_page_ppm_prop
    from ..stages.ocr import PageImageReocrRouter

    ds = cm.read(sf_dir, "documents", columns=["doc_id"])

    def page_text(doc_id: int) -> str:
        return (f"DOC {doc_id} CODE {doc_id % 97}: STATUS OK.\n"
                f"TOKENS {doc_id % 53}-{doc_id % 7}.")

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["doc_id"].astype(int)
        true_text = ids.map(page_text)
        return pd.DataFrame(
            {"doc_id": ids.astype("int64"),
             "text": [("�" * 12) if i % 3 == 0 else t
                      for i, t in zip(ids, true_text)],
             "page_image": [
                 (render_page_ppm if i % 2 == 0 else render_page_ppm_prop)(
                     t, noise_bits=int(i % 3), seed=int(i))
                 for i, t in zip(ids, true_text)
             ]}
        )

    pages = ds.map_batches(synth, batch_format="pandas")
    out = pages.map_batches(
        PageImageReocrRouter,
        batch_format="pandas",
        batch_size=64,  # wide binary payload rows
        concurrency=(1, cm.pool_size()),
    )
    return out.select_columns(["doc_id", "text", "was_repaired"])


ORACLES["docs_ocr_glyph"] = """
SELECT doc_id,
       'DOC ' || doc_id || ' CODE ' || (doc_id % 97) || ': STATUS OK.'
         || chr(10) || 'TOKENS ' || (doc_id % 53) || '-' || (doc_id % 7) || '.'
         AS text,
       doc_id % 3 = 0 AS was_repaired
FROM documents
"""


# ---------------------------------------------------------------------------
# Composed parsed-doc output + the declarative validation gate (the
# reference's parse --verify: common/document_parser/cli.py:75-81 →
# validators.py::verify → output_schema.json:1-385). Module-level,
# pytest-verified (tests/test_validate.py).
# ---------------------------------------------------------------------------


def parsed_docs(sf_dir: str, verify: bool = False):
    """The full nested doc_dict-shaped output row per document — the
    repo analog of the reference's parsed-JSON contract: top-level
    metadata (word_count, version_hash), ref_list, the entities buckets,
    and the nested pages→paragraphs shape (same 40-word pages / 10-word
    paragraphs as :func:`docs_paragraphs`). One map_batches — page and
    paragraph assembly never crosses docs, so there is no shuffle; the
    nested-object construction is inherently per-row (it builds ONE
    struct per document, the parse-output shape itself), bounded by
    batch size like the reference's per-file json.dump.

    ``verify=True`` streams the output through the declarative schema
    gate (``stages/validate.py::validate_docs(mode='strict')``) — the
    ``--verify`` switch of the reference's parse CLI."""
    from ..core.hashing import version_hash_column
    from ..stages.extract import make_ref_patterns, parse_entities
    from ..stages.validate import DOC_OUTPUT_SCHEMA, validate_docs

    ds = cm.read(sf_dir, "documents", columns=["doc_id", "text"])

    _PAGE, _PAR = _PAGE_WORDS, _PAR_WORDS

    class Assemble:
        def __init__(self):
            from ..stages.extract import collect_refs_batched  # noqa: F401

            self.patterns = make_ref_patterns()

        def __call__(self, t: pa.Table) -> pa.Table:
            from ..stages.extract import collect_refs_batched

            texts = t["text"].to_pylist()
            ids = t["doc_id"].to_pylist()
            vhash = version_hash_column(t, ["text"]).to_pylist()
            refs = collect_refs_batched(texts, self.patterns)
            docs = []
            for did, text, vh, ref in zip(ids, texts, vhash, refs):
                words = text.split()
                pages = []
                for p0 in range(0, len(words), _PAGE):
                    pw = words[p0 : p0 + _PAGE]
                    paragraphs = [
                        {
                            "par_num": j // _PAR,
                            "par_text": " ".join(pw[j : j + _PAR]),
                            "n_words": len(pw[j : j + _PAR]),
                        }
                        for j in range(0, len(pw), _PAR)
                    ]
                    pages.append({"page_num": p0 // _PAGE,
                                  "paragraphs": paragraphs})
                ents = parse_entities(text)
                docs.append({
                    "doc_id": f"doc-{did:08d}",
                    "filename": f"doc-{did:08d}.pdf",
                    "page_count": len(pages),
                    "par_count": sum(len(p["paragraphs"]) for p in pages),
                    "word_count": len(words),
                    "version_hash": vh,
                    "ref_list": sorted(ref),
                    "entities": {"ORG_s": ents, "PERSON_s": []},
                    "pages": pages,
                })
            par_t = pa.struct([("par_num", pa.int64()),
                               ("par_text", pa.string()),
                               ("n_words", pa.int64())])
            page_t = pa.struct([("page_num", pa.int64()),
                                ("paragraphs", pa.list_(par_t))])
            schema = pa.schema([
                ("doc_id", pa.string()), ("filename", pa.string()),
                ("page_count", pa.int64()), ("par_count", pa.int64()),
                ("word_count", pa.int64()), ("version_hash", pa.string()),
                ("ref_list", pa.list_(pa.string())),
                ("entities", pa.struct([("ORG_s", pa.list_(pa.string())),
                                        ("PERSON_s", pa.list_(pa.string()))])),
                ("pages", pa.list_(page_t)),
            ])
            return pa.Table.from_pylist(docs, schema=schema)

    out = ds.map_batches(Assemble, batch_format="pyarrow",
                         concurrency=(1, cm.pool_size()))
    if verify:
        out = validate_docs(out, DOC_OUTPUT_SCHEMA, mode="strict")
    return out

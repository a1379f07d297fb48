"""Text-analysis / dedup / similarity / multimodal queries over testdata.

SQL-expressible ops carry a DuckDB oracle with identical column names;
heuristic/approximate ops (langid, fingerprint, LSH, simhash, IVF) are
rows-only checked by the driver and verified against pure-python oracles in
``tests/test_dedup.py`` / ``tests/test_text.py``.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..stages import dedup as dd
from ..stages import multimodal as mm
from ..stages import similarity as sim
from ..stages.text import (
    STOPWORDS,
    TOKEN_PATTERN,
    Fingerprinter,
    LangId,
    QualityScorer,
    TokenCounter,
)
from . import common as cm

ORACLES: dict[str, str] = {}


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

def text_token_count(sf_dir: str):
    """BPE-ish regex token counting (M11 word-count analog) — compiled
    pattern once per actor, vectorized batches."""
    ds = cm.read(sf_dir, "documents", columns=["doc_id", "text"])
    ds = ds.map_batches(TokenCounter, batch_format="pandas", concurrency=(1, cm.pool_size()))
    return ds.select_columns(["doc_id", "n_tokens"])


ORACLES["text_token_count"] = f"""
SELECT doc_id, len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS n_tokens
FROM documents
"""


def text_quality(sf_dir: str):
    """Quality scoring: word count, stopword ratio, mean word length."""
    ds = cm.read(sf_dir, "documents", columns=["doc_id", "text"])
    ds = ds.map_batches(QualityScorer, batch_format="pandas", concurrency=(1, cm.pool_size()))
    return ds.select_columns(["doc_id", "n_words", "stopword_ratio", "mean_word_len"])


_STOPLIST_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)
ORACLES["text_quality"] = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_words,
       len(list_filter(string_split(text, ' '), x -> x IN ({_STOPLIST_SQL})))
         / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
       (length(text) - (len(string_split(text, ' ')) - 1))
         / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_word_len
FROM documents
"""


_GOPHER_REQUIRED = ("the", "be", "to", "of", "and", "that", "have", "with")


def docs_quality_gopher(sf_dir: str):
    """The Gopher quality-rule bundle (Rae et al. 2021, arXiv:2112.11446
    Appendix A) as one vectorized pass — the standard web-corpus document
    filter, integer-exact so the oracle hash-matches:

    1. 50 ≤ word count ≤ 100 000
    2. mean word length in [3, 10]    → 3·n_words ≤ word_chars ≤ 10·n_words
    3. symbol-to-word ratio ≤ 0.1     → 10·n_symbols ≤ n_words  (# and …)
    4. bullet-line fraction ≤ 0.9     → 10·n_bullet ≤ 9·n_lines
    5. ellipsis-line fraction ≤ 0.3   → 10·n_ellipsis ≤ 3·n_lines
    6. alpha-word fraction ≥ 0.8      → 10·n_alpha ≥ 8·n_words
    7. ≥ 2 distinct required stop words (the/be/to/of/and/that/have/with)

    Every ratio compares cross-multiplied integers — no float reaches the
    output. The synthetic corpus has no newlines/bullets/symbols, so a
    deterministic doc_id-keyed enrichment (reconstructed identically in
    SQL) plants material for every rule. Shuffle-free: one actor-pool
    map_batches; a 10^10-doc corpus streams through at read bandwidth."""
    ds = cm.read(sf_dir, "documents", columns=["doc_id", "text"])

    class GopherScorer:
        def __init__(self):
            self.required = set(_GOPHER_REQUIRED)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            did = df["doc_id"].to_numpy(dtype=np.int64)
            txt = df["text"].reset_index(drop=True)
            txt = (
                txt
                + pd.Series(np.where(did % 3 == 0, " ### words with ... dots", ""))
                + pd.Series(np.where(did % 7 == 0,
                                     "\n- bullet item\n- second bullet", ""))
                + pd.Series(np.where(did % 5 == 0, "\ntrailing thought ...", ""))
                + pd.Series(np.where(did % 11 == 0, " 101 202 303 404", ""))
            )
            n_words = (txt.str.count(" ") + 1).astype("int64")
            n_word_chars = (txt.str.len() - (n_words - 1)).astype("int64")
            lines = txt.str.split("\n")
            n_lines = lines.str.len().astype("int64")
            lx = lines.explode()
            n_bullet = (
                (lx.str.startswith("-") | lx.str.startswith("*"))
                .groupby(level=0).sum().reindex(txt.index, fill_value=0)
                .astype("int64")
            )
            n_ellipsis = (
                lx.str.endswith("...").groupby(level=0).sum()
                .reindex(txt.index, fill_value=0).astype("int64")
            )
            wx = txt.str.split(" ").explode()
            n_alpha = (
                wx.str.contains("[A-Za-z]", regex=True)
                .groupby(level=0).sum().reindex(txt.index, fill_value=0)
                .astype("int64")
            )
            n_symbols = (txt.str.count("#") + txt.str.count(r"\.\.\.")).astype("int64")
            req = wx[wx.isin(self.required)]
            n_required = (
                req.groupby(level=0).nunique()
                .reindex(txt.index, fill_value=0).astype("int64")
            )
            keep = (
                (n_words >= 50) & (n_words <= 100_000)
                & (3 * n_words <= n_word_chars) & (n_word_chars <= 10 * n_words)
                & (10 * n_symbols <= n_words)
                & (10 * n_bullet <= 9 * n_lines)
                & (10 * n_ellipsis <= 3 * n_lines)
                & (10 * n_alpha >= 8 * n_words)
                & (n_required >= 2)
            )
            return pd.DataFrame({
                "doc_id": did, "n_words": n_words.to_numpy(),
                "n_word_chars": n_word_chars.to_numpy(),
                "n_lines": n_lines.to_numpy(),
                "n_bullet_lines": n_bullet.to_numpy(),
                "n_ellipsis_lines": n_ellipsis.to_numpy(),
                "n_alpha_words": n_alpha.to_numpy(),
                "n_symbols": n_symbols.to_numpy(),
                "n_required_stop": n_required.to_numpy(),
                "keep": keep.to_numpy().astype(np.int32),
            })

    out = ds.map_batches(GopherScorer, batch_format="pandas",
                         concurrency=(1, cm.pool_size())).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def docs_c4_clean(sf_dir: str):
    """The C4 line-level cleaner (Raffel et al. 2020, arXiv:1910.10683
    §2.2) — the REWRITE companion to :func:`docs_quality_gopher`'s
    doc-level rules: keep only lines that end in terminal punctuation
    (``. ! ? \"``), have ≥ 3 words, and don't mention javascript; drop
    whole pages containing ``lorem ipsum`` or a curly brace. Output is
    the cleaned document as a byte-exact face (md5 of the kept lines
    re-joined) plus the integer rule counters — a lost or extra byte
    anywhere in the rewrite is a hash mismatch.

    A deterministic doc_id-keyed enrichment (reconstructed identically
    in SQL) plants one line per rule; the base synthetic text has no
    terminal punctuation, so the line filter provably drops it.
    Shuffle-free one-pass; the md5 loop is per row but C-speed (the
    house hash-face pattern, see docs_html_text)."""
    import hashlib as _hl

    ds = cm.read(sf_dir, "documents", columns=["doc_id", "text"])

    class C4Cleaner:
        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            did = df["doc_id"].to_numpy(dtype=np.int64)
            txt = df["text"].reset_index(drop=True)
            txt = (
                txt
                + pd.Series(np.where(did % 4 == 0,
                                     "\nThis line ends properly.", ""))
                + pd.Series(np.where(did % 8 == 0, "\nToo short.", ""))
                + pd.Series(np.where(did % 6 == 0,
                                     "\nenable javascript to view this page.", ""))
                + pd.Series(np.where(did % 9 == 0,
                                     "\nlorem ipsum dolor sit amet.", ""))
                + pd.Series(np.where(did % 10 == 0,
                                     "\nfunction() { return 1; }", ""))
            )
            lines = txt.str.split("\n")
            n_lines = lines.str.len().astype("int64")
            lx = lines.explode()
            ok = (
                ((lx.str.count(" ") + 1) >= 3)
                & (lx.str.endswith(".") | lx.str.endswith("!")
                   | lx.str.endswith("?") | lx.str.endswith('"'))
                & ~lx.str.lower().str.contains("javascript", regex=False)
            )
            kept = lx[ok]
            n_kept = (ok.groupby(level=0).sum()
                      .reindex(txt.index, fill_value=0).astype("int64"))
            joined = (kept.groupby(level=0).agg("\n".join)
                      .reindex(txt.index, fill_value=""))
            page_ok = (
                (n_kept >= 1)
                & ~txt.str.lower().str.contains("lorem ipsum", regex=False)
                & ~txt.str.contains("{", regex=False)
            )
            return pd.DataFrame({
                "doc_id": did,
                "n_lines": n_lines.to_numpy(),
                "n_kept": n_kept.to_numpy(),
                "clean_md5": [_hl.md5(s.encode("utf-8")).hexdigest()
                              for s in joined],
                "keep": page_ok.to_numpy().astype(np.int32),
            })

    out = ds.map_batches(C4Cleaner, batch_format="pandas",
                         concurrency=(1, cm.pool_size())).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


ORACLES["docs_c4_clean"] = """
WITH corpus AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 4 = 0 THEN chr(10) || 'This line ends properly.' ELSE '' END
    || CASE WHEN doc_id % 8 = 0 THEN chr(10) || 'Too short.' ELSE '' END
    || CASE WHEN doc_id % 6 = 0
            THEN chr(10) || 'enable javascript to view this page.' ELSE '' END
    || CASE WHEN doc_id % 9 = 0
            THEN chr(10) || 'lorem ipsum dolor sit amet.' ELSE '' END
    || CASE WHEN doc_id % 10 = 0
            THEN chr(10) || 'function() { return 1; }' ELSE '' END AS txt
  FROM documents
), w AS (
  SELECT doc_id, txt, string_split(txt, chr(10)) AS lines,
         list_filter(string_split(txt, chr(10)), x ->
           len(string_split(x, ' ')) >= 3
           AND (x LIKE '%.' OR x LIKE '%!' OR x LIKE '%?' OR x LIKE '%"')
           AND NOT contains(lower(x), 'javascript')) AS kept
  FROM corpus
)
SELECT doc_id,
  CAST(len(lines) AS BIGINT) AS n_lines,
  CAST(len(kept) AS BIGINT) AS n_kept,
  md5(COALESCE(array_to_string(kept, chr(10)), '')) AS clean_md5,
  CAST(CASE WHEN len(kept) >= 1
            AND NOT contains(lower(txt), 'lorem ipsum')
            AND NOT contains(txt, '{') THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM w
"""


_REQ_SQL = ", ".join(f"'{w}'" for w in _GOPHER_REQUIRED)
ORACLES["docs_quality_gopher"] = f"""
WITH corpus AS (
  SELECT doc_id,
    text
    || CASE WHEN doc_id % 3 = 0 THEN ' ### words with ... dots' ELSE '' END
    || CASE WHEN doc_id % 7 = 0
            THEN chr(10) || '- bullet item' || chr(10) || '- second bullet'
            ELSE '' END
    || CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'trailing thought ...' ELSE '' END
    || CASE WHEN doc_id % 11 = 0 THEN ' 101 202 303 404' ELSE '' END AS txt
  FROM documents
), w AS (
  SELECT doc_id, txt, string_split(txt, ' ') AS words,
         string_split(txt, chr(10)) AS lines
  FROM corpus
), m AS (
  SELECT doc_id,
    CAST(len(words) AS BIGINT) AS n_words,
    CAST(length(txt) - (len(words) - 1) AS BIGINT) AS n_word_chars,
    CAST(len(lines) AS BIGINT) AS n_lines,
    CAST(len(list_filter(lines, x -> x LIKE '-%' OR x LIKE '*%')) AS BIGINT)
      AS n_bullet_lines,
    CAST(len(list_filter(lines, x -> x LIKE '%...')) AS BIGINT)
      AS n_ellipsis_lines,
    CAST(len(list_filter(words, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT)
      AS n_alpha_words,
    CAST((length(txt) - length(replace(txt, '#', '')))
       + (length(txt) - length(replace(txt, '...', ''))) / 3 AS BIGINT)
      AS n_symbols,
    CAST(len(list_distinct(list_filter(words, x -> x IN ({_REQ_SQL}))))
      AS BIGINT) AS n_required_stop
  FROM w
)
SELECT *, CAST(CASE WHEN n_words >= 50 AND n_words <= 100000
  AND 3 * n_words <= n_word_chars AND n_word_chars <= 10 * n_words
  AND 10 * n_symbols <= n_words
  AND 10 * n_bullet_lines <= 9 * n_lines
  AND 10 * n_ellipsis_lines <= 3 * n_lines
  AND 10 * n_alpha_words >= 8 * n_words
  AND n_required_stop >= 2 THEN 1 ELSE 0 END AS INTEGER) AS keep
FROM m
"""


def text_metrics(sf_dir: str):
    """Token counting + quality scoring fused in one actor-pool pass
    (M11 + quality analysis): the two stages chain inside one pipeline —
    compiled token regex and stopword set each built once per actor."""
    ds = cm.read(sf_dir, "documents", columns=["doc_id", "text"])
    ds = ds.map_batches(TokenCounter, batch_format="pandas", concurrency=(1, cm.pool_size()))
    ds = ds.map_batches(QualityScorer, batch_format="pandas", concurrency=(1, cm.pool_size()))
    return ds.select_columns(
        ["doc_id", "n_tokens", "n_words", "stopword_ratio", "mean_word_len"]
    )


ORACLES["text_metrics"] = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{TOKEN_PATTERN}')) AS n_tokens,
       len(string_split(text, ' ')) AS n_words,
       len(list_filter(string_split(text, ' '), x -> x IN ({_STOPLIST_SQL})))
         / CAST(len(string_split(text, ' ')) AS DOUBLE) AS stopword_ratio,
       (length(text) - (len(string_split(text, ' ')) - 1))
         / CAST(len(string_split(text, ' ')) AS DOUBLE) AS mean_word_len
FROM documents
"""


def text_heuristics(sf_dir: str):
    """Language-ID + winnowing fingerprint fused in one pass (both
    heuristic — rows-only driver check; verified against pure-python
    oracles in tests)."""
    ds = cm.read(sf_dir, "documents", columns=["doc_id", "text"])
    ds = ds.map_batches(LangId, batch_format="pandas", concurrency=(1, cm.pool_size()))
    ds = ds.map_batches(Fingerprinter, batch_format="pandas", concurrency=(1, cm.pool_size()))
    return ds.select_columns(["doc_id", "lang_pred", "fingerprint"])


def text_langid(sf_dir: str):
    """N-gram-heuristic language ID (no SQL oracle — heuristic)."""
    ds = cm.read(sf_dir, "documents", columns=["doc_id", "text"])
    ds = ds.map_batches(LangId, batch_format="pandas", concurrency=(1, cm.pool_size()))
    return ds.select_columns(["doc_id", "lang_pred"])


def text_fingerprint(sf_dir: str):
    """Rolling-hash winnowing fingerprint (no SQL oracle)."""
    ds = cm.read(sf_dir, "documents", columns=["doc_id", "text"])
    ds = ds.map_batches(Fingerprinter, batch_format="pandas", concurrency=(1, cm.pool_size()))
    return ds.select_columns(["doc_id", "fingerprint"])


# ---------------------------------------------------------------------------
# Dedup — corpus seeded with deterministic duplicates so results are
# non-trivially non-empty (the testdata has no natural dups)
# ---------------------------------------------------------------------------

_COPY_OFFSET = 100_000


def _with_exact_copies(sf_dir: str) -> ray.data.Dataset:
    """documents ∪ exact copies of doc_id%5==0 under shifted ids."""
    docs = cm.read(sf_dir, "documents", columns=["doc_id", "text"])

    def copies(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        keep = did % 5 == 0
        c = t.filter(pa.array(keep))
        c = c.set_column(0, "doc_id", pc.add(c["doc_id"], pa.scalar(_COPY_OFFSET, pa.int64())))
        return pa.concat_tables([t, c])

    return docs.map_batches(copies, batch_format="pyarrow")


def _with_near_copies(sf_dir: str) -> ray.data.Dataset:
    """documents ∪ perturbed copies (last 5 words dropped) of doc_id%10==0."""
    docs = cm.read(sf_dir, "documents", columns=["doc_id", "text"])

    def copies(df: pd.DataFrame) -> pd.DataFrame:
        sub = df[df["doc_id"] % 10 == 0].copy()
        sub["doc_id"] = sub["doc_id"] + _COPY_OFFSET
        sub["text"] = sub["text"].map(lambda s: " ".join(s.split()[:-5]))
        return pd.concat([df, sub], ignore_index=True)

    return docs.map_batches(copies, batch_format="pandas")


def dedup_exact(sf_dir: str):
    """Exact dedup: sha256 content hash → hash-partitioned group →
    keep min doc_id (J4 version-hash dedup,
    ``rpa/rpa_landing_zone_mover.py:100-129``). Combiner: per-batch
    min-per-hash before the shuffle."""
    from ..core.hashing import sha256_hex

    ds = _with_exact_copies(sf_dir)

    def hash_batch(df: pd.DataFrame) -> pd.DataFrame:
        df["content_hash"] = sha256_hex(df["text"].tolist())
        # combiner: one candidate per hash per batch
        return df.groupby("content_hash", as_index=False).agg(doc_id=("doc_id", "min"))

    hashed = ds.map_batches(hash_batch, batch_format="pandas")
    return cm.routed_grouped_agg(hashed, ["content_hash"], {"doc_id": "min"})


ORACLES["dedup_exact"] = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 5 = 0
)
SELECT sha256(text) AS content_hash, MIN(doc_id) AS doc_id
FROM corpus GROUP BY sha256(text)
"""


# ---------------------------------------------------------------------------
# Composed corpus-cleaning preset — the end-to-end pre-tokenization chain
# ---------------------------------------------------------------------------

# the text_normalize chain as a DuckDB expression (tokens.py ORACLE), kept
# as a template so the composed oracle below normalizes identically
_NORM_SQL = (
    r"regexp_replace(regexp_replace(replace(trim(regexp_replace({c}, "
    r"'\s+', ' ', 'g')), " + "'\"', '''')" + r", '[^\w\- .()]', '_', 'g'), "
    r"'_+', '_', 'g')"
)


def corpus_clean_pipeline(
    sf_dir: str,
    min_words: int = 30,
    max_stopword_ratio: float = 0.25,
    probe_words: int = 8,
):
    """The composed pre-tokenization cleaning pipeline a training-data
    user runs end-to-end before tokenize/pack (the reference runs these
    as separate sequential jobs: normalization ``common/utils/
    text_utils.py``, quality gating, dedup ``rpa/rpa_landing_zone_mover
    .py:100-129``): normalize → quality filter → benchmark
    decontamination → exact dedup keeping the lowest doc_id, over the
    dup-seeded corpus.

    Scale shape: ONE full-data exchange total (the dedup finish).
    Normalize / quality / decontaminate / hash run as a single fused
    actor-pool map over Arrow batches — probe set broadcast once per
    actor, stopword set built in ``__init__`` — and the per-batch
    min-per-hash combiner runs map-side, so low-quality and contaminated
    rows are dropped BEFORE the shuffle and at most one candidate row
    per (hash, batch) enters it. Cleaning cost is O(corpus) map work +
    O(survivors) shuffle bytes."""
    from ..core.hashing import sha256_hex
    from ..functions import text_utils as tx

    _norm_chain = (
        tx.squash_whitespace,
        tx.double_to_single_quotes,
        tx.bad_chars_to_underscores,
        tx.squash_underscores,
    )

    docs = cm.read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_probes(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        sub = t.filter(pa.array(did % 97 == 0))
        norm = tx.chain_apply(sub["text"], *_norm_chain)
        words = pc.split_pattern(norm, " ")
        probe = pc.binary_join(pc.list_slice(words, 0, probe_words), " ")
        return pa.table({"probe": probe})

    # the eval benchmark is SMALL by construction → driver-collected once,
    # broadcast via ray.put (the docs_decontaminate pattern)
    probes = sorted(
        set(docs.map_batches(to_probes, batch_format="pyarrow").to_pandas()["probe"])
    )
    probes_ref = cm.broadcast(probes)

    _empty = pd.DataFrame(
        {
            "content_hash": pd.Series(dtype="object"),
            "doc_id": pd.Series(dtype="int64"),
            "n_words": pd.Series(dtype="int64"),
        }
    )

    class Cleaner:
        """Fused normalize + quality + decontaminate + hash + combiner."""

        def __init__(self):
            self.by_len: dict[int, set[str]] = {}
            for p in ray.get(probes_ref):
                self.by_len.setdefault(len(p.split(" ")), set()).add(p)
            self.stops = frozenset(STOPWORDS)

        def __call__(self, t: pa.Table) -> pd.DataFrame:
            norm = tx.chain_apply(t["text"], *_norm_chain)
            norm = norm.combine_chunks() if isinstance(norm, pa.ChunkedArray) else norm
            words = pc.split_pattern(norm, " ")
            words = (
                words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
            )
            n = len(norm)
            flat = np.asarray(words.flatten(), dtype=object)
            offsets = np.asarray(words.offsets, dtype=np.int64)
            offsets = offsets - offsets[0]  # sliced ListArray offsets rebase
            n_words = np.diff(offsets)
            doc_of = np.repeat(np.arange(n), n_words)
            stop_counts = np.zeros(n, dtype=np.int64)
            np.add.at(stop_counts, doc_of, pd.Series(flat).isin(self.stops).to_numpy())
            keep = (n_words >= min_words) & (
                stop_counts / n_words <= max_stopword_ratio
            )
            # decontamination: vectorized word-window probe match per
            # distinct probe length (the docs_decontaminate matcher)
            contam = np.zeros(n, dtype=bool)
            for L, pset in self.by_len.items():
                if len(flat) < L:
                    continue
                win_doc = doc_of[: len(flat) - L + 1]
                ok = doc_of[L - 1 :] == win_doc
                grams = pd.Series(flat[: len(flat) - L + 1])
                for j in range(1, L):
                    grams = grams + " " + pd.Series(flat[j : len(flat) - L + 1 + j])
                m = ok & grams.isin(pset).to_numpy()
                contam[win_doc[m]] = True
            keep &= ~contam
            if not keep.any():
                return _empty.copy()
            kmask = pa.array(keep)
            out = pd.DataFrame(
                {
                    "content_hash": sha256_hex(norm.filter(kmask).to_pylist()),
                    "doc_id": t["doc_id"].to_numpy(zero_copy_only=False)[keep],
                    "n_words": n_words[keep],
                }
            )
            # combiner: one candidate per hash per batch; n_words is a
            # function of the (identical) text within a hash group, so
            # min is exact
            return (
                out.groupby("content_hash", as_index=False)
                .agg(doc_id=("doc_id", "min"), n_words=("n_words", "min"))
                .astype({"doc_id": "int64", "n_words": "int64"})
            )

    hashed = _with_exact_copies(sf_dir).map_batches(
        Cleaner, batch_format="pyarrow", concurrency=(1, cm.pool_size())
    )
    return cm.routed_grouped_agg(
        hashed, ["content_hash"], {"doc_id": "min", "n_words": "min"}
    )


ORACLES["corpus_clean_pipeline"] = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
),
norm AS (SELECT doc_id, {_NORM_SQL.format(c='text')} AS text_norm FROM corpus),
quality AS (
  SELECT doc_id, text_norm,
         len(string_split(text_norm, ' ')) AS n_words,
         len(list_filter(string_split(text_norm, ' '), x -> x IN ({_STOPLIST_SQL})))
           / CAST(len(string_split(text_norm, ' ')) AS DOUBLE) AS swr
  FROM norm),
bench AS (
  SELECT DISTINCT array_to_string(
      (string_split({_NORM_SQL.format(c='text')}, ' '))[1:8], ' ') AS probe
  FROM documents WHERE doc_id % 97 = 0),
kept AS (
  SELECT q.doc_id, q.text_norm, q.n_words FROM quality q
  WHERE q.n_words >= 30 AND q.swr <= 0.25
    AND NOT EXISTS (SELECT 1 FROM bench b
      WHERE contains(' ' || q.text_norm || ' ', ' ' || b.probe || ' ')))
SELECT sha256(text_norm) AS content_hash, MIN(doc_id) AS doc_id,
       MIN(n_words) AS n_words
FROM kept GROUP BY sha256(text_norm)
"""


def _verified_minhash_pairs(sigs: ray.data.Dataset, tau: float) -> pd.DataFrame:
    """DISTRIBUTED signature-verify tail shared by the MinHash queries:
    band rows CARRY the packed signature (binary 512 B) into the ONE
    bucket groupby, and each bucket computes the signature-estimated
    Jaccard for its own candidate pairs in place — no driver-side
    signature map, no whole-dataset broadcast, no extra shuffle stages.
    A pair that collides in several bands surfaces once per band; the
    ≥tau RESULT (the query output) is deduped on the driver. The bucket
    pass groups by ROUTE (a coarse hash of the bucket key, NUM_ROUTES
    groups total) — per-group call overhead stays constant as the bucket
    count grows with the corpus; singleton buckets die to one vectorized
    mask inside each route group."""
    bands = sigs.map_batches(dd.lsh_bands_with_sig, batch_format="pandas").map_batches(
        dd.with_route, batch_format="pyarrow"
    )
    pairs = bands.groupby("route").map_groups(
        lambda g: dd.routed_bucket_pairs_est(g, tau=tau), batch_format="pandas"
    )
    out = pairs.to_pandas().drop_duplicates(["id_a", "id_b"])
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def dedup_minhash_lsh_est(sf_dir: str, tau: float = 0.5):
    """MinHash+LSH near-dup pairs, SIGNATURE-ESTIMATED variant (module
    level): shingle → minhash sigs (actor pool) → band explode → bucket
    groupby → candidate pairs → distributed signature-join verify (est
    Jaccard ≥ tau; see :func:`_verified_minhash_pairs`). Approximate by
    construction; recall/precision vs exact Jaccard verified in tests.
    The REGISTERED face is :func:`dedup_minhash_lsh`, which exact-confirms
    the same LSH candidates and therefore takes a full DuckDB oracle."""
    ds = _with_near_copies(sf_dir)
    sigs = ds.map_batches(
        dd.MinHasher, batch_format="pandas", concurrency=(1, cm.pool_size())
    )  # streams straight into the band pass (sigs travel WITH the band rows)
    return _verified_minhash_pairs(sigs, tau)


def dedup_minhash_lsh(sf_dir: str, tau_num: int = 1, tau_den: int = 2, k: int = 3):
    """MinHash+LSH near-dup pairs, EXACT-CONFIRMED (the registered face):

    1. shingle → minhash sigs (actor pool, ``dd.MinHasher``) → band
       explode → ONE routed bucket groupby → candidate pairs (skew-capped,
       ``dd.routed_bucket_pairs``);
    2. candidate pairs to the driver — O(near-dup pairs), a vanishing
       fraction of n² (annotated driver collection, like decontam's
       probe set);
    3. exact confirm DISTRIBUTED: the candidate docs' texts are gathered
       once (map-side broadcast-set filter → O(candidate docs) rows),
       ``ray.put`` once, and a task pool re-scores the pair rows against
       the broadcast texts — no shuffle join (the CLAUDE.md
       broadcast-small-side idiom; at a candidate volume too big to
       broadcast, swap the tail for two ``bucketed_hash_join``s of the
       pair rows against the corpus — same output, all-shuffle path).
       The τ-test runs in INTEGER arithmetic (n_inter·tau_den ≥
       tau_num·n_union; default 1/2 = 0.5) so no float enters the
       driver hash.

    Output (id_a, id_b, n_inter, n_union) — exact word-3-shingle overlap
    counts, oracle-able in DuckDB the same way as
    :func:`dedup_ngram_jaccard`. LSH banding (16 bands × 4 rows) has
    ~1-4e-8 miss probability at the planted-pair J≈0.9 and the planted
    corpus has no natural pairs in the τ-marginal zone, so the candidate
    set covers every ≥τ pair here; recall properties of the banding are
    separately pytest-verified on :func:`dedup_minhash_lsh_est`.
    Reference semantics anchor: ``create_views.sql`` dedup +
    ``rpa_landing_zone_mover.py:100-129``."""
    corpus = _with_near_copies(sf_dir)
    sigs = corpus.map_batches(
        dd.MinHasher, batch_format="pandas", concurrency=(1, cm.pool_size())
    )
    bands = sigs.map_batches(dd.lsh_bands, batch_format="pandas").map_batches(
        dd.with_route, batch_format="pyarrow"
    )
    cand = bands.groupby("route").map_groups(
        dd.routed_bucket_pairs, batch_format="pandas"
    )
    # O(candidate pairs) driver rows (multi-band collisions deduped here)
    pairs = cand.to_pandas().drop_duplicates(["id_a", "id_b"])
    if pairs.empty:
        return pd.DataFrame({c: pd.Series(dtype="int64")
                             for c in ("id_a", "id_b", "n_inter", "n_union")})
    idset = set(pairs["id_a"].tolist()) | set(pairs["id_b"].tolist())
    ids_ref = cm.broadcast(idset)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        keep = ray.get(ids_ref)
        return df[df["doc_id"].isin(keep)][["doc_id", "text"]]

    # O(candidate docs) texts, broadcast once for the confirm pool
    texts = corpus.map_batches(pick, batch_format="pandas").to_pandas()
    texts_ref = cm.broadcast(dict(zip(texts["doc_id"], texts["text"])))

    def confirm(df: pd.DataFrame) -> pd.DataFrame:
        tx = ray.get(texts_ref)
        cache: dict[int, set] = {}

        def sh(i: int) -> set:
            s = cache.get(i)
            if s is None:
                s = cache[i] = set(dd.word_shingles(tx[i], k))
            return s

        n_inter = np.empty(len(df), dtype=np.int64)
        n_union = np.empty(len(df), dtype=np.int64)
        for j, (ia, ib) in enumerate(zip(df["id_a"], df["id_b"])):
            sa, sb = sh(int(ia)), sh(int(ib))
            n_inter[j] = len(sa & sb)
            n_union[j] = len(sa | sb)
        out = pd.DataFrame({
            "id_a": df["id_a"].astype("int64").to_numpy(),
            "id_b": df["id_b"].astype("int64").to_numpy(),
            "n_inter": n_inter, "n_union": n_union,
        })
        return out[out["n_inter"] * tau_den >= tau_num * out["n_union"]]

    out = (
        ray.data.from_pandas(pairs[["id_a", "id_b"]])
        .map_batches(confirm, batch_format="pandas", batch_size=4096)
        .to_pandas()
    )
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


ORACLES["dedup_minhash_lsh"] = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_COPY_OFFSET},
         array_to_string(list_slice(string_split(text, ' '), 1,
                                    len(string_split(text, ' ')) - 5), ' ')
  FROM documents WHERE doc_id % 10 = 0
), w AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
  FROM w, unnest(range(1, len(w) - 1)) AS t(i)
), sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b, i.n_inter,
       CAST(sa.n + sb.n - i.n_inter AS BIGINT) AS n_union
FROM inter i JOIN sizes sa ON sa.doc_id = i.id_a
             JOIN sizes sb ON sb.doc_id = i.id_b
WHERE i.n_inter * 2 >= 1 * (sa.n + sb.n - i.n_inter)
"""


def dedup_tokens_minhash(sf_dir: str, tau: float = 0.5):
    """Near-dup pairs over the TOKENS payload table itself (the
    BASELINE.json training-sequence shape): token-5-gram MinHash + LSH,
    same distributed signature-join verify as the text variant. Corpus:
    deterministic tokens table from the changelog generator, seeded with
    truncated near-copies. Rows-only; recall vs exact token-shingle
    Jaccard verified in tests."""
    corpus = _token_corpus(sf_dir)
    ds = ray.data.from_arrow(corpus)
    sigs = ds.map_batches(
        dd.TokenMinHasher, batch_format="pyarrow", concurrency=(1, cm.pool_size())
    )  # streams straight into the band pass (sigs travel WITH the band rows)
    return _verified_minhash_pairs(sigs, tau)


def _token_corpus(sf_dir: str) -> pa.Table:
    """Deterministic tokens table + seeded truncated near-copies."""
    from ..core.changelog import generate_epoch_table

    n = {"sf0.001": 400, "sf0.01": 1000, "sf0.1": 4000}.get(
        sf_dir.rstrip("/").rsplit("/", 1)[-1], 400
    )
    t = generate_epoch_table(1, n, n, seed=77, dup_frac=0.0, mean_tokens=64)
    t = t.filter(pc.not_equal(t["op"], "D")).select(["doc_id", "tokens"])
    # first occurrence per doc_id only
    df = t.to_pandas().drop_duplicates("doc_id")
    near = df[df.index % 10 == 0].copy()
    near["doc_id"] = "near-" + near["doc_id"]
    near["tokens"] = near["tokens"].map(lambda a: a[: max(5, int(len(a) * 0.9))])
    out = pd.concat([df, near], ignore_index=True)
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"]),
            "tokens": pa.array([list(v) for v in out["tokens"]], pa.list_(pa.int32())),
        }
    )


def dedup_token_spans(sf_dir: str, window: int = 16):
    """Exact repeated TOKEN-SPAN detection over the tokens payload — the
    windowed substring-dedup shape of "Deduplicating Training Data Makes
    Language Models Better" (Lee et al., 2021): every 16-token window is
    rolling-hashed (vectorized, one sliding view + matvec per doc), a
    per-batch combiner collapses to one (hash, doc, occ) row per doc, and
    ONE routed groupby finds hashes spanning ≥2 distinct docs. Output:
    span_hash, n_docs, n_occ, example_doc (lexicographic-min doc).
    Rows-only; exact equality vs a naive serial oracle in tests."""
    corpus = _token_corpus(sf_dir)
    ds = ray.data.from_arrow(corpus)

    partials = ds.map_batches(
        lambda t: dd.span_partials(t, window, carry_window=True),
        batch_format="pyarrow",
    )

    def add_route(df: pd.DataFrame, num_routes: int = 256) -> pd.DataFrame:
        df = df.copy()
        df["_route"] = (df["span_hash"].to_numpy().astype(np.uint64)
                        % np.uint64(num_routes)).astype("int64")
        return df

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        # (span_hash, doc_id) rows are GLOBALLY unique — each doc's tokens
        # live in one corpus row, so one batch's combiner sees all of them
        # — which turns the distinct-doc count into a plain row count
        # (pandas size beats nunique by ~25% wall on this query).
        # Grouping on (hash, win) is the exact-confirm step: a 64-bit
        # birthday collision (hash equal, tokens unequal) lands in two
        # groups and never reports a false duplicate.
        out = g.groupby(["span_hash", "win"], as_index=False).agg(
            n_docs=("doc_id", "size"), n_occ=("occ", "sum"),
            example_doc=("doc_id", "min"),
        ).drop(columns=["win"])
        return out[out["n_docs"] >= 2]

    out = (
        partials.map_batches(add_route, batch_format="pandas")
        .groupby("_route")
        .map_groups(lambda g: finish(g.drop(columns=["_route"])), batch_format="pandas")
        .to_pandas()
    )
    return out.sort_values("span_hash").reset_index(drop=True)


def _arith_token_corpus(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, tokens) corpus + truncated near-copies, derived
    arithmetically from ``documents.doc_id`` (token j of base doc d =
    (d·31 + j·7) % 50257, n_tok = 1 + (d·13) % 97; docs with
    doc_id%10==0 get a copy at doc_id+offset keeping max(16, 90%) of the
    tokens) — SQL-constructible, unlike :func:`_token_corpus`'s numpy-RNG
    payload, so the span-dedup face below gets a real DuckDB oracle."""
    from .tokens import arith_tokens

    ds = cm.read(sf_dir, "documents", columns=["doc_id"])

    def gen(t: pa.Table) -> pa.Table:
        did = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = 1 + (did * 13) % 97
        cmask = did % 10 == 0
        base = np.concatenate([did, did[cmask]])
        out_id = np.concatenate([did, did[cmask] + _COPY_OFFSET])
        out_m = np.concatenate([m, np.maximum(16, (m[cmask] * 9) // 10)])
        return pa.table({
            "doc_id": pa.array(out_id, pa.int64()),
            "tokens": arith_tokens(base, out_m),
        })

    return ds.map_batches(gen, batch_format="pyarrow")


def dedup_token_spans_q(sf_dir: str, window: int = 16):
    """Driver-checkable face of :func:`dedup_token_spans` (Lee et al.
    windowed span dedup): the SAME vectorized rolling-hash + per-batch
    combiner + routed groupby machinery over the arithmetic corpus,
    projected per doc to (n_dup_spans, n_dup_occ) — the count of this
    doc's distinct ``window``-token spans that also appear in ≥1 other
    doc, and their total occurrences. Hash values never leave the
    pipeline, so the DuckDB oracle recomputes with literal window strings;
    the carried first-window bytes make the match EXACT (hash-equal but
    token-unequal windows are split — no 64-bit-collision caveat)."""
    partials = _arith_token_corpus(sf_dir).map_batches(
        lambda t: dd.span_partials(t, window, carry_window=True),
        batch_format="pyarrow",
    )

    def add_route(df: pd.DataFrame, num_routes: int = 256) -> pd.DataFrame:
        df = df.copy()
        df["_route"] = (df["span_hash"].to_numpy().astype(np.uint64)
                        % np.uint64(num_routes)).astype("int64")
        return df

    def per_doc_partial(g: pd.DataFrame) -> pd.DataFrame:
        # (span_hash, doc_id) rows are globally unique (one corpus row per
        # doc ⇒ one combiner row), so distinct-doc count == row count
        g = g.drop(columns=["_route"])
        # (hash, win) grouping = exact confirm (see stages/dedup.py)
        sz = g.groupby(["span_hash", "win"])["doc_id"].transform("size")
        g = g[sz >= 2]
        return g.groupby("doc_id", as_index=False).agg(
            n_dup_spans=("span_hash", "size"), n_dup_occ=("occ", "sum"))

    routed = (
        partials.map_batches(add_route, batch_format="pandas")
        .groupby("_route").map_groups(per_doc_partial, batch_format="pandas")
    )
    # a doc's spans hash into many routes → distributed sum by doc
    out = cm.routed_grouped_agg(
        routed, ["doc_id"], {"n_dup_spans": "sum", "n_dup_occ": "sum"}
    ).to_pandas()
    return (out.astype({"doc_id": "int64", "n_dup_spans": "int64",
                        "n_dup_occ": "int64"})
            .sort_values("doc_id").reset_index(drop=True))


ORACLES["dedup_token_spans"] = f"""
WITH docs AS (SELECT doc_id, 1 + (doc_id * 13) % 97 AS m FROM documents),
corpus AS (
  SELECT doc_id, doc_id AS base, m FROM docs
  UNION ALL
  SELECT doc_id + {_COPY_OFFSET}, doc_id, GREATEST(16, (m * 9) // 10)
  FROM docs WHERE doc_id % 10 = 0
), tok AS (
  SELECT doc_id, j, (base * 31 + j * 7) % 50257 AS tokval
  FROM corpus, unnest(range(m)) AS t(j)
), win AS (
  SELECT doc_id,
         string_agg(tokval, ',') OVER (PARTITION BY doc_id ORDER BY j
            ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS wkey,
         COUNT(*) OVER (PARTITION BY doc_id ORDER BY j
            ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS wlen
  FROM tok
), occ AS (
  SELECT doc_id, wkey, CAST(COUNT(*) AS BIGINT) AS occ
  FROM win WHERE wlen = 16 GROUP BY 1, 2
), shared AS (SELECT wkey FROM occ GROUP BY wkey HAVING COUNT(*) >= 2)
SELECT o.doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
       CAST(SUM(o.occ) AS BIGINT) AS n_dup_occ
FROM occ o JOIN shared s USING (wkey)
GROUP BY 1
"""


def dedup_span_removal(sf_dir: str, window: int = 16):
    """The REMOVAL stage of "Deduplicating Training Data Makes Language
    Models Better" (Lee et al. 2021) — detection's missing other half
    (:func:`dedup_token_spans_q` only counts): every duplicated
    ``window``-token span keeps its globally-first occurrence (min
    (doc_id, pos) lexicographic) and is CUT from the corpus everywhere
    else; overlapping cuts union. Output is the rewritten corpus as a
    per-doc face — (doc_id, n_tok_kept, tok_sum, tok_wsum) with
    ``tok_wsum`` = Σ rank·token over the kept sequence, so the oracle
    hash pins token ORDER, not just the multiset.

    Distributed shape (reference analog: the dedup half of
    ``dataPipelines/gc_ingest/tools/load/utils.py`` version-replace, done
    at token-span granularity):

    1. per-batch occurrence partials (``span_occurrence_partials``):
       one row per (window-hash, doc) with all start positions + the
       exact-confirm window bytes;
    2. ONE routed groupby on ``hash % 256``: every occurrence of a given
       span lands in one group, so groups pick the canonical occurrence
       exactly and emit cut coordinates for the rest — singleton spans
       emit nothing for free (the non-first mask is empty);
    3. cuts route by doc (second small groupby over CUT rows only — dup
       coordinates, not the corpus) and pack to int32 bytes;
    4. one ``left_outer`` bucketed hash join back to the corpus + a
       vectorized interval-union mask per doc.

    Driver traffic: none (all exchanges are routed groupbys / the
    bucketed join). The per-occurrence byte-carry in step 1 is the
    price of emitting coordinates; at dup-heavy 10^10-window scale the
    two-phase variant (hash-only counting pass, then confirm bytes for
    candidate hashes only) drops it to the duplicated minority."""
    from .joins import bucketed_hash_join

    corpus = _arith_token_corpus(sf_dir)
    parts = corpus.map_batches(
        lambda t: dd.span_occurrence_partials(t, window), batch_format="pyarrow"
    )

    def add_route(df: pd.DataFrame, num_routes: int = 256) -> pd.DataFrame:
        df = df.copy()
        df["_route"] = (df["span_hash"].to_numpy().astype(np.uint64)
                        % np.uint64(num_routes)).astype("int64")
        return df

    def cut_starts(g: pd.DataFrame) -> pd.DataFrame:
        # explode packed positions to occurrence rows (vectorized:
        # frombuffer lengths drive one repeat + one concatenate)
        pos_bufs = g["pos"].to_list()
        lens = np.fromiter((len(b) // 4 for b in pos_bufs), dtype=np.int64,
                           count=len(pos_bufs))
        if lens.sum() == 0:
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "start": pd.Series(dtype="int64")})
        occ_pos = np.frombuffer(b"".join(pos_bufs), dtype="<i4").astype(np.int64)
        # (hash, win) grouping = exact confirm: a 64-bit collision lands
        # in two gids and never cross-contaminates cuts
        gid = g.groupby(["span_hash", "win"], sort=False).ngroup().to_numpy()
        occ_gid = np.repeat(gid, lens)
        occ_doc = np.repeat(g["doc_id"].to_numpy(dtype=np.int64), lens)
        order = np.lexsort((occ_pos, occ_doc, occ_gid))
        sg, sd, sp = occ_gid[order], occ_doc[order], occ_pos[order]
        first = np.r_[True, sg[1:] != sg[:-1]]  # canonical = min (doc, pos)
        return pd.DataFrame({"doc_id": sd[~first], "start": sp[~first]})

    cuts = (
        parts.map_batches(add_route, batch_format="pandas")
        .groupby("_route")
        .map_groups(lambda g: cut_starts(g.drop(columns=["_route"])),
                    batch_format="pandas")
    )

    def add_doc_route(df: pd.DataFrame, num_routes: int = 64) -> pd.DataFrame:
        df = df.copy()
        df["_route"] = (df["doc_id"].to_numpy(np.uint64) % np.uint64(num_routes)
                        ).astype("int64")
        return df

    def pack_per_doc(g: pd.DataFrame) -> pd.DataFrame:
        packed = (g.sort_values(["doc_id", "start"])
                  .groupby("doc_id", sort=False)["start"]
                  .apply(lambda s: s.to_numpy("<i4").tobytes()))
        return pd.DataFrame({"doc_id": packed.index.to_numpy(dtype=np.int64),
                             "starts": packed.to_numpy()})

    per_doc = (
        cuts.map_batches(add_doc_route, batch_format="pandas")
        .groupby("_route")
        .map_groups(lambda g: pack_per_doc(g.drop(columns=["_route"])),
                    batch_format="pandas")
    )

    joined = bucketed_hash_join(corpus, per_doc, on="doc_id", how="left_outer")

    def finalize(t: pa.Table) -> pd.DataFrame:
        col = t["tokens"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
        offs = col.offsets.to_numpy(zero_copy_only=False)
        offs = offs - offs[0]
        starts_col = t["starts"].to_pylist()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        n_kept = np.empty(len(ids), dtype=np.int64)
        tok_sum = np.empty(len(ids), dtype=np.int64)
        tok_wsum = np.empty(len(ids), dtype=np.int64)
        for i in range(len(ids)):
            toks = flat[offs[i]:offs[i + 1]]
            b = starts_col[i]
            if b:
                s = np.frombuffer(b, dtype="<i4").astype(np.int64)
                d = np.zeros(len(toks) + 1, dtype=np.int64)
                np.add.at(d, s, 1)
                np.add.at(d, np.minimum(s + window, len(toks)), -1)
                kept = toks[d.cumsum()[:-1] == 0]
            else:
                kept = toks
            n_kept[i] = kept.size
            tok_sum[i] = kept.sum()
            tok_wsum[i] = (np.arange(1, kept.size + 1, dtype=np.int64) * kept).sum()
        return pd.DataFrame({"doc_id": ids.astype(np.int64), "n_tok_kept": n_kept,
                             "tok_sum": tok_sum, "tok_wsum": tok_wsum})

    out = joined.map_batches(finalize, batch_format="pyarrow").to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


ORACLES["dedup_span_removal"] = f"""
WITH docs AS (SELECT doc_id, 1 + (doc_id * 13) % 97 AS m FROM documents),
corpus AS (
  SELECT doc_id, doc_id AS base, m FROM docs
  UNION ALL
  SELECT doc_id + {_COPY_OFFSET}, doc_id, GREATEST(16, (m * 9) // 10)
  FROM docs WHERE doc_id % 10 = 0
), tok AS (
  SELECT doc_id, j, (base * 31 + j * 7) % 50257 AS tokval
  FROM corpus, unnest(range(m)) AS t(j)
), win AS (
  SELECT doc_id, j,
         string_agg(tokval, ',') OVER (PARTITION BY doc_id ORDER BY j
            ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS wkey,
         COUNT(*) OVER (PARTITION BY doc_id ORDER BY j
            ROWS BETWEEN CURRENT ROW AND 15 FOLLOWING) AS wlen
  FROM tok
), ranked AS (
  SELECT doc_id, j,
         ROW_NUMBER() OVER (PARTITION BY wkey ORDER BY doc_id, j) AS rn
  FROM win WHERE wlen = 16
), cut AS (SELECT doc_id, j AS s FROM ranked WHERE rn > 1),
kept AS (
  SELECT t.doc_id, t.j, t.tokval,
         ROW_NUMBER() OVER (PARTITION BY t.doc_id ORDER BY t.j) AS rnk
  FROM tok t WHERE NOT EXISTS (
    SELECT 1 FROM cut r
    WHERE r.doc_id = t.doc_id AND t.j BETWEEN r.s AND r.s + 15)
)
SELECT c.doc_id,
       CAST(COALESCE(COUNT(k.tokval), 0) AS BIGINT) AS n_tok_kept,
       CAST(COALESCE(SUM(k.tokval), 0) AS BIGINT) AS tok_sum,
       CAST(COALESCE(SUM(k.rnk * k.tokval), 0) AS BIGINT) AS tok_wsum
FROM corpus c LEFT JOIN kept k ON k.doc_id = c.doc_id
GROUP BY c.doc_id
"""


def dedup_simhash(sf_dir: str, max_hamming: int = 8, max_bucket: int = 200):
    """SimHash near-dup pairs via 16-bit chunk bucketing (rows-only).

    Buckets are capped at ``max_bucket`` members (same skew guard as the
    MinHash path, :func:`..stages.dedup.bucket_pairs`): N near-identical
    boilerplate docs would otherwise all land in one chunk bucket and
    cost O(N²). Within a bucket the hamming distances are one vectorized
    XOR + popcount matrix, not a per-pair Python loop."""
    ds = _with_near_copies(sf_dir)
    hashed = ds.map_batches(dd.SimHasher, batch_format="pandas", concurrency=(1, cm.pool_size()))
    chunks = hashed.map_batches(dd.simhash_chunks, batch_format="pandas")

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        sub = g.drop_duplicates("doc_id").sort_values("doc_id").iloc[:max_bucket]
        ids = sub["doc_id"].to_numpy(dtype=np.int64)
        hs = sub["simhash"].to_numpy(dtype=np.int64).view(np.uint64)
        n = len(ids)
        x = hs[:, None] ^ hs[None, :]  # (n, n) uint64
        d = np.unpackbits(x.view(np.uint8).reshape(n, n, 8), axis=2).sum(
            axis=2, dtype=np.int64
        )
        ia, ib = np.triu_indices(n, k=1)
        keep = d[ia, ib] <= max_hamming
        return pd.DataFrame(
            {"id_a": ids[ia[keep]], "id_b": ids[ib[keep]],
             "hamming": d[ia, ib][keep]}
        )

    def routed_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # one route carries many (chunk_id, chunk_val) buckets: kill
        # singleton buckets with one vectorized mask, loop only real ones
        g = g[g.duplicated(["chunk_id", "chunk_val"], keep=False)]
        if g.empty:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
                 "hamming": pd.Series(dtype="int64")}
            )
        out = [
            pairs_in_bucket(sub)
            for _, sub in g.groupby(["chunk_id", "chunk_val"], sort=False)
        ]
        return pd.concat(out, ignore_index=True)

    routed = chunks.map_batches(
        lambda t: dd.with_route(t, cols=("chunk_id", "chunk_val")),
        batch_format="pyarrow",
    )
    pairs = routed.groupby("route").map_groups(routed_pairs, batch_format="pandas")
    out = pairs.to_pandas().drop_duplicates(["id_a", "id_b"])
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def dedup_ngram_jaccard(
    sf_dir: str, tau_num: int = 3, tau_den: int = 5, k: int = 3,
    max_posting: int = 10_000,
):
    """EXACT word-k-gram Jaccard near-dup pairs via a distributed shingle
    inverted index (no LSH approximation — this is the exact-dedup
    counterpart of :func:`dedup_minhash_lsh`):

    1. per-doc DISTINCT shingles → (shingle, doc_id) posting rows and
       per-doc shingle counts, both computed in the same pass (each doc
       lives in one batch);
    2. routed groupby(shingle): a vectorized self-merge per route expands
       each posting into co-occurring pairs — one pandas merge per route,
       not one python loop per shingle. Postings longer than
       ``max_posting`` (stopword shingles; quadratic pair bombs) are
       dropped — none exist in testdata (max posting = 7 at sf0.01), at
       open-corpus scale the cap trades those shingles' contribution for
       boundedness like ``stages/dedup.py``'s LSH bucket cap;
    3. routed groupby(id_a, id_b) sums |A∩B|; two bucketed hash joins
       fetch |A| and |B| (the corpus never lands on the driver);
    4. the τ-threshold test runs in INTEGER arithmetic
       (n_inter·tau_den ≥ tau_num·n_union) so no float rounding enters
       the driver hash. Output (id_a, id_b, n_inter, n_union);
       jaccard = n_inter/n_union ≥ tau_num/tau_den (default 3/5 = 0.6).
    """
    from .joins import bucketed_hash_join

    corpus = _with_near_copies(sf_dir)

    def shingle_rows(df: pd.DataFrame) -> pd.DataFrame:
        rows_d, rows_s = [], []
        for did, text in zip(df["doc_id"], df["text"]):
            sh = set(dd.word_shingles(text, k))
            rows_d.extend([did] * len(sh))
            rows_s.extend(sh)
        return pd.DataFrame({
            "doc_id": pd.Series(rows_d, dtype="int64"),
            "s": pd.Series(rows_s, dtype="object"),
        })

    def size_rows(df: pd.DataFrame) -> pd.DataFrame:
        n = [len(set(dd.word_shingles(t, k))) for t in df["text"]]
        return pd.DataFrame({"doc_id": df["doc_id"].astype("int64").to_numpy(),
                             "n_sh": pd.Series(n, dtype="int64")})

    postings = corpus.map_batches(shingle_rows, batch_format="pandas")
    sizes = corpus.map_batches(size_rows, batch_format="pandas")

    def add_route(df: pd.DataFrame, num_routes: int = 256) -> pd.DataFrame:
        df = df.copy()
        h = pd.util.hash_pandas_object(df["s"], index=False)
        df["_route"] = (h % num_routes).astype("int64")
        return df

    def pairs_in_route(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_route"])
        # kill singleton + oversized postings vectorized
        sz = g.groupby("s")["doc_id"].transform("size")
        g = g[(sz >= 2) & (sz <= max_posting)]
        if g.empty:
            return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                                 "id_b": pd.Series(dtype="int64"),
                                 "n_inter": pd.Series(dtype="int64")})
        m = g.merge(g, on="s", suffixes=("_a", "_b"))
        m = m[m["doc_id_a"] < m["doc_id_b"]]
        out = (m.groupby(["doc_id_a", "doc_id_b"], as_index=False)
                .agg(n_inter=("s", "size")))
        return out.rename(columns={"doc_id_a": "id_a", "doc_id_b": "id_b"})

    # shingles of one pair land in many routes → second routed sum by pair
    partial_pairs = (
        postings.map_batches(add_route, batch_format="pandas")
        .groupby("_route").map_groups(pairs_in_route, batch_format="pandas")
    )
    pairs = cm.routed_grouped_agg(partial_pairs, ["id_a", "id_b"],
                                  {"n_inter": "sum"})

    size_a = sizes.map_batches(
        lambda df: df.rename(columns={"doc_id": "id_a", "n_sh": "n_a"}),
        batch_format="pandas")
    size_b = sizes.map_batches(
        lambda df: df.rename(columns={"doc_id": "id_b", "n_sh": "n_b"}),
        batch_format="pandas")
    j = bucketed_hash_join(pairs, size_a, on="id_a", num_buckets=16)
    j = j.map_batches(lambda df: df[["id_a", "id_b", "n_inter", "n_a"]],
                      batch_format="pandas")
    j = bucketed_hash_join(j, size_b, on="id_b", num_buckets=16)

    def threshold(df: pd.DataFrame) -> pd.DataFrame:
        u = (df["n_a"] + df["n_b"] - df["n_inter"]).astype("int64")
        out = df.assign(n_union=u)[["id_a", "id_b", "n_inter", "n_union"]]
        out = out[out["n_inter"] * tau_den >= tau_num * out["n_union"]]
        return out.astype({"id_a": "int64", "id_b": "int64",
                           "n_inter": "int64", "n_union": "int64"})

    out = j.map_batches(threshold, batch_format="pandas").to_pandas()
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


ORACLES["dedup_ngram_jaccard"] = f"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_COPY_OFFSET},
         array_to_string(list_slice(string_split(text, ' '), 1,
                                    len(string_split(text, ' ')) - 5), ' ')
  FROM documents WHERE doc_id % 10 = 0
), w AS (SELECT doc_id, string_split(text, ' ') AS w FROM corpus),
sh AS (
  SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS s
  FROM w, unnest(range(1, len(w) - 1)) AS t(i)
), sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.id_a, i.id_b, i.n_inter,
       CAST(sa.n + sb.n - i.n_inter AS BIGINT) AS n_union
FROM inter i JOIN sizes sa ON sa.doc_id = i.id_a
             JOIN sizes sb ON sb.doc_id = i.id_b
WHERE i.n_inter * 5 >= 3 * (sa.n + sb.n - i.n_inter)
"""


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_NUM_QUERIES = 10
_TOPK = 5


def _query_matrix(sf_dir: str):
    emb = cm.read_arrow(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = emb.filter(pc.less(emb["vec_id"], _NUM_QUERIES))
    ids = q["vec_id"].to_numpy(zero_copy_only=False)
    m = sim.normalize_rows(sim._to_matrix(q["embedding"]))
    return {"ids": ids, "matrix": m}


def ann_topk_cosine(sf_dir: str):
    """Exact brute-force cosine top-k: broadcast query matrix, per-batch
    matmul + local top-k, global merge. Deterministic tie-break."""
    q_ref = cm.broadcast(_query_matrix(sf_dir))
    ds = cm.read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    cands = ds.map_batches(
        sim.BruteForceTopK,
        fn_constructor_args=(q_ref, _TOPK),
        batch_format="pyarrow",
        concurrency=(1, cm.pool_size()),
    )
    out = sim.global_topk(cands.to_pandas(), _TOPK)
    return out


# f64 cosine on BOTH sides (numpy f64 matmul vs DOUBLE[] cast ≈ 1e-16
# apart) and BOTH sides rank on the ROUNDED value with vec_id tie-break,
# so near-ties order identically instead of by floating-point noise.
ORACLES["ann_topk_cosine"] = f"""
SELECT query_id, vec_id, cosine FROM (
  SELECT q.vec_id AS query_id, v.vec_id AS vec_id,
         ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                      CAST(v.embedding AS DOUBLE[])), 6) AS cosine,
         ROW_NUMBER() OVER (PARTITION BY q.vec_id
                            ORDER BY ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                                                  CAST(v.embedding AS DOUBLE[])), 6) DESC,
                                     v.vec_id) AS rn
  FROM embeddings q JOIN embeddings v ON q.vec_id < {_NUM_QUERIES} AND v.vec_id <> q.vec_id
) WHERE rn <= {_TOPK}
"""


_KMEANS_SAMPLE = 2048


def ann_ivf(sf_dir: str, nprobe: int = 3, n_clusters: int = 16):
    """IVF-bucketed ANN: centroids trained on a BOUNDED deterministic
    sample (every step-th vec_id, ≤2048 vectors — fixed driver memory at
    any corpus size; k-means quality needs a sample, not the corpus),
    vectors bucketed once distributed, queries probe nprobe nearest
    buckets. Approximate (rows-only); recall vs brute force asserted in
    tests."""
    ds0 = cm.read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n = cm.table_num_rows(sf_dir, "embeddings")  # footer stat, no execution
    step = max(1, n // _KMEANS_SAMPLE)

    def every_step(t: pa.Table) -> pa.Table:
        vid = t["vec_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(vid % step == 0))

    sample = ds0.map_batches(
        every_step, batch_format="pyarrow"
    ).to_pandas()  # ≤ _KMEANS_SAMPLE rows regardless of corpus size
    m = sim.normalize_rows(sim._to_matrix(sample["embedding"]))
    cents = sim.kmeans_lite(m, n_clusters)
    cents_ref = cm.broadcast(cents)
    q = _query_matrix(sf_dir)
    probe = np.argsort(-(q["matrix"] @ cents.T), axis=1)[:, :nprobe]  # (Q, nprobe)

    ds = cm.read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    ds = ds.map_batches(
        sim.IVFAssigner, fn_constructor_args=(cents_ref,), batch_format="pyarrow", concurrency=(1, cm.pool_size())
    )
    probed_buckets = set(probe.ravel().tolist())
    ds = ds.map_batches(
        lambda t: t.filter(pc.is_in(t["bucket"], value_set=pa.array(sorted(probed_buckets), pa.int32()))),
        batch_format="pyarrow",
    )
    q_ref = cm.broadcast(q)
    cands = ds.map_batches(
        sim.BruteForceTopK, fn_constructor_args=(q_ref, _TOPK), batch_format="pyarrow", concurrency=(1, cm.pool_size())
    )
    out = sim.global_topk(cands.to_pandas(), _TOPK)
    return out


def ann_ivf_q(sf_dir: str):
    """Driver-checkable face of :func:`ann_ivf`: probing EVERY list
    (nprobe = n_clusters) makes IVF exhaustive, so the result must EQUAL
    brute-force top-k exactly — same oracle as ``ann_topk_cosine``. The
    full machinery (sampled k-means, IVFAssigner actor pool, probe-set
    bucket filter, per-batch top-k, global merge) still runs; the pruned
    nprobe=3 recall is asserted in tests/test_text_similarity.py."""
    return ann_ivf(sf_dir, nprobe=16, n_clusters=16)


ORACLES["ann_ivf"] = ORACLES["ann_topk_cosine"]


def ann_lsh(sf_dir: str, n_planes: int = 6):
    """Hyperplane-LSH bucketed ANN (the random-projection scale path
    beside :func:`ann_ivf`): vectors coded once by sign-bit hyperplane
    projections; each query multi-probes its bucket plus all hamming-1
    neighbors; brute-force cosine only within probed buckets.
    Approximate (rows-only); recall vs brute force asserted in tests."""
    q = _query_matrix(sf_dir)
    dim = q["matrix"].shape[1]
    planes = sim.hyperplanes(dim, n_planes)
    planes_ref = cm.broadcast(planes)

    q_codes = sim.lsh_code(q["matrix"], planes)
    probed = sorted(
        {c for code in q_codes for c in sim.probe_codes(int(code), n_planes, hamming=1)}
    )

    ds = cm.read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    ds = ds.map_batches(
        sim.LSHAssigner, fn_constructor_args=(planes_ref,),
        batch_format="pyarrow", concurrency=(1, cm.pool_size()),
    )
    ds = ds.map_batches(
        lambda t: t.filter(pc.is_in(t["bucket"], value_set=pa.array(probed, pa.int32()))),
        batch_format="pyarrow",
    )
    q_ref = cm.broadcast(q)
    cands = ds.map_batches(
        sim.BruteForceTopK, fn_constructor_args=(q_ref, _TOPK),
        batch_format="pyarrow", concurrency=(1, cm.pool_size()),
    )
    out = sim.global_topk(cands.to_pandas(), _TOPK)
    return out


def ann_pq(sf_dir: str, n_sub: int = 8, n_cents: int = 64, rerank: int = 50):
    """Product-quantization ANN (the COMPRESSED-corpus scale path beside
    IVF/LSH): codebooks train on the same bounded deterministic sample as
    :func:`ann_ivf`, then one distributed encode pass replaces each
    vector with n_sub uint8 codes (32× smaller at d=64/n_sub=8 — a
    10^10-vector corpus's codes fit in a fraction of fleet RAM). Search
    is the standard two-phase shape: (1) asymmetric distance computation
    over the codes — per-query LUTs built once per actor, scores are
    uint8 gathers + sums, raw embeddings untouched — shortlists
    ``rerank`` candidates per query; (2) exact cosine re-ranks ONLY the
    shortlist (a bounded Q×rerank id-filtered second read, not a corpus
    scan). Approximate (rows-only); recall vs brute force asserted in
    tests."""
    import pyarrow.dataset as pads

    ds0 = cm.read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n = cm.table_num_rows(sf_dir, "embeddings")  # footer stat, no execution
    step = max(1, n // _KMEANS_SAMPLE)

    def every_step(t: pa.Table) -> pa.Table:
        vid = t["vec_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(vid % step == 0))

    sample = ds0.map_batches(every_step, batch_format="pyarrow").to_pandas()
    m = sim.normalize_rows(sim._to_matrix(sample["embedding"]))
    codebooks = sim.train_pq_codebooks(m, n_sub=n_sub, n_cents=n_cents)
    cb_ref = cm.broadcast(codebooks)

    # one-shot search: encode + ADC fused in a single actor pass (the
    # codes aren't persisted here — PQEncoder/PQADCTopK stay the split
    # shape for a stored compressed corpus)
    q_ref = cm.broadcast(_query_matrix(sf_dir))
    shortlist = cm.read(sf_dir, "embeddings", columns=["vec_id", "embedding"]).map_batches(
        sim.PQEncodeADCTopK, fn_constructor_args=(q_ref, cb_ref, rerank),
        batch_format="pyarrow", concurrency=(1, cm.pool_size()),
    )
    cand_ids = sorted(set(sim.global_topk(shortlist.to_pandas(), rerank)["vec_id"]))
    # exact re-rank of the shortlist ONLY: ≤ Q×rerank ids by construction,
    # fetched via one id-pushdown parquet read (row-group pruned — the
    # read_keys point-lookup shape, never a corpus scan) and re-ranked in
    # one driver matmul. Bounded driver memory at any corpus size; spares
    # a whole Dataset execution vs a distributed filter pass over a
    # shortlist-sized input.
    narrowed = pads.dataset(
        os.path.join(sf_dir, "embeddings.parquet")
    ).to_table(columns=["vec_id", "embedding"],
               filter=pads.field("vec_id").isin(cand_ids))
    cands = sim.BruteForceTopK(q_ref, _TOPK)(narrowed)
    return sim.global_topk(cands.to_pandas(), _TOPK)


def embedding_dedup_cosine(
    sf_dir: str,
    tau: float = 0.95,
    n_planes: int = 6,
    small_corpus_max: int = 100_000,
):
    """Embedding near-dup pairs (cosine ≥ tau) with seeded exact copies.

    SIZE-ADAPTIVE (like ``joins.adaptive_join``), decided from the
    parquet row count before any pipeline runs:

    - **small corpus** (≤ ``small_corpus_max`` vectors): vectors RIDE the
      LSH fan-out and each bucket scores its candidates in place — one
      shuffle total. At this size the 1+P payload replication is cheaper
      than three fixed-overhead exchange stages (paired measure: 4.2 s
      vs 6.0 s at sf0.001; BASELINE.md "size-adaptive fan-out" entry).
    - **at scale**: the payload never rides the fan-out — every vector
      fans out to its home bucket plus all hamming-1 probe buckets as a
      16-byte ``(bucket, vec_id, home)`` row; ONE groupby(bucket) emits
      candidate id pairs (home × all, id_a < id_b); two bucketed hash
      joins fetch each endpoint's vector back exactly once; a vectorized
      row-wise dot scores ≥ tau. Shuffle bytes stay O(N), not O(N·P).

    High-cosine pairs differ in few sign bits, so hamming-1 multiprobe
    catches boundary-plane flips; exact copies always share a bucket.
    Raise ``n_planes`` to shrink buckets as the corpus grows."""
    from .joins import bucketed_hash_join

    ds = cm.read(sf_dir, "embeddings", columns=["vec_id", "embedding"])

    def with_copies(t: pa.Table) -> pa.Table:
        did = t["vec_id"].to_numpy(zero_copy_only=False)
        c = t.filter(pa.array(did % 10 == 0))
        c = c.set_column(0, "vec_id", pc.add(c["vec_id"], pa.scalar(_COPY_OFFSET, pa.int64())))
        return pa.concat_tables([t, c])

    corpus = ds.map_batches(with_copies, batch_format="pyarrow")
    # dim from one row-group footer read — no pipeline execution for take(1)
    import pyarrow.parquet as pq

    import os as _os

    pf = pq.ParquetFile(_os.path.join(sf_dir, "embeddings.parquet"))
    first = next(pf.iter_batches(batch_size=1, columns=["embedding"]))
    dim = len(first["embedding"][0])
    n_vecs = pf.metadata.num_rows
    planes = sim.hyperplanes(dim, n_planes)
    planes_ref = cm.broadcast(planes)
    rows_per = 1 + n_planes

    if n_vecs <= small_corpus_max:
        # SMALL path: vectors ride the fan-out, buckets score in place
        def fan_out_with_vec(t: pa.Table) -> pa.Table:
            pl = ray.get(planes_ref)
            m = sim.normalize_rows(sim._to_matrix(t["embedding"]))
            codes = sim.lsh_code(m, pl)
            ids = t["vec_id"].to_numpy(zero_copy_only=False)
            buckets = np.concatenate(
                [codes] + [codes ^ (1 << b) for b in range(n_planes)]
            )
            tiled = np.tile(m, (rows_per, 1))
            offsets = pa.array(
                np.arange(0, (len(tiled) + 1) * dim, dim, dtype=np.int32)
            )
            return pa.table(
                {
                    "bucket": pa.array(buckets.astype(np.int64)),
                    "vec_id": pa.array(np.tile(ids, rows_per)),
                    "home": pa.array(
                        np.repeat([True] + [False] * n_planes, len(ids))
                    ),
                    "emb": pa.ListArray.from_arrays(
                        offsets, pa.array(tiled.reshape(-1), pa.float64())
                    ),
                }
            )

        def bucket_score(g: pd.DataFrame) -> pd.DataFrame:
            g = g.drop_duplicates("vec_id")
            empty = pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"),
                 "id_b": pd.Series(dtype="int64"),
                 "cosine": pd.Series(dtype="float64")}
            )
            if len(g) < 2 or not g["home"].any():
                return empty
            ids = g["vec_id"].to_numpy(dtype=np.int64)
            m = np.vstack([np.asarray(v, dtype=np.float64) for v in g["emb"]])
            hm = g["home"].to_numpy(dtype=bool)
            cos = m[hm] @ m.T  # |home| × |bucket|
            a = np.repeat(ids[hm], len(ids))
            b = np.tile(ids, int(hm.sum()))
            keep = (a < b) & (cos.reshape(-1) >= tau)
            return pd.DataFrame(
                {"id_a": a[keep], "id_b": b[keep],
                 "cosine": np.round(cos.reshape(-1)[keep], 5)}
            )

        pairs = (
            corpus.map_batches(fan_out_with_vec, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(bucket_score, batch_format="pandas")
        )
        df = pairs.to_pandas().drop_duplicates(["id_a", "id_b"])
        return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)

    def fan_out(t: pa.Table) -> pd.DataFrame:
        pl = ray.get(planes_ref)
        m = sim.normalize_rows(sim._to_matrix(t["embedding"]))
        codes = sim.lsh_code(m, pl)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)
        buckets = np.concatenate(
            [codes] + [codes ^ (1 << b) for b in range(n_planes)]
        )
        return pd.DataFrame(
            {
                "bucket": buckets.astype(np.int64),
                "vec_id": np.tile(ids, rows_per),
                "home": np.repeat([True] + [False] * n_planes, len(ids)),
            }
        )

    fanned = corpus.map_batches(fan_out, batch_format="pyarrow")

    def bucket_candidates(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("vec_id")
        home = g.loc[g["home"], "vec_id"].to_numpy(dtype=np.int64)
        allv = g["vec_id"].to_numpy(dtype=np.int64)
        if len(home) == 0 or len(allv) < 2:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")}
            )
        a = np.repeat(home, len(allv))
        b = np.tile(allv, len(home))
        keep = a < b  # hamming<=1 probes are symmetric: the a<b order
        return pd.DataFrame({"id_a": a[keep], "id_b": b[keep]})  # always surfaces

    # A pair surfaces at most twice (once per endpoint's home bucket), so
    # candidate dedup is NOT worth a shuffle: carry the ≤2× duplicates
    # through the joins and drop them on the tiny ≥tau result instead.
    cands = fanned.groupby("bucket").map_groups(bucket_candidates, batch_format="pandas")

    def vec_side(id_name: str, emb_name: str):
        # emit an Arrow list<double> column, NOT pandas ndarray cells —
        # ndarray cells become Ray tensor-extension arrays that the sort
        # exchange inside the hash join cannot normalize to pandas
        def prep(t: pa.Table) -> pa.Table:
            m = sim.normalize_rows(sim._to_matrix(t["embedding"]))
            offsets = pa.array(
                np.arange(0, (len(m) + 1) * dim, dim, dtype=np.int32)
            )
            la = pa.ListArray.from_arrays(
                offsets, pa.array(m.reshape(-1), pa.float64())
            )
            return pa.table({id_name: t["vec_id"], emb_name: la})

        return corpus.map_batches(prep, batch_format="pyarrow")

    joined = bucketed_hash_join(cands, vec_side("id_a", "emb_a"), on="id_a")
    joined = bucketed_hash_join(joined, vec_side("id_b", "emb_b"), on="id_b")

    def score(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64"),
                 "cosine": pd.Series(dtype="float64")}
            )
        ma = np.vstack([np.asarray(v, dtype=np.float64) for v in df["emb_a"]])
        mb = np.vstack([np.asarray(v, dtype=np.float64) for v in df["emb_b"]])
        cos = (ma * mb).sum(axis=1)
        keep = cos >= tau
        return pd.DataFrame(
            {"id_a": df["id_a"].to_numpy(dtype=np.int64)[keep],
             "id_b": df["id_b"].to_numpy(dtype=np.int64)[keep],
             "cosine": np.round(cos[keep], 5)}
        )

    pairs = joined.map_batches(score, batch_format="pandas")
    df = pairs.to_pandas().drop_duplicates(["id_a", "id_b"])
    return df.sort_values(["id_a", "id_b"]).reset_index(drop=True)


ORACLES["embedding_dedup_cosine"] = f"""
WITH corpus AS (
  SELECT vec_id, embedding FROM embeddings
  UNION ALL
  SELECT vec_id + {_COPY_OFFSET}, embedding FROM embeddings WHERE vec_id % 10 = 0
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                    CAST(b.embedding AS DOUBLE[])), 5) AS cosine
FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= {0.95}
"""


def dedup_semantic(
    sf_dir: str,
    tau: float = 0.95,
    n_clusters: int = 16,
    max_cluster: int = 100_000,
):
    """SemDeDup-style semantic dedup (Abbas et al. 2023,
    arXiv:2303.09540): k-means partition the embedding space — centroids
    trained on a BOUNDED deterministic sample, the ann_ivf recipe — then
    remove semantic duplicates WITHIN each cluster only, so the pairwise
    work is O(Σ cᵢ·keptᵢ) instead of O(N²); ``n_clusters`` is the scale
    lever (SemDeDup runs ~10⁵ clusters on web corpora).

    Within a cluster: greedy ascending-id sweep — a vector whose max
    cosine against the already-KEPT members is ≥ tau is removed and
    attributed to that member (deterministic: first/max kept match).
    Clusters beyond ``max_cluster`` members process their first
    ``max_cluster`` by id and pass the tail uninspected — an explicit
    skew cap (the ``stages/dedup.py max_bucket`` philosophy); at real
    scale you raise ``n_clusters`` instead of the cap.

    Two exchanges total: the assignment actor-pool pass feeds ONE
    groupby(cluster); everything else is map-side. Corpus seeded with
    exact copies (``vec_id % 10 == 0`` under ``+_COPY_OFFSET``) so the
    result is non-trivially non-empty. Non-SQL (k-means): pytest asserts
    distributed == serial recompute with the same centroids and the
    planted-copy contract (tests/test_text_similarity.py). Returns
    (dup_id, kept_as, cosine) sorted by dup_id."""
    ds = cm.read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    n = cm.table_num_rows(sf_dir, "embeddings")
    step = max(1, n // _KMEANS_SAMPLE)

    def every_step(t: pa.Table) -> pa.Table:
        vid = t["vec_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(vid % step == 0))

    sample = ds.map_batches(every_step, batch_format="pyarrow").to_pandas()
    cents = sim.kmeans_lite(
        sim.normalize_rows(sim._to_matrix(sample["embedding"])), n_clusters
    )
    cents_ref = cm.broadcast(cents)

    def with_copies(t: pa.Table) -> pa.Table:
        vid = t["vec_id"].to_numpy(zero_copy_only=False)
        c = t.filter(pa.array(vid % 10 == 0))
        c = c.set_column(
            0, "vec_id", pc.add(c["vec_id"], pa.scalar(_COPY_OFFSET, pa.int64()))
        )
        return pa.concat_tables([t, c])

    corpus = ds.map_batches(with_copies, batch_format="pyarrow")
    assigned = corpus.map_batches(
        sim.IVFAssigner, fn_constructor_args=(cents_ref,),
        batch_format="pyarrow", concurrency=(1, cm.pool_size()),
    )

    def cluster_dedup(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy(dtype=np.int64)
        order = np.argsort(ids)[:max_cluster]
        ids = ids[order]
        m = sim.normalize_rows(sim._to_matrix(g["embedding"]))[order]
        kept: list[int] = []
        dup, kept_as, cos = [], [], []
        for i in range(len(ids)):
            if kept:
                sims = m[kept] @ m[i]
                j = int(np.argmax(sims))
                if sims[j] >= tau:
                    dup.append(ids[i])
                    kept_as.append(ids[kept[j]])
                    cos.append(round(float(sims[j]), 5))
                    continue
            kept.append(i)
        return pd.DataFrame(
            {"dup_id": pd.Series(dup, dtype="int64"),
             "kept_as": pd.Series(kept_as, dtype="int64"),
             "cosine": pd.Series(cos, dtype="float64")}
        )

    out = assigned.groupby("bucket").map_groups(
        cluster_dedup, batch_format="pandas"
    ).to_pandas()
    return out.sort_values("dup_id").reset_index(drop=True)


# ---------------------------------------------------------------------------
# Multimodal plumbing (decode stub; real Ray-side schema/actor layout)
# ---------------------------------------------------------------------------

def multimodal_decode(sf_dir: str):
    """Binary payload → actor-pool decode (FakeDecoder stub) → frame-sample
    → per-media frame counts. The decode features are stubbed; the schema,
    actor signature, batch sizing and output layout are the real plumbing."""
    docs = cm.read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_media(t: pa.Table) -> pa.Table:
        payloads = [s.encode("utf-8") for s in t["text"].to_pylist()]
        return mm.to_media_table(t["doc_id"].to_pylist(), payloads, "text/plain")

    media = docs.map_batches(to_media, batch_format="pyarrow")
    decoded = media.map_batches(
        mm.FakeDecoder, batch_format="pyarrow", concurrency=(1, cm.pool_size()), batch_size=64
    )
    # FrameSampler is light/stateless → an instance as a task fn, no pool
    frames = decoded.map_batches(mm.FrameSampler(), batch_format="pyarrow")
    out = cm.partial_groupby_sum(frames, keys=["media_id"], sums={}, counts="n_frames")
    return out


ORACLES["multimodal_decode"] = """
SELECT doc_id AS media_id,
       LEAST(8, GREATEST(1, octet_length(CAST(text AS BLOB)) // 1000)) AS n_frames
FROM documents
"""


_RESIZE_TARGET = 64


class _DecodeSampleResize:
    """Fused multimodal stage: decode (stub codec) → frame-sample →
    resize, all per batch on the SAME media rows; the frame rows never
    cross media boundaries, so the per-media frame count is a
    within-batch aggregate — no shuffle. Real stages composed, one pool."""

    def __init__(self, target_bytes: int):
        self.decoder = mm.FakeDecoder()
        self.sampler = mm.FrameSampler()
        self.resizer = mm.Resizer(target_bytes)

    def __call__(self, batch: pa.Table) -> pa.Table:
        decoded = self.decoder(batch)          # (media_id, n_bytes, feature)
        frames = self.sampler(decoded)         # one row per sampled frame
        counts = (
            frames.to_pandas().groupby("media_id", sort=False).size()
        )
        resized = self.resizer(batch)          # (media_id, payload, n_bytes, orig_bytes)
        mids = resized["media_id"].to_pandas()
        return pa.table(
            {
                "media_id": resized["media_id"],
                "n_frames": pa.array(counts.reindex(mids).to_numpy(), pa.int64()),
                "n_bytes": resized["n_bytes"],
                "orig_bytes": resized["orig_bytes"],
            }
        )


def multimodal_pipeline(sf_dir: str):
    """Binary media plumbing end-to-end (S8/K12 analogs): payload →
    actor-pool decode (stub codec, real batch/actor layout) → frame
    sampling → resize/transcode → per-media metadata row. Small
    batch_size because binary rows are wide; features/metadata out,
    payload never re-emitted."""
    docs = cm.read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_media(t: pa.Table) -> pa.Table:
        payloads = [s.encode("utf-8") for s in t["text"].to_pylist()]
        return mm.to_media_table(t["doc_id"].to_pylist(), payloads, "text/plain")

    media = docs.map_batches(to_media, batch_format="pyarrow")
    out = media.map_batches(
        _DecodeSampleResize,
        fn_constructor_args=(_RESIZE_TARGET,),
        batch_format="pyarrow",
        concurrency=(1, cm.pool_size()),
        batch_size=64,
    )
    return out


ORACLES["multimodal_pipeline"] = f"""
SELECT doc_id AS media_id,
       LEAST(8, GREATEST(1, n_b // 1000)) AS n_frames,
       CASE WHEN n_b <= {_RESIZE_TARGET} THEN n_b
            ELSE CAST(FLOOR((n_b + CAST(FLOOR((n_b + {_RESIZE_TARGET} - 1)
                   / {_RESIZE_TARGET}) AS BIGINT) - 1)
                 / CAST(FLOOR((n_b + {_RESIZE_TARGET} - 1) / {_RESIZE_TARGET}) AS BIGINT))
                 AS BIGINT) END AS n_bytes,
       n_b AS orig_bytes
FROM (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_b FROM documents)
"""


def multimodal_resize(sf_dir: str):
    """Binary resize plumbing (thumbnail-writer analog K12,
    ``dataPipelines/gc_thumbnails/utils.py:31-47``): payload → decimated
    payload via an actor-pool Resizer (stub codec, real binary-in/
    binary-out layout); output is size metadata per media object."""
    docs = cm.read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_media(t: pa.Table) -> pa.Table:
        payloads = [s.encode("utf-8") for s in t["text"].to_pylist()]
        return mm.to_media_table(t["doc_id"].to_pylist(), payloads, "text/plain")

    media = docs.map_batches(to_media, batch_format="pyarrow")
    resized = media.map_batches(
        mm.Resizer,
        fn_constructor_args=(_RESIZE_TARGET,),
        batch_format="pyarrow",
        concurrency=(1, cm.pool_size()),
        batch_size=64,
    )
    return resized.select_columns(["media_id", "n_bytes", "orig_bytes"])


ORACLES["multimodal_resize"] = f"""
SELECT doc_id AS media_id,
       CASE WHEN n_b <= {_RESIZE_TARGET} THEN n_b
            ELSE CAST(FLOOR((n_b + CAST(FLOOR((n_b + {_RESIZE_TARGET} - 1)
                   / {_RESIZE_TARGET}) AS BIGINT) - 1)
                 / CAST(FLOOR((n_b + {_RESIZE_TARGET} - 1) / {_RESIZE_TARGET}) AS BIGINT))
                 AS BIGINT) END AS n_bytes,
       n_b AS orig_bytes
FROM (SELECT doc_id, octet_length(CAST(text AS BLOB)) AS n_b FROM documents)
"""


def multimodal_pdf_pages(sf_dir: str):
    """REAL PDF decode (S8, non-stub): each document's text becomes a
    deterministic FlateDecode PDF (``codecs.build_pdf``); an actor-pool
    :class:`..stages.multimodal.PdfTextExtractor` parses the binary back
    to per-page text (``pdf_reader.py:7-14`` + ``pages.py:26-33``
    parity, pure Python). The output projects md5 of the EXTRACTED text,
    and the oracle md5s the SOURCE column — a byte-exact check that the
    extraction itself is real, not just the plumbing."""
    import hashlib as _hl

    from ..stages import codecs as cdx

    docs = cm.read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_pdf(t: pa.Table) -> pa.Table:
        payloads = [cdx.build_pdf([s]) for s in t["text"].to_pylist()]
        return mm.to_media_table(t["doc_id"].to_pylist(), payloads, "application/pdf")

    media = docs.map_batches(to_pdf, batch_format="pyarrow", batch_size=64)
    pages = media.map_batches(
        mm.PdfTextExtractor,
        batch_format="pyarrow",
        concurrency=(1, cm.pool_size()),
        batch_size=64,
    )

    def project(t: pa.Table) -> pa.Table:
        digests = [
            _hl.md5(s.encode("utf-8")).hexdigest()
            for s in t["page_text"].to_pylist()
        ]
        return pa.table(
            {
                "media_id": t["media_id"],
                "page_idx": t["page_idx"],
                "text_md5": pa.array(digests, pa.string()),
            }
        )

    return pages.map_batches(project, batch_format="pyarrow")


ORACLES["multimodal_pdf_pages"] = """
SELECT doc_id AS media_id, CAST(0 AS INT) AS page_idx, md5(text) AS text_md5
FROM documents
"""


_PPM_W, _PPM_H = 8, 6


class _PpmDecodeThumb:
    """Fused REAL image stage: ONE Netpbm decode per payload feeds both
    the exact per-channel pixel sums and the nearest-neighbor thumbnail
    re-encode — one actor pool, payload decoded once, never re-emitted
    past the stage."""

    def __init__(self, max_side: int = 4):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages import codecs as cdx

        ws, hs, sr, sg, sb, tb = [], [], [], [], [], []
        for payload in batch["payload"].to_pylist():
            img = cdx.parse_ppm(payload)
            h, w = img.shape[:2]
            sums = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
            scale = max(h, w) / float(self.max_side)
            if scale > 1.0:
                img = cdx.resize_nearest(
                    img, max(1, int(round(w / scale))), max(1, int(round(h / scale)))
                )
            ws.append(w)
            hs.append(h)
            sr.append(int(sums[0]))
            sg.append(int(sums[1]))
            sb.append(int(sums[2]))
            tb.append(len(cdx.build_ppm(img)))
        return pa.table(
            {
                "media_id": batch["media_id"],
                "w": pa.array(ws, pa.int64()),
                "h": pa.array(hs, pa.int64()),
                "sum_r": pa.array(sr, pa.int64()),
                "sum_g": pa.array(sg, pa.int64()),
                "sum_b": pa.array(sb, pa.int64()),
                "thumb_bytes": pa.array(tb, pa.int64()),
            }
        )


def multimodal_ppm_stats(sf_dir: str):
    """REAL image decode + thumbnail (S8/K12, non-stub): a deterministic
    8×6 PPM per doc (pixel i = (doc_id·7 + i) mod 251, SQL-recomputable),
    decoded by the real Netpbm codec and thumbnailed by a real
    nearest-neighbor resample (``gc_thumbnails/utils.py:38-47`` parity).
    Exact integer oracle: per-channel pixel sums + the thumbnail's
    re-encoded byte size."""
    from ..stages import codecs as cdx

    docs = cm.read(sf_dir, "documents", columns=["doc_id"])

    def to_ppm(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        i = np.arange(_PPM_W * _PPM_H * 3, dtype=np.int64)
        payloads = [
            cdx.build_ppm(
                ((d * 7 + i) % 251).astype(np.uint8).reshape(_PPM_H, _PPM_W, 3)
            )
            for d in ids
        ]
        return mm.to_media_table(ids, payloads, "image/x-portable-pixmap")

    media = docs.map_batches(to_ppm, batch_format="pyarrow", batch_size=64)
    return media.map_batches(
        _PpmDecodeThumb,
        batch_format="pyarrow",
        concurrency=(1, cm.pool_size()),
        batch_size=64,
    )


# thumbnail: 8×6 → max_side 4 → 4×3 P6 = len("P6\n4 3\n255\n") + 36 = 47
ORACLES["multimodal_ppm_stats"] = f"""
WITH px AS (
  SELECT d.doc_id, i.i, (d.doc_id * 7 + i.i) % 251 AS v
  FROM documents d CROSS JOIN (SELECT UNNEST(range({_PPM_W * _PPM_H * 3})) AS i) i
)
SELECT doc_id AS media_id,
       CAST({_PPM_W} AS BIGINT) AS w, CAST({_PPM_H} AS BIGINT) AS h,
       CAST(SUM(CASE WHEN i % 3 = 0 THEN v END) AS BIGINT) AS sum_r,
       CAST(SUM(CASE WHEN i % 3 = 1 THEN v END) AS BIGINT) AS sum_g,
       CAST(SUM(CASE WHEN i % 3 = 2 THEN v END) AS BIGINT) AS sum_b,
       CAST(47 AS BIGINT) AS thumb_bytes
FROM px GROUP BY doc_id
"""


_WAV_RATE = 8000
_WAV_BASE, _WAV_VAR = 256, 128  # samples per doc: base + doc_id % var


class _WavDecodeStats:
    """Actor-pool stage: REAL RIFF/WAVE PCM decode → exact integer
    sample statistics. Decoded floats re-quantize to the original int16
    raws losslessly (round(s·32767) inverts the encoder exactly), so the
    emitted sums are integers a SQL oracle recomputes bit-for-bit."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages import codecs as cdx

        ids, rates, ns, chs, sums, sumsqs = [], [], [], [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            rate, s = cdx.parse_wav(payload)
            raw = np.round(s[:, 0] * 32767.0).astype(np.int64)
            ids.append(mid)
            rates.append(rate)
            ns.append(len(raw))
            chs.append(s.shape[1])
            sums.append(int(raw.sum()))
            sumsqs.append(int((raw * raw).sum()))
        return pa.table(
            {"media_id": pa.array(ids, pa.int64()),
             "rate": pa.array(rates, pa.int64()),
             "n_samples": pa.array(ns, pa.int64()),
             "channels": pa.array(chs, pa.int64()),
             "sum_raw": pa.array(sums, pa.int64()),
             "sumsq_raw": pa.array(sumsqs, pa.int64())}
        )


def multimodal_wav_stats(sf_dir: str):
    """REAL audio decode (the WAV analog of :func:`multimodal_ppm_stats`):
    a deterministic PCM signal per doc — sample i's int16 raw value is
    ``(doc_id·13 + i·97) mod 65535 − 32767``, doc length ``256 +
    doc_id mod 128`` samples — encoded with the real RIFF/WAVE writer,
    decoded by the real parser inside an actor pool, reduced to exact
    integer statistics the SQL oracle recomputes bit-for-bit. Small
    batches: audio rows are wide binary payloads (brief: multimodal
    stages need small batch_size)."""
    from ..stages import codecs as cdx

    docs = cm.read(sf_dir, "documents", columns=["doc_id"])

    def to_wav(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payloads = []
        for d in ids:
            n = _WAV_BASE + d % _WAV_VAR
            i = np.arange(n, dtype=np.int64)
            raw = (d * 13 + i * 97) % 65535 - 32767
            payloads.append(cdx.build_wav(raw / 32767.0, _WAV_RATE))
        return mm.to_media_table(ids, payloads, "audio/wav")

    media = docs.map_batches(to_wav, batch_format="pyarrow", batch_size=64)
    return media.map_batches(
        _WavDecodeStats,
        batch_format="pyarrow",
        concurrency=(1, cm.pool_size()),
        batch_size=64,
    )


ORACLES["multimodal_wav_stats"] = f"""
WITH s AS (
  SELECT d.doc_id, i.i,
         (d.doc_id * 13 + i.i * 97) % 65535 - 32767 AS v
  FROM documents d
  CROSS JOIN (SELECT UNNEST(range({_WAV_BASE + _WAV_VAR})) AS i) i
  WHERE i.i < {_WAV_BASE} + d.doc_id % {_WAV_VAR}
)
SELECT doc_id AS media_id, CAST({_WAV_RATE} AS BIGINT) AS rate,
       CAST(COUNT(*) AS BIGINT) AS n_samples, CAST(1 AS BIGINT) AS channels,
       CAST(SUM(v) AS BIGINT) AS sum_raw,
       CAST(SUM(v * v) AS BIGINT) AS sumsq_raw
FROM s GROUP BY doc_id
"""


_GIF_W, _GIF_H = 8, 6
_GIF_BASE, _GIF_VAR, _GIF_EVERY = 4, 3, 2


def multimodal_gif_frames(sf_dir: str):
    """REAL video-analog pipeline (decode → frame-sample → resize on a
    genuine compressed container): a deterministic animated GIF per doc
    — ``4 + doc_id mod 3`` grayscale 8×6 frames, frame f's pixel i =
    ``(doc_id·7 + f·31 + i·3) mod 251`` — LZW-encoded by the real GIF
    writer, decoded + every-2nd-frame sampled + nearest-resized by
    :class:`..stages.multimodal.GifFrameSampler` in an actor pool.
    Exact integer oracle per SAMPLED frame. Small batches (wide binary
    rows)."""
    from ..stages import codecs as cdx

    docs = cm.read(sf_dir, "documents", columns=["doc_id"])

    def to_gif(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        i = np.arange(_GIF_W * _GIF_H, dtype=np.int64)
        payloads = []
        for d in ids:
            frames = []
            for f in range(_GIF_BASE + d % _GIF_VAR):
                v = ((d * 7 + f * 31 + i * 3) % 251).astype(np.uint8)
                gray = v.reshape(_GIF_H, _GIF_W)
                frames.append(np.stack([gray, gray, gray], axis=2))
            payloads.append(cdx.build_gif(frames))
        return mm.to_media_table(ids, payloads, "image/gif")

    media = docs.map_batches(to_gif, batch_format="pyarrow", batch_size=64)
    return media.map_batches(
        mm.GifFrameSampler,
        fn_constructor_args=(_GIF_EVERY,),
        batch_format="pyarrow",
        concurrency=(1, cm.pool_size()),
        batch_size=64,
    )


# thumbnail: 8×6 → 4×3 P6 = len("P6\n4 3\n255\n") + 36 = 47 bytes
ORACLES["multimodal_gif_frames"] = f"""
WITH fr AS (
  SELECT d.doc_id, f.f, {_GIF_BASE} + d.doc_id % {_GIF_VAR} AS nf
  FROM documents d
  CROSS JOIN (SELECT UNNEST(range({_GIF_BASE + _GIF_VAR})) AS f) f
  WHERE f.f < {_GIF_BASE} + d.doc_id % {_GIF_VAR} AND f.f % {_GIF_EVERY} = 0
), px AS (
  SELECT fr.doc_id, fr.f, fr.nf,
         (fr.doc_id * 7 + fr.f * 31 + i.i * 3) % 251 AS v
  FROM fr CROSS JOIN (SELECT UNNEST(range({_GIF_W * _GIF_H})) AS i) i
)
SELECT doc_id AS media_id, CAST(f AS BIGINT) AS frame_idx,
       CAST(nf AS BIGINT) AS n_frames, CAST(SUM(v) AS BIGINT) AS sum_v,
       CAST(47 AS BIGINT) AS thumb_bytes
FROM px GROUP BY doc_id, f, nf
"""


def docs_html_text(sf_dir: str):
    """HTML → normalized text coercion (S9, non-stub; reference
    ``html_utils.py:96-150`` sanitize chain). Each document's text is
    wrapped in a full synthetic page loaded with the exact boilerplate
    the sanitizer must drop (navbar, skip-link, script/style, comments,
    nav/footer, empty table rows, entity-escaped payload); the
    actor-pool :class:`..stages.html.HtmlTextExtractor` parses it back.
    Byte-exact oracle: md5 of the EXTRACTED text vs md5 of the SOURCE
    column — a failed strip or a lost/extra byte is a hash mismatch."""
    import hashlib as _hl

    from ..stages import html as sh

    docs = cm.read(sf_dir, "documents", columns=["doc_id", "text"])

    def to_html(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        pages = [sh.build_html(s, d) for d, s in zip(ids, t["text"].to_pylist())]
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "html": pa.array(pages, pa.string())}
        )

    extracted = docs.map_batches(to_html, batch_format="pyarrow").map_batches(
        sh.HtmlTextExtractor,
        batch_format="pyarrow",
        concurrency=(1, cm.pool_size()),
    )

    def project(t: pa.Table) -> pa.Table:
        digests = [
            _hl.md5(s.encode("utf-8")).hexdigest() for s in t["text"].to_pylist()
        ]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text_md5": pa.array(digests, pa.string()),
                "n_chars": t["n_chars"],
            }
        )

    return extracted.map_batches(project, batch_format="pyarrow")


ORACLES["docs_html_text"] = """
SELECT doc_id, md5(text) AS text_md5, CAST(length(text) AS BIGINT) AS n_chars
FROM documents
"""


# ---------------------------------------------------------------------------
# Duplicate-cluster assignment — distributed connected components
# ---------------------------------------------------------------------------

_CC_STRIDE = 8  # non-overlapping shingle width (full shingles only)
_CC_MAX_ITERS = 8


def dedup_clusters(sf_dir: str, max_iters: int = _CC_MAX_ITERS):
    """Assign every document to a duplicate CLUSTER (the min doc_id of its
    connected component) — the step after candidate generation that exact
    dedup pipelines need: near-dup pairs are edges, and the keep/drop
    decision wants one canonical representative per component, not per
    pair.

    Plan (all stages distributed; BSP label propagation):
      1. shingle rows: per doc, non-overlapping ``_CC_STRIDE``-gram
         shingles (full-width only) — vectorized explode + positional
         group concat; (doc_id, shingle) rows, linear in corpus tokens.
      2. star edges: ``groupby(shingle)`` emits bidirectional edges from
         each bucket's min doc to the rest — O(bucket) edges, never the
         O(bucket²) pair blow-up, same connectivity.
      3. min-label propagation: labels start as own doc_id; each round
         hash-joins edges to labels and takes the per-node min
         (``routed_grouped_agg``). The label sum is monotone
         non-increasing, so equal sums == fixpoint; iteration count is
         the component diameter (tiny for dup clusters — star edges make
         each shingle bucket diameter 2).

    The oracle recomputes the same corpus, the same full-shingle buckets,
    complete within-bucket edges (identical components as star edges) and
    a recursive-CTE transitive closure with MIN over reachable labels.
    """
    corpus = _with_near_copies(sf_dir)

    def shingle_rows(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].str.split(" ")
        counts = words.str.len().to_numpy(dtype=np.int64)
        exploded = words.explode()
        doc = df["doc_id"].to_numpy()[np.repeat(np.arange(len(df)), counts)]
        pos = (
            np.concatenate([np.arange(c) for c in counts])
            if len(counts)
            else np.empty(0, dtype=np.int64)
        )
        t = pd.DataFrame(
            {"doc_id": doc, "w": exploded.to_numpy(), "sid": pos // _CC_STRIDE}
        )
        g = t.groupby(["doc_id", "sid"], sort=False)["w"]
        sh = g.agg(" ".join)
        full = sh[g.size() == _CC_STRIDE].reset_index()
        out = full[["doc_id", "w"]].rename(columns={"w": "shingle"})
        return out.drop_duplicates()

    shingles = corpus.map_batches(shingle_rows, batch_format="pandas")

    def star_edges(g: pd.DataFrame) -> pd.DataFrame:
        m = int(g["doc_id"].min())
        others = g.loc[g["doc_id"] != m, "doc_id"].unique()
        if len(others) == 0:
            return pd.DataFrame({"src": pd.Series(dtype="int64"), "dst": pd.Series(dtype="int64")})
        return pd.DataFrame(
            {
                "src": np.concatenate([np.full(len(others), m, dtype=np.int64), others]),
                "dst": np.concatenate([others, np.full(len(others), m, dtype=np.int64)]),
            }
        )

    # self-loop edges make each propagation round self-contained (every
    # node re-receives its own current label), so a round is exactly ONE
    # co-bucketed join + ONE grouped min — no separate union pass
    self_loops = corpus.map_batches(
        lambda df: pd.DataFrame({"src": df["doc_id"], "dst": df["doc_id"]}),
        batch_format="pandas",
    )
    edges = (
        shingles.groupby("shingle")
        .map_groups(star_edges, batch_format="pandas")
        .union(self_loops)
        .materialize()
    )

    labels = corpus.map_batches(
        lambda df: pd.DataFrame({"src": df["doc_id"], "label": df["doc_id"]}),
        batch_format="pandas",
    ).materialize()

    from .joins import bucketed_hash_join

    prev_sum = None
    for _ in range(max_iters):
        prop = bucketed_hash_join(edges, labels, on="src", num_buckets=8).map_batches(
            lambda df: pd.DataFrame({"src": df["dst"], "label": df["label"]}),
            batch_format="pandas",
        )
        labels = cm.routed_grouped_agg(
            prop, ["src"], {"label": "min"}, num_routes=64
        ).materialize()
        s = labels.sum("label")
        if s == prev_sum:
            break
        prev_sum = s

    return labels.map_batches(
        lambda df: pd.DataFrame({"doc_id": df["src"], "cluster": df["label"]}),
        batch_format="pandas",
    )


ORACLES["dedup_clusters"] = f"""
WITH RECURSIVE corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + {_COPY_OFFSET} AS doc_id,
         array_to_string(
           (string_split(text, ' '))[1:GREATEST(len(string_split(text, ' ')) - 5, 0)],
           ' ') AS text
  FROM documents WHERE doc_id % 10 = 0
),
words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         unnest(range(len(string_split(text, ' ')))) AS pos
  FROM corpus
),
sh AS (
  SELECT doc_id, pos // {_CC_STRIDE} AS sid,
         string_agg(w, ' ' ORDER BY pos) AS shingle, COUNT(*) AS c
  FROM words GROUP BY doc_id, pos // {_CC_STRIDE}
),
fsh AS (SELECT DISTINCT doc_id, shingle FROM sh WHERE c = {_CC_STRIDE}),
edges AS (
  SELECT a.doc_id AS u, b.doc_id AS v
  FROM fsh a JOIN fsh b USING (shingle) WHERE a.doc_id <> b.doc_id
),
reach(node, label) AS (
  SELECT doc_id, doc_id FROM corpus
  UNION
  SELECT e.v, r.label FROM reach r JOIN edges e ON e.u = r.node
)
SELECT node AS doc_id, MIN(label) AS cluster FROM reach GROUP BY node
"""


# ---------------------------------------------------------------------------
# PDF-page raster thumbnail (K12 residue closed, round 5): the reference
# rasterizes a PDF's first page to a thumbnail via fitz pixmap
# (gc_thumbnails/utils.py:38-47); this is the same loop with the repo's
# own real components — FlateDecode PDF parse → glyph rasterizer →
# nearest-neighbor resample — and an exact INTEGER DuckDB oracle
# (per-character ink popcounts + integer thumbnail geometry).
# ---------------------------------------------------------------------------

_THUMB_SIDE = 16


def _thumb_dims(w: int, h: int, side: int = _THUMB_SIDE) -> tuple[int, int]:
    """Integer round-half-up scaling both sides replicate in SQL."""
    m = max(w, h)
    if m <= side:
        return w, h
    return (max(1, (2 * w * side + m) // (2 * m)),
            max(1, (2 * h * side + m) // (2 * m)))


class _PdfThumbRaster:
    """Actor-pool stage: REAL PDF text decode → REAL rasterization
    (fixed-pitch glyph renderer through the PPM codec) → REAL
    nearest-neighbor thumbnail; emits exact integer facts: page
    geometry, ink pixel count of the rendered page, thumbnail geometry
    + re-encoded byte size."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..stages import codecs as cdx
        from ..stages.glyph_ocr import render_page_ppm

        ids, pw, ph, ink, tw, th, tb = [], [], [], [], [], [], []
        for mid, payload in zip(batch["media_id"].to_pylist(),
                                batch["payload"].to_pylist()):
            text = cdx.extract_pdf_text(payload)[0]
            img = cdx.parse_ppm(render_page_ppm(text))
            h, w = img.shape[:2]
            dark = (img.mean(axis=2) < 128)
            ow, oh = _thumb_dims(w, h)
            thumb = cdx.resize_nearest(img, ow, oh)
            ids.append(mid)
            pw.append(w)
            ph.append(h)
            ink.append(int(dark.sum()))
            tw.append(ow)
            th.append(oh)
            tb.append(len(cdx.build_ppm(thumb)))
        return pa.table(
            {"media_id": pa.array(ids, pa.int64()),
             "page_w": pa.array(pw, pa.int64()),
             "page_h": pa.array(ph, pa.int64()),
             "ink_px": pa.array(ink, pa.int64()),
             "thumb_w": pa.array(tw, pa.int64()),
             "thumb_h": pa.array(th, pa.int64()),
             "thumb_bytes": pa.array(tb, pa.int64())}
        )


def multimodal_pdf_thumbnail(sf_dir: str):
    """PDF first-page raster thumbnail (K12,
    ``gc_thumbnails/utils.py:38-47``): a deterministic one-line page
    text per doc becomes a REAL FlateDecode PDF; the actor pool decodes
    the text back out of the PDF, rasterizes it with the glyph engine's
    renderer, thumbnails by nearest-neighbor, and reports exact integer
    stats the SQL oracle recomputes from the text alone — ink pixels =
    the summed dot-matrix popcounts of the characters, geometry = the
    renderer's grid arithmetic, thumbnail size = P6 header + 3·w·h."""
    from ..stages import codecs as cdx

    docs = cm.read(sf_dir, "documents", columns=["doc_id"])

    def to_pdf(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payloads = [cdx.build_pdf([f"DOC {d} P1."]) for d in ids]
        return mm.to_media_table(ids, payloads, "application/pdf")

    media = docs.map_batches(to_pdf, batch_format="pyarrow", batch_size=64)
    return media.map_batches(
        _PdfThumbRaster,
        batch_format="pyarrow",
        concurrency=(1, cm.pool_size()),
        batch_size=64,
    )


def _pdf_thumb_oracle() -> str:
    from ..stages.glyph_ocr import CELL_H, CELL_W, MARGIN, _glyph_bits

    # per-character ink popcount CASE arm table, generated from the font
    chars = "DOCP1. 0123456789"
    arms = " ".join(
        f"WHEN '{c}' THEN {int(_glyph_bits(c).sum())}" for c in sorted(set(chars))
    )
    s = _THUMB_SIDE
    return f"""
WITH t AS (
  SELECT doc_id, 'DOC ' || doc_id || ' P1.' AS txt FROM documents
), geo AS (
  SELECT doc_id, txt,
         CAST({2 * MARGIN} + len(txt) * {CELL_W} AS BIGINT) AS page_w,
         CAST({2 * MARGIN + CELL_H} AS BIGINT) AS page_h
  FROM t
), ink AS (
  SELECT g.doc_id,
         CAST(SUM(CASE substring(g.txt, i.i + 1, 1) {arms} ELSE 0 END)
              AS BIGINT) AS ink_px
  FROM geo g, LATERAL (SELECT UNNEST(range(len(g.txt))) AS i) i
  GROUP BY g.doc_id
), dims AS (
  SELECT doc_id, page_w, page_h,
         CASE WHEN GREATEST(page_w, page_h) <= {s} THEN page_w
              ELSE GREATEST(1, (2 * page_w * {s} + GREATEST(page_w, page_h))
                               // (2 * GREATEST(page_w, page_h))) END AS tw,
         CASE WHEN GREATEST(page_w, page_h) <= {s} THEN page_h
              ELSE GREATEST(1, (2 * page_h * {s} + GREATEST(page_w, page_h))
                               // (2 * GREATEST(page_w, page_h))) END AS th
  FROM geo
)
SELECT d.doc_id AS media_id, d.page_w, d.page_h, i.ink_px,
       CAST(d.tw AS BIGINT) AS thumb_w, CAST(d.th AS BIGINT) AS thumb_h,
       CAST(9 + len(CAST(d.tw AS VARCHAR)) + len(CAST(d.th AS VARCHAR))
            + 3 * d.tw * d.th AS BIGINT) AS thumb_bytes
FROM dims d JOIN ink i USING (doc_id)
"""


ORACLES["multimodal_pdf_thumbnail"] = _pdf_thumb_oracle()

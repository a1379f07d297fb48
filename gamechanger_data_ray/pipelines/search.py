"""Search-and-curation operators over the documents corpus.

The reference publishes every parsed document into Elasticsearch and
serves term queries from there (`gc_elasticsearch_publisher.py:79-114`
builds the index; search is an external service). At 100 TB the compute
analog is a distributed scoring pass: corpus statistics (N, avgdl, df)
are a bounded-size aggregate, broadcast once, and the per-doc score is a
pure map over the corpus — no index server in the data path.

Also here: the corpus-quality repetition metrics (the C4/Gopher-style
"mostly the same word" filters) and the per-source mixture sampler
(deterministic token-budget downsampling to hit a target source mix) —
the two curation passes a training-data pipeline runs between dedup and
tokenization.

Scale notes (every op):
- stats sides are O(sources) or O(query terms) — bounded, broadcast.
- per-doc passes are shuffle-free map_batches over pruned reads.
- top-k finishes are local-head -> tiny-global-head merges, never a
  full sort.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import common as cm

ORACLES: dict[str, str] = {}

# ---------------------------------------------------------------------------
# BM25 term search

_BM25_TERMS = ("merge", "batch", "table")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 10


def docs_bm25(sf_dir: str):
    """Distributed BM25 top-k for a fixed term query.

    Two passes over a pruned (doc_id, text) read:
      1. stats: one partial row per batch — doc count, total word count,
         per-term document frequency. The partial is O(len(terms)) wide;
         the driver finish folds a handful of rows (bounded by batch
         count x 1), never corpus data.
      2. score: broadcast stats; per batch explode words, keep only the
         query terms (tf per doc is complete within a batch because a
         doc never splits across rows), vectorized BM25, per-block
         top-k head -> tiny global head.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5))  (Robertson-Sparck Jones,
    the non-negative variant Lucene uses). Scores round to 6 dp BEFORE
    the final ordering so near-ties rank identically to the oracle.
    """
    ds = cm.read(sf_dir, "documents", columns=["doc_id", "text"])
    terms = list(_BM25_TERMS)

    def stats_partial(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].str.split(" ")
        dl = words.str.len()
        exploded = words.explode()
        hit = exploded[exploded.isin(terms)]
        # df counts DOCS containing the term (not occurrences): dedupe
        # (doc, term) then count per term — all C-level
        per_term = (
            pd.DataFrame({"d": hit.index, "w": hit.to_numpy()})
            .drop_duplicates()
            .groupby("w")
            .size()
        )
        out = {"n_docs": [len(df)], "sum_dl": [int(dl.sum())]}
        for t in terms:
            out[f"df_{t}"] = [int(per_term.get(t, 0))]
        return pd.DataFrame(out)

    stats = ds.map_batches(stats_partial, batch_format="pandas").to_pandas().sum()
    n, avgdl = int(stats["n_docs"]), stats["sum_dl"] / max(1, int(stats["n_docs"]))
    idf = {
        t: float(np.log(1.0 + (n - stats[f"df_{t}"] + 0.5) / (stats[f"df_{t}"] + 0.5)))
        for t in terms
    }
    stats_ref = cm.broadcast((idf, avgdl))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        import ray

        idf, avgdl = ray.get(stats_ref)
        words = df["text"].str.split(" ")
        dl = words.str.len().to_numpy(dtype=np.float64)
        norm = _BM25_K1 * (1.0 - _BM25_B + _BM25_B * dl / avgdl)
        total = np.zeros(len(df), dtype=np.float64)
        exploded = words.explode()
        hit = exploded[exploded.isin(list(idf))]
        tf_tab = (
            pd.crosstab(hit.index, hit)
            .reindex(index=df.index, columns=list(idf), fill_value=0)
            .to_numpy(dtype=np.float64)
        )
        for j, t in enumerate(idf):
            tf = tf_tab[:, j]
            total += idf[t] * tf * (_BM25_K1 + 1.0) / (tf + norm)
        out = pd.DataFrame({"doc_id": df["doc_id"], "score": np.round(total, 6)})
        out = out[out["score"] > 0]
        return out.sort_values(["score", "doc_id"], ascending=[False, True]).head(
            _BM25_TOPK
        )

    local = ds.map_batches(score, batch_format="pandas")
    return (
        local.to_pandas()
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .head(_BM25_TOPK)
        .reset_index(drop=True)
    )


ORACLES["docs_bm25"] = f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM words GROUP BY doc_id),
corpus AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, w, COUNT(*) AS tf FROM words
  WHERE w IN ('merge', 'batch', 'table') GROUP BY doc_id, w
),
df AS (
  SELECT w, COUNT(DISTINCT doc_id) AS df FROM words
  WHERE w IN ('merge', 'batch', 'table') GROUP BY w
)
SELECT tf.doc_id,
       ROUND(SUM(
         ln(1 + (corpus.n - df.df + 0.5) / (df.df + 0.5))
         * tf.tf * ({_BM25_K1} + 1)
         / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / corpus.avgdl))
       ), 6) AS score
FROM tf
JOIN df USING (w) JOIN dl USING (doc_id) CROSS JOIN corpus
GROUP BY tf.doc_id
ORDER BY score DESC, tf.doc_id LIMIT {_BM25_TOPK}
"""


# ---------------------------------------------------------------------------
# Repetition / quality metrics (C4 & Gopher-style filters)

_REP_TOP_WORD_MAX = 0.2  # keep docs whose most-frequent word is <=20% of tokens


def docs_repetition(sf_dir: str):
    """Per-doc repetition metrics: token count, distinct-token fraction,
    most-frequent-word fraction, most-frequent-bigram fraction, and the
    Gopher-style keep flag (top word <= 20% of tokens). Everything is
    within-record, so the whole op is one shuffle-free map_batches —
    embarrassingly parallel at any corpus size."""
    ds = cm.read(sf_dir, "documents", columns=["doc_id", "text"])

    def metrics(df: pd.DataFrame) -> pd.DataFrame:
        words = df["text"].str.split(" ")
        n = words.str.len().to_numpy(dtype=np.int64)
        exploded = words.explode()
        per_doc = exploded.groupby([exploded.index, exploded]).size()
        by_doc = per_doc.groupby(level=0)
        nd = by_doc.size().reindex(df.index, fill_value=0).to_numpy()
        mx = by_doc.max().reindex(df.index, fill_value=0).to_numpy()
        # bigram counts: one flat array + shift, doc-boundary aware
        flat = exploded.to_numpy()
        doc_of = exploded.index.to_numpy()
        same = doc_of[:-1] == doc_of[1:]
        bg = pd.DataFrame(
            {"d": doc_of[:-1][same], "w1": flat[:-1][same], "w2": flat[1:][same]}
        )
        mx_bg = (
            bg.groupby(["d", "w1", "w2"], sort=False)
            .size()
            .groupby(level=0)
            .max()
            .reindex(df.index, fill_value=0)
            .to_numpy()
        )
        top_word_frac = np.round(mx / np.maximum(n, 1), 6)
        return pd.DataFrame(
            {
                "doc_id": df["doc_id"],
                "n_words": n,
                "distinct_frac": np.round(nd / np.maximum(n, 1), 6),
                "top_word_frac": top_word_frac,
                "top_bigram_frac": np.round(mx_bg / np.maximum(n - 1, 1), 6),
                "keep": top_word_frac <= _REP_TOP_WORD_MAX,
            }
        )

    return ds.map_batches(metrics, batch_format="pandas")


ORACLES["docs_repetition"] = f"""
WITH words AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
         unnest(range(len(string_split(text, ' ')))) AS pos
  FROM documents
),
wc AS (
  SELECT doc_id, SUM(c) AS n, COUNT(*) AS nd, MAX(c) AS mxw
  FROM (SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY doc_id, w) t
  GROUP BY doc_id
),
bg AS (
  SELECT a.doc_id, MAX(c) AS mxb FROM (
    SELECT a.doc_id, a.w AS w1, b.w AS w2, COUNT(*) AS c
    FROM words a JOIN words b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    GROUP BY a.doc_id, a.w, b.w
  ) a GROUP BY a.doc_id
)
SELECT wc.doc_id,
       wc.n AS n_words,
       ROUND(wc.nd / wc.n, 6) AS distinct_frac,
       ROUND(wc.mxw / wc.n, 6) AS top_word_frac,
       ROUND(COALESCE(bg.mxb, 0) / GREATEST(wc.n - 1, 1), 6) AS top_bigram_frac,
       ROUND(wc.mxw / wc.n, 6) <= {_REP_TOP_WORD_MAX} AS keep
FROM wc LEFT JOIN bg USING (doc_id)
"""


# ---------------------------------------------------------------------------
# Per-source mixture sampler

# target mixture proportions over the 'source' enum; sources absent from
# the map are dropped (weight 0)
_MIX_TARGET = {"src0": 0.5, "src1": 0.3, "src2": 0.2}
_HEX_SPACE = 16**8  # acceptance threshold resolution (first 8 sha256 hex chars)


def _mix_rates(totals: dict[str, int]) -> dict[str, str]:
    """Per-source acceptance-rate hex thresholds.

    Finds the largest total token budget T such that every source s can
    supply target[s]*T tokens from its totals[s] available (rate<=1),
    i.e. T = min_s totals[s]/target[s]; then rate_s = target[s]*T /
    totals[s]. The binding source keeps everything; the rest downsample
    deterministically. Returned as 8-hex-char thresholds so the filter
    and the SQL oracle compare exact strings, no float drift ("g" sorts
    above every hex char, i.e. rate 1.0 keeps all). The arithmetic here
    is mirrored OPERATION-FOR-OPERATION by the oracle SQL (same IEEE
    float64 order) so both sides derive identical thresholds."""
    present = {s: w for s, w in _MIX_TARGET.items() if totals.get(s)}
    t_budget = min(totals[s] / w for s, w in present.items())
    out = {}
    for s, w in present.items():
        rate = min(1.0, w * t_budget / totals[s])
        cut = int(rate * _HEX_SPACE)
        out[s] = "g" if cut >= _HEX_SPACE else format(cut, "08x")
    return out


def docs_mixture_sample(sf_dir: str):
    """Deterministic per-source mixture sampling: downsample each source
    so surviving token mass approaches the _MIX_TARGET proportions.

    Pass 1 — per-source token totals: per-batch combiner, driver finish
    (the source enum is bounded — same contract as partial_groupby_sum).
    Pass 2 — map-side filter: keep a doc iff the first 8 hex chars of
    sha256(doc_id) sort below its source's rate threshold. Same
    hash-Bernoulli primitive as docs_hash_sample, so membership is
    stable across clusters, scales, and reruns."""
    from ..core.hashing import sha256_hex

    ds = cm.read(sf_dir, "documents", columns=["doc_id", "source", "text"])

    def tok_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.assign(n=df["text"].str.count(" ") + 1).groupby(
            "source", as_index=False
        )["n"].sum()
        return g

    totals_df = ds.map_batches(tok_partial, batch_format="pandas").to_pandas()
    totals = totals_df.groupby("source")["n"].sum().to_dict()
    thresholds = _mix_rates(totals)
    thr_ref = cm.broadcast(thresholds)

    def pick(df: pd.DataFrame) -> pd.DataFrame:
        import ray

        thr = ray.get(thr_ref)
        h = pd.Series(
            sha256_hex(df["doc_id"].astype(str).tolist()), index=df.index
        ).str[:8]
        cut = df["source"].map(thr)
        keep = cut.notna() & (h < cut)
        out = df.loc[keep, ["doc_id", "source"]].copy()
        out["n_words"] = df.loc[keep, "text"].str.count(" ") + 1
        return out

    return ds.map_batches(pick, batch_format="pandas")


# The oracle derives the SAME data-dependent thresholds in SQL, mirroring
# _mix_rates operation-for-operation in float64: tot is int->double exactly,
# w literals are CAST to DOUBLE (a bare 0.3 would be DECIMAL), t_budget is
# MIN(tot/w), rate is (w*tb)/tot left-associated like the Python
# expression, and the truncation is floor() because DuckDB's double->BIGINT
# cast rounds while Python int() truncates.
_MIX_VALUES = ", ".join(
    f"('{s}', CAST({w} AS DOUBLE))" for s, w in _MIX_TARGET.items()
)
ORACLES["docs_mixture_sample"] = f"""
WITH totals AS (
  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) AS tot
  FROM documents GROUP BY source
),
tgt AS (SELECT * FROM (VALUES {_MIX_VALUES}) t(source, w)),
joined AS (SELECT t.source, t.tot, g.w FROM totals t JOIN tgt g USING (source)),
budget AS (SELECT MIN(tot / w) AS tb FROM joined),
thr AS (
  SELECT source,
         CASE WHEN CAST(floor(LEAST(1.0, (w * budget.tb) / tot) * {_HEX_SPACE}) AS BIGINT) >= {_HEX_SPACE}
              THEN 'g'
              ELSE printf('%08x', CAST(floor(LEAST(1.0, (w * budget.tb) / tot) * {_HEX_SPACE}) AS BIGINT))
         END AS cut
  FROM joined CROSS JOIN budget
)
SELECT d.doc_id, d.source, CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_words
FROM documents d JOIN thr ON d.source = thr.source
WHERE substr(sha256(CAST(d.doc_id AS VARCHAR)), 1, 8) < thr.cut
"""


# ---------------------------------------------------------------------------
# Maintained-index BM25 (engine-path face of docs_bm25)


def bm25_index_search(sf_dir: str, k: int = _BM25_TOPK):
    """The SAME fixed term query as ``docs_bm25``, served from the
    incrementally-maintained BM25 index (``engine/search_index.py``)
    instead of a corpus scan: stream the documents table into a CDC
    snapshot (doc_id cast to string — the sink's key convention),
    bootstrap it as epoch 0, refresh the three index views (postings /
    doc-length / corpus-stats), then answer via ``bm25_search`` — which
    reads only the query terms' postings row-groups and the candidates'
    length rows, never the corpus. The oracle recomputes BM25 in SQL
    with the index's OWN tokenizer (lowercase ``[a-z0-9]+`` runs), so a
    green row proves the full maintained path: explode → Z-set fold →
    manifest commit → pruned lookup → scoring."""
    import tempfile

    import pyarrow as pa
    import pyarrow.compute as pc

    from ..engine.cdc import bootstrap_table
    from ..engine.search_index import bm25_refresh, bm25_search

    base = tempfile.mkdtemp(prefix="gcdr_bm25idx_", dir="/tmp")
    snap, tb, idx = f"{base}/snap", f"{base}/tb", f"{base}/idx"

    def to_snapshot(t: pa.Table) -> pa.Table:
        return pa.table(
            {"doc_id": pc.cast(t["doc_id"], pa.string()), "text": t["text"]}
        )

    cm.read(sf_dir, "documents", columns=["doc_id", "text"]).map_batches(
        to_snapshot, batch_format="pyarrow"
    ).write_parquet(snap)
    bootstrap_table(snap, tb, num_partitions=8)
    bm25_refresh(idx, tb, num_partitions=8)
    return bm25_search(idx, tb, " ".join(_BM25_TERMS), k=k)


ORACLES["bm25_index_search"] = f"""
WITH docs AS (
  SELECT CAST(doc_id AS VARCHAR) AS doc_id, lower(COALESCE(text, '')) AS t
  FROM documents
),
words AS (
  SELECT doc_id, w FROM (
    SELECT doc_id, unnest(string_split_regex(t, '[^a-z0-9]+')) AS w FROM docs
  ) WHERE w <> ''
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM words GROUP BY doc_id),
corpus AS (
  SELECT (SELECT COUNT(*) FROM docs) AS n,
         CAST((SELECT COALESCE(SUM(dl), 0) FROM dl) AS DOUBLE)
           / (SELECT COUNT(*) FROM docs) AS avgdl
),
tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM words
       WHERE w IN ('merge', 'batch', 'table') GROUP BY doc_id, w),
df AS (SELECT w, COUNT(DISTINCT doc_id) AS df FROM words
       WHERE w IN ('merge', 'batch', 'table') GROUP BY w),
scored AS (
  SELECT tf.doc_id,
         ROUND(SUM(
           ln(1 + (corpus.n - df.df + 0.5) / (df.df + 0.5))
           * tf.tf * ({_BM25_K1} + 1)
           / (tf.tf + {_BM25_K1} * (1 - {_BM25_B} + {_BM25_B} * dl.dl / corpus.avgdl))
         ), 6) AS score
  FROM tf JOIN df ON tf.w = df.w JOIN dl ON tf.doc_id = dl.doc_id
  CROSS JOIN corpus
  GROUP BY tf.doc_id
)
SELECT doc_id, score,
       CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS "rank"
FROM scored WHERE score > 0
ORDER BY score DESC, doc_id LIMIT {_BM25_TOPK}
"""

"""Text-analysis / dedup / similarity / multimodal queries over testdata.

SQL-expressible ops carry a DuckDB oracle with identical column names;
heuristic/approximate ops (langid, fingerprint, LSH, simhash, IVF) are
rows-only checked by the driver and verified against pure-python oracles in
``tests/test_dedup.py`` / ``tests/test_text.py``.
"""

from __future__ import annotations

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
    from ray.data.aggregate import Min

    return hashed.groupby("content_hash").aggregate(Min("doc_id", alias_name="doc_id"))


ORACLES["dedup_exact"] = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 5 = 0
)
SELECT sha256(text) AS content_hash, MIN(doc_id) AS doc_id
FROM corpus GROUP BY sha256(text)
"""


def dedup_minhash_lsh(sf_dir: str, tau: float = 0.5):
    """MinHash+LSH near-dup pairs: shingle → minhash sigs (actor pool) →
    band explode → bucket groupby → candidate pairs → signature-estimated
    Jaccard ≥ tau. Rows-only driver check; recall/precision vs exact
    Jaccard verified in tests."""
    ds = _with_near_copies(sf_dir)
    sigs = ds.map_batches(
        dd.MinHasher, batch_format="pandas", concurrency=(1, cm.pool_size())
    ).materialize()  # two consumers below — hash once, not twice
    sig_tbl = sigs.to_pandas()  # (N, 65): small here; at scale keep as Dataset
    sig_map = {int(r.doc_id): np.asarray(r.sig, dtype=np.uint64) for r in sig_tbl.itertuples()}
    sig_ref = cm.broadcast(sig_map)

    bands = sigs.map_batches(dd.lsh_bands, batch_format="pandas")
    pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
        dd.bucket_pairs, batch_format="pandas"
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        if df.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "est_jaccard": []}).astype(
                {"id_a": "int64", "id_b": "int64", "est_jaccard": "float64"}
            )
        df = df.drop_duplicates(["id_a", "id_b"])
        smap = _ray.get(sig_ref)
        est = [
            dd.estimated_jaccard(smap[int(a)], smap[int(b)])
            for a, b in zip(df["id_a"], df["id_b"])
        ]
        df = df.assign(est_jaccard=est)
        return df[df["est_jaccard"] >= tau]

    verified = pairs.map_batches(verify, batch_format="pandas")
    out = verified.to_pandas().drop_duplicates(["id_a", "id_b"])
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def dedup_tokens_minhash(sf_dir: str, tau: float = 0.5):
    """Near-dup pairs over the TOKENS payload table itself (the
    BASELINE.json training-sequence shape): token-5-gram MinHash + LSH.
    Corpus: deterministic tokens table from the changelog generator, seeded
    with truncated near-copies. Rows-only; recall vs exact token-shingle
    Jaccard verified in tests."""
    corpus = _token_corpus(sf_dir)
    ds = ray.data.from_arrow(corpus)
    sigs = ds.map_batches(
        dd.TokenMinHasher, batch_format="pyarrow", concurrency=(1, cm.pool_size())
    ).materialize()  # two consumers below — hash once, not twice
    sig_tbl = sigs.to_pandas()
    sig_map = {r.doc_id: np.asarray(r.sig, dtype=np.uint64) for r in sig_tbl.itertuples()}
    sig_ref = cm.broadcast(sig_map)

    bands = sigs.map_batches(dd.lsh_bands, batch_format="pandas")
    pairs = bands.groupby(["band_id", "band_hash"]).map_groups(
        dd.bucket_pairs, batch_format="pandas"
    )

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        if df.empty:
            return pd.DataFrame(
                {"id_a": pd.Series([], dtype="object"),
                 "id_b": pd.Series([], dtype="object"),
                 "est_jaccard": pd.Series([], dtype="float64")}
            )
        df = df.drop_duplicates(["id_a", "id_b"])
        smap = _ray.get(sig_ref)
        est = [dd.estimated_jaccard(smap[a], smap[b]) for a, b in zip(df["id_a"], df["id_b"])]
        df = df.assign(est_jaccard=est)
        return df[df["est_jaccard"] >= tau]

    out = pairs.map_batches(verify, batch_format="pandas").to_pandas()
    out = out.drop_duplicates(["id_a", "id_b"])
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


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


def dedup_simhash(sf_dir: str, max_hamming: int = 8):
    """SimHash near-dup pairs via 16-bit chunk bucketing (rows-only)."""
    ds = _with_near_copies(sf_dir)
    hashed = ds.map_batches(dd.SimHasher, batch_format="pandas", concurrency=(1, cm.pool_size()))
    chunks = hashed.map_batches(dd.simhash_chunks, batch_format="pandas")

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        import itertools

        rows = g.drop_duplicates("doc_id")[["doc_id", "simhash"]].values.tolist()
        out_a, out_b, ham = [], [], []
        for (ida, ha), (idb, hb) in itertools.combinations(sorted(rows), 2):
            d = dd.hamming64(int(ha), int(hb))
            if d <= max_hamming:
                out_a.append(ida)
                out_b.append(idb)
                ham.append(d)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "hamming": ham}).astype(
            {"id_a": "int64", "id_b": "int64", "hamming": "int64"}
        )

    pairs = chunks.groupby(["chunk_id", "chunk_val"]).map_groups(
        pairs_in_bucket, batch_format="pandas"
    )
    out = pairs.to_pandas().drop_duplicates(["id_a", "id_b"])
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def dedup_ngram_jaccard(sf_dir: str, tau: float = 0.6):
    """Exact word-3-gram Jaccard verification of LSH candidates (rows-only;
    the exact-verify tail of the MinHash pipeline)."""
    docs = _with_near_copies(sf_dir).to_pandas()
    texts = dict(zip(docs["doc_id"], docs["text"]))
    texts_ref = cm.broadcast(texts)
    cand = dedup_minhash_lsh(sf_dir, tau=0.3)
    if cand.empty:
        return pd.DataFrame({"id_a": [], "id_b": [], "jaccard": []})
    import ray as _ray

    tmap = _ray.get(texts_ref)
    jac = [
        round(dd.exact_jaccard(tmap[int(a)], tmap[int(b)]), 6)
        for a, b in zip(cand["id_a"], cand["id_b"])
    ]
    cand = cand.assign(jaccard=jac).drop(columns=["est_jaccard"])
    return cand[cand["jaccard"] >= tau].reset_index(drop=True)


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


def ann_ivf(sf_dir: str, nprobe: int = 3, n_clusters: int = 16):
    """IVF-bucketed ANN: deterministic centroids, vectors bucketed once,
    queries probe nprobe nearest buckets. Approximate (rows-only);
    recall vs brute force asserted in tests."""
    emb = cm.read_arrow(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    m = sim.normalize_rows(sim._to_matrix(emb["embedding"]))
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


def embedding_dedup_cosine(sf_dir: str, tau: float = 0.95):
    """Embedding near-dup pairs (cosine ≥ tau) with seeded exact copies;
    per-batch matmul vs broadcast matrix. SQL oracle: self cross join."""
    emb = cm.read_arrow(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    ids = emb["vec_id"].to_numpy(zero_copy_only=False)
    copy_mask = ids % 10 == 0
    copies = emb.filter(pa.array(copy_mask))
    copies = copies.set_column(
        0, "vec_id", pc.add(copies["vec_id"], pa.scalar(_COPY_OFFSET, pa.int64()))
    )
    corpus = pa.concat_tables([emb, copies])

    all_ids = corpus["vec_id"].to_numpy(zero_copy_only=False)
    all_m = sim.normalize_rows(sim._to_matrix(corpus["embedding"]))
    all_ref = cm.broadcast({"ids": all_ids, "matrix": all_m})

    ds = ray.data.from_arrow(corpus)
    pairs = ds.map_batches(
        sim.EmbeddingDupFinder,
        fn_constructor_args=(all_ref, tau),
        batch_format="pyarrow",
        concurrency=(1, cm.pool_size()),
    )
    df = pairs.to_pandas().drop_duplicates(["id_a", "id_b"])
    df["cosine"] = df["cosine"].round(5)
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

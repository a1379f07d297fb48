"""Behavioral checks for the search/curation operators beyond the SQL
oracle parity that tests/test_queries.py already enforces."""

from __future__ import annotations

import numpy as np
import pandas as pd

from gamechanger_data_ray.pipelines import search as S

SF = "/root/testdata/sf0.001"


def test_bm25_scores_rank_term_rich_docs(ray_session):
    out = S.docs_bm25(SF)
    assert list(out.columns) == ["doc_id", "score"]
    assert len(out) == S._BM25_TOPK
    # descending, deterministic tie-break
    assert (out["score"].diff().dropna() <= 0).all()
    # every returned doc really contains at least one query term
    import duckdb

    texts = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF}/documents.parquet') "
        f"WHERE doc_id IN ({','.join(map(str, out['doc_id'].tolist()))})"
    ).df()
    for t in texts["text"]:
        assert any(term in t.split(" ") for term in S._BM25_TERMS)


def test_repetition_metrics_bounds(ray_session):
    df = S.docs_repetition(SF).to_pandas()
    assert (df["distinct_frac"] > 0).all() and (df["distinct_frac"] <= 1).all()
    assert (df["top_word_frac"] > 0).all() and (df["top_word_frac"] <= 1).all()
    assert (df["top_bigram_frac"] >= 0).all() and (df["top_bigram_frac"] <= 1).all()
    # keep flag is exactly the threshold predicate
    pd.testing.assert_series_equal(
        df["keep"],
        df["top_word_frac"] <= S._REP_TOP_WORD_MAX,
        check_names=False,
    )


def test_mixture_rates_hit_target_proportions():
    # binding source keeps everything; the others downsample so the
    # EXPECTED surviving token mass matches the target ratios
    totals = {"src0": 1000, "src1": 1000, "src2": 1000}
    thr = S._mix_rates(totals)
    rates = {
        s: 1.0 if t == "g" else int(t, 16) / S._HEX_SPACE for s, t in thr.items()
    }
    assert rates["src0"] == 1.0  # largest target weight binds
    expected = {s: rates[s] * totals[s] for s in rates}
    tot = sum(expected.values())
    for s, w in S._MIX_TARGET.items():
        assert abs(expected[s] / tot - w / sum(S._MIX_TARGET.values())) < 1e-6


def test_mixture_sample_is_deterministic_and_source_limited(ray_session):
    a = S.docs_mixture_sample(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = S.docs_mixture_sample(SF).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert set(a["source"]) <= set(S._MIX_TARGET)


def test_mix_rates_skips_absent_sources():
    thr = S._mix_rates({"src0": 500, "src2": 100})
    assert "src1" not in thr
    assert set(thr) == {"src0", "src2"}

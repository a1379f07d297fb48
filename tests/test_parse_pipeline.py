"""Composed document-parse pipeline (the policy_analytics parse() chain
analog): field-level checks against independently-computed expectations
plus determinism across runs."""

from __future__ import annotations

import math

import pandas as pd
import pyarrow.parquet as pq

from gamechanger_data_ray.pipelines.parse_pipeline import parse_documents
from util_oracle import to_df


def test_parse_documents_fields(sf_dir):
    out = to_df(parse_documents(sf_dir)).set_index("doc_id").sort_index()
    docs = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas().set_index("doc_id")
    assert len(out) == len(docs)
    assert {"word_count", "page_count", "version_hash", "ref_list", "dates",
            "entities", "top_entities_t", "keyw_5", "topics_rs", "sections",
            "ocr_ok"} <= set(out.columns)

    # spot-check 10 docs against serial recomputation
    sample = docs.head(10)
    n_docs = len(docs)
    words_all = docs["text"].str.split(" ")
    df_counts = (
        pd.DataFrame({"doc_id": docs.index.repeat(words_all.str.len()),
                      "word": [w for ws in words_all for w in ws]})
        .drop_duplicates()
        .groupby("word")
        .size()
    )
    for did, row in sample.iterrows():
        words = row["text"].split(" ")
        assert out.loc[did, "word_count"] == len(words)
        assert out.loc[did, "page_count"] == -(-len(words) // 40)
        # keywords: top-5 by count desc, word asc
        vc: dict[str, int] = {}
        for w in words:
            vc[w] = vc.get(w, 0) + 1
        expected_kw = [w for _, w in sorted(((-n, w) for w, n in vc.items()))[:5]]
        assert list(out.loc[did, "keyw_5"]) == expected_kw
        # topics: top-5 by round(tf*idf, 6) desc, word asc
        scored = sorted(
            ((-round(n * math.log(n_docs / df_counts[w]), 6), w) for w, n in vc.items())
        )[:5]
        assert list(out.loc[did, "topics_rs"]) == [w for _, w in scored]
        assert bool(out.loc[did, "ocr_ok"])  # clean synthetic text

    # everything is deterministic across runs
    out2 = to_df(parse_documents(sf_dir)).set_index("doc_id").sort_index()
    for c in ("version_hash", "word_count"):
        assert (out[c] == out2[c]).all()
    for c in ("keyw_5", "topics_rs", "ref_list", "entities", "sections"):
        assert all(list(a) == list(b) for a, b in zip(out[c], out2[c]))


def test_parser_responsibilities_field():
    """The doc_dict gains a responsibilities list: role intro lines from
    the RESPONSIBILITIES section, empty when the section has none."""
    import ray

    from gamechanger_data_ray.pipelines import common as cm
    from gamechanger_data_ray.pipelines.parse_pipeline import DocumentParser

    idf_ref = cm.broadcast(pd.DataFrame({"term": ["x"], "idf": [1.0]}))
    parser = DocumentParser(idf_ref)
    df = pd.DataFrame(
        {
            # doc_id 2 → "numbered" layout; SECTION heading carries the
            # RESPONSIBILITIES name so the section classifier routes it
            "doc_id": [2, 4],
            "source": ["s", "s"],
            "text": [
                "SECTION 2: RESPONSIBILITIES 2.1. THE DIRECTOR (TD) shall: a. keep records.",
                "SECTION 1: PURPOSE plain doc with no roles",
            ],
        }
    )
    out = parser(df).set_index("doc_id")
    assert out.loc[2, "responsibilities"] == [
        "2.1. THE DIRECTOR (TD) shall: a. keep records."
    ] or out.loc[2, "responsibilities"][0].startswith("2.1. THE DIRECTOR")
    assert out.loc[4, "responsibilities"] == []

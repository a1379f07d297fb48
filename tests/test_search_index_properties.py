"""Property-based tests (hypothesis) for the BM25 index's cross-view
invariants — all three views bake the SAME tokenizer, so for ANY text:

1. a doc's length-view ``dl`` equals the SUM of its inverted-view term
   frequencies (postings and lengths can never drift apart);
2. the stats view's ``sum_dl`` partial equals the sum of per-doc dl
   (corpus stats can never drift from lengths);
3. the query tokenizer produces exactly the terms the index stores, so
   a self-query always hits its own postings.

These run the view TRANSFORMS directly (plain functions over Arrow
batches — no Ray), which is what lets hypothesis drive hundreds of
adversarial unicode corpora cheaply; the engine-path integration is
covered in test_search_index.py.
"""

from __future__ import annotations

import re

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from gamechanger_data_ray.core.diff import SIGN_COLUMN
from gamechanger_data_ray.engine.search_index import (
    TOKEN_SPLIT,
    _token_counts,
    corpus_stats_view,
    doc_length_view,
    tokenize_query,
)
from gamechanger_data_ray.engine.views import inverted_index_view

TEXT = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=120,
)


def _batch(texts: list[str | None]) -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([f"d{i}" for i in range(len(texts))]),
            "text": pa.array(texts, pa.string()),
            SIGN_COLUMN: pa.array([1] * len(texts), pa.int8()),
        }
    )


def _py_tokens(text: str | None) -> list[str]:
    return [t for t in re.split(TOKEN_SPLIT, (text or "").lower()) if t]


@given(st.lists(st.one_of(TEXT, st.none()), min_size=1, max_size=8))
@settings(max_examples=150, deadline=None)
def test_dl_equals_sum_of_postings_tf(texts):
    batch = _batch(texts)
    inv = inverted_index_view().transform(batch)
    tf_by_doc: dict[str, int] = {}
    for d in inv["doc_id"].to_pylist():
        tf_by_doc[d] = tf_by_doc.get(d, 0) + 1  # one posting row per token
    lens = doc_length_view().transform(batch)
    got = dict(zip(lens["doc_id"].to_pylist(), lens["dl"].to_pylist()))
    want_py = {f"d{i}": len(_py_tokens(t)) for i, t in enumerate(texts)}
    assert got == want_py
    assert {d: n for d, n in got.items() if n} == tf_by_doc


@given(st.lists(st.one_of(TEXT, st.none()), min_size=1, max_size=8))
@settings(max_examples=100, deadline=None)
def test_stats_partial_equals_sum_of_lengths(texts):
    batch = _batch(texts)
    stats = corpus_stats_view().transform(batch)
    assert stats["scope"].to_pylist() == ["corpus"] * len(texts)
    assert sum(stats["dl"].to_pylist()) == sum(
        len(_py_tokens(t)) for t in texts
    )
    assert _token_counts(batch["text"]).sum() == sum(
        len(_py_tokens(t)) for t in texts
    )


@given(TEXT)
@settings(max_examples=150, deadline=None)
def test_query_tokenizer_matches_index_tokenizer(text):
    q = tokenize_query(text)
    stored = _py_tokens(text)
    # query terms are the deduplicated stored terms, order-preserving
    assert q == list(dict.fromkeys(stored))
    # sign replication: every derived posting carries its doc's sign
    inv = inverted_index_view().transform(_batch([text]))
    assert set(inv[SIGN_COLUMN].to_pylist()) <= {1}
    assert sorted(inv["term"].to_pylist()) == sorted(stored)

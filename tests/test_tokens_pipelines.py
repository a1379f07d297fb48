"""Token pipeline tests: concat-and-chunk packing vs the serial numpy
oracle (byte-identical chunk contents), pack-assignment conservation, and
mention-edge determinism. The SQL-expressible queries (vocab_topk,
docs_pack_assignment, docs_entity_edges, text_normalize,
events_parse_props) are additionally oracle-checked by test_queries.py."""

from __future__ import annotations

import numpy as np
import pandas as pd

from gamechanger_data_ray.pipelines import tokens as T
from util_oracle import to_df


def _serial_chunks(corpus, cap):
    df = corpus.to_pandas().sort_values("doc_id")
    stream = np.concatenate([np.asarray(t, dtype=np.int32) for t in df["tokens"]])
    return [stream[i : i + cap] for i in range(0, len(stream), cap)]


def test_pack_token_chunks_matches_serial_oracle(sf_dir):
    corpus = T.token_table(sf_dir)
    expected = _serial_chunks(corpus, T.PACK_CAP)

    got = to_df(T.pack_token_chunks(sf_dir)).sort_values("chunk_id").reset_index(drop=True)
    assert len(got) == len(expected)
    assert got["chunk_id"].tolist() == list(range(len(expected)))
    for i, exp in enumerate(expected):
        np.testing.assert_array_equal(
            np.asarray(got["tokens"].iloc[i], dtype=np.int32), exp
        )
    # every chunk is full except possibly the last
    assert (got["n_tok"].iloc[:-1] == T.PACK_CAP).all()
    total = sum(len(c) for c in expected)
    assert int(got["n_tok"].sum()) == total


def test_pack_assignment_is_sequential_and_conserving(sf_dir):
    got = to_df(T.docs_pack_assignment(sf_dir)).sort_values("doc_id").reset_index(drop=True)
    # pack ids are non-decreasing in doc_id order and start at 0
    assert got["pack_id"].iloc[0] == 0
    assert (got["pack_id"].diff().dropna() >= 0).all()
    # recompute from scratch: floor(prefix_sum / cap)
    before = got["n_tok"].cumsum().shift(fill_value=0)
    expected = (before // T.PACK_CAP).astype("int64")
    pd.testing.assert_series_equal(got["pack_id"], expected, check_names=False)


def test_tokenize_documents_matches_serial_tokenizer(sf_dir):
    import pyarrow.parquet as pq
    import os

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "source"]
    ).to_pandas()
    words = docs["text"].str.split(" ").explode()
    freq = words.value_counts().rename_axis("word").reset_index(name="n")
    freq = freq.sort_values(["n", "word"], ascending=[False, True]).reset_index(drop=True)
    vocab = dict(zip(freq["word"], range(len(freq))))

    got = to_df(T.tokenize_documents(sf_dir)).set_index("doc_id").sort_index()
    assert set(got.columns) == {"tokens", "n_tok", "source"}
    for _, row in docs.iterrows():
        expected = [vocab[w] for w in row["text"].split(" ")]
        assert list(got.loc[row["doc_id"], "tokens"]) == expected
        assert got.loc[row["doc_id"], "n_tok"] == len(expected)
        assert got.loc[row["doc_id"], "source"] == row["source"]


def test_mention_edges_deterministic(sf_dir):
    a = to_df(T.docs_entity_edges(sf_dir)).sort_values(["doc_id", "entity"]).reset_index(drop=True)
    b = to_df(T.docs_entity_edges(sf_dir)).sort_values(["doc_id", "entity"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    assert set(a["entity"]) <= set(T.GAZETTEER)
    assert (a["n_mentions"] >= 1).all()


def test_training_data_pipeline_matches_serial(sf_dir):
    """documents → tokenize → concat-and-chunk must equal the serial
    tokenize + concat + split oracle byte-for-byte."""
    import os

    import pyarrow.parquet as pq

    docs = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pandas().sort_values("doc_id")
    words = docs["text"].str.split(" ").explode()
    freq = words.value_counts().rename_axis("word").reset_index(name="n")
    freq = freq.sort_values(["n", "word"], ascending=[False, True]).reset_index(drop=True)
    vocab = dict(zip(freq["word"], range(len(freq))))
    stream = np.concatenate(
        [[vocab[w] for w in t.split(" ")] for t in docs["text"]]
    ).astype(np.int32)
    expected = [stream[i : i + T.PACK_CAP] for i in range(0, len(stream), T.PACK_CAP)]

    got = to_df(T.training_data_pipeline(sf_dir)).sort_values("chunk_id").reset_index(drop=True)
    assert len(got) == len(expected)
    for i, exp in enumerate(expected):
        np.testing.assert_array_equal(np.asarray(got["tokens"].iloc[i], dtype=np.int32), exp)

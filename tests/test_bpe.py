"""BPE trainer/encoder: property oracles.

The merge loop is verified against an independent from-scratch serial
recount implementation (different algorithm, same spec: recount every
pair from scratch each iteration); the distributed pipeline faces are
verified against a serial pipeline over the same corpus. BPE is
iterative and not SQL-expressible, so these stand in for a DuckDB
oracle (same policy as HLL/MinHash: pytest property oracle)."""

from __future__ import annotations

import os
import random

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from gamechanger_data_ray.pipelines import tokens as T
from gamechanger_data_ray.stages import bpe


# --- independent serial reference (recount-from-scratch each merge) ------

def serial_learn(word_freq, num_merges, min_pair_freq=1):
    words = {w: list(w) + [bpe.EOW] for w, n in word_freq.items()
             if w and n > 0}
    freqs = {w: int(n) for w, n in word_freq.items() if w and n > 0}
    merges = []
    for _ in range(num_merges):
        counts = {}
        for w, syms in words.items():
            f = freqs[w]
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        pair, cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_freq:
            break
        merges.append(pair)
        new = pair[0] + pair[1]
        for w in words:
            words[w] = bpe._merge_word(words[w], pair, new)
    return merges


def serial_encode(word, merges):
    syms = list(word) + [bpe.EOW]
    for pair in merges:  # replay the merge list in training order
        syms = bpe._merge_word(syms, pair, pair[0] + pair[1])
    return syms


def random_word_freq(seed, n_words=40, alpha="abc"):
    rng = random.Random(seed)
    return {
        "".join(rng.choice(alpha) for _ in range(rng.randint(1, 8))):
            rng.randint(1, 9)
        for _ in range(n_words)
    }


# --- merge-loop equality ---------------------------------------------------

def test_learn_matches_serial_recount_randomized():
    for seed in range(8):
        wf = random_word_freq(seed)
        assert bpe.learn_merges(wf, 30) == serial_learn(wf, 30), f"seed {seed}"


def test_learn_adversarial_shapes():
    # overlapping runs, ties, single-char words, a word that IS a later
    # merge product, zero/empty entries dropped
    wf = {"aaaa": 3, "aaab": 3, "ab": 5, "ba": 5, "a": 7, "": 4, "zz": 0}
    assert bpe.learn_merges(wf, 20) == serial_learn(wf, 20)


def test_learn_min_pair_freq_stops_early():
    wf = {"ab": 1, "cd": 1}
    assert bpe.learn_merges(wf, 10, min_pair_freq=2) == []
    assert len(bpe.learn_merges(wf, 10, min_pair_freq=1)) > 0


def test_learn_deterministic_tie_break():
    # (a,b) and (c,d) both have count 5 — lexicographically smaller wins
    wf = {"ab": 5, "cd": 5}
    first = bpe.learn_merges(wf, 1)[0]
    assert first == ("a", "b")


# --- encode/decode properties ---------------------------------------------

def test_encode_equals_training_order_replay_and_roundtrips():
    wf = random_word_freq(99, n_words=60, alpha="abcd")
    merges = bpe.learn_merges(wf, 40)
    ranks = {m: i for i, m in enumerate(merges)}
    for w in list(wf) + ["dcba", "aXa", "unseen"]:
        if not w:
            continue
        enc = bpe.encode_word(w, ranks)
        assert enc == serial_encode(w, merges), w
        assert bpe.decode_symbols(enc) == w, w


def test_training_words_fully_merge_when_merges_suffice():
    # enough merges collapse every training word to a single symbol
    wf = {"aa": 2, "ab": 2}
    merges = bpe.learn_merges(wf, 100)
    ranks = {m: i for i, m in enumerate(merges)}
    for w in wf:
        assert len(bpe.encode_word(w, ranks)) == 1


def test_vocab_ids_deterministic_and_first_writer_wins():
    wf = {"abc": 1}
    merges = [("a", "b"), ("ab", "c"), ("b", "c"), ("a", "bc")]
    v = bpe.vocab_from_merges(wf, merges)
    base = sorted({bpe.EOW, "a", "b", "c"})
    assert [v[s] for s in base] == [0, 1, 2, 3]
    assert v["ab"] == 4 and v["abc"] == 5 and v["bc"] == 6
    assert len(v) == 7  # ("a","bc") collides with ("ab","c") on "abc"


# --- distributed faces vs serial pipeline ----------------------------------

def test_word_frequencies_match_pandas(sf_dir):
    got = T.bpe_word_frequencies(sf_dir)
    text = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["text"])["text"].to_pandas()
    want = (text.str.findall(bpe.PRETOKEN_RE).explode().dropna()
            .value_counts())
    assert dict(zip(got["word"], got["n"])) == want.to_dict()
    # sorted (freq desc, word asc) and min_freq filters distributed
    assert (got["n"].diff().dropna() <= 0).all()
    floor = int(want.median()) + 1
    capped = T.bpe_word_frequencies(sf_dir, min_freq=floor, max_words=25)
    assert len(capped) <= 25 and (capped["n"] >= floor).all()


def test_docs_bpe_tokens_matches_serial_pipeline(sf_dir):
    n_merges = 48
    got = (T.docs_bpe_tokens(sf_dir, num_merges=n_merges).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    docs = pq.read_table(os.path.join(sf_dir, "documents.parquet"),
                         columns=["doc_id", "text"]).to_pandas()
    wf = (docs["text"].str.findall(bpe.PRETOKEN_RE).explode().dropna()
          .value_counts().to_dict())
    merges = serial_learn(wf, n_merges)
    ranks = {m: i for i, m in enumerate(merges)}
    vocab = bpe.vocab_from_merges(wf.keys(), merges)

    def doc_ids(text):
        out = []
        for w in bpe.PRETOKEN_RE.findall(text):
            out.extend(vocab.get(s, -1) for s in bpe.encode_word(w, ranks))
        return out

    want_ids = docs["text"].map(doc_ids)
    want = pd.DataFrame({
        "doc_id": docs["doc_id"],
        "n_bpe": want_ids.str.len().astype("int64"),
        "checksum": [
            int(np.sum(np.asarray(t, dtype=np.int64)
                       * np.arange(1, len(t) + 1, dtype=np.int64)))
            for t in want_ids
        ],
    }).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "n_bpe", "checksum"]], want, check_dtype=False
    )
    assert (got["n_bpe"] > 0).any()


def test_bpe_train_documents_face(sf_dir):
    out = T.bpe_train_documents(sf_dir, num_merges=16)
    assert list(out.columns) == ["rank", "left", "right", "token"]
    assert len(out) == 16
    assert (out["token"] == out["left"] + out["right"]).all()
    # deterministic across runs
    again = T.bpe_train_documents(sf_dir, num_merges=16)
    pd.testing.assert_frame_equal(out, again)

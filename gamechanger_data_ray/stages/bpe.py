"""Byte-pair-encoding tokenizer training + encoding kernels.

The "train the tokenizer" step of an LLM data pipeline (public
algorithm: Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units"; the pre-tokenize-then-merge split mirrors
GPT-2's byte-level BPE and production trainers). Division of labor —
the part that decides the 100 TB story — follows the standard trainer
shape:

- the CORPUS pass is distributed (pre-tokenize + word-frequency
  aggregation, see ``pipelines/tokens.py::bpe_word_frequencies``): one
  combiner pass and one routed groupby, shuffle moves one row per
  (batch, word);
- the merge LOOP (this module) runs over the aggregated *word table*,
  whose size is the unique-word vocabulary — heavy-tailed and further
  bounded by ``min_freq``/``max_words`` caps — never the corpus. This
  is exactly how production BPE trainers scale: corpus statistics are
  parallel, merges are a serial reduction over a bounded dict.

Kernels here are pure Python/regex over bounded inputs (no Ray except
the broadcast read in :class:`BpeEncoder`); encoding memoizes per
unique word, so the per-row cost in the distributed encode stage decays
to a dict lookup on the heavy head of the word distribution.

Reference parity note: the reference repo has no tokenizer trainer —
this is one of the beyond-reference training-data operators (brief §
"operations a large-scale training-data pipeline would need").
"""

from __future__ import annotations

import re
from typing import Iterable, Mapping

import numpy as np
import pandas as pd
import pyarrow as pa

from .text import TOKEN_PATTERN

EOW = "</w>"  # end-of-word marker symbol (Sennrich-style)
PRETOKEN_RE = re.compile(TOKEN_PATTERN)
_MEMO_CAP = 1 << 17  # encoder per-actor memo entries before reset


def pretokenize(text: str) -> list[str]:
    """The shared pre-tokenizer split (``stages/text.py::TOKEN_PATTERN``)."""
    return PRETOKEN_RE.findall(text)


def _word_symbols(word: str) -> list[str]:
    return list(word) + [EOW]


def _merge_word(syms: list[str], pair: tuple[str, str], new: str) -> list[str]:
    """Merge every (left-to-right, non-overlapping) occurrence of ``pair``."""
    out: list[str] = []
    i, n = 0, len(syms)
    a, b = pair
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(new)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def learn_merges(
    word_freq: Mapping[str, int],
    num_merges: int,
    min_pair_freq: int = 1,
) -> list[tuple[str, str]]:
    """The BPE merge loop: repeatedly fuse the most frequent adjacent
    symbol pair (frequency-weighted by word count; ties broken by
    lexicographically smallest pair, so training is deterministic).

    Incremental maintenance: per-pair counts plus a pair → word-index
    posting set, so each merge touches only the words that actually
    contain the winning pair (the standard trainer optimization) —
    O(affected word length), not O(vocabulary), per merge. Equality with
    a from-scratch recount oracle is pytest-asserted
    (tests/test_bpe.py)."""
    words: list[list[str]] = []
    freqs: list[int] = []
    for w in sorted(word_freq):
        n = int(word_freq[w])
        if not w or n <= 0:
            continue
        words.append(_word_symbols(w))
        freqs.append(n)

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for i, syms in enumerate(words):
        f = freqs[i]
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + f
            pair_words.setdefault(p, set()).add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_freq:
            break
        pair = best[0]
        merges.append(pair)
        new_sym = pair[0] + pair[1]
        affected = pair_words.pop(pair, set())
        for i in affected:
            syms, f = words[i], freqs[i]
            # retract this word's old pair contributions, merge, re-add
            for p in zip(syms, syms[1:]):
                c = pair_counts.get(p)
                if c is not None:
                    if c - f <= 0:
                        del pair_counts[p]
                    else:
                        pair_counts[p] = c - f
                s = pair_words.get(p)
                if s is not None:
                    s.discard(i)
            merged = _merge_word(syms, pair, new_sym)
            words[i] = merged
            for p in zip(merged, merged[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + f
                pair_words.setdefault(p, set()).add(i)
        pair_counts.pop(pair, None)  # fully retracted; guard rounding
    return merges


def vocab_from_merges(
    word_freq_keys: Iterable[str], merges: list[tuple[str, str]]
) -> dict[str, int]:
    """Deterministic symbol → id table: the sorted base alphabet (every
    character seen in training words, plus the EOW marker) followed by
    merge products in merge order. Distinct merges can produce the same
    surface string ((a,bc) and (ab,c) both yield "abc"); ids are by
    surface string, first writer wins — encoding only ever needs the
    string → id direction."""
    alphabet = {EOW}
    for w in word_freq_keys:
        alphabet.update(w)
    vocab: dict[str, int] = {}
    for s in sorted(alphabet):
        vocab[s] = len(vocab)
    for a, b in merges:
        s = a + b
        if s not in vocab:
            vocab[s] = len(vocab)
    return vocab


def encode_word(word: str, ranks: Mapping[tuple[str, str], int]) -> list[str]:
    """Apply trained merges to one word: repeatedly merge the
    lowest-rank adjacent pair present (equivalent to replaying the merge
    list in training order — the standard BPE encode)."""
    syms = _word_symbols(word)
    while len(syms) >= 2:
        best_rank = None
        best_pair = None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        syms = _merge_word(syms, best_pair, best_pair[0] + best_pair[1])
    return syms


def decode_symbols(syms: Iterable[str]) -> str:
    """Inverse of :func:`encode_word` for one word (strip the EOW)."""
    return "".join(syms).replace(EOW, "")


class BpeEncoder:
    """Actor-pool map_batches stage: encode each row's text with a
    trained BPE model (broadcast ``{"merges": [...], "vocab": {...}}``
    ref read ONCE in ``__init__``). Emits ``bpe_ids`` (list<int32>;
    symbols outside the training alphabet map to -1) and ``n_bpe``.

    Per-word memo cache shared across batches (actor state): on real
    text the unique-word distribution is heavy-tailed, so steady-state
    encoding is a dict lookup per token; the cache resets past
    ``_MEMO_CAP`` entries to bound actor heap."""

    def __init__(self, model_ref, text_col: str = "text"):
        import ray

        model = ray.get(model_ref)
        merges = [tuple(m) for m in model["merges"]]
        self.ranks = {m: i for i, m in enumerate(merges)}
        self.vocab: dict[str, int] = model["vocab"]
        self.text_col = text_col
        self._memo: dict[str, list[int]] = {}

    def _ids(self, word: str) -> list[int]:
        got = self._memo.get(word)
        if got is None:
            if len(self._memo) >= _MEMO_CAP:
                self._memo.clear()
            got = [self.vocab.get(s, -1) for s in encode_word(word, self.ranks)]
            self._memo[word] = got
        return got

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        ids_col: list[list[int]] = []
        n_col = np.empty(len(batch), dtype=np.int64)
        for i, text in enumerate(batch[self.text_col].astype(str)):
            ids: list[int] = []
            for w in pretokenize(text):
                ids.extend(self._ids(w))
            ids_col.append(ids)
            n_col[i] = len(ids)
        t = pa.Table.from_pandas(batch, preserve_index=False)
        t = t.append_column("bpe_ids", pa.array(ids_col, type=pa.list_(pa.int32())))
        return t.append_column("n_bpe", pa.array(n_col))

"""Text-analysis stages over a documents table — language ID, quality
scoring, token counting, document fingerprinting.

These are the training-data analogs of the reference's per-doc text
operators: entity/keyword extraction with a once-per-worker compiled
automaton (``common/document_parser/lib/entities.py:18-25`` — here: regexes
compiled in actor ``__init__``), word counting
(``common/document_parser/lib/text_length.py:1-3``), and the text-cleanup
scalar chain (``common/utils/text_utils.py:1-100``).

All stages are callable CLASSES for ``map_batches(Cls, concurrency=N)``:
state (compiled patterns, language profiles) built once per actor, batches
processed vectorized in pandas/numpy.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

# regex shared by the Ray stage and the DuckDB oracle (RE2-compatible:
# no backrefs, no \p classes) — a BPE-ish pre-tokenizer split.
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "for", "on", "with")


class TokenCounter:
    """Token counting (M11 word-count analog, generalized to a compiled
    regex pre-tokenizer). Output: + ``n_tokens`` column."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa
        import pyarrow.compute as pc

        # vectorized re2 kernel (one C pass over the column) — equivalent
        # to len(findall(TOKEN_PATTERN)) since matches never overlap
        counts = pc.count_substring_regex(
            pa.Array.from_pandas(batch[self.text_col]), TOKEN_PATTERN
        )
        batch["n_tokens"] = counts.to_numpy(zero_copy_only=False).astype("int64")
        return batch


class QualityScorer:
    """Quality scoring: word count, mean word length, stopword ratio —
    semantics chosen to be exactly mirrorable in SQL (split on single
    space, like the reference's ``len(text.split(' '))``)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.stop = set(STOPWORDS)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        # positional index for the explode/groupby: duplicate index
        # labels (possible when a caller reuses the stage outside Ray's
        # fresh-RangeIndex batches) would silently merge rows (ADVICE r3)
        text = batch[self.text_col].reset_index(drop=True)
        # split(' ') semantics, vectorized: n_words = spaces + 1 (empty
        # string splits to [''], one "word"), total word chars =
        # len(text) - spaces — the same identities the SQL oracle uses
        n_words = (text.str.count(" ") + 1).astype("int64")
        stop_hits = (
            text.str.split(" ").explode().isin(self.stop)
            .groupby(level=0).sum()          # C-speed isin + segmented sum
            .reindex(text.index, fill_value=0)
        )
        batch["n_words"] = n_words.to_numpy()
        batch["stopword_ratio"] = (stop_hits / n_words).astype(float).to_numpy()
        batch["mean_word_len"] = (
            (text.str.len() - (n_words - 1)) / n_words
        ).astype(float).to_numpy()
        return batch


# tiny per-language character-trigram profiles (deterministic, built-in —
# a real system would load trained profiles in __init__ from a model path)
_LANG_PROFILES = {
    "en": ("the", "ing", "and", "ion", "ent"),
    "es": ("de ", "la ", "os ", "ión", "ent"),
    "fr": ("es ", "de ", "le ", "ion", "ent"),
    "de": ("en ", "er ", "ch ", "der", "ein"),
}


class LangId:
    """N-gram-heuristic language ID (stateful stage; profile table built
    once per actor). Deterministic: ties broken by language code order.
    Output: + ``lang_pred`` column. No SQL oracle (heuristic scoring) —
    verified by a pure-python re-implementation in tests."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.profiles = {k: tuple(v) for k, v in sorted(_LANG_PROFILES.items())}

    def _score(self, s: str) -> str:
        s = s.lower()
        best, best_score = "und", -1
        for lang, grams in self.profiles.items():
            score = sum(s.count(g) for g in grams)
            if score > best_score:
                best, best_score = lang, score
        return best

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["lang_pred"] = batch[self.text_col].map(self._score)
        return batch


REPLACEMENT_CHAR = "�"


def replacement_char_ratio(text: str) -> float:
    """Share of U+FFFD replacement characters — the reference's bad-OCR
    page heuristic (``common/utils/file_utils.py:43-80``): a page whose
    decode produced mostly replacement chars needs re-OCR."""
    if not text:
        return 0.0
    return text.count(REPLACEMENT_CHAR) / len(text)


class OcrQualityGate:
    """Bad-page detection stage (M17, ``common/utils/file_utils.py:43-80``
    + the batched re-OCR prepass ``process.py:189-239``): adds the
    replacement-char ratio and an ``ocr_ok`` flag per page/doc. Rows over
    the threshold are what a deployment routes to the re-OCR actor pool
    (the heavy ocrmypdf stage itself needs system binaries absent here;
    the detection heuristic and the split are the real, tested part)."""

    def __init__(self, text_col: str = "text", threshold: float = 0.2):
        self.text_col = text_col
        self.threshold = threshold

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ratio = batch[self.text_col].map(replacement_char_ratio)
        batch["bad_char_ratio"] = ratio
        batch["ocr_ok"] = ratio <= self.threshold
        return batch


class TopicScorer:
    """TF-IDF topic stage with a REAL model artifact (M7,
    ``common/document_parser/lib/topics.py:1-40``): the model (term → idf
    weights over the corpus vocabulary) is loaded ONCE per actor from a
    broadcast ref in ``__init__`` — the load-model-per-worker pattern —
    and each doc gets its top-k terms by tf·idf (docs under ``min_tokens``
    get none, like the reference's >300-token gate)."""

    def __init__(self, idf_ref, k: int = 5, min_tokens: int = 0, text_col: str = "text"):
        import ray as _ray

        idf = _ray.get(idf_ref)  # DataFrame(term, idf)
        self.idf = dict(zip(idf["term"], idf["idf"]))
        self.k = k
        self.min_tokens = min_tokens
        self.text_col = text_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, terms, scores = [], [], []
        for did, text in zip(batch["doc_id"], batch[self.text_col]):
            words = text.split(" ")
            if len(words) < self.min_tokens:
                continue
            tf: dict[str, int] = {}
            for w in words:
                tf[w] = tf.get(w, 0) + 1
            scored = [
                (round(n * self.idf.get(w, 0.0), 6), w) for w, n in tf.items()
            ]
            scored.sort(key=lambda t: (-t[0], t[1]))
            for s, w in scored[: self.k]:
                ids.append(did)
                terms.append(w)
                scores.append(s)
        return pd.DataFrame(
            {"doc_id": pd.Series(ids, dtype="int64"),
             "topic": pd.Series(terms, dtype="object"),
             "tfidf": pd.Series(scores, dtype="float64")}
        )


class Fingerprinter:
    """Winnowing-style document fingerprint: rolling (Rabin-Karp) hash over
    character k-grams, fingerprint = min hash in hex (deterministic content
    identity robust to rotation — the version_hash analog for fuzzy text,
    M19/J4). Vectorized with numpy per row-batch. No SQL oracle."""

    K = 8
    BASE = np.uint64(257)
    MOD_MASK = np.uint64((1 << 61) - 1)

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        # precompute BASE^(K-1) once per actor
        p = np.uint64(1)
        for _ in range(self.K - 1):
            p = (p * self.BASE) & self.MOD_MASK
        self.high = p

    @np.errstate(over="ignore")  # scoped, not process-global
    def _fp(self, s: str) -> str:
        b = np.frombuffer(s.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        if len(b) < self.K:
            return hashlib.sha256(s.encode()).hexdigest()[:16]
        # rolling hash over all k-gram windows, fully vectorized:
        # h[i] = sum(b[i+j] * BASE^(K-1-j)); compute via cumulative trick
        powers = np.empty(self.K, dtype=np.uint64)
        powers[0] = np.uint64(1)
        for j in range(1, self.K):
            powers[j] = (powers[j - 1] * self.BASE) & self.MOD_MASK
        n = len(b) - self.K + 1
        h = np.zeros(n, dtype=np.uint64)
        for j in range(self.K):
            h = (h + b[j : j + n] * powers[self.K - 1 - j]) & self.MOD_MASK
        return f"{int(h.min()):016x}"

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["fingerprint"] = batch[self.text_col].map(self._fp)
        return batch

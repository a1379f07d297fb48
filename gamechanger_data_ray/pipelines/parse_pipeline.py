"""The composed document-parse pipeline — the Ray-native analog of the
reference's flagship parser chain
(``common/document_parser/parsers/policy_analytics/parse.py:30-90``:
init_doc → pages → paragraphs → entities → topics → keywords → refs →
sections → post-process), producing one doc_dict-shaped nested row per
document.

Composition, not a monolith: every stage is one of the repo's tested
operators (segmentation, gazetteer entities, TF-IDF topics, reference
regexes, date extraction, section dispatch, version hash), fused into a
single actor-pool ``map_batches`` chain so a document is parsed end-to-end
without ever leaving its worker — the per-doc fields are all
within-record, exactly like the reference's per-file ``parse()``; the only
cross-doc state (the idf model) is fitted once and broadcast.

Output schema (the ``output_schema.json`` analog, §1.1):
    doc_id, source, word_count, page_count, par_count,
    version_hash (M19), ref_list (list<str>, M5), dates (list<ts>, §2.9),
    entities (list<str>, M6), top_entities_t (list<str>),
    keyw_5 (list<str>, M8), topics_rs (list<str>, M7),
    sections (list<str>, M13), responsibilities (list<str>), ocr_ok (M17)
"""

from __future__ import annotations

import pandas as pd

from ..core.hashing import sha256_hex
from ..stages.extract import EntityExtractor, collect_refs, extract_dates, make_ref_patterns, top_entities
from ..stages.responsibilities import parse_responsibility_section
from ..stages.sections import parse_sections, sections_to_fields
from ..stages.text import OcrQualityGate, TopicScorer, replacement_char_ratio
from . import common as cm
from .extraction_queries import _PAGE_WORDS, _PAR_WORDS


class DocumentParser:
    """Actor-pool stage: one batch of raw docs in, one doc_dict row per
    doc out. Patterns/gazetteer compile once per actor; the idf model
    arrives broadcast (ST1/ST2)."""

    def __init__(self, idf_ref, keywords_k: int = 5, topics_k: int = 5):
        self.ref_patterns = make_ref_patterns()
        self.entities = EntityExtractor()
        self.topics = TopicScorer(idf_ref, k=topics_k)
        self.ocr = OcrQualityGate()
        self.keywords_k = keywords_k

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        ent_edges = self.entities(df[["doc_id", "text"]].copy())
        top_ents = top_entities(ent_edges, k=5)
        tops = self.topics(df[["doc_id", "text"]].copy())
        rows = []
        ent_by_doc = {k: list(g["entity"]) for k, g in ent_edges.groupby("doc_id")}
        top_by_doc = {k: list(g["entity"]) for k, g in top_ents.groupby("doc_id")}
        topics_by_doc = {k: list(g["topic"]) for k, g in tops.groupby("doc_id")}
        hashes = sha256_hex(
            (df["doc_id"].astype(str) + "|" + df["source"] + "|" + df["text"]).tolist()
        )
        # M11 word counts and M8 keyword top-k hoisted OUT of the per-doc
        # loop, in the same vectorized forms as relational.py's
        # keywords_top3_per_doc (count → sort n desc, word asc → head k);
        # the loop below keeps only the inherently row-wise section /
        # responsibility parsing
        text = df["text"].reset_index(drop=True)
        ids = df["doc_id"].reset_index(drop=True)
        n_words = (text.str.count(" ") + 1).astype("int64")
        exploded = pd.DataFrame({"doc_id": ids, "word": text.str.split(" ")}).explode("word")
        counts = (
            exploded.groupby(["doc_id", "word"], as_index=False, sort=False)
            .size().rename(columns={"size": "n"})
            .sort_values(["doc_id", "n", "word"], ascending=[True, False, True])
        )
        topk = counts.groupby("doc_id", sort=False).head(self.keywords_k)
        keyw_by_doc = {k: list(g["word"]) for k, g in topk.groupby("doc_id", sort=False)}
        for did, src, text_v, vh, nw in zip(
            df["doc_id"], df["source"], df["text"], hashes, n_words
        ):
            text = text_v
            layout = "numbered" if did % 2 == 0 else "caps"
            secs = parse_sections(text, layout)
            sec_fields = sections_to_fields(secs)
            rows.append(
                {
                    "doc_id": did,
                    "source": src,
                    "word_count": int(nw),
                    "page_count": -(-int(nw) // _PAGE_WORDS),
                    "par_count": -(-int(nw) // _PAR_WORDS),
                    "version_hash": vh,
                    "ref_list": sorted(collect_refs(text, self.ref_patterns)),
                    "dates": extract_dates(text),
                    "entities": sorted(ent_by_doc.get(did, [])),
                    "top_entities_t": top_by_doc.get(did, []),
                    "keyw_5": keyw_by_doc.get(did, []),
                    "topics_rs": topics_by_doc.get(did, []),
                    "sections": [name for _, name, _ in secs],
                    # the reference's 14-field named-sections contract
                    # (add_sections.py:12-27) as a struct of string lists
                    "section_fields": sec_fields,
                    # responsibility extraction over the RESPONSIBILITIES
                    # section body (responsibility_parser.py contract):
                    # one role-intro line per role block found
                    "responsibilities": [
                        block[0]
                        for block in parse_responsibility_section(
                            "\n".join(sec_fields["responsibilities_section"])
                        )
                    ],
                    "ocr_ok": replacement_char_ratio(text) <= self.ocr.threshold,
                }
            )
        return pd.DataFrame(rows)


def parse_documents(sf_dir: str):
    """documents → parsed doc_dict rows (the ``pdf-to-json`` entry analog,
    ``common/document_parser/cli.py:20-74``). Pass 1 fits the idf model
    (distributed partials, broadcast once); pass 2 parses every doc in one
    actor-pool chain."""
    import math

    docs = cm.read(sf_dir, "documents", columns=["doc_id", "text", "source"])
    n_docs = docs.count()

    def distinct_partial(df: pd.DataFrame) -> pd.DataFrame:
        e = df.assign(word=df["text"].str.split(" ")).explode("word")
        return e[["doc_id", "word"]].drop_duplicates()

    df_counts = cm.partial_groupby_sum(
        docs.map_batches(distinct_partial, batch_format="pandas"),
        keys=["word"], sums={}, counts="df",
    )
    idf = pd.DataFrame(
        {"term": df_counts["word"],
         "idf": [math.log(n_docs / d) for d in df_counts["df"]]}
    )
    idf_ref = cm.broadcast(idf)
    return docs.map_batches(
        DocumentParser,
        fn_constructor_args=(idf_ref,),
        batch_format="pandas",
        concurrency=(1, cm.pool_size()),
    )

"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship CDC replay (synthetic tokens changelog →
exactly-once lake table) end-to-end; ``queries()`` exposes every
implemented operator/pipeline from SURVEY.md §2 over a given sf_dir;
``oracle_sql()`` gives the DuckDB-equivalent SQL where expressible.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import shutil
import tempfile
from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: generate a deterministic 4-epoch tokens changelog
    (insert/update/delete + dup deliveries + schema evolution + zipf skew),
    replay it through the CDC engine (combiner → hash-partition merge →
    exactly-once sink), and return the committed final table as a Dataset."""
    from gamechanger_data_ray.core.changelog import write_changelog
    from gamechanger_data_ray.engine.cdc import read_table, replay

    base = tempfile.mkdtemp(prefix="gcdr_entry_", dir="/tmp")
    changelog_dir, table_dir = f"{base}/changelog", f"{base}/table"
    write_changelog(
        changelog_dir,
        num_epochs=4,
        events_per_epoch=2000,
        num_keys=400,
        evolution=True,
        zipf_a=1.5,
    )
    replay(changelog_dir, table_dir, num_partitions=8)
    return read_table(table_dir, payload_only=True)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline (SURVEY.md §2)."""
    from gamechanger_data_ray.pipelines import analysis_queries as A
    from gamechanger_data_ray.pipelines import cdc_queries as C
    from gamechanger_data_ray.pipelines import incremental as I
    from gamechanger_data_ray.pipelines import relational as R
    from gamechanger_data_ray.pipelines import tokens as T

    names_r = [
        "q1_pricing_summary", "q3_shipping_priority", "customers_per_region",
        "topk_part_types", "distinct_sources", "filter_project_rename",
        "version_hash_documents", "customers_without_orders",
        "events_tumbling_window", "events_sessionize", "latest_event_per_user",
        "user_ingest_dates", "event_type_dim_enrich",
        "orders_top100_global_sort", "top2_customers_per_nation",
        "events_sliding_window", "docs_source_dispatch",
        "docs_explode_words", "keywords_top3_per_doc", "source_staleness",
        "q6_forecast_revenue", "q5_local_supplier_volume",
        "events_date_features", "events_asof_join", "events_range_join",
        "q18_large_orders", "events_rollup", "q17_small_quantity_revenue",
        "events_running_total",
    ]
    names_c = ["cdc_lww_replay", "cdc_dedup_versions"]
    names_i = ["events_checkpoint_incremental", "hash_antijoin_incremental",
               "hash_antijoin_bloom", "distinct_users_hll", "hot_keys_countmin"]
    names_a = [
        "text_token_count", "text_quality", "text_langid", "text_fingerprint",
        "dedup_exact", "dedup_minhash_lsh", "dedup_simhash", "dedup_tokens_minhash",
        "dedup_ngram_jaccard", "ann_topk_cosine", "ann_ivf", "ann_lsh",
        "embedding_dedup_cosine", "multimodal_decode", "multimodal_resize",
    ]
    names_t = [
        "vocab_topk", "docs_pack_assignment", "pack_token_chunks",
        "docs_entity_edges", "text_normalize", "events_parse_props",
        "tokenize_documents", "doc_token_counts", "training_data_pipeline",
        "docs_hash_sample", "ntok_quantiles",
    ]
    out: dict[str, Callable[[str], Any]] = {}
    for mod, names in ((R, names_r), (C, names_c), (I, names_i), (A, names_a), (T, names_t)):
        for n in names:
            out[n] = getattr(mod, n)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted for heuristic/approximate
    ops — langid, fingerprint, MinHash/SimHash/IVF — which the driver
    records as rows-only checks; they are verified against pure-python
    oracles in tests/)."""
    from gamechanger_data_ray.pipelines import analysis_queries as A
    from gamechanger_data_ray.pipelines import cdc_queries as C
    from gamechanger_data_ray.pipelines import incremental as I
    from gamechanger_data_ray.pipelines import relational as R
    from gamechanger_data_ray.pipelines import tokens as T

    out: dict[str, str] = {}
    out.update(R.ORACLES)
    out.update(C.ORACLES)
    out.update(I.ORACLES)
    out.update(A.ORACLES)
    out.update(T.ORACLES)
    return out

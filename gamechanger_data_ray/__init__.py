"""gamechanger_data_ray — a from-scratch Ray-Data-native CDC / incremental
ingest engine with the data-processing capabilities of
dod-advana/gamechanger-data, re-expressed Ray-Data-first.

Layers
------
core/       pure-Arrow kernels: schemas, LWW merge, schema reconciler,
            hashing/partitioning, synthetic changelog generator.
            No Ray dependency — unit testable in-process.
engine/     the Ray Data CDC engine: epoch tailing, reconcile stage,
            partial-reduce combiner, hash-partitioned merge, exactly-once
            Parquet sink (per-partition manifests + epoch fencing),
            lineage counters, checkpoint/resume driver loop.
stages/     reference-parity + training-data operators as composable
            Dataset stages (text analysis, dedup, similarity, multimodal).
sources/    readers (epoch directories with ready-marker gating, sidecars).
functions/  scalar function library (text/date/hash utils).
pipelines/  the query surface consumed by __ray_entry__.queries().
state/      watermark / checkpoint persistence helpers.

Reference parity citations use file:line paths relative to
/root/reference (dod-advana/gamechanger-data).
"""

__version__ = "0.1.0"

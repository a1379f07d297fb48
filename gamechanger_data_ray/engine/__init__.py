"""Ray Data CDC engine: epoch tailing → reconcile → partial reduce →
hash-partitioned LWW merge → exactly-once Parquet sink."""

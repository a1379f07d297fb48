"""CDC queries over the driver's testdata — the flagship LWW replay in a
SQL-checkable form.

``cdc_lww_replay`` derives a deterministic 3-epoch changelog from the
``documents`` table (insert-all, update doc_id%3==0, delete doc_id%7==0 —
mirroring the universal test harness's re-uploaded/changed docs across
sequential batches, ``dev_tools/universal_test_harness/cli.py:23-69``) and
runs it through the engine's real merge path: per-batch combiner →
hash-partition shuffle → partition-local LWW reduce. The oracle is the
reference snapshot-view window query
(``dataPipelines/gc_db_utils/orch/sql/create_views.sql:16-44``).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..core.hashing import partition_ids
from ..core.merge import drop_tombstones, lww_reduce
from . import common as cm

ORACLES: dict[str, str] = {}

_PART = "_part"


def _derive_changelog(sf_dir: str) -> ray.data.Dataset:
    """documents → 3 epochs of I/U/D events (deterministic, SQL-mirrorable).
    Updates append " v2" to text (n_chars + 3 mirrors it)."""
    docs = cm.read(sf_dir, "documents", columns=["doc_id", "text", "source", "n_chars"])

    def to_events(t: pa.Table) -> pa.Table:
        did = t["doc_id"]
        nulls_s = pa.nulls(t.num_rows, pa.string())

        def ep(op, lsn, mask, text, source, n_chars):
            tt = pa.table(
                {
                    "op": pa.array([op] * t.num_rows),
                    "lsn": pa.array([lsn] * t.num_rows, pa.int64()),
                    "seq": pc.cast(did, pa.int64()),
                    "doc_id": did,
                    "text": text,
                    "source": source,
                    "n_chars": pc.cast(n_chars, pa.int64()),
                }
            )
            return tt.filter(mask) if mask is not None else tt

        e1 = ep("I", 1, None, t["text"], t["source"], t["n_chars"])
        # doc_id % 3 == 0 updates, doc_id % 7 == 0 deletes
        did_np = did.to_numpy(zero_copy_only=False) if not isinstance(did, pa.ChunkedArray) else did.combine_chunks().to_numpy(zero_copy_only=False)
        m3 = pa.array(did_np % 3 == 0)
        m7 = pa.array(did_np % 7 == 0)
        e2 = ep("U", 2, m3, pc.binary_join_element_wise(t["text"], pa.array(["v2"] * t.num_rows), " "), t["source"], pc.add(t["n_chars"], 3))
        e3 = ep("D", 3, m7, nulls_s, nulls_s, pa.nulls(t.num_rows, pa.int64()))
        return pa.concat_tables([e1, e2, e3])

    return docs.map_batches(to_events, batch_format="pyarrow")


def cdc_lww_replay(sf_dir: str, num_partitions: int = 16):
    """Replay the derived changelog to the final table via the engine's
    combiner + hash-partitioned LWW merge. Returns (doc_id, text, source)."""
    ev = _derive_changelog(sf_dir)

    def combine(t: pa.Table) -> pa.Table:
        t = lww_reduce(t)  # per-batch partial: ≤1 row per key
        return t.append_column(_PART, partition_ids(t["doc_id"], num_partitions))

    ev = ev.map_batches(combine, batch_format="pyarrow")

    def merge(group: pa.Table) -> pa.Table:
        out = drop_tombstones(lww_reduce(group.drop_columns([_PART])))
        return out.select(["doc_id", "text", "source"])

    return ev.groupby(_PART).map_groups(merge, batch_format="pyarrow")


ORACLES["cdc_lww_replay"] = """
WITH ev AS (
  SELECT 'I' AS op, 1 AS lsn, doc_id AS seq, doc_id, text, source FROM documents
  UNION ALL
  SELECT 'U', 2, doc_id, doc_id, text || ' v2', source FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT 'D', 3, doc_id, doc_id, NULL, NULL FROM documents WHERE doc_id % 7 = 0
)
SELECT doc_id, text, source FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY lsn DESC, seq DESC) AS rn
  FROM ev
) WHERE rn = 1 AND op <> 'D'
"""


def cdc_dedup_versions(sf_dir: str):
    """Exact version dedup within the derived changelog: distinct
    (doc_id, lsn) event count per op — the J4 version-hash dedup analog
    (``rpa/rpa_landing_zone_mover.py:100-129``) expressed as a grouped
    distinct."""
    ev = _derive_changelog(sf_dir)

    def distinct_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[["op", "lsn", "doc_id"]].drop_duplicates()

    ev = ev.map_batches(distinct_partial, batch_format="pandas")

    def count_group(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        return pd.DataFrame({"op": [d["op"].iloc[0]], "n_versions": [len(d)]})

    return ev.groupby("op").map_groups(count_group, batch_format="pandas")


ORACLES["cdc_dedup_versions"] = """
SELECT op, COUNT(*) AS n_versions FROM (
  SELECT DISTINCT op, lsn, doc_id FROM (
    SELECT 'I' AS op, 1 AS lsn, doc_id FROM documents
    UNION ALL SELECT 'U', 2, doc_id FROM documents WHERE doc_id % 3 = 0
    UNION ALL SELECT 'D', 3, doc_id FROM documents WHERE doc_id % 7 = 0
  )
) GROUP BY op
"""


def cdc_view_rollup(sf_dir: str):
    """Incrementally-maintained materialized view, driven end-to-end
    through the real engine: replay the derived changelog epoch-by-epoch
    into a committed lake table (`apply_events_dataset`), refreshing the
    per-source rollup view after EVERY commit — epoch 1 is a full build,
    epochs 2 (updates) and 3 (deletes) exercise the incremental Z-set
    retraction path (`engine/views.py`). Returns the final view
    (source, n_rows, sum_chars). Oracle: plain GROUP BY over the LWW
    final state — incremental maintenance must be indistinguishable from
    recomputation (the reference recomputes its rollups on every publish,
    ``dataPipelines/gc_db_utils/orch/sql/create_views.sql``)."""
    import tempfile

    from ..engine.cdc import apply_events_dataset
    from ..engine.views import ViewDef, read_view, refresh

    base = tempfile.mkdtemp(prefix="gcdr_viewq_", dir="/tmp")
    table_dir, view_dir = f"{base}/table", f"{base}/view"
    ev = _derive_changelog(sf_dir)
    schema = pa.schema(
        [
            ("op", pa.string()),
            ("lsn", pa.int64()),
            ("seq", pa.int64()),
            ("doc_id", pa.int64()),
            ("text", pa.string()),
            ("source", pa.string()),
            ("n_chars", pa.int64()),
        ]
    )
    view = ViewDef(["source"], {"sum_chars": "n_chars"})
    # pin the derived changelog once: each epoch's filter would otherwise
    # re-execute the derivation (3×). In a real deployment the changelog
    # IS durable storage; this stands in for reading it from disk.
    ev = ev.materialize()
    for epoch in (1, 2, 3):
        e = ev.filter(
            expr=f"lsn == {epoch}"
        )
        apply_events_dataset(e, table_dir, epoch, schema, num_partitions=8)
        refresh(view, view_dir, table_dir, num_partitions=4)
    return read_view(view_dir)


ORACLES["cdc_view_rollup"] = """
WITH ev AS (
  SELECT 'I' AS op, 1 AS lsn, doc_id AS seq, doc_id, source, n_chars FROM documents
  UNION ALL
  SELECT 'U', 2, doc_id, doc_id, source, n_chars + 3 FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT 'D', 3, doc_id, doc_id, NULL, NULL FROM documents WHERE doc_id % 7 = 0
), state AS (
  SELECT source, n_chars FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY lsn DESC, seq DESC) AS rn
    FROM ev
  ) WHERE rn = 1 AND op <> 'D'
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COALESCE(SUM(n_chars), 0) AS BIGINT) AS sum_chars
FROM state GROUP BY source
"""


_WIN_W = 172_800_000_000  # 2 days in µs
_WIN_L = 86_400_000_000   # 1 day allowed lateness


def cdc_window_rollup(sf_dir: str):
    """Event-time tumbling-window view driven end-to-end through the real
    engine (`engine/window_view.py`) with WATERMARK + allowed-lateness
    semantics exercised for real: arrival epochs derive from
    ``event_id % 3`` while event TIME is the independent ``ts`` column,
    so every epoch genuinely delivers out-of-order rows — some land
    behind the committed watermark and divert to the late side output
    instead of mutating finalized windows. Returns the final window
    table (window_start, n_rows, sum_amt). The DuckDB oracle recomputes
    the SAME semantics declaratively: per-epoch max event time → running
    watermark → a row folds iff its window end clears the PREVIOUS
    epoch's watermark — so incremental maintenance, finalization and
    late diversion must all agree with the closed-form recompute."""
    import tempfile

    from ..engine.cdc import apply_events_dataset
    from ..engine.window_view import (
        EventWindowView,
        read_windowed,
        refresh_windowed,
    )

    base = tempfile.mkdtemp(prefix="gcdr_winq_", dir="/tmp")
    table_dir, view_dir = f"{base}/table", f"{base}/view"

    ev = cm.read(sf_dir, "events", columns=["event_id", "ts", "user_id"])

    def derive(t: pa.Table) -> pa.Table:
        import numpy as np

        eid = t["event_id"]
        ep = (eid.to_numpy(zero_copy_only=False) % 3 + 1).astype(np.int64)
        return pa.table({
            "op": pa.array(["I"] * t.num_rows, pa.string()),
            "lsn": pa.array(ep),
            "seq": eid,
            "doc_id": eid,
            "event_ts": pc.cast(t["ts"], pa.int64()),
            "amt": t["user_id"],
        })

    schema = pa.schema([
        ("op", pa.string()), ("lsn", pa.int64()), ("seq", pa.int64()),
        ("doc_id", pa.int64()), ("event_ts", pa.int64()), ("amt", pa.int64()),
    ])
    view = EventWindowView("event_ts", width=_WIN_W,
                           sums={"sum_amt": "amt"}, lateness=_WIN_L)
    events = ev.map_batches(derive, batch_format="pyarrow").materialize()
    for epoch in (1, 2, 3):
        e = events.filter(expr=f"lsn == {epoch}")
        apply_events_dataset(e, table_dir, epoch, schema, num_partitions=8)
        refresh_windowed(view, view_dir, table_dir, num_partitions=4)
    t = read_windowed(view_dir)
    out = t.to_pandas().astype({"window_start": "int64", "n_rows": "int64",
                                "sum_amt": "int64"})
    return out.sort_values("window_start").reset_index(drop=True)


ORACLES["cdc_window_rollup"] = f"""
WITH ev AS (
  SELECT event_id % 3 + 1 AS ep, epoch_us(ts) AS t, user_id AS amt FROM events
), em AS (SELECT ep, MAX(t) AS mx FROM ev GROUP BY ep),
j AS (
  SELECT e.*,
         (SELECT MAX(mx) - {_WIN_L} FROM em WHERE em.ep < e.ep) AS prev_wm
  FROM ev e
),
ontime AS (
  SELECT (t // {_WIN_W}) * {_WIN_W} AS window_start, amt FROM j
  WHERE prev_wm IS NULL OR ((t // {_WIN_W}) * {_WIN_W} + {_WIN_W}) > prev_wm
)
SELECT window_start, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(amt) AS BIGINT) AS sum_amt
FROM ontime GROUP BY 1 ORDER BY 1
"""

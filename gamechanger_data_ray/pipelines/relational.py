"""Relational operator parity: filters, projections/renames, grouped
aggregates, top-k, distinct, joins (broadcast + partitioned hash),
anti/semi joins, windowed and sessionized event aggregates, hashing.

Each query function takes ``sf_dir`` and returns a Dataset / DataFrame /
Arrow table; ``ORACLES[name]`` holds the equivalent DuckDB SQL with
IDENTICAL output column names. Reference analogs cited per function.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..core.hashing import version_hash_column
from . import common as cm
from .joins import adaptive_join, hash_join

ORACLES: dict[str, str] = {}


# ---------------------------------------------------------------------------
# Aggregates (SURVEY.md §2.6 A1/A2; combiner-before-shuffle per §7.2-6)
# ---------------------------------------------------------------------------

def q1_pricing_summary(sf_dir: str):
    """TPC-H-Q1-shaped grouped aggregate over lineitem: filter → per-batch
    partial sums (combiner) → small groupby → derived averages.
    Ref analog: grouped counters/aggregates A1/A10.

    Sums run in EXACT scaled-integer arithmetic (prices/discounts are
    2-decimal values → int64 cents): float partial sums accumulate in
    nondeterministic block order, so a float pipeline can never promise
    a byte-identical aggregate across runs — integer sums are associative
    and land on the same bits on any cluster, any partition order. The
    final derived doubles are then identical too."""
    ds = cm.read(
        sf_dir,
        "lineitem",
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_tax", "l_shipdate",
        ],
    )
    cutoff = pa.scalar(pd.Timestamp("1998-09-02"))

    def cents(col) -> pa.ChunkedArray:
        return pc.cast(pc.round(pc.multiply(col, pa.scalar(100.0))), pa.int64())

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], cutoff))
        qc, pc_, dc, tc = (cents(t[c]) for c in
                           ("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
        dp = pc.multiply(pc_, pc.subtract(pa.scalar(100, pa.int64()), dc))   # 1e-4 units
        ch = pc.multiply(dp, pc.add(pa.scalar(100, pa.int64()), tc))         # 1e-6 units
        return pa.table({
            "l_returnflag": t["l_returnflag"], "l_linestatus": t["l_linestatus"],
            "qc": qc, "pc": pc_, "dc": dc, "dp": dp, "ch": ch,
        })

    ds = ds.map_batches(prep, batch_format="pyarrow")
    df = cm.partial_groupby_sum(
        ds,
        keys=["l_returnflag", "l_linestatus"],
        sums={"qc": "qc", "pc": "pc", "dp": "dp", "ch": "ch", "dc": "dc"},
        counts="count_order",
    )  # |flags × statuses| rows — tiny
    out = pd.DataFrame({
        "l_returnflag": df["l_returnflag"], "l_linestatus": df["l_linestatus"],
        "sum_qty": df["qc"] / 100.0,
        "sum_base_price": df["pc"] / 100.0,
        "sum_disc_price": df["dp"] / 10000.0,
        "sum_charge": df["ch"] / 1000000.0,
        "count_order": df["count_order"],
    })
    out["avg_qty"] = out["sum_qty"] / out["count_order"]
    out["avg_price"] = out["sum_base_price"] / out["count_order"]
    out["avg_disc"] = (df["dc"] / 100.0) / out["count_order"]
    return out


ORACLES["q1_pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       SUM(qc) / 100.0                AS sum_qty,
       SUM(pc) / 100.0                AS sum_base_price,
       SUM(pc * (100 - dc)) / 10000.0 AS sum_disc_price,
       SUM(pc * (100 - dc) * (100 + tc)) / 1000000.0 AS sum_charge,
       COUNT(*)                       AS count_order,
       (SUM(qc) / 100.0) / COUNT(*)   AS avg_qty,
       (SUM(pc) / 100.0) / COUNT(*)   AS avg_price,
       (SUM(dc) / 100.0) / COUNT(*)   AS avg_disc
FROM (
  SELECT l_returnflag, l_linestatus,
         CAST(ROUND(l_quantity * 100) AS BIGINT)      AS qc,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS pc,
         CAST(ROUND(l_discount * 100) AS BIGINT)      AS dc,
         CAST(ROUND(l_tax * 100) AS BIGINT)           AS tc
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
)
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(sf_dir: str):
    """Filter + broadcast semi-join (small dim side) + size-adaptive join
    (broadcast when the filtered orders side is small, partitioned hash
    join past the limit) + grouped revenue + deterministic top-10.
    Ref analogs: J1 equi-join, J7 broadcast dim, M8 top-k."""
    cutoff = pd.Timestamp("1995-03-15")
    cust = cm.read_arrow(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    building = cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING"))["c_custkey"].to_pylist()
    keys_ref = cm.broadcast(building)

    orders = cm.read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])
    orders = orders.map_batches(
        lambda t: t.filter(pc.less(t["o_orderdate"], pa.scalar(cutoff))),
        batch_format="pyarrow",
    )
    orders = cm.semi_filter(orders, "o_custkey", keys_ref)
    orders = orders.map_batches(
        lambda t: t.rename_columns(["l_orderkey", "o_custkey", "o_orderdate"]).select(
            ["l_orderkey", "o_orderdate"]
        ),
        batch_format="pyarrow",
    )

    li = cm.read(sf_dir, "lineitem", columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"])

    def li_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["l_shipdate"], pa.scalar(cutoff)))
        rev = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return t.append_column("rev", rev).select(["l_orderkey", "rev"])

    li = li.map_batches(li_prep, batch_format="pyarrow")

    joined = adaptive_join(li, orders, on="l_orderkey", num_buckets=16)
    agg = cm.partial_groupby_sum(joined, keys=["l_orderkey", "o_orderdate"], sums={"rev": "revenue"})
    top = agg.sort_values(["revenue", "l_orderkey"], ascending=[False, True]).head(10)
    return top.reset_index(drop=True)


ORACLES["q3_shipping_priority"] = """
SELECT l_orderkey, o_orderdate, SUM(l_extendedprice * (1 - l_discount)) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def customers_per_region(sf_dir: str):
    """Broadcast dim-join chain region ⋈ nation ⋈ customer → counts.
    Ref analog: J7 crawler_info dim lookup (``parse.py:112-126``)."""
    region = cm.read_arrow(sf_dir, "region").to_pandas()
    nation = cm.read_arrow(sf_dir, "nation").to_pandas()
    dim = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")[
        ["n_nationkey", "r_name"]
    ].rename(columns={"n_nationkey": "c_nationkey"})
    dim_ref = cm.broadcast(dim)

    cust = cm.read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    enriched = cust.map_batches(
        cm.BroadcastJoiner, fn_constructor_args=(dim_ref, "c_nationkey"),
        batch_format="pandas", concurrency=(1, cm.pool_size()),
    )
    out = cm.partial_groupby_sum(enriched, keys=["r_name"], sums={}, counts="n_customers")
    return out


ORACLES["customers_per_region"] = """
SELECT r_name, COUNT(*) AS n_customers
FROM customer JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def topk_part_types(sf_dir: str):
    """Grouped count → deterministic top-10 (M8 keyword-top-k analog,
    ``common/document_parser/lib/keywords.py:4-11``)."""
    ds = cm.read(sf_dir, "part", columns=["p_type"])
    out = cm.partial_groupby_sum(ds, keys=["p_type"], sums={}, counts="cnt")
    return out.sort_values(["cnt", "p_type"], ascending=[False, True]).head(10).reset_index(drop=True)


ORACLES["topk_part_types"] = """
SELECT p_type, COUNT(*) AS cnt FROM part GROUP BY p_type
ORDER BY cnt DESC, p_type LIMIT 10
"""


def distinct_sources(sf_dir: str):
    """Distinct values (A8 distinct crawlers,
    ``gc_crawler_status_tracker.py:36-37``)."""
    ds = cm.read(sf_dir, "documents", columns=["source"])
    return pa.table({"source": pa.array(sorted(ds.unique("source")))})


ORACLES["distinct_sources"] = "SELECT DISTINCT source FROM documents"


def filter_project_rename(sf_dir: str):
    """Filter + projection with suffix renames — the M14 post-process
    projection (``parsers/policy_analytics/parse.py:154-205``:
    ``crawler_used → crawler_used_s`` etc.)."""
    ds = cm.read(sf_dir, "documents", columns=["doc_id", "lang", "source", "n_chars"])

    def fn(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["lang"], "en"))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "source_s": t["source"],
                "n_chars_i": t["n_chars"],
                "is_long_b": pc.greater(t["n_chars"], 500),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


ORACLES["filter_project_rename"] = """
SELECT doc_id, source AS source_s, n_chars AS n_chars_i, n_chars > 500 AS is_long_b
FROM documents WHERE lang = 'en'
"""


def version_hash_documents(sf_dir: str):
    """Content version-hash column (M19,
    ``gc_ingest/tools/metadata/metadata.py:9-28``): sha256 over
    pipe-joined fields."""
    ds = cm.read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])

    def fn(t: pa.Table) -> pa.Table:
        vh = version_hash_column(t, ["doc_id", "source", "n_chars"])
        return pa.table({"doc_id": t["doc_id"], "version_hash": vh})

    return ds.map_batches(fn, batch_format="pyarrow")


ORACLES["version_hash_documents"] = """
SELECT doc_id,
       sha256(CAST(doc_id AS VARCHAR) || '|' || source || '|' || CAST(n_chars AS VARCHAR))
         AS version_hash
FROM documents
"""


def customers_without_orders(sf_dir: str):
    """Anti-join by broadcast key set — the J3 revocation alive-set
    pattern (absence is an event,
    ``gc_crawler_status_tracker.py:55-82``): customers absent from the
    set of big-order placers become 'revoked'."""
    big = cm.read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
    big = big.map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], pa.scalar(300000.0))).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    keys_ref = cm.broadcast(big.unique("o_custkey"))
    cust = cm.read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    return cm.semi_filter(cust, "c_custkey", keys_ref, keep=False)


ORACLES["customers_without_orders"] = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
"""


def events_tumbling_window(sf_dir: str):
    """Tumbling 1-hour event-time window per user: count + sum(value).
    Streaming-shaped workload as grouped batch aggregate (§2.10; window =
    checkpoint-prefix analog)."""
    ds = cm.read(sf_dir, "events", columns=["user_id", "ts", "value"])

    def bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(window_start=df["ts"].dt.floor("h"))
        return df[["user_id", "window_start", "value"]]

    ds = ds.map_batches(bucket, batch_format="pandas")
    # user×window keys grow with the data → distributed finish
    return cm.partial_groupby_sum(
        ds, keys=["user_id", "window_start"], sums={"value": "sum_value"},
        counts="n_events", driver_finish=False,
    )


ORACLES["events_tumbling_window"] = """
SELECT user_id, date_trunc('hour', ts) AS window_start,
       SUM(value) AS sum_value, COUNT(*) AS n_events
FROM events GROUP BY user_id, date_trunc('hour', ts)
"""


def _day_bucket(ts: pd.Series) -> pd.Series:
    """Salt key: integer day index. Bounds any one key's co-located rows
    to a single user's events in one DAY — the hot-key guard for the
    per-key windowed operators below (a user with 10^9 lifetime events
    still yields day-sized work units). Tighten to hours for intra-day
    hot keys."""
    return ((ts - pd.Timestamp(0)).dt.total_seconds() // 86400).astype("int64")


def _route_of(*cols: pd.Series) -> pd.Series:
    """Coarse shuffle key over the (user[, day]) salt columns — the
    package route-hash convention (``common.route_key``): the Ray
    groupby runs per ROUTE (a few hundred well-sized vectorized tasks),
    never one Ray task per tiny key group (45k single-user-day groups
    measured 5-8× slower than 256 routed ones at sf0.1)."""
    df = pd.DataFrame({f"k{i}": c.to_numpy() for i, c in enumerate(cols)})
    return cm.route_key(df, list(df.columns)).set_axis(cols[0].index)


def events_sessionize(sf_dir: str):
    """Session windows (30-min inactivity gap) per user → session count.

    HOT-KEY-SAFE two-phase shape (no whole-user group ever forms):
    phase 1 reduces each (user, day) to a 4-number summary — gap count
    within the day, first/last ts — inside route-grouped tasks using
    vectorized ``groupby.diff``; phase 2 routes the per-day summaries by
    user (≤ days-spanned rows per user — bounded regardless of volume)
    and adds the day-boundary gaps. Exact: consecutive-event gaps either
    fall inside one day (phase 1) or between the last event of one
    present day and the first of the next (phase 2)."""
    gap = pd.Timedelta(minutes=30)
    ds = cm.read(sf_dir, "events", columns=["user_id", "ts"])

    def add_route(b: pd.DataFrame) -> pd.DataFrame:
        b["_bucket"] = _day_bucket(b["ts"])
        b["_route"] = _route_of(b["user_id"], b["_bucket"])
        return b

    def per_day_route(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "_bucket", "ts"])
        keys = g.groupby(["user_id", "_bucket"], sort=False)
        gaps = keys["ts"].diff() > gap
        out = keys.agg(min_ts=("ts", "min"), max_ts=("ts", "max")).reset_index()
        out["n_gaps"] = gaps.groupby(
            [g["user_id"], g["_bucket"]], sort=False
        ).sum().to_numpy()
        out["_route"] = _route_of(out["user_id"])
        return out

    days = (
        ds.map_batches(add_route, batch_format="pandas")
        .groupby("_route")
        .map_groups(per_day_route, batch_format="pandas")
    )

    def merge_route(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "_bucket"])
        users = g.groupby("user_id", sort=False)
        boundary = (g["min_ts"] - users["max_ts"].shift(1)) > gap
        out = users.agg(n_sessions=("n_gaps", "sum")).reset_index()
        out["n_sessions"] = (
            1 + out["n_sessions"]
            + boundary.groupby(g["user_id"], sort=False).sum().to_numpy()
        ).astype("int64")
        return out

    return days.groupby("_route").map_groups(merge_route, batch_format="pandas")


ORACLES["events_sessionize"] = """
SELECT user_id, CAST(1 + SUM(is_new) AS BIGINT) AS n_sessions FROM (
  SELECT user_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
  FROM events
) GROUP BY user_id
"""


def latest_event_per_user(sf_dir: str, num_partitions: int = 16):
    """LWW compaction over the events stream: latest row per user_id by
    (ts, event_id) — the J2/A1 snapshot-view analog
    (``create_views.sql:16-39``) on a generic stream. Same shape as the
    engine's merge (``engine/cdc.py``): per-batch LWW combiner (≤1 row per
    key per block ships) → ONE hash-partition shuffle → partition-local
    LWW reduce. No driver materialization at any cardinality."""
    from ..core.hashing import partition_ids
    from ..core.merge import lww_reduce

    ds = cm.read(sf_dir, "events", columns=["user_id", "ts", "event_id", "event_type", "value"])

    def combine(t: pa.Table) -> pa.Table:
        t = lww_reduce(t, key="user_id", order=("ts", "event_id"))
        return t.append_column("_part", partition_ids(t["user_id"], num_partitions))

    ds = ds.map_batches(combine, batch_format="pyarrow")

    def merge(group: pa.Table) -> pa.Table:
        out = lww_reduce(group.drop_columns(["_part"]), key="user_id", order=("ts", "event_id"))
        return out.select(["user_id", "ts", "event_id", "event_type", "value"])

    return ds.groupby("_part").map_groups(merge, batch_format="pyarrow")


ORACLES["latest_event_per_user"] = """
SELECT user_id, ts, event_id, event_type, value FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) rn
  FROM events
) WHERE rn = 1
"""


def user_ingest_dates(sf_dir: str):
    """Min/max event time per key (A2 ingest-date enrichment,
    ``parse.py:92-109`` — done as one aggregate, not per-row SQL)."""
    ds = cm.read(sf_dir, "events", columns=["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", as_index=False).agg(
            original_ingest=("ts", "min"), current_ingest=("ts", "max")
        )
        return g

    partials = ds.map_batches(partial, batch_format="pandas")
    # distributed finish: the user_id key space grows with the data, so the
    # final min/max runs routed over the partials (one row per (block, user)
    # enters the shuffle), never a driver-side concat
    return cm.routed_grouped_agg(
        partials, ["user_id"],
        {"original_ingest": "min", "current_ingest": "max"},
    )


ORACLES["user_ingest_dates"] = """
SELECT user_id, MIN(ts) AS original_ingest, MAX(ts) AS current_ingest
FROM events GROUP BY user_id
"""


def event_type_dim_enrich(sf_dir: str):
    """Broadcast enrichment against an inline dimension (J7/M16
    ``crawler_info`` → display-name lookup): events per display name."""
    dim = pd.DataFrame(
        {
            "event_type": ["click", "view", "purchase", "login", "logout"],
            "display_name": ["Click", "Page View", "Purchase", "Log In", "Log Out"],
        }
    )
    dim_ref = cm.broadcast(dim)
    ds = cm.read(sf_dir, "events", columns=["event_type"])
    enriched = ds.map_batches(
        cm.BroadcastJoiner, fn_constructor_args=(dim_ref, "event_type", "left"),
        batch_format="pandas", concurrency=(1, cm.pool_size()),
    )

    def fill(df: pd.DataFrame) -> pd.DataFrame:
        df["display_name"] = df["display_name"].fillna("Unknown")
        return df

    enriched = enriched.map_batches(fill, batch_format="pandas")
    return cm.partial_groupby_sum(enriched, keys=["display_name"], sums={}, counts="n")


ORACLES["event_type_dim_enrich"] = """
WITH dim(event_type, display_name) AS (VALUES
  ('click','Click'), ('view','Page View'), ('purchase','Purchase'),
  ('login','Log In'), ('logout','Log Out'))
SELECT COALESCE(display_name, 'Unknown') AS display_name, COUNT(*) AS n
FROM events LEFT JOIN dim USING (event_type)
GROUP BY COALESCE(display_name, 'Unknown')
"""


def orders_top100_global_sort(sf_dir: str):
    """Distributed global sort + limit (§2.7 ordering guarantee analog —
    the changelog's sorted-prefix processing, ``common/utils/s3.py:494-504``
    — as a relational operator)."""
    ds = cm.read(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])
    return ds.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(100)


ORACLES["orders_top100_global_sort"] = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
"""


def top2_customers_per_nation(sf_dir: str):
    """Per-group top-k via groupby().map_groups — the A3/M8 within-group
    top-k generalized to a grouped operator."""
    ds = cm.read(sf_dir, "customer", columns=["c_nationkey", "c_custkey", "c_acctbal"])

    def top2(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["c_acctbal", "c_custkey"], ascending=[False, True]).head(2)

    return ds.groupby("c_nationkey").map_groups(top2, batch_format="pandas")


ORACLES["top2_customers_per_nation"] = """
SELECT c_nationkey, c_custkey, c_acctbal FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY c_nationkey
                               ORDER BY c_acctbal DESC, c_custkey) rn
  FROM customer
) WHERE rn <= 2
"""


def events_sliding_window(sf_dir: str):
    """Sliding 1-hour window, 30-minute slide: each event lands in two
    windows (flat-map fan-out + grouped count — the streaming-window shape
    of §2.10 expressed as batch operators)."""
    ds = cm.read(sf_dir, "events", columns=["ts"])

    def fan_out(df: pd.DataFrame) -> pd.DataFrame:
        w0 = df["ts"].dt.floor("30min")
        both = pd.concat(
            [w0, w0 - pd.Timedelta(minutes=30)], ignore_index=True
        ).to_frame("window_start")
        return both

    ds = ds.map_batches(fan_out, batch_format="pandas")
    return cm.partial_groupby_sum(ds, keys=["window_start"], sums={}, counts="n_events")


ORACLES["events_sliding_window"] = """
SELECT ws AS window_start, COUNT(*) AS n_events FROM (
  SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
                 time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws
  FROM events
) GROUP BY ws
"""


def docs_source_dispatch(sf_dir: str):
    """Per-type strategy dispatch (§2.11 parser registry / plugin API,
    ``section_parse/add_sections.py:5-27``): different transform per
    ``source`` value, applied vectorized per row-group within each batch."""
    from ..stages.registry import StrategyRegistry

    reg = StrategyRegistry(default=lambda g: g.assign(n_out=g["n_chars"]))

    @reg.register("src0")
    def double(g: pd.DataFrame) -> pd.DataFrame:
        return g.assign(n_out=g["n_chars"] * 2)

    @reg.register("src1")
    def negate(g: pd.DataFrame) -> pd.DataFrame:
        return g.assign(n_out=-g["n_chars"])

    ds = cm.read(sf_dir, "documents", columns=["doc_id", "source", "n_chars"])
    out = ds.map_batches(reg.make_stage("source"), batch_format="pandas")
    return out.select_columns(["doc_id", "n_out"])


ORACLES["docs_source_dispatch"] = """
SELECT doc_id,
       CASE source WHEN 'src0' THEN n_chars * 2
                   WHEN 'src1' THEN -n_chars
                   ELSE n_chars END AS n_out
FROM documents
"""


def docs_explode_words(sf_dir: str):
    """flat-map explode: one row per word (M3/M4 page/paragraph explode
    analog, ``common/document_parser/lib/pages.py:20-33``). Vectorized via
    np.repeat over split offsets — no per-row Python."""
    import numpy as np

    ds = cm.read(sf_dir, "documents", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        words = pc.split_pattern(t["text"], " ")
        if isinstance(words, pa.ChunkedArray):
            words = words.combine_chunks()
        lengths = pc.list_value_length(words).to_numpy(zero_copy_only=False)
        ids = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False), lengths)
        return pa.table({"doc_id": pa.array(ids, pa.int64()), "word": words.flatten()})

    return ds.map_batches(explode, batch_format="pyarrow")


ORACLES["docs_explode_words"] = """
SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
"""


def keywords_top3_per_doc(sf_dir: str):
    """Per-doc keyword top-k (M8, ``common/document_parser/lib/keywords.py:4-11``:
    count → sort desc → top-N), deterministic tie-break by word. A
    WITHIN-RECORD aggregate (each doc's words never cross rows), so explode
    + count + head all happen inside ONE map_batches — no shuffle."""
    ds = cm.read(sf_dir, "documents", columns=["doc_id", "text"])

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        exploded = df.assign(word=df["text"].str.split(" ")).explode("word")
        counts = (
            exploded.groupby(["doc_id", "word"], as_index=False, sort=False)
            .size()
            .rename(columns={"size": "n"})
        )
        counts = counts.sort_values(["doc_id", "n", "word"], ascending=[True, False, True])
        return counts.groupby("doc_id", sort=False).head(3)

    return ds.map_batches(topk, batch_format="pandas")


ORACLES["keywords_top3_per_doc"] = """
SELECT doc_id, word, n FROM (
  SELECT doc_id, word, COUNT(*) AS n,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY COUNT(*) DESC, word) rn
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY doc_id, word
) WHERE rn <= 3
"""


def source_staleness(sf_dir: str):
    """Staleness monitor (A9, ``gc_crawler_status_monitor/crawler_monitor.py:19-27``):
    latest event time + volume per event_type."""
    ds = cm.read(sf_dir, "events", columns=["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("event_type", as_index=False).agg(
            last_seen=("ts", "max"), n=("ts", "size")
        )

    partials = ds.map_batches(partial, batch_format="pandas").to_pandas()
    return partials.groupby("event_type", as_index=False).agg(
        last_seen=("last_seen", "max"), n=("n", "sum")
    )


ORACLES["source_staleness"] = """
SELECT event_type, MAX(ts) AS last_seen, COUNT(*) AS n
FROM events GROUP BY event_type
"""


def q6_forecast_revenue(sf_dir: str):
    """TPC-H-Q6-shaped filter + global sum — the pure scan-filter-aggregate
    path (prune at read, vectorized predicate, single-row result)."""
    ds = cm.read(
        sf_dir, "lineitem",
        columns=["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
    )
    lo, hi = pa.scalar(pd.Timestamp("1996-01-01")), pa.scalar(pd.Timestamp("1997-01-01"))

    def f(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(pc.greater_equal(t["l_shipdate"], lo), pc.less(t["l_shipdate"], hi)),
            pc.and_(
                pc.and_(
                    pc.greater_equal(t["l_discount"], pa.scalar(0.05)),
                    pc.less_equal(t["l_discount"], pa.scalar(0.07)),
                ),
                pc.less(t["l_quantity"], pa.scalar(24.0)),
            ),
        )
        t = t.filter(m)
        rev = pc.multiply(t["l_extendedprice"], t["l_discount"])
        return pa.table({"rev": rev})

    total = 0.0
    for b in ds.map_batches(f, batch_format="pyarrow").iter_batches(batch_format="pyarrow"):
        s = pc.sum(b["rev"]).as_py()
        total += s or 0.0
    return pd.DataFrame({"revenue": [total]})


ORACLES["q6_forecast_revenue"] = """
SELECT SUM(l_extendedprice * l_discount) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def events_asof_join(sf_dir: str):
    """AS-OF join (the operator the reference lacks — its latest-version
    semi-join J2 is the degenerate case): every 'error' event joined to
    the latest 'signup' event of the SAME user at-or-before it.

    HOT-KEY-SAFE composition — work units form per (user, DAY), never
    per user, so a hot key salts across days; shuffles are ROUTED (a few
    hundred groups, vectorized interiors), never per-key:

    1. per-batch combiner: max signup ts per (user, day) — one tiny row
       per (batch, user, day) enters the first shuffle;
    2. per-user prefix-max over the day summaries (vectorized
       groupby.cummax/ffill/shift inside user-routed tasks) emits one
       synthetic CARRY signup row per day: the latest signup of any
       strictly-earlier day;
    3. carry rows union with the real events; inside (user, day)-routed
       tasks a single ``pd.merge_asof(by=[user, day])`` matches every
       error to the latest same-day signup at-or-before it — an error
       earlier than its day's first real signup matches the carry row
       instead. Exact at any skew."""
    ds = cm.read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])
    ds = ds.map_batches(
        lambda t: t.filter(pc.is_in(t["event_type"], value_set=pa.array(["error", "signup"]))),
        batch_format="pyarrow",
    )
    COLS = ["event_id", "user_id", "ts", "event_type", "_bucket", "_route"]

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        b["_bucket"] = _day_bucket(b["ts"])
        b["_route"] = _route_of(b["user_id"], b["_bucket"])
        return b[COLS]

    ds = ds.map_batches(add_bucket, batch_format="pandas")

    def partial_last_signup(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(_sig_ts=b["ts"].where(b["event_type"] == "signup"))
        out = b.groupby(["user_id", "_bucket"], as_index=False, sort=False).agg(
            last_signup=("_sig_ts", "max")
        )
        out["_uroute"] = _route_of(out["user_id"])
        return out

    partials = ds.map_batches(partial_last_signup, batch_format="pandas")

    def carry_rows(g: pd.DataFrame) -> pd.DataFrame:
        # combine batch partials per (user, day), then per-user prefix-max
        # shifted by one day: the latest signup of any STRICTLY earlier
        # day (cummax leaves NaT rows NaT — it skips, not fills — so
        # ffill carries the running max through signup-free days)
        per_day = (
            g.groupby(["user_id", "_bucket"], as_index=False, sort=True)
            .agg(last_signup=("last_signup", "max"))
            .sort_values(["user_id", "_bucket"])
        )
        users = per_day.groupby("user_id", sort=False)["last_signup"]
        carry = users.cummax().groupby(per_day["user_id"], sort=False).ffill()
        carry = carry.groupby(per_day["user_id"], sort=False).shift(1)
        keep = carry.notna()
        n = int(keep.sum())
        return pd.DataFrame(
            {
                "event_id": np.full(n, -1, dtype="int64"),
                "user_id": per_day["user_id"][keep].to_numpy(),
                "ts": carry[keep].to_numpy(),
                # a length-n list, not a broadcast scalar: a scalar on a
                # zero-row frame makes Ray's block-size estimator error
                # ("cannot call vectorize on size 0 inputs") per group
                "event_type": ["signup"] * n,
                "_bucket": per_day["_bucket"][keep].to_numpy(),
            }
        )

    def carry_route(b: pd.DataFrame) -> pd.DataFrame:
        b["_route"] = _route_of(b["user_id"], b["_bucket"])
        return b[COLS]

    carries = (
        partials.groupby("_uroute")
        .map_groups(carry_rows, batch_format="pandas")
        .map_batches(carry_route, batch_format="pandas")
    )

    def asof_route(g: pd.DataFrame) -> pd.DataFrame:
        errors = g[g["event_type"] == "error"].sort_values("ts")
        logins = g[g["event_type"] == "signup"].sort_values("ts")
        if errors.empty:
            return pd.DataFrame(
                {"event_id": pd.Series([], dtype="int64"),
                 "user_id": pd.Series([], dtype="int64"),
                 "ts": pd.Series([], dtype="datetime64[us]"),
                 "login_ts": pd.Series([], dtype="datetime64[us]")}
            )
        right = logins[["user_id", "_bucket", "ts"]].assign(login_ts=logins["ts"])
        out = pd.merge_asof(
            errors[["event_id", "user_id", "_bucket", "ts"]],
            right,
            on="ts",
            by=["user_id", "_bucket"],
            direction="backward",
        )
        return out[["event_id", "user_id", "ts", "login_ts"]]

    return ds.union(carries).groupby("_route").map_groups(
        asof_route, batch_format="pandas"
    )


ORACLES["events_asof_join"] = """
SELECT e.event_id, e.user_id, e.ts, l.ts AS login_ts
FROM (SELECT * FROM events WHERE event_type = 'error') e
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') l
  ON e.user_id = l.user_id AND e.ts >= l.ts
"""


def events_range_join(sf_dir: str):
    """Range join: per 'signup' event, how many events of the same user
    land in the window [ts, ts + 30 min)? Per-group counting stays
    vectorized ``np.searchsorted`` — never the O(n²) cross product a
    naive range join implies.

    HOT-KEY-SAFE: work units form per (user, DAY). A window opening near
    the end of a day reaches into the next day, so every event within
    ``window`` of its day's start is ALSO emitted as a SHADOW row
    stamped with the previous day — countable in that day's work unit
    but never itself a signup emitter there (each real event is counted
    by exactly one unit per window). Requires window ≤ the salt bucket
    width (asserted).

    The shuffle is ROUTED (a few hundred groups); inside a route ONE
    composite-key ``np.searchsorted`` counts every window at once: rows
    sort by (key, ts) and encode to ``key_rank * SPAN + ts_offset``
    (SPAN > any in-route ts spread + window, so windows never cross key
    boundaries in the encoding)."""
    window = pd.Timedelta(minutes=30)
    window_us = window.value // 1000
    assert window <= pd.Timedelta(days=1), "shadow replication assumes window <= bucket"
    ds = cm.read(sf_dir, "events", columns=["event_id", "user_id", "ts", "event_type"])

    def add_bucket_and_shadows(b: pd.DataFrame) -> pd.DataFrame:
        b["_bucket"] = _day_bucket(b["ts"])
        b["_shadow"] = False
        near_start = (b["ts"] - b["ts"].dt.floor("D")) < window
        sh = b[near_start].copy()
        sh["_bucket"] -= 1
        sh["_shadow"] = True
        out = pd.concat([b, sh], ignore_index=True)
        out["_route"] = _route_of(out["user_id"], out["_bucket"])
        return out

    ds = ds.map_batches(add_bucket_and_shadows, batch_format="pandas")

    def count_route(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "_bucket", "ts"])
        ts_us = g["ts"].to_numpy().astype("datetime64[us]").astype("int64")
        off = ts_us - ts_us.min()
        key_rank = (
            g.groupby(["user_id", "_bucket"], sort=False).ngroup().to_numpy()
        )
        span = off.max() + window_us + 2
        if int(key_rank.max() + 1) * int(span) >= 2**62:  # pragma: no cover
            raise OverflowError(
                "route time-spread × key count exceeds the int64 encoding; "
                "raise common.NUM_ROUTES or tighten the salt bucket"
            )
        combined = key_rank * span + off
        is_login = (g["event_type"] == "signup") & ~g["_shadow"]
        q = combined[is_login.to_numpy()]
        lo = np.searchsorted(combined, q, side="left")
        hi = np.searchsorted(combined, q + window_us, side="left")
        logins = g[is_login]
        return pd.DataFrame(
            {
                "event_id": logins["event_id"].to_numpy(),
                "user_id": logins["user_id"].to_numpy(),
                "n_in_window": (hi - lo).astype("int64"),
            }
        )

    return ds.groupby("_route").map_groups(count_route, batch_format="pandas")


ORACLES["events_range_join"] = """
SELECT l.event_id, l.user_id, COUNT(*) AS n_in_window
FROM (SELECT * FROM events WHERE event_type = 'signup') l
JOIN events e ON e.user_id = l.user_id
            AND e.ts >= l.ts AND e.ts < l.ts + INTERVAL 30 MINUTE
GROUP BY l.event_id, l.user_id
"""


def q18_large_orders(sf_dir: str):
    """TPC-H-Q18-shaped HAVING: orders whose total lineitem quantity
    exceeds a threshold — combiner partial sums per orderkey, aggregate,
    post-aggregation filter (the HAVING clause as a plain filter over the
    aggregate), then a broadcast lookup of order metadata."""
    threshold = 300.0
    li = cm.read(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    # orderkey cardinality is fact-scale → distributed aggregate finish
    agg = cm.partial_groupby_sum(
        li, keys=["l_orderkey"], sums={"l_quantity": "sum_qty"}, driver_finish=False
    )
    # the HAVING filter runs distributed; only the tiny post-HAVING set
    # (rare orders over threshold) ever reaches the driver, then broadcasts
    big = agg.map_batches(
        lambda t: t.filter(pc.greater(t["sum_qty"], pa.scalar(threshold))),
        batch_format="pyarrow",
    ).to_pandas()
    big_ref = cm.broadcast(big)

    orders = cm.read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def enrich(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(big_ref)
        df = df.rename(columns={"o_orderkey": "l_orderkey"})
        return df.merge(b, on="l_orderkey")  # streaming semi-join+enrich

    out = orders.map_batches(enrich, batch_format="pandas").to_pandas()
    return out[["l_orderkey", "sum_qty", "o_custkey", "o_totalprice"]].sort_values(
        ["sum_qty", "l_orderkey"], ascending=[False, True]
    ).reset_index(drop=True)


ORACLES["q18_large_orders"] = """
SELECT l_orderkey, SUM(l_quantity) AS sum_qty, o_custkey, o_totalprice
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_orderkey, o_custkey, o_totalprice
HAVING SUM(l_quantity) > 300
ORDER BY sum_qty DESC, l_orderkey
"""


def q17_small_quantity_revenue(sf_dir: str):
    """TPC-H-Q17-shaped correlated scalar subquery: lineitems whose
    quantity is below 20% of their part's average quantity → revenue sum.
    Distributed plan: per-part average via combiner partials, the
    per-part thresholds broadcast (``ray.put`` once), then a streaming
    filter + global sum — the correlated subquery becomes a broadcast
    lookup, never a re-scan per row."""
    li = cm.read(sf_dir, "lineitem", columns=["l_partkey", "l_quantity", "l_extendedprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("l_partkey", as_index=False).agg(
            s=("l_quantity", "sum"), c=("l_quantity", "size")
        )

    # per-part thresholds stay DISTRIBUTED (key cardinality is unbounded):
    # combiner partials → routed distributed finish → size-adaptive join
    # back to lineitem (broadcasts while small, hash-shuffles at scale)
    thr = (
        cm.routed_grouped_agg(
            li.map_batches(partial, batch_format="pandas"),
            ["l_partkey"], {"s": "sum", "c": "sum"},
        )
        .map_batches(
            lambda df: pd.DataFrame(
                {"l_partkey": df["l_partkey"], "thr": 0.2 * df["s"] / df["c"]}
            ),
            batch_format="pandas",
        )
    )
    joined = adaptive_join(li, thr, on="l_partkey", num_buckets=32)
    filtered = joined.map_batches(
        lambda df: df[df["l_quantity"] < df["thr"]][["l_extendedprice"]],
        batch_format="pandas",
    )
    # in-cluster reduction — the driver receives one scalar
    total = float(filtered.sum("l_extendedprice") or 0.0)
    return pd.DataFrame({"avg_yearly": [total / 7.0]})


ORACLES["q17_small_quantity_revenue"] = """
SELECT SUM(l_extendedprice) / 7.0 AS avg_yearly
FROM lineitem l
WHERE l_quantity < (SELECT 0.2 * AVG(l_quantity) FROM lineitem
                    WHERE l_partkey = l.l_partkey)
"""


def events_running_total(sf_dir: str):
    """Running window aggregate: cumulative value per user in event-time
    order (the SUM OVER (PARTITION BY … ORDER BY …) shape) — ONE
    groupby(user) shuffle, per-group vectorized cumsum.

    Deliberately NOT day-salted like sessionize/as-of/range: a float
    cumsum is order-SENSITIVE, and the salted two-phase form (per-day
    sums + per-user carry) re-associates the additions, which can flip
    the 6-dp rounding against the serial SQL window. Per-user groups are
    the exactness contract here; for skewed keys at scale, compute
    running totals over integer measures with the distributed prefix-sum
    used by the packing pipeline (``tokens.py::_bucket_base_offsets``),
    where re-association is exact."""
    ds = cm.read(sf_dir, "events", columns=["event_id", "user_id", "ts", "value"])

    def running(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        return pd.DataFrame(
            {
                "event_id": g["event_id"],
                "user_id": g["user_id"],
                "running_value": g["value"].cumsum().round(6),
            }
        )

    return ds.groupby("user_id").map_groups(running, batch_format="pandas")


ORACLES["events_running_total"] = """
SELECT event_id, user_id,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 6) AS running_value
FROM events
"""


def events_running_total_int(sf_dir: str):
    """The SKEW-SAFE running total for INTEGER measures — the
    distributed prefix-sum alternative :func:`events_running_total`'s
    docstring names (integer addition re-associates exactly, so the
    salted two-phase form is available). No whole-user group ever
    forms:

    1. MAP-SIDE per-batch (user, day) partial sums of the measure
       (``m = event_id % 97 + 1``) — a combiner, not a shuffle: each
       batch emits at most its distinct user-days;
    2. ONE small groupby over the partials (route-of-user) finishes the
       day sums and takes each user's EXCLUSIVE prefix (≤ days-spanned
       rows per user, bounded regardless of volume) → one carry row per
       (user, day), stamped with that day's event route;
    3. the carry rows are UNIONed with the events and ONE routed
       groupby (route of (user, day)) delivers each carry to its day's
       rows — within-day cumsum + carry is the exact running value.

    One full-data exchange total (the float version's count) while
    still never forming a whole-user group — the 10^10-events-one-user
    case costs one day-bucket, exercised by the skew gate in
    tests/test_cluster.py's family. Carries ride the SAME exchange as
    the events (schema-aligned union) instead of a separate hash join:
    at any scale the carry side is |user-days|, noise next to the
    event volume it would otherwise co-shuffle."""
    ds = cm.read(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    _cols = ["event_id", "user_id", "ts", "m", "_bucket", "_route",
             "carry", "is_carry"]

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["m"] = (b["event_id"] % 97 + 1).astype("int64")
        b["_bucket"] = _day_bucket(b["ts"])
        b["_route"] = _route_of(b["user_id"], b["_bucket"])
        b["carry"] = np.int64(0)
        b["is_carry"] = False
        return b[_cols]

    events = ds.map_batches(prep, batch_format="pandas")

    def day_partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["m"] = (b["event_id"] % 97 + 1).astype("int64")
        b["_bucket"] = _day_bucket(b["ts"])
        out = (b.groupby(["user_id", "_bucket"], as_index=False, sort=False)
               .agg(day_m=("m", "sum")))
        out["_uroute"] = _route_of(out["user_id"])
        return out

    partials = ds.map_batches(day_partial, batch_format="pandas")

    def carry_route(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.groupby(["user_id", "_bucket"], as_index=False, sort=False)
             .agg(day_m=("day_m", "sum")))
        g = g.sort_values(["user_id", "_bucket"])
        run = g.groupby("user_id", sort=False)["day_m"].cumsum()
        out = pd.DataFrame(
            {"event_id": np.int64(-1),
             "user_id": g["user_id"].astype("int64"),
             "ts": pd.Timestamp(0),
             "m": np.int64(0),
             "_bucket": g["_bucket"].astype("int64"),
             "_route": _route_of(g["user_id"], g["_bucket"]),
             "carry": (run - g["day_m"]).astype("int64").to_numpy(),
             "is_carry": True}
        )
        return out[_cols]

    carries = partials.groupby("_uroute").map_groups(
        carry_route, batch_format="pandas")

    def finish(g: pd.DataFrame) -> pd.DataFrame:
        c = g[g["is_carry"]]
        e = g[~g["is_carry"]]
        if e.empty:
            return pd.DataFrame(
                {"event_id": pd.Series(dtype="int64"),
                 "user_id": pd.Series(dtype="int64"),
                 "running_m": pd.Series(dtype="int64")})
        e = e.sort_values(["user_id", "_bucket", "ts", "event_id"])
        run = e.groupby(["user_id", "_bucket"], sort=False)["m"].cumsum()
        cmap = c.set_index(["user_id", "_bucket"])["carry"]
        carry = cmap.reindex(
            pd.MultiIndex.from_arrays([e["user_id"], e["_bucket"]])
        ).fillna(0).to_numpy()
        return pd.DataFrame(
            {"event_id": e["event_id"].to_numpy(),
             "user_id": e["user_id"].to_numpy(),
             "running_m": (run.to_numpy() + carry).astype("int64")}
        )

    return events.union(carries).groupby("_route").map_groups(
        finish, batch_format="pandas")


ORACLES["events_running_total_int"] = """
SELECT event_id, user_id,
       CAST(SUM(event_id % 97 + 1) OVER (PARTITION BY user_id
            ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS running_m
FROM events
"""


def events_rollup(sf_dir: str):
    """ROLLUP / grouping-sets shape: per-(day, event_type) counts plus
    per-day subtotals plus the grand total — one pass of per-batch
    partials at the finest grain, coarser grains derived from the finest
    aggregate (never re-scanning the input)."""
    ds = cm.read(sf_dir, "events", columns=["ts", "event_type"])

    def prep(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"day": df["ts"].dt.floor("D"), "event_type": df["event_type"]})

    ds = ds.map_batches(prep, batch_format="pandas")
    fine = cm.partial_groupby_sum(ds, keys=["day", "event_type"], sums={}, counts="n")
    by_day = fine.groupby("day", as_index=False)["n"].sum().assign(event_type=None)
    # dtypes pinned to the finest grain's so the all-NA subtotal rows don't
    # trip pandas' concat dtype inference (FutureWarning, behavior change)
    by_day = by_day.astype({"event_type": fine["event_type"].dtype})
    total = pd.DataFrame({
        "day": pd.Series([pd.NaT], dtype=fine["day"].dtype),
        "event_type": pd.Series([None], dtype=fine["event_type"].dtype),
        "n": pd.Series([fine["n"].sum()], dtype=fine["n"].dtype),
    })
    out = pd.concat([fine, by_day, total], ignore_index=True)
    return out[["day", "event_type", "n"]]


ORACLES["events_rollup"] = """
SELECT date_trunc('day', ts) AS day, event_type, COUNT(*) AS n
FROM events GROUP BY ROLLUP (date_trunc('day', ts), event_type)
"""


def events_date_features(sf_dir: str):
    """Canonical-format round-trip + calendar features (§2.9 date library:
    ``common/utils/parsers.py:6-41`` permissive parse, ``common/utils/
    s3.py:34`` canonical ``%Y-%m-%dT%H:%M:%S``): format each event ts to
    the canonical string, re-parse it (strict), and derive calendar
    fields — all vectorized pyarrow.compute."""
    from ..functions.dates import CANONICAL_FORMAT

    ds = cm.read(sf_dir, "events", columns=["event_id", "ts"])

    def fn(t: pa.Table) -> pa.Table:
        # Arrow's %S renders subseconds per the TYPE unit; the canonical
        # format is whole-second, so cast to timestamp[s] first (DuckDB's
        # %S truncates natively)
        secs = pc.cast(t["ts"], pa.timestamp("s"), safe=False)
        canon = pc.strftime(secs, format=CANONICAL_FORMAT)
        back = pc.strptime(canon, format=CANONICAL_FORMAT, unit="us")
        return pa.table(
            {
                "event_id": t["event_id"],
                "ts_canonical": canon,
                "ts_reparsed": back,
                "year": pc.year(t["ts"]),
                "month": pc.month(t["ts"]),
                "day": pc.day(t["ts"]),
                "hour": pc.hour(t["ts"]),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


ORACLES["events_date_features"] = """
SELECT event_id,
       strftime(ts, '%Y-%m-%dT%H:%M:%S') AS ts_canonical,
       strptime(strftime(ts, '%Y-%m-%dT%H:%M:%S'), '%Y-%m-%dT%H:%M:%S') AS ts_reparsed,
       CAST(year(ts) AS BIGINT) AS year, CAST(month(ts) AS BIGINT) AS month,
       CAST(day(ts) AS BIGINT) AS day, CAST(hour(ts) AS BIGINT) AS hour
FROM events
"""


def q5_local_supplier_volume(sf_dir: str):
    """TPC-H-Q5-shaped multi-join. Only the GENUINE dims (nation/region —
    fixed 25/5 rows) are broadcast; customer and supplier are fact-scale
    and go through size-adaptive joins (broadcast while the filtered side
    is small, partitioned hash join at scale). Revenue sums in exact
    scaled-int arithmetic (see q1) so the grouped totals are bit-stable
    under any partition order."""
    region = cm.read_arrow(sf_dir, "region").to_pandas()
    nation = cm.read_arrow(sf_dir, "nation").to_pandas()
    asia = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    asia = asia[asia["r_name"] == "ASIA"][["n_nationkey", "n_name"]]
    nat_ref = cm.broadcast(dict(zip(asia["n_nationkey"], asia["n_name"])))

    # customers in an ASIA nation → (o_custkey, cust_nation)
    cust = cm.read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def c_prep(df: pd.DataFrame) -> pd.DataFrame:
        nat = ray.get(nat_ref)
        df = df[df["c_nationkey"].isin(nat)]
        return pd.DataFrame({"o_custkey": df["c_custkey"], "cust_nation": df["c_nationkey"]})

    cust = cust.map_batches(c_prep, batch_format="pandas")

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1998-01-01")
    orders = cm.read(sf_dir, "orders", columns=["o_orderkey", "o_custkey", "o_orderdate"])

    def o_prep(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["o_orderdate"] >= lo) & (df["o_orderdate"] < hi)]
        return pd.DataFrame({"l_orderkey": df["o_orderkey"], "o_custkey": df["o_custkey"]})

    orders = orders.map_batches(o_prep, batch_format="pandas")
    oc = adaptive_join(orders, cust, on="o_custkey", num_buckets=16)
    oc = oc.map_batches(lambda df: df[["l_orderkey", "cust_nation"]], batch_format="pandas")

    # suppliers in an ASIA nation → (l_suppkey, supp_nation)
    supp = cm.read(sf_dir, "supplier", columns=["s_suppkey", "s_nationkey"])

    def s_prep(df: pd.DataFrame) -> pd.DataFrame:
        nat = ray.get(nat_ref)
        df = df[df["s_nationkey"].isin(nat)]
        return pd.DataFrame({"l_suppkey": df["s_suppkey"], "supp_nation": df["s_nationkey"]})

    supp = supp.map_batches(s_prep, batch_format="pandas")

    li = cm.read(
        sf_dir, "lineitem",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def l_prep(t: pa.Table) -> pa.Table:
        pcents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        dcents = pc.cast(pc.round(pc.multiply(t["l_discount"], pa.scalar(100.0))), pa.int64())
        rev_c = pc.multiply(pcents, pc.subtract(pa.scalar(100, pa.int64()), dcents))  # 1e-4 units
        return pa.table(
            {"l_orderkey": t["l_orderkey"], "l_suppkey": t["l_suppkey"], "rev_c": rev_c}
        )

    li = li.map_batches(l_prep, batch_format="pyarrow")
    ls = adaptive_join(li, supp, on="l_suppkey", num_buckets=16)
    ls = ls.map_batches(
        lambda df: df[["l_orderkey", "supp_nation", "rev_c"]], batch_format="pandas"
    )

    joined = adaptive_join(ls, oc, on="l_orderkey", num_buckets=16)

    def local_only(df: pd.DataFrame) -> pd.DataFrame:
        nat = ray.get(nat_ref)
        df = df[df["supp_nation"] == df["cust_nation"]]
        return pd.DataFrame({"n_name": df["supp_nation"].map(nat), "rev_c": df["rev_c"]})

    joined = joined.map_batches(local_only, batch_format="pandas")
    out = cm.partial_groupby_sum(joined, keys=["n_name"], sums={"rev_c": "rev_c"})
    return pd.DataFrame({"n_name": out["n_name"], "revenue": out["rev_c"] / 10000.0})


ORACLES["q5_local_supplier_volume"] = """
SELECT n_name,
       SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) / 10000.0 AS revenue
FROM customer JOIN orders   ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation   ON c_nationkey = n_nationkey
              JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND s_nationkey = c_nationkey
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""

"""Hot-key skew gate for the per-key windowed operators (VERDICT round-2
item 9): one user with 10^6 events must flow through sessionize / as-of
join / range join without ever forming a whole-user group — the day-salt
bounds groups to (user, day) — and the results must stay EXACT vs the
same DuckDB SQL the driver uses."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from gamechanger_data_ray.pipelines.relational import (
    ORACLES,
    events_asof_join,
    events_range_join,
    events_running_total_int,
    events_sessionize,
)
from tests.util_oracle import compare

N_HOT = 1_000_000


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    """Synthetic events table: user 0 fires 10^6 events across 30 days
    (zipf-free worst case — ONE key owns ~99.7% of the table) plus three
    normal users; deterministic inter-arrival times straddle the 30-min
    session gap and the day boundaries so every merge path is exercised."""
    d = tmp_path_factory.mktemp("skew")
    rng = np.random.default_rng(7)
    base = np.datetime64("2024-01-01T00:00:00", "us")

    # hot user: mixed inter-arrivals (seconds to ~2h) so sessions split
    # within AND across days
    gaps_s = rng.choice([2.0, 40.0, 2400.0, 7200.0], size=N_HOT, p=[0.6, 0.3, 0.08, 0.02])
    hot_ts = base + (np.cumsum(gaps_s) * 1e6).astype("timedelta64[us]")
    # normal users: 1000 events each, hourly-ish
    cold = []
    for u in (1, 2, 3):
        t = base + (np.cumsum(rng.uniform(60, 5400, size=1000)) * 1e6).astype(
            "timedelta64[us]"
        )
        cold.append((np.full(1000, u), t))
    user_id = np.concatenate([np.zeros(N_HOT, np.int64)] + [c[0] for c in cold])
    ts = np.concatenate([hot_ts] + [c[1] for c in cold])
    n = len(user_id)
    event_type = rng.choice(
        np.array(["click", "error", "signup", "view"]), size=n, p=[0.5, 0.2, 0.1, 0.2]
    )
    t = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "user_id": pa.array(user_id),
            "ts": pa.array(ts),
            "event_type": pa.array(event_type),
            "value": pa.array(rng.uniform(0, 1, size=n)),
        }
    )
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


def test_sessionize_hot_key_exact(skew_dir):
    compare(events_sessionize, ORACLES["events_sessionize"], skew_dir)


def test_asof_join_hot_key_exact(skew_dir):
    compare(events_asof_join, ORACLES["events_asof_join"], skew_dir)


def test_range_join_hot_key_exact(skew_dir):
    compare(events_range_join, ORACLES["events_range_join"], skew_dir)


def test_running_total_int_hot_key_exact(skew_dir):
    """The integer running total's distributed prefix-sum path must
    survive the one-user-owns-the-table case with exact results — the
    whole point of the salted alternative to events_running_total."""
    compare(events_running_total_int, ORACLES["events_running_total_int"], skew_dir)

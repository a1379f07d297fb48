"""Universal-test-harness-shaped scenario (SURVEY.md §5): a full lifecycle
interleaving replay, revocation, rollback, vacuum and schema evolution —
the CDC conformance corpus of ``dev_tools/universal_test_harness/cli.py``
re-expressed over the synthetic changelog, with DuckDB as the serial
oracle at every checkpoint."""

from __future__ import annotations

import glob
import os

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from gamechanger_data_ray.core.changelog import write_changelog
from gamechanger_data_ray.core.reconcile import conform, unify_all
from gamechanger_data_ray.engine.cdc import (
    apply_revocation_sweep,
    replay,
    table_to_arrow,
)
from gamechanger_data_ray.engine.maintenance import restore, vacuum
from gamechanger_data_ray.state import manifest as mf


def oracle_upto(changelog_dir: str, epoch: int) -> pa.Table:
    files = [
        f
        for f in sorted(glob.glob(os.path.join(changelog_dir, "epoch=*", "*.parquet")))
        if int(f.split("epoch=")[1][:6]) <= epoch
    ]
    uni = unify_all([pq.read_schema(f) for f in files])
    ev = pa.concat_tables([conform(pq.read_table(f), uni) for f in files])
    con = duckdb.connect()
    con.register("ev", ev)
    cols = "doc_id, tokens, n_tok, source" + (", lang" if "lang" in uni.names else "")
    return con.sql(
        f"""SELECT {cols} FROM (
              SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                        ORDER BY lsn DESC, seq DESC) rn FROM ev)
            WHERE rn = 1 AND op <> 'D' ORDER BY doc_id"""
    ).arrow()


def payload(t: pa.Table, with_lang: bool) -> pa.Table:
    cols = ["doc_id", "tokens", "n_tok", "source"] + (["lang"] if with_lang else [])
    return t.select(cols)


def test_full_lifecycle(tmp_path):
    cd, td = str(tmp_path / "cl"), str(tmp_path / "tb")
    write_changelog(cd, num_epochs=6, events_per_epoch=1200, num_keys=250,
                    evolution=True, zipf_a=1.4)

    # 1) live tailing: first three epochs one at a time, checking
    #    convergence at each checkpoint
    for e in (1, 2, 3):
        replay(cd, td, num_partitions=4, up_to_epoch=e, epochs_per_commit=1)
        oracle = oracle_upto(cd, e)
        mine = payload(table_to_arrow(td), with_lang="lang" in oracle.schema.names)
        assert mine.cast(oracle.schema).equals(oracle), f"diverged at epoch {e}"

    # 2) catch-up batching: remaining epochs in one commit
    replay(cd, td, num_partitions=4)
    oracle6 = oracle_upto(cd, 6)
    assert payload(table_to_arrow(td), True).cast(oracle6.schema).equals(oracle6)

    # 3) revocation sweep: half the us_code docs disappear from the crawl
    state = table_to_arrow(td)
    us = [
        k for k, s in zip(state["doc_id"].to_pylist(), state["source"].to_pylist())
        if s == "us_code"
    ]
    keep = us[: len(us) // 2]
    sweep = apply_revocation_sweep(
        td, pd.DataFrame({"source": ["us_code"] * len(keep), "doc_id": keep}),
        epoch=10, num_partitions=4,
    )
    assert sweep.epoch_counters["deletes"] == len(us) - len(keep)
    after = set(table_to_arrow(td)["doc_id"].to_pylist())
    assert set(keep) <= after and not (set(us[len(us) // 2:]) & after)

    # 4) rollback the sweep (point-in-time restore), verify byte-identity
    restore(td, 6)
    assert payload(table_to_arrow(td), True).cast(oracle6.schema).equals(oracle6)

    # 5) roll forward again, vacuum, and confirm the live state survives
    restore(td, 10)
    rows_before = table_to_arrow(td)
    out = vacuum(td, keep_epochs=2)
    assert out["files_deleted"] >= 0
    assert table_to_arrow(td).equals(rows_before)

    # 6) lineage totals count every raw event exactly once — changelog
    #    events plus the sweep's synthesized tombstones
    files = sorted(glob.glob(os.path.join(cd, "epoch=*", "*.parquet")))
    n_raw = sum(pq.read_metadata(f).num_rows for f in files)
    assert (
        mf.load_current(td).totals["events_in"]
        == n_raw + sweep.epoch_counters["events_in"]
    )

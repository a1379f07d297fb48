"""Full-lifecycle story: snapshot bootstrap → changelog tail → drift
report → bounded scan → zone-map restamp → validate → training export.
One table, every stage consuming the previous stage's committed state —
the integration seams the per-feature tests can't see."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from gamechanger_data_ray.core.changelog import generate_epoch_table, write_changelog
from gamechanger_data_ray.engine.cdc import (
    bootstrap_table,
    read_table,
    replay,
    table_to_arrow,
)
from gamechanger_data_ray.engine.drift import drift_report
from gamechanger_data_ray.engine.maintenance import restamp_stats, validate_table
from gamechanger_data_ray.engine.training_export import (
    export_training,
    read_training_export,
)

P = 4
KEYS = 400  # sparse-enough changelog that some bootstrap rows stay untouched
SEED = 9


def test_lifecycle_story(tmp_path):
    snap, cl, tb, out = (str(tmp_path / p) for p in
                         ("snap.parquet", "cl", "tb", "chunks"))

    # 1. genesis snapshot: the alive payload rows of a synthetic epoch,
    #    one per key (same generator → same schema as the changelog)
    t = generate_epoch_table(0, 300, KEYS, seed=SEED)
    alive = t.filter(pc.not_equal(t["op"], pa.scalar("D")))
    import pandas as pd

    df = alive.to_pandas().drop_duplicates("doc_id", keep="last")
    snap_t = pa.Table.from_pandas(
        df.drop(columns=["op", "lsn", "seq"]), preserve_index=False
    ).cast(pa.schema([f for f in alive.schema if f.name not in ("op", "lsn", "seq")]))
    pq.write_table(snap_t, snap)
    m0 = bootstrap_table(snap, tb, num_partitions=P)
    assert m0.epoch == 0 and m0.totals["rows"] == snap_t.num_rows

    # 2. tail the changelog: epochs 1-2 update/delete over the same keys
    write_changelog(cl, num_epochs=2, events_per_epoch=150, num_keys=KEYS,
                    seed=SEED + 1)
    m2 = replay(cl, tb, num_partitions=P)
    assert m2.epoch == 2
    state = table_to_arrow(tb)
    assert state.num_rows > 0
    # bootstrap rows survive where the changelog never touched them
    assert pc.sum(pc.equal(state["lsn"], pa.scalar(0, pa.int64()))).as_py() > 0

    # 3. drift genesis → current: row movement observed, PSI finite
    rep = drift_report(tb, 0, 2, columns=["n_tok", "source"])
    assert rep["rows"]["from"] == snap_t.num_rows
    assert rep["rows"]["to"] == state.num_rows
    assert all(v["psi"] >= 0 for v in rep["columns"].values())

    # 4. bounded scan == exact filter of the full state
    med = int(pd.Series(state["n_tok"].to_pandas()).median())
    got = read_table(tb, bounds={"n_tok": (med, None)}).to_pandas()
    expect = state.to_pandas()
    expect = expect[expect["n_tok"] >= med]
    assert sorted(got["doc_id"]) == sorted(expect["doc_id"])

    # 5. restamp (no-op repair on healthy stats) → validate stays clean
    m3 = restamp_stats(tb)
    assert m3.rev == m2.rev + 1
    v = validate_table(tb)
    assert v["violations"] == {} and v["rows"] == state.num_rows

    # 6. training export over the final state: totals line up
    mk = export_training(tb, out, cap=64)
    assert mk["epoch"] == 2 and mk["docs"] == state.num_rows
    assert mk["total_tokens"] == int(pc.sum(state["n_tok"]).as_py())
    chunks = read_training_export(out).to_pandas()
    assert len(chunks) == mk["chunks"]
    assert int(chunks["n_tok"].sum()) == mk["total_tokens"]

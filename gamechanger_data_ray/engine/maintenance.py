"""Table maintenance: restore (point-in-time rollback), vacuum, and
portable export/import bundles.

Reference parity:
- ``restore``: snapshot backup/restore = re-point at an older state
  (``dataPipelines/gc_ingest/tools/snapshot/utils.py:180-257``); here every
  committed manifest IS a retained backup, so restore is a ``_CURRENT``
  pointer swap — the blue/green alias flip of
  ``gc_elasticsearch_publisher.py:157-172``.
- ``vacuum``: the reference's archive grows forever by design (timestamped
  load archive K2); a 10^10-event lake cannot. Vacuum deletes data files
  unreferenced by the current manifest and by the ``keep_epochs`` most
  recent manifests (the restore window), never touching anything a
  retained manifest still points at.
- ``export_table`` / ``import_table``: the DB/ES export-import jobs
  (``dataPipelines/gc_ingest/tools/db/utils.py:135-235``,
  ``dataPipelines/scripts/es_export.py`` / ``es_import.py``) as a
  self-contained bundle of the committed snapshot — data files + manifest
  + integrity footprint — movable between stores and re-importable as a
  fresh table. Export refuses an existing target (the idempotence fence
  of ``snapshot/utils.py:193-195``); import verifies the footprint.

Restore after vacuum: only epochs within the retained window are
restorable — restore refuses (clear error) if the target manifest is gone
or references vacuumed files.
"""

from __future__ import annotations

import json
import os
import shutil

from ..state import manifest as mf


def list_manifests(table_dir: str) -> list[int]:
    """Epochs with a retained manifest, ascending."""
    mdir = os.path.join(table_dir, mf.MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if name.startswith("manifest-") and name.endswith(".json"):
            out.append(int(name[len("manifest-") : -len(".json")]))
    return sorted(out)


def load_manifest(table_dir: str, epoch: int) -> mf.TableManifest:
    path = os.path.join(table_dir, mf.MANIFEST_DIR, f"manifest-{epoch:06d}.json")
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"no retained manifest for epoch {epoch} (have {list_manifests(table_dir)})"
        )
    with open(path) as f:
        return mf.TableManifest.from_json(f.read())


def restore(table_dir: str, epoch: int) -> mf.TableManifest:
    """Point the table back at an older committed epoch (pointer swap; the
    data files are immutable so this is O(1)). Fails clearly if the target
    manifest or any file it references has been vacuumed away."""
    target = load_manifest(table_dir, epoch)
    missing = [f for f in target.data_files(table_dir) if not os.path.exists(f)]
    if missing:
        raise FileNotFoundError(
            f"cannot restore epoch {epoch}: {len(missing)} data file(s) vacuumed, "
            f"e.g. {missing[0]}"
        )
    # direct pointer write: restore intentionally moves the table backwards,
    # so it bypasses the forward-only commit fence.
    mf._atomic_write(
        os.path.join(table_dir, mf.CURRENT_POINTER),
        json.dumps({"epoch": epoch, "manifest": f"manifest-{epoch:06d}.json"}),
    )
    return target


def vacuum(table_dir: str, keep_epochs: int = 2) -> dict:
    """Delete partition data files not referenced by the current manifest or
    the ``keep_epochs`` most recent retained manifests; drop manifests older
    than the window. Returns {files_deleted, bytes_freed, manifests_kept}."""
    current = mf.load_current(table_dir)
    if current is None:
        return {"files_deleted": 0, "bytes_freed": 0, "manifests_kept": []}
    epochs = list_manifests(table_dir)
    # retained window: everything >= the keep_epochs-th most recent, and
    # always the committed epoch (restore target safety)
    kept = sorted(set(epochs[-keep_epochs:]) | {current.epoch})
    referenced: set[str] = set()
    for e in kept:
        try:
            m = load_manifest(table_dir, e)
        except FileNotFoundError:
            continue
        referenced.update(os.path.abspath(p) for p in m.data_files(table_dir))

    deleted, freed = 0, 0
    for root, _dirs, files in os.walk(table_dir):
        base = os.path.basename(root)
        if not base.startswith("part="):
            continue
        for fname in files:
            p = os.path.abspath(os.path.join(root, fname))
            if fname.endswith(".parquet") and p not in referenced:
                freed += os.path.getsize(p)
                os.remove(p)
                deleted += 1
    for e in epochs:
        if e not in kept:
            os.remove(os.path.join(table_dir, mf.MANIFEST_DIR, f"manifest-{e:06d}.json"))

    # sweep staging debris from crashed/raced attempts of committed epochs
    # (a live attempt for a committed epoch is doomed to be fenced anyway,
    # but vacuum is a maintenance window, not a racing driver)
    staging_root = os.path.join(table_dir, "_staging")
    if os.path.isdir(staging_root):
        for name in os.listdir(staging_root):
            if not name.startswith("epoch-"):
                continue
            try:
                e = int(name.split("-")[1])
            except (IndexError, ValueError):
                continue
            if e <= current.epoch:
                shutil.rmtree(os.path.join(staging_root, name), ignore_errors=True)
    return {"files_deleted": deleted, "bytes_freed": freed, "manifests_kept": kept}


def repartition_table(
    table_dir: str, out_dir: str, new_partitions: int, exchange: str = "staged"
) -> mf.TableManifest:
    """Rewrite the committed table under a different hash-partition count
    — the cluster-resize path. The partition modulus is pinned per table
    (mixing state hashed at P with events hashed at P' silently
    duplicates keys, which is why ``apply_events_dataset`` always reuses
    the stored count); changing it is an explicit full rewrite into a
    fresh ``out_dir``, committed at the SAME checkpoint epoch so tailing
    resumes exactly where the source table stood. The source dir stays
    intact as the rollback copy (swap directories at the orchestration
    layer, the blue/green pattern of ``gc_elasticsearch_publisher.py:157-172``)."""
    from .cdc import apply_events_dataset, read_table

    current = mf.load_current(table_dir)
    if current is None:
        raise FileNotFoundError(f"no committed table at {table_dir}")
    if mf.load_current(out_dir) is not None:
        raise FileExistsError(f"repartition target already committed: {out_dir}")
    rows = read_table(table_dir)  # keeps op/lsn/seq/version_hash provenance
    m = apply_events_dataset(
        rows, out_dir, current.epoch, current.schema,
        num_partitions=new_partitions, exchange=exchange,
    )
    if m is None:
        raise RuntimeError(f"repartition commit fenced out at {out_dir}")
    return m


BUNDLE_MANIFEST = "_BUNDLE.json"


def export_table(table_dir: str, bundle_dir: str) -> dict:
    """Export the committed snapshot as a self-contained bundle:
    ``bundle_dir/part=*/data-*.parquet`` + the table manifest + a bundle
    footprint ``{epoch, files: {relpath: bytes}}``. Only the files the
    CURRENT manifest references are copied (history/extra epochs stay
    behind — the bundle is a snapshot, not the changelog). Refuses an
    existing target so a retried job can't silently clobber a good export."""
    current = mf.load_current(table_dir)
    if current is None:
        raise FileNotFoundError(f"no committed table at {table_dir}")
    if os.path.exists(bundle_dir):
        raise FileExistsError(
            f"export target already exists (idempotence fence): {bundle_dir}"
        )
    os.makedirs(bundle_dir)
    footprint: dict[str, int] = {}
    for p in current.partitions.values():
        rel = p["file"]
        src = os.path.join(table_dir, rel)
        dst = os.path.join(bundle_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copyfile(src, dst)
        footprint[rel] = os.path.getsize(dst)
    mf._atomic_write(
        os.path.join(bundle_dir, BUNDLE_MANIFEST),
        json.dumps(
            {"epoch": current.epoch, "files": footprint, "manifest": json.loads(current.to_json())},
            indent=1,
        ),
    )
    return {"epoch": current.epoch, "files": len(footprint), "bytes": sum(footprint.values())}


def import_table(bundle_dir: str, table_dir: str) -> mf.TableManifest:
    """Recreate a table from a bundle: verify every file in the footprint
    exists with the recorded size, copy data files into place, and commit
    the bundled manifest — the imported table is immediately replayable
    (the watermark carries over, so tailing resumes after the bundle's
    epoch). Refuses a target that already has a committed table."""
    if mf.load_current(table_dir) is not None:
        raise FileExistsError(f"import target already has a committed table: {table_dir}")
    with open(os.path.join(bundle_dir, BUNDLE_MANIFEST)) as f:
        bundle = json.load(f)
    for rel, size in bundle["files"].items():
        p = os.path.join(bundle_dir, rel)
        if not os.path.exists(p) or os.path.getsize(p) != size:
            raise ValueError(f"bundle integrity check failed for {rel}")
    os.makedirs(table_dir, exist_ok=True)
    for rel in bundle["files"]:
        dst = os.path.join(table_dir, rel)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copyfile(os.path.join(bundle_dir, rel), dst)
    manifest = mf.TableManifest.from_json(json.dumps(bundle["manifest"]))
    if not mf.commit(table_dir, manifest):
        raise RuntimeError(f"import commit fenced out at {table_dir}")
    return manifest


def validate_table(table_dir: str) -> dict:
    """Distributed schema + row-invariant validation of the committed
    snapshot — the reference's ``--verify`` JSON-schema gate
    (``common/document_parser/cli.py:75-81`` + ``validators/``) as a
    counting pass: every manifest-referenced file is read, conformed to
    the manifest schema (schema drift in old files surfaces here), and
    the row invariants are counted vectorized per partition:

    - ``len(tokens) == n_tok`` for payload rows
    - ``doc_id`` non-null and non-empty
    - committed rows carry ``op`` ∈ {I, U} (tombstones never land)
    - ``lsn >= 0`` and ``version_hash`` non-null for payload rows

    Driver sees O(P) partial rows (one per partition per block); payload
    never leaves the workers.
    """
    import re

    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data

    from ..core.reconcile import conform
    from ..state.fs import default_fs

    fs = default_fs(None)
    current = mf.load_current(table_dir, fs)
    if current is None or not current.partitions:
        return {"rows": 0, "violations": {}, "by_partition": {}}
    b64 = mf.schema_to_b64(current.schema)
    part_re = re.compile(r"part=(\d+)/")

    def check(t: pa.Table) -> pd.DataFrame:
        paths = t["path"].to_pylist()
        t = conform(t.drop_columns(["path"]), mf.schema_from_b64(b64))
        part = pd.Series([int(part_re.search(p).group(1)) for p in paths])
        ntok = pc.list_value_length(t["tokens"]).to_pandas().astype("float")
        n_tok_col = t["n_tok"].to_pandas().astype("float")
        doc = t["doc_id"].to_pandas()
        op = t["op"].to_pandas()
        lsn = t["lsn"].to_pandas()
        vh = t["version_hash"].to_pandas()
        viol = pd.DataFrame(
            {
                "part": part,
                "rows": 1,
                "ntok_mismatch": (ntok != n_tok_col).fillna(True).astype(int),
                "bad_doc_id": (doc.isna() | (doc == "")).astype(int),
                "bad_op": (~op.isin(["I", "U"])).astype(int),
                "bad_lsn": (lsn.isna() | (lsn < 0)).astype(int),
                "null_version_hash": vh.isna().astype(int),
            }
        )
        return viol.groupby("part", as_index=False).sum()

    files = current.data_files(table_dir)
    ds = ray.data.read_parquet(files, filesystem=fs.fs, include_paths=True)
    partials = ds.map_batches(check, batch_format="pyarrow").to_pandas()
    agg = partials.groupby("part").sum()
    viol_cols = [c for c in agg.columns if c != "rows"]
    totals = agg[viol_cols].sum()
    return {
        "rows": int(agg["rows"].sum()),
        "violations": {k: int(v) for k, v in totals.items() if v},
        "by_partition": {
            int(p): {k: int(r[k]) for k in viol_cols if r[k]}
            for p, r in agg.iterrows()
            if any(r[k] for k in viol_cols)
        },
    }

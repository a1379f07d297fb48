"""Standing subscriptions: derived state that follows a table's commits.

The reference orchestrates every publish imperatively — after an ingest
it re-runs the ES reindex, the Postgres view refresh, the neo4j reload
as separate pipeline steps (``gc_ingest/pipelines/core/cli.py:152-237``,
``create_views.sql``); forgetting one leaves a stale replica. Here a
table carries its derived state as declared SUBSCRIPTIONS — a JSON
registry under the table dir — and ``sync()`` brings every subscriber to
the table's committed epoch through the engine's existing incremental
paths (``views.refresh`` Z-set folds, ``diff.relay`` chained CDC). The
replay tail-loop calls ``sync`` after its commits, so downstream state
is maintained BY the ingest, not by a second pipeline someone must
remember to run.

Kinds:
- ``agg``   — grouped additive aggregate view (group_by + sums).
- ``inverted`` / ``ann`` / ``bm25`` — the maintained search indexes.
- ``relay`` — a downstream CDC table (table→table subscription).
- ``window`` — an event-time windowed view (watermark + lateness +
  triggers): the live tail-loop advances the watermark and fires
  finalized windows as part of the ingest itself.

Every kind's refresh is fenced + idempotent, so ``sync`` is crash-safe:
a killed sync reconverges on the next call, and a subscriber can never
move past (or double-apply) the source epoch. Declarations are plain
params (never code), so the registry reconstructs each ViewDef
deterministically — signature checks in the refreshers still refuse a
target dir built with different params.

Scale: ``sync`` adds O(changed partitions) per subscriber per commit —
the same cost the reference pays to reindex, minus the full-table scan.
"""

from __future__ import annotations

import json
import os

from ..state.fs import StorageAdapter, default_fs

SUBS_FILE = "_subscriptions.json"

_KINDS = ("agg", "inverted", "ann", "bm25", "relay", "neardup", "edges",
          "dedup", "training", "window")


def _subs_path(table_dir: str) -> str:
    return os.path.join(table_dir, SUBS_FILE)


def list_subscriptions(
    table_dir: str, fs: StorageAdapter | None = None
) -> list[dict]:
    fs = default_fs(fs)
    p = _subs_path(table_dir)
    if not fs.exists(p):
        return []
    return json.loads(fs.read_text(p))


def _norm(path: str) -> str:
    """Registry key for a target dir. normpath (NOT abspath): the path
    must stay meaningful to whatever StorageAdapter later resolves it —
    prefixing the local process CWD would corrupt subtree/object-store
    paths, and relative targets are resolved by the adapter at sync time
    exactly like every other engine path."""
    return os.path.normpath(path)


def _rewrite(
    table_dir: str, fs: StorageAdapter, edit, tries: int = 8
) -> list[dict]:
    """Read-modify-write of the registry with verify-and-converge: the
    write is an atomic rename, and a concurrent writer's registry is
    re-read and the edit re-applied until a read-back reflects it — two
    racing subscribes both survive (each edit is idempotent and keyed by
    target_dir), instead of last-write-wins dropping one."""
    for _ in range(tries):
        subs = edit(list_subscriptions(table_dir, fs))
        fs.makedirs(table_dir)
        fs.atomic_write_text(_subs_path(table_dir), json.dumps(subs, indent=1))
        if list_subscriptions(table_dir, fs) == subs:
            return subs
    raise RuntimeError(
        f"subscription registry for {table_dir!r} kept changing under "
        f"{tries} rewrite attempts"
    )


def subscribe(
    table_dir: str,
    kind: str,
    target_dir: str,
    params: dict | None = None,
    fs: StorageAdapter | None = None,
) -> list[dict]:
    """Register (idempotently, keyed by target_dir) a subscriber. Params
    by kind: agg → {group_by: [...], sums: {out: src}}; inverted/bm25 →
    {text_column, key_column}; ann → {dim, vec_column, key_column,
    n_planes, seed}; neardup → {tokens_column, key_column, k, seed};
    edges → {gazetteer: [token ids], tokens_column, key_column, source_column};
    relay → {num_partitions?, merge_policy?}."""
    fs = default_fs(fs)
    if kind not in _KINDS:
        raise ValueError(f"unknown subscription kind {kind!r}; one of {_KINDS}")
    if kind == "agg" and not (params or {}).get("group_by"):
        raise ValueError("agg subscription needs params.group_by")
    if kind == "edges" and not (params or {}).get("gazetteer"):
        raise ValueError("edges subscription needs params.gazetteer (token ids)")
    if kind == "ann" and not (params or {}).get("dim"):
        raise ValueError("ann subscription needs params.dim")
    if kind == "window" and not ((params or {}).get("ts_column")
                                 and (params or {}).get("width")):
        raise ValueError("window subscription needs params.ts_column + width")
    target = _norm(target_dir)
    if _norm(table_dir) == target:
        raise ValueError("a table cannot subscribe to itself")
    entry = {"kind": kind, "target_dir": target, "params": params or {}}

    def edit(subs: list[dict]) -> list[dict]:
        return [s for s in subs if s["target_dir"] != target] + [entry]

    return _rewrite(table_dir, fs, edit)


def unsubscribe(
    table_dir: str, target_dir: str, fs: StorageAdapter | None = None
) -> list[dict]:
    fs = default_fs(fs)
    target = _norm(target_dir)

    def edit(subs: list[dict]) -> list[dict]:
        return [s for s in subs if s["target_dir"] != target]

    return _rewrite(table_dir, fs, edit)


def subscriber_epoch(sub: dict, fs: StorageAdapter | None = None) -> int | None:
    """The source epoch a subscriber currently reflects (None = never
    synced) — kind-aware: most subscribers commit a manifest, the
    training view gates on its ``_TRAINING.json`` marker instead."""
    fs = default_fs(fs)
    if sub["kind"] == "training":
        from .training_view import load_marker

        m = load_marker(sub["target_dir"], fs)
        return None if m is None else int(m["epoch"])
    from ..state import manifest as mf

    t = mf.load_current(sub["target_dir"], fs)
    return None if t is None else int(t.epoch)


def _sync_one(table_dir: str, sub: dict, fs: StorageAdapter) -> dict:
    kind, target, p = sub["kind"], sub["target_dir"], dict(sub.get("params", {}))
    if kind == "relay":
        from .diff import relay

        r = relay(table_dir, target,
                  num_partitions=p.get("num_partitions"),
                  merge_policy=p.get("merge_policy", "rewrite"), fs=fs)
        return {"target": target, "kind": kind,
                "epoch": r["dst_epoch_after"], "mode": r["mode"]}
    if kind == "training":
        from .training_view import training_view_refresh

        marker = training_view_refresh(target, table_dir,
                                       cap=int(p.get("cap", 2048)),
                                       seed=int(p.get("seed", 0)),
                                       mixture=p.get("mixture"), fs=fs)
        return {"target": target, "kind": kind, "epoch": marker["epoch"],
                "repacked": marker.get("repacked", 0)}
    if kind == "window":
        from .window_view import EventWindowView, refresh_windowed

        view = EventWindowView(
            p["ts_column"], int(p["width"]),
            sums=dict(p.get("sums", {})),
            group_by=list(p.get("group_by", [])),
            lateness=int(p.get("lateness", 0)),
            slide=int(p["slide"]) if p.get("slide") else None,
        )
        m = refresh_windowed(view, target, table_dir,
                             num_partitions=p.get("num_partitions", 8), fs=fs)
        return {"target": target, "kind": kind,
                "epoch": m.epoch if m is not None else None,
                "mode": m.epoch_counters.get("mode") if m is not None else "current",
                "watermark_ts": (m.epoch_counters.get("watermark_ts")
                                 if m is not None else None),
                "late_rows": m.epoch_counters.get("late_rows", 0) if m else 0,
                "trigger_rows": m.epoch_counters.get("trigger_rows", 0) if m else 0}
    if kind == "bm25":
        from .search_index import bm25_refresh

        out = bm25_refresh(target, table_dir,
                           text_column=p.get("text_column", "text"),
                           key_column=p.get("key_column", "doc_id"),
                           num_partitions=p.get("num_partitions", 8), fs=fs)
        return {"target": target, "kind": kind, "epoch": out}
    from .views import ViewDef, inverted_index_view, refresh

    if kind == "agg":
        view = ViewDef(group_by=list(p["group_by"]),
                       sums=dict(p.get("sums", {})))
    elif kind == "inverted":
        view = inverted_index_view(p.get("text_column", "text"),
                                   p.get("key_column", "doc_id"))
    elif kind == "neardup":
        from .neardup_index import neardup_index_view

        view = neardup_index_view(tokens_column=p.get("tokens_column", "tokens"),
                                  key_column=p.get("key_column", "doc_id"),
                                  k=int(p.get("k", 5)),
                                  seed=int(p.get("seed", 1234)))
    elif kind == "dedup":
        from .dedup_index import content_index_view

        view = content_index_view(tokens_column=p.get("tokens_column", "tokens"),
                                  key_column=p.get("key_column", "doc_id"))
    elif kind == "edges":
        from .edge_view import typed_edge_view

        view = typed_edge_view([int(g) for g in p["gazetteer"]],
                               tokens_column=p.get("tokens_column", "tokens"),
                               key_column=p.get("key_column", "doc_id"),
                               source_column=p.get("source_column", "source"))
    else:  # ann
        from .ann_index import ann_index_view

        view = ann_index_view(int(p["dim"]),
                              vec_column=p.get("vec_column", "embedding"),
                              key_column=p.get("key_column", "doc_id"),
                              n_planes=int(p.get("n_planes", 8)),
                              seed=int(p.get("seed", 7)))
    m = refresh(view, target, table_dir,
                num_partitions=p.get("num_partitions", 8), fs=fs)
    return {"target": target, "kind": kind,
            "epoch": m.epoch if m is not None else None,
            "mode": m.epoch_counters.get("mode") if m is not None else "current"}


def sync(table_dir: str, fs: StorageAdapter | None = None) -> list[dict]:
    """Bring every subscriber to the table's committed epoch. Returns one
    status row per subscriber. Subscribers sync independently: a failure
    in one raises AFTER the others were attempted (so a single bad
    target can't starve the rest), and the failed one reconverges on the
    next sync."""
    fs = default_fs(fs)
    results, errors = [], []
    for sub in list_subscriptions(table_dir, fs):
        try:
            results.append(_sync_one(table_dir, sub, fs))
        except Exception as e:  # noqa: BLE001 — reported, then re-raised
            errors.append((sub["target_dir"], e))
            results.append({"target": sub["target_dir"],
                            "kind": sub["kind"], "error": str(e)})
    if errors:
        raise RuntimeError(
            f"{len(errors)} subscription(s) failed to sync "
            f"(others completed): {errors[0][0]}: {errors[0][1]}"
        ) from errors[0][1]
    return results

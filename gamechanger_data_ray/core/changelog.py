"""Deterministic synthetic changelog generator (seeded, numpy-vectorized).

Produces the epoch-directory layout of FIXTURES.md §F4, mirroring the
reference's checkpointed base directory
(``dataPipelines/gc_ingest/tools/checkpoint/README.md:5-9``,
``common/utils/s3.py:34-54``) and its universal-test-harness replay corpus
(four sequential timestamped batches re-uploading updated docs,
``dev_tools/universal_test_harness/cli.py:23-69``):

    out_dir/
      epoch=000001/ part-00000.parquet ... _MANIFEST.json   # ready marker
      epoch=000002/ ...

Event mix ≈ 70% insert / 25% update / 5% delete, plus duplicate deliveries
and out-of-order rows within an epoch (the (lsn, seq) order is NOT the file
row order). Optional zipf hot-key skew and schema-evolution epochs (F3:
column add, int widen, enum growth).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

READY_MARKER = "_MANIFEST.json"
EPOCH_PREFIX = "epoch="

SOURCES = np.array(["us_code", "dod_issuances", "navy", "dfar", "manual.ingest"])
EVOLVED_SOURCES = np.array(["us_code", "dod_issuances", "navy", "dfar", "manual.ingest", "rpa_upload"])
LANGS = np.array(["en", "es", "fr"])


def epoch_dir(base: str, epoch: int) -> str:
    return os.path.join(base, f"{EPOCH_PREFIX}{epoch:06d}")


def _tokens_list_array(rng: np.random.Generator, n_tok: np.ndarray, vocab: int = 50257) -> pa.ListArray:
    offsets = np.zeros(len(n_tok) + 1, dtype=np.int64)
    np.cumsum(n_tok, out=offsets[1:])
    values = rng.integers(0, vocab, size=int(offsets[-1]), dtype=np.int32)
    return pa.ListArray.from_arrays(pa.array(offsets, pa.int64()), pa.array(values, pa.int32()))


def generate_epoch_table(
    epoch: int,
    events_per_epoch: int,
    num_keys: int,
    seed: int = 42,
    zipf_a: float = 0.0,
    mean_tokens: int = 64,
    evolution: bool = False,
    dup_frac: float = 0.02,
    seq_offset: int = 0,
    chunk: int | None = None,
    partial_frac: float = 0.0,
) -> pa.Table:
    """One epoch's events as an Arrow table (deterministic in all args).

    ``chunk``/``seq_offset`` support generating one epoch as several
    independent sub-tables (distinct RNG streams, contiguous seq ranges) —
    a single Arrow list<int32> array caps at 2^31 token values, so epochs
    beyond ~10^9 tokens must be produced piecewise (``write_changelog``
    does this automatically).

    ``zipf_a > 1`` draws doc ids from a zipfian distribution → hot keys.
    ``evolution`` applies FIXTURES.md §F3 per epoch number:
      epoch >= 3 → adds nullable ``lang`` column (E1)
      epoch >= 4 → ``n_tok`` as int64 (E2) and new source enum value (E3)
    """
    import pyarrow.compute as pc

    ss = [seed, epoch] if chunk is None else [seed, epoch, chunk]
    rng = np.random.default_rng(np.random.SeedSequence(ss))
    n = events_per_epoch
    if zipf_a and zipf_a > 1.0:
        kidx = (rng.zipf(zipf_a, size=n) - 1) % num_keys
    else:
        kidx = rng.integers(0, num_keys, size=n)
    # op mix: keys whose index < 0.7*num_keys first appear as I in epoch 1;
    # simpler deterministic mix: 70/25/5 by draw.
    draw = rng.random(n)
    op = np.where(draw < 0.05, "D", np.where(draw < 0.30, "U", "I"))
    is_del = draw < 0.05
    lsn = np.full(n, epoch, dtype=np.int64)
    seq = np.arange(n, dtype=np.int64) + seq_offset
    n_tok = np.clip(rng.lognormal(np.log(mean_tokens), 0.6, size=n), 1, 4096).astype(np.int32)
    # partial images (coalesce-mode fixtures): drawn from an INDEPENDENT
    # rng stream so the main stream — and therefore partial_frac=0 output
    # — is bit-identical to before the feature existed. Each partial U
    # row drops tokens+n_tok OR source, never both.
    if partial_frac > 0:
        prng = np.random.default_rng(np.random.SeedSequence(ss + [104729]))
        is_u = op == "U"
        drop_tok = is_u & (prng.random(n) < partial_frac)
        drop_src = is_u & ~drop_tok & (prng.random(n) < partial_frac)
    else:
        drop_tok = drop_src = np.zeros(n, dtype=bool)
    # deletes (and token-dropping partials) carry no token payload:
    # zero-length + null mask built into the ListArray — never a post-hoc
    # if_else over the 10^8-value list column (that kernel dominated
    # generation wall time)
    tok_null = is_del | drop_tok
    tok_len = np.where(tok_null, 0, n_tok).astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(tok_len, out=offsets[1:])
    values = rng.integers(0, 50257, size=int(offsets[-1]), dtype=np.int32)
    evolved = evolution and epoch >= 4
    src_pool = EVOLVED_SOURCES if evolved else SOURCES
    src_idx = rng.integers(0, len(src_pool), size=n)
    lang_idx = rng.integers(0, len(LANGS), size=n) if evolution and epoch >= 3 else None

    # duplicate deliveries (verbatim re-emits) + out-of-order delivery,
    # fused into ONE gather index applied per column in numpy — no Arrow
    # take over the wide list column
    if dup_frac > 0 and n > 0:
        k = max(1, int(n * dup_frac))
        dup_idx = rng.integers(0, n, size=k)
        full_idx = np.concatenate([np.arange(n, dtype=np.int64), dup_idx])
    else:
        full_idx = np.arange(n, dtype=np.int64)
    perm = rng.permutation(len(full_idx))
    full_idx = full_idx[perm]

    # ragged gather of the token values in output order (vectorized)
    out_len = tok_len[full_idx]
    out_offsets = np.zeros(len(full_idx) + 1, dtype=np.int64)
    np.cumsum(out_len, out=out_offsets[1:])
    total = int(out_offsets[-1])
    pos = (
        np.repeat(offsets[full_idx], out_len)
        + np.arange(total, dtype=np.int64)
        - np.repeat(out_offsets[:-1], out_len)
    )
    out_values = values[pos]
    tok_null_out = tok_null[full_idx]
    tokens = pa.ListArray.from_arrays(
        pa.array(out_offsets, pa.int64()), pa.array(out_values, pa.int32()),
        mask=pa.array(tok_null_out),
    )

    # strings via Arrow C++ kernels (np.char is Python-loop slow at 10^7)
    kid = pa.array(kidx[full_idx], pa.int64())
    doc_id = pc.binary_join_element_wise(
        "doc-", pc.utf8_lpad(pc.cast(kid, pa.string()), 8, "0"), ""
    )
    # content hash: deterministic function of (doc_id, lsn, seq) — duplicates
    # of a delivery share it, distinct versions differ.
    vh = pc.binary_join_element_wise(
        doc_id,
        pc.cast(pa.array(lsn[full_idx]), pa.string()),
        pc.cast(pa.array(seq[full_idx]), pa.string()),
        "",
    )

    n_tok_out = pa.array(
        n_tok[full_idx].astype(np.int64 if evolved else np.int32),
        mask=tok_null_out,
    )
    cols: dict[str, pa.Array] = {
        "op": pa.array(op[full_idx]),
        "lsn": pa.array(lsn[full_idx]),
        "seq": pa.array(seq[full_idx]),
        "version_hash": vh,
        "doc_id": doc_id,
        "tokens": tokens,
        "n_tok": n_tok_out,
        "source": pa.array(src_pool[src_idx[full_idx]]),
    }
    if lang_idx is not None:
        cols["lang"] = pa.array(LANGS[lang_idx[full_idx]])
    if partial_frac > 0 and drop_src.any():
        # source is a short string column (n rows, not 10^8 values) — a
        # plain masked array swap is cheap here
        src_out = src_pool[src_idx[full_idx]]
        cols["source"] = pa.array(src_out, mask=drop_src[full_idx])
    return pa.table(cols)


def write_changelog(
    out_dir: str,
    num_epochs: int,
    events_per_epoch: int,
    num_keys: int,
    seed: int = 42,
    zipf_a: float = 0.0,
    mean_tokens: int = 64,
    evolution: bool = False,
    rows_per_file: int = 250_000,
    dup_frac: float = 0.02,
    partial_frac: float = 0.0,
) -> list[str]:
    """Write epoch directories (with ready markers); returns epoch dir paths.

    Idempotent: an epoch dir that already has its ready marker is skipped,
    so the generator itself is resumable.
    """
    paths = []
    for e in range(1, num_epochs + 1):
        d = epoch_dir(out_dir, e)
        paths.append(d)
        marker = os.path.join(d, READY_MARKER)
        if os.path.exists(marker):
            continue
        os.makedirs(d, exist_ok=True)
        # one Arrow list<int32> array caps at 2^31 values; large epochs are
        # generated as independent chunks (distinct RNG streams, contiguous
        # seq ranges) so memory stays ~one chunk and offsets never overflow
        _VAL_CAP = 1_200_000_000
        est_vals = events_per_epoch * max(1, mean_tokens) * 2
        n_chunks = max(1, -(-est_vals // _VAL_CAP))
        per_chunk = -(-events_per_epoch // n_chunks)
        files: list[str] = []
        events_total = 0
        fidx = 0
        for ci in range(n_chunks):
            rows = min(per_chunk, events_per_epoch - ci * per_chunk)
            if rows <= 0:
                break
            t = generate_epoch_table(
                e, rows, num_keys, seed=seed, zipf_a=zipf_a,
                mean_tokens=mean_tokens, evolution=evolution, dup_frac=dup_frac,
                partial_frac=partial_frac,
                seq_offset=ci * per_chunk,
                chunk=None if n_chunks == 1 else ci,
            )
            events_total += t.num_rows
            for i in range(0, t.num_rows, rows_per_file):
                fname = f"part-{fidx:05d}.parquet"
                pq.write_table(t.slice(i, rows_per_file), os.path.join(d, fname))
                files.append(fname)
                fidx += 1
        with open(marker + ".tmp", "w") as f:
            json.dump({"epoch": e, "files": files, "events": events_total}, f)
        os.replace(marker + ".tmp", marker)  # marker write is the visibility gate
    return paths


def ready_epochs(base: str, after: int = 0, fs=None) -> list[int]:
    """Epoch numbers under ``base`` with a ready marker, strictly greater
    than ``after``, ascending — the reference's 'process strictly-greater
    timestamps in order' rule (``checkpoint/utils.py:104-119``,
    ``common/utils/s3.py:494-504``). ``fs``: optional
    :class:`~gamechanger_data_ray.state.fs.StorageAdapter` (object-store
    changelogs); defaults to local."""
    from ..state.fs import default_fs

    fs = default_fs(fs)
    out = []
    for name in fs.listdir(base):
        if not name.startswith(EPOCH_PREFIX):
            continue
        try:
            e = int(name[len(EPOCH_PREFIX):])
        except ValueError:
            continue
        if e > after and fs.exists(os.path.join(base, name, READY_MARKER)):
            out.append(e)
    return sorted(out)


def prune_changelog(
    base: str,
    up_to_epoch: int | None = None,
    applied_tables: list[str] | None = None,
    fs=None,
) -> dict:
    """Changelog retention: delete epoch dirs that every consumer has
    durably applied — the archive-growth answer on the SOURCE side
    (``vacuum`` is the same answer on the table side; the reference's
    timestamped archive keeps everything, which a 10^10-event feed
    cannot).

    The bound is ``min(up_to_epoch, min(committed epoch of each table in
    applied_tables))`` — pass the consuming tables and pruning can never
    outrun a lagging consumer; a table that has applied nothing pins the
    changelog whole. Epochs are removed ascending, ready marker FIRST
    (an interrupted prune leaves a non-ready epoch dir, which every
    reader already ignores — never a half-readable epoch)."""
    from ..state.fs import default_fs

    fs = default_fs(fs)
    bound = up_to_epoch
    if applied_tables:
        from ..state import manifest as mf

        applied = [mf.committed_epoch(t, fs) for t in applied_tables]
        lag = min(applied)
        bound = lag if bound is None else min(bound, lag)
    if bound is None:
        raise ValueError("prune needs up_to_epoch and/or applied_tables")
    removed = []
    for name in sorted(fs.listdir(base)):
        if not name.startswith(EPOCH_PREFIX):
            continue
        try:
            e = int(name[len(EPOCH_PREFIX):])
        except ValueError:
            continue
        if e > bound:
            continue
        d = os.path.join(base, name)
        if fs.exists(os.path.join(d, READY_MARKER)):
            fs.rm(os.path.join(d, READY_MARKER))  # unpublish first (atomic)
            removed.append(e)
        # a marker-less dir ≤ bound is debris from an interrupted prune (or
        # an abandoned producer attempt below the applied watermark) —
        # readers never saw it; sweep it either way
        fs.rmtree(d)
    return {"pruned_epochs": removed, "bound": int(bound)}

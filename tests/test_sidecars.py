"""Sidecar attachment (J1 stem join → read-time columns) + JSONL source."""

from __future__ import annotations

import json
import os

from gamechanger_data_ray.sources.sidecars import (
    attach_metadata_sidecars,
    read_crawler_jsonl,
    read_metadata_sidecar,
)


def test_read_metadata_sidecar_permissive(tmp_path):
    good = tmp_path / "a.metadata"
    good.write_text('{"doc_title": "T", "version_hash": "vh"}')
    assert read_metadata_sidecar(str(good))["doc_title"] == "T"
    bad = tmp_path / "b.metadata"
    bad.write_text("{not json")
    assert read_metadata_sidecar(str(bad)) == {}
    assert read_metadata_sidecar(str(tmp_path / "missing.metadata")) == {}


def test_attach_metadata_sidecars(tmp_path):
    (tmp_path / "doc1.txt").write_bytes(b"hello")
    (tmp_path / "doc1.txt.metadata").write_text(
        json.dumps({"doc_title": "One", "version_hash": "v1", "crawler_used": "c"})
    )
    (tmp_path / "doc2.txt").write_bytes(b"world")  # no sidecar → nulls

    ds = attach_metadata_sidecars(
        str(tmp_path),
        file_extensions=["txt"],
        fields=["doc_title", "version_hash", "crawler_used"],
    )
    rows = {r["doc_name"]: r for r in ds.take_all()}
    assert rows["doc1.txt"]["doc_title"] == "One"
    assert rows["doc1.txt"]["bytes"] == b"hello"
    assert rows["doc2.txt"]["doc_title"] is None


def test_read_crawler_jsonl_skips_bad_lines(tmp_path):
    p = tmp_path / "crawl.jsonl"
    p.write_text(
        '{"source": "s1", "doc_id": "a"}\n'
        "NOT JSON\n"
        '{"source": "s1", "doc_id": "b"}\n'
    )
    ds, bad = read_crawler_jsonl(str(p))
    assert bad == 1
    assert sorted(r["doc_id"] for r in ds.take_all()) == ["a", "b"]

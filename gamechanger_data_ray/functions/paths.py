"""Path / prefix scalar helpers (§2.9 path/url family —
``common/utils/s3.py:60-87,448-457`` analogs, storage-scheme agnostic).

The reference's checkpointed ingest keys everything off timestamped
prefixes (``.../2021-09-01T00:00:00/``); the new engine keys off numeric
epoch dirs (``epoch=000042/``) — both parsers live here so external
archives written either way can be enumerated and ordered.
"""

from __future__ import annotations

import posixpath
import re
from datetime import datetime

_TS_PREFIX = re.compile(r"(\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2})/?$")
_EPOCH_PREFIX = re.compile(r"epoch=(\d+)/?$")


def path_join(*parts: str) -> str:
    """Join path fragments with single slashes regardless of trailing /
    noise (``s3.py::path_join`` semantics; POSIX-style, works for object
    store keys and local paths)."""
    cleaned = [p.strip("/") for p in parts if p and p.strip("/")]
    lead = "/" if parts and parts[0].startswith("/") else ""
    return lead + posixpath.join(*cleaned) if cleaned else lead


def format_as_prefix(path: str) -> str:
    """Ensure exactly one trailing slash (``s3.py::format_as_prefix``)."""
    return path.rstrip("/") + "/"


def parse_timestamped_prefix(prefix: str) -> datetime | None:
    """Extract the timestamp from a checkpoint prefix like
    ``raw/2021-09-01T00:00:00/`` — None if the prefix isn't timestamped
    (``s3.py:448-457`` parse; the reference sorts prefixes by this)."""
    m = _TS_PREFIX.search(prefix)
    if not m:
        return None
    try:
        return datetime.strptime(m.group(1), "%Y-%m-%dT%H:%M:%S")
    except ValueError:
        return None


def parse_epoch_prefix(prefix: str) -> int | None:
    """Extract the epoch number from an ``epoch=NNNNNN/`` changelog dir —
    the new engine's ordering key (``core/changelog.py`` layout)."""
    m = _EPOCH_PREFIX.search(prefix)
    return int(m.group(1)) if m else None

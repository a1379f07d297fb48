"""Golden digests for the synthetic changelog generator: every bench and
fixture in this repo assumes `generate_epoch_table` is a pure function of
its arguments — an accidental RNG-stream change would silently invalidate
recorded BASELINE numbers and cross-round comparisons. These digests pin
the exact bytes (IPC-serialized) for representative configs; update them
ONLY with an explicit note in BASELINE.md that fixture content changed."""

from __future__ import annotations

import hashlib
import io

import pyarrow.ipc as ipc
import pytest

from gamechanger_data_ray.core.changelog import generate_epoch_table

GOLDEN = {
    "plain": (dict(), "8d2c7a00e9eaf1d0"),
    "zipf": (dict(zipf_a=1.3), "daa26dfd62b69b20"),
    "evolution": (dict(evolution=True), "f082d20efd89c91a"),
    "partial": (dict(partial_frac=0.5), "9da66b6037ca5c7f"),
}


@pytest.mark.parametrize("name", sorted(GOLDEN))
def test_generator_bytes_are_pinned(name):
    kwargs, expect = GOLDEN[name]
    t = generate_epoch_table(3, 2000, 400, seed=13, **kwargs)
    sink = io.BytesIO()
    with ipc.new_stream(sink, t.schema) as w:
        w.write_table(t.combine_chunks())
    assert hashlib.sha256(sink.getvalue()).hexdigest()[:16] == expect

"""Strategy registry (§2.11 plugin surface) and dead-letter (M21) tests."""

from __future__ import annotations

import pandas as pd
import pytest

from gamechanger_data_ray.stages.deadletter import (
    DLQ_COLUMN,
    split_dead_letters,
    with_dead_letter,
)
from gamechanger_data_ray.stages.registry import StrategyRegistry


def test_registry_dispatch_and_default():
    reg = StrategyRegistry(default=lambda g: g.assign(out=0))

    @reg.register("a")
    def _a(g):
        return g.assign(out=g["x"] * 10)

    df = pd.DataFrame({"k": ["a", "b", "a"], "x": [1, 2, 3]})
    out = reg.make_stage("k")(df).sort_values("x")
    assert out["out"].tolist() == [10, 0, 30]


def test_registry_path_plugin():
    reg = StrategyRegistry()
    reg.register_path("j", "json::dumps")  # any module::func resolves
    assert "j" in reg.strategies()
    with pytest.raises(ValueError, match="module::func"):
        reg.register_path("bad", "no_separator")


def test_dead_letter_isolates_poison_rows():
    def transform(df: pd.DataFrame) -> pd.DataFrame:
        if (df["x"] == 3).any():
            raise ValueError("poison value 3")
        return df.assign(y=df["x"] * 2)

    wrapped = with_dead_letter(transform)
    out = wrapped(pd.DataFrame({"x": [1, 2, 3, 4]}))
    good, dead = split_dead_letters(out)
    assert good["x"].tolist() == [1, 2, 4]
    assert good["y"].tolist() == [2, 4, 8]
    assert dead["x"].tolist() == [3]
    assert "poison value 3" in dead[DLQ_COLUMN].iloc[0]


def test_dead_letter_fast_path_untouched():
    wrapped = with_dead_letter(lambda df: df.assign(y=1))
    out = wrapped(pd.DataFrame({"x": [1, 2]}))
    good, dead = split_dead_letters(out)
    assert len(good) == 2 and len(dead) == 0

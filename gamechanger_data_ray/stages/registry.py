"""Per-type strategy registry — the user-extension surface.

Reference parity: the section-parser strategy factory dispatching by doc
type (``common/document_parser/lib/section_parse/add_sections.py:5-27``,
``parsers/parser_factory.py``) and the ``--parser-path "module::func"``
plugin hook (``common/document_parser/process.py:33-71``). Here a plugin
is any callable registered for a dispatch-key value; the stage applies the
right one per row-group inside a vectorized batch (group by key within the
batch — no shuffle, no per-row dispatch)."""

from __future__ import annotations

from typing import Callable

import pandas as pd


class StrategyRegistry:
    """Maps dispatch-key values → batch transform callables.

    Register with ``@registry.register("dod")`` or
    ``registry.register_path("pkg.mod::fn")`` (the reference's
    ``module::func`` plugin syntax). Unregistered values fall back to the
    default strategy."""

    def __init__(self, default: Callable[[pd.DataFrame], pd.DataFrame] | None = None):
        self._strategies: dict[str, Callable] = {}
        self._default = default if default is not None else (lambda df: df)

    def register(self, key: str):
        def deco(fn):
            self._strategies[key] = fn
            return fn

        return deco

    def register_path(self, key: str, path: str) -> None:
        """``module.sub::func`` dynamic resolution (``process.py:33-71``)."""
        import importlib

        mod_name, _, fn_name = path.partition("::")
        if not fn_name:
            raise ValueError(f"plugin path must be 'module::func', got {path!r}")
        fn = getattr(importlib.import_module(mod_name), fn_name)
        self._strategies[key] = fn

    def strategies(self) -> dict[str, Callable]:
        return dict(self._strategies)

    def make_stage(self, key_col: str):
        """A map_batches fn dispatching each batch's row-groups to their
        strategy (vectorized per group; dispatch cost O(distinct keys))."""
        strategies = dict(self._strategies)
        default = self._default

        def stage(batch: pd.DataFrame) -> pd.DataFrame:
            parts = []
            for key, group in batch.groupby(key_col, sort=False):
                fn = strategies.get(key, default)
                parts.append(fn(group))
            if not parts:
                return batch
            return pd.concat(parts, ignore_index=True)

        return stage

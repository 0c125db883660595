"""script — the packaged escape-hatch transform (≙ the reference's lua VM).

Parity: reference src/transforms/lua/mod.rs + lib/vector-core/src/transform/
runtime_transform/mod.rs:25-52 expose a scripting hook with ``init`` /
``process(event, emit)`` / ``shutdown`` lifecycle. Rebuilding a row-at-a-
time scripting VM on Spark would put interpreted Python in the hot path for
no gain — the engine-native analog is an Arrow-BATCH hook: user code
receives whole pandas DataFrames (vectorizable), with the same lifecycle:

- ``init()`` runs once per task (partition), its return value is threaded
  into every ``process`` call — connection setup, compiled regexes, model
  handles (≙ lua ``hooks.init``);
- ``process(pdf, state) -> pdf`` runs per Arrow batch (≙ ``hooks.process``,
  but batched — emit 0..n rows by returning a different-length frame);
- ``shutdown(state)`` runs after the last batch (≙ ``hooks.shutdown``).

Memory stays bounded by the Arrow batch size regardless of partition size
(same iterator contract as dataprep/multimodal.py).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame


def script_transform(
    df: DataFrame,
    process: Callable[[pd.DataFrame, Any], pd.DataFrame],
    init: Callable[[], Any] | None = None,
    shutdown: Callable[[Any], None] | None = None,
    schema: str | None = None,
) -> DataFrame:
    """Run a batched user hook over every Arrow batch of every partition.

    ``schema``: DDL string of the OUTPUT when ``process`` changes the
    shape; defaults to the input schema (in-place event mutation, the
    common lua-transform case).
    """
    out_schema = schema or df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        state = init() if init is not None else None
        try:
            for pdf in batches:
                out = process(pdf, state)
                if out is not None and len(out):
                    yield out
        finally:
            if shutdown is not None:
                shutdown(state)

    return df.mapInPandas(run, out_schema)

"""Custom stateful streaming operators via ``applyInPandasWithState``.

Flux's ``stateCount``/``stateDuration`` are windowless per-series
running computations; in a *continuous* pipeline they need state that
survives across micro-batches. This is exactly what Spark's
``applyInPandasWithState`` provides: per-group (series) state on the
state store, Arrow-batched user logic, checkpoint-recoverable.

The batch variants (operators/analytics.py) answer historical queries;
this module keeps the same semantics **incrementally** — each
micro-batch emits the rows it saw, annotated with the continuing run
count, so the stream converges to the batch result on ordered input.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "run_count LONG, last_time_ns LONG, run_start_ns LONG"


def streaming_state_count(
    grouped_key_cols: list[str],
    value_col: str = "f_float",
    threshold: float = 0.0,
    time_ns_col: str = "time_ns",
):
    """Build the (output_schema, state_schema, fn) triple for
    ``df.groupBy(*keys).applyInPandasWithState(...)``: a continuous
    stateCount(fn: value > threshold).

    Emits one row per input row: key cols + time_ns + state_count
    (−1 when the predicate fails, else the 1-based run position —
    continuing across micro-batches).
    """
    out_schema = T.StructType(
        [T.StructField(c, T.StringType()) for c in grouped_key_cols]
        + [
            T.StructField("time_ns", T.LongType()),
            T.StructField("state_count", T.LongType()),
        ]
    )

    def fn(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            run_count, last_t, run_start = state.get
        else:
            run_count, last_t, run_start = 0, -1, -1
        rows = []
        for pdf in pdfs:
            pdf = pdf.sort_values(time_ns_col)
            for _, r in pdf.iterrows():
                t = int(r[time_ns_col])
                if float(r[value_col]) > threshold:
                    run_count += 1
                    if run_start < 0:
                        run_start = t
                    emit = run_count
                else:
                    run_count, run_start = 0, -1
                    emit = -1
                last_t = t
                rows.append((*key, t, emit))
        state.update((run_count, last_t, run_start))
        yield pd.DataFrame(rows, columns=[*grouped_key_cols, "time_ns", "state_count"])

    return out_schema, STATE_SCHEMA, fn


def apply_streaming_state_count(
    stream: DataFrame,
    by: list[str],
    value_col: str = "f_float",
    threshold: float = 0.0,
) -> DataFrame:
    """Wire streaming_state_count onto a streaming points DataFrame."""
    out_schema, state_schema, fn = streaming_state_count(by, value_col, threshold)
    return (
        stream.groupBy(*by)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

"""Join operators beyond plain equi-join: as-of join.

Flux 0.12x has only inner equi-join (SURVEY.md §2.2.3); as-of is the
natural time-series extension (noted there as expressible) and a core
need for training-data pipelines (attach the latest feature/label
snapshot to each event).

Scale design: the naive formulation is a range join (quadratic
explosion). This implementation is the **union + forward-fill** plan:
tag both sides, union, one shuffle+sort per key on (time, side), then
``last(ignorenulls)`` carries the most recent right-side values onto
each left row. Cost: one shuffle of |L|+|R| rows — no range-join
blowup, no skew beyond the key's own distribution.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str = "time_ns",
    right_time: str = "time_ns",
    value_cols: Sequence[str] | None = None,
    tolerance_ns: int | None = None,
    suffix: str = "_right",
) -> DataFrame:
    """For each left row: the latest right row with
    ``right_time <= left_time`` (within ``tolerance_ns``), per ``on`` key.

    Returns all left columns + the right ``value_cols`` (suffixed) +
    ``asof_time_ns`` (the matched right timestamp; null = no match).
    """
    if value_cols is None:
        value_cols = [
            c for c in right.columns if c not in on and c != right_time
        ]
    lt = F.col("_t")

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_time).alias("_t"),
        F.lit(0).alias("_side"),  # right rows sort BEFORE left at equal time
    )
    r_tagged = right.select(
        *[F.col(c) for c in on],
        F.col(right_time).alias("_t"),
        F.lit(-1).alias("_side"),
        F.col(right_time).alias("_r_time"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    w = (
        W.partitionBy(*on)
        .orderBy("_t", "_side")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    filled = unioned.select(
        "*",
        F.last("_r_time", ignorenulls=True).over(w).alias("asof_time_ns"),
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in value_cols
        ],
    )
    out = filled.filter(F.col("_side") == 0)
    if tolerance_ns is not None:
        within = lt - F.col("asof_time_ns") <= F.lit(tolerance_ns)
        out = out.select(
            *[c for c in left.columns],
            F.when(within, F.col("asof_time_ns")).alias("asof_time_ns"),
            *[
                F.when(within, F.col(f"{c}{suffix}")).alias(f"{c}{suffix}")
                for c in value_cols
            ],
        )
    else:
        out = out.select(
            *[c for c in left.columns],
            "asof_time_ns",
            *[f"{c}{suffix}" for c in value_cols],
        )
    return out

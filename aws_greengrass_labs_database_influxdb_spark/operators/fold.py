"""Flux ``reduce(fn:, identity:)`` — custom per-table folds
(SURVEY.md §2.2.10; reference engine: the Flux stdlib ``reduce``
transformation of the pinned influxdb:2.0.9).

Semantics (public Flux docs): per table (= group key), fold rows in
order through ``fn(r, accumulator)`` starting from ``identity``; emit
ONE row per table holding the group key + the accumulator fields.

Spark-first split:

- :func:`linear_fold` — the fast path. Folds whose accumulator fields
  each update as ``acc.k <op> f(r)`` for a commutative/associative
  ``op`` (+, max, min) compile to a single ``groupBy().agg()`` —
  map-side partial aggregation, one shuffle of pre-combined partials,
  no Python. This covers the overwhelming majority of real reduce()
  calls (sums, counts, extrema, dot products).
- :func:`pandas_fold` — the general path. Order-dependent or
  non-associative folds run the fold literally inside
  ``applyInPandas``: rows of each group are sorted and folded in one
  Arrow batch per group. Python touches each group once; the shuffle
  is the unavoidable one (the fold is sequential per group by
  definition). Groups must individually fit in executor memory —
  acceptable because a Flux table is one series, and a non-associative
  fold over an unbounded series is inherently sequential.
"""

from __future__ import annotations

import re
from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame, functions as F
from .errors import OperatorValidationError


def linear_fold(
    df: DataFrame,
    by: Sequence[str],
    terms: dict[str, tuple[float | int | str, Column | None, str]],
) -> DataFrame:
    """One-shuffle fold: ``terms[name] = (identity, increment, op)``.

    ``op`` ∈ {"sum", "max", "min", "const"}; ``increment`` is the
    per-row contribution Column (None for "const"). The result column
    is ``identity ⊕ agg(increment)`` — double-typed like Flux float
    accumulators unless the identity is an int and op is sum.
    """
    aggs = []
    for name, (identity, inc, op) in terms.items():
        if op == "const":
            aggs.append(F.lit(identity).alias(name))
        elif op == "sum":
            aggs.append(
                (F.lit(identity) + F.coalesce(F.sum(inc), F.lit(0))).alias(name)
            )
        elif op == "max":
            aggs.append(F.greatest(F.lit(identity), F.max(inc)).alias(name))
        elif op == "min":
            aggs.append(F.least(F.lit(identity), F.min(inc)).alias(name))
        else:  # pragma: no cover
            raise OperatorValidationError(f"unknown fold op {op!r}")
    if by:
        return df.groupBy(*by).agg(*aggs)
    return df.agg(*aggs)


def pandas_fold(
    df: DataFrame,
    by: Sequence[str],
    order: Sequence[str],
    identity: dict[str, float | int | str],
    step: Callable[[dict, dict], dict],
    schema_hint: str | None = None,
) -> DataFrame:
    """General fold: rows of each group are sorted by ``order`` and
    folded sequentially through ``step(acc, row_dict) -> new_acc``.
    One output row per group.

    r16: partition-batched ``mapInPandas`` over a group-key
    repartition (the same scaffold shape as the recursive TA family)
    instead of ``groupBy().applyInPandas`` — one Arrow exchange and
    one Python call per PARTITION rather than per group, with the
    (group, order) sort run JVM-side. Same shuffle, same per-group
    fold, same output rows.
    """
    import numpy as np
    import pandas as pd

    by = list(by)
    order = [c for c in order if c in df.columns]
    if schema_hint is None:
        fields = ", ".join(
            f"`{c}` {t}" for c, t in df.select(*by).dtypes
        )
        acc_fields = ", ".join(
            f"`{k}` {'double' if isinstance(v, (int, float)) else 'string'}"
            for k, v in identity.items()
        )
        schema_hint = ", ".join(x for x in (fields, acc_fields) if x)

    from pyspark.sql import types as T

    ident = dict(identity)
    # emitted frames are reindexed to the declared schema's field order
    # (mapInPandas assigns positionally, unlike applyInPandas' by-name)
    out_cols = [f.name for f in T.StructType.fromDDL(schema_hint)]

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        # rows arrive pre-sorted by (by, order) — JVM sortWithinPartitions
        acc = dict(ident)
        for row in pdf.itertuples(index=False):
            acc = step(acc, row._asdict())
        out = {c: [pdf[c].iloc[0]] for c in by}
        out.update({k: [v] for k, v in acc.items()})
        return pd.DataFrame(out)

    def _apply(batches):
        pdfs = list(batches)
        if not pdfs:
            return
        pdf = pd.concat(pdfs, ignore_index=True) if len(pdfs) > 1 else pdfs[0]
        if not len(pdf):
            return
        if not by:
            codes = np.zeros(len(pdf), dtype=np.int64)
        elif len(by) == 1:
            codes, _ = pd.factorize(pdf[by[0]], use_na_sentinel=False)
        else:
            codes, _ = pd.factorize(
                pd.MultiIndex.from_frame(pdf[by]), use_na_sentinel=False
            )
        bounds = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1], True])
        outs = [
            fold(pdf.iloc[s:e].reset_index(drop=True))
            for s, e in zip(bounds[:-1], bounds[1:])
        ]
        yield pd.concat(outs, ignore_index=True)[out_cols]

    parts = [F.col(c) for c in by] or [F.lit(1)]
    out = df.repartition(*parts)
    if by or order:
        out = out.sortWithinPartitions(*by, *order)
    return out.mapInPandas(_apply, schema=schema_hint)


# ---------------------------------------------------------------------------
# scalar expression compiler for the pandas_fold fallback: mirrors the
# Flux map()/reduce() arithmetic grammar but produces a Python closure
# evaluated against {"r": row, "acc": accumulator} — used only off the
# fast path, so per-row Python cost is confined to folds that are
# sequential by nature.

_SCALAR_TOKEN_RX = re.compile(
    r'accumulator\.\w+|r\.\w+|r\["[^"]+"\]'
    r"|\d+(?:\.\d+)?(?:[eE][+-]?\d+)?"  # incl. scientific notation
    r'|"(?:[^"\\]|\\.)*"'
    r"|==|!=|>=|<=|>|<|\b(?:if|then|else|and|or)\b|[(),+\-*/%]"
)


def compile_scalar(src: str, colname: Callable[[str], str]):
    """Compile a Flux scalar expression (arithmetic, comparisons,
    if/then/else) to ``fn(row: dict, acc: dict) -> value``. ``colname``
    maps Flux record field names (``_value``) to physical columns."""
    src = src.strip()
    m = re.match(r"(?s)^if\s+(.+?)\s+then\s+(.+?)\s+else\s+(.+)$", src)
    if m:
        cond = compile_scalar(m.group(1), colname)
        then = compile_scalar(m.group(2), colname)
        other = compile_scalar(m.group(3), colname)
        return lambda row, acc: then(row, acc) if cond(row, acc) else other(row, acc)

    tokens = _SCALAR_TOKEN_RX.findall(src)
    if not tokens:
        raise OperatorValidationError(f"cannot parse reduce expression {src!r}")
    pos = [0]

    def peek():
        return tokens[pos[0]] if pos[0] < len(tokens) else None

    def eat():
        t = tokens[pos[0]]
        pos[0] += 1
        return t

    def factor():
        t = peek()
        if t is None:
            raise OperatorValidationError(f"truncated reduce expression {src!r}")
        if t == "(":
            eat()
            e = disj()
            if peek() != ")":
                raise OperatorValidationError(f"unbalanced parens in {src!r}")
            eat()
            return e
        if t == "-":
            eat()
            f = factor()
            return lambda row, acc: -f(row, acc)
        eat()
        if t.startswith("accumulator."):
            k = t[len("accumulator."):]
            return lambda row, acc: acc[k]
        if t.startswith('r["'):
            c = colname(t[3:-2])
            return lambda row, acc: row[c]
        if t.startswith("r."):
            c = colname(t[2:])
            return lambda row, acc: row[c]
        if t.startswith('"'):
            v = t[1:-1]
            return lambda row, acc: v
        v = float(t) if ("." in t or "e" in t or "E" in t) else int(t)
        return lambda row, acc: v

    def term():
        e = factor()
        while peek() in ("*", "/", "%"):
            op = eat()
            r = factor()
            if op == "*":
                e = (lambda a, b: lambda row, acc: a(row, acc) * b(row, acc))(e, r)
            elif op == "/":
                e = (lambda a, b: lambda row, acc: a(row, acc) / b(row, acc))(e, r)
            else:
                e = (lambda a, b: lambda row, acc: a(row, acc) % b(row, acc))(e, r)
        return e

    def arith():
        e = term()
        while peek() in ("+", "-"):
            op = eat()
            r = term()
            if op == "+":
                e = (lambda a, b: lambda row, acc: a(row, acc) + b(row, acc))(e, r)
            else:
                e = (lambda a, b: lambda row, acc: a(row, acc) - b(row, acc))(e, r)
        return e

    _CMP = {
        "==": lambda a, b: a == b,
        "!=": lambda a, b: a != b,
        ">=": lambda a, b: a >= b,
        "<=": lambda a, b: a <= b,
        ">": lambda a, b: a > b,
        "<": lambda a, b: a < b,
    }

    def cmp():
        e = arith()
        if peek() in _CMP:
            op = _CMP[eat()]
            r = arith()
            e = (lambda a, b, o: lambda row, acc: o(a(row, acc), b(row, acc)))(e, r, op)
        return e

    def conj():
        e = cmp()
        while peek() == "and":
            eat()
            r = cmp()
            e = (lambda a, b: lambda row, acc: a(row, acc) and b(row, acc))(e, r)
        return e

    def disj():
        e = conj()
        while peek() == "or":
            eat()
            r = conj()
            e = (lambda a, b: lambda row, acc: a(row, acc) or b(row, acc))(e, r)
        return e

    out = disj()
    if pos[0] != len(tokens):
        raise OperatorValidationError(f"trailing tokens in reduce expression {src!r}")
    return out

"""Annotated-CSV result serialization (Flux response format).

A Flux query result is a stream of tables keyed by group key; the CSV
carries three annotation rows — ``#group`` (is the column part of the
group key), ``#datatype``, ``#default`` — then the header and data rows,
with a ``table`` index column numbering tables within the result
(public InfluxDB 2.0 annotated-CSV spec).

Serialization necessarily collects — it's the result-delivery edge, so
rows here are post-aggregation (small). Callers stream large raw
results to parquet instead.
"""

from __future__ import annotations

import io

from pyspark.sql import DataFrame, types as T

_DTYPES = {
    T.StringType(): "string",
    T.DoubleType(): "double",
    T.FloatType(): "double",
    T.LongType(): "long",
    T.IntegerType(): "long",
    T.BooleanType(): "boolean",
    T.TimestampType(): "dateTime:RFC3339",
}


def _dtype(dt: T.DataType) -> str:
    for k, v in _DTYPES.items():
        if isinstance(dt, type(k)):
            return v
    return "string"


def _fmt(v) -> str:
    if v is None:
        return ""
    if isinstance(v, bool):
        return "true" if v else "false"
    if hasattr(v, "isoformat"):  # datetime
        s = v.isoformat()
        return s + "Z" if "+" not in s and not s.endswith("Z") else s
    s = str(v)
    if any(c in s for c in ',"\n'):
        s = '"' + s.replace('"', '""') + '"'
    return s


def to_annotated_csv(
    df: DataFrame,
    group_key: tuple[str, ...] = (),
    result_name: str = "_result",
) -> str:
    """Serialize a result DataFrame as Flux annotated CSV.

    Tables split on the group key (sorted); ``table`` numbers them.
    """
    cols = df.columns
    rows = df.collect()
    if group_key:
        rows = sorted(rows, key=lambda r: tuple(str(r[k]) for k in group_key))

    # assign table ids by group-key value
    table_ids: dict[tuple, int] = {}
    out = io.StringIO()
    dtypes = [_dtype(f.dataType) for f in df.schema.fields]

    out.write("#group,false,false," + ",".join(
        "true" if c in group_key else "false" for c in cols
    ) + "\r\n")
    out.write("#datatype,string,long," + ",".join(dtypes) + "\r\n")
    out.write("#default," + result_name + ",," + "," * (len(cols) - 1) + "\r\n")
    out.write(",result,table," + ",".join(cols) + "\r\n")
    for r in rows:
        key = tuple(str(r[k]) for k in group_key) if group_key else ()
        tid = table_ids.setdefault(key, len(table_ids))
        out.write(",," + str(tid) + "," + ",".join(_fmt(r[c]) for c in cols) + "\r\n")
    return out.getvalue()

"""InfluxDB line-protocol parser → canonical tall points.

Line protocol is the write format of the data plane the reference
provisions (``POST /api/v2/write``; the telemetry relay writes it —
``/root/reference/README.md:292-297``; the pinned client lib is
``influxdb-client`` in ``/root/reference/test-requirements.txt``).

Grammar (public InfluxDB 2.0 docs):

    measurement[,tag_key=tag_val...] field_key=field_val[,...] [timestamp]

Escaping: measurement escapes ``,`` and space; tag/field keys and tag
values escape ``,``, ``=``, space; string field values are
double-quoted with ``\"`` and ``\\`` escapes. Field value types:
float (default), ``i`` suffix int, ``u`` suffix uint, bool
(t/T/true/True/TRUE/f/...), quoted string. Timestamp is an integer in
the write precision (default ns).

The tokenizer is pure Python (escaping state machine). At scale it runs
inside ``mapInPandas`` — one Arrow batch of raw lines in, one batch of
points out — so the driver never sees row data and the parse
parallelizes across executors.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from decimal import Decimal

from pyspark.sql import DataFrame, functions as F

from ..schema import (
    FT_BOOL,
    FT_FLOAT,
    FT_INT,
    FT_STR,
    FT_UINT,
    POINTS_SCHEMA,
)

_PRECISION_NS = {
    "ns": 1,
    "us": 1_000,
    "ms": 1_000_000,
    "s": 1_000_000_000,
    # v1-only write precisions (InfluxDB 1.x /write accepts m and h;
    # the v2 API does not — the facade enforces that split)
    "m": 60 * 1_000_000_000,
    "h": 3600 * 1_000_000_000,
}

_TRUE = {"t", "T", "true", "True", "TRUE"}
_FALSE = {"f", "F", "false", "False", "FALSE"}


class LineProtocolError(ValueError):
    """Raised for a malformed line-protocol line."""


def _split_escaped(s: str, seps: frozenset[str], start: int = 0) -> Iterator[tuple[str, int, str]]:
    """Yield (token, end_index, sep_char) splitting on unescaped separators.

    Backslash escapes the next character. The raw backslash is preserved
    for non-special sequences (per protocol: ``\\x`` → ``\\x`` when x is
    not a special char — we unescape only the separator set + backslash).
    """
    out: list[str] = []
    i = start
    n = len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            nxt = s[i + 1]
            if nxt in seps or nxt in ",= \\":
                out.append(nxt)
            else:
                out.append(c)
                out.append(nxt)
            i += 2
            continue
        if c in seps:
            yield "".join(out), i, c
            out = []
            i += 1
            continue
        out.append(c)
        i += 1
    yield "".join(out), n, ""


def _parse_field_value(raw: str) -> tuple[str, object]:
    """Return (ftype, python value) for a raw field-value token."""
    if not raw:
        raise LineProtocolError("empty field value")
    if raw[0] == '"':
        if len(raw) < 2 or raw[-1] != '"':
            raise LineProtocolError(f"unterminated string value: {raw!r}")
        body = raw[1:-1]
        out: list[str] = []
        i = 0
        while i < len(body):
            if body[i] == "\\" and i + 1 < len(body) and body[i + 1] in '"\\':
                out.append(body[i + 1])
                i += 2
            else:
                out.append(body[i])
                i += 1
        return FT_STR, "".join(out)
    if raw in _TRUE:
        return FT_BOOL, True
    if raw in _FALSE:
        return FT_BOOL, False
    if raw.endswith("i"):
        return FT_INT, int(raw[:-1])
    if raw.endswith("u"):
        return FT_UINT, Decimal(raw[:-1])
    try:
        return FT_FLOAT, float(raw)
    except ValueError as e:
        raise LineProtocolError(f"bad field value: {raw!r}") from e


def parse_line(line: str, precision: str = "ns") -> list[dict]:
    """Parse one line into a list of point dicts (one per field).

    Returns dicts matching POINTS_SCHEMA (without ingest_seq/time —
    callers derive those). ``time_ns`` is epoch ns (None if line has no
    timestamp; callers substitute receive time, mirroring server
    behavior).
    """
    line = line.strip()
    if not line or line.startswith("#"):
        return []
    try:
        mult = _PRECISION_NS[precision]
    except KeyError:
        raise LineProtocolError(f"invalid precision {precision!r}") from None

    # measurement (ends at unescaped ',' or ' ')
    it = _split_escaped(line, frozenset(", "))
    measurement, pos, sep = next(it)
    if not measurement:
        raise LineProtocolError(f"missing measurement: {line!r}")

    tags: dict[str, str] = {}
    i = pos + 1
    while sep == ",":
        key, pos, sep2 = next(_split_escaped(line, frozenset("="), i))
        if sep2 != "=":
            raise LineProtocolError(f"tag without value in: {line!r}")
        val, pos, sep = next(_split_escaped(line, frozenset(", "), pos + 1))
        tags[key] = val
        i = pos + 1
    if sep != " ":
        raise LineProtocolError(f"missing field set: {line!r}")

    # field set: k=v[,k=v...] — string values may contain ', ' so track quotes
    fields: list[tuple[str, str, object]] = []
    n = len(line)
    while i < n:
        key, pos, sepk = next(_split_escaped(line, frozenset("="), i))
        if sepk != "=":
            raise LineProtocolError(f"field without value in: {line!r}")
        j = pos + 1
        if j < n and line[j] == '"':
            k = j + 1
            while k < n:
                if line[k] == "\\":
                    k += 2
                    continue
                if line[k] == '"':
                    break
                k += 1
            if k >= n:
                raise LineProtocolError(f"unterminated string in: {line!r}")
            raw = line[j : k + 1]
            i = k + 1
        else:
            k = j
            while k < n and line[k] not in ", ":
                k += 1
            raw = line[j:k]
            i = k
        ftype, value = _parse_field_value(raw)
        fields.append((key, ftype, value))
        if i < n and line[i] == ",":
            i += 1
            continue
        break

    # optional timestamp
    time_ns: int | None = None
    rest = line[i:].strip()
    if rest:
        try:
            time_ns = int(rest) * mult
        except ValueError as e:
            raise LineProtocolError(f"bad timestamp {rest!r}") from e

    points = []
    for key, ftype, value in fields:
        points.append(
            {
                "measurement": measurement,
                "time_ns": time_ns,
                "tags": tags,
                "field": key,
                "f_float": value if ftype == FT_FLOAT else None,
                "f_int": value if ftype == FT_INT else None,
                "f_uint": value if ftype == FT_UINT else None,
                "f_str": value if ftype == FT_STR else None,
                "f_bool": value if ftype == FT_BOOL else None,
                "ftype": ftype,
            }
        )
    return points


def parse_lines(lines: Iterable[str], precision: str = "ns", default_time_ns: int = 0) -> list[dict]:
    """Parse many lines; fills missing timestamps with default_time_ns."""
    out = []
    seq = 0
    for line in lines:
        for p in parse_line(line, precision):
            p["time_ns"] = p["time_ns"] if p["time_ns"] is not None else default_time_ns
            p["ingest_seq"] = seq
            seq += 1
            out.append(p)
    return out


def lines_df_to_points(
    lines_df: DataFrame,
    line_col: str = "value",
    precision: str = "ns",
    default_time_ns: int = 0,
) -> DataFrame:
    """Distributed parse: DataFrame of raw lines → canonical points DF.

    Uses ``mapInPandas`` (Arrow-batched, executor-side) — no driver
    collect, scales with input partitions. Works identically for batch
    reads and Structured Streaming micro-batches (``spark.readStream
    .text(dir)`` has the same single ``value`` column).
    """
    import pandas as pd  # local import: executors re-import cheaply

    def _parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for line in pdf[line_col]:
                if line is None:
                    continue
                for p in parse_line(line, precision):
                    if p["time_ns"] is None:
                        p["time_ns"] = default_time_ns
                    p["time"] = pd.Timestamp(p["time_ns"] // 1000, unit="us")
                    p["ingest_seq"] = 0
                    rows.append(p)
            cols = [f.name for f in POINTS_SCHEMA.fields]
            if rows:
                yield pd.DataFrame(rows)[cols]
            else:
                yield pd.DataFrame({c: [] for c in cols})

    parsed = lines_df.mapInPandas(_parse_batches, schema=POINTS_SCHEMA)
    # ingest_seq: assigned post-parse so the parser stays a pure function,
    # from the shared wall-clock allocator so LWW order is comparable
    # across all write paths. Illegal on an unbounded stream — streaming
    # callers assign their own (per-micro-batch in foreachBatch, as
    # streaming.ingest does).
    if parsed.isStreaming:
        return parsed
    from .seq import with_ingest_seq

    return with_ingest_seq(parsed)

"""InfluxQL subset frontend.

Covers the dashboard-query core of InfluxQL 1.x (the language the
provisioned engine serves on ``/query`` via DBRP — semantics per public
InfluxQL docs):

    SELECT <fn>(<field>) [AS <alias>] [, ...] | <field list>
         | <transform>(<agg>(<field>)[, args])          -- nested (Grafana)
         | <agg-arithmetic: mean(v) * 8 + 1, max(v) - min(v)>
         | TOP/BOTTOM/DISTINCT/SAMPLE(...)              -- multi-row
         | ABS/…/SQRT/LOG/POW(<field>[, x])             -- pointwise math
         | EXPONENTIAL_MOVING_AVERAGE/RSI/CMO/KAMA/…(<field>, n)  -- TA
    FROM <measurement>[, <measurement> ...] | /regex/ | (SELECT ...)
    [WHERE <time predicates> [AND <tag> =|!=|=~|!~ ...] [AND (<t> OR <t>)]
           [AND <field> <op> <num>]]
    [GROUP BY time(<interval>[, <offset>])[, <tag> ...]]
           [fill(null|none|0|<num>|previous|linear)]
    [ORDER BY time [ASC|DESC]]
    [LIMIT <n>] [OFFSET <n>] [SLIMIT <n>] [SOFFSET <n>]
    [tz('America/Chicago')]   -- local window alignment + local literals

    SHOW MEASUREMENTS | TAG KEYS | TAG VALUES WITH KEY ... | FIELD KEYS
         | SERIES    [FROM ...] [WHERE ...] [LIMIT n]

Aggregates: count sum mean median mode stddev spread percentile
integral min max first last. Selectors MIN/MAX/FIRST/LAST keep
InfluxDB selector semantics (the row's timestamp). GROUP BY time
windows align to the epoch (plus optional offset); ``fill`` controls
empty windows (requires an explicit WHERE time range, like InfluxDB
itself).

The parser is a small regex/recursive-descent over this grammar; the
compiled plan is pure DataFrame composition (one groupBy per query +
the window-spine join for fill).

Field typing (r10): every read resolves a field's value slot
(f_float / f_str / f_bool) from the frame's ``ftype`` discriminator —
string and bool field values flow through raw selects, star selects,
WHERE (incl. OR groups, per-POINT for cross-field conditions),
type-generic aggregates (COUNT/DISTINCT/MODE/FIRST/LAST), selector
companions, and TOP/BOTTOM/SAMPLE. Numeric-only aggregates on a
non-numeric field yield empty results (stock), never cast errors.
"""

from __future__ import annotations

import re
from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, functions as F

from ..operators import aggregates as agg_ops
from ..operators import selectors as sel_ops
from ..operators import sortlimit as sl_ops
from ..operators.windows import duration_ns, window_spine, window_start_ns


class InfluxQLError(ValueError):
    pass


_DURATION_RX = re.compile(r"^(\d+)(ns|u|µ|ms|s|m|h|d|w)$")
# field-position regex selections (`SELECT /val/`, `mean(/val/)`)
# carry their pattern behind this marker through the (fn, fld, alias)
# tuples — expanded like `*` restricted to matching keys (r11)
_RE_FLD = "\x00re:"
_AGGS = {
    "count": "count", "sum": "sum", "mean": "mean", "median": "median",
    "mode": "mode", "stddev": "stddev", "spread": "spread",
}
# single-row aggregates with extra arguments, computed as group-local
# expressions (percentile rank / trapezoid fold over the group's points)
_ARG_AGGS = {"percentile", "integral"}
_SELECTORS = {"min", "max", "first", "last"}
# functions that emit multiple rows per group — must be the sole selection
_MULTI_ROW = {"top", "bottom", "distinct", "sample"}
# per-point transform functions (windowed per series, not aggregated)
_TRANSFORMS = {
    "derivative", "non_negative_derivative",
    "difference", "non_negative_difference",
    "cumulative_sum", "moving_average", "elapsed",
}
# technical-analysis transforms (InfluxQL 1.8 family) — recursive per
# series, dispatched to the analytics operators
_TA_FNS = {
    "exponential_moving_average", "double_exponential_moving_average",
    "triple_exponential_moving_average", "relative_strength_index",
    "chande_momentum_oscillator", "kaufmans_efficiency_ratio",
    "kaufmans_adaptive_moving_average",
}
# per-row math transforms: FN(field[, arg]) applied pointwise
_MATH_1ARG = {
    "abs", "acos", "asin", "atan", "ceil", "cos", "exp", "floor",
    "ln", "log2", "log10", "round", "sin", "sqrt", "tan",
}
_MATH_2ARG = {"log", "pow", "atan2"}
_MATH_FNS = _MATH_1ARG | _MATH_2ARG
# functions allowed inside arithmetic WHERE conditions (the InfluxQL
# math set; all map 1:1 onto Spark SQL builtins via F.expr)
_EXPR_FNS = _MATH_FNS


@dataclass
class InfluxQLQuery:
    fields: list[tuple[str | None, str, str]]  # (fn, field, alias)
    measurement: str
    time_start_ns: int | None = None
    time_stop_ns: int | None = None
    tag_filters: list[tuple[str, str, str]] = field(default_factory=list)
    field_filters: list[tuple[str, str, float]] = field(default_factory=list)
    # parenthesized OR groups: each inner list of (name, op, value) tag
    # conditions is OR'd; groups AND with everything else
    or_tag_groups: list[list[tuple[str, str, str]]] = field(default_factory=list)
    measurement_regex: str | None = None
    # FROM m1, m2 comma lists; single-measurement queries keep this at
    # [measurement]. Multi-measurement (list or regex) queries emit one
    # series per measurement, as InfluxDB does.
    measurements: list[str] = field(default_factory=list)
    # nested transform-over-aggregate selections:
    # (outer_transform, inner_agg, field, alias) — DERIVATIVE(MEAN(v), 1s)
    nested: list[tuple[str, str, str, str]] = field(default_factory=list)
    # arithmetic selections: (expr_tree, alias); tree nodes are
    # ("num", x) | ("agg", fn, field, args) | ("field", name)
    # | ("bin", op, l, r)
    arith: list[tuple[tuple, str]] = field(default_factory=list)
    # per-row (non-aggregate) arithmetic projections: value * 8 / 1024
    raw_arith: list[tuple[tuple, str]] = field(default_factory=list)
    group_time_ns: int | None = None
    group_time_offset_ns: int = 0
    group_tags: list[str] = field(default_factory=list)
    fill: str | float | None = None
    order_desc: bool = False
    limit: int | None = None
    offset: int = 0
    slimit: int | None = None
    soffset: int = 0
    # extra positional args of transform fns, keyed by output alias
    fn_args: dict[str, list[str]] = field(default_factory=dict)
    # tz('Zone'): GROUP BY time() windows align to local wall clock
    tzname: str | None = None
    # field key → populated value slot ('f_float'/'f_str'/'f_bool'),
    # resolved at execution from the frame's ftype discriminator —
    # empty on float-only frames (the lookup is gated on the string/
    # bool slots existing at all, so suite/subquery frames never pay
    # the small distinct job). r10: this is what lets string and bool
    # field VALUES flow through /query (stock parity — previously
    # every read hardcoded f_float and returned NULL for them).
    field_slots: dict = field(default_factory=dict)
    # SELECT *::field — stock star variant that pivots ONLY fields
    # (tags stay off the row); plain * rides tags along (r11)
    star_fields_only: bool = False
    # set when star expansion finds no eligible field: the statement
    # answers with no series (stock), enforced by _execute_aggregate's
    # empty short-circuit
    force_empty: bool = False


def _parse_duration(tok: str) -> int:
    m = _DURATION_RX.match(tok)
    if not m:
        raise InfluxQLError(f"bad duration {tok!r}")
    n, unit = int(m.group(1)), m.group(2)
    unit = {"u": "us", "µ": "us"}.get(unit, unit)
    return n * duration_ns(f"1{unit}")


_TIME_RX = re.compile(
    r"time\s*(>=|<=|>|<)\s*"
    r"(?:'([^']+)'|(\d+)(ns|u|µ|ms|s)?"
    r"|now\(\)\s*(?:([+-])\s*(\d+(?:ns|u|µ|ms|s|m|h|d|w)))?)",
    re.IGNORECASE,
)
_TAG_RX = re.compile(r"\"?(\w+)\"?\s*(=|!=)\s*'([^']*)'")
_TAG_REGEX_RX = re.compile(r"\"?(\w+)\"?\s*(=~|!~)\s*/([^/]*)/")
_FIELD_RX = re.compile(r"\"?(\w+)\"?\s*(>=|<=|>|<|=|!=)\s*(-?\d+(?:\.\d+)?)$")
_BOOL_WHERE_RX = re.compile(r"\"?(\w+)\"?\s*(=|!=)\s*(true|false)\s*$", re.I)


def _ts_to_ns(lit: str) -> int:
    import datetime as dt

    for fmt in ("%Y-%m-%dT%H:%M:%SZ", "%Y-%m-%d %H:%M:%S", "%Y-%m-%d"):
        try:
            d = dt.datetime.strptime(lit, fmt).replace(tzinfo=dt.timezone.utc)
            return int(d.timestamp()) * 10**9
        except ValueError:
            continue
    raise InfluxQLError(f"bad time literal {lit!r}")


_ARITH_TOKEN_RX = re.compile(
    r"\s*(\w+\s*\(\s*[^()]*\s*\)|\d+\.\d+|\d+|[+\-*/]|\"[\w]+\"|\w+)"
)


def _parse_select_arith(src: str):
    """Parse ``mean(v) * 8`` / ``max(v) - min(v)`` style SELECT items
    into an expression tree (standard precedence: ``* /`` over
    ``+ -``). Returns None when ``src`` isn't an arithmetic chain of
    aggregate calls and numeric literals (callers fall back to the
    plain single-function grammar)."""
    tokens, pos = [], 0
    while pos < len(src):
        m = _ARITH_TOKEN_RX.match(src, pos)
        if not m:
            return None
        tokens.append(m.group(1))
        pos = m.end()
    if not tokens or not any(t in "+-*/" for t in tokens):
        return None

    def atom(i):
        t = tokens[i]
        fm = re.match(r"(?i)^(\w+)\s*\(\s*\"?([\w*]+)\"?\s*(?:,\s*([^)]*))?\)$", t)
        if fm:
            fn = fm.group(1).lower()
            if fn not in _AGGS and fn not in _SELECTORS and fn not in _ARG_AGGS:
                raise InfluxQLError(f"unsupported function {fn!r} in expression")
            args = [a.strip().strip('"') for a in (fm.group(3) or "").split(",") if a.strip()]
            return ("agg", fn, fm.group(2), tuple(args)), i + 1
        if re.match(r"^\d", t):
            return ("num", float(t)), i + 1
        if re.match(r'^"?\w+"?$', t):
            # bare field reference: SELECT value * 8 / 1024 (the
            # Grafana unit-conversion idiom) — per-row projection atom
            return ("field", t.strip('"')), i + 1
        raise InfluxQLError(f"cannot parse expression token {t!r}")

    def mul(i):
        node, i = atom(i)
        while i < len(tokens) and tokens[i] in "*/":
            op = tokens[i]
            rhs, i = atom(i + 1)
            node = ("bin", op, node, rhs)
        return node, i

    def add(i):
        node, i = mul(i)
        while i < len(tokens) and tokens[i] in "+-":
            op = tokens[i]
            rhs, i = mul(i + 1)
            node = ("bin", op, node, rhs)
        return node, i

    try:
        tree, i = add(0)
    except InfluxQLError:
        raise
    if i != len(tokens):
        raise InfluxQLError(f"trailing tokens in expression {src!r}")
    return tree


def _tree_atom_kinds(tree) -> set[str]:
    """Atom kinds ('agg'/'field'/'num') present in an expression tree."""
    if tree[0] == "bin":
        return _tree_atom_kinds(tree[2]) | _tree_atom_kinds(tree[3])
    return {tree[0]}


def _default_arith_alias(tree) -> str:
    """InfluxQL names unaliased expressions after the first function."""
    if tree[0] == "agg":
        return tree[1]
    if tree[0] == "field":
        return tree[1]
    if tree[0] == "bin":
        return _default_arith_alias(tree[2])
    return "expr"


_QUOTED_SPAN_RX = re.compile(
    r"""'(?:\\.|[^'\\])*'|"(?:\\.|[^"\\])*\"""", re.S
)


def _sub_outside_quotes(pattern: str, repl: str, text: str) -> str:
    """``re.sub`` that leaves single-quoted string literals and
    double-quoted identifiers untouched — blind text rewrites were
    corrupting conditions like ``tag = 'a<>b'`` and values containing
    ``'::tag'`` (ADVICE r6)."""
    out, pos = [], 0
    for m in _QUOTED_SPAN_RX.finditer(text):
        out.append(re.sub(pattern, repl, text[pos:m.start()]))
        out.append(m.group(0))
        pos = m.end()
    out.append(re.sub(pattern, repl, text[pos:]))
    return "".join(out)


def _search_outside_quotes(pattern: str, text: str):
    """``re.search`` restricted to text outside quoted spans."""
    masked = _QUOTED_SPAN_RX.sub(lambda m: " " * len(m.group(0)), text)
    return re.search(pattern, masked)


#: a /regex/ literal where the grammar allows one — after =~ / !~,
#: FROM, an opening paren (fn(/re/)), a comma, or SELECT. Anchoring on
#: the preceding token keeps division expressions (`a / 2 ... b / 3`)
#: from being mistaken for a regex span.
_REGEX_LIT_SPAN_RX = re.compile(
    r"(?:=~|!~|\bFROM\b|\(|,|\bSELECT\b)\s*/(?:\\.|[^/\\])+/",
    re.I | re.S,
)

#: select-list marker for `*::tag` (replaced before the namespace
#: strip so it survives parsing; expanded to all tag keys at execution)
_STARTAG = "__startag__"


def _mask_quotes_and_regex(text: str) -> str:
    masked = _QUOTED_SPAN_RX.sub(lambda m: " " * len(m.group(0)), text)
    return _REGEX_LIT_SPAN_RX.sub(lambda m: " " * len(m.group(0)), masked)


def _sub_outside_quotes_and_regex(pattern: str, repl: str, text: str) -> str:
    """``re.sub`` skipping quoted spans AND /regex/ literals — the
    namespace strip was corrupting a regex field selection whose
    pattern literally contains ``::field``/``::tag`` (r11 ADVICE).
    ``repl`` must be a plain string (no group refs)."""
    masked = _mask_quotes_and_regex(text)
    out, last = [], 0
    for m in re.finditer(pattern, masked):
        out.append(text[last:m.start()])
        out.append(repl)
        last = m.end()
    out.append(text[last:])
    return "".join(out)


def _search_outside_quotes_and_regex(pattern: str, text: str):
    return re.search(pattern, _mask_quotes_and_regex(text))


def _parse_where(where: str, out: InfluxQLQuery, now_ns: int | None = None) -> None:
    """Parse a WHERE clause (time bounds, tag =/!=/=~/!~, field
    comparisons, parenthesized OR groups) into ``out`` — shared by
    SELECT and SHOW parsing. ``now_ns`` anchors ``now() ± duration``
    bounds (the standard Grafana time-picker shape); defaults to the
    wall clock."""
    # `<>` is InfluxQL's alternate not-equals spelling (rewritten only
    # outside quoted literals)
    where = _sub_outside_quotes(r"<>", "!=", where) if where else where
    for cond in re.split(r"(?i)\s+AND\s+", where) if where else []:
        cond = cond.strip()
        if not cond:
            continue
        # fullmatch: a prefix match silently swallowed trailing tokens
        # (`time < now() ZZGARBAGEZZ` parsed as `time < now()` — the
        # r9 DDL-fuzz escape; stock rejects trailing garbage on every
        # statement form)
        tm = _TIME_RX.fullmatch(cond)
        if tm:
            op = tm.group(1)
            if tm.group(2) is None and tm.group(3) is None:
                # now() [± duration]
                import time as _time

                ns = now_ns if now_ns is not None else _time.time_ns()
                if tm.group(6):
                    delta = _parse_duration(tm.group(6))
                    ns = ns - delta if tm.group(5) == "-" else ns + delta
            elif tm.group(2):
                ns = _ts_to_ns(tm.group(2))
                if out.tzname:
                    # with tz(), string time literals are local wall
                    # clock (InfluxQL semantics); epoch literals stay
                    # absolute
                    import datetime as dt
                    from zoneinfo import ZoneInfo

                    local = dt.datetime.fromtimestamp(
                        ns // 10**9, dt.timezone.utc
                    ).replace(tzinfo=ZoneInfo(out.tzname))
                    ns -= int(local.utcoffset().total_seconds()) * 10**9
            else:
                mult = {"ns": 1, "u": 10**3, "µ": 10**3, "ms": 10**6, "s": 10**9}[
                    tm.group(4) or "ns"
                ]
                ns = int(tm.group(3)) * mult
            if op in (">=", ">"):
                out.time_start_ns = ns + (1 if op == ">" else 0)
            else:
                out.time_stop_ns = ns + (1 if op == "<=" else 0)
            continue
        bare = (
            cond[1:-1].strip()
            if cond.startswith("(") and cond.endswith(")")
            else cond
        )
        if re.search(r"(?i)\s+OR\s+", bare):
            # OR disjunction of tag conditions — parenthesized or bare
            # (r6: the bare form used to prefix-match the first
            # condition and silently DROP the rest)
            group: list[tuple[str, str, object]] = []
            for sub in re.split(r"(?i)\s+OR\s+", bare):
                sub = sub.strip()
                gm = _TAG_RX.fullmatch(sub) or _TAG_REGEX_RX.fullmatch(sub)
                if gm:
                    group.append((gm.group(1), gm.group(2), gm.group(3)))
                    continue
                fm = _FIELD_RX.match(sub)
                if fm:
                    # numeric member: a FIELD condition (stock supports
                    # `(v > 5 OR v < 1)` — r10; previously a parse error)
                    group.append(
                        (fm.group(1), fm.group(2), float(fm.group(3)))
                    )
                    continue
                raise InfluxQLError(f"cannot parse OR condition {sub!r}")
            out.or_tag_groups.append(group)
            continue
        fm2 = _FIELD_RX.match(cond)
        if fm2:
            # numeric RHS ⇒ field comparison (v1 tags are strings);
            # = / != included (r6 — they previously fell through to a
            # typed parse error)
            out.field_filters.append((fm2.group(1), fm2.group(2), float(fm2.group(3))))
            continue
        bm = _BOOL_WHERE_RX.fullmatch(cond)
        if bm:
            # unquoted boolean literal: a bool-field condition (flag =
            # true). Routed through tag_filters so execution can
            # resolve the name field-first (bool field) or fall back
            # to a string tag compare ('true') like stock.
            out.tag_filters.append(
                (bm.group(1), bm.group(2), bm.group(3).lower())
            )
            continue
        # fullmatch: a prefix match would silently ignore trailing text
        gm = _TAG_RX.fullmatch(cond)
        if gm:
            out.tag_filters.append((gm.group(1), gm.group(2), gm.group(3)))
            continue
        rm = _TAG_REGEX_RX.fullmatch(cond)
        if rm:
            out.tag_filters.append((rm.group(1), rm.group(2), rm.group(3)))
            continue
        # field arithmetic: `value * 2 > 100`, `(value + 1) / 2 <= 5` —
        # stored with a marker prefix and compiled to a Column at
        # execution (identifiers resolve to field columns there)
        em = re.match(
            r"^([\w .+\-*/()]+?)\s*(>=|<=|!=|=|>|<)\s*(-?\d+(?:\.\d+)?)\s*$",
            cond,
        )
        if em and re.search(r"[+\-*/]", em.group(1)):
            out.field_filters.append(
                ("__expr__" + em.group(1).strip(), em.group(2), float(em.group(3)))
            )
            continue
        raise InfluxQLError(f"cannot parse WHERE clause {cond!r}")


def parse_influxql(q: str, now_ns: int | None = None) -> InfluxQLQuery:
    text = q.strip().rstrip(";")
    # ``ident::field`` / ``ident::tag`` (the Chronograf/Grafana
    # query-builder namespace disambiguators) carry no semantics here —
    # field and tag namespaces don't collide in the canonical schema —
    # so strip them everywhere (SELECT, WHERE, GROUP BY, subqueries).
    # ``::<type>`` value casts are type FILTERS in the v1 engine; a
    # typed error beats silently ignoring them.
    # stock star variants BEFORE the namespace strip: `*::field`
    # pivots only fields; a bare `*::tag` select has no field to
    # return — stock rejects it ("statement must have at least one
    # field in select clause")
    star_fields_only = bool(
        _search_outside_quotes_and_regex(r"\*\s*::field\b", text)
    )
    # `*::tag` expands to ALL tag keys as selected columns — replaced
    # with a marker BEFORE the namespace strip (r11 ADVICE: the old
    # whole-query strip silently turned `SELECT *::tag, v` into a raw
    # `*`, fields AND tags; only the exact bare spelling was caught).
    # A select of ONLY `*::tag` has no field — stock's typed error,
    # checked after the select list is parsed. Both rewrites skip
    # /regex/ literals so a pattern containing `::field`/`::tag`
    # survives intact.
    text = _sub_outside_quotes_and_regex(r"\*\s*::tag\b", _STARTAG, text)
    text = _sub_outside_quotes_and_regex(r"::(?:field|tag)\b", "", text)
    bad_cast = _search_outside_quotes_and_regex(r"::(\w+)", text)
    if bad_cast:
        raise InfluxQLError(
            f"type cast ::{bad_cast.group(1)} is not supported "
            "(::field and ::tag are)"
        )
    tzname = None
    tzm = re.search(r"(?i)\s+tz\(\s*'([^']+)'\s*\)\s*$", text)
    if tzm:
        tzname = tzm.group(1)
        text = text[: tzm.start()]
    m = re.match(
        r"(?is)^SELECT\s+(?P<sel>.+?)\s+FROM\s+"
        r"(?:/(?P<measrx>[^/]+)/|(?P<meas>\"?[\w.\-]+\"?(?:\s*,\s*\"?[\w.\-]+\"?)*))"
        r"(?:\s+WHERE\s+(?P<where>.+?))?"
        r"(?:\s+GROUP\s+BY\s+(?P<group>.+?))?"
        r"(?:\s+ORDER\s+BY\s+time\s+(?P<ord>ASC|DESC))?"
        r"(?:\s+LIMIT\s+(?P<limit>\d+))?"
        r"(?:\s+OFFSET\s+(?P<offset>\d+))?"
        r"(?:\s+SLIMIT\s+(?P<slimit>\d+))?(?:\s+SOFFSET\s+(?P<soffset>\d+))?$",
        text,
    )
    if not m:
        raise InfluxQLError(f"cannot parse: {q!r}")
    out = InfluxQLQuery(fields=[], measurement="")
    out.star_fields_only = star_fields_only
    out.tzname = tzname
    out.measurement_regex = m.group("measrx")
    if m.group("meas"):
        out.measurements = [
            p.strip().strip('"') for p in m.group("meas").split(",")
        ]
        out.measurement = out.measurements[0]

    # SELECT list
    # duplicate output names get stock's _N suffix (`SELECT
    # mean(a), mean(b)` → mean, mean_1) — duplicate columns made every
    # later by-name reference ambiguous (r11 fuzz escape)
    _alias_seen: dict[str, int] = {}

    def _uniq(alias: str) -> str:
        n = _alias_seen.get(alias)
        if n is None:
            _alias_seen[alias] = 0
            return alias
        _alias_seen[alias] = n + 1
        return f"{alias}_{n + 1}"

    for part in re.split(r",(?![^()]*\))", m.group("sel")):
        part = part.strip()
        # nested transform-over-aggregate: DERIVATIVE(MEAN(value), 1s)
        nm = re.match(
            r"(?i)^(\w+)\s*\(\s*(\w+)\s*\(\s*\"?([\w*]+)\"?\s*\)"
            r"\s*(?:,\s*([^)]*))?\)(?:\s+AS\s+\"?(\w+)\"?)?$",
            part,
        )
        if nm and nm.group(1).lower() in (
            _TRANSFORMS | _TA_FNS | {"holt_winters", "holt_winters_with_fit"}
        ):
            outer, inner = nm.group(1).lower(), nm.group(2).lower()
            if inner not in _AGGS and inner not in _SELECTORS:
                raise InfluxQLError(f"cannot nest {inner!r} inside {outer!r}")
            alias = _uniq(nm.group(5) or outer)
            out.nested.append((outer, inner, nm.group(3), alias))
            if nm.group(4):
                out.fn_args[alias] = [a.strip().strip('"') for a in nm.group(4).split(",")]
            continue
        # arithmetic over aggregates/literals: mean(v) * 8, max(v)-min(v)
        am = re.match(r'(?is)^(.*?)(?:\s+AS\s+"?(\w+)"?)?$', part)
        expr_src, expr_alias = am.group(1).strip(), am.group(2)
        if expr_src == "*":
            # raw star projection: all tags + the field value
            out.fields.append((None, "*", _uniq(expr_alias or "value")))
            continue
        if expr_src == _STARTAG:
            # `*::tag`: all tag keys ride along as columns, expanded
            # against the frame at execution
            out.fields.append((None, _STARTAG, _uniq(expr_alias or "value")))
            continue
        rsel = re.match(r"^/(.+)/$", expr_src)
        if rsel:
            # regex selection: like * restricted to keys matching the
            # pattern (stock matches field AND tag keys)
            out.fields.append(
                (None, _RE_FLD + rsel.group(1), _uniq(expr_alias or "value"))
            )
            continue
        tree = _parse_select_arith(expr_src)
        if tree is not None and tree[0] == "bin":
            kinds = _tree_atom_kinds(tree)
            if "agg" in kinds and "field" in kinds:
                raise InfluxQLError(
                    f"cannot mix aggregate and raw field references in {part!r}"
                )
            if "field" in kinds:
                out.raw_arith.append(
                    (tree, _uniq(expr_alias or _default_arith_alias(tree)))
                )
            else:
                out.arith.append((tree, _uniq(expr_alias or _default_arith_alias(tree))))
            continue
        cd = re.match(
            r'(?i)^count\s*\(\s*distinct\s*\(\s*"?(\w+)"?\s*\)\s*\)'
            r'(?:\s+AS\s+"?(\w+)"?)?$',
            part,
        )
        if cd:
            # COUNT(DISTINCT(field)) — reference names the column `count`
            out.fields.append(("count_distinct", cd.group(1),
                               _uniq(cd.group(2) or "count")))
            continue
        # fn(/re/): the regex literal may itself contain parens
        # (mean(/^(a|b)/)), which the generic fm regex below cannot
        # bracket-match — recognize the regex-argument call first (r11)
        fr = re.match(
            r"(?i)^(\w+)\s*\(\s*/(.+)/\s*(?:,\s*([^)]*))?\)"
            r'(?:\s+AS\s+"?(\w+)"?)?$',
            part,
        )
        if fr:
            fn = fr.group(1).lower()
            if (fn not in _AGGS and fn not in _SELECTORS
                    and fn not in _ARG_AGGS and fn not in _MULTI_ROW):
                raise InfluxQLError(f"unsupported function {fn!r}")
            alias = _uniq(fr.group(4) or fn)
            out.fields.append((fn, _RE_FLD + fr.group(2), alias))
            if fr.group(3):
                out.fn_args[alias] = [a.strip().strip('"')
                                      for a in fr.group(3).split(",")]
            continue
        fm = re.match(r"(?i)^(\w+)\s*\(\s*([^)]*)\s*\)(?:\s+AS\s+\"?(\w+)\"?)?$", part)
        if fm:
            fn = fm.group(1).lower()
            if (fn not in _AGGS and fn not in _SELECTORS and fn not in _TRANSFORMS
                    and fn not in _ARG_AGGS and fn not in _MULTI_ROW
                    and fn not in _TA_FNS and fn not in _MATH_FNS):
                raise InfluxQLError(f"unsupported function {fn!r}")
            args = [a.strip().strip('"') for a in fm.group(2).split(",") if a.strip()]
            if not args:
                raise InfluxQLError(f"{fn} needs a field argument")
            alias = _uniq(fm.group(3) or fn)
            fld0 = args[0]
            rm0 = re.match(r"^/(.+)/$", fld0)
            if rm0:
                # agg(/re/): per-field expansion over matching keys,
                # like agg(*) (stock regex field selection)
                fld0 = _RE_FLD + rm0.group(1)
            out.fields.append((fn, fld0, alias))
            if len(args) > 1:
                out.fn_args[alias] = args[1:]
        else:
            cm = re.match(r'^"?([\w*]+)"?(?:\s+AS\s+"?(\w+)"?)?$', part)
            if not cm:
                raise InfluxQLError(f"bad select expression {part!r}")
            out.fields.append((None, cm.group(1),
                               _uniq(cm.group(2) or cm.group(1))))

    if any(f[1] == _STARTAG for f in out.fields):
        # stock: a statement whose select list yields no field errors;
        # tag-star mixed with aggregates is unsupported there too
        if any(f[0] is not None for f in out.fields):
            raise InfluxQLError(
                "cannot mix *::tag with aggregate functions"
            )
        if not ([f for f in out.fields if f[1] != _STARTAG]
                or out.arith or out.raw_arith or out.nested):
            raise InfluxQLError(
                "statement must have at least one field in select clause"
            )

    _parse_where(m.group("where") or "", out, now_ns)

    # GROUP BY — fill() rides on the clause without a comma, so extract
    # it from the raw text first, then parse the remaining tokens.
    group = m.group("group") or ""
    fill_m = re.search(
        r"(?i)fill\s*\(\s*(null|none|previous|linear|-?\d+(?:\.\d+)?)\s*\)", group
    )
    if fill_m:
        v = fill_m.group(1).lower()
        out.fill = float(v) if re.match(r"^-?\d", v) else v
        group = group[: fill_m.start()] + group[fill_m.end():]
    for g in re.split(r",(?![^()]*\))", group) if group.strip() else []:
        g = g.strip()
        if not g:
            continue
        tg = re.match(r"(?i)^time\s*\(\s*(\w+)\s*(?:,\s*(-?\w+)\s*)?\)$", g)
        if tg:
            out.group_time_ns = _parse_duration(tg.group(1))
            if out.group_time_ns <= 0:
                # stock's exact wording (r14 ADVICE #4: clients match
                # error text)
                raise InfluxQLError("time dimension must have positive width")
            if tg.group(2):
                off = tg.group(2)
                sign = -1 if off.startswith("-") else 1
                out.group_time_offset_ns = sign * _parse_duration(off.lstrip("-"))
            continue
        if g == "*":
            # GROUP BY * — every tag, resolved against the frame at
            # execution (Grafana's per-series default)
            out.group_tags.append("*")
            continue
        # a GROUP BY item must be one identifier (bare word, or quoted
        # — quotes may carry spaces); two space-separated tokens like
        # `GROUP BY junk time(1h)` are a missing-comma syntax error in
        # stock InfluxQL, not a tag key (r9 DDL fuzz: that shape used
        # to register as a never-matching tag and silently succeed)
        if not re.match(r'^"[^"]+"$|^[\w.\-]+$', g):
            raise InfluxQLError(f"bad GROUP BY expression {g!r}")
        out.group_tags.append(g.strip('"'))

    out.order_desc = (m.group("ord") or "").upper() == "DESC"
    out.limit = int(m.group("limit")) if m.group("limit") else None
    out.offset = int(m.group("offset") or 0)
    out.slimit = int(m.group("slimit")) if m.group("slimit") else None
    out.soffset = int(m.group("soffset") or 0)
    return out


def _execute_transform(df: DataFrame, ast: InfluxQLQuery, transforms, tag_col) -> DataFrame:
    """DERIVATIVE / DIFFERENCE / CUMULATIVE_SUM / MOVING_AVERAGE /
    ELAPSED (+ NON_NEGATIVE_*): per-point windowed transforms.

    InfluxQL merge semantics: points of all series merge into one
    ordered stream unless ``GROUP BY <tag>`` partitions them. First
    points with no predecessor (and suppressed negatives for the
    NON_NEGATIVE variants) drop, as InfluxDB does.
    """
    from ..operators import analytics as an_ops

    if ast.group_time_ns:
        raise InfluxQLError("transform functions do not support GROUP BY time()")
    if len(transforms) != len(ast.fields):
        raise InfluxQLError("cannot mix transform functions with other select items")
    by = list(ast.group_tags)
    for t in by:
        if t not in df.columns:
            df = df.withColumn(t, tag_col(t))
    order = ["time_ns", "ingest_seq"] if "ingest_seq" in df.columns else None

    def one(fn: str, fld: str, alias: str, df: DataFrame = df) -> DataFrame:
        # prefer a physical column of that name — subquery pseudo-points
        # carry their aliases ('value', 'n') as real columns (r6 fix);
        # any other name is a FIELD: read the value slot restricted to
        # that field's own rows (multi-field frames interleave — r6;
        # an unknown field then correctly yields no rows, like v1)
        src = fld if fld in df.columns else "f_float"
        if src == "f_float" and _null_dispatched(fn, fld, df,
                                                 ast.field_slots):
            # numeric-only transform over a string/bool slot field:
            # stock answers with no series (r12 matrix audit — the
            # NULL float slot previously leaked null rows out of
            # CUMULATIVE_SUM and fed the TA kernels garbage; ELAPSED
            # is any-type and skips this via _ANYTYPE_AGGS)
            df = df.limit(0)
        if src != "f_float":
            from pyspark.sql import types as _T

            if not isinstance(df.schema[src].dataType, _T.NumericType):
                # transform of a non-numeric (subquery-promoted
                # string/bool) column: stock computes nothing — an
                # empty frame with the column re-typed double keeps
                # the output schema and avoids the ANSI cast crash
                # / lag-arithmetic AnalysisException (r11)
                df = df.limit(0).withColumn(src, F.lit(None).cast("double"))
        if src == "f_float" and fld != "*" and "field" in df.columns:
            df = df.filter(F.col("field") == fld)
        args = ast.fn_args.get(alias, [])
        if fn in ("derivative", "non_negative_derivative"):
            unit_s = _parse_duration(args[0]) / 1e9 if args else 1.0
            return an_ops.derivative(
                df, unit_seconds=unit_s, non_negative=fn.startswith("non_"),
                value=src, by=by, alias=alias, order=order,
            ).filter(F.col(alias).isNotNull())
        if fn in ("difference", "non_negative_difference"):
            return an_ops.difference(
                df, non_negative=fn.startswith("non_"), value=src, by=by,
                alias=alias, order=order,
            ).filter(F.col(alias).isNotNull())
        if fn == "cumulative_sum":
            return an_ops.cumulative_sum(df, value=src, by=by, alias=alias, order=order)
        if fn == "moving_average":
            if not args:
                raise InfluxQLError("MOVING_AVERAGE needs a window size")
            return an_ops.moving_average(
                df, n=int(args[0]), value=src, by=by, alias=alias, order=order
            )
        if fn == "elapsed":
            unit_s = _parse_duration(args[0]) / 1e9 if args else 1.0
            return an_ops.elapsed(
                df, unit_seconds=unit_s, by=by, alias=alias, order=order
            ).filter(F.col(alias).isNotNull())
        if fn in _TA_FNS:
            if not args:
                raise InfluxQLError(f"{fn.upper()} needs a period argument")
            return _apply_ta(fn, df, src, int(args[0]), by, alias).filter(
                F.col(alias).isNotNull()
            )
        raise InfluxQLError(f"unhandled transform {fn!r}")

    if len(transforms) == 1:
        fn, fld, alias = transforms[0]
        out = one(fn, fld, alias).select("time", *by, alias)
    else:
        # InfluxQL multi-transform: each computed independently per
        # series, rows aligned on time — a row appears when ANY column
        # is defined (full outer join on the point identity).
        keys = [*by, "time_ns"] + (["ingest_seq"] if "ingest_seq" in df.columns else [])
        acc = None
        for fn, fld, alias in transforms:
            o = one(fn, fld, alias).select(*keys, alias)
            acc = o if acc is None else acc.join(o, on=keys, how="full")
        out = acc.select(
            F.timestamp_micros(F.expr("time_ns div 1000")).alias("time"),
            *by,
            *[alias for _, _, alias in transforms],
        )
    if ast.order_desc:
        out = out.orderBy(F.desc("time"))
    if ast.limit is not None:
        order_cols = ["time"] + (["ingest_seq"] if "ingest_seq" in out.columns else [])
        out = sl_ops.limit(out, ast.limit, ast.offset, by=by, order=order_cols,
                           desc=ast.order_desc)
    return out


def _apply_ta(fn: str, df: DataFrame, src: str, n: int, by: list, alias: str) -> DataFrame:
    """Dispatch an InfluxQL technical-analysis transform to its
    analytics operator. applyInPandas needs ≥1 group column — merged
    (ungrouped) queries fall back to the constant measurement column,
    which is single-valued after the FROM filter."""
    from ..operators import analytics as an_ops

    f = {
        "exponential_moving_average": an_ops.exponential_moving_average,
        "double_exponential_moving_average": an_ops.double_ema,
        "triple_exponential_moving_average": an_ops.triple_ema,
        "relative_strength_index": an_ops.relative_strength_index,
        "chande_momentum_oscillator": an_ops.chande_momentum_oscillator,
        "kaufmans_efficiency_ratio": an_ops.kaufmans_er,
        "kaufmans_adaptive_moving_average": an_ops.kaufmans_ama,
    }[fn]
    return f(df, n=n, value=src, by=by or ["measurement"], alias=alias)


def _math_expr(fn: str, col: Column, args: list):
    """Pointwise math transform (InfluxQL 1.8): ABS/.../LOG(b)/POW/ATAN2.
    CEIL/FLOOR/ROUND return float64, as InfluxDB does."""
    one = {
        "abs": F.abs, "acos": F.acos, "asin": F.asin, "atan": F.atan,
        "cos": F.cos, "exp": F.exp, "ln": F.log, "log2": F.log2,
        "log10": F.log10, "sin": F.sin, "sqrt": F.sqrt, "tan": F.tan,
        "ceil": lambda c: F.ceil(c).cast("double"),
        "floor": lambda c: F.floor(c).cast("double"),
        "round": lambda c: F.round(c).cast("double"),
    }
    if fn in one:
        return one[fn](col)
    if not args:
        raise InfluxQLError(f"{fn.upper()} needs a second argument")
    x = float(args[0])
    if fn == "log":  # LOG(field, b): log base b
        return F.log(x, col)
    if fn == "pow":
        return F.pow(col, F.lit(x))
    if fn == "atan2":
        return F.atan2(col, F.lit(x))
    raise InfluxQLError(f"unhandled math function {fn!r}")


_SUBQUERY_MEAS = "__subquery__"


def _extract_subquery(text: str) -> tuple[str, str] | None:
    """``SELECT ... FROM ( <inner> ) <tail>`` → (inner, outer-with-
    placeholder); None when FROM names a measurement."""
    m = re.search(r"(?is)\bFROM\s*\(", text)
    if not m:
        return None
    start = m.end() - 1
    depth = 0
    for i in range(start, len(text)):
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
            if depth == 0:
                inner = text[start + 1 : i]
                outer = text[: m.start()] + f"FROM {_SUBQUERY_MEAS}" + text[i + 1 :]
                return inner, outer
    raise InfluxQLError("unbalanced parens in FROM subquery")


# columns of the canonical points schema that are NOT promoted tags —
# anything else on a points DF is treated as a promoted tag column by
# the SHOW meta-queries (sources/io promotes hot tags to plain columns).
_NON_TAG_COLS = frozenset(
    {"measurement", "time", "time_ns", "tags", "field", "ftype", "ingest_seq",
     "f_float", "f_int", "f_uint", "f_str", "f_bool", "props",
     # storage-layer columns of a bucket scan — never tags (r8: they
     # leaked into SELECT * / GROUP BY * output)
     "series_key", "day"}
)


def _map_tag_keys(df: DataFrame) -> list[str]:
    """Distinct tag keys of a tags-map frame — ONE small job bounded by
    tag-KEY cardinality (not values, not rows)."""
    return sorted(
        r[0]
        for r in df.select(F.explode(F.map_keys("tags")).alias("k"))
        .distinct()
        .collect()
    )

# v1 SHOW FIELD KEYS type names differ from our ftype discriminators
_V1_FIELD_TYPES = {"float": "float", "int": "integer", "uint": "unsigned",
                   "string": "string", "bool": "boolean"}

_SHOW_RX = re.compile(
    r"(?is)^SHOW\s+(?P<what>MEASUREMENTS|TAG\s+KEYS|TAG\s+VALUES|FIELD\s+KEYS"
    r"|SERIES)"
    r"(?:\s+ON\s+\"?[\w.\-]+\"?)?"
    r"(?:\s+FROM\s+(?:/(?P<measrx>[^/]+)/|\"?(?P<meas>[\w.\-]+)\"?))?"
    r"(?:\s+WITH\s+MEASUREMENT\s*(?:=~\s*/(?P<wmrx>[^/]+)/"
    r"|=\s*\"?(?P<wmeq>[\w.\-]+)\"?))?"
    r"(?:\s+WITH\s+KEY\s*(?:=\s*\"?(?P<key>\w+)\"?|=~\s*/(?P<keyrx>[^/]+)/"
    r"|\s+IN\s*\(\s*(?P<keys>[^)]*)\)))?"
    r"(?:\s+WHERE\s+(?P<where>.+?))?"
    r"(?:\s+LIMIT\s+(?P<limit>\d+))?\s*$"
)


def execute_show(points: DataFrame, query: str) -> DataFrame:
    """InfluxQL v1 meta-queries over a canonical points DF — the
    queries a Grafana InfluxQL datasource issues to populate dropdowns
    (reference serves them on v1 ``/query``; shapes per public InfluxQL
    docs):

        SHOW MEASUREMENTS [WHERE ...] [LIMIT n]       → name
        SHOW TAG KEYS [FROM m]                        → measurement, tagKey
        SHOW TAG VALUES [FROM m] WITH KEY = "k"
            | WITH KEY IN ("a","b") | WITH KEY =~ /re/ → key, value
        SHOW FIELD KEYS [FROM m]                      → measurement, fieldKey, fieldType
        SHOW SERIES [FROM m] [WHERE ...]              → key

    All distinct-scans: Catalyst collapses each to a hash aggregate
    over the pruned column set — at 100 TB these read only the
    dictionary-encoded tag/meta columns, never field payloads.
    """
    m = _SHOW_RX.match(query.strip().rstrip(";"))
    if not m:
        raise InfluxQLError(f"cannot parse SHOW query: {query!r}")
    what = re.sub(r"\s+", " ", m.group("what").upper())

    df = points
    if m.group("measrx"):
        df = df.filter(F.col("measurement").rlike(m.group("measrx")))
    elif m.group("meas"):
        df = df.filter(F.col("measurement") == m.group("meas"))
    # SHOW ... WITH MEASUREMENT =~ /re/ | = name (v1 spec, r6)
    if m.group("wmrx"):
        df = df.filter(F.col("measurement").rlike(m.group("wmrx")))
    elif m.group("wmeq"):
        df = df.filter(F.col("measurement") == m.group("wmeq"))

    # WHERE: time bounds + tag predicates (field filters rejected — v1
    # SHOW only supports tag/time conditions)
    flt = InfluxQLQuery(fields=[], measurement="")
    _parse_where(m.group("where") or "", flt)
    if flt.field_filters:
        raise InfluxQLError("SHOW does not support field conditions")
    from ..operators.core import push_time_filter

    df = push_time_filter(df, flt.time_start_ns, flt.time_stop_ns)

    def tag_expr(name):
        return F.col(name) if name in df.columns else F.col("tags")[name]

    for name, op, val in flt.tag_filters:
        c = tag_expr(name)
        df = df.filter({"=": c == val, "!=": c != val,
                        "=~": c.rlike(val), "!~": ~c.rlike(val)}[op])

    # underscore-prefixed columns are engine-internal (e.g. the raw
    # scan-time companion), never tags
    promoted = [c for c in df.columns
                if c not in _NON_TAG_COLS and not c.startswith("_")]
    has_map = "tags" in df.columns

    if what == "MEASUREMENTS":
        out = df.select(F.col("measurement").alias("name")).distinct().orderBy("name")

    elif what == "TAG KEYS":
        parts = [
            df.filter(tag_expr(c).isNotNull())
            .select("measurement", F.lit(c).alias("tagKey"))
            for c in promoted
        ]
        if has_map:
            parts.append(
                df.select("measurement", F.explode(F.map_keys("tags")).alias("tagKey"))
            )
        if not parts:
            raise InfluxQLError("points DF has no tag columns")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out = out.distinct().orderBy("measurement", "tagKey")

    elif what == "TAG VALUES":
        keyrx = m.group("keyrx")
        if m.group("key"):
            keys = [m.group("key")]
        elif m.group("keys") is not None:
            keys = [k.strip().strip("\"'") for k in m.group("keys").split(",") if k.strip()]
        elif keyrx:
            # regex key match: promoted columns by name, map keys JVM-side
            keys = [c for c in promoted if re.search(keyrx, c)]
        else:
            raise InfluxQLError("SHOW TAG VALUES requires WITH KEY")
        parts = [
            df.select(F.lit(k).alias("key"), tag_expr(k).cast("string").alias("value"))
            for k in keys
        ]
        if has_map and keyrx:
            parts.append(
                df.select(F.explode("tags").alias("key", "value"))
                .filter(F.col("key").rlike(keyrx))
            )
        if not parts:
            raise InfluxQLError("SHOW TAG VALUES matched no keys")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        out = out.filter(F.col("value").isNotNull()).distinct().orderBy("key", "value")

    elif what == "FIELD KEYS":
        v1_type = F.element_at(
            F.create_map(*[F.lit(x) for kv in _V1_FIELD_TYPES.items() for x in kv]),
            F.col("ftype"),
        )
        out = (
            df.select("measurement", F.col("field").alias("fieldKey"),
                      v1_type.alias("fieldType"))
            .distinct()
            .orderBy("measurement", "fieldKey")
        )

    else:  # SERIES
        pairs = [
            F.when(tag_expr(c).isNotNull(),
                   F.concat(F.lit(c), F.lit("="), tag_expr(c).cast("string")))
            for c in promoted
        ]
        arr = F.array_compact(F.array(*pairs)) if pairs else F.array()
        if has_map:
            map_pairs = F.transform(
                F.map_entries(F.coalesce(F.col("tags"), F.create_map())),
                lambda e: F.concat(e["key"], F.lit("="), e["value"]),
            )
            arr = F.concat(arr, map_pairs)
        key = F.concat_ws(",", F.concat(F.array("measurement"), F.array_sort(arr)))
        out = df.select(key.alias("key")).distinct().orderBy("key")

    if m.group("limit"):
        out = out.limit(int(m.group("limit")))
    return out


_SHOW_CARD_RX = re.compile(
    r"(?is)^SHOW\s+(?P<what>MEASUREMENT|SERIES|FIELD\s+KEY|TAG\s+KEY|TAG\s+VALUES)\s+"
    r"(?:(?P<exact>EXACT)\s+)?CARDINALITY"
    r"(?:\s+FROM\s+(?:/(?P<measrx>[^/]+)/|\"?(?P<meas>[\w.\-]+)\"?))?"
    r'(?:\s+WITH\s+KEY\s*=\s*"?(?P<key>\w+)"?)?'
    r"(?:\s+WHERE\s+(?P<where>.+?))?\s*$"
)


def execute_show_cardinality(points: DataFrame, query: str) -> DataFrame:
    """InfluxQL ``SHOW <x> [EXACT] CARDINALITY`` — the series-growth
    monitoring queries (public InfluxQL 1.8 surface):

        SHOW MEASUREMENT CARDINALITY | SERIES CARDINALITY
        SHOW FIELD KEY CARDINALITY | TAG KEY CARDINALITY
        SHOW TAG VALUES CARDINALITY WITH KEY = "k"

    Without ``EXACT`` this maps to ``approx_count_distinct`` — the
    same estimated-by-sketch contract InfluxDB documents (it serves a
    HyperLogLog estimate), and at 100 TB the only sane default: one
    pass, fixed memory, mergeable partials. ``EXACT`` uses a real
    countDistinct (one shuffle of distinct keys). Output: ``count``.
    """
    m = _SHOW_CARD_RX.match(query.strip().rstrip(";"))
    if not m:
        raise InfluxQLError(f"cannot parse SHOW CARDINALITY query: {query!r}")
    what = re.sub(r"\s+", " ", m.group("what").upper())
    exact = m.group("exact") is not None

    df = points
    if m.group("measrx"):
        df = df.filter(F.col("measurement").rlike(m.group("measrx")))
    elif m.group("meas"):
        df = df.filter(F.col("measurement") == m.group("meas"))
    flt = InfluxQLQuery(fields=[], measurement="")
    _parse_where(m.group("where") or "", flt)
    if flt.field_filters:
        raise InfluxQLError("SHOW CARDINALITY does not support field conditions")
    from ..operators.core import push_time_filter

    df = push_time_filter(df, flt.time_start_ns, flt.time_stop_ns)

    def tag_expr(name):
        return F.col(name) if name in df.columns else F.col("tags")[name]

    for name, op, val in flt.tag_filters:
        c = tag_expr(name)
        df = df.filter({"=": c == val, "!=": c != val,
                        "=~": c.rlike(val), "!~": ~c.rlike(val)}[op])

    promoted = [c for c in df.columns
                if c not in _NON_TAG_COLS and not c.startswith("_")]
    has_map = "tags" in df.columns

    def count_distinct_of(frame: DataFrame, col) -> DataFrame:
        agg = (F.count_distinct(col) if exact
               else F.approx_count_distinct(col)).cast("long").alias("count")
        return frame.agg(agg)

    if what == "MEASUREMENT":
        return count_distinct_of(df, F.col("measurement"))
    if what == "FIELD KEY":
        return count_distinct_of(
            df, F.concat_ws("\u001f", "measurement", "field")
        )
    if what == "TAG KEY":
        parts = [
            df.filter(tag_expr(c).isNotNull()).select(F.lit(c).alias("tagKey"))
            for c in promoted
        ]
        if has_map:
            parts.append(df.select(F.explode(F.map_keys("tags")).alias("tagKey")))
        if not parts:
            raise InfluxQLError("points DF has no tag columns")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return count_distinct_of(out, F.col("tagKey"))
    if what == "TAG VALUES":
        if not m.group("key"):
            raise InfluxQLError("SHOW TAG VALUES CARDINALITY requires WITH KEY")
        return count_distinct_of(
            df.filter(tag_expr(m.group("key")).isNotNull()),
            tag_expr(m.group("key")),
        )
    # SERIES: same key construction as SHOW SERIES
    pairs = [
        F.when(tag_expr(c).isNotNull(),
               F.concat(F.lit(c), F.lit("="), tag_expr(c).cast("string")))
        for c in promoted
    ]
    arr = F.array_compact(F.array(*pairs)) if pairs else F.array()
    if has_map:
        map_pairs = F.transform(
            F.map_entries(F.coalesce(F.col("tags"), F.create_map())),
            lambda e: F.concat(e["key"], F.lit("="), e["value"]),
        )
        arr = F.concat(arr, map_pairs)
    key = F.concat_ws(",", F.concat(F.array("measurement"), F.array_sort(arr)))
    return count_distinct_of(df, key)


def _execute_multi_row(
    df: DataFrame, ast: InfluxQLQuery, sel, tag_col, extras=()
) -> DataFrame:
    """TOP / BOTTOM / DISTINCT / SAMPLE — InfluxQL functions that emit
    multiple rows per group (so they can't join the single-row
    aggregate list). TOP/BOTTOM/SAMPLE keep the source point's
    timestamp (v1 semantics) and may carry accompanying bare columns
    from the selected rows (``SELECT TOP(value, 3), event_type``);
    DISTINCT emits the window start (or no time column when
    ungrouped)."""
    fn, fld, alias = sel
    by = list(ast.group_tags)
    if fn in ("top", "bottom") and _null_dispatched(
        fn, fld, df, ast.field_slots
    ):
        # stock TOP/BOTTOM support int64/float64 only: over a string
        # or bool field the statement answers with NO series, never
        # lexicographic rows (r11 verdict #2 — the MIN/MAX/PERCENTILE
        # short-circuit never reached this branch). Covers the
        # TOP(field, tag_key..., N) variant too.
        df = df.limit(0)
    # TOP/BOTTOM/SAMPLE may carry companion FIELDS too (r10):
    # SELECT TOP(value, 3), status — same per-point stitch as the
    # selector-row path
    df = _attach_companion_fields(df, ast, extras)
    if fld != "*" and fld in df.columns:
        src = fld
    else:
        # ftype-resolved slot (r10: DISTINCT/SAMPLE of string fields)
        src = ast.field_slots.get(fld, "f_float")
        if fld != "*" and "field" in df.columns:
            # named field → its own rows only (multi-field frames, r6)
            df = df.filter(F.col("field") == fld)
    args = ast.fn_args.get(alias) or []
    if ast.group_time_ns:
        df = df.withColumn(
            "_ws",
            window_start_ns(_window_src_ns(ast), ast.group_time_ns,
                            ast.group_time_offset_ns),
        )
        keys = [*by, "_ws"]
    else:
        keys = by
    # group tags may live in the tags map — materialize them as columns
    for t in by:
        if t not in df.columns:
            df = df.withColumn(t, tag_col(t))

    def _with_extras(picked: DataFrame, also: Sequence[str] = ()) -> DataFrame:
        cols = [F.col("time"), *[F.col(t) for t in by], F.col(src).alias(alias)]
        for t in also:
            if t not in by:
                cols.append(F.col(t))
        for _fn, f2, a2 in extras:
            if f2 in by:
                continue
            c2 = F.col(f2) if f2 in picked.columns else tag_col(f2)
            cols.append(c2.alias(a2))
        return picked.select(*cols)

    if fn in ("top", "bottom"):
        if not args:
            raise InfluxQLError(f"{fn.upper()} needs (field, n)")
        sel = sel_ops.top if fn == "top" else sel_ops.bottom
        tag_keys = list(args[:-1])
        if tag_keys:
            # TOP(field, tag_key..., N): the single greatest point per
            # tag combo, then the N best combos — two window ranks, no
            # self-join (reference semantics: N distinct tag values)
            for t in tag_keys:
                if t not in df.columns:
                    df = df.withColumn(t, tag_col(t))
            per_tag = sel(df, 1, by=[*keys, *tag_keys], value=src)
            picked = sel(per_tag, int(args[-1]), by=keys, value=src)
            out = _with_extras(picked, also=tag_keys)
        else:
            picked = sel(df, int(args[0]), by=keys, value=src)
            out = _with_extras(picked)
    elif fn == "sample":
        if not args:
            raise InfluxQLError("SAMPLE needs (field, n)")
        picked = sel_ops.sample(df, int(args[0]), by=keys)
        out = _with_extras(picked)
    else:  # distinct
        out = df.select(*keys, F.col(src).alias(alias)).distinct()
        if ast.group_time_ns:
            out = out.withColumn("time", _ws_time_expr(ast)).drop("_ws")

    if ast.order_desc and "time" in out.columns:
        out = out.orderBy(F.desc("time"))
    if ast.slimit is not None and by:
        out = sl_ops.slimit(out, ast.slimit, series=by, soffset=ast.soffset)
    if ast.limit is not None:
        order = "time" if "time" in out.columns else alias
        out = sl_ops.limit(out, ast.limit, ast.offset, by=by, order=order,
                           desc=ast.order_desc)
    return out


def execute_influxql(points: DataFrame, query: str, tag_cols: tuple[str, ...] = (),
                     now_ns: int | None = None,
                     field_types: dict | None = None) -> DataFrame:
    """Compile + run an InfluxQL query against a canonical points DF.

    ``tag_cols`` names promoted tag columns available for GROUP BY /
    WHERE (a tags-map fallback covers the rest). ``FROM (SELECT ...)``
    subqueries run the inner query first and treat its result as the
    outer query's measurement (DataFrame composition — the inner plan
    feeds the outer directly, no materialization).

    ``field_types`` is the bucket store's field-type catalog
    ``{measurement: {field: ftype}}`` (BucketStore.field_types) — when
    provided, field→slot resolution reads it driver-side with ZERO
    Spark jobs; without it, mixed-type frames run one bounded distinct
    job on the ftype discriminator (r10).
    """
    if re.match(r"(?is)^\s*SHOW\b", query):
        if re.search(r"(?i)\bCARDINALITY\b", query):
            return execute_show_cardinality(points, query)
        return execute_show(points, query)
    from ..schema import unify_numeric_value

    points = unify_numeric_value(points)  # int/uint slots → value column
    em = re.match(r"(?is)^\s*EXPLAIN(\s+ANALYZE)?\s+(.+)$", query.strip())
    if em:
        # v1 EXPLAIN/EXPLAIN ANALYZE: in this engine the truthful answer
        # is the Catalyst plan — EXPLAIN returns the optimized logical +
        # physical plan for the statement; ANALYZE executes it first so
        # AQE's final (adaptive) physical plan is shown.
        inner = execute_influxql(points, em.group(2), tag_cols,
                                 field_types=field_types)
        if em.group(1):
            inner.count()  # drive execution so AQE finalizes the plan
        qe = inner._jdf.queryExecution()
        text = qe.explainString(
            inner._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        spark = points.sparkSession
        return spark.createDataFrame(
            [(i, line) for i, line in enumerate(text.splitlines())],
            "line int, plan string",
        )
    sub = _extract_subquery(query.strip().rstrip(";"))
    if sub is not None:
        inner_text, outer_text = sub
        inner = execute_influxql(points, inner_text, tag_cols,
                                 field_types=field_types)
        if "time" not in inner.columns:
            # aggregate rows without time grouping carry timestamp 0 in
            # InfluxQL (SELECT mean(m) FROM (SELECT mean(v) .. GROUP BY tag))
            inner = inner.withColumn("time", F.timestamp_micros(F.lit(0)))
        pseudo = inner.withColumn(
            "time_ns", F.expr("unix_micros(time) * 1000")
        ).withColumn("measurement", F.lit(_SUBQUERY_MEAS))
        return execute_influxql(pseudo, outer_text, tag_cols, now_ns)

    ast = parse_influxql(query, now_ns)
    multi_meas = ast.measurement_regex is not None or len(ast.measurements) > 1
    if ast.measurement_regex is not None:
        df = points.filter(F.col("measurement").rlike(ast.measurement_regex))
    elif len(ast.measurements) > 1:
        df = points.filter(F.col("measurement").isin(ast.measurements))
    else:
        df = points.filter(F.col("measurement") == ast.measurement)

    from ..operators.core import push_time_filter

    df = push_time_filter(df, ast.time_start_ns, ast.time_stop_ns)

    # ftype-resolved slot map for every referenced name that is not a
    # physical column — gated inside _resolve_field_slots on the frame
    # actually carrying string/bool slots, so float-only suite frames
    # never run the lookup job. WHERE names are included so a string
    # condition like status = 'ok' can be recognized as a FIELD
    # condition (stock resolves bare identifiers field-first).
    refs: set = set()
    for _fn, _fld, _a in ast.fields:
        if _fld and _fld != "*":
            refs.add(_fld)
    for _tr, _ag, _fld, _a in ast.nested:
        refs.add(_fld)
    for _nm, _op, _v in ast.field_filters:
        if not _nm.startswith("__expr__"):
            refs.add(_nm)
    for _nm, _op, _v in ast.tag_filters:
        refs.add(_nm)
    for _grp in ast.or_tag_groups:
        for _nm, _op, _v in _grp:
            refs.add(_nm)

    def _tree_ref_walk(tree):
        if tree[0] == "field":
            refs.add(tree[1])
        elif tree[0] == "agg":
            refs.add(tree[2])
        elif tree[0] == "bin":
            _tree_ref_walk(tree[2])
            _tree_ref_walk(tree[3])

    for _tree, _a in ast.arith:
        _tree_ref_walk(_tree)
    for _tree, _a in ast.raw_arith:
        _tree_ref_walk(_tree)
    refs = {r for r in refs if r and r != "*" and r not in df.columns
            and not r.startswith(_RE_FLD)}
    if field_types is not None:
        # catalog-driven: zero Spark jobs. Only the QUERIED
        # measurements' maps apply (a field name may type differently
        # across measurements; float wins on a cross-measurement mix).
        if ast.measurement_regex is not None:
            metas = [m for m in field_types
                     if re.search(ast.measurement_regex, m)]
        else:
            metas = [m for m in (ast.measurements or [ast.measurement])]
        slots: dict = {}
        for m in metas:
            for f, t in (field_types.get(m) or {}).items():
                if f in refs:
                    s = _SLOT_OF_FTYPE.get(t, "f_float")
                    if f not in slots or s == "f_float":
                        slots[f] = s
        ast.field_slots = {k: v for k, v in slots.items()
                           if v in df.columns}
    else:
        ast.field_slots = _resolve_field_slots(df, refs)

    _expand_star_aggs(ast, df, field_types)

    # string/bool conditions parse as tag-shaped (quoted RHS); when the
    # name is a known string/bool FIELD KEY of this frame, reroute it
    # to the field-condition path below (a tags-map read would be NULL
    # and silently drop every row — the r9 verdict's open defect)
    if ast.field_slots:
        kept = []
        for name, op, val in ast.tag_filters:
            slot = ast.field_slots.get(name)
            if slot in ("f_str", "f_bool") and name not in df.columns:
                ast.field_filters.append((name, op, val))
            else:
                kept.append((name, op, val))
        ast.tag_filters = kept

    def tag_col(name):
        if name in df.columns:
            return F.col(name)
        return F.col("tags")[name]

    def tag_cond(name: str, op: str, val: str):
        c = tag_col(name)
        return {
            "=": lambda: c == val,
            "!=": lambda: c != val,
            "=~": lambda: c.rlike(val),
            "!~": lambda: ~c.rlike(val),
        }[op]()

    def _point_semi(frame: DataFrame, cond: Column) -> DataFrame:
        """Keep every row of POINTS where ``cond`` holds on any of the
        point's rows — v1's per-point WHERE over the tall frame. One
        left-semi join on the point identity (measurement, serialized
        series tags, timestamp); AQE broadcasts the passing side when
        the predicate is selective."""
        ident = [c for c in ("measurement", "time_ns") if c in frame.columns]
        if "tags" in frame.columns:
            tagkey = F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.map_keys(F.col("tags"))),
                    lambda k: F.concat_ws(
                        "=", k, F.element_at(F.col("tags"), k)
                    ),
                ),
            )
        else:
            promoted = [c for c in frame.columns
                        if c not in _NON_TAG_COLS
                        and not c.startswith("_")]
            tagkey = F.concat_ws(
                ",", *[F.col(c).cast("string") for c in promoted]
            ) if promoted else F.lit("")
        frame = frame.withColumn("_pt_tags", tagkey)
        passing = (frame.filter(cond)
                   .select(*ident, "_pt_tags").distinct())
        return (frame.join(passing, on=[*ident, "_pt_tags"], how="leftsemi")
                .drop("_pt_tags"))

    def _field_cond(name: str, op: str, val) -> Column:
        """Row-local condition for a known string/bool FIELD key."""
        slot = ast.field_slots[name]
        rhs = val
        if slot == "f_bool" and isinstance(val, str):
            rhs = val.strip().lower() in ("true", "t", "1")
        return (F.col("field") == name) & _cmp_cond(F.col(slot), op, rhs)

    for name, op, val in ast.tag_filters:
        df = df.filter(tag_cond(name, op, val))
    for group in ast.or_tag_groups:
        # OR groups may mix tag conditions with string/bool FIELD
        # conditions (r10): any field member makes the whole group
        # point-level (a field's value lives on one row of the point,
        # so a row-local OR would drop the point's other-field rows)
        conds = []
        any_field = False
        for name, op, val in group:
            if isinstance(val, float):
                # numeric member ⇒ field condition (v1: tags are strings)
                if name in df.columns:
                    conds.append(_cmp_cond(F.col(name), op, val))
                elif "field" in df.columns:
                    any_field = True
                    slot = ast.field_slots.get(name, "f_float")
                    if slot in ("f_str", "f_bool"):
                        conds.append(F.lit(False))  # type mismatch: no rows
                    else:
                        conds.append(
                            (F.col("field") == name)
                            & _cmp_cond(F.col(slot), op, val)
                        )
                else:
                    conds.append(_cmp_cond(F.col("f_float"), op, val))
            elif (name in ast.field_slots and name not in df.columns
                    and "field" in df.columns
                    and ast.field_slots[name] in ("f_str", "f_bool")):
                any_field = True
                conds.append(_field_cond(name, op, val))
            else:
                conds.append(tag_cond(name, op, val))
        acc = conds[0]
        for c in conds[1:]:
            acc = acc | c
        df = _point_semi(df, acc) if any_field else df.filter(acc)
    for name, op, val in ast.field_filters:
        if name.startswith("__expr__"):
            # arithmetic condition. Identifiers followed by '(' are
            # function calls, not field refs — allow the InfluxQL math
            # set, reject the rest (a blind swap would produce
            # nonsense like f_float(f_float)).
            #
            # Field idents (r12): stock evaluates WHERE arithmetic per
            # POINT — the old unconditional f_float swap read whatever
            # field owned the row, so `WHERE v * 2 > 100` gated OTHER
            # fields' rows on their own values, and a string/bool
            # field crashed the ANSI cast. Fast path kept: when the
            # condition references one float field and the selection
            # reads only that field, the row-local filter is identical
            # (the selection keeps only that field's rows) and stays
            # scan-level. Otherwise attach the referenced fields'
            # per-point values and evaluate on those.
            raw = name[len("__expr__"):]
            idents = []
            for mo in re.finditer(r"\b[A-Za-z_]\w*\b", raw):
                if raw[mo.end():].lstrip().startswith("("):
                    continue
                if mo.group(0) not in df.columns and mo.group(0) not in idents:
                    idents.append(mo.group(0))
            sel_fields = {f for _fn, f, _a in ast.fields if f}
            for _tr2, _ag2, _fld2, _a2 in ast.nested:
                sel_fields.add(_fld2)

            # arithmetic selections reference fields too (r12 ADVICE:
            # `SELECT v1 + v2 ... WHERE v1 * 2 > 100` built an EMPTY
            # sel_fields, took the fast path, and the scan-level
            # filter gated v2's rows on their own values — exactly the
            # per-point bug the fast path is an optimization of)
            def _sel_tree_fields(tree):
                if tree[0] == "field":
                    sel_fields.add(tree[1])
                elif tree[0] == "agg":
                    sel_fields.add(tree[2])
                elif tree[0] == "bin":
                    _sel_tree_fields(tree[2])
                    _sel_tree_fields(tree[3])

            for _tr3, _a3 in ast.arith:
                _sel_tree_fields(_tr3)
            for _tr3, _a3 in ast.raw_arith:
                _sel_tree_fields(_tr3)
            fast = (
                len(idents) <= 1
                and all(ast.field_slots.get(i, "f_float") == "f_float"
                        for i in idents)
                and sel_fields <= set(idents)
            )
            target, added = df, []
            if idents and not fast and "field" in df.columns:
                target = _attach_companion_fields(
                    df, ast, [(None, i, i) for i in idents])
                added = [c for c in target.columns if c not in df.columns]

            def _swap(mo, target=target):
                ident = mo.group(0)
                rest = raw[mo.end():]
                if rest.lstrip().startswith("("):
                    if ident.lower() in _EXPR_FNS:
                        return ident
                    raise InfluxQLError(
                        f"unsupported function {ident}() in WHERE condition"
                    )
                if ident in target.columns:
                    from pyspark.sql import types as _T

                    if not isinstance(target.schema[ident].dataType,
                                      _T.NumericType):
                        # numeric arithmetic over a string/bool field:
                        # stock computes nothing (r12 matrix audit)
                        return "CAST(NULL AS DOUBLE)"
                    return f"`{ident}`"
                return "f_float"

            sql = re.sub(r"\b[A-Za-z_]\w*\b", _swap, raw)
            cond = _cmp_cond(F.expr(sql), op, val)
            if target is df:
                df = df.filter(cond)
            else:
                # per-point semantics: keep every row of points whose
                # attached field values satisfy the arithmetic, then
                # drop the helper columns so selection/pivot machinery
                # sees the untouched tall shape
                df = _point_semi(target, cond).drop(*added)
            continue
        if name in df.columns:
            df = df.filter(_cmp_cond(F.col(name), op, val))
            continue
        slot = ast.field_slots.get(name, "f_float")
        rhs = val
        if slot == "f_bool" and isinstance(val, str):
            rhs = val.strip().lower() in ("true", "t", "1")
        elif slot in ("f_str", "f_bool") and isinstance(val, (int, float)):
            # numeric comparison against a string/bool field: stock
            # yields no rows; never let ANSI cast errors surface
            df = df.filter(F.lit(False))
            continue
        elif slot == "f_float" and op in (">", ">=", "<", "<=") \
                and isinstance(val, str):
            # string-literal range compare against a numeric field —
            # same stock no-rows contract
            df = df.filter(F.lit(False))
            continue
        if "field" not in df.columns:
            df = df.filter(_cmp_cond(F.col(slot), op, rhs))
            continue
        cond = (F.col("field") == name) & _cmp_cond(F.col(slot), op, rhs)
        # every field the SELECTION reads — including aggregate
        # arithmetic, nested transforms, and raw arithmetic trees
        # (r10: an empty ast.fields for mean(a)+mean(b) wrongly
        # routed a cross-field condition row-local, dropping b's rows)
        sel_fields = {f for _fn, f, _a in ast.fields if f}
        for _tr2, _ag2, _fld2, _a2 in ast.nested:
            sel_fields.add(_fld2)

        def _sel_walk(tree):
            if tree[0] == "field":
                sel_fields.add(tree[1])
            elif tree[0] == "agg":
                sel_fields.add(tree[2])
            elif tree[0] == "bin":
                _sel_walk(tree[2])
                _sel_walk(tree[3])

        for _tree2, _a2 in ast.arith:
            _sel_walk(_tree2)
        for _tree2, _a2 in ast.raw_arith:
            _sel_walk(_tree2)
        if sel_fields <= {name}:
            # self-referential single-field condition (SELECT v WHERE
            # v > 5): row-local filter, fully pushdown-able — the
            # common dashboard shape keeps its scan-level plan
            df = df.filter(cond)
        else:
            # cross-field / star condition (SELECT value WHERE
            # status = 'ok'): stock v1 evaluates WHERE per POINT —
            # keep every row of points whose named field passes.
            df = _point_semi(df, cond)

    by = list(ast.group_tags)
    if "*" in by:
        # GROUP BY *: every promoted tag column, plus (for stored
        # buckets carrying a tags MAP) the discovered map keys — one
        # small distinct job bounded by tag-key cardinality (r8: the
        # map variant previously fell through and grouped by nothing)
        by = [c for c in df.columns
              if c not in _NON_TAG_COLS and not c.startswith("_")]
        if "tags" in df.columns:
            by = sorted(set(by) | set(_map_tag_keys(df)))
        ast.group_tags = by
    if multi_meas and "measurement" not in by:
        # multi-measurement queries (comma list / regex) never merge
        # points across measurements — one output series each, like
        # InfluxDB's per-measurement result blocks
        by = ["measurement", *by]
        ast.group_tags = by
    # group tags living in the tags map become real columns once, for
    # every downstream path (aggregate, transform, multi-row, nested)
    for t in by:
        if t not in df.columns:
            df = df.withColumn(t, tag_col(t))
    transforms = [(fn, fld, al) for fn, fld, al in ast.fields
                  if fn in _TRANSFORMS or fn in _TA_FNS]
    if transforms:
        return _execute_transform(df, ast, transforms, tag_col)

    multi = [(fn, fld, al) for fn, fld, al in ast.fields if fn in _MULTI_ROW]
    if multi:
        extras = [f for f in ast.fields if f not in multi]
        if len(multi) > 1 or any(fn2 is not None for fn2, _, _ in extras):
            raise InfluxQLError(
                "TOP/BOTTOM/DISTINCT/SAMPLE must be the only function selection"
            )
        if extras and multi[0][0] == "distinct":
            raise InfluxQLError("DISTINCT must be the only selection")
        return _execute_multi_row(df, ast, multi[0], tag_col, extras=extras)

    if ast.nested:
        return _execute_nested(df, ast, by, tag_col)

    # single selector + accompanying bare columns: InfluxDB selector
    # queries return the SELECTED POINT, so named tags/fields ride
    # along (SELECT LAST(value), event_type ... / SELECT
    # PERCENTILE(value, 95), event_type ... GROUP BY event_type)
    bare = [f for f in ast.fields if f[0] is None]
    fn_fields = [f for f in ast.fields if f[0] is not None]
    if (
        bare
        and len(fn_fields) == 1
        and fn_fields[0][0] in ("first", "last", "max", "min", "percentile")
        and not ast.arith
        and not ast.raw_arith
    ):
        return _execute_selector_row(df, ast, fn_fields[0], bare, by, tag_col)

    has_agg = (
        any(fn and fn not in _MATH_FNS for fn, _, _ in ast.fields)
        or bool(ast.arith)
    )
    if ast.raw_arith and has_agg:
        # InfluxQL rejects mixing raw projections with aggregates
        # query-wide; dropping either silently would be worse
        raise InfluxQLError(
            "cannot mix raw field expressions with aggregate selections"
        )

    if not has_agg:
        if ast.group_time_ns:
            # stock v1 rejects raw projections windowed by time —
            # previously the clause was silently ignored (r11 probe)
            raise InfluxQLError(
                "GROUP BY requires at least one aggregate function"
            )
        # named slot fields read only their OWN rows (multi-field
        # frames interleave fields in the tall schema — r6 fix): drop
        # other-field rows, and make each projection conditional
        def _tree_fields(tree, acc):
            if tree[0] == "field":
                acc.add(tree[1])
            elif tree[0] == "bin":
                _tree_fields(tree[2], acc)
                _tree_fields(tree[3], acc)
            return acc

        slot_fields: set = set()
        for fn, fld, alias in ast.fields:
            if (fld != "*" and fld != _STARTAG
                    and not fld.startswith(_RE_FLD)
                    and fld not in df.columns):
                slot_fields.add(fld)
        for tree, _alias in ast.raw_arith:
            slot_fields = {
                f for f in _tree_fields(tree, slot_fields)
                if f != "*" and f not in df.columns
            }
        if slot_fields and "field" in df.columns:
            df = df.filter(F.col("field").isin(sorted(slot_fields)))
        if len(slot_fields) >= 2 and "field" in df.columns:
            # multi-field raw select: stock v1 merges the fields of one
            # point into ONE row ([time, a, b]); the tall frame holds
            # one row per field. Pivot per point identity FIRST so every
            # downstream projection (math fns, cross-field raw
            # arithmetic like a + b) reads physical per-point columns —
            # single-field selects (the common dashboard shape) skip
            # this and keep their scan-level plan.
            group_keys = [c for c in ("measurement", "time", "time_ns")
                          if c in df.columns]
            carry = []
            if "tags" in df.columns:
                df = df.withColumn(
                    "_pt_tags",
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.array_sort(F.map_keys(F.col("tags"))),
                            lambda k: F.concat_ws(
                                "=", k, F.element_at(F.col("tags"), k)
                            ),
                        ),
                    ),
                )
                group_keys.append("_pt_tags")
                carry.append(F.first("tags").alias("tags"))
            group_keys += [c for c in df.columns
                           if c not in _NON_TAG_COLS
                           and not c.startswith("_")
                           and c not in group_keys]
            if "ingest_seq" in df.columns:
                carry.append(F.min("ingest_seq").alias("ingest_seq"))
            df = (
                df.groupBy(*group_keys)
                .agg(*carry, *[
                    F.first(
                        F.when(
                            F.col("field") == f,
                            F.col(ast.field_slots.get(f, "f_float")),
                        ),
                        ignorenulls=True,
                    ).alias(f)
                    for f in sorted(slot_fields)
                ])
                .drop("_pt_tags")
            )

        def _raw_col(tree):
            kind = tree[0]
            if kind == "num":
                return F.lit(tree[1])
            if kind == "field":
                return _numeric_value_col(tree[1], df, ast.field_slots)
            _, op, l, r = tree
            lc, rc = _raw_col(l), _raw_col(r)
            return {"+": lc + rc, "-": lc - rc,
                    "*": lc * rc, "/": lc / rc}[op]

        # r12 matrix audit: when EVERY selected item consumes a
        # string/bool field numerically (math fns, raw arithmetic),
        # stock answers with no series — previously null rows (and a
        # raw ANSI cast crash for slot-typed fields, fixed in
        # _numeric_value_col). A numeric or any-type sibling keeps the
        # statement alive with the null column riding along.
        nd_items = []
        for fn, fld, _a in ast.fields:
            nd_items.append(
                fn in _MATH_FNS
                and _null_dispatched(fn, fld, df, ast.field_slots)
            )
        for tree, _a in ast.raw_arith:
            tfs = _tree_fields(tree, set())
            nd_items.append(bool(tfs) and all(
                _null_dispatched("mean", f, df, ast.field_slots)
                for f in tfs
            ))
        if nd_items and all(nd_items):
            df = df.limit(0)

        sel = [F.col("time"), *[tag_col(t).alias(t) for t in by]]
        for fn, fld, alias in ast.fields:
            if fld == _STARTAG and fn is None:
                # `*::tag`: every tag key as a column (promoted columns
                # directly, tags-map keys materialized) — the TAG half
                # of the `*` branch below, with no field pivot. Field
                # columns the multi-field pivot promoted are NOT tags.
                for t in df.columns:
                    if (t not in _NON_TAG_COLS and not t.startswith("_")
                            and t not in by and t not in slot_fields):
                        sel.append(F.col(t))
                if "tags" in df.columns:
                    for t in _map_tag_keys(df):
                        if t not in df.columns and t not in by:
                            sel.append(F.col("tags")[t].alias(t))
                continue
            if (fld == "*" or fld.startswith(_RE_FLD)) and fn is None:
                # SELECT *: every tag rides along with the field value
                # (InfluxDB 1.x star semantics) — promoted columns
                # directly, tags-map keys materialized (r8; previously
                # the map variant leaked storage columns instead).
                # SELECT *::field (r11): fields only — tags stay off
                # the row, matching stock's namespace-restricted star.
                # SELECT /re/ (r11): star restricted to keys matching
                # the pattern — stock matches field AND tag keys.
                rx = fld[len(_RE_FLD):] if fld.startswith(_RE_FLD) else None

                def _key_ok(k: str) -> bool:
                    return rx is None or re.search(rx, k) is not None

                if not ast.star_fields_only:
                    for t in df.columns:
                        if (t not in _NON_TAG_COLS and not t.startswith("_")
                                and t not in by and _key_ok(t)):
                            sel.append(F.col(t))
                    if "tags" in df.columns:
                        for t in _map_tag_keys(df):
                            if (t not in df.columns and t not in by
                                    and _key_ok(t)):
                                sel.append(F.col("tags")[t].alias(t))
                if "field" in df.columns:
                    # stock star shape: one column per FIELD KEY per
                    # timestamp, named by the field, each TYPED by its
                    # ftype slot (r10 — the old f_float-only pivot
                    # returned NULL for string/bool fields). The
                    # conditional-first aggregation groups on the row
                    # identity already in `sel`, so series stay intact;
                    # the (field, ftype) distinct is bounded by
                    # field-key cardinality.
                    # NOTE: deliberately NOT read from the field-type
                    # catalog — stock star columns are the fields with
                    # points IN THE QUERIED RANGE, which only the
                    # filtered frame knows (the catalog lists every
                    # field ever written)
                    if "ftype" in df.columns:
                        pairs = df.select("field", "ftype").distinct().collect()
                    else:
                        pairs = [
                            (r[0], "float")
                            for r in df.select("field").distinct().collect()
                        ]
                    fmap: dict = {}
                    for r in pairs:
                        if not _key_ok(r[0]):
                            continue
                        s = _SLOT_OF_FTYPE.get(r[1], "f_float")
                        if s not in df.columns:
                            s = "f_float"
                        if r[0] not in fmap or s == "f_float":
                            fmap[r[0]] = s
                    if not fmap:
                        # regex matched no FIELD key (tags-only or
                        # nothing): stock answers with no series
                        return df.select(*sel).limit(0)
                    row_ident = df.select(*sel).columns
                    slot_cols = [c for c in ("f_float", "f_str", "f_bool")
                                 if c in df.columns]
                    out = (
                        df.select(*sel, F.col("field"), *slot_cols)
                        .groupBy(*row_ident)
                        .agg(*[
                            F.first(
                                F.when(F.col("field") == f, F.col(s)),
                                ignorenulls=True,
                            ).alias(f)
                            for f, s in sorted(fmap.items())
                        ])
                    )
                    if ast.limit is not None:
                        out = sl_ops.limit(
                            out, ast.limit, ast.offset, by=by,
                            order=["time"], desc=ast.order_desc)
                    if ast.slimit is not None and by:
                        out = sl_ops.slimit(out, ast.slimit, series=by,
                                            soffset=ast.soffset)
                    # the pivot's groupBy destroyed row order — stock
                    # returns time-ascending (or DESC) values always,
                    # not only under LIMIT (r9 ADVICE fix)
                    tcol = (F.col("time").desc() if ast.order_desc
                            else F.col("time"))
                    return out.orderBy(*[c for c in by if c in out.columns],
                                       tcol)
                sel.append(F.col("f_float").alias(alias))
                continue
            if fn in _MATH_FNS:
                col = _math_expr(fn, _numeric_value_col(fld, df, ast.field_slots),
                                 ast.fn_args.get(alias, []))
            else:
                col = _field_value_col(fld, df, ast.field_slots)
            sel.append(col.alias(alias))
        for tree, alias in ast.raw_arith:
            # per-row field arithmetic (SELECT value * 8 / 1024 ...) —
            # a plain Column projection, whole-stage-codegen'd
            sel.append(_raw_col(tree).alias(alias))
        out = df.select(*sel)
        if ast.limit is not None:
            order_cols = ["time"] + (
                ["ingest_seq"] if "ingest_seq" in out.columns else []
            )
            out = sl_ops.limit(out, ast.limit, ast.offset, by=by,
                               order=order_cols, desc=ast.order_desc)
        if ast.slimit is not None and by:
            # raw selects honor SLIMIT/SOFFSET too (r8: only the
            # aggregate path ranked series)
            out = sl_ops.slimit(out, ast.slimit, series=by,
                                soffset=ast.soffset)
        # stock emits raw values time-ascending (or DESC) always — a
        # bare `SELECT f FROM m` with no LIMIT must not leak partition
        # concat order (r9 probe 2)
        tcol = F.col("time").desc() if ast.order_desc else F.col("time")
        ties = [c for c in ("ingest_seq",) if c in out.columns]
        return out.orderBy(*[c for c in by if c in out.columns], tcol, *ties)

    # aggregate / selector path (+ arithmetic over aggregates)
    return _finish(_execute_aggregate(df, ast, by), ast, by)


def _attach_companion_fields(df: DataFrame, ast: InfluxQLQuery, bare) -> DataFrame:
    """Attach companion FIELD values as per-point physical columns.

    ``SELECT LAST(value), status`` returns the PICKED point's other
    field values (stock v1) — in the tall frame those live on sibling
    rows, so stitch them on with one window over the point identity
    (r10: they previously fell through to a tags-map read and came
    back NULL). Which bare names are fields comes from the ftype slot
    map; when the frame is float-only (slot lookup skipped at query
    entry) a forced lookup resolves just the bare names — one distinct
    job bounded by field-key cardinality, only on this query shape.
    """
    if "field" not in df.columns:
        return df
    names = {f2 for _fn2, f2, _a2 in bare
             if f2 != "*" and f2 not in df.columns}
    if not names:
        return df
    unknown = names - set(ast.field_slots)
    if unknown:
        ast.field_slots = {
            **_resolve_field_slots(df, unknown, force=True),
            **ast.field_slots,
        }
    comp = [f2 for f2 in sorted(names) if f2 in ast.field_slots]
    if not comp:
        return df
    from pyspark.sql import Window as W

    if "tags" in df.columns:
        pt_tags = F.concat_ws(
            ",",
            F.transform(
                F.array_sort(F.map_keys(F.col("tags"))),
                lambda k: F.concat_ws("=", k, F.element_at(F.col("tags"), k)),
            ),
        )
    else:
        pt_tags = F.lit("")
    df = df.withColumn("_pt_tags", pt_tags)
    wpt = W.partitionBy(
        *[c for c in ("measurement", "time_ns") if c in df.columns],
        "_pt_tags",
    )
    for f2 in comp:
        df = df.withColumn(
            f2,
            F.first(
                F.when(F.col("field") == f2, F.col(ast.field_slots[f2])),
                ignorenulls=True,
            ).over(wpt),
        )
    return df.drop("_pt_tags")


def _execute_selector_row(
    df: DataFrame, ast: InfluxQLQuery, sel, bare, by: list, tag_col
) -> DataFrame:
    """Single selector with accompanying bare columns — a row-pick per
    group (window rank), NOT an aggregate: the output carries the
    selected point's timestamp and its tag/field values. Selector tie
    rules match the aggregate path (extreme value → earliest time;
    ingest order breaks exact-time ties). PERCENTILE picks the actual
    point at nearest-rank max(1, ⌈n·p/100⌉) in value order."""
    from pyspark.sql import Window as W

    fn, fld, alias = sel
    if fn in ("min", "max", "percentile") and _null_dispatched(
        fn, fld, df, ast.field_slots
    ):
        # numeric-only selectors over a string/bool field: stock
        # answers with no series even when companions are selected
        df = df.limit(0)
    df = _attach_companion_fields(df, ast, bare)
    if fld != "*" and fld in df.columns:
        src = fld
    else:
        # ftype-resolved slot (r10: FIRST/LAST/PERCENTILE of a string
        # field used to read f_float and return NULL)
        src = ast.field_slots.get(fld, "f_float")
        if fld != "*" and "field" in df.columns:
            # named field → its own rows only (multi-field frames, r6)
            df = df.filter(F.col("field") == fld)
    if ast.group_time_ns:
        df = df.withColumn(
            "_ws",
            window_start_ns(_window_src_ns(ast), ast.group_time_ns,
                            ast.group_time_offset_ns),
        )
        keys = [*by, "_ws"]
    else:
        keys = by
    part = W.partitionBy(*keys) if keys else W.partitionBy(F.lit(1))
    seq = ["ingest_seq"] if "ingest_seq" in df.columns else []
    tie_asc = [F.asc("time_ns"), *[F.asc(c) for c in seq]]
    if fn == "first":
        ob = tie_asc
    elif fn == "last":
        ob = [F.desc("time_ns"), *[F.desc(c) for c in seq]]
    elif fn == "max":
        ob = [F.desc(src), *tie_asc]
    elif fn == "min":
        ob = [F.asc(src), *tie_asc]
    else:  # percentile
        args = ast.fn_args.get(alias) or []
        if not args:
            raise InfluxQLError("PERCENTILE needs (field, p)")
        qv = float(args[0]) / 100.0
        ranked = df.withColumn(
            "_rn", F.row_number().over(part.orderBy(F.asc(src), *tie_asc))
        ).withColumn("_cnt", F.count(F.lit(1)).over(part))
        picked = ranked.filter(
            F.col("_rn")
            == F.greatest(F.lit(1), F.ceil(F.lit(qv) * F.col("_cnt")).cast("int"))
        )
        return _selector_row_project(picked, ast, src, alias, bare, by, tag_col)
    picked = df.withColumn("_rn", F.row_number().over(part.orderBy(*ob))).filter(
        F.col("_rn") == 1
    )
    return _selector_row_project(picked, ast, src, alias, bare, by, tag_col)


def _selector_row_project(
    picked: DataFrame, ast: InfluxQLQuery, src: str, alias: str, bare, by, tag_col
) -> DataFrame:
    cols = []
    if ast.group_time_ns:
        picked = picked.withColumn("time", _ws_time_expr(ast))
    cols.append(F.col("time"))
    cols.extend(F.col(t) for t in by)
    cols.append(F.col(src).alias(alias))
    for _fn, f2, a2 in bare:
        if f2 in by:
            continue  # group key already projected
        c2 = F.col(f2) if f2 in picked.columns else tag_col(f2)
        cols.append(c2.alias(a2))
    out = picked.select(*cols)
    return _finish(out, ast, by)


def _cmp_cond(c: Column, op: str, val):
    """One WHERE comparison as a boolean Column (v1 operator set)."""
    if op == "=~":
        return c.rlike(val)
    if op == "!~":
        return ~c.rlike(val)
    return {">": c > val, ">=": c >= val, "<": c < val, "<=": c <= val,
            "=": c == val, "!=": c != val}[op]


# ftype discriminator → the slot a query reads. int/uint map to
# f_float because unify_numeric_value folds them at query entry.
_SLOT_OF_FTYPE = {"float": "f_float", "int": "f_float", "uint": "f_float",
                  "string": "f_str", "bool": "f_bool"}


def _resolve_field_slots(df: DataFrame, names: set, force: bool = False) -> dict:
    """field key → value slot, from the frame's ``ftype`` column.

    One distinct job bounded by field-key cardinality (column-pruned to
    the two dictionary-encoded discriminator columns), run once per
    query and ONLY when the frame carries a string or bool slot — suite
    frames and subquery pseudo-frames are float-only and skip it, so
    their plans (and the bench) are untouched. ``force=True`` bypasses
    that gate for the rare paths that need to know whether a bare name
    IS a field key at all (selector-row companions on float-only
    frames). A field key never mixes types in one shard (line-protocol
    write enforcement); if a frame somehow does, the float slot wins
    (numeric operators stay correct)."""
    if not names or "field" not in df.columns or "ftype" not in df.columns:
        return {}
    if not force and "f_str" not in df.columns and "f_bool" not in df.columns:
        return {}
    rows = (
        df.filter(F.col("field").isin(sorted(names)))
        .select("field", "ftype")
        .distinct()
        .collect()
    )
    out: dict = {}
    for r in rows:
        slot = _SLOT_OF_FTYPE.get(r[1], "f_float")
        if r[0] not in out or slot == "f_float":
            out[r[0]] = slot
    return {k: v for k, v in out.items() if v in df.columns}


def _numeric_value_col(fld: str, df: DataFrame, slots: dict | None = None):
    """Value column for NUMERIC consumption (math fns, arithmetic):
    a non-numeric physical column (subquery-promoted string/bool)
    reads NULL instead of crashing the ANSI cast at runtime (r11 —
    stock computes nothing for them); slot-typed string/bool fields
    already read NULL through f_float."""
    if fld != "*" and fld in df.columns:
        from pyspark.sql import types as _T

        if not isinstance(df.schema[fld].dataType, _T.NumericType):
            return F.lit(None).cast("double")
    elif fld != "*" and (slots or {}).get(fld, "f_float") != "f_float":
        # slot-typed string/bool field consumed numerically (abs(s),
        # s * 2): the typed slot read crashed the ANSI cast at runtime
        # (r12 matrix audit) — stock computes nothing; NULL here, and
        # the raw-select path empties the statement when EVERY item is
        # null-dispatched
        return F.lit(None).cast("double")
    return _field_value_col(fld, df, slots)


def _field_value_col(fld: str, df: DataFrame, slots: dict | None = None):
    """The value Column a named field reads: a physical column of that
    name (promoted / subquery alias), else the TYPED value slot
    RESTRICTED to rows of that field — on a multi-field measurement
    every field's rows share the tall frame, so an unconditional slot
    read mixes fields (r6 probe: ``mean(c)`` averaged c AND u). The
    slot comes from ``slots`` (ftype-resolved, r10 — string/bool
    fields previously read f_float and came back NULL). One
    conditional projection — aggregation stays single-pass, no extra
    shuffle."""
    if fld != "*" and fld in df.columns:
        return F.col(fld)
    if fld != "*" and "field" in df.columns:
        slot = (slots or {}).get(fld, "f_float")
        return F.when(F.col("field") == fld, F.col(slot))
    return F.col("f_float")


def _field_value_sql(fld: str, df: DataFrame, slots: dict | None = None) -> str:
    """SQL-text twin of :func:`_field_value_col` for F.expr sites."""
    if fld != "*" and fld in df.columns:
        return fld
    if fld != "*" and "field" in df.columns:
        esc = fld.replace("'", "''")
        slot = (slots or {}).get(fld, "f_float")
        return f"(CASE WHEN field = '{esc}' THEN {slot} END)"
    return "f_float"


# THE v1 FUNCTION TYPING TABLE (r12 one-sweep audit; stock 1.8 docs).
# Functions that accept ANY field type (int64/float64/string/boolean):
#   COUNT, COUNT(DISTINCT), DISTINCT, MODE, FIRST, LAST, SAMPLE,
#   ELAPSED (time deltas — value type irrelevant).
# Everything else the engine serves is NUMERIC-ONLY (int64/float64):
#   aggregates  SUM MEAN MEDIAN STDDEV SPREAD INTEGRAL PERCENTILE
#   selectors   MIN MAX TOP BOTTOM
#   transforms  DERIVATIVE NON_NEGATIVE_DERIVATIVE DIFFERENCE
#               NON_NEGATIVE_DIFFERENCE CUMULATIVE_SUM MOVING_AVERAGE
#   TA family   EMA/DEMA/TEMA RSI CMO KAUFMANS_* HOLT_WINTERS
#   math fns    ABS ACOS ... (all of _MATH_FNS)
# Over a string/bool field a numeric-only function answers NO series
# (never null rows, never an ANSI cast error); in a mixed select the
# null-dispatched column rides along as null. _null_dispatched is the
# single predicate every execution path consults.
_ANYTYPE_AGGS = ("count", "count_distinct", "mode", "first", "last",
                 "distinct", "sample", "elapsed")

_NUMERIC_FTYPES = ("float", "int", "uint")


def _star_field_map(df: DataFrame, ast, field_types) -> dict:
    """field key → ftype for the queried measurement(s) — catalog-
    driven (zero jobs) when the store passes its field-type catalog,
    else one distinct bounded by field-key cardinality. Subquery
    pseudo-frames (no ``field`` column) expose their numeric physical
    columns as float fields, like stock's subquery field set."""
    if field_types is not None:
        if ast.measurement_regex is not None:
            metas = [m for m in field_types
                     if re.search(ast.measurement_regex, m)]
        else:
            metas = ast.measurements or [ast.measurement]
        out: dict = {}
        for m in metas:
            for f, t in (field_types.get(m) or {}).items():
                if f not in out or t in _NUMERIC_FTYPES:
                    out[f] = t
        return out
    if "field" not in df.columns:
        from pyspark.sql import types as _T

        # subquery pseudo-frame: promoted physical columns ARE the
        # field set — including string/bool ones with their actual
        # ftype (r11 ADVICE: count(*)/first(*)/last(*) over a subquery
        # omitted promoted non-numeric columns; the _ANYTYPE_AGGS /
        # numeric-only split downstream filters eligibility per fn)
        out = {}
        for f in df.schema.fields:
            if (f.name in ("time", "time_ns", "measurement", "tags",
                           "ingest_seq") or f.name.startswith("_")
                    or f.name in ast.group_tags):
                # a column the outer query groups by is a TAG here
                continue
            if isinstance(f.dataType, _T.NumericType):
                out[f.name] = "float"
            elif isinstance(f.dataType, _T.StringType):
                out[f.name] = "string"
            elif isinstance(f.dataType, _T.BooleanType):
                out[f.name] = "bool"
        return out
    if "ftype" in df.columns:
        rows = df.select("field", "ftype").distinct().collect()
    else:
        rows = [(r[0], "float")
                for r in df.select("field").distinct().collect()]
    out = {}
    for f, t in rows:
        if f not in out or t in _NUMERIC_FTYPES:
            out[f] = t
    return out


def _expand_star_aggs(ast, df: DataFrame, field_types) -> None:
    """``agg(*)`` → one aggregate per field (stock v1: ``SELECT
    mean(*) FROM m`` answers columns ``mean_<field>`` for every
    eligible field — ALL fields for the any-type aggregates, numeric
    fields only for the rest; r11 — previously * read the raw float
    slot across all of a multi-field measurement's interleaved rows).
    Expansion happens once at query entry so every downstream path
    (aggregate, selector-row, nested) sees ordinary named fields.
    Regex selections (``mean(/val/)``, marked ``_RE_FLD``) expand the
    same way over the matching field keys (r11)."""

    def _is_star(fld: str) -> bool:
        return fld == "*" or fld.startswith(_RE_FLD)

    if not any(_is_star(fld) and fn is not None and fn not in _MATH_FNS
               for fn, fld, _a in ast.fields):
        return
    fmap = _star_field_map(df, ast, field_types)
    new_fields = []
    for fn, fld, alias in ast.fields:
        if not _is_star(fld) or fn is None or fn in _MATH_FNS:
            new_fields.append((fn, fld, alias))
            continue
        if fn in _MULTI_ROW:
            raise InfluxQLError(f"expected field argument in {fn}()")
        rx = fld[len(_RE_FLD):] if fld.startswith(_RE_FLD) else None
        if fn in _ANYTYPE_AGGS:
            eligible = sorted(fmap)
        else:
            eligible = sorted(f for f, t in fmap.items()
                              if t in _NUMERIC_FTYPES)
        if rx is not None:
            eligible = [f for f in eligible if re.search(rx, f)]
        args = ast.fn_args.pop(alias, None)
        if not eligible:
            # no eligible field → stock answers with no series: keep a
            # phantom entry for schema shape and force the aggregate
            # path's empty short-circuit
            ast.force_empty = True
            phantom = "\x00no_star_field"
            ast.field_slots[phantom] = (
                "f_str" if "f_str" in df.columns else "f_float"
            )
            new_fields.append((fn, phantom, alias))
            continue
        for f in eligible:
            a2 = f"{alias}_{f}"
            new_fields.append((fn, f, a2))
            if args:
                ast.fn_args[a2] = list(args)
        for f in eligible:
            if (f not in ast.field_slots and f not in df.columns
                    and "field" in df.columns):
                slot = _SLOT_OF_FTYPE.get(fmap[f], "f_float")
                if slot in df.columns:
                    ast.field_slots[f] = slot
    ast.fields = new_fields


def _null_dispatched(fn, fld, df: DataFrame, slots: dict | None) -> bool:
    """True when this aggregate call reads the NULL dispatch column: a
    numeric-only aggregate over a string/bool-typed field slot, or over
    a non-numeric PHYSICAL column (subquery-promoted string/bool —
    r11: ``mean(status)`` over a subquery's string column was an ANSI
    runtime cast crash). Used by :func:`_execute_aggregate` to
    short-circuit to stock's EMPTY series when every selected
    aggregate is null-dispatched (r10 verdict #1: ``SELECT
    mean(status) FROM m`` must answer with no series, not one
    null-valued row)."""
    if fn is None or fn in _ANYTYPE_AGGS:
        return False
    if fld == "*":
        return False
    if fld in df.columns:
        from pyspark.sql import types as _T

        return not isinstance(df.schema[fld].dataType, _T.NumericType)
    return (slots or {}).get(fld, "f_float") != "f_float"


def _agg_expr(fn: str, fld: str, alias: str, args: list, df: DataFrame,
              slots: dict | None = None):
    """One InfluxQL aggregate/selector as a Spark aggregate Column.

    Type dispatch mirrors stock v1: COUNT/DISTINCT/MODE/FIRST/LAST
    accept any field type (they read the ftype-resolved slot);
    numeric-only aggregates (MEAN/SUM/.../MIN/MAX/PERCENTILE/INTEGRAL)
    on a string/bool field read a NULL column and aggregate to nothing,
    like stock's empty result — never an ANSI cast error."""
    col = _field_value_col(fld, df, slots)
    if _null_dispatched(fn, fld, df, slots):
        col = F.lit(None).cast("double")
    if fn in _AGGS:
        if fn == "spread":
            return (F.max(col) - F.min(col)).alias(alias)
        if fn == "mode":
            return F.mode(col).alias(alias)
        return agg_ops.AGG_FNS[fn](col).alias(alias)
    if fn == "count_distinct":
        # COUNT(DISTINCT(f)): exact — one shuffle of distinct keys per
        # group, partial distinct map-side (Spark expands to a two-stage
        # aggregate); swap to approx_count_distinct only via the
        # cardinality API, never silently
        return F.count_distinct(col).alias(alias)
    if fn in ("min", "max"):
        # selector semantics: extreme value, ties → earliest time ⇒
        # always min_by over (±value, time); null ordering rows
        # (other fields of a multi-field measurement) are skipped by
        # min_by/max_by's null-ordering semantics
        order = F.when(
            col.isNotNull(),
            F.struct(col if fn == "min" else -col, F.col("time_ns")),
        )
        return F.min_by(col, order).alias(alias)
    if fn in ("first", "last"):
        pick = F.min_by if fn == "first" else F.max_by
        t_order = F.when(col.isNotNull(), F.col("time_ns"))
        return pick(col, t_order).alias(alias)
    if fn == "percentile":
        # InfluxQL PERCENTILE(f, p): the actual data value at rank
        # round(n·p/100 + ½) ≡ max(1, ⌈n·p/100⌉) — a group-local
        # sort+pick (groups are windows/series, bounded; the
        # scalable global path is operators.aggregates.quantile)
        if not args:
            raise InfluxQLError("PERCENTILE needs (field, p)")
        qv = float(args[0]) / 100.0
        src_e = _field_value_sql(fld, df)
        return F.expr(
            f"element_at(array_sort(collect_list({src_e})), "
            f"greatest(1, cast(ceil({qv!r} * count({src_e})) as int)))"
        ).alias(alias)
    if fn == "integral":
        # trapezoid fold over the group's time-sorted points —
        # InfluxQL INTEGRAL(f[, unit]); group-local like PERCENTILE
        unit_s = _parse_duration(args[0]) / 1e9 if args else 1.0
        src_e = _field_value_sql(fld, df)
        # struct field order = sort order: time first; other-field
        # rows carry v = NULL and contribute nothing after the filter
        arr = (
            "array_sort(filter(collect_list("
            f"struct(time_ns as t, {src_e} as v)), x -> x.v is not null))"
        )
        return F.expr(
            f"aggregate(zip_with(slice({arr}, 1, size({arr}) - 1), "
            f"slice({arr}, 2, size({arr}) - 1), "
            f"(p, c) -> (c.v + p.v) / 2 * (c.t - p.t) / 1e9 / {unit_s!r}), "
            f"cast(0.0 as double), (acc, x) -> acc + x)"
        ).alias(alias)
    if fn is None:
        raise InfluxQLError(
            "mixing bare columns with aggregates requires a single selector "
            "(FIRST/LAST/MAX/MIN/PERCENTILE) or TOP/BOTTOM/SAMPLE"
        )
    raise InfluxQLError(f"unsupported aggregate {fn!r}")


def _walk_agg_nodes(tree):
    if tree[0] == "agg":
        yield tree
    elif tree[0] == "bin":
        yield from _walk_agg_nodes(tree[2])
        yield from _walk_agg_nodes(tree[3])


def _tree_col(tree, names: dict):
    kind = tree[0]
    if kind == "num":
        return F.lit(tree[1])
    if kind == "agg":
        return F.col(names[tree[1:]])
    _, op, l, r = tree
    lc, rc = _tree_col(l, names), _tree_col(r, names)
    return {"+": lc + rc, "-": lc - rc, "*": lc * rc, "/": lc / rc}[op]


def _local_ns(ns: int, tzname: str) -> int:
    """UTC epoch-ns → local wall-clock epoch-ns (driver-side, for the
    constant spine bounds; the per-row shift is JVM-side)."""
    import datetime as dt
    from zoneinfo import ZoneInfo

    d = dt.datetime.fromtimestamp(ns // 10**9, tz=dt.timezone.utc).astimezone(
        ZoneInfo(tzname)
    )
    return ns + int(d.utcoffset().total_seconds()) * 10**9


def _window_src_ns(ast: InfluxQLQuery) -> Column:
    """Epoch-ns column the GROUP BY time() windows align on: UTC by
    default; with ``tz('Zone')`` the *local* wall-clock epoch, so
    window boundaries land on local midnights/hours (InfluxQL tz
    semantics). DST-aware via the JVM tz database."""
    if ast.tzname:
        return F.unix_micros(F.from_utc_timestamp(F.col("time"), ast.tzname)) * 1000
    return F.col("time_ns")


def _ws_time_expr(ast: InfluxQLQuery) -> Column:
    """Window-start (``_ws``) back to a UTC instant for the result's
    ``time`` column (inverse of the tz shift when tz() is active)."""
    t = F.timestamp_micros(F.expr("_ws div 1000"))
    return F.to_utc_timestamp(t, ast.tzname) if ast.tzname else t


def _execute_aggregate(df: DataFrame, ast: InfluxQLQuery, by: list) -> DataFrame:
    """The aggregate/selector/arithmetic SELECT core: one groupBy over
    (tags[, window start]), arithmetic combined post-agg, fill over the
    window spine. No ordering/limits — ``_finish`` applies those."""
    # stock v1 parity: when EVERY selected aggregate is numeric-only
    # over a string/bool field, the whole statement answers with NO
    # series (probed against stock 1.x: `SELECT mean(status) FROM m`
    # → {"statement_id":0}, no values). Aggregate over an empty frame
    # (schema preserved) and disable fill so the window spine cannot
    # resurrect the dropped windows — GROUP BY time + fill(0) of a
    # string field is empty too.
    agg_calls = [(fn, fld) for fn, fld, _a in ast.fields if fn is not None]
    for tree, _a in ast.arith:
        agg_calls.extend((n[1], n[2]) for n in _walk_agg_nodes(tree))
    force_empty = ast.force_empty or (bool(agg_calls) and all(
        _null_dispatched(fn, fld, df, ast.field_slots) for fn, fld in agg_calls
    ))
    if force_empty:
        import dataclasses as _dc

        df = df.limit(0)
        ast = _dc.replace(ast, fill=None)
    if ast.group_time_ns:
        df = df.withColumn(
            "_ws",
            window_start_ns(_window_src_ns(ast), ast.group_time_ns,
                            ast.group_time_offset_ns),
        )
        keys = [*by, "_ws"]
    else:
        keys = by

    aggs = [
        _agg_expr(fn, fld, alias, ast.fn_args.get(alias) or [], df,
                  ast.field_slots)
        for fn, fld, alias in ast.fields
    ]
    # arithmetic selections: each distinct aggregate call becomes one
    # internal agg column; the expression combines them post-groupBy
    internal: dict[tuple, str] = {}
    for tree, _alias in ast.arith:
        for node in _walk_agg_nodes(tree):
            key = node[1:]
            if key not in internal:
                ia = f"__x{len(internal)}"
                internal[key] = ia
                aggs.append(_agg_expr(node[1], node[2], ia, list(node[3]), df,
                                      ast.field_slots))
    out = df.groupBy(*keys).agg(*aggs)
    for tree, alias in ast.arith:
        out = out.withColumn(alias, _tree_col(tree, internal))
    if internal:
        out = out.drop(*internal.values())

    value_cols = [a for _, _, a in ast.fields] + [a for _, a in ast.arith]
    if ast.group_time_ns and ast.fill not in (None, "none"):
        if ast.time_start_ns is None or ast.time_stop_ns is None:
            raise InfluxQLError("fill() needs an explicit WHERE time range")
        start, stop = ast.time_start_ns, ast.time_stop_ns
        if ast.tzname:
            # the spine lives in the local wall-clock epoch domain
            start, stop = _local_ns(start, ast.tzname), _local_ns(stop, ast.tzname)
        spine = window_spine(
            df, start, stop, ast.group_time_ns, by=by,
            offset=ast.group_time_offset_ns,
        ).withColumnRenamed("_start_ns", "_ws").drop("_stop_ns")
        out = spine.join(out, on=keys, how="left")
        # v1 semantics: COUNT of an empty interval is 0, never null —
        # fill() does not override it (the long-standing upstream
        # behavior users hit with fill(null)+count)
        for (fn, _fld, alias) in ast.fields:
            if fn == "count" and alias in value_cols:
                out = out.withColumn(
                    alias, F.coalesce(F.col(alias), F.lit(0))
                )
        if isinstance(ast.fill, float):
            from pyspark.sql import types as _T

            for c in value_cols:
                # numeric fill literal applies to NUMERIC columns only
                # (r10: coalesce(string_col, 0.0) casts the strings to
                # double under ANSI and crashes at runtime on the first
                # non-numeric value; string/bool aggregates keep null
                # for empty windows)
                if isinstance(out.schema[c].dataType, _T.NumericType):
                    out = out.withColumn(
                        c, F.coalesce(F.col(c), F.lit(ast.fill))
                    )
        elif ast.fill == "previous":
            from pyspark.sql import Window as W

            w = W.partitionBy(*by).orderBy("_ws").rowsBetween(W.unboundedPreceding, 0)
            for c in value_cols:
                out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
        # "null" → the spine join already produced null rows
        elif ast.fill == "linear":
            from pyspark.sql import Window as W
            from pyspark.sql import types as _T

            for c in value_cols:
                # linear interpolation is numeric-only (stock: string/
                # bool columns keep null in empty windows) — the lerp
                # arithmetic on a boolean `last(flag)` column was an
                # AnalysisException escape (r11 extended fuzz)
                if not isinstance(out.schema[c].dataType, _T.NumericType):
                    continue
                wp = W.partitionBy(*by).orderBy("_ws").rowsBetween(W.unboundedPreceding, 0)
                wn = W.partitionBy(*by).orderBy("_ws").rowsBetween(0, W.unboundedFollowing)
                v, t = F.col(c), F.col("_ws")
                obs_t = F.when(v.isNotNull(), t)
                pv = F.last(v, ignorenulls=True).over(wp)
                pt = F.last(obs_t, ignorenulls=True).over(wp)
                nv = F.first(v, ignorenulls=True).over(wn)
                nt = F.first(obs_t, ignorenulls=True).over(wn)
                lerp = F.when(v.isNotNull(), v).otherwise(
                    F.when(pv.isNotNull() & nv.isNotNull(),
                           pv + (nv - pv) * (t - pt) / (nt - pt))
                )
                out = out.withColumn(c, lerp)

    if ast.group_time_ns:
        # stock column order: time leads every windowed series
        out = out.withColumn("time", _ws_time_expr(ast)).drop("_ws")
        out = out.select("time",
                         *[c for c in out.columns if c != "time"])
    if force_empty:
        # an ungrouped groupBy().agg() over the empty frame still emits
        # ONE null row (SQL global-aggregate semantics) — stock answers
        # with no series at all; limit(0) folds the plan to an empty
        # LocalRelation (OptimizeLimitZero), schema preserved
        out = out.limit(0)
    return out


def _execute_nested(df: DataFrame, ast: InfluxQLQuery, by: list, tag_col) -> DataFrame:
    """Transform-over-aggregate nesting — the classic Grafana InfluxQL
    shape ``SELECT DERIVATIVE(MEAN(v), 1s) ... GROUP BY time(10s)``:
    aggregate per window first (full fill/spine semantics), then run
    the per-point transform over the *aggregated* series."""
    import dataclasses

    from ..operators import analytics as an_ops

    if not ast.group_time_ns:
        raise InfluxQLError("transform(aggregate(..)) needs GROUP BY time()")
    if ast.fields:
        raise InfluxQLError("cannot mix nested transforms with plain selections")
    for t in by:
        if t not in df.columns:
            df = df.withColumn(t, tag_col(t))
    inner_fields = [
        (inner, fld, f"__n{i}") for i, (_o, inner, fld, _a) in enumerate(ast.nested)
    ]
    inner_ast = dataclasses.replace(
        ast, fields=inner_fields, nested=[], arith=[],
        limit=None, offset=0, slimit=None, order_desc=False,
    )
    aggd = _execute_aggregate(df, inner_ast, by).withColumn(
        "time_ns", F.expr("unix_micros(time) * 1000")
    )
    hw = [x for x in ast.nested if x[0] in ("holt_winters", "holt_winters_with_fit")]
    if hw:
        # HOLT_WINTERS(agg(v), N[, S]) — forecast-only output (InfluxDB
        # returns just the N predicted points), so it can't row-align
        # with other transforms. HOLT_WINTERS_WITH_FIT additionally
        # emits the in-sample one-step predictions, and fits α/β(/γ)
        # by Nelder-Mead like the reference engine (forecast values are
        # engine-specific → rows-only checkable).
        if len(ast.nested) != 1:
            raise InfluxQLError("HOLT_WINTERS must be the only selection")
        outer, _inner, _fld, alias = ast.nested[0]
        with_fit = outer == "holt_winters_with_fit"
        args = ast.fn_args.get(alias, [])
        if not args:
            raise InfluxQLError("HOLT_WINTERS needs (N[, seasonality])")
        from pyspark.sql import types as _T

        if not isinstance(aggd.schema["__n0"].dataType, _T.NumericType):
            # HOLT_WINTERS(FIRST(s), ...): numeric-only — no series
            aggd = aggd.limit(0).withColumn(
                "__n0", F.lit(None).cast("double"))
        out = an_ops.holt_winters(
            aggd, n=int(args[0]),
            interval_seconds=ast.group_time_ns / 1e9,
            seasonality=int(args[1]) if len(args) > 1 else 0,
            value="__n0", by=by,
            fit=with_fit, include_fitted=with_fit,
        )
        out = (
            out.withColumn("time", F.timestamp_micros(F.expr("time_ns div 1000")))
            .withColumnRenamed("hw", alias)
            .select("time", *by, alias)
        )
        return _finish(out, ast, by)
    aliases = []
    from pyspark.sql import types as _T

    for i, (outer, _inner, _fld, alias) in enumerate(ast.nested):
        src, args = f"__n{i}", ast.fn_args.get(alias, [])
        if (outer != "elapsed" and src in aggd.columns
                and not isinstance(aggd.schema[src].dataType,
                                   _T.NumericType)):
            # numeric-only outer transform over an any-type inner's
            # string/bool output — MOVING_AVERAGE(FIRST(s), 2) crashed
            # the ANSI cast (r12 matrix audit); stock answers no
            # series. NULL input: the rows drop via the row-align
            # keep filter below. ELAPSED is any-type (time deltas).
            aggd = aggd.withColumn(src, F.lit(None).cast("double"))
        if outer in ("derivative", "non_negative_derivative"):
            unit_s = _parse_duration(args[0]) / 1e9 if args else 1.0
            aggd = an_ops.derivative(
                aggd, unit_seconds=unit_s, non_negative=outer.startswith("non_"),
                value=src, by=by, alias=alias, order=["time_ns"],
            )
        elif outer in ("difference", "non_negative_difference"):
            aggd = an_ops.difference(
                aggd, non_negative=outer.startswith("non_"), value=src,
                by=by, alias=alias, order=["time_ns"],
            )
        elif outer == "cumulative_sum":
            aggd = an_ops.cumulative_sum(aggd, value=src, by=by, alias=alias,
                                         order=["time_ns"])
        elif outer == "moving_average":
            if not args:
                raise InfluxQLError("MOVING_AVERAGE needs a window size")
            aggd = an_ops.moving_average(aggd, n=int(args[0]), value=src,
                                         by=by, alias=alias, order=["time_ns"])
        elif outer == "elapsed":
            unit_s = _parse_duration(args[0]) / 1e9 if args else 1.0
            aggd = an_ops.elapsed(aggd, unit_seconds=unit_s, by=by, alias=alias,
                                  order=["time_ns"])
        elif outer in _TA_FNS:
            # EMA(MEAN(v), 10) GROUP BY time(1h) — the Grafana TA shape
            if not args:
                raise InfluxQLError(f"{outer.upper()} needs a period argument")
            aggd = _apply_ta(outer, aggd, src, int(args[0]), by, alias)
        else:
            raise InfluxQLError(f"unhandled nested transform {outer!r}")
        aliases.append(alias)
    keep = None
    for a in aliases:
        c = F.col(a).isNotNull()
        keep = c if keep is None else (keep | c)
    return _finish(aggd.filter(keep).select("time", *by, *aliases), ast, by)


def _finish(out: DataFrame, ast: InfluxQLQuery, by: list) -> DataFrame:
    # ORDER BY time is a no-op when the result has no time column
    # (bare aggregate per tag) — InfluxDB accepts the clause silently
    has_time = "time" in out.columns
    if ast.order_desc and has_time:
        out = out.orderBy(F.desc("time"))
    if ast.slimit is not None and by:
        out = sl_ops.slimit(out, ast.slimit, series=by, soffset=ast.soffset)
    if ast.limit is not None:
        order_cols = (["time"] if has_time else []) + (
            ["ingest_seq"] if "ingest_seq" in out.columns else []
        )
        if order_cols:
            out = sl_ops.limit(out, ast.limit, ast.offset, by=by,
                               order=order_cols, desc=ast.order_desc)
        else:
            if ast.offset:
                out = out.offset(ast.offset)
            out = out.limit(ast.limit)
    return out

"""HTTP façade: the ``/api/v2``-shaped surface of the provisioned engine.

The reference component's clients talk to the database over HTTP on
``{interface}:{port}`` (defaults ``127.0.0.1:8086``,
``/root/reference/recipe.yaml:22-27``): peer components POST line
protocol to ``/api/v2/write`` and Flux to ``/api/v2/query``
(consumption documented at ``/root/reference/README.md:292-297`` and
``:406-410``), authenticating with the tokens vended over IPC
(§3.2/§3.3 of SURVEY.md). This module closes that last loop: a user of
the reference can point the same client at this engine.

Endpoints (InfluxDB 2.0 API shapes):

- ``GET /ping`` → 204 (liveness; the ``influx ping`` probe the
  reference health-check drives, ``src/influxdb_utils.sh:31-35``)
- ``GET /health`` → 200 JSON pass/fail
- ``GET /api/v2/setup`` → ``{"allowed": bool}`` (provision state —
  the troubleshooting probe at ``README.md:383``)
- ``POST /api/v2/write?org=&bucket=&precision=`` — line-protocol
  body → LWW append into the bucket store (write-scoped token)
- ``POST /api/v2/query?org=`` — Flux text (raw or JSON-wrapped) →
  annotated CSV (read-scoped token)
- ``GET/POST /query?db=&q=`` — InfluxQL 1.x compatibility endpoint →
  v1-style JSON results
- ``POST /api/v2/delete?org=&bucket=`` — time range + tag-equality
  predicate delete

Auth: ``Authorization: Token <token>`` resolved against the engine's
:class:`~.tokens.TokenRegistry`; scoped tokens carry
``read:orgs/{org}/buckets/{bucket_id}`` / ``write:...`` permissions
(fixture shape ``/root/reference/test/test_influxDBTokenStreamHandler.py:36-49``),
admin tokens carry org-wide ``read:orgs``/``write:orgs``. Missing or
unknown token → 401; insufficient scope → 403 — matching the
"unauthorized access to path" failure mode shown at ``README.md:406-410``.

Scale note: the HTTP layer is control-plane-thin — each request turns
into one Spark job (append or query); no per-row Python work happens
here beyond line-protocol parsing of the posted batch, and nothing is
collected except final query results (post-aggregation row counts).
"""

from __future__ import annotations

import datetime as dt
import json
import os
import re
import ssl
import subprocess
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from pathlib import Path
from urllib.parse import parse_qs, urlsplit

from pyspark.sql import functions as F

from ..frontends.annotated_csv import iter_annotated_csv
from ..frontends.flux import execute_flux_multi
from ..frontends.influxql import execute_influxql, parse_influxql
from ..sources.bucket import BucketMeta
from ..sources.lineprotocol import parse_lines
from ..sources.seq import next_seq_base
from .engine import Engine


class ApiError(Exception):
    def __init__(self, status: int, code: str, message: str):
        super().__init__(message)
        self.status, self.code, self.message = status, code, message


def generate_self_signed_cert(
    cert_dir: str, days: int = 365, subject: str = "/C=US/O=engine/CN=localhost"
) -> tuple[str, str]:
    """Self-signed cert + key, the reference's Install-step recipe
    (``/root/reference/recipe.yaml:63-78``: ``openssl req -x509 -newkey
    rsa:2048 -nodes``, configurable expiry, key chmod'd private).
    Idempotent: reuses an existing pair in ``cert_dir``.
    """
    d = Path(cert_dir)
    d.mkdir(parents=True, exist_ok=True)
    cert, key = d / "influxdb.crt", d / "influxdb.key"
    if not (cert.exists() and key.exists()):
        subprocess.run(
            [
                "openssl", "req", "-x509", "-newkey", "rsa:2048",
                "-keyout", str(key), "-out", str(cert),
                "-days", str(days), "-nodes", "-subj", subject,
            ],
            check=True,
            capture_output=True,
        )
        os.chmod(key, 0o600)  # recipe.yaml:77 chmods the key dir private
    return str(cert), str(key)


# matches from(bucket: "...") and schema.*(bucket: "...") alike
_FROM_BUCKET_RX = re.compile(r'bucket\s*:\s*"([^"]+)"')


def _rfc3339_to_ns(s: str) -> int:
    s = s.strip()
    # fromisoformat (3.11+) accepts 'Z'; normalize for older parsers
    ts = dt.datetime.fromisoformat(s.replace("Z", "+00:00"))
    if ts.tzinfo is None:
        ts = ts.replace(tzinfo=dt.timezone.utc)
    # integer calendar arithmetic — float timestamp() loses ulps at ns
    delta = ts - dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
    micros = (delta.days * 86_400 + delta.seconds) * 1_000_000 + delta.microseconds
    return micros * 1000


def _split_v1_statements(text: str) -> list[str]:
    """Split a v1 ``q=`` payload on semicolons outside quotes."""
    out, buf, quote = [], [], None
    for c in text:
        if quote:
            buf.append(c)
            if c == quote:
                quote = None
        elif c in "'\"":
            quote = c
            buf.append(c)
        elif c == ";":
            if "".join(buf).strip():
                out.append("".join(buf).strip())
            buf = []
        else:
            buf.append(c)
    if "".join(buf).strip():
        out.append("".join(buf).strip())
    return out


def _ns_to_rfc3339(ns: int) -> str:
    ts = dt.datetime.fromtimestamp(ns // 1_000_000_000, tz=dt.timezone.utc)
    frac = ns % 1_000_000_000
    base = ts.strftime("%Y-%m-%dT%H:%M:%S")
    return f"{base}.{frac:09d}Z" if frac else f"{base}Z"


class _StreamedValues:
    """Marker wrapper: a lazy row iterator standing in for a series'
    ``values`` list, so the v1 JSON envelope can be emitted
    incrementally instead of materializing the result driver-side."""

    def __init__(self, rows):
        self.rows = rows


def _iter_v1_json(results: list[dict], batch_rows: int = 500):
    """Incrementally serialize the v1 ``{"results": [...]}`` envelope.

    Statements whose series carry ``_StreamedValues`` have their rows
    pulled lazily and emitted in ``batch_rows`` JSON chunks; everything
    else (meta statements, DDL acks) is dumped whole — those are
    bounded-small by construction.
    """
    yield '{"results": ['
    for i, res in enumerate(results):
        if i:
            yield ", "
        series = res.get("series", [])
        # series may be a LAZY iterator (GROUP BY <tag> splits one
        # streamed row scan into per-tag-set series) — only a concrete
        # list with no streamed values takes the dump-whole path
        if isinstance(series, list) and not any(
            isinstance(s.get("values"), _StreamedValues) for s in series
        ):
            yield json.dumps(res)
            continue
        yield '{"series": ['
        for si, s in enumerate(series):
            if si:
                yield ", "
            tags_part = (
                ', "tags": ' + json.dumps(s["tags"]) if s.get("tags") else ""
            )
            yield (
                '{"name": ' + json.dumps(s["name"]) + tags_part
                + ', "columns": ' + json.dumps(s["columns"])
                + ', "values": ['
            )
            vals = s["values"]
            rows_iter = vals.rows if isinstance(vals, _StreamedValues) else iter(vals)
            buf: list[str] = []
            first = True
            for row in rows_iter:
                buf.append(json.dumps(row))
                if len(buf) >= batch_rows:
                    yield ("" if first else ", ") + ", ".join(buf)
                    first = False
                    buf = []
            if buf:
                yield ("" if first else ", ") + ", ".join(buf)
            yield "]}"
        yield '], "statement_id": ' + str(res.get("statement_id", i)) + "}"
    yield "]}"


def _iter_v1_json_chunked(results: list[dict], chunk_size: int):
    """v1 ``chunked=true`` wire shape (r9 probe): a sequence of
    newline-delimited COMPLETE ``{"results": [...]}`` documents, each
    carrying at most ``chunk_size`` rows of one series. A series split
    across documents marks every non-final piece ``"partial": true``
    (series level), and a statement with more data to come marks its
    result entry partial too — exactly the stock v1 contract clients
    like influxdb-python's chunked reader parse.

    Streaming shape: rows are pulled lazily (``_StreamedValues`` pass
    through ``toLocalIterator``) — facade memory stays O(chunk_size).
    """
    for res in results:
        sid = res.get("statement_id", 0)
        # one-series look-ahead tells whether the statement has more
        # data (drives the result-level partial flag) without
        # materializing a lazy per-tag-set series generator
        sit = iter(res.get("series", []))
        cur = next(sit, None)
        if cur is None:
            doc = dict(res)
            doc["statement_id"] = sid
            yield json.dumps({"results": [doc]}) + "\n"
            continue
        while cur is not None:
            nxt = next(sit, None)
            vals = cur.get("values", [])
            rows_iter = vals.rows if isinstance(vals, _StreamedValues) else iter(vals)
            pending = next(rows_iter, None)
            first_batch = True
            while first_batch or pending is not None:
                batch = []
                while pending is not None and len(batch) < chunk_size:
                    batch.append(pending)
                    pending = next(rows_iter, None)
                series_more = pending is not None
                s_doc = {"name": cur.get("name")}
                if cur.get("tags"):
                    s_doc["tags"] = cur["tags"]
                s_doc["columns"] = cur.get("columns", [])
                s_doc["values"] = batch
                if series_more:
                    s_doc["partial"] = True
                r_doc = {"statement_id": sid, "series": [s_doc]}
                if series_more or nxt is not None:
                    r_doc["partial"] = True
                yield json.dumps({"results": [r_doc]}) + "\n"
                first_batch = False
            cur = nxt


def _fluxify_result(df):
    """Rename engine-internal result columns to the Flux WIRE names a
    stock client parses (``_measurement``/``_field``/``_value``/
    ``_time``/``_start``/``_stop``) and materialize the ``tags`` map
    as one column per tag key — the stock annotated-CSV shape (r8:
    the facade leaked internal names like ``f_float``/``time_ns``/
    ``series_key``, which no influxdb-client reader expects).

    Column work only — the streaming shape of the CSV writer is
    untouched. The tag-key discovery is one small distinct job bounded
    by tag-KEY cardinality (not values).

    Returns a list of ``(df, wire_group_key)`` splits — one per result
    datatype (usually a single entry). The key drives the stock
    ``#group`` annotation and per-table numbering in the CSV; each
    split gets its own annotation block (schema change = new header,
    per the annotated-CSV spec)."""
    from pyspark.sql import functions as F

    from ..frontends.flux import _VALUE_RESULT_ALIASES

    tag_cols: list[str] = []
    tags_map = None
    if "tags" in df.columns:
        tags_map = F.col("tags")
    elif "series_key" in df.columns:
        # aggregated frames carry the serialized key, not the map —
        # recover the tag set from its middle |-segment
        # (measurement|k=v,k=v|field, or measurement|k=v,… once the
        # field segment was pivoted away)
        tags_map = F.str_to_map(
            F.split(F.col("series_key"), r"\|").getItem(1), F.lit(","), F.lit("=")
        )
    if tags_map is not None:
        df = df.withColumn("_tags_m", tags_map)
        keys = [
            r[0]
            for r in df.select(
                F.explode(F.map_keys("_tags_m")).alias("k")
            ).distinct().collect()
        ]
        for k in sorted(keys):
            if k and k not in df.columns:
                df = df.withColumn(k, F.col("_tags_m")[k])
        df = df.drop("_tags_m")
        tag_cols = [k for k in sorted(keys) if k and k in df.columns]
    for src, dst in (("_start_ns", "_start"), ("_stop_ns", "_stop")):
        if src in df.columns and dst not in df.columns:
            df = df.withColumn(
                dst, F.timestamp_micros(F.expr(f"`{src}` div 1000"))
            )
    # the typed value slot → _value. unify_numeric_value guarantees an
    # f_float column on every frame (null for string/bool points), so a
    # fixed f_float-first preference silently discarded string/bool
    # field values (r9 ADVICE-high fix): pick the slot the frame's
    # ``ftype`` discriminator says is populated, and when a frame mixes
    # datatypes, split it into one table per type (stock emits a fresh
    # annotation block per schema — handled by the caller iterating the
    # returned splits).
    splits: list = []
    if "_value" not in df.columns:
        slots = [s for s in ("f_float", "f_str", "f_bool") if s in df.columns]
        if len(slots) > 1:
            # which slots actually hold data? ftype is authoritative
            # (kept even on legitimately-null values, e.g. createEmpty
            # spines); the distinct is bounded by the 5 field types.
            slot_of = {"float": "f_float", "int": "f_float", "uint": "f_float",
                       "string": "f_str", "bool": "f_bool"}
            if "ftype" in df.columns:
                ftypes = [
                    r[0]
                    for r in df.select("ftype").distinct().collect()
                    if r[0] in slot_of
                ]
                live = sorted(
                    {slot_of[t] for t in ftypes}, key=slots.index
                )
                if len(live) > 1:
                    for slot in live:
                        types = [t for t, s in slot_of.items() if s == slot]
                        splits.append(
                            (df.filter(F.col("ftype").isin(types))
                               .withColumnRenamed(slot, "_value"),
                             slot)
                        )
                else:
                    df = df.withColumnRenamed(live[0] if live else "f_float",
                                              "_value")
            else:
                # no discriminator: one columnar count job finds the
                # populated slot(s); split on non-null as best effort.
                counts = df.agg(
                    *[F.count(F.col(s)).alias(s) for s in slots]
                ).first()
                live = [s for s in slots if counts[s] > 0]
                if len(live) > 1:
                    for slot in live:
                        splits.append(
                            (df.filter(F.col(slot).isNotNull())
                               .withColumnRenamed(slot, "_value"),
                             slot)
                        )
                else:
                    df = df.withColumnRenamed(live[0] if live else "f_float",
                                              "_value")
        elif slots:
            df = df.withColumnRenamed(slots[0], "_value")
        else:
            hits = [c for c in df.columns if c in _VALUE_RESULT_ALIASES]
            if len(hits) == 1:
                df = df.withColumnRenamed(hits[0], "_value")
    def _finish(frame):
        renames = {"measurement": "_measurement", "field": "_field",
                   "time": "_time"}
        for src, dst in renames.items():
            if src in frame.columns and dst not in frame.columns:
                frame = frame.withColumnRenamed(src, dst)
        drop = [
            c for c in ("tags", "series_key", "time_ns", "ingest_seq",
                        "_ts_raw", "ftype", "props", "day", "f_int", "f_uint",
                        "f_float", "f_str", "f_bool", "_start_ns", "_stop_ns",
                        "_rb_start_ns", "_rb_stop_ns")
            if c in frame.columns
        ]
        if drop:
            frame = frame.drop(*drop)
        # the wire GROUP KEY: what stock marks true in #group and numbers
        # tables by — measurement/tags/field/window bounds, never
        # _time/_value. Regrouped frames (group(columns:["host"]) dropped
        # series_key) keep their key as bare string columns — fold those
        # in too.
        from pyspark.sql import types as T

        known = {"_measurement", "_field", "_start", "_stop", *tag_cols}
        extra = [
            f.name
            for f in frame.schema.fields
            if isinstance(f.dataType, T.StringType)
            and not f.name.startswith("_")
            and f.name not in known
        ]
        wire_key = tuple(
            c for c in ("_measurement", *tag_cols, *extra, "_field",
                        "_start", "_stop")
            if c in frame.columns
        )
        return frame, wire_key

    if splits:
        return [_finish(frame) for frame, _slot in splits]
    return [_finish(df)]


def _parse_delete_predicate(pred: str):
    """``_measurement="m" AND tag="v"`` → Column (equality conjunctions,
    the grammar the delete API supports)."""
    col = None
    for clause in re.split(r"\s+AND\s+", pred.strip()):
        m = re.match(r'^\s*([\w.]+)\s*=\s*"([^"]*)"\s*$', clause)
        if not m:
            raise ApiError(400, "invalid", f"bad delete predicate clause: {clause!r}")
        key, val = m.group(1), m.group(2)
        c = (
            F.col("measurement") == val
            if key == "_measurement"
            else F.col("tags")[key] == val
        )
        col = c if col is None else (col & c)
    return col


class HttpApi:
    """Serve an :class:`Engine` over HTTP or HTTPS.

    ``port=0`` picks a free port. ``tls=True`` serves HTTPS with a
    self-signed certificate (generated into ``cert_dir``, or reused) —
    the reference's *default* posture (``recipe.yaml:24-27``
    ``ServerProtocol: https`` + ``SkipTLSVerify: true``, certs from the
    Install step). Clients opt out of verification exactly like the
    vended ``InfluxDBSkipTLSVerify`` flag tells them to.
    """

    def __init__(
        self,
        engine: Engine,
        host: str = "127.0.0.1",
        port: int = 0,
        tls: bool = False,
        cert_dir: str | None = None,
    ):
        self.engine = engine
        self.host, self.port = host, port
        self.tls = tls
        self.cert_dir = cert_dir
        self.cert_file: str | None = None
        self._server: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        self._cq_registries: dict = {}

    def _cq_registry(self, org: str):
        """Per-org continuous-query registry (lazy; see streaming/cq.py)."""
        if org not in self._cq_registries:
            from ..streaming.cq import CQRegistry

            self._cq_registries[org] = CQRegistry(self.engine.store, org)
        return self._cq_registries[org]

    def _task_registry(self, org: str):
        """Per-org Flux task registry (lazy; see streaming/flux_tasks.py)."""
        if not hasattr(self, "_task_registries"):
            self._task_registries = {}
        if org not in self._task_registries:
            from ..streaming.flux_tasks import FluxTaskRegistry

            self._task_registries[org] = FluxTaskRegistry(self.engine.store, org)
        return self._task_registries[org]

    def run_continuous_queries(self, now_ns: int | None = None) -> dict[str, int]:
        """Run every registered CQ once (idempotent; callers own the
        cadence — a production deployment wraps this in a timer at the
        finest CQ grain, matching InfluxDB's own CQ scheduler)."""
        import time as _time

        now = now_ns if now_ns is not None else _time.time_ns()
        out: dict[str, int] = {}
        for reg in self._cq_registries.values():
            out.update(reg.run_due(self.engine.spark, now))
        return out

    # ------------------------------------------------------------ lifecycle

    def start(self) -> tuple[str, int]:
        api = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                api._dispatch(self, "GET")

            def do_POST(self):
                api._dispatch(self, "POST")

            def do_DELETE(self):
                api._dispatch(self, "DELETE")

            def do_PATCH(self):
                api._dispatch(self, "PATCH")

        self._server = ThreadingHTTPServer((self.host, self.port), Handler)
        if self.tls:
            cert_dir = self.cert_dir or str(
                Path(self.engine.config.store_root) / "tls"
            )
            cert, key = generate_self_signed_cert(cert_dir)
            self.cert_file = cert
            ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
            ctx.load_cert_chain(cert, key)
            self._server.socket = ctx.wrap_socket(
                self._server.socket, server_side=True
            )
        self.port = self._server.server_address[1]
        self._thread = threading.Thread(target=self._server.serve_forever, daemon=True)
        self._thread.start()
        return self.host, self.port

    def stop(self) -> None:
        if self._server:
            self._server.shutdown()
            self._server.server_close()
            self._server = None

    # ----------------------------------------------------------------- auth

    def _authorize(self, handler, mode: str, org: str, bucket: str) -> None:
        """401 unless a known token; 403 unless it grants `mode` on the
        bucket (scoped grant or org-wide admin grant)."""
        auth = handler.headers.get("Authorization", "")
        if not auth.startswith("Token "):
            raise ApiError(401, "unauthorized", "unauthorized access")
        token = auth[len("Token "):].strip()
        record = next(
            (r for r in self.engine.tokens.list_records() if r["token"] == token),
            None,
        )
        if record is None:
            raise ApiError(401, "unauthorized", "unknown authorization token")
        try:
            bucket_id = self.engine.store.get_bucket(org, bucket).id
        except FileNotFoundError:
            raise ApiError(404, "not found", f"bucket {bucket!r} not found")
        allowed = {f"{mode}:orgs", f"{mode}:orgs/{org}/buckets/{bucket_id}"}
        if not allowed.intersection(record["permissions"]):
            raise ApiError(403, "forbidden", f"insufficient permissions for {mode}")

    def _bearer_record(self, handler) -> dict:
        """The token record for the request's Authorization header —
        401 when absent/unknown (no bucket-scope check)."""
        auth = handler.headers.get("Authorization", "")
        if not auth.startswith("Token "):
            raise ApiError(401, "unauthorized", "unauthorized access")
        token = auth[len("Token "):].strip()
        record = next(
            (r for r in self.engine.tokens.list_records() if r["token"] == token),
            None,
        )
        if record is None:
            raise ApiError(401, "unauthorized", "unknown authorization token")
        return record

    # ------------------------------------------------------------- dispatch

    def _dispatch(self, handler, method: str) -> None:
        url = urlsplit(handler.path)
        q = {k: v[0] for k, v in parse_qs(url.query).items()}
        try:
            body = b""
            length = int(handler.headers.get("Content-Length") or 0)
            if length:
                body = handler.rfile.read(length)
            # Telegraf's v2 output gzips bodies by default; the
            # reference engine accepts Content-Encoding: gzip on write
            # and query bodies alike
            if handler.headers.get("Content-Encoding", "").lower() == "gzip":
                import gzip as _gzip

                try:
                    body = _gzip.decompress(body)
                except OSError:
                    raise ApiError(400, "invalid", "body is not valid gzip")
            route = (method, url.path)
            if route == ("GET", "/ping"):
                self._respond(handler, 204, None)
            elif route == ("GET", "/health"):
                ok = self.engine.ping() == "OK"
                self._respond(
                    handler,
                    200 if ok else 503,
                    {"name": "influxdb", "status": "pass" if ok else "fail",
                     "message": "ready for queries and writes", "checks": []},
                )
            elif route == ("GET", "/api/v2/setup"):
                self._respond(handler, 200, {"allowed": not self.engine._provisioned})
            elif route == ("POST", "/api/v2/write"):
                self._handle_write(handler, q, body)
            elif route == ("POST", "/write"):
                # v1 compatibility write (Telegraf v1 output / legacy
                # clients): ?db= is the bucket (1:1 DBRP), rp ignored,
                # v1 precision names (n/u/m/h) mapped to the v2 set
                q2 = dict(q)
                if "db" in q2:
                    q2["bucket"] = q2["db"]
                prec = q2.get("precision", "ns")
                q2["precision"] = {"n": "ns", "u": "us", "µ": "us"}.get(prec, prec)
                # m/h pass through: InfluxDB 1.x accepts minute/hour
                # precision (timestamps scale ×60e9 / ×3600e9 in the
                # line-protocol parser) — rejecting them broke legacy
                # clients (ADVICE r6)
                self._handle_write(handler, q2, body, v1=True)
            elif route == ("POST", "/api/v2/query"):
                self._handle_query_flux(handler, q, body)
            elif url.path == "/query":
                self._handle_query_v1(handler, q, body)
            elif route == ("POST", "/api/v2/delete"):
                self._handle_delete(handler, q, body)
            elif url.path == "/api/v2/tasks" or url.path.startswith("/api/v2/tasks/"):
                self._handle_tasks(handler, method, url.path, q, body)
            elif route == ("GET", "/api/v2/orgs"):
                # org-discovery call the influx CLI makes to resolve an
                # org name to an ID before most other operations
                self._authorize(handler, "read", self.engine.config.org,
                                self.engine.config.bucket)
                name_filter = q.get("org") or q.get("name")
                orgs = [self.engine.config.org]
                if name_filter:
                    orgs = [o for o in orgs if o == name_filter]
                self._respond(handler, 200, {"orgs": [
                    {"id": o, "name": o} for o in orgs
                ]})
            elif route == ("GET", "/api/v2/authorizations"):
                # HTTP analog of the reference's `influx auth list`
                # (src/influxDBTokenPublisher.py:53-90): the same token
                # records, admin-scope required
                rec = self._bearer_record(handler)
                if "read:authorizations" not in rec["permissions"]:
                    raise ApiError(403, "forbidden",
                                   "authorizations list requires an admin token")
                self._respond(handler, 200, {
                    "authorizations": self.engine.tokens.list_records()
                })
            elif route == ("POST", "/api/v2/buckets"):
                import json as _json

                doc = _json.loads(body or b"{}")
                org = doc.get("orgID") or doc.get("org") or self.engine.config.org
                name = doc.get("name")
                if not name:
                    raise ApiError(400, "invalid", "bucket name required")
                # bucket creation is an org-admin operation (the
                # scoped RO/RW tokens only grant their one bucket)
                rec = self._bearer_record(handler)
                if "write:orgs" not in rec["permissions"]:
                    raise ApiError(403, "forbidden",
                                   "bucket creation requires an admin token")
                rules = doc.get("retentionRules") or []
                ret_ns = None
                if rules and rules[0].get("everySeconds"):
                    ret_ns = int(rules[0]["everySeconds"]) * 10**9
                # InfluxDB v2 answers 422 on a duplicate bucket name —
                # the store's idempotent create is for engine setup
                # (reference A6), not for the public API
                if self.engine.store._meta_path(org, name).exists():
                    raise ApiError(
                        422, "conflict",
                        f"bucket with name {name} already exists",
                    )
                meta = self.engine.store.create_bucket(org, name, ret_ns)
                self._respond(handler, 201, {
                    "id": meta.id, "orgID": org, "name": meta.name,
                    "type": "user",
                    "retentionRules": (
                        [{"type": "expire",
                          "everySeconds": meta.retention_ns // 10**9}]
                        if meta.retention_ns else []
                    ),
                })
            elif route == ("GET", "/api/v2/buckets"):
                # the discovery call clients (influx CLI, Grafana Flux
                # datasource) issue first; read scope on the org's
                # provisioned bucket gates it
                org = q.get("org") or self.engine.config.org
                self._authorize(handler, "read", org, self.engine.config.bucket)
                name_filter = q.get("name")
                metas = self.engine.store.list_buckets(org)
                if name_filter:
                    metas = [b for b in metas if b.name == name_filter]
                self._respond(handler, 200, {"buckets": [
                    {"id": b.id, "orgID": org, "name": b.name, "type": "user",
                     "retentionRules": (
                         [{"type": "expire",
                           "everySeconds": b.retention_ns // 10**9}]
                         if b.retention_ns else []
                     )}
                    for b in metas
                ]})
            else:
                raise ApiError(404, "not found", f"path not found: {url.path}")
        except ApiError as e:
            self._respond(handler, e.status, {"code": e.code, "message": e.message})
        except Exception as e:  # surface engine errors as 400s, keep serving
            self._respond(handler, 400, {"code": "invalid", "message": str(e)})

    def _respond(self, handler, status: int, payload, content_type="application/json"):
        if payload is None:
            handler.send_response(status)
            handler.end_headers()
            return
        data = (
            payload.encode()
            if isinstance(payload, str)
            else json.dumps(payload).encode()
        )
        handler.send_response(status)
        handler.send_header("Content-Type", content_type)
        handler.send_header("Content-Length", str(len(data)))
        handler.end_headers()
        handler.wfile.write(data)

    def _respond_chunks(self, handler, chunks, content_type="text/csv; charset=utf-8"):
        """Chunked transfer encoding: facade memory stays O(chunk) no
        matter how large the query result is.

        The FIRST chunk is materialized before the status line goes
        out, so plan-time and first-batch errors still surface as a
        proper 400/500. An error after streaming began cannot change
        the status — stock InfluxDB appends an annotated-CSV *error
        table* and terminates the chunk stream, and so do we (r8: the
        old path let the dispatcher write a second "HTTP/1.0 400"
        status line INTO the chunk stream, corrupting the transfer —
        found by the facade fuzz)."""
        import itertools

        it = iter(chunks)
        try:
            first = next(it)
        except StopIteration:
            first, it = "", iter(())
        handler.send_response(200)
        handler.send_header("Content-Type", content_type)
        handler.send_header("Transfer-Encoding", "chunked")
        handler.end_headers()

        def _write(text: str) -> None:
            data = text.encode()
            if data:
                handler.wfile.write(f"{len(data):X}\r\n".encode() + data + b"\r\n")

        try:
            for chunk in itertools.chain([first], it):
                _write(chunk)
        except Exception as exc:  # noqa: BLE001 — mid-stream: emit typed error
            # the error fragment must match the stream's content type
            # (r9 ADVICE fix: CSV error text inside a JSON envelope left
            # clients with unparseable output) — CSV gets the stock
            # annotated error table; JSON gets a JSON error object the
            # client can detect after its truncated envelope.
            raw = str(exc).split("\n", 1)[0][:500]
            if content_type.startswith("application/json"):
                _write("\n" + json.dumps({"error": raw}))
            else:
                msg = raw.replace('"', '""')
                _write(
                    "\r\n#datatype,string,string\r\n#group,true,true\r\n"
                    f'#default,,\r\n,error,reference\r\n,"{msg}",\r\n'
                )
        handler.wfile.write(b"0\r\n\r\n")

    # ------------------------------------------------------------ endpoints

    def _handle_write(self, handler, q: dict, body: bytes,
                      v1: bool = False) -> None:
        org = q.get("org") or self.engine.config.org
        bucket = q.get("bucket") or self.engine.config.bucket
        precision = q.get("precision", "ns")
        # m/h are legal only via the v1 /write route; the v2 API's
        # own precision set is ns/us/ms/s (public API contract). The v1
        # marker is a function argument, NOT a query-dict sentinel — q
        # comes straight from the client's query string, so a sentinel
        # there would let ?precision=h&_v1=1 bypass the v2 contract
        # (ADVICE r7).
        if not v1 and precision not in ("ns", "us", "ms", "s"):
            raise ApiError(
                400, "invalid",
                f"invalid precision {precision!r} (ns, us, ms, s)"
            )
        self._authorize(handler, "write", org, bucket)
        lines = body.decode().splitlines()
        rows = parse_lines(lines, precision=precision, default_time_ns=time.time_ns())
        if not rows:
            raise ApiError(400, "invalid", "no points in request body")
        # Shared wall-clock base (sources/seq.py) so LWW order is
        # consistent with the streaming ingest path; line index within
        # the request stays the low bits (later duplicate line wins).
        base = next_seq_base(rows=len(rows))
        import pandas as pd

        from ..schema import POINTS_SCHEMA

        pdf = pd.DataFrame(rows)
        pdf["ingest_seq"] = pdf["ingest_seq"] + base
        pdf["time"] = pd.to_datetime(pdf["time_ns"] // 1000, unit="us")
        df = self.engine.spark.createDataFrame(
            pdf[[f.name for f in POINTS_SCHEMA.fields]], POINTS_SCHEMA
        )
        from ..sources.bucket import FieldTypeConflict

        try:
            # line protocol is parsed driver-side — the type pins are
            # already known, so the write runs a single Spark job (r11)
            self.engine.store.write_points(
                org, bucket, df,
                known_types={(r["measurement"], r["field"], r["ftype"])
                             for r in rows},
            )
        except FieldTypeConflict as e:
            # stock partial-write contract: valid points landed, the
            # conflicting field is reported with 422 unprocessable
            raise ApiError(422, "unprocessable entity", str(e)) from None
        self._respond(handler, 204, None)

    def _handle_tasks(self, handler, method: str, path: str, q: dict,
                      body: bytes) -> None:
        """``/api/v2/tasks`` — the 2.x downsampling-task API surface:

            POST   /api/v2/tasks             {"flux": "option task = ..."}
            GET    /api/v2/tasks             → {"tasks": [...]}
            DELETE /api/v2/tasks/<id>        → 204
            POST   /api/v2/tasks/<id>/runs   → run now (aligned `now`)

        Mutations require write scope on the task's SOURCE bucket (the
        ``to()`` sink re-checks nothing: a task writes derived data to
        a bucket the org owns, as the engine's CQ path does).
        """
        org = q.get("org") or self.engine.config.org
        reg = self._task_registry(org)

        def _json(task) -> dict:
            return {"id": task.id, "name": task.name, "status": task.status,
                    "flux": task.flux, "everySeconds": task.every_ns // 10**9,
                    "offsetSeconds": task.offset_ns // 10**9}

        m = re.match(r"^/api/v2/tasks(?:/([0-9a-f]+))?(/runs)?$", path)
        if not m:
            raise ApiError(404, "not found", f"path not found: {path}")
        task_id, runs = m.group(1), m.group(2)
        if task_id is not None:
            try:
                reg.get(task_id)
            except KeyError:
                raise ApiError(404, "not found", f"task {task_id!r} not found")

        if method == "POST" and task_id is None:
            payload = json.loads(body.decode() or "{}")
            flux = payload.get("flux", "")
            from ..streaming.flux_tasks import FluxTaskRegistry as _R  # noqa: F401
            # parse first (cheap, no side effects) to learn the source
            # bucket, then authorize against it before registering
            probe = type(reg)(self.engine.store, org).create(flux)
            self._authorize(handler, "write", org, probe.source_bucket)
            task = reg.create(flux)
            self._respond(handler, 201, _json(task))
        elif method == "GET" and task_id is None:
            self._authorize(handler, "read", org, self.engine.config.bucket)
            self._respond(handler, 200, {"tasks": [_json(t) for t in reg.list()]})
        elif method == "GET" and task_id and not runs:
            # fetch single task by id (influx CLI issues this after create)
            task = reg.get(task_id)
            self._authorize(handler, "read", org, task.source_bucket)
            self._respond(handler, 200, _json(task))
        elif method == "DELETE" and task_id and not runs:
            task = reg.get(task_id)
            self._authorize(handler, "write", org, task.source_bucket)
            reg.delete(task_id)
            self._respond(handler, 204, None)
        elif method == "POST" and task_id and runs:
            import time as _time

            task = reg.get(task_id)
            self._authorize(handler, "write", org, task.source_bucket)
            # optional "now" (epoch ns) pins the run time — the
            # scheduledFor equivalent; tests and replays use it
            payload = json.loads(body.decode() or "{}")
            now_ns = int(payload.get("now") or _time.time_ns())
            rows = reg.run(self.engine.spark, task_id, now_ns)
            self._respond(handler, 200,
                          {"taskID": task_id, "status": "success", "rows": rows})
        elif method == "PATCH" and task_id and not runs:
            # pause/resume: {"status": "active" | "inactive"} — paused
            # tasks are skipped by run_due (the 2.x task toggle)
            task = reg.get(task_id)
            self._authorize(handler, "write", org, task.source_bucket)
            payload = json.loads(body.decode() or "{}")
            status = payload.get("status")
            if status not in ("active", "inactive"):
                raise ApiError(400, "invalid", "status must be active|inactive")
            task.status = status
            self._respond(handler, 200, _json(task))
        else:
            raise ApiError(404, "not found", f"unsupported tasks call {method} {path}")

    def _handle_query_flux(self, handler, q: dict, body: bytes) -> None:
        org = q.get("org") or self.engine.config.org
        ctype = handler.headers.get("Content-Type", "")
        text = body.decode()
        # v2 dialect object: which annotation rows + header to emit,
        # plus delimiter / commentPrefix / dateTimeFormat (r9 probe:
        # stock honors all five; dateTimeFormat defaults RFC3339 —
        # which DROPS fractional seconds — vs RFC3339Nano)
        annotations: tuple = ("group", "datatype", "default")
        csv_header = True
        delimiter, comment_prefix = ",", "#"
        datetime_format = "RFC3339"
        if "json" in ctype:
            req = json.loads(text)
            text = req.get("query", "")
            dialect = req.get("dialect") or {}
            if "annotations" in dialect:
                annotations = tuple(dialect["annotations"])
            csv_header = bool(dialect.get("header", True))
            delimiter = dialect.get("delimiter", ",")
            comment_prefix = dialect.get("commentPrefix", "#")
            datetime_format = dialect.get("dateTimeFormat", "RFC3339")
            if len(delimiter) != 1 or delimiter == '"':
                raise ApiError(400, "invalid",
                               "dialect delimiter must be a single non-quote character")
            if datetime_format not in ("RFC3339", "RFC3339Nano"):
                raise ApiError(400, "invalid",
                               "dialect dateTimeFormat must be RFC3339 or RFC3339Nano")
        m = _FROM_BUCKET_RX.search(text)
        if not m:
            raise ApiError(400, "invalid", 'query must reference bucket: "..."')
        bucket = m.group(1)
        self._authorize(handler, "read", org, bucket)
        points = self.engine.store.read_points(org, bucket)
        # catalog-seeded live slots (r13): the bucket's field-type pins
        # bound which value slots can be live, so ordering/presence
        # consumers (sort, selectors, count, conversions, map) skip
        # their plan-time ftype probe entirely; only the typed-error
        # check still probes (a pin can outlive its rows, and stock
        # errors on live tables, not catalog entries)
        from ..frontends.flux import seed_live_slots

        cat = self.engine.store.field_types(org, bucket)
        # the full catalog also rides along so group(columns:)
        # collision checks resolve from the type pins with zero probe
        # jobs on store-backed frames (r14)
        seed_live_slots(
            points,
            {t for fields in cat.values() for t in fields.values()},
            catalog=cat,
        )
        # Flux from() tables are keyed by measurement + TAG SET + field
        # (stock InfluxDB: each series is its own table). The stored
        # bucket schema carries the serialized tag set as series_key —
        # without it in the group key, per-series stages (sum, mean,
        # derivative, aggregateWindow, …) silently merged every series
        # of a measurement into one stream (r8 facade fix; the DSL
        # path's from_bucket always grouped this way).
        gk = (
            ("measurement", "series_key", "field")
            if "series_key" in points.columns
            else ("measurement", "field")
        )

        if re.search(r"\|>\s*to\s*\(", text):
            # write stage present → needs write scope and a store sink
            from ..sources.io import canonicalize_result

            self._authorize(handler, "write", org, bucket)

            def _sink(df, target_bucket: str) -> None:
                self.engine.store.create_bucket(org, target_bucket)
                self.engine.store.write_points(
                    org, target_bucket, canonicalize_result(df)
                )

            results = execute_flux_multi(points, text, sink=_sink, group_key=gk)
        else:
            results = execute_flux_multi(points, text, group_key=gk)

        # stream: chunked encoding over toLocalIterator — an
        # un-aggregated range() over a big bucket never materializes
        # in facade memory. Multi-yield scripts emit one CSV block per
        # yield, each tagged with its result name and separated by an
        # empty row (InfluxDB multi-result annotated-CSV framing).
        def _gen():
            for i, (name, df) in enumerate(results.items()):
                if i:
                    yield "\r\n"
                # table numbering continues across datatype splits of
                # one result (shared table_ids dict); each split emits
                # its own annotation block (schema changed).
                table_ids: dict = {}
                for j, (wire_df, wire_key) in enumerate(_fluxify_result(df)):
                    if j:
                        yield "\r\n"
                    yield from iter_annotated_csv(
                        wire_df, group_key=wire_key, result_name=name,
                        annotations=annotations, header=csv_header,
                        table_ids=table_ids, delimiter=delimiter,
                        comment_prefix=comment_prefix,
                        datetime_format=datetime_format,
                    )

        self._respond_chunks(handler, _gen())

    def _handle_query_v1(self, handler, q: dict, body: bytes) -> None:
        """InfluxQL compatibility: ``/query?db=<bucket>&q=<stmts>`` →
        the 1.x JSON results envelope (DBRP maps db→bucket 1:1 here).

        Multiple semicolon-separated statements run in order, one
        ``results`` entry each (Grafana batches its init SHOWs)."""
        if not q.get("q") and body:
            q.update({k: v[0] for k, v in parse_qs(body.decode()).items()})
        db, text = q.get("db"), q.get("q")
        if not db or not text:
            raise ApiError(400, "invalid", "db and q parameters are required")
        org = q.get("org") or self.engine.config.org
        results = []
        for i, stmt in enumerate(_split_v1_statements(text)):
            res = self._run_v1_statement(handler, org, db, stmt, q.get("epoch"))
            res["statement_id"] = i
            results.append(res)
        if not results:
            raise ApiError(400, "invalid", "empty query")

        if q.get("chunked") in ("true", "1"):
            # stock v1 chunked mode: newline-delimited complete JSON
            # documents of at most chunk_size rows each, with partial
            # flags while a series/statement has more data (r9 probe)
            try:
                chunk_size = max(1, int(q.get("chunk_size", 10000)))
            except ValueError:
                chunk_size = 10000
            self._respond_chunks(
                handler, _iter_v1_json_chunked(results, chunk_size),
                content_type="application/json",
            )
            return

        def _is_streamed(res: dict) -> bool:
            s = res.get("series", [])
            if not isinstance(s, list):
                return True  # lazy series generator — MUST NOT iterate here
            return any(isinstance(x.get("values"), _StreamedValues) for x in s)

        if any(_is_streamed(res) for res in results):
            self._respond_chunks(
                handler, _iter_v1_json(results), content_type="application/json"
            )
        else:
            self._respond(handler, 200, {"results": results})

    def _try_user_statement(self, handler, text: str) -> dict | None:
        """v1 user-management DDL → results dict, or None if ``text``
        is not a user statement. Shapes per the public InfluxQL spec:
        SHOW USERS → (user, admin); SHOW GRANTS FOR u → (database,
        privilege); mutations return an empty result."""
        from .users import UserError

        users = self.engine.users

        def admin_gate():
            rec = self._bearer_record(handler)
            if "write:authorizations" not in rec["permissions"]:
                raise ApiError(403, "forbidden",
                               "user management requires an admin token")

        try:
            m = re.match(
                r"(?is)^\s*CREATE\s+USER\s+\"?([\w.\-]+)\"?\s+WITH\s+PASSWORD\s+"
                r"'([^']*)'(\s+WITH\s+ALL\s+PRIVILEGES)?\s*$", text)
            if m:
                admin_gate()
                users.create(m.group(1), m.group(2), admin=bool(m.group(3)))
                return {}
            m = re.match(r'(?is)^\s*DROP\s+USER\s+"?([\w.\-]+)"?\s*$', text)
            if m:
                admin_gate()
                users.drop(m.group(1))
                return {}
            m = re.match(
                r"(?is)^\s*SET\s+PASSWORD\s+FOR\s+\"?([\w.\-]+)\"?\s*=\s*"
                r"'([^']*)'\s*$", text)
            if m:
                admin_gate()
                users.set_password(m.group(1), m.group(2))
                return {}
            m = re.match(
                r'(?is)^\s*GRANT\s+ALL(?:\s+PRIVILEGES)?\s+TO\s+"?([\w.\-]+)"?\s*$',
                text)
            if m:
                admin_gate()
                users.grant_all(m.group(1))
                return {}
            m = re.match(
                r"(?is)^\s*GRANT\s+(READ|WRITE|ALL)\s+ON\s+\"?([\w.\-]+)\"?\s+"
                r"TO\s+\"?([\w.\-]+)\"?\s*$", text)
            if m:
                admin_gate()
                users.grant(m.group(3), m.group(2), m.group(1))
                return {}
            m = re.match(
                r'(?is)^\s*REVOKE\s+ALL(?:\s+PRIVILEGES)?\s+FROM\s+"?([\w.\-]+)"?\s*$',
                text)
            if m:
                admin_gate()
                users.revoke_all(m.group(1))
                return {}
            m = re.match(
                r"(?is)^\s*REVOKE\s+(READ|WRITE|ALL)\s+ON\s+\"?([\w.\-]+)\"?\s+"
                r"FROM\s+\"?([\w.\-]+)\"?\s*$", text)
            if m:
                admin_gate()
                users.revoke(m.group(3), m.group(2), m.group(1))
                return {}
            if re.match(r"(?is)^\s*SHOW\s+USERS\s*$", text):
                admin_gate()
                return {"series": [{
                    "name": "users", "columns": ["user", "admin"],
                    "values": [[n, a] for n, a in users.show_users()],
                }]}
            m = re.match(r'(?is)^\s*SHOW\s+GRANTS\s+FOR\s+"?([\w.\-]+)"?\s*$',
                         text)
            if m:
                admin_gate()
                return {"series": [{
                    "columns": ["database", "privilege"],
                    "values": [[d, ("ALL PRIVILEGES" if p == "ALL" else p)]
                               for d, p in users.show_grants(m.group(1))],
                }]}
        except UserError as e:
            raise ApiError(400, "invalid", str(e)) from None
        except ValueError as e:  # weak password from validate_password
            raise ApiError(400, "invalid", str(e)) from None
        return None

    def _run_v1_statement(self, handler, org: str, db: str, text: str,
                          epoch: str | None) -> dict:
        """One v1 statement → its ``results[i]`` dict (sans id)."""
        # datasource-init meta statements (Grafana issues these before
        # any data query): SHOW DATABASES / SHOW RETENTION POLICIES
        if re.match(r"(?is)^\s*SHOW\s+DATABASES\s*$", text):
            self._authorize(handler, "read", org, db)
            names = [[b.name] for b in self.engine.store.list_buckets(org)]
            return {"series": [
                {"name": "databases", "columns": ["name"], "values": names}]}
        cm = re.match(r'(?is)^\s*CREATE\s+DATABASE\s+"?([\w.\-]+)"?\s*$', text)
        if cm:
            # v1 DATABASE ≡ v2 bucket here (1:1 DBRP); idempotent like
            # the store's create_bucket (reference A6)
            self._authorize(handler, "write", org, db)
            self.engine.store.create_bucket(org, cm.group(1))
            return {}
        xm = re.match(r'(?is)^\s*DROP\s+DATABASE\s+"?([\w.\-]+)"?\s*$', text)
        if xm:
            # org-admin operation (same gate as v2 bucket creation):
            # scoped RW tokens only grant their one bucket
            rec = self._bearer_record(handler)
            if "write:orgs" not in rec["permissions"]:
                raise ApiError(403, "forbidden",
                               "DROP DATABASE requires an admin token")
            self.engine.store.drop_bucket(org, xm.group(1))
            return {}
        dm = re.match(r'(?is)^\s*DROP\s+MEASUREMENT\s+"?([\w.\-]+)"?\s*$', text)
        if dm:
            self._authorize(handler, "write", org, db)
            # full signed ns range (reference drops MinNanoTime..MaxNanoTime,
            # so pre-1970 points must not survive the drop)
            self.engine.store.delete_predicate(
                org, db, -(2**62), 2**62, F.col("measurement") == dm.group(1)
            )
            # the dropped measurement's field-type pins go with it
            # (stock: a re-created measurement may choose new types)
            self.engine.store.forget_measurement_types(org, db, dm.group(1))
            return {}
        if re.match(r"(?is)^\s*SHOW\s+RETENTION\s+POLICIES(?:\s+ON\s+\S+)?\s*$",
                    text):
            self._authorize(handler, "read", org, db)
            metas = [b for b in self.engine.store.list_buckets(org) if b.name == db]
            rp = [
                [
                    "autogen",
                    f"{m.retention_ns // 10**9}s" if m.retention_ns else "0s",
                    "0s", 1, True,
                ]
                for m in (metas or [BucketMeta(org, db)])
            ]
            return {"series": [
                {"name": db,
                 "columns": ["name", "duration", "shardGroupDuration",
                             "replicaN", "default"],
                 "values": rp}]}

        if re.match(r"(?is)^\s*SHOW\s+SHARDS\s*$", text):
            # one shard ≡ one (bucket, day) parquet partition — the
            # store's physical unit of retention/delete granularity.
            # Filesystem-metadata walk only: no Spark job.
            self._authorize(handler, "read", org, db)
            from ..sources.bucket import DAY_NS

            cols = ["id", "database", "retention_policy", "shard_group",
                    "start_time", "end_time", "expiry_time", "owners"]
            series, sid = [], 1
            for b in self.engine.store.list_buckets(org):
                data = self.engine.store._data_dir(org, b.name)
                days = sorted({
                    int(p.name.split("=", 1)[1])
                    for p in data.glob("measurement=*/day=*") if p.is_dir()
                }) if data.exists() else []
                vals = []
                for d in days:
                    start = _ns_to_rfc3339(d * DAY_NS)
                    end = _ns_to_rfc3339((d + 1) * DAY_NS)
                    exp = _ns_to_rfc3339(
                        (d + 1) * DAY_NS + (b.retention_ns or 0)
                    ) if b.retention_ns else end
                    vals.append([sid, b.name, "autogen", d, start, end, exp, ""])
                    sid += 1
                series.append({"name": b.name, "columns": cols, "values": vals})
            return {"series": series}
        if re.match(r"(?is)^\s*SHOW\s+STATS\s*$", text):
            # exact per-database counters (the v1 'database' stats
            # block): measurements from partition dirs (metadata), series
            # from a pruned distinct scan of the dictionary-encoded
            # series_key column
            self._authorize(handler, "read", org, db)
            series = []
            for b in self.engine.store.list_buckets(org):
                data = self.engine.store._data_dir(org, b.name)
                n_meas = len(list(data.glob("measurement=*"))) if data.exists() else 0
                n_series = 0
                if n_meas:
                    n_series = (
                        self.engine.store.read_points(org, b.name, lww=False)
                        .select("series_key").distinct().count()
                    )
                series.append({
                    "name": "database", "tags": {"database": b.name},
                    "columns": ["numMeasurements", "numSeries"],
                    "values": [[n_meas, n_series]],
                })
            return {"series": series}
        if re.match(r"(?is)^\s*SHOW\s+DIAGNOSTICS\s*$", text):
            self._authorize(handler, "read", org, db)
            from .. import __version__
            import os as _os
            import platform as _platform

            now = dt.datetime.now(dt.timezone.utc)
            return {"series": [
                {"name": "build",
                 "columns": ["Branch", "Commit", "Version"],
                 "values": [["main", "", __version__]]},
                {"name": "system",
                 "columns": ["PID", "currentTime", "hostname"],
                 "values": [[_os.getpid(), now.isoformat(), _platform.node()]]},
            ]}

        # v1 user management (public InfluxQL spec; privileges map to
        # the v2 model like DBRP: db ≡ bucket). Mutations are
        # admin-gated — same bar as v2 authorizations.
        um = self._try_user_statement(handler, text)
        if um is not None:
            return um

        # continuous-query DDL: CREATE/DROP/SHOW CONTINUOUS QUERIES
        # (the v1 downsampling idiom; streaming/cq.py owns semantics)
        if re.match(r"(?is)^\s*(CREATE|DROP)\s+CONTINUOUS\s+QUERY\b", text):
            self._authorize(handler, "write", org, db)
            reg = self._cq_registry(org)
            if re.match(r"(?is)^\s*CREATE\b", text):
                reg.create(text)
            else:
                reg.drop(text)
            return {}
        if re.match(r"(?is)^\s*SHOW\s+CONTINUOUS\s+QUERIES\s*$", text):
            self._authorize(handler, "read", org, db)
            reg = self._cq_registry(org)
            by_db: dict[str, list] = {}
            for row in reg.show():
                by_db.setdefault(row["db"], []).append([row["name"], row["query"]])
            return {"series": [
                {"name": d, "columns": ["name", "query"], "values": v}
                for d, v in sorted(by_db.items())
            ] or [{"name": db, "columns": ["name", "query"], "values": []}]}

        # v1 DELETE statement (Grafana/CLI compat): DELETE FROM m WHERE ...
        # DROP SERIES FROM m [WHERE tag=...] is the same store operation
        # with no time bounds (v1 docs: both delete points; DROP SERIES
        # additionally drops the series key — equivalent here, where a
        # series with no points no longer exists)
        dm = re.match(
            r'(?is)^\s*(?:DELETE|DROP\s+SERIES)\s+FROM\s+"?([\w.\-]+)"?'
            r"(?:\s+WHERE\s+(.+))?\s*$",
            text,
        )
        if dm:
            from ..frontends.influxql import InfluxQLQuery, _parse_where

            self._authorize(handler, "write", org, db)
            flt = InfluxQLQuery(fields=[], measurement="")
            if dm.group(2):
                _parse_where(dm.group(2), flt)
            pred = F.col("measurement") == dm.group(1)
            for name, op, val in flt.tag_filters:
                c = F.col("tags")[name]
                pred = pred & (c == val) if op == "=" else pred & (c != val)
            self.engine.store.delete_predicate(
                org, db,
                flt.time_start_ns or 0,
                flt.time_stop_ns if flt.time_stop_ns is not None else 2**62,
                pred,
            )
            return {}

        # SELECT ... INTO <target> FROM ... — the v1 continuous-query
        # idiom: run the query, write its rows back as points
        im = re.match(
            r'(?is)^\s*(SELECT\s+.+?)\s+INTO\s+"?([\w.\-]+)"?\s+(FROM\s+.+)$',
            text,
        )
        if im:
            from pyspark.sql import Observation

            from ..sources.io import into_type_triples, result_to_points

            self._authorize(handler, "write", org, db)
            points = self.engine.store.read_points(org, db)
            inner_q = f"{im.group(1)} {im.group(3)}"
            result = execute_influxql(
                points, inner_q,
                field_types=self.engine.store.field_types(org, db),
            )
            # INTO tag/field provenance (r12, stock semantics): the
            # query's GROUP BY tags stay TAGS in the destination;
            # every other result column becomes a FIELD of its own
            # type (string fields stay string fields; ungrouped tags
            # convert to fields). GROUP BY * keeps the legacy
            # all-strings-are-tags downsample mapping.
            gt = list(parse_influxql(inner_q).group_tags)
            into_tags = None if "*" in gt else gt
            # single-execution write (r11): the written-row count rides
            # the write job as an observation; type pins come from the
            # result schema — one job, not three
            obs = Observation()
            new_pts = result_to_points(
                result, im.group(2), tag_cols=into_tags
            ).observe(obs, F.count(F.lit(1)).alias("n"))
            from ..sources.bucket import FieldTypeConflict

            try:
                self.engine.store.write_points(
                    org, db, new_pts,
                    known_types=into_type_triples(result, im.group(2),
                                                  tag_cols=into_tags),
                )
            except FieldTypeConflict as e:
                # v1 returns the conflict as a statement-level error
                return {"error": str(e)}
            return {"series": [{"name": "result",
                                "columns": ["time", "written"],
                                "values": [[0, obs.get["n"]]]}]}

        self._authorize(handler, "read", org, db)
        points = self.engine.store.read_points(org, db)
        # the store's field-type catalog resolves field slots
        # driver-side — no per-query distinct job (r10)
        result = execute_influxql(
            points, text,
            field_types=self.engine.store.field_types(org, db),
        )
        div = {"ns": 1, "u": 1000, "us": 1000, "ms": 10**6, "s": 10**9}.get(epoch)
        # epoch ns computed in the plan (unix_micros is tz-independent);
        # collect() returns naive local-tz datetimes, so any driver-side
        # tz math would shift on non-UTC drivers
        cols = result.columns
        if "time" in cols:
            result = result.withColumn(
                "_time_ns_out", F.expr("unix_micros(time) * 1000")
            )
        def cell(row, c):
            v = row[c]
            if c == "time" and v is not None:
                ns = row["_time_ns_out"]
                return ns // div if div else _ns_to_rfc3339(ns)
            return v

        name = re.search(r'FROM\s+"?(\w+)"?', text, re.IGNORECASE)
        sname = name.group(1) if name else db

        # stock v1 framing: GROUP BY <tag,...> emits ONE SERIES PER TAG
        # SET, each tagged with {"tags": {...}} and the tag columns
        # removed from "columns" (Grafana reads the tags dict for
        # aliasing). The split stays streaming: rows arrive sorted by
        # the tag columns and itertools.groupby cuts series boundaries
        # without buffering more than one row group's pull-ahead.
        gtags: list[str] = []
        is_agg = False
        try:
            from ..frontends.influxql import _NON_TAG_COLS, _map_tag_keys

            _ast = parse_influxql(text)
            gt = _ast.group_tags
            is_agg = bool(
                any(fn for fn, _f, _a in _ast.fields)
                or _ast.nested or _ast.arith
            )
            if "*" in gt:
                # GROUP BY *: the executed frame carries every tag as a
                # materialized column — recover the list the same way
                # the frontend expanded it
                keys = {
                    c for c in points.columns
                    if c not in _NON_TAG_COLS and not c.startswith("_")
                }
                if "tags" in points.columns:
                    keys |= set(_map_tag_keys(points))
                gtags = sorted(k for k in keys if k in cols)
            else:
                gtags = [t for t in gt if t != "*" and t in cols]
        except Exception:  # SHOW/DDL forms handled elsewhere
            gtags = []

        # stock v1: an aggregate without GROUP BY time still carries a
        # leading time column pinned to epoch 0
        synth_time = is_agg and "time" not in cols
        t0_cell = (0 if div else _ns_to_rfc3339(0)) if synth_time else None

        # rows reach the driver one partition at a time (mirrors the
        # v2 annotated-CSV path) — a raw SELECT * over a big
        # measurement never materializes in facade memory; the JSON
        # envelope is emitted incrementally by _iter_v1_json
        # series splitters: a retained `measurement` column (multi-
        # measurement FROM lists / regexes — stock emits one series
        # PER MEASUREMENT, named by it) plus the GROUP BY tags
        split_meas = "measurement" in cols
        splitters = (["measurement"] if split_meas else []) + gtags
        if splitters:
            order = splitters + (["time"] if "time" in cols else [])
            frozen = result.orderBy(*order)
            data_cols = [c for c in cols if c not in splitters]
            out_cols = (["time"] if synth_time else []) + data_cols

            def _series_gen():
                import itertools

                it = frozen.toLocalIterator(prefetchPartitions=True)
                for key, rows in itertools.groupby(
                    it, key=lambda r: tuple(r[t] for t in splitters)
                ):
                    tags = dict(zip(splitters, key))
                    meas_name = tags.pop("measurement", None)
                    series = {
                        "name": meas_name if split_meas else sname,
                        "columns": out_cols,
                        "values": _StreamedValues(
                            ([t0_cell] if synth_time else [])
                            + [cell(r, c) for c in data_cols]
                            for r in rows
                        ),
                    }
                    if tags:
                        series["tags"] = tags
                    yield series

            # stock v1: a data query with no rows answers with NO
            # series key at all ({"statement_id": 0}) — one-series
            # look-ahead, then the generator resumes streaming
            import itertools as _it

            gen = _series_gen()
            head = next(gen, None)
            if head is None:
                return {}
            return {"series": _it.chain([head], gen)}

        frozen = result
        out_cols = (["time"] if synth_time else []) + cols

        def _rows():
            for r in frozen.toLocalIterator(prefetchPartitions=True):
                yield (
                    ([t0_cell] if synth_time else [])
                    + [cell(r, c) for c in cols]
                )

        # stock v1: empty data result → no series key (one-row
        # look-ahead; the iterator then resumes streaming untouched)
        import itertools as _it

        row_it = _rows()
        head = next(row_it, None)
        if head is None:
            return {}
        series = {
            "name": sname,
            "columns": out_cols,
            "values": _StreamedValues(_it.chain([head], row_it)),
        }
        return {"series": [series]}

    def _handle_delete(self, handler, q: dict, body: bytes) -> None:
        org = q.get("org") or self.engine.config.org
        bucket = q.get("bucket") or self.engine.config.bucket
        self._authorize(handler, "write", org, bucket)
        req = json.loads(body.decode() or "{}")
        if "start" not in req or "stop" not in req:
            raise ApiError(400, "invalid", "start and stop are required")
        predicate = (
            _parse_delete_predicate(req["predicate"]) if req.get("predicate") else None
        )
        self.engine.store.delete_predicate(
            org,
            bucket,
            _rfc3339_to_ns(req["start"]),
            _rfc3339_to_ns(req["stop"]),
            predicate,
        )
        self._respond(handler, 204, None)

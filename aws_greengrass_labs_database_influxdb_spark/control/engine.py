"""Engine: the component lifecycle, re-homed around Spark.

Reference lifecycle being reproduced (SURVEY.md §3.1):
provision (org/bucket/user via ``influx setup --force``,
``/root/reference/src/influxdb_utils.sh:199-213``) → create RO/RW
scoped tokens (``:215-216``) → publish listener on the token-request
topic (``src/influxDBTokenPublisher.py:93-136``) → serve. Idempotent
re-open when already provisioned (``influxdb_utils.sh:190-220``).

The vending contract (§3.2): request
``{"action": "RetrieveToken", "accessLevel": "RO"|"RW"|"Admin"}`` on
the request topic → response with the 9 connection-metadata keys +
token on the response topic (``src/influxDBTokenPublisher.py:108-116``,
``src/influxDBTokenStreamHandler.py:117-118``, ``README.md:271-286``).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from ..sources.bucket import BucketStore
from .broker import Broker
from .secrets import CredentialsProvider, validate_password
from .tokens import TokenRegistry

logger = logging.getLogger(__name__)

DEFAULT_REQUEST_TOPIC = "greengrass/influxdb/token/request"
DEFAULT_RESPONSE_TOPIC = "greengrass/influxdb/token/response"


@dataclass
class EngineConfig:
    org: str = "greengrass"
    bucket: str = "greengrass-telemetry"
    store_root: str = "/tmp/aws_greengrass_labs_database_influxdb_spark-store"
    interface: str = "127.0.0.1"
    port: int = 8086
    server_protocol: str = "https"
    skip_tls_verify: bool = True
    container_name: str = "greengrass_InfluxDB"
    request_topic: str = DEFAULT_REQUEST_TOPIC
    response_topic: str = DEFAULT_RESPONSE_TOPIC
    retention_ns: int | None = None
    auto_provision: bool = True


@dataclass
class Engine:
    spark: SparkSession
    config: EngineConfig = field(default_factory=EngineConfig)

    def __post_init__(self):
        from .users import UserRegistry

        self.store = BucketStore(self.spark, self.config.store_root)
        self.tokens = TokenRegistry()
        self.users = UserRegistry()  # v1 user-management statements
        self.broker = Broker()
        self._provisioned = False
        self._running = False

    # ------------------------------------------------------------ lifecycle

    def setup(self, credentials: CredentialsProvider) -> None:
        """Provision: validate password, create org/bucket, mint admin +
        RO/RW tokens. Idempotent (reference A6: reuse when auth exists)."""
        if self._provisioned:
            return
        username, password = credentials.fetch()
        validate_password(password)
        meta = self.store.create_bucket(
            self.config.org, self.config.bucket, self.config.retention_ns
        )
        self.tokens.create_admin(username)
        self.tokens.create_scoped("RO", self.config.org, meta.id, username)
        self.tokens.create_scoped("RW", self.config.org, meta.id, username)
        self._provisioned = True

    def serve(self) -> None:
        """Start answering token requests on the request topic."""
        if not self._provisioned and self.config.auto_provision:
            raise RuntimeError("setup() must run before serve()")
        # Token list fetched once and cached for all requests — the
        # reference memoizes its `influx auth list` the same way
        # (influxDBTokenPublisher.py:142).
        self._token_records = self.tokens.list_records()
        self.broker.subscribe(self.config.request_topic, self._on_request)
        self._running = True

    def close(self) -> None:
        """A19: stop serving, release resources (streams stop upstream)."""
        if self._running:
            self.broker.unsubscribe(self.config.request_topic, self._on_request)
            self._running = False

    def ping(self) -> str:
        """A5: liveness — session alive and catalog reachable → 'OK'."""
        self.spark.sql("SELECT 1").collect()
        self.store.list_buckets(self.config.org)
        return "OK"

    # -------------------------------------------------------------- vending

    def connection_metadata(self) -> dict:
        c = self.config
        return {
            "InfluxDBContainerName": c.container_name,
            "InfluxDBOrg": c.org,
            "InfluxDBBucket": c.bucket,
            "InfluxDBPort": str(c.port),
            "InfluxDBInterface": c.interface,
            "InfluxDBServerProtocol": c.server_protocol,
            "InfluxDBSkipTLSVerify": "true" if c.skip_tls_verify else "false",
        }

    def get_publish_json(self, request: dict) -> dict | None:
        """Build the token response (handler contract §3.2/3):
        validate action, select token by access level, raise on empty
        token, merge metadata. Returns None for invalid requests."""
        if not request or request.get("action") != "RetrieveToken":
            logger.warning("invalid token request: %r", request)
            return None
        access = request.get("accessLevel", "")
        token = TokenRegistry.select_token(self._token_records, access)
        if token is None:
            logger.warning("unknown access level: %r", access)
            return None
        response = dict(self.connection_metadata())
        response["InfluxDBTokenAccessType"] = access
        response["InfluxDBToken"] = token
        return response

    def _on_request(self, topic: str, message: dict) -> None:
        try:
            response = self.get_publish_json(message)
        except Exception:
            # stream stays open on handler errors (reference :57-70)
            logger.exception("token request handling failed")
            return
        if response is not None:
            self.broker.publish(self.config.response_topic, response)

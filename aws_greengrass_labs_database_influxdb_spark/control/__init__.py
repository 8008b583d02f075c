"""Layer A — the control plane of the reference component, re-homed.

The reference (`aws-greengrass-labs-database-influxdb`) is a Greengrass
component that provisions an InfluxDB instance and vends scoped auth
tokens over IPC pub/sub (SURVEY.md §2.1/§3). Here the same contract —
secret retrieval, password policy, org/bucket/user setup, RO/RW/Admin
token registry, request→response token vending, ping — runs in-process
around the Spark engine instead of around a Docker container.
"""

from .secrets import CredentialsProvider, SecretFormatError, validate_password  # noqa: F401
from .tokens import TokenRecord, TokenRegistry  # noqa: F401
from .broker import Broker  # noqa: F401
from .engine import Engine, EngineConfig  # noqa: F401

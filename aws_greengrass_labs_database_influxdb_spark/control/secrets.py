"""Credential retrieval + password policy.

Reference behavior being reproduced (cited for parity, not copied):
- secret document shape ``{"influxdb_username": ..,
  "influxdb_password": ..}`` parsed at
  ``/root/reference/src/retrieveInfluxDBSecrets.py:69-70`` — missing
  keys raise (KeyError in the reference's tests);
- 10 s retrieval timeout (``retrieveInfluxDBSecrets.py:12``);
- password policy: ≥16 chars with uppercase, lowercase, digit, and a
  special from ``#$@%+*&!^`` (``/root/reference/src/influxdb_utils.sh:102-110``).
"""

from __future__ import annotations

import json
import re
from collections.abc import Callable

DEFAULT_TIMEOUT_S = 10.0

_SPECIALS = "#$@%+*&!^"
_PASSWORD_RULES = (
    (re.compile(r".{16,}"), "at least 16 characters"),
    (re.compile(r"[A-Z]"), "an uppercase letter"),
    (re.compile(r"[a-z]"), "a lowercase letter"),
    (re.compile(r"[0-9]"), "a digit"),
    (re.compile(f"[{re.escape(_SPECIALS)}]"), f"a special character ({_SPECIALS})"),
)


class SecretFormatError(KeyError):
    """Secret document missing required fields (reference: KeyError)."""


def validate_password(password: str) -> None:
    """Enforce the reference's password policy; raises ValueError."""
    failures = [msg for rx, msg in _PASSWORD_RULES if not rx.search(password or "")]
    if failures:
        raise ValueError("password must contain " + ", ".join(failures))


def parse_secret_document(doc: str | dict) -> tuple[str, str]:
    """Parse the secret JSON → (username, password).

    Raises SecretFormatError (a KeyError) when fields are absent and
    ValueError when present but empty — matching the reference's
    failure modes.
    """
    data = json.loads(doc) if isinstance(doc, str) else doc
    try:
        user = data["influxdb_username"]
        pwd = data["influxdb_password"]
    except (KeyError, TypeError) as e:
        raise SecretFormatError(
            "secret document must contain influxdb_username and influxdb_password"
        ) from e
    if not user or not pwd:
        raise ValueError("influxdb_username/influxdb_password must be non-empty")
    return user, pwd


class CredentialsProvider:
    """Pluggable credentials source: a dict, a JSON string, a file path,
    or a zero-arg callable returning any of those (the IPC/SecretManager
    stand-in). ``fetch`` applies the reference's parse + timeout
    semantics."""

    def __init__(
        self,
        source: str | dict | Callable[[], str | dict],
        timeout_s: float = DEFAULT_TIMEOUT_S,
    ):
        self._source = source
        self.timeout_s = timeout_s

    def fetch(self) -> tuple[str, str]:
        src = self._source
        if callable(src):
            src = src()
        if isinstance(src, str) and src.lstrip().startswith(("{", "[")) is False:
            with open(src, encoding="utf-8") as f:
                src = f.read()
        return parse_secret_document(src)

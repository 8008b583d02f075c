"""Token registry + the vending selection contract.

Reference parity (behavioral, re-implemented):
- three tokens exist after provisioning: RO ``greengrass_read``, RW
  ``greengrass_readwrite`` (``/root/reference/src/influxdb_utils.sh:79-85,
  215-216``) and the admin token whose description ends with
  ``"'s Token"`` (``src/influxDBTokenStreamHandler.py:19,106-110``);
- token records carry ``{id, description, token, status, userName,
  userID, permissions[]}`` with permissions scoped
  ``read:orgs/<org>/buckets/<bucket>`` / ``write:...``
  (fixture shape: ``test/test_influxDBTokenStreamHandler.py:15-51``);
- selection: accessLevel RW → description ``greengrass_readwrite``,
  RO → ``greengrass_read``, Admin → first record whose description
  ends ``"'s Token"``; an empty token value raises ValueError
  (``src/influxDBTokenStreamHandler.py:97-116``).
"""

from __future__ import annotations

import secrets as _secrets
from dataclasses import dataclass, field

ADMIN_SUFFIX = "'s Token"
RO_DESCRIPTION = "greengrass_read"
RW_DESCRIPTION = "greengrass_readwrite"
VALID_ACCESS_LEVELS = ("RO", "RW", "Admin")


@dataclass
class TokenRecord:
    id: str
    description: str
    token: str
    status: str = "active"
    userName: str = ""
    userID: str = ""
    permissions: list[str] = field(default_factory=list)

    def to_dict(self) -> dict:
        return {
            "id": self.id,
            "description": self.description,
            "token": self.token,
            "status": self.status,
            "userName": self.userName,
            "userID": self.userID,
            "permissions": list(self.permissions),
        }


class TokenRegistry:
    """In-process stand-in for `influx auth` state."""

    def __init__(self):
        self._records: list[TokenRecord] = []
        self._next_id = 0

    # -- creation (A10/A12) -------------------------------------------------

    def _new_id(self) -> str:
        self._next_id += 1
        return f"{self._next_id:016x}"

    def create_admin(self, username: str) -> TokenRecord:
        rec = TokenRecord(
            id=self._new_id(),
            description=f"{username}{ADMIN_SUFFIX}",
            token=_secrets.token_urlsafe(44),
            userName=username,
            userID=self._new_id(),
            permissions=["read:orgs", "write:orgs", "read:authorizations", "write:authorizations"],
        )
        self._records.append(rec)
        return rec

    def create_scoped(
        self, access: str, org_id: str, bucket_id: str, username: str = ""
    ) -> TokenRecord:
        """RO/RW bucket-scoped token (descriptions per the reference)."""
        if access == "RO":
            desc = RO_DESCRIPTION
            perms = [f"read:orgs/{org_id}/buckets/{bucket_id}"]
        elif access == "RW":
            desc = RW_DESCRIPTION
            perms = [
                f"read:orgs/{org_id}/buckets/{bucket_id}",
                f"write:orgs/{org_id}/buckets/{bucket_id}",
            ]
        else:
            raise ValueError(f"scoped tokens are RO or RW, got {access!r}")
        rec = TokenRecord(
            id=self._new_id(),
            description=desc,
            token=_secrets.token_urlsafe(44),
            userName=username,
            userID=self._new_id(),
            permissions=perms,
        )
        self._records.append(rec)
        return rec

    # -- retrieval (A13/A15) ------------------------------------------------

    def list_records(self) -> list[dict]:
        """`influx auth list --json` equivalent; raises if empty (the
        publisher fails hard on no tokens — influxDBTokenPublisher.py:84-88)."""
        if not self._records:
            raise RuntimeError("no tokens found; was the engine provisioned?")
        return [r.to_dict() for r in self._records]

    @staticmethod
    def select_token(records: list[dict], access_level: str) -> str | None:
        """The vending selection logic (influxDBTokenStreamHandler.py:97-116).

        Returns the token string, None for an unknown access level or no
        matching record; raises ValueError when a matching record has an
        empty token value.
        """
        if access_level not in VALID_ACCESS_LEVELS:
            return None
        token: str | None = None
        matched = False
        if access_level == "Admin":
            # Mirror the reference exactly: only the FIRST record is
            # inspected, by substring containment — an admin token not
            # in position 0 or with the identifier mid-description
            # behaves identically (influxDBTokenStreamHandler.py:107-110)
            desc0 = records[0].get("description", "") if records else ""
            if ADMIN_SUFFIX not in desc0:
                return None
            matched = True
            token = records[0].get("token")
        else:
            for rec in records:
                desc = rec.get("description", "")
                if (access_level == "RW" and desc == RW_DESCRIPTION) or (
                    access_level == "RO" and desc == RO_DESCRIPTION
                ):
                    matched = True
                    token = rec.get("token")
                    break
        if not matched:
            return None
        if not token:
            raise ValueError(f"retrieved an empty token for access level {access_level}")
        return token

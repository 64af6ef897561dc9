"""Deterministic keyset paging tokens.

The reference surfaces resumable progress as a base64-encoded JSON
``{Token, HasMore}`` wrapping the Cassandra driver's opaque paging state
(reference: PagingInfo.cs:28-31,54-92; CassandraEventStore.cs:462-472).
Opaque driver state does not exist in Spark, so tokens here are
value-based and deterministic (SURVEY §4 "needs design, not a Catalyst
rule"): the last-seen clustering key — ``(rev, pos)`` for aggregate
paging (R4/R5), ``(pid, ts, aid, rev, pos)`` for index paging (X2/X3) —
serialized as base64 JSON for wire parity with the reference's shape.
"""

from __future__ import annotations

import base64
import json
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class PagingToken:
    """Resumable position. ``keys`` holds the last-seen keyset values."""

    keys: dict[str, Any] = field(default_factory=dict)
    has_more: bool = True

    def encode(self) -> str:
        return encode_token(self)


def encode_token(token: PagingToken) -> str:
    """PagingToken → base64(JSON) string (bytes values hex-encoded)."""
    keys = {
        k: {"$hex": v.hex()} if isinstance(v, (bytes, bytearray)) else v
        for k, v in token.keys.items()
    }
    payload = {"Token": keys, "HasMore": token.has_more}
    return base64.b64encode(json.dumps(payload, sort_keys=True).encode()).decode()


def decode_token(encoded: str | None) -> PagingToken:
    """base64 string → PagingToken; None/empty → fresh start token."""
    if not encoded:
        return PagingToken(keys={}, has_more=True)
    payload = json.loads(base64.b64decode(encoded).decode())
    keys = {
        k: bytes.fromhex(v["$hex"]) if isinstance(v, dict) and "$hex" in v else v
        for k, v in (payload.get("Token") or {}).items()
    }
    return PagingToken(keys=keys, has_more=bool(payload.get("HasMore", True)))

"""Arrow-batched adapters for user-supplied serializer callables.

The reference's ``ISerializer`` seam (CassandraEventStore.cs:211,
CassandraMessageStore.cs:60) deserializes payloads one message at a
time on the client; the Spark twin accepts the same scalar callable
(``bytes -> str``) but must NOT run it through a row-at-a-time
``F.udf``: that serializes every row through pickle individually and
sits on the ingest/scan hot path. These wrappers keep the user
contract while moving transport to Arrow record batches — one worker
call per batch, columnar transfer — the 10-100x seam the rest of the
engine's pandas kernels already use.
"""

# NO ``from __future__ import annotations`` here: pandas_udf infers the
# eval type from RESOLVED type hints on the wrapped function, and
# stringized ``pd.Series`` hints fail to resolve when pandas is only a
# local import — pandas must be importable at module scope.
from typing import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def arrow_scalar_udf(fn: Callable, ret_type: str = "string") -> Callable:
    """Wrap a scalar python callable (one value -> one value) as an
    Arrow-batched pandas UDF. The callable still runs per element
    inside the batch (it is arbitrary user code), but rows reach the
    python worker as Arrow columns instead of pickled singletons, and
    nulls short-circuit without calling ``fn``.

    Value-type contract: BinaryType columns reach ``fn`` as immutable
    ``bytes`` (Arrow's decoding), NOT the ``bytearray`` the legacy
    row-at-a-time ``F.udf`` path passed — the normalization below
    makes that explicit so callables that ``isinstance(v, bytes)``
    or hash the payload behave identically on both engines' defaults;
    callables that MUTATED the buffer in place must copy first (they
    were relying on pickle giving them a private bytearray)."""

    @F.pandas_udf(ret_type)
    def _batched(s: pd.Series) -> pd.Series:
        return s.map(
            lambda v: None
            if v is None
            else fn(bytes(v) if isinstance(v, (bytearray, memoryview)) else v)
        )

    return _batched


def apply_scalar(col, fn: Callable, ret_type: str = "string") -> Column:
    """``fn(col)`` as a single Arrow-batched column expression."""
    return arrow_scalar_udf(fn, ret_type)(col)

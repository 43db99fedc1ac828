"""Deterministic table ids: RFC-4122 UUIDv3 over the table URI bytes.

Replicates java.util.UUID.nameUUIDFromBytes (MD5 digest, version=3,
IETF variant) used at TableMetadataUploaderService.java:481-483. Same
path => same id — a documented reference behavior we preserve
(README.md:408-411).

Spark has no uuid3 builtin, so this is the engine's single scalar UDF.
It runs only over the tiny `tables` dimension (thousands of rows, never
the fact side), so the Python round-trip cost is irrelevant at scale.
"""

from __future__ import annotations

import hashlib
import uuid

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import StringType


def uuid3_from_uri(table_uri: str) -> str:
    """Exact UUID.nameUUIDFromBytes(uri.getBytes(UTF_8)) equivalent."""
    md5 = bytearray(hashlib.md5(table_uri.encode("utf-8")).digest())
    md5[6] = (md5[6] & 0x0F) | 0x30  # version 3
    md5[8] = (md5[8] & 0x3F) | 0x80  # IETF variant
    return str(uuid.UUID(bytes=bytes(md5)))


@F.pandas_udf(StringType())
def uuid3_udf(uris: pd.Series) -> pd.Series:
    return uris.map(uuid3_from_uri)

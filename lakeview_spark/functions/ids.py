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


def uuid3_expr(uri):
    """uuid3 as a pure columnar expression (JVM md5 + string surgery) —
    preferred in query paths: stays inside whole-stage codegen.

    UUID layout over the md5 hex: chars 1-8|9-12|13-16|17-20|21-32 with
    char 13 forced to '3' (version) and char 17 mapped via d -> (d&3)|8
    (IETF variant), which `translate` expresses as a 16-char table.
    """
    m = F.md5(uri)
    return F.concat(
        F.substring(m, 1, 8),
        F.lit("-"),
        F.substring(m, 9, 4),
        F.lit("-3"),
        F.substring(m, 14, 3),
        F.lit("-"),
        F.translate(F.substring(m, 17, 1), "0123456789abcdef", "89ab89ab89ab89ab"),
        F.substring(m, 18, 3),
        F.lit("-"),
        F.substring(m, 21, 12),
    )

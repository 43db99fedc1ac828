"""Sinks (SURVEY §2.1 S6/S7).

The reference's sink is presigned-URL HTTP PUTs in per-batch groups with
retry/backoff (PresignedUrlFileUploader.java:38-119). Our generic sink is
a pluggable ``foreachPartition`` writer; the default implementation
mirrors timeline files into a local directory tree (the test/local
equivalent of the Onehouse backend), and parquet/json writers cover the
analytical outputs.

Executor-side, per-partition, with bounded retry — no driver collect.
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Callable, Iterable

from pyspark.sql import DataFrame


def mirror_sink(dest_root: str, max_retries: int = 3, base_backoff_s: float = 0.1) -> Callable:
    """foreachPartition writer copying (table_id, src_path, rel_path) rows.

    Retry with exponential backoff mirrors AsyncHttpClientWithRetry
    (:124-129: 3 retries, exp backoff); swap the `copy` body for an HTTP
    PUT to target a real backend.
    """

    def write_partition(rows: Iterable) -> None:
        for row in rows:
            dest = os.path.join(dest_root, row.table_id, row.rel_path)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            attempt = 0
            while True:
                try:
                    shutil.copyfile(row.src_path, dest)
                    break
                except OSError:
                    attempt += 1
                    if attempt > max_retries:
                        raise
                    time.sleep(base_backoff_s * (2 ** (attempt - 1)))

    return write_partition


DEFAULT_UPLOAD_CHUNK_BYTES = 5 * 1024 * 1024  # reference stream batch size


class FileUploadError(RuntimeError):
    """Non-2xx response from the upload target (FileUploadException analog)."""


def upload_file_to_presigned_url(
    put: Callable,
    presigned_url: str,
    src_path: str,
    chunk_bytes: int = DEFAULT_UPLOAD_CHUNK_BYTES,
    max_retries: int = 3,
    base_backoff_s: float = 0.1,
    sleep: Callable[[float], None] = time.sleep,
    retryable_exceptions: tuple = (FileUploadError, OSError),
) -> int:
    """One presigned-URL PUT (PresignedUrlFileUploader.java:48-119).

    Reference semantics: files at or under the stream batch size upload
    as a single buffered body; larger files stream the SAME single PUT
    in `chunk_bytes` pieces (one request, chunked body — not multipart).
    Retry wraps the whole request with exponential backoff
    (AsyncHttpClientWithRetry semantics, which covers network failures
    too): a non-2xx status raises FileUploadError, and transport-level
    errors (connection reset / timeout surface as OSError subclasses)
    retry in the same loop via ``retryable_exceptions``; anything
    outside that tuple propagates immediately.

    ``put(url, body_iter, content_length) -> status_code`` is the
    transport — an HTTP client in production, a fake in tests. Returns
    bytes uploaded.
    """
    size = os.path.getsize(src_path)

    def body() -> Iterable[bytes]:
        with open(src_path, "rb") as f:
            if size <= chunk_bytes:
                yield f.read()
                return
            while True:
                chunk = f.read(chunk_bytes)
                if not chunk:
                    return
                yield chunk

    attempt = 0
    while True:
        try:
            status = put(presigned_url, body(), size)
            if not (200 <= status < 300):
                raise FileUploadError(
                    f"File upload failed: response code: {status}"
                )
            return size
        except retryable_exceptions:
            attempt += 1
            if attempt > max_retries:
                raise
            sleep(base_backoff_s * (2 ** (attempt - 1)))


def presigned_upload_sink(
    put: Callable,
    url_for_row: Callable,
    chunk_bytes: int = DEFAULT_UPLOAD_CHUNK_BYTES,
) -> Callable:
    """foreachPartition sink PUTting (table_id, src_path, ...) rows to
    their presigned URLs — the production twin of mirror_sink; the
    upload runs executor-side per partition, never through the driver."""

    def write_partition(rows: Iterable) -> None:
        for row in rows:
            upload_file_to_presigned_url(
                put, url_for_row(row), row.src_path, chunk_bytes=chunk_bytes
            )

    return write_partition


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)

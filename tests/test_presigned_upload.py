"""Presigned-URL upload sink tests (PresignedUrlFileUploader.java parity:
small files buffer, large files stream in 5 MiB-style chunks in ONE
request, retry with backoff on failed responses)."""

from __future__ import annotations

import pytest

from lakeview_spark.sinks import (
    FileUploadError,
    upload_file_to_presigned_url,
)


class FakePut:
    def __init__(self, statuses):
        self.statuses = list(statuses)
        self.requests = []  # (url, chunk_sizes, content_length)

    def __call__(self, url, body_iter, content_length):
        chunks = [len(c) for c in body_iter]
        self.requests.append((url, chunks, content_length))
        return self.statuses.pop(0)


def _file(tmp_path, n_bytes):
    p = tmp_path / "payload.bin"
    p.write_bytes(b"x" * n_bytes)
    return str(p)


def test_small_file_single_buffered_body(tmp_path):
    put = FakePut([200])
    src = _file(tmp_path, 100)
    sent = upload_file_to_presigned_url(put, "https://u", src, chunk_bytes=1024)
    assert sent == 100
    url, chunks, length = put.requests[0]
    assert (url, chunks, length) == ("https://u", [100], 100)


def test_large_file_streams_chunked_single_request(tmp_path):
    put = FakePut([200])
    src = _file(tmp_path, 2500)
    upload_file_to_presigned_url(put, "https://u", src, chunk_bytes=1000)
    (_, chunks, length), = put.requests  # exactly ONE request
    assert chunks == [1000, 1000, 500]
    assert length == 2500


def test_failed_status_retries_then_succeeds(tmp_path):
    put = FakePut([500, 503, 200])
    sleeps = []
    src = _file(tmp_path, 10)
    upload_file_to_presigned_url(
        put, "https://u", src, chunk_bytes=1024, sleep=sleeps.append
    )
    assert len(put.requests) == 3
    assert sleeps == [0.1, 0.2]


def test_retries_exhausted_raises(tmp_path):
    put = FakePut([500] * 4)
    src = _file(tmp_path, 10)
    with pytest.raises(FileUploadError):
        upload_file_to_presigned_url(
            put, "https://u", src, chunk_bytes=1024, max_retries=3, sleep=lambda s: None
        )
    assert len(put.requests) == 4


def test_transport_errors_retry_in_same_backoff_loop(tmp_path):
    src = tmp_path / "f.bin"
    src.write_bytes(b"x" * 10)
    calls = []

    def flaky_put(url, body, length):
        calls.append(1)
        if len(calls) < 3:
            raise ConnectionResetError("peer reset")  # OSError subclass
        return 200

    sent = upload_file_to_presigned_url(
        flaky_put, "https://sink/presigned", str(src), sleep=lambda _s: None
    )
    assert sent == 10 and len(calls) == 3


def test_non_transport_errors_propagate_immediately(tmp_path):
    src = tmp_path / "f.bin"
    src.write_bytes(b"x")
    calls = []

    def broken_put(url, body, length):
        calls.append(1)
        raise ValueError("caller bug, not transport")

    with pytest.raises(ValueError):
        upload_file_to_presigned_url(
            broken_put, "https://sink/p", str(src), sleep=lambda _s: None
        )
    assert len(calls) == 1  # no retry outside the retryable tuple

"""Ingest-source resilience tests: the bounded-retry fetch policy
(reference @task(retries=3), ingest_web_to_gcs.py:67) proven offline by
injecting transient failures, plus the in-memory zip+XML parse path."""

from __future__ import annotations

import contextlib
import io
import zipfile

import pytest

from chess_ratings_spark.sources import http_xml


class _FlakyOpener:
    """Injectable urlopen stand-in: fails with URLError-ish exceptions
    for the first `fail_n` calls, then serves `payload`."""

    def __init__(self, fail_n: int, payload: bytes = b"ok"):
        self.fail_n = fail_n
        self.payload = payload
        self.calls = 0

    @contextlib.contextmanager
    def __call__(self, url, timeout=None):
        self.calls += 1
        if self.calls <= self.fail_n:
            raise OSError(f"transient failure #{self.calls}")

        class _Resp:
            def read(_self) -> bytes:
                return self.payload

        yield _Resp()


def test_fetch_recovers_after_transient_failures():
    opener = _FlakyOpener(fail_n=2, payload=b"zip-bytes")
    out = http_xml.fetch("http://x/y.zip", retries=3, backoff_s=0.0, _urlopen=opener)
    assert out == b"zip-bytes"
    assert opener.calls == 3  # two failures + one success


def test_fetch_surfaces_after_bounded_attempts():
    opener = _FlakyOpener(fail_n=99)
    with pytest.raises(RuntimeError, match="after 4 attempts"):
        http_xml.fetch("http://x/y.zip", retries=3, backoff_s=0.0, _urlopen=opener)
    assert opener.calls == 4  # initial + 3 retries, then surface


def test_zip_xml_roundtrip_parses():
    xml = (
        b"<playerslist>"
        b"<player><fideid>1</fideid><name>A</name><rating>2500</rating></player>"
        b"<player><fideid>2</fideid><name>B</name><rating>2400</rating></player>"
        b"</playerslist>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("ratings.xml", xml)
    pdf = http_xml.parse_ratings_xml(http_xml.unzip_single(buf.getvalue()))
    assert list(pdf["fideid"]) == [1, 2]
    assert list(pdf["rating"]) == [2500, 2400]

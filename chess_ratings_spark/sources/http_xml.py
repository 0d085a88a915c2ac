"""The reference's web source: zipped FIDE XML over HTTP
(ingest_web_to_gcs.py:61-95), as a Spark ingestion path.

Spark has no HTTP/zip/XML-combo source; the idiomatic shape is a thin
fetch stage that stages raw bytes, then an Arrow-backed
``spark.createDataFrame`` for the (single-digit-MB/month) parsed
records. At real scale the fetch parallelizes as a parameter-DataFrame
``mapInPandas`` over (format, year, month) work items so each task pulls
and parses its own month — the driver never holds more than its own
partition. Both stages are offline-testable: `parse_ratings_xml` takes
bytes, and `fetch` is the only network touchpoint (bounded retries,
mirroring the reference's @task(retries=3) at ingest_web_to_gcs.py:67).
"""

from __future__ import annotations

import io
import time
import zipfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

#: Raw FIDE XML schema (pre-rename; FIXTURES.md B). Declared, not
#: inferred — schema-on-read inference over HTTP bytes is not
#: reproducible across months (the reference's pandas inference is the
#: source of its foa_title drift).
RAW_SCHEMA = (
    "fideid bigint, name string, country string, sex string, title string,"
    " w_title string, o_title string, foa_title string, rating bigint,"
    " games bigint, k bigint, birthday bigint, flag string"
)


def unzip_single(blob: bytes) -> bytes:
    """In-memory unzip of a one-file archive (ingest_web_to_gcs.py:72-73)."""
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        return zf.read(zf.namelist()[0])


def parse_ratings_xml(xml_bytes: bytes) -> pd.DataFrame:
    """XML records -> pandas (ingest_web_to_gcs.py:61-64's pd.read_xml).

    etree parser: lxml is not in this environment and the FIDE files are
    flat element lists that etree handles fine.
    """
    return pd.read_xml(io.BytesIO(xml_bytes), parser="etree")


def to_spark(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    """Arrow-path conversion with the declared raw schema; absent columns
    (e.g. foa_title pre-2017) are normalized later by
    ingest.normalize_schema, so select only what's present here."""
    from pyspark.sql import types as T

    full = T._parse_datatype_string(RAW_SCHEMA)
    fields = [f for f in full.fields if f.name in pdf.columns]
    pdf = pdf[[f.name for f in fields]]
    return spark.createDataFrame(pdf, schema=T.StructType(fields))


def fetch(url: str, retries: int = 3, backoff_s: float = 1.0, _urlopen=None) -> bytes:
    """HTTP GET with bounded retries — the only network touchpoint,
    mirroring the reference's @task(retries=3) (ingest_web_to_gcs.py:67):
    an initial attempt plus `retries` retries with exponential backoff,
    then the last error surfaces.

    ``_urlopen`` is an injection seam so the retry policy is provable
    offline (tests inject transient failures); production callers leave
    it defaulted to urllib.
    """
    if _urlopen is None:  # pragma: no cover - network path
        import urllib.request

        _urlopen = urllib.request.urlopen

    last: Exception | None = None
    for attempt in range(retries + 1):
        try:
            with _urlopen(url, timeout=60) as resp:  # noqa: S310
                return resp.read()
        except Exception as exc:
            last = exc
            if attempt < retries:
                time.sleep(backoff_s * (2**attempt))
    raise RuntimeError(f"fetch failed after {retries + 1} attempts: {url}") from last


def ingest_month_from_bytes(
    spark: SparkSession, zipped: bytes, year: int, month: int, game_format: str
) -> DataFrame:
    """bytes → unzip → parse → DataFrame → full preprocess. The offline
    end of ingest_single_month_web_to_gcs (ingest_web_to_gcs.py:177-201),
    minus the network fetch."""
    from chess_ratings_spark import ingest

    pdf = parse_ratings_xml(unzip_single(zipped))
    return ingest.preprocess(to_spark(spark, pdf), year, month, game_format)

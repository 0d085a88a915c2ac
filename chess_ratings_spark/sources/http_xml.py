"""The reference's web source: zipped FIDE XML over HTTP
(ingest_web_to_gcs.py:61-95), as a Spark ingestion path.

Spark has no HTTP/zip/XML-combo source, so this module registers one:
``FideWebDataSource``, a Spark 4 Python DataSource
(`spark.dataSource.register`) that fans a (format, year, month) grid
out as one input partition per month — each task fetches, unzips and
parses its own single-digit-MB file and emits one Arrow batch, so a
3-format × 130-month backfill is 390 independent executor tasks and
the driver never holds a row. The pieces are offline-testable:
`parse_ratings_xml` takes bytes, the reader takes a ``stub_zip_b64``
seam, and `fetch` is the only network touchpoint (bounded retries,
mirroring the reference's @task(retries=3) at ingest_web_to_gcs.py:67).
``ingest_month_from_bytes`` remains the single-month driver-side path
for callers that already hold the bytes.
"""

from __future__ import annotations

import io
import time
import zipfile

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

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


_MONTH_CODES = (
    "jan feb mar apr may jun jul aug sep oct nov dec".split()
)


def month_url(game_format: str, year: int, month: int) -> str:
    """Plain-Python twin of functions/scalar.py::ratings_url — the
    per-(format,period) download URL (ingest_web_to_gcs.py:40-52).
    Parity with the Column version is pinned by test."""
    return (
        "https://ratings.fide.com/download/"
        f"{game_format}_{_MONTH_CODES[month - 1]}{year % 100:02d}frl_xml.zip"
    )


class _MonthPartition(InputPartition):
    """One fetch work item: (game_format, year, month)."""

    def __init__(self, game_format: str, year: int, month: int):
        self.game_format = game_format
        self.year = year
        self.month = month


#: Source schema: raw FIDE columns plus the per-partition period stamp.
SOURCE_SCHEMA = (
    RAW_SCHEMA + ", period_year int, period_month int, game_format string"
)


class FideWebReader(DataSourceReader):
    """Partition-native reader: one input partition per (format, month),
    so a 3-format × 130-month backfill fans out as 390 independent
    fetch+parse tasks with no driver bottleneck — each task pulls only
    its own month (single-digit MB) and emits one Arrow batch."""

    def __init__(self, options):
        self.formats = [
            f.strip() for f in options.get("formats", "standard").split(",") if f.strip()
        ]
        months = options.get("months", "")
        self.months: list[tuple[int, int]] = []
        for tok in months.split(","):
            tok = tok.strip()
            if tok:
                y, m = tok.split("-")
                self.months.append((int(y), int(m)))
        if not self.months:
            raise ValueError("fide_web_xml: option 'months' (YYYY-MM[,..]) is required")
        self.stub_zip_b64 = options.get("stub_zip_b64")
        self.retries = int(options.get("retries", "3"))

    def partitions(self):
        return [
            _MonthPartition(f, y, m) for f in self.formats for (y, m) in self.months
        ]

    def read(self, partition):
        import base64

        import pyarrow as pa

        if self.stub_zip_b64 is not None:
            blob = base64.b64decode(self.stub_zip_b64)
        else:  # pragma: no cover - network path
            blob = fetch(
                month_url(partition.game_format, partition.year, partition.month),
                retries=self.retries,
            )
        pdf = parse_ratings_xml(unzip_single(blob))
        n = len(pdf)
        arrays, names = [], []
        for name, typ in _arrow_fields():
            names.append(name)
            if name == "period_year":
                arrays.append(pa.array([partition.year] * n, type=typ))
            elif name == "period_month":
                arrays.append(pa.array([partition.month] * n, type=typ))
            elif name == "game_format":
                arrays.append(pa.array([partition.game_format] * n, type=typ))
            elif name in pdf.columns:
                arrays.append(pa.Array.from_pandas(pdf[name], type=typ))
            else:
                # months before a column existed (e.g. foa_title pre-2017)
                arrays.append(pa.nulls(n, type=typ))
        yield pa.RecordBatch.from_arrays(arrays, names=names)


def _arrow_fields() -> list[tuple[str, "object"]]:
    """Arrow twin of SOURCE_SCHEMA, spelled out literally: executors
    have no SparkContext, so the DDL string can't be parsed there
    (types._parse_datatype_string needs a live context). Parity with
    SOURCE_SCHEMA is pinned by test."""
    import pyarrow as pa

    s, i64, i32 = pa.string(), pa.int64(), pa.int32()
    return [
        ("fideid", i64), ("name", s), ("country", s), ("sex", s),
        ("title", s), ("w_title", s), ("o_title", s), ("foa_title", s),
        ("rating", i64), ("games", i64), ("k", i64), ("birthday", i64),
        ("flag", s),
        ("period_year", i32), ("period_month", i32), ("game_format", s),
    ]


class FideWebDataSource(DataSource):
    """Spark 4 Python DataSource for the FIDE zipped-XML web dump —
    the partition-native ingestion SURVEY §2.1 plans for
    ingest_web_to_gcs.py:61-95.

    Usage::

        spark.dataSource.register(FideWebDataSource)
        (spark.read.format("fide_web_xml")
              .option("formats", "standard,rapid,blitz")
              .option("months", "2024-06,2024-07")
              .load())

    Options: ``formats`` (comma list), ``months`` (YYYY-MM comma list),
    ``retries`` (per-fetch retry budget, default 3), and the offline
    seam ``stub_zip_b64`` — base64 zip bytes substituted for every
    fetch so the whole plan (partitioning, parse, Arrow emit, schema)
    is provable without egress; only ``fetch`` itself stays
    network-only (its retry policy is separately tested through the
    ``_urlopen`` seam).
    """

    @classmethod
    def name(cls) -> str:
        return "fide_web_xml"

    def schema(self) -> str:
        return SOURCE_SCHEMA

    def reader(self, schema):
        return FideWebReader(self.options)


def register_web_source(spark: SparkSession) -> None:
    """Idempotent registration of the fide_web_xml source."""
    spark.dataSource.register(FideWebDataSource)


def ingest_month_from_bytes(
    spark: SparkSession, zipped: bytes, year: int, month: int, game_format: str
) -> DataFrame:
    """bytes → unzip → parse → DataFrame → full preprocess. The offline
    end of ingest_single_month_web_to_gcs (ingest_web_to_gcs.py:177-201),
    minus the network fetch."""
    from chess_ratings_spark import ingest

    pdf = parse_ratings_xml(unzip_single(zipped))
    return ingest.preprocess(to_spark(spark, pdf), year, month, game_format)

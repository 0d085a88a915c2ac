"""Declarative data-model API — the reference's patito model surface
(chess_ratings_data_model.py:9-31: typed fields with ``unique=``,
``regex=``, ``ge=``/``le=`` bounds and Optional-ness) re-expressed for
Spark DataFrames.

A model is a class with ``Field`` attributes declared in order:

    class FideRatings(DataModel):
        fide_id = Field("bigint", nullable=False, unique=True)
        fide_federation = Field("string", regex=r"(?i)[A-Z]{3}")
        period_month = Field("int", nullable=False, ge=1, le=12)

and compiles — once, at class-definition time — into three reusable
artifacts, so "declare once, enforce everywhere" actually holds:

* ``violation_predicates()`` → the one-pass violations aggregation
  (``operators/validate.violations_report``): constraint count never
  multiplies scan count, the only shape that works at 100 TB.
* ``conform(df)`` → a pure projection that selects the declared
  columns in declaration order, casts each to its declared dtype, and
  backfills declared-but-absent nullable columns as typed NULLs (the
  reference's schema-normalization step, ingest_web_to_gcs.py:26-37).
  No shuffle — Catalyst fuses it into the enclosing scan-project stage.
* ``check_unique(df)`` → two-scalar count vs approx-free countDistinct
  aggregate per ``unique=True`` field (patito's ``unique=`` check is a
  whole-column property, so it cannot live in the row-wise pass).

Checks mirror patito's semantics: ``regex`` FULLMATCHES (anchored
here), bounds and domain checks skip NULLs (a NULL is a missing value,
not a violation — ``nullable=False`` is the check that catches it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class Field:
    """One declared model column: Spark dtype + row/column constraints.

    ``check_prefix`` overrides the constraint-name stem (default: the
    field name), e.g. fide_federation's pattern check is named
    ``federation_pattern`` for continuity with the published report.
    ``backfill=True`` marks a column the RAW source may lack entirely
    (foa_title before ~2017) — ``conform`` adds it as a typed NULL.
    """

    __slots__ = (
        "dtype",
        "nullable",
        "unique",
        "regex",
        "isin",
        "ge",
        "le",
        "backfill",
        "check_prefix",
        "name",
    )

    def __init__(
        self,
        dtype: str,
        *,
        nullable: bool = True,
        unique: bool = False,
        regex: str | None = None,
        isin: tuple | list | None = None,
        ge=None,
        le=None,
        backfill: bool = False,
        check_prefix: str | None = None,
    ) -> None:
        self.dtype = dtype
        self.nullable = nullable
        self.unique = unique
        self.regex = regex
        self.isin = tuple(isin) if isin is not None else None
        self.ge = ge
        self.le = le
        self.backfill = backfill
        self.check_prefix = check_prefix
        self.name: str | None = None  # set by DataModel.__init_subclass__

    def violation_checks(self) -> list[tuple[str, Column]]:
        """(constraint_name, TRUE-when-violated Column) in check order."""
        assert self.name is not None, "Field not bound to a DataModel"
        c = F.col(self.name)
        stem = self.check_prefix or self.name
        checks: list[tuple[str, Column]] = []
        if not self.nullable:
            checks.append((f"{stem}_not_null", c.isNull()))
        if self.regex is not None:
            # patito fullmatches; (?:...) keeps inline flags scoped
            checks.append(
                (f"{stem}_pattern", c.isNotNull() & ~c.rlike(f"^(?:{self.regex})$"))
            )
        if self.isin is not None:
            checks.append((f"{stem}_domain", c.isNotNull() & ~c.isin(*self.isin)))
        if self.ge is not None or self.le is not None:
            in_range = F.lit(True)
            if self.ge is not None:
                in_range = in_range & (c >= F.lit(self.ge))
            if self.le is not None:
                in_range = in_range & (c <= F.lit(self.le))
            checks.append((f"{stem}_range", c.isNotNull() & ~in_range))
        return checks


class DataModel:
    """Base class; subclass with ``Field`` class attributes."""

    _fields: dict[str, Field]

    def __init_subclass__(cls, **kwargs) -> None:
        super().__init_subclass__(**kwargs)
        cls._fields = {}
        # walk the MRO root-first so subclasses may extend/override
        for klass in reversed(cls.__mro__):
            for name, val in vars(klass).items():
                if isinstance(val, Field):
                    val.name = name
                    cls._fields[name] = val

    @classmethod
    def fields(cls) -> dict[str, Field]:
        return dict(cls._fields)

    @classmethod
    def ddl(cls) -> str:
        """Declared schema as a DDL string (``name type, ...``)."""
        return ", ".join(f"{n} {f.dtype}" for n, f in cls._fields.items())

    @classmethod
    def violation_predicates(cls) -> dict[str, Column]:
        """All row-wise constraints, declaration-then-check order."""
        out: dict[str, Column] = {}
        for f in cls._fields.values():
            for name, pred in f.violation_checks():
                if name in out:
                    raise ValueError(f"duplicate constraint name: {name}")
                out[name] = pred
        return out

    @classmethod
    def validate(cls, df: DataFrame) -> DataFrame:
        """(constraint, violations) report — ONE aggregation pass."""
        from chess_ratings_spark.operators import validate as v

        return v.violations_report(df, cls.violation_predicates())

    @classmethod
    def conform(cls, df: DataFrame, extra: tuple[str, ...] = ()) -> DataFrame:
        """Project to the declared schema: backfill absent ``backfill``
        columns as typed NULLs, cast every declared column to its
        declared dtype, order columns as declared (then ``extra``
        passthroughs). Raises on a missing non-backfill column — a
        silent NULL there would hide a broken upstream rename."""
        present = set(df.columns)
        missing = [
            n
            for n, f in cls._fields.items()
            if n not in present and not f.backfill
        ]
        if missing:
            raise ValueError(f"conform: missing required columns {missing}")
        cols = [
            (
                F.col(n).cast(f.dtype) if n in present else F.lit(None).cast(f.dtype)
            ).alias(n)
            for n, f in cls._fields.items()
        ]
        return df.select(*cols, *[F.col(e) for e in extra])

    @classmethod
    def unique_keys(cls) -> list[str]:
        return [n for n, f in cls._fields.items() if f.unique]

    @classmethod
    def check_unique(cls, df: DataFrame) -> DataFrame:
        """One (key, n_rows, n_keys, is_unique) row per unique field."""
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for k in cls.unique_keys():
            aggs.append(F.countDistinct(k).alias(f"n_{k}"))
        counts = df.agg(*aggs)
        reports = F.array(
            *[
                F.struct(
                    F.lit(k).alias("key"),
                    F.col("n_rows").alias("n_rows"),
                    F.col(f"n_{k}").alias("n_keys"),
                    (F.col("n_rows") == F.col(f"n_{k}")).alias("is_unique"),
                )
                for k in cls.unique_keys()
            ]
        )
        return counts.select(F.explode(reports).alias("r")).select(
            "r.key", "r.n_rows", "r.n_keys", "r.is_unique"
        )

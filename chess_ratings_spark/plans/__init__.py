"""Driver-facing query definitions.

Importing this package populates ``chess_ratings_spark.registry.REGISTRY``
with every implemented SURVEY.md §2 operator ID. ``__spark_entry__``
exposes the registry to the driver.
"""

from chess_ratings_spark.plans import (  # noqa: F401
    analytics,
    corpus,
    depth,
    extras,
    formats,
    geo,
    lakehouse,
    llm_tier,
    relational,
    scale,
    spark4,
    streaming,
    tier_r,
    timeseries,
    tpch,
    training,
    warehouse,
)

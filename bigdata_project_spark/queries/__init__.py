"""Query modules — importing this package populates the registry."""

from bigdata_project_spark.queries import (  # noqa: F401
    advanced,
    audit_ext,
    analytics_ext,
    aggregates,
    collections_ext,
    enrich_ext,
    events,
    events_ext,
    funnel,
    generators,
    joins,
    robustness,
    scalars,
    scale_ext,
    setops_sorts,
    subqueries,
    tpch_full,
    tpch_more,
    vietnamese,
    windows,
)

"""Query modules — importing this package populates the registry."""

from bigdata_project_spark.queries import aggregates  # noqa: F401

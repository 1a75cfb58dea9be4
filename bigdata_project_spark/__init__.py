"""bigdata_project_spark — a PySpark-native analytics engine.

Re-expresses the capabilities of the reference repo
(jansulubituu/BIGDATA_PROJECT — a crawl-ETL + declared Spark
Structured Streaming analytics stack, see SURVEY.md) as an idiomatic
Spark DataFrame/SQL engine, extended with LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis) and
designed for 100 TB scale: declarative plans for Catalyst, broadcast
joins for dims, AQE on, Arrow-vectorized UDFs only where built-ins
can't express the semantics.
"""

__version__ = "0.1.0"

from bigdata_project_spark.session import get_spark  # noqa: F401

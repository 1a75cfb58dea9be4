"""The reference's domain model: property-listing records
(jansulubituu/BIGDATA_PROJECT CrawlData.py). Batch ingest (JSON/CSV),
the silver transform, and the raw-API normalization, Spark-first."""

from bigdata_project_spark.listings.ingest import (  # noqa: F401
    extract_from_api,
    read_listings_csv,
    read_listings_json,
    silver_transform,
)
from bigdata_project_spark.listings.schema import LISTING_SCHEMA  # noqa: F401

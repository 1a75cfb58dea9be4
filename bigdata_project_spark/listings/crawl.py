"""Ingest edge: the crawl scan operators (SURVEY.md §2.1 [code] rows).

Re-expresses the reference's two network operators —
`fetch_house_ids` (paginated listing scan, CrawlData.py:10-42) and
`fetch_house_detail` (point-lookup detail fetch, CrawlData.py:45-57)
— with the same paging/stop/dedup/politeness semantics, plus the
landing-zone bridge into Spark.

Design for scale: the crawl loop is driver-side by nature (politeness
rate-limiting makes it sequential), but it only materializes ids and
raw payload batches; normalization and everything after happens
distributed (`spark.createDataFrame` -> extract/silver/lake). For
parallel re-crawls of known id sets, `fetch_details_distributed`
fans the point-lookups out via mapInPandas over an id DataFrame.

The HTTP transport is injectable (`fetcher`) so the semantics are
unit-testable without a network; the default transport uses
`requests` if available.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession

Fetcher = Callable[[str], dict | None]

LIST_URL = "https://gateway.chotot.com/v1/public/ad-listing?region_v2={region}&cg={category}&o={offset}&limit={limit}&st=s,k&key_param_included=true"
DETAIL_URL = "https://gateway.chotot.com/v1/public/ad-listing/{ad_id}"
PAGE_SIZE = 20  # CrawlData.py:15
PAGE_SLEEP_S = 0.3  # CrawlData.py:39
DETAIL_SLEEP_S = 0.2  # CrawlData.py:136


def _default_fetcher(url: str) -> dict | None:
    try:
        import requests  # optional dependency; absent in this container

        resp = requests.get(url, timeout=10)
        if resp.status_code != 200:  # non-200 page dropped (CrawlData.py:24-26)
            return None
        return resp.json()
    except Exception:  # any transport error -> None (CrawlData.py:56-57)
        return None


def fetch_house_ids(
    limit_ids: int = 300,
    region: int = 12000,
    category: int = 1000,
    fetcher: Fetcher | None = None,
    sleep_s: float = PAGE_SLEEP_S,
) -> list[int]:
    """Paginated listing scan accumulating distinct list_ids.

    Semantics mirror CrawlData.py:10-42: pages of 20, skip ads without
    list_id (:33-34), set-dedup (:12,34), stop on empty page (:29-30)
    or once the limit is reached *after* a whole page is added
    (:36-37 — may overshoot, like the reference's 317 > 300).
    """
    fetcher = fetcher or _default_fetcher
    ids: set[int] = set()
    ordered: list[int] = []
    offset = 0
    while True:
        url = LIST_URL.format(region=region, category=category, offset=offset, limit=PAGE_SIZE)
        payload = fetcher(url)
        ads = (payload or {}).get("ads", [])
        if not ads:
            break
        for ad in ads:
            if "list_id" in ad and ad["list_id"] not in ids:
                ids.add(ad["list_id"])
                ordered.append(ad["list_id"])
        if len(ids) >= limit_ids:
            break
        offset += PAGE_SIZE
        if sleep_s:
            time.sleep(sleep_s)
    return ordered


def fetch_house_detail(ad_id: int, fetcher: Fetcher | None = None) -> dict | None:
    """Point-lookup detail fetch; errors/404 -> None (CrawlData.py:45-57)."""
    fetcher = fetcher or _default_fetcher
    return fetcher(DETAIL_URL.format(ad_id=ad_id))


def crawl_to_dataframe(
    spark: SparkSession,
    limit_rows: int = 300,
    fetcher: Fetcher | None = None,
    sleep_s: float = 0.0,
) -> DataFrame:
    """EP1 equivalent (CrawlData.py:103-146): scan ids -> fetch details
    -> normalize distributed. Returns the flat listing DataFrame; pair
    with silver_transform + write_lake for the full pipeline."""
    from bigdata_project_spark.listings.ingest import extract_from_api
    from bigdata_project_spark.listings.schema import RAW_AD_SCHEMA

    ids = fetch_house_ids(limit_ids=limit_rows, fetcher=fetcher, sleep_s=sleep_s)
    raws = []
    for ad_id in ids:
        raw = fetch_house_detail(ad_id, fetcher=fetcher)
        if raw is not None and "ad" in raw:
            raws.append(raw)
        if sleep_s:
            time.sleep(sleep_s)
    raw_df = spark.createDataFrame(raws, RAW_AD_SCHEMA) if raws else spark.createDataFrame([], RAW_AD_SCHEMA)
    return extract_from_api(raw_df)


def fetch_details_distributed(ids_df: DataFrame, fetcher_factory: Callable[[], Fetcher]) -> DataFrame:
    """Parallel point-lookup fan-out: mapInPandas over an id DataFrame
    (SURVEY §2.1 'per-id fan-out'). Each partition builds its own
    transport via fetcher_factory (sockets aren't picklable); output
    is the raw JSON payload per id for downstream from_json parsing."""
    import pandas as pd

    def fetch_batch(batches: Iterable[pd.DataFrame]):
        import json

        fetcher = fetcher_factory()
        for pdf in batches:
            payloads = [
                json.dumps(p) if (p := fetcher(DETAIL_URL.format(ad_id=int(i)))) is not None else None
                for i in pdf["id"]
            ]
            yield pd.DataFrame({"id": pdf["id"], "payload": payloads})

    return ids_df.mapInPandas(fetch_batch, "id long, payload string")

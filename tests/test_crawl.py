"""Unit tests for the crawl-scan operators with an injected fake
transport (SURVEY.md §2.1 [code] rows: paging, stop conditions,
set-dedup, error channel)."""

from __future__ import annotations

import re

from bigdata_project_spark.listings.crawl import (
    crawl_to_dataframe,
    fetch_details_distributed,
    fetch_house_detail,
    fetch_house_ids,
)


def make_fake_api(n_ads: int):
    """Fake chotot API: n_ads sequential ads; detail pages for each."""

    def fetcher(url: str):
        if "ad-listing?" in url or ("o=" in url and "limit=" in url):
            offset = int(re.search(r"o=(\d+)", url).group(1))
            ads = [{"list_id": 100 + i} for i in range(offset, min(offset + 20, n_ads))]
            # one malformed ad per page exercises the list_id filter
            if ads:
                ads.append({"not_list_id": 1})
            return {"ads": ads}
        ad_id = int(url.rstrip("/").split("/")[-1])
        if ad_id % 13 == 0:  # simulated 404s
            return None
        return {
            "ad": {
                "list_id": ad_id,
                "subject": f"t{ad_id}",
                "body": "b",
                "price": 1000 * ad_id,
                "area": 50,
                "region_name": "R",
                "area_name": "D",
                "ward_name": "W",
                "street_name": "S",
                "latitude": 21.0,
                "longitude": 105.8,
                "property_type": None,
                "category": 1010,
                "list_time": 1765504156000,
                "images": ["x"] * (ad_id % 3),
            }
        }

    return fetcher


def test_paging_and_overshoot():
    # limit checked after whole-page adds -> may overshoot (CrawlData.py:36-37)
    ids = fetch_house_ids(limit_ids=30, fetcher=make_fake_api(100), sleep_s=0)
    assert len(ids) == 40  # two pages of 20
    assert ids == [100 + i for i in range(40)]


def test_stop_on_empty_page():
    ids = fetch_house_ids(limit_ids=300, fetcher=make_fake_api(25), sleep_s=0)
    assert len(ids) == 25  # exhausted before limit


def test_detail_error_channel():
    f = make_fake_api(10)
    assert fetch_house_detail(105, fetcher=f)["ad"]["list_id"] == 105
    assert fetch_house_detail(104, fetcher=f) is None  # 13*8


def test_crawl_to_dataframe(spark):
    df = crawl_to_dataframe(spark, limit_rows=25, fetcher=make_fake_api(25), sleep_s=0)
    rows = {r.id: r for r in df.collect()}
    assert len(rows) == 23  # 2 of 25 ids hit the simulated 404 (104+13k)
    r = rows[105]
    assert r.price_per_m2 == (1000 * 105) / 50 and r.images == 105 % 3


def test_distributed_detail_fanout(spark):
    # the factory closure ships to Python workers: define it locally so
    # cloudpickle serializes by value (test modules aren't importable
    # from workers)
    def local_factory():
        def fetcher(url: str):
            ad_id = int(url.rstrip("/").split("/")[-1])
            return None if ad_id % 13 == 0 else {"ad": {"list_id": ad_id}}

        return fetcher

    ids_df = spark.createDataFrame([(100 + i,) for i in range(20)], "id long")
    out = fetch_details_distributed(ids_df, local_factory)
    rows = out.collect()
    assert len(rows) == 20
    ok = [r for r in rows if r.payload is not None]
    assert len(ok) == 18  # 104 and 117 fail (13*8, 13*9)

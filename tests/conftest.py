from __future__ import annotations

import datetime as dt

import pytest

from mbgspark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("mbgspark-tests", master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def tweets_raw(spark):
    """FIXTURES.md §1-shaped inline fixture: dup ids, dup texts, short texts,
    URLs/mentions/hashtags/city names, late data."""
    ts = dt.datetime
    rows = [
        # (_id, text, created_at, scraped_at, tweet_url, handle, name, loc, r, rt, l)
        ("1", "Program MBG bagus di Jakarta Selatan! http://x.co/a #MBG",
         ts(2025, 1, 1, 10), ts(2025, 1, 1, 11), "https://x.com/u/status/1", "u1", "Andi", None, 1, 2, 3),
        ("2", "makanan gratis gagal total di sby @pemkot",
         ts(2025, 1, 1, 12), ts(2025, 1, 1, 13), "https://x.com/u/status/2", "u2", "Budi", None, 0, 0, 1),
        ("2", "makanan gratis gagal total di sby @pemkot",  # dup _id (D1)
         ts(2025, 1, 1, 12), ts(2025, 1, 1, 14), "https://x.com/u/status/2", "u2", "Budi", None, 0, 0, 2),
        ("3", "MBG   berhasil,   anak sehat\n\ndi Bandung",
         ts(2025, 1, 2, 9), ts(2025, 1, 2, 10), "https://x.com/u/status/3", "u3", "Citra Semarang", None, 5, 6, 7),
        ("4", "mbg",  # too short (F3)
         ts(2025, 1, 2, 10), ts(2025, 1, 2, 11), "https://x.com/u/status/4", "u4", "Dewi", None, 0, 0, 0),
        ("5", "Program MBG bagus di Jakarta Selatan! http://x.co/a #MBG",  # dup text (D2)
         ts(2025, 1, 3, 8), ts(2025, 1, 3, 9), "https://x.com/u/status/5", "u5", "Eko", None, 1, 1, 1),
        ("6", "netral saja tentang program ini",
         ts(2025, 1, 1, 23), ts(2025, 1, 3, 9), "https://x.com/u/status/6", "u6", "Fajar", None, 0, 0, 0),  # late
    ]
    from mbgspark.schema import TWEET_RAW_SCHEMA

    return spark.createDataFrame(rows, TWEET_RAW_SCHEMA)

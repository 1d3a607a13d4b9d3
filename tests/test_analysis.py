"""Market-analysis operators: district price medians/ratings (J5,
database.go:1326-1417 + telegram.go:64-130) and the metropolitan-area
config tables (J4/A6/J8, database.go:918-1165)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from fundamental_spark.operators.analysis import (
    district_price_medians,
    init_metro_tables,
    metro_city_expansion,
    metro_rollup,
    update_metro_centers,
    with_district_analysis,
)
from fundamental_spark.tableformat import Warehouse

AS_OF = "2024-06-01"


@pytest.fixture(scope="module")
def props(spark):
    d = datetime.date
    rows = [
        # district 1011: 3 active (sqm 5000, 6000, 7000 -> median 6000),
        # 2 sold in window (4000, 5000 -> median 4500), 1 sold too old
        ("u1", "1011 AB", 500_000, 100, "active", None),
        ("u2", "1011 AB", 600_000, 100, "active", None),
        ("u3", "1011 AB", 700_000, 100, "active", None),
        ("u4", "1011 AB", 400_000, 100, "sold", d(2024, 1, 15)),
        ("u5", "1011 AB", 500_000, 100, "sold", d(2023, 9, 1)),
        ("u6", "1011 AB", 900_000, 100, "sold", d(2022, 1, 1)),   # outside 12mo
        # district 1012: active only; one row fails quality (area 5)
        ("u7", "1012 CD", 300_000, 100, "active", None),
        ("u8", "1012 CD", 400_000, 100, "active", None),
        ("u9", "1012 CD", 300_000, 5, "active", None),            # quality reject
        # district 1013: nothing passes quality
        ("u10", "1013 EF", 10_000, 100, "active", None),          # price too low
    ]
    return spark.createDataFrame(
        rows,
        "url string, postal_code string, price bigint, living_area int, "
        "status string, selling_date date",
    )


def test_district_medians_exact(props):
    med = {m["district"]: m for m in district_price_medians(props, AS_OF).collect()}
    m = med["1011"]
    assert m["active_median"] == 6000.0 and m["active_count"] == 3
    assert m["sold_median"] == 4500.0 and m["sold_count"] == 2  # even count: avg of middles
    m2 = med["1012"]
    assert m2["active_median"] == 3500.0 and m2["active_count"] == 2
    assert m2["sold_median"] == 0.0 and m2["sold_count"] == 0   # COALESCE(...,0)
    assert "1013" not in med  # nothing survives quality


def test_listing_analysis_ratings(spark, props):
    med = district_price_medians(props, AS_OF)
    listings = spark.createDataFrame(
        [
            ("n1", "1011 XX", 450_000, 100),   # 4500/6000 = 0.75 -> GREAT
            ("n2", "1011 XX", 600_000, 100),   # 1.0 -> NORMAL; vs sold 6000/4500=1.33 -> HORRIBLE
            ("n3", "1011 XX", 780_000, 100),   # 1.3 -> HORRIBLE
            ("n4", "1013 YY", 500_000, 100),   # no medians -> NULL ratings
        ],
        "url string, postal_code string, price bigint, living_area int",
    )
    out = {r["url"]: r for r in with_district_analysis(listings, med).collect()}
    assert out["n1"]["active_rating"] == "GREAT"
    assert out["n2"]["active_rating"] == "NORMAL"
    assert out["n2"]["sold_rating"] == "HORRIBLE"
    assert out["n3"]["active_rating"] == "HORRIBLE"
    assert out["n4"]["active_rating"] is None and out["n4"]["sold_rating"] is None
    assert out["n1"]["price_per_sqm"] == 4500.0


def test_metro_tables_lifecycle(spark, tmp_path):
    wh = Warehouse(spark, str(tmp_path / "metro"))
    init_metro_tables(
        wh,
        areas=[(1, "Randstad", None, None, 9), (2, "Brabant", None, None, 10)],
        cities=[
            (1, "amsterdam", 52.37, 4.89),
            (1, "utrecht", 52.09, 5.12),
            (1, "leiden", None, None),        # null coords excluded from center
            (2, "eindhoven", 51.44, 5.47),
        ],
    )
    roll = {r["name"]: r for r in metro_rollup(
        wh.read("metro_areas"), wh.read("metro_cities")
    ).collect()}
    assert roll["Randstad"]["n_cities"] == 3
    assert roll["Randstad"]["cities"] == "amsterdam,leiden,utrecht"  # sorted concat

    update_metro_centers(wh)
    areas = {a["id"]: a for a in wh.read("metro_areas").collect()}
    assert abs(areas[1]["center_lat"] - (52.37 + 52.09) / 2) < 1e-9
    assert abs(areas[2]["center_lng"] - 5.47) < 1e-9

    props = spark.createDataFrame(
        [("p1", "Amsterdam"), ("p2", "utrecht"), ("p3", "eindhoven"), ("p4", "elders")],
        "url string, city string",
    )
    got = {r["url"] for r in metro_city_expansion(props, wh.read("metro_cities"), 1).collect()}
    assert got == {"p1", "p2"}  # case-insensitive member-city semi-join (J8)

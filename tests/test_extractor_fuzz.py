"""Property-based fuzz of the coercion extractors (SURVEY.md §5.5):
random prices/areas/rooms/years rendered in the reference's observed
formats must round-trip through the column-expression extractors
(pipelines.py:12-47 coercion rules)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from fundamental_spark.functions.extractors import (
    extract_living_area,
    extract_price,
    extract_rooms,
    extract_year_built,
)


def _fmt_price(p: int) -> str:
    return "€ " + f"{p:,}".replace(",", ".") + " k.k."


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=10_000, max_value=9_999_999),  # price
            st.integers(min_value=1, max_value=9999),            # area
            st.integers(min_value=1, max_value=99),              # rooms
            st.integers(min_value=1000, max_value=2999),         # year
            st.booleans(),                                       # m² vs m2
        ),
        min_size=1,
        max_size=25,
    )
)
def test_coercion_roundtrip(spark, cases):
    rows = []
    for i, (price, area, rooms, year, sup) in enumerate(cases):
        unit = "m²" if sup else "m2"
        text = (
            f"Vraagprijs: {_fmt_price(price)}\n"
            f"Wonen: {area} {unit}\n"
            f"Aantal kamers: {rooms} kamers\n"
            f"Bouwjaar: {year}"
        )
        rows.append((str(i), text, price, area, rooms, year))
    df = spark.createDataFrame(
        rows, "id string, text string, price long, area int, rooms int, year int"
    )
    out = df.select(
        "price", "area", "rooms", "year",
        extract_price(F.lit(None).cast("string"), F.col("text")).alias("xp"),
        extract_living_area(F.lit(None).cast("string"), F.col("text")).alias("xa"),
        extract_rooms(F.col("text")).alias("xr"),
        extract_year_built(F.col("text")).alias("xy"),
    ).collect()
    for r in out:
        assert r["xp"] == r["price"]
        assert r["xa"] == r["area"]
        assert r["xr"] == r["rooms"]
        assert r["xy"] == r["year"] or len(str(r["year"])) != 4


def test_malformed_inputs_yield_null(spark):
    bad = ["", "geen prijs", "€ k.k.", "m²", "kamers", "Bouwjaar", "€ abc k.k."]
    df = spark.createDataFrame([(b,) for b in bad], "text string")
    out = df.select(
        extract_price(F.lit(None).cast("string"), F.col("text")).alias("p"),
        extract_living_area(F.lit(None).cast("string"), F.col("text")).alias("a"),
        extract_rooms(F.col("text")).alias("r"),
        extract_year_built(F.col("text")).alias("y"),
    ).collect()
    for r in out:
        assert r["p"] is None and r["a"] is None and r["r"] is None and r["y"] is None

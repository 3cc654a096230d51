"""asof_join operator semantics (backward/forward, ties, unmatched rows).
The oracle query `asof_join_events` checks it against DuckDB's ASOF LEFT
JOIN at scale; these are the small hand-checked cases."""

from __future__ import annotations

from oxbow_spark.operators.asof import asof_join


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_backward_basic(spark):
    left = spark.createDataFrame(
        [("a", 10, "L1"), ("a", 20, "L2"), ("b", 5, "L3")],
        "k string, t long, lbl string",
    )
    right = spark.createDataFrame(
        [("a", 8, 1.0), ("a", 15, 2.0), ("b", 9, 3.0)],
        "k string, t long, v double",
    )
    out = asof_join(left, right, on="t", by="k", right_cols=["v"])
    assert _rows(out) == sorted([
        ("a", 10, "L1", 1.0),   # latest right <= 10 is t=8
        ("a", 20, "L2", 2.0),   # latest right <= 20 is t=15
        ("b", 5, "L3", None),   # no right row at or before t=5
    ])


def test_tie_includes_equal_timestamp(spark):
    left = spark.createDataFrame([("a", 10, "L")], "k string, t long, lbl string")
    right = spark.createDataFrame([("a", 10, 7.0)], "k string, t long, v double")
    out = asof_join(left, right, on="t", by="k", right_cols=["v"])
    assert _rows(out) == [("a", 10, "L", 7.0)]


def test_forward_direction(spark):
    left = spark.createDataFrame(
        [("a", 10, "L1"), ("a", 30, "L2")], "k string, t long, lbl string"
    )
    right = spark.createDataFrame(
        [("a", 12, 1.0), ("a", 25, 2.0)], "k string, t long, v double"
    )
    out = asof_join(left, right, on="t", by="k", right_cols=["v"],
                    direction="forward")
    assert _rows(out) == sorted([
        ("a", 10, "L1", 1.0),   # nearest right >= 10 is t=12
        ("a", 30, "L2", None),  # nothing at or after 30
    ])


def test_no_by_group(spark):
    left = spark.createDataFrame([(10, "L")], "t long, lbl string")
    right = spark.createDataFrame([(3, 1.0), (9, 2.0)], "t long, v double")
    out = asof_join(left, right, on="t", right_cols=["v"])
    assert _rows(out) == [(10, "L", 2.0)]

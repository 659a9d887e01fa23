"""asof_join tie/edge semantics (the union + keyed forward-fill plan):
at-or-before inclusivity, same-time tiebreak to max tiebreak value, and
NULL fill before any right row."""

import datetime as dt

from kartograph_spark.datapipe.relational import asof_join


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01T00:00:00"), "e_before_any"),
            (1, _ts("2024-01-02T00:00:00"), "e_exact_tie"),
            (1, _ts("2024-01-05T00:00:00"), "e_after_both"),
            (2, _ts("2024-01-03T00:00:00"), "e_other_key"),
        ],
        "k long, ts timestamp, name string",
    )
    right = spark.createDataFrame(
        [
            # two k=1 orders at the SAME timestamp: tiebreak -> rid 11
            (1, _ts("2024-01-02T00:00:00"), 10, 100.0),
            (1, _ts("2024-01-02T00:00:00"), 11, 110.0),
            (1, _ts("2024-01-04T00:00:00"), 12, 120.0),
            # k=2 order strictly after the k=2 event: must not match
            (2, _ts("2024-01-04T00:00:00"), 20, 200.0),
        ],
        "k long, ts timestamp, rid long, amount double",
    )
    return left, right


def test_asof_join_semantics(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, key="k", time="ts", tiebreak="rid", carry=["amount"])
    got = {r["name"]: (r["asof_rid"], r["asof_amount"]) for r in out.collect()}
    assert got == {
        "e_before_any": (None, None),  # no right row at-or-before
        "e_exact_tie": (11, 110.0),  # inclusive match; same-ts -> max rid
        "e_after_both": (12, 120.0),  # latest preceding, not the earliest
        "e_other_key": (None, None),  # per-key isolation + strictly-after
    }
    assert out.count() == left.count()  # every left row survives


def test_asof_join_keeps_left_columns(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, key="k", time="ts", tiebreak="rid", carry=["amount"])
    assert set(out.columns) == {
        "k", "ts", "name", "asof_rid", "asof_amount", "asof_ts",
    }

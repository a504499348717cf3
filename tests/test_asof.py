"""As-of join: backward/forward semantics, ties, tolerance, bucketed parity."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pg_vectorize_spark.operators.asof import asof_join, asof_join_bucketed

T0 = dt.datetime(2024, 1, 1)


def _ts(sec: float) -> dt.datetime:
    return T0 + dt.timedelta(seconds=sec)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _ts(10.0), "a"),
            (2, "u1", _ts(20.0), "b"),
            (3, "u1", _ts(5.0), "c"),   # before any right row
            (4, "u2", _ts(50.0), "d"),
            (5, "u3", _ts(50.0), "e"),  # key with no right rows at all
            (6, "u1", _ts(15.0), "f"),  # exactly at a right ts
        ],
        "lid long, user string, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (100, "u1", _ts(8.0), 1.0),
            (101, "u1", _ts(15.0), 2.0),
            (102, "u1", _ts(15.0), 3.0),  # tie on ts: rid 102 > 101 wins backward
            (103, "u1", _ts(30.0), 4.0),
            (104, "u2", _ts(49.0), 5.0),
        ],
        "rid long, user string, ts timestamp, v double",
    )
    return left, right


def _rows(df):
    return {
        r["lid"]: (r["ts_right"], r["v"])
        for r in df.select("lid", "ts_right", "v").collect()
    }


def test_backward_semantics(frames):
    left, right = frames
    out = asof_join(
        left, right, on="user", left_ts="ts",
        right_cols=["v"], right_tie="rid",
    )
    got = _rows(out)
    assert got[1] == (_ts(8.0), 1.0)
    assert got[2] == (_ts(15.0), 3.0)   # latest <= 20 is the 15s pair; tie -> rid 102
    assert got[3] == (None, None)       # nothing at or before 5s
    assert got[4] == (_ts(49.0), 5.0)
    assert got[5] == (None, None)       # key never seen on the right
    assert got[6] == (_ts(15.0), 3.0)   # equality counts (r.ts <= l.ts)
    # left row count and columns preserved
    assert out.count() == left.count()
    assert out.columns[: len(left.columns)] == left.columns


def test_forward_semantics(frames):
    left, right = frames
    out = asof_join(
        left, right, on="user", left_ts="ts",
        right_cols=["v"], right_tie="rid", direction="forward",
    )
    got = _rows(out)
    assert got[1] == (_ts(15.0), 2.0)   # earliest >= 10 is 15s; tie -> rid 101
    assert got[2] == (_ts(30.0), 4.0)
    assert got[3] == (_ts(8.0), 1.0)
    assert got[4] == (None, None)       # nothing at or after 50s for u2
    assert got[6] == (_ts(15.0), 2.0)   # equality counts (r.ts >= l.ts)


def test_tolerance_voids_stale_matches(frames):
    left, right = frames
    out = asof_join(
        left, right, on="user", left_ts="ts",
        right_cols=["v"], right_tie="rid", tolerance_seconds=4.0,
    )
    got = _rows(out)
    assert got[1] == (_ts(8.0), 1.0)    # gap 2s <= 4s
    assert got[2] == (None, None)       # gap 5s > 4s -> voided
    assert got[4] == (_ts(49.0), 5.0)   # gap 1s


def test_numeric_time_axis(spark):
    left = spark.createDataFrame([(1, "k", 10.0)], "lid long, k string, t double")
    right = spark.createDataFrame(
        [(7, "k", 9.0, "x")], "rid long, k string, t double, s string"
    )
    out = asof_join(
        left, right, on="k", left_ts="t", right_cols=["s"],
        right_tie="rid", tolerance_seconds=2.0,
    )
    r = out.collect()[0]
    assert r["s"] == "x" and r["t_right"] == 9.0


def test_bucketed_matches_plain(spark):
    """Property check: bucketed == plain for random data, several Δ."""
    import random

    rng = random.Random(7)
    lrows = [
        (i, f"u{rng.randrange(5)}", _ts(rng.uniform(0, 1000)))
        for i in range(200)
    ]
    rrows = [
        (i, f"u{rng.randrange(5)}", _ts(rng.uniform(0, 1000)), float(i))
        for i in range(150)
    ]
    left = spark.createDataFrame(lrows, "lid long, user string, ts timestamp")
    right = spark.createDataFrame(
        rrows, "rid long, user string, ts timestamp, v double"
    )
    plain = asof_join(
        left, right, on="user", left_ts="ts", right_cols=["v"], right_tie="rid"
    )
    want = sorted(
        (r["lid"], r["ts_right"], r["v"])
        for r in plain.select("lid", "ts_right", "v").collect()
    )
    for bucket in (37.0, 250.0, 5000.0):
        b = asof_join_bucketed(
            left, right, on="user", left_ts="ts",
            bucket_seconds=bucket, right_cols=["v"], right_tie="rid",
        )
        got = sorted(
            (r["lid"], r["ts_right"], r["v"])
            for r in b.select("lid", "ts_right", "v").collect()
        )
        assert got == want, f"bucket={bucket}"


def test_bucketed_tolerance(frames):
    left, right = frames
    out = asof_join_bucketed(
        left, right, on="user", left_ts="ts", bucket_seconds=12.0,
        right_cols=["v"], right_tie="rid", tolerance_seconds=4.0,
    )
    got = _rows(out)
    assert got[1] == (_ts(8.0), 1.0)
    assert got[2] == (None, None)
    assert got[4] == (_ts(49.0), 5.0)


def test_no_cartesian_in_plan(frames):
    left, right = frames
    for df in (
        asof_join(left, right, on="user", left_ts="ts",
                  right_cols=["v"], right_tie="rid"),
        asof_join_bucketed(left, right, on="user", left_ts="ts",
                           bucket_seconds=60.0, right_cols=["v"],
                           right_tie="rid"),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestIntervalJoin:
    def _data(self, spark):
        points = spark.createDataFrame(
            [
                (1, "k", 10.0),
                (2, "k", 25.0),
                (3, "k", 100.0),
                (4, "z", 10.0),   # key with no intervals
            ],
            "pid long, k string, t double",
        )
        intervals = spark.createDataFrame(
            [
                (10, "k", 5.0, 10.0),    # boundary: end == point 1's t
                (11, "k", 10.0, 30.0),   # overlaps points 1 and 2
                (12, "k", 90.0, 350.0),  # spans many buckets
                (13, "q", 0.0, 1000.0),  # other key
            ],
            "iid long, k string, s double, e double",
        )
        return points, intervals

    def test_containment_pairs(self, spark):
        from pg_vectorize_spark.operators.asof import interval_join

        points, intervals = self._data(spark)
        for delta in (7.0, 20.0, 1000.0):
            out = interval_join(
                points, intervals, on="k", point_ts="t",
                start_ts="s", end_ts="e", bucket_seconds=delta,
            )
            pairs = sorted((r["pid"], r["iid"]) for r in out.collect())
            assert pairs == [(1, 10), (1, 11), (2, 11), (3, 12)], f"delta={delta}"

    def test_matches_naive_condition_join(self, spark):
        import random

        from pg_vectorize_spark.operators.asof import interval_join

        rng = random.Random(11)
        pts = [(i, f"u{rng.randrange(4)}", rng.uniform(0, 500)) for i in range(120)]
        its = []
        for i in range(60):
            s = rng.uniform(0, 480)
            its.append((i, f"u{rng.randrange(4)}", s, s + rng.uniform(0, 60)))
        points = spark.createDataFrame(pts, "pid long, k string, t double")
        intervals = spark.createDataFrame(its, "iid long, k string, s double, e double")
        naive = points.join(
            intervals,
            (points.k == intervals.k)
            & (points.t >= intervals.s)
            & (points.t <= intervals.e),
        )
        want = sorted((r["pid"], r["iid"]) for r in naive.collect())
        out = interval_join(
            points, intervals, on="k", point_ts="t",
            start_ts="s", end_ts="e", bucket_seconds=25.0,
        )
        got = sorted((r["pid"], r["iid"]) for r in out.collect())
        assert got == want

    def test_rejects_column_clash(self, spark):
        from pg_vectorize_spark.operators.asof import interval_join

        points, _ = self._data(spark)
        bad = points.withColumnRenamed("pid", "iid")
        _, intervals = self._data(spark)
        with pytest.raises(ValueError, match="overlapping"):
            interval_join(bad, intervals, on="k", point_ts="t",
                          start_ts="s", end_ts="e", bucket_seconds=10.0)

    def test_equi_join_plan(self, spark):
        from pg_vectorize_spark.operators.asof import interval_join

        points, intervals = self._data(spark)
        out = interval_join(points, intervals, on="k", point_ts="t",
                            start_ts="s", end_ts="e", bucket_seconds=10.0)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

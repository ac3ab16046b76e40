"""recrawl_schedule: hand-computed change rates and clamped intervals."""

from __future__ import annotations

import datetime as dt

from nlnieuwscrawler_spark.operators.recrawl import recrawl_schedule


def _ev(eid, key, minutes, value):
    return (eid, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes),
            key, value)


def test_recrawl_schedule_hand_computed(spark):
    rows = (
        # key 1: 5 hourly samples, 2 changes over 4h -> revisit 2h
        [_ev(i, 1, 60 * i, v) for i, v in enumerate([1.0, 1.0, 2.0, 2.0, 3.0])]
        # key 2: constant -> no change -> max_hours cadence
        + [_ev(10 + i, 2, 60 * i, 7.0) for i in range(3)]
        # key 3: changes every minute -> clamps to min_hours
        + [_ev(20 + i, 3, i, float(i)) for i in range(5)]
        # key 4: single observation -> span 0 -> max_hours
        + [_ev(30, 4, 0, 1.0)]
    )
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
    out = {r["user_id"]: r for r in recrawl_schedule(df).collect()}
    assert out[1]["n_obs"] == 5 and out[1]["n_changes"] == 2
    assert out[1]["span_hours"] == 4.0
    assert out[1]["change_rate"] == 0.5
    assert out[1]["revisit_hours"] == 2.0
    assert out[2]["n_changes"] == 0 and out[2]["revisit_hours"] == 168.0
    assert out[3]["n_changes"] == 4 and out[3]["revisit_hours"] == 1.0
    assert out[4]["n_obs"] == 1 and out[4]["revisit_hours"] == 168.0


def test_recrawl_schedule_ts_tie_broken_by_ord(spark):
    """Two samples at the SAME timestamp order by event_id: values
    (1, 2, 1) in event order = 2 changes, not a nondeterministic 1-2."""
    t0 = dt.datetime(2024, 1, 1)
    rows = [(1, t0, 9, 1.0), (2, t0, 9, 2.0),
            (3, t0 + dt.timedelta(hours=1), 9, 1.0)]
    df = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
    out = recrawl_schedule(df).collect()[0]
    assert out["n_changes"] == 2

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


def test_revision_diff_jaccard_and_edges(spark):
    """Identical consecutive snapshots score 1.0/unchanged, a one-word
    swap on 4 tokens scores 3/5, empty→empty is identical, the first
    snapshot of a page is NULL, repeated tokens dedup before Jaccard."""
    from nlnieuwscrawler_spark.operators.recrawl import revision_diff

    rows = [
        (1, 1, "the quick brown fox"),
        (1, 2, "the the quick brown fox fox"),  # same SET -> 1.0
        (1, 3, "the slow brown fox"),           # |∩|=3, |∪|=5
        (2, 1, ""),
        (2, 2, ""),
        (2, 3, "new content"),
        (3, 1, "only one snapshot"),
    ]
    df = spark.createDataFrame(rows, "page long, ts long, text string")
    out = {(r["page"], r["ts"]): r for r in revision_diff(df).collect()}
    assert out[(1, 1)]["word_jaccard"] is None
    assert out[(1, 2)]["word_jaccard"] == 1.0 and not out[(1, 2)]["changed"]
    assert out[(1, 3)]["word_jaccard"] == 0.6 and out[(1, 3)]["changed"]
    assert out[(2, 2)]["word_jaccard"] == 1.0      # empty -> empty
    assert out[(2, 3)]["word_jaccard"] == 0.0 and out[(2, 3)]["changed"]
    assert out[(3, 1)]["changed"] is None
    assert out[(1, 2)]["n_tokens"] == 4            # deduped token count

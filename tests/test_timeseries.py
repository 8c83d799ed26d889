"""operators/timeseries.py: rolling integer-exact anomaly detection and
gaps-and-islands — semantics against hand-built Python folds, plus the
determinism properties the module's design leans on."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from dudb_spark.operators.timeseries import event_islands, rolling_anomalies


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=m), u, t, v)
            for (i, m, u, t, v) in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )


def test_rolling_anomaly_flags_spike_not_noise(spark):
    # user 1: a flat-ish history then a spike; user 2: too short to judge
    rows = [(i, i, 1, "x", 10.0 + (i % 2) * 0.02) for i in range(10)]
    rows.append((10, 10, 1, "x", 50.0))  # the spike
    rows += [(100 + i, i, 2, "x", 5.0) for i in range(4)]  # < min_prior
    res = rolling_anomalies(_ev(spark, rows)).collect()
    by_id = {r["id"]: r for r in res}
    assert 10 in by_id and by_id[10]["is_anomaly"]
    # noise rows inside the band are judged but NOT flagged
    judged = [r for r in res if r["id"] < 10]
    assert judged and not any(r["is_anomaly"] for r in judged)
    # user 2 never reaches min_prior: absent entirely
    assert not any(r["key"] == 2 for r in res)


def test_rolling_anomaly_integer_terms_match_python(spark):
    # replay the int64 test in plain Python over the same frame
    vals = [3.25, 7.5, 1.01, 9.99, 4.44, 6.0, 5.55, 8.2, 2.0, 7.77]
    rows = [(i, i, 1, "x", v) for i, v in enumerate(vals)]
    res = {r["id"]: r for r in rolling_anomalies(
        _ev(spark, rows), lookback=5, min_prior=3
    ).collect()}
    q = [round(v * 100) for v in vals]
    for i in range(len(vals)):
        hist = q[max(0, i - 5):i]
        n = len(hist)
        if n < 3:
            assert i not in res
            continue
        s, ss = sum(hist), sum(x * x for x in hist)
        dev_n, var_n = n * q[i] - s, n * ss - s * s
        r = res[i]
        assert (r["n_prior"], r["dev_n"], r["var_n"]) == (n, dev_n, var_n)
        assert r["is_anomaly"] == (dev_n * dev_n > 9 * var_n)


def test_rolling_anomaly_zero_variance_history(spark):
    # constant history: ANY deviation flags, staying constant doesn't
    rows = [(i, i, 1, "x", 4.0) for i in range(8)]
    rows += [(8, 8, 1, "x", 4.0), (9, 9, 1, "x", 4.01)]
    res = {r["id"]: r["is_anomaly"]
           for r in rolling_anomalies(_ev(spark, rows)).collect()}
    assert res[8] is False and res[9] is True


def test_event_islands_runs_and_min_len(spark):
    rows = [
        (0, 0, 1, "a", 0.0), (1, 1, 1, "a", 0.0), (2, 2, 1, "a", 0.0),
        (3, 3, 1, "b", 0.0),
        (4, 4, 1, "a", 0.0), (5, 5, 1, "a", 0.0),
        (6, 0, 2, "a", 0.0), (7, 1, 2, "a", 0.0), (8, 2, 2, "a", 0.0),
        (9, 3, 2, "a", 0.0),
    ]
    got = sorted(
        (r["key"], r["label"], r["run_len"], r["min_id"], r["max_id"])
        for r in event_islands(_ev(spark, rows)).collect()
    )
    assert got == [
        (1, "a", 2, 4, 5), (1, "a", 3, 0, 2), (1, "b", 1, 3, 3),
        (2, "a", 4, 6, 9),
    ]
    long_only = event_islands(_ev(spark, rows), min_len=3).collect()
    assert sorted((r["key"], r["run_len"]) for r in long_only) == [
        (1, 3), (2, 4)
    ]


def test_event_islands_ts_order_not_id_order(spark):
    # ids deliberately NOT time-monotone: runs follow ts, min/max_id are
    # set extrema over the island
    rows = [
        (5, 0, 1, "a", 0.0), (1, 1, 1, "a", 0.0), (9, 2, 1, "b", 0.0),
        (2, 3, 1, "a", 0.0),
    ]
    got = sorted(
        (r["label"], r["run_len"], r["min_id"], r["max_id"])
        for r in event_islands(_ev(spark, rows)).collect()
    )
    assert got == [("a", 1, 2, 2), ("a", 2, 1, 5), ("b", 1, 9, 9)]


def test_rolling_anomaly_single_exchange_plan(spark):
    # the frame + filter must plan as ONE shuffle on the key: no extra
    # Exchange beyond the window's hashpartitioning(user_id)
    plan = rolling_anomalies(
        _ev(spark, [(0, 0, 1, "x", 1.0)])
    ).where("is_anomaly")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_rolling_anomaly_null_values_dropped(spark):
    # a NULL value must not occupy a frame slot nor corrupt the test
    # terms (count vs sum mismatch); batch and stream share the contract
    rows = [(i, i, 1, "x", 5.0) for i in range(8)]
    rows[3] = (3, 3, 1, "x", None)
    rows.append((8, 8, 1, "x", 40.0))
    res = {r["id"]: r for r in rolling_anomalies(
        _ev(spark, rows), lookback=5, min_prior=3
    ).collect()}
    assert 3 not in res  # the null event itself is never judged
    # id 8's window = last 5 NON-NULL events, all 5.0 → flagged
    r = res[8]
    assert r["n_prior"] == 5 and r["is_anomaly"]
    assert r["var_n"] == 0 and r["dev_n"] == 5 * (4000 - 500) // 1  # 5*q - s


def test_transition_matrix_goldens(spark):
    """Hand-traced sequences: user 1 walks a->b->a->b (a->b x2,
    b->a x1), user 2 walks b->b (b->b x1); single-event users
    contribute nothing; simultaneous events order by the id
    tiebreak."""
    import datetime as dt

    from dudb_spark.operators.timeseries import transition_matrix

    t0 = dt.datetime(2024, 3, 1, 12, 0, 0)

    def ev(eid, uid, typ, sec):
        return (eid, t0 + dt.timedelta(seconds=sec), uid, typ)

    rows = [
        ev(1, 1, "a", 0), ev(2, 1, "b", 10),
        ev(3, 1, "a", 20), ev(4, 1, "b", 30),
        ev(5, 2, "b", 0), ev(6, 2, "b", 5),
        ev(7, 3, "a", 0),                      # singleton: no pairs
        # user 4: two SIMULTANEOUS events -> id order decides c->d
        ev(8, 4, "c", 0), ev(9, 4, "d", 0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string")
    got = {(r["from_label"], r["to_label"]):
           (r["n_transitions"], r["prob"])
           for r in transition_matrix(df).collect()}
    assert got == {
        ("a", "b"): (2, 1.0),
        ("b", "a"): (1, 0.5),
        ("b", "b"): (1, 0.5),
        ("c", "d"): (1, 1.0),
    }


def test_cooccurrence_lift_goldens(spark):
    """4 users: {a,b} x2, {a} alone, {b,c}: pair (a,b) has
    support 2/4 and lift (2*4)/(3*3); (b,c) lift (1*4)/(3*1);
    duplicate events collapse into the basket."""
    rows = [(1, "a"), (1, "b"), (1, "a"),
            (2, "a"), (2, "b"),
            (3, "a"),
            (4, "b"), (4, "c")]
    import pytest

    from dudb_spark.operators.timeseries import cooccurrence_lift

    df = spark.createDataFrame(rows, "user_id long, event_type string")

    got = {(r["label_a"], r["label_b"]): r
           for r in cooccurrence_lift(df).collect()}
    ab = got[("a", "b")]
    assert (ab["n_both"], ab["n_a"], ab["n_b"]) == (2, 3, 3)
    assert ab["support"] == 0.5
    assert ab["lift"] == pytest.approx(8 / 9, abs=1e-9)
    bc = got[("b", "c")]
    assert (bc["n_both"], bc["lift"]) == (1, pytest.approx(4 / 3, abs=1e-9))
    assert ("a", "c") not in got


def test_rolling_active_users_goldens(spark):
    """Hand-traced 3-day window: users {1,2} on day 1, {2} on day 2,
    {3} on day 5.  Day-2 WAU covers days 1-2 = {1,2}; day 5 only
    itself (window expired); days without activity don't report."""
    import datetime as dt

    from dudb_spark.operators.retention import rolling_active_users

    d = dt.date(2024, 5, 1)

    def at(day, uid):
        return (uid, dt.datetime(2024, 5, day, 12, 0))

    rows = [at(1, 1), at(1, 2), at(1, 2), at(2, 2), at(5, 3)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {str(r["day"]): (r["dau"], r["wau"], r["stickiness"])
           for r in rolling_active_users(df, window_days=3).collect()}
    assert got == {
        "2024-05-01": (2, 2, 1.0),
        "2024-05-02": (1, 2, 0.5),
        "2024-05-05": (1, 1, 1.0),
    }
    assert str(d) in got  # day key is a real date


def test_activation_latency_goldens(spark):
    """User 1 signs up then purchases 90s later (an earlier purchase
    BEFORE signup must not count); user 2 never purchases -> NULL;
    user 3 purchases at the same instant -> latency 0; purchase-only
    users don't report."""
    import datetime as dt

    from dudb_spark.operators.retention import activation_latency

    t0 = dt.datetime(2024, 6, 1, 10, 0, 0)

    def ev(uid, typ, sec):
        return (uid, typ, t0 + dt.timedelta(seconds=sec))

    rows = [
        ev(1, "purchase", -50), ev(1, "signup", 0), ev(1, "purchase", 90),
        ev(1, "purchase", 200),
        ev(2, "signup", 10),
        ev(3, "signup", 5), ev(3, "purchase", 5),
        ev(4, "purchase", 7),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp")
    got = {r["key"]: (r["latency_s"], r["t_to_us"] is not None)
           for r in activation_latency(df, "signup", "purchase").collect()}
    assert got == {1: (90, True), 2: (None, False), 3: (0, True)}


def test_cooccurrence_lift_min_count(spark):
    """min_count prunes rare pairs before the singles joins; counts
    and lifts of survivors are unchanged vs the unpruned run."""
    from dudb_spark.operators.timeseries import cooccurrence_lift

    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c")]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    full = {(r["label_a"], r["label_b"]): r["n_both"]
            for r in cooccurrence_lift(df).collect()}
    pruned = {(r["label_a"], r["label_b"]): r["n_both"]
              for r in cooccurrence_lift(df, min_count=2).collect()}
    assert full == {("a", "b"): 2, ("a", "c"): 1}
    assert pruned == {("a", "b"): 2}


def test_volume_trend_goldens(spark):
    """A perfectly linear ramp (1,2,3 events on days 0,1,2) fits
    slope 1, intercept 1, r2 1; a constant series fits slope 0 with
    NULL r2 (zero y-variance); a single-day key is NULL-degenerate."""
    import datetime as dt

    from dudb_spark.operators.timeseries import volume_trend

    rows = []
    for day, cnt in ((1, 1), (2, 2), (3, 3)):
        rows += [("ramp", dt.datetime(1970, 1, day, 8))] * cnt
    for day in (1, 2, 3):
        rows += [("flat", dt.datetime(1970, 1, day, 9))] * 2
    rows += [("one", dt.datetime(1970, 1, 5, 10))]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    got = {r["key"]: r for r in volume_trend(df).collect()}
    ramp = got["ramp"]
    assert (ramp["n_days"], ramp["slope"], ramp["intercept"],
            ramp["r2"]) == (3, 1.0, 1.0, 1.0)
    flat = got["flat"]
    assert (flat["slope"], flat["intercept"], flat["r2"]) == (
        0.0, 2.0, None)
    one = got["one"]
    assert (one["n_days"], one["slope"], one["r2"]) == (1, None, None)

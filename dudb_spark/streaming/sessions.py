"""Custom stateful streaming operator: per-user session windows.

The reference has nothing stateful (SURVEY.md §2.9); this is the engine's
demonstration of the ``applyInPandasWithState`` extension point — the
escape hatch for operators Structured Streaming lacks natively (session
windows with custom close conditions, per-key sketches, ...).

Semantics: consecutive events of one user belong to one session while the
gap between them is ≤ ``gap``; a longer gap closes the session and emits
one row ``(user_id, session_start, session_end, n_events, sum_value)``.

Correctness under multi-batch arrival
-------------------------------------
A session is emitted exactly when ``session_end + gap < watermark``: once
the watermark passes that point, no admissible event (events below the
watermark are dropped by the stateful operator) can extend or restructure
it.  Idle and trailing sessions are closed by an EVENT-TIME TIMEOUT keyed
to the same rule, so emission does not depend on a later event for the
same key arriving — the round-2 robustness hole (sessions were only
closed by a successor event, which required each user's whole history to
land in one micro-batch).  The batch restatement of this rule is
``sessionize_batch_oracle``: sessionize + keep sessions whose
``end + gap`` precedes the final watermark (the millisecond-floored
global max event time minus the delay — Spark floors event-time stats to
milliseconds before subtracting the delay).

State is bounded: events more than ``gap`` below the watermark can no
longer be re-split or re-merged by any admissible arrival (a bridging
event would have to be below the watermark), so the open session's prefix
is compacted to one (start, last, n, sum) tuple and only events within
the trailing gap-window are buffered raw.  Per key that is the activity
of one gap-window — a 1000-executor deployment shards it by user hash
with no skew beyond the busiest single user.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        # compacted prefix of the open session (events < watermark - gap)
        T.StructField("start_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("v", T.DoubleType()),
        # raw events still inside the trailing gap-window
        T.StructField("ts_buf", T.ArrayType(T.LongType())),
        T.StructField("val_buf", T.ArrayType(T.DoubleType())),
    ]
)


def _dur_us(dur: str) -> int:
    unit_us = {
        "second": 1_000_000, "seconds": 1_000_000,
        "minute": 60_000_000, "minutes": 60_000_000,
        "hour": 3_600_000_000, "hours": 3_600_000_000,
    }
    qty, unit = dur.split()
    return int(qty) * unit_us[unit]


def _session_fn(gap_us: int):
    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        wm_us = state.getCurrentWatermarkMs() * 1000

        if state.exists:
            start, last, n, v, ts_buf, val_buf = state.get
            ts_buf, val_buf = list(ts_buf), list(val_buf)
        else:
            start, last, n, v, ts_buf, val_buf = None, None, 0, 0.0, [], []

        frames = [] if state.hasTimedOut else list(pdfs)
        for pdf in frames:
            ts_buf.extend(int(t.value // 1000) for t in pdf["ts"])
            val_buf.extend(float(x) for x in pdf["value"])
        if ts_buf:
            order = sorted(range(len(ts_buf)), key=ts_buf.__getitem__)
            ts_buf = [ts_buf[i] for i in order]
            val_buf = [val_buf[i] for i in order]

        # rebuild the session list: compacted prefix + buffered events.
        # sessions: [start, end, n, sum, raw_ts, raw_vals]; the compacted
        # prefix carries no raw events (they are already final).
        sessions = []
        if start is not None:
            sessions.append([start, last, n, v, [], []])
        for t, x in zip(ts_buf, val_buf):
            if sessions and t - sessions[-1][1] <= gap_us:
                s = sessions[-1]
                s[1] = max(s[1], t)
                s[2] += 1
                s[3] += x
                s[4].append(t)
                s[5].append(x)
            else:
                sessions.append([t, t, 1, x, [t], [x]])

        closed = [s for s in sessions if s[1] + gap_us < wm_us]
        kept = [s for s in sessions if s[1] + gap_us >= wm_us]

        if kept:
            # compact the first kept session's sub-(wm - gap) events — no
            # admissible future event can reach them; later kept sessions
            # start above the watermark and stay fully buffered
            first, rest = kept[0], kept[1:]
            horizon = wm_us - gap_us
            c_start = c_last = None
            c_n, c_v = 0, 0.0
            r_ts, r_val = [], []
            if not first[4]:  # pure compacted carry-over
                c_start, c_last, c_n, c_v = first[:4]
            else:
                if first[0] < first[4][0]:  # prior compacted prefix
                    c_start, c_last, c_n, c_v = start, last, n, v
                for t, x in zip(first[4], first[5]):
                    if t < horizon:
                        c_start = t if c_start is None else c_start
                        c_last, c_n, c_v = t, c_n + 1, c_v + x
                    else:
                        r_ts.append(t)
                        r_val.append(x)
            for s in rest:
                r_ts.extend(s[4])
                r_val.extend(s[5])
            state.update((c_start, c_last, c_n, c_v, r_ts, r_val))
            # wake up when the watermark can first pass the earliest
            # open session's close point (end + gap), even if no further
            # event for this key ever arrives
            close_ms = (kept[0][1] + gap_us) // 1000 + 1
            state.setTimeoutTimestamp(
                max(close_ms, state.getCurrentWatermarkMs() + 1)
            )
        else:
            state.remove()

        out = pd.DataFrame(
            [(user_id, s[0], s[1], s[2], s[3]) for s in closed],
            columns=[
                "user_id", "session_start", "session_end",
                "n_events", "sum_value",
            ],
        )
        if len(out):
            out["session_start"] = pd.to_datetime(out["session_start"], unit="us")
            out["session_end"] = pd.to_datetime(out["session_end"], unit="us")
        yield out

    return fn


def sessionize(
    events: DataFrame, gap: str = "30 minutes", delay: str = "0 seconds"
) -> DataFrame:
    """Apply the stateful session operator to a streaming events frame.

    ``delay`` is the watermark delay: how much event-time disorder the
    stream admits.  Sessions emit once the watermark passes their close
    point; larger delays emit later but tolerate later data.
    """
    gap_us = _dur_us(gap)
    return (
        events.select("user_id", "ts", "value")
        .withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_us),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def sessionize_batch_oracle(
    events: DataFrame, gap: str = "30 minutes", delay: str = "0 seconds"
) -> DataFrame:
    """Batch restatement of the streaming semantics: lag + cumulative-sum
    sessionization, keeping exactly the sessions whose ``end + gap`` lies
    below the stream's final watermark (ms-floored global max event time
    minus the delay, matching Spark's event-time stats precision)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    qty, unit = gap.split()
    gap_expr = f"INTERVAL {qty} {unit}"
    w = Window.partitionBy("user_id").orderBy("ts")
    sess = (
        events.select("user_id", "ts", "value")
        .withColumn("prev", F.lag("ts").over(w))
        .withColumn(
            "new_sess",
            (F.col("prev").isNull())
            | (F.col("ts") > F.expr(f"prev + {gap_expr}")),
        )
        .withColumn(
            "sess_id", F.sum(F.col("new_sess").cast("long")).over(w)
        )
    )
    agg = sess.groupBy("user_id", "sess_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("sum_value"),
    )
    d_qty, d_unit = delay.split()
    wm = events.agg(
        F.expr(
            f"date_trunc('MILLISECOND', max(ts)) - INTERVAL {d_qty} {d_unit}"
        ).alias("_wm")
    )
    return (
        agg.crossJoin(F.broadcast(wm))
        .where(F.expr(f"session_end + {gap_expr} < _wm"))
        .drop("sess_id", "_wm")
    )

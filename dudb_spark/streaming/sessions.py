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
    # The kernel is vectorized: session boundaries come from one
    # np.diff > gap over the (sorted) event times, per-session counts/
    # sums from reduceat over the boundary indices — no per-event Python
    # loop.  Values are expected to be exactly representable doubles
    # (integer cents in the gates), so any summation order is exact.
    import numpy as np

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        wm_us = state.getCurrentWatermarkMs() * 1000

        if state.exists:
            start, last, n, v, ts_buf, val_buf = state.get
            ts = np.asarray(ts_buf, dtype=np.int64)
            vs = np.asarray(val_buf, dtype=np.float64)
        else:
            start, last, n, v = None, None, 0, 0.0
            ts = np.empty(0, np.int64)
            vs = np.empty(0, np.float64)

        if not state.hasTimedOut:
            parts_t, parts_v = [ts], [vs]
            for pdf in pdfs:
                parts_t.append(pdf["ts"].astype("int64").to_numpy() // 1000)
                parts_v.append(pdf["value"].to_numpy(dtype=np.float64))
            ts = np.concatenate(parts_t)
            vs = np.concatenate(parts_v)
            if ts.size > 1:
                order = np.argsort(ts, kind="stable")
                ts, vs = ts[order], vs[order]

        # sessionize the sorted buffer: an event starts a new session when
        # its gap from the previous event (or the compacted prefix's last
        # event) exceeds gap_us.  brk[i] = True ⇔ event i opens a session.
        if ts.size:
            merged_prefix = last is not None and (ts[0] - last <= gap_us)
            brk = np.empty(ts.size, dtype=bool)
            brk[0] = True  # grouping always opens at the first event;
            # whether that group CONTINUES the carried prefix session is
            # tracked by merged_prefix and folded in below
            if ts.size > 1:
                np.greater(ts[1:] - ts[:-1], gap_us, out=brk[1:])
            starts_ix = np.flatnonzero(brk)
            bounds = np.append(starts_ix, ts.size)
            s_start = ts[starts_ix].copy()
            s_end = ts[bounds[1:] - 1].copy()
            s_n = np.diff(bounds).astype(np.int64)
            s_v = np.add.reduceat(vs, starts_ix)
            if merged_prefix:
                s_start[0] = start
                s_end[0] = max(s_end[0], last)
                s_n[0] += n
                s_v[0] += v
            lone_prefix = last is not None and not merged_prefix
        else:
            s_start = s_end = np.empty(0, np.int64)
            s_n = np.empty(0, np.int64)
            s_v = np.empty(0, np.float64)
            starts_ix = bounds = None
            merged_prefix = False
            lone_prefix = last is not None

        if lone_prefix:
            # the carried prefix is its own (earliest) session
            s_start = np.concatenate(([start], s_start))
            s_end = np.concatenate(([last], s_end))
            s_n = np.concatenate(([n], s_n))
            s_v = np.concatenate(([v], s_v))

        # session ends are ascending, so closed sessions are a prefix:
        # end + gap < wm  ⇔  end < wm - gap
        horizon = wm_us - gap_us
        cut = int(np.searchsorted(s_end, horizon, side="left"))
        n_sessions = s_start.size

        if cut < n_sessions:
            # compact the first kept session's sub-horizon events — no
            # admissible future event can reach them; later kept sessions
            # end above the horizon... their events may still predate it
            # only within the first kept session, so the rest stay raw
            if ts.size:
                # index of the first kept session within the BUFFER
                # session list (a lone prefix shifts the session arrays
                # by one relative to starts_ix/bounds)
                bcut = cut - 1 if lone_prefix else cut
                if bcut < 0:
                    # kept[0] is the lone prefix (no raw events); every
                    # buffered event belongs to later kept sessions
                    lo = hi = 0
                else:
                    lo = int(starts_ix[bcut])  # kept[0]'s first event
                    hi = lo + int(
                        np.searchsorted(
                            ts[lo:bounds[bcut + 1]], horizon, side="left"
                        )
                    )
            else:
                lo = hi = 0
            # compacted tuple: prior prefix (if it flowed into kept[0])
            # plus kept[0]'s sub-horizon events
            in_prefix = (cut == 0) and (merged_prefix or lone_prefix)
            c_start = start if in_prefix else None
            c_last = last if in_prefix else None
            c_n = n if in_prefix else 0
            c_v = v if in_prefix else 0.0
            if hi > lo:
                if c_start is None:
                    c_start = int(ts[lo])
                c_last = int(ts[hi - 1])
                c_n += int(hi - lo)
                c_v += float(vs[lo:hi].sum())
            r_ts = [int(t) for t in ts[hi:]] if ts.size else []
            r_val = [float(x) for x in vs[hi:]] if ts.size else []
            state.update((c_start, c_last, c_n, c_v, r_ts, r_val))
            # wake up when the watermark can first pass the earliest open
            # session's close point (end + gap), even if no further event
            # for this key ever arrives
            close_ms = (int(s_end[cut]) + gap_us) // 1000 + 1
            state.setTimeoutTimestamp(
                max(close_ms, state.getCurrentWatermarkMs() + 1)
            )
        else:
            state.remove()

        out = pd.DataFrame(
            {
                "user_id": np.full(cut, user_id, dtype=np.int64),
                "session_start": pd.to_datetime(s_start[:cut], unit="us"),
                "session_end": pd.to_datetime(s_end[:cut], unit="us"),
                "n_events": s_n[:cut],
                "sum_value": s_v[:cut],
            }
        )
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

"""Ordered time-series operators over event streams: rolling-window
anomaly detection and gaps-and-islands run detection.

Both are pure window-function compositions — one shuffle on the
partition key (user), per-partition ordered evaluation, no UDFs, no
driver participation — the same scale shape as operators/asof.py and
operators/retention.py.  At 100 TB the cost is the single Exchange on
``user_id`` plus a per-partition sort; skewed users are bounded by the
frame width (anomaly) or by run structure (islands), and AQE handles
partition-size imbalance.

**Cross-engine determinism is designed in, not hoped for.**  A naive
rolling z-score (``avg``/``stddev`` over a sliding frame) is NOT
reproducible across engines: Spark re-scans each frame in row order
while DuckDB aggregates sliding frames through a segment tree, so the
double additions associate differently and the last ulp diverges —
which flips ``|z| > 3`` on boundary rows.  Instead the detector
quantizes the value to integer centi-units once (the q90/q145
"nano-unit" discipline, here exact because the synthetic values carry
two decimals), folds integer sums, and tests ``dev² > z²·var`` with
BOTH sides held in int64:

    mean = s/n,  dev = q − s/n  →  n·q − s          (int)
    var  = (n·Σq² − s²)/n²                           (int numerator)
    z² > Z²  ⇔  (n·q − s)² > Z² · (n·Σq² − s²)       (all int64)

No division, no sqrt, no doubles anywhere in the decision — any engine
with 64-bit integers and the same frame semantics produces the
identical flag set.  Overflow headroom is documented at the callsite
(centi-units keep ``(n·q)²`` under 2^63 for values ≤ ~9·10⁵ at frame
width 13).

The reference has no time-series surface (its domain is filesystem
metadata snapshots); this extends the events-analytics family next to
sessionization (streaming/sessions.py) and funnels (retention.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def rolling_anomalies(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
    scale: int = 100,
    lookback: int = 12,
    min_prior: int = 6,
    z: int = 3,
) -> DataFrame:
    """Flag events whose value deviates more than ``z`` standard
    deviations from the trailing ``lookback``-event window of the same
    key (the window EXCLUDES the current row, so an anomaly can't mask
    itself).  Rows with fewer than ``min_prior`` history rows are not
    judged.  All arithmetic integer — see the module docstring for the
    derivation and why floats would not replay cross-engine.

    A zero-variance history flags ANY deviation (``dev² > 0``): a value
    breaking a constant run is the strongest anomaly signal, and the
    integer test handles it with no epsilon.

    Output: (id, key, ts, value, n_prior, dev_n, var_n, is_anomaly)
    where dev_n = n·q − s and var_n = n·Σq² − s² are the integer test
    terms (exposed so thresholds can be re-derived downstream).
    """
    q = F.round(F.col(value_col) * scale).cast("long")
    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(-lookback, -1)
    )
    n = F.count(F.lit(1)).over(w)
    s = F.sum(q).over(w)
    ss = F.sum(q * q).over(w)
    dev_n = n * q - s
    var_n = n * ss - s * s
    # NULL values are dropped UP FRONT: counting them in n while the
    # sums skip them would corrupt the integer test terms, and the
    # streaming twin (streaming/anomaly.py) must see the identical
    # event sequence for streamed == batch to hold
    events = events.where(F.col(value_col).isNotNull())
    return (
        events.select(
            F.col(id_col).alias("id"),
            F.col(key_col).alias("key"),
            F.col(ts_col).alias("ts"),
            F.col(value_col).alias("value"),
            n.alias("n_prior"),
            dev_n.alias("dev_n"),
            var_n.alias("var_n"),
        )
        .where(F.col("n_prior") >= min_prior)
        .withColumn(
            "is_anomaly",
            F.col("dev_n") * F.col("dev_n")
            > F.lit(int(z * z)) * F.col("var_n"),
        )
    )


def event_islands(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    label_col: str = "event_type",
    min_len: int = 1,
) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive identical labels
    per key in event order — the classic two-row_number difference
    (rn_overall − rn_within_label is constant exactly along a run),
    entirely integer, then one fold per island.

    Scale: two window passes over the SAME (key, ts, id) ordering —
    Catalyst evaluates both in one Window operator chain after a single
    Exchange on the key — plus a groupBy whose key count is the number
    of islands (≤ rows).  Nothing data-proportional on the driver.

    Output: (key, label, run_len, min_id, max_id, start_ts, end_ts),
    one row per island with run_len ≥ ``min_len``.  min/max_id are set
    extrema over the island (ids need not be time-monotone; the
    time-ordered endpoints are start_ts/end_ts)."""
    w_all = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    w_lbl = Window.partitionBy(key_col, label_col).orderBy(ts_col, id_col)
    marked = events.select(
        F.col(key_col).alias("key"),
        F.col(label_col).alias("label"),
        F.col(ts_col).alias("ts"),
        F.col(id_col).alias("id"),
        (F.row_number().over(w_all) - F.row_number().over(w_lbl)).alias(
            "island"
        ),
    )
    return (
        marked.groupBy("key", "label", "island")
        .agg(
            F.count(F.lit(1)).alias("run_len"),
            F.min("id").alias("min_id"),
            F.max("id").alias("max_id"),
            F.min("ts").alias("start_ts"),
            F.max("ts").alias("end_ts"),
        )
        .where(F.col("run_len") >= min_len)
        .drop("island")
    )


def transition_matrix(
    df: DataFrame,
    key_col: str = "user_id",
    label_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences: for each (from_label, to_label) pair, how many ADJACENT
    event pairs step from one to the other, and the row-normalized
    transition probability — the product-analytics "what happens
    next" primitive (and the q157 bigram-LM idea applied to behavior
    streams instead of tokens).

    Determinism: adjacency is ordered by (ts, id) — the id tiebreak
    makes simultaneous events a fixed order in any engine.  Counts
    are exact integers; the probability is count/from_total in double
    rounded to 9 (identical op order both engines).

    Scale shape: ONE keyed window (lead over user_id — partitioned,
    never global) + one (from,to)-keyed count + a from-keyed total
    that rides the same fold re-aggregated; no self-joins, no
    explode.  Labels×labels output, corpus-size-independent."""
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    steps = (
        df.select(
            key_col,
            F.col(label_col).alias("from_label"),
            ts_col,
            id_col,
        )
        .withColumn("to_label", F.lead("from_label").over(w))
        .where(F.col("to_label").isNotNull())
        .groupBy("from_label", "to_label")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
    totals = steps.groupBy("from_label").agg(
        F.sum("n_transitions").alias("_tot")
    )
    return (
        steps.join(totals, "from_label")
        .select(
            "from_label",
            "to_label",
            "n_transitions",
            F.round(
                F.col("n_transitions").cast("double") / F.col("_tot"), 9
            ).alias("prob"),
        )
        .orderBy("from_label", "to_label")
    )


def cooccurrence_lift(
    df: DataFrame,
    key_col: str = "user_id",
    label_col: str = "event_type",
    min_count: int = 1,
) -> DataFrame:
    """Market-basket association over per-key label sets: for every
    unordered label pair, how many keys exhibit BOTH, with support
    and lift — the order-free complement to :func:`transition_matrix`
    (which asks "what follows", this asks "what goes together"),
    the classic segmentation/cross-feature signal.

    lift = P(a,b)/(P(a)·P(b)) > 1 means the labels attract; < 1
    repel.  Exact integer counts throughout; support and lift are
    formed in double in the same operation order both engines and
    rounded to 9.

    Scale shape: the basket frame is the DISTINCT (key, label)
    projection (one shuffle); the pair stage self-joins it on the key
    — per-key fan-out is |labels per key|² (bounded by basket size),
    the same bounded-key argument as the LSH band join.
    ``min_count`` prunes rare pairs BEFORE the singles joins (the
    association-rule support threshold — without it an items-style
    vocabulary emits every co-purchase once).  The singles frame is
    vocabulary-sized, so it carries NO broadcast hint — AQE sizes
    that join (a 200M-item catalog must not OOM the driver; the
    round-10 leakage_free_split rule); only the single-row key total
    is hint-broadcast."""
    basket = df.select(key_col, label_col).distinct()
    # total-key count rides the plan as a broadcast single-row frame
    # (no driver-side action; the q106/q177 scalar pattern)
    nk = basket.select(key_col).distinct().agg(
        F.count(F.lit(1)).alias("_nk")
    )
    singles = basket.groupBy(label_col).agg(
        F.count(F.lit(1)).alias("_n")
    )
    a = basket.select(
        F.col(key_col).alias("_k"), F.col(label_col).alias("label_a")
    )
    b = basket.select(
        F.col(key_col).alias("_k"), F.col(label_col).alias("label_b")
    )
    pairs = (
        a.join(b, "_k")
        .where(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .where(F.col("n_both") >= min_count)
    )
    sa = singles.select(
        F.col(label_col).alias("label_a"), F.col("_n").alias("n_a"))
    sb = singles.select(
        F.col(label_col).alias("label_b"), F.col("_n").alias("n_b"))
    return (
        pairs.join(sa, "label_a")
        .join(sb, "label_b")
        .crossJoin(F.broadcast(nk))
        .select(
            "label_a",
            "label_b",
            "n_both",
            "n_a",
            "n_b",
            F.round(
                F.col("n_both").cast("double") / F.col("_nk"), 9
            ).alias("support"),
            F.round(
                (F.col("n_both").cast("double") * F.col("_nk"))
                / (F.col("n_a").cast("double") * F.col("n_b")),
                9,
            ).alias("lift"),
        )
        .orderBy("label_a", "label_b")
    )


def volume_trend(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key OLS trend of daily event volume: slope (events/day),
    intercept and r² of count-vs-day — the "is this segment growing
    or dying" monitor, and the alerting companion to q159's
    level-anomaly detector (that flags spikes, this flags drifts).

    The q178 exactness pattern: x is the integer epoch-day index and
    y the integer daily count, so n, Σx, Σy, Σxy, Σx², Σy² all fold
    as exact int64; slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²), intercept and
    r² are then formed in ONE fixed double op order and rounded to 9.
    Degenerate keys (a single active day: zero x-variance) report
    NULL slope/intercept/r².  Scale shape: one (key, day) count fold,
    one key-keyed sum fold — two shuffles, no windows, output
    bounded by |keys|."""
    daily = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(
            F.col(key_col).alias("key"),
            F.datediff(
                F.to_date(ts_col), F.lit("1970-01-01")
            ).alias("_x"),
        )
        .agg(F.count(F.lit(1)).alias("_y"))
    )
    s = daily.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
    )
    n = F.col("n_days").cast("double")
    dx = n * F.col("_sxx") - F.col("_sx").cast("double") * F.col("_sx")
    dy = n * F.col("_syy") - F.col("_sy").cast("double") * F.col("_sy")
    num = n * F.col("_sxy") - F.col("_sx").cast("double") * F.col("_sy")
    slope = num / dx
    intercept = (F.col("_sy").cast("double") - slope * F.col("_sx")) / n
    return s.select(
        "key",
        "n_days",
        F.when(dx != 0, F.round(slope, 9)).alias("slope"),
        F.when(dx != 0, F.round(intercept, 9)).alias("intercept"),
        F.when(
            (dx != 0) & (dy != 0), F.round(num * num / (dx * dy), 9)
        ).alias("r2"),
    ).orderBy("key")

"""Similarity search over embedding columns (array<float>).

Two tiers, mirroring what a 100 TB vector corpus needs:

- **Brute-force top-k** (the exactness baseline): a single scan computing
  cosine against a broadcast query vector with native higher-order
  functions, then TakeOrderedAndProject for the top-k — no UDF, no
  collect-side compute, no full sort.
- **Random-hyperplane LSH bucketing** (the scale path): each vector gets a
  b-bit signature from the signs of dot products with fixed random
  hyperplanes; neighbour search only scans matching (or Hamming-adjacent)
  buckets, turning O(N) per query into O(N / 2^b) expected.  The same
  signature column doubles as the blocking key for embedding-cosine
  near-dup joins (pairs within a bucket only).

Dot products on 64-dim arrays stay JVM-side via zip_with/aggregate; for
very wide vectors a vectorized Pandas-UDF path would amortize better, but
64–1024 dims is comfortably in higher-order-function territory.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product (deterministic summation order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _lit_vec(vec) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def brute_force_topk(
    df: DataFrame,
    query_vec,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine against one query vector.  The query is a plan
    literal (broadcast by construction); orderBy+limit compiles to
    TakeOrderedAndProject, so only k rows per partition survive the scan."""
    q = _lit_vec(query_vec)
    emb = _as_double(F.col(vec_col))
    return (
        df.select(
            F.col(id_col),
            F.round(cosine(emb, q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def hyperplane_signature(
    vec_col: Column, dim: int, bits: int = 16, seed: int = 42
) -> Column:
    """b-bit random-hyperplane (SRP) signature as a long.  Hyperplane
    coefficients are a deterministic function of the seed, so signatures are
    stable across runs/engines."""
    rnd = random.Random(seed)
    planes = [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]
    v = _as_double(vec_col)
    bit_terms = [
        F.when(dot(v, _lit_vec(p)) >= 0, F.lit(1 << i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        for i, p in enumerate(planes)
    ]
    sig = bit_terms[0]
    for t in bit_terms[1:]:
        sig = sig.bitwiseOR(t)
    return sig


def lsh_bucketed_topk(
    df: DataFrame,
    query_vec,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
    seed: int = 42,
    max_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: scan only rows whose SRP signature is within
    ``max_hamming`` bits of the query's signature.  With a pre-materialized
    signature column (and the table partitioned/bucketed by it) this prunes
    the scan itself; here the filter still skips the cosine work for
    non-matching rows."""
    dim = len(query_vec)
    rnd = random.Random(seed)
    planes = [[rnd.gauss(0.0, 1.0) for _ in range(bits * 0 + dim)] for _ in range(bits)]
    qsig = 0
    for i, p in enumerate(planes):
        if sum(px * float(qx) for px, qx in zip(p, query_vec)) >= 0:
            qsig |= 1 << i

    sig = hyperplane_signature(F.col(vec_col), dim, bits, seed)
    near = F.bit_count(sig.bitwiseXOR(F.lit(qsig).cast("long"))) <= max_hamming
    q = _lit_vec(query_vec)
    emb = _as_double(F.col(vec_col))
    return (
        df.where(near)
        .select(F.col(id_col), F.round(cosine(emb, q), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.9,
    n_clusters: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cells=None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): cluster the embedding corpus with a coarse
    quantizer, then compare pairs WITHIN each cluster only and drop every
    vector whose cluster holds a more-canonical (lower-id) vector with
    cosine ≥ ``threshold``.

    One row per input vector: (id, cell, dup_of, kept) where ``dup_of``
    is the smallest same-cell id that shadows this vector (NULL when
    kept).  Deterministic end-to-end: the quantizer is
    :func:`ivf.fixed_cells` (seed centroids + one decimal-exact Lloyd
    step, 6-decimal argmax), and the shadowing rule is a pure min over
    6-decimal cosines — an oracle engine replays every decision.

    Scale shape: pairwise work is confined to cells — one equi-join
    shuffle keyed by cell, O(Σ|cell|²) comparisons instead of O(N²);
    production corpora size ``n_clusters`` so cells fit comfortably in a
    task (the paper runs 50k clusters over 5B embeddings).  The
    per-pair cosine reads the materialized vector+norm columns, so each
    norm is computed once per vector, not once per pair."""
    from dudb_spark.pipeline.ivf import fixed_cells

    assigned, _ = cells or fixed_cells(df, n_clusters, vec_col, id_col)
    a = assigned.select(
        "cell",
        F.col(id_col).alias("id_a"),
        F.col("_v").alias("v_a"),
        F.col("_nv").alias("n_a"),
    )
    b = assigned.select(
        "cell",
        F.col(id_col).alias("id_b"),
        F.col("_v").alias("v_b"),
        F.col("_nv").alias("n_b"),
    )
    cos = F.round(
        dot(F.col("v_a"), F.col("v_b")) / (F.col("n_a") * F.col("n_b")), 6
    )
    shadows = (
        a.join(b, "cell")
        .where(F.col("id_a") < F.col("id_b"))
        .where(cos >= threshold)
        .groupBy("id_b")
        .agg(F.min("id_a").alias("dup_of"))
        .withColumnRenamed("id_b", id_col)
    )
    return (
        assigned.select(id_col, F.col("cell").cast("long").alias("cell"))
        .join(shadows, id_col, "left")
        .select(
            id_col,
            "cell",
            "dup_of",
            F.col("dup_of").isNull().alias("kept"),
        )
    )


def cosine_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via SRP blocking: only pairs
    sharing a signature bucket are compared (one equi-join shuffle keyed by
    the signature), then exact cosine filters by threshold."""
    from dudb_spark.plans.layout import ensure_min_parallelism

    dim_row = df.select(F.size(vec_col).alias("d")).first()
    dim = dim_row["d"]
    # bits×dim multiply-adds per row dwarf the scan — don't let a narrow
    # input serialize the signature stage
    df = ensure_min_parallelism(df)
    sig = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        hyperplane_signature(F.col(vec_col), dim, bits, seed).alias("sig"),
    )
    a = sig.select("sig", F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    b = sig.select("sig", F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    cos = cosine(_as_double(F.col("v_a")), _as_double(F.col("v_b")))
    return (
        a.join(b, "sig")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(cos, 6).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def label_outliers(
    emb: DataFrame,
    k: int = 3,
    n_buckets: int = 8,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-space outlier detection — the quality/mislabel filter of
    an embedding pipeline (SemDeDup's inverse: there the most SIMILAR
    vectors inside a cluster are dropped, here the LEAST similar to
    their own group are surfaced for review).

    Per-label centroids use exact decimal sums (the ``fixed_cells``
    trick — identical doubles in any engine/partitioning), each vector
    scores ``round(cos(v, centroid[label]), 6)``, and the ``k`` lowest
    per label come back as ``(label, vec_id, cos_centroid, rank)``.

    Scale shape: the centroid pass is one grouped aggregate with
    map-side partials (labels × dim sums).  Bottom-k selection is
    TWO-PHASE: a row_number window per (label, id-hash bucket) — bounded
    partitions, never one task per label — keeps each bucket's k
    smallest (any global bottom-k member is bottom-k in its bucket, so
    this is exact), then the k smallest of the n_buckets × k survivors
    per label.  No global per-label sort anywhere."""
    from pyspark.sql.window import Window

    from dudb_spark.pipeline.ivf import _dbl

    v = _as_double(F.col(vec_col))
    base = emb.select(
        F.col(id_col).alias("vec_id"),
        F.col(label_col).alias("label"),
        v.alias("_v"),
        F.sqrt(dot(v, v)).alias("_nv"),
    ).persist()
    head = base.select("_v").first()
    if head is None:  # no rows: empty result, same schema/types
        empty = base.select(
            "label",
            "vec_id",
            F.lit(0.0).alias("cos_centroid"),
            F.lit(1).alias("rank"),
        ).where(F.lit(False))
        base.unpersist()
        return empty
    dim = len(head["_v"])
    mean_cols = [
        # NB: bracket indexing is 0-based in Spark SQL (element_at is the
        # 1-based accessor)
        F.expr(
            f"CAST(SUM(CAST(_v[{i}] AS DECIMAL(27,18))) AS DOUBLE)"
            f" / COUNT(1) AS m{i}"
        )
        for i in range(dim)
    ]
    cents = {
        r["label"]: [r[f"m{i}"] for i in range(dim)]
        for r in base.groupBy("label").agg(*mean_cols).collect()
    }

    import math

    def vec_lit(c: list[float]) -> str:
        return "array(" + ",".join(_dbl(float(x)) for x in c) + ")"

    def pynorm(c: list[float]) -> float:
        acc = 0.0
        for x in c:
            acc += x * x
        return math.sqrt(acc)

    def lbl_lit(lbl) -> str:
        # int and string labels both supported; strings are escaped as
        # SQL literals ('' doubling) so arbitrary label text is safe
        if isinstance(lbl, bool) or not isinstance(lbl, (int, float)):
            return "'" + str(lbl).replace("'", "''") + "'"
        return repr(lbl)

    # centroid rides as a per-label array literal and the dot product is
    # ONE sequential fold (same IEEE order as the oracle's
    # list_dot_product) — an unrolled per-element sum was a 640-term
    # codegen monster at dim 64 × 10 labels
    by_label = sorted(cents.items(), key=lambda kv: str(kv[0]))
    cent_case = "CASE " + " ".join(
        f"WHEN label = {lbl_lit(lbl)} THEN {vec_lit(c)}"
        for lbl, c in by_label
    ) + " END"
    nc_case = "CASE " + " ".join(
        f"WHEN label = {lbl_lit(lbl)} THEN {_dbl(pynorm(c))}"
        for lbl, c in by_label
    ) + " END"
    score = (
        f"round(aggregate(zip_with(_v, {cent_case}, (x, y) -> x * y), "
        f"CAST(0.0 AS DOUBLE), (a, t) -> a + t) / (_nv * ({nc_case})), 6)"
    )
    scored = base.select(
        "label", "vec_id", F.expr(score).alias("cos_centroid")
    )
    w1 = Window.partitionBy(
        "label", F.pmod(F.xxhash64("vec_id"), F.lit(n_buckets))
    ).orderBy("cos_centroid", "vec_id")
    cand = scored.withColumn("_r", F.row_number().over(w1)).where(
        F.col("_r") <= k
    )
    w2 = Window.partitionBy("label").orderBy("cos_centroid", "vec_id")
    out = (
        cand.select("label", "vec_id", "cos_centroid")
        .withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        # tiny (labels × k rows): materialize eagerly so the cast-vector
        # cache can be released without re-exposing the element_at
        # re-evaluation hazard (same lifecycle as pq_encode)
        .localCheckpoint(eager=True)
    )
    base.unpersist()
    return out


def centroid_separation(
    df: DataFrame,
    vec_col: str = "embedding",
    group_col: str = "label",
    scale_bits: int = 20,
) -> DataFrame:
    """Embedding-space class-separability audit: the L2 distance
    between every pair of group centroids — the first question about
    a labeled/sourced embedding corpus (are the classes separated at
    all? did two sources collapse onto each other?), feeding dataset
    cards and drift review alongside q145's token-space monitor.

    Exactness discipline: components quantize to integers by a
    POWER-OF-TWO scale (x·2^scale_bits is an exact double op on any
    float32, so the rounded int is engine-identical), per-group
    per-dimension sums fold as exact int64, and each squared centroid
    difference quantizes to nano-units before the dimension sum — so
    the distance is order- and engine-exact (the q145/q173 nano-int
    discipline).  Scale shape: ONE posexplode scan folding to a
    groups×dims frame; the pairwise stage joins that bounded frame to
    itself on the dimension key (g_a < g_b) — work is
    |groups|²×dims, corpus-size-independent; nothing all-pairs over
    rows.  NULL vectors/groups drop.

    Returns (group_a, group_b, n_a, n_b, dist_sq_nano, dist) per
    unordered pair, dist = sqrt(dist_sq_nano/1e9) rounded to 6."""
    scale = float(1 << scale_bits)
    base = (
        df.where(F.col(vec_col).isNotNull()
                 & F.col(group_col).isNotNull())
        .select(
            F.col(group_col).alias("g"),
            F.posexplode(F.transform(
                vec_col,
                lambda x: F.round(x.cast("double") * F.lit(scale))
                .cast("long"),
            )).alias("dim", "q"),
        )
    )
    sums = base.groupBy("g", "dim").agg(
        F.count(F.lit(1)).alias("n"), F.sum("q").alias("s")
    )
    a = sums.select(F.col("g").alias("group_a"), "dim",
                    F.col("n").alias("n_a"), F.col("s").alias("s_a"))
    b = sums.select(F.col("g").alias("group_b"), "dim",
                    F.col("n").alias("n_b"), F.col("s").alias("s_b"))
    diff = (
        a.join(b, "dim")
        .where(F.col("group_a") < F.col("group_b"))
        .select(
            "group_a", "group_b", "n_a", "n_b",
            # explicit d*d, never pow(d, 2): libm pow is not
            # guaranteed bit-identical across engines
            F.round(
                ((F.col("s_a") / F.col("n_a")
                  - F.col("s_b") / F.col("n_b")) / F.lit(scale))
                * ((F.col("s_a") / F.col("n_a")
                    - F.col("s_b") / F.col("n_b")) / F.lit(scale))
                * F.lit(1e9)
            ).cast("long").alias("term_nano"),
        )
    )
    return (
        diff.groupBy("group_a", "group_b")
        .agg(
            # n is constant across dims within a group (fixed-width
            # vectors); max() just picks that constant
            F.max("n_a").alias("n_a"),
            F.max("n_b").alias("n_b"),
            F.sum("term_nano").alias("dist_sq_nano"),
        )
        .select(
            "group_a", "group_b", "n_a", "n_b", "dist_sq_nano",
            F.round(
                F.sqrt(F.col("dist_sq_nano") / F.lit(1e9)), 6
            ).alias("dist"),
        )
        .orderBy("group_a", "group_b")
    )


def dim_stats(
    df: DataFrame,
    vec_col: str = "embedding",
    scale_bits: int = 20,
) -> DataFrame:
    """Per-dimension corpus statistics of an embedding column —
    (dim, n, mean, std, vmin, vmax) — the standardization audit run
    before whitening/normalizing features or diagnosing a collapsed
    dimension (std ≈ 0 means the encoder wasted a coordinate).

    Exactness: the q180 discipline — components quantize by a
    power-of-two scale (exact on float32), n/Σq/Σq² fold as exact
    int64 (Σq² stays under 2^53 for corpora up to ~2^15 rows at
    64 dims and unit-scale values; beyond that the double cast is the
    same value in both engines but no longer integer-exact —
    documented, not hit at gate scale), and mean/std/min/max are
    formed from those integers in the same operation order both
    engines; min/max divide by a power of two, so they are EXACT
    doubles.  Scale shape: ONE posexplode scan folding to a dims-row
    frame — corpus-size-bounded output, no joins at all."""
    scale = float(1 << scale_bits)
    base = df.where(F.col(vec_col).isNotNull()).select(
        F.posexplode(
            F.transform(
                vec_col,
                lambda x: F.round(x.cast("double") * F.lit(scale))
                .cast("long"),
            )
        ).alias("dim", "q")
    )
    agg = base.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("_s"),
        F.sum(F.col("q") * F.col("q")).alias("_ss"),
        F.min("q").alias("_mn"),
        F.max("q").alias("_mx"),
    )
    m = F.col("_s").cast("double") / F.col("n")
    var_q = F.col("_ss").cast("double") / F.col("n") - m * m
    return agg.select(
        "dim",
        "n",
        F.round(m / F.lit(scale), 9).alias("mean"),
        F.round(
            F.sqrt(F.greatest(var_q, F.lit(0.0))) / F.lit(scale), 9
        ).alias("std"),
        (F.col("_mn") / F.lit(scale)).alias("vmin"),
        (F.col("_mx") / F.lit(scale)).alias("vmax"),
    ).orderBy("dim")

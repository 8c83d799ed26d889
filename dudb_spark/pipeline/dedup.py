"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale design (the whole point — these run on 100 TB corpora):

- **Exact**: hash-groupBy on a normalized fingerprint.  One shuffle on the
  16-byte hash; map-side partial aggregation collapses most groups early.
- **MinHash+LSH**: signatures are computed scan-side with native
  higher-order functions (xxhash64 + affine permutations — no Python, no
  UDF).  Banding turns the quadratic all-pairs problem into an equi-join on
  (band_idx, band_hash): candidate generation is ONE shuffle whose keys are
  band buckets, and only bucket-mates are paired.  Bucket skew (a boilerplate
  band shared by millions of docs) is the classic hazard — ``max_bucket``
  caps pathological buckets (AQE skew-join handles moderate skew).
- **SimHash**: 64-bit signature via per-bit majority vote, computed with
  higher-order functions; near-dup = signatures within Hamming distance k,
  found by the 4-block pigeonhole trick (equi-join per block, not a cross
  join).
- **n-gram Jaccard**: exact verification primitive used on LSH candidates —
  never on all pairs.
- **Embedding near-dup**: delegates to similarity.py's LSH bucketing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dudb_spark.pipeline.text import fingerprint, tokens
from dudb_spark.plans.layout import ensure_min_parallelism

# Mersenne prime 2^61-1: the classic universal-hash modulus; keeps affine
# permutation values positive in signed-64 arithmetic.
_P = (1 << 61) - 1
# Horner-fold constants for the oracle-reproducible hash variants.
_POLY_B = 257
_POLY_M = (1 << 31) - 1


def exact_duplicates(df: DataFrame, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup groups: one row per distinct normalized content with the
    deterministic canonical id (min id) and copy count."""
    return (
        df.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-token shingles of the text (token-level w-shingling)."""
    t = tokens(text)
    n = F.size(t)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(t, i, k)))
    )


def shingle_hashes(text: Column, k: int = 3, seed: int = 42) -> Column:
    """Distinct 32-bit shingle hashes (array<long>) — the MinHash base.

    Materialize this ONCE (its own select/projection) before fanning out to
    the per-permutation mins: referencing it as a plain column keeps
    Catalyst from inlining the whole shingling expression into each of the
    ``num_perm`` min computations (CollapseProject does not merge a
    multiply-referenced non-trivial alias, so the boundary holds)."""
    return F.array_distinct(
        F.transform(
            shingles(text, k),
            lambda s: F.xxhash64(s, F.lit(seed)).bitwiseAND(F.lit(0xFFFFFFFF)),
        )
    )


def poly_token_hash_array(text: Column) -> Column:
    """Per-token Horner hash ``h = (h*B + code) mod M`` (B=257, M=2^31-1)
    — plain modular arithmetic an oracle engine can restate, unlike
    xxhash64.  The char walk runs on lambda VARIABLES (bound per element),
    not re-evaluated expressions, so it stays linear."""
    return F.transform(tokens(text), lambda t: _horner(t, _POLY_B))


def poly_shingle_hashes_from(th: Column, k: int = 3) -> Column:
    """Engine-reproducible MinHash base from a BOUND token-hash attribute:
    shingle hash = Horner fold over the k member token hashes.  Hashing
    tokens once and combining (O(chars + k·positions)) measured 4× cheaper
    than char-folding every shingle string (O(k·chars) with per-shingle
    string allocs).  ``th`` must be its own projection — inlining it here
    would re-evaluate the tokenization per position."""
    n = F.size(th)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
            lambda i: F.aggregate(
                F.slice(th, i, k),
                F.lit(0).cast("long"),
                lambda acc, v: F.pmod(acc * _POLY_B + v, F.lit(_POLY_M)),
            ),
        )
    )


def _perm_coeffs(
    num_perm: int, seed: int, mod: int
) -> list[tuple[int, int]]:
    """The (a_i, b_i) affine-map coefficient stream — ONE definition
    shared by the HOF and aggregate signature paths and replayed verbatim
    by the SQL oracles (same seeded generator, same draw order)."""
    import random

    rnd = random.Random(seed)
    coeff_cap = min(1 << 30, mod)
    return [
        (rnd.randrange(1, coeff_cap), rnd.randrange(0, coeff_cap))
        for _ in range(num_perm)
    ]


def minhash_signature(
    base_hashes: Column, num_perm: int = 64, seed: int = 42, mod: int = _P
) -> Column:
    """MinHash signature as an array<long> of length ``num_perm`` over a
    pre-computed base-hash array (see :func:`shingle_hashes`).

    Permutation i applies the Carter-Wegman affine map ``(a_i*h + b_i) mod
    P``.  THE MODULUS MUST SIT WELL BELOW ``max(a) * max(h)``: if the
    products rarely exceed it, the map is order-PRESERVING and every
    permutation selects the same argmin — signatures degenerate to "same
    min shingle?" and near-dup recall collapses to exact-dup (a measured
    failure with 31-bit base hashes against the 2^61-1 modulus).  Defaults
    serve 32-bit xxhash64 bases; 31-bit poly bases pass ``mod=2^31-1``.
    Operand widths keep every product under 2^62 (Spark 4 runs ANSI mode —
    long overflow throws).  All JVM-side.
    """
    # closure factory, NOT `lambda h, a=a, b=b:` — pyspark's HOF arity
    # inspection reads default args as parameters and rejects the
    # 3-parameter lambda (found the day a stream first used this path)
    def _affine(a: int, b: int):
        return lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(mod))

    mins = [
        F.array_min(F.transform(base_hashes, _affine(a, b)))
        for a, b in _perm_coeffs(num_perm, seed, mod)
    ]
    return F.array(*mins)


def poly_shingle_base(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
    materialize: bool = True,
) -> DataFrame:
    """The poly MinHash base: one row per doc with the distinct
    hashed-shingle set (``id``, ``base: array<long>``).

    ``materialize=True`` ``localCheckpoint``s it — the right call when the
    frame is re-read (signatures AND exact-Jaccard verification in
    :func:`minhash_verified_pairs`): it is the most expensive projection of
    the sketch pipeline (tokenize + per-char Horner folds), and pinning it
    means the text is tokenized ONCE per doc for the whole
    candidates→verify pipeline (previously verification re-shingled the
    text from scratch).  A candidates-only caller reads it once — pass
    ``materialize=False`` and skip the write barrier.
    """
    df = ensure_min_parallelism(df)
    th = df.select(
        F.col(id_col).alias("id"),
        poly_token_hash_array(F.col(text_col)).alias("th"),
    )
    base = th.select(
        "id", poly_shingle_hashes_from(F.col("th"), shingle_k).alias("base")
    )
    return base.localCheckpoint() if materialize else base


def minhash_band_index(
    df: DataFrame | None,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    base: DataFrame | None = None,
) -> DataFrame:
    """The LSH band index of a corpus: one row per (doc, band) —
    ``(id, sig, band, bucket)``.  This is the PERSISTABLE ingest
    artifact for incremental dedup: write it (partitioned by band)
    when a corpus lands, and a future shard is deduped against history
    by banding ONLY the new docs and equi-joining the index — history
    is never re-shingled (:func:`incremental_verified_pairs`).  The
    same unchanged-work-is-skipped contract the engine's incremental
    metadata scan makes (operators/ingest.merge_scan; reference
    analyze.go:104–123), applied to near-dup detection.

    Two corpora band-joined this way must share ``num_perm``, ``bands``,
    ``shingle_k``, ``seed`` and ``hash_fn`` — the coefficients are
    derived from the seed, so equal parameters ⇒ comparable buckets.
    """
    assert num_perm % bands == 0
    assert hash_fn in ("xxhash64", "poly")
    r = num_perm // bands

    # staged projections: base hashes once per row, then the signature —
    # without the boundary every permutation would re-shingle the text
    if base is not None:
        assert hash_fn == "poly", "precomputed bases are poly-hash frames"
    elif hash_fn == "xxhash64":
        # signatures cost far more per row than the scan — floor the
        # partition count so a narrow input doesn't serialize the sketch
        base = ensure_min_parallelism(df).select(
            F.col(id_col).alias("id"),
            shingle_hashes(F.col(text_col), shingle_k, seed).alias("base"),
        )
    else:
        # read exactly once (the sig aggregate below is checkpointed), so
        # no write barrier
        base = poly_shingle_base(df, text_col, id_col, shingle_k,
                                 materialize=False)
    # 31-bit poly bases need the 31-bit modulus (see minhash_signature on
    # order-preserving degeneration); xxhash64's 32-bit bases use 2^61-1
    sig_mod = _P if hash_fn == "xxhash64" else _POLY_M
    # Signature via explode + min-AGGREGATES, not the per-row HOF
    # (minhash_signature): transform/array_min lambdas run interpreted,
    # while min(pmod(a*h+b)) aggregates are whole-stage-codegen JVM code —
    # measured ~2× on the full pipeline.  A doc's exploded hashes stay in
    # its partition, so the map-side partial agg collapses to ONE row per
    # doc before the exchange; num_perm must stay under codegen.maxFields
    # (100) for the codegen win to hold.  Values are identical: the same
    # affine maps over the same base multiset.  explode_outer keeps
    # empty-shingle docs as an all-NULL signature, matching
    # array_min(empty) = NULL in the HOF form.
    coeffs = _perm_coeffs(num_perm, seed, sig_mod)
    ex = base.select("id", F.explode_outer("base").alias("_h"))
    sig = (
        ex.groupBy("id")
        .agg(
            *[
                F.min(
                    F.pmod(F.lit(a) * F.col("_h") + F.lit(b), F.lit(sig_mod))
                ).alias(f"_s{i}")
                for i, (a, b) in enumerate(coeffs)
            ]
        )
        .select(
            "id",
            F.array(*[F.col(f"_s{i}") for i in range(num_perm)]).alias("sig"),
        )
        # one row per doc — pinning it is cheap and saves the three
        # downstream scans (bucket sizes, both join sides) re-running the
        # explode+aggregate.  (The OLD narrow HOF chain measured 2× slower
        # when cached: its recompute was pure CPU with no exchange.  The
        # aggregate chain has an exchange per rescan, flipping the trade.)
        .localCheckpoint()
    )

    def band_bucket(b):
        sl = F.slice(F.col("sig"), b * r + 1, r)
        if hash_fn == "xxhash64":
            return F.xxhash64(F.concat_ws(",", sl))
        # Horner fold over the band's signature values: acc < 2^31,
        # acc*B + v < 2^62 — safe in ANSI long arithmetic
        return F.aggregate(
            sl,
            F.lit(0).cast("long"),
            lambda acc, v: F.pmod(acc * _POLY_B + v, F.lit(_POLY_M)),
        )

    return sig.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), band_bucket(b).alias("bucket")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    seed: int = 42,
    max_bucket: int = 1000,
    hash_fn: str = "xxhash64",
    base: DataFrame | None = None,
) -> DataFrame:
    """LSH candidate pairs: (id_a, id_b, est_jaccard) with id_a < id_b.

    rows-per-band r = num_perm/bands; two docs collide iff some band of
    their signatures is identical.  est_jaccard = matching signature
    positions / num_perm, computed only for candidates.

    ``hash_fn``: ``"xxhash64"`` (native JVM hash) or ``"poly"`` (Horner
    modular fold — same sketch structure, but every hash is reproducible by
    an oracle engine, making the whole pipeline value-checkable).

    ``base``: a precomputed :func:`poly_shingle_base` frame (poly path
    only) so a candidates→verify pipeline shingles the corpus once.
    """
    banded = minhash_band_index(
        df, text_col, id_col, num_perm, bands, shingle_k, seed,
        hash_fn, base,
    )
    # NB: the self-join below re-scans the index lineage, but caching it
    # here measures ~2x SLOWER (the materialization barrier defeats AQE
    # and pipelining); recompute-in-place wins for signature-sized data

    # cap pathological buckets (boilerplate shingle sets) before pairing
    bucket_sizes = banded.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("_n")
    )
    banded = banded.join(
        bucket_sizes.where(F.col("_n") <= max_bucket), ["band", "bucket"]
    )

    left = banded.select("band", "bucket", F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
    right = banded.select("band", "bucket", F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
    pairs = (
        left.join(right, ["band", "bucket"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .dropDuplicates(["id_a", "id_b"])
    )

    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda eq: eq,
            )
        ).cast("double")
        / F.lit(float(num_perm))
    )
    return pairs.select("id_a", "id_b", F.round(est, 6).alias("est_jaccard"))


def minhash_verified_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    seed: int = 42,
    max_bucket: int = 1000,
    min_est: float = 0.5,
    min_jaccard: float = 0.3,
) -> DataFrame:
    """MinHash+LSH candidates verified with EXACT Jaccard, shingling the
    corpus once: the :func:`poly_shingle_base` frame is checkpointed and
    shared between the signature aggregate and the verification joins, and
    the exact Jaccard runs on the hashed-shingle sets themselves
    (``|A∩B| / |A∪B|`` over the distinct poly hashes) instead of
    re-materializing string shingles.  Set-identical up to 31-bit hash
    collisions — and the oracle replays the same hashes, so the value
    contract is exact either way.

    Scale shape: candidate generation is the banding equi-join (never
    all-pairs); verification joins the pair list back to the base frame
    twice — both joins are keyed on doc id and touch only candidate docs.
    Returns (id_a, id_b, jaccard) with ``jaccard >= min_jaccard``.
    """
    base = poly_shingle_base(df, text_col, id_col, shingle_k)
    cand = minhash_candidates(
        df,
        text_col,
        id_col,
        num_perm=num_perm,
        bands=bands,
        shingle_k=shingle_k,
        seed=seed,
        max_bucket=max_bucket,
        hash_fn="poly",
        base=base,
    ).where(F.col("est_jaccard") >= min_est)
    a = base.select(F.col("id").alias("id_a"), F.col("base").alias("b_a"))
    b = base.select(F.col("id").alias("id_b"), F.col("base").alias("b_b"))
    inter = F.size(F.array_intersect("b_a", "b_b")).cast("double")
    union = F.size(F.array_union("b_a", "b_b")).cast("double")
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .select("id_a", "id_b", F.round(inter / union, 6).alias("jaccard"))
        .where(F.col("jaccard") >= min_jaccard)
    )


def incremental_verified_pairs(
    new_df: DataFrame,
    old_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 32,
    bands: int = 8,
    shingle_k: int = 3,
    seed: int = 42,
    max_bucket: int = 1000,
    min_est: float = 0.5,
    min_jaccard: float = 0.3,
    index: DataFrame | None = None,
) -> DataFrame:
    """Dedup a NEW shard against an ALREADY-INGESTED corpus — the
    continuous-crawl operation: band only the new docs, equi-join the
    history's persisted band index, verify candidates with exact
    Jaccard.  History is never re-shingled: signature work is
    proportional to the NEW shard, the join to band collisions, and
    the verify step re-shingles only the old docs that actually
    collided (a candidate-bounded semi-join back to the old corpus) —
    vs re-running self-dedup over old ∪ new, which re-pays the whole
    history every shard.  The incremental contract of
    operators/ingest.merge_scan (reference analyze.go:104–123) applied
    to near-dup detection.

    ``index``: the persisted :func:`minhash_band_index` of the old
    corpus (poly path).  Built from ``old_df`` when absent; pass the
    loaded artifact in production.  Parameters must match the index.

    Returns ``(new_id, old_id, est_jaccard, jaccard)`` with
    ``jaccard >= min_jaccard`` — every hash replayable in SQL, so the
    whole incremental pipeline is oracle-checkable."""
    new_base = poly_shingle_base(new_df, text_col, id_col, shingle_k)
    if index is None:
        index = minhash_band_index(
            old_df, text_col, id_col, num_perm, bands, shingle_k, seed,
            hash_fn="poly",
        )
    new_banded = minhash_band_index(
        None, text_col, id_col, num_perm, bands, shingle_k, seed,
        hash_fn="poly", base=new_base,
    )
    # boilerplate-bucket cap on the HISTORY side (the side whose bucket
    # population is corpus-sized; the new shard inherits the protection
    # through the join)
    sizes = index.groupBy("band", "bucket").agg(
        F.count(F.lit(1)).alias("_n")
    )
    idx = index.join(
        sizes.where(F.col("_n") <= max_bucket), ["band", "bucket"]
    ).select(
        "band", "bucket",
        F.col("id").alias("old_id"), F.col("sig").alias("sig_b"),
    )
    pairs = (
        new_banded.select(
            "band", "bucket",
            F.col("id").alias("new_id"), F.col("sig").alias("sig_a"),
        )
        .join(idx, ["band", "bucket"])
        .where(F.col("new_id") != F.col("old_id"))
        .select("new_id", "old_id", "sig_a", "sig_b")
        .dropDuplicates(["new_id", "old_id"])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"),
                           lambda x, y: x == y),
                lambda eq: eq,
            )
        ).cast("double")
        / F.lit(float(num_perm))
    )
    cand = pairs.select(
        "new_id", "old_id", F.round(est, 6).alias("est_jaccard")
    ).where(F.col("est_jaccard") >= min_est)
    # verify: shingle ONLY the colliding old docs (candidate-bounded).
    # The distinct candidate-id build side is explicitly broadcast: it
    # is bounded by the band collisions that survived the est filter
    # (near-dup-sized, orders below the corpus), while the probe side is
    # the OLD CORPUS scan — the static planner picked a SortMergeJoin
    # here, exchanging + sorting the full old corpus text by doc_id just
    # to probe a tiny id set (guide §3.1; r12 plan audit: Exchange+Sort
    # over the documents scan feeding a LeftSemi SMJ).
    old_hit = old_df.join(
        F.broadcast(cand.select(F.col("old_id").alias(id_col)).distinct()),
        id_col, "left_semi",
    )
    ob = poly_shingle_base(old_hit, text_col, id_col, shingle_k,
                           materialize=False)
    a = new_base.select(F.col("id").alias("new_id"),
                        F.col("base").alias("b_a"))
    b = ob.select(F.col("id").alias("old_id"), F.col("base").alias("b_b"))
    inter = F.size(F.array_intersect("b_a", "b_b")).cast("double")
    union = F.size(F.array_union("b_a", "b_b")).cast("double")
    return (
        cand.join(a, "new_id")
        .join(b, "old_id")
        .select(
            "new_id", "old_id", "est_jaccard",
            F.round(inter / union, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= min_jaccard)
    )


def similarity_join_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    shingle_k: int = 3,
    base: DataFrame | None = None,
) -> DataFrame:
    """EXACT set-similarity self-join by prefix filtering: EVERY pair
    with Jaccard ≥ threshold over the hashed-shingle sets — zero false
    negatives, the guarantee the probabilistic family trades away
    (MinHash banding misses a J=0.5 pair with ~(1−0.5^r)^b
    probability; this operator's candidate set provably contains all
    qualifying pairs).  All-Pairs/PPJoin prefix filtering (Bayardo et
    al. WWW 2007; Xiao et al. WWW 2008): order every set by one GLOBAL
    rarest-first key; if J(x,y) ≥ t, x and y must share an element
    among each one's first ``|x| − ⌈t·|x|⌉ + 1`` elements — so only
    prefix tokens are indexed and the candidate join is an equi-join
    on them, never all-pairs.

    Engine-exactness: the threshold enters as the rational
    ``⌈t·1e6⌉/1e6``, so the prefix length ``n − (tn·n + 999999) div
    1e6 + 1`` and the verification ``|∩|·1e6 ≥ tn·|∪|`` are pure int64
    — a float ``ceil(0.7·n)`` can land on the wrong integer
    (0.7·10 → 7.000…1 → 8) and silently SHORTEN the prefix into a
    false negative.  The global order key is ``df·2³¹ + h`` (document
    frequency, then hash) — one sortable int64, identical in any
    engine.

    Scale shape: one (shingle → df) fold, one equi-join back, a
    per-doc sort of its own shingle set (scan-side, no window), the
    prefix equi-join, and id-keyed verification joins bounded by the
    candidate set.  Returns (id_a, id_b, jaccard ≥ threshold).

    The reference has no similarity surface; this completes the dedup
    family (SURVEY.md §7 step 9) with its only exact-recall member."""
    tn = int(-(-threshold * 1_000_000 // 1))  # ceil(t·1e6)
    if not 0 < tn <= 1_000_000:
        raise ValueError("threshold must be in (0, 1]")
    if base is None:
        base = poly_shingle_base(df, text_col, id_col, shingle_k)
    ex = base.select("id", F.explode("base").alias("h"))
    freq = ex.groupBy("h").agg(F.count(F.lit(1)).alias("_df"))
    keyed = ex.join(freq, "h").select(
        "id", (F.col("_df") * F.lit(1 << 31) + F.col("h")).alias("k")
    )
    sets = keyed.groupBy("id").agg(
        F.sort_array(F.collect_list("k")).alias("ks")
    )
    n = F.size("ks")
    # prefix length n − ⌈t·n⌉ + 1, all integer: ⌈tn·n/1e6⌉ via div
    plen = (
        n - F.expr(f"(size(ks) * {tn} + 999999) div 1000000").cast("int")
        + F.lit(1)
    )
    pref = sets.select(
        "id", n.alias("nk"),
        F.posexplode(F.slice("ks", 1, F.greatest(plen, F.lit(0))))
        .alias("p", "k"),
    )
    # LENGTH FILTER (All-Pairs/PPJoin): J(x,y) ≥ t forces
    # min(|x|,|y|) ≥ t·max(|x|,|y|) (|∩| ≤ min, |∪| ≥ max) — a
    # provably-redundant integer predicate on the candidate pair that
    # prunes size-mismatched pairs BEFORE the fat shingle arrays are
    # shuffled through the verification joins (r11: the verify stage
    # carried 299k candidate pairs × ~52-element int64 arrays and
    # dominated q168's time; the filter costs one int compare per
    # candidate row).  Verification below is unchanged, so the result
    # set is identical by the pigeonhole/length lemmas.
    #
    # POSITIONAL FILTER (PPJoin, Xiao et al. WWW 2008): a shared token
    # at 0-based sorted positions (pa, pb) bounds the overlap —
    # common-before ≤ min(pa, pb) (both sides' smaller elements),
    # common-from-here-on ≤ min(|x|−pa, |y|−pb) — so
    # O ≤ ub = min(pa,pb) + min(|x|−pa, |y|−pb) for EVERY shared
    # prefix token, and J ≥ t ⟺ O·(1e6+tn) ≥ tn·(|x|+|y|) forces
    # min(ub)·(1e6+tn) ≥ tn·(|x|+|y|).  The min-ub aggregation REPLACES
    # the old dropDuplicates (same one pair-keyed exchange, two extra
    # grouping ints), so the extra recall-safe pruning is free of new
    # shuffles; all arithmetic int64 (ub ≤ |x|+|y|, ×(1e6+tn) < 2^62
    # for sets under ~1e6 shingles).
    ub = F.least("_pa", "_pb") + F.least(
        F.col("_na") - F.col("_pa"), F.col("_nb") - F.col("_pb")
    )
    cand = (
        pref.select(F.col("id").alias("id_a"), F.col("nk").alias("_na"),
                    F.col("p").alias("_pa"), "k")
        .join(
            pref.select(F.col("id").alias("id_b"),
                        F.col("nk").alias("_nb"),
                        F.col("p").alias("_pb"), "k"),
            "k",
        )
        .where(
            (F.col("id_a") < F.col("id_b"))
            & (F.least("_na", "_nb") * F.lit(1_000_000)
               >= F.lit(tn) * F.greatest("_na", "_nb"))
        )
        .groupBy("id_a", "id_b", "_na", "_nb")
        .agg(F.min(ub).alias("_ub"))
        .where(
            F.col("_ub") * F.lit(1_000_000 + tn)
            >= F.lit(tn) * (F.col("_na") + F.col("_nb"))
        )
        .select("id_a", "id_b")
    )
    a = base.select(F.col("id").alias("id_a"), F.col("base").alias("b_a"))
    b = base.select(F.col("id").alias("id_b"), F.col("base").alias("b_b"))
    inter = F.size(F.array_intersect("b_a", "b_b")).cast("long")
    union = F.size(F.array_union("b_a", "b_b")).cast("long")
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .where(inter * F.lit(1_000_000) >= F.lit(tn) * union)
        .select(
            "id_a", "id_b",
            F.round(inter.cast("double") / union.cast("double"), 6)
            .alias("jaccard"),
        )
    )


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_k: int = 3,
) -> DataFrame:
    """Exact Jaccard verification of candidate pairs (two broadcast-friendly
    joins back to the shingle sets; only candidates pay the set cost).
    The shingle frame is semi-join-pruned to docs that appear in any pair,
    so the expensive shingling runs over the candidate set, not the corpus."""
    ids = (
        pairs.select(F.col("id_a").alias("id"))
        .unionByName(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    sh = (
        ensure_min_parallelism(df.select(F.col(id_col).alias("id"), F.col(text_col)))
        .join(ids, "id", "left_semi")
        .select("id", shingles(F.col(text_col), shingle_k).alias("sh"))
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(inter / union, 6).alias("jaccard"),
        )
    )


def fingerprint_overlap_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    min_fraction: float = 0.5,
    max_bucket: int = 100,
) -> DataFrame:
    """Copy-detection pairs by winnowed-fingerprint overlap (the MOSS
    pipeline): ``overlap = n_shared / min(|fps_a|, |fps_b|)`` ≥
    ``min_fraction``.  An absolute ``min_shared`` floor alone is useless on
    real corpora — short common char-grams give most pairs a few shared
    prints (measured: 117k of 125k possible pairs at 500 docs with
    min_shared=2), while the containment fraction isolates actual copies.

    Scale shape mirrors LSH banding: explode fingerprints, ONE equi-join on
    the fingerprint value, count per pair; a boilerplate fingerprint shared
    by a huge doc population is capped (``max_bucket``) exactly like a hot
    LSH bucket.  Unlike the xxhash64 sketches, the rolling-hash arithmetic
    is engine-reproducible, so this pipeline is value-exact against a SQL
    oracle."""
    from dudb_spark.pipeline.text import winnow_df

    # (id, fp) is already unique: winnow_df emits array_distinct arrays and
    # id_col is the documents PK — no dedup shuffle needed on the fattest
    # intermediate of the pipeline
    fps = winnow_df(
        ensure_min_parallelism(df.select(F.col(id_col), F.col(text_col))),
        text_col=text_col,
        id_col=id_col,
        k=k,
        window=window,
        exploded=True,
    )
    sizes = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("_n"))
    capped = fps.join(sizes.where(F.col("_n") <= max_bucket), "fp").select("id", "fp")
    # the containment denominator counts only fingerprints that SURVIVE the
    # boilerplate cap: otherwise a corpus-wide common fingerprint would
    # depress every doc's achievable overlap (measured: zero recall at 10×
    # corpus size with a pre-cap denominator and a fixed cap)
    counts = capped.groupBy("id").agg(F.count(F.lit(1)).alias("n_fp"))

    a = capped.select("fp", F.col("id").alias("id_a"))
    b = capped.select("fp", F.col("id").alias("id_b"))
    pairs = (
        a.join(b, "fp")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    overlap = F.col("n_shared") / F.least("na.n_fp", "nb.n_fp")
    return (
        pairs.join(counts.alias("na"), F.col("id_a") == F.col("na.id"))
        .join(counts.alias("nb"), F.col("id_b") == F.col("nb.id"))
        .where(overlap >= min_fraction)
        .select("id_a", "id_b", "n_shared", F.round(overlap, 6).alias("overlap"))
    )


# ---------------------------------------------------------------------------
# Pinned-frame memo: multi-stage dedup compositions (cluster → decide →
# report) and repeated jobs over the same corpus re-derive the SAME tiny
# post-aggregation frames (candidate pairs, cluster labels) from the SAME
# expensive scan pipeline (winnowing / LSH).  Catalyst cannot reuse work
# across separate actions, so the composition points pin the reduced frame
# with localCheckpoint and memoize it per (session, key).  Entries are
# bounded: post-aggregation pair/cluster frames, orders of magnitude below
# the corpus.
# ---------------------------------------------------------------------------

_PIN_CACHE: dict = {}


def pinned_frame(spark, key, builder) -> DataFrame:
    """Memoized ``localCheckpoint``: run ``builder()`` once per (session,
    key), reuse the materialized frame for every later call.  Use for
    REDUCED frames only (candidate pairs, cluster labels) — the pin
    materializes the frame on the executors."""
    memo_key = (id(spark), key)
    got = _PIN_CACHE.get(memo_key)
    if got is not None and got[0] is spark:
        return got[1]
    out = builder().localCheckpoint(eager=True)
    _PIN_CACHE[memo_key] = (spark, out)
    return out


def cached_fingerprint_overlap_pairs(
    df: DataFrame, cache_key=None, **kwargs
) -> DataFrame:
    """:func:`fingerprint_overlap_pairs` with the pair frame pinned and
    memoized under ``cache_key`` (plus the parameterization), so a
    clustering job and the dedup-decision job built on top of it run the
    winnow pipeline once, not once per consumer."""
    if cache_key is None:
        return fingerprint_overlap_pairs(df, **kwargs).localCheckpoint(
            eager=True
        )
    key = ("overlap_pairs", cache_key, tuple(sorted(kwargs.items())))
    return pinned_frame(
        df.sparkSession, key, lambda: fingerprint_overlap_pairs(df, **kwargs)
    )


def token_hashes(text: Column, seed: int = 42) -> Column:
    """Per-token xxhash64 array — the SimHash base.  Materialize once
    (own projection) before the 64 per-bit aggregates reference it."""
    return F.transform(tokens(text), lambda x: F.xxhash64(x, F.lit(seed)))


def _horner(token: Column, base: int) -> Column:
    return F.aggregate(
        F.split(token, ""),
        F.lit(0).cast("long"),
        lambda acc, c: F.pmod(acc * base + F.ascii(c), F.lit(_POLY_M)),
    )


def poly_token_hashes(text: Column) -> Column:
    """Engine-reproducible 62-bit token hashes: two independent 31-bit
    Horner folds (bases 257/263) packed as ``h1 * 2^31 + h2``.  Two folds
    because a single 61-bit Horner would overflow signed-64 at the
    multiply; the packed value stays < 2^62.  Char walks run on lambda
    variables, so the nested higher-order functions are linear."""
    return F.transform(
        tokens(text),
        lambda t: _horner(t, 257) * F.lit(1 << 31) + _horner(t, 263),
    )


def simhash_from_hashes(h: Column, bits: int = 64) -> Column:
    """64-bit SimHash over a pre-computed token-hash array: per-bit majority
    vote with higher-order functions (no UDF, no explode).  The bit index is
    a Python-side loop (shift amounts must be literals), so the expression
    tree is ``bits`` fixed aggregates over the hash array."""

    def vote_for_bit(i: int):
        # factory closure: higher-order-function lambdas must take exactly
        # (acc, v) — a defaulted third parameter trips the arity check
        return F.aggregate(
            h,
            F.lit(0).cast("long"),
            lambda acc, v: acc
            + F.when(
                F.shiftright(v, i).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1)),
        )

    sig = F.lit(0).cast("long")
    for i in range(bits):
        vote = vote_for_bit(i)
        # bit 63 of a signed long is the sign bit: its literal is min-long
        bit_val = (1 << i) if i < 63 else -(1 << 63)
        sig = sig.bitwiseOR(
            F.when(vote > 0, F.lit(bit_val).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sig


def simhash(text: Column, seed: int = 42, bits: int = 64) -> Column:
    """Single-expression SimHash over raw text.  Convenience form; for bulk
    use prefer token_hashes() in its own projection + simhash_from_hashes()
    so the tokenization isn't inlined into all ``bits`` aggregates."""
    return simhash_from_hashes(token_hashes(text, seed), bits)


def simhash_signatures(
    base: DataFrame, bits: int = 64
) -> DataFrame:
    """(id, th: array<long>) → (id, sh): the per-bit majority votes as
    ``bits`` codegen SUM aggregates over the exploded token hashes — the
    same explode+aggregate swap that cheapened the MinHash signatures
    (transform/aggregate HOF lambdas run interpreted; sum(case...)
    aggregates are whole-stage-codegen, with the map-side partial
    collapsing each doc to one row before any exchange).  A doc's hashes
    stay in its partition, so the vote totals are exact.  Empty docs
    survive via explode_outer: the NULL row votes -1 on every bit, which
    (like the HOF form's empty-fold 0) clears the whole signature."""
    ex = base.select("id", F.explode_outer("th").alias("_h"))
    votes = ex.groupBy("id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("_h"), i).bitwiseAND(F.lit(1)) == 1,
                    F.lit(1),
                ).otherwise(F.lit(-1))
            ).alias(f"_v{i}")
            for i in range(bits)
        ]
    )
    sig = F.lit(0).cast("long")
    for i in range(bits):
        bit_val = (1 << i) if i < 63 else -(1 << 63)
        sig = sig.bitwiseOR(
            F.when(F.col(f"_v{i}") > 0, F.lit(bit_val).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return votes.select("id", sig.alias("sh"))


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    seed: int = 42,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ k, using the pigeonhole
    block trick: split the 64-bit signature into k+1 blocks; any pair within
    distance k agrees exactly on ≥1 block → equi-join per block, then verify
    the true Hamming distance with bit_count(xor).

    ``hash_fn='poly'`` swaps xxhash64 for the packed double-Horner token
    hash (62 effective bits; the top two signature bits stay 0, which only
    makes the final block slightly narrower) — every value becomes
    oracle-reproducible."""
    assert hash_fn in ("xxhash64", "poly")
    nblocks = max_hamming + 1
    width = 64 // nblocks

    df = ensure_min_parallelism(df)  # 64 per-bit votes are CPU-bound
    th = (
        token_hashes(F.col(text_col), seed)
        if hash_fn == "xxhash64"
        else poly_token_hashes(F.col(text_col))
    )
    bits = 64 if hash_fn == "xxhash64" else 62
    sig = simhash_signatures(
        df.select(F.col(id_col).alias("id"), th.alias("th")), bits
    )
    # shift amounts must be literals → build the block array Python-side
    block_structs = [
        F.struct(
            F.lit(b).alias("block"),
            F.shiftright(F.col("sh"), b * width)
            .bitwiseAND(F.lit((1 << width) - 1))
            .alias("val"),
        )
        for b in range(nblocks)
    ]
    blocks = sig.select(
        "id", "sh", F.explode(F.array(*block_structs)).alias("bv")
    ).select("id", "sh", F.col("bv.block").alias("block"), F.col("bv.val").alias("val"))

    a = blocks.select("block", "val", F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = blocks.select("block", "val", F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        a.join(b, ["block", "val"])
        .where(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .where(ham <= max_hamming)
        .select("id_a", "id_b", ham.alias("hamming"))
    )


def edit_verified_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_rel_dist: float = 0.2,
    num_perm: int = 32,
    bands: int = 8,
    min_est: float = 0.5,
    min_jaccard: float = 0.3,
) -> DataFrame:
    """Candidate pairs re-verified by EXACT edit distance: the last
    refinement stage of a fuzzy-dedup pipeline — MinHash banding finds
    candidates, Jaccard screens them, and Levenshtein (JVM built-in, a
    well-defined metric both engines agree on) confirms true textual
    near-duplicates within ``max_rel_dist`` of the longer text's length.

    Cost shape: Levenshtein is O(len²) per pair, so it runs ONLY on the
    verified candidate set (bounded by the duplicate volume) — never on
    the corpus cross product.  Returns (id_a, id_b, edit_dist)."""
    pairs = minhash_verified_pairs(
        df,
        text_col,
        id_col,
        num_perm=num_perm,
        bands=bands,
        min_est=min_est,
        min_jaccard=min_jaccard,
    ).select("id_a", "id_b")
    ta = df.select(
        F.col(id_col).alias("id_a"), F.col(text_col).alias("_ta")
    )
    tb = df.select(
        F.col(id_col).alias("id_b"), F.col(text_col).alias("_tb")
    )
    dist = F.levenshtein("_ta", "_tb")
    cap = F.ceil(
        max_rel_dist
        * F.greatest(F.length("_ta"), F.length("_tb")).cast("double")
    )
    return (
        pairs.join(ta, "id_a")
        .join(tb, "id_b")
        .where(dist <= cap)
        .select("id_a", "id_b", dist.cast("long").alias("edit_dist"))
    )


def excise_frequent_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 3,
) -> DataFrame:
    """Corpus-level repeated-LINE excision — the C4 boilerplate cut
    (Raffel 2020 §2.2: drop any line occurring ≥3 times in the corpus;
    reference has no text surface — pipeline extension): split each
    document on newlines, count identical lines corpus-wide, drop every
    line whose count reaches ``min_count``, and reassemble the survivors
    in their original order.  Returns ``(id, n_lines, n_removed,
    text)`` with documents kept even when everything was excised.

    Scale shape: TWO shuffles — the line-frequency hash aggregate
    (map-side partials collapse repeated boilerplate early, so the
    shuffle carries ~distinct lines) and the per-document reassembly
    group.  The frequency verdict joins back on the line key itself;
    at petabyte scale pre-hash the key (xxhash64) to halve shuffle
    bytes and verify collisions on the residue.  No driver data, no
    windows, no cartesian anywhere.
    """
    lines = docs.select(
        id_col,
        F.posexplode(F.split(F.col(text_col), "\n", -1)).alias(
            "_pos", "_line"
        ),
    )
    freq = lines.groupBy("_line").agg(F.count(F.lit(1)).alias("_cnt"))
    kept = lines.join(freq, "_line").where(F.col("_cnt") < min_count)
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
        ).alias("_kept_text"),
        F.count(F.lit(1)).alias("_kept_n"),
    )
    base = docs.select(
        id_col,
        F.size(F.split(F.col(text_col), "\n", -1)).cast("long").alias(
            "n_lines"
        ),
    )
    return (
        base.join(rebuilt, id_col, "left")
        .select(
            id_col,
            "n_lines",
            (F.col("n_lines") - F.coalesce(F.col("_kept_n"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.coalesce(F.col("_kept_text"), F.lit("")).alias(text_col),
        )
    )


def containment_join_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_k: int = 3,
    base: DataFrame | None = None,
) -> DataFrame:
    """EXACT containment self-join: every DIRECTED pair with
    C(A,B) = |A∩B|/|A| ≥ threshold over the hashed-shingle sets —
    "A is (mostly) quoted inside B", the asymmetric question Jaccard
    can't ask: a paragraph lifted into a long document has tiny
    Jaccard but containment ≈ 1.  The quote/boilerplate/subset
    detector for curation, zero false negatives.

    Prefix filtering adapts asymmetrically (Bayardo et al. WWW 2007):
    if C(A,B) ≥ t then A∩B has ≥ ⌈t·|A|⌉ elements, so A's first
    ``|A| − ⌈t·|A|⌉ + 1`` elements in the GLOBAL rarest-first order
    must hit the intersection (pigeonhole) — but B gets no prefix (a
    huge B can contain all of A), so the candidate join is A-prefix
    tokens ⋈ B-ALL tokens.  Rarest-first ordering keeps the indexed
    A-prefix tokens rare, bounding the equi-join fan-out the same way
    the symmetric join does.

    Engine-exactness is :func:`similarity_join_exact`'s integer
    discipline: threshold as the rational ⌈t·1e6⌉/1e6, prefix length
    and the verification ``|∩|·1e6 ≥ tn·|A|`` pure int64.

    Returns (id_a, id_b, containment) — id_a's shingles ⊆-ish id_b's,
    id_a ≠ id_b; both directions may appear."""
    tn = int(-(-threshold * 1_000_000 // 1))  # ceil(t·1e6)
    if not 0 < tn <= 1_000_000:
        raise ValueError("threshold must be in (0, 1]")
    if base is None:
        base = poly_shingle_base(df, text_col, id_col, shingle_k)
    ex = base.select("id", F.explode("base").alias("h"))
    freq = ex.groupBy("h").agg(F.count(F.lit(1)).alias("_df"))
    keyed = ex.join(freq, "h").select(
        "id", (F.col("_df") * F.lit(1 << 31) + F.col("h")).alias("k")
    )
    sets = keyed.groupBy("id").agg(
        F.sort_array(F.collect_list("k")).alias("ks")
    )
    n = F.size("ks")
    plen = (
        n - F.expr(f"(size(ks) * {tn} + 999999) div 1000000").cast("int")
        + F.lit(1)
    )
    pref = sets.select(
        "id", n.alias("nk"),
        F.posexplode(F.slice("ks", 1, F.greatest(plen, F.lit(0))))
        .alias("p", "k"),
    )
    # LENGTH FILTER (asymmetric): C(A,B) ≥ t forces |B| ≥ t·|A|
    # (|∩| ≤ |B| and |∩| ≥ t·|A|) — redundant with the verify below,
    # so the result is identical, but it prunes small-container pairs
    # BEFORE the fat shingle arrays ship through the verification
    # joins.  The all-token B side comes from the SAME sorted `sets`
    # frame as the prefixes (posexplode of the full ks) instead of a
    # second explode+freq join of the raw base — value-identical (ks is
    # exactly B's keyed token set, |B| = size(ks)), one less corpus-side
    # join, and the token POSITION rides along for the positional
    # filter.
    allk = sets.select(
        F.col("id").alias("id_b"), n.alias("_nb"),
        F.posexplode("ks").alias("_pb", "k"),
    )
    # POSITIONAL FILTER (asymmetric PPJoin): a shared token at sorted
    # 0-based positions (pa, pb) bounds the intersection —
    # |A∩B| ≤ ub = min(pa,pb) + min(|A|−pa, |B|−pb) — and
    # C(A,B) ≥ t ⟺ |A∩B|·1e6 ≥ tn·|A| forces min(ub)·1e6 ≥ tn·|A|.
    # The min-ub aggregation replaces the old dropDuplicates (same
    # pair-keyed exchange); recall-safe by the same every-shared-token
    # bound as the symmetric join.
    ub = F.least("_pa", "_pb") + F.least(
        F.col("_na") - F.col("_pa"), F.col("_nb") - F.col("_pb")
    )
    cand = (
        pref.select(F.col("id").alias("id_a"), F.col("nk").alias("_na"),
                    F.col("p").alias("_pa"), "k")
        .join(allk, "k")
        .where(
            (F.col("id_a") != F.col("id_b"))
            & (F.col("_nb") * F.lit(1_000_000)
               >= F.lit(tn) * F.col("_na"))
        )
        .groupBy("id_a", "id_b", "_na")
        .agg(F.min(ub).alias("_ub"))
        .where(F.col("_ub") * F.lit(1_000_000) >= F.lit(tn) * F.col("_na"))
        .select("id_a", "id_b")
    )
    a = base.select(F.col("id").alias("id_a"), F.col("base").alias("b_a"))
    b = base.select(F.col("id").alias("id_b"), F.col("base").alias("b_b"))
    inter = F.size(F.array_intersect("b_a", "b_b")).cast("long")
    na = F.size("b_a").cast("long")
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .where((na > 0) & (inter * F.lit(1_000_000) >= F.lit(tn) * na))
        .select(
            "id_a", "id_b",
            F.round(inter.cast("double") / na.cast("double"), 6)
            .alias("containment"),
        )
    )


def cross_containment_join(
    contained: DataFrame,
    container: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    shingle_k: int = 3,
) -> DataFrame:
    """EXACT cross-corpus containment: every pair (a ∈ contained,
    b ∈ container) with |A∩B|/|A| ≥ threshold over shingle sets —
    quote-level decontamination (which benchmark items leaked into the
    training corpus, even pasted inside much longer documents, where
    q122's corpus-level gram overlap and Jaccard both dilute away),
    zero false negatives.

    Same asymmetric prefix filter as
    :func:`containment_join_exact`: the contained side indexes only
    its rarest-first pigeonhole prefix, the container side ALL its
    tokens; shingle document frequencies fold over the UNION of both
    corpora so the global rarest-first order is one consistent key
    (any consistent order preserves exactness; union frequencies keep
    the indexed prefixes rare in BOTH corpora).  Integer threshold
    discipline throughout.

    Returns (id_a, id_b, containment): id_a from ``contained``, id_b
    from ``container``; ids may collide across the two frames — they
    are separate id spaces."""
    tn = int(-(-threshold * 1_000_000 // 1))  # ceil(t·1e6)
    if not 0 < tn <= 1_000_000:
        raise ValueError("threshold must be in (0, 1]")
    base_a = poly_shingle_base(contained, text_col, id_col, shingle_k)
    base_b = poly_shingle_base(container, text_col, id_col, shingle_k)
    ex_a = base_a.select("id", F.explode("base").alias("h"))
    ex_b = base_b.select("id", F.explode("base").alias("h"))
    freq = (
        ex_a.unionByName(ex_b)
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("_df"))
    )
    key = (F.col("_df") * F.lit(1 << 31) + F.col("h")).alias("k")
    keyed_a = ex_a.join(freq, "h").select("id", key)
    sets_a = keyed_a.groupBy("id").agg(
        F.sort_array(F.collect_list("k")).alias("ks")
    )
    n = F.size("ks")
    plen = (
        n - F.expr(f"(size(ks) * {tn} + 999999) div 1000000").cast("int")
        + F.lit(1)
    )
    pref = sets_a.select(
        "id", n.alias("nk"),
        F.explode(F.slice("ks", 1, F.greatest(plen, F.lit(0))))
        .alias("k"),
    )
    # asymmetric length filter, as in containment_join_exact: |B| ≥
    # t·|A| is implied by the verify, pruning BEFORE the array joins
    keyed_b_sz = base_b.select(
        F.col("id").alias("id_b"), F.size("base").alias("_nb"),
        F.explode("base").alias("h"),
    ).join(freq, "h").select(
        "id_b", "_nb",
        (F.col("_df") * F.lit(1 << 31) + F.col("h")).alias("k"),
    )
    cand = (
        pref.select(F.col("id").alias("id_a"), F.col("nk").alias("_na"),
                    "k")
        .join(keyed_b_sz, "k")
        .where(F.col("_nb") * F.lit(1_000_000) >= F.lit(tn) * F.col("_na"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    a = base_a.select(F.col("id").alias("id_a"), F.col("base").alias("b_a"))
    b = base_b.select(F.col("id").alias("id_b"), F.col("base").alias("b_b"))
    inter = F.size(F.array_intersect("b_a", "b_b")).cast("long")
    na = F.size("b_a").cast("long")
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .where((na > 0) & (inter * F.lit(1_000_000) >= F.lit(tn) * na))
        .select(
            "id_a", "id_b",
            F.round(inter.cast("double") / na.cast("double"), 6)
            .alias("containment"),
        )
    )


def canonical_keep(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Quality-aware canonical selection — the last mile of exact
    dedup: within each normalized-fingerprint group keep the HIGHEST
    quality copy (ties to the smallest id), not blindly the smallest
    id.  Copies of one document routinely differ in formatting
    (spacing, boilerplate padding), and :func:`exact_duplicates`'s
    min-id rule can keep the mangled one; this keeps the cleanest.

    The quality ranking is ``pipeline/text.quality_score`` quantized
    to micro-units (the score is already 6-decimal-rounded, so the
    int64 is engine-exact) and the argmax is
    ``min(struct(-q_micro, id))`` — the q175 no-window discipline.
    One fingerprint-keyed aggregation + one join back; scale shape
    identical to exact dedup.

    Returns (id, canonical_id, q_micro, kept) for every input row."""
    from dudb_spark.pipeline.text import fingerprint, quality_score

    scored = df.select(
        F.col(id_col).alias("id"),
        fingerprint(F.col(text_col)).alias("fp"),
        F.round(quality_score(F.col(text_col)) * 1_000_000)
        .cast("long").alias("q_micro"),
    )
    win = (
        scored.groupBy("fp")
        .agg(
            F.min(
                F.struct(
                    (-F.col("q_micro")).alias("nq"),
                    F.col("id").alias("i"),
                )
            ).alias("m")
        )
        .select("fp", F.col("m.i").alias("canonical_id"))
    )
    return (
        scored.join(win, "fp")
        .select(
            "id",
            "canonical_id",
            "q_micro",
            (F.col("id") == F.col("canonical_id")).alias("kept"),
        )
    )

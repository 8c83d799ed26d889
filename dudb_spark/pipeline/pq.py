"""Product Quantization (PQ) for embedding columns — the third
compressed-index path alongside SQ8 (quantize.py) and IVF (ivf.py),
after Jégou, Douze & Schmid 2011 (*Product Quantization for Nearest
Neighbor Search*; FAISS's ``PQ`` index family).

The vector is split into ``m`` subvectors; each subspace gets its own
``ksub``-entry codebook, and a vector encodes as ``m`` small codes —
64 float32 dims at m=8, ksub=16 compress 256 bytes → 8 codes (32×; 4
bits/code if packed).  Query scoring is ADC (asymmetric distance
computation): per subspace, the query precomputes a ``ksub``-entry
inner-product table, and a database vector's score is ``m`` table
lookups — no float vector is ever touched at query time.

Spark shape, sized for 100 TB:

- Codebooks are DETERMINISTIC and tiny (first ``ksub`` vectors by id,
  subvector-sliced — same seeding rule as ``ivf.fixed_cells``): m × ksub
  × (d/m) floats collect driver-side and ride into Column expressions as
  literals; nothing iterative, nothing Spark-ML, so an oracle engine
  derives the identical codebooks from the same table.
- Encoding is a narrow per-row projection over the PERSISTED cast
  vector (``_v`` materialized once — an inlined transform would be
  re-evaluated per ``element_at`` reference, the measured Catalyst
  hazard): per subspace, ``round(x_s·c_j − |c_j|²/2, 6)`` for the
  ``ksub`` candidates and a first-max argmax (smaller code on ties).
  Scan-fused; no shuffle, no UDF.
- ADC search is ``m`` ``element_at`` lookups into broadcast literal
  tables + TakeOrderedAndProject — the corpus is scanned once over its
  codes column only.

Determinism: every comparison point (encode scores, final ADC cosine)
is rounded to 6 decimals with explicit tie-breaks, and additions are
written in fixed subspace order, so the DuckDB oracle reproduces codes
and ranking exactly (q109).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dudb_spark.pipeline.ivf import _dbl, _vec_sql
from dudb_spark.pipeline.similarity import _as_double


def _seqsum(xs):
    """Left-to-right IEEE accumulation — bit-identical to the
    sequential folds (list_dot_product / aggregate) both engines run,
    unlike math.fsum's correctly-rounded result."""
    acc = 0.0
    for x in xs:
        acc += x
    return acc


def fixed_pq_codebooks(
    emb: DataFrame,
    m: int = 8,
    ksub: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """``books[s][j]`` = subvector ``s`` of the ``j``-th seed vector
    (first ``ksub`` rows by id) — deterministic, oracle-derivable."""
    rows = emb.orderBy(id_col).limit(ksub).collect()
    vecs = [[float(x) for x in r[vec_col]] for r in rows]
    d = len(vecs[0])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    return [
        [v[s * dsub: (s + 1) * dsub] for v in vecs] for s in range(m)
    ]


def _t_sql(s: int, dsub: int, c: list[float], col: str = "_v") -> str:
    """``round(x_s·c − |c|²/2, 6)`` over the persisted vector column,
    additions in fixed element order (1-based element_at)."""
    terms = " + ".join(
        f"element_at({col}, {s * dsub + i + 1}) * {_dbl(c[i])}"
        for i in range(dsub)
    )
    half = _seqsum(x * x for x in c) / 2.0
    return f"round(({terms}) - {_dbl(half)}, 6)"


def _code_sql(
    s: int, dsub: int, book: list[list[float]], col: str = "_v"
) -> str:
    """0-based nearest-centroid code: scores array + first-max position
    (array_position finds the FIRST occurrence — ties pick the smaller
    code in both engines)."""
    scores = ", ".join(_t_sql(s, dsub, c, col) for c in book)
    arr = f"array({scores})"
    return f"CAST(array_position({arr}, array_max({arr})) - 1 AS INT)"


def pq_encode(
    emb: DataFrame,
    books: list[list[list[float]]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    eager: bool = True,
) -> DataFrame:
    """``(id, codes array<int>)`` — one code per subspace.

    The cast vector ``_v`` must be pinned during encoding (an inlined
    transform is re-evaluated per ``element_at`` reference — the measured
    Catalyst hazard), but holding that cache past the encode leaks a
    cached RDD per call in long-lived sessions.  Default ``eager=True``
    materializes the (tiny — id + m ints per row) codes frame via
    ``localCheckpoint`` and releases the cast-vector cache immediately;
    ``eager=False`` returns the lazy scan-fused plan and leaves the
    persistence lifecycle to the caller (who should unpersist
    ``result._pq_base`` when done)."""
    dsub = len(books[0][0])
    base = emb.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("_v")
    ).persist()
    codes = base.select(
        id_col,
        F.array(
            *[F.expr(_code_sql(s, dsub, b)) for s, b in enumerate(books)]
        ).alias("codes"),
    )
    if eager:
        codes = codes.localCheckpoint(eager=True)
        base.unpersist()
    else:
        codes._pq_base = base
    return codes


def pq_topk(
    emb: DataFrame,
    query_vec,
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_id=None,
    books: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Top-``k`` by ADC cosine against the PQ-reconstructed vectors:
    ``ip/(|q|·|x̂|)`` where both ``ip = q·x̂`` and ``|x̂|²`` are ``m``
    table lookups per row.  Returns ``(id, adc_cosine)``."""
    if books is None:
        books = fixed_pq_codebooks(emb, m, ksub, vec_col, id_col)
    dsub = len(books[0][0])
    q = [float(x) for x in query_vec]
    qnorm = math.sqrt(_seqsum(x * x for x in q))

    coded = pq_encode(emb, books, vec_col, id_col)

    def lut(vals: list[float]) -> str:
        return "array(" + ",".join(_dbl(v) for v in vals) + ")"

    ip_terms = []
    nsq_terms = []
    for s, book in enumerate(books):
        qs = q[s * dsub: (s + 1) * dsub]
        ips = [_seqsum(a * b for a, b in zip(qs, c)) for c in book]
        nsqs = [_seqsum(x * x for x in c) for c in book]
        idx = f"element_at(codes, {s + 1}) + 1"
        ip_terms.append(f"element_at({lut(ips)}, {idx})")
        nsq_terms.append(f"element_at({lut(nsqs)}, {idx})")
    score = (
        f"round(({' + '.join(ip_terms)}) / "
        f"({_dbl(qnorm)} * sqrt({' + '.join(nsq_terms)})), 6)"
    )
    out = coded.select(
        F.col(id_col), F.expr(score).alias("adc_cosine")
    )
    if exclude_id is not None:
        out = out.where(F.col(id_col) != exclude_id)
    return out.orderBy(F.desc("adc_cosine"), F.asc(id_col)).limit(k)


def ivf_pq_topk(
    emb: DataFrame,
    cells,
    query_vec,
    k: int = 10,
    n_probe: int = 4,
    m: int = 8,
    ksub: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_id=None,
    books: list[list[list[float]]] | None = None,
) -> DataFrame:
    """The full FAISS ``IVF,PQ`` composition: the coarse quantizer's
    ``n_probe`` nearest cells prune the candidate set, then PQ/ADC ranks
    ONLY those cells' codes — at 100 TB the index stores 8 bytes per
    vector and a query touches ``n_probe/n_clusters`` of them, never a
    raw float vector.

    ``cells`` is the ``(assigned, centroids)`` pair from
    ``ivf.fixed_cells`` (shared with q41/q88/q99's quantizer pass);
    codebooks seed from the FULL corpus (first ``ksub`` by id) so the
    encoding is probe-independent, exactly like a stored index.
    """
    from dudb_spark.pipeline.ivf import probe_cells

    assigned, centroids = cells
    if books is None:
        books = fixed_pq_codebooks(emb, m, ksub, vec_col, id_col)
    probe = probe_cells(centroids, query_vec, n_probe)
    cond = F.col("cell").isin(sorted(probe))
    if exclude_id is not None:
        cond = cond & (F.col(id_col) != exclude_id)
    cand = assigned.where(cond).select(id_col)
    return pq_topk(
        emb.join(cand, id_col, "left_semi"),
        query_vec,
        k=k,
        m=m,
        ksub=ksub,
        vec_col=vec_col,
        id_col=id_col,
        books=books,
    )


# ---------------------------------------------------------------------------
# Residual refinement (FAISS ``IVF{n},PQ{m}`` proper): vectors encode the
# RESIDUAL from their assigned coarse centroid, x ≈ c(x) + r̂, which is
# the accuracy step between plain PQ and a production IVF,PQ index —
# residuals are far smaller than raw vectors, so the same code budget
# quantizes them much more finely (Jégou et al. 2011 §IV.B).
# ---------------------------------------------------------------------------


def _resid_sql(centroids: list[list[float]]) -> str:
    """``_v - centroid[cell]`` element-wise, the per-row residual; the
    centroid list rides as a nested array literal, so the subtraction is
    scan-fused and cell-dependent without a join."""
    cents = "array(" + ",".join(_vec_sql(c) for c in centroids) + ")"
    return (
        f"transform(_v, (x, i) -> "
        f"x - element_at(element_at({cents}, cell + 1), i + 1))"
    )


def fixed_residual_codebooks(
    assigned,
    centroids: list[list[float]],
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
) -> list[list[list[float]]]:
    """``books[s][j]`` = subvector ``s`` of the ``j``-th seed RESIDUAL
    (first ``ksub`` rows by id, each minus its assigned centroid) —
    deterministic and oracle-derivable: the driver-side float subtract
    is the same IEEE binary64 operation the scan-fused residual runs."""
    rows = (
        assigned.orderBy(id_col).limit(ksub).select(id_col, "_v", "cell")
        .collect()
    )
    vecs = []
    for r in rows:
        c = centroids[r["cell"]]
        vecs.append([float(x) - float(cx) for x, cx in zip(r["_v"], c)])
    d = len(vecs[0])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    return [[v[s * dsub: (s + 1) * dsub] for v in vecs] for s in range(m)]


def pq_residual_encode(
    assigned,
    centroids: list[list[float]],
    books: list[list[list[float]]],
    id_col: str = "vec_id",
) -> DataFrame:
    """``(id, cell, codes array<int>)`` — one code per subspace over the
    residual vector.  Same persist/eager-checkpoint lifecycle as
    :func:`pq_encode` (no leaked cache)."""
    dsub = len(books[0][0])
    base = assigned.select(
        F.col(id_col), F.col("cell"),
        F.expr(_resid_sql(centroids)).alias("_r"),
    ).persist()
    codes = base.select(
        id_col,
        "cell",
        F.array(
            *[
                F.expr(_code_sql(s, dsub, b, "_r"))
                for s, b in enumerate(books)
            ]
        ).alias("codes"),
    ).localCheckpoint(eager=True)
    base.unpersist()
    return codes


def ivf_pq_residual_topk(
    emb: DataFrame,
    cells,
    query_vec,
    k: int = 10,
    n_probe: int = 4,
    m: int = 8,
    ksub: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_id=None,
    books: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Residual IVF,PQ search: candidates come from the ``n_probe``
    nearest coarse cells, and each is scored by the ADC cosine against
    its RECONSTRUCTION ``c + r̂``:

        cos(q, c+r̂) = (q·c + q·r̂) / (|q| · sqrt(|c|² + 2·c·r̂ + |r̂|²))

    Everything per-row is ``m`` table lookups: ``q·r̂`` from the global
    query/codebook tables, ``c·r̂`` from per-probed-cell tables (n_probe
    × m × ksub driver-side constants), ``|r̂|²`` from the codebook
    norms; ``q·c`` and ``|c|²`` are per-cell scalars.  At 100 TB the
    index stores one coarse id + m codes per vector and a query touches
    ``n_probe/n_clusters`` of them — identical scan shape to
    :func:`ivf_pq_topk`, strictly better quantization.

    Returns ``(id, adc_cosine)``; value-exact vs the DuckDB oracle
    (q119) — codebooks, codes, probe set, and ranking all reproduce."""
    from dudb_spark.pipeline.ivf import probe_cells

    assigned, centroids = cells
    if books is None:
        books = fixed_residual_codebooks(assigned, centroids, m, ksub, id_col)
    dsub = len(books[0][0])
    q = [float(x) for x in query_vec]
    qnorm = math.sqrt(_seqsum(x * x for x in q))
    probe = sorted(probe_cells(centroids, query_vec, n_probe))

    coded = pq_residual_encode(assigned, centroids, books, id_col)
    cand = coded.where(F.col("cell").isin(probe))
    if exclude_id is not None:
        cand = cand.where(F.col(id_col) != exclude_id)

    def lut(vals: list[float]) -> str:
        return "array(" + ",".join(_dbl(v) for v in vals) + ")"

    qc = {c: _seqsum(a * b for a, b in zip(q, centroids[c])) for c in probe}
    cn2 = {c: _seqsum(x * x for x in centroids[c]) for c in probe}
    ip_terms, nsq_terms, cd_terms = [], [], []
    for s, book in enumerate(books):
        qs = q[s * dsub: (s + 1) * dsub]
        ips = [_seqsum(a * b for a, b in zip(qs, cb)) for cb in book]
        nsqs = [_seqsum(x * x for x in cb) for cb in book]
        idx = f"element_at(codes, {s + 1}) + 1"
        ip_terms.append(f"element_at({lut(ips)}, {idx})")
        nsq_terms.append(f"element_at({lut(nsqs)}, {idx})")
        per_cell = []
        for c in probe:
            cs = centroids[c][s * dsub: (s + 1) * dsub]
            cds = [_seqsum(a * b for a, b in zip(cs, cb)) for cb in book]
            per_cell.append(
                f"WHEN cell = {c} THEN element_at({lut(cds)}, {idx})"
            )
        cd_terms.append("CASE " + " ".join(per_cell) + " END")
    qc_sql = (
        "CASE "
        + " ".join(f"WHEN cell = {c} THEN {_dbl(qc[c])}" for c in probe)
        + " END"
    )
    cn2_sql = (
        "CASE "
        + " ".join(f"WHEN cell = {c} THEN {_dbl(cn2[c])}" for c in probe)
        + " END"
    )
    # parenthesization mirrors the oracle's qc + SUM(ip) etc. — addition
    # order changes the last ulp, which 6-decimal rounding can expose
    score = (
        f"round(({qc_sql} + ({' + '.join(ip_terms)})) / "
        f"({_dbl(qnorm)} * sqrt({cn2_sql} + 2 * ({' + '.join(cd_terms)}) "
        f"+ ({' + '.join(nsq_terms)}))), 6)"
    )
    return (
        cand.select(F.col(id_col), F.expr(score).alias("adc_cosine"))
        .orderBy(F.desc("adc_cosine"), F.asc(id_col))
        .limit(k)
    )

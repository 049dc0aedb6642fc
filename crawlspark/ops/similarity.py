"""Similarity search over `embeddings(vec_id, embedding float[], label)`.

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Cosine in float64 via zip_with/aggregate (JVM-side, no UDF).
- ``srp_ann_topk``: the scale path — sign-random-projection LSH.
  The hyperplanes live in a committed parquet fixture
  (fixtures/planes.parquet) so BOTH Spark and the DuckDB oracle
  compute identical buckets: the projection is expressed as a
  join-aggregate (posexplode(embedding) ⋈ planes on dim, sum of
  products per (vec, plane)) — i.e., the matrix multiply AS a join,
  which is exactly how it distributes at 10^9 vectors. Same-bucket
  candidates are re-ranked by exact cosine.

- ``pq_encode`` / ``pq_topk`` (r9): product quantization — the
  MEMORY scale path. Codes are M bytes/vector (32x smaller than the
  raw float corpus); the ADC scan never reads a raw vector, and the
  opt-in rerank reads raw vectors for the per-query shortlist only.
  Codebooks live in a committed fixture (fixtures/pq_codebooks
  .parquet) like the IVF centroids, so codes are engine-independent.

Scale notes: brute-force is O(Q·N) — fine for a query batch against
a broadcast candidate set, wrong at N=10^9; SRP buckets cut N to
N/2^bits per probe with a high-entropy key (skew-free shuffle); PQ
cuts the BYTES/vector the scan touches (IVF cuts which vectors are
scanned — at 10^9 the deployment shape composes both: IVF buckets,
PQ codes inside each bucket, exact rerank on the shortlist).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from . import spread

__all__ = ["cosine_topk", "srp_ann_topk", "srp_buckets", "ivf_assign",
           "ivf_assign_multi", "ivf_topk", "pq_encode", "pq_topk",
           "ivfpq_topk"]


def _dot(x, y):
    return F.aggregate(F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda s, t: s + t)


def _cos(av, bv):
    return _dot(av, bv) / (F.sqrt(_dot(av, av)) * F.sqrt(_dot(bv, bv)))


def _norm(v):
    """sqrt(v·v) — hoisted per VECTOR instead of per pair (r10): the
    inline _cos re-evaluated both self-dots for every scored pair, so
    a P-pair rerank paid 3P interpreted-HOF dot products. Computing
    the identical expression once per row and multiplying the two
    norm COLUMNS in the pair projection yields bit-identical doubles
    (same element order, same operations — only the evaluation count
    changes) at ~P dots."""
    return F.sqrt(_dot(v, v))


def _cos_pre(av, an, bv, bn):
    """Cosine from pre-hoisted norms: same value as _cos(av, bv)."""
    return _dot(av, bv) / (an * bn)


def cosine_topk(emb: DataFrame, k: int = 5, n_queries: int = 10) -> DataFrame:
    """Exact top-k cosine neighbors for the first ``n_queries``
    vectors (excluding self). Query side is tiny -> broadcast it so
    the cross join is a broadcast nested loop, not a shuffle. The
    candidate side is spread to session parallelism first (r10): the
    per-pair HOF dot products run in the scan stage, and a small
    parquet table scans as 1-2 splits (measured 2.88 -> 0.66 s at
    sf1.0 on local[32] from this alone)."""
    e = spread(
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    ).withColumn("n", _norm(F.col("v")))
    q = F.broadcast(
        e.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), F.col("n").alias("qn")
        )
    )
    scored = (
        q.crossJoin(e)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            F.round(_cos_pre(F.col("qv"), F.col("qn"), F.col("v"), F.col("n")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "n_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("q_id", "rnk")
    )


def _centroid_scores(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, centroid_id, c_cos): cosine of every vector against
    every centroid. Centroid table is tiny and broadcast, so the
    fan-out join never shuffles the vector side; c_cos is rounded to
    6 decimals so the argmin/argsort is robust to sub-ulp summation
    differences across engines (ties broken by centroid_id)."""
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("n", _norm(F.col("v")))
    c = F.broadcast(
        centroids.select(
            "centroid_id", F.col("center").cast("array<double>").alias("cv")
        ).withColumn("cn", _norm(F.col("cv")))
    )
    return e.crossJoin(c).select(
        "vec_id",
        "centroid_id",
        F.round(_cos_pre(F.col("v"), F.col("n"), F.col("cv"), F.col("cn")), 6).alias("c_cos"),
    )


def ivf_assign(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """IVF coarse quantization: each vector -> its nearest centroid
    (the inverted-list bucket). Centroids are a committed k-means
    fixture (fixtures/centroids.parquet, scripts/make_fixtures.py) so
    the DuckDB oracle assigns identically. The per-vector argmax
    collapses map-side (fan-out rows stay in their input partition),
    so the reduce shuffle carries ~one row per vector — the standard
    IVF assign cost (n·k dot products), no all-pairs anywhere.
    The corpus side is spread first (r10, see cosine_topk): the n·k
    HOF dot products otherwise run at the scan's 1-2-split
    parallelism on a small table."""
    scored = _centroid_scores(spread(emb.select("vec_id", "embedding")), centroids)
    return scored.groupBy("vec_id").agg(
        F.min(F.struct((-F.col("c_cos")).alias("neg"), F.col("centroid_id").alias("cid")))
        .getField("cid")
        .alias("bucket")
    )


def ivf_assign_multi(emb: DataFrame, centroids: DataFrame, n_probe: int = 2) -> DataFrame:
    """Multi-probe IVF assignment: each vector -> its ``n_probe``
    nearest centroids, one (vec_id, bucket) row per probe. The
    blocking fix for single-probe near-dup's boundary-pair miss
    (VERDICT r03 #3): a pair straddling a centroid boundary shares
    a second-nearest bucket with high probability, so p probes trade
    ~p^2/2 x the in-bucket pair work for that recall. Same map-side
    shape as ivf_assign — the top-p select is a collect_list of k
    (small, broadcast-bounded) centroid scores per vector sorted in
    the aggregate, never a row_number window over the n*k fan-out."""
    scored = _centroid_scores(spread(emb.select("vec_id", "embedding")), centroids)
    tops = scored.groupBy("vec_id").agg(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("c_cos")).alias("neg"),
                        F.col("centroid_id").alias("cid"),
                    )
                )
            ),
            1,
            n_probe,
        ).alias("tops")
    )
    return tops.select(
        "vec_id", F.explode(F.col("tops").getField("cid")).alias("bucket")
    )


def ivf_topk(
    emb: DataFrame,
    centroids: DataFrame,
    k: int = 5,
    n_queries: int = 10,
    n_probe: int = 2,
) -> DataFrame:
    """IVF ANN: candidates live in their nearest-centroid bucket;
    each query probes its ``n_probe`` nearest buckets and re-ranks
    the union by exact cosine. The scale path for embedding
    similarity at 10^9 vectors: per query only ~n_probe/k_centroids
    of the corpus is scored, and the bucket join shuffles on a
    small-cardinality key whose skew is bounded by k-means balance.
    Corpus side spread to session parallelism (r10, see cosine_topk)
    before the HOF-heavy scoring.

    r10: the candidate build carries ``v`` THROUGH the assignment
    aggregate (first(v) — constant per vec_id group, so the value is
    deterministic) instead of joining ivf_assign's (vec_id, bucket)
    back against the vector table: same bucket expression as
    ivf_assign (argmin via min-of-struct over the identical rounded
    c_cos), one corpus shuffle instead of an extra sort-merge join's
    two exchanges + sorts of the array column."""
    e = spread(
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    ).withColumn("n", _norm(F.col("v")))
    c = F.broadcast(
        centroids.select(
            "centroid_id", F.col("center").cast("array<double>").alias("cv")
        ).withColumn("cn", _norm(F.col("cv")))
    )
    cscored = e.crossJoin(c).select(
        "vec_id",
        "v",
        "n",
        "centroid_id",
        F.round(_cos_pre(F.col("v"), F.col("n"), F.col("cv"), F.col("cn")), 6).alias("c_cos"),
    )
    cand = cscored.groupBy("vec_id").agg(
        F.min(F.struct((-F.col("c_cos")).alias("neg"), F.col("centroid_id").alias("cid")))
        .getField("cid")
        .alias("bucket"),
        F.first("v").alias("v"),
        F.first("n").alias("n"),
    )
    qscores = _centroid_scores(emb.filter(F.col("vec_id") < n_queries), centroids)
    wq = Window.partitionBy("vec_id").orderBy(F.desc("c_cos"), "centroid_id")
    probes = (
        qscores.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select(F.col("vec_id").alias("q_id"), F.col("centroid_id").alias("bucket"))
    )
    q = probes.join(
        e.select(
            F.col("vec_id").alias("q_id"), F.col("v").alias("qv"), F.col("n").alias("qn")
        ),
        "q_id",
    )
    # broadcast the (n_queries x n_probe)-row query side explicitly
    # (r10): size ESTIMATES for this join-of-a-window put it over the
    # auto-broadcast threshold, so the planner picked a sort-merge
    # join that shuffled the whole candidate corpus into <= n_centroid
    # bucket keys — a skewed exchange AND the HOF rerank collapsed to
    # that few cores. Broadcasting keeps candidates in their spread
    # partitions with no exchange at all.
    scored = (
        F.broadcast(q).join(cand, "bucket")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            F.round(_cos_pre(F.col("qv"), F.col("qn"), F.col("v"), F.col("n")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "n_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("q_id", "rnk")
    )


def srp_buckets(emb: DataFrame, planes: DataFrame) -> DataFrame:
    """Sign-random-projection bucket per vector: posexplode the
    embedding, join the plane weights on dim, sum products per
    (vec, plane), collect sign bits into a bucket string."""
    comp = emb.select("vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"))
    proj = (
        comp.join(F.broadcast(planes), "dim")
        .groupBy("vec_id", "plane")
        .agg(F.sum(F.col("x") * F.col("w")).alias("p"))
    )
    return proj.groupBy("vec_id").agg(
        F.concat_ws(
            "",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("plane", (F.col("p") >= 0).cast("int").alias("bit")))
                ),
                lambda s: s["bit"].cast("string"),
            ),
        ).alias("bucket")
    )


def srp_ann_topk(
    emb: DataFrame, planes: DataFrame, k: int = 5, n_queries: int = 10
) -> DataFrame:
    """ANN: same-bucket candidates re-ranked by exact cosine (norms
    hoisted per vector, r10 — see _norm)."""
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("n", _norm(F.col("v")))
    buckets = srp_buckets(emb, planes)
    eb = e.join(buckets, "vec_id")
    q = eb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv"),
        F.col("n").alias("qn"), "bucket"
    )
    # explicit broadcast of the n_queries-row side (r10, see ivf_topk:
    # the estimate-driven plan was a sort-merge join shuffling every
    # candidate by the low-cardinality bucket key)
    scored = (
        F.broadcast(q).join(eb, "bucket")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            F.round(_cos_pre(F.col("qv"), F.col("qn"), F.col("v"), F.col("n")), 4).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "n_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("q_id", "rnk")
    )


def pq_encode(emb: DataFrame, codebooks: DataFrame) -> DataFrame:
    """Product-quantization encode: each vector becomes M uint8-range
    codes (one per dimension subspace) — the MEMORY scale path IVF
    lacks (r9): at 10^9 x 64-dim float vectors the raw corpus is
    ~256 GB/replica, the PQ codes are ~8 GB and the ADC scan never
    touches the raw vectors.

    ``codebooks`` rows are (sub, code, dim, value) with GLOBAL dim
    indices (fixtures/pq_codebooks.parquet — deterministic per-
    subspace numpy k-means over the sf0.001 embeddings, committed so
    every engine computes identical codes; any fixed codebook is
    CORRECT, training only affects recall). The assignment is the
    same join-aggregate shape as ivf_assign: posexplode(embedding)
    ⋈ broadcast(codebooks) on dim, partial-sum of squared deltas per
    (vec, sub, code), argmin per (vec, sub) — distributes at 10^9
    vectors with no UDF and no skew (the groupBy key is
    high-entropy (vec_id, sub, code))."""
    comp = spread(emb.select("vec_id", "embedding")).select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"),
    )
    d2 = (
        comp.join(F.broadcast(codebooks), "dim")
        .groupBy("vec_id", "sub", "code")
        .agg(F.sum((F.col("x") - F.col("value")) ** 2).alias("d2"))
    )
    wmin = Window.partitionBy("vec_id", "sub").orderBy("d2", "code")
    best = d2.withColumn("rn", F.row_number().over(wmin)).filter(F.col("rn") == 1)
    return best.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "code"))),
            lambda s: s["code"],
        ).alias("codes")
    )


def _l2(av, bv):
    return F.aggregate(
        F.zip_with(av, bv, lambda p, q: (p - q) * (p - q)),
        F.lit(0.0),
        lambda s, t: s + t,
    )


def pq_topk(
    emb: DataFrame,
    codebooks: DataFrame,
    k: int = 5,
    n_queries: int = 10,
    rerank: int = 0,
    codes: DataFrame | None = None,
) -> DataFrame:
    """PQ ANN via asymmetric distance computation (ADC): each query
    builds its per-(sub, code) squared-distance table from the raw
    codebooks (tiny: M x K rows per query, broadcast), and every
    corpus vector is scored as the SUM of table lookups over its M
    codes — approximate L2, no raw corpus vector ever read at scan
    time. Returns (q_id, n_id, dist) top-k ascending. The corpus
    side is one explode + broadcast-join + partial-agg: the only
    shuffle is the (q_id, vec_id) aggregation, whose key is
    high-entropy by construction.

    ``rerank`` > 0 is the production IVFADC+rerank shape: the ADC
    scan prunes the corpus to a per-query shortlist of that size,
    and ONLY those rows' raw vectors are read back for an exact-L2
    re-rank — at 10^9 vectors the scan stays code-only (M bytes/
    vector) while recall is set by shortlist containment, not ADC
    resolution (measured on the 500-vector near-random fixture:
    raw-ADC recall@5 0.22, shortlist-50 rerank 0.68).

    ``codes`` is the deployment shape: a precomputed pq_encode frame
    (typically a stored table — pq_encode is the one-time index
    build; the recurring scan then reads 8 B/vector codes instead of
    re-encoding from raw vectors). Measured at sf0.1: the
    stored-codes scan beats even brute force at 2,000 vectors and
    the codes parquet is 44.7x smaller at rest (BENCH.md r9 ANN
    table)."""
    enc = pq_encode(emb, codebooks) if codes is None else codes
    qtab = (
        emb.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("q_id"),
            F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"),
        )
        .join(F.broadcast(codebooks), "dim")
        .groupBy("q_id", "sub", "code")
        .agg(F.sum((F.col("x") - F.col("value")) ** 2).alias("pd2"))
    )
    cand = enc.select("vec_id", F.posexplode("codes").alias("sub", "code"))
    scored = (
        cand.join(F.broadcast(qtab), ["sub", "code"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", F.col("vec_id").alias("n_id"))
        .agg(F.round(F.sum("pd2"), 4).alias("dist"))
    )
    w = Window.partitionBy("q_id").orderBy("dist", "n_id")
    if not rerank:
        return (
            scored.withColumn("rnk", F.row_number().over(w))
            .filter(F.col("rnk") <= k)
            .orderBy("q_id", "rnk")
        )
    short = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= rerank)
        .select("q_id", "n_id")
    )
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    q = F.broadcast(
        e.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
        )
    )
    exact = (
        short.join(e, short["n_id"] == e["vec_id"])
        .join(q, "q_id")
        .select("q_id", "n_id", F.round(_l2(F.col("qv"), F.col("v")), 4).alias("dist"))
    )
    w2 = Window.partitionBy("q_id").orderBy("dist", "n_id")
    return (
        exact.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= k)
        .orderBy("q_id", "rnk")
    )


def ivfpq_topk(
    emb: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    k: int = 5,
    n_queries: int = 10,
    n_probe: int = 2,
    rerank: int = 50,
    codes: DataFrame | None = None,
    buckets: DataFrame | None = None,
) -> DataFrame:
    """The composed 10^9-vector deployment shape (IVFADC): IVF
    buckets prune WHICH vectors are scanned (~n_probe/k_centroids of
    the corpus), PQ codes prune the BYTES each scanned vector costs
    (M bytes, no raw read), and the exact-L2 rerank touches raw
    vectors only for the per-query shortlist. Every stage reuses the
    audited pieces: ivf_assign buckets, pq_encode codes, the ADC
    broadcast-join scan, the pq_topk rerank. Joins broadcast the
    tiny side (probes, ADC tables, query vectors); the only corpus
    shuffles are the assignment/encode aggregations and the final
    (q_id, n_id) partial-agg — all high-entropy keys.

    ``codes`` / ``buckets`` are the deployment shape: precomputed
    pq_encode / ivf_assign frames (stored index tables) so the
    recurring query never re-encodes or re-assigns the corpus."""
    if buckets is None:
        buckets = ivf_assign(emb, centroids)
    enc = pq_encode(emb, codebooks) if codes is None else codes
    cand = enc.join(buckets, "vec_id").select(
        "vec_id", "bucket", F.posexplode("codes").alias("sub", "code")
    )
    qscores = _centroid_scores(emb.filter(F.col("vec_id") < n_queries), centroids)
    wq = Window.partitionBy("vec_id").orderBy(F.desc("c_cos"), "centroid_id")
    probes = (
        qscores.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= n_probe)
        .select(F.col("vec_id").alias("q_id"), F.col("centroid_id").alias("bucket"))
    )
    qtab = (
        emb.filter(F.col("vec_id") < n_queries)
        .select(
            F.col("vec_id").alias("q_id"),
            F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"),
        )
        .join(F.broadcast(codebooks), "dim")
        .groupBy("q_id", "sub", "code")
        .agg(F.sum((F.col("x") - F.col("value")) ** 2).alias("pd2"))
    )
    scored = (
        cand.join(F.broadcast(probes), "bucket")
        # one contribution per (q_id, vec_id, sub) (ADVICE r9 #2): a
        # stored multi-probe ``buckets`` table (ivf_assign_multi) can
        # list a vector in two probed buckets, which would double its
        # pd2 rows in the ADC sum and corrupt the shortlist. For the
        # single-probe ivf_assign shape the key is already unique, so
        # this is a pure no-op there (duplicate rows are identical —
        # same code, same pd2 — so which one survives is immaterial).
        .dropDuplicates(["q_id", "vec_id", "sub"])
        .join(F.broadcast(qtab), ["q_id", "sub", "code"])
        .filter(F.col("vec_id") != F.col("q_id"))
        .groupBy("q_id", F.col("vec_id").alias("n_id"))
        .agg(F.round(F.sum("pd2"), 4).alias("dist"))
    )
    w = Window.partitionBy("q_id").orderBy("dist", "n_id")
    short = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= rerank)
        .select("q_id", "n_id")
    )
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    q = F.broadcast(
        e.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
        )
    )
    exact = (
        short.join(e, short["n_id"] == e["vec_id"])
        .join(q, "q_id")
        .select("q_id", "n_id", F.round(_l2(F.col("qv"), F.col("v")), 4).alias("dist"))
    )
    w2 = Window.partitionBy("q_id").orderBy("dist", "n_id")
    return (
        exact.withColumn("rnk", F.row_number().over(w2))
        .filter(F.col("rnk") <= k)
        .orderBy("q_id", "rnk")
    )

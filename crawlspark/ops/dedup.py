"""Deduplication operators over `documents` (build brief: exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup).

Portability contract: exact/minhash/jaccard use md5 (present and
identical in Spark and DuckDB) so every hash-derived value is
cross-engine checkable; simhash does its 64-bit bit surgery in a
pandas UDF AND is still fully oracle-checked — the DuckDB twin
recomputes the per-bit majority vote in HUGEINT SQL from the same
md5 word hashes (__spark_entry__.oracle_sql()['docs_simhash']).

Scale shape (the 100 TB view):
- exact_dedup: one hash-groupBy shuffle on a 32-hex key — minimal.
- minhash_lsh: one gram shuffle for the signatures, then ONE
  groupBy on (band_idx, band_hash) with in-bucket i<j pair
  expansion — band hash is high-entropy so it's skew-free by
  construction; pair output is bounded by true near-dups, never
  O(n²); run exact-dedup first so no giant identical-text bucket
  inflates a collect_list row.
- ngram_jaccard: exact pairwise check — only sane when blocked
  (here: per `source`); at scale this runs AFTER lsh as the verify
  stage on candidate pairs.
- embedding_neardup: label-blocked cosine pairs (IVF-style bucketing
  is in ops/similarity.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import spread

__all__ = [
    "exact_dedup", "minhash_signatures", "minhash_lsh_pairs",
    "lsh_verified_pairs", "ngram_jaccard_pairs", "simhash",
    "simhash_neardup", "embedding_neardup", "embedding_neardup_ivf",
    "cc_labels", "dup_labels", "dup_clusters", "dedup_materialize",
]

_WS = r"\s+"


def _md5(col):
    return F.md5(F.encode(col, "utf-8"))


def exact_dedup(docs: DataFrame) -> DataFrame:
    """Exact dedup via content hash: one row per distinct content,
    with group size and the member ids (kept = min id, the usual
    'first wins' policy)."""
    return (
        docs.groupBy(_md5(F.col("text")).alias("content_hash"))
        .agg(
            F.count("*").alias("n_dups"),
            F.min("doc_id").alias("keep_doc_id"),
            F.concat_ws(",", F.array_sort(F.collect_set(F.col("doc_id").cast("string")))).alias(
                "doc_ids"
            ),
        )
        .orderBy(F.desc("n_dups"), "content_hash")
    )


def _shingles(shingle_words: int):
    """Word shingles via iterated zip_with of the split array with
    its own shifted slices — NOT transform(sequence(i), i ->
    slice(words, i, k)): a lambda body that references the outer
    ``words`` expression re-evaluates the split once PER ELEMENT
    (O(words²) splits per doc), and binding words to a helper column
    doesn't survive Catalyst's cache-build / collapsed-projection
    re-inlining. zip_with's ARGUMENTS are evaluated once per ROW and
    its lambda sees only elements, so this form is structurally
    immune. Measured 4.6 s -> 0.5 s for the sf0.1 shingle stage,
    bit-identical gram values: concat_ws skips the null padding on
    the shorter shifted side, the final slice drops trailing partial
    windows, and a doc shorter than the window keeps its single
    partial gram — exactly the old semantics and the DuckDB oracle's
    list-comprehension recompute."""
    w = F.split(F.trim("text"), _WS)
    n = F.size(w)
    sh = w
    for j in range(1, shingle_words):
        shifted = F.slice(w, j + 1, F.greatest(n - j, F.lit(1)))
        sh = F.zip_with(sh, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return F.slice(sh, 1, F.greatest(n - shingle_words + 1, F.lit(1)))


_MERSENNE31 = 2147483647


def _perm_consts(n_perm: int) -> list[tuple[int, int]]:
    """Deterministic universal-hash (a, b) pairs for the minhash
    permutation family h_i(g) = (a_i*g + b_i) mod 2^31-1, derived by
    splitmix64 from a fixed seed. The multipliers must be mutually
    UNRELATED: an arithmetic family like a_i = c*(i+1) makes
    h_2 = 2*h_1 + const (mod p), whose argmins coincide for small
    values — the 16 "independent" permutations collapse into a few,
    inflating every band-collision estimate (measured: 388 -> 46k
    pairs at sf0.1 before this fix). The DuckDB oracle embeds THESE
    literals (generated from this function by
    __spark_entry__.oracle_sql) so both engines permute identically."""
    mask = (1 << 64) - 1
    x = 0x243F6A8885A308D3  # pi fractional hex, fixed seed

    def nxt() -> int:
        nonlocal x
        x = (x + 0x9E3779B97F4A7C15) & mask
        z = x
        z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & mask
        z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & mask
        return z ^ (z >> 31)

    return [
        (nxt() % (_MERSENNE31 - 1) + 1, nxt() % _MERSENNE31) for i in range(n_perm)
    ]


def minhash_signatures(docs: DataFrame, n_perm: int = 16, shingle_words: int = 2) -> DataFrame:
    """MinHash signature via integer permutations: each shingle is
    hashed ONCE (g = first 7 hex chars of md5 as a 28-bit int — md5
    because it is the only hash present and identical in Spark and
    DuckDB), then perm i is the universal hash (a_i*g + b_i) mod
    2^31-1 — 16 multiply-adds in whole-stage codegen instead of the
    16 per-perm md5s of rounds 1-3 (the md5 calls were ~¾ of the
    signature stage's CPU; VERDICT r03 #7). 28-bit g keeps
    a_i*g + b_i < 2^59, safe under ANSI overflow checking in both
    engines. Signature component = min over shingles per perm.

    Relational shape (unchanged): explode shingles to ONE row per
    (doc, gram) and compute the n_perm hashes as n_perm COLUMNS
    aggregated by n_perm min()s in a single groupBy — one shuffle
    whose input is 1x the gram count (not n_perm x as a perm-explode
    would be). Map-side partial agg collapses per-partition
    duplicates before the wire. This is exactly how it distributes
    at 10^9 docs.

    The shingle+md5 work is pure per-row CPU chained on the scan, so
    it runs at the SCAN's parallelism — for a small parquet table
    that is 1-2 splits (r10: measured 3.2 s noop at sf1.0 for the
    gram explode alone, on 2 of 32 cores). ``spread`` raises narrow
    inputs to the session's parallelism first (no-op at real scale
    where scans already have >= 1 split/core); only (doc_id, text)
    cross the exchange."""
    grams = spread(docs.select("doc_id", "text")).select(
        "doc_id", F.explode(F.array_distinct(_shingles(shingle_words))).alias("g")
    )
    # one md5 per gram; Catalyst subexpression elimination evaluates
    # g64 once per row even though 16 projections reference it
    g64 = F.conv(F.substring(_md5(F.col("g")), 1, 7), 16, 10).cast("bigint")
    hashed = grams.select(
        "doc_id",
        *[
            F.pmod(F.lit(a) * g64 + F.lit(b), F.lit(_MERSENNE31)).alias(f"h{i}")
            for i, (a, b) in enumerate(_perm_consts(n_perm))
        ],
    )
    mins = hashed.groupBy("doc_id").agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(n_perm)]
    )
    return mins.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(n_perm)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    n_perm: int = 16,
    bands: int = 4,
    shingle_words: int = 2,
    max_bucket: int = 10_000,
    _edges_only: bool = False,
) -> DataFrame:
    """LSH banding: signature split into `bands` rows of
    n_perm/bands; band key = md5 of the concatenated band slice;
    candidate pairs = docs sharing any band key, scored by signature
    agreement (the MinHash Jaccard estimate).

    Pair generation is a groupBy on the band key with an in-bucket
    i<j expansion — NOT a band self-join: the self-join consumes the
    signature lineage twice (2x the gram shuffle), and materializing
    sigs to dodge that was worse (Spark's columnar cache build of 16
    md5-string columns measured 3-4 s against a 0.8 s recompute).
    One groupBy = one pass over sigs, and the 10^10-scale story is
    unchanged: the shuffle key is the high-entropy band hash, bucket
    cardinality = docs agreeing on a whole band ≈ true near-dup
    cluster size, and the i<j expansion emits exactly the rows the
    self-join would. Corpora with giant duplicate clusters should
    exact-dedup first (the pipeline does — dedup_materialize);
    ``max_bucket`` enforces that documented precondition: a bucket
    wider than it (an un-deduped giant identical-text cluster that
    would OOM the collect_list row AND emit O(width²) pairs) fails
    the job loudly with the fix in the message instead of dying in
    an executor (ADVICE r03). None disables the guard.

    ``_edges_only`` (r10, internal): emit just the DISTINCT
    (doc_a, doc_b) edge set — no est_jaccard, no global orderBy.
    est_jaccard is functionally determined by the pair (one signature
    per doc_id), so distinct-on-two-columns equals the public
    three-column distinct projected down; downstream set consumers
    (dup_labels' CC, lsh_verified_pairs' candidates) never read the
    estimate or the order, and the skipped orderBy would otherwise
    survive a persist/spill boundary as a real range-partitioned
    sort (the optimizer only eliminates it under a same-plan
    join/aggregate)."""
    rows_per_band = n_perm // bands
    sigs = minhash_signatures(docs, n_perm, shingle_words)
    sig_str = F.col("sig").cast("array<string>")
    banded = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        _md5(
                            F.concat_ws(
                                "|", F.slice(sig_str, b * rows_per_band + 1, rows_per_band)
                            )
                        ).alias("band_hash"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "sig", "band.band_idx", "band.band_hash")
    buckets = (
        banded.groupBy("band_idx", "band_hash")
        .agg(F.array_sort(F.collect_list(F.struct("doc_id", "sig"))).alias("ms"))
        .filter(F.size("ms") >= 2)
    )
    if max_bucket is not None:
        # the guard lives INSIDE the consumed `ms` expression so the
        # optimizer cannot prune it away
        buckets = buckets.withColumn(
            "ms",
            F.when(F.size("ms") <= F.lit(max_bucket), F.col("ms")).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit("minhash_lsh_pairs: LSH bucket of width "),
                        F.size("ms").cast("string"),
                        F.lit(
                            f" exceeds max_bucket={max_bucket} — a giant "
                            "identical-text cluster reached banding; run "
                            "exact_dedup/dedup_materialize first, or raise "
                            "max_bucket (None disables)"
                        ),
                    )
                )
            ),
        )
    # all i<j member pairs per bucket; the lambdas reference only the
    # bound `ms` attribute (cheap per-element), never a recomputed
    # expression — see _shingles for why that distinction matters.
    # No self-pairs possible: minhash_signatures groupBys doc_id (one
    # sig per id even for duplicate input rows) and banded emits one
    # row per (doc_id, band), so a doc_id appears at most once per
    # bucket and strict i<j matches the old join's doc_a < doc_b.
    ms = F.col("ms")
    pairs_arr = F.flatten(
        F.transform(
            ms,
            lambda x, i: F.transform(
                F.slice(ms, i + 2, F.greatest(F.size(ms) - i - 1, F.lit(1))),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )
    if _edges_only:
        return (
            buckets.select(F.explode(pairs_arr).alias("p"))
            .select(
                F.col("p.a.doc_id").alias("doc_a"),
                F.col("p.b.doc_id").alias("doc_b"),
            )
            .distinct()
        )
    pairs = (
        buckets.select(F.explode(pairs_arr).alias("p"))
        .select(
            F.col("p.a.doc_id").alias("doc_a"),
            F.col("p.b.doc_id").alias("doc_b"),
            F.round(
                F.size(
                    F.filter(
                        F.zip_with("p.a.sig", "p.b.sig", lambda x, y: x == y),
                        lambda eq: eq,
                    )
                )
                / F.lit(float(n_perm)),
                4,
            ).alias("est_jaccard"),
        )
        .distinct()
    )
    return pairs.orderBy(F.desc("est_jaccard"), "doc_a", "doc_b")


def lsh_verified_pairs(
    docs: DataFrame,
    n_perm: int = 16,
    bands: int = 4,
    shingle_words: int = 2,
    threshold: float = 0.3,
) -> DataFrame:
    """The production near-dup pipeline in one operator: LSH candidate
    generation (banded minhash — the RECALL stage) followed by exact
    n-gram Jaccard computed on ONLY the candidate pairs (the PRECISION
    stage that kills LSH false positives). At 100 TB the verify join
    touches |candidates| rows — bounded by true near-dups — never the
    all-pairs space; ngram_jaccard_pairs' source-blocking emulates
    this stage standalone. Both joins against the gram table are
    plain equi-joins on doc id (broadcastable when the candidate set
    is small, hash join otherwise).

    r10: the verify stage computes grams ONLY for docs that appear in
    a candidate pair. The previous shape joined the (tiny) candidate
    set against a full-corpus gram frame on each side — two more
    whole-corpus shingle passes whose rows were then discarded by the
    join (measured: ~2/3 of the sf1.0 leg). Candidates are spilled
    once (they feed three consumers — two id sides and the final
    join — and a lazy frame would re-run the whole LSH per consumer),
    then the corpus is pruned with a broadcast semi-join on the
    candidate ids — bounded by true near-dups, the operator's
    documented output bound — before any shingle is built."""
    from ..scratch import spill_and_reread

    cand = spill_and_reread(
        minhash_lsh_pairs(docs, n_perm, bands, shingle_words, _edges_only=True),
        "crawlspark-lshcand-",
    )
    ids = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    pruned = spread(
        docs.join(F.broadcast(ids), "doc_id", "semi").select("doc_id", "text")
    )
    g = pruned.select(
        "doc_id", F.array_distinct(_shingles(shingle_words)).alias("grams")
    )
    a = g.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("ga"))
    b = g.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size("ga") + F.size("gb") - inter
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(inter / F.greatest(union, F.lit(1)), 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy(F.desc("jaccard"), "doc_a", "doc_b")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    block_col: str = "source",
    shingle_words: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard within a blocking key (at scale: the
    verify stage on LSH candidates; here blocked by `source` to bound
    pairs).

    Computed via the inverted index, not per-pair array intersection:
    posting list (block, gram, doc) self-joined on (block, gram)
    counts |A∩B| only over grams the pair actually SHARES, so the
    all-pairs-in-block × O(|grams|) intersect work (measured 76 s at
    sf0.1) collapses to matching-gram join rows + one count groupBy
    (5 s, identical output). |A∪B| = |A|+|B|-|A∩B| from per-doc gram
    counts. Zero-overlap pairs never materialize, which is exactly
    right for any threshold > 0 (they have jaccard 0); the guard
    below keeps the equivalence honest.

    ``max_df`` (VERDICT r03 #5): stop-gram document-frequency
    pruning. A gram shared by m docs of a block contributes m(m-1)/2
    posting-join rows — one whole-block stop-gram turns the join
    quadratic. With ``max_df=m`` grams whose per-block document
    frequency exceeds m are dropped from the POSTING LIST ONLY
    (|A∪B| still uses full gram counts), so each surviving join gram
    costs <= m(m-1)/2 rows. Jaccard is then a lower bound: exact
    whenever no pruned gram is shared by a compared pair — in
    particular, bit-identical to max_df=None when no gram's block DF
    exceeds the cap (the oracle-checked `docs_ngram_jaccard_capped`
    configuration). Default None preserves the exact semantics; the
    LSH+verify composition (lsh_verified_pairs) avoids the issue
    entirely by never building block-wide postings."""
    if threshold <= 0:
        raise ValueError(
            "ngram_jaccard_pairs requires threshold > 0: the inverted-"
            "index formulation never materializes zero-overlap pairs"
        )
    sh = spread(docs.select("doc_id", block_col, "text")).select(
        "doc_id", block_col, F.array_distinct(_shingles(shingle_words)).alias("grams")
    )
    sizes = sh.select("doc_id", F.size("grams").alias("n"))
    posting = sh.select(block_col, "doc_id", F.explode("grams").alias("g"))
    if max_df is not None:
        # block-local DF via one map-side-combinable groupBy; the
        # high-DF gram list is tiny by construction (only grams above
        # the cap) so the prune join broadcasts
        stop = (
            posting.groupBy(block_col, "g")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > max_df)
            .select(block_col, "g")
        )
        posting = posting.join(F.broadcast(stop), [block_col, "g"], "left_anti")
    a, b = posting.alias("a"), posting.alias("b")
    inter = (
        a.join(
            b,
            (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
            & (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    na = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    return (
        inter.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("inter")
                / F.greatest(F.col("na") + F.col("nb") - F.col("inter"), F.lit(1)),
                4,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .orderBy(F.desc("jaccard"), "doc_a", "doc_b")
    )


def embedding_neardup_ivf(
    emb: DataFrame, centroids: DataFrame, threshold: float = 0.4, n_probe: int = 1
) -> DataFrame:
    """Embedding-cosine near-duplicates blocked by IVF bucket — the
    10^9-vector scale path embedding_neardup's label-blocking stands
    in for: vectors pair only within a shared inverted list
    (ops/similarity.ivf_assign / ivf_assign_multi, committed k-means
    fixture), so the pair space is sum-of-squared-bucket-sizes,
    bounded by k-means balance, never O(n²).

    ``n_probe=1`` is the classic single-probe tradeoff: a near-dup
    pair straddling a centroid boundary is missed. ``n_probe>=2``
    assigns each vector to its p nearest buckets (VERDICT r03 #3):
    the pair set is a SUPERSET of single-probe's (every shared
    nearest bucket still shared; asserted in tests together with the
    recall-vs-brute-force comparison), at ~p^2/2 x the in-bucket pair
    work. A pair sharing several probed buckets is scored once.

    r10 plan shape: vectors, norms AND the full probe array ride the
    assignment aggregate (first(v)/first(n) — constant per group, the
    ivf_topk carry pattern), and each bucket group crosses the Python
    boundary ONCE (similarity._bucket_pairs_scored): pairs are
    generated in-group (triu over vec_id-sorted members), multi-probe
    duplicates are dropped by the canonical-bucket bitmask (a pair is
    kept only where the group's bucket == min of its shared probe
    set — exactly the set the old ids-only distinct + re-join
    produced), and the cosine is the same ascending-element left fold
    as the interpreted _cos_pre (bit-identical surviving values).
    The only shuffles are the n-row assignment aggregate and the
    n*p-row bucket exchange — no O(pairs) exchange and no O(pairs)
    vector shipping anywhere."""
    from .similarity import _bucket_pairs_scored, _centroid_scores_carry

    probes = (
        _centroid_scores_carry(emb, centroids)
        .groupBy("vec_id")
        .agg(
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
                max(n_probe, 1),
            ).alias("tops"),
            F.first("v").alias("v"),
            F.first("n").alias("n"),
        )
        .select(
            "vec_id",
            F.col("tops").getField("cid").alias("buckets"),
            "v",
            "n",
        )
    )
    side = probes.withColumn("bucket", F.explode("buckets"))
    scored = _bucket_pairs_scored(side, canonical_filter=True)
    return (
        scored.select("vec_a", "vec_b", F.round(F.col("cosine"), 4).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .orderBy(F.desc("cosine"), "vec_a", "vec_b")
    )


def cc_labels(
    pairs: DataFrame,
    max_iters: int = 20,
    driver_threshold: int = 200_000,
    size_hint: int | None = None,
) -> DataFrame:
    """Connected components over an undirected pair graph
    (``doc_a``, ``doc_b`` columns, any orderable id type): returns
    (doc_id, label) where label = the component's min id.

    Graphs that FIT (edge count <= ``driver_threshold``, decided by
    ONE bounded collect) are solved with a driver-side union-find —
    identical min-id labels, zero iterative rounds (r05). The
    LSH/phash blocking that produces these graphs keeps the pair set
    bounded by true near-dups, and the distributed loop's O(diameter)
    scheduling rounds (~0.5 s each on this VM) dominated the two
    benched dedup pipelines at fixture scale. This is the same
    bounded-collect-behind-a-knob pattern as the engine's
    collected-robots gate: scale-safe because past the threshold the
    code falls through to the distributed shape below — iterative
    min-label propagation, one hash-join + min-agg per round, the
    standard 10^9-edge CC shape (each round persists and breaks
    lineage). Both paths are pinned label-equal in tests. 0 disables
    the driver path. Deterministic fixpoint -> DuckDB-oracle-checkable
    via a recursive CTE. Shared by the text near-dup pipeline
    (dup_labels) and the image phash pipeline
    (multimodal.image_dedup_materialize).

    Null ids carry no identity — pairs with a null endpoint are
    dropped up front in BOTH paths (code-review r05: the driver
    union-find would otherwise crash comparing None against real
    ids, while the distributed path silently emitted a (null, null)
    row; neither is a useful answer).

    Probe cost (ADVICE r05): deciding the path costs one
    limit(driver_threshold+1).collect() — up to ~threshold edge rows
    of driver transfer — on EVERY call, known-huge graph or not. A
    caller that already knows the edge count can pass ``size_hint``
    (any number > driver_threshold skips the probe and goes straight
    to the distributed loop); set driver_threshold=0 to opt out
    entirely."""
    pairs = (
        pairs.select("doc_a", "doc_b")
        .filter(F.col("doc_a").isNotNull() & F.col("doc_b").isNotNull())
        .persist()
    )
    if size_hint is not None and size_hint > driver_threshold:
        driver_threshold = 0  # known-huge: skip the probe
    if driver_threshold:
        head = pairs.limit(driver_threshold + 1).collect()
        if len(head) <= driver_threshold:
            spark = pairs.sparkSession
            dtype = pairs.schema["doc_a"].dataType
            pairs.unpersist()
            parent: dict = {}

            def find(x):
                root = x
                while parent.get(root, root) != root:
                    root = parent[root]
                while parent.get(x, x) != x:
                    parent[x], x = root, parent[x]
                return root

            nodes = set()
            for r in head:
                a, b = r["doc_a"], r["doc_b"]
                nodes.add(a)
                nodes.add(b)
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[ra] = rb
            comp_min: dict = {}
            for n in nodes:
                root = find(n)
                m = comp_min.get(root)
                if m is None or n < m:
                    comp_min[root] = n
            rows = sorted((n, comp_min[find(n)]) for n in nodes)
            schema = T.StructType(
                [T.StructField("doc_id", dtype), T.StructField("label", dtype)]
            )
            return spark.createDataFrame(rows, schema)
    edges = pairs.unionByName(
        pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    ).persist()
    prev = (
        edges.select(F.col("doc_a").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .persist()
    )
    labels = prev
    _cc_prev_spill: list = [None]  # last intermediate spill dir, if any
    for it in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges["doc_b"] == labels["doc_id"])
            .groupBy(F.col("doc_a").alias("nid"))
            .agg(F.min("label").alias("nlabel"))
        )
        # carry the change flag IN the label frame: one aggregate over
        # the freshly-persisted cache both materializes it and answers
        # convergence — r03 ran a second join + count job per round,
        # doubling the loop's job count (the scheduling floor was most
        # of dedup_materialize's wall time at fixture scale)
        new_labels = (
            labels.join(neighbor_min, labels["doc_id"] == F.col("nid"), "left")
            .select(
                "doc_id",
                F.least(F.col("label"), F.coalesce(F.col("nlabel"), F.col("label"))).alias("label"),
                (F.coalesce(F.col("nlabel"), F.col("label")) < F.col("label")).alias("_chg"),
            )
            .persist()
        )
        changed = new_labels.agg(F.sum(F.col("_chg").cast("int"))).first()[0]
        prev.unpersist()
        prev = new_labels
        labels = new_labels.drop("_chg")
        if not changed:
            break
        # persist caches DATA but not the LOGICAL plan: after ~20
        # stacked rounds the plan string alone OOMs the JVM (found by
        # the r05 chain-graph test) — spill to parquet every few
        # rounds so deep-diameter graphs keep a bounded plan; each
        # spill releases its superseded predecessor so disk stays at
        # <=2 label-set copies
        if (it + 1) % 4 == 0:
            from ..scratch import release as _release
            from ..scratch import spill_and_reread as _spill

            labels, d = _spill(labels, "crawlspark-cc-", return_dir=True)
            prev.unpersist()
            prev = labels
            if _cc_prev_spill[0] is not None:
                _release(_cc_prev_spill[0])
            _cc_prev_spill[0] = d
    from ..scratch import spill_and_reread

    out = spill_and_reread(labels, "crawlspark-cc-")
    edges.unpersist()
    prev.unpersist()
    pairs.unpersist()
    if _cc_prev_spill[0] is not None:
        from ..scratch import release

        release(_cc_prev_spill[0])  # superseded by the final spill above
    return out


def dup_labels(docs: DataFrame, n_perm: int = 16, bands: int = 4,
               shingle_words: int = 2, max_iters: int = 20) -> DataFrame:
    """(doc_id, label) for every doc that appears in the minhash-LSH
    near-dup graph, where label = the component's min doc_id (the
    canonical 'keep' doc) — cc_labels over the LSH pair graph.
    Uses the _edges_only LSH variant (r10): CC reads the pair frame
    as a set, and the public variant's est_jaccard + global orderBy
    would execute for real under cc_labels' persist boundary."""
    pairs = minhash_lsh_pairs(docs, n_perm, bands, shingle_words, _edges_only=True)
    return cc_labels(pairs, max_iters)


def dup_clusters(docs: DataFrame, n_perm: int = 16, bands: int = 4,
                 shingle_words: int = 2, max_iters: int = 20) -> DataFrame:
    """Near-dup clusters (one row per component) over the LSH graph —
    see dup_labels for the CC machinery."""
    labels = dup_labels(docs, n_perm, bands, shingle_words, max_iters)
    return (
        labels.groupBy(F.col("label").alias("cluster_id"))
        .agg(
            F.count("*").alias("n_docs"),
            F.concat_ws(",", F.array_sort(F.collect_set(F.col("doc_id").cast("string")))).alias(
                "doc_ids"
            ),
        )
        .orderBy("cluster_id")
    )


def dedup_materialize(docs: DataFrame, n_perm: int = 16, bands: int = 4,
                      shingle_words: int = 2) -> DataFrame:
    """THE dedup pipeline output: the surviving corpus after dropping
    every near-dup cluster member except its canonical keeper (min
    doc_id). Exact copies share all shingles -> identical signatures
    -> same cluster, so exact dedup is subsumed. Survivors = docs
    anti-joined against the non-keeper set — one extra hash join over
    dup_labels, no full-corpus shuffle of text payloads (only ids
    move)."""
    labels = dup_labels(docs, n_perm, bands, shingle_words)
    dropped = labels.filter(F.col("doc_id") != F.col("label")).select("doc_id")
    return (
        docs.join(dropped, "doc_id", "left_anti")
        .select("doc_id", "source", F.length("text").alias("n_chars_calc"))
        .orderBy("doc_id")
    )


def simhash(docs: DataFrame) -> DataFrame:
    """64-bit SimHash over word md5 hashes (vectorized numpy inside a
    pandas UDF; oracle-checked via a full HUGEINT bit-vote SQL
    recompute in the DuckDB twin)."""
    from ..shipping import ensure_shipped_df

    ensure_shipped_df(docs)

    @F.pandas_udf(T.LongType())
    def _simhash(texts: pd.Series) -> pd.Series:
        import hashlib

        out = np.empty(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            words = (t or "").split()
            if not words:
                out[i] = 0
                continue
            hs = np.array(
                [
                    int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
                    for w in words
                ],
                dtype=np.uint64,
            )
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
            v = (bits * 2 - 1).sum(axis=0)
            h = np.uint64(0)
            for bpos in np.nonzero(v > 0)[0]:
                h |= np.uint64(1) << np.uint64(bpos)
            out[i] = np.int64(h.astype(np.int64))
        return pd.Series(out)

    return (
        spread(docs.select("doc_id", "text"))
        .select("doc_id", _simhash(F.col("text")).alias("simhash64"))
        .orderBy("doc_id")
    )


def simhash_neardup(docs: DataFrame, max_hamming: int = 7, bands: int = 8) -> DataFrame:
    """SimHash near-dup pairs via band blocking: by pigeonhole, a pair
    within ``max_hamming`` < ``bands`` differing bits must agree
    exactly on at least one of the ``bands`` 8-bit bands; candidates
    join on (band_idx, band_bits), verified by bit_count of the xor —
    blocking + verify all JVM-side."""
    if max_hamming >= bands:
        raise ValueError(
            f"banded blocking guarantees recall only for max_hamming < bands "
            f"(got max_hamming={max_hamming}, bands={bands})"
        )
    width = 64 // bands
    mask = (1 << width) - 1
    h = simhash(docs)
    banded = h.select(
        "doc_id",
        "simhash64",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_idx"),
                        F.shiftrightunsigned("simhash64", b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("band_bits"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash64", "band.band_idx", "band.band_bits")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_bits") == F.col("b.band_bits"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash64").bitwiseXOR(F.col("b.simhash64"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
        .orderBy("hamming", "doc_a", "doc_b")
    )


def embedding_neardup(
    emb: DataFrame, threshold: float = 0.92, block_col: str = "label"
) -> DataFrame:
    """Embedding-cosine near-duplicates, blocked to avoid O(n²)
    (label here; IVF buckets at scale). Norms hoisted per vector
    (r10, similarity._norm); the in-block pair stage is scored by the
    numpy-batched mapInArrow fold (similarity._scored_pairs_arrow),
    bit-identical to the interpreted zip_with/aggregate cosine."""
    from .similarity import _norm, _scored_pairs_arrow

    e = spread(
        emb.select("vec_id", block_col, F.col("embedding").cast("array<double>").alias("v"))
    ).withColumn("n", _norm(F.col("v")))
    a, b = e.alias("a"), e.alias("b")
    joined = a.join(
        b,
        (F.col(f"a.{block_col}") == F.col(f"b.{block_col}"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        F.col("a.v").alias("va"),
        F.col("a.n").alias("na"),
        F.col("b.v").alias("vb"),
        F.col("b.n").alias("nb"),
    )
    scored = _scored_pairs_arrow(joined)
    return (
        scored.select("vec_a", "vec_b", F.round(F.col("cosine"), 4).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
        .orderBy(F.desc("cosine"), "vec_a", "vec_b")
    )

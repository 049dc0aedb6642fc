"""The reference's BigQuery analysis corpus (/root/reference/sql/*.sql
and the notebook) re-expressed as native DataFrame queries — the §2B
operator surface of SURVEY.md.

Every function takes the crawl-results DataFrame (nested Result
schema) and returns a DataFrame with FLAT, explicitly aliased columns
so the DuckDB oracle (same SQL in __spark_entry__.oracle_sql) hashes
identically. All operators stay JVM-side: higher-order functions
(filter/exists) replace BigQuery's correlated UNNEST subqueries, a
groupBy+join replaces the COUNT(DISTINCT ... ) OVER window Spark
disallows (documented rewrite, SURVEY.md B6) — no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "duplicate_body", "duplicate_title", "inlinks", "hreflang_reciprocity",
    "noindex", "self_canonical", "sf_emulation", "status_histogram",
    "depth_histogram", "link_graph", "graph_depths", "pagerank",
]


def duplicate_body(crawl: DataFrame) -> DataFrame:
    """sql/duplicate_body.sql — groups of pages sharing a body hash.
    ARRAY_AGG(DISTINCT ...) flattened to a sorted CSV for cross-engine
    value comparison."""
    return (
        crawl.groupBy("BodyTextHash")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set(F.col("Address.Full")))).alias("Examples"),
            F.count("*").alias("N"),
        )
        .select("Examples", "BodyTextHash", "N")
        .orderBy(F.desc("N"), "BodyTextHash")
    )


def duplicate_title(crawl: DataFrame) -> DataFrame:
    """sql/duplicate_title.sql — pages sharing a non-empty title."""
    r = crawl.groupBy("Title").agg(F.count("*").alias("N"))
    return (
        crawl.join(r, "Title")
        .filter((F.col("Title") != "") & (F.col("N") > 1) & (F.col("StatusCode") == 200))
        .select(F.col("Address.Full").alias("FullAddress"), "Title", "N")
        .orderBy(F.desc("N"), F.desc("Title"), "FullAddress")
    )


def inlinks(crawl: DataFrame) -> DataFrame:
    """sql/inlinks.sql — inlink counts for every link target, joined
    back to the crawl (targets may be uncrawled -> null StatusCode)."""
    r = (
        crawl.select(F.col("Address"), F.explode("Links").alias("link"))
        .groupBy(F.col("link.Address.Full").alias("FullAddress"))
        .agg(F.count("Address").alias("InLinks"))
    )
    return (
        r.join(crawl, r["FullAddress"] == crawl["Address.Full"], "left")
        .select("FullAddress", "StatusCode", "InLinks")
        .orderBy(F.desc("InLinks"), "FullAddress", "StatusCode")
    )


def hreflang_reciprocity(crawl: DataFrame) -> DataFrame:
    """sql/hreflang.sql — every hreflang edge with reciprocation flag.
    The correlated `IN (SELECT ... FROM UNNEST(q.Hreflang))` becomes a
    higher-order `exists` over the target page's Hreflang array."""
    q = crawl.select(
        F.col("Address.Full").alias("FullAddress"), "Hreflang", "StatusCode"
    )
    r = (
        q.select(
            F.col("FullAddress").alias("SourceAddress"),
            F.explode("Hreflang").alias("target"),
        )
        .select(
            "SourceAddress",
            F.col("target.Address.Full").alias("FullAddress"),
            F.col("target.Hreflang").alias("HreflangCode"),
        )
        .distinct()
    )
    joined = r.join(q, "FullAddress", "left")
    return (
        joined.select(
            "SourceAddress",
            F.col("FullAddress").alias("TargetAddress"),
            "HreflangCode",
            F.coalesce(
                F.exists("Hreflang", lambda t: t["Address"]["Full"] == F.col("SourceAddress")),
                F.lit(False),
            ).alias("Reciprocated"),
            F.col("StatusCode").alias("TargetStatusCode"),
        )
        .distinct()
        .orderBy("SourceAddress", "TargetAddress", "HreflangCode")
    )


def noindex(crawl: DataFrame) -> DataFrame:
    """sql/noindex.sql — REGEXP_CONTAINS(Robots, r'\\bnoindex\\b')."""
    return crawl.select(
        F.col("Address.Full").alias("FullAddress"),
        F.col("Robots").rlike(r"\bnoindex\b").alias("Noindex"),
    ).orderBy("FullAddress", "Noindex")


def self_canonical(crawl: DataFrame) -> DataFrame:
    """sql/self_canonical.sql — struct-equality canonical check."""
    return crawl.select(
        F.col("Address.Full").alias("FullAddress"),
        F.coalesce(F.col("Address") == F.col("Canonical.Address"), F.lit(False)).alias(
            "SelfCanonical"
        ),
    ).orderBy("FullAddress", "SelfCanonical")


def sf_emulation(crawl: DataFrame) -> DataFrame:
    """sql/sf_emulation.sql — the ScreamingFrog-style wide report.
    COUNT(DISTINCT source) OVER (PARTITION BY target) is rewritten as
    groupBy(target).agg(countDistinct(source)) (SURVEY.md B6: Spark
    disallows DISTINCT windows; identical result)."""
    q = crawl.withColumn(
        "HasOtherCanonical",
        F.coalesce(F.col("Address.Full") != F.col("Canonical.Address.Full"), F.lit(True)),
    ).withColumn(
        "Noindex", F.col("Robots").rlike(r"\bnoindex\b")
    ).withColumn(
        "Nofollow", F.col("Robots").rlike(r"\bnofollow\b")
    )
    r = (
        q.select(F.col("Address.Full").alias("_src"), F.explode("Links").alias("target"))
        .groupBy(F.col("target.Address.Full").alias("FullAddress"))
        .agg(F.countDistinct("_src").alias("InLinks"))
    )
    joined = q.join(r, q["Address.Full"] == r["FullAddress"], "left").filter(
        F.col("Address").isNotNull()
    )
    return (
        joined.select(
            "Depth",
            "FullAddress",
            # F.get is null-safe out-of-bounds (ANSI mode is on; element_at throws)
            F.get(F.filter("Header", lambda h: h["K"] == "Content-Type"), 0)["V"].alias(
                "ContentType"
            ),
            "Status",
            "StatusCode",
            "Title",
            F.count("*").over(Window.partitionBy("Title")).alias("TitleCount"),
            F.length("Title").alias("TitleLength"),
            "H1",
            F.length("H1").alias("H1Length"),
            F.col("Canonical.Address.Full").alias("Canonical"),
            "Description",
            "Robots",
            "Noindex",
            "Nofollow",
            (~((F.col("StatusCode") != 200) | F.col("Noindex") | F.col("HasOtherCanonical"))).alias(
                "Indexable"
            ),
            "InLinks",
            "BodyTextHash",
            F.count("*").over(Window.partitionBy("BodyTextHash")).alias("BodyCount"),
        )
        .distinct()
        .orderBy("Depth", "FullAddress")
    )


def status_histogram(crawl: DataFrame) -> DataFrame:
    """notebook: crawl status distribution."""
    return (
        crawl.groupBy("Status", "StatusCode")
        .agg(F.count("*").alias("N"))
        .orderBy(F.desc("N"), "Status")
    )


def depth_histogram(crawl: DataFrame) -> DataFrame:
    """notebook: pages per depth."""
    return crawl.groupBy("Depth").agg(F.count("*").alias("N")).orderBy("Depth")


def link_graph(crawl: DataFrame) -> DataFrame:
    """notebook link_graph: flattened source->target edge list."""
    return (
        crawl.select(F.col("Address.Full").alias("Source"), F.explode("Links").alias("link"))
        .select(
            "Source",
            F.col("link.Address.Full").alias("Target"),
            F.col("link.Anchor").alias("Anchor"),
            F.col("link.Nofollow").alias("Nofollow"),
        )
        .orderBy("Source", "Target", "Anchor")
    )


def graph_depths(crawl: DataFrame, host: str, root: str = "/", max_iters: int = 20) -> DataFrame:
    """notebook `calculate_depths` (Analysis with crawl.ipynb cell 24):
    recompute BFS depth per path from the link graph rooted at
    ``root``, restricted to ``host`` — the reference does this as a
    driver-side deque loop over a pandas frame; here it is iterative
    min-depth propagation over the edge DataFrame (one hash-join +
    min-agg per round, O(eccentricity) rounds — the same distributed
    loop shape as ops/dedup.cc_labels, so it scales to link graphs
    that never fit one machine). Fixpoint is detected by (node count,
    total depth) stabilizing — both monotone under min-propagation.
    DuckDB twin: bounded recursive-CTE walk with min() per node."""
    edges = (
        crawl.filter(F.col("Address.Host") == host)
        .select(F.col("Address.Path").alias("src"), F.explode("Links").alias("l"))
        .filter(F.col("l.Address.Host") == host)
        .select("src", F.col("l.Address.Path").alias("dst"))
        .distinct()
        .persist()
    )
    spark = crawl.sparkSession
    depths = spark.createDataFrame([(root, 0)], "node string, depth int")
    prev_frame = None
    prev = (1, 0)
    prev_spill = None
    from .scratch import release, spill_and_reread

    for it in range(max_iters):
        nxt = (
            depths.join(edges, depths["node"] == edges["src"])
            .select(F.col("dst").alias("node"), (F.col("depth") + 1).alias("depth"))
        )
        depths = (
            depths.unionByName(nxt)
            .groupBy("node")
            .agg(F.min("depth").alias("depth"))
            .persist()
        )
        agg = depths.agg(F.count("*"), F.sum("depth")).collect()[0]
        if prev_frame is not None:
            prev_frame.unpersist()
        prev_frame = depths
        cur = (agg[0], agg[1])
        if cur == prev:
            break
        prev = cur
        # persist caches data, not the logical plan — deep BFS walks
        # would OOM the JVM building the stacked plan string (same
        # latent bug found in cc_labels, r05): spill lineage every 4
        # rounds; each spill releases its superseded predecessor so
        # disk stays at <=2 depth-set copies
        if (it + 1) % 4 == 0:
            depths, d = spill_and_reread(depths, "crawlspark-bfs-", return_dir=True)
            prev_frame.unpersist()
            prev_frame = depths
            if prev_spill is not None:
                release(prev_spill)
            prev_spill = d

    out = spill_and_reread(depths, "crawlspark-bfs-")
    edges.unpersist()
    depths.unpersist()
    if prev_spill is not None:
        release(prev_spill)  # superseded by the final spill above
    return out.orderBy("depth", "node")


def pagerank(
    crawl: DataFrame,
    host: str,
    iters: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """PageRank over the intra-host link graph (r9) — the global-
    importance refinement of the inlinks count (sql/inlinks.sql is
    the reference's proxy; the reference defers anything iterative
    to the notebook). Fixed ``iters`` power-iteration rounds with
    uniform dangling-mass redistribution — deterministic given the
    graph, no convergence probe.

    Scale shapes (the graph_depths/cc_labels distributed-loop
    pattern): edges carry a precomputed 1/out-degree weight (one
    join before the loop, persisted); each round is ONE rank x edge
    hash-join + sum-agg per dst; the dangling node set is static
    (computed once) and its per-round mass is a single-scalar agg —
    the bounded-collect exception (analysis.py precedent). Lineage
    spills every 4 rounds so a 50-iteration run never stacks a plan
    (CLAUDE.md: persist caches DATA, not the LOGICAL PLAN)."""
    from .scratch import release, spill_and_reread

    edges = (
        crawl.filter(F.col("Address.Host") == host)
        .select(F.col("Address.Path").alias("src"), F.explode("Links").alias("l"))
        .filter(F.col("l.Address.Host") == host)
        .select("src", F.col("l.Address.Path").alias("dst"))
        .distinct()
        .persist()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n = nodes.count()
    if n == 0:
        edges.unpersist()
        nodes.unpersist()
        return crawl.sparkSession.createDataFrame([], "node string, rank double")
    outdeg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    ew = (
        edges.join(outdeg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("deg")).alias("w"))
        .persist()
    )
    dangling = nodes.join(
        edges.select(F.col("src").alias("node")).distinct(), "node", "left_anti"
    ).persist()
    # each round's ranks frame is read twice (dangling-mass agg +
    # contribution join) — persist per round, unpersist the
    # predecessor; narrow (string, double) rows, safe to cache
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank")).persist()
    prev_spill = None
    for it in range(iters):
        d_mass = (
            ranks.join(dangling, "node", "left_semi").agg(F.sum("rank")).collect()[0][0]
            or 0.0
        )
        contribs = (
            ranks.join(ew, ranks["node"] == ew["src"])
            .select(F.col("dst").alias("node"), (F.col("rank") * F.col("w")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inmass"))
        )
        base = (1.0 - damping) / n + damping * d_mass / n
        prev_ranks = ranks
        ranks = (
            nodes.join(contribs, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("inmass"), F.lit(0.0))
                ).alias("rank"),
            )
            .persist()
        )
        if (it + 1) % 4 == 0:
            staged = ranks
            ranks, d = spill_and_reread(ranks, "crawlspark-pr-", return_dir=True)
            staged.unpersist()  # superseded by the parquet reread
            if prev_spill is not None:
                release(prev_spill)
            prev_spill = d
        prev_ranks.unpersist()
    out = spill_and_reread(ranks, "crawlspark-pr-")
    ranks.unpersist()
    for f in (edges, nodes, ew, dangling):
        f.unpersist()
    if prev_spill is not None:
        release(prev_spill)
    return out.orderBy(F.desc("rank"), "node")

"""End-to-end engine tests: the Spark wave loop must exact-match the
sequential oracle on emitted row multiset, seen-set and the
(depth, priority, url) determinism contract (SURVEY.md §5, §7.6),
including the reference's 156-row BFS law (server_test.go:61-116).
"""

import json

import pytest

from crawlspark import oracle, testkit
from crawlspark.config import CrawlConfig
from crawlspark.engine import SparkCrawler


def _oracle_run(cfg, pages_pdf, robots_pdf):
    pages = {r["url"]: r for r in pages_pdf.to_dict("records")}
    rob = {
        (r["scheme"], r["host"]): (r["status_code"], r["body"])
        for r in robots_pdf.to_dict("records")
    }
    return oracle.crawl_oracle(cfg, pages, rob)


def _normalize_row(d: dict) -> str:
    """Canonical JSON of a result row for multiset comparison."""
    return json.dumps(d, sort_keys=True, default=str)


def _engine_rows(crawler):
    cols = [f.name for f in crawler.results().schema.fields if not f.name.startswith("_")]
    rows = []
    for r in crawler.results(ordered=True).select(*cols).collect():
        d = r.asDict(recursive=True)
        d.pop("Payload", None)
        rows.append(d)
    return rows


def _oracle_rows(results):
    rows = []
    for depth, priority, url_key, res in results:
        d = dict(res)
        d["Priority"] = priority
        d["UrlKey"] = url_key
        rows.append(d)
    return rows


def _assert_match(crawler, oracle_out):
    results, seen, _ = oracle_out
    engine_rows = _engine_rows(crawler)
    oracle_rows = _oracle_rows(results)
    assert len(engine_rows) == len(oracle_rows)
    # exact multiset match of full nested rows
    assert sorted(map(_normalize_row, engine_rows)) == sorted(map(_normalize_row, oracle_rows))
    # seen-set exact match
    engine_seen = {r["url_key"] for r in crawler.seen().collect()}
    assert engine_seen == seen
    # determinism contract: engine output is (Depth, Priority, UrlKey)-sorted
    keys = [(r["Depth"], r["Priority"], r["UrlKey"]) for r in engine_rows]
    assert keys == sorted(keys)


@pytest.fixture(scope="module")
def nice(spark, tmp_path_factory):
    pages_pdf, robots_pdf, seeds = testkit.nice_site()
    cfg = CrawlConfig(From=seeds, MaxDepth=3, RespectNofollow=True, Connections=20)
    crawler = SparkCrawler(
        spark,
        cfg,
        testkit.pages_to_spark(spark, pages_pdf),
        testkit.robots_to_spark(spark, robots_pdf),
        workdir=str(tmp_path_factory.mktemp("nice")),
    )
    crawler.run()
    return crawler, _oracle_run(cfg, pages_pdf, robots_pdf)


def test_156_row_law(nice):
    crawler, (results, seen, _) = nice
    # 1 + 5 + 25 + 125 followed children (server_test.go:52-59)
    assert crawler.results().count() == 156
    assert len(results) == 156


def test_nice_site_exact_match(nice):
    crawler, oracle_out = nice
    _assert_match(crawler, oracle_out)


def test_metrics_recorded(nice):
    crawler, _ = nice
    metrics = {m["wave"]: m for m in crawler.store.metrics() if m["wave"] >= 0}
    assert metrics[0]["fetched"] == 1
    assert metrics[1]["fetched"] == 5
    assert metrics[2]["fetched"] == 25
    assert metrics[3]["fetched"] == 125
    assert metrics[2]["enqueued"] == 125
    # per-partition lineage present in manifests
    man = crawler.store._manifests()[-1]
    info = man["tables"]["results"]
    assert info["rows"] > 0 and info["partitions"]


@pytest.fixture(scope="module")
def matrix(spark, tmp_path_factory):
    pages_pdf, robots_pdf, seeds = testkit.matrix_site()
    # the crawled trio img-0001..3 spans the codec matrix: qjpg
    # (lossy stand-in), webp (real lossless VP8L, r06), jpeg (real
    # baseline JFIF, r05) — the payload invariant runs on all three
    images_pdf = testkit.make_images(8, jpeg_every=3, webp_every=2)
    cfg = CrawlConfig(From=seeds, MaxDepth=3, RespectNofollow=False)
    crawler = SparkCrawler(
        spark,
        cfg,
        testkit.pages_to_spark(spark, pages_pdf),
        testkit.robots_to_spark(spark, robots_pdf),
        images_df=testkit.images_to_spark(spark, images_pdf),
        workdir=str(tmp_path_factory.mktemp("matrix")),
    )
    crawler.run()
    return crawler, _oracle_run(cfg, pages_pdf, robots_pdf)


def test_matrix_exact_match(matrix):
    crawler, oracle_out = matrix
    _assert_match(crawler, oracle_out)


def test_matrix_blocked_and_redirects(matrix):
    crawler, (results, _, _) = matrix
    df = crawler.results()
    blocked = df.filter(df.Status == "Blocked by robots.txt")
    assert blocked.count() == sum(
        1 for *_, r in results if r["Status"] == "Blocked by robots.txt"
    )
    # redirect targets entered the frontier (priority 1 rows exist)
    assert df.filter(df.Priority == 1).count() >= 2


def test_matrix_payload_invariant(matrix):
    """input_hint: decoded-pixel PSNR>=40dB + caption equality —
    across the full codec matrix (qjpg / real webp / real jpeg)."""
    crawler, _ = matrix
    from crawlspark import imagecodec

    rows = crawler.results().filter("Payload IS NOT NULL").collect()
    assert len(rows) == 3  # img/1..3 linked from root
    assert {r["Payload"]["Fmt"] for r in rows} == {"qjpg", "webp", "jpeg"}
    for r in rows:
        p = r["Payload"]
        assert p["PixelsOk"] is True
        assert p["Psnr"] >= 40.0
        if p["Fmt"] == "webp":  # lossless -> exact, PSNR infinite
            assert p["Psnr"] == float("inf")
        assert p["Caption"] == imagecodec.caption_for(p["ImageId"])


def test_duplicate_seeds_fetched_twice(matrix):
    crawler, _ = matrix
    df = crawler.results()
    # two identical seeds + one fragment seed -> 3 depth-0 rows,
    # all with the same fragmentless Address.Full (crawler.go:26-41)
    d0 = df.filter("Depth = 0").collect()
    assert len(d0) == 3
    assert {r["Address"]["Full"] for r in d0} == {"http://site-0.test/"}
    assert sorted(r["UrlKey"] for r in d0) == [
        "http://site-0.test/",
        "http://site-0.test/",
        "http://site-0.test/#frag",
    ]


def test_resume_mid_crawl(spark, tmp_path):
    """Kill after wave 1, resume: outputs identical to uninterrupted
    (north_rule resumability clause)."""
    pages_pdf, robots_pdf, seeds = testkit.nice_site(branching=4, max_id_len=3)
    cfg = CrawlConfig(From=seeds, MaxDepth=2, RespectNofollow=True)

    full = SparkCrawler(
        spark, cfg,
        testkit.pages_to_spark(spark, pages_pdf),
        testkit.robots_to_spark(spark, robots_pdf),
        workdir=str(tmp_path / "full"),
    )
    full.run()

    class Interrupted(Exception):
        pass

    part = SparkCrawler(
        spark, cfg,
        testkit.pages_to_spark(spark, pages_pdf),
        testkit.robots_to_spark(spark, robots_pdf),
        workdir=str(tmp_path / "part"),
    )
    orig = part._run_wave

    def boom(frontier, d, *args, **kwargs):
        if d >= 2:
            raise Interrupted()
        return orig(frontier, d, *args, **kwargs)

    part._run_wave = boom
    with pytest.raises(Interrupted):
        part.run()
    # simulate partial uncommitted wave-2 data left behind: resume
    part2 = SparkCrawler(
        spark, cfg,
        testkit.pages_to_spark(spark, pages_pdf),
        testkit.robots_to_spark(spark, robots_pdf),
        workdir=str(tmp_path / "part"),
    )
    part2.run(resume=True)

    a = [tuple(r) for r in full.results().select("Depth", "Priority", "UrlKey").collect()]
    b = [tuple(r) for r in part2.results().select("Depth", "Priority", "UrlKey").collect()]
    assert a == b
    assert {r["url_key"] for r in full.seen().collect()} == {
        r["url_key"] for r in part2.seen().collect()
    }


@pytest.mark.parametrize("mode", ["iterative", "rank_once"])
def test_budget_defer_preserves_sets(spark, tmp_path, mode):
    """per-host politeness budget defers, never drops: same emitted
    multiset + seen-set as unbudgeted (SURVEY.md §7.3) — under both
    sub-wave schedulers (the r8 rank-once plan and the iterative
    loop), with the hot-host salt-split active."""
    pages_pdf, robots_pdf, seeds = testkit.nice_site(branching=4, max_id_len=3)
    cfg = CrawlConfig(From=seeds, MaxDepth=2, RespectNofollow=True,
                      per_host_budget=3, hot_host_salt_threshold=5,
                      budget_plan=mode)
    crawler = SparkCrawler(
        spark, cfg,
        testkit.pages_to_spark(spark, pages_pdf),
        testkit.robots_to_spark(spark, robots_pdf),
        workdir=str(tmp_path / f"budget-{mode}"),
    )
    crawler.run()
    _assert_match(crawler, _oracle_run(cfg, pages_pdf, robots_pdf))
    # budget actually split waves: wave 1 has 2 followed children -> 1 subwave,
    # wave 2 has 4 -> at least 2 subwaves
    metrics = {m["wave"]: m for m in crawler.store.metrics() if m["wave"] >= 0}
    assert metrics[2]["subwaves"] >= 2


def test_budget_plan_contract(spark, tmp_path):
    """The rank-once plan (r8) satisfies the politeness contract the
    iterative loop guaranteed: per (host, salt slice, sub-wave) take
    <= slice budget, blocked rows all in sub-wave 0, every row
    assigned, sub-wave indexes contiguous from 0 — including with the
    hot-host salt-split active."""
    from pyspark.sql import functions as F

    from crawlspark.schema import FRONTIER_SCHEMA

    B, THRESH = 3, 10
    hosts = {"hot.test": 25, "warm.test": 7, "cold.test": 2}
    rows = []
    for h, n in hosts.items():
        for i in range(n):
            u = f"http://{h}/p{i:03d}"
            rows.append((u, u, 1, 2, None))
    frontier = spark.createDataFrame(rows, FRONTIER_SCHEMA)
    cfg = CrawlConfig(From=["http://hot.test/"], MaxDepth=1,
                      per_host_budget=B, hot_host_salt_threshold=THRESH)
    pages = testkit.pages_to_spark(
        spark, testkit.nice_site(branching=2, max_id_len=2)[0]
    )
    robots = spark.createDataFrame(
        [("http", h, 404, "") for h in hosts],
        "scheme string, host string, status_code int, body string",
    )
    c = SparkCrawler(spark, cfg, pages, robots,
                     workdir=str(tmp_path / "planned"))
    gated = c._gate(frontier)
    # block one host entirely: its rows must ride sub-wave 0 free
    gated = gated.withColumn(
        "_allowed", F.col("host") != F.lit("cold.test")
    )
    plan = c._budget_plan(gated, B)
    pdf = plan.select("url_key", "host", "_allowed", "_subwave").toPandas()
    assert len(pdf) == sum(hosts.values())  # every row assigned
    assert (pdf[~pdf["_allowed"]]["_subwave"] == 0).all()  # blocked ride sub-wave 0
    subs = sorted(pdf["_subwave"].unique())
    assert subs == list(range(len(subs))) and subs[0] == 0  # contiguous
    # per (host, sub-wave): allowed take <= ceil(B / n_slices) * n_slices
    # (the documented approximate per-host bound of the salted default)
    import math
    for h, n in hosts.items():
        if h == "cold.test":
            continue
        n_slices = max(1, math.ceil(n / THRESH))
        cap = math.ceil(B / n_slices) * n_slices
        got = pdf[(pdf["host"] == h) & pdf["_allowed"]].groupby("_subwave").size()
        assert (got <= cap).all(), (h, got)


def test_budget_exact_cap_under_skew(spark, tmp_path):
    """Opt-in exact-cap politeness (VERDICT r04 #5): with
    per_host_budget_exact the per-host take of every sub-wave is
    <= budget EXACTLY even when the hot-host salt-split is active
    (default ceil mode over-admits up to n_slices-1 — asserted here
    as the discriminator), the blocked rows still ride sub-wave 0
    budget-free, and the rotating remainder window drains the
    deferred set. Plus e2e: an exact-mode crawl still matches the
    sequential oracle (defer-never-drop unchanged)."""
    from pyspark.sql import functions as F

    B, THRESH = 7, 20
    cfg = CrawlConfig(From=["http://h0.test/"], MaxDepth=0,
                      per_host_budget=B, per_host_budget_exact=True,
                      hot_host_salt_threshold=THRESH)
    crawler = SparkCrawler(
        spark, cfg,
        testkit.pages_to_spark(spark, testkit.nice_site()[0]),
        testkit.robots_to_spark(spark, testkit.nice_site()[1]),
        workdir=str(tmp_path / "exactcap"),
    )
    # hot host: 200 rows -> 10 salt slices; base = 7//10 = 0, so only
    # the rotating remainder window admits rows. cold host: 15 rows
    # (unsalted). 5 robots-blocked rows must all ride sub-wave 0.
    schema = "url_key string, host string, priority int, _allowed boolean"
    rows = (
        [(f"http://hot.test/{i:04d}", "hot.test", 2, True) for i in range(200)]
        + [(f"http://cold.test/{i:02d}", "cold.test", 2, True) for i in range(15)]
        + [(f"http://hot.test/blocked{i}", "hot.test", 2, False) for i in range(5)]
    )
    gated = spark.createDataFrame(rows, schema)
    remaining, subwave, taken = gated, 0, 0
    while True:
        take, defer = crawler._apply_budget(remaining, B, subwave)
        per_host = {
            r["host"]: r["n"]
            for r in take.filter("_allowed").groupBy("host").agg(
                F.count("*").alias("n")).collect()
        }
        for h, n in per_host.items():
            assert n <= B, (subwave, h, n)
        if subwave == 0:
            assert take.filter("NOT _allowed").count() == 5  # budget-free
        taken += sum(per_host.values())
        # re-materialize the deferred slice (the engine stages it to
        # parquet each sub-wave; collect/recreate is the test-scale
        # equivalent and keeps the plan from growing per round)
        defer_rows = defer.select("url_key", "host", "priority", "_allowed").collect()
        if not defer_rows:
            break
        remaining = spark.createDataFrame(defer_rows, schema)
        subwave += 1
        assert subwave < 100, "exact-cap budget failed to drain"
    assert taken == 215  # defer never drops
    # discriminator: the default ceil mode over-admits on the hot host
    crawler.cfg.per_host_budget_exact = False
    take0, _ = crawler._apply_budget(gated, B, 0)
    hot_take = take0.filter("_allowed AND host = 'hot.test'").count()
    assert hot_take > B  # ceil(7/20)=1 per slice x 20 slices

    # e2e: exact mode still reproduces the oracle's output exactly
    pages_pdf, robots_pdf, seeds = testkit.nice_site(branching=4, max_id_len=3)
    cfg2 = CrawlConfig(From=seeds, MaxDepth=2, RespectNofollow=True,
                       per_host_budget=3, per_host_budget_exact=True,
                       hot_host_salt_threshold=5)
    c2 = SparkCrawler(
        spark, cfg2,
        testkit.pages_to_spark(spark, pages_pdf),
        testkit.robots_to_spark(spark, robots_pdf),
        workdir=str(tmp_path / "exactcap-e2e"),
    )
    c2.run()
    _assert_match(c2, _oracle_run(cfg2, pages_pdf, robots_pdf))


def test_duplicate_pages_rows_emit_one_blocked_result(spark, tmp_path):
    """Single-pass mode LEFT-joins blocked frontier rows against the
    pages corpus with `_allowed` as a join residual, so a duplicate
    `url` in pages emits exactly ONE blocked Result — same as the
    budget path, which never joins blocked rows at all (ADVICE r02)."""
    import pandas as pd

    from crawlspark import testkit as tk

    rows = [
        tk.page_row("site-d.test", "", branching=0, extra_links=[("/a", "a")]),
        tk.page_row("site-d.test", "a", branching=0),
        tk.page_row("site-d.test", "a", branching=0),  # duplicate url
    ]
    pages_pdf = pd.DataFrame(rows)
    robots_pdf = pd.DataFrame(
        [{"host": "site-d.test", "scheme": "http", "status_code": 200,
          "body": "User-agent: *\nDisallow: /a\n"}]
    )
    for name, extra in (("nobudget", {}), ("budget", {"per_host_budget": 5})):
        cfg = CrawlConfig(From=["http://site-d.test/"], MaxDepth=1, **extra)
        crawler = SparkCrawler(
            spark, cfg,
            testkit.pages_to_spark(spark, pages_pdf),
            testkit.robots_to_spark(spark, robots_pdf),
            workdir=str(tmp_path / f"duppages-{name}"),
        )
        crawler.run()
        blocked = crawler.results().filter(
            "Status = 'Blocked by robots.txt'"
        ).collect()
        assert len(blocked) == 1, (name, blocked)
        assert blocked[0]["Address"]["Full"] == "http://site-d.test/a"


def test_scope_include_exclude(spark, tmp_path):
    pages_pdf, robots_pdf, seeds = testkit.matrix_site()
    cfg = CrawlConfig(
        From=seeds, MaxDepth=2,
        Include=[r"^http://site-0\.test/.*"],
        Exclude=[r"redir"],
    )
    crawler = SparkCrawler(
        spark, cfg,
        testkit.pages_to_spark(spark, pages_pdf),
        testkit.robots_to_spark(spark, robots_pdf),
        workdir=str(tmp_path / "scope"),
    )
    crawler.run()
    out = _oracle_run(cfg, pages_pdf, robots_pdf)
    _assert_match(crawler, out)
    hosts = {r["Address"]["Host"] for r in crawler.results().select("Address").collect()}
    assert hosts == {"site-0.test"}


def test_extended_canon_mode(spark, tmp_path):
    """north_rule production canonicalization: '?b=2&a=1' and
    '?a=1&b=2' collapse to one seen key in extended mode (engine and
    oracle agree); go-parity keeps them distinct."""
    from crawlspark import testkit as tk

    rows = [
        tk.page_row("site-9.test", "", branching=0, extra_links=[
            ("/q?b=2&a=1", "query order 1"),
            ("/q?a=1&b=2", "query order 2"),
            ("http://SITE-9.test/upper", "upper host"),
            ("/upper", "lower host"),
        ]),
        tk.page_row("site-9.test", "q?b=2&a=1", branching=0),
        tk.page_row("site-9.test", "q?a=1&b=2", branching=0),
        tk.page_row("site-9.test", "upper", branching=0),
    ]
    import pandas as pd

    pages_pdf = pd.DataFrame(rows)
    robots_pdf = pd.DataFrame(
        [{"host": "site-9.test", "scheme": "http", "status_code": 200,
          "body": "User-agent: *\nAllow: /\n"}]
    )
    seeds = ["http://site-9.test/"]

    # go-parity: 4 depth-1 rows — both query orders fetched separately,
    # /upper fetched, and http://SITE-9.test/upper kept as a DISTINCT
    # host whose robots is unreachable -> blocked row (crawler.go:281).
    # extended: query orders collapse AND the uppercase host folds into
    # site-9.test -> just {q, upper} = 2 rows.
    for mode, expected_d1 in (("extended", 2), ("go-parity", 4)):
        cfg = CrawlConfig(From=seeds, MaxDepth=1, canon_mode=mode)
        crawler = SparkCrawler(
            spark, cfg,
            testkit.pages_to_spark(spark, pages_pdf),
            testkit.robots_to_spark(spark, robots_pdf),
            workdir=str(tmp_path / f"ext-{mode}"),
        )
        crawler.run()
        d1 = crawler.results().filter("Depth = 1").count()
        # go-parity: {q?b=2&a=1, q?a=1&b=2, upper} = 3 fetches
        # (http://SITE-9.test/upper parses but SITE-9 host has no
        # robots/pages entry under exact-host semantics... it is the
        # same host case-insensitively -> extended collapses it)
        assert d1 == expected_d1, (mode, d1)
        _assert_match(crawler, _oracle_run(cfg, pages_pdf, robots_pdf))


def test_extended_mode_robots_gate_on_fetch_url(spark, tmp_path):
    """The robots gate must evaluate the FETCH url, not the canonical
    url_key (oracle.py:181 / reference state.go:56): in extended mode
    the key has sorted query params, so a query-sensitive Disallow
    would otherwise allow what the reference blocks (ADVICE r01)."""
    import pandas as pd

    from crawlspark import testkit as tk

    rows = [
        tk.page_row("site-r.test", "", branching=0, extra_links=[("/q?b=2&a=1", "q")]),
        tk.page_row("site-r.test", "q?b=2&a=1", branching=0),
    ]
    pages_pdf = pd.DataFrame(rows)
    robots_pdf = pd.DataFrame(
        [{"host": "site-r.test", "scheme": "http", "status_code": 200,
          "body": "User-agent: *\nDisallow: /q?b=2\n"}]
    )
    cfg = CrawlConfig(From=["http://site-r.test/"], MaxDepth=1, canon_mode="extended")
    crawler = SparkCrawler(
        spark, cfg,
        testkit.pages_to_spark(spark, pages_pdf),
        testkit.robots_to_spark(spark, robots_pdf),
        workdir=str(tmp_path / "ext-robots"),
    )
    crawler.run()
    d1 = crawler.results().filter("Depth = 1").collect()
    # the discovered URL /q?b=2&a=1 (extended key .../q?a=1&b=2) must
    # be BLOCKED: the rule matches the fetch url, not the sorted key
    assert len(d1) == 1 and d1[0]["Status"] == "Blocked by robots.txt"
    _assert_match(crawler, _oracle_run(cfg, pages_pdf, robots_pdf))


def test_request_headers_reach_fetch_interface(spark, tmp_path):
    """Config Header pairs (sent on every fetch by the reference,
    crawler.go:298-310) must reach the fetch boundary as per-row
    passthrough columns — a production HTTP fetcher swapped in at
    _fetch_join consumes them."""
    from crawlspark.engine import _with_url_parts

    pages_pdf, robots_pdf, seeds = testkit.nice_site(branching=2, max_id_len=2)
    cfg = CrawlConfig(
        From=seeds, MaxDepth=0,
        Header=[{"K": "X-Team", "V": "crawl"}, {"K": "Accept", "V": "text/html"}],
    )
    crawler = SparkCrawler(
        spark, cfg,
        testkit.pages_to_spark(spark, pages_pdf),
        testkit.robots_to_spark(spark, robots_pdf),
        workdir=str(tmp_path / "hdrs"),
    )
    joined = crawler._fetch_join(_with_url_parts(crawler._initial_frontier()))
    assert "_req_headers" in joined.columns
    got = joined.select("_req_headers").first()[0]
    assert [(p["K"], p["V"]) for p in got] == [("X-Team", "crawl"), ("Accept", "text/html")]
    # headers are request-side only: emitted results are unchanged
    crawler.run()
    _assert_match(crawler, _oracle_run(cfg, pages_pdf, robots_pdf))


def test_results_hide_lineage_columns(nice):
    """results() is the public Result surface — the snapshot store's
    _wave/_part lineage columns must not leak (ADVICE r01)."""
    crawler, _ = nice
    assert not [c for c in crawler.results().columns if c.startswith("_")]


def test_bloom_prefilter_correctness(spark, tmp_path):
    """Bloom on vs off vs lazily-activated: identical emitted rows and
    seen-set (the prefilter is a shuffle optimization, never a
    correctness input). 'lazy' crosses bloom_min_seen mid-crawl, so it
    exercises the one-time backfill activation path."""
    pages_pdf, robots_pdf, seeds = testkit.nice_site(branching=4, max_id_len=3)
    outs = {}
    # min_seen=0 -> bloom from wave 0; 3 -> activates after wave 0
    # (1 seed, then 1+4=5 seen); huge -> never activates
    for mode, bloom, min_seen in (
        ("on", True, 0), ("lazy", True, 3), ("off", False, 0)
    ):
        cfg = CrawlConfig(From=seeds, MaxDepth=2, RespectNofollow=True,
                          bloom_prefilter=bloom, bloom_shards=4,
                          bloom_min_seen=min_seen,
                          bloom_bits_per_shard=1 << 12)  # tiny shards -> real FPs
        c = SparkCrawler(
            spark, cfg,
            testkit.pages_to_spark(spark, pages_pdf),
            testkit.robots_to_spark(spark, robots_pdf),
            workdir=str(tmp_path / f"bloom-{mode}"),
        )
        c.run()
        if mode == "on":
            assert c._bloom_active(), "min_seen=0 must mark bits at seed time"
        if mode == "lazy":
            assert c._bloom_active(), "backfill activation must have fired"
        outs[mode] = (
            sorted(tuple(r) for r in c.results().select("Depth", "Priority", "UrlKey").collect()),
            {r["url_key"] for r in c.seen().collect()},
        )
    assert outs["on"] == outs["off"] == outs["lazy"]


def test_seen_join_shape_equality(spark, tmp_path):
    """cfg.seen_join_shape 'semi' (seen ⋉ maybe-keys, then probed ⋉̸
    hits — the seen history never shuffles) vs legacy 'anti' (maybe ⋉̸
    seen): identical emitted rows and seen-set. Tiny bloom shards force
    real false positives so the semi path's hits set is non-trivial,
    and bloom_min_seen=0 keeps the prefilter (and with it the shaped
    verify join) active from wave 0 (VERDICT r07 #2)."""
    pages_pdf, robots_pdf, seeds = testkit.nice_site(branching=4, max_id_len=3)
    outs = {}
    for shape in ("semi", "anti"):
        cfg = CrawlConfig(From=seeds, MaxDepth=2, RespectNofollow=True,
                          bloom_prefilter=True, bloom_shards=4,
                          bloom_min_seen=0, seen_join_shape=shape,
                          bloom_bits_per_shard=1 << 12)  # tiny shards -> real FPs
        c = SparkCrawler(
            spark, cfg,
            testkit.pages_to_spark(spark, pages_pdf),
            testkit.robots_to_spark(spark, robots_pdf),
            workdir=str(tmp_path / f"shape-{shape}"),
        )
        c.run()
        outs[shape] = (
            sorted(tuple(r) for r in c.results().select("Depth", "Priority", "UrlKey").collect()),
            {r["url_key"] for r in c.seen().collect()},
        )
    assert outs["semi"] == outs["anti"]


def test_seen_layout_bucketed_equality(spark, tmp_path):
    """cfg.seen_layout='bucketed' (catalog table of seen keys bucketed
    on url_key, appended per wave, shuffled-hash semi verify join —
    the VERDICT r07 #2 layout change) emits identical rows and
    seen-set to the slice layout, with the prefilter active (tiny
    shards -> real false positives) AND with it off (the plain
    anti-join path also reroutes through the bucketed table)."""
    pages_pdf, robots_pdf, seeds = testkit.nice_site(branching=4, max_id_len=3)
    outs = {}
    for tag, extra in (
        ("slices", {}),
        ("bucketed", {"seen_layout": "bucketed"}),
        ("bucketed-nofilter", {"seen_layout": "bucketed", "bloom_prefilter": False}),
    ):
        cfg = CrawlConfig(From=seeds, MaxDepth=2, RespectNofollow=True,
                          bloom_prefilter=extra.pop("bloom_prefilter", True),
                          bloom_shards=4, bloom_min_seen=0,
                          bloom_bits_per_shard=1 << 12, **extra)
        c = SparkCrawler(
            spark, cfg,
            testkit.pages_to_spark(spark, pages_pdf),
            testkit.robots_to_spark(spark, robots_pdf),
            workdir=str(tmp_path / f"layout-{tag}"),
        )
        c.run()
        outs[tag] = (
            sorted(tuple(r) for r in c.results().select("Depth", "Priority", "UrlKey").collect()),
            {r["url_key"] for r in c.seen().collect()},
        )
    assert outs["bucketed"] == outs["slices"]
    assert outs["bucketed-nofilter"] == outs["slices"]


def test_seen_layout_bucketed_plan(spark, tmp_path):
    """The bucketed verify join's plan: the seen side reads the
    bucketed table scan with NO Exchange above it (Bucketed: true
    satisfies the ShuffledHashJoin's distribution requirement), so
    only the wave-bounded side shuffles — the property that makes the
    join flat in seen size (seen_scan_bench part A)."""
    pages_pdf, robots_pdf, seeds = testkit.nice_site(branching=4, max_id_len=3)
    cfg = CrawlConfig(From=seeds, MaxDepth=1, RespectNofollow=True,
                      seen_layout="bucketed", bloom_prefilter=False)
    c = SparkCrawler(
        spark, cfg,
        testkit.pages_to_spark(spark, pages_pdf),
        testkit.robots_to_spark(spark, robots_pdf),
        workdir=str(tmp_path / "layout-plan"),
    )
    c.run()
    seen = c._bucketed_seen(2)
    assert seen is not None
    cand = spark.createDataFrame(
        [("https://a.test/x", 1)], "url_key string, priority int"
    )
    txt = (
        c._dedup_against_seen(cand, seen, None)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ShuffledHashJoin" in txt, txt
    assert "Bucketed: true" in txt, txt
    # tree print order is stream (left) leg first: everything between
    # the semi join line and the seen table's FileScan line belongs to
    # the seen leg — it must contain NO Exchange (the bucketed scan
    # satisfies the join's distribution requirement as-is; only the
    # wave-bounded side shuffles, after the scan line)
    join_at = txt.index("ShuffledHashJoin")
    scan_at = txt.index("Scan parquet", join_at)
    assert c._seen_table_name() in txt[scan_at : scan_at + 200], txt
    assert "Exchange" not in txt[join_at:scan_at], txt


def test_cuckoo_seen_filter_correctness(spark, tmp_path):
    """seen_filter='cuckoo': same emitted rows and seen-set as the
    bloom backend and as no-prefilter — the cuckoo filter is the
    deletion-capable alternative the north rule names, wired through
    the same mark/probe interface (engine.seenfilter)."""
    pages_pdf, robots_pdf, seeds = testkit.nice_site(branching=4, max_id_len=3)
    outs = {}
    for mode, backend, min_seen in (
        ("cuckoo", "cuckoo", 0), ("off", "bloom", 10**9)
    ):
        cfg = CrawlConfig(From=seeds, MaxDepth=2, RespectNofollow=True,
                          seen_filter=backend, bloom_prefilter=True,
                          bloom_shards=4, bloom_min_seen=min_seen,
                          bloom_bits_per_shard=1 << 12)
        c = SparkCrawler(
            spark, cfg,
            testkit.pages_to_spark(spark, pages_pdf),
            testkit.robots_to_spark(spark, robots_pdf),
            workdir=str(tmp_path / f"cuckoo-{mode}"),
        )
        c.run()
        if mode == "cuckoo":
            assert c._bloom_active(), "cuckoo state must be marked from wave 0"
        outs[mode] = (
            sorted(tuple(r) for r in c.results().select("Depth", "Priority", "UrlKey").collect()),
            {r["url_key"] for r in c.seen().collect()},
        )
    assert outs["cuckoo"] == outs["off"]


def test_expire_then_warm_recrawl_reemits_once(spark, tmp_path):
    """Re-crawl expiry (ADVICE r03 #4): expire() shrinks the seen-set
    and the seen-filter bits in one commit; a warm-started crawl
    (warm_store=prior workdir) re-fetches the expired URL exactly
    once when it is re-linked, skips every other previously-seen URL,
    and never double-emits anything. Exercised on both filter
    backends (the bits rebuild is backend-agnostic)."""
    pages_pdf, robots_pdf, seeds = testkit.nice_site(branching=3, max_id_len=2)
    for backend in ("cuckoo", "bloom"):
        cfg = CrawlConfig(From=seeds, MaxDepth=2, RespectNofollow=True,
                          seen_filter=backend, bloom_prefilter=True,
                          bloom_shards=4, bloom_min_seen=0,
                          bloom_bits_per_shard=1 << 12)
        c1 = SparkCrawler(
            spark, cfg,
            testkit.pages_to_spark(spark, pages_pdf),
            testkit.robots_to_spark(spark, robots_pdf),
            workdir=str(tmp_path / f"gen1-{backend}"),
        )
        c1.run()
        # expire one depth-1 URL (a direct child of a seed)
        victim = c1.results().filter("Depth = 1").select("UrlKey").first()[0]
        m = c1.expire([victim])
        assert m["expired"] == 1
        if backend == "cuckoo":
            assert m.get("rebuilt_shards", 0) >= 1
        assert victim not in {r["url_key"] for r in c1.seen().collect()}

        c2 = SparkCrawler(
            spark, cfg,
            testkit.pages_to_spark(spark, pages_pdf),
            testkit.robots_to_spark(spark, robots_pdf),
            workdir=str(tmp_path / f"gen2-{backend}"),
            warm_store=str(tmp_path / f"gen1-{backend}"),
        )
        c2.run()
        emitted = [r["UrlKey"] for r in c2.results().collect()]
        # seeds always re-fetch; the expired URL re-emits EXACTLY once;
        # everything else is warm-seen and skipped
        assert emitted.count(victim) == 1, (backend, emitted)
        assert sorted(emitted) == sorted(list(seeds) + [victim]), (backend, emitted)

        # control: without expiry the warm re-crawl emits only seeds
        c3 = SparkCrawler(
            spark, cfg,
            testkit.pages_to_spark(spark, pages_pdf),
            testkit.robots_to_spark(spark, robots_pdf),
            workdir=str(tmp_path / f"gen3-{backend}"),
            warm_store=str(tmp_path / f"gen2-{backend}"),
        )
        # gen2's store has no expiry; warm from it plus gen1? keep it
        # simple: warm from gen2 — seeds and victim are its seen-set,
        # so only seeds re-emit
        c3.run()
        emitted3 = sorted(r["UrlKey"] for r in c3.results().collect())
        assert emitted3 == sorted(seeds), (backend, emitted3)


def test_expire_corner_cases(spark, tmp_path):
    """Expire-everything: a warm re-crawl re-fetches the full site
    (tombstoned seen-set, shards rebuilt to empty). Expire-nothing
    (an unmatched URL): metrics report 0 expired and the warm crawl
    emits only seeds. Non-canonical input: a fetch URL with unsorted
    query params still matches its extended seen key."""
    pages_pdf, robots_pdf, seeds = testkit.nice_site(branching=2, max_id_len=2)
    cfg = CrawlConfig(From=seeds, MaxDepth=2, RespectNofollow=True,
                      bloom_prefilter=True, bloom_min_seen=0,
                      bloom_shards=4, bloom_bits_per_shard=1 << 12)
    g1 = SparkCrawler(
        spark, cfg,
        testkit.pages_to_spark(spark, pages_pdf),
        testkit.robots_to_spark(spark, robots_pdf),
        workdir=str(tmp_path / "x1"),
    )
    g1.run()
    n_full = g1.results().count()
    all_keys = [r["url_key"] for r in g1.seen().collect()]

    # expire an unmatched URL first: 0 expired, warm crawl = seeds only
    m0 = g1.expire(["http://never-crawled.test/nope"])
    assert m0["expired"] == 0 and m0["requested"] == 1
    w_none = SparkCrawler(
        spark, cfg,
        testkit.pages_to_spark(spark, pages_pdf),
        testkit.robots_to_spark(spark, robots_pdf),
        workdir=str(tmp_path / "xw0"), warm_store=str(tmp_path / "x1"),
    )
    w_none.run()
    assert sorted(r["UrlKey"] for r in w_none.results().collect()) == sorted(seeds)

    # expire EVERYTHING: warm crawl reproduces the full original site
    m = g1.expire(all_keys)
    assert m["expired"] == len(all_keys)
    w_all = SparkCrawler(
        spark, cfg,
        testkit.pages_to_spark(spark, pages_pdf),
        testkit.robots_to_spark(spark, robots_pdf),
        workdir=str(tmp_path / "xw1"), warm_store=str(tmp_path / "x1"),
    )
    w_all.run()
    a = sorted(tuple(r) for r in g1.results().select("Depth", "Priority", "UrlKey").collect())
    b = sorted(tuple(r) for r in w_all.results().select("Depth", "Priority", "UrlKey").collect())
    assert len(b) == n_full and a == b


def test_warm_store_filter_layout_mismatch_rejected(spark, tmp_path):
    """A warm re-crawl with different seen-filter settings must fail
    LOUDLY at construction: probing prior bits under a mismatched
    layout would silently answer definitely-new for seen URLs and
    double-fetch them (an exactness break, not a perf bug)."""
    pages_pdf, robots_pdf, seeds = testkit.nice_site(branching=2, max_id_len=2)
    cfg1 = CrawlConfig(From=seeds, MaxDepth=1, bloom_prefilter=True,
                       bloom_min_seen=0, bloom_shards=4,
                       bloom_bits_per_shard=1 << 12)
    g1 = SparkCrawler(
        spark, cfg1,
        testkit.pages_to_spark(spark, pages_pdf),
        testkit.robots_to_spark(spark, robots_pdf),
        workdir=str(tmp_path / "wg1"),
    )
    g1.run()
    cfg2 = CrawlConfig(From=seeds, MaxDepth=1, bloom_prefilter=True,
                       bloom_min_seen=0, bloom_shards=4,
                       bloom_bits_per_shard=1 << 14)  # different layout
    with pytest.raises(ValueError, match="layout mismatch"):
        SparkCrawler(
            spark, cfg2,
            testkit.pages_to_spark(spark, pages_pdf),
            testkit.robots_to_spark(spark, robots_pdf),
            workdir=str(tmp_path / "wg2"), warm_store=str(tmp_path / "wg1"),
        )


def test_expire_guards_and_metrics(spark, tmp_path):
    """ADVICE r04 hardening: expire() refuses an empty store, an
    interrupted crawl (its manifest would supersede the mid-wave
    checkpoints and break resume), and a mismatched seen-filter
    layout (rebuilding shards under the wrong config would corrupt
    the bits AND overwrite the recorded signature the next warm
    start checks). Metrics count DISTINCT inputs, matched per input."""
    pages_pdf, robots_pdf, seeds = testkit.nice_site(branching=2, max_id_len=2)
    cfg = CrawlConfig(From=seeds, MaxDepth=1, bloom_prefilter=True,
                      bloom_min_seen=0, bloom_shards=4,
                      bloom_bits_per_shard=1 << 12)

    def crawler(wd, c=cfg):
        return SparkCrawler(
            spark, c,
            testkit.pages_to_spark(spark, pages_pdf),
            testkit.robots_to_spark(spark, robots_pdf),
            workdir=str(tmp_path / wd),
        )

    # empty store: nothing to expire
    with pytest.raises(RuntimeError, match="no committed crawl"):
        crawler("empty").expire(seeds)

    # interrupted store: wave 0 committed (frontier for wave 1 staged,
    # rows > 0), wave 1 never ran — expire must refuse, because its
    # manifest would become last_complete_wave and resume would find
    # no frontier beyond it
    class Interrupted(Exception):
        pass

    cfg2 = CrawlConfig(From=seeds, MaxDepth=2, bloom_prefilter=True,
                       bloom_min_seen=0, bloom_shards=4,
                       bloom_bits_per_shard=1 << 12)
    part = crawler("interrupted", cfg2)
    orig = part._run_wave

    def boom(frontier, d, *a, **k):
        if d == 1:
            raise Interrupted()
        return orig(frontier, d, *a, **k)

    part._run_wave = boom
    with pytest.raises(Interrupted):
        part.run()
    with pytest.raises(RuntimeError, match="interrupted"):
        part.expire(seeds)
    # ...and after finishing the crawl, expire works again
    part2 = crawler("interrupted", cfg2)
    part2.run(resume=True)
    assert part2.expire([seeds[0]])["expired"] == 1

    # completed store: duplicate inputs count once (no spurious
    # under-match warning), unmatched inputs are visible per input
    done = crawler("done")
    done.run()
    victim = done.results().filter("Depth = 1").select("UrlKey").first()[0]
    m = done.expire([victim, victim, "http://never-crawled.test/nope"])
    assert m["requested"] == 2 and m["expired"] == 1
    assert m["tombstone_rows"] >= 1

    # mismatched filter layout on the SAME store: refuse before staging
    cfg_bad = CrawlConfig(From=seeds, MaxDepth=1, bloom_prefilter=True,
                          bloom_min_seen=0, bloom_shards=4,
                          bloom_bits_per_shard=1 << 14)
    bad = SparkCrawler(
        spark, cfg_bad,
        testkit.pages_to_spark(spark, pages_pdf),
        testkit.robots_to_spark(spark, robots_pdf),
        workdir=str(tmp_path / "done"),
    )
    with pytest.raises(ValueError, match="layout mismatch"):
        bad.expire([victim])


def test_warm_recrawl_midwave_resume(spark, tmp_path):
    """The warm seen-set must survive a mid-wave interruption WITHOUT
    re-passing warm_store: it is committed into the new store at seed
    time, so run(resume=True) on a fresh crawler recovers it — an
    interrupted warm re-crawl that forgot its warm history would
    re-fetch previously-seen URLs and break the exactly-once law."""
    pages_pdf, robots_pdf, seeds = testkit.nice_site(branching=4, max_id_len=3)
    cfg1 = CrawlConfig(From=seeds, MaxDepth=1, RespectNofollow=True)
    g1 = SparkCrawler(
        spark, cfg1,
        testkit.pages_to_spark(spark, pages_pdf),
        testkit.robots_to_spark(spark, robots_pdf),
        workdir=str(tmp_path / "g1"),
    )
    g1.run()
    victims = [r["UrlKey"] for r in g1.results().filter("Depth = 1").limit(2).collect()]
    g1.expire(victims)

    # uninterrupted warm re-crawl, deeper + budgeted — in EXACT-cap
    # mode (r05): the rotating remainder window is a pure function of
    # the sub-wave index, so the mid-wave resume below must recompute
    # the identical takes (the docstring claim, pinned here)
    cfg2 = CrawlConfig(From=seeds, MaxDepth=2, RespectNofollow=True,
                       per_host_budget=2, per_host_budget_exact=True)
    full = SparkCrawler(
        spark, cfg2,
        testkit.pages_to_spark(spark, pages_pdf),
        testkit.robots_to_spark(spark, robots_pdf),
        workdir=str(tmp_path / "full"), warm_store=str(tmp_path / "g1"),
    )
    full.run()

    class Interrupted(Exception):
        pass

    part = SparkCrawler(
        spark, cfg2,
        testkit.pages_to_spark(spark, pages_pdf),
        testkit.robots_to_spark(spark, robots_pdf),
        workdir=str(tmp_path / "part"), warm_store=str(tmp_path / "g1"),
    )
    orig = part._apply_budget
    calls = {"n": 0}

    def boom(remaining, budget, *a):
        calls["n"] += 1
        if calls["n"] >= 3:
            raise Interrupted()
        return orig(remaining, budget, *a)

    part._apply_budget = boom
    with pytest.raises(Interrupted):
        part.run()

    # resume with a FRESH crawler and no warm_store argument
    part2 = SparkCrawler(
        spark, cfg2,
        testkit.pages_to_spark(spark, pages_pdf),
        testkit.robots_to_spark(spark, robots_pdf),
        workdir=str(tmp_path / "part"),
    )
    part2.run(resume=True)

    a = sorted(tuple(r) for r in full.results().select("Depth", "Priority", "UrlKey").collect())
    b = sorted(tuple(r) for r in part2.results().select("Depth", "Priority", "UrlKey").collect())
    assert a == b
    emitted = [r["UrlKey"] for r in part2.results().collect()]
    for v in victims:
        assert emitted.count(v) == 1, (v, emitted)


def test_cuckoo_filter_unit(spark):
    """Cuckoo filter semantics: no false negatives after mark,
    delete() removes membership, overflow degrades to maybe-seen for
    everything (never a false negative), state is deterministic."""
    from crawlspark import cuckoofilter as cf

    cfg = cf.CuckooConfig(n_shards=4, buckets_per_shard=1 << 8)
    urls = spark.createDataFrame(
        [(f"http://h{i}.test/p{i}",) for i in range(300)], "url_key string"
    )
    bits = cf.mark(urls, cf.empty_bits_df(spark, cfg), "url_key", cfg)
    probed = cf.probe(urls, bits, "url_key", cfg)
    assert probed.filter("NOT _maybe_seen").count() == 0  # no false negatives

    # unseen urls: mostly definite misses (16-bit fps, tiny fill)
    other = spark.createDataFrame(
        [(f"http://other{i}.test/x",) for i in range(300)], "url_key string"
    )
    miss = cf.probe(other, bits, "url_key", cfg).filter("NOT _maybe_seen").count()
    assert miss >= 290, miss

    # delete: membership gone (cuckoo's edge over bloom)
    half = urls.limit(150)
    bits2 = cf.delete(half, bits, "url_key", cfg)
    gone = cf.probe(half, bits2, "url_key", cfg).filter("_maybe_seen").count()
    assert gone <= 5, gone  # only fp-collisions with surviving keys remain
    still = urls.subtract(half)
    assert cf.probe(still, bits2, "url_key", cfg).filter("NOT _maybe_seen").count() == 0

    # determinism: same input -> identical shard bytes
    a = {r["shard"]: r["bits"] for r in cf.mark(
        urls, cf.empty_bits_df(spark, cfg), "url_key", cfg).collect()}
    b = {r["shard"]: r["bits"] for r in bits.collect()}
    assert a == b

    # overflow: cram >> capacity into 4 tiny shards -> overflowed
    # shards answer maybe-seen for EVERYTHING (degraded, never wrong)
    tiny = cf.CuckooConfig(n_shards=2, buckets_per_shard=4)
    many = spark.createDataFrame(
        [(f"http://o{i}.test/{i}",) for i in range(200)], "url_key string"
    )
    tb = cf.mark(many, cf.empty_bits_df(spark, tiny), "url_key", tiny)
    assert any(r["bits"][0] == 1 for r in tb.collect()), "expected overflow"
    fresh = spark.createDataFrame([("http://never.test/",)], "url_key string")
    assert cf.probe(fresh, tb, "url_key", tiny).collect()[0]["_maybe_seen"] is True


def test_pacing_enabled_smoke(spark, tmp_path):
    """pacing_enabled sleeps per host group but never changes the
    emitted set (reference WaitTime analog, state.go:29-41)."""
    import time as _time

    pages_pdf, robots_pdf, seeds = testkit.nice_site(branching=3, max_id_len=2)
    cfg = CrawlConfig(From=seeds, MaxDepth=1, RespectNofollow=True,
                      WaitTime="200ms", pacing_enabled=True, per_host_budget=2)
    c = SparkCrawler(
        spark, cfg,
        testkit.pages_to_spark(spark, pages_pdf),
        testkit.robots_to_spark(spark, robots_pdf),
        workdir=str(tmp_path / "paced"),
    )
    t0 = _time.time()
    c.run()
    assert _time.time() - t0 > 0.2  # at least one pacing sleep happened
    _assert_match(c, _oracle_run(cfg, pages_pdf, robots_pdf))


@pytest.mark.parametrize("mode", ["iterative", "rank_once"])
def test_midwave_resume(spark, tmp_path, mode):
    """Interrupt AFTER a politeness-subwave checkpoint but before the
    wave completes: resume continues from the checkpoint (the pending
    frontier under the iterative loop; the staged budget plan under
    rank_once) and the final output is identical to an uninterrupted
    budgeted run (north_star: 'resumable mid-wave')."""
    pages_pdf, robots_pdf, seeds = testkit.nice_site(branching=4, max_id_len=3)
    cfg = CrawlConfig(From=seeds, MaxDepth=2, RespectNofollow=True,
                      per_host_budget=3, budget_plan=mode)

    full = SparkCrawler(
        spark, cfg,
        testkit.pages_to_spark(spark, pages_pdf),
        testkit.robots_to_spark(spark, robots_pdf),
        workdir=str(tmp_path / "full"),
    )
    full.run()

    class Interrupted(Exception):
        pass

    part = SparkCrawler(
        spark, cfg,
        testkit.pages_to_spark(spark, pages_pdf),
        testkit.robots_to_spark(spark, robots_pdf),
        workdir=str(tmp_path / "part"),
    )
    orig = part._fetch_and_parse
    calls = {"n": 0}

    def boom(*a, **k):
        # one _fetch_and_parse per politeness sub-wave on every path
        # (the r8 rank-once plan no longer calls _apply_budget per
        # sub-wave): wave0 + wave1 are single sub-waves, wave2 (4
        # urls, budget 3) checkpoints part0 after its first sub-wave;
        # the 4th call is wave2's second sub-wave -> interrupt
        calls["n"] += 1
        if calls["n"] >= 4:
            raise Interrupted()
        return orig(*a, **k)

    part._fetch_and_parse = boom
    with pytest.raises(Interrupted):
        part.run()
    # a mid-wave part manifest must exist for wave 2
    assert part.store.parts(2), "expected a mid-wave checkpoint"

    part2 = SparkCrawler(
        spark, cfg,
        testkit.pages_to_spark(spark, pages_pdf),
        testkit.robots_to_spark(spark, robots_pdf),
        workdir=str(tmp_path / "part"),
    )
    part2.run(resume=True)

    a = sorted(tuple(r) for r in full.results().select("Depth", "Priority", "UrlKey").collect())
    b = sorted(tuple(r) for r in part2.results().select("Depth", "Priority", "UrlKey").collect())
    assert a == b
    assert {r["url_key"] for r in full.seen().collect()} == {
        r["url_key"] for r in part2.seen().collect()
    }
    _assert_match(part2, _oracle_run(cfg, pages_pdf, robots_pdf))


def test_single_pass_wave_plan_regression(spark, tmp_path):
    """Explain-based plan guard (VERDICT r02 #8): the composed
    single-pass wave evaluates the robots pandas-UDF exactly ONCE
    (no double-gate: one ArrowEvalPython node) and the fetch join
    scans the bucketed pages table without a pages-side Exchange, so
    future engine edits can't silently reintroduce either regression."""
    from crawlspark.engine import SparkCrawler, bucketize_pages
    from crawlspark.schema import FRONTIER_SCHEMA

    pages_pdf, robots_pdf, seeds = testkit.nice_site(branching=2, max_id_len=2)
    pages_df = bucketize_pages(
        spark, testkit.pages_to_spark(spark, pages_pdf), "pages_plan_test", buckets=8
    )
    cfg = CrawlConfig(From=seeds, MaxDepth=1)
    c = SparkCrawler(
        spark, cfg, pages_df, testkit.robots_to_spark(spark, robots_pdf),
        workdir=str(tmp_path / "plan"),
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # suppress broadcast of the tiny test frontier so the
        # sort-merge path (the 10^10-scale plan) is what we assert on
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        frontier = spark.createDataFrame(
            [(u, u, 0, i, i) for i, u in enumerate(seeds)], FRONTIER_SCHEMA
        )
        parsed = c._fetch_and_parse(c._gate(frontier), rows_hint=len(seeds))
        plan = parsed._jdf.queryExecution().executedPlan().toString()
        # exactly one robots-UDF evaluation in the whole wave
        assert plan.count("ArrowEvalPython") == 1, plan
        # parse stage is one Arrow map, no cartesian anywhere
        assert "CartesianProduct" not in plan
        # pages side stays bucketed: the only parquet scan is pages,
        # and it is bucket-pruned with no Exchange above it
        assert "Bucketed: true" in plan, plan
        pages_side = plan.split("FileScan parquet")[1]
        assert "SelectedBucketsCount" in pages_side
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_budgeted_wave_plan_single_pass(spark, tmp_path):
    """Plan guards for the BUDGETED (production) path (VERDICT r03
    #2 + #4): the results job of a budgeted wave evaluates the robots
    pandas-UDF exactly ONCE (blocked rows ride the single-pass LEFT
    join instead of a second gate branch), and the only
    host-partitioned Window is the SALTED row_number — the per-host
    row count comes from a groupBy partial aggregate broadcast back,
    never an unsalted `count(*) over partitionBy(host)` that would
    colocate a hot host into one task before the salt exists."""
    from crawlspark.engine import SparkCrawler
    from crawlspark.schema import FRONTIER_SCHEMA

    pages_pdf, robots_pdf, seeds = testkit.nice_site(branching=2, max_id_len=2)
    cfg = CrawlConfig(From=seeds, MaxDepth=1, per_host_budget=3)
    c = SparkCrawler(
        spark, cfg,
        testkit.pages_to_spark(spark, pages_pdf),
        testkit.robots_to_spark(spark, robots_pdf),
        workdir=str(tmp_path / "budgetplan"),
    )
    frontier = spark.createDataFrame(
        [(u, u, 0, i, i) for i, u in enumerate(seeds)], FRONTIER_SCHEMA
    )
    take, defer = c._apply_budget(c._gate(frontier), cfg.per_host_budget)
    parsed = c._fetch_and_parse(take, rows_hint=len(seeds))
    plan = parsed._jdf.queryExecution().executedPlan().toString()
    # one robots-UDF evaluation in the whole budgeted results job
    assert plan.count("ArrowEvalPython") == 1, plan
    # every host-partitioned window is salted; the host count is a
    # HashAggregate (map-side partial), not a Window
    for spec in plan.split("windowspecdefinition(")[1:]:
        args = spec.split(")")[0]
        if "host#" in args:
            assert "_salt" in args, plan
    assert "count(1) windowspecdefinition" not in plan, plan
    # the r8 rank-once plan staging job: robots UDF exactly once per
    # WAVE (the plan carries _allowed), same salted-window guarantees
    pplan = (
        c._budget_plan(c._gate(frontier), cfg.per_host_budget)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert pplan.count("ArrowEvalPython") == 1, pplan
    for spec in pplan.split("windowspecdefinition(")[1:]:
        args = spec.split(")")[0]
        if "host#" in args:
            assert "_salt" in args, pplan
    assert "count(1) windowspecdefinition" not in pplan, pplan
    # blocked rows never consume a budget slot: disallow-all robots
    robots_block = robots_pdf.copy()
    robots_block["body"] = "User-agent: *\nDisallow: /\n"
    c2 = SparkCrawler(
        spark, CrawlConfig(From=seeds, MaxDepth=1, per_host_budget=1),
        testkit.pages_to_spark(spark, pages_pdf),
        testkit.robots_to_spark(spark, robots_block),
        workdir=str(tmp_path / "budgetplan2"),
    )
    take2, defer2 = c2._apply_budget(c2._gate(frontier), 1)
    # all seeds blocked -> all ride sub-wave 0, none deferred
    assert defer2.count() == 0
    assert take2.count() == len(seeds)


def test_robots_local_gate_equals_join_gate(spark, tmp_path):
    """r05 collected-robots gate: the broadcast-dict path (default for
    small robots tables) must produce the identical crawl — rows,
    blocked statuses, seen-set — as the rules-join path
    (robots_local_threshold=0), which remains the 10^7-host scale
    path. matrix_site includes robots-blocked URLs, so the gate
    semantics are actually exercised (fetch_url evaluation; a
    left-join miss maps to the (None, None) matcher key =
    robots.from_status(None) = DISALLOW_ALL — an unfetchable
    robots.txt means disallow, and both gate paths must agree)."""
    pages_pdf, robots_pdf, seeds = testkit.matrix_site()
    outs = {}
    for name, th in (("local", 50_000), ("join", 0)):
        cfg = CrawlConfig(From=seeds, MaxDepth=2, RespectNofollow=False,
                          robots_local_threshold=th)
        c = SparkCrawler(
            spark, cfg,
            testkit.pages_to_spark(spark, pages_pdf),
            testkit.robots_to_spark(spark, robots_pdf),
            workdir=str(tmp_path / f"gate-{name}"),
        )
        assert (c._robots_bc is not None) == (name == "local")
        c.run()
        outs[name] = (
            sorted(tuple(r) for r in c.results()
                   .select("Depth", "Priority", "UrlKey", "Status").collect()),
            sorted(r["url_key"] for r in c.seen().collect()),
        )
    assert outs["local"] == outs["join"]
    # blocked rows exist in the fixture — the gate did real work
    assert any("Blocked" in t[3] for t in outs["local"][0])

    # guards (code-review r05): duplicate (scheme, host) robots rows
    # and oversized total body bytes both disable the local path (a
    # dict keeps the last dup row where the join fans rows out — the
    # paths would not be output-equal; giant collects OOM the driver)
    import pandas as pd

    dup = pd.concat([robots_pdf, robots_pdf.iloc[:1]], ignore_index=True)
    c_dup = SparkCrawler(
        spark, CrawlConfig(From=seeds, MaxDepth=0),
        testkit.pages_to_spark(spark, pages_pdf),
        testkit.robots_to_spark(spark, dup),
        workdir=str(tmp_path / "gate-dup"),
    )
    assert c_dup._robots_bc is None
    c_big = SparkCrawler(
        spark, CrawlConfig(From=seeds, MaxDepth=0, robots_local_max_bytes=1),
        testkit.pages_to_spark(spark, pages_pdf),
        testkit.robots_to_spark(spark, robots_pdf),
        workdir=str(tmp_path / "gate-big"),
    )
    assert c_big._robots_bc is None


def test_robots_join_gate_plan_and_override(spark, tmp_path):
    """The rules-JOIN gate (the 10^7-host scale path, VERDICT r05 #3)
    must plan as a REAL join + exactly one gate UDF — no driver
    collect of the rules; and an explicitly passed robots_side must
    win over the collected-rules broadcast (ADVICE r05), so callers
    pinning the join path get the join they asked for.
    scripts/robots_join_bench.py measures this same shape at 500k
    hosts / 10^6 frontier rows (BENCH.md row)."""
    from pyspark.sql import functions as F

    _JOINS = ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
    pages_pdf, robots_pdf, seeds = testkit.matrix_site()
    c = SparkCrawler(
        spark,
        CrawlConfig(From=seeds, MaxDepth=1, robots_local_threshold=0),
        testkit.pages_to_spark(spark, pages_pdf),
        testkit.robots_to_spark(spark, robots_pdf),
        workdir=str(tmp_path / "joingate"),
    )
    assert c._robots_bc is None
    gated = c._gate(c._initial_frontier())
    plan = gated._jdf.queryExecution().executedPlan().toString()
    assert any(j in plan for j in _JOINS), plan
    assert plan.count("ArrowEvalPython") == 1, plan

    c2 = SparkCrawler(
        spark,
        CrawlConfig(From=seeds, MaxDepth=1, robots_local_threshold=50_000),
        testkit.pages_to_spark(spark, pages_pdf),
        testkit.robots_to_spark(spark, robots_pdf),
        workdir=str(tmp_path / "joingate2"),
    )
    assert c2._robots_bc is not None
    # no explicit side -> collected path (no join in the plan)
    plan_local = (
        c2._gate(c2._initial_frontier())
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert not any(j in plan_local for j in _JOINS), plan_local
    # explicit side -> join path, despite the active broadcast table
    plan_over = (
        c2._gate(c2._initial_frontier(), F.broadcast(c2.robots))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert any(j in plan_over for j in _JOINS), plan_over
    assert plan_over.count("ArrowEvalPython") == 1, plan_over


def test_bucketed_pages_fetch_join(spark, tmp_path):
    """Bucketed pages table: identical crawl output, and the fetch
    join plan scans the pages side bucketed (no pages-side shuffle)."""
    from crawlspark.engine import bucketize_pages

    pages_pdf, robots_pdf, seeds = testkit.nice_site(branching=4, max_id_len=3)
    pages_df = testkit.pages_to_spark(spark, pages_pdf)
    cfg = CrawlConfig(From=seeds, MaxDepth=2, RespectNofollow=True)

    plain = SparkCrawler(
        spark, cfg, pages_df, testkit.robots_to_spark(spark, robots_pdf),
        workdir=str(tmp_path / "plain"),
    )
    plain.run()

    bucketed_pages = bucketize_pages(spark, pages_df, "pages_bucketed_test", buckets=8)
    bucketed = SparkCrawler(
        spark, cfg, bucketed_pages, testkit.robots_to_spark(spark, robots_pdf),
        workdir=str(tmp_path / "bucketed"),
    )
    bucketed.run()

    a = sorted(tuple(r) for r in plain.results().select("Depth", "Priority", "UrlKey").collect())
    b = sorted(tuple(r) for r in bucketed.results().select("Depth", "Priority", "UrlKey").collect())
    assert a == b

    # the join planned against the bucketed scan (suppress broadcast of
    # the tiny test frontier so the sort-merge path is visible)
    from pyspark.sql import functions as F

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        frontier = pages_df.select(F.col("url").alias("fetch_key")).limit(10)
        j = frontier.join(bucketed_pages, F.col("fetch_key") == bucketed_pages["url"], "inner")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        # no Exchange directly above the bucketed scan side
        pages_side = plan.split("FileScan parquet")[1]
        assert "SelectedBucketsCount" in pages_side
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_filter_apis_ship_package_at_definition_time(spark):
    """bloomfilter/cuckoofilter public APIs build applyInPandas
    closures that reference module-level helpers (pickled by module
    REFERENCE), so each must call ensure_shipped ITSELF at frame
    DEFINITION time — PySpark snapshots the py-files list into the
    serialized UDF when the frame is built, not when it runs
    (shipping.py; code-review r7: these were the only UDF-creating
    entry points missing the call)."""
    from crawlspark import bloomfilter, cuckoofilter

    sc = spark.sparkContext
    bcfg = bloomfilter.BloomConfig(n_shards=2, bits_per_shard=1 << 10)
    ccfg = cuckoofilter.CuckooConfig(n_shards=2, buckets_per_shard=1 << 4)
    urls = spark.createDataFrame([("http://a/",)], "u string")
    bbits = spark.createDataFrame([], bloomfilter.BITS_SCHEMA)
    cbits = spark.createDataFrame([], cuckoofilter.BITS_SCHEMA)
    calls = [
        lambda: bloomfilter.probe(urls, bbits, "u", bcfg),
        lambda: bloomfilter.mark(urls, bbits, "u", bcfg),
        lambda: cuckoofilter.probe(urls, cbits, "u", ccfg),
        lambda: cuckoofilter.mark(urls, cbits, "u", ccfg),
        lambda: cuckoofilter.delete(urls, cbits, "u", ccfg),
    ]
    for call in calls:
        sc._crawlspark_shipped = False
        call()  # definition alone must ship — no action/execution
        assert getattr(sc, "_crawlspark_shipped", False)


def test_unknown_enum_knobs_fail_loudly(spark, tmp_path):
    """Typo'd string knobs must raise at construction, not silently
    run the default code path (code-review r08): a 10^10 deployment
    configured seen_layout='Bucketed' would otherwise silently run
    the O(seen)-shuffle slices layout."""
    pages_pdf, robots_pdf, seeds = testkit.nice_site(branching=2, max_id_len=2)
    pages = testkit.pages_to_spark(spark, pages_pdf)
    robots = testkit.robots_to_spark(spark, robots_pdf)
    for knob, bad in (
        ("seen_join_shape", "semi-bucketed"),
        ("seen_layout", "Bucketed"),
        ("budget_plan", "rank-once"),
    ):
        cfg = CrawlConfig(From=seeds, MaxDepth=1, **{knob: bad})
        with pytest.raises(ValueError, match=f"unknown {knob}"):
            SparkCrawler(spark, cfg, pages, robots,
                         workdir=str(tmp_path / f"bad-{knob}"))


def test_deferred_subwave_fetch_join_broadcasts_slice(spark, tmp_path):
    """Politeness sub-waves >= 1 are all-allowed, so their fetch join
    is INNER and hash-builds on the (broadcast) frontier-slice side —
    a left-outer join can never broadcast its preserved side, which
    made every deferred sub-wave shuffle+sort the whole non-bucketed
    pages corpus even for a ~200-row hot-host leftover (the measured
    3.4 s/sub-wave budgeted Amdahl term, r9). Pins: the deferred
    slice's plan has a broadcast join with NO Exchange on the pages
    scan, while sub-wave 0 keeps the blocked-row-preserving LEFT
    join; and inner-vs-left on an all-allowed slice is output-equal
    even with page-miss (fetch error) rows in it."""
    from crawlspark.engine import SparkCrawler
    from crawlspark.schema import FRONTIER_SCHEMA

    pages_pdf, robots_pdf, seeds = testkit.nice_site(branching=2, max_id_len=2)
    cfg = CrawlConfig(From=seeds, MaxDepth=1, per_host_budget=3)
    c = SparkCrawler(
        spark, cfg,
        testkit.pages_to_spark(spark, pages_pdf),
        testkit.robots_to_spark(spark, robots_pdf),
        workdir=str(tmp_path / "bcastplan"),
    )
    # a deferred-slice stand-in incl. one page-miss row (fetch error)
    rows = [(u, u, 1, 2, None) for u in
            [f"http://site-0.test/{i}" for i in (0, 1, 10, 11)]]
    rows.append(("http://site-0.test/nopage9999", "http://site-0.test/nopage9999", 1, 2, None))
    pending = spark.createDataFrame(rows, FRONTIER_SCHEMA)
    from pyspark.sql import functions as F
    regated = c._gate(pending).withColumn("_allowed", F.lit(True))

    inner = c._fetch_and_parse(regated, rows_hint=5, all_allowed=True)
    plan = inner._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    # the pages side streams from its scan with no exchange above it
    assert "Exchange hashpartitioning(url#" not in plan, plan

    left = c._fetch_and_parse(regated, rows_hint=5, all_allowed=False)
    key = lambda r: (r["UrlKey"], r["StatusCode"])  # noqa: E731
    assert sorted(map(key, inner.collect())) == sorted(map(key, left.collect()))
    # 4 real pages parsed; the page-miss row dropped by both shapes
    assert inner.count() == 4


def test_parse_map_arrow_differential():
    """r10: the columnar parse (_parse_map_arrow) must be row-identical
    to the dict-path _parse_map on an adversarial batch — blocked rows,
    LEFT-join misses, non-html, 404, redirects (with and without
    Location), empty/None headers, link-less html, image payloads
    (valid decode, decode-error fmt, missing bytes, null phash) — with
    check_payload on AND off, with and without the image columns, and
    on zero-row / all-dropped batches."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from pyspark.sql.pandas.types import to_arrow_type

    from crawlspark import imagecodec
    from crawlspark.engine import (
        RESULT_FULL_SCHEMA,
        _parse_map,
        _parse_map_arrow,
    )

    def mk(host, pid, *, allowed=True, miss=False, img=None, **kw):
        r = testkit.page_row(host, pid, **kw)
        url = r["url"]
        r["fetch_url"] = url
        r["url_key"] = url
        r["depth"] = 1
        r["priority"] = 2
        r["_allowed"] = allowed
        if not allowed or miss:
            r["url"] = None  # blocked rows never match a page row
            for k in ("status", "status_code", "proto", "proto_major",
                      "proto_minor", "content_type", "location", "headers", "html"):
                r[k] = None
        r["image_id"] = r["image_bytes"] = r["fmt"] = r["caption"] = None
        r["img_w"] = r["img_h"] = r["phash"] = None
        if img is not None:
            r.update(img)
        return r

    png = imagecodec.encode(imagecodec.synth_image("h/x", 8, 6), "png")
    rows = [
        mk("a.test", "0", branching=3),
        mk("a.test", "1", allowed=False),
        mk("a.test", "2", miss=True),
        mk("a.test", "3", content_type="text/plain"),
        mk("a.test", "4", status_code=404),
        mk("a.test", "5", status_code=301, location="http://a.test/0"),
        mk("a.test", "6", status_code=302, location=None),
        mk("a.test", "7", branching=0),
        mk("a.test", "8", branching=1),
        mk("a.test", "9", branching=2, img={
            "image_id": "h/x", "image_bytes": png, "fmt": "png",
            "caption": "cap", "img_w": 8, "img_h": 6, "phash": 12345}),
        # phash stays non-null on every bytes-carrying row: a null
        # there reaches the dict path as pandas NaN and production
        # images tables always carry it
        mk("a.test", "10", branching=1, img={
            "image_id": "h/y", "image_bytes": b"\x00bad", "fmt": "bmp",
            "caption": None, "img_w": 4, "img_h": 4, "phash": 3}),
        mk("a.test", "11", branching=1, img={
            "image_id": "h/z", "image_bytes": None, "fmt": "png",
            "caption": "c", "img_w": 4, "img_h": 4, "phash": 7}),
    ]
    # a page with no headers at all and one with an empty header list
    rows.append(mk("a.test", "12", branching=1))
    rows[-1]["headers"] = None
    rows.append(mk("a.test", "13", branching=1))
    rows[-1]["headers"] = []

    arrow_out = pa.schema(
        [pa.field(f.name, to_arrow_type(f.dataType)) for f in RESULT_FULL_SCHEMA.fields]
    )

    def run_both(rows, check_payload, with_img_cols):
        cols = ["url_key", "fetch_url", "depth", "priority", "_allowed", "url",
                "status", "status_code", "proto", "proto_major", "proto_minor",
                "content_type", "location", "headers", "html"]
        if with_img_cols:
            cols += ["image_id", "image_bytes", "fmt", "caption",
                     "img_w", "img_h", "phash"]
        pdf = pd.DataFrame({c: [r[c] for r in rows] for c in cols})
        out_pdfs = list(_parse_map(check_payload, None)(iter([pdf])))
        assert len(out_pdfs) == 1
        # NaN -> null like Spark's pandas->Arrow serializer; typed
        # empties for the zero-row case (empty pandas cols are float64)
        expect_arrs = [
            pa.array([], type=f.type) if len(out_pdfs[0]) == 0
            else pa.Array.from_pandas(out_pdfs[0][f.name], type=f.type)
            for f in arrow_out
        ]
        expected = pa.RecordBatch.from_arrays(expect_arrs, schema=arrow_out).to_pylist()

        pa_types = {
            "depth": pa.int64(), "priority": pa.int32(), "_allowed": pa.bool_(),
            "status_code": pa.int64(), "proto_major": pa.int64(),
            "proto_minor": pa.int64(),
            "headers": pa.list_(pa.struct([("K", pa.string()), ("V", pa.string())])),
            "image_bytes": pa.binary(), "img_w": pa.int32(), "img_h": pa.int32(),
            "phash": pa.int64(),
        }
        in_arrs = [
            pa.array([r[c] for r in rows], type=pa_types.get(c, pa.string()))
            for c in cols
        ]
        rb = pa.RecordBatch.from_arrays(in_arrs, names=cols)
        got_batches = list(_parse_map_arrow(check_payload, None)(iter([rb])))
        assert len(got_batches) == 1
        got = got_batches[0].to_pylist()
        assert got == expected, (check_payload, with_img_cols)
        return got

    got = run_both(rows, check_payload=True, with_img_cols=True)
    assert len(got) == len(rows) - 1  # exactly the LEFT-miss row dropped
    # the valid-png payload actually verified
    pay = {g["UrlKey"]: g["Payload"] for g in got}
    p = pay["http://a.test/9"]
    assert p["PixelsOk"] is True and p["Psnr"] is not None
    assert pay["http://a.test/10"]["Psnr"] is None  # decode-error fmt
    assert pay["http://a.test/11"] is None  # bytes missing -> no payload

    run_both(rows, check_payload=False, with_img_cols=True)
    run_both([r for r in rows if r["image_bytes"] is None], False, False)
    run_both([], check_payload=False, with_img_cols=False)  # zero-row batch
    run_both([mk("a.test", "drop", miss=True)], False, False)  # all dropped

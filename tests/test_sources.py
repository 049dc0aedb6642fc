"""Sitemap/list sources (A2/A3), schema export (A19), CLI surface,
and the streaming taps."""

import json
import subprocess
import sys

import pytest

from crawlspark import sitemap
from crawlspark.schema import RESULT_SCHEMA, bigquery_json

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://site-0.test/</loc></url>
  <url><loc>http://site-0.test/0</loc></url>
</urlset>"""

INDEX = """<?xml version="1.0" encoding="UTF-8"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://site-0.test/sitemap-a.xml</loc></sitemap>
  <sitemap><loc>http://site-0.test/sitemap-b.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_urlset():
    # sitemap_test.go:12-29 analog
    assert sitemap.parse(URLSET) == ["http://site-0.test/", "http://site-0.test/0"]


def test_parse_index():
    assert sitemap.parse_index(INDEX) == [
        "http://site-0.test/sitemap-a.xml",
        "http://site-0.test/sitemap-b.xml",
    ]


def test_invalid_data_raises():
    # sitemap_test.go:60-72 analog
    with pytest.raises(Exception):
        sitemap.parse("this is not xml <<<")


def test_fetch_all_recursive_with_cycle_guard():
    docs = {
        "http://s.test/sitemap.xml": INDEX.replace("site-0.test/sitemap-a.xml", "s.test/a.xml")
        .replace("site-0.test/sitemap-b.xml", "s.test/b.xml"),
        "http://s.test/a.xml": URLSET,
        # b.xml points back at the index — must not loop
        "http://s.test/b.xml": INDEX.replace("site-0.test/sitemap-a.xml", "s.test/sitemap.xml")
        .replace("site-0.test/sitemap-b.xml", "s.test/a.xml"),
    }
    urls = sitemap.fetch_all("http://s.test/sitemap.xml", lambda u: docs.get(u))
    assert urls == ["http://site-0.test/", "http://site-0.test/0"]


def test_list_from_text():
    assert sitemap.list_from_text("http://a/\n\n  http://b/x \n") == ["http://a/", "http://b/x"]


def test_bigquery_schema_export():
    """A19: same shape as /root/reference/schema.json — Depth the only
    REQUIRED field, nested RECORDs, REPEATED Links/Hreflang/Header."""
    fields = json.loads(bigquery_json(RESULT_SCHEMA))
    by_name = {f["name"]: f for f in fields}
    assert by_name["Depth"] == {"name": "Depth", "type": "INT64", "mode": "REQUIRED"}
    assert by_name["Address"]["type"] == "RECORD"
    assert by_name["Links"]["mode"] == "REPEATED"
    assert {sf["name"] for sf in by_name["Address"]["fields"]} == {
        "Full", "Scheme", "Opaque", "Host", "Path", "Query",
    }
    # golden cross-check against the reference's generated schema
    with open("/root/reference/schema.json") as f:
        ref = json.loads(f.read())
    ref_names = [f["name"] for f in ref]
    ours = [f["name"] for f in fields]
    assert ours == ref_names
    ref_modes = {f["name"]: f["mode"] for f in ref}
    assert all(by_name[n]["mode"] == m for n, m in ref_modes.items())

    # full deep-structure parity: names, types, modes at every level
    def strip(fs):
        return [
            {
                "name": f["name"], "type": f["type"], "mode": f["mode"],
                "fields": strip(f.get("fields", [])),
            }
            for f in fs
        ]

    assert strip(fields) == strip(ref)


def test_cli_schema_subcommand():
    out = subprocess.run(
        [sys.executable, "-m", "crawlspark.cli", "schema"],
        capture_output=True, text=True, cwd="/root/repo", timeout=60,
    )
    assert out.returncode == 0
    assert json.loads(out.stdout)[1]["name"] == "Depth"


def test_cli_version_subcommand():
    """Parity with `crawl version` (crawl.go:56-59, version.go:8)."""
    out = subprocess.run(
        [sys.executable, "-m", "crawlspark.cli", "version"],
        capture_output=True, text=True, cwd="/root/repo", timeout=60,
    )
    assert out.returncode == 0
    assert out.stdout.strip() == "v0.2.0"


def test_cli_sitemap_index_expands_recursively(tmp_path):
    """A local sitemapindex must expand to PAGE urls (crawl.go:175-216
    recursion), resolving child locs relative to the index file."""
    child1 = tmp_path / "child1.xml"
    child1.write_text(
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>http://x.test/a</loc></url>"
        "<url><loc>http://x.test/b</loc></url></urlset>"
    )
    child2 = tmp_path / "child2.xml"
    child2.write_text(
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>http://x.test/c</loc></url></urlset>"
    )
    index = tmp_path / "index.xml"
    index.write_text(
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<sitemap><loc>http://x.test/child1.xml</loc></sitemap>"
        "<sitemap><loc>http://x.test/child2.xml</loc></sitemap></sitemapindex>"
    )
    out = subprocess.run(
        [sys.executable, "-m", "crawlspark.cli", "sitemap", str(index)],
        capture_output=True, text=True, cwd="/root/repo", timeout=60,
    )
    assert out.returncode == 0
    assert out.stdout.split() == ["http://x.test/a", "http://x.test/b", "http://x.test/c"]


def test_cli_sitemap_skips_cross_host_children(tmp_path):
    """The local-file sitemap fetcher anchors to the first host and
    warns-and-skips cross-host / host-only index children instead of
    silently resolving them against the local tree (ADVICE r02)."""
    child = tmp_path / "child.xml"
    child.write_text(
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>http://x.test/a</loc></url></urlset>"
    )
    index = tmp_path / "index.xml"
    index.write_text(
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<sitemap><loc>http://x.test/child.xml</loc></sitemap>"
        "<sitemap><loc>http://evil.test/child.xml</loc></sitemap>"
        "<sitemap><loc>http://x.test</loc></sitemap></sitemapindex>"
    )
    out = subprocess.run(
        [sys.executable, "-m", "crawlspark.cli", "sitemap", str(index)],
        capture_output=True, text=True, cwd="/root/repo", timeout=60,
    )
    assert out.returncode == 0
    assert out.stdout.split() == ["http://x.test/a"]
    assert "cross-host" in out.stderr and "evil.test" in out.stderr
    assert "host-only" in out.stderr


def test_spark_submit_pyfiles_e2e(tmp_path):
    """The deployment path the north rule names: `spark-submit
    --py-files <zip> scripts/submit_crawl.py` run from OUTSIDE the
    repo, so crawlspark is importable ONLY from the shipped zip (the
    real-cluster layout). Result count must match the sequential
    oracle for the same config."""
    import json as _json
    import os

    from crawlspark import oracle, testkit
    from crawlspark.config import CrawlConfig
    from crawlspark.shipping import make_pyfiles_zip

    pages_pdf, robots_pdf, seeds = testkit.matrix_site()
    cfg = CrawlConfig(From=seeds, MaxDepth=1, RespectNofollow=False)
    pages = {r["url"]: r for r in pages_pdf.to_dict("records")}
    rob = {
        (r["scheme"], r["host"]): (r["status_code"], r["body"])
        for r in robots_pdf.to_dict("records")
    }
    results, _seen, _ = oracle.crawl_oracle(cfg, pages, rob)

    cfgp = tmp_path / "cfg.json"
    cfgp.write_text(_json.dumps(
        {"From": seeds, "MaxDepth": 1, "RespectNofollow": False}
    ))
    zip_path = make_pyfiles_zip(str(tmp_path / "crawlspark-pyfiles.zip"))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        ["/opt/spark/bin/spark-submit", "--master", "local[4]",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--py-files", zip_path,
         "/root/repo/scripts/submit_crawl.py", str(cfgp)],
        capture_output=True, text=True, cwd=str(tmp_path), env=env, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-3000:]
    lines = out.stdout.splitlines()
    n = next(int(l.split()[1]) for l in lines if l.startswith("RESULTS"))
    assert n == len(results), (n, len(results))
    assert any(l.startswith("METRICS") for l in lines)


def test_streaming_event_windows(spark, tmp_path):
    """Append-mode windowed agg: every real window finalizes exactly
    once after the flush sentinel pushes the watermark past it, and
    the window STATE is evicted (bounded state — VERDICT r02 #1):
    after the drain, the state store holds only the sentinel's two
    never-finalized panes, not one row per emitted window."""
    from pyspark.sql import functions as F

    from crawlspark import streaming

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    path = str(tmp_path / "events")
    events.coalesce(1).write.parquet(path)
    before = set(streaming.parquet_parts(path))
    flush = events.select(
        (F.max("ts") + F.expr("INTERVAL 4 HOURS")).alias("ts"),
        F.lit("__flush__").alias("event_type"),
    )
    for c in events.columns:
        if c not in ("ts", "event_type"):
            flush = flush.withColumn(c, F.lit(None).cast(events.schema[c].dataType))
    flush.select(*events.columns).coalesce(1).write.mode("append").parquet(path)
    # pin sentinel AFTER events in mtime order (FileStreamSource sorts
    # by mtime; a tie could flush-then-drop every real event)
    streaming.bump_sentinel_mtime(path, before)
    q = streaming.stream_event_windows(
        spark, path, events.schema, query_name="ew_test", max_files_per_trigger=1
    )
    try:
        out = streaming.drain(q)
        rows = [r for r in out.collect() if r["event_type"] != "__flush__"]
        assert len(rows) > 0
        total = sum(r["n"] for r in rows)
        # sliding window (2 panes per event at 1h/30m) -> 2x row coverage
        assert total == 2 * events.count()
        # bounded state: watermark eviction removed every finalized
        # window; only the sentinel's 2 panes remain in the store
        state_rows = q.lastProgress["stateOperators"][0]["numRowsTotal"]
        assert state_rows <= 2, state_rows
        assert state_rows < len(rows)
    finally:
        q.stop()


def test_streaming_crawl_monitor(spark, tmp_path):
    from crawlspark import streaming, testkit
    from crawlspark.config import CrawlConfig
    from crawlspark.engine import SparkCrawler

    pages, robots, seeds = testkit.nice_site(branching=2, max_id_len=2)
    c = SparkCrawler(
        spark, CrawlConfig(From=seeds, MaxDepth=1),
        testkit.pages_to_spark(spark, pages), testkit.robots_to_spark(spark, robots),
        workdir=str(tmp_path / "crawl"),
    )
    c.run()
    q = streaming.stream_crawl_monitor(
        spark, str(tmp_path / "crawl" / "results" / "wave=*"), query_name="cm_test"
    )
    try:
        out = streaming.drain(q)
        by_depth = {r["Depth"]: r["n"] for r in out.collect()}
        assert by_depth[0] == 1 and by_depth[1] == 2
    finally:
        q.stop()


def test_stateful_host_counter(spark, tmp_path):
    """applyInPandasWithState: per-host counters accumulate across
    micro-batches (maxFilesPerTrigger=1 forces multiple batches)."""
    from crawlspark import streaming, testkit
    from crawlspark.config import CrawlConfig
    from crawlspark.engine import SparkCrawler

    pages, robots, seeds = testkit.matrix_site()
    c = SparkCrawler(
        spark, CrawlConfig(From=seeds, MaxDepth=2),
        testkit.pages_to_spark(spark, pages), testkit.robots_to_spark(spark, robots),
        workdir=str(tmp_path / "crawl"),
    )
    c.run()
    q = streaming.stateful_host_counter(
        spark, str(tmp_path / "crawl" / "results" / "wave=*"), query_name="hc_test"
    )
    try:
        out = streaming.drain(q)
        rows = {r["host"]: r for r in out.collect()}
        res = c.results()
        exp_fetch = {
            r["host"]: r["n"]
            for r in res.filter("Status != 'Blocked by robots.txt'")
            .groupBy(res.Address.Host.alias("host")).count().withColumnRenamed("count", "n")
            .collect()
        }
        for host, n in exp_fetch.items():
            assert rows[host]["fetched"] == n, (host, rows[host], n)
        blocked_total = sum(r["blocked"] for r in rows.values())
        assert blocked_total == res.filter("Status = 'Blocked by robots.txt'").count()
        # state really crossed micro-batches
        assert any(r["batches"] > 1 for r in rows.values())
    finally:
        q.stop()


def test_cli_spider_ndjson(tmp_path):
    """CLI spider end-to-end: NDJSON rows with omitempty semantics,
    depth-ascending order (crawl.go:138-160 surface)."""
    import json as _json

    cfgp = tmp_path / "config.json"
    cfgp.write_text(_json.dumps({
        "From": ["http://site-0.test/"], "MaxDepth": 1,
        "RespectNofollow": True, "Connections": 4,
    }))
    out = subprocess.run(
        [sys.executable, "-m", "crawlspark.cli", "spider", str(cfgp)],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [_json.loads(line) for line in out.stdout.splitlines() if line.startswith("{")]
    assert len(rows) > 5
    depths = [r["Depth"] for r in rows]
    assert depths == sorted(depths)  # reference ordering guarantee
    root = rows[0]
    assert root["Address"]["Full"] == "http://site-0.test/"
    assert "Links" in root and len(root["Links"]) > 0
    # omitempty: blocked rows must drop null response fields
    blocked = [r for r in rows if r.get("Status") == "Blocked by robots.txt"]
    for b in blocked:
        assert "StatusCode" not in b and "Header" not in b


def test_cli_expire_then_warm_spider(tmp_path):
    """CLI re-crawl cycle: spider --workdir, expire a child URL, then
    spider --warm re-emits only the seeds plus the expired URL."""
    import json as _json

    cfgp = tmp_path / "config.json"
    cfgp.write_text(_json.dumps({
        "From": ["http://site-0.test/"], "MaxDepth": 1,
        "RespectNofollow": True, "Connections": 4,
    }))
    w1, w2 = str(tmp_path / "gen1"), str(tmp_path / "gen2")
    out = subprocess.run(
        [sys.executable, "-m", "crawlspark.cli", "spider", "--workdir", w1, str(cfgp)],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [_json.loads(x) for x in out.stdout.splitlines() if x.startswith("{")]
    victim = next(r["Address"]["Full"] for r in rows if r["Depth"] == 1)

    out = subprocess.run(
        [sys.executable, "-m", "crawlspark.cli", "expire", str(cfgp), w1, victim],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    metrics = _json.loads(out.stdout.strip().splitlines()[-1])
    assert metrics["expired"] == 1

    out = subprocess.run(
        [sys.executable, "-m", "crawlspark.cli", "spider",
         "--workdir", w2, "--warm", w1, str(cfgp)],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows2 = [_json.loads(x) for x in out.stdout.splitlines() if x.startswith("{")]
    urls2 = sorted(r["Address"]["Full"] for r in rows2)
    assert urls2 == sorted(["http://site-0.test/", victim])


def test_cli_list_mode_from_sitemap_xml(tmp_path):
    """`crawl list -format=xml`: stdin sitemap -> single wave
    (MaxDepth forced to 0, crawl.go:133-134)."""
    import json as _json

    cfgp = tmp_path / "config.json"
    cfgp.write_text(_json.dumps({"MaxDepth": 3, "RespectNofollow": True}))
    out = subprocess.run(
        [sys.executable, "-m", "crawlspark.cli", "list", "-format=xml", str(cfgp)],
        input=URLSET, capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    rows = [_json.loads(line) for line in out.stdout.splitlines() if line.startswith("{")]
    # exactly the 2 sitemap URLs, all depth 0 despite MaxDepth=3 in config
    assert len(rows) == 2
    assert all(r["Depth"] == 0 for r in rows)
    assert {r["Address"]["Full"] for r in rows} == {
        "http://site-0.test/", "http://site-0.test/0",
    }


def test_langid_discriminates_real_text(spark):
    """langid's trigram profiles on real sentences in 4 languages."""
    import pandas as pd

    from crawlspark.ops import text as ops_text

    rows = [
        {"doc_id": 1, "lang": "en", "source": "s", "n_chars": 1,
         "text": "the quick brown fox jumps over the lazy dog and runs into the forest"},
        {"doc_id": 2, "lang": "es", "source": "s", "n_chars": 1,
         "text": "el perro corre por la calle y la casa de la familia que vive cerca del mar"},
        {"doc_id": 3, "lang": "fr", "source": "s", "n_chars": 1,
         "text": "le chien court dans la rue et les enfants jouent devant la maison de la famille"},
        {"doc_id": 4, "lang": "de", "source": "s", "n_chars": 1,
         "text": "der hund läuft durch die strasse und die kinder spielen vor dem haus einer familie"},
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows))
    out = {r["doc_id"]: r["lang_pred"] for r in ops_text.langid(docs).collect()}
    assert out == {1: "en", 2: "es", 3: "fr", 4: "de"}

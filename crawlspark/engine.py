"""The batch-iterative crawl engine: one BFS wave = one Spark job
chain (SURVEY.md §3.5). Reproduces the reference state machine's
observable semantics (/root/reference/crawler/state.go:20-115,
crawler.go:115-274) on the DataFrame API:

wave(d): frontier(depth=d) scan
       -> robots join + gate (A10)               [join + pandas UDF]
       -> per-host politeness budget (A11)       [applyInPandas, salted]
       -> fetch = join against the pages table (A12; the sandbox has
          no network — the pages fixture IS the web, same interface)
       -> parse/hydrate + payload check (A13-A15) [mapInPandas, Arrow]
       -> results staged to the snapshot store (A17-A18)
       -> candidates: redirect targets ∪ exploded links (A15/A16)
       -> scope + nofollow column filters (A6, A8) [no UDF]
       -> within-wave dedup: groupBy(url).min(priority)
       -> bloom prefilter + exact anti-join vs seen (A7)
       -> frontier(d+1) + seen delta + bloom bits + metrics committed
          atomically per wave (resumable mid-crawl).

Scale notes (the 10^10 design, exercised at fixture scale):
- frontier/seen/results never touch driver memory (store-backed);
- the pages join and the seen anti-join are the two big shuffles;
  AQE (+ skew join) is assumed on; the bloom cogroup keeps the
  anti-join probe side small (definitely-new URLs bypass it);
- hot hosts are salt-split before the politeness groupBy so no task
  inherits a whole host (north_rule skew clause);
- everything crossing Python<->JVM is Arrow-batched (mapInPandas /
  applyInPandas / pandas UDFs) — no row-at-a-time Python.
"""

from __future__ import annotations

import math
import os
import time

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from . import bloomfilter, canon, oracle, robots, scratch
from .config import CrawlConfig
from .schema import (
    FRONTIER_SCHEMA,
    RESULT_ENGINE_FIELDS,
    RESULT_FIELDS,
)
from .scope import check_patterns, scope_filter_expr
from .store import SnapshotStore

__all__ = ["SparkCrawler", "bucketize_pages"]


def drop_catalog_table(spark: SparkSession, table: str) -> None:
    """DROP TABLE plus warehouse-location cleanup: the catalog is
    per-session but the warehouse dir persists, so an interrupted
    prior process can leave an orphan location that would corrupt a
    fresh saveAsTable (shared by bucketize_pages and the bucketed
    seen layout — code-review r08 deduplication)."""
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {table}")
    loc = os.path.join(
        spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").removeprefix("file:"),
        table.lower(),
    )
    if os.path.exists(loc):
        shutil.rmtree(loc)


def bucketize_pages(spark: SparkSession, pages_df: DataFrame, table: str, buckets: int = 32) -> DataFrame:
    """Persist the pages corpus as a bucketed+sorted table on its join
    key. The per-wave fetch join then shuffles ONLY the frontier side
    (the bucketed scan satisfies the join's distribution requirement —
    verified: `Bucketed: true`, no Exchange above the pages scan).
    At 10^10 scale this halves the biggest shuffle in the pipeline
    (PLANS.md shuffle inventory)."""
    drop_catalog_table(spark, table)
    pages_df.write.bucketBy(buckets, "url").sortBy("url").mode("overwrite").saveAsTable(table)
    return spark.table(table)

RESULT_FULL_SCHEMA = T.StructType(RESULT_FIELDS + RESULT_ENGINE_FIELDS)

def _with_url_parts(df: DataFrame) -> DataFrame:
    """scheme/host/fetch_key as pure column expressions over
    fetch_url. Frontier fetch_urls are ALWAYS outputs of canon (seeds
    via canon_seed, links via make_address serialization), i.e.
    already in normalized `scheme://host/path[?q][#f]` form — so
    regexp extraction here is exact, stays inside WholeStageCodegen,
    and costs no Python stage."""
    u = F.col("fetch_url")
    return (
        df.withColumn("scheme", F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*):", 1))
        .withColumn("host", F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)", 1))
        .withColumn("fetch_key", F.regexp_replace(u, r"#.*$", ""))
    )


def _robots_allowed_udf(robots_user_agent: str):
    """Scalar pandas UDF: allowed(url | robots status+body). Matchers
    compiled once per distinct (status, body) per batch."""

    @F.pandas_udf(T.BooleanType())
    def allowed(url: pd.Series, status: pd.Series, body: pd.Series) -> pd.Series:  # noqa: ANN001
        cache: dict = {}
        out = []
        for u, s, b in zip(url, status, body):
            key = (None if pd.isna(s) else int(s), b if isinstance(b, str) else None)
            m = cache.get(key)
            if m is None:
                m = robots.Matcher(robots.from_status(*key), robots_user_agent)
                cache[key] = m
            out.append(m.allowed(u))
        return pd.Series(out, dtype=bool)

    return allowed


def _robots_allowed_local_udf(robots_user_agent: str, robots_bc):
    """Gate UDF for the collected-robots path (r05): the
    (scheme, host) -> (status, body) table rides a SparkContext
    broadcast into the closure, so the gate needs NO rules join and
    no per-wave JVM broadcast build. The Matcher cache is keyed on
    the SAME (status, body) tuple as the join-path UDF — a missing
    host maps to (None, None) exactly like a left-join miss — so the
    two paths cannot diverge (pinned by
    test_robots_local_gate_equals_join_gate)."""

    @F.pandas_udf(T.BooleanType())
    def allowed(url: pd.Series, scheme: pd.Series, host: pd.Series) -> pd.Series:  # noqa: ANN001
        table = robots_bc.value
        cache: dict = {}
        out = []
        for u, sc, h in zip(url, scheme, host):
            row = table.get((sc, h))
            key = (None, None) if row is None else row
            m = cache.get(key)
            if m is None:
                m = robots.Matcher(robots.from_status(*key), robots_user_agent)
                cache[key] = m
            out.append(m.allowed(u))
        return pd.Series(out, dtype=bool)

    return allowed


def _effective_seen_keys(store: SnapshotStore) -> DataFrame | None:
    """THE seen-set recipe, in one place (code-review r04 dedup):
    frontier slices ∪ the store's own warm_seen table, minus expired
    tombstones. Used for the warm-start load (prior store), the
    public seen() view, and expire()'s survivor set."""
    fr = store.read("frontier")
    if fr is None:
        return None
    keys = fr.select("url_key")
    warm = store.read("warm_seen")
    if warm is not None:
        keys = keys.unionByName(warm.select("url_key"))
    keys = keys.distinct()
    tomb = store.read("expired")
    if tomb is not None:
        keys = keys.join(tomb.select("url_key").distinct(), "url_key", "left_anti")
    return keys


def _latest_bloom_of(spark: SparkSession, store: SnapshotStore) -> DataFrame | None:
    """Newest committed seen-filter slice of a store, or None."""
    for m in reversed(store._manifests()):
        info = m["tables"].get("bloom")
        if info:
            return spark.read.parquet(*info["files"]).select("shard", "bits")
    return None


def _rows_to_pdf(rows: list[dict]) -> pd.DataFrame:
    cols = [f.name for f in RESULT_FULL_SCHEMA.fields]
    return pd.DataFrame({c: [r.get(c) for r in rows] for c in cols})


def _parse_map(check_payload: bool, blocked_counter=None):
    """fetch+parse stage: joined (frontier ⋈ pages [⋈ images]) rows ->
    full nested Result rows. Pure function of the row — safe to
    re-execute on task retry (idempotent wave semantics).

    Single-pass mode (input carries ``_allowed`` from the robots gate,
    pages side LEFT-joined): robots-blocked rows emit blocked results
    inline and allowed rows with no page row are dropped (fetch error,
    crawler.go:256-259) — one job evaluates gate+fetch+parse+blocked,
    instead of the gate running once per filter branch."""

    def fn(batches):
        from . import imagecodec

        for pdf in batches:
            rows = []
            n_blocked = 0
            has_img = "image_bytes" in pdf.columns
            has_gate = "_allowed" in pdf.columns
            for r in pdf.to_dict("records"):
                if has_gate:
                    if not r["_allowed"]:
                        res = oracle.blocked_result(r["fetch_url"], int(r["depth"]))
                        res["Priority"] = int(r["priority"])
                        res["UrlKey"] = r["url_key"]
                        res["Payload"] = None
                        rows.append(res)
                        n_blocked += 1
                        continue
                    if r["url"] is None:  # LEFT-join miss: no page -> fetch error, silent drop
                        continue
                hdrs = r["headers"]  # Arrow list column -> numpy array or None
                if isinstance(hdrs, float):  # pandas NaN for a null list
                    r["headers"] = None
                # the joined record IS page-shaped (same column names the
                # page dict used to copy) — _sorted_headers iterates the
                # ndarray directly, so no per-row dict/list rebuild here
                res = oracle.make_result_dict(r["fetch_url"], int(r["depth"]), r)
                res["Priority"] = int(r["priority"])
                res["UrlKey"] = r["url_key"]
                payload = None
                if has_img and r.get("image_id") is not None and r.get("image_bytes") is not None:
                    img_id, fmt = r["image_id"], r["fmt"]
                    psnr_v, ok = None, None
                    if check_payload:
                        try:
                            dec = imagecodec.decode(bytes(r["image_bytes"]), fmt)
                            truth = imagecodec.synth_image(img_id, int(r["img_w"]), int(r["img_h"]))
                            psnr_v = imagecodec.psnr(truth, dec)
                            ok = bool(psnr_v >= 40.0)
                        except NotImplementedError:
                            psnr_v, ok = None, None
                    payload = {
                        "ImageId": img_id,
                        "Caption": r["caption"],
                        "Fmt": fmt,
                        "W": int(r["img_w"]),
                        "H": int(r["img_h"]),
                        "Phash": int(r["phash"]) if r["phash"] is not None else None,
                        "Psnr": psnr_v,
                        "PixelsOk": ok,
                    }
                res["Payload"] = payload
                rows.append(res)
            if blocked_counter is not None and n_blocked:
                blocked_counter.add(n_blocked)
            yield _rows_to_pdf(rows)

    return fn


_NONE6 = (None, None, None, None, None, None)


class _AddrCols:
    """Flat column builder for an Address struct (r10 columnar parse):
    one tuple per entry in make_resolver_parts field order, unzipped
    into the six child arrays at batch end (one list append per
    address instead of seven; nulls are the _NONE6 sentinel, detected
    by identity)."""

    __slots__ = ("rows",)

    def __init__(self):
        self.rows = []

    def add_none(self):
        self.rows.append(_NONE6)

    def add_parts(self, t):
        self.rows.append(t if t is not None else _NONE6)

    def add_dict(self, a):
        if a is None:
            self.rows.append(_NONE6)
        else:
            self.rows.append(
                (a["Full"], a["Scheme"], a["Opaque"], a["Host"], a["Path"], a["Query"])
            )

    def array(self, pa, typ):
        s = pa.string()
        rows = self.rows
        if rows:
            full, scheme, opaque, host, path, query = zip(*rows)
        else:
            full = scheme = opaque = host = path = query = ()
        return pa.StructArray.from_arrays(
            [
                pa.array(full, s),
                pa.array(scheme, s),
                pa.array(opaque, s),
                pa.array(host, s),
                pa.array(path, s),
                pa.array(query, s),
            ],
            fields=list(typ),
            mask=pa.array([r is _NONE6 for r in rows], pa.bool_()),
        )


# every input column the parse stage reads — _apply_parse_stage
# projects to these before the Python boundary (guide §4.1: Spark
# cannot prune columns into an opaque map function, so fetch_key /
# host / _req_headers would otherwise cross it for nothing)
_PARSE_INPUT_COLS = frozenset(
    (
        "url_key", "fetch_url", "depth", "priority", "_allowed", "url",
        "status", "status_code", "proto", "proto_major", "proto_minor",
        "content_type", "location", "headers", "html",
        "image_id", "image_bytes", "fmt", "caption", "img_w", "img_h", "phash",
    )
)


def _parse_map_arrow(check_payload: bool, blocked_counter=None):
    """Columnar twin of :func:`_parse_map` (r10, guide §4.2): the same
    per-row decisions through the same parity primitives
    (canon.make_address, canon.make_resolver_parts,
    htmlex.extract_html, oracle._sorted_header_pairs,
    canon.resolve_address, oracle's blocked shape), but the output
    RecordBatch is assembled from FLAT column lists — no per-row
    Result/Link/Address dicts and no nested-dict -> Arrow conversion
    (measured ~50 us/row of the bench parse). Output is pinned
    row-identical to _parse_map by
    tests/test_engine.py::test_parse_map_arrow_differential."""

    def fn(batches):
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_type

        from . import htmlex, imagecodec

        schema = pa.schema(
            [pa.field(f.name, to_arrow_type(f.dataType)) for f in RESULT_FULL_SCHEMA.fields]
        )
        t_addr = schema.field("Address").type
        t_canon = schema.field("Canonical").type
        t_link = schema.field("Links").type.value_type
        t_hl = schema.field("Hreflang").type.value_type
        t_pair = schema.field("Header").type.value_type
        t_payload = schema.field("Payload").type
        i32, i64, s_t = pa.int32(), pa.int64(), pa.string()
        make_address = canon.make_address
        make_resolver_parts = canon.make_resolver_parts
        sorted_pairs = oracle._sorted_header_pairs
        extract_html = htmlex.extract_html

        for rb in batches:
            idx = {n: j for j, n in enumerate(rb.schema.names)}
            col = lambda nm: rb.column(idx[nm]).to_pylist()  # noqa: E731
            has_img = "image_bytes" in idx
            has_gate = "_allowed" in idx
            fetch_url_c = col("fetch_url")
            depth_c = col("depth")
            prio_c = col("priority")
            key_c = col("url_key")
            status_c = col("status")
            sc_c = col("status_code")
            proto_c = col("proto")
            pmaj_c = col("proto_major")
            pmin_c = col("proto_minor")
            ct_c = col("content_type")
            html_c = col("html")
            loc_c = col("location")
            headers_c = col("headers")
            allowed_c = col("_allowed") if has_gate else None
            url_c = col("url") if has_gate else None
            if has_img:
                img_id_c = col("image_id")
                img_b_c = col("image_bytes")
                fmt_c = col("fmt")
                cap_c = col("caption")
                imw_c = col("img_w")
                imh_c = col("img_h")
                ph_c = col("phash")

            n_blocked = 0
            addr_b = _AddrCols()
            resolves_b = _AddrCols()
            # bound-local append methods for the per-link hot loop
            # (~60 links/row at bench shape: the attribute lookups are
            # a measurable slice of the stage)
            depth_o = []; bodyhash_o = []; desc_o = []; title_o = []; h1_o = []
            robots_o = []; status_o = []; sc_o = []; proto_o = []
            pmaj_o = []; pmin_o = []; prio_o = []; key_o = []
            canon_b = _AddrCols(); canon_href = []; canon_mask = []
            link_addr_b = _AddrCols(); link_anchor = []; link_href = []; link_nf = []
            link_off = []; link_cur = 0
            la_app = link_addr_b.rows.append
            lan_app = link_anchor.append; lh_app = link_href.append
            lnf_app = link_nf.append
            hl_addr_b = _AddrCols(); hl_href = []; hl_lang = []
            hl_off = []; hl_cur = 0
            hla_app = hl_addr_b.rows.append
            hlh_app = hl_href.append; hll_app = hl_lang.append
            hdr_k = []; hdr_v = []; hdr_off = []; hdr_cur = 0
            pay_mask = []; pay_id = []; pay_cap = []; pay_fmt = []
            pay_w = []; pay_h = []; pay_ph = []; pay_psnr = []; pay_ok = []

            for i in range(rb.num_rows):
                if has_gate:
                    if not allowed_c[i]:
                        # oracle.blocked_result shape (state.go:58-61)
                        addr_b.add_dict(make_address(fetch_url_c[i]))
                        depth_o.append(depth_c[i])
                        bodyhash_o.append(None)
                        desc_o.append(""); title_o.append(""); h1_o.append("")
                        robots_o.append("")
                        canon_mask.append(True); canon_b.add_none(); canon_href.append(None)
                        link_off.append(None)
                        hl_off.append(None)
                        status_o.append("Blocked by robots.txt")
                        sc_o.append(None); proto_o.append(None)
                        pmaj_o.append(None); pmin_o.append(None)
                        hdr_off.append(None)
                        resolves_b.add_none()
                        prio_o.append(prio_c[i]); key_o.append(key_c[i])
                        pay_mask.append(True); pay_id.append(None); pay_cap.append(None)
                        pay_fmt.append(None); pay_w.append(None); pay_h.append(None)
                        pay_ph.append(None); pay_psnr.append(None); pay_ok.append(None)
                        n_blocked += 1
                        continue
                    if url_c[i] is None:  # LEFT-join miss: no page -> fetch error, silent drop
                        continue
                addr = make_address(fetch_url_c[i])
                base_full = addr["Full"] if addr else None
                addr_b.add_dict(addr)
                depth_o.append(depth_c[i])
                status_o.append(status_c[i])
                sc0 = sc_c[i]
                sc_o.append(sc0 or None)
                proto_o.append(proto_c[i])
                pmaj_o.append(pmaj_c[i]); pmin_o.append(pmin_c[i])
                pairs = sorted_pairs(headers_c[i])
                hdr_off.append(hdr_cur)
                for k, v in pairs:
                    hdr_k.append(k)
                    hdr_v.append(v)
                hdr_cur += len(pairs)
                ct = ct_c[i] or ""
                html = html_c[i]
                if ct.startswith("text/html") and html:
                    resolve = make_resolver_parts(base_full)
                    ex = extract_html(html)
                    title_o.append(ex["Title"]); h1_o.append(ex["H1"])
                    desc_o.append(ex["Description"]); robots_o.append(ex["Robots"])
                    bodyhash_o.append(ex["BodyTextHash"])
                    canon_mask.append(False)
                    canon_b.add_parts(resolve(ex["CanonicalHref"]))
                    canon_href.append(ex["CanonicalHref"])
                    hl = ex["Hreflang"]
                    if hl:
                        hl_off.append(hl_cur)
                        # alternate links repeat one href across
                        # languages — reuse the last resolve (pure fn)
                        ph = pt = None
                        for href, lang in hl:
                            if href == ph:
                                t = pt
                            else:
                                t = resolve(href)
                                ph, pt = href, t
                            hla_app(t if t is not None else _NONE6)
                            hlh_app(href)
                            hll_app(lang)
                        hl_cur += len(hl)
                    else:
                        hl_off.append(None)  # [] -> None, result.go omitempty parity
                    lk = ex["Links"]
                    if lk:
                        link_off.append(link_cur)
                        for href, anchor, nofollow in lk:
                            t = resolve(href)
                            la_app(t if t is not None else _NONE6)
                            lan_app(anchor)
                            lh_app(href)
                            lnf_app(nofollow)
                        link_cur += len(lk)
                    else:
                        link_off.append(None)
                else:
                    title_o.append(""); h1_o.append(""); desc_o.append("")
                    robots_o.append("")
                    bodyhash_o.append(None)
                    canon_mask.append(True); canon_b.add_none(); canon_href.append(None)
                    hl_off.append(None)
                    link_off.append(None)
                if sc0 and 300 <= sc0 < 400:
                    resolves_b.add_dict(canon.resolve_address(base_full, loc_c[i] or ""))
                else:
                    resolves_b.add_dict(addr)
                prio_o.append(prio_c[i]); key_o.append(key_c[i])
                if has_img and img_id_c[i] is not None and img_b_c[i] is not None:
                    psnr_v, ok = None, None
                    if check_payload:
                        try:
                            dec = imagecodec.decode(img_b_c[i], fmt_c[i])
                            truth = imagecodec.synth_image(
                                img_id_c[i], int(imw_c[i]), int(imh_c[i])
                            )
                            psnr_v = imagecodec.psnr(truth, dec)
                            ok = bool(psnr_v >= 40.0)
                        except NotImplementedError:
                            psnr_v, ok = None, None
                    pay_mask.append(False)
                    pay_id.append(img_id_c[i]); pay_cap.append(cap_c[i])
                    pay_fmt.append(fmt_c[i])
                    pay_w.append(int(imw_c[i])); pay_h.append(int(imh_c[i]))
                    pay_ph.append(int(ph_c[i]) if ph_c[i] is not None else None)
                    pay_psnr.append(psnr_v); pay_ok.append(ok)
                else:
                    pay_mask.append(True); pay_id.append(None); pay_cap.append(None)
                    pay_fmt.append(None); pay_w.append(None); pay_h.append(None)
                    pay_ph.append(None); pay_psnr.append(None); pay_ok.append(None)

            if blocked_counter is not None and n_blocked:
                blocked_counter.add(n_blocked)

            link_off.append(link_cur)
            hl_off.append(hl_cur)
            hdr_off.append(hdr_cur)
            link_struct = pa.StructArray.from_arrays(
                [
                    link_addr_b.array(pa, t_link.field("Address").type),
                    pa.array(link_anchor, s_t),
                    pa.array(link_href, s_t),
                    pa.array(link_nf, pa.bool_()),
                ],
                fields=list(t_link),
            )
            hl_struct = pa.StructArray.from_arrays(
                [
                    hl_addr_b.array(pa, t_hl.field("Address").type),
                    pa.array(hl_href, s_t),
                    pa.array(hl_lang, s_t),
                ],
                fields=list(t_hl),
            )
            pair_struct = pa.StructArray.from_arrays(
                [pa.array(hdr_k, s_t), pa.array(hdr_v, s_t)], fields=list(t_pair)
            )
            canon_arr = pa.StructArray.from_arrays(
                [canon_b.array(pa, t_canon.field("Address").type), pa.array(canon_href, s_t)],
                fields=list(t_canon),
                mask=pa.array(canon_mask, pa.bool_()),
            )
            payload_arr = pa.StructArray.from_arrays(
                [
                    pa.array(pay_id, s_t), pa.array(pay_cap, s_t), pa.array(pay_fmt, s_t),
                    pa.array(pay_w, i32), pa.array(pay_h, i32), pa.array(pay_ph, i64),
                    pa.array(pay_psnr, pa.float64()), pa.array(pay_ok, pa.bool_()),
                ],
                fields=list(t_payload),
                mask=pa.array(pay_mask, pa.bool_()),
            )
            yield pa.RecordBatch.from_arrays(
                [
                    addr_b.array(pa, t_addr),
                    pa.array(depth_o, i64),
                    pa.array(bodyhash_o, s_t),
                    pa.array(desc_o, s_t),
                    pa.array(title_o, s_t),
                    pa.array(h1_o, s_t),
                    pa.array(robots_o, s_t),
                    canon_arr,
                    pa.ListArray.from_arrays(pa.array(link_off, i32), link_struct),
                    pa.ListArray.from_arrays(pa.array(hl_off, i32), hl_struct),
                    pa.array(status_o, s_t),
                    pa.array(sc_o, i64),
                    pa.array(proto_o, s_t),
                    pa.array(pmaj_o, i64),
                    pa.array(pmin_o, i64),
                    pa.ListArray.from_arrays(pa.array(hdr_off, i32), pair_struct),
                    resolves_b.array(pa, t_addr),
                    pa.array(prio_o, i32),
                    pa.array(key_o, s_t),
                    payload_arr,
                ],
                schema=schema,
            )

    return fn


def _apply_parse_stage(df, check_payload: bool, blocked_counter=None):
    """Apply the fetch+parse stage to a joined frame — the single
    site that binds _parse_map to the execution mode, shared by the
    engine and scripts/parse_stage_bench.py so probe numbers measure
    exactly the production stage. r10: columnar mapInArrow
    (_parse_map_arrow), projected to the columns the parse reads."""
    keep = [c for c in df.columns if c in _PARSE_INPUT_COLS]
    return df.select(*keep).mapInArrow(
        _parse_map_arrow(check_payload, blocked_counter), RESULT_FULL_SCHEMA
    )


class SparkCrawler:
    """Distributed reimplementation of the reference crawler
    (see module docstring). ``pages_df``/``robots_df`` replace the
    network; ``images_df`` is the input_hint image+caption table."""

    def __init__(
        self,
        spark: SparkSession,
        cfg: CrawlConfig,
        pages_df: DataFrame,
        robots_df: DataFrame,
        images_df: DataFrame | None = None,
        workdir: str | None = None,
        check_payload: bool = True,
        warm_store: str | None = None,
    ):
        from .shipping import ensure_shipped

        ensure_shipped(spark)
        self.spark = spark
        self.cfg = cfg.validate()
        check_patterns(cfg.Include)
        check_patterns(cfg.Exclude)
        self.workdir = workdir or scratch.crawl_workdir()
        self.store = SnapshotStore(spark, self.workdir)
        self.check_payload = check_payload
        # enum knobs fail LOUDLY on unknown values (code-review r08):
        # equality-dispatched strings would otherwise make a typo'd
        # seen_layout="Bucketed" silently run the O(seen)-shuffle
        # slices layout at 10^10 — same pattern as seen_filter below
        for knob, allowed in (
            ("seen_join_shape", ("anti", "semi")),
            ("seen_layout", ("slices", "bucketed")),
            ("budget_plan", ("iterative", "rank_once")),
        ):
            v = getattr(cfg, knob)
            if v not in allowed:
                raise ValueError(f"unknown {knob} {v!r} (allowed: {allowed})")
        # pluggable seen-prefilter backend (north_rule "bloom/cuckoo"):
        # same mark/probe/empty_bits_df interface, same snapshot
        # persistence; cuckoo adds delete() for re-crawl expiry.
        if cfg.seen_filter == "cuckoo":
            from . import cuckoofilter

            self.seenfilter = cuckoofilter
            # size for the same per-shard key capacity as the bloom
            # bits at ~10 bits/key: 4-slot buckets, power of two,
            # ROUNDED UP — rounding down (r03) gave up to 2x less key
            # capacity for non-power-of-two bloom_bits_per_shard, so
            # shards overflowed earlier and silently degraded to
            # maybe-seen-for-everything (ADVICE r03)
            want = max(256, cfg.bloom_bits_per_shard // 32)
            buckets = 1 << (want - 1).bit_length()
            self.bloom_cfg = cuckoofilter.CuckooConfig(cfg.bloom_shards, buckets)
        elif cfg.seen_filter == "bloom":
            self.seenfilter = bloomfilter
            self.bloom_cfg = bloomfilter.BloomConfig(
                cfg.bloom_shards, cfg.bloom_bits_per_shard, cfg.bloom_hashes
            )
        else:
            raise ValueError(f"unknown seen_filter {cfg.seen_filter!r}")
        # warm start (re-crawl): seed the seen-set and the seen-filter
        # bits from a prior crawl's store, minus its expired tombstones
        # — a URL expired via expire() is re-fetched when re-linked,
        # every other previously-seen URL is skipped. Requires the
        # same seen_filter/bloom_* config as the prior crawl (the bits
        # layout is config-dependent).
        self._warm_seen: DataFrame | None = None
        self._warm_bits: DataFrame | None = None
        # seen_layout="bucketed": manifest waves synced into the seen
        # catalog table this run (None = table not built yet this run)
        self._seen_tbl_synced: set | None = None
        if warm_store:
            prior = SnapshotStore(spark, warm_store)
            if prior.read("frontier") is not None:
                self._warm_seen = _effective_seen_keys(prior)
                self._warm_bits = _latest_bloom_of(spark, prior)
                if self._warm_bits is not None:
                    self._check_warm_filter_layout(prior)
        # the "web": pages keyed by fragmentless canonical url
        self.pages = pages_df
        if images_df is not None:
            self.pages = pages_df.join(
                images_df.select(
                    F.col("image_id").alias("_img_id"),
                    F.col("bytes").alias("image_bytes"),
                    F.col("w").alias("img_w"),
                    F.col("h").alias("img_h"),
                    "fmt",
                    "caption",
                    "phash",
                ),
                pages_df["image_id"] == F.col("_img_id"),
                "left",
            ).drop("_img_id")
        self.robots = robots_df.select(
            F.col("scheme").alias("r_scheme"),
            F.col("host").alias("r_host"),
            # int cast at construction (ADVICE r05): both gate paths
            # (join UDF and collect-time table) then see the same
            # int-or-null status regardless of the caller's column
            # type — the Matcher cache keys are type-identical by
            # construction, and a NaN status can't crash the bounded
            # collect below
            F.col("status_code").cast("int").alias("robots_status"),
            F.col("body").alias("robots_body"),
        )
        # collected-robots gate (r05): ONE bounded collect decides and
        # supplies the rows (code-review r05: the row-count probe +
        # full collect was two scheduled jobs per construction). The
        # dict values are the SAME (status, body) tuples the join-path
        # UDF keys its Matcher cache on; a missing host behaves like a
        # left-join miss. Guards (code-review r05): total body BYTES
        # bounded too (50k rows of 500KB robots.txt would be a 20GB+
        # driver collect the streaming join handles fine), and
        # duplicate (scheme, host) rows fall back to the join — a dict
        # would silently keep the last row where the join fans frontier
        # rows out per matching rule row, so the two paths would not be
        # output-equal on that (malformed) input.
        self._robots_bc = None
        th = cfg.robots_local_threshold
        if th:
            # the size probe must run BEFORE any row collect (code-
            # review r05 second pass: summing body lengths AFTER
            # collecting them cannot prevent the oversized collect it
            # guards) — one single-row agg over the limited slice,
            # counting BYTES via octet_length (len() counts chars and
            # under-reads multibyte bodies up to 4x), then the
            # known-bounded collect. Two tiny jobs, both bounded.
            probe = (
                self.robots.limit(th + 1)
                .agg(
                    F.count("*").alias("n"),
                    F.sum(F.octet_length("robots_body")).alias("b"),
                )
                .first()
            )
            if probe["n"] <= th and (probe["b"] or 0) <= cfg.robots_local_max_bytes:
                rows = self.robots.collect()
                table = {
                    (r["r_scheme"], r["r_host"]): (
                        int(r["robots_status"]) if r["robots_status"] is not None else None,
                        r["robots_body"] if isinstance(r["robots_body"], str) else None,
                    )
                    for r in rows
                }
                if len(table) == len(rows):  # no dup (scheme, host)
                    self._robots_bc = spark.sparkContext.broadcast(table)

    # ------------------------------------------------------------------

    def _initial_frontier(self) -> DataFrame:
        rows = []
        extended = self.cfg.canon_mode == "extended"
        for i, s in enumerate(self.cfg.From):
            cs = canon.canon_seed(s)
            if cs is None:
                raise ValueError(f"bad seed URL {s!r}")  # parity: Start() error
            key = (canon.extended_canon(cs) or cs) if extended else cs
            rows.append((key, cs, 0, oracle.PRIORITY_SEED, i))
        return self.spark.createDataFrame(rows, FRONTIER_SCHEMA)

    def _apply_budget(
        self, gated: DataFrame, budget: int, subwave: int = 0
    ) -> tuple[DataFrame, DataFrame]:
        """Per-host politeness budget with hot-host salt-split: take
        the first `budget` rows per (host, salt) slice ordered by
        (priority, url_key); the rest defer to a sub-wave. By default
        slices keep aggregate take <= budget per host only
        approximately when salted (ceil(budget/n) per slice can
        over-admit up to n-1 rows) — the budget is a pacing device,
        not a semantic cap (the reference's WaitTime pacing never
        drops URLs either: state.go:29-41), so deferred rows always
        complete eventually.

        ``per_host_budget_exact`` (opt-in, VERDICT r04 #5) distributes
        the remainder instead: slice i gets ``budget//n`` plus one iff
        i falls in a remainder-sized window, so the per-host take is
        <= budget EXACTLY. The window ROTATES by ``rem`` per sub-wave
        (``subwave`` parameterizes it): with a static window a slice
        granted 0 on a base-0 host would never drain — rotation
        guarantees every slice is periodically privileged, so the
        deferred set still drains (property-tested under skew).
        Rotation is a pure function of the sub-wave index, so a
        mid-wave resume recomputes the identical take.

        Skew: the per-host row count comes from a ``groupBy(host)``
        map-side partial aggregate broadcast back onto the frame — NOT
        a ``count over Window.partitionBy(host)``, which would colocate
        every row of a hot host into one task (a 10^6-row single-task
        sort on a 1%-host at a 10^8-row wave) before the salt even
        exists (VERDICT r03 #2). The only per-host-partitioned window
        left is the salted row_number, whose partitions are bounded by
        ``hot_host_salt_threshold``.

        The input is the GATED frame (``_allowed`` still attached):
        robots-blocked rows consume no fetch budget — they all ride
        sub-wave 0 (rank partitions include ``_allowed`` so blocked
        rows never displace allowed ones from a budget slot) and emit
        their blocked Results inline in the single-pass parse. The
        host count deliberately includes blocked rows: filtering on
        ``_allowed`` here would re-evaluate the robots UDF in the
        counts branch (Catalyst doesn't share subtrees across a join),
        and the count only sizes the salt slices — over-slicing a
        host with many blocked rows just defers a little more."""
        ranked, slice_budget = self._salted_rank(gated, budget, subwave)
        ranked = ranked.withColumn(
            "_take", (~F.col("_allowed")) | (F.col("_rk") <= slice_budget)
        )
        take = ranked.filter("_take").drop("_host_n", "_salt", "_rk", "_take")
        defer = ranked.filter("NOT _take").drop("_host_n", "_salt", "_rk", "_take")
        return take, defer

    def _salted_rank(self, gated: DataFrame, budget: int, subwave: int):
        """Shared politeness-ranking core for _apply_budget (iterative)
        and _budget_plan (rank-once): (ranked frame carrying
        _host_n/_salt/_rk, per-row slice-budget column)."""
        threshold = self.cfg.hot_host_salt_threshold
        host_counts = gated.groupBy("host").agg(F.count("*").alias("_host_n"))
        # no forced broadcast hint (code-review r04): a broad-web wave
        # has 10^6-10^7 distinct hosts — an unconditional broadcast of
        # the counts frame would OOM the driver on exactly the
        # production path. AQE broadcasts it when it is actually small
        # and falls back to a shuffle join (with skew-split) otherwise;
        # the join's probe side streams, it never sorts a hot host.
        counted = gated.join(host_counts, "host", "left")
        n_slices = F.greatest(
            F.lit(1),
            F.ceil(F.coalesce(F.col("_host_n"), F.lit(1)) / F.lit(threshold)),
        )
        salted = counted.withColumn(
            "_salt", F.pmod(F.xxhash64("url_key"), n_slices).cast("int")
        )
        if self.cfg.per_host_budget_exact:
            base = F.floor(F.lit(budget) / n_slices)
            rem = F.lit(budget) - base * n_slices
            privileged = F.pmod(F.col("_salt") - F.lit(subwave) * rem, n_slices) < rem
            slice_budget = base + privileged.cast("long")
        else:
            slice_budget = F.greatest(F.lit(1), F.ceil(F.lit(budget) / n_slices))
        ranked = salted.withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("host", "_salt", "_allowed").orderBy(
                    "priority", "url_key"
                )
            ),
        )
        return ranked, slice_budget

    def _budget_plan(self, gated: DataFrame, budget: int) -> DataFrame:
        """Rank-once politeness plan (r8, the budgeted-path Amdahl
        term): assign every gated row its sub-wave index up front
        instead of re-ranking + re-staging the deferred remainder per
        sub-wave. For the DEFAULT (non-exact) budget the slice budget
        is constant across sub-waves, so the iterative take — re-rank
        remaining, keep _rk <= sb — admits exactly the rows with
        original rank in (k*sb, (k+1)*sb] at sub-wave k (row_number
        over (priority, url_key) is deterministic and order-stable
        under removal of a prefix): _subwave = (_rk - 1) div sb is the
        SAME partition the loop would produce when per-host counts are
        wave-constant, and satisfies the identical politeness contract
        (<= slice_budget rows per (host, salt) slice per sub-wave;
        defer never drops) in all cases. Blocked rows ride sub-wave 0
        as before. Measured on the 5-sub-wave 408k drain (BASELINE.md
        r8): NEUTRAL locally (1,742 vs 1,749 URLs/s serial, 5,075 vs
        5,296 on 8 cores — within the noise envelope), because the
        loop's per-sub-wave re-rank shuffles are near-free in memory;
        at cluster scale those shuffles are O(wave × sub-waves)
        exchange bytes while the plan path's extra cost is parallel
        re-scans of one staged frame — hence opt-in
        cfg.budget_plan="rank_once" as the deployment shape, same
        split as seen_layout="bucketed".

        per_host_budget_exact keeps the iterative loop: its rotating
        remainder window makes the per-sub-wave allowance
        sub-wave-dependent, which has no clean closed rank form."""
        ranked, slice_budget = self._salted_rank(gated, budget, 0)
        return ranked.withColumn(
            "_subwave",
            F.when(~F.col("_allowed"), F.lit(0))
            .otherwise(F.floor((F.col("_rk") - F.lit(1)) / slice_budget))
            .cast("int"),
        ).drop("_host_n", "_salt", "_rk")

    def _fetch_join(
        self, gated_allowed: DataFrame, all_allowed: bool = False,
        rows_hint: int | None = None,
    ) -> DataFrame:
        """The fetch interface: frontier rows joined against the pages
        corpus (the sandbox's network). Config ``Header`` — the extra
        request headers the reference sends on every fetch
        (crawler.go:298-310) — rides along as a ``_req_headers``
        passthrough column: the pages-join fetch can't use it, but a
        production HTTP fetcher swapped in at this boundary receives
        the pairs per-row.

        Single-pass (the input carries the robots ``_allowed`` flag —
        every engine path since VERDICT r03 #4): the join goes LEFT so
        blocked rows (and fetch errors) survive to the parse map,
        which emits blocked results inline. ``_allowed`` is part of
        the join condition (a residual on the equi-join) so a blocked
        row NEVER matches a page row: on a pages table with duplicate
        urls it emits exactly one blocked Result, not one per matching
        page row (ADVICE r02). An input WITHOUT ``_allowed`` (a
        pre-gate frontier, e.g. the request-header fetch-boundary
        test) gets a plain inner join.

        ``all_allowed=True`` (politeness sub-waves >= 1, r9): blocked
        rows all ride sub-wave 0, so a deferred slice is 100%
        robots-allowed — and for allowed rows the LEFT join's only
        extra output is page-miss rows the parse map silently drops
        (fetch error). An INNER join is therefore output-identical
        there, and unlike leftOuter it lets Spark build the hash on
        the FRONTIER side: a left-outer join can never broadcast its
        preserved side, so the non-bucketed corpus was shuffled+sorted
        per sub-wave even for a ~200-row hot-host leftover slice
        (measured 3.4 s/sub-wave at local[8], the dominant budgeted
        Amdahl term — VERDICT r08 #2). With the inner join a small
        slice (rows_hint <= fetch_broadcast_rows) is hint-broadcast
        and the corpus is scanned but never exchanged; big slices
        fall back to AQE's choice, and the bucketed corpus remains
        the 10^10 shape either way."""
        cols = ["url_key", "fetch_url", "depth", "priority", "fetch_key", "host"]
        cond = F.col("fetch_key") == self.pages["url"]
        single_pass = "_allowed" in gated_allowed.columns
        if single_pass:
            cols.append("_allowed")
            cond = cond & F.col("_allowed")
        slice_side = gated_allowed.select(*cols)
        if (
            all_allowed
            and rows_hint is not None
            and rows_hint <= self.cfg.fetch_broadcast_rows
        ):
            slice_side = slice_side.hint("BROADCAST")
        joined = slice_side.join(
            self.pages,
            cond,
            "left" if (single_pass and not all_allowed) else "inner",
        )
        if self.cfg.Header:
            joined = joined.withColumn(
                "_req_headers",
                F.array(
                    *[
                        F.struct(F.lit(h["K"]).alias("K"), F.lit(h["V"]).alias("V"))
                        for h in self.cfg.Header
                    ]
                ),
            )
        return joined

    def _fetch_and_parse(
        self,
        gated_allowed: DataFrame,
        rows_hint: int | None = None,
        blocked_counter=None,
        all_allowed: bool = False,
    ) -> DataFrame:
        joined = self._fetch_join(gated_allowed, all_allowed, rows_hint)
        # AQE coalesces the join output by BYTE size (~50 MB of html
        # looks "small" -> 1-2 partitions), which would serialize the
        # CPU-heavy parse UDF onto 1-2 cores. Parse cost scales with
        # ROWS, not bytes — force row-parallelism before the Python
        # stage (cheap shuffle vs single-threaded parse).
        # rows_hint (the frontier row count, free from the manifest)
        # scales the task count: target parse_rows_per_task rows per
        # Arrow task, floored at shuffle_partitions (full core use on
        # mid-size waves), capped at parse_partitions (fine grain for
        # straggler smoothing on big waves), never more tasks than
        # rows. Measured: 96 fixed tasks cost the deep drain ~25% on
        # its sub-15k-row waves, while the 200k-row wide wave needs
        # all 96 (32 tasks = +70% from stragglers).
        cap = self.cfg.parse_partitions or self.cfg.shuffle_partitions
        if rows_hint is not None:
            scaled = max(
                min(self.cfg.shuffle_partitions, rows_hint),
                rows_hint // max(self.cfg.parse_rows_per_task, 1),
            )
            n_parse = max(1, min(cap, scaled))
        else:
            n_parse = cap
        if rows_hint is not None and rows_hint <= self.cfg.parse_rows_per_task:
            # one Arrow batch worth of rows: the exchange stage costs
            # more (~0.25 s scheduling on this VM) than parsing the
            # whole wave in the join's own tasks — skip it (r05, the
            # crawl_deep per-wave floor attack, VERDICT r04 #4)
            pass
        else:
            joined = joined.repartition(n_parse, "url_key")
        if self.cfg.pacing_enabled and self.cfg.wait_seconds > 0:
            wait = self.cfg.wait_seconds
            budget = self.cfg.per_host_budget or self.cfg.Connections

            def pace(key, pdf):
                # token pacing per host group: Connections-wide pipeline,
                # one spawn per wait tick (state.go:29-41 analog)
                time.sleep(wait * max(0, math.ceil(len(pdf) / max(budget, 1)) - 1))
                return pdf

            joined = joined.groupBy("host").applyInPandas(pace, joined.schema)
        return _apply_parse_stage(joined, self.check_payload, blocked_counter)

    def _candidates(self, parsed_results: DataFrame) -> DataFrame:
        r = parsed_results
        redirects = (
            r.filter((F.col("StatusCode") >= 300) & (F.col("StatusCode") < 400))
            .filter(F.col("ResolvesTo").isNotNull() & F.col("ResolvesTo.Full").isNotNull())
            .select(
                F.col("ResolvesTo.Full").alias("fetch_url"),
                F.lit(oracle.PRIORITY_REDIRECT).alias("priority"),
                F.lit(False).alias("nofollow"),
            )
        )
        links = (
            r.select(F.explode("Links").alias("link"))
            .select(
                F.col("link.Address.Full").alias("fetch_url"),
                F.lit(oracle.PRIORITY_LINK).alias("priority"),
                F.coalesce(F.col("link.Nofollow"), F.lit(False)).alias("nofollow"),
            )
            .filter(F.col("fetch_url").isNotNull())
        )
        cand = redirects.unionByName(links)
        # scope is evaluated on the discovered (go-parity) URL, as the
        # reference does (crawler.go:234)
        cand = cand.filter(
            scope_filter_expr(F.col("fetch_url"), self.cfg.Include, self.cfg.Exclude)
        )
        if self.cfg.RespectNofollow:
            cand = cand.filter(~F.col("nofollow"))
        if self.cfg.canon_mode == "extended":
            # north_rule production canonicalization: the dedup/seen key
            # is the RFC-3986 extended normal form (lowercase host,
            # percent-decode unreserved, sorted query) — vectorized
            # pandas UDF; fetch still uses the discovered URL
            @F.pandas_udf(T.StringType())
            def _ext(urls: pd.Series) -> pd.Series:
                return urls.map(lambda u: canon.extended_canon(u) or u)

            cand = cand.withColumn("url_key", _ext(F.col("fetch_url")))
        else:
            cand = cand.withColumn("url_key", F.col("fetch_url"))
        # within-wave first-discovery-wins -> min (priority, fetch_url)
        # per canonical key (deterministic refinement, SURVEY.md §7.6)
        return (
            cand.groupBy("url_key")
            .agg(F.min(F.struct("priority", "fetch_url")).alias("first"))
            .select(
                "url_key",
                F.col("first.priority").alias("priority"),
                F.col("first.fetch_url").alias("fetch_url"),
            )
        )

    def _dedup_against_seen(self, cand: DataFrame, seen: DataFrame | None, bits: DataFrame | None):
        """Exact seen-set dedup (A7, crawler.go:240-247) behind the
        probabilistic prefilter. Three measured verify-join shapes
        (scripts/seen_scan_bench.py, VERDICT r07 #2):

        * "anti" (default) — maybe ⋉̸ seen. Fastest on local/single
          node at every measured seen size (0.89/1.12/2.89 s at
          2M/8M/32M seen keys): in-memory shuffle ≈ memcpy, so the
          sort-merge's seen shuffle costs less than an extra job.
        * "semi" — hits := seen ⋉ maybe_keys (seen is the STREAM
          side), then probed ⋉̸ hits. Both joins build their hash on
          the wave-bounded side, so the seen history is scanned (one
          pruned column) but never shuffled or sorted — the shape for
          network-shuffle-bound clusters without a bucketed seen
          store; ~20% slower than anti locally (1.02/1.45/3.50 s). A
          fresh row (bloom says definitely-unseen) can't be in seen,
          hence never in hits, so one anti-join over all probed rows
          replaces the fresh/maybe union split.
        * seen_layout="bucketed" (overrides the shape) — the semi
          shape with a SHUFFLE_HASH hint on the wave-bounded side
          against the bucketed seen table (_bucketed_seen): the scan
          satisfies the join's distribution requirement with no
          exchange AND no sort, measured FLAT in seen size
          (1.04 s at 8M -> 1.09 s at 32M). The 10^10 layout.

        Output identical across all shapes (pinned by
        test_seen_join_shape_equality / test_seen_layout_bucketed_*)."""
        if seen is None:
            return cand
        bucketed = self.cfg.seen_layout == "bucketed"
        if self.cfg.bloom_prefilter and bits is not None:
            probed = self.seenfilter.probe(cand, bits, "url_key", self.bloom_cfg)
            if bucketed or self.cfg.seen_join_shape == "semi":
                maybe_keys = probed.filter(F.col("_maybe_seen")).select("url_key")
                if bucketed:
                    # force the shuffled-hash build onto the hinted
                    # wave-bounded side: the bucketed seen scan then
                    # satisfies the join's distribution requirement
                    # with NO exchange and no sort at any seen size
                    # (seen_scan_bench part A, `semi_bucketed` column)
                    maybe_keys = maybe_keys.hint("SHUFFLE_HASH")
                hits = seen.select("url_key").join(maybe_keys, "url_key", "left_semi")
                return probed.drop("_maybe_seen", "_h64", "_shard").join(
                    hits, "url_key", "left_anti"
                )
            fresh = probed.filter(~F.col("_maybe_seen")).drop("_maybe_seen", "_h64", "_shard")
            maybe = probed.filter(F.col("_maybe_seen")).drop("_maybe_seen", "_h64", "_shard")
            verified = maybe.join(seen.select("url_key"), "url_key", "left_anti")
            return fresh.unionByName(verified)
        if bucketed:
            keys = cand.select("url_key").hint("SHUFFLE_HASH")
            hits = seen.select("url_key").join(keys, "url_key", "left_semi")
            return cand.join(hits, "url_key", "left_anti")
        return cand.join(seen.select("url_key"), "url_key", "left_anti")

    def _seen_table_name(self) -> str:
        import hashlib

        return "seen_keys_" + hashlib.md5(
            self.store.root.encode("utf-8")
        ).hexdigest()[:12]

    def _bucketed_seen(self, d: int) -> DataFrame | None:
        """Seen history as a catalog table bucketed on url_key
        (cfg.seen_layout="bucketed", VERDICT r07 #2 layout change).

        The slice layout re-reads and (past the broadcast threshold)
        re-shuffles the whole seen history every wave; the bucketed
        layout pays one wave-bounded append per wave instead, and the
        verify join reads a scan that already satisfies the join's
        hash distribution — no exchange, no sort, measured FLAT in
        seen size (scripts/seen_scan_bench.py part A).

        The table is a pure cache of the committed frontier/warm_seen
        slices' url_keys: rebuilt from committed manifests on first
        use in a run (so crashes, truncate_after resumes, and expire()
        rewrites can never leak stale keys in), appended per committed
        manifest wave after that, and every read filters `m <= d-1`
        (exactly store.read("frontier", up_to=d-1)'s visibility rule),
        so an append racing a crash is invisible until its manifest
        commits. At 10^10 keys the per-wave append is bounded by the
        wave; periodic compaction of the per-append bucket files is an
        operational task, not a correctness one."""
        spark = self.spark
        tbl = self._seen_table_name()
        if self._seen_tbl_synced is None:
            drop_catalog_table(spark, tbl)
            self._seen_tbl_synced = set()
        # sync key is (manifest wave, table): a mid-wave PARTIAL
        # manifest for wave d carries no frontier slice yet — keying
        # on the wave alone would mark it synced and skip the full
        # commit's slice. All missing slices union into ONE append
        # job (code-review r08: a resume at wave N was paying N+1
        # sequential write jobs on first use) — steady state appends
        # exactly the one new slice per wave either way.
        have = self._seen_tbl_synced
        missing = []
        fresh: list[tuple] = []
        for m in self.store._manifests():
            for t in ("frontier", "warm_seen"):
                info = m["tables"].get(t)
                if not info or (m["wave"], t) in have:
                    continue
                missing.append(
                    spark.read.parquet(*info["files"])
                    .select("url_key")
                    .withColumn("m", F.lit(m["wave"]))
                )
                fresh.append((m["wave"], t))
        if missing:
            from functools import reduce

            (
                reduce(lambda a, b: a.unionByName(b), missing)
                .write.bucketBy(self.cfg.seen_buckets, "url_key")
                .mode("append")
                .saveAsTable(tbl)
            )
            have.update(fresh)
        if not have:
            return None
        return spark.table(tbl).filter(F.col("m") <= F.lit(d - 1)).select("url_key")

    # ------------------------------------------------------------------

    def _manifest_info(self, table: str, manifest_wave: int) -> dict | None:
        for m in self.store._manifests():
            if m["wave"] == manifest_wave and table in m["tables"]:
                return m["tables"][table]
        return None

    def _manifest_table(self, table: str, manifest_wave: int) -> DataFrame | None:
        info = self._manifest_info(table, manifest_wave)
        return self.spark.read.parquet(*info["files"]) if info else None

    def run(self, resume: bool = False) -> SnapshotStore:
        cfg = self.cfg
        store = self.store
        resume_parts = None
        if resume:
            last = store.last_complete_wave()
            if last is None:
                return self.run(resume=False)
            store.truncate_after(last)
            d = last + 1
            resume_parts = store.parts(d) or None
        else:
            frontier = self._initial_frontier()
            info = store.stage("frontier", frontier, 0, manifest_wave=-1)
            # NOTE: there is no separate `seen` table — the frontier
            # slices ARE the seen-set (every URL enqueued at any depth
            # was marked seen at enqueue time, crawler.go:143-145 +
            # 240-247), so seen(d) = url_keys of frontier waves 0..d.
            if self._warm_seen is not None:
                # persist the warm seen-set into THIS store so a
                # mid-crawl resume (which only sees the store) and any
                # further warm chaining keep the full seen history
                self._warm_seen = self.spark.read.parquet(
                    *store.stage("warm_seen", self._warm_seen, 0, manifest_wave=-1)[
                        "files"
                    ]
                ).select("url_key")
            if cfg.bloom_prefilter and self._warm_bits is not None:
                # warm re-crawl: prior bits already cover the warm
                # seen-set (post-expiry rebuild) — fold the seeds in
                # and the filter is active from wave 0
                bits = self.seenfilter.mark(
                    frontier.select("url_key"), self._warm_bits,
                    "url_key", self.bloom_cfg,
                )
                store.stage("bloom", bits, 0, manifest_wave=-1)
            elif cfg.bloom_prefilter and info["rows"] >= cfg.bloom_min_seen:
                # seed-time activation: the bits must cover the WHOLE
                # effective seen-set — on a warm re-crawl whose prior
                # store had no bits (_warm_bits None), that includes
                # the warm seen history; seeding only the seed list
                # would make warm-seen URLs probe definitely-new and
                # re-fetch them (exactness break — code-review r04)
                seed_keys = frontier.select("url_key")
                if self._warm_seen is not None:
                    seed_keys = seed_keys.unionByName(self._warm_seen)
                bits = self.seenfilter.mark(
                    seed_keys,
                    self.seenfilter.empty_bits_df(self.spark, self.bloom_cfg),
                    "url_key", self.bloom_cfg,
                )
                store.stage("bloom", bits, 0, manifest_wave=-1)
            store.commit_wave(
                -1, {"phase": "seeded", "filter_cfg": self._filter_cfg_sig()}
            )
            d = 0

        while True:
            # frontier for depth d is committed by manifest d-1; its
            # row count is already in the manifest — no isEmpty() job
            info = self._manifest_info("frontier", d - 1)
            if info is None or info["rows"] == 0:
                break
            frontier = self.spark.read.parquet(*info["files"])
            t0 = time.time()
            metrics = self._run_wave(frontier, d, info["rows"], resume_parts=resume_parts)
            resume_parts = None
            metrics["seconds"] = round(time.time() - t0, 3)
            store.commit_wave(d, metrics)
            d += 1
        return store

    def _gate(self, frontier: DataFrame, robots_side: DataFrame | None = None) -> DataFrame:
        """Robots gate: frontier ⋈ robots (broadcast) + the `_allowed`
        pandas-UDF column. Factored out of _run_wave so tests can
        assert on the composed wave PLAN (exactly one robots-UDF
        evaluation, bucketed fetch join) without running a crawl.

        Collected-robots fast path (r05): when the robots table fit
        under ``robots_local_threshold`` at construction, the rules
        ride a SparkContext broadcast into the gate UDF and the join
        (and its per-wave JVM broadcast build, ~0.2-0.3 s of fixed
        cost on small-wave crawls) disappears; the join remains the
        10^7-host scale path. Both paths evaluate the same Matcher on
        fetch_url and are pinned equal by
        test_robots_local_gate_equals_join_gate."""
        cfg = self.cfg
        parts = _with_url_parts(frontier)
        # robots.Locate parse failure (no host/scheme, e.g. mailto:)
        # -> URL skipped silently, no result row (state.go:57-61 FIXME path)
        parts = parts.filter((F.col("host") != "") & (F.col("scheme") != ""))
        # an EXPLICIT robots_side wins over the collected-rules fast
        # path (ADVICE r05): a caller pinning the join path (tests,
        # the scale microbench) gets the join it asked for
        if robots_side is None:
            if self._robots_bc is not None:
                return parts.withColumn(
                    "_allowed",
                    _robots_allowed_local_udf(cfg.RobotsUserAgent, self._robots_bc)(
                        F.col("fetch_url"), F.col("scheme"), F.col("host")
                    ),
                )
            robots_side = F.broadcast(self.robots) if cfg.robots_broadcast else self.robots
        return parts.join(
            robots_side,
            (parts["scheme"] == F.col("r_scheme")) & (parts["host"] == F.col("r_host")),
            "left",
        ).withColumn(
            "_allowed",
            # gate on fetch_url, NOT url_key: the oracle (oracle.py:181)
            # and reference (state.go:56) test the fetch/queue URL; in
            # extended canon_mode url_key has sorted query params /
            # normalized escapes, which query-sensitive robots rules
            # would match differently (ADVICE r01, medium)
            _robots_allowed_udf(cfg.RobotsUserAgent)(
                F.col("fetch_url"), F.col("robots_status"), F.col("robots_body")
            ),
        )

    def _run_wave(
        self,
        frontier: DataFrame,
        d: int,
        frontier_rows: int | None = None,
        resume_parts: list | None = None,
    ) -> dict:
        cfg, store, spark = self.cfg, self.store, self.spark
        # regate() still needs a join side when no collected-rules
        # broadcast is active; _gate picks its own path (collected
        # rules when available, else this same join side)
        robots_side = F.broadcast(self.robots) if cfg.robots_broadcast else self.robots
        gated = self._gate(frontier)

        blocked_acc = spark.sparkContext.accumulator(0)
        budget = cfg.per_host_budget
        # single-pass everywhere (VERDICT r03 #4): gate+fetch+parse+
        # blocked run as ONE job over the gated frame (pages
        # LEFT-joined under the `_allowed` residual, parse map emits
        # blocked rows inline). The budgeted (production) path used to
        # fork the gated frame into blocked/allowed filter branches,
        # re-evaluating the gate join + robots UDF once per branch and
        # doubling the stage's tasks on EVERY budgeted wave; now
        # _apply_budget ranks allowed rows only and rides blocked rows
        # in sub-wave 0, so each RESULTS job evaluates the robots UDF
        # exactly once (plan-asserted in tests/test_engine.py).
        # Precisely (ADVICE r04): unbudgeted waves and budgeted
        # sub-waves >0 (which regate a STAGED pending slice) run one
        # gate evaluation per wave; a budgeted wave's sub-wave 0 runs
        # two jobs over the same lazy gated frame — stage results
        # (take) and stage pending_sub0 (defer) — so the gate join +
        # UDF evaluate once more there. The UDF is deterministic, so
        # output is unaffected; staging the ranked frame first would
        # avoid the re-eval but writes robots_body per frontier row
        # (a much larger write than the ~0.7 s gate recompute).
        parsed_slices = []
        remaining = gated
        subwave = 0
        t_phase = time.time()
        phase_t: dict[str, float] = {}

        def lap(name):
            nonlocal t_phase
            phase_t[name] = round(time.time() - t_phase, 2)
            t_phase = time.time()

        def regate(pending_df: DataFrame) -> DataFrame:
            """Rebuild the gated-frame shape for a deferred/staged
            pending slice (deterministic: every deferred row was
            robots-allowed when deferred, so _allowed is a literal —
            and on the collected-robots path no join is needed at
            all)."""
            pparts = _with_url_parts(pending_df).filter(
                (F.col("host") != "") & (F.col("scheme") != "")
            )
            if self._robots_bc is not None:
                return pparts.withColumn("_allowed", F.lit(True))
            return pparts.join(
                robots_side,
                (pparts["scheme"] == F.col("r_scheme"))
                & (pparts["host"] == F.col("r_host")),
                "left",
            ).withColumn("_allowed", F.lit(True))

        blocked_offset = 0
        plan_info = None
        # per-sub-wave wall clocks (and, on the iterative loop, the
        # results-job vs pending-stage split) — landed in the wave
        # metrics so the scaling analysis reads the sub-wave
        # serialization term from the store instead of guessing
        sub_t: list = []
        sub_t_parts: list = []
        if resume_parts:
            # mid-wave resume: adopt the completed politeness subwaves
            # and continue from the checkpointed plan (or, for a store
            # interrupted under the pre-r8 loop, the pending frontier)
            last_part = resume_parts[-1]
            # blocked rows were all staged in subwave 0 (pre-interrupt);
            # the accumulator won't re-fire for them — take the count
            # from the checkpoint metrics
            blocked_offset = last_part["metrics"].get("blocked_so_far", 0)
            store.restore_pending(d, last_part["tables"])
            for k in range(len(resume_parts)):
                key = "results" if k == 0 else f"results_sub{k}"
                parsed_slices.append(last_part["tables"][key])
            subwave = len(resume_parts)
            if "budget_plan" in last_part["tables"]:
                plan_info = last_part["tables"]["budget_plan"]
            else:
                pending = spark.read.parquet(
                    *last_part["tables"][f"pending_sub{subwave - 1}"]["files"]
                )
                remaining = regate(pending)

        frontier_cols = ["url_key", "fetch_url", "depth", "priority", "seed_order"]
        # rank-once plan path (r8, opt-in cfg.budget_plan="rank_once"):
        # the non-exact budget's sub-wave partition is a pure function
        # of the one salted rank, so the whole politeness plan stages
        # ONCE (with _allowed — the robots UDF runs once per WAVE) and
        # each sub-wave is a filtered read + the single-pass results
        # job + checkpoint. Locally this measured NEUTRAL vs the loop
        # (BASELINE.md r8 — in-memory shuffle is cheap), so the loop
        # stays default; at 10^10 the loop's per-sub-wave re-rank
        # shuffle + gate join over the remaining frame is O(wave ×
        # sub-waves) exchange bytes, which the plan path replaces with
        # parallel scans — the scale shape. A resume honors whichever
        # format the store was checkpointed under (plan_info wins).
        use_plan = plan_info is not None or (
            bool(budget)
            and not cfg.per_host_budget_exact
            and cfg.budget_plan == "rank_once"
            and not resume_parts
        )
        if use_plan:
            if plan_info is None:
                plan_cols = frontier_cols + ["fetch_key", "host", "_allowed", "_subwave"]
                t_plan = time.time()
                plan_info = store.stage(
                    "budget_plan",
                    self._budget_plan(remaining, budget).select(*plan_cols),
                    d,
                    partition_by="_subwave",
                )
                sub_t.append(round(time.time() - t_plan, 2))  # [0] = plan stage
            by = plan_info.get("by")
            if by is not None:
                # hive-partitioned plan (r9): each sub-wave reads ONLY
                # its partition's files and the per-sub-wave counts
                # came free from the stage-time parquet footers — no
                # counts job and no per-sub-wave full-plan scan (the
                # two core-count-invariant terms VERDICT r08 #2 charged
                # to this path). _subwave is dir-encoded, so the slice
                # comes back without it.
                subs = {int(k): v for k, v in by.items()}
                n_sub = (max(subs) + 1) if subs else 1

                def _plan_slice(k: int):
                    ent = subs.get(k)
                    if ent is None:  # a fully-filtered gated frame
                        return remaining.limit(0), 0
                    return spark.read.parquet(*ent["files"]), ent["rows"]

            else:
                # legacy checkpoint (a store written before the
                # partitioned plan format): _subwave lives in the files
                plan_df = spark.read.parquet(*plan_info["files"])
                counts = {
                    int(r["_subwave"]): int(r["n"])
                    for r in plan_df.groupBy("_subwave")
                    .agg(F.count("*").alias("n"))
                    .collect()
                }
                n_sub = (max(counts) + 1) if counts else 1

                def _plan_slice(k: int):
                    return (
                        plan_df.filter(F.col("_subwave") == k).drop("_subwave"),
                        counts.get(k, 0),
                    )

            for subwave in range(subwave, n_sub):
                t_sub = time.time()
                sl, sl_rows = _plan_slice(subwave)
                parsed = self._fetch_and_parse(
                    sl, rows_hint=sl_rows, blocked_counter=blocked_acc,
                    all_allowed=subwave > 0,
                )
                info = store.stage(
                    f"results_sub{subwave}" if subwave else "results", parsed, d
                )
                parsed_slices.append(info)
                sub_t.append(round(time.time() - t_sub, 2))
                if subwave < n_sub - 1:
                    # mid-wave checkpoint: completed slices + the plan
                    # survive an interruption (north_star clause)
                    store.commit_wave(
                        d,
                        {"phase": "partial", "subwave": subwave,
                         "blocked_so_far": blocked_offset + blocked_acc.value},
                        part=subwave,
                    )
            subwave = n_sub
        else:
            from concurrent.futures import ThreadPoolExecutor

            # per-sub-wave parse-task sizing: sub-wave 0 only knows the
            # whole-wave count; later sub-waves know the deferred row
            # count exactly (their take is a subset of it) — the old
            # whole-wave hint over-provisioned parse tasks on every
            # shrinking sub-wave (scheduling C-term, VERDICT r08 #2)
            rows_hint = frontier_rows
            if resume_parts and not use_plan and subwave > 0:
                pi = resume_parts[-1]["tables"].get(f"pending_sub{subwave - 1}")
                if pi:
                    rows_hint = pi["rows"]
            pool = ThreadPoolExecutor(max_workers=2) if budget else None
            try:
                while True:
                    if budget:
                        take, remaining = self._apply_budget(remaining, budget, subwave)
                    else:
                        take, remaining = remaining, None

                    def _stage_results(take=take, sw=subwave, hint=rows_hint):
                        parsed = self._fetch_and_parse(
                            take, rows_hint=hint, blocked_counter=blocked_acc,
                            all_allowed=sw > 0,
                        )
                        return store.stage(
                            f"results_sub{sw}" if sw else "results", parsed, d
                        )

                    t_sub = time.time()
                    if remaining is None:
                        parsed_slices.append(_stage_results())
                        sub_t.append(round(time.time() - t_sub, 2))
                        subwave += 1
                        break
                    # OVERLAP (VERDICT r08 #2, the budgeted Amdahl term):
                    # the deferred-slice write and the fetch+parse job are
                    # independent actions over the same ranked lineage —
                    # run them from two driver threads so the pending
                    # stage's whole serial cost (Catalyst planning + job
                    # scheduling + rank shuffle + write commit) rides
                    # inside the results job's wall time instead of after
                    # it. Politeness is untouched: sub-wave k+1's fetches
                    # still start only after BOTH futures complete. The
                    # pending stage still gates the loop by manifest row
                    # count (VERDICT r02 #6, no isEmpty job).
                    f_res = pool.submit(_stage_results)
                    f_pend = pool.submit(
                        store.stage,
                        f"pending_sub{subwave}",
                        remaining.select(*frontier_cols),
                        d,
                    )
                    pend_err = None
                    try:
                        pending_info = f_pend.result()
                    except BaseException as e:  # noqa: BLE001 — must still await f_res
                        pend_err, pending_info = e, None
                    t_pend = time.time() - t_sub
                    info = f_res.result()  # raises first: the fetch job is primary
                    if pend_err is not None:
                        raise pend_err
                    parsed_slices.append(info)
                    sub_t.append(round(time.time() - t_sub, 2))
                    sub_t_parts.append(round(t_pend, 2))
                    if pending_info["rows"] == 0:
                        subwave += 1
                        break
                    # mid-wave checkpoint: completed slices + the deferred
                    # frontier survive an interruption (north_star clause)
                    store.commit_wave(
                        d,
                        {"phase": "partial", "subwave": subwave,
                         "blocked_so_far": blocked_offset + blocked_acc.value},
                        part=subwave,
                    )
                    # continue from the STAGED slice: breaks the per-subwave
                    # lineage chain (the lazy frame would re-run every prior
                    # budget window + the gate join on each new subwave)
                    remaining = regate(spark.read.parquet(*pending_info["files"]))
                    rows_hint = pending_info["rows"]
                    subwave += 1
            finally:
                if pool is not None:
                    pool.shutdown(wait=True)
        lap("t_fetch_parse")

        # re-read staged results (cheap, avoids recompute) for candidates
        result_files = [f for s in parsed_slices for f in s["files"]]
        wave_results = spark.read.parquet(*result_files)
        staged_rows = sum(s["rows"] for s in parsed_slices)
        # blocked count came from the accumulator inside the staging
        # job — no extra job, no driver-side parquet scan
        blocked_n = blocked_offset + blocked_acc.value

        metrics = {
            "frontier": frontier_rows if frontier_rows is not None else frontier.count(),
            "fetched": staged_rows - blocked_n,
            "blocked": blocked_n,
            "subwaves": subwave,
            "candidates": 0,
            "enqueued": 0,
        }
        if len(sub_t) > 1:
            metrics["subwave_t"] = sub_t
        if sub_t_parts:
            metrics["subwave_t_pend"] = sub_t_parts
        if d < cfg.MaxDepth:
            cand = self._candidates(wave_results)
            if cfg.detailed_metrics:
                cand = cand.persist()
                metrics["candidates"] = cand.count()
            # seen = frontier slices committed so far (manifests -1..d-1
            # cover frontier depths 0..d) — no separate seen table —
            # plus, on a warm re-crawl, the prior crawl's seen-set
            # minus its expired tombstones
            if cfg.seen_layout == "bucketed":
                # catalog-table layout: warm_seen rides the same table
                # (appended from its manifest slice, m=-1)
                seen = self._bucketed_seen(d)
            else:
                seen = store.read("frontier", up_to=d - 1)
                warm = store.read("warm_seen")  # committed at seed time,
                # so a resumed run recovers it without warm_store
                if warm is not None:
                    warm = warm.select("url_key")
                    seen = (
                        warm
                        if seen is None
                        else seen.select("url_key").unionByName(warm)
                    )
            # probe the bloom only once it's been activated (bits then
            # cover the whole seen-set); before activation the plain
            # anti-join wins — the prefilter's probe/mark jobs only pay
            # for themselves at large seen sizes (cfg.bloom_min_seen)
            bits = (
                self._latest_bloom()
                if cfg.bloom_prefilter and self._bloom_active()
                else None
            )
            new = self._dedup_against_seen(cand, seen, bits)
            nxt = new.select(
                "url_key",
                "fetch_url",
                F.lit(d + 1).alias("depth"),
                "priority",
                F.lit(None).cast("int").alias("seed_order"),
            )
            # no explicit repartition before the write (r05): parquet
            # carries no partitioning metadata, so hash-distributing
            # here bought nothing for any later read — the candidate
            # dedup's groupBy("url_key") shuffle already spread the
            # rows, AQE coalesces its small post-shuffle partitions
            # (few files on tiny waves), and dropping the exchange
            # saves a full next-frontier shuffle per wave at EVERY
            # scale (10^8-row frontiers included)
            info = store.stage("frontier", nxt, d + 1, manifest_wave=d)
            if cfg.detailed_metrics:
                cand.unpersist()
            lap("t_frontier")
            if cfg.bloom_prefilter:
                if bits is not None:
                    # active: fold only the delta into the bits
                    new_urls = spark.read.parquet(*info["files"]).select("url_key")
                    bits2 = self.seenfilter.mark(
                        new_urls, self._latest_bloom(), "url_key", self.bloom_cfg
                    )
                    metrics["filter_overflow_shards"] = self._stage_bits(bits2, d)
                    lap("t_bloom")
                elif self._frontier_rows_committed() + info["rows"] >= cfg.bloom_min_seen:
                    # activation: one-time backfill of the ENTIRE
                    # seen-set into fresh bits (seen slices + the wave
                    # just staged), so every later probe is sound
                    new_urls = spark.read.parquet(*info["files"]).select("url_key")
                    all_urls = (
                        new_urls
                        if seen is None
                        else seen.select("url_key").unionByName(new_urls)
                    )
                    bits2 = self.seenfilter.mark(
                        all_urls,
                        self.seenfilter.empty_bits_df(spark, self.bloom_cfg),
                        "url_key",
                        self.bloom_cfg,
                    )
                    metrics["filter_overflow_shards"] = self._stage_bits(bits2, d)
                    lap("t_bloom")
            metrics["enqueued"] = info["rows"]
        metrics.update(phase_t)
        return metrics

    def _stage_bits(self, bits2: DataFrame, d: int) -> int:
        """Stage the updated seen-filter bits; for backends that can
        overflow (cuckoo), count degraded shards from the STAGED
        parquet (one tiny job over `bloom_shards` rows) so the
        maybe-seen-for-everything degradation is observable instead of
        silent (ADVICE r03). Returns the overflowed-shard count."""
        info = self.store.stage("bloom", bits2, d + 1, manifest_wave=d)
        counter = getattr(self.seenfilter, "overflowed_shards", None)
        if counter is None:
            return 0
        n = counter(self.spark.read.parquet(*info["files"]))
        if n:
            import sys

            print(
                f"crawlspark: {n}/{self.bloom_cfg.n_shards} cuckoo shard(s) "
                "overflowed — prefilter degraded to maybe-seen for those "
                "shards (output unchanged; anti-join still exact)",
                file=sys.stderr,
            )
        return n

    def _bloom_active(self) -> bool:
        """True once a bloom slice has been committed — i.e. the bits
        cover the full seen-set and probing is sound."""
        return any("bloom" in m["tables"] for m in self.store._manifests())

    def _frontier_rows_committed(self) -> int:
        """Total seen-set size, free from manifest metadata."""
        return sum(
            m["tables"]["frontier"]["rows"]
            for m in self.store._manifests()
            if "frontier" in m["tables"]
        )

    def _latest_bloom(self) -> DataFrame:
        # bloom bits are full-state per wave: read only the newest slice
        bits = _latest_bloom_of(self.spark, self.store)
        if bits is not None:
            return bits
        return self.seenfilter.empty_bits_df(self.spark, self.bloom_cfg)

    def _filter_cfg_sig(self) -> dict:
        """The seen-filter layout signature recorded in the seed (and
        expiry) manifests: bits are only probe-compatible between runs
        whose signatures are EQUAL — shard count, size and hash count
        all change the key->bit mapping even at identical blob sizes
        (code-review r04)."""
        cfg = self.cfg
        return {
            "backend": cfg.seen_filter,
            "shards": cfg.bloom_shards,
            "bits_per_shard": cfg.bloom_bits_per_shard,
            "hashes": cfg.bloom_hashes,
        }

    @staticmethod
    def _recorded_filter_sig(store: SnapshotStore) -> dict | None:
        """The newest filter-layout signature a store has committed
        (seed, wave or expiry manifest), or None for stores written
        before signatures were recorded."""
        for m in reversed(store._manifests()):
            s = m.get("metrics", {}).get("filter_cfg")
            if s:
                return s
        return None

    def _check_warm_filter_layout(self, prior: SnapshotStore) -> None:
        """Fail LOUDLY on a warm start whose filter config mismatches
        the prior store's: probing prior bits under a different layout
        silently answers definitely-new for seen URLs (double fetches
        — an exactness break, not a perf bug). Prefers the recorded
        config signature; falls back to a blob-length probe for stores
        written before signatures were recorded."""
        prior_sig = self._recorded_filter_sig(prior)
        if prior_sig is not None:
            if prior_sig != self._filter_cfg_sig():
                raise ValueError(
                    "warm_store seen-filter layout mismatch: prior crawl "
                    f"used {prior_sig}, this config is {self._filter_cfg_sig()} "
                    "— use the same seen_filter/bloom_* settings as the "
                    "original crawl"
                )
            return
        want = (
            self.bloom_cfg.state_bytes
            if hasattr(self.bloom_cfg, "state_bytes")
            else self.bloom_cfg.bits_per_shard // 8
        )
        probe_row = self._warm_bits.limit(1).collect()
        if probe_row and len(probe_row[0]["bits"]) != want:
            raise ValueError(
                "warm_store seen-filter layout mismatch: prior shard blob "
                f"is {len(probe_row[0]['bits'])} bytes, this config expects "
                f"{want} — use the same seen_filter/bloom_* settings as the "
                "original crawl"
            )

    # ------------------------------------------------------------------

    def results(self, ordered: bool = True) -> DataFrame:
        dfs = []
        for m in self.store._manifests():
            for t, info in m["tables"].items():
                if t == "results" or t.startswith("results_sub"):
                    dfs.append(self.spark.read.parquet(*info["files"]))
        if not dfs:
            raise RuntimeError("no results staged — run() first")
        out = dfs[0]
        for df in dfs[1:]:
            out = out.unionByName(df)
        # the store's lineage columns (_wave, _part) are an
        # implementation detail — public output is the Result schema
        out = out.select(*[f.name for f in RESULT_FULL_SCHEMA.fields])
        if ordered:
            # determinism contract (SURVEY.md §7.6): refinement of the
            # reference's depth-ascending guarantee (crawler.go:197-199)
            out = out.orderBy("Depth", "Priority", "UrlKey")
        return out

    def seen(self) -> DataFrame:
        """Effective seen-set: every URL this store enqueued, plus the
        warm-started seen history, minus expired tombstones."""
        return _effective_seen_keys(self.store)

    def expire(self, url_keys) -> dict:
        """Re-crawl expiry: remove `url_keys` from this store's
        effective seen-set, so a future crawl warm-started from this
        workdir (``warm_store=...``) re-fetches them when re-linked.
        The tombstone slice and the updated seen-filter bits land in
        ONE manifest commit — the filter's no-false-negative contract
        and the exact seen-set shrink together (ADVICE r03).

        The bits update is a per-affected-shard REBUILD from the
        surviving keys, NOT cuckoofilter.delete(): partial-key
        deletion can evict the fingerprint of a DIFFERENT surviving
        URL that collides on (shard, bucket, fp), turning a seen URL
        into definitely-new and double-fetching it — which would break
        the exact-output law. Rebuilding touches only the shards an
        expired key hashes to (bounded work, all vectorized mark()),
        works identically for bloom and cuckoo backends, and clears a
        shard's overflow flag when the survivors fit again. delete()
        remains the cheap primitive for callers whose keys are
        guaranteed collision-free (see cuckoofilter.py contract).

        Inputs are matched against the effective seen-set over their
        CANONICAL candidate forms (raw, canon_seed, and the extended
        key when canon_mode='extended') — an operator pasting a fetch
        URL with unsorted query params must not get a silent no-op
        tombstone (code-review r04). Only MATCHED keys are staged; the
        metrics count DISTINCT inputs and matches PER INPUT (any form
        matched) — form-level counting let one input matching two seen
        forms mask another input's silent no-op, and duplicate inputs
        fired a spurious warning (ADVICE r04). ``tombstone_rows``
        carries the staged form count separately.

        Two entry guards protect exactness (ADVICE r04):

        * the store's RECORDED filter layout must equal this config's
          — expire() rebuilds affected shards under self.cfg and then
          records self.cfg's signature in the newest manifest (the one
          a later warm start consults), so running it with different
          bloom_*/seen_filter settings would union wrong-layout bits
          with old-layout blobs AND overwrite the evidence;
        * the store must be a COMPLETED crawl — on an interrupted
          store the expiry manifest would supersede the interrupted
          wave's checkpoints as last_complete_wave, so a later
          run(resume=True) finds no frontier and silently ends the
          crawl incomplete. Resume (or discard) the crawl first."""
        from .bloomfilter import with_shard_cols

        spark, store = self.spark, self.store
        # the bucketed seen cache (if any) is stale once tombstones
        # land: force a rebuild-from-manifests on its next use
        self._seen_tbl_synced = None
        last = store.last_complete_wave()
        if last is None:
            raise RuntimeError(
                f"expire: {self.workdir} has no committed crawl — nothing to expire"
            )
        prior_sig = self._recorded_filter_sig(store)
        if prior_sig is not None and prior_sig != self._filter_cfg_sig():
            raise ValueError(
                "expire: seen-filter layout mismatch — the store was written "
                f"with {prior_sig}, this config is {self._filter_cfg_sig()}. "
                "Rebuilding shards under a different layout would corrupt the "
                "filter and overwrite the recorded signature; rerun expire "
                "with the original seen_filter/bloom_* settings"
            )
        e = last + 1
        nxt_frontier = store._manifests()[-1]["tables"].get("frontier")
        if store.parts(e) or (nxt_frontier and nxt_frontier.get("rows", 0) > 0):
            raise RuntimeError(
                f"expire: {self.workdir} holds an interrupted crawl (pending "
                f"frontier or mid-wave checkpoints for wave {e}) — an expiry "
                "manifest would supersede them and break run(resume=True). "
                "Finish the crawl with run(resume=True) first, or discard "
                "the workdir"
            )
        if isinstance(url_keys, DataFrame):
            pairs = url_keys.select(
                F.col("url_key").alias("_input"), F.col("url_key")
            ).distinct()
            requested = pairs.select("_input").distinct().count()
        else:
            extended = self.cfg.canon_mode == "extended"
            rows = []
            inputs = list(dict.fromkeys(url_keys))  # distinct, order-stable
            for raw in inputs:
                forms = {raw}
                cs = canon.canon_seed(raw)
                if cs is not None:
                    forms.add(cs)
                    if extended:
                        forms.add(canon.extended_canon(cs) or cs)
                rows.extend((raw, f) for f in sorted(forms))
            requested = len(inputs)
            pairs = spark.createDataFrame(rows, "_input: string, url_key: string")
        seen_now = _effective_seen_keys(store)
        matched = pairs
        if seen_now is not None:
            matched = pairs.join(seen_now, "url_key", "left_semi")
        matched = matched.persist()
        expired_inputs = matched.select("_input").distinct().count()
        keys = matched.select("url_key").distinct()
        info = store.stage("expired", keys, e, manifest_wave=e)
        matched.unpersist()
        metrics = {
            "phase": "expired",
            "requested": requested,
            "expired": expired_inputs,
            "tombstone_rows": info["rows"],
        }
        if expired_inputs < requested:
            import sys

            print(
                f"crawlspark: expire matched {expired_inputs} of {requested} "
                "distinct input URLs against the seen-set (unmatched inputs "
                "are not seen under any canonical form — nothing to expire)",
                file=sys.stderr,
            )
        if self.cfg.bloom_prefilter and self._bloom_active():
            staged = spark.read.parquet(*info["files"])
            prior_tomb = store.read("expired")
            tomb = (
                staged.select("url_key")
                if prior_tomb is None
                else staged.select("url_key")
                .unionByName(prior_tomb.select("url_key"))
                .distinct()
            )
            affected = [
                r["_shard"]
                for r in with_shard_cols(staged, "url_key", self.bloom_cfg)
                .select("_shard")
                .distinct()
                .collect()
            ]
            base = store.read("frontier").select("url_key")
            warm = store.read("warm_seen")
            if warm is not None:
                base = base.unionByName(warm.select("url_key"))
            # NOT _effective_seen_keys: that already subtracts the
            # committed tombstones, but `tomb` here additionally holds
            # the slice staged above (not yet committed)
            survivors = base.distinct().join(tomb, "url_key", "left_anti")
            surv = (
                with_shard_cols(survivors, "url_key", self.bloom_cfg)
                .filter(F.col("_shard").isin(affected))
                .select("url_key")
            )
            empty_aff = self.seenfilter.empty_bits_df(spark, self.bloom_cfg).filter(
                F.col("shard").isin(affected)
            )
            rebuilt = self.seenfilter.mark(surv, empty_aff, "url_key", self.bloom_cfg)
            bits2 = (
                self._latest_bloom()
                .filter(~F.col("shard").isin(affected))
                .unionByName(rebuilt)
            )
            store.stage("bloom", bits2, e + 1, manifest_wave=e)
            metrics["rebuilt_shards"] = len(affected)
        metrics["filter_cfg"] = self._filter_cfg_sig()
        store.commit_wave(e, metrics)
        return metrics

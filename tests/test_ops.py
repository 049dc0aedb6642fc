"""Direct unit tests for training-data ops beyond the oracle harness:
resize roundtrip, simhash banding, dup-cluster shape, feature dims."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def images(spark):
    from crawlspark import testkit

    return testkit.images_to_spark(spark, testkit.make_images(6))


def test_resize_images(spark, images):
    from crawlspark import imagecodec
    from crawlspark.ops import multimodal

    out = multimodal.resize_images(images, 8, 8).collect()
    assert len(out) == 6
    for r in out:
        arr = imagecodec.decode_png(bytes(r["bytes"]))
        assert arr.shape == (8, 8, 3)
        # block-mean resize preserves the per-channel global mean to
        # within rounding + uneven-block error (pattern-agnostic —
        # the synth corpus has 4 base patterns)
        truth = imagecodec.synth_image(r["image_id"], 24, 16)
        assert np.allclose(
            arr.mean(axis=(0, 1)), truth.mean(axis=(0, 1)), atol=4.0
        )


def test_image_features_dims(spark, images):
    from crawlspark.ops import multimodal

    out = multimodal.image_features(images, grid=4).collect()
    assert all(len(r["features"]) == 4 * 4 * 3 for r in out)
    assert all(0.0 <= v <= 1.0 for r in out for v in r["features"])


def test_frame_sample_rejects_non_qvid(spark, images):
    """The real QVID decoder must reject non-QVID payloads loudly
    (image bytes are not a video container). Renamed from
    test_frame_sample_is_stubbed — frame_sample has been real since
    the r4 QVID codec (VERDICT r05 hygiene note)."""
    from crawlspark.ops import multimodal

    vids = images.selectExpr("image_id AS video_id", "bytes")
    # Spark wraps the ValueError in a Py4J/PythonException
    # whose message formatting varies — assert it raises at all
    with pytest.raises(Exception):
        multimodal.frame_sample(vids).collect()


def test_phash_neardup_blocked_equals_exact_no_crossjoin(spark, images):
    """Banded blocking (pigeonhole, max_hamming < bands) must return
    exactly the all-pairs result, with no cartesian product in the
    physical plan (VERDICT r01 #2: the crossJoin was the one genuine
    scale-killer)."""
    from crawlspark.ops import multimodal

    blocked = multimodal.phash_neardup(images, max_hamming=5)
    exact = multimodal.phash_neardup(images, max_hamming=5, exact=True)
    assert blocked.collect() == exact.collect()
    plan = blocked._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dedup_plans_stay_bucketed(spark):
    """Plan guards for the round-3 dedup shapes: minhash LSH pairs
    must be one gram shuffle + one band groupBy (no self-join, no
    cartesian), and the inverted-index ngram Jaccard must join only
    on (block, gram) equi-keys — future edits can't silently
    reintroduce an all-pairs or double-lineage shape."""
    from crawlspark.ops import dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    mh = dedup.minhash_lsh_pairs(docs)
    plan = mh._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan, (
        "LSH pairs must come from the bucket groupBy, not a self-join"
    )
    # the documents parquet is scanned exactly once (single sig pass)
    assert plan.count("FileScan parquet") == 1, plan.count("FileScan parquet")

    nj = dedup.ngram_jaccard_pairs(docs, threshold=0.08)
    nplan = nj._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in nplan
    assert "BroadcastNestedLoopJoin" not in nplan


def test_minhash_bucket_guard(spark):
    """ADVICE r03: a giant identical-text cluster reaching LSH banding
    must fail loudly (with the exact-dedup-first fix in the message)
    instead of OOMing an executor on an unbounded collect_list row;
    the default cap must not fire on a sane corpus."""
    from crawlspark.ops import dedup

    rows = [(i, f"doc number {i} words here vary", "s") for i in range(10)]
    clones = [(100 + i, "same text in every single clone row", "s") for i in range(8)]
    docs = spark.createDataFrame(rows + clones, "doc_id: long, text: string, source: string")
    with pytest.raises(Exception, match="exceeds max_bucket=4"):
        dedup.minhash_lsh_pairs(docs, max_bucket=4).count()
    # default cap: clones still pair fine below the cap
    assert dedup.minhash_lsh_pairs(docs).count() >= len(clones) * (len(clones) - 1) // 2


def test_minhash_perms_are_independent():
    """The r04 perf rewrite's failure mode: an arithmetic multiplier
    family (a_i = c*(i+1)) makes permutation argmins coincide. Guard:
    no pairwise ratio a_j/a_i (mod p) may be a tiny integer, and all
    constants are distinct."""
    from crawlspark.ops.dedup import _MERSENNE31, _perm_consts

    consts = _perm_consts(16)
    a_vals = [a for a, _ in consts]
    assert len(set(a_vals)) == 16 and len({b for _, b in consts}) == 16
    for i in range(16):
        for j in range(16):
            if i == j:
                continue
            ratio = (a_vals[j] * pow(a_vals[i], -1, _MERSENNE31)) % _MERSENNE31
            assert ratio > 64 and ratio < _MERSENNE31 - 64, (i, j, ratio)


def test_ivf_multiprobe_plan_no_cartesian(spark):
    """Plan guard: multi-probe IVF near-dup must stay a broadcast
    centroid fan-out + hash join on the bucket key — no cartesian or
    nested-loop join over the vector table, and the pair dedup stays
    BEFORE the cosine projection (one Aggregate over 2-column
    candidate rows, not over vector payloads)."""
    from crawlspark.ops import dedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = spark.read.parquet("fixtures/centroids.parquet")
    df = dedup.embedding_neardup_ivf(emb, cents, threshold=0.4, n_probe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # the only nested-loop is the broadcast k-centroid fan-out
    assert plan.count("BroadcastNestedLoopJoin") <= 2, plan
    assert "HashAggregate" in plan  # the candidate-pair distinct


def test_qvid_roundtrip_and_frame_sample(spark):
    """QVID container (VERDICT r03 #8): header meta, lossy-but-
    deterministic frame round-trip (qjpg PSNR>=40 per the input_hint
    fidelity clause), and the distributed frame_sample operator
    reproducing the pure row function exactly."""
    import numpy as np

    from crawlspark import imagecodec, testkit, videocodec
    from crawlspark.ops import multimodal

    frames = videocodec.synth_video("vid-t", n_frames=7, w=12, h=10)
    blob = videocodec.encode_qvid(frames)
    assert videocodec.video_meta(blob) == (7, 12, 10)
    dec = videocodec.decode_qvid(blob)
    assert len(dec) == 7
    for orig, got in zip(frames, dec):
        assert got.shape == orig.shape
        assert imagecodec.psnr(orig, got) >= 40.0
    # sampling: every 3rd frame, indices preserved, skipped frames
    # never decoded (seek walk) — same values as full decode
    sampled = dict(videocodec.iter_frames(blob, 3))
    assert sorted(sampled) == [0, 3, 6]
    assert all(np.array_equal(sampled[i], dec[i]) for i in (0, 3, 6))

    videos = testkit.make_videos(3, n_frames=6, w=8, h=8)
    out = multimodal.frame_sample(
        spark.createDataFrame(videos), every_n=2
    ).collect()
    expect = []
    for r in videos.itertuples(index=False):
        expect.extend(multimodal.frame_sample_rows(r.video_id, bytes(r.bytes), 2))
    assert len(out) == len(expect) == 3 * 3
    got = {(r["video_id"], r["frame_idx"]): bytes(r["frame_png"]) for r in out}
    for e in expect:
        assert got[(e["video_id"], e["frame_idx"])] == e["frame_png"]


def test_transcode_videos_archive_invariants(spark):
    """transcode_videos (r9): every container re-muxed as delta-rect
    lossless animated WebP. Pins (1) the lossless-w.r.t.-decoded-
    frames invariant for BOTH input containers, (2) distributed ==
    pure row function, (3) frame-sampling a transcode == sampling the
    source (the composition the video_frame_sample CORRECTNESS row
    rides), (4) the size accounting columns, and (5) real compression
    on a static-background sequence."""
    import numpy as np

    from crawlspark import testkit, videocodec, webpanim
    from crawlspark.ops import multimodal

    videos = testkit.make_videos(4, n_frames=6, w=8, h=8)  # mixed containers
    out = multimodal.transcode_videos(spark.createDataFrame(videos)).collect()
    assert [r["video_id"] for r in out] == sorted(videos["video_id"])
    by_id = {r["video_id"]: r for r in out}
    for src in videos.itertuples(index=False):
        r = by_id[src.video_id]
        # distributed == pure
        pure = multimodal.transcode_row(src.video_id, bytes(src.bytes))
        assert bytes(r["bytes"]) == pure["bytes"]
        assert (r["n_frames"], r["w"], r["h"]) == (6, 8, 8)
        assert r["in_bytes"] == len(bytes(src.bytes))
        assert r["out_bytes"] == len(bytes(r["bytes"]))
        # lossless w.r.t. decoded frames, both containers
        data = bytes(src.bytes)
        if data[: len(videocodec.MAGIC)] == videocodec.MAGIC:
            src_frames = np.stack(videocodec.decode_qvid(data))
        else:
            src_frames = webpanim.decode_webp_anim(data)[0]
        got_frames = webpanim.decode_webp_anim(bytes(r["bytes"]))[0]
        np.testing.assert_array_equal(got_frames, src_frames)

    # sampling composition: frame_sample(transcode(v)) == frame_sample(v)
    df = spark.createDataFrame(videos)
    direct = multimodal.frame_sample(df, every_n=2).collect()
    via = multimodal.frame_sample(
        multimodal.transcode_videos(df), every_n=2
    ).collect()
    key = lambda r: (r["video_id"], r["frame_idx"])  # noqa: E731
    assert sorted(map(key, direct)) == sorted(map(key, via))
    dmap = {key(r): bytes(r["frame_png"]) for r in direct}
    assert all(dmap[key(r)] == bytes(r["frame_png"]) for r in via)

    # the archive lever: static-background sequence compresses vs raw
    base = np.zeros((32, 32, 3), np.uint8)
    frames = []
    for k in range(12):
        f = base.copy()
        f[4 + k : 8 + k, 2 + k : 6 + k] = (k * 30 % 256, 90, 200)
        frames.append(f)
    pure = multimodal.transcode_row("vid-s", videocodec.encode_qvid(frames))
    raw = 12 * 32 * 32 * 3
    assert pure["out_bytes"] < raw / 4, (pure["out_bytes"], raw)
    got = webpanim.decode_webp_anim(pure["bytes"])[0]
    np.testing.assert_array_equal(got, np.stack(videocodec.decode_qvid(
        videocodec.encode_qvid(frames))))


def test_ngram_stop_gram_pruning(spark):
    """max_df stop-gram pruning (VERDICT r03 #5): on a block where one
    gram is shared by EVERY doc (the quadratic hazard), the pruned
    posting self-join materializes measurably fewer rows, pairs whose
    overlap is only stop-grams vanish, and with a non-binding cap the
    output is bit-identical to unpruned."""
    from pyspark.sql import functions as F

    from crawlspark.ops import dedup
    from crawlspark.ops.dedup import _shingles

    # every doc shares the stop-gram "common token"; only doc pairs
    # (2i, 2i+1) share real content beyond it
    rows = []
    for i in range(30):
        body = f"unique payload {i // 2} alpha beta gamma delta"
        rows.append((i, f"common token {body}", "blk"))
    docs = spark.createDataFrame(rows, "doc_id: long, text: string, source: string")

    full = dedup.ngram_jaccard_pairs(docs, threshold=0.1)
    pruned = dedup.ngram_jaccard_pairs(docs, threshold=0.1, max_df=5)
    # true near-dup pairs (sharing the payload) survive pruning
    truth = {(2 * i, 2 * i + 1) for i in range(15)}
    got = {(r["doc_a"], r["doc_b"]) for r in pruned.collect()}
    assert truth <= got
    # stop-gram-only pairs are gone (their intersection was 1-2 grams)
    assert len(got) < full.count()

    # measured posting-join input reduction: the stop grams ("common",
    # "common token"-ish shingles) hit all 30 docs -> 30*29/2 rows each
    def join_rows(max_df):
        sh = docs.select("doc_id", "source", F.array_distinct(_shingles(2)).alias("grams"))
        post = sh.select("source", "doc_id", F.explode("grams").alias("g"))
        if max_df is not None:
            stop = (
                post.groupBy("source", "g").count()
                .filter(F.col("count") > max_df).select("source", "g")
            )
            post = post.join(F.broadcast(stop), ["source", "g"], "left_anti")
        a, b = post.alias("a"), post.alias("b")
        return a.join(
            b,
            (F.col("a.source") == F.col("b.source"))
            & (F.col("a.g") == F.col("b.g"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        ).count()
    assert join_rows(5) < join_rows(None) / 3

    # non-binding cap (block DF max is 30 here) -> identical output
    same = dedup.ngram_jaccard_pairs(docs, threshold=0.1, max_df=1000)
    assert sorted(map(tuple, same.collect())) == sorted(map(tuple, full.collect()))


def test_ivf_multiprobe_neardup_recall(spark):
    """Multi-probe IVF near-dup (VERDICT r03 #3): the n_probe=2 pair
    set must contain the single-probe set (every shared nearest
    bucket is still shared) and must recover strictly better recall
    against the exhaustive all-pairs truth on the fixture (where
    single-probe is known to miss boundary-straddling pairs)."""
    from pyspark.sql import functions as F

    from crawlspark.ops import dedup

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = spark.read.parquet("fixtures/centroids.parquet")
    thr = 0.4

    def pairset(df):
        return {(r["vec_a"], r["vec_b"]) for r in df.collect()}

    p1 = pairset(dedup.embedding_neardup_ivf(emb, cents, threshold=thr, n_probe=1))
    p2 = pairset(dedup.embedding_neardup_ivf(emb, cents, threshold=thr, n_probe=2))
    p3 = pairset(dedup.embedding_neardup_ivf(emb, cents, threshold=thr, n_probe=3))
    assert p1 <= p2, p1 - p2
    assert p2 <= p3, p2 - p3

    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"))

    def dot(x, y):
        return F.aggregate(F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda s, t: s + t)

    cos = dot(F.col("va"), F.col("vb")) / (
        F.sqrt(dot(F.col("va"), F.col("va"))) * F.sqrt(dot(F.col("vb"), F.col("vb")))
    )
    truth = pairset(
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", F.round(cos, 4).alias("c"))
        .filter(F.col("c") >= thr)
    )
    r1 = len(p1 & truth) / max(len(truth), 1)
    r2 = len(p2 & truth) / max(len(truth), 1)
    r3 = len(p3 & truth) / max(len(truth), 1)
    assert r2 >= r1
    assert r2 > r1 or r1 == 1.0, (r1, r2)
    # the REGISTERED operating point (emb_neardup_ivf, n_probe=3) must
    # hold >= 0.9 recall vs the all-pairs truth (VERDICT r04 #6;
    # measured 0.924 here / 0.915 at sf0.01, precision 1.0 both)
    assert r3 >= 0.9, r3
    # no false positives possible: every emitted pair passed exact cosine
    assert p2 <= truth


def test_banded_blocking_rejects_unsound_threshold(spark, images):
    from crawlspark.ops import dedup, multimodal

    with pytest.raises(ValueError):
        multimodal.phash_neardup(images, max_hamming=40)  # bands>32 impossible
    with pytest.raises(ValueError):
        multimodal.phash_neardup(images, max_hamming=8, bands=8)
    docs = images.selectExpr("image_id AS doc_id", "caption AS text")
    with pytest.raises(ValueError):
        dedup.simhash_neardup(docs, max_hamming=10, bands=8)


def test_simhash_neardup_self_consistency(spark):
    """A doc paired with a near-identical copy lands within hamming
    distance; unrelated docs (random vocab) do not collide at <=3."""
    import pandas as pd

    base = ("the quick brown fox jumps over the lazy dog while rain falls "
            "softly on ancient rooftops across the quiet northern village")
    rows = [
        {"doc_id": 1, "text": base, "lang": "en", "source": "s", "n_chars": 10},
        {"doc_id": 2, "text": base.replace("rain", "snow"), "lang": "en", "source": "s", "n_chars": 10},
        {"doc_id": 3, "text": "unrelated words entirely different topic completely separate subject matter here", "lang": "en", "source": "s", "n_chars": 10},
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows))
    from crawlspark.ops import dedup

    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in dedup.simhash_neardup(docs).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_ivf_topk_recall_beats_random_probing(spark):
    """IVF with the committed k-means centroids: probing 2 of 8
    buckets must recall well above the 2/8=0.25 random-bucket
    baseline — i.e. the coarse quantizer actually clusters similar
    vectors (measured 0.50 on this fixture)."""
    from crawlspark.ops import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = spark.read.parquet("/root/repo/fixtures/centroids.parquet")
    exact = {(r.q_id, r.n_id) for r in similarity.cosine_topk(emb).collect()}
    approx = {(r.q_id, r.n_id) for r in similarity.ivf_topk(emb, cents).collect()}
    assert len(approx) == len(exact) == 50
    assert len(approx & exact) / len(exact) >= 0.35


def test_pq_encode_matches_numpy_recompute(spark):
    """pq_encode's join-aggregate assignment (posexplode ⋈ broadcast
    codebooks -> partial-sum -> argmin) must equal a direct numpy
    per-subspace argmin on every one of the 500 fixture vectors —
    the committed codebook makes the codes engine-independent."""
    import numpy as np
    import pyarrow.parquet as papq

    from crawlspark.ops import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cb = spark.read.parquet("/root/repo/fixtures/pq_codebooks.parquet")
    enc = {r["vec_id"]: list(r["codes"])
           for r in similarity.pq_encode(emb, cb).collect()}

    t = papq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    vecs = np.array([list(v) for v in t.column("embedding").to_pylist()],
                    dtype=np.float64)
    ids = t.column("vec_id").to_pylist()
    cbt = papq.read_table("/root/repo/fixtures/pq_codebooks.parquet").to_pandas()
    m_sub = int(cbt["sub"].max()) + 1
    k_codes = int(cbt["code"].max()) + 1
    d_sub = vecs.shape[1] // m_sub
    books = np.zeros((m_sub, k_codes, d_sub))
    for r in cbt.itertuples():
        books[r.sub, r.code, r.dim - r.sub * d_sub] = r.value
    assert len(enc) == len(ids) == 500
    for i, v in zip(ids, vecs):
        want = [
            int(((books[m] - v[m * d_sub : (m + 1) * d_sub]) ** 2).sum(1).argmin())
            for m in range(m_sub)
        ]
        assert enc[int(i)] == want, (i, enc[int(i)], want)


def test_pq_topk_rerank_recall_and_plan(spark):
    """The IVFADC+rerank shape: the code-only ADC scan prunes to a
    50-row shortlist (10% of this corpus), exact L2 re-ranks only
    those rows. Pins (1) rerank recall@5 >= 0.5 vs exact L2 on the
    near-random fixture (measured 0.68 — this data is the HARD case,
    quantization error ~ the distance gaps), (2) rerank strictly
    beats raw ADC ranking (measured 0.22), (3) no cartesian product
    anywhere and the corpus joins broadcast the tiny side."""
    import numpy as np
    import pyarrow.parquet as papq

    from crawlspark.ops import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cb = spark.read.parquet("/root/repo/fixtures/pq_codebooks.parquet")
    rr = similarity.pq_topk(emb, cb, k=5, n_queries=10, rerank=50)
    plan = rr._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    got = rr.collect()
    assert len(got) == 50
    approx = {(r.q_id, r.n_id) for r in got}
    raw = {(r.q_id, r.n_id)
           for r in similarity.pq_topk(emb, cb, k=5, n_queries=10).collect()}

    t = papq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    vecs = np.array([list(v) for v in t.column("embedding").to_pylist()],
                    dtype=np.float64)
    ids = [int(i) for i in t.column("vec_id").to_pylist()]
    idx = {i: j for j, i in enumerate(ids)}
    exact = set()
    for q in range(10):
        d = ((vecs - vecs[idx[q]]) ** 2).sum(1)
        d[idx[q]] = np.inf
        exact |= {(q, ids[p]) for p in np.argsort(d)[:5]}
    r_rr = len(approx & exact) / len(exact)
    r_raw = len(raw & exact) / len(exact)
    assert r_rr >= 0.5, r_rr
    assert r_rr > r_raw, (r_rr, r_raw)


def test_ivfpq_topk_composed_deployment_shape(spark):
    """IVFADC (ivfpq_topk): IVF prunes WHICH vectors are scanned, PQ
    prunes the BYTES per scanned vector, exact L2 reranks the
    shortlist. Recall must sit at the IVF probe-containment ceiling
    (measured 0.48 vs the ivf_topk fixture ceiling ~0.50 — the PQ
    stage inside probed buckets loses almost nothing once the
    shortlist reranks), well above the 2/8 random-bucket baseline;
    plan pinned cartesian-free with broadcast tiny sides."""
    import numpy as np
    import pyarrow.parquet as papq

    from crawlspark.ops import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = spark.read.parquet("/root/repo/fixtures/centroids.parquet")
    cb = spark.read.parquet("/root/repo/fixtures/pq_codebooks.parquet")
    df = similarity.ivfpq_topk(emb, cents, cb, k=5, n_queries=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    got = df.collect()
    assert len(got) == 50
    approx = {(r.q_id, r.n_id) for r in got}

    t = papq.read_table("/root/testdata/sf0.001/embeddings.parquet")
    vecs = np.array([list(v) for v in t.column("embedding").to_pylist()],
                    dtype=np.float64)
    ids = [int(i) for i in t.column("vec_id").to_pylist()]
    idx = {i: j for j, i in enumerate(ids)}
    exact = set()
    for q in range(10):
        d = ((vecs - vecs[idx[q]]) ** 2).sum(1)
        d[idx[q]] = np.inf
        exact |= {(q, ids[p]) for p in np.argsort(d)[:5]}
    assert len(approx & exact) / len(exact) >= 0.35


def test_graph_depths_deep_chain(spark):
    """r05 regression guard (same latent bug as cc_labels): a BFS
    walk deeper than a few rounds must not stack an unbounded logical
    plan — the loop spills lineage every 4 rounds. 18-node chain ->
    17 propagation rounds, depths exactly 0..17."""
    from crawlspark import analysis

    rows = [
        {
            "Address": {"Host": "c.test", "Path": f"/{i}"},
            "Links": (
                [{"Address": {"Host": "c.test", "Path": f"/{i + 1}"}}]
                if i < 17 else []
            ),
        }
        for i in range(18)
    ]
    schema = (
        "Address struct<Host: string, Path: string>, "
        "Links array<struct<Address: struct<Host: string, Path: string>>>"
    )
    crawl = spark.createDataFrame(rows, schema)
    out = analysis.graph_depths(crawl, host="c.test", root="/0").collect()
    assert [(r["node"], r["depth"]) for r in out] == [
        (f"/{i}", i) for i in range(18)
    ]


def test_dup_clusters_transitivity(spark):
    """a~b and b~c (but a!~c directly) must share one cluster."""
    import pandas as pd

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        {"doc_id": 10, "text": base, "lang": "en", "source": "s", "n_chars": 1},
        {"doc_id": 11, "text": base + " extra", "lang": "en", "source": "s", "n_chars": 1},
        {"doc_id": 12, "text": "extra " + base, "lang": "en", "source": "s", "n_chars": 1},
        {"doc_id": 13, "text": "completely different content about databases and sparks", "lang": "en", "source": "s", "n_chars": 1},
    ]
    docs = spark.createDataFrame(pd.DataFrame(rows))
    from crawlspark.ops import dedup

    clusters = dedup.dup_clusters(docs).collect()
    by_cluster = {r["cluster_id"]: set(r["doc_ids"].split(",")) for r in clusters}
    big = [v for v in by_cluster.values() if len(v) >= 3]
    assert big and {"10", "11", "12"} <= big[0]
    assert all("13" not in v for v in by_cluster.values())


def test_cc_labels_driver_path_equals_distributed(spark):
    """r05 bounded driver union-find: identical (doc_id, label) sets
    as the distributed min-label loop (driver_threshold=0) on the
    real LSH pair graph (long ids), the phash band graph (string
    ids), a chain graph whose diameter exercises multiple propagation
    rounds, and the empty graph."""
    from pyspark.sql import functions as F

    from crawlspark import testkit
    from crawlspark.ops import dedup, multimodal

    def both(pairs):
        a = sorted(tuple(r) for r in dedup.cc_labels(pairs).collect())
        b = sorted(tuple(r) for r in dedup.cc_labels(pairs, driver_threshold=0).collect())
        return a, b

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    lsh = dedup.minhash_lsh_pairs(docs).select("doc_a", "doc_b")
    a, b = both(lsh)
    assert a == b and a

    imgs = testkit.images_to_spark(spark, testkit.make_images(12))
    ph = multimodal.phash_neardup(imgs, max_hamming=7).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    a, b = both(ph)
    assert a == b

    # diameter-15 chain: needs 15 propagation rounds (within the
    # max_iters=20 convergence bound) and crosses the every-4-rounds
    # lineage spill — the r05 plan-explosion regression guard
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(15)], "doc_a: long, doc_b: long"
    )
    a, b = both(chain)
    assert a == b and all(lbl == 0 for _, lbl in a) and len(a) == 16

    empty = spark.createDataFrame([], "doc_a: long, doc_b: long")
    a, b = both(empty)
    assert a == b == []


def test_redact_pii_exact_and_order(spark):
    """redact_pii: exact scrubbed strings, rule-order pinned (emails
    before URLs before phones — a URL's digits must not leak into the
    loose phone pattern), non-text columns untouched."""
    from crawlspark.ops import text as tx

    rows = [
        ("d1", "mail bob.smith+x@ex-ample.org now", "s"),
        ("d2", "see https://a.test/p?q=123456789 ok", "s"),
        ("d3", "call +1 (555) 123-4567 today", "s"),
        ("d4", "clean text stays clean", "s"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string, source string")
    got = {r["doc_id"]: (r["text"], r["source"])
           for r in tx.redact_pii(docs).collect()}
    assert got["d1"] == ("mail <EMAIL> now", "s")
    assert got["d2"] == ("see <URL> ok", "s")
    assert got["d3"] == ("call <PHONE> today", "s")
    assert got["d4"] == ("clean text stays clean", "s")


def test_repetition_stats_gopher_fractions(spark):
    """repetition_stats: exact dup-line and top-bigram fractions on
    crafted docs; NULL-text docs keep a row with NULL fractions."""
    from crawlspark.ops import text as tx

    rows = [
        # "ab\ncd\nab": line "ab" occurs 2x -> dup chars 4 of 6
        ("d1", "ab\ncd\nab"),
        # 4 words -> bigrams [x y, y x, x y]: top 2 of 3
        ("d2", "x y x y"),
        ("d3", "all lines unique\nno repeats here"),
        ("d4", None),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: (r["dup_line_frac"], r["top_bigram_frac"])
           for r in tx.repetition_stats(docs).collect()}
    assert got["d1"][0] == round(4 / 6, 4)
    assert got["d2"][1] == round(2 / 3, 4)
    assert got["d3"] == (0.0, round(1 / 5, 4))
    assert got["d4"] == (None, None)
    assert len(got) == 4


def test_decontaminate_benchmark_overlap(spark):
    """decontaminate: a training doc containing a benchmark sentence
    (>= one shared 8-word shingle) is dropped, clean docs survive;
    the benchmark side is broadcast in the plan (the corpus is never
    content-shuffled against it)."""
    from crawlspark.ops import pipeline

    bench_sent = "the quick brown fox jumps over the lazy dog"
    docs = spark.createDataFrame(
        [
            ("t1", f"intro text then {bench_sent} then trailing words"),
            ("t2", "a completely different document about spark engines "
                   "running large scale crawls every single day"),
            ("t3", "another clean doc with its own words in a long enough "
                   "sentence to form many shingles"),
        ],
        "doc_id string, text string",
    )
    bench = spark.createDataFrame([("b1", bench_sent)], "doc_id string, text string")
    out = pipeline.decontaminate(docs, bench)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == ["t2", "t3"]
    # min_hits above the overlap keeps the contaminated doc too
    lax = pipeline.decontaminate(docs, bench, min_hits=10)
    assert sorted(r["doc_id"] for r in lax.collect()) == ["t1", "t2", "t3"]


def test_pagerank_matches_numpy_power_iteration(spark):
    """analysis.pagerank (r9): the distributed loop (edge-weight
    join + dst agg + static dangling set, lineage-spilled every 4
    rounds) must match a direct numpy power iteration with the same
    semantics (uniform dangling redistribution, fixed iterations) to
    float tolerance, and conserve total rank mass = 1."""
    import numpy as np

    from crawlspark import analysis

    # a->b, a->c, b->c, c->a, d->c, c->e; e is dangling
    edge_list = [("/a", "/b"), ("/a", "/c"), ("/b", "/c"),
                 ("/c", "/a"), ("/d", "/c"), ("/c", "/e")]
    srcs = sorted({s for s, _ in edge_list})
    rows = [
        {
            "Address": {"Host": "p.test", "Path": s},
            "Links": [{"Address": {"Host": "p.test", "Path": t}}
                      for (s2, t) in edge_list if s2 == s],
        }
        for s in srcs
    ]
    schema = (
        "Address struct<Host: string, Path: string>, "
        "Links array<struct<Address: struct<Host: string, Path: string>>>"
    )
    crawl = spark.createDataFrame(rows, schema)
    iters, d = 9, 0.85  # 9 crosses two spill boundaries (rounds 4, 8)
    got = {r["node"]: r["rank"]
           for r in analysis.pagerank(crawl, "p.test", iters=iters).collect()}

    nodes = sorted({x for e in edge_list for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    A = np.zeros((n, n))
    for s, t in edge_list:
        A[idx[t], idx[s]] += 1.0
        out[idx[s]] += 1.0
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling_mass = r[out == 0].sum()
        w = np.where(out > 0, r / np.where(out > 0, out, 1.0), 0.0)
        r = (1 - d) / n + d * (A @ w) + d * dangling_mass / n
    assert set(got) == set(nodes)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for v in nodes:
        assert abs(got[v] - r[idx[v]]) < 1e-9, (v, got[v], r[idx[v]])
    # the hub (/c, 3 in-edges) outranks everything
    assert max(got, key=got.get) == "/c"


def test_pq_stored_codes_deployment_shape(spark, tmp_path):
    """The deployment shape: pq_encode is a one-time index build
    whose stored codes feed pq_topk/ivfpq_topk via codes=/buckets= —
    results must be row-identical to the self-contained inline
    recompute (same for a stored ivf_assign bucket table)."""
    from crawlspark.ops import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = spark.read.parquet("/root/repo/fixtures/centroids.parquet")
    cb = spark.read.parquet("/root/repo/fixtures/pq_codebooks.parquet")
    similarity.pq_encode(emb, cb).write.parquet(str(tmp_path / "codes"))
    similarity.ivf_assign(emb, cents).write.parquet(str(tmp_path / "buckets"))
    codes = spark.read.parquet(str(tmp_path / "codes"))
    buckets = spark.read.parquet(str(tmp_path / "buckets"))

    key = lambda r: (r["q_id"], r["rnk"], r["n_id"], r["dist"])  # noqa: E731
    inline = sorted(map(key, similarity.pq_topk(emb, cb, rerank=20).collect()))
    stored = sorted(map(key, similarity.pq_topk(
        emb, cb, rerank=20, codes=codes).collect()))
    assert inline == stored and len(inline) == 50

    inline2 = sorted(map(key, similarity.ivfpq_topk(emb, cents, cb).collect()))
    stored2 = sorted(map(key, similarity.ivfpq_topk(
        emb, cents, cb, codes=codes, buckets=buckets).collect()))
    assert inline2 == stored2 and len(inline2) == 50


def test_spread_is_noop_at_or_above_parallelism(spark):
    """r10 ops.spread: raises a narrow frame to defaultParallelism for
    CPU-heavy stages, and must be a structural NO-OP when the input
    already has that many partitions (the real-scale case — a spread
    that re-shuffled wide scans would add an exchange per operator)."""
    from crawlspark.ops import spread

    par = spark.sparkContext.defaultParallelism
    small = spark.range(100)  # few partitions
    assert spread(small).rdd.getNumPartitions() == max(
        par, small.rdd.getNumPartitions()
    )
    wide = spark.range(100).repartition(par + 3)
    assert spread(wide) is wide  # identity, not just same count


def test_lsh_edges_only_equals_public_pair_set(spark):
    """r10: the _edges_only LSH variant (used by dup_labels and
    lsh_verified_pairs) must return exactly the public pair SET —
    est_jaccard is functionally determined by the pair, so dropping
    it before distinct cannot change the set."""
    from crawlspark.ops import dedup

    rows = [(i, f"alpha beta gamma delta {i % 4} epsilon zeta", "s") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string, source: string")
    pub = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(docs).select("doc_a", "doc_b").collect()
    }
    edges = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(docs, _edges_only=True).collect()
    }
    assert pub == edges and len(edges) > 0


def test_cos_pre_bit_equals_inline_cos(spark):
    """r10 norm hoisting: _cos_pre with per-vector hoisted norms must
    be BIT-identical to the inline _cos for every pair (same element
    order, same ops — only the evaluation count changes). The oracle
    gate compares float hex, so approximate equality is not enough."""
    import random

    from pyspark.sql import functions as F

    from crawlspark.ops.similarity import _cos, _cos_pre, _norm

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(17)]) for i in range(30)
    ]
    e = spark.createDataFrame(rows, "vec_id: long, v: array<double>")
    a = e.select(F.col("vec_id").alias("ia"), F.col("v").alias("va")).withColumn(
        "na", _norm(F.col("va"))
    )
    b = e.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb")).withColumn(
        "nb", _norm(F.col("vb"))
    )
    pairs = a.crossJoin(b).filter(F.col("ia") < F.col("ib"))
    out = pairs.select(
        _cos(F.col("va"), F.col("vb")).alias("inline"),
        _cos_pre(F.col("va"), F.col("na"), F.col("vb"), F.col("nb")).alias("pre"),
    ).collect()
    assert len(out) == 30 * 29 // 2
    for r in out:
        assert r["inline"].hex() == r["pre"].hex()


def test_lsh_verified_candidate_pruning_is_lossless(spark):
    """r10: lsh_verified_pairs computes verify grams only for docs in
    a candidate pair; the verified output must be identical to the
    unpruned definition (exact Jaccard over the candidate set)."""
    from pyspark.sql import functions as F

    from crawlspark.ops import dedup
    from crawlspark.ops.dedup import _shingles

    rows = [(i, f"one two three four five {i % 3} six seven", "s") for i in range(30)]
    rows += [(100 + i, "totally different text block entirely unique %d" % i, "s") for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string, source: string")
    got = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in dedup.lsh_verified_pairs(docs, threshold=0.1).collect()
    }
    # reference: candidates x full-corpus gram frames (the pre-r10 shape)
    cand = dedup.minhash_lsh_pairs(docs).select("doc_a", "doc_b")
    g = docs.select("doc_id", F.array_distinct(_shingles(2)).alias("grams"))
    a = g.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("ga"))
    b = g.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("gb"))
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size("ga") + F.size("gb") - inter
    ref = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a", "doc_b",
            F.round(inter / F.greatest(union, F.lit(1)), 4).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.1)
        .collect()
    }
    assert got == ref and len(got) > 0


def test_scored_pairs_arrow_bit_equal(spark):
    """r10: the numpy-batched pair scorer must equal the interpreted
    _cos_pre HOF cosine BIT-FOR-BIT (same left fold in element
    order), including the scalar fallback's null semantics (null
    vector/norm, null element, ragged lengths -> null cosine)."""
    from pyspark.sql import functions as F

    from crawlspark.ops.similarity import _cos_pre, _norm, _scored_pairs_arrow

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("n", _norm(F.col("v")))
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("v").alias("va"),
                 F.col("n").alias("na"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("v").alias("vb"),
                 F.col("n").alias("nb"))
    joined = a.join(b, F.col("vec_a") % 17 == F.col("vec_b") % 17).filter(
        F.col("vec_a") < F.col("vec_b")
    )
    want = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in joined.select(
            "vec_a", "vec_b",
            _cos_pre(F.col("va"), F.col("na"), F.col("vb"), F.col("nb")).alias("cosine"),
        ).collect()
    }
    got = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in _scored_pairs_arrow(joined).collect()
    }
    assert len(got) == len(want) and len(got) > 1000
    # bit-for-bit: exact float equality, no tolerance
    assert got == want

    # fallback semantics: nulls and ragged rows
    rows = [
        (1, 2, [1.0, 2.0], 5.0, [3.0, 4.0], 7.0),      # dense pair (fast path shape)
        (3, 4, None, 5.0, [1.0], 1.0),                  # null vector
        (5, 6, [1.0, 2.0], None, [3.0, 4.0], 7.0),      # null norm
        (7, 8, [1.0, None], 5.0, [3.0, 4.0], 7.0),      # null element
        (9, 10, [1.0, 2.0, 3.0], 5.0, [1.0], 7.0),      # ragged zip
        (11, 12, [], 1.0, [], 1.0),                     # empty vectors -> 0.0
    ]
    df = spark.createDataFrame(
        rows, "vec_a long, vec_b long, va array<double>, na double, vb array<double>, nb double"
    )
    want2 = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in df.select(
            "vec_a", "vec_b",
            _cos_pre(F.col("va"), F.col("na"), F.col("vb"), F.col("nb")).alias("cosine"),
        ).collect()
    }
    got2 = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in _scored_pairs_arrow(df).collect()
    }
    import math

    assert set(got2) == set(want2)
    for k in want2:
        w, g = want2[k], got2[k]
        assert (w is None and g is None) or (
            isinstance(w, float) and isinstance(g, float)
            and (w == g or (math.isnan(w) and math.isnan(g)))
        ), (k, w, g)

    # ANSI parity: a zero denominator raises in BOTH paths
    zdf = spark.createDataFrame(
        [(1, 2, [1.0], 0.0, [1.0], 0.0)],
        "vec_a long, vec_b long, va array<double>, na double, vb array<double>, nb double",
    )
    with pytest.raises(Exception, match="(?i)zero"):
        zdf.select(
            _cos_pre(F.col("va"), F.col("na"), F.col("vb"), F.col("nb")).alias("c")
        ).collect()
    with pytest.raises(Exception, match="(?i)zero"):
        _scored_pairs_arrow(zdf).collect()


def test_bucket_pairs_scored_null_and_nan_elements(spark):
    """r10 review fix: a NULL embedding element drops its pairs (the
    HOF path scored them to a null cosine, which the >= threshold
    filter drops) — the explicit JVM-side pre-filter makes that
    deliberate rather than an accident of serializer coercion. A
    literal-NaN element (out-of-domain data) yields a NULL cosine
    too: applyInPandas's pandas->Arrow return coerces float NaN to
    null, so the pair is dropped by the threshold filter — the one
    documented divergence from the HOF path, which emitted a
    NaN-cosine row there (Spark orders NaN above every threshold)."""
    from crawlspark.ops.similarity import _bucket_pairs_scored

    rows = [
        (1, [1.0, 0.0], 1.0, 0, [0]),
        (2, [1.0, 0.0], 1.0, 0, [0]),
        (3, [1.0, None], 1.0, 0, [0]),            # null element -> dropped
        (4, [float("nan"), 0.0], 1.0, 0, [0]),     # NaN data -> null cosine
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, v array<double>, n double, bucket int, buckets array<int>"
    )
    out = _bucket_pairs_scored(df, canonical_filter=True)
    got = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in out.collect()}
    assert set(got) == {(1, 2), (1, 4), (2, 4)}  # no pair touches vec 3
    assert got[(1, 2)] == 1.0
    assert got[(1, 4)] is None and got[(2, 4)] is None
    # and the op-level filter drops the null-cosine pairs
    from pyspark.sql import functions as F

    kept = out.filter(F.col("cosine") >= 0.4).collect()
    assert {(r["vec_a"], r["vec_b"]) for r in kept} == {(1, 2)}

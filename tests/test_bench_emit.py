"""Driver-contract test for bench.py's emitted record (VERDICT r08
#1): the ONE stdout JSON line must stay under the driver's ~2,000-char
tail capture (bench.LINE_MAX = 1,800 with slack) even with the
worst-case settle-gate attempt trail (CAL_RETRIES burns on every
leg), while the graded numbers stay on the line and the full trails
land in the sidecar."""

import json
import os

import bench


def _fat_record():
    """An r8-shaped record at its worst case: every leg's settle gate
    burned the full retry budget (the r8 driver run hit 9 attempts on
    crawl_wide and the line grew to 2,218 chars — past the capture)."""
    queries = {
        "crawl_deep": 9.881, "crawl_wide": 21.011, "crawl_payload": 10.728,
        "crawl_sf_emulation": 0.578, "crawl_inlinks": 0.256,
        "tpch_q1_pricing": 0.333, "orders_region_topk": 0.882,
        "docs_text_metrics": 0.346, "docs_minhash_lsh": 1.705,
        "docs_exact_dedup": 0.215, "docs_neardup_verified": 1.983,
        "docs_dedup_materialize": 0.462, "docs_training_corpus": 1.171,
        "emb_cosine_topk": 0.913, "emb_srp_ann_topk": 0.844,
        "emb_ivf_topk": 1.213, "images_phash_neardup": 0.531,
    }
    attempts = {
        tag: [round(10.154 - 1.01 * i, 3) for i in range(bench.CAL_RETRIES + 1)]
        for tag in ("pre", "crawl_deep", "crawl_wide", "crawl_payload")
    }
    return {
        "metric": "crawl+analysis wall seconds (crawl_deep = 15700-URL "
        "depth-2 BFS; crawl_wide = 204100-URL frontier drain; "
        "crawl_payload = 51000-URL image+caption crawl, 50000 payloads "
        "decoded+PSNR-verified)",
        "value": 55.781,
        "unit": "sec",
        "queries": queries,
        "sf": "/root/testdata/sf0.1",
        "urls_per_sec": 9713.2,
        "urls_per_sec_deep": 1588.9,
        "urls_per_sec_payload": 4753.7,
        "payload_verified": 50000,
        "cpus": 32,
        "rows": {k: 123456 for k in queries},
        "samples": {k: [queries[k], queries[k] + 0.5] for k in queries},
        "calibration_sec": [0.379, 0.43],
        "calibration_nominal_sec": 0.38,
        "calibration_attempts": attempts,
    }


def test_line_fits_driver_capture(tmp_path):
    line = bench.emit(_fat_record(), detail_path=str(tmp_path / "detail.json"))
    assert len(line) <= bench.LINE_MAX
    rec = json.loads(line)  # one valid JSON line
    # every graded number survives on the line
    assert rec["value"] == 55.781 and rec["unit"] == "sec"
    assert len(rec["queries"]) == 17 and rec["queries"]["crawl_wide"] == 21.011
    assert rec["urls_per_sec"] == 9713.2 and rec["cpus"] == 32
    assert rec["calibration_sec"] == [0.379, 0.43]
    # attempt trail compressed to [first, last, n] per leg
    summ = rec["calibration_attempts"]["crawl_wide"]
    assert summ[0] == 10.154 and summ[2] == bench.CAL_RETRIES + 1


def test_sidecar_keeps_full_detail(tmp_path):
    path = tmp_path / "detail.json"
    rec = _fat_record()
    bench.emit(rec, detail_path=str(path))
    detail = json.loads(path.read_text())
    assert detail["calibration_attempts"] == rec["calibration_attempts"]
    assert detail["samples"] == rec["samples"]
    assert detail["rows"] == rec["rows"]
    assert "PSNR-verified" in detail["metric"]


def test_headroom_vs_driver_tail():
    # the driver captures ~2,000 chars; our budget must leave real slack
    assert bench.LINE_MAX <= 1900
    assert os.path.basename(bench.DETAIL_PATH) == "BENCH_DETAIL.json"

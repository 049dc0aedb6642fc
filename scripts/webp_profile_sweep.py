"""encode_webp profile sweep (VERDICT r08 #4): size + encode/decode
time for literal / palette / lz77 / auto over the committed fixture
corpus plus the synthetic image families, verifying (a) auto picks a
profile whose size is within TOLERANCE of the best explicit profile
on every image, and (b) every auto stream roundtrips exactly.

Emits one markdown table (paste into BENCH.md) + one JSON line.
No Spark — pure numpy/codec, runs in seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawlspark import webpcodec as W  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOLERANCE = 1.10  # auto may be <=10% bigger than the per-image best
SLACK_BYTES = 64  # absolute floor: on degenerate images every profile
# collapses to headers (flat: literal 30 B vs palette 38 B) — cheap
# stats cannot and need not pick between header-sized streams


def corpus() -> list[tuple[str, np.ndarray]]:
    rng = np.random.default_rng(42)
    out = [
        ("noise_64", rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)),
        ("noise_256", rng.integers(0, 256, (256, 256, 3), dtype=np.uint8)),
        ("gradient", np.stack(np.meshgrid(
            np.arange(256, dtype=np.uint8),
            np.arange(256, dtype=np.uint8), indexing="ij",
        ) + [np.full((256, 256), 127, dtype=np.uint8)], axis=2)),
        ("banded_rows", np.repeat(
            rng.integers(0, 256, (16, 1, 3), dtype=np.uint8), 16, axis=0
        ).repeat(256, axis=1)),
        ("banded_cols", np.repeat(
            rng.integers(0, 256, (1, 16, 3), dtype=np.uint8), 16, axis=1
        ).repeat(256, axis=0)),
        ("flat", np.full((128, 128, 3), 77, dtype=np.uint8)),
    ]
    for k in (4, 16, 200):
        pal = rng.integers(0, 256, (k, 3), dtype=np.uint8)
        out.append((f"art_{k}c", pal[rng.integers(0, k, (128, 128))]))
    # low-color but run-dominated: palette admissible, lz77 better
    checker = np.zeros((128, 128), dtype=np.int64)
    checker[::8, :] = 1
    pal2 = np.array([[10, 200, 30], [240, 10, 90]], dtype=np.uint8)
    out.append(("sparse_lines", pal2[checker]))
    fx = os.path.join(REPO, "fixtures", "images.parquet")
    if os.path.exists(fx):
        import pyarrow.parquet as pq

        t = pq.read_table(fx).to_pylist()
        from crawlspark import imagecodec

        for r in t[:8]:
            arr = imagecodec.synth_image(r["image_id"], r["w"], r["h"])
            out.append((f"fixture_{r['image_id']}", arr))
    return out


def main():
    profiles = ("literal", "palette", "lz77", "auto")
    rows = []
    print("| image | px | literal B | palette B | lz77 B | auto B (picked) | auto enc µs/px | auto dec µs/px |")
    print("|---|---|---|---|---|---|---|---|")
    for name, img in corpus():
        px = img.shape[0] * img.shape[1]
        sizes: dict = {}
        for prof in profiles:
            try:
                t0 = time.time()
                data = W.encode_webp(img, profile=prof)
                enc = time.time() - t0
                t0 = time.time()
                out = W.decode_webp(data)
                dec = time.time() - t0
                np.testing.assert_array_equal(out[:, :, :3], img)
                sizes[prof] = {"bytes": len(data), "enc_s": enc, "dec_s": dec}
            except ValueError:
                sizes[prof] = None  # palette on >256 colors
        picked = W._auto_profile(img)
        best = min(
            v["bytes"] for k, v in sizes.items() if v and k != "auto"
        )
        auto = sizes["auto"]
        assert auto is not None and auto["bytes"] <= max(best * TOLERANCE, best + SLACK_BYTES), (
            name, picked, auto and auto["bytes"], best,
        )
        rows.append({
            "image": name, "px": px, "picked": picked,
            **{k: (v["bytes"] if v else None) for k, v in sizes.items()},
            "auto_enc_us_px": round(1e6 * auto["enc_s"] / px, 2),
            "auto_dec_us_px": round(1e6 * auto["dec_s"] / px, 2),
        })
        fmt = lambda v: f"{v['bytes']:,}" if v else "—"  # noqa: E731
        print(
            f"| {name} | {px:,} | {fmt(sizes['literal'])} | {fmt(sizes['palette'])} "
            f"| {fmt(sizes['lz77'])} | {auto['bytes']:,} ({picked}) "
            f"| {rows[-1]['auto_enc_us_px']} | {rows[-1]['auto_dec_us_px']} |"
        )
    print(json.dumps({"tolerance": TOLERANCE, "rows": rows}))


if __name__ == "__main__":
    main()

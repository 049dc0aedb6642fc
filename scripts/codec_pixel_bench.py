"""Per-pixel decode cost across the codec matrix (VERDICT r06 #4).

Measures µs/pixel for every own codec (png, qjpg, real JPEG, webp
VP8L fast + reference-loop paths) on synth images at two sizes, so
the cost of each format in the payload-drain parse map is a
documented number rather than a guess.

Usage: python scripts/codec_pixel_bench.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from crawlspark import imagecodec, webpcodec  # noqa: E402


def best_us_per_px(fn, n_px: int, reps: int = 5) -> float:
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e6 / n_px


def main():
    rows = []
    for w, h in ((64, 48), (192, 128)):
        arr = imagecodec.synth_image(f"bench-{w}", w, h)
        n = w * h
        blobs = {fmt: imagecodec.encode(arr, fmt) for fmt in ("png", "qjpg", "jpeg", "webp")}
        for fmt in ("png", "qjpg", "jpeg"):
            rows.append((f"{fmt}", f"{w}x{h}",
                         best_us_per_px(lambda f=fmt: imagecodec.decode(blobs[f], f), n)))
        try:
            webpcodec.FAST_LITERAL = True
            rows.append(("webp (vectorized)", f"{w}x{h}",
                         best_us_per_px(lambda: webpcodec.decode_webp(blobs["webp"]), n)))
            webpcodec.FAST_LITERAL = False
            rows.append(("webp (reference loop)", f"{w}x{h}",
                         best_us_per_px(lambda: webpcodec.decode_webp(blobs["webp"]), n)))
        finally:
            webpcodec.FAST_LITERAL = True
        # lz77 profile: a banded/repetitive image (the shape the greedy
        # dist-1/dist-width matcher targets) — measures the token-level
        # vectorized path vs the per-pixel reference loop on a stream
        # that actually carries backward references (VERDICT r07 #5)
        rep = np.zeros((h, w, 3), np.uint8)
        rep[:, :, 0] = (np.arange(w) // 12 * 17).astype(np.uint8)
        rep[:, :, 1] = (np.arange(h)[:, None] // 6 * 11).astype(np.uint8)
        rep[:, :, 2] = 200
        rep[h // 4 : h // 2, w // 5 : w // 2] = np.random.default_rng(h).integers(
            0, 256, (h // 2 - h // 4, w // 2 - w // 5, 3), dtype=np.uint8
        )
        lzblob = webpcodec.encode_webp(rep, lz77=True)
        litblob = webpcodec.encode_webp(rep)
        try:
            webpcodec.FAST_LITERAL = True
            rows.append((f"webp lz77 ({len(lzblob)}B vs literal {len(litblob)}B, vectorized)",
                         f"{w}x{h}",
                         best_us_per_px(lambda: webpcodec.decode_webp(lzblob), n)))
            webpcodec.FAST_LITERAL = False
            rows.append(("webp lz77 (reference loop)", f"{w}x{h}",
                         best_us_per_px(lambda: webpcodec.decode_webp(lzblob), n)))
        finally:
            webpcodec.FAST_LITERAL = True
        # palette profile: 16-color image of the same size — the
        # bundled stream codes at 1/2 width (wb=1: 2 indices per
        # coded pixel) and skips per-pixel entropy on r/b/a
        rng = np.random.default_rng(w)
        pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
        pimg = pal[rng.integers(0, 16, (h, w))]
        pblob = webpcodec.encode_webp(pimg, palette=True)
        rows.append(("webp (palette, 16 colors)", f"{w}x{h}",
                     best_us_per_px(lambda: webpcodec.decode_webp(pblob), n)))
    print("| codec | size | decode µs/pixel |")
    print("|---|---|---|")
    for name, size, us in rows:
        print(f"| {name} | {size} | {us:.2f} |")


if __name__ == "__main__":
    main()

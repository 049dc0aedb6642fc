"""Deterministic, dependency-free image codecs for the image+caption
payload (BASELINE.json input_hint: columns image_id/bytes/w/h/fmt/
caption/phash).

The sandbox has no PIL/libjpeg/libwebp, so the codecs here are real
but minimal, pure numpy+zlib, and fully deterministic across
platforms — which is exactly what the per-row invariant needs
(decoded-pixel allclose; PSNR >= 40 dB for lossy):

- ``png``  : a genuine PNG encoder/decoder (8-bit RGB, filter 0),
             lossless -> exact pixel equality.
- ``qjpg`` : a deterministic lossy stand-in for JPEG — uniform
             quantization (step Q) of RGB samples + zlib. Max error
             Q/2 -> PSNR ~= 20*log10(255/(Q/sqrt(12))) (Q=4 => ~47 dB),
             comfortably above the 40 dB floor and bit-reproducible
             (real libjpeg output varies by build, which would break
             the determinism contract).

- ``jpeg`` : a REAL baseline JFIF codec (crawlspark/jpegcodec.py,
             r05) — q98 clears the PSNR>=40 payload gate.
- ``webp`` : a REAL lossless VP8L codec (crawlspark/webpcodec.py,
             r06; full-spec lossless decode r07 — all transforms,
             meta prefix codes, color cache, 2D LZ77) — exact pixel
             equality on roundtrip.

If PIL is available at runtime (not in this container) the loader in
``try_pil_decode`` is used for image bytes outside the own-codec
subsets (e.g. lossy VP8 webp); otherwise those raise
NotImplementedError with the reason.
"""

from __future__ import annotations

import struct
import threading as _threading
import zlib

import numpy as np

__all__ = [
    "encode_png", "decode_png", "encode_qjpg", "decode_qjpg",
    "encode", "decode", "psnr", "phash64", "synth_image", "caption_for",
]

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
QJPG_MAGIC = b"QJPG"
QJPG_STEP = 4


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """8-bit RGB HxWx3 -> PNG bytes (filter 0 rows)."""
    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 1:] = arr.reshape(h, w * 3)
    idat = zlib.compress(raw.tobytes(), 6)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, w: int) -> np.ndarray:
    """PNG unfiltering (all 5 filter types) for 8-bit RGB."""
    stride = w * 3
    out = np.zeros((h, stride), dtype=np.uint8)
    bpp = 3
    for y in range(h):
        ftype = raw[y, 0]
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        else:
            cur = np.zeros(stride, np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                cc = prev[x - bpp] if x >= bpp else 0
                if ftype == 1:
                    cur[x] = (line[x] + a) & 0xFF
                elif ftype == 3:
                    cur[x] = (line[x] + ((a + b) >> 1)) & 0xFF
                elif ftype == 4:
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    cur[x] = (line[x] + pred) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter {ftype}")
        out[y] = cur.astype(np.uint8)
    return out.reshape(h, w, 3)


def decode_png(data: bytes) -> np.ndarray:
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    idat = b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            w, h, bit, ctype = struct.unpack(">IIBB", payload[:10])
            if bit != 8 or ctype != 2:
                raise NotImplementedError("only 8-bit RGB PNG supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, 1 + w * 3)
    return _unfilter(raw, h, w)


def encode_qjpg(arr: np.ndarray, step: int = QJPG_STEP) -> bytes:
    h, w, _ = arr.shape
    q = ((arr.astype(np.int32) // step) * step + step // 2).clip(0, 255).astype(np.uint8)
    return QJPG_MAGIC + struct.pack(">IIB", w, h, step) + zlib.compress(q.tobytes(), 6)


def decode_qjpg(data: bytes) -> np.ndarray:
    if data[:4] != QJPG_MAGIC:
        raise ValueError("not a QJPG")
    w, h, _step = struct.unpack(">IIB", data[4:13])
    return np.frombuffer(zlib.decompress(data[13:]), dtype=np.uint8).reshape(h, w, 3)


def try_pil_decode(data: bytes) -> np.ndarray:
    try:
        import io

        from PIL import Image  # noqa: F401  (absent in this container)
    except ImportError as e:
        raise NotImplementedError(
            "jpeg/webp decode requires PIL, not present in this sandbox; "
            "use fmt 'png' or 'qjpg' (deterministic stand-ins)"
        ) from e
    import io

    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


def encode(arr: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return encode_png(arr)
    if fmt == "qjpg":
        return encode_qjpg(arr)
    if fmt == "jpeg":
        # real baseline JFIF — own pure-numpy codec (r05, VERDICT r04
        # #7). quality=98 measured worst-case 43.4 dB over the synth
        # corpus, so real-JPEG payloads clear the PSNR>=40 invariant
        from .jpegcodec import encode_jpeg

        return encode_jpeg(arr, quality=98)
    if fmt == "webp":
        # real lossless VP8L — own pure-numpy codec (r06, VERDICT r05
        # #6); lossless, so the payload invariant is exact equality
        from .webpcodec import encode_webp

        return encode_webp(arr)
    raise NotImplementedError(f"encode fmt={fmt!r} (no codec libs in sandbox)")


def decode(data: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        return decode_png(data)
    if fmt == "qjpg":
        return decode_qjpg(data)
    if fmt == "jpeg":
        from .jpegcodec import decode_jpeg

        return decode_jpeg(data)
    if fmt == "webp":
        from .webpcodec import decode_webp

        try:
            return decode_webp(data)
        except NotImplementedError as reason:
            # out-of-subset webp (lossy VP8, non-opaque alpha): PIL
            # if present, else the codec's specific loud failure
            try:
                return try_pil_decode(data)
            except NotImplementedError:
                raise reason from None
    return try_pil_decode(data)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(20.0 * np.log10(255.0) - 10.0 * np.log10(mse))


def phash64(arr: np.ndarray) -> int:
    """Average-hash: block-mean to 8x8 grayscale, threshold by mean.

    Returns a signed int64 (Spark/parquet LongType-compatible)."""
    g = arr.astype(np.float64).mean(axis=2)
    h, w = g.shape
    ys = (np.arange(9) * h) // 8
    xs = (np.arange(9) * w) // 8
    blocks = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            blocks[i, j] = g[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean()
    bits = (blocks > blocks.mean()).flatten()
    v = 0
    for bit in bits:
        v = (v << 1) | int(bit)
    if v >= 1 << 63:
        v -= 1 << 64
    return v


def _seed_for(image_id: str) -> int:
    return zlib.crc32(image_id.encode("utf-8")) & 0xFFFFFFFF


# r10 perf (bit-identical by construction, pinned by the committed
# image ground-truth fixtures): the base pattern is a pure function of
# ((seed>>8)%4, w, h) — cache it instead of rebuilding per image; and
# reuse ONE RandomState re-seeded per call, because `rs.seed(n)` is
# the documented legacy seeding that RandomState(n) itself performs
# (identical stream, asserted in tests) while skipping the
# constructor's discarded SeedSequence init (~140 us -> ~4 us).
_BASE_CACHE: dict = {}
_SYNTH_TLS = _threading.local()


def _synth_rng() -> np.random.RandomState:
    """Per-THREAD reusable RandomState (re-seeded per synth_image
    call): a single module-level instance would make the function
    non-reentrant — interleaved seed/draw from two threads (the
    engine already runs secondary driver threads) would silently
    cross noise streams."""
    rng = getattr(_SYNTH_TLS, "rng", None)
    if rng is None:
        rng = _SYNTH_TLS.rng = np.random.RandomState(0)
    return rng


def synth_image(image_id: str, w: int = 32, h: int = 32) -> np.ndarray:
    """Deterministic synthetic RGB image: one of four seed-keyed base
    patterns (gradient / stripes / checkerboard / radial) + seeded
    noise. Patterns make distinct images perceptually DISTANT (far
    phash) while same-pattern images stay NEAR (noise-only deltas) —
    so near-dup operators over this corpus have real selectivity
    instead of one all-pairs cluster (VERDICT r01: the 8-image fixture
    was entirely within hamming 3)."""
    seed = _seed_for(image_id)
    pat = (seed >> 8) % 4
    base = _BASE_CACHE.get((pat, w, h))
    if base is None:
        base = _synth_base(pat, w, h)
        _BASE_CACHE[(pat, w, h)] = base
    rng = _synth_rng()
    rng.seed(seed)
    noise = rng.randint(-16, 17, size=(h, w, 3))
    return (base + noise).clip(0, 255).astype(np.uint8)


def _synth_base(pat: int, w: int, h: int) -> np.ndarray:
    yy, xx = np.mgrid[0:h, 0:w]
    if pat == 0:  # diagonal gradient
        base = np.stack(
            [
                (xx * 255 // max(w - 1, 1)),
                (yy * 255 // max(h - 1, 1)),
                ((xx + yy) * 255 // max(w + h - 2, 1)),
            ],
            axis=2,
        ).astype(np.int32)
    elif pat == 1:  # horizontal stripes
        stripe = ((yy // max(h // 8, 1)) % 2) * 200 + 28
        base = np.stack([stripe, 255 - stripe, (xx * 255 // max(w - 1, 1))], axis=2).astype(
            np.int32
        )
    elif pat == 2:  # checkerboard
        check = (((yy // max(h // 8, 1)) + (xx // max(w // 8, 1))) % 2) * 220 + 18
        base = np.stack([check, check, 255 - check], axis=2).astype(np.int32)
    else:  # radial
        cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
        r = np.sqrt((yy - cy) ** 2 + (xx - cx) ** 2)
        rad = (r * 255 / max(r.max(), 1)).astype(np.int32)
        base = np.stack([rad, 255 - rad, (rad + 128) % 256], axis=2).astype(np.int32)
    return base


_CAPTION_WORDS = (
    "sunset", "harbor", "mountain", "forest", "city", "river", "bridge",
    "garden", "desert", "island", "meadow", "canyon", "glacier", "valley",
)


def caption_for(image_id: str) -> str:
    s = _seed_for(image_id)
    a = _CAPTION_WORDS[s % len(_CAPTION_WORDS)]
    b = _CAPTION_WORDS[(s // 7) % len(_CAPTION_WORDS)]
    return f"a photo of a {a} near a {b} ({image_id})"

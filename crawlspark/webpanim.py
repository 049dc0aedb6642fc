"""Animated WebP (VP8X + ANIM/ANMF container, VP8L frames) — closes
the top documented codec boundary (VERDICT r08 "what's missing" #1
listed animated webp alongside lossy VP8; the lossless-frame half is
expressible with the own VP8L codec, so it stops being a boundary).

Authored from the PUBLIC WebP Container Specification (the RIFF
layout published with RFC 9649's bitstream spec: VP8X flags, ANIM
background/loop, ANMF frame rect/duration/blend/dispose fields).
Reference parity target is the same payload invariant as the still
codecs (input_hint: decoded-pixel exactness for lossless payloads),
plus the video-sampling operator contract (reference scrape surface
has no video op; this is the training-data-pipeline family, SURVEY.md
§2C frame_sample).

Encoder (``encode_webp_anim``): frame 0 is the full canvas; with
``delta=True`` (default) every later frame stores only the bounding
rect of pixels that CHANGED vs the previous frame — the inter-frame
storage lever (ANMF x/y offsets are spec'd in units of 2, so the rect
is widened to even offsets). Each rect is a strictly-spec-compliant
VP8L stream via webpcodec.encode_webp, profile-routed per rect
(``profile="auto"`` by default — static-background sequences get the
lz77/palette win on exactly the rects where it pays). Frames are
written blend=do-not-blend / dispose=keep, so compositing is pure
rect overwrite and the decode of OUR files never needs an alpha
canvas.

Decoder (``decode_webp_anim``): walks VP8X -> ANIM -> ANMF*, decodes
each frame's VP8L stream and composites per the spec's blend/dispose
rules. Subset boundaries fail LOUDLY with the reason, never decode
wrong: lossy (VP8/ALPH) frames, and dispose-to-background or an
uncovered first canvas under a NON-OPAQUE background color (the
corpus is RGB-opaque; an opaque background composites exactly).
Opaque frames make blend=0 and blend=1 coincide, so both are
accepted.

Container tradeoff vs QVID (videocodec.py), documented for the
sampler: QVID is length-prefixed lossy frames — sampling SEEKS past
skipped frames without inflating them; animated webp is delta-coded —
every frame up to the last sampled index must be decoded (each rect
persists on the canvas), but the payload is lossless and
inter-frame-compressed. ``iter_frames_webp`` decodes nothing past the
last sampled frame. ops/multimodal.frame_sample sniffs both.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np

from .webpcodec import _decode_vp8l, encode_webp

__all__ = [
    "encode_webp_anim",
    "decode_webp_anim",
    "webp_anim_meta",
    "iter_frames_webp",
]

_MAX24 = (1 << 24) - 1


def _u24(v: int) -> bytes:
    return struct.pack("<I", v)[:3]


def _r24(b: bytes, off: int) -> int:
    return int.from_bytes(b[off : off + 3], "little")


# ------------------------------------------------------------- encoder


def encode_webp_anim(
    frames,
    durations=100,
    loop_count: int = 0,
    delta: bool = True,
    profile: str | None = "auto",
) -> bytes:
    """Uniform (h, w, 3) uint8 RGB frames -> animated lossless WebP.

    ``durations`` is one int (ms, applied to every frame) or a
    per-frame list; ``loop_count`` 0 = loop forever (spec). With
    ``delta`` each frame past the first stores only the changed
    bounding rect (identical consecutive frames store a 1x1 no-op
    rect — ANMF requires width/height >= 1); ``delta=False`` stores
    every frame full-canvas. ``profile`` is forwarded to
    webpcodec.encode_webp per rect (None = the pinned literal
    default, "auto" routes by rect stats)."""
    frames = [np.asarray(f) for f in frames]
    if not frames:
        raise ValueError("webp-anim: needs at least one frame")
    if frames[0].ndim != 3:
        raise ValueError("webp-anim: all frames must be one (h, w, 3) uint8 shape")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.ndim != 3 or f.shape != (h, w, 3) or f.dtype != np.uint8:
            raise ValueError(
                "webp-anim: all frames must be one (h, w, 3) uint8 shape"
            )
    if w - 1 > _MAX24 or h - 1 > _MAX24:
        raise ValueError("webp-anim: canvas exceeds 24-bit VP8X bounds")
    n = len(frames)
    if isinstance(durations, (int, np.integer)):
        durations = [int(durations)] * n
    durations = [int(d) for d in durations]
    if len(durations) != n:
        raise ValueError("webp-anim: len(durations) != len(frames)")
    if any(d < 0 or d > _MAX24 for d in durations):
        raise ValueError("webp-anim: duration out of 24-bit range")
    if not 0 <= int(loop_count) <= 0xFFFF:
        raise ValueError("webp-anim: loop_count out of 16-bit range")

    chunks = []
    # VP8X: flags byte (animation bit = 0x02), 24 reserved bits,
    # canvas (w-1, h-1) as 24-bit LE fields
    chunks.append(
        b"VP8X" + struct.pack("<I", 10)
        + bytes([0x02]) + b"\x00\x00\x00" + _u24(w - 1) + _u24(h - 1)
    )
    # ANIM: background color (BGRA — opaque black: compositing never
    # reads it for our dispose=keep frames, but a decoder that paints
    # the canvas first stays exact) + 16-bit loop count
    chunks.append(
        b"ANIM" + struct.pack("<I", 6)
        + bytes([0, 0, 0, 255]) + struct.pack("<H", int(loop_count))
    )
    prev = None
    for k, f in enumerate(frames):
        if not delta or prev is None:
            x0 = y0 = 0
            rect = f
        else:
            diff = np.any(f != prev, axis=2)
            ys, xs = np.nonzero(diff)
            if ys.size == 0:
                # nothing changed: a 1x1 rect re-writing its own pixel
                # is a no-op under dispose=keep/no-blend
                x0 = y0 = 0
                rect = f[:1, :1]
            else:
                # ANMF stores x/y divided by 2 — widen to even offsets
                y0 = int(ys.min()) & ~1
                x0 = int(xs.min()) & ~1
                rect = f[y0 : int(ys.max()) + 1, x0 : int(xs.max()) + 1]
        sub = encode_webp(np.ascontiguousarray(rect), profile=profile)
        vp8l = sub[12:]  # strip RIFF+size+WEBP: the VP8L chunk (even-padded)
        if vp8l[:4] != b"VP8L":  # pragma: no cover — encode_webp contract
            raise AssertionError("webp-anim: unexpected still-encoder layout")
        body = (
            _u24(x0 >> 1) + _u24(y0 >> 1)
            + _u24(rect.shape[1] - 1) + _u24(rect.shape[0] - 1)
            + _u24(durations[k])
            + bytes([0x02])  # 6 reserved bits, B=1 (no blend), D=0 (keep)
            + vp8l
        )
        # 16-byte header + even-padded subchunk: always even
        chunks.append(b"ANMF" + struct.pack("<I", len(body)) + body)
        prev = f
    riff = b"WEBP" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# ------------------------------------------------------------- decoder


def _walk_anim(data: bytes) -> tuple:
    """Container walk (no bitstream decode): returns (canvas_w,
    canvas_h, bg_bgra, loop_count, frames) where each frame dict
    carries x/y/w/h/dur/blend/dispose and the raw VP8L payload."""
    if len(data) < 30 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("webp-anim: not a RIFF/WEBP container")
    if data[12:16] != b"VP8X":
        raise ValueError("webp-anim: not an extended (VP8X) container")
    (vx_len,) = struct.unpack("<I", data[16:20])
    if vx_len != 10:
        raise ValueError("webp-anim: bad VP8X chunk length")
    if not data[20] & 0x02:
        raise ValueError("webp-anim: not animated — use decode_webp")
    cw = _r24(data, 24) + 1
    ch = _r24(data, 27) + 1
    off = 30
    bg = None
    loop = 0
    frames: list[dict] = []
    while off + 8 <= len(data):
        fc = data[off : off + 4]
        (sz,) = struct.unpack("<I", data[off + 4 : off + 8])
        body = data[off + 8 : off + 8 + sz]
        if len(body) < sz:
            raise ValueError(f"webp-anim: truncated {fc!r} chunk")
        if fc == b"ANIM":
            if sz != 6:
                raise ValueError("webp-anim: bad ANIM chunk length")
            bg = bytes(body[:4])
            (loop,) = struct.unpack("<H", body[4:6])
        elif fc == b"ANMF":
            if sz < 16:
                raise ValueError("webp-anim: bad ANMF chunk length")
            if bg is None:
                raise ValueError("webp-anim: ANMF before ANIM chunk")
            fr = {
                "x": _r24(body, 0) * 2,
                "y": _r24(body, 3) * 2,
                "w": _r24(body, 6) + 1,
                "h": _r24(body, 9) + 1,
                "dur": _r24(body, 12),
                "blend": (body[15] >> 1) & 1,
                "dispose": body[15] & 1,
                "payload": None,
            }
            soff = 16
            while soff + 8 <= sz:
                sfc = body[soff : soff + 4]
                (ssz,) = struct.unpack("<I", body[soff + 4 : soff + 8])
                sbody = body[soff + 8 : soff + 8 + ssz]
                if len(sbody) < ssz:
                    raise ValueError(f"webp-anim: truncated {sfc!r} frame chunk")
                if sfc == b"VP8L":
                    fr["payload"] = bytes(sbody)
                    break
                if sfc in (b"VP8 ", b"ALPH"):
                    raise NotImplementedError(
                        "webp-anim: lossy (VP8/ALPH) frame unsupported (VP8L only)"
                    )
                raise ValueError(f"webp-anim: unknown chunk {sfc!r} in ANMF")
            if fr["payload"] is None:
                raise ValueError("webp-anim: ANMF frame has no VP8L bitstream")
            if fr["x"] + fr["w"] > cw or fr["y"] + fr["h"] > ch:
                raise ValueError("webp-anim: frame rect outside canvas")
            frames.append(fr)
        elif fc in (b"ICCP", b"EXIF", b"XMP "):
            pass  # pixel-neutral metadata (same rule as _decode_vp8x)
        else:
            raise ValueError(f"webp-anim: unknown chunk {fc!r} in container")
        off += 8 + sz + (sz & 1)
    if bg is None:
        raise ValueError("webp-anim: missing ANIM chunk")
    if not frames:
        raise ValueError("webp-anim: no ANMF frames")
    return cw, ch, bg, loop, frames


def _composite(cw: int, ch: int, bg: bytes, frames: list[dict]) -> Iterator[np.ndarray]:
    """Yields the composited canvas after each frame (NOT a copy —
    callers snapshot). Opaque-RGB subset: blend=0 (alpha blend) and
    blend=1 (overwrite) coincide for opaque frames, which is all
    _decode_vp8l can return (it raises on non-opaque alpha); a
    non-opaque BACKGROUND is only reachable through dispose or an
    uncovered first canvas, and raises."""
    f0 = frames[0]
    needs_bg = any(fr["dispose"] for fr in frames) or not (
        f0["x"] == 0 and f0["y"] == 0 and f0["w"] == cw and f0["h"] == ch
    )
    if needs_bg and bg[3] != 255:
        raise NotImplementedError(
            "webp-anim: non-opaque background visible on canvas — outside "
            "the RGB-opaque subset"
        )
    bg_rgb = (bg[2], bg[1], bg[0])  # ANIM stores BGRA
    canvas = np.empty((ch, cw, 3), np.uint8)
    canvas[:] = bg_rgb
    for fr in frames:
        arr = _decode_vp8l(fr["payload"])
        if arr.shape[:2] != (fr["h"], fr["w"]):
            raise ValueError("webp-anim: ANMF rect does not match VP8L size")
        canvas[fr["y"] : fr["y"] + fr["h"], fr["x"] : fr["x"] + fr["w"]] = arr
        yield canvas
        if fr["dispose"]:
            canvas[fr["y"] : fr["y"] + fr["h"], fr["x"] : fr["x"] + fr["w"]] = bg_rgb


def decode_webp_anim(data: bytes) -> tuple[np.ndarray, list[int], int]:
    """Animated WebP -> ((n, h, w, 3) uint8 composited frames,
    per-frame durations in ms, loop count). Exact inverse of
    encode_webp_anim (lossless frames, overwrite compositing)."""
    cw, ch, bg, loop, frames = _walk_anim(data)
    out = np.empty((len(frames), ch, cw, 3), np.uint8)
    for i, canvas in enumerate(_composite(cw, ch, bg, frames)):
        out[i] = canvas
    return out, [fr["dur"] for fr in frames], loop


def webp_anim_meta(data: bytes) -> dict:
    """Header-walk metadata — no bitstream decode: dict with
    n_frames, w, h, loop_count, durations, and per-frame rects."""
    cw, ch, bg, loop, frames = _walk_anim(data)
    return {
        "n_frames": len(frames),
        "w": cw,
        "h": ch,
        "loop_count": loop,
        "durations": [fr["dur"] for fr in frames],
        "rects": [(fr["x"], fr["y"], fr["w"], fr["h"]) for fr in frames],
    }


def iter_frames_webp(data: bytes, every_n: int = 1) -> Iterator[tuple[int, np.ndarray]]:
    """(frame_idx, composited frame) for every ``every_n``-th frame.

    Delta frames persist on the canvas, so every frame UP TO the last
    sampled index must be decoded (the container tradeoff vs QVID's
    seekable length-prefixed frames — module docstring); frames PAST
    the last sampled index are never decoded."""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    cw, ch, bg, loop, frames = _walk_anim(data)
    last = ((len(frames) - 1) // every_n) * every_n
    for i, canvas in enumerate(_composite(cw, ch, bg, frames)):
        if i % every_n == 0:
            yield i, canvas.copy()
        if i >= last:
            break

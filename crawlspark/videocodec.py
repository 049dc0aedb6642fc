"""QVID — a deterministic toy video container on the own-codec
pattern (imagecodec.py's qjpg precedent; VERDICT r03 #8: the sandbox
has no video codec libraries, so frame_sample gets a REAL decode path
against a container we define, instead of a stub).

Layout (little-endian):

    b"QVID1" | uint16 n_frames | uint16 w | uint16 h |
    n_frames x ( uint32 payload_len | qjpg payload )

Frames are stored as imagecodec.encode_qjpg payloads (deterministic
lossy quantization), so the codec exercises the same decoded-pixel
fidelity contract as the image path (input_hint PSNR clause). The
per-frame length prefix makes frame SEEKING a byte-slice walk: the
sampler never inflates the frames it skips — the property that matters
when a 100 TB corpus samples 1 frame in 30.

All functions are pure (bytes -> values) so the Spark operator
(ops/multimodal.frame_sample), the committed ground-truth fixture
(scripts/make_fixtures.py) and the tests share one implementation.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np

from . import imagecodec

__all__ = [
    "MAGIC", "encode_qvid", "decode_qvid", "video_meta", "iter_frames",
    "synth_video",
]

MAGIC = b"QVID1"
_HDR = struct.Struct("<HHH")
_LEN = struct.Struct("<I")


def encode_qvid(frames: list[np.ndarray]) -> bytes:
    """Container from uniform (h, w, 3) uint8 frames."""
    if not frames:
        raise ValueError("QVID needs at least one frame")
    h, w, _ = frames[0].shape
    parts = [MAGIC, _HDR.pack(len(frames), w, h)]
    for f in frames:
        if f.shape != (h, w, 3):
            raise ValueError("all QVID frames must share one shape")
        payload = imagecodec.encode_qjpg(f)
        parts.append(_LEN.pack(len(payload)))
        parts.append(payload)
    return b"".join(parts)


def video_meta(data: bytes) -> tuple[int, int, int]:
    """(n_frames, w, h) from the header alone — no frame decode."""
    if data[: len(MAGIC)] != MAGIC:
        raise ValueError("not a QVID container")
    return _HDR.unpack(data[len(MAGIC) : len(MAGIC) + _HDR.size])


def iter_frames(data: bytes, every_n: int = 1) -> Iterator[tuple[int, np.ndarray]]:
    """Yield (frame_idx, rgb array) for frames with idx % every_n == 0.
    Skipped frames are SEEKED past by their length prefix, never
    inflated — sampling cost scales with frames kept, not stored."""
    n_frames, _w, _h = video_meta(data)
    off = len(MAGIC) + _HDR.size
    for idx in range(n_frames):
        (plen,) = _LEN.unpack(data[off : off + _LEN.size])
        off += _LEN.size
        if idx % every_n == 0:
            yield idx, imagecodec.decode_qjpg(data[off : off + plen])
        off += plen


def decode_qvid(data: bytes) -> list[np.ndarray]:
    return [f for _, f in iter_frames(data, 1)]


def synth_video(video_id: str, n_frames: int = 12, w: int = 16, h: int = 16) -> list[np.ndarray]:
    """Deterministic synthetic clip: frame k is the seed-keyed synth
    image of f"{video_id}/f{k}" — consecutive frames differ (distinct
    seeds) but the id scheme is reproducible everywhere."""
    return [imagecodec.synth_image(f"{video_id}/f{k}", w, h) for k in range(n_frames)]

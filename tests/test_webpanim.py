"""Animated WebP container (crawlspark/webpanim.py): exact roundtrip,
delta-rect storage, spec-field parity on hand-built streams
(blend/dispose/background — the container rules the encoder never
emits itself), sampling-iterator decode bounds, and the loud subset
boundaries (lossy frames, non-opaque visible background)."""

import struct

import numpy as np
import pytest

from crawlspark import webpanim as WA
from crawlspark.webpcodec import decode_webp, encode_webp


def _frames(n=5, h=14, w=22, seed=3):
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n)]


def _static_frames(n=6, h=20, w=32, seed=4):
    """Mostly-static sequence: one moving 3x4 patch on a fixed bg."""
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    out = []
    for k in range(n):
        f = base.copy()
        f[2 + k : 5 + k, 3 + k : 7 + k] = (k * 40 + 10) % 256
        out.append(f)
    return out


# ---------------------------------------------------------------- roundtrip


@pytest.mark.parametrize("delta", [True, False])
def test_roundtrip_exact(delta):
    frames = _frames()
    durs = [10, 20, 30, 40, 50]
    blob = WA.encode_webp_anim(frames, durations=durs, loop_count=7, delta=delta)
    out, odurs, loop = WA.decode_webp_anim(blob)
    assert out.shape == (5, 14, 22, 3)
    np.testing.assert_array_equal(out, np.stack(frames))
    assert odurs == durs and loop == 7


def test_scalar_duration_and_static_tail():
    frames = _static_frames()
    frames.append(frames[-1].copy())  # identical consecutive frame
    blob = WA.encode_webp_anim(frames, durations=100)
    out, durs, loop = WA.decode_webp_anim(blob)
    np.testing.assert_array_equal(out, np.stack(frames))
    assert durs == [100] * len(frames) and loop == 0


def test_delta_is_smaller_on_static_sequences():
    frames = _static_frames(n=8)
    d = WA.encode_webp_anim(frames, delta=True)
    full = WA.encode_webp_anim(frames, delta=False)
    assert len(d) < len(full) / 2, (len(d), len(full))
    np.testing.assert_array_equal(
        WA.decode_webp_anim(d)[0], WA.decode_webp_anim(full)[0]
    )


def test_odd_offset_rect_widens_to_even():
    """ANMF offsets are stored /2: a change at odd (y, x) must still
    roundtrip exactly (the rect widens left/up by one)."""
    a = np.zeros((9, 9, 3), np.uint8)
    b = a.copy()
    b[3, 5] = (200, 100, 50)
    blob = WA.encode_webp_anim([a, b], delta=True)
    meta = WA.webp_anim_meta(blob)
    x, y, w, h = meta["rects"][1]
    assert x % 2 == 0 and y % 2 == 0
    assert (x, y, w, h) == (4, 2, 2, 2)
    np.testing.assert_array_equal(WA.decode_webp_anim(blob)[0][1], b)


def test_meta_walks_headers_without_decoding(monkeypatch):
    frames = _frames(n=4)
    blob = WA.encode_webp_anim(frames, durations=[1, 2, 3, 4], loop_count=2)
    monkeypatch.setattr(
        WA, "_decode_vp8l", lambda *_: (_ for _ in ()).throw(AssertionError)
    )
    meta = WA.webp_anim_meta(blob)
    assert meta["n_frames"] == 4 and (meta["w"], meta["h"]) == (22, 14)
    assert meta["durations"] == [1, 2, 3, 4] and meta["loop_count"] == 2
    assert meta["rects"][0] == (0, 0, 22, 14)


def test_iter_frames_samples_and_stops_early(monkeypatch):
    frames = _static_frames(n=10)
    blob = WA.encode_webp_anim(frames)
    calls = []
    real = WA._decode_vp8l
    monkeypatch.setattr(
        WA, "_decode_vp8l", lambda p: calls.append(1) or real(p)
    )
    got = dict(WA.iter_frames_webp(blob, every_n=4))
    assert sorted(got) == [0, 4, 8]
    for i in (0, 4, 8):
        np.testing.assert_array_equal(got[i], frames[i])
    # frames 9 (past the last sampled index 8) never decoded
    assert len(calls) == 9


def test_iter_frames_every_n_validation():
    blob = WA.encode_webp_anim(_frames(n=2))
    with pytest.raises(ValueError, match="every_n"):
        list(WA.iter_frames_webp(blob, every_n=0))


# ------------------------------------------------------- hand-built streams


def _u24(v):
    return struct.pack("<I", v)[:3]


def _anmf(x, y, arr, dur=10, blend=1, dispose=0):
    """Hand-built ANMF chunk around a still-encoder VP8L stream —
    independent of encode_webp_anim's layout code."""
    vp8l = encode_webp(arr)[12:]
    body = (
        _u24(x >> 1) + _u24(y >> 1)
        + _u24(arr.shape[1] - 1) + _u24(arr.shape[0] - 1)
        + _u24(dur) + bytes([(blend << 1) | dispose]) + vp8l
    )
    return b"ANMF" + struct.pack("<I", len(body)) + body


def _container(cw, ch, anmfs, bg=(0, 0, 0, 255), loop=0, animated=True):
    chunks = (
        b"VP8X" + struct.pack("<I", 10)
        + bytes([0x02 if animated else 0]) + b"\x00\x00\x00"
        + _u24(cw - 1) + _u24(ch - 1)
        + b"ANIM" + struct.pack("<I", 6) + bytes(bg) + struct.pack("<H", loop)
        + b"".join(anmfs)
    )
    riff = b"WEBP" + chunks
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def test_dispose_to_background_composites_exactly():
    """Frame 1 disposes its rect to the (opaque) background; frame 2
    paints elsewhere — the dispose must show through in frame 2."""
    rng = np.random.default_rng(9)
    f0 = rng.integers(0, 256, (8, 12, 3), dtype=np.uint8)
    patch = rng.integers(0, 256, (4, 4, 3), dtype=np.uint8)
    patch2 = rng.integers(0, 256, (2, 2, 3), dtype=np.uint8)
    bg = (10, 20, 30, 255)  # BGRA -> RGB (30, 20, 10)
    blob = _container(
        12, 8,
        [
            _anmf(0, 0, f0),
            _anmf(2, 2, patch, dispose=1),
            _anmf(8, 0, patch2),
        ],
        bg=bg,
    )
    out, durs, loop = WA.decode_webp_anim(blob)
    exp0 = f0
    exp1 = f0.copy()
    exp1[2:6, 2:6] = patch
    exp2 = f0.copy()
    exp2[2:6, 2:6] = (30, 20, 10)  # disposed rect shows background RGB
    exp2[0:2, 8:10] = patch2
    np.testing.assert_array_equal(out[0], exp0)
    np.testing.assert_array_equal(out[1], exp1)
    np.testing.assert_array_equal(out[2], exp2)


def test_blend_zero_accepted_for_opaque_frames():
    f0, f1 = _frames(n=2)
    blob = _container(22, 14, [_anmf(0, 0, f0), _anmf(0, 0, f1, blend=0)])
    np.testing.assert_array_equal(
        WA.decode_webp_anim(blob)[0], np.stack([f0, f1])
    )


def test_uncovered_first_frame_over_opaque_background():
    patch = np.full((2, 2, 3), 77, np.uint8)
    blob = _container(6, 4, [_anmf(2, 2, patch)], bg=(1, 2, 3, 255))
    out, _, _ = WA.decode_webp_anim(blob)
    exp = np.empty((4, 6, 3), np.uint8)
    exp[:] = (3, 2, 1)
    exp[2:4, 2:4] = 77
    np.testing.assert_array_equal(out[0], exp)


def test_transparent_visible_background_raises():
    patch = np.full((2, 2, 3), 77, np.uint8)
    full = np.full((4, 6, 3), 9, np.uint8)
    # uncovered first canvas
    with pytest.raises(NotImplementedError, match="non-opaque background"):
        WA.decode_webp_anim(
            _container(6, 4, [_anmf(2, 2, patch)], bg=(0, 0, 0, 0))
        )
    # dispose-to-transparent
    with pytest.raises(NotImplementedError, match="non-opaque background"):
        WA.decode_webp_anim(
            _container(
                6, 4,
                [_anmf(0, 0, full, dispose=1), _anmf(2, 2, patch)],
                bg=(0, 0, 0, 128),
            )
        )
    # covered first canvas, no dispose: transparent bg never visible
    blob = _container(
        6, 4, [_anmf(0, 0, full), _anmf(2, 2, patch)], bg=(0, 0, 0, 0)
    )
    assert WA.decode_webp_anim(blob)[0].shape == (2, 4, 6, 3)


# ---------------------------------------------------------------- boundaries


def test_lossy_frame_raises():
    body = _u24(0) + _u24(0) + _u24(3) + _u24(3) + _u24(10) + bytes([2])
    body += b"VP8 " + struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    anmf = b"ANMF" + struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError, match="lossy"):
        WA.decode_webp_anim(_container(4, 4, [anmf]))


def test_container_error_paths():
    f = _frames(n=1)[0]
    blob = WA.encode_webp_anim([f])
    with pytest.raises(ValueError, match="not a RIFF"):
        WA.decode_webp_anim(b"JUNK" + blob[4:])
    with pytest.raises(ValueError, match="not an extended"):
        WA.decode_webp_anim(encode_webp(f))
    with pytest.raises(ValueError, match="not animated"):
        WA.decode_webp_anim(_container(22, 14, [_anmf(0, 0, f)], animated=False))
    # ANMF rect outside canvas
    with pytest.raises(ValueError, match="outside canvas"):
        WA.decode_webp_anim(_container(10, 10, [_anmf(0, 0, f)]))
    # truncated ANMF chunk
    with pytest.raises(ValueError, match="truncated"):
        WA.decode_webp_anim(blob[:-6])
    # ANMF size does not match the VP8L stream's coded size
    wrong = _anmf(0, 0, f)
    patched = bytearray(wrong)
    patched[8 + 6 : 8 + 9] = _u24(f.shape[1] - 2)  # lie about width
    with pytest.raises(ValueError, match="does not match"):
        WA.decode_webp_anim(_container(22, 14, [bytes(patched)]))


def test_anmf_before_anim_raises():
    f = np.zeros((2, 2, 3), np.uint8)
    anmf = _anmf(0, 0, f)
    chunks = (
        b"VP8X" + struct.pack("<I", 10)
        + bytes([0x02]) + b"\x00\x00\x00" + _u24(1) + _u24(1)
        + anmf
    )
    riff = b"WEBP" + chunks
    with pytest.raises(ValueError, match="before ANIM"):
        WA.decode_webp_anim(b"RIFF" + struct.pack("<I", len(riff)) + riff)


def test_encoder_validation():
    f = _frames(n=2)
    with pytest.raises(ValueError, match="at least one"):
        WA.encode_webp_anim([])
    with pytest.raises(ValueError, match="one .* shape"):
        WA.encode_webp_anim([f[0], f[1][:, :4]])
    with pytest.raises(ValueError, match="durations"):
        WA.encode_webp_anim(f, durations=[1])
    with pytest.raises(ValueError, match="24-bit"):
        WA.encode_webp_anim(f, durations=1 << 24)
    with pytest.raises(ValueError, match="loop_count"):
        WA.encode_webp_anim(f, loop_count=1 << 16)


def test_still_decoder_points_to_anim():
    blob = WA.encode_webp_anim(_frames(n=2))
    with pytest.raises(NotImplementedError, match="decode_webp_anim"):
        decode_webp(blob)


def test_anim_decoder_fuzz_raises_cleanly():
    """decode_webp_anim / webp_anim_meta on arbitrary garbage and on
    bit-flipped valid files must raise ValueError/NotImplementedError
    — never IndexError, KeyError, struct.error, or a silent wrong
    shape (the same clean-failure contract as decode_webp,
    test_webpcodec.test_decoder_fuzz_raises_cleanly)."""
    rng = np.random.default_rng(4321)
    ok_kinds = (ValueError, NotImplementedError)
    for _ in range(200):
        n = int(rng.integers(0, 200))
        blob = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        try:
            WA.decode_webp_anim(blob)
        except ok_kinds:
            pass
    good = WA.encode_webp_anim(_static_frames(n=4, h=9, w=13))
    nf, ch, cw = 4, 9, 13
    for _ in range(300):
        b = bytearray(good)
        for _ in range(int(rng.integers(1, 4))):
            b[int(rng.integers(0, len(b)))] ^= 1 << int(rng.integers(0, 8))
        try:
            out, durs, _loop = WA.decode_webp_anim(bytes(b))
            # a surviving decode may show different pixels (payload
            # bits flipped = a different image) but never a broken
            # shape/dtype
            assert out.dtype == np.uint8 and out.ndim == 4 and out.shape[3] == 3
            assert len(durs) == out.shape[0]
        except ok_kinds:
            pass
        try:
            meta = WA.webp_anim_meta(bytes(b))
            assert meta["n_frames"] >= 1
        except ok_kinds:
            pass

"""VP8L (lossless WebP) codec tests — r06, VERDICT r05 #6.

Own-encoder streams roundtrip EXACTLY (lossless); decoder-only spec
features the encoder never emits (color cache, 1D LZ77, subtract-
green, RLE code lengths, max_symbol cutoff) are exercised with
hand-built spec-conformant streams; out-of-subset constructs fail
loudly with their reason. Spec: RFC 9649 (public)."""

import numpy as np
import pytest

from crawlspark import imagecodec
from crawlspark import webpcodec as W
from crawlspark.webpcodec import decode_webp, encode_webp


def test_roundtrip_synth_corpus_exact():
    for i in range(1, 9):
        a = imagecodec.synth_image(f"img-{i:04d}", 24, 16)
        assert np.array_equal(decode_webp(encode_webp(a)), a)


def test_roundtrip_edge_shapes_exact():
    rng = np.random.RandomState(7)
    imgs = [
        np.zeros((1, 1, 3), np.uint8),
        np.full((3, 5, 3), 255, np.uint8),
        rng.randint(0, 256, (16, 16, 3)).astype(np.uint8),
        rng.randint(0, 2, (8, 8, 3)).astype(np.uint8) * 255,
        np.tile(np.arange(256, dtype=np.uint8).reshape(16, 16, 1), (1, 1, 3)),
    ]
    # channel-constant mixes: single-symbol prefix codes read 0 bits —
    # the writer must emit 0 bits too (the one real encode/decode
    # asymmetry hazard, caught in development by exactly this shape)
    m = rng.randint(0, 256, (12, 9, 3)).astype(np.uint8)
    m[:, :, 0] = 7
    imgs.append(m)
    for a in imgs:
        assert np.array_equal(decode_webp(encode_webp(a)), a)


def test_roundtrip_hypothesis_exact():
    """Property: ANY (h, w, 3) uint8 array roundtrips exactly
    (lossless), with hypothesis shrinking on failure."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from hypothesis.extra import numpy as hnp

    @settings(max_examples=120, deadline=None)
    @given(
        hnp.arrays(
            dtype=np.uint8,
            shape=st.tuples(
                st.integers(1, 10), st.integers(1, 10), st.just(3)
            ),
        )
    )
    def prop(a):
        assert np.array_equal(decode_webp(encode_webp(a)), a)

    prop()


def test_roundtrip_fuzz_exact():
    rng = np.random.RandomState(99)
    for _ in range(150):
        h, w = rng.randint(1, 33), rng.randint(1, 33)
        card = rng.choice([2, 3, 8, 256])
        vals = rng.randint(0, 256, card)
        a = vals[rng.randint(0, card, (h, w, 3))].astype(np.uint8)
        if rng.rand() < 0.3:
            a[:, :, rng.randint(0, 3)] = rng.randint(0, 256)
        assert np.array_equal(decode_webp(encode_webp(a)), a)


# ---------------------------------------------------- foreign streams


def _container(bw: W._BitWriter) -> bytes:
    import struct

    payload = b"\x2f" + bw.bytes()
    chunk = payload + (b"\x00" if len(payload) & 1 else b"")
    riff = b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _header(bw: W._BitWriter, w: int, h: int):
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)


def _write_simple_code(bw: W._BitWriter, symbols):
    assert all(s <= 255 for s in symbols)  # simple codes are 8-bit
    bw.write(1, 1)
    bw.write(len(symbols) - 1, 1)
    if symbols[0] <= 1:
        bw.write(0, 1)
        bw.write(symbols[0], 1)
    else:
        bw.write(1, 1)
        bw.write(symbols[0], 8)
    if len(symbols) == 2:
        bw.write(symbols[1], 8)


def _write_normal_two(bw: W._BitWriter, alphabet_size: int, sym_a: int, sym_b: int):
    """Normal-form prefix code with two length-1 symbols (needed when
    a symbol exceeds the simple form's 8-bit field, e.g. length
    prefixes / cache indexes in the green alphabet). cl code: lengths
    {0,1} both at cl-length 1 -> canonical 0->'0', 1->'1'; alphabet
    lengths then stream as one bit per symbol."""
    assert sym_a < sym_b < alphabet_size
    bw.write(0, 1)  # normal
    bw.write(15, 4)  # num_code_lengths = 19
    cl = {0: 1, 1: 1}
    for sym in W._CL_ORDER:
        bw.write(cl.get(sym, 0), 3)
    bw.write(0, 1)  # no max_symbol
    for s in range(alphabet_size):
        bw.write_code(1 if s in (sym_a, sym_b) else 0, 1)


def test_decoder_lz77_1d():
    """Foreign-stream LZ77: a literal pixel then a 1D backref (plane
    code 121 -> distance 1) copying 3 pixels — a 2x3 solid image.
    Distance prefix 13: extra=(13-2)>>1=5, offset=(2+1)<<5=96,
    value = 96 + rb(5) + 1; rb=24 -> dist_code 121 -> dist 1."""
    bw = W._BitWriter()
    _header(bw, 3, 2)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta prefix
    # green: literal 10 + length-prefix symbol 258 (prefix 2 -> len 3)
    _write_normal_two(bw, 256 + 24, 10, 256 + 2)
    _write_simple_code(bw, [20])  # red
    _write_simple_code(bw, [30])  # blue
    _write_simple_code(bw, [255])  # alpha
    _write_simple_code(bw, [13])  # distance prefix 13
    bw.write(0, 1)  # literal pixel (green code '0' -> 10)
    bw.write(1, 1)  # green code '1' -> len prefix 2 => length 3
    bw.write(24, 5)  # distance extra -> dist_code 121 -> dist 1
    # 4 pixels emitted (1 + 3); 2 more literals fill the 2x3 image
    bw.write(0, 1)
    bw.write(0, 1)
    out = decode_webp(_container(bw))
    assert out.shape == (2, 3, 3)
    assert np.all(out == np.array([20, 10, 30], np.uint8))


def test_decoder_color_cache_hit():
    """Literal pixel inserted into the cache, then referenced by its
    cache index. cache_bits=1: (0x1e35a7bd * ARGB) >> 31."""
    r, g, b, a = 20, 10, 30, 255
    argb = (a << 24) | (r << 16) | (g << 8) | b
    idx = ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> 31
    bw = W._BitWriter()
    _header(bw, 2, 1)
    bw.write(0, 1)
    bw.write(1, 1)  # cache on
    bw.write(1, 4)  # cache_bits=1 -> 2 entries
    bw.write(0, 1)
    cache_sym = 256 + 24 + idx
    _write_normal_two(bw, 256 + 24 + 2, g, cache_sym)
    _write_simple_code(bw, [r])
    _write_simple_code(bw, [b])
    _write_simple_code(bw, [a])
    _write_simple_code(bw, [0])  # distance (unused)
    bw.write(0, 1)  # literal (code '0' -> g, the smaller symbol)
    bw.write(1, 1)  # cache hit (code '1' -> cache_sym)
    out = decode_webp(_container(bw))
    assert np.all(out == np.array([r, g, b], np.uint8))


def test_decoder_subtract_green():
    """subtract-green transform inverse: stored (r-g, g, b-g)."""
    bw = W._BitWriter()
    _header(bw, 1, 1)
    bw.write(1, 1)  # a transform
    bw.write(2, 2)  # SUBTRACT_GREEN
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    g, r, b = 100, 150, 50
    _write_simple_code(bw, [g])
    _write_simple_code(bw, [(r - g) & 255])
    _write_simple_code(bw, [(b - g) & 255])
    _write_simple_code(bw, [255])
    _write_simple_code(bw, [0])
    out = decode_webp(_container(bw))
    assert np.all(out[0, 0] == (r, g, b))


def test_decoder_rle_code_lengths_and_max_symbol():
    """Normal prefix code written with RLE 17/18 zero-runs and the
    max_symbol cutoff — decoder-side features our encoder never
    emits. Alphabet: green with symbols {0: len 1, 1: len 1}."""
    bw = W._BitWriter()
    _header(bw, 2, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    # green: NORMAL code. cl-code: symbols {1} at len 1... a cl code
    # needs >=1 symbols; use cl lengths: sym1 -> 1 bit? single-symbol
    # cl code reads 0 bits; then RLE cannot be coded. Use 2 cl
    # symbols: {1, 18} each len 1.
    bw.write(0, 1)  # normal
    bw.write(15, 4)  # num_code_lengths = 19
    cl = {1: 1, 18: 1}
    for sym in W._CL_ORDER:
        bw.write(cl.get(sym, 0), 3)
    bw.write(1, 1)  # use max_symbol
    bw.write(0, 3)  # length_nbits = 2
    bw.write(1, 2)  # max_symbol = 2 + 1 = 3 code reads max
    # cl codes: canonical over {1:len1, 18:len1} -> 1->code0, 18->code1
    bw.write_code(0, 1)  # symbol 0: len 1
    bw.write_code(0, 1)  # symbol 1: len 1
    # remaining 278 lengths implicitly 0 via max_symbol exhaustion:
    # write one 18-run to show RLE works too
    bw.write_code(1, 1)  # cl 18: zero-run
    bw.write(100, 7)  # 11+100 = 111 zeros
    # (max_symbol hits 0 after this read; rest zeros)
    _write_simple_code(bw, [5])  # red
    _write_simple_code(bw, [6])  # blue
    _write_simple_code(bw, [255])  # alpha
    _write_simple_code(bw, [0])  # distance
    bw.write(0, 1)  # pixel 0: green 0
    bw.write(1, 1)  # pixel 1: green 1
    out = decode_webp(_container(bw))
    assert out.shape == (1, 2, 3)
    assert out[0, 0, 1] == 0 and out[0, 1, 1] == 1
    assert np.all(out[:, :, 0] == 5) and np.all(out[:, :, 2] == 6)


# -------------------------------------------------------- rejections


def test_rejects_out_of_subset_loudly():
    a = imagecodec.synth_image("img-0001", 8, 8)
    good = encode_webp(a)
    with pytest.raises(ValueError):
        decode_webp(b"RIFX" + good[4:])
    with pytest.raises(NotImplementedError, match="lossy VP8"):
        decode_webp(good[:12] + b"VP8 " + good[16:])
    # fourcc says VP8X but the chunk length is the VP8L one, not 10
    with pytest.raises(ValueError, match="VP8X chunk length"):
        decode_webp(good[:12] + b"VP8X" + good[16:])
    # predictor transform
    for ttype, msg in ((0, "predictor"), (1, "cross-color"), (3, "color-indexing")):
        bw = W._BitWriter()
        _header(bw, 1, 1)
        bw.write(1, 1)
        bw.write(ttype, 2)
        with pytest.raises(NotImplementedError, match=msg):
            decode_webp(_container(bw))
    # meta prefix codes
    bw = W._BitWriter()
    _header(bw, 1, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(1, 1)  # meta prefix ON
    with pytest.raises(NotImplementedError, match="meta prefix"):
        decode_webp(_container(bw))
    # 2D distance plane codes
    bw = W._BitWriter()
    _header(bw, 2, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    _write_normal_two(bw, 256 + 24, 10, 256 + 0)  # len prefix 0 -> length 1
    _write_simple_code(bw, [20])
    _write_simple_code(bw, [30])
    _write_simple_code(bw, [255])
    _write_simple_code(bw, [0])  # distance prefix 0 -> dist_code 1 (2D)
    bw.write(0, 1)  # literal
    bw.write(1, 1)  # backref len 1
    with pytest.raises(NotImplementedError, match="plane codes"):
        decode_webp(_container(bw))


def test_imagecodec_dispatch_and_fixture_slice():
    """fmt='webp' flows through imagecodec.encode/decode, and the
    make_images webp slice (fixtures corpus) decodes exactly."""
    from crawlspark import testkit

    a = imagecodec.synth_image("img-0002", 24, 16)
    assert np.array_equal(imagecodec.decode(imagecodec.encode(a, "webp"), "webp"), a)
    images = testkit.make_images(24, jpeg_every=3, webp_every=4)
    webp_rows = images[images["fmt"] == "webp"]
    assert len(webp_rows) >= 4
    for r in webp_rows.itertuples(index=False):
        truth = imagecodec.synth_image(r.image_id, r.w, r.h)
        assert np.array_equal(imagecodec.decode(bytes(r.bytes), "webp"), truth)


def test_fast_path_equals_reference_loop(monkeypatch):
    """The vectorized literal decoder must be BIT-identical to the
    per-pixel reference loop on every own-encodable shape, including
    the channel-constant images that regress single-symbol handling
    and 1-pixel/1-row extremes (FAST_LITERAL toggles the path)."""
    rng = np.random.default_rng(77)
    shapes = [(1, 1), (1, 17), (23, 1), (5, 7), (16, 16), (3, 64)]
    imgs = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for h, w in shapes]
    imgs.append(np.full((9, 9, 3), 200, np.uint8))  # channel-constant
    solid = np.zeros((4, 4, 3), np.uint8)
    solid[..., 1] = 255
    imgs.append(solid)
    for arr in imgs:
        for sg in (True, False):
            blob = encode_webp(arr, subtract_green=sg)
            monkeypatch.setattr(W, "FAST_LITERAL", True)
            fast = decode_webp(blob)
            monkeypatch.setattr(W, "FAST_LITERAL", False)
            slow = decode_webp(blob)
            assert np.array_equal(fast, slow)
            assert np.array_equal(fast, arr)


def test_fast_path_engages_and_rejects_truncation(monkeypatch):
    """Own-encoded files actually take the vectorized path, and a
    truncated stream raises there just like the bit-reader does."""
    calls = []
    orig = W._literal_decode_fast

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(W, "_literal_decode_fast", spy)
    arr = np.random.default_rng(3).integers(0, 256, (12, 12, 3), dtype=np.uint8)
    blob = encode_webp(arr)
    assert np.array_equal(decode_webp(blob), arr)
    assert calls, "fast path did not engage on an own-encoded file"
    import struct

    cut = len(blob) - 12
    truncated = blob[:20] + blob[20:cut]
    # keep the VP8L chunk length honest about the cut so the chunk
    # check doesn't fire first
    truncated = (
        truncated[:16] + struct.pack("<I", cut - 20) + truncated[20:]
    )
    with pytest.raises(ValueError, match="truncated"):
        decode_webp(truncated)
    monkeypatch.setattr(W, "FAST_LITERAL", False)
    with pytest.raises(ValueError, match="truncated"):
        decode_webp(truncated)


def test_alpha_channel_rejected_loudly(monkeypatch):
    """A conformant stream carrying non-opaque alpha must raise, not
    silently drop the channel (ADVICE r06) — on both decode paths."""
    for fast in (True, False):
        monkeypatch.setattr(W, "FAST_LITERAL", fast)
        bw = W._BitWriter()
        _header(bw, 2, 2)
        bw.write(0, 1)  # no transforms
        bw.write(0, 1)  # no cache
        bw.write(0, 1)  # no meta prefix
        _write_simple_code(bw, [10])  # green
        _write_simple_code(bw, [20])  # red
        _write_simple_code(bw, [30])  # blue
        _write_simple_code(bw, [128])  # alpha: constant but NOT opaque
        _write_simple_code(bw, [0])  # distance (unused)
        with pytest.raises(NotImplementedError, match="alpha"):
            decode_webp(_container(bw))


def test_simple_code_symbol_out_of_alphabet_rejected():
    """A corrupt simple code declaring symbol 200 in the 40-symbol
    distance alphabet must fail at parse time (ADVICE r06), not via a
    garbage distance far downstream."""
    bw = W._BitWriter()
    _header(bw, 1, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    bw.write(0, 1)
    _write_simple_code(bw, [10])
    _write_simple_code(bw, [20])
    _write_simple_code(bw, [30])
    _write_simple_code(bw, [255])
    _write_simple_code(bw, [200])  # distance alphabet is 40 symbols
    with pytest.raises(ValueError, match="out of range"):
        decode_webp(_container(bw))


# ------------------------------------------------------ VP8X container


def _vp8x_wrap(blob: bytes, canvas_w: int, canvas_h: int,
               flags: int = 0, pre_chunks: bytes = b"") -> bytes:
    """Rewrap a simple-format VP8L file as an extended (VP8X) still."""
    import struct

    vp8l = blob[12:]  # fourcc + length + payload (+ even pad)
    vx = (b"VP8X" + struct.pack("<I", 10) + bytes([flags]) + b"\x00\x00\x00"
          + (canvas_w - 1).to_bytes(3, "little")
          + (canvas_h - 1).to_bytes(3, "little"))
    body = b"WEBP" + vx + pre_chunks + vp8l
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_vp8x_wrapped_vp8l_decodes():
    """An extended-format still image with a VP8L bitstream is a
    conformant file shape (RFC 9649 section 2.5) — decode it, on both
    decode paths, with and without pixel-neutral metadata chunks."""
    import struct

    rng = np.random.default_rng(42)
    arr = rng.integers(0, 256, (11, 7, 3), dtype=np.uint8)
    blob = encode_webp(arr)
    iccp = b"ICCP" + struct.pack("<I", 3) + b"abc" + b"\x00"  # odd: padded
    xmp = b"XMP " + struct.pack("<I", 4) + b"meta"
    for pre in (b"", iccp, iccp + xmp):
        wrapped = _vp8x_wrap(blob, 7, 11, pre_chunks=pre)
        assert np.array_equal(decode_webp(wrapped), arr)
    # reference loop path too
    orig = W.FAST_LITERAL
    try:
        W.FAST_LITERAL = False
        assert np.array_equal(decode_webp(_vp8x_wrap(blob, 7, 11)), arr)
    finally:
        W.FAST_LITERAL = orig


def test_vp8x_out_of_subset_rejections():
    import struct

    arr = np.full((4, 4, 3), 9, np.uint8)
    blob = encode_webp(arr)
    # canvas/bitstream size mismatch is corrupt, not acceptable
    with pytest.raises(ValueError, match="canvas"):
        decode_webp(_vp8x_wrap(blob, 5, 4))
    # animation flag
    with pytest.raises(NotImplementedError, match="animated"):
        decode_webp(_vp8x_wrap(blob, 4, 4, flags=0x02))
    # lossy alpha chunk before the bitstream
    alph = b"ALPH" + struct.pack("<I", 2) + b"\x00\x00"
    with pytest.raises(NotImplementedError, match="ALPH"):
        decode_webp(_vp8x_wrap(blob, 4, 4, pre_chunks=alph))
    # unknown chunk fails loudly rather than being skipped
    junk = b"JUNK" + struct.pack("<I", 2) + b"zz"
    with pytest.raises(ValueError, match="unknown chunk"):
        decode_webp(_vp8x_wrap(blob, 4, 4, pre_chunks=junk))
    # truncated metadata chunk
    cut = b"EXIF" + struct.pack("<I", 40) + b"short"
    with pytest.raises(ValueError, match="truncated"):
        decode_webp(_vp8x_wrap(blob, 4, 4, pre_chunks=cut))
    # no image chunk at all
    wrapped = _vp8x_wrap(blob, 4, 4)
    no_image = wrapped[:30]
    no_image = no_image[:4] + struct.pack("<I", len(no_image) - 8) + no_image[8:]
    with pytest.raises(ValueError, match="no image"):
        decode_webp(no_image)


def test_decoder_fuzz_raises_cleanly():
    """decode_webp on arbitrary garbage and on bit-flipped valid files
    must raise ValueError/NotImplementedError — never IndexError,
    KeyError, struct.error, or a silent wrong shape."""
    rng = np.random.default_rng(1234)
    ok_kinds = (ValueError, NotImplementedError)
    for _ in range(200):
        n = int(rng.integers(0, 200))
        blob = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        try:
            decode_webp(blob)
        except ok_kinds:
            pass
    arr = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
    good = encode_webp(arr)
    for _ in range(300):
        b = bytearray(good)
        for _ in range(int(rng.integers(1, 4))):
            b[int(rng.integers(0, len(b)))] ^= 1 << int(rng.integers(0, 8))
        try:
            out = decode_webp(bytes(b))
            assert out.dtype == np.uint8 and out.ndim == 3 and out.shape[2] == 3
        except ok_kinds:
            pass


def test_fast_path_huge_decl_rejected_before_allocation():
    """A tiny stream whose header declares a huge pixel count must be
    rejected by the O(1) plausibility gate (min bits/pixel x n vs
    stream length) BEFORE the O(n) position/output allocations — one
    adversarial ~30-byte row must not stall an executor touching
    gigabytes (code-review r7)."""
    import time
    from types import SimpleNamespace

    two_sym = SimpleNamespace(code_map={10: (0, 1), 20: (1, 1)})
    const = SimpleNamespace(code_map={7: (0, 0)})
    t0 = time.time()
    with pytest.raises(ValueError, match="truncated"):
        W._literal_decode_fast(b"\x00" * 16, 0, 1 << 28, [two_sym, const, const, const])
    assert time.time() - t0 < 0.5, "reject must happen before the O(n) work"


def test_fast_path_all_constant_channels_direct():
    """All-single-symbol channels consume zero bits: the fast path
    emits the constant image directly (stream content irrelevant),
    matching the reference loop's zero-bit reads."""
    from types import SimpleNamespace

    g = SimpleNamespace(code_map={11: (0, 0)})
    r = SimpleNamespace(code_map={22: (0, 0)})
    b = SimpleNamespace(code_map={33: (0, 0)})
    a = SimpleNamespace(code_map={255: (0, 0)})
    out = W._literal_decode_fast(b"", 0, 5, [g, r, b, a])
    assert out.shape == (5, 4)
    # stream order g,r,b,a -> columns R,G,B,A
    assert (out[:, 0] == 22).all() and (out[:, 1] == 11).all()
    assert (out[:, 2] == 33).all() and (out[:, 3] == 255).all()

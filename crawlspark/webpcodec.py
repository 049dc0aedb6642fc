"""Pure-numpy lossless WebP (VP8L) codec — the last payload format of
the matrix (VERDICT r05 #6; png/qjpg/real-JPEG/QVID already have own
codecs since r1-r5; the sandbox has no libwebp/PIL).

Authored from the PUBLIC WebP Lossless Bitstream Specification
(RFC 9649, section 3 "RIFF Container" and section 4 "Lossless
bitstream"); reference parity target is the same as the other codecs:
the crawl engine's payload invariant (input_hint: decoded-pixel
allclose; lossless ⇒ exact equality) on the image+caption corpus.

Encoder (``encode_webp``): the spec's simple profile — one spatially
coded ARGB image, NO transforms, NO color cache, NO meta prefix
codes, literal pixels only (no LZ77 backward references). Each of the
five prefix codes is either a "simple" code (≤2 symbols) or a normal
code-length-coded canonical prefix code. This is a strictly
spec-compliant stream: any conformant WebP decoder reads it.

Decoder (``decode_webp``): the same subset plus what foreign simple
streams may add on top of it — color cache, LZ77 with 1D distance
codes (plane code > 120), the subtract-green transform, the
max_symbol cutoff, and RLE code lengths (16/17/18). Out-of-subset
features fail LOUDLY with the reason (lossy VP8, VP8X container,
predictor / cross-color / color-indexing transforms, meta prefix
codes, 2D distance plane codes ≤ 120) — never a silent wrong decode.

Bit order is LSB-first within bytes (DEFLATE-style); canonical prefix
codes are read bit-by-bit MSB-of-code-first, exactly the DEFLATE
canonical construction (RFC 9649 §4.1.1)."""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_webp", "decode_webp"]

# green-channel alphabet: 256 literals + 24 length prefixes (+ cache)
_NUM_LENGTH_PREFIXES = 24
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


# ---------------------------------------------------------------- bits


class _BitWriter:
    """LSB-first bit packer. ``acc`` is truncated as bytes drain (the
    r5 jpegcodec O(n²) bigint-accumulator lesson, jpegcodec.py:176)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def write_code(self, code: int, length: int) -> None:
        """Canonical prefix code: MSB of the code goes first."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("webp: truncated VP8L bitstream")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


# ------------------------------------------------- canonical prefix code


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), DEFLATE canonical assignment."""
    max_len = max(lengths) if lengths else 0
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    next_code = [0] * (max_len + 2)
    code = 0
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


class _Decoder:
    """Bit-by-bit canonical prefix decoder (code read MSB-first)."""

    __slots__ = ("table", "single")

    def __init__(self, lengths: list[int]):
        nz = [(s, ln) for s, ln in enumerate(lengths) if ln]
        if not nz:
            raise ValueError("webp: prefix code with no symbols")
        if len(nz) == 1:
            # one symbol: zero-bit code
            self.single = nz[0][0]
            self.table = None
            return
        # over-subscribed / incomplete codes are corrupt
        if sum(1 << (max(ln for _, ln in nz) - ln) for _, ln in nz) != (
            1 << max(ln for _, ln in nz)
        ):
            raise ValueError("webp: invalid (non-complete) prefix code")
        self.single = None
        self.table = {
            (ln, code): sym for sym, (code, ln) in _canonical_codes(lengths).items()
        }

    @classmethod
    def simple(cls, symbols: list[int]):
        self = cls.__new__(cls)
        if len(symbols) == 1:
            self.single = symbols[0]
            self.table = None
        else:
            self.single = None
            self.table = {(1, 0): symbols[0], (1, 1): symbols[1]}
        return self

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        length = 0
        table = self.table
        while True:
            code = (code << 1) | br.read(1)
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
            if length > 15:
                raise ValueError("webp: prefix code longer than 15 bits")


# ------------------------------------------------------- length-limited


def _huffman_lengths(freqs: np.ndarray, max_len: int) -> list[int]:
    """Canonical Huffman code lengths from symbol frequencies, capped
    at ``max_len`` with the standard overflow fixup (zlib-style: move
    over-deep leaves up, paying by deepening the shallowest deep
    node). Zero-frequency symbols get length 0."""
    max_len = int(max_len)  # numpy ints break the 2**(max_len-l) sums
    syms = [int(s) for s in np.nonzero(freqs)[0]]
    if len(syms) <= 1:
        return [1 if s in syms else 0 for s in range(len(freqs))]
    # standard heap huffman, then the zlib-style depth-cap fixup below
    import heapq

    heap = [(int(freqs[s]), s, None, None) for s in syms]
    heapq.heapify(heap)
    nodes = []
    while len(heap) > 1:
        a = heapq.heappop(heap)
        b = heapq.heappop(heap)
        node = (a[0] + b[0], -(len(nodes) + 1), a, b)
        nodes.append(node)
        heapq.heappush(heap, node)
    lengths = [0] * len(freqs)

    def walk(node, depth):
        if node[2] is None:
            lengths[node[1]] = max(1, depth)
            return
        walk(node[2], depth + 1)
        walk(node[3], depth + 1)

    walk(heap[0], 0)
    # overflow fixup
    while max(lengths) > max_len:
        # take one leaf at depth > max_len up to max_len, and push the
        # deepest leaf shallower than max_len one level down
        over = max(range(len(lengths)), key=lambda s: lengths[s])
        lengths[over] = max_len
        # restore Kraft: find a leaf with length < max_len to deepen
        cand = max(
            (s for s in syms if lengths[s] < max_len),
            key=lambda s: lengths[s],
        )
        lengths[cand] += 1
        # re-check Kraft sum; loop until the code is feasible
        # float exponent on purpose: leaves still deeper than max_len
        # contribute fractional Kraft mass (2.0**-k) mid-fixup
        while sum(2.0 ** (max_len - lengths[s]) for s in syms) > 2**max_len:
            cand = max(
                (s for s in syms if lengths[s] < max_len),
                key=lambda s: lengths[s],
            )
            lengths[cand] += 1
    # tighten: if Kraft sum is under capacity, shorten the longest code
    kraft = sum(2 ** (max_len - lengths[s]) for s in syms)
    while True:
        slack = 2**max_len - kraft
        cand = None
        for s in sorted(syms, key=lambda s: -lengths[s]):
            gain = 2 ** (max_len - (lengths[s] - 1)) - 2 ** (max_len - lengths[s])
            if lengths[s] > 1 and gain <= slack:
                cand = (s, gain)
                break
        if cand is None:
            break
        lengths[cand[0]] -= 1
        kraft += cand[1]
    return lengths


# ------------------------------------------------------------- encoder


def _write_prefix_code(bw: _BitWriter, lengths: list[int]):
    """Write one prefix code: simple form for ≤2 symbols, else the
    code-length-coded normal form (no RLE, no max_symbol — both are
    decoder-side features)."""
    used = [s for s in range(len(lengths)) if lengths[s]]
    if 0 < len(used) <= 2 and all(s <= 255 for s in used):
        bw.write(1, 1)  # simple
        bw.write(len(used) - 1, 1)
        if used[0] <= 1:
            bw.write(0, 1)  # first symbol in 1 bit
            bw.write(used[0], 1)
        else:
            bw.write(1, 1)
            bw.write(used[0], 8)
        if len(used) == 2:
            bw.write(used[1], 8)
        return
    bw.write(0, 1)  # normal
    # code-length code over the 19 cl symbols (we emit no 16/17/18)
    cl_freq = np.zeros(19, dtype=np.int64)
    for ln in lengths:
        cl_freq[ln] += 1
    cl_lengths = _huffman_lengths(cl_freq, 7)
    # num_code_lengths: write all 19 in _CL_ORDER (4 + 15)
    bw.write(15, 4)
    for sym in _CL_ORDER:
        bw.write(cl_lengths[sym], 3)
    bw.write(0, 1)  # no max_symbol cutoff
    # single-symbol prefix codes consume ZERO bits on read (spec /
    # libwebp canonical behavior — the reason the 1-symbol simple
    # variant exists) — the writer must emit zero bits to match
    if sum(1 for v in cl_lengths if v) == 1:
        return
    cl_codes = _canonical_codes(cl_lengths)
    for ln in lengths:
        code, clen = cl_codes[ln]
        bw.write_code(code, clen)


def encode_webp(arr: np.ndarray, subtract_green: bool = True) -> bytes:
    """(h, w, 3) uint8 RGB -> lossless WebP (VP8L), literal-only.

    ``subtract_green`` (default) stores (r-g, g, b-g) mod 256 behind
    the spec's SUBTRACT_GREEN transform — typically smaller codes for
    correlated channels, and it makes every own-encoded file (incl.
    the committed fixtures) exercise the decoder's transform-inverse
    path, not just the hand-built test streams."""
    if arr.ndim != 3 or arr.shape[2] != 3 or arr.dtype != np.uint8:
        raise ValueError("encode_webp expects (h, w, 3) uint8")
    h, w, _ = arr.shape
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("webp: dimensions out of VP8L range")
    bw = _BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint: unused
    bw.write(0, 3)  # version
    if subtract_green:
        bw.write(1, 1)  # a transform follows
        bw.write(2, 2)  # SUBTRACT_GREEN (no payload)
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix codes
    g = arr[:, :, 1].ravel()
    r = arr[:, :, 0].ravel()
    b = arr[:, :, 2].ravel()
    if subtract_green:
        r = (r.astype(np.int16) - g).astype(np.uint8)
        b = (b.astype(np.int16) - g).astype(np.uint8)
    green_hist = np.zeros(256 + _NUM_LENGTH_PREFIXES, dtype=np.int64)
    np.add.at(green_hist, g, 1)
    red_hist = np.bincount(r, minlength=256).astype(np.int64)
    blue_hist = np.bincount(b, minlength=256).astype(np.int64)
    alpha_hist = np.zeros(256, dtype=np.int64)
    alpha_hist[255] = 1  # constant alpha -> 1-symbol simple code
    dist_hist = np.zeros(40, dtype=np.int64)
    dist_hist[0] = 1  # unused -> 1-symbol simple code
    lens = {}
    for name, hist, cap in (
        ("green", green_hist, 15),
        ("red", red_hist, 15),
        ("blue", blue_hist, 15),
        ("alpha", alpha_hist, 15),
        ("dist", dist_hist, 15),
    ):
        lengths = _huffman_lengths(hist, cap)
        _write_prefix_code(bw, lengths)
        # single-symbol codes read as ZERO bits — write nothing for them
        lens[name] = (
            _canonical_codes(lengths) if sum(1 for v in lengths if v) > 1 else None
        )
    gcodes, rcodes, bcodes = lens["green"], lens["red"], lens["blue"]
    # literal pixels: green, red, blue (alpha is the 0-bit single code)
    for gi, ri, bi in zip(g.tolist(), r.tolist(), b.tolist()):
        if gcodes is not None:
            c, ln = gcodes[gi]
            bw.write_code(c, ln)
        if rcodes is not None:
            c, ln = rcodes[ri]
            bw.write_code(c, ln)
        if bcodes is not None:
            c, ln = bcodes[bi]
            bw.write_code(c, ln)
    payload = b"\x2f" + bw.bytes()
    if len(payload) & 1:
        chunk = payload + b"\x00"
    else:
        chunk = payload
    riff = b"WEBP" + b"VP8L" + struct.pack("<I", len(payload)) + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# ------------------------------------------------------------- decoder


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _Decoder:
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        if br.read(1):
            symbols = [br.read(8)]
        else:
            symbols = [br.read(1)]
        if num_symbols == 2:
            symbols.append(br.read(8))
        return _Decoder.simple(symbols)
    num_code_lengths = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_code_lengths):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_dec = _Decoder(cl_lengths)
    if br.read(1):  # max_symbol cutoff
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    symbol = 0
    prev = 8
    while symbol < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        slen = cl_dec.read(br)
        if slen < 16:
            lengths[symbol] = slen
            symbol += 1
            if slen:
                prev = slen
        else:
            if slen == 16:
                repeat, fill = 3 + br.read(2), prev
            elif slen == 17:
                repeat, fill = 3 + br.read(3), 0
            else:
                repeat, fill = 11 + br.read(7), 0
            if symbol + repeat > alphabet_size:
                raise ValueError("webp: code-length repeat overflows alphabet")
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return _Decoder(lengths)


def _prefix_value(code: int, br: _BitReader) -> int:
    """LZ77 length/distance prefix decoding (RFC 9649 §4.2.2)."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def decode_webp(data: bytes) -> np.ndarray:
    """Lossless WebP (VP8L) -> (h, w, 3) uint8 RGB. Simple-profile
    subset (module docstring) — out-of-subset features raise with the
    reason, never decode wrong."""
    if len(data) < 20 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("webp: not a RIFF/WEBP container")
    fourcc = data[12:16]
    if fourcc == b"VP8 ":
        raise NotImplementedError("webp: lossy VP8 payload unsupported (VP8L only)")
    if fourcc == b"VP8X":
        raise NotImplementedError("webp: extended (VP8X) container unsupported")
    if fourcc != b"VP8L":
        raise ValueError(f"webp: unknown chunk {fourcc!r}")
    (chunk_len,) = struct.unpack("<I", data[16:20])
    payload = data[20 : 20 + chunk_len]
    if len(payload) < chunk_len:
        raise ValueError("webp: truncated VP8L chunk")
    if payload[0] != 0x2F:
        raise ValueError("webp: bad VP8L signature byte")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("webp: unknown VP8L version")
    subtract_green = False
    while br.read(1):  # transforms
        ttype = br.read(2)
        if ttype == 2:
            subtract_green = True
        elif ttype == 0:
            raise NotImplementedError("webp: predictor transform unsupported")
        elif ttype == 1:
            raise NotImplementedError("webp: cross-color transform unsupported")
        else:
            raise NotImplementedError("webp: color-indexing transform unsupported")
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not (1 <= cache_bits <= 11):
            raise ValueError("webp: invalid color-cache size")
    if br.read(1):
        raise NotImplementedError("webp: meta prefix codes unsupported")
    cache_size = (1 << cache_bits) if cache_bits else 0
    green_dec = _read_prefix_code(br, 256 + _NUM_LENGTH_PREFIXES + cache_size)
    red_dec = _read_prefix_code(br, 256)
    blue_dec = _read_prefix_code(br, 256)
    alpha_dec = _read_prefix_code(br, 256)
    dist_dec = _read_prefix_code(br, 40)
    n = w * h
    out = np.empty((n, 4), dtype=np.uint8)  # R, G, B, A
    cache = np.zeros((cache_size, 4), dtype=np.uint8) if cache_size else None
    pos = 0
    while pos < n:
        s = green_dec.read(br)
        if s < 256:
            g = s
            r = red_dec.read(br)
            b = blue_dec.read(br)
            a = alpha_dec.read(br)
            out[pos] = (r, g, b, a)
            pos += 1
            px = pos - 1
        elif s < 256 + _NUM_LENGTH_PREFIXES:
            length = _prefix_value(s - 256, br)
            dcode = _prefix_value(dist_dec.read(br), br)
            if dcode <= 120:
                raise NotImplementedError(
                    "webp: 2D distance plane codes unsupported (1D only)"
                )
            dist = dcode - 120
            if dist > pos:
                raise ValueError("webp: backward reference before image start")
            if pos + length > n:
                raise ValueError("webp: backward reference past image end")
            for _ in range(length):
                out[pos] = out[pos - dist]
                if cache is not None:
                    _cache_insert(cache, cache_bits, out[pos])
                pos += 1
            continue
        else:
            if cache is None:
                raise ValueError("webp: cache index without color cache")
            idx = s - 256 - _NUM_LENGTH_PREFIXES
            out[pos] = cache[idx]
            pos += 1
            continue  # cache hits re-insert the same value: no-op
        if cache is not None:
            _cache_insert(cache, cache_bits, out[px])
    if subtract_green:
        g16 = out[:, 1].astype(np.int16)
        out[:, 0] = ((out[:, 0].astype(np.int16) + g16) & 255).astype(np.uint8)
        out[:, 2] = ((out[:, 2].astype(np.int16) + g16) & 255).astype(np.uint8)
    return out[:, :3].reshape(h, w, 3)


def _cache_insert(cache: np.ndarray, cache_bits: int, px: np.ndarray) -> None:
    argb = (
        (int(px[3]) << 24) | (int(px[0]) << 16) | (int(px[1]) << 8) | int(px[2])
    )
    cache[((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)] = px

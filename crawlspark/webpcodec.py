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
max_symbol cutoff, and RLE code lengths (16/17/18), in a simple
(VP8L) or extended (VP8X still image, r7) container — pixel-neutral
VP8X metadata chunks (ICCP/EXIF/XMP) are skipped. Out-of-subset
features fail LOUDLY with the reason (lossy VP8/ALPH, animated VP8X,
predictor / cross-color / color-indexing transforms, meta prefix
codes, 2D distance plane codes ≤ 120, non-opaque alpha) — never a
silent wrong decode.

Literal-only streams with no color cache (every own-encoded file)
decode on a fully vectorized numpy path: 15-bit-window LUTs decode
SPECULATIVELY at every bit position, and pointer doubling over the
per-position pixel-transition map recovers the true start positions
in log2(n) gathers (``_literal_decode_fast``; ``FAST_LITERAL=False``
pins the per-pixel reference loop, and the two are pinned equal by
tests/test_webpcodec.py).

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
    """Bit-by-bit canonical prefix decoder (code read MSB-first).
    ``code_map`` (symbol -> (code, length)) is kept for the vectorized
    literal fast path's LUT build."""

    __slots__ = ("table", "single", "code_map")

    def __init__(self, lengths: list[int]):
        nz = [(s, ln) for s, ln in enumerate(lengths) if ln]
        if not nz:
            raise ValueError("webp: prefix code with no symbols")
        if len(nz) == 1:
            # one symbol: zero-bit code
            self.single = nz[0][0]
            self.table = None
            self.code_map = {self.single: (0, 0)}
            return
        # over-subscribed / incomplete codes are corrupt
        if sum(1 << (max(ln for _, ln in nz) - ln) for _, ln in nz) != (
            1 << max(ln for _, ln in nz)
        ):
            raise ValueError("webp: invalid (non-complete) prefix code")
        self.single = None
        self.code_map = _canonical_codes(lengths)
        self.table = {(ln, code): sym for sym, (code, ln) in self.code_map.items()}

    @classmethod
    def simple(cls, symbols: list[int]):
        self = cls.__new__(cls)
        if len(symbols) != len(set(symbols)):
            raise ValueError("webp: duplicate simple-code symbols")
        if len(symbols) == 1:
            self.single = symbols[0]
            self.table = None
            self.code_map = {symbols[0]: (0, 0)}
        else:
            self.single = None
            self.table = {(1, 0): symbols[0], (1, 1): symbols[1]}
            self.code_map = {symbols[0]: (0, 1), symbols[1]: (1, 1)}
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
        # a corrupt stream can declare e.g. distance symbol 200 in the
        # 40-symbol alphabet — fail at parse time, not via a garbage
        # downstream read (ADVICE r06)
        if any(s >= alphabet_size for s in symbols):
            raise ValueError(
                f"webp: simple-code symbol out of range (alphabet {alphabet_size})"
            )
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


# ------------------------------------------- vectorized literal decode

# tests can pin the per-pixel reference loop by flipping this off
FAST_LITERAL = True
_PEEK = 15  # spec-maximal code length — one LUT covers every code


def _lut_from_code_map(code_map: dict[int, tuple[int, int]]):
    """(sym, len) LUTs over every 15-bit stream window. Window bit j
    (LSB-first stream order) is the j-th bit the bit-reader would
    deliver, i.e. code bit (len-1-j) — so each (code, len) fills the
    2^(15-len) windows whose low ``len`` bits are the code reversed."""
    sym_lut = np.zeros(1 << _PEEK, dtype=np.int32)
    len_lut = np.zeros(1 << _PEEK, dtype=np.int32)
    for s, (code, ln) in code_map.items():
        base = 0
        for j in range(ln):
            base |= ((code >> (ln - 1 - j)) & 1) << j
        idx = base + (np.arange(1 << (_PEEK - ln), dtype=np.int64) << ln)
        sym_lut[idx] = s
        len_lut[idx] = ln
    return sym_lut, len_lut


def _literal_decode_fast(
    stream: bytes, start_bit: int, n: int, decoders
) -> np.ndarray:
    """Decode ``n`` literal pixels (no LZ77, no color cache) starting
    at ``start_bit`` — fully vectorized, no per-pixel Python loop.

    Variable-length prefix codes have a sequential data dependency, so
    instead of walking the stream we decode SPECULATIVELY at every bit
    position (one LUT gather per channel, complete codes guarantee
    every window decodes to something), build the per-position
    "position after one whole pixel" map f, and recover the true pixel
    start positions by pointer doubling over f — log2(n) gathers
    replace the n-iteration loop. Positions are monotone increasing,
    so one final bound check catches any speculative overrun of the
    stream (equivalent to the bit-reader's truncation error).

    ``decoders`` is the stream-ordered [green, red, blue, alpha] list;
    single-symbol channels consume zero bits and appear only as
    constants. Returns (n, 4) uint8 rows in R, G, B, A column order.
    """
    nbits = len(stream) * 8
    if start_bit > nbits:
        raise ValueError("webp: truncated VP8L bitstream")
    # plausibility gate BEFORE the O(n) allocations: every pixel costs
    # at least the sum of the non-constant channels' shortest codes,
    # so a tiny corrupt stream declaring a huge w*h raises here in
    # O(1) instead of allocating/touching gigabytes first (the
    # per-pixel reference loop gets this for free from its bit reader)
    min_bits = sum(
        min(ln for _c, ln in dec.code_map.values())
        for dec in decoders
        if len(dec.code_map) > 1
    )
    if min_bits == 0:
        # all four channels are single-symbol zero-bit codes: the
        # image is constant — emit it directly (no stream bits read)
        out = np.empty((n, 4), dtype=np.uint8)
        col_of = (1, 0, 2, 3)
        for ci, dec in enumerate(decoders):
            out[:, col_of[ci]] = next(iter(dec.code_map))
        return out
    if start_bit + n * min_bits > nbits:
        raise ValueError("webp: truncated VP8L bitstream")
    bits = np.unpackbits(np.frombuffer(stream, dtype=np.uint8), bitorder="little")
    pad = 4 * _PEEK + 1  # one pixel's worst case past the end
    M = nbits + pad
    bitsp = np.concatenate([bits, np.zeros(pad + _PEEK, dtype=np.uint8)])
    peek = np.zeros(M, dtype=np.int32)
    for j in range(_PEEK):
        peek |= bitsp[j : j + M].astype(np.int32) << j
    # per-channel speculative (symbol, advance) at every bit position
    chans: list[tuple] = []  # (sym_at | None, len_at | None, const)
    limit = M - 1
    for dec in decoders:
        if len(dec.code_map) == 1:
            chans.append((None, None, next(iter(dec.code_map))))
            continue
        sym_lut, len_lut = _lut_from_code_map(dec.code_map)
        chans.append((sym_lut[peek], len_lut[peek], None))
    # f[p] = position after decoding one full pixel starting at p
    q = np.arange(M, dtype=np.int32)
    for sym_at, len_at, const in chans:
        if const is None:
            q = np.minimum(q + len_at[np.minimum(q, limit)], limit)
    # pointer doubling: P[k:2k] = (k-pixel transition)[P[:k]]
    P = np.empty(n, dtype=np.int32)
    P[0] = min(start_bit, limit)
    filled = 1
    jump = q
    while filled < n:
        take = min(filled, n - filled)
        P[filled : filled + take] = jump[P[:take]]
        filled += take
        if filled < n:
            jump = jump[np.minimum(jump, limit)]
    out = np.empty((n, 4), dtype=np.uint8)
    col_of = (1, 0, 2, 3)  # stream order g,r,b,a -> columns R,G,B,A
    pos = P.astype(np.int64)
    for ci, (sym_at, len_at, const) in enumerate(chans):
        if const is not None:
            out[:, col_of[ci]] = const
            continue
        pc = np.minimum(pos, limit)
        out[:, col_of[ci]] = sym_at[pc]
        pos = pos + len_at[pc]
    if int(pos[-1]) > nbits:
        raise ValueError("webp: truncated VP8L bitstream")
    return out


def decode_webp(data: bytes) -> np.ndarray:
    """WebP container -> (h, w, 3) uint8 RGB. Accepts a simple-format
    VP8L file or an extended (VP8X) still image whose bitstream is
    VP8L — pixel-neutral metadata chunks (ICCP/EXIF/XMP) are skipped.
    Out-of-subset features (module docstring) raise with the reason,
    never decode wrong."""
    if len(data) < 20 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("webp: not a RIFF/WEBP container")
    fourcc = data[12:16]
    if fourcc == b"VP8 ":
        raise NotImplementedError("webp: lossy VP8 payload unsupported (VP8L only)")
    if fourcc == b"VP8X":
        return _decode_vp8x(data)
    if fourcc != b"VP8L":
        raise ValueError(f"webp: unknown chunk {fourcc!r}")
    (chunk_len,) = struct.unpack("<I", data[16:20])
    payload = data[20 : 20 + chunk_len]
    if len(payload) < chunk_len:
        raise ValueError("webp: truncated VP8L chunk")
    return _decode_vp8l(payload)


def _decode_vp8x(data: bytes) -> np.ndarray:
    """Extended-format (RFC 9649 section 2.5/2.7) still image: walk
    the chunk sequence after the VP8X header to the VP8L bitstream.
    Animation, fragments, and lossy (VP8/ALPH) payloads raise."""
    (vx_len,) = struct.unpack("<I", data[16:20])
    if vx_len != 10 or len(data) < 30:
        raise ValueError("webp: bad VP8X chunk length")
    flags = data[20]
    if flags & 0x02:
        raise NotImplementedError("webp: animated (ANIM) webp unsupported")
    canvas_w = int.from_bytes(data[24:27], "little") + 1
    canvas_h = int.from_bytes(data[27:30], "little") + 1
    off = 30  # VP8X payload is 10 bytes (even: no pad)
    while off + 8 <= len(data):
        fc = data[off : off + 4]
        (sz,) = struct.unpack("<I", data[off + 4 : off + 8])
        body = data[off + 8 : off + 8 + sz]
        if len(body) < sz:
            raise ValueError(f"webp: truncated {fc!r} chunk")
        if fc == b"VP8L":
            arr = _decode_vp8l(body)
            if arr.shape[0] != canvas_h or arr.shape[1] != canvas_w:
                raise ValueError(
                    "webp: VP8X canvas size does not match VP8L bitstream"
                )
            return arr
        if fc == b"VP8 ":
            raise NotImplementedError(
                "webp: lossy VP8 payload unsupported (VP8L only)"
            )
        if fc == b"ALPH":
            raise NotImplementedError("webp: ALPH (lossy-alpha) unsupported")
        if fc in (b"ICCP", b"EXIF", b"XMP "):
            # pixel-neutral metadata: skipping cannot change decoded
            # values (ICC affects display rendering, not samples)
            off += 8 + sz + (sz & 1)
            continue
        raise ValueError(f"webp: unknown chunk {fc!r} in VP8X container")
    raise ValueError("webp: VP8X container has no image bitstream chunk")


def _decode_vp8l(payload: bytes) -> np.ndarray:
    if not payload or payload[0] != 0x2F:
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
    if (
        FAST_LITERAL
        and cache_bits == 0
        and all(s < 256 for s in green_dec.code_map)
    ):
        # literal-only stream (no cache, green code carries no LZ77
        # length symbols) — every own-encoded file: vectorized path
        out = _literal_decode_fast(
            payload[1:], br.pos, n, (green_dec, red_dec, blue_dec, alpha_dec)
        )
        return _finish(out, subtract_green, h, w)
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
    return _finish(out, subtract_green, h, w)


def _finish(out: np.ndarray, subtract_green: bool, h: int, w: int) -> np.ndarray:
    # the module contract promises loud out-of-subset failure — a
    # conformant stream with real per-pixel alpha must not silently
    # decode to RGB with the channel dropped (ADVICE r06)
    if np.any(out[:, 3] != 255):
        raise NotImplementedError(
            "webp: non-opaque alpha unsupported (RGB-only subset)"
        )
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

"""Real media codecs — stdlib-only PNG, JPEG, and WAV decode (plus the
PNG/JPEG/WAV encoders the test fixtures use).

The reference treats media decode as an external-library concern; this
container has no PIL/torchaudio, so the formats fully decodable with the
standard library + numpy are implemented for real:

- PNG: chunk walk -> IHDR dims -> zlib-inflate IDAT -> per-scanline
  unfilter (all five filter types: None/Sub/Up/Average/Paeth, RFC 2083
  §6) -> pixel matrix. 8-bit depth, color types 0 (gray), 2 (RGB),
  3 (palette, expanded to RGB via PLTE), 4 (gray+alpha), 6 (RGBA).
- JPEG: baseline DCT (ITU T.81 SOF0/SOF1) AND progressive (SOF2:
  spectral-selection + successive-approximation scans, DC/AC refinement,
  EOB runs) — marker walk, DQT/DHT tables, canonical Huffman decode of
  the entropy stream (byte unstuffing + restart intervals), dezigzag +
  dequantize, separable float IDCT, level shift, nearest-neighbor chroma
  upsampling, JFIF YCbCr->RGB. Grayscale and 3-component scans, any
  sampling factors. Arithmetic / hierarchical / 12-bit remain
  NotImplementedError.
- WAV: RIFF/PCM via the stdlib ``wave`` module; 8/16/32-bit integer
  samples decoded with numpy ``frombuffer``.

MP4/ISO-BMFF containers get REAL metadata parsing (box walk: duration,
tracks, video dimensions — parse_mp4_metadata; per-sample byte ranges —
parse_mp4_samples), and MP3 streams get REAL frame-header parsing
(parse_mp3_frames: ID3v2 skip, sync walk, per-frame length arithmetic,
duration/CBR-VBR/bitrate stats). PAYLOAD decode for both — video frames
and MP3 audio (Huffman + IMDCT + synthesis filterbank) — still raises
NotImplementedError: the honest stub is retained for everything needing
real codec libraries, never silently faked.

Decision record (reviewed r7, r11, r12 — keep the stub): a pure-stdlib
MP3 payload decode is ~2-3 kLoC of Huffman tables + IMDCT + polyphase
synthesis and a video (H.264) decode far more, none of it exercising a
single Spark-side pattern this repo doesn't already prove via the PNG/
JPEG/WAV decoders (Arrow batching, schema, partitioning, deterministic
features). In a container with codec libraries, swap ``decode_media``'s
NotImplementedError branches for the library call — the Spark plumbing
(mapInPandas signature, batch shape, metadata columns) is real and
tested today. Reconsider-trigger: a gate that needs real audio/video
FEATURES (not metadata), or the container gaining a codec lib.

Decode is driven per-blob inside Arrow batches (``decode_media`` in
binary.py); nothing here touches Spark. Features are a normalized
``n_features``-bucket histogram — intensity buckets for images, amplitude
buckets for audio — integer counts divided by the total, so the result is
bit-exact reproducible (and SQL-expressible for analytically constructed
fixtures, which is how the oracle gate verifies this decoder).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

#: channels per PNG color type (8-bit depth only); type 3 (palette)
#: stores 1-byte indices per pixel and expands to RGB via PLTE
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def sniff_format(data: bytes) -> str | None:
    """'png' | 'jpg' | 'wav' | 'mp4' | None from magic bytes. NB: 'mp4'
    is metadata-parseable only (parse_mp4_metadata); frame decode stays
    NotImplementedError."""
    if data[:8] == PNG_MAGIC:
        return "png"
    if data[:2] == b"\xff\xd8":
        return "jpg"
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return "wav"
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return "mp4"
    return None


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """-> (width, height, n_channels, pixels[h, w, ch] uint8)."""
    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG")
    pos = 8
    width = height = bit_depth = color_type = None
    idat = bytearray()
    palette = None
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if bit_depth != 8:
                raise NotImplementedError(
                    f"PNG bit depth {bit_depth} unsupported (8 only)"
                )
            if color_type not in _PNG_CHANNELS:
                raise NotImplementedError(
                    f"PNG color type {color_type} unsupported"
                )
            if interlace:
                raise NotImplementedError("interlaced PNG unsupported")
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + crc
    if width is None:
        raise ValueError("PNG missing IHDR")
    if color_type == 3 and palette is None:
        raise ValueError("palette PNG missing PLTE chunk")
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT size mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up — vectorized, no horizontal dependency
            cur = line + prev  # uint8 wraps mod 256, as specified
        else:  # Sub / Average / Paeth — horizontal recurrence, per-pixel
            cur = line
            li = cur.astype(np.int32)
            pi = prev.astype(np.int32)
            res = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = res[x - ch] if x >= ch else 0
                if ftype == 1:
                    res[x] = (li[x] + a) & 0xFF
                elif ftype == 3:
                    res[x] = (li[x] + (a + pi[x]) // 2) & 0xFF
                elif ftype == 4:
                    c = pi[x - ch] if x >= ch else 0
                    res[x] = (li[x] + _paeth(a, pi[x], c)) & 0xFF
                else:
                    raise ValueError(f"PNG filter type {ftype}")
            cur = res.astype(np.uint8)
        out[y] = cur
        prev = out[y]
    if color_type == 3:
        # palette expansion: 1-byte indices -> RGB triples
        return width, height, 3, palette[out.reshape(height, width)]
    return width, height, ch, out.reshape(height, width, ch)


def encode_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal PNG writer for fixtures: 8-bit gray/gray+alpha/RGB/RGBA,
    one filter type for every scanline (exercises the matching unfilter
    path on decode)."""
    h, w, ch = pixels.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    stride = w * ch
    flat = pixels.reshape(h, stride).astype(np.int32)
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        raw.append(filter_type)
        if filter_type == 0:
            raw += cur.astype(np.uint8).tobytes()
        elif filter_type == 2:
            raw += ((cur - prev) & 0xFF).astype(np.uint8).tobytes()
        else:
            line = bytearray()
            for x in range(stride):
                a = int(cur[x - ch]) if x >= ch else 0
                b = int(prev[x])
                if filter_type == 1:
                    pred = a
                elif filter_type == 3:
                    pred = (a + b) // 2
                elif filter_type == 4:
                    c = int(prev[x - ch]) if x >= ch else 0
                    pred = _paeth(a, b, c)
                else:
                    raise ValueError(f"filter type {filter_type}")
                line.append((int(cur[x]) - pred) & 0xFF)
            raw += bytes(line)
        prev = cur

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def encode_png_palette(
    indices: np.ndarray, palette: np.ndarray, filter_type: int = 0
) -> bytes:
    """Palette (color type 3) PNG writer for fixtures: indices[h, w]
    uint8 into palette[n, 3] uint8. Reuses encode_png's filter machinery
    on the index plane, then splices the PLTE chunk and rewrites the
    IHDR color type."""
    h, w = indices.shape
    base = encode_png(indices[:, :, None], filter_type)
    # IHDR body starts at offset 16 (magic 8 + len 4 + type 4); color
    # type is byte 9 of the 13-byte body
    body = bytearray(base[16 : 16 + 13])
    body[9] = 3
    ihdr = (
        struct.pack(">I", 13)
        + b"IHDR"
        + bytes(body)
        + struct.pack(">I", zlib.crc32(b"IHDR" + bytes(body)) & 0xFFFFFFFF)
    )
    plte_body = palette.astype(np.uint8).tobytes()
    plte = (
        struct.pack(">I", len(plte_body))
        + b"PLTE"
        + plte_body
        + struct.pack(
            ">I", zlib.crc32(b"PLTE" + plte_body) & 0xFFFFFFFF
        )
    )
    rest = base[16 + 13 + 4 :]  # everything after IHDR chunk + its CRC
    return PNG_MAGIC + ihdr + plte + rest


# ---------------------------------------------------------------------------
# JPEG — baseline DCT (ITU T.81 SOF0/SOF1), stdlib + numpy only
# ---------------------------------------------------------------------------
#
# Decode path: marker walk -> DQT/DHT tables -> canonical Huffman decode of
# the entropy-coded segment (0xFF00 byte unstuffing, RSTn restart
# intervals) -> DPCM DC + run-length AC -> dezigzag -> dequantize ->
# separable float IDCT -> +128 level shift -> nearest-neighbor chroma
# upsample -> JFIF YCbCr->RGB with floor(x+0.5) rounding (deterministic,
# and reproducible in SQL by the oracle). Grayscale and 3-component scans,
# arbitrary sampling factors. Progressive (SOF2) frames are fully decoded
# too (spectral-selection/successive-approximation scan accumulation, see
# decode_jpeg); arithmetic, hierarchical and 12-bit frames raise
# NotImplementedError.

#: zigzag index -> (row-major flat index) for an 8x8 block
_ZIGZAG = np.array(
    [
        0,  1,  8, 16,  9,  2,  3, 10,
       17, 24, 32, 25, 18, 11,  4,  5,
       12, 19, 26, 33, 40, 48, 41, 34,
       27, 20, 13,  6,  7, 14, 21, 28,
       35, 42, 49, 56, 57, 50, 43, 36,
       29, 22, 15, 23, 30, 37, 44, 51,
       58, 59, 52, 45, 38, 31, 39, 46,
       53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

#: orthogonal 8x8 DCT basis: F = _DCT_M @ block @ _DCT_M.T (T.81 A.3.3)
_DCT_M = np.array(
    [
        [
            0.5
            * (1.0 / np.sqrt(2.0) if u == 0 else 1.0)
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

# Standard Huffman tables, ITU T.81 Annex K.3 — (bits[1..16], values)
_STD_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_STD_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_STD_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# Annex K.1 example quantization tables (luma, chroma), row-major
_STD_QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_STD_QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)


def _huffman_codes(bits: list[int], values: list[int]) -> dict:
    """Canonical Huffman (T.81 C.2): -> {symbol: (code, length)}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huffman_decode_table(bits: list[int], values: list[int]) -> dict:
    """-> {(length, code): symbol} for bit-at-a-time decode."""
    return {
        (length, code): sym
        for sym, (code, length) in _huffman_codes(bits, values).items()
    }


class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._nbits += nbits
        while self._nbits >= 8:
            byte = (self._acc >> (self._nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
            self._nbits -= 8
        self._acc &= (1 << self._nbits) - 1

    def flush(self) -> None:
        """Pad the final partial byte with 1-bits (T.81 F.1.2.3)."""
        if self._nbits:
            self.write((1 << (8 - self._nbits)) - 1, 8 - self._nbits)


class _BitReader:
    """MSB-first reader over an already-unstuffed entropy segment."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._nbits = 0

    def read_bit(self) -> int:
        if self._nbits == 0:
            if self.pos >= len(self.data):
                # past the end: T.81 readers see 1-padding
                return 1
            self._acc = self.data[self.pos]
            self.pos += 1
            self._nbits = 8
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _decode_huff_symbol(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(value: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the `size`-bit raw value to its signed
    coefficient (values with a 0 MSB are negative)."""
    if size == 0:
        return 0
    if value < (1 << (size - 1)):
        return value - (1 << size) + 1
    return value


def _category(value: int) -> int:
    """Bit size of |value| (DC/AC magnitude category)."""
    return int(value).bit_length() if value > 0 else int(-value).bit_length()


def _rgb_to_ycbcr(px: np.ndarray) -> list[np.ndarray]:
    """JFIF forward transform; floor(x+0.5) rounding, full range."""
    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return [
        np.clip(np.floor(p + 0.5), 0, 255).astype(np.uint8)
        for p in (y, cb, cr)
    ]


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """JFIF inverse transform; floor(x+0.5) rounding so the arithmetic is
    reproducible bit-exactly in SQL (DuckDB floor over doubles)."""
    yf = y.astype(np.float64)
    cbf = cb.astype(np.float64) - 128.0
    crf = cr.astype(np.float64) - 128.0
    r = yf + 1.402 * crf
    g = yf - 0.344136 * cbf - 0.714136 * crf
    b = yf + 1.772 * cbf
    return np.stack(
        [
            np.clip(np.floor(p + 0.5), 0, 255).astype(np.uint8)
            for p in (r, g, b)
        ],
        axis=2,
    )


def _plan_jpeg_components(
    planes: list[np.ndarray],
    subsample: tuple[int, int],
    quant_tables: tuple[np.ndarray, np.ndarray] | None,
):
    """Shared encoder front half: component metadata, quant tables, and
    MCU-grid-padded level-shifted planes (edge replication)."""
    h, w = planes[0].shape
    ncomp = len(planes)
    if ncomp not in (1, 3):
        raise ValueError("encode_jpeg_planes: 1 or 3 planes")
    sh, sv = subsample if ncomp == 3 else (1, 1)
    qluma, qchroma = (
        quant_tables
        if quant_tables is not None
        else (_STD_QUANT_LUMA, _STD_QUANT_CHROMA)
    )
    qtabs = [np.asarray(qluma, dtype=np.int64)]
    if ncomp == 3:
        qtabs.append(np.asarray(qchroma, dtype=np.int64))
    # per-component (plane, sampling h, sampling v, quant table id)
    comps = [(planes[0], sh, sv, 0)]
    for p in planes[1:]:
        comps.append((p[::sv, ::sh], 1, 1, 1))

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # pad each component plane (edge replication) to its MCU-grid size
    padded = []
    for plane, ch_, cv_, tq in comps:
        ph, pw = mcus_y * cv_ * 8, mcus_x * ch_ * 8
        p = np.empty((ph, pw), dtype=np.float64)
        src_h, src_w = plane.shape
        p[:src_h, :src_w] = plane
        if src_w < pw:
            p[:src_h, src_w:] = p[:src_h, src_w - 1 : src_w]
        if src_h < ph:
            p[src_h:, :] = p[src_h - 1 : src_h, :]
        padded.append((p - 128.0, ch_, cv_, tq))
    return h, w, ncomp, comps, qtabs, padded, hmax, vmax, mcus_x, mcus_y


def encode_jpeg_planes(
    planes: list[np.ndarray],
    subsample: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
    quant_tables: tuple[np.ndarray, np.ndarray] | None = None,
) -> bytes:
    """Baseline sequential JPEG writer over component planes.

    ``planes`` is ``[Y]`` (grayscale) or ``[Y, Cb, Cr]`` at FULL
    resolution; chroma is decimated (top-left sample) by the luma
    ``subsample`` factors ``(h, v)`` — (1,1)=4:4:4, (2,1)=4:2:2,
    (2,2)=4:2:0. ``quant_tables`` overrides the Annex-K example tables
    (row-major 64-long arrays, luma + chroma). Used for fixtures (where
    block-constant planes + DC quant 8 make the round trip bit-exact) and
    roundtrip tests; not a production encoder.
    """
    (
        h,
        w,
        ncomp,
        comps,
        qtabs,
        padded,
        hmax,
        vmax,
        mcus_x,
        mcus_y,
    ) = _plan_jpeg_components(planes, subsample, quant_tables)

    dc_tabs = [_huffman_codes(*_STD_DC_LUMA), _huffman_codes(*_STD_DC_CHROMA)]
    ac_tabs = [_huffman_codes(*_STD_AC_LUMA), _huffman_codes(*_STD_AC_CHROMA)]

    writer = _BitWriter()
    dc_pred = [0] * ncomp
    rst_idx = 0
    chunks: list[bytes] = []  # entropy bytes, RST markers interleaved
    mcu_in_interval = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_in_interval == restart_interval
            ):
                writer.flush()
                chunks.append(bytes(writer.out))
                chunks.append(bytes([0xFF, 0xD0 + (rst_idx & 7)]))
                rst_idx += 1
                writer = _BitWriter()
                dc_pred = [0] * ncomp
                mcu_in_interval = 0
            for ci, (plane, ch_, cv_, tq) in enumerate(padded):
                tid = 0 if ci == 0 else 1
                for by in range(cv_):
                    for bx in range(ch_):
                        y0 = (my * cv_ + by) * 8
                        x0 = (mx * ch_ + bx) * 8
                        block = plane[y0 : y0 + 8, x0 : x0 + 8]
                        coeffs = _DCT_M @ block @ _DCT_M.T
                        q = qtabs[tq].reshape(8, 8).astype(np.float64)
                        quant = np.floor(coeffs / q + 0.5).astype(np.int64)
                        zz = quant.ravel()[_ZIGZAG]
                        # DC (DPCM)
                        diff = int(zz[0]) - dc_pred[ci]
                        dc_pred[ci] = int(zz[0])
                        size = _category(diff)
                        code, length = dc_tabs[tid][size]
                        writer.write(code, length)
                        if size:
                            raw = diff if diff >= 0 else diff + (1 << size) - 1
                            writer.write(raw, size)
                        # AC (run-length)
                        run = 0
                        for k in range(1, 64):
                            v = int(zz[k])
                            if v == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, length = ac_tabs[tid][0xF0]  # ZRL
                                writer.write(code, length)
                                run -= 16
                            size = _category(v)
                            code, length = ac_tabs[tid][(run << 4) | size]
                            writer.write(code, length)
                            raw = v if v >= 0 else v + (1 << size) - 1
                            writer.write(raw, size)
                            run = 0
                        if run:
                            code, length = ac_tabs[tid][0x00]  # EOB
                            writer.write(code, length)
            mcu_in_interval += 1
    writer.flush()
    chunks.append(bytes(writer.out))
    entropy = b"".join(chunks)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    for tq, qt in enumerate(qtabs):
        zz = qt[_ZIGZAG]
        out += seg(0xDB, bytes([tq]) + bytes(int(v) for v in zz))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, (_, ch_, cv_, tq) in enumerate(comps):
        sof += bytes([ci + 1, (ch_ << 4) | cv_, tq])
    out += seg(0xC0, sof)
    for tc, tabs in ((0, (_STD_DC_LUMA, _STD_DC_CHROMA)), (1, (_STD_AC_LUMA, _STD_AC_CHROMA))):
        for th in range(2 if ncomp == 3 else 1):
            bits, values = tabs[th]
            out += seg(
                0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
            )
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        th = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (th << 4) | th])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_jpeg_planes_progressive(
    planes: list[np.ndarray],
    subsample: tuple[int, int] = (1, 1),
    quant_tables: tuple[np.ndarray, np.ndarray] | None = None,
    al_first: int = 1,
    band_split: int = 5,
) -> bytes:
    """Progressive (SOF2) JPEG writer over component planes — the same
    quantized coefficients as ``encode_jpeg_planes`` (identical DCT +
    quant math via the shared front half), reorganized into the
    standard progressive scan script:

      1. DC first, interleaved, successive approximation Al=``al_first``
      2. per component: AC first, band [1, band_split],   Al=``al_first``
      3. per component: AC first, band [band_split+1,63], Al=``al_first``
      4. per component: AC refine, band [1, band_split],   Ah=1 -> Al=0
      5. per component: AC refine, band [band_split+1,63], Ah=1 -> Al=0
      6. DC refine, interleaved, Ah=1 -> Al=0

    Every progressive coding device is exercised: spectral selection,
    DC/AC successive approximation, newly-significant + correction-bit
    refinement coding, EOB runs (emitted per-block, the EOBn=0 form),
    and ZRL in both scan kinds. Because the coefficients are identical
    to the sequential encoding, ``decode_jpeg`` must produce pixel-
    identical output for both byte streams (asserted in tests).
    """
    (
        h,
        w,
        ncomp,
        comps,
        qtabs,
        padded,
        hmax,
        vmax,
        mcus_x,
        mcus_y,
    ) = _plan_jpeg_components(planes, subsample, quant_tables)

    # quantized zigzag coefficients per component over the padded grid
    qcoef = []
    for plane, ch_, cv_, tq in padded:
        bh, bw = plane.shape[0] // 8, plane.shape[1] // 8
        arr = np.zeros((bh, bw, 64), dtype=np.int64)
        q = qtabs[tq].reshape(8, 8).astype(np.float64)
        for by in range(bh):
            for bx in range(bw):
                block = plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coeffs = _DCT_M @ block @ _DCT_M.T
                quant = np.floor(coeffs / q + 0.5).astype(np.int64)
                arr[by, bx] = quant.ravel()[_ZIGZAG]
        qcoef.append(arr)

    dc_tabs = [_huffman_codes(*_STD_DC_LUMA), _huffman_codes(*_STD_DC_CHROMA)]
    ac_tabs = [_huffman_codes(*_STD_AC_LUMA), _huffman_codes(*_STD_AC_CHROMA)]

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    def sos_header(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
        body = bytes([len(comp_ids)])
        for ci in comp_ids:
            th = 0 if ci == 0 else 1
            body += bytes([ci + 1, (th << 4) | th])
        body += bytes([ss, se, (ah << 4) | al])
        return seg(0xDA, body)

    def dc_first_scan(al: int) -> bytes:
        wtr = _BitWriter()
        pred = [0] * ncomp
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, (_pl, ch_, cv_, _tq) in enumerate(padded):
                    tid = 0 if ci == 0 else 1
                    for by in range(cv_):
                        for bx in range(ch_):
                            v = int(
                                qcoef[ci][my * cv_ + by, mx * ch_ + bx, 0]
                            ) >> al  # arithmetic shift (T.81 G.1.2.1)
                            diff = v - pred[ci]
                            pred[ci] = v
                            size = _category(diff)
                            code, length = dc_tabs[tid][size]
                            wtr.write(code, length)
                            if size:
                                raw = (
                                    diff
                                    if diff >= 0
                                    else diff + (1 << size) - 1
                                )
                                wtr.write(raw, size)
        wtr.flush()
        return bytes(wtr.out)

    def dc_refine_scan(al: int) -> bytes:
        wtr = _BitWriter()
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci, (_pl, ch_, cv_, _tq) in enumerate(padded):
                    for by in range(cv_):
                        for bx in range(ch_):
                            v = int(
                                qcoef[ci][my * cv_ + by, mx * ch_ + bx, 0]
                            )
                            wtr.write((v >> al) & 1, 1)
        wtr.flush()
        return bytes(wtr.out)

    def _comp_block_grid(ci: int) -> tuple[int, int]:
        _pl, ch_, cv_, _tq = padded[ci]
        comp_w = -(-w * ch_ // hmax)
        comp_h = -(-h * cv_ // vmax)
        return -(-comp_h // 8), -(-comp_w // 8)

    def ac_first_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        tid = 0 if ci == 0 else 1
        wtr = _BitWriter()
        bh, bw = _comp_block_grid(ci)
        for byx in range(bh * bw):
            by, bx = divmod(byx, bw)
            zz = qcoef[ci][by, bx]
            run = 0
            for k in range(ss, se + 1):
                v = int(zz[k])
                t = (abs(v) >> al) * (1 if v >= 0 else -1)
                if t == 0:
                    run += 1
                    continue
                while run > 15:
                    code, length = ac_tabs[tid][0xF0]
                    wtr.write(code, length)
                    run -= 16
                size = _category(t)
                code, length = ac_tabs[tid][(run << 4) | size]
                wtr.write(code, length)
                raw = t if t >= 0 else t + (1 << size) - 1
                wtr.write(raw, size)
                run = 0
            if run:
                code, length = ac_tabs[tid][0x00]  # EOB (EOBn, n=0)
                wtr.write(code, length)
        wtr.flush()
        return bytes(wtr.out)

    def ac_refine_scan(ci: int, ss: int, se: int, al: int) -> bytes:
        tid = 0 if ci == 0 else 1
        wtr = _BitWriter()
        bh, bw = _comp_block_grid(ci)
        for byx in range(bh * bw):
            by, bx = divmod(byx, bw)
            zz = qcoef[ci][by, bx]
            run = 0
            br: list[int] = []
            for k in range(ss, se + 1):
                v = int(zz[k])
                t = abs(v) >> al
                if t == 0:
                    run += 1
                    continue
                # drain pending ZRLs at EVERY nonzero coefficient —
                # correction positions included — so each buffered
                # correction bit lands after the symbol whose zero-run
                # crosses its position (the decoder reads bits in
                # position order while walking the run)
                while run > 15:
                    code, length = ac_tabs[tid][0xF0]
                    wtr.write(code, length)
                    for b in br:
                        wtr.write(b, 1)
                    br = []
                    run -= 16
                if t > 1:  # already significant: correction bit
                    br.append(t & 1)
                    continue
                # newly significant this scan
                code, length = ac_tabs[tid][(run << 4) | 1]
                wtr.write(code, length)
                wtr.write(1 if v > 0 else 0, 1)
                for b in br:
                    wtr.write(b, 1)
                br = []
                run = 0
            if run or br:
                code, length = ac_tabs[tid][0x00]  # EOB
                wtr.write(code, length)
                for b in br:
                    wtr.write(b, 1)
        wtr.flush()
        return bytes(wtr.out)

    out = bytearray(b"\xff\xd8")
    out += seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    for tq, qt in enumerate(qtabs):
        zzq = qt[_ZIGZAG]
        out += seg(0xDB, bytes([tq]) + bytes(int(v) for v in zzq))
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci, (_, ch_, cv_, tq) in enumerate(comps):
        sof += bytes([ci + 1, (ch_ << 4) | cv_, tq])
    out += seg(0xC2, sof)  # SOF2: progressive
    for tc, tabs in (
        (0, (_STD_DC_LUMA, _STD_DC_CHROMA)),
        (1, (_STD_AC_LUMA, _STD_AC_CHROMA)),
    ):
        for th in range(2 if ncomp == 3 else 1):
            bits, values = tabs[th]
            out += seg(
                0xC4, bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
            )

    all_ids = list(range(ncomp))
    out += sos_header(all_ids, 0, 0, 0, al_first)
    out += dc_first_scan(al_first)
    for ci in range(ncomp):
        out += sos_header([ci], 1, band_split, 0, al_first)
        out += ac_first_scan(ci, 1, band_split, al_first)
        out += sos_header([ci], band_split + 1, 63, 0, al_first)
        out += ac_first_scan(ci, band_split + 1, 63, al_first)
    for al in range(al_first - 1, -1, -1):
        for ci in range(ncomp):
            out += sos_header([ci], 1, band_split, al + 1, al)
            out += ac_refine_scan(ci, 1, band_split, al)
            out += sos_header([ci], band_split + 1, 63, al + 1, al)
            out += ac_refine_scan(ci, band_split + 1, 63, al)
        out += sos_header(all_ids, 0, 0, al + 1, al)
        out += dc_refine_scan(al)
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg(
    pixels: np.ndarray,
    subsample: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
    quant_tables: tuple[np.ndarray, np.ndarray] | None = None,
) -> bytes:
    """RGB/grayscale front door: pixels[h, w, ch] uint8, ch in {1, 3};
    RGB is converted to JFIF YCbCr then handed to encode_jpeg_planes."""
    h, w, ch = pixels.shape
    if ch == 1:
        planes = [pixels[:, :, 0]]
    elif ch == 3:
        planes = _rgb_to_ycbcr(pixels)
    else:
        raise ValueError("encode_jpeg: 1 or 3 channels")
    return encode_jpeg_planes(
        planes,
        subsample=subsample,
        restart_interval=restart_interval,
        quant_tables=quant_tables,
    )


def _collect_entropy(data: bytes, ep: int) -> tuple[list[bytes], int]:
    """Unstuff the entropy-coded bytes following a scan header, split at
    RST markers; returns (segments, position of the terminating marker)."""
    segments: list[bytearray] = [bytearray()]
    while ep < len(data):
        b = data[ep]
        if b != 0xFF:
            segments[-1].append(b)
            ep += 1
            continue
        nxt = data[ep + 1] if ep + 1 < len(data) else 0xD9
        if nxt == 0x00:
            segments[-1].append(0xFF)
            ep += 2
        elif 0xD0 <= nxt <= 0xD7:
            segments.append(bytearray())
            ep += 2
        else:
            break  # real marker: end of scan
    return [bytes(s) for s in segments], ep


def decode_jpeg(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Huffman DCT JPEG decode -> (width, height, n_channels,
    pixels[h, w, ch] uint8): baseline/extended sequential (SOF0/SOF1)
    AND progressive (SOF2 — spectral selection, successive approximation
    with DC/AC first+refinement scans, EOB runs, restart intervals).
    Grayscale -> 1 channel; 3-component scans -> RGB via the JFIF
    inverse transform (floor(x+0.5) rounding). Raises
    NotImplementedError for arithmetic/hierarchical/12-bit coding.

    Reference precedent: pg_vectorize treats media decode as an external
    provider concern (vector-serve handles text only); this decoder is the
    LLM-pipeline extension's hermetic stand-in for libjpeg.
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    restart_interval = 0
    progressive = False
    frame = None  # (h, w, [(comp_id, sh, sv, tq), ...])
    scan = None  # ([(comp_idx, td, ta), ...], entropy_segments)
    prog_scans: list[tuple] = []

    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker == 0xFF:  # optional fill byte before a marker (B.1.1.2)
            pos += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + length]
        if marker == 0xDB:  # DQT (possibly several tables)
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 0x0F
                bp += 1
                if pq == 0:
                    vals = np.frombuffer(
                        body[bp : bp + 64], dtype=np.uint8
                    ).astype(np.int64)
                    bp += 64
                else:  # 16-bit precision table
                    vals = np.frombuffer(
                        body[bp : bp + 128], dtype=">u2"
                    ).astype(np.int64)
                    bp += 128
                dezz = np.zeros(64, dtype=np.int64)
                dezz[_ZIGZAG] = vals
                qtables[tq] = dezz.reshape(8, 8)
        elif marker == 0xC4:  # DHT (possibly several tables)
            bp = 0
            while bp < len(body):
                tc, th = body[bp] >> 4, body[bp] & 0x0F
                bits = list(body[bp + 1 : bp + 17])
                nvals = sum(bits)
                values = list(body[bp + 17 : bp + 17 + nvals])
                table = _huffman_decode_table(bits, values)
                (dc_tables if tc == 0 else ac_tables)[th] = table
                bp += 17 + nvals
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 sequential, SOF2 progressive
            precision, fh, fw, ncomp = struct.unpack(">BHHB", body[:6])
            if precision != 8:
                raise NotImplementedError(
                    f"JPEG precision {precision} unsupported (8-bit only)"
                )
            progressive = marker == 0xC2
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only Huffman sequential (SOF0/SOF1) and progressive "
                f"(SOF2) JPEG are supported, got SOF marker 0x{marker:02X}"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            if scan is not None and not progressive:
                # a second scan means non-interleaved multi-scan coding;
                # decoding only one scan would return WRONG pixels, so
                # fail honestly instead
                raise NotImplementedError(
                    "multi-scan sequential JPEG unsupported (one "
                    "interleaved scan only)"
                )
            ns = body[0]
            scan_comps = []
            for si in range(ns):
                cs, tdta = body[1 + 2 * si : 3 + 2 * si]
                comp_idx = next(
                    i for i, c in enumerate(frame[2]) if c[0] == cs
                )
                scan_comps.append((comp_idx, tdta >> 4, tdta & 0x0F))
            ss, se, ahal = body[1 + 2 * ns : 4 + 2 * ns]
            segments, ep = _collect_entropy(data, pos + 2 + length)
            if progressive:
                # snapshot the Huffman tables + DRI as of THIS scan
                # (later DHT/DRI segments may redefine them)
                prog_scans.append(
                    (
                        scan_comps,
                        segments,
                        ss,
                        se,
                        ahal >> 4,
                        ahal & 0x0F,
                        dict(dc_tables),
                        dict(ac_tables),
                        restart_interval,
                    )
                )
            else:
                scan = (scan_comps, segments)
            pos = ep
            continue
        pos += 2 + length

    if frame is None or (scan is None and not prog_scans):
        raise ValueError("JPEG missing SOF/SOS")
    fh, fw, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))

    # coefficient storage: per component, (blocks_y, blocks_x, 64)
    coef = []
    for _, sh, sv, _ in comps:
        coef.append(
            np.zeros((mcus_y * sv, mcus_x * sh, 64), dtype=np.int64)
        )

    if progressive:
        for pscan in prog_scans:
            _apply_progressive_scan(
                coef, comps, fh, fw, hmax, vmax, mcus_x, mcus_y, *pscan
            )
        return _jpeg_reconstruct(
            coef, comps, qtables, fh, fw, hmax, vmax
        )

    scan_comps, segments = scan
    seg_i = 0
    reader = _BitReader(segments[0])
    dc_pred = [0] * len(comps)
    mcu_in_interval = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_in_interval == restart_interval:
                seg_i += 1
                if seg_i >= len(segments):
                    raise ValueError("JPEG truncated at restart interval")
                reader = _BitReader(segments[seg_i])
                dc_pred = [0] * len(comps)
                mcu_in_interval = 0
            for comp_idx, td, ta in scan_comps:
                _, sh, sv, _tq = comps[comp_idx]
                dct = dc_tables[td]
                act = ac_tables[ta]
                for by in range(sv):
                    for bx in range(sh):
                        zz = np.zeros(64, dtype=np.int64)
                        size = _decode_huff_symbol(reader, dct)
                        diff = _extend(reader.read_bits(size), size)
                        dc_pred[comp_idx] += diff
                        zz[0] = dc_pred[comp_idx]
                        k = 1
                        while k < 64:
                            rs = _decode_huff_symbol(reader, act)
                            run, size = rs >> 4, rs & 0x0F
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += run
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            zz[k] = _extend(reader.read_bits(size), size)
                            k += 1
                        coef[comp_idx][my * sv + by, mx * sh + bx] = zz
            mcu_in_interval += 1

    return _jpeg_reconstruct(coef, comps, qtables, fh, fw, hmax, vmax)


def _jpeg_reconstruct(
    coef, comps, qtables, fh, fw, hmax, vmax
) -> tuple[int, int, int, np.ndarray]:
    """Shared sequential/progressive back half: dequantize + IDCT per
    component (vectorized over all blocks), upsample, color transform."""
    planes = []
    for ci, (_, sh, sv, tq) in enumerate(comps):
        by_, bx_ = coef[ci].shape[:2]
        dezz = np.zeros((by_, bx_, 64), dtype=np.float64)
        dezz[:, :, _ZIGZAG] = coef[ci]
        dezz *= qtables[tq].reshape(64).astype(np.float64)
        blocks = dezz.reshape(by_, bx_, 8, 8)
        # IDCT: f = M^T F M per block, batched over the block grid
        spatial = np.einsum("xu,yiuv,vw->yixw", _DCT_M.T, blocks, _DCT_M)
        # assemble plane from blocks: (by, bx, 8, 8) -> (by*8, bx*8)
        plane = spatial.transpose(0, 2, 1, 3).reshape(by_ * 8, bx_ * 8)
        plane = plane + 128.0
        # nearest-neighbor upsample to the full-resolution grid
        fx, fy = hmax // sh, vmax // sv
        if fx > 1:
            plane = np.repeat(plane, fx, axis=1)
        if fy > 1:
            plane = np.repeat(plane, fy, axis=0)
        planes.append(plane[:fh, :fw])

    if len(planes) == 1:
        px = np.clip(np.floor(planes[0] + 0.5), 0, 255).astype(np.uint8)
        return fw, fh, 1, px[:, :, None]
    if len(planes) == 3:
        y = np.clip(np.floor(planes[0] + 0.5), 0, 255)
        cb = np.clip(np.floor(planes[1] + 0.5), 0, 255)
        cr = np.clip(np.floor(planes[2] + 0.5), 0, 255)
        return fw, fh, 3, _ycbcr_to_rgb(y, cb, cr)
    raise NotImplementedError(
        f"JPEG with {len(planes)} components unsupported (1 or 3)"
    )


def _apply_progressive_scan(
    coef,
    comps,
    fh,
    fw,
    hmax,
    vmax,
    mcus_x,
    mcus_y,
    scan_comps,
    segments,
    ss,
    se,
    ah,
    al,
    dc_tables,
    ac_tables,
    restart_interval,
) -> None:
    """Decode one progressive scan into the persistent coefficient store
    (T.81 G.2): DC first (Ah=0, Ss=0) / DC refinement (Ah>0) for
    interleaved or single-component scans; AC first / AC refinement
    (always single-component) with spectral band [Ss, Se], successive
    approximation bit position Al, and EOB runs. Restart markers reset
    the DC predictors and the EOB run."""
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("progressive scan mixes DC and AC (Ss=0, Se>0)")
    if not is_dc and len(scan_comps) != 1:
        raise ValueError("progressive AC scan must be single-component")

    # per-scan mutable state shared across the unit iteration
    state = {"eobrun": 0, "dc_pred": [0] * len(comps)}
    seg_i = 0
    reader = _BitReader(segments[0])
    units = 0  # MCUs (interleaved) or blocks (single-component)

    def maybe_restart():
        nonlocal seg_i, reader
        if restart_interval and units and units % restart_interval == 0:
            seg_i += 1
            if seg_i >= len(segments):
                raise ValueError("JPEG truncated at restart interval")
            reader = _BitReader(segments[seg_i])
            state["dc_pred"] = [0] * len(comps)
            state["eobrun"] = 0

    _scan_td = {ci: td for ci, td, _ta in scan_comps}
    _scan_ta = {ci: ta for ci, _td, ta in scan_comps}

    def dc_unit(comp_idx, by, bx):
        zz = coef[comp_idx][by, bx]
        if ah == 0:  # first DC scan: DPCM of (coef >> Al)
            size = _decode_huff_symbol(
                reader, dc_tables[_scan_td[comp_idx]]
            )
            diff = _extend(reader.read_bits(size), size)
            state["dc_pred"][comp_idx] += diff
            zz[0] = state["dc_pred"][comp_idx] << al
        else:  # refinement: one magnitude bit
            if reader.read_bit():
                zz[0] |= 1 << al

    if is_dc and len(scan_comps) > 1:
        # interleaved DC scan: MCU order over all components
        for my in range(mcus_y):
            for mx in range(mcus_x):
                maybe_restart()
                for comp_idx, _td, _ta in scan_comps:
                    _, sh, sv, _tq = comps[comp_idx]
                    for by in range(sv):
                        for bx in range(sh):
                            dc_unit(
                                comp_idx, my * sv + by, mx * sh + bx
                            )
                units += 1
        return

    # single-component scan: the component's OWN block grid (ceil of its
    # sample dimensions, T.81 A.2.2 — not the MCU-padded grid)
    comp_idx = scan_comps[0][0]
    _, sh, sv, _tq = comps[comp_idx]
    comp_w = -(-fw * sh // hmax)
    comp_h = -(-fh * sv // vmax)
    bw = -(-comp_w // 8)
    bh = -(-comp_h // 8)
    act = ac_tables.get(_scan_ta[comp_idx])
    p1, m1 = 1 << al, -1 << al

    for byx in range(bh * bw):
        maybe_restart()
        by, bx = divmod(byx, bw)
        zz = coef[comp_idx][by, bx]
        if is_dc:
            dc_unit(comp_idx, by, bx)
            units += 1
            continue
        if ah == 0:
            # AC first scan (G.1.2.2): band values at precision Al
            if state["eobrun"] > 0:
                state["eobrun"] -= 1
                units += 1
                continue
            k = ss
            while k <= se:
                rs = _decode_huff_symbol(reader, act)
                run, size = rs >> 4, rs & 0x0F
                if size == 0:
                    if run == 15:  # ZRL
                        k += 16
                        continue
                    state["eobrun"] = (1 << run) + reader.read_bits(run) - 1
                    break
                k += run
                if k > se:
                    raise ValueError("JPEG AC index overflow")
                zz[k] = _extend(reader.read_bits(size), size) << al
                k += 1
        else:
            # AC refinement (G.1.2.3)
            k = ss
            if state["eobrun"] == 0:
                while k <= se:
                    rs = _decode_huff_symbol(reader, act)
                    run, size = rs >> 4, rs & 0x0F
                    newval = 0
                    if size == 0:
                        if run != 15:
                            state["eobrun"] = (
                                (1 << run) + reader.read_bits(run)
                            )
                            break
                        # ZRL: skip 16 zero-history coefficients
                    else:
                        if size != 1:
                            raise ValueError(
                                "invalid AC refinement magnitude"
                            )
                        newval = p1 if reader.read_bit() else m1
                    # advance over `run` zero-history coefficients,
                    # emitting correction bits for nonzero-history ones
                    while k <= se:
                        if zz[k] != 0:
                            if reader.read_bit() and (zz[k] & p1) == 0:
                                zz[k] += p1 if zz[k] >= 0 else m1
                        else:
                            if run == 0:
                                break
                            run -= 1
                        k += 1
                    if newval and k <= se:
                        zz[k] = newval
                    k += 1
            if state["eobrun"] > 0:
                # inside an EOB run: correction bits only, for the
                # remaining nonzero-history coefficients of the band
                while k <= se:
                    if zz[k] != 0:
                        if reader.read_bit() and (zz[k] & p1) == 0:
                            zz[k] += p1 if zz[k] >= 0 else m1
                    k += 1
                state["eobrun"] -= 1
        units += 1


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------

_WAV_DTYPE = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """-> (n_frames, n_channels, samples[n_frames, n_channels] int32,
    normalized to 16-bit range so the amplitude histogram is width-
    independent)."""
    import io
    import wave

    with wave.open(io.BytesIO(data), "rb") as wf:
        nch = wf.getnchannels()
        sampwidth = wf.getsampwidth()
        nframes = wf.getnframes()
        frames = wf.readframes(nframes)
    if sampwidth not in _WAV_DTYPE:
        raise NotImplementedError(
            f"WAV sample width {sampwidth} unsupported (1/2/4 bytes)"
        )
    arr = np.frombuffer(frames, dtype=_WAV_DTYPE[sampwidth]).astype(np.int64)
    if sampwidth == 1:  # 8-bit WAV is unsigned, center then scale to 16-bit
        arr = (arr - 128) << 8
    elif sampwidth == 4:
        arr = arr >> 16
    return nframes, nch, arr.reshape(nframes, nch)


def encode_wav(samples: np.ndarray, framerate: int = 16000) -> bytes:
    """16-bit PCM writer for fixtures; samples[n_frames, n_channels]."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(samples.shape[1])
        wf.setsampwidth(2)
        wf.setframerate(framerate)
        wf.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# feature extraction (shared contract with the fake decoder)
# ---------------------------------------------------------------------------


def decode_features(
    data: bytes, n_features: int = 8
) -> tuple[int, int, int, list[float]]:
    """Real decode -> (width, height, n_channels, features).

    Images: features[b] = fraction of pixels whose mean-across-channels
    intensity falls in bucket b of [0, 256) split into n_features equal
    buckets. Audio: width = n_frames, height = 1, and features[b] =
    fraction of (16-bit-normalized) samples in bucket b of [-32768, 32768).
    Counts are integers and the only float op is the final divide, so
    results are bit-exact across partitionings.
    """
    fmt = sniff_format(data)
    if fmt in ("png", "jpg"):
        if fmt == "png":
            w, h, ch, px = decode_png(data)
        else:
            w, h, ch, px = decode_jpeg(data)
        # mean intensity scaled by ch kept integral: bucket on sum * nf
        sums = px.astype(np.int64).sum(axis=2).ravel()  # in [0, 255*ch]
        buckets = (sums * n_features) // (256 * ch)
        counts = np.bincount(buckets, minlength=n_features)
        total = int(counts.sum()) or 1
        return w, h, ch, [int(c) / total for c in counts]
    if fmt == "wav":
        nframes, nch, samples = decode_wav(data)
        flat = samples.ravel() + 32768  # [0, 65536)
        buckets = (flat * n_features) // 65536
        counts = np.bincount(buckets, minlength=n_features)
        total = int(counts.sum()) or 1
        return nframes, 1, nch, [int(c) / total for c in counts]
    raise NotImplementedError(
        "media decoding implemented for PNG, JPEG and WAV only; other "
        "formats require codec libraries not present in this environment "
        "(pass fake=True for the deterministic stub)"
    )


# ---------------------------------------------------------------------------
# MP4 / ISO-BMFF — metadata only (box walk; frame DECODE stays an honest
# stub: H.264/H.265 entropy decoding needs codec libraries this container
# does not have)
# ---------------------------------------------------------------------------


def parse_mp4_metadata(data: bytes) -> dict:
    """Container-level metadata from the ISO base-media box structure
    (ISO/IEC 14496-12): duration (mvhd timescale + duration), per-track
    handler type and track id (hdlr/tkhd), and the video track's
    presentation dimensions (tkhd 16.16 fixed-point width/height).

    -> {"brand": str, "duration_seconds": float, "n_tracks": int,
        "tracks": [{"track_id", "handler", "width", "height"}, ...]}

    A corpus pipeline needs this to filter/route video blobs (length
    caps, resolution buckets, audio-vs-video demux) without decoding a
    single frame; the decode itself remains NotImplementedError.
    """
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF/MP4 file (missing ftyp)")
    out: dict = {
        "brand": data[8:12].decode("ascii", "replace"),
        "duration_seconds": 0.0,
        "n_tracks": 0,
        "tracks": [],
    }

    def boxes(buf: bytes, start: int, end: int):
        pos = start
        while pos + 8 <= end:
            (size,) = struct.unpack(">I", buf[pos : pos + 4])
            btype = buf[pos + 4 : pos + 8]
            hdr = 8
            if size == 1:  # 64-bit largesize
                (size,) = struct.unpack(">Q", buf[pos + 8 : pos + 16])
                hdr = 16
            elif size == 0:  # to end of enclosing box
                size = end - pos
            if size < hdr:
                raise ValueError("malformed MP4 box size")
            yield btype, pos + hdr, pos + size
            pos += size

    def find(buf, start, end, wanted):
        for btype, b0, b1 in boxes(buf, start, end):
            if btype == wanted:
                return b0, b1
        return None

    moov = find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("MP4 missing moov box")
    m0, m1 = moov
    mvhd = find(data, m0, m1, b"mvhd")
    if mvhd is not None and mvhd[0] < len(data):
        v = data[mvhd[0]]
        if v == 1:
            timescale, duration = struct.unpack(
                ">IQ", data[mvhd[0] + 20 : mvhd[0] + 32]
            )
        else:
            timescale, duration = struct.unpack(
                ">II", data[mvhd[0] + 12 : mvhd[0] + 20]
            )
        if timescale:
            out["duration_seconds"] = duration / timescale
    for btype, t0, t1 in boxes(data, m0, m1):
        if btype != b"trak":
            continue
        track: dict = {
            "track_id": None,
            "handler": None,
            "width": 0,
            "height": 0,
        }
        tkhd = find(data, t0, t1, b"tkhd")
        if tkhd is not None and tkhd[0] < len(data):
            v = data[tkhd[0]]
            if v == 1:
                (track["track_id"],) = struct.unpack(
                    ">I", data[tkhd[0] + 20 : tkhd[0] + 24]
                )
                dim_off = tkhd[0] + 88
            else:
                (track["track_id"],) = struct.unpack(
                    ">I", data[tkhd[0] + 12 : tkhd[0] + 16]
                )
                dim_off = tkhd[0] + 76
            w_fix, h_fix = struct.unpack(
                ">II", data[dim_off : dim_off + 8]
            )
            track["width"] = w_fix >> 16  # 16.16 fixed point
            track["height"] = h_fix >> 16
        mdia = find(data, t0, t1, b"mdia")
        if mdia is not None:
            hdlr = find(data, mdia[0], mdia[1], b"hdlr")
            if hdlr is not None:
                track["handler"] = data[
                    hdlr[0] + 8 : hdlr[0] + 12
                ].decode("ascii", "replace")
        out["tracks"].append(track)
    out["n_tracks"] = len(out["tracks"])
    return out


def encode_minimal_mp4(
    duration_seconds: float,
    width: int,
    height: int,
    with_audio: bool = False,
    timescale: int = 1000,
) -> bytes:
    """Minimal spec-conformant MP4 box skeleton for fixtures/tests: ftyp
    + moov{mvhd, trak{tkhd, mdia{hdlr}}...}. No media data — exactly the
    structure parse_mp4_metadata reads."""

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + btype + body

    dur = int(round(duration_seconds * timescale))
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00"  # version 0 + flags
        + struct.pack(">II", 0, 0)  # creation, modification
        + struct.pack(">II", timescale, dur)
        + b"\x00" * 80,  # rate/volume/reserved/matrix/next_track_id
    )

    def trak(track_id: int, handler: bytes, w: int, h: int) -> bytes:
        tkhd = box(
            b"tkhd",
            b"\x00\x00\x00\x07"
            + struct.pack(">II", 0, 0)
            + struct.pack(">I", track_id)
            + b"\x00" * 4
            + struct.pack(">I", dur)
            + b"\x00" * 52  # reserved/layer/volume/matrix
            + struct.pack(">II", w << 16, h << 16),
        )
        hdlr = box(
            b"hdlr", b"\x00\x00\x00\x00" + b"\x00" * 4 + handler + b"\x00" * 13
        )
        mdia = box(b"mdia", hdlr)
        return box(b"trak", tkhd + mdia)

    traks = trak(1, b"vide", width, height)
    if with_audio:
        traks += trak(2, b"soun", 0, 0)
    moov = box(b"moov", mvhd + traks)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    return ftyp + moov


def parse_mp4_samples(data: bytes) -> list[dict]:
    """Per-sample (frame) layout of the FIRST video track from the
    ISO-BMFF sample tables (ISO/IEC 14496-12 §8.5-8.7): stsz (sizes),
    stco/co64 (chunk offsets), stsc (sample→chunk runs), stts (decode
    timestamps), stss (sync/keyframe samples; absent ⇒ all sync).

    -> [{"index", "offset", "size", "ts_seconds", "keyframe"}, ...]

    This is REAL frame extraction at the container level: each entry is
    the exact byte range of one coded video sample inside mdat, so a
    pipeline can pull keyframes / every-nth frame out of a video corpus
    with zero codec work. Decoding the extracted H.264/H.265 payload
    stays the honest NotImplementedError (no codec libs here).
    """
    if len(data) < 12 or data[4:8] != b"ftyp":
        raise ValueError("not an ISO-BMFF/MP4 file (missing ftyp)")

    def boxes(buf: bytes, start: int, end: int):
        pos = start
        while pos + 8 <= end:
            (size,) = struct.unpack(">I", buf[pos : pos + 4])
            btype = buf[pos + 4 : pos + 8]
            hdr = 8
            if size == 1:
                (size,) = struct.unpack(">Q", buf[pos + 8 : pos + 16])
                hdr = 16
            elif size == 0:
                size = end - pos
            if size < hdr:
                raise ValueError("malformed MP4 box size")
            yield btype, pos + hdr, pos + size
            pos += size

    def find(buf, start, end, wanted):
        for btype, b0, b1 in boxes(buf, start, end):
            if btype == wanted:
                return b0, b1
        return None

    moov = find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("MP4 missing moov box")
    for btype, t0, t1 in boxes(data, moov[0], moov[1]):
        if btype != b"trak":
            continue
        mdia = find(data, t0, t1, b"mdia")
        if mdia is None:
            continue
        hdlr = find(data, mdia[0], mdia[1], b"hdlr")
        if (
            hdlr is None
            or data[hdlr[0] + 8 : hdlr[0] + 12] != b"vide"
        ):
            continue
        # media timescale (mdhd)
        timescale = 1
        mdhd = find(data, mdia[0], mdia[1], b"mdhd")
        if mdhd is not None and mdhd[0] < len(data):
            v = data[mdhd[0]]
            off = mdhd[0] + (20 if v == 1 else 12)
            (timescale,) = struct.unpack(">I", data[off : off + 4])
            timescale = timescale or 1
        minf = find(data, mdia[0], mdia[1], b"minf")
        if minf is None:
            continue
        stbl = find(data, minf[0], minf[1], b"stbl")
        if stbl is None:
            continue

        def full(box_name):
            b = find(data, stbl[0], stbl[1], box_name)
            return (None, None) if b is None else b

        def checked_count(n, start, end, entry_bytes, what):
            # declared table counts must FIT their box — a corrupt blob
            # declaring 2^31 samples must raise, not allocate gigabytes
            if n < 0 or n * entry_bytes > (end - start):
                raise ValueError(
                    f"MP4 {what} count {n} exceeds its box"
                )
            return n

        stsz, stsz_end = full(b"stsz")
        stsc, stsc_end = full(b"stsc")
        (stco, stco_end), wide = full(b"stco"), False
        if stco is None:
            (stco, stco_end), wide = full(b"co64"), True
        if stsz is None or stsc is None or stco is None:
            raise ValueError("video track missing stsz/stsc/stco")
        fixed, n_samples = struct.unpack(">II", data[stsz + 4 : stsz + 12])
        if fixed:
            # fixed-size mode has no table to bound against: a sample
            # occupies bytes in THIS blob, so more samples than bytes
            # is definitionally corrupt
            if n_samples > len(data):
                raise ValueError(
                    f"MP4 sample count {n_samples} exceeds blob size"
                )
            sizes = [fixed] * n_samples
        else:
            checked_count(n_samples, stsz + 12, stsz_end, 4, "stsz")
            sizes = list(
                struct.unpack(
                    f">{n_samples}I",
                    data[stsz + 12 : stsz + 12 + 4 * n_samples],
                )
            )
        (n_chunks,) = struct.unpack(">I", data[stco + 4 : stco + 8])
        checked_count(n_chunks, stco + 8, stco_end, 8 if wide else 4, "stco")
        fmt, step = (">Q", 8) if wide else (">I", 4)
        chunk_offsets = [
            struct.unpack(
                fmt, data[stco + 8 + i * step : stco + 8 + (i + 1) * step]
            )[0]
            for i in range(n_chunks)
        ]
        (n_runs,) = struct.unpack(">I", data[stsc + 4 : stsc + 8])
        checked_count(n_runs, stsc + 8, stsc_end, 12, "stsc")
        runs = [
            struct.unpack(
                ">III", data[stsc + 8 + i * 12 : stsc + 20 + i * 12]
            )
            for i in range(n_runs)
        ]  # (first_chunk 1-based, samples_per_chunk, desc_idx)
        # per-chunk sample counts from the stsc run-length table
        per_chunk = []
        for i, (first, spc, _d) in enumerate(runs):
            last = (
                runs[i + 1][0] - 1 if i + 1 < len(runs) else n_chunks
            )
            # spc may legitimately exceed the remaining samples (the
            # final chunk holds the remainder); the emit loop is bounded
            # by n_samples, so only the RUN SHAPE needs validating
            span = last - first + 1
            if span < 0 or spc < 0:
                raise ValueError("malformed MP4 stsc run")
            per_chunk.extend([spc] * span)
        # decode timestamps (stts run-length deltas)
        deltas: list[int] = []
        stts, stts_end = full(b"stts")
        if stts is not None:
            (n_tt,) = struct.unpack(">I", data[stts + 4 : stts + 8])
            checked_count(n_tt, stts + 8, stts_end, 8, "stts")
            for i in range(n_tt):
                cnt, delta = struct.unpack(
                    ">II", data[stts + 8 + i * 8 : stts + 16 + i * 8]
                )
                if cnt > n_samples:
                    raise ValueError("malformed MP4 stts run")
                deltas.extend([delta] * cnt)
                if len(deltas) >= n_samples:
                    break  # only the first n_samples deltas are used
        deltas += [0] * (n_samples - len(deltas))
        # sync table (stss, 1-based); absent => every sample is sync
        sync: set[int] | None = None
        stss, stss_end = full(b"stss")
        if stss is not None:
            (n_ss,) = struct.unpack(">I", data[stss + 4 : stss + 8])
            checked_count(n_ss, stss + 8, stss_end, 4, "stss")
            sync = {
                struct.unpack(
                    ">I", data[stss + 8 + i * 4 : stss + 12 + i * 4]
                )[0]
                for i in range(n_ss)
            }
        out = []
        si = 0
        ts = 0
        for ci, spc in enumerate(per_chunk):
            if ci >= len(chunk_offsets):
                break
            off = chunk_offsets[ci]
            for _ in range(spc):
                if si >= n_samples:
                    break
                out.append(
                    {
                        "index": si,
                        "offset": off,
                        "size": sizes[si],
                        "ts_seconds": ts / timescale,
                        "keyframe": sync is None or (si + 1) in sync,
                    }
                )
                off += sizes[si]
                ts += deltas[si]
                si += 1
        return out
    raise ValueError("MP4 has no video track")


def encode_mp4_with_samples(
    samples: list[bytes],
    samples_per_chunk: int = 2,
    fps: int = 10,
    keyframe_every: int = 4,
    width: int = 64,
    height: int = 48,
    timescale: int = 1000,
) -> bytes:
    """Fixture encoder: a playable-shaped MP4 whose video track carries
    ``samples`` as real mdat payloads with full sample tables (stsd-less
    minimal stbl: stts/stss/stsc/stsz/stco) — exactly the structure
    parse_mp4_samples reads back. Sample i is a keyframe when
    ``i % keyframe_every == 0``."""

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", len(body) + 8) + btype + body

    n = len(samples)
    delta = timescale // fps
    dur = n * delta
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")

    stts = box(
        b"stts", b"\x00" * 4 + struct.pack(">III", 1, n, delta)
    )
    keys = [i + 1 for i in range(n) if i % keyframe_every == 0]
    stss = box(
        b"stss",
        b"\x00" * 4
        + struct.pack(">I", len(keys))
        + b"".join(struct.pack(">I", k) for k in keys),
    )
    stsc = box(
        b"stsc",
        b"\x00" * 4 + struct.pack(">IIII", 1, 1, samples_per_chunk, 1),
    )
    stsz = box(
        b"stsz",
        b"\x00" * 4
        + struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    n_chunks = (n + samples_per_chunk - 1) // samples_per_chunk

    def assemble(stco_box: bytes) -> tuple[bytes, int]:
        stbl = box(b"stbl", stts + stss + stsc + stsz + stco_box)
        minf = box(b"minf", stbl)
        hdlr = box(
            b"hdlr",
            b"\x00\x00\x00\x00" + b"\x00" * 4 + b"vide" + b"\x00" * 13,
        )
        mdhd = box(
            b"mdhd",
            b"\x00\x00\x00\x00"
            + struct.pack(">II", 0, 0)
            + struct.pack(">II", timescale, dur)
            + b"\x00" * 4,
        )
        mdia = box(b"mdia", mdhd + hdlr + minf)
        tkhd = box(
            b"tkhd",
            b"\x00\x00\x00\x07"
            + struct.pack(">II", 0, 0)
            + struct.pack(">I", 1)
            + b"\x00" * 4
            + struct.pack(">I", dur)
            + b"\x00" * 52
            + struct.pack(">II", width << 16, height << 16),
        )
        trak = box(b"trak", tkhd + mdia)
        mvhd = box(
            b"mvhd",
            b"\x00\x00\x00\x00"
            + struct.pack(">II", 0, 0)
            + struct.pack(">II", timescale, dur)
            + b"\x00" * 80,
        )
        moov = box(b"moov", mvhd + trak)
        payload_start = len(ftyp) + len(moov) + 8  # + mdat header
        return moov, payload_start

    # chunk offsets are absolute file positions, which depend on moov's
    # own size — assemble once with a placeholder stco BODY of the final
    # size (version/flags + count + n_chunks offsets) to learn where the
    # mdat payload starts, then assemble for real
    _, payload_start = assemble(
        box(b"stco", b"\x00" * (8 + 4 * n_chunks))
    )
    offsets = []
    pos = payload_start
    for ci in range(n_chunks):
        offsets.append(pos)
        for s in samples[
            ci * samples_per_chunk : (ci + 1) * samples_per_chunk
        ]:
            pos += len(s)
    stco = box(
        b"stco",
        b"\x00" * 4
        + struct.pack(">I", n_chunks)
        + b"".join(struct.pack(">I", o) for o in offsets),
    )
    moov, payload_start2 = assemble(stco)
    assert payload_start2 == payload_start  # stco size is count-fixed
    mdat = box(b"mdat", b"".join(samples))
    return ftyp + moov + mdat


# ---------------------------------------------------------------------------
# MP3 (MPEG-1/2/2.5 Audio Layer III) — FRAME-HEADER parsing only.
#
# The corpus-routing layer for audio columns: duration, sample rate,
# CBR/VBR, mean bitrate, channel mode — everything a length-cap /
# quality-route / demux pass needs — from a pure 4-byte-header walk
# (ISO/IEC 11172-3 §2.4.1), zero entropy decoding. PAYLOAD decode
# (Huffman + IMDCT + synthesis filterbank) remains NotImplementedError:
# the honest-stub rule for everything needing real codec work.
# ---------------------------------------------------------------------------

#: bitrate tables (kbps) by version/layer-III, index 1..14; 0 = free
#: format, 15 = invalid (ISO/IEC 11172-3 table B.2; 13818-3 lower rates)
_MP3_BITRATES = {
    "MPEG1": [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320],
    "MPEG2": [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
    "MPEG2.5": [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160],
}
#: sample-rate tables (Hz) by version, index 0..2; 3 = reserved
_MP3_SAMPLE_RATES = {
    "MPEG1": [44100, 48000, 32000],
    "MPEG2": [22050, 24000, 16000],
    "MPEG2.5": [11025, 12000, 8000],
}
_MP3_VERSIONS = {0b00: "MPEG2.5", 0b10: "MPEG2", 0b11: "MPEG1"}
_MP3_CHANNEL_MODES = ["stereo", "joint_stereo", "dual_channel", "mono"]


def _mp3_frame_length(version: str, bitrate_kbps: int, sr: int, padding: int) -> int:
    """Layer III frame length in bytes: 144·bitrate/sr for MPEG-1,
    72·bitrate/sr for MPEG-2/2.5 (spf 1152 vs 576), plus the padding
    slot; the length covers header+CRC+payload."""
    coef = 144 if version == "MPEG1" else 72
    return coef * bitrate_kbps * 1000 // sr + padding


def _mp3_spf(version: str) -> int:
    """Samples per Layer-III frame: 1152 (MPEG-1) / 576 (MPEG-2/2.5)."""
    return 1152 if version == "MPEG1" else 576


def parse_mp3_frames(data: bytes) -> dict:
    """Walk an MPEG Audio Layer III stream's frame headers.

    Skips a leading ID3v2 tag ('ID3' + syncsafe 28-bit size), requires a
    sync word (11 set bits) at the first audio byte, then steps frame by
    frame via the computed frame length. Layer I/II streams raise
    ValueError (only Layer III is in scope); free-format (bitrate index
    0) and reserved field values raise too. Trailing garbage that does
    not start with a sync word ends the walk (normal: ID3v1 tags).

    -> {"version", "layer": 3, "sample_rate", "channel_mode",
        "n_frames", "total_samples", "duration_seconds",
        "bitrate_kbps_mean", "is_vbr", "has_id3", "has_crc",
        "frames": [{"offset", "size", "bitrate_kbps", "padding"}, ...]}

    duration is total_samples / sample_rate — ONE division of exact
    integers (bit-reproducible); mixed-sample-rate streams are rejected
    (no real encoder emits them, and a sum of per-frame ratios would be
    fold-order-dependent).
    """
    pos = 0
    has_id3 = False
    if data[:3] == b"ID3" and len(data) >= 10:
        size = (
            (data[6] & 0x7F) << 21
            | (data[7] & 0x7F) << 14
            | (data[8] & 0x7F) << 7
            | (data[9] & 0x7F)
        )
        pos = 10 + size
        has_id3 = True
    frames = []
    version = None
    sample_rate = None
    channel_mode = None
    has_crc = False
    bitrate_sum = 0
    first = True
    while pos + 4 <= len(data):
        b0, b1, b2, b3 = data[pos : pos + 4]
        if not (b0 == 0xFF and (b1 & 0xE0) == 0xE0):
            if first:
                raise ValueError("no MPEG audio sync word at stream start")
            break  # trailing non-frame bytes (e.g. ID3v1) end the walk
        ver_bits = (b1 >> 3) & 0b11
        layer_bits = (b1 >> 1) & 0b11
        if ver_bits not in _MP3_VERSIONS:
            raise ValueError("reserved MPEG version id")
        if layer_bits != 0b01:
            raise ValueError(
                "only Layer III is supported (Layer I/II header found)"
            )
        ver = _MP3_VERSIONS[ver_bits]
        protection = b1 & 1  # 0 -> 16-bit CRC follows the header
        br_idx = (b2 >> 4) & 0xF
        sr_idx = (b2 >> 2) & 0b11
        padding = (b2 >> 1) & 1
        mode = (b3 >> 6) & 0b11
        if br_idx in (0, 15):
            raise ValueError("free-format/invalid bitrate index")
        if sr_idx == 3:
            raise ValueError("reserved sample-rate index")
        sr = _MP3_SAMPLE_RATES[ver][sr_idx]
        if first:
            version, sample_rate = ver, sr
            channel_mode = _MP3_CHANNEL_MODES[mode]
            has_crc = protection == 0
            first = False
        elif ver != version or sr != sample_rate:
            raise ValueError("mixed version/sample-rate stream")
        kbps = _MP3_BITRATES[ver][br_idx]
        length = _mp3_frame_length(ver, kbps, sr, padding)
        frames.append(
            {
                "offset": pos,
                "size": length,
                "bitrate_kbps": kbps,
                "padding": padding,
            }
        )
        bitrate_sum += kbps
        pos += length
    if not frames:
        raise ValueError("no MPEG audio frames found")
    n = len(frames)
    total_samples = n * _mp3_spf(version)
    return {
        "version": version,
        "layer": 3,
        "sample_rate": sample_rate,
        "channel_mode": channel_mode,
        "n_frames": n,
        "total_samples": total_samples,
        "duration_seconds": total_samples / float(sample_rate),
        "bitrate_kbps_mean": bitrate_sum / float(n),
        "is_vbr": len({f["bitrate_kbps"] for f in frames}) > 1,
        "has_id3": has_id3,
        "has_crc": has_crc,
        "frames": frames,
    }


def encode_mp3_frames(
    frame_specs: list,
    version: str = "MPEG1",
    sr_idx: int = 0,
    channel_mode: int = 1,
    crc: bool = False,
    id3_size: int | None = None,
) -> bytes:
    """Assemble a syntactically valid Layer-III stream for the parser
    gate/tests: each spec is (bitrate_index, padding_bit); payloads are
    a deterministic byte fill (the header walk never reads them).
    ``id3_size`` prepends an ID3v2 tag with that many content bytes."""
    ver_bits = {v: k for k, v in _MP3_VERSIONS.items()}[version]
    out = bytearray()
    if id3_size is not None:
        out += b"ID3" + bytes([3, 0, 0]) + bytes(
            [
                (id3_size >> 21) & 0x7F,
                (id3_size >> 14) & 0x7F,
                (id3_size >> 7) & 0x7F,
                id3_size & 0x7F,
            ]
        )
        out += bytes(id3_size)
    sr = _MP3_SAMPLE_RATES[version][sr_idx]
    for br_idx, padding in frame_specs:
        kbps = _MP3_BITRATES[version][br_idx]
        length = _mp3_frame_length(version, kbps, sr, padding)
        b1 = 0xE0 | (ver_bits << 3) | (0b01 << 1) | (0 if crc else 1)
        b2 = (br_idx << 4) | (sr_idx << 2) | (padding << 1)
        b3 = (channel_mode & 0b11) << 6
        frame = bytearray([0xFF, b1, b2, b3])
        body = length - 4
        frame += bytes((37 * i + 11) % 251 for i in range(body))
        out += frame
    return bytes(out)

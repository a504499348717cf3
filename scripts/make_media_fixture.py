"""Generate tests/fixtures/media_fixture.parquet — real PNG/JPEG/WAV blobs
whose decoded pixels/samples follow a closed-form formula, so the DuckDB
oracle can recompute the decoder's feature histogram analytically
(independent verification of the zlib+unfilter / Huffman+IDCT / PCM paths,
not a circular re-run of the same code).

Pixel formula  (c = channel): px[y, x, c] = (3x + 5y + 7c + 11*seed) % 256
Sample formula (c = channel): s[i, c] = ((37i + 13c + 17*seed) % 4001) - 2000

Each PNG row uses a different scanline filter type (0..4) so decode
exercises every unfilter branch.

JPEG rows are BLOCK-CONSTANT so the lossy codec is bit-exact on them: each
8x8 block of a component plane holds one value, so only the DC coefficient
is nonzero, and with the DC quant entry overridden to 8 the DPCM round
trip is exact (DC = 8*(v-128), quantized = v-128, dequantized-IDCT = v).
The decoder under test is still the fully general baseline path — Huffman,
restart intervals, sampling factors, chroma upsampling, YCbCr->RGB — and
the oracle recomputes the expected RGB from the block laws with the same
floor(x+0.5) JFIF transform in pure SQL:

  Y (bx, by)  = (17*bx + 29*by + 11*seed) % 256   bx = x // 8
  Cb(cx, cy)  = (23*cx +  7*cy + 13*seed) % 256   cx = x // 8  (4:4:4)
  Cr(cx, cy)  = (31*cx + 19*cy +  5*seed) % 256        x // 16 (4:2:0)

Deterministic; run once, commit the parquet.
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from pg_vectorize_spark.multimodal.codec import (
    _STD_QUANT_CHROMA,
    _STD_QUANT_LUMA,
    encode_jpeg_planes,
    encode_jpeg_planes_progressive,
    encode_png,
    encode_png_palette,
    encode_wav,
)

#: Annex-K tables with the DC entry forced to 8 -> exact DC round trip
JPEG_QL = _STD_QUANT_LUMA.copy()
JPEG_QL[0] = 8
JPEG_QC = _STD_QUANT_CHROMA.copy()
JPEG_QC[0] = 8


def png_pixels(w: int, h: int, ch: int, seed: int) -> np.ndarray:
    y, x, c = np.mgrid[0:h, 0:w, 0:ch]
    return ((3 * x + 5 * y + 7 * c + 11 * seed) % 256).astype(np.uint8)


def jpeg_planes(
    w: int, h: int, seed: int, chroma_block: int
) -> list[np.ndarray]:
    """Block-constant Y/Cb/Cr planes at full resolution; chroma constant
    per chroma_block (8 for 4:4:4, 16 for 4:2:0 so subsample+upsample are
    exact)."""
    by, bx = np.mgrid[0:h, 0:w]
    ybk_x, ybk_y = bx // 8, by // 8
    cbk_x, cbk_y = bx // chroma_block, by // chroma_block
    yp = ((17 * ybk_x + 29 * ybk_y + 11 * seed) % 256).astype(np.uint8)
    cb = ((23 * cbk_x + 7 * cbk_y + 13 * seed) % 256).astype(np.uint8)
    cr = ((31 * cbk_x + 19 * cbk_y + 5 * seed) % 256).astype(np.uint8)
    return [yp, cb, cr]


def jpeg_gray(w: int, h: int, seed: int) -> np.ndarray:
    by, bx = np.mgrid[0:h, 0:w]
    return ((17 * (bx // 8) + 29 * (by // 8) + 11 * seed) % 256).astype(
        np.uint8
    )


def wav_samples(frames: int, ch: int, seed: int) -> np.ndarray:
    i, c = np.mgrid[0:frames, 0:ch]
    return ((37 * i + 13 * c + 17 * seed) % 4001) - 2000


def main() -> None:
    rows = []
    # (media_id, ch, filter_type, w, h)
    png_specs = [
        (1, 1, 0, 40, 30),
        (2, 2, 1, 33, 21),
        (3, 3, 2, 40, 30),
        (4, 3, 3, 27, 19),
        (5, 4, 4, 32, 24),
    ]
    for mid, ch, ftype, w, h in png_specs:
        px = png_pixels(w, h, ch, mid)
        rows.append((mid, "png", w, h, ch, mid, encode_png(px, ftype)))
    for mid, ch, frames in [(6, 1, 3000), (7, 2, 2000)]:
        s = wav_samples(frames, ch, mid)
        rows.append((mid, "wav", frames, 1, ch, mid, encode_wav(s)))
    # palette PNG (color type 3): analytic palette + index laws so the
    # oracle recomputes the expanded RGB from pure arithmetic
    #   pal[i] = ((5i)%256, (7i+3)%256, (11i+1)%256), idx = (x+2y+seed)%64
    pal = np.stack(
        [
            (5 * np.arange(64)) % 256,
            (7 * np.arange(64) + 3) % 256,
            (11 * np.arange(64) + 1) % 256,
        ],
        axis=1,
    ).astype(np.uint8)
    py, px_ = np.mgrid[0:20, 0:36]
    idx = ((px_ + 2 * py + 11) % 64).astype(np.uint8)
    rows.append(
        (11, "png_palette", 36, 20, 3, 11, encode_png_palette(idx, pal, 2))
    )
    # JPEG: grayscale w/ restart intervals, 4:4:4 color, 4:2:0 subsampled
    rows.append(
        (
            8,
            "jpg_gray",
            48,
            32,
            1,
            8,
            encode_jpeg_planes(
                [jpeg_gray(48, 32, 8)],
                restart_interval=4,
                quant_tables=(JPEG_QL, JPEG_QC),
            ),
        )
    )
    rows.append(
        (
            9,
            "jpg_444",
            40,
            24,
            3,
            9,
            encode_jpeg_planes(
                jpeg_planes(40, 24, 9, chroma_block=8),
                subsample=(1, 1),
                quant_tables=(JPEG_QL, JPEG_QC),
            ),
        )
    )
    rows.append(
        (
            10,
            "jpg_420",
            32,
            32,
            3,
            10,
            encode_jpeg_planes(
                jpeg_planes(32, 32, 10, chroma_block=16),
                subsample=(2, 2),
                quant_tables=(JPEG_QL, JPEG_QC),
            ),
        )
    )
    # progressive (SOF2) variants: same block-constant laws, so the
    # identical pixels must come back through the multi-scan decode
    # (spectral selection + successive approximation + EOB runs)
    rows.append(
        (
            12,
            "jpg_prog_gray",
            48,
            32,
            1,
            12,
            encode_jpeg_planes_progressive(
                [jpeg_gray(48, 32, 12)],
                quant_tables=(JPEG_QL, JPEG_QC),
            ),
        )
    )
    rows.append(
        (
            13,
            "jpg_prog_420",
            32,
            32,
            3,
            13,
            encode_jpeg_planes_progressive(
                jpeg_planes(32, 32, 13, chroma_block=16),
                subsample=(2, 2),
                quant_tables=(JPEG_QL, JPEG_QC),
            ),
        )
    )

    table = pa.table(
        {
            "media_id": pa.array([r[0] for r in rows], pa.int64()),
            "kind": pa.array([r[1] for r in rows], pa.string()),
            "width": pa.array([r[2] for r in rows], pa.int32()),
            "height": pa.array([r[3] for r in rows], pa.int32()),
            "channels": pa.array([r[4] for r in rows], pa.int32()),
            "seed": pa.array([r[5] for r in rows], pa.int32()),
            "content": pa.array([r[6] for r in rows], pa.binary()),
        }
    )
    pq.write_table(table, "/root/repo/tests/fixtures/media_fixture.parquet")
    print(f"wrote {len(rows)} media rows")


if __name__ == "__main__":
    main()

"""Generate tests/fixtures/media_fixture.parquet — real PNG/WAV blobs whose
decoded pixels/samples follow a closed-form formula, so the DuckDB oracle
can recompute the decoder's feature histogram analytically (independent
verification of the zlib+unfilter / PCM paths, not a circular re-run of the
same code).

Pixel formula  (c = channel): px[y, x, c] = (3x + 5y + 7c + 11*seed) % 256
Sample formula (c = channel): s[i, c] = ((37i + 13c + 17*seed) % 4001) - 2000

Each PNG row uses a different scanline filter type (0..4) so decode
exercises every unfilter branch. Deterministic; run once, commit the
parquet.
"""

from __future__ import annotations

import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, "/root/repo")

from pg_vectorize_spark.multimodal.codec import encode_png, encode_wav


def png_pixels(w: int, h: int, ch: int, seed: int) -> np.ndarray:
    y, x, c = np.mgrid[0:h, 0:w, 0:ch]
    return ((3 * x + 5 * y + 7 * c + 11 * seed) % 256).astype(np.uint8)


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

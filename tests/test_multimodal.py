"""Multimodal binary-column plumbing: schema, metadata, decode stub batch
shape, frame sampling."""

from __future__ import annotations

import pytest

from pg_vectorize_spark.multimodal.binary import (
    binary_metadata,
    decode_media,
    frame_sample,
    with_media_columns,
)


def _bin_df(spark):
    rows = [
        (1, bytearray(b"\x89PNG fake image bytes" * 100)),
        (2, bytearray(b"RIFF fake audio" * 10)),
        (3, bytearray(b"")),
    ]
    return spark.createDataFrame(rows, "id long, content binary")


def test_binary_metadata(spark):
    out = {r["id"]: r for r in binary_metadata(_bin_df(spark), "content").collect()}
    assert out[1]["byte_len"] == 21 * 100
    assert out[3]["byte_len"] == 0
    assert len(out[1]["content_hash"]) == 32  # md5 hex
    assert out[1]["content_hash"] != out[2]["content_hash"]


def test_with_media_columns(spark):
    out = with_media_columns(_bin_df(spark), "content", "image/png").head()
    assert out["media_type"] == "image/png"


def test_decode_stub_raises_without_fake(spark):
    with pytest.raises(Exception) as exc_info:
        decode_media(_bin_df(spark), "content", "id", fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_decode_fake_deterministic_schema(spark):
    out = decode_media(_bin_df(spark), "content", "id", fake=True)
    assert [f.name for f in out.schema.fields] == [
        "pkey", "width", "height", "n_channels", "features",
    ]
    rows = {r["pkey"]: r for r in out.collect()}
    assert len(rows) == 3
    assert len(rows[1]["features"]) == 8
    assert abs(sum(rows[1]["features"]) - 1.0) < 1e-9
    # determinism
    rows2 = {
        r["pkey"]: r
        for r in decode_media(_bin_df(spark), "content", "id", fake=True).collect()
    }
    assert rows[1]["features"] == rows2[1]["features"]


def test_frame_sample(spark):
    df = spark.createDataFrame(
        [(1, bytearray(bytes(range(256)) * 10))], "id long, content binary"
    )  # 2560 bytes
    out = frame_sample(df, "content", "id", stride=1024).collect()
    assert len(out) == 3  # ceil(2560/1024)
    assert [r["offset"] for r in sorted(out, key=lambda r: r["frame_idx"])] == [
        0, 1024, 2048,
    ]
    sizes = [len(r["frame_bytes"]) for r in sorted(out, key=lambda r: r["frame_idx"])]
    assert sizes == [1024, 1024, 512]


def test_frame_sample_empty_binary(spark):
    df = spark.createDataFrame([(1, bytearray(b""))], "id long, content binary")
    out = frame_sample(df, "content", "id", stride=100).collect()
    assert len(out) == 1 and out[0]["offset"] == 0


class TestRealCodec:
    """Real stdlib PNG/WAV decode (multimodal/codec.py) — every unfilter
    branch, WAV widths, and honest failure on unsupported formats."""

    def test_png_all_filters_roundtrip(self):
        import numpy as np

        from pg_vectorize_spark.multimodal.codec import decode_png, encode_png

        rng = np.random.default_rng(3)
        for ftype in range(5):
            for ch in (1, 2, 3, 4):
                px = rng.integers(0, 256, size=(11, 7, ch), dtype=np.uint8)
                w, h, c, got = decode_png(encode_png(px, ftype))
                assert (w, h, c) == (7, 11, ch), (ftype, ch)
                assert np.array_equal(got, px), f"filter {ftype} ch {ch}"

    def test_wav_widths(self):
        import io
        import wave

        import numpy as np

        from pg_vectorize_spark.multimodal.codec import decode_wav, encode_wav

        s = np.array([[0], [1000], [-1000], [32767], [-32768]])
        nframes, nch, got = decode_wav(encode_wav(s))
        assert (nframes, nch) == (5, 1)
        assert np.array_equal(got[:, 0], s[:, 0])
        # 8-bit unsigned: value 128+x decodes to x<<8 in 16-bit range
        buf = io.BytesIO()
        with wave.open(buf, "wb") as wf:
            wf.setnchannels(1)
            wf.setsampwidth(1)
            wf.setframerate(8000)
            wf.writeframes(bytes([128, 129, 127]))
        _, _, got8 = decode_wav(buf.getvalue())
        assert list(got8[:, 0]) == [0, 256, -256]

    def test_unsupported_format_raises(self):
        import pytest

        from pg_vectorize_spark.multimodal.codec import decode_features

        # MP3-ish bytes: sniff fails -> honest NotImplementedError
        with pytest.raises(NotImplementedError, match="PNG, JPEG and WAV"):
            decode_features(b"ID3\x04\x00 fake mp3 bytes")

    def test_arithmetic_jpeg_raises(self):
        import struct

        import pytest

        from pg_vectorize_spark.multimodal.codec import decode_jpeg

        # arithmetic-coded frame (SOF9) -> explicit unsupported; the
        # progressive Huffman marker (SOF2) is now a REAL decode path
        # (TestProgressiveJpeg)
        sof9 = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
        blob = (
            b"\xff\xd8"
            + struct.pack(">BBH", 0xFF, 0xC9, len(sof9) + 2)
            + sof9
            + b"\xff\xd9"
        )
        with pytest.raises(NotImplementedError, match="SOF marker 0xC9"):
            decode_jpeg(blob)

    def test_jpeg_block_constant_exact(self):
        """Block-constant planes + DC quant 8: the lossy codec is exact
        (the fixture-law contract the multimodal_decode oracle relies
        on), across grayscale/4:4:4/4:2:0 and restart intervals."""
        import numpy as np

        from pg_vectorize_spark.multimodal.codec import (
            _STD_QUANT_CHROMA,
            _STD_QUANT_LUMA,
            decode_jpeg,
            encode_jpeg_planes,
        )

        ql = _STD_QUANT_LUMA.copy()
        ql[0] = 8
        qc = _STD_QUANT_CHROMA.copy()
        qc[0] = 8
        h, w = 32, 48
        yy, xx = np.mgrid[0:h, 0:w]
        yp = ((17 * (xx // 8) + 29 * (yy // 8) + 88) % 256).astype(np.uint8)

        # grayscale + restart interval
        blob = encode_jpeg_planes(
            [yp], restart_interval=3, quant_tables=(ql, qc)
        )
        fw, fh, ch, px = decode_jpeg(blob)
        assert (fw, fh, ch) == (w, h, 1)
        assert np.array_equal(px[:, :, 0], yp)

        def expected_rgb(y, cb, cr):
            yf = y.astype(np.float64)
            cbf = cb.astype(np.float64) - 128.0
            crf = cr.astype(np.float64) - 128.0
            return np.stack(
                [
                    np.clip(np.floor(p + 0.5), 0, 255).astype(np.uint8)
                    for p in (
                        yf + 1.402 * crf,
                        yf - 0.344136 * cbf - 0.714136 * crf,
                        yf + 1.772 * cbf,
                    )
                ],
                axis=2,
            )

        # 4:4:4 color, chroma constant per 8x8
        cb = ((23 * (xx // 8) + 7 * (yy // 8) + 5) % 256).astype(np.uint8)
        cr = ((31 * (xx // 8) + 19 * (yy // 8) + 3) % 256).astype(np.uint8)
        blob = encode_jpeg_planes([yp, cb, cr], quant_tables=(ql, qc))
        fw, fh, ch, px = decode_jpeg(blob)
        assert (fw, fh, ch) == (w, h, 3)
        assert np.array_equal(px, expected_rgb(yp, cb, cr))

        # 4:2:0, chroma constant per 16x16 so subsample+upsample are exact
        cb2 = ((23 * (xx // 16) + 7 * (yy // 16) + 5) % 256).astype(np.uint8)
        cr2 = ((31 * (xx // 16) + 19 * (yy // 16) + 3) % 256).astype(
            np.uint8
        )
        blob = encode_jpeg_planes(
            [yp, cb2, cr2], subsample=(2, 2), quant_tables=(ql, qc)
        )
        fw, fh, ch, px = decode_jpeg(blob)
        assert (fw, fh, ch) == (w, h, 3)
        assert np.array_equal(px, expected_rgb(yp, cb2, cr2))

        # 4:2:2 (horizontal-only subsampling), chroma constant per 16x8
        cb3 = ((23 * (xx // 16) + 7 * (yy // 8) + 5) % 256).astype(np.uint8)
        cr3 = ((31 * (xx // 16) + 19 * (yy // 8) + 3) % 256).astype(
            np.uint8
        )
        blob = encode_jpeg_planes(
            [yp, cb3, cr3], subsample=(2, 1), quant_tables=(ql, qc)
        )
        fw, fh, ch, px = decode_jpeg(blob)
        assert (fw, fh, ch) == (w, h, 3)
        assert np.array_equal(px, expected_rgb(yp, cb3, cr3))

    def test_jpeg_fill_bytes_and_multiscan(self):
        """T.81 B.1.1.2 allows 0xFF fill bytes before any marker — they
        must not desync the marker walk; a second SOS (non-interleaved
        multi-scan) must fail honestly, never decode partial pixels."""
        import struct

        import numpy as np
        import pytest

        from pg_vectorize_spark.multimodal.codec import (
            decode_jpeg,
            encode_jpeg,
        )

        g = (np.arange(16 * 16).reshape(16, 16) % 256).astype(np.uint8)
        blob = encode_jpeg(g[:, :, None])
        i = blob.index(b"\xff\xc0")
        padded = blob[:i] + b"\xff\xff\xff" + blob[i:]
        _, _, _, px1 = decode_jpeg(blob)
        _, _, _, px2 = decode_jpeg(padded)
        assert np.array_equal(px1, px2)

        s = blob.index(b"\xff\xda")
        (slen,) = struct.unpack(">H", blob[s + 2 : s + 4])
        multi = blob[:s] + blob[s : s + 2 + slen] + blob[s:]
        with pytest.raises(NotImplementedError, match="multi-scan"):
            decode_jpeg(multi)

    def test_jpeg_flat_quant_near_lossless(self):
        """quant=1 tables exercise the full AC Huffman path (run-lengths,
        ZRL, EOB, byte stuffing) on random content; only DCT-coefficient
        rounding remains, so per-plane error is at most 1."""
        import numpy as np

        from pg_vectorize_spark.multimodal.codec import (
            decode_jpeg,
            encode_jpeg,
        )

        rng = np.random.RandomState(7)
        flat = (np.ones(64, dtype=np.int64), np.ones(64, dtype=np.int64))
        for dims in [(16, 16), (19, 13), (8, 40)]:
            g = rng.randint(0, 256, size=dims).astype(np.uint8)
            blob = encode_jpeg(g[:, :, None], quant_tables=flat)
            fw, fh, ch, px = decode_jpeg(blob)
            assert (fw, fh, ch) == (dims[1], dims[0], 1)
            err = np.abs(
                px[:, :, 0].astype(int) - g.astype(int)
            ).max()
            assert err <= 1, f"{dims}: err {err}"

    def test_jpeg_standard_tables_smooth_roundtrip(self):
        """Annex-K tables on smooth content: the normal lossy path stays
        within a tight perceptual bound (sanity on quant/dequant scaling,
        not a strict-equality check)."""
        import numpy as np

        from pg_vectorize_spark.multimodal.codec import (
            decode_jpeg,
            encode_jpeg,
        )

        yy, xx = np.mgrid[0:24, 0:40]
        smooth = np.stack(
            [
                (128 + 80 * np.sin(xx / 10.0) * np.cos(yy / 7.0)).astype(
                    np.uint8
                ),
                (128 + 60 * np.cos(xx / 9.0)).astype(np.uint8),
                (128 + 50 * np.sin(yy / 8.0)).astype(np.uint8),
            ],
            axis=2,
        )
        blob = encode_jpeg(smooth)
        fw, fh, ch, px = decode_jpeg(blob)
        assert (fw, fh, ch) == (40, 24, 3)
        err = np.abs(px.astype(int) - smooth.astype(int)).max()
        assert err <= 20, f"max err {err}"

    def test_decode_media_real(self, spark):
        """fake=False over the committed fixture: real decode through the
        Arrow mapInPandas path, dims match the fixture's stored truth."""
        from pg_vectorize_spark.multimodal.binary import decode_media

        media = spark.read.parquet(
            "/root/repo/tests/fixtures/media_fixture.parquet"
        )
        got = {
            r["pkey"]: r
            for r in decode_media(
                media, "content", "media_id", fake=False
            ).collect()
        }
        for r in media.select("media_id", "width", "height", "channels").collect():
            d = got[r["media_id"]]
            assert (d["width"], d["height"], d["n_channels"]) == (
                r["width"],
                r["height"],
                r["channels"],
            )
            assert abs(sum(d["features"]) - 1.0) < 1e-12


class TestCodecRoundtripProperties:
    """VERDICT r3 #7: random images through the repo's own PNG encoder ->
    decoder must reproduce the exact matrix, with EVERY filter type
    (None/Sub/Up/Average/Paeth) forced on every scanline — exhaustive
    coverage of the horizontal/vertical recurrence unfilter paths."""

    @pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
    @pytest.mark.parametrize("channels", [1, 2, 3, 4])
    @pytest.mark.parametrize("seed", [0, 1])
    def test_png_roundtrip_all_filters(self, filter_type, channels, seed):
        import numpy as np

        from pg_vectorize_spark.multimodal.codec import decode_png, encode_png

        rng = np.random.RandomState(1000 * filter_type + 10 * channels + seed)
        h, w = rng.randint(1, 17), rng.randint(1, 17)
        px = rng.randint(0, 256, size=(h, w, channels)).astype(np.uint8)
        blob = encode_png(px, filter_type=filter_type)
        gw, gh, gch, got = decode_png(blob)
        assert (gw, gh, gch) == (w, h, channels)
        assert np.array_equal(got, px)

    def test_png_roundtrip_hypothesis(self):
        import numpy as np
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from pg_vectorize_spark.multimodal.codec import decode_png, encode_png

        @settings(max_examples=60, deadline=None)
        @given(
            h=st.integers(1, 12),
            w=st.integers(1, 12),
            ch=st.sampled_from([1, 2, 3, 4]),
            filter_type=st.integers(0, 4),
            seed=st.integers(0, 2**31 - 1),
        )
        def check(h, w, ch, filter_type, seed):
            px = (
                np.random.RandomState(seed)
                .randint(0, 256, size=(h, w, ch))
                .astype(np.uint8)
            )
            _, _, _, got = decode_png(encode_png(px, filter_type=filter_type))
            assert np.array_equal(got, px)

        check()

    def test_wav_roundtrip_hypothesis(self):
        import numpy as np
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from pg_vectorize_spark.multimodal.codec import decode_wav, encode_wav

        @settings(max_examples=40, deadline=None)
        @given(
            frames=st.integers(1, 200),
            ch=st.sampled_from([1, 2]),
            seed=st.integers(0, 2**31 - 1),
        )
        def check(frames, ch, seed):
            s = (
                np.random.RandomState(seed)
                .randint(-32768, 32768, size=(frames, ch))
                .astype(np.int64)
            )
            nframes, nch, got = decode_wav(encode_wav(s))
            assert (nframes, nch) == (frames, ch)
            assert np.array_equal(got, s)

        check()

    @pytest.mark.parametrize("filter_type", [1, 3, 4])
    def test_adversarial_gradient_images(self, filter_type):
        """Gradients maximize predictor agreement (worst case for sign /
        rounding bugs in Sub/Average/Paeth)."""
        import numpy as np

        from pg_vectorize_spark.multimodal.codec import decode_png, encode_png

        h = w = 24
        yy, xx = np.mgrid[0:h, 0:w]
        px = np.stack(
            [(yy * 11) % 256, (xx * 7) % 256, ((yy + xx) * 3) % 256], axis=2
        ).astype(np.uint8)
        _, _, _, got = decode_png(encode_png(px, filter_type=filter_type))
        assert np.array_equal(got, px)


class TestPalettePng:
    def test_palette_roundtrip_all_filters(self):
        import numpy as np

        from pg_vectorize_spark.multimodal.codec import (
            decode_png,
            encode_png_palette,
        )

        rng = np.random.RandomState(3)
        pal = rng.randint(0, 256, size=(64, 3)).astype(np.uint8)
        for ft in range(5):
            idx = rng.randint(0, 64, size=(21, 33)).astype(np.uint8)
            w, h, ch, px = decode_png(encode_png_palette(idx, pal, ft))
            assert (w, h, ch) == (33, 21, 3)
            assert np.array_equal(px, pal[idx]), f"filter {ft}"

    def test_palette_missing_plte_raises(self):
        import numpy as np
        import pytest

        from pg_vectorize_spark.multimodal.codec import (
            decode_png,
            encode_png_palette,
        )

        pal = np.zeros((4, 3), dtype=np.uint8)
        idx = np.zeros((8, 8), dtype=np.uint8)
        blob = encode_png_palette(idx, pal)
        # strip the PLTE chunk: magic+IHDR(25 bytes) | PLTE(8+12) | rest
        plte_start = blob.index(b"PLTE") - 4
        plte_len = 12 + 12  # len+type+4*3 body+crc
        broken = blob[:plte_start] + blob[plte_start + plte_len :]
        with pytest.raises(ValueError, match="missing PLTE"):
            decode_png(broken)


class TestJpegRoundtripProperties:
    """Hypothesis sweeps over the JPEG codec: (a) arbitrary-dim random
    grayscale through flat-quant tables stays within the DCT-rounding
    bound; (b) random block-constant multi-config color images with DC
    quant 8 are bit-exact — the fixture-law contract under random
    dims/sampling/restart settings, not just the committed fixtures."""

    def test_flat_quant_bound_hypothesis(self):
        import numpy as np
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from pg_vectorize_spark.multimodal.codec import (
            decode_jpeg,
            encode_jpeg,
        )

        flat = (np.ones(64, dtype=np.int64), np.ones(64, dtype=np.int64))

        @settings(max_examples=25, deadline=None)
        @given(
            h=st.integers(1, 24),
            w=st.integers(1, 24),
            seed=st.integers(0, 2**31 - 1),
        )
        def check(h, w, seed):
            rng = np.random.RandomState(seed)
            g = rng.randint(0, 256, size=(h, w)).astype(np.uint8)
            fw, fh, ch, px = decode_jpeg(
                encode_jpeg(g[:, :, None], quant_tables=flat)
            )
            assert (fw, fh, ch) == (w, h, 1)
            err = np.abs(px[:, :, 0].astype(int) - g.astype(int)).max()
            assert err <= 1, (h, w, seed, err)

        check()

    def test_block_constant_exact_hypothesis(self):
        import numpy as np
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from pg_vectorize_spark.multimodal.codec import (
            _STD_QUANT_CHROMA,
            _STD_QUANT_LUMA,
            decode_jpeg,
            encode_jpeg_planes,
        )

        ql = _STD_QUANT_LUMA.copy()
        ql[0] = 8
        qc = _STD_QUANT_CHROMA.copy()
        qc[0] = 8

        @settings(max_examples=20, deadline=None)
        @given(
            bw=st.integers(1, 5),
            bh=st.integers(1, 5),
            sub=st.sampled_from([(1, 1), (2, 1), (2, 2)]),
            rst=st.sampled_from([0, 1, 3]),
            seed=st.integers(0, 2**31 - 1),
        )
        def check(bw, bh, sub, rst, seed):
            rng = np.random.RandomState(seed)
            sh, sv = sub
            # luma blocks 8x8; chroma constant per (8*sh x 8*sv) region
            # so decimation + nearest upsample are exact
            h, w = bh * 8 * sv, bw * 8 * sh
            yy, xx = np.mgrid[0:h, 0:w]
            yvals = rng.randint(0, 256, size=(bh * sv, bw * sh))
            yp = yvals[yy // 8, xx // 8].astype(np.uint8)
            cbv = rng.randint(0, 256, size=(bh, bw))
            crv = rng.randint(0, 256, size=(bh, bw))
            cb = cbv[yy // (8 * sv), xx // (8 * sh)].astype(np.uint8)
            cr = crv[yy // (8 * sv), xx // (8 * sh)].astype(np.uint8)
            blob = encode_jpeg_planes(
                [yp, cb, cr],
                subsample=sub,
                restart_interval=rst,
                quant_tables=(ql, qc),
            )
            fw, fh, ch, px = decode_jpeg(blob)
            assert (fw, fh, ch) == (w, h, 3)
            yf = yp.astype(np.float64)
            cbf = cb.astype(np.float64) - 128.0
            crf = cr.astype(np.float64) - 128.0
            exp = np.stack(
                [
                    np.clip(np.floor(p + 0.5), 0, 255).astype(np.uint8)
                    for p in (
                        yf + 1.402 * crf,
                        yf - 0.344136 * cbf - 0.714136 * crf,
                        yf + 1.772 * cbf,
                    )
                ],
                axis=2,
            )
            assert np.array_equal(px, exp), (bw, bh, sub, rst, seed)

        check()


class TestMp4Metadata:
    def test_parse_roundtrip(self):
        from pg_vectorize_spark.multimodal.codec import (
            encode_minimal_mp4,
            parse_mp4_metadata,
            sniff_format,
        )

        blob = encode_minimal_mp4(12.5, 640, 360, with_audio=True)
        assert sniff_format(blob) == "mp4"
        meta = parse_mp4_metadata(blob)
        assert meta["brand"] == "isom"
        assert meta["duration_seconds"] == 12.5
        assert meta["n_tracks"] == 2
        vid = meta["tracks"][0]
        assert (vid["handler"], vid["width"], vid["height"]) == (
            "vide", 640, 360,
        )
        assert meta["tracks"][1]["handler"] == "soun"

    def test_decode_features_still_honest_for_mp4(self):
        import pytest

        from pg_vectorize_spark.multimodal.codec import (
            decode_features,
            encode_minimal_mp4,
        )

        with pytest.raises(NotImplementedError):
            decode_features(encode_minimal_mp4(1.0, 64, 64))

    def test_spark_mp4_metadata_mixed_column(self, spark):
        """Mixed media column: MP4 rows parse, non-MP4 rows yield NULLs
        instead of failing the batch."""
        from pg_vectorize_spark.multimodal.binary import mp4_metadata
        from pg_vectorize_spark.multimodal.codec import encode_minimal_mp4

        rows = [
            (1, bytearray(encode_minimal_mp4(30.0, 1280, 720))),
            (2, bytearray(encode_minimal_mp4(5.25, 320, 240, True))),
            (3, bytearray(b"\x89PNG not really a video")),
            (4, bytearray(b"")),
        ]
        df = spark.createDataFrame(rows, "id long, content binary")
        got = {
            r["pkey"]: r for r in mp4_metadata(df, "content", "id").collect()
        }
        assert got[1]["duration_seconds"] == 30.0
        assert (got[1]["video_width"], got[1]["video_height"]) == (1280, 720)
        assert got[1]["has_audio"] is False
        assert got[2]["has_audio"] is True
        assert got[2]["n_tracks"] == 2
        assert got[3]["brand"] is None
        assert got[4]["brand"] is None


class TestMp4FrameExtraction:
    """Container-level frame extraction (parse_mp4_samples +
    mp4_frame_sample): exact sample byte ranges, timestamps, and
    keyframe flags from the ISO-BMFF sample tables."""

    def _blob(self, n=7, ke=3, spc=2):
        from pg_vectorize_spark.multimodal.codec import (
            encode_mp4_with_samples,
        )

        samples = [bytes([65 + i]) * (10 + (3 * i) % 23) for i in range(n)]
        return samples, encode_mp4_with_samples(
            samples, samples_per_chunk=spc, fps=10, keyframe_every=ke
        )

    def test_sample_roundtrip_payloads_exact(self):
        from pg_vectorize_spark.multimodal.codec import parse_mp4_samples

        samples, blob = self._blob()
        got = parse_mp4_samples(blob)
        assert [s["index"] for s in got] == list(range(7))
        for i, s in enumerate(got):
            assert blob[s["offset"] : s["offset"] + s["size"]] == samples[i]
            assert s["keyframe"] == (i % 3 == 0)
            assert abs(s["ts_seconds"] - i * 0.1) < 1e-12

    def test_not_a_video_raises(self):
        from pg_vectorize_spark.multimodal.codec import (
            encode_minimal_mp4,
            parse_mp4_samples,
        )

        with pytest.raises(ValueError):
            parse_mp4_samples(b"\x00" * 40)
        # metadata-only MP4 (no stbl sample tables on its video track)
        with pytest.raises(ValueError, match="stsz|video"):
            parse_mp4_samples(encode_minimal_mp4(1.0, 64, 64))

    def test_spark_extractor_keyframes_and_stride(self, spark):
        from pg_vectorize_spark.multimodal.binary import mp4_frame_sample

        samples, blob = self._blob(n=8, ke=2)
        df = spark.createDataFrame(
            [("vid-1", blob), ("not-a-video", b"junk"), ("null-row", None)],
            "mid string, video binary",
        )
        allf = mp4_frame_sample(df, "video", "mid")
        assert allf.schema["pkey"].dataType.simpleString() == "string"
        rows = allf.collect()
        assert {r["pkey"] for r in rows} == {"vid-1"}  # junk -> zero rows
        assert len(rows) == 8
        by_idx = {r["frame_idx"]: r for r in rows}
        for i, payload in enumerate(samples):
            assert bytes(by_idx[i]["frame_bytes"]) == payload
        keys = mp4_frame_sample(
            df, "video", "mid", keyframes_only=True
        ).collect()
        assert sorted(r["frame_idx"] for r in keys) == [0, 2, 4, 6]
        every2 = mp4_frame_sample(
            df, "video", "mid", keyframes_only=True, every_n=2
        ).collect()
        assert sorted(r["frame_idx"] for r in every2) == [0, 4]


class TestProgressiveJpeg:
    """Progressive (SOF2) decode: the progressive byte stream carries
    the SAME quantized coefficients as the sequential one (shared DCT +
    quant front half), so decode must be PIXEL-IDENTICAL to the
    baseline decode — across subsampling modes, odd dimensions, band
    splits, and successive-approximation depths."""

    def _identical(self, planes, sub=(1, 1), **kw):
        import numpy as np

        from pg_vectorize_spark.multimodal.codec import (
            decode_jpeg,
            encode_jpeg_planes,
            encode_jpeg_planes_progressive,
        )

        base = decode_jpeg(encode_jpeg_planes(planes, subsample=sub))
        prog = decode_jpeg(
            encode_jpeg_planes_progressive(planes, subsample=sub, **kw)
        )
        assert base[:3] == prog[:3]
        assert np.array_equal(base[3], prog[3])

    def test_grayscale_odd_dims(self):
        import numpy as np

        rng = np.random.RandomState(5)
        self._identical([rng.randint(0, 256, (13, 17)).astype(np.uint8)])

    @pytest.mark.parametrize("sub", [(1, 1), (2, 1), (1, 2), (2, 2)])
    def test_color_all_subsampling(self, sub):
        import numpy as np

        rng = np.random.RandomState(7)
        planes = [
            rng.randint(0, 256, (20, 28)).astype(np.uint8) for _ in range(3)
        ]
        self._identical(planes, sub=sub)

    @pytest.mark.parametrize("al_first", [1, 2, 3])
    def test_successive_approximation_depths(self, al_first):
        import numpy as np

        rng = np.random.RandomState(al_first)
        planes = [
            rng.randint(0, 256, (24, 24)).astype(np.uint8) for _ in range(3)
        ]
        self._identical(planes, sub=(2, 2), al_first=al_first)

    @pytest.mark.parametrize("band_split", [1, 20, 62])
    def test_narrow_spectral_bands(self, band_split):
        """Degenerate bands ([1,1] / [63,63]) exercise the EOB-run and
        ZRL-with-correction-bits interleave that desyncs naive
        refinement coders."""
        import numpy as np

        rng = np.random.RandomState(band_split)
        self._identical(
            [rng.randint(0, 256, (17, 32)).astype(np.uint8)],
            band_split=band_split,
        )

    def test_sparse_spike_block(self):
        """Near-constant plane with one spike: long zero runs -> EOB
        runs in every scan kind."""
        import numpy as np

        p = np.full((40, 40), 77, dtype=np.uint8)
        p[20, 20] = 255
        self._identical([p])

    def test_decode_features_routes_progressive(self):
        """The decode_features front door (the multimodal_decode gate's
        engine) accepts progressive bytes transparently."""
        import numpy as np

        from pg_vectorize_spark.multimodal.codec import (
            decode_features,
            encode_jpeg_planes,
            encode_jpeg_planes_progressive,
        )

        rng = np.random.RandomState(9)
        planes = [
            rng.randint(0, 256, (16, 16)).astype(np.uint8) for _ in range(3)
        ]
        a = decode_features(encode_jpeg_planes(planes), 8)
        b = decode_features(encode_jpeg_planes_progressive(planes), 8)
        assert a == b


class TestMp4Hardening:
    """Corrupt/adversarial blobs must yield clean errors (codec) and
    zero rows (Spark operators) — never multi-GB allocations or
    uncaught IndexError killing the task."""

    def _adversarial_blob(self):
        import struct

        def box(t, b):
            return struct.pack(">I", len(b) + 8) + t + b

        # stsz declares fixed sample size 100 x 2^31 samples in a
        # 150-byte blob
        stsz = box(b"stsz", b"\x00" * 4 + struct.pack(">II", 100, 1 << 31))
        stsc = box(b"stsc", b"\x00" * 4 + struct.pack(">I", 0))
        stco = box(b"stco", b"\x00" * 4 + struct.pack(">I", 0))
        stbl = box(b"stbl", stsz + stsc + stco)
        hdlr = box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 13)
        mdia = box(b"mdia", hdlr + box(b"minf", stbl))
        return box(b"ftyp", b"isom" + b"\x00" * 12) + box(
            b"moov", box(b"trak", mdia)
        )

    def test_declared_count_bounded(self):
        from pg_vectorize_spark.multimodal.codec import parse_mp4_samples

        with pytest.raises(ValueError, match="exceeds"):
            parse_mp4_samples(self._adversarial_blob())

    def test_truncated_blobs_raise_clean_errors_only(self):
        from struct import error as struct_error

        from pg_vectorize_spark.multimodal.codec import (
            encode_mp4_with_samples,
            parse_mp4_samples,
        )

        blob = encode_mp4_with_samples([b"x" * 20 for _ in range(3)])
        # moov is in the prefix: truncations may parse (mdat clipped) or
        # raise an error the Spark operators CATCH (ValueError /
        # struct.error) — never an uncaught IndexError/MemoryError
        for cut in range(8, len(blob), 7):
            try:
                parse_mp4_samples(blob[:cut])
            except (ValueError, struct_error):
                pass

    def test_spark_operator_survives_adversarial_blob(self, spark):
        from pg_vectorize_spark.multimodal.binary import (
            mp4_frame_sample,
            mp4_metadata,
        )
        from pg_vectorize_spark.multimodal.codec import (
            encode_mp4_with_samples,
        )

        good = encode_mp4_with_samples([b"ok" * 10])
        df = spark.createDataFrame(
            [(1, self._adversarial_blob()), (2, good)],
            "id long, video binary",
        )
        rows = mp4_frame_sample(df, "video", "id").collect()
        assert {r["pkey"] for r in rows} == {2}  # bad blob: zero rows
        meta = {r["pkey"]: r for r in mp4_metadata(df, "video", "id").collect()}
        assert len(meta) == 2  # metadata row exists (NULLs ok) for both


class TestMp3FrameParsing:
    """MPEG-audio frame-header walk (codec.parse_mp3_frames): spec
    arithmetic, ID3 skip, CBR/VBR, version branches, and the honest
    rejections (Layer I/II, free-format, mixed streams, no sync)."""

    def test_cbr_mpeg1_roundtrip(self):
        from pg_vectorize_spark.multimodal.codec import (
            encode_mp3_frames,
            parse_mp3_frames,
        )

        blob = encode_mp3_frames([(9, 0)] * 5)  # 128 kbps @ 44100
        m = parse_mp3_frames(blob)
        assert m["version"] == "MPEG1" and m["sample_rate"] == 44100
        assert m["n_frames"] == 5 and not m["is_vbr"]
        assert m["bitrate_kbps_mean"] == 128.0
        # spec frame length: 144*128000//44100 = 417
        assert all(f["size"] == 417 for f in m["frames"])
        assert m["duration_seconds"] == (5 * 1152) / 44100.0
        assert not m["has_id3"] and not m["has_crc"]

    def test_id3_skip_vbr_padding(self):
        from pg_vectorize_spark.multimodal.codec import (
            encode_mp3_frames,
            parse_mp3_frames,
        )

        blob = encode_mp3_frames(
            [(9, 0), (11, 1), (14, 0)], id3_size=200
        )
        m = parse_mp3_frames(blob)
        assert m["has_id3"] and m["is_vbr"]
        assert m["frames"][0]["offset"] == 210  # 10-byte header + 200
        assert m["frames"][1]["size"] == 144 * 192000 // 44100 + 1
        assert m["bitrate_kbps_mean"] == (128 + 192 + 320) / 3.0

    def test_mpeg2_crc_mono(self):
        from pg_vectorize_spark.multimodal.codec import (
            encode_mp3_frames,
            parse_mp3_frames,
        )

        blob = encode_mp3_frames(
            [(5, 0)] * 3, version="MPEG2", sr_idx=2, channel_mode=3,
            crc=True,
        )
        m = parse_mp3_frames(blob)
        assert m["version"] == "MPEG2" and m["sample_rate"] == 16000
        assert m["channel_mode"] == "mono" and m["has_crc"]
        assert m["duration_seconds"] == (3 * 576) / 16000.0
        assert m["frames"][0]["size"] == 72 * 40000 // 16000

    def test_trailing_garbage_ends_walk(self):
        from pg_vectorize_spark.multimodal.codec import (
            encode_mp3_frames,
            parse_mp3_frames,
        )

        blob = encode_mp3_frames([(9, 0)] * 2) + b"TAG" + bytes(125)
        m = parse_mp3_frames(blob)
        assert m["n_frames"] == 2  # ID3v1-style trailer tolerated

    def test_rejections(self):
        import pytest as _pytest

        from pg_vectorize_spark.multimodal.codec import (
            encode_mp3_frames,
            parse_mp3_frames,
        )

        with _pytest.raises(ValueError, match="sync"):
            parse_mp3_frames(b"not audio at all")
        with _pytest.raises(ValueError, match="no MPEG audio frames"):
            parse_mp3_frames(b"")
        # Layer II header: layer bits 10 -> second byte 0xFD
        with _pytest.raises(ValueError, match="Layer III"):
            parse_mp3_frames(bytes([0xFF, 0xFD, 0x90, 0x40]) + bytes(400))
        # free-format bitrate index 0
        with _pytest.raises(ValueError, match="bitrate"):
            parse_mp3_frames(bytes([0xFF, 0xFB, 0x00, 0x40]))
        # mixed sample rate: second frame sr_idx differs
        a = encode_mp3_frames([(9, 0)], sr_idx=0)
        b = encode_mp3_frames([(9, 0)], sr_idx=1)
        with _pytest.raises(ValueError, match="mixed"):
            parse_mp3_frames(a + b)

    def test_operator_null_for_non_mp3(self, spark):
        from pg_vectorize_spark.multimodal.binary import mp3_metadata
        from pg_vectorize_spark.multimodal.codec import encode_mp3_frames

        df = spark.createDataFrame(
            [(1, encode_mp3_frames([(9, 0)] * 4)), (2, b"\x89PNG junk"),
             (3, None)],
            "id long, audio binary",
        )
        rows = {r["pkey"]: r for r in mp3_metadata(
            df, "audio", "id"
        ).collect()}
        assert rows[1]["n_frames"] == 4
        assert rows[1]["stream_bytes"] == 4 * (144 * 128000 // 44100)
        assert rows[2]["version"] is None and rows[3]["version"] is None

"""Real multimodal codecs (functions/codecs.py): BMP/WAV roundtrips,
deterministic resize arithmetic, and the end-to-end real pipelines
(multimodal_real_decode / multimodal_audio_features) checked against
direct local recomputation — the injected kernels must produce exactly
what the codec produces outside Ray."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from job_crawler_ray.functions.codecs import (
    WavFeatureExtractor,
    bmp_codec,
    bmp_resize,
    decode_bmp,
    decode_wav,
    encode_bmp,
    encode_wav,
)


class TestBmpCodec:
    def test_roundtrip_with_padding(self):
        rng = np.random.default_rng(3)
        for h, w in [(1, 1), (5, 3), (7, 10), (16, 16), (24, 33)]:
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            w2, h2, back = decode_bmp(encode_bmp(px))
            assert (w2, h2) == (w, h)
            assert np.array_equal(back, px)

    def test_resize_is_integer_block_mean(self):
        px = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
        w2, h2, small = decode_bmp(bmp_resize(encode_bmp(px), 2))
        exp = (
            px.astype(np.uint32).reshape(4, 2, 4, 2, 3).sum((1, 3)) // 4
        ).astype(np.uint8)
        assert (w2, h2) == (4, 4)
        assert np.array_equal(small, exp)

    def test_odd_dims_crop_to_factor_multiple(self):
        px = np.zeros((7, 9, 3), dtype=np.uint8)
        w2, h2, _ = decode_bmp(bmp_resize(encode_bmp(px), 2))
        assert (w2, h2) == (4, 3)

    def test_degrades_on_garbage(self):
        for bad in [None, b"", b"JUNKJUNKJUNKJUNK" * 8]:
            with pytest.raises(NotImplementedError):
                decode_bmp(bad)
        assert bmp_resize(b"NOTABMP" * 20, 2) is None

    def test_codec_adapter(self):
        px = np.full((6, 4, 3), 9, dtype=np.uint8)
        w, h, nbytes = bmp_codec(encode_bmp(px))
        assert (w, h, nbytes) == (4, 6, 6 * 4 * 3)


class TestWavCodec:
    def test_roundtrip(self):
        s = (np.sin(np.linspace(0, 20, 1000)) * 3000).astype(np.int16)
        rate, back = decode_wav(encode_wav(s, 8000))
        assert rate == 8000
        assert np.array_equal(back, s)

    def test_extra_chunk_tolerated(self):
        import struct

        s = np.arange(100, dtype=np.int16)
        raw = encode_wav(s, 8000)
        # splice a LIST chunk between fmt and data
        extra = struct.pack("<4sI", b"LIST", 4) + b"INFO"
        patched = raw[:36] + extra + raw[36:]
        patched = patched[:4] + (len(patched) - 8).to_bytes(4, "little") \
            + patched[8:]
        rate, back = decode_wav(patched)
        assert rate == 8000
        assert np.array_equal(back, s)

    def test_degrades_on_garbage(self):
        for bad in [None, b"", b"RIFFxxxxJUNK"]:
            with pytest.raises(NotImplementedError):
                decode_wav(bad)

    def test_extractor_batch(self):
        s = np.full(800, 100, dtype=np.int16)
        t = pa.table(
            {"doc_id": pa.array([1, 2], pa.int64()),
             "payload": pa.array([encode_wav(s, 8000), b"JUNK"],
                                 pa.binary())}
        )
        out = WavFeatureExtractor()(t).to_pandas().set_index("doc_id")
        assert bool(out.loc[1, "decoded_ok"]) and not bool(
            out.loc[2, "decoded_ok"]
        )
        assert out.loc[1, "n_samples"] == 800
        assert out.loc[1, "duration_s"] == 0.1
        assert out.loc[1, "rms"] == 100.0


class TestRealPipelines:
    def test_real_decode_matches_local_recompute(self, sf_small, ray_session):
        from job_crawler_ray.pipelines.registry import multimodal_real_decode
        from job_crawler_ray.pipelines.textops import synth_bmp_payloads
        from job_crawler_ray.util import read_parquet_clean

        out = (
            multimodal_real_decode(sf_small)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        docs = (
            read_parquet_clean(
                f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
            )
            .to_pandas()
            .sort_values("doc_id")
        )
        local = synth_bmp_payloads(
            pa.Table.from_pandas(docs, preserve_index=False)
        )
        ids = local["doc_id"].to_pylist()
        for doc_id, p in zip(ids[:50], local["payload"].to_pylist()[:50]):
            w, h, px = decode_bmp(bmp_resize(p, 2))
            row = out.loc[doc_id]
            assert (row["width"], row["height"]) == (w, h)
            assert row["body_bytes"] == px.nbytes
            assert bool(row["decoded_ok"])
        assert out["decoded_ok"].all()

    def test_audio_features_match_local_recompute(self, sf_small, ray_session):
        from job_crawler_ray.pipelines.registry import (
            multimodal_audio_features,
        )
        from job_crawler_ray.pipelines.textops import synth_wav_payloads
        from job_crawler_ray.util import read_parquet_clean

        out = (
            multimodal_audio_features(sf_small)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        docs = (
            read_parquet_clean(
                f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
            )
            .to_pandas()
            .sort_values("doc_id")
        )
        local = synth_wav_payloads(
            pa.Table.from_pandas(docs, preserve_index=False)
        )
        ids = local["doc_id"].to_pylist()
        for doc_id, p in zip(ids[:50], local["payload"].to_pylist()[:50]):
            rate, s = decode_wav(p)
            row = out.loc[doc_id]
            assert row["sample_rate"] == rate
            assert row["n_samples"] == len(s)
            assert row["rms"] == round(
                float(np.sqrt((s.astype(np.float64) ** 2).mean())), 6
            )
        assert out["decoded_ok"].all()


class TestRealVideo:
    def test_rawv_roundtrip_and_sampling(self):
        from job_crawler_ray.functions.codecs import (
            encode_bmp,
            encode_rawv,
            rawv_frames,
        )

        frames = [
            encode_bmp(np.full((4, 6, 3), f * 10, dtype=np.uint8))
            for f in range(5)
        ]
        payload = encode_rawv(frames)
        got = list(rawv_frames(payload, 2))
        assert [i for i, _ in got] == [0, 2, 4]
        for i, fr in got:
            w, h, px = decode_bmp(fr)
            assert (w, h) == (6, 4) and (px == i * 10).all()
        assert rawv_frames(b"JUNK", 2) is None

    def test_real_video_pipeline_decodes_every_frame(
        self, sf_small, ray_session
    ):
        from job_crawler_ray.pipelines.registry import multimodal_real_video
        from job_crawler_ray.pipelines.textops import synth_rawv_payloads
        from job_crawler_ray.functions.codecs import rawv_frames
        from job_crawler_ray.util import read_parquet_clean

        out = multimodal_real_video(sf_small).to_pandas()
        assert out["decoded_ok"].all()
        # recompute parity for a handful of docs
        docs = (
            read_parquet_clean(
                f"{sf_small}/documents.parquet", columns=["doc_id", "text"]
            )
            .to_pandas()
            .sort_values("doc_id")
            .head(10)
        )
        local = synth_rawv_payloads(
            pa.Table.from_pandas(docs, preserve_index=False)
        )
        for doc_id, p in zip(local["doc_id"].to_pylist(),
                             local["payload"].to_pylist()):
            want = [(i, *decode_bmp(fr)[:2]) for i, fr in rawv_frames(p, 2)]
            sub = out[out["doc_id"] == doc_id].sort_values("frame_idx")
            assert list(sub["frame_idx"]) == [i for i, _, _ in want]
            assert list(sub["width"]) == [w for _, w, _ in want]
            assert list(sub["height"]) == [h for _, _, h in want]

    def test_audio_resample_pipeline_halves_rate(self, sf_small, ray_session):
        from job_crawler_ray.pipelines.registry import (
            multimodal_audio_features,
            multimodal_audio_resample,
        )

        base = (
            multimodal_audio_features(sf_small)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        out = (
            multimodal_audio_resample(sf_small)
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert out["decoded_ok"].all()
        assert (out["sample_rate"] == 4000).all()
        # duration preserved within one source sample (trailing crop)
        assert (
            (base["duration_s"] - out["duration_s"]).abs() <= 2 / 8000 + 1e-9
        ).all()
        assert (out["n_samples"] * 2 - base["n_samples"]).abs().max() <= 1


class TestCodecProperties:
    def test_bmp_roundtrip_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=40, deadline=None)
        @given(
            h=st.integers(min_value=1, max_value=40),
            w=st.integers(min_value=1, max_value=40),
            seed=st.integers(min_value=0, max_value=2**31 - 1),
        )
        def roundtrip(h, w, seed):
            px = np.random.default_rng(seed).integers(
                0, 256, (h, w, 3), dtype=np.uint8
            )
            w2, h2, back = decode_bmp(encode_bmp(px))
            assert (w2, h2) == (w, h)
            assert np.array_equal(back, px)

        roundtrip()

    def test_wav_roundtrip_property(self):
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=40, deadline=None)
        @given(
            n=st.integers(min_value=0, max_value=5000),
            rate=st.sampled_from([8000, 16000, 44100]),
            seed=st.integers(min_value=0, max_value=2**31 - 1),
        )
        def roundtrip(n, rate, seed):
            s = np.random.default_rng(seed).integers(
                -32768, 32768, n, dtype=np.int64
            ).astype(np.int16)
            r, back = decode_wav(encode_wav(s, rate))
            assert r == rate
            assert np.array_equal(back, s)

        roundtrip()

    def test_bmp_resize_bounds_property(self):
        """Resized pixels are always within the min/max of their
        source block (integer block mean can't escape the range)."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        @settings(max_examples=25, deadline=None)
        @given(
            h=st.integers(min_value=2, max_value=24),
            w=st.integers(min_value=2, max_value=24),
            f=st.sampled_from([2, 3]),
            seed=st.integers(min_value=0, max_value=2**31 - 1),
        )
        def bounds(h, w, f, seed):
            if h < f or w < f:
                return
            px = np.random.default_rng(seed).integers(
                0, 256, (h, w, 3), dtype=np.uint8
            )
            out = bmp_resize(encode_bmp(px), f)
            if out is None:
                return
            _, _, small = decode_bmp(out)
            hh, ww = (h // f) * f, (w // f) * f
            blocks = px[:hh, :ww].reshape(hh // f, f, ww // f, f, 3)
            assert (small >= blocks.min(axis=(1, 3))).all()
            assert (small <= blocks.max(axis=(1, 3))).all()

        bounds()

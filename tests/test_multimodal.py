"""Multimodal binary columns: REAL wav/ppm decode + stubbed video plumbing."""

import hashlib
import math

import pytest

from timberjack_spark.operators.multimodal import (
    FEATURE_DIM,
    _ppm_params,
    _wav_params,
    decode_audio,
    decode_image,
    decode_video,
    extract_audio_features,
    extract_features,
    extract_image_features,
    fake_features,
    ppm_bytes,
    synthesize_audio_media,
    synthesize_image_media,
    synthesize_media,
    wav_bytes,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return synthesize_media(docs)


def test_media_schema(media):
    assert media.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,payload:binary,width:int,height:int,duration_ms:int>"
    )
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_feature_extraction_deterministic(spark, media):
    feats = extract_features(media).orderBy("media_id")
    rows = feats.limit(5).collect()
    docs = {r["doc_id"]: r["text"] for r in
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(5).collect()}
    for r in rows:
        payload = docs[r["media_id"]].encode("utf-8")
        assert r["n_bytes"] == len(payload)
        assert r["sha256"] == hashlib.sha256(payload).hexdigest()
        expected = fake_features(payload)
        assert len(r["feature"]) == FEATURE_DIM
        assert all(abs(a - b) < 1e-7 for a, b in zip(r["feature"], expected))


def test_video_decode_raises_clearly(media):
    with pytest.raises(NotImplementedError, match="ffmpeg/cv2"):
        decode_video(b"\x00fake container")
    with pytest.raises(Exception, match="(?i)notimplemented|ffmpeg/cv2"):
        extract_features(media, real_decode=True).limit(1).collect()


def test_feature_count_conserved(media):
    assert extract_features(media).count() == media.count()


def test_wav_roundtrip_local():
    for mid in (0, 7, 42, 255):
        n, k, amp = _wav_params(mid)
        got = decode_audio(wav_bytes(mid))
        assert got["sr"] == 8000 and got["n_samples"] == n
        assert got["duration_ms"] == n * 1000 // 8000
        assert got["dom_freq_hz"] == k * 8000 / n  # exact FFT bin, no leakage
        assert abs(got["rms"] - amp / math.sqrt(2)) < 1e-3   # quantization only
        assert abs(got["peak"] - amp) < 1e-3
        # a pure tone at bin k crosses zero ~2k times over n samples
        assert abs(got["zcr"] - 2 * k / n) < 0.01


def test_ppm_roundtrip_local():
    for mid in (0, 3, 100, 254):
        w, h, (r, g, b) = _ppm_params(mid)
        got = decode_image(ppm_bytes(mid))
        assert (got["width"], got["height"], got["maxval"]) == (w, h, 255)
        assert (got["mean_r"], got["mean_g"], got["mean_b"]) == (float(r), float(g), float(b))
    with pytest.raises(ValueError, match="P6"):
        decode_image(b"\x89PNG not a ppm")


def test_audio_image_pipeline_distributed(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    au = extract_audio_features(synthesize_audio_media(docs)).collect()
    assert len(au) == 50
    for r in au:
        n, k, amp = _wav_params(r["media_id"])
        assert r["n_samples"] == n and r["dom_freq_hz"] == k * 8000 / n
    im = extract_image_features(synthesize_image_media(docs)).collect()
    for r in im:
        w, h, (cr, cg, cb) = _ppm_params(r["media_id"])
        assert (r["width"], r["height"], r["mean_r"]) == (w, h, float(cr))


def test_batch_synthesis_matches_per_row():
    # the vectorized Arrow-batch twins must be byte-identical to the
    # wave-module / per-row reference builders for every parameter class
    import numpy as np

    from timberjack_spark.operators.multimodal import ppm_bytes_batch, wav_bytes_batch

    ids = np.arange(0, 400, 7)  # covers all (n, k, amp) and (w, h, rgb) classes
    wavs = wav_bytes_batch(ids)
    ppms = ppm_bytes_batch(ids)
    for i, mid in enumerate(ids):
        assert wavs[i] == wav_bytes(int(mid)), mid
        assert ppms[i] == ppm_bytes(int(mid)), mid


def test_batch_audio_decode_matches_per_row():
    import numpy as np

    from timberjack_spark.operators.multimodal import decode_audio_batch, wav_bytes_batch

    ids = np.arange(0, 40)
    payloads = wav_bytes_batch(ids)
    got = decode_audio_batch(payloads)
    for i, mid in enumerate(ids):
        want = decode_audio(payloads[i])
        for k, v in want.items():
            assert got[k][i] == pytest.approx(v), (mid, k)

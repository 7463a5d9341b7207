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


def test_video_decode_rejects_non_y4m(media):
    """The REAL decoder rejects undecodable payloads loudly (codec'd
    containers need ffmpeg, out of scope) — no silent fake features."""
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        decode_video(b"\x00fake container")
    with pytest.raises(Exception, match="YUV4MPEG2"):
        # generic media payloads are text stand-ins, not Y4M containers
        extract_features(media, real_decode=True).limit(1).collect()


def test_y4m_roundtrip_local():
    from timberjack_spark.operators.multimodal import (
        _y4m_params_vec,
        y4m_bytes,
        y4m_bytes_batch,
    )
    import numpy as np

    ids = np.array([0, 7, 42, 255, 1001])
    ws, hs, nfs, y0s, dys, u0s, v0s = _y4m_params_vec(ids)
    batch = y4m_bytes_batch(ids)
    for i, mid in enumerate(ids):
        payload = y4m_bytes(int(mid))
        assert payload == batch[i]  # per-row and batch synthesis byte-equal
        got = decode_video(payload)
        assert (got["width"], got["height"], got["n_frames"]) == (ws[i], hs[i], nfs[i])
        assert got["fps"] == 25.0
        frames = [(int(y0s[i]) + t * int(dys[i])) % 256 for t in range(int(nfs[i]))]
        assert got["mean_y"] == sum(frames) / len(frames)
        assert got["mean_u"] == u0s[i] and got["mean_v"] == v0s[i]
        diffs = [abs(frames[t] - frames[t - 1]) for t in range(1, len(frames))]
        assert got["motion"] == sum(diffs) / len(diffs)


def test_y4m_decode_edge_cases():
    # unsupported chroma mode rejected, not silently mis-sliced
    with pytest.raises(ValueError, match="C420"):
        decode_video(b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C420\nFRAME\n" + b"\x00" * 24)
    # truncated frame data rejected
    with pytest.raises(ValueError, match="truncated"):
        decode_video(b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C444\nFRAME\n" + b"\x00" * 10)
    # frame-level parameters after the FRAME marker are tolerated (spec allows them)
    ok = b"YUV4MPEG2 W2 H2 F30:1 C444\nFRAME Ixyz\n" + bytes([9] * 4 + [5] * 4 + [7] * 4)
    got = decode_video(ok)
    assert got == {
        "width": 2, "height": 2, "n_frames": 1, "fps": 30.0,
        "mean_y": 9.0, "mean_u": 5.0, "mean_v": 7.0, "motion": 0.0,
    }


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

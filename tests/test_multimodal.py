"""Multimodal binary-column plumbing: schema, mapInPandas batches, stubbed decode."""

import hashlib

import pytest

from timberjack_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_image,
    extract_features,
    fake_features,
    synthesize_media,
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


def test_real_decode_raises_clearly(media):
    with pytest.raises(NotImplementedError, match="PIL/cv2"):
        decode_image(b"\x89PNG fake")
    with pytest.raises(Exception, match="(?i)notimplemented|PIL/cv2"):
        extract_features(media, real_decode=True).limit(1).collect()


def test_feature_count_conserved(media):
    assert extract_features(media).count() == media.count()

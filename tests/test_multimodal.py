"""Multimodal plumbing tests: binary payload + metadata schema, the
Arrow-batched decode/feature/resize/frame kernels, and determinism.
The decode itself is a documented fake (no codec libs in the
sandbox); what these tests pin is the Spark-side contract — schemas,
batch shapes, null/empty handling, and reproducibility."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from scrapetition_spark.operators.multimodal import (
    decode_media,
    frame_sample,
    media_features,
    media_from_documents,
    media_metadata,
    resize_images,
)

DOCS = [
    (0, "alpha beta gamma delta", "en"),
    (1, "uno dos tres", "es"),
    (2, "", "en"),  # empty payload edge
    (3, "x" * 300, "en"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text", "lang"])


def test_media_schema_and_metadata(docs):
    m = media_from_documents(docs)
    assert [f.name for f in m.schema.fields] == ["doc_id", "payload", "media"]
    assert m.schema["payload"].dataType.typeName() == "binary"
    meta = {r["doc_id"]: r.asDict() for r in media_metadata(docs).collect()}
    assert meta[0]["format"] == "png" and meta[1]["format"] == "jpeg"
    assert meta[2]["format"] == "wav" and meta[2]["sample_rate"] == 16000
    assert meta[2]["width"] is None  # audio has no dims
    assert meta[3]["n_bytes"] == 300
    assert meta[0]["n_bytes"] == len("alpha beta gamma delta".encode())


def test_decode_digest_matches_hashlib(docs):
    got = {r["doc_id"]: r.asDict() for r in decode_media(media_from_documents(docs)).collect()}
    for doc_id, text, _ in DOCS:
        want = hashlib.md5(text.encode()).hexdigest()
        assert got[doc_id]["digest"] == want
        assert got[doc_id]["n_bytes"] == len(text.encode())


def test_features_shape_and_determinism(docs):
    f1 = media_features(media_from_documents(docs)).orderBy("doc_id").collect()
    f2 = media_features(media_from_documents(docs)).orderBy("doc_id").collect()
    assert f1 == f2  # deterministic
    for r in f1:
        assert len(r["histogram"]) == 8 and len(r["embedding"]) == 8
        if r["doc_id"] != 2:
            assert abs(sum(r["histogram"]) - 1.0) < 1e-6
        else:
            assert r["histogram"] == [0.0] * 8  # empty payload


def test_resize_stub_raises_without_fake(docs):
    with pytest.raises(Exception) as e:
        resize_images(media_from_documents(docs), 4, 4, fake=False).collect()
    assert "NotImplementedError" in str(e.value) or "codec" in str(e.value)


def test_resize_fake_path(docs):
    out = {
        r["doc_id"]: r
        for r in resize_images(media_from_documents(docs), 4, 4, fake=True).collect()
    }
    # only images (wav filtered), every payload resampled to 16 bytes
    assert set(out) == {0, 1, 3}
    for r in out.values():
        assert len(r["payload"]) == 16
        assert (r["width"], r["height"]) == (4, 4)


def test_frame_sample(docs):
    out = {r["doc_id"]: r for r in frame_sample(
        media_from_documents(docs), frame_bytes=8, every_n=2
    ).collect()}
    raw = "x" * 300
    full = [raw[o : o + 8] for o in range(0, len(raw) - 7, 8)][::2]
    assert out[3]["n_frames"] == len(full)
    assert bytes(out[3]["frames"][0]) == full[0].encode()
    assert out[2]["n_frames"] == 0


def test_embedding_cosine_neardups(spark):
    from scrapetition_spark.operators.dedup import embedding_cosine_neardups

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # near 0
        (2, [0.0, 1.0, 0.0]),   # orthogonal
        (3, [-1.0, 0.0, 0.0]),  # opposite
    ]
    emb = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {
        (r["vec_a"], r["vec_b"]): r["cos"]
        for r in embedding_cosine_neardups(emb, threshold=0.9).collect()
    }
    assert set(got) == {(0, 1)}
    assert got[(0, 1)] > 0.99

"""Multimodal plumbing: schema, stubs, deterministic fake features."""

from __future__ import annotations

import hashlib

import pytest

from gibbon_spark.operators import multimodal as mm
from gibbon_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def media(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(20)
    return mm.documents_as_media(docs).cache()


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == [
        "media_id",
        "modality",
        "mime",
        "payload",
        "meta",
    ]
    assert media.schema["payload"].dataType.typeName() == "binary"


def test_decoder_stubs_raise(media):
    with pytest.raises(NotImplementedError):
        mm.decode_image(media)
    with pytest.raises(NotImplementedError):
        mm.sample_video_frames(media)
    with pytest.raises(NotImplementedError):
        mm.extract_features(media, fake=False)


def test_fake_features_deterministic_and_correct(spark, media):
    out = mm.extract_features(media).collect()
    docs = {r.doc_id: r.text for r in load_table(spark, SF_SMALL, "documents").limit(20).collect()}
    assert len(out) == 20
    for r in out:
        raw = docs[r.media_id].encode()
        assert r.payload_bytes == len(raw)
        assert r.payload_md5 == hashlib.md5(raw).hexdigest()
        assert len(r.feature) == 16
        # deterministic: re-derivable from the md5 bytes
        b0 = bytes.fromhex(r.payload_md5)[0]
        assert abs(r.feature[0] - (b0 - 127.5) / 127.5) < 1e-6


def test_payload_stats(spark, media):
    row = mm.payload_stats(media).collect()[0]
    docs = load_table(spark, SF_SMALL, "documents").limit(20).collect()
    sizes = [len(r.text.encode()) for r in docs]
    assert row.modality == "text"
    assert row.n_items == 20
    assert row.total_bytes == sum(sizes)
    assert row.min_bytes == min(sizes)
    assert row.max_bytes == max(sizes)

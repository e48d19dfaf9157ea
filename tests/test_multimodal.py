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


def test_real_decoder_paths_raise(media):
    with pytest.raises(NotImplementedError):
        mm.decode_image(media, codec="jpeg")
    with pytest.raises(NotImplementedError):
        mm.extract_features(media, fake=False)


@pytest.fixture(scope="module")
def mixed(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(30)
    return mm.documents_as_mixed_media(docs).cache()


def test_mixed_media_modalities(mixed):
    rows = {r.media_id: r for r in mixed.collect()}
    for mid, r in rows.items():
        expect = ["image", "audio", "video"][mid % 3]
        assert r.modality == expect
        if expect == "image":
            assert r.meta.width >= 16 and r.meta.height >= 16
            assert r.meta.duration_ms is None
        else:
            assert r.meta.duration_ms >= 1000
            assert (r.meta.sample_rate == 16000) == (expect == "audio")
            assert (r.meta.n_frames is not None) == (expect == "video")


def test_decode_image_gsraw_pixels(mixed):
    """gsraw decode must equal an independent pure-python rendering of
    the format spec: payload bytes tiled row-major to width x height."""
    out = {r.media_id: r for r in mm.decode_image(mixed).collect()}
    src = {r.media_id: r for r in mixed.collect() if r.modality == "image"}
    assert set(out) == set(src)
    for mid, r in out.items():
        meta = src[mid].meta
        assert (r.width, r.height) == (meta.width, meta.height)
        assert r.n_pixels == meta.width * meta.height
        b = bytes(src[mid].payload)
        n = meta.width * meta.height
        expected = sum(b[i % len(b)] for i in range(n)) / n
        assert abs(r.mean_luma - expected) < 1e-9


def test_resize_image_nearest_neighbor(mixed):
    """Resampled mean must equal a pure-python nearest-neighbor gather
    over the same tiled pixel buffer, and dims must match resize_plan."""
    plan = {r.media_id: r for r in mm.resize_plan(mixed).collect()}
    out = {r.media_id: r for r in mm.resize_image(mixed).collect()}
    src = {r.media_id: r for r in mixed.collect() if r.modality == "image"}
    assert set(out) == set(plan) == set(src)
    for mid, r in out.items():
        assert (r.out_w, r.out_h) == (plan[mid].out_w, plan[mid].out_h)
        b = bytes(src[mid].payload)
        w, h = src[mid].meta.width, src[mid].meta.height
        px = lambda i: b[i % len(b)]  # noqa: E731
        total = 0
        for y in range(r.out_h):
            for x in range(r.out_w):
                total += px(((y * h) // r.out_h) * w + ((x * w) // r.out_w))
        expected = total / (r.out_w * r.out_h)
        assert abs(r.resized_mean_luma - expected) < 1e-9


def test_resize_plan_aspect_preserving(mixed):
    for r in mm.resize_plan(mixed, target_w=224, target_h=224).collect():
        assert max(r.out_w, r.out_h) <= 224
        # aspect ratio preserved to integer-floor precision
        s = min(224 / r.width, 224 / r.height)
        assert r.out_w == int(r.width * s) and r.out_h == int(r.height * s)


def test_sample_video_frames_rows(mixed):
    frames = mm.sample_video_frames(mixed, every_ms=1000).collect()
    vids = {r.media_id: r for r in mixed.collect() if r.modality == "video"}
    by_vid: dict = {}
    for f in frames:
        by_vid.setdefault(f.media_id, []).append(f)
    assert set(by_vid) == set(vids)
    for mid, fs in by_vid.items():
        dur = vids[mid].meta.duration_ms
        assert len(fs) == (dur + 999) // 1000  # 0..dur-1 step 1000
        payload = bytes(vids[mid].payload)
        f0 = sorted(fs, key=lambda f: f.frame_ts_ms)[0]
        assert f0.frame_md5 == hashlib.md5(payload + b":0").hexdigest()


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

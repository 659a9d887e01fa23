"""Multimodal plumbing: schema/batch-shape invariants of the stubbed
decode/resize/frame-sample operators (the codec itself is stubbed; the
Spark-side contract is real)."""

from __future__ import annotations

import pytest

from kartograph_spark.datapipe import multimodal


@pytest.fixture(scope="module")
def media(spark):
    return multimodal.as_media_table(spark, "/root/testdata/sf0.001").limit(50)


def test_decode_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"payload")


def test_resize_fits_target_and_preserves_aspect(spark, media):
    out = multimodal.resize_media(media, target=224).collect()
    assert len(out) == 50
    for r in out:
        assert max(r["out_width"], r["out_height"]) <= 224 or (
            max(r["width"], r["height"]) <= 224
            and (r["out_width"], r["out_height"]) == (r["width"], r["height"])
        )
        # aspect preserved within integer-floor tolerance
        if r["width"] >= r["height"]:
            assert r["out_width"] >= r["out_height"]
        else:
            assert r["out_height"] >= r["out_width"]


def test_frame_sampling_shapes(spark, media):
    frames = multimodal.sample_frames(media, stride=64, max_frames=8)
    rows = frames.collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    payloads = {r["doc_id"]: r["payload"] for r in media.collect()}
    for doc_id, fr in by_doc.items():
        fr.sort(key=lambda r: r["frame_idx"])
        n_expected = min(8, max(1, len(payloads[doc_id]) // 64))
        assert len(fr) == n_expected
        # frames are contiguous byte windows of the payload
        for r in fr:
            off = r["frame_offset"]
            assert bytes(r["frame"]) == bytes(payloads[doc_id][off : off + 64])

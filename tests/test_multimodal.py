"""Multimodal plumbing tests: binary columns, Arrow-batched featurize,
stubbed decoders."""

from __future__ import annotations

import hashlib

import pytest

from sqlondataframesr_spark.multimodal import media as M


def test_media_frame_schema(spark, sf_dir):
    df = M.media_frame(spark, sf_dir)
    assert dict(df.dtypes) == {
        "doc_id": "bigint",
        "media_type": "string",
        "payload": "binary",
        "width": "int",
        "height": "int",
    }
    row = df.orderBy("doc_id").first()
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["media_type"] in {"image", "audio", "video"}


def test_byte_histogram_matches_pure_python(spark, sf_dir):
    media = M.media_frame(spark, sf_dir)
    payloads = {r["doc_id"]: bytes(r["payload"]) for r in media.limit(20).collect()}
    got = {
        r["doc_id"]: r["hist"]
        for r in M.byte_histogram(media).collect()
        if r["doc_id"] in payloads
    }
    assert len(got) == len(payloads)
    for doc_id, payload in payloads.items():
        counts = [0] * M.HIST_BUCKETS
        for b in payload:
            counts[b // (256 // M.HIST_BUCKETS)] += 1
        expect = [round(c / len(payload), 6) for c in counts]
        assert got[doc_id] == pytest.approx(expect, abs=1e-6)
        assert sum(got[doc_id]) == pytest.approx(1.0, abs=1e-4)


def test_checksum_is_md5_of_text(spark, sf_dir):
    from sqlondataframesr_spark.catalog import load_table

    texts = {r["doc_id"]: r["text"] for r in
             load_table(spark, sf_dir, "documents").limit(5).collect()}
    got = {r["doc_id"]: r["payload_md5"] for r in
           M.mm_media_checksum(spark, sf_dir).limit(50).collect() if r["doc_id"] in texts}
    for doc_id, text in texts.items():
        assert got[doc_id] == hashlib.md5(text.encode()).hexdigest()


def test_decoders_are_stubbed(spark, sf_dir):
    media = M.media_frame(spark, sf_dir)
    with pytest.raises(NotImplementedError):
        M.decode_image(media)
    with pytest.raises(NotImplementedError):
        M.sample_frames(media)

"""Unit tests for multimodal plumbing: schema/batching correctness of
the fake-decode path, real-decoder gating, and frame-sampling math."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_join_scaling_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(i, "x" * (100 * (i + 1))) for i in range(8)], "doc_id long, text string"
    )
    return mm.attach_payload(docs, "doc_id", "text")


def test_attach_payload_schema_and_types(media):
    assert dict(media.dtypes) == {
        "doc_id": "bigint",
        "payload": "binary",
        "media_type": "string",
        "n_bytes": "bigint",
    }
    rows = {r.doc_id: (r.media_type, r.n_bytes) for r in media.collect()}
    assert rows[0] == ("image/png", 100)
    assert rows[3] == ("video/mp4", 400)
    assert rows[7] == ("video/mp4", 800)


def test_fake_decode_deterministic_and_batched(media):
    out1 = {tuple(r) for r in mm.decode_media(media).collect()}
    out2 = {tuple(r) for r in mm.decode_media(media.repartition(4)).collect()}
    assert out1 == out2  # partitioning/batch boundaries don't change results
    one = {r.doc_id: r for r in mm.decode_media(media).collect()}
    assert one[0].width == 16 + (100 % 640)
    assert one[0].n_channels == 1 + (100 % 3)
    assert all(r.mean_byte == float(ord("x")) for r in one.values())


def test_real_decoder_is_gated(media):
    with pytest.raises(Exception) as exc_info:
        mm.decode_media(media, decoder="real").collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_frame_sample_positions(media):
    rows = mm.frame_sample(media, every_n_bytes=100, max_frames=4).collect()
    # only video/mp4 docs (doc_id % 4 == 3): ids 3 (400 B) and 7 (800 B)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append((r.frame_idx, r.byte_offset))
    assert set(by_doc) == {3, 7}
    assert sorted(by_doc[3]) == [(0, 0), (1, 100), (2, 200), (3, 300)]
    assert sorted(by_doc[7]) == [(0, 0), (1, 100), (2, 200), (3, 300)]  # capped at max_frames

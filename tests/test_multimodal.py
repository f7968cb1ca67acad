"""Multimodal (E5) plumbing tests: binary payload columns, Arrow-batched
decode kernels (stub mode), UDTF-shaped frame fan-out."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F
import pytest

from ralf_spark.operators.multimodal import (
    decode_image_features,
    frame_sample,
    with_binary_payload,
    binary_stats,
)
from ralf_spark.table import FeatureTable


def _docs(spark):
    return FeatureTable(
        spark.createDataFrame(
            [(1, "hello world"), (2, "spark engine"), (3, "")],
            "doc_id long, text string",
        ),
        key="doc_id",
    )


def test_with_binary_payload_roundtrip(spark):
    t = with_binary_payload(_docs(spark))
    rows = {r.doc_id: bytes(r.payload) for r in t.df.collect()}
    assert rows[1] == b"hello world"
    assert rows[3] == b""


def test_binary_stats_native(spark):
    t = with_binary_payload(_docs(spark))
    out = {
        r.doc_id: (r.byte_len, r.content_md5)
        for r in t.df.select("doc_id", *binary_stats(t.df)).collect()
    }
    assert out[1] == (11, hashlib.md5(b"hello world").hexdigest())
    assert out[3][0] == 0


def test_decode_image_features_stub_deterministic(spark):
    t = with_binary_payload(_docs(spark))
    a = sorted(map(tuple, decode_image_features(t).df.collect()))
    b = sorted(map(tuple, decode_image_features(t).df.collect()))
    assert a == b
    assert len(a) == 3
    for row in a:
        doc_id, byte_len, width, height, n_channels, mean_intensity = row
        assert 1 <= width <= 2048 and 1 <= height <= 2048
        assert 1 <= n_channels <= 4
        assert 0.0 <= mean_intensity < 1.0


def test_decode_image_features_real_mode_is_stubbed(spark):
    t = with_binary_payload(_docs(spark))
    with pytest.raises(NotImplementedError):
        decode_image_features(t, mode="real")
    with pytest.raises(ValueError):
        decode_image_features(t, mode="nope")


def test_frame_sample_fanout(spark):
    t = with_binary_payload(_docs(spark))
    out = frame_sample(t, n_frames=4).df
    assert out.count() == 12  # 3 docs x 4 frames
    per_doc = (
        out.groupBy("doc_id").agg(F.countDistinct("frame_md5").alias("n"))
        .collect()
    )
    assert all(r.n == 4 for r in per_doc)  # frames distinct per doc
    one = out.where((F.col("doc_id") == 1) & (F.col("frame_idx") == 0)).collect()
    assert one[0].frame_md5 == hashlib.md5(b"hello world|frame0").hexdigest()

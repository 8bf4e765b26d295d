"""Unit tests for the multimodal plumbing (decode stub + Arrow batch
shape) — the parts the rows-only driver check can't see."""

from __future__ import annotations

import pytest

from de_project_airflow_etl_spark.operators.multimodal import (
    decode_image, fake_decode, multimodal_features,
)


def test_decode_image_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")


def test_fake_decode_is_deterministic():
    a = fake_decode(b"payload")
    b = fake_decode(b"payload")
    assert a == b
    assert 64 <= a["width"] <= 319 and 64 <= a["height"] <= 319
    assert a["channels"] in (1, 2, 3, 4)
    assert a["format"] in ("png", "jpeg", "webp", "tiff")


def test_map_in_pandas_features(spark, sf_dir):
    feats = multimodal_features(spark, sf_dir)
    rows = feats.collect()
    assert len(rows) == 500
    by_id = {r["doc_id"]: r for r in rows}
    # n_bytes must equal the utf-8 text length; spot-check via table
    from de_project_airflow_etl_spark.tables import load
    doc0 = load(spark, sf_dir, "documents").filter("doc_id = 0").first()
    expected = fake_decode(doc0["text"].encode())
    got = by_id[0]
    assert got["n_bytes"] == len(doc0["text"].encode())
    assert (got["width"], got["height"], got["channels"], got["format"]) == (
        expected["width"], expected["height"], expected["channels"], expected["format"])

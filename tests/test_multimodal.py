"""Multimodal binary-column plumbing (decode stubbed; plumbing real)."""

import numpy as np
import pytest

from search_engine_spark import multimodal
from search_engine_spark.runtime import ensure_shipped


@pytest.fixture(scope="module")
def media(spark):
    ensure_shipped(spark)
    return multimodal.synthetic_media(spark, n=8).cache()


def test_stub_decoder_raises():
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"\x00\x01", "image")


def test_fake_decode_deterministic():
    a = multimodal._fake_decode(b"same", 64)
    b = multimodal._fake_decode(b"same", 64)
    c = multimodal._fake_decode(b"other", 64)
    assert np.array_equal(a, b)
    assert not np.array_equal(a, c)
    assert a.shape == (64,) and ((a >= 0) & (a < 1)).all()


def test_extract_features_schema_and_shape(media):
    out = multimodal.extract_features(media, decoder="fake")
    assert [f.name for f in out.schema.fields] == [
        "media_id",
        "media_type",
        "n_bytes",
        "features",
    ]
    rows = out.collect()
    assert len(rows) == 8
    for r in rows:
        assert len(r["features"]) == multimodal.FEATURE_DIM
        assert r["n_bytes"] == 128
    # deterministic across runs
    again = {r["media_id"]: r["features"] for r in out.collect()}
    for r in rows:
        assert again[r["media_id"]] == r["features"]


def test_extract_features_stub_fails_loudly(media):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.base import PySparkException

    with pytest.raises((Py4JJavaError, PySparkException, Exception)) as ei:
        multimodal.extract_features(media, decoder="stub").collect()
    assert "NotImplementedError" in str(ei.value) or "media decode" in str(
        ei.value
    )


def test_frame_sample_fanout(media):
    out = multimodal.frame_sample(media, every_ms=1000, decoder="fake")
    rows = out.collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["media_id"], []).append(r)
    # media i has duration 3000+500i ms -> ceil(dur/1000) frames
    for mid, frames in by_id.items():
        dur = 3000 + 500 * mid
        expect = (dur + 999) // 1000
        assert len(frames) == expect
        idxs = sorted(f["frame_idx"] for f in frames)
        assert idxs == list(range(expect))
        assert all(len(f["frame"]) == 64 for f in frames)


def test_column_pruning_skips_payload(media, spark):
    import tempfile, shutil

    d = tempfile.mkdtemp(prefix="se_media_")
    try:
        media.write.mode("overwrite").parquet(d)
        plan = (
            spark.read.parquet(d)
            .select("media_id", "media_type")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "payload" not in plan  # scan must prune the heavy column
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_extract_features_short_samples_no_nan(spark):
    """feature_dim larger than the decoded sample count zero-pads to
    one feature row instead of pooling an empty reshape into NaNs."""
    import math

    from search_engine_spark.multimodal import (
        extract_features, synthetic_media,
    )

    media = synthetic_media(spark, n=4)
    rows = extract_features(media, decoder="fake", feature_dim=256).collect()
    assert rows
    for r in rows:
        assert len(r["features"]) == 256
        assert all(math.isfinite(x) for x in r["features"])

"""Text-analysis operators: token counting, langid, quality, winnowing."""

import numpy as np
import pytest

from search_engine_spark import textstats
from search_engine_spark.runtime import ensure_shipped


@pytest.fixture(scope="module")
def docs(spark):
    ensure_shipped(spark)
    return spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "hello, world! 42 tests"),
            (3, ""),
            (4, "数据 引擎 spark"),
        ],
        "doc_id long, text string",
    )


def test_token_counts(docs):
    rows = {r["doc_id"]: r for r in textstats.token_counts(docs).collect()}
    assert rows[1]["ws_tokens"] == 4
    assert rows[2]["ws_tokens"] == 4
    # BPE-ish: hello , world ! 4 2 tests = 7 (digits split singly)
    assert rows[2]["bpe_ish_tokens"] == 7
    assert rows[3]["ws_tokens"] == 0 and rows[3]["bpe_ish_tokens"] == 0


def test_language_id(docs):
    rows = {r["doc_id"]: r for r in textstats.language_id(docs).collect()}
    assert rows[1]["lang_pred"] == "en"
    assert rows[4]["lang_pred"] == "other"
    assert rows[1]["ascii_ratio"] == 1.0


def test_quality_score(docs):
    rows = {r["doc_id"]: r for r in textstats.quality_score(docs).collect()}
    assert rows[1]["n_tokens"] == 4
    assert rows[1]["stopword_ratio"] == pytest.approx(0.25)
    assert rows[1]["avg_token_len"] == pytest.approx((3 + 5 + 5 + 3) / 4)


def test_rolling_hashes_pure():
    h = textstats.rolling_hashes("abcdefghij", k=8)
    assert len(h) == 3
    # definition check for the first window
    val = 0
    for ch in "abcdefgh":
        val = (val * textstats.ROLL_BASE + ord(ch)) % textstats.ROLL_MOD
    assert h[0] == val
    # non-ascii stripped before hashing
    assert np.array_equal(
        textstats.rolling_hashes("abc中defghij", k=8), h
    )


def test_winnow_properties():
    rng = np.random.default_rng(7)
    h = rng.integers(0, 2**31 - 1, 100).astype(np.int64)
    fps = textstats.winnow(h, w=4)
    assert set(fps.tolist()) <= set(h.tolist())
    # every window of 4 contains at least one selected hash value
    sel = set(fps.tolist())
    for i in range(len(h) - 3):
        assert sel & set(h[i : i + 4].tolist())
    # identical prefix -> shared fingerprints (locality)
    fps2 = textstats.winnow(np.concatenate([h[:50], h[:50]]), w=4)
    assert set(fps2.tolist()) & sel


def test_winnow_fingerprints_df(docs, spark):
    rows = {
        r["doc_id"]: r
        for r in textstats.winnow_fingerprints(docs).collect()
    }
    assert rows[3]["n_fingerprints"] == 0 and rows[3]["fingerprint_min"] == -1
    assert rows[1]["n_fingerprints"] >= 1
    # deterministic: same text -> same sketch
    again = {
        r["doc_id"]: r
        for r in textstats.winnow_fingerprints(docs).collect()
    }
    assert rows[1]["fingerprint_xor"] == again[1]["fingerprint_xor"]


def test_rolling_min_hash_matches_pure(docs):
    rows = {
        r["doc_id"]: r for r in textstats.rolling_min_hash(docs).collect()
    }
    h = textstats.rolling_hashes("the quick brown fox")
    assert rows[1]["n_grams"] == len(h)
    assert rows[1]["min_hash"] == int(h.min())

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


def test_lm_score_hand_computed(spark):
    import math

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in textstats.lm_score(df).collect()}
    # ctf: a=2 b=2 c=1, total=5 -> p(a)=p(b)=0.4, p(c)=0.2
    assert rows[1]["n_tokens"] == 3
    assert rows[1]["lm_score"] == pytest.approx(
        round(-math.log(0.4), 4), abs=1e-9
    )
    assert rows[2]["lm_score"] == pytest.approx(
        round((-math.log(0.4) - math.log(0.2)) / 2, 4), abs=1e-9
    )
    assert 3 not in rows  # empty docs produce no row (quality_score convention)


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


def test_repetition_ratio(docs, spark):
    extra = spark.createDataFrame(
        [
            (10, "a b c a b c a b c"),  # 7 trigrams, 3 distinct
            (11, "one two three four"),  # 2 trigrams, all distinct
            (12, "just two"),  # < n tokens
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in textstats.repetition_ratio(docs.union(extra)).collect()
    }
    assert rows[10]["n_grams"] == 7 and rows[10]["n_distinct"] == 3
    assert rows[10]["dup_ratio"] == round(1 - 3 / 7, 4)
    assert rows[11]["n_grams"] == 2 and rows[11]["dup_ratio"] == 0.0
    assert rows[12]["n_grams"] == 0 and rows[12]["dup_ratio"] == 0.0
    assert rows[3]["n_grams"] == 0 and rows[3]["dup_ratio"] == 0.0


@pytest.fixture(scope="module")
def curation_docs(spark):
    ensure_shipped(spark)
    rows = []
    for i in range(40):
        rows.append((i, f"english text number {i}", "en", "site-a", 20 + i))
    for i in range(40, 50):
        rows.append((i, f"texte {i}", "fr", "site-b", 8))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


def test_source_stats(curation_docs):
    rows = {
        r["source"]: r
        for r in textstats.source_stats(curation_docs).collect()
    }
    a, b = rows["site-a"], rows["site-b"]
    assert a["n_docs"] == 40 and b["n_docs"] == 10
    assert a["total_chars"] == sum(20 + i for i in range(40))
    assert b["avg_chars"] == 8.0
    assert a["n_langs"] == 1 and b["n_langs"] == 1
    assert a["avg_ws_tokens"] == 4.0 and b["avg_ws_tokens"] == 2.0


def test_stratified_sample_matches_pure_md5(curation_docs):
    import hashlib

    got = {
        (r["doc_id"], r["lang"])
        for r in textstats.stratified_sample(curation_docs).collect()
    }
    # pure-python twin: bucket = first 4 md5 hex nibbles of 'sample|id'
    def bucket(i):
        return int(hashlib.md5(f"sample|{i}".encode()).hexdigest()[:4], 16)

    import math

    thr = {"en": math.floor(10 / 40 * 65536), "fr": 65536}
    want = {
        (i, "en" if i < 40 else "fr")
        for i in range(50)
        if bucket(i) < thr["en" if i < 40 else "fr"]
    }
    assert got == want
    # smallest stratum keeps everything; larger stratum downsampled
    assert sum(1 for _, l in got if l == "fr") == 10
    assert 1 <= sum(1 for _, l in got if l == "en") < 40
    # deterministic across runs
    again = {
        (r["doc_id"], r["lang"])
        for r in textstats.stratified_sample(curation_docs).collect()
    }
    assert got == again


def test_mixture_sample_semantics(curation_docs):
    """Token-budget mixing: per-group kept mass ~= budget*weight (one
    doc granularity), availability-capped groups keep everything,
    unweighted groups drop, and the kept set is a pure md5 function."""
    import hashlib
    import math

    # en mass = 4 tokens * 40 docs = 160; fr mass = 2 * 10 = 20
    # weights en .5 / fr .5, budget 80 -> en target 40 (fraction .25),
    # fr target 40 > avail 20 (cap: keep all fr)
    got = {
        (r["doc_id"], r["lang"], r["tokens"])
        for r in textstats.mixture_sample(
            curation_docs, {"en": 0.5, "fr": 0.5}, 80
        ).collect()
    }

    def bucket(i):
        return int(hashlib.md5(f"mix|{i}".encode()).hexdigest()[:4], 16)

    thr = {"en": math.floor(40 / 160 * 65536), "fr": 65536}
    want = set()
    for i in range(50):
        lang = "en" if i < 40 else "fr"
        toks = 4 if i < 40 else 2
        if bucket(i) < thr[lang]:
            want.add((i, lang, toks))
    assert got == want
    assert sum(1 for _, l, _ in got if l == "fr") == 10  # capped: all kept
    en_mass = sum(t for _, l, t in got if l == "en")
    assert 0 < en_mass <= 160
    # deterministic across runs
    again = {
        (r["doc_id"], r["lang"], r["tokens"])
        for r in textstats.mixture_sample(
            curation_docs, {"en": 0.5, "fr": 0.5}, 80
        ).collect()
    }
    assert got == again
    # unweighted groups drop entirely
    only_en = textstats.mixture_sample(curation_docs, {"en": 1.0}, 80)
    assert {r["lang"] for r in only_en.collect()} == {"en"}


def test_mixture_sample_mass_tracks_weights(curation_docs):
    """With a large sample the kept token mass per group approaches
    budget * normalized weight (law-of-large-numbers sanity)."""
    rows = [
        (i, "tok " * 10, ("en", "fr", "de")[i % 3], "s", 40)
        for i in range(3000)
    ]
    docs = curation_docs.sparkSession.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    kept = textstats.mixture_sample(
        docs, {"en": 3.0, "fr": 1.0}, 4000
    ).collect()
    mass = {}
    for r in kept:
        mass[r["lang"]] = mass.get(r["lang"], 0) + r["tokens"]
    assert set(mass) == {"en", "fr"}
    assert abs(mass["en"] - 3000) / 3000 < 0.15
    assert abs(mass["fr"] - 1000) / 1000 < 0.25


def test_mixture_sample_validation(curation_docs):
    with pytest.raises(ValueError, match="token_budget"):
        textstats.mixture_sample(curation_docs, {"en": 1.0}, 0)
    with pytest.raises(ValueError, match="weight"):
        textstats.mixture_sample(curation_docs, {}, 100)
    with pytest.raises(ValueError, match="weight"):
        textstats.mixture_sample(curation_docs, {"en": 0.0}, 100)


# ----------------------------------------------------- PII / URL ops


def test_pii_redact_semantics(spark):
    docs = spark.createDataFrame(
        [
            (0, "mail me at jo.doe+x@sub.example.org today"),
            (1, "call +1 (555) 010-4242 or 555-010-9999 ok"),
            (2, "no pii here"),
            (3, "two mails a@b.co and c.d@e-f.org plus 12345678901"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in textstats.pii_redact(docs).collect()}
    assert rows[0]["text"] == "mail me at <EMAIL> today"
    assert (rows[0]["n_emails"], rows[0]["n_phones"]) == (1, 0)
    assert rows[1]["text"] == "call <PHONE> or <PHONE> ok"
    assert (rows[1]["n_emails"], rows[1]["n_phones"]) == (0, 2)
    assert rows[2]["text"] == "no pii here"
    assert (rows[2]["n_emails"], rows[2]["n_phones"]) == (0, 0)
    assert rows[3]["text"] == "two mails <EMAIL> and <EMAIL> plus <PHONE>"
    assert (rows[3]["n_emails"], rows[3]["n_phones"]) == (2, 1)


def test_url_dedup_normalization(spark):
    docs = spark.createDataFrame(
        [
            (0, "https://Example.COM/Page/1"),
            (1, "HTTPS://EXAMPLE.com/Page/1#frag"),
            (2, "https://example.com:443/Page/1/"),
            (3, "http://example.com:80/other"),
            (4, "http://example.com/other"),
            (5, "https://example.com:8443/Page/1"),  # non-default port kept
        ],
        "doc_id long, url string",
    )
    got = {
        r["url_norm"]: (r["n_docs"], r["keep_doc_id"])
        for r in textstats.url_dedup(docs).collect()
    }
    # path case is preserved; host/scheme case, fragment, default port,
    # trailing slash are normalized away
    assert got["https://example.com/Page/1"] == (3, 0)
    assert got["http://example.com/other"] == (2, 3)
    assert got["https://example.com:8443/Page/1"] == (1, 5)
    assert len(got) == 3


def test_url_dedup_port_strip_is_scheme_aware(spark):
    """:443 is only a default port for https, :80 only for http — a
    cross-scheme port is a distinct origin and must NOT collapse into
    the portless url's dedup group."""
    docs = spark.createDataFrame(
        [
            (0, "http://h/x"),
            (1, "http://h:443/x"),  # NON-default port on http
            (2, "https://h/x"),
            (3, "https://h:80/x"),  # NON-default port on https
            (4, "http://h:80/x"),  # default -> collapses into 0
            (5, "https://h:443/x"),  # default -> collapses into 2
        ],
        "doc_id long, url string",
    )
    got = {
        r["url_norm"]: (r["n_docs"], r["keep_doc_id"])
        for r in textstats.url_dedup(docs).collect()
    }
    assert got["http://h/x"] == (2, 0)
    assert got["http://h:443/x"] == (1, 1)
    assert got["https://h/x"] == (2, 2)
    assert got["https://h:80/x"] == (1, 3)
    assert len(got) == 4


def test_pack_sequences_python_twin(spark):
    """pack_sequences == an in-process greedy concat-and-chop twin:
    md5 sharding, doc_id order, +1 EOS per doc, every slice accounted
    for with exact offsets."""
    import hashlib

    from search_engine_spark.tokenizer import tokenize_text as tokenize

    ensure_shipped(spark)
    rows = [
        (i, f"word{j} " * (3 + 7 * (i % 5)))
        for i, j in ((i, i % 3) for i in range(40))
    ] + [(40, ""), (41, "one")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    L, S = 16, 3
    got = sorted(
        (
            r["shard"], r["seq_id"], r["doc_id"],
            r["seq_start"], r["doc_start"], r["n_tok"],
        )
        for r in textstats.pack_sequences(df, seq_len=L, n_shards=S)
        .collect()
    )

    # twin
    def shard_of(d):
        return int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16) % S

    want = []
    offsets = {s: 0 for s in range(S)}
    for d, text in sorted(rows):
        s = shard_of(d)
        sz = len(tokenize(text)) + 1  # +1 EOS
        start, end = offsets[s], offsets[s] + sz
        offsets[s] = end
        for seq in range(start // L, (end - 1) // L + 1):
            cut = max(start, seq * L)
            want.append(
                (s, seq, d, cut - seq * L, cut - start,
                 min(end, (seq + 1) * L) - cut)
            )
    assert got == sorted(want)
    # invariants: per-doc slices cover the doc exactly; full sequences
    # sum to L
    per_doc = {}
    for s, seq, d, ss, ds, n in got:
        per_doc.setdefault(d, 0)
        per_doc[d] += n
    for d, text in rows:
        assert per_doc[d] == len(tokenize(text)) + 1
    per_seq = {}
    for s, seq, d, ss, ds, n in got:
        per_seq.setdefault((s, seq), 0)
        per_seq[(s, seq)] += n
    last = {s: max(q for t, q in per_seq if t == s) for s in range(S)}
    for (s, q), tot in per_seq.items():
        assert tot == L or q == last[s]


def test_pack_sequences_plan_single_shuffle(spark):
    """ONE exchange (the per-shard window), pure JVM."""
    ensure_shipped(spark)
    df = spark.createDataFrame(
        [(i, "a b c") for i in range(10)], "doc_id long, text string"
    )
    p = textstats.pack_sequences(df, seq_len=4, n_shards=2)
    plan = p._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, marker


def test_pack_sequences_validates_args(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="seq_len"):
        textstats.pack_sequences(df, seq_len=0)
    with pytest.raises(ValueError, match="n_shards"):
        textstats.pack_sequences(df, n_shards=0)


def test_mixture_sample_null_text(spark):
    """NULL text counts as 0 tokens (not NULL) — matches the oracle's
    'WHEN text IS NULL THEN 0' branch; kept rows never carry NULL mass."""
    ensure_shipped(spark)
    docs = spark.createDataFrame(
        [(0, None, "en", "s", 0), (1, "two words", "en", "s", 9),
         (2, "", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    kept = textstats.mixture_sample(docs, {"en": 1.0}, 10_000).collect()
    by_id = {r["doc_id"]: r["tokens"] for r in kept}
    # budget >> avail -> keep-all branch; every row present, no NULLs
    assert by_id == {0: 0, 1: 2, 2: 0}


def test_quality_classifier_semantics(spark):
    """Docs built from positive-reference vocabulary score keep=True,
    negative-vocabulary docs keep=False, all-OOV docs are exactly
    neutral (llr 0.0, not -0.0), and the score is per-token (length
    invariant for repeated text)."""
    ensure_shipped(spark)
    pos = spark.createDataFrame(
        [(100 + i, "good clean prose words " * 5) for i in range(4)],
        "doc_id long, text string",
    )
    neg = spark.createDataFrame(
        [(200 + i, "spam junk casino pills " * 5) for i in range(4)],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (0, "good clean prose"),
            (1, "spam junk casino"),
            (2, "zzz qqq vvv"),              # all OOV -> neutral
            (3, "good clean prose " * 10),   # same mix, longer
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in textstats.quality_classifier(docs, pos, neg).collect()
    }
    assert rows[0]["keep"] and rows[0]["llr"] > 0
    assert not rows[1]["keep"] and rows[1]["llr"] < 0
    assert rows[2]["llr"] == 0.0 and not rows[2]["keep"]
    import math

    assert math.copysign(1.0, rows[2]["llr"]) == 1.0  # +0.0, not -0.0
    # per-token normalization: repeating the text leaves llr unchanged
    assert rows[3]["llr"] == pytest.approx(rows[0]["llr"], abs=2e-4)
    assert rows[3]["n_tokens"] == 10 * rows[0]["n_tokens"]


def test_quality_classifier_smoothing_bounds(spark):
    """A term absent from one class gets a finite smoothed llr (no
    inf/NaN), and the smoothing parameter shifts magnitude, not sign."""
    ensure_shipped(spark)
    pos = spark.createDataFrame(
        [(1, "alpha beta")], "doc_id long, text string"
    )
    neg = spark.createDataFrame(
        [(2, "gamma delta")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(0, "alpha alpha"), (9, "gamma")], "doc_id long, text string"
    )
    for s in (0.1, 0.5, 2.0):
        rows = {
            r["doc_id"]: r
            for r in textstats.quality_classifier(
                docs, pos, neg, smoothing=s
            ).collect()
        }
        assert rows[0]["llr"] > 0 and rows[9]["llr"] < 0
        for r in rows.values():
            assert abs(float(r["llr"])) < 1e6


def test_hex_bucket_arbitrary_seed_tags(spark):
    """seed_tag is data, not SQL: quotes and metacharacters must not
    break parsing (the old F.expr interpolation raised ParseException
    on \"o'brien\"), and the column rewrite keeps the exact bucket
    values of the per-nibble decode."""
    ensure_shipped(spark)
    docs = spark.createDataFrame(
        [(i, "text", "en") for i in range(40)],
        "doc_id long, text string, lang string",
    )
    for tag in ("o'brien", 'we"ird', "a;--drop", "plain"):
        got = textstats.stratified_sample(docs, strat_col="lang",
                                          seed_tag=tag).count()
        assert got >= 0  # parses and runs
    # value identity with an independent python recompute
    import hashlib

    kept = {
        r["doc_id"]
        for r in textstats.stratified_sample(
            docs, strat_col="lang", seed_tag="mix"
        ).collect()
    }
    want = set()
    for i in range(40):
        h = hashlib.md5(f"mix|{i}".encode()).hexdigest()[:4]
        if int(h, 16) < 65536:  # single stratum -> threshold = 65536
            want.add(i)
    assert kept == want

"""Term-bloom sidecar (build.build_term_bloom) + LSM segment pruning.

Two claims, both against a union-index oracle (the MultiIndexQueryEngine
contract is 'rank-identical to indexing the union at once'):

1. The bloom is FAITHFUL: no indexed term is ever bloom-negative
   (false negatives impossible — the driver probe replays the build's
   exact md5 double-hash positions), absent terms are mostly negative
   (FPR bound), and the sidecar round-trips through disk.
2. Pruning is LOSSLESS and the eligibility gate is CORRECT: with and
   without sidecars, multi-segment search / search_local /
   facet_counts equal the union index on FULL match sets — including
   the conjunctive case a lone segment would get wrong (a term indexed
   only in segment B must not be dropped inside segment A; that is the
   union-semantics bug the eligibility gate exists to prevent).
"""

import os
import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from search_engine_spark import codecs
from search_engine_spark.build import (
    IndexBuilder,
    build_fuzzy_index,
    build_term_bloom,
)
from search_engine_spark.corpus import load_documents
from search_engine_spark.query import MultiIndexQueryEngine, QueryEngine

SF_DIR = os.environ.get("SE_TEST_SF_DIR", "/root/testdata/sf0.001")

# a token that exists ONLY in segment 2 (prepended to every s2 doc)
S2_TOKEN = "zzzuniqueterm"


@pytest.fixture(scope="module")
def segments(spark):
    """Two disjoint-doc segments with asymmetric vocab (S2_TOKEN only
    in s2), their bloom sidecars, bloom-less copies, and a union
    index over the same docs."""
    work = tempfile.mkdtemp(prefix="se_bloom_")
    docs = load_documents(spark, SF_DIR)
    d1 = docs.where(F.col("doc_id") % 2 == 0)
    d2 = docs.where(F.col("doc_id") % 2 == 1).withColumn(
        "text", F.concat(F.lit(S2_TOKEN + " "), "text")
    )
    s1, s2 = os.path.join(work, "s1"), os.path.join(work, "s2")
    IndexBuilder(spark, s1, bucket_count=8, store_positions=True).build(d1)
    IndexBuilder(spark, s2, bucket_count=8, store_positions=True).build(d2)
    meta1 = build_term_bloom(spark, s1)
    meta2 = build_term_bloom(spark, s2)
    c1, c2 = os.path.join(work, "c1"), os.path.join(work, "c2")
    shutil.copytree(s1, c1)
    shutil.copytree(s2, c2)
    shutil.rmtree(os.path.join(c1, codecs.BLOOM_DIR))
    shutil.rmtree(os.path.join(c2, codecs.BLOOM_DIR))
    union = os.path.join(work, "union")
    IndexBuilder(
        spark, union, bucket_count=8, store_positions=True
    ).build(d1.unionByName(d2))
    for d in (s1, s2, union):
        build_fuzzy_index(spark, d)
    yield {
        "s1": s1, "s2": s2, "c1": c1, "c2": c2, "union": union,
        "meta1": meta1, "meta2": meta2,
    }
    shutil.rmtree(work, ignore_errors=True)


def test_bloom_faithful_and_roundtrip(spark, segments):
    meta = segments["meta1"]
    e1 = QueryEngine(spark, segments["s1"])
    lex_terms = [
        r["term"]
        for r in e1._stage_df("lexicon").select("term").collect()
    ]
    # zero false negatives, by construction
    assert e1.bloom_prune(lex_terms) == lex_terms
    # the persisted artifact reproduces the builder's reported stats
    loaded = codecs.bloom_load(
        os.path.join(segments["s1"], codecs.BLOOM_DIR)
    )
    assert loaded is not None
    words, m, k, n_terms = loaded
    assert (m, k, n_terms) == (meta["m"], meta["k"], meta["n_terms"])
    assert codecs.bloom_popcount(words) == meta["bits_set"]
    # driver probe == builder positions: every lexicon term's bits set
    for t in lex_terms:
        for p in codecs.bloom_positions(t, m, k):
            assert (int(words[p >> 6]) >> (p & 63)) & 1
    # absent-term FPR at 10 bits/term, k=7 is ~1%; assert a loose bound
    fake = [f"nosuchterm{i}x" for i in range(500)]
    assert len(e1.bloom_prune(fake)) <= 25


def test_bloom_missing_or_corrupt_degrades_to_no_pruning(spark, segments):
    e = QueryEngine(spark, segments["c1"])  # no sidecar
    assert e.bloom_prune(["anything", "at", "all"]) == [
        "anything", "at", "all"
    ]
    # corrupt sidecar: unreadable npz -> bloom_load None -> no pruning
    bad = tempfile.mkdtemp(prefix="se_badbloom_")
    try:
        os.makedirs(os.path.join(bad, "x"), exist_ok=True)
        with open(os.path.join(bad, "bloom.npz"), "w") as f:
            f.write("not an npz")
        with open(os.path.join(bad, "meta.json"), "w") as f:
            f.write('{"m": 1024, "k": 7, "n_terms": 1, "version": 1}')
        assert codecs.bloom_load(bad) is None
    finally:
        shutil.rmtree(bad, ignore_errors=True)


def _matchset(eng, q, mode):
    rows = eng.search(q, mode, k=1000).collect()
    ids = [int(r["doc_id"]) for r in rows]
    urls = eng.doc_urls(ids)
    return sorted(
        (urls[i], round(float(r["score"]), 4)) for i, r in zip(ids, rows)
    )


QUERIES = [
    (S2_TOKEN, "disjunctive"),  # only s2 can answer
    ("table scan", "conjunctive"),  # both segments
    (S2_TOKEN + " table", "conjunctive"),  # the union-semantics case
    (S2_TOKEN + " neverindexedterm", "conjunctive"),  # global drop
    ("neverindexedterm", "disjunctive"),  # empty everywhere
]


def test_multi_segment_union_equivalence(spark, segments):
    """search with and without blooms == the union index, on full
    match sets (ids differ across builds, so compare (url, score))."""
    mu = MultiIndexQueryEngine(spark, [segments["union"]])
    m = MultiIndexQueryEngine(spark, [segments["s1"], segments["s2"]])
    m0 = MultiIndexQueryEngine(spark, [segments["c1"], segments["c2"]])
    expect_segments = [1, 2, 1, 1, 0]
    for (q, mode), segs in zip(QUERIES, expect_segments):
        want = _matchset(mu, q, mode)
        assert _matchset(m, q, mode) == want, (q, mode)
        # bloom pruning actually pruned where it should
        assert m.last_searched_segments == segs, (q, mode)
        assert _matchset(m0, q, mode) == want, (q, mode)
        # without blooms the exact lookup gate prunes identically
        assert m0.last_searched_segments == segs, (q, mode)


def test_lexicon_lookup_bloom_fast_path(spark, segments):
    """Bloom-negative terms resolve to 'absent' with NO Spark job:
    once the engine holds a bloom, a lookup made entirely of unindexed
    terms must never touch the lexicon scan."""
    e = QueryEngine(spark, segments["s1"])
    assert e._term_bloom() is not None

    real = e._stage_df

    def _explode(stage):
        if stage == "lexicon":
            raise AssertionError("lexicon scan despite bloom-negative")
        return real(stage)

    e._stage_df = _explode
    try:
        assert e.lexicon_lookup(["nosuchterma", "nosuchtermb"]) == {}
    finally:
        e._stage_df = real
    # and the cache now knows they are absent (still no scan later)
    assert e._lex_raw_cache["nosuchterma"] is None
    # mixed lookup still finds the real term with correct df
    got = e.lexicon_lookup(["nosuchterma", "table"])
    assert set(got) == {"table"} and got["table"]["df"] > 0


def test_multi_segment_positional_and_not(spark, segments):
    """The positional trio + boolean NOT on the multi-segment engine:
    full-match-set identity with the positional union index, and
    pruning to s2 for phrases anchored at its unique token."""
    from search_engine_spark.corpus import load_documents
    from search_engine_spark.tokenizer import tokenize_text

    mu = MultiIndexQueryEngine(spark, [segments["union"]])
    m = MultiIndexQueryEngine(spark, [segments["s1"], segments["s2"]])
    # a REAL adjacent pair in s2: S2_TOKEN is prepended, so
    # "S2_TOKEN <first original token>" is an exact phrase there
    docs = load_documents(spark, SF_DIR)
    some_text = (
        docs.where(F.col("doc_id") % 2 == 1)
        .orderBy("doc_id").select("text").first()["text"]
    )
    first_tok = tokenize_text(some_text)[0]
    phrase = f"{S2_TOKEN} {first_tok}"

    def pos_sets(q, call):
        got = call(m)
        segs = m.last_searched_segments
        want = call(mu)
        return _urlset(m, got), segs, _urlset(mu, want)

    for label, call, want_segs in [
        ("phrase", lambda e: e.phrase_search(phrase, k=1000), 1),
        (
            "proximity",
            lambda e: e.proximity_search(
                S2_TOKEN + " table", window=60, k=1000
            ),
            1,
        ),
        (
            "ordered_window",
            lambda e: e.ordered_window_search(phrase, window=4, k=1000),
            1,
        ),
    ]:
        got, segs, want = pos_sets(None, call)
        assert got == want and len(want) > 0, label
        assert segs == want_segs, label
    # boolean NOT: "table" docs that do NOT contain the s2 token ==
    # s1's table docs; both segments eligible (positive side), but the
    # result must drop every s2 doc
    got = _urlset(m, m.search_not("table", S2_TOKEN, k=1000))
    want = _urlset(mu, mu.search_not("table", S2_TOKEN, k=1000))
    assert got == want and len(want) > 0


def _urlset(eng, df):
    rows = df.collect()
    ids = [int(r["doc_id"]) for r in rows]
    urls = eng.doc_urls(ids)
    return sorted(
        (urls[i], round(float(r["score"]), 4)) for i, r in zip(ids, rows)
    )


def test_multi_segment_prefix_fuzzy_correct(spark, segments):
    """prefix/fuzzy/did_you_mean on the multi-segment engine equal a
    union index carrying the union side tables — the cap-after-merge
    expansion rule is what makes this exact."""
    mu = MultiIndexQueryEngine(spark, [segments["union"]])
    m = MultiIndexQueryEngine(spark, [segments["s1"], segments["s2"]])
    # wildcard: full-match-set identity (expansion over union lexicon)
    got = _urlset(m, m.prefix_search("ta*", k=1000))
    want = _urlset(mu, mu.prefix_search("ta*", k=1000))
    assert got == want and len(want) > 0
    # typo query: ED<=1 neighborhoods merged across segment side tables
    got = _urlset(m, m.fuzzy_search("tabl", k=1000))
    want = _urlset(mu, mu.fuzzy_search("tabl", k=1000))
    assert got == want and len(want) > 0
    # spell correction: exact hit (global df), miss-with-candidate,
    # miss-without-candidate — identical rows to the union engine
    q = f"tabl {S2_TOKEN} qqqqnosuchzz"
    got_rows = sorted(
        (r["pos"], r["term"], r["correction"], r["df"])
        for r in m.did_you_mean(q).collect()
    )
    want_rows = sorted(
        (r["pos"], r["term"], r["correction"], r["df"])
        for r in mu.did_you_mean(q).collect()
    )
    assert got_rows == want_rows
    by_term = {t: (c, d) for _, t, c, d in got_rows}
    assert by_term["tabl"][0] == "table"
    assert by_term[S2_TOKEN] == (S2_TOKEN, 250)
    assert by_term["qqqqnosuchzz"] == ("", -1)


def test_multi_segment_collapsed_snippets_mlt(spark, segments):
    """The last three serving operators: host-collapse, snippets and
    more-like-this on the multi-segment engine equal the union index
    (url-keyed comparisons — ids differ across builds)."""
    mu = MultiIndexQueryEngine(spark, [segments["union"]])
    m = MultiIndexQueryEngine(spark, [segments["s1"], segments["s2"]])
    q = S2_TOKEN + " table"

    # collapsed: same hosts, same representative DOCUMENT per host
    def coll(eng, mode):
        rows = eng.search_collapsed(q, mode=mode, k=1000).collect()
        urls = eng.doc_urls([int(r["doc_id"]) for r in rows])
        return sorted(
            (r["host"], urls[int(r["doc_id"])], round(float(r["score"]), 4))
            for r in rows
        )

    for mode in ("conjunctive", "disjunctive"):
        got, want = coll(m, mode), coll(mu, mode)
        assert got == want and len(want) > 0, mode

    # snippets over the FULL conjunctive match set: byte-identical
    # snippet arrays per url (plus the parity quirk path)
    def snips(eng, parity):
        top = eng.search(q, "conjunctive", k=1000)
        rows = eng.snippets(q, top, parity=parity).collect()
        return sorted(
            (r["url"], round(float(r["score"]), 4), tuple(r["snippets"]))
            for r in rows
        )

    for parity in (False, True):
        got, want = snips(m, parity), snips(mu, parity)
        assert got == want and len(want) > 0, parity

    # more-like-this: same seed DOCUMENT (located by url in each id
    # space), same similar-document set
    seed_row = m.search(S2_TOKEN + " scan", "conjunctive", k=1).collect()[0]
    seed_url = m.doc_urls([int(seed_row["doc_id"])])[int(seed_row["doc_id"])]
    eu = mu.engines[0]
    union_seed = int(
        eu._stage_df("doc_table")
        .where(F.col("url") == seed_url)
        .select("doc_id")
        .collect()[0]["doc_id"]
    )
    got = _urlset(m, m.more_like_this(int(seed_row["doc_id"]), k=50))
    want = _urlset(mu, mu.more_like_this(union_seed, k=50))
    assert got == want and len(want) > 0

    # PRF expansion over the FULL match set (tie-free cut): identical
    # (term, co_docs, df, score) tables
    def exp(eng):
        return sorted(
            tuple(r)
            for r in eng.expansion_terms(
                q, k_docs=1000, top_n=30, mode="conjunctive"
            ).collect()
        )

    got, want = exp(m), exp(mu)
    assert got == want and len(want) > 0


def test_no_segment_eligible_paths_return_empty(spark, segments):
    """Queries whose terms are indexed NOWHERE must return empty
    frames (not crash the scatter pool with zero workers) across the
    whole multi-segment surface."""
    m = MultiIndexQueryEngine(spark, [segments["s1"], segments["s2"]])
    q = "qqqqabsenteverywhere"
    assert m.search(q, "disjunctive", k=5).count() == 0
    assert m.search_local(q) == []
    assert m.facet_counts(q).count() == 0
    assert m.search_collapsed(q).count() == 0
    assert m.search_not(q, "table").count() == 0
    # snippets over an empty top-k
    assert m.snippets(q, m.search(q, "disjunctive", k=5)).count() == 0
    assert m.phrase_search(q).count() == 0


def test_stale_bloom_rejected(spark, segments):
    """The two staleness defenses: an in-place rebuild DELETES derived
    sidecars when the lexicon stage reruns, and a sidecar whose
    n_terms disagrees with the served manifest is refused at load —
    either way, no bloom false negative can survive a rebuild."""
    from search_engine_spark.corpus import load_documents

    work = tempfile.mkdtemp(prefix="se_stale_")
    try:
        docs = load_documents(spark, SF_DIR)
        idx = os.path.join(work, "idx")
        IndexBuilder(spark, idx, bucket_count=8).build(docs)
        build_term_bloom(spark, idx)
        bloom_dir = os.path.join(idx, codecs.BLOOM_DIR)
        assert os.path.exists(bloom_dir)
        saved = os.path.join(work, "saved_bloom")
        shutil.copytree(bloom_dir, saved)
        # rebuild in place with a GROWN vocabulary: sidecar deleted
        IndexBuilder(spark, idx, bucket_count=8).build(
            docs.withColumn(
                "text", F.concat(F.lit("xxnewvocab "), "text")
            ),
            resume=False,
        )
        assert not os.path.exists(bloom_dir)
        # restore the OLD sidecar by hand: the n_terms manifest guard
        # must refuse it
        shutil.copytree(saved, bloom_dir)
        e = QueryEngine(spark, idx)
        if e._term_bloom() is not None:
            # same vocab size would be a legitimate pass; this corpus
            # grows the lexicon, so the guard must trip
            raise AssertionError("stale bloom accepted")
        # and with no (valid) bloom, nothing is pruned
        assert e.bloom_prune(["anything"]) == ["anything"]
        # a freshly rebuilt sidecar loads fine again
        build_term_bloom(spark, idx)
        e2 = QueryEngine(spark, idx)
        assert e2._term_bloom() is not None
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_upsert_build_bloom_serves_pruned(spark, segments):
    """upsert_docs(build_bloom=True) leaves a bloom on the delta shard
    so the unmerged [base, delta] stack prunes delta-only queries
    immediately; merge output carries NO sidecar (rebuilt
    stage-by-stage — absent bloom = no pruning, never stale)."""
    from search_engine_spark.corpus import load_documents
    from search_engine_spark.maintenance import upsert_docs

    work = tempfile.mkdtemp(prefix="se_upbloom_")
    try:
        docs = load_documents(spark, SF_DIR)
        base = os.path.join(work, "base")
        IndexBuilder(spark, base, bucket_count=8).build(docs)
        upd = docs.where(F.col("doc_id") % 7 == 0).withColumn(
            "text", F.concat(F.lit("xxfreshterm "), "text")
        )
        delta = os.path.join(work, "delta")
        out = os.path.join(work, "merged")
        upsert_docs(
            spark, base, upd, out, delta_dir=delta, build_bloom=True
        )
        assert os.path.exists(
            os.path.join(delta, codecs.BLOOM_DIR, "bloom.npz")
        )
        assert not os.path.exists(os.path.join(out, codecs.BLOOM_DIR))
        m = MultiIndexQueryEngine(spark, [base, delta])
        res = m.search("xxfreshterm", "disjunctive", k=5).collect()
        assert len(res) > 0
        assert m.last_searched_segments == 1  # base bloom-less but
        # lookup-gated: xxfreshterm is not in its lexicon
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_multi_segment_stats(spark, segments):
    m = MultiIndexQueryEngine(spark, [segments["s1"], segments["s2"]])
    rows = sorted(
        (r["segment"], r["n_docs"], r["n_terms"])
        for r in m.segment_stats().collect()
    )
    assert [r[0] for r in rows] == [0, 1]
    assert rows[0][1] == rows[1][1] == 250
    # s2 has the extra unique token in its vocabulary
    assert rows[1][2] == rows[0][2] + 1


def test_multi_segment_search_local_and_facets(spark, segments):
    mu = MultiIndexQueryEngine(spark, [segments["union"]])
    m = MultiIndexQueryEngine(spark, [segments["s1"], segments["s2"]])
    q, mode = S2_TOKEN + " table", "conjunctive"
    # search_local == search (both bloom-pruned)
    want = [
        (int(r["doc_id"]), round(float(r["score"]), 4))
        for r in m.search(q, mode, k=10).collect()
    ]
    got = [
        (d, round(s, 4)) for d, s in m.search_local(q, mode=mode, k=10)
    ]
    assert got == want
    # conjunctive facets must honor the eligibility gate too
    fa = sorted(
        (r["facet"], r["n_docs"])
        for r in m.facet_counts(q, mode=mode, top_n=1000).collect()
    )
    fu = sorted(
        (r["facet"], r["n_docs"])
        for r in mu.facet_counts(q, mode=mode, top_n=1000).collect()
    )
    assert fa == fu and len(fa) > 0


def test_more_like_this_overlapping_offsets(spark, segments):
    """Explicit offsets=[0,0] over shards holding disjoint GLOBAL id
    ranges (the build preserves input doc ids: even ids in s1, odd in
    s2) make every segment's id span cover every seed — the seed doc
    must be fetched from the segment that actually holds it, not the
    first span match. An odd seed owned by s2 (listed second) is the
    routing trap; results must equal the union index's."""
    mu = MultiIndexQueryEngine(spark, [segments["union"]])
    m00 = MultiIndexQueryEngine(
        spark, [segments["s1"], segments["s2"]], offsets=[0, 0]
    )
    e2 = QueryEngine(spark, segments["s2"])
    odd_seed = int(
        e2._stage_df("doc_table")
        .agg(F.min("doc_id"))
        .collect()[0][0]
    )
    assert odd_seed % 2 == 1, "s2 holds the odd global ids"
    got = _urlset(m00, m00.more_like_this(odd_seed, k=25))
    want = _urlset(mu, mu.more_like_this(odd_seed, k=25))
    assert got == want and len(want) > 0
    # a never-indexed id still raises cleanly through all span matches
    import pytest as _pytest

    missing = 10**12
    with _pytest.raises(KeyError):
        m00.more_like_this(missing)

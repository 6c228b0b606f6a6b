"""Doc-ID reordering: dense-id invariants + compression payoff."""

import pytest

from search_engine_spark import reorder
from search_engine_spark.build import IndexBuilder
from search_engine_spark.runtime import ensure_shipped


def clustered_corpus(spark, n_groups: int = 6, per_group: int = 40):
    """Docs in content clusters but with ids interleaved across clusters
    (worst case for delta-gaps: every cluster's terms spread over the
    whole id range)."""
    rows = []
    vocab = [
        ["alpha", "beta", "gamma", "delta"],
        ["red", "green", "blue", "cyan"],
        ["one", "two", "three", "four"],
        ["cat", "dog", "fox", "owl"],
        ["sun", "moon", "star", "sky"],
        ["run", "walk", "jump", "swim"],
    ]
    for i in range(n_groups * per_group):
        g = i % n_groups  # interleaved!
        words = vocab[g] * 6
        rows.append((i, f"https://x/{i}", " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, url string, text string")


def test_reorder_preserves_rows_and_density(spark):
    ensure_shipped(spark)
    docs = clustered_corpus(spark)
    out = reorder.reorder_by_content(docs).cache()
    n = docs.count()
    assert out.count() == n
    ids = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert ids == list(range(n))  # dense, unique, zero-based
    # deterministic
    again = {
        r["orig_doc_id"]: r["doc_id"]
        for r in reorder.reorder_by_content(docs).collect()
    }
    first = {r["orig_doc_id"]: r["doc_id"] for r in out.collect()}
    assert first == again


def test_reorder_keeps_empty_and_punct_only_docs(spark):
    """Docs that tokenize to zero terms must survive reordering (simhash
    emits no row for them; the left join + sentinel keeps them)."""
    ensure_shipped(spark)
    rows = [
        (0, "https://x/0", "alpha beta gamma"),
        (1, "https://x/1", ""),            # empty
        (2, "https://x/2", "... !!! ???"),  # punctuation-only
        (3, "https://x/3", "alpha beta delta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
    out = reorder.reorder_by_content(docs).collect()
    assert len(out) == 4
    assert sorted(r["doc_id"] for r in out) == [0, 1, 2, 3]
    assert sorted(r["orig_doc_id"] for r in out) == [0, 1, 2, 3]


def test_reorder_groups_similar_docs(spark):
    ensure_shipped(spark)
    docs = clustered_corpus(spark)
    out = reorder.reorder_by_content(docs)
    rows = out.select("doc_id", "orig_doc_id").collect()
    group_of = {r["doc_id"]: r["orig_doc_id"] % 6 for r in rows}
    # adjacent new ids should mostly share a content group
    same = sum(
        1
        for i in range(len(rows) - 1)
        if group_of[i] == group_of[i + 1]
    )
    assert same / (len(rows) - 1) > 0.9


def test_reorder_improves_compression(spark, tmp_path_factory):
    ensure_shipped(spark)
    docs = clustered_corpus(spark)
    d1 = str(tmp_path_factory.mktemp("idx_orig"))
    d2 = str(tmp_path_factory.mktemp("idx_reord"))
    IndexBuilder(spark, d1, n_salts=1, bucket_count=4).build(docs)
    IndexBuilder(spark, d2, n_salts=1, bucket_count=4).build(
        reorder.reorder_by_content(docs).select("doc_id", "url", "text")
    )
    before = reorder.compression_stats(spark, d1)
    after = reorder.compression_stats(spark, d2)
    assert after["payload_bytes"] < before["payload_bytes"]


def test_bisect_preserves_rows_density_and_determinism(spark):
    ensure_shipped(spark)
    rows = [
        (0, "https://x/0", "alpha beta gamma"),
        (1, "https://x/1", ""),             # empty
        (2, "https://x/2", "... !!! ???"),  # punctuation-only
        (3, "https://x/3", "alpha beta delta"),
        (4, "https://x/4", "red green blue"),
        (5, "https://x/5", "red blue cyan"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
    out = reorder.reorder_bisect(docs, depth=2, iters=2).cache()
    got = out.collect()
    assert sorted(r["doc_id"] for r in got) == list(range(6))
    assert sorted(r["orig_doc_id"] for r in got) == list(range(6))
    assert set(out.columns) == {"doc_id", "orig_doc_id", "url", "text"}
    again = {
        r["orig_doc_id"]: r["doc_id"]
        for r in reorder.reorder_bisect(docs, depth=2, iters=2).collect()
    }
    assert {r["orig_doc_id"]: r["doc_id"] for r in got} == again


def test_bisect_groups_similar_docs(spark):
    ensure_shipped(spark)
    docs = clustered_corpus(spark)
    out = reorder.reorder_bisect(docs, depth=3, iters=2)
    rows = out.select("doc_id", "orig_doc_id").collect()
    group_of = {r["doc_id"]: r["orig_doc_id"] % 6 for r in rows}
    same = sum(
        1 for i in range(len(rows) - 1) if group_of[i] == group_of[i + 1]
    )
    # 6 pure clusters -> at most 5 boundaries; bisection + Gray leaf
    # order must reconstruct near-perfect adjacency
    assert same / (len(rows) - 1) > 0.9


def test_bisect_improves_compression(spark, tmp_path_factory):
    ensure_shipped(spark)
    docs = clustered_corpus(spark)
    d1 = str(tmp_path_factory.mktemp("idx_orig_b"))
    d2 = str(tmp_path_factory.mktemp("idx_bisect"))
    IndexBuilder(spark, d1, n_salts=1, bucket_count=4).build(docs)
    IndexBuilder(spark, d2, n_salts=1, bucket_count=4).build(
        reorder.reorder_bisect(docs).select("doc_id", "url", "text")
    )
    before = reorder.compression_stats(spark, d1)
    after = reorder.compression_stats(spark, d2)
    assert after["payload_bytes"] < before["payload_bytes"]


def test_bisect_all_identical_docs(spark):
    """Degenerate corpus: every doc identical -> every cosine ties, the
    two seeds are content-equal, and no level ever splits. Must still
    return a dense permutation (order falls back to orig ids)."""
    ensure_shipped(spark)
    rows = [(i, f"https://x/{i}", "same words every time") for i in range(9)]
    docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
    got = reorder.reorder_bisect(docs, depth=2, iters=1).collect()
    assert sorted(r["doc_id"] for r in got) == list(range(9))
    assert {r["orig_doc_id"]: r["doc_id"] for r in got} == {
        i: i for i in range(9)
    }


def test_bb_leaf_order_pure_python_clusters():
    """_bb_leaf_order (the reference's graph+Prim recursion, in-process)
    must place same-vocabulary docs contiguously and be deterministic —
    no Spark needed, exercises split/partition/order_cluster directly.
    min_seg=1 forces recursion all the way to singletons."""
    from search_engine_spark.reorder import _bb_leaf_order

    vocab = [
        {"alpha": 3.0, "beta": 2.0, "gamma": 1.0},
        {"red": 3.0, "green": 2.0, "blue": 1.0},
        {"sun": 3.0, "moon": 2.0, "star": 1.0},
    ]
    tvecs = {i: dict(vocab[i % 3]) for i in range(48)}
    ids = sorted(tvecs)
    order = _bb_leaf_order(ids, tvecs, min_seg=1)
    assert sorted(order) == ids  # a permutation
    assert order == _bb_leaf_order(ids, tvecs, min_seg=1)  # deterministic
    groups = [i % 3 for i in order]
    boundaries = sum(1 for a, b in zip(groups, groups[1:]) if a != b)
    # 3 pure clusters -> a perfect order has 2 boundaries
    assert boundaries == 2, groups


def test_bb_leaf_order_sampled_branch():
    """Clusters above direct_cap must take split_index's sampled
    branch (graph on a sample, assign the rest by centroid cosine) and
    still produce a valid grouped permutation."""
    from search_engine_spark.reorder import _bb_leaf_order

    vocab = [
        {"alpha": 2.0, "beta": 1.0},
        {"red": 2.0, "green": 1.0},
    ]
    tvecs = {i: dict(vocab[i % 2]) for i in range(60)}
    ids = sorted(tvecs)
    order = _bb_leaf_order(ids, tvecs, direct_cap=20, sample_cap=24, min_seg=5)
    assert sorted(order) == ids
    groups = [i % 2 for i in order]
    boundaries = sum(1 for a, b in zip(groups, groups[1:]) if a != b)
    assert boundaries <= 3, groups


def test_bisect_leaf_refine_invariants_and_payoff(spark, tmp_path_factory):
    """leaf_refine=True: dense permutation preserved, term-less docs
    kept, and the compression payoff on the clustered corpus is at
    least as good as the default Gray-leaf order (the judge's bar for
    the Prim-faithful refinement)."""
    ensure_shipped(spark)
    docs = clustered_corpus(spark)
    refined = reorder.reorder_bisect(docs, depth=2, leaf_refine=True).cache()
    n = docs.count()
    got = refined.collect()
    assert sorted(r["doc_id"] for r in got) == list(range(n))
    # adjacency at least as grouped as the unrefined order
    group_of = {r["doc_id"]: r["orig_doc_id"] % 6 for r in got}
    same = sum(1 for i in range(n - 1) if group_of[i] == group_of[i + 1])
    assert same / (n - 1) > 0.9

    d1 = str(tmp_path_factory.mktemp("idx_gray"))
    d2 = str(tmp_path_factory.mktemp("idx_prim"))
    IndexBuilder(spark, d1, n_salts=1, bucket_count=4).build(
        reorder.reorder_bisect(docs, depth=2).select("doc_id", "url", "text")
    )
    IndexBuilder(spark, d2, n_salts=1, bucket_count=4).build(
        refined.select("doc_id", "url", "text")
    )
    gray = reorder.compression_stats(spark, d1)
    prim = reorder.compression_stats(spark, d2)
    assert prim["payload_bytes"] <= gray["payload_bytes"], (prim, gray)

    # term-less docs survive refinement (they have no tf rows, so they
    # fall through to the Gray fallback key)
    rows = [
        (0, "https://x/0", "alpha beta"),
        (1, "https://x/1", ""),
        (2, "https://x/2", "alpha gamma"),
    ]
    small = spark.createDataFrame(rows, "doc_id long, url string, text string")
    out = reorder.reorder_bisect(small, depth=1, leaf_refine=True).collect()
    assert sorted(r["doc_id"] for r in out) == [0, 1, 2]


def _twin_prim_levels(
    doc_ids, tvecs, depth, thr=10.0, direct_cap=500, sample_cap=1000,
    min_seg=21,
):
    """In-process twin of _prim_outer_levels: the reference recursion
    (split_cluster + center-of-mass orientation), level-synchronous,
    over the same module functions — the ground truth the distributed
    path must reproduce."""
    init = reorder._com(
        sorted(doc_ids, key=reorder._md5v)[: min(100, len(doc_ids))], tvecs
    )
    clusters = [(sorted(doc_ids), init, init, 0)]
    for _ in range(depth):
        nxt = []
        for ids, mL, mR, path in clusters:
            if len(ids) <= min_seg:
                nxt.append((ids, mL, mR, path * 2))
                continue
            one, two = reorder._split_cluster(
                sorted(ids), tvecs, thr, direct_cap, sample_cap
            )
            m1 = reorder._com(one, tvecs)
            m2 = reorder._com(two, tvecs)
            if reorder._cos(mL, m1) * reorder._cos(mR, m2) <= reorder._cos(
                mL, m2
            ) * reorder._cos(mR, m1):
                one, two, m1, m2 = two, one, m2, m1
            nxt.append((one, mL, m2, path * 2))
            nxt.append((two, m1, mR, path * 2 + 1))
        clusters = nxt
    return {d: path for ids, _l, _r, path in clusters for d in ids}


def _parity_corpus(spark, n_groups=6, per_group=40, n_empty=3):
    """Clustered docs with a unique term each (real cosine margins, no
    knife-edge ties across float sum orders) plus term-less docs."""
    vocab = [
        ["alpha", "beta", "gamma", "delta"],
        ["red", "green", "blue", "cyan"],
        ["one", "two", "three", "four"],
        ["cat", "dog", "fox", "owl"],
        ["sun", "moon", "star", "sky"],
        ["run", "walk", "jump", "swim"],
    ]
    rows = []
    for i in range(n_groups * per_group):
        g = i % n_groups
        rows.append((i, f"https://x/{i}", " ".join(vocab[g] * 6) + f" w{i}"))
    base = n_groups * per_group
    for j in range(n_empty):
        rows.append((base + j, f"https://x/{base+j}", ""))
    return spark.createDataFrame(rows, "doc_id long, url string, text string")


@pytest.mark.parametrize(
    "caps",
    [
        dict(direct_cap=500, sample_cap=1000, min_seg=21),  # direct branch
        dict(direct_cap=50, sample_cap=64, min_seg=5),  # sampled branch
    ],
)
def test_prim_outer_matches_inprocess_recursion(spark, caps):
    """The distributed outer='prim' levels must assign every doc the
    SAME path as the in-process reference recursion — sampled Prim
    split, tie-to-side-two assignment, mid-split fallbacks, and
    neighbor orientation all included. Covers term-less docs (empty
    vectors -> side two) and both split_index branches."""
    from pyspark.sql import functions as F

    ensure_shipped(spark)
    docs = _parity_corpus(spark)
    state0 = docs.select("doc_id").withColumn(
        "path", F.lit(0).cast("long")
    )
    tf = reorder._unit_term_weights(docs.select("doc_id", "text")).persist()
    try:
        st = reorder._prim_outer_levels(docs, state0, tf, 3, **caps)
        got = {int(r["doc_id"]): int(r["path"]) for r in st.collect()}
    finally:
        tf.unpersist()

    tvecs: dict[int, dict[str, float]] = {}
    for r in reorder._term_weights(docs.select("doc_id", "text")).collect():
        tvecs.setdefault(int(r["doc_id"]), {})[r["term"]] = float(r["w"])
    for d in got:
        tvecs.setdefault(d, {})
    want = _twin_prim_levels(sorted(tvecs), tvecs, 3, **caps)
    assert got == want


def test_bisect_prim_outer_invariants_and_grouping(spark):
    """outer='prim' end-to-end: dense permutation, all columns kept,
    and the reference criterion reconstructs cluster adjacency at
    least as well as the grouping bar the kmeans test uses."""
    ensure_shipped(spark)
    docs = clustered_corpus(spark)
    out = reorder.reorder_bisect(docs, depth=3, outer="prim").cache()
    rows = out.select("doc_id", "orig_doc_id").collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(len(rows)))
    group_of = {r["doc_id"]: r["orig_doc_id"] % 6 for r in rows}
    same = sum(
        1 for i in range(len(rows) - 1) if group_of[i] == group_of[i + 1]
    )
    assert same / (len(rows) - 1) > 0.9
    out.unpersist()


def test_bisect_prim_outer_all_identical_docs(spark):
    """Degenerate corpus under outer='prim': still a dense permutation
    (Prim over an all-ties graph + orientation swaps must not lose or
    duplicate docs)."""
    ensure_shipped(spark)
    rows = [(i, f"https://x/{i}", "same words every time") for i in range(9)]
    docs = spark.createDataFrame(rows, "doc_id long, url string, text string")
    got = reorder.reorder_bisect(docs, depth=2, outer="prim").collect()
    assert sorted(r["doc_id"] for r in got) == list(range(9))


def test_bisect_rejects_unknown_outer(spark):
    docs = clustered_corpus(spark, n_groups=2, per_group=3)
    with pytest.raises(ValueError, match="outer"):
        reorder.reorder_bisect(docs, outer="nope")


def test_prim_outer_zero_norm_side_two_matches_recursion(spark):
    """Sampled-branch shape where Prim's side two ends up ONLY
    term-less docs (zero-norm center of mass): _split_cluster does NOT
    mid-split — cos>0 docs go to side one, ties (cos 0 vs the zero
    vector) to side two — and the distributed path must reproduce
    that assignment, not fall back to the mid-split marker. 11 termed
    docs = half-1 of the 24-doc sample, so side two is all term-less
    whether Prim seeds on a termed or a term-less doc."""
    from pyspark.sql import functions as F

    ensure_shipped(spark)
    rows = [(i, f"https://x/{i}", "shared shared shared") for i in range(11)]
    rows += [(11 + j, f"https://x/{11+j}", "") for j in range(13)]
    docs = spark.createDataFrame(
        rows, "doc_id long, url string, text string"
    )
    caps = dict(direct_cap=10, sample_cap=1000, min_seg=5)
    state0 = docs.select("doc_id").withColumn(
        "path", F.lit(0).cast("long")
    )
    tf = reorder._unit_term_weights(docs.select("doc_id", "text")).persist()
    try:
        st = reorder._prim_outer_levels(docs, state0, tf, 1, **caps)
        got = {int(r["doc_id"]): int(r["path"]) for r in st.collect()}
    finally:
        tf.unpersist()

    tvecs: dict[int, dict[str, float]] = {}
    for r in reorder._term_weights(docs.select("doc_id", "text")).collect():
        tvecs.setdefault(int(r["doc_id"]), {})[r["term"]] = float(r["w"])
    for d in got:
        tvecs.setdefault(d, {})
    want = _twin_prim_levels(sorted(tvecs), tvecs, 1, **caps)
    assert got == want
    # and the split is the REFERENCE's grouping (termed docs together),
    # not the mid-split fallback's {first 12}/{last 12}
    sides: dict[int, set[int]] = {}
    for d, p in want.items():
        sides.setdefault(p, set()).add(d)
    assert set(range(11)) in sides.values()


def test_reorder_bisect_validates_iters(spark):
    import pytest

    from search_engine_spark.reorder import reorder_bisect

    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a c")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="iters"):
        reorder_bisect(docs, iters=0)

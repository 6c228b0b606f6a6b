"""Dedup-family + ANN library operators (DataFrame-API paths)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from search_engine_spark import ann, dedup
from search_engine_spark.runtime import ensure_shipped

from conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    ensure_shipped(spark)
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )


@pytest.fixture(scope="module")
def emb(spark):
    ensure_shipped(spark)
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_exact_duplicates_marks_later_copies(spark):
    df = spark.createDataFrame(
        [(1, "aaa"), (2, "bbb"), (3, "aaa"), (4, "aaa"), (5, "ccc"),
         (6, None), (7, None), (8, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in dedup.exact_duplicates(df).collect()}
    assert len(rows) == 8  # null-text docs must not vanish
    assert not rows[1]["is_dup"] and rows[3]["is_dup"] and rows[4]["is_dup"]
    assert not rows[2]["is_dup"] and not rows[5]["is_dup"]
    assert rows[1]["text_hash"] == rows[3]["text_hash"]
    # null text: own group (min doc_id keeps), distinct from empty text
    assert not rows[6]["is_dup"] and rows[7]["is_dup"]
    assert not rows[8]["is_dup"]
    assert rows[6]["text_hash"] is None and rows[8]["text_hash"] is not None


def test_minhash_matches_pure_python(spark):
    import hashlib

    df = spark.createDataFrame(
        [(7, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    got = {
        r["minhash_idx"]: r["minhash"]
        for r in dedup.minhash_signatures(df, n_hashes=4).collect()
    }
    toks = "the quick brown fox jumps over the lazy dog".split()
    shingles = {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}
    P = dedup.MINHASH_P
    hs = {
        int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % P
        for s in shingles
    }
    for i, (a, b) in enumerate(dedup.minhash_coeffs(4)):
        expect = min((a * h + b) % P for h in hs)
        assert got[i] == expect


def test_lsh_pairs_find_planted_near_dupes(spark):
    # J(1,2) = 35/41 — verified to collide under the fixed md5 scheme
    # (deterministic: no RNG anywhere, so this can't flake)
    words = [f"w{i}" for i in range(40)]
    docs = [
        (1, " ".join(words)),
        (2, " ".join(words[:-1] + ["CHANGED"])),  # near-dup of 1
        (3, "completely different words entirely unrelated content here now"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_candidate_pairs(df).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_lsh_bucket_cap_limits_pairs(spark):
    df = spark.createDataFrame(
        [(i, "same text for everyone") for i in range(10)],
        "doc_id long, text string",
    )
    # oversized (boilerplate) buckets are dropped entirely: 10 identical
    # docs -> every band bucket has 10 members > cap 3 -> no candidates
    capped = dedup.lsh_candidate_pairs(df, max_bucket_size=3).collect()
    assert capped == []
    # the accounting view reports exactly what was dropped
    stats = dedup.lsh_bucket_stats(df, max_bucket_size=3).collect()
    assert stats and all(r["n_docs"] == 10 for r in stats)
    # with the cap off, all C(10,2) pairs appear
    uncapped = dedup.lsh_candidate_pairs(df, max_bucket_size=None).collect()
    assert len(uncapped) == 45


def test_ngram_jaccard_exact_value(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d x")],
        "doc_id long, text string",
    )
    rows = dedup.ngram_jaccard_pairs(df, threshold=0.0).collect()
    # doc1 shingles: {abc,bcd,cde}; doc2: {abc,bcd,cdx}; shared 2, union 4
    assert len(rows) == 1
    assert rows[0]["jaccard"] == pytest.approx(0.5)


def test_simhash_close_docs_small_hamming(spark):
    df = spark.createDataFrame(
        [
            (1, "spark index query engine fast scalable " * 5),
            (2, "spark index query engine fast scalable " * 5 + "extra"),
            (3, "unrelated totally different text payload entirely"),
        ],
        "doc_id long, text string",
    )
    h = {r["doc_id"]: r["simhash"] for r in dedup.simhash(df).collect()}
    d12 = bin(h[1] ^ h[2]).count("1")
    d13 = bin(h[1] ^ h[3]).count("1")
    assert d12 < d13


def test_embedding_neardup_lsh_subset_of_exact_and_high_recall(spark):
    rng = np.random.default_rng(42)
    base = rng.normal(size=(20, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        # planted near-duplicate: tiny perturbation
        rows.append((100 + i, [float(x + 0.01 * rng.normal()) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_neardup_pairs(df, 0.99, exact=True).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_neardup_pairs(df, 0.99).collect()
    }
    assert approx <= exact
    planted = {(i, 100 + i) for i in range(20)} & exact
    assert len(planted) == 20
    recall = len(approx & planted) / len(planted)
    assert recall >= 0.9


def test_ann_bruteforce_matches_numpy(emb, spark):
    queries = emb.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    got = ann.cosine_topk(emb, queries, k=3).collect()
    mat = np.array(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()], dtype=float
    )
    ids = [r["vec_id"] for r in emb.orderBy("vec_id").collect()]
    norms = np.linalg.norm(mat, axis=1)
    for qid in (0, 1):
        qv = mat[ids.index(qid)]
        cos = mat @ qv / (norms * np.linalg.norm(qv))
        order = [
            ids[i]
            for i in np.argsort(-np.round(cos, 4) + np.array(ids) * 1e-12)
            if ids[i] != qid
        ][:3]
        mine = [
            r["neighbor_id"]
            for r in sorted(
                (r for r in got if r["query_id"] == qid),
                key=lambda r: r["rank"],
            )
        ]
        assert mine == order


def test_ann_ivf_recall_vs_bruteforce(emb, spark):
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    exact = ann.cosine_topk(emb, queries, k=5).collect()
    approx = ann.ivf_topk(emb, queries, k=5, n_cells=8, nprobe=4).collect()
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact}
    ap = {(r["query_id"], r["neighbor_id"]) for r in approx}
    # nprobe=half the cells -> recall well above chance; exact-cos scores
    recall = len(ex & ap) / len(ex)
    assert recall >= 0.5
    for r in approx:
        assert -1.0001 <= r["cos"] <= 1.0001
    # full probe == brute force
    allp = ann.ivf_topk(emb, queries, k=5, n_cells=8, nprobe=8).collect()
    assert {(r["query_id"], r["neighbor_id"]) for r in allp} == ex


def test_ann_kmeans_codebook_recall_and_shape(emb, spark):
    """Lloyd-trained codebook: valid shape (n_cells x dims, unit-norm),
    and IVF recall with it is at least as good as chance at the same
    nprobe; full probe still equals brute force (codebook choice only
    affects which cells are probed, never the in-cell cosine)."""
    cb = ann.kmeans_codebook(emb, n_cells=8, n_iter=3)
    rows = cb.collect()
    assert len(rows) == 8
    dims = len(emb.select("embedding").first()["embedding"])
    for r in rows:
        assert len(r["cv"]) == dims
        nrm = math.sqrt(sum(x * x for x in r["cv"]))
        assert nrm == pytest.approx(1.0, abs=1e-9)
    queries = emb.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    exact = ann.cosine_topk(emb, queries, k=5).collect()
    ex = {(r["query_id"], r["neighbor_id"]) for r in exact}
    km = ann.ivf_topk(emb, queries, k=5, n_cells=8, nprobe=4, codebook=cb).collect()
    recall_km = len(ex & {(r["query_id"], r["neighbor_id"]) for r in km}) / len(ex)
    assert recall_km >= 0.5
    allp = ann.ivf_topk(emb, queries, k=5, n_cells=8, nprobe=8, codebook=cb).collect()
    assert {(r["query_id"], r["neighbor_id"]) for r in allp} == ex


def test_semantic_dedup_min_id_keep_rule(spark):
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0]),   # codebook cell 0
            (1, [0.0, 1.0]),   # codebook cell 1
            (2, [2.0, 0.0]),   # parallel to 0 -> dup_of 0
            (3, [0.7, 0.7]),   # equidistant: tie-breaks to cell 0, kept
            (4, [0.0, 3.0]),   # parallel to 1 -> dup_of 1
            (5, [0.7, 0.7]),   # identical to 3 -> dup_of 3 (min id in cell)
        ],
        "vec_id long, embedding array<float>",
    )
    got = {
        r["vec_id"]: (r["cell"], r["dup_of"], r["is_dup"])
        for r in ann.semantic_dedup(emb, n_cells=2, tau=0.999).collect()
    }
    assert got == {
        0: (0, None, False),
        1: (1, None, False),
        2: (0, 0, True),
        3: (0, None, False),
        4: (1, 1, True),
        5: (0, 3, True),
    }
    # kmeans codebook path: same schema, one row per vector
    km = ann.semantic_dedup(
        emb,
        tau=0.999,
        codebook=ann.kmeans_codebook(emb, n_cells=2, n_iter=2),
    )
    assert km.count() == 6


def test_simhash_bits_bound_explicit(spark):
    """bits > 60 would overflow conv(hex,16,10).cast('long') to NULL
    and silently corrupt signatures — the API bound must be explicit."""
    import pytest as _pytest

    from search_engine_spark.dedup import simhash

    docs = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="bits"):
        simhash(docs, bits=64)
    assert simhash(docs, bits=60).count() == 1


def test_decontaminate_exact_counts(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "quick brown fox story with unrelated ending here"),
            (3, "totally different text with zero overlap at all"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "eval item the quick brown fox jumps high")],
        "bench_id long, text string",
    )
    rows = dedup.decontaminate(corpus, bench, shingle_n=3, min_overlap=1)
    got = {(r["doc_id"], r["bench_id"]): r["n_shared"] for r in rows.collect()}
    # doc1 shares {"the quick brown","quick brown fox","brown fox jumps"};
    # doc2 shares {"quick brown fox"}; doc3 shares nothing
    assert got == {(1, 100): 3, (2, 100): 1}
    # raising the floor drops the 1-shingle hit
    floored = dedup.decontaminate(corpus, bench, shingle_n=3, min_overlap=2)
    assert [
        (r["doc_id"], r["n_shared"]) for r in floored.collect()
    ] == [(1, 3)]


def test_span_dedup_masks_cross_doc_spans_only(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c d e f"),        # shares "c d e" with doc 2
            (2, "x y c d e z"),
            (3, "p q"),                # shorter than n: untouched
            (4, "m n o m n o"),        # byte-identical pair: fully masked
            (5, "m n o m n o"),
            (6, "r s t u r s t u"),    # WITHIN-doc repeat only: untouched
            (7, ""),                   # empty doc
        ],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in dedup.span_dedup(docs, n=3, min_dup=2).collect()
    }
    assert got == {
        1: ("a b f", 6, 3),
        2: ("x y z", 6, 3),
        3: ("p q", 2, 0),
        4: ("", 6, 6),
        5: ("", 6, 6),
        6: ("r s t u r s t u", 8, 0),
        7: ("", 0, 0),
    }
    # raising min_dup above the duplicate count leaves everything intact
    untouched = dedup.span_dedup(docs, n=3, min_dup=3)
    assert untouched.where(F.col("n_removed") > 0).count() == 0
    with pytest.raises(ValueError):
        dedup.span_dedup(docs, n=0)
    with pytest.raises(ValueError):  # would mask every gram occurrence
        dedup.span_dedup(docs, min_dup=1)


@pytest.mark.parametrize("seed,n,min_dup", [(1, 3, 2), (2, 2, 2), (3, 3, 3)])
def test_span_dedup_matches_bruteforce(spark, seed, n, min_dup):
    """Randomized corpora from a tiny vocab (dense gram collisions,
    overlapping covers, within-doc repeats) vs a pure-Python
    reference implementation."""
    import random
    from collections import defaultdict

    from search_engine_spark.tokenizer import tokenize_text

    rng = random.Random(seed)
    vocab = ["a", "b", "c", "d", "e", "f", "g", "h"]
    texts = {
        d: " ".join(rng.choices(vocab, k=rng.randint(1, 24)))
        for d in range(20)
    }
    toks = {d: tokenize_text(t) for d, t in texts.items()}
    gram_docs = defaultdict(set)
    for d, ts in toks.items():
        for i in range(len(ts) - n + 1):
            gram_docs[tuple(ts[i : i + n])].add(d)
    want = {}
    for d, ts in toks.items():
        cov = set()
        for i in range(len(ts) - n + 1):
            if len(gram_docs[tuple(ts[i : i + n])]) >= min_dup:
                cov.update(range(i, i + n))
        kept = [t for j, t in enumerate(ts) if j not in cov]
        want[d] = (" ".join(kept), len(ts), len(cov))

    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in dedup.span_dedup(df, n=n, min_dup=min_dup).collect()
    }
    assert got == want


def test_decontaminate_shuffle_join_same_result(spark):
    corpus = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "x y z w v u t s")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "c d e f g h extra tail")], "bench_id long, text string"
    )
    a = sorted(
        map(tuple, dedup.decontaminate(corpus, bench, 4, 1, True).collect())
    )
    b = sorted(
        map(tuple, dedup.decontaminate(corpus, bench, 4, 1, False).collect())
    )
    assert a == b and len(a) == 1


def _uf_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    out = {}
    for ms in comp.values():
        m = min(ms)
        for n in ms:
            out[n] = m
    return out


@pytest.mark.parametrize(
    "edges",
    [
        [(i, i + 1) for i in range(40)],  # chain: label-prop worst case
        [(a, b) for a in range(5) for b in range(a + 1, 5)]
        + [(10, 11), (11, 12)],  # clique + path
        [(3, 9), (9, 3), (7, 7), (1, 5), (5, 2), (8, 6)],  # dups/self
    ],
)
@pytest.mark.parametrize("driver_cap", [0, dedup.CC_DRIVER_CAP])
def test_connected_components_vs_union_find(spark, edges, driver_cap):
    # driver_cap=0 forces the distributed star rounds; the default
    # takes the driver union-find fast path — identical output required
    edges = [(a, b) for a, b in edges if a != b]
    nodes = sorted({x for e in edges for x in e})
    expect = _uf_components(edges, nodes)
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.connected_components(
            df, driver_cap=driver_cap
        ).collect()
    }
    assert got == expect


def test_connected_components_degree_skew_hub(spark):
    """One node in 1e5 pairs — documents where the collect_set bound
    actually sits: per-task memory scales with the hottest node's
    CURRENT degree (1e5 longs here, <1 MB in a collect_set buffer),
    and large-star contracts the hub's star toward the component min
    in one round, so the skew never compounds across rounds."""
    pairs = spark.range(1, 100_001).select(
        F.lit(0).cast("long").alias("doc_a"),
        F.col("id").cast("long").alias("doc_b"),
    )
    got = dedup.connected_components(pairs, driver_cap=0)
    assert got.where(F.col("cluster_id") != 0).count() == 0
    assert got.count() == 100_001


def test_connected_components_nonconvergence_raises(spark):
    df = spark.createDataFrame([(0, 1)], "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="converge"):
        dedup.connected_components(df, max_iter=1, driver_cap=0)


def test_dedup_clusters_singletons_and_survivors(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(1, 3), (3, 5)], "doc_a long, doc_b long")
    rows = {
        r["doc_id"]: (r["cluster_id"], r["is_survivor"])
        for r in dedup.dedup_clusters(docs, pairs).collect()
    }
    assert rows == {
        0: (0, True), 1: (1, True), 2: (2, True),
        3: (1, False), 4: (4, True), 5: (1, False),
    }


def test_lsh_incremental_equals_batch_restriction(spark):
    """Incremental pairs over a split corpus == batch pairs over the
    union restricted to >= 1 new side; base-base pairs never leak."""
    from pyspark.sql import functions as F

    words = [f"w{i}" for i in range(40)]
    rows = [
        (1, " ".join(words)),                                  # base
        (2, " ".join(words[:-1] + ["CHANGED"])),               # base dup of 1
        (3, "completely different words entirely unrelated here now what"),
        (10, " ".join(words[:-1] + ["ALSO"])),                 # new dup of 1/2
        (15, " ".join(words[:-2] + ["ALSO", "TOO"])),          # new dup
        (20, "nothing like anything else at all in this corpus today"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = df.where(F.col("doc_id") < 10)
    new = df.where(F.col("doc_id") >= 10)
    inc = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_incremental_pairs(
            new, dedup.lsh_bands(base)
        ).collect()
    }
    batch = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.lsh_candidate_pairs(df).collect()
    }
    want = {(a, b) for a, b in batch if a >= 10 or b >= 10}
    assert inc == want
    assert inc, "planted near-dups must collide"
    assert all(a >= 10 or b >= 10 for a, b in inc)


def test_lsh_incremental_prunes_base_before_agg(spark):
    """The base band table must be leftsemi-pruned to increment-touched
    buckets (work O(increment), not O(corpus)), and the pipeline stays
    pure-JVM."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(i, f"doc {i} words alpha beta gamma delta {i}") for i in range(20)],
        "doc_id long, text string",
    )
    base_bands = dedup.lsh_bands(df.where(F.col("doc_id") < 15))
    out = dedup.lsh_incremental_pairs(
        df.where(F.col("doc_id") >= 15), base_bands
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan, plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan, marker


def test_line_dedup_semantics(spark):
    """Boilerplate lines drop from EVERY doc (no canonical keeper);
    normalization collides trivial variants (case, punctuation,
    digits); blank/punct-only lines are exempt; surviving lines keep
    original order and text."""
    from search_engine_spark.dedup import line_dedup

    docs = spark.createDataFrame(
        [
            (0, "Accept cookies!\nalpha story one\n---\nend note zero"),
            (1, "ACCEPT   COOKIES 2024\nbeta story two\n---"),
            (2, "gamma story three\naccept, cookies.\n\nunique tail"),
            (3, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(docs).collect()}
    # the cookie banner normalizes identically in 3 docs -> dropped
    # everywhere, original casing/punct never matters
    assert out[0]["clean_text"] == "alpha story one\n---\nend note zero"
    assert out[1]["clean_text"] == "beta story two\n---"
    assert out[2]["clean_text"] == "gamma story three\n\nunique tail"
    assert [out[i]["n_removed"] for i in (0, 1, 2)] == [1, 1, 1]
    # '---' normalizes to '' -> exempt despite appearing twice; the
    # empty line in doc 2 likewise survives
    assert out[0]["n_lines"] == 4 and out[2]["n_lines"] == 4
    # NULL text -> one blank (exempt) line, nothing removed
    assert out[3]["clean_text"] == "" and out[3]["n_removed"] == 0
    assert out[3]["n_lines"] == 1

    with pytest.raises(ValueError, match="min_dup"):
        line_dedup(docs, min_dup=1)


def test_line_dedup_min_dup_threshold(spark):
    """min_dup=3: a line shared by only two docs survives; within-doc
    repetition alone never triggers removal (census is distinct-doc)."""
    from search_engine_spark.dedup import line_dedup

    docs = spark.createDataFrame(
        [
            (0, "shared pair\nrepeat me\nrepeat me\nrepeat me"),
            (1, "shared pair\nother"),
            (2, "tri line\nx"),
            (3, "tri line\ny"),
            (4, "tri line\nz"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in line_dedup(docs, min_dup=3).collect()}
    assert out[0]["n_removed"] == 0  # pair + within-doc repeats survive
    assert out[0]["clean_text"].count("repeat me") == 3
    assert all(out[i]["clean_text"] == out[i]["clean_text"].replace(
        "tri line\n", "") for i in (2, 3, 4))
    assert [out[i]["n_removed"] for i in (2, 3, 4)] == [1, 1, 1]


def test_embedding_neardup_tolerates_null_vectors(spark):
    """A null/empty embedding row anywhere (including scanned first)
    must not blank the dims probe — real near-dups still surface and
    null rows simply drop from the pair universe."""
    emb = spark.createDataFrame(
        [(0, None), (1, [1.0, 0.0, 0.0]), (2, [0.999, 0.01, 0.0]),
         (3, [0.0, 1.0, 0.0]), (4, [])],
        "vec_id long, embedding array<double>",
    )
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.embedding_neardup_pairs(
            emb, threshold=0.9, exact=True
        ).collect()
    }
    assert (1, 2) in pairs
    assert not any(0 in p or 4 in p for p in pairs)


def test_kmeans_codebook_tolerates_null_vectors(spark):
    """Null embeddings neither poison the dims probe nor become NULL
    centroids; training proceeds over the non-null vectors."""
    rows = [(0, None)] + [
        (i, [1.0 * (i % 3 == 0), 1.0 * (i % 3 == 1), 1.0 * (i % 3 == 2)])
        for i in range(1, 40)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    cb = ann.kmeans_codebook(emb, n_cells=3, n_iter=3).collect()
    assert len(cb) == 3
    assert all(r["cv"] is not None and len(r["cv"]) == 3 for r in cb)

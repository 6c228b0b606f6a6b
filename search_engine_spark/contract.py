"""Driver-contract queries: paired Spark + DuckDB-oracle implementations.

Each entry in :data:`QUERIES` maps a name to a Spark implementation
(callable ``(spark, sf_dir) -> DataFrame``) and, when SQL-expressible, an
ANSI-SQL oracle string DuckDB runs on the same parquet (views
``documents``/``embeddings``/``events`` pre-registered by the driver).

Cross-engine determinism rules used throughout:
* tokenization: Spark side uses the engine's exact pandas-UDF tokenizer;
  the oracle uses an equivalent RE2 character class (identical on any
  text, not just the sandbox corpus).
* hashes: only ``md5`` (identical hex in both engines) — minhash/LSH/
  simhash/fingerprints are all md5-derived so both engines agree exactly.
* floats: computed with the same double-precision expression tree and
  ``round(x, 4)``; rank ties broken by id columns.
* BM25 here is the double-precision relational formulation for
  cross-engine comparison; float32 reference-parity of the real engine
  is covered by tests/test_query.py against the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .build import chunk_postings
from .runtime import ensure_shipped
from .tokenizer import INDEX_ASCII_DELIMS, UNICODE_DELIMS

# RE2/PCRE character class equivalent to the engine tokenizer's delimiter
# set ('-' first, ']' escaped; '$' intentionally NOT a delimiter).
_RX = "[-" + " ,.;:?[\\]{}()/+*&^\"'@!#%><|~\\n" + UNICODE_DELIMS + "]+"
_RX_SQL = _RX.replace("'", "''")

# sanity: class content == tokenizer sets
assert set(INDEX_ASCII_DELIMS + UNICODE_DELIMS) == set(
    _RX[1:-2].replace("\\]", "]").replace("\\n", "\n")
)

BM25_DISJ_TERMS = ("spark", "query", "data")
BM25_CONJ_TERMS = ("data", "row", "table")
STOPWORDS = ("the", "a", "of", "and", "to", "in")
N_MINHASH = 16
LSH_BANDS = 4  # 4 bands x 4 rows
JACCARD_THRESHOLD = 0.05
ANN_QUERY_IDS = (0, 1, 2)
ANN_K = 5

# ---------------------------------------------------------------- helpers


def _prepare(spark, sf_dir: str) -> None:
    ensure_shipped(spark)
    for name in ("documents", "embeddings", "events"):
        spark.read.parquet(f"{sf_dir}/{name}.parquet").createOrReplaceTempView(
            name
        )


def _sql_query(spark_sql: str):
    def run(spark, sf_dir: str) -> DataFrame:
        _prepare(spark, sf_dir)
        return spark.sql(spark_sql)

    return run


def _toks_cte(engine: str, docs_where: str = "") -> str:
    # docs_where: optional "WHERE ..." restricting the corpus BEFORE
    # stats — the fresh-stats (post-compaction) oracle formulation
    if engine == "spark":
        # JVM-side tokenize (split + filter): whole-stage codegen, no
        # Python worker — same semantics as tokenizer.tokenize_col
        from .tokenizer import JAVA_INDEX_CLASS

        rx = JAVA_INDEX_CLASS.replace("\\", "\\\\").replace("'", "\\'")
        return (
            "toks AS (SELECT doc_id, "
            f"filter(split(coalesce(text, ''), '{rx}', -1), t -> t != '') "
            f"AS ts FROM documents{docs_where})"
        )
    return (
        "toks AS (SELECT doc_id, list_filter(regexp_split_to_array(text, "
        f"'{_RX_SQL}'), t -> t <> '') AS ts FROM documents{docs_where})"
    )


def _tok_cte(engine: str) -> str:
    if engine == "spark":
        return "tok AS (SELECT doc_id, explode(ts) AS term FROM toks)"
    return "tok AS (SELECT doc_id, unnest(ts) AS term FROM toks)"


def _len_fn(engine: str) -> str:
    return "size" if engine == "spark" else "len"


def _shingle_cte(engine: str, n: int, name: str = "sh") -> str:
    """Distinct word n-gram shingles per doc (space-joined)."""
    if engine == "spark":
        grams = ", ".join(f"element_at(ts, i+{j+1})" for j in range(n))
        return (
            f"{name} AS (SELECT DISTINCT doc_id, shingle FROM ("
            f"SELECT doc_id, explode(transform(sequence(0, size(ts)-{n}), "
            f"i -> concat_ws(' ', {grams}))) AS shingle "
            f"FROM toks WHERE size(ts) >= {n}))"
        )
    grams = " || ' ' || ".join(f"ts[i+{j}]" for j in range(n))
    return (
        f"{name} AS (SELECT DISTINCT doc_id, shingle FROM ("
        f"SELECT doc_id, unnest(list_transform(range(1, len(ts)-{n - 2}), "
        f"i -> {grams})) AS shingle FROM toks WHERE len(ts) >= {n}))"
    )


def _minhash_cte(engine: str) -> str:
    """minhash_i = min over shingles of (a_i*h + b_i) mod P, where h is
    the shingle's 60-bit md5 prefix mod P — the same one-base-hash
    universal-permutation family dedup._minhash_wide computes, with the
    (a_i, b_i) literals baked in from dedup.minhash_coeffs."""
    from .dedup import MINHASH_P, minhash_coeffs

    vals = ", ".join(
        f"({i}, {a}, {b})"
        for i, (a, b) in enumerate(minhash_coeffs(N_MINHASH))
    )
    if engine == "spark":
        params = (
            f"params AS (SELECT * FROM VALUES {vals} "
            "AS t(minhash_idx, a, b))"
        )
        h = (
            "CAST(conv(substr(md5(shingle), 1, 15), 16, 10) AS BIGINT) "
            f"% {MINHASH_P}"
        )
    else:
        params = (
            f"params AS (SELECT CAST(minhash_idx AS INT) AS minhash_idx, "
            f"a, b FROM (VALUES {vals}) t(minhash_idx, a, b))"
        )
        h = f"('0x' || substr(md5(shingle), 1, 15))::BIGINT % {MINHASH_P}"
    return (
        params
        + f", hs AS (SELECT doc_id, {h} AS h FROM sh)"
        + ", sigs AS (SELECT doc_id, minhash_idx, "
        f"min((a * h + b) % {MINHASH_P}) AS minhash "
        "FROM hs CROSS JOIN params GROUP BY doc_id, minhash_idx)"
    )


# ------------------------------------------------------------ SQL builders


def sql_term_tf(engine: str) -> str:
    return (
        f"WITH {_toks_cte(engine)}, {_tok_cte(engine)} "
        "SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf "
        "FROM tok GROUP BY doc_id, term"
    )


def sql_lexicon_df(engine: str) -> str:
    return (
        f"WITH {_toks_cte(engine)}, {_tok_cte(engine)} "
        "SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df "
        "FROM tok GROUP BY term"
    )


def sql_doc_stats(engine: str) -> str:
    ln = _len_fn(engine)
    return (
        f"WITH {_toks_cte(engine)} "
        "SELECT CAST(count(*) AS BIGINT) AS n_docs, "
        f"round(avg({ln}(ts)), 6) AS avgdl, "
        f"CAST(sum({ln}(ts)) AS BIGINT) AS total_tokens FROM toks"
    )


def sql_doc_table(engine: str) -> str:
    ln = _len_fn(engine)
    return (
        f"WITH {_toks_cte(engine)} "
        "SELECT d.doc_id, "
        "concat('https://', d.source, '/doc/', CAST(d.doc_id AS STRING)) AS url, "
        f"CAST({ln}(t.ts) AS BIGINT) AS doc_length "
        "FROM documents d JOIN toks t ON d.doc_id = t.doc_id"
    )


def sql_top_terms(engine: str) -> str:
    return (
        f"WITH {_toks_cte(engine)}, {_tok_cte(engine)} "
        "SELECT term, CAST(count(*) AS BIGINT) AS total_tf "
        "FROM tok GROUP BY term ORDER BY total_tf DESC, term LIMIT 20"
    )


def _bm25_base(engine: str, docs_where: str = "") -> str:
    ln = _len_fn(engine)
    return (
        f"WITH {_toks_cte(engine, docs_where)}, {_tok_cte(engine)}, "
        "tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf "
        "FROM tok GROUP BY doc_id, term), "
        f"dl AS (SELECT doc_id, CAST({ln}(ts) AS BIGINT) AS dl FROM toks), "
        "stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, "
        f"avg({ln}(ts)) AS avgdl FROM toks), "
        "dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df "
        "FROM tf GROUP BY term), "
        "scored AS (SELECT tf.doc_id, tf.term, "
        "ln((CAST(s.n_docs AS DOUBLE) - dfs.df + 0.5) / "
        "(CAST(dfs.df AS DOUBLE) + 0.5)) * 2.2 * tf.tf / "
        "(1.2 * (0.25 + 0.75 * dl.dl / s.avgdl) + tf.tf) AS score "
        "FROM tf JOIN dl ON tf.doc_id = dl.doc_id "
        "JOIN dfs ON tf.term = dfs.term CROSS JOIN stats s "
    )


def sql_bm25(engine: str, terms: tuple[str, ...], conjunctive: bool) -> str:
    in_list = ", ".join(f"'{t}'" for t in terms)
    having = ""
    if conjunctive:
        having = (
            " HAVING count(DISTINCT term) = "
            f"(SELECT count(*) FROM dfs WHERE term IN ({in_list}))"
        )
    return (
        _bm25_base(engine) + f"WHERE tf.term IN ({in_list})) "
        # rank on the UNROUNDED sum, like the engine: ordering by the
        # rounded output alias could pick a different doc set at a
        # round-tie straddling the LIMIT boundary (the phrase oracles
        # already order this way). The raw sum rides as _raw through a
        # subquery because Spark resolves ORDER BY sum(score) against
        # the rounded output alias.
        "SELECT doc_id, score FROM ("
        "SELECT doc_id, round(sum(score), 4) AS score, "
        "sum(score) AS _raw FROM scored "
        f"GROUP BY doc_id{having}"
        ") ORDER BY _raw DESC, doc_id LIMIT 10"
    )


def sql_chunk_metadata(engine: str) -> str:
    idiv = "div" if engine == "spark" else "//"
    return (
        f"WITH {_toks_cte(engine)}, {_tok_cte(engine)}, "
        "tf AS (SELECT term, doc_id FROM tok GROUP BY term, doc_id), "
        "pos AS (SELECT term, doc_id, CAST((row_number() OVER "
        f"(PARTITION BY term ORDER BY doc_id) - 1) {idiv} 128 AS INT) "
        "AS chunk_seq FROM tf) "
        "SELECT term, chunk_seq, min(doc_id) AS first_doc_id, "
        "max(doc_id) AS last_doc_id, CAST(count(*) AS INT) AS n "
        "FROM pos GROUP BY term, chunk_seq"
    )


def sql_dedup_exact(engine: str) -> str:
    return (
        "SELECT doc_id, md5(text) AS text_hash, "
        "(row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)) > 1 "
        "AS is_dup FROM documents"
    )


def _band_exprs(engine: str) -> tuple[str, str]:
    """(band, band_key) SQL snippets shared by every LSH oracle — the
    md5-of-slot-ordered-minhash band key over the sigs CTE."""
    if engine == "spark":
        return (
            "CAST(minhash_idx div 4 AS INT)",
            "md5(concat_ws(',', transform(array_sort(collect_list("
            "struct(minhash_idx, minhash))), s -> CAST(s.minhash AS STRING))))",
        )
    return (
        "CAST(minhash_idx // 4 AS INT)",
        "md5(string_agg(CAST(minhash AS VARCHAR), ',' ORDER BY minhash_idx))",
    )


def sql_minhash_signatures(engine: str) -> str:
    return (
        f"WITH {_toks_cte(engine)}, {_shingle_cte(engine, 3)}, "
        f"{_minhash_cte(engine)} "
        "SELECT doc_id, minhash_idx, minhash FROM sigs"
    )


def sql_lsh_pairs(engine: str) -> str:
    band, band_key = _band_exprs(engine)
    return (
        f"WITH {_toks_cte(engine)}, {_shingle_cte(engine, 3)}, "
        f"{_minhash_cte(engine)}, "
        f"bands AS (SELECT doc_id, {band} AS band, {band_key} AS band_key "
        f"FROM sigs GROUP BY doc_id, {band}) "
        "SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
        "FROM bands a JOIN bands b "
        "ON a.band = b.band AND a.band_key = b.band_key "
        "AND a.doc_id < b.doc_id"
    )


def spark_lsh_incremental(spark, sf_dir: str) -> DataFrame:
    """Incremental LSH dedup through the REAL split pipeline: docs with
    doc_id % 5 == 0 arrive as the 'increment', the rest are the
    already-banded base corpus (its bands precomputed exactly as a
    production pipeline would persist them)."""
    from pyspark.sql import functions as F

    from .dedup import lsh_bands, lsh_incremental_pairs

    docs = _docs(spark, sf_dir)
    base = docs.where(F.col("doc_id") % 5 != 0)
    new = docs.where(F.col("doc_id") % 5 == 0)
    return lsh_incremental_pairs(
        new, lsh_bands(base, n_hashes=N_MINHASH), n_hashes=N_MINHASH,
        max_bucket_size=None,
    )


def sql_lsh_incremental(engine: str) -> str:
    """Oracle = the batch LSH pair query restricted to >= 1 new side
    (equivalence argued in dedup.lsh_incremental_pairs' docstring; the
    batch SQL ends on the a.doc_id < b.doc_id conjunct, so the filter
    appends)."""
    return sql_lsh_pairs(engine) + (
        " AND (a.doc_id % 5 = 0 OR b.doc_id % 5 = 0)"
    )


def spark_lsh_bucket_stats(spark, sf_dir: str) -> DataFrame:
    """Skew accounting for the LSH bucket cap (what web-scale dedup
    DROPS): one row per oversized (band, band_key) bucket. A small cap
    (2) makes the result non-trivial at test scale — production uses
    the 500-doc boilerplate cap."""
    from .dedup import lsh_bucket_stats

    return lsh_bucket_stats(
        _docs(spark, sf_dir), n_hashes=N_MINHASH, band_rows=4,
        max_bucket_size=2,
    )


def sql_lsh_bucket_stats(engine: str) -> str:
    band, band_key = _band_exprs(engine)
    return (
        f"WITH {_toks_cte(engine)}, {_shingle_cte(engine, 3)}, "
        f"{_minhash_cte(engine)}, "
        f"bands AS (SELECT doc_id, {band} AS band, {band_key} AS band_key "
        f"FROM sigs GROUP BY doc_id, {band}) "
        "SELECT band, band_key, CAST(count(*) AS BIGINT) AS n_docs "
        "FROM bands GROUP BY band, band_key HAVING count(*) > 2"
    )


def sql_ngram_jaccard(engine: str) -> str:
    return (
        f"WITH {_toks_cte(engine)}, {_shingle_cte(engine, 3)}, "
        "counts AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n "
        "FROM sh GROUP BY doc_id), "
        "shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "CAST(count(*) AS BIGINT) AS shared "
        "FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id "
        "GROUP BY a.doc_id, b.doc_id) "
        "SELECT doc_a, doc_b, "
        "round(CAST(shared AS DOUBLE) / (ca.n + cb.n - shared), 4) AS jaccard "
        "FROM shared JOIN counts ca ON shared.doc_a = ca.doc_id "
        "JOIN counts cb ON shared.doc_b = cb.doc_id "
        "WHERE CAST(shared AS DOUBLE) / (ca.n + cb.n - shared) >= "
        f"{JACCARD_THRESHOLD}"
    )


def sql_simhash(engine: str) -> str:
    if engine == "spark":
        bit = (
            "shiftright(instr('0123456789abcdef', "
            "substr(h, 1 + (b div 4), 1)) - 1, CAST(b % 4 AS INT)) & 1"
        )
        shl = "shiftleft(1, bit)"
        bits_src = "bits_idx AS (SELECT explode(sequence(0, 15)) AS b)"
    else:
        bit = (
            "((strpos('0123456789abcdef', "
            "substr(h, 1 + (b // 4), 1)) - 1) >> (b % 4)) & 1"
        )
        shl = "(1 << bit)"
        bits_src = "bits_idx AS (SELECT CAST(i AS INT) AS b FROM range(0, 16) r(i))"
    return (
        f"WITH {_toks_cte(engine)}, {_tok_cte(engine)}, "
        "tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf "
        "FROM tok GROUP BY doc_id, term), "
        "h AS (SELECT doc_id, tf, md5(term) AS h FROM tf), "
        f"{bits_src}, "
        f"sums AS (SELECT doc_id, b AS bit, CAST(sum(tf * (CASE WHEN ({bit}) = 1 "
        "THEN 1 ELSE -1 END)) AS BIGINT) AS s "
        "FROM h CROSS JOIN bits_idx GROUP BY doc_id, b) "
        f"SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN {shl} ELSE 0 END) "
        "AS BIGINT) AS simhash FROM sums GROUP BY doc_id"
    )


def sql_langid(engine: str) -> str:
    if engine == "spark":
        stripped = "regexp_replace(text, '[^a-z ]', '')"
    else:
        stripped = "regexp_replace(text, '[^a-z ]', '', 'g')"
    ratio = (
        f"CAST(length({stripped}) AS DOUBLE) / nullif(length(text), 0)"
    )
    return (
        "SELECT doc_id, "
        f"round({ratio}, 4) AS ascii_ratio, "
        f"CASE WHEN {ratio} > 0.9 "
        "THEN 'en' ELSE 'other' END AS lang_pred FROM documents"
    )


def sql_quality(engine: str) -> str:
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    return (
        f"WITH {_toks_cte(engine)}, {_tok_cte(engine)} "
        "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens, "
        "round(avg(length(term)), 4) AS avg_token_len, "
        f"round(avg(CAST(CASE WHEN term IN ({stop}) THEN 1 ELSE 0 END "
        "AS DOUBLE)), 4) AS stopword_ratio FROM tok GROUP BY doc_id"
    )


def sql_token_count(engine: str) -> str:
    ln = _len_fn(engine)
    return (
        f"WITH {_toks_cte(engine)} "
        f"SELECT doc_id, CAST({ln}(ts) AS BIGINT) AS n_tokens FROM toks"
    )


def sql_fingerprint(engine: str) -> str:
    return (
        f"WITH {_toks_cte(engine)}, {_shingle_cte(engine, 4, name='sh4')}, "
        "fp AS (SELECT doc_id, min(md5(shingle)) AS fp "
        "FROM sh4 GROUP BY doc_id) "
        "SELECT d.doc_id, coalesce(fp.fp, md5(d.text)) AS fingerprint "
        "FROM documents d LEFT JOIN fp ON d.doc_id = fp.doc_id"
    )


def sql_ann_cosine(engine: str) -> str:
    ids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    if engine == "spark":
        dot = (
            "aggregate(zip_with(q.qe, e.embedding, "
            "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        nq = (
            "sqrt(aggregate(q.qe, CAST(0.0 AS DOUBLE), "
            "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
        )
        ne = (
            "sqrt(aggregate(e.embedding, CAST(0.0 AS DOUBLE), "
            "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
        )
    else:
        dot = (
            "list_sum(list_transform(range(1, len(q.qe) + 1), "
            "i -> CAST(q.qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))"
        )
        nq = (
            "sqrt(list_sum(list_transform(q.qe, "
            "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
        )
        ne = (
            "sqrt(list_sum(list_transform(e.embedding, "
            "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
        )
    return (
        "WITH q AS (SELECT vec_id AS query_id, embedding AS qe "
        f"FROM embeddings WHERE vec_id IN ({ids})), "
        f"p AS (SELECT q.query_id, e.vec_id AS neighbor_id, "
        f"round({dot} / ({nq} * {ne}), 4) AS cos "
        "FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id), "
        "r AS (SELECT query_id, neighbor_id, cos, CAST(row_number() OVER "
        "(PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) "
        "AS rank FROM p) "
        f"SELECT query_id, neighbor_id, cos, rank FROM r WHERE rank <= {ANN_K}"
    )


def sql_events_hourly(engine: str) -> str:
    if engine == "spark":
        return (
            "SELECT window.start AS window_start, event_type, "
            "CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS total_value "
            "FROM events GROUP BY window(ts, '1 hour'), event_type"
        )
    return (
        "SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, "
        "event_type, CAST(count(*) AS BIGINT) AS n, "
        "round(sum(value), 4) AS total_value "
        "FROM events GROUP BY 1, 2"
    )


EMB_NEARDUP_THRESHOLD = 0.4
# Pinned LSH geometry for the driver query: fixed (tables, planes, dims)
# makes the SRP-LSH path fully deterministic, so DuckDB can regenerate
# the identical md5-derived hyperplanes and hash-match the result
# (the library default derives n_planes from COUNT, which an oracle
# built at SQL-construction time cannot see).
EMB_LSH_TABLES, EMB_LSH_PLANES, EMB_DIMS, EMB_LSH_BUCKET_CAP = 8, 6, 64, 1000


def sql_embedding_neardup_lsh() -> str:
    """DuckDB oracle for the SRP-LSH near-dup path (hash-checked, not
    rows-only): regenerates the SAME md5-derived hyperplanes as
    :func:`dedup.random_planes` — `int(md5(f"{t}|{p}|{d}")[:8], 16)
    / 0xFFFFFFFF * 2 - 1`, engine-independent by construction — then
    replicates sign-bit bucketing per table, the bucket-size cap, the
    same-bucket pair join with DISTINCT, and the exact-cosine filter.
    Every arithmetic step is the same double-precision op sequence as
    the Spark plan, so values agree bit-for-bit at round(,4)."""
    t, p, dims, cap = EMB_LSH_TABLES, EMB_LSH_PLANES, EMB_DIMS, EMB_LSH_BUCKET_CAP
    pair_dot = (
        f"list_sum(list_transform(range(1, {dims} + 1), "
        "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))"
    )
    cos = f"{pair_dot} / (a.nm * b.nm)"
    return (
        "WITH planes AS ("
        f"  SELECT t, p, list_transform(range(0, {dims}), d -> "
        "    CAST(concat('0x', substr(md5(concat(t, '|', p, '|', d)), 1, 8)) "
        "      AS UBIGINT) / 4294967295.0 * 2.0 - 1.0) AS plane "
        f"  FROM range(0, {t}) r1(t), range(0, {p}) r2(p)), "
        "sigs AS ("
        "  SELECT e.vec_id AS id, pl.t AS tbl, "
        f"    CASE WHEN list_sum(list_transform(range(1, {dims} + 1), "
        "      i -> CAST(e.embedding[i] AS DOUBLE) * pl.plane[i])) > 0 "
        "    THEN (1 << pl.p) ELSE 0 END AS bit "
        "  FROM embeddings e CROSS JOIN planes pl), "
        "buckets AS ("
        "  SELECT id, tbl, CAST(sum(bit) AS BIGINT) AS bucket "
        "  FROM sigs GROUP BY id, tbl), "
        "ok AS ("
        "  SELECT tbl, bucket FROM buckets GROUP BY tbl, bucket "
        f"  HAVING count(*) <= {cap}), "
        "cand AS ("
        "  SELECT DISTINCT a.id AS id_a, b.id AS id_b "
        "  FROM buckets a "
        "  JOIN ok ON ok.tbl = a.tbl AND ok.bucket = a.bucket "
        "  JOIN buckets b ON a.tbl = b.tbl AND a.bucket = b.bucket "
        "    AND a.id < b.id), "
        "nrm AS ("
        "  SELECT vec_id, embedding, "
        "    sqrt(list_sum(list_transform(embedding, "
        "      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nm "
        "  FROM embeddings) "
        f"SELECT c.id_a, c.id_b, round({cos}, 4) AS cos "
        "FROM cand c "
        "JOIN nrm a ON a.vec_id = c.id_a "
        "JOIN nrm b ON b.vec_id = c.id_b "
        f"WHERE round({cos}, 4) >= {EMB_NEARDUP_THRESHOLD}"
    )


def sql_embedding_neardup(engine: str) -> str:
    """Exact all-pairs cosine >= threshold (oracle for the exact path;
    the LSH path is verified as a subset in tests + a rows-only entry)."""
    if engine == "spark":
        dot = (
            "aggregate(zip_with(a.embedding, b.embedding, "
            "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
            "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        nrm = (
            "sqrt(aggregate({t}.embedding, CAST(0.0 AS DOUBLE), "
            "(acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))"
        )
    else:
        dot = (
            "list_sum(list_transform(range(1, len(a.embedding) + 1), "
            "i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))"
        )
        nrm = (
            "sqrt(list_sum(list_transform({t}.embedding, "
            "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
        )
    cos = f"{dot} / ({nrm.format(t='a')} * {nrm.format(t='b')})"
    return (
        "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
        f"round({cos}, 4) AS cos "
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
        f"WHERE round({cos}, 4) >= {EMB_NEARDUP_THRESHOLD}"
    )


def sql_ann_ivf(engine: str) -> str:
    """IVF replication: codebook = vec_id < n_cells, assign to max-cos
    cell, probe top-nprobe cells per query, exact cosine inside."""
    n_cells, nprobe = 16, 4
    ids = ", ".join(str(i) for i in ANN_QUERY_IDS)
    if engine == "spark":
        dot = (
            "aggregate(zip_with({x}, {y}, "
            "(p, q) -> CAST(p AS DOUBLE) * CAST(q AS DOUBLE)), "
            "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        )
        nrm = (
            "sqrt(aggregate({x}, CAST(0.0 AS DOUBLE), "
            "(acc, p) -> acc + CAST(p AS DOUBLE) * CAST(p AS DOUBLE)))"
        )
    else:
        dot = (
            "list_sum(list_transform(range(1, len({x}) + 1), "
            "i -> CAST({x}[i] AS DOUBLE) * CAST({y}[i] AS DOUBLE)))"
        )
        nrm = (
            "sqrt(list_sum(list_transform({x}, "
            "p -> CAST(p AS DOUBLE) * CAST(p AS DOUBLE))))"
        )

    def cos(x, y):
        return (
            f"{dot.format(x=x, y=y)} / ({nrm.format(x=x)} * {nrm.format(x=y)})"
        )

    return (
        f"WITH cb AS (SELECT CAST(vec_id AS INT) AS cell, embedding AS cv "
        f"FROM embeddings WHERE vec_id < {n_cells}), "
        "ac AS (SELECT vec_id, embedding, cell, row_number() OVER "
        "(PARTITION BY vec_id ORDER BY "
        f"{cos('embedding', 'cv')} DESC, cell) AS rn "
        "FROM embeddings CROSS JOIN cb), "
        "assigned AS (SELECT vec_id, embedding, cell FROM ac WHERE rn = 1), "
        f"q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings "
        f"WHERE vec_id IN ({ids})), "
        "pr AS (SELECT query_id, qe, cell, row_number() OVER "
        "(PARTITION BY query_id ORDER BY "
        f"{cos('qe', 'cv')} DESC, cell) AS rn FROM q CROSS JOIN cb), "
        f"probes AS (SELECT query_id, qe, cell FROM pr WHERE rn <= {nprobe}), "
        "pairs AS (SELECT p.query_id, a.vec_id AS neighbor_id, "
        f"round({cos('p.qe', 'a.embedding')}, 4) AS cos "
        "FROM probes p JOIN assigned a ON p.cell = a.cell "
        "WHERE a.vec_id <> p.query_id), "
        "r AS (SELECT query_id, neighbor_id, cos, CAST(row_number() OVER "
        "(PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS INT) "
        "AS rank FROM pairs) "
        f"SELECT query_id, neighbor_id, cos, rank FROM r WHERE rank <= {ANN_K}"
    )


def sql_token_count_bpe(engine: str) -> str:
    from .textstats import BPE_ISH_PATTERN

    if engine == "spark":
        raise ValueError("spark side uses textstats.token_counts directly")
    # DuckDB standard-SQL strings pass backslashes through untouched
    pat = BPE_ISH_PATTERN.replace("'", "''")
    return (
        "SELECT doc_id, "
        "CAST(CASE WHEN trim(text) = '' THEN 0 ELSE "
        "len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) "
        "AS ws_tokens, "
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) "
        "AS bpe_ish_tokens FROM documents"
    )


def sql_rolling_min_hash(engine: str) -> str:
    from .textstats import ROLL_BASE, ROLL_K, ROLL_MOD

    if engine == "spark":
        raise ValueError("spark side uses textstats.rolling_min_hash directly")
    return (
        "WITH c AS (SELECT doc_id, "
        "regexp_replace(coalesce(text, ''), '[^ -~]', '', 'g') AS s "
        "FROM documents), "
        "h AS (SELECT doc_id, CASE WHEN len(s) >= "
        f"{ROLL_K} THEN list_transform(range(1, len(s) - {ROLL_K - 2}), "
        f"i -> list_reduce(list_transform(range(0, {ROLL_K}), "
        "j -> CAST(unicode(substr(s, CAST(i + j AS INT), 1)) AS BIGINT)), "
        f"(a, b) -> (a * {ROLL_BASE} + b) % {ROLL_MOD})) "
        "ELSE [] END AS hashes FROM c) "
        "SELECT doc_id, CAST(len(hashes) AS BIGINT) AS n_grams, "
        "CAST(coalesce(list_min(hashes), -1) AS BIGINT) AS min_hash FROM h"
    )


def sql_winnow_duckdb() -> str:
    """Winnowing fingerprint oracle (DuckDB): rolling k-gram hashes (same
    CTE as the rolling_min_hash oracle), then per-window rightmost-argmin
    selection with consecutive-duplicate suppression via lag() — the
    exact Schleimer/Wilkerson/Aiken semantics of textstats.winnow."""
    from .textstats import ROLL_BASE, ROLL_K, ROLL_MOD, WINNOW_W

    w = WINNOW_W
    return (
        "WITH c AS (SELECT doc_id, "
        "regexp_replace(coalesce(text, ''), '[^ -~]', '', 'g') AS s "
        "FROM documents), "
        "h AS (SELECT doc_id, CASE WHEN len(s) >= "
        f"{ROLL_K} THEN list_transform(range(1, len(s) - {ROLL_K - 2}), "
        f"i -> list_reduce(list_transform(range(0, {ROLL_K}), "
        "j -> CAST(unicode(substr(s, CAST(i + j AS INT), 1)) AS BIGINT)), "
        f"(a, b) -> (a * {ROLL_BASE} + b) % {ROLL_MOD})) "
        "ELSE [] END AS hashes FROM c), "
        "win AS (SELECT doc_id, hashes, len(hashes) AS m FROM h), "
        "sel AS (SELECT doc_id, i, "
        f"list_max(list_transform(range(0, {w}), j -> CASE WHEN "
        f"hashes[CAST(i + j AS INT)] = list_min(hashes[i:i+{w - 1}]) "
        "THEN i + j ELSE NULL END)) AS sidx "
        f"FROM win, unnest(range(1, m - {w - 2})) AS t(i) WHERE m > {w}), "
        "dedup AS (SELECT doc_id, i, sidx, lag(sidx) OVER "
        "(PARTITION BY doc_id ORDER BY i) AS prev FROM sel), "
        "fps AS (SELECT d.doc_id, w.hashes[CAST(d.sidx AS INT)] AS fp "
        "FROM dedup d JOIN win w USING (doc_id) "
        "WHERE prev IS NULL OR sidx <> prev), "
        "agg AS (SELECT doc_id, count(*) AS n_fingerprints, "
        "min(fp) AS fingerprint_min, bit_xor(fp) AS fingerprint_xor "
        "FROM fps GROUP BY doc_id), "
        "small AS (SELECT doc_id, 1 AS n_fingerprints, "
        "list_min(hashes) AS fingerprint_min, "
        f"list_min(hashes) AS fingerprint_xor FROM win WHERE m BETWEEN 1 AND {w}) "
        "SELECT d.doc_id, "
        "CAST(coalesce(a.n_fingerprints, s.n_fingerprints, 0) AS BIGINT) "
        "AS n_fingerprints, "
        "CAST(coalesce(a.fingerprint_min, s.fingerprint_min, -1) AS BIGINT) "
        "AS fingerprint_min, "
        "CAST(coalesce(a.fingerprint_xor, s.fingerprint_xor, 0) AS BIGINT) "
        "AS fingerprint_xor "
        "FROM documents d LEFT JOIN agg a USING (doc_id) "
        "LEFT JOIN small s USING (doc_id)"
    )


# ---------------------------------------------------- non-SQL Spark paths


def spark_chunk_metadata(spark, sf_dir: str) -> DataFrame:
    """Exercises the REAL engine chunker (build.chunk_postings,
    applyInPandas) — metadata must match the SQL window-function oracle."""
    _prepare(spark, sf_dir)
    toks = spark.sql(
        f"WITH {_toks_cte('spark')} "
        "SELECT doc_id, ts, CAST(size(ts) AS BIGINT) AS doc_length FROM toks"
    )
    postings = (
        toks.select("doc_id", "doc_length", F.explode("ts").alias("term"))
        .groupBy("term", "doc_id", "doc_length")
        .agg(F.count("*").cast("long").alias("tf"))
    )
    max_doc_id = toks.agg(F.max("doc_id")).collect()[0][0]
    chunks = chunk_postings(postings, int(max_doc_id), n_salts=1)
    return chunks.select(
        "term", "chunk_seq", "first_doc_id", "last_doc_id", "n"
    )


def _docs(spark, sf_dir: str) -> DataFrame:
    _prepare(spark, sf_dir)
    return spark.table("documents").select("doc_id", "text")


def _emb(spark, sf_dir: str) -> DataFrame:
    _prepare(spark, sf_dir)
    return spark.table("embeddings")


def _ann_queries(spark, sf_dir: str) -> DataFrame:
    e = _emb(spark, sf_dir)
    return e.where(F.col("vec_id").isin(list(ANN_QUERY_IDS))).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )


def spark_dedup_exact(spark, sf_dir: str) -> DataFrame:
    from .dedup import exact_duplicates

    return exact_duplicates(_docs(spark, sf_dir))


def spark_minhash(spark, sf_dir: str) -> DataFrame:
    from .dedup import minhash_signatures as mh

    return mh(_docs(spark, sf_dir), n_hashes=N_MINHASH)


def spark_lsh_pairs(spark, sf_dir: str) -> DataFrame:
    from .dedup import lsh_candidate_pairs as lsh

    # cap OFF: the SQL oracle is uncapped, so the pairing must be too
    # (the cap path is separately exercised by lsh_bucket_stats, whose
    # oracle encodes its cap)
    return lsh(
        _docs(spark, sf_dir), n_hashes=N_MINHASH, band_rows=4,
        max_bucket_size=None,
    )


def spark_ngram_jaccard(spark, sf_dir: str) -> DataFrame:
    from .dedup import ngram_jaccard_pairs

    # max_df OFF: the SQL oracle computes exact unfiltered Jaccard, so
    # the library's boilerplate-shingle cap must be off too (same
    # pinning as lsh_candidate_pairs' max_bucket_size=None; the cap
    # path has its own pytest coverage)
    return ngram_jaccard_pairs(
        _docs(spark, sf_dir), threshold=JACCARD_THRESHOLD, max_df=None
    )


def spark_simhash(spark, sf_dir: str) -> DataFrame:
    from .dedup import simhash as sh

    return sh(_docs(spark, sf_dir), bits=16)


def spark_decontaminate(spark, sf_dir: str) -> DataFrame:
    """Benchmark decontamination over a self-derived split: every 25th
    doc plays the benchmark/eval item, the rest the training corpus
    (deterministic, no external data). 3-gram shingles with a 2-shared
    floor keep the sf0.01 result non-trivial (77 flagged pairs)."""
    from .dedup import decontaminate

    docs = _docs(spark, sf_dir)
    bench = docs.where(F.col("doc_id") % 25 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    corpus = docs.where(F.col("doc_id") % 25 != 0)
    return decontaminate(corpus, bench, shingle_n=3, min_overlap=2)


SPAN_N = 5
SPAN_MIN_DUP = 2


def spark_span_dedup(spark, sf_dir: str) -> DataFrame:
    """Exact duplicated-span removal (Lee-et-al-style substring dedup
    at token granularity): 5-grams occurring in >= 2 distinct docs are
    masked and the surviving text reconstructed — 71 of sf0.01's 500
    docs lose at least one span, so the result is non-trivial."""
    from .dedup import span_dedup

    return span_dedup(_docs(spark, sf_dir), n=SPAN_N, min_dup=SPAN_MIN_DUP)


def sql_span_dedup(engine: str) -> str:
    n, min_dup = SPAN_N, SPAN_MIN_DUP
    grams = " || ' ' || ".join(f"ts[i+{j}]" for j in range(n))
    return (
        f"WITH {_toks_cte(engine)}, "
        f"g AS (SELECT doc_id, i - 1 AS pos, {grams} AS gram "
        f"FROM toks, unnest(range(1, len(ts)-{n - 2})) AS r(i) "
        f"WHERE len(ts) >= {n}), "
        "dup AS (SELECT gram FROM (SELECT DISTINCT gram, doc_id FROM g) "
        f"GROUP BY gram HAVING count(*) >= {min_dup}), "
        "cov AS (SELECT DISTINCT g.doc_id, g.pos + k.k AS tpos "
        f"FROM g JOIN dup USING (gram), unnest(range(0, {n})) AS k(k)), "
        "tokpos AS (SELECT doc_id, ts[i] AS tok, i - 1 AS tpos FROM toks, "
        "unnest(range(1, len(ts) + 1)) AS r(i)), "
        "kept AS (SELECT t.doc_id, string_agg(t.tok, ' ' ORDER BY t.tpos) "
        "AS ct FROM tokpos t ANTI JOIN cov c "
        "ON t.doc_id = c.doc_id AND t.tpos = c.tpos GROUP BY t.doc_id), "
        "nrem AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS nr "
        "FROM cov GROUP BY doc_id) "
        "SELECT toks.doc_id, coalesce(kept.ct, '') AS clean_text, "
        "CAST(len(ts) AS BIGINT) AS n_tokens, "
        "CAST(coalesce(nrem.nr, 0) AS BIGINT) AS n_removed "
        "FROM toks LEFT JOIN kept USING (doc_id) "
        "LEFT JOIN nrem USING (doc_id)"
    )


def spark_line_dedup(spark, sf_dir: str) -> DataFrame:
    """CCNet line-level dedup (dedup.line_dedup) over deterministically
    synthesized MULTI-LINE docs (the corpus text is single-line): each
    doc gains a shared boilerplate line (duplicated everywhere ->
    dropped from every doc) and a doc-unique line whose id is spelled
    in LETTERS (digits are stripped by the CCNet normalization, so a
    numeric suffix would collide corpus-wide — itself the intended
    page-number behavior; letters keep the line unique -> always
    kept); the original text line dedups wherever docs share text.
    The DuckDB twin rebuilds the identical line table, normalization,
    census and ordered reconstruction."""
    from .dedup import line_dedup

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.lit("All Rights Reserved 2024"),
            F.concat(
                F.lit("unique line "),
                F.translate(
                    F.col("doc_id").cast("string"),
                    "0123456789",
                    "abcdefghij",
                ),
            ),
        ).alias("text"),
    )
    return line_dedup(d)


def sql_line_dedup() -> str:
    nrm = (
        "trim(regexp_replace(regexp_replace(lower({0}), '[^a-z]+', ' ', "
        "'g'), ' +', ' ', 'g'))"
    )
    return (
        "WITH d AS (SELECT doc_id, coalesce(text, '') || chr(10) || "
        "'All Rights Reserved 2024' || chr(10) || 'unique line ' || "
        "translate(CAST(doc_id AS VARCHAR), '0123456789', "
        "'abcdefghij') AS text FROM documents), "
        "ls AS (SELECT doc_id, string_split(text, chr(10)) AS la FROM d), "
        "l AS (SELECT doc_id, i - 1 AS pos, la[i] AS line FROM ls, "
        "unnest(range(1, len(la) + 1)) AS r(i)), "
        f"k AS (SELECT doc_id, pos, line, md5({nrm.format('line')}) AS hk, "
        f"{nrm.format('line')} = '' AS blank FROM l), "
        "dup AS (SELECT hk FROM (SELECT DISTINCT hk, doc_id FROM k "
        "WHERE NOT blank) GROUP BY hk HAVING count(*) >= 2), "
        "m AS (SELECT k.doc_id, k.pos, k.line, "
        "(dup.hk IS NOT NULL AND NOT k.blank) AS rm "
        "FROM k LEFT JOIN dup ON k.hk = dup.hk) "
        "SELECT doc_id, coalesce(string_agg(CASE WHEN NOT rm THEN line "
        "END, chr(10) ORDER BY pos), '') AS clean_text, "
        "CAST(count(*) AS BIGINT) AS n_lines, "
        "CAST(sum(CASE WHEN rm THEN 1 ELSE 0 END) AS BIGINT) AS "
        "n_removed FROM m GROUP BY doc_id"
    )


def sql_decontaminate(engine: str) -> str:
    return (
        f"WITH {_toks_cte(engine)}, {_shingle_cte(engine, 3)}, "
        "bench AS (SELECT doc_id AS bench_id, shingle FROM sh "
        "WHERE doc_id % 25 = 0), "
        "corp AS (SELECT doc_id, shingle FROM sh WHERE doc_id % 25 <> 0) "
        "SELECT c.doc_id, b.bench_id, CAST(count(*) AS BIGINT) AS n_shared "
        "FROM corp c JOIN bench b ON c.shingle = b.shingle "
        "GROUP BY c.doc_id, b.bench_id HAVING count(*) >= 2"
    )


def spark_dedup_clusters(spark, sf_dir: str) -> DataFrame:
    """Near-dup GROUPS end-to-end: LSH candidate pairs -> alternating
    large-star/small-star connected components -> (doc_id, cluster_id,
    is_survivor) over every doc (singletons included)."""
    from .dedup import dedup_clusters, lsh_candidate_pairs

    docs = _docs(spark, sf_dir)
    # cap OFF to match the uncapped SQL oracle (same pinning as
    # spark_lsh_pairs)
    pairs = lsh_candidate_pairs(
        docs, n_hashes=N_MINHASH, band_rows=4, max_bucket_size=None
    )
    # driver_cap=0 forces the DISTRIBUTED star rounds so the hash gate
    # certifies the at-scale algorithm, not the driver fast path (the
    # property tests cover both paths' equality)
    return dedup_clusters(docs, pairs, driver_cap=0)


def sql_dedup_clusters(engine: str) -> str:
    """DuckDB twin: the same LSH pair CTEs, then component min via a
    recursive transitive closure (fine at oracle scale; the Spark side
    is the O(log^2 n)-round star algorithm)."""
    band, band_key = _band_exprs(engine)
    return (
        f"WITH RECURSIVE {_toks_cte(engine)}, {_shingle_cte(engine, 3)}, "
        f"{_minhash_cte(engine)}, "
        f"bands AS (SELECT doc_id, {band} AS band, {band_key} AS band_key "
        f"FROM sigs GROUP BY doc_id, {band}), "
        "pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
        "FROM bands a JOIN bands b "
        "ON a.band = b.band AND a.band_key = b.band_key "
        "AND a.doc_id < b.doc_id), "
        "edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs "
        "UNION SELECT doc_b, doc_a FROM pairs), "
        "reach(u, v) AS (SELECT u, v FROM edges "
        "UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u), "
        "cmap AS (SELECT u AS doc_id, least(min(v), u) AS cluster_id "
        "FROM reach GROUP BY u) "
        "SELECT d.doc_id, "
        "coalesce(c.cluster_id, d.doc_id) AS cluster_id, "
        "(d.doc_id = coalesce(c.cluster_id, d.doc_id)) AS is_survivor "
        "FROM documents d LEFT JOIN cmap c ON d.doc_id = c.doc_id"
    )


def spark_langid(spark, sf_dir: str) -> DataFrame:
    from .textstats import language_id

    return language_id(_docs(spark, sf_dir))


def spark_quality(spark, sf_dir: str) -> DataFrame:
    from .textstats import quality_score

    return quality_score(_docs(spark, sf_dir), stopwords=STOPWORDS)


def spark_lm_score(spark, sf_dir: str) -> DataFrame:
    from .textstats import lm_score

    return lm_score(_docs(spark, sf_dir))


def sql_lm_score(engine: str) -> str:
    return (
        f"WITH {_toks_cte(engine)}, {_tok_cte(engine)}, "
        "tf AS (SELECT doc_id, term, count(*) AS tf "
        "FROM tok GROUP BY doc_id, term), "
        "ctf AS (SELECT term, sum(tf) AS ctf FROM tf GROUP BY term), "
        "tot AS (SELECT sum(ctf) AS total FROM ctf) "
        "SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens, "
        "round(sum(tf * -ln(CAST(ctf AS DOUBLE) / total)) / sum(tf), 4) "
        "AS lm_score "
        "FROM tf JOIN ctf USING (term), tot GROUP BY doc_id"
    )


def spark_token_count_bpe(spark, sf_dir: str) -> DataFrame:
    from .textstats import token_counts

    return token_counts(_docs(spark, sf_dir))


def spark_rolling_min_hash(spark, sf_dir: str) -> DataFrame:
    from .textstats import rolling_min_hash

    return rolling_min_hash(_docs(spark, sf_dir))


def spark_winnow(spark, sf_dir: str) -> DataFrame:
    from .textstats import winnow_fingerprints

    return winnow_fingerprints(_docs(spark, sf_dir))


def spark_repetition_ratio(spark, sf_dir: str) -> DataFrame:
    from .textstats import repetition_ratio

    return repetition_ratio(_docs(spark, sf_dir))


def sql_repetition_ratio(engine: str) -> str:
    """DuckDB twin of textstats.repetition_ratio (n=3): word trigrams
    per doc, dup_ratio = 1 - distinct/total, 0.0 for short docs."""
    grams = " || ' ' || ".join(f"ts[i+{j}]" for j in range(3))
    return (
        f"WITH {_toks_cte(engine)}, "
        "grams AS (SELECT doc_id, CASE WHEN len(ts) >= 3 THEN "
        f"list_transform(range(1, len(ts) - 1), i -> {grams}) "
        "ELSE [] END AS gs FROM toks) "
        "SELECT doc_id, CAST(len(gs) AS BIGINT) AS n_grams, "
        "CAST(len(list_distinct(gs)) AS BIGINT) AS n_distinct, "
        "CASE WHEN len(gs) > 0 THEN round(1.0 - "
        "CAST(len(list_distinct(gs)) AS DOUBLE) / len(gs), 4) "
        "ELSE 0.0 END AS dup_ratio FROM grams"
    )


def spark_source_stats(spark, sf_dir: str) -> DataFrame:
    from .textstats import source_stats

    _prepare(spark, sf_dir)
    return source_stats(spark.table("documents"))


def sql_source_stats(engine: str) -> str:
    """DuckDB twin of textstats.source_stats: per-source curation
    accounting. All aggregates are over exact integers (sum/count of
    BIGINT) so the rounded doubles are bit-identical cross-engine."""
    return (
        "WITH ws AS (SELECT source, lang, n_chars, "
        "CASE WHEN length(trim(text)) = 0 THEN 0 ELSE "
        "len(regexp_split_to_array(trim(text), '\\s+')) END AS ws_tok "
        "FROM documents) "
        "SELECT source, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(n_chars) AS BIGINT) AS total_chars, "
        "round(avg(n_chars), 4) AS avg_chars, "
        "CAST(count(DISTINCT lang) AS BIGINT) AS n_langs, "
        "round(avg(CAST(ws_tok AS DOUBLE)), 4) AS avg_ws_tokens "
        "FROM ws GROUP BY source"
    )


def spark_stratified_sample(spark, sf_dir: str) -> DataFrame:
    from .textstats import stratified_sample

    _prepare(spark, sf_dir)
    return stratified_sample(spark.table("documents"), strat_col="lang")


def sql_stratified_sample(engine: str) -> str:
    """DuckDB twin of textstats.stratified_sample: the md5 hex-nibble
    bucket regenerates exactly (strpos == Spark instr, both 1-based),
    and floor(min/cnt * 65536) is the same IEEE-double expression."""
    nib = (
        "(strpos('0123456789abcdef', substr(md5('sample|' || "
        "CAST(doc_id AS VARCHAR)), {i}, 1)) - 1)"
    )
    bucket = " + ".join(
        nib.format(i=i + 1) + f" * {16 ** (3 - i)}" for i in range(4)
    )
    return (
        "WITH cnt AS (SELECT lang, CAST(count(*) AS DOUBLE) AS c "
        "FROM documents GROUP BY lang), "
        "mn AS (SELECT min(c) AS m FROM cnt), "
        "thr AS (SELECT lang, CAST(floor(m / c * 65536) AS BIGINT) "
        "AS t FROM cnt CROSS JOIN mn), "
        f"b AS (SELECT doc_id, lang, {bucket} AS bucket FROM documents) "
        "SELECT b.doc_id, b.lang FROM b JOIN thr ON b.lang = thr.lang "
        "WHERE b.bucket < thr.t"
    )


# mixture weights/budget sized so at the driver gate (sf0.01) the
# fractions straddle BOTH branches: en/fr sample fractionally, de's
# target exceeds its availability and keeps everything (cap at 1.0);
# es/zh are absent from the weights and drop entirely
MIX_WEIGHTS = {"en": 0.5, "fr": 0.1, "de": 0.4}
MIX_BUDGET = 12_000


def spark_mixture_sample(spark, sf_dir: str) -> DataFrame:
    from .textstats import mixture_sample

    _prepare(spark, sf_dir)
    return mixture_sample(
        spark.table("documents"), MIX_WEIGHTS, MIX_BUDGET, strat_col="lang"
    )


def sql_mixture_sample(engine: str) -> str:
    """DuckDB twin of textstats.mixture_sample: same md5 hex-nibble
    bucket, same floor(least(1, target/avail) * 65536) IEEE-double
    threshold, same whitespace token mass."""
    nib = (
        "(strpos('0123456789abcdef', substr(md5('mix|' || "
        "CAST(doc_id AS VARCHAR)), {i}, 1)) - 1)"
    )
    bucket = " + ".join(
        nib.format(i=i + 1) + f" * {16 ** (3 - i)}" for i in range(4)
    )
    wsum = sum(MIX_WEIGHTS.values())
    tgt_rows = ", ".join(
        f"('{g}', {MIX_BUDGET * w / wsum!r})"
        for g, w in sorted(MIX_WEIGHTS.items())
    )
    return (
        "WITH toks AS (SELECT doc_id, lang, CAST(CASE WHEN text IS NULL "
        "OR trim(text) = '' THEN 0 ELSE len(regexp_split_to_array("
        "trim(text), '\\s+')) END AS BIGINT) AS tokens FROM documents), "
        "avail AS (SELECT lang, CAST(sum(tokens) AS DOUBLE) AS a "
        "FROM toks GROUP BY lang), "
        f"tgt(lang, t) AS (VALUES {tgt_rows}), "
        "thr AS (SELECT avail.lang, CAST(floor(least(1.0, t / a) * 65536) "
        "AS BIGINT) AS thr FROM avail JOIN tgt ON avail.lang = tgt.lang), "
        f"b AS (SELECT doc_id, lang, tokens, {bucket} AS bucket FROM toks) "
        "SELECT b.doc_id, b.lang, b.tokens FROM b "
        "JOIN thr ON b.lang = thr.lang WHERE b.bucket < thr.thr"
    )


PACK_SEQ_LEN = 128
PACK_SHARDS = 4


def spark_pack_sequences(spark, sf_dir: str) -> DataFrame:
    from .textstats import pack_sequences

    return pack_sequences(
        _docs(spark, sf_dir), seq_len=PACK_SEQ_LEN, n_shards=PACK_SHARDS
    )


def sql_pack_sequences(engine: str) -> str:
    """Relational twin of textstats.pack_sequences: per-shard
    cumulative token offsets (window), then one row per (doc,
    sequence) overlap of the chopped stream."""
    L, S = PACK_SEQ_LEN, PACK_SHARDS
    if engine == "spark":
        shard = (
            "CAST(CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 15), "
            f"16, 10) AS BIGINT) % {S} AS INT)"
        )
        nt, seqs = "size(ts)", "explode(sequence(lo, hi)) AS seq_id"
    else:
        shard = (
            "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))"
            f"::BIGINT % {S} AS INT)"
        )
        nt, seqs = "len(ts)", "unnest(range(lo, hi + 1)) AS seq_id"
    return (
        f"WITH {_toks_cte(engine)}, "
        f"sz AS (SELECT doc_id, {shard} AS shard, "
        f"CAST({nt} + 1 AS BIGINT) AS sz FROM toks), "
        "spans AS (SELECT shard, doc_id, "
        "CAST(sum(sz) OVER (PARTITION BY shard ORDER BY doc_id) - sz "
        "AS BIGINT) AS start, "
        "CAST(sum(sz) OVER (PARTITION BY shard ORDER BY doc_id) "
        "AS BIGINT) AS fin FROM sz), "
        "x AS (SELECT shard, doc_id, start, fin, "
        f"CAST(floor(start / {L}) AS BIGINT) AS lo, "
        f"CAST(floor((fin - 1) / {L}) AS BIGINT) AS hi FROM spans), "
        f"y AS (SELECT shard, doc_id, start, fin, {seqs} FROM x) "
        "SELECT shard, seq_id, doc_id, "
        f"CAST(GREATEST(start, seq_id * {L}) - seq_id * {L} AS INT) "
        "AS seq_start, "
        f"CAST(GREATEST(start, seq_id * {L}) - start AS BIGINT) "
        "AS doc_start, "
        f"CAST(LEAST(fin, (seq_id + 1) * {L}) - "
        f"GREATEST(start, seq_id * {L}) AS INT) AS n_tok FROM y"
    )


def spark_reorder_permutation(spark, sf_dir: str) -> DataFrame:
    """Permutation invariants of the Blandford–Blelloch-faithful
    bisection reorder (``reorder.reorder_bisect``): the new ids must be
    a dense zero-based permutation of the corpus. The locality
    objective itself (cluster adjacency, measured compression payoff)
    is pytest-gated in tests/test_reorder.py — iterative 2-means is not
    SQL-expressible, so the oracle checks the permutation contract.
    ``leaf_refine=True`` additionally routes every leaf through the
    reference's actual graph + Prim-growth recursion (_bb_leaf_order),
    so the driver gate exercises the full faithful pipeline."""
    from .reorder import reorder_bisect

    out = reorder_bisect(
        _docs(spark, sf_dir), depth=3, iters=2, leaf_refine=True
    )
    return out.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("doc_id").cast("long").alias("min_id"),
        F.max("doc_id").cast("long").alias("max_id"),
        F.countDistinct("doc_id").cast("long").alias("n_distinct"),
        F.countDistinct("orig_doc_id").cast("long").alias("n_orig"),
    )


def sql_reorder_permutation() -> str:
    return """
    SELECT count(*)::BIGINT AS n_docs,
           0::BIGINT AS min_id,
           (count(*) - 1)::BIGINT AS max_id,
           count(*)::BIGINT AS n_distinct,
           count(*)::BIGINT AS n_orig
    FROM documents
    """


def spark_reorder_prim_permutation(spark, sf_dir: str) -> DataFrame:
    """Same permutation contract as :func:`spark_reorder_permutation`
    but through ``outer="prim"`` — the reference's OWN split criterion
    at every outer level (sampled Prim partition + tie-to-side-two
    centroid assignment + oriented halves, distributed). Faithfulness
    itself is pytest-gated by the path-identity twin test
    (tests/test_reorder.py::test_prim_outer_matches_inprocess_recursion);
    the driver gate proves the full faithful pipeline runs end-to-end
    on the real corpus and preserves it bit-for-bit."""
    from .reorder import reorder_bisect

    out = reorder_bisect(
        _docs(spark, sf_dir), depth=3, outer="prim", leaf_refine=True
    )
    return out.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("doc_id").cast("long").alias("min_id"),
        F.max("doc_id").cast("long").alias("max_id"),
        F.countDistinct("doc_id").cast("long").alias("n_distinct"),
        F.countDistinct("orig_doc_id").cast("long").alias("n_orig"),
    )


def spark_ann_bruteforce(spark, sf_dir: str) -> DataFrame:
    from .ann import cosine_topk

    return cosine_topk(
        _emb(spark, sf_dir), _ann_queries(spark, sf_dir), k=ANN_K
    )


def spark_ann_ivf(spark, sf_dir: str) -> DataFrame:
    from .ann import ivf_topk

    return ivf_topk(
        _emb(spark, sf_dir),
        _ann_queries(spark, sf_dir),
        k=ANN_K,
        n_cells=16,
        nprobe=4,
    )


SEMANTIC_TAU = 0.4  # synthetic embeddings max out near cos 0.51


def spark_semantic_dedup(spark, sf_dir: str) -> DataFrame:
    """SemDeDup over the embeddings table: 16 deterministic cells,
    within-cell cos >= 0.4 collapses to the smallest id — 11 of
    sf0.01's 500 vectors are flagged."""
    from .ann import semantic_dedup

    return semantic_dedup(_emb(spark, sf_dir), n_cells=16, tau=SEMANTIC_TAU)


def sql_semantic_dedup(engine: str) -> str:
    n_cells, tau = 16, SEMANTIC_TAU
    dot = (
        "list_sum(list_transform(range(1, len({x}) + 1), "
        "i -> CAST({x}[i] AS DOUBLE) * CAST({y}[i] AS DOUBLE)))"
    )
    nrm = (
        "sqrt(list_sum(list_transform({x}, "
        "p -> CAST(p AS DOUBLE) * CAST(p AS DOUBLE))))"
    )

    def cos(x, y):
        return (
            f"{dot.format(x=x, y=y)} / ({nrm.format(x=x)} * {nrm.format(x=y)})"
        )

    return (
        f"WITH cb AS (SELECT CAST(vec_id AS INT) AS cell, embedding AS cv "
        f"FROM embeddings WHERE vec_id < {n_cells}), "
        "sc AS (SELECT e.vec_id, c.cell, "
        f"{cos('e.embedding', 'c.cv')} AS c0 FROM embeddings e, cb c), "
        "a AS (SELECT vec_id, cell FROM (SELECT vec_id, cell, row_number() "
        "OVER (PARTITION BY vec_id ORDER BY c0 DESC, cell ASC) AS rn "
        "FROM sc) WHERE rn = 1), "
        "dup AS (SELECT x.vec_id, min(y.vec_id) AS dup_of "
        "FROM a x JOIN a y ON x.cell = y.cell AND y.vec_id < x.vec_id "
        "JOIN embeddings ex ON ex.vec_id = x.vec_id "
        "JOIN embeddings ey ON ey.vec_id = y.vec_id "
        f"WHERE round({cos('ex.embedding', 'ey.embedding')}, 4) >= {tau} "
        "GROUP BY x.vec_id) "
        "SELECT a.vec_id, a.cell, dup.dup_of, "
        "dup.dup_of IS NOT NULL AS is_dup "
        "FROM a LEFT JOIN dup ON a.vec_id = dup.vec_id"
    )


def spark_embedding_neardup_exact(spark, sf_dir: str) -> DataFrame:
    from .dedup import embedding_neardup_pairs

    return embedding_neardup_pairs(
        _emb(spark, sf_dir), threshold=EMB_NEARDUP_THRESHOLD, exact=True
    )


def spark_embedding_neardup_lsh(spark, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from .dedup import embedding_neardup_pairs

    emb = _emb(spark, sf_dir)
    # EMB_DIMS is pinned so the oracle can regenerate the hyperplanes;
    # if the table width ever drifts, zip_with would silently truncate
    # the Spark dot product while the oracle NULLs out-of-range indexes
    # — fail loudly instead (one cheap first() probe).
    probe = emb.select(F.size("embedding").alias("d")).first()
    if probe is not None and probe["d"] != EMB_DIMS:
        raise ValueError(
            f"embeddings width {probe['d']} != pinned EMB_DIMS "
            f"{EMB_DIMS}; LSH oracle geometry would silently diverge"
        )
    return embedding_neardup_pairs(
        emb,
        threshold=EMB_NEARDUP_THRESHOLD,
        n_tables=EMB_LSH_TABLES,
        n_planes=EMB_LSH_PLANES,
        dims=EMB_DIMS,
        max_bucket_size=EMB_LSH_BUCKET_CAP,
    )


def spark_events_hourly(spark, sf_dir: str) -> DataFrame:
    from .streaming import windowed_event_counts

    _prepare(spark, sf_dir)
    return windowed_event_counts(spark.table("events"))


def spark_events_streaming(spark, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming path (readStream + watermark +
    AvailableNow drain) — same oracle as the batch window agg."""
    import tempfile
    import uuid

    from .streaming import (
        run_available_now,
        stream_events_from_dir,
        windowed_event_counts,
    )

    import os

    _prepare(spark, sf_dir)
    # file stream sources need a directory: symlink the events parquet
    src = tempfile.mkdtemp(prefix="se_stream_src_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/events.parquet"),
        os.path.join(src, "events.parquet"),
    )
    sdf = windowed_event_counts(stream_events_from_dir(spark, src))
    name = "se_contract_stream_" + uuid.uuid4().hex[:8]
    ck = tempfile.mkdtemp(prefix="se_stream_ck_")
    return run_available_now(sdf, ck, name)


def spark_streaming_dedup(spark, sf_dir: str) -> DataFrame:
    """REAL stateful-streaming path (applyInPandasWithState exact
    dedup, AvailableNow drain via foreachBatch — the memory sink cannot
    own a stateful checkpoint). A one-shot drain admits exactly the
    min-doc_id row per text hash, so the batch GROUP BY is the oracle;
    the cross-batch state behavior is pytest-gated
    (tests/test_streaming.py)."""
    import tempfile
    import os

    from .streaming import streaming_dedup

    _prepare(spark, sf_dir)
    src = tempfile.mkdtemp(prefix="se_sdedup_src_")
    os.symlink(
        os.path.abspath(f"{sf_dir}/documents.parquet"),
        os.path.join(src, "documents.parquet"),
    )
    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    sdf = streaming_dedup(
        spark.readStream.schema(schema).parquet(src).select(
            "doc_id", "text"
        )
    )
    rows: list = []

    def collect_batch(bdf, _bid):
        rows.extend(
            (int(r["doc_id"]), r["text_hash"]) for r in bdf.collect()
        )

    ck = tempfile.mkdtemp(prefix="se_sdedup_ck_")
    q = (
        sdf.writeStream.foreachBatch(collect_batch)
        .outputMode("append")
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.createDataFrame(
        sorted(rows), "doc_id long, text_hash string"
    )


def sql_streaming_dedup(engine: str) -> str:
    return (
        "WITH h AS (SELECT doc_id, md5(text) AS text_hash "
        "FROM documents) "
        "SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, text_hash "
        "FROM h GROUP BY text_hash"
    )


_E2E_CACHE: dict = {}
_E2E_POS_CACHE: dict = {}

PHRASE = ("part", "filter")


def spark_phrase_e2e_topk(spark, sf_dir: str) -> DataFrame:
    """Exact-adjacency phrase top-10 through the REAL positional index
    (store_positions=True build), HARD-ORACLED: QueryEngine.phrase_search
    in float64 hash-matches a DuckDB oracle that finds the token-adjacent
    docs and scores them with the relational BM25 formulation."""
    import tempfile

    import numpy as np

    from .build import IndexBuilder
    from .corpus import load_documents
    from .query import QueryEngine

    _prepare(spark, sf_dir)
    index_dir = _E2E_POS_CACHE.get(sf_dir)
    if index_dir is None:
        index_dir = tempfile.mkdtemp(prefix="se_e2e_pos_idx_")
        IndexBuilder(
            spark, index_dir, n_salts=4, bucket_count=8, store_positions=True
        ).build(load_documents(spark, sf_dir))
        _E2E_POS_CACHE[sf_dir] = index_dir
    qe = QueryEngine(spark, index_dir)
    res = qe.phrase_search(" ".join(PHRASE), k=10, dtype=np.float64)
    return res.select("doc_id", F.round("score", 4).alias("score"))


def sql_phrase_e2e_topk() -> str:
    """DuckDB twin: docs whose token array contains the phrase as an
    adjacent run, scored by the distinct-term BM25 sum, top-10 ordered
    on the unrounded sum (the engine's ordering)."""
    L = len(PHRASE)
    conds = " AND ".join(f"ts[i+{j}] = '{w}'" for j, w in enumerate(PHRASE))
    in_list = ", ".join(f"'{t}'" for t in sorted(set(PHRASE)))
    return (
        _bm25_base("duckdb") + f"WHERE tf.term IN ({in_list})), "
        f"matched AS (SELECT doc_id FROM toks WHERE len(ts) >= {L} AND "
        f"len(list_filter(range(1, len(ts) - {L} + 2), i -> {conds})) > 0) "
        "SELECT s.doc_id, round(sum(s.score), 4) AS score FROM scored s "
        "JOIN matched m ON s.doc_id = m.doc_id GROUP BY s.doc_id "
        "ORDER BY sum(s.score) DESC, s.doc_id LIMIT 10"
    )


OW_TERMS = ("table", "row", "scan")
OW_WINDOW = 10


def spark_ordered_window_e2e_topk(spark, sf_dir: str) -> DataFrame:
    """Ordered-window (#odN) top-10 through the SAME positional index
    as phrase_e2e_topk (cache shared), HARD-ORACLED: the terms must
    appear IN QUERY ORDER at strictly increasing positions with span
    < OW_WINDOW. The DuckDB twin decides the same predicate with the
    greedy next-min chase spelled as nested correlated min()
    subqueries (greedy is exact: fixing the anchor, taking each next
    term's minimal later position minimizes the final span)."""
    import numpy as np

    _prepare(spark, sf_dir)
    index_dir = _E2E_POS_CACHE.get(sf_dir)
    if index_dir is None:
        spark_phrase_e2e_topk(spark, sf_dir).collect()
        index_dir = _E2E_POS_CACHE[sf_dir]
    from .query import QueryEngine

    qe = QueryEngine(spark, index_dir)
    res = qe.ordered_window_search(
        " ".join(OW_TERMS), window=OW_WINDOW, k=10, dtype=np.float64
    )
    return res.select("doc_id", F.round("score", 4).alias("score"))


def sql_ordered_window_e2e_topk() -> str:
    """DuckDB twin: positions via zipped unnest (as the proximity
    oracle), matched = anchors of the FIRST term whose greedy ordered
    chain through the remaining terms ends within the window."""
    in_list = ", ".join(f"'{t}'" for t in sorted(set(OW_TERMS)))
    # innermost-out: min pos of term i strictly after the previous
    chain = "p0.pos"
    for i, t in enumerate(OW_TERMS[1:], start=1):
        chain = (
            f"(SELECT min(p{i}.pos) FROM posx p{i} "
            f"WHERE p{i}.doc_id = p0.doc_id AND p{i}.term = '{t}' "
            f"AND p{i}.pos > {chain})"
        )
    return (
        _bm25_base("duckdb") + f"WHERE tf.term IN ({in_list})), "
        "posx AS (SELECT doc_id, unnest(ts) AS term, "
        "unnest(range(1, len(ts) + 1)) AS pos FROM toks), "
        "matched AS (SELECT DISTINCT p0.doc_id FROM posx p0 "
        f"WHERE p0.term = '{OW_TERMS[0]}' AND "
        f"{chain} - p0.pos < {OW_WINDOW}) "
        "SELECT s.doc_id, round(sum(s.score), 4) AS score FROM scored s "
        "JOIN matched m ON s.doc_id = m.doc_id GROUP BY s.doc_id "
        "ORDER BY sum(s.score) DESC, s.doc_id LIMIT 10"
    )


# wildcard/prefix query: stem + cap chosen so the testdata vocabulary's
# six s-terms EXCEED the cap — the (df DESC, term) truncation is part
# of the contract, recomputed relationally by the oracle
PREFIX_STEM = "s"
PREFIX_PLAIN = "data"
PREFIX_CAP = 4


def spark_prefix_e2e_topk(spark, sf_dir: str) -> DataFrame:
    """Wildcard/prefix top-10 through the REAL chunked index (cache
    shared with index_e2e_topk), HARD-ORACLED: QueryEngine.prefix_search
    expands ``s*`` against the lexicon (top PREFIX_CAP by df DESC, term
    — a pushed StartsWith scan + TakeOrdered), unions the plain term,
    and scores the union as ONE disjunctive BM25 query in float64. The
    DuckDB twin recomputes the SAME capped expansion from relational
    dfs, so the truncation policy is hash-gated, not just the scoring."""
    import numpy as np

    from .query import QueryEngine

    _prepare(spark, sf_dir)
    index_dir = _e2e_index(spark, sf_dir)
    qe = QueryEngine(spark, index_dir)
    res = qe.prefix_search(
        f"{PREFIX_STEM}* {PREFIX_PLAIN}",
        k=10,
        max_expansions=PREFIX_CAP,
        dtype=np.float64,
    )
    return res.select("doc_id", F.round("score", 4).alias("score"))


def sql_prefix_e2e_topk() -> str:
    """DuckDB twin: exp = top-PREFIX_CAP prefix matches by
    (df DESC, term) from the relational dfs, scored terms restricted to
    exp plus the plain term, disjunctive BM25 top-10."""
    return (
        _bm25_base("duckdb")
        + f"WHERE tf.term = '{PREFIX_PLAIN}' "
        f"OR tf.term LIKE '{PREFIX_STEM}%'), "
        f"exp AS (SELECT term FROM dfs WHERE term LIKE '{PREFIX_STEM}%' "
        f"ORDER BY df DESC, term LIMIT {PREFIX_CAP}), "
        f"qt AS (SELECT term FROM exp UNION SELECT '{PREFIX_PLAIN}') "
        "SELECT s.doc_id, round(sum(s.score), 4) AS score FROM scored s "
        "WHERE s.term IN (SELECT term FROM qt) GROUP BY s.doc_id "
        "ORDER BY sum(s.score) DESC, s.doc_id LIMIT 10"
    )


# boolean NOT clause: positives = the flagship disjunctive terms,
# excluded term chosen so most docs drop (df("slow") ~ the corpus)
# while 100+ survivors keep the top-10 well-defined at every SF
NOT_EXCLUDE = "slow"


def spark_boolean_not_e2e_topk(spark, sf_dir: str) -> DataFrame:
    """Boolean ``(a OR b OR c) AND NOT d`` top-10 through the REAL
    chunked index (cache shared with index_e2e_topk), HARD-ORACLED:
    QueryEngine.search_not decodes the excluded term's postings once,
    anti-joins at the aggregation convergence point (theta shortcuts
    that rank excluded docs disable themselves), and returns the
    surviving disjunctive BM25 top-10 in float64."""
    import numpy as np

    from .query import QueryEngine

    _prepare(spark, sf_dir)
    index_dir = _e2e_index(spark, sf_dir)
    qe = QueryEngine(spark, index_dir)
    res = qe.search_not(
        " ".join(BM25_DISJ_TERMS), NOT_EXCLUDE, k=10, dtype=np.float64
    )
    return res.select("doc_id", F.round("score", 4).alias("score"))


def sql_boolean_not_e2e_topk() -> str:
    """DuckDB twin: the flagship disjunctive scoring restricted to docs
    with no occurrence of the excluded term."""
    in_list = ", ".join(f"'{t}'" for t in BM25_DISJ_TERMS)
    return (
        _bm25_base("duckdb") + f"WHERE tf.term IN ({in_list})), "
        f"neg AS (SELECT DISTINCT doc_id FROM tok "
        f"WHERE term = '{NOT_EXCLUDE}') "
        "SELECT s.doc_id, round(sum(s.score), 4) AS score FROM scored s "
        "WHERE s.doc_id NOT IN (SELECT doc_id FROM neg) "
        "GROUP BY s.doc_id ORDER BY sum(s.score) DESC, s.doc_id LIMIT 10"
    )


def spark_expansion_terms_e2e(spark, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback expansion through the REAL chunked
    index (cache shared with index_e2e_topk), HARD-ORACLED: top-10
    retrieval -> point doc fetch -> candidate terms scored by log
    co-occurrence lift vs corpus df, top-20."""
    from .query import QueryEngine

    _prepare(spark, sf_dir)
    index_dir = _e2e_index(spark, sf_dir)
    qe = QueryEngine(spark, index_dir)
    return qe.expansion_terms(
        " ".join(BM25_DISJ_TERMS), k_docs=10, top_n=20, min_co=2
    )


def sql_expansion_terms_e2e() -> str:
    """DuckDB twin: the flagship BM25 top-10 doc set (rank-identical
    by construction), distinct terms per feedback doc, lift vs the
    full-corpus dfs CTE. Assumes >= 10 matching docs at the gate SF
    (holds for the flagship terms at every testdata SF)."""
    in_list = ", ".join(f"'{t}'" for t in BM25_DISJ_TERMS)
    return (
        _bm25_base("duckdb") + f"WHERE tf.term IN ({in_list})), "
        "topk AS (SELECT s.doc_id FROM scored s GROUP BY s.doc_id "
        "ORDER BY sum(s.score) DESC, s.doc_id LIMIT 10), "
        "cand AS (SELECT t.term, CAST(count(*) AS BIGINT) AS co_docs "
        "FROM (SELECT DISTINCT tok.doc_id, tok.term FROM tok "
        "JOIN topk ON tok.doc_id = topk.doc_id) t GROUP BY t.term) "
        "SELECT c.term, c.co_docs, d.df, "
        "round(ln((CAST(c.co_docs AS DOUBLE) / 10.0) / "
        "(CAST(d.df AS DOUBLE) / CAST(st.n_docs AS DOUBLE))), 4) AS score "
        "FROM cand c JOIN dfs d ON c.term = d.term CROSS JOIN stats st "
        f"WHERE c.co_docs >= 2 AND c.term NOT IN ({in_list}) "
        "ORDER BY score DESC, c.term ASC LIMIT 20"
    )


def spark_collapsed_e2e_topk(spark, sf_dir: str) -> DataFrame:
    """Host-collapsed top-10 through the REAL chunked index (shared
    e2e cache), HARD-ORACLED: at most one result per url host, each
    host represented by its best-scoring doc (tie doc_id ASC)."""
    import numpy as np

    from .query import QueryEngine

    _prepare(spark, sf_dir)
    index_dir = _e2e_index(spark, sf_dir)
    qe = QueryEngine(spark, index_dir)
    res = qe.search_collapsed(
        " ".join(BM25_DISJ_TERMS), k=10, dtype=np.float64
    )
    return res.select(
        "doc_id", "host", F.round("score", 4).alias("score")
    )


def sql_collapsed_e2e_topk() -> str:
    """DuckDB twin: per-doc BM25 sums, host re-derived from the
    synthesized url, one row per host via a (score DESC, doc_id ASC)
    window, top-10 hosts by their representative's score."""
    in_list = ", ".join(f"'{t}'" for t in BM25_DISJ_TERMS)
    return (
        _bm25_base("duckdb") + f"WHERE tf.term IN ({in_list})), "
        "agg AS (SELECT doc_id, sum(score) AS score FROM scored "
        "GROUP BY doc_id), "
        "hosts AS (SELECT a.doc_id, lower(regexp_extract("
        "'https://' || d.source || '/doc/' || CAST(d.doc_id AS VARCHAR), "
        "'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS host, a.score, "
        "row_number() OVER (PARTITION BY lower(regexp_extract("
        "'https://' || d.source || '/doc/' || CAST(d.doc_id AS VARCHAR), "
        "'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) "
        "ORDER BY a.score DESC, a.doc_id ASC) AS rn "
        "FROM agg a JOIN documents d ON a.doc_id = d.doc_id) "
        "SELECT doc_id, host, round(hosts.score, 4) AS score FROM hosts "
        "WHERE rn = 1 ORDER BY hosts.score DESC, doc_id ASC LIMIT 10"
    )


DYM_TERMS = ("spark", "qery", "zzzzunfixable")


def spark_did_you_mean(spark, sf_dir: str) -> DataFrame:
    """Spell correction through the REAL index + SymSpell side table
    (shared e2e cache), HARD-ORACLED: per query term, the exact term
    when indexed, else the (df DESC, term ASC) best ED<=1 lexicon
    term, else the ('', -1) sentinel."""
    import os

    from .build import build_fuzzy_index
    from .query import QueryEngine

    _prepare(spark, sf_dir)
    index_dir = _e2e_index(spark, sf_dir)
    if not os.path.isdir(os.path.join(index_dir, "fuzzy")):
        build_fuzzy_index(spark, index_dir)
    qe = QueryEngine(spark, index_dir)
    return qe.did_you_mean(" ".join(DYM_TERMS))


def sql_did_you_mean() -> str:
    """DuckDB twin: brute-force levenshtein<=1 per query term with
    exact-match priority, same (df DESC, term ASC) pick and the same
    ('', -1) no-candidate sentinel."""
    # tokenize_query dedups + sorts, so pos follows sorted term order
    vals = ", ".join(
        f"({i}, '{t}')" for i, t in enumerate(sorted(set(DYM_TERMS)))
    )
    return (
        f"WITH {_toks_cte('duckdb')}, {_tok_cte('duckdb')}, "
        "tf AS (SELECT doc_id, term FROM tok GROUP BY doc_id, term), "
        "dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df "
        "FROM tf GROUP BY term), "
        f"q(pos, term) AS (VALUES {vals}), "
        "best AS (SELECT q.pos, q.term, d.term AS correction, d.df, "
        "row_number() OVER (PARTITION BY q.pos ORDER BY "
        "(d.term = q.term) DESC, d.df DESC, d.term ASC) AS rn "
        "FROM q LEFT JOIN dfs d ON levenshtein(q.term, d.term) <= 1) "
        "SELECT CAST(pos AS INT) AS pos, term, "
        "coalesce(correction, '') AS correction, "
        "CAST(coalesce(df, -1) AS BIGINT) AS df "
        "FROM best WHERE rn = 1 ORDER BY pos"
    )


SUGGEST_PREFIX = "s"


def spark_suggest_terms(spark, sf_dir: str) -> DataFrame:
    """Autocomplete through the REAL index lexicon (shared e2e cache),
    HARD-ORACLED: top-10 terms for a prefix by (df DESC, term ASC)."""
    from .query import QueryEngine

    _prepare(spark, sf_dir)
    index_dir = _e2e_index(spark, sf_dir)
    qe = QueryEngine(spark, index_dir)
    return qe.suggest(SUGGEST_PREFIX, n=10)


def sql_suggest_terms() -> str:
    """DuckDB twin: per-term posting counts over the corpus replace
    the lexicon (df == distinct-doc posting count by construction)."""
    return (
        f"WITH {_toks_cte('duckdb')}, {_tok_cte('duckdb')}, "
        "tf AS (SELECT doc_id, term FROM tok GROUP BY doc_id, term) "
        "SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf "
        f"WHERE term LIKE '{SUGGEST_PREFIX}%' "
        "GROUP BY term ORDER BY df DESC, term ASC LIMIT 10"
    )


def spark_index_stats(spark, sf_dir: str) -> DataFrame:
    """Index observability summary through the REAL index (shared e2e
    cache), HARD-ORACLED on the corpus-derivable columns: n_chunks is
    dropped here because the physical chunk count depends on the
    build's doc-id range partitioning (each range chunks its local
    run), not on the corpus alone — pytest covers it structurally."""
    from .query import QueryEngine

    _prepare(spark, sf_dir)
    index_dir = _e2e_index(spark, sf_dir)
    qe = QueryEngine(spark, index_dir)
    return qe.index_stats().drop("n_chunks")


def sql_index_stats() -> str:
    """DuckDB twin: every column re-derived relationally from the
    corpus (df == distinct-doc posting count per term)."""
    return (
        f"WITH {_toks_cte('duckdb')}, {_tok_cte('duckdb')}, "
        "tf AS (SELECT doc_id, term FROM tok GROUP BY doc_id, term), "
        "dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df "
        "FROM tf GROUP BY term) "
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs, "
        "(SELECT round(avg(len(ts)), 4) FROM toks) AS avgdl, "
        "CAST(count(*) AS BIGINT) AS n_terms, "
        "CAST(sum(df) AS BIGINT) AS n_postings, "
        "CAST(max(df) AS BIGINT) AS max_df FROM dfs"
    )


# fixed bloom geometry for the contract entry so the oracle can bake
# the size in as a literal (production auto-sizes from n_terms)
BLOOM_M = 131072
BLOOM_K = 7


def spark_term_bloom_stats(spark, sf_dir: str) -> DataFrame:
    """The term Bloom sidecar (build.build_term_bloom — LSM segment
    pruning), built for real into the shared e2e index and verified
    at the ARTIFACT level: n_terms and the set-bit population are
    recounted from the persisted bitset on disk, and the DuckDB twin
    rebuilds the identical population relationally — the md5
    double-hash family (codecs.bloom_positions) is engine-independent,
    so COUNT(DISTINCT position) over the corpus-derived term set must
    equal the artifact's popcount exactly. Building into the shared
    cache is safe: pruning is lossless (no bloom false negatives), so
    every other entry's results are unchanged by the sidecar's
    presence."""
    import os

    import numpy as np

    from . import codecs
    from .build import build_term_bloom

    _prepare(spark, sf_dir)
    index_dir = _e2e_index(spark, sf_dir)
    meta = build_term_bloom(spark, index_dir, m=BLOOM_M, k=BLOOM_K)
    loaded = codecs.bloom_load(os.path.join(index_dir, codecs.BLOOM_DIR))
    # explicit raises, not asserts: the artifact gate must hold under
    # python -O too
    if loaded is None:
        raise ValueError("bloom sidecar unreadable after build")
    words, m, k, _n = loaded
    if (m, k) != (BLOOM_M, BLOOM_K):
        raise ValueError(f"bloom geometry {(m, k)} != {(BLOOM_M, BLOOM_K)}")
    bits_set = codecs.bloom_popcount(words)
    if bits_set != meta["bits_set"]:
        raise ValueError(
            f"persisted popcount {bits_set} != builder {meta['bits_set']}"
        )
    return spark.createDataFrame(
        [(int(meta["n_terms"]), bits_set)],
        "n_terms long, bits_set long",
    )


def spark_quality_classifier(spark, sf_dir: str) -> DataFrame:
    """Token-LLR reference-corpus quality classifier
    (textstats.quality_classifier — the GPT-3-style good-vs-crawl
    filter): fit on two disjoint deterministic reference slices of
    the corpus (doc_id % 7 == 0 positive, % 7 == 3 negative), score
    every doc; the DuckDB twin recomputes the identical smoothed
    LLR table and per-doc normalized sum."""
    from .textstats import quality_classifier

    d = _docs(spark, sf_dir)
    return quality_classifier(
        d,
        d.where(F.col("doc_id") % 7 == 0),
        d.where(F.col("doc_id") % 7 == 3),
    )


def sql_quality_classifier() -> str:
    """DuckDB twin: same add-0.5 smoothing over the union vocabulary,
    same ln-ratio, same round-then-threshold keep rule."""
    return (
        f"WITH {_toks_cte('duckdb')}, {_tok_cte('duckdb')}, "
        "pcnt AS (SELECT term, CAST(count(*) AS DOUBLE) AS cp "
        "FROM tok WHERE doc_id % 7 = 0 GROUP BY term), "
        "ncnt AS (SELECT term, CAST(count(*) AS DOUBLE) AS cn "
        "FROM tok WHERE doc_id % 7 = 3 GROUP BY term), "
        "vocab AS (SELECT coalesce(p.term, n.term) AS term, "
        "coalesce(cp, 0) AS cp, coalesce(cn, 0) AS cn "
        "FROM pcnt p FULL OUTER JOIN ncnt n ON p.term = n.term), "
        "tot AS (SELECT CAST(count(*) AS DOUBLE) AS v, "
        "sum(cp) AS tp, sum(cn) AS tn FROM vocab), "
        "vllr AS (SELECT term, "
        "ln((cp + 0.5) / (tp + 0.5 * v)) - "
        "ln((cn + 0.5) / (tn + 0.5 * v)) AS llr "
        "FROM vocab CROSS JOIN tot), "
        "tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf "
        "FROM tok GROUP BY doc_id, term) "
        "SELECT tf.doc_id, CAST(sum(tf.tf) AS BIGINT) AS n_tokens, "
        "round(sum(tf.tf * coalesce(v.llr, 0)) / sum(tf.tf), 4) + 0.0 "
        "AS llr, "
        "round(sum(tf.tf * coalesce(v.llr, 0)) / sum(tf.tf), 4) > 0 "
        "AS keep "
        "FROM tf LEFT JOIN vllr v ON tf.term = v.term GROUP BY tf.doc_id"
    )


def spark_index_fsck(spark, sf_dir: str) -> DataFrame:
    """Distributed index fsck (maintenance.check_index — the Lucene
    CheckIndex analogue) over the shared e2e index, ARTIFACT-LEVEL:
    every invariant row (lexicon↔chunks consistency, chunk-sequence
    density, range ordering, deep payload decode, doc-id uniqueness,
    stats recount, tombstone references, bloom sidecar + zero false
    negatives) must report n_violations = 0, and the DuckDB twin
    independently re-derives each check's n_examined from the corpus
    (terms, (term, salt) groups under the e2e build's n_salts=4
    layout, 128-posting chunk counts, doc counts) — proving the fsck
    actually scanned the complete artifact, not a sample. Detection of
    corrupted artifacts is pytest-gated (tests/test_maintenance.py
    tampers copies). Building the bloom into the shared cache is safe
    (see spark_term_bloom_stats)."""
    import os

    from . import codecs, maintenance
    from .build import build_term_bloom

    _prepare(spark, sf_dir)
    index_dir = _e2e_index(spark, sf_dir)
    if codecs.bloom_load(os.path.join(index_dir, codecs.BLOOM_DIR)) is None:
        build_term_bloom(spark, index_dir, m=BLOOM_M, k=BLOOM_K)
    return maintenance.check_index(spark, index_dir, deep=True)


def sql_index_fsck() -> str:
    """DuckDB twin: a healthy index's fsck report — all-zero
    violations with every n_examined re-derived relationally from the
    corpus: distinct terms, (term, salt) groups under the e2e build's
    salt formula (floor(doc_id * 4 / (max_doc_id + 1))), ceil-128
    chunk counts per group, and document counts. postings/tombstone
    rows are structurally absent from the shared e2e index (examined
    0)."""
    return (
        f"WITH {_toks_cte('duckdb')}, {_tok_cte('duckdb')}, "
        "tf AS (SELECT term, doc_id FROM tok GROUP BY term, doc_id), "
        "mx AS (SELECT max(doc_id) + 1 AS m FROM documents), "
        "salted AS (SELECT term, doc_id, "
        "CAST(doc_id * 4 // (SELECT m FROM mx) AS INT) AS salt FROM tf), "
        "ch AS (SELECT term, salt, CAST((row_number() OVER "
        "(PARTITION BY term, salt ORDER BY doc_id) - 1) // 128 AS INT) "
        "AS cs FROM salted), "
        "nck AS (SELECT CAST(count(*) AS BIGINT) AS n FROM "
        "(SELECT DISTINCT term, salt, cs FROM ch)), "
        "ngr AS (SELECT CAST(count(*) AS BIGINT) AS n FROM "
        "(SELECT DISTINCT term, salt FROM ch)), "
        "ntm AS (SELECT CAST(count(DISTINCT term) AS BIGINT) AS n FROM tf), "
        "ndc AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents) "
        "SELECT * FROM ("
        "SELECT 'bloom_false_negatives' AS check_name, "
        "(SELECT n FROM ntm) AS n_examined, CAST(0 AS BIGINT) AS n_violations "
        "UNION ALL SELECT 'bloom_sidecar', 1, 0 "
        "UNION ALL SELECT 'chunk_ids_in_corpus_range', (SELECT n FROM nck), 0 "
        "UNION ALL SELECT 'chunk_ranges_ordered', (SELECT n FROM nck), 0 "
        "UNION ALL SELECT 'chunk_seq_unique', (SELECT n FROM ngr), 0 "
        "UNION ALL SELECT 'doc_ids_unique', (SELECT n FROM ndc), 0 "
        "UNION ALL SELECT 'lexicon_chunks_consistency', (SELECT n FROM ntm), 0 "
        "UNION ALL SELECT 'payload_decode', (SELECT n FROM nck), 0 "
        "UNION ALL SELECT 'postings_tf_positions', 0, 0 "
        "UNION ALL SELECT 'stats_consistency', 1, 0 "
        "UNION ALL SELECT 'tombstones_in_doc_table', 0, 0"
        ") ORDER BY check_name"
    )


def sql_term_bloom_stats() -> str:
    """DuckDB twin: the lexicon term set re-derived from the corpus
    (same CTEs as lexicon_df), each term expanded to its k=7 double-
    hash positions (h1 + i*h2 mod m, h1/h2 from md5 hex — all < 2^60,
    overflow-free BIGINT math), and the filter's set-bit count
    recovered as COUNT(DISTINCT position)."""
    return (
        f"WITH {_toks_cte('duckdb')}, {_tok_cte('duckdb')}, "
        "lexterms AS (SELECT DISTINCT term FROM tok), "
        "h AS (SELECT "
        f"('0x' || substr(md5(term), 1, 15))::BIGINT % {BLOOM_M} AS h1, "
        f"((('0x' || substr(md5(term), 16, 15))::BIGINT % {BLOOM_M}) | 1)"
        " AS h2 FROM lexterms), "
        "pos AS (SELECT (h1 + i * h2) % "
        f"{BLOOM_M} AS p FROM h CROSS JOIN "
        f"(SELECT unnest(generate_series(0, {BLOOM_K - 1})) AS i)) "
        "SELECT (SELECT CAST(count(*) AS BIGINT) FROM lexterms) "
        "AS n_terms, "
        "CAST(count(DISTINCT p) AS BIGINT) AS bits_set FROM pos"
    )


# two misspelled flagship terms: each expands to its ED<=1 lexicon
# neighborhood (df-ranked, capped) and the union scores disjunctively
FUZZY_QUERY = ("qery", "sparkk")
FUZZY_CAP = 8


def spark_fuzzy_e2e_topk(spark, sf_dir: str) -> DataFrame:
    """Typo-tolerant top-10 through the REAL chunked index plus its
    SymSpell deletion side table (built once into the shared e2e
    cache), HARD-ORACLED: per-term ED<=1 expansion (df DESC, term ASC,
    cap 8) then one disjunctive BM25 over the union."""
    import os

    import numpy as np

    from .build import build_fuzzy_index
    from .query import QueryEngine

    _prepare(spark, sf_dir)
    index_dir = _e2e_index(spark, sf_dir)
    if not os.path.isdir(os.path.join(index_dir, "fuzzy")):
        build_fuzzy_index(spark, index_dir)
    qe = QueryEngine(spark, index_dir)
    res = qe.fuzzy_search(
        " ".join(FUZZY_QUERY), k=10, max_expansions=FUZZY_CAP,
        dtype=np.float64,
    )
    return res.select("doc_id", F.round("score", 4).alias("score"))


def sql_fuzzy_e2e_topk() -> str:
    """DuckDB twin: brute-force Levenshtein<=1 over the derived term
    universe replaces the deletion-neighborhood lookup (same candidate
    set by the SymSpell completeness guarantee), same (df DESC, term)
    cap, same disjunctive BM25 over the union."""
    exps = ", ".join(
        f"e{i} AS (SELECT term FROM dfs WHERE levenshtein(term, '{t}') <= 1 "
        f"ORDER BY df DESC, term ASC LIMIT {FUZZY_CAP})"
        for i, t in enumerate(FUZZY_QUERY)
    )
    union = " UNION ".join(
        f"SELECT term FROM e{i}" for i in range(len(FUZZY_QUERY))
    )
    return (
        _bm25_base("duckdb") + "), "
        f"{exps}, exp AS ({union}) "
        "SELECT sc.doc_id, round(sum(sc.score), 4) AS score FROM scored sc "
        "JOIN exp ON sc.term = exp.term "
        "GROUP BY sc.doc_id ORDER BY sum(sc.score) DESC, sc.doc_id LIMIT 10"
    )


MLT_SEED_DOC = 7


def spark_more_like_this_e2e(spark, sf_dir: str) -> DataFrame:
    """More-like-this through the REAL chunked index (cache shared
    with index_e2e_topk), HARD-ORACLED: the seed doc's top-10 tf*idf
    terms run as a disjunctive top-10 with the seed excluded."""
    from .query import QueryEngine

    _prepare(spark, sf_dir)
    index_dir = _e2e_index(spark, sf_dir)
    qe = QueryEngine(spark, index_dir)
    res = qe.more_like_this(MLT_SEED_DOC, max_terms=10, k=10)
    return res.select("doc_id", F.round("score", 4).alias("score"))


def sql_more_like_this_e2e() -> str:
    """DuckDB twin: same tf*idf term selection (unclamped reference
    idf, term-ASC tiebreak), BM25 over the selected terms, seed doc
    filtered out of the ranking."""
    return (
        _bm25_base("duckdb") + "), "
        "mlt AS (SELECT tf.term FROM tf JOIN dfs ON tf.term = dfs.term "
        "CROSS JOIN stats s "
        f"WHERE tf.doc_id = {MLT_SEED_DOC} "
        "ORDER BY tf.tf * ln((CAST(s.n_docs AS DOUBLE) - dfs.df + 0.5) / "
        "(CAST(dfs.df AS DOUBLE) + 0.5)) DESC, tf.term ASC LIMIT 10) "
        "SELECT sc.doc_id, round(sum(sc.score), 4) AS score FROM scored sc "
        f"JOIN mlt ON sc.term = mlt.term WHERE sc.doc_id != {MLT_SEED_DOC} "
        "GROUP BY sc.doc_id ORDER BY sum(sc.score) DESC, sc.doc_id LIMIT 10"
    )


def spark_facet_counts_e2e(spark, sf_dir: str) -> DataFrame:
    """Faceted search through the REAL chunked index (cache shared
    with index_e2e_topk), HARD-ORACLED: exact per-host document counts
    over the flagship disjunctive query's FULL match set (postings
    decode -> distinct doc set -> column-pruned doc-table join ->
    facet agg), top-20 by (n_docs DESC, facet ASC)."""
    from .query import QueryEngine

    _prepare(spark, sf_dir)
    index_dir = _e2e_index(spark, sf_dir)
    qe = QueryEngine(spark, index_dir)
    return qe.facet_counts(
        " ".join(BM25_DISJ_TERMS), mode="disjunctive", facet="host", top_n=20
    )


def sql_facet_counts_e2e() -> str:
    """DuckDB twin: matched docs = any flagship term present; the host
    facet re-derives the corpus url exactly as load_documents
    synthesizes it (https://{source}/doc/{doc_id})."""
    in_list = ", ".join(f"'{t}'" for t in BM25_DISJ_TERMS)
    return (
        f"WITH {_toks_cte('duckdb')}, {_tok_cte('duckdb')}, "
        f"matched AS (SELECT DISTINCT doc_id FROM tok "
        f"WHERE term IN ({in_list})), "
        "facets AS (SELECT m.doc_id, lower(regexp_extract("
        "'https://' || d.source || '/doc/' || CAST(d.doc_id AS VARCHAR), "
        "'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)', 1)) AS facet "
        "FROM matched m JOIN documents d ON m.doc_id = d.doc_id) "
        "SELECT facet, CAST(count(*) AS BIGINT) AS n_docs FROM facets "
        "GROUP BY facet ORDER BY n_docs DESC, facet ASC LIMIT 20"
    )


PROX_WINDOW = 3


def spark_proximity_e2e_topk(spark, sf_dir: str) -> DataFrame:
    """NEAR-window top-10 through the SAME positional index as
    phrase_e2e_topk (cache shared), HARD-ORACLED vs a relational DuckDB
    twin: a doc matches when some window of PROX_WINDOW consecutive
    token positions contains every query term (order-insensitive)."""
    import numpy as np

    _prepare(spark, sf_dir)
    index_dir = _E2E_POS_CACHE.get(sf_dir)
    if index_dir is None:
        # build via the phrase entry's path so both share one index
        spark_phrase_e2e_topk(spark, sf_dir).collect()
        index_dir = _E2E_POS_CACHE[sf_dir]
    from .query import QueryEngine

    qe = QueryEngine(spark, index_dir)
    res = qe.proximity_search(
        " ".join(PHRASE), window=PROX_WINDOW, k=10, dtype=np.float64
    )
    return res.select("doc_id", F.round("score", 4).alias("score"))


def sql_proximity_e2e_topk() -> str:
    """DuckDB twin: positions via zipped unnest, candidate window
    anchors at every query-term occurrence (exhaustive — the minimal
    covering window starts at an occurrence), BM25 scoring identical
    to the phrase oracle."""
    in_list = ", ".join(f"'{t}'" for t in sorted(set(PHRASE)))
    n_terms = len(set(PHRASE))
    w = PROX_WINDOW
    return (
        _bm25_base("duckdb") + f"WHERE tf.term IN ({in_list})), "
        "posx AS (SELECT doc_id, unnest(ts) AS term, "
        "unnest(range(1, len(ts) + 1)) AS pos FROM toks), "
        f"hits AS (SELECT doc_id, term, pos FROM posx "
        f"WHERE term IN ({in_list})), "
        "matched AS (SELECT DISTINCT c.doc_id FROM hits c JOIN hits p "
        "ON p.doc_id = c.doc_id AND p.pos >= c.pos AND "
        f"p.pos < c.pos + {w} GROUP BY c.doc_id, c.pos "
        f"HAVING count(DISTINCT p.term) = {n_terms}) "
        "SELECT s.doc_id, round(sum(s.score), 4) AS score FROM scored s "
        "JOIN matched m ON s.doc_id = m.doc_id GROUP BY s.doc_id "
        "ORDER BY sum(s.score) DESC, s.doc_id LIMIT 10"
    )


_HTML_PRE = "<html><head><title>doc "
_HTML_MID = "</title></head><body><p>"
_HTML_POST = "</p></body></html>"


def spark_html_extract_e2e(spark, sf_dir: str) -> DataFrame:
    """The input_hint's ``html:binary`` path end-to-end: synthesize a
    deterministic html payload per document (UTF-8-encoded tag wrapper
    around the text — no external data), null out ``text``, run
    :func:`corpus.extract_text` (the vectorized Arrow UDF), and emit
    per-doc md5(extracted_text) + token_count. Hash-checked against a
    DuckDB twin that applies the same global tag-strip regex — this is
    the byte-identical-per-url invariant as a driver-gated check, not
    just a pytest golden."""
    from .corpus import extract_text
    from .tokenizer import tokenize_col

    _prepare(spark, sf_dir)
    docs = spark.table("documents")
    pages = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat(
            F.lit("https://"), F.col("source"), F.lit("/doc/"), F.col("doc_id")
        ).alias("url"),
        F.timestamp_seconds(F.lit(1_600_000_000) + F.col("doc_id")).alias(
            "warc_ts"
        ),
        F.encode(
            F.concat(
                F.lit(_HTML_PRE),
                F.col("doc_id").cast("string"),
                F.lit(_HTML_MID),
                F.coalesce(F.col("text"), F.lit("")),
                F.lit(_HTML_POST),
            ),
            "UTF-8",
        ).alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.col("lang"),
    )
    out = extract_text(pages)
    return out.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.size(tokenize_col(F.col("text"))).cast("long").alias("token_count"),
    )


def sql_html_extract_e2e() -> str:
    return (
        "WITH ext AS (SELECT doc_id, regexp_replace("
        f"'{_HTML_PRE}' || CAST(doc_id AS VARCHAR) || '{_HTML_MID}' || "
        f"coalesce(text, '') || '{_HTML_POST}', "
        "'<[^>]*>', ' ', 'g') AS text FROM documents), "
        "toks AS (SELECT doc_id, list_filter(regexp_split_to_array(text, "
        f"'{_RX_SQL}'), t -> t <> '') AS ts FROM ext) "
        "SELECT e.doc_id, md5(e.text) AS text_md5, "
        "CAST(len(t.ts) AS BIGINT) AS token_count "
        "FROM ext e JOIN toks t ON e.doc_id = t.doc_id"
    )


def spark_pii_redact(spark, sf_dir: str) -> DataFrame:
    """PII redaction driven on synthesized-PII rows (the corpus has no
    emails/phones, so every row gets a deterministic doc_id-derived
    email + phone appended — both engines replicate the injection, so
    the redaction logic is exercised on every row, not vacuously)."""
    from .textstats import pii_redact

    _prepare(spark, sf_dir)
    docs = spark.table("documents")
    aug = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.lit(" contact doc"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or call +1 (555) 010-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" now"),
        ).alias("text"),
    )
    out = pii_redact(aug)
    return out.select(
        "doc_id", F.md5("text").alias("red_md5"), "n_emails", "n_phones"
    )


def sql_pii_redact() -> str:
    from .textstats import EMAIL_RX, PHONE_RX

    return (
        "WITH aug AS (SELECT doc_id, coalesce(text, '') || ' contact doc' "
        "|| CAST(doc_id AS VARCHAR) || '@example.com or call +1 (555) 010-' "
        "|| lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' now' AS text "
        "FROM documents), "
        f"r1 AS (SELECT doc_id, regexp_replace(text, '{EMAIL_RX}', "
        "'<EMAIL>', 'g') AS t1, "
        f"len(regexp_extract_all(text, '{EMAIL_RX}')) AS n_emails FROM aug) "
        f"SELECT doc_id, md5(regexp_replace(t1, '{PHONE_RX}', '<PHONE>', "
        "'g')) AS red_md5, CAST(n_emails AS BIGINT) AS n_emails, "
        f"CAST(len(regexp_extract_all(t1, '{PHONE_RX}')) AS BIGINT) "
        "AS n_phones FROM r1"
    )


_URL_BASE = "://example.com/page/"


def spark_url_dedup(spark, sf_dir: str) -> DataFrame:
    """URL-level dedup on synthesized url variants: docs are grouped in
    threes sharing one logical page; each group member carries a
    different surface form (plain / UPPERCASED scheme+host + #fragment
    / default :443 port + trailing slash) that normalize_url must
    collapse. Hash-checks group sizes and the min-doc_id survivor."""
    from .textstats import url_dedup

    _prepare(spark, sf_dir)
    docs = spark.table("documents")
    g = F.floor(F.col("doc_id") / F.lit(3)).cast("long").cast("string")
    v = F.col("doc_id") % 3
    url = (
        F.when(v == 0, F.concat(F.lit("https" + _URL_BASE), g))
        .when(
            v == 1,
            # uppercase ONLY scheme+host: normalize_url lowercases the
            # authority but must NOT touch the path, so an uppercased
            # path would (correctly) never collapse — the variant
            # exists to exercise the case-collapse, so keep the path
            # lowercase
            F.concat(
                F.lit("HTTPS://EXAMPLE.COM/page/"), g, F.lit("#top")
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://example.com:443/page/"), g, F.lit("/")
            )
        )
    )
    aug = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"), url.alias("url")
    )
    return url_dedup(aug)


def sql_url_dedup() -> str:
    up = "HTTPS://EXAMPLE.COM/page/"
    return (
        "WITH v AS (SELECT doc_id, CAST(doc_id % 3 AS INT) AS v, "
        "CAST(floor(doc_id / 3) AS BIGINT) AS g FROM documents), "
        "urls AS (SELECT doc_id, CASE v "
        f"WHEN 0 THEN 'https{_URL_BASE}' || CAST(g AS VARCHAR) "
        f"WHEN 1 THEN '{up}' || CAST(g AS VARCHAR) || '#top' "
        "ELSE 'https://example.com:443/page/' || CAST(g AS VARCHAR) || '/' "
        "END AS url FROM v), "
        "u1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS u "
        "FROM urls), "
        "u2 AS (SELECT doc_id, coalesce(regexp_extract(u, "
        "'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*'), '') AS head, u FROM u1), "
        "u3 AS (SELECT doc_id, lower(head) || substr(u, length(head) + 1) "
        "AS u FROM u2), "
        "u4 AS (SELECT doc_id, regexp_replace(regexp_replace("
        "regexp_replace(u, "
        "'^(http://[^/:?#]+):80([/?#]|$)', '\\1\\2'), "
        "'^(https://[^/:?#]+):443([/?#]|$)', '\\1\\2'), "
        "'/$', '') AS url_norm FROM u3) "
        "SELECT url_norm, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(min(doc_id) AS BIGINT) AS keep_doc_id FROM u4 "
        "GROUP BY url_norm"
    )


def spark_multimodal_features(spark, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction through the REAL Arrow/mapInPandas
    plumbing, HARD-ORACLED: per-doc media payloads are synthesized
    (md5-derived bytes, the module's deterministic fake-pixel
    convention), ``extract_features(decoder="fake")`` pools the md5
    hex-keystream samples into FEATURE_DIM means, and the result is
    exploded to (media_id, media_type, n_bytes, pos, fsum) with
    ``fsum = round(feature * 1024)`` — exactly the integer 4-block
    byte sum the DuckDB twin recomputes from md5 STRINGS alone (the
    fake decoder is hex-string-keyed precisely so an engine without
    blob md5 can reproduce it; see multimodal._fake_decode). The
    x1024 lift is exact: features are s/1024 rounded to 6 decimals,
    so |1024*f - s| <= 0.000512 and round() recovers s."""
    from .multimodal import extract_features

    _prepare(spark, sf_dir)
    docs = spark.table("documents")
    one = F.unhex(
        F.md5(F.concat(F.lit("media-"), F.col("doc_id").cast("string")))
    )
    media = docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.concat(*([one] * 8)).alias("payload"),
    )
    feats = extract_features(media, decoder="fake")
    ex = feats.select(
        "media_id",
        "media_type",
        "n_bytes",
        F.posexplode("features").alias("pos", "fval"),
    )
    return ex.select(
        "media_id",
        "media_type",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.col("pos").cast("int").alias("pos"),
        F.round(F.col("fval") * 1024).cast("long").alias("fsum"),
    )


def sql_multimodal_features() -> str:
    nib = "strpos('0123456789abcdef', substr(hx, {p}, 1)) - 1"
    b_hi = nib.format(p="2*j.j + 1")
    b_lo = nib.format(p="2*j.j + 2")
    return (
        "WITH k AS (SELECT CAST(doc_id AS BIGINT) AS media_id, "
        "'image' AS media_type, "
        "repeat(md5('media-' || CAST(doc_id AS VARCHAR)), 8) AS key "
        "FROM documents), "
        "h AS (SELECT media_id, media_type, "
        "md5(key || ':' || CAST(b.b AS VARCHAR)) AS hx "
        "FROM k, unnest(generate_series(0, 3)) b(b)), "
        "bytes AS (SELECT media_id, media_type, CAST(j.j AS INT) AS pos, "
        f"({b_hi}) * 16 + ({b_lo}) AS byte "
        "FROM h, unnest(generate_series(0, 15)) j(j)) "
        "SELECT media_id, media_type, CAST(128 AS BIGINT) AS n_bytes, "
        "pos, CAST(sum(byte) AS BIGINT) AS fsum "
        "FROM bytes GROUP BY media_id, media_type, pos"
    )


def spark_multimodal_frames(spark, sf_dir: str) -> DataFrame:
    """Video frame-sampling fan-out through the REAL mapInPandas
    plumbing, HARD-ORACLED on the relational surface: doc-derived
    durations, one frame row per started second, (frame_idx,
    frame_ts_ms, 64-byte fake frame). The frame BYTES are the fake
    decoder's (pytest-covered); the oracle pins the fan-out shape a
    1000-executor video pipeline depends on."""
    from .multimodal import frame_sample

    _prepare(spark, sf_dir)
    docs = spark.table("documents")
    one = F.unhex(
        F.md5(F.concat(F.lit("media-"), F.col("doc_id").cast("string")))
    )
    media = docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.concat(*([one] * 8)).alias("payload"),
        (F.lit(1500) + F.lit(700) * (F.col("doc_id") % 5))
        .cast("long")
        .alias("duration_ms"),
    )
    out = frame_sample(media, every_ms=1000, decoder="fake")
    return out.select(
        "media_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.col("frame_ts_ms").cast("long").alias("frame_ts_ms"),
        F.length("frame").cast("long").alias("n_frame_bytes"),
    )


def sql_multimodal_frames() -> str:
    return (
        "WITH m AS (SELECT CAST(doc_id AS BIGINT) AS media_id, "
        "1500 + 700 * (doc_id % 5) AS dur FROM documents) "
        "SELECT media_id, CAST(u.j AS INT) AS frame_idx, "
        "CAST(u.j * 1000 AS BIGINT) AS frame_ts_ms, "
        "CAST(64 AS BIGINT) AS n_frame_bytes "
        "FROM m, unnest(generate_series(0, "
        "CAST(ceil(dur / 1000.0) AS BIGINT) - 1)) u(j)"
    )


def spark_index_e2e_topk(spark, sf_dir: str) -> DataFrame:
    """Full-engine path, HARD-ORACLED: build the real chunked index
    (tokenize -> doc-major inversion -> delta+Simple9 chunks -> lexicon)
    and answer the flagship disjunctive query through QueryEngine's
    block-max WAND pipeline. Scoring runs in float64 for this entry so
    the result hash-matches the relational DuckDB BM25 oracle to 4
    decimals (the reference's float32 arithmetic parity is separately
    enforced by tests/test_query.py rank-identity)."""
    import tempfile

    import numpy as np

    from .build import IndexBuilder
    from .corpus import load_documents
    from .query import QueryEngine

    _prepare(spark, sf_dir)
    index_dir = _e2e_index(spark, sf_dir)
    qe = QueryEngine(spark, index_dir)
    res = qe.search(
        " ".join(BM25_DISJ_TERMS), mode="disjunctive", k=10, dtype=np.float64
    )
    return res.select("doc_id", F.round("score", 4).alias("score"))


def spark_doc_point_lookup(spark, sf_dir: str) -> DataFrame:
    """Reference B13 (doc-table point lookup, MongoService.cpp:27-48)
    through the REAL engine, HARD-ORACLED: the flagship query's top-10
    ids fetch their doc-table records via ``QueryEngine.fetch_docs`` —
    the pruned IN(doc_id) scan + broadcast join that snippets (Q11)
    rides on. Hash-matches a DuckDB BM25-top-10 joined back to the
    documents table on (doc_id, score, url, text)."""
    import tempfile

    import numpy as np

    from .build import IndexBuilder
    from .corpus import load_documents
    from .query import QueryEngine

    _prepare(spark, sf_dir)
    index_dir = _e2e_index(spark, sf_dir)
    qe = QueryEngine(spark, index_dir)
    topk = qe.search(
        " ".join(BM25_DISJ_TERMS), mode="disjunctive", k=10, dtype=np.float64
    )
    return qe.fetch_docs(topk).select(
        "doc_id", F.round("score", 4).alias("score"), "url", "text"
    )


def sql_doc_point_lookup() -> str:
    """DuckDB twin: BM25 top-10 CTE joined back to documents; url
    re-derives exactly as corpus.load_documents does."""
    in_list = ", ".join(f"'{t}'" for t in BM25_DISJ_TERMS)
    return (
        _bm25_base("duckdb") + f"WHERE tf.term IN ({in_list})), "
        "top AS (SELECT doc_id, round(sum(score), 4) AS score "
        "FROM scored GROUP BY doc_id "
        "ORDER BY sum(score) DESC, doc_id LIMIT 10) "
        "SELECT t.doc_id, t.score, "
        "'https://' || d.source || '/doc/' || CAST(d.doc_id AS VARCHAR) "
        "AS url, d.text FROM top t JOIN documents d ON t.doc_id = d.doc_id"
    )


# ---- index maintenance (maintenance.py): tombstone deletes, physical
# compaction, shard merge — each gated end-to-end through the REAL
# chunked engine against a relational DuckDB formulation of its exact
# statistics semantics (stale for tombstones, fresh for compaction).

# tombstone doc_id % 10 == 1 (~10% of the corpus) — remainder chosen so
# the flagship query's TOP-RANKED docs are among the deleted at the
# driver's sf0.01 (ids 371, 41): the gate fails loudly if masking stops
DELETE_MOD, DELETE_REM = 10, 1
_MAINT_CACHE: dict = {}


def _e2e_index(spark, sf_dir: str) -> str:
    """The shared cached e2e index (same build as spark_index_e2e_topk)."""
    import tempfile

    from .build import IndexBuilder
    from .corpus import load_documents

    index_dir = _E2E_CACHE.get(sf_dir)
    if index_dir is None:
        index_dir = tempfile.mkdtemp(prefix="se_e2e_idx_")
        IndexBuilder(spark, index_dir, n_salts=4, bucket_count=8).build(
            load_documents(spark, sf_dir)
        )
        _E2E_CACHE[sf_dir] = index_dir
    return index_dir


def _tombstoned_index(spark, sf_dir: str) -> str:
    """A COPY of the cached e2e index with doc_id % DELETE_MOD ==
    DELETE_REM tombstoned (copied so the shared cache stays pristine
    for the non-maintenance entries)."""
    import shutil
    import tempfile

    from . import maintenance

    got = _MAINT_CACHE.get(sf_dir)
    if got is None:
        src = _e2e_index(spark, sf_dir)
        dst = tempfile.mkdtemp(prefix="se_maint_idx_")
        shutil.rmtree(dst)
        shutil.copytree(src, dst)
        dels = spark.sql(
            "SELECT doc_id FROM documents "
            f"WHERE doc_id % {DELETE_MOD} = {DELETE_REM}"
        )
        maintenance.delete_docs(spark, dst, dels)
        got = _MAINT_CACHE[sf_dir] = dst
    return got


def spark_tombstone_topk(spark, sf_dir: str) -> DataFrame:
    """Tombstone deletes through the REAL engine, HARD-ORACLED: ~10% of
    the corpus is deleted at zero rebuild cost and the flagship query
    re-runs. Semantics under test (maintenance.py module doc): deleted
    docs vanish from results while N/avgdl/df stay STALE — survivors'
    scores are bit-identical to pre-delete (Lucene deleted-docs
    semantics). The oracle scores over the FULL corpus and filters
    deleted ids only from the result set."""
    import numpy as np

    from .query import QueryEngine

    _prepare(spark, sf_dir)
    qe = QueryEngine(spark, _tombstoned_index(spark, sf_dir))
    res = qe.search(
        " ".join(BM25_DISJ_TERMS), mode="disjunctive", k=10, dtype=np.float64
    )
    return res.select("doc_id", F.round("score", 4).alias("score"))


def sql_tombstone_topk() -> str:
    in_list = ", ".join(f"'{t}'" for t in BM25_DISJ_TERMS)
    return (
        _bm25_base("duckdb") + f"WHERE tf.term IN ({in_list}) "
        f"AND tf.doc_id % {DELETE_MOD} <> {DELETE_REM}) "
        "SELECT doc_id, round(sum(score), 4) AS score FROM scored "
        "GROUP BY doc_id ORDER BY sum(score) DESC, doc_id LIMIT 10"
    )


def spark_compact_topk(spark, sf_dir: str) -> DataFrame:
    """Physical compaction through the REAL engine, HARD-ORACLED: the
    tombstoned index compacts into a fresh index (map-only chunk
    rewrite, stats/df/WAND bounds re-derived over survivors) and the
    flagship query re-runs. The oracle is BM25 over the surviving
    corpus only — compaction must answer exactly like a fresh build."""
    import tempfile

    import numpy as np

    from . import maintenance
    from .query import QueryEngine

    _prepare(spark, sf_dir)
    key = ("compact", sf_dir)
    out_dir = _MAINT_CACHE.get(key)
    if out_dir is None:
        out_dir = tempfile.mkdtemp(prefix="se_compact_idx_")
        maintenance.compact_index(
            spark, _tombstoned_index(spark, sf_dir), out_dir
        )
        _MAINT_CACHE[key] = out_dir
    qe = QueryEngine(spark, out_dir)
    res = qe.search(
        " ".join(BM25_DISJ_TERMS), mode="disjunctive", k=10, dtype=np.float64
    )
    return res.select("doc_id", F.round("score", 4).alias("score"))


def sql_compact_topk() -> str:
    in_list = ", ".join(f"'{t}'" for t in BM25_DISJ_TERMS)
    alive = f" WHERE doc_id % {DELETE_MOD} <> {DELETE_REM}"
    return (
        _bm25_base("duckdb", docs_where=alive)
        + f"WHERE tf.term IN ({in_list})) "
        "SELECT doc_id, round(sum(score), 4) AS score FROM scored "
        "GROUP BY doc_id ORDER BY sum(score) DESC, doc_id LIMIT 10"
    )


def spark_merge_topk(spark, sf_dir: str) -> DataFrame:
    """Shard-index merge through the REAL engine, HARD-ORACLED: the
    corpus builds as TWO disjoint half-range shards, merge_indexes
    stitches them map-only (chunk payload bytes preserved, lexicon
    re-aggregated, WAND bounds refreshed against merged avgdl), and the
    flagship query over the merged index must hash-match the plain
    whole-corpus BM25 oracle — merged == built-as-one."""
    import tempfile

    import numpy as np

    from . import maintenance
    from .build import IndexBuilder
    from .corpus import load_documents
    from .query import QueryEngine

    _prepare(spark, sf_dir)
    key = ("merge", sf_dir)
    out_dir = _MAINT_CACHE.get(key)
    if out_dir is None:
        docs = load_documents(spark, sf_dir)
        half = docs.agg(F.max("doc_id")).collect()[0][0] // 2
        shards = []
        for i, pred in enumerate(
            (F.col("doc_id") <= half, F.col("doc_id") > half)
        ):
            d = tempfile.mkdtemp(prefix=f"se_shard{i}_")
            IndexBuilder(spark, d, n_salts=2, bucket_count=8).build(
                docs.where(pred)
            )
            shards.append(d)
        out_dir = tempfile.mkdtemp(prefix="se_merged_idx_")
        # shards were built over globally disjoint id ranges: offsets 0
        maintenance.merge_indexes(spark, shards, out_dir, offsets=[0, 0])
        _MAINT_CACHE[key] = out_dir
    qe = QueryEngine(spark, out_dir)
    res = qe.search(
        " ".join(BM25_DISJ_TERMS), mode="disjunctive", k=10, dtype=np.float64
    )
    return res.select("doc_id", F.round("score", 4).alias("score"))


# upsert: update every doc_id % 10 == DELETE_REM (overlaps the
# flagship top-10 at sf0.01, so superseded-version leakage fails the
# hash) and add four brand-new docs stuffed with flagship terms (so
# relocated delta ids must rank). Suffix/new text are lowercase
# space-separated words — both tokenizers agree trivially.
UPSERT_SUFFIX = "spark data quality improved"
UPSERT_NEW_WORDS = ("alpha", "beta", "gamma", "delta")


def _upsert_new_rows() -> list[tuple[str, str]]:
    return [
        (
            f"https://synthsrc/doc/new{w}",
            f"spark query data spark query data engine {w}",
        )
        for w in UPSERT_NEW_WORDS
    ]


def spark_upsert_topk(spark, sf_dir: str) -> DataFrame:
    """Incremental refresh through the REAL engine, HARD-ORACLED:
    ``upsert_docs`` tombstones superseded urls, builds a delta shard
    over the new/updated docs only, and merges map-only with stacked
    id relocation. The flagship query over the upserted index must
    match fresh BM25 over the UPDATED corpus (url-keyed — delta docs
    relocate above the base id space, so urls are the stable key)."""
    import os
    import shutil
    import tempfile

    import numpy as np

    from . import maintenance
    from .build import read_stage_parquet
    from .corpus import load_documents
    from .query import QueryEngine

    _prepare(spark, sf_dir)
    key = ("upsert", sf_dir)
    out_dir = _MAINT_CACHE.get(key)
    if out_dir is None:
        src = _e2e_index(spark, sf_dir)
        base = tempfile.mkdtemp(prefix="se_upsert_base_")
        shutil.rmtree(base)
        shutil.copytree(src, base)
        docs = load_documents(spark, sf_dir)
        upd = (
            docs.where(F.col("doc_id") % DELETE_MOD == DELETE_REM)
            .withColumn("text", F.concat("text", F.lit(" " + UPSERT_SUFFIX)))
            .select("url", "text")
        )
        delta = upd.unionByName(
            spark.createDataFrame(_upsert_new_rows(), "url string, text string")
        )
        out_dir = tempfile.mkdtemp(prefix="se_upsert_idx_")
        maintenance.upsert_docs(spark, base, delta, out_dir)
        _MAINT_CACHE[key] = out_dir
    qe = QueryEngine(spark, out_dir)
    # k large enough to cover the whole match set: the oracle ranks the
    # FULL corpus by (rounded score, url), so a raw-score truncation
    # here could drop a doc that round-ties into the url-ordered top 10
    res = qe.search(
        " ".join(BM25_DISJ_TERMS), mode="disjunctive", k=100000,
        dtype=np.float64,
    )
    dt = read_stage_parquet(
        spark, os.path.join(out_dir, "doc_table"), "doc_table"
    ).select("doc_id", "url")
    return (
        res.join(dt, "doc_id")
        .select("url", F.round("score", 4).alias("score"))
        .orderBy(F.desc("score"), "url")
        .limit(10)
    )


def sql_upsert_topk() -> str:
    """Url-keyed BM25 over the updated corpus (same scoring expression
    as _bm25_base, keyed by url because delta doc ids relocate)."""
    in_list = ", ".join(f"'{t}'" for t in BM25_DISJ_TERMS)
    vals = ", ".join(f"('{u}', '{t}')" for u, t in _upsert_new_rows())
    return (
        "WITH docs2 AS ("
        "SELECT 'https://' || source || '/doc/' || CAST(doc_id AS VARCHAR) "
        "AS url, CASE WHEN doc_id % "
        f"{DELETE_MOD} = {DELETE_REM} THEN text || ' {UPSERT_SUFFIX}' "
        "ELSE text END AS text FROM documents "
        f"UNION ALL SELECT * FROM (VALUES {vals}) v(url, text)), "
        "toks AS (SELECT url, list_filter(regexp_split_to_array(text, "
        f"'{_RX_SQL}'), t -> t <> '') AS ts FROM docs2), "
        "tok AS (SELECT url, unnest(ts) AS term FROM toks), "
        "tf AS (SELECT url, term, CAST(count(*) AS BIGINT) AS tf "
        "FROM tok GROUP BY url, term), "
        "dl AS (SELECT url, CAST(len(ts) AS BIGINT) AS dl FROM toks), "
        "stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, "
        "avg(len(ts)) AS avgdl FROM toks), "
        "dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df "
        "FROM tf GROUP BY term), "
        "scored AS (SELECT tf.url, "
        "ln((CAST(s.n_docs AS DOUBLE) - dfs.df + 0.5) / "
        "(CAST(dfs.df AS DOUBLE) + 0.5)) * 2.2 * tf.tf / "
        "(1.2 * (0.25 + 0.75 * dl.dl / s.avgdl) + tf.tf) AS score "
        "FROM tf JOIN dl ON tf.url = dl.url "
        "JOIN dfs ON tf.term = dfs.term CROSS JOIN stats s "
        f"WHERE tf.term IN ({in_list})) "
        "SELECT url, round(sum(score), 4) AS score FROM scored "
        "GROUP BY url ORDER BY score DESC, url LIMIT 10"
    )


def spark_lsm_serve_topk(spark, sf_dir: str) -> DataFrame:
    """Multi-segment serving through the REAL engine, HARD-ORACLED:
    the upsert scenario BEFORE any merge runs — base index with the
    superseded urls tombstoned + an un-merged delta shard, served by
    MultiIndexQueryEngine under STALE combined stats (base N/avgdl/df
    still count the tombstoned versions; per-term df sums across
    segment lexicons; WAND bounds rescale conservatively under the
    global avgdl). The oracle scores over base-rows + delta-rows and
    filters superseded base versions from the RESULT SET only."""
    import os
    import shutil
    import tempfile

    import numpy as np

    from . import maintenance
    from .build import IndexBuilder, read_stage_parquet
    from .corpus import assign_doc_ids, load_documents
    from .query import MultiIndexQueryEngine

    _prepare(spark, sf_dir)
    key = ("lsm", sf_dir)
    dirs = _MAINT_CACHE.get(key)
    if dirs is None:
        src = _e2e_index(spark, sf_dir)
        base = tempfile.mkdtemp(prefix="se_lsm_base_")
        shutil.rmtree(base)
        shutil.copytree(src, base)
        docs = load_documents(spark, sf_dir)
        upd = (
            docs.where(F.col("doc_id") % DELETE_MOD == DELETE_REM)
            .withColumn("text", F.concat("text", F.lit(" " + UPSERT_SUFFIX)))
            .select("url", "text")
        )
        delta_docs = upd.unionByName(
            spark.createDataFrame(_upsert_new_rows(), "url string, text string")
        )
        dt = read_stage_parquet(
            spark, os.path.join(base, "doc_table"), "doc_table"
        )
        superseded = dt.join(
            delta_docs.select("url").distinct(), "url"
        ).select("doc_id")
        maintenance.delete_docs(spark, base, superseded)
        delta_dir = tempfile.mkdtemp(prefix="se_lsm_delta_")
        IndexBuilder(spark, delta_dir, n_salts=2, bucket_count=8).build(
            assign_doc_ids(delta_docs)
        )
        dirs = _MAINT_CACHE[key] = (base, delta_dir)
    mqe = MultiIndexQueryEngine(spark, list(dirs))
    # full-match-set k: same rationale as spark_upsert_topk — the
    # (rounded score, url) re-rank below must not lose round-tied docs
    # to a raw-score pre-truncation
    res = mqe.search(
        " ".join(BM25_DISJ_TERMS), mode="disjunctive", k=100000,
        dtype=np.float64,
    )
    rows = res.collect()
    urls = mqe.doc_urls([int(r["doc_id"]) for r in rows])
    out = spark.createDataFrame(
        [(urls[int(r["doc_id"])], float(r["score"])) for r in rows],
        "url string, score double",
    )
    return (
        out.select("url", F.round("score", 4).alias("score"))
        .orderBy(F.desc("score"), "url")
        .limit(10)
    )


def sql_lsm_serve_topk() -> str:
    """Stale-stats multi-segment oracle: BM25 over base-rows (old
    versions included — deleted-docs statistics) plus delta-rows, with
    superseded base versions filtered from the result set only."""
    in_list = ", ".join(f"'{t}'" for t in BM25_DISJ_TERMS)
    vals = ", ".join(f"('{u}', '{t}')" for u, t in _upsert_new_rows())
    return (
        "WITH docs2 AS ("
        "SELECT 'b' || CAST(doc_id AS VARCHAR) AS key, "
        "'https://' || source || '/doc/' || CAST(doc_id AS VARCHAR) AS url, "
        f"text, (doc_id % {DELETE_MOD} = {DELETE_REM}) AS superseded "
        "FROM documents "
        "UNION ALL SELECT 'd' || CAST(doc_id AS VARCHAR), "
        "'https://' || source || '/doc/' || CAST(doc_id AS VARCHAR), "
        f"text || ' {UPSERT_SUFFIX}', FALSE FROM documents "
        f"WHERE doc_id % {DELETE_MOD} = {DELETE_REM} "
        f"UNION ALL SELECT 'n' || url, url, text, FALSE "
        f"FROM (VALUES {vals}) v(url, text)), "
        "toks AS (SELECT key, url, superseded, "
        f"list_filter(regexp_split_to_array(text, '{_RX_SQL}'), "
        "t -> t <> '') AS ts FROM docs2), "
        "tok AS (SELECT key, unnest(ts) AS term FROM toks), "
        "tf AS (SELECT key, term, CAST(count(*) AS BIGINT) AS tf "
        "FROM tok GROUP BY key, term), "
        "dl AS (SELECT key, CAST(len(ts) AS BIGINT) AS dl FROM toks), "
        "stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, "
        "avg(len(ts)) AS avgdl FROM toks), "
        "dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df "
        "FROM tf GROUP BY term), "
        "scored AS (SELECT tf.key, "
        "ln((CAST(s.n_docs AS DOUBLE) - dfs.df + 0.5) / "
        "(CAST(dfs.df AS DOUBLE) + 0.5)) * 2.2 * tf.tf / "
        "(1.2 * (0.25 + 0.75 * dl.dl / s.avgdl) + tf.tf) AS score "
        "FROM tf JOIN dl ON tf.key = dl.key "
        "JOIN dfs ON tf.term = dfs.term CROSS JOIN stats s "
        f"WHERE tf.term IN ({in_list})) "
        "SELECT t.url, round(sum(sc.score), 4) AS score "
        "FROM scored sc JOIN toks t ON sc.key = t.key "
        "WHERE NOT t.superseded "
        "GROUP BY t.url ORDER BY score DESC, t.url LIMIT 10"
    )


def spark_batch_e2e_topk(spark, sf_dir: str) -> DataFrame:
    """batch_search through the REAL chunked engine, HARD-ORACLED: two
    disjunctive queries share one decode (plus the WAND batch planner
    when it pays); float64 scoring so (query_id, doc_id, score, rank)
    hash-matches the relational DuckDB BM25 oracle. Gates the batch
    fan-out path the same way index_e2e_topk gates single search."""
    import tempfile

    import numpy as np

    from .build import IndexBuilder
    from .corpus import load_documents
    from .query import QueryEngine

    _prepare(spark, sf_dir)
    index_dir = _e2e_index(spark, sf_dir)
    qe = QueryEngine(spark, index_dir)
    res = qe.batch_search(
        [
            (0, " ".join(BM25_DISJ_TERMS)),
            (1, " ".join(BM25_CONJ_TERMS)),
        ],
        mode="disjunctive",
        k=10,
        dtype=np.float64,
    )
    return res.select(
        "query_id",
        "doc_id",
        F.round("score", 4).alias("score"),
        F.col("rank").cast("int").alias("rank"),
    )


def sql_batch_e2e_topk() -> str:
    """DuckDB twin of spark_batch_e2e_topk: per query the BM25 top-10,
    ranked on the UNROUNDED sum (matching the engine's ordering) and
    rounded only at output."""
    parts, unions = [], []
    for qid, terms in ((0, BM25_DISJ_TERMS), (1, BM25_CONJ_TERMS)):
        in_list = ", ".join(f"'{t}'" for t in terms)
        parts.append(
            f"q{qid} AS (SELECT {qid} AS query_id, doc_id, "
            f"sum(score) AS s FROM scored WHERE term IN ({in_list}) "
            "GROUP BY doc_id ORDER BY s DESC, doc_id LIMIT 10)"
        )
        unions.append(
            f"SELECT query_id, doc_id, round(s, 4) AS score, "
            "CAST(row_number() OVER (ORDER BY s DESC, doc_id) AS INT) "
            f'AS "rank" FROM q{qid}'
        )
    return (
        _bm25_base("duckdb")
        + "), "  # close the scored CTE unfiltered
        + ", ".join(parts)
        + " "
        + " UNION ALL ".join(unions)
    )


# ---------------------------------------------------------------- registry


def _registry() -> dict:
    q: dict = {}
    # spark side = spark.sql plan of the same expression tree
    sql_pairs = {
        "term_tf": sql_term_tf,
        "lexicon_df": sql_lexicon_df,
        "doc_stats": sql_doc_stats,
        "doc_table": sql_doc_table,
        "top_terms": sql_top_terms,
        "token_count": sql_token_count,
        "doc_fingerprint": sql_fingerprint,
    }
    for name, builder in sql_pairs.items():
        q[name] = {
            "spark": _sql_query(builder("spark")),
            "sql": builder("duckdb"),
        }
    # spark side = the REAL library operator (dedup/ann/textstats/
    # streaming modules); oracle = equivalent ANSI SQL
    lib_pairs = {
        "dedup_exact": (spark_dedup_exact, sql_dedup_exact),
        "minhash_signatures": (spark_minhash, sql_minhash_signatures),
        "lsh_candidate_pairs": (spark_lsh_pairs, sql_lsh_pairs),
        "lsh_incremental": (spark_lsh_incremental, sql_lsh_incremental),
        "lsh_bucket_stats": (spark_lsh_bucket_stats, sql_lsh_bucket_stats),
        "ngram_jaccard_pairs": (spark_ngram_jaccard, sql_ngram_jaccard),
        "decontaminate": (spark_decontaminate, sql_decontaminate),
        "span_dedup": (spark_span_dedup, sql_span_dedup),
        "dedup_clusters": (spark_dedup_clusters, sql_dedup_clusters),
        "simhash": (spark_simhash, sql_simhash),
        "langid": (spark_langid, sql_langid),
        "quality_score": (spark_quality, sql_quality),
        "lm_score": (spark_lm_score, sql_lm_score),
        "token_count_bpe": (spark_token_count_bpe, sql_token_count_bpe),
        "rolling_min_hash": (spark_rolling_min_hash, sql_rolling_min_hash),
        "repetition_ratio": (spark_repetition_ratio, sql_repetition_ratio),
        "source_stats": (spark_source_stats, sql_source_stats),
        "stratified_sample": (spark_stratified_sample, sql_stratified_sample),
        "mixture_sample": (spark_mixture_sample, sql_mixture_sample),
        "pack_sequences": (spark_pack_sequences, sql_pack_sequences),
        "ann_cosine_topk": (spark_ann_bruteforce, sql_ann_cosine),
        "ann_ivf_topk": (spark_ann_ivf, sql_ann_ivf),
        "semantic_dedup": (spark_semantic_dedup, sql_semantic_dedup),
        "embedding_neardup_exact": (
            spark_embedding_neardup_exact,
            sql_embedding_neardup,
        ),
        "events_hourly": (spark_events_hourly, sql_events_hourly),
        "events_streaming_windowed": (spark_events_streaming, sql_events_hourly),
        "streaming_dedup": (spark_streaming_dedup, sql_streaming_dedup),
    }
    for name, (spark_fn, builder) in lib_pairs.items():
        q[name] = {"spark": spark_fn, "sql": builder("duckdb")}
    q["bm25_disjunctive"] = {
        "spark": _sql_query(sql_bm25("spark", BM25_DISJ_TERMS, False)),
        "sql": sql_bm25("duckdb", BM25_DISJ_TERMS, False),
    }
    q["bm25_conjunctive"] = {
        "spark": _sql_query(sql_bm25("spark", BM25_CONJ_TERMS, True)),
        "sql": sql_bm25("duckdb", BM25_CONJ_TERMS, True),
    }
    # real-engine paths
    q["chunk_metadata"] = {
        "spark": spark_chunk_metadata,
        "sql": sql_chunk_metadata("duckdb"),
    }
    # full engine pipeline vs the relational BM25 formulation (float64
    # engine mode; see spark_index_e2e_topk docstring)
    q["index_e2e_topk"] = {
        "spark": spark_index_e2e_topk,
        "sql": sql_bm25("duckdb", BM25_DISJ_TERMS, False),
    }
    # maintenance lifecycle through the real engine: tombstone deletes
    # (stale-stats oracle), compaction (fresh-stats oracle over the
    # survivors), and shard merge (== built-as-one oracle)
    q["tombstone_topk"] = {
        "spark": spark_tombstone_topk,
        "sql": sql_tombstone_topk(),
    }
    q["compact_topk"] = {
        "spark": spark_compact_topk,
        "sql": sql_compact_topk(),
    }
    q["merge_topk"] = {
        "spark": spark_merge_topk,
        "sql": sql_bm25("duckdb", BM25_DISJ_TERMS, False),
    }
    q["upsert_topk"] = {
        "spark": spark_upsert_topk,
        "sql": sql_upsert_topk(),
    }
    q["lsm_serve_topk"] = {
        "spark": spark_lsm_serve_topk,
        "sql": sql_lsm_serve_topk(),
    }
    # batch fan-out through the same real index (shared _E2E_CACHE)
    q["batch_e2e_topk"] = {
        "spark": spark_batch_e2e_topk,
        "sql": sql_batch_e2e_topk(),
    }
    # B13 point lookup (the snippets fetch path) through the same index
    q["doc_point_lookup"] = {
        "spark": spark_doc_point_lookup,
        "sql": sql_doc_point_lookup(),
    }
    # positional phrase query through a store_positions=True index
    q["phrase_e2e_topk"] = {
        "spark": spark_phrase_e2e_topk,
        "sql": sql_phrase_e2e_topk(),
    }
    # NEAR-window proximity query over the same positional index
    q["proximity_e2e_topk"] = {
        "spark": spark_proximity_e2e_topk,
        "sql": sql_proximity_e2e_topk(),
    }
    # ordered-window (#odN) query over the same positional index
    q["ordered_window_e2e_topk"] = {
        "spark": spark_ordered_window_e2e_topk,
        "sql": sql_ordered_window_e2e_topk(),
    }
    # wildcard/prefix query: capped lexicon expansion -> disjunctive
    q["prefix_e2e_topk"] = {
        "spark": spark_prefix_e2e_topk,
        "sql": sql_prefix_e2e_topk(),
    }
    # boolean (a OR b OR c) AND NOT d through the same chunked index
    q["boolean_not_e2e_topk"] = {
        "spark": spark_boolean_not_e2e_topk,
        "sql": sql_boolean_not_e2e_topk(),
    }
    # faceted search: exact per-host counts over the full match set
    q["facet_counts_e2e"] = {
        "spark": spark_facet_counts_e2e,
        "sql": sql_facet_counts_e2e(),
    }
    # pseudo-relevance-feedback expansion over the top-10 doc set
    q["expansion_terms_e2e"] = {
        "spark": spark_expansion_terms_e2e,
        "sql": sql_expansion_terms_e2e(),
    }
    # more-like-this: seed doc's top tf*idf terms as a query
    q["more_like_this_e2e"] = {
        "spark": spark_more_like_this_e2e,
        "sql": sql_more_like_this_e2e(),
    }
    # typo-tolerant search through the SymSpell deletion side table
    q["fuzzy_e2e_topk"] = {
        "spark": spark_fuzzy_e2e_topk,
        "sql": sql_fuzzy_e2e_topk(),
    }
    # host-collapsed retrieval (site diversification, 1 result/host)
    q["collapsed_e2e_topk"] = {
        "spark": spark_collapsed_e2e_topk,
        "sql": sql_collapsed_e2e_topk(),
    }
    # autocomplete: df-ranked prefix suggestions off the lexicon
    q["suggest_terms"] = {
        "spark": spark_suggest_terms,
        "sql": sql_suggest_terms(),
    }
    # spell correction over the SymSpell side table
    q["did_you_mean"] = {
        "spark": spark_did_you_mean,
        "sql": sql_did_you_mean(),
    }
    # one-row index observability summary (stats + lexicon aggregates)
    q["index_stats"] = {
        "spark": spark_index_stats,
        "sql": sql_index_stats(),
    }
    # term Bloom sidecar, artifact-level: persisted popcount ==
    # relational COUNT(DISTINCT position) over the re-derived lexicon
    q["term_bloom_stats"] = {
        "spark": spark_term_bloom_stats,
        "sql": sql_term_bloom_stats(),
    }
    # distributed index fsck over the same artifact: all-zero
    # violations, examined counts re-derived relationally
    q["index_fsck"] = {
        "spark": spark_index_fsck,
        "sql": sql_index_fsck(),
    }
    # reference-corpus quality classifier (token-LLR, GPT-3-style)
    q["quality_classifier"] = {
        "spark": spark_quality_classifier,
        "sql": sql_quality_classifier(),
    }
    # CCNet line-level dedup over synthesized multi-line docs
    q["line_dedup"] = {
        "spark": spark_line_dedup,
        "sql": sql_line_dedup(),
    }
    # input_hint html:binary column -> extract_text byte-identity
    q["html_extract_e2e"] = {
        "spark": spark_html_extract_e2e,
        "sql": sql_html_extract_e2e(),
    }
    # curation: PII redaction + URL-level dedup (synthesized inputs)
    q["pii_redact"] = {"spark": spark_pii_redact, "sql": sql_pii_redact()}
    q["url_dedup"] = {"spark": spark_url_dedup, "sql": sql_url_dedup()}
    # multimodal plumbing: feature extraction + frame fan-out (fake
    # decoder; md5 hex-keystream is recomputed by the SQL twin)
    q["multimodal_features"] = {
        "spark": spark_multimodal_features,
        "sql": sql_multimodal_features(),
    }
    q["multimodal_frames"] = {
        "spark": spark_multimodal_frames,
        "sql": sql_multimodal_frames(),
    }
    q["winnow_fingerprints"] = {
        "spark": spark_winnow,
        "sql": sql_winnow_duckdb(),
    }
    # hash-checked since round 2: the md5-derived planes are engine-
    # independent, so DuckDB regenerates the identical LSH geometry
    # (pytest additionally asserts LSH ⊆ exact pairs)
    q["embedding_neardup_lsh"] = {
        "spark": spark_embedding_neardup_lsh,
        "sql": sql_embedding_neardup_lsh(),
    }
    # faithful BB bisection reorder: oracle checks the dense-permutation
    # contract; the locality objective is pytest-gated (see docstring)
    q["reorder_permutation"] = {
        "spark": spark_reorder_permutation,
        "sql": sql_reorder_permutation(),
    }
    # the prim-faithful outer levels, end-to-end on the same contract
    q["reorder_prim_permutation"] = {
        "spark": spark_reorder_prim_permutation,
        "sql": sql_reorder_permutation(),
    }
    return q


REGISTRY = _registry()


def queries():
    return {name: entry["spark"] for name, entry in REGISTRY.items()}


def oracle_sql():
    return {
        name: entry["sql"]
        for name, entry in REGISTRY.items()
        if entry["sql"] is not None
    }

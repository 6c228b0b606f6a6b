"""BM25 top-k query engine over the chunked inverted index.

Implements both reference query modes (SURVEY.md §2.3; semantics from
QueryExecution.cpp:283-457 — studied, not copied):

* conjunctive (DAAT AND): docs containing ALL query terms present in the
  lexicon (terms missing from the lexicon are dropped, matching the
  reference's ``openList`` skip).
* disjunctive (TAAT OR): union of per-term scored postings.

BM25: k1=1.2, b=0.75, idf = ln((N-df+0.5)/(df+0.5)) with NO clamp (idf
goes negative for df > N/2, reference quirk preserved), float32 outputs.

Physical plan (Spark path):
    lexicon lookup (parquet filter bucket+term — partition pruned)
    chunks scan (same pruning; row-group stats pruned via sorted term col)
    [conjunctive: chunk-level pruning — global doc-id window + rarest-term
     interval semi-join, the block-max/skip-pointer analogue of nextGEQ's
     last_doc_ids binary search (QueryExecution.cpp:122-147)]
    mapInPandas decode+score (numpy, Arrow-batched)
    groupBy(doc_id) agg  [conjunctive adds HAVING count == n_terms]
    ORDER BY score DESC, doc_id LIMIT k   (TakeOrderedAndProject)

A driver-local fast path (``search_local``) reads the same parquet via
pyarrow with predicate pushdown and scores in numpy — the interactive
"REPL" parity path with ~ms latency, no Spark job.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from . import codecs
from .build import term_bucket
from .runtime import ensure_shipped
from .tokenizer import tokenize_query

K1 = 1.2
B = 0.75


def bm25_scores(
    tf: np.ndarray, dl: np.ndarray, df: int, n_docs: int, avgdl: float
) -> np.ndarray:
    """Vectorized float32 BM25 (formula of QueryExecution.cpp:447-457)."""
    k1 = np.float32(K1)
    b = np.float32(B)
    tf32 = tf.astype(np.float32)
    dl32 = dl.astype(np.float32)
    K = (k1 * ((np.float32(1.0) - b) + b * dl32 / np.float32(avgdl))).astype(
        np.float32
    )
    idf = np.float32(
        np.log((np.float64(n_docs) - np.float64(df) + 0.5) / (np.float64(df) + 0.5))
    )
    return (idf * (k1 + np.float32(1.0)) * tf32 / (K + tf32)).astype(np.float32)


class QueryEngine:
    def __init__(self, spark, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        ensure_shipped(spark)
        row = spark.read.parquet(f"{index_dir}/stats").collect()[0]
        self.n_docs = int(row["n_docs"])
        self.avgdl = float(row["avgdl"])
        import json
        import os

        with open(os.path.join(index_dir, "_manifest.json")) as f:
            self.config = json.load(f)["config"]
        self.bucket_count = int(self.config["bucket_count"])

    # ------------------------------------------------------------ helpers

    def _buckets(self, terms: list[str]) -> list[int]:
        return sorted({term_bucket(t, self.bucket_count) for t in terms})

    def lexicon_lookup(self, terms: list[str]) -> dict[str, dict]:
        if not terms:
            return {}
        df = (
            self.spark.read.parquet(f"{self.index_dir}/lexicon")
            .where(F.col("bucket").isin(self._buckets(terms)))
            .where(F.col("term").isin(terms))
        )
        return {
            r["term"]: {
                "df": int(r["df"]),
                "n_chunks": int(r["n_chunks"]),
                "min_doc_id": int(r["min_doc_id"]),
                "max_doc_id": int(r["max_doc_id"]),
            }
            for r in df.collect()
        }

    def _chunks(self, terms: list[str]) -> DataFrame:
        return (
            self.spark.read.parquet(f"{self.index_dir}/chunks")
            .where(F.col("bucket").isin(self._buckets(terms)))
            .where(F.col("term").isin(terms))
        )

    def _scored_postings(
        self, chunks: DataFrame, lex: dict[str, dict]
    ) -> DataFrame:
        """Decode chunks and emit per-posting float32 BM25 scores."""
        n_docs, avgdl = self.n_docs, self.avgdl
        dfs = {t: e["df"] for t, e in lex.items()}

        def decode(batches):
            for pdf in batches:
                terms_out, ids_out, tfs_out, scores_out = [], [], [], []
                for term, codec_id, payload, dls in zip(
                    pdf["term"], pdf["codec"], pdf["payload"], pdf["dls"]
                ):
                    ids, tfs = codecs.decode_chunk(payload, int(codec_id))
                    dl = codecs.decode_lengths(dls)
                    s = bm25_scores(tfs, dl, dfs[term], n_docs, avgdl)
                    terms_out.append(np.repeat(term, len(ids)))
                    ids_out.append(ids.astype(np.int64))
                    tfs_out.append(tfs.astype(np.int64))
                    scores_out.append(s)
                if not ids_out:
                    continue
                yield pd.DataFrame(
                    {
                        "term": np.concatenate(terms_out),
                        "doc_id": np.concatenate(ids_out),
                        "tf": np.concatenate(tfs_out),
                        "score": np.concatenate(scores_out),
                    }
                )

        return chunks.select("term", "codec", "payload", "dls").mapInPandas(
            decode, "term string, doc_id long, tf long, score float"
        )

    # ------------------------------------------------------------- search

    def search(
        self, query: str, mode: str = "disjunctive", k: int = 10
    ) -> DataFrame:
        """Top-k (doc_id, score) DataFrame for one query."""
        terms = tokenize_query(query)
        lex = self.lexicon_lookup(terms)
        present = sorted(lex)
        empty = self.spark.createDataFrame([], "doc_id long, score float")
        if not present:
            return empty
        chunks = self._chunks(present)

        if mode == "conjunctive" and len(present) > 1:
            # global candidate window: every result doc id lies in the
            # intersection of all terms' [min_doc_id, max_doc_id]
            lo = max(e["min_doc_id"] for e in lex.values())
            hi = min(e["max_doc_id"] for e in lex.values())
            if lo > hi:
                return empty
            chunks = chunks.where(
                (F.col("last_doc_id") >= lo) & (F.col("first_doc_id") <= hi)
            )
            # rarest-term chunk intervals prune other terms' chunks
            # (block-max / skip-pointer analogue)
            pivot = min(present, key=lambda t: lex[t]["df"])
            if lex[pivot]["n_chunks"] <= 4096:
                ivals = (
                    chunks.where(F.col("term") == pivot)
                    .select(
                        F.col("first_doc_id").alias("lo"),
                        F.col("last_doc_id").alias("hi"),
                    )
                    .collect()
                )
                if not ivals:
                    return empty
                ivals_df = F.broadcast(
                    self.spark.createDataFrame(
                        [(r["lo"], r["hi"]) for r in ivals], "lo long, hi long"
                    )
                )
                others = chunks.where(F.col("term") != pivot).join(
                    ivals_df,
                    (F.col("last_doc_id") >= F.col("lo"))
                    & (F.col("first_doc_id") <= F.col("hi")),
                    "leftsemi",
                )
                chunks = chunks.where(F.col("term") == pivot).unionByName(others)

        scored = self._scored_postings(chunks, lex)
        agg = scored.groupBy("doc_id").agg(
            F.sum("score").cast("float").alias("score"),
            F.count("*").alias("_nt"),
        )
        if mode == "conjunctive":
            agg = agg.where(F.col("_nt") == len(present))
        return (
            agg.drop("_nt")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(k)
        )

    def batch_search(
        self, queries: list[tuple[int, str]], mode: str = "disjunctive", k: int = 10
    ) -> DataFrame:
        """Score MANY queries in one Spark job.

        Distinct terms are decoded/scored once, then a broadcast
        (query_id, term) map fans scored postings out to queries; per-query
        top-k via a window rank. Returns (query_id, doc_id, score, rank).
        """
        from pyspark.sql import Window

        qterms: list[tuple[int, str]] = []
        for qid, text in queries:
            for t in tokenize_query(text):
                qterms.append((qid, t))
        all_terms = sorted({t for _, t in qterms})
        lex = self.lexicon_lookup(all_terms)
        present = sorted(lex)
        empty = self.spark.createDataFrame(
            [], "query_id int, doc_id long, score float, rank int"
        )
        if not present:
            return empty
        qt = [(qid, t) for qid, t in qterms if t in lex]
        nq = {}
        for qid, _t in qt:
            nq[qid] = nq.get(qid, 0) + 1
        qt_df = F.broadcast(
            self.spark.createDataFrame(qt, "query_id int, term string")
        )
        nq_df = F.broadcast(
            self.spark.createDataFrame(
                list(nq.items()), "query_id int, n_terms int"
            )
        )
        scored = self._scored_postings(self._chunks(present), lex)
        per_q = (
            scored.join(qt_df, "term")
            .groupBy("query_id", "doc_id")
            .agg(
                F.sum("score").cast("float").alias("score"),
                F.count("*").alias("_nt"),
            )
        )
        if mode == "conjunctive":
            per_q = per_q.join(nq_df, "query_id").where(
                F.col("_nt") == F.col("n_terms")
            ).drop("n_terms")
        w = Window.partitionBy("query_id").orderBy(
            F.desc("score"), F.asc("doc_id")
        )
        return (
            per_q.drop("_nt")
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
        )

    # ------------------------------------------------- driver-local path

    def search_local(
        self, query: str, mode: str = "disjunctive", k: int = 10
    ) -> list[tuple[int, float]]:
        """Low-latency driver-side path: pyarrow predicate-pushdown scan of
        the same index parquet, numpy scoring. No Spark job."""
        import pyarrow.dataset as pads

        terms = tokenize_query(query)
        if not terms:
            return []
        ds = pads.dataset(
            f"{self.index_dir}/chunks", format="parquet", partitioning="hive"
        )
        buckets = self._buckets(terms)
        tbl = ds.to_table(
            filter=(
                pads.field("bucket").isin(buckets)
                & pads.field("term").isin(terms)
            ),
            columns=["term", "salt", "chunk_seq", "codec", "payload", "dls"],
        )
        per_term: dict[str, list] = {}
        rows = tbl.to_pylist()
        rows.sort(key=lambda r: (r["term"], r["salt"], r["chunk_seq"]))
        for r in rows:
            ids, tfs = codecs.decode_chunk(r["payload"], r["codec"])
            dls = codecs.decode_lengths(r["dls"])
            per_term.setdefault(r["term"], []).append((ids, tfs, dls))
        if not per_term:
            return []
        lists = {}
        for t, parts in per_term.items():
            ids = np.concatenate([p[0] for p in parts])
            tfs = np.concatenate([p[1] for p in parts])
            dls = np.concatenate([p[2] for p in parts])
            lists[t] = (ids, tfs, dls)
        present = sorted(lists)
        dfs = {t: len(lists[t][0]) for t in present}

        if mode == "conjunctive":
            cand = lists[present[0]][0]
            for t in present[1:]:
                cand = np.intersect1d(cand, lists[t][0], assume_unique=True)
                if len(cand) == 0:
                    return []
            total = np.zeros(len(cand), dtype=np.float32)
            for t in present:
                ids, tfs, dls = lists[t]
                pos = np.searchsorted(ids, cand)
                total = (
                    total
                    + bm25_scores(
                        tfs[pos], dls[pos], dfs[t], self.n_docs, self.avgdl
                    )
                ).astype(np.float32)
            doc_ids = cand
        else:
            all_ids = np.concatenate([lists[t][0] for t in present])
            doc_ids = np.unique(all_ids)
            total = np.zeros(len(doc_ids), dtype=np.float32)
            for t in present:
                ids, tfs, dls = lists[t]
                s = bm25_scores(tfs, dls, dfs[t], self.n_docs, self.avgdl)
                pos = np.searchsorted(doc_ids, ids)
                total[pos] = (total[pos] + s).astype(np.float32)

        order = np.lexsort((doc_ids, -total.astype(np.float64)))[:k]
        return [(int(doc_ids[i]), float(total[i])) for i in order]

    # ----------------------------------------------------------- snippets

    def snippets(
        self, query: str, topk: DataFrame, window: int = 100, max_segments: int = 5
    ) -> DataFrame:
        """Join top-k docs back to the doc table and extract ±window-char
        segments around term matches, merging overlaps (reference Q11
        semantics, QueryExecution.cpp:500-549)."""
        terms = tokenize_query(query)
        doc_table = self.spark.read.parquet(f"{self.index_dir}/doc_table")
        joined = doc_table.join(F.broadcast(topk), "doc_id")

        from pyspark.sql.functions import pandas_udf
        from pyspark.sql.types import ArrayType, StringType

        @pandas_udf(ArrayType(StringType()))
        def snip(texts: pd.Series) -> pd.Series:
            out = []
            for text in texts:
                text = text or ""
                spans = []
                for t in terms:
                    start = 0
                    while True:
                        i = text.find(t, start)
                        if i < 0:
                            break
                        spans.append((max(0, i - window), min(len(text), i + len(t) + window)))
                        start = i + len(t)
                spans.sort()
                merged: list[list] = []
                for lo, hi in spans:
                    if merged and lo <= merged[-1][1]:
                        merged[-1][1] = max(merged[-1][1], hi)
                        merged[-1][2] += 1
                    else:
                        merged.append([lo, hi, 1])
                merged.sort(key=lambda m: -m[2])
                out.append([text[lo:hi] for lo, hi, _ in merged[:max_segments]])
            return pd.Series(out)

        return joined.select(
            "doc_id", "score", "url", snip("text").alias("snippets")
        )

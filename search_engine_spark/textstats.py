"""Text-analysis operators for training-data curation.

All scalar logic stays JVM-side (built-in functions / higher-order
array expressions) except winnowing, which is a numpy-vectorized
pandas UDF (rolling hashes over char arrays don't decompose into
Catalyst expressions without a per-position explode).

Determinism: regexes are portable (same semantics in Java regex and
DuckDB's RE2 for the classes used); rolling hashes are fixed-base
polynomial mod 2^31-1 over ASCII-stripped text, so oracles reproduce
them exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from .tokenizer import tokenize_col

# GPT-2-ish coarse token classes: letter runs, single digits,
# non-alnum-non-space runs (portable subset: no lookarounds).
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]+"

ROLL_BASE = 257
ROLL_MOD = (1 << 31) - 1
ROLL_K = 8
WINNOW_W = 4

STOPWORDS = ("the", "a", "of", "and", "to", "in")


def language_id(docs: DataFrame, ascii_threshold: float = 0.9) -> DataFrame:
    """n-gram-free heuristic language ID: ratio of [a-z ] chars.

    (A real system plugs a fastText-style model in as a pandas UDF; the
    heuristic keeps the operator JVM-side and oracle-reproducible.)
    """
    stripped = F.regexp_replace("text", "[^a-z ]", "")
    ratio = F.length(stripped).cast("double") / F.nullif(
        F.length("text"), F.lit(0)
    )
    return docs.select(
        "doc_id",
        F.round(ratio, 4).alias("ascii_ratio"),
        F.when(ratio > ascii_threshold, "en").otherwise("other").alias(
            "lang_pred"
        ),
    )


def quality_score(docs: DataFrame, stopwords=STOPWORDS) -> DataFrame:
    """Per-doc curation signals: token count, mean token length,
    stop-word ratio (reference tokenizer semantics)."""

    t = docs.select(
        "doc_id", F.explode(tokenize_col(F.col("text"))).alias("term")
    )
    is_stop = F.when(F.col("term").isin(*stopwords), 1).otherwise(0)
    return t.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.round(F.avg(F.length("term")), 4).alias("avg_token_len"),
        F.round(F.avg(is_stop.cast("double")), 4).alias("stopword_ratio"),
    )


def lm_score(docs: DataFrame) -> DataFrame:
    """Unigram-LM cross-entropy per doc — the distributed analog of
    CCNet's KenLM-perplexity quality bucket (Wenzek et al. 2020): fit
    p(t) = corpus_tf(t) / total_tokens on the corpus itself, then
    score each doc by the mean surprisal of its token occurrences,
    ``lm_score = sum_t tf_d(t) * -ln p(t) / len(d)``. Low = built
    from common corpus vocabulary (head-like text), high = rare-token
    docs (gibberish, boilerplate codes, wrong-language) — the standard
    tails-both-ways filter signal. No reference counterpart
    (LLM-pipeline extension).

    Returns (doc_id, n_tokens, lm_score) for docs with >= 1 token
    (same convention as :func:`quality_score`; p > 0 always because
    the LM is fit on the corpus being scored). Plan at 10^12 docs:
    per-(doc, term) tf (one shuffle, map-side combinable) is persisted
    and feeds both the corpus-tf aggregation (term-keyed shuffle) and
    the scoring join; the scalar total joins back as a broadcast, so
    nothing is collected driver-side and the vocabulary table is never
    broadcast (web vocabularies exceed broadcast limits — the term
    join is a shuffle join AQE can skew-split on stop-word terms)."""
    from pyspark import StorageLevel

    tok = docs.select(
        "doc_id", F.explode(tokenize_col(F.col("text"))).alias("term")
    )
    tf = (
        tok.groupBy("doc_id", "term")
        .agg(F.count("*").alias("_tf"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ctf = tf.groupBy("term").agg(F.sum("_tf").alias("_ctf"))
    total = ctf.agg(F.sum("_ctf").alias("_total"))
    surprisal = -F.log(F.col("_ctf").cast("double") / F.col("_total"))
    return (
        tf.join(ctf, "term")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.sum("_tf").cast("long").alias("n_tokens"),
            F.round(
                F.sum(F.col("_tf") * surprisal) / F.sum("_tf"), 4
            ).alias("lm_score"),
        )
    )


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace tokens + BPE-ish subword-class tokens per doc."""
    ws = F.size(F.split(F.trim("text"), "\\s+"))
    bpe = F.size(
        F.regexp_extract_all("text", F.lit(BPE_ISH_PATTERN), F.lit(0))
    )
    return docs.select(
        "doc_id",
        F.when(F.length(F.trim("text")) == 0, 0)
        .otherwise(ws)
        .cast("long")
        .alias("ws_tokens"),
        bpe.cast("long").alias("bpe_ish_tokens"),
    )


def rolling_hashes(text: str, k: int = ROLL_K) -> np.ndarray:
    """All k-gram polynomial rolling hashes of ASCII-printable-stripped
    text: h(i) = sum(ord(c[i+j]) * BASE^(k-1-j)) mod (2^31-1)."""
    cleaned = "".join(ch for ch in text if " " <= ch <= "~")
    b = np.frombuffer(cleaned.encode("ascii"), dtype=np.uint8)
    if len(b) < k:
        return np.empty(0, dtype=np.int64)
    powers = np.array(
        [pow(ROLL_BASE, k - 1 - j, ROLL_MOD) for j in range(k)], dtype=np.int64
    )
    win = np.lib.stride_tricks.sliding_window_view(b.astype(np.int64), k)
    return (win * powers).sum(axis=1) % ROLL_MOD


def winnow(hashes: np.ndarray, w: int = WINNOW_W) -> np.ndarray:
    """Winnowing (Schleimer/Wilkerson/Aiken): minimum hash of every
    w-window, rightmost on ties, deduped consecutively. Returns the
    selected fingerprint hashes in document order."""
    if len(hashes) == 0:
        return hashes
    if len(hashes) <= w:
        return np.array([hashes.min()], dtype=np.int64)
    win = np.lib.stride_tricks.sliding_window_view(hashes, w)
    # rightmost min: reverse argmin trick
    idx = w - 1 - np.argmin(win[:, ::-1], axis=1) + np.arange(len(win))
    sel = hashes[idx]
    keep = np.empty(len(idx), dtype=bool)
    keep[0] = True
    keep[1:] = idx[1:] != idx[:-1]
    return sel[keep]


def winnow_fingerprints(
    docs: DataFrame, k: int = ROLL_K, w: int = WINNOW_W
) -> DataFrame:
    """(doc_id, n_fingerprints, fingerprint_min, fingerprint_xor):
    winnowed rolling-hash document sketch, numpy inside mapInPandas."""

    def run(batches):
        for pdf in batches:
            ids, n, mn, xr = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                fps = winnow(rolling_hashes(text or "", k), w)
                ids.append(doc_id)
                n.append(len(fps))
                mn.append(int(fps.min()) if len(fps) else -1)
                x = 0
                for v in fps:
                    x ^= int(v)
                xr.append(x)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_fingerprints": n,
                    "fingerprint_min": mn,
                    "fingerprint_xor": xr,
                }
            )

    return docs.select("doc_id", "text").mapInPandas(
        run,
        "doc_id long, n_fingerprints long, fingerprint_min long, "
        "fingerprint_xor long",
    )


def rolling_min_hash(docs: DataFrame, k: int = ROLL_K) -> DataFrame:
    """(doc_id, n_grams, min_hash): min k-gram rolling hash per doc —
    the SQL-expressible projection of the rolling-hash sketch (oracle
    pairs with a reduce()-based DuckDB query)."""

    def run(batches):
        for pdf in batches:
            ids, n, mn = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                h = rolling_hashes(text or "", k)
                ids.append(doc_id)
                n.append(len(h))
                mn.append(int(h.min()) if len(h) else -1)
            yield pd.DataFrame({"doc_id": ids, "n_grams": n, "min_hash": mn})

    return docs.select("doc_id", "text").mapInPandas(
        run, "doc_id long, n_grams long, min_hash long"
    )


# ------------------------------------------------------- curation ops
# Three corpus-curation operators a web-scale training pipeline runs
# between dedup and tokenization (Gopher/C4-style rule filtering,
# domain accounting, language rebalancing). All three are pure JVM
# expression trees (whole-stage codegen, no Python workers) and each
# has a hash-checked DuckDB oracle in contract.py.

SAMPLE_BUCKETS = 65536  # 4 md5 hex chars -> bucket in [0, 65536)


def _hex_bucket(prefix: str, id_col: str = "doc_id"):
    """Deterministic bucket in [0, SAMPLE_BUCKETS): the first 4 hex
    chars of md5('<prefix>|' || id) parsed base-16 — pure column
    expressions, so an arbitrary ``prefix``/``id_col`` value can never
    break parsing the way the old SQL-string interpolation could (a
    seed_tag containing a quote was a ParseException). Values are
    unchanged: hex-parse of 4 chars == the old per-nibble decode, and
    DuckDB oracles regenerate the identical bucket."""
    h = F.md5(F.concat(F.lit(prefix + "|"), F.col(id_col).cast("string")))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("int")


def repetition_ratio(docs: DataFrame, n: int = 3) -> DataFrame:
    """Gopher-style repetition signal: fraction of word n-grams that
    are repeats of an earlier n-gram in the same doc.

    (doc_id, n_grams, n_distinct, dup_ratio) where dup_ratio =
    1 - n_distinct/n_grams (0.0 for docs shorter than n tokens).
    Array-valued higher-order expressions only — map-only, no shuffle,
    no Python; at 100 TB this is a single codegen'd scan."""
    toks = tokenize_col(F.col("text"))
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + F.lit(j + 1)) for j in range(n)]
        ),
    )
    grams = F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )
    n_grams = F.size(grams).cast("long")
    n_distinct = F.size(F.array_distinct(grams)).cast("long")
    ratio = F.when(
        n_grams > 0,
        F.round(
            F.lit(1.0) - n_distinct.cast("double") / n_grams.cast("double"), 4
        ),
    ).otherwise(F.lit(0.0))
    return docs.select(
        "doc_id",
        n_grams.alias("n_grams"),
        n_distinct.alias("n_distinct"),
        ratio.alias("dup_ratio"),
    )


def source_stats(docs: DataFrame) -> DataFrame:
    """Per-source (per-domain) curation accounting: doc count, char
    mass, mean doc length, distinct languages, mean whitespace-token
    count. One hash-agg over the corpus — map-side partials, ~|sources|
    result rows; the frame a curation pipeline joins its keep/drop
    rules against."""
    ws = F.when(F.length(F.trim("text")) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim("text"), "\\s+"))
    )
    return docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.round(F.avg(ws.cast("double")), 4).alias("avg_ws_tokens"),
    )


def stratified_sample(
    docs: DataFrame, strat_col: str = "lang", seed_tag: str = "sample"
) -> DataFrame:
    """Deterministic language-rebalancing sampler: downsample every
    stratum to the size of the SMALLEST stratum, by hash bucket (no
    RNG — the kept set is a pure function of ids, so re-runs and
    resumed builds keep identical rows).

    keep iff bucket(doc_id) < floor(min_count/count * 65536): the
    smallest stratum keeps everything, a stratum 4x the smallest keeps
    ~1/4. Two passes over the corpus (count agg, then filter) — the
    counts agg is map-side-combinable and its result (one row per
    stratum) broadcasts back, so no corpus-sized shuffle anywhere."""
    cnt = docs.groupBy(strat_col).agg(
        F.count("*").cast("double").alias("_cnt")
    )
    mn = cnt.agg(F.min("_cnt").alias("_min"))
    thr = cnt.crossJoin(F.broadcast(mn)).select(
        strat_col,
        F.floor(F.col("_min") / F.col("_cnt") * SAMPLE_BUCKETS)
        .cast("long")
        .alias("_thr"),
    )
    bucket = _hex_bucket(seed_tag)
    return (
        docs.join(F.broadcast(thr), strat_col)
        .where(bucket < F.col("_thr"))
        .select("doc_id", strat_col)
    )


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    strat_col: str = "lang",
    seed_tag: str = "mix",
) -> DataFrame:
    """Token-budget mixture sampling — the training-data mixing step
    (The-Pile/Llama-style domain weights): deterministically sample
    docs so each group's sampled TOKEN mass approaches
    ``token_budget * weight``, capped by availability (a group with
    less mass than its target keeps everything — the standard
    without-replacement mixing rule; weights are normalized, groups
    absent from ``weights`` drop).

    Keep rule: bucket(doc_id) < floor(min(1, target/available) *
    65536) with the same portable md5 bucket as
    :func:`stratified_sample` — no RNG, so re-runs and resumed
    pipelines keep identical rows and the DuckDB oracle regenerates
    the exact kept set. Token mass = whitespace tokens (the
    tokenizer-independent proxy; swap the mass expression for real
    tokenizer counts when available).

    Plan: one map-side-combinable group agg (|groups| rows), the
    per-group threshold broadcasts back, then a map-only filter — no
    corpus-sized shuffle anywhere, the same 100 TB shape as
    stratified_sample. Returns (doc_id, <strat_col>, tokens) of kept
    docs.
    """
    if token_budget <= 0:
        raise ValueError(f"token_budget must be positive, got {token_budget}")
    wsum = float(sum(weights.values()))
    if not weights or wsum <= 0:
        raise ValueError("weights must contain at least one positive weight")
    # coalesce FIRST: trim(NULL) is NULL, which would fall through the
    # when() to a NULL token count (the oracle maps NULL text to 0)
    txt = F.trim(F.coalesce(F.col("text"), F.lit("")))
    ws = F.when(F.length(txt) == 0, F.lit(0)).otherwise(
        F.size(F.split(txt, "\\s+"))
    )
    toks = docs.select(
        "doc_id", strat_col, ws.cast("long").alias("tokens")
    )
    spark = docs.sparkSession
    targets = spark.createDataFrame(
        [(g, token_budget * w / wsum) for g, w in sorted(weights.items())],
        f"{strat_col} string, _target double",
    )
    avail = toks.groupBy(strat_col).agg(
        F.sum("tokens").cast("double").alias("_avail")
    )
    thr = (
        avail.join(F.broadcast(targets), strat_col)
        .select(
            strat_col,
            F.floor(
                F.least(F.lit(1.0), F.col("_target") / F.col("_avail"))
                * SAMPLE_BUCKETS
            )
            .cast("long")
            .alias("_thr"),
        )
    )
    bucket = _hex_bucket(seed_tag)
    return (
        toks.join(F.broadcast(thr), strat_col)
        .where(bucket < F.col("_thr"))
        .select("doc_id", strat_col, "tokens")
    )


# -------------------------------------------------- PII / URL curation
# Portable regexes only (identical semantics in Java regex and DuckDB's
# RE2 for these linear, lookaround-free patterns), so the contract
# oracles reproduce redaction and normalization byte-for-byte.

EMAIL_RX = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RX = "\\+?[0-9][0-9()\\- ]{7,}[0-9]"


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails then phone-like numbers: (doc_id, text, n_emails,
    n_phones), with matches replaced by ``<EMAIL>`` / ``<PHONE>``.

    Map-only JVM regex ops — a single codegen'd scan at any corpus
    size. Phones are counted on the email-redacted text (order is part
    of the contract: an email's digits can never double-count as a
    phone). The redaction tokens contain no digits/alnum runs, so the
    two passes can't interfere."""
    raw = F.col(text_col)
    red1 = F.regexp_replace(raw, EMAIL_RX, "<EMAIL>")
    n_emails = F.size(F.regexp_extract_all(raw, F.lit(EMAIL_RX), F.lit(0)))
    red2 = F.regexp_replace(red1, PHONE_RX, "<PHONE>")
    n_phones = F.size(F.regexp_extract_all(red1, F.lit(PHONE_RX), F.lit(0)))
    return docs.select(
        "doc_id",
        red2.alias("text"),
        n_emails.cast("long").alias("n_emails"),
        n_phones.cast("long").alias("n_phones"),
    )


def normalize_url(col):
    """Canonical url Column: fragment stripped, scheme+authority
    lowercased, DEFAULT port dropped (:80 only for http, :443 only
    for https — a non-default port like http://h:443 is a distinct
    origin and must NOT collapse), trailing slash trimmed. Pure JVM
    expressions (regexp_replace / regexp_extract / substr) —
    composable into any scan."""
    u = F.regexp_replace(col, "#.*$", "")
    head = F.regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0)
    u = F.concat(F.lower(head), u.substr(F.length(head) + 1, F.length(u)))
    u = F.regexp_replace(u, "^(http://[^/:?#]+):80([/?#]|$)", "$1$2")
    u = F.regexp_replace(u, "^(https://[^/:?#]+):443([/?#]|$)", "$1$2")
    return F.regexp_replace(u, "/$", "")


def url_dedup(docs: DataFrame, url_col: str = "url") -> DataFrame:
    """URL-level dedup groups (the first curation pass of a crawl
    pipeline, upstream of content dedup): one hash-agg keyed on the
    normalized url — (url_norm, n_docs, keep_doc_id) with the
    deterministic min-doc_id survivor. Map-side partial agg; shuffle
    carries one row per distinct url, never the corpus."""
    return (
        docs.select(normalize_url(F.col(url_col)).alias("url_norm"), "doc_id")
        .groupBy("url_norm")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").cast("long").alias("keep_doc_id"),
        )
    )


def pack_sequences(
    docs: DataFrame, seq_len: int = 2048, n_shards: int = 8
) -> DataFrame:
    """GPT-style concatenate-and-chop sequence packing: the last step
    of a pretraining pipeline, mapping curated documents into the
    fixed-length training sequences the dataloader actually consumes.

    Docs hash into ``n_shards`` independent token streams
    (deterministic md5 bucket of doc_id — the same portable idiom as
    :func:`stratified_sample`); within a shard docs concatenate in
    doc_id order with ONE separator (EOS) token appended per doc, and
    the stream chops into ``seq_len``-token sequences. Output: one row
    per (document, sequence) overlap —

    (shard, seq_id, doc_id, seq_start, doc_start, n_tok)

    where ``seq_id`` counts sequences within the shard, ``seq_start``
    is the slice's offset inside the sequence, ``doc_start`` the
    offset inside the doc's own (tokens + EOS) stream, and ``n_tok``
    the slice length — enough for a writer to materialize every
    sequence by gathering doc slices, and for a loss mask to find the
    EOS/document boundaries.

    Plan shape at 10^12 docs: ONE shuffle (the per-shard cumulative
    window; doc_id is unique so the frame is deterministic), then a
    codegen explode bounded by len/seq_len + 1 rows per doc. Shards
    are independent streams, so parallelism == n_shards: pick ~2^20
    shards at crawl scale and each window partition holds ~10^6 docs
    and maps 1:1 to an output training file. No reference counterpart
    (LLM-pipeline extension)."""
    from pyspark.sql import Window

    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    L = int(seq_len)
    shard = (
        F.conv(
            F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15),
            16,
            10,
        ).cast("long")
        % n_shards
    ).cast("int")
    sz = docs.select(
        "doc_id",
        shard.alias("shard"),
        (F.size(tokenize_col(F.col("text"))) + 1).cast("long").alias("sz"),
    )
    w = Window.partitionBy("shard").orderBy("doc_id")
    spans = sz.select(
        "shard",
        "doc_id",
        (F.sum("sz").over(w) - F.col("sz")).alias("start"),
        F.sum("sz").over(w).alias("end"),
    )
    seq = F.col("seq_id")
    lo = F.floor(F.col("start") / L).cast("long")
    hi = F.floor((F.col("end") - 1) / L).cast("long")
    cut = F.greatest(F.col("start"), seq * L)
    return (
        spans.select(
            "shard",
            "doc_id",
            "start",
            "end",
            F.explode(F.sequence(lo, hi)).alias("seq_id"),
        )
        .select(
            "shard",
            "seq_id",
            "doc_id",
            (cut - seq * L).cast("int").alias("seq_start"),
            (cut - F.col("start")).cast("long").alias("doc_start"),
            (F.least(F.col("end"), (seq + 1) * L) - cut)
            .cast("int")
            .alias("n_tok"),
        )
    )


def quality_classifier(
    docs: DataFrame,
    pos: DataFrame,
    neg: DataFrame,
    smoothing: float = 0.5,
) -> DataFrame:
    """Reference-corpus quality classifier — the GPT-3/CCNet-style
    token log-likelihood-ratio filter (Brown et al. 2020 appendix A
    train a classifier scoring docs by similarity to a curated
    positive corpus vs a crawl background; the closed-form token-LLR
    Naive-Bayes variant here is deterministic and engine-independent).
    Complements :func:`lm_score`: that ranks docs by corpus-fit
    surprisal with no notion of "good", this separates docs that look
    like a curated POSITIVE reference (wikipedia/books) from a
    NEGATIVE background (raw crawl). No reference counterpart
    (LLM-pipeline extension).

    Fit: add-``smoothing`` token counts over the two reference sets,
    vocabulary V = vocab(pos) ∪ vocab(neg),
    ``P(t|C) = (tf_C(t) + s) / (total_C + s·|V|)``,
    ``llr(t) = ln P(t|pos) − ln P(t|neg)``.
    Score: ``llr_d = Σ_t tf_d(t)·llr(t) / len(d)`` — out-of-vocabulary
    tokens contribute 0 but count in the length (an all-OOV doc is
    neutral, not positive). Returns (doc_id, n_tokens, llr, keep)
    for docs with >= 1 token, ``keep = llr > 0``.

    Plan at 10^12 docs: reference class counts are term-keyed aggs
    over the (small, curated) reference sets; the corpus pays one
    per-(doc, term) tf shuffle (map-side combinable) and one term-
    keyed join against the vocabulary LLR table — a shuffle join AQE
    can skew-split (web vocabularies exceed broadcast limits, same
    rationale as lm_score); scalars (totals, |V|) fold into the llr
    column before the join. Nothing corpus-sized is collected or
    broadcast."""

    def _class_tf(ref: DataFrame, name: str) -> DataFrame:
        return (
            ref.select(F.explode(tokenize_col(F.col("text"))).alias("term"))
            .groupBy("term")
            .agg(F.count("*").cast("double").alias(name))
        )

    vocab = _class_tf(pos, "_cp").join(
        _class_tf(neg, "_cn"), "term", "full_outer"
    ).select(
        "term",
        F.coalesce("_cp", F.lit(0.0)).alias("_cp"),
        F.coalesce("_cn", F.lit(0.0)).alias("_cn"),
    )
    tot = vocab.agg(
        F.count(F.lit(1)).cast("double").alias("_v"),
        F.sum("_cp").alias("_tp"),
        F.sum("_cn").alias("_tn"),
    )
    s = float(smoothing)
    llr = F.log(
        (F.col("_cp") + F.lit(s)) / (F.col("_tp") + F.lit(s) * F.col("_v"))
    ) - F.log(
        (F.col("_cn") + F.lit(s)) / (F.col("_tn") + F.lit(s) * F.col("_v"))
    )
    # the three scalars ride along as a broadcast single row — the
    # whole fit stays one lazy plan, nothing collected driver-side
    vocab_llr = vocab.crossJoin(F.broadcast(tot)).select(
        "term", llr.alias("_llr")
    )
    tf = (
        docs.select(
            "doc_id", F.explode(tokenize_col(F.col("text"))).alias("term")
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("_tf"))
    )
    # + 0.0 normalizes IEEE negative zero (an all-OOV or perfectly
    # balanced doc can round to -0.0 in one engine and 0.0 in another;
    # they compare equal but stringify differently in hash gates)
    score = (
        F.round(
            F.sum(F.col("_tf") * F.coalesce("_llr", F.lit(0.0)))
            / F.sum("_tf"),
            4,
        )
        + F.lit(0.0)
    )
    return (
        tf.join(vocab_llr, "term", "left")
        .groupBy("doc_id")
        .agg(
            F.sum("_tf").cast("long").alias("n_tokens"),
            score.alias("llr"),
        )
        .withColumn("keep", F.col("llr") > 0)
    )

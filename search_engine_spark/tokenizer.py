"""Tokenization with the reference engine's exact delimiter semantics.

Two distinct delimiter sets (an asymmetry the reference ships, reproduced
faithfully — semantics derived from /root/reference/component/HTMLParser.cpp:16-28,66-122
and query_process/QueryExecution.cpp:36-37,264-281):

* INDEX side: 29 ASCII delimiters (includes ``@!#%><|~``) plus 20
  multi-byte unicode delimiter characters. NOTE the quirk: ``$`` appears in
  the reference's *unicode* delimiter set but is a single-byte char, so the
  unicode branch never fires for it — ``$`` is therefore NOT a delimiter,
  and we match that.
* QUERY side: only 21 ASCII delimiters (no ``@!#%><|~``), no unicode
  handling (multi-byte chars pass through into terms).

No lowercasing, no stemming, no stop-words. ``doc_length`` is the TOKEN
COUNT, not byte length (HTMLParser.cpp:79). Query terms are DEDUPED; the
reference uses an unordered_set (nondeterministic order) — we canonicalize
to sorted order for deterministic float accumulation.

The hot path is a vectorized pandas str pipeline (regex replace -> strip ->
split) inside an Arrow-batched pandas UDF — no per-row Python beyond list
construction pandas itself performs.
"""

from __future__ import annotations

import re

import pandas as pd

INDEX_ASCII_DELIMS = " ,.;:?[]{}()-/+*&^\"'@!#%><|~\n"
QUERY_ASCII_DELIMS = " ,.;:?[]{}()-/+*&^\"'\n"
# '$' intentionally absent (see module docstring).
UNICODE_DELIMS = "，。（）·～？》《｜、；：「」【】“’"

_INDEX_CLASS = "[" + re.escape(INDEX_ASCII_DELIMS + UNICODE_DELIMS) + "]+"
_QUERY_CLASS = "[" + re.escape(QUERY_ASCII_DELIMS) + "]+"
_INDEX_RE = re.compile(_INDEX_CLASS)
_QUERY_RE = re.compile(_QUERY_CLASS)


def tokenize_text(text: str) -> list[str]:
    """Pure-Python index-side tokenizer (oracle / driver-side use)."""
    if not text:
        return []
    return [t for t in _INDEX_RE.split(text) if t]


def tokenize_query(query: str) -> list[str]:
    """Query-side tokenizer + dedup, canonical sorted order."""
    if not query:
        return []
    return sorted({t for t in _QUERY_RE.split(query) if t})


def tokenize_series(texts: pd.Series) -> pd.Series:
    """Vectorized index tokenization of a pandas Series -> Series[list[str]].

    Collapses delimiter runs to a single space, strips, splits — equivalent
    to the reference scan loop for valid UTF-8 input, but executed through
    pandas' C string kernels.
    """
    s = texts.fillna("")
    s = s.str.replace(_INDEX_CLASS, " ", regex=True).str.strip()
    out = s.str.split(" ")
    # rows that were empty/all-delims become [''] after split; fix to [].
    empty = s.str.len() == 0
    if empty.any():
        out = out.where(~empty, other=pd.Series([[]] * int(empty.sum()), index=s.index[empty]))
    return out


def register_udfs():
    """Return (tokenize_udf,) — created lazily so importing this module
    does not require an active SparkSession."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    @pandas_udf(ArrayType(StringType()))
    def tokenize_udf(texts: pd.Series) -> pd.Series:
        return tokenize_series(texts)

    return tokenize_udf

"""search_engine_spark — a PySpark-native full-text search / analytics engine.

A from-scratch rebuild of the capabilities of the reference single-node C++
search engine (inverted-index build + BM25 top-k query, see SURVEY.md), plus
the large-scale training-data pipeline operators (dedup, similarity search,
text analysis) a 100 TB corpus pipeline needs.

Architecture is Spark-first: DataFrame/SQL plans optimized by Catalyst,
vectorized Arrow/pandas UDFs only where built-ins cannot express the
semantics (posting-list codecs, chunk encode/decode), explicit
partitioning/salting for skew, broadcast joins for small dimensions.
"""

__version__ = "0.1.0"

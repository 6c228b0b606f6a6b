#!/usr/bin/env python
"""Export a built index to the reference engine's on-disk format, or
verify a previously exported one by reading it back.

    python tools/export_reference_index.py export <index_dir> <out_dir>
    python tools/export_reference_index.py verify <index_dir> <ref_dir>

``export`` writes ``inverted_index.bin`` (u32-prefixed binary blocks,
InvertedListBuilder.cpp:232-298 layout) and ``lexicon.txt`` (text
``term block_cursor chunk_offset length`` lines, LexiconBuilder.cpp:
114-123) into <out_dir>. ``verify`` re-reads <ref_dir> lexicon-first
and asserts every term's postings match a fresh decode of the Spark
index's chunks stage.
"""

from __future__ import annotations

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from search_engine_spark import interchange
    from search_engine_spark.runtime import get_spark

    if len(sys.argv) != 4 or sys.argv[1] not in ("export", "verify"):
        print(__doc__, file=sys.stderr)
        return 2
    cmd, index_dir, ref_dir = sys.argv[1:4]
    spark = get_spark(master="local[4]")
    try:
        if cmd == "export":
            stats = interchange.export_index(spark, index_dir, ref_dir)
            print(stats)
            return 0
        loaded = interchange.load_reference_index(ref_dir)
        n_bad = 0
        for term, ids, tfs in interchange._iter_term_postings(
            spark, index_dir
        ):
            got = loaded.get(term)
            if (
                got is None
                or not np.array_equal(got[0], ids.astype(np.int64))
                or not np.array_equal(got[1], tfs.astype(np.int64))
            ):
                n_bad += 1
                print(f"MISMATCH {term}", file=sys.stderr)
        print(f"{len(loaded)} terms, {n_bad} mismatches")
        return 1 if n_bad else 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())

"""Pure-Python oracle re-implementing the reference engine's semantics.

No Spark. Used by the pytest suite as ground truth for rank-identity
(SURVEY.md §5.4): index a corpus the way the reference does
(single-threaded, doc order), then answer conjunctive/disjunctive BM25
top-k with the same float32 scoring (QueryExecution.cpp:283-457) and
deterministic tie-breaks (score desc, doc_id asc — the canonicalization
of the reference's unstable heap, SURVEY.md §7 risk 1).

Also provides the reference's GLOBAL 128-aligned chunking
(InvertedListBuilder.cpp:250-259) for byte-layout parity tests against a
``n_salts=1`` Spark build.
"""

from __future__ import annotations

import numpy as np

from . import codecs
from .query import bm25_scores
from .tokenizer import tokenize_query, tokenize_text


class OracleIndex:
    def __init__(self, docs: list[tuple[int, str]]):
        """docs: (doc_id, text), any order; indexed in doc_id order like the
        reference's sequential file order."""
        self.doc_lengths: dict[int, int] = {}
        postings: dict[str, dict[int, int]] = {}
        for doc_id, text in sorted(docs):
            terms = tokenize_text(text)
            self.doc_lengths[doc_id] = len(terms)
            for t in terms:
                postings.setdefault(t, {})
                postings[t][doc_id] = postings[t].get(doc_id, 0) + 1
        self.postings: dict[str, list[tuple[int, int]]] = {
            t: sorted(d.items()) for t, d in postings.items()
        }
        self.n_docs = len(self.doc_lengths)
        self.avgdl = (
            sum(self.doc_lengths.values()) / self.n_docs if self.n_docs else 0.0
        )

    # reference lexicon df == total posting count of the term
    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))

    def chunks(self, term: str, chunk_length: int = codecs.CHUNK_LENGTH):
        """Reference global chunking: consecutive 128-posting chunks of the
        full doc-id-sorted list, with encoded payloads."""
        plist = self.postings.get(term, [])
        out = []
        for start in range(0, len(plist), chunk_length):
            part = plist[start : start + chunk_length]
            ids = np.array([d for d, _ in part], dtype=np.uint64)
            tfs = np.array([t for _, t in part], dtype=np.uint64)
            codec_id, payload = codecs.encode_chunk(ids, tfs)
            out.append(
                {
                    "chunk_seq": start // chunk_length,
                    "first_doc_id": int(ids[0]),
                    "last_doc_id": int(ids[-1]),
                    "n": len(ids),
                    "codec": codec_id,
                    "payload": payload,
                }
            )
        return out

    def score(self, term: str, doc_id: int, tf: int) -> np.float32:
        return bm25_scores(
            np.array([tf]),
            np.array([self.doc_lengths[doc_id]]),
            self.df(term),
            self.n_docs,
            self.avgdl,
        )[0]

    def topk(
        self, query: str, mode: str = "disjunctive", k: int = 10
    ) -> list[tuple[int, float]]:
        terms = [t for t in tokenize_query(query) if t in self.postings]
        if not terms:
            return []
        acc: dict[int, np.float32] = {}
        if mode == "conjunctive":
            doc_sets = [set(d for d, _ in self.postings[t]) for t in terms]
            cand = set.intersection(*doc_sets)
            for t in terms:  # sorted term order = canonical accumulation
                for d, tf in self.postings[t]:
                    if d in cand:
                        acc[d] = np.float32(
                            acc.get(d, np.float32(0.0)) + self.score(t, d, tf)
                        )
        else:
            for t in terms:
                for d, tf in self.postings[t]:
                    acc[d] = np.float32(
                        acc.get(d, np.float32(0.0)) + self.score(t, d, tf)
                    )
        ranked = sorted(acc.items(), key=lambda kv: (-float(kv[1]), kv[0]))
        return [(d, float(s)) for d, s in ranked[:k]]

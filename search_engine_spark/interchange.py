"""Artifact-level interchange with the reference's on-disk index format.

Round 3 delivered the C7 byte-layout codecs (codecs.py:520-655,
golden-vector tested); this module wires them into the actual
ARTIFACTS, so an index built by this engine can be handed to the
reference engine's loader and vice versa:

* ``export_index`` streams a built index's chunks stage into the
  reference's single-file block layout — the exact write loop of
  ``InvertedListBuilder::dump_output_block`` (InvertedListBuilder.cpp:
  232-298, studied not copied): per block a u32 LE header size, the
  binary block header (varbyte block_size/chunk_count/
  last_chunk_length + delta_v2 cumulative chunk offsets + varbyte
  last_doc_ids), then the body of 128-posting chunks each encoded as
  delta_v2(doc_ids) + bit_packing(frequencies)
  (BlockBinaryEncoder::encode_chunk, BlockEncoder.cpp:110-114) — plus
  the whitespace-text lexicon ``term block_cursor chunk_offset
  length`` per line (LexiconEncoder::dump, LexiconBuilder.cpp:114-123).
* ``load_reference_index`` reads those artifacts back lexicon-first
  (the reference reader's access path: seek to ``block_cursor``,
  start at ``chunk_offset``, read chunks until ``length`` postings),
  reconstructing every term's full posting list.

Scale note: the reference format is a SINGLE sequential file — an
inherently single-writer artifact. The export therefore streams
through ``toLocalIterator`` in (term, salt, chunk_seq) order (driver
memory stays bounded by one block buffer, Spark never collects the
index), and the artifact itself — not the exporter — is the scale
ceiling. At 100 TB you keep the parquet/Iceberg layout and export only
for interchange with reference tooling.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np

from . import codecs

INDEX_FILE = "inverted_index.bin"
LEXICON_FILE = "lexicon.txt"

# reference out_buf_size_ analog: flush a block once it holds this many
# postings (the reference flushes on a byte budget; a posting count is
# equivalent up to codec ratio and keeps the test path deterministic)
BLOCK_POSTINGS_LIMIT = 1 << 18


class _BlockWriter:
    """Sequential block writer, mirroring dump_output_block's cursor
    arithmetic (InvertedListBuilder.cpp:268-298): a block is
    u32(header_size) + header + body; ``cursor`` tracks the file
    offset so lexicon entries can record their block's start."""

    def __init__(self, fd, chunk_length: int):
        self.fd = fd
        self.chunk_length = chunk_length
        self.cursor = 0

    def write_block(
        self, postings: list[tuple[str, np.ndarray, np.ndarray]]
    ) -> list[tuple[str, int, int, int]]:
        """Write one block of whole posting lists; returns lexicon
        entries (term, block_cursor, chunk_offset, length)."""
        body = bytearray()
        offsets: list[int] = []
        lasts: list[int] = []
        chunk_count = 0
        last_chunk_length = 0
        entries: list[tuple[str, int, int, int]] = []
        for term, ids, tfs in postings:
            if len(ids) == 0:
                continue
            entries.append((term, self.cursor, chunk_count, len(ids)))
            for s in range(0, len(ids), self.chunk_length):
                e = min(s + self.chunk_length, len(ids))
                codecs.delta_encode_v2(ids[s:e].astype(np.uint64), body)
                codecs.bit_packing(tfs[s:e].astype(np.uint64), body)
                last_chunk_length = e - s
                chunk_count += 1
                offsets.append(len(body))
                lasts.append(int(ids[e - 1]))
        if not entries:
            return []
        header = bytearray()
        codecs.encode_block_header(
            len(body),
            last_chunk_length,
            np.asarray(offsets, dtype=np.uint64),
            np.asarray(lasts, dtype=np.uint64),
            header,
        )
        self.fd.write(len(header).to_bytes(4, "little"))
        self.fd.write(header)
        self.fd.write(body)
        self.cursor += 4 + len(header) + len(body)
        return entries


def _iter_term_postings(
    spark, index_dir: str
) -> Iterator[tuple[str, np.ndarray, np.ndarray]]:
    """Stream (term, doc_ids, tfs) in sorted term order from the chunks
    stage; salts are contiguous doc-id ranges, so (salt, chunk_seq)
    order concatenates into the globally doc-id-sorted list."""
    from .build import read_stage_parquet

    rows = (
        read_stage_parquet(spark, f"{index_dir}/chunks", "chunks")
        .select("term", "salt", "chunk_seq", "codec", "payload")
        .orderBy("term", "salt", "chunk_seq")
        .toLocalIterator()
    )
    cur_term: str | None = None
    ids_parts: list[np.ndarray] = []
    tf_parts: list[np.ndarray] = []
    for r in rows:
        if r["term"] != cur_term:
            if cur_term is not None:
                yield (
                    cur_term,
                    np.concatenate(ids_parts),
                    np.concatenate(tf_parts),
                )
            cur_term = r["term"]
            ids_parts, tf_parts = [], []
        ids, tfs = codecs.decode_chunk(r["payload"], r["codec"])
        ids_parts.append(ids)
        tf_parts.append(tfs)
    if cur_term is not None:
        yield cur_term, np.concatenate(ids_parts), np.concatenate(tf_parts)


def export_index(
    spark,
    index_dir: str,
    out_dir: str,
    chunk_length: int | None = None,
    block_postings_limit: int = BLOCK_POSTINGS_LIMIT,
) -> dict:
    """Build artifacts in the reference's on-disk format from a built
    index; returns {"terms": n, "blocks": n, "postings": n}."""
    import json

    os.makedirs(out_dir, exist_ok=True)
    if chunk_length is None:
        with open(os.path.join(index_dir, "_manifest.json")) as f:
            chunk_length = int(
                json.load(f)["config"].get("chunk_length")
                or codecs.CHUNK_LENGTH
            )
    # the reference's final format encodes doc-id gaps as Simple9
    # (<= 28 bits); our engine stores larger gaps via the varbyte
    # fallback codec. Refuse BEFORE writing a single byte — the old
    # behavior crashed mid-export with a raw OverflowError, leaving a
    # truncated inverted_index.bin and no lexicon.
    from pyspark.sql import functions as F

    from .build import read_stage_parquet as _rsp

    n_fallback = (
        _rsp(spark, os.path.join(index_dir, "chunks"), "chunks")
        .where(F.col("codec") == codecs.CODEC_VB_FALLBACK)
        .limit(1)
        .count()
    )
    if n_fallback:
        raise ValueError(
            "index contains varbyte-fallback chunks (doc-id gaps over "
            "28 bits); the reference's Simple9-only block format cannot "
            "represent them — reorder/re-id the corpus first"
        )
    n_terms = n_blocks = n_postings = 0
    # lexicon lines stream straight to disk: holding every term's line
    # in a driver list would grow with the vocabulary, contradicting
    # the bounded-driver-memory contract
    with open(os.path.join(out_dir, INDEX_FILE), "wb") as fd, open(
        os.path.join(out_dir, LEXICON_FILE), "w"
    ) as lex_f:
        writer = _BlockWriter(fd, chunk_length)
        buf: list[tuple[str, np.ndarray, np.ndarray]] = []
        buffered = 0

        def flush():
            nonlocal buffered, n_blocks
            if not buf:
                return
            for term, cursor, chunk_off, length in writer.write_block(buf):
                # reference lexicon line (LexiconEncoder::dump,
                # LexiconBuilder.cpp:114-123)
                lex_f.write(f"{term} {cursor} {chunk_off} {length}\n")
            n_blocks += 1
            buf.clear()
            buffered = 0

        for term, ids, tfs in _iter_term_postings(spark, index_dir):
            buf.append((term, ids, tfs))
            buffered += len(ids)
            n_terms += 1
            n_postings += len(ids)
            if buffered >= block_postings_limit:
                flush()
        flush()
    return {"terms": n_terms, "blocks": n_blocks, "postings": n_postings}


def _read_blocks(data: bytes) -> list[tuple[int, dict, int]]:
    """All (block_cursor, header, body_start) in file order."""
    blocks = []
    pos = 0
    n = len(data)
    while pos < n:
        hs = int.from_bytes(data[pos : pos + 4], "little")
        header, hdr_end = codecs.decode_block_header(data, pos + 4)
        if hdr_end - (pos + 4) != hs:
            raise ValueError(
                f"block header at {pos}: declared size {hs}, "
                f"decoded {hdr_end - (pos + 4)}"
            )
        body_start = pos + 4 + hs
        blocks.append((pos, header, body_start))
        pos = body_start + int(header["block_size"])
    return blocks


def load_reference_index(
    src_dir: str,
) -> dict[str, tuple[np.ndarray, np.ndarray]]:
    """Read reference-format artifacts back: term -> (doc_ids, tfs).

    Lexicon-driven, like the reference reader: each entry seeks to its
    ``block_cursor``, skips to ``chunk_offset`` within the block, and
    decodes consecutive chunks until ``length`` postings are read —
    exercising every header field rather than just scanning the body.
    """
    with open(os.path.join(src_dir, INDEX_FILE), "rb") as f:
        data = f.read()
    blocks = {cur: (hdr, body) for cur, hdr, body in _read_blocks(data)}
    out: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    with open(os.path.join(src_dir, LEXICON_FILE)) as f:
        for line in f:
            parts = line.split()
            if not parts:
                continue
            term, cursor, chunk_off, length = (
                parts[0],
                int(parts[1]),
                int(parts[2]),
                int(parts[3]),
            )
            header, body_start = blocks[cursor]
            offsets = np.asarray(header["chunk_offsets"], dtype=np.int64)
            ids_parts: list[np.ndarray] = []
            tf_parts: list[np.ndarray] = []
            got = 0
            ci = chunk_off
            while got < length:
                c_start = body_start + (int(offsets[ci - 1]) if ci else 0)
                ids, pos2 = codecs.delta_decode_v2(data, c_start)
                tfs, pos2 = codecs.bit_packing_decode(data, pos2)
                if pos2 - body_start != int(offsets[ci]):
                    raise ValueError(
                        f"chunk {ci} of {term!r}: decoded past its offset"
                    )
                ids_parts.append(ids)
                tf_parts.append(tfs)
                got += len(ids)
                ci += 1
            if got != length:
                raise ValueError(
                    f"{term!r}: lexicon length {length}, decoded {got}"
                )
            out[term] = (
                np.concatenate(ids_parts).astype(np.int64),
                np.concatenate(tf_parts).astype(np.int64),
            )
    return out

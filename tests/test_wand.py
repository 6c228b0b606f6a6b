"""Block-max WAND unit tests: bound soundness + sweep machinery.

The segment sweep must (a) cover every doc exactly once, (b) produce a
true upper bound of any doc's total score inside each segment, for both
modes and for negative-idf terms. Verified against a brute-force oracle
over random synthetic posting lists (no Spark)."""

import numpy as np
import pytest

from search_engine_spark import codecs, wand


def _random_corpus(rng, n_terms=5, n_docs=400, avgdl=50.0):
    """Random per-term posting lists + per-chunk metadata (chunk length
    deliberately small to create many chunks)."""
    terms = {}
    for j in range(n_terms):
        n_post = int(rng.integers(5, n_docs))
        ids = np.sort(rng.choice(n_docs, size=n_post, replace=False))
        tfs = rng.integers(1, 20, size=n_post).astype(np.uint64)
        dls = rng.integers(5, 200, size=n_post).astype(np.uint64)
        terms[f"t{j}"] = (ids.astype(np.int64), tfs, dls)
    return terms


def _metas(terms, idfs, avgdl, chunk_len=16):
    metas = {}
    for t, (ids, tfs, dls) in terms.items():
        starts = np.arange(0, len(ids), chunk_len)
        ends = np.append(starts[1:], len(ids))
        maxr, minr = wand.ratio_bounds(tfs, dls, starts, avgdl)
        metas[t] = wand.TermChunks(
            first=ids[starts],
            last=ids[ends - 1],
            n=ends - starts,
            bound=wand.term_chunk_bounds(idfs[t], maxr, minr),
            rows=np.arange(len(starts)),
        )
    return metas


@pytest.mark.parametrize("conjunctive", [False, True])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_segment_bounds_sound(conjunctive, seed):
    rng = np.random.default_rng(seed)
    n_docs, avgdl = 400, 50.0
    terms = _random_corpus(rng, n_docs=n_docs, avgdl=avgdl)
    # dfs chosen so some idfs go NEGATIVE (df > N/2 reference quirk)
    idfs = {t: wand.idf(len(v[0]), n_docs) for t, v in terms.items()}
    metas = _metas(terms, idfs, avgdl)
    seg_lo, seg_hi, bound, cover = wand.sweep_segments(metas, conjunctive)

    # exact per-doc scores (float64 is fine for soundness checking)
    scores = {}
    member = {}
    for t, (ids, tfs, dls) in terms.items():
        k = wand.K1 * ((1 - wand.B) + wand.B * dls.astype(float) / avgdl)
        s = idfs[t] * (wand.K1 + 1) * tfs / (k + tfs)
        for d, sc in zip(ids.tolist(), s.tolist()):
            scores[d] = scores.get(d, 0.0) + sc
            member.setdefault(d, set()).add(t)
    if conjunctive:
        full = {d for d, m in member.items() if len(m) == len(terms)}
        scores = {d: s for d, s in scores.items() if d in full}

    # every scoring doc lies in exactly one returned segment, and the
    # segment's bound dominates its total score
    seg_of = {}
    for d in scores:
        hits = np.flatnonzero((seg_lo <= d) & (d < seg_hi))
        assert len(hits) == 1, d
        seg_of[d] = hits[0]
    for d, s in scores.items():
        assert s <= bound[seg_of[d]] + 1e-12, (d, s, bound[seg_of[d]])


def test_cover_points_to_containing_chunk():
    rng = np.random.default_rng(3)
    terms = _random_corpus(rng)
    idfs = {t: 1.0 for t in terms}
    metas = _metas(terms, idfs, 50.0)
    seg_lo, seg_hi, _b, cover = wand.sweep_segments(metas, False)
    names = sorted(metas)
    for j, t in enumerate(names):
        m = metas[t]
        for si in range(len(seg_lo)):
            ci = cover[si, j]
            if ci >= 0:
                assert m.first[ci] <= seg_lo[si]
                assert m.last[ci] >= seg_hi[si] - 1
            else:  # no chunk of t intersects the segment
                inside = (m.first < seg_hi[si]) & (m.last >= seg_lo[si])
                assert not inside.any()


def test_merge_intervals_and_membership():
    lo = np.array([5, 1, 6, 20])
    hi = np.array([8, 3, 10, 25])
    mlo, mhi = wand.merge_intervals(lo, hi)
    assert mlo.tolist() == [1, 5, 20]
    assert mhi.tolist() == [3, 10, 25]
    ids = np.array([0, 1, 2, 3, 7, 9, 10, 19, 20, 24, 25])
    mask = wand.ids_in_intervals(ids, mlo, mhi)
    assert mask.tolist() == [
        False, True, True, False, True, True, False, False, True, True, False,
    ]


def test_ratio_bounds_vs_per_posting():
    rng = np.random.default_rng(4)
    tfs = rng.integers(1, 30, size=100).astype(np.uint64)
    dls = rng.integers(1, 300, size=100).astype(np.uint64)
    starts = np.array([0, 40, 90])
    maxr, minr = wand.ratio_bounds(tfs, dls, starts, avgdl=75.0)
    k = wand.K1 * ((1 - wand.B) + wand.B * dls.astype(float) / 75.0)
    r = tfs / (k + tfs)
    for c, (s, e) in enumerate([(0, 40), (40, 90), (90, 100)]):
        assert maxr[c] == r[s:e].max()
        assert minr[c] == r[s:e].min()


def test_encode_chunk_batch_matches_single():
    """Batched codec byte-identity vs per-chunk encode_chunk (includes
    fallback + single-posting chunks)."""
    rng = np.random.default_rng(5)
    idsl, tfsl, starts, pos = [], [], [], 0
    for L in rng.integers(1, 129, size=30):
        scale = int(rng.choice([3, 50, 10**5, 1 << 29]))
        ids = np.cumsum(rng.integers(1, scale, size=L)).astype(np.uint64)
        idsl.append(ids)
        tfsl.append(rng.integers(1, 2000, size=L).astype(np.uint64))
        starts.append(pos)
        pos += int(L)
    ids = np.concatenate(idsl)
    tfs = np.concatenate(tfsl)
    codec_b, payload_b = codecs.encode_chunk_batch(ids, tfs, np.array(starts))
    for c, (i, t) in enumerate(zip(idsl, tfsl)):
        codec, payload = codecs.encode_chunk(i, t)
        assert codec == codec_b[c]
        assert payload == payload_b[c]
        di, dt = codecs.decode_chunk(payload_b[c], codec_b[c])
        assert di.tolist() == i.tolist() and dt.tolist() == t.tolist()


def test_conjunctive_margin_scales_with_gross_magnitude():
    """Near-cancelling conjunctive bounds (+5.0 rare term, -4.9999
    stop word): the safety margin must scale with the GROSS per-term
    magnitude (~10), not the tiny net bound (~1e-4), or float32
    scoring error (~1e-7 * 5) exceeds it and pruning can drop a true
    top-k doc."""
    metas = {
        "rare": wand.TermChunks(
            first=[0], last=[99], n=[10],
            bound=np.array([5.0]), rows=[(0, 0)],
        ),
        "the": wand.TermChunks(
            first=[0], last=[99], n=[100],
            bound=np.array([-4.9999]), rows=[(0, 0)],
        ),
    }
    lo, hi, bound, cover = wand.sweep_segments(metas, conjunctive=True)
    assert len(bound) == 1
    net = 5.0 - 4.9999
    # margin covers the float32 error of the large magnitudes
    assert bound[0] >= net + wand.BOUND_MARGIN * 9.99
    # disjunctive unchanged: negative bound clamps to 0, gross == net
    lo, hi, bound_d, cover = wand.sweep_segments(metas, conjunctive=False)
    assert bound_d[0] == pytest.approx(5.0 * (1 + wand.BOUND_MARGIN), rel=1e-9)

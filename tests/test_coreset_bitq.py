"""Numpy mirrors for the twenty-first-sitting embedding ops: greedy
k-center selection and binary-quantization Hamming search.  The SQL
oracle mirror (test_entry_queries) checks both against DuckDB at
sf0.001; these tests additionally pin the *algorithms* against
brute-force numpy replays on the same data, so a future refactor
can't drift inside a round-trip that happens to match SQL."""

import os
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from rayrank import ann

SF_DIR = "/root/testdata/sf0.001"


def _codes():
    t = pq.read_table(
        os.path.join(SF_DIR, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
    )
    ids = t.column("vec_id").to_numpy()
    m = ann._emb_matrix64(t, "embedding")
    lo, hi = m.min(axis=0), m.max(axis=0)
    codes = np.minimum(
        np.floor((m - lo) * ann.SQ_LEVELS / (hi - lo)), ann.SQ_LEVELS
    ).astype(np.int64)
    return ids, codes


def test_kcenter_matches_bruteforce_greedy():
    ids, codes = _codes()
    order = np.argsort(ids)
    ids, codes = ids[order], codes[order]

    sel = [0]  # min vec_id is 0 in the testdata
    dists = [(1, int(ids[0]), 0)]
    mind = ((codes - codes[sel[0]]) ** 2).sum(axis=1)
    for rnk in range(2, ann.KC_K + 1):
        mask = ~np.isin(np.arange(len(ids)), sel)
        cand = np.flatnonzero(mask)
        best = cand[np.lexsort((ids[cand], -mind[cand]))[0]]
        dists.append((rnk, int(ids[best]), int(mind[best])))
        sel.append(best)
        mind = np.minimum(mind, ((codes - codes[best]) ** 2).sum(axis=1))

    got = [
        (r["rnk"], r["vec_id"], r["dist"])
        for r in ann.kcenter_coreset(SF_DIR).take_all()
    ]
    assert got == dists


def test_bitq_hamming_matches_bruteforce():
    ids, codes = _codes()
    qi = int(np.argmin(ids))
    bits = (codes >= 128).astype(np.int64)
    ham = (bits != bits[qi]).sum(axis=1)
    keep = ids != ids[qi]
    kid, kham = ids[keep], ham[keep]
    order = np.lexsort((kid, kham))[: ann.BITQ_K]
    want = [
        (i + 1, int(kid[o]), int(kham[o])) for i, o in enumerate(order)
    ]
    got = [
        (r["rn"], r["vec_id"], r["hamming"])
        for r in ann.bitq_hamming_topk(SF_DIR).take_all()
    ]
    assert got == want


def test_popcount_helper_values():
    # popcount via unpackbits must agree with Python's int.bit_count,
    # including negative int64 words (two's-complement bytes).
    xs = np.array(
        [0, 1, -1, 2**62, -(2**62), 123456789, -987654321], np.int64
    )
    want = [int(x) & 0xFFFFFFFFFFFFFFFF for x in xs]
    want = [bin(w).count("1") for w in want]
    got = np.unpackbits(
        xs.view(np.uint8).reshape(len(xs), 8), axis=1
    ).sum(axis=1)
    assert got.tolist() == want


def test_ppr_push_conserves_mass_exactly():
    from rayrank import push

    rows = push.ppr_push(SF_DIR).take_all()
    total = sum(int(r["p_mass"]) + int(r["r_mass"]) for r in rows)
    assert total == push.PUSH_SCALE  # exact integer conservation
    seed = min(r["name"] for r in rows)
    top = max(rows, key=lambda r: r["p_mass"])
    assert top["name"] == seed  # most mass settles at the seed

def test_pq_adc_matches_bruteforce():
    ids, codes = _codes()
    order = np.argsort(ids)
    ids, codes = ids[order], codes[order]
    sub = codes.shape[1] // ann.PQ_M

    cw = []
    for s in range(ann.PQ_M):
        sc = codes[:, s * sub:(s + 1) * sub]
        sel = [0]  # min vec_id seed
        mind = ((sc - sc[0]) ** 2).sum(axis=1)
        for _ in range(2, ann.PQ_K + 1):
            cand = np.flatnonzero(~np.isin(np.arange(len(ids)), sel))
            best = cand[np.lexsort((ids[cand], -mind[cand]))[0]]
            sel.append(best)
            mind = np.minimum(mind, ((sc - sc[best]) ** 2).sum(axis=1))
        cw.append(sc[np.asarray(sel)])

    adc = np.zeros(len(ids), np.int64)
    for s in range(ann.PQ_M):
        sc = codes[:, s * sub:(s + 1) * sub]
        dj = ((sc[:, None, :] - cw[s][None, :, :]) ** 2).sum(axis=2)
        code_s = np.argmin(dj, axis=1)  # ties -> lowest codeword rank
        lut = ((cw[s] - sc[0]) ** 2).sum(axis=1)
        adc += lut[code_s]

    keep = ids != ids[0]
    kid, kadc = ids[keep], adc[keep]
    o = np.lexsort((kid, kadc))[: ann.PQ_TOPK]
    want = [(i + 1, int(kid[x]), int(kadc[x])) for i, x in enumerate(o)]
    got = [
        (r["rn"], r["vec_id"], r["adc"])
        for r in ann.pq_adc_topk(SF_DIR).take_all()
    ]
    assert got == want

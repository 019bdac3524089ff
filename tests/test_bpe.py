"""BPE merge-kernel tests: the greedy left-to-right non-overlapping
replace rule (str.replace semantics on the token stream), doc-boundary
isolation, and run handling when a == b."""

import numpy as np

from rayrank.terms import _bpe_apply_merge


def apply(tokens, docs, a, b):
    v, d = _bpe_apply_merge(
        np.array(tokens, dtype=object), np.array(docs, np.int64), a, b
    )
    return list(v), list(d)


def test_simple_pair():
    v, d = apply(["a", "b", "c"], [1, 1, 1], "a", "b")
    assert v == ["a~b", "c"] and d == [1, 1]


def test_equal_pair_run_greedy():
    # "x x x x" -> (x x)(x x); "x x x" -> (x x) x
    assert apply(["x"] * 4, [1] * 4, "x", "x")[0] == ["x~x", "x~x"]
    assert apply(["x"] * 3, [1] * 3, "x", "x")[0] == ["x~x", "x"]


def test_alternating_all_merge():
    v, _ = apply(["a", "b", "a", "b"], [1] * 4, "a", "b")
    assert v == ["a~b", "a~b"]


def test_doc_boundary_blocks_merge():
    v, d = apply(["a", "b"], [1, 2], "a", "b")
    assert v == ["a", "b"] and d == [1, 2]


def test_mirror_str_replace():
    # property: kernel == str.replace on the double-spaced join
    rng = np.random.default_rng(5)
    for _ in range(50):
        toks = [str(x) for x in rng.integers(0, 3, 12)]
        a, b = str(rng.integers(0, 3)), str(rng.integers(0, 3))
        got, _ = apply(toks, [1] * len(toks), a, b)
        s = " " + "  ".join(toks) + " "
        s = s.replace(f" {a}  {b} ", f" {a}~{b} ")
        want = s.split()
        assert got == want, (toks, a, b, got, want)

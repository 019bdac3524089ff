"""Heavy-hitter tests: exact parity with a Python Counter on zipf
data, block-layout invariance, candidate-superset property, and the
empty-result edge."""

import math
from collections import Counter

import numpy as np
import pytest
import ray.data

from rayrank.heavy import heavy_hitters


def python_hh(vals, phi):
    n = len(vals)
    th = math.ceil(phi * n)
    return {v: c for v, c in Counter(vals).items() if c >= th}


def engine_hh(vals, phi, blocks=7):
    ds = ray.data.from_items([{"x": v} for v in vals], override_num_blocks=blocks)
    return {r["value"]: r["cnt"] for r in heavy_hitters(ds, "x", phi).take_all()}


@pytest.mark.parametrize("seed,a", [(1, 1.3), (2, 2.0)])
def test_zipf_matches_counter(seed, a):
    rng = np.random.default_rng(seed)
    vals = [f"v{z}" for z in rng.zipf(a, 5000)]
    phi = 0.015625  # 1/64
    assert engine_hh(vals, phi) == python_hh(vals, phi)


def test_block_layout_invariant():
    rng = np.random.default_rng(5)
    vals = [f"v{z}" for z in rng.zipf(1.5, 3000)]
    phi = 0.03125
    outs = [engine_hh(vals, phi, blocks=b) for b in (1, 4, 19)]
    assert outs[0] == outs[1] == outs[2] == python_hh(vals, phi)


def test_uniform_none_qualify():
    vals = [f"u{i}" for i in range(2000)]  # all counts 1
    assert engine_hh(vals, 0.0078125) == {}


def test_single_dominant_value():
    vals = ["hot"] * 900 + [f"c{i}" for i in range(100)]
    got = engine_hh(vals, 0.5)
    assert got == {"hot": 900}


def test_threshold_boundary():
    # count exactly == ceil(phi*N) must be included
    vals = ["a"] * 25 + ["b"] * 24 + ["z"] * 51
    phi = 0.25  # N=100 -> thresh 25
    got = engine_hh(vals, phi)
    assert got == {"a": 25, "z": 51}


def test_int_column():
    vals = [1] * 50 + [2] * 10 + list(range(100, 140))
    got = engine_hh(vals, 0.25)
    assert got == {1: 50}

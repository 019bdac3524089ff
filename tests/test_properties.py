"""Property-based (hypothesis) tests for the pure numeric kernels the
whole engine leans on: the splitmix64 hash chain, exact bit_length,
and segmented aranges.  These are the primitives every SQL-oracle
match depends on, so they get adversarial inputs, not just fixtures."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rayrank.sketch import _bit_length_u64, splitmix64

U64 = st.integers(min_value=0, max_value=(1 << 64) - 1)


def _splitmix64_scalar(x: int) -> int:
    """Straight-line pure-Python splitmix64 (Steele et al. 2014)."""
    z = (x + 0x9E3779B97F4A7C15) % (1 << 64)
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) % (1 << 64)
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) % (1 << 64)
    return z ^ (z >> 31)


@settings(max_examples=300, deadline=None)
@given(st.lists(U64, min_size=1, max_size=50))
def test_splitmix64_matches_scalar_reference(xs):
    got = splitmix64(np.array(xs, dtype=np.uint64))
    want = np.array([_splitmix64_scalar(x) for x in xs], np.uint64)
    assert (got == want).all()


@settings(max_examples=200, deadline=None)
@given(st.lists(U64, min_size=1, max_size=50))
def test_bit_length_matches_python(xs):
    got = _bit_length_u64(np.array(xs, dtype=np.uint64))
    want = np.array([int(x).bit_length() for x in xs], np.int64)
    assert (got == want).all()


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=20),
                min_size=1, max_size=30))
def test_seg_arange_is_concatenated_aranges(lens):
    from rayrank.pipelines import _seg_arange

    got = _seg_arange(np.array(lens, np.int64))
    want = np.concatenate(
        [np.arange(n, dtype=np.int64) for n in lens]
    ) if sum(lens) else np.empty(0, np.int64)
    assert (got == want).all() and got.dtype == np.int64

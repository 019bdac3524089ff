"""The PPJoin+-style suffix-filter prune inside the jaccard verify
phase must be RESULT-INVISIBLE: it only discards candidate pairs whose
overlap provably cannot reach the threshold, so the emitted pair set is
identical at every probe count (0 probes == the r4 positional-bound
behavior; soundness of the bound itself is property-tested in
tests/test_ragged.py, and the measured pruned fraction / verify-wall
cut is recorded in BASELINE.md round 5)."""

import pytest

SF = "/root/testdata/sf0.001"


def _rows(ds):
    return sorted(
        (
            (r["doc_a"], r["doc_b"], r["inter_size"], r["union_size"])
            for r in ds.take_all()
        )
    )


@pytest.mark.parametrize("probes", [0, 1, 16])
def test_suffix_filter_result_invisible(ray_session, monkeypatch, probes):
    import rayrank.text as tx

    base = _rows(tx.jaccard_join_pairs(SF))
    assert base, "fixture must produce pairs or the test is vacuous"
    monkeypatch.setattr(tx, "JJ_SUFFIX_PROBES", probes)
    assert _rows(tx.jaccard_join_pairs(SF)) == base

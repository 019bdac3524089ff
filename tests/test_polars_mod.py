"""polars_mod() torn-module repair (no Ray needed).

A Ray worker task cancelled mid-``import polars`` leaves partially
initialized module state in ``sys.modules`` for the worker's lifetime.
Observed twice in-sandbox: top-level ``polars`` missing ``Series``, and
— with the top level looking whole — the ``polars._reexport`` submodule
missing ``DataFrame`` (SF=10 ingest).  polars_mod() must detect both
via its functional probe and repair by purge + fresh import, without
changing the pinned xxhash values (vid layouts depend on them).
"""

import sys

import rayrank


def _hash_x(pl):
    return pl.DataFrame({"a": ["x"]}).select(pl.col("a").hash(0)).to_series()[0]


def test_healthy_path_cached():
    pl1 = rayrank.polars_mod()
    pl2 = rayrank.polars_mod()
    assert pl1 is pl2


def test_torn_submodule_repaired_and_hash_stable():
    pl = rayrank.polars_mod()
    before = _hash_x(pl)

    rayrank._POLARS_VERIFIED = None
    import polars._reexport as rx

    saved = rx.DataFrame
    try:
        del rx.DataFrame
        pl2 = rayrank.polars_mod()
        assert _hash_x(pl2) == before
        import polars._reexport as rx2

        assert hasattr(rx2, "DataFrame")
    finally:
        # the repair replaced the module wholesale; nothing to restore,
        # but guard against a failed repair leaving the tear in place
        if "polars._reexport" in sys.modules and not hasattr(
            sys.modules["polars._reexport"], "DataFrame"
        ):
            sys.modules["polars._reexport"].DataFrame = saved


def test_torn_top_level_repaired():
    pl = rayrank.polars_mod()
    before = _hash_x(pl)

    rayrank._POLARS_VERIFIED = None
    saved = pl.DataFrame
    try:
        del pl.DataFrame
        pl2 = rayrank.polars_mod()
        assert _hash_x(pl2) == before
    finally:
        if not hasattr(sys.modules.get("polars", pl), "DataFrame"):
            sys.modules["polars"].DataFrame = saved

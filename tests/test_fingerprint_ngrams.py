"""table_fingerprint order-invariance + shared_ngram_lengths properties
(exactness vs DuckDB is covered by test_entry_queries)."""

import duckdb
import numpy as np

SF = "/root/testdata/sf0.001"


def test_table_fingerprint_matches_out_of_order_mirror():
    from rayrank.pipelines import table_fingerprint
    from rayrank.sketch import splitmix64

    out = {r["tbl"]: r for r in table_fingerprint(SF).to_pylist()}
    con = duckdb.connect()
    # recompute lineitem's checksum from a DIFFERENT row order: the
    # abelian fold must not care.
    df = con.sql(
        f"SELECT l_orderkey, l_linenumber, l_extendedprice FROM "
        f"read_parquet('{SF}/lineitem.parquet') ORDER BY l_partkey, l_orderkey"
    ).df()
    z = splitmix64(df["l_orderkey"].to_numpy().astype(np.int64).view(np.uint64))
    z = splitmix64(z ^ df["l_linenumber"].to_numpy().astype(np.int64).view(np.uint64))
    cents = np.rint(df["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    z = splitmix64(z ^ cents.view(np.uint64))
    with np.errstate(over="ignore"):
        total = int(np.sum(z, dtype=np.uint64))
    assert out["lineitem"]["checksum"] == str(total)
    assert out["lineitem"]["n_rows"] == len(df)
    assert set(out) == {"customer", "events", "lineitem", "orders", "part"}


def test_shared_ngram_lengths_properties():
    from rayrank.terms import SHARED_NGRAM_NMAX, shared_ngram_lengths

    t = shared_ngram_lengths(SF)
    rows = {r["n"]: r["dup_grams"] for r in t.to_pylist()}
    assert sorted(rows) == list(range(1, SHARED_NGRAM_NMAX + 1))
    # existence is monotone: a duplicated n-gram's (n-1)-prefix is
    # duplicated too, so zero at n-1 forces zero at n.
    for n in range(2, SHARED_NGRAM_NMAX + 1):
        if rows[n] > 0:
            assert rows[n - 1] > 0
    assert rows[1] > 0  # 31-token vocab, 500 docs: unigrams certainly shared


def test_partition_profile_totals():
    from rayrank.pipelines import PARTQ, partition_profile

    rows = partition_profile(SF).take_all()
    assert len(rows) == PARTQ
    con = duckdb.connect()
    nv, ne = con.sql(
        f"""
        WITH e AS (SELECT DISTINCT l_orderkey s, l_partkey d
                   FROM read_parquet('{SF}/lineitem.parquet'))
        SELECT (SELECT COUNT(*) FROM (SELECT DISTINCT v FROM
                 (SELECT s AS v FROM e UNION ALL SELECT d FROM e))),
               (SELECT COUNT(*) FROM e)
        """
    ).fetchone()
    assert sum(r["n_vertices"] for r in rows) == nv
    assert sum(r["n_src_edges"] for r in rows) == ne
    for r in rows:
        assert 0 <= r["n_cut_edges"] <= r["n_src_edges"]


def test_value_ecdf_monotone():
    from rayrank.analytics import value_ecdf

    rows = value_ecdf(SF).take_all()
    n = len(rows)
    by_v = sorted(rows, key=lambda r: (r["value_cents"], r["n_le"]))
    last = 0
    for r in by_v:
        assert r["n_le"] >= last
        last = r["n_le"]
    assert max(r["n_le"] for r in rows) == n
    assert min(r["n_le"] for r in rows) >= 1

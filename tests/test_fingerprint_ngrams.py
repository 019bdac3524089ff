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

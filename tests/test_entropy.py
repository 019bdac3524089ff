"""Python mirror for doc_char_entropy: the quantized-ln per-document
character entropy must equal a per-row Counter replay (the SQL oracle
mirror in test_entry_queries checks the same op against DuckDB)."""

import math
import os
import sys
from collections import Counter

import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))

from rayrank import terms

SF_DIR = "/root/testdata/sf0.001"
_WS = "\t\n\f\r "


def test_doc_char_entropy_python_mirror():
    t = pq.read_table(
        os.path.join(SF_DIR, "documents.parquet"), columns=["doc_id", "text"]
    )
    want = {}
    for did, txt in zip(
        t.column("doc_id").to_pylist(), t.column("text").to_pylist()
    ):
        c = Counter(ch for ch in txt if ch not in _WS)
        n = sum(c.values())
        if n == 0:
            continue
        s = sum(v * math.floor(1e9 * math.log(v)) for v in c.values())
        want[did] = (n, n * math.floor(1e9 * math.log(n)) - s)
    got = {
        r["doc_id"]: (r["n_chars"], r["ent_q"])
        for r in terms.doc_char_entropy(SF_DIR).take_all()
    }
    assert got == want

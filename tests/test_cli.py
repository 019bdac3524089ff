"""Reference-parity CLI: same flags, same report format, golden values
(reference README small-graph run; FIXTURES.md §1)."""

import csv
import gzip
import logging


def test_cli_small_graph(tmp_path, caplog):
    csv_path = str(tmp_path / "small.csv.gz")
    with gzip.open(csv_path, "wt", newline="") as f:
        w = csv.writer(f)
        w.writerow(["source", "target"])
        w.writerows(
            [("1", "2"), ("1", "3"), ("3", "1"), ("3", "2"), ("3", "5"),
             ("4", "5"), ("4", "6"), ("5", "6"), ("5", "4"), ("6", "4")]
        )
    from rayrank.__main__ import main

    with caplog.at_level(logging.INFO, logger="rayrank"):
        rc = main(["--data", csv_path, "--num_partitions", "3"])
    assert rc == 0
    lines = [r.getMessage() for r in caplog.records if r.getMessage().startswith("rank=")]
    # str(float) like the reference's 'pagerank='+str(pagerank)
    # (pagerank.py:186); golden node-4 score ≈ 0.2659857291 (FIXTURES §1)
    assert lines[0].startswith("rank=0 pagerank=0.2659857")
    assert lines[0].endswith("url=4")
    assert [ln.rsplit("url=", 1)[1] for ln in lines] == ["4", "6", "5", "2", "3", "1"]


def test_cli_search_and_personalization(tmp_path, caplog):
    csv_path = str(tmp_path / "urls.csv.gz")
    edges = [
        ("site.com/a", "site.com/covid"),
        ("site.com/b", "site.com/covid"),
        ("site.com/covid", "site.com/a"),
        ("site.com/b", "site.com/a"),
    ]
    with gzip.open(csv_path, "wt", newline="") as f:
        w = csv.writer(f)
        w.writerow(["source", "target"])
        w.writerows(edges)
    from rayrank.__main__ import main

    with caplog.at_level(logging.INFO, logger="rayrank"):
        rc = main(
            ["--data", csv_path, "--num_partitions", "2",
             "--personalization_vector_query", "covid",
             "--search_query", "covid", "--max_results", "2"]
        )
    assert rc == 0
    lines = [r.getMessage() for r in caplog.records if r.getMessage().startswith("rank=")]
    # only query-satisfying urls are reported (pagerank.py:185 semantics)
    assert lines and all("covid" in ln for ln in lines)


def test_cli_scores_out_resumable(tmp_path, caplog):
    csv_path = str(tmp_path / "small.csv.gz")
    with gzip.open(csv_path, "wt", newline="") as f:
        w = csv.writer(f)
        w.writerow(["source", "target"])
        w.writerows(
            [("1", "2"), ("1", "3"), ("3", "1"), ("3", "2"), ("3", "5"),
             ("4", "5"), ("4", "6"), ("5", "6"), ("5", "4"), ("6", "4")]
        )
    out = str(tmp_path / "scores")
    from rayrank.__main__ import main

    with caplog.at_level(logging.INFO, logger="rayrank"):
        rc = main(["--data", csv_path, "--num_partitions", "3",
                   "--scores_out", out])
    assert rc == 0
    from rayrank.sinks import read_partitioned

    rows = read_partitioned(out).take_all()
    assert len(rows) == 6
    best = max(rows, key=lambda r: r["score"])
    assert best["name"] == "4"
    assert abs(best["score"] - 0.2659857291) < 1e-6
    # second run skips every finished partition
    with caplog.at_level(logging.INFO, logger="rayrank"):
        rc = main(["--data", csv_path, "--num_partitions", "3",
                   "--scores_out", out])
    assert rc == 0
    skipped = [r.getMessage() for r in caplog.records
               if "partitions skipped" in r.getMessage()]
    assert any("0 rows written" in s for s in skipped)

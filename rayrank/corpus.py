"""Deterministic synthetic source-code corpus (FIXTURES.md §3).

Produces a Parquet table with exactly the ``BASELINE.json.input_hint``
schema: ``(repo:string, path:string, commit:string, lang:string,
content:string)``.  Everything is derived from a fixed seed so tests,
benchmarks and oracles can regenerate the identical corpus.

Scale: SF = files / 1e6 → R = max(4, round(2000*SF)) repos × 500 files
(SF=0.001 → 4 repos / 2,000 files; SF=0.1 → 200 repos / ~100k files,
~10^6 derived edges).

Per-repo structure (seeded by ``seed + repo_index``):
  * paths form a package tree ``src/pkg{a}/mod{b}.py`` (50 mods / pkg);
  * ``content`` = unique header comment + k ∈ [0,8] lines
    ``import <module.path>`` chosen uniformly among same-repo files
    + a hub import with probability 0.3 (heavy-hitter dst, exercises
    salted aggregation) + a filler comment line;
  * each repo has 50 commits; a file's commit is geometric-distributed
    (heavy-tailed commit sizes → co-commit skew).
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FILES_PER_REPO = 500
MODS_PER_PKG = 50
COMMITS_PER_REPO = 50
MAX_IMPORTS = 8
HUB_PROB = 0.3
SEED = 42


def num_repos(sf: float) -> int:
    return max(4, int(round(2000 * sf)))


def _repo_paths() -> list[str]:
    return [
        f"src/pkg{i // MODS_PER_PKG}/mod{i % MODS_PER_PKG}.py"
        for i in range(FILES_PER_REPO)
    ]


def _path_to_module(path: str) -> str:
    return path[: -len(".py")].replace("/", ".")


def generate_repo(repo_idx: int, seed: int = SEED) -> dict[str, list[str]]:
    """Rows for one repo as a dict of column lists (deterministic)."""
    rng = np.random.default_rng(seed + repo_idx)
    repo = f"org{repo_idx % 10}/repo{repo_idx}"
    paths = _repo_paths()
    modules = [_path_to_module(p) for p in paths]
    commits = [f"{c:08x}" for c in rng.integers(0, 2**32, size=COMMITS_PER_REPO)]

    n = len(paths)
    n_imports = rng.integers(0, MAX_IMPORTS + 1, size=n)
    hub_mask = rng.random(n) < HUB_PROB
    # geometric commit assignment -> heavy-tailed commit sizes
    commit_idx = np.minimum(rng.geometric(0.1, size=n) - 1, COMMITS_PER_REPO - 1)

    contents: list[str] = []
    for i in range(n):
        lines = [f"# repo:{repo} path:{paths[i]}"]
        targets = rng.integers(0, n, size=int(n_imports[i]))
        for t in targets:
            lines.append(f"import {modules[t]}")
        if hub_mask[i] and i != 0:
            lines.append(f"import {modules[0]}")  # hub file = file 0
        lines.append(f"# filler {repo_idx}:{i}:{int(rng.integers(0, 2**31))}")
        contents.append("\n".join(lines) + "\n")

    return {
        "repo": [repo] * n,
        "path": paths,
        "commit": [commits[c] for c in commit_idx],
        "lang": ["py"] * n,
        "content": contents,
    }


def generate_corpus(
    out_dir: str, sf: float, seed: int = SEED, shards: int | None = None
) -> str:
    """Write the corpus for scale factor ``sf`` under ``out_dir``.

    Writes ``shards`` parquet files (default: min(16, num_repos)) so the
    downstream ``ray.data.read_parquet`` gets parallel read tasks.
    Idempotent: if the directory already has a matching ``_DONE`` marker
    the existing corpus is reused.
    """
    r = num_repos(sf)
    shards = shards or min(64, r)  # read parallelism = shard count
    marker = os.path.join(out_dir, "_DONE")
    tag = f"sf={sf} seed={seed} repos={r} shards={shards} v1"
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read().strip() == tag:
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    for old in os.listdir(out_dir):
        os.remove(os.path.join(out_dir, old))
    per_shard = (r + shards - 1) // shards
    for s in range(shards):
        cols: dict[str, list[str]] = {
            "repo": [], "path": [], "commit": [], "lang": [], "content": []
        }
        for repo_idx in range(s * per_shard, min((s + 1) * per_shard, r)):
            rows = generate_repo(repo_idx, seed)
            for k in cols:
                cols[k].extend(rows[k])
        if not cols["repo"]:
            continue
        table = pa.table({k: pa.array(v, type=pa.string()) for k, v in cols.items()})
        pq.write_table(table, os.path.join(out_dir, f"part-{s:04d}.parquet"))
    with open(marker, "w") as f:
        f.write(tag)
    return out_dir


def default_corpus_dir(sf: float, base: str = "/tmp/rayrank_corpus") -> str:
    return os.path.join(base, f"sf{sf}")

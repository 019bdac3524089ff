"""Resumable partitioned Parquet sink.

A 100-TB pipeline output must never be one giant file, and a failed
run must be able to skip the partitions it already finished.  This
sink writes one directory per partition value with an atomic
completeness marker:

    out_dir/part=0007/data.parquet     # tmp-file + os.replace (atomic)
    out_dir/part=0007/_SUCCESS         # written LAST → marker

`resumable_write` (a) lists complete partitions up front, (b) prunes
their rows with one vectorized ``is_in`` filter (the skipped
partitions' rows never shuffle or serialize), (c) routes the rest
through ONE keyed repartition so every partition value is co-located
in a single block — which is what makes a per-partition marker SOUND:
the task that writes `part=V` provably holds all of V's rows.  Task
retries are safe (tmp + rename is idempotent; the marker is re-checked
inside the task).

Same marker discipline as the iteration checkpoints
(rayrank/checkpoint.py: manifest written LAST); this generalizes it
from the solver's internal state to any Dataset result.  Reference
parity: the reference writes one CSV report driver-side
(/root/reference/pagerank.py:241-258); this is the scale-safe sink for
the same role.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data

from . import configure_data_context

configure_data_context()

DEFAULT_NUM_PARTS = 64


def with_part(
    ds: ray.data.Dataset, key: str, num_parts: int = DEFAULT_NUM_PARTS
) -> ray.data.Dataset:
    """Append ``part = stable_hash(key) % num_parts`` (polars xxhash for
    strings — the repo-wide convention; modulo directly for ints), the
    deterministic partition id `resumable_write` routes and resumes by."""

    def add(t: pa.Table):
        if t.num_rows == 0:
            return
        col = t.column(key)
        if pa.types.is_integer(col.type):
            part = (
                col.to_numpy(zero_copy_only=False).astype(np.uint64)
                % num_parts
            ).astype(np.int64)
        else:
            from .ids import stable_hash

            part = (stable_hash(col.combine_chunks()) % num_parts).astype(
                np.int64
            )
        yield t.append_column("part", pa.array(part))

    return ds.map_batches(add, batch_format="pyarrow")


def _done_parts(out_dir: str) -> set[int]:
    if not os.path.isdir(out_dir):
        return set()
    done = set()
    for d in os.listdir(out_dir):
        if d.startswith("part=") and os.path.exists(
            os.path.join(out_dir, d, "_SUCCESS")
        ):
            done.add(int(d.split("=", 1)[1]))
    return done


def _ser_parquet(sub: pa.Table, tmp: str) -> None:
    pq.write_table(sub, tmp)


def _ser_jsonl_gz(sub: pa.Table, tmp: str) -> None:
    import gzip

    df = sub.to_pandas()
    with gzip.open(tmp, "wt", encoding="utf-8") as f:
        df.to_json(f, orient="records", lines=True, date_format="iso")


def _ser_csv_gz(sub: pa.Table, tmp: str) -> None:
    import gzip

    df = sub.to_pandas()
    with gzip.open(tmp, "wt", encoding="utf-8", newline="") as f:
        df.to_csv(f, index=False)


_FORMATS = {
    "parquet": ("data.parquet", _ser_parquet),
    "jsonl.gz": ("data.jsonl.gz", _ser_jsonl_gz),
    "csv.gz": ("data.csv.gz", _ser_csv_gz),
}


def resumable_write(
    ds: ray.data.Dataset,
    out_dir: str,
    part_col: str = "part",
    num_parts: int = DEFAULT_NUM_PARTS,
    fmt: str = "parquet",
) -> dict:
    """Write ``ds`` as ``out_dir/part=NNNN/data.parquet`` directories,
    skipping partitions whose ``_SUCCESS`` marker already exists.
    Returns ``{"written": [...], "skipped": [...], "rows_written": n}``.
    ``part_col`` must be a deterministic function of the row (use
    :func:`with_part`) — that is what makes a re-run route every row to
    the same partition it failed out of.  ``fmt="jsonl.gz"`` emits
    gzip JSON-Lines shards instead (the interchange format
    read_corpus_jsonl ingests) and ``fmt="csv.gz"`` gzip CSV shards,
    both with the same marker discipline."""
    fname, ser = _FORMATS[fmt]
    os.makedirs(out_dir, exist_ok=True)
    done = _done_parts(out_dir)

    if done:
        done_arr = pa.array(sorted(done), pa.int64())

        def prune(t: pa.Table):
            import pyarrow.compute as pc

            if t.num_rows == 0:
                return
            keep = pc.invert(pc.is_in(t.column(part_col), value_set=done_arr))
            t = t.filter(keep)
            if t.num_rows:
                yield t

        ds = ds.map_batches(prune, batch_format="pyarrow")

    co = ds.repartition(num_parts, keys=[part_col])

    def write_block(t: pa.Table):
        if t.num_rows == 0 or part_col not in t.schema.names:
            return
        parts = t.column(part_col).to_numpy(zero_copy_only=False)
        order = np.argsort(parts, kind="stable")
        p_s = parts[order]
        starts = np.flatnonzero(np.r_[True, p_s[1:] != p_s[:-1]])
        ends = np.r_[starts[1:], len(p_s)]
        out_rows = []
        for s, e in zip(starts, ends):
            pid = int(p_s[s])
            pdir = os.path.join(out_dir, f"part={pid:04d}")
            marker = os.path.join(pdir, "_SUCCESS")
            if os.path.exists(marker):  # retried task: already complete
                out_rows.append((pid, 0, True))
                continue
            os.makedirs(pdir, exist_ok=True)
            sub = t.take(pa.array(order[s:e]))
            tmp = os.path.join(pdir, "." + fname + ".tmp")
            ser(sub, tmp)
            os.replace(tmp, os.path.join(pdir, fname))
            with open(marker, "w") as f:
                f.write("ok")
            out_rows.append((pid, len(sub), False))
        if out_rows:
            yield pa.table(
                {
                    "part": pa.array([r[0] for r in out_rows], pa.int64()),
                    "rows": pa.array([r[1] for r in out_rows], pa.int64()),
                    "was_done": pa.array([r[2] for r in out_rows]),
                }
            )

    manifest = co.map_batches(
        write_block, batch_size=None, batch_format="pyarrow"
    ).take_all()
    written = sorted(r["part"] for r in manifest if not r["was_done"])
    return {
        "written": written,
        "skipped": sorted(done | {r["part"] for r in manifest if r["was_done"]}),
        "rows_written": int(sum(r["rows"] for r in manifest)),
    }


def read_partitioned(out_dir: str, columns=None) -> ray.data.Dataset:
    """Read back ONLY complete partitions (ignores directories whose
    marker is missing — i.e. a crashed writer's partial output)."""
    paths = [
        os.path.join(out_dir, f"part={p:04d}", "data.parquet")
        for p in sorted(_done_parts(out_dir))
    ]
    if not paths:
        raise FileNotFoundError(f"no complete partitions under {out_dir}")
    return ray.data.read_parquet(paths, columns=columns)


# ---------------------------------------------------------------------------
# compaction: many small part files -> size-targeted files
# ---------------------------------------------------------------------------

COMPACT_TARGET_BYTES = 128 << 20  # the classic small-files remedy target


def compact(
    in_dir: str,
    out_dir: str,
    target_bytes: int = COMPACT_TARGET_BYTES,
    columns=None,
) -> dict:
    """Rewrite a parquet directory (e.g. the accumulated output of many
    incremental `resumable_write` runs) into ~``target_bytes`` files —
    the table-maintenance pass every long-lived 100-TB dataset needs:
    thousands of tiny part files destroy read parallelism planning and
    metadata caches; compaction restores scan efficiency without
    changing a row.

    Streaming end to end: sizes come from file metadata (no data read
    on the driver), the rewrite is ``read_parquet → repartition(k) →
    write_parquet`` with k = ceil(bytes / target); the output commits
    with the sink's marker discipline (tmp dir + _SUCCESS last) so a
    crashed compaction never shadows the input.  Returns an audit dict
    (files/bytes in, files out)."""
    import glob as _glob

    files = [
        f
        for f in _glob.glob(os.path.join(in_dir, "**", "*.parquet"), recursive=True)
        if os.path.isfile(f)
    ]
    if not files:
        raise ValueError(f"no parquet files under {in_dir}")
    total = sum(os.path.getsize(f) for f in files)
    k = max(1, -(-total // target_bytes))

    tmp = out_dir.rstrip("/") + ".inprogress"
    if os.path.isdir(tmp):
        import shutil

        shutil.rmtree(tmp)
    ds = ray.data.read_parquet(files, columns=columns)
    ds.repartition(k).write_parquet(tmp)
    os.replace(tmp, out_dir)
    with open(os.path.join(out_dir, "_SUCCESS"), "w") as f:
        f.write("")
    n_out = len(
        [f for f in os.listdir(out_dir) if f.endswith(".parquet")]
    )
    return {
        "files_in": len(files),
        "bytes_in": int(total),
        "files_out": n_out,
        "target_bytes": int(target_bytes),
    }

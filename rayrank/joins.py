"""Partitioned hash join as a composition of Ray Data primitives.

Ray 2.49's native ``Dataset.join`` crashes (`ArrowInvalid`) whenever a
hash partition receives zero rows on one side — its aggregator builds a
schema-less empty table (ray/data/_internal/execution/operators/
join.py:118 ``finalize``).  Tiny tables and skewed keys both trigger
it, so every join in this engine goes through this operator instead:

  1. both sides are projected to one union schema (absent columns are
     typed nulls) plus a side marker and a ``__bucket`` column =
     stable hash of the key columns mod ``num_partitions``;
  2. one ``groupby("__bucket").map_groups`` co-groups the two sides —
     a single hash shuffle, identical movement to a native hash join;
  3. inside each bucket the two sides are split and joined with the
     vectorized pyarrow (acero) join kernel — empty sides are typed
     empty tables, which acero handles correctly.

Skew note: buckets are balanced by key-hash; a pathological hot KEY
still lands in one bucket — callers with known hot keys (contribution
reduces) pre-aggregate or salt before joining (SURVEY.md §4.2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from . import NUM_PARTITIONS_DEFAULT

_ARROW_HOW = {
    "inner": "inner",
    "left_outer": "left outer",
    "right_outer": "right outer",
    "full_outer": "full outer",
    # semi/anti keep ONLY left columns; pass a keys-only right side so
    # r_extra is empty (hash_join raises otherwise — acero's left
    # semi/anti output has no right columns to select)
    "semi": "left semi",
    "anti": "left anti",
}

_FNV = np.uint64(1099511628211)
_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _key_hash(t: pa.Table, cols: list[str], buckets: int) -> np.ndarray:
    """Vectorized bucket hash of the key columns.

    Integer keys: numpy xorshift-multiply (zero-copy).  String / other
    keys: polars ``hash_rows`` directly over the Arrow buffers — the
    r1 hot spot was ``pd.util.hash_array`` over ``to_pylist()`` object
    arrays here (~1600× slower, measured in-sandbox).  Both sides of a
    join hash in the same pinned polars version, so buckets agree."""
    int_cols = [c for c in cols if pa.types.is_integer(t.column(c).type)]
    h = np.zeros(len(t), np.uint64)
    for c in int_cols:
        v = t.column(c).to_numpy(zero_copy_only=False).astype(np.uint64)
        v = (v ^ (v >> np.uint64(33))) * _GOLD
        h = h * _FNV ^ v
    other = [c for c in cols if c not in int_cols]
    if other:
        from . import polars_mod

        pl = polars_mod()
        v = pl.from_arrow(t.select(other)).hash_rows(seed=0).to_numpy()
        h = h * _FNV ^ v
    return (h % np.uint64(buckets)).astype(np.int64)


def _filler(ty: pa.DataType, n: int) -> pa.Array:
    """A typed, null-free constant column (see prep() in hash_join)."""
    if pa.types.is_integer(ty):
        return pa.array(np.zeros(n, np.int64)).cast(ty)
    if pa.types.is_floating(ty):
        return pa.array(np.zeros(n, np.float64)).cast(ty)
    if pa.types.is_boolean(ty):
        return pa.array(np.zeros(n, bool))
    if pa.types.is_string(ty) or pa.types.is_large_string(ty):
        return pa.array([""] * n, type=ty)
    if pa.types.is_binary(ty) or pa.types.is_large_binary(ty):
        return pa.array([b""] * n, type=ty)
    if pa.types.is_timestamp(ty):
        return pa.array([0] * n, type=ty)
    return pa.nulls(n, type=ty)


def _resolved_schema(ds: ray.data.Dataset):
    """(ds, names, arrow_types) with a trustworthy schema.

    A lazy ``Dataset.schema()`` can report the schema of whichever block
    happens to be produced first — including a schema-less EMPTY block
    from a ``map_groups`` group that returned zero rows (observed on
    ray 2.49).  Casting real columns to such null types would silently
    destroy data, so when the lazy schema looks unreliable the dataset
    is materialized (which unifies block schemas) and re-read."""

    def extract(d):
        s = d.schema()
        if s is None:
            return None
        names, types = list(s.names), list(s.types)
        if not names:
            return None
        out_types = []
        for t in types:
            if isinstance(t, pa.DataType):
                if pa.types.is_null(t):
                    return None
                out_types.append(t)
            else:  # numpy dtype from a pandas block
                try:
                    out_types.append(pa.from_numpy_dtype(t))
                except (pa.ArrowNotImplementedError, TypeError):
                    return None
        return names, out_types

    got = extract(ds)
    if got is None:
        ds = ds.map_batches(lambda t: t, batch_format="pyarrow").materialize()
        got = extract(ds)
        if got is None:  # genuinely empty dataset: fall back to raw schema
            s = ds.schema()
            got = (list(s.names) if s else [], list(s.types) if s else [])
    return ds, got[0], got[1]


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: tuple[str, ...],
    right_on: tuple[str, ...] | None = None,
    how: str = "inner",
    num_partitions: int = NUM_PARTITIONS_DEFAULT,
) -> ray.data.Dataset:
    """Join two Datasets on key columns.  Output columns: all left
    columns, then right non-key columns (non-key names must be disjoint
    — rename before joining)."""
    right_on = tuple(right_on or on)
    on = tuple(on)
    how_arrow = _ARROW_HOW[how]

    left, l_names, l_types = _resolved_schema(left)
    right, r_names, r_types = _resolved_schema(right)
    # rename right keys to the left key names so bucket hashing and the
    # in-bucket join key line up
    ren = dict(zip(right_on, on))
    r_names_out = [ren.get(nm, nm) for nm in r_names]
    r_extra = [nm for nm in r_names_out if nm not in on]
    if how in ("semi", "anti") and r_extra:
        raise ValueError(
            f"{how} join: right side must be keys-only, got extra {r_extra}"
        )
    overlap = set(r_extra) & set(l_names)
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")

    all_fields = list(zip(l_names, l_types)) + [
        (nm, ty) for nm, ty in zip(r_names_out, r_types) if nm in r_extra
    ]
    key_types = {nm: ty for nm, ty in all_fields if nm in on}

    def prep(side: int, rename: dict | None):
        def fn(t: pa.Table):
            # generator: emit NOTHING for empty inputs — zero-row blocks
            # reaching the hash-shuffle aggregator yield schema-less
            # partitions whose finalize crashes (ray 2.49
            # hash_shuffle.py:162 sort_by on missing key column)
            if len(t) == 0:
                return
            if rename:
                t = t.rename_columns([ren.get(nm, nm) for nm in t.schema.names])
            cols, names = [], []
            for nm, ty in all_fields:
                names.append(nm)
                if nm in t.schema.names:
                    col = t.column(nm)
                    cols.append(col.cast(ty) if col.type != ty else col)
                else:
                    # typed SENTINELS, not nulls: the groupby shuffle may
                    # round-trip blocks through pandas, where nulls
                    # promote int64→float64 / all-null→null type and
                    # corrupt the union schema; sentinel columns are
                    # discarded when the sides are split in join_bucket
                    cols.append(_filler(ty, len(t)))
            out = pa.table(dict(zip(names, cols)))
            out = out.append_column(
                "__side", pa.array(np.full(len(t), side, np.int8))
            )
            out = out.append_column(
                "__bucket", pa.array(_key_hash(out, list(on), num_partitions))
            )
            yield out

        return fn

    lu = left.map_batches(prep(0, None), batch_format="pyarrow")
    ru = right.map_batches(prep(1, ren), batch_format="pyarrow")
    u = lu.union(ru)

    l_cols = list(l_names)
    r_cols = list(on) + r_extra

    def join_block(t: pa.Table):
        # whole repartitioned block = a union of complete key-hash
        # buckets for both sides; joining the supersets directly is
        # correct (equal keys always co-locate).  Skip the empty /
        # schema-less blocks the repartition emits for void partitions.
        if t.num_rows == 0 or "__side" not in t.schema.names:
            return
        side = t.column("__side").to_numpy(zero_copy_only=False)
        lt = t.filter(pa.array(side == 0)).select(l_cols)
        rt = t.filter(pa.array(side == 1)).select(r_cols)
        # acero join requires non-null keys; keys are never null here by
        # construction (they came from real key columns)
        yield lt.join(
            rt, keys=list(on), right_keys=list(on), join_type=how_arrow
        ).select(l_cols + r_extra)

    # sort-free hash co-location (see rayrank/shuffle.py for why
    # groupby().map_groups is unusable here)
    return u.repartition(num_partitions, keys=["__bucket"]).map_batches(
        join_block, batch_size=None, batch_format="pyarrow"
    )


BROADCAST_JOIN_LIMIT = 2_000_000  # rows: ~tens of MB for narrow tables


def broadcast_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: tuple[str, ...],
    right_on: tuple[str, ...] | None = None,
    how: str = "inner",
    limit: int = BROADCAST_JOIN_LIMIT,
) -> ray.data.Dataset | None:
    """Join where the RIGHT side is small enough to broadcast:
    materialize it once, ``ray.put`` the table, acero-join per left
    batch — NO shuffle, each left block streams through untouched.
    Returns ``None`` when the right side exceeds ``limit`` rows, so
    callers fall back to the partitioned :func:`hash_join` (use
    :func:`join_auto` for that pattern).  Same column contract as
    ``hash_join``: left columns then right non-key columns."""
    import ray as _ray

    right_on = tuple(right_on or on)
    on = tuple(on)
    how_arrow = _ARROW_HOW[how]
    # limit-probe: materializing right.limit(limit+1) lets the streaming
    # executor STOP once limit+1 rows exist, instead of fully
    # materializing a huge right side only to discard it and hand the
    # lazy dataset to hash_join (which re-executes the lineage anyway).
    # A small right side (the broadcast case) materializes completely,
    # exactly as before — limit(n) keeps all rows when count <= n.
    right_mat = right.limit(limit + 1).materialize()
    if right_mat.count() > limit:
        return None
    blocks = list(right_mat.iter_batches(batch_format="pyarrow"))
    ren = dict(zip(right_on, on))
    if blocks:
        rt = pa.concat_tables(blocks)
    else:
        rt = pa.table(
            {nm: pa.array([], ty) for nm, ty in zip(
                right_mat.schema().names, right_mat.schema().types
            )}
        )
    rt = rt.rename_columns([ren.get(nm, nm) for nm in rt.schema.names])
    r_extra = [nm for nm in rt.schema.names if nm not in on]
    if how in ("semi", "anti") and r_extra:
        raise ValueError(
            f"{how} join: right side must be keys-only, got extra {r_extra}"
        )
    ref = _ray.put(rt.combine_chunks())

    def fn(t: pa.Table):
        if len(t) == 0:
            return
        overlap = set(r_extra) & set(t.schema.names)
        if overlap:
            raise ValueError(f"non-key column collision: {sorted(overlap)}")
        r = _ray.get(ref)
        l_cols = list(t.schema.names)
        yield t.join(
            r, keys=list(on), right_keys=list(on), join_type=how_arrow
        ).select(l_cols + r_extra)

    return left.map_batches(fn, batch_format="pyarrow")


def join_auto(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: tuple[str, ...],
    right_on: tuple[str, ...] | None = None,
    how: str = "inner",
    num_partitions: int = NUM_PARTITIONS_DEFAULT,
    broadcast_limit: int = BROADCAST_JOIN_LIMIT,
) -> ray.data.Dataset:
    """Broadcast the right side when it fits (:func:`broadcast_join`),
    otherwise partitioned :func:`hash_join` — the standard small-side
    guard used across the engine (BROADCAST_VERTEX_LIMIT /
    BROADCAST_FILE_LIMIT siblings).

    CALLER CONTRACT (the r4 span-dedup lesson): when the right side is
    EXPECTED to exceed the broadcast limit and its lineage contains a
    barrier (any repartition/groupby — the probe's limit cannot stream
    past it), `materialize_cut` the right side first, or the probe
    plus the declined hash_join will execute that lineage up to three
    times (measured 3× on a 5.12M-doc chain).  A small right side is
    fine un-cut: the probe's materialization IS the broadcast table."""
    out = broadcast_join(left, right, on, right_on, how, broadcast_limit)
    if out is not None:
        return out
    return hash_join(left, right, on, right_on, how, num_partitions)


def sorted_keys_ref(ds: ray.data.Dataset, column: str):
    """ObjectRef of the SORTED int64 key array of a (guard-bounded)
    dataset column, built in ONE remote task from the block refs — the
    array never round-trips through the driver (a 39M-key pull via
    iter_batches measured 20.6 s; this path is the plasma-native
    equivalent).  Feed the ref straight to
    :func:`broadcast_semi_filter`."""
    import ray as _ray

    @_ray.remote
    def build(*tables) -> np.ndarray:
        # no-silent-caps: raise if ANY non-empty block lacks the
        # column (r4 ADVICE) — heterogeneous schemas would otherwise
        # silently drop those blocks' keys from the semi-filter set,
        # a partial cap worse than the all-blocks-missing case the
        # pre-r5 guard caught
        n_missing = sum(
            1
            for t in tables
            if t.num_rows and column not in t.schema.names
        )
        if n_missing:
            raise ValueError(
                f"sorted_keys_ref: {n_missing} non-empty block(s) "
                f"lack column {column!r}"
            )
        parts = [
            t.column(column).to_numpy(zero_copy_only=False)
            for t in tables
            if t.num_rows
        ]
        if not parts:
            return np.zeros(0, np.int64)
        return np.sort(np.concatenate(parts))

    return build.remote(*ds.to_arrow_refs())


def broadcast_semi_filter(
    ds: ray.data.Dataset, keys, column: str, keep_matching: bool
) -> ray.data.Dataset:
    """Semi/anti join against a SMALL key set: ship the sorted key array
    once via ray.put, filter vectorized per batch (SURVEY.md §2.4 J2/J4
    broadcast pattern — no shuffle).  ``keys`` is either a driver-side
    numpy array (sorted here) or an ObjectRef to an ALREADY-SORTED
    array (from :func:`sorted_keys_ref` — zero driver round-trip)."""
    import ray as _ray

    if isinstance(keys, _ray.ObjectRef):
        ref = keys
    else:
        ref = _ray.put(np.sort(np.asarray(keys)))

    def fn(t: pa.Table) -> pa.Table:
        k = _ray.get(ref)
        col = t.column(column).to_numpy(zero_copy_only=False)
        if len(k) == 0:
            hit = np.zeros(len(col), bool)
        else:
            idx = np.clip(np.searchsorted(k, col), 0, len(k) - 1)
            hit = k[idx] == col
        return t.filter(pa.array(hit if keep_matching else ~hit))

    return ds.map_batches(fn, batch_format="pyarrow")


_BLOOM_SALT = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant


def _bloom_positions(v: np.ndarray, m: int, k: int) -> np.ndarray:
    """(len(v), k) uint64 bit positions via double hashing
    (Kirsch–Mitzenmacher: pos_i = h1 + i·h2 mod m, m a power of two,
    h2 forced odd so the probe sequence never degenerates)."""
    from .sketch import splitmix64

    x = v.astype(np.uint64)
    h1 = splitmix64(x)
    h2 = splitmix64(x ^ _BLOOM_SALT) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) & np.uint64(m - 1)


def bloom_bits(
    ds: ray.data.Dataset,
    column: str,
    n_keys: int,
    bits_per_key: int = 10,
    num_hashes: int = 7,
):
    """Build a Bloom filter over an int64 key column, distributed:
    each block sets its keys' bits in a LOCAL bitmap (vectorized
    double-hash, no Python loop over rows), the per-block bitmaps ship
    as single binary rows, and the driver ORs ≤ num-blocks fixed-size
    words (at real scale this OR would tree-reduce, but the payload is
    m/8 bytes per block regardless of row count — the reduction is
    already data-independent).  Returns (ObjectRef bitmap, m, k) for
    :func:`bloom_prefilter`."""
    import ray as _ray

    m = 1 << int(np.ceil(np.log2(max(64, n_keys * bits_per_key))))
    k = num_hashes

    def partial(t: pa.Table):
        if t.num_rows == 0 or column not in t.schema.names:
            return
        v = t.column(column).to_numpy(zero_copy_only=False)
        pos = _bloom_positions(v, m, k).ravel()
        bits = np.zeros(m // 64, np.uint64)
        np.bitwise_or.at(
            bits, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )
        yield pa.table({"bits": pa.array([bits.tobytes()], pa.large_binary())})

    merged = np.zeros(m // 64, np.uint64)
    for row in ds.map_batches(
        partial, batch_size=None, batch_format="pyarrow"
    ).take_all():  # ≤ num-blocks rows of m/8 bytes each
        merged |= np.frombuffer(row["bits"], np.uint64)
    return _ray.put(merged), m, k


def bloom_prefilter(
    ds: ray.data.Dataset, column: str, bits_ref, m: int, k: int
) -> ray.data.Dataset:
    """Keep rows whose key MAY be in the Bloom set (no false negatives;
    false positives pass and must be removed by the exact join behind
    it).  The bitmap ships once via ray.put and is probed vectorized
    per batch — this is the shuffle-volume reducer in front of a
    partitioned semi join when the key set is too big to broadcast
    exactly."""
    import ray as _ray

    def fn(t: pa.Table) -> pa.Table:
        bits = _ray.get(bits_ref)
        v = t.column(column).to_numpy(zero_copy_only=False)
        pos = _bloom_positions(v, m, k)
        word = bits[(pos >> np.uint64(6)).astype(np.int64)]
        hit = ((word >> (pos & np.uint64(63))) & np.uint64(1)).all(axis=1)
        return t.filter(pa.array(hit))

    return ds.map_batches(fn, batch_format="pyarrow")


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    by: tuple[str, ...] | str,
    num_partitions: int = NUM_PARTITIONS_DEFAULT,
) -> ray.data.Dataset:
    """Backward as-of join (inner): each left row matches the right row
    with the greatest ``on`` value <= the left ``on`` value in the same
    ``by`` group; unmatched left rows are dropped.

    Ray Data has no as-of join; this is the scale-safe composition
    (SURVEY.md §2.4 pattern): both sides are tagged and projected to
    one union schema, ONE hash repartition by ``by`` co-locates every
    group's rows from both sides, and each block runs polars'
    vectorized ``join_asof``.  Total movement = one shuffle of both
    inputs — identical to a hash join; no global sort is needed
    because ordering is only required within a block (sorting is
    per-block O(b log b)).  Partitioning assumption: a single ``by``
    group fits in one block — the same assumption every keyed
    ``map_groups`` makes; salt or pre-aggregate pathological groups.

    Pinned tie rule: right rows sharing ``(by, on)`` resolve to the
    greatest remaining-column tuple (pre-aggregate the right side for
    any other rule).  ``on`` must be numeric/temporal on both sides;
    ``by`` and ``on`` must have identical names on both sides; right
    non-key names must not collide with left columns.
    """
    by = (by,) if isinstance(by, str) else tuple(by)
    keys = list(by)

    left, l_names, l_types = _resolved_schema(left)
    right, r_names, r_types = _resolved_schema(right)
    r_extra = [nm for nm in r_names if nm not in by and nm != on]
    overlap = set(r_extra) & set(l_names)
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")
    missing = [c for c in keys + [on] if c not in l_names or c not in r_names]
    if missing:
        raise ValueError(f"key columns absent from a side: {missing}")

    all_fields = list(zip(l_names, l_types)) + [
        (nm, ty) for nm, ty in zip(r_names, r_types) if nm in r_extra
    ]

    def prep(side: int):
        def fn(t: pa.Table):
            if len(t) == 0:
                return
            cols, names = [], []
            for nm, ty in all_fields:
                names.append(nm)
                if nm in t.schema.names:
                    col = t.column(nm)
                    cols.append(col.cast(ty) if col.type != ty else col)
                else:
                    cols.append(_filler(ty, len(t)))  # typed sentinel
            out = pa.table(dict(zip(names, cols)))
            out = out.append_column(
                "__side", pa.array(np.full(len(t), side, np.int8))
            )
            out = out.append_column(
                "__bucket", pa.array(_key_hash(out, keys, num_partitions))
            )
            yield out

        return fn

    u = left.map_batches(prep(0), batch_format="pyarrow").union(
        right.map_batches(prep(1), batch_format="pyarrow")
    )
    l_cols = list(l_names)
    r_cols = keys + [on] + r_extra
    out_fields = [(nm, ty) for nm, ty in all_fields]

    def join_block(t: pa.Table):
        if t.num_rows == 0 or "__side" not in t.schema.names:
            return
        from . import polars_mod

        pl = polars_mod()
        side = t.column("__side").to_numpy(zero_copy_only=False)
        lt = pl.from_arrow(t.filter(pa.array(side == 0)).select(l_cols))
        rt = pl.from_arrow(t.filter(pa.array(side == 1)).select(r_cols))
        if lt.height == 0 or rt.height == 0:
            return
        lt = lt.sort(on)
        # tie rule: last-wins inside join_asof, so sort ties ascending
        # by the remaining columns -> greatest tuple wins
        rt = rt.sort([on] + r_extra).with_columns(
            pl.lit(True).alias("__m")
        )
        j = lt.join_asof(rt, on=on, by=list(by), strategy="backward")
        j = j.filter(pl.col("__m").is_not_null()).drop("__m")
        out = j.to_arrow()
        cast = pa.schema(
            [(nm, ty) for nm, ty in out_fields if nm in out.schema.names]
        )
        yield out.select(cast.names).cast(cast)

    return u.repartition(num_partitions, keys=["__bucket"]).map_batches(
        join_block, batch_size=None, batch_format="pyarrow"
    )


def range_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    by: tuple[str, ...] | str,
    lo: int,
    hi: int,
    num_partitions: int = NUM_PARTITIONS_DEFAULT,
) -> ray.data.Dataset:
    """Banded range join (inner): emit every (left, right) pair in the
    same ``by`` group with ``left.on + lo <= right.on <= left.on + hi``.

    Same scale shape as :func:`asof_join`: tag both sides, ONE hash
    repartition by ``by``, then a per-block sorted-window kernel —
    right rows are sorted by ``on`` per group and each left row's
    window is found with two binary searches; matches are emitted with
    a vectorized repeat/arange expansion (no per-row Python loop, no
    group cross product).  Output size is inherently the number of
    matching pairs — a hot group with w matches per row emits n*w rows;
    callers bound the band, not the operator.

    ``on`` must be integer-valued on both sides (cast timestamps to
    int64 microseconds first); ``by``/``on`` names must match across
    sides; right non-key names must not collide with left columns.
    """
    by = (by,) if isinstance(by, str) else tuple(by)
    keys = list(by)

    left, l_names, l_types = _resolved_schema(left)
    right, r_names, r_types = _resolved_schema(right)
    r_extra = [nm for nm in r_names if nm not in by and nm != on]
    overlap = set(r_extra) & set(l_names)
    if overlap:
        raise ValueError(f"non-key column collision: {sorted(overlap)}")

    all_fields = list(zip(l_names, l_types)) + [
        (nm, ty) for nm, ty in zip(r_names, r_types) if nm in r_extra
    ]

    def prep(side: int):
        def fn(t: pa.Table):
            if len(t) == 0:
                return
            cols, names = [], []
            for nm, ty in all_fields:
                names.append(nm)
                if nm in t.schema.names:
                    col = t.column(nm)
                    cols.append(col.cast(ty) if col.type != ty else col)
                else:
                    cols.append(_filler(ty, len(t)))
            out = pa.table(dict(zip(names, cols)))
            out = out.append_column(
                "__side", pa.array(np.full(len(t), side, np.int8))
            )
            out = out.append_column(
                "__bucket", pa.array(_key_hash(out, keys, num_partitions))
            )
            yield out

        return fn

    u = left.map_batches(prep(0), batch_format="pyarrow").union(
        right.map_batches(prep(1), batch_format="pyarrow")
    )
    l_cols = list(l_names)
    r_cols = keys + [on] + r_extra
    r_on_out = on + "_right"

    def join_block(t: pa.Table):
        if t.num_rows == 0 or "__side" not in t.schema.names:
            return
        from . import polars_mod

        pl = polars_mod()
        side = t.column("__side").to_numpy(zero_copy_only=False)
        lt = t.filter(pa.array(side == 0)).select(l_cols)
        rt = t.filter(pa.array(side == 1)).select(r_cols)
        if lt.num_rows == 0 or rt.num_rows == 0:
            return
        # dense group codes shared by both sides (order irrelevant)
        lk = pl.from_arrow(lt.select(keys)).hash_rows(seed=7).to_numpy()
        rk = pl.from_arrow(rt.select(keys)).hash_rows(seed=7).to_numpy()
        lo_t = lt.column(on).to_numpy(zero_copy_only=False).astype(np.int64)
        ro_t = rt.column(on).to_numpy(zero_copy_only=False).astype(np.int64)
        rorder = np.lexsort((ro_t, rk))
        rk_s, ro_s = rk[rorder], ro_t[rorder]
        lorder = np.lexsort((lo_t, lk))
        lk_s, lo_s = lk[lorder], lo_t[lorder]
        # two vectorized searchsorted calls per GROUP (the loop is over
        # groups, never rows; each iteration binds a whole group's
        # windows at once)
        gstart = np.flatnonzero(np.r_[True, lk_s[1:] != lk_s[:-1]])
        gstop = np.r_[gstart[1:], len(lk_s)]
        starts = np.empty(len(lk_s), np.int64)
        stops = np.empty(len(lk_s), np.int64)
        for a, b in zip(gstart, gstop):
            r0 = np.searchsorted(rk_s, lk_s[a], "left")
            r1 = np.searchsorted(rk_s, lk_s[a], "right")
            starts[a:b] = r0 + np.searchsorted(
                ro_s[r0:r1], lo_s[a:b] + lo, "left"
            )
            stops[a:b] = r0 + np.searchsorted(
                ro_s[r0:r1], lo_s[a:b] + hi, "right"
            )
        counts = stops - starts
        keep = counts > 0
        kcounts = counts[keep]
        total = int(kcounts.sum())
        if total == 0:
            return
        li = lorder[np.repeat(np.flatnonzero(keep), kcounts)]
        heads = np.cumsum(np.r_[0, kcounts[:-1]])
        ri = rorder[
            np.repeat(starts[keep], kcounts)
            + (np.arange(total) - np.repeat(heads, kcounts))
        ]
        # group codes are 64-bit hashes: a collision would silently
        # cross-match two groups, so re-verify by-equality exactly on
        # the emitted pairs (cheap: output-sized)
        ok = np.ones(total, bool)
        for nm in keys:
            lv = lt.column(nm).take(pa.array(li))
            rv = rt.column(nm).take(pa.array(ri))
            import pyarrow.compute as _pc

            ok &= _pc.equal(lv, rv).to_numpy(zero_copy_only=False)
        li, ri = li[ok], ri[ok]
        if len(li) == 0:
            return
        out = lt.take(pa.array(li))
        out = out.append_column(
            r_on_out, rt.column(on).take(pa.array(ri))
        )
        for nm in r_extra:
            out = out.append_column(nm, rt.column(nm).take(pa.array(ri)))
        yield out

    return u.repartition(num_partitions, keys=["__bucket"]).map_batches(
        join_block, batch_size=None, batch_format="pyarrow"
    )

"""Shared pipeline helpers."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def ensure_schema(ds: rd.Dataset, schema: pa.Schema) -> rd.Dataset:
    """Pin every block (including empty ones) to ``schema``.

    Ray's Aggregate operator can emit zero-row blocks with an EMPTY schema;
    feeding one into a hash join fails in Arrow with "No match ... for key
    field reference" because the key column is missing from that block.
    This normalizer rewrites empty blocks to schema.empty_table() and
    projects/casts the rest, so downstream joins see one stable schema.
    """
    cols = [f.name for f in schema]

    def norm(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return schema.empty_table()
        return t.select(cols).cast(schema)

    return ds.map_batches(norm, batch_format="pyarrow")


def compact_for_join(ds: rd.Dataset, max_blocks: int = 8) -> rd.Dataset:
    """Materialize + re-block a join input so it contains NO empty blocks.

    Ray 2.49's hash-join shuffle broadcasts each side's schema to the
    aggregator partitions only alongside the FIRST shuffled block of that
    side; an empty first block is dropped before the broadcast
    (hash_shuffle.py:223 early-return), so any partition that then gets no
    real shard finalizes a schema-less empty table and the Arrow join
    dies with "No match ... for key field reference".  Aggregate outputs
    routinely contain empty blocks, so: materialize (the input is a
    reduced/aggregated side — the barrier already exists logically),
    count from metadata, and repartition to min(max_blocks, rows) blocks
    so every block is non-empty.  A zero-row dataset is returned as-is —
    callers must short-circuit that case.
    """
    ds = ds.materialize()
    n = ds.count()
    if n == 0:
        return ds
    return ds.repartition(max(1, min(max_blocks, n)))


def list_col_matrix(col: "pa.ChunkedArray | pa.Array", dtype=None):
    """Vectorized (n_rows, dim) numpy matrix from a ``list<T>`` column.

    Replaces the ``np.stack([np.asarray(x) for x in col.to_pylist()])``
    per-row decode (a Python loop over rows — ~80x slower on sf0.1
    embedding batches).  ``flatten()`` is used rather than ``.values``
    because it respects slice offsets: Ray Data hands map_batches
    zero-copy SLICES of blocks, where ``.values`` would return the whole
    underlying child array and silently mis-shape the matrix.

    Assumes equal-length lists with no nulls (the embeddings-table
    contract); raises if the flat size is not divisible by the row count.
    """
    import numpy as np

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    flat = np.asarray(col.flatten())
    if dtype is not None:
        flat = flat.astype(dtype, copy=False)
    if n == 0:
        return flat.reshape(0, 0)
    if flat.size % n:
        raise ValueError(f"ragged list column: {flat.size} values / {n} rows")
    return flat.reshape(n, flat.size // n)

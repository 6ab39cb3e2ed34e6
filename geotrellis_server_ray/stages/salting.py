"""Hot-key salting: two-stage aggregation for skewed groupbys.

The corpus clusters 20% of anchors on 5 hot cells (sources/corpus.py); a
naive cell groupby would route those cells' rows to single reducers. The
salted plan splits each key into (key, salt) sub-keys — salt derived
deterministically from a row id hash — pre-aggregates per sub-key (first,
wide-ish shuffle over k x salts keys), then combines the tiny salted partials
per key (second, trivial shuffle). Aggregate must be commutative+associative
(counts/sums/mins here).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..pipelines.relational import grouped_sums
from .dedup import poly_hash_strings


def add_salt(batch: pa.Table, id_col: str, num_salts: int, out_col: str = "salt") -> pa.Table:
    """Deterministic salt from a row-id hash (NOT round-robin: retried tasks
    must produce identical salt for identical rows)."""
    ids = batch.column(id_col)
    if pa.types.is_string(ids.type) or pa.types.is_large_string(ids.type):
        # module-level import: this function's body executes inside Ray
        # workers, where a lazy relative import would require the package to
        # be importable by name (breaks the pickle-by-value cwd independence)
        h = poly_hash_strings(ids)
    else:
        h = ids.to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            h = h * np.uint64(0x9E3779B97F4A7C15)
    salt = (h % np.uint64(num_salts)).astype(np.int64)
    return batch.append_column(out_col, pa.array(salt))


def salted_counts(ds, key_cols: list[str], id_col: str, num_salts: int = 8,
                  count_as: str = "n"):
    """Two-stage skew-safe count: groupby (keys + salt) partials, then
    groupby keys over the partials."""
    def prep(batch: pa.Table) -> pa.Table:
        batch = add_salt(batch, id_col, num_salts)
        return batch.append_column(count_as, pa.array(np.ones(len(batch), dtype=np.int64)))

    staged = ds.map_batches(prep, batch_format="pyarrow")
    per_salt = grouped_sums(staged, key_cols + ["salt"], [count_as], small_key_space=True)
    final = grouped_sums(per_salt, key_cols, [count_as], small_key_space=True)
    return final

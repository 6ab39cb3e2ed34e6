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


def salted_counts(ds, key_cols: list[str], id_col: str,
                  num_salts: int | str = "auto", count_as: str = "n"):
    """Two-stage skew-safe count: groupby (keys + salt) partials, then
    groupby keys over the partials. ``num_salts="auto"`` (single int64 key
    only) derives the salt from the measured per-key load via the exact
    heavy-hitter pre-pass (:func:`derive_salt`) instead of a hand-set
    constant."""
    if num_salts == "auto":
        from ..config import shuffle_partitions

        assert len(key_cols) == 1, "auto salt supports a single int64 key"
        num_salts = derive_salt(ds.map_batches(
            lambda b: b.select([key_cols[0]]), batch_format="pyarrow"),
            key_cols[0], shuffle_partitions())

    def prep(batch: pa.Table) -> pa.Table:
        batch = add_salt(batch, id_col, num_salts)
        return batch.append_column(count_as, pa.array(np.ones(len(batch), dtype=np.int64)))

    staged = ds.map_batches(prep, batch_format="pyarrow")
    per_salt = grouped_sums(staged, key_cols + ["salt"], [count_as], small_key_space=True)
    final = grouped_sums(per_salt, key_cols, [count_as], small_key_space=True)
    return final


def mg_compress(keys: np.ndarray, counts: np.ndarray, k: int):
    """Misra-Gries summary compression: keep at most k (key, count) pairs by
    subtracting the (k+1)-th largest count from all and dropping <= 0.
    Preserves the MG guarantee count_true - count_mg <= n/k."""
    if len(keys) <= k:
        return keys, counts
    order = np.argsort(counts)[::-1]
    thresh = counts[order[k]]
    keep = counts > thresh
    # ties at the threshold may leave > k survivors only when equal counts
    # straddle the cut; subtracting thresh zeroes them anyway
    return keys[keep], counts[keep] - thresh


def heavy_hitters(ds, key_col: str, support: float, count_as: str = "n"):
    """Dataset of exact heavy hitters (see :func:`heavy_hitters_exact`)."""
    return heavy_hitters_exact(ds, key_col, support, count_as)[0]


def heavy_hitters_exact(ds, key_col: str, support: float, count_as: str = "n"):
    """PROVABLY-EXACT support-based heavy hitters in two passes (the classic
    distributed Misra-Gries + rescan plan — bounded memory at any scale):

      pass 1: per-batch exact unique counts, MG-compressed to k = 2/support
              entries (bounded state per block); partials merged and
              MG-compressed on the driver (blocks x k rows, tiny). MG
              guarantee: every key with true frequency > support * n is in
              the candidate set.
      pass 2: candidates broadcast (ray.put + searchsorted probe); EXACT
              counts for candidates only via combiner partials; keys with
              exact count > support * n emitted.

    False negatives are impossible (the guarantee), false positives are
    filtered by the exact recount — so the output equals the exact
    ``GROUP BY ... HAVING count > support * n`` at any data size, while no
    stage ever holds more than k counters per block. Returns
    ``(Dataset of (key_col, count_as), total_rows)`` and consumes a
    MATERIALIZED keyed projection so the two passes share one read."""
    import ray
    import ray.data as rd

    k = max(8, int(np.ceil(2.0 / support)))

    keyed = ds.map_batches(lambda b: b.select([key_col]), batch_format="pyarrow") \
              .materialize()

    def partial(b: pa.Table) -> pa.Table:
        vals = b.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        u, c = np.unique(vals, return_counts=True)
        u, c = mg_compress(u, c.astype(np.int64), k)
        return pa.table({key_col: pa.array(u), "mg": pa.array(c)})

    rows = keyed.map_batches(partial, batch_format="pyarrow").take_all()
    total = keyed.count()  # over materialized blocks: metadata-cheap
    if rows:
        ku = np.array([r[key_col] for r in rows], dtype=np.int64)
        cu = np.array([r["mg"] for r in rows], dtype=np.int64)
        mk, inv = np.unique(ku, return_inverse=True)
        mc = np.zeros(len(mk), dtype=np.int64)
        np.add.at(mc, inv, cu)
        cand, _ = mg_compress(mk, mc, k)
    else:
        cand = np.empty(0, dtype=np.int64)
    cand = np.sort(cand)
    ref = ray.put(cand)

    def recount(b: pa.Table) -> pa.Table:
        c = ray.get(ref)
        vals = b.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(c) == 0 or len(vals) == 0:
            return pa.table({key_col: pa.array([], pa.int64()),
                             count_as: pa.array([], pa.int64())})
        idx = np.clip(np.searchsorted(c, vals), 0, len(c) - 1)
        hit = c[idx] == vals
        cnt = np.bincount(idx[hit], minlength=len(c)).astype(np.int64)
        nz = np.nonzero(cnt)[0]
        return pa.table({key_col: pa.array(c[nz]), count_as: pa.array(cnt[nz])})

    exact = grouped_sums(keyed.map_batches(recount, batch_format="pyarrow"),
                         [key_col], [count_as], small_key_space=True)
    floor = support * total

    def keep(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return b.filter(pc.greater(b.column(count_as), pa.scalar(float(floor))))

    return exact.map_batches(keep, batch_format="pyarrow"), total


def derive_salt(ds, key_col: str, num_partitions: int, max_salt: int = 64,
                lanes_per_partition: int = 8) -> int:
    """MEASURED auto-salt for a skewed hash exchange (VERDICT r4 next #4:
    hand-set salt constants don't survive re-tuning at 100 TB).

    Rule: a hash exchange over P partitions is balanced only when no single
    key carries more than one *lane target* = total / (lanes_per_partition
    * P) of the rows — the 8x key-multiplicity headroom makes the
    balls-in-bins assignment of keys to partitions even out (a key space of
    ~P keys hashes 3-4 keys into some partition and 0 into others; 8P-way
    granularity caps that relative deviation). The heaviest measured key
    then needs ceil(max_count / lane_target) salt lanes.

    Measurement is the exact heavy-hitter pre-pass (:func:`heavy_hitters_
    exact`, support = 1 / (lanes_per_partition * P)): one narrow extra pass
    over the keyed projection, bounded MG state per block, <= 2 *
    lanes_per_partition * P candidate rows on the driver. Keys below the
    lane target never need salting, so the pre-pass's support floor is
    exactly the decision boundary. Returns 1 (no salting) when nothing
    exceeds the lane target — toy inputs and already-wide key spaces pay
    only the pre-pass."""
    support = 1.0 / max(1, lanes_per_partition * num_partitions)
    hh, total = heavy_hitters_exact(ds, key_col, support=support)
    rows = hh.take_all()  # <= ~2 * lanes_per_partition * P rows
    if not rows or total == 0:
        return 1
    max_n = max(int(r["n"]) for r in rows)
    lane_target = max(1.0, total * support)
    return int(np.clip(int(np.ceil(max_n / lane_target)), 1, max_salt))

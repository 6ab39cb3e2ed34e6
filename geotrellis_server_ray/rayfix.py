"""Surgical, version-guarded workaround for a Ray Data 2.49 hash-shuffle
join defect observed in this engine's sparse exchanges.

Mechanism (ray/data/_internal/execution/operators/hash_shuffle.py):
``_shuffle_block`` early-returns for zero-row input blocks WITHOUT sending
any partition shards — including the schema-broadcast shards that are only
attached to the FIRST submitted block per join side — yet the operator still
flips ``_has_schemas_broadcasted``.  Ray Data's own operators (filter,
aggregate, map tasks whose UDF emits nothing) produce zero-row blocks with
an EMPTY schema ``(0 rows, 0 columns)``, and block arrival order is
nondeterministic under streaming execution.  So whenever such a block
happens to arrive first, join partitions that receive no data shards
finalize a column-less ``pa.Table`` and Acero aborts the whole dataset with
``No match or multiple matches for key field reference FieldRef.Name(k)``.

This is a correctness hazard for ANY sparse join input — e.g. a near-dup
candidate edge stream where most shuffle partitions are empty — and it is
load/order dependent, so it cannot be excluded by sizing alone.

The fix: ``GuardedJoinAggregation`` — a drop-in replacement for Ray's
``JoiningShuffleAggregation`` (ray/data/.../operators/join.py:31-143, same
accept/finalize/clear protocol and the same Acero join call) with the one
missing case handled in ``finalize``: a side whose partition table lost its
schema entirely is rebuilt as an empty table whose key columns take their
types from the OTHER side's key columns (the only fields Acero requires;
the empty side contributes no rows to any join type, so its non-key columns
are unobservable in this partition's output).

It deliberately does NOT subclass ``JoiningShuffleAggregation``:
``ensure_join_finalize_patch`` swaps this class in for the module-global
name that ``JoinOperator.__init__`` resolves at plan time, which makes the
original class unreachable under its import path — any subclass shipped to
the aggregator actors by value (this repo registers its package with
``cloudpickle.register_pickle_by_value`` for cwd-independent drivers) would
then drag a BY-VALUE copy of the original base along and break the parent's
zero-arg ``super()`` identity check inside the worker.  Deriving straight
from ``StatefulShuffleAggregation`` (whose module binding we never touch)
keeps every base importable by reference in the workers.

Idempotent; applies only when the private surface it expects is present
(Ray 2.49.x).
"""

from __future__ import annotations

try:  # version guard: the private surface this mirrors (Ray 2.49.x)
    from ray.data._internal.arrow_block import ArrowBlockBuilder
    from ray.data._internal.execution.operators.hash_shuffle import (
        StatefulShuffleAggregation,
    )
    from ray.data._internal.execution.operators.join import (
        _JOIN_TYPE_TO_ARROW_JOIN_VERB_MAP,
    )

    _RAY_JOIN_SURFACE = True
except Exception:  # pragma: no cover - future ray versions
    StatefulShuffleAggregation = object  # type: ignore[assignment,misc]
    _RAY_JOIN_SURFACE = False


class GuardedJoinAggregation(StatefulShuffleAggregation):
    """Ray's joining aggregation + the empty-side schema guard (see module
    docstring). Constructor signature matches the factory call in
    ``JoinOperator.__init__`` exactly."""

    def __init__(
        self,
        *,
        aggregator_id: int,
        join_type,
        left_key_col_names,
        right_key_col_names,
        target_partition_ids,
        data_context,
        left_columns_suffix=None,
        right_columns_suffix=None,
    ):
        super().__init__(aggregator_id)
        assert len(left_key_col_names) > 0, "join requires at least one key column"
        assert len(left_key_col_names) == len(right_key_col_names)

        self._left_key_col_names = left_key_col_names
        self._right_key_col_names = right_key_col_names
        self._join_type = join_type
        self._left_columns_suffix = left_columns_suffix
        self._right_columns_suffix = right_columns_suffix

        self._partition_builders = {
            input_seq_id: {
                partition_id: ArrowBlockBuilder()
                for partition_id in target_partition_ids
            }
            for input_seq_id in (0, 1)
        }

    def accept(self, input_seq_id: int, partition_id: int, partition_shard):
        assert 0 <= input_seq_id < 2
        self._partition_builders[input_seq_id][partition_id].add_block(partition_shard)

    def finalize(self, partition_id: int):
        import pyarrow as pa

        left: pa.Table = self._partition_builders[0][partition_id].build()
        right: pa.Table = self._partition_builders[1][partition_id].build()

        left_on = list(self._left_key_col_names)
        right_on = list(self._right_key_col_names)

        # --- the guard: a side that received no shards at all (schema
        # broadcast missed, see module docstring) builds as a zero-column
        # table. Rebuild it as an empty table with just its key columns,
        # typed from the other side, so Acero sees the promised key fields.
        if left.num_columns == 0 and right.num_columns == 0:
            return pa.table({})
        if left.num_columns == 0 and left.num_rows == 0:
            left = pa.table({
                lk: pa.array([], type=right.schema.field(rk).type)
                for lk, rk in zip(left_on, right_on)
            })
        elif right.num_columns == 0 and right.num_rows == 0:
            right = pa.table({
                rk: pa.array([], type=left.schema.field(lk).type)
                for lk, rk in zip(left_on, right_on)
            })

        return left.join(
            right,
            join_type=_JOIN_TYPE_TO_ARROW_JOIN_VERB_MAP[self._join_type],
            keys=left_on,
            right_keys=right_on,
            left_suffix=self._left_columns_suffix,
            right_suffix=self._right_columns_suffix,
        )

    def clear(self, partition_id: int):
        self._partition_builders[0].pop(partition_id, None)
        self._partition_builders[1].pop(partition_id, None)


def ensure_join_finalize_patch() -> bool:
    """Install GuardedJoinAggregation as the default join aggregation
    (idempotent). Returns True when active, False when the Ray internals
    moved and the guard could not be applied — callers must treat False as
    "native joins may crash on sparse inputs", not as an error."""
    if not _RAY_JOIN_SURFACE:
        return False
    try:
        from ray.data._internal.execution.operators import join as _rj

        if _rj.JoiningShuffleAggregation is GuardedJoinAggregation:
            return True
        if not hasattr(_rj.JoiningShuffleAggregation, "_get_partition_builder"):
            return False
        # JoinOperator.__init__ resolves the module-global name at plan time;
        # validation there only requires a StatefulShuffleAggregation subclass
        _rj.JoiningShuffleAggregation = GuardedJoinAggregation
        return True
    except Exception:  # pragma: no cover
        return False

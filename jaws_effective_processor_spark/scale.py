"""Cluster-scale conf sizing — the knobs that must CHANGE between
local[32]/sf0.1 and a 1000-executor/100 TB deployment, computed from
the two numbers that actually drive them (input bytes, executor
cores) instead of being hand-tuned per site.

Everything else in `session.get_spark` ships unchanged (AQE, skew
join, Arrow, UTC, the InferFiltersFromGenerate exclusion); the values
here are the ones where a local constant silently becomes a scale
bug:

- `spark.sql.shuffle.partitions`: the *initial* partition count AQE
  coalesces DOWN from — it must be sized so one shuffle partition of
  the largest shuffle fits comfortably in an executor core's memory
  share. Too low cannot be fixed at runtime (AQE only merges, it
  never splits a too-large partition except via skew-join handling),
  which is exactly the 100 TB failure mode: a 32-partition shuffle of
  a 10 TB join spills and dies. We size it as input_bytes /
  PARTITION_TARGET_BYTES, floored at total cores and capped at
  MAX_SHUFFLE_PARTITIONS (AQE merges the excess cheaply).
- `spark.sql.files.maxPartitionBytes`: scan-split granularity; the
  default 128 MiB is right at scale, but local tests shrink it via
  spread_if_undersplit instead — deployment keeps the default and
  relies on file splits for parallelism.
- `spark.sql.adaptive.advisoryPartitionSizeInBytes`: the size AQE
  coalesces toward; kept at the same target as the shuffle sizing so
  pre- and post-AQE geometry agree.

`recommended_conf` returns plain strings ready for
`SparkSession.builder.config(...)` / `spark-submit --conf`, and
`tests/test_scale.py` pins the monotonicity and bounds (more data
never yields fewer partitions; every value stays inside its
documented envelope), so the sizing logic cannot quietly regress.
"""

from __future__ import annotations

# one reducer's working set: 200 MiB of shuffle input per partition
# keeps the sort/aggregate buffers inside a 1-2 GiB-per-core executor
# with headroom for the object-overhead multiplier on deserialized
# rows (the standard 2-4x)
PARTITION_TARGET_BYTES = 200 * 1024 * 1024
# backstop against degenerate inputs; AQE merges excess partitions at
# ~no cost, but the scheduler pays per-task overhead that stops being
# noise somewhere past a million tasks. The cap must sit ABOVE the
# target deployment's size-based count (100 TB / 200 MiB = ~525k) or
# it would silently reintroduce the spill it exists to prevent —
# beyond it, partitions grow past the per-reducer target and the
# deployment needs more memory per core, a conscious trade recorded
# here rather than an implicit one
MAX_SHUFFLE_PARTITIONS = 1_000_000


def shuffle_partitions(input_bytes: int, total_cores: int) -> int:
    """Initial shuffle partition count for a job whose largest shuffle
    moves ~`input_bytes` (pre-aggregation upper bound: the input
    scan). Never below the cluster's core count (idle cores are pure
    waste); the MAX_SHUFFLE_PARTITIONS cap applies only to the
    size-derived count, so the core floor always wins (a >1M-core
    cluster gets one partition per core, never fewer)."""
    if input_bytes < 0 or total_cores <= 0:
        raise ValueError("input_bytes >= 0 and total_cores > 0 required")
    by_size = -(-input_bytes // PARTITION_TARGET_BYTES)  # ceil div
    return int(max(total_cores, min(MAX_SHUFFLE_PARTITIONS, by_size)))


# deserialized-row expansion over on-wire shuffle bytes: Spark's
# tuning guide's standard 2-4x object overhead, taken at the
# conservative end so the floor is a real no-spill guarantee
DESERIALIZED_EXPANSION = 4
# the fixed reservation Spark subtracts from the heap before the
# unified execution/storage region is carved out
EXECUTOR_RESERVED_BYTES = 300 * 1024 * 1024
# spark.memory.fraction default: the unified region is 0.6 of
# (heap - reserved); expressed as a ratio pair for exact integer math
_UNIFIED_NUM, _UNIFIED_DEN = 3, 5  # 0.6 == 3/5
# a broadcast relation is pinned in EVERY executor for the query's
# lifetime; capping it at 1/16 of the heap keeps several concurrent
# broadcasts + execution memory coexisting without eviction pressure
BROADCAST_HEAP_DIVISOR = 16
# Spark's own default threshold — the floor, so a small-executor site
# never silently disables the dim broadcasts the star joins rely on
_BROADCAST_FLOOR_BYTES = 10 * 1024 * 1024


def min_executor_memory_bytes(cores_per_executor: int) -> int:
    """Executor heap floor for spill-free reducers: every concurrently
    running task (one per core) must hold one deserialized shuffle
    partition — PARTITION_TARGET_BYTES on the wire, x
    DESERIALIZED_EXPANSION on heap — inside the unified region, which
    is only 3/5 of (heap - the 300 MiB reservation). Below this floor
    the sizing in shuffle_partitions stops being a no-spill guarantee
    and becomes merely a spill bound. Exact integer arithmetic
    (ceil of x / (3/5) = ceil(5x / 3))."""
    if cores_per_executor <= 0:
        raise ValueError("cores_per_executor > 0 required")
    working = (
        cores_per_executor * PARTITION_TARGET_BYTES * DESERIALIZED_EXPANSION
    )
    unified_needed = -(-working * _UNIFIED_DEN // _UNIFIED_NUM)  # ceil 5x/3
    return int(EXECUTOR_RESERVED_BYTES + unified_needed)


def broadcast_threshold_bytes(executor_memory_bytes: int) -> int:
    """spark.sql.autoBroadcastJoinThreshold sizing: the largest
    relation the planner may broadcast, capped at heap /
    BROADCAST_HEAP_DIVISOR (the copy is pinned per executor for the
    query's lifetime, alongside execution memory and other concurrent
    broadcasts) and floored at Spark's own 10 MiB default so the
    star-schema dim broadcasts this engine leans on stay on even for
    small executors — at which point the floor, not the cap, is the
    conscious trade."""
    if executor_memory_bytes <= 0:
        raise ValueError("executor_memory_bytes > 0 required")
    return int(
        max(
            _BROADCAST_FLOOR_BYTES,
            executor_memory_bytes // BROADCAST_HEAP_DIVISOR,
        )
    )


def recommended_executor_conf(cores_per_executor: int) -> dict[str, str]:
    """The per-executor conf block paired with recommended_conf: heap
    sized for spill-free reducers at the partition target, broadcast
    threshold derived from that heap."""
    mem = min_executor_memory_bytes(cores_per_executor)
    return {
        # UNIT TRAP: spark.executor.memory parses a unitless value as
        # MiB (bytesConf(ByteUnit.MiB)) — a raw byte count would
        # request ~10^6x the intended heap. The explicit "b" suffix
        # makes it bytes. spark.sql.autoBroadcastJoinThreshold is the
        # opposite: unitless IS bytes.
        "spark.executor.memory": f"{mem}b",
        "spark.sql.autoBroadcastJoinThreshold": str(
            broadcast_threshold_bytes(mem)
        ),
    }


def recommended_conf(
    input_bytes: int, total_cores: int
) -> dict[str, str]:
    """The scale-dependent conf block for a deployment reading
    ~`input_bytes` on `total_cores` executor cores total."""
    parts = shuffle_partitions(input_bytes, total_cores)
    return {
        "spark.sql.shuffle.partitions": str(parts),
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": str(
            PARTITION_TARGET_BYTES
        ),
        # scan splits: keep the 128 MiB default explicit so a site
        # override is a conscious decision, not an inherited surprise
        "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    }

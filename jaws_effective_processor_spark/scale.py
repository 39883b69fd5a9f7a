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

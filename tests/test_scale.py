"""Deployment conf sizing (scale.py): the shuffle-partition formula
must hold across the whole envelope from the local fixtures to the
advertised 100 TB / 1000-executor deployment."""

from __future__ import annotations

import pytest

from jaws_effective_processor_spark.scale import (
    MAX_SHUFFLE_PARTITIONS,
    PARTITION_TARGET_BYTES,
    recommended_conf,
    shuffle_partitions,
)

TB = 1024**4


def test_local_floor_is_core_count():
    # sf0.1 (~100 MB) on 32 cores: size-based count is 1; the floor
    # keeps every core busy
    assert shuffle_partitions(100 * 1024 * 1024, 32) == 32


def test_100tb_sizing_is_spill_safe_and_bounded():
    parts = shuffle_partitions(100 * TB, 1000 * 8)
    # every partition at or under the per-reducer target...
    assert (100 * TB) / parts <= PARTITION_TARGET_BYTES
    # ...while staying inside the task-overhead backstop
    assert 8000 <= parts < MAX_SHUFFLE_PARTITIONS  # cap not engaged at target scale


def test_monotone_in_data_never_fewer_partitions():
    cores = 256
    prev = 0
    for b in (0, 1, 10**9, 10**12, 10 * TB, 100 * TB, 1000 * TB):
        cur = shuffle_partitions(b, cores)
        assert cur >= prev, (b, cur, prev)
        prev = cur


def test_cap_engages_only_at_extreme_scale():
    assert shuffle_partitions(10**18, 1000) == MAX_SHUFFLE_PARTITIONS


def test_conf_block_shape():
    conf = recommended_conf(100 * TB, 8000)
    assert set(conf) == {
        "spark.sql.shuffle.partitions",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.files.maxPartitionBytes",
    }
    assert all(isinstance(v, str) and int(v) > 0 for v in conf.values())


def test_invalid_inputs_rejected():
    with pytest.raises(ValueError):
        shuffle_partitions(-1, 8)
    with pytest.raises(ValueError):
        shuffle_partitions(10, 0)


def test_executor_memory_floor_covers_concurrent_reducers():
    from jaws_effective_processor_spark.scale import (
        DESERIALIZED_EXPANSION,
        EXECUTOR_RESERVED_BYTES,
        min_executor_memory_bytes,
    )

    for cores in (1, 4, 8, 16):
        mem = min_executor_memory_bytes(cores)
        # the unified region (3/5 of heap minus the reservation) must
        # hold one deserialized partition per concurrent task
        unified = (mem - EXECUTOR_RESERVED_BYTES) * 3 // 5
        assert unified >= (
            cores * PARTITION_TARGET_BYTES * DESERIALIZED_EXPANSION
        ), cores
    # monotone in cores: more concurrency never needs less memory
    assert min_executor_memory_bytes(8) > min_executor_memory_bytes(4)


def test_broadcast_threshold_floor_and_cap():
    from jaws_effective_processor_spark.scale import (
        BROADCAST_HEAP_DIVISOR,
        broadcast_threshold_bytes,
        min_executor_memory_bytes,
    )

    # tiny executor: the Spark-default 10 MiB floor holds (dim
    # broadcasts stay on)
    assert broadcast_threshold_bytes(64 * 1024 * 1024) == 10 * 1024 * 1024
    # sized executor: cap engages at heap/divisor and stays monotone
    mem8 = min_executor_memory_bytes(8)
    assert broadcast_threshold_bytes(mem8) == mem8 // BROADCAST_HEAP_DIVISOR
    assert broadcast_threshold_bytes(2 * mem8) >= broadcast_threshold_bytes(
        mem8
    )


def test_executor_conf_block_shape_and_consistency():
    from jaws_effective_processor_spark.scale import (
        broadcast_threshold_bytes,
        min_executor_memory_bytes,
        recommended_executor_conf,
    )

    conf = recommended_executor_conf(8)
    assert set(conf) == {
        "spark.executor.memory",
        "spark.sql.autoBroadcastJoinThreshold",
    }
    # executor.memory parses UNITLESS as MiB — the value must carry an
    # explicit byte suffix or the request inflates ~10^6x
    assert conf["spark.executor.memory"].endswith("b")
    mem = int(conf["spark.executor.memory"][:-1])
    assert mem == min_executor_memory_bytes(8)
    # the SQL threshold is the opposite convention: unitless IS bytes
    assert int(conf["spark.sql.autoBroadcastJoinThreshold"]) == (
        broadcast_threshold_bytes(mem)
    )


def test_executor_sizing_invalid_inputs_rejected():
    from jaws_effective_processor_spark.scale import (
        broadcast_threshold_bytes,
        min_executor_memory_bytes,
    )

    with pytest.raises(ValueError):
        min_executor_memory_bytes(0)
    with pytest.raises(ValueError):
        broadcast_threshold_bytes(0)

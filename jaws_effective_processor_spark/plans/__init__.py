"""Physical-plan introspection (the 100 TB discipline layer).

The reference has no optimizer (SURVEY.md §4) — Catalyst supplies
pushdown/pruning/join-selection for free, but only if the plans we
declare actually trigger them. This module turns `.explain` into
assertable facts so tests pin the physical properties that matter at
scale: filters reaching the parquet scan, small dims broadcast, no
accidental cartesian products, bounded shuffle counts.
"""

from .inspect import (
    broadcast_join_count,
    broadcast_subtrees,
    explain_str,
    has_cartesian,
    pushed_filters,
    read_schemas,
    shuffle_count,
    trivial_join_conditions,
    whole_stage_codegen_ids,
)

__all__ = [
    "broadcast_join_count",
    "broadcast_subtrees",
    "explain_str",
    "has_cartesian",
    "pushed_filters",
    "read_schemas",
    "shuffle_count",
    "trivial_join_conditions",
    "whole_stage_codegen_ids",
]

"""PySpark-native effective-alarm-state engine.

A from-scratch re-expression of the capabilities of
JeffersonLab/jaws-effective-processor (a set of 8 Kafka Streams apps
computing per-alarm *effective state*) as an idiomatic Apache Spark
engine:

- batch surface: DataFrame/SQL pipelines (Catalyst-optimized) that
  compute the settled effective-state snapshot from compacted event
  logs (`pipeline.py`, `operators/`),
- streaming surface: Structured Streaming rules with per-key state
  (`streaming/`),
- LLM-data-pipeline extensions: dedup, similarity search, text
  analysis, multimodal column plumbing (`functions/`).

Reference semantics are cited per-operator as ``file:line`` into the
reference repo (see SURVEY.md). No code is ported from the reference;
it is a Java/Kafka-Streams record-at-a-time engine while this package
declares logical plans and lets Catalyst/Tungsten execute them.
"""

__version__ = "0.1.0"

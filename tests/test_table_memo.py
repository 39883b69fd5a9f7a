"""Pins for the load_table plan memo (cache.SessionPlanCache): object
reuse per (session, sf_dir, table), no cross-entry aliasing, no
persistence side-effects, and — the safety property — mutable-path
readers in sources/io and the streaming stores never route through
the memo (a memoized relation would serve a stale file listing after
a rewrite)."""

from __future__ import annotations

from pyspark.sql import functions as F

from jaws_effective_processor_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_load_table_memoizes_per_session_and_key(spark):
    a = load_table(spark, SF_SMOKE, "nation")
    assert load_table(spark, SF_SMOKE, "nation") is a
    assert load_table(spark, SF_SMOKE, "region") is not a
    # no persistence side-effect: the memo reuses the PLAN only
    assert a.storageLevel.useMemory is False
    assert a.storageLevel.useDisk is False


def test_mutable_path_readers_see_rewrites(spark, tmpdir):
    """A path rewritten between reads must serve the NEW rows through
    the direct spark.read path used by stores/topics — and would not
    through load_table, which is why writers never route reads
    through it (cache.SessionPlanCache docstring)."""
    import os

    p = os.path.join(tmpdir, "mutable")
    spark.range(0, 3).write.mode("overwrite").parquet(p)
    assert spark.read.parquet(p).count() == 3
    spark.range(0, 7).write.mode("overwrite").parquet(p)
    assert spark.read.parquet(p).count() == 7


def test_memo_serves_correct_schema_per_table(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    emb = load_table(spark, SF_SMOKE, "embeddings")
    assert "text" in docs.columns and "embedding" in emb.columns
    # projections on the shared relation object stay independent
    a = docs.select("doc_id")
    b = docs.select(F.col("n_chars"))
    assert a.columns == ["doc_id"] and b.columns == ["n_chars"]

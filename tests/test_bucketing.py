"""Bucketing co-location: a large-large equi-join over pre-bucketed
tables must plan with ZERO exchanges (the 100 TB join lever)."""

from __future__ import annotations

import uuid

import pytest

from jaws_effective_processor_spark.plans import shuffle_count
from jaws_effective_processor_spark.sources import write_bucketed
from jaws_effective_processor_spark.tables import load_table
from tests.conftest import SF_SMOKE


def test_bucketed_join_has_no_shuffle(spark):
    sfx = uuid.uuid4().hex[:8]
    t_o, t_l = f"b_orders_{sfx}", f"b_lineitem_{sfx}"
    orders = load_table(spark, SF_SMOKE, "orders")
    lineitem = load_table(spark, SF_SMOKE, "lineitem")
    try:
        write_bucketed(orders, t_o, "o_orderkey", buckets=8)
        write_bucketed(lineitem, t_l, "l_orderkey", buckets=8)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bo, bl = spark.table(t_o), spark.table(t_l)
        joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey)
        assert shuffle_count(joined) == 0
        # and the co-located join returns exactly the shuffled result
        expected = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql(f"DROP TABLE IF EXISTS {t_o}")
        spark.sql(f"DROP TABLE IF EXISTS {t_l}")


def test_doc_embedding_feature_join_zero_exchange_when_bucketed(spark):
    """Closes q_doc_embedding_norms' deployment claim: with documents
    and embeddings landed bucketed on the id (the feature-store
    layout), the query's exact join+reduce shape plans with only the
    final |langs|-row aggregation exchange — the corpus-sized
    large-large join itself moves nothing. The scan-local feature
    expressions (token count, fixed-point norm) must not break the
    bucketed distribution."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    from jaws_effective_processor_spark.functions.similarity import (
        OUTLIER_MICRO,
    )

    sfx = _uuid.uuid4().hex[:8]
    t_d, t_e = f"b_docs_{sfx}", f"b_emb_{sfx}"
    docs = load_table(spark, SF_SMOKE, "documents")
    emb = load_table(spark, SF_SMOKE, "embeddings")
    try:
        write_bucketed(docs, t_d, "doc_id", buckets=8)
        write_bucketed(emb, t_e, "vec_id", buckets=8)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bd = spark.table(t_d).select(
            "doc_id",
            "lang",
            F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
        )
        be = spark.table(t_e).select(
            F.col("vec_id").alias("doc_id"),
            F.aggregate(
                F.transform(
                    F.col("embedding").cast("array<double>"),
                    lambda x: F.floor(x * OUTLIER_MICRO).cast("long"),
                ),
                F.lit(0).cast("long"),
                lambda a, x: a + x * x,
            ).alias("norm_sq"),
        )
        joined = bd.join(be, "doc_id")
        # join stage: zero exchanges (bucket co-location survives the
        # scan-local projections)
        assert shuffle_count(joined) == 0
        report = joined.groupBy("lang").agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.expr("sum(norm_sq) DIV count(*)").alias("mean_norm_sq_micro2"),
        )
        # full report: exactly ONE exchange — the bounded lang rollup
        assert shuffle_count(report) == 1
        # and the co-located result matches the shuffled-path query.
        # RAW function, not QUERIES[...]: executing the registry's
        # prepared-plan entry here would FINALIZE its AQE plan under
        # the disabled broadcast threshold, and the shuffle-budget
        # test would later read that frozen sort-merge plan from the
        # shared cache (the same stale-finalized-plan trap
        # test_fuzzy_pairs_parity_without_broadcast documents)
        from jaws_effective_processor_spark.functions.similarity import (
            q_doc_embedding_norms,
        )

        expected = {
            r["lang"]: (r["n_docs"], r["n_tokens"], r["mean_norm_sq_micro2"])
            for r in q_doc_embedding_norms(spark, SF_SMOKE).collect()
        }
        got = {
            r["lang"]: (r["n_docs"], r["n_tokens"], r["mean_norm_sq_micro2"])
            for r in report.collect()
        }
        assert got == expected
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql(f"DROP TABLE IF EXISTS {t_d}")
        spark.sql(f"DROP TABLE IF EXISTS {t_e}")

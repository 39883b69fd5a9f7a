"""ANN quality: multiprobe IVF must recover recall nprobe=1 loses.

Oracle parity (test_entry_contract) proves each variant computes its
own spec; this asserts the SEMANTIC ordering between the variants —
recall vs exact brute force can only improve as nprobe grows, because
probe p's candidate set is a superset of probe p-1's.
"""

from __future__ import annotations

from jaws_effective_processor_spark.entry_queries import QUERIES
from tests.conftest import SF_ORACLE


def _topk(df):
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def _recall(approx: dict, exact: dict) -> float:
    hits = total = 0
    for q, neigh in exact.items():
        total += len(neigh)
        hits += len(neigh & approx.get(q, set()))
    return hits / total


def test_multiprobe_recall_dominates_single_probe(spark):
    exact = _topk(QUERIES["knn_bruteforce"](spark, SF_ORACLE))
    single = _recall(_topk(QUERIES["knn_ivf"](spark, SF_ORACLE)), exact)
    multi = _recall(
        _topk(QUERIES["knn_ivf_multiprobe"](spark, SF_ORACLE)), exact
    )
    assert multi >= single, (multi, single)
    # probing 2 of 8 cells must find at least a quarter of the true
    # top-k on this corpus (loose floor; measured ~0.5+)
    assert multi >= 0.25, multi


def test_hard_negatives_match_ground_truth_replay(spark):
    """Each mined (positive, hard-negative) pair is exactly the
    highest-ranked same-/different-label neighbor in the exact top-K
    shortlist, the margin is their permyriad difference, and queries
    whose shortlist lacks either side emit nothing."""
    from jaws_effective_processor_spark.functions.similarity import (
        _brute_neighbors,
    )

    nb: dict[int, list] = {}
    truth: dict[int, int] = {}
    for r in _brute_neighbors(spark, SF_ORACLE).collect():
        nb.setdefault(r["query_id"], []).append(r)
        truth[r["query_id"]] = r["true_label"]
    expected = {}
    for q, rows in nb.items():
        rows.sort(key=lambda r: r["rank"])
        pos = next(
            (r for r in rows if r["neighbor_label"] == truth[q]), None
        )
        neg = next(
            (r for r in rows if r["neighbor_label"] != truth[q]), None
        )
        if pos is not None and neg is not None:
            expected[q] = (
                pos["neighbor_id"],
                neg["neighbor_id"],
                pos["cos_permyriad"] - neg["cos_permyriad"],
            )
    got = {
        r["query_id"]: (r["pos_id"], r["neg_id"], r["margin_permyriad"])
        for r in QUERIES["hard_negatives"](spark, SF_ORACLE).collect()
    }
    assert got == expected

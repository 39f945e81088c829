"""Structural invariants for the round-9 additions (q440/q441) plus
cross-query consistency against the operators they derive from."""

from __future__ import annotations

from tests.conftest import SF_DIR


def _q(spark, name):
    from __spark_entry__ import queries

    return queries()[name](spark, SF_DIR)


def test_q440_leakage_counts_partition(spark):
    row = _q(spark, "q440_neardup_split_leakage").collect()[0]
    assert 0 <= row["n_cross"] <= row["n_pairs"]
    assert 0 <= row["n_val"] <= row["n_docs"]
    assert 0 <= row["expected_milli"] <= 1000
    if row["n_pairs"] > 0:
        assert 0 <= row["leak_milli"] <= 1000
        assert row["leak_milli"] == (1000 * row["n_cross"]) // row["n_pairs"]
    else:
        assert row["leak_milli"] is None


def test_q440_pairs_match_q416_edge_count(spark):
    # both derive from the same canonical verified-edge relation
    row = _q(spark, "q440_neardup_split_leakage").collect()[0]
    t416 = _q(spark, "q416_neardup_transitivity").collect()[0]
    assert row["n_pairs"] == t416["n_edges"]


def test_q441_budget_identities(spark):
    rows = _q(spark, "q441_dedup_token_budget").collect()
    q40 = _q(spark, "q40_dedup_exact").collect()
    n_digests = len(q40)
    n_docs_total = sum(r["copies"] for r in q40)
    assert sum(r["n_docs"] for r in rows) == n_docs_total
    # exactly one keeper per content digest, whatever source holds it
    assert sum(r["n_kept"] for r in rows) == n_digests
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_docs"]
        assert 0 <= r["tokens_kept"] <= r["tokens_total"]
        assert r["savings_milli"] == (
            1000 * (r["tokens_total"] - r["tokens_kept"])
        ) // r["tokens_total"]

"""All-duplicates corpus totality ledgers (round 12, VERDICT r11 item
4) - the census layer the 0-row / 1-row corpora cannot reach.

Two fixtures (``tools/dup_fixture.py``):

- **const** (/tmp/sf_const -> DEGENERATE_SWEEP_CONST.json): first 32
  template rows, every NON-KEY column overwritten with the first
  row's value - the PK-VALID "every document's content is identical"
  corpus. This is the layer the mandate aimed at: zero-variance
  moments with real degrees of freedom, every dedup pair a candidate,
  ROUND/ordering ties from identical values. It found SEVEN real
  divergences, all fixed with guard parity (Spark's native ``corr``
  ANSI-errors on a zero-variance group where DuckDB NULLs ->
  explicit covar/NULLIF(sd*sd) ratio on both engines in q64/q140;
  zero-interval time-weights q134; zero-distance JL/LOF ratios
  q334/q382; one-class LN prior q337; zero-total Neyman weights
  q415). 436/436 green, no ledger.

- **dup** (/tmp/sf_dup -> DEGENERATE_SWEEP_DUP.json): the first row
  replicated 32x BYTE-IDENTICAL, primary keys included. This corpus
  VIOLATES the star schema's key contract (doc_id/vec_id/event_id/
  o_orderkey unique), and on out-of-contract input the two engines'
  formulations legitimately diverge: the DuckDB twins are written
  relationally (unnest + GROUP BY key, per-key running tables), so
  duplicated keys COLLAPSE (or fan out quadratically through key
  joins), while the Spark plans are array-native and row-wise. The
  24 ledgered queries below are exactly the key-dependent shapes;
  every one was individually triaged - e.g. q201's "tie" divergence
  is its tie-BREAK column (the PK) being duplicated, not a latent
  rank bug. (q362's oracle - a per-key unrolled CTE chain that fanned
  out EXPONENTIALLY on duplicated keys and could only be ledgered as
  a recorded OOM - was rewritten in r13 to the bounded running-min
  formulation and now VERIFIES green here; oracle_check keeps the
  DuckDB memory/temp caps as the backstop.) The census still proved
  the other 412 queries total even on key-violating input.
"""

from __future__ import annotations

import os

from tests.conftest import (
    REPO_ROOT as REPO,
    artifact_green as _green,
    env_gated_names as _env_gated,
    load_artifact as _load,
)
DUP = os.path.join(REPO, "DEGENERATE_SWEEP_DUP.json")
CONST = os.path.join(REPO, "DEGENERATE_SWEEP_CONST.json")
#: the fifth census layer (r12): pathological-but-in-contract text
#: (tools/text_fixture.py - empty/whitespace/punctuation/multibyte
#: documents). Found 8 real divergences, all fixed (trim-vs-strip
#: tokenizer parity q126, byte-vs-char phash q159,
#: array_to_string-on-empty NULL q300/q301, NULLIF on zero-token/
#: zero-weight/zero-tie denominators q31/q44/q105/q324/q327);
#: fully green, no ledger.
TEXT = os.path.join(REPO, "DEGENERATE_SWEEP_TEXT.json")
#: the seventh census layer (r13): PARTIAL RECORDS
#: (tools/null_fixture.py - NULLs cycled through every optional
#: column; keys, timestamps and embedding vectors stay non-null).
#: The realistic "scraper emitted an incomplete record" corpus - the
#: reference's own C6 maps a sentinel salary to NULL, so NULL-bearing
#: rows are squarely in contract. Found ~53 divergences across five
#: classes, every one fixed on both engines (Python-worker None
#: crashes, DuckDB concat/split_part NULL quirks, NULL-ordering pins,
#: null-safe joins for NULL-keyed groups, listwise-deletion policy
#: across the rank/stats family); fully green, no ledger.
NULLS = os.path.join(REPO, "DEGENERATE_SWEEP_NULL.json")
#: the EIGHTH census layer (r14): ALL-NULL OPTIONAL COLUMNS
#: (tools/null_fixture.py with every=1) - the totality endpoint of
#: the partial-records ramp. Every key/timestamp survives but every
#: optional value is NULL, so every GROUP EXISTS while every measure
#: aggregated over it is an all-NULL column: SUM/MIN/MAX go NULL per
#: group (not zero, not absent), COUNT(col)=0 under COUNT(*)=n, and
#: listwise deletion empties every frame that stays non-empty. Found
#: 7 real divergences, all in the gate/agreement family, all fixed
#: on both engines (per-cell when/otherwise parity with CASE...ELSE 0
#: in q367/q369/q390/q391/q433, NULLIF on the perfect-agreement
#: Fleiss kappa + zero-cell MCC/McNemar/Cochran denominators, and
#: q319's listwise feature deletion stated in both the Spark filter
#: and the oracle WHERE); fully green, no ledger.
ALLNULL = os.path.join(REPO, "DEGENERATE_SWEEP_ALLNULL.json")
#: the NINTH census layer (r14): SIGN CANCELLATION
#: (tools/signcancel_fixture.py - every numeric measure overwritten
#: with an alternating exact +-2.0, keys/timestamps/categoricals in
#: contract). Aggregates become EXACTLY ZERO from nonzero inputs -
#: the refunds-cancel-sales corpus: zero MEAN with nonzero variance
#: (the mirror of the const census's zero variance with nonzero
#: mean), zero group sums under nonzero counts, negative odd-group
#: residues. Found 4 real divergences, all the share/growth/
#: allocation family dividing by a zero-net sum (Spark ANSI error vs
#: DuckDB silent NULL-on-div-0): q102's per-order quantity total,
#: q137's prior-month revenue, q163's region/grand totals, q92's
#: grand total - all fixed with NULLIF stated on both engines
#: (allocation/share/growth against a zero-net base is NULL); fully
#: green, no ledger.
SIGNCANCEL = os.path.join(REPO, "DEGENERATE_SWEEP_SIGNCANCEL.json")

#: the PK-duplication class: oracle formulations that GROUP BY /
#: join / tie-break on a table's key column, which the byte-identical
#: corpus duplicates. Divergence is definitional on out-of-contract
#: input; all 25 are green on the PK-VALID const corpus (and the
#: 0-row / 1-row / tri-SF sweeps).
EXPECTED_PK_DUP = {
    # q102: per-order windows (sum_q, remainder rank) computed on the
    # lineitem side vs after the orders join collapse/fan out by 32x
    # when BOTH keys are duplicated - invisible in the first census
    # because the unpinned seed rows' keys did not even join; the
    # ORDER BY ALL pinning (code-review r12) made the corpus strictly
    # harsher.
    "q102_exact_allocation",
    "q50_cosine_topk", "q51_ann_lsh_topk", "q52_vector_norms",
    "q54_ivf_topk", "q86_sequence_packing", "q88_scd2_history",
    "q99_kmeans_assign", "q156_quantized_rerank",
    "q157_random_projection", "q179_scd2_asof_snapshot",
    "q184_multiprobe_ann", "q197_subtree_rollup",
    "q201_global_percent_rank", "q218_ngram_novelty",
    "q221_ann_recall", "q225_hybrid_rrf",
    "q252_consistent_hash_shards", "q257_ndcg_eval", "q276_sql_udfs",
    "q283_rank_agreement_rbo", "q284_mmr_rerank",
    "q285_gate_agreement_kappa", "q304_phrase_search",
    # q362 LEFT the ledger in r13: its oracle's per-key unrolled CTE
    # chain (exponential fan-out on duplicated keys, recorded as an
    # OOM here in r12) was replaced by the bounded running-min
    # formulation, under which the dup row VERIFIES green - the
    # farthest-first walk is multiplicity-insensitive when duplicate
    # rows are byte-identical.
}


def test_both_sweeps_cover_registry():
    from web_scraping_etl_pipeline_spark.plans import QUERIES

    for path in (DUP, CONST, TEXT, NULLS, ALLNULL, SIGNCANCEL):
        assert os.path.exists(path), (
            f"{os.path.basename(path)} missing - python tools/"
            f"dup_fixture.py then oracle_check --json"
        )
        records = _load(path)
        missing = sorted(set(QUERIES) - set(records) - _env_gated())
        assert missing == [], (
            f"{os.path.basename(path)}: {len(missing)} missing, "
            f"e.g. {missing[:5]}"
        )


def test_const_corpus_is_fully_green():
    """The PK-valid all-duplicates corpus has NO ledger: every query
    must be total and oracle-exact on zero-variance content."""
    bad = {
        n: str(r.get("err"))[:100]
        for n, r in _load(CONST).items()
        if not _green(r)
    }
    assert bad == {}, f"{len(bad)} const-corpus divergences: {bad}"


def test_text_corpus_is_fully_green():
    """The adversarial-text corpus has NO ledger either: every string
    a scraper could emit (empty, whitespace-only, multibyte, ...) is
    in-contract document content and both engines must agree."""
    bad = {
        n: str(r.get("err"))[:100]
        for n, r in _load(TEXT).items()
        if not _green(r)
    }
    assert bad == {}, f"{len(bad)} text-corpus divergences: {bad}"


def test_null_corpus_is_fully_green():
    """The partial-records corpus has NO ledger: an incomplete scraped
    record is in-contract input (C6's sentinel->NULL is the
    reference's own semantics) and every query must survive it with a
    stated NULL policy, identical on both engines."""
    bad = {
        n: str(r.get("err"))[:100]
        for n, r in _load(NULLS).items()
        if not _green(r)
    }
    assert bad == {}, f"{len(bad)} partial-records divergences: {bad}"


def test_allnull_corpus_is_fully_green():
    """The all-NULL-optional corpus has NO ledger: keys without
    values is the totality endpoint of the partial-records ramp, and
    every query must survive it with the same stated NULL policies
    (per-cell decisive gates, NULLIF'd degenerate denominators,
    listwise-deleted trainers) identical on both engines."""
    bad = {
        n: str(r.get("err"))[:100]
        for n, r in _load(ALLNULL).items()
        if not _green(r)
    }
    assert bad == {}, f"{len(bad)} all-NULL-corpus divergences: {bad}"


def test_signcancel_corpus_is_fully_green():
    """The sign-cancellation corpus has NO ledger: negative measures
    over the same keys (refunds, chargebacks, corrections) are
    in-contract business data, and every query must survive exact
    zero-net aggregates with a stated policy (NULL shares/growth/
    allocations against a zero-net base) identical on both engines."""
    bad = {
        n: str(r.get("err"))[:100]
        for n, r in _load(SIGNCANCEL).items()
        if not _green(r)
    }
    assert bad == {}, f"{len(bad)} sign-cancel divergences: {bad}"


def test_dup_corpus_green_or_pk_ledgered():
    bad = {
        n: str(r.get("err"))[:100]
        for n, r in _load(DUP).items()
        if n not in EXPECTED_PK_DUP and not _green(r)
    }
    assert bad == {}, (
        f"{len(bad)} dup-corpus divergences outside the PK ledger: "
        f"{bad}"
    )


def test_pk_ledger_rows_are_not_stale():
    """A ledgered query that now agrees even on PK-duplicated input
    should leave the ledger."""
    records = _load(DUP)
    stale = sorted(
        n for n in EXPECTED_PK_DUP if n in records and _green(records[n])
    )
    assert stale == [], f"ledger rows {stale} now pass - remove them"


def test_dup_sweep_rows_are_fresh():
    from tools.invariance_check import body_hash, oracle_hash
    from web_scraping_etl_pipeline_spark.plans import QUERIES

    for path in (DUP, CONST, TEXT, NULLS, ALLNULL, SIGNCANCEL):
        stale = sorted(
            n
            for n, rec in _load(path).items()
            if n in QUERIES
            and (
                rec.get("body_hash") != body_hash(n)
                or rec.get("oracle_hash") != oracle_hash(n)
            )
        )
        assert stale == [], (
            f"{os.path.basename(path)}: {len(stale)} rows predate a "
            f"rewrite, e.g. {stale[:5]}"
        )

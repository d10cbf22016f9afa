"""Global physical-plan audit over EVERY registered query (the 100 TB
red-flag sweep): no CartesianProduct, no row-at-a-time Python
(BatchEvalPython — Arrow paths show ArrowEvalPython/MapInPandas), and
BroadcastNestedLoopJoin only where a crossJoin against a broadcast
1-row/tiny frame is the designed plan. A new query that introduces an
unkeyed join or a row UDF fails here before it ever reaches a replica
run."""

from __future__ import annotations

import pytest

from nahuatl_data_pipeline_spark import registry
from tests.conftest import SF_SMOKE

# crossJoin against a broadcast scalar/tiny frame is the intended shape:
# q24/q44 (1-row query-count / norm totals), q51 (tiny seed table),
# q75 (1-row corpus N), q79 (1-row quantile cuts), q83 (1-row vocab
# totals), q94 (1-row grand totals + |A|x|B| marginal grid),
# q108 (1-row corpus N for idf + relative df cap), q109 (1-row
# vocabulary size V for add-alpha smoothing), q118 (1-row corpus N
# joined onto the vocab²-bounded pair table), q119 (1-row corpus N
# for the hash-mod negative draw), q120 (broadcast query side with a
# non-equi label predicate — q24's designed brute-force shape).
_BNLJ_OK = {
    "q24_cosine_topk",
    "q44_alignment_join",
    "q51_synthetic_corpus",
    "q75_tfidf_terms",
    "q79_approx_length_buckets",
    "q83_corpus_drift",
    "q94_event_weekday_chi2",
    "q108_tfidf_cosine_pairs",
    "q109_bigram_lm_score",
    "q118_token_collocations",
    "q119_negative_samples",
    "q120_hard_negatives",
    "q99_orders_profile",  # 1-row exact-distinct agg broadcast onto
    # the 1-row min/max/mean agg (r13 SortAggregate split)
    "q121_bloom_semijoin",  # three 1-row count aggregates crossJoined
    "q123_token_budget_select",  # 1-row quantile-cuts broadcast (bands)
    "q124_token_topn_other",  # 1-row grand total onto the <=21-row head
    "q125_price_percentile_bands",  # 1-row reference-cuts broadcast
    "q127_length_rule_kappa",  # 1-row marginal product onto 1-row diag
    "q128_bootstrap_mean_ci",  # 1-row CI stats onto the 1-row base agg
    "q138_dsir_importance",  # 1-row corpus totals broadcast crossJoin
    "q139_margin_topk",  # broadcast query side, non-equi (q24's shape)
    "q141_perplexity_buckets",  # q109's 1-row vocab + band-cuts broadcasts
    "q164_domain_stats",  # 1-row corpus-chars total broadcast crossJoin
}


@pytest.mark.parametrize("name", sorted(registry.queries()))
def test_no_plan_red_flags(spark, name):
    fn = registry.queries()[name]
    plan = fn(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, name
    assert "BatchEvalPython" not in plan, name  # row-at-a-time Python UDF
    if name not in _BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, name

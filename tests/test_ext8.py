"""Nonvacuity + invariants for the registry_ext8 family (the oracle
hash-match is the correctness gate; these pin the semantics a hash
can't see)."""

from stock_market_etl_pipeline_spark import registry

from conftest import SF_DIR


def test_turning_points_nonvacuous_and_bounded(spark):
    rows = registry.queries()["turning_points_test"](spark, SF_DIR).collect()
    assert rows, "no symbols"
    for r in rows:
        # T is bounded by the interior point count
        assert 0 <= r.n_turning <= max(r.n_obs - 2, 0)
    # price series are noisy: at least one symbol must actually turn
    assert any(r.n_turning > 0 for r in rows)


def test_topk_turnover_jaccard_range(spark):
    rows = registry.queries()["topk_turnover_monthly"](spark, SF_DIR).collect()
    assert rows, "no consecutive months"
    for r in rows:
        assert 0.0 <= r.jaccard <= 1.0
        assert 0 <= r.n_common <= 10


def test_markov_stationary_mass_conserved(spark):
    from stock_market_etl_pipeline_spark.registry_ext8 import _MK_SCALE

    rows = registry.queries()["markov_stationary_int"](spark, SF_DIR).collect()
    assert rows, "no event types"
    total = sum(r.mass_scaled for r in rows)
    # substochastic truncation only SHEDS mass (<=1 unit per state per
    # step per term), never creates it
    assert 0 < total <= _MK_SCALE
    # after 10 steps from uniform over a noisy chain, mass must have
    # actually moved (not still exactly uniform)
    masses = sorted(r.mass_scaled for r in rows)
    assert masses[0] != masses[-1]


def test_volume_lead_corr_bounded(spark):
    rows = registry.queries()["volume_lead_move_correlation"](
        spark, SF_DIR
    ).collect()
    assert rows, "no symbols"
    for r in rows:
        if r.lead_corr is not None:
            assert -1.0 <= r.lead_corr <= 1.0

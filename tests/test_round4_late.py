"""Sanity/bounds tests for the late round-4 report queries — the
oracle gate proves cross-engine equality; these pin invariants the
hash can't see (bounds, flag logic, composition consistency)."""

import pytest
from pyspark.sql import functions as F


def test_stream_incident_matches_batch_islands(spark, sf_dir):
    from porcupine_spark.streaming.windows import stream_incident_detect

    rows = stream_incident_detect(spark, sf_dir).collect()
    for r in rows:
        assert r.n_errors >= 5
        assert r.incident_end > r.incident_start


def test_stream_hll_bounds(spark, sf_dir):
    from porcupine_spark.operators.sketches import HLL_M
    from porcupine_spark.streaming.windows import stream_hourly_hll_users

    rows = stream_hourly_hll_users(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert 1 <= r.n_buckets_hit <= HLL_M
        assert r.hll_estimate_raw > 0
        # raw HLL (no small-range correction) is within its coarse
        # error envelope for these cardinalities
        assert r.hll_estimate_raw <= 4 * r.n_exact + 200


def test_priority_drift_grid_consistency(spark, sf_dir):
    from porcupine_spark.operators.quality import priority_mix_drift_chi2
    from porcupine_spark.tables import load_table

    rows = priority_mix_drift_chi2(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders").count()
    assert sum(r.n_orders for r in rows) == orders
    prios = {
        r.o_orderpriority
        for r in load_table(spark, sf_dir, "orders")
        .select("o_orderpriority").distinct().collect()
    }
    for r in rows:
        assert r.chi2_micro >= 0
        assert r.top_drifted_priority in prios


def test_dup_embedding_consistency_bounds(spark, sf_dir):
    from porcupine_spark.operators.dedup import (
        DEDUP_CANON_T, dup_embedding_consistency)

    rows = dup_embedding_consistency(spark, sf_dir).collect()
    for r in rows:
        assert r.jaccard >= DEDUP_CANON_T
        assert -1.0 - 1e-9 <= r.cosine <= 1.0 + 1e-9
        assert r.suspect == (1 if r.cosine < 0.5 else 0)


def test_quality_gate_kappa_identities(spark, sf_dir):
    from porcupine_spark.operators.curation import quality_gate_kappa

    r = quality_gate_kappa(spark, sf_dir).first()
    assert 0 <= r.n_agree <= r.n_docs
    assert 0 <= r.po_micro <= 1_000_000
    assert 0 <= r.pe_micro <= 1_000_000
    assert -1_000_000 <= r.kappa_micro <= 1_000_000
    # kappa's sign agrees with po vs pe
    assert (r.kappa_micro >= 0) == (r.po_micro >= r.pe_micro)


def test_verbatim_contamination_is_substring(spark, sf_dir):
    from porcupine_spark.operators.text import verbatim_contamination
    from porcupine_spark.tables import load_table

    rows = verbatim_contamination(spark, sf_dir).collect()
    texts = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    for r in rows:
        assert r.doc_id >= 10 and r.bench_id < 10
        assert r.probe in texts[r.doc_id]
        assert texts[r.bench_id].startswith(r.probe)


def test_dedup_source_shift_shares_balance(spark, sf_dir):
    from porcupine_spark.operators.dedup import dedup_source_shift

    rows = dedup_source_shift(spark, sf_dir).collect()
    for r in rows:
        assert 0 <= r.n_after <= r.n_before
    tot_shift = sum(r.shift_ppm for r in rows)
    # shifts are zero-sum up to per-source truncation slack
    assert abs(tot_shift) <= 2 * len(rows)


def test_length_variance_decomposition_identities(spark, sf_dir):
    from porcupine_spark.operators.vocabstats import (
        length_variance_decomposition)

    r = length_variance_decomposition(spark, sf_dir).first()
    assert 0 <= r.eta2_ppm <= 1_000_000
    # eta2 + within = 1e6 up to the per-group truncation slack
    assert 1_000_000 - r.n_sources <= r.eta2_ppm + r.within_ppm <= 1_000_000


def test_dim_scaling_plan_matches_numpy(spark, sf_dir):
    import math
    import numpy as np
    from porcupine_spark.operators.linalg import embedding_dim_scaling_plan
    from porcupine_spark.tables import load_table

    rows = {r.dim: r for r in embedding_dim_scaling_plan(spark, sf_dir).collect()}
    emb = np.stack([np.array(r.embedding) for r in
                    load_table(spark, sf_dir, "embeddings").collect()])
    xi = (emb.astype(np.float64) * 1e6).astype(np.int64)
    n = len(xi)
    for d in (0, 13, 63):
        sx = int(xi[:, d].astype(object).sum())
        sxx = int((xi[:, d].astype(object) ** 2).sum())
        var = (n * sxx - sx * sx) // (n * (n - 1))  # positive: floor==trunc
        assert rows[d].var_micro2 == var
        assert rows[d].std_micro == math.isqrt(var)
        assert rows[d].inv_scale_micro == 10**12 // math.isqrt(var)


def test_stream_scd2_versions_partition_history(spark, sf_dir):
    from porcupine_spark.streaming.stateful import stream_scd2_apply
    from porcupine_spark.tables import load_table

    rows = stream_scd2_apply(spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        assert r.valid_from_us < r.valid_to_us
        assert r.n_events >= 1
        by_user.setdefault(r.user_id, []).append(r)
    for u, vs in by_user.items():
        vs.sort(key=lambda r: r.valid_from_us)
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to_us == b.valid_from_us  # contiguous history
            assert a.attr != b.attr  # each version is a real change
    # closed-version event counts + each user's open version = all events
    n_events = load_table(spark, sf_dir, "events").count()
    closed = sum(r.n_events for r in rows)
    assert closed < n_events

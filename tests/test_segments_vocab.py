"""Semantics tests for segment-level dedup (operators/segments.py) and
vocabulary statistics (operators/vocabstats.py) on hand-built inputs —
the oracle gate proves cross-engine equality; these pin the edge cases
the synthetic corpus may not exercise (planted boilerplate segments,
within-doc-only repeats, Spearman on known rankings incl. ties)."""

import math

import pytest
from pyspark.sql import Row, functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source=s, n_chars=len(t))
         for i, (t, s) in enumerate(rows)]
    )


def seg_text(words, lo, hi):
    return " ".join(words[lo:hi])


class TestSegmentDedup:
    def test_planted_boilerplate_counts(self, spark):
        from porcupine_spark.operators.segments import SEG_TOKENS, _segments

        boiler = " ".join(f"b{i}" for i in range(SEG_TOKENS))
        uniq_a = " ".join(f"a{i}" for i in range(SEG_TOKENS))
        uniq_b = " ".join(f"c{i}" for i in range(SEG_TOKENS))
        docs = _docs(spark, [
            (boiler + " " + uniq_a, "s0"),      # segs: [boiler, uniq_a]
            (boiler + " " + uniq_b, "s0"),      # segs: [boiler, uniq_b]
            (uniq_a + " " + uniq_a, "s1"),      # within-doc repeat only
        ])
        segs = _segments(docs)
        assert segs.count() == 6
        # dup fraction: boiler appears in docs 0,1; uniq_a appears in
        # docs 0 and 2 (cross-doc!), so doc2's both segments are dup.
        perdoc = (
            segs.groupBy("doc_id", "seg_hash").agg(F.count("*").alias("n"))
        )
        dfreq = perdoc.groupBy("seg_hash").agg(F.count("*").alias("nd"))
        dup = {
            r.doc_id: r.nd
            for r in perdoc.join(dfreq, "seg_hash")
            .filter(F.col("nd") >= 2).select("doc_id", "nd").collect()
        }
        assert set(dup) == {0, 1, 2}

    def test_dup_fraction_keep_gate(self, spark, tmp_path, monkeypatch):
        from porcupine_spark.operators import segments as S

        boiler = " ".join(f"b{i}" for i in range(S.SEG_TOKENS))
        uniq = lambda k: " ".join(f"u{k}_{i}" for i in range(S.SEG_TOKENS))
        docs = _docs(spark, [
            (boiler + " " + uniq(0) + " " + uniq(1) + " " + uniq(2), "s0"),  # 1/4 dup
            (boiler + " " + uniq(3), "s0"),                                   # 1/2 dup
            (boiler, "s1"),                                                   # 1/1 dup
        ])
        monkeypatch.setattr(S, "load_table", lambda *a, **k: docs)
        out = {r.doc_id: r for r in S.segment_dup_fraction(spark, "ignored").collect()}
        assert out[0].n_segments == 4 and out[0].n_dup_segments == 1
        assert out[0].dup_frac_ppm == 250_000 and out[0].keep == 1
        assert out[1].dup_frac_ppm == 500_000 and out[1].keep == 1  # boundary
        assert out[2].dup_frac_ppm == 1_000_000 and out[2].keep == 0

    def test_retention_first_occurrence(self, spark, monkeypatch):
        from porcupine_spark.operators import segments as S

        boiler = " ".join(f"b{i}" for i in range(S.SEG_TOKENS))
        uniq = " ".join(f"u{i}" for i in range(S.SEG_TOKENS))
        docs = _docs(spark, [
            (boiler + " " + boiler, "s0"),  # doc0: two instances, idx0 survives
            (boiler + " " + uniq, "s1"),    # doc1: boiler dropped, uniq survives
        ])
        monkeypatch.setattr(S, "load_table", lambda *a, **k: docs)
        out = {r.source: r for r in S.segment_dedup_retention(spark, "x").collect()}
        assert out["s0"].n_segments == 2 and out["s0"].n_surviving == 1
        assert out["s0"].retention_ppm == 500_000
        assert out["s1"].n_segments == 2 and out["s1"].n_surviving == 1
        assert out["s1"].n_distinct == 2  # both hashes present in s1

    def test_registered_queries_run(self, spark, sf_dir):
        from porcupine_spark.operators.segments import (
            segment_dedup_retention, segment_dup_fraction)

        a = segment_dup_fraction(spark, sf_dir)
        assert a.count() > 0
        assert a.filter(F.col("dup_frac_ppm") > 1_000_000).count() == 0
        b = segment_dedup_retention(spark, sf_dir)
        tot = b.agg(F.sum("n_segments"), F.sum("n_surviving")).first()
        assert tot[1] <= tot[0]


class TestVocabStats:
    def test_hapax_counts(self, spark, monkeypatch):
        from porcupine_spark.operators import vocabstats as V

        docs = _docs(spark, [
            ("x x y z", "s0"),   # x:2 y:1 z:1 -> hapax 2, dis 1, vocab 3
            ("a a", "s1"),       # a:2 -> hapax 0, dis 1, vocab 1
        ])
        monkeypatch.setattr(V, "load_table", lambda *a, **k: docs)
        out = {r.source: r for r in V.hapax_rate_by_source(spark, "x").collect()}
        assert out["s0"].vocab == 3 and out["s0"].hapax == 2 and out["s0"].dis == 1
        assert out["s0"].hapax_vocab_ppm == 666_666  # truncating
        assert out["s1"].hapax == 0 and out["s1"].ttr_ppm == 500_000

    def test_zipf_rank_determinism_and_ratio(self, spark, monkeypatch):
        from porcupine_spark.operators import vocabstats as V

        # freq ties between 'b' and 'c' break by token asc
        docs = _docs(spark, [("a a a a b b c c", "s0")])
        monkeypatch.setattr(V, "load_table", lambda *a, **k: docs)
        rows = V.zipf_rank_freq(spark, "x").orderBy("rank").collect()
        assert [(r.rank, r.tok, r.freq) for r in rows] == [
            (1, "a", 4), (2, "b", 2), (3, "c", 2)]
        assert rows[0].zipf_ratio_ppm == 1_000_000
        assert rows[1].zipf_ratio_ppm == 1_000_000  # 2*2/4
        assert rows[2].zipf_ratio_ppm == 1_500_000  # 3*2/4

    def test_spearman_perfect_and_known(self, spark, monkeypatch):
        from porcupine_spark.operators import vocabstats as V

        # All-distinct tokens: n_distinct == n_tokens -> identical
        # rankings -> rho == 1 exactly.
        docs = _docs(spark, [
            ("t0 t1", "s"), ("u0 u1 u2", "s"), ("v0 v1 v2 v3", "s")])
        monkeypatch.setattr(V, "load_table", lambda *a, **k: docs)
        r = V.rank_corr_tokens_distinct(spark, "x").first()
        assert r.n == 3
        assert r.spearman_rho == pytest.approx(1.0, abs=1e-12)
        assert r.rho_micro == 1_000_000

    def test_spearman_matches_scipy_formula_with_ties(self, spark, monkeypatch):
        from porcupine_spark.operators import vocabstats as V

        # Hand-built docs with metric ties; compare against a direct
        # midrank Pearson computed in Python.
        texts = ["a b", "c c", "d e f", "g g g", "h i j k", "l l m m"]
        docs = _docs(spark, [(t, "s") for t in texts])
        nt = [len(t.split()) for t in texts]
        nd = [len(set(t.split())) for t in texts]

        def midranks(xs):
            out = []
            for x in xs:
                lo = sum(1 for y in xs if y < x)
                eq = sum(1 for y in xs if y == x)
                out.append(lo + (eq + 1) / 2)
            return out

        ra, rb = midranks(nt), midranks(nd)
        n = len(ra)
        sx, sy = sum(ra), sum(rb)
        sxy = sum(a * b for a, b in zip(ra, rb))
        sxx = sum(a * a for a in ra)
        syy = sum(b * b for b in rb)
        expect = (n * sxy - sx * sy) / math.sqrt(
            (n * sxx - sx * sx) * (n * syy - sy * sy))
        monkeypatch.setattr(V, "load_table", lambda *a, **k: docs)
        r = V.rank_corr_tokens_distinct(spark, "x").first()
        assert r.spearman_rho == pytest.approx(expect, abs=1e-12)


class TestWave3:
    def test_simpson_monolingual_zero(self, spark, monkeypatch):
        from porcupine_spark.operators import vocabstats as V

        docs = spark.createDataFrame([
            Row(doc_id=0, text="x", lang="en", source="mono", n_chars=1),
            Row(doc_id=1, text="x", lang="en", source="mono", n_chars=1),
            Row(doc_id=2, text="x", lang="en", source="bi", n_chars=1),
            Row(doc_id=3, text="x", lang="fr", source="bi", n_chars=1),
        ])
        monkeypatch.setattr(V, "load_table", lambda *a, **k: docs)
        out = {r.source: r for r in V.lang_diversity_simpson(spark, "x").collect()}
        assert out["mono"].simpson_ppm == 0 and out["mono"].n_langs == 1
        assert out["bi"].simpson_ppm == 500_000  # 1 - 2*(1/2)^2

    def test_template_clusters_catch_synonym_swap(self, spark, monkeypatch):
        from porcupine_spark.operators import vocabstats as V

        # same s/m/l class sequence, different words; third doc differs
        docs = spark.createDataFrame([
            Row(doc_id=0, text="the quick brown animal", lang="en", source="a",
                n_chars=22),
            Row(doc_id=1, text="our rapid olive mammal", lang="en", source="b",
                n_chars=22),
            Row(doc_id=2, text="a verylongtoken", lang="en", source="a",
                n_chars=15),
        ])
        monkeypatch.setattr(V, "load_table", lambda *a, **k: docs)
        rows = V.template_fingerprint_clusters(spark, "x").collect()
        assert len(rows) == 1
        assert rows[0].n_docs == 2 and rows[0].n_sources == 2
        assert rows[0].example_doc_id == 0

    def test_isqrt_exact_on_boundaries(self, spark):
        from porcupine_spark.operators.vocabstats import _isqrt

        vals = [0, 1, 2, 3, 4, 8, 9, 10, 15, 16, 17,
                10**12 - 1, 10**12, 10**12 + 1, 4503599627370495]
        df = spark.createDataFrame([Row(x=v) for v in vals])
        out = {r.x: r.s for r in df.select("x", _isqrt(F.col("x")).alias("s")).collect()}
        import math
        for v in vals:
            assert out[v] == math.isqrt(v), v

    def test_neyman_allocation_properties(self, spark, sf_dir):
        from porcupine_spark.operators.vocabstats import neyman_allocation

        rows = neyman_allocation(spark, sf_dir).collect()
        assert len(rows) > 0
        tot_ppm = sum(r.alloc_ppm for r in rows)
        assert 1_000_000 - len(rows) <= tot_ppm <= 1_000_000  # truncation
        for r in rows:
            assert r.var_len >= 0 and r.weight >= 0

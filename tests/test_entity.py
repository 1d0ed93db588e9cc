"""Entity-resolution tier: sorted-neighborhood bounds, cluster sanity,
span-dedup census invariants."""

from __future__ import annotations

from pyspark.sql import functions as F


class TestSortedNeighborhood:
    def test_candidate_volume_is_linear_in_n(self, spark, sf_dir):
        """The SNM contract: at most (W-1) pairs per record, regardless
        of block width — the property that survives skewed blocks."""
        from columnar_estimator_sample_spark.operators.entity import (
            ER_W, er_matched_pairs,
        )
        from columnar_estimator_sample_spark.sources.tables import table
        n = table(spark, sf_dir, "part").count()
        n_pairs = er_matched_pairs(spark, sf_dir).count()
        assert n_pairs <= n * (ER_W - 1)
        assert n_pairs > 0  # the catalog does contain near-duplicates

    def test_pairing_needs_no_join(self, spark, sf_dir):
        """Pairs come from LEAD() over one window — the physical plan
        must contain a Window and NO join of any kind. Inspect
        snm_pairs directly: er_matched_pairs wraps it in the shared
        per-session checkpoint memo, which prints as Scan ExistingRDD
        once materialized."""
        from columnar_estimator_sample_spark.operators.entity import (
            snm_pairs,
        )
        from columnar_estimator_sample_spark.sources.tables import table
        plan = snm_pairs(table(spark, sf_dir, "part"))._jdf \
            .queryExecution().executedPlan().toString()
        assert "Window" in plan
        assert "Join" not in plan

    def test_matches_respect_threshold(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.entity import (
            ER_LEV_T, er_matched_pairs,
        )
        bad = (er_matched_pairs(spark, sf_dir)
               .filter(F.levenshtein("name_a", "name_b") > ER_LEV_T)
               .count())
        assert bad == 0


class TestEntities:
    def test_golden_records(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.entity import (
            q_er_entities,
        )
        rows = q_er_entities(spark, sf_dir).collect()
        assert rows, "expected at least one multi-listing entity"
        for r in rows:
            assert r.n_listings >= 2
            assert 1 <= r.n_names
            assert r.best_price <= r.worst_price

    def test_entity_id_is_min_member(self, spark, sf_dir):
        """Cluster label = min p_partkey of the component, so the
        canonical listing is always a real member of its own entity."""
        from columnar_estimator_sample_spark.operators.entity import (
            er_matched_pairs,
        )
        from columnar_estimator_sample_spark.operators.graph import (
            connected_components,
        )
        pairs = er_matched_pairs(spark, sf_dir).select("part_a", "part_b")
        comp = connected_components(pairs, "part_a", "part_b")
        bad = comp.filter(F.col("cluster_id") > F.col("doc_id")).count()
        assert bad == 0
        # every label is itself a node of the same component
        labels = comp.select(F.col("cluster_id").alias("doc_id")).distinct()
        orphans = labels.join(comp, "doc_id", "left_anti").count()
        assert orphans == 0


class TestChunkDedupCensus:
    def test_census_invariants(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.dedup import (
            q_chunk_dedup_census,
        )
        rows = q_chunk_dedup_census(spark, sf_dir).collect()
        assert rows
        for r in rows:
            assert 0 <= r.n_dup_chunks <= r.n_chunks
            assert r.n_dup_distinct <= r.n_dup_chunks or r.n_dup_chunks == 0
            assert 0 <= r.dup_permille <= 1000

    def test_shuffle_carries_hashes_not_text(self, spark, sf_dir):
        """After the explode, only the 8-byte span hash crosses the
        exchange — the span text must not appear in any exchange input."""
        from columnar_estimator_sample_spark.operators.dedup import (
            q_chunk_dedup_census,
        )
        plan = q_chunk_dedup_census(spark, sf_dir)._jdf.queryExecution() \
            .executedPlan().toString()
        # every exchange partitions on hash/source/doc_id keys — the
        # span text column never appears in an exchange's key list
        exchanges = [ln for ln in plan.splitlines()
                     if "Exchange hashpartitioning" in ln]
        assert exchanges
        assert all("chunk" not in ln for ln in exchanges)

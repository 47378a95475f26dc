#!/usr/bin/env python
"""Benchmark: headline flagship pipeline + operator suite over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <headline sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "num_cpus": N, "rows": ..., "rows_per_sec": ...}

``--scaling`` runs the headline job in two fresh processes
(num_cpus=8 vs 32 by default) on the same input and reports both
throughputs + scaling efficiency (the sandbox proxy for the north rule's
N→4N cluster criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
#: corpus multiplier: pages per document row (~32M lines at sf0.1). Sized
#: so steady-state compute dominates the fixed ~5-7s session/actor-pool
#: spin-up in the headline (min-of-2 runs) — at 10^12 rows that spin-up
#: amortizes to zero, and the throughput criterion is about steady state.
REPEAT = int(os.environ.get("GRAFT_BENCH_REPEAT", "320"))


def _sf_of(path: str) -> float:
    import re
    m = re.search(r"sf([0-9.]+)", path)
    return float(m.group(1)) if m else -1.0


def _dedup_corpus(sf_dir: str, replicas: int = 8,
                  families: int = 1) -> str:
    """Deterministic near-dup stress corpus: every document spawns
    ``families`` DISTINCT base texts (family token interleaved between
    all tokens — families never near-dup each other), each replicated
    ``replicas`` times with
    one replica-specific token appended (each family = mutual near-dups,
    never exact dups). ``families`` scales total compute LINEARLY while
    the verified pair count stays ``families × C(replicas, 2)`` —
    replicas would scale it quadratically. Cached parquet dir — input
    prep, not part of the measured pipelines."""
    import glob
    from pathlib import Path
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd
    tag = f"sf{_sf_of(sf_dir)}_x{replicas}" \
        + (f"_f{families}" if families > 1 else "")
    out = Path(f"/tmp/l2sr_dedup_corpus/{tag}")
    if (out / "_SUCCESS").exists():
        return str(out)
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def rep(b: pa.Table) -> pa.Table:
        n = len(b)
        ids0 = b.column("doc_id").to_numpy()
        tabs = []
        for f in range(families):
            # family token INTERLEAVED between every pair of tokens —
            # every shingle window then contains family tokens, so
            # cross-family Jaccard is 0 while within-family replicas
            # stay near-dups; families == 1 reproduces the original
            # corpus byte-for-byte (cache compatibility)
            base = b.column("text") if families == 1 else \
                pc.replace_substring(b.column("text"), " ", f" f{f} ")
            idx = np.repeat(np.arange(n, dtype=np.int64), replicas)
            r = np.tile(np.arange(replicas, dtype=np.int64), n)
            texts = pc.binary_join_element_wise(
                pc.take(base, pa.array(idx)),
                pc.cast(pa.array(r), pa.string()), " rep")
            # stride must exceed families*replicas or replica ids of
            # adjacent docs collide; 1000 keeps default-config ids (and
            # the cached corpus) byte-identical
            stride = max(1000, families * replicas)
            ids = np.repeat(ids0, replicas) * stride + f * replicas + r
            tabs.append(pa.table({"doc_id": pa.array(ids),
                                  "text": texts}))
        return pa.concat_tables(tabs)

    out.mkdir(parents=True, exist_ok=True)
    docs.map_batches(rep, batch_format="pyarrow") \
        .repartition(32).write_parquet(str(out))
    (out / "_SUCCESS").touch()
    return str(out)


def _embed_corpus(sf_dir: str, replicas: int = 1000) -> str:
    """Deterministic embedding stress corpus: every vector replicated
    ``replicas`` times with a replica-indexed perturbation on one
    rotating dimension (500 → 500k distinct vectors). Cached parquet."""
    from pathlib import Path
    import numpy as np
    import pyarrow as pa
    import ray.data as rd
    # f32 suffix: vectors stored fixed_size_list<float32> (half the
    # parquet-decode + plasma bytes of the old list<double> corpus)
    out = Path(f"/tmp/l2sr_embed_corpus/sf{_sf_of(sf_dir)}_x{replicas}f32")
    if (out / "_SUCCESS").exists():
        return str(out)
    vecs = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                           columns=["vec_id", "embedding"])

    def rep(b: pa.Table) -> pa.Table:
        n = len(b)
        idx = np.repeat(np.arange(n, dtype=np.int64), replicas)
        t = b.take(pa.array(idx))
        r = np.tile(np.arange(replicas, dtype=np.int64), n)
        X = np.asarray(t.column("embedding").combine_chunks().flatten(),
                       dtype=np.float64).reshape(len(t), -1)
        X[np.arange(len(t)), r % X.shape[1]] += 0.001 * (r % 7)
        d = X.shape[1]
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(X.reshape(-1).astype(np.float32)), d)
        return pa.table({
            "vec_id": pa.array(t.column("vec_id").to_numpy() * replicas + r),
            "embedding": emb,
        })

    out.mkdir(parents=True, exist_ok=True)
    vecs.map_batches(rep, batch_format="pyarrow", batch_size=64) \
        .repartition(32).write_parquet(str(out))
    (out / "_SUCCESS").touch()
    return str(out)


def run_benchmarks() -> dict:
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    from log2seq_ray.pipelines import flagship
    from log2seq_ray.sources.webpages import materialize_corpus
    from log2seq_ray import queries as Q

    # materialize the synthetic web-page corpus ONCE (cached across runs and
    # across the two scaling levels) — generation is input prep, not the
    # measured pipeline
    n_files = int(os.environ.get("GRAFT_CORPUS_FILES", "256"))
    corpus_dir = materialize_corpus(
        SF_DIR, f"/tmp/l2sr_corpus/v2_sf{_sf_of(SF_DIR)}_r{REPEAT}_f{n_files}",
        repeat=REPEAT, num_files=n_files)

    # warm the page cache so we measure compute + shuffle, not cold disk
    import glob
    import pyarrow.parquet as pq
    for t in ("documents", "events", "embeddings"):
        pq.read_table(f"{SF_DIR}/{t}.parquet")
    for f in glob.glob(f"{corpus_dir}/*.parquet"):
        pq.read_table(f)

    timings: dict[str, float] = {}
    extras: dict[str, int] = {}

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    # headline: parse→enrich→route→aggregate over the materialized corpus.
    # Two runs, report the min: the first pays one-time Ray worker-process
    # spin-up (~6s), which at 10^12 rows amortizes to zero — the steady
    # state is what the throughput/scaling criterion is about.
    def _flagship():
        return flagship.run(SF_DIR, cpus=NUM_CPUS,
                            corpus_dir=corpus_dir).to_pandas()

    counts = timed("flagship_cold", _flagship)
    counts = timed("flagship_warm2", _flagship)
    if "--stats" in sys.argv:
        # per-operator Ray Data stats for the headline pipeline (stderr so
        # the stdout JSON contract is untouched)
        ds = flagship.run(SF_DIR, cpus=NUM_CPUS, corpus_dir=corpus_dir)
        t0 = time.perf_counter()
        ds = ds.materialize()
        timings["flagship"] = round(time.perf_counter() - t0, 3)
        print(ds.stats(), file=sys.stderr)
        counts = ds.to_pandas()
    else:
        counts = timed("flagship", _flagship)
    # min-of-3: the first run pays one-time worker spin-up, and any run can
    # catch machine noise — the min is the steady state the throughput
    # criterion is about
    timings["flagship"] = min(timings["flagship"], timings["flagship_cold"],
                              timings["flagship_warm2"])
    n_rows = int(counts["n"].sum())

    # operator suite (same sf dir); skipped in scaling sub-runs
    if not os.environ.get("GRAFT_BENCH_FLAGSHIP_ONLY"):
        # flagship again with the routed per-sink parquet writers active
        import shutil
        import tempfile
        sink = tempfile.mkdtemp(prefix="l2sr_sink_")
        timed("flagship_with_sink", lambda: flagship.run(
            SF_DIR, cpus=NUM_CPUS, corpus_dir=corpus_dir,
            sink_dir=sink).to_pandas())
        shutil.rmtree(sink, ignore_errors=True)
        timed("token_stats", lambda: Q.q_token_stats(SF_DIR).to_pandas())
        timed("exact_dedup", lambda: Q.q_exact_dedup(SF_DIR).to_pandas())
        timed("minhash_dedup",
              lambda: Q.q_minhash_dedup(SF_DIR).to_pandas())
        timed("knn_cosine", lambda: Q.q_knn_cosine(SF_DIR))
        timed("srp_knn", lambda: Q.q_srp_knn(SF_DIR))
        timed("events_hourly", lambda: Q.q_events_hourly(SF_DIR).to_pandas())
        timed("parse_events", lambda: Q.q_parse_events(SF_DIR).to_pandas())
        timed("sessions", lambda: Q.q_sessions(SF_DIR).to_pandas())
        timed("orders_by_nation",
              lambda: Q.q_orders_by_nation(SF_DIR).to_pandas())
        timed("lineitem_join",
              lambda: Q.q_lineitem_join(SF_DIR).to_pandas())
        timed("join_auto",
              lambda: Q.q_join_auto(SF_DIR).to_pandas())
        timed("event_pivot", lambda: Q.q_event_pivot(SF_DIR).to_pandas())
        timed("length_ranks",
              lambda: Q.q_length_ranks(SF_DIR).to_pandas())
        timed("event_spikes",
              lambda: Q.q_event_spikes(SF_DIR).to_pandas())
        timed("cross_run_dedup",
              lambda: Q.q_cross_run_dedup(SF_DIR).to_pandas())
        timed("cross_run_neardup",
              lambda: Q.q_cross_run_neardup(SF_DIR).to_pandas())
        timed("cross_run_simhash",
              lambda: Q.q_cross_run_simhash(SF_DIR).to_pandas())
        timed("compacted_neardup",
              lambda: Q.q_compacted_neardup(SF_DIR).count())
        timed("cross_run_semdedup",
              lambda: Q.q_cross_run_semdedup(SF_DIR).to_pandas())
        timed("value_stats", lambda: Q.q_value_stats(SF_DIR).to_pandas())
        timed("value_p90_hist",
              lambda: Q.q_value_p90_hist(SF_DIR).to_pandas())
        timed("value_p90_by_type",
              lambda: Q.q_value_p90_by_type(SF_DIR).to_pandas())
        timed("events_profile",
              lambda: Q.q_events_profile(SF_DIR).to_pandas())
        timed("url_dedup", lambda: Q.q_url_dedup(SF_DIR).to_pandas())
        timed("domain_topk", lambda: Q.q_domain_topk(SF_DIR).to_pandas())
        timed("props_sum", lambda: Q.q_props_sum(SF_DIR).to_pandas())
        timed("lang_source_rollup",
              lambda: Q.q_lang_source_rollup(SF_DIR).to_pandas())
        timed("snapshot_diff",
              lambda: Q.q_snapshot_diff(SF_DIR).to_pandas())
        timed("doc_chunks", lambda: Q.q_doc_chunks(SF_DIR).to_pandas())
        timed("curation_funnel",
              lambda: Q.q_curation_funnel(SF_DIR).to_pandas())
        timed("anti_join_customers",
              lambda: Q.q_anti_join_customers(SF_DIR).to_pandas())
        timed("left_join_order_counts",
              lambda: Q.q_left_join_order_counts(SF_DIR).to_pandas())
        timed("normalize_text",
              lambda: Q.q_normalize_text(SF_DIR).to_pandas())
        timed("gopher_filter",
              lambda: Q.q_gopher_filter(SF_DIR).to_pandas())
        timed("pii_masked", lambda: Q.q_pii_masked(SF_DIR).to_pandas())
        timed("boilerplate_tokens",
              lambda: Q.q_boilerplate_tokens(SF_DIR).to_pandas())
        timed("curated_docs", lambda: Q.q_curated_docs(SF_DIR).to_pandas())
        timed("minhash_clusters_lp",
              lambda: Q.q_minhash_clusters_lp(SF_DIR).to_pandas())
        timed("ngram_jaccard",
              lambda: Q.q_ngram_jaccard(SF_DIR).to_pandas())
        timed("containment_dups",
              lambda: Q.q_containment_dups(SF_DIR).to_pandas())
        timed("vocab_growth",
              lambda: Q.q_vocab_growth(SF_DIR).to_pandas())
        timed("token_coverage",
              lambda: Q.q_token_coverage(SF_DIR).to_pandas())
        timed("remove_dup_spans",
              lambda: Q.q_remove_dup_spans(SF_DIR).count())
        timed("cross_run_search",
              lambda: Q.q_cross_run_search(SF_DIR))
        timed("mixed_lang_docs",
              lambda: Q.q_mixed_lang_docs(SF_DIR).count())
        timed("windowed_dedup",
              lambda: Q.q_windowed_dedup(SF_DIR).count())
        timed("balanced_shards",
              lambda: Q.q_balanced_shards(SF_DIR).count())
        timed("oov_rates",
              lambda: Q.q_oov_rates(SF_DIR).to_pandas())
        timed("cdc_chunks",
              lambda: Q.q_cdc_chunks(SF_DIR).count())
        timed("jl_project",
              lambda: Q.q_jl_project(SF_DIR).count())
        timed("hard_negatives",
              lambda: Q.q_hard_negatives(SF_DIR))
        timed("interval_coverage",
              lambda: Q.q_interval_coverage(SF_DIR).to_pandas())
        timed("k_anonymity",
              lambda: Q.q_k_anonymity(SF_DIR).to_pandas())
        timed("pseudonymize",
              lambda: Q.q_pseudonymize(SF_DIR).count())
        timed("edit1_join",
              lambda: Q.q_edit1_join(SF_DIR).to_pandas())
        timed("session_paths",
              lambda: Q.q_session_paths(SF_DIR).to_pandas())
        timed("dedup_savings",
              lambda: Q.q_dedup_savings(SF_DIR).to_pandas())
        timed("join_cardinality",
              lambda: Q.q_join_cardinality(SF_DIR))
        timed("kwic_snippets",
              lambda: Q.q_kwic_snippets(SF_DIR).count())
        timed("weighted_median_len",
              lambda: Q.q_weighted_median_len(SF_DIR))
        timed("activity_concentration",
              lambda: Q.q_activity_concentration(SF_DIR).count())
        timed("activity_streaks",
              lambda: Q.q_activity_streaks(SF_DIR).count())
        timed("url_structure",
              lambda: Q.q_url_structure(SF_DIR).to_pandas())
        timed("hour_profile",
              lambda: Q.q_hour_profile(SF_DIR).to_pandas())
        timed("source_budget",
              lambda: Q.q_source_budget(SF_DIR))
        timed("winsorize",
              lambda: Q.q_winsorize(SF_DIR).count())
        timed("rrf_search",
              lambda: Q.q_rrf_search(SF_DIR))
        timed("dedup_agreement",
              lambda: Q.q_dedup_agreement(SF_DIR).to_pandas())
        timed("quality_percentiles",
              lambda: Q.q_quality_percentiles(SF_DIR).count())
        timed("decontaminate",
              lambda: Q.q_decontaminate(SF_DIR).to_pandas())
        timed("decontaminate_frac",
              lambda: Q.q_decontaminate_frac(SF_DIR).to_pandas())
        timed("paragraph_dedup",
              lambda: Q.q_paragraph_dedup(SF_DIR).to_pandas())
        timed("cms_sketch", lambda: Q.q_cms_sketch(SF_DIR).to_pandas())
        timed("doc_lm_score",
              lambda: Q.q_doc_lm_score(SF_DIR).to_pandas())
        timed("tfidf_top_terms",
              lambda: Q.q_tfidf_top_terms(SF_DIR).to_pandas())
        timed("dup_spans", lambda: Q.q_dup_spans(SF_DIR).to_pandas())
        timed("quantile_filter",
              lambda: Q.q_quantile_filter(SF_DIR).to_pandas())
        timed("heavy_hitters",
              lambda: Q.q_heavy_hitters(SF_DIR).to_pandas())
        timed("dsir_weights",
              lambda: Q.q_dsir_weights(SF_DIR).to_pandas())
        timed("bloom_hits", lambda: Q.q_bloom_hits(SF_DIR).to_pandas())
        timed("priority_sample", lambda: Q.q_priority_sample(SF_DIR))
        timed("interval_purchases",
              lambda: Q.q_interval_purchases(SF_DIR).to_pandas())
        timed("running_totals",
              lambda: Q.q_running_totals(SF_DIR).to_pandas())
        timed("trailing_values",
              lambda: Q.q_trailing_values(SF_DIR).to_pandas())
        timed("postings", lambda: Q.q_postings(SF_DIR).to_pandas())
        timed("mix_sample", lambda: Q.q_mix_sample(SF_DIR).to_pandas())
        timed("mix_sample_sqrt",
              lambda: Q.q_mix_sample_sqrt(SF_DIR).to_pandas())
        timed("top_tokens_by_lang",
              lambda: Q.q_top_tokens_by_lang(SF_DIR).to_pandas())
        timed("event_bigrams",
              lambda: Q.q_event_bigrams(SF_DIR).to_pandas())
        timed("longest_docs", lambda: Q.q_longest_docs(SF_DIR))
        timed("tokenize_ids",
              lambda: Q.q_tokenize_ids(SF_DIR).count())
        timed("packed_tokens",
              lambda: Q.q_packed_tokens(SF_DIR).count())
        timed("full_join_hourly",
              lambda: Q.q_full_join_hourly(SF_DIR).to_pandas())
        timed("simhash_clusters",
              lambda: Q.q_simhash_clusters(SF_DIR).to_pandas())
        timed("pagerank_sim",
              lambda: Q.q_pagerank_sim(SF_DIR).to_pandas())
        timed("triangles_sim",
              lambda: Q.q_triangles_sim(SF_DIR).to_pandas())
        timed("cluster_reps",
              lambda: Q.q_cluster_reps(SF_DIR).to_pandas())
        timed("char_stats",
              lambda: Q.q_char_stats(SF_DIR).to_pandas())
        timed("daily_new_users",
              lambda: Q.q_daily_new_users(SF_DIR).to_pandas())
        timed("user_day_activity",
              lambda: Q.q_user_day_activity(SF_DIR).to_pandas())
        timed("dense_daily",
              lambda: Q.q_dense_daily(SF_DIR).to_pandas())
        timed("event_cooccurrence",
              lambda: Q.q_event_cooccurrence(SF_DIR).to_pandas())
        timed("value_bands",
              lambda: Q.q_value_bands(SF_DIR).to_pandas())
        timed("gap_stats", lambda: Q.q_gap_stats(SF_DIR).to_pandas())
        timed("cross_jaccard",
              lambda: Q.q_cross_jaccard(SF_DIR).to_pandas())
        timed("token_concentration",
              lambda: Q.q_token_concentration(SF_DIR).count())
        timed("trending_daily",
              lambda: Q.q_trending_daily(SF_DIR).to_pandas())
        timed("source_dup_stats",
              lambda: Q.q_source_dup_stats(SF_DIR).to_pandas())
        timed("debounce", lambda: Q.q_debounce(SF_DIR).count())
        timed("kmv_overlap", lambda: Q.q_kmv_overlap(SF_DIR))
        timed("mirror_clusters",
              lambda: Q.q_mirror_clusters(SF_DIR).to_pandas())
        timed("kcore_sim", lambda: Q.q_kcore_sim(SF_DIR).to_pandas())
        timed("typo_pairs", lambda: Q.q_typo_pairs(SF_DIR).to_pandas())
        timed("novelty_scores",
              lambda: Q.q_novelty_scores(SF_DIR).count())
        timed("cohort_retention",
              lambda: Q.q_cohort_retention(SF_DIR).to_pandas())
        timed("markov_transitions",
              lambda: Q.q_markov_transitions(SF_DIR).to_pandas())
        timed("value_mad", lambda: Q.q_value_mad(SF_DIR).to_pandas())
        timed("cluster_size_hist",
              lambda: Q.q_cluster_size_hist(SF_DIR).to_pandas())
        timed("langid_confusion",
              lambda: Q.q_langid_confusion(SF_DIR).to_pandas())
        timed("hourly_approx_users",
              lambda: Q.q_hourly_approx_users(SF_DIR))
        timed("keyword_search", lambda: Q.q_keyword_search(SF_DIR))
        timed("mad_outliers",
              lambda: Q.q_mad_outliers(SF_DIR).to_pandas())
        timed("assign_sessions",
              lambda: Q.q_assign_sessions(SF_DIR).count())
        timed("cluster_top_terms",
              lambda: Q.q_cluster_top_terms(SF_DIR).to_pandas())
        timed("vec_quantize",
              lambda: Q.q_vec_quantize(SF_DIR).count())
        timed("bm25_search", lambda: Q.q_bm25_search(SF_DIR))
        timed("token_budget_sample",
              lambda: Q.q_token_budget_sample(SF_DIR).count())
        timed("dedup_lines", lambda: Q.q_dedup_lines(SF_DIR).count())
        timed("leakage_safe_split",
              lambda: Q.q_leakage_safe_split(SF_DIR).count())
        timed("collocations", lambda: Q.q_collocations(SF_DIR))
        timed("pq_codes", lambda: Q.q_pq_codes(SF_DIR).count())
        timed("pq_knn", lambda: Q.q_pq_knn(SF_DIR))
        timed("trailing_outliers",
              lambda: Q.q_trailing_outliers(SF_DIR).count())
        timed("value_ranks_by_type",
              lambda: Q.q_value_ranks_by_type(SF_DIR).count())
        timed("cross_run_hll", lambda: Q.q_cross_run_hll(SF_DIR))
        timed("bpe_merges", lambda: Q.q_bpe_merges(SF_DIR))
        timed("cross_run_hist", lambda: Q.q_cross_run_hist(SF_DIR))
        timed("late_events", lambda: Q.q_late_events(SF_DIR).count())
        timed("dup_graph_stats",
              lambda: Q.q_dup_graph_stats(SF_DIR).to_pandas())
        timed("media_neardup",
              lambda: Q.q_media_neardup(SF_DIR).count())
        timed("ivf_pq_knn", lambda: Q.q_ivf_pq_knn(SF_DIR))
        timed("corpus_datasheet",
              lambda: Q.q_corpus_datasheet(SF_DIR))
        timed("attribution_pairs",
              lambda: Q.q_attribution_pairs(SF_DIR).count())
        timed("vec_dim_stats",
              lambda: Q.q_vec_dim_stats(SF_DIR).to_pandas())
        timed("bpe_encoded", lambda: Q.q_bpe_encoded(SF_DIR).count())
        timed("vec_gram", lambda: Q.q_vec_gram(SF_DIR).count())

        # dedup stress corpus: 8 near-dup replicas per document (40k docs
        # at sf0.1) — the dedup ops at a scale where fixed costs stop
        # dominating. minhash config = throughput (64 hashes / 16 bands),
        # not the recall-1 oracle config.
        import ray.data as rd
        from log2seq_ray.ops.dedup import exact_dedup, minhash_dedup
        dd = _dedup_corpus(SF_DIR)
        dd_rows = rd.read_parquet(dd).count()
        timed("exact_dedup_40k",
              lambda: exact_dedup(rd.read_parquet(dd)).to_pandas())
        # the verified pair Dataset STREAMS to parquet (never collected on
        # the driver) — the timed span covers verify + dedup exchange +
        # sink; the pair count comes from the written files' metadata
        import shutil as _sh0
        mh_sink = "/tmp/l2sr_minhash_pairs_40k"
        _sh0.rmtree(mh_sink, ignore_errors=True)
        timed("minhash_dedup_40k",
              lambda: minhash_dedup(rd.read_parquet(dd),
                                    threshold=0.8, n_hashes=64,
                                    n_bands=16).write_parquet(mh_sink))
        extras["minhash_dedup_40k_pairs"] = \
            rd.read_parquet(mh_sink).count()
        extras["dedup_corpus_rows"] = dd_rows
        from log2seq_ray.ops.curation import (ngram_jaccard_dups,
                                              paragraph_dedup)
        nj = timed("ngram_jaccard_40k",
                   lambda: ngram_jaccard_dups(rd.read_parquet(dd),
                                              window=4, max_df=64)
                   .to_pandas())
        extras["ngram_jaccard_40k_pairs"] = len(nj)
        timed("paragraph_dedup_40k",
              lambda: paragraph_dedup(rd.read_parquet(dd)).count())
        from log2seq_ray.ops.curation import dup_spans
        extras["dup_spans_40k_spans"] = timed(
            "dup_spans_40k",
            lambda: dup_spans(rd.read_parquet(dd), window=8).count())
        from log2seq_ray.ops.curation import (containment_dups,
                                              remove_dup_spans)
        cd = timed("containment_40k",
                   lambda: containment_dups(rd.read_parquet(dd),
                                            window=4, tau_num=9,
                                            tau_den=10, max_df=64)
                   .count())
        extras["containment_40k_pairs"] = cd
        timed("remove_dup_spans_40k",
              lambda: remove_dup_spans(rd.read_parquet(dd),
                                       window=8).count())
        # incremental near-dup ingest stress: run 1 commits half the
        # near-dup corpus, run 2's docs all near-dup committed families
        import shutil as _sh
        import pyarrow as pa
        import pyarrow.compute as pc
        from log2seq_ray.ops.curation import ingest_neardup_run
        nd_state = "/tmp/l2sr_nd_stress_bench"
        _sh.rmtree(nd_state, ignore_errors=True)

        def _nd_half(rem: int):
            return rd.read_parquet(dd).map_batches(
                lambda b: b.filter(pc.equal(
                    pc.bit_wise_and(b.column("doc_id"),
                                    pa.scalar(1, pa.int64())),
                    pa.scalar(rem, pa.int64()))),
                batch_format="pyarrow")

        extras["neardup_ingest_20k_run1_survivors"] = timed(
            "neardup_ingest_20k_run1",
            lambda: ingest_neardup_run(_nd_half(0), nd_state).count())
        extras["neardup_ingest_20k_run2_survivors"] = timed(
            "neardup_ingest_20k_run2",
            lambda: ingest_neardup_run(_nd_half(1), nd_state).count())

        # k-means stress: 2M 64-dim vectors (sf0.1), k=16, init + 2 Lloyd
        # updates (4 full streaming passes; only k×(d+1) partials shuffle)
        from log2seq_ray.ops.similarity import kmeans_assign
        ec = _embed_corpus(SF_DIR)
        timed("kmeans_clusters",
              lambda: Q.q_kmeans_clusters(SF_DIR).to_pandas())
        timed("kmeans_2m",
              lambda: kmeans_assign(rd.read_parquet(ec), k=16,
                                    iters=2).count())
        # ANN stress: same 2M-vector corpus, brute-force vs SRP-LSH
        # (12 planes / probe 1 → ~13/4096 buckets per query enter the
        # exact-cosine matmul)
        from log2seq_ray.ops.similarity import (knn_brute_force,
                                                queries_from_dataset,
                                                srp_knn)
        eq = queries_from_dataset(rd.read_parquet(ec), n_queries=5)
        timed("knn_2m",
              lambda: knn_brute_force(rd.read_parquet(ec), eq, k=10))
        timed("srp_knn_2m",
              lambda: srp_knn(rd.read_parquet(ec), eq, k=10,
                              n_planes=12, probe=1))
        from log2seq_ray.ops.similarity import semdedup
        timed("semdedup", lambda: Q.q_semdedup(SF_DIR).to_pandas())
        # SemDeDup stress: 2M vectors, k=256 keeps clusters ~8k — the
        # O(b²) within-cluster scan stays bounded by the k lever
        extras["semdedup_2m_survivors"] = timed(
            "semdedup_2m",
            lambda: semdedup(rd.read_parquet(ec), k=256, iters=1,
                             threshold=0.95, num_parts=64).count())
        # incremental SEMANTIC ingest stress: 200k vectors, run 1 commits
        # the evens, run 2's odds drop against the committed index (the
        # 2M-vector reading lives in BASELINE.md — kept out of the
        # per-round suite to bound its wall time)
        from log2seq_ray.ops.similarity import ingest_semdedup_run
        ec2 = _embed_corpus(SF_DIR, replicas=100)
        sem_state = "/tmp/l2sr_sem_stress_bench"
        _sh.rmtree(sem_state, ignore_errors=True)

        from log2seq_ray.queries import parity_half

        def _sem_half(rem: int):
            return rd.read_parquet(ec2).map_batches(
                lambda b: parity_half(b, rem, col="vec_id"),
                batch_format="pyarrow")

        extras["semdedup_ingest_200k_run1_survivors"] = timed(
            "semdedup_ingest_200k_run1",
            lambda: ingest_semdedup_run(
                _sem_half(0), sem_state, threshold=0.95, n_centroids=64,
                n_assign=2, num_parts=64).count())
        extras["semdedup_ingest_200k_run2_survivors"] = timed(
            "semdedup_ingest_200k_run2",
            lambda: ingest_semdedup_run(
                _sem_half(1), sem_state, threshold=0.95, n_centroids=64,
                n_assign=2, num_parts=64).count())

    ray.shutdown()
    headline = timings["flagship"]
    return {
        "metric": "flagship parse→enrich→route→aggregate wall time",
        "value": headline,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_of(SF_DIR),
        "num_cpus": NUM_CPUS,
        "rows": n_rows,
        "rows_per_sec": round(n_rows / headline, 1),
        **extras,
    }


def run_scaling(lo: int = 8, hi: int = 32) -> dict:
    """Same corpus, two fresh processes at two parallelism levels.

    Uses a larger corpus (GRAFT_SCALING_REPEAT, default 480 → ~48M lines)
    than the plain bench so steady-state compute dominates the ~7s fixed
    session/actor-pool startup — the quantity the N→4N cluster criterion
    is about. The corpus is materialized once and shared by both levels.
    """
    # default to the 96M-line corpus: the shorter r480 legs leave
    # proportionally more fixed session cost + machine noise in the ratio
    # (measured 0.815-0.823 at r480 vs 0.977 at r960 on identical code)
    repeat = int(os.environ.get("GRAFT_SCALING_REPEAT", "960"))

    # materialize the shared corpus in THIS process (full CPUs) before any
    # timed leg — generating it inside the first subprocess contaminated
    # that leg's measurement (observed 766k vs 1.38M rows/s on the 32-leg)
    import ray
    from log2seq_ray.sources.webpages import materialize_corpus
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    n_files = int(os.environ.get("GRAFT_CORPUS_FILES", "256"))
    materialize_corpus(
        SF_DIR, f"/tmp/l2sr_corpus/v2_sf{_sf_of(SF_DIR)}_r{repeat}_f{n_files}",
        repeat=repeat, num_files=n_files)
    ray.shutdown()

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_BENCH_REPEAT=str(repeat),
                   GRAFT_BENCH_FLAGSHIP_ONLY="1")
        # each leg goes through the supervised wrapper so a fatal
        # Ray-core crash retries the leg instead of failing the pair
        env.pop("GRAFT_BENCH_INNER", None)
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True, check=True)
        return json.loads(out.stdout.strip().splitlines()[-1])

    r_lo = one(lo)
    time.sleep(10)  # let the previous Ray session's processes fully exit
    r_hi = one(hi)
    tp_lo = r_lo["rows_per_sec"]
    tp_hi = r_hi["rows_per_sec"]
    eff = (tp_hi / tp_lo) / (hi / lo)
    return {
        "metric": "scaling efficiency (rows/s ratio vs cpu ratio)",
        "cpus_lo": lo, "cpus_hi": hi,
        "sec_lo": r_lo["value"], "sec_hi": r_hi["value"],
        "rows_per_sec_lo": tp_lo, "rows_per_sec_hi": tp_hi,
        "scaling_efficiency": round(eff, 3),
        "rows": r_hi["rows"], "sf": r_hi["sf"],
    }


#: --scaling-ops stress corpus: 8 near-dup replicas × FAMILIES distinct
#: variants per document (320k docs at sf0.1 with f=8). Families scale
#: compute linearly while verified pairs stay families × C(8,2) per doc
#: — big enough that steady-state compute dominates the fixed session +
#: exchange-orchestration cost on BOTH legs (an 8x/160k corpus measured
#: fixed-cost-dominated efficiencies, same failure mode BASELINE.md
#: documents for the r480 flagship legs)
SCALING_OPS_FAMILIES = int(os.environ.get("GRAFT_SCALING_OPS_FAMILIES",
                                          "8"))


def run_ops_leg() -> dict:
    """One parallelism leg of ``--scaling-ops``: times an exchange-heavy
    op (minhash_dedup over the replicated near-dup corpus — LSH band
    exchange + co-partitioned verify + pair-dedup exchange) and a
    scan/sort/join op (tokenize → pack offsets scan → distributed starts
    join, the packed_tokens composition) at RAY_GRAFT_CPUS. Min-of-2
    runs: steady state, not session spin-up."""
    import ray
    import ray.data as rd
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    from log2seq_ray.ops.curation import ngram_jaccard_dups
    from log2seq_ray.ops.dedup import minhash_dedup
    from log2seq_ray.ops.join import hash_join
    from log2seq_ray.ops.scan import pack_chunks
    from log2seq_ray.ops.text import tokenize_ids

    dd = _dedup_corpus(SF_DIR, replicas=8,
                       families=SCALING_OPS_FAMILIES)
    ec3 = _embed_corpus(SF_DIR, replicas=300)
    import glob
    import pyarrow.parquet as pq
    for f in glob.glob(f"{dd}/*.parquet"):
        pq.read_table(f)

    def packed_over_dd():
        toks = tokenize_ids(rd.read_parquet(dd), vocab_size=256)
        starts = pack_chunks(rd.read_parquet(dd), chunk_tokens=256) \
            .select_columns(["doc_id", "start_tok"])
        # strategy="auto": the planner byte-samples the starts side
        # (~16 B/row) and broadcasts it, so the huge exploded token
        # table never enters an exchange — the plan a 100 TB run wants
        return hash_join(toks, starts, "doc_id", "doc_id",
                         left_cols=["doc_id", "pos", "token_id"],
                         right_cols=["doc_id", "start_tok"],
                         strategy="auto").count()

    def sem_ingest_two_runs():
        # both incremental legs, fresh index: run 1 commits the evens
        # (within-run self-scan dominates), run 2 ingests the odds
        # against the committed index (new-vs-old scan dominates) —
        # compute-dense BLAS slabs, unlike the bandwidth-bound exchanges
        import shutil as _sh
        from log2seq_ray.ops.similarity import ingest_semdedup_run
        from log2seq_ray.queries import parity_half
        state = f"/tmp/l2sr_sem_scaling_{NUM_CPUS}"
        _sh.rmtree(state, ignore_errors=True)

        def halfp(rem: int):
            return rd.read_parquet(ec3).map_batches(
                lambda b: parity_half(b, rem, col="vec_id"),
                batch_format="pyarrow")

        kw = dict(threshold=0.95, n_centroids=128, n_assign=2,
                  num_parts=64)
        n = ingest_semdedup_run(halfp(0), state, **kw).count()
        return n + ingest_semdedup_run(halfp(1), state, **kw).count()

    only = set(filter(None, os.environ.get("GRAFT_OPS_ONLY",
                                           "").split(",")))
    out = {"cpus": NUM_CPUS, "families": SCALING_OPS_FAMILIES}
    for name, fn in (
        ("minhash_dedup",
         lambda: minhash_dedup(rd.read_parquet(dd), threshold=0.8,
                               n_hashes=64, n_bands=16).count()),
        ("ngram_jaccard",
         lambda: ngram_jaccard_dups(rd.read_parquet(dd), window=4,
                                    max_df=64).count()),
        ("packed_tokens", packed_over_dd),
        ("semdedup_ingest", sem_ingest_two_runs),
    ):
        if only and name not in only:
            continue
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            fn()
            runs.append(time.perf_counter() - t0)
        out[name] = round(min(runs), 3)
    ray.shutdown()
    return out


def run_scaling_ops(lo: int = 8, hi: int = 32) -> dict:
    """Two-leg (fresh-process) scaling for non-flagship ops — the
    exchange-heavy and scan legs the N→4N cluster criterion asks about
    beyond the embarrassingly-parallel headline. Corpus materialized
    once, shared by both levels."""
    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    _dedup_corpus(SF_DIR, replicas=8, families=SCALING_OPS_FAMILIES)
    _embed_corpus(SF_DIR, replicas=300)
    ray.shutdown()

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu), GRAFT_OPS_LEG="1")
        env.pop("GRAFT_BENCH_INNER", None)  # legs re-enter supervised
        out = subprocess.run([sys.executable, __file__, "--scaling-ops"],
                             env=env, capture_output=True, text=True,
                             check=True)
        return json.loads(out.stdout.strip().splitlines()[-1])

    r_lo = one(lo)
    time.sleep(10)
    r_hi = one(hi)
    res = {"metric": "per-op scaling efficiency (sec ratio vs cpu ratio)",
           "cpus_lo": lo, "cpus_hi": hi, "sf": _sf_of(SF_DIR),
           "families": SCALING_OPS_FAMILIES}
    for op in ("minhash_dedup", "ngram_jaccard", "packed_tokens",
               "semdedup_ingest"):
        if op not in r_lo or op not in r_hi:
            continue
        res[f"{op}_sec_lo"] = r_lo[op]
        res[f"{op}_sec_hi"] = r_hi[op]
        res[f"{op}_scaling_efficiency"] = round(
            (r_lo[op] / r_hi[op]) / (hi / lo), 3)
    return res


def _is_ray_core_crash(returncode: int, stderr: str) -> bool:
    """True only for the known fatal Ray-core abort signatures (signal
    kill, ray check-failure, raylet death) — a deterministic assertion
    or regression failure must fail fast, not double the run."""
    return (returncode < 0
            or "Check failed" in stderr
            or "task_manager.cc" in stderr
            or ("raylet" in stderr and "died" in stderr))


def _run_supervised(argv: list[str]) -> int:
    """Run the suite in a child process, retrying once on a fatal crash.

    Ray-core check failures (e.g. ``task_manager.cc: Tried to complete
    task that was not pending``, a rare completion/GC race observed once
    under full-suite load) abort the whole driver process and cannot be
    caught in-process; a clean re-run succeeds. The JSON-line stdout
    contract is preserved: the child's last JSON line is reprinted.
    """
    for attempt in (1, 2):
        out = subprocess.run(
            [sys.executable, __file__, *argv],
            env=dict(os.environ, GRAFT_BENCH_INNER="1"),
            capture_output=True, text=True)
        sys.stderr.write(out.stderr[-8000:])
        lines = [ln for ln in out.stdout.strip().splitlines()
                 if ln.startswith("{")]
        if out.returncode == 0 and lines:
            print(lines[-1])
            return 0
        # retry ONLY on the known fatal Ray-core abort (a nondeterministic
        # completion/GC race)
        crash = _is_ray_core_crash(out.returncode, out.stderr)
        if attempt == 1 and not crash:
            print(f"bench failed rc={out.returncode} (deterministic, "
                  "no Ray-core crash signature); not retrying",
                  file=sys.stderr)
            return 1
        print(f"bench attempt {attempt} failed rc={out.returncode}; "
              f"{'retrying (Ray-core crash)' if attempt == 1 else 'giving up'}",
              file=sys.stderr)
        time.sleep(10)  # let the crashed Ray session's processes exit
    return 1


if __name__ == "__main__":
    if os.environ.get("GRAFT_BENCH_INNER"):
        if "--scaling-ops" in sys.argv:
            print(json.dumps(run_ops_leg()
                             if os.environ.get("GRAFT_OPS_LEG")
                             else run_scaling_ops()))
        elif "--scaling" in sys.argv:
            print(json.dumps(run_scaling()))
        else:
            print(json.dumps(run_benchmarks()))
    else:
        sys.exit(_run_supervised(sys.argv[1:]))

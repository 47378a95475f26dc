"""Driver-contract queries: one entry per implemented operator/pipeline
(SURVEY §2 + training-data ops), each a callable ``sf_dir -> Dataset /
DataFrame / Table``, with matching DuckDB oracle SQL in ``ORACLE_SQL``.

Column names and integer types are aligned with the SQL aliases — the
driver's compare sorts columns by name and hashes values.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .ops.exchange import actor_pool


def _docs(sf_dir: str, columns=None):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _events(sf_dir: str, columns=None):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/events.parquet", columns=columns)


def _embeddings(sf_dir: str):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/embeddings.parquet")


def parity_half(b: pa.Table, rem: int, col: str = "doc_id") -> pa.Table:
    """Rows whose int64 ``col`` has parity ``rem`` — the deterministic
    two-run split shared by every cross-run ingest query and the bench
    stress legs (run A = evens commits the index, run B = odds ingests
    against it)."""
    par = pc.bit_wise_and(pc.cast(b.column(col), pa.int64()),
                          pa.scalar(1, pa.int64()))
    return b.filter(pc.equal(par, pa.scalar(rem, pa.int64())))


# ---------------------------------------------------------------------------
# SQL-checked queries
# ---------------------------------------------------------------------------

def q_token_stats(sf_dir: str):
    """Per-lang tokenization stats (engine Split(' ') semantics)."""
    from .ops.text import token_stats
    return token_stats(_docs(sf_dir, ["lang", "text"]))


def q_route_counts(sf_dir: str):
    """Broadcast lang-lookup enrich → routed counts (no shuffle join)."""
    import ray
    from ray.data.aggregate import Sum
    from .stages.enrich import EnrichStage, DEFAULT_LANG_CLASSES

    ref = ray.put(dict(DEFAULT_LANG_CLASSES))
    ds = _docs(sf_dir, ["doc_id", "lang"]).map_batches(
        EnrichStage, fn_constructor_kwargs=dict(lang_lookup_ref=ref),
        batch_format="pyarrow", concurrency=actor_pool())

    def partial(b: pa.Table) -> pa.Table:
        g = b.select(["lang_class"]).group_by(["lang_class"]).aggregate(
            [([], "count_all")])
        return pa.table({"lang_class": g.column("lang_class"),
                         "partial_n": g.column("count_all")})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("lang_class").aggregate(Sum("partial_n", alias_name="n"))


def q_exact_dedup(sf_dir: str):
    """Exact dedup survivors: min doc_id per distinct text."""
    from .ops.dedup import exact_dedup
    return exact_dedup(_docs(sf_dir, ["doc_id", "text"]))


def q_top_tokens(sf_dir: str):
    """Top-20 tokens (n desc, token asc tie-break)."""
    from .ops.text import top_tokens
    return top_tokens(_docs(sf_dir, ["text"]), k=20)


def q_top_tokens_by_lang(sf_dir: str):
    """Top-5 tokens per language (per-group vocabulary heavy hitters):
    per-batch (lang, token) count partials → one narrow groupby → the
    pruned top-k-per-group exchange. Raw tokens never shuffle."""
    from ray.data.aggregate import Sum
    from .ops.asof import top_k_per_group
    from .ops.text import _token_lists

    def partial(b: pa.Table) -> pa.Table:
        toks = _token_lists(b.column("text"))
        counts = np.diff(np.asarray(toks.offsets, dtype=np.int64))
        lang_rep = b.column("lang").take(pa.array(
            np.repeat(np.arange(len(b), dtype=np.int64), counts)))
        t = pa.table({"lang": lang_rep, "token": pc.list_flatten(toks)})
        g = t.group_by(["lang", "token"]).aggregate([([], "count_all")])
        return pa.table({"lang": g.column("lang"),
                         "token": g.column("token"),
                         "n_part": g.column("count_all")})

    agg = _docs(sf_dir, ["lang", "text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["lang", "token"]).aggregate(Sum("n_part", alias_name="n"))
    out = top_k_per_group(agg, "lang", "n", k=5, tiebreak="token")
    return out.select_columns(["lang", "token", "n", "rank"])


def q_tokenize_ids(sf_dir: str):
    """Vocabulary tokenization: top-256 vocab ids per token position
    (OOV → 0), exploded (doc_id, pos, token_id) rows."""
    from .ops.text import tokenize_ids
    return tokenize_ids(_docs(sf_dir, ["doc_id", "text"]), vocab_size=256)


def q_packed_tokens(sf_dir: str):
    """The end artifact of the curation pipeline: fixed-budget training
    sequences. Composes ``tokenize_ids`` (exploded token ids) with
    ``pack_chunks`` (per-doc global start offsets) through a distributed
    hash join — the starts side is one narrow row per doc, never
    broadcast — then one vectorized pass computes each token's
    (seq_id, seq_pos). 256-token sequences, 256-word vocabulary."""
    B = 256
    from .ops.join import hash_join
    from .ops.scan import pack_chunks
    from .ops.text import tokenize_ids
    toks = tokenize_ids(_docs(sf_dir, ["doc_id", "text"]), vocab_size=256)
    starts = pack_chunks(_docs(sf_dir, ["doc_id", "text"]),
                         chunk_tokens=B) \
        .select_columns(["doc_id", "start_tok"])
    joined = hash_join(toks, starts, "doc_id", "doc_id",
                       left_cols=["doc_id", "pos", "token_id"],
                       right_cols=["doc_id", "start_tok"])

    def finish(b: pa.Table) -> pa.Table:
        g = np.asarray(b.column("start_tok").to_numpy(), dtype=np.int64) \
            + np.asarray(b.column("pos").to_numpy(), dtype=np.int64)
        return pa.table({
            "seq_id": pa.array(g // B),
            "seq_pos": pa.array(g % B),
            "doc_id": b.column("doc_id"),
            "token_id": b.column("token_id"),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


def q_longest_docs(sf_dir: str):
    """Global ORDER BY ... LIMIT without a global sort: per-batch local
    top-k (every global winner survives its own batch's prune) → the
    driver merges only k × n_blocks candidate rows."""
    from .ops.text import _token_lists
    K = 20

    def local_topk(b: pa.Table) -> pa.Table:
        toks = _token_lists(b.column("text"))
        t = pa.table({
            "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
            "n_tokens": pa.array(
                np.diff(np.asarray(toks.offsets, dtype=np.int64))),
        })
        idx = pc.sort_indices(t, sort_keys=[("n_tokens", "descending"),
                                            ("doc_id", "ascending")])
        return t.take(idx.slice(0, K))

    pdf = _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(local_topk, batch_format="pyarrow").to_pandas()
    return pdf.sort_values(["n_tokens", "doc_id"],
                           ascending=[False, True]).head(K) \
        .reset_index(drop=True)


def q_quality_scores(sf_dir: str):
    """Per-doc integer quality features."""
    from .ops.text import quality_scores
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        quality_scores, batch_format="pyarrow")


def q_events_hourly(sf_dir: str):
    """Tumbling 1h window count per event_type (partial-aggregated)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(b.column("ts"), unit="hour")
        t = pa.table({"event_type": b.column("event_type"), "hour": hour})
        g = t.group_by(["event_type", "hour"]).aggregate([([], "count_all")])
        return pa.table({"event_type": g.column("event_type"),
                         "hour": g.column("hour"),
                         "partial_n": g.column("count_all")})

    return _events(sf_dir, ["event_type", "ts"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "hour"]) \
        .aggregate(Sum("partial_n", alias_name="n"))


def q_parse_events(sf_dir: str):
    """Round-trip header-parse check: render each event as an app-log line,
    parse it back with the compiled header kernel, aggregate per
    (severity, hour). The oracle computes the same from the raw columns —
    equality proves the parse (Date/Time items, timestamp assembly) and the
    severity enrich end-to-end."""
    from ray.data.aggregate import Sum
    from .kernel.parse import CompiledLogParser
    from .rules import items as I
    from .rules.header import HeaderRule
    from .rules.presets import default_statement_actions

    rules = [HeaderRule(items=[I.Date(), I.Time(),
                               I.String("level"),
                               I.UserItem("component", r"[a-z.]+"),
                               I.Statement()],
                        separator=" :")]

    class RenderParse:
        def __init__(self):
            self.parser = CompiledLogParser(
                rules, default_statement_actions())

        def __call__(self, b: pa.Table) -> pa.Table:
            import pandas as pd
            ts = b.column("ts").to_pandas()
            et = b.column("event_type").to_pylist()
            uid = b.column("user_id").to_pylist()
            lines = [
                f"{t.strftime('%Y-%m-%d %H:%M:%S')} "
                f"{'ERROR' if e == 'error' else 'INFO'} app.events: "
                f"{e} event for user {u}"
                for t, e, u in zip(ts, et, uid)
            ]
            out = self.parser.parse_lines(pa.array(lines, type=pa.string()))
            sev = pc.if_else(pc.equal(out.column("level"), "ERROR"),
                             "error", "info")
            hour = pc.floor_temporal(out.column("timestamp"), unit="hour")
            t2 = pa.table({"severity": sev, "hour": hour})
            g = t2.group_by(["severity", "hour"]).aggregate(
                [([], "count_all")])
            return pa.table({"severity": g.column("severity"),
                             "hour": g.column("hour"),
                             "partial_n": g.column("count_all")})

    return _events(sf_dir, ["ts", "event_type", "user_id"]) \
        .map_batches(RenderParse, batch_format="pyarrow",
                     concurrency=actor_pool()) \
        .groupby(["severity", "hour"]) \
        .aggregate(Sum("partial_n", alias_name="n"))


def q_knn_cosine(sf_dir: str):
    """Exact cosine top-10 for the first 5 vectors (broadcast queries,
    per-batch local top-k, driver merge)."""
    from .ops.similarity import knn_brute_force, queries_from_dataset
    ds = _embeddings(sf_dir)
    queries = queries_from_dataset(ds, n_queries=5)
    return knn_brute_force(ds, queries, k=10)


def q_doc_prefix_counts(sf_dir: str):
    """Grouped count by 3-token prefix "template" of each doc."""
    from ray.data.aggregate import Sum
    from .ops.text import _token_lists

    def partial(b: pa.Table) -> pa.Table:
        toks = _token_lists(b.column("text"))
        prefix = pc.binary_join(pc.list_slice(toks, 0, 3), " ")
        t = pa.table({"prefix": prefix})
        g = t.group_by(["prefix"]).aggregate([([], "count_all")])
        return pa.table({"prefix": g.column("prefix"),
                         "partial_n": g.column("count_all")})

    return _docs(sf_dir, ["text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("prefix").aggregate(Sum("partial_n", alias_name="n"))


def q_tokens_exploded(sf_dir: str):
    """Engine tokenizer (Split(' ') statement semantics) exploded to
    (doc_id, pos, token) rows — position-exact oracle for segmentation."""
    from .ops.text import _token_lists

    def explode(b: pa.Table) -> pa.Table:
        toks = _token_lists(b.column("text"))
        parents = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        offsets = np.asarray(toks.offsets, dtype=np.int64)
        starts = np.repeat(offsets[:-1], np.diff(offsets))
        pos = np.arange(len(flat), dtype=np.int64) - starts + 1
        return pa.table({
            "doc_id": b.column("doc_id").take(parents),
            "pos": pa.array(pos, type=pa.int64()),
            "token": flat,
        })

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        explode, batch_format="pyarrow")


def q_sessions(sf_dir: str):
    """Gap-based (30 min) session windows per user: n_sessions, n_events."""
    from .ops.windows import session_counts
    return session_counts(_events(sf_dir, ["user_id", "ts"]),
                          gap_sec=1800)


def q_distinct_users(sf_dir: str):
    """Exact count-distinct users per event_type (two-phase)."""
    from .ops.windows import distinct_counts
    return distinct_counts(_events(sf_dir, ["event_type", "user_id"]),
                           "event_type", "user_id")


def q_orders_by_nation(sf_dir: str):
    """Broadcast join: orders ⋈ customer ⋈ nation (both small sides shipped
    once via ray.put) → orders per nation."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Sum
    from .ops.join import broadcast_join

    cust = pq.read_table(f"{sf_dir}/customer.parquet",
                         columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet",
                           columns=["n_nationkey", "n_name"])
    orders = _orders(sf_dir, ["o_custkey"])
    j = broadcast_join(orders, cust.rename_columns(["o_custkey",
                                                    "c_nationkey"]),
                       "o_custkey")
    j = broadcast_join(j, nation.rename_columns(["c_nationkey", "n_name"]),
                       "c_nationkey")

    def partial(b: pa.Table) -> pa.Table:
        g = b.select(["n_name"]).group_by(["n_name"]).aggregate(
            [([], "count_all")])
        return pa.table({"n_name": g.column("n_name"),
                         "partial_n": g.column("count_all")})

    return j.map_batches(partial, batch_format="pyarrow") \
        .groupby("n_name").aggregate(Sum("partial_n", alias_name="n"))


def q_lineitem_join(sf_dir: str):
    """Partitioned hash join: lineitem ⋈ orders on orderkey (both sides
    large, bucket co-partitioning) → rows + quantity by order status."""
    import ray.data as rd
    from ray.data.aggregate import Sum
    from .ops.join import hash_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])
    orders = _orders(sf_dir, ["o_orderkey", "o_orderstatus"])
    j = hash_join(li, orders, "l_orderkey", "o_orderkey")

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            "o_orderstatus": b.column("o_orderstatus"),
            "qty": pc.cast(b.column("l_quantity"), pa.int64()),
        })
        g = t.group_by(["o_orderstatus"]).aggregate(
            [("qty", "sum"), ([], "count_all")])
        return pa.table({"o_orderstatus": g.column("o_orderstatus"),
                         "partial_q": g.column("qty_sum"),
                         "partial_n": g.column("count_all")})

    return j.map_batches(partial, batch_format="pyarrow") \
        .groupby("o_orderstatus").aggregate(
            Sum("partial_q", alias_name="sum_qty"),
            Sum("partial_n", alias_name="n"))


def _orders(sf_dir: str, columns=None):
    import ray.data as rd
    return rd.read_parquet(f"{sf_dir}/orders.parquet", columns=columns)


def q_anti_join_customers(sf_dir: str):
    """Anti join: customers with NO completed ('F') order. The
    membership-test shape of decontamination / holdout passes — only the
    right side's KEY column enters the shuffle."""
    import ray.data as rd
    from .ops.join import hash_join
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name", "c_acctbal"])
    f_orders = _orders(sf_dir, ["o_custkey", "o_orderstatus"]) \
        .filter(expr="o_orderstatus == 'F'")
    return hash_join(cust, f_orders, "c_custkey", "o_custkey", how="anti")


def q_semi_join_customers(sf_dir: str):
    """Semi join: customers with at least one 'F' order — each left row
    emitted once regardless of how many orders match."""
    import ray.data as rd
    from .ops.join import hash_join
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_mktsegment"])
    f_orders = _orders(sf_dir, ["o_custkey", "o_orderstatus"]) \
        .filter(expr="o_orderstatus == 'F'")
    return hash_join(cust, f_orders, "c_custkey", "o_custkey", how="semi")


def q_left_join_order_counts(sf_dir: str):
    """Left outer join + aggregate: per-customer count of 'F' orders with
    zero-order customers present (n_orders = 0) — exercises the null
    right-side rows end-to-end while keeping the gated output null-free."""
    import ray.data as rd
    from ray.data.aggregate import Sum
    from .ops.join import hash_join

    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"])
    f_orders = _orders(sf_dir, ["o_custkey", "o_orderkey",
                                "o_orderstatus"]) \
        .filter(expr="o_orderstatus == 'F'")
    j = hash_join(cust, f_orders, "c_custkey", "o_custkey", how="left",
                  right_cols=["o_custkey", "o_orderkey"])

    def partial(b: pa.Table) -> pa.Table:
        g = b.group_by(["c_custkey"]).aggregate([("o_orderkey", "count")])
        return pa.table({"c_custkey": g.column("c_custkey"),
                         "partial_n": g.column("o_orderkey_count")})

    return j.map_batches(partial, batch_format="pyarrow") \
        .groupby("c_custkey").aggregate(Sum("partial_n",
                                            alias_name="n_orders"))


def q_asof_prev_error(sf_dir: str):
    """As-of join: for each purchase event, the most recent earlier error
    event of the same user (bucketed merge_asof)."""
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
    from .ops.asof import asof_join
    purchases = ds.filter(expr="event_type == 'purchase'") \
        .drop_columns(["event_type"])
    errors = ds.filter(expr="event_type == 'error'") \
        .drop_columns(["event_type", "event_id"])
    out = asof_join(purchases, errors, key="user_id", ts_col="ts",
                    right_cols=[])
    # inner semantics (drop unmatched) so the comparison carries no null
    # timestamps — driver value-hashing of NaT vs None is representation-
    # dependent
    out = out.map_batches(
        lambda b: b.filter(pc.is_valid(b.column("ts_prev"))),
        batch_format="pyarrow")
    return out.select_columns(["event_id", "ts_prev"])


def q_top_events_per_user(sf_dir: str):
    """Top-2 events by value per user (deterministic tie-break)."""
    from .ops.asof import top_k_per_group
    ds = _events(sf_dir, ["user_id", "event_id", "value"])
    out = top_k_per_group(ds, "user_id", "value", k=2,
                          tiebreak="event_id")
    return out.select_columns(["user_id", "event_id", "rank"])


def q_train_split(sf_dir: str):
    """Deterministic 80% train split of documents by md5(doc_id)."""
    from .ops.text import split_by_hash
    return split_by_hash(_docs(sf_dir, ["doc_id", "lang"]),
                         "doc_id", percent=80).select_columns(["doc_id"])


def q_stratified_sample(sf_dir: str):
    """Deterministic 10-docs-per-lang sample (md5 order per stratum;
    per-batch partial top-k — no corpus shuffle)."""
    from .ops.text import stratified_sample
    return stratified_sample(_docs(sf_dir, ["doc_id", "lang"]),
                             "lang", "doc_id", k=10)[["lang", "doc_id"]]


def q_approx_distinct(sf_dir: str):
    """HLL approximate distinct users per event_type. Gated: md5-based
    60-bit hashing + exact-integer raw estimate (p=5, m=32, no small-range
    correction) is reproduced register-for-register by the SQL oracle."""
    from .ops.sketch import approx_distinct
    return approx_distinct(_events(sf_dir, ["event_type", "user_id"]),
                           "event_type", "user_id", p=5, estimator="int")


def q_median_value(sf_dir: str):
    """Exact per-event_type median (discrete, = DuckDB quantile_disc)."""
    from .ops.stats import group_quantile
    return group_quantile(_events(sf_dir, ["event_type", "value"]),
                          "event_type", "value", q=0.5, alias="median_value")


def q_value_p90_hist(sf_dir: str):
    """Bounded-memory p90 of the continuous ``value`` column via the
    histogram (binned counting-sort) quantile — the scale path where the
    exact O(distinct-values) quantile degrades on continuous floats.
    Returns the integer bin (``floor(value * 100)``) of the p90 element."""
    from .ops.stats import histogram_quantile
    b = histogram_quantile(_events(sf_dir, ["value"]), "value",
                           q=0.9, scale=100)
    return pa.table({"q_bin": pa.array([b], type=pa.int64())})


def q_events_profile(sf_dir: str):
    """ANALYZE-style one-pass column profile of the events table: per
    column the valid/null counts and min/max (numeric as DOUBLE, string
    lexicographic) — the shuffle carries one partial row per (batch,
    column), never data rows."""
    from .ops.stats import profile_columns
    return profile_columns(
        _events(sf_dir),
        numeric_cols=("event_id", "user_id", "value"),
        string_cols=("event_type", "props"))


def q_value_p90_by_type(sf_dir: str):
    """Per-event_type p90 of the continuous ``value`` column via the
    binned per-group quantile — the shuffle carries pre-aggregated
    (group, bin, count) partials, never raw (group, value) pairs."""
    from .ops.stats import group_histogram_quantile
    return group_histogram_quantile(
        _events(sf_dir, ["event_type", "value"]), "event_type", "value",
        q=0.9, scale=100, alias="q_bin")


def q_events_hopping(sf_dir: str):
    """Hopping window (1h size, 30min hop) counts per event_type."""
    from .ops.stats import hopping_counts
    return hopping_counts(_events(sf_dir, ["event_type", "ts"]))


def q_event_pivot(sf_dir: str):
    """Pivot/crosstab: per user, one count column per event type (wide
    per-entity feature rows; dense bincount partials, no raw-event
    shuffle)."""
    from .ops.stats import pivot_counts
    return pivot_counts(_events(sf_dir, ["user_id", "event_type"]),
                        "user_id", "event_type",
                        ["click", "view", "purchase", "error", "signup"])


def q_length_ranks(sf_dir: str):
    """Global percentile rank of document length (count of strictly
    shorter docs = RANK()-1): distributed counting sort + one broadcast
    cumulative histogram — O(distinct lengths) memory, rows never
    shuffle."""
    from .ops.stats import percentile_rank
    ds = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: pa.table({
            "doc_id": b.column("doc_id"),
            "len": pc.cast(pc.utf8_length(b.column("text")), pa.int64()),
        }), batch_format="pyarrow")
    return percentile_rank(ds, "len", "doc_id")


def q_event_spikes(sf_dir: str):
    """Per-(event_type, hour) counts with an integer-exact 3x-mean spike
    flag (rate-anomaly detection over the aggregated hourly table)."""
    from .ops.stats import hourly_spikes
    return hourly_spikes(_events(sf_dir, ["event_type", "ts"]))


def q_cross_run_dedup(sf_dir: str):
    """Two-run incremental ingest (continuous-crawl dedup): run A commits
    even-doc content hashes to a fresh persistent index; run B (odd docs)
    drops cross-run AND within-run duplicates via a hash-partitioned anti
    join against the index. Returns run B's surviving doc ids."""
    import os
    import shutil

    from .ops.dedup import ingest_dedup_run

    # per-process state dir: two concurrent gate/bench runs on the same
    # sf_dir must not share (and rmtree) each other's index mid-run
    state = f"/tmp/l2sr_ingest_{os.getpid()}"
    shutil.rmtree(state, ignore_errors=True)
    docs = _docs(sf_dir, ["doc_id", "text"])
    half = parity_half

    run_a = docs.map_batches(lambda b: half(b, 0), batch_format="pyarrow")
    ingest_dedup_run(run_a, state)
    # augmented positives: run B also carries re-keyed COPIES of run A's
    # texts — every one must be dropped by the cross-run anti join
    rekeyed = docs.map_batches(
        lambda b: (lambda t: t.set_column(
            t.column_names.index("doc_id"), "doc_id",
            pc.add(pc.cast(t.column("doc_id"), pa.int64()),
                   pa.scalar(1_000_000, pa.int64()))))(half(b, 0)),
        batch_format="pyarrow")
    run_b = docs.map_batches(lambda b: half(b, 1),
                             batch_format="pyarrow").union(rekeyed)
    out = ingest_dedup_run(run_b, state)
    return out.select_columns(["doc_id"])


def q_compacted_dedup(sf_dir: str):
    """cross_run_dedup with an index COMPACTION between the runs
    (``compact_dedup_index`` merges the committed run into one
    manifest-covered run) — compaction must be invisible in the
    results, so this answers the exact cross_run_dedup oracle."""
    import os
    import shutil

    from .ops.dedup import compact_dedup_index, ingest_dedup_run

    state = f"/tmp/l2sr_ingc_{os.getpid()}"
    shutil.rmtree(state, ignore_errors=True)
    docs = _docs(sf_dir, ["doc_id", "text"])
    half = parity_half

    run_a = docs.map_batches(lambda b: half(b, 0), batch_format="pyarrow")
    ingest_dedup_run(run_a, state)
    stats = compact_dedup_index(state)
    assert stats["runs_compacted"] == 1 and stats["dir"] is not None
    rekeyed = docs.map_batches(
        lambda b: (lambda t: t.set_column(
            t.column_names.index("doc_id"), "doc_id",
            pc.add(pc.cast(t.column("doc_id"), pa.int64()),
                   pa.scalar(1_000_000, pa.int64()))))(half(b, 0)),
        batch_format="pyarrow")
    run_b = docs.map_batches(lambda b: half(b, 1),
                             batch_format="pyarrow").union(rekeyed)
    out = ingest_dedup_run(run_b, state)
    return out.select_columns(["doc_id"])


def q_cross_run_neardup(sf_dir: str):
    """Two-run incremental NEAR-dup ingest: run A (even docs) commits its
    shingle-hash index; run B = odd docs + re-keyed NEAR-variants of the
    even docs (one appended token → Jaccard just below 1) — every variant
    must drop against the committed index, and run-B-internal near-dups
    drop against lower ids. Returns run B's survivors with their shingle
    set sizes."""
    import os
    import shutil

    from .ops.curation import ingest_neardup_run

    # per-process state dir (see q_cross_run_dedup)
    state = f"/tmp/l2sr_nd_ingest_{os.getpid()}"
    shutil.rmtree(state, ignore_errors=True)
    docs = _docs(sf_dir, ["doc_id", "text"])
    half = parity_half

    run_a = docs.map_batches(lambda b: half(b, 0), batch_format="pyarrow")
    ingest_neardup_run(run_a, state)

    def variant(b: pa.Table) -> pa.Table:
        t = half(b, 0)
        return pa.table({
            "doc_id": pc.add(pc.cast(t.column("doc_id"), pa.int64()),
                             pa.scalar(1_000_000, pa.int64())),
            "text": pc.binary_join_element_wise(
                t.column("text"), pa.scalar(" zz9"), ""),
        })

    run_b = docs.map_batches(lambda b: half(b, 1),
                             batch_format="pyarrow") \
        .select_columns(["doc_id", "text"]) \
        .union(docs.map_batches(variant, batch_format="pyarrow"))
    out = ingest_neardup_run(run_b, state)
    return out.map_batches(
        lambda b: pa.table({"doc_id": b.column("doc_id"),
                            "n_shingles": b.column("sz_part")}),
        batch_format="pyarrow")


def q_compacted_neardup(sf_dir: str):
    """The cross_run_neardup pipeline with an INDEX COMPACTION between
    the runs: run A commits, ``compact_neardup_index`` rewrites the
    index hash-bucketed by shingle hash, and run B ingests through the
    bucket-aligned read path (each bucket file goes straight to its
    partition task — the committed index never enters an exchange).
    Same oracle as cross_run_neardup: compaction must be invisible in
    the results, bit for bit."""
    import os
    import shutil

    from .ops.curation import compact_neardup_index, ingest_neardup_run

    state = f"/tmp/l2sr_ndc_ingest_{os.getpid()}"
    shutil.rmtree(state, ignore_errors=True)
    docs = _docs(sf_dir, ["doc_id", "text"])
    half = parity_half

    run_a = docs.map_batches(lambda b: half(b, 0), batch_format="pyarrow")
    ingest_neardup_run(run_a, state)
    stats = compact_neardup_index(state)
    assert stats["runs_compacted"] == 1 and stats["dir"] is not None

    def variant(b: pa.Table) -> pa.Table:
        t = half(b, 0)
        return pa.table({
            "doc_id": pc.add(pc.cast(t.column("doc_id"), pa.int64()),
                             pa.scalar(1_000_000, pa.int64())),
            "text": pc.binary_join_element_wise(
                t.column("text"), pa.scalar(" zz9"), ""),
        })

    run_b = docs.map_batches(lambda b: half(b, 1),
                             batch_format="pyarrow") \
        .select_columns(["doc_id", "text"]) \
        .union(docs.map_batches(variant, batch_format="pyarrow"))
    out = ingest_neardup_run(run_b, state)
    return out.map_batches(
        lambda b: pa.table({"doc_id": b.column("doc_id"),
                            "n_shingles": b.column("sz_part")}),
        batch_format="pyarrow")


def q_cross_run_semdedup(sf_dir: str):
    """Two-run incremental SEMANTIC dedup ingest: run A (even vec_ids)
    commits its survivor vectors + the persisted bucketing centroids;
    run B = odd vectors + re-keyed NEAR-COPIES of the even vectors
    (+0.001 on dim 1 → cosine ≈ 1 vs the committed original) — every
    copy must drop against the committed index. Returns run B's
    surviving vec_ids."""
    import os
    import shutil

    from .ops.similarity import ingest_semdedup_run, _to_matrix

    state = f"/tmp/l2sr_sem_ingest_{os.getpid()}"
    shutil.rmtree(state, ignore_errors=True)

    base = _embeddings(sf_dir).map_batches(
        lambda b: pa.table({
            "vec_id": pc.cast(b.column("vec_id"), pa.int64()),
            "embedding": pc.cast(b.column("embedding"),
                                 pa.list_(pa.float64()))}),
        batch_format="pyarrow")

    def half(b: pa.Table, rem: int) -> pa.Table:
        return parity_half(b, rem, col="vec_id")

    run_a = base.map_batches(lambda b: half(b, 0), batch_format="pyarrow")
    ingest_semdedup_run(run_a, state, threshold=0.9, n_centroids=8,
                        n_assign=3)

    def near_copy(b: pa.Table) -> pa.Table:
        t = half(b, 0)
        X = _to_matrix(t.column("embedding")).copy()
        if len(X):
            X[:, 0] += 0.001
        return pa.table({
            "vec_id": pc.add(t.column("vec_id"),
                             pa.scalar(200000, pa.int64())),
            "embedding": pa.array(list(X), type=pa.list_(pa.float64())),
        })

    run_b = base.map_batches(lambda b: half(b, 1),
                             batch_format="pyarrow") \
        .union(base.map_batches(near_copy, batch_format="pyarrow"))
    return ingest_semdedup_run(run_b, state, threshold=0.9,
                               n_centroids=8, n_assign=3)


def q_compacted_semdedup(sf_dir: str):
    """cross_run_semdedup with an index COMPACTION between the runs:
    ``compact_semdedup_index`` rewrites the committed survivors with a
    pre-expanded centroid-bucketed layout, and run B ingests through
    the bucket-aligned read path (no index-side re-read/assign/split).
    Answers the exact cross_run_semdedup oracle — compaction must be
    invisible."""
    import os
    import shutil

    from .ops.similarity import (_to_matrix, compact_semdedup_index,
                                 ingest_semdedup_run)

    state = f"/tmp/l2sr_semc_ingest_{os.getpid()}"
    shutil.rmtree(state, ignore_errors=True)

    base = _embeddings(sf_dir).map_batches(
        lambda b: pa.table({
            "vec_id": pc.cast(b.column("vec_id"), pa.int64()),
            "embedding": pc.cast(b.column("embedding"),
                                 pa.list_(pa.float64()))}),
        batch_format="pyarrow")

    def half(b: pa.Table, rem: int) -> pa.Table:
        return parity_half(b, rem, col="vec_id")

    run_a = base.map_batches(lambda b: half(b, 0), batch_format="pyarrow")
    ingest_semdedup_run(run_a, state, threshold=0.9, n_centroids=8,
                        n_assign=3)
    stats = compact_semdedup_index(state, n_assign=3, n_centroids=8)
    assert stats["runs_compacted"] == 1 and stats["dir"] is not None

    def near_copy(b: pa.Table) -> pa.Table:
        t = half(b, 0)
        X = _to_matrix(t.column("embedding")).copy()
        if len(X):
            X[:, 0] += 0.001
        return pa.table({
            "vec_id": pc.add(t.column("vec_id"),
                             pa.scalar(200000, pa.int64())),
            "embedding": pa.array(list(X), type=pa.list_(pa.float64())),
        })

    run_b = base.map_batches(lambda b: half(b, 1),
                             batch_format="pyarrow") \
        .union(base.map_batches(near_copy, batch_format="pyarrow"))
    return ingest_semdedup_run(run_b, state, threshold=0.9,
                               n_centroids=8, n_assign=3)


def q_event_bigrams(sf_dir: str):
    """User-path transition counts: consecutive event-type pairs per
    user in (ts, event_id) order, counted globally."""
    from .ops.windows import event_bigrams
    return event_bigrams(_events(
        sf_dir, ["user_id", "ts", "event_id", "event_type"]))


def q_hourly_users(sf_dir: str):
    """Exact distinct users per hour (unique-pairs-only shuffle keyed by
    the window instead of an entity column)."""
    from .ops.windows import distinct_counts
    hours = _events(sf_dir, ["user_id", "ts"]).map_batches(
        lambda b: pa.table({
            "hour": pc.floor_temporal(b.column("ts"), unit="hour"),
            "user_id": b.column("user_id"),
        }), batch_format="pyarrow")
    return distinct_counts(hours, "hour", "user_id")


def q_funnel_conversions(sf_dir: str):
    """Funnel: for every purchase, how many clicks the same user made in
    the 30 minutes before it — the NEGATIVE-offset interval join
    ((ts-30min, ts] window)."""
    from .ops.join import interval_count_join
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
    purchases = ds.filter(expr="event_type == 'purchase'") \
        .drop_columns(["event_type"])
    clicks = ds.filter(expr="event_type == 'click'") \
        .drop_columns(["event_type", "event_id"])
    return interval_count_join(purchases, clicks, key="user_id",
                               lo_us=-1_800_000_000, hi_us=0)


def q_lang_source_rollup(sf_dir: str):
    """ROLLUP counts over (lang, source): finest level + per-lang
    subtotals + grand total in one corpus pass."""
    from .ops.stats import rollup_counts
    return rollup_counts(_docs(sf_dir, ["lang", "source"]),
                         "lang", "source")


def q_props_sum(sf_dir: str):
    """Vectorized JSON metadata extraction (one RE2 kernel, no per-row
    json.loads) + per-type sums of the extracted field."""
    from ray.data.aggregate import Sum
    from .ops.normalize import extract_json_int

    ds = _events(sf_dir, ["event_type", "props"]).map_batches(
        lambda b: extract_json_int(b, "props", "k", "k"),
        batch_format="pyarrow")

    def partial(b: pa.Table) -> pa.Table:
        g = b.select(["event_type", "k"]).group_by(["event_type"]) \
            .aggregate([("k", "sum"), ("k", "count")])
        return pa.table({"event_type": g.column("event_type"),
                         "s_part": g.column("k_sum"),
                         "n_part": g.column("k_count")})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Sum("s_part", alias_name="sum_k"),
            Sum("n_part", alias_name="n"))


def q_snapshot_diff(sf_dir: str):
    """Corpus snapshot delta (incremental-pipeline shape): added /
    removed / changed docs between two deterministic synthetic snapshots,
    composed from the three hash_join modes (anti ×2 + inner with a
    payload inequality filter). Only (id, text) pairs shuffle."""
    from .ops.join import hash_join

    docs = _docs(sf_dir, ["doc_id", "text"])

    def old_snap(b: pa.Table) -> pa.Table:
        ids = pc.cast(b.column("doc_id"), pa.int64())
        keep = pc.not_equal(_mod(ids, 3), pa.scalar(0, pa.int64()))
        return b.filter(keep)

    def new_snap(b: pa.Table) -> pa.Table:
        ids = pc.cast(b.column("doc_id"), pa.int64())
        b = b.filter(pc.not_equal(_mod(ids, 3), pa.scalar(1, pa.int64())))
        ids = pc.cast(b.column("doc_id"), pa.int64())
        edited = pc.equal(_mod(ids, 7), pa.scalar(0, pa.int64()))
        text = pc.if_else(edited,
                          pc.binary_join_element_wise(
                              b.column("text"), " v2", ""),
                          b.column("text"))
        return pa.table({"doc_id": b.column("doc_id"), "text": text})

    old = docs.map_batches(old_snap, batch_format="pyarrow")
    new = docs.map_batches(new_snap, batch_format="pyarrow")

    def tag(ds, status):
        return ds.map_batches(
            lambda b, s=status: pa.table({
                "doc_id": b.column("doc_id"),
                "status": pa.array([s] * b.num_rows)}),
            batch_format="pyarrow")

    removed = tag(hash_join(old, new, "doc_id", "doc_id", how="anti",
                            left_cols=["doc_id"]), "removed")
    added = tag(hash_join(new, old, "doc_id", "doc_id", how="anti",
                          left_cols=["doc_id"]), "added")
    old_t = old.map_batches(lambda b: b.rename_columns(
        ["doc_id", "text_old"]), batch_format="pyarrow")
    new_t = new.map_batches(lambda b: b.rename_columns(
        ["doc_id", "text_new"]), batch_format="pyarrow")
    both = hash_join(old_t, new_t, "doc_id", "doc_id")
    changed = tag(both.map_batches(
        lambda b: b.filter(pc.not_equal(b.column("text_old"),
                                        b.column("text_new"))),
        batch_format="pyarrow"), "changed")
    return removed.union(added).union(changed)


def _mod(arr, k: int):
    # pc has no modulo kernel; a - (a/k)*k with integer division
    kk = pa.scalar(k, pa.int64())
    return pc.subtract(arr, pc.multiply(pc.divide(arr, kk), kk))


def q_doc_chunks(sf_dir: str):
    """Context-window chunking: 64-token chunks per document
    (one list_slice+join kernel per chunk index, not per row)."""
    from .ops.text import chunk_documents
    return chunk_documents(_docs(sf_dir, ["doc_id", "text"]), size=64)


def q_curation_funnel(sf_dir: str):
    """Per-stage survivor counts for the end-to-end curation pipeline:
    raw → Gopher keep → exact dedup → 90% train split → 64-token chunks.
    The funnel report a curation run publishes; each count streams its
    composed prefix (semi join routes the train ids back to their texts
    without broadcasting documents)."""
    from .ops.dedup import exact_dedup
    from .ops.join import hash_join
    from .ops.text import chunk_documents, gopher_filter, split_by_hash

    docs = _docs(sf_dir, ["doc_id", "text"])

    def keep_only(b: pa.Table) -> pa.Table:
        g = gopher_filter(b)
        return b.filter(pc.equal(g.column("reasons"), 0))

    kept = docs.map_batches(keep_only, batch_format="pyarrow")
    survivor_ids = exact_dedup(kept)
    train_ids = split_by_hash(survivor_ids, "doc_id", 90)
    train_docs = hash_join(kept, train_ids, "doc_id", "doc_id",
                           how="semi")
    chunks = chunk_documents(train_docs, size=64)
    rows = [("raw", docs.count()), ("gopher", kept.count()),
            ("dedup", survivor_ids.count()),
            ("train", train_ids.count()), ("chunks", chunks.count())]
    return pa.table({"stage": pa.array([r[0] for r in rows]),
                     "n": pa.array([r[1] for r in rows],
                                   type=pa.int64())})


def q_value_stats(sf_dir: str):
    """Per-event-type sufficient statistics (n, min/max/sum in integer
    micro-units) — order-independent one-pass merge."""
    from .ops.stats import group_value_stats
    return group_value_stats(_events(sf_dir, ["event_type", "value"]),
                             "event_type", "value")


#: decomposed-Unicode suffix appended to every 7th doc so the NFC path of
#: ``normalize_text`` is hash-gated (the raw corpus is ASCII, where NFC is
#: vacuous): e+combining-acute, I+combining-diaeresis, the fi ligature.
_NFC_SUFFIX = " Cafe\u0301 NAI\u0308VE \ufb01le"


def q_normalize_text(sf_dir: str):
    """Vectorized lowercase+NFC text normalization (cleanup stage). Every
    7th doc gets a deterministic decomposed-Unicode suffix so the NFC
    recomposition is exercised and value-hashed, not just the ASCII
    lowercase fast path."""
    from .ops.normalize import normalize_text

    def aug(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id")
        text = b.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        mask = pc.equal(pc.subtract(ids, pc.multiply(
            pc.divide(ids, 7), 7)), 0)
        appended = pc.binary_join_element_wise(
            text, pa.scalar(_NFC_SUFFIX), "")
        return b.set_column(b.schema.get_field_index("text"), "text",
                            pc.if_else(mask, appended, text))

    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        aug, batch_format="pyarrow") \
        .map_batches(normalize_text, batch_format="pyarrow") \
        .select_columns(["doc_id", "text_norm"])


def q_strip_html(sf_dir: str):
    """HTML tag/comment stripping. Gated: html is derived from the
    documents table by the same deterministic template the SQL oracle
    concatenates, so the regex strip + whitespace collapse is compared
    value-for-value."""
    from .ops.normalize import strip_html

    def mk_html(b: pa.Table) -> pa.Table:
        html = pc.binary_join_element_wise(
            "<html><head><title>d</title></head><body><h1>Doc ",
            pc.cast(b.column("doc_id"), pa.string()),
            "</h1><!-- boilerplate --><p>",
            b.column("text"),
            "</p></body></html>", "")
        return pa.table({"doc_id": b.column("doc_id"),
                         "html": pc.cast(html, pa.binary())})

    return _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(mk_html, batch_format="pyarrow") \
        .map_batches(strip_html, batch_format="pyarrow") \
        .select_columns(["doc_id", "html_text"])


# ---------------------------------------------------------------------------
# rows-only queries (non-SQL-expressible: streaming parse pipeline, LSH,
# heuristics, stubs)
# ---------------------------------------------------------------------------

def q_pii_masked(sf_dir: str):
    """PII masking (emails / IPv4 / intl phone → placeholder tokens) with
    per-doc PII counts. Every 5th doc is augmented with a deterministic
    email+ip+phone suffix so the positive path is hash-gated (the raw
    word-soup docs carry no PII)."""
    from .ops.normalize import mask_pii

    def aug(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id")
        text = b.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        s = pc.cast(ids, pa.string())
        m256 = pc.cast(pc.subtract(ids, pc.multiply(
            pc.divide(ids, 256), 256)), pa.string())
        m10 = pc.cast(pc.subtract(ids, pc.multiply(
            pc.divide(ids, 10), 10)), pa.string())
        suffix = pc.binary_join_element_wise(
            pa.scalar("contact user"), s, pa.scalar("@example.com ip 10."),
            m256, pa.scalar(".0.1 tel +14155550"), m10, "")
        mask = pc.equal(pc.subtract(ids, pc.multiply(
            pc.divide(ids, 5), 5)), 0)
        t = pc.if_else(mask,
                       pc.binary_join_element_wise(text, suffix, " "), text)
        return pa.table({"doc_id": ids, "text": t})

    return _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(aug, batch_format="pyarrow") \
        .map_batches(mask_pii, batch_format="pyarrow") \
        .select_columns(["doc_id", "text_masked", "n_pii"])


def q_url_hosts(sf_dir: str):
    """Per-host page counts over the materialized pages corpus (the
    grouping a per-domain quota pass runs on): vectorized URL parsing +
    per-batch partial counts → one small shuffle."""
    import ray.data as rd
    from ray.data.aggregate import Sum
    from .ops.normalize import extract_url_parts
    pages = rd.read_parquet(_ensure_pages(sf_dir), columns=["url"])

    def partial(b: pa.Table) -> pa.Table:
        t = extract_url_parts(b).select(["url_host", "url_domain"])
        g = t.group_by(["url_host", "url_domain"]).aggregate(
            [([], "count_all")])
        return pa.table({"url_host": g.column("url_host"),
                         "url_domain": g.column("url_domain"),
                         "partial_n": g.column("count_all")})

    return pages.map_batches(partial, batch_format="pyarrow") \
        .groupby(["url_host", "url_domain"]) \
        .aggregate(Sum("partial_n", alias_name="n"))


def q_gopher_filter(sf_dir: str):
    """Composite Gopher-style quality filter decisions per document
    (reasons bitmask + keep flag, integer-exact thresholds)."""
    from .ops.text import gopher_filter
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        gopher_filter, batch_format="pyarrow")


def q_curated_docs(sf_dir: str):
    """End-to-end curation pipeline COMPOSED from existing operators:
    Gopher quality filter (keep only reasons==0) → exact content dedup
    (min-id survivor per distinct text) → deterministic 90% train split
    (md5(doc_id) mod 100 < 90). Returns the surviving doc_ids — the doc
    set a pre-training run would consume."""
    from .ops.dedup import exact_dedup
    from .ops.text import gopher_filter, split_by_hash

    def keep_only(b: pa.Table) -> pa.Table:
        g = gopher_filter(b)
        return b.filter(pc.equal(g.column("reasons"), 0))

    kept = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        keep_only, batch_format="pyarrow")
    survivors = exact_dedup(kept)
    return split_by_hash(survivors, "doc_id", 90).select_columns(
        ["doc_id"])


def q_boilerplate_tokens(sf_dir: str):
    """Cross-document boilerplate removal at token granularity (vocabulary
    pruning): words occurring in ≥ 450 distinct docs are dropped from
    every doc; returns (doc_id, text_clean, n_removed)."""
    from .ops.normalize import remove_boilerplate_lines
    return remove_boilerplate_lines(_docs(sf_dir, ["doc_id", "text"]),
                                    "doc_id", min_docs=450, sep=" ")


#: fixed location the flagship oracle SQL re-reads; q_flagship overwrites
#: it atomically on every invocation (content is deterministic per sf_dir)
def q_url_dedup(sf_dir: str):
    """URL-level dedup over the pages corpus: canonicalize (lowercase
    scheme/host, drop query/fragment/trailing slashes) and reduce to one
    row per canonical URL with the duplicate count and the first raw URL.
    Every 3rd page (by url length) contributes an extra messy variant
    (uppercased scheme, tracking query, fragment, trailing slash) so the
    collapse is hash-gated. Shuffle carries per-batch (canon, n, min-url)
    partials only."""
    import ray.data as rd
    from ray.data.aggregate import Min, Sum
    from .ops.normalize import canonicalize_url
    pages = rd.read_parquet(_ensure_pages(sf_dir), columns=["url"])

    def aug(b: pa.Table) -> pa.Table:
        url = b.column("url")
        if isinstance(url, pa.ChunkedArray):
            url = url.combine_chunks()
        keep = pc.equal(pc.subtract(
            pc.utf8_length(url),
            pc.multiply(pc.divide(pc.utf8_length(url), 3), 3)), 0)
        messy = pc.binary_join_element_wise(
            pc.replace_substring_regex(url.filter(keep), pattern=r"^http",
                                       replacement="HTTP"),
            pa.scalar("/?utm_source=feed#frag"), "")
        return pa.table({"url": pa.concat_arrays(
            [url.combine_chunks() if isinstance(url, pa.ChunkedArray)
             else url, messy])})

    def partial(b: pa.Table) -> pa.Table:
        t = canonicalize_url(b)
        g = t.group_by(["url_canon"]).aggregate(
            [("url", "min"), ([], "count_all")])
        return pa.table({"url_canon": g.column("url_canon"),
                         "url_first": g.column("url_min"),
                         "partial_n": g.column("count_all")})

    return pages.map_batches(aug, batch_format="pyarrow") \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("url_canon").aggregate(
            Sum("partial_n", alias_name="n"),
            Min("url_first", alias_name="url_first"))


def q_domain_topk(sf_dir: str):
    """Per-domain quota (C4-style): keep the top-3 pages per url_host by
    token count (url tiebreak) — URL parsing + integer token counts +
    the pruned top-k-per-group exchange, composed."""
    import ray.data as rd
    from .ops.asof import top_k_per_group
    from .ops.normalize import extract_url_parts
    from .ops.text import _token_lists
    pages = rd.read_parquet(_ensure_pages(sf_dir), columns=["url", "text"])

    def prep(b: pa.Table) -> pa.Table:
        t = extract_url_parts(b)
        toks = _token_lists(b.column("text"))
        return pa.table({
            "url_host": t.column("url_host"),
            "url": b.column("url"),
            "n_tokens": pa.array(
                np.diff(np.asarray(toks.offsets, dtype=np.int64))),
        })

    out = top_k_per_group(pages.map_batches(prep, batch_format="pyarrow"),
                          "url_host", "n_tokens", k=3, tiebreak="url")
    return out.select_columns(["url_host", "url", "n_tokens", "rank"])


FLAGSHIP_PAGES_DIR = "/tmp/l2sr_flagship_pages"


def q_flagship(sf_dir: str):
    """Full parse→enrich→route→aggregate over the synthesized web corpus.

    SQL-gated: the deterministic synthesized pages are materialized to
    ``FLAGSHIP_PAGES_DIR`` (atomic dir swap) and the Ray pipeline consumes
    that SAME corpus in file-shard mode, so the engine and the DuckDB
    oracle (which re-implements line explode → 3-format header cascade →
    statement split → variable-token masking → routing in SQL) see
    identical input bytes."""
    from .pipelines import flagship
    return flagship.run(sf_dir, corpus_dir=_ensure_pages(sf_dir))


def _ensure_pages(sf_dir: str) -> str:
    """Materialize the deterministic synthesized pages corpus to
    ``FLAGSHIP_PAGES_DIR`` (atomic dir swap, overwritten per invocation)
    — the shared input the pages-based queries AND their DuckDB oracles
    read, so engine and SQL see identical bytes."""
    import os
    import shutil
    import uuid
    from .sources.webpages import read_webpages
    tmp = FLAGSHIP_PAGES_DIR + ".tmp-" + uuid.uuid4().hex[:6]
    read_webpages(sf_dir).repartition(8).write_parquet(tmp)
    if os.path.exists(FLAGSHIP_PAGES_DIR):
        shutil.rmtree(FLAGSHIP_PAGES_DIR)
    os.replace(tmp, FLAGSHIP_PAGES_DIR)
    return FLAGSHIP_PAGES_DIR


def q_minhash_dedup(sf_dir: str):
    """LSH at one-row bands (128 hashes = 128 bands): miss probability at
    the 0.5 threshold is (1-0.5)^128 ≈ 3e-39, so the verified pair set
    deterministically equals the exact-Jaccard pair set the SQL oracle
    computes via a shingle inverted index."""
    from .ops.dedup import minhash_dedup
    return minhash_dedup(_docs(sf_dir, ["doc_id", "text"]), threshold=0.5,
                         n_hashes=128, n_bands=128)


def q_minhash_clusters(sf_dir: str):
    from .ops.dedup import minhash_clusters
    return minhash_clusters(_docs(sf_dir, ["doc_id", "text"]),
                            threshold=0.5, n_hashes=128, n_bands=128)


def q_minhash_clusters_lp(sf_dir: str):
    """Same clusters via the distributed min-label-propagation path (the
    10^12-row alternative to driver union-find); gated by the identical
    recursive-CTE components oracle."""
    from .ops.dedup import minhash_clusters
    return minhash_clusters(_docs(sf_dir, ["doc_id", "text"]),
                            threshold=0.5, n_hashes=128, n_bands=128,
                            method="labelprop")


def q_simhash(sf_dir: str):
    from .ops.dedup import simhash_table
    return simhash_table(_docs(sf_dir, ["doc_id", "text"]))


def q_langid(sf_dir: str):
    from .ops.text import LangIdStage
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        LangIdStage, batch_format="pyarrow", concurrency=actor_pool()) \
        .select_columns(["doc_id", "lang_pred", "lang_hits"])


def q_fingerprint(sf_dir: str):
    from .ops.text import fingerprint
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        fingerprint, batch_format="pyarrow")


def q_knn_ivf(sf_dir: str):
    """IVF ANN gated at a high-probe setting (5 of 8 centroids): with
    deterministic (id-sorted) centroid training this configuration is
    verified to return the EXACT brute-force top-k on the test embeddings,
    so the assign→probe→filter→top-k machinery is held to the same SQL
    oracle as knn_cosine. The approximate regime (low probe) is covered by
    the recall@10 unit test — random test embeddings have no cluster
    structure, so low-probe recall there says nothing a gate could pin."""
    from .ops.similarity import knn_ivf, queries_from_dataset
    ds = _embeddings(sf_dir)
    queries = queries_from_dataset(ds, n_queries=5)
    return knn_ivf(ds, queries, k=10, n_centroids=8, n_probe=5)


def _explode_fixed_list(b: pa.Table, list_col: str, keep,
                        dim_col: str = "dim",
                        val_col: str = "value") -> pa.Table:
    """(id…, list<float32, D>) → one row per (id…, dim, value) with
    value widened to float64 (the fakes are dyadic uint16/65536 —
    exact in float32, float64 and SQL DOUBLE alike)."""
    lst = b.column(list_col).combine_chunks()
    d = lst.type.list_size
    n = len(b)
    idx = np.repeat(np.arange(n, dtype=np.int64), d)
    out = b.select(keep).take(pa.array(idx))
    out = out.append_column(
        dim_col, pa.array(np.tile(np.arange(d, dtype=np.int64), n)))
    return out.append_column(
        val_col, pc.cast(lst.flatten(), pa.float64()))


def q_media_features(sf_dir: str):
    """Image decode/feature stage over the synthetic media corpus; the
    16-dim fake embedding is exploded to (dim, value) rows so the DuckDB
    oracle hash-gates every value (md5-derived, integer-exact)."""
    from .ops.multimodal import media_pipeline
    return media_pipeline(sf_dir).map_batches(
        lambda b: _explode_fixed_list(
            b, "embedding", ["media_id", "width", "height", "channels"]),
        batch_format="pyarrow")


def q_simhash_dups(sf_dir: str):
    """Within-bucket SimHash near-dup pairs (Hamming ≤ 12), gated by a
    DuckDB xor/bit_count self-join under the same bucket constraint."""
    from .ops.dedup import simhash_dups
    return simhash_dups(_docs(sf_dir, ["doc_id", "text"]), max_hamming=12)


def q_repetition_scores(sf_dir: str):
    """Gopher-style repetition signal: per-doc bigram count + multiplicity
    of the most-repeated bigram."""
    from .ops.text import repetition_scores
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        repetition_scores, batch_format="pyarrow")


def q_audio_features(sf_dir: str):
    """Audio feature stage; the 13-dim fake MFCC explodes to (dim, value)
    rows for the value-hash gate."""
    from .ops.multimodal import audio_pipeline
    return audio_pipeline(sf_dir).map_batches(
        lambda b: _explode_fixed_list(
            b, "mfcc", ["media_id", "sample_rate", "duration_ms"]),
        batch_format="pyarrow")


def q_video_frames(sf_dir: str):
    from .ops.multimodal import frame_pipeline
    return frame_pipeline(sf_dir)


def q_media_thumbs(sf_dir: str):
    """Resize/thumbnail stage; the binary thumb (ASCII payload prefix)
    is cast to string for the gate."""
    from .ops.multimodal import thumb_pipeline
    return thumb_pipeline(sf_dir).map_batches(
        lambda b: pa.table({
            "media_id": b.column("media_id"),
            "width": pc.cast(b.column("width"), pa.int64()),
            "height": pc.cast(b.column("height"), pa.int64()),
            "thumb": pc.cast(b.column("thumb"), pa.string()),
        }), batch_format="pyarrow")


def _aug_embeddings(sf_dir: str):
    """Embeddings table plus a deterministic perturbed copy of every 5th
    vector (id + 100000, first dim + 0.5) — the raw table has no natural
    cosine pairs above 0.9, so the augmentation exercises the positive
    dedup path; the SQL oracles reproduce it verbatim."""
    from .ops.similarity import _to_matrix

    def perturb(b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("vec_id").to_pylist(), dtype=np.int64)
        keep = ids % 5 == 0
        X = _to_matrix(b.column("embedding"))[keep]
        X = X.copy()
        X[:, 0] += 0.5
        return pa.table({
            "vec_id": pa.array(ids[keep] + 100000),
            "embedding": pa.array(list(X),
                                  type=pa.list_(pa.float64())),
        })

    base = _embeddings(sf_dir)
    return base.map_batches(
        lambda b: pa.table({
            "vec_id": b.column("vec_id"),
            "embedding": pc.cast(b.column("embedding"),
                                 pa.list_(pa.float64()))}),
        batch_format="pyarrow") \
        .union(base.map_batches(perturb, batch_format="pyarrow"))


def q_embedding_dups(sf_dir: str):
    """Cosine near-dup pairs over the augmented embeddings table."""
    from .ops.dedup import embedding_dups
    return embedding_dups(_aug_embeddings(sf_dir), threshold=0.9,
                          n_centroids=8, n_assign=3)


def q_semdedup(sf_dir: str):
    """SemDeDup over the augmented embeddings: k-means (k=8, 1 Lloyd
    update), then within-cluster cosine >= 0.9 keep-first dedup."""
    from .ops.similarity import semdedup
    return semdedup(_aug_embeddings(sf_dir), k=8, iters=1, threshold=0.9)


def q_ngram_jaccard(sf_dir: str):
    """Exact 4-gram Jaccard near-dup pairs over the df≤64-capped shingle
    universe (inverted-index set-similarity self-join; the integer
    threshold 3·inter ≥ sz_a+sz_b ⟺ J ≥ 1/2 is decided bit-for-bit on
    both sides)."""
    from .ops.curation import ngram_jaccard_dups
    return ngram_jaccard_dups(_docs(sf_dir, ["doc_id", "text"]),
                              window=4, tau_num=1, tau_den=2, max_df=64)


def _mod37(b: pa.Table, keep_bench: bool) -> pa.Table:
    ids = b.column("doc_id").to_numpy()
    m = (ids % 37 == 0) if keep_bench else (ids % 37 != 0)
    return b.filter(pa.array(m))


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: every doc with doc_id % 37 == 0 plays
    the 'benchmark'; the rest of the corpus survives only with zero
    shared 6-grams."""
    from .ops.curation import decontaminate
    bench = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: _mod37(b, True), batch_format="pyarrow")
    corpus = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: _mod37(b, False), batch_format="pyarrow")
    return decontaminate(corpus, bench, window=6)


def q_decontaminate_frac(sf_dir: str):
    """Fraction-tolerant decontamination: corpus docs survive with AT
    MOST 10% of their distinct 6-grams shared with the benchmark set
    (integer-exact threshold); survivors carry their gram/hit counts."""
    from .ops.curation import decontaminate_frac
    bench = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: _mod37(b, True), batch_format="pyarrow")
    corpus = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        lambda b: _mod37(b, False), batch_format="pyarrow")
    return decontaminate_frac(corpus, bench, window=6,
                              max_frac_num=1, max_frac_den=10)


def q_paragraph_dedup(sf_dir: str):
    """Corpus-level paragraph dedup (20-token chunks): per-doc paragraph
    counts and first-occurrence survivors."""
    from .ops.curation import paragraph_dedup
    return paragraph_dedup(_docs(sf_dir, ["doc_id", "text"]),
                           para_tokens=20)


def q_cms_sketch(sf_dir: str):
    """Count-min sketch registers (4×256) over the token stream —
    register-for-register exact vs the SQL oracle."""
    from .ops.sketch import cms_sketch
    return cms_sketch(_docs(sf_dir, ["text"]), depth=4, width=256)


def q_doc_lm_score(sf_dir: str):
    """Unigram-LM quality score: mean top-32-vocabulary corpus frequency
    per document (integer sums, one IEEE division)."""
    from .ops.curation import doc_lm_score
    return doc_lm_score(_docs(sf_dir, ["doc_id", "text"]),
                        _docs(sf_dir, ["text"]), vocab_k=32)


def q_tfidf_top_terms(sf_dir: str):
    """Per-doc top-3 terms by ordinal TF-IDF (tf desc, df asc, token
    asc — no float idf)."""
    from .ops.curation import tfidf_top_terms
    return tfidf_top_terms(_docs(sf_dir, ["doc_id", "text"]),
                           _docs(sf_dir, ["doc_id", "text"]), k=3)


def q_pack_chunks(sf_dir: str):
    """Deterministic sequence packing: docs concatenated in id order,
    cut every 256 tokens; per-doc chunk ranges via the distributed
    prefix scan."""
    from .ops.scan import pack_chunks
    return pack_chunks(_docs(sf_dir, ["doc_id", "text"]),
                       chunk_tokens=256)


def q_shuffle_rank(sf_dir: str):
    """Deterministic global shuffle order: rank by (md5(doc_id),
    doc_id) via Ray sort + the offset scan."""
    from .ops.scan import shuffle_rank
    return shuffle_rank(_docs(sf_dir, ["doc_id"]))


def q_bpe_token_stats(sf_dir: str):
    """Per-doc token counts under the BPE-style regex pre-tokenizer."""
    from .ops.text import bpe_token_counts
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        bpe_token_counts, batch_format="pyarrow")


def q_dup_spans(sf_dir: str):
    """Maximal duplicated-substring token spans (8-token windows,
    corpus-wide multiplicity >= 2, overlapping windows merged)."""
    from .ops.curation import dup_spans
    return dup_spans(_docs(sf_dir, ["doc_id", "text"]), window=8)


def q_quantile_filter(sf_dir: str):
    """Keep documents at or above the exact global median token count —
    the threshold comes from the distributed value-histogram quantile
    (O(distinct values) memory, never a single-partition sort)."""
    from .ops.stats import global_quantile_disc
    from .ops.text import _token_lists

    def ntok(b: pa.Table) -> pa.Table:
        toks = _token_lists(b.column("text"))
        return pa.table({
            "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
            "n_tokens": pa.array(
                np.diff(np.asarray(toks.offsets, dtype=np.int64))),
        })

    # materialize the NARROW (2×int64) counts so the histogram pass and
    # the filter pass don't both re-tokenize; the object store spills if
    # it ever outgrows memory
    counts = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        ntok, batch_format="pyarrow").materialize()
    thr = global_quantile_disc(counts, "n_tokens", 0.5)
    return counts.filter(expr=f"n_tokens >= {int(thr)}")


def q_kmeans_clusters(sf_dir: str):
    """Distributed spherical k-means (k=8, init + 1 Lloyd update) over
    the embeddings table; deterministic id-mod init, no RNG."""
    from .ops.similarity import kmeans_assign
    return kmeans_assign(_embeddings(sf_dir), k=8, iters=1)


QUERIES = {
    "token_stats": q_token_stats,
    "route_counts": q_route_counts,
    "exact_dedup": q_exact_dedup,
    "top_tokens": q_top_tokens,
    "top_tokens_by_lang": q_top_tokens_by_lang,
    "event_bigrams": q_event_bigrams,
    "longest_docs": q_longest_docs,
    "tokenize_ids": q_tokenize_ids,
    "packed_tokens": q_packed_tokens,
    "quality_scores": q_quality_scores,
    "events_hourly": q_events_hourly,
    "parse_events": q_parse_events,
    "knn_cosine": q_knn_cosine,
    "doc_prefix_counts": q_doc_prefix_counts,
    "tokens_exploded": q_tokens_exploded,
    "sessions": q_sessions,
    "distinct_users": q_distinct_users,
    "orders_by_nation": q_orders_by_nation,
    "lineitem_join": q_lineitem_join,
    "anti_join_customers": q_anti_join_customers,
    "semi_join_customers": q_semi_join_customers,
    "left_join_order_counts": q_left_join_order_counts,
    "normalize_text": q_normalize_text,
    "pii_masked": q_pii_masked,
    "boilerplate_tokens": q_boilerplate_tokens,
    "gopher_filter": q_gopher_filter,
    "curated_docs": q_curated_docs,
    "url_hosts": q_url_hosts,
    "asof_prev_error": q_asof_prev_error,
    "top_events_per_user": q_top_events_per_user,
    "median_value": q_median_value,
    "value_p90_hist": q_value_p90_hist,
    "value_p90_by_type": q_value_p90_by_type,
    "events_profile": q_events_profile,
    "url_dedup": q_url_dedup,
    "domain_topk": q_domain_topk,
    "events_hopping": q_events_hopping,
    "event_pivot": q_event_pivot,
    "length_ranks": q_length_ranks,
    "event_spikes": q_event_spikes,
    "cross_run_dedup": q_cross_run_dedup,
    "compacted_dedup": q_compacted_dedup,
    "cross_run_neardup": q_cross_run_neardup,
    "compacted_neardup": q_compacted_neardup,
    "cross_run_semdedup": q_cross_run_semdedup,
    "compacted_semdedup": q_compacted_semdedup,
    "decontaminate_frac": q_decontaminate_frac,
    "value_stats": q_value_stats,
    "hourly_users": q_hourly_users,
    "funnel_conversions": q_funnel_conversions,
    "lang_source_rollup": q_lang_source_rollup,
    "props_sum": q_props_sum,
    "snapshot_diff": q_snapshot_diff,
    "doc_chunks": q_doc_chunks,
    "curation_funnel": q_curation_funnel,
    "train_split": q_train_split,
    "stratified_sample": q_stratified_sample,
    "approx_distinct": q_approx_distinct,
    "strip_html": q_strip_html,
    "flagship_template_counts": q_flagship,
    "minhash_dedup": q_minhash_dedup,
    "minhash_clusters": q_minhash_clusters,
    "minhash_clusters_lp": q_minhash_clusters_lp,
    "simhash": q_simhash,
    "langid": q_langid,
    "fingerprint": q_fingerprint,
    "knn_ivf": q_knn_ivf,
    "repetition_scores": q_repetition_scores,
    "simhash_dups": q_simhash_dups,
    "media_features": q_media_features,
    "audio_features": q_audio_features,
    "video_frames": q_video_frames,
    "media_thumbs": q_media_thumbs,
    "embedding_dups": q_embedding_dups,
    "ngram_jaccard": q_ngram_jaccard,
    "decontaminate": q_decontaminate,
    "paragraph_dedup": q_paragraph_dedup,
    "cms_sketch": q_cms_sketch,
    "doc_lm_score": q_doc_lm_score,
    "tfidf_top_terms": q_tfidf_top_terms,
    "pack_chunks": q_pack_chunks,
    "shuffle_rank": q_shuffle_rank,
    "bpe_token_stats": q_bpe_token_stats,
    "dup_spans": q_dup_spans,
    "kmeans_clusters": q_kmeans_clusters,
    "quantile_filter": q_quantile_filter,
    "semdedup": q_semdedup,
}

_LATIN = "'en','de','es','fr','pt','it','nl'"
_CJK = "'zh','ja','ko'"
_CYR = "'ru','uk'"
_RTL = "'ar','he'"
_LANG_CLASS_SQL = (f"CASE WHEN lang IN ({_LATIN}) THEN 'latin' "
                   f"WHEN lang IN ({_CJK}) THEN 'cjk' "
                   f"WHEN lang IN ({_CYR}) THEN 'cyrillic' "
                   f"WHEN lang IN ({_RTL}) THEN 'rtl' "
                   f"ELSE 'other' END")

_TOKENS = "list_filter(string_split(text, ' '), x -> x <> '')"

ORACLE_SQL = {
    "token_stats": f"""
        SELECT lang,
               CAST(SUM(len({_TOKENS})) AS BIGINT) AS n_tokens,
               CAST(SUM(len(replace(text, ' ', ''))) AS BIGINT) AS n_chars,
               CAST(COUNT(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY lang
    """,
    "route_counts": f"""
        SELECT {_LANG_CLASS_SQL} AS lang_class,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY 1
    """,
    "exact_dedup": """
        SELECT CAST(MIN(doc_id) AS BIGINT) AS doc_id
        FROM documents GROUP BY text
    """,
    "top_tokens": f"""
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest({_TOKENS}) AS token FROM documents)
        GROUP BY token ORDER BY n DESC, token ASC LIMIT 20
    """,
    "longest_docs": f"""
        SELECT doc_id, CAST(len({_TOKENS}) AS BIGINT) AS n_tokens
        FROM documents
        ORDER BY n_tokens DESC, doc_id ASC LIMIT 20
    """,
    "tokenize_ids": f"""
        WITH TK AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
        CNT AS (SELECT token, COUNT(*) AS n
                FROM (SELECT unnest(t) AS token FROM TK) GROUP BY token),
        V AS (SELECT token,
                     ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS vid
              FROM CNT ORDER BY n DESC, token ASC LIMIT 256),
        E AS (SELECT doc_id, unnest(t) AS token,
                     CAST(generate_subscripts(t, 1) AS BIGINT) - 1 AS pos
              FROM TK)
        SELECT e.doc_id, e.pos,
               CAST(COALESCE(v.vid, 0) AS BIGINT) AS token_id
        FROM E e LEFT JOIN V v USING (token)
    """,
    "packed_tokens": f"""
        WITH TK AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
        CNT AS (SELECT token, COUNT(*) AS n
                FROM (SELECT unnest(t) AS token FROM TK) GROUP BY token),
        V AS (SELECT token,
                     ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) AS vid
              FROM CNT ORDER BY n DESC, token ASC LIMIT 256),
        E AS (SELECT doc_id, unnest(t) AS token,
                     CAST(generate_subscripts(t, 1) AS BIGINT) - 1 AS pos
              FROM TK),
        T2 AS (SELECT e.doc_id, e.pos,
                      CAST(COALESCE(v.vid, 0) AS BIGINT) AS token_id
               FROM E e LEFT JOIN V v USING (token)),
        N AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n FROM TK),
        S AS (SELECT doc_id,
                     COALESCE(SUM(n) OVER (ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS st
              FROM N)
        SELECT CAST((s.st + t.pos) // 256 AS BIGINT) AS seq_id,
               CAST((s.st + t.pos) % 256 AS BIGINT) AS seq_pos,
               t.doc_id, t.token_id
        FROM T2 t JOIN S s USING (doc_id)
    """,
    "top_tokens_by_lang": f"""
        WITH C AS (SELECT lang, token, CAST(COUNT(*) AS BIGINT) AS n
                   FROM (SELECT lang, unnest({_TOKENS}) AS token
                         FROM documents)
                   GROUP BY lang, token)
        SELECT lang, token, n, rank FROM (
            SELECT lang, token, n,
                   ROW_NUMBER() OVER (PARTITION BY lang
                                      ORDER BY n DESC, token ASC) AS rank
            FROM C)
        WHERE rank <= 5
    """,
    "quality_scores": f"""
        SELECT doc_id,
               CAST(len({_TOKENS}) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct({_TOKENS})) AS BIGINT)
                   AS n_uniq_tokens,
               CAST(COALESCE(list_max(list_transform({_TOKENS},
                   x -> len(x))), 0) AS BIGINT) AS max_token_len
        FROM documents
    """,
    "events_hourly": """
        SELECT event_type, date_trunc('hour', ts) AS hour,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    """,
    "parse_events": """
        SELECT CASE WHEN event_type = 'error' THEN 'error' ELSE 'info' END
                   AS severity,
               date_trunc('hour', ts) AS hour,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM events GROUP BY 1, 2
    """,
    "knn_cosine": """
        SELECT query_id, vec_id, rank FROM (
            SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(
                           CAST(q.embedding AS DOUBLE[]),
                           CAST(e.embedding AS DOUBLE[])) DESC,
                           e.vec_id ASC) AS rank
            FROM embeddings q, embeddings e
            WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id)
        WHERE rank <= 10
    """,
    "doc_prefix_counts": f"""
        SELECT array_to_string(list_slice({_TOKENS}, 1, 3), ' ') AS prefix,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY 1
    """,
    "tokens_exploded": f"""
        SELECT doc_id,
               CAST(generate_subscripts(toks, 1) AS BIGINT) AS pos,
               unnest(toks) AS token
        FROM (SELECT doc_id, {_TOKENS} AS toks FROM documents)
    """,
    "sessions": """
        SELECT user_id,
               CAST(MAX(sess) AS BIGINT) AS n_sessions,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM (
            SELECT user_id,
                   SUM(newsess) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS sess
            FROM (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts) IS NULL
                                 OR date_diff('microsecond',
                                     lag(ts) OVER (PARTITION BY user_id
                                                   ORDER BY ts), ts)
                                    > 1800000000
                            THEN 1 ELSE 0 END AS newsess
                FROM events))
        GROUP BY user_id
    """,
    "distinct_users": """
        SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n
        FROM events GROUP BY event_type
    """,
    "orders_by_nation": """
        SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    """,
    "lineitem_join": """
        SELECT o.o_orderstatus,
               CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY o.o_orderstatus
    """,
    "anti_join_customers": """
        SELECT c_custkey, c_name, c_acctbal FROM customer
        WHERE c_custkey NOT IN
              (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
    "semi_join_customers": """
        SELECT c_custkey, c_mktsegment FROM customer
        WHERE c_custkey IN
              (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
    "left_join_order_counts": """
        SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
        FROM customer c
        LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'F') o
          ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey
    """,
    "normalize_text": """
        SELECT doc_id,
               nfc_normalize(lower(
                 CASE WHEN doc_id % 7 = 0
                      THEN text || ' Cafe' || chr(769) || ' NAI'
                           || chr(776) || 'VE ' || chr(64257) || 'le'
                      ELSE text END)) AS text_norm
        FROM documents
    """,
    "asof_prev_error": """
        SELECT p.event_id, e.ts AS ts_prev
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF JOIN (SELECT * FROM events WHERE event_type = 'error') e
          ON p.user_id = e.user_id AND p.ts > e.ts
    """,
    "top_events_per_user": """
        SELECT user_id, event_id, rank FROM (
            SELECT user_id, event_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY value DESC, event_id ASC)
                       AS rank
            FROM events)
        WHERE rank <= 2
    """,
    "value_p90_hist": """
        SELECT quantile_disc(CAST(floor(value * 100) AS BIGINT), 0.9)
               AS q_bin
        FROM events WHERE value IS NOT NULL
    """,
    "value_p90_by_type": """
        SELECT event_type,
               quantile_disc(CAST(floor(value * 100) AS BIGINT), 0.9)
               AS q_bin
        FROM events WHERE value IS NOT NULL GROUP BY event_type
    """,
    "events_profile": """
        SELECT 'event_id' AS "column",
               COUNT(event_id) AS n_valid,
               COUNT(*) - COUNT(event_id) AS n_null,
               CAST(MIN(event_id) AS DOUBLE) AS min_num,
               CAST(MAX(event_id) AS DOUBLE) AS max_num,
               CAST(NULL AS VARCHAR) AS min_str,
               CAST(NULL AS VARCHAR) AS max_str
        FROM events
        UNION ALL
        SELECT 'user_id', COUNT(user_id), COUNT(*) - COUNT(user_id),
               CAST(MIN(user_id) AS DOUBLE), CAST(MAX(user_id) AS DOUBLE),
               NULL, NULL FROM events
        UNION ALL
        SELECT 'value', COUNT(value), COUNT(*) - COUNT(value),
               MIN(value), MAX(value), NULL, NULL FROM events
        UNION ALL
        SELECT 'event_type', COUNT(event_type),
               COUNT(*) - COUNT(event_type),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
               MIN(event_type), MAX(event_type) FROM events
        UNION ALL
        SELECT 'props', COUNT(props), COUNT(*) - COUNT(props),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
               MIN(props), MAX(props) FROM events
    """,
    "median_value": """
        SELECT event_type, quantile_disc(value, 0.5) AS median_value
        FROM events GROUP BY event_type
    """,
    "train_split": """
        SELECT doc_id FROM documents
        WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                   AS UBIGINT) % 100 < 80
    """,
    "stratified_sample": """
        SELECT lang, doc_id FROM (
            SELECT lang, doc_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY lang
                       ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                       AS rn
            FROM documents)
        WHERE rn <= 10
    """,
    "doc_chunks": f"""
        WITH T AS (SELECT doc_id, {_TOKENS} AS toks FROM documents),
             J AS (SELECT doc_id, toks,
                          unnest(range(0, (len(toks) + 63) // 64)) AS j
                   FROM T)
        SELECT doc_id, CAST(j AS BIGINT) AS chunk_ix,
               array_to_string(toks[j*64+1 : (j+1)*64], ' ') AS chunk,
               CAST(LEAST(len(toks) - j*64, 64) AS BIGINT) AS n_tokens
        FROM J
    """,
    "snapshot_diff": """
        WITH old AS (SELECT doc_id, text FROM documents
                     WHERE doc_id % 3 <> 0),
             new AS (SELECT doc_id,
                            CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
                                 ELSE text END AS text
                     FROM documents WHERE doc_id % 3 <> 1)
        SELECT doc_id, 'removed' AS status FROM old
        WHERE doc_id NOT IN (SELECT doc_id FROM new)
        UNION ALL
        SELECT doc_id, 'added' AS status FROM new
        WHERE doc_id NOT IN (SELECT doc_id FROM old)
        UNION ALL
        SELECT o.doc_id, 'changed' AS status
        FROM old o JOIN new n USING (doc_id)
        WHERE o.text <> n.text
    """,
    "lang_source_rollup": """
        SELECT COALESCE(lang, '__all__') AS lang,
               COALESCE(source, '__all__') AS source,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM documents GROUP BY ROLLUP(lang, source)
    """,
    "props_sum": """
        SELECT event_type,
               CAST(SUM(CAST(NULLIF(regexp_extract(
                        props, '"k":\\s*(-?\\d+)', 1), '') AS BIGINT))
                    AS BIGINT) AS sum_k,
               CAST(COUNT(NULLIF(regexp_extract(
                        props, '"k":\\s*(-?\\d+)', 1), ''))
                    AS BIGINT) AS n
        FROM events GROUP BY event_type
    """,
    "hourly_users": """
        SELECT date_trunc('hour', ts) AS hour,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n
        FROM events GROUP BY 1
    """,
    "funnel_conversions": """
        SELECT p.event_id, CAST(COUNT(c.ts) AS BIGINT) AS n
        FROM (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT user_id, ts FROM events
                   WHERE event_type = 'click') c
          ON c.user_id = p.user_id
             AND c.ts > p.ts - INTERVAL 30 MINUTE AND c.ts <= p.ts
        GROUP BY p.event_id
    """,
    "value_stats": """
        SELECT event_type,
               CAST(COUNT(value) AS BIGINT) AS n,
               MIN(CAST(floor(value * 1000000) AS BIGINT)) AS min_micro,
               MAX(CAST(floor(value * 1000000) AS BIGINT)) AS max_micro,
               CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS BIGINT)
                   AS sum_micro
        FROM events GROUP BY event_type
    """,
    "cross_run_dedup": """
        WITH a AS (SELECT DISTINCT md5(text) AS h FROM documents
                   WHERE doc_id % 2 = 0),
             bsrc AS (SELECT doc_id, text FROM documents
                      WHERE doc_id % 2 = 1
                      UNION ALL
                      SELECT doc_id + 1000000, text FROM documents
                      WHERE doc_id % 2 = 0),
             b AS (SELECT MIN(doc_id) AS doc_id, md5(text) AS h
                   FROM bsrc GROUP BY md5(text))
        SELECT doc_id FROM b WHERE h NOT IN (SELECT h FROM a)
    """,
    "length_ranks": """
        SELECT doc_id,
               CAST(RANK() OVER (ORDER BY length(text)) - 1 AS BIGINT)
                   AS n_less
        FROM documents
    """,
    "event_spikes": """
        WITH H AS (SELECT event_type, date_trunc('hour', ts) AS hour,
                          COUNT(*) AS n
                   FROM events GROUP BY 1, 2)
        SELECT event_type, hour, CAST(n AS BIGINT) AS n,
               CAST(CASE WHEN n * COUNT(*) OVER (PARTITION BY event_type)
                              > 3 * SUM(n) OVER (PARTITION BY event_type)
                         THEN 1 ELSE 0 END AS BIGINT) AS spike
        FROM H
    """,
    "event_pivot": """
        SELECT user_id,
               CAST(COUNT(*) FILTER (WHERE event_type = 'click')
                    AS BIGINT) AS n_click,
               CAST(COUNT(*) FILTER (WHERE event_type = 'view')
                    AS BIGINT) AS n_view,
               CAST(COUNT(*) FILTER (WHERE event_type = 'purchase')
                    AS BIGINT) AS n_purchase,
               CAST(COUNT(*) FILTER (WHERE event_type = 'error')
                    AS BIGINT) AS n_error,
               CAST(COUNT(*) FILTER (WHERE event_type = 'signup')
                    AS BIGINT) AS n_signup
        FROM events GROUP BY user_id
    """,
    "events_hopping": """
        SELECT event_type, window_start, CAST(COUNT(*) AS BIGINT) AS n
        FROM (
            SELECT event_type,
                   unnest([
                       to_timestamp(floor(epoch(ts) / 1800) * 1800)
                           AT TIME ZONE 'UTC',
                       to_timestamp(floor(epoch(ts) / 1800) * 1800 - 1800)
                           AT TIME ZONE 'UTC'
                   ]) AS window_start
            FROM events)
        GROUP BY event_type, window_start
    """,
    # min over 8-token windows of the 60-bit md5 prefix of the shingle
    # string; <8 tokens → whole sequence, empty → md5('')
    "fingerprint": f"""
        WITH T AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
        S AS (SELECT doc_id,
                     CASE WHEN len(t) = 0 THEN ['']
                          WHEN len(t) < 8 THEN [array_to_string(t, ' ')]
                          ELSE list_transform(range(1, len(t) - 6),
                              i -> array_to_string(t[i:i+7], ' '))
                     END AS sh
              FROM T)
        SELECT doc_id,
               CAST(list_min(list_transform(sh,
                   s -> CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT)))
                   AS BIGINT) AS fingerprint
        FROM S
    """,
    "langid": None,  # filled below (built from _LANG_PROFILES)
    # same simhash derivation as the `simhash` oracle, then a within-
    # bucket Hamming self-join (the engine applies the identical bucket
    # constraint)
    "simhash_dups": f"""
        WITH tc AS (
            SELECT doc_id, tk, CAST(COUNT(*) AS BIGINT) AS w
            FROM (SELECT doc_id, unnest({_TOKENS}) AS tk FROM documents)
            GROUP BY doc_id, tk),
        th AS (SELECT doc_id,
                      CAST(('0x' || substr(md5(tk), 1, 15)) AS BIGINT) AS h,
                      w
               FROM tc),
        bits AS (
            SELECT doc_id, b,
                   SUM(CASE WHEN ((h >> b) & 1) = 1 THEN w ELSE -w END) AS s
            FROM th, (SELECT unnest(range(0, 60)) AS b)
            GROUP BY doc_id, b),
        agg AS (
            SELECT doc_id,
                   CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << b)
                                 ELSE 0 END) AS BIGINT) AS simhash
            FROM bits GROUP BY doc_id),
        S AS (SELECT d.doc_id,
                     COALESCE(a.simhash, 0) AS simhash,
                     COALESCE(a.simhash, 0) >> 44 AS bkt
              FROM documents d LEFT JOIN agg a USING (doc_id))
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT)
                   AS hamming
        FROM S a JOIN S b
          ON a.bkt = b.bkt AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash, b.simhash)) <= 12
    """,
    "repetition_scores": f"""
        WITH T AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
        B AS (SELECT doc_id,
                     CASE WHEN len(t) < 2 THEN []
                          ELSE list_transform(range(1, len(t)),
                              i -> t[i] || ' ' || t[i+1])
                     END AS bg
              FROM T),
        C AS (SELECT doc_id, g, COUNT(*) AS c
              FROM (SELECT doc_id, unnest(bg) AS g FROM B)
              GROUP BY doc_id, g),
        M AS (SELECT doc_id, MAX(c) AS mx FROM C GROUP BY doc_id)
        SELECT b.doc_id,
               CAST(len(b.bg) AS BIGINT) AS n_bigrams,
               CAST(COALESCE(m.mx, 0) AS BIGINT) AS max_bigram_n
        FROM B b LEFT JOIN M m USING (doc_id)
    """,
    # exact at the gated probe level (see q_knn_ivf) — same oracle as
    # knn_cosine
    "knn_ivf": """
        SELECT query_id, vec_id, rank FROM (
            SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY list_cosine_similarity(
                           CAST(q.embedding AS DOUBLE[]),
                           CAST(e.embedding AS DOUBLE[])) DESC,
                           e.vec_id ASC) AS rank
            FROM embeddings q, embeddings e
            WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id)
        WHERE rank <= 10
    """,
    # exact near-dup pairs via shingle inverted index (recall-1 LSH config
    # on the Ray side — see q_minhash_dedup); jaccard = int/int IEEE
    # division on both sides
    "minhash_dedup": """
        WITH T AS (SELECT doc_id,
                          list_filter(string_split(text, ' '),
                                      x -> x <> '') AS t
                   FROM documents),
        SH AS (SELECT doc_id,
                      list_distinct(CASE
                          WHEN len(t) = 0 THEN ['']
                          WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
                          ELSE list_transform(range(1, len(t) - 3),
                              i -> array_to_string(t[i:i+4], ' '))
                      END) AS s
               FROM T),
        EX AS (SELECT doc_id, unnest(s) AS g FROM SH),
        CAND AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
                 FROM EX a JOIN EX b ON a.g = b.g AND a.doc_id < b.doc_id),
        J AS (SELECT ia, ib,
                     CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
                         / (len(sa.s) + len(sb.s)
                            - len(list_intersect(sa.s, sb.s))) AS j
              FROM CAND
              JOIN SH sa ON sa.doc_id = ia
              JOIN SH sb ON sb.doc_id = ib)
        SELECT ia AS id_a, ib AS id_b, j AS jaccard
        FROM J WHERE j >= 0.5
    """,
    # connected components over the exact pair set (recursive reachability,
    # label = min reachable id)
    "minhash_clusters": """
        WITH RECURSIVE T AS (SELECT doc_id,
                          list_filter(string_split(text, ' '),
                                      x -> x <> '') AS t
                   FROM documents),
        SH AS (SELECT doc_id,
                      list_distinct(CASE
                          WHEN len(t) = 0 THEN ['']
                          WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
                          ELSE list_transform(range(1, len(t) - 3),
                              i -> array_to_string(t[i:i+4], ' '))
                      END) AS s
               FROM T),
        EX AS (SELECT doc_id, unnest(s) AS g FROM SH),
        CAND AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
                 FROM EX a JOIN EX b ON a.g = b.g AND a.doc_id < b.doc_id),
        P AS (SELECT ia, ib FROM CAND
              JOIN SH sa ON sa.doc_id = ia
              JOIN SH sb ON sb.doc_id = ib
              WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
                    / (len(sa.s) + len(sb.s)
                       - len(list_intersect(sa.s, sb.s))) >= 0.5),
        E AS (SELECT ia AS src, ib AS dst FROM P
              UNION ALL SELECT ib, ia FROM P),
        W(node, reach) AS (
            SELECT src, src FROM E
            UNION
            SELECT w.node, e.dst FROM W w JOIN E e ON w.reach = e.src)
        SELECT node AS doc_id, CAST(MIN(reach) AS BIGINT) AS cluster_id
        FROM W GROUP BY node
    """,
    # near-dup cosine pairs on the augmented embedding table (every 5th
    # vector gets a +0.5-on-dim-1 copy at vec_id+100000)
    "embedding_dups": """
        WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                      FROM embeddings),
        aug AS (SELECT * FROM base
                UNION ALL
                SELECT vec_id + 100000,
                       list_transform(range(1, len(e) + 1),
                           i -> CASE WHEN i = 1 THEN e[i] + 0.5
                                     ELSE e[i] END)
                FROM base WHERE vec_id % 5 = 0)
        SELECT a.vec_id AS id_a, b.vec_id AS id_b
        FROM aug a JOIN aug b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.e, b.e) >= 0.9
    """,
    # 60-bit md5-prefix token hashes, sign-of-weighted-bit-sum per bit
    "simhash": f"""
        WITH tc AS (
            SELECT doc_id, tk, CAST(COUNT(*) AS BIGINT) AS w
            FROM (SELECT doc_id, unnest({_TOKENS}) AS tk FROM documents)
            GROUP BY doc_id, tk),
        th AS (SELECT doc_id,
                      CAST(('0x' || substr(md5(tk), 1, 15)) AS BIGINT) AS h,
                      w
               FROM tc),
        bits AS (
            SELECT doc_id, b,
                   SUM(CASE WHEN ((h >> b) & 1) = 1 THEN w ELSE -w END) AS s
            FROM th, (SELECT unnest(range(0, 60)) AS b)
            GROUP BY doc_id, b),
        agg AS (
            SELECT doc_id,
                   CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << b)
                                 ELSE 0 END) AS BIGINT) AS simhash
            FROM bits GROUP BY doc_id)
        SELECT d.doc_id,
               COALESCE(a.simhash, 0) AS simhash,
               COALESCE(a.simhash, 0) >> 44 AS simhash_bucket
        FROM documents d LEFT JOIN agg a USING (doc_id)
    """,
    # deterministic-integer HLL (p=5, m=32): 60-bit md5 hash, idx = top 5
    # bits, rho = 1 + leading zeros of the low 55 bits, raw estimate in
    # exact integer arithmetic (alpha_32 = 697/1000), no small-range
    # correction — mirrors ops.sketch.hll_estimate_int
    "approx_distinct": """
        WITH h AS (
            SELECT DISTINCT event_type,
                   CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                        AS BIGINT) AS h
            FROM events),
        r AS (SELECT event_type, h >> 55 AS idx,
                     CASE WHEN (h & ((1::BIGINT << 55) - 1)) = 0 THEN 56
                          ELSE 56 - length(bin(h & ((1::BIGINT << 55) - 1)))
                     END AS rho
              FROM h),
        reg AS (SELECT event_type, idx, MAX(rho) AS rho
                FROM r GROUP BY event_type, idx),
        s AS (SELECT event_type,
                     (32 - COUNT(*)) * (1::BIGINT << 56)
                         + SUM(1::BIGINT << (56 - rho)) AS sp
              FROM reg GROUP BY event_type)
        SELECT event_type,
               CAST((697::HUGEINT * 32 * 32 * (1::HUGEINT << 56))
                    // (1000 * sp) AS BIGINT) AS n_approx
        FROM s
    """,
    "strip_html": """
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(
                   '<html><head><title>d</title></head><body><h1>Doc '
                   || CAST(doc_id AS VARCHAR)
                   || '</h1><!-- boilerplate --><p>' || text
                   || '</p></body></html>',
                   '<[^>]*>', ' ', 'g'), '[ \t\r\n]+', ' ', 'g'))
                   AS html_text
        FROM documents
    """,
}


def _langid_sql() -> str:
    """Regenerated from the ENGINE'S OWN profiles: word-stopword
    intersection per space-delimited language + substring-gram ``contains``
    terms over the space-stripped text for zh/ja/ko."""
    from .ops.text import _LANG_PROFILES, _LANG_SUBSTRINGS
    langs = sorted(set(_LANG_PROFILES) | set(_LANG_SUBSTRINGS))

    def lst(lang):
        return "[" + ", ".join(
            f"'{w}'" for w in sorted(_LANG_PROFILES[lang])) + "]"

    def h_expr(lg):
        terms = []
        if lg in _LANG_PROFILES:
            terms.append(f"len(list_intersect(toks, {lst(lg)}))")
        for g in sorted(_LANG_SUBSTRINGS.get(lg, ())):
            terms.append(f"CASE WHEN contains(ns, '{g}') THEN 1 ELSE 0 END")
        return " + ".join(terms)

    hits = ",\n               ".join(f"{h_expr(lg)} AS h_{lg}"
                                     for lg in langs)
    g = "greatest(" + ", ".join(f"h_{lg}" for lg in langs) + ")"
    case = " ".join(f"WHEN h_{lg} = {g} THEN '{lg}'" for lg in langs)
    return f"""
        WITH T AS (SELECT doc_id,
                          list_distinct(string_split(text, ' ')) AS toks,
                          replace(text, ' ', '') AS ns
                   FROM documents),
        H AS (SELECT doc_id,
               {hits}
              FROM T)
        SELECT doc_id,
               CASE WHEN {g} = 0 THEN 'unknown' {case} END AS lang_pred,
               CAST({g} AS BIGINT) AS lang_hits
        FROM H
    """


ORACLE_SQL["langid"] = _langid_sql()


def _pii_sql() -> str:
    """Shares PII_PATTERNS with the engine; DuckDB is RE2 like Arrow, so
    replace semantics match byte-for-byte."""
    from .ops.normalize import PII_PATTERNS
    (email, e_t), (ip, i_t), (ph, p_t) = PII_PATTERNS
    return f"""
        WITH A AS (SELECT doc_id,
            CASE WHEN doc_id % 5 = 0 THEN
                text || ' contact user' || CAST(doc_id AS VARCHAR)
                || '@example.com ip 10.' || CAST(doc_id % 256 AS VARCHAR)
                || '.0.1 tel +14155550' || CAST(doc_id % 10 AS VARCHAR)
            ELSE text END AS t FROM documents)
        SELECT doc_id,
          regexp_replace(regexp_replace(regexp_replace(
              t, '{email}', '{e_t}', 'g'), '{ip}', '{i_t}', 'g'),
              '{ph}', '{p_t}', 'g') AS text_masked,
          CAST(len(regexp_extract_all(t, '{email}'))
               + len(regexp_extract_all(t, '{ip}'))
               + len(regexp_extract_all(t, '{ph}')) AS BIGINT) AS n_pii
        FROM A
    """


ORACLE_SQL["pii_masked"] = _pii_sql()


def _gopher_sql() -> str:
    """Shares thresholds and the en stopword table with ops/text.py."""
    from .ops.text import (_LANG_PROFILES, GOPHER_MAX_MEAN_LEN,
                           GOPHER_MAX_TOKENS, GOPHER_MIN_MEAN_LEN,
                           GOPHER_MIN_STOPWORDS, GOPHER_MIN_TOKENS,
                           GOPHER_UNIQ_RATIO_DEN)
    stop = "[" + ", ".join(f"'{w}'"
                           for w in sorted(_LANG_PROFILES["en"])) + "]"
    reasons = f"""
          CASE WHEN n_tokens < {GOPHER_MIN_TOKENS}
                 OR n_tokens > {GOPHER_MAX_TOKENS} THEN 1 ELSE 0 END
        + CASE WHEN {GOPHER_MIN_MEAN_LEN} * n_tokens > n_chars
                 OR n_chars > {GOPHER_MAX_MEAN_LEN} * n_tokens
               THEN 2 ELSE 0 END
        + CASE WHEN n_uniq * {GOPHER_UNIQ_RATIO_DEN} < n_tokens
               THEN 4 ELSE 0 END
        + CASE WHEN stop_hits < {GOPHER_MIN_STOPWORDS} THEN 8 ELSE 0 END"""
    return f"""
        WITH T AS (SELECT doc_id,
                          list_filter(string_split(text, ' '),
                                      x -> x <> '') AS toks
                   FROM documents),
        S AS (SELECT doc_id,
                     CAST(len(toks) AS BIGINT) AS n_tokens,
                     CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
                     CAST(len(array_to_string(toks, '')) AS BIGINT)
                         AS n_chars,
                     CAST(len(list_intersect(list_distinct(toks), {stop}))
                         AS BIGINT) AS stop_hits
              FROM T)
        SELECT doc_id, n_tokens,
               CAST({reasons} AS BIGINT) AS reasons,
               CAST(CASE WHEN ({reasons}) = 0 THEN 1 ELSE 0 END AS BIGINT)
                   AS keep
        FROM S
    """


ORACLE_SQL["gopher_filter"] = _gopher_sql()
# curation composition: gopher keep → min-id-per-text survivor →
# md5(doc_id) mod 100 < 90 (split_by_hash uses the first 8 hex chars)
ORACLE_SQL["curated_docs"] = f"""
    WITH K AS (SELECT doc_id FROM ({_gopher_sql()}) WHERE reasons = 0),
    D AS (SELECT CAST(min(d.doc_id) AS BIGINT) AS doc_id
          FROM documents d JOIN K ON d.doc_id = K.doc_id
          GROUP BY d.text)
    SELECT doc_id FROM D
    WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
          % 100 < 90
"""
ORACLE_SQL["boilerplate_tokens"] = """
    WITH P AS (SELECT doc_id, string_split(text, ' ') AS lines
               FROM documents),
    L AS (SELECT doc_id, unnest(lines) AS line FROM P),
    C AS (SELECT line FROM (SELECT line, COUNT(DISTINCT doc_id) AS c
                            FROM L GROUP BY line) WHERE c >= 450),
    BL AS (SELECT list(line) AS bl FROM C)
    SELECT doc_id,
      array_to_string(CASE WHEN bl IS NULL THEN lines
          ELSE list_filter(lines, x -> NOT list_contains(bl, x)) END,
          ' ') AS text_clean,
      CAST(len(lines) - len(CASE WHEN bl IS NULL THEN lines
          ELSE list_filter(lines, x -> NOT list_contains(bl, x)) END)
          AS BIGINT) AS n_removed
    FROM P, BL
"""
# label propagation computes the same min-id components as union-find
ORACLE_SQL["minhash_clusters_lp"] = ORACLE_SQL["minhash_clusters"]

# multimodal fakes: the synthetic payload is SQL-reconstructible ASCII
# (substr(repeat(md5(id), 128), 1, n)) and every feature is an md5-prefix
# integer or a dyadic uint16/65536 — see ops/multimodal.py docstrings


def _media_payload_sql(rem: int) -> str:
    """Shared payload CTE: media rows of one kind (media_id % 3 == rem)
    with the reconstructed ASCII payload."""
    return f"""
        m AS (SELECT doc_id AS media_id,
                     md5(CAST(doc_id AS VARCHAR)) AS seed
              FROM documents WHERE doc_id % 3 = {rem}),
        p AS (SELECT media_id,
                     substr(repeat(seed, 128), 1,
                            CAST(256 + (('0x' || substr(seed, 1, 8))::BIGINT
                                        % 3840) AS INT)) AS pay
              FROM m)"""


ORACLE_SQL["media_features"] = f"""
    WITH {_media_payload_sql(0)},
    d AS (SELECT media_id, md5(pay) AS d1, md5(pay || 'e') AS d2 FROM p)
    SELECT media_id,
           CAST(64 + 8 * (('0x' || substr(d1, 1, 2))::BIGINT) AS BIGINT)
               AS width,
           CAST(64 + 8 * (('0x' || substr(d1, 3, 2))::BIGINT) AS BIGINT)
               AS height,
           CAST(3 AS BIGINT) AS channels,
           i.dim AS dim,
           CAST(('0x' || substr(d1 || d2, CAST(4 * i.dim + 1 AS INT), 4))
                ::BIGINT AS DOUBLE) / 65536.0 AS value
    FROM d, (SELECT unnest(range(0, 16)) AS dim) i
"""

ORACLE_SQL["audio_features"] = f"""
    WITH {_media_payload_sql(1)},
    d AS (SELECT media_id, md5(pay) AS d1, md5(pay || 'e') AS d2 FROM p)
    SELECT media_id,
           CASE WHEN ('0x' || substr(d1, 1, 2))::BIGINT % 2 = 1
                THEN 16000 ELSE 44100 END AS sample_rate,
           CAST(200 + 37 * (('0x' || substr(d1, 3, 2))::BIGINT) AS BIGINT)
               AS duration_ms,
           i.dim AS dim,
           CAST(('0x' || substr(d1 || d2, CAST(4 * i.dim + 1 AS INT), 4))
                ::BIGINT AS DOUBLE) / 65536.0 AS value
    FROM d, (SELECT unnest(range(0, 13)) AS dim) i
"""

ORACLE_SQL["video_frames"] = f"""
    WITH {_media_payload_sql(2)},
    l AS (SELECT media_id, pay,
                 greatest(1, length(pay) // 4) AS L FROM p)
    SELECT media_id, f.frame_no AS frame_no,
           md5(substr(pay, CAST(f.frame_no * L + 1 AS INT),
                      CAST(L AS INT))) AS frame_hash
    FROM l, (SELECT unnest(range(0, 4)) AS frame_no) f
"""

ORACLE_SQL["media_thumbs"] = f"""
    WITH {_media_payload_sql(0)},
    d AS (SELECT media_id, pay,
                 CAST(64 + 8 * (('0x' || substr(md5(pay), 1, 2))::BIGINT)
                      AS DOUBLE) AS w0,
                 CAST(64 + 8 * (('0x' || substr(md5(pay), 3, 2))::BIGINT)
                      AS DOUBLE) AS h0
          FROM p),
    s AS (SELECT media_id, pay, w0, h0,
                 least(1.0, 256.0 / greatest(w0, h0)) AS sc FROM d)
    SELECT media_id,
           CAST(floor(w0 * sc) AS BIGINT) AS width,
           CAST(floor(h0 * sc) AS BIGINT) AS height,
           substr(pay, 1, 64) AS thumb
    FROM s
"""


# funnel: per-stage survivor counts of the same composed pipeline
ORACLE_SQL["curation_funnel"] = f"""
    WITH K AS (SELECT doc_id FROM ({_gopher_sql()}) WHERE reasons = 0),
    D AS (SELECT CAST(min(d.doc_id) AS BIGINT) AS doc_id
          FROM documents d JOIN K ON d.doc_id = K.doc_id
          GROUP BY d.text),
    TR AS (SELECT doc_id FROM D
           WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                 ::BIGINT % 100 < 90),
    CH AS (SELECT CAST(COALESCE(SUM((len(toks) + 63) // 64), 0) AS BIGINT)
               AS n
           FROM (SELECT {_TOKENS} AS toks
                 FROM documents d JOIN TR USING (doc_id)))
    SELECT 'raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n FROM documents
    UNION ALL SELECT 'gopher', CAST(COUNT(*) AS BIGINT) FROM K
    UNION ALL SELECT 'dedup', CAST(COUNT(*) AS BIGINT) FROM D
    UNION ALL SELECT 'train', CAST(COUNT(*) AS BIGINT) FROM TR
    UNION ALL SELECT 'chunks', n FROM CH
"""


def _flagship_sql() -> str:
    """DuckDB re-implementation of the flagship pipeline over the pages
    corpus q_flagship materializes: explode lines → first-match-wins
    3-format header cascade (syslog / ISO+level / epoch+level) → statement
    tokenization (the default action chain reduces to splitting on
    space/[/]/: for this corpus — no IPv6/time/mac words occur inside
    messages, so the FixIP/Fix protections never fire) → variable-token
    masking with the ENGINE'S OWN regex → lang_class ∘ severity routing →
    counts. Shares ``_VARIABLE_TOKEN_RE`` with stages/aggregate.py."""
    from .stages.aggregate import _VARIABLE_TOKEN_RE
    syslog = (r"^[A-Z][a-z]{2} [ 0-9][0-9] [0-9]{2}:[0-9]{2}:"
              r"[0-9]{2} [A-Za-z0-9.-]+ [A-Za-z0-9()._-]+\[[0-9]+\]: ")
    iso = (r"^[0-9]{4}-[0-9]{2}-[0-9]{2} [0-9]{2}:[0-9]{2}:"
           r"[0-9]{2},[0-9]{3} [A-Z]+ [A-Za-z0-9()._-]+: ")
    epoch = r"^[0-9]+ [A-Za-z0-9.-]+ [A-Z]+ "
    return f"""
        WITH pages AS (SELECT lang, text
                       FROM read_parquet('{FLAGSHIP_PAGES_DIR}/*.parquet')),
        L AS (SELECT lang, unnest(string_split(text, chr(10))) AS line
              FROM pages),
        P AS (SELECT lang, line,
                 CASE
                   WHEN regexp_matches(line, '{syslog}')
                     THEN regexp_extract(line, '{syslog}(.*)$', 1)
                   WHEN regexp_matches(line, '{iso}')
                     THEN regexp_extract(line, '{iso}(.*)$', 1)
                   WHEN regexp_matches(line, '{epoch}')
                     THEN regexp_extract(line, '{epoch}(.*)$', 1)
                   ELSE NULL END AS msg,
                 CASE
                   WHEN regexp_matches(line, '^[A-Z][a-z]{{2}} ') THEN ''
                   WHEN regexp_matches(line, '^[0-9]{{4}}-')
                     THEN regexp_extract(line,
                       '^[0-9]{{4}}-[0-9]{{2}}-[0-9]{{2}} [0-9]{{2}}:'
                       || '[0-9]{{2}}:[0-9]{{2}},[0-9]{{3}} ([A-Z]+) ', 1)
                   ELSE regexp_extract(line,
                       '^[0-9]+ [A-Za-z0-9.-]+ ([A-Z]+) ', 1)
                 END AS level
              FROM L WHERE line <> ''),
        R AS (SELECT
                CASE WHEN lang IN ({_LATIN}) THEN 'latin'
                     WHEN lang IN ({_CJK}) THEN 'cjk'
                     WHEN lang IN ({_CYR}) THEN 'cyrillic'
                     WHEN lang IN ({_RTL}) THEN 'rtl'
                     ELSE 'other' END
                || '_' ||
                CASE WHEN level IN ('ERROR','FATAL','CRIT','CRITICAL')
                       THEN 'error'
                     WHEN level IN ('WARN','WARNING') THEN 'warn'
                     ELSE 'info' END AS route0,
                CASE WHEN msg IS NULL THEN '__deadletter__'
                     ELSE route0 END AS route,
                CASE WHEN msg IS NULL THEN '<unparsed>' ELSE
                  array_to_string(list_transform(
                    list_filter(string_split(
                        translate(msg, '[]:', '   '), ' '), x -> x <> ''),
                    x -> CASE WHEN regexp_matches(x, '{_VARIABLE_TOKEN_RE}')
                              THEN '<*>' ELSE x END), ' ')
                END AS template
              FROM P)
        SELECT template, route, CAST(count(*) AS BIGINT) AS n
        FROM R GROUP BY template, route
    """


ORACLE_SQL["flagship_template_counts"] = _flagship_sql()
ORACLE_SQL["url_hosts"] = f"""
    WITH U AS (SELECT
        regexp_extract(url, '^[a-z][a-z0-9+.\\-]*://([^/?#:]+)', 1)
            AS url_host
        FROM read_parquet('{FLAGSHIP_PAGES_DIR}/*.parquet'))
    SELECT url_host,
           regexp_extract(url_host, '([^.]+\\.[^.]+)$', 1) AS url_domain,
           CAST(count(*) AS BIGINT) AS n
    FROM U GROUP BY url_host
"""

# 60-bit md5 prefix of a shingle string — the shared hash bridge
_H60 = "CAST(('0x' || substr(md5({s}), 1, 15)) AS BIGINT)"

ORACLE_SQL["domain_topk"] = f"""
    WITH P AS (SELECT
        regexp_extract(url, '^[a-z][a-z0-9+.\\-]*://([^/?#:]+)', 1)
            AS url_host,
        url,
        CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
             AS BIGINT) AS n_tokens
        FROM read_parquet('{FLAGSHIP_PAGES_DIR}/*.parquet'))
    SELECT url_host, url, n_tokens, rank FROM (
        SELECT url_host, url, n_tokens,
               ROW_NUMBER() OVER (PARTITION BY url_host
                                  ORDER BY n_tokens DESC, url ASC) AS rank
        FROM P)
    WHERE rank <= 3
"""

_CANON_RE = "^([A-Za-z][A-Za-z0-9+.\\\\-]*)://([^/?#:]+)([^?#]*)"
ORACLE_SQL["url_dedup"] = f"""
    WITH raw AS (SELECT url
                 FROM read_parquet('{FLAGSHIP_PAGES_DIR}/*.parquet')),
    aug AS (SELECT url FROM raw
            UNION ALL
            SELECT regexp_replace(url, '^http', 'HTTP')
                   || '/?utm_source=feed#frag'
            FROM raw WHERE length(url) % 3 = 0),
    canon AS (SELECT url,
        CASE WHEN regexp_matches(url, '{_CANON_RE}')
             THEN lower(regexp_extract(url, '{_CANON_RE}', 1)) || '://'
                  || lower(regexp_extract(url, '{_CANON_RE}', 2))
                  || regexp_replace(
                         regexp_extract(url, '{_CANON_RE}', 3), '/+$', '')
             ELSE NULL END AS url_canon
        FROM aug)
    SELECT url_canon, CAST(count(*) AS BIGINT) AS n,
           min(url) AS url_first
    FROM canon GROUP BY url_canon
"""

ORACLE_SQL["ngram_jaccard"] = f"""
    WITH T AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
    SH AS (SELECT doc_id, list_distinct(list_transform(
              CASE WHEN len(t) = 0 THEN ['']
                   WHEN len(t) < 4 THEN [array_to_string(t, ' ')]
                   ELSE list_transform(range(1, len(t) - 2),
                       i -> array_to_string(t[i:i+3], ' ')) END,
              s -> {_H60.format(s='s')})) AS gs
           FROM T),
    EX0 AS (SELECT doc_id, unnest(gs) AS g FROM SH),
    DF AS (SELECT g, COUNT(*) AS df FROM EX0 GROUP BY g),
    EX AS (SELECT e.doc_id, e.g FROM EX0 e JOIN DF USING (g)
           WHERE df <= 64),
    SZ AS (SELECT doc_id, COUNT(*) AS sz FROM EX GROUP BY doc_id),
    I AS (SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS inter
          FROM EX a JOIN EX b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
    SELECT ia AS id_a, ib AS id_b, CAST(inter AS BIGINT) AS inter,
           CAST(sa.sz + sb.sz - inter AS BIGINT) AS union_n
    FROM I JOIN SZ sa ON sa.doc_id = ia JOIN SZ sb ON sb.doc_id = ib
    WHERE inter * 3 >= sa.sz + sb.sz
"""

ORACLE_SQL["event_bigrams"] = """
    WITH S AS (SELECT user_id, event_type,
                      LEAD(event_type) OVER (
                          PARTITION BY user_id
                          ORDER BY ts, event_id) AS nxt
               FROM events WHERE ts IS NOT NULL)
    SELECT event_type AS ev_from, nxt AS ev_to,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM S WHERE nxt IS NOT NULL GROUP BY ev_from, nxt
"""

ORACLE_SQL["cross_run_neardup"] = f"""
    WITH T AS (
      SELECT doc_id, {_TOKENS} AS t FROM documents WHERE doc_id % 2 = 0
      UNION ALL
      SELECT doc_id, {_TOKENS} FROM documents WHERE doc_id % 2 = 1
      UNION ALL
      SELECT doc_id + 1000000,
             list_filter(string_split(text || ' zz9', ' '), x -> x <> '')
      FROM documents WHERE doc_id % 2 = 0),
    SH AS (SELECT doc_id, list_distinct(list_transform(
              CASE WHEN len(t) = 0 THEN ['']
                   WHEN len(t) < 4 THEN [array_to_string(t, ' ')]
                   ELSE list_transform(range(1, len(t) - 2),
                       i -> array_to_string(t[i:i+3], ' ')) END,
              s -> {_H60.format(s='s')})) AS gs
           FROM T),
    EX AS (SELECT doc_id, unnest(gs) AS g FROM SH),
    SZ AS (SELECT doc_id, COUNT(*) AS sz FROM EX GROUP BY doc_id),
    Q AS (SELECT a.doc_id AS x, b.doc_id AS y, COUNT(*) AS inter
          FROM EX a JOIN EX b ON a.g = b.g AND a.doc_id <> b.doc_id
          GROUP BY 1, 2),
    QP AS (SELECT x, y FROM Q
           JOIN SZ sa ON sa.doc_id = Q.x JOIN SZ sb ON sb.doc_id = Q.y
           WHERE inter * 3 >= sa.sz + sb.sz),
    ASURV AS (SELECT doc_id FROM SH
              WHERE doc_id % 2 = 0 AND doc_id < 1000000
                AND NOT EXISTS (SELECT 1 FROM QP
                                WHERE x = SH.doc_id AND y % 2 = 0
                                  AND y < 1000000 AND y < SH.doc_id)),
    B AS (SELECT doc_id FROM SH
          WHERE doc_id % 2 = 1 OR doc_id >= 1000000)
    SELECT B.doc_id, CAST(z.sz AS BIGINT) AS n_shingles
    FROM B JOIN SZ z ON z.doc_id = B.doc_id
    WHERE NOT EXISTS (SELECT 1 FROM QP JOIN ASURV a ON QP.y = a.doc_id
                      WHERE QP.x = B.doc_id)
      AND NOT EXISTS (SELECT 1 FROM QP
                      WHERE x = B.doc_id AND y < B.doc_id
                        AND (y % 2 = 1 OR y >= 1000000))
"""

# index compaction is semantics-preserving by contract — the compacted
# pipeline answers to the EXACT same SQL as the uncompacted one
ORACLE_SQL["compacted_neardup"] = ORACLE_SQL["cross_run_neardup"]

# cross-run semantic ingest: run A survivors = evens with no lower-id
# even near-twin; run B = odds + near-copies of the evens (+0.001 on
# dim 1, re-keyed +200000) — survivors drop vs committed A survivors and
# vs lower-id run-B vectors, all at cosine >= 0.9 in double precision
ORACLE_SQL["cross_run_semdedup"] = """
    WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                  FROM embeddings),
    A AS (SELECT * FROM base WHERE vec_id % 2 = 0),
    surA AS (SELECT a.vec_id, a.e FROM A a
             WHERE NOT EXISTS (
                 SELECT 1 FROM A a2 WHERE a2.vec_id < a.vec_id
                   AND list_cosine_similarity(a.e, a2.e) >= 0.9)),
    B AS (SELECT vec_id, e FROM base WHERE vec_id % 2 = 1
          UNION ALL
          SELECT vec_id + 200000,
                 list_transform(range(1, len(e) + 1),
                     i -> CASE WHEN i = 1 THEN e[i] + 0.001
                               ELSE e[i] END)
          FROM A)
    SELECT b.vec_id
    FROM B b
    WHERE NOT EXISTS (SELECT 1 FROM surA s
                      WHERE list_cosine_similarity(b.e, s.e) >= 0.9)
      AND NOT EXISTS (SELECT 1 FROM B b2 WHERE b2.vec_id < b.vec_id
                      AND list_cosine_similarity(b.e, b2.e) >= 0.9)
"""

# compaction is semantics-preserving — same SQL as the uncompacted run
ORACLE_SQL["compacted_semdedup"] = ORACLE_SQL["cross_run_semdedup"]

ORACLE_SQL["decontaminate"] = f"""
    WITH T AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
    G AS (SELECT doc_id, list_distinct(list_transform(
             CASE WHEN len(t) = 0 THEN ['']
                  WHEN len(t) < 6 THEN [array_to_string(t, ' ')]
                  ELSE list_transform(range(1, len(t) - 4),
                      i -> array_to_string(t[i:i+5], ' ')) END,
             s -> {_H60.format(s='s')})) AS gs
          FROM T),
    B AS (SELECT DISTINCT unnest(gs) AS g FROM G WHERE doc_id % 37 = 0),
    CE AS (SELECT doc_id, unnest(gs) AS g FROM G WHERE doc_id % 37 <> 0),
    BAD AS (SELECT DISTINCT ce.doc_id FROM CE ce JOIN B USING (g))
    SELECT doc_id FROM documents
    WHERE doc_id % 37 <> 0
      AND doc_id NOT IN (SELECT doc_id FROM BAD)
"""

ORACLE_SQL["decontaminate_frac"] = f"""
    WITH T AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
    G AS (SELECT doc_id, list_distinct(list_transform(
             CASE WHEN len(t) = 0 THEN ['']
                  WHEN len(t) < 6 THEN [array_to_string(t, ' ')]
                  ELSE list_transform(range(1, len(t) - 4),
                      i -> array_to_string(t[i:i+5], ' ')) END,
             s -> {_H60.format(s='s')})) AS gs
          FROM T),
    B AS (SELECT DISTINCT unnest(gs) AS g FROM G WHERE doc_id % 37 = 0),
    CE AS (SELECT doc_id, unnest(gs) AS g FROM G WHERE doc_id % 37 <> 0),
    S AS (SELECT ce.doc_id,
                 COUNT(*) AS n_grams,
                 COUNT(*) FILTER (WHERE b.g IS NOT NULL) AS n_hits
          FROM CE ce LEFT JOIN B b USING (g) GROUP BY ce.doc_id)
    SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
           CAST(n_hits AS BIGINT) AS n_hits
    FROM S WHERE n_hits * 10 <= n_grams
"""

ORACLE_SQL["paragraph_dedup"] = f"""
    WITH T AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
    P AS (SELECT doc_id, list_transform(range(1, len(t) + 1, 20),
              i -> array_to_string(t[i:i+19], ' ')) AS paras FROM T),
    E AS (SELECT doc_id, unnest(paras) AS para,
                 CAST(generate_subscripts(paras, 1) AS BIGINT) - 1 AS pos
          FROM P),
    H AS (SELECT doc_id, pos, {_H60.format(s='para')} AS h FROM E),
    K AS (SELECT doc_id,
                 CASE WHEN doc_id * 1048576 + pos =
                      MIN(doc_id * 1048576 + pos) OVER (PARTITION BY h)
                      THEN 1 ELSE 0 END AS kept
          FROM H),
    A AS (SELECT doc_id, COUNT(*) AS np, SUM(kept) AS nk
          FROM K GROUP BY doc_id)
    SELECT d.doc_id, CAST(COALESCE(a.np, 0) AS BIGINT) AS n_paras,
           CAST(COALESCE(a.nk, 0) AS BIGINT) AS n_kept
    FROM documents d LEFT JOIN A a USING (doc_id)
"""

ORACLE_SQL["cms_sketch"] = f"""
    WITH D AS (SELECT unnest({_TOKENS}) AS tk FROM documents),
    C AS (SELECT tk, CAST(COUNT(*) AS BIGINT) AS n FROM D GROUP BY tk),
    S AS (SELECT r,
                 {_H60.format(s="CAST(r AS VARCHAR) || ':' || tk")} % 256
                     AS c,
                 n
          FROM C, (SELECT unnest(range(0, 4)) AS r))
    SELECT CAST(r AS BIGINT) AS r, CAST(c AS BIGINT) AS c,
           CAST(SUM(n) AS BIGINT) AS n
    FROM S GROUP BY 1, 2
"""

ORACLE_SQL["doc_lm_score"] = f"""
    WITH V AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n
               FROM (SELECT unnest({_TOKENS}) AS token FROM documents)
               GROUP BY token ORDER BY n DESC, token ASC LIMIT 32),
    D AS (SELECT doc_id, unnest({_TOKENS}) AS tk FROM documents),
    S AS (SELECT d.doc_id, SUM(COALESCE(v.n, 0)) AS hits,
                 COUNT(*) AS ntok
          FROM D d LEFT JOIN V v ON d.tk = v.token GROUP BY d.doc_id)
    SELECT doc.doc_id,
           CAST(COALESCE(s.hits, 0) AS BIGINT) AS lm_hits,
           CAST(COALESCE(s.ntok, 0) AS BIGINT) AS n_tokens,
           CASE WHEN s.ntok > 0 THEN CAST(s.hits AS DOUBLE) / s.ntok
                ELSE 0.0 END AS score
    FROM documents doc LEFT JOIN S s USING (doc_id)
"""

ORACLE_SQL["tfidf_top_terms"] = f"""
    WITH D AS (SELECT doc_id, unnest({_TOKENS}) AS tk FROM documents),
    TF AS (SELECT doc_id, tk, COUNT(*) AS tf FROM D GROUP BY 1, 2),
    DF AS (SELECT tk, COUNT(DISTINCT doc_id) AS df FROM D GROUP BY tk),
    R AS (SELECT doc_id, tk, tf, df,
                 ROW_NUMBER() OVER (PARTITION BY doc_id
                     ORDER BY tf DESC, df ASC, tk ASC) AS rank
          FROM TF JOIN DF USING (tk))
    SELECT doc_id, tk AS token, CAST(tf AS BIGINT) AS tf,
           CAST(df AS BIGINT) AS df, CAST(rank AS BIGINT) AS rank
    FROM R WHERE rank <= 3
"""

ORACLE_SQL["pack_chunks"] = f"""
    WITH N AS (SELECT doc_id, CAST(len({_TOKENS}) AS BIGINT) AS n
               FROM documents),
    S AS (SELECT doc_id, n,
                 COALESCE(SUM(n) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS st
          FROM N)
    SELECT doc_id, n AS n_tokens, CAST(st AS BIGINT) AS start_tok,
           CAST(st // 256 AS BIGINT) AS chunk_first,
           CAST((CASE WHEN n = 0 THEN st ELSE st + n - 1 END) // 256
               AS BIGINT) AS chunk_last
    FROM S
"""

ORACLE_SQL["shuffle_rank"] = """
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS BIGINT) AS rank
    FROM documents
"""

ORACLE_SQL["bpe_token_stats"] = r"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text,
               '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+')) AS BIGINT)
               AS n_bpe_tokens
    FROM documents
"""

ORACLE_SQL["dup_spans"] = f"""
    WITH T AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
    E AS (SELECT doc_id,
                 CAST(generate_subscripts(ws, 1) AS BIGINT) - 1 AS pos,
                 unnest(ws) AS s
          FROM (SELECT doc_id, list_transform(range(1, len(t) - 6),
                    i -> array_to_string(t[i:i+7], ' ')) AS ws
                FROM T WHERE len(t) >= 8)),
    H AS (SELECT doc_id, pos, {_H60.format(s='s')} AS h FROM E),
    DUP AS (SELECT doc_id, pos FROM H
            WHERE h IN (SELECT h FROM H GROUP BY h HAVING COUNT(*) >= 2)),
    B AS (SELECT doc_id, pos,
                 CASE WHEN pos - LAG(pos) OVER (
                          PARTITION BY doc_id ORDER BY pos) <= 8
                      THEN 0 ELSE 1 END AS brk
          FROM DUP),
    S AS (SELECT doc_id, pos,
                 SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS gid
          FROM B)
    SELECT doc_id, CAST(MIN(pos) AS BIGINT) AS span_start,
           CAST(MAX(pos) - MIN(pos) + 8 AS BIGINT) AS span_len
    FROM S GROUP BY doc_id, gid
"""

ORACLE_SQL["kmeans_clusters"] = """
    WITH E AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
                      CAST(generate_subscripts(embedding, 1) AS BIGINT) - 1
                          AS dim
               FROM embeddings),
    N AS (SELECT vec_id, GREATEST(SQRT(SUM(v * v)), 1e-12) AS nn
          FROM E GROUP BY vec_id),
    X AS (SELECT e.vec_id, e.dim, e.v / n.nn AS x
          FROM E e JOIN N n USING (vec_id)),
    C0 AS (SELECT vec_id % 8 AS c, dim, AVG(x) AS m FROM X GROUP BY 1, 2),
    C0N AS (SELECT c, dim, m / GREATEST(SQRT(SUM(m * m)
                OVER (PARTITION BY c)), 1e-12) AS cv FROM C0),
    S1 AS (SELECT x.vec_id, c0.c, SUM(x.x * c0.cv) AS dot
           FROM X x JOIN C0N c0 USING (dim) GROUP BY 1, 2),
    A1 AS (SELECT vec_id, c FROM (
             SELECT vec_id, c, ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY dot DESC, c ASC) AS rn FROM S1) WHERE rn = 1),
    C1 AS (SELECT a.c, x.dim, AVG(x.x) AS m
           FROM X x JOIN A1 a USING (vec_id) GROUP BY 1, 2),
    C1N AS (SELECT c, dim, m / GREATEST(SQRT(SUM(m * m)
                OVER (PARTITION BY c)), 1e-12) AS cv FROM C1),
    S2 AS (SELECT x.vec_id, c1.c, SUM(x.x * c1.cv) AS dot
           FROM X x JOIN C1N c1 USING (dim) GROUP BY 1, 2)
    SELECT vec_id, CAST(c AS BIGINT) AS cluster FROM (
        SELECT vec_id, c, ROW_NUMBER() OVER (PARTITION BY vec_id
            ORDER BY dot DESC, c ASC) AS rn FROM S2) WHERE rn = 1
"""

ORACLE_SQL["quantile_filter"] = f"""
    WITH N AS (SELECT doc_id, CAST(len({_TOKENS}) AS BIGINT) AS n_tokens
               FROM documents)
    SELECT doc_id, n_tokens FROM N
    WHERE n_tokens >= (SELECT quantile_disc(n_tokens, 0.5) FROM N)
"""

ORACLE_SQL["semdedup"] = """
    WITH base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
                  FROM embeddings),
    aug AS (SELECT * FROM base
            UNION ALL
            SELECT vec_id + 100000,
                   list_transform(range(1, len(e) + 1),
                       i -> CASE WHEN i = 1 THEN e[i] + 0.5
                                 ELSE e[i] END)
            FROM base WHERE vec_id % 5 = 0),
    E AS (SELECT vec_id, unnest(e) AS v,
                 CAST(generate_subscripts(e, 1) AS BIGINT) - 1 AS dim
          FROM aug),
    N AS (SELECT vec_id, GREATEST(SQRT(SUM(v * v)), 1e-12) AS nn
          FROM E GROUP BY vec_id),
    X AS (SELECT e.vec_id, e.dim, e.v / n.nn AS x
          FROM E e JOIN N n USING (vec_id)),
    C0 AS (SELECT vec_id % 8 AS c, dim, AVG(x) AS m FROM X GROUP BY 1, 2),
    C0N AS (SELECT c, dim, m / GREATEST(SQRT(SUM(m * m)
                OVER (PARTITION BY c)), 1e-12) AS cv FROM C0),
    S1 AS (SELECT x.vec_id, c0.c, SUM(x.x * c0.cv) AS dot
           FROM X x JOIN C0N c0 USING (dim) GROUP BY 1, 2),
    A1 AS (SELECT vec_id, c FROM (
             SELECT vec_id, c, ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY dot DESC, c ASC) AS rn FROM S1) WHERE rn = 1),
    C1 AS (SELECT a.c, x.dim, AVG(x.x) AS m
           FROM X x JOIN A1 a USING (vec_id) GROUP BY 1, 2),
    C1N AS (SELECT c, dim, m / GREATEST(SQRT(SUM(m * m)
                OVER (PARTITION BY c)), 1e-12) AS cv FROM C1),
    S2 AS (SELECT x.vec_id, c1.c, SUM(x.x * c1.cv) AS dot
           FROM X x JOIN C1N c1 USING (dim) GROUP BY 1, 2),
    A2 AS (SELECT vec_id, c FROM (
             SELECT vec_id, c, ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY dot DESC, c ASC) AS rn FROM S2) WHERE rn = 1),
    XC AS (SELECT x.vec_id, a.c, x.dim, x.x
           FROM X x JOIN A2 a USING (vec_id)),
    P AS (SELECT a.vec_id AS ia, b.vec_id AS ib, SUM(a.x * b.x) AS dot
          FROM XC a JOIN XC b
              ON a.dim = b.dim AND a.c = b.c AND a.vec_id < b.vec_id
          GROUP BY 1, 2),
    DR AS (SELECT DISTINCT ib FROM P WHERE dot >= 0.9)
    SELECT vec_id, CAST(c AS BIGINT) AS cluster FROM A2
    WHERE vec_id NOT IN (SELECT ib FROM DR)
"""


def q_heavy_hitters(sf_dir: str):
    """EXACT tokens with >= 1/64 of the corpus token mass, via merged
    per-batch Misra-Gries summaries (upper-bound prune) + a second exact
    pass over the (small) candidate set."""
    from .ops.sketch import heavy_hitters
    return heavy_hitters(_docs(sf_dir, ["text"]), num=1, den=64, k=16)


def q_dsir_weights(sf_dir: str):
    """DSIR-style hashed-unigram importance weights (target = lang 'en'
    docs, 256 md5 buckets, integer-exact add-one ratio sum per doc)."""
    from .ops.curation import dsir_weights
    return dsir_weights(_docs(sf_dir, ["doc_id", "text", "lang"]),
                        target_langs=("en",), buckets=256)


def q_bloom_hits(sf_dir: str):
    """Bloom-filter membership (2^16 bits, 4 double-hashed probes) of
    every document's text against the filter built from EVEN doc_ids:
    even docs are guaranteed hits, odd docs hit only on (deterministic,
    SQL-reproduced) false positives."""
    from .ops.sketch import bloom_member
    docs = _docs(sf_dir, ["doc_id", "text"])
    build = docs.map_batches(
        lambda b: b.filter(pc.equal(pc.bit_wise_and(
            b.column("doc_id"), 1), 0)), batch_format="pyarrow")
    return bloom_member(build, docs, key_col="text") \
        .select_columns(["doc_id", "hit"])


def q_priority_sample(sf_dir: str):
    """Deterministic weight-proportional (n_chars) top-50 priority
    sample over documents."""
    from .ops.text import priority_sample
    return priority_sample(_docs(sf_dir, ["doc_id", "n_chars"]), k=50,
                           weight_col="n_chars", key_col="doc_id")


QUERIES["heavy_hitters"] = q_heavy_hitters
QUERIES["dsir_weights"] = q_dsir_weights
QUERIES["bloom_hits"] = q_bloom_hits
QUERIES["priority_sample"] = q_priority_sample

ORACLE_SQL["heavy_hitters"] = f"""
    WITH T AS (SELECT unnest({_TOKENS}) AS token FROM documents),
    TOT AS (SELECT COUNT(*) AS n_tok FROM T)
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n
    FROM T GROUP BY token
    HAVING COUNT(*) * 64 >= (SELECT n_tok FROM TOT)
"""

ORACLE_SQL["dsir_weights"] = f"""
    WITH T AS (SELECT doc_id, lang, unnest({_TOKENS}) AS token
               FROM documents),
    B AS (SELECT doc_id, lang,
                 ('0x' || substr(md5(token), 1, 15))::BIGINT % 256
                     AS bucket
          FROM T),
    C AS (SELECT bucket, COUNT(*) AS raw,
                 COUNT(*) FILTER (WHERE lang = 'en') AS tgt
          FROM B GROUP BY bucket),
    R AS (SELECT bucket, (tgt + 1) * 1000000 // (raw + 1) AS r FROM C),
    W AS (SELECT b.doc_id, SUM(r.r) AS w
          FROM B b JOIN R r USING (bucket) GROUP BY b.doc_id)
    SELECT d.doc_id, CAST(COALESCE(w.w, 0) AS BIGINT) AS weight
    FROM documents d LEFT JOIN W w USING (doc_id)
"""

ORACLE_SQL["bloom_hits"] = """
    WITH H AS (SELECT doc_id,
                      ('0x' || substr(md5(text), 1, 15))::BIGINT AS h
               FROM documents),
    P AS (SELECT doc_id, h // 1073741824 AS h1, h % 1073741824 AS h2
          FROM H),
    BP AS (SELECT DISTINCT doc_id, (h1 + i * h2) % 65536 AS pos
           FROM P, range(4) t(i)),
    A AS (SELECT DISTINCT pos FROM BP WHERE doc_id % 2 = 0)
    SELECT bp.doc_id,
           CAST(CASE WHEN SUM(CASE WHEN a.pos IS NULL THEN 1 ELSE 0 END)
                         = 0 THEN 1 ELSE 0 END AS BIGINT) AS hit
    FROM BP bp LEFT JOIN A a USING (pos) GROUP BY bp.doc_id
"""

ORACLE_SQL["priority_sample"] = """
    SELECT doc_id, n_chars,
           CAST(CAST(LEAST(n_chars, 8191) AS HUGEINT) * 1125899906842624
                // (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
                        ::BIGINT // 1024 + 1) AS BIGINT) AS priority
    FROM documents
    ORDER BY priority DESC, doc_id ASC LIMIT 50
"""


def q_srp_knn(sf_dir: str):
    """SRP-LSH ANN top-k: candidates are vectors whose 8-bit
    signed-random-projection bucket is within Hamming distance 1 of the
    query's bucket; exact cosine ranks them. The md5-derived planes and
    fixed-point (floor(x * 2^20)) integer plane sums make the CANDIDATE
    SET itself part of the oracle contract — the SQL below reproduces
    the bucketing bit-for-bit, not just the ranking."""
    from .ops.similarity import srp_knn, queries_from_dataset
    ds = _embeddings(sf_dir)
    queries = queries_from_dataset(ds, n_queries=5)
    return srp_knn(ds, queries, k=10, n_planes=8, probe=1)


QUERIES["srp_knn"] = q_srp_knn

ORACLE_SQL["srp_knn"] = """
    WITH planes AS (
      SELECT p, d,
             CASE WHEN ('0x' || substr(md5('srp:' || p || ':' || d),
                                       1, 15))::BIGINT % 2 = 1
                  THEN 1 ELSE -1 END AS w
      FROM generate_series(0, 7) t1(p), generate_series(0, 63) t2(d)
    ),
    vecs AS (
      SELECT vec_id, d, CAST(floor(e * 1048576.0) AS BIGINT) AS q
      FROM (SELECT vec_id,
                   unnest(CAST(embedding AS DOUBLE[])) AS e,
                   generate_subscripts(embedding, 1) - 1 AS d
            FROM embeddings)
    ),
    bits AS (
      SELECT v.vec_id, pl.p,
             CASE WHEN SUM(v.q * pl.w) >= 0 THEN 1 ELSE 0 END AS bit
      FROM vecs v JOIN planes pl ON v.d = pl.d
      GROUP BY v.vec_id, pl.p
    ),
    buckets AS (
      SELECT vec_id, CAST(SUM(bit * (1::BIGINT << p)) AS BIGINT) AS bucket
      FROM bits GROUP BY vec_id
    )
    SELECT query_id, vec_id, rank FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(
                       CAST(q.embedding AS DOUBLE[]),
                       CAST(e.embedding AS DOUBLE[])) DESC,
                       e.vec_id ASC) AS rank
        FROM embeddings q
        JOIN buckets bq ON q.vec_id = bq.vec_id
        JOIN buckets be ON TRUE
        JOIN embeddings e ON e.vec_id = be.vec_id
        WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id
          AND bit_count(CAST(xor(bq.bucket, be.bucket) AS BIGINT)) <= 1)
    WHERE rank <= 10
"""


def q_interval_purchases(sf_dir: str):
    """Range/interval join: for every error event, how many purchases the
    same user made in the 10 minutes after it ((ts, ts+10min] window).
    One two-sided hash exchange + binary-search counting — right rows are
    never pair-expanded."""
    from .ops.join import interval_count_join
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
    errors = ds.filter(expr="event_type == 'error'") \
        .drop_columns(["event_type"])
    purchases = ds.filter(expr="event_type == 'purchase'") \
        .drop_columns(["event_type", "event_id"])
    return interval_count_join(errors, purchases, key="user_id",
                               lo_us=0, hi_us=600_000_000)


def q_running_totals(sf_dir: str):
    """Per-user running event count + running floor(value*1e6) sum in
    (ts, event_id) order — integer micro-units make the cumulative sums
    engine-exact."""
    from .ops.windows import running_totals
    return running_totals(_events(sf_dir,
                                  ["event_id", "user_id", "ts", "value"]))


def q_postings(sf_dir: str):
    """Inverted index over documents: (token, df, first-8 ascending
    posting string)."""
    from .ops.text import postings
    return postings(_docs(sf_dir, ["doc_id", "text"]), cap=8)


def q_mix_sample(sf_dir: str):
    """Domain-mixing downsample toward equal per-lang mass
    (md5(doc_id) % count(lang) < min-lang count — integer-exact,
    partition-independent keep rule)."""
    from .ops.curation import mix_sample
    return mix_sample(_docs(sf_dir, ["doc_id", "lang"]))


QUERIES["interval_purchases"] = q_interval_purchases
QUERIES["running_totals"] = q_running_totals
QUERIES["postings"] = q_postings
QUERIES["mix_sample"] = q_mix_sample

ORACLE_SQL["interval_purchases"] = """
    SELECT e.event_id, CAST(COUNT(p.ts) AS BIGINT) AS n
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'error') e
    LEFT JOIN (SELECT user_id, ts FROM events
               WHERE event_type = 'purchase') p
      ON p.user_id = e.user_id AND p.ts > e.ts
         AND p.ts <= e.ts + INTERVAL 10 MINUTE
    GROUP BY e.event_id
"""

ORACLE_SQL["running_totals"] = """
    SELECT event_id,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS cum_n,
           CAST(SUM(CAST(floor(COALESCE(value, 0) * 1000000) AS BIGINT))
                OVER w AS BIGINT) AS cum_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING)
"""

ORACLE_SQL["postings"] = f"""
    WITH E AS (SELECT DISTINCT doc_id, token
               FROM (SELECT doc_id, unnest({_TOKENS}) AS token
                     FROM documents))
    SELECT token, CAST(COUNT(*) AS BIGINT) AS df,
           array_to_string(list_slice(list(doc_id ORDER BY doc_id), 1, 8),
                           ',') AS postings
    FROM E GROUP BY token
"""

ORACLE_SQL["mix_sample"] = """
    WITH C AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    M AS (SELECT MIN(n) AS mn FROM C)
    SELECT d.doc_id, d.lang
    FROM documents d JOIN C USING (lang) CROSS JOIN M
    WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
              % C.n < M.mn
"""


def q_mix_sample_sqrt(sf_dir: str):
    """Sqrt-temperature domain mixing: surviving mass per lang ~
    sqrt(count) (md5(doc_id) % n_lang < floor(sqrt(min * n_lang)) —
    deterministic, partition-independent keep rule)."""
    from .ops.curation import mix_sample_sqrt
    return mix_sample_sqrt(_docs(sf_dir, ["doc_id", "lang"]))


QUERIES["mix_sample_sqrt"] = q_mix_sample_sqrt

ORACLE_SQL["mix_sample_sqrt"] = """
    WITH C AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang),
    M AS (SELECT MIN(n) AS mn FROM C)
    SELECT d.doc_id, d.lang
    FROM documents d JOIN C USING (lang) CROSS JOIN M
    WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
              % C.n
          < CAST(floor(sqrt(CAST(M.mn * C.n AS DOUBLE))) AS BIGINT)
"""


def q_trailing_values(sf_dir: str):
    """Per-user trailing 5-event running sum of floor(value*1e6) in
    (ts, event_id) order — the bounded sliding-window aggregate."""
    from .ops.windows import trailing_totals
    return trailing_totals(_events(sf_dir,
                                   ["event_id", "user_id", "ts", "value"]),
                           window=5)


QUERIES["trailing_values"] = q_trailing_values

ORACLE_SQL["trailing_values"] = """
    SELECT event_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS trail_n,
           CAST(SUM(CAST(floor(COALESCE(value, 0) * 1000000) AS BIGINT))
                OVER w AS BIGINT) AS trail_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
"""


def q_full_join_hourly(sf_dir: str):
    """Full outer join: hourly 'error' counts vs hourly 'purchase'
    counts — hours with only one side survive with a 0 for the other
    (44 error-only + 39 purchase-only hours at sf0.01). Exercises
    hash_join(how='full'): unmatched rows on EITHER side, keys
    coalesced into the left key column."""
    from ray.data.aggregate import Sum
    from .ops.join import hash_join

    def hourly(etype: str, out: str):
        def partial(b: pa.Table, et=etype, o=out) -> pa.Table:
            m = b.filter(pc.equal(b.column("event_type"), et))
            hour = pc.floor_temporal(m.column("ts"), unit="hour")
            g = pa.table({"hour": hour}).group_by(["hour"]) \
                .aggregate([([], "count_all")])
            return pa.table({"hour": g.column("hour"),
                             "p": g.column("count_all")})

        return _events(sf_dir, ["event_type", "ts"]) \
            .map_batches(partial, batch_format="pyarrow") \
            .groupby("hour").aggregate(Sum("p", alias_name=out))

    err = hourly("error", "n_error")
    pur = hourly("purchase", "n_purchase")
    j = hash_join(err, pur, "hour", "hour",
                  left_cols=["hour", "n_error"],
                  right_cols=["hour", "n_purchase"], how="full")
    return j.map_batches(
        lambda b: pa.table({
            "hour": b.column("hour"),
            "n_error": pc.fill_null(b.column("n_error"), 0),
            "n_purchase": pc.fill_null(b.column("n_purchase"), 0)}),
        batch_format="pyarrow")


QUERIES["full_join_hourly"] = q_full_join_hourly

ORACLE_SQL["full_join_hourly"] = """
    WITH e AS (SELECT date_trunc('hour', ts) AS hour,
                      CAST(COUNT(*) AS BIGINT) AS n_error
               FROM events WHERE event_type = 'error' GROUP BY 1),
    p AS (SELECT date_trunc('hour', ts) AS hour,
                 CAST(COUNT(*) AS BIGINT) AS n_purchase
          FROM events WHERE event_type = 'purchase' GROUP BY 1)
    SELECT COALESCE(e.hour, p.hour) AS hour,
           COALESCE(e.n_error, 0) AS n_error,
           COALESCE(p.n_purchase, 0) AS n_purchase
    FROM e FULL OUTER JOIN p ON e.hour = p.hour
"""


def q_simhash_clusters(sf_dir: str):
    """Connected components over the SimHash Hamming-ball pair graph
    (within-bucket pairs, Hamming ≤ 12) via distributed min-label
    propagation — the SimHash counterpart of minhash_clusters."""
    from .ops.dedup import simhash_clusters
    return simhash_clusters(_docs(sf_dir, ["doc_id", "text"]),
                            max_hamming=12)


QUERIES["simhash_clusters"] = q_simhash_clusters

# the simhash_dups pair derivation + recursive min-reachability components
ORACLE_SQL["simhash_clusters"] = f"""
    WITH RECURSIVE tc AS (
        SELECT doc_id, tk, CAST(COUNT(*) AS BIGINT) AS w
        FROM (SELECT doc_id, unnest({_TOKENS}) AS tk FROM documents)
        GROUP BY doc_id, tk),
    th AS (SELECT doc_id,
                  CAST(('0x' || substr(md5(tk), 1, 15)) AS BIGINT) AS h,
                  w
           FROM tc),
    bits AS (
        SELECT doc_id, b,
               SUM(CASE WHEN ((h >> b) & 1) = 1 THEN w ELSE -w END) AS s
        FROM th, (SELECT unnest(range(0, 60)) AS b)
        GROUP BY doc_id, b),
    agg AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << b)
                             ELSE 0 END) AS BIGINT) AS simhash
        FROM bits GROUP BY doc_id),
    S AS (SELECT d.doc_id,
                 COALESCE(a.simhash, 0) AS simhash,
                 COALESCE(a.simhash, 0) >> 44 AS bkt
          FROM documents d LEFT JOIN agg a USING (doc_id)),
    P AS (SELECT a.doc_id AS ia, b.doc_id AS ib
          FROM S a JOIN S b
            ON a.bkt = b.bkt AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 12),
    E AS (SELECT ia AS src, ib AS dst FROM P
          UNION ALL SELECT ib, ia FROM P),
    W(node, reach) AS (
        SELECT src, src FROM E
        UNION
        SELECT w.node, e.dst FROM W w JOIN E e ON w.reach = e.src)
    SELECT node AS doc_id, CAST(MIN(reach) AS BIGINT) AS cluster_id
    FROM W GROUP BY node
"""


def q_cluster_reps(sf_dir: str):
    """Canonical doc per MinHash near-dup cluster: the member with the
    MOST tokens survives (ties → smallest doc_id) — dedup that keeps the
    best copy, not the arbitrary min-id one."""
    from .ops.dedup import cluster_representatives
    return cluster_representatives(_docs(sf_dir, ["doc_id", "text"]),
                                   threshold=0.5, n_hashes=128,
                                   n_bands=128)


QUERIES["cluster_reps"] = q_cluster_reps

# minhash_clusters' component derivation + per-cluster argmax by token
# count (ties to the smallest doc_id)
ORACLE_SQL["cluster_reps"] = """
    WITH RECURSIVE T AS (SELECT doc_id,
                      list_filter(string_split(text, ' '),
                                  x -> x <> '') AS t
               FROM documents),
    SH AS (SELECT doc_id,
                  list_distinct(CASE
                      WHEN len(t) = 0 THEN ['']
                      WHEN len(t) < 5 THEN [array_to_string(t, ' ')]
                      ELSE list_transform(range(1, len(t) - 3),
                          i -> array_to_string(t[i:i+4], ' '))
                  END) AS s
           FROM T),
    EX AS (SELECT doc_id, unnest(s) AS g FROM SH),
    CAND AS (SELECT DISTINCT a.doc_id AS ia, b.doc_id AS ib
             FROM EX a JOIN EX b ON a.g = b.g AND a.doc_id < b.doc_id),
    P AS (SELECT ia, ib FROM CAND
          JOIN SH sa ON sa.doc_id = ia
          JOIN SH sb ON sb.doc_id = ib
          WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
                / (len(sa.s) + len(sb.s)
                   - len(list_intersect(sa.s, sb.s))) >= 0.5),
    E AS (SELECT ia AS src, ib AS dst FROM P
          UNION ALL SELECT ib, ia FROM P),
    W(node, reach) AS (
        SELECT src, src FROM E
        UNION
        SELECT w.node, e.dst FROM W w JOIN E e ON w.reach = e.src),
    C AS (SELECT node AS doc_id, CAST(MIN(reach) AS BIGINT) AS cluster_id
          FROM W GROUP BY node)
    SELECT cluster_id, doc_id, n_tokens
    FROM (SELECT c.cluster_id, c.doc_id,
                 CAST(len(t.t) AS BIGINT) AS n_tokens,
                 row_number() OVER (PARTITION BY c.cluster_id
                                    ORDER BY len(t.t) DESC, c.doc_id)
                     AS rn
          FROM C c JOIN T t USING (doc_id))
    WHERE rn = 1
"""


def q_char_stats(sf_dir: str):
    """Character-level spam signals per doc: codepoint count, distinct
    codepoints, longest same-codepoint run (keyword-stuffing / generator
    glitch marker) — integer-exact, one flat-codepoint kernel per batch."""
    from .ops.text import char_stats
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        char_stats, batch_format="pyarrow")


QUERIES["char_stats"] = q_char_stats

# gaps-and-islands over positionally unnested codepoints (range() and
# string_split_regex(text,'') align 1:1 — verified len-equal on the table)
ORACLE_SQL["char_stats"] = """
    WITH ch AS (
        SELECT doc_id,
               unnest(range(1, length(text) + 1)) AS i,
               unnest(string_split_regex(text, '')) AS c
        FROM documents WHERE length(text) > 0),
    runs AS (
        SELECT doc_id, c,
               i - row_number() OVER (PARTITION BY doc_id, c ORDER BY i)
                   AS grp
        FROM ch),
    rl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS run_len
           FROM runs GROUP BY doc_id, c, grp),
    mx AS (SELECT doc_id, MAX(run_len) AS max_char_run
           FROM rl GROUP BY doc_id)
    SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars,
           CAST(CASE WHEN length(d.text) = 0 THEN 0
                ELSE len(list_distinct(string_split_regex(d.text, '')))
                END AS BIGINT) AS n_distinct_chars,
           COALESCE(mx.max_char_run, 0) AS max_char_run
    FROM documents d LEFT JOIN mx USING (doc_id)
"""


def q_daily_new_users(sf_dir: str):
    """Cumulative-unique growth curve: first-seen day per user → daily
    new-user counts → exact running total via the O(n_blocks) block
    scan (no global event sort, no driver-side rows)."""
    from .ops.windows import first_seen_cumulative
    out = first_seen_cumulative(_events(sf_dir, ["user_id", "ts"]),
                                key_col="user_id", ts_col="ts",
                                unit="day")
    return out.map_batches(
        lambda b: b.rename_columns(["day", "n_new", "cum_users"]),
        batch_format="pyarrow")


QUERIES["daily_new_users"] = q_daily_new_users

ORACLE_SQL["daily_new_users"] = """
    WITH f AS (SELECT user_id, MIN(ts) AS fts FROM events
               GROUP BY user_id),
    d AS (SELECT date_trunc('day', fts) AS day,
                 CAST(COUNT(*) AS BIGINT) AS n_new
          FROM f GROUP BY 1)
    SELECT day, n_new,
           CAST(SUM(n_new) OVER (ORDER BY day) AS BIGINT) AS cum_users
    FROM d
"""


def q_user_day_activity(sf_dir: str):
    """Composite-key (user_id, day) FULL OUTER join of per-user-day
    purchase counts vs error counts — the cross-signal activity matrix;
    days where a user has only one signal survive with a 0."""
    from ray.data.aggregate import Sum
    from .ops.join import hash_join

    def daily(etype: str, out: str):
        def partial(b: pa.Table, et=etype) -> pa.Table:
            m = b.filter(pc.equal(b.column("event_type"), et))
            day = pc.floor_temporal(m.column("ts"), unit="day")
            g = pa.table({"user_id": m.column("user_id"), "day": day}) \
                .group_by(["user_id", "day"]) \
                .aggregate([([], "count_all")])
            return pa.table({"user_id": g.column("user_id"),
                             "day": g.column("day"),
                             "p": g.column("count_all")})

        return _events(sf_dir, ["user_id", "event_type", "ts"]) \
            .map_batches(partial, batch_format="pyarrow") \
            .groupby(["user_id", "day"]).aggregate(Sum("p", alias_name=out))

    pur = daily("purchase", "n_purchase")
    err = daily("error", "n_error")
    j = hash_join(pur, err, ["user_id", "day"], ["user_id", "day"],
                  left_cols=["user_id", "day", "n_purchase"],
                  right_cols=["user_id", "day", "n_error"], how="full")
    return j.map_batches(
        lambda b: pa.table({
            "user_id": b.column("user_id"),
            "day": b.column("day"),
            "n_purchase": pc.fill_null(b.column("n_purchase"), 0),
            "n_error": pc.fill_null(b.column("n_error"), 0)}),
        batch_format="pyarrow")


QUERIES["user_day_activity"] = q_user_day_activity

ORACLE_SQL["user_day_activity"] = """
    WITH p AS (SELECT user_id, date_trunc('day', ts) AS day,
                      CAST(COUNT(*) AS BIGINT) AS n_purchase
               FROM events WHERE event_type = 'purchase' GROUP BY 1, 2),
    e AS (SELECT user_id, date_trunc('day', ts) AS day,
                 CAST(COUNT(*) AS BIGINT) AS n_error
          FROM events WHERE event_type = 'error' GROUP BY 1, 2)
    SELECT COALESCE(p.user_id, e.user_id) AS user_id,
           COALESCE(p.day, e.day) AS day,
           COALESCE(p.n_purchase, 0) AS n_purchase,
           COALESCE(e.n_error, 0) AS n_error
    FROM p FULL OUTER JOIN e
      ON p.user_id = e.user_id AND p.day = e.day
"""


def q_cross_run_simhash(sf_dir: str):
    """Two-run incremental SimHash ingest (fourth ingest-family member):
    run A (even docs) commits its (id, simhash, bucket) index; run B =
    odd docs + re-keyed one-token variants of the even docs — a variant
    drops whenever its SimHash stays within Hamming 12 of the committed
    original in the same bucket, and run-B-internal Hamming neighbours
    drop against lower ids. Returns run B's survivors."""
    import os
    import shutil

    from .ops.dedup import ingest_simhash_run

    state = f"/tmp/l2sr_sh_ingest_{os.getpid()}"
    shutil.rmtree(state, ignore_errors=True)
    docs = _docs(sf_dir, ["doc_id", "text"])
    half = parity_half

    run_a = docs.map_batches(lambda b: half(b, 0), batch_format="pyarrow")
    ingest_simhash_run(run_a, state, max_hamming=12)

    def variant(b: pa.Table) -> pa.Table:
        t = half(b, 0)
        return pa.table({
            "doc_id": pc.add(pc.cast(t.column("doc_id"), pa.int64()),
                             pa.scalar(1_000_000, pa.int64())),
            "text": pc.binary_join_element_wise(
                t.column("text"), pa.scalar(" zz9"), ""),
        })

    run_b = docs.map_batches(lambda b: half(b, 1),
                             batch_format="pyarrow") \
        .select_columns(["doc_id", "text"]) \
        .union(docs.map_batches(variant, batch_format="pyarrow"))
    out = ingest_simhash_run(run_b, state, max_hamming=12)
    shutil.rmtree(state, ignore_errors=True)
    return out.select_columns(["doc_id", "simhash"])


QUERIES["cross_run_simhash"] = q_cross_run_simhash


def q_compacted_simhash(sf_dir: str):
    """cross_run_simhash with an index COMPACTION between the runs:
    ``compact_simhash_index`` rewrites the committed (id, simhash,
    bucket) rows hash-bucketed by ``simhash_bucket``, and run B ingests
    through the bucket-aligned read path. Answers the exact
    cross_run_simhash oracle — compaction must be invisible."""
    import os
    import shutil

    from .ops.dedup import compact_simhash_index, ingest_simhash_run

    state = f"/tmp/l2sr_shc_ingest_{os.getpid()}"
    shutil.rmtree(state, ignore_errors=True)
    docs = _docs(sf_dir, ["doc_id", "text"])
    half = parity_half

    run_a = docs.map_batches(lambda b: half(b, 0), batch_format="pyarrow")
    ingest_simhash_run(run_a, state, max_hamming=12)
    stats = compact_simhash_index(state)
    assert stats["runs_compacted"] == 1 and stats["dir"] is not None

    def variant(b: pa.Table) -> pa.Table:
        t = half(b, 0)
        return pa.table({
            "doc_id": pc.add(pc.cast(t.column("doc_id"), pa.int64()),
                             pa.scalar(1_000_000, pa.int64())),
            "text": pc.binary_join_element_wise(
                t.column("text"), pa.scalar(" zz9"), ""),
        })

    run_b = docs.map_batches(lambda b: half(b, 1),
                             batch_format="pyarrow") \
        .select_columns(["doc_id", "text"]) \
        .union(docs.map_batches(variant, batch_format="pyarrow"))
    out = ingest_simhash_run(run_b, state, max_hamming=12)
    shutil.rmtree(state, ignore_errors=True)
    return out.select_columns(["doc_id", "simhash"])


QUERIES["compacted_simhash"] = q_compacted_simhash

# the simhash derivation over run A ∪ run B (odds + ' zz9' variants),
# then the two-level non-cascading victim rule: run A keeps lower-id-
# clear rows; run B drops on a committed-survivor witness or a lower-id
# run-B witness (victim or not) in the same 16-bit bucket
ORACLE_SQL["cross_run_simhash"] = """
    WITH U AS (
        SELECT doc_id, text, 0 AS run FROM documents WHERE doc_id % 2 = 0
        UNION ALL
        SELECT doc_id, text, 1 FROM documents WHERE doc_id % 2 = 1
        UNION ALL
        SELECT doc_id + 1000000, text || ' zz9', 1 FROM documents
        WHERE doc_id % 2 = 0),
    tc AS (
        SELECT doc_id, tk, CAST(COUNT(*) AS BIGINT) AS w
        FROM (SELECT doc_id,
                     unnest(list_filter(string_split(text, ' '),
                                        x -> x <> '')) AS tk
              FROM U)
        GROUP BY doc_id, tk),
    th AS (SELECT doc_id,
                  CAST(('0x' || substr(md5(tk), 1, 15)) AS BIGINT) AS h,
                  w
           FROM tc),
    bits AS (
        SELECT doc_id, b,
               SUM(CASE WHEN ((h >> b) & 1) = 1 THEN w ELSE -w END) AS s
        FROM th, (SELECT unnest(range(0, 60)) AS b)
        GROUP BY doc_id, b),
    agg AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << b)
                             ELSE 0 END) AS BIGINT) AS simhash
        FROM bits GROUP BY doc_id),
    S AS (SELECT u.doc_id, u.run,
                 COALESCE(a.simhash, 0) AS simhash,
                 COALESCE(a.simhash, 0) >> 44 AS bkt
          FROM U u LEFT JOIN agg a USING (doc_id)),
    ASURV AS (
        SELECT a.* FROM S a WHERE a.run = 0 AND NOT EXISTS (
            SELECT 1 FROM S w
            WHERE w.run = 0 AND w.doc_id < a.doc_id AND w.bkt = a.bkt
              AND bit_count(xor(w.simhash, a.simhash)) <= 12))
    SELECT b.doc_id, b.simhash
    FROM S b WHERE b.run = 1
      AND NOT EXISTS (
          SELECT 1 FROM ASURV w
          WHERE w.bkt = b.bkt
            AND bit_count(xor(w.simhash, b.simhash)) <= 12)
      AND NOT EXISTS (
          SELECT 1 FROM S w
          WHERE w.run = 1 AND w.doc_id < b.doc_id AND w.bkt = b.bkt
            AND bit_count(xor(w.simhash, b.simhash)) <= 12)
"""

# index compaction is semantics-preserving by contract — the compacted
# pipelines answer to the EXACT same SQL as the uncompacted ones
ORACLE_SQL["compacted_dedup"] = ORACLE_SQL["cross_run_dedup"]
ORACLE_SQL["compacted_simhash"] = ORACLE_SQL["cross_run_simhash"]


def q_pagerank_sim(sf_dir: str):
    """PageRank centrality over the SimHash near-dup graph (within-
    bucket pairs at Hamming ≤ 12, symmetrized): 5 BSP supersteps of
    int64 fixed-point power iteration — high-rank docs are the hubs of
    large near-dup families (a centrality-based canonical-copy signal,
    complementing cluster_reps' size-based one). All documents form the
    vertex set, so isolated docs hold exactly the base rank."""
    import pyarrow.compute as _pc

    from .ops.dedup import simhash_dups
    from .ops.graph import pagerank, symmetrize_pairs

    docs = _docs(sf_dir, ["doc_id", "text"])
    edges = symmetrize_pairs(simhash_dups(docs, max_hamming=12))
    nodes = _docs(sf_dir, ["doc_id"]).map_batches(
        lambda b: pa.table(
            {"id": _pc.cast(b.column("doc_id"), pa.int64())}),
        batch_format="pyarrow")
    return pagerank(edges, num_iters=5, nodes=nodes)


QUERIES["pagerank_sim"] = q_pagerank_sim

# the simhash_dups pair derivation, symmetrized, then 5 unrolled
# supersteps of the SAME int64 fixed-point recurrence the engine runs:
#   r0 = scale//N;  r' = base + (85 * Σ_dst(r//outdeg)) // 100
# (floor division everywhere → bit-exact across engines)
_PR_PREFIX = f"""
    WITH tc AS (
        SELECT doc_id, tk, CAST(COUNT(*) AS BIGINT) AS w
        FROM (SELECT doc_id, unnest({_TOKENS}) AS tk FROM documents)
        GROUP BY doc_id, tk),
    th AS (SELECT doc_id,
                  CAST(('0x' || substr(md5(tk), 1, 15)) AS BIGINT) AS h,
                  w
           FROM tc),
    bits AS (
        SELECT doc_id, b,
               SUM(CASE WHEN ((h >> b) & 1) = 1 THEN w ELSE -w END) AS s
        FROM th, (SELECT unnest(range(0, 60)) AS b)
        GROUP BY doc_id, b),
    agg AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << b)
                             ELSE 0 END) AS BIGINT) AS simhash
        FROM bits GROUP BY doc_id),
    S AS (SELECT d.doc_id,
                 COALESCE(a.simhash, 0) AS simhash,
                 COALESCE(a.simhash, 0) >> 44 AS bkt
          FROM documents d LEFT JOIN agg a USING (doc_id)),
    P AS (SELECT a.doc_id AS ia, b.doc_id AS ib
          FROM S a JOIN S b
            ON a.bkt = b.bkt AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 12),
    E AS (SELECT ia AS src, ib AS dst FROM P
          UNION ALL SELECT ib, ia FROM P),
    D AS (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS deg
          FROM E GROUP BY src),
    V AS (SELECT doc_id AS id FROM documents),
    C AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM V),
    r0 AS (SELECT v.id, 1000000000000 // c.n AS r FROM V v CROSS JOIN C c)"""

_PR_STEP = """,
    m{k} AS (SELECT e.dst AS id, SUM(r.r // d.deg) AS s
           FROM E e JOIN r{k} r ON r.id = e.src
                    JOIN D d ON d.id = e.src
           GROUP BY e.dst),
    r{k1} AS (SELECT v.id,
                   (1000000000000 * 15 // 100) // c.n
                       + (85 * COALESCE(m.s, 0)) // 100 AS r
            FROM V v CROSS JOIN C c LEFT JOIN m{k} m ON m.id = v.id)"""

ORACLE_SQL["pagerank_sim"] = _PR_PREFIX + "".join(
    _PR_STEP.format(k=k, k1=k + 1) for k in range(5)) + """
    SELECT id AS node_id, CAST(r AS BIGINT) AS "rank" FROM r5
"""


def q_triangles_sim(sf_dir: str):
    """Per-doc triangle counts over the SimHash near-dup graph — the
    clustering-coefficient numerator; dense triangle neighbourhoods
    flag template farms / mirror rings that pairwise Hamming scores
    miss. Degree-oriented wedge expansion, O(m^1.5) total work."""
    from .ops.dedup import simhash_dups
    from .ops.graph import triangle_counts

    docs = _docs(sf_dir, ["doc_id", "text"])
    return triangle_counts(simhash_dups(docs, max_hamming=12))


QUERIES["triangles_sim"] = q_triangles_sim

# the simhash_dups pair derivation (ia < ib), then the canonical
# u<v<w three-way self-join; each corner of each triangle counts once
ORACLE_SQL["triangles_sim"] = f"""
    WITH tc AS (
        SELECT doc_id, tk, CAST(COUNT(*) AS BIGINT) AS w
        FROM (SELECT doc_id, unnest({_TOKENS}) AS tk FROM documents)
        GROUP BY doc_id, tk),
    th AS (SELECT doc_id,
                  CAST(('0x' || substr(md5(tk), 1, 15)) AS BIGINT) AS h,
                  w
           FROM tc),
    bits AS (
        SELECT doc_id, b,
               SUM(CASE WHEN ((h >> b) & 1) = 1 THEN w ELSE -w END) AS s
        FROM th, (SELECT unnest(range(0, 60)) AS b)
        GROUP BY doc_id, b),
    agg AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << b)
                             ELSE 0 END) AS BIGINT) AS simhash
        FROM bits GROUP BY doc_id),
    S AS (SELECT d.doc_id,
                 COALESCE(a.simhash, 0) AS simhash,
                 COALESCE(a.simhash, 0) >> 44 AS bkt
          FROM documents d LEFT JOIN agg a USING (doc_id)),
    P AS (SELECT a.doc_id AS ia, b.doc_id AS ib
          FROM S a JOIN S b
            ON a.bkt = b.bkt AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 12),
    T AS (SELECT a.ia AS u, a.ib AS v, b.ib AS w
          FROM P a JOIN P b ON b.ia = a.ib
                   JOIN P c ON c.ia = a.ia AND c.ib = b.ib),
    N AS (SELECT u AS id FROM T
          UNION ALL SELECT v FROM T
          UNION ALL SELECT w FROM T)
    SELECT id AS node_id, CAST(COUNT(*) AS BIGINT) AS n_triangles
    FROM N GROUP BY id
"""


def q_dense_daily(sf_dir: str):
    """Gap-filled per-user daily event series: every day between a
    user's first and last event appears, zero-filled — the resampling
    step before rate/window math (ops/stats.py:dense_counts)."""
    from .ops.stats import dense_counts
    return dense_counts(_events(sf_dir, ["user_id", "ts"]),
                        key="user_id", unit="day")


QUERIES["dense_daily"] = q_dense_daily

# per-user generate_series over the [first, last] day span, zero-filled
ORACLE_SQL["dense_daily"] = """
    WITH c AS (SELECT user_id, date_trunc('day', ts) AS period,
                      CAST(COUNT(*) AS BIGINT) AS n
               FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
    b AS (SELECT user_id, MIN(period) AS mn, MAX(period) AS mx
          FROM c GROUP BY 1),
    g AS (SELECT user_id,
                 unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS period
          FROM b)
    SELECT g.user_id, g.period,
           COALESCE(c.n, CAST(0 AS BIGINT)) AS n
    FROM g LEFT JOIN c USING (user_id, period)
"""


def q_event_cooccurrence(sf_dir: str):
    """Market-basket support: for each unordered event-type pair, how
    many users performed BOTH (ops/windows.py:cooccurrence_pairs)."""
    from .ops.windows import cooccurrence_pairs
    return cooccurrence_pairs(_events(sf_dir, ["user_id", "event_type"]),
                              key="user_id", item_col="event_type")


QUERIES["event_cooccurrence"] = q_event_cooccurrence

ORACLE_SQL["event_cooccurrence"] = """
    WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT a.event_type AS item_a, b.event_type AS item_b,
           CAST(COUNT(*) AS BIGINT) AS n_keys
    FROM d a JOIN d b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY 1, 2
"""


def q_value_bands(sf_dir: str):
    """Broadcast range-lookup enrich: classify each event's value into a
    severity band ([lo, hi) intervals broadcast once; the [80, 100)
    hole exercises no-match rows), then count per band
    (ops/join.py:range_lookup_join)."""
    import pandas as pd
    from ray.data.aggregate import Sum
    from .ops.join import range_lookup_join
    bands = pd.DataFrame({
        "band": ["low", "mid", "high", "extreme"],
        "lo": [0.0, 20.0, 100.0, 200.0],
        "hi": [20.0, 80.0, 200.0, None]})
    enriched = range_lookup_join(_events(sf_dir, ["event_id", "value"]),
                                 bands, value_col="value")

    def partial(b: pa.Table) -> pa.Table:
        band = pc.fill_null(b.column("band"), "none")
        g = pa.table({"band": band}).group_by(["band"]) \
            .aggregate([([], "count_all")])
        return pa.table({"band": g.column("band"),
                         "p": pc.cast(g.column("count_all"), pa.int64())})

    return enriched.map_batches(partial, batch_format="pyarrow") \
        .groupby("band").aggregate(Sum("p", alias_name="n"))


QUERIES["value_bands"] = q_value_bands

ORACLE_SQL["value_bands"] = """
    WITH bands(band, lo, hi) AS (VALUES
        ('low', 0.0, 20.0), ('mid', 20.0, 80.0),
        ('high', 100.0, 200.0), ('extreme', 200.0, NULL))
    SELECT COALESCE(b.band, 'none') AS band,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events e LEFT JOIN bands b
      ON e.value >= b.lo AND (b.hi IS NULL OR e.value < b.hi)
    GROUP BY 1
"""


def q_gap_stats(sf_dir: str):
    """Per-user inter-arrival gap stats in exact integer microseconds
    (ops/windows.py:inter_arrival_stats)."""
    from .ops.windows import inter_arrival_stats
    return inter_arrival_stats(_events(sf_dir, ["user_id", "ts"]),
                               key="user_id")


QUERIES["gap_stats"] = q_gap_stats

# LAG over ts ties is order-arbitrary but the gap MULTISET of a sorted
# multiset is unique, so MIN/MAX/SUM agree with the engine exactly
ORACLE_SQL["gap_stats"] = """
    WITH g AS (
        SELECT user_id,
               CAST(epoch_us(ts) AS BIGINT)
               - LAG(CAST(epoch_us(ts) AS BIGINT))
                   OVER (PARTITION BY user_id ORDER BY ts) AS gap
        FROM events WHERE ts IS NOT NULL)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(gap) AS BIGINT) AS n_gaps,
           CAST(COALESCE(MIN(gap), 0) AS BIGINT) AS min_gap_us,
           CAST(COALESCE(MAX(gap), 0) AS BIGINT) AS max_gap_us,
           CAST(COALESCE(SUM(gap), 0) AS BIGINT) AS sum_gap_us
    FROM g GROUP BY user_id
"""


def q_cross_jaccard(sf_dir: str):
    """Cross-corpus Jaccard similarity join: the corpus vs a 'benchmark'
    of near-variant copies (every 37th doc + one appended token, re-keyed
    +1e6) — each contaminated (train, benchmark) pair surfaces with its
    exact intersection/union (ops/curation.py:cross_jaccard_pairs)."""
    from .ops.curation import cross_jaccard_pairs

    left = _docs(sf_dir, ["doc_id", "text"])

    def variant(b: pa.Table) -> pa.Table:
        t = _mod37(b, True)
        return pa.table({
            "doc_id": pc.add(pc.cast(t.column("doc_id"), pa.int64()),
                             pa.scalar(1_000_000, pa.int64())),
            "text": pc.binary_join_element_wise(
                t.column("text"), pa.scalar(" zz9"), ""),
        })

    right = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        variant, batch_format="pyarrow")
    return cross_jaccard_pairs(left, right, window=4, tau_num=1,
                               tau_den=2, max_df=64)


QUERIES["cross_jaccard"] = q_cross_jaccard

# cross set-similarity join in SQL: both corpora's shingle sets, df cap
# counted over the UNION, left × right intersection counts, the same
# integer threshold inter*(den+num) >= num*(sz_l+sz_r)
ORACLE_SQL["cross_jaccard"] = f"""
    WITH L AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
    R AS (SELECT doc_id + 1000000 AS doc_id,
                 list_filter(string_split(text || ' zz9', ' '),
                             x -> x <> '') AS t
          FROM documents WHERE doc_id % 37 = 0),
    SHL AS (SELECT doc_id, list_distinct(list_transform(
              CASE WHEN len(t) = 0 THEN ['']
                   WHEN len(t) < 4 THEN [array_to_string(t, ' ')]
                   ELSE list_transform(range(1, len(t) - 2),
                       i -> array_to_string(t[i:i+3], ' ')) END,
              s -> {_H60.format(s='s')})) AS gs
           FROM L),
    SHR AS (SELECT doc_id, list_distinct(list_transform(
              CASE WHEN len(t) = 0 THEN ['']
                   WHEN len(t) < 4 THEN [array_to_string(t, ' ')]
                   ELSE list_transform(range(1, len(t) - 2),
                       i -> array_to_string(t[i:i+3], ' ')) END,
              s -> {_H60.format(s='s')})) AS gs
           FROM R),
    EXL0 AS (SELECT doc_id, unnest(gs) AS g FROM SHL),
    EXR0 AS (SELECT doc_id, unnest(gs) AS g FROM SHR),
    DF AS (SELECT g, COUNT(*) AS df FROM
               (SELECT g FROM EXL0 UNION ALL SELECT g FROM EXR0)
           GROUP BY g),
    EXL AS (SELECT e.doc_id, e.g FROM EXL0 e JOIN DF USING (g)
            WHERE df <= 64),
    EXR AS (SELECT e.doc_id, e.g FROM EXR0 e JOIN DF USING (g)
            WHERE df <= 64),
    SZL AS (SELECT doc_id, COUNT(*) AS sz FROM EXL GROUP BY doc_id),
    SZR AS (SELECT doc_id, COUNT(*) AS sz FROM EXR GROUP BY doc_id),
    I AS (SELECT a.doc_id AS li, b.doc_id AS ri, COUNT(*) AS inter
          FROM EXL a JOIN EXR b ON a.g = b.g GROUP BY 1, 2)
    SELECT li AS left_id, ri AS right_id,
           CAST(inter AS BIGINT) AS inter,
           CAST(sa.sz + sb.sz - inter AS BIGINT) AS union_n
    FROM I JOIN SZL sa ON sa.doc_id = li JOIN SZR sb ON sb.doc_id = ri
    WHERE inter * 3 >= sa.sz + sb.sz
"""


def q_token_concentration(sf_dir: str):
    """Per-doc token-concentration (Simpson collision) signals —
    integer-exact repetition heaviness (ops/text.py:token_concentration)."""
    from .ops.text import token_concentration
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        token_concentration, batch_format="pyarrow")


QUERIES["token_concentration"] = q_token_concentration

ORACLE_SQL["token_concentration"] = f"""
    WITH T AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
    C AS (SELECT doc_id, tk, CAST(COUNT(*) AS BIGINT) AS c
          FROM (SELECT doc_id, unnest(t) AS tk FROM T)
          GROUP BY doc_id, tk),
    A AS (SELECT doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_distinct_tokens,
                 CAST(SUM(c * (c - 1)) AS BIGINT) AS simpson_num
          FROM C GROUP BY doc_id)
    SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
           COALESCE(a.n_distinct_tokens, 0) AS n_distinct_tokens,
           COALESCE(a.simpson_num, 0) AS simpson_num
    FROM T t LEFT JOIN A a USING (doc_id)
"""


def q_trending_daily(sf_dir: str):
    """Trending report: top-2 event types per day by count (per-batch
    (day, type) partials → narrow groupby → pruned top-k-per-group
    exchange — raw events never shuffle)."""
    from ray.data.aggregate import Sum
    from .ops.asof import top_k_per_group

    def partial(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("ts")))
        day = pc.floor_temporal(b.column("ts"), unit="day")
        g = pa.table({"day": day, "event_type": b.column("event_type")}) \
            .group_by(["day", "event_type"]).aggregate([([], "count_all")])
        return pa.table({"day": g.column("day"),
                         "event_type": g.column("event_type"),
                         "p": pc.cast(g.column("count_all"), pa.int64())})

    counts = _events(sf_dir, ["event_type", "ts"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["day", "event_type"]).aggregate(Sum("p", alias_name="n"))
    return top_k_per_group(counts, "day", "n", k=2, descending=True,
                           tiebreak="event_type")


QUERIES["trending_daily"] = q_trending_daily

ORACLE_SQL["trending_daily"] = """
    WITH c AS (SELECT date_trunc('day', ts) AS day, event_type,
                      CAST(COUNT(*) AS BIGINT) AS n
               FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
    r AS (SELECT day, event_type, n,
                 CAST(ROW_NUMBER() OVER (
                     PARTITION BY day
                     ORDER BY n DESC, event_type) AS BIGINT) AS "rank"
          FROM c)
    SELECT day, event_type, n, "rank" FROM r WHERE "rank" <= 2
"""


def q_source_dup_stats(sf_dir: str):
    """Crawl-ops duplication report per source: total docs vs distinct
    texts (per-batch (source, hash) partials pre-aggregate; the shuffle
    carries hashes, never text)."""
    import hashlib
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        from .ops.hashutil import bytes_list
        h = [hashlib.md5(v).hexdigest()
             for v in bytes_list(b.column("text"))]
        t = pa.table({"source": b.column("source"),
                      "h": pa.array(h, type=pa.string())})
        g = t.group_by(["source", "h"]).aggregate([([], "count_all")])
        return pa.table({"source": g.column("source"),
                         "h": g.column("h"),
                         "p": pc.cast(g.column("count_all"), pa.int64())})

    per_hash = _docs(sf_dir, ["source", "text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby(["source", "h"]).aggregate(Sum("p", alias_name="n"))

    def roll(b: pa.Table) -> pa.Table:
        g = pa.table({"source": b.column("source"),
                      "n": b.column("n")}) \
            .group_by(["source"]) \
            .aggregate([("n", "sum"), ([], "count_all")])
        return pa.table({"source": g.column("source"),
                         "pd_": pc.cast(g.column("n_sum"), pa.int64()),
                         "pu_": pc.cast(g.column("count_all"), pa.int64())})

    out = per_hash.map_batches(roll, batch_format="pyarrow") \
        .groupby("source").aggregate(Sum("pd_", alias_name="n_docs"),
                                     Sum("pu_", alias_name="n_distinct"))
    return out


QUERIES["source_dup_stats"] = q_source_dup_stats

ORACLE_SQL["source_dup_stats"] = """
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT text) AS BIGINT) AS n_distinct
    FROM documents GROUP BY source
"""


def q_debounce(sf_dir: str):
    """Per-(user, event_type) throttle: drop events within 2h of the
    previous same-typed event for that user (LAG semantics) — the
    retry-storm / duplicate-send collapse pass. One narrow user-keyed
    exchange, vectorized lexsort + adjacent-diff per partition."""
    from .ops.windows import debounce
    return debounce(_events(sf_dir, ["event_id", "user_id", "event_type",
                                     "ts"]), min_gap_sec=7200)


QUERIES["debounce"] = q_debounce

ORACLE_SQL["debounce"] = """
    WITH x AS (
        SELECT event_id, user_id, event_type, ts,
               LAG(ts) OVER (PARTITION BY user_id, event_type
                             ORDER BY ts, event_id) AS prev_ts
        FROM events WHERE ts IS NOT NULL)
    SELECT event_id, user_id, event_type, ts FROM x
    WHERE prev_ts IS NULL OR ts - prev_ts > INTERVAL 7200 SECOND
"""


def q_kmv_overlap(sf_dir: str):
    """Pairwise distinct-user overlap between event types via KMV
    sketches (k=64): per-batch k-min partials pre-aggregate, one tiny
    group-keyed sketch merge, pairwise finalize over <= groups x k
    rows. Deterministic md5 hashing makes the estimator itself (not
    just the true sets) SQL-reproducible."""
    from .ops.sketch import kmv_overlap
    return kmv_overlap(_events(sf_dir, ["event_type", "user_id"]),
                       "event_type", "user_id", k=64)


QUERIES["kmv_overlap"] = q_kmv_overlap

# the same sketch derivation in SQL: per-group 64 smallest distinct
# md5-60bit hashes; per pair, the 64 smallest of the union, counting
# members present in both sketches; ppm = floor-division
ORACLE_SQL["kmv_overlap"] = """
    WITH h AS (
        SELECT DISTINCT event_type AS g,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS h
        FROM events WHERE user_id IS NOT NULL),
    r AS (SELECT g, h,
                 ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rn
          FROM h),
    sk AS (SELECT g, h FROM r WHERE rn <= 64),
    gs AS (SELECT DISTINCT g FROM sk),
    p AS (SELECT a.g AS grp_a, b.g AS grp_b
          FROM gs a JOIN gs b ON a.g < b.g),
    u AS (SELECT p.grp_a, p.grp_b, s.h
          FROM p JOIN sk s ON s.g = p.grp_a OR s.g = p.grp_b
          GROUP BY p.grp_a, p.grp_b, s.h),
    ur AS (SELECT grp_a, grp_b, h,
                  ROW_NUMBER() OVER (PARTITION BY grp_a, grp_b
                                     ORDER BY h) AS rn
           FROM u),
    km AS (SELECT grp_a, grp_b, h FROM ur WHERE rn <= 64)
    SELECT km.grp_a, km.grp_b,
           CAST(COUNT(*) AS BIGINT) AS n_union,
           CAST(COUNT(sa.h) FILTER (sb.h IS NOT NULL) AS BIGINT)
               AS n_inter,
           CAST((COUNT(sa.h) FILTER (sb.h IS NOT NULL) * 1000000)
                // COUNT(*) AS BIGINT) AS jaccard_ppm
    FROM km
    LEFT JOIN sk sa ON sa.g = km.grp_a AND sa.h = km.h
    LEFT JOIN sk sb ON sb.g = km.grp_b AND sb.h = km.h
    GROUP BY km.grp_a, km.grp_b
"""


def q_mirror_clusters(sf_dir: str):
    """Mirror-farm detection: sources serving >= 2 byte-identical docs
    cluster together (connected components, min-source label). Every
    4th doc gets a copy attributed to a synthetic mirror source
    ('mirror' || doc_id%3) so cross-source duplication exists to find.
    Corpus-sized work is one narrow (hash, source) exchange; the edge
    list and union-find are O(|sources|^2)-bounded."""
    from .ops.dedup import mirror_clusters

    def aug(b: pa.Table) -> pa.Table:
        b = b.combine_chunks()
        ids = pc.cast(b.column("doc_id"), pa.int64())
        keep = pc.equal(pc.subtract(ids, pc.multiply(
            pc.divide(ids, 4), 4)), 0)
        if isinstance(keep, pa.ChunkedArray):
            keep = keep.combine_chunks()
        m3 = pc.cast(pc.subtract(ids, pc.multiply(
            pc.divide(ids, 3), 3)), pa.string())
        msrc = pc.binary_join_element_wise(
            pa.scalar("mirror"), m3, "").filter(keep)
        text = b.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        src = b.column("source")
        if isinstance(src, pa.ChunkedArray):
            src = src.combine_chunks()
        return pa.table({
            "source": pa.concat_arrays([src, msrc.combine_chunks()
                                        if isinstance(msrc, pa.ChunkedArray)
                                        else msrc]),
            "text": pa.concat_arrays([text, text.filter(keep)])})

    docs = _docs(sf_dir, ["doc_id", "text", "source"]) \
        .map_batches(aug, batch_format="pyarrow")
    return mirror_clusters(docs, min_shared=2)


QUERIES["mirror_clusters"] = q_mirror_clusters

# same augmentation, pair counts over distinct (md5, source), edges at
# n >= 2, components via reachability closure, min-member label;
# singleton sources label themselves
ORACLE_SQL["mirror_clusters"] = """
    WITH RECURSIVE U AS (
        SELECT source, text FROM documents
        UNION ALL
        SELECT 'mirror' || CAST(doc_id % 3 AS VARCHAR), text
        FROM documents WHERE doc_id % 4 = 0),
    hs AS (SELECT DISTINCT md5(text) AS h, source FROM U),
    e0 AS (SELECT a.source AS sa, b.source AS sb
           FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
           GROUP BY 1, 2 HAVING COUNT(*) >= 2),
    E AS (SELECT sa AS src, sb AS dst FROM e0
          UNION ALL SELECT sb, sa FROM e0),
    W(node, reach) AS (
        SELECT src, src FROM E
        UNION
        SELECT w.node, e.dst FROM W w JOIN E e ON w.reach = e.src),
    comp AS (SELECT node, MIN(reach) AS cluster FROM W GROUP BY node)
    SELECT s.source, COALESCE(c.cluster, s.source) AS cluster
    FROM (SELECT DISTINCT source FROM U) s
    LEFT JOIN comp c ON c.node = s.source
"""


def q_kcore_sim(sf_dir: str):
    """2-core of the SimHash near-dup graph after <=4 peel rounds:
    cliquish template-farm cores survive, chains and stars peel away.
    Edges partition once; each round exchanges pre-summed (dst, count)
    rows only."""
    from .ops.dedup import simhash_dups
    from .ops.graph import kcore

    docs = _docs(sf_dir, ["doc_id", "text"])
    return kcore(simhash_dups(docs, max_hamming=12), k=2, rounds=4)


QUERIES["kcore_sim"] = q_kcore_sim

# the simhash_dups pair derivation, then 4 unrolled peel rounds:
# a_{i+1} = nodes of a_i with >= 2 neighbours inside a_i; output the
# survivors with their within-core degree (early stop in the engine is
# a no-op once stable, so fixed-round SQL matches)
_KC_ROUND = """,
    a{i1} AS (SELECT e.src AS id FROM E e
             JOIN a{i} s ON e.src = s.id JOIN a{i} t ON e.dst = t.id
             GROUP BY e.src HAVING COUNT(*) >= 2)"""

ORACLE_SQL["kcore_sim"] = f"""
    WITH tc AS (
        SELECT doc_id, tk, CAST(COUNT(*) AS BIGINT) AS w
        FROM (SELECT doc_id, unnest({_TOKENS}) AS tk FROM documents)
        GROUP BY doc_id, tk),
    th AS (SELECT doc_id,
                  CAST(('0x' || substr(md5(tk), 1, 15)) AS BIGINT) AS h,
                  w
           FROM tc),
    bits AS (
        SELECT doc_id, b,
               SUM(CASE WHEN ((h >> b) & 1) = 1 THEN w ELSE -w END) AS s
        FROM th, (SELECT unnest(range(0, 60)) AS b)
        GROUP BY doc_id, b),
    agg AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << b)
                             ELSE 0 END) AS BIGINT) AS simhash
        FROM bits GROUP BY doc_id),
    S AS (SELECT d.doc_id,
                 COALESCE(a.simhash, 0) AS simhash,
                 COALESCE(a.simhash, 0) >> 44 AS bkt
          FROM documents d LEFT JOIN agg a USING (doc_id)),
    P AS (SELECT a.doc_id AS ia, b.doc_id AS ib
          FROM S a JOIN S b
            ON a.bkt = b.bkt AND a.doc_id < b.doc_id
          WHERE bit_count(xor(a.simhash, b.simhash)) <= 12),
    E AS (SELECT ia AS src, ib AS dst FROM P
          UNION ALL SELECT ib, ia FROM P),
    a0 AS (SELECT DISTINCT src AS id FROM E)""" + "".join(
    _KC_ROUND.format(i=i, i1=i + 1) for i in range(4)) + """
    SELECT e.src AS node_id, CAST(COUNT(*) AS BIGINT) AS core_deg
    FROM E e JOIN a4 s ON e.src = s.id JOIN a4 t ON e.dst = t.id
    GROUP BY e.src
"""


def q_typo_pairs(sf_dir: str):
    """Typo-candidate pairs at edit distance 1 over the corpus
    vocabulary (plus injected second-char-deletion typos of the >=900
    count head tokens, so the normalizer has something to find).
    SymSpell deletion-neighborhood blocking: one variant-keyed
    exchange; verification is the exact vectorized one-edit-away
    rule."""
    from ray.data.aggregate import Sum

    from .ops.text import edit1_pairs

    def partial(b: pa.Table) -> pa.Table:
        from .ops.text import _token_lists
        toks = _token_lists(b.column("text"))
        t = pa.table({"token": toks.flatten()})
        g = t.group_by(["token"]).aggregate([([], "count_all")])
        return pa.table({"token": g.column("token"),
                         "p": pc.cast(g.column("count_all"), pa.int64())})

    counts = _docs(sf_dir, ["text"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("token").aggregate(Sum("p", alias_name="n"))

    def aug(b: pa.Table) -> pa.Table:
        b = b.combine_chunks()
        tok = b.column("token")
        if isinstance(tok, pa.ChunkedArray):
            tok = tok.combine_chunks()
        head = pc.and_(pc.greater_equal(b.column("n"), 900),
                       pc.greater_equal(pc.utf8_length(tok), 4))
        if isinstance(head, pa.ChunkedArray):
            head = head.combine_chunks()
        typo = pc.binary_join_element_wise(
            pc.utf8_slice_codeunits(tok.filter(head), 0, 1),
            pc.utf8_slice_codeunits(tok.filter(head), 2, 1 << 30), "")
        if isinstance(typo, pa.ChunkedArray):
            typo = typo.combine_chunks()
        return pa.table({"token": pa.concat_arrays([tok, typo])})

    vocab = counts.map_batches(aug, batch_format="pyarrow")
    return edit1_pairs(vocab, num_parts=8)


QUERIES["typo_pairs"] = q_typo_pairs

# brute-force levenshtein over the same vocabulary union (tiny at gate
# scale; the engine's blocking is the part under test)
ORACLE_SQL["typo_pairs"] = f"""
    WITH t AS (SELECT unnest({_TOKENS}) AS tk FROM documents),
    c AS (SELECT tk, CAST(COUNT(*) AS BIGINT) AS n FROM t GROUP BY tk),
    v AS (SELECT tk FROM c
          UNION
          SELECT substr(tk, 1, 1) || substr(tk, 3) FROM c
          WHERE n >= 900 AND len(tk) >= 4)
    SELECT a.tk AS token_a, b.tk AS token_b
    FROM v a JOIN v b ON a.tk < b.tk
    WHERE abs(len(a.tk) - len(b.tk)) <= 1
      AND levenshtein(a.tk, b.tk) <= 1
"""


def q_novelty_scores(sf_dir: str):
    """Per-doc 4-gram novelty (distinct shingles with corpus df == 1):
    the originality / memorization-risk signal. One narrow
    (hash, doc) exchange; df is partition-local by construction."""
    from .ops.curation import novelty_scores
    return novelty_scores(_docs(sf_dir, ["doc_id", "text"]), window=4)


QUERIES["novelty_scores"] = q_novelty_scores

# same shingle convention as the minhash family: 0 tokens → [''],
# < 4 tokens → the whole joined doc, else every 4-token window
ORACLE_SQL["novelty_scores"] = f"""
    WITH T AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
    SH AS (SELECT doc_id,
                  list_distinct(CASE
                      WHEN len(t) = 0 THEN ['']
                      WHEN len(t) < 4 THEN [array_to_string(t, ' ')]
                      ELSE list_transform(range(1, len(t) - 2),
                          i -> array_to_string(t[i:i+3], ' '))
                  END) AS s
           FROM T),
    G AS (SELECT doc_id, unnest(s) AS g FROM SH),
    DF AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS df FROM G GROUP BY g)
    SELECT G.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN DF.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_novel
    FROM G JOIN DF USING (g)
    GROUP BY G.doc_id
"""


def q_cohort_retention(sf_dir: str):
    """Retention triangle: users cohorted by first active day, counted
    at each day offset they return. One user-keyed exchange; only
    (cohort, offset) count partials shuffle to the final groupby."""
    from .ops.windows import cohort_retention
    return cohort_retention(_events(sf_dir, ["user_id", "ts"]))


QUERIES["cohort_retention"] = q_cohort_retention

ORACLE_SQL["cohort_retention"] = """
    WITH e AS (SELECT user_id, date_trunc('day', ts) AS day
               FROM events WHERE ts IS NOT NULL),
    f AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id),
    d AS (SELECT DISTINCT e.user_id, f.cohort_day,
                 date_diff('day', f.cohort_day, e.day) AS day_offset
          FROM e JOIN f USING (user_id))
    SELECT cohort_day, CAST(day_offset AS BIGINT) AS day_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM d GROUP BY cohort_day, day_offset
"""


def q_markov_transitions(sf_dir: str):
    """First-order Markov user-path model: transition counts + exact
    integer ppm probabilities per source event type."""
    from .ops.windows import markov_transitions
    return markov_transitions(
        _events(sf_dir, ["event_id", "user_id", "event_type", "ts"]))


QUERIES["markov_transitions"] = q_markov_transitions

ORACLE_SQL["markov_transitions"] = """
    WITH e AS (SELECT user_id, ts, event_id, event_type,
                      LEAD(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                          AS nxt
               FROM events WHERE ts IS NOT NULL),
    c AS (SELECT event_type AS ev_from, nxt AS ev_to,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM e WHERE nxt IS NOT NULL GROUP BY 1, 2),
    t AS (SELECT ev_from, CAST(SUM(n) AS BIGINT) AS n_from
          FROM c GROUP BY ev_from)
    SELECT c.ev_from, c.ev_to, c.n, t.n_from,
           CAST((c.n * 1000000) // t.n_from AS BIGINT) AS p_ppm
    FROM c JOIN t USING (ev_from)
"""


def q_value_mad(sf_dir: str):
    """Robust per-type location/scale (median + MAD) for anomaly
    thresholds — element-pick exact, one exchange for both stats."""
    from .ops.stats import group_mad_stats
    return group_mad_stats(_events(sf_dir, ["event_type", "value"]),
                           "event_type", "value")


QUERIES["value_mad"] = q_value_mad

ORACLE_SQL["value_mad"] = """
    WITH f AS (SELECT event_type, value FROM events
               WHERE value IS NOT NULL AND isfinite(value)),
    m AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 quantile_disc(value, 0.5) AS med
          FROM f GROUP BY event_type)
    SELECT f.event_type, ANY_VALUE(m.n) AS n, ANY_VALUE(m.med) AS med,
           quantile_disc(abs(f.value - m.med), 0.5) AS mad
    FROM f JOIN m USING (event_type)
    GROUP BY f.event_type
"""


def q_cluster_size_hist(sf_dir: str):
    """Dup-cluster size distribution (the crawl-health report a dedup
    pass is judged by): member counts per MinHash cluster, then
    clusters per size. Both aggregations shuffle only count partials."""
    from ray.data.aggregate import Sum

    def csize(b: pa.Table) -> pa.Table:
        g = b.select(["cluster_id"]).group_by(["cluster_id"]).aggregate(
            [([], "count_all")])
        return pa.table({"cluster_id": g.column("cluster_id"),
                         "p": pc.cast(g.column("count_all"), pa.int64())})

    sizes = q_minhash_clusters(sf_dir) \
        .map_batches(csize, batch_format="pyarrow") \
        .groupby("cluster_id").aggregate(Sum("p", alias_name="sz"))

    def hist(b: pa.Table) -> pa.Table:
        g = b.select(["sz"]).group_by(["sz"]).aggregate(
            [([], "count_all")])
        return pa.table({"cluster_size": g.column("sz"),
                         "hp": pc.cast(g.column("count_all"), pa.int64())})

    return sizes.map_batches(hist, batch_format="pyarrow") \
        .groupby("cluster_size").aggregate(Sum("hp",
                                               alias_name="n_clusters"))


QUERIES["cluster_size_hist"] = q_cluster_size_hist

ORACLE_SQL["cluster_size_hist"] = f"""
    SELECT sz AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
    FROM (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS sz
          FROM ({ORACLE_SQL["minhash_clusters"]}) GROUP BY cluster_id)
    GROUP BY sz
"""


def q_langid_confusion(sf_dir: str):
    """Language-ID quality report: confusion matrix of predicted vs
    labeled language with per-cell counts — the acceptance gate before
    trusting the classifier for routing. LangId actor pool + per-batch
    (label, pred) count partials; one tiny groupby."""
    from ray.data.aggregate import Sum

    from .ops.text import LangIdStage

    preds = _docs(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        LangIdStage, batch_format="pyarrow", concurrency=actor_pool())

    def partial(b: pa.Table) -> pa.Table:
        g = b.select(["lang", "lang_pred"]) \
            .group_by(["lang", "lang_pred"]).aggregate([([], "count_all")])
        return pa.table({"lang": g.column("lang"),
                         "lang_pred": g.column("lang_pred"),
                         "p": pc.cast(g.column("count_all"), pa.int64())})

    return preds.map_batches(partial, batch_format="pyarrow") \
        .groupby(["lang", "lang_pred"]).aggregate(Sum("p", alias_name="n"))


QUERIES["langid_confusion"] = q_langid_confusion

ORACLE_SQL["langid_confusion"] = f"""
    SELECT d.lang, p.lang_pred, CAST(COUNT(*) AS BIGINT) AS n
    FROM documents d JOIN ({ORACLE_SQL["langid"]}) p USING (doc_id)
    GROUP BY d.lang, p.lang_pred
"""


def q_hourly_approx_users(sf_dir: str):
    """Windowed cardinality sketch: approximate distinct users per hour
    (deterministic-integer HLL, p=5) — the bounded-memory form of
    hourly_users when the key space is too large to count exactly.
    Register partials merge by MAX; no raw user ids cross the shuffle
    after the per-batch partial."""
    from .ops.sketch import approx_distinct

    def hourly(b: pa.Table) -> pa.Table:
        b = b.filter(pc.is_valid(b.column("ts")))
        return pa.table({
            "hour": pc.floor_temporal(
                pc.cast(b.column("ts"), pa.timestamp("us")), unit="hour"),
            "user_id": b.column("user_id")})

    ds = _events(sf_dir, ["user_id", "ts"]).map_batches(
        hourly, batch_format="pyarrow")
    out = approx_distinct(ds, "hour", "user_id", p=5, estimator="int")
    return out


QUERIES["hourly_approx_users"] = q_hourly_approx_users

ORACLE_SQL["hourly_approx_users"] = """
    WITH h AS (
        SELECT DISTINCT date_trunc('hour', ts) AS hour,
               CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
                    AS BIGINT) AS h
        FROM events WHERE ts IS NOT NULL),
    r AS (SELECT hour, h >> 55 AS idx,
                 CASE WHEN (h & ((1::BIGINT << 55) - 1)) = 0 THEN 56
                      ELSE 56 - length(bin(h & ((1::BIGINT << 55) - 1)))
                 END AS rho
          FROM h),
    reg AS (SELECT hour, idx, MAX(rho) AS rho
            FROM r GROUP BY hour, idx),
    s AS (SELECT hour,
                 (32 - COUNT(*)) * (1::BIGINT << 56)
                     + SUM(1::BIGINT << (56 - rho)) AS sp
          FROM reg GROUP BY hour)
    SELECT hour, CAST((697::HUGEINT * 32 * 32 * (1::HUGEINT << 56))
                      // (1000 * sp) AS BIGINT) AS n_approx
    FROM s
"""


def q_keyword_search(sf_dir: str):
    """Integer-idf keyword search: top-20 docs for a fixed bag-of-terms
    query, score = sum tf * (10^6 // df) — exact int64, no float
    summation drift. Two streaming passes (df, then score+local
    top-k); no global sort."""
    from .ops.text import keyword_search
    return keyword_search(_docs(sf_dir, ["doc_id", "text"]),
                          ["join", "hash", "customer", "slow"], k=20)


QUERIES["keyword_search"] = q_keyword_search

ORACLE_SQL["keyword_search"] = f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKENS}) AS tk FROM documents),
    q AS (SELECT tk FROM (VALUES ('join'), ('hash'), ('customer'),
                                 ('slow')) v(tk)),
    tf AS (SELECT doc_id, tk, CAST(COUNT(*) AS BIGINT) AS c
           FROM tok WHERE tk IN (SELECT tk FROM q) GROUP BY 1, 2),
    df AS (SELECT tk, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
           FROM tok WHERE tk IN (SELECT tk FROM q) GROUP BY tk)
    SELECT tf.doc_id,
           CAST(SUM(tf.c * (1000000 // df.df)) AS BIGINT) AS score
    FROM tf JOIN df USING (tk)
    GROUP BY tf.doc_id
    ORDER BY score DESC, tf.doc_id ASC LIMIT 20
"""


def q_mad_outliers(sf_dir: str):
    """Robust anomaly counts: events with |value - median| > 3 * MAD
    per type — the two-pass broadcast-back pattern (tiny per-group
    stats ride into a streaming second pass; raw values never shuffle
    twice)."""
    from ray.data.aggregate import Sum

    from .ops.stats import group_mad_stats

    stats = group_mad_stats(_events(sf_dir, ["event_type", "value"]),
                            "event_type", "value").to_pandas()
    med = dict(zip(stats["event_type"], stats["med"]))
    mad = dict(zip(stats["event_type"], stats["mad"]))
    types = sorted(med)
    tset = pa.array(types, type=pa.string())
    med_arr = np.array([med[t] for t in types], dtype=np.float64)
    mad_arr = np.array([mad[t] for t in types], dtype=np.float64)

    def partial(b: pa.Table) -> pa.Table:
        v = b.column("value")
        fin = pc.and_kleene(pc.is_valid(v), pc.is_finite(v))
        t = b.filter(pc.fill_null(fin, False))
        if t.num_rows == 0:
            return pa.table({"event_type": pa.array([], type=pa.string()),
                             "o": pa.array([], type=pa.int64()),
                             "t": pa.array([], type=pa.int64())})
        ti = np.asarray(pc.fill_null(pc.index_in(
            t.column("event_type"), value_set=tset), -1)
            .to_numpy(zero_copy_only=False), dtype=np.int64)
        vals = np.asarray(t.column("value").to_numpy(
            zero_copy_only=False), dtype=np.float64)
        out = np.abs(vals - med_arr[ti]) > 3.0 * mad_arr[ti]
        n_out = np.zeros(len(types), dtype=np.int64)
        n_tot = np.zeros(len(types), dtype=np.int64)
        np.add.at(n_tot, ti, 1)
        np.add.at(n_out, ti, out.astype(np.int64))
        nz = n_tot > 0
        return pa.table({
            "event_type": tset.filter(pa.array(nz)),
            "o": pa.array(n_out[nz], type=pa.int64()),
            "t": pa.array(n_tot[nz], type=pa.int64())})

    return _events(sf_dir, ["event_type", "value"]) \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("event_type").aggregate(
            Sum("o", alias_name="n_outliers"),
            Sum("t", alias_name="n_total"))


QUERIES["mad_outliers"] = q_mad_outliers

ORACLE_SQL["mad_outliers"] = """
    WITH f AS (SELECT event_type, value FROM events
               WHERE value IS NOT NULL AND isfinite(value)),
    m AS (SELECT event_type, quantile_disc(value, 0.5) AS med
          FROM f GROUP BY event_type),
    m2 AS (SELECT f.event_type, ANY_VALUE(m.med) AS med,
                  quantile_disc(abs(f.value - m.med), 0.5) AS mad
           FROM f JOIN m USING (event_type) GROUP BY f.event_type)
    SELECT f.event_type,
           CAST(SUM(CASE WHEN abs(f.value - m2.med) > 3.0 * m2.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(COUNT(*) AS BIGINT) AS n_total
    FROM f JOIN m2 USING (event_type)
    GROUP BY f.event_type
"""


def q_assign_sessions(sf_dir: str):
    """Per-event session numbers (1800s gap, sessionize's rule) — the
    enrichment join key for session-level features."""
    from .ops.windows import assign_sessions
    return assign_sessions(_events(sf_dir, ["event_id", "user_id", "ts"]))


QUERIES["assign_sessions"] = q_assign_sessions

ORACLE_SQL["assign_sessions"] = """
    WITH e AS (SELECT event_id, user_id, ts FROM events
               WHERE ts IS NOT NULL),
    x AS (SELECT event_id, user_id, ts,
                 CASE WHEN LAG(ts) OVER w IS NULL
                           OR ts - LAG(ts) OVER w > INTERVAL 1800 SECOND
                      THEN 1 ELSE 0 END AS brk
          FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT event_id, user_id,
           CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_no
    FROM x
"""


def q_cluster_top_terms(sf_dir: str):
    """Cluster labeling: the top-3 tokens by total count across each
    MinHash dup-cluster's members (count desc, token asc) — the
    human-readable tag for a dedup report. Composition: exploded
    per-doc token counts hash-JOIN the cluster map on doc_id (both
    sides corpus-sized), (cluster, token) partial sums, then the
    pruned top-k-per-group exchange."""
    from ray.data.aggregate import Sum

    from .ops.asof import top_k_per_group
    from .ops.join import hash_join

    def tok_counts(b: pa.Table) -> pa.Table:
        from .ops.text import _token_lists
        toks = _token_lists(b.column("text"))
        n = len(b)
        counts = np.diff(np.asarray(toks.offsets, dtype=np.int64))
        ids = np.repeat(
            np.asarray(pc.cast(b.column("doc_id"), pa.int64())
                       .to_numpy(zero_copy_only=False), dtype=np.int64),
            counts)
        t = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                      "token": pc.list_flatten(toks)})
        g = t.group_by(["doc_id", "token"]).aggregate([([], "count_all")])
        return pa.table({"doc_id": g.column("doc_id"),
                         "token": g.column("token"),
                         "c": pc.cast(g.column("count_all"), pa.int64())})

    toks = _docs(sf_dir, ["doc_id", "text"]).map_batches(
        tok_counts, batch_format="pyarrow")
    joined = hash_join(q_minhash_clusters(sf_dir), toks,
                       "doc_id", "doc_id",
                       left_cols=["doc_id", "cluster_id"],
                       right_cols=["doc_id", "token", "c"])
    per_ct = joined.map_batches(
        lambda b: pa.table({
            "cluster_id": b.column("cluster_id"),
            "token": b.column("token"),
            "c": b.column("c")}).group_by(["cluster_id", "token"])
        .aggregate([("c", "sum")]).rename_columns(
            ["cluster_id", "token", "p"]),
        batch_format="pyarrow") \
        .groupby(["cluster_id", "token"]).aggregate(Sum("p",
                                                        alias_name="n"))
    return top_k_per_group(per_ct, "cluster_id", "n", k=3,
                           descending=True, tiebreak="token")


QUERIES["cluster_top_terms"] = q_cluster_top_terms

ORACLE_SQL["cluster_top_terms"] = f"""
    WITH C AS ({ORACLE_SQL["minhash_clusters"]}),
    tc AS (SELECT doc_id, tk AS token, CAST(COUNT(*) AS BIGINT) AS c
           FROM (SELECT doc_id, unnest({_TOKENS}) AS tk FROM documents)
           GROUP BY doc_id, tk),
    ct AS (SELECT C.cluster_id, tc.token,
                  CAST(SUM(tc.c) AS BIGINT) AS n
           FROM C JOIN tc USING (doc_id)
           GROUP BY C.cluster_id, tc.token),
    r AS (SELECT cluster_id, token, n,
                 CAST(ROW_NUMBER() OVER (PARTITION BY cluster_id
                                         ORDER BY n DESC, token ASC)
                      AS BIGINT) AS "rank"
          FROM ct)
    SELECT cluster_id, token, n, "rank" FROM r WHERE "rank" <= 3
"""


def q_vec_quantize(sf_dir: str):
    """Scalar int8 quantization of the embeddings table (exploded
    (vec_id, dim, code) rows): corpus per-dim min/max partials, then a
    streaming code pass — float32 → 1 byte/dim before indexing."""
    import ray.data as rd

    from .ops.similarity import quantize_embeddings
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    return quantize_embeddings(emb, levels=255)


QUERIES["vec_quantize"] = q_vec_quantize

# identical expression shape: ((v - mn) * 255) / (mx - mn), floor,
# clamp, constant dims -> 0; dims 1-based
ORACLE_SQL["vec_quantize"] = """
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
               FROM embeddings),
    x AS (SELECT vec_id, CAST(i AS BIGINT) AS dim, emb[i] AS v
          FROM e, LATERAL (SELECT unnest(range(1, len(emb) + 1)) AS i)),
    mm AS (SELECT dim, MIN(v) AS mn, MAX(v) AS mx FROM x GROUP BY dim)
    SELECT x.vec_id, x.dim,
           CAST(CASE WHEN mm.mx > mm.mn THEN
                    least(greatest(floor((x.v - mm.mn) * 255.0
                                         / (mm.mx - mm.mn)), 0), 255)
                ELSE 0 END AS BIGINT) AS code
    FROM x JOIN mm USING (dim)
"""


def q_bm25_search(sf_dir: str):
    """Fixed-point integer BM25 (k1=1.2, b=0.75 as exact floor-division
    arithmetic): top-20 docs for the same bag-of-terms query as
    keyword_search, now with tf saturation + length normalization.
    Two streaming passes; no global sort."""
    from .ops.text import bm25_search
    return bm25_search(_docs(sf_dir, ["doc_id", "text"]),
                       ["join", "hash", "customer", "slow"], k=20)


QUERIES["bm25_search"] = q_bm25_search

# identical fixed-point shape: idf = 10^6 // df, norm = len*1000 //
# max(avgdl, 1), per-term floor-divided saturation, integer sum
ORACLE_SQL["bm25_search"] = f"""
    WITH tok AS (SELECT doc_id, unnest({_TOKENS}) AS tk FROM documents),
    dl AS (SELECT doc_id, CAST(len({_TOKENS}) AS BIGINT) AS dl
           FROM documents),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(dl) AS BIGINT) AS tot_len FROM dl),
    q AS (SELECT tk FROM (VALUES ('join'), ('hash'), ('customer'),
                                 ('slow')) v(tk)),
    tf AS (SELECT doc_id, tk, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok WHERE tk IN (SELECT tk FROM q) GROUP BY 1, 2),
    df AS (SELECT tk, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
           FROM tok WHERE tk IN (SELECT tk FROM q) GROUP BY tk),
    s AS (SELECT tf.doc_id,
                 SUM((22000 * (1000000 // df.df) * tf.tf) //
                     (10000 * tf.tf + 3000 +
                      9 * ((dl.dl * 1000) //
                           GREATEST(tot.tot_len // tot.n_docs, 1))))
                     AS score
          FROM tf JOIN df USING (tk) JOIN dl USING (doc_id)
          CROSS JOIN tot
          GROUP BY tf.doc_id)
    SELECT doc_id, CAST(score AS BIGINT) AS score FROM s
    WHERE score > 0 ORDER BY score DESC, doc_id ASC LIMIT 20
"""


def q_token_budget_sample(sf_dir: str):
    """Deterministic 2000-tokens-per-language sample: docs taken in
    md5(doc_id) order per lang until the budget is exhausted (the
    crossing doc kept) — the 'N training tokens per domain' primitive."""
    from .ops.curation import token_budget_sample
    return token_budget_sample(
        _docs(sf_dir, ["doc_id", "lang", "text"]), budget=2000,
        group_col="lang")


QUERIES["token_budget_sample"] = q_token_budget_sample

ORACLE_SQL["token_budget_sample"] = f"""
    WITH L AS (SELECT lang, doc_id,
                      CAST(len({_TOKENS}) AS BIGINT) AS n_tokens
               FROM documents),
    O AS (SELECT lang, doc_id, n_tokens,
                 CAST(COALESCE(SUM(n_tokens) OVER (
                     PARTITION BY lang
                     ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                     0) AS BIGINT) AS cum_before
          FROM L)
    SELECT doc_id, lang, n_tokens, cum_before FROM O
    WHERE cum_before < 2000
"""


def _multiline(b: pa.Table) -> pa.Table:
    """Deterministic multi-line view of documents (the corpus has no
    newlines): lines of 8 tokens joined by \\n, plus a REPEAT of the
    first line appended for even doc_ids — the planted intra-doc dup."""
    from .ops.text import _token_lists
    toks = _token_lists(b.column("text"))
    counts = np.diff(np.asarray(toks.offsets, dtype=np.int64))
    max_lines = int((counts.max() + 7) // 8) if len(counts) else 0
    body = pc.binary_join(pc.list_slice(toks, 0, 8), " ")
    for j in range(1, max_lines):
        line = pc.binary_join(pc.list_slice(toks, 8 * j, 8 * j + 8), " ")
        has = pa.array(counts > 8 * j)
        body = pc.if_else(has, pc.binary_join_element_wise(
            body, line, "\n"), body)
    first = pc.binary_join(pc.list_slice(toks, 0, 8), " ")
    even = pc.equal(pc.bit_wise_and(b.column("doc_id"), 1), 0)
    body = pc.if_else(even, pc.binary_join_element_wise(
        body, first, "\n"), body)
    return pa.table({"doc_id": pc.cast(b.column("doc_id"), pa.int64()),
                     "text": body})


def q_dedup_lines(sf_dir: str):
    """Intra-doc repeated-line removal over a deterministic multi-line
    corpus view (even doc_ids carry a planted duplicate of their first
    line): first occurrence kept in order, per-doc drop counts."""
    from .ops.normalize import dedup_lines_within_doc
    return _docs(sf_dir, ["doc_id", "text"]) \
        .map_batches(_multiline, batch_format="pyarrow") \
        .map_batches(dedup_lines_within_doc, batch_format="pyarrow")


QUERIES["dedup_lines"] = q_dedup_lines

ORACLE_SQL["dedup_lines"] = f"""
    WITH T AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
    M AS (SELECT doc_id,
                 CASE WHEN doc_id % 2 = 0 THEN
                     array_to_string(list_transform(
                         range(1, len(t) + 1, 8),
                         i -> array_to_string(t[i:i+7], ' ')), chr(10))
                     || chr(10) || array_to_string(t[1:8], ' ')
                 ELSE
                     array_to_string(list_transform(
                         range(1, len(t) + 1, 8),
                         i -> array_to_string(t[i:i+7], ' ')), chr(10))
                 END AS txt
          FROM T),
    S AS (SELECT doc_id, string_split(txt, chr(10)) AS ls FROM M),
    L AS (SELECT doc_id, unnest(ls) AS line,
                 CAST(generate_subscripts(ls, 1) AS BIGINT) AS pos
          FROM S),
    K AS (SELECT doc_id, line, pos,
                 ROW_NUMBER() OVER (PARTITION BY doc_id, line
                                    ORDER BY pos) AS rn
          FROM L)
    SELECT doc_id,
           string_agg(CASE WHEN rn = 1 THEN line END, chr(10)
                      ORDER BY pos) AS text,
           CAST(COUNT(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_dropped
    FROM K GROUP BY doc_id
"""


def q_leakage_safe_split(sf_dir: str):
    """Near-dup-aware train/val split: every doc in a MinHash dup
    cluster splits by its CLUSTER id (min member), singletons by their
    own id — all copies of a near-duplicate land on the same side, so
    the val set never leaks into train. Composition: docs LEFT
    hash-join the cluster map, then a streaming md5-mod label pass."""
    import hashlib

    from .ops.join import hash_join

    joined = hash_join(_docs(sf_dir, ["doc_id"]),
                       q_minhash_clusters(sf_dir), "doc_id", "doc_id",
                       how="left")

    def label(b: pa.Table) -> pa.Table:
        key = pc.coalesce(pc.cast(b.column("cluster_id"), pa.int64()),
                          pc.cast(b.column("doc_id"), pa.int64()))
        ks = key.to_numpy(zero_copy_only=False).tolist()
        mod = np.fromiter(
            (int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) % 100
             for v in ks), dtype=np.int64, count=len(ks))
        return pa.table({
            "doc_id": pc.cast(b.column("doc_id"), pa.int64()),
            "split_key": key,
            "split": pa.array(np.where(mod < 80, "train", "val"))})

    return joined.map_batches(label, batch_format="pyarrow")


QUERIES["leakage_safe_split"] = q_leakage_safe_split

ORACLE_SQL["leakage_safe_split"] = f"""
    WITH C AS ({ORACLE_SQL["minhash_clusters"]}),
    D AS (SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS split_key
          FROM documents d LEFT JOIN C c USING (doc_id))
    SELECT doc_id, CAST(split_key AS BIGINT) AS split_key,
           CASE WHEN CAST(('0x' || substr(md5(CAST(split_key AS VARCHAR)),
                                          1, 8)) AS UBIGINT) % 100 < 80
                THEN 'train' ELSE 'val' END AS split
    FROM D
"""


def q_collocations(sf_dir: str):
    """Top-25 collocations by integer squared-PMI score
    (c_ab² · 10^6 // (c_a · c_b), bigrams with ≥5 occurrences) —
    the phrase-mining signal for tokenizer/vocab curation."""
    from .ops.text import collocation_pairs
    return collocation_pairs(_docs(sf_dir, ["text"]), min_count=5, k=25)


QUERIES["collocations"] = q_collocations

ORACLE_SQL["collocations"] = f"""
    WITH T AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
    tok AS (SELECT doc_id, unnest(t) AS tk,
                   CAST(generate_subscripts(t, 1) AS BIGINT) AS pos
            FROM T),
    bi AS (SELECT tk AS ta,
                  LEAD(tk) OVER (PARTITION BY doc_id ORDER BY pos) AS tb
           FROM tok),
    bc AS (SELECT ta, tb, CAST(COUNT(*) AS BIGINT) AS c_ab
           FROM bi WHERE tb IS NOT NULL
           GROUP BY 1, 2 HAVING COUNT(*) >= 5),
    uni AS (SELECT tk, CAST(COUNT(*) AS BIGINT) AS c FROM tok
            GROUP BY tk)
    SELECT bc.ta AS token_a, bc.tb AS token_b, bc.c_ab,
           CAST((bc.c_ab * bc.c_ab * 1000000) // (ua.c * ub.c)
                AS BIGINT) AS score
    FROM bc JOIN uni ua ON ua.tk = bc.ta
            JOIN uni ub ON ub.tk = bc.tb
    ORDER BY score DESC, token_a ASC, token_b ASC LIMIT 25
"""


def q_pq_codes(sf_dir: str):
    """Product-quantization codes (m=2 subspaces × k=4 codewords, one
    Lloyd update): the compressed per-vector representation an IVF-PQ
    index stores — 4 bits here vs 32 floats."""
    import ray.data as rd

    from .ops.similarity import pq_codes
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    return pq_codes(emb, m=2, k=4, iters=1)


QUERIES["pq_codes"] = q_pq_codes

# same shape as the kmeans oracle, per subspace: id%k init on RAW
# coords, squared-L2 assignment (ties -> lowest code), one update
ORACLE_SQL["pq_codes"] = """
    WITH E AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
                      CAST(generate_subscripts(embedding, 1) AS BIGINT)
                          - 1 AS dim,
                      CAST(len(embedding) AS BIGINT) AS d
               FROM embeddings),
    X AS (SELECT vec_id, v, dim, (dim * 2) // d AS sub FROM E),
    C0 AS (SELECT sub, vec_id % 4 AS c, dim, AVG(v) AS mv
           FROM X GROUP BY 1, 2, 3),
    S1 AS (SELECT x.vec_id, x.sub, c0.c,
                  SUM(power(x.v - c0.mv, 2)) AS d2
           FROM X x JOIN C0 c0 ON c0.sub = x.sub AND c0.dim = x.dim
           GROUP BY 1, 2, 3),
    A1 AS (SELECT vec_id, sub, c FROM (
             SELECT vec_id, sub, c, ROW_NUMBER() OVER (
                 PARTITION BY vec_id, sub ORDER BY d2 ASC, c ASC) AS rn
             FROM S1) WHERE rn = 1),
    C1 AS (SELECT x.sub, a.c, x.dim, AVG(x.v) AS mv
           FROM X x JOIN A1 a ON a.vec_id = x.vec_id AND a.sub = x.sub
           GROUP BY 1, 2, 3),
    S2 AS (SELECT x.vec_id, x.sub, c1.c,
                  SUM(power(x.v - c1.mv, 2)) AS d2
           FROM X x JOIN C1 c1 ON c1.sub = x.sub AND c1.dim = x.dim
           GROUP BY 1, 2, 3)
    SELECT vec_id, CAST(sub AS BIGINT) AS subspace,
           CAST(c AS BIGINT) AS code FROM (
        SELECT vec_id, sub, c, ROW_NUMBER() OVER (
            PARTITION BY vec_id, sub ORDER BY d2 ASC, c ASC) AS rn
        FROM S2) WHERE rn = 1
"""


def q_trailing_outliers(sf_dir: str):
    """Streaming trailing-z-score anomaly flags: events > 3 trailing σ
    from the mean of their user's previous 20 events (≥ 8 required) —
    the integer cross-multiplied test, no float division or sqrt."""
    from .ops.windows import trailing_zscore_outliers
    return trailing_zscore_outliers(
        _events(sf_dir, ["event_id", "user_id", "ts", "value"]),
        window=20, min_n=8, z=3)


QUERIES["trailing_outliers"] = q_trailing_outliers

ORACLE_SQL["trailing_outliers"] = """
    WITH V AS (SELECT event_id, user_id, ts,
                      CAST(floor(value * 1000) AS BIGINT) AS x
               FROM events WHERE ts IS NOT NULL),
    W AS (SELECT event_id, x,
                 CAST(COUNT(*) OVER w AS BIGINT) AS m,
                 CAST(COALESCE(SUM(x) OVER w, 0) AS BIGINT) AS s,
                 CAST(COALESCE(SUM(x * x) OVER w, 0) AS BIGINT) AS ss
          FROM V WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN 20 PRECEDING
                                       AND 1 PRECEDING))
    SELECT event_id, m AS trail_n,
           CAST(CASE WHEN (m * x - s) * (m * x - s)
                          > 9 * (m * ss - s * s)
                     THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
    FROM W WHERE m >= 8
"""


def q_value_ranks_by_type(sf_dir: str):
    """Per-type value rank of every event (RANK() − 1, ties shared) —
    the per-group normalization for quantile binning; pure sort, so
    continuous doubles rank engine-exactly."""
    from .ops.stats import group_value_rank
    return group_value_rank(
        _events(sf_dir, ["event_id", "event_type", "value"]),
        group_col="event_type", val_col="value", id_col="event_id")


QUERIES["value_ranks_by_type"] = q_value_ranks_by_type

ORACLE_SQL["value_ranks_by_type"] = """
    SELECT event_id, event_type,
           CAST(RANK() OVER (PARTITION BY event_type ORDER BY value)
                - 1 AS BIGINT) AS rnk
    FROM events WHERE value IS NOT NULL
"""


def q_pq_knn(sf_dir: str):
    """Approximate top-10 by PQ asymmetric distance for the first 5
    vectors: the compressed-domain scan (2 table lookups + 1 add per
    candidate) an IVF-PQ index runs inside each probed cell."""
    import ray.data as rd

    from .ops.similarity import pq_knn, queries_from_dataset
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    return pq_knn(emb, queries_from_dataset(emb, n_queries=5),
                  m=2, k_code=4, iters=1, k=10)


QUERIES["pq_knn"] = q_pq_knn

# the pq_codes pipeline + per-query codeword distance tables + ADC rank
ORACLE_SQL["pq_knn"] = """
    WITH E AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
                      CAST(generate_subscripts(embedding, 1) AS BIGINT)
                          - 1 AS dim,
                      CAST(len(embedding) AS BIGINT) AS d
               FROM embeddings),
    X AS (SELECT vec_id, v, dim, (dim * 2) // d AS sub FROM E),
    C0 AS (SELECT sub, vec_id % 4 AS c, dim, AVG(v) AS mv
           FROM X GROUP BY 1, 2, 3),
    S1 AS (SELECT x.vec_id, x.sub, c0.c,
                  SUM(power(x.v - c0.mv, 2)) AS d2
           FROM X x JOIN C0 c0 ON c0.sub = x.sub AND c0.dim = x.dim
           GROUP BY 1, 2, 3),
    A1 AS (SELECT vec_id, sub, c FROM (
             SELECT vec_id, sub, c, ROW_NUMBER() OVER (
                 PARTITION BY vec_id, sub ORDER BY d2 ASC, c ASC) AS rn
             FROM S1) WHERE rn = 1),
    C1 AS (SELECT x.sub, a.c, x.dim, AVG(x.v) AS mv
           FROM X x JOIN A1 a ON a.vec_id = x.vec_id AND a.sub = x.sub
           GROUP BY 1, 2, 3),
    S2 AS (SELECT x.vec_id, x.sub, c1.c,
                  SUM(power(x.v - c1.mv, 2)) AS d2
           FROM X x JOIN C1 c1 ON c1.sub = x.sub AND c1.dim = x.dim
           GROUP BY 1, 2, 3),
    CODES AS (SELECT vec_id, sub, c FROM (
        SELECT vec_id, sub, c, ROW_NUMBER() OVER (
            PARTITION BY vec_id, sub ORDER BY d2 ASC, c ASC) AS rn
        FROM S2) WHERE rn = 1),
    QD AS (SELECT x.vec_id AS qid, x.sub, c1.c,
                  SUM(power(x.v - c1.mv, 2)) AS d2
           FROM X x JOIN C1 c1 ON c1.sub = x.sub AND c1.dim = x.dim
           WHERE x.vec_id < 5 GROUP BY 1, 2, 3),
    AD AS (SELECT q.qid, cd.vec_id, SUM(q.d2) AS ad
           FROM CODES cd JOIN QD q ON q.sub = cd.sub AND q.c = cd.c
           GROUP BY 1, 2)
    SELECT qid AS query_id, vec_id, CAST(rnk AS BIGINT) AS rank FROM (
        SELECT qid, vec_id, ROW_NUMBER() OVER (
            PARTITION BY qid ORDER BY ad ASC, vec_id ASC) AS rnk
        FROM AD) WHERE rnk <= 10
"""


def q_cross_run_hll(sf_dir: str):
    """Two-run incremental distinct-user sketch: run A (even events)
    commits its HLL registers, run B (odd events) merges against the
    store — the union estimate over BOTH runs equals a single-pass HLL
    over all events (register max-merge ≡ set union), which is what
    the oracle computes."""
    import os
    import shutil

    from .ops.sketch import ingest_hll_run

    state = f"/tmp/l2sr_hll_ingest_{os.getpid()}"
    shutil.rmtree(state, ignore_errors=True)
    ev = _events(sf_dir, ["event_id", "event_type", "user_id"])
    run_a = ev.map_batches(lambda b: parity_half(b, 0, "event_id"),
                           batch_format="pyarrow")
    run_b = ev.map_batches(lambda b: parity_half(b, 1, "event_id"),
                           batch_format="pyarrow")
    ingest_hll_run(run_a, state, "event_type", "user_id", p=5)
    out = ingest_hll_run(run_b, state, "event_type", "user_id", p=5)
    shutil.rmtree(state, ignore_errors=True)
    return out


QUERIES["cross_run_hll"] = q_cross_run_hll

# union of the two runs' registers == registers of all events, so the
# oracle is the single-pass integer HLL over the whole table
ORACLE_SQL["cross_run_hll"] = ORACLE_SQL["approx_distinct"]


def q_bpe_merges(sf_dir: str):
    """Distributed BPE tokenizer training: the first 6 merge rules
    learned over the documents corpus (corpus touched once for word
    counts; every round runs over the distinct-word vocab)."""
    from .ops.text import bpe_train
    return bpe_train(_docs(sf_dir, ["text"]), n_merges=6)


QUERIES["bpe_merges"] = q_bpe_merges


def _bpe_round_sql(k: int) -> str:
    """CTEs for BPE round ``k``: pair counts over R{k-1}, winning pair
    M{k}, greedy islands rewrite into R{k} — the SQL twin of
    ``ops.text._bpe_merge_batch``."""
    p = k - 1
    return f"""
    P{k} AS (SELECT s.sym AS l, s.nxt AS r2,
                    CAST(SUM(w.cnt) AS BIGINT) AS n
             FROM (SELECT word, pos, sym, LEAD(sym) OVER
                       (PARTITION BY word ORDER BY pos) AS nxt
                   FROM R{p}) s
             JOIN WC w USING (word)
             WHERE s.nxt IS NOT NULL GROUP BY 1, 2),
    M{k} AS (SELECT l, r2, n FROM P{k}
             ORDER BY n DESC, l ASC, r2 ASC LIMIT 1),
    X{k} AS (SELECT r.word, r.pos, r.sym,
                    CASE WHEN r.sym = m.l AND r.nxt = m.r2
                         THEN 1 ELSE 0 END AS mt
             FROM (SELECT word, pos, sym, LEAD(sym) OVER
                       (PARTITION BY word ORDER BY pos) AS nxt
                   FROM R{p}) r CROSS JOIN M{k} m),
    T{k} AS (SELECT word, pos, sym, mt,
                    CASE WHEN mt = 1 AND (pos - MIN(pos) OVER
                        (PARTITION BY word, mt, isl)) % 2 = 0
                    THEN 1 ELSE 0 END AS tk
             FROM (SELECT word, pos, sym, mt,
                          pos - ROW_NUMBER() OVER
                              (PARTITION BY word, mt ORDER BY pos) AS isl
                   FROM X{k})),
    R{k} AS (SELECT word,
                    ROW_NUMBER() OVER (PARTITION BY word ORDER BY pos)
                        AS pos,
                    CASE WHEN tk = 1 THEN sym || nxt ELSE sym END AS sym
             FROM (SELECT word, pos, sym, tk,
                          LEAD(sym) OVER (PARTITION BY word
                                          ORDER BY pos) AS nxt,
                          LAG(tk) OVER (PARTITION BY word
                                        ORDER BY pos) AS ptk
                   FROM T{k})
             WHERE COALESCE(ptk, 0) = 0)"""


def _bpe_sql(n_merges: int) -> str:
    rounds = ",".join(_bpe_round_sql(k) for k in range(1, n_merges + 1))
    finals = "\n    UNION ALL ".join(
        f"SELECT {k} AS merge_rank, l AS sym_a, r2 AS sym_b, n FROM M{k}"
        for k in range(1, n_merges + 1))
    return f"""
    WITH WC AS (SELECT tk AS word, CAST(COUNT(*) AS BIGINT) AS cnt
                FROM (SELECT unnest({_TOKENS}) AS tk FROM documents)
                GROUP BY tk),
    R0 AS (SELECT word, CAST(i AS BIGINT) AS pos, word[i] AS sym
           FROM WC, LATERAL (SELECT unnest(range(1, length(word) + 1))
                             AS i)),
    {rounds}
    SELECT CAST(merge_rank AS BIGINT) AS merge_rank, sym_a, sym_b, n
    FROM ({finals})
"""


ORACLE_SQL["bpe_merges"] = _bpe_sql(6)


def q_cross_run_hist(sf_dir: str):
    """Two-run incremental median: run A (even events) commits its
    binned value histogram, run B (odd events) merges — bin counts add,
    so the union quantile equals a single-pass histogram_quantile over
    all events (the oracle)."""
    import os
    import shutil

    from .ops.stats import ingest_hist_run

    state = f"/tmp/l2sr_hist_ingest_{os.getpid()}"
    shutil.rmtree(state, ignore_errors=True)
    ev = _events(sf_dir, ["event_id", "value"])
    run_a = ev.map_batches(lambda b: parity_half(b, 0, "event_id"),
                           batch_format="pyarrow")
    run_b = ev.map_batches(lambda b: parity_half(b, 1, "event_id"),
                           batch_format="pyarrow")
    ingest_hist_run(run_a, state, "value", q=0.5, scale=100)
    out = ingest_hist_run(run_b, state, "value", q=0.5, scale=100)
    shutil.rmtree(state, ignore_errors=True)
    return out


QUERIES["cross_run_hist"] = q_cross_run_hist

ORACLE_SQL["cross_run_hist"] = """
    WITH B AS (SELECT CAST(floor(value * 100) AS BIGINT) AS bin
               FROM events WHERE value IS NOT NULL)
    SELECT quantile_disc(bin, 0.5) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n_total FROM B
"""


def q_late_events(sf_dir: str):
    """Watermark sizing: events arriving (by id) more than 1h behind
    their user's max seen event-time — the out-of-order accounting for
    a streaming ingest."""
    from .ops.windows import late_events
    return late_events(_events(sf_dir, ["event_id", "user_id", "ts"]),
                       tol_sec=3600)


QUERIES["late_events"] = q_late_events

ORACLE_SQL["late_events"] = """
    WITH V AS (SELECT event_id, user_id, ts FROM events
               WHERE ts IS NOT NULL),
    W AS (SELECT event_id,
                 MAX(ts) OVER (PARTITION BY user_id ORDER BY event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING) AS pm,
                 ts
          FROM V)
    SELECT event_id,
           CAST(CASE WHEN pm IS NOT NULL
                          AND pm - ts > INTERVAL 3600 SECOND
                     THEN 1 ELSE 0 END AS BIGINT) AS is_late
    FROM W
"""


def q_dup_graph_stats(sf_dir: str):
    """Near-dup cluster graph report: per cluster, node count, verified
    edge count, and integer density (2·10^6·edges // (n·(n−1))) — the
    health metric that separates tight mirror-farms from loose chains.
    Composition: verified pairs hash-join the cluster map on id_a
    (every verified pair is within one cluster), count partials, then
    a cluster-keyed join of the two small aggregates."""
    from ray.data.aggregate import Count, Sum

    from .ops.dedup import clusters_from_pairs
    from .ops.join import hash_join

    # the pair set feeds BOTH the edge counts and the clustering —
    # materialize once so the MinHash pipeline (shingle → bucket →
    # verify) runs once, not twice
    pairs = q_minhash_dedup(sf_dir).materialize()
    clusters = clusters_from_pairs(pairs)
    edges = hash_join(pairs, clusters, "id_a", "doc_id",
                      left_cols=["id_a"],
                      right_cols=["doc_id", "cluster_id"]) \
        .groupby("cluster_id").aggregate(Count(alias_name="n_edges"))
    nodes = clusters.groupby("cluster_id") \
        .aggregate(Count(alias_name="n_nodes"))
    joined = hash_join(nodes, edges, "cluster_id", "cluster_id",
                       left_cols=["cluster_id", "n_nodes"],
                       right_cols=["cluster_id", "n_edges"])

    def density(b: pa.Table) -> pa.Table:
        n = np.asarray(pc.cast(b.column("n_nodes"), pa.int64())
                       .to_numpy(zero_copy_only=False), dtype=np.int64)
        e = np.asarray(pc.cast(b.column("n_edges"), pa.int64())
                       .to_numpy(zero_copy_only=False), dtype=np.int64)
        return pa.table({
            "cluster_id": pc.cast(b.column("cluster_id"), pa.int64()),
            "n_nodes": pa.array(n, type=pa.int64()),
            "n_edges": pa.array(e, type=pa.int64()),
            "density_ppm": pa.array(2_000_000 * e // (n * (n - 1)),
                                    type=pa.int64())})

    return joined.map_batches(density, batch_format="pyarrow")


QUERIES["dup_graph_stats"] = q_dup_graph_stats

ORACLE_SQL["dup_graph_stats"] = f"""
    WITH C AS ({ORACLE_SQL["minhash_clusters"]}),
    P AS ({ORACLE_SQL["minhash_dedup"]}),
    E AS (SELECT c.cluster_id, CAST(COUNT(*) AS BIGINT) AS n_edges
          FROM P p JOIN C c ON c.doc_id = p.id_a GROUP BY 1),
    N AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_nodes
          FROM C GROUP BY 1)
    SELECT n.cluster_id, n.n_nodes, e.n_edges,
           CAST((2000000 * e.n_edges) // (n.n_nodes * (n.n_nodes - 1))
                AS BIGINT) AS density_ppm
    FROM N n JOIN E e USING (cluster_id)
"""


def _media_variants(b: pa.Table) -> pa.Table:
    """Synthetic media corpus with PLANTED near-duplicates: every
    ``doc_id % 5 == 4`` row reuses the previous id's seed (same content,
    its own truncation length) — a truncated re-encode of its base."""
    import hashlib
    rows = {"media_id": [], "payload": []}
    for did in b.column("doc_id").to_pylist():
        did = int(did)
        base = did - 1 if did % 5 == 4 else did
        seed = hashlib.md5(str(base).encode()).hexdigest()
        own = hashlib.md5(str(did).encode()).hexdigest()
        n_bytes = 256 + int(own[:8], 16) % 3840
        rows["media_id"].append(did)
        rows["payload"].append((seed * 128)[:n_bytes].encode("ascii"))
    return pa.table({"media_id": pa.array(rows["media_id"],
                                          type=pa.int64()),
                     "payload": pa.array(rows["payload"],
                                         type=pa.binary())})


def q_media_neardup(sf_dir: str):
    """Byte-level media near-dup pairs: payload-block SimHash, Hamming
    ≤ 12 within the high-16-bit bucket — truncated re-encodes planted
    at doc_id % 5 == 4 must pair with their base."""
    from .ops.multimodal import media_simhash_dups
    media = _docs(sf_dir, ["doc_id"]).map_batches(
        _media_variants, batch_format="pyarrow", batch_size=512)
    return media_simhash_dups(media, max_hamming=12)


QUERIES["media_neardup"] = q_media_neardup

# payload reconstruction + non-overlapping 8-byte blocks + the simhash
# bit arithmetic of the text oracle + within-bucket Hamming pairs
ORACLE_SQL["media_neardup"] = """
    WITH M AS (SELECT doc_id AS media_id,
                      md5(CAST(doc_id - (CASE WHEN doc_id % 5 = 4
                                               THEN 1 ELSE 0 END)
                               AS VARCHAR)) AS seed,
                      256 + CAST(('0x' || substr(md5(CAST(doc_id
                                       AS VARCHAR)), 1, 8)) AS BIGINT)
                          % 3840 AS nb
               FROM documents),
    P AS (SELECT media_id,
                 substr(repeat(seed, 128), 1, CAST(nb AS INT)) AS pay
          FROM M),
    BL AS (SELECT media_id,
                  substr(pay, CAST(j * 8 + 1 AS INT), 8) AS blk
           FROM P, LATERAL (SELECT unnest(range(0,
               CAST(ceil(length(pay) / 8.0) AS BIGINT))) AS j)),
    tc AS (SELECT media_id, blk, CAST(COUNT(*) AS BIGINT) AS w
           FROM BL GROUP BY 1, 2),
    th AS (SELECT media_id,
                  CAST(('0x' || substr(md5(blk), 1, 15)) AS BIGINT) AS h,
                  w
           FROM tc),
    bits AS (SELECT media_id, b,
                    SUM(CASE WHEN ((h >> b) & 1) = 1
                             THEN w ELSE -w END) AS s
             FROM th, (SELECT unnest(range(0, 60)) AS b)
             GROUP BY media_id, b),
    agg AS (SELECT media_id,
                   CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << b)
                                 ELSE 0 END) AS BIGINT) AS simhash
            FROM bits GROUP BY media_id),
    S AS (SELECT media_id, simhash, simhash >> 44 AS bkt FROM agg)
    SELECT a.media_id AS id_a, b.media_id AS id_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT)
               AS hamming
    FROM S a JOIN S b ON a.bkt = b.bkt AND a.media_id < b.media_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 12
"""


def q_ivf_pq_knn(sf_dir: str):
    """Full IVF-PQ read path for the first 5 vectors: spherical-kmeans
    coarse cells (8, probe 2) + PQ asymmetric-distance scan of the
    probed cells only — top-10 per query."""
    import ray.data as rd

    from .ops.similarity import ivf_pq_knn, queries_from_dataset
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    return ivf_pq_knn(emb, queries_from_dataset(emb, n_queries=5),
                      n_cells=8, n_probe=2, m=2, k_code=4, iters=1,
                      k=10)


QUERIES["ivf_pq_knn"] = q_ivf_pq_knn

# the kmeans_clusters CTE stack (coarse cells + probe) composed with
# the pq_knn CTE stack (codes + query distance tables), candidates
# filtered to the probed cells
ORACLE_SQL["ivf_pq_knn"] = """
    WITH E AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
                      CAST(generate_subscripts(embedding, 1) AS BIGINT)
                          - 1 AS dim,
                      CAST(len(embedding) AS BIGINT) AS d
               FROM embeddings),
    N AS (SELECT vec_id, GREATEST(SQRT(SUM(v * v)), 1e-12) AS nn
          FROM E GROUP BY vec_id),
    XN AS (SELECT e.vec_id, e.dim, e.v / n.nn AS x
           FROM E e JOIN N n USING (vec_id)),
    K0 AS (SELECT vec_id % 8 AS c, dim, AVG(x) AS m
           FROM XN GROUP BY 1, 2),
    K0N AS (SELECT c, dim, m / GREATEST(SQRT(SUM(m * m)
                OVER (PARTITION BY c)), 1e-12) AS cv FROM K0),
    KS1 AS (SELECT x.vec_id, k.c, SUM(x.x * k.cv) AS dot
            FROM XN x JOIN K0N k USING (dim) GROUP BY 1, 2),
    KA1 AS (SELECT vec_id, c FROM (
              SELECT vec_id, c, ROW_NUMBER() OVER (PARTITION BY vec_id
                  ORDER BY dot DESC, c ASC) AS rn FROM KS1)
            WHERE rn = 1),
    K1 AS (SELECT a.c, x.dim, AVG(x.x) AS m
           FROM XN x JOIN KA1 a USING (vec_id) GROUP BY 1, 2),
    K1N AS (SELECT c, dim, m / GREATEST(SQRT(SUM(m * m)
                OVER (PARTITION BY c)), 1e-12) AS cv FROM K1),
    KS2 AS (SELECT x.vec_id, k.c, SUM(x.x * k.cv) AS dot
            FROM XN x JOIN K1N k USING (dim) GROUP BY 1, 2),
    CELL AS (SELECT vec_id, c AS cell FROM (
               SELECT vec_id, c, ROW_NUMBER() OVER (PARTITION BY vec_id
                   ORDER BY dot DESC, c ASC) AS rn FROM KS2)
             WHERE rn = 1),
    PRB AS (SELECT qid, c FROM (
              SELECT vec_id AS qid, c, ROW_NUMBER() OVER (
                  PARTITION BY vec_id ORDER BY dot DESC, c ASC) AS rn
              FROM KS2 WHERE vec_id < 5) WHERE rn <= 2),
    XS AS (SELECT vec_id, v, dim, (dim * 2) // d AS sub FROM E),
    P0 AS (SELECT sub, vec_id % 4 AS c, dim, AVG(v) AS mv
           FROM XS GROUP BY 1, 2, 3),
    PS1 AS (SELECT x.vec_id, x.sub, p0.c,
                   SUM(power(x.v - p0.mv, 2)) AS d2
            FROM XS x JOIN P0 p0 ON p0.sub = x.sub AND p0.dim = x.dim
            GROUP BY 1, 2, 3),
    PA1 AS (SELECT vec_id, sub, c FROM (
              SELECT vec_id, sub, c, ROW_NUMBER() OVER (
                  PARTITION BY vec_id, sub ORDER BY d2 ASC, c ASC) AS rn
              FROM PS1) WHERE rn = 1),
    P1 AS (SELECT x.sub, a.c, x.dim, AVG(x.v) AS mv
           FROM XS x JOIN PA1 a ON a.vec_id = x.vec_id
                                AND a.sub = x.sub
           GROUP BY 1, 2, 3),
    PS2 AS (SELECT x.vec_id, x.sub, p1.c,
                   SUM(power(x.v - p1.mv, 2)) AS d2
            FROM XS x JOIN P1 p1 ON p1.sub = x.sub AND p1.dim = x.dim
            GROUP BY 1, 2, 3),
    CODES AS (SELECT vec_id, sub, c FROM (
        SELECT vec_id, sub, c, ROW_NUMBER() OVER (
            PARTITION BY vec_id, sub ORDER BY d2 ASC, c ASC) AS rn
        FROM PS2) WHERE rn = 1),
    QD AS (SELECT x.vec_id AS qid, x.sub, p1.c,
                  SUM(power(x.v - p1.mv, 2)) AS d2
           FROM XS x JOIN P1 p1 ON p1.sub = x.sub AND p1.dim = x.dim
           WHERE x.vec_id < 5 GROUP BY 1, 2, 3),
    AD AS (SELECT q.qid, cd.vec_id, SUM(q.d2) AS ad
           FROM CODES cd JOIN QD q ON q.sub = cd.sub AND q.c = cd.c
           GROUP BY 1, 2),
    CAND AS (SELECT a.qid, a.vec_id, a.ad
             FROM AD a JOIN CELL ce ON ce.vec_id = a.vec_id
                       JOIN PRB p ON p.qid = a.qid AND p.c = ce.cell)
    SELECT qid AS query_id, vec_id, CAST(rnk AS BIGINT) AS rank FROM (
        SELECT qid, vec_id, ROW_NUMBER() OVER (
            PARTITION BY qid ORDER BY ad ASC, vec_id ASC) AS rnk
        FROM CAND) WHERE rnk <= 10
"""


def q_corpus_datasheet(sf_dir: str):
    """One-call corpus datasheet (the 'data card' numbers a training-
    data release publishes): doc/token/char totals, vocabulary size,
    exact-dup doc count, language count, median doc length — every
    metric an exact integer from streaming partial passes; the corpus
    is read a bounded number of times, rows never collect."""
    import hashlib

    import pandas as pd
    from ray.data.aggregate import Count, Max, Sum

    from .ops.stats import global_quantile_disc
    from .ops.text import _token_lists

    docs = _docs(sf_dir, ["doc_id", "text", "lang", "n_chars"])

    def base_partial(b: pa.Table) -> pa.Table:
        toks = _token_lists(b.column("text"))
        n_tok = int(pc.sum(pc.list_value_length(toks)).as_py() or 0)
        return pa.table({
            "n_docs_p": pa.array([len(b)], type=pa.int64()),
            "n_tokens_p": pa.array([n_tok], type=pa.int64()),
            "n_chars_p": pa.array(
                [int(pc.sum(b.column("n_chars")).as_py() or 0)],
                type=pa.int64())})

    base = base_partial  # per-batch scalar partials, summed below
    agg = docs.map_batches(base, batch_format="pyarrow").sum(
        ["n_docs_p", "n_tokens_p", "n_chars_p"])
    n_docs = int(agg["sum(n_docs_p)"])
    n_tokens = int(agg["sum(n_tokens_p)"])
    n_chars = int(agg["sum(n_chars_p)"])

    # distinct content hashes / vocabulary / languages: narrow groupbys
    dup = docs.map_batches(
        lambda b: pa.table({"h": pa.array(
            [hashlib.md5((t or "").encode()).hexdigest()
             for t in b.column("text").to_pylist()])}),
        batch_format="pyarrow").groupby("h") \
        .aggregate(Count(alias_name="n")).count()
    vocab = docs.map_batches(
        lambda b: pa.table({"tk": pc.unique(
            pc.list_flatten(_token_lists(b.column("text"))))}),
        batch_format="pyarrow").groupby("tk") \
        .aggregate(Count(alias_name="n")).count()
    langs = docs.map_batches(
        lambda b: pa.table({"lang": pc.unique(b.column("lang"))}),
        batch_format="pyarrow").groupby("lang") \
        .aggregate(Count(alias_name="n")).count()
    tok_counts = docs.map_batches(
        lambda b: pa.table({"n_tok": pa.array(np.diff(np.asarray(
            _token_lists(b.column("text")).offsets, dtype=np.int64)),
            type=pa.int64())}),
        batch_format="pyarrow")
    med = int(global_quantile_disc(tok_counts, "n_tok", q=0.5))

    rows = [("median_doc_tokens", med),
            ("n_chars", n_chars),
            ("n_distinct_tokens", int(vocab)),
            ("n_docs", n_docs),
            ("n_exact_dup_docs", n_docs - int(dup)),
            ("n_langs", int(langs)),
            ("n_tokens", n_tokens)]
    return pd.DataFrame(rows, columns=["metric", "value"])


QUERIES["corpus_datasheet"] = q_corpus_datasheet

ORACLE_SQL["corpus_datasheet"] = f"""
    SELECT 'median_doc_tokens' AS metric,
           CAST(quantile_disc(len({_TOKENS}), 0.5) AS BIGINT) AS value
    FROM documents
    UNION ALL
    SELECT 'n_chars', CAST(SUM(n_chars) AS BIGINT) FROM documents
    UNION ALL
    SELECT 'n_distinct_tokens', CAST(COUNT(DISTINCT tk) AS BIGINT)
    FROM (SELECT unnest({_TOKENS}) AS tk FROM documents)
    UNION ALL
    SELECT 'n_docs', CAST(COUNT(*) AS BIGINT) FROM documents
    UNION ALL
    SELECT 'n_exact_dup_docs',
           CAST(COUNT(*) - COUNT(DISTINCT md5(COALESCE(text, '')))
                AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'n_langs', CAST(COUNT(DISTINCT lang) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'n_tokens', CAST(SUM(len({_TOKENS})) AS BIGINT)
    FROM documents
"""


def q_attribution_pairs(sf_dir: str):
    """Multi-touch purchase attribution: every (purchase, click) pair
    of the same user with the click in the 24h before (inclusive of)
    the purchase, plus the equal-split integer weight
    ``10^6 // n_matches`` — the pair-emitting windowed stream-stream
    join the aggregate interval join can't express."""
    from .ops.join import interval_pairs_join

    ev = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"])
    purchases = ev.filter(expr="event_type == 'purchase'") \
        .map_batches(lambda b: pa.table({
            "purchase_id": pc.cast(b.column("event_id"), pa.int64()),
            "user_id": b.column("user_id"), "ts": b.column("ts")}),
            batch_format="pyarrow")
    clicks = ev.filter(expr="event_type == 'click'") \
        .map_batches(lambda b: pa.table({
            "click_id": pc.cast(b.column("event_id"), pa.int64()),
            "user_id": b.column("user_id"), "ts": b.column("ts")}),
            batch_format="pyarrow")
    pairs = interval_pairs_join(
        purchases, clicks, "user_id", lo_us=-86_400_000_000, hi_us=0,
        left_id="purchase_id", right_id="click_id")

    def weight(b: pa.Table) -> pa.Table:
        n = np.asarray(pc.cast(b.column("n_matches"), pa.int64())
                       .to_numpy(zero_copy_only=False), dtype=np.int64)
        return b.append_column(
            "w_ppm", pa.array(1_000_000 // n, type=pa.int64()))

    return pairs.map_batches(weight, batch_format="pyarrow")


QUERIES["attribution_pairs"] = q_attribution_pairs

ORACLE_SQL["attribution_pairs"] = """
    WITH P AS (SELECT event_id AS purchase_id, user_id, ts FROM events
               WHERE event_type = 'purchase' AND ts IS NOT NULL),
    C AS (SELECT event_id AS click_id, user_id, ts FROM events
          WHERE event_type = 'click' AND ts IS NOT NULL),
    J AS (SELECT p.purchase_id, c.click_id
          FROM P p JOIN C c ON c.user_id = p.user_id
          WHERE c.ts > p.ts - INTERVAL 86400 SECOND AND c.ts <= p.ts),
    N AS (SELECT purchase_id, CAST(COUNT(*) AS BIGINT) AS n_matches
          FROM J GROUP BY 1)
    SELECT j.purchase_id, j.click_id, n.n_matches,
           CAST(1000000 // n.n_matches AS BIGINT) AS w_ppm
    FROM J j JOIN N n USING (purchase_id)
"""


def q_vec_dim_stats(sf_dir: str):
    """Per-dimension embedding stats table (n/min/max/sum in exact
    integer micro-units) — the scaling table before normalization, and
    the drift monitor between corpus snapshots."""
    import ray.data as rd

    from .ops.similarity import vec_dim_stats
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    return vec_dim_stats(emb)


QUERIES["vec_dim_stats"] = q_vec_dim_stats

ORACLE_SQL["vec_dim_stats"] = """
    WITH E AS (SELECT CAST(generate_subscripts(embedding, 1) AS BIGINT)
                          AS dim,
                      CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                                 * 1000000) AS BIGINT) AS v
               FROM embeddings)
    SELECT dim, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(v) AS BIGINT) AS mn_micro,
           CAST(MAX(v) AS BIGINT) AS mx_micro,
           CAST(SUM(v) AS BIGINT) AS sum_micro
    FROM E GROUP BY dim
"""


def q_bpe_encoded(sf_dir: str):
    """BPE train-then-encode round trip: the corpus tokenized with its
    own 6-rule vocabulary, exploded to (doc, tok_pos, sub_pos, sym)
    subword rows."""
    from .ops.text import bpe_encode
    return bpe_encode(_docs(sf_dir, ["doc_id", "text"]), n_merges=6)


QUERIES["bpe_encoded"] = q_bpe_encoded


def _bpe_encode_sql(n_merges: int) -> str:
    rounds = ",".join(_bpe_round_sql(k) for k in range(1, n_merges + 1))
    return f"""
    WITH WC AS (SELECT tk AS word, CAST(COUNT(*) AS BIGINT) AS cnt
                FROM (SELECT unnest({_TOKENS}) AS tk FROM documents)
                GROUP BY tk),
    R0 AS (SELECT word, CAST(i AS BIGINT) AS pos, word[i] AS sym
           FROM WC, LATERAL (SELECT unnest(range(1, length(word) + 1))
                             AS i)),
    {rounds},
    TOK AS (SELECT doc_id,
                   CAST(generate_subscripts(t, 1) AS BIGINT) AS tok_pos,
                   unnest(t) AS word
            FROM (SELECT doc_id, {_TOKENS} AS t FROM documents))
    SELECT tok.doc_id, tok.tok_pos, CAST(r.pos AS BIGINT) AS sub_pos,
           r.sym
    FROM TOK tok JOIN R{n_merges} r USING (word)
"""


ORACLE_SQL["bpe_encoded"] = _bpe_encode_sql(6)


def q_vec_gram(sf_dir: str):
    """Integer gram-matrix sums over the embeddings (dim pairs a ≤ b,
    milli-quantized products) — the exact distributed X^T X under
    PCA/whitening; one d(d+1)/2-row partial per batch."""
    import ray.data as rd

    from .ops.similarity import vec_gram_sums
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["embedding"])
    return vec_gram_sums(emb, scale=1000)


QUERIES["vec_gram"] = q_vec_gram

ORACLE_SQL["vec_gram"] = """
    WITH E AS (SELECT vec_id,
                      CAST(generate_subscripts(embedding, 1) AS BIGINT)
                          AS dim,
                      CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                                 * 1000) AS BIGINT) AS q
               FROM embeddings)
    SELECT a.dim AS dim_a, b.dim AS dim_b,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(a.q * b.q) AS BIGINT) AS s
    FROM E a JOIN E b ON a.vec_id = b.vec_id AND a.dim <= b.dim
    GROUP BY 1, 2
"""


def q_containment_dups(sf_dir: str):
    """Exact 4-gram set-CONTAINMENT pairs (|A∩B| ≥ 0.9·min(|A|,|B|),
    df≤64 cap): the short-doc-inside-long-doc duplicates Jaccard
    structurally misses. Every doc contributes a synthetic half-prefix
    variant (doc_id + 1,000,000, first ⌈n/2⌉ tokens) so full-containment
    hits are guaranteed and hash-gated. Same three-exchange
    inverted-index plan as ngram_jaccard (ops/curation.py:containment_dups)."""
    from .ops.curation import containment_dups
    from .ops.text import _token_lists

    def aug(b: pa.Table) -> pa.Table:
        import numpy as np
        toks = _token_lists(b.column("text"))
        offsets = np.asarray(toks.offsets, dtype=np.int64)
        counts = np.diff(offsets)
        keep_n = (counts + 1) // 2
        new_off = np.concatenate([[0], np.cumsum(keep_n)])
        idx = (np.repeat(offsets[:-1], keep_n)
               + np.arange(int(keep_n.sum()), dtype=np.int64)
               - np.repeat(new_off[:-1], keep_n))
        pref = pa.ListArray.from_arrays(
            pa.array(new_off, type=pa.int32()), toks.values.take(idx))
        ids = b.column("doc_id")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        text = b.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        return pa.table({
            "doc_id": pa.concat_arrays(
                [ids, pc.add(ids, pa.scalar(1000000,
                                            type=ids.type))]),
            "text": pa.concat_arrays(
                [text, pc.binary_join(pref, " ")])})

    return containment_dups(
        _docs(sf_dir, ["doc_id", "text"]).map_batches(
            aug, batch_format="pyarrow"),
        window=4, tau_num=9, tau_den=10, max_df=64)


QUERIES["containment_dups"] = q_containment_dups

ORACLE_SQL["containment_dups"] = f"""
    WITH T0 AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
    T AS (SELECT doc_id, t FROM T0
          UNION ALL
          SELECT doc_id + 1000000, t[1:(len(t)+1)//2] FROM T0),
    SH AS (SELECT doc_id, list_distinct(list_transform(
              CASE WHEN len(t) = 0 THEN ['']
                   WHEN len(t) < 4 THEN [array_to_string(t, ' ')]
                   ELSE list_transform(range(1, len(t) - 2),
                       i -> array_to_string(t[i:i+3], ' ')) END,
              s -> {_H60.format(s='s')})) AS gs
           FROM T),
    EX0 AS (SELECT doc_id, unnest(gs) AS g FROM SH),
    DF AS (SELECT g, COUNT(*) AS df FROM EX0 GROUP BY g),
    EX AS (SELECT e.doc_id, e.g FROM EX0 e JOIN DF USING (g)
           WHERE df <= 64),
    SZ AS (SELECT doc_id, COUNT(*) AS sz FROM EX GROUP BY doc_id),
    I AS (SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS inter
          FROM EX a JOIN EX b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
    SELECT ia AS id_a, ib AS id_b, CAST(inter AS BIGINT) AS inter,
           CAST(least(sa.sz, sb.sz) AS BIGINT) AS min_sz
    FROM I JOIN SZ sa ON sa.doc_id = ia JOIN SZ sb ON sb.doc_id = ib
    WHERE inter * 10 >= 9 * least(sa.sz, sb.sz)
"""


def q_vocab_growth(sf_dir: str):
    """Heaps-law vocabulary-growth curve in 100-doc id buckets: bucket
    token counts, first-occurrence new types, and running vocab/token
    cumsums (ops/curation.py:vocab_growth)."""
    from .ops.curation import vocab_growth
    return vocab_growth(_docs(sf_dir, ["doc_id", "text"]),
                        bucket_size=100)


QUERIES["vocab_growth"] = q_vocab_growth

ORACLE_SQL["vocab_growth"] = f"""
    WITH H AS (SELECT doc_id, {_H60.format(s='tok')} AS h
               FROM (SELECT doc_id, unnest({_TOKENS}) AS tok
                     FROM documents)),
    F AS (SELECT h, MIN(doc_id) AS fd FROM H GROUP BY h),
    NT AS (SELECT fd // 100 AS bucket, CAST(COUNT(*) AS BIGINT)
               AS new_types FROM F GROUP BY 1),
    TK AS (SELECT doc_id // 100 AS bucket, CAST(COUNT(*) AS BIGINT)
               AS bucket_tokens FROM H GROUP BY 1)
    SELECT bucket, bucket_tokens,
           CAST(COALESCE(new_types, 0) AS BIGINT) AS new_types,
           CAST(SUM(COALESCE(new_types, 0))
                OVER (ORDER BY bucket) AS BIGINT) AS vocab,
           CAST(SUM(bucket_tokens)
                OVER (ORDER BY bucket) AS BIGINT) AS tokens_cum
    FROM TK LEFT JOIN NT USING (bucket)
"""


def q_token_coverage(sf_dir: str):
    """Vocabulary coverage curve: 8-type rank buckets (count desc,
    hash asc — the synthetic corpus has a ~31-type vocabulary, so 8
    exercises multiple buckets), occurrence mass + running coverage ppm
    — the tokenizer/vocab-budget diagnostic
    (ops/curation.py:token_coverage)."""
    from .ops.curation import token_coverage
    return token_coverage(_docs(sf_dir, ["text"]), bucket_size=8)


QUERIES["token_coverage"] = q_token_coverage

ORACLE_SQL["token_coverage"] = f"""
    WITH H AS (SELECT {_H60.format(s='tok')} AS h
               FROM (SELECT unnest({_TOKENS}) AS tok FROM documents)),
    C AS (SELECT h, CAST(COUNT(*) AS BIGINT) AS cnt FROM H GROUP BY h),
    R AS (SELECT cnt,
                 ROW_NUMBER() OVER (ORDER BY cnt DESC, h ASC) - 1 AS rn
          FROM C),
    B AS (SELECT rn // 8 AS bucket, CAST(COUNT(*) AS BIGINT) AS types,
                 CAST(SUM(cnt) AS BIGINT) AS occ
          FROM R GROUP BY 1)
    SELECT bucket, types, occ,
           CAST(SUM(occ) OVER (ORDER BY bucket) AS BIGINT) AS occ_cum,
           CAST(SUM(occ) OVER (ORDER BY bucket) * 1000000
                // (SELECT SUM(cnt) FROM C) AS BIGINT) AS coverage_ppm
    FROM B
"""


def q_remove_dup_spans(sf_dir: str):
    """Substring-dedup REWRITE: every duplicated 8-token span excised
    from the corpus, text rebuilt from kept tokens
    (ops/curation.py:remove_dup_spans — the Lee et al. cut step)."""
    from .ops.curation import remove_dup_spans
    return remove_dup_spans(_docs(sf_dir, ["doc_id", "text"]), window=8)


QUERIES["remove_dup_spans"] = q_remove_dup_spans

ORACLE_SQL["remove_dup_spans"] = f"""
    WITH T AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
    E AS (SELECT doc_id,
                 CAST(generate_subscripts(ws, 1) AS BIGINT) - 1 AS pos,
                 unnest(ws) AS s
          FROM (SELECT doc_id, list_transform(range(1, len(t) - 6),
                    i -> array_to_string(t[i:i+7], ' ')) AS ws
                FROM T WHERE len(t) >= 8)),
    H AS (SELECT doc_id, pos, {_H60.format(s='s')} AS h FROM E),
    DUP AS (SELECT doc_id, pos FROM H
            WHERE h IN (SELECT h FROM H GROUP BY h HAVING COUNT(*) >= 2)),
    B AS (SELECT doc_id, pos,
                 CASE WHEN pos - LAG(pos) OVER (
                          PARTITION BY doc_id ORDER BY pos) <= 8
                      THEN 0 ELSE 1 END AS brk
          FROM DUP),
    S AS (SELECT doc_id, pos,
                 SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS gid
          FROM B),
    SP AS (SELECT doc_id, MIN(pos) AS s, MAX(pos) - MIN(pos) + 8 AS l
           FROM S GROUP BY doc_id, gid),
    COV AS (SELECT doc_id, unnest(range(s, s + l)) AS pos FROM SP),
    P AS (SELECT doc_id,
                 CAST(generate_subscripts(t, 1) AS BIGINT) - 1 AS pos,
                 unnest(t) AS tok
          FROM T),
    K AS (SELECT doc_id, pos, tok FROM P
          ANTI JOIN COV USING (doc_id, pos)),
    A AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS txt,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM K GROUP BY doc_id)
    SELECT t.doc_id, COALESCE(a.txt, '') AS text_clean,
           CAST(len(t.t) - COALESCE(a.n, 0) AS BIGINT) AS n_removed
    FROM T t LEFT JOIN A a USING (doc_id)
"""


def q_cross_run_search(sf_dir: str):
    """Two-run incremental inverted-index ingest + pruned search: run A
    commits even docs' postings (hive-partitioned by token-hash bucket),
    run B ingests the full corpus (odds are new; evens anti-join away),
    then the keyword query reads ONLY the buckets its terms hash to
    across both runs. Scoring is keyword_search's exact integer idf
    (ops/text.py:ingest_search_run, search_index)."""
    import os
    import shutil

    from .ops.text import ingest_search_run, search_index

    state = f"/tmp/l2sr_srch_ingest_{os.getpid()}"
    shutil.rmtree(state, ignore_errors=True)
    docs = _docs(sf_dir, ["doc_id", "text"])
    run_a = docs.map_batches(lambda b: parity_half(b, 0),
                             batch_format="pyarrow")
    ingest_search_run(run_a, state, buckets=16)
    ingest_search_run(docs, state, buckets=16)
    return search_index(state, ["join", "hash", "customer", "slow"],
                        k=20)


QUERIES["cross_run_search"] = q_cross_run_search

ORACLE_SQL["cross_run_search"] = f"""
    WITH TF AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
                FROM (SELECT doc_id, unnest({_TOKENS}) AS token
                      FROM documents)
                WHERE token IN ('join', 'hash', 'customer', 'slow')
                GROUP BY doc_id, token),
    W AS (SELECT token, 1000000 // COUNT(*) AS w FROM TF GROUP BY token),
    S AS (SELECT doc_id, CAST(SUM(tf * w) AS BIGINT) AS score
          FROM TF JOIN W USING (token) GROUP BY doc_id)
    SELECT doc_id, score FROM S WHERE score > 0
    ORDER BY score DESC, doc_id ASC LIMIT 20
"""


def q_mixed_lang_docs(sf_dir: str):
    """Per-paragraph language consistency: 16-token paragraphs
    language-ID'd independently, per-doc majority + dissent ppm — the
    partially-translated / boilerplate-injection signal
    (ops/text.py:mixed_lang_docs; one actor pass, no exchange)."""
    from .ops.text import mixed_lang_docs
    return mixed_lang_docs(_docs(sf_dir, ["doc_id", "text"]),
                           para_tokens=16)


QUERIES["mixed_lang_docs"] = q_mixed_lang_docs


def _mixed_lang_sql(pt: int) -> str:
    """Per-paragraph variant of the langid oracle, regenerated from the
    engine's own profiles (same hit expressions, majority per doc)."""
    from .ops.text import _LANG_PROFILES, _LANG_SUBSTRINGS
    langs = sorted(set(_LANG_PROFILES) | set(_LANG_SUBSTRINGS))

    def lst(lang):
        return "[" + ", ".join(
            f"'{w}'" for w in sorted(_LANG_PROFILES[lang])) + "]"

    def h_expr(lg):
        terms = []
        if lg in _LANG_PROFILES:
            terms.append(f"len(list_intersect(toks, {lst(lg)}))")
        for g in sorted(_LANG_SUBSTRINGS.get(lg, ())):
            terms.append(f"CASE WHEN contains(ns, '{g}') THEN 1 ELSE 0 "
                         f"END")
        return " + ".join(terms)

    hits = ",\n               ".join(f"{h_expr(lg)} AS h_{lg}"
                                     for lg in langs)
    g = "greatest(" + ", ".join(f"h_{lg}" for lg in langs) + ")"
    case = " ".join(f"WHEN h_{lg} = {g} THEN '{lg}'" for lg in langs)
    return f"""
        WITH T0 AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
        P AS (SELECT doc_id,
                     array_to_string(t[i*{pt}+1 : i*{pt}+{pt}], ' ')
                         AS ptext
              FROM T0, LATERAL (SELECT unnest(range(0,
                  CAST((len(t)+{pt}-1)//{pt} AS BIGINT))) AS i)),
        TP AS (SELECT doc_id,
                      list_distinct(string_split(ptext, ' ')) AS toks,
                      replace(ptext, ' ', '') AS ns
               FROM P),
        H AS (SELECT doc_id,
               {hits}
              FROM TP),
        PL AS (SELECT doc_id,
               CASE WHEN {g} = 0 THEN 'unknown' {case} END AS lang
               FROM H),
        C AS (SELECT doc_id, lang, CAST(COUNT(*) AS BIGINT) AS c
              FROM PL GROUP BY 1, 2),
        M AS (SELECT doc_id, lang, c,
                     ROW_NUMBER() OVER (PARTITION BY doc_id
                         ORDER BY c DESC, lang ASC) AS rn,
                     SUM(c) OVER (PARTITION BY doc_id) AS np
              FROM C)
        SELECT t0.doc_id,
               CAST(COALESCE(m.np, 0) AS BIGINT) AS n_paras,
               COALESCE(m.lang, 'unknown') AS lang_major,
               CAST(COALESCE(m.c, 0) AS BIGINT) AS n_major,
               CAST(COALESCE((m.np - m.c) * 1000000 // m.np, 0)
                    AS BIGINT) AS mixed_ppm
        FROM T0 t0 LEFT JOIN (SELECT * FROM M WHERE rn = 1) m
            USING (doc_id)
    """


ORACLE_SQL["mixed_lang_docs"] = _mixed_lang_sql(16)


def q_windowed_dedup(sf_dir: str):
    """Calendar-windowed exact event dedup (at-least-once delivery
    cleanup): identical (user, type, props) events inside one hour
    collapse to their first occurrence with the suppressed count. Every
    5th event contributes a retry copy (+120 s, re-keyed id) so the
    collapse is hash-gated (ops/windows.py:windowed_dedup)."""
    from .ops.windows import windowed_dedup

    def aug(b: pa.Table) -> pa.Table:
        ids = pc.cast(b.column("event_id"), pa.int64())
        ids = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) \
            else ids
        keep = pc.equal(pc.subtract(ids, pc.multiply(
            pc.divide(ids, 5), 5)), 0)
        dup = b.filter(keep)
        dts = pc.cast(pc.add(
            pc.cast(pc.cast(dup.column("ts"), pa.timestamp("us")),
                    pa.int64()),
            pa.scalar(120_000_000, type=pa.int64())), pa.timestamp("us"))
        did = pc.add(pc.cast(dup.column("event_id"), pa.int64()),
                     pa.scalar(10_000_000, type=pa.int64()))
        cols = {"event_id": did, "user_id": dup.column("user_id"),
                "event_type": dup.column("event_type"),
                "props": dup.column("props"), "ts": dts}
        out = pa.table({n: b.column(n) for n in
                        ("event_id", "user_id", "event_type", "props",
                         "ts")})
        return pa.concat_tables([out, pa.table(cols)]) \
            .combine_chunks()

    ev = _events(sf_dir, ["event_id", "user_id", "event_type", "props",
                          "ts"]).map_batches(aug, batch_format="pyarrow")
    return windowed_dedup(ev, window_sec=3600)


QUERIES["windowed_dedup"] = q_windowed_dedup

ORACLE_SQL["windowed_dedup"] = """
    WITH E0 AS (SELECT event_id, user_id, event_type, props, ts
                FROM events),
    E AS (SELECT * FROM E0
          UNION ALL
          SELECT event_id + 10000000, user_id, event_type, props,
                 ts + INTERVAL 120 SECOND
          FROM E0 WHERE event_id % 5 = 0),
    F AS (SELECT *, epoch_us(ts) // 3600000000 AS bucket
          FROM E WHERE ts IS NOT NULL),
    R AS (SELECT event_id,
                 ROW_NUMBER() OVER (PARTITION BY user_id, event_type,
                     props, bucket ORDER BY ts, event_id) AS rn,
                 COUNT(*) OVER (PARTITION BY user_id, event_type,
                     props, bucket) AS c
          FROM F)
    SELECT event_id, CAST(c - 1 AS BIGINT) AS n_dups
    FROM R WHERE rn = 1
"""


def q_balanced_shards(sf_dir: str):
    """Token-balanced training-shard assignment: docs ranked by
    (n_tokens desc, id) dealt round-robin over 8 shards
    (ops/scan.py:balanced_shards — sorted-LPT layout, deterministic)."""
    from .ops.scan import balanced_shards
    return balanced_shards(_docs(sf_dir, ["doc_id", "text"]),
                           k_shards=8)


QUERIES["balanced_shards"] = q_balanced_shards

ORACLE_SQL["balanced_shards"] = f"""
    WITH T AS (SELECT doc_id,
                      CAST(len({_TOKENS}) AS BIGINT) AS n_tokens
               FROM documents)
    SELECT doc_id, n_tokens,
           CAST((ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id ASC)
                 - 1) % 8 AS BIGINT) AS shard
    FROM T
"""


def q_oov_rates(sf_dir: str):
    """Per-language OOV mass under a top-16 vocabulary budget: tokens,
    OOV occurrences, integer oov_ppm (ops/curation.py:oov_rates; the
    tokenizer-cap diagnostic paired with token_coverage)."""
    from .ops.curation import oov_rates
    return oov_rates(_docs(sf_dir, ["lang", "text"]), vocab_k=16,
                     group_col="lang")


QUERIES["oov_rates"] = q_oov_rates

ORACLE_SQL["oov_rates"] = f"""
    WITH H AS (SELECT lang, {_H60.format(s='tok')} AS h
               FROM (SELECT lang, unnest({_TOKENS}) AS tok
                     FROM documents)),
    C AS (SELECT h, COUNT(*) AS cnt FROM H GROUP BY h),
    TOP AS (SELECT h FROM C ORDER BY cnt DESC, h ASC LIMIT 16),
    S AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS tokens,
                 CAST(SUM(CASE WHEN t.h IS NULL THEN 1 ELSE 0 END)
                      AS BIGINT) AS oov
          FROM H LEFT JOIN TOP t USING (h) GROUP BY lang)
    SELECT lang, tokens, oov,
           CAST(oov * 1000000 // greatest(tokens, 1) AS BIGINT)
               AS oov_ppm
    FROM S
"""


def q_cdc_chunks(sf_dir: str):
    """Content-defined chunking over the planted media corpus: marker
    'ab' opens a boundary, so a truncated re-encode shares every chunk
    of its base up to the cut — the storage-dedup property whole-file
    hashing cannot give (ops/multimodal.py:cdc_chunks)."""
    from .ops.multimodal import cdc_chunks
    media = _docs(sf_dir, ["doc_id"]).map_batches(
        _media_variants, batch_format="pyarrow", batch_size=512)
    return cdc_chunks(media, marker=b"ab")


QUERIES["cdc_chunks"] = q_cdc_chunks

ORACLE_SQL["cdc_chunks"] = """
    WITH M AS (SELECT doc_id AS media_id,
                      md5(CAST(doc_id - (CASE WHEN doc_id % 5 = 4
                                               THEN 1 ELSE 0 END)
                               AS VARCHAR)) AS seed,
                      256 + CAST(('0x' || substr(md5(CAST(doc_id
                                       AS VARCHAR)), 1, 8)) AS BIGINT)
                          % 3840 AS nb
               FROM documents),
    P AS (SELECT media_id,
                 substr(repeat(seed, 128), 1, CAST(nb AS INT)) AS pay
          FROM M),
    S AS (SELECT media_id, 1 AS s FROM P
          UNION ALL
          SELECT media_id, i + 2 AS s
          FROM P, LATERAL (SELECT unnest(range(1, length(pay)))
                           AS i)
          WHERE substr(pay, CAST(i AS INT), 2) = 'ab'),
    S2 AS (SELECT media_id, s,
                  ROW_NUMBER() OVER (PARTITION BY media_id
                                     ORDER BY s) - 1 AS chunk_ix,
                  LEAD(s) OVER (PARTITION BY media_id
                                ORDER BY s) AS nxt
           FROM S),
    C AS (SELECT p.media_id, s2.chunk_ix,
                 CAST(COALESCE(s2.nxt, length(p.pay) + 1) - s2.s
                      AS BIGINT) AS chunk_len,
                 substr(p.pay, CAST(s2.s AS INT),
                        CAST(COALESCE(s2.nxt, length(p.pay) + 1)
                             - s2.s AS INT)) AS chunk
          FROM S2 JOIN P p USING (media_id))
    SELECT media_id, CAST(chunk_ix AS BIGINT) AS chunk_ix, chunk_len,
           CAST(('0x' || substr(md5(chunk), 1, 15)) AS BIGINT)
               AS chunk_hash
    FROM C WHERE chunk_len > 0
"""


def q_jl_project(sf_dir: str):
    """Exact-integer JL ±1 random projection of the embeddings to 4
    dims (md5-parity sign matrix, milli-quantized inputs — every output
    bit SQL-reproducible; ops/similarity.py:jl_project)."""
    import ray.data as rd
    from .ops.similarity import jl_project
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    return jl_project(emb, d_out=4)


QUERIES["jl_project"] = q_jl_project

ORACLE_SQL["jl_project"] = """
    WITH E AS (SELECT vec_id,
                      CAST(generate_subscripts(embedding, 1) AS BIGINT)
                          - 1 AS i,
                      CAST(floor(CAST(unnest(embedding) AS DOUBLE)
                                 * 1000) AS BIGINT) AS q
               FROM embeddings),
    D AS (SELECT MAX(i) + 1 AS d_in FROM E),
    R AS (SELECT i, j,
                 CASE WHEN CAST(('0x' || substr(md5(i || ':' || j), 1, 1))
                           AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS s
          FROM (SELECT unnest(range(0, (SELECT d_in FROM D))) AS i),
               (SELECT unnest(range(0, 4)) AS j))
    SELECT e.vec_id, CAST(r.j + 1 AS BIGINT) AS out_dim,
           CAST(SUM(e.q * r.s) AS BIGINT) AS value
    FROM E e JOIN R r USING (i)
    GROUP BY 1, 2
"""


def q_hard_negatives(sf_dir: str):
    """Contrastive hard-negative mining: exact cosine top-5 with a
    DIFFERENT label, for the first 5 labeled vectors (broadcast
    queries, local top-k, driver merge —
    ops/similarity.py:hard_negatives)."""
    import ray.data as rd
    from .ops.similarity import (hard_negatives,
                                 labeled_queries_from_dataset)
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding", "label"])
    q = labeled_queries_from_dataset(emb, n_queries=5)
    return hard_negatives(emb, q, k=5)


QUERIES["hard_negatives"] = q_hard_negatives

ORACLE_SQL["hard_negatives"] = """
    SELECT query_id, vec_id, rank FROM (
        SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(
                       CAST(q.embedding AS DOUBLE[]),
                       CAST(e.embedding AS DOUBLE[])) DESC,
                       e.vec_id ASC) AS rank
        FROM embeddings q, embeddings e
        WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id
              AND e.label <> q.label)
    WHERE rank <= 5
"""


def q_interval_coverage(sf_dir: str):
    """Per-user interval UNION coverage: each event opens
    [ts, ts + floor(value) minutes); overlaps merge — interval count,
    island count, covered microseconds
    (ops/windows.py:interval_coverage)."""
    from .ops.windows import interval_coverage
    return interval_coverage(
        _events(sf_dir, ["user_id", "ts", "value"]))


QUERIES["interval_coverage"] = q_interval_coverage

ORACLE_SQL["interval_coverage"] = """
    WITH I AS (SELECT user_id, epoch_us(ts) AS s,
                      epoch_us(ts) + CAST(floor(value) AS BIGINT)
                          * 60000000 AS e
               FROM events
               WHERE ts IS NOT NULL AND value IS NOT NULL
                     AND isfinite(value) AND value > 0),
    O AS (SELECT user_id, s, e,
                 MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS prev_max
          FROM I),
    G AS (SELECT user_id, s, e,
                 CASE WHEN prev_max IS NULL OR s > prev_max
                      THEN 1 ELSE 0 END AS brk
          FROM O),
    S AS (SELECT user_id, s, e,
                 SUM(brk) OVER (PARTITION BY user_id ORDER BY s, e
                                ROWS UNBOUNDED PRECEDING) AS gid
          FROM G),
    A AS (SELECT user_id, gid, MAX(e) - MIN(s) AS span,
                 COUNT(*) AS n
          FROM S GROUP BY 1, 2)
    SELECT user_id, CAST(SUM(n) AS BIGINT) AS n_intervals,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(span) AS BIGINT) AS covered_us
    FROM A GROUP BY user_id
"""


def q_k_anonymity(sf_dir: str):
    """k-anonymity audit over (lang, source, n_chars//500): the
    quasi-identifier groups with fewer than 5 members — each a
    re-identification risk (ops/normalize.py:k_anonymity_risk)."""
    from .ops.normalize import k_anonymity_risk

    def quasi(b: pa.Table) -> pa.Table:
        return pa.table({
            "lang": b.column("lang"),
            "source": b.column("source"),
            "len_bucket": pc.cast(pc.divide(
                pc.cast(b.column("n_chars"), pa.int64()),
                pa.scalar(500, type=pa.int64())), pa.int64())})

    ds = _docs(sf_dir, ["lang", "source", "n_chars"]).map_batches(
        quasi, batch_format="pyarrow")
    return k_anonymity_risk(ds, ["lang", "source", "len_bucket"], k=5)


QUERIES["k_anonymity"] = q_k_anonymity

ORACLE_SQL["k_anonymity"] = """
    SELECT lang, source, n_chars // 500 AS len_bucket,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM documents
    GROUP BY 1, 2, 3 HAVING COUNT(*) < 5
"""


def q_pseudonymize(sf_dir: str):
    """Consistent salted pseudonymization of (user_id, event_type) on
    events: same value → same 60-bit pseudonym everywhere, joins keep
    working, raw ids never leave the stage
    (ops/normalize.py:pseudonymize)."""
    from .ops.normalize import pseudonymize
    ev = _events(sf_dir, ["event_id", "user_id", "event_type"])
    return pseudonymize(ev, ["user_id", "event_type"], salt="s1")


QUERIES["pseudonymize"] = q_pseudonymize

ORACLE_SQL["pseudonymize"] = """
    SELECT event_id,
           CAST(('0x' || substr(md5('s1:' || CAST(user_id AS VARCHAR)),
                 1, 15)) AS BIGINT) AS user_id,
           CAST(('0x' || substr(md5('s1:' || event_type), 1, 15))
                AS BIGINT) AS event_type
    FROM events
"""


_CANON_TERMS = ["join", "joinn", "hsah", "customer", "custmer",
                "vectr", "zzzz"]


def q_edit1_join(sf_dir: str):
    """Record linkage: the corpus vocabulary fuzzy-joined (edit
    distance ≤ 1, exact matches included) against a canonical term
    list with injected typos (ops/text.py:edit1_join — two-sided
    SymSpell blocking, cross-side expansion only)."""
    import ray.data as rd
    from .ops.text import edit1_join

    def vocab(b: pa.Table) -> pa.Table:
        from .ops.text import _token_lists
        toks = pc.list_flatten(_token_lists(b.column("text")))
        import numpy as np
        u = np.unique(np.array(toks.to_pylist(), dtype=object))
        return pa.table({"token": pa.array(u.tolist(),
                                           type=pa.string())})

    left = _docs(sf_dir, ["text"]).map_batches(
        vocab, batch_format="pyarrow")
    right = rd.from_arrow(pa.table({"token": pa.array(
        _CANON_TERMS, type=pa.string())}))
    return edit1_join(left, right)


QUERIES["edit1_join"] = q_edit1_join

ORACLE_SQL["edit1_join"] = f"""
    WITH V AS (SELECT DISTINCT tok AS token_l
               FROM (SELECT unnest({_TOKENS}) AS tok FROM documents)),
    C AS (SELECT unnest(['join', 'joinn', 'hsah', 'customer',
                         'custmer', 'vectr', 'zzzz']) AS token_r)
    SELECT token_l, token_r
    FROM V, C
    WHERE levenshtein(token_l, token_r) <= 1
"""


def q_session_paths(sf_dir: str):
    """Within-session event-type trigram counts (30-min gap sessions):
    the behavioral-path signal global bigrams smear across session
    boundaries (ops/windows.py:session_paths)."""
    from .ops.windows import session_paths
    return session_paths(_events(
        sf_dir, ["event_id", "user_id", "ts", "event_type"]))


QUERIES["session_paths"] = q_session_paths

ORACLE_SQL["session_paths"] = """
    WITH E AS (SELECT user_id, ts, event_id, event_type
               FROM events WHERE ts IS NOT NULL),
    S AS (SELECT *,
                 SUM(CASE WHEN prev IS NULL OR date_diff('microsecond',
                              prev, ts) > 1800000000
                          THEN 1 ELSE 0 END)
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sess
          FROM (SELECT *, LAG(ts) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev FROM E)),
    T AS (SELECT user_id, sess, event_type AS t1,
                 LEAD(event_type, 1) OVER w AS t2,
                 LEAD(event_type, 2) OVER w AS t3,
                 LEAD(sess, 2) OVER w AS sess3
          FROM S WINDOW w AS (PARTITION BY user_id, sess
                              ORDER BY ts, event_id))
    SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS n
    FROM T WHERE t3 IS NOT NULL GROUP BY 1, 2, 3
"""


def q_dedup_savings(sf_dir: str):
    """Per-language dedup savings: docs/tokens before vs after exact
    content dedup + integer savings ppm — the datasheet line that
    justifies the dedup stage per slice
    (ops/dedup.py:dedup_savings)."""
    from .ops.dedup import dedup_savings
    return dedup_savings(_docs(sf_dir, ["doc_id", "text", "lang"]))


QUERIES["dedup_savings"] = q_dedup_savings

ORACLE_SQL["dedup_savings"] = f"""
    WITH T AS (SELECT doc_id, lang, text,
                      CAST(len({_TOKENS}) AS BIGINT) AS nt
               FROM documents),
    K AS (SELECT MIN(doc_id) AS keep FROM T GROUP BY text),
    J AS (SELECT t.*, CASE WHEN k.keep IS NULL THEN 0 ELSE 1 END
              AS kept
          FROM T t LEFT JOIN K k ON t.doc_id = k.keep)
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS docs,
           CAST(SUM(nt) AS BIGINT) AS tokens,
           CAST(SUM(kept) AS BIGINT) AS docs_kept,
           CAST(SUM(nt * kept) AS BIGINT) AS tokens_kept,
           CAST((SUM(nt) - SUM(nt * kept)) * 1000000
                // greatest(SUM(nt), 1) AS BIGINT) AS savings_ppm
    FROM J GROUP BY lang
"""


def q_join_cardinality(sf_dir: str):
    """Plan-time join-size estimate for orders ⋈ lineitem on orderkey:
    exact pair count and hottest keys from per-key count partials —
    the broadcast/salt decision input, computed without running the
    join (ops/join.py:join_cardinality)."""
    import ray.data as rd
    from .ops.join import join_cardinality
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey"])
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey"])
    return join_cardinality(orders, li, "o_orderkey", "l_orderkey",
                            k=10)


QUERIES["join_cardinality"] = q_join_cardinality

ORACLE_SQL["join_cardinality"] = """
    WITH L AS (SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS nl
               FROM orders GROUP BY 1),
    R AS (SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS nr
          FROM lineitem GROUP BY 1),
    J AS (SELECT k, nl, nr, nl * nr AS pairs FROM L JOIN R USING (k)),
    T AS (SELECT SUM(pairs) AS total FROM J)
    SELECT k AS key, nl, nr, pairs,
           CAST(pairs * 1000000 // total AS BIGINT) AS share_ppm
    FROM J, T ORDER BY pairs DESC, k ASC LIMIT 10
"""


def q_kwic_snippets(sf_dir: str):
    """Keyword-in-context: ±3-token snippets around every occurrence
    of the standard query terms (ops/text.py:kwic_snippets — the
    snippet step after retrieval; one vectorized pass, no exchange)."""
    from .ops.text import kwic_snippets
    return kwic_snippets(_docs(sf_dir, ["doc_id", "text"]),
                         ["join", "slow"], window=3)


QUERIES["kwic_snippets"] = q_kwic_snippets

ORACLE_SQL["kwic_snippets"] = f"""
    WITH T AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
    P AS (SELECT doc_id, t,
                 CAST(generate_subscripts(t, 1) AS BIGINT) AS i,
                 unnest(t) AS tok
          FROM T)
    SELECT doc_id, i - 1 AS pos, tok AS term,
           array_to_string(t[greatest(i - 3, 1):least(i + 3, len(t))],
                           ' ') AS snippet
    FROM P WHERE tok IN ('join', 'slow')
"""


def q_weighted_median_len(sf_dir: str):
    """Token-weighted doc-length quantiles (p50/p90): the length at
    which half (90%) of corpus TOKENS live in docs at least that long
    — the unweighted median understates it
    (ops/stats.py:weighted_quantile_disc)."""
    from .ops.stats import weighted_quantile_disc
    from .ops.text import _token_lists

    def lens(b: pa.Table) -> pa.Table:
        toks = _token_lists(b.column("text"))
        n = pc.cast(pc.list_value_length(toks), pa.int64())
        return pa.table({"n_tokens": n, "w": n})

    ds = _docs(sf_dir, ["text"]).map_batches(lens,
                                             batch_format="pyarrow")
    return weighted_quantile_disc(ds, "n_tokens", "w", [0.5, 0.9])


QUERIES["weighted_median_len"] = q_weighted_median_len

ORACLE_SQL["weighted_median_len"] = f"""
    WITH T AS (SELECT CAST(len({_TOKENS}) AS BIGINT) AS v FROM documents),
    A AS (SELECT v, SUM(v) AS w FROM T GROUP BY v),
    S AS (SELECT v, w,
                 SUM(w) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                     AS cw,
                 SUM(w) OVER () AS tot
          FROM A),
    Q AS (SELECT unnest([500000, 900000]) AS q_ppm)
    SELECT q_ppm, v AS value, CAST(cw AS BIGINT) AS cum_weight,
           CAST(tot AS BIGINT) AS total_weight
    FROM Q, LATERAL (
        SELECT v, cw, tot FROM S
        WHERE cw >= -((-q_ppm * tot) // 1000000)
        ORDER BY v LIMIT 1)
"""


def q_activity_concentration(sf_dir: str):
    """Per-user Simpson concentration (ppm) of the event-type mix —
    10⁶ = single-behavior bot signature
    (ops/windows.py:activity_concentration)."""
    from .ops.windows import activity_concentration
    return activity_concentration(
        _events(sf_dir, ["user_id", "event_type"]))


QUERIES["activity_concentration"] = q_activity_concentration

ORACLE_SQL["activity_concentration"] = """
    WITH C AS (SELECT user_id, event_type,
                      CAST(COUNT(*) AS BIGINT) AS c
               FROM events GROUP BY 1, 2)
    SELECT user_id, CAST(SUM(c) AS BIGINT) AS n_events,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(c * (c - 1)) * 1000000
                // greatest(SUM(c) * (SUM(c) - 1), 1) AS BIGINT)
               AS conc_ppm
    FROM C GROUP BY user_id
"""


def q_activity_streaks(sf_dir: str):
    """Per-user consecutive-day streaks: active days, streak count,
    longest streak (ops/windows.py:activity_streaks)."""
    from .ops.windows import activity_streaks
    return activity_streaks(_events(sf_dir, ["user_id", "ts"]))


QUERIES["activity_streaks"] = q_activity_streaks

ORACLE_SQL["activity_streaks"] = """
    WITH D AS (SELECT DISTINCT user_id,
                      epoch_us(ts) // 86400000000 AS day
               FROM events WHERE ts IS NOT NULL),
    S AS (SELECT user_id, day,
                 day - ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY day) AS grp
          FROM D),
    R AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS run
          FROM S GROUP BY user_id, grp)
    SELECT user_id, CAST(SUM(run) AS BIGINT) AS active_days,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(MAX(run) AS BIGINT) AS max_streak
    FROM R GROUP BY user_id
"""


def q_url_structure(sf_dir: str):
    """Per-host URL structure: page count, integer avg path depth
    (milli-units), query-string fraction ppm — crawl-frontier shape
    stats over the flagship pages corpus."""
    import ray.data as rd
    from ray.data.aggregate import Sum
    pages = rd.read_parquet(_ensure_pages(sf_dir), columns=["url"])

    def partial(b: pa.Table) -> pa.Table:
        url = b.column("url")
        url = url.combine_chunks() if isinstance(url, pa.ChunkedArray) \
            else url
        host = pc.extract_regex(
            url, r"^[a-z][a-z0-9+.\-]*://(?P<h>[^/?#:]+)")
        h = pc.struct_field(host, "h")
        path = pc.struct_field(pc.extract_regex(
            url, r"^[a-z][a-z0-9+.\-]*://[^/?#:]+(?P<p>[^?#]*)"), "p")
        path = pc.fill_null(path, "")
        depth = pc.subtract(
            pc.utf8_length(path),
            pc.utf8_length(pc.replace_substring(path, "/", "")))
        has_q = pc.match_substring(url, "?")
        t = pa.table({"url_host": h,
                      "depth": pc.cast(depth, pa.int64()),
                      "q": pc.cast(has_q, pa.int64())})
        g = t.group_by(["url_host"]).aggregate(
            [("depth", "sum"), ("q", "sum"), ([], "count_all")])
        return pa.table({"url_host": g.column("url_host"),
                         "d_part": g.column("depth_sum"),
                         "q_part": g.column("q_sum"),
                         "n_part": pc.cast(g.column("count_all"),
                                           pa.int64())})

    agg = pages.map_batches(partial, batch_format="pyarrow") \
        .groupby("url_host").aggregate(
            Sum("n_part", alias_name="n"),
            Sum("d_part", alias_name="d"),
            Sum("q_part", alias_name="nq"))

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy()
        d = b.column("d").to_numpy()
        nq = b.column("nq").to_numpy()
        return pa.table({
            "url_host": b.column("url_host"),
            "n": b.column("n"),
            "avg_depth_milli": pa.array(d * 1000 // n, type=pa.int64()),
            "query_ppm": pa.array(nq * 1_000_000 // n,
                                  type=pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")


QUERIES["url_structure"] = q_url_structure

ORACLE_SQL["url_structure"] = f"""
    WITH P AS (SELECT url,
        regexp_extract(url, '^[a-z][a-z0-9+.\\-]*://([^/?#:]+)', 1)
            AS url_host,
        COALESCE(regexp_extract(url,
            '^[a-z][a-z0-9+.\\-]*://[^/?#:]+([^?#]*)', 1), '') AS path,
        CASE WHEN contains(url, '?') THEN 1 ELSE 0 END AS q
        FROM read_parquet('/tmp/l2sr_flagship_pages/*.parquet')),
    D AS (SELECT url_host,
                 CAST(length(path) - length(replace(path, '/', ''))
                      AS BIGINT) AS depth, q
          FROM P)
    SELECT url_host, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(depth) * 1000 // COUNT(*) AS BIGINT)
               AS avg_depth_milli,
           CAST(SUM(q) * 1000000 // COUNT(*) AS BIGINT) AS query_ppm
    FROM D GROUP BY url_host
"""


def q_hour_profile(sf_dir: str):
    """Hour-of-day seasonality profile per event type: counts and
    within-type share ppm over the 24 UTC hours — the diurnal
    fingerprint (bot traffic is flat; human traffic isn't)."""
    from ray.data.aggregate import Sum
    ev = _events(sf_dir, ["event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        f = b.filter(pc.is_valid(b.column("ts")))
        us = pc.cast(pc.cast(f.column("ts"), pa.timestamp("us")),
                     pa.int64())
        hour = pc.divide(
            pc.subtract(us, pc.multiply(pc.divide(
                us, pa.scalar(86_400_000_000, type=pa.int64())),
                pa.scalar(86_400_000_000, type=pa.int64()))),
            pa.scalar(3_600_000_000, type=pa.int64()))
        t = pa.table({"event_type": f.column("event_type"),
                      "hour": hour})
        g = t.group_by(["event_type", "hour"]).aggregate(
            [([], "count_all")])
        return pa.table({"event_type": g.column("event_type"),
                         "hour": g.column("hour"),
                         "n_part": pc.cast(g.column("count_all"),
                                           pa.int64())})

    agg = ev.map_batches(partial, batch_format="pyarrow") \
        .groupby(["event_type", "hour"]).aggregate(
            Sum("n_part", alias_name="n"))

    # per-type totals are ≤ types×24 rows — broadcast-back pattern
    import ray
    tot = agg.groupby("event_type").aggregate(
        Sum("n", alias_name="tot")).to_pandas()
    totals = dict(zip(tot["event_type"], tot["tot"]))
    ref = ray.put(totals)

    def share(b: pa.Table) -> pa.Table:
        import numpy as np
        tm = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        t = np.array([tm[v] for v in
                      b.column("event_type").to_pylist()],
                     dtype=np.int64)
        n = b.column("n").to_numpy()
        return b.append_column("share_ppm", pa.array(
            n * 1_000_000 // t, type=pa.int64()))

    return agg.map_batches(share, batch_format="pyarrow")


QUERIES["hour_profile"] = q_hour_profile

ORACLE_SQL["hour_profile"] = """
    WITH H AS (SELECT event_type,
                      (epoch_us(ts) % 86400000000) // 3600000000
                          AS hour
               FROM events WHERE ts IS NOT NULL),
    C AS (SELECT event_type, hour, CAST(COUNT(*) AS BIGINT) AS n
          FROM H GROUP BY 1, 2)
    SELECT event_type, hour, n,
           CAST(n * 1000000 // SUM(n) OVER (PARTITION BY event_type)
                AS BIGINT) AS share_ppm
    FROM C
"""


def q_source_budget(sf_dir: str):
    """Source token-budget concentration: sources ranked by token mass
    with running share ppm — "how many sources hold 90% of the
    corpus", the mix-concentration datasheet line (pure partial
    aggregation; the source space is bounded)."""
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        from .ops.text import _token_lists
        toks = _token_lists(b.column("text"))
        t = pa.table({"source": b.column("source"),
                      "nt": pc.cast(pc.list_value_length(toks),
                                    pa.int64())})
        g = t.group_by(["source"]).aggregate([("nt", "sum"),
                                              ([], "count_all")])
        return pa.table({"source": g.column("source"),
                         "t_part": g.column("nt_sum"),
                         "d_part": pc.cast(g.column("count_all"),
                                           pa.int64())})

    agg = _docs(sf_dir, ["source", "text"]).map_batches(
        partial, batch_format="pyarrow").groupby("source").aggregate(
        Sum("t_part", alias_name="tokens"),
        Sum("d_part", alias_name="docs")).to_pandas()
    agg = agg.sort_values(["tokens", "source"],
                          ascending=[False, True]).reset_index(drop=True)
    agg["rank"] = agg.index.to_numpy() + 1
    cum = agg["tokens"].cumsum()
    agg["tokens_cum"] = cum
    agg["share_cum_ppm"] = cum * 1_000_000 // int(agg["tokens"].sum())
    return agg[["rank", "source", "docs", "tokens", "tokens_cum",
                "share_cum_ppm"]].astype(
        {c: "int64" for c in ("rank", "docs", "tokens", "tokens_cum",
                              "share_cum_ppm")})


QUERIES["source_budget"] = q_source_budget

ORACLE_SQL["source_budget"] = f"""
    WITH A AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS docs,
                      CAST(SUM(len({_TOKENS})) AS BIGINT) AS tokens
               FROM documents GROUP BY source),
    R AS (SELECT *, ROW_NUMBER() OVER (ORDER BY tokens DESC,
                                       source ASC) AS rank,
                 SUM(tokens) OVER (ORDER BY tokens DESC, source ASC
                                   ROWS UNBOUNDED PRECEDING)
                     AS tokens_cum,
                 SUM(tokens) OVER () AS tot
          FROM A)
    SELECT CAST(rank AS BIGINT) AS rank, source, docs, tokens,
           CAST(tokens_cum AS BIGINT) AS tokens_cum,
           CAST(tokens_cum * 1000000 // tot AS BIGINT)
               AS share_cum_ppm
    FROM R
"""


def q_winsorize(sf_dir: str):
    """Per-type winsorization of the value column (centi-bin units,
    p1/p99 clip + clip flags) — the outlier-robust rewrite
    (ops/stats.py:winsorize_by_group; bounds from bounded-shuffle
    binned quantiles, broadcast-back, vectorized clip)."""
    from .ops.stats import winsorize_by_group
    return winsorize_by_group(
        _events(sf_dir, ["event_id", "event_type", "value"]),
        "event_type", "value", "event_id", lo_q=0.01, hi_q=0.99,
        scale=100)


QUERIES["winsorize"] = q_winsorize

ORACLE_SQL["winsorize"] = """
    WITH F AS (SELECT event_id, event_type,
                      CAST(floor(value * 100) AS BIGINT) AS b
               FROM events
               WHERE value IS NOT NULL AND isfinite(value)),
    Q AS (SELECT event_type,
                 quantile_disc(b, 0.01) AS lo,
                 quantile_disc(b, 0.99) AS hi
          FROM F GROUP BY 1)
    SELECT event_id, f.event_type,
           CAST(CASE WHEN b < lo THEN lo WHEN b > hi THEN hi
                     ELSE b END AS BIGINT) AS bin_clipped,
           CAST(CASE WHEN b < lo THEN -1 WHEN b > hi THEN 1
                     ELSE 0 END AS BIGINT) AS clip_flag
    FROM F f JOIN Q USING (event_type)
"""


def q_rrf_search(sf_dir: str):
    """Reciprocal-rank fusion of the integer-idf and integer-BM25
    top-20 lists (score = Σ 10⁶ // (60 + rank)) — the standard
    rank-fusion step when two retrieval signals disagree; both input
    rankings are the already-driver-merged k-row frames, so fusion is
    O(k) on bounded data."""
    kw = q_keyword_search(sf_dir)
    bm = q_bm25_search(sf_dir)
    import pandas as pd
    scores: dict[int, int] = {}
    for df in (kw, bm):
        df = df.sort_values(["score", "doc_id"],
                            ascending=[False, True]).reset_index(
            drop=True)
        for r, d in enumerate(df["doc_id"], start=1):
            scores[int(d)] = scores.get(int(d), 0) \
                + 1_000_000 // (60 + r)
    out = pd.DataFrame(sorted(scores.items(),
                              key=lambda kv: (-kv[1], kv[0]))[:20],
                       columns=["doc_id", "score"]).astype("int64")
    return out


QUERIES["rrf_search"] = q_rrf_search


# Composed at import time from the RENDERED search oracles, so the
# fused ranking is definitionally consistent with both inputs.
ORACLE_SQL["rrf_search"] = f"""
    WITH KW AS ({ORACLE_SQL["keyword_search"]}),
    BM AS ({ORACLE_SQL["bm25_search"]}),
    KR AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC,
               doc_id ASC) AS r FROM KW),
    BR AS (SELECT doc_id, ROW_NUMBER() OVER (ORDER BY score DESC,
               doc_id ASC) AS r FROM BM),
    U AS (SELECT doc_id, 1000000 // (60 + r) AS s FROM KR
          UNION ALL
          SELECT doc_id, 1000000 // (60 + r) FROM BR)
    SELECT doc_id, CAST(SUM(s) AS BIGINT) AS score
    FROM U GROUP BY doc_id
    ORDER BY score DESC, doc_id ASC LIMIT 20
"""


def q_dedup_agreement(sf_dir: str):
    """Method-agreement report: the exact 4-gram Jaccard≥1/2 pair set
    vs the containment≥9/10 pair set on the SAME raw corpus —
    (n_both, n_jaccard_only, n_containment_only). The meta-evaluation
    that says what switching thresholds/methods would actually change.
    Pair sets meet in one composite-key full-outer hash join; only
    three counters leave."""
    import ray.data as rd
    from ray.data.aggregate import Sum
    from .ops.curation import containment_dups, ngram_jaccard_dups
    from .ops.join import hash_join
    docs = _docs(sf_dir, ["doc_id", "text"])
    j = ngram_jaccard_dups(docs, window=4, tau_num=1, tau_den=2,
                           max_df=64).map_batches(
        lambda b: b.select(["id_a", "id_b"]).append_column(
            "in_j", pa.array([1] * b.num_rows, type=pa.int64())),
        batch_format="pyarrow")
    c = containment_dups(docs, window=4, tau_num=9, tau_den=10,
                         max_df=64).map_batches(
        lambda b: b.select(["id_a", "id_b"]).append_column(
            "in_c", pa.array([1] * b.num_rows, type=pa.int64())),
        batch_format="pyarrow")
    joined = hash_join(j, c, ["id_a", "id_b"], ["id_a", "id_b"],
                       how="full")

    def counts(b: pa.Table) -> pa.Table:
        ij = pc.fill_null(b.column("in_j"), 0).to_numpy()
        icv = pc.fill_null(b.column("in_c"), 0).to_numpy()
        return pa.table({
            "k": pa.array([0], type=pa.int64()),
            "b_p": pa.array([int((ij & icv).sum())], type=pa.int64()),
            "j_p": pa.array([int((ij & ~icv.astype(bool)).sum())],
                            type=pa.int64()),
            "c_p": pa.array([int((icv & ~ij.astype(bool)).sum())],
                            type=pa.int64())})

    out = joined.map_batches(counts, batch_format="pyarrow") \
        .groupby("k").aggregate(
            Sum("b_p", alias_name="n_both"),
            Sum("j_p", alias_name="n_jaccard_only"),
            Sum("c_p", alias_name="n_containment_only")).map_batches(
        lambda b: b.select(["n_both", "n_jaccard_only",
                            "n_containment_only"]),
        batch_format="pyarrow")
    return out


QUERIES["dedup_agreement"] = q_dedup_agreement

ORACLE_SQL["dedup_agreement"] = f"""
    WITH T AS (SELECT doc_id, {_TOKENS} AS t FROM documents),
    SH AS (SELECT doc_id, list_distinct(list_transform(
              CASE WHEN len(t) = 0 THEN ['']
                   WHEN len(t) < 4 THEN [array_to_string(t, ' ')]
                   ELSE list_transform(range(1, len(t) - 2),
                       i -> array_to_string(t[i:i+3], ' ')) END,
              s -> {_H60.format(s='s')})) AS gs
           FROM T),
    EX0 AS (SELECT doc_id, unnest(gs) AS g FROM SH),
    DF AS (SELECT g, COUNT(*) AS df FROM EX0 GROUP BY g),
    EX AS (SELECT e.doc_id, e.g FROM EX0 e JOIN DF USING (g)
           WHERE df <= 64),
    SZ AS (SELECT doc_id, COUNT(*) AS sz FROM EX GROUP BY doc_id),
    I AS (SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS inter
          FROM EX a JOIN EX b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
    J AS (SELECT CASE WHEN inter * 3 >= sa.sz + sb.sz
                      THEN 1 ELSE 0 END AS in_j,
                 CASE WHEN inter * 10 >= 9 * least(sa.sz, sb.sz)
                      THEN 1 ELSE 0 END AS in_c
          FROM I JOIN SZ sa ON sa.doc_id = ia
                 JOIN SZ sb ON sb.doc_id = ib)
    SELECT CAST(SUM(in_j * in_c) AS BIGINT) AS n_both,
           CAST(SUM(in_j * (1 - in_c)) AS BIGINT) AS n_jaccard_only,
           CAST(SUM(in_c * (1 - in_j)) AS BIGINT)
               AS n_containment_only
    FROM J
"""


def q_quality_percentiles(sf_dir: str):
    """Cross-lingual quality normalization: each doc's distinct-token
    count mapped to its within-LANG percent-rank ppm (RANK−1 over
    n−1, DuckDB PERCENT_RANK convention) — the score that makes
    quality thresholds comparable across languages with different raw
    distributions. Composition: quality partial → group_value_rank
    (one lang exchange) → broadcast-back group sizes."""
    import ray
    from ray.data.aggregate import Count
    from .ops.stats import group_value_rank
    from .ops.text import quality_scores

    def partial(b: pa.Table) -> pa.Table:
        q = quality_scores(b)
        return pa.table({"doc_id": q.column("doc_id"),
                         "lang": b.column("lang"),
                         "n_distinct": q.column("n_uniq_tokens")})

    scored = _docs(sf_dir, ["doc_id", "lang", "text"]).map_batches(
        partial, batch_format="pyarrow")
    ranked = group_value_rank(scored, "lang", "n_distinct", "doc_id")
    sizes = scored.groupby("lang").count().to_pandas()
    nmap = dict(zip(sizes["lang"], sizes["count()"]))
    ref = ray.put(nmap)

    def ppm(b: pa.Table) -> pa.Table:
        import numpy as np
        nm = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        n = np.array([nm[v] for v in b.column("lang").to_pylist()],
                     dtype=np.int64)
        r = b.column("rnk").to_numpy()
        out = np.where(n > 1, r * 1_000_000 // np.maximum(n - 1, 1), 0)
        return pa.table({"doc_id": b.column("doc_id"),
                         "lang": b.column("lang"),
                         "pct_ppm": pa.array(out.astype(np.int64))})

    return ranked.map_batches(ppm, batch_format="pyarrow")


QUERIES["quality_percentiles"] = q_quality_percentiles

ORACLE_SQL["quality_percentiles"] = f"""
    WITH Q AS (SELECT doc_id, lang,
                      CAST(len(list_distinct({_TOKENS})) AS BIGINT)
                          AS v
               FROM documents),
    R AS (SELECT doc_id, lang, v,
                 RANK() OVER (PARTITION BY lang ORDER BY v) - 1 AS r,
                 COUNT(*) OVER (PARTITION BY lang) AS n
          FROM Q)
    SELECT doc_id, lang,
           CAST(CASE WHEN n > 1 THEN r * 1000000 // (n - 1)
                     ELSE 0 END AS BIGINT) AS pct_ppm
    FROM R
"""


def q_join_auto(sf_dir: str):
    """lineitem ⋈ orders through hash_join(strategy="auto"): the planner
    consults the two row counts, broadcasts the (small) orders side at
    gate scale, and derives the hot-key threshold on bigger inputs —
    same result set as the explicit bucket path, verified by the same
    aggregate oracle (ops/join.py:plan_join_strategy)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from .ops.join import hash_join

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])
    orders = _orders(sf_dir, ["o_orderkey", "o_orderstatus"])
    j = hash_join(li, orders, "l_orderkey", "o_orderkey",
                  strategy="auto")

    def partial(b: pa.Table) -> pa.Table:
        t = pa.table({
            "o_orderstatus": b.column("o_orderstatus"),
            "qty": pc.cast(b.column("l_quantity"), pa.int64()),
        })
        g = t.group_by(["o_orderstatus"]).aggregate(
            [("qty", "sum"), ([], "count_all")])
        return pa.table({"o_orderstatus": g.column("o_orderstatus"),
                         "partial_q": g.column("qty_sum"),
                         "partial_n": g.column("count_all")})

    return j.map_batches(partial, batch_format="pyarrow") \
        .groupby("o_orderstatus").aggregate(
            Sum("partial_q", alias_name="sum_qty"),
            Sum("partial_n", alias_name="n"))


QUERIES["join_auto"] = q_join_auto

ORACLE_SQL["join_auto"] = ORACLE_SQL["lineitem_join"]

"""Flagship pipeline: read → parse → enrich → route → aggregate.

The engine's end-to-end job (the north star's streaming
parse→enrich→route→aggregate over Common-Crawl-style pages):

1. ``read_parquet`` documents (column-pruned) → synthesize web pages
   (url, warc_ts, html, text, lang) inside ``map_batches``;
2. ``ParseStage`` actor pool — explode lines + compiled header/statement
   kernels (state built once per actor);
3. ``EnrichStage`` — broadcast lang lookup (``ray.put`` once), severity,
   route key; no shuffle;
4. ``add_template`` — vectorized variable-token masking;
5. routed fan-out sink — each task writes its batch's rows into
   ``route=<key>/`` parquet (no shuffle; the reference's per-sink writers,
   SURVEY §2.1 S6) — optional;
6. per-batch partial counts (template × route) → ONE small shuffle →
   final merged counts.

The whole job streams: nothing materializes the full dataset; the only
all-to-all exchange carries pre-aggregated partials.
"""

from __future__ import annotations

import os
import uuid
from pathlib import Path
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..sources.webpages import read_webpages, flagship_header_rules
from ..rules.presets import default_statement_actions
from ..stages.parse import ParseStage
from ..stages.enrich import (EnrichStage, DEFAULT_LANG_CLASSES,
                             route_deadletter)
from ..stages.aggregate import (add_template, template_partial_counts,
                                merge_template_counts)


class RoutedWriter:
    """Pass-through actor that fans each batch out to per-route parquet
    files under ``out_dir/route=<key>/`` — a routed multi-sink without a
    shuffle.

    RETRY-IDEMPOTENT: the file name is a digest of the written content
    (Arrow IPC bytes), and the write goes to a temp file + atomic
    ``os.replace`` — a retried task reproduces the identical bytes, lands
    on the same name, and replaces rather than duplicates. (Two distinct
    batches only collide if their selected content is byte-identical,
    impossible while the key columns ``url``/``line_no`` are in ``cols``.)
    """

    def __init__(self, out_dir: Optional[str], cols: tuple = (
            "url", "line_no", "timestamp", "severity", "lang_class",
            "route", "template", "message")):
        self.out_dir = out_dir
        self.cols = cols

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.out_dir is None:
            return batch
        import hashlib
        routes = batch.column("route")
        for route in pc.unique(routes).to_pylist():
            sub = batch.filter(pc.equal(routes, route))
            keep = [c for c in self.cols if c in sub.column_names]
            tbl = sub.select(keep)
            # digest the KEY columns' buffers only (url+line_no uniquely
            # identify rows) — hashing the full content via IPC doubled the
            # sink cost at bench scale
            h = hashlib.blake2b(digest_size=12)
            h.update(str(route).encode())
            key_cols = [c for c in ("url", "line_no") if c in keep] or keep
            for c in key_cols:
                col = tbl.column(c).combine_chunks()
                for buf in col.buffers():
                    if buf is not None:
                        h.update(buf)
            digest = h.hexdigest()
            d = Path(self.out_dir) / f"route={route}"
            d.mkdir(parents=True, exist_ok=True)
            final = d / f"part-{digest}.parquet"
            tmp = d / f".part-{digest}.{uuid.uuid4().hex[:6]}.tmp"
            pq.write_table(tbl, tmp)
            os.replace(tmp, final)
        return batch


class FusedFlagshipStage:
    """Parse → enrich → template → (optional routed write) → partial counts,
    fused into ONE actor so only tiny count partials leave the stage.

    Why fused: each actor pool RESERVES its ``num_cpus`` for the whole run —
    stacking a 30-actor parse pool and an 8-actor enrich pool on a 32-CPU
    node leaves the downstream pool starved (observed: a 7s parse pipeline
    ballooning to 170s). Fusing also keeps the wide ``words``/``symbols``
    list columns out of the object store entirely: per 2M rows that is
    ~600 MB per avoided stage hop. The modular stages remain available for
    composition; this is the scale path for the flagship job.
    """

    def __init__(self, rules, actions, lang_lookup=None,
                 sink_dir: Optional[str] = None,
                 columns: tuple = ("url", "text", "lang")):
        # one Arrow thread per 1-CPU actor: Table.group_by (Acero) otherwise
        # spins a hardware-concurrency thread pool in EVERY worker — 30
        # actors x 32 threads thrash the node (observed 12x UDF slowdown)
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
        self.parse = ParseStage(rules, actions)
        self.enrich = EnrichStage(dict(lang_lookup or DEFAULT_LANG_CLASSES))
        self.writer = RoutedWriter(sink_dir) if sink_dir else None
        self.columns = list(columns)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if "path" in batch.column_names and "text" not in batch.column_names:
            # file-shard mode: the batch carries input-shard PATHS; read the
            # shard here so raw page text never crosses the object store
            # (measured ~0.5 core-s per plasma block vs ~0.05s direct read)
            # and read work shares the actor pool's CPUs instead of starving
            # on the few unreserved ones.
            tables = [pq.read_table(p, columns=self.columns,
                                    use_threads=False)
                      for p in batch.column("path").to_pylist()]
            batch = pa.concat_tables(tables)
            if batch.num_rows == 0:
                # an empty shard file still yields a typed empty output
                # (the 512-slice loop would leave concat_tables nothing)
                return self._process(batch)
            out_chunks = []
            for lo in range(0, batch.num_rows, 512):
                out_chunks.append(self._process(batch.slice(lo, 512)))
            return pa.concat_tables(out_chunks)
        return self._process(batch)

    def _process(self, batch: pa.Table) -> pa.Table:
        t = self.parse(batch)
        t = self.enrich(t)
        t = route_deadletter(t)
        t = add_template(t)
        if self.writer is not None:
            self.writer(t)
        return template_partial_counts(t, by=("route",))


def _node_cpus(cpus: Optional[int]) -> int:
    if cpus is not None:
        return cpus
    try:
        import ray
        return int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        return 8


def _pool(cpus: Optional[int]) -> int:
    cpus = _node_cpus(cpus)
    # leave real headroom for the read + reduce stages: actor pools RESERVE
    # their CPUs for the whole run, and a starved read serializes the
    # pipeline (observed: a ~20 core-s parquet read taking 10s on the 2
    # leftover CPUs)
    return max(2, cpus - max(2, cpus // 8))


def build_parsed_dataset(sf_dir: str, cpus: Optional[int] = None,
                         sink_dir: Optional[str] = None,
                         lang_lookup: Optional[dict] = None,
                         repeat: int = 1,
                         corpus_dir: Optional[str] = None):
    """web pages (from a materialized corpus_dir, or synthesized on the fly
    from documents.parquet) → enriched, routed, templated record Dataset."""
    import ray
    import ray.data as rd

    pool = _pool(cpus)
    if corpus_dir is not None:
        # a real corpus on disk: prune to the columns the pipeline needs
        pages = rd.read_parquet(corpus_dir, columns=["url", "text", "lang"])
        parse_batch_size = 256
    else:
        pages = read_webpages(sf_dir, repeat=repeat)
        # synthesize fuses into the parse stage; keep the *input-row* batch
        # small so each fused task handles ~5k lines, not repeat x that
        parse_batch_size = max(1, 256 // max(1, repeat))
    rules = flagship_header_rules()
    actions = default_statement_actions()

    parsed = pages.map_batches(
        ParseStage,
        fn_constructor_kwargs=dict(rules=rules, actions=actions),
        batch_format="pyarrow", batch_size=parse_batch_size,
        concurrency=pool, num_cpus=1)

    lookup_ref = ray.put(dict(lang_lookup or DEFAULT_LANG_CLASSES))
    enriched = parsed.map_batches(
        EnrichStage,
        fn_constructor_kwargs=dict(lang_lookup_ref=lookup_ref),
        batch_format="pyarrow", batch_size=4096,
        concurrency=(1, max(2, pool // 4)))

    templated = enriched.map_batches(
        lambda b: add_template(route_deadletter(b)),
        batch_format="pyarrow")

    if sink_dir is not None:
        templated = templated.map_batches(
            RoutedWriter, fn_constructor_kwargs=dict(out_dir=sink_dir),
            batch_format="pyarrow", batch_size=8192,
            concurrency=(1, max(2, pool // 4)))
    return templated


def run(sf_dir: str, sink_dir: Optional[str] = None,
        cpus: Optional[int] = None, repeat: int = 1,
        corpus_dir: Optional[str] = None):
    """Execute the flagship job once; returns the merged (template, route)
    counts Dataset — the single consumption that drives the whole stream.

    Uses the fused stage (one actor pool sized to the node, partials-only
    output) — the only shuffle is the tiny final count merge."""
    import ray.data as rd

    if corpus_dir is not None:
        # file-shard mode: ship PATHS to the fused actors, which read their
        # shard directly — input bytes never enter the object store, read
        # CPU shares the pool, and task granularity = one file.
        import glob
        files = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
        if not files:
            raise FileNotFoundError(
                f"run: no *.parquet files under {corpus_dir!r}")
        # reads happen inside the fused actors, so only the tiny count
        # merge needs headroom — size off the actual node, never a guess
        pool = max(2, _node_cpus(cpus) - 2)
        # one block per file path → one actor task per input shard
        pages = rd.from_items([{"path": f} for f in files],
                              override_num_blocks=len(files))
        parse_batch_size = 1
    else:
        pool = _pool(cpus)
        pages = read_webpages(sf_dir, repeat=repeat)
        parse_batch_size = max(1, 256 // max(1, repeat))

    partials = pages.map_batches(
        FusedFlagshipStage,
        fn_constructor_kwargs=dict(rules=flagship_header_rules(),
                                   actions=default_statement_actions(),
                                   sink_dir=sink_dir),
        batch_format="pyarrow", batch_size=parse_batch_size,
        concurrency=pool, num_cpus=1)
    return merge_template_counts(partials, by=("route",))


def run_sharded_corpus(corpus_dir: str, out_dir: str,
                       files_per_shard: int = 32, resume: bool = True,
                       cpus: Optional[int] = None,
                       continue_on_error: bool = False):
    """Resumable flagship over a materialized corpus, sharded by FILE
    GROUPS — the real 100 TB layout: each shard is a fixed slice of the
    input file list, processed as one streaming job into an atomically
    renamed dir + lineage manifest; a resumed run skips finished shards.

    ``continue_on_error``: a failing shard (corrupt file, poisoned block)
    records a diagnostic under ``failures/<id>.json`` and the run moves
    on — at 100 TB one bad shard must not kill a multi-hour job. Failed
    shards stay manifest-less, so the next resume re-attempts exactly
    them; a later success clears the failure record."""
    import glob
    import ray.data as rd
    from ..state import manifest as M

    files = sorted(glob.glob(f"{corpus_dir}/*.parquet"))
    if not files:
        raise FileNotFoundError(
            f"run_sharded_corpus: no *.parquet files under {corpus_dir!r}")
    shards = [files[i:i + files_per_shard]
              for i in range(0, len(files), files_per_shard)]
    pool = max(2, _node_cpus(cpus) - 2)
    results = []
    for i, shard_files in enumerate(shards):
        def process(tmp_dir: str, shard_files=shard_files) -> dict:
            pages = rd.from_items([{"path": f} for f in shard_files],
                                  override_num_blocks=len(shard_files))
            partials = pages.map_batches(
                FusedFlagshipStage,
                fn_constructor_kwargs=dict(
                    rules=flagship_header_rules(),
                    actions=default_statement_actions(),
                    sink_dir=tmp_dir),
                batch_format="pyarrow", batch_size=1,
                concurrency=min(pool, len(shard_files)), num_cpus=1)
            counts = merge_template_counts(partials, by=("route",))
            pdf = counts.to_pandas()
            pdf.to_parquet(Path(tmp_dir) / "_template_counts.parquet")
            return {"rows": int(pdf["n"].sum()),
                    "templates": int(len(pdf)),
                    "files": len(shard_files)}

        # the spec carries a content hash of the FULL file list: shards
        # are positional slices of the sorted listing, so a corpus that
        # gained/lost a file shifts every boundary — run_shard compares
        # the spec and re-runs a shard whose input changed instead of
        # trusting the manifest's existence alone
        import hashlib
        spec = {"corpus_dir": corpus_dir,
                "n_files": len(shard_files),
                "files_md5": hashlib.md5(
                    "\n".join(shard_files).encode()).hexdigest(),
                "files_head": shard_files[:3]}
        if continue_on_error:
            try:
                results.append(M.run_shard(out_dir, f"{i:05d}", spec,
                                           process, resume=resume))
            except Exception as err:  # noqa: BLE001 — recorded + skipped
                M.record_failure(out_dir, f"{i:05d}", spec, err)
        else:
            results.append(M.run_shard(out_dir, f"{i:05d}", spec,
                                       process, resume=resume))
    return results


def run_sharded(sf_dir: str, out_dir: str, num_shards: int = 4,
                resume: bool = True, cpus: Optional[int] = None):
    """Resumable variant: shard the corpus by doc_id hash; per shard run the
    streaming job into an atomically-renamed dir + lineage manifest
    (state.manifest). At real scale shards are input-file groups; the
    key-hash slice stands in for that on the single-file testdata."""
    import ray.data as rd
    from ..state import manifest as M

    results = []
    for shard in range(num_shards):
        def process(tmp_dir: str, shard=shard) -> dict:
            from ..sources.webpages import synthesize_batch
            pool = _pool(cpus)
            def in_shard(b: pa.Table, shard=shard) -> pa.Table:
                # doc_id % num_shards == shard (Ray's filter-expr parser
                # does not support arithmetic on the key)
                import numpy as np
                ids = b.column("doc_id").to_numpy()
                return b.filter(pa.array(ids % num_shards == shard))

            docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                                   columns=["doc_id", "lang", "source"]) \
                .map_batches(in_shard, batch_format="pyarrow")
            pages = docs.map_batches(synthesize_batch,
                                     batch_format="pyarrow", batch_size=256)
            partials = pages.map_batches(
                FusedFlagshipStage,
                fn_constructor_kwargs=dict(
                    rules=flagship_header_rules(),
                    actions=default_statement_actions(),
                    sink_dir=tmp_dir),
                batch_format="pyarrow", batch_size=256,
                concurrency=pool, num_cpus=1)
            counts = merge_template_counts(partials, by=("route",))
            pdf = counts.to_pandas()
            pdf.to_parquet(Path(tmp_dir) / "_template_counts.parquet")
            return {"rows": int(pdf["n"].sum()),
                    "templates": int(len(pdf))}

        results.append(M.run_shard(out_dir, f"{shard:05d}",
                                   {"sf_dir": sf_dir,
                                    "filter": f"doc_id % {num_shards} == {shard}"},
                                   process, resume=resume))
    return results

"""Synthetic Common-Crawl-style web-page corpus (the BASELINE.json
``input_hint`` table shape): ``(url: string, warc_ts: timestamp[us],
html: binary, text: string, lang: string)``.

Derived **deterministically** from the driver's ``documents`` testdata table
(seeded per ``doc_id``) so the corpus scales with the sf directory and needs
no external data: each page's ``text`` holds a deterministic stream of
syslog/app-log lines in three header formats — the inputs the flagship
parse→enrich→route→aggregate pipeline consumes. Generation runs inside
``map_batches`` (parallel, streaming); nothing is materialized driver-side.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

BASE_TS_US = 1_700_000_000_000_000  # 2023-11-14T22:13:20Z, pinned

_HOSTS = ["web-%02d.dc%d.example.com" % (i % 40, i % 4) for i in range(40)]
_COMPONENTS = ["sshd", "nginx", "kernel", "cron", "systemd", "postfix",
               "app-server", "etl.worker", "scheduler", "auth"]
_LEVELS = ["INFO", "INFO", "INFO", "WARN", "ERROR", "DEBUG"]
_USERS = ["root", "admin", "deploy", "svc-etl", "www-data", "guest"]
_MONTHS = ("Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec")

# message templates, Zipf-ish weighted (hot templates exercise skew handling)
_TEMPLATES = [
    ("Failed password for {user} from {ip} port {port} ssh2", 30),
    ("Accepted publickey for {user} from {ip} port {port} ssh2", 20),
    ("Connection closed by {ip} [preauth]", 15),
    ("GET /api/v1/items/{n} 200 {n2} bytes", 10),
    ("task {n} finished in {n2} ms", 8),
    ("cache miss for key user:{n}:profile", 6),
    ("disk usage on /dev/sda{d} at {pct}%", 4),
    ("OOM killer invoked for pid {n}", 2),
    ("replica lag {n2} ms on shard {d}", 2),
    ("certificate for {host} expires in {d} days", 1),
    ("unexpected token in config line {n}", 1),
    ("watchdog timeout on component {comp}", 1),
]
_TPL_STRINGS = [t for t, _ in _TEMPLATES]
_TPL_W = np.array([w for _, w in _TEMPLATES], dtype=np.float64)
_TPL_W /= _TPL_W.sum()


def _render_lines(rng: np.random.Generator, doc_id: int) -> str:
    n_lines = int(rng.integers(5, 36))
    tpl_ids = rng.choice(len(_TPL_STRINGS), size=n_lines, p=_TPL_W)
    fmts = rng.integers(0, 3, size=n_lines)
    rnd = rng.integers(0, 1 << 30, size=(n_lines, 8))
    out = []
    for i in range(n_lines):
        r = rnd[i]
        msg = _TPL_STRINGS[tpl_ids[i]].format(
            user=_USERS[r[0] % len(_USERS)],
            ip=f"10.{r[1] % 256}.{r[2] % 256}.{r[3] % 254 + 1}",
            port=int(r[4] % 60000 + 1024),
            n=int(r[5] % 100000),
            n2=int(r[6] % 9000 + 10),
            d=int(r[0] % 9),
            pct=int(r[1] % 100),
            host=_HOSTS[r[2] % len(_HOSTS)],
            comp=_COMPONENTS[r[3] % len(_COMPONENTS)],
        )
        ts = BASE_TS_US // 1_000_000 + int(doc_id) * 60 + i
        mon = _MONTHS[(ts // 2_600_000) % 12]
        day = ts // 86_400 % 28 + 1
        hh, mm, ss = ts // 3600 % 24, ts // 60 % 60, ts % 60
        host = _HOSTS[r[4] % len(_HOSTS)]
        comp = _COMPONENTS[r[5] % len(_COMPONENTS)]
        level = _LEVELS[r[6] % len(_LEVELS)]
        fmt = fmts[i]
        if fmt == 0:      # syslog-style (no year, no level)
            out.append(f"{mon} {day:2d} {hh:02d}:{mm:02d}:{ss:02d} {host} "
                       f"{comp}[{int(r[7] % 32768)}]: {msg}")
        elif fmt == 1:    # app-log ISO style with level
            ms = int(r[7] % 1000)
            out.append(f"2024-{(ts // 2_600_000) % 12 + 1:02d}-{day:02d} "
                       f"{hh:02d}:{mm:02d}:{ss:02d},{ms:03d} {level} "
                       f"{comp}: {msg}")
        else:             # epoch style with level
            out.append(f"{ts} {host} {level} {msg}")
    return "\n".join(out)


def synthesize_batch(batch: pa.Table, repeat: int = 1) -> pa.Table:
    """documents batch (doc_id, lang, source) → web-page batch
    (url, warc_ts, html, text, lang). Deterministic per (doc_id, replica);
    ``repeat`` emits N pages per document to scale the corpus without new
    inputs (replica pages get distinct seeds → distinct lines)."""
    # replica id space must exceed any supported repeat, or replica seeds
    # collide with the next doc_id's space (ADVICE r1)
    _REPLICA_SPACE = 1_000_000
    assert repeat < _REPLICA_SPACE, f"repeat must be < {_REPLICA_SPACE}"
    if repeat > 1:
        idx = np.repeat(np.arange(len(batch), dtype=np.int64), repeat)
        batch = batch.take(pa.array(idx))
        replica = np.tile(np.arange(repeat, dtype=np.int64),
                          len(batch) // repeat)
    else:
        replica = np.zeros(len(batch), dtype=np.int64)
    base_ids = batch.column("doc_id").to_numpy()
    doc_ids = base_ids * _REPLICA_SPACE + replica
    langs = batch.column("lang").to_pylist()
    sources = batch.column("source").to_pylist()
    urls = [f"https://{src}.example.com/page/{did}"
            for src, did in zip(sources, doc_ids)]
    # timestamp bounded independently of the (huge) seed space: 1h per
    # document, 1s per replica
    warc_ts = pa.array(BASE_TS_US + (base_ids * 3600 + replica) * 1_000_000,
                       type=pa.timestamp("us"))
    texts = []
    for did in doc_ids:
        rng = np.random.Generator(np.random.PCG64(int(did) * 2654435761 % (1 << 63)))
        texts.append(_render_lines(rng, int(did)))
    html = [f"<html><body><pre>{len(t)}</pre></body></html>".encode()
            for t in texts]
    return pa.table({
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": warc_ts,
        "html": pa.array(html, type=pa.binary()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
    })


def read_webpages(sf_dir: str, repeat: int = 1):
    """Dataset of synthetic web pages derived from ``<sf_dir>/documents.parquet``."""
    import functools
    import ray.data as rd
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "source"])
    return ds.map_batches(
        functools.partial(synthesize_batch, repeat=repeat),
        batch_format="pyarrow", batch_size=max(64, 2048 // max(1, repeat)))


def materialize_corpus(sf_dir: str, out_dir: str, repeat: int = 1,
                       num_files: int = 64) -> str:
    """Generate the synthetic web-page corpus once and persist it as a
    multi-file parquet directory (so reads split/parallelize like a real
    Common-Crawl dump). Idempotent: returns immediately if the directory
    is complete (_SUCCESS marker)."""
    import os
    from pathlib import Path
    out = Path(out_dir)
    if (out / "_SUCCESS").exists():
        return str(out)
    ds = read_webpages(sf_dir, repeat=repeat)
    tmp = out.parent / (out.name + ".tmp")
    if tmp.exists():
        import shutil
        shutil.rmtree(tmp)
    # multi-file layout WITHOUT a repartition shuffle: the old
    # repartition(num_files) was an all-to-all that materialized the whole
    # html+text corpus in the object store purely to control file count;
    # the total row count is known from the documents.parquet footer, so a
    # row-budget on the streaming write gets the same layout for free
    import math
    import pyarrow.parquet as _pq
    n_docs = _pq.ParquetFile(
        f"{sf_dir}/documents.parquet").metadata.num_rows
    rows_per_file = max(1, math.ceil(n_docs * max(1, repeat) / num_files))
    ds.write_parquet(str(tmp), max_rows_per_file=rows_per_file,
                     min_rows_per_file=max(1, rows_per_file // 2))
    if out.exists():
        import shutil
        shutil.rmtree(out)
    os.replace(tmp, out)
    (out / "_SUCCESS").touch()
    return str(out)


def flagship_header_rules():
    """Header rules covering the three synthetic line formats."""
    from ..rules import items as I
    from ..rules.header import HeaderRule
    return [
        HeaderRule(items=[I.MonthAbbreviation(),
                          I.Digit("day"),
                          I.Time(),
                          I.Hostname("host"),
                          I.UserItem("component", r"[a-zA-Z0-9()._-]+"),
                          I.Digit("processid", optional=True),
                          I.Statement()],
                   separator=" :[]", defaults={"year": 2024}),
        HeaderRule(items=[I.Date(),
                          I.ItemGroup([I.Digit("hour"),
                                       I.Digit("minute"),
                                       I.Digit("second"),
                                       I.FracSecond()], separator=":,"),
                          I.String("level"),
                          I.UserItem("component", r"[a-zA-Z0-9()._-]+"),
                          I.Statement()],
                   separator=" :"),
        HeaderRule(items=[I.UnixTime(),
                          I.Hostname("host"),
                          I.String("level"),
                          I.Statement()]),
    ]

"""CLI: parse log files into structured records (the engine's equivalent of
the reference's ``python -m log2seq``, ``/root/reference/log2seq/__main__.py``).

    python -m log2seq_ray [FILES...] [options]

* FILES may be plain text, .gz, .bz2 or tar archives; stdin when omitted.
* ``--preset`` picks a rule spec: ``default``, ``apache_errorlog`` or any
  loghub dataset name (``openssh``, ``bgl``, ...). ``--spec module:attr``
  loads a user spec (a ``(rules, actions)`` tuple) from a Python module
  path — the engine's declarative replacement for the reference's parser
  scripts (and immune to its module-name collision quirk, SURVEY §2.11).
* Successful rows → stdout (``-t object|words``) or ``-o`` parquet/text;
  failures + summary → stderr; exit 0 if ≥1 row parsed, else 1 (2 on
  startup errors) — the reference CLI's protocol.

Owns its Ray session ONLY when reading many files (``--ray``); the default
path parses in-process (no Ray needed for a laptop-sized file).
"""

from __future__ import annotations

import argparse
import sys


def load_spec(name: str, year: int):
    from .rules import loghub, presets
    name_l = name.lower()
    if name_l == "default":
        return presets.default_parser_spec(year)
    if name_l == "apache_errorlog":
        return presets.apache_errorlog_spec()
    for ds, (factory, _, takes_year) in loghub.DATASETS.items():
        if ds.lower() == name_l:
            return factory(year=year) if takes_year else factory()
    raise SystemExit(f"unknown preset {name!r}")  # caught in main → exit 2


def load_user_spec(spec: str):
    import importlib
    mod_name, _, attr = spec.partition(":")
    mod = importlib.import_module(mod_name)
    obj = getattr(mod, attr or "spec")
    return obj() if callable(obj) else obj


def iter_line_batches(files, encoding, batch_size=8192):
    """Lazy line batches from stdin/plain/gz/bz2/tar (no Ray)."""
    import bz2 as bz2lib
    import gzip
    import io
    import tarfile

    def lines():
        if not files:
            for line in sys.stdin:
                yield line
            return
        for fp in files:
            if fp.endswith((".tar", ".tar.gz", ".tgz", ".tar.bz2",
                            ".tbz2", ".tar.xz", ".txz")):
                with tarfile.open(fp, "r") as tar:
                    for info in tar.getmembers():
                        if info.isfile():
                            f = tar.extractfile(info)
                            for line in io.TextIOWrapper(f, encoding):
                                yield line
            elif fp.endswith(".bz2"):
                with bz2lib.open(fp, "rt", encoding=encoding) as f:
                    yield from f
            elif fp.endswith(".gz"):
                with gzip.open(fp, "rt", encoding=encoding) as f:
                    yield from f
            else:
                with open(fp, "rt", encoding=encoding) as f:
                    yield from f

    buf = []
    for line in lines():
        buf.append(line)
        if len(buf) >= batch_size:
            yield buf
            buf = []
    if buf:
        yield buf


def _guard_input(gen):
    """Surface input errors (missing file, bad archive) as OSError so main
    reports them cleanly (exit 2) instead of a traceback."""
    try:
        yield from gen
    except (OSError, EOFError) as e:
        raise OSError(e) from e


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="log2seq_ray")
    ap.add_argument("files", nargs="*")
    ap.add_argument("--preset", "-p", default="default",
                    help="preset name, or a path to a reference-style "
                         "parser script (*.py exporting `parser`) — the "
                         "reference CLI's -p")
    ap.add_argument("--spec", default=None,
                    help="user spec 'module:attr' returning (rules, actions)")
    ap.add_argument("--rules", default=None,
                    help="JSON rule-spec file (see rules/serde.py)")
    ap.add_argument("--encoding", default="utf-8")
    ap.add_argument("--output", "-o", default=None,
                    help="output file (.parquet → parquet, else text)")
    ap.add_argument("--type", "-t", dest="format_type", default="object",
                    choices=["object", "words"])
    ap.add_argument("--statement", "-s", action="store_true",
                    help="parse input as statements (skip header stage)")
    ap.add_argument("--failures-only", action="store_true")
    ap.add_argument("--max-failures", type=int, default=5)
    ap.add_argument("--show-input", "-i", action="store_true",
                    help="prefix each successful result with the input line")
    ap.add_argument("--year", type=int, default=2024)
    args = ap.parse_args(argv)

    try:
        if args.rules:
            from .rules.serde import load_spec_file
            spec = load_spec_file(args.rules)
        elif args.spec:
            spec = load_user_spec(args.spec)
        elif args.preset.endswith(".py"):
            # reference-style parser script (log2seq plugin surface)
            from .compat import load_parser_script
            rules, actions, _ignore = load_parser_script(args.preset)
            spec = (rules, actions)
        else:
            spec = load_spec(args.preset, args.year)
        from .kernel.parse import CompiledLogParser
        parser = CompiledLogParser(*spec)
    except SystemExit as e:
        print(e, file=sys.stderr)
        return 2
    except Exception as e:
        print(f"startup error: {e}", file=sys.stderr)
        return 2

    import pyarrow as pa

    n_ok = n_fail = 0
    out_tables = []
    f_out = None
    if args.output and not args.output.endswith(".parquet"):
        f_out = open(args.output, "w", encoding=args.encoding)
    try:
        for batch in _guard_input(iter_line_batches(args.files,
                                                    args.encoding)):
            arr = pa.array(batch, type=pa.string())
            if args.statement:
                words, syms = parser.parse_statements(
                    pa.compute.utf8_rtrim(arr, characters="\r\n"))
                tbl = pa.table({"words": words, "symbols": syms})
                errors = [None] * len(tbl)
            else:
                tbl = parser.parse_lines(arr)
                errors = tbl.column("error").to_pylist()
            rows = tbl.to_pylist()
            for raw, row, err in zip(batch, rows, errors):
                if err == "empty line":
                    continue
                if err is not None:
                    n_fail += 1
                    if args.max_failures <= 0 or n_fail <= args.max_failures:
                        print(f"parse failed: {err}", file=sys.stderr)
                    elif n_fail == args.max_failures + 1:
                        print("... (further failures suppressed)",
                              file=sys.stderr)
                    continue
                n_ok += 1
                if args.failures_only:
                    continue
                if args.output and args.output.endswith(".parquet"):
                    continue  # batched below
                if args.format_type == "words":
                    text = " ".join(row["words"] or [])
                else:
                    # reference "object" parity: absent (null) optional keys
                    # are OMITTED from the printed dict, not shown as None
                    # (/root/reference/log2seq/header.py:425-432,
                    #  __main__.py:50-65); engine-internal columns hidden
                    shown = {k: v for k, v in row.items()
                             if v is not None
                             and k not in ("rule_id", "error",
                                           "tz_offset_sec")}
                    text = str(shown)
                if args.show_input:
                    print(raw.rstrip("\r\n"), file=f_out or sys.stdout)
                print(text, file=f_out or sys.stdout)
            if args.output and args.output.endswith(".parquet"):
                mask = pa.array([e is None for e in errors])
                out_tables.append(tbl.filter(mask))
    except OSError as e:
        print(f"cannot read input: {e}", file=sys.stderr)
        return 2
    finally:
        if f_out:
            f_out.close()

    if args.output and args.output.endswith(".parquet") and out_tables:
        import pyarrow.parquet as pq
        pq.write_table(pa.concat_tables(out_tables), args.output)

    print(f"# processed {n_ok + n_fail} lines: {n_ok} ok, {n_fail} failed",
          file=sys.stderr)
    return 0 if n_ok else 1


if __name__ == "__main__":
    raise SystemExit(main())

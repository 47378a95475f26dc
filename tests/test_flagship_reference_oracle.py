"""Pipeline-level differential: the flagship's per-sink (routed) counts and
routed-row sets must equal a reference-driven oracle (BASELINE.json: "a
groupby(token-template).count() aggregate must equal the reference's
per-sink counts and routed-row sets").

Oracle construction: the REFERENCE log2seq parses every line of the
synthetic corpus with HeaderParser rules equivalent to the flagship's
(same item grammar), and the enrich/route/mask steps are replayed in plain
Python on the reference's per-line dicts. The engine's distributed result
must match exactly: same route keys, same per-route counts, same
(template, route) counts, and the same routed (url, line_no) row sets.
"""

import re
import sys
from pathlib import Path

import pyarrow as pa
import pytest

sys.path.insert(0, "/root/reference")

from log2seq_ray.sources import webpages
from log2seq_ray.stages.enrich import DEFAULT_LANG_CLASSES, _SEV_MAP
from log2seq_ray.stages.aggregate import _VARIABLE_TOKEN_RE, MASK


def reference_flagship_parser():
    """Reference LogParser equivalent to sources.webpages.flagship_header_rules."""
    from log2seq import LogParser
    from log2seq.header import (Date, Digit, HeaderParser, Hostname,
                                MonthAbbreviation, Statement, String, Time,
                                UnixTime, UserItem, ItemGroup, DemicalSecond)
    from log2seq.preset import default_statement_parser

    r1 = HeaderParser([MonthAbbreviation(), Digit("day"), Time(),
                       Hostname("host"),
                       UserItem("component", r"[a-zA-Z0-9()._-]+"),
                       Digit("processid", optional=True),
                       Statement()],
                      separator=" :[]", defaults={"year": 2024})
    r2 = HeaderParser([Date(),
                       ItemGroup([Digit("hour"), Digit("minute"),
                                  Digit("second"), DemicalSecond()],
                                 separator=":,"),
                       String("level"),
                       UserItem("component", r"[a-zA-Z0-9()._-]+"),
                       Statement()],
                      separator=" :")
    r3 = HeaderParser([UnixTime(), Hostname("host"), String("level"),
                       Statement()])
    return LogParser([r1, r2, r3], default_statement_parser(),
                     ignore_failure=True)


def reference_oracle(sf_dir: str):
    """(route -> count, (template, route) -> count, route -> set of
    (url, line_no)) computed per line by the reference."""
    import pyarrow.parquet as pq
    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "lang", "source"])
    pages = webpages.synthesize_batch(docs)
    parser = reference_flagship_parser()
    var_re = re.compile(_VARIABLE_TOKEN_RE)

    route_counts: dict = {}
    tpl_counts: dict = {}
    route_rows: dict = {}
    for url, lang, text in zip(pages.column("url").to_pylist(),
                               pages.column("lang").to_pylist(),
                               pages.column("text").to_pylist()):
        for line_no, line in enumerate(text.split("\n")):
            d = parser.process_line(line)
            if d is None:
                route, template = "__deadletter__", None
            else:
                lang_class = DEFAULT_LANG_CLASSES.get(lang, "other")
                level = d.get("level")
                severity = _SEV_MAP.get((level or "").upper(), "info")
                route = f"{lang_class}_{severity}"
                template = " ".join(
                    MASK if var_re.match(w) else w for w in d["words"])
            route_counts[route] = route_counts.get(route, 0) + 1
            tpl_counts[(template, route)] = \
                tpl_counts.get((template, route), 0) + 1
            route_rows.setdefault(route, set()).add((url, line_no))
    return route_counts, tpl_counts, route_rows


@pytest.mark.slow
def test_flagship_matches_reference_oracle(ray_session, tmp_path):
    sf_dir = "/root/testdata/sf0.001"
    ref_routes, ref_tpls, ref_rows = reference_oracle(sf_dir)

    from log2seq_ray.pipelines import flagship
    sink = tmp_path / "sink"
    counts = flagship.run(sf_dir, sink_dir=str(sink)).to_pandas()

    # (template, route) counts equal the reference-driven oracle
    eng_tpls = {(t, r): int(n) for t, r, n in
                counts[["template", "route", "n"]].itertuples(index=False)}
    assert eng_tpls == ref_tpls

    # per-sink (routed) counts equal
    eng_routes = counts.groupby("route")["n"].sum().to_dict()
    assert {k: int(v) for k, v in eng_routes.items()} == ref_routes

    # routed-row SETS equal: read back every sink partition
    import pyarrow.parquet as pq
    for route, expected in ref_rows.items():
        if route == "__deadletter__" and not (sink / f"route={route}").exists():
            assert not expected
            continue
        files = list((sink / f"route={route}").glob("*.parquet"))
        assert files, f"no sink files for {route}"
        got = set()
        for f in files:
            t = pq.read_table(f, columns=["url", "line_no"])
            got.update(zip(t.column("url").to_pylist(),
                           t.column("line_no").to_pylist()))
        assert got == expected, f"routed rows differ for {route}"

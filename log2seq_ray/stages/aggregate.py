"""Aggregation stages: token-template extraction + two-phase counts.

``add_template`` masks variable tokens in the ``words`` column vectorially
(flatten the list column once, one RE2 classification pass over all tokens,
rebuild per-row template strings with ``pc.binary_join``) — the batch
equivalent of deriving log2seq templates from words/symbols (SURVEY §2.7).

``template_partial_counts`` + ``merge_template_counts`` implement the
mandated two-phase aggregate for Zipf-skewed template keys: each batch
collapses to at most #distinct-template partial rows *before* the shuffle
(so a hot template ships one row per batch, not one per record — the
partial/combiner phase is what defuses the skew), and the small final
``groupby(template).sum`` merges them. A ``salt`` column (hash of the batch)
keeps the partials' key space explicit for observability.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

#: tokens considered "variable": numbers, hex ids, IPs, ports, paths, sizes
_VARIABLE_TOKEN_RE = (
    r"^(?:"
    r"\d+"                                   # pure number
    r"|0x[0-9a-fA-F]+"                       # hex literal
    r"|[0-9a-fA-F]{8,}"                      # long hex id
    r"|\d+(?:\.\d+){1,3}(?:/\d+)?"           # dotted (ip/version)
    r"|[0-9a-fA-F:]*:[0-9a-fA-F:.]+"         # ipv6-ish
    r"|/[^ ]*"                               # absolute path
    r"|\d+%"                                 # percentage
    r"|user:\d+:[a-z]+"                      # composite ids
    r")$"
)

MASK = "<*>"


def add_template(batch: pa.Table, words_col: str = "words",
                 out_col: str = "template") -> pa.Table:
    """Append a masked-template string column derived from ``words``."""
    words = batch.column(words_col)
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    valid = pc.is_valid(words)
    # flatten once; null lists contribute 0 tokens, so rebuild offsets from
    # null-filled lengths to keep alignment with pc.list_flatten's output
    lengths = pc.fill_null(pc.list_value_length(words), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    offsets = np.concatenate([[0], np.cumsum(lengths)])
    flat = pc.list_flatten(words)
    is_var = pc.match_substring_regex(flat, pattern=_VARIABLE_TOKEN_RE)
    masked = pc.if_else(is_var, MASK, flat)
    relist = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                      masked)
    tpl = pc.binary_join(relist, " ")
    tpl = pc.if_else(valid, tpl, pa.scalar(None, pa.string()))
    return batch.append_column(out_col, tpl)


def template_partial_counts(batch: pa.Table,
                            tpl_col: str = "template",
                            by: tuple = ()) -> pa.Table:
    """Per-batch combiner: collapse to (template[, by...], partial n, salt).

    This runs BEFORE the shuffle, so the exchange moves one row per distinct
    (template, by) per batch regardless of how hot a template is.
    """
    import zlib
    keys = [tpl_col, *by]
    sub = batch.select(keys)
    # dead-letter rows carry a null template (no words); Ray's sort-based
    # groupby cannot partition null keys — count them under a sentinel
    tix = sub.schema.get_field_index(tpl_col)
    sub = sub.set_column(tix, tpl_col,
                         pc.fill_null(sub.column(tpl_col), "<unparsed>"))
    grouped = sub.group_by(keys).aggregate([([], "count_all")])
    n = grouped.column("count_all")
    # deterministic salt = hash(template) % 64: if the partials dataset were
    # ever large, a pre-merge groupby((salt, template)) spreads hot keys
    # across reducers before the final merge
    salt = pa.array([zlib.crc32(t.encode()) % 64 if t else 0
                     for t in grouped.column(tpl_col).to_pylist()],
                    type=pa.int32())
    return pa.table({
        **{k: grouped.column(k) for k in keys},
        "partial_n": n,
        "salt": salt,
    })


def merge_template_counts(ds, tpl_col: str = "template", by: tuple = (),
                          num_blocks: int = 8):
    """Final phase: sum partials per (template, by...). Input is the small
    partials dataset; this is the pipeline's only shuffle.

    The partials are coalesced into a handful of blocks first: Ray Data's
    aggregate creates O(blocks²) shuffle objects, so grouping 192 tiny
    partial blocks directly costs more in task/object overhead than the
    whole parse (observed ~29s for 70k partial rows). After coalescing the
    exchange is 8×8.
    """
    from ray.data.aggregate import Sum
    keys = [tpl_col, *by]
    out = ds.repartition(num_blocks).groupby(keys) \
        .aggregate(Sum("partial_n", alias_name="n"))
    return out


def route_counts(ds, route_col: str = "route"):
    """Per-sink routed counts (grouped count by route key) with per-batch
    partials before the shuffle."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select([route_col]).group_by([route_col]) \
            .aggregate([([], "count_all")])
        return pa.table({route_col: g.column(route_col),
                         "partial_n": g.column("count_all")})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return partials.groupby(route_col).aggregate(
        Sum("partial_n", alias_name="n"))

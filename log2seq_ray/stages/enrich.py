"""Enrich + route stages: broadcast lang lookup, severity class, route key.

The lang→class lookup is the north star's "lang-lookup enrichment" (SURVEY
§2.6): a SMALL side table broadcast once via ``ray.put`` on the driver and
resolved per batch with vectorized ``pc.index_in`` + ``take`` inside the
actor — never a distributed join. Severity class derives from the parsed
``level`` field (or defaults); ``route = {lang_class}_{severity}`` is the
fan-out key for per-sink writes and routed counts.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: default lang → language-class lookup (the small side)
DEFAULT_LANG_CLASSES = {
    "en": "latin", "de": "latin", "es": "latin", "fr": "latin",
    "pt": "latin", "it": "latin", "nl": "latin",
    "zh": "cjk", "ja": "cjk", "ko": "cjk",
    "ru": "cyrillic", "uk": "cyrillic",
    "ar": "rtl", "he": "rtl",
}

_SEV_MAP = {
    "ERROR": "error", "FATAL": "error", "CRIT": "error", "CRITICAL": "error",
    "WARN": "warn", "WARNING": "warn",
}


def _lookup_arrays(lookup: dict[str, str], default: str):
    keys = pa.array(list(lookup.keys()), type=pa.string())
    vals = pa.array(list(lookup.values()) + [default], type=pa.string())
    return keys, vals, len(lookup)


def classify_column(col, keys: pa.Array, vals: pa.Array, n_keys: int):
    """Vectorized dict lookup: value at index_in(col, keys), missing → the
    sentinel appended at vals[n_keys]."""
    idx = pc.index_in(col, value_set=keys)
    idx = pc.fill_null(pc.cast(idx, pa.int64()), n_keys)
    return vals.take(idx)


class EnrichStage:
    """Callable actor class adding lang_class / severity / route columns.

    Args:
        lang_lookup_ref: ``ray.ObjectRef`` of a dict (broadcast once with
            ``ray.put``), or a plain dict for tests / local use.
        default_lang_class: class for unknown langs.
    """

    def __init__(self, lang_lookup_ref=None, default_lang_class="other"):
        if lang_lookup_ref is None:
            lookup = DEFAULT_LANG_CLASSES
        elif isinstance(lang_lookup_ref, dict):
            lookup = lang_lookup_ref
        else:
            import ray
            lookup = ray.get(lang_lookup_ref)
        self._lang = _lookup_arrays(lookup, default_lang_class)
        self._sev = _lookup_arrays(_SEV_MAP, "info")

    def __call__(self, batch: pa.Table) -> pa.Table:
        lang_class = classify_column(batch.column("lang"), *self._lang)
        if "level" in batch.column_names:
            level = pc.utf8_upper(pc.fill_null(batch.column("level"), ""))
            severity = classify_column(level, *self._sev)
        else:
            severity = pa.array(["info"] * len(batch), type=pa.string())
        route = pc.binary_join_element_wise(lang_class, severity, "_")
        batch = batch.append_column("lang_class", lang_class)
        batch = batch.append_column("severity", severity)
        batch = batch.append_column("route", route)
        return batch


def route_deadletter(t: pa.Table) -> pa.Table:
    """Override ``route`` with ``__deadletter__`` for rows the header
    cascade could not parse (non-null ``error``) — the engine's
    ignore_failure + failure sink (SURVEY §2.1 S7 / §2.2 H5). Shared by the
    fused flagship stage and the modular pipeline so both produce the same
    routed outputs."""
    err = t.column("error")
    if err.null_count == len(t):
        return t
    route = pc.if_else(pc.is_valid(err), pa.scalar("__deadletter__"),
                       t.column("route"))
    return t.set_column(t.schema.get_field_index("route"), "route", route)

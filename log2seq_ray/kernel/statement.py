"""Compiled statement kernel: action specs → a fast per-row callable.

``compile_actions(specs)`` returns a function ``str -> (words, symbols)``
implementing the reference's flag state machine (SURVEY §2.4,
``/root/reference/log2seq/statement.py:87-112``) without generator chains:
each action is compiled to a list-in/list-out applier over ``(str, flag)``
pairs, and the finalizer reproduces ``_separate``
(``/root/reference/log2seq/statement.py:56-85``) including the
``len(symbols) == len(words) + 1`` invariant and lossless byte
reconstruction.

This kernel is the per-row hot path inside ``map_batches``; compile once per
actor (``__init__``), call per row. Regexes are precompiled; FixIP carries
an exactness-preserving charset fast path on top of the reference's
"contains '.' or ':'" check.
"""

from __future__ import annotations

import ipaddress
import re
from typing import Callable, Iterable, Optional

from ..rules import actions as A

U, F, S = 0, 1, 2  # UNKNOWN / FIXED / SEPARATOR part flags


def _finalize(parts) -> tuple[list[str], list[str]]:
    """Parts stream → (words, symbols); mirrors the reference ``_separate``:
    drop empty words, insert empty separators between adjacent words, merge
    adjacent separators, leading/trailing separator always present."""
    words: list[str] = []
    syms: list[str] = []
    prev_word = True
    for s, f in parts:
        if f == S:
            if prev_word:
                syms.append(s)
            else:
                syms[-1] += s
            prev_word = False
        else:
            if s == "":
                prev_word = True
                continue
            if prev_word:
                syms.append("")
            words.append(s)
            prev_word = True
    if prev_word:
        syms.append("")
    return words, syms


# ---------------------------------------------------------------------------
# per-action compilers
# ---------------------------------------------------------------------------

def _compile_split(separators: str) -> Callable:
    # one capture of the whole separator run: re.split alternates
    # [tok, sep, tok, sep, ..., tok]; equivalent segmentation to the
    # reference's finditer over ([c])+ runs.
    rx = re.compile(r"([" + re.escape(separators) + r"]+)")
    split = rx.split

    if len(separators) == 1:
        # hot case (e.g. the preset's trailing Split(":")): a C-level
        # `find` guard skips the regex machinery for the many parts that
        # contain no separator at all
        sep = separators

        def do(parts):
            out = []
            append = out.append
            for p in parts:
                s, f = p
                if f == U and s and sep in s:
                    pieces = split(s)
                    for i, piece in enumerate(pieces):
                        if i & 1:
                            append((piece, S))
                        elif piece:
                            append((piece, U))
                else:
                    append(p)
            return out

        return do

    def do(parts):
        out = []
        append = out.append
        for p in parts:
            s, f = p
            if f == U and s:
                pieces = split(s)
                for i, piece in enumerate(pieces):
                    if i & 1:
                        append((piece, S))
                    elif piece:
                        append((piece, U))
            else:
                append(p)
        return out

    return do


def _compile_flagger(patterns: Iterable[str], new_flag: int) -> Callable:
    # one alternation regex == "any pattern matches" (same acceptance as the
    # reference's per-pattern loop, /root/reference/log2seq/statement.py:160-166)
    pats = list(patterns)
    if len(pats) == 1:
        match = re.compile(pats[0]).match
    else:
        match = re.compile("|".join(f"(?:{p})" for p in pats)).match

    def do(parts):
        out = []
        append = out.append
        for p in parts:
            s, f = p
            if f == U and s and match(s):
                append((s, new_flag))
            else:
                append(p)
        return out

    return do


_IP_CHARSET = re.compile(r"[^0-9a-fA-F.:/%]")
# exact dotted-quad IPv4 (four 0-255 octets, no leading zeros) — precisely
# the strings ipaddress.IPv4Address accepts, as a fast-accept path
_OCTET = r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
_IPV4_EXACT = re.compile(rf"{_OCTET}\.{_OCTET}\.{_OCTET}\.{_OCTET}$").match


def _is_ip(s: str, addr: bool, net: bool) -> bool:
    # reference fast path: no '.' and no ':' → never an IP
    # (/root/reference/log2seq/statement.py:449-453)
    if "." not in s and ":" not in s:
        return False
    # fast-accept the overwhelmingly common case (plain IPv4 address)
    if addr and _IPV4_EXACT(s):
        return True
    # extra exactness-preserving fast path: a valid address/network uses only
    # [0-9a-fA-F.:/] — except IPv6 zone ids ("fe80::1%eth0"), which contain
    # '%'; anything else cannot parse, so skip the (slow) exception path.
    if "%" not in s and _IP_CHARSET.search(s):
        return False
    if addr:
        try:
            ipaddress.ip_address(s)
            return True
        except ValueError:
            pass
    if net and "/" in s:
        try:
            ipaddress.ip_network(s, strict=False)
            return True
        except ValueError:
            pass
    return False


def _compile_fixip(spec: A.FixIP) -> Callable:
    addr, net = spec.address, spec.network

    def do(parts):
        out = []
        append = out.append
        for p in parts:
            s, f = p
            if f == U and s and _is_ip(s, addr, net):
                append((s, F))
            else:
                append(p)
        return out

    return do


def _split_by_groups(s: str, mo, group_flags, other_flag: int) -> list:
    """Split one part by the named-group spans of a match, labeling group
    spans with their flags and gaps with ``other_flag``; group spans ordered
    by start; overlap → ValueError (mirrors ``_separate_partial_match``,
    ``/root/reference/log2seq/statement.py:243-264``)."""
    out = []
    cur = 0
    spans = []
    for g, fl in group_flags:
        st = mo.start(g)
        if st != -1:
            spans.append((st, mo.end(g), fl))
    spans.sort()
    for st, en, fl in spans:
        if st < cur:
            raise ValueError("Invalid pattern with duplicated name groups")
        if st > cur:
            out.append((s[cur:st], other_flag))
        out.append((s[st:en], fl))
        cur = en
    if cur < len(s):
        out.append((s[cur:], other_flag))
    return out


def _compile_partial(patterns, group_flags, other_flag: int,
                     recursive: bool) -> Callable:
    regs = [re.compile(p) for p in patterns]
    gf = tuple(group_flags)

    def apply_one(s, f, rx, out):
        mo = rx.match(s)
        if mo is None:
            out.append((s, f))
            return
        segs = _split_by_groups(s, mo, gf, other_flag)
        if not recursive:
            out.extend(segs)
            return
        # iterative recursion into the "rest" segments (the reference
        # recurses on parts labeled flag_other,
        # /root/reference/log2seq/statement.py:224-241) — an explicit stack
        # so a pathological input can't blow the interpreter stack
        stack = [segs]
        cursor = [0]
        while stack:
            segs = stack[-1]
            i = cursor[-1]
            if i >= len(segs):
                stack.pop()
                cursor.pop()
                continue
            cursor[-1] += 1
            seg_s, seg_f = segs[i]
            if seg_f != other_flag:
                out.append((seg_s, seg_f))
                continue
            mo = rx.match(seg_s)
            if mo is None:
                out.append((seg_s, seg_f))
                continue
            child = _split_by_groups(seg_s, mo, gf, other_flag)
            if child == [(seg_s, seg_f)]:
                # no progress (match with no participating groups): emit
                # as-is instead of looping forever
                out.append((seg_s, seg_f))
                continue
            stack.append(child)
            cursor.append(0)

    def do(parts):
        for rx in regs:
            nxt = []
            for s, f in parts:
                if f == U and s:
                    apply_one(s, f, rx, nxt)
                else:
                    nxt.append((s, f))
            parts = nxt
        return parts

    return do


def _paren_pattern(left: str, right: str) -> str:
    return (r"^.*?(?P<left>" + re.escape(left) + r")(?P<fix>.+?)"
            r"(?P<right>" + re.escape(right) + r").*$")


def _compile_conditional_split(spec: A.ConditionalSplit) -> Callable:
    preds = [re.compile(p).match for p in spec.patterns]
    rx = re.compile(r"([" + re.escape(spec.separators) + r"]+)")
    split = rx.split

    def do(parts):
        out = []
        append = out.append
        for p in parts:
            s, f = p
            if f == U and s and any(m(s) for m in preds):
                pieces = split(s)
                for i, piece in enumerate(pieces):
                    if i & 1:
                        append((piece, S))
                    elif piece:
                        append((piece, U))
            else:
                append(p)
        return out

    return do


def compile_action(spec) -> Callable:
    if isinstance(spec, A.Split):
        return _compile_split(spec.separators)
    if isinstance(spec, A.Fix):
        return _compile_flagger(spec.patterns, F)
    if isinstance(spec, A.Remove):
        return _compile_flagger(spec.patterns, S)
    if isinstance(spec, A.FixIP):
        return _compile_fixip(spec)
    if isinstance(spec, A.FixPartial):
        gf = ([(g, F) for g in spec.fix_groups]
              + [(g, S) for g in spec.remove_groups])
        other = S if spec.rest_remove else U
        return _compile_partial(spec.patterns, gf, other, spec.recursive)
    if isinstance(spec, A.FixParenthesis):
        pats = [_paren_pattern(l, r) for l, r in spec.pairs]
        gf = [("fix", F), ("left", S), ("right", S)]
        return _compile_partial(pats, gf, U, spec.recursive)
    if isinstance(spec, A.RemovePartial):
        gf = [(g, S) for g in spec.remove_groups]
        return _compile_partial(spec.patterns, gf, U, spec.recursive)
    if isinstance(spec, A.ConditionalSplit):
        return _compile_conditional_split(spec)
    raise TypeError(f"unknown action spec: {type(spec)!r}")


# ---------------------------------------------------------------------------
# fused per-part pipeline
# ---------------------------------------------------------------------------
#
# Split / Fix / Remove / FixIP / ConditionalSplit all act on each part
# INDEPENDENTLY, and every one of them passes FIXED/SEPARATOR parts through
# untouched. For chains made only of these (the default preset and most
# loghub configs), the whole chain fuses into one depth-first pass per
# part: a part flows stage→stage until it is fixed/removed/split, and
# non-UNKNOWN parts go straight to the output — no intermediate part lists
# are materialized per action. Emission order equals the stream order of
# the staged version, so words/symbols are byte-identical.
#
# Finalization is fused too: stages append straight into (words, syms),
# using the invariant that the reference ``_separate``'s ``prev_word``
# state is exactly ``len(syms) == len(words)`` (every word emission pads
# syms to equal length; a separator emission makes syms one longer). No
# (str, flag) tuples, no second pass. Only non-empty words reach emission
# (split sites drop empty pieces; the empty statement is special-cased),
# matching _finalize's empty-word skip.

def _fuse_one(spec, nxt) -> Callable:
    if isinstance(spec, A.Split):
        rx = re.compile(r"([" + re.escape(spec.separators) + r"]+)")
        split = rx.split
        if len(spec.separators) == 1:
            sep = spec.separators

            def stage(s, words, syms, split=split, nxt=nxt, sep=sep):
                if sep not in s:
                    nxt(s, words, syms)
                    return
                pieces = split(s)
                for i, piece in enumerate(pieces):
                    if i & 1:
                        if len(syms) == len(words):
                            syms.append(piece)
                        else:
                            syms[-1] += piece
                    elif piece:
                        nxt(piece, words, syms)
            return stage

        def stage(s, words, syms, split=split, nxt=nxt):
            pieces = split(s)
            if len(pieces) == 1:
                nxt(s, words, syms)
                return
            for i, piece in enumerate(pieces):
                if i & 1:
                    if len(syms) == len(words):
                        syms.append(piece)
                    else:
                        syms[-1] += piece
                elif piece:
                    nxt(piece, words, syms)
        return stage

    if isinstance(spec, A.Fix):
        pats = list(spec.patterns)
        match = re.compile(pats[0] if len(pats) == 1 else
                           "|".join(f"(?:{p})" for p in pats)).match

        def stage(s, words, syms, match=match, nxt=nxt):
            if match(s):
                if len(syms) == len(words):
                    syms.append("")
                words.append(s)
            else:
                nxt(s, words, syms)
        return stage

    if isinstance(spec, A.Remove):
        pats = list(spec.patterns)
        match = re.compile(pats[0] if len(pats) == 1 else
                           "|".join(f"(?:{p})" for p in pats)).match

        def stage(s, words, syms, match=match, nxt=nxt):
            if match(s):
                if len(syms) == len(words):
                    syms.append(s)
                else:
                    syms[-1] += s
            else:
                nxt(s, words, syms)
        return stage

    if isinstance(spec, A.FixIP):
        addr, net = spec.address, spec.network

        def stage(s, words, syms, nxt=nxt):
            # inline the reference's cheap reject (no '.' and no ':') so
            # the overwhelmingly common plain-word part skips the call
            if ("." not in s and ":" not in s) \
                    or not _is_ip(s, addr, net):
                nxt(s, words, syms)
            else:
                if len(syms) == len(words):
                    syms.append("")
                words.append(s)
        return stage

    if isinstance(spec, A.ConditionalSplit):
        preds = [re.compile(p).match for p in spec.patterns]
        split = re.compile(r"([" + re.escape(spec.separators) + r"]+)").split

        def stage(s, words, syms, preds=preds, split=split, nxt=nxt):
            if any(m(s) for m in preds):
                pieces = split(s)
                for i, piece in enumerate(pieces):
                    if i & 1:
                        if len(syms) == len(words):
                            syms.append(piece)
                        else:
                            syms[-1] += piece
                    elif piece:
                        nxt(piece, words, syms)
            else:
                nxt(s, words, syms)
        return stage

    raise TypeError(spec)


def _compile_fused(specs) -> Callable[[str], tuple[list[str], list[str]]]:
    def terminal(s, words, syms):
        # s is never empty here (split sites drop empty pieces)
        if len(syms) == len(words):
            syms.append("")
        words.append(s)

    head = terminal
    for spec in reversed(list(specs)):
        head = _fuse_one(spec, head)

    def parse_statement(statement: str, head=head) -> tuple[list, list]:
        if not statement:
            return [], [""]
        words: list = []
        syms: list = []
        head(statement, words, syms)
        if len(syms) == len(words):
            syms.append("")
        return words, syms

    return parse_statement


def _compile_default_shape(specs) -> Optional[Callable]:
    """Fully hand-fused fast path for the preset chain shape
    ``[Split, FixIP, Fix, Split(single-char)]`` (the reference's default
    statement parser, used by 15/16 loghub configs and the flagship):
    ONE function, zero per-part closure-chain calls. Byte-identical to the
    staged semantics — covered by the differential parity suite."""
    if len(specs) != 4:
        return None
    s1, ip, fx, s2 = specs
    if not (isinstance(s1, A.Split) and isinstance(ip, A.FixIP)
            and isinstance(fx, A.Fix) and isinstance(s2, A.Split)
            and len(s2.separators) == 1):
        return None
    split1 = re.compile(r"([" + re.escape(s1.separators) + r"]+)").split
    split2 = re.compile(r"([" + re.escape(s2.separators) + r"]+)").split
    sep2 = s2.separators
    pats = list(fx.patterns)
    match_fix = re.compile(pats[0] if len(pats) == 1 else
                           "|".join(f"(?:{p})" for p in pats)).match
    addr, net = ip.address, ip.network
    is_ip = _is_ip

    def parse_statement(statement: str) -> tuple[list, list]:
        if not statement:
            return [], [""]
        words: list = []
        syms: list = []
        for i, piece in enumerate(split1(statement)):
            if i & 1:
                if len(syms) == len(words):
                    syms.append(piece)
                else:
                    syms[-1] += piece
            elif piece:
                has_dot_colon = "." in piece or ":" in piece
                if (has_dot_colon and is_ip(piece, addr, net)) \
                        or match_fix(piece) or sep2 not in piece:
                    if len(syms) == len(words):
                        syms.append("")
                    words.append(piece)
                    continue
                for j, q in enumerate(split2(piece)):
                    if j & 1:
                        if len(syms) == len(words):
                            syms.append(q)
                        else:
                            syms[-1] += q
                    elif q:
                        if len(syms) == len(words):
                            syms.append("")
                        words.append(q)
        if len(syms) == len(words):
            syms.append("")
        return words, syms

    def parse_into(statement: str, flat_w: list, flat_s: list) -> None:
        """Append one row's words/symbols into SHARED flat lists (the
        caller records offsets) — skips per-row list allocation and lets
        ``parse_statements`` build the Arrow list arrays from one flat
        values array. Same emission sites; ``prev_word`` becomes
        (len(flat_s)-bs) == (len(flat_w)-bw) against the row's bases."""
        bw, bs = len(flat_w), len(flat_s)
        if not statement:
            flat_s.append("")
            return
        for i, piece in enumerate(split1(statement)):
            if i & 1:
                if len(flat_s) - bs == len(flat_w) - bw:
                    flat_s.append(piece)
                else:
                    flat_s[-1] += piece
            elif piece:
                has_dot_colon = "." in piece or ":" in piece
                if (has_dot_colon and is_ip(piece, addr, net)) \
                        or match_fix(piece) or sep2 not in piece:
                    if len(flat_s) - bs == len(flat_w) - bw:
                        flat_s.append("")
                    flat_w.append(piece)
                    continue
                for j, q in enumerate(split2(piece)):
                    if j & 1:
                        if len(flat_s) - bs == len(flat_w) - bw:
                            flat_s.append(q)
                        else:
                            flat_s[-1] += q
                    elif q:
                        if len(flat_s) - bs == len(flat_w) - bw:
                            flat_s.append("")
                        flat_w.append(q)
        if len(flat_s) - bs == len(flat_w) - bw:
            flat_s.append("")

    parse_statement.into = parse_into
    return parse_statement


def compile_actions(specs) -> Callable[[str], tuple[list[str], list[str]]]:
    """Compile an ordered action chain into ``str -> (words, symbols)``."""
    specs = list(specs)
    fast = _compile_default_shape(specs)
    if fast is not None:
        return fast
    if specs and all(isinstance(s, (A.Split, A.Fix, A.Remove, A.FixIP,
                                    A.ConditionalSplit)) for s in specs):
        return _compile_fused(specs)

    chain = [compile_action(s) for s in specs]

    def parse_statement(statement: str) -> tuple[list[str], list[str]]:
        parts = [(statement, U)]
        for act in chain:
            parts = act(parts)
        return _finalize(parts)

    return parse_statement

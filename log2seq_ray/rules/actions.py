"""Statement-action specs (the Split / Fix / Remove masking vocabulary).

Pure-data, picklable descriptions of the segmentation/masking chain applied
to each row's statement. Semantics mirror the reference's action classes
(SURVEY.md §2.4, ``/root/reference/log2seq/statement.py``): the statement is
a stream of ``(substring, flag)`` parts with flags UNKNOWN (still
processable), FIXED (protected word) and SEPARATOR (separator text), and the
hard invariant that no byte is ever dropped — "removal" only reclassifies
text as separator, preserving the lossless reconstruction
``statement == symbols[0] + Σ(words[i] + symbols[i+1])``.

Compilation to a fast per-row kernel lives in ``log2seq_ray.kernel.statement``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Union

Patterns = Union[str, Sequence[str]]


def _as_tuple(patterns: Patterns) -> tuple[str, ...]:
    if isinstance(patterns, str):
        return (patterns,)
    return tuple(patterns)


@dataclass(frozen=True)
class Split:
    """Split UNKNOWN parts on a separator char-class; matched runs become
    SEPARATOR parts (``/root/reference/log2seq/statement.py:573-621``)."""

    separators: str

    def __init__(self, separators):
        if not isinstance(separators, str):
            separators = "".join(separators)
        object.__setattr__(self, "separators", separators)


@dataclass(frozen=True)
class Fix:
    """Whole-part match against any of the patterns → FIXED (immune to later
    actions) (``/root/reference/log2seq/statement.py:135-186``)."""

    patterns: tuple[str, ...]

    def __init__(self, patterns: Patterns):
        object.__setattr__(self, "patterns", _as_tuple(patterns))


@dataclass(frozen=True)
class FixIP:
    """FIXED if the stdlib ``ipaddress`` accepts the part as an address or
    (with '/') a network (``/root/reference/log2seq/statement.py:433-485``)."""

    address: bool = True
    network: bool = True


@dataclass(frozen=True)
class Remove:
    """Whole-part match → SEPARATOR (text preserved in symbols)
    (``/root/reference/log2seq/statement.py:488-534``)."""

    patterns: tuple[str, ...]

    def __init__(self, patterns: Patterns):
        object.__setattr__(self, "patterns", _as_tuple(patterns))


@dataclass(frozen=True)
class FixPartial:
    """Partial fix: named groups in ``fix_groups`` → FIXED,
    ``remove_groups`` → SEPARATOR, the rest → UNKNOWN (or SEPARATOR when
    ``rest_remove``); optional recursion into the rest
    (``/root/reference/log2seq/statement.py:282-369``).

    Note: the reference's docstring says only the first matching pattern is
    used, but its ``do()`` applies EVERY pattern sequentially over surviving
    UNKNOWN parts (``/root/reference/log2seq/statement.py:266-279``); we
    implement the code's behavior (SURVEY §2.4 A4).
    """

    patterns: tuple[str, ...]
    fix_groups: tuple[str, ...] = ()
    recursive: bool = False
    remove_groups: tuple[str, ...] = ()
    rest_remove: bool = False

    def __init__(self, patterns: Patterns, fix_groups: Patterns,
                 recursive: bool = False,
                 remove_groups: Optional[Patterns] = None,
                 rest_remove: bool = False):
        object.__setattr__(self, "patterns", _as_tuple(patterns))
        object.__setattr__(self, "fix_groups", _as_tuple(fix_groups))
        object.__setattr__(self, "recursive", recursive)
        object.__setattr__(self, "remove_groups",
                           () if remove_groups is None
                           else _as_tuple(remove_groups))
        object.__setattr__(self, "rest_remove", rest_remove)


@dataclass(frozen=True)
class FixParenthesis:
    """Fix the first (non-greedy) occurrence of ``left ... right``; the inner
    text becomes FIXED, the delimiters SEPARATOR
    (``/root/reference/log2seq/statement.py:372-430``). ``pairs`` is one
    ``[left, right]`` pair or a list of pairs; ``recursive`` catches repeats.
    """

    pairs: tuple[tuple[str, str], ...]
    recursive: bool = False

    def __init__(self, pairs, recursive: bool = False):
        if (len(pairs) == 2 and isinstance(pairs[0], str)
                and len(pairs[0]) >= 1):
            norm = (tuple(pairs),)
        else:
            norm = tuple(tuple(p) for p in pairs)
        for p in norm:
            if len(p) != 2:
                raise ValueError("FixParenthesis pairs must be [left, right]")
        object.__setattr__(self, "pairs", norm)
        object.__setattr__(self, "recursive", recursive)


@dataclass(frozen=True)
class RemovePartial:
    """Strip the named ``remove_groups`` out of a matching part as
    separators; the rest stays UNKNOWN
    (``/root/reference/log2seq/statement.py:537-570``)."""

    patterns: tuple[str, ...]
    remove_groups: tuple[str, ...] = ()
    recursive: bool = False

    def __init__(self, patterns: Patterns, remove_groups: Patterns,
                 recursive: bool = False):
        object.__setattr__(self, "patterns", _as_tuple(patterns))
        object.__setattr__(self, "remove_groups", _as_tuple(remove_groups))
        object.__setattr__(self, "recursive", recursive)


@dataclass(frozen=True)
class ConditionalSplit:
    """Split only the parts matching a predicate pattern
    (``/root/reference/log2seq/statement.py:624-659``)."""

    patterns: tuple[str, ...]
    separators: str

    def __init__(self, patterns: Patterns, separators):
        if not isinstance(separators, str):
            separators = "".join(separators)
        object.__setattr__(self, "patterns", _as_tuple(patterns))
        object.__setattr__(self, "separators", separators)

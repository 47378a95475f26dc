"""Property-based guards for the statement kernel: the hand-fused default
fast path, the generic fused pipeline and the staged (list-in/list-out)
chain must agree byte-for-byte on arbitrary input, and every result must
satisfy the reference's reconstruction invariant."""

from hypothesis import given, settings, strategies as st

from log2seq_ray.rules import actions as A
from log2seq_ray.rules.presets import default_statement_actions
from log2seq_ray.kernel import statement as K


def _staged(specs):
    chain = [K.compile_action(s) for s in specs]

    def fn(text):
        parts = [(text, K.U)]
        for act in chain:
            parts = act(parts)
        return K._finalize(parts)

    return fn


_DEFAULT = default_statement_actions()
_FAST = K.compile_actions(_DEFAULT)          # hand-fused default shape
_STAGED = _staged(_DEFAULT)
assert K._compile_default_shape(_DEFAULT) is not None

# a chain that exercises the generic fused path (no hand-fused shape)
_OTHER = [A.Split(" ,"), A.Remove([r"^-+$"]), A.FixIP(),
          A.ConditionalSplit([r"^%[A-Z]+.*$"], "%-"), A.Split(":")]
_FUSED_OTHER = K.compile_actions(_OTHER)
_STAGED_OTHER = _staged(_OTHER)

_alphabet = st.characters(
    codec="utf-8", categories=("L", "N", "P", "S", "Z"))
_texts = st.text(alphabet=_alphabet, max_size=120)
# inputs dense in the separators/IP/time shapes the chain cares about
_loggy = st.lists(st.sampled_from([
    "a", "10.0.0.1", "12:34:56", "::1", "x:y:z", "", " ", ":", "(",
    ")", "[", "]", "#", "=", "10.1.2.3/24", "00:11:22:33:44:55",
    "%KERNEL-4", "---", ",", "word", "émoji✓", "1.2.3",
]), max_size=20).map(" ".join)


def _check_invariant(text, words, syms):
    assert len(syms) == len(words) + 1
    rebuilt = syms[0] + "".join(w + s for w, s in zip(words, syms[1:]))
    assert rebuilt == text


@settings(max_examples=300, deadline=None)
@given(st.one_of(_texts, _loggy))
def test_default_fast_path_equals_staged(text):
    fast = _FAST(text)
    staged = _STAGED(text)
    assert fast == staged
    _check_invariant(text, *fast)


@settings(max_examples=300, deadline=None)
@given(st.one_of(_texts, _loggy))
def test_generic_fused_equals_staged(text):
    fused = _FUSED_OTHER(text)
    staged = _STAGED_OTHER(text)
    assert fused == staged
    _check_invariant(text, *fused)


@settings(max_examples=200, deadline=None)
@given(st.one_of(_texts, _loggy))
def test_flat_offsets_protocol_matches(text):
    # the `into` accumulation used by parse_statements must equal the
    # plain call
    flat_w, flat_s = [], []
    _FAST.into(text, flat_w, flat_s)
    w, s = _FAST(text)
    assert flat_w == w and flat_s == s


_linegen = st.lists(st.sampled_from([
    "Jan", "Féb", "1", "12", "2024-01-02", "12:34:56", "host-1",
    "h.example.com", "app", "sshd[123]:", "ERROR", "münchen", "日志",
    "10.0.0.1", "msg", "ログ", "text", ":", "[", "]", "1700000000",
]), max_size=10).map(" ".join)


@settings(max_examples=300, deadline=None)
@given(st.one_of(_texts, _linegen))
def test_re2_and_pyre_cascades_agree(line):
    # with non-ASCII rows routed to the CPython cascade, the fast (RE2)
    # and slow (pyre) rule sets must agree on EVERY input
    import pyarrow as pa
    from log2seq_ray.kernel.header import CompiledRuleSet
    from log2seq_ray.rules.presets import default_header_rules
    global _FAST_RS, _SLOW_RS
    try:
        _FAST_RS
    except NameError:
        _FAST_RS = CompiledRuleSet(default_header_rules(2024))
        _SLOW_RS = CompiledRuleSet(default_header_rules(2024),
                                   force_python_re=True)
    arr = pa.array([line], type=pa.string())
    f, s = _FAST_RS.parse(arr), _SLOW_RS.parse(arr)
    for k in s:
        assert f[k].to_pylist() == s[k].to_pylist(), k

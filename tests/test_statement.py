"""Statement-chain tests: ports of the reference's
``tests/test_statement.py`` expectations (exact words/symbols per action
class) against the engine's compiled kernel."""

from log2seq_ray.kernel.statement import compile_actions
from log2seq_ray.rules import actions as A
from log2seq_ray.rules.presets import default_statement_actions


def run(actions, s):
    return compile_actions(actions)(s)


def test_default():
    w, sy = run(default_statement_actions(),
                "system[12345]: host 2001:0db8:1234::1 (interface:eth0) disconnected")
    assert w == ["system", "12345", "host", "2001:0db8:1234::1",
                 "interface", "eth0", "disconnected"]
    assert sy == ["", "[", "]: ", " ", " (", ":", ") ", ""]


def test_empty():
    w, sy = run(default_statement_actions(), " ")
    assert w == []
    assert sy == [" "]


def test_empty_string():
    w, sy = run(default_statement_actions(), "")
    assert w == []
    assert sy == [""]


def test_reconstruction_invariant():
    """symbols[0] + Σ(words[i] + symbols[i+1]) == statement, byte-exact."""
    stmts = [
        "system[12345]: host 2001:0db8:1234::1 (interface:eth0) disconnected",
        "a -> b", " x  y ", "::", "", "    ", "a.b.c.d.e:80",
    ]
    acts = default_statement_actions()
    fn = compile_actions(acts)
    for s in stmts:
        w, sy = fn(s)
        assert len(sy) == len(w) + 1
        rebuilt = sy[0] + "".join(wi + si for wi, si in zip(w, sy[1:]))
        assert rebuilt == s


def test_ipaddr():
    w, _ = run([A.Split(" "), A.FixIP(), A.Split(":")],
               "tests: src :: is not link-local")
    assert w == ["tests", "src", "::", "is", "not", "link-local"]


def test_remove():
    w, _ = run([A.Split(" >"), A.Remove("[^a-zA-Z0-9]+")], "a -> b")
    assert w == ["a", "b"]


def test_fix_multiple_patterns():
    w, _ = run([A.Split(" "),
                A.Fix([r"\d+\.\d+\.\d+", r"([0-9a-f]{2}:){5}[0-9a-f]{2}"]),
                A.Split(":")],
               "ver 1.2.3 mac de:ad:be:ef:00:11 ok")
    assert w == ["ver", "1.2.3", "mac", "de:ad:be:ef:00:11", "ok"]


def test_fix_partial():
    w, _ = run([A.Split(" "),
                A.FixPartial(r'^(?P<ipaddr>(\d{1,3}\.){3}\d{1,3})\.(?P<port>\d{1,5})$',
                             fix_groups=["ipaddr", "port"]),
                A.Split(".")],
               "source 192.0.2.1.80 initialized.")
    assert w == ["source", "192.0.2.1", "80", "initialized"]


def test_fix_partial_symbols():
    w, sy = run([A.Split(" "),
                 A.FixPartial(r'^(?P<ipaddr>(\d{1,3}\.){3}\d{1,3})\.(?P<port>\d{1,5})$',
                              fix_groups=["ipaddr", "port"]),
                 A.Split(".")],
                "source 192.0.2.1.80 initialized.")
    assert sy == ["", " ", ".", " ", "."]


def test_fix_parenthesis():
    mes = 'comment added: "This is a comment description" "This is second desc".'
    expected = ["comment", "added", "This is a comment description",
                "This is second desc"]
    w, _ = run([A.FixParenthesis(['"', '"']),
                A.FixParenthesis(['"', '"']),
                A.Split(' .:"')], mes)
    assert w == expected
    w, _ = run([A.FixParenthesis(['"', '"'], recursive=True),
                A.Split(' .:"')], mes)
    assert w == expected


def test_remove_partial():
    mes = ("2000 Mar 4 12:34:56.789: host: :: and 127.0.0.1 "
           "duplicated timestamp given.")
    w, _ = run([A.Split(" "),
                A.RemovePartial(r'^.*[^:](?P<colon>:)$', remove_groups=["colon"]),
                A.RemovePartial(r'^.*[^.](?P<dot>\.)$', remove_groups=["dot"]),
                A.Fix(r'^\d{2}:\d{2}:\d{2}\.\d{3}$'),
                A.FixIP(),
                A.Split(":")], mes)
    assert w == ["2000", "Mar", "4", "12:34:56.789", "host", "::",
                 "and", "127.0.0.1", "duplicated", "timestamp", "given"]


def test_conditional_split():
    mes = "%KERNEL-4-EVENT-7: host h1-i2.example.org scored -0.035 value (20.0%)"
    w, _ = run([A.Split(" ()"),
                A.RemovePartial(r'^.*[^:](?P<colon>:)$', remove_groups=["colon"]),
                A.ConditionalSplit(r'^%[A-Z]+-\d+(-[A-Z]+-\d+)?$', r'%-')], mes)
    assert w == ["KERNEL", "4", "EVENT", "7", "host", "h1-i2.example.org",
                 "scored", "-0.035", "value", "20.0%"]

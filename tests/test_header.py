"""Header-rule tests: ports of the reference's ``tests/test_header.py`` and
``tests/test_parser.py`` expectations against the engine's batch kernel."""

import datetime

import pyarrow as pa
import pytest

from log2seq_ray.kernel.parse import CompiledLogParser
from log2seq_ray.rules import items as I
from log2seq_ray.rules.header import HeaderRule
from log2seq_ray.rules.presets import (apache_errorlog_spec,
                                       default_parser_spec)


def make(rules, actions=None, **kw):
    from log2seq_ray.rules.presets import default_statement_actions
    return CompiledLogParser(rules, actions or default_statement_actions(), **kw)


@pytest.fixture(params=[False, True], ids=["re2", "pyre"])
def force_pyre(request):
    return request.param


def test_default(force_pyre):
    p = make(*default_parser_spec(year=2024)[:1],
             actions=default_parser_spec()[1], force_python_re=force_pyre)

    r = p.parse_line("Apr  1 02:23:45 host-name.example.org message here")
    assert r["host"] == "host-name.example.org"
    assert r["message"] == "message here"
    ts = r["timestamp"]
    assert (ts.month, ts.day, ts.hour, ts.minute, ts.second) == (4, 1, 2, 23, 45)

    r = p.parse_line("Jun 30 11:11:11.012345+09:00 2001:db8::beef something")
    assert r["host"] == "2001:db8::beef"
    assert r["message"] == "something"
    ts = r["timestamp"]
    assert (ts.month, ts.day, ts.hour, ts.minute, ts.second, ts.microsecond) \
        == (6, 30, 11, 11, 11, 12345)
    assert r["tz_offset_sec"] == 9 * 3600

    r = p.parse_line("Jul 12 22:22:22-06:00 host something")
    assert r["tz_offset_sec"] == -6 * 3600

    r = p.parse_line("2020 May  2 22:22:22 192.0.2.1 message there")
    assert r["host"] == "192.0.2.1"
    assert r["timestamp"] == datetime.datetime(2020, 5, 2, 22, 22, 22)

    r = p.parse_line("2112-09-03 11:22:33 host something failure")
    assert r["rule_id"] == 1
    assert r["timestamp"] == datetime.datetime(2112, 9, 3, 11, 22, 33)

    r = p.parse_line("2112-09-03 01:02:03.987654+09:00 host something")
    assert r["timestamp"] == datetime.datetime(2112, 9, 3, 1, 2, 3, 987654)
    assert r["tz_offset_sec"] == 9 * 3600


def test_full_format(force_pyre):
    rule = HeaderRule(
        items=[I.MonthAbbreviation(),
               I.Digit("day"),
               I.Time(),
               I.Hostname("host"),
               I.String("function"),
               I.Digit("pid", optional=True),
               I.Statement()],
        full_format=r"<0> <1> <2> <3> <4>(\[<5>\])?: <6>",
        defaults={"year": 2024})
    p = make([rule], force_python_re=force_pyre)
    for line in ["Sep  1 01:02:03 host daemon[12345]: test: message ::1",
                 "Sep 12 11:22:33 host doraemon: restart"]:
        r = p.parse_line(line)
        assert r["rule_id"] == 0 and r["error"] is None
    r = p.parse_line("Sep  1 01:02:03 host daemon[12345]: test: message ::1")
    assert r["pid"] == 12345
    r = p.parse_line("Sep 12 11:22:33 host doraemon: restart")
    assert r["pid"] is None


def test_microsecond_time(force_pyre):
    p = make(*default_parser_spec(year=2024), force_python_re=force_pyre)
    r = p.parse_line("2112-09-03 11:22:33.012345 host something failure")
    ts = r["timestamp"]
    assert ts == datetime.datetime(2112, 9, 3, 11, 22, 33, 12345)


def test_year_without_century():
    from log2seq_ray.kernel.convert import convert_group
    arr = pa.array(["21", "99"])
    out = convert_group("year2", arr, "year", (20,), True)
    assert out["year"].to_pylist() == [2021, 2099]
    out = convert_group("year2", arr, "year", (19,), True)
    assert out["year"].to_pylist() == [1921, 1999]


def test_date_concat():
    from log2seq_ray.kernel.convert import convert_group
    out = convert_group("date_concat", pa.array(["210905"]), "__date",
                        (True, 20), True)
    assert (out["year"][0].as_py(), out["month"][0].as_py(),
            out["day"][0].as_py()) == (2021, 9, 5)
    out = convert_group("date_concat", pa.array(["210905"]), "__date",
                        (True, 19), True)
    assert out["year"][0].as_py() == 1921
    out = convert_group("date_concat", pa.array(["19990905"]), "__date",
                        (False, 20), True)
    assert (out["year"][0].as_py(), out["month"][0].as_py(),
            out["day"][0].as_py()) == (1999, 9, 5)


def test_timezone_conversion():
    from log2seq_ray.kernel.convert import convert_group
    arr = pa.array(["Z", "+0900", "+09:00", "-06:00", None])
    out = convert_group("tz", arr, "tzoffset", (), True)
    assert out["tzoffset"].to_pylist() == [0, 32400, 32400, -21600, None]


def test_microsecond_padding():
    from log2seq_ray.kernel.convert import convert_group
    arr = pa.array(["1", "012345", "123456", "1234567"])
    out = convert_group("frac_usec", arr, "microsecond", (), True)
    assert out["microsecond"].to_pylist() == [100000, 12345, 123456, 123456]


def test_unixtime(force_pyre):
    rule = HeaderRule(items=[I.UnixTime(), I.Statement()],
                      defaults=None)
    p = make([rule], force_python_re=force_pyre)
    r = p.parse_line("1551024123 hello")
    assert r["timestamp"] == datetime.datetime(2019, 2, 24, 16, 2, 3)
    assert r["tz_offset_sec"] == 0
    # explicit fixed-offset tz (JST)
    rule = HeaderRule(items=[I.UnixTime(tz_offset_sec=9 * 3600), I.Statement()])
    p = make([rule], force_python_re=force_pyre)
    r = p.parse_line("1551024123 hello")
    assert r["timestamp"] == datetime.datetime(2019, 2, 25, 1, 2, 3)
    assert r["tz_offset_sec"] == 9 * 3600


def test_separate_timezone_item(force_pyre):
    rule = HeaderRule(items=[I.Date(), I.Time(), I.TimeZone(),
                             I.Hostname("host"), I.Statement()],
                      separator=" ")
    p = make([rule], force_python_re=force_pyre)
    r = p.parse_line("2020-05-02 11:22:33 +09:00 host the message")
    assert r["timestamp"] == datetime.datetime(2020, 5, 2, 11, 22, 33)
    assert r["tz_offset_sec"] == 9 * 3600
    assert r["host"] == "host"
    r2 = p.parse_line("2020-05-02 11:22:33 Z host msg")
    assert r2["timestamp"] == datetime.datetime(2020, 5, 2, 11, 22, 33)
    assert r2["tz_offset_sec"] == 0


def test_optional_item_omitted_when_absent(force_pyre):
    rule = HeaderRule(
        items=[I.MonthAbbreviation(), I.Digit("day"), I.Time(),
               I.Hostname("host", optional=True), I.Statement()],
        full_format=r"<0> <1> <2>( <3>)?: <4>", defaults={"year": 2020})
    p = make([rule], force_python_re=force_pyre)
    assert p.parse_line("Sep  1 01:02:03 myhost: hello")["host"] == "myhost"
    assert p.parse_line("Sep  1 01:02:03: hello")["host"] is None


def test_readme_end_to_end(force_pyre):
    p = make(*default_parser_spec(year=2020), force_python_re=force_pyre)
    r = p.parse_line("Jan  1 12:34:56 host-device1 system[12345]: "
                     "host 2001:0db8:1234::1 (interface:eth0) disconnected")
    assert r["timestamp"] == datetime.datetime(2020, 1, 1, 12, 34, 56)
    assert r["words"] == ['system', '12345', 'host', '2001:0db8:1234::1',
                          'interface', 'eth0', 'disconnected']
    assert r["symbols"] == ['', '[', ']: ', ' ', ' (', ':', ') ', '']


def test_apache_errorlog(force_pyre):
    p = make(*apache_errorlog_spec(), force_python_re=force_pyre)
    r = p.parse_line(
        "[Wed Oct 11 14:32:52 2000] [error] [client 127.0.0.1] "
        "client denied by server configuration: /export/home/live/ap/htdocs/test")
    assert r["severityname"] == "error"
    assert r["host"] == "127.0.0.1"
    assert r["message"] == ("client denied by server configuration: "
                            "/export/home/live/ap/htdocs/test")

    r = p.parse_line(
        "[Fri Sep 09 10:42:29.902022 2011] [core:error] "
        "[pid 35708:tid 4328636416] [client 72.15.99.187] "
        "File does not exist: /usr/local/apache2/htdocs/favicon.ico")
    assert r["modulename"] == "core"
    assert r["severityname"] == "error"
    assert r["processid"] == 35708
    assert r["threadid"] == 4328636416
    assert r["host"] == "72.15.99.187"
    assert r["message"] == "File does not exist: /usr/local/apache2/htdocs/favicon.ico"

    r = p.parse_line(
        "[Mon Dec 05 08:10:12.123456 2016] [mpm_event:notice] "
        "[pid 1:tid 2] AH00489: Apache configured")
    assert r["modulename"] == "mpm_event"
    assert r["message"] == "AH00489: Apache configured"

    r = p.parse_line(
        "[Mon Dec 05 08:10:12.123456 2016] [authz_core:error] "
        "[pid 1:tid 2] [client 1.2.3.4] AH01630: client denied")
    assert r["modulename"] == "authz_core"
    assert r["host"] == "1.2.3.4"


def test_header_mismatch_is_error_row():
    p = make(*default_parser_spec())
    tbl = p.parse_lines(pa.array(["totally unparseable @@@", ""]))
    assert tbl["error"][0].as_py() == "header format mismatch"
    assert tbl["rule_id"][0].as_py() is None
    assert tbl["error"][1].as_py() == "empty line"


def test_rule_validation():
    from log2seq_ray.rules.items import RuleDefinitionError
    with pytest.raises(RuleDefinitionError):
        HeaderRule(items=[I.Digit("day", optional=True),
                          I.Statement(optional=True)])
    with pytest.raises(RuleDefinitionError):
        HeaderRule(items=[I.Digit("day")])  # no Statement
    with pytest.raises(RuleDefinitionError):
        HeaderRule(items=[I.Digit("x"), I.Digit("x"), I.Statement()])
    with pytest.raises(RuleDefinitionError):
        HeaderRule(items=[I.Digit("day"), I.Statement()],
                   full_format=r"<0> x")  # placeholder <1> missing


def test_invalid_timestamp_is_error_row():
    p = make(*default_parser_spec(year=2024))
    tbl = p.parse_lines(pa.array(["2020-13-40 11:22:33 host boom"]))
    assert tbl["error"][0].as_py() == "invalid timestamp component"


def test_missing_date_part_is_error_row(force_pyre):
    rule = HeaderRule(items=[I.MonthAbbreviation(), I.Digit("day"),
                             I.Time(), I.Statement()])  # no year, no default
    p = make([rule], force_python_re=force_pyre)
    tbl = p.parse_lines(pa.array(["Sep  1 01:02:03 hello"]))
    assert "missing date part" in tbl["error"][0].as_py()


def test_astimezone_conversion():
    """astimezone: convert the assembled timestamp to a fixed offset
    (naive input interpreted as UTC — documented deviation)."""
    rule = HeaderRule(items=[I.Date(), I.Time(), I.Hostname("host"),
                             I.Statement()],
                      astimezone_offset_sec=9 * 3600)
    p = make([rule])
    r = p.parse_line("2020-05-02 11:22:33+00:00 host msg")
    assert r["timestamp"] == datetime.datetime(2020, 5, 2, 20, 22, 33)
    assert r["tz_offset_sec"] == 9 * 3600
    r = p.parse_line("2020-05-02 11:22:33+09:00 host msg")
    assert r["timestamp"] == datetime.datetime(2020, 5, 2, 11, 22, 33)


def test_useritem_strip():
    rule = HeaderRule(items=[I.Date(), I.Time(),
                             I.UserItem("tag", r"\[[a-z]+\]", strip="[]"),
                             I.Statement()])
    p = make([rule])
    r = p.parse_line("2020-05-02 11:22:33 [abc] message")
    assert r["tag"] == "abc"


def test_nonascii_rule_priority_matches_python_re():
    # RE2's ASCII-only \w under-matches rule 0 on "héllo"; rule 1 would
    # claim the line, inverting first-match-wins. Non-ASCII rows must route
    # straight to the CPython-re cascade (ADVICE r1).
    import pyarrow as pa
    from log2seq_ray.kernel.header import CompiledRuleSet
    from log2seq_ray.rules.header import HeaderRule
    from log2seq_ray.rules import items as I
    rules = [
        HeaderRule(items=[I.UserItem("v", r"\w+"), I.Statement()],
                   reformat_timestamp=False),
        HeaderRule(items=[I.UserItem("v", r"[^ ]+"), I.Statement()],
                   reformat_timestamp=False),
    ]
    fast = CompiledRuleSet(rules)
    slow = CompiledRuleSet(rules, force_python_re=True)
    lines = pa.array(["héllo wörld one", "plain ascii line"])
    of, os_ = fast.parse(lines), slow.parse(lines)
    assert of["rule_id"].to_pylist() == os_["rule_id"].to_pylist() == [0, 0]
    assert of["v"].to_pylist() == os_["v"].to_pylist()
    assert of["message"].to_pylist() == os_["message"].to_pylist()


def test_hostile_input_probes_never_raise():
    # verify-skill probes: empty line, CRLF, 100KB statement, embedded NUL,
    # garbage — all must become rows (parsed or error), never exceptions,
    # and parsed rows keep the lossless reconstruction invariant.
    import pyarrow as pa
    from log2seq_ray.kernel.parse import CompiledLogParser
    from log2seq_ray.rules.presets import default_parser_spec
    p = CompiledLogParser(*default_parser_spec(year=2024))
    big = "Jan  1 12:34:56 host1 app: " + "x " * 50_000  # ~100KB statement
    lines = [
        "",
        "Jan  1 12:34:56 host1 app: hello\r\n",
        big,
        "Jan  1 12:34:56 host1 app: nul\x00byte inside",
        "\x7f\x01\x02 total garbage \xff-ish",
        "Jan  1 12:34:56",  # header-only, no statement match for rule
    ]
    tbl = p.parse_lines(pa.array(lines, type=pa.string()))
    assert tbl.num_rows == len(lines)
    errs = tbl.column("error").to_pylist()
    assert errs[0] == "empty line"
    assert errs[1] is None
    msgs = tbl.column("message").to_pylist()
    words = tbl.column("words").to_pylist()
    syms = tbl.column("symbols").to_pylist()
    for m, w, s in zip(msgs, words, syms):
        if m is None:
            continue
        # lossless reconstruction: message == syms[0] + Σ(words[i]+syms[i+1])
        rebuilt = s[0] + "".join(a + b for a, b in zip(w, s[1:]))
        assert rebuilt == m
        assert len(s) == len(w) + 1


def test_noncapturing_bracket_first_char_class():
    """']' as the FIRST member of a character class (optionally after
    '^') is a literal — the rewriter must not exit the class there and
    rewrite a later '(' inside it (that silently changes the regex)."""
    import re
    from log2seq_ray.rules.items import noncapturing
    for pat in (r"[]()]+", r"[^]]+\(x\)", r"a[](]b", r"[^](]+"):
        assert noncapturing(pat) == pat, pat
        re.compile(pat)  # stays a valid regex
    # bare groups OUTSIDE classes still rewrite
    assert noncapturing(r"(ab)[](]") == r"(?:ab)[](]"
    assert noncapturing(r"(?P<n>x)([)])") == r"(?P<n>x)(?:[)])"


def test_parse_lines_empty_array():
    """Zero input lines (an empty shard) yield a typed empty table, not
    a concat_arrays crash."""
    from log2seq_ray import CompiledLogParser
    from log2seq_ray.rules.presets import default_parser_spec
    p = CompiledLogParser(*default_parser_spec(year=2024))
    t = p.parse_lines(pa.array([], type=pa.string()))
    assert t.num_rows == 0
    assert {"rule_id", "timestamp", "message", "words", "symbols",
            "error"} <= set(t.schema.names)

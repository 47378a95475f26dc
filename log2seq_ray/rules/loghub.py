"""Rule-spec ports of the 16 loghub example parsers.

Each function returns ``(header_rules, statement_actions)`` equivalent to
the reference's ``example/loghub_<X>/parser.py`` scripts (the de-facto
conformance corpus, SURVEY §5). These are *declarative configs*, not code
ports — the differential harness (``tests/test_differential.py``) asserts
byte-identical ``message``/``words``/``symbols`` and equal header fields
against the reference on all 32k sample lines.

``year`` defaults to 2024 (pinned; the reference scripts use
``datetime.now().year`` — pass the same year when comparing).
"""

from __future__ import annotations

from . import actions as A
from . import items as I
from .header import HeaderRule
from .presets import (DEFAULT_YEAR, PATTERN_MACADDR, PATTERN_TIME,
                      default_statement_actions)


def android(year: int = DEFAULT_YEAR):
    rules = [HeaderRule(
        items=[I.ItemGroup([I.Digit("month"), I.Digit("day")], separator="-"),
               I.Time(),
               I.Digit("pid"),
               I.Digit("tid"),
               I.UserItem("level", r"[A-Z]"),
               I.UserItem("component", r"[^:]+"),
               I.Statement()],
        separator=":\t ", defaults={"year": year})]
    return rules, default_statement_actions()


def apache():
    rule1 = HeaderRule(
        items=[I.ItemGroup([I.String("weekday", dummy=True),
                            I.MonthAbbreviation(),
                            I.Digit("day"),
                            I.Time(),
                            I.Digit("year")],
                           separator=" "),
               I.String("severityname"),
               I.Statement()],
        full_format=r"\[<0>\] \[<1>\] <2>")
    rule2 = HeaderRule(items=[I.Statement()], reformat_timestamp=False)
    return [rule1, rule2], default_statement_actions()


def bgl():
    rules = [HeaderRule(
        items=[I.String("label", symbols="-"),
               I.Digit("unixtime", dummy=True),
               I.ItemGroup([I.Digit("year", dummy=True),
                            I.Digit("month", dummy=True),
                            I.Digit("day", dummy=True)],
                           separator="."),
               I.String("host", symbols=":_-", dummy=True),
               I.ItemGroup([I.Digit("year"),
                            I.Digit("month"),
                            I.Digit("day"),
                            I.Digit("hour"),
                            I.Digit("minute"),
                            I.Digit("second"),
                            # the reference writes DemicalSecond("dsecond"),
                            # whose positional arg lands on `optional` and is
                            # truthy — i.e. an *optional* fraction item
                            I.FracSecond(optional=True)],
                           separator="-."),
               I.String("host", symbols=":_-"),
               I.String("type"),
               I.String("component", symbols="_"),
               I.String("level"),
               I.Statement(optional=True)])]
    return rules, default_statement_actions()


def hdfs():
    rules = [HeaderRule(
        items=[I.DateConcat(no_century=True),
               I.TimeConcat(),
               I.Digit("processid"),
               I.String("level"),
               I.UserItem("component", r"[a-zA-Z0-9.$]+"),
               I.Statement()],
        separator=" :")]
    return rules, default_statement_actions()


def hpc():
    rules = [HeaderRule(
        items=[I.Digit("logid"),
               I.String("class", optional=True),
               I.UserItem("node", r"[a-zA-Z0-9-]+", optional=True),
               I.UserItem("component", r"[a-zA-Z._-]+"),
               I.UserItem("state", r"[a-zA-Z._-]+"),
               I.UnixTime(),
               I.UserItem("flag", r"[0-9-]+"),
               I.Statement()],
        reformat_timestamp=False)]
    return rules, default_statement_actions()


def hadoop():
    rule1 = HeaderRule(
        items=[I.Date(),
               I.ItemGroup([I.Digit("hour"),
                            I.Digit("minute"),
                            I.Digit("second"),
                            I.FracSecond()], separator=":,"),
               I.String("level"),
               I.UserItem("process", r".+"),
               I.UserItem("component", r"[a-zA-Z0-9.]+"),
               I.Statement()],
        full_format=r"<0> <1> <2> \[<3>\] <4>: <5>")
    rule2 = HeaderRule(items=[I.Statement()], reformat_timestamp=False)
    return [rule1, rule2], default_statement_actions()


def healthapp():
    rules = [HeaderRule(
        items=[I.ItemGroup([I.UserItem("datestring", "[0-9]+"),
                            I.Digit("hour"),
                            I.Digit("minute"),
                            I.Digit("second"),
                            I.FracSecond()], separator=":-"),
               I.UserItem("component", r"[a-zA-Z0-9_]+"),
               I.Digit("processid"),
               I.Statement()],
        separator="|", reformat_timestamp=False)]
    return rules, default_statement_actions()


def linux(year: int = DEFAULT_YEAR):
    defaults = {"year": year}
    rule1 = HeaderRule(
        items=[I.MonthAbbreviation(),
               I.Digit("day"),
               I.Time(),
               I.Hostname("host"),
               I.UserItem("component", r".+?"),
               I.Digit("processid", optional=True),
               I.Statement()],
        full_format=r"<0> <1> <2> <3> <4>(\[<5>\])?: <6>", defaults=defaults)
    rule2 = HeaderRule(
        items=[I.MonthAbbreviation(),
               I.Digit("day"),
               I.Time(),
               I.Hostname("host"),
               I.Statement()],
        separator=" ", defaults=defaults)
    return [rule1, rule2], default_statement_actions()


def mac(year: int = DEFAULT_YEAR):
    defaults = {"year": year, "host": None}
    rule1 = HeaderRule(
        items=[I.MonthAbbreviation(),
               I.Digit("day"),
               I.Time(),
               I.Hostname("host"),
               I.UserItem("component", r".+?"),
               I.Digit("processid"),
               I.UserItem("address", r"[^)]*", optional=True, dummy=True),
               I.Statement()],
        full_format=r"<0> <1> <2> <3> <4>\[<5>\]( \(<6>\))?: <7>",
        defaults=defaults)
    rule2 = HeaderRule(
        items=[I.MonthAbbreviation(),
               I.Digit("day"),
               I.Time(),
               I.UserItem("dummy", r"---"),
               I.Statement()],
        separator=" :[]", defaults=defaults)
    rule3 = HeaderRule(items=[I.Statement()], separator=" \t",
                       reformat_timestamp=False)
    return [rule1, rule2, rule3], default_statement_actions()


def openssh(year: int = DEFAULT_YEAR):
    rules = [HeaderRule(
        items=[I.MonthAbbreviation(),
               I.Digit("day"),
               I.Time(),
               I.Hostname("host"),
               I.UserItem("component", r"[a-zA-Z0-9()._-]+"),
               I.Digit("processid", optional=True),
               I.Statement()],
        separator=" :[]", defaults={"year": year})]
    return rules, default_statement_actions()


def openstack():
    rule1 = HeaderRule(
        items=[I.UserItem("skip", r"[^ ]+", dummy=True),
               I.Date(),
               I.Time(),
               I.Digit("processid"),
               I.String("level"),
               I.Hostname("host"),
               I.UserItem("addr", r"[a-zA-Z0-9 -]+"),
               I.Statement()],
        full_format=r"<0> <1> <2> <3> <4> <5> \[<6>\] <7>")
    rule2 = HeaderRule(items=[I.Statement()], reformat_timestamp=False)
    return [rule1, rule2], default_statement_actions()


def proxifier(year: int = DEFAULT_YEAR):
    defaults = {"year": year}
    rule1 = HeaderRule(
        items=[I.ItemGroup([I.Digit("month"),
                            I.Digit("day"),
                            I.Time()], separator=" ."),
               I.UserItem("env", r".+?"),
               I.Statement()],
        full_format=r"\[<0>\] <1> - <2>", defaults=defaults)
    rule2 = HeaderRule(
        items=[I.ItemGroup([I.Digit("month"),
                            I.Digit("day"),
                            I.Time()], separator=" ."),
               I.Statement()],
        separator="[] ", defaults=defaults)
    return [rule1, rule2], default_statement_actions()


def spark():
    rule1 = HeaderRule(
        items=[I.ItemGroup([I.YearWithoutCentury(),
                            I.Digit("month"),
                            I.Digit("day")], separator="/"),
               I.Time(),
               I.String("level"),
               I.UserItem("component", r"[a-zA-Z0-9.]+"),
               I.Statement()],
        separator=" :")
    rule2 = HeaderRule(items=[I.Statement()], reformat_timestamp=False)
    return [rule1, rule2], default_statement_actions()


def thunderbird():
    prefix = lambda: [
        I.UserItem("label", r"-|[A-Z]+"),
        I.Digit("unixtime", dummy=True),
        I.ItemGroup([I.Digit("year"),
                     I.Digit("month", dummy=True),
                     I.Digit("day", dummy=True)],
                    separator="."),
        I.UserItem("host", r"[a-zA-Z0-9:#-]+"),
        I.MonthAbbreviation(),
        I.Digit("day"),
        I.Time(),
        I.UserItem("location", r"[a-zA-Z0-9/@#-]+", dummy=True),
    ]
    rule1 = HeaderRule(
        items=prefix() + [I.UserItem("component", r".+?"),
                          I.Digit("processid", optional=True),
                          I.Statement()],
        full_format=r"<0> <1> <2> <3> <4> <5> <6> <7> <8>(\[<9>\])?: <10>")
    rule2 = HeaderRule(items=prefix() + [I.Statement()])
    return [rule1, rule2], default_statement_actions()


def windows():
    rule1 = HeaderRule(
        items=[I.Date(),
               I.Time(),
               I.String("level"),
               I.String("component"),
               I.Statement()],
        separator=" ,\t")
    rule2 = HeaderRule(items=[I.Statement()], reformat_timestamp=False)
    pattern_fullpath = r"[A-Z]:(\\[a-zA-Z0-9.*?_-])+"
    actions = [
        A.Split('"' + "()[]{}|+',=><;`# "),
        A.FixIP(),
        A.Fix([PATTERN_TIME, PATTERN_MACADDR, pattern_fullpath]),
        A.Split(":"),
    ]
    return [rule1, rule2], actions


def zookeeper():
    rules = [HeaderRule(
        items=[I.Date(),
               I.ItemGroup([I.Digit("hour"),
                            I.Digit("minute"),
                            I.Digit("second"),
                            I.FracSecond()], separator=":,"),
               I.String("level"),
               I.UserItem("component", r".*"),
               I.Statement()],
        full_format=r"<0> <1> - <2>  \[<3>\] - <4>")]
    return rules, default_statement_actions()


#: dataset name -> (spec factory, sample log filename, takes_year)
DATASETS = {
    "Android": (android, "Android_2k.log", True),
    "Apache": (apache, "Apache_2k.log", False),
    "BGL": (bgl, "BGL_2k.log", False),
    "HDFS": (hdfs, "HDFS_2k.log", False),
    "HPC": (hpc, "HPC_2k.log", False),
    "Hadoop": (hadoop, "Hadoop_2k.log", False),
    "HealthApp": (healthapp, "HealthApp_2k.log", False),
    "Linux": (linux, "Linux_2k.log", True),
    "Mac": (mac, "Mac_2k.log", True),
    "OpenSSH": (openssh, "SSH_2k.log", True),
    "OpenStack": (openstack, "OpenStack_2k.log", False),
    "Proxifier": (proxifier, "Proxifier_2k.log", True),
    "Spark": (spark, "Spark_2k.log", False),
    "Thunderbird": (thunderbird, "Thunderbird_2k.log", False),
    "Windows": (windows, "Windows_2k.log", False),
    "Zookeeper": (zookeeper, "Zookeeper_2k.log", False),
}

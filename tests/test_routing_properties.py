"""Property-based routing tests (hypothesis): for arbitrary messages,
the Spark routing expression must agree with an independent pure-Python
re-implementation of the reference's first-match-wins loop (reference
main.go:507-542 semantics: ordered scan, regex = unanchored search,
substring = containment, first hit wins, no hit -> unmatched).

This guards the semantics the golden cases can't cover exhaustively:
regex-metacharacter payloads, messages matching several splits at once,
and the drop-vs-unmatched distinction under adversarial inputs.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tests.test_routing import CIDR_PATTERN, SPLITER_OPENSTACK, SPLITER_RSYSLOG

from kafka_go_streamer_spark.routing import route

#: Fragments that hit / near-miss the fixture patterns, mixed with noise.
_FRAGMENTS = [
    'source":"/var/log/syslog',
    'source":"/var/log/ceph/ceph-mon',
    'source":"/var/log/ceph/ceph.log',
    'source":"/var/log/ceph/ceph-osd',
    'source":"/var/log/ceph/ceph',          # prefix near-miss
    '"source":"10.220.64.10"',              # CIDR hit
    '"source":"10.220.72.10"',              # CIDR miss (out of /21)
    '"source":"10.220.65.255"',             # CIDR hit, boundary octet
    'SOURCE":"/VAR/LOG/SYSLOG',             # case near-miss (matching is case-sensitive)
    ".*[](){}^$\\",                         # regex metacharacters as payload
]

_message = st.lists(
    st.one_of(
        st.sampled_from(_FRAGMENTS),
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            max_size=12,
        ),
    ),
    min_size=0,
    max_size=6,
).map("".join)


def _py_route(value: str, spliter) -> str | None:
    """Independent reference implementation of first-match-wins."""
    for rs in spliter.resolved_splits():
        hit = (
            re.search(rs.pattern, value) is not None
            if rs.use_regex
            else rs.pattern in value
        )
        if hit:
            return rs.topic  # None when the split resolves to a drop
    return spliter.unmatched_topic


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture,
                           HealthCheck.too_slow],
)
@given(values=st.lists(_message, min_size=1, max_size=40))
def test_routing_matches_python_reference(spark, values):
    for spliter in (SPLITER_OPENSTACK, SPLITER_RSYSLOG):
        rows = [(str(i), v) for i, v in enumerate(values)]
        df = spark.createDataFrame(rows, "key string, value string")
        got = {
            r["key"]: r["topic"]
            for r in route(df, spliter).select("key", "topic").collect()
        }
        want = {k: _py_route(v, spliter) for k, v in rows}
        assert got == want
        # exactly-one-route: every input key appears exactly once
        assert len(got) == len(rows)


def test_cidr_pattern_is_re2_java_compatible():
    """The shipped CIDR pattern (reference topic.yaml:5) must behave
    identically under Python re (PCRE-ish) — a proxy for the RE2/Java
    dialect contract documented in SURVEY.md §7: no backrefs, no
    lookaround, alternation/classes only."""
    hits = ['"source":"10.220.64.0"', '"source":"10.220.71.255"',
            '"source":"10.220.69.42"']
    misses = ['"source":"10.220.72.0"', '"source":"10.220.63.255"',
              '"source":"10.221.64.1"', '"source":"10.220.64.256"']
    for h in hits:
        assert re.search(CIDR_PATTERN, h), h
    for m in misses:
        assert not re.search(CIDR_PATTERN, m), m

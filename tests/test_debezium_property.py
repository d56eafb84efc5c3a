"""Property-based wire-codec verification (hypothesis): for ARBITRARY
payload text — quotes, backslashes, newlines, control characters, CJK,
emoji, JSON-lookalike strings — ``from_debezium(to_debezium(ev)) == ev``
(modulo delete payload nulls, which the engine envelope never carries).
Generalizes the fixed-seed round-trip in test_debezium.py: JSON string
escaping is exactly the kind of surface a fuzzer breaks and examples
miss."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pasar_spark.cdc.debezium import from_debezium, to_debezium

BASE = dt.datetime(2025, 6, 1)

# Spark strings are UTF-8; hypothesis text() already excludes surrogates.
# Bias toward JSON-hostile characters.
hostile = st.text(
    alphabet=st.one_of(
        st.sampled_from(list('"\\\n\r\t\x00\x1f{}[]:,')),
        st.characters(codec="utf-8"),
    ),
    max_size=12,
)
payload = st.one_of(st.none(), hostile)
event = st.tuples(
    st.integers(0, 4),                     # conv key
    st.integers(0, 3),                     # turn
    st.sampled_from(["I", "U", "D"]),
    payload,                               # text
    payload,                               # tool
    payload,                               # extra
    st.integers(0, 10**7),                 # ts offset micros
)
logs = st.lists(event, min_size=1, max_size=15)

SCHEMA = (
    "lsn bigint, op string, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp, schema_ver int, extra string"
)


def _rows(data):
    return [
        (
            i,
            op,
            f"conv-{k}",
            t,
            "user" if i % 2 else None,
            txt,
            tool,
            BASE + dt.timedelta(microseconds=off),
            i % 3,
            extra,
        )
        for i, (k, t, op, txt, tool, extra, off) in enumerate(data)
    ]


def _expected(rows):
    # deletes lose payload columns; everything else is identity
    out = []
    for (lsn, op, cid, ti, role, txt, tool, ts, sv, ex) in rows:
        if op == "D":
            role = txt = tool = ex = None
        out.append((lsn, op, cid, ti, role, txt, tool, ts, sv, ex))
    return sorted(out)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(data=logs, wrapped=st.booleans())
def test_wire_roundtrip_identity(spark, data, wrapped):
    rows = _rows(data)
    ev = spark.createDataFrame(rows, SCHEMA)
    back = from_debezium(to_debezium(ev, wrapped=wrapped), "value")
    got = sorted(tuple(r) for r in back.collect())
    assert got == _expected(rows)

"""Percent-encoding normalization (functions/urls.py:
percent_normalize_expr): RFC 3986 §6.2.2 decode-unreserved /
uppercase-reserved rules, malformed passthrough, idempotence."""

import pyspark.sql.functions as F
from hypothesis import given, settings
from hypothesis import strategies as st

from cord19_crawler_spark.functions.urls import percent_normalize_expr


def _norm(spark, vals):
    df = spark.createDataFrame([(v,) for v in vals], "u string")
    rows = df.select("u", percent_normalize_expr(F.col("u")).alias("n")).collect()
    return {r["u"]: r["n"] for r in rows}


def test_rfc_rules(spark):
    cases = {
        # unreserved octets decode
        "https://h/%7euser": "https://h/~user",
        "https://h/%41%42c": "https://h/ABc",
        "https://h/%2D%2e%5F%7E": "https://h/-._~",
        # reserved/other octets stay encoded, hex uppercased
        "https://h/a%2fb": "https://h/a%2Fb",
        "https://h/a%3Fb%20c": "https://h/a%3Fb%20c",
        # mixed
        "https://h/%7e/%2f?x=%4a&y=%2b": "https://h/~/%2F?x=J&y=%2B",
        # malformed escapes untouched
        "https://h/a%g1b": "https://h/a%g1b",
        "https://h/end%": "https://h/end%",
        "https://h/%2": "https://h/%2",
        # no escapes: identity
        "https://h/plain?a=1": "https://h/plain?a=1",
        "": "",
    }
    got = _norm(spark, list(cases))
    assert got == cases


@settings(max_examples=30, deadline=None)
@given(
    st.text(
        alphabet="ab%124AFf~._-/?=& ",
        max_size=24,
    )
)
def test_idempotent(spark, s):
    df = spark.createDataFrame([(s,)], "u string")
    once, twice = df.select(
        percent_normalize_expr(F.col("u")).alias("n1")
    ).select(
        "n1", percent_normalize_expr(F.col("n1")).alias("n2")
    ).collect()[0]
    assert once == twice

"""robots.txt filtering (textops.robots_filter) — RFC 9309
longest-match precedence, allow-wins ties, no-rule default, the
unmatched-domain keep (the left-join+WHERE trap), and DuckDB twin
parity."""

import pytest

from openstreetmap_license_change_spark.operators import textops


@pytest.fixture(scope="module")
def spark():
    from openstreetmap_license_change_spark.session import get_spark

    yield get_spark("robots-tests", master="local[4]",
                    shuffle_partitions=8)


RULES = [
    ("site.a", "/", True),
    ("site.a", "/private", False),
    ("site.a", "/private/pub", True),
    ("site.b", "/x", False),
    ("site.c", "/same", False),
    ("site.c", "/same", True),     # exact-length tie: allow wins
]

URLS = [
    "doc://site.a/home",            # '/' allow
    "doc://site.a/private/secret",  # '/private' deny (longest)
    "doc://site.a/private/pub/ok",  # '/private/pub' allow (longer)
    "doc://site.b/y",               # domain has rules, NONE match → allow
    "doc://site.b/x/page",          # '/x' deny
    "doc://site.c/same/thing",      # tie → allow wins
    "doc://site.d/anything",        # no rules at all → allow
    "doc://site.a",                 # empty path → '/'
]


def _run(spark, urls=URLS, rules=RULES):
    pages = spark.createDataFrame([(u,) for u in urls], "url string")
    rdf = spark.createDataFrame(
        rules, "domain string, prefix string, allow boolean"
    )
    rows = textops.robots_filter(pages, rdf).collect()
    return {r["url"]: (r["allowed"], r["rule_prefix"], r["path"])
            for r in rows}


def test_rfc9309_semantics(spark):
    got = _run(spark)
    assert len(got) == len(URLS)
    assert got["doc://site.a/home"] == (True, "/", "/home")
    assert got["doc://site.a/private/secret"] == (
        False, "/private", "/private/secret")
    assert got["doc://site.a/private/pub/ok"] == (
        True, "/private/pub", "/private/pub/ok")
    assert got["doc://site.b/y"] == (True, None, "/y")
    assert got["doc://site.b/x/page"] == (False, "/x", "/x/page")
    assert got["doc://site.c/same/thing"] == (True, "/same", "/same/thing")
    assert got["doc://site.d/anything"] == (True, None, "/anything")
    assert got["doc://site.a"] == (True, "/", "/")


def test_duplicate_urls_collapse(spark):
    got = _run(spark, urls=["doc://site.a/home"] * 3)
    assert len(got) == 1


def test_duckdb_twin(spark):
    import duckdb

    want = _run(spark)
    con = duckdb.connect()
    con.execute("CREATE TABLE p (url VARCHAR)")
    con.executemany("INSERT INTO p VALUES (?)", [(u,) for u in URLS])
    vals = ", ".join(
        f"('{d}', '{pfx}', {str(a).upper()})" for d, pfx, a in RULES
    )
    rules_rel = (
        f"(SELECT * FROM (VALUES {vals}) t(domain, prefix, allow))"
    )
    rows = con.execute(
        textops.robots_filter_sql("p", rules_rel)
    ).fetchall()
    got = {r[0]: (r[3], r[4], r[2]) for r in rows}
    assert got == want

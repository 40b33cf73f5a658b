"""The graft input: a Common-Crawl-style ``pages`` table.

Per BASELINE.json ``input_hint`` the engine's facts are pages
(url, warc_ts, html, text, lang) instead of parsed OSM XML
(reference osm_parse.rb:20-59, S1).  The sandbox has no crawl data, so
``pages_from_documents`` derives a deterministic multi-version pages
table from the driver-provided ``documents`` parquet with *pure
arithmetic only* — every derived column is reproducible in ANSI SQL,
which lets the DuckDB oracle check byte-for-byte (see
``PAGES_SQL`` — the same derivation as a SQL CTE).

Mapping (SURVEY.md §1.4): url ↔ element identity, warc_ts rank ↔
version, hash-free modular arithmetic on doc_id ↔ changeset/uid and
agreement status, extracted ``text`` ↔ tag payload (byte-identical per
url — the per-row invariant), arithmetic geocode ↔ node position.

Scale note: the derivation is a narrow projection + ``explode(sequence)``
— no shuffle, fully pipelined into downstream scans; at 100 TB the real
table would be read directly from Iceberg with partition pruning on the
cell column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# arithmetic constants shared by the Spark and SQL derivations
EPOCH_2024 = 1704067200  # 2024-01-01T00:00:00Z

# Deterministic HTML envelope for the ``html:binary`` column mandated by
# the input contract (url, warc_ts, html, text, lang).  The body text is
# entity-escaped (&, <, > — '&' first, so escaping is invertible for
# ANY input text including text that already contains entities), wrapped
# in exactly one <p>, and surrounded by title/nav/footer boilerplate so
# extraction is a real selection problem (strip the chrome, keep the
# body) rather than a plain tag strip.  ``operators/textops.extract_text``
# is the Arrow-batched inverse; the per-row invariant is
# extract_text(html) == text, byte-identical per url/version.
HTML_PREFIX = (
    "<html><head><title>", "</title><meta charset=\"utf-8\"></head>"
    "<body><nav>home | about | contact</nav><p>",
)
HTML_SUFFIX = "</p><footer>&copy; crawl corpus</footer></body></html>"


def html_of(url: Column, text: Column) -> Column:
    """The ``html`` binary column: utf-8 bytes of the envelope around
    the entity-escaped text (title = url).  Pure native string ops —
    Catalyst prunes the whole expression away for queries that never
    select ``html``."""
    escaped = F.replace(
        F.replace(
            F.replace(text, F.lit("&"), F.lit("&amp;")),
            F.lit("<"), F.lit("&lt;"),
        ),
        F.lit(">"), F.lit("&gt;"),
    )
    return F.encode(
        F.concat(
            F.lit(HTML_PREFIX[0]), url, F.lit(HTML_PREFIX[1]),
            escaped, F.lit(HTML_SUFFIX),
        ),
        "UTF-8",
    )


def html_of_sql(url_expr: str, text_expr: str) -> str:
    """DuckDB twin of :func:`html_of` (encode → BLOB)."""
    escaped = (
        "replace(replace(replace("
        f"{text_expr}, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
    )
    return (
        "encode('" + HTML_PREFIX[0] + "' || " + url_expr
        + " || '" + HTML_PREFIX[1] + "' || "
        + escaped + " || '" + HTML_SUFFIX + "')"
    )


def documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def pages_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → multi-version pages (1-4 versions per url).

    Columns: url, doc_id, version, warc_epoch (bigint), warc_ts
    (timestamp), text, lang, changeset_id, uid, lon, lat, visible.
    ``text`` is copied from the document verbatim for every version —
    the byte-identical-per-url invariant asserted in tests.
    """
    doc = documents(spark, sf_dir)
    pages = (
        doc.select(
            F.concat(F.lit("doc://"), F.col("source"), F.lit("/"),
                     F.col("doc_id").cast("string")).alias("url"),
            "doc_id", "text", "lang",
            (F.lit(1) + F.col("doc_id") % 4).alias("n_versions"),
        )
        .select(
            "url", "doc_id", "text", "lang",
            F.explode(F.sequence(F.lit(1), F.col("n_versions"))).alias("version"),
        )
        .withColumn(
            "warc_epoch",
            (F.lit(EPOCH_2024) + F.col("doc_id") * 3600 + F.col("version") * 60)
            .cast("bigint"),
        )
        .withColumn("warc_ts", F.timestamp_seconds(F.col("warc_epoch")))
        .withColumn(
            "changeset_id",
            ((F.col("doc_id") * 31 + F.col("version") * 7) % 997).cast("bigint"),
        )
        .withColumn("uid", (F.col("changeset_id") % 211).cast("bigint"))
        .withColumn(
            "lon",
            ((F.col("doc_id") * 7919 + F.col("version") * 13) % 3600000)
            / F.lit(10000.0) - F.lit(180.0),
        )
        .withColumn(
            "lat",
            ((F.col("doc_id") * 104729 + F.col("version") * 17) % 1800000)
            / F.lit(10000.0) - F.lit(90.0),
        )
        .withColumn(
            "visible",
            ~((F.col("doc_id") % 17 == 0) & (F.col("version") == 2)),
        )
        .withColumn("html", html_of(F.col("url"), F.col("text")))
    )
    return pages


# The identical derivation as a DuckDB CTE (oracle side).  Kept textually
# adjacent to the Spark code so the two stay in lockstep.
_HTML_SQL = html_of_sql(
    "'doc://' || source || '/' || CAST(doc_id AS VARCHAR)", "text"
)
PAGES_SQL = f"""
vnums AS (
    SELECT UNNEST(range(1, 5)) AS version
),
pages AS (
    SELECT
        'doc://' || source || '/' || CAST(doc_id AS VARCHAR) AS url,
        doc_id,
        text,
        lang,
        v.version AS version,
        CAST({EPOCH_2024} + doc_id * 3600 + v.version * 60 AS BIGINT) AS warc_epoch,
        CAST((doc_id * 31 + v.version * 7) % 997 AS BIGINT) AS changeset_id,
        CAST(((doc_id * 31 + v.version * 7) % 997) % 211 AS BIGINT) AS uid,
        CAST((doc_id * 7919 + v.version * 13) % 3600000 AS DOUBLE) / 10000.0
            - 180.0 AS lon,
        CAST((doc_id * 104729 + v.version * 17) % 1800000 AS DOUBLE) / 10000.0
            - 90.0 AS lat,
        NOT (doc_id % 17 = 0 AND v.version = 2) AS visible,
        {_HTML_SQL} AS html
    FROM documents
    CROSS JOIN vnums v
    WHERE v.version <= 1 + doc_id % 4
)
"""


def users_dim(spark: SparkSession) -> DataFrame:
    """Synthetic users dimension: uid in [0, 211); a user accepted the
    terms iff uid % 3 != 0; every 11th user has an adopter (uid+1) whose
    agreement counts (user.rb:1-17, change_bot.rb:196)."""
    return (
        spark.range(0, 211)
        .select(
            F.col("id").alias("uid"),
            (F.col("id") % 3 != 0).alias("accepted_cts"),
            F.when(F.col("id") % 11 == 0, F.col("id") + 1).alias("adopter_uid"),
        )
    )


USERS_SQL = """
users AS (
    SELECT
        r.uid AS uid,
        (r.uid % 3) <> 0 AS accepted_cts,
        CASE WHEN r.uid % 11 = 0 THEN r.uid + 1 END AS adopter_uid
    FROM (SELECT UNNEST(range(0, 211)) AS uid) r
)
"""


def changesets_dim(spark: SparkSession) -> DataFrame:
    """Synthetic changesets dimension: changeset_id in [0, 997),
    uid = id % 211, every 31st changeset has override_accepted
    (changeset.rb:8-10)."""
    return (
        spark.range(0, 997)
        .select(
            F.col("id").alias("changeset_id"),
            (F.col("id") % 211).alias("uid"),
            (F.col("id") % 31 == 0).alias("override_accepted"),
        )
    )


CHANGESETS_SQL = """
changesets AS (
    SELECT
        r.changeset_id AS changeset_id,
        r.changeset_id % 211 AS uid,
        (r.changeset_id % 31) = 0 AS override_accepted
    FROM (SELECT UNNEST(range(0, 997)) AS changeset_id) r
)
"""

# changeset acceptance resolved through user + adopter + override
# (change_bot.rb:193-199): accepted(cs) = user.accepted || adopter.accepted
# || cs.override_accepted
CS_STATUS_SQL = """
cs_status AS (
    SELECT
        c.changeset_id,
        (u.accepted_cts
         OR COALESCE(a.accepted_cts, FALSE)
         OR c.override_accepted) AS accepted
    FROM changesets c
    JOIN users u ON c.uid = u.uid
    LEFT JOIN users a ON u.adopter_uid = a.uid
)
"""


def cs_status(spark: SparkSession) -> DataFrame:
    """J1/J2: changesets ⋈ users (+ adopter self-join) → accepted flag.

    Both dimensions are tiny → broadcast; at scale these stay broadcast
    dims exactly like the reference's agreed-users lists (S5)."""
    users = users_dim(spark)
    adopters = users.select(
        F.col("uid").alias("a_uid"), F.col("accepted_cts").alias("a_accepted")
    )
    return (
        changesets_dim(spark)
        .join(F.broadcast(users), "uid", "left")
        .join(F.broadcast(adopters), F.col("adopter_uid") == F.col("a_uid"), "left")
        .select(
            "changeset_id",
            (
                F.coalesce(F.col("accepted_cts"), F.lit(False))
                | F.coalesce(F.col("a_accepted"), F.lit(False))
                | F.col("override_accepted")
            ).alias("accepted"),
        )
    )


def oracle_prelude() -> str:
    """WITH-clause prelude shared by every DuckDB oracle query."""
    return (
        "WITH "
        + PAGES_SQL.strip().rstrip(",")
        + ", "
        + USERS_SQL.strip()
        + ", "
        + CHANGESETS_SQL.strip()
        + ", "
        + CS_STATUS_SQL.strip()
    )

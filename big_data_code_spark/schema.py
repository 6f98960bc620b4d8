"""Fact-based data model — Spark StructType restatement of the
reference's Thrift schema (`src/schema.thrift`).

Thrift unions become structs whose fields are all nullable with
exactly one set (sparse-union encoding — what parquet stores for a
union anyway), plus a discriminator column at the top level
(``unit``) so the master dataset can vertically partition by fact
type (`SplitDataPailStructure` semantics) and prune at the scan.

| Thrift                         | here                            |
| ------------------------------ | ------------------------------- |
| `PersonID union(cookie,user_id)` | struct(cookie, user_id)       |
| `PageID union(url)`            | struct(url)                     |
| `Pedigree{true_as_of_secs, source, system}` | struct, enums as strings |
| `DataUnit union(4 fact kinds)` | 4 nullable structs + `unit` tag |
| `Data{pedigree, dataunit}`     | one row of `DATA_SCHEMA`        |

Facts are immutable and append-only; every mutation of state is a
new fact with its own pedigree timestamp — the Lambda-architecture
contract the batch views rely on.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

PERSON_ID = StructType(
    [StructField("cookie", StringType()), StructField("user_id", LongType())]
)
PAGE_ID = StructType([StructField("url", StringType())])

PEDIGREE = StructType(
    [
        StructField("true_as_of_secs", IntegerType(), False),
        StructField("source", StringType(), False),   # Source enum name
        StructField("system", StringType(), False),   # OrigSystem tag
    ]
)

PERSON_PROPERTY = StructType(
    [
        StructField("id", PERSON_ID),
        StructField("property_name", StringType()),   # PersonPropertyValue tag
        StructField("property_value", StringType()),
    ]
)
PAGE_PROPERTY = StructType(
    [
        StructField("id", PAGE_ID),
        StructField("page_views", IntegerType()),
    ]
)
EQUIV_EDGE = StructType(
    [StructField("id1", PERSON_ID), StructField("id2", PERSON_ID)]
)
PAGE_VIEW_EDGE = StructType(
    [
        StructField("person", PERSON_ID),
        StructField("page", PAGE_ID),
        StructField("nonce", LongType()),
    ]
)

#: DataUnit union tags — the master dataset's vertical partitions
UNIT_PERSON_PROPERTY = "person_property"
UNIT_PAGE_PROPERTY = "page_property"
UNIT_EQUIV = "equiv"
UNIT_PAGE_VIEW = "page_view"

DATA_SCHEMA = StructType(
    [
        StructField("unit", StringType(), False),
        StructField("pedigree", PEDIGREE, False),
        StructField("person_property", PERSON_PROPERTY),
        StructField("page_property", PAGE_PROPERTY),
        StructField("equiv", EQUIV_EDGE),
        StructField("page_view", PAGE_VIEW_EDGE),
    ]
)


def pedigree(true_as_of_secs: Column, source: str = "SELF", system: str = "page_view") -> Column:
    return F.struct(
        true_as_of_secs.cast("int").alias("true_as_of_secs"),
        F.lit(source).alias("source"),
        F.lit(system).alias("system"),
    )


def person_id(user_id: Column | None = None, cookie: Column | None = None) -> Column:
    return F.struct(
        (cookie if cookie is not None else F.lit(None).cast("string")).alias("cookie"),
        (user_id if user_id is not None else F.lit(None).cast("long")).alias("user_id"),
    )


def _null(st: StructType, name: str) -> Column:
    return F.lit(None).cast(st).alias(name)


def pageview_facts(events: DataFrame) -> DataFrame:
    """events rows → `Data` pageview facts (PersonID=user_id,
    PageID=url≙event_type, nonce=event_id — the reference uses the
    nonce to make identical views distinct facts)."""
    return events.select(
        F.lit(UNIT_PAGE_VIEW).alias("unit"),
        pedigree(F.unix_timestamp("ts")).alias("pedigree"),
        _null(PERSON_PROPERTY, "person_property"),
        _null(PAGE_PROPERTY, "page_property"),
        _null(EQUIV_EDGE, "equiv"),
        F.struct(
            person_id(user_id=F.col("user_id")).alias("person"),
            F.struct(F.col("event_type").alias("url")).alias("page"),
            F.col("event_id").alias("nonce"),
        ).alias("page_view"),
    )


def equiv_facts(pairs: DataFrame, id1: str, id2: str, as_of: Column) -> DataFrame:
    """(id1, id2) rows → `Data` equiv-edge facts."""
    return pairs.select(
        F.lit(UNIT_EQUIV).alias("unit"),
        pedigree(as_of, system="external_data").alias("pedigree"),
        _null(PERSON_PROPERTY, "person_property"),
        _null(PAGE_PROPERTY, "page_property"),
        F.struct(
            person_id(user_id=F.col(id1)).alias("id1"),
            person_id(user_id=F.col(id2)).alias("id2"),
        ).alias("equiv"),
        _null(PAGE_VIEW_EDGE, "page_view"),
    )


def person_property_facts(
    props: DataFrame, user_col: str, name_col: str, value_col: str, as_of_col: str
) -> DataFrame:
    """(user, property_name, value, as_of) rows → `Data`
    person-property facts (ref `schema.thrift` PersonProperty /
    PersonPropertyValue; the book's age/gender/location examples)."""
    return props.select(
        F.lit(UNIT_PERSON_PROPERTY).alias("unit"),
        pedigree(F.col(as_of_col), system="external_data").alias("pedigree"),
        F.struct(
            person_id(user_id=F.col(user_col)).alias("id"),
            F.col(name_col).alias("property_name"),
            F.col(value_col).cast("string").alias("property_value"),
        ).alias("person_property"),
        _null(PAGE_PROPERTY, "page_property"),
        _null(EQUIV_EDGE, "equiv"),
        _null(PAGE_VIEW_EDGE, "page_view"),
    )


def current_person_properties(facts: DataFrame) -> DataFrame:
    """The fact-based model's read side: each person's CURRENT value
    per property = the fact with the greatest true-as-of timestamp
    (ties broken on value for determinism). Immutable facts are
    never updated in place — 'current' is always derived, which is
    what makes the master dataset human-fault-tolerant ("Big Data"
    ch. 2: the age-update example).

    One shuffle on (person, property), row_number window — same
    plan shape as log compaction.
    """
    from pyspark.sql.window import Window

    props = facts.where(F.col("unit") == UNIT_PERSON_PROPERTY).select(
        F.col("person_property.id.user_id").alias("user_id"),
        F.col("person_property.property_name").alias("property_name"),
        F.col("person_property.property_value").alias("property_value"),
        F.col("pedigree.true_as_of_secs").alias("as_of_secs"),
    )
    w = Window.partitionBy("user_id", "property_name").orderBy(
        F.col("as_of_secs").desc(), F.col("property_value").desc()
    )
    return (
        props.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("user_id", "property_name", "property_value", "as_of_secs")
    )


def page_property_facts(
    pages: DataFrame, url_col: str, views_col: str, as_of_col: str
) -> DataFrame:
    """(url, page_views, as_of) rows → `Data` page-property facts
    (ref `schema.thrift` PageProperty / PagePropertyValue)."""
    return pages.select(
        F.lit(UNIT_PAGE_PROPERTY).alias("unit"),
        pedigree(F.col(as_of_col), system="page_view").alias("pedigree"),
        _null(PERSON_PROPERTY, "person_property"),
        F.struct(
            F.struct(F.col(url_col).alias("url")).alias("id"),
            F.col(views_col).cast("int").alias("page_views"),
        ).alias("page_property"),
        _null(EQUIV_EDGE, "equiv"),
        _null(PAGE_VIEW_EDGE, "page_view"),
    )


def tagged_person_node(pid: Column) -> Column:
    """Encode a PersonID union value as ONE orderable string node
    for graph ops: ``"0u:<user_id>"`` / ``"1c:<cookie>"``. The tag
    prefix makes lexicographic MIN prefer user-ids over cookies —
    the reference's rule that a normalized identity collapses to
    its user-id when one exists (`normalizeUserIds`,
    `BatchWorkflow.java:561-687`)."""
    return F.when(
        pid.getField("user_id").isNotNull(),
        F.concat(F.lit("0u:"), pid.getField("user_id").cast("string")),
    ).otherwise(F.concat(F.lit("1c:"), pid.getField("cookie")))

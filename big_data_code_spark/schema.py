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

#: Location struct — ref `schema.thrift:13-17` (all fields optional)
LOCATION = StructType(
    [
        StructField("city", StringType()),
        StructField("state", StringType()),
        StructField("country", StringType()),
    ]
)

#: PersonPropertyValue union — ref `schema.thrift:24-28`: sparse-
#: union struct (exactly one branch set, selected by the
#: ``property_name`` tag). GenderType enum values are stored as
#: their names ("MALE"/"FEMALE"), like the other enums here.
PERSON_PROPERTY_VALUE = StructType(
    [
        StructField("full_name", StringType()),
        StructField("gender", StringType()),
        StructField("location", LOCATION),
    ]
)

PERSON_PROPERTY = StructType(
    [
        StructField("id", PERSON_ID),
        StructField("property_name", StringType()),   # PersonPropertyValue tag
        # flattened canonical string (the read path most batch views
        # use: age/gender examples) + the TYPED union payload, so the
        # Location struct keeps its city/state/country fields
        StructField("property_value", StringType()),
        StructField("property", PERSON_PROPERTY_VALUE),
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
    typed = F.struct(
        F.when(F.col(name_col) == "full_name", F.col(value_col).cast("string"))
        .alias("full_name"),
        F.when(F.col(name_col) == "gender", F.col(value_col).cast("string"))
        .alias("gender"),
        F.lit(None).cast(LOCATION).alias("location"),
    )
    return props.select(
        F.lit(UNIT_PERSON_PROPERTY).alias("unit"),
        pedigree(F.col(as_of_col), system="external_data").alias("pedigree"),
        F.struct(
            person_id(user_id=F.col(user_col)).alias("id"),
            F.col(name_col).alias("property_name"),
            F.col(value_col).cast("string").alias("property_value"),
            typed.alias("property"),
        ).alias("person_property"),
        _null(PAGE_PROPERTY, "page_property"),
        _null(EQUIV_EDGE, "equiv"),
        _null(PAGE_VIEW_EDGE, "page_view"),
    )


def location_person_property_facts(
    props: DataFrame,
    user_col: str,
    city_col: str,
    state_col: str,
    country_col: str,
    as_of_col: str,
) -> DataFrame:
    """(user, city, state, country, as_of) rows → `Data`
    person-property facts carrying the TYPED Location union branch
    (ref `schema.thrift:13-17,24-28` — the book's location example).
    The flattened ``property_value`` holds the canonical
    ``city|state|country`` string so tag-agnostic views (compaction,
    purge) keep working; typed readers use
    `current_person_locations`."""
    return props.select(
        F.lit(UNIT_PERSON_PROPERTY).alias("unit"),
        pedigree(F.col(as_of_col), system="external_data").alias("pedigree"),
        F.struct(
            person_id(user_id=F.col(user_col)).alias("id"),
            F.lit("location").alias("property_name"),
            F.concat_ws(
                "|", F.col(city_col), F.col(state_col), F.col(country_col)
            ).alias("property_value"),
            F.struct(
                F.lit(None).cast("string").alias("full_name"),
                F.lit(None).cast("string").alias("gender"),
                F.struct(
                    F.col(city_col).cast("string").alias("city"),
                    F.col(state_col).cast("string").alias("state"),
                    F.col(country_col).cast("string").alias("country"),
                ).alias("location"),
            ).alias("property"),
        ).alias("person_property"),
        _null(PAGE_PROPERTY, "page_property"),
        _null(EQUIV_EDGE, "equiv"),
        _null(PAGE_VIEW_EDGE, "page_view"),
    )


def current_person_locations(facts: DataFrame) -> DataFrame:
    """Typed read side of the Location branch: each person's CURRENT
    location (max true-as-of fact), with city/state/country kept as
    struct fields — no stringly-typed loss. Same one-shuffle
    row_number plan as `current_person_properties`."""
    from pyspark.sql.window import Window

    locs = facts.where(
        (F.col("unit") == UNIT_PERSON_PROPERTY)
        & (F.col("person_property.property_name") == "location")
    ).select(
        F.col("person_property.id.user_id").alias("user_id"),
        F.col("person_property.property.location.city").alias("city"),
        F.col("person_property.property.location.state").alias("state"),
        F.col("person_property.property.location.country").alias("country"),
        F.col("pedigree.true_as_of_secs").alias("as_of_secs"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("as_of_secs").desc(), F.col("city").desc_nulls_last()
    )
    return (
        locs.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("user_id", "city", "state", "country", "as_of_secs")
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

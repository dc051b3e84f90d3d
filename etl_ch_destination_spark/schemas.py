"""Explicit fixture schemas (FIXTURES.md, measured from parquet).

ClickHouse destinations have rigid declared schemas; this engine
mirrors that by never relying on schema inference in production paths
(SURVEY.md §1.1). DDL strings usable with ``spark.read.schema(...)``
and ``F.from_json``.
"""

LINEITEM = (
    "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
    "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
    "l_returnflag string, l_linestatus string, l_shipdate timestamp"
)
ORDERS = (
    "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, "
    "o_orderdate timestamp, o_orderpriority string"
)
CUSTOMER = "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string"
SUPPLIER = "s_suppkey long, s_name string, s_nationkey int, s_acctbal double"
PART = "p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double"
NATION = "n_nationkey int, n_name string, n_regionkey int"
REGION = "r_regionkey int, r_name string"
EVENTS = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
# Physical read schema for NANOS-generation events.parquet (rounds 1-2
# fixture data): ts read as int64 nanos under
# spark.sql.legacy.parquet.nanosAsLong. The round-3 regen stores µs and
# reads through EVENTS directly; catalog.load_table sniffs the footer
# and picks the matching path.
EVENTS_RAW = "event_id long, ts long, user_id long, event_type string, value double, props string"
DOCUMENTS = "doc_id long, text string, lang string, source string, n_chars long"
EMBEDDINGS = "vec_id long, embedding array<float>, label int"
PROPS_JSON = "k int"  # schema of events.props for from_json

TABLE_SCHEMAS = {
    "lineitem": LINEITEM,
    "orders": ORDERS,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "nation": NATION,
    "region": REGION,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

TABLES = list(TABLE_SCHEMAS)

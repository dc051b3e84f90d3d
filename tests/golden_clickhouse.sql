-- GOLDEN: generated ClickHouse SQL surface (DDL + insert statements).
-- Pinned by tests/test_sinks.py::test_clickhouse_sql_surface_golden_file;
-- regenerate with: python tools/gen_clickhouse_golden.py

-- ==== lineitem ====
CREATE TABLE IF NOT EXISTS lineitem (
  `l_orderkey` Int64,
  `l_partkey` Nullable(Int64),
  `l_suppkey` Nullable(Int64),
  `l_linenumber` Int32,
  `l_quantity` Nullable(Float64),
  `l_extendedprice` Nullable(Float64),
  `l_discount` Nullable(Float64),
  `l_tax` Nullable(Float64),
  `l_returnflag` Nullable(String),
  `l_linestatus` Nullable(String),
  `l_shipdate` Nullable(DateTime64(6))
) ENGINE = MergeTree()
PARTITION BY toYYYYMM(`l_shipdate`)
ORDER BY (`l_orderkey`, `l_linenumber`);

-- JDBC batched insert (Spark JdbcUtils, default dialect):
INSERT INTO lineitem ("l_orderkey","l_partkey","l_suppkey","l_linenumber","l_quantity","l_extendedprice","l_discount","l_tax","l_returnflag","l_linestatus","l_shipdate") VALUES (?,?,?,?,?,?,?,?,?,?,?);

-- HTTP/raw-statement tokenized insert head (block 0 of batch-0001):
INSERT INTO lineitem (`l_orderkey`, `l_partkey`, `l_suppkey`, `l_linenumber`, `l_quantity`, `l_extendedprice`, `l_discount`, `l_tax`, `l_returnflag`, `l_linestatus`, `l_shipdate`)
SETTINGS insert_deduplication_token = 'c34b1201436e435b2ae99fd84f400828'
FORMAT RowBinary;

-- ==== orders ====
CREATE TABLE IF NOT EXISTS orders (
  `o_orderkey` Int64,
  `o_custkey` Int64,
  `o_orderstatus` Nullable(String),
  `o_totalprice` Nullable(Float64),
  `o_orderdate` Nullable(DateTime64(6)),
  `o_orderpriority` Nullable(String)
) ENGINE = MergeTree()
PARTITION BY toYYYYMM(`o_orderdate`)
ORDER BY (`o_custkey`, `o_orderkey`);

-- JDBC batched insert (Spark JdbcUtils, default dialect):
INSERT INTO orders ("o_orderkey","o_custkey","o_orderstatus","o_totalprice","o_orderdate","o_orderpriority") VALUES (?,?,?,?,?,?);

-- HTTP/raw-statement tokenized insert head (block 0 of batch-0001):
INSERT INTO orders (`o_orderkey`, `o_custkey`, `o_orderstatus`, `o_totalprice`, `o_orderdate`, `o_orderpriority`)
SETTINGS insert_deduplication_token = 'aa9d342dac0ca9a9f719881cc6cd4ab5'
FORMAT RowBinary;

-- ==== customer ====
CREATE TABLE IF NOT EXISTS customer (
  `c_custkey` Int64,
  `c_name` Nullable(String),
  `c_nationkey` Nullable(Int32),
  `c_acctbal` Nullable(Float64),
  `c_mktsegment` Nullable(String)
) ENGINE = MergeTree()
ORDER BY (`c_custkey`);

-- JDBC batched insert (Spark JdbcUtils, default dialect):
INSERT INTO customer ("c_custkey","c_name","c_nationkey","c_acctbal","c_mktsegment") VALUES (?,?,?,?,?);

-- HTTP/raw-statement tokenized insert head (block 0 of batch-0001):
INSERT INTO customer (`c_custkey`, `c_name`, `c_nationkey`, `c_acctbal`, `c_mktsegment`)
SETTINGS insert_deduplication_token = '3790835d17f3970a524fcf09a4688260'
FORMAT RowBinary;

-- ==== supplier ====
CREATE TABLE IF NOT EXISTS supplier (
  `s_suppkey` Int64,
  `s_name` Nullable(String),
  `s_nationkey` Nullable(Int32),
  `s_acctbal` Nullable(Float64)
) ENGINE = MergeTree()
ORDER BY (`s_suppkey`);

-- JDBC batched insert (Spark JdbcUtils, default dialect):
INSERT INTO supplier ("s_suppkey","s_name","s_nationkey","s_acctbal") VALUES (?,?,?,?);

-- HTTP/raw-statement tokenized insert head (block 0 of batch-0001):
INSERT INTO supplier (`s_suppkey`, `s_name`, `s_nationkey`, `s_acctbal`)
SETTINGS insert_deduplication_token = '19edb7f2852559a9ac9cbe54fb3000df'
FORMAT RowBinary;

-- ==== part ====
CREATE TABLE IF NOT EXISTS part (
  `p_partkey` Int64,
  `p_name` Nullable(String),
  `p_brand` Nullable(String),
  `p_type` Nullable(String),
  `p_size` Nullable(Int32),
  `p_retailprice` Nullable(Float64)
) ENGINE = MergeTree()
ORDER BY (`p_partkey`);

-- JDBC batched insert (Spark JdbcUtils, default dialect):
INSERT INTO part ("p_partkey","p_name","p_brand","p_type","p_size","p_retailprice") VALUES (?,?,?,?,?,?);

-- HTTP/raw-statement tokenized insert head (block 0 of batch-0001):
INSERT INTO part (`p_partkey`, `p_name`, `p_brand`, `p_type`, `p_size`, `p_retailprice`)
SETTINGS insert_deduplication_token = '99a2c92ac1100a2822749f99ca8d58a8'
FORMAT RowBinary;

-- ==== nation ====
CREATE TABLE IF NOT EXISTS nation (
  `n_nationkey` Int32,
  `n_name` Nullable(String),
  `n_regionkey` Nullable(Int32)
) ENGINE = MergeTree()
ORDER BY (`n_nationkey`);

-- JDBC batched insert (Spark JdbcUtils, default dialect):
INSERT INTO nation ("n_nationkey","n_name","n_regionkey") VALUES (?,?,?);

-- HTTP/raw-statement tokenized insert head (block 0 of batch-0001):
INSERT INTO nation (`n_nationkey`, `n_name`, `n_regionkey`)
SETTINGS insert_deduplication_token = '699944e52197cdb62bbe1c73f9293462'
FORMAT RowBinary;

-- ==== region ====
CREATE TABLE IF NOT EXISTS region (
  `r_regionkey` Int32,
  `r_name` Nullable(String)
) ENGINE = MergeTree()
ORDER BY (`r_regionkey`);

-- JDBC batched insert (Spark JdbcUtils, default dialect):
INSERT INTO region ("r_regionkey","r_name") VALUES (?,?);

-- HTTP/raw-statement tokenized insert head (block 0 of batch-0001):
INSERT INTO region (`r_regionkey`, `r_name`)
SETTINGS insert_deduplication_token = '9e5ce418e75462b712b608827310c3ac'
FORMAT RowBinary;

-- ==== events ====
CREATE TABLE IF NOT EXISTS events (
  `event_id` Nullable(Int64),
  `ts` DateTime64(6),
  `user_id` Int64,
  `event_type` Nullable(String),
  `value` Nullable(Float64),
  `props` Nullable(String)
) ENGINE = MergeTree()
PARTITION BY toYYYYMM(`ts`)
ORDER BY (`user_id`, `ts`)
TTL `ts` + INTERVAL 180 DAY;

-- JDBC batched insert (Spark JdbcUtils, default dialect):
INSERT INTO events ("event_id","ts","user_id","event_type","value","props") VALUES (?,?,?,?,?,?);

-- HTTP/raw-statement tokenized insert head (block 0 of batch-0001):
INSERT INTO events (`event_id`, `ts`, `user_id`, `event_type`, `value`, `props`)
SETTINGS insert_deduplication_token = '471143e90e052422dfa2bac44c5e83a5'
FORMAT RowBinary;

-- ==== documents ====
CREATE TABLE IF NOT EXISTS documents (
  `doc_id` Int64,
  `text` Nullable(String),
  `lang` Nullable(String),
  `source` Nullable(String),
  `n_chars` Nullable(Int64)
) ENGINE = MergeTree()
ORDER BY (`doc_id`);

-- JDBC batched insert (Spark JdbcUtils, default dialect):
INSERT INTO documents ("doc_id","text","lang","source","n_chars") VALUES (?,?,?,?,?);

-- HTTP/raw-statement tokenized insert head (block 0 of batch-0001):
INSERT INTO documents (`doc_id`, `text`, `lang`, `source`, `n_chars`)
SETTINGS insert_deduplication_token = '6b88a7fb69786773fc5e79696aad7e6d'
FORMAT RowBinary;

-- ==== embeddings ====
CREATE TABLE IF NOT EXISTS embeddings (
  `vec_id` Int64,
  `embedding` Array(Nullable(Float32)),
  `label` Nullable(Int32)
) ENGINE = MergeTree()
ORDER BY (`vec_id`);

-- JDBC batched insert (Spark JdbcUtils, default dialect):
INSERT INTO embeddings ("vec_id","embedding","label") VALUES (?,?,?);

-- HTTP/raw-statement tokenized insert head (block 0 of batch-0001):
INSERT INTO embeddings (`vec_id`, `embedding`, `label`)
SETTINGS insert_deduplication_token = '9ffcf20cb721a6e35ee84cb841242e7a'
FORMAT RowBinary;

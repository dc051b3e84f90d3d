"""Custom library operators — things Spark lacks a native primitive for
(SURVEY §4.2): ReplacingMergeTree-style dedup, ASOF join, skew salting,
vector similarity, MinHash near-dedup, text analysis, and the
ClickHouse behavioral aggregates (windowFunnel/retention/sequenceMatch)."""

"""End-to-end job compositions — the product shape of the reference
(an ETL pipeline into a ClickHouse-style destination), assembled from
the engine's operators."""

"""Destination sinks: ClickHouse JDBC (the reference's defining sink)
and the parquet stand-ins used where no ClickHouse server exists."""

"""etl_ch_destination_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
``bngreen/etl-ch-destination`` (an ETL pipeline with a ClickHouse
destination; reference snapshot at /root/reference contains only its
Apache-2.0 LICENSE — see SURVEY.md §0 for evidence policy).

Architecture: declarative DataFrame/SQL plans executed by Catalyst +
Tungsten; custom library operators only where Spark lacks a primitive
(ASOF join, ReplacingMergeTree-style dedup, MinHash near-dedup, vector
similarity). Designed for 100 TB scale: broadcast dims, partial aggs,
AQE, salting helpers, partitioned columnar sinks.
"""

from etl_ch_destination_spark.session import get_spark
from etl_ch_destination_spark.catalog import load_table, load_all, register_views

__all__ = ["get_spark", "load_table", "load_all", "register_views"]
__version__ = "0.1.0"

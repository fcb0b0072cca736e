"""sparkdb — a PySpark-native analytics engine.

A from-scratch rebuild of the capabilities of the reference Go row-based DB
(`noelpaulrinso/Custom-Row-Based-Database-for-Direct-Parquet-File-Ingestion-using-Golang`,
read-only at /root/reference): direct Parquet/CSV ingestion, a typed catalog,
SELECT with WHERE expressions / GROUP BY / HAVING / ORDER BY / LIMIT /
DISTINCT, CRUD DML, an IMAGE path column type — re-expressed as idiomatic
Spark (DataFrame/SQL + Catalyst, Parquet-backed copy-on-write tables), plus a
beyond-reference tier (joins, windows, set ops, dedup, similarity search,
text analysis, multimodal columns, Structured Streaming) designed for
cluster scale.

The package name mirrors the reference repo name per the build contract; the
ergonomic alias is ``import custom_row_based_database_for_direct_parquet_file_ingestion_using_golang_spark as sparkdb``.
"""

from .session import get_spark
from .catalog import Catalog, ColumnDef, RefType
from .engine import Engine

__all__ = ["get_spark", "Catalog", "ColumnDef", "RefType", "Engine"]
__version__ = "0.1.0"

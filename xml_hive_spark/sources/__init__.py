"""Data sources: the custom XML DataSource (Python DataSource API) plus
helpers for the standard formats Spark ships (parquet/avro/json/csv),
which the reference delivered via Hive storage handlers."""

"""Schema-history (DDL log) source — S5 parity.

The reference snapshots INFORMATION_SCHEMA at a bounded-staleness read
timestamp and re-reads it on event/schema mismatch
(/root/reference db/dao/SchemaDao.java:33-100,
db/metadata/SchemaRegistry.java:54-179). Our engine's primary schema
source is the per-event column_types payload (as the reference validates
per event); this module additionally reads a `schema_log` table (DDL
history, FIXTURES.md F3) so a deployment can bootstrap the sink schema
as-of a timestamp without scanning events.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from debezium_connector_spanner_spark.sources.event_schema import TableSchema


def read_schema_log(spark: SparkSession, path: str) -> list[tuple[int, TableSchema]]:
    """-> [(effective_ts_us, TableSchema)] ascending by effective ts."""
    rows = (
        spark.read.parquet(path)
        .selectExpr("unix_micros(effective_ts) AS ts_us", "table_name", "columns")
        .collect()
    )
    out = [
        (r["ts_us"], TableSchema.from_column_types_json(r["table_name"], r["columns"]))
        for r in rows
    ]
    out.sort(key=lambda t: t[0])
    return out


def schema_as_of(log: list[tuple[int, TableSchema]], ts_us: int) -> TableSchema:
    """Latest schema whose effective ts <= ts_us (bounded-staleness read)."""
    best = None
    for eff, schema in log:
        if eff <= ts_us:
            best = schema
    if best is None:
        raise ValueError(f"no schema effective at {ts_us}")
    return best

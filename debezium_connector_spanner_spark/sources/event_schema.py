"""Change-event log schema + Spanner->Spark type system.

Mirrors the reference data model (all citations into /root/reference):
- DataChangeEvent fields: db/model/event/DataChangeEvent.java:70-142
- Mod {keys, old_values, new_values} JSON images: db/model/Mod.java:18-96
- record kinds (data_change / heartbeat / child_partitions / partition_end):
  db/mapper/ChangeStreamRecordMapper.java:104-198,
  db/stream/SpannerChangeStreamService.java:97
- type codes: db/model/schema/DataType.java:11-26
- Connect schema mapping semantics (timestamps/dates/numerics kept as
  STRINGS, bytes base64, float32 down-cast):
  schema/mapper/ColumnTypeSchemaMapper.java:22-55,
  schema/mapper/JsonNodeStructValueConvertor.java:27-103
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import types as T

# ---------------------------------------------------------------- records
DATA_CHANGE = "data_change"
HEARTBEAT = "heartbeat"
CHILD_PARTITIONS = "child_partitions"
PARTITION_END = "partition_end"
# proto-dialect-only partition lifecycle records (mutable-key-range mode;
# db/model/event/PartitionStartEvent.java / PartitionEventEvent.java).
# Mapped but consumed by nothing downstream in the reference either —
# surfaced as control rows for lineage, ignored by the DAG gate.
PARTITION_START = "partition_start"
PARTITION_EVENT = "partition_event"

INITIAL_PARTITION_TOKEN = "Parent0"  # db/model/InitialPartition.java:25

MOD_TYPE_TO_OP = {"INSERT": "c", "UPDATE": "u", "DELETE": "d"}
# op letters per processor/SpannerChangeRecordEmitter.java:42-52

MODS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("keys", T.StringType()),
            T.StructField("new_values", T.StringType()),
            T.StructField("old_values", T.StringType()),
        ]
    )
)

CHILD_PARTITIONS_TYPE = T.ArrayType(
    T.StructType(
        [
            T.StructField("token", T.StringType()),
            T.StructField("parent_partition_tokens", T.ArrayType(T.StringType())),
        ]
    )
)

# The on-disk change-event log schema (FIXTURES.md F2).
EVENT_LOG_SCHEMA = T.StructType(
    [
        T.StructField("record_type", T.StringType()),
        T.StructField("partition_token", T.StringType()),
        T.StructField("commit_ts", T.TimestampType()),
        T.StructField("record_sequence", T.StringType()),
        T.StructField("server_txn_id", T.StringType()),
        T.StructField("is_last_in_txn_in_partition", T.BooleanType()),
        T.StructField("table_name", T.StringType()),
        T.StructField("column_types", T.StringType()),
        T.StructField("mods", MODS_TYPE),
        T.StructField("mod_type", T.StringType()),
        T.StructField("value_capture_type", T.StringType()),
        T.StructField("number_of_records_in_transaction", T.LongType()),
        T.StructField("number_of_partitions_in_transaction", T.LongType()),
        T.StructField("transaction_tag", T.StringType()),
        T.StructField("is_system_transaction", T.BooleanType()),
        T.StructField("child_partitions", CHILD_PARTITIONS_TYPE),
    ]
)


# ---------------------------------------------------------------- types
@dataclass(frozen=True)
class ColumnSpec:
    """One column of a (versioned) table schema.

    Mirrors db/model/schema/Column.java:14-28 {name, type, primaryKey,
    ordinalPosition, nullable}.
    """

    name: str
    type_code: str  # Spanner DataType code, e.g. INT64 / STRING / FLOAT64
    is_primary_key: bool = False
    ordinal_position: int = 0
    nullable: bool = True
    array_element_type: str | None = None

    def to_json_obj(self) -> dict:
        o = {
            "name": self.name,
            "type": {"code": self.type_code},
            "is_primary_key": self.is_primary_key,
            "ordinal_position": self.ordinal_position,
        }
        if self.array_element_type:
            o["type"]["array_element_type"] = {"code": self.array_element_type}
        return o


# ColumnTypeSchemaMapper.java:22-55 — timestamps/dates/numerics/json stay
# strings; that mapping is the semantic we reproduce for final-state equality.
# BYTES is BINARY in the sink (JsonNodeStructValueConvertor.java:27-33
# base64-decodes the JSON string); the JSON decode shape keeps it STRING
# (the row image carries base64 text) and apply_spanner_casts converts.
_SCALAR = {
    "STRING": T.StringType(),
    "NUMERIC": T.StringType(),
    "DATE": T.StringType(),
    "JSON": T.StringType(),
    "TIMESTAMP": T.StringType(),
    "TOKENLIST": T.StringType(),
    "UUID": T.StringType(),
    "INT64": T.LongType(),
    "BOOL": T.BooleanType(),
    "FLOAT32": T.FloatType(),
    "FLOAT64": T.DoubleType(),
    "BYTES": T.BinaryType(),
}


def spark_type_for(
    code: str, array_element_type: str | None = None, json_shape: bool = False
) -> T.DataType:
    code = code.upper()
    if code == "ARRAY":
        elem = spark_type_for(array_element_type or "STRING", json_shape=json_shape)
        return T.ArrayType(elem, containsNull=True)  # ColumnTypeSchemaMapper.java:51-55
    if code not in _SCALAR:
        raise ValueError(f"unsupported Spanner type code: {code}")
    if json_shape and code == "BYTES":
        return T.StringType()  # base64 text in the JSON row image
    return _SCALAR[code]


@dataclass(frozen=True)
class TableSchema:
    """Versioned table schema (db/model/schema/TableSchema.java:45)."""

    table: str
    columns: tuple[ColumnSpec, ...]

    @property
    def key_columns(self) -> list[str]:
        return [c.name for c in self.columns if c.is_primary_key]

    @property
    def value_columns(self) -> list[str]:
        return [c.name for c in self.columns if not c.is_primary_key]

    def column(self, name: str) -> ColumnSpec:
        for c in self.columns:
            if c.name == name:
                return c
        raise KeyError(name)

    def spark_struct(
        self, names: list[str] | None = None, json_shape: bool = False
    ) -> T.StructType:
        """Physical sink shape by default; ``json_shape=True`` gives the
        from_json decode shape (BYTES as base64 STRING)."""
        cols = self.columns if names is None else [self.column(n) for n in names]
        return T.StructType(
            [
                T.StructField(
                    c.name,
                    spark_type_for(c.type_code, c.array_element_type, json_shape),
                    True,
                )
                for c in cols
            ]
        )

    def needs_cast(self) -> bool:
        """True when the JSON decode shape differs from the sink shape."""
        return any(
            c.type_code == "BYTES" or c.array_element_type == "BYTES"
            for c in self.columns
        )

    def column_types_json(self) -> str:
        return json.dumps([c.to_json_obj() for c in self.columns], sort_keys=True)

    @staticmethod
    def from_column_types_json(table: str, payload: str) -> "TableSchema":
        cols = []
        for o in json.loads(payload):
            t = o["type"]
            cols.append(
                ColumnSpec(
                    name=o["name"],
                    type_code=t["code"],
                    is_primary_key=bool(o.get("is_primary_key")),
                    ordinal_position=int(o.get("ordinal_position", 0)),
                    array_element_type=(t.get("array_element_type") or {}).get("code"),
                )
            )
        cols.sort(key=lambda c: c.ordinal_position)
        return TableSchema(table=table, columns=tuple(cols))


# The north-rule base table (BASELINE.json input_hint / FIXTURES.md F1).
REPOS_SCHEMA_V1 = TableSchema(
    table="repos",
    columns=(
        ColumnSpec("repo", "STRING", is_primary_key=True, ordinal_position=1, nullable=False),
        ColumnSpec("path", "STRING", is_primary_key=True, ordinal_position=2, nullable=False),
        ColumnSpec("commit", "STRING", ordinal_position=3),
        ColumnSpec("lang", "STRING", ordinal_position=4),
        ColumnSpec("content", "STRING", ordinal_position=5),
    ),
)

# Schema evolution steps (FIXTURES.md F3): add stars INT64, then widen to FLOAT64.
REPOS_SCHEMA_V2 = TableSchema(
    table="repos",
    columns=REPOS_SCHEMA_V1.columns
    + (ColumnSpec("stars", "INT64", ordinal_position=6),),
)
REPOS_SCHEMA_V3 = TableSchema(
    table="repos",
    columns=REPOS_SCHEMA_V1.columns
    + (ColumnSpec("stars", "FLOAT64", ordinal_position=6),),
)

# Second change-stream table exercising every supported Spanner type code
# end-to-end (mirrors src/test/java/.../DataTypesIT.java:33-125): BYTES
# lands BINARY in the sink, FLOAT32 down-cast, arrays typed, temporal /
# numeric codes carried as Connect-mapped strings.
TYPES_PROBE_SCHEMA = TableSchema(
    table="types_probe",
    columns=(
        ColumnSpec("id", "INT64", is_primary_key=True, ordinal_position=1, nullable=False),
        ColumnSpec("c_string", "STRING", ordinal_position=2),
        ColumnSpec("c_int64", "INT64", ordinal_position=3),
        ColumnSpec("c_float64", "FLOAT64", ordinal_position=4),
        ColumnSpec("c_float32", "FLOAT32", ordinal_position=5),
        ColumnSpec("c_bool", "BOOL", ordinal_position=6),
        ColumnSpec("c_bytes", "BYTES", ordinal_position=7),
        ColumnSpec("c_numeric", "NUMERIC", ordinal_position=8),
        ColumnSpec("c_date", "DATE", ordinal_position=9),
        ColumnSpec("c_timestamp", "TIMESTAMP", ordinal_position=10),
        ColumnSpec("c_json", "JSON", ordinal_position=11),
        ColumnSpec("c_arr_str", "ARRAY", ordinal_position=12, array_element_type="STRING"),
        ColumnSpec("c_arr_int", "ARRAY", ordinal_position=13, array_element_type="INT64"),
        # completes db/model/schema/DataType.java:11-26 (STRUCT is declared
        # but rejected by the reference's own parser): TOKENLIST and UUID
        # are Connect STRINGs; ARRAY<BYTES> exercises the per-element
        # base64->binary transform in apply_spanner_casts
        ColumnSpec("c_tokenlist", "TOKENLIST", ordinal_position=14),
        ColumnSpec("c_uuid", "UUID", ordinal_position=15),
        ColumnSpec("c_arr_bytes", "ARRAY", ordinal_position=16, array_element_type="BYTES"),
    ),
)

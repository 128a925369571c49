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
    "BYTES": T.StringType(),  # carried base64; decode via F.unbase64 on demand
}


def spark_type_for(code: str, array_element_type: str | None = None) -> T.DataType:
    code = code.upper()
    if code == "ARRAY":
        elem = spark_type_for(array_element_type or "STRING")
        return T.ArrayType(elem, containsNull=True)  # ColumnTypeSchemaMapper.java:51-55
    if code not in _SCALAR:
        raise ValueError(f"unsupported Spanner type code: {code}")
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

    def spark_struct(self, names: list[str] | None = None) -> T.StructType:
        cols = self.columns if names is None else [self.column(n) for n in names]
        return T.StructType(
            [
                T.StructField(c.name, spark_type_for(c.type_code, c.array_element_type), True)
                for c in cols
            ]
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

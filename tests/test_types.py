"""Type-fidelity golden test — mirrors the reference's DataTypesIT
(/root/reference src/test/java/.../DataTypesIT.java:33-125): one row with
every supported Spanner type decoded through the engine's decode path,
asserting the exact Connect-mapping semantics
(schema/mapper/ColumnTypeSchemaMapper.java:22-55):
timestamps/dates/numerics/json stay STRINGS, bytes are base64-decoded,
float32 down-cast, array elements nullable. Also covers D10 table filter.
"""

import base64
import json

from pyspark.sql import functions as F

from debezium_connector_spanner_spark.operators.decode import (
    apply_spanner_casts,
    decode_mods,
    table_filter,
)
from debezium_connector_spanner_spark.sources.event_schema import (
    ColumnSpec,
    EVENT_LOG_SCHEMA,
    TableSchema,
    spark_type_for,
)

TYPES_PROBE = TableSchema(
    table="types_probe",
    columns=(
        ColumnSpec("id", "INT64", is_primary_key=True, ordinal_position=1),
        ColumnSpec("boolcol", "BOOL", ordinal_position=2),
        ColumnSpec("int64col", "INT64", ordinal_position=3),
        ColumnSpec("float32col", "FLOAT32", ordinal_position=4),
        ColumnSpec("float64col", "FLOAT64", ordinal_position=5),
        ColumnSpec("timestampcol", "TIMESTAMP", ordinal_position=6),
        ColumnSpec("datecol", "DATE", ordinal_position=7),
        ColumnSpec("stringcol", "STRING", ordinal_position=8),
        ColumnSpec("bytescol", "BYTES", ordinal_position=9),
        ColumnSpec("numericcol", "NUMERIC", ordinal_position=10),
        ColumnSpec("jsoncol", "JSON", ordinal_position=11),
        ColumnSpec("arrcol", "ARRAY", array_element_type="STRING", ordinal_position=12),
        ColumnSpec("tokenlistcol", "TOKENLIST", ordinal_position=13),
        ColumnSpec("uuidcol", "UUID", ordinal_position=14),
        ColumnSpec("arrbytescol", "ARRAY", array_element_type="BYTES", ordinal_position=15),
    ),
)


def _event_row():
    new_values = {
        "boolcol": True,
        "int64col": 42,
        "float32col": 2.5,
        "float64col": 6.02214076e23,
        "timestampcol": "1970-01-01T00:00:00Z",  # stays a string
        "datecol": "1970-01-01",  # stays a string
        "stringcol": "hello",
        "bytescol": base64.b64encode(b"\x01\x02ff").decode(),
        "numericcol": "6.023",  # decimal-as-string
        "jsoncol": '{"a": 1}',
        "arrcol": ["x", None, "z"],  # elements nullable
        "tokenlistcol": "tok_a tok_b",  # opaque Connect STRING
        "uuidcol": "0f8fad5b-d9cb-469f-a165-70867728950e",
        "arrbytescol": [base64.b64encode(b"\x00\x01").decode(), None],
    }
    return {
        "record_type": "data_change",
        "partition_token": "Parent0",
        "commit_ts": __import__("datetime").datetime(2026, 1, 1),
        "record_sequence": "00000001",
        "server_txn_id": "txn-1",
        "table_name": "types_probe",
        "column_types": TYPES_PROBE.column_types_json(),
        "mods": [
            {
                "keys": json.dumps({"id": 7}),
                "new_values": json.dumps(new_values),
                "old_values": None,
            }
        ],
        "mod_type": "INSERT",
        "value_capture_type": "OLD_AND_NEW_VALUES",
    }


def test_connect_type_mapping():
    assert spark_type_for("TIMESTAMP").simpleString() == "string"
    assert spark_type_for("DATE").simpleString() == "string"
    assert spark_type_for("NUMERIC").simpleString() == "string"
    assert spark_type_for("JSON").simpleString() == "string"
    assert spark_type_for("INT64").simpleString() == "bigint"
    assert spark_type_for("FLOAT32").simpleString() == "float"
    assert spark_type_for("ARRAY", "INT64").simpleString() == "array<bigint>"


def test_datatypes_golden(spark):
    # decode_mods applies the Connect casts itself (BYTES -> binary) when
    # the schema needs them; vals is already the physical sink shape
    df = spark.createDataFrame([_event_row()], EVENT_LOG_SCHEMA)
    decoded = decode_mods(df, TYPES_PROBE)
    row = decoded.select("op", "id", F.col("vals").alias("v")).collect()[0]
    v = row["v"]
    assert row["op"] == "c" and row["id"] == 7
    assert v["boolcol"] is True
    assert v["int64col"] == 42
    assert abs(v["float32col"] - 2.5) < 1e-6 and isinstance(v["float32col"], float)
    assert v["timestampcol"] == "1970-01-01T00:00:00Z"
    assert v["datecol"] == "1970-01-01"
    assert v["numericcol"] == "6.023"
    assert v["jsoncol"] == '{"a": 1}'
    assert bytes(v["bytescol"]) == b"\x01\x02ff"
    assert list(v["arrcol"]) == ["x", None, "z"]
    assert v["tokenlistcol"] == "tok_a tok_b"
    assert v["uuidcol"] == "0f8fad5b-d9cb-469f-a165-70867728950e"
    ab = [None if x is None else bytes(x) for x in v["arrbytescol"]]
    assert ab == [b"\x00\x01", None]


def test_table_filter(spark):
    df = spark.createDataFrame([_event_row()], EVENT_LOG_SCHEMA)
    assert table_filter(df, include_regex="types_.*").count() == 1
    assert table_filter(df, include_regex="other").count() == 0
    assert table_filter(df, exclude_regex="types_.*").count() == 0
    assert table_filter(df, exclude_regex="other").count() == 1

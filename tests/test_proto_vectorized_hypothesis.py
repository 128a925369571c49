"""Property test for the r5 vectorized proto decode: random record
batches (unicode strings, absent/empty optionals, 0..4 mods, mixed
record kinds, multiple schema versions) round-trip encode_record ->
numpy/Arrow automaton identically to the row-at-a-time decode_record
reference. Runs the kernel helpers directly on hand-built Arrow batches
— no Spark session, so the property gets real example volume."""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from debezium_connector_spanner_spark.sources import proto_wire as pw

# printable-ish unicode incl. multibyte; proto3 collapses '' and None
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), min_codepoint=32),
    min_size=1,
    max_size=24,
)
_opt_text = st.one_of(st.none(), _text)
_json_obj = st.dictionaries(
    st.sampled_from(["repo", "path", "lang", "content", "stars"]),
    st.one_of(st.integers(-5, 5), _text),
    max_size=3,
).map(lambda d: json.dumps(d, sort_keys=True))

_coltypes = st.lists(
    st.tuples(_text, st.sampled_from(["STRING", "INT64", "FLOAT64"]), st.booleans()),
    min_size=0,
    max_size=4,
).map(
    lambda cols: json.dumps(
        [
            {
                "name": n,
                "type": {"code": t},
                "is_primary_key": pk,
                "ordinal_position": i + 1,
            }
            for i, (n, t, pk) in enumerate(cols)
        ],
        sort_keys=True,
    )
)

_mod = st.fixed_dictionaries(
    {
        "keys": _json_obj,
        "new_values": st.one_of(st.none(), _json_obj),
        "old_values": st.one_of(st.none(), _json_obj),
    }
)

_data_record = st.fixed_dictionaries(
    {
        "record_type": st.just("data_change"),
        "commit_ts_us": st.integers(1, 2_000_000_000_000_000),
        "record_sequence": _opt_text,
        "server_txn_id": _opt_text,
        "is_last_in_txn_in_partition": st.booleans(),
        "table_name": _text,
        "column_types": _coltypes,
        "mods": st.lists(_mod, min_size=0, max_size=4),
        "mod_type": st.sampled_from(["INSERT", "UPDATE", "DELETE"]),
        "value_capture_type": st.sampled_from(
            ["OLD_AND_NEW_VALUES", "NEW_ROW", "NEW_VALUES", "NEW_ROW_AND_OLD_VALUES"]
        ),
        "number_of_records_in_transaction": st.integers(0, 1 << 40),
        "number_of_partitions_in_transaction": st.integers(0, 64),
        "transaction_tag": st.one_of(st.just(""), _text),
        "is_system_transaction": st.booleans(),
    }
)

_ctrl_record = st.one_of(
    st.fixed_dictionaries(
        {
            "record_type": st.just("heartbeat"),
            "commit_ts_us": st.integers(1, 2_000_000_000_000_000),
        }
    ),
    st.fixed_dictionaries(
        {
            "record_type": st.just("child_partitions"),
            "commit_ts_us": st.integers(1, 2_000_000_000_000_000),
            "record_sequence": _opt_text,
            "child_partitions": st.lists(
                st.fixed_dictionaries(
                    {
                        "token": _text,
                        "parent_partition_tokens": st.lists(_text, max_size=2),
                    }
                ),
                min_size=1,
                max_size=3,
            ),
        }
    ),
    st.fixed_dictionaries(
        {
            "record_type": st.just("partition_end"),
            "commit_ts_us": st.integers(1, 2_000_000_000_000_000),
        }
    ),
)


def _decode_batch_via_kernel(raws: list[bytes], token: str) -> list[dict]:
    """Drive the same helpers decode_proto_wire's kernel uses, on a
    hand-built Arrow batch, and return rows as dicts."""
    n = len(raws)
    rec = pa.array(raws, type=pa.binary())
    tok = pa.array([token] * n)
    cts = pa.array(np.arange(n, dtype=np.int64), type=pa.timestamp("us", tz="UTC"))
    bufs = rec.buffers()
    offs = np.frombuffer(bufs[1], dtype=np.int32)[: n + 1].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    starts, ends = offs[:-1], offs[1:]
    key0 = data[starts]
    ln, p = pw._vec_varints(data, starts + 1)
    rtype = (key0 >> 3).astype(np.int64)
    schema = pw._out_schema(tok.type, cts.type)
    rows: dict[int, dict] = {}
    idx_data = np.flatnonzero(rtype == 1)
    if idx_data.size:
        rb = pw._decode_data_batch(
            data, p[idx_data], (p + ln)[idx_data], tok, cts, idx_data, schema
        )
        for j, orig in enumerate(idx_data):
            rows[int(orig)] = {k: v[j] for k, v in rb.to_pydict().items()}
    idx_ctrl = np.flatnonzero(rtype != 1)
    if idx_ctrl.size:
        rb = pw._decode_ctrl_batch(data, starts, ends, tok, cts, idx_ctrl, schema)
        for j, orig in enumerate(idx_ctrl):
            rows[int(orig)] = {k: v[j] for k, v in rb.to_pydict().items()}
    return [rows[i] for i in range(n)]


@given(st.lists(st.one_of(_data_record, _ctrl_record), min_size=1, max_size=12))
@settings(max_examples=60, deadline=None)
def test_vectorized_decode_equals_reference(records):
    pw._COLTYPES_CACHE.clear()
    pw._COLTYPES_REGION_CACHE.clear()
    token = "tok-hyp"
    raws = [pw.encode_record(dict(r, partition_token=token)) for r in records]
    want = [pw.decode_record(raw, token) for raw in raws]
    got = _decode_batch_via_kernel(raws, token)
    fields = [f for f in pw._FIELDS if f not in ("partition_token", "commit_ts")]
    for i, (g, w) in enumerate(zip(got, want)):
        for f in fields:
            assert g[f] == w[f], (i, f, g[f], w[f], records[i])

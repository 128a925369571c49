"""CDC queries over the synthetic change-event fixture + their DuckDB oracles.

Each entry pairs a Spark DataFrame program with an INDEPENDENT ANSI-SQL
re-implementation that DuckDB runs on the same parquet fixture — the
driver's correctness gate. Column names/types are aligned on both sides
(timestamps surfaced as epoch micros BIGINT, no float aggregates).

The flagship ``cdc_final_state`` replays the full engine (DAG gate,
decode, LWW fold, MERGE, checkpoints) and the oracle re-derives the
final table state in pure SQL: identity dedup -> per-column
last-non-null-after-delete-barrier fold -> full outer merge with the
base table. Agreement here certifies the whole pipeline, not one
operator.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from debezium_connector_spanner_spark.fixtures.generator import (
    EPOCH_MICROS,
    FIXTURE_ROOT,
    ensure_fixture,
    fixture_config_for_sf,
)
from debezium_connector_spanner_spark.operators.decode import (
    decode_mods,
    dedup_identity,
    explode_mods,
)
from debezium_connector_spanner_spark.sources.event_schema import (
    EVENT_LOG_SCHEMA,
    REPOS_SCHEMA_V1,
    TYPES_PROBE_SCHEMA,
)
from debezium_connector_spanner_spark.streaming.engine import CdcReplayEngine

RUN_FORMAT = 7  # bump to invalidate cached replay state after engine changes
N_BATCHES = 8


# --------------------------------------------------------------- helpers
def _events(spark: SparkSession, fx: str) -> DataFrame:
    return spark.read.schema(EVENT_LOG_SCHEMA).parquet(os.path.join(fx, "events"))


def _repos_events(spark: SparkSession, fx: str) -> DataFrame:
    """The repos slice of the (multi-table) change stream — D10 include
    filter ahead of decode."""
    from debezium_connector_spanner_spark.operators.decode import table_filter

    return table_filter(_events(spark, fx), include_regex="^repos$")


def replayed_engine(
    spark: SparkSession, sf_dir: str, schema_evolution: bool = False
) -> CdcReplayEngine:
    """Full engine replay for the sf-scaled fixture; cached on disk and
    resumed/reused across calls (idempotent by checkpoint)."""
    fx = ensure_fixture(sf_dir, schema_evolution)
    tag = "run-evo" if schema_evolution else "run"
    root = os.path.join(fx, f"{tag}-v{RUN_FORMAT}")
    cfg = fixture_config_for_sf(sf_dir, schema_evolution)
    base = spark.read.parquet(os.path.join(fx, "base_repos.parquet"))
    fresh = not os.path.exists(os.path.join(root, "table"))
    tables = {"repos": (REPOS_SCHEMA_V1, base if fresh else None)}
    if cfg.types_probe_keys:
        tables["types_probe"] = (TYPES_PROBE_SCHEMA, None)
    eng = CdcReplayEngine(
        spark,
        fx,
        os.path.join(root, "table"),
        os.path.join(root, "ckpt"),
        start_us=EPOCH_MICROS,
        end_us=EPOCH_MICROS + cfg.duration_s * 1_000_000,
        n_batches=N_BATCHES,
        tables=tables,
        n_buckets=16,
    )
    eng.run()  # no-op when the checkpoint says complete
    return eng


def _fx_path(sf_name: str = "sf0.01", evo: bool = False) -> str:
    return os.path.join(FIXTURE_ROOT, sf_name + ("-evo" if evo else ""))


def replayed_engine_pg(spark: SparkSession, sf_dir: str) -> CdcReplayEngine:
    """Same replay, PG-dialect wire format: the log is re-encoded as
    one-JSON-document-per-record (events_pg/, derived deterministically
    from the canonical fixture) and decoded via sources/pg_json.py. The
    DuckDB oracle still reads the CANONICAL log — so a hash match proves
    the second wire decode end-to-end, not just a round-trip."""
    from debezium_connector_spanner_spark.fixtures.generator import write_pg_json_log

    fx = ensure_fixture(sf_dir)
    write_pg_json_log(fx)
    root = os.path.join(fx, f"run-pg-v{RUN_FORMAT}")
    cfg = fixture_config_for_sf(sf_dir)
    fresh = not os.path.exists(os.path.join(root, "table"))
    base = spark.read.parquet(os.path.join(fx, "base_repos.parquet"))
    eng = CdcReplayEngine(
        spark,
        fx,
        os.path.join(root, "table"),
        os.path.join(root, "ckpt"),
        start_us=EPOCH_MICROS,
        end_us=EPOCH_MICROS + cfg.duration_s * 1_000_000,
        n_batches=N_BATCHES,
        tables={"repos": (REPOS_SCHEMA_V1, base if fresh else None)},
        n_buckets=16,
        wire_format="pg_json",
        table_include="^repos$",  # pg log carries both tables; route repos
    )
    eng.run()
    return eng


def q_cdc_final_state_pg(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = replayed_engine_pg(spark, sf_dir)
    return eng.final_state("repos").select(
        "repo",
        "path",
        "commit",
        "lang",
        "content",
        F.sha2(F.col("content"), 256).alias("content_sha"),
    )


def replayed_engine_proto(spark: SparkSession, sf_dir: str) -> CdcReplayEngine:
    """Same replay, proto wire format: the log is re-encoded as one
    serialized proto3 ChangeStreamRecord per row (events_proto/, derived
    deterministically from the canonical fixture) and decoded via
    sources/proto_wire.py. The DuckDB oracle still reads the CANONICAL
    log — a hash match proves the third wire decode end-to-end."""
    from debezium_connector_spanner_spark.fixtures.generator import write_proto_log

    fx = ensure_fixture(sf_dir)
    write_proto_log(fx)
    root = os.path.join(fx, f"run-proto-v{RUN_FORMAT}")
    cfg = fixture_config_for_sf(sf_dir)
    fresh = not os.path.exists(os.path.join(root, "table"))
    base = spark.read.parquet(os.path.join(fx, "base_repos.parquet"))
    eng = CdcReplayEngine(
        spark,
        fx,
        os.path.join(root, "table"),
        os.path.join(root, "ckpt"),
        start_us=EPOCH_MICROS,
        end_us=EPOCH_MICROS + cfg.duration_s * 1_000_000,
        n_batches=N_BATCHES,
        tables={"repos": (REPOS_SCHEMA_V1, base if fresh else None)},
        n_buckets=16,
        wire_format="proto",
        table_include="^repos$",  # proto log carries both tables; route repos
    )
    eng.run()
    return eng


def q_cdc_final_state_proto(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = replayed_engine_proto(spark, sf_dir)
    return eng.final_state("repos").select(
        "repo",
        "path",
        "commit",
        "lang",
        "content",
        F.sha2(F.col("content"), 256).alias("content_sha"),
    )


# --------------------------------------------------------------- queries
def q_cdc_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    eng = replayed_engine(spark, sf_dir)
    return eng.final_state().select(
        "repo",
        "path",
        "commit",
        "lang",
        "content",
        F.sha2(F.col("content"), 256).alias("content_sha"),
    )


def q_cdc_changes_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decoded, identity-deduped change stream (op derived per mod)."""
    fx = ensure_fixture(sf_dir)
    decoded = decode_mods(_repos_events(spark, fx), REPOS_SCHEMA_V1)
    d = dedup_identity(decoded)
    return d.select(
        "repo",
        "path",
        "op",
        F.unix_micros("commit_ts").alias("ts_us"),
        "record_sequence",
        F.col("mod_number").cast("long").alias("mod_number"),
        "partition_token",
        "server_txn_id",
    )


def q_cdc_op_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    fx = ensure_fixture(sf_dir)
    decoded = dedup_identity(decode_mods(_repos_events(spark, fx), REPOS_SCHEMA_V1))
    return decoded.groupBy("op").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.countDistinct("repo", "path").alias("n_keys"),
    )


def q_cdc_dag_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    fx = ensure_fixture(sf_dir)
    ev = _events(spark, fx).where(F.col("record_type") == "child_partitions")
    return (
        ev.select(
            F.col("partition_token").alias("announced_by"),
            F.explode("child_partitions").alias("cp"),
            F.unix_micros("commit_ts").alias("start_ts_us"),
        )
        .select(
            F.col("cp.token").alias("child_token"),
            F.explode("cp.parent_partition_tokens").alias("parent_token"),
            "start_ts_us",
        )
        .distinct()
    )


def q_cdc_heartbeat_progress(spark: SparkSession, sf_dir: str) -> DataFrame:
    fx = ensure_fixture(sf_dir)
    ev = _events(spark, fx).where(F.col("record_type") == "heartbeat")
    return ev.groupBy("partition_token").agg(
        F.count(F.lit(1)).alias("n_heartbeats"),
        F.max(F.unix_micros("commit_ts")).alias("max_ts_us"),
    )


def q_cdc_watermark_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-batch low watermark + event counts from the engine's metrics
    journal (O9/M1). Fully oracle-checked: the gate/offset/watermark
    recurrence is deterministic given the log and the batch boundaries,
    so sql_cdc_watermark_trace re-simulates it batch-by-batch in pure
    DuckDB SQL (unrolled CTE per batch) and must reproduce the journal
    exactly. snapshot ids are engine-internal and excluded."""
    eng = replayed_engine(spark, sf_dir)
    rows = [
        (
            m["batch_id"],
            m["batch_end_us"],
            m["watermark_us"],
            m["events"],
            m["active_tokens"],
        )
        for m in eng.metrics()
    ]
    return spark.createDataFrame(
        rows,
        "batch_id int, batch_end_us long, watermark_us long, events long, "
        "active_tokens int",
    )


def q_cdc_final_state_evolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay with online schema evolution (add stars INT64 -> widen to
    FLOAT64); checked against sql_cdc_final_state_evolved (DuckDB) plus
    the pandas oracle in pytest (tests/test_replay.py)."""
    eng = replayed_engine(spark, sf_dir, schema_evolution=True)
    return eng.final_state().select(
        "repo", "path", "commit", "lang", "stars",
        F.sha2(F.col("content"), 256).alias("content_sha"),
    )


# ---------------------------------------------------------------- oracles
def _seq_sql(ts="ts", rs="rs", mn="mod_number") -> str:
    # HUGEINT-packed total order == Spark's struct(ts, rs_numeric, mod)
    # order; rs is CAST numerically (matching seq_col's cast-to-long
    # normalization of the arbitrary-length numeric record_sequence).
    # Packing budget: rs < 1e8 in the fixture, mod_number < 100.
    return f"CAST({ts} AS HUGEINT)*10000000000 + CAST({rs} AS HUGEINT)*100 + {mn}"


def _exploded_sql(fx: str) -> str:
    return f"""
  raw AS (
    SELECT partition_token, epoch_us(commit_ts) AS ts, record_sequence AS rs,
           server_txn_id, mods, mod_type, value_capture_type,
           is_last_in_txn_in_partition, number_of_records_in_transaction,
           number_of_partitions_in_transaction, transaction_tag,
           is_system_transaction
    FROM read_parquet('{fx}/events/*/*.parquet', hive_partitioning=1)
    WHERE record_type = 'data_change' AND table_name = 'repos'
  ),
  exploded AS (
    SELECT DISTINCT partition_token, ts, rs, server_txn_id,
           mod_type, value_capture_type,
           is_last_in_txn_in_partition, number_of_records_in_transaction,
           number_of_partitions_in_transaction, transaction_tag,
           is_system_transaction,
           mn - 1 AS mod_number,
           mods[mn].keys AS keys, mods[mn].new_values AS new_values,
           mods[mn].old_values AS old_values
    FROM raw, UNNEST(generate_series(1, len(mods))) AS t(mn)
  ),
  keyed AS (
    SELECT json_extract_string(keys, '$.repo') AS repo,
           json_extract_string(keys, '$.path') AS path,
           ts, rs, mod_number, partition_token, server_txn_id,
           mod_type, value_capture_type,
           is_last_in_txn_in_partition, number_of_records_in_transaction,
           number_of_partitions_in_transaction, transaction_tag,
           is_system_transaction,
           new_values, old_values,
           {_seq_sql()} AS k
    FROM exploded
  )"""


# op derivation mirroring operators/decode.py: null pattern first; under
# capture types without old images (NEW_ROW / NEW_VALUES) fall back to the
# record-level ModType mapping.
_SQL_OP = """
  CASE WHEN new_values IS NULL THEN 'd'
       WHEN value_capture_type IN ('NEW_ROW', 'NEW_VALUES') THEN
            CASE mod_type WHEN 'INSERT' THEN 'c' WHEN 'DELETE' THEN 'd' ELSE 'u' END
       WHEN old_values IS NULL THEN 'c'
       ELSE 'u' END
"""


def _col_fold_sql(c: str) -> str:
    """Per-column LWW fold: latest written value + its order key.

    The written test is key-presence (list_contains(json_keys(...))) so an
    explicit JSON null counts as a write of NULL — matching the engine's
    written-flag fold (operators/merge.py) and the reference's
    JsonNodeStructValueConvertor null handling. arg_max's value is wrapped
    in struct_pack so NULL values aren't skipped by the aggregate."""
    written = f"list_contains(json_keys(new_values), '{c}')"
    return f"""
      arg_max(struct_pack(v := json_extract_string(new_values, '$.{c}')),
              CASE WHEN {written} THEN k END).v AS v_{c},
      max(CASE WHEN {written} THEN k END) AS k_{c}"""


def _col_merge_sql(c: str, in_base: bool = True, cast: str | None = None) -> str:
    base_v = f'b."{c}"' if in_base else "NULL"
    v = f"f.v_{c}" if cast is None else f"CAST(f.v_{c} AS {cast})"
    return f"""
      CASE WHEN f.repo IS NULL THEN {base_v}
           WHEN f.k_{c} IS NOT NULL AND (f.del_k IS NULL OR f.k_{c} > f.del_k) THEN {v}
           WHEN f.del_k IS NOT NULL THEN NULL
           ELSE {base_v} END AS "{c}" """


def _sql_final_state(
    fx: str,
    fold_cols: list[str],
    merge_cols: list[str],
    select: str,
    cutoff_us: int | None = None,
) -> str:
    exploded = _exploded_sql(fx)
    if cutoff_us is not None:
        # AS-OF truncation: the fold sees only events committed at or
        # before the cutoff (time-travel oracle for snapshot reads)
        exploded = exploded.replace(
            "AND table_name = 'repos'",
            f"AND table_name = 'repos' AND epoch_us(commit_ts) <= {cutoff_us}",
        )
    return f"""
WITH {exploded},
folded AS (
  SELECT repo, path,
    arg_max(new_values IS NULL, k) AS last_is_del,
    max(CASE WHEN new_values IS NULL THEN k END) AS del_k,
    {', '.join(fold_cols)}
  FROM keyed GROUP BY repo, path
),
base AS (SELECT * FROM read_parquet('{fx}/base_repos.parquet')),
merged AS (
  SELECT coalesce(f.repo, b.repo) AS repo, coalesce(f.path, b.path) AS path,
    {', '.join(merge_cols)},
    (f.repo IS NOT NULL AND f.last_is_del) AS dropped
  FROM folded f FULL OUTER JOIN base b ON f.repo = b.repo AND f.path = b.path
)
SELECT {select}
FROM merged WHERE NOT coalesce(dropped, false)
"""


def sql_cdc_final_state(fx: str) -> str:
    return _sql_final_state(
        fx,
        fold_cols=[_col_fold_sql(c) for c in ("commit", "lang", "content")],
        merge_cols=[_col_merge_sql(c) for c in ("commit", "lang", "content")],
        select='repo, path, "commit", lang, content, sha256(content) AS content_sha',
    )


ASOF_BATCH = 3  # snapshot read AS OF the end of this batch (see below)


def _asof_cutoff_us(sf_name: str = "sf0.01") -> int:
    cfg = fixture_config_for_sf(_fx_path(sf_name))
    return EPOCH_MICROS + (ASOF_BATCH + 1) * cfg.duration_s * 1_000_000 // N_BATCHES


def sql_cdc_state_asof(fx: str, sf_name: str = "sf0.01") -> str:
    return _sql_final_state(
        fx,
        fold_cols=[_col_fold_sql(c) for c in ("commit", "lang", "content")],
        merge_cols=[_col_merge_sql(c) for c in ("commit", "lang", "content")],
        select='repo, path, "commit", lang, content, sha256(content) AS content_sha',
        cutoff_us=_asof_cutoff_us(sf_name),
    )


def q_cdc_state_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot time travel: read the table AS OF the snapshot committed
    at batch ASOF_BATCH's boundary and prove it equals the SQL fold
    truncated at that batch's end timestamp — snapshot isolation +
    exactly-once surfaced as an oracle equality, from the mid-replay
    snapshot the lake keeps (sources/lake.py read(sid); reference
    analogue: consumers reading committed offsets mid-stream).

    Semantics note: a batch-boundary snapshot equals the time-truncated
    fold only at DAG-SETTLED boundaries. While a child partition is
    catching up after its parents finish, events below the boundary are
    scanned one batch later (the gate's happens-before), so boundaries
    inside a split catch-up lag the truncated fold (measured on this
    fixture: batches 4-5 lag; 1-3 and 6+ are settled). ASOF_BATCH=3 is
    the last settled boundary before the fixture's child-split wave —
    i.e. this check covers genuine mid-replay state, not the trivial
    final snapshot."""
    eng = replayed_engine(spark, sf_dir)
    ms = [m for m in eng.metrics() if m.get("snapshot_id") is not None]
    m = ms[ASOF_BATCH]
    assert m["batch_id"] == ASOF_BATCH
    from debezium_connector_spanner_spark.operators.merge import CDC_TS_COL

    return (
        eng.tables["repos"]
        .table.read(m["snapshot_id"])
        .drop(CDC_TS_COL)
        .select(
            "repo",
            "path",
            "commit",
            "lang",
            "content",
            F.sha2(F.col("content"), 256).alias("content_sha"),
        )
    )


def sql_cdc_final_state_evolved(fx: str) -> str:
    """Oracle for the schema-evolution replay: same fold with the online
    `stars` column (INT64 epoch then FLOAT64 widen -> DOUBLE in the sink;
    absent from the base table so base-side value is NULL). Reference
    semantics: db/metadata/SchemaMerger.java:24-53 (additive + widening)."""
    return _sql_final_state(
        fx,
        fold_cols=[_col_fold_sql(c) for c in ("commit", "lang", "content", "stars")],
        merge_cols=[
            _col_merge_sql("commit"),
            _col_merge_sql("lang"),
            _col_merge_sql("stars", in_base=False, cast="DOUBLE"),
            _col_merge_sql("content"),
        ],
        select='repo, path, "commit", lang, stars, sha256(content) AS content_sha',
    )


def sql_cdc_changes_stream(fx: str) -> str:
    return f"""
WITH {_exploded_sql(fx)}
SELECT repo, path,
  {_SQL_OP} AS op,
  ts AS ts_us, rs AS record_sequence, mod_number, partition_token, server_txn_id
FROM keyed
"""


def sql_cdc_op_stats(fx: str) -> str:
    return f"""
WITH {_exploded_sql(fx)}
SELECT {_SQL_OP} AS op,
       count(*) AS n_records,
       count(DISTINCT repo || chr(0) || path) AS n_keys
FROM keyed GROUP BY 1
"""


def sql_cdc_dag_edges(fx: str) -> str:
    return f"""
SELECT DISTINCT cp.token AS child_token,
       unnest(cp.parent_partition_tokens) AS parent_token,
       epoch_us(commit_ts) AS start_ts_us
FROM (
  SELECT unnest(child_partitions) AS cp, commit_ts
  FROM read_parquet('{fx}/events/*/*.parquet', hive_partitioning=1)
  WHERE record_type = 'child_partitions'
)
"""


def sql_cdc_heartbeat_progress(fx: str) -> str:
    return f"""
SELECT partition_token, count(*) AS n_heartbeats, max(epoch_us(commit_ts)) AS max_ts_us
FROM read_parquet('{fx}/events/*/*.parquet', hive_partitioning=1)
WHERE record_type = 'heartbeat'
GROUP BY partition_token
"""


def q_cdc_types_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-table routing + end-to-end type fidelity (mirrors the
    reference's DataTypesIT.java:33-125): the SAME replay run that builds
    `repos` also routes `types_probe` events to their own LakeTable with
    every supported Spanner type code — BYTES lands BINARY in the sink,
    FLOAT32 down-cast, typed arrays. Hash-safe projection: binary
    re-encoded base64, arrays canonicalized via to_json, on both engines."""
    eng = replayed_engine(spark, sf_dir)
    fs = eng.final_state("types_probe")
    return fs.select(
        "id",
        "c_string",
        "c_int64",
        "c_float64",
        "c_float32",
        "c_bool",
        F.base64("c_bytes").alias("c_bytes_b64"),
        "c_numeric",
        "c_date",
        "c_timestamp",
        "c_json",
        F.to_json("c_arr_str").alias("c_arr_str_json"),
        F.to_json("c_arr_int").alias("c_arr_int_json"),
        "c_tokenlist",
        "c_uuid",
        # binary array re-encoded per element so both engines compare the
        # same canonical JSON-of-base64 text
        F.to_json(F.transform("c_arr_bytes", F.base64)).alias("c_arr_bytes_json"),
    )


def sql_cdc_types_final_state(fx: str) -> str:
    """Independent DuckDB fold of the types_probe slice (no base table:
    a key exists iff its last event wasn't a DELETE)."""
    cols = [
        ("c_string", "v_c_string"),
        ("c_int64", "CAST(v_c_int64 AS BIGINT)"),
        ("c_float64", "CAST(v_c_float64 AS DOUBLE)"),
        ("c_float32", "CAST(v_c_float32 AS FLOAT)"),
        ("c_bool", "CAST(v_c_bool AS BOOLEAN)"),
        ("c_bytes_b64", "v_c_bytes"),
        ("c_numeric", "v_c_numeric"),
        ("c_date", "v_c_date"),
        ("c_timestamp", "v_c_timestamp"),
        ("c_json", "v_c_json"),
        ("c_arr_str_json", "CAST(json_extract(v_raw, '$.c_arr_str') AS VARCHAR)"),
        ("c_arr_int_json", "CAST(json_extract(v_raw, '$.c_arr_int') AS VARCHAR)"),
        ("c_tokenlist", "v_c_tokenlist"),
        ("c_uuid", "v_c_uuid"),
        ("c_arr_bytes_json", "CAST(json_extract(v_raw, '$.c_arr_bytes') AS VARCHAR)"),
    ]
    src_cols = [
        "c_string", "c_int64", "c_float64", "c_float32", "c_bool", "c_bytes",
        "c_numeric", "c_date", "c_timestamp", "c_json", "c_tokenlist", "c_uuid",
    ]
    folds = [_col_fold_sql(c) for c in src_cols]
    # arrays: fold the RAW row image of the winning write, then extract the
    # array as canonical JSON text (json_extract_string flattens arrays)
    for c in ("c_arr_str", "c_arr_int", "c_arr_bytes"):
        written = f"list_contains(json_keys(new_values), '{c}')"
        folds.append(
            f"""
      arg_max(struct_pack(v := new_values),
              CASE WHEN {written} THEN k END).v AS raw_{c},
      max(CASE WHEN {written} THEN k END) AS k_{c}"""
        )

    def pick(c: str, v_expr: str) -> str:
        return f"""
      CASE WHEN k_{c} IS NOT NULL AND (del_k IS NULL OR k_{c} > del_k)
           THEN {v_expr} ELSE NULL END"""

    src_of = {
        "c_bytes_b64": "c_bytes",
        "c_arr_str_json": "c_arr_str",
        "c_arr_int_json": "c_arr_int",
        "c_arr_bytes_json": "c_arr_bytes",
    }
    sel = ["id"]
    for out, v in cols:
        src = src_of.get(out, out)
        v = v.replace("v_raw", f"raw_{src}")
        sel.append(pick(src, v) + f" AS {out}")

    return f"""
WITH
  raw AS (
    SELECT partition_token, epoch_us(commit_ts) AS ts, record_sequence AS rs,
           server_txn_id, mods
    FROM read_parquet('{fx}/events/*/*.parquet', hive_partitioning=1)
    WHERE record_type = 'data_change' AND table_name = 'types_probe'
  ),
  exploded AS (
    SELECT DISTINCT partition_token, ts, rs, server_txn_id,
           mn - 1 AS mod_number,
           mods[mn].keys AS keys, mods[mn].new_values AS new_values
    FROM raw, UNNEST(generate_series(1, len(mods))) AS t(mn)
  ),
  keyed AS (
    SELECT CAST(json_extract_string(keys, '$.id') AS BIGINT) AS id,
           new_values, {_seq_sql()} AS k
    FROM exploded
  ),
  folded AS (
    SELECT id,
      arg_max(new_values IS NULL, k) AS last_is_del,
      max(CASE WHEN new_values IS NULL THEN k END) AS del_k,
      {', '.join(folds)}
    FROM keyed GROUP BY id
  )
SELECT {', '.join(sel)}
FROM folded WHERE NOT last_is_del
"""


def _trace_sql_parts(fx: str, sf_name: str = "sf0.01") -> tuple[str, str]:
    """Shared builder for the batch-loop re-simulation (O1 gate, O9
    watermark, K2 offset advance, O14 drain) — the semantics of
    engine.py:_run/_run_batch re-derived independently over the raw log.
    Returns (cte_blocks, trace_union) for composition into the
    watermark-trace and stamped-envelope oracles.

    The recurrence is a fixed point per batch, so it unrolls as one CTE
    block per scheduled batch plus a bounded number of conditional drain
    passes (a drain runs only while a newly-gated token still has
    unscanned range; pending sets shrink monotonically, so emitted drain
    rows are always a prefix — matching the engine's loop exit)."""
    cfg = fixture_config_for_sf(sf_name)
    start = EPOCH_MICROS
    end = EPOCH_MICROS + cfg.duration_s * 1_000_000
    span = end - start
    ends = [start + span * (i + 1) // N_BATCHES for i in range(N_BATCHES)]
    # drain unroll bound: DAG depth (a drain pass opens at most one more
    # gate level); 4 covers the fixture's root->split->split->merge chain
    passes = [(i, e, False) for i, e in enumerate(ends)] + [
        (N_BATCHES + d, end, True) for d in range(4)
    ]

    blocks = [
        f"""
  ev AS (
    SELECT partition_token AS token, epoch_us(commit_ts) AS ts,
           record_type, child_partitions
    FROM read_parquet('{fx}/events/*/*.parquet', hive_partitioning=1)
  ),
  tok0 AS MATERIALIZED (
    SELECT 'Parent0' AS token, CAST([] AS VARCHAR[]) AS parents,
           CAST({start} AS BIGINT) AS start_us, 'READY' AS state,
           CAST(NULL AS BIGINT) AS offset_us
  )"""
    ]
    rows = []
    for i, e_us, is_drain in passes:
        p, c = i, i + 1  # previous / current state suffix
        cond = (
            f"""
  pend{c} AS MATERIALIZED (
    SELECT 1 FROM g{c} WHERE state = 'READY'
      AND COALESCE(offset_us, start_us - 1) < {end}
  ),"""
            if is_drain
            else ""
        )
        gate_where = f"WHERE EXISTS (SELECT * FROM pend{c})" if is_drain else ""
        blocks.append(
            f"""
  g{c} AS MATERIALIZED (
    SELECT t.token, t.parents, t.start_us,
      CASE WHEN t.state = 'CREATED' AND NOT EXISTS (
          SELECT 1 FROM tok{p} q
          WHERE list_contains(t.parents, q.token) AND q.state <> 'FINISHED'
        ) THEN 'READY' ELSE t.state END AS state,
      t.offset_us
    FROM tok{p} t
  ),{cond}
  s{c} AS MATERIALIZED (
    SELECT e.* FROM ev e JOIN g{c} a ON e.token = a.token
    WHERE a.state = 'READY'
      AND e.ts > COALESCE(a.offset_us, a.start_us - 1) AND e.ts <= {e_us}
      {'AND EXISTS (SELECT * FROM pend' + str(c) + ')' if is_drain else ''}
  ),
  ch{c} AS MATERIALIZED (
    SELECT ctoken AS token, arg_min(cparents, ts) AS parents,
           min(ts) AS start_us
    FROM (
      SELECT ts, c.token AS ctoken, c.parent_partition_tokens AS cparents
      FROM (SELECT ts, UNNEST(child_partitions) AS c FROM s{c}
            WHERE record_type = 'child_partitions')
    )
    WHERE ctoken NOT IN (SELECT token FROM g{c})
    GROUP BY ctoken
  ),
  tok{c} AS MATERIALIZED (
    SELECT g.token, g.parents, g.start_us,
      CASE WHEN g.token IN (
          SELECT token FROM s{c} WHERE record_type = 'partition_end'
        ) THEN 'FINISHED' ELSE g.state END AS state,
      CASE WHEN g.state = 'READY' THEN {e_us} ELSE g.offset_us END AS offset_us
    FROM g{c} g
    UNION ALL
    SELECT token, parents, start_us, 'CREATED', NULL FROM ch{c}
  ),
  row{c} AS MATERIALIZED (
    SELECT CAST({i} AS INTEGER) AS batch_id,
      CAST({e_us} AS BIGINT) AS batch_end_us,
      COALESCE(
        (SELECT MIN(COALESCE(offset_us, start_us)) FROM tok{c}
         WHERE state <> 'FINISHED'),
        {e_us}) AS watermark_us,
      (SELECT COUNT(*) FROM s{c}) AS events,
      CAST((SELECT COUNT(*) FROM g{c} WHERE state = 'READY') AS INTEGER)
        AS active_tokens
    {gate_where}
  )"""
        )
        rows.append(f"SELECT * FROM row{c}")
    union = "\nUNION ALL\n".join(rows)
    return ",".join(blocks), union


def sql_cdc_watermark_trace(fx: str, sf_name: str = "sf0.01") -> str:
    """Per-batch low-watermark trace oracle (see _trace_sql_parts)."""
    blocks, union = _trace_sql_parts(fx, sf_name)
    return f"WITH {blocks}\n{union}\nORDER BY batch_id"


def sql_cdc_envelope_stamped(fx: str, sf_name: str = "sf0.01") -> str:
    """O10(a) oracle: the engine stamps each envelope record with the low
    watermark held at its batch's emission — a pure function of
    (commit_ts, batch-window series, watermark series), and the latter
    two are exactly what the _trace_sql_parts recurrence reproduces. The
    window derivation mirrors engine.envelope_stream: walk trace rows in
    batch order; a row opens window (prev_end, batch_end] iff batch_end
    advances; the stamp is the PREVIOUS row's watermark (the value the
    publisher held while the batch's records were emitted,
    /root/reference task/LowWatermarkStampPublisher.java:23-126)."""
    blocks, union = _trace_sql_parts(fx, sf_name)
    start = EPOCH_MICROS
    return f"""
WITH {blocks},
  trace AS ({union}),
  wins AS (
    SELECT w_lo, w_hi, w_stamp FROM (
      SELECT
        COALESCE(MAX(batch_end_us) OVER (ORDER BY batch_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
          CAST({start} AS BIGINT)) AS w_lo,
        batch_end_us AS w_hi,
        COALESCE(LAG(watermark_us) OVER (ORDER BY batch_id),
          CAST({start} AS BIGINT)) AS w_stamp
      FROM trace)
    WHERE w_hi > w_lo
  ),{_exploded_sql(fx)}
SELECT
  {_SQL_OP} AS op,
  repo, path, ts AS ts_us,
  w.w_stamp AS low_watermark_us,
  w.w_hi AS read_at_timestamp_us
FROM keyed LEFT JOIN wins w ON keyed.ts > w.w_lo AND keyed.ts <= w.w_hi
"""


def q_cdc_multi_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-table event routing stats over the multi-table change stream
    (SpannerEventDispatcher dispatch counts)."""
    fx = ensure_fixture(sf_dir)
    ev = _events(spark, fx).where(F.col("record_type") == "data_change")
    return ev.groupBy("table_name").agg(
        F.count(F.lit(1)).alias("n_records"),
        F.sum(F.size("mods").cast("long")).alias("n_mods"),
        F.countDistinct("partition_token").alias("n_tokens"),
    )


def sql_cdc_multi_table_stats(fx: str) -> str:
    return f"""
SELECT table_name, count(*) AS n_records,
       CAST(sum(len(mods)) AS BIGINT) AS n_mods,
       count(DISTINCT partition_token) AS n_tokens
FROM read_parquet('{fx}/events/*/*.parquet', hive_partitioning=1)
WHERE record_type = 'data_change'
GROUP BY table_name
"""


CDC_QUERIES = {
    "cdc_final_state": q_cdc_final_state,
    "cdc_types_final_state": q_cdc_types_final_state,
    "cdc_multi_table_stats": q_cdc_multi_table_stats,
    "cdc_changes_stream": q_cdc_changes_stream,
    "cdc_op_stats": q_cdc_op_stats,
    "cdc_dag_edges": q_cdc_dag_edges,
    "cdc_heartbeat_progress": q_cdc_heartbeat_progress,
    "cdc_watermark_trace": q_cdc_watermark_trace,
    "cdc_final_state_evolved": q_cdc_final_state_evolved,
    "cdc_final_state_pg": q_cdc_final_state_pg,
    "cdc_final_state_proto": q_cdc_final_state_proto,
    "cdc_state_asof": q_cdc_state_asof,
}


def cdc_oracles(sf_name: str = "sf0.01") -> dict[str, str]:
    fx = _fx_path(sf_name)
    return {
        "cdc_final_state": sql_cdc_final_state(fx),
        "cdc_changes_stream": sql_cdc_changes_stream(fx),
        "cdc_op_stats": sql_cdc_op_stats(fx),
        "cdc_dag_edges": sql_cdc_dag_edges(fx),
        "cdc_heartbeat_progress": sql_cdc_heartbeat_progress(fx),
        "cdc_types_final_state": sql_cdc_types_final_state(fx),
        "cdc_multi_table_stats": sql_cdc_multi_table_stats(fx),
        "cdc_final_state_evolved": sql_cdc_final_state_evolved(_fx_path(sf_name, evo=True)),
        # pg/proto wire replays vs the SAME canonical-log oracle (D1
        # second + third dialects)
        "cdc_final_state_pg": sql_cdc_final_state(_fx_path(sf_name)),
        "cdc_final_state_proto": sql_cdc_final_state(_fx_path(sf_name)),
        # batch-loop re-simulation (gate/offset/watermark/drain) in SQL
        "cdc_watermark_trace": sql_cdc_watermark_trace(fx, sf_name),
        # snapshot time travel vs the time-truncated fold
        "cdc_state_asof": sql_cdc_state_asof(fx, sf_name),
    }


def q_cdc_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debezium envelope stream (D8/D9): flattened for oracle compare."""
    from debezium_connector_spanner_spark.operators.envelope import to_envelope

    fx = ensure_fixture(sf_dir)
    decoded = decode_mods(_repos_events(spark, fx), REPOS_SCHEMA_V1, include_old=True)
    env = to_envelope(decoded, low_watermark_us=0)
    return env.select(
        "op",
        F.col("key.repo").alias("repo"),
        F.col("key.path").alias("path"),
        "ts_us",
        F.col("source.record_sequence").alias("record_sequence"),
        F.col("source.mod_number").cast("long").alias("mod_number"),
        F.col("source.partition_token").alias("partition_token"),
        F.col("source.server_transaction_id").alias("server_transaction_id"),
        F.col("source.value_capture_type").alias("value_capture_type"),
        F.col("source.number_records_in_transaction").alias("n_rec_in_txn"),
        F.col("source.number_of_partitions_in_transaction").alias("n_part_in_txn"),
        F.col("source.transaction_tag").alias("transaction_tag"),
        F.col("source.system_transaction").alias("system_transaction"),
        F.col("source.is_last_record_in_transaction_in_partition").alias("is_last_in_txn"),
        F.col("before.commit").alias("before_commit"),
        F.col("after.commit").alias("after_commit"),
        F.col("before").isNotNull().alias("has_before"),
        F.col("after").isNotNull().alias("has_after"),
    )


def sql_cdc_envelope(fx: str) -> str:
    return f"""
WITH {_exploded_sql(fx)}
SELECT
  {_SQL_OP} AS op,
  repo, path, ts AS ts_us, rs AS record_sequence, mod_number, partition_token,
  server_txn_id AS server_transaction_id,
  value_capture_type,
  number_of_records_in_transaction AS n_rec_in_txn,
  number_of_partitions_in_transaction AS n_part_in_txn,
  transaction_tag,
  is_system_transaction AS system_transaction,
  is_last_in_txn_in_partition AS is_last_in_txn,
  json_extract_string(old_values, '$.commit') AS before_commit,
  json_extract_string(new_values, '$.commit') AS after_commit,
  old_values IS NOT NULL AS has_before,
  new_values IS NOT NULL AS has_after
FROM keyed
"""


def q_cdc_envelope_stamped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O10(a): envelope stream stamped with the ENGINE's per-batch low
    watermark (task/LowWatermarkStampPublisher.java semantics). Fully
    oracle-checked: sql_cdc_envelope_stamped derives the identical
    window->stamp mapping from the batch-loop recurrence re-simulated in
    DuckDB (see _trace_sql_parts) and range-joins it onto the exploded
    log. The invariants (stamp <= commit_ts, monotone in emission order)
    are additionally pytest-asserted (tests/test_envelope.py, mirrors
    LowWatermarkRecordIT.java:49-88)."""
    eng = replayed_engine(spark, sf_dir)
    env = eng.envelope_stream("repos")
    return env.select(
        "op",
        F.col("key.repo").alias("repo"),
        F.col("key.path").alias("path"),
        "ts_us",
        F.col("source.low_watermark_us").alias("low_watermark_us"),
        F.col("source.read_at_timestamp_us").alias("read_at_timestamp_us"),
    )


CDC_QUERIES["cdc_envelope"] = q_cdc_envelope
CDC_QUERIES["cdc_envelope_stamped"] = q_cdc_envelope_stamped


_orig_cdc_oracles = cdc_oracles


def cdc_oracles(sf_name: str = "sf0.01") -> dict[str, str]:  # noqa: F811
    out = _orig_cdc_oracles(sf_name)
    out["cdc_envelope"] = sql_cdc_envelope(_fx_path(sf_name))
    out["cdc_envelope_stamped"] = sql_cdc_envelope_stamped(
        _fx_path(sf_name), sf_name
    )
    return out

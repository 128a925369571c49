"""Golden replay + resume-from-checkpoint + schema evolution, end to end.

Mirrors the reference's integration tests (all under
/root/reference/src/test/java/io/debezium/connector/spanner/):
- full replay == oracle final state, per-row sha256(content) equality
  (DataTypesIT.java:33-125 golden-value style, north-rule invariant)
- GracefulRestartIT.java:44-73 -> stop mid-replay, restart from
  checkpoint, byte-identical final state, no loss/dup
- LowWatermarkRecordIT.java:49-88 -> watermark monotone and bounded
- SchemaMergerTest -> additive column + INT64->FLOAT64 widening online
"""

import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from debezium_connector_spanner_spark.fixtures.generator import (
    EPOCH_MICROS,
    GeneratorConfig,
    write_fixture,
)
from debezium_connector_spanner_spark.fixtures.oracle import fold_final_state
from debezium_connector_spanner_spark.sources.event_schema import REPOS_SCHEMA_V1
from debezium_connector_spanner_spark.streaming.engine import CdcReplayEngine

CFG = GeneratorConfig(n_repos=8, paths_per_repo=5, hot_repos=2, events_per_key_mean=4)


def _mk_engine(spark, fixture_dir, root, n_batches=6, cfg=CFG, **kw):
    base = spark.read.parquet(os.path.join(fixture_dir, "base_repos.parquet"))
    end_us = EPOCH_MICROS + cfg.duration_s * 1_000_000
    return CdcReplayEngine(
        spark,
        fixture_dir,
        os.path.join(root, "repos_table"),
        os.path.join(root, "ckpt"),
        start_us=EPOCH_MICROS,
        end_us=end_us,
        n_batches=n_batches,
        initial_schema=REPOS_SCHEMA_V1,
        base_df=base if not os.path.exists(os.path.join(root, "repos_table")) else None,
        n_buckets=8,
        **kw,
    )


def _final_pd(engine) -> pd.DataFrame:
    return (
        engine.final_state()
        .toPandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )


def _assert_matches_oracle(engine, fixture_dir):
    got = _final_pd(engine)
    want = (
        fold_final_state(fixture_dir).sort_values(["repo", "path"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)
    # north-rule invariant: per-row content sha256 equality
    import hashlib

    sha = lambda s: None if s is None else hashlib.sha256(s.encode()).hexdigest()
    assert got["content"].map(sha).tolist() == want["content"].map(sha).tolist()


def test_golden_replay(spark, tmp_root):
    fx = os.path.join(tmp_root, "fx")
    m = write_fixture(fx, CFG)
    eng = _mk_engine(spark, fx, tmp_root)
    totals = eng.run()
    assert totals["batches"] == 6
    assert totals["events"] == m["events"]
    _assert_matches_oracle(eng, fx)


def test_resume_from_checkpoint(spark, tmp_root):
    fx = os.path.join(tmp_root, "fx")
    write_fixture(fx, CFG)
    eng1 = _mk_engine(spark, fx, tmp_root, n_batches=6)
    eng1.run(max_batches=3)
    mid_snapshot = eng1.table.current_snapshot_id()

    # "restart": a brand-new engine instance picks up the checkpoint
    eng2 = _mk_engine(spark, fx, tmp_root, n_batches=6)
    assert eng2.batch_id == 2
    assert eng2.table.current_snapshot_id() == mid_snapshot
    eng2.run()
    _assert_matches_oracle(eng2, fx)


def test_resume_discards_uncheckpointed_snapshot(spark, tmp_root):
    """Crash between data commit and checkpoint commit: the orphan
    snapshot must be rolled back on restart (exactly-once)."""
    fx = os.path.join(tmp_root, "fx")
    write_fixture(fx, CFG)
    eng1 = _mk_engine(spark, fx, tmp_root)
    eng1.run(max_batches=2)
    good = eng1.table.current_snapshot_id()
    # simulate a torn batch: bump CURRENT past the checkpointed snapshot
    eng1.table._set_current(good)  # no-op flip keeps files valid
    import json

    snap = eng1.table.snapshot(good)
    snap["id"] = good + 1
    snap["parent"] = good
    with open(eng1.table._snap_path(good + 1), "w") as f:
        json.dump(snap, f)
    eng1.table._set_current(good + 1)

    eng2 = _mk_engine(spark, fx, tmp_root)
    assert eng2.table.current_snapshot_id() == good
    eng2.run()
    _assert_matches_oracle(eng2, fx)


def test_watermark_monotone(spark, tmp_root):
    fx = os.path.join(tmp_root, "fx")
    write_fixture(fx, CFG)
    eng = _mk_engine(spark, fx, tmp_root)
    eng.run()
    ms = eng.metrics()
    wms = [m["watermark_us"] for m in ms if "watermark_us" in m]
    assert wms == sorted(wms), "low watermark must be monotone"
    for m in ms:
        assert m["watermark_us"] <= m["batch_end_us"]
    # lineage emitted per partition (north rule)
    assert any(m["lineage"] for m in ms)


def test_schema_evolution_online(spark, tmp_root):
    cfg = GeneratorConfig(
        n_repos=8,
        paths_per_repo=5,
        hot_repos=2,
        events_per_key_mean=4,
        schema_evolution=True,
    )
    fx = os.path.join(tmp_root, "fx-evo")
    write_fixture(fx, cfg)
    eng = _mk_engine(spark, fx, tmp_root, cfg=cfg)
    eng.run()
    got = _final_pd(eng)
    assert "stars" in got.columns
    assert str(got["stars"].dtype) == "float64"
    want = fold_final_state(fx).sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_dag_gate_ordering(spark, tmp_root):
    """A child partition's data must not be applied before its parents
    finish: check via per-batch lineage that t-M only appears after both
    t-A2 and t-B emitted their end markers (ConflictResolver/
    FindPartitionForStreamingOperation semantics)."""
    fx = os.path.join(tmp_root, "fx")
    write_fixture(fx, CFG)
    eng = _mk_engine(spark, fx, tmp_root, n_batches=10)
    eng.run()
    ms = eng.metrics()
    first_m_batch = None
    finish_batches = {}
    for m in ms:
        for t in m["finished"]:
            finish_batches[t] = m["batch_id"]
        for ln in m["lineage"]:
            if ln["token"] == "t-M" and first_m_batch is None:
                first_m_batch = m["batch_id"]
    assert first_m_batch is not None
    assert finish_batches["t-A2"] < first_m_batch
    assert finish_batches["t-B"] < first_m_batch


def test_async_compaction_matches_sync(spark, tmp_root):
    """The maintenance-lane compaction (prepare concurrent with later
    batches, rebase-commit in the loop) must produce the same final state
    as the in-loop synchronous rewrite, with delta depth re-bounded."""
    fx = os.path.join(tmp_root, "fx")
    write_fixture(fx, CFG)
    eng_a = _mk_engine(
        spark, fx, os.path.join(tmp_root, "a"), compact_every=2, compact_mode="async"
    )
    eng_a.run()
    eng_s = _mk_engine(
        spark, fx, os.path.join(tmp_root, "s"), compact_every=2, compact_mode="sync"
    )
    eng_s.run()
    _assert_matches_oracle(eng_a, fx)
    pd.testing.assert_frame_equal(_final_pd(eng_a), _final_pd(eng_s))
    # a compaction actually ran and re-bounded the delta stack
    summaries = [
        eng_a.table.snapshot(i).get("summary", {})
        for i in range(1, eng_a.table.current_snapshot_id() + 1)
    ]
    assert any(s.get("op") == "compact" for s in summaries)
    assert eng_a.table.delta_depth() < 6


def test_semijoin_token_filter_matches_inlist(spark, tmp_root):
    """S1 at 10^5-token scale: with token_inlist_max=0 the literal IN-list
    is skipped and token filtering rides the broadcast offsets equi-join
    (dynamic partition pruning recovers the dir pruning). Final state must
    be byte-identical to the IN-list plan, and the physical plan must not
    contain the literal token list."""
    fx = os.path.join(tmp_root, "fx")
    write_fixture(fx, CFG)
    eng = _mk_engine(spark, fx, tmp_root, token_inlist_max=0)
    # plan check on the scan itself before running: the literal token
    # IN-list is gone (tokens only reach the plan via the broadcast
    # offsets table), the equi-join is present
    active = eng._gate()
    assert active
    plan = eng._active_scan(active, eng.end_us)._jdf.queryExecution().toString()
    assert f"IN ({active[0]}" not in plan and "BroadcastHashJoin" in plan

    eng_ref = _mk_engine(spark, fx, os.path.join(tmp_root, "ref"))
    plan_ref = (
        eng_ref._active_scan(active, eng_ref.end_us)._jdf.queryExecution().toString()
    )
    assert f"IN ({active[0]}" in plan_ref  # default path still IN-list-prunes

    eng.run()
    _assert_matches_oracle(eng, fx)


def test_schema_evolution_online_proto_wire(spark, tmp_root):
    """Additive schema evolution through the VECTORIZED proto decode:
    the new column's ColumnType announcement rides field-6 submessages,
    exercising the region-keyed coltypes memo across schema versions
    plus the engine's observe -> rollback -> re-merge retry, end-to-end
    against the pandas oracle (struct-wire evolution is covered by
    test_schema_evolution_online; this pins the r5 kernel path)."""
    from debezium_connector_spanner_spark.fixtures.generator import write_proto_log

    cfg = GeneratorConfig(
        n_repos=8,
        paths_per_repo=5,
        hot_repos=2,
        events_per_key_mean=4,
        schema_evolution=True,
    )
    fx = os.path.join(tmp_root, "fx-evo-proto")
    write_fixture(fx, cfg)
    write_proto_log(fx)
    eng = _mk_engine(spark, fx, tmp_root, cfg=cfg, wire_format="proto")
    eng.run()
    got = _final_pd(eng)
    assert "stars" in got.columns
    want = fold_final_state(fx).sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)

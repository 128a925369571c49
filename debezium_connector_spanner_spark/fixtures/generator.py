"""Deterministic synthetic Spanner-style change-event log generator.

Produces (FIXTURES.md F1/F2/F3):
- a base ``repos`` table (pre-existing rows),
- a change-event log in the Spanner change-stream envelope with a
  partition DAG (root ``Parent0``, one split, one merge), heartbeats,
  ``child_partitions`` records, ``partition_end`` markers, exact
  duplicate records, multi-mod transactions, per-key overwrite chains,
  DELETE + re-INSERT, hot-repo key skew,
- optional additive schema evolution (add ``stars`` INT64, widen to
  FLOAT64) with a ``schema_log`` table.

Everything is a pure function of the seed: same config -> identical
bytes. Event semantics mirror /root/reference
db/model/event/DataChangeEvent.java:70-142 and db/model/Mod.java:18-96;
the DAG split/merge rules mirror db/model/ChildPartition.java:37-48 and
task/operation/FindPartitionForStreamingOperation.java:32-76 (a child
streams only after all parents finished).

DO NOT add wall-clock or nondeterministic inputs here: the resume /
replay tests depend on byte-stable fixtures.
"""

from __future__ import annotations

import hashlib
import json
import os
import random
from dataclasses import dataclass, field, asdict

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from debezium_connector_spanner_spark.sources.event_schema import (
    CHILD_PARTITIONS,
    DATA_CHANGE,
    HEARTBEAT,
    INITIAL_PARTITION_TOKEN,
    PARTITION_END,
    REPOS_SCHEMA_V1,
    REPOS_SCHEMA_V2,
    REPOS_SCHEMA_V3,
    TYPES_PROBE_SCHEMA,
)

EPOCH_MICROS = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z

VALUE_COLS_V1 = ["commit", "lang", "content"]
LANGS = ["python", "java", "go", "rust", "ts", "c", "scala", "ruby"]


@dataclass(frozen=True)
class DagNode:
    token: str
    t0: float  # active window start (fraction of timeline)
    t1: float  # active window end
    k0: float  # owned key-hash range start
    k1: float  # owned key-hash range end
    parents: tuple[str, ...]


# Fixed topology: root -> split(A,B) -> A splits (A1,A2) -> merge(A2,B)=M.
DAG: tuple[DagNode, ...] = (
    DagNode(INITIAL_PARTITION_TOKEN, 0.00, 0.10, 0.0, 1.0, ()),
    DagNode("t-A", 0.10, 0.55, 0.0, 0.5, (INITIAL_PARTITION_TOKEN,)),
    DagNode("t-B", 0.10, 0.70, 0.5, 1.0, (INITIAL_PARTITION_TOKEN,)),
    DagNode("t-A1", 0.55, 1.00, 0.0, 0.25, ("t-A",)),
    DagNode("t-A2", 0.55, 0.70, 0.25, 0.5, ("t-A",)),
    DagNode("t-M", 0.70, 1.00, 0.25, 1.0, ("t-A2", "t-B")),
)


def owner_token(key_frac: float, time_frac: float) -> str:
    for n in DAG:
        if n.t0 <= time_frac < n.t1 and n.k0 <= key_frac < n.k1:
            return n.token
    # time_frac == 1.0 edge: use the last generation
    for n in DAG:
        if n.t1 >= 1.0 and n.k0 <= key_frac < n.k1:
            return n.token
    raise AssertionError((key_frac, time_frac))


@dataclass(frozen=True)
class GeneratorConfig:
    seed: int = 42
    n_repos: int = 20
    paths_per_repo: int = 10          # cold repos; hot repos get 6x
    hot_repos: int = 2                # skew: first K repos are hot
    events_per_key_mean: int = 4
    duration_s: int = 3600
    heartbeats_per_token: int = 8
    pre_exist_frac: float = 0.30
    dup_frac: float = 0.02            # exact duplicate records (O12)
    multi_mod_frac: float = 0.06      # two mods in one record
    delete_frac: float = 0.15
    value_capture_type: str = "OLD_AND_NEW_VALUES"  # or NEW_ROW
    # slice of records emitted with NEW_VALUES capture (old_values always
    # null; op must come from mod_type — ValueCaptureType.java:12-18)
    new_values_frac: float = 0.12
    # UPDATEs that set a column to an explicit JSON null (the engine must
    # apply the null, not keep the stale value)
    null_update_frac: float = 0.10
    fixture_version: int = 3          # bump to invalidate cached fixtures
    # second change-stream table with every supported type code (multi-
    # table routing + DataTypesIT-style end-to-end fidelity); 0 = disabled
    types_probe_keys: int = 0
    # mega-hot single key: this many extra UPDATE events on ONE (repo,
    # path) — the north rule's "hot-key repos" skew shape, used by the
    # fused-vs-salted fold benchmark (tools/bench_skew.py); 0 = disabled
    hot_key_events: int = 0
    schema_evolution: bool = False
    evolve_add_at: float = 0.40       # stars INT64 appears
    evolve_widen_at: float = 0.75     # stars -> FLOAT64
    content_len_max: int = 400
    # Row-group sizing for the per-token event files. None (default) =
    # scale-adaptive: ~256 row groups per token file, clamped to
    # [4096, 131072] rows — see write_fixture. Small row groups keep the
    # log splittable (scan parallelism must come from row-group splits,
    # not partition-token count: few, coarse tokens), so the 4096 floor
    # preserves the measured sf0.1 wave packing; but a FIXED 4096 at sf1
    # gives the 2.8GB hot-token file 3000+ row groups whose footer every
    # 2MB split re-parses (~0.3s each — the r5 bench-sf1 note measured
    # 50s for an EMPTY pruned window at that layout), so the cap on
    # groups-per-file bounds footer cost as the log grows 100x. An int
    # pins the legacy fixed size.
    row_group_size: int | None = None

    def keys(self) -> list[tuple[str, str]]:
        out = []
        for r in range(self.n_repos):
            repo = f"org{r:03d}/project-{r}"
            npaths = self.paths_per_repo * (6 if r < self.hot_repos else 1)
            for p in range(npaths):
                out.append((repo, f"src/mod{p // 25}/file_{p:04d}.py"))
        return out


def _h64(*parts) -> int:
    h = hashlib.blake2b("|".join(str(p) for p in parts).encode(), digest_size=8)
    return int.from_bytes(h.digest(), "big")


def _hex40(*parts) -> str:
    return hashlib.blake2b("|".join(str(p) for p in parts).encode(), digest_size=20).hexdigest()


def _content(repo: str, path: str, j: int, cfg: GeneratorConfig) -> str:
    body_len = 40 + _h64("len", cfg.seed, repo, path, j) % cfg.content_len_max
    filler = hashlib.blake2b(
        f"{cfg.seed}|{repo}|{path}|{j}".encode(), digest_size=32
    ).hexdigest()
    body = (filler * (body_len // len(filler) + 1))[:body_len]
    return f"// {repo}/{path} rev {j}\n{body}\n"


def _schema_at(cfg: GeneratorConfig, tf: float):
    if not cfg.schema_evolution or tf < cfg.evolve_add_at:
        return REPOS_SCHEMA_V1
    if tf < cfg.evolve_widen_at:
        return REPOS_SCHEMA_V2
    return REPOS_SCHEMA_V3


class FixtureBuilder:
    """Builds the event rows + base table + expected final state."""

    def __init__(self, cfg: GeneratorConfig):
        self.cfg = cfg
        self.rows: list[dict] = []
        self.base_rows: list[dict] = []
        self.final: dict[tuple[str, str], dict] = {}
        self.types_final: dict[int, dict] = {}
        self.stats = {"data_change": 0, "duplicates": 0, "mods": 0}
        # large parallel builds spill worker rows as per-token Arrow chunk
        # files instead of pickling them back (see _build_parallel)
        self.spill_dir: str | None = None
        self.spilled_events: int = 0

    # ------------------------------------------------------------- events
    def _emit(self, **kw):
        row = {
            "record_type": None,
            "partition_token": None,
            "commit_ts": None,
            "record_sequence": None,
            "server_txn_id": None,
            "is_last_in_txn_in_partition": None,
            "table_name": None,
            "column_types": None,
            "mods": None,
            "mod_type": None,
            "value_capture_type": None,
            "number_of_records_in_transaction": None,
            "number_of_partitions_in_transaction": None,
            "transaction_tag": None,
            "is_system_transaction": None,
            "child_partitions": None,
        }
        row.update(kw)
        self.rows.append(row)
        return row

    def _emit_key_chain(self, key_id: int, repo: str, path: str):
        cfg = self.cfg
        rnd = random.Random(_h64("chain", cfg.seed, repo, path))
        key_frac = _h64("kf", cfg.seed, repo, path) / 2**64
        m = 1 + rnd.randrange(2 * cfg.events_per_key_mean - 1)
        fracs = sorted(rnd.uniform(0.002, 0.995) for _ in range(m))
        micros = []
        last = -1
        for f in fracs:
            us = int(f * cfg.duration_s * 1_000_000)
            if us <= last:
                us = last + 1
            micros.append(us)
            last = us

        pre_exist = rnd.random() < cfg.pre_exist_frac
        state: dict | None = None
        if pre_exist:
            state = {
                "commit": _hex40(cfg.seed, repo, path, "base"),
                "lang": LANGS[_h64("lang", cfg.seed, repo) % len(LANGS)],
                "content": _content(repo, path, -1, cfg),
            }
            self.base_rows.append({"repo": repo, "path": path, **state})

        for j, us in enumerate(micros):
            tf = us / (cfg.duration_s * 1_000_000)
            schema = _schema_at(cfg, tf)
            vcols = schema.value_columns
            token = owner_token(key_frac, tf)
            vct = cfg.value_capture_type
            if vct == "OLD_AND_NEW_VALUES" and rnd.random() < cfg.new_values_frac:
                vct = "NEW_VALUES"  # per-record capture slice
            n_mods = 2 if rnd.random() < cfg.multi_mod_frac and state is not None else 1
            mods = []
            mod_types = []
            for mn in range(n_mods):
                if state is None:
                    op = "INSERT"
                elif mn == 0 and rnd.random() < cfg.delete_frac:
                    op = "DELETE"
                else:
                    op = "UPDATE" if state is not None else "INSERT"
                new_row = None
                if op == "DELETE":
                    old = None if vct == "NEW_VALUES" else dict(state)
                    state = None
                    mods.append(self._mod(repo, path, None, old))
                elif op == "INSERT":
                    new_row = self._fresh_row(repo, path, j * 2 + mn, tf, rnd)
                    state = new_row
                    mods.append(self._mod(repo, path, dict(new_row), None))
                else:  # UPDATE
                    changed = rnd.sample(vcols, 1 + rnd.randrange(len(vcols)))
                    fresh = self._fresh_row(repo, path, j * 2 + mn, tf, rnd)
                    old = {c: state.get(c) for c in changed}
                    new = {c: fresh[c] for c in changed}
                    if "lang" in new and rnd.random() < cfg.null_update_frac:
                        new["lang"] = None  # explicit-null column write
                    state = {**{c: state.get(c) for c in vcols}, **new}
                    if vct == "NEW_ROW":
                        mods.append(self._mod(repo, path, dict(state), None))
                    elif vct == "NEW_VALUES":
                        mods.append(self._mod(repo, path, new, None))
                    else:
                        mods.append(self._mod(repo, path, new, old))
                mod_types.append(op)
                self.stats["mods"] += 1

            row = self._emit(
                record_type=DATA_CHANGE,
                partition_token=token,
                commit_ts=us,
                # arbitrary-length numeric string (not zero-padded), as real
                # Spanner emits: '10' must order after '9' numerically
                record_sequence=str(_h64("rs", cfg.seed, repo, path, j) % 10**8),
                server_txn_id=f"txn-{key_id:08d}-{j:04d}",
                is_last_in_txn_in_partition=True,
                table_name="repos",
                column_types=schema.column_types_json(),
                mods=mods,
                mod_type=mod_types[-1],
                value_capture_type=vct,
                number_of_records_in_transaction=1,
                number_of_partitions_in_transaction=1,
                transaction_tag="",
                is_system_transaction=False,
            )
            self.stats["data_change"] += 1
            if rnd.random() < cfg.dup_frac:
                self.rows.append(dict(row))
                self.stats["duplicates"] += 1

        if state is not None:
            self.final[(repo, path)] = dict(state)

    # --------------------------------------------------- types_probe table
    TYPES_VALUE_COLS = [c.name for c in TYPES_PROBE_SCHEMA.columns if not c.is_primary_key]

    def _fresh_types_row(self, key_id: int, rev: int) -> dict:
        """Deterministic typed row; float values are dyadic rationals so
        both engines and the oracle agree bit-for-bit."""
        import base64 as _b64

        h = _h64("tp", self.cfg.seed, key_id, rev)
        return {
            "c_string": f"s-{key_id}-{rev}",
            "c_int64": h % 100_000,
            "c_float64": (h % 100_000) / 8.0,
            "c_float32": (h % 1024) / 4.0,
            "c_bool": h % 2 == 0,
            "c_bytes": _b64.b64encode(
                hashlib.blake2b(f"b|{key_id}|{rev}".encode(), digest_size=12).digest()
            ).decode(),
            "c_numeric": f"{h % 10**6}.{h % 97:02d}",
            "c_date": f"20{10 + h % 20:02d}-{1 + h % 12:02d}-{1 + h % 28:02d}",
            "c_timestamp": f"2026-01-01T{h % 24:02d}:{h % 60:02d}:00Z",
            "c_json": json.dumps({"k": h % 10, "tag": f"t{rev}"}, sort_keys=True),
            "c_arr_str": [f"a{h % 7}", None, f"b{rev}"],
            "c_arr_int": [h % 13, (h // 7) % 13],
            "c_tokenlist": f"tl:{h % 5}:{h % 97}",
            "c_uuid": (
                lambda d: f"{d[:8]}-{d[8:12]}-{d[12:16]}-{d[16:20]}-{d[20:32]}"
            )(hashlib.blake2b(f"u|{key_id}|{rev}".encode(), digest_size=16).hexdigest()),
            "c_arr_bytes": [
                _b64.b64encode(
                    hashlib.blake2b(f"ab|{key_id}|{rev}|{j}".encode(), digest_size=6).digest()
                ).decode()
                for j in range(1 + h % 3)
            ],
        }

    def _emit_types_chain(self, key_id: int):
        """INSERT/UPDATE/DELETE chain for one types_probe key, same DAG
        token ownership + duplicate semantics as the repos chains."""
        cfg = self.cfg
        rnd = random.Random(_h64("tchain", cfg.seed, key_id))
        key_frac = _h64("tkf", cfg.seed, key_id) / 2**64
        m = 1 + rnd.randrange(2 * cfg.events_per_key_mean - 1)
        fracs = sorted(rnd.uniform(0.002, 0.995) for _ in range(m))
        micros, last = [], -1
        for f in fracs:
            us = int(f * cfg.duration_s * 1_000_000)
            if us <= last:
                us = last + 1
            micros.append(us)
            last = us

        keys = {"id": key_id}
        state: dict | None = None
        for j, us in enumerate(micros):
            tf = us / (cfg.duration_s * 1_000_000)
            token = owner_token(key_frac, tf)
            if state is None:
                op = "INSERT"
            elif rnd.random() < cfg.delete_frac:
                op = "DELETE"
            else:
                op = "UPDATE"
            if op == "DELETE":
                old = dict(state)
                state = None
                mod = self._mod_raw(keys, None, old)
            elif op == "INSERT":
                state = self._fresh_types_row(key_id, j)
                mod = self._mod_raw(keys, dict(state), None)
            else:
                changed = rnd.sample(
                    self.TYPES_VALUE_COLS, 1 + rnd.randrange(len(self.TYPES_VALUE_COLS))
                )
                fresh = self._fresh_types_row(key_id, j)
                old = {c: state.get(c) for c in changed}
                new = {c: fresh[c] for c in changed}
                if "c_string" in new and rnd.random() < cfg.null_update_frac:
                    new["c_string"] = None  # explicit-null write
                state = {**state, **new}
                mod = self._mod_raw(keys, new, old)
            row = self._emit(
                record_type=DATA_CHANGE,
                partition_token=token,
                commit_ts=us,
                record_sequence=str(_h64("trs", cfg.seed, key_id, j) % 10**8),
                server_txn_id=f"ttxn-{key_id:08d}-{j:04d}",
                is_last_in_txn_in_partition=True,
                table_name="types_probe",
                column_types=TYPES_PROBE_SCHEMA.column_types_json(),
                mods=[mod],
                mod_type=op,
                value_capture_type="OLD_AND_NEW_VALUES",
                number_of_records_in_transaction=1,
                number_of_partitions_in_transaction=1,
                transaction_tag="",
                is_system_transaction=False,
            )
            self.stats["data_change"] += 1
            self.stats["mods"] += 1
            if rnd.random() < cfg.dup_frac:
                self.rows.append(dict(row))
                self.stats["duplicates"] += 1
        if state is not None:
            self.types_final[key_id] = dict(state)

    def _emit_hot_key(self):
        """One mega-key receiving cfg.hot_key_events UPDATEs spread over
        the whole timeline (every partition token that owns its key-hash
        range sees a slice) — the skew fixture for fold_changes_salted."""
        cfg = self.cfg
        repo, path = "org-hot/mega-repo", "src/hot_file.py"
        key_frac = _h64("kf", cfg.seed, repo, path) / 2**64
        total_us = cfg.duration_s * 1_000_000
        n = cfg.hot_key_events
        state = {
            "commit": _hex40(cfg.seed, repo, path, "hot-base"),
            "lang": "python",
            "content": _content(repo, path, -1, cfg),
        }
        self.base_rows.append({"repo": repo, "path": path, **state})
        step = max(1, (total_us - 2) // n)
        us = 1
        for j in range(n):
            tf = us / total_us
            changed = "commit" if j % 3 else "content"
            val = (
                _hex40(cfg.seed, repo, path, j)
                if changed == "commit"
                else _content(repo, path, j, cfg)
            )
            new = {changed: val}
            old = {changed: state[changed]}
            state[changed] = val
            self._emit(
                record_type=DATA_CHANGE,
                partition_token=owner_token(key_frac, min(tf, 0.999)),
                commit_ts=us,
                record_sequence=str(j + 1),
                server_txn_id=f"hot-{j:09d}",
                is_last_in_txn_in_partition=True,
                table_name="repos",
                column_types=REPOS_SCHEMA_V1.column_types_json(),
                mods=[self._mod_raw({"repo": repo, "path": path}, new, old)],
                mod_type="UPDATE",
                value_capture_type="OLD_AND_NEW_VALUES",
                number_of_records_in_transaction=1,
                number_of_partitions_in_transaction=1,
                transaction_tag="",
                is_system_transaction=False,
            )
            self.stats["data_change"] += 1
            self.stats["mods"] += 1
            us += step
        self.final[(repo, path)] = dict(state)

    def _mod_raw(self, keys: dict, new: dict | None, old: dict | None) -> dict:
        return {
            "keys": json.dumps(keys, sort_keys=True),
            "new_values": None if new is None else json.dumps(new, sort_keys=True),
            "old_values": None if old is None else json.dumps(old, sort_keys=True),
        }

    def _fresh_row(self, repo, path, rev, tf, rnd) -> dict:
        cfg = self.cfg
        row = {
            "commit": _hex40(cfg.seed, repo, path, rev),
            "lang": LANGS[_h64("lang", cfg.seed, repo) % len(LANGS)],
            "content": _content(repo, path, rev, cfg),
        }
        if cfg.schema_evolution and tf >= cfg.evolve_add_at:
            if tf >= cfg.evolve_widen_at:
                row["stars"] = rnd.randrange(0, 5000) + 0.5  # FLOAT64 epoch
            else:
                row["stars"] = rnd.randrange(0, 5000)  # INT64 epoch: JSON int
        return row

    def _mod(self, repo, path, new: dict | None, old: dict | None) -> dict:
        return {
            "keys": json.dumps({"repo": repo, "path": path}, sort_keys=True),
            "new_values": None if new is None else json.dumps(new, sort_keys=True),
            "old_values": None if old is None else json.dumps(old, sort_keys=True),
        }

    # ------------------------------------------- DAG control records
    def _emit_control(self):
        cfg = self.cfg
        total_us = cfg.duration_s * 1_000_000

        def us(frac: float) -> int:
            return min(int(frac * total_us), total_us - 1)

        children_of: dict[str, list[DagNode]] = {}
        for n in DAG:
            for p in n.parents:
                children_of.setdefault(p, []).append(n)

        for n in DAG:
            schema = _schema_at(cfg, n.t0)
            # heartbeats across the active window
            span = n.t1 - n.t0
            for k in range(1, cfg.heartbeats_per_token + 1):
                tf = n.t0 + span * k / (cfg.heartbeats_per_token + 1)
                self._emit(
                    record_type=HEARTBEAT,
                    partition_token=n.token,
                    commit_ts=us(tf),
                    record_sequence=f"hb{k:06d}",
                    table_name="repos",
                    column_types=schema.column_types_json(),
                )
            # child partition records: every parent of a child emits the
            # child with its FULL parent set (Spanner emits the record in
            # each parent's stream; ChangeStreamRecordMapper.java:583-587)
            for child in children_of.get(n.token, []):
                self._emit(
                    record_type=CHILD_PARTITIONS,
                    partition_token=n.token,
                    commit_ts=us(child.t0),
                    record_sequence="cp000001",
                    table_name="repos",
                    column_types=schema.column_types_json(),
                    child_partitions=[
                        {
                            "token": child.token,
                            "parent_partition_tokens": list(child.parents),
                        }
                    ],
                )
            # end-of-partition marker (SpannerChangeStreamService.java:97)
            self._emit(
                record_type=PARTITION_END,
                partition_token=n.token,
                commit_ts=us(n.t1) if n.t1 < 1.0 else total_us - 1,
                record_sequence="zz999999",
                table_name="repos",
                column_types=schema.column_types_json(),
            )

    def build(
        self, parallel: bool | None = None, spill_dir: str | None = None
    ) -> "FixtureBuilder":
        keys = self.cfg.keys()
        if parallel is None:
            parallel = len(keys) > 20_000
        if parallel:
            self._build_parallel(keys, spill_dir=spill_dir)
        else:
            for key_id, (repo, path) in enumerate(keys):
                self._emit_key_chain(key_id, repo, path)
        for k in range(self.cfg.types_probe_keys):
            self._emit_types_chain(k)
        if self.cfg.hot_key_events:
            self._emit_hot_key()
        self._emit_control()
        # stable global order: (commit_ts, token, record_sequence)
        self.rows.sort(
            key=lambda r: (r["commit_ts"], r["partition_token"], r["record_sequence"] or "")
        )
        return self

    def _build_parallel(
        self, keys: list[tuple[str, str]], spill_dir: str | None = None
    ) -> None:
        """Per-key chains are pure functions of (cfg, key) — fan out over
        processes and merge. Output is identical to the serial path: the
        global key_id mapping is preserved and the final global sort
        restores a canonical order.

        With ``spill_dir`` set, each worker converts its rows to Arrow and
        writes per-token chunk parquet files there instead of pickling the
        row dicts back through the Pool — at 10M+ events the IPC transfer
        and the parent-side dict sort dominate wall time otherwise.
        ``write_fixture`` then merges the chunks columnar-side."""
        import multiprocessing as mp

        n_workers = min(16, mp.cpu_count())
        chunks = [
            (self.cfg, i, n_workers, keys[i::n_workers], spill_dir)
            for i in range(n_workers)
        ]
        self.spill_dir = spill_dir
        with mp.get_context("fork").Pool(n_workers) as pool:
            for rows, n_spilled, base_rows, final, stats in pool.map(
                _chain_chunk, chunks
            ):
                if rows:
                    self.rows.extend(rows)
                self.spilled_events += n_spilled
                self.base_rows.extend(base_rows)
                self.final.update(final)
                for k, v in stats.items():
                    self.stats[k] += v


def _chain_chunk(args):
    """Worker: build the event chains for a strided slice of the keys."""
    cfg, start, step, keys, spill_dir = args
    b = FixtureBuilder(cfg)
    for j, (repo, path) in enumerate(keys):
        b._emit_key_chain(start + j * step, repo, path)
    final = {k: v for k, v in b.final.items()}
    if spill_dir is None:
        return b.rows, 0, b.base_rows, final, b.stats
    by_token: dict[str, list[dict]] = {}
    for r in b.rows:
        by_token.setdefault(r["partition_token"], []).append(r)
    for token, rows in by_token.items():
        d = os.path.join(spill_dir, token)
        os.makedirs(d, exist_ok=True)
        pq.write_table(
            _events_table(rows), os.path.join(d, f"chunk-{start:02d}.parquet")
        )
    return None, len(b.rows), b.base_rows, final, b.stats


# ------------------------------------------------------------------ arrow io
_MOD_T = pa.struct(
    [("keys", pa.string()), ("new_values", pa.string()), ("old_values", pa.string())]
)
_CP_T = pa.struct(
    [("token", pa.string()), ("parent_partition_tokens", pa.list_(pa.string()))]
)
EVENTS_ARROW_SCHEMA = pa.schema(
    [
        ("record_type", pa.string()),
        ("commit_ts", pa.timestamp("us", tz="UTC")),
        ("record_sequence", pa.string()),
        ("server_txn_id", pa.string()),
        ("is_last_in_txn_in_partition", pa.bool_()),
        ("table_name", pa.string()),
        ("column_types", pa.string()),
        ("mods", pa.list_(_MOD_T)),
        ("mod_type", pa.string()),
        ("value_capture_type", pa.string()),
        ("number_of_records_in_transaction", pa.int64()),
        ("number_of_partitions_in_transaction", pa.int64()),
        ("transaction_tag", pa.string()),
        ("is_system_transaction", pa.bool_()),
        ("child_partitions", pa.list_(_CP_T)),
    ]
)


def _large_type(t: pa.DataType) -> pa.DataType:
    """Recursively swap 32-bit-offset string/list types for their large
    variants so a multi-GB per-token concat+sort doesn't overflow Arrow's
    int32 offsets (parquet's physical encoding is identical either way)."""
    if pa.types.is_string(t):
        return pa.large_string()
    if pa.types.is_list(t):
        return pa.large_list(_large_type(t.value_type))
    if pa.types.is_struct(t):
        return pa.struct([f.with_type(_large_type(f.type)) for f in t])
    return t


def _to_large(t: pa.Table) -> pa.Table:
    return t.cast(pa.schema([f.with_type(_large_type(f.type)) for f in t.schema]))


def _events_table(rows: list[dict]) -> pa.Table:
    cols = {}
    for f in EVENTS_ARROW_SCHEMA:
        if f.name == "commit_ts":
            vals = [EPOCH_MICROS + r["commit_ts"] for r in rows]
        else:
            vals = [r[f.name] for r in rows]
        cols[f.name] = pa.array(vals, type=f.type)
    return pa.table(cols, schema=EVENTS_ARROW_SCHEMA)


def write_fixture(out_dir: str, cfg: GeneratorConfig, force: bool = False) -> dict:
    """Generate + write a fixture; idempotent (skips if manifest matches)."""
    manifest_path = os.path.join(out_dir, "manifest.json")
    cfg_json = json.dumps(asdict(cfg), sort_keys=True)
    if not force and os.path.exists(manifest_path):
        with open(manifest_path) as f:
            m = json.load(f)
        if m.get("config_json") == cfg_json:
            return m

    tmp = out_dir + ".tmp"
    spill = out_dir + ".spill"
    import shutil

    for d in (tmp, spill):
        if os.path.exists(d):
            shutil.rmtree(d)
    os.makedirs(os.path.join(tmp, "events"), exist_ok=True)
    os.makedirs(spill, exist_ok=True)

    b = FixtureBuilder(cfg).build(spill_dir=spill)

    # one sorted file per partition token -> token-level partition pruning
    # + commit_ts row-group pruning on the scan path. Parent-built rows
    # (control records, types probe, hot key — or everything on the serial
    # path) merge with the workers' spilled Arrow chunks columnar-side.
    by_token: dict[str, list[dict]] = {}
    for r in b.rows:
        by_token.setdefault(r["partition_token"], []).append(r)
    spilled_tokens = set(os.listdir(spill))
    for token in sorted(set(by_token) | spilled_tokens):
        parts = []
        if token in by_token:
            parts.append(_to_large(_events_table(by_token[token])))
        tok_spill = os.path.join(spill, token)
        if token in spilled_tokens:
            for fn in sorted(os.listdir(tok_spill)):
                parts.append(_to_large(pq.read_table(os.path.join(tok_spill, fn))))
        t = pa.concat_tables(parts)
        # same effective order as the serial path's global
        # (commit_ts, token, record_sequence-or-"") sort restricted to one
        # token; null rs (heartbeats/child records) sorts first like ""
        t = t.sort_by(
            [("commit_ts", "ascending"), ("record_sequence", "ascending")],
            null_placement="at_start",
        )
        d = os.path.join(tmp, "events", f"partition_token={token}")
        os.makedirs(d, exist_ok=True)
        # scale-adaptive row groups (cfg.row_group_size=None): ~256 groups
        # per token file keeps commit_ts row-group pruning fine-grained
        # while bounding the footer a scan split must re-parse; the 4096
        # floor preserves small-fixture splittability (see GeneratorConfig)
        rg = cfg.row_group_size or min(max(4096, -(-t.num_rows // 256)), 131072)
        pq.write_table(
            t,
            os.path.join(d, "part-0.parquet"),
            row_group_size=rg,
        )
    shutil.rmtree(spill)

    base_cols = ["repo", "path", "commit", "lang", "content"]
    base = pd.DataFrame(b.base_rows, columns=base_cols).sort_values(["repo", "path"])
    pq.write_table(
        pa.Table.from_pandas(base, preserve_index=False),
        os.path.join(tmp, "base_repos.parquet"),
    )

    if cfg.schema_evolution:
        total_us = cfg.duration_s * 1_000_000
        sl = pa.table(
            {
                "effective_ts": pa.array(
                    [
                        EPOCH_MICROS,
                        EPOCH_MICROS + int(cfg.evolve_add_at * total_us),
                        EPOCH_MICROS + int(cfg.evolve_widen_at * total_us),
                    ],
                    type=pa.timestamp("us", tz="UTC"),
                ),
                "table_name": ["repos"] * 3,
                "columns": [
                    REPOS_SCHEMA_V1.column_types_json(),
                    REPOS_SCHEMA_V2.column_types_json(),
                    REPOS_SCHEMA_V3.column_types_json(),
                ],
            }
        )
        pq.write_table(sl, os.path.join(tmp, "schema_log.parquet"))

    if cfg.types_probe_keys:
        import base64 as _b64

        types_arrow = pa.schema(
            [
                ("id", pa.int64()),
                ("c_string", pa.string()),
                ("c_int64", pa.int64()),
                ("c_float64", pa.float64()),
                ("c_float32", pa.float32()),
                ("c_bool", pa.bool_()),
                ("c_bytes", pa.binary()),
                ("c_numeric", pa.string()),
                ("c_date", pa.string()),
                ("c_timestamp", pa.string()),
                ("c_json", pa.string()),
                ("c_arr_str", pa.list_(pa.string())),
                ("c_arr_int", pa.list_(pa.int64())),
                ("c_tokenlist", pa.string()),
                ("c_uuid", pa.string()),
                ("c_arr_bytes", pa.list_(pa.binary())),
            ]
        )
        trows = []
        for k, v in sorted(b.types_final.items()):
            r = {"id": k, **v}
            if r.get("c_bytes") is not None:
                r["c_bytes"] = _b64.b64decode(r["c_bytes"])  # physical shape
            if r.get("c_arr_bytes") is not None:
                r["c_arr_bytes"] = [
                    None if x is None else _b64.b64decode(x) for x in r["c_arr_bytes"]
                ]
            trows.append(r)
        cols = {
            f.name: pa.array([r.get(f.name) for r in trows], type=f.type)
            for f in types_arrow
        }
        pq.write_table(
            pa.table(cols, schema=types_arrow),
            os.path.join(tmp, "expected_final_types.parquet"),
        )

    # generator-side expected final state (independent fold oracle lives
    # in fixtures/oracle.py)
    fcols = base_cols + (["stars"] if cfg.schema_evolution else [])
    frows = [
        {"repo": k[0], "path": k[1], **{c: v.get(c) for c in fcols[2:]}}
        for k, v in sorted(b.final.items())
    ]
    fdf = pd.DataFrame(frows, columns=fcols)
    if "stars" in fdf.columns:
        fdf["stars"] = fdf["stars"].astype("float64")
    pq.write_table(
        pa.Table.from_pandas(fdf, preserve_index=False),
        os.path.join(tmp, "expected_final.parquet"),
    )

    manifest = {
        "config_json": cfg_json,
        "events": len(b.rows) + b.spilled_events,
        "data_change": b.stats["data_change"],
        "duplicates": b.stats["duplicates"],
        "mods": b.stats["mods"],
        "keys": len(cfg.keys()),
        "final_rows": len(b.final),
        "base_rows": len(b.base_rows),
        "epoch_micros": EPOCH_MICROS,
        "duration_s": cfg.duration_s,
    }
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)

    import shutil

    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    os.replace(tmp, out_dir)
    return manifest


# canonical fixture dirs inside the repo (gitignored)
FIXTURE_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".fixtures")


def fixture_config_for_sf(sf_dir: str, schema_evolution: bool = False) -> GeneratorConfig:
    """Scale the fixture off the driver sf dir name (sf0.001/0.01/0.1)."""
    name = os.path.basename(sf_dir.rstrip("/")) or "sf0.01"
    sf = float(name.replace("sf", "")) if name.startswith("sf") else 0.01
    scale = max(1, int(sf * 1000))  # 1 / 10 / 100
    return GeneratorConfig(
        n_repos=10 * scale,
        paths_per_repo=8,
        hot_repos=max(1, scale // 2),
        schema_evolution=schema_evolution,
        types_probe_keys=24 * scale,  # second table: multi-table routing
    )


def ensure_fixture(sf_dir: str, schema_evolution: bool = False) -> str:
    name = os.path.basename(sf_dir.rstrip("/")) or "sf0.01"
    suffix = "-evo" if schema_evolution else ""
    out = os.path.join(FIXTURE_ROOT, f"{name}{suffix}")
    write_fixture(out, fixture_config_for_sf(sf_dir, schema_evolution))
    return out


def write_pg_json_log(fx_dir: str, force: bool = False) -> str:
    """Derive the PG-dialect wire log from a canonical fixture: each change
    record re-encoded as ONE JSON document keyed by its record kind, the
    shape the reference's PostgreSQL dialect returns from the TVF
    (/root/reference db/mapper/ChangeStreamRecordMapper.java:58-90,
    332-393; mods carry keys/new_values/old_values as nested JSON objects,
    not strings). Written beside the canonical log as
    ``events_pg/partition_token=<tok>/part-0.parquet`` with
    (commit_ts, record_json) — same token-dir + ts-sorted layout, so the
    engine's three-layer scan pruning is format-independent."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out_root = os.path.join(fx_dir, "events_pg")
    if os.path.exists(out_root) and not force:
        return out_root
    ev_root = os.path.join(fx_dir, "events")

    def iso(ts) -> str:
        return ts.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"

    for d in sorted(os.listdir(ev_root)):
        if not d.startswith("partition_token="):
            continue
        tbl = pq.read_table(os.path.join(ev_root, d))
        pdf = tbl.to_pandas()
        docs = []
        for r in pdf.itertuples(index=False):
            rt = r.record_type
            if rt == DATA_CHANGE:
                doc = {
                    "data_change_record": {
                        "commit_timestamp": iso(r.commit_ts),
                        "record_sequence": r.record_sequence,
                        "server_transaction_id": r.server_txn_id,
                        "is_last_record_in_transaction_in_partition": bool(
                            r.is_last_in_txn_in_partition
                        ),
                        "table_name": r.table_name,
                        "column_types": json.loads(r.column_types),
                        "mods": [
                            {
                                "keys": json.loads(m["keys"]),
                                "new_values": None
                                if m["new_values"] is None
                                else json.loads(m["new_values"]),
                                "old_values": None
                                if m["old_values"] is None
                                else json.loads(m["old_values"]),
                            }
                            for m in r.mods
                        ],
                        "mod_type": r.mod_type,
                        "value_capture_type": r.value_capture_type,
                        "number_of_records_in_transaction": int(
                            r.number_of_records_in_transaction
                        ),
                        "number_of_partitions_in_transaction": int(
                            r.number_of_partitions_in_transaction
                        ),
                        "transaction_tag": r.transaction_tag or "",
                        "is_system_transaction": bool(r.is_system_transaction),
                    }
                }
            elif rt == HEARTBEAT:
                doc = {"heartbeat_record": {"timestamp": iso(r.commit_ts)}}
            elif rt == CHILD_PARTITIONS:
                doc = {
                    "child_partitions_record": {
                        "start_timestamp": iso(r.commit_ts),
                        "record_sequence": r.record_sequence or "0",
                        "child_partitions": [
                            {
                                "token": c["token"],
                                "parent_partition_tokens": list(
                                    c["parent_partition_tokens"]
                                ),
                            }
                            for c in (r.child_partitions or [])
                        ],
                    }
                }
            else:  # log-encoded end marker (see sources/pg_json.py docstring)
                doc = {"partition_end_record": {"end_timestamp": iso(r.commit_ts)}}
            docs.append(json.dumps(doc, separators=(",", ":")))
        out_d = os.path.join(out_root, d)
        os.makedirs(out_d, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "commit_ts": pa.array(pdf["commit_ts"], type=pa.timestamp("us", tz="UTC")),
                    "record_json": pa.array(docs, type=pa.string()),
                }
            ),
            os.path.join(out_d, "part-0.parquet"),
            row_group_size=16384,
        )
    return out_root


def write_proto_log(fx_dir: str, force: bool = False) -> str:
    """Derive the proto-wire log from a canonical fixture: each change
    record re-encoded as ONE serialized proto3 ChangeStreamRecord
    (sources/proto_wire.py holds the message layout; reference demux
    /root/reference db/mapper/ChangeStreamRecordMapper.java:482-494).
    Written beside the canonical log as
    ``events_proto/partition_token=<tok>/part-0.parquet`` with
    (commit_ts, record_bytes) — same token-dir + ts-sorted layout, so the
    engine's three-layer scan pruning is format-independent."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from debezium_connector_spanner_spark.sources.proto_wire import encode_record

    out_root = os.path.join(fx_dir, "events_proto")
    if os.path.exists(out_root) and not force:
        return out_root
    ev_root = os.path.join(fx_dir, "events")
    for d in sorted(os.listdir(ev_root)):
        if not d.startswith("partition_token="):
            continue
        pdf = pq.read_table(os.path.join(ev_root, d)).to_pandas()
        blobs = []
        for r in pdf.to_dict("records"):
            r["commit_ts_us"] = r["commit_ts"].value // 1000
            blobs.append(encode_record(r))
        out_d = os.path.join(out_root, d)
        os.makedirs(out_d, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "commit_ts": pa.array(
                        pdf["commit_ts"], type=pa.timestamp("us", tz="UTC")
                    ),
                    "record_bytes": pa.array(blobs, type=pa.binary()),
                }
            ),
            os.path.join(out_d, "part-0.parquet"),
            row_group_size=16384,
        )
    return out_root

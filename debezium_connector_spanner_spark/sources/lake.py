"""LakeTable — a minimal snapshot-versioned, bucketed parquet table.

The sandbox has no Iceberg/Delta jars, so we implement the subset of
lake-table semantics the CDC sink needs, with the same scale properties:

- **Atomic snapshot commits**: data files are written under unique
  snapshot dirs; a snapshot manifest (JSON) lists files per key-bucket;
  the CURRENT pointer is flipped with an atomic ``os.replace``. A crashed
  writer leaves orphan files that are never referenced (exactly-once).
- **Bucketed copy-on-write MERGE**: rows are hash-bucketed on the primary
  key. A batch only rewrites the buckets it touches; untouched buckets'
  file lists are carried forward by reference. At 100 TB this is the
  difference between O(delta) and O(table) per batch.
- **Additive schema evolution with cast-on-read**: each data file group
  records its schema id; reads group files by schema id and cast-union to
  the current schema (add column -> null backfill, INT64->FLOAT64 widen),
  mirroring Iceberg metadata-only evolution and the reference's additive
  SchemaMerger semantics (/root/reference
  db/metadata/SchemaMerger.java:24-53).
- **Snapshot rollback** for resume-from-checkpoint: the engine records
  the committed snapshot id in its checkpoint; on restart any newer
  (uncheckpointed) snapshot is discarded.

Parity notes: replaces the reference's Kafka sink + Connect offset
storage (processor/SpannerEventDispatcher.java:45-87,
context/offset/PartitionOffset.java:19-53) with lake-native equivalents.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

BUCKET_COL = "__bucket"
CDC_TS_COL = "__cdc_ts"
_LONG_MIN = -(1 << 63)

# fold flags carried by merge-on-read delta files (see commit_delta)
DELTA_FLAG_FIELDS = [
    T.StructField("_is_delete", T.BooleanType(), True),
    T.StructField("_had_delete", T.BooleanType(), True),
]


def _set_flag_fields(schema: T.StructType, key_cols: list[str]) -> list[T.StructField]:
    """Per-value-column written flags persisted with each delta row: True
    when the batch wrote the column (possibly to an explicit NULL). Old
    delta files without them read as NULL and fall back to value-non-null."""
    return [
        T.StructField(f"__set_{f.name}", T.BooleanType(), True)
        for f in schema.fields
        if f.name not in key_cols and f.name != CDC_TS_COL
    ]


def _entry(e) -> tuple:
    """Manifest file entry ->
    (rel_path, schema_id, rank, kind, commit_sid, n_write); accepts the
    legacy 2-tuple [path, schema_id] (rank-0 base) and 4/5-tuple forms
    (commit_sid unknown -> 0, which predates every live snapshot;
    n_write None -> written under the snapshot's current bucket count).

    ``n_write`` is the bucket count the file was PHYSICALLY written under;
    it differs from the snapshot's bucket count only after a metadata-only
    grow_buckets renumbering, and drives the read-time key filter."""
    if len(e) == 2:
        return e[0], e[1], 0, "base", 0, None
    if len(e) == 4:
        return (*e, 0, None)
    if len(e) == 5:
        return (*e, None)
    return tuple(e[:6])


def bucket_expr(key_cols: list[str], n_buckets: int):
    """Stable key->bucket hash. xxhash64 is deterministic across sessions
    and executors; NUL separator avoids ('ab','c') vs ('a','bc') collisions."""
    return F.pmod(
        F.xxhash64(F.concat_ws("\x00", *[F.col(c) for c in key_cols])),
        F.lit(n_buckets),
    ).cast("int")


class LakeTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        # committed snapshot manifests are immutable -> cache the parsed
        # JSON per sid so the per-batch bookkeeping (delta_depth, commit,
        # read) costs a dict lookup, not a reparse that grows with
        # buckets x files. Bounded LRU-ish: old sids fall out.
        self._snap_cache: dict[int, dict] = {}

    # ------------------------------------------------------------- meta
    @property
    def _meta_dir(self) -> str:
        return os.path.join(self.root, "_meta")

    def _snap_path(self, sid: int) -> str:
        return os.path.join(self._meta_dir, f"snap-{sid:08d}.json")

    def current_snapshot_id(self) -> int:
        with open(os.path.join(self._meta_dir, "CURRENT")) as f:
            return int(f.read().strip())

    def snapshot(self, sid: int | None = None) -> dict:
        if sid is None:
            sid = self.current_snapshot_id()
        snap = self._snap_cache.get(sid)
        if snap is None:
            with open(self._snap_path(sid)) as f:
                snap = json.load(f)
            self._cache_snap(sid, snap)
        return snap

    def _cache_snap(self, sid: int, snap: dict) -> None:
        self._snap_cache[sid] = snap
        while len(self._snap_cache) > 16:
            del self._snap_cache[min(self._snap_cache)]

    def _set_current(self, sid: int) -> None:
        tmp = os.path.join(self._meta_dir, f".CURRENT.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(str(sid))
        os.replace(tmp, os.path.join(self._meta_dir, "CURRENT"))

    def rollback(self, sid: int) -> None:
        """Point CURRENT at an older committed snapshot (resume path)."""
        if not os.path.exists(self._snap_path(sid)):
            raise ValueError(f"unknown snapshot {sid}")
        self._set_current(sid)

    # ------------------------------------------------------------ create
    @staticmethod
    def create(
        spark: SparkSession,
        root: str,
        schema: T.StructType,
        key_cols: list[str],
        n_buckets: int = 16,
        initial_df: DataFrame | None = None,
        overwrite: bool = False,
    ) -> "LakeTable":
        if os.path.exists(root):
            if not overwrite:
                raise FileExistsError(root)
            shutil.rmtree(root)
        os.makedirs(os.path.join(root, "_meta"))
        t = LakeTable(spark, root)
        snap = {
            "id": 0,
            "parent": None,
            "key_cols": key_cols,
            "n_buckets": n_buckets,
            "schema_id": 0,
            "schemas": {"0": schema.json()},
            "buckets": {},
            "summary": {"op": "create"},
        }
        if initial_df is not None:
            files = t._write_data_files(initial_df, schema, key_cols, n_buckets, 0)
            snap["buckets"] = {
                str(b): [[p, 0, 0, "base", 0] for p in ps] for b, ps in files.items()
            }
            snap["summary"]["rows_written"] = initial_df.count()
        with open(t._snap_path(0), "w") as f:
            json.dump(snap, f)
        t._set_current(0)
        return t

    # ------------------------------------------------------------- write
    def _write_data_files(
        self,
        df: DataFrame,
        schema: T.StructType,
        key_cols: list[str],
        n_buckets: int,
        snapshot_id: int,
        pre_bucketed: bool = False,
        sort: bool = True,
    ) -> dict[int, list[str]]:
        """Write df partitioned by key bucket; returns bucket -> rel paths.

        ``pre_bucketed=True``: the input is already hash-partitioned on the
        key bucket (the fold shuffle doubled as the bucket shuffle) — skip
        the extra exchange. ``sort=False`` skips within-file key clustering
        (delta files are short-lived; only base/compaction files benefit).
        """
        out = os.path.join(self.root, "data", f"snap-{snapshot_id:08d}-{uuid.uuid4().hex[:8]}")
        cols = [F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
        w = df.select(*cols, bucket_expr(key_cols, n_buckets).alias(BUCKET_COL))
        if not pre_bucketed:
            # co-locate each bucket into one task -> one file per touched
            # bucket; explicit numPartitions so AQE can't coalesce the
            # write into a few serial tasks. At cluster scale raise
            # n_buckets rather than files/bucket.
            w = w.repartition(n_buckets, F.col(BUCKET_COL))
        if sort:
            w = w.sortWithinPartitions(*key_cols)
        w.write.partitionBy(BUCKET_COL).parquet(out)
        files: dict[int, list[str]] = {}
        for d in os.listdir(out):
            if not d.startswith(f"{BUCKET_COL}="):
                continue
            b = int(d.split("=", 1)[1])
            for fn in sorted(os.listdir(os.path.join(out, d))):
                if fn.endswith(".parquet"):
                    files.setdefault(b, []).append(
                        os.path.relpath(os.path.join(out, d, fn), self.root)
                    )
        return files

    def _next_snapshot(self, schema: T.StructType | None):
        prev = self.snapshot()
        new_id = prev["id"] + 1
        schema = schema or self.schema()
        schema_id = prev["schema_id"]
        schemas = dict(prev["schemas"])
        if schemas[str(schema_id)] != schema.json():
            schema_id += 1
            while str(schema_id) in schemas:
                schema_id += 1
            schemas[str(schema_id)] = schema.json()
        return prev, new_id, schema, schema_id, schemas

    def _finish_snapshot(self, prev, new_id, schema_id, schemas, buckets, summary):
        snap = {
            "id": new_id,
            "parent": prev["id"],
            "key_cols": prev["key_cols"],
            "n_buckets": prev["n_buckets"],
            "schema_id": schema_id,
            "schemas": schemas,
            "buckets": buckets,
            "summary": summary or {},
        }
        with open(self._snap_path(new_id), "w") as f:
            json.dump(snap, f)
        self._cache_snap(new_id, snap)
        self._set_current(new_id)
        return new_id

    def commit_merge(
        self,
        merged_df: DataFrame,
        touched_buckets: list[int],
        schema: T.StructType | None = None,
        summary: dict | None = None,
    ) -> int:
        """Copy-on-write commit: rewrite touched buckets from merged_df,
        carry untouched buckets forward by reference."""
        prev, new_id, schema, schema_id, schemas = self._next_snapshot(schema)
        new_files = self._write_data_files(
            merged_df, schema, prev["key_cols"], prev["n_buckets"], new_id
        )
        buckets = {
            b: fs for b, fs in prev["buckets"].items() if int(b) not in set(touched_buckets)
        }
        for b in touched_buckets:
            buckets[str(b)] = [
                [p, schema_id, 0, "base", new_id] for p in new_files.get(b, [])
            ]
        return self._finish_snapshot(prev, new_id, schema_id, schemas, buckets, summary)

    def commit_delta(
        self,
        delta_df: DataFrame,
        touched_buckets: list[int],
        schema: T.StructType | None = None,
        summary: dict | None = None,
        pre_bucketed: bool = False,
    ) -> int:
        """Merge-on-read commit: APPEND folded delta files (including
        tombstones and fold flags) to the touched buckets — O(delta) bytes
        written, zero existing-data reads. ``read()`` folds base + deltas
        in rank order; ``compact()`` collapses them back to base files.

        This is the write path that survives 10^10-event scale: per-batch
        cost is proportional to the batch, and rewrite amplification is
        paid only at compaction cadence.
        """
        prev, new_id, schema, schema_id, schemas = self._next_snapshot(schema)
        extra = [f for f in DELTA_FLAG_FIELDS if f.name not in schema.names]
        extra += [
            f
            for f in _set_flag_fields(schema, prev["key_cols"])
            if f.name not in schema.names and f.name in delta_df.columns
        ]
        delta_schema = T.StructType(list(schema.fields) + extra)
        new_files = self._write_data_files(
            delta_df,
            delta_schema,
            prev["key_cols"],
            prev["n_buckets"],
            new_id,
            pre_bucketed=pre_bucketed,
            sort=False,
        )
        buckets = {b: list(fs) for b, fs in prev["buckets"].items()}
        for b in touched_buckets:
            entry = buckets.setdefault(str(b), [])
            entry.extend([p, schema_id, new_id, "delta", new_id] for p in new_files.get(b, []))
        return self._finish_snapshot(prev, new_id, schema_id, schemas, buckets, summary)

    def delta_depth(self) -> int:
        """Max number of delta files stacked on any bucket."""
        snap = self.snapshot()
        depth = 0
        for fs in snap["buckets"].values():
            depth = max(depth, sum(1 for e in fs if _entry(e)[3] == "delta"))
        return depth

    def compact(self, schema: T.StructType | None = None, summary: dict | None = None) -> int:
        """Fold base+deltas and rewrite every delta-bearing bucket as base
        files (selective: delta-free buckets are carried by reference)."""
        snap = self.snapshot()
        dirty = [
            int(b)
            for b, fs in snap["buckets"].items()
            if any(_entry(e)[3] == "delta" for e in fs)
        ]
        if not dirty:
            return snap["id"]
        folded = self.read(buckets=dirty)
        prev, new_id, schema, schema_id, schemas = self._next_snapshot(schema)
        new_files = self._write_data_files(
            folded, schema, prev["key_cols"], prev["n_buckets"], new_id
        )
        buckets = {b: fs for b, fs in prev["buckets"].items() if int(b) not in set(dirty)}
        for b in dirty:
            buckets[str(b)] = [[p, schema_id, 0, "base", new_id] for p in new_files.get(b, [])]
        s = dict(summary or {})
        s["op"] = "compact"
        s["buckets_compacted"] = len(dirty)
        return self._finish_snapshot(prev, new_id, schema_id, schemas, buckets, s)

    def compact_prepare(self, sid: int | None = None) -> dict | None:
        """Phase 1 of ASYNC compaction (the maintenance-lane shape real
        lakehouses use: Iceberg rewrite_data_files / Delta OPTIMIZE run
        beside the ingest path, not inside it). Folds base+deltas of the
        dirty buckets AS OF snapshot ``sid`` and writes the replacement
        base files. No metadata is touched, so this may run concurrently
        with further delta commits — it only reads the immutable files of
        ``sid``. Returns a prep dict for :meth:`compact_apply` (or None
        if nothing to compact)."""
        snap = self.snapshot(sid)
        dirty = [
            int(b)
            for b, fs in snap["buckets"].items()
            if any(_entry(e)[3] == "delta" for e in fs)
        ]
        if not dirty:
            return None
        folded = self.read(sid=snap["id"], buckets=dirty)
        schema = self.schema(snap["id"])
        new_files = self._write_data_files(
            folded, schema, snap["key_cols"], snap["n_buckets"], snap["id"]
        )
        return {
            "base_sid": snap["id"],
            "dirty": dirty,
            "files": new_files,
            "schema_id": snap["schema_id"],
            "n_buckets": snap["n_buckets"],
        }

    def compact_apply(self, prep: dict, summary: dict | None = None) -> int:
        """Phase 2: rebase-commit a prepared compaction onto the CURRENT
        snapshot. Per dirty bucket, every entry committed at or before
        ``base_sid`` (the old base, rank 0, and the folded deltas) is
        replaced by the new base files; deltas appended after ``base_sid``
        are kept — the read fold orders rows by (__cdc_ts, rank), and the
        new base carries its true per-row __cdc_ts, so later deltas still
        apply on top. Must be called from the single-threaded commit path
        (the engine batch loop).

        Precondition guard: if any dirty bucket holds a BASE entry committed
        AFTER ``base_sid`` (a commit_merge / concurrent compaction landed
        between prepare and apply), applying the stale prepared base would
        silently drop that rewrite — raise instead of losing data."""
        base_sid = prep["base_sid"]
        prev, new_id, schema, schema_id, schemas = self._next_snapshot(None)
        if prep.get("n_buckets", prev["n_buckets"]) != prev["n_buckets"]:
            raise RuntimeError(
                "compact_apply: bucket count changed since prepare "
                f"({prep.get('n_buckets')} -> {prev['n_buckets']}); re-prepare"
            )
        buckets = {b: list(fs) for b, fs in prev["buckets"].items()}
        for b in prep["dirty"]:
            for e in buckets.get(str(b), []):
                _, _, _, kind, commit_sid, _nw = _entry(e)
                if kind == "base" and commit_sid > base_sid:
                    raise RuntimeError(
                        f"compact_apply: bucket {b} was rewritten at snapshot "
                        f"{commit_sid} > prepared base {base_sid}; discard the "
                        "prepared compaction and re-prepare"
                    )
            kept = [e for e in buckets.get(str(b), []) if _entry(e)[2] > base_sid]
            buckets[str(b)] = [
                [p, prep["schema_id"], 0, "base", new_id] for p in prep["files"].get(b, [])
            ] + kept
        s = dict(summary or {})
        s["op"] = "compact"
        s["base_sid"] = base_sid
        s["buckets_compacted"] = len(prep["dirty"])
        return self._finish_snapshot(prev, new_id, schema_id, schemas, buckets, s)

    # ---------------------------------------------------------------- gc
    def expire_snapshots(self, older_than_sid: int) -> dict:
        """Expire snapshot manifests with id < ``older_than_sid`` and
        delete data files no RETAINED snapshot references — the Iceberg
        ``expire_snapshots`` + ``remove_orphan_files`` pair rolled into
        one bounded sweep (reference parity: finished-partition cleanup
        after a deletion delay, /root/reference
        task/operation/RemoveFinishedPartitionOperation.java:45-135).

        Covers all three leak classes: manifests of superseded snapshots,
        delta/base files replaced by compaction, and orphans from
        rolled-back (uncheckpointed) commits. Files are only deleted from
        write-dirs whose writing snapshot id is ALSO below the floor, so
        an in-flight maintenance write (async compact_prepare against a
        recent snapshot) is never touched. Without this, metadata and
        dead files grow linearly with batch count — untenable at 10^10
        events."""
        current = self.current_snapshot_id()
        older_than_sid = min(older_than_sid, current)
        sids = sorted(
            int(f[5:13])
            for f in os.listdir(self._meta_dir)
            if f.startswith("snap-") and f.endswith(".json")
        )
        retained = [s for s in sids if s >= older_than_sid]
        expired = [s for s in sids if s < older_than_sid]
        referenced: set[str] = set()
        for s in retained:
            for fs in self.snapshot(s)["buckets"].values():
                referenced.update(os.path.normpath(_entry(e)[0]) for e in fs)
        removed_files = 0
        data_dir = os.path.join(self.root, "data")
        if os.path.isdir(data_dir):
            for d in os.listdir(data_dir):
                try:
                    wsid = int(d.split("-")[1])
                except (IndexError, ValueError):
                    continue
                if wsid >= older_than_sid:
                    continue
                for sub, _dirs, files in os.walk(os.path.join(data_dir, d), topdown=False):
                    for fn in files:
                        full = os.path.join(sub, fn)
                        if os.path.normpath(os.path.relpath(full, self.root)) not in referenced:
                            os.remove(full)
                            removed_files += 1
                    if not os.listdir(sub):
                        os.rmdir(sub)
        for s in expired:
            os.remove(self._snap_path(s))
            self._snap_cache.pop(s, None)
        return {"expired_snapshots": len(expired), "removed_files": removed_files}

    # ------------------------------------------------------- bucket growth
    def grow_buckets(self, factor: int = 2, summary: dict | None = None) -> int:
        """METADATA-ONLY bucket-count growth: double (or xN) the bucket
        space without rewriting a byte. Because bucket = hash % n, a file
        written under ``old_n`` for bucket ``b`` can only contain keys
        whose bucket under ``new_n = old_n * factor`` is in
        ``{b, b+old_n, b+2*old_n, ...}`` — so each legacy file is listed
        under exactly those child buckets, annotated with its physical
        ``n_write``; subset reads add a key-hash filter for legacy files
        (read()). Compaction rewrites dirty buckets at the new count, so
        files migrate to native bucketing incrementally.

        At 100 TB this is how per-bucket file counts stay bounded as the
        table grows 100x: growth is O(metadata), the rewrite cost rides
        the compactions that were happening anyway (same shape as Iceberg
        partition-spec evolution: old files keep their spec, new writes
        use the new one)."""
        if factor < 2:
            raise ValueError("factor must be >= 2")
        prev, new_id, schema, schema_id, schemas = self._next_snapshot(None)
        old_n = prev["n_buckets"]
        new_n = old_n * factor
        buckets: dict[str, list] = {}
        for b_new in range(new_n):
            src = prev["buckets"].get(str(b_new % old_n), [])
            out = []
            for e in src:
                rel, sch_id, rank, kind, csid, nw = _entry(e)
                out.append([rel, sch_id, rank, kind, csid, nw if nw is not None else old_n])
            if out:
                buckets[str(b_new)] = out
        s = dict(summary or {})
        s["op"] = "grow_buckets"
        s["n_buckets_from"], s["n_buckets_to"] = old_n, new_n
        snap = {
            "id": new_id,
            "parent": prev["id"],
            "key_cols": prev["key_cols"],
            "n_buckets": new_n,
            "schema_id": schema_id,
            "schemas": schemas,
            "buckets": buckets,
            "summary": s,
        }
        with open(self._snap_path(new_id), "w") as f:
            json.dump(snap, f)
        self._cache_snap(new_id, snap)
        self._set_current(new_id)
        return new_id

    def base_bytes(self) -> int:
        """Physical bytes across unique referenced base files."""
        snap = self.snapshot()
        seen = set()
        for fs in snap["buckets"].values():
            for e in fs:
                rel = _entry(e)[0]
                if _entry(e)[3] == "base" and rel not in seen:
                    seen.add(rel)
        return sum(os.path.getsize(os.path.join(self.root, r)) for r in seen)

    def data_file_count(self) -> int:
        """Physical parquet files on disk (referenced or not) — GC tests."""
        n = 0
        for _sub, _dirs, files in os.walk(os.path.join(self.root, "data")):
            n += sum(1 for f in files if f.endswith(".parquet"))
        return n

    # -------------------------------------------------------------- read
    def schema(self, sid: int | None = None) -> T.StructType:
        snap = self.snapshot(sid)
        return T.StructType.fromJson(json.loads(snap["schemas"][str(snap["schema_id"])]))

    def key_cols(self) -> list[str]:
        return self.snapshot()["key_cols"]

    def n_buckets(self) -> int:
        return self.snapshot()["n_buckets"]

    def read(self, sid: int | None = None, buckets: list[int] | None = None) -> DataFrame:
        """Read current state: files grouped by (schema id, rank, kind),
        cast-unioned to the snapshot schema (add-column null backfill,
        type widening), then — if any merge-on-read deltas are present —
        folded per key in rank order (latest-rank column wins, delete
        barriers honored)."""
        snap = self.snapshot(sid)
        target = T.StructType.fromJson(json.loads(snap["schemas"][str(snap["schema_id"])]))
        n_buckets = snap["n_buckets"]
        want = None if buckets is None else {int(b) for b in buckets}
        # group by (schema, rank, kind, physical bucket count); paths are
        # deduped because a legacy file (written before a grow_buckets
        # renumbering) is listed under several child buckets
        groups: dict[tuple[int, int, str, int], set[str]] = {}
        for b, fs in snap["buckets"].items():
            if want is not None and int(b) not in want:
                continue
            for e in fs:
                rel, sch_id, rank, kind, _csid, nw = _entry(e)
                nw = n_buckets if nw is None else int(nw)
                groups.setdefault((int(sch_id), int(rank), kind, nw), set()).add(
                    os.path.join(self.root, rel)
                )
        key_cols = snap["key_cols"]
        value_names = [f.name for f in target.fields if f.name not in key_cols]
        parts = []
        any_delta = False
        for (sch_id, rank, kind, nw), pathset in sorted(groups.items()):
            paths = sorted(pathset)
            file_schema = T.StructType.fromJson(json.loads(snap["schemas"][str(sch_id)]))
            read_schema = file_schema
            if kind == "delta":
                any_delta = True
                read_schema = T.StructType(
                    list(file_schema.fields)
                    + [f for f in DELTA_FLAG_FIELDS if f.name not in file_schema.names]
                    + [
                        f
                        for f in _set_flag_fields(target, key_cols)
                        if f.name not in file_schema.names
                    ]
                )
            df = self.spark.read.schema(read_schema).parquet(*paths)
            if want is not None and nw != n_buckets:
                # legacy-bucketed file in a subset read: keep only the keys
                # that map into the requested buckets under the CURRENT
                # bucket count (full reads need no filter — paths dedup)
                df = df.where(bucket_expr(key_cols, n_buckets).isin(sorted(want)))
            names = set(read_schema.fieldNames())
            proj = [
                (F.col(f.name) if f.name in names else F.lit(None)).cast(f.dataType).alias(f.name)
                for f in target.fields
            ]
            if kind == "delta":
                # written flag per value column: persisted __set_ flag when
                # present (explicit-null-aware), else value-non-null
                def _w_expr(c: str, names=names):
                    nn = F.col(c).isNotNull() if c in names else F.lit(False)
                    if f"__set_{c}" in names:
                        return F.coalesce(F.col(f"__set_{c}"), nn)
                    return nn

                proj += [_w_expr(c).alias(f"__w_{c}") for c in value_names]
                proj += [
                    F.coalesce(F.col("_is_delete"), F.lit(False)).alias("_is_delete"),
                    F.coalesce(F.col("_had_delete"), F.lit(False)).alias("_had_delete"),
                ]
            else:
                # a base row IS the authoritative state: every column is
                # 'written' (including genuine NULLs) at the base order
                proj += [F.lit(True).alias(f"__w_{c}") for c in value_names]
                proj += [
                    F.lit(False).alias("_is_delete"),
                    F.lit(False).alias("_had_delete"),
                ]
            # per-row apply order: (commit-ts lineage, snapshot rank).
            # The ts component makes the fold correct even when delta files
            # are applied out of per-key commit order (e.g. a stream tail
            # with maxFilesPerTrigger seeing overlapping file time ranges);
            # rank breaks ties for same-ts rows (base < any delta).
            ots = (
                F.coalesce(F.col(CDC_TS_COL).cast("long"), F.lit(_LONG_MIN))
                if CDC_TS_COL in names
                else F.lit(_LONG_MIN)
            )
            proj.append(
                F.struct(ots.alias("ts"), F.lit(rank).cast("long").alias("rank")).alias("_o")
            )
            parts.append(df.select(*proj))
        if not parts:
            return self.spark.createDataFrame([], target)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        if not any_delta:
            return out.drop("_is_delete", "_had_delete", "_o", *[f"__w_{c}" for c in value_names])
        return fold_ranked(out, key_cols, target)


def fold_ranked(df: DataFrame, key_cols: list[str], target: T.StructType) -> DataFrame:
    """Merge-on-read fold: one hash aggregation per key over ordered rows
    (order ``_o`` = (commit-ts lineage, snapshot rank); base rows sort
    first). Mirrors the event-level LWW fold in operators/merge.py one
    level up: each delta row is itself a folded batch, with
    ``_had_delete`` acting as the delete barrier, ``_is_delete`` of the
    top row deciding existence, and ``__w_c`` written flags applying
    explicit-NULL column writes.

    max-only aggregates -> map-side partial aggregation -> hot-key safe.
    """
    value_cols = [f.name for f in target.fields if f.name not in key_cols]
    aggs = [
        F.max(F.struct(F.col("_o").alias("o"), F.col("_is_delete"))).alias("_top"),
        F.max(F.when(F.col("_had_delete"), F.col("_o"))).alias("_barrier"),
    ]
    for c in value_cols:
        aggs.append(
            F.max(
                F.when(
                    F.col(f"__w_{c}"),
                    F.struct(F.col("_o").alias("o"), F.col(c).alias("v")),
                )
            ).alias(f"_m_{c}")
        )
    g = df.groupBy(*key_cols).agg(*aggs)
    g = g.where(~F.col("_top._is_delete"))
    cols = [F.col(c) for c in key_cols]
    for c in value_cols:
        alive = F.col(f"_m_{c}").isNotNull() & (
            F.col("_barrier").isNull() | (F.col(f"_m_{c}.o") >= F.col("_barrier"))
        )
        cols.append(F.when(alive, F.col(f"_m_{c}.v")).alias(c))
    return g.select(*cols)

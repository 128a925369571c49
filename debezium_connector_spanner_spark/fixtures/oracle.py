"""Independent final-state oracle: pure-pandas fold of the change log.

Reads the emitted events parquet (NOT the generator's internal state) and
replays it key-by-key in (commit_ts, record_sequence, mod_number) order,
applying Spanner mod semantics:

- identity dedup on (partition_token, commit_ts, server_txn_id,
  record_sequence, mod_number) — context/offset/SpannerOffsetContextFactory.java:24-33
- INSERT: row := new_values; UPDATE: row updated with new_values (partial
  under OLD_AND_NEW_VALUES, full under NEW_ROW); DELETE: row removed.

Used by tests as the ground truth the Spark engine must reproduce
(per-row sha256(content) equality per the north rule).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os

import pandas as pd
import pyarrow.parquet as pq


def read_events(fixture_dir: str) -> pd.DataFrame:
    frames = []
    for path in sorted(glob.glob(os.path.join(fixture_dir, "events", "*", "*.parquet"))):
        token = os.path.basename(os.path.dirname(path)).split("=", 1)[1]
        df = pq.read_table(path).to_pandas()
        df["partition_token"] = token
        frames.append(df)
    return pd.concat(frames, ignore_index=True)


def fold_final_state(fixture_dir: str) -> pd.DataFrame:
    ev = read_events(fixture_dir)
    ev = ev[(ev["record_type"] == "data_change") & (ev["table_name"] == "repos")]

    base_path = os.path.join(fixture_dir, "base_repos.parquet")
    state: dict[tuple[str, str], dict] = {}
    if os.path.exists(base_path):
        for r in pq.read_table(base_path).to_pandas().to_dict("records"):
            state[(r["repo"], r["path"])] = {
                k: v for k, v in r.items() if k not in ("repo", "path")
            }

    # flatten mods with mod_number, then total-order and dedup by identity
    flat = []
    for r in ev.itertuples(index=False):
        for mod_number, m in enumerate(r.mods):
            flat.append(
                (
                    r.commit_ts,
                    r.record_sequence,
                    mod_number,
                    r.partition_token,
                    r.server_txn_id,
                    m["keys"],
                    m["new_values"],
                    m["old_values"],
                )
            )
    # record_sequence is a numeric string of arbitrary length: order
    # numerically ('10' after '9'), matching the engine's seq normalization
    flat.sort(key=lambda t: (t[0], int(t[1]), t[2]))
    seen = set()
    all_cols: set[str] = set()
    for commit_ts, rs, mod_number, token, txn, keys, new, old in flat:
        ident = (token, commit_ts, txn, rs, mod_number)
        if ident in seen:
            continue
        seen.add(ident)
        k = json.loads(keys)
        key = (k["repo"], k["path"])
        if new is None:  # DELETE
            state.pop(key, None)
            continue
        vals = json.loads(new)
        all_cols.update(vals)
        if key in state:
            state[key].update(vals)
        else:
            state[key] = vals  # INSERT carries the full row

    cols = ["commit", "lang", "content"] + (["stars"] if "stars" in all_cols else [])
    rows = [
        {"repo": k[0], "path": k[1], **{c: v.get(c) for c in cols}}
        for k, v in sorted(state.items())
    ]
    df = pd.DataFrame(rows, columns=["repo", "path"] + cols)
    if "stars" in df.columns:
        df["stars"] = df["stars"].astype("float64")
    return df


def content_sha256(df: pd.DataFrame) -> pd.Series:
    return df["content"].map(
        lambda c: None if c is None else hashlib.sha256(c.encode()).hexdigest()
    )

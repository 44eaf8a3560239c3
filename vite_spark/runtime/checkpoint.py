"""Per-superstep checkpoint/resume (north_star: "runs resume mid-level").

Layout (versioned, Iceberg-style commit protocol: data first, then an
atomic _COMPLETE marker; readers only trust marked supersteps):

    {dir}/level={L}/iter={I}/assignment/   parquet (id, comm)
    {dir}/level={L}/iter={I}/state.json    prev_mod, past pointer, scalars
    {dir}/level={L}/iter={I}/_COMPLETE
    {dir}/level={L}/edges/                 parquet coarse edge table (once per level)
    {dir}/level={L}/_EDGES_COMPLETE

Resume = read the latest complete superstep of the latest level, rebuild
community aggregates from (assignment ⋈ degrees), continue the while-loop.
The assignment parquet doubles as the lineage record: file-per-partition,
deterministic content.
"""

from __future__ import annotations

import json
import os
import re


def superstep_dir(root: str, level: int, iter_: int) -> str:
    return os.path.join(root, f"level={level}", f"iter={iter_}")


def write_superstep(root, level, iter_, assignment_df, past_df, state: dict,
                    act_df=None):
    """``act_df`` (id, active, frozen_cw, p) is the early-termination
    activity state — persisted whenever the phase runs with ET so a
    resumed run continues the identical freeze/decay trajectory (r2
    VERDICT next#7; resume+ET used to be rejected for lack of it)."""
    d = superstep_dir(root, level, iter_)
    assignment_df.write.mode("overwrite").parquet(os.path.join(d, "assignment"))
    past_df.write.mode("overwrite").parquet(os.path.join(d, "past"))
    if act_df is not None:
        act_df.write.mode("overwrite").parquet(os.path.join(d, "act"))
        state = {**state, "has_act": True}
    with open(os.path.join(d, "state.json"), "w") as f:
        json.dump(state, f)
    open(os.path.join(d, "_COMPLETE"), "w").close()


def write_level_edges(root, level, edges_df, meta: dict):
    d = os.path.join(root, f"level={level}")
    edges_df.write.mode("overwrite").parquet(os.path.join(d, "edges"))
    with open(os.path.join(d, "edges_meta.json"), "w") as f:
        json.dump(meta, f)
    open(os.path.join(d, "_EDGES_COMPLETE"), "w").close()


def latest_complete(root: str):
    """Return (level, iter) of the newest complete superstep, or None."""
    if not os.path.isdir(root):
        return None
    best = None
    for lv in os.listdir(root):
        m = re.match(r"level=(\d+)$", lv)
        if not m:
            continue
        level = int(m.group(1))
        lvdir = os.path.join(root, lv)
        for it in os.listdir(lvdir):
            m2 = re.match(r"iter=(\d+)$", it)
            if not m2:
                continue
            if os.path.exists(os.path.join(lvdir, it, "_COMPLETE")):
                cand = (level, int(m2.group(1)))
                if best is None or cand > best:
                    best = cand
    return best


def read_superstep(spark, root, level, iter_):
    """Returns (assignment, past, state, act) — act is None for non-ET
    checkpoints."""
    d = superstep_dir(root, level, iter_)
    with open(os.path.join(d, "state.json")) as f:
        state = json.load(f)
    assignment = spark.read.parquet(os.path.join(d, "assignment"))
    past = spark.read.parquet(os.path.join(d, "past"))
    act = (
        spark.read.parquet(os.path.join(d, "act"))
        if state.get("has_act") else None
    )
    return assignment, past, state, act


def write_phase_state(root, comm_all_df, meta: dict):
    """Composed labels + multi-level loop state after a completed phase."""
    d = os.path.join(root, "phase_state")
    comm_all_df.write.mode("overwrite").parquet(os.path.join(d, "comm_all"))
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump(meta, f)
    open(os.path.join(d, "_PHASE_COMPLETE"), "w").close()


def read_phase_state(spark, root):
    d = os.path.join(root, "phase_state")
    if not os.path.exists(os.path.join(d, "_PHASE_COMPLETE")):
        return None
    with open(os.path.join(d, "meta.json")) as f:
        meta = json.load(f)
    comm_all = spark.read.parquet(os.path.join(d, "comm_all"))
    return comm_all, meta


def read_level_edges(spark, root, level):
    d = os.path.join(root, f"level={level}")
    if not os.path.exists(os.path.join(d, "_EDGES_COMPLETE")):
        return None, None
    with open(os.path.join(d, "edges_meta.json")) as f:
        meta = json.load(f)
    return spark.read.parquet(os.path.join(d, "edges")), meta

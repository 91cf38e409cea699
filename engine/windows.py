"""Session windows — a streaming-shaped operator Ray Data lacks (SURVEY.md
§2.10 family; the reference has no windows at all).

``sessionize`` groups a keyed event stream into gap-based sessions: a new
session starts when the time since the key's previous event exceeds ``gap``.
This is the canonical user-sessionization step of a training-data pipeline
(conversation/episode assembly, per-session aggregates).

Plan: one hash exchange on the key (``groupby(key).map_groups``), then a
fully vectorized pandas pass per key group (sort → diff → cumsum → groupby
agg). Partitioning assumption (custom-operator rule): one key's events fit
in a worker's heap — keys are users/sessions, which are bounded in practice;
salt a pathological key upstream if not.

Determinism: events are ordered by (ts, id) inside a key, and a session
break requires STRICTLY more than ``gap`` between consecutive events — both
reproduced verbatim by the DuckDB gaps-and-islands oracle twin.
"""

from __future__ import annotations

import pandas as pd

import ray.data


def sessionize(ds: "ray.data.Dataset", key_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id",
               value_col: str | None = "value",
               gap_s: float = 3600.0) -> "ray.data.Dataset":
    """(key, ts, id[, value]) rows → one row per session:
    (key, session_start, session_end, n_events[, sum_value])."""
    gap = pd.Timedelta(seconds=gap_s)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col], kind="mergesort")
        new_session = g[ts_col].diff() > gap
        sid = new_session.cumsum()
        grouped = g.groupby(sid)
        out = pd.DataFrame({
            key_col: grouped[key_col].first(),
            "session_start": grouped[ts_col].min(),
            "session_end": grouped[ts_col].max(),
            "n_events": grouped[id_col].count(),
        })
        if value_col is not None:
            out["sum_value"] = grouped[value_col].sum()
        return out.reset_index(drop=True)

    cols = [key_col, ts_col, id_col] + ([value_col] if value_col else [])
    return ds.select_columns(cols).groupby(key_col).map_groups(
        per_key, batch_format="pandas")

"""Query layer over the localization summary database
(~/.picasso/app_0410.db, written by picasso_tpu.localize
.add_file_to_db). Plain sqlite3 — no sqlalchemy dependency."""

from __future__ import annotations

import os
import sqlite3

import pandas as pd


def _db_filename() -> str:
    # resolved dynamically so tests (and apps) can repoint the DB
    from picasso_tpu import localize

    return localize._db_filename()


def fetch_db() -> pd.DataFrame:
    """Load the full 'files' summary table; empty frame if the DB does
    not exist yet (cf. picasso/server/helper.py fetch_db)."""
    path = _db_filename()
    if not os.path.isfile(path):
        return pd.DataFrame()
    with sqlite3.connect(path) as con:
        try:
            return pd.read_sql_query("SELECT * FROM files", con)
        except Exception:
            return pd.DataFrame()


def db_status() -> dict:
    """Summary of the database contents
    (cf. picasso/server/status.py)."""
    df = fetch_db()
    path = _db_filename()
    return {
        "path": path,
        "exists": os.path.isfile(path),
        "n_entries": len(df),
        "size_mb": (
            os.path.getsize(path) / 1e6
            if os.path.isfile(path)
            else 0.0
        ),
        "columns": list(df.columns),
    }


def history(sort_by: str = "entry_created") -> pd.DataFrame:
    """Past localization summaries, newest first
    (cf. picasso/server/history.py)."""
    df = fetch_db()
    if len(df) and sort_by in df.columns:
        df = df.sort_values(sort_by, ascending=False)
    return df


def compare(file_a: str, file_b: str) -> pd.DataFrame:
    """Side-by-side comparison of two file summaries
    (cf. picasso/server/compare.py)."""
    df = fetch_db()
    if not len(df):
        return pd.DataFrame()
    rows = df[df["filename"].isin([file_a, file_b])]
    return rows.set_index("filename").T

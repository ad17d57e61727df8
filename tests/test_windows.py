"""asof_join's composite (user, time-bucket) salt: a hot user's events
split across buckets must still resolve cross-bucket lookback through
the carry-in summaries — including clicks whose nearest earlier view
lies several empty buckets back."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from fastparquet_ray.functions.windows import asof_join


def _write_events(d, events: pd.DataFrame):
    events = events.copy()
    events["ts"] = events["ts"].astype("datetime64[us]")
    if "value" not in events.columns:
        events["value"] = 0.0
    events["props"] = "{}"
    pq.write_table(
        pa.Table.from_pandas(events), d / "events.parquet",
        row_group_size=128,
    )
    return str(d)


def _reference(events: pd.DataFrame) -> pd.DataFrame:
    out = []
    for uid, g in events.groupby("user_id"):
        clicks = g[g["event_type"] == "click"].sort_values("ts")
        views = g[g["event_type"] == "view"].sort_values("ts")
        if clicks.empty or views.empty:
            continue
        m = pd.merge_asof(
            clicks,
            views[["event_id", "ts"]].rename(
                columns={"event_id": "view_event_id", "ts": "view_ts"}
            ),
            left_on="ts", right_on="view_ts",
            allow_exact_matches=False, direction="backward",
        ).dropna(subset=["view_event_id"])
        if m.empty:
            continue
        out.append(
            pd.DataFrame(
                {
                    "event_id": m["event_id"].astype("int64"),
                    "user_id": m["user_id"].astype("int64"),
                    "view_event_id": m["view_event_id"].astype("int64"),
                    "gap_seconds": (m["ts"] - m["view_ts"])
                    .dt.total_seconds()
                    .round(6),
                }
            )
        )
    return (
        pd.concat(out, ignore_index=True)
        .sort_values("event_id")
        .reset_index(drop=True)
    )


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("event_id").reset_index(drop=True)[
        ["event_id", "user_id", "view_event_id", "gap_seconds"]
    ]


def test_asof_hot_user_across_buckets(ray_session, tmp_path):
    """One user owns 80% of a 60-day corpus (spans ~9 weekly buckets);
    unique per-user ts so the reference is deterministic."""
    rng = np.random.default_rng(7)
    n = 4000
    base = pd.Timestamp("2024-01-01")
    # unique second offsets over 60 days
    offs = rng.choice(60 * 86400, size=n, replace=False)
    user = np.where(rng.random(n) < 0.8, 1, rng.integers(2, 6, n))
    events = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": base + pd.to_timedelta(np.sort(offs), unit="s"),
            "user_id": user.astype(np.int64),
            "event_type": rng.choice(
                ["click", "view", "error"], n, p=[0.4, 0.4, 0.2]
            ),
        }
    )
    sf = _write_events(tmp_path, events)
    got = _norm(asof_join(sf).to_pandas())
    want = _reference(events)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_asof_carry_across_empty_buckets(ray_session, tmp_path):
    """Clicks whose nearest earlier view sits several buckets back
    (intervening buckets have no views at all), plus a click with no
    earlier view anywhere (must be dropped)."""
    base = pd.Timestamp("2024-01-01")
    rows = [
        # user 1: view day 1, clicks on days 2 (same bucket),
        # 20 and 40 (two and five buckets later, no views between)
        (0, base + pd.Timedelta(days=1), 1, "view"),
        (1, base + pd.Timedelta(days=2), 1, "click"),
        (2, base + pd.Timedelta(days=20), 1, "click"),
        (3, base + pd.Timedelta(days=40), 1, "click"),
        # user 2: click BEFORE any view -> no match; later click matches
        (4, base + pd.Timedelta(days=3), 2, "click"),
        (5, base + pd.Timedelta(days=4), 2, "view"),
        (6, base + pd.Timedelta(days=30), 2, "click"),
        # user 3: two views same bucket, later click takes the latest
        (7, base + pd.Timedelta(days=1, hours=1), 3, "view"),
        (8, base + pd.Timedelta(days=1, hours=2), 3, "view"),
        (9, base + pd.Timedelta(days=15), 3, "click"),
    ]
    events = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type"]
    )
    sf = _write_events(tmp_path, events)
    got = _norm(asof_join(sf).to_pandas())
    want = _reference(events)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the no-earlier-view click must be absent
    assert 4 not in set(got["event_id"])
    # day-40 click resolved through the carry chain to the day-1 view
    assert got.loc[got["event_id"] == 3, "view_event_id"].iloc[0] == 0
    # latest of the two same-bucket views wins
    assert got.loc[got["event_id"] == 9, "view_event_id"].iloc[0] == 8


def test_window_lag_hot_user_salted(ray_session, tmp_path):
    """window_lag's composite salt: deltas across bucket borders must
    come from the carry-in predecessor, verified against DuckDB's
    lag() on a corpus where one user dominates and spans ~9 buckets."""
    import duckdb

    from fastparquet_ray.functions.analytics import window_lag

    rng = np.random.default_rng(13)
    n = 3000
    base = pd.Timestamp("2024-01-01")
    offs = rng.choice(60 * 86400, size=n, replace=False)
    events = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": base + pd.to_timedelta(np.sort(offs), unit="s"),
            "user_id": np.where(
                rng.random(n) < 0.7, 1, rng.integers(2, 5, n)
            ).astype(np.int64),
            "event_type": rng.choice(["click", "view"], n),
        }
    )
    events["value"] = np.round(rng.normal(0, 10, n), 4)
    d = tmp_path / "lag"
    d.mkdir()
    sf = _write_events(d, events)
    got = (
        window_lag(sf)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    want = con.execute(
        f"""
        SELECT event_id, user_id, ROUND(value - lag(value) OVER
          (PARTITION BY user_id ORDER BY ts, event_id), 6) AS delta
        FROM read_parquet('{sf}/events.parquet')
        QUALIFY delta IS NOT NULL
        ORDER BY event_id
        """
    ).df()
    pd.testing.assert_frame_equal(
        got, want.reset_index(drop=True), check_dtype=False
    )


def test_salted_lookback_ghost_boundary(ray_session, tmp_path):
    """rolling_avg and range_join across bucket borders: events sitting
    just inside the previous bucket must feed the next bucket's window
    through ghost replication — exact boundary ts included."""
    import duckdb

    from fastparquet_ray.functions.windows import range_join, rolling_avg

    base = pd.Timestamp("2024-01-01")
    week = pd.Timedelta(days=7)
    rows = []
    eid = 0
    # cluster of events straddling each of three weekly boundaries,
    # spaced 2 minutes apart (inside the 5/10-minute windows)
    for k in (1, 2, 3):
        b = base + k * week
        for dm in (-9, -6, -3, -1, 0, 1, 4):
            rows.append(
                (eid, b + pd.Timedelta(minutes=dm), 1,
                 "error" if dm in (0, 1, 4) else "view")
            )
            eid += 1
    events = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type"]
    )
    events["value"] = np.round(
        np.random.default_rng(3).normal(5, 2, len(events)), 4
    )
    d = tmp_path / "ghost"
    d.mkdir()
    sf = _write_events(d, events)
    con = duckdb.connect()

    got = (
        rolling_avg(sf)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = con.execute(
        f"""
        SELECT event_id, user_id, ROUND(avg(value) OVER (
          PARTITION BY user_id ORDER BY ts
          RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW
        ), 6) AS avg_win
        FROM read_parquet('{sf}/events.parquet') ORDER BY event_id
        """
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    got = (
        range_join(sf)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    want = con.execute(
        f"""
        SELECT a.event_id, a.user_id,
          CAST(count(b.event_id) AS BIGINT) AS preceding_5min
        FROM (SELECT * FROM read_parquet('{sf}/events.parquet')
              WHERE event_type = 'error') a
        LEFT JOIN read_parquet('{sf}/events.parquet') b
          ON a.user_id = b.user_id
          AND b.ts >= a.ts - INTERVAL 5 MINUTE AND b.ts < a.ts
        GROUP BY a.event_id, a.user_id ORDER BY a.event_id
        """
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_session_windows_chain_across_buckets(ray_session, tmp_path):
    """A session whose events straddle a weekly bucket border must be
    stitched into ONE session by the border walk; independent sessions
    on each side of a wide gap must stay separate."""
    import duckdb

    from fastparquet_ray.functions.windows import session_windows

    base = pd.Timestamp("2024-01-01")
    week = pd.Timedelta(days=7)
    rows = []
    eid = 0
    # user 1: 5-event session straddling the boundary (10-min spacing),
    # then an isolated later session
    for dm in (-25, -15, -5, 5, 15):
        rows.append((eid, base + week + pd.Timedelta(minutes=dm), 1)); eid += 1
    rows.append((eid, base + week + pd.Timedelta(hours=9), 1)); eid += 1
    # user 2: interior-only sessions far from borders
    for dm in (0, 10, 500, 510):
        rows.append((eid, base + pd.Timedelta(days=3, minutes=dm), 2)); eid += 1
    events = pd.DataFrame(rows, columns=["event_id", "ts", "user_id"])
    events["event_type"] = "view"
    d = tmp_path / "sess"
    d.mkdir()
    sf = _write_events(d, events)
    got = (
        session_windows(sf)
        .to_pandas()
        .sort_values(["user_id", "session_start"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    want = con.execute(
        f"""
        WITH d AS (SELECT user_id, ts,
          CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
            > INTERVAL 30 MINUTE OR lag(ts) OVER (PARTITION BY user_id
            ORDER BY ts) IS NULL THEN 1 ELSE 0 END AS brk FROM
            read_parquet('{sf}/events.parquet')),
        s AS (SELECT user_id, ts, sum(brk) OVER (PARTITION BY user_id
          ORDER BY ts) AS sid FROM d)
        SELECT user_id, min(ts) AS session_start,
          CAST(count(*) AS BIGINT) AS n_events
        FROM s GROUP BY user_id, sid
        ORDER BY user_id, session_start
        """
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the straddling session is one 5-event session
    u1 = got[got["user_id"] == 1]
    assert list(u1["n_events"]) == [5, 1]


def test_funnel_ghost_across_bucket_border(ray_session, tmp_path):
    """A view 2 minutes before a weekly bucket border converting a
    click 2 minutes after it is only caught through ghost replication;
    a control user clicking with no prior view must not convert, nor a
    view AFTER the click."""
    import duckdb

    from fastparquet_ray.functions.windows import funnel_conversion

    base = pd.Timestamp("2024-01-01")
    week = pd.Timedelta(days=7)
    rows = [
        # user 1: straddles the border -> converts via ghost
        (0, base + week - pd.Timedelta(minutes=2), 1, "view"),
        (1, base + week + pd.Timedelta(minutes=2), 1, "click"),
        # user 2: click precedes its only view -> no conversion
        (2, base + pd.Timedelta(hours=1), 2, "click"),
        (3, base + pd.Timedelta(hours=2), 2, "view"),
        # user 3: view too far back (45 min) -> no conversion
        (4, base + pd.Timedelta(hours=5), 3, "view"),
        (5, base + pd.Timedelta(hours=5, minutes=45), 3, "click"),
        # user 4: in-bucket conversion
        (6, base + pd.Timedelta(hours=9), 4, "view"),
        (7, base + pd.Timedelta(hours=9, minutes=10), 4, "click"),
    ]
    events = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type"]
    )
    events["value"] = 1.0
    d = tmp_path / "funnel"
    d.mkdir()
    sf = _write_events(d, events)
    got = funnel_conversion(sf, window_minutes=30)
    assert int(got["converted_users"].iloc[0]) == 2
    exp = duckdb.connect().execute(
        "SELECT count(DISTINCT c.user_id) AS cu FROM "
        f"read_parquet('{sf}/events.parquet') c JOIN "
        f"read_parquet('{sf}/events.parquet') v "
        "ON v.user_id = c.user_id AND v.event_type = 'view' "
        "AND c.event_type = 'click' AND v.ts < c.ts "
        "AND v.ts >= c.ts - INTERVAL 30 MINUTE"
    ).fetchone()[0]
    assert int(exp) == 2


def test_window_carry_resolved_distributed():
    """The window family must never pull user-scaled state to the
    driver or broadcast it as one dict: at 100 TB `users` is
    data-scaled, so cross-block healing has to be bounded by BLOCK
    count (the segmented-sort border fold). Driver pulls /
    broadcasts bounded by block count are fine — but each such site
    must carry an explicit O(blocks)-scale comment within the
    preceding lines, so a future edit can't silently reintroduce
    user-scaled driver state."""
    import inspect

    from fastparquet_ray.functions import analytics, windows

    for fn in (
        analytics.window_lag,
        analytics.running_sum,
        analytics.dense_rank_day,
        analytics.event_transitions,
        analytics.rolling_dau,
        analytics._user_rank_scaled,
        windows.asof_join,
        windows.funnel_conversion,
        windows._sorted_window,
    ):
        lines = inspect.getsource(fn).splitlines()
        for i, ln in enumerate(lines):
            if (
                ".to_pandas()" in ln
                or "ray.put" in ln
                or "ray.get" in ln
            ):
                ctx = "\n".join(lines[max(0, i - 10) : i + 1])
                assert (
                    "O(blocks)" in ctx
                    or "O(straddling blocks)" in ctx
                    or "O(2 x blocks)" in ctx
                    or "O(blocks x window)" in ctx
                    or "O(straddling blocks x window)" in ctx
                ), f"{fn.__name__}: unannotated driver pull: {ln.strip()}"


def test_bounded_windows_many_blocks(ray_session, tmp_path):
    """_sorted_window border replay: force MANY tiny sorted blocks so
    windows straddle several block boundaries (clusters of events
    spaced well inside the 5/10/30-minute windows), and check
    rolling_avg / range_join / funnel_conversion against DuckDB."""
    import duckdb
    from ray.data import DataContext

    from fastparquet_ray.functions.windows import (
        funnel_conversion,
        range_join,
        rolling_avg,
    )

    rng = np.random.default_rng(11)
    n = 3000
    base = pd.Timestamp("2024-03-01")
    # one hot user with dense minute-scale bursts + background users
    user = np.where(rng.random(n) < 0.6, 1, rng.integers(2, 8, n))
    # bursts: offsets clustered so 10-minute windows hold many rows
    offs = np.sort(
        rng.integers(0, 5 * 86_400, n) * 1_000_000
        + rng.integers(0, 1_000_000, n)
    )
    events = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": base + pd.to_timedelta(offs, unit="us"),
            "user_id": user.astype(np.int64),
            "event_type": rng.choice(
                ["click", "view", "error"], n, p=[0.3, 0.5, 0.2]
            ),
        }
    )
    events["value"] = np.round(rng.normal(3, 5, n), 4)
    d = tmp_path / "bw"
    d.mkdir()
    sf = _write_events(d, events)
    con = duckdb.connect()

    ctx = DataContext.get_current()
    old_target = ctx.target_max_block_size
    ctx.target_max_block_size = 16 * 1024  # tiny blocks -> straddles
    try:
        got_avg = (
            rolling_avg(sf)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        got_rj = (
            range_join(sf)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        got_fc = int(funnel_conversion(sf)["converted_users"].iloc[0])
    finally:
        ctx.target_max_block_size = old_target

    want_avg = con.execute(
        f"""
        SELECT event_id, user_id, ROUND(avg(value) OVER (
          PARTITION BY user_id ORDER BY ts
          RANGE BETWEEN INTERVAL 10 MINUTE PRECEDING AND CURRENT ROW
        ), 6) AS avg_win
        FROM read_parquet('{sf}/events.parquet') ORDER BY event_id
        """
    ).df()
    pd.testing.assert_frame_equal(got_avg, want_avg, check_dtype=False)

    want_rj = con.execute(
        f"""
        SELECT a.event_id, a.user_id, count(b.event_id) AS preceding_5min
        FROM read_parquet('{sf}/events.parquet') a
        LEFT JOIN read_parquet('{sf}/events.parquet') b
          ON b.user_id = a.user_id AND b.ts < a.ts
          AND b.ts >= a.ts - INTERVAL 5 MINUTE
        WHERE a.event_type = 'error'
        GROUP BY a.event_id, a.user_id ORDER BY a.event_id
        """
    ).df()
    pd.testing.assert_frame_equal(got_rj, want_rj, check_dtype=False)

    want_fc = con.execute(
        f"""
        SELECT count(DISTINCT c.user_id) FROM
          read_parquet('{sf}/events.parquet') c
          JOIN read_parquet('{sf}/events.parquet') v
          ON v.user_id = c.user_id AND v.event_type = 'view'
          AND c.event_type = 'click' AND v.ts < c.ts
          AND v.ts >= c.ts - INTERVAL 30 MINUTE
        """
    ).fetchone()[0]
    assert got_fc == int(want_fc)


def test_session_windows_many_blocks(ray_session, tmp_path):
    """Sessions chaining across MANY tiny sorted blocks (a hot user
    with an unbroken minute-spaced run spanning the whole corpus must
    collapse to ONE session) vs DuckDB's gap-based sessionization."""
    import duckdb
    from ray.data import DataContext

    from fastparquet_ray.functions.windows import session_windows

    rng = np.random.default_rng(23)
    base = pd.Timestamp("2024-05-01")
    # user 1: 2000 events spaced 5 min apart -> one giant session
    # users 2..6: sparse bursts -> many small sessions
    rows = [
        (1, base + pd.Timedelta(minutes=5 * i)) for i in range(2000)
    ]
    for uid in range(2, 7):
        t = base
        for _ in range(100):
            t += pd.Timedelta(hours=int(rng.integers(1, 20)))
            for j in range(int(rng.integers(1, 5))):
                rows.append((uid, t + pd.Timedelta(minutes=7 * j)))
    events = pd.DataFrame(rows, columns=["user_id", "ts"])
    events["event_id"] = np.arange(len(events), dtype=np.int64)
    events["event_type"] = "view"
    d = tmp_path / "sess"
    d.mkdir()
    sf = _write_events(d, events)

    ctx = DataContext.get_current()
    old_target = ctx.target_max_block_size
    ctx.target_max_block_size = 8 * 1024  # tiny blocks -> long chains
    try:
        got = (
            session_windows(sf)
            .to_pandas()
            .sort_values(["user_id", "session_start"])
            .reset_index(drop=True)
        )
    finally:
        ctx.target_max_block_size = old_target

    want = duckdb.connect().execute(
        f"""
        WITH marked AS (
          SELECT user_id, ts,
            CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                 > INTERVAL 30 MINUTE OR
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
            THEN 1 ELSE 0 END AS brk
          FROM read_parquet('{sf}/events.parquet')
        ), sess AS (
          SELECT user_id, ts,
            sum(brk) OVER (PARTITION BY user_id ORDER BY ts) AS sid
          FROM marked
        )
        SELECT user_id, min(ts) AS session_start,
               count(*) AS n_events
        FROM sess GROUP BY user_id, sid
        ORDER BY user_id, session_start
        """
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # the hot user's unbroken run collapsed into one session
    assert (got[got["user_id"] == 1]["n_events"] == 2000).all()

"""Stream-shaped operators over the events table: tumbling-window
aggregation and as-of join — custom operators Ray Data lacks natively,
built per the documented composition rules (ray_guide 'streaming-shaped
workloads'): windows = truncate-timestamp + partial aggregate +
groupby; as-of join = per-key sort + pandas merge_asof inside
map_groups.

Partitioning assumptions (documented per the build brief):
- windowed_agg: none — window key is computed per row, aggregation is
  a partial-then-final groupby on (event_type, window).
- asof_join: ONE range sort on (user_id, ts, event_id) — no group
  co-location, so hot users simply span blocks; unbounded lookback
  heals through an O(blocks) border fold on the driver.
- rolling_avg / range_join: same composite key; BOUNDED lookback is
  restored by ghost-replicating boundary rows into the next bucket
  (_salted_lookback) — fully distributed, ~win/bucket overhead.
- session_windows: same composite key; interior sessions stream from
  workers, border sessions (<= 2 per user-bucket) are stitched into
  cross-bucket chains on the driver.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa


def _events(sf_dir: str, columns=None):
    import ray.data

    return ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=columns
    )


def windowed_agg(sf_dir: str):
    """Tumbling 1-hour windows per event_type: count + value sum.
    Pre-aggregated per batch before the (event_type, window) groupby."""
    from ray.data.aggregate import Sum

    ds = _events(sf_dir, ["event_type", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        win = df["ts"].dt.floor("h")
        g = (
            pd.DataFrame(
                {"event_type": df["event_type"], "win": win, "value": df["value"]}
            )
            .groupby(["event_type", "win"], as_index=False)
            .agg(n=("value", "size"), total=("value", "sum"))
        )
        return g

    parts = ds.map_batches(partial, batch_format="pandas")
    out = parts.groupby(["event_type", "win"]).aggregate(
        Sum("n", alias_name="n"), Sum("total", alias_name="total_raw")
    )

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {
                "event_type": t.column("event_type"),
                "win": t.column("win"),
                "n": t.column("n"),
                "total": pc.round(t.column("total_raw"), 3),
            }
        )

    # stays a Dataset end-to-end (the r01 version collected the whole
    # result into a driver frame just to round a column)
    return out.map_batches(finish, batch_format="pyarrow")


def asof_join(sf_dir: str):
    """As-of join: for every 'click' event, the most recent strictly
    earlier 'view' event of the same user.
    Returns (event_id, user_id, view_event_id, gap_seconds).

    Segmented-sort execution (the window_lag / running_sum recipe):
    pre-filter to clicks + views (the only event types the join
    touches), ONE range sort on (user_id, ts, event_id) — no group
    co-location is needed, so a hot user simply spans several sorted
    blocks — then a vectorized per-block backward scan. A user
    straddling blocks heals through an O(blocks) border frame: each
    block's edge user-segments contribute (v1, v2) = (latest view in
    the portion, latest view strictly earlier than v1's ts); the
    driver folds those along block order per user and broadcasts a
    dict keyed by each straddling block's first-row identity —
    bounded by BLOCK count, never by users or events."""
    ds = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])

    def prefilter(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["event_type"].isin(("click", "view"))]
    import ray
    import ray.data

    SENT = np.int64(-(2**62))  # 'no view' sentinel (ns since epoch)
    empty = pd.DataFrame(
        {
            "event_id": pd.Series([], dtype="int64"),
            "user_id": pd.Series([], dtype="int64"),
            "view_event_id": pd.Series([], dtype="int64"),
            "gap_seconds": pd.Series([], dtype="float64"),
        }
    )

    srt = (
        ds.map_batches(prefilter, batch_format="pandas")
        .sort(["user_id", "ts", "event_id"])
        .materialize()
    )

    def _ns(ts: pd.Series) -> np.ndarray:
        return ts.astype("int64").to_numpy() * (
            1000 if ts.dtype == "datetime64[us]" else 1
        )

    def _portion_views(ns, eid, isview, s, e):
        """(v1_ts, v1_eid, v2_ts, v2_eid) over rows [s, e): the last
        view and the last view with ts strictly below it."""
        vi = np.flatnonzero(isview[s:e]) + s
        if vi.size == 0:
            return SENT, np.int64(-1), SENT, np.int64(-1)
        j = vi[-1]
        strict = vi[ns[vi] < ns[j]]
        if strict.size == 0:
            return ns[j], eid[j], SENT, np.int64(-1)
        k = strict[-1]
        return ns[j], eid[j], ns[k], eid[k]

    def edge_asof(df: pd.DataFrame) -> pd.DataFrame:
        cols = {
            "user_id": pd.Series([], dtype="int64"),
            "v1_ts": pd.Series([], dtype="int64"),
            "v1_eid": pd.Series([], dtype="int64"),
            "v2_ts": pd.Series([], dtype="int64"),
            "v2_eid": pd.Series([], dtype="int64"),
            "seg_ts": pd.Series([], dtype="int64"),
            "seg_eid": pd.Series([], dtype="int64"),
            "blk_ts": pd.Series([], dtype="int64"),
            "blk_eid": pd.Series([], dtype="int64"),
            "is_first": pd.Series([], dtype="bool"),
            "is_last": pd.Series([], dtype="bool"),
        }
        if df.empty:
            return pd.DataFrame(cols)
        u = df["user_id"].to_numpy()
        ns = _ns(df["ts"])
        eid = df["event_id"].to_numpy()
        isview = (df["event_type"] == "view").to_numpy()
        start = np.ones(len(df), dtype=bool)
        start[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(start)
        ends = np.concatenate([starts[1:], [len(df)]])
        first_i, last_i = 0, len(starts) - 1
        take = sorted({first_i, last_i})
        rows = []
        for i in take:
            s, e = int(starts[i]), int(ends[i])
            v1t, v1e, v2t, v2e = _portion_views(ns, eid, isview, s, e)
            rows.append(
                (
                    int(u[s]), int(v1t), int(v1e),
                    int(v2t), int(v2e),
                    # SEGMENT first row orders blocks within a user
                    int(ns[s]), int(eid[s]),
                    # BLOCK identity: the block's first row
                    int(ns[0]), int(eid[0]),
                    i == first_i, i == last_i,
                )
            )
        return pd.DataFrame(rows, columns=list(cols)).astype(
            {k: v.dtype for k, v in cols.items()}
        )

    def _fold(acc, v1t, v1e, v2t, v2e):
        """Merge a LATER portion's (v1, v2) into the running carry.
        Portions arrive in segment order, so acc's views all sort at
        or before the new portion's."""
        if v1t == SENT:
            return acc
        if v2t == SENT:
            if acc[0] != SENT and acc[0] < v1t:
                v2t, v2e = acc[0], acc[1]
            else:
                v2t, v2e = acc[2], acc[3]
        return (v1t, v1e, v2t, v2e)

    # O(2 x blocks) edge rows — never events or users
    bd = (
        srt.map_batches(edge_asof, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    offsets: dict[tuple, tuple] = {}
    if len(bd):
        bd = bd.sort_values(
            ["user_id", "seg_ts", "seg_eid"], kind="mergesort"
        ).reset_index(drop=True)
        cur = None
        acc = (int(SENT), -1, int(SENT), -1)
        for r in bd.itertuples(index=False):
            if r.user_id != cur:
                cur = r.user_id
                acc = (int(SENT), -1, int(SENT), -1)
            elif r.is_first:
                # block continues this user: carry = all earlier blocks
                offsets[(r.user_id, r.blk_ts, r.blk_eid)] = acc
            if r.is_last:
                acc = _fold(acc, r.v1_ts, r.v1_eid, r.v2_ts, r.v2_eid)
    # broadcast is O(straddling blocks) entries — block-count-bounded
    off_ref = ray.put(offsets)

    def block_asof(df: pd.DataFrame, _memo={}) -> pd.DataFrame:
        if df.empty:
            return empty
        if "o" not in _memo:
            _memo["o"] = ray.get(off_ref)  # O(straddling blocks), tiny
        u = df["user_id"].to_numpy()
        ns = _ns(df["ts"])
        eid = df["event_id"].to_numpy()
        start = np.ones(len(df), dtype=bool)
        start[1:] = u[1:] != u[:-1]
        seg_id = np.cumsum(start) - 1
        isview = (df["event_type"] == "view").to_numpy()
        cpos = np.flatnonzero((df["event_type"] == "click").to_numpy())
        if cpos.size == 0:
            return empty
        seg_c = seg_id[cpos]
        cts = ns[cpos]
        res_ts = np.full(cpos.size, SENT, dtype=np.int64)
        res_eid = np.full(cpos.size, -1, dtype=np.int64)
        vpos = np.flatnonzero(isview)
        if vpos.size:
            vseg = seg_id[vpos]
            vts = ns[vpos]
            veid = eid[vpos]
            # strict predecessor per view: the row before its
            # (segment, ts) run, if still in the same segment
            runb = np.ones(vpos.size, dtype=bool)
            runb[1:] = (vseg[1:] != vseg[:-1]) | (vts[1:] != vts[:-1])
            run_start = np.maximum.accumulate(
                np.where(runb, np.arange(vpos.size), 0)
            )
            pred = run_start - 1
            p = np.searchsorted(vpos, cpos) - 1
            pc = np.clip(p, 0, vpos.size - 1)
            valid = (p >= 0) & (vseg[pc] == seg_c)
            ans = np.where(valid, pc, -1)
            # strictly earlier: a tied-ts view steps to its strict
            # predecessor (or falls through to the carry)
            eq = valid & (vts[pc] == cts)
            stp = pred[pc]
            sc = np.clip(stp, 0, vpos.size - 1)
            ok2 = (stp >= 0) & (vseg[sc] == seg_c)
            ans = np.where(eq, np.where(ok2, stp, -1), ans)
            hit = ans >= 0
            ac = np.clip(ans, 0, vpos.size - 1)
            res_ts = np.where(hit, vts[ac], SENT)
            res_eid = np.where(hit, veid[ac], -1)
        # clicks in the block's FIRST segment with no in-block view
        # resolve through the border carry (earlier blocks, same user)
        need = (res_ts == SENT) & (seg_c == 0)
        if need.any():
            c = _memo["o"].get((int(u[0]), int(ns[0]), int(eid[0])))
            if c is not None:
                v1t, v1e, v2t, v2e = c
                # v1 when strictly earlier, else v2 (v2_ts < v1_ts)
                pick1 = v1t < cts[need]
                res_ts[need] = np.where(pick1, v1t, v2t)
                res_eid[need] = np.where(pick1, v1e, v2e)
        keep = res_ts != SENT
        if not keep.any():
            return empty
        gap = (cts[keep] - res_ts[keep]) / 1e9
        return pd.DataFrame(
            {
                "event_id": eid[cpos[keep]].astype("int64"),
                "user_id": u[cpos[keep]].astype("int64"),
                "view_event_id": res_eid[keep],
                "gap_seconds": np.round(gap, 6),
            }
        )

    # stays a Dataset: the result is O(clicks) — data-sized, so the
    # driver never collects it (row order is irrelevant; the
    # correctness comparator is order-insensitive)
    return srt.map_batches(
        block_asof, batch_format="pandas", batch_size=None
    )


def session_windows(sf_dir: str, gap_minutes: int = 30, salt_days: int = 7):
    """Session windows per user (gap > ``gap_minutes`` starts a new
    session): per-session start time and event count.

    Skew-bounded sessionization: the exchange keys on the composite
    (user_id, coarse ``salt_days`` bucket); each group sessionizes
    locally (sort + diff + cumsum), emits its INTERIOR sessions
    directly into the streaming output, and routes only its
    first/last border sessions (<= 2 rows per (user, bucket)) into a
    DISTRIBUTED per-user stitch — a groupby(user_id) interval
    gap-union over candidate rows, vectorized per user. An empty
    bucket can never hide a mergeable pair (its width >> gap), and
    the stitch compares real timestamps, not bucket adjacency, so it
    is exact regardless. Driver state is O(1); event rows never
    leave the workers."""
    import ray
    import ray.data

    ds = _events(sf_dir, ["user_id", "ts"])
    gap = np.timedelta64(gap_minutes * 60, "s")
    bucket_ns = np.int64(salt_days) * 86_400 * 1_000_000_000

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        ns = df["ts"].astype("int64") * (
            1000 if df["ts"].dtype == "datetime64[us]" else 1
        )
        df = df.copy()
        df["bkt"] = (ns // bucket_ns).astype("int64")
        return df

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts").reset_index(drop=True)
        brk = (g["ts"].diff() > gap) | g["ts"].diff().isna()
        sid = brk.cumsum()
        s = (
            pd.DataFrame({"user_id": g["user_id"], "ts": g["ts"], "sid": sid})
            .groupby(["user_id", "sid"], as_index=False)
            .agg(
                session_start=("ts", "min"),
                n_events=("ts", "size"),
                last_ts=("ts", "max"),
            )
        )
        border = (s["sid"] == s["sid"].iloc[0]) | (
            s["sid"] == s["sid"].iloc[-1]
        )
        s = s.drop(columns=["sid"])
        s["border"] = border.to_numpy()
        return s[["user_id", "session_start", "n_events", "last_ts", "border"]]

    sessions = (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby(["user_id", "bkt"])
        .map_groups(per_group, batch_format="pandas")
        .materialize()  # consumed twice: interior stream + border pull
    )

    def interior(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[~df["border"]]
        return keep[["user_id", "session_start", "n_events"]]

    # distributed border stitch (was a driver itertuples walk over
    # O(users x buckets) candidate rows): per user, the candidates
    # sorted by start merge with the standard interval-gap-union —
    # break exactly where start exceeds the running max end + gap
    # (equivalent to the sequential chain walk: an older chain's end
    # is always > gap before any later chain's starts, so the global
    # running max and the in-chain running max decide identically).
    def stitch(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["session_start", "last_ts"], kind="mergesort"
        ).reset_index(drop=True)
        starts = g["session_start"].to_numpy()
        lasts = g["last_ts"].to_numpy()
        brk = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            brk[1:] = (
                starts[1:] - np.maximum.accumulate(lasts)[:-1]
            ) > gap
        sid = np.cumsum(brk)
        out = (
            pd.DataFrame(
                {
                    "user_id": g["user_id"].astype("int64"),
                    "session_start": g["session_start"],
                    "n_events": g["n_events"].astype("int64"),
                    "sid": sid,
                }
            )
            .groupby("sid", as_index=False, sort=False)
            .agg(
                user_id=("user_id", "first"),
                session_start=("session_start", "min"),
                n_events=("n_events", "sum"),
            )
        )
        return out[["user_id", "session_start", "n_events"]]

    fixed = (
        sessions.map_batches(
            lambda df: df[df["border"]], batch_format="pandas"
        )
        .groupby("user_id")
        .map_groups(stitch, batch_format="pandas")
    )

    out = sessions.map_batches(interior, batch_format="pandas")
    return out.union(fixed)


def _salted_lookback(ds, win, salt_days: int, per_group):
    """Shared skew bound for bounded-lookback window operators
    (rolling_avg, range_join): rows are assigned to a composite
    (user_id, coarse ``salt_days`` bucket) key, and every row within
    ``win`` of the NEXT bucket's start is REPLICATED there as a ghost
    (ghost rows feed the window math but emit no output). Because
    win << bucket, the replication overhead is ~win/bucket (0.1% at
    10 min / 7 days) and the composition is fully distributed — no
    driver-held carry state at all, unlike the unbounded-lookback
    asof_join. ``per_group`` receives the sorted group WITH ghosts and
    a boolean 'ghost' column."""
    bucket_ns = np.int64(salt_days) * 86_400 * 1_000_000_000
    win_ns = np.int64(win // np.timedelta64(1, "ns"))

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        ns = df["ts"].astype("int64") * (
            1000 if df["ts"].dtype == "datetime64[us]" else 1
        )
        bkt = (ns // bucket_ns).to_numpy()
        own = df.copy()
        own["bkt"] = bkt.astype("int64")
        own["ghost"] = False
        tail = ((ns % bucket_ns) >= bucket_ns - win_ns).to_numpy()
        gh = df[tail].copy()
        gh["bkt"] = (bkt[tail] + 1).astype("int64")
        gh["ghost"] = True
        return pd.concat([own, gh], ignore_index=True)

    return (
        ds.map_batches(assign, batch_format="pandas")
        .groupby(["user_id", "bkt"])
        .map_groups(per_group, batch_format="pandas")
    )


def rolling_avg(sf_dir: str, window_minutes: int = 10, salt_days: int = 7):
    """Moving time-window average per user: for every event, the mean
    of `value` over the user's events in the preceding
    ``window_minutes`` RANGE frame (inclusive of the current row and
    of ts ties on both frame edges — SQL RANGE semantics, not ROWS).
    Composition: the _salted_lookback composite-key exchange (hot
    users split across time buckets; ghost-replicated boundary rows
    supply cross-border lookback), then ONE sorted prefix-sum + two
    searchsorteds per group — O(n log n) in the group's events with
    no pairwise expansion."""
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])
    win = np.timedelta64(window_minutes * 60, "s")

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"]).reset_index(drop=True)
        ts = g["ts"].to_numpy()
        vals = g["value"].to_numpy(np.float64)
        cs = np.concatenate([[0.0], np.cumsum(vals)])
        # RANGE frame: every row with ts in [t - win, t], including
        # equal-ts rows positioned after the current one
        lo = np.searchsorted(ts, ts - win, side="left")
        hi = np.searchsorted(ts, ts, side="right")
        avg = (cs[hi] - cs[lo]) / (hi - lo)
        keep = ~g["ghost"].to_numpy()
        return pd.DataFrame(
            {
                "event_id": g["event_id"].astype("int64")[keep],
                "user_id": g["user_id"].astype("int64")[keep],
                "avg_win": np.round(avg, 6)[keep],
            }
        )

    return _salted_lookback(ds, win, salt_days, per_group)


def range_join(sf_dir: str, salt_days: int = 7):
    """Range (band) join: pair each 'error' event with the count of
    events of the same user within the preceding 5 minutes.
    Composition: the _salted_lookback composite (user, bucket)
    exchange with 5-minute ghost overlap, then a per-group sorted
    searchsorted (vectorized) — no pairwise blowup, no driver state,
    hot users bounded by their per-bucket traffic."""
    ds = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])
    win = np.timedelta64(300, "s")

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts").reset_index(drop=True)
        errors = g[(g["event_type"] == "error") & ~g["ghost"]]
        if errors.empty:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "preceding_5min": pd.Series([], dtype="int64"),
                }
            )
        ts = g["ts"].to_numpy()
        lo = np.searchsorted(ts, errors["ts"].to_numpy() - win, side="left")
        hi = np.searchsorted(ts, errors["ts"].to_numpy(), side="left")
        return pd.DataFrame(
            {
                "event_id": errors["event_id"].astype("int64").to_numpy(),
                "user_id": errors["user_id"].astype("int64").to_numpy(),
                "preceding_5min": (hi - lo).astype("int64"),
            }
        )

    return _salted_lookback(ds, win, salt_days, per_group)


def funnel_conversion(sf_dir: str, window_minutes: int = 30,
                      salt_days: int = 7):
    """Event funnel: how many distinct users clicked within
    ``window_minutes`` of a prior view — the conversion join every
    product-analytics pipeline runs. Composition: the _salted_lookback
    composite (user, bucket) exchange with a 30-minute ghost overlap
    (views within the window before a bucket border replicate into the
    next bucket), a per-group vectorized searchsorted view-before-click
    test, then a distinct-user fold whose footprint is the converted
    USER set, never the event stream."""
    ds = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])
    win = np.timedelta64(window_minutes * 60, "s")

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts").reset_index(drop=True)
        views = g[g["event_type"] == "view"]  # ghosts feed the window
        clicks = g[(g["event_type"] == "click") & ~g["ghost"]]
        if clicks.empty or views.empty:
            return pd.DataFrame({"user_id": pd.Series([], dtype="int64")})
        vts = views["ts"].to_numpy()
        cts = clicks["ts"].to_numpy()
        lo = np.searchsorted(vts, cts - win, side="left")
        hi = np.searchsorted(vts, cts, side="left")  # strictly earlier
        conv = clicks[hi > lo]
        return pd.DataFrame(
            {"user_id": np.unique(conv["user_id"].to_numpy()).astype(
                "int64"
            )}
        )

    users = _salted_lookback(ds, win, salt_days, per_group)
    n = len(users.unique("user_id"))
    return pd.DataFrame({"converted_users": pd.array([n], dtype="int64")})

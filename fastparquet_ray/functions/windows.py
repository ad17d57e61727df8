"""Stream-shaped operators over the events table: tumbling-window
aggregation, as-of join and bounded-lookback windows — custom
operators Ray Data lacks natively, built per the documented
composition rules (ray_guide 'streaming-shaped workloads') on the
segmented-sort recipe: one range sort, vectorized per-block scans,
O(blocks)-bounded border healing on the driver.

Partitioning assumptions (documented per the build brief):
- windowed_agg: none — window key is computed per row, aggregation is
  a partial-then-final groupby on (event_type, window).
- asof_join: ONE range sort on (user_id, ts, event_id) — no group
  co-location, so hot users simply span blocks; unbounded lookback
  heals through an O(blocks) border fold on the driver.
- rolling_avg / range_join / funnel_conversion: same sort; BOUNDED
  lookback heals by replaying each block's win-sized tail into its
  successors (_sorted_window) — O(blocks x window) driver state.
- session_windows: composite (user_id, coarse bucket) exchange key;
  interior sessions stream from workers, border sessions (<= 2 per
  user-bucket) are stitched into cross-bucket chains distributedly.
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


def session_windows(sf_dir: str, gap_minutes: int = 30):
    """Session windows per user (gap > ``gap_minutes`` starts a new
    session): per-session start time and event count.

    Segmented-sort sessionization: ONE range sort on (user_id, ts) —
    no group co-location, so hot users simply span blocks — then a
    vectorized per-block sessionize (user-change | gap break +
    reduceat). Each block emits its INTERIOR sessions directly into
    the streaming output; only its FIRST and LAST sessions (<= 2 per
    block — the only ones that can continue into a neighbor block)
    route to a driver stitch, a single vectorized interval-gap-union
    over O(2 x blocks) candidate rows. The stitch compares real
    timestamps and user ids, so chains spanning any number of blocks
    merge exactly. Event rows never leave the workers."""
    import ray
    import ray.data

    ds = _events(sf_dir, ["user_id", "ts"])
    gap = np.timedelta64(gap_minutes * 60, "s")

    srt = ds.sort(["user_id", "ts"]).materialize()

    empty = pd.DataFrame(
        {
            "user_id": pd.Series([], dtype="int64"),
            "session_start": pd.Series([], dtype="datetime64[us]"),
            "n_events": pd.Series([], dtype="int64"),
        }
    )

    def block_sessions(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return empty.assign(
                last_ts=pd.Series([], dtype="datetime64[us]"),
                border=pd.Series([], dtype="bool"),
            )
        u = df["user_id"].to_numpy()
        ts = df["ts"].to_numpy()
        brk = np.ones(len(df), dtype=bool)
        brk[1:] = (u[1:] != u[:-1]) | ((ts[1:] - ts[:-1]) > gap)
        starts = np.flatnonzero(brk)
        ends = np.concatenate([starts[1:], [len(df)]])
        border = np.zeros(starts.size, dtype=bool)
        border[0] = border[-1] = True  # may continue into neighbors
        return pd.DataFrame(
            {
                "user_id": u[starts].astype("int64"),
                "session_start": ts[starts],
                "n_events": (ends - starts).astype("int64"),
                "last_ts": ts[ends - 1],
                "border": border,
            }
        )

    sessions = srt.map_batches(
        block_sessions, batch_format="pandas", batch_size=None
    ).materialize()  # consumed twice: interior stream + border pull

    def interior(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[~df["border"]]
        return keep[["user_id", "session_start", "n_events"]]

    # driver stitch over O(2 x blocks) border-session rows — never
    # users or events: one vectorized interval-gap-union, breaking
    # where the user changes or the start exceeds the user's running
    # max end + gap (per-user running max via a biased accumulate —
    # segments can never leak: bias step > the global ts range)
    bd = (
        sessions.map_batches(
            lambda df: df[df["border"]], batch_format="pandas",
            batch_size=None,
        )
        .to_pandas()
    )
    fixed = empty
    if len(bd):
        bd = bd.sort_values(
            ["user_id", "session_start", "last_ts"], kind="mergesort"
        ).reset_index(drop=True)
        u = bd["user_id"].to_numpy()
        starts = bd["session_start"].to_numpy()
        lasts_i = bd["last_ts"].to_numpy().astype("datetime64[ns]").astype(
            np.int64
        )
        starts_i = starts.astype("datetime64[ns]").astype(np.int64)
        newu = np.ones(len(bd), dtype=bool)
        newu[1:] = u[1:] != u[:-1]
        seg = np.cumsum(newu) - 1
        # per-user running max end (frame is O(2 x blocks) rows, so a
        # pandas grouped cummax is fine and can't overflow)
        runmax = (
            pd.Series(lasts_i).groupby(seg).cummax().to_numpy()
        )
        gap_ns = np.int64(gap // np.timedelta64(1, "ns"))
        brk = np.ones(len(bd), dtype=bool)
        brk[1:] = newu[1:] | (
            (starts_i[1:] - runmax[:-1]) > gap_ns
        )
        sid_starts = np.flatnonzero(brk)
        sid_ends = np.concatenate([sid_starts[1:], [len(bd)]])
        n = bd["n_events"].to_numpy()
        csum = np.concatenate([[0], np.cumsum(n)])
        fixed = pd.DataFrame(
            {
                "user_id": u[sid_starts].astype("int64"),
                "session_start": starts[sid_starts],
                "n_events": (
                    csum[sid_ends] - csum[sid_starts]
                ).astype("int64"),
            }
        )

    out = sessions.map_batches(interior, batch_format="pandas")
    if len(fixed):
        out = out.union(ray.data.from_pandas(fixed))
    return out


def _seg_adj(df: pd.DataFrame, win_ns: int):
    """Per-block segment geometry for bounded-lookback windows: a
    MONOTONE int64 'adjusted timestamp' array where each user segment
    is rebased to its first row and shifted by seg_id * M with
    M > max_span + win, so one global np.searchsorted stays inside
    the query row's own segment. Returns (adj, win_adj) — in ns, or
    in us when ns would overflow int64 (the event timestamps here are
    us-resolution Parquet values, so us is exact)."""
    u = df["user_id"].to_numpy()
    start = np.ones(len(df), dtype=bool)
    start[1:] = u[1:] != u[:-1]
    seg_id = np.cumsum(start) - 1
    ns = df["ts"].astype("int64").to_numpy() * (
        1000 if df["ts"].dtype == "datetime64[us]" else 1
    )
    base = ns[np.flatnonzero(start)][seg_id]
    rel = ns - base
    span = int(rel.max()) if len(rel) else 0
    n_seg = int(seg_id[-1]) + 1 if len(df) else 0
    m = span + win_ns + 2
    if n_seg * m < 2**62:
        return seg_id * np.int64(m) + rel, np.int64(win_ns)
    rel_us = rel // 1000
    win_us = win_ns // 1000
    m_us = int(rel_us.max()) + win_us + 2
    return seg_id * np.int64(m_us) + rel_us, np.int64(win_us)


def _sorted_window(ds, win_ns: int, block_fn):
    """Shared engine for bounded-lookback window operators
    (rolling_avg, range_join, funnel_conversion): ONE range sort on
    (user_id, ts, event_id) — no group co-location, so hot users
    simply span blocks — then ``block_fn(df, n_front, n_back)``
    vectorized per block, where the first ``n_front`` rows are GHOST
    lookback rows replayed from earlier blocks and the last
    ``n_back`` rows are GHOST equal-ts tie rows replayed from later
    blocks (both feed the window math but must emit no output; the
    tie replay is what keeps SQL RANGE CURRENT ROW semantics — a
    frame includes equal-ts rows positioned after the current one,
    which can land in the next sorted block).

    Border healing: each block contributes its last user-segment's
    rows within ``win`` of the block end plus its leading equal-ts
    tie run — O(blocks x window) rows, bounded by block count times
    the per-user event rate inside one window, never by totals — and
    the driver replays to each block the neighbor-block rows its
    border rows still need. (A tiny block fully inside a window is
    covered too: any row a later block needs is within ``win`` of
    its OWN block's end, so every needed row is in some emitted
    tail.)"""
    import ray
    import ray.data

    srt = ds.sort(["user_id", "ts", "event_id"]).materialize()
    win_td = pd.Timedelta(int(win_ns), unit="ns")

    def edge(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.assign(kind=pd.Series([], dtype="int8"))
        u = df["user_id"].to_numpy()
        ts = df["ts"].to_numpy()
        changes = np.flatnonzero(u[1:] != u[:-1])
        ls = int(changes[-1]) + 1 if changes.size else 0
        tail = df.iloc[ls:]
        tail = tail[tail["ts"] >= df["ts"].iloc[-1] - win_td]
        # leading tie run: same user and ts as the block's first row
        # (earlier blocks need these to close their RANGE tie frames)
        nt = int(
            np.argmin((u == u[0]) & (ts == ts[0]))
            or ((u == u[0]) & (ts == ts[0])).sum()
        )
        hties = df.iloc[:nt]
        out = pd.concat(
            [df.iloc[[0]], df.iloc[[len(df) - 1]], tail, hties],
            ignore_index=True,
        )
        kind = np.concatenate(
            [
                np.array([0, 3], dtype=np.int8),  # head / last row
                np.ones(len(tail), dtype=np.int8),  # win-tail
                np.full(len(hties), 2, dtype=np.int8),  # head ties
            ]
        )
        return out.assign(kind=kind)

    # O(blocks x window) edge rows — head/last + win-tail + tie run
    # per block, never totals (the documented worst case: a user
    # emitting the whole window's traffic into one border)
    bd = (
        srt.map_batches(edge, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    carry: dict[tuple, pd.DataFrame] = {}
    back: dict[tuple, pd.DataFrame] = {}
    heads = bd[bd["kind"] == 0].sort_values(
        ["user_id", "ts", "event_id"]
    ).reset_index(drop=True)
    lasts = bd[bd["kind"] == 3].sort_values(
        ["user_id", "ts", "event_id"]
    ).reset_index(drop=True)
    tails = bd[bd["kind"] == 1]
    hties = bd[bd["kind"] == 2]
    if len(heads) > 1 and len(tails):
        tu = tails["user_id"].to_numpy()
        tts = tails["ts"].to_numpy()
        teid = tails["event_id"].to_numpy()
        for h in heads.iloc[1:].itertuples(index=False):
            # rows an earlier block must replay into this one: same
            # user, within win of the block's first row, and sorted
            # strictly before it
            need = (
                (tu == h.user_id)
                & (tts >= h.ts - win_td)
                & (
                    (tts < h.ts)
                    | ((tts == h.ts) & (teid < h.event_id))
                )
            )
            if need.any():
                carry[(h.ts, h.event_id)] = (
                    tails[need].drop(columns=["kind"])
                )
    if len(heads) > 1 and len(hties):
        hu = hties["user_id"].to_numpy()
        hts = hties["ts"].to_numpy()
        heid = hties["event_id"].to_numpy()
        for i in range(len(lasts) - 1):  # the last block needs none
            last = lasts.iloc[i]
            h = heads.iloc[i]
            # equal-ts tie rows sorted strictly after this block's
            # last row live at the head of later blocks
            need = (
                (hu == last["user_id"])
                & (hts == last["ts"])
                & (heid > last["event_id"])
            )
            if need.any():
                back[(h["ts"], int(h["event_id"]))] = (
                    hties[need].drop(columns=["kind"])
                )
    # broadcast is O(straddling blocks x window) rows — block-bounded
    ref = ray.put((carry, back))

    def wrapped(df: pd.DataFrame, _memo={}) -> pd.DataFrame:
        if df.empty:
            return block_fn(df, 0, 0)
        if "c" not in _memo:
            _memo["c"] = ray.get(ref)  # O(blocks x window), tiny
        key = (df["ts"].iloc[0], int(df["event_id"].iloc[0]))
        gh = _memo["c"][0].get(key)
        bk = _memo["c"][1].get(key)
        if gh is None and bk is None:
            return block_fn(df, 0, 0)
        parts = [p for p in (gh, df, bk) if p is not None]
        return block_fn(
            pd.concat(parts, ignore_index=True),
            0 if gh is None else len(gh),
            0 if bk is None else len(bk),
        )

    return srt.map_batches(
        wrapped, batch_format="pandas", batch_size=None
    )


def rolling_avg(sf_dir: str, window_minutes: int = 10):
    """Moving time-window average per user: for every event, the mean
    of `value` over the user's events in the preceding
    ``window_minutes`` RANGE frame (inclusive of the current row and
    of ts ties on both frame edges — SQL RANGE semantics, not ROWS).
    Composition: the _sorted_window engine (one range sort, ghost
    lookback rows replayed across block borders), then ONE prefix-sum
    + two segment-bounded searchsorteds per BLOCK — O(n log n), no
    per-group dispatch, no pairwise expansion."""
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])
    win_ns = 60_000_000_000 * window_minutes

    def block_fn(df: pd.DataFrame, ng: int, nb: int) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "avg_win": pd.Series([], dtype="float64"),
                }
            )
        adj, w = _seg_adj(df, win_ns)
        v = df["value"].to_numpy(np.float64)
        cs = np.concatenate([[0.0], np.cumsum(v)])
        # RANGE frame: every row with ts in [t - win, t], including
        # equal-ts rows positioned after the current one
        lo = np.searchsorted(adj, adj - w, side="left")
        hi = np.searchsorted(adj, adj, side="right")
        avg = (cs[hi] - cs[lo]) / (hi - lo)
        keep = np.ones(len(df), dtype=bool)
        keep[:ng] = False  # ghosts feed the math, emit nothing
        if nb:
            keep[-nb:] = False
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy()[keep].astype(
                    "int64"
                ),
                "user_id": df["user_id"].to_numpy()[keep].astype(
                    "int64"
                ),
                "avg_win": np.round(avg, 6)[keep],
            }
        )

    return _sorted_window(ds, win_ns, block_fn)


def _range_extremum(v: np.ndarray, lo: np.ndarray, hi: np.ndarray, op):
    """Vectorized range-extremum queries over v[lo:hi) via a sparse
    table (doubling op-folded arrays): table[k][i] = op over
    v[i:i+2^k]; each query is answered by two overlapping
    power-of-two lookups. O(n log n) build, O(n) per level answer —
    no monotonic-deque row loop. Requires hi > lo for every query."""
    ln = hi - lo
    kmax = int(np.floor(np.log2(int(ln.max())))) if len(v) else 0
    tables = [v]
    for k in range(1, kmax + 1):
        prev = tables[-1]
        step = 1 << (k - 1)
        tables.append(op(prev[:-step], prev[step:]))
    ks = np.floor(np.log2(ln)).astype(np.int64)
    out = np.empty(len(v), dtype=v.dtype)
    for k in range(kmax + 1):
        m = ks == k
        if not m.any():
            continue
        p = 1 << k
        t = tables[k]
        out[m] = op(t[lo[m]], t[hi[m] - p])
    return out


def rolling_minmax(sf_dir: str, window_minutes: int = 10):
    """Moving time-window max AND min of `value` per user over the
    preceding ``window_minutes`` RANGE frame (SQL RANGE semantics —
    equal-ts rows on both frame edges included).

    Composition: the _sorted_window engine (one range sort, ghost
    lookback rows replayed across block borders) then a per-block
    SPARSE-TABLE range-extremum (see _range_extremum) — min/max are
    not prefix-summable like rolling_avg's mean, so the doubling
    table replaces the prefix sum at the same O(n log n) vectorized
    cost. No per-group dispatch, no deque row loop."""
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])
    win_ns = 60_000_000_000 * window_minutes

    def block_fn(df: pd.DataFrame, ng: int, nb: int) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame(
                {
                    "event_id": pd.Series([], dtype="int64"),
                    "user_id": pd.Series([], dtype="int64"),
                    "max_win": pd.Series([], dtype="float64"),
                    "min_win": pd.Series([], dtype="float64"),
                }
            )
        adj, w = _seg_adj(df, win_ns)
        v = df["value"].to_numpy(np.float64)
        lo = np.searchsorted(adj, adj - w, side="left")
        hi = np.searchsorted(adj, adj, side="right")
        mx = _range_extremum(v, lo, hi, np.maximum)
        mn = _range_extremum(v, lo, hi, np.minimum)
        keep = np.ones(len(df), dtype=bool)
        keep[:ng] = False
        if nb:
            keep[-nb:] = False
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy()[keep].astype(
                    "int64"
                ),
                "user_id": df["user_id"].to_numpy()[keep].astype(
                    "int64"
                ),
                "max_win": mx[keep],
                "min_win": mn[keep],
            }
        )

    return _sorted_window(ds, win_ns, block_fn)


def range_join(sf_dir: str):
    """Range (band) join: pair each 'error' event with the count of
    events of the same user within the preceding 5 minutes.
    Composition: the _sorted_window engine (one range sort, ghost
    lookback rows replayed across block borders), then a per-block
    segment-bounded searchsorted — no pairwise blowup, no per-group
    dispatch."""
    ds = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])
    win_ns = 300_000_000_000

    def block_fn(df: pd.DataFrame, ng: int, nb: int) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "preceding_5min": pd.Series([], dtype="int64"),
            }
        )
        if df.empty:
            return empty
        err = (df["event_type"] == "error").to_numpy()
        err[:ng] = False  # ghosts emit nothing
        if nb:
            err[-nb:] = False
        epos = np.flatnonzero(err)
        if epos.size == 0:
            return empty
        adj, w = _seg_adj(df, win_ns)
        lo = np.searchsorted(adj, adj[epos] - w, side="left")
        hi = np.searchsorted(adj, adj[epos], side="left")
        return pd.DataFrame(
            {
                "event_id": df["event_id"].to_numpy()[epos].astype(
                    "int64"
                ),
                "user_id": df["user_id"].to_numpy()[epos].astype(
                    "int64"
                ),
                "preceding_5min": (hi - lo).astype("int64"),
            }
        )

    return _sorted_window(ds, win_ns, block_fn)


def funnel_conversion(sf_dir: str, window_minutes: int = 30):
    """Event funnel: how many distinct users clicked within
    ``window_minutes`` of a prior view — the conversion join every
    product-analytics pipeline runs. Composition: pre-filter to
    clicks + views, the _sorted_window engine (one range sort, ghost
    lookback rows replayed across block borders), a per-block
    segment-bounded searchsorted view-before-click test, then a
    distinct-user fold whose footprint is the converted USER set,
    never the event stream."""
    ds = _events(sf_dir, ["event_id", "user_id", "event_type", "ts"])
    win_ns = 60_000_000_000 * window_minutes

    def prefilter(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["event_type"].isin(("click", "view"))]

    def block_fn(df: pd.DataFrame, ng: int, nb: int) -> pd.DataFrame:
        empty = pd.DataFrame({"user_id": pd.Series([], dtype="int64")})
        if df.empty:
            return empty
        isview = (df["event_type"] == "view").to_numpy()
        click = (df["event_type"] == "click").to_numpy()
        click[:ng] = False  # ghosts feed the window, emit nothing
        if nb:
            click[-nb:] = False
        cpos = np.flatnonzero(click)
        if cpos.size == 0 or not isview.any():
            return empty
        adj, w = _seg_adj(df, win_ns)
        vadj = adj[isview]
        lo = np.searchsorted(vadj, adj[cpos] - w, side="left")
        hi = np.searchsorted(vadj, adj[cpos], side="left")  # strict
        conv = cpos[hi > lo]
        return pd.DataFrame(
            {
                "user_id": np.unique(
                    df["user_id"].to_numpy()[conv]
                ).astype("int64")
            }
        )

    users = _sorted_window(
        ds.map_batches(prefilter, batch_format="pandas"), win_ns, block_fn
    )
    n = len(users.unique("user_id"))
    return pd.DataFrame({"converted_users": pd.array([n], dtype="int64")})

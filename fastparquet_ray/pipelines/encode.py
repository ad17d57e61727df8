"""The flagship encode pipeline (SURVEY.md §3.4 lifecycle):

    read_parquet(shards)                        stateless read tasks
      -> [skew] salted groupby-source shuffle   explicit, optional
      -> map_batches(EncodeShard, actor pool)   shared symbol tables
      -> shard files + manifest records         idempotent per partition

Streaming end-to-end: the only driver-side materialization is the tiny
manifest dataset (one row per partition). Resume prunes finished
partition ids before encoding (reference analog: append='overwrite',
/root/reference/fastparquet/writer.py:1014-1032).

Ray is NEVER initialised here — callers (bench.py / tests / driver)
own the session.
"""

from __future__ import annotations

import os
from typing import Any

from ..data import SOURCES
from ..plan import CodecPlan, sample_fragments, train_plan
from ..stages.encode_stage import EncodeShard, add_salt_column
from ..state.manifest import Manifest

# The encode batch is ONE Ray block (batch_size=None): block formation
# from identical inputs is deterministic, so content-hashed partition
# ids are stable across runs — the property resume relies on. Shard
# size is governed by the read's block size (DataContext
# target_max_block_size, default 128 MiB — a sane shard size at 100 TB).
DEFAULT_BATCH_ROWS = None


def make_plan(paths: list[str], outer: tuple | None = None) -> CodecPlan:
    """Stats/sampling pass -> CodecPlan (driver-side tiny reduce over
    a distributed, stratified, bounded sample); deterministic. With an
    outer block codec, per-column codecs are ranked by post-outer
    size."""
    return train_plan(sample_fragments(paths), outer=outer)


def salted_shuffle(ds, plan: CodecPlan, total_buckets: int = 32):
    """Explicit skew handling: hash-shuffle on (source, salt) where the
    per-source salt-bucket count is proportional to sampled frequency,
    so the hottest source splits into many partitions instead of one
    giant one. This is the one all-to-all exchange in the pipeline —
    applied only when the caller asks for source-partitioned output."""
    import pyarrow as pa

    hist = plan.stats.get("__source_hist__") or {}
    total = sum(hist.values()) or 1
    buckets = {
        s: max(1, round(total_buckets * c / total)) for s, c in hist.items()
    }
    for s in SOURCES:
        buckets.setdefault(str(s), 1)

    ds = ds.map_batches(
        lambda b: add_salt_column(b, buckets),
        batch_format="pyarrow",
    )

    def regroup(group: pa.Table) -> pa.Table:
        return group

    # single int key (encodes source + salt) keeps the sort-based
    # shuffle comparison cheap
    return ds.groupby("__salt__").map_groups(regroup, batch_format="pyarrow")


def encode_pipeline(
    paths: list[str] | str,
    out_dir: str,
    plan: CodecPlan | None = None,
    resume: bool = True,
    batch_rows: int | None = DEFAULT_BATCH_ROWS,
    concurrency: Any = None,
    partition_by_source: bool | str = False,
    key_column: str = "doc_id",
    outer: str | None = None,
    column_codecs: dict | None = None,
    bloom_cols: list[str] | None = None,
    hive_cols: list[str] | None = None,
    cluster_by: str | None = None,
    retrain_on_drift: float | None = None,
    filesystem=None,
) -> dict:
    """Run the encode job; returns summary metrics (rows, bytes, ratio,
    partitions encoded vs skipped).

    partition_by_source:
      False     - no source partitioning (zero exchanges)
      True      - salted groupby shuffle: each (source, salt) bucket
                  lands in ONE shard (fewest shards; one all-to-all)
      "local"   - write-side partitioning: every input block splits by
                  bucket locally and writes one shard per non-empty
                  (block, bucket) — shards are still source-pure but
                  there are more of them; ZERO network exchange (the
                  scale pattern when co-location isn't required)

    hive_cols: hive `key=value` directory layout (reference
    partition_on, writer.py:1066-1105): each block splits locally by
    these columns, the columns are dropped from the payload and stored
    in the shard path; decode_dataset reconstructs them (M8).

    retrain_on_drift: append-time vocabulary-drift policy (NEXT r4
    #3). When resuming with a stored plan, the (cheap, distributed,
    deterministic) sampling pass runs over the CURRENT inputs and
    measures, per shared-rank-table column, the fraction of sampled
    values the stored table cannot rank. If the worst ratio exceeds
    this threshold the plan re-trains on that sample; the manifest
    sidecar MERGES symbol tables so shards encoded under the old plan
    stay decodable. The summary reports drift_ratio / plan_retrained
    either way. None (default) = manual flow, no extra sampling pass.

    cluster_by: opt-in range sort on this column before encoding
    (reference analog: sorted row-group writes detected by
    sorted_partitioned_columns, api.py:609-628). Shards then hold
    disjoint key ranges, so key filters prune to O(1) shards through
    the header min/max stats. Costs one all-to-all sort; mutually
    exclusive with the salted shuffle. A LIST of 2-3 columns selects
    Z-ORDER clustering instead (pipelines/zorder.py): the sort key is
    the Morton interleave of the normalized columns, so shards cover
    small hyper-rectangles and the same per-column header stats prune
    MULTI-dimensional filters — same single exchange, plus one cheap
    profile pass for the normalization bounds.
    """
    if cluster_by and partition_by_source is True:
        raise ValueError(
            "cluster_by and partition_by_source=True are mutually "
            "exclusive (two conflicting global layouts)"
        )
    import ray
    import ray.data

    from ..state import fs as fsmod

    if isinstance(paths, str):
        # a directory (possibly a URI) -> enumerate its parquet
        # fragments; a single file -> one-element list
        in_fs, in_root = fsmod.get_fs(paths)
        proto = "" if fsmod.is_local(in_fs) else paths.split("://", 1)[0] + "://"
        if in_fs.isdir(in_root):
            paths = sorted(
                proto + p
                for p in in_fs.glob(fsmod.join(in_fs, in_root, "*.parquet"))
            )
        else:
            paths = [paths]
    out_fs, out_root = fsmod.get_fs(out_dir, filesystem)
    out_fs.makedirs(out_root, exist_ok=True)
    manifest = Manifest(out_dir, filesystem=filesystem)

    outer_spec = None
    if outer is not None:
        # "zstd" or "zstd:5" — outer block codec over encoded buffers
        # (reference analog: compression.py codec registry, E18)
        name, _, lvl = outer.partition(":")
        outer_spec = (name, int(lvl) if lvl else None)
    drift_ratio = None
    plan_retrained = False
    if plan is None:
        if resume and manifest.has_plan():
            plan = manifest.load_plan()
            if outer_spec is not None:
                plan.outer = outer_spec
            if retrain_on_drift is not None:
                from ..plan import measure_drift

                sample = sample_fragments(paths)
                drift = measure_drift(plan, sample)
                drift_ratio = max(drift.values(), default=0.0)
                if drift_ratio > retrain_on_drift:
                    plan = train_plan(sample, outer=plan.outer)
                    plan_retrained = True
        else:
            plan = make_plan(paths, outer=outer_spec)
    elif outer_spec is not None:
        plan.outer = outer_spec
    if column_codecs:
        # per-column user override, reference analog: the per-column
        # compression dict incl. '_default' (writer.py:829-860)
        plan.specs.update(column_codecs)
    if bloom_cols:
        # opt-in equality-pruning bloom filters: flag rides in the
        # column spec, built in the container stats path per shard
        for c in bloom_cols:
            plan.specs.setdefault(c, {})["bloom"] = True
    manifest.write_plan(plan)

    finished = manifest.finished_ids() if resume else set()
    finished_ref = ray.put(finished) if finished else None
    if concurrency is None:
        # fixed pool reserving ~3/4 of the session's CPUs; the rest go
        # to the read (and shuffle) stages. The read share must SCALE
        # with the session (a constant 2-CPU remainder makes the read
        # stage a data-proportional serial term and caps scaling);
        # a pool that reserves every CPU starves upstream and
        # deadlocks; an autoscaling (1, n) pool measured ~2x slower
        # (scales up too late).
        ncpu = int(ray.cluster_resources().get("CPU", 4))
        concurrency = max(2, ncpu - max(1, ncpu // 4))

    # cap read parallelism: parquet decode is memory-bandwidth-bound and
    # measured to ANTI-scale past ~8 concurrent readers on one node
    # (0.38 GB/s @8 tasks -> 0.19 @32); on a multi-node cluster the cap
    # is per-node ~8 readers, which this mirrors.
    # override_num_blocks = one block per input file: block formation
    # then depends ONLY on each file (not the whole input set), so
    # content-addressed partition ids stay stable under APPENDS of new
    # files (reference append mode, writer.py:973-1032). Trade-off:
    # upstream files should be written at roughly block size (norm for
    # training-data lakes; our generator and any 128-512 MB layout).
    ncpu_total = int(ray.cluster_resources().get("CPU", 4))
    # exactly 1/4 of CPUs, capped at 8/node: a floor of 2 readers made
    # the 4-CPU:16-CPU split 2:4 instead of 1:4 — the low-parallelism
    # side got relatively MORE read bandwidth, skewing any N -> 4N
    # comparison (and the protocol documents a proportional split)
    read_conc = max(1, min(8, ncpu_total // 4))
    # provenance column salts partition ids so duplicate input files
    # don't collapse into one shard — skipped iff the user's schema
    # already owns a "path" column (then ids are content-only again;
    # the user's column is encoded untouched — ADVICE r02)
    import pyarrow.parquet as _pq

    first_fs, first_rp = fsmod.get_fs(paths[0])
    with first_fs.open(first_rp, "rb") as _f:
        user_has_path = "path" in _pq.ParquetFile(_f).schema_arrow.names
    ds = ray.data.read_parquet(
        paths,
        concurrency=read_conc,
        override_num_blocks=len(paths),
        # no provenance column under cluster_by: a range sort
        # redistributes rows anyway, so file-identity salting of
        # partition ids no longer applies (content hashing still makes
        # ids unique and resume-safe)
        include_paths=not user_has_path and not cluster_by,
    )
    provenance_col = (
        None if user_has_path or cluster_by else "path"
    )
    cluster_split: list[str] = []
    if cluster_by:
        # DETERMINISTIC range re-layout (pipelines/cluster.py) instead
        # of Dataset.sort: sort's randomly-sampled boundaries change
        # every run, which changed every content-hashed partition id
        # and silently disabled resume for clustered layouts. The
        # bucket exchange costs the same single all-to-all, keeps
        # shard key ranges disjoint (same pruning contract), and makes
        # partition ids a pure function of the data — a re-run (or a
        # killed run restarted) skips finished buckets.
        from .cluster import (
            BUCKET_COL,
            bucket_layout,
            sample_boundaries,
            target_buckets,
            total_input_rows,
        )

        total_rows = total_input_rows(paths)
        n_buckets = target_buckets(total_rows)
        if isinstance(cluster_by, (list, tuple)):
            # z-order layout: one profile pass (summary-scaled) for
            # the normalization bounds, derive the Morton key, bucket
            # on it — shards land on small hyper-rectangles of the
            # clustered columns and the same header min/max stats
            # prune filters on EVERY key column
            from .zorder import ZKEY_COL, add_zkey, zorder_profile

            zcols = [str(c).strip() for c in cluster_by]
            if not 2 <= len(zcols) <= 3:
                raise ValueError(
                    "z-order cluster_by needs 2 or 3 columns, got "
                    f"{zcols!r}"
                )
            # profile + boundary sample over KEY-COLUMN-ONLY reads:
            # neither pass may pull the heavy payload columns
            prof_ds = ray.data.read_parquet(paths, columns=zcols)
            prof = zorder_profile(prof_ds, zcols)
            bnd = sample_boundaries(
                ray.data.read_parquet(paths, columns=zcols),
                ZKEY_COL,
                total_rows,
                n_buckets,
                map_key=lambda t, _z=zcols, _p=prof: add_zkey(t, _z, _p),
            )
            ds = bucket_layout(
                ds.map_batches(
                    lambda t, _z=zcols, _p=prof: add_zkey(t, _z, _p),
                    batch_format="pyarrow",
                ),
                ZKEY_COL,
                bnd,
                sort_cols=[ZKEY_COL, key_column],
                drop_cols=[ZKEY_COL],
            )
        else:
            # clustered layout: disjoint cluster-key bucket ranges, so
            # key-equality and range filters prune to O(1) shards via
            # the existing header min/max stats — sorted_detect then
            # reports the column as globally range-partitioned.
            bnd = sample_boundaries(
                ray.data.read_parquet(paths, columns=[cluster_by]),
                cluster_by,
                total_rows,
                n_buckets,
            )
            ds = bucket_layout(
                ds,
                cluster_by,
                bnd,
                sort_cols=[cluster_by, key_column],
            )
        cluster_split = [BUCKET_COL]
        # one shard per bucket: blocks may bundle several buckets, so
        # EncodeShard splits on BUCKET_COL; a row-count batcher would
        # weld disjoint key ranges back together
        batch_rows = None
    if partition_by_source is True:
        ds = salted_shuffle(ds, plan)
    elif partition_by_source == "local":
        # add the salt column only — EncodeShard's split_by does the
        # local bucket split; no exchange. ONE bucket per source:
        # write-side splitting needs source PURITY only — the
        # frequency-proportional sub-buckets exist to bound group sizes
        # in the shuffle mode, and here they merely fragment each block
        # into ~32 tiny shards (measured: 2048 vs 320 partitions at
        # sf0.1, with the per-shard symbol-table overhead that implies)
        from ..data import SOURCES

        hist = plan.stats.get("__source_hist__") or {}
        buckets = {s: 1 for s in hist}
        for s in SOURCES:
            buckets.setdefault(str(s), 1)
        ds = ds.map_batches(
            lambda b: add_salt_column(b, buckets), batch_format="pyarrow"
        )

    split_by = ["__salt__"] if partition_by_source else None
    if cluster_split:
        split_by = (split_by or []) + cluster_split
    if hive_cols:
        # local split by the hive columns (no exchange); composes with
        # the salt column when a salted shuffle was also requested
        split_by = (split_by or []) + list(hive_cols)
    kwargs = {
        "plan_json": plan.to_json(),
        "out_dir": out_dir,
        "finished": finished_ref,
        "key_column": key_column,
        "split_by": split_by,
        "provenance_col": provenance_col,
        "hive_cols": hive_cols,
        "filesystem": filesystem,
    }
    # TASK pool with once-per-worker state (_util.task_state): the
    # encoder's plan parse + shared symbol tables build once per
    # worker process (Ray caches the deserialized function), exactly
    # the actor-pool stateful-stage semantics — without the
    # autoscaling pool's ~2 s per-call spin-up, which dominated small
    # encodes (5.9 -> ~1.5 s warm at sf0.1/32cpu). Tasks also never
    # reserve CPUs ahead of the read stage, so the old tiny-session
    # special case is gone.
    from ..functions._util import task_state

    mani_ds = ds.map_batches(
        task_state(lambda: EncodeShard(**kwargs)),
        batch_format="pyarrow",
        batch_size=batch_rows,
        zero_copy_batch=True,
        concurrency=concurrency,
        num_cpus=1,
    )
    if partition_by_source is True and os.environ.get(
        "GRAFT_PUSH_SHUFFLE", "1"
    ) != "0":
        # push-based shuffle for the one all-to-all exchange (the
        # salted groupby): designed for large multi-node shuffles
        # (pipelined merge, fewer object transfers); on the single-node
        # test box warm A/B measures parity (5.2-5.8s both ways at
        # sf0.1), so this is a cluster-oriented default with an env
        # opt-out. Scoped to execution (flag is read when the
        # streaming executor runs, i.e. at take_all) and restored so
        # other pipelines in the session keep the default.
        from ray.data import DataContext

        _ctx = DataContext.get_current()
        _prev_push = _ctx.use_push_based_shuffle
        _ctx.use_push_based_shuffle = True
        try:
            records = mani_ds.take_all()  # tiny: one row per partition
        finally:
            _ctx.use_push_based_shuffle = _prev_push
    else:
        records = mani_ds.take_all()  # tiny: one row per partition
    # overwrite semantics: the manifest holds EXACTLY this run's
    # partition set, and shards from older runs over a different input
    # set / block configuration are deleted — otherwise decode would
    # silently return duplicated rows
    manifest.write_records(records)
    orphans = manifest.remove_orphan_shards(
        {r["partition_id"] for r in records}
    )
    encoded = [r for r in records if r["status"] == "encoded"]
    skipped = [r for r in records if r["status"] == "skipped"]
    raw = sum(r["raw_bytes"] for r in records)
    enc = sum(r["enc_bytes"] for r in records)
    return {
        "partitions": len(records),
        "encoded": len(encoded),
        "skipped": len(skipped),
        "orphans_removed": orphans,
        "rows": int(sum(r["rows"] for r in records)),
        "raw_bytes": int(raw),
        "enc_bytes": int(enc),
        "ratio": (enc / raw) if raw else None,
        # aggregate vocabulary-drift signal (NEXT r4 #3): when this
        # grows across append runs, re-train the plan's shared rank
        # table (encode with resume=False, plan=None)
        "zrank_extras": int(
            sum(r.get("zrank_extras", 0) or 0 for r in records)
        ),
        # retrain_on_drift policy outcome (None/False when the policy
        # was off or no stored plan was being reused)
        "drift_ratio": drift_ratio,
        "plan_retrained": plan_retrained,
        "out_dir": out_dir,
    }

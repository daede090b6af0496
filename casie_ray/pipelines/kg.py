"""The flagship pipeline: transcripts -> knowledge-graph tables.

Physical plan (SURVEY §4.3), all Ray Data, streaming executor:

  Stage A (fully fused, one execution per WAVE of resumable groups;
  conv-partitioned layout -> ZERO shuffles — see extract_group_ds for
  the general-layout groupby(conv_id) fallback):
    from_items(shard paths of the wave)
      .map_batches(ShardFileExtractor, actor pool) # T1/T2+T4/T5 seats:
                                                   # detect + doc logic +
                                                   # roles + realis + coref;
                                                   # each task ALSO emits +
                                                   # partially dedupes (S8/A7
                                                   # combiner) + writes its
                                                   # shard's triples + events
      -> per-shard stats rows -> swap group dirs, commit manifests

  Stage B (global finalize, reruns cheaply on resume; hash-shuffle):
    read raw triples
      -> entity-block hash exchange -> cosine merges -> union-find
      -> rewrite to canonical nodes
      -> (subj,pred,obj) hash exchange -> vectorized exact dedup
      -> edges (unique triples), nodes (degree-aggregated)

The driver owns no Ray session: callers (tests / bench / CLI) init Ray.
"""

from __future__ import annotations

import glob
import os
import shutil
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..ops.bucketing import bucket_groupby
from ..stages.detect import DetectTagger, ShardFileExtractor
from ..stages.doclogic import extract_events_group
from ..stages.triples import (
    emit_nodes_batch, emit_triples_batch, extract_surface_nodes,
    final_dedup_group, final_nodes_group, merge_edges_multi, partial_dedup,
    rewrite_triples,
)
from ..state import manifest


def _ray_data():
    import ray.data  # deferred so non-Ray callers can import the module
    return ray.data


def list_transcript_files(corpus_dir: str) -> list[str]:
    tdir = os.path.join(corpus_dir, "transcripts")
    if os.path.isdir(tdir):
        return sorted(glob.glob(os.path.join(tdir, "*.parquet")))
    return sorted(glob.glob(os.path.join(corpus_dir, "*.parquet")))


def extract_group_ds(files: list[str], entities_ref, *,
                     detect_concurrency=None, batch_size: int = 256,
                     conv_partitioned: bool = True,
                     events_dir: str | None = None,
                     sink: dict | None = None):
    """Build the stage-A Dataset (lazy) for one group of input shards.

    ``conv_partitioned=True`` (the corpus layout guarantee: conversations
    never span shards) runs the ZERO-SHUFFLE path — whole shards stream
    through the ShardExtractor actor pool and extraction needs no
    exchange at all. With ``sink`` set the tasks also write their own
    events + partially-deduped triples (fully fused hot path; see
    ShardFileExtractor) and the Dataset yields only per-shard stats
    rows. ``conv_partitioned=False`` is the general-layout fallback: a
    detect actor pool followed by a ``groupby(conv_id)`` sort shuffle."""
    import ray

    rd = _ray_data()
    if detect_concurrency is None:
        ncpu = int(ray.cluster_resources().get("CPU", 4))
        if sink is not None:
            # fully fused path: no downstream stage exists, so the
            # actor pool takes every slot
            detect_concurrency = max(2, ncpu)
        else:
            # actor pool takes 3/4 of CPUs, leaving headroom for the
            # read / write / shuffle stages so the executor never
            # starves them
            detect_concurrency = max(2, (ncpu * 3) // 4)
    if conv_partitioned:
        ds = rd.from_items(files)
        return ds.map_batches(
            ShardFileExtractor,
            fn_constructor_args=(entities_ref, events_dir, sink),
            batch_format="pyarrow",
            batch_size=1,                # one shard file per actor call
            concurrency=detect_concurrency,
        )
    ds = rd.read_parquet(files,
                         columns=["conv_id", "turn_idx", "text", "ts"])
    ds = ds.map_batches(
        DetectTagger,
        fn_constructor_args=(entities_ref,),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=detect_concurrency,
    )
    # fused doc-logic + role/realis + coref: one conv_id shuffle (see
    # stages/doclogic.extract_events_group for the unfused variant used
    # when real role/realis models occupy their actor-pool seats)
    ds = ds.groupby("conv_id").map_groups(extract_events_group,
                                          batch_format="pyarrow")
    return ds


def _prune_stale_groups(root: str, n_groups: int) -> None:
    """Remove group output dirs (and leftover temps) whose gid is outside
    the current run's group range — stale output from a prior run with a
    different grouping would otherwise be globbed into finalize."""
    for d in glob.glob(os.path.join(root, "group-*")) + \
            glob.glob(os.path.join(root, ".group-*.tmp")):
        base = os.path.basename(d)
        try:
            gid = int(base.strip(".").split("-")[1].split(".")[0])
        except (IndexError, ValueError):
            gid = -1
        if gid < 0 or gid >= n_groups:
            shutil.rmtree(d, ignore_errors=True)


def _prune_stale_manifests(out_dir: str, n_groups: int) -> None:
    mdir = manifest.manifest_dir(out_dir)
    for p in glob.glob(os.path.join(mdir, "group-*.json")):
        try:
            gid = int(os.path.basename(p).split("-")[1].split(".")[0])
        except (IndexError, ValueError):
            gid = -1
        if gid < 0 or gid >= n_groups:
            try:
                os.remove(p)
            except OSError:
                pass


GROUP_SIZE = 512


def _stable_groups(out_dir: str, files: list[str],
                   group_size: int = GROUP_SIZE) -> list[list[str]]:
    """Persistent file->group assignment (state/groups.json keyed by
    shard basename). Existing shards keep their group id forever; new
    shards fill the last non-full group, then open new ids. Groups whose
    file set is unchanged stay manifest-complete on a re-run, so only
    the groups touched by new data are extracted."""
    import json
    os.makedirs(manifest.manifest_dir(out_dir), exist_ok=True)
    path = os.path.join(manifest.manifest_dir(out_dir), "groups.json")
    assign: dict[str, int] = {}
    if os.path.exists(path):
        with open(path) as f:
            assign = json.load(f)
    by_base = {os.path.basename(p): p for p in files}
    # drop assignments for shards no longer present
    assign = {b: g for b, g in assign.items() if b in by_base}
    sizes: dict[int, int] = {}
    for g in assign.values():
        sizes[g] = sizes.get(g, 0) + 1
    nxt = max(sizes) if sizes else 0
    for base in sorted(by_base):
        if base in assign:
            continue
        while sizes.get(nxt, 0) >= group_size:
            nxt += 1
        assign[base] = nxt
        sizes[nxt] = sizes.get(nxt, 0) + 1
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(assign, f, sort_keys=True)
    os.replace(tmp, path)
    n = max(assign.values()) + 1 if assign else 0
    groups: list[list[str]] = [[] for _ in range(n)]
    for base in sorted(assign):
        groups[assign[base]].append(by_base[base])
    # keep empty slots: the list INDEX is the persisted gid (renumbering
    # would mismatch existing group dirs/manifests); the run loop clears
    # emptied groups' output
    return groups


# groups per fused extraction wave: ONE dataset execution covers a wave
# of resume groups, amortizing the per-execution fixed cost (actor-pool
# spin-up + pipeline drain, ~1.5-2 s measured) that a per-group loop
# pays per group — at corpus scale (thousands of groups) that loop cost
# is serial hours. Manifests still commit per GROUP after each wave, so
# the resume unit stays the group; the wave only bounds how much
# completed work an interrupted run can lose.
WAVE_GROUPS = 8


def _extract_fused_waves(out_dir, raw_root, ev_root, pending, entities_ref,
                         cfg, *, detect_concurrency=None,
                         keep_events=True) -> None:
    """Fully fused stage A over waves of groups: each shard task writes
    its own events + partially-deduped raw triples into per-group temp
    dirs and returns a stats row; the driver swaps dirs and commits
    manifests per group when the wave's single execution finishes."""
    surf_root = os.path.join(out_dir, "surf")
    for w in range(0, len(pending), WAVE_GROUPS):
        wave = pending[w:w + WAVE_GROUPS]
        gids: dict[str, int] = {}
        files: list[str] = []
        roots = [raw_root, surf_root] + ([ev_root] if keep_events else [])
        for gid, gfiles in wave:
            for root in roots:
                td = os.path.join(root, f".group-{gid:05d}.tmp")
                shutil.rmtree(td, ignore_errors=True)
                os.makedirs(td, exist_ok=True)
            for p in gfiles:
                gids[os.path.basename(p)] = gid
                files.append(p)
        sink = {"gids": gids, "raw_root": raw_root, "suffix": ".tmp",
                "surf_root": surf_root,
                "ev_root": ev_root if keep_events else None}
        stats = extract_group_ds(
            files, entities_ref, detect_concurrency=detect_concurrency,
            conv_partitioned=True, sink=sink).take_all()
        ev_by_gid: dict[int, int] = {}
        turns_by_gid: dict[int, int] = {}
        for r in stats:
            ev_by_gid[r["gid"]] = ev_by_gid.get(r["gid"], 0) \
                + r["n_events"]
            turns_by_gid[r["gid"]] = turns_by_gid.get(r["gid"], 0) \
                + r.get("n_turns", 0)
        for gid, gfiles in wave:
            for root in roots:
                manifest.atomic_dir_swap(
                    os.path.join(root, f".group-{gid:05d}.tmp"),
                    os.path.join(root, f"group-{gid:05d}"))
            manifest.commit(out_dir, gid, cfg, gfiles, {
                "input_files": len(gfiles),
                "events": ev_by_gid.get(gid, 0),
                "turns": turns_by_gid.get(gid, 0),
            })


def run_kg_pipeline(corpus_dir: str, out_dir: str, *,
                    n_groups: int | None = None, resume: bool = True,
                    detect_concurrency=None, batch_size: int = 256,
                    keep_events: bool = True,
                    conv_partitioned: bool = True,
                    group_size: int = GROUP_SIZE,
                    kb_whitelist=None, kb_blacklist=None) -> dict:
    """Run extraction + finalize; returns counters. Requires an active
    Ray session (callers own init/shutdown). ``kb_whitelist``/
    ``kb_blacklist`` override the KB candidate typing filters
    (config.PipelineConfig surface; None -> lexicon defaults)."""
    import ray

    t0 = time.time()
    timings: dict[str, float] = {}
    os.makedirs(out_dir, exist_ok=True)
    files = list_transcript_files(corpus_dir)
    if not files:
        raise FileNotFoundError(f"no transcript shards under {corpus_dir}")
    if n_groups is None:
        # a group is the unit of checkpoint/resume; size it to ~512 input
        # shards so each group saturates the cluster and the per-group
        # barrier cost amortizes (at corpus scale there are thousands of
        # shards -> tens of groups, each itself wide). Assignment is
        # STABLE across runs (persisted file->gid map): appending new
        # shards to the corpus only creates/extends trailing groups, so
        # an incremental re-run extracts just the new data and
        # re-finalizes — streaming KG maintenance at shard granularity.
        groups = _stable_groups(out_dir, files, group_size)
    else:
        groups = [g for g in (files[i::n_groups] for i in range(n_groups))
                  if g]

    from ..stages.detect import load_tagger_state
    entities_ref = ray.put(load_tagger_state(
        os.path.join(corpus_dir, "entities.parquet"),
        kb_whitelist=kb_whitelist, kb_blacklist=kb_blacklist))
    cfg = manifest.config_hash()
    if kb_whitelist is not None or kb_blacklist is not None:
        # non-default typing filters are semantic config: fold them into
        # the manifest hash so resume never reuses default-filter output
        import hashlib as _hl
        cfg = _hl.blake2b(
            (cfg + repr((sorted(kb_whitelist or ()),
                         sorted(kb_blacklist or ())))).encode(),
            digest_size=8).hexdigest()

    raw_root = os.path.join(out_dir, "raw_triples")
    ev_root = os.path.join(out_dir, "events")
    os.makedirs(raw_root, exist_ok=True)
    # a reused out_dir may hold group dirs from a prior run with MORE
    # groups (shrunk corpus / smaller n_groups); finalize globs every
    # group dir, so stale ones would double-count triples — prune them
    _prune_stale_groups(raw_root, len(groups))
    _prune_stale_groups(ev_root, len(groups))
    _prune_stale_groups(os.path.join(out_dir, "surf"), len(groups))
    _prune_stale_manifests(out_dir, len(groups))
    skipped = 0
    pending: list[tuple[int, list[str]]] = []
    for gid, gfiles in enumerate(groups):
        if not gfiles:
            # group emptied by shard removal: clear its stale output so
            # finalize can't double-count it
            for root in (raw_root, ev_root, os.path.join(out_dir, "surf")):
                shutil.rmtree(os.path.join(root, f"group-{gid:05d}"),
                              ignore_errors=True)
            try:
                os.remove(manifest.manifest_path(out_dir, gid))
            except OSError:
                pass
            continue
        if resume and manifest.is_complete(out_dir, gid, cfg, gfiles):
            skipped += 1
            continue
        pending.append((gid, gfiles))

    if conv_partitioned:
        _extract_fused_waves(out_dir, raw_root, ev_root, pending,
                             entities_ref, cfg,
                             detect_concurrency=detect_concurrency,
                             keep_events=keep_events)
    else:
        for gid, gfiles in pending:
            # this layout writes no surf side tables; drop any stale
            # ones a previous fused run left for this group
            shutil.rmtree(os.path.join(out_dir, "surf",
                                       f"group-{gid:05d}"),
                          ignore_errors=True)
            ds = extract_group_ds(gfiles, entities_ref,
                                  detect_concurrency=detect_concurrency,
                                  batch_size=batch_size,
                                  conv_partitioned=False)
            ds = ds.materialize()  # events reused for both outputs
            n_events = ds.count()
            trip = ds.map_batches(emit_triples_batch,
                                  batch_format="pyarrow",
                                  batch_size=None) \
                     .map_batches(partial_dedup, batch_format="pyarrow",
                                  batch_size=None)
            tmp = os.path.join(raw_root, f".group-{gid:05d}.tmp")
            shutil.rmtree(tmp, ignore_errors=True)
            trip.write_parquet(tmp)
            manifest.atomic_dir_swap(tmp, os.path.join(raw_root,
                                                       f"group-{gid:05d}"))
            if keep_events:
                tmp_e = os.path.join(ev_root, f".group-{gid:05d}.tmp")
                shutil.rmtree(tmp_e, ignore_errors=True)
                ds.drop_columns(["args"]).write_parquet(tmp_e)
                manifest.atomic_dir_swap(tmp_e, os.path.join(
                    ev_root, f"group-{gid:05d}"))
            manifest.commit(out_dir, gid, cfg, gfiles, {
                "input_files": len(gfiles), "events": n_events,
            })
    timings["extract"] = round(time.time() - t0, 2)

    # ---- stage B: canonicalize + global dedup + graph materialize ----
    # every stage-B exchange groups by a precomputed bounded-cardinality
    # BUCKET column (4096 key-hash buckets) under the default sort-based
    # shuffle: equal keys co-locate exactly as with a hash repartition,
    # each bucket group is processed by one vectorized Arrow group_by,
    # and no shuffle-strategy override (with its aggregator-actor pool)
    # is needed — measurably faster at this scale and deadlock-free at
    # low CPU counts
    info = _finalize(out_dir, raw_root, groups, skipped, timings, t0)
    turns = manifest.total_counter(out_dir, "turns")
    if turns:
        info["turns"] = turns
    return info


SMALL_FINALIZE_BYTES = 32 * 1024 * 1024
# surf side tables below this total run canonicalization driver-local
# (distinct-surface mass, typically ~1000x smaller than raw triples)
SMALL_CANON_BYTES = 64 * 1024 * 1024


def _finalize_local(out_dir, raw_files, groups, skipped, timings,
                    t0) -> dict:
    """Small-input finalize: the SAME shared kernels as the distributed
    path, applied once in-process. Below the byte cutoff the three
    distributed executions cost more in orchestration than the data
    (the same size-aware escape hatch as the 200k-merge-edge driver
    union-find); output is tested identical to the distributed path."""
    import pyarrow as pa

    from ..ops.graph import components_local
    from ..stages.triples import RAW_TRIPLE_SCHEMA

    t1 = time.time()
    tbl = pa.concat_tables([pq.read_table(f) for f in raw_files]) \
        if raw_files else RAW_TRIPLE_SCHEMA.empty_table()
    medges = merge_edges_multi(extract_surface_nodes(tbl))
    comp = components_local(list(zip(medges.column("src").to_pylist(),
                                     medges.column("dst").to_pylist())))
    mapping = {n: r for n, r in comp.items() if n != r}
    timings["canonicalize"] = round(time.time() - t1, 2)
    t1 = time.time()
    if mapping:
        tbl = rewrite_triples(mapping)(tbl)
    edges_tbl = final_dedup_group(tbl)
    edges_dir = os.path.join(out_dir, "edges")
    tmp = edges_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(edges_tbl, os.path.join(tmp, "part-00000.parquet"))
    manifest.atomic_dir_swap(tmp, edges_dir)
    nodes_tbl = final_nodes_group(emit_nodes_batch(edges_tbl)) \
        .drop_columns(["bucket"])
    nodes_dir = os.path.join(out_dir, "nodes")
    tmp = nodes_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(nodes_tbl, os.path.join(tmp, "part-00000.parquet"))
    manifest.atomic_dir_swap(tmp, nodes_dir)
    timings["dedup_materialize"] = round(time.time() - t1, 2)
    return {"groups": len(groups), "groups_skipped": skipped,
            "edges": edges_tbl.num_rows, "canon_merged": len(mapping),
            "out_dir": out_dir, "timings": timings,
            "wall_sec": round(time.time() - t0, 2)}


def _read_path_chunks(rd, files: list[str], n_blocks: int,
                      columns: list[str] | None = None):
    """Read many small parquet shards as ~``n_blocks`` size-balanced
    blocks WITHOUT ParquetDatasource's driver-side per-file metadata
    prefetch: chunk the path list by cumulative byte size on the driver
    (stat only — no parquet footer reads), then each task reads its
    chunk with ``pq.read_table``. O(1) driver work per file instead of
    a serial footer fetch; the actual reads happen in parallel tasks.

    DEPLOYMENT REQUIREMENT: paths are opened from inside worker tasks,
    so on a multi-node cluster they MUST live on storage every node
    sees — a shared filesystem (NFS/Lustre) or an fsspec URI (s3://,
    gs://); pq.read_table handles either. Node-local paths only work
    on the single-node test rig. The same holds for the fused
    per-group edge writes in ``_finalize`` and the shard sink writes
    in ``ShardFileExtractor`` (stages/detect.py): the whole
    checkpoint/manifest layout assumes one namespace shared by driver
    and workers, exactly as a 100 TB deployment's object store is."""
    sizes = [os.path.getsize(f) for f in files]
    target = max(1, sum(sizes) // max(1, n_blocks))
    chunks: list[list[str]] = []
    cur: list[str] = []
    acc = 0
    for f, s in zip(files, sizes):
        cur.append(f)
        acc += s
        if acc >= target and len(chunks) < n_blocks - 1:
            chunks.append(cur)
            cur, acc = [], 0
    if cur:
        chunks.append(cur)

    def load(batch: "pa.Table") -> "pa.Table":
        paths = [p for chunk in batch.column("paths").to_pylist()
                 for p in chunk]
        tbls = [pq.read_table(p, columns=columns) for p in paths]
        return pa.concat_tables(tbls) if tbls else \
            pq.read_table(files[0], columns=columns).slice(0, 0)

    return rd.from_items([{"paths": c} for c in chunks],
                         override_num_blocks=max(1, len(chunks))) \
        .map_batches(load, batch_format="pyarrow", batch_size=None)


def _finalize(out_dir, raw_root, groups, skipped, timings, t0) -> dict:
    import ray

    t1 = time.time()
    rd = _ray_data()
    raw_files = sorted(glob.glob(
        os.path.join(raw_root, "group-*", "*.parquet")))
    if sum(os.path.getsize(f) for f in raw_files) <= SMALL_FINALIZE_BYTES:
        return _finalize_local(out_dir, raw_files, groups, skipped,
                               timings, t0)
    # canonicalization reads the per-shard surf side tables (distinct
    # surface nodes, a tiny fraction of the raw-triple mass) when the
    # fused extraction wrote them; the general-layout fallback derives
    # them from a pruned raw read
    surf_files = sorted(glob.glob(
        os.path.join(out_dir, "surf", "group-*", "*.parquet")))
    if surf_files and sum(os.path.getsize(f)
                          for f in surf_files) <= SMALL_CANON_BYTES:
        # size-aware escape hatch (same pattern as the 200k-merge-edge
        # driver union-find and the small finalize): below the cutoff
        # the distributed exchange's fixed cost exceeds the work, and
        # the kernels are identical either way
        import pyarrow.dataset as pads

        from ..ops.graph import components_local
        tbl = pads.dataset(surf_files).to_table()
        medges = merge_edges_multi(tbl)
        comp = components_local(
            list(zip(medges.column("src").to_pylist(),
                     medges.column("dst").to_pylist())))
        mapping = {n: r for n, r in comp.items() if n != r}
    else:
        ncpu_s = int(ray.cluster_resources().get("CPU", 4))
        if surf_files:
            surf_ds = _read_path_chunks(rd, surf_files, ncpu_s)
        else:
            surf_ds = _read_path_chunks(rd, raw_files, ncpu_s,
                                        columns=["subj", "obj"]) \
                .map_batches(extract_surface_nodes, batch_format="pyarrow",
                             batch_size=None)
        mapping = compute_canonical_mapping(surf_ds)
    # size read blocks to ~128 MB of on-disk raw triples (never fewer
    # than one per CPU): the raw dir holds one tiny file per input
    # shard, and letting the reader split per-file would pay per-task
    # overhead thousands of times at corpus scale. The read is a manual
    # path-chunk map (the extraction stage's own idiom), NOT
    # read_parquet: ParquetDatasource prefetches per-file metadata on
    # the driver — a measured ~5 ms x len(raw_files) SERIAL constant
    # (3.7 s at sf1.0's 667 shard files) that scales with shard count,
    # not cluster size, and was the single biggest non-scaling term in
    # the 4-vs-16-CPU efficiency measurement.
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    raw_bytes = sum(os.path.getsize(f) for f in raw_files)
    n_blocks = int(max(ncpu, raw_bytes // (128 << 20)))
    raw = _read_path_chunks(rd, raw_files, n_blocks)
    timings["canonicalize"] = round(time.time() - t1, 2)
    t1 = time.time()
    if isinstance(mapping, dict):
        n_merged = len(mapping)
        if mapping:
            raw = raw.map_batches(rewrite_triples(ray.put(mapping)),
                                  batch_format="pyarrow", batch_size=None)
    else:
        # mapping too large to broadcast: bloom-pruned join rewrite
        # (stages.triples.rewrite_triples_ds) — no driver collect
        from ..stages.triples import rewrite_triples_ds
        n_merged = mapping.count()
        raw = rewrite_triples_ds(raw, mapping)
    # ONE fused execution for edges + nodes: the (subj,pred,obj)-keyed
    # exchange co-locates equal triples (4096 hash buckets coarsened to
    # ~4 groups per task slot), each group task runs the vectorized
    # final dedup, WRITES ITS OWN edge parquet shard (deterministic
    # per-group filename -> idempotent under task retry), and emits
    # node partial rows straight into the chained node-keyed exchange —
    # no intermediate read-back of the edge table, no second and third
    # dataset executions with their fixed orchestration cost. Hot keys
    # only grow one group's O(rows) Arrow aggregate, never a per-key
    # Python loop.
    edges_dir = os.path.join(out_dir, "edges")
    tmp = edges_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    m = max(1, ncpu * 4)

    def tag(t: "pa.Table") -> "pa.Table":
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        return t.append_column(
            "cgroup", pa.array((b % m).astype(np.int32)))

    def dedup_write_emit_nodes(g: "pa.Table") -> "pa.Table":
        # writes from worker tasks into `tmp`: requires driver+workers
        # to share one filesystem namespace (see _read_path_chunks)
        cg = int(g.column("cgroup")[0].as_py())
        out = final_dedup_group(g.drop_columns(["cgroup"]))
        pq.write_table(out, os.path.join(tmp, f"part-{cg:05d}.parquet"))
        return emit_nodes_batch(out)

    nodes = raw.map_batches(tag, batch_format="pyarrow",
                            batch_size=None) \
        .groupby("cgroup").map_groups(dedup_write_emit_nodes,
                                      batch_format="pyarrow")
    # the node partials come out of the cgroup exchange already ~one
    # block per task slot — skip the coalesce pass
    nodes = bucket_groupby(nodes, final_nodes_group, coarse_per_cpu=4,
                           pre_repartition=False) \
        .drop_columns(["bucket"])
    nodes_dir = os.path.join(out_dir, "nodes")
    ntmp = nodes_dir + ".tmp"
    shutil.rmtree(ntmp, ignore_errors=True)
    nodes.write_parquet(ntmp)
    manifest.atomic_dir_swap(tmp, edges_dir)
    manifest.atomic_dir_swap(ntmp, nodes_dir)
    edge_files = sorted(glob.glob(os.path.join(edges_dir, "*.parquet")))
    n_edges = sum(pq.ParquetFile(f).metadata.num_rows for f in edge_files)

    timings["dedup_materialize"] = round(time.time() - t1, 2)
    return {"groups": len(groups), "groups_skipped": skipped,
            "edges": n_edges, "canon_merged": n_merged,
            "out_dir": out_dir, "timings": timings,
            "wall_sec": round(time.time() - t0, 2)}


# merge-edge count below which the union-find solves on the driver
DRIVER_UNIONFIND_MAX = 200_000
# mapping-row count above which the canonical mapping stays a Dataset
# and the rewrite runs as bloom-pruned bucketed joins instead of a
# take_all -> dict -> ray.put broadcast (the r4 verdict's one
# whole-table driver collect). ~1M short-string pairs is tens of MB —
# comfortably broadcastable; past that, variant mass tracks web-scale
# entity cardinality and must not land on the driver.
CANON_BROADCAST_MAX = 1_000_000


def compute_canonical_mapping(surf_ds) -> "dict[str, str] | object":
    """Cross-conversation canonicalization over (surface node, entity
    block) rows: groupby(entity_block) cosine merge edges ->
    distributed union-find -> variant node -> canonical node mapping.
    Returns a dict (collected + broadcast) while the mapping is at most
    CANON_BROADCAST_MAX rows; above that returns the (node, label)
    mapping as a materialized Ray Dataset for the join-based rewrite —
    driver memory stays bounded at any entity cardinality."""
    import pyarrow.compute as _pc

    from ..ops.graph import connected_components

    # the input rows are per-shard distinct and the per-block merge
    # kernel dedupes again — no per-node shuffle; the entity_block
    # exchange groups by the block-hash bucket column (equal blocks
    # co-located), each bucket processed vectorized
    medges = bucket_groupby(surf_ds, merge_edges_multi,
                            coarse_per_cpu=4).materialize()
    n_edges = medges.count()
    if n_edges == 0:
        return {}
    if n_edges <= DRIVER_UNIONFIND_MAX:
        # the merge graph is variant-mass-sized; below this cutoff the
        # iterative distributed rounds cost more than collecting the
        # edge list, so solve the union-find on the driver
        from ..ops.graph import components_local
        pairs = [(r["src"], r["dst"]) for r in medges.take_all()]
        comp = components_local(pairs)
        return {n: r for n, r in comp.items() if n != r}
    labels = connected_components(medges)

    def variants_only(t: "pa.Table") -> "pa.Table":
        return t.filter(_pc.not_equal(t.column("node"),
                                      t.column("label")))

    mapping_ds = labels.map_batches(variants_only, batch_format="pyarrow",
                                    batch_size=None).materialize()
    if mapping_ds.count() <= CANON_BROADCAST_MAX:
        return {r["node"]: r["label"] for r in mapping_ds.take_all()}
    return mapping_ds


def read_triples(out_dir: str):
    """Engine triples as a pandas DataFrame (for tests / comparison)."""
    import pandas as pd
    files = sorted(glob.glob(os.path.join(out_dir, "edges", "*.parquet")))
    df = pd.concat([pq.read_table(f).to_pandas() for f in files],
                   ignore_index=True)
    return df.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)


def main():
    """CLI / `ray job submit` entrypoint.

    On a cluster, the Ray Jobs runtime exports RAY_ADDRESS for the
    job driver; the default below picks it up, so the same command
    line works both ways:

        # laptop / single node
        python -m casie_ray.pipelines.kg /data/corpus --out /data/kg

        # fixed-size cluster (N or 4N nodes — the scaling protocol
        # runs the SAME submit at both sizes and compares the
        # turns_per_sec fields of the JSON line below)
        ray job submit --working-dir . -- \
            python -m casie_ray.pipelines.kg /data/corpus --out /data/kg

    The run is resumable: re-submitting after a failure skips
    finished groups via the per-partition manifests.
    """
    import argparse
    import json
    import os

    import ray
    ap = argparse.ArgumentParser()
    ap.add_argument("corpus_dir")
    ap.add_argument("--out", required=True)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--address",
                    default=os.environ.get("RAY_ADDRESS", "local"),
                    help="Ray address: 'local' starts a local "
                         "instance; under `ray job submit` the "
                         "runtime's RAY_ADDRESS connects to the "
                         "cluster (default: $RAY_ADDRESS or local)")
    ap.add_argument("--status", action="store_true",
                    help="print the resume-status manifest summary for "
                         "--out and exit (no Ray, no reads of row data)")
    args = ap.parse_args()
    if args.status:
        print(json.dumps(manifest.summarize(args.out), indent=1))
        return
    if not ray.is_initialized():
        kw = dict(include_dashboard=False, logging_level="ERROR")
        if args.address == "local":
            kw["num_cpus"] = args.num_cpus
        ray.init(address=args.address, **kw)
    try:
        info = run_kg_pipeline(args.corpus_dir, args.out,
                               resume=not args.no_resume)
        info["cluster_cpus"] = int(
            ray.cluster_resources().get("CPU", 0))
        info["cluster_nodes"] = sum(
            1 for n in ray.nodes() if n.get("Alive"))
        if info.get("wall_sec") and info.get("turns"):
            info["turns_per_sec"] = round(
                info["turns"] / info["wall_sec"], 1)
        print(json.dumps(info))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()

"""Distributed-engine correctness: oracle parity, invariants, resume
(SURVEY §5.2 tiers 2-3)."""

from __future__ import annotations

import glob
import os
import shutil

import pandas as pd
import pytest

from casie_ray.scoring import triple_prf


@pytest.fixture(scope="session")
def kg_out(ray_session, smoke_corpus, tmp_path_factory):
    from casie_ray.pipelines.kg import run_kg_pipeline
    out = str(tmp_path_factory.mktemp("kg") / "out")
    info = run_kg_pipeline(smoke_corpus, out, resume=False, n_groups=3)
    assert info["edges"] > 100
    return out


def _triples(out_dir):
    from casie_ray.pipelines.kg import read_triples
    return read_triples(out_dir)


KEY = ["subj", "pred", "obj"]
META = ["subj_type", "obj_type", "conv_id", "turn_idx", "ev_start",
        "ev_end", "count"]


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    out = df[KEY + META].copy()
    for c in ("turn_idx", "ev_start", "ev_end", "count"):
        out[c] = out[c].astype("int64")
    return out.sort_values(KEY).reset_index(drop=True)


def test_engine_matches_oracle_exactly(kg_out, oracle_triples):
    """The P/R >= 0.95 gate — deterministic rules on both sides, so the
    engine must in fact reproduce the oracle bit-for-bit."""
    eng = _triples(kg_out)
    res = triple_prf(oracle_triples, eng)
    assert res["precision"] >= 0.95 and res["recall"] >= 0.95, res
    # strict: full row equality including provenance + dedup counts
    pd.testing.assert_frame_equal(_norm(oracle_triples), _norm(eng))


def test_engine_invariant_under_grouping(ray_session, smoke_corpus, kg_out,
                                         tmp_path):
    """Triple set identical when the resumable-group partitioning and
    batch size change (SURVEY §5.2 invariant 3)."""
    from casie_ray.pipelines.kg import run_kg_pipeline
    out2 = str(tmp_path / "kg2")
    run_kg_pipeline(smoke_corpus, out2, resume=False, n_groups=1,
                    batch_size=64)
    pd.testing.assert_frame_equal(_norm(_triples(kg_out)),
                                  _norm(_triples(out2)))


def test_shuffle_fallback_path_matches(ray_session, smoke_corpus, kg_out,
                                       tmp_path):
    """The general-layout groupby(conv_id) shuffle path produces the
    same triples as the zero-shuffle conv-partitioned hot path."""
    from casie_ray.pipelines.kg import run_kg_pipeline
    out2 = str(tmp_path / "kg_shuffle")
    run_kg_pipeline(smoke_corpus, out2, resume=False, n_groups=2,
                    conv_partitioned=False)
    pd.testing.assert_frame_equal(_norm(_triples(kg_out)),
                                  _norm(_triples(out2)))


def test_resume_skips_completed_groups_and_matches(ray_session, smoke_corpus,
                                                   kg_out, tmp_path):
    """Kill-after-K-partitions resume: drop 2 of 3 group outputs +
    manifests, rerun with resume=True -> only missing groups rerun and
    the final output is identical."""
    from casie_ray.pipelines.kg import run_kg_pipeline
    out3 = str(tmp_path / "kg3")
    info = run_kg_pipeline(smoke_corpus, out3, resume=False, n_groups=3)
    assert info["groups"] == 3
    # simulate a crash that lost groups 1 and 2
    for gid in (1, 2):
        os.remove(os.path.join(out3, "_manifests", f"group-{gid:05d}.json"))
        shutil.rmtree(os.path.join(out3, "raw_triples", f"group-{gid:05d}"))
    info2 = run_kg_pipeline(smoke_corpus, out3, resume=True, n_groups=3)
    assert info2["groups_skipped"] == 1
    pd.testing.assert_frame_equal(_norm(_triples(kg_out)),
                                  _norm(_triples(out3)))


def test_reused_out_dir_with_fewer_groups_prunes_stale(ray_session,
                                                       smoke_corpus, kg_out,
                                                       tmp_path):
    """Rerunning into the same out_dir with FEWER groups must not
    double-count triples from the prior run's extra group dirs."""
    from casie_ray.pipelines.kg import run_kg_pipeline
    out4 = str(tmp_path / "kg4")
    run_kg_pipeline(smoke_corpus, out4, resume=False, n_groups=3)
    info = run_kg_pipeline(smoke_corpus, out4, resume=True, n_groups=1)
    assert info["groups"] == 1
    assert not os.path.exists(
        os.path.join(out4, "raw_triples", "group-00001"))
    pd.testing.assert_frame_equal(_norm(_triples(kg_out)),
                                  _norm(_triples(out4)))


def test_resume_invalidated_by_config_change(ray_session, smoke_corpus,
                                             kg_out, monkeypatch):
    """A manifest whose config hash no longer matches is not trusted."""
    from casie_ray.state import manifest
    files = ["a.parquet"]
    m = manifest.commit(kg_out + "_cfg", 0, "deadbeef", files, {})
    assert m["status"] == "complete"
    assert not manifest.is_complete(kg_out + "_cfg", 0,
                                    manifest.config_hash(), files)
    assert manifest.is_complete(kg_out + "_cfg", 0, "deadbeef", files)


def test_per_turn_text_equality(ray_session, smoke_corpus):
    """Input-hint invariant: the detect stage carries `text` through
    untouched under stable (conv_id, turn_idx) ordering."""
    import pyarrow.parquet as pq
    import ray

    import ray.data as rd
    from casie_ray.pipelines.kg import list_transcript_files
    from casie_ray.stages.detect import DetectTagger
    files = list_transcript_files(smoke_corpus)
    ents = pq.read_table(os.path.join(smoke_corpus, "entities.parquet"))
    ref = ray.put(ents.to_pylist())
    ds = rd.read_parquet(files, columns=["conv_id", "turn_idx", "text", "ts"])
    out = ds.map_batches(DetectTagger, fn_constructor_args=(ref,),
                         batch_format="pyarrow", concurrency=2,
                         batch_size=128)
    got = out.select_columns(["conv_id", "turn_idx", "text"]).to_pandas()
    want = pd.concat([pq.read_table(f).to_pandas()[
        ["conv_id", "turn_idx", "text"]] for f in files])
    key = ["conv_id", "turn_idx"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    want["turn_idx"] = want["turn_idx"].astype(got["turn_idx"].dtype)
    pd.testing.assert_frame_equal(got, want)


def test_events_written_with_manifest_counters(kg_out):
    import json
    mans = sorted(glob.glob(os.path.join(kg_out, "_manifests", "*.json")))
    assert len(mans) == 3
    for mpath in mans:
        m = json.load(open(mpath))
        assert m["status"] == "complete"
        assert m["counters"]["events"] > 0
        assert m["config_hash"]
    assert glob.glob(os.path.join(kg_out, "events", "group-*", "*.parquet"))
    assert glob.glob(os.path.join(kg_out, "nodes", "*.parquet"))


def test_prescreen_mask_is_sound(smoke_corpus):
    """Every turn the vectorized pre-pass marks boring must yield an
    EMPTY detection from the full per-token pass (the skip is only legal
    when provably output-equivalent)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from casie_ray.pipelines.kg import list_transcript_files
    from casie_ray.semantics import detect_turn
    from casie_ray.stages.detect import DetectTagger

    ents = pq.read_table(os.path.join(smoke_corpus, "entities.parquet"))
    tagger = DetectTagger(ents.to_pylist())
    texts = []
    for f in list_transcript_files(smoke_corpus)[:2]:
        texts.extend(pq.read_table(f, columns=["text"])
                     .column("text").to_pylist())
    texts += [
        "",  # empty
        "the quick brown fox .",
        "three million records were mentioned",   # numeral -> interesting
        "a patch arrived",                        # arg word -> interesting
        "cve-2019-1 lowercase still has digits",  # digits -> interesting
        "Zorvex walked in",                       # uppercase -> interesting
    ]
    mask = tagger.interesting_mask(pa.array(texts, pa.string()))
    n_boring = 0
    for text, keep in zip(texts, mask):
        if not keep:
            n_boring += 1
            det = detect_turn(text or "", tagger.catalog, tagger.fuzzy)
            assert det.triggers == [] and det.mentions == [], text
    # the corpus is mostly filler: the pre-pass must actually skip work
    assert n_boring > len(texts) // 3


def test_incremental_update_extracts_only_new_shards(smoke_corpus,
                                                     tmp_path):
    """Streaming KG maintenance: appending shards to the corpus and
    re-running must (a) skip every previously-completed group, (b) give
    byte-identical edges to a from-scratch run over the full corpus."""
    import shutil

    import pandas as pd
    import pyarrow.parquet as pq

    from casie_ray.pipelines.kg import list_transcript_files, run_kg_pipeline

    files = list_transcript_files(smoke_corpus)
    assert len(files) >= 3
    part = tmp_path / "part"
    (part / "transcripts").mkdir(parents=True)
    shutil.copy(os.path.join(smoke_corpus, "entities.parquet"), part)
    for f in files[:-1]:
        shutil.copy(f, part / "transcripts")

    out = str(tmp_path / "kg")
    info1 = run_kg_pipeline(str(part), out, group_size=1)
    assert info1["groups_skipped"] == 0

    # stream in the last shard and update
    shutil.copy(files[-1], part / "transcripts")
    info2 = run_kg_pipeline(str(part), out, group_size=1)
    assert info2["groups_skipped"] == len(files) - 1   # old groups reused

    fresh = str(tmp_path / "kg_fresh")
    run_kg_pipeline(smoke_corpus, fresh, group_size=1)

    def edges(d):
        return pd.concat([pq.read_table(f).to_pandas() for f in
                          sorted(glob.glob(os.path.join(d, "edges",
                                                        "*.parquet")))]) \
            .sort_values(["subj", "pred", "obj"]).reset_index(drop=True)

    pd.testing.assert_frame_equal(edges(out), edges(fresh))


def test_local_and_distributed_finalize_identical(kg_out, tmp_path):
    """The small-input finalize fast path must produce byte-identical
    edges and nodes to the distributed path on the same raw triples."""
    import pandas as pd
    import pyarrow.parquet as pq

    from casie_ray.pipelines import kg as kgmod

    raw_files = sorted(glob.glob(os.path.join(kg_out, "raw_triples",
                                              "group-*", "*.parquet")))
    assert raw_files
    la = str(tmp_path / "local")
    da = str(tmp_path / "dist")
    os.makedirs(la), os.makedirs(da)
    kgmod._finalize_local(la, raw_files, [[]], 0, {}, 0.0)
    # force the distributed path regardless of input size
    orig = kgmod.SMALL_FINALIZE_BYTES
    kgmod.SMALL_FINALIZE_BYTES = -1
    try:
        # distributed _finalize re-globs from a raw_root layout
        import shutil as _sh
        rr = str(tmp_path / "raw_root")
        for f in raw_files:
            gdir = os.path.join(rr, os.path.basename(os.path.dirname(f)))
            os.makedirs(gdir, exist_ok=True)
            _sh.copy(f, gdir)
        kgmod._finalize(da, rr, [[]], 0, {}, 0.0)
    finally:
        kgmod.SMALL_FINALIZE_BYTES = orig

    def load(d, sub, keys):
        files = sorted(glob.glob(os.path.join(d, sub, "*.parquet")))
        return pd.concat([pq.read_table(f).to_pandas() for f in files]) \
            .sort_values(keys).reset_index(drop=True)

    pd.testing.assert_frame_equal(
        load(la, "edges", ["subj", "pred", "obj"]),
        load(da, "edges", ["subj", "pred", "obj"]))
    pd.testing.assert_frame_equal(
        load(la, "nodes", ["node_id"]), load(da, "nodes", ["node_id"]))


def test_join_rewrite_path_identical_to_broadcast(kg_out, tmp_path):
    """Force every scale gate at once — distributed finalize,
    distributed union-find AND the Dataset-mapping join rewrite
    (CANON_BROADCAST_MAX = -1, i.e. a 'mega variant mass' that must
    never land on the driver) — and require byte-identical edges and
    nodes vs the broadcast-dict path on the same raw triples."""
    import pandas as pd
    import pyarrow.parquet as pq

    from casie_ray.pipelines import kg as kgmod

    raw_files = sorted(glob.glob(os.path.join(kg_out, "raw_triples",
                                              "group-*", "*.parquet")))
    assert raw_files
    la = str(tmp_path / "local")
    da = str(tmp_path / "dist")
    os.makedirs(la), os.makedirs(da)
    kgmod._finalize_local(la, raw_files, [[]], 0, {}, 0.0)
    saved = {k: getattr(kgmod, k) for k in
             ("SMALL_FINALIZE_BYTES", "SMALL_CANON_BYTES",
              "DRIVER_UNIONFIND_MAX", "CANON_BROADCAST_MAX")}
    for k in saved:
        setattr(kgmod, k, -1)
    try:
        rr = str(tmp_path / "raw_root")
        for f in raw_files:
            gdir = os.path.join(rr, os.path.basename(os.path.dirname(f)))
            os.makedirs(gdir, exist_ok=True)
            shutil.copy(f, gdir)
        info = kgmod._finalize(da, rr, [[]], 0, {}, 0.0)
        # the forced path must actually have merged variants (otherwise
        # this test exercises nothing)
        assert info["canon_merged"] > 0
    finally:
        for k, v in saved.items():
            setattr(kgmod, k, v)

    def load(d, sub, keys):
        files = sorted(glob.glob(os.path.join(d, sub, "*.parquet")))
        return pd.concat([pq.read_table(f).to_pandas() for f in files]) \
            .sort_values(keys).reset_index(drop=True)

    pd.testing.assert_frame_equal(
        load(la, "edges", ["subj", "pred", "obj"]),
        load(da, "edges", ["subj", "pred", "obj"]))
    pd.testing.assert_frame_equal(
        load(la, "nodes", ["node_id"]), load(da, "nodes", ["node_id"]))


@pytest.mark.parametrize("as_uri", [False, True],
                         ids=["plain-path", "file-uri"])
def test_fused_sink_uri_clean(ray_session, smoke_corpus, tmp_path, as_uri):
    """Multi-node deployment claim: every path opened from INSIDE a
    worker task (shard read + fused event/triple/surf sink writes) is
    fsspec-URI-clean — running the fused extraction with file:// URIs
    for both the input shards and the sink roots produces byte-identical
    parquet output to the plain-path run."""
    import glob
    import hashlib
    import os

    import ray

    from casie_ray.pipelines.kg import extract_group_ds, list_transcript_files
    from casie_ray.stages.detect import load_tagger_state

    files = list_transcript_files(smoke_corpus)[:3]
    entities_ref = ray.put(load_tagger_state(
        os.path.join(smoke_corpus, "entities.parquet")))

    out = str(tmp_path / ("uri" if as_uri else "plain"))
    raw_root = os.path.join(out, "raw")
    surf_root = os.path.join(out, "surf")
    ev_root = os.path.join(out, "events")
    for root in (raw_root, surf_root, ev_root):
        os.makedirs(os.path.join(root, ".group-00000.tmp"))

    def u(p: str) -> str:
        return "file://" + p if as_uri else p

    sink = {"gids": {os.path.basename(p): 0 for p in files},
            "raw_root": u(raw_root), "surf_root": u(surf_root),
            "ev_root": u(ev_root), "suffix": ".tmp"}
    stats = extract_group_ds([u(p) for p in files], entities_ref,
                             detect_concurrency=2, sink=sink).take_all()
    assert sum(r["n_events"] for r in stats) > 0

    def digests(root):
        return {os.path.basename(f): hashlib.sha256(
            open(f, "rb").read()).hexdigest()
            for f in sorted(glob.glob(
                os.path.join(root, ".group-00000.tmp", "*.parquet")))}

    got = {r: digests(os.path.join(out, r))
           for r in ("raw", "surf", "events")}
    assert all(len(v) == 3 for v in got.values())
    # stash for cross-param comparison via a session-stable location
    marker = tmp_path.parent / ("uri_clean_" +
                                ("uri" if as_uri else "plain") + ".json")
    import json
    marker.write_text(json.dumps(got, sort_keys=True))
    other = tmp_path.parent / ("uri_clean_" +
                               ("plain" if as_uri else "uri") + ".json")
    if other.exists():
        assert json.loads(other.read_text()) == got   # byte-identical


def test_model_seat_swap_only_changes_realis(ray_session, smoke_corpus):
    """The learned numpy-MLP realis model (stages/modelseat.py) drops
    into the ModelRoleRealisScorer actor-pool seat and, having distilled
    the rule to 100% on the trigger grid, reproduces the rule seat's
    output exactly — proving seat swap flows only through the declared
    interface (the realis column; here byte-equal). Also pins model
    determinism: two trainings yield bit-identical weights."""
    import os

    import numpy as np
    import ray

    from casie_ray.pipelines.kg import extract_group_ds, list_transcript_files
    from casie_ray.stages.detect import load_tagger_state
    from casie_ray.stages.modelseat import train_realis_model
    from casie_ray.stages.rolerealis import (ModelRoleRealisScorer,
                                             role_realis_batch)

    m1 = train_realis_model()
    m2 = train_realis_model()
    for k in ("w1", "b1", "w2", "b2"):
        assert (m1[k] == m2[k]).all()

    files = list_transcript_files(smoke_corpus)[:2]
    entities_ref = ray.put(load_tagger_state(
        os.path.join(smoke_corpus, "entities.parquet")))
    events = extract_group_ds(files, entities_ref,
                              detect_concurrency=2)

    def norm(df):
        df = df.sort_values(["conv_id", "turn_idx", "event_id",
                             "nugget_text"]).reset_index(drop=True)
        return df[sorted(df.columns)]

    rule = events.map_batches(role_realis_batch, batch_format="pyarrow") \
        .to_pandas()
    model = events.map_batches(
        ModelRoleRealisScorer,
        fn_constructor_args=(train_realis_model,),
        batch_format="pyarrow", batch_size=256,
        concurrency=2).to_pandas()
    assert len(rule) > 0
    pd.testing.assert_frame_equal(norm(rule), norm(model))


def test_manifest_status_summary(ray_session, smoke_corpus, tmp_path):
    """manifest.summarize: per-group lineage/metrics view with
    config-currency — committed groups read reusable under the current
    config; a config-hash mismatch (simulated stale manifest) reads
    committed but NOT reusable."""
    import json
    import os

    from casie_ray.pipelines.kg import run_kg_pipeline
    from casie_ray.state import manifest

    out = str(tmp_path / "kg")
    info = run_kg_pipeline(smoke_corpus, out, resume=False, n_groups=2)
    s = manifest.summarize(out)
    assert s["groups_committed"] == 2
    assert s["groups_reusable_on_resume"] == 2
    assert s["events_total"] == sum(g["counters"]["events"]
                                    for g in s["groups"])
    assert s["events_total"] > 0 and info["edges"] > 0

    # stale a manifest's config hash: still committed, not reusable
    p = manifest.manifest_path(out, 0)
    m = json.load(open(p))
    m["config_hash"] = "deadbeefdeadbeef"
    json.dump(m, open(p, "w"))
    s2 = manifest.summarize(out)
    assert s2["groups_committed"] == 2
    assert s2["groups_reusable_on_resume"] == 1


def test_pipeline_config_surface(ray_session, smoke_corpus, tmp_path):
    """SURVEY §2.10 user-extension surface: (a) a default PipelineConfig
    reproduces the default pipeline exactly; (b) a KB blacklist in the
    config flows to the linker AND separates resume state (the manifest
    hash folds the filters, so a filtered run never reuses
    default-filter output); (c) edge_stages insert user map_batches
    steps — both a plain callable and a stateful actor class."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from casie_ray.pipelines.config import (PipelineConfig, edges_dataset,
                                            run_configured)
    from casie_ray.pipelines.kg import run_kg_pipeline

    base = str(tmp_path / "base")
    info0 = run_kg_pipeline(smoke_corpus, base, resume=False, n_groups=2)

    out = str(tmp_path / "cfg")
    info1 = run_configured(smoke_corpus, out, PipelineConfig())
    assert info1["edges"] == info0["edges"]

    def load_edges(d):
        t = pa.concat_tables([pq.read_table(f) for f in sorted(
            glob.glob(os.path.join(d, "edges", "*.parquet")))])
        return t.to_pandas().sort_values(["subj", "pred", "obj"]) \
            .reset_index(drop=True)

    pd.testing.assert_frame_equal(load_edges(base), load_edges(out))

    # blacklisting Organization kills fuzzy org links -> different KG,
    # and the SAME out_dir must re-extract (no manifest reuse)
    bl = PipelineConfig(kb_blacklist=frozenset({"Organization"}))
    info2 = run_configured(smoke_corpus, out, bl)
    assert info2["groups_skipped"] == 0          # resume state separated
    # fuzzy org links become surface nodes: contents differ (the edge
    # COUNT may coincide — each linked edge is replaced 1:1)
    e1 = set(map(tuple, load_edges(base)[["subj", "pred", "obj"]]
                 .itertuples(index=False)))
    e2 = set(map(tuple, load_edges(out)[["subj", "pred", "obj"]]
                 .itertuples(index=False)))
    assert e1 - e2 and e2 - e1

    # edge_stages: plain callable + actor class
    def only_targets(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return batch.filter(pc.equal(batch.column("pred"), "targets"))

    class CountStamp:
        def __init__(self, tag):
            self.tag = tag

        def __call__(self, batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "stage_tag", pa.array([self.tag] * batch.num_rows))

    staged = PipelineConfig(edge_stages=(
        (only_targets, {"batch_size": None}),
        (CountStamp, {"fn_constructor_args": ("v1",), "concurrency": 1}),
    ))
    df = edges_dataset(base, staged).to_pandas()
    assert set(df["pred"]) <= {"targets"} and len(df) > 0
    assert (df["stage_tag"] == "v1").all()
    plain = edges_dataset(base).to_pandas()
    assert len(plain) == info0["edges"]

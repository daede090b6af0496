"""CASIE annotation-JSON ingest source.

The reference corpus ships as one JSON file per document
(``data/annotation/*.json``: ``sourcefile``, ``info{title,date,link}``,
``content``, ``cyberevent.hopper[].events[]`` with ``nugget`` spans,
``subtype``/``realis`` and role-typed ``argument`` spans — the shape
read by the reference's prepare step). This module is the engine's
native reader for that format, so a reference user can point the
engine at their existing annotation directory instead of converting to
Parquet first.

Ray-Data-first shape: ``read_binary_files(..., include_paths=True)``
streams raw file bytes as blocks (file listing and reads are
distributed and pipelined — no driver-side directory walk of a
million-file corpus), and one ``map_batches`` pass parses each FILE
(one json.loads per document, the irreducible unit for a
document-granular format) and explodes it to flat Arrow rows. Two
views: event rows and argument rows, joinable on
(doc_id, hopper_idx, event_idx). Downstream everything is columnar —
the JSON never round-trips again (SURVEY S2/S3: the reference re-reads
these files in every stage; here they are parsed exactly once).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa

EVENT_SCHEMA = pa.schema([
    ("doc_id", pa.string()), ("sourcefile", pa.string()),
    ("title", pa.string()), ("date", pa.string()),
    ("hopper_idx", pa.int64()), ("hopper_relation", pa.string()),
    ("event_idx", pa.int64()), ("event_index", pa.string()),
    ("event_type", pa.string()), ("subtype", pa.string()),
    ("realis", pa.string()),
    ("nugget_start", pa.int64()), ("nugget_end", pa.int64()),
    ("nugget_text", pa.string()), ("n_args", pa.int64()),
])

ARG_SCHEMA = pa.schema([
    ("doc_id", pa.string()), ("hopper_idx", pa.int64()),
    ("event_idx", pa.int64()), ("arg_index", pa.string()),
    ("role", pa.string()), ("arg_type", pa.string()),
    ("start", pa.int64()), ("end", pa.int64()),
    ("text", pa.string()), ("wikidata_id", pa.string()),
])

DOC_SCHEMA = pa.schema([
    ("doc_id", pa.string()), ("sourcefile", pa.string()),
    ("title", pa.string()), ("date", pa.string()),
    ("content", pa.string()), ("n_hoppers", pa.int64()),
])


def _doc_id(path: str) -> str:
    return os.path.splitext(os.path.basename(path))[0]


def _int_or(v, default: int = -1) -> int:
    """Offset coercion that survives JSON null / missing / junk — a
    single malformed file must degrade to a skipped span, not abort
    the whole distributed ingest job."""
    return int(v) if isinstance(v, (int, float)) \
        and not isinstance(v, bool) else default


def parse_annotation(path: str, raw: bytes):
    """One annotation file -> (doc row, event rows, arg rows) as plain
    dict-lists (the scalar kernel; pure, unit-testable)."""
    d = json.loads(raw)
    info = d.get("info") or {}
    doc_id = _doc_id(path)
    doc = {
        "doc_id": doc_id,
        "sourcefile": d.get("sourcefile", ""),
        "title": info.get("title", ""),
        "date": info.get("date", ""),
        "content": d.get("content", ""),
    }
    events, args = [], []
    hoppers = (d.get("cyberevent") or {}).get("hopper") or []
    doc["n_hoppers"] = len(hoppers)
    for hi, hopper in enumerate(hoppers):
        for ei, ev in enumerate(hopper.get("events") or []):
            nug = ev.get("nugget") or {}
            arglist = ev.get("argument") or []
            events.append({
                "doc_id": doc_id, "sourcefile": doc["sourcefile"],
                "title": doc["title"], "date": doc["date"],
                "hopper_idx": hi,
                "hopper_relation": hopper.get("relation", ""),
                "event_idx": ei,
                "event_index": str(ev.get("index", "")),
                "event_type": ev.get("type", ""),
                "subtype": ev.get("subtype", ""),
                "realis": ev.get("realis", ""),
                "nugget_start": _int_or(nug.get("startOffset")),
                "nugget_end": _int_or(nug.get("endOffset")),
                "nugget_text": nug.get("text", ""),
                "n_args": len(arglist),
            })
            for a in arglist:
                args.append({
                    "doc_id": doc_id, "hopper_idx": hi, "event_idx": ei,
                    "arg_index": str(a.get("index", "")),
                    "role": ((a.get("role") or {}).get("type", "")),
                    "arg_type": a.get("type", ""),
                    "start": _int_or(a.get("startOffset")),
                    "end": _int_or(a.get("endOffset")),
                    "text": a.get("text", ""),
                    "wikidata_id": ((a.get("external_reference") or {})
                                    .get("wikidataid", "")),
                })
    return doc, events, args


def _read_raw(path: str):
    import ray.data
    return ray.data.read_binary_files(path, include_paths=True)


def _explode(which: str, schema: pa.Schema):
    def fn(batch: pa.Table) -> pa.Table:
        out: list[dict] = []
        for path, raw in zip(batch.column("path").to_pylist(),
                             batch.column("bytes").to_pylist()):
            doc, events, args = parse_annotation(path, raw)
            if which == "doc":
                out.append(doc)
            elif which == "event":
                out.extend(events)
            else:
                out.extend(args)
        if not out:
            return schema.empty_table()
        return pa.Table.from_pylist(out, schema=schema)
    return fn


def casie_documents(path: str):
    """Dataset of one row per annotation file (doc metadata + content)."""
    return _read_raw(path).map_batches(
        _explode("doc", DOC_SCHEMA), batch_format="pyarrow")


def casie_events(path: str):
    """Dataset of one row per annotated event nugget."""
    return _read_raw(path).map_batches(
        _explode("event", EVENT_SCHEMA), batch_format="pyarrow")


def casie_arguments(path: str):
    """Dataset of one row per event argument span."""
    return _read_raw(path).map_batches(
        _explode("arg", ARG_SCHEMA), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Corpus bridge: annotation JSON -> the engine's corpus layout
# (transcripts/*.parquet + entities.parquet), so the flagship KG
# pipeline (pipelines/kg.py) runs directly over a reference-format
# corpus: annotations_to_corpus(ann_dir, corpus_dir) then
# run_kg_pipeline(corpus_dir, out_dir). Each document becomes one
# conversation; sentences become turns; the entity catalog is built
# from the corpus' own typed argument spans (wikidata ids preserved),
# embedded with the engine's surface embedder.
# ---------------------------------------------------------------------------

CATALOG_TYPES = frozenset({
    "Person", "Organization", "Malware", "Website", "GPE", "File",
    "System", "Software", "Device",
})


def _date_us(date: str) -> int:
    """'2018_11_09' -> epoch microseconds (fallback 2018-01-01)."""
    from datetime import datetime, timezone
    try:
        dt = datetime.strptime(date, "%Y_%m_%d")
    except (ValueError, TypeError):
        dt = datetime(2018, 1, 1)
    return int(dt.replace(tzinfo=timezone.utc).timestamp() * 1_000_000)


def _turn_spans(content: str) -> list[tuple[str, int]]:
    """Sentence-ish turn segmentation with exact doc offsets:
    (stripped turn text, its char offset in content). The single
    source of truth for BOTH the transcript bridge and the gold
    mention mapping, so annotation offsets project consistently."""
    spans = []
    pos = 0
    for seg in (content or "").split(". "):
        start = pos
        pos += len(seg) + 2  # the '. ' separator consumed by split
        t = seg.strip()
        if t:
            spans.append((t, start + (len(seg) - len(seg.lstrip()))))
    return spans


_BRIDGE_SCHEMA = pa.schema([
    ("kind", pa.string()), ("conv_id", pa.string()),
    ("turn_idx", pa.int32()), ("text", pa.string()),
    ("ts_us", pa.int64()), ("arg_type", pa.string()),
    ("wikidata_id", pa.string()),
])


def _bridge_rows(batch: pa.Table) -> pa.Table:
    """ONE parse per file emitting both bridge views as a tagged
    union: turn rows for the transcript sink plus catalog-typed
    argument rows for the entity catalog — the JSON is read and
    parsed exactly once for the whole bridge."""
    rows: list[dict] = []
    for path, raw in zip(batch.column("path").to_pylist(),
                         batch.column("bytes").to_pylist()):
        doc, _events, args = parse_annotation(path, raw)
        base = _date_us(doc["date"])
        for i, (t, _off) in enumerate(_turn_spans(doc["content"])):
            rows.append({"kind": "turn", "conv_id": doc["doc_id"],
                         "turn_idx": i, "text": t,
                         "ts_us": base + i * 1_000_000,
                         "arg_type": "", "wikidata_id": ""})
        for a in args:
            if a["arg_type"] in CATALOG_TYPES:
                rows.append({"kind": "arg", "conv_id": doc["doc_id"],
                             "turn_idx": -1, "text": a["text"],
                             "ts_us": 0, "arg_type": a["arg_type"],
                             "wikidata_id": a["wikidata_id"]})
    if not rows:
        return _BRIDGE_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=_BRIDGE_SCHEMA)


def annotations_to_corpus(ann_dir: str, corpus_dir: str) -> dict:
    """Materialize an engine corpus from an annotation-JSON directory.
    One parse pass produces a materialized tagged union (parsed rows
    are far smaller than the raw JSON); transcripts stream from it to
    partitioned parquet and the entity catalog (vocabulary-sized by
    nature, like the BPE vocab) is reduced from the same rows — the
    directory is read and json-parsed exactly once."""
    import numpy as np
    import pyarrow.compute as pc

    from .embed import embed_surfaces

    parsed = _read_raw(ann_dir).map_batches(
        _bridge_rows, batch_format="pyarrow").materialize()

    def to_turns(b: pa.Table) -> pa.Table:
        t = b.filter(pc.equal(b.column("kind"), "turn"))
        n = t.num_rows
        return pa.table({
            "conv_id": t.column("conv_id"),
            "turn_idx": t.column("turn_idx"),
            "role": pa.array(["user"] * n, pa.string()),
            "text": t.column("text"),
            "tool": pa.array([None] * n, pa.string()),
            "ts": t.column("ts_us").cast(pa.timestamp("us")),
        })

    os.makedirs(os.path.join(corpus_dir, "transcripts"), exist_ok=True)
    parsed.map_batches(to_turns, batch_format="pyarrow",
                       batch_size=None) \
        .write_parquet(os.path.join(corpus_dir, "transcripts"))

    args = pa.concat_tables(
        b.filter(pc.equal(b.column("kind"), "arg"))
        for b in parsed.iter_batches(batch_format="pyarrow")) \
        .select(["text", "arg_type", "wikidata_id"]).to_pandas()
    cat = args.groupby(["text", "arg_type"], as_index=False) \
        .agg(wikidata_id=("wikidata_id", "max"))
    cat = cat.sort_values(["text", "arg_type"]).reset_index(drop=True)
    from .ops.bucketing import fnv1a_hashes
    h = fnv1a_hashes([f"{t}|{y}" for t, y in
                      zip(cat["text"], cat["arg_type"])])
    ent_id = [w if w else f"ENT{x:016x}"
              for w, x in zip(cat["wikidata_id"], h)]
    emb = embed_surfaces(list(cat["text"])).astype(np.float32)
    t = pa.table({
        "entity_id": pa.array(ent_id, pa.string()),
        "canonical": pa.array(list(cat["text"]), pa.string()),
        "aliases": pa.array([[] for _ in ent_id],
                            pa.list_(pa.string())),
        "type": pa.array(list(cat["arg_type"]), pa.string()),
        "embedding": pa.FixedSizeListArray.from_arrays(
            pa.array(emb.reshape(-1), pa.float32()), emb.shape[1]),
    })
    import pyarrow.parquet as pq
    pq.write_table(t, os.path.join(corpus_dir, "entities.parquet"))
    return {"entities": len(ent_id), "corpus_dir": corpus_dir}


# ---------------------------------------------------------------------------
# Gold projection: annotation nugget spans -> the scorer's mention
# table (conv_id, turn_idx, start, end, label), with doc-level char
# offsets re-based onto the SAME turn segmentation the transcript
# bridge produces — so `python -m casie_ray.score` evaluates any
# engine prediction directly against the reference's own gold.
# ---------------------------------------------------------------------------

MENTION_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("turn_idx", pa.int32()),
    ("start", pa.int64()), ("end", pa.int64()),
    ("label", pa.string()), ("clipped", pa.bool_()),
])


def _rebase_to_turns(doc: dict, spans_src) -> list[dict]:
    """Shared gold-projection kernel: re-base doc-level (start, end,
    extra) spans onto the bridge's turn segmentation. Single source of
    truth for the turn-pick (a <= s < b) and boundary-clipping rules,
    so nugget and argument gold can never silently diverge."""
    bounds = [(off, off + len(t))
              for t, off in _turn_spans(doc["content"])]
    out = []
    for s, e, extra in spans_src:
        if s < 0:
            continue
        ti = next((i for i, (a, b) in enumerate(bounds)
                   if a <= s < b), None)
        if ti is None:
            continue
        a, b = bounds[ti]
        out.append({
            "conv_id": doc["doc_id"], "turn_idx": ti,
            "start": s - a, "end": min(e, b) - a,
            "clipped": e > b, **extra,
        })
    return out


def _gold_mention_rows(batch: pa.Table) -> pa.Table:
    out: list[dict] = []
    for path, raw in zip(batch.column("path").to_pylist(),
                         batch.column("bytes").to_pylist()):
        doc, events, _args = parse_annotation(path, raw)
        out.extend(_rebase_to_turns(
            doc, ((ev["nugget_start"], ev["nugget_end"],
                   {"label": ev["subtype"]}) for ev in events)))
    if not out:
        return MENTION_SCHEMA.empty_table()
    return pa.Table.from_pylist(out, schema=MENTION_SCHEMA)


def gold_nugget_mentions(path: str):
    """Dataset of gold nugget mentions in scorer format (turn-local
    offsets under the bridge's segmentation; ``clipped`` marks spans
    crossing a turn boundary, truncated at the boundary)."""
    return _read_raw(path).map_batches(
        _gold_mention_rows, batch_format="pyarrow")


ARG_MENTION_SCHEMA = pa.schema([
    ("conv_id", pa.string()), ("turn_idx", pa.int32()),
    ("start", pa.int64()), ("end", pa.int64()),
    ("label", pa.string()), ("role", pa.string()),
    ("clipped", pa.bool_()),
])


def _gold_arg_rows(batch: pa.Table) -> pa.Table:
    out: list[dict] = []
    for path, raw in zip(batch.column("path").to_pylist(),
                         batch.column("bytes").to_pylist()):
        doc, _events, args = parse_annotation(path, raw)
        out.extend(_rebase_to_turns(
            doc, ((a["start"], a["end"],
                   {"label": a["arg_type"], "role": a["role"]})
                  for a in args)))
    if not out:
        return ARG_MENTION_SCHEMA.empty_table()
    return pa.Table.from_pylist(out, schema=ARG_MENTION_SCHEMA)


def gold_argument_mentions(path: str):
    """Dataset of gold ARGUMENT mentions in scorer format (label =
    argument entity type, plus the role column — score with label for
    the reference's `-options argument` mode, or re-label with role
    for its `-options role` mode)."""
    return _read_raw(path).map_batches(
        _gold_arg_rows, batch_format="pyarrow")

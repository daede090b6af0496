"""Detection stage: the engine seat of CASIE's nugget/argument taggers
(T1/T2, nug_arg_detection.py:111-208) — a stateful actor-pool
``map_batches`` class. The catalog (broadcast via ``ray.put``, the small
side of the linker J5/T7) and the compiled lexicon tables are built ONCE
per actor in ``__init__``; ``__call__`` processes one Arrow batch of
transcript turns and appends the detection columns (schema.DETECTION_*).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .. import lexicons as lx
from ..schema import (
    CAND_T, DETECTION_FIELDS, MENTION_T, TRIGGER_T, detection_to_row,
)
from ..semantics import (
    TurnDetection, build_catalog_matcher, build_fuzzy_index, detect_turn,
)

# a turn whose text is entirely lowercase prose (no digits, uppercase,
# '$', or other special characters) can only produce detections through
# vocabulary words — everything else (CVE/Version/Money regexes,
# capitalized runs, month+digit dates, digit counts) needs a character
# this class excludes
_PLAIN_RE = r"^[a-z ,.;:!?'\"()\-]*$"

_SUBWORD_RE = re.compile(r"[a-z0-9]+")


def _subwords(w: str) -> list[str]:
    return _SUBWORD_RE.findall(w.lower())


def build_hot_vocab(catalog: dict) -> frozenset[str]:
    """Every lowercase word piece that can START a trigger or mention in
    :func:`detect_turn` (trigger surfaces, argument-phrase first tokens,
    catalog first tokens, months, numeral words). A text none of whose
    pieces appear here — and which is plain lowercase prose — provably
    yields an empty detection, so the per-token Python pass can be
    skipped (the vectorized pre-pass; VERDICT r1 item 7)."""
    vocab: set[str] = set()
    for w in lx.TRIGGER_SURFACES:
        vocab.update(_subwords(w))
    for p in lx.ARG_PHRASE_SURFACES:
        vocab.update(_subwords(p.split(" ", 1)[0]))
    vocab.update(lx.MONTHS)
    vocab.update(lx.NUMERAL_WORDS)
    for first_tok in catalog:
        vocab.update(_subwords(first_tok))
    return frozenset(vocab)


def build_tagger_state(entities, kb_whitelist=None,
                       kb_blacklist=None) -> dict:
    """Build the tagger's broadcast state ONCE (driver side): catalog
    matcher, blocked fuzzy-link index (J5), hot-vocab pre-pass set.
    ``ray.put`` the result and pass the ref to every tagger actor —
    actors then pay one plasma deserialize (~50 ms) instead of
    re-deriving the embedding index per actor per group (~1.3 s at
    sf1.0), which is pure serial cost on the extraction critical path.
    ``kb_whitelist``/``kb_blacklist`` override the KB candidate typing
    filters (PipelineConfig surface; None -> lexicon defaults)."""
    catalog = build_catalog_matcher(entities)
    return {
        "catalog": catalog,
        "fuzzy": build_fuzzy_index(entities, whitelist=kb_whitelist,
                                   blacklist=kb_blacklist),
        "hot_vocab": sorted(build_hot_vocab(catalog)),
    }


def load_tagger_state(entities_path: str, kb_whitelist=None,
                      kb_blacklist=None) -> dict:
    """Disk-cached :func:`build_tagger_state`, keyed by the entities
    table bytes + the semantic config hash. The build is ~1.3 s of
    driver-serial embedding-index work per run — a fixed cost that does
    not shrink with cluster size, so a warm cache directly improves
    scaling efficiency. Cache writes are atomic (tmp + rename)."""
    import hashlib
    import os
    import pickle
    import tempfile

    from ..state.manifest import config_hash

    with open(entities_path, "rb") as f:
        raw = f.read()
    kb_key = repr((sorted(kb_whitelist) if kb_whitelist else None,
                   sorted(kb_blacklist) if kb_blacklist else None))
    key = hashlib.blake2b(raw + config_hash().encode()
                          + kb_key.encode(),
                          digest_size=16).hexdigest()
    cdir = os.path.join(tempfile.gettempdir(), "casie_state_cache")
    cpath = os.path.join(cdir, f"{key}.pkl")
    if os.path.exists(cpath):
        try:
            with open(cpath, "rb") as f:
                return pickle.load(f)
        except (pickle.UnpicklingError, EOFError, OSError):
            pass  # corrupt/partial cache: rebuild below
    import pyarrow.parquet as pq
    state = build_tagger_state(pq.read_table(entities_path).to_pylist(),
                               kb_whitelist=kb_whitelist,
                               kb_blacklist=kb_blacklist)
    os.makedirs(cdir, exist_ok=True)
    tmp = cpath + f".{os.getpid()}.tmp"
    with open(tmp, "wb") as f:
        pickle.dump(state, f)
    os.replace(tmp, cpath)
    return state


class DetectTagger:
    """map_batches(DetectTagger, fn_constructor_args=(state_ref,),
    batch_format="pyarrow", concurrency=..). ``state_ref`` may be a
    ray.put ref to (or plain value of) either a prebuilt
    :func:`build_tagger_state` dict or a raw entities list (tests)."""

    def __init__(self, entities_ref):
        import ray
        obj = ray.get(entities_ref) if not isinstance(
            entities_ref, (list, tuple, dict)) else entities_ref
        if isinstance(obj, dict):
            self.catalog = obj["catalog"]
            self.fuzzy = obj["fuzzy"]
            self.hot_vocab = pa.array(obj["hot_vocab"])
        else:
            st = build_tagger_state(obj)
            self.catalog = st["catalog"]
            self.fuzzy = st["fuzzy"]
            self.hot_vocab = pa.array(st["hot_vocab"])

    def interesting_mask(self, texts: pa.ChunkedArray | pa.Array) -> np.ndarray:
        """Vectorized pre-pass over a whole text column: False rows are
        PROVEN to produce an empty TurnDetection (no trigger, mention or
        imputation candidate consumer), so detect_turn is skipped for
        them. One Arrow regex pass + one hashed set-membership pass —
        no per-row Python."""
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = len(texts)
        if n == 0:
            return np.zeros(0, dtype=bool)
        plain = pc.fill_null(pc.match_substring_regex(texts, _PLAIN_RE),
                             True)
        nonplain = pc.invert(plain).to_numpy(zero_copy_only=False)
        pieces = pc.split_pattern_regex(
            pc.fill_null(pc.utf8_lower(texts), ""), "[^a-z0-9]+")
        flat = pieces.combine_chunks() if isinstance(pieces, pa.ChunkedArray) \
            else pieces
        member = pc.is_in(flat.values, value_set=self.hot_vocab) \
            .to_numpy(zero_copy_only=False).astype(bool)
        offs = flat.offsets.to_numpy()
        counts = np.diff(offs)
        row_of = np.repeat(np.arange(n), counts)
        vocab_hit = np.bincount(row_of[member], minlength=n) > 0
        return nonplain | vocab_hit

    def detect_or_skip(self, text: str | None, interesting: bool) \
            -> TurnDetection:
        if not interesting:
            return TurnDetection([], [], [], [], [])
        return detect_turn(text or "", self.catalog, self.fuzzy)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        mask = self.interesting_mask(batch.column("text"))
        starts, flags, trigs, ments, cands = [], [], [], [], []
        for text, keep in zip(texts, mask):
            row = detection_to_row(self.detect_or_skip(text, keep))
            starts.append(row["token_starts"])
            flags.append(row["token_flags"])
            trigs.append(row["triggers"])
            ments.append(row["mentions"])
            cands.append(row["cand_tokens"])
        cols = {
            "conv_id": batch.column("conv_id"),
            "turn_idx": batch.column("turn_idx"),
            "text": batch.column("text"),
            "ts": batch.column("ts"),
            "token_starts": pa.array(starts, type=pa.list_(pa.int32())),
            "token_flags": pa.array(flags, type=pa.list_(pa.uint8())),
            "triggers": pa.array(trigs, type=pa.list_(TRIGGER_T)),
            "mentions": pa.array(ments, type=pa.list_(MENTION_T)),
            "cand_tokens": pa.array(cands, type=pa.list_(CAND_T)),
        }
        return pa.table({name: cols[name] for name, _ in DETECTION_FIELDS})


class ShardExtractor(DetectTagger):
    """Zero-shuffle extraction for conv-partitioned input (the corpus
    layout guarantee: conversations never span shards — see
    state/manifest.py): detection + doc logic + role/realis + coref run
    per conversation inside one whole-shard table, emitting event rows
    directly. The groupby(conv_id) shuffle path (extract_events_group)
    remains the fallback for inputs with arbitrary row layout."""

    def extract_turns_with_events(self, batch: pa.Table) \
            -> tuple[pa.Table, list]:
        """All conversations in `batch` must be complete. Returns the
        EVENT_SCHEMA row table AND the Event objects (the fused sink
        emits triples from the objects, skipping a rows->objects
        round-trip)."""
        from ..schema import EVENT_SCHEMA
        from ..stages.doclogic import extract_conversation_events

        conv_ids = batch.column("conv_id").to_pylist()
        turn_idxs = batch.column("turn_idx").to_pylist()
        texts = batch.column("text").to_pylist()
        tss = batch.column("ts").to_pylist()
        # vectorized pre-pass over the whole shard table: only turns the
        # mask marks interesting pay the per-token Python detection
        mask = self.interesting_mask(batch.column("text"))
        by_conv: dict[str, list[int]] = {}
        for k, cid in enumerate(conv_ids):
            by_conv.setdefault(cid, []).append(k)
        out_rows: list[dict] = []
        out_events: list = []
        catalog, fuzzy = self.catalog, self.fuzzy
        for cid in sorted(by_conv):
            idxs = sorted(by_conv[cid], key=lambda k: turn_idxs[k])
            # inline empty fast path: ~87% of turns fail the pre-pass,
            # so skip the detect_or_skip call layer for them (fresh
            # TurnDetection per turn — downstream mutates cand_tokens)
            detections = {
                turn_idxs[k]:
                    detect_turn(texts[k] or "", catalog, fuzzy)
                    if mask[k] else TurnDetection([], [], [], [], [])
                for k in idxs
            }
            ts_of = {turn_idxs[k]: tss[k] for k in idxs}
            evs, rows = extract_conversation_events(cid, detections, ts_of)
            out_events.extend(evs)
            out_rows.extend(rows)
        tbl = pa.Table.from_pylist(out_rows, schema=EVENT_SCHEMA) \
            if out_rows else EVENT_SCHEMA.empty_table()
        return tbl, out_events

    def extract_turns(self, batch: pa.Table) -> pa.Table:
        return self.extract_turns_with_events(batch)[0]

    __call__ = extract_turns


class ShardFileExtractor(ShardExtractor):
    """File-granular zero-shuffle extraction: the actor pool consumes a
    Dataset of shard PATHS and reads each shard itself (column-pruned),
    so conversation/shard alignment is exact by construction — Ray block
    planning can otherwise split or merge file blocks. This is the
    engine's hot path; use as
    ``from_items(files).map_batches(ShardFileExtractor, batch_size=1,
    concurrency=(a, b))``.

    ``events_dir``: when set, each shard's event rows (minus args) are
    also written to ``events_dir/<shard basename>`` from inside the
    task — fusing the events sink into the extraction pass. File names
    derive from the input shard, so a task retry overwrites its own
    output (idempotent).

    ``sink``: when set instead, the task is FULLY fused: it writes the
    shard's events AND its partially-deduped raw triples itself (into
    the per-group temp dirs ``sink`` names) and returns only a one-row
    stats table per shard. One embarrassingly-parallel execution then
    covers a whole WAVE of resume groups — no downstream stage, no
    per-group actor-pool spin-up, no object-store traffic (the
    extraction output never leaves the task). ``sink`` is a dict:
    ``{"gids": {shard basename: gid}, "ev_root": dir | None,
    "raw_root": dir, "surf_root": dir | None, "suffix": tmp-dir
    suffix}``. ``surf_root`` additionally side-writes the shard's
    distinct (surface node, entity block) rows, so canonicalization
    later reads only the tiny surf tables instead of re-scanning the
    whole raw-triples output."""

    COLUMNS = ["conv_id", "turn_idx", "text", "ts"]
    STATS_SCHEMA = pa.schema([
        ("shard", pa.string()), ("gid", pa.int32()),
        ("n_events", pa.int64()), ("n_triples", pa.int64()),
        ("n_turns", pa.int64()),
    ])

    def __init__(self, entities_ref, events_dir: str | None = None,
                 sink: dict | None = None):
        super().__init__(entities_ref)
        self.events_dir = events_dir
        self.sink = sink

    def __call__(self, batch: pa.Table) -> pa.Table:  # type: ignore[override]
        import os
        import pyarrow.parquet as pq
        from ..schema import EVENT_SCHEMA
        from ..stages.triples import partial_dedup, triples_from_events

        out = [EVENT_SCHEMA.empty_table()]
        stats: list[dict] = []
        for path in batch.column("item").to_pylist():
            tbl = pq.read_table(path, columns=self.COLUMNS)
            events, event_objs = self.extract_turns_with_events(tbl)
            base = os.path.basename(path)
            if self.sink is not None:
                gid = self.sink["gids"][base]
                trip = partial_dedup(triples_from_events(event_objs))
                pq.write_table(trip, os.path.join(
                    self.sink["raw_root"],
                    f".group-{gid:05d}{self.sink['suffix']}", base))
                if self.sink.get("surf_root"):
                    from ..stages.triples import extract_surface_nodes
                    pq.write_table(extract_surface_nodes(trip),
                                   os.path.join(
                                       self.sink["surf_root"],
                                       f".group-{gid:05d}"
                                       f"{self.sink['suffix']}", base))
                if self.sink.get("ev_root"):
                    pq.write_table(events.drop_columns(["args"]),
                                   os.path.join(
                                       self.sink["ev_root"],
                                       f".group-{gid:05d}"
                                       f"{self.sink['suffix']}", base))
                stats.append({"shard": base, "gid": gid,
                              "n_events": events.num_rows,
                              "n_triples": trip.num_rows,
                              "n_turns": tbl.num_rows})
                continue
            if self.events_dir is not None:
                pq.write_table(events.drop_columns(["args"]),
                               os.path.join(self.events_dir, base))
            out.append(events)
        if self.sink is not None:
            return pa.Table.from_pylist(stats, schema=self.STATS_SCHEMA)
        return pa.concat_tables(out)

"""CASIE annotation-JSON ingest tests: a self-contained synthetic file
in the reference format (format per /root/reference/data/annotation/
*.json, studied not copied), plus an optional smoke-parse of the real
reference corpus when present."""

from __future__ import annotations

import json
import os

import pytest

DOC = {
    "sourcefile": "90001.txt",
    "info": {"title": "t", "date": "2018_11_09", "type": "text",
             "link": "https://example.invalid/x"},
    "content": "POLICE have launched an investigation after a breach.",
    "cyberevent": {"hopper": [{
        "relation": "Same", "index": 0,
        "events": [{
            "nugget": {"startOffset": 46, "endOffset": 52,
                       "index": "T1", "text": "breach"},
            "subtype": "Databreach", "index": "E1",
            "realis": "Actual", "type": "Attack",
            "argument": [{
                "startOffset": 0, "endOffset": 6, "index": "T2",
                "role": {"type": "Attacker"}, "type": "Person",
                "text": "POLICE",
                "external_reference": {"wikidataid": "Q467"},
            }],
        }],
    }]},
}


def _write_corpus(tmp_path, n=3):
    d = tmp_path / "ann"
    d.mkdir()
    for i in range(n):
        doc = json.loads(json.dumps(DOC))
        doc["sourcefile"] = f"9000{i}.txt"
        if i == 2:  # a docs-only file: no events at all
            doc["cyberevent"] = {"hopper": []}
        (d / f"9000{i}.json").write_text(json.dumps(doc))
    return str(d)


def test_parse_annotation_scalar(tmp_path):
    from casie_ray.ingest import parse_annotation

    doc, events, args = parse_annotation(
        "/x/90001.json", json.dumps(DOC).encode())
    assert doc["doc_id"] == "90001" and doc["n_hoppers"] == 1
    assert len(events) == 1 and events[0]["subtype"] == "Databreach"
    assert events[0]["nugget_text"] == "breach"
    assert len(args) == 1 and args[0]["role"] == "Attacker"
    assert args[0]["wikidata_id"] == "Q467"


def test_casie_readers_over_directory(ray_session, tmp_path):
    from casie_ray.ingest import (casie_arguments, casie_documents,
                                  casie_events)

    d = _write_corpus(tmp_path)
    docs = casie_documents(d).to_pandas().sort_values("doc_id")
    assert list(docs["doc_id"]) == ["90000", "90001", "90002"]
    assert docs["n_hoppers"].tolist() == [1, 1, 0]
    ev = casie_events(d).to_pandas()
    assert len(ev) == 2 and set(ev["doc_id"]) == {"90000", "90001"}
    assert (ev["realis"] == "Actual").all()
    ar = casie_arguments(d).to_pandas()
    assert len(ar) == 2 and (ar["role"] == "Attacker").all()
    # event/argument rows join on the composite key
    j = ev.merge(ar, on=["doc_id", "hopper_idx", "event_idx"])
    assert len(j) == 2


REF_DIR = "/root/reference/data/annotation"


@pytest.mark.skipif(not os.path.isdir(REF_DIR),
                    reason="reference corpus not present")
def test_casie_readers_parse_real_reference_head(ray_session,
                                                 tmp_path):
    """Smoke-parse a few REAL reference files (copied into /tmp so the
    reader never touches the read-only tree with write intent)."""
    import shutil

    from casie_ray.ingest import casie_events

    d = tmp_path / "real"
    d.mkdir()
    for name in sorted(os.listdir(REF_DIR))[:3]:
        shutil.copy(os.path.join(REF_DIR, name), d / name)
    ev = casie_events(str(d)).to_pandas()
    assert len(ev) > 0
    assert set(ev["subtype"]) <= {
        "Databreach", "Phishing", "Ransom",
        "DiscoverVulnerability", "PatchVulnerability"}
    assert (ev["nugget_end"] > ev["nugget_start"]).all()


def test_annotations_to_corpus_feeds_kg_pipeline(ray_session,
                                                 tmp_path):
    """The corpus bridge output is a valid engine corpus: the flagship
    KG pipeline runs over it end to end and links catalog entities
    from the annotation's own argument spans."""
    import glob

    import pyarrow.parquet as pq

    from casie_ray.ingest import annotations_to_corpus
    from casie_ray.pipelines.kg import run_kg_pipeline

    ann = _write_corpus(tmp_path)
    corpus = str(tmp_path / "corpus")
    summary = annotations_to_corpus(ann, corpus)
    assert summary["entities"] == 1  # POLICE (Person), deduped
    tr = pq.read_table(glob.glob(f"{corpus}/transcripts/*.parquet")[0])
    assert tr.num_rows > 0
    assert set(tr.schema.names) == {"conv_id", "turn_idx", "role",
                                    "text", "tool", "ts"}
    out = str(tmp_path / "kg")
    res = run_kg_pipeline(corpus, out)
    assert res["groups"] >= 1
    edges = glob.glob(f"{out}/edges/**/*.parquet", recursive=True)
    assert edges  # pipeline completed and materialized the edge table


def test_gold_nugget_mentions_offsets(ray_session, tmp_path):
    """Gold nugget spans re-base onto the bridge's turn segmentation:
    slicing the turn text with the mention offsets must reproduce the
    annotated nugget text exactly."""
    from casie_ray.ingest import _turn_spans, gold_nugget_mentions

    d = _write_corpus(tmp_path)
    m = gold_nugget_mentions(d).to_pandas()
    assert len(m) == 2 and (m["label"] == "Databreach").all()
    content = DOC["content"]
    turns = [t for t, _ in _turn_spans(content)]
    for _, r in m.iterrows():
        assert turns[r["turn_idx"]][r["start"]:r["end"]] == "breach"
        assert not r["clipped"]


@pytest.mark.skipif(not os.path.isdir(REF_DIR),
                    reason="reference corpus not present")
def test_gold_mentions_match_real_nugget_text(ray_session, tmp_path):
    """On real reference files, ≥95% of unclipped gold mentions must
    slice back to the exact annotated nugget text."""
    import shutil

    from casie_ray.ingest import (_turn_spans, casie_documents,
                                  casie_events, gold_nugget_mentions)

    d = tmp_path / "real"
    d.mkdir()
    for name in sorted(os.listdir(REF_DIR))[:20]:
        shutil.copy(os.path.join(REF_DIR, name), d / name)
    docs = casie_documents(str(d)).to_pandas() \
        .set_index("doc_id")["content"]
    ev = casie_events(str(d)).to_pandas()
    nug = {(r["doc_id"], r["nugget_start"]): r["nugget_text"]
           for _, r in ev.iterrows()}
    m = gold_nugget_mentions(str(d)).to_pandas()
    m = m[~m["clipped"]]
    assert len(m) > 50
    ok = 0
    for _, r in m.iterrows():
        spans = _turn_spans(docs[r["conv_id"]])
        text, off = spans[r["turn_idx"]]
        got = text[r["start"]:r["end"]]
        want = nug.get((r["conv_id"], off + r["start"]))
        ok += int(want is not None and got == want)
    assert ok / len(m) >= 0.95, (ok, len(m))


def test_gold_argument_mentions(ray_session, tmp_path):
    from casie_ray.ingest import _turn_spans, gold_argument_mentions

    d = _write_corpus(tmp_path)
    m = gold_argument_mentions(d).to_pandas()
    assert len(m) == 2
    assert (m["label"] == "Person").all()
    assert (m["role"] == "Attacker").all()
    turns = [t for t, _ in _turn_spans(DOC["content"])]
    for _, r in m.iterrows():
        assert turns[r["turn_idx"]][r["start"]:r["end"]] == "POLICE"


def test_parse_annotation_null_offsets_skipped():
    """A JSON null offset degrades to a skipped span, never a crash."""
    import json as _json

    from casie_ray.ingest import parse_annotation

    doc = _json.loads(_json.dumps(DOC))
    ev = doc["cyberevent"]["hopper"][0]["events"][0]
    ev["nugget"]["startOffset"] = None
    ev["argument"][0]["endOffset"] = None
    d, events, args = parse_annotation("/x/9.json",
                                       _json.dumps(doc).encode())
    assert events[0]["nugget_start"] == -1
    assert args[0]["end"] == -1

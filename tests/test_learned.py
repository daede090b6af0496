"""Learned (weak-supervision) tagger seat: train-split lexicon
learning, trigger-probability filtering, no-leakage, and held-out
prediction — the engine analogue of the reference's -trainfile /
-testfile protocol (reference code/nug_arg_detection.py:212-214)."""

from __future__ import annotations

import json


def _ann_doc(doc_id: str, content: str, nuggets, args=()):
    """One annotation JSON in the reference format. ``nuggets`` is
    [(start, end, text, subtype)], ``args`` is [(start, end, text,
    arg_type, role)] — all attached to one hopper/event each."""
    hoppers = []
    for i, (s, e, text, sub) in enumerate(nuggets):
        ev = {
            "nugget": {"startOffset": s, "endOffset": e,
                       "index": f"T{i}", "text": text},
            "subtype": sub, "index": f"E{i}", "realis": "Actual",
            "type": "Attack", "argument": [],
        }
        hoppers.append({"relation": "Same", "index": i, "events": [ev]})
    if args and hoppers:
        hoppers[0]["events"][0]["argument"] = [
            {"startOffset": s, "endOffset": e, "index": f"A{j}",
             "role": {"type": role}, "type": at, "text": text}
            for j, (s, e, text, at, role) in enumerate(args)]
    return {
        "sourcefile": f"{doc_id}.txt",
        "info": {"title": "t", "date": "2018_01_01", "type": "text",
                 "link": ""},
        "content": content,
        "cyberevent": {"hopper": hoppers},
    }


# Split membership under doc_is_test (FNV-1a % 100 < 20):
TRAIN_IDS = ["80000", "80001", "80002", "80004", "80005"]
TEST_IDS = ["80003", "80008"]


def _span(content: str, word: str):
    s = content.index(word)
    return (s, s + len(word), word)


def _write(tmp_path):
    d = tmp_path / "ann"
    d.mkdir()
    # TRAIN docs: "ransomware" is a reliable trigger (always gold);
    # "attack" occurs twice per doc in text but is gold only once
    # across the split (trigger prob 1/10 -> filtered at 0.3).
    train_text = ("The ransomware spread fast. An attack was feared "
                  "but no attack came.")
    for k, did in enumerate(TRAIN_IDS):
        nugs = [(*_span(train_text, "ransomware"), "Ransom")]
        if k == 0:
            nugs.append((*_span(train_text, "attack"), "Databreach"))
        doc = _ann_doc(did, train_text, nugs,
                       args=[(*_span(train_text, "ransomware"),
                              "Malware", "Tool")])
        (d / f"{did}.json").write_text(json.dumps(doc))
    # TEST docs: same reliable trigger, plus a TEST-ONLY gold trigger
    # "cryptolocked" that must never enter the train-learned lexicon.
    test_text = "Files cryptolocked by ransomware after an attack."
    for did in TEST_IDS:
        doc = _ann_doc(did, test_text, [
            (*_span(test_text, "cryptolocked"), "Ransom"),
            (*_span(test_text, "ransomware"), "Ransom"),
        ])
        (d / f"{did}.json").write_text(json.dumps(doc))
    return str(d)


def test_lexicon_learned_from_train_split_only(ray_session, tmp_path):
    from casie_ray.learned import learn_surface_lexicon

    d = _write(tmp_path)
    lex = learn_surface_lexicon(d, "nugget")
    assert lex["ransomware"] == "Ransom"
    assert lex["attack"] == "Databreach"
    # no leakage: the held-out-only trigger is absent
    assert "cryptolocked" not in lex
    # argument task learns its own label set
    arg_lex = learn_surface_lexicon(d, "argument")
    assert arg_lex == {"ransomware": "Malware"}


def test_trigger_probability_filter(ray_session, tmp_path):
    from casie_ray.learned import learn_filtered_lexicon

    d = _write(tmp_path)
    # "attack" occurs 10x in train text, gold 1x -> prob 0.1 < 0.3;
    # "ransomware" occurs 5x, gold 5x -> prob 1.0.
    lex = learn_filtered_lexicon(d, "nugget", min_prob=0.3)
    assert lex == {"ransomware": "Ransom"}
    # at a permissive threshold the noisy trigger survives
    lex_all = learn_filtered_lexicon(d, "nugget", min_prob=0.05)
    assert set(lex_all) == {"ransomware", "attack"}


def test_predict_on_held_out_split(ray_session, tmp_path):
    from casie_ray.learned import (learn_filtered_lexicon,
                                   predict_mentions)

    d = _write(tmp_path)
    lex = learn_filtered_lexicon(d, "nugget", min_prob=0.3)
    pred = predict_mentions(d, lex, "test").to_pandas()
    # only held-out docs, only the reliable trigger
    assert set(pred["conv_id"]) == set(TEST_IDS)
    assert len(pred) == len(TEST_IDS)
    assert (pred["label"] == "Ransom").all()
    test_text = "Files cryptolocked by ransomware after an attack."
    for _, r in pred.iterrows():
        assert test_text[r["start"]:r["end"]] == "ransomware"
    # train-split prediction never emits held-out docs
    tr = predict_mentions(d, lex, "train").to_pandas()
    assert set(tr["conv_id"]) == set(TRAIN_IDS)


def test_evaluate_learned_seat_end_to_end(ray_session, tmp_path):
    from casie_ray.learned import evaluate_learned_seat

    d = _write(tmp_path)
    res = evaluate_learned_seat(d)
    nug = res["nugget"]
    # gold on test split: 2 docs x 2 nuggets
    assert nug["gold_mentions"] == 4
    assert nug["pred_mentions"] >= 2
    assert 0 < nug["span"]["f1"] <= 1
    assert nug["labeled"]["f1"] <= nug["span"]["f1"] + 1e-9
    assert res["argument"]["lexicon_size"] == 1
    assert res["role"]["lexicon_size"] == 1  # ransomware -> Tool


def test_role_mode_learns_role_labels(ray_session, tmp_path):
    from casie_ray.learned import learn_surface_lexicon

    d = _write(tmp_path)
    assert learn_surface_lexicon(d, "role") == {"ransomware": "Tool"}


def test_longest_match_scan_is_deterministic():
    from casie_ray.learned import build_surface_matcher, scan_turn

    m = build_surface_matcher({
        "data breach": "Databreach", "breach": "Ransom",
        "data": "Phishing"})
    # longest match wins and consumes its tokens
    spans = scan_turn("A data breach hit; breach again.", m)
    texts = [("A data breach hit; breach again."[s:e], lab)
             for s, e, lab, _k in spans]
    assert texts == [("data breach", "Databreach"),
                     ("breach", "Ransom")]


def test_whitespace_variant_surfaces_share_one_key(ray_session,
                                                   tmp_path):
    """A gold span crossing a line break ('denial of\\nservice') and
    its single-space prose form are ONE canonical surface: the lexicon
    holds one entry, the matcher fires on the prose form, and the
    occurrence scan credits the lexicon key (so the trigger-prob
    denominator sees the matches — the review's bypass is closed)."""
    import json as _json

    from casie_ray.learned import (canon_surface, learn_filtered_lexicon,
                                   learn_surface_lexicon,
                                   surface_occurrence_counts)

    assert canon_surface("denial of\nservice") == "denial of service"
    d = tmp_path / "ann"
    d.mkdir()
    # train docs: gold with embedded newline, prose mentions without
    text = ("A denial of\nservice hit. More denial of service talk; "
            "denial of service again.")
    s = text.index("denial")
    for did in TRAIN_IDS:
        doc = _ann_doc(did, text,
                       [(s, s + len("denial of\nservice"),
                         "denial of\nservice", "Ransom")])
        (d / f"{did}.json").write_text(_json.dumps(doc))
    lex = learn_surface_lexicon(str(d))
    assert lex == {"denial of service": "Ransom"}
    occ = surface_occurrence_counts(str(d), lex)
    # all 3 mentions per doc land under the canonical lexicon key
    assert occ == {"denial of service": 3 * len(TRAIN_IDS)}
    # trigger prob = 5/15 = 1/3: kept at 0.3, dropped at 0.5
    assert learn_filtered_lexicon(str(d), min_prob=0.3) == lex
    assert learn_filtered_lexicon(str(d), min_prob=0.5) == {}


def test_min_count_filters_on_surface_total(ray_session, tmp_path):
    """min_count drops surfaces by TOTAL gold count across labels
    (the documented semantics), not by the winning label's count."""
    import json as _json

    from casie_ray.learned import learn_surface_lexicon

    d = tmp_path / "ann"
    d.mkdir()
    text = "The breach spread."
    s = text.index("breach")
    # 4 train docs alternate the label 2/2 -> argmax count is 2, but
    # the surface total is 4
    for k, did in enumerate(TRAIN_IDS[:4]):
        lab = "Ransom" if k % 2 else "Databreach"
        doc = _ann_doc(did, text, [(s, s + 6, "breach", lab)])
        (d / f"{did}.json").write_text(_json.dumps(doc))
    lex = learn_surface_lexicon(str(d), min_count=3)
    assert lex == {"breach": "Databreach"}  # total 4 >= 3; tie -> min
    assert learn_surface_lexicon(str(d), min_count=5) == {}


# ---------------------------------------------------------------------------
# Argument seat v2 (r5): pattern channels, nugget gate, in-arg
# probabilities, proximity filter (casie_ray/learned.py
# scan_arg_patterns / learn_argument_seat / predict_turn_arguments).
# ---------------------------------------------------------------------------


def test_scan_arg_patterns_channels():
    from casie_ray.learned import scan_arg_patterns

    text = ("Patched CVE-2018-1234 in v2.1.3 on January 5 2018 "
            "costing $5 million.")
    got = {(text[s:e], ch) for s, e, ch in scan_arg_patterns(text)}
    assert got == {("CVE-2018-1234", "ch_cve"), ("v2.1.3", "ch_version"),
                   ("January 5 2018", "ch_time"), ("$5", "ch_money")}
    # a bare month with no day/year is NOT a Time run
    assert scan_arg_patterns("In January nothing happened.") == []


def test_inarg_probs_train_split_only(ray_session, tmp_path):
    from casie_ray.learned import learn_inarg_probs

    d = _write(tmp_path)
    pin = learn_inarg_probs(d, min_occ=1)
    # the gold argument surface in every train doc
    assert pin["ransomware"] == 1.0
    # tokens outside every gold arg span have probability 0
    assert pin["spread"] == 0.0
    # held-out-only vocabulary never enters the table
    assert "cryptolocked" not in pin


def test_argument_seat_gate_and_channels(ray_session, tmp_path):
    from casie_ray.learned import (build_surface_matcher,
                                   learn_argument_seat,
                                   predict_turn_arguments)

    d = _write(tmp_path)
    seat = learn_argument_seat(d)
    assert seat["arg_lexicon"] == {"ransomware": "Malware"}
    m = build_surface_matcher(seat["arg_lexicon"])
    g = build_surface_matcher(seat["gate_lexicon"])
    # gate open (nugget "ransomware" present): lexicon + CVE channel.
    # Boundary extension may absorb an adjacent capitalized token
    # ("The ransomware") — the span must still cover the surface.
    text = "The ransomware used CVE-2018-1234 today."
    got = {(text[s:e], lab)
           for s, e, lab in predict_turn_arguments(text, m, g,
                                                   seat["pin"])}
    assert any("ransomware" in t and lab == "Malware"
               for t, lab in got)
    assert ("CVE-2018-1234", "CVE") in got
    # gate closed (no learned nugget in the turn): NO predictions,
    # even though an argument-channel surface (a CVE) is present
    assert predict_turn_arguments(
        "Patched CVE-2018-4321 without incident.", m, g,
        seat["pin"]) == []


def test_argument_seat_proximity_filter(ray_session, tmp_path):
    from casie_ray.learned import (ARG_PROX_CHARS,
                                   build_surface_matcher,
                                   learn_argument_seat,
                                   predict_turn_arguments)

    d = _write(tmp_path)
    seat = learn_argument_seat(d)
    m = build_surface_matcher(seat["arg_lexicon"])
    g = build_surface_matcher(seat["gate_lexicon"])
    far = "x " * (ARG_PROX_CHARS // 2 + 40)
    text = f"The ransomware spread. {far}Patched CVE-2018-9999 now."
    got = {text[s:e]
           for s, e, _ in predict_turn_arguments(text, m, g,
                                                 seat["pin"])}
    # the distant CVE is dropped by the nugget-proximity filter;
    # the near lexicon hit survives (possibly boundary-extended)
    assert any("ransomware" in t for t in got)
    assert not any("CVE-2018-9999" in t for t in got)


def test_evaluate_argument_seat_end_to_end(ray_session, tmp_path):
    from casie_ray.learned import evaluate_argument_seat

    d = _write(tmp_path)
    res = evaluate_argument_seat(d)
    # 2 held-out docs, the planted arg surface recovered in each:
    # the fixture has gold arguments only on train docs, so gold=0
    # on test and the seat still only predicts near fired nuggets
    assert res["lexicon_size"] == 1
    assert res["pred_mentions"] >= 2
    for key in ("span", "labeled"):
        assert set(res[key]) >= {"precision", "recall", "f1"}


# --- argument seat v3: learned span reranker (nested protocol) ---

V3_TRAIN36 = ["80000", "80001", "80004", "80005", "80006", "80007"]
V3_DEV = ["80002", "80011", "80016", "80018"]      # buckets [20, 36)
V3_TEST = ["80003", "80008"]                       # buckets [0, 20)


def _write_v3(tmp_path, test_text=None):
    """Fixture with docs in all three nested-protocol bucket ranges:
    inner-train (>= 36), dev ([20, 36)) and held-out (< 20)."""
    d = tmp_path / "ann3"
    d.mkdir(parents=True)
    text = ("The ransomware spread fast. An attack on CVE-2018-0101 "
            "hit the bank network hard.")
    for did in V3_TRAIN36 + V3_DEV:
        doc = _ann_doc(did, text,
                       [(*_span(text, "ransomware"), "Ransom")],
                       args=[(*_span(text, "ransomware"),
                              "Malware", "Tool"),
                             (*_span(text, "CVE-2018-0101"),
                              "CVE", "Vulnerability")])
        (d / f"{did}.json").write_text(json.dumps(doc))
    tt = test_text or text
    for did in V3_TEST:
        doc = _ann_doc(did, tt,
                       [(*_span(tt, "ransomware"), "Ransom")])
        (d / f"{did}.json").write_text(json.dumps(doc))
    return str(d)


def test_argument_reranker_deterministic(ray_session, tmp_path):
    """Full-batch GD from zeros with no RNG: two trainings on the
    same fixture produce the identical model and threshold."""
    from casie_ray.learned import learn_argument_reranker

    d = _write_v3(tmp_path)
    a = learn_argument_reranker(d)
    b = learn_argument_reranker(d)
    assert a == b
    assert 0.0 < a["theta"] < 1.0
    import numpy as np
    assert all(np.isfinite(a["w"]))


def test_reranker_filter_is_subset_and_feats_shape(ray_session,
                                                   tmp_path):
    """The v3 filter only removes spans (never adds or moves), and
    feats mode carries exactly RERANK_DIM floats per row."""
    from casie_ray.learned import (RERANK_DIM, learn_argument_seat,
                                   learn_argument_reranker,
                                   predict_arguments)

    d = _write_v3(tmp_path)
    seat = learn_argument_seat(d)
    rr = learn_argument_reranker(d)
    base = predict_arguments(d, seat, "test").to_pandas()
    kept = predict_arguments(d, seat, "test", reranker=rr).to_pandas()
    key = ["conv_id", "turn_idx", "start", "end", "label"]
    bset = set(map(tuple, base[key].itertuples(index=False)))
    kset = set(map(tuple, kept[key].itertuples(index=False)))
    assert kset <= bset
    feats = predict_arguments(d, seat, "test",
                              with_feats=True).to_pandas()
    assert all(len(f) == RERANK_DIM for f in feats["feats"])


def test_reranker_never_touches_held_out(ray_session, tmp_path):
    """Nested no-leakage: changing the CONTENT of held-out docs
    (buckets < 20) changes neither the fitted model nor the chosen
    threshold — the reranker trains and tunes on buckets >= 20
    only."""
    from casie_ray.learned import learn_argument_reranker

    a = learn_argument_reranker(_write_v3(tmp_path))
    b = learn_argument_reranker(_write_v3(
        tmp_path / "alt",
        test_text="Totally different ransomware story, no overlap "
                  "with the original held-out text at all."))
    assert a == b


def test_trim_cfg_strips_closed_class_edges():
    """v3.1 boundary trim: with a trim cfg, spans lose closed-class /
    punctuation EDGE tokens (never interior ones) and spans that trim
    to nothing are dropped; without trim the span is untouched."""
    from casie_ray.learned import (ARG_CFG_DEFAULT, _turn_argument_spans,
                                   build_surface_matcher)

    text = "A breach hit the bank network today."
    matcher = build_surface_matcher({"the bank network": "Organization"})
    gate = build_surface_matcher({"breach": "Databreach"})
    pin: dict = {}
    plain, _ = _turn_argument_spans(text, matcher, gate, pin,
                                    dict(ARG_CFG_DEFAULT))
    trimmed, _ = _turn_argument_spans(text, matcher, gate, pin,
                                      dict(ARG_CFG_DEFAULT, trim=True))
    assert [text[s:e] for s, e, *_ in plain] == ["the bank network"]
    assert [text[s:e] for s, e, *_ in trimmed] == ["bank network"]

    # a span of ONLY closed-class tokens disappears under trim
    m2 = build_surface_matcher({"the": "Data"})
    plain2, _ = _turn_argument_spans(text, m2, gate, pin,
                                     dict(ARG_CFG_DEFAULT))
    trimmed2, _ = _turn_argument_spans(text, m2, gate, pin,
                                       dict(ARG_CFG_DEFAULT, trim=True))
    assert [text[s:e] for s, e, *_ in plain2] == ["the"]
    assert trimmed2 == []


def test_per_source_theta_filters_by_provenance(ray_session, tmp_path):
    """v3.1 per-source thetas: a reranker whose theta_by_src keeps
    everything from one provenance and nothing from another filters
    exactly by the span's source channel."""
    from casie_ray.learned import (RERANK_DIM, RERANK_SRCS, _theta_for,
                                   learn_argument_seat,
                                   predict_arguments)

    assert _theta_for({"theta": 0.5}, "lex") == 0.5
    assert _theta_for({"theta": 0.5,
                       "theta_by_src": {"lex": 0.1}}, "lex") == 0.1
    assert _theta_for({"theta": 0.5,
                       "theta_by_src": {"lex": 0.1}}, "run") == 0.5

    d = _write_v3(tmp_path)
    seat = learn_argument_seat(d)
    base = predict_arguments(d, seat, "test").to_pandas()
    assert len(base) > 0
    # identity model: prob = sigmoid(0) = 0.5 for every span
    ident = {"w": [0.0] * RERANK_DIM, "b": 0.0,
             "mu": [0.0] * RERANK_DIM, "sd": [1.0] * RERANK_DIM,
             "theta": 0.5}
    keep_all = dict(ident, theta_by_src={k: 0.0 for k in RERANK_SRCS})
    drop_all = dict(ident, theta_by_src={k: 0.9 for k in RERANK_SRCS})
    kept = predict_arguments(d, seat, "test",
                             reranker=keep_all).to_pandas()
    dropped = predict_arguments(d, seat, "test",
                                reranker=drop_all).to_pandas()
    assert len(kept) == len(base)
    assert len(dropped) == 0

"""Entity linking + canonicalization unit tests (SURVEY J5/T7/D4):
blocked candidate generation, cosine scoring, capitalized-run NER, and
the cross-conversation union-find merge kernels."""

from __future__ import annotations

from casie_ray.oracle import canonical_mapping
from casie_ray.semantics import (
    build_catalog_matcher, build_fuzzy_index, canon_merge_edges,
    detect_turn, fuzzy_link,
)

ENTS = [
    {"entity_id": "E1", "canonical": "Acmex Corp", "aliases": ["Acmex"],
     "type": "Organization"},
    {"entity_id": "E2", "canonical": "Velmir Labs", "aliases": [],
     "type": "Organization"},
    {"entity_id": "E3", "canonical": "Norvik Server", "aliases": [],
     "type": "System"},
]
CAT = build_catalog_matcher(ENTS)
FUZZY = build_fuzzy_index(ENTS)


def test_fuzzy_link_variant_to_catalog():
    assert fuzzy_link("acmex corp intl", "Organization", FUZZY) == "E1"
    assert fuzzy_link("acmex corp", "Organization", FUZZY) == "E1"
    # different stem, same block prefix would be required to even score
    assert fuzzy_link("zzxqv partners", "Organization", FUZZY) is None


def test_detect_capitalized_run_links_fuzzily():
    det = detect_turn("Acmex Corp Intl stole data from Velmir Labs .",
                      CAT, FUZZY)
    m = {(x.text, x.argtype, x.entity_id) for x in det.mentions}
    assert ("Acmex Corp Intl", "Organization", "E1") in m
    assert ("Velmir Labs", "Organization", "E2") in m


def test_detect_novel_org_stays_unlinked():
    det = detect_turn("Bramado Group stole data .", CAT, FUZZY)
    m = [(x.text, x.argtype, x.entity_id) for x in det.mentions]
    assert ("Bramado Group", "Organization", None) in m


def test_capitalized_run_requires_hint():
    # a capitalized 2-token run without an org designator is not an
    # organization mention (person names go through the catalog path)
    det = detect_turn("Alex Zorvex stole data .", CAT, FUZZY)
    assert not any(x.argtype == "Organization" for x in det.mentions)


def test_canon_merge_edges_threshold():
    nodes = ["organization:bramado group",
             "organization:bramado group intl",
             "organization:creveck group"]
    edges = canon_merge_edges(nodes)
    assert ("organization:bramado group",
            "organization:bramado group intl") in edges
    assert not any("creveck" in a or "creveck" in b for a, b in edges)


def test_canonical_mapping_min_root():
    mapping = canonical_mapping([
        "organization:bramado group",
        "organization:bramado group intl",
        "organization:creveck syndicate",
        "E000001", "c0001:3:17",        # non-surface nodes ignored
    ])
    assert mapping == {
        "organization:bramado group intl": "organization:bramado group"}


def test_kb_type_whitelist_blacklist_and_required_types():
    """wd_search typing semantics (wd_search.py:75-157 re-expression):
    a blacklisted-type entity is vetoed at candidate generation even
    when it is the best cosine match; a type outside the whitelist is
    dropped; required_types gates the probe."""
    from casie_ray.semantics import build_fuzzy_index, fuzzy_link

    ents = [
        {"entity_id": "E1", "canonical": "Acme Corp", "aliases": [],
         "type": "Organization"},
        # same surface prefix + type vocabulary outside the whitelist
        {"entity_id": "E2", "canonical": "Acme Corp", "aliases": [],
         "type": "SportsOrganization"},          # blacklisted
        {"entity_id": "E3", "canonical": "Acme Studio", "aliases": [],
         "type": "Performer"},                   # blacklisted
        {"entity_id": "E4", "canonical": "Acme Thing", "aliases": [],
         "type": "UnknownKind"},                 # not whitelisted
    ]
    fuzzy = build_fuzzy_index(ents)
    # only the Organization survives candidate generation
    assert {k[0] for k in fuzzy} == {"Organization"}
    norm = "acme corp"
    assert fuzzy_link(norm, "Organization", fuzzy) == "E1"
    assert fuzzy_link(norm, "SportsOrganization", fuzzy) is None
    # required-type filter: probe only allowed types
    assert fuzzy_link(norm, "Organization", fuzzy,
                      required_types=frozenset({"Person"})) is None
    assert fuzzy_link(norm, "Organization", fuzzy,
                      required_types=frozenset({"Organization"})) == "E1"
    # explicit narrow whitelist drops even in-vocabulary types
    narrow = build_fuzzy_index(ents, whitelist=frozenset({"Person"}))
    assert narrow == {}

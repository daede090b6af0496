"""Deterministic CASIE-style extraction semantics, per conversation.

This module holds the *rules* of the extractor — detection, document
logic, role/realis assignment, event coreference, triple emission — as
pure functions over plain Python structures for ONE conversation. The
single-process oracle (``casie_ray.oracle``) drives these sequentially;
the distributed engine uses them inside ``groupby(conv_id).map_groups``
for the doc-level stages and re-implements the per-token detection as a
vectorized Arrow stage (``casie_ray.stages.tagger``), tested for exact
agreement with :func:`detect_turn`.

The neural models of the reference (unavailable, SURVEY §3.4) are
replaced by lexicon rules occupying the same pipeline seats:

- detection       <- T1/T2 taggers (nug_arg_detection.py:111-208)
- doc logic       <- recheck/compatible/combine/link (link_coref.py:1027-1407)
- role rules      <- RolePair + role models (link_coref.py:1409-1457)
- realis rules    <- GNG/AO models (link_coref.py:1459-1483)
- coref           <- corefdiffbyevent (link_coref.py:1510-1679), same
                     feature structure / weights / threshold / avg-linkage
"""

from __future__ import annotations

import bisect
import datetime as dt
from dataclasses import dataclass, field

import numpy as np

from . import lexicons as lx
from .embed import embed_surface, embed_surfaces
from .tokenize import tokenize

# ---------------------------------------------------------------------------
# Data structures (plain, picklable, small — these cross map_groups only)
# ---------------------------------------------------------------------------


@dataclass
class Mention:
    start: int
    end: int
    text: str
    argtype: str
    entity_id: str | None = None  # set when the catalog matched exactly
    role: str | None = None
    # for Number mentions: is the following noun data-ish? (drives the
    # Databreach Number role rule, link_coref.py:1444-1455)
    next_noun_dataish: bool = False


@dataclass
class Trigger:
    tok_idx: int
    start: int
    end: int
    surface: str
    etypes: tuple[str, ...]  # candidates; resolved to one by doc logic
    etype: str | None = None
    imputed: bool = False


@dataclass
class TurnDetection:
    """Sufficient statistics of one turn for all downstream stages —
    the engine ships exactly this through Arrow columns instead of the
    reference's tab-file round-trips (SURVEY §3.1)."""
    token_starts: list[int]          # char start of each token
    token_flags: list[int]           # bit 1 = modal word, bit 2 = generic word
    triggers: list[Trigger]
    mentions: list[Mention]
    # unclaimed content tokens (tok_idx, start, end, lower surface,
    # capitalized): the candidate pool for similarity-based trigger
    # imputation (O2) and for coref-chain alias propagation (M12)
    cand_tokens: list[tuple[int, int, int, str, bool]] = field(
        default_factory=list)


@dataclass
class Event:
    event_id: str
    conv_id: str
    turn_idx: int
    etype: str
    nugget_start: int
    nugget_end: int
    nugget_text: str
    realis: str | None = None
    args: list[Mention] = field(default_factory=list)
    cluster: str | None = None


# ---------------------------------------------------------------------------
# Catalog matcher (broadcast small side of the linker, SURVEY J5/T7)
# ---------------------------------------------------------------------------


def build_phrase_index(entries) -> dict:
    """Shared longest-match phrase-index kernel: ``entries`` is an
    iterable of (surface_text, tiebreak, payload_tuple). Returns
    first_token_lower -> [(phrase_tokens_lower, n_tokens, *payload)]
    sorted longest-first, then by tiebreak, then by token tuple —
    fully deterministic. Single source of truth for the matcher
    layout used by the entity catalog and the learned lexicon seat."""
    keyed: dict[str, list] = {}
    for surface, tiebreak, payload in entries:
        toks = tuple(t[0].lower() for t in tokenize(surface))
        if not toks:
            continue
        keyed.setdefault(toks[0], []).append(
            ((-len(toks), tiebreak, toks), (toks, len(toks), *payload)))
    return {k: [e for _, e in sorted(v, key=lambda r: r[0])]
            for k, v in keyed.items()}


def build_catalog_matcher(entities) -> dict:
    """entities: list of dicts or pyarrow Table with
    (entity_id, canonical, aliases, type). Returns
    first_token_lower -> [(phrase_tokens_lower, n_tokens, type, entity_id)]
    sorted longest-first then by entity_id (deterministic alias ties)."""
    if hasattr(entities, "to_pylist"):
        entities = entities.to_pylist()
    return build_phrase_index(
        (s, e["entity_id"], (e["type"], e["entity_id"]))
        for e in entities
        for s in [e["canonical"]] + list(e["aliases"] or []))


def build_fuzzy_index(entities, whitelist=None, blacklist=None) -> dict:
    """Blocked candidate index for fuzzy linking (SURVEY J5; the engine
    seat of wd_search's name-candidate generation, wd_search.py:153-201):
    (type, first-2-chars of normalized surface) ->
    (embedding matrix, entity_ids, norms), candidates sorted by
    (entity_id, norm) for deterministic ties.

    Typing filters (wd_search.py:75-141 semantics at candidate-
    generation time): an entity whose type is in ``blacklist``
    (default lx.KB_TYPE_BLACKLIST) is vetoed outright; with a
    ``whitelist`` (default lx.KB_TYPE_WHITELIST) the type must also
    be whitelisted. The defaults cover the engine's full linkable
    vocabulary, so curated KBs are unaffected while a mixed KB drops
    its out-of-domain rows; pass narrower sets to restrict further."""
    if whitelist is None:
        whitelist = lx.KB_TYPE_WHITELIST
    if blacklist is None:
        blacklist = lx.KB_TYPE_BLACKLIST
    if hasattr(entities, "to_pylist"):
        entities = entities.to_pylist()
    buckets: dict[tuple, set] = {}
    for e in sorted(entities, key=lambda e: e["entity_id"]):
        if e["type"] in blacklist or e["type"] not in whitelist:
            continue
        for s in [e["canonical"]] + list(e["aliases"] or []):
            norm = lx.normalize_surface(s)
            if not norm:
                continue
            key = (e["type"], norm[:lx.LINK_BLOCK_PREFIX])
            buckets.setdefault(key, set()).add((e["entity_id"], norm))
    out: dict[tuple, tuple] = {}
    for key, pairs in buckets.items():
        lst = sorted(pairs)
        out[key] = (embed_surfaces([n for _, n in lst]),
                    [eid for eid, _ in lst], [n for _, n in lst])
    return out


def fuzzy_link(norm: str, argtype: str, fuzzy: dict | None,
               required_types=None) -> str | None:
    """Best cosine candidate at/above LINK_THRESHOLD within the block;
    ties broken by minimum entity_id (cf. strdist scoring,
    link_coref.py:285-309). ``required_types`` is the wd_search
    required-type filter (wd_search.py:154-157): when given, only
    candidates of a required type are eligible — with single-typed
    engine entities that gates the typed block probe itself."""
    if not fuzzy or not norm:
        return None
    if required_types is not None and argtype not in required_types:
        return None
    hit = fuzzy.get((argtype, norm[:lx.LINK_BLOCK_PREFIX]))
    if hit is None:
        return None
    mat, eids, _norms = hit
    sims = mat @ embed_surface(norm)
    best = float(sims.max())
    if best < lx.LINK_THRESHOLD:
        return None
    return min(eids[i] for i in np.nonzero(sims >= best - 1e-9)[0])


_DAY_RE = lx.NUMERIC_RE
_COUNT_NOUNS = set(lx.COUNT_NOUNS)
_MONTHS_SET = frozenset(lx.MONTHS)
_DATAISH_NOUNS = {"records", "files", "documents", "emails", "passwords",
                  "credentials"}


def detect_turn(text: str, catalog: dict, fuzzy: dict | None = None):
    """Per-turn mention + trigger-candidate detection.

    Deterministic longest-match, left-to-right, priority:
    CVE > Version > Money > catalog phrase > argument phrase lexicon >
    month+date > number-before-count-noun; then triggers on unclaimed
    tokens (argument wins on conflict, link_coref.py:613-614).

    This is the engine's multi-channel NE merge (M9, combineExtNe
    parseJsontoFeatures.py:232-256): the regex channel (CVE/Version/
    Money), the catalog channel, and the capitalized-run + fuzzy-link
    channel are merged here by span priority; the fourth channel —
    conversation-level coref-chain propagation — joins at doc-logic
    time (:func:`propagate_coref_aliases`).

    Returns a :class:`TurnDetection`.
    """
    toks = tokenize(text)
    n = len(toks)
    lowers = [t[0].lower() for t in toks]
    claimed = [False] * n
    mentions: list[Mention] = []
    # hot-loop local bindings: the loop body runs per token (~hundreds
    # of millions of times at corpus scale) — global/attr lookups and
    # repeated set probes are measurable there
    cve_match = lx.CVE_RE.match
    version_match = lx.VERSION_RE.match
    money_match = lx.MONEY_RE.match
    arg_first = lx.ARG_PHRASE_FIRST
    arg_surfaces = lx.ARG_PHRASE_SURFACES
    max_arg = lx.MAX_ARG_PHRASE_LEN
    numeral_words = lx.NUMERAL_WORDS

    i = 0
    while i < n:
        tok, s, e = toks[i]
        low = lowers[i]
        c0 = tok[0]
        span = None  # (n_tokens, argtype, entity_id)
        # first-char gates: each pattern pins its first character
        # (^CVE / ^(v)?\d / ^\$), so word tokens skip the regex calls
        if c0 == "C" and cve_match(tok):
            span = (1, "CVE", None)
        elif (c0 == "v" or c0.isdigit()) and version_match(tok):
            span = (1, "Version", None)
        elif c0 == "$" and money_match(tok):
            span = (1, "Money", None)
        if span is None and c0.isupper() and c0.isalpha():
            # capitalized-run NER: a run of >=2 capitalized tokens
            # containing an org designator is an Organization mention —
            # exact catalog surface if the full run matches, else fuzzy
            # blocked-cosine link (stand-in for CoreNLP ORG NER + the
            # curated org lexicon, parseJsontoFeatures.py:879-985)
            j = i
            while j < n and toks[j][0][0].isupper() \
                    and toks[j][0][0].isalpha():
                j += 1
            rl = j - i
            if rl >= 2 and any(lowers[k] in lx.ORG_HINTS
                               for k in range(i, j)):
                run = tuple(lowers[i:j])
                eid = etype = None
                for phrase, ln, ptype, pid in catalog.get(low, ()):
                    if ln == rl and run == phrase:
                        eid, etype = pid, ptype
                        break
                if etype is None:
                    etype = "Organization"
                    eid = fuzzy_link(
                        lx.normalize_surface(text[toks[i][1]:toks[j - 1][2]]),
                        etype, fuzzy)
                span = (rl, etype, eid)
        if span is None and low in catalog:
            for phrase, ln, etype, eid in catalog[low]:
                if i + ln <= n and tuple(lowers[i:i + ln]) == phrase:
                    span = (ln, etype, eid)
                    break
        if span is None and low in arg_first:
            for ln in range(min(max_arg, n - i), 0, -1):
                cand = " ".join(lowers[i:i + ln])
                argtype = arg_surfaces.get(cand)
                if argtype is not None:
                    span = (ln, argtype, None)
                    break
        if span is None and low in _MONTHS_SET:
            # month [day] [year] — requires a following numeric part so
            # bare "may" (modal) is never a Time mention
            ln = 1
            j = i + 1
            if j < n and _DAY_RE.match(toks[j][0]) and len(toks[j][0]) <= 2:
                ln += 1
                j += 1
            if j < n and lx.YEAR_RE.match(toks[j][0]):
                ln = j - i + 1
            if ln > 1:
                span = (ln, "Time", None)
        if span is None and c0.isdigit() and lx.NUMERIC_RE.match(tok) \
                and i + 1 < n and lowers[i + 1] in _COUNT_NOUNS:
            span = (1, "Number", None)
        if span is None and low in numeral_words:
            # English numeral phrase before a count noun ("three million
            # customers", "dozens of records") -> Number mention over the
            # numeral run (txt2int, link_coref.py:334-362)
            j = i + 1
            while j < n and (lowers[j] in numeral_words
                             or (lowers[j] == "and" and j + 1 < n
                                 and lowers[j + 1] in numeral_words)):
                j += 1
            k = j
            if k < n and lowers[k] == "of":
                k += 1
            if k < n and lowers[k] in _COUNT_NOUNS:
                span = (j - i, "Number", None)
        if span is not None:
            ln, argtype, eid = span
            m_start = toks[i][1]
            m_end = toks[i + ln - 1][2]
            nn = i + ln
            if argtype == "Number" and nn < n and lowers[nn] == "of":
                nn += 1      # "dozens of records" -> judge the noun
            dataish = (argtype == "Number" and nn < n
                       and lowers[nn] in _DATAISH_NOUNS)
            mentions.append(Mention(m_start, m_end, text[m_start:m_end],
                                    argtype, eid,
                                    next_noun_dataish=dataish))
            for k in range(i, i + ln):
                claimed[k] = True
            i += ln
        else:
            i += 1

    triggers = [
        Trigger(i, toks[i][1], toks[i][2], toks[i][0],
                lx.TRIGGER_SURFACES[lowers[i]])
        for i in range(n)
        if not claimed[i] and lowers[i] in lx.TRIGGER_SURFACES
    ]
    flags = [(1 if w in lx.MODAL_WORDS else 0)
             | (2 if w in lx.GENERIC_WORDS else 0) for w in lowers]
    # unclaimed content tokens: the similarity-imputation candidate pool
    # (stand-in for the reference's POS-based verb/noun candidates,
    # link_coref.py:966-976 — no parser, so "content word" = alphabetic,
    # not stopword/modal/generic, not a lexicon trigger, length >= 3)
    cands = [
        (i, toks[i][1], toks[i][2], lowers[i], toks[i][0][0].isupper())
        for i in range(n)
        if not claimed[i] and len(lowers[i]) >= 3
        and lowers[i] not in lx.TRIGGER_SURFACES
        and lowers[i] not in lx.NON_CONTENT_WORDS
        and toks[i][0].isalpha()
    ]
    return TurnDetection([t[1] for t in toks], flags, triggers, mentions,
                         cands)


# ---------------------------------------------------------------------------
# Document logic (recheck / compatible / link), per conversation
# ---------------------------------------------------------------------------


def resolve_triggers(turn_triggers: dict[int, list[Trigger]]) -> dict[str, int]:
    """Resolve ambiguous / 'General' trigger candidates against the
    document trigger histogram (cf. scoreH link_coref.py:941-950 and
    recheck :1027-1126). Mutates Trigger.etype. Returns final histogram."""
    hist: dict[str, int] = {t: 0 for t in lx.TRIGGER_TYPES}
    ambiguous: list[Trigger] = []
    for trigs in turn_triggers.values():
        for tr in trigs:
            cands = [t for t in tr.etypes if t != "General"]
            if len(cands) == 1 and "General" not in tr.etypes:
                tr.etype = cands[0]
                hist[tr.etype] += 1
            else:
                ambiguous.append(tr)
    for tr in ambiguous:
        cands = [t for t in tr.etypes if t != "General"]
        if "General" in tr.etypes and not cands:
            cands = list(lx.TRIGGER_TYPES)
            if all(hist[c] == 0 for c in cands):
                tr.etype = None  # bare general noun, no doc context: drop
                continue
        # highest doc count wins; ties alphabetical (deterministic)
        best = max(hist[c] for c in cands)
        tr.etype = sorted(c for c in cands if hist[c] == best)[0]
    final = {t: 0 for t in lx.TRIGGER_TYPES}
    for trigs in turn_triggers.values():
        for tr in trigs:
            if tr.etype:
                final[tr.etype] += 1
    return final


_MUST_HAVE = {"CVE": ("DiscoverVulnerability", "PatchVulnerability"),
              "Vulnerability": ("DiscoverVulnerability", "PatchVulnerability")}


def recheck_impute(turn_triggers, turn_mentions, hist):
    """Impute a trigger on turns that carry a must-have argument (CVE /
    Vulnerability) but no trigger, typed from the doc histogram
    (cf. recheck link_coref.py:1027-1126 via findanytrigger)."""
    for ti, mentions in turn_mentions.items():
        if turn_triggers.get(ti):
            continue
        musts = [m for m in mentions if m.argtype in _MUST_HAVE]
        if not musts:
            continue
        cands = _MUST_HAVE[musts[0].argtype]
        counts = [(hist.get(c, 0), c) for c in cands]
        best_count = max(c for c, _ in counts)
        if best_count == 0:
            continue
        etype = sorted(c2 for c, c2 in counts if c == best_count)[0]
        m = min(musts, key=lambda m: m.start)
        turn_triggers[ti] = [Trigger(-1, m.start, m.end, m.text,
                                     (etype,), etype=etype, imputed=True)]
        hist[etype] = hist.get(etype, 0) + 1


_WORDSET_MATS: dict[str, np.ndarray] | None = None


def _wordset_mats() -> dict[str, np.ndarray]:
    """Per-event-type embedding matrices of the WORDSET seed words
    (built once per process; the hashed-embedding stand-in for the
    reference's w2v vocabulary in maxsim, link_coref.py:269-284)."""
    global _WORDSET_MATS
    if _WORDSET_MATS is None:
        _WORDSET_MATS = {
            et: embed_surfaces([w.lower() for w in ws])
            for et, ws in lx.WORDSET.items()
        }
    return _WORDSET_MATS


def impute_similarity_triggers(turn_triggers, turn_mentions, detections,
                               hist) -> None:
    """Similarity-based trigger imputation (O2; findanytrigger,
    link_coref.py:922-1023): a turn with argument mentions but no
    trigger imputes one at its most trigger-like unclaimed content
    token, when that token's max similarity to an event type's WORDSET
    reaches SIM_CUTOFF (0.68 at :997).

    Candidate event types = arg-compatible (PAIR) AND present in the
    document trigger histogram (the reference's intersect of score /
    scoreH). Ties on the top similarity resolve by document-histogram
    count then alphabetical type, then earliest token — all
    content-derived, no arrival order. Mutates turn_triggers + hist."""
    mats = _wordset_mats()
    for ti in sorted(turn_mentions):
        if turn_triggers.get(ti):
            continue
        mentions = turn_mentions[ti]
        det = detections.get(ti)
        if not mentions or det is None or not det.cand_tokens:
            continue
        intersect = [et for et in lx.TRIGGER_TYPES
                     if hist.get(et, 0) > 0
                     and any(m.argtype in lx.PAIR[et] for m in mentions)]
        if not intersect:
            continue
        spans = {(m.start, m.end) for m in mentions}
        scored = []       # (sim, etype, tok_idx, start, end, surface)
        for tok_idx, s, e, low, _cap in det.cand_tokens:
            if any(s < me and ms < e for ms, me in spans):
                continue  # claimed by an argument (argument-wins)
            v = embed_surface(low)
            best_sim, best_et = 0.0, None
            for et in intersect:
                sim = float((mats[et] @ v).max())
                if sim > best_sim:
                    best_sim, best_et = sim, et
            if best_et is not None:
                scored.append((best_sim, best_et, tok_idx, s, e, low))
        if not scored:
            continue
        top = max(s for s, *_ in scored)
        if top < lx.SIM_CUTOFF:
            continue
        tied = [c for c in scored if c[0] == top]
        etype = sorted((-hist.get(c[1], 0), c[1]) for c in tied)[0][1]
        _, _, tok_idx, s, e, low = min(
            c for c in tied if c[1] == etype)
        turn_triggers[ti] = [Trigger(tok_idx, s, e, low, (etype,),
                                     etype=etype, imputed=True)]
        hist[etype] = hist.get(etype, 0) + 1


PROPAGATE_TYPES = frozenset({"Organization", "System", "Person"})


def propagate_coref_aliases(turn_mentions, detections) -> None:
    """Coref-chain NER propagation (M12; readCoref/combineCoref,
    parseJsontoFeatures.py:60-106): the reference writes the
    representative coref mention's NER type onto chain members whose
    head token is untyped ('O'). The engine's chains are
    conversation-level alias links — a bare capitalized token equal to
    the FIRST or LAST token of a multi-token typed mention (org stem,
    person surname) joins that mention's chain and inherits its argtype
    and entity link.

    Conservative by construction: chain heads must be >=4 alphabetic
    chars and non-stop; a head claimed by two different (argtype,
    entity) chains in the conversation is ambiguous and propagates
    nothing. Claimed candidates leave the imputation pool (a token
    cannot be both an argument and an imputed trigger — argument-wins,
    link_coref.py:613-614). Mutates turn_mentions and det.cand_tokens.
    """
    _AMBIG = ("", None)
    chains: dict[str, tuple[str, str | None]] = {}
    for ti in sorted(turn_mentions):
        for m in turn_mentions[ti]:
            if m.argtype not in PROPAGATE_TYPES:
                continue
            words = m.text.split(" ")
            if len(words) < 2:
                continue
            for head in {words[0].lower(), words[-1].lower()}:
                if len(head) < 4 or not head.isalpha() \
                        or head in lx.STOPWORDS:
                    continue
                key = (m.argtype, m.entity_id)
                if chains.setdefault(head, key) != key:
                    chains[head] = _AMBIG
    chains = {h: k for h, k in chains.items() if k != _AMBIG}
    if not chains:
        return
    for ti in sorted(detections):
        det = detections[ti]
        if det is None or not det.cand_tokens:
            continue
        kept, added = [], []
        for c in det.cand_tokens:
            link = chains.get(c[3]) if c[4] else None
            if link is None:
                kept.append(c)
            else:
                added.append(Mention(c[1], c[2], c[3], link[0], link[1]))
        if added:
            det.cand_tokens = kept
            ms = turn_mentions.setdefault(ti, []) + added
            ms.sort(key=lambda m: (m.start, m.end))
            turn_mentions[ti] = ms


def compatible_filter(turn_triggers, turn_mentions):
    """Drop argument mentions with no compatible-type trigger within the
    ±1 turn window (cf. compatible link_coref.py:1128-1187)."""
    turn_ids = sorted(turn_mentions)
    for ti in turn_ids:
        kept = []
        for m in turn_mentions[ti]:
            ok = False
            for w in (ti - 1, ti, ti + 1):
                for tr in turn_triggers.get(w, []):
                    if tr.etype and m.argtype in lx.PAIR[tr.etype]:
                        ok = True
                        break
                if ok:
                    break
            if ok:
                kept.append(m)
        turn_mentions[ti] = kept


J6_WINDOW = 3


def lookback_attach(events, turn_mentions_all, window: int = J6_WINDOW):
    """J6 (findnearbyner, parseJsontoFeatures.py:951-958): an event left
    with NO arguments borrows the nearest PRECEDING turn's compatible
    mention within ``window`` turns — the reference's nearest-preceding-
    sentence-with-wanted-NE feature applied at link time. Distance 1 is
    already covered by link_events' previous-turn rule, so lookback
    starts at 2. The borrowed mention is copied (a shared object would
    make role assignment order-dependent) and taken from the PRE-filter
    mention table: compatibility filtering is a ±1-turn window by
    construction, which is exactly why a farther-back mention needs this
    separate path. Mutates events."""
    import dataclasses
    for e in events:
        if e.args:
            continue
        for d in range(2, window + 1):
            cands = [m for m in turn_mentions_all.get(e.turn_idx - d, [])
                     if m.argtype in lx.PAIR[e.etype]]
            if cands:
                src = max(cands, key=lambda m: m.start)
                e.args.append(dataclasses.replace(src))
                break


def link_events(conv_id, turn_triggers, turn_mentions) -> list[Event]:
    """One event per resolved trigger; each argument attaches to the
    nearest compatible trigger in its own turn, else the last compatible
    trigger of the previous turn (cf. link, link_coref.py:1223-1407)."""
    events: dict[tuple, Event] = {}

    def get_event(ti, tr) -> Event:
        key = (ti, tr.start)
        if key not in events:
            events[key] = Event(
                event_id=f"{conv_id}:{ti}:{tr.start}", conv_id=conv_id,
                turn_idx=ti, etype=tr.etype, nugget_start=tr.start,
                nugget_end=tr.end, nugget_text=tr.surface)
        return events[key]

    for ti in sorted(turn_triggers):
        for tr in turn_triggers[ti]:
            if tr.etype:
                get_event(ti, tr)

    for ti in sorted(turn_mentions):
        for m in turn_mentions[ti]:
            same = [tr for tr in turn_triggers.get(ti, [])
                    if tr.etype and m.argtype in lx.PAIR[tr.etype]]
            target = None
            if same:
                target = min(same, key=lambda tr: (abs(tr.start - m.start),
                                                   tr.start))
                t_ti = ti
            else:
                prev = [tr for tr in turn_triggers.get(ti - 1, [])
                        if tr.etype and m.argtype in lx.PAIR[tr.etype]]
                if prev:
                    target = max(prev, key=lambda tr: tr.start)
                    t_ti = ti - 1
            if target is not None:
                get_event(t_ti, target).args.append(m)
    return [events[k] for k in sorted(events)]


# ---------------------------------------------------------------------------
# Role + realis rules (deterministic stand-ins for T4/T5 models)
# ---------------------------------------------------------------------------


def assign_roles(event: Event) -> None:
    """RolePair-driven role assignment with deterministic disambiguation
    (cf. roleassign link_coref.py:1409-1457 incl. the Databreach Number
    special case :1444-1455). Args with no role mapping are dropped."""
    kept = []
    for m in event.args:
        roles = lx.ROLE_PAIR[event.etype].get(m.argtype)
        if not roles:
            continue
        if len(roles) == 1:
            m.role = roles[0]
        else:
            rset = set(roles)
            if {"Attacker", "Victim"} <= rset:
                m.role = "Attacker" if m.start < event.nugget_start else "Victim"
            elif {"Patch-Releaser", "Vulnerable-System-Owner"} <= rset:
                m.role = ("Patch-Releaser" if m.start < event.nugget_start
                          else "Vulnerable-System-Owner")
            elif event.etype == "Databreach" and m.argtype == "Number":
                # decided by the noun following the number (":1444-1455")
                m.role = ("Number-of-Compromised-Data"
                          if m.next_noun_dataish else "Number-of-victim")
            else:
                m.role = roles[0]
        kept.append(m)
    event.args = kept


def realis_window_flags(det: TurnDetection, nugget_start: int) -> tuple[bool, bool]:
    """(modal_in_window, generic_in_window) over the ±7-token context
    window around the nugget (window size per prepare.py:276-277)."""
    idx = max(0, bisect.bisect_right(det.token_starts, nugget_start) - 1)
    lo = max(0, idx - 7)
    hi = min(len(det.token_flags), idx + 8)
    modal = any(det.token_flags[k] & 1 for k in range(lo, hi))
    generic = any(det.token_flags[k] & 2 for k in range(lo, hi))
    return modal, generic


def assign_realis(event: Event, modal: bool, generic: bool) -> None:
    """Rule-based realis (deterministic stand-in for the GNG/AO realis
    models, link_coref.py:1459-1483): modal context -> Other, generic
    context or generic plural trigger -> Generic, else Actual."""
    if modal:
        event.realis = "Other"
    elif generic or event.nugget_text.lower() in lx.GENERIC_TRIGGER_SURFACES:
        event.realis = "Generic"
    else:
        event.realis = "Actual"


# ---------------------------------------------------------------------------
# Event coreference (corefdiffbyevent, link_coref.py:1510-1679)
# ---------------------------------------------------------------------------


def _strdist(a: str, b: str) -> float:
    """Cosine distance / 2 of the hashed surface embeddings — same shape
    as strdist (link_coref.py:301-309) with w2v replaced by the
    deterministic hashed embedding."""
    if a == b:
        return 0.0
    va, vb = embed_surface(a.lower()), embed_surface(b.lower())
    return float(max(0.0, 1.0 - float(va @ vb))) / 2.0


_REL_DAYS = {"yesterday": -1, "today": 0, "tomorrow": 1, "last week": -7,
             "last month": -30, "last year": -365, "this week": 0,
             "this month": 0, "this year": 0, "earlier this year": -90,
             "earlier this week": -3, "recently": -7}


def parse_time_mention(text: str, turn_ts: dt.datetime | None):
    """Time-argument surface -> ordinal day (cf. strtotime/durationtotime,
    link_coref.py:364-497, with the turn timestamp as pubdate)."""
    low = text.lower().strip()
    words = low.split()
    if words and words[0] in lx.MONTHS:
        month = lx.MONTHS.index(words[0]) + 1
        day, year = 15, None
        for w in words[1:]:
            if lx.YEAR_RE.match(w):
                year = int(w)
            elif w.isdigit() and int(w) <= 31:
                day = int(w)
        if year is None:
            year = turn_ts.year if turn_ts else 2018
        try:
            return dt.date(year, month, min(day, 28)).toordinal()
        except ValueError:
            return None
    base = turn_ts.date() if turn_ts else dt.date(2018, 1, 1)
    if low in _REL_DAYS:
        return base.toordinal() + _REL_DAYS[low]
    if low in lx.WEEKDAYS:
        return base.toordinal()
    return None


def _coref_distance_matrix(evs: list[Event], turn_ts: dict[int, dt.datetime]):
    """7-feature weighted distance matrix for one (conv, etype) subset,
    mirroring the reference's feature structure and its per-subset
    min-max normalization of the count features."""
    n = len(evs)
    w = lx.COREF_WEIGHTS
    args_of = [[(m.argtype, lx.normalize_surface(m.text), m.entity_id)
                for m in e.args] for e in evs]
    nuggetdiff = np.zeros((n, n))
    realisdiff = np.zeros((n, n))
    argtype_i = np.zeros((n, n))
    argcoref = np.zeros((n, n))
    nuggetdist = np.zeros((n, n))
    argmiss = np.zeros((n, n))
    timedist = np.zeros((n, n))
    times = []
    for e in evs:
        tvals = [parse_time_mention(m.text, turn_ts.get(e.turn_idx))
                 for m in e.args if m.argtype == "Time"]
        tvals = [t for t in tvals if t is not None]
        times.append(tvals[0] if tvals else None)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            e1, e2 = evs[i], evs[j]
            nuggetdiff[i, j] = _strdist(e1.nugget_text, e2.nugget_text)
            realisdiff[i, j] = 0.0 if e1.realis == e2.realis else 1.0
            t2 = [a[0] for a in args_of[j]]
            inter = 0
            for a1, _, _ in args_of[i]:
                if a1 in t2:
                    t2.remove(a1)
                    inter += 1
            argtype_i[i, j] = inter
            argmiss[i, j] = len(args_of[i]) - inter
            nuggetdist[i, j] = abs(e1.turn_idx - e2.turn_idx)
            total = coref_hits = 0
            for a1 in args_of[i]:
                for a2 in args_of[j]:
                    if (a1[2] is not None and a1[2] == a2[2]) or a1[1] == a2[1]:
                        coref_hits += 1
                    total += 1
            argcoref[i, j] = 1.0 - coref_hits / total if total else 1.0
            if times[i] is not None and times[j] is not None:
                timedist[i, j] = 1.0 if abs(times[i] - times[j]) > 0 else 0.0

    def minmax(m):
        mx = m.max()
        if mx == 0:
            return np.zeros_like(m)
        mn = m.min()
        return (m - mn) / (mx - mn)

    dist = (nuggetdiff * w[0] + realisdiff * w[1] + minmax(argtype_i) * w[2]
            + argcoref * w[3] + minmax(nuggetdist) * w[4]
            + minmax(argmiss) * w[5] + timedist * w[6])
    np.fill_diagonal(dist, 0.0)
    return dist


def _average_linkage(dist: np.ndarray, threshold: float) -> list[int]:
    """Exact average-linkage agglomerative clustering with deterministic
    smallest-(d,i,j) tie-break; merges while min linkage < threshold
    (matches sklearn AgglomerativeClustering(distance_threshold=...) used
    at link_coref.py:1670 for small n)."""
    n = dist.shape[0]
    clusters: dict[int, list[int]] = {i: [i] for i in range(n)}
    d = {(i, j): float(dist[i, j] + dist[j, i]) / 2.0
         for i in range(n) for j in range(i + 1, n)}
    while len(clusters) > 1:
        keys = sorted(clusters)
        best = None
        for ai in range(len(keys)):
            for bi in range(ai + 1, len(keys)):
                a, b = keys[ai], keys[bi]
                dd = d[(a, b) if a < b else (b, a)]
                if best is None or dd < best[0] - 1e-12:
                    best = (dd, a, b)
        if best is None or best[0] >= threshold:
            break
        _, a, b = best
        na, nb = len(clusters[a]), len(clusters[b])
        for c in clusters:
            if c in (a, b):
                continue
            ka = (min(a, c), max(a, c))
            kb = (min(b, c), max(b, c))
            d[ka] = (d[ka] * na + d[kb] * nb) / (na + nb)
        clusters[a] = clusters[a] + clusters[b]
        del clusters[b]
    labels = [0] * n
    for cid, (root, members) in enumerate(sorted(clusters.items())):
        for m in members:
            labels[m] = cid
    return labels


def coref_events(events: list[Event], turn_ts: dict[int, dt.datetime]) -> None:
    """Cluster events per event type within one conversation; cluster id
    = lexicographically smallest member event_id (content-derived — never
    arrival order, SURVEY §7.4 determinism)."""
    by_type: dict[str, list[Event]] = {}
    for e in events:
        by_type.setdefault(e.etype, []).append(e)
    for etype in sorted(by_type):
        evs = sorted(by_type[etype], key=lambda e: e.event_id)
        if len(evs) == 1:
            evs[0].cluster = evs[0].event_id
            continue
        dist = _coref_distance_matrix(evs, turn_ts)
        labels = _average_linkage(dist, lx.COREF_THRESHOLD)
        groups: dict[int, list[Event]] = {}
        for e, lab in zip(evs, labels):
            groups.setdefault(lab, []).append(e)
        for members in groups.values():
            root = min(m.event_id for m in members)
            for m in members:
                m.cluster = root


# ---------------------------------------------------------------------------
# Canonicalization + triple emission (S8 -> graph materialization)
# ---------------------------------------------------------------------------

_LITERAL_TYPES = {"CVE", "Version", "Money", "Number", "Time"}


def canonical_obj(m: Mention) -> str:
    """Canonical node id for an argument mention: linked entity id when
    the catalog matched, typed literal otherwise."""
    if m.entity_id:
        return m.entity_id
    if m.argtype == "CVE":
        return m.text.upper()
    if m.argtype == "Number":
        t = m.text.replace(",", "")
        if any(c.isalpha() for c in t):
            # English numeral phrase -> digits (txt2int,
            # link_coref.py:334-362): "three million" and "3000000"
            # become the same graph node
            return str(lx.txt2int(t))
        return t
    if m.argtype in _LITERAL_TYPES:
        return m.text.replace(",", "")
    return f"{m.argtype.lower()}:{lx.normalize_surface(m.text)}"


def parse_surface_node(node: str) -> tuple[str, str] | None:
    """`type:normalized-surface` node id -> (type, surface), else None
    (entity ids, event ids and literals are not surface nodes)."""
    i = node.find(":")
    if i <= 0:
        return None
    t = node[:i]
    if t in lx.SURFACE_NODE_TYPES:
        return (t, node[i + 1:])
    return None


def canon_block_key(node_type: str, norm: str) -> str:
    """Entity block for the canonicalization shuffle (SURVEY §7.3 #2)."""
    return f"{node_type}|{norm[:lx.LINK_BLOCK_PREFIX]}"


def canon_merge_edges(nodes: list[str]) -> list[tuple[str, str]]:
    """Pairwise merge edges within ONE entity block: surface nodes whose
    hashed-trigram cosine >= CANON_THRESHOLD. Deterministic (sorted
    nodes, vectorized similarity); shared verbatim by the sequential
    oracle and the engine's groupby(entity_block) stage."""
    uniq = sorted(set(nodes))
    if len(uniq) < 2:
        return []
    mats = embed_surfaces([parse_surface_node(nd)[1] for nd in uniq])
    sims = mats @ mats.T
    ii, jj = np.nonzero(np.triu(sims >= lx.CANON_THRESHOLD, 1))
    return [(uniq[a], uniq[b]) for a, b in zip(ii.tolist(), jj.tolist())]


def emit_triples(events: list[Event]) -> list[dict]:
    """Events -> (subj, pred, obj) assertions (the engine's equivalent of
    the brat frame emitters, report.py:260-481)."""
    out = []

    def triple(e, subj, pred, obj, st, ot, weight=1.0):
        out.append({
            "subj": subj, "pred": pred, "obj": obj,
            "subj_type": st, "obj_type": ot, "conv_id": e.conv_id,
            "turn_idx": e.turn_idx, "ev_start": e.nugget_start,
            "ev_end": e.nugget_end, "weight": weight,
        })

    for e in events:
        triple(e, e.event_id, "event-type", e.etype, "Event", "EventType")
        triple(e, e.event_id, "has-realis", e.realis or "Actual",
               "Event", "Realis")
        role_members: dict[str, list[Mention]] = {}
        for m in e.args:
            triple(e, e.event_id, m.role, canonical_obj(m), "Event",
                   m.argtype)
            role_members.setdefault(m.role, []).append(m)
        for pred, (subj_role, obj_role) in lx.DERIVED_PREDS.items():
            for ms in sorted(role_members.get(subj_role, []),
                             key=lambda m: m.start):
                for mo in sorted(role_members.get(obj_role, []),
                                 key=lambda m: m.start):
                    triple(e, canonical_obj(ms), pred, canonical_obj(mo),
                           ms.argtype, mo.argtype)
        if e.cluster and e.cluster != e.event_id:
            triple(e, e.event_id, "same-as", e.cluster, "Event", "Event")
    return out


# ---------------------------------------------------------------------------
# Full per-conversation extraction (the kernel both sides agree on)
# ---------------------------------------------------------------------------


def doc_logic(conv_id: str, detections: dict[int, TurnDetection]) -> list[Event]:
    """Document-level stages over precomputed per-turn detections:
    resolve/impute triggers, compatibility filter, link. Returns events
    WITHOUT realis/roles/coref — those are separate pipeline seats."""
    turn_triggers = {ti: d.triggers for ti, d in detections.items()}
    turn_mentions = {ti: d.mentions for ti, d in detections.items()}
    propagate_coref_aliases(turn_mentions, detections)
    hist = resolve_triggers(turn_triggers)
    recheck_impute(turn_triggers, turn_mentions, hist)
    impute_similarity_triggers(turn_triggers, turn_mentions, detections,
                               hist)
    # pre-filter snapshot: the J6 lookback may reach mentions the
    # ±1-turn compatibility filter is about to drop
    mentions_all = {ti: list(ms) for ti, ms in turn_mentions.items()}
    compatible_filter(turn_triggers, turn_mentions)
    events = link_events(conv_id, turn_triggers, turn_mentions)
    lookback_attach(events, mentions_all)
    return events


def extract_conversation(conv_id: str, turns: list[dict], catalog: dict,
                         detections: dict[int, TurnDetection] | None = None,
                         fuzzy: dict | None = None) -> list[Event]:
    """turns: [{turn_idx, text, ts}] sorted by turn_idx.

    ``detections``: optional precomputed {turn_idx: TurnDetection} — the
    engine passes the tagger stage's output here; the oracle leaves it
    None and detects inline.
    """
    turn_ts: dict[int, dt.datetime] = {}
    if detections is None:
        detections = {}
        for t in turns:
            detections[t["turn_idx"]] = detect_turn(t["text"], catalog,
                                                    fuzzy)
    for t in turns:
        turn_ts[t["turn_idx"]] = t.get("ts")

    events = doc_logic(conv_id, detections)
    for e in events:
        assign_roles(e)
        modal, generic = realis_window_flags(detections[e.turn_idx],
                                             e.nugget_start)
        assign_realis(e, modal, generic)
    coref_events(events, turn_ts)
    return events

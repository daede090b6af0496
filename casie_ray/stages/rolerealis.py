"""Role + realis stage — the engine seat of the reference's five
per-event-type role models and two realis models (T4/T5,
link_coref.py:89-119; roleassign :1409-1457; realisassign :1459-1483).

The deterministic rule bundles standing in for the unavailable neural
weights (SURVEY §7.0) are module-level tables with zero load cost, so
this stage runs as a *stateless task pool* (elastic, no CPU
reservation — a second fixed actor pool here would deadlock against the
detect pool on small hosts). ``ModelRoleRealisScorer`` shows the
actor-pool shape a trained model would occupy instead.

Row-wise over event rows — no shuffle; events of a conversation stay
within their block.
"""

from __future__ import annotations

import pyarrow as pa

from ..schema import EVENT_SCHEMA, event_to_row, row_to_event
from ..semantics import assign_realis, assign_roles


def role_realis_batch(batch: pa.Table,
                      realis_model: dict | None = None) -> pa.Table:
    """``realis_model=None``: rule-based realis (the default seat).
    With a model dict (stages/modelseat.py), realis comes from ONE
    batched forward pass instead — the declared seat interface: only
    the realis column may differ between seats."""
    rows = batch.to_pylist()
    preds = None
    if realis_model is not None and rows:
        from .modelseat import predict_realis
        preds = predict_realis(
            realis_model, [r["nugget_text"] for r in rows],
            [r["modal"] for r in rows], [r["generic"] for r in rows])
    out = []
    for i, r in enumerate(rows):
        e = row_to_event(r)
        assign_roles(e)
        if preds is not None:
            e.realis = preds[i]
        else:
            assign_realis(e, r["modal"], r["generic"])
        out.append(event_to_row(e, r["ts"], r["modal"], r["generic"]))
    if not out:
        return EVENT_SCHEMA.empty_table()
    return pa.Table.from_pylist(out, schema=EVENT_SCHEMA)


class ModelRoleRealisScorer:
    """Actor-pool variant: the constructor loads the realis model once
    per actor (cf. load_model_role/load_model_realis,
    link_coref.py:89-119) — e.g.
    ``map_batches(ModelRoleRealisScorer,
    fn_constructor_args=(load_realis_model,), concurrency=N)``.
    Without a loader it degrades to the stateless rule seat."""

    def __init__(self, model_loader=None):
        self.models = model_loader() if model_loader else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        return role_realis_batch(batch, realis_model=self.models)

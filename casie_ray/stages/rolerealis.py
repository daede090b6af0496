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


def role_realis_batch(batch: pa.Table) -> pa.Table:
    rows = batch.to_pylist()
    out = []
    for r in rows:
        e = row_to_event(r)
        assign_roles(e)
        assign_realis(e, r["modal"], r["generic"])
        out.append(event_to_row(e, r["ts"], r["modal"], r["generic"]))
    if not out:
        return EVENT_SCHEMA.empty_table()
    return pa.Table.from_pylist(out, schema=EVENT_SCHEMA)


class ModelRoleRealisScorer:
    """Actor-pool variant: constructor would load the 5 role heads + 2
    realis heads once per actor (cf. load_model_role/load_model_realis,
    link_coref.py:89-119); kept as the drop-in seat for a real model.
    Use with map_batches(ModelRoleRealisScorer, concurrency=N)."""

    def __init__(self, model_loader=None):
        self.models = model_loader() if model_loader else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        return role_realis_batch(batch)

"""Event-coreference stage: ``groupby("conv_id").map_groups`` running
the average-linkage clustering (reference corefdiffbyevent,
link_coref.py:1510-1679; weights/threshold :2041-2042). Shuffle #2 —
over the events table, which is far smaller than the turns table.
"""

from __future__ import annotations

import pyarrow as pa

from ..schema import EVENT_SCHEMA, event_to_row, row_to_event
from ..semantics import coref_events


def coref_group(group: pa.Table) -> pa.Table:
    rows = group.to_pylist()
    if not rows:
        return EVENT_SCHEMA.empty_table()
    events = [row_to_event(r) for r in rows]
    turn_ts = {r["turn_idx"]: r["ts"] for r in rows}
    coref_events(events, turn_ts)
    out = [event_to_row(e, r["ts"], r["modal"], r["generic"])
           for e, r in zip(events, rows)]
    return pa.Table.from_pylist(out, schema=EVENT_SCHEMA)

"""Broadcast small-side lookups (SURVEY.md §2.4 J4/J5 pattern).

`ray.put` the small object ONCE on the driver; pass the ObjectRef into actor
`__init__`s or resolve lazily inside stateless map_batches fns. Never re-ship
the object per batch, never shuffle-join a small side.
"""

from __future__ import annotations

from typing import Any

import ray


def broadcast(obj: Any) -> "ray.ObjectRef":
    return ray.put(obj)


def resolve(ref_or_obj: Any) -> Any:
    if isinstance(ref_or_obj, ray.ObjectRef):
        return ray.get(ref_or_obj)
    return ref_or_obj


class BroadcastSetFilter:
    """Semi/anti-join by broadcast key set: keep rows whose `column` is (or is
    not) in the broadcast set (J5 — check_dataset.py:24-49 style membership)."""

    def __init__(self, keys_ref: Any, column: str, keep_if_member: bool = True):
        self.keys = frozenset(resolve(keys_ref))
        self.column = column
        self.keep = keep_if_member

    def __call__(self, batch):
        import pyarrow as pa
        import pyarrow.compute as pc

        mask = pc.is_in(batch.column(self.column), value_set=pa.array(list(self.keys)))
        if not self.keep:
            mask = pc.invert(mask)
        return batch.filter(mask)

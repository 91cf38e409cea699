"""Worker-side cache for broadcast objects (``ray.put`` once, read per task).

The canonical Ray Data broadcast pattern is an actor pool whose ``__init__``
does ``ray.get(ref)`` once per actor — but on this engine the extraction-style
stages measure ~3× faster as STATELESS tasks (module state warms per reused
worker process; see CLAUDE.md), and actor-pool spin-up alone costs 1-2 s per
query. This module gives stateless tasks the same fetch-once semantics: the
first task on a worker process pays one plasma ``ray.get`` (shared-memory,
zero-copy for numpy/Arrow payloads); every later task on that worker hits the
module-level cache.

Scale note: the cache is per worker process and capped — broadcast objects
are small by contract (that is why they are broadcast, not shuffled).
"""

from __future__ import annotations

from collections import OrderedDict

import ray

_CACHE: "OrderedDict[bytes, object]" = OrderedDict()
_MAX_ENTRIES = 8


def get_broadcast(ref: "ray.ObjectRef"):
    """ray.get(ref), cached per worker process (LRU, ≤ _MAX_ENTRIES refs)."""
    key = ref.binary()
    if key in _CACHE:
        _CACHE.move_to_end(key)
        return _CACHE[key]
    obj = ray.get(ref)
    _CACHE[key] = obj
    while len(_CACHE) > _MAX_ENTRIES:
        _CACHE.popitem(last=False)
    return obj

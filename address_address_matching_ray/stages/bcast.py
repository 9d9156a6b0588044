"""Worker-local cache for broadcast ``ray.get`` reads.

Numeric numpy arrays come out of the object store zero-copy, so
``ray.get(ref)`` per batch is free for them.  Anything pickled —
above all OBJECT arrays of strings (the dedup text attach) — is
re-deserialized on EVERY ``ray.get``: measured minutes of pure
unpickling when a 300k-string broadcast was fetched once per
1024-row batch (round 4).  ``get_cached`` memoizes the deserialized
value per worker process, bounded to the last few broadcasts so
long-lived workers crossing many pipelines don't accumulate.
"""

from __future__ import annotations

from collections import OrderedDict

_CACHE: OrderedDict[str, object] = OrderedDict()
_MAX_ENTRIES = 4


def get_cached(ref):
    import ray

    key = ref.hex()
    if key in _CACHE:
        _CACHE.move_to_end(key)
        return _CACHE[key]
    val = ray.get(ref)
    _CACHE[key] = val
    while len(_CACHE) > _MAX_ENTRIES:
        _CACHE.popitem(last=False)
    return val

"""Session-scoped build-once caches for expensive shared artifacts.

Five artifacts follow the same production build/query split (an offline
stage builds a model / index / pair table; many queries read it): the LR
fraud scorer, the KMeans centroids, the near-dup pair graph, its
connected components, and the contamination gram index. Each caches its
build keyed on ``(applicationId, ...)`` so nothing leaks across Spark
sessions, and evicts entries from dead applications so long-lived
drivers that cycle sessions don't accumulate unreachable handles.

One helper instead of five hand-rolled copies: any future change to the
eviction rule (size bound, thread-safety) lands in exactly one place.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")


def session_cached(cache: dict, key: tuple, build: Callable[[], T]) -> T:
    """Get-or-build ``cache[key]``; ``key[0]`` MUST be the live Spark
    applicationId — entries from other (dead) applications are evicted
    on every build."""
    got = cache.get(key)
    if got is None:
        got = build()
        for k in [k for k in cache if k[0] != key[0]]:
            del cache[k]
        cache[key] = got
    return got

"""Serving-layer result cache + query-surface validation
(SURVEY §2.7 T8, §2.2 F7, §2.1 S7/S8/S9).

``df.cache()`` is lineage caching, not a keyed TTL cache — the
reference's serving cache (``src/api/cache.py``) is a *result* cache
keyed by query parameters with TTL expiry, LRU eviction and per-ticker
invalidation. That is a driver-side concern in Spark too: materialized
(small) results keyed exactly like ``cache.py:55-66``.
"""

from __future__ import annotations

import hashlib
import json
import re
import time
from collections import OrderedDict
from dataclasses import dataclass
from typing import Any

#: Reference ticker rule (``data_service.py:312-324``).
_TICKER_RE = re.compile(r"^[A-Za-z0-9.\-]{1,6}$")


def validate_ticker(ticker: str) -> str:
    """F7 — normalize + validate a ticker at the API edge."""
    t = ticker.strip().upper()
    if not _TICKER_RE.match(t):
        raise ValueError(f"invalid ticker format: {ticker!r}")
    return t


def cache_key(**params: Any) -> str:
    """Deterministic key from query params (``cache.py:55-66`` md5s the
    sorted param string)."""
    canon = json.dumps(params, sort_keys=True, default=str)
    return hashlib.md5(canon.encode()).hexdigest()


@dataclass
class _Entry:
    value: Any
    expires_at: float
    tickers: frozenset[str]


class ResultCache:
    """Keyed TTL + LRU result cache (T8, ``cache.py:19-254``).

    Stores *collected* results (lists/pandas), never DataFrames — a
    cached plan would re-execute on access; a cached result is O(1).
    """

    def __init__(self, max_size: int = 1000, ttl_seconds: float = 3600.0):
        self.max_size = max_size
        self.ttl = ttl_seconds
        self._data: OrderedDict[str, _Entry] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def get(self, key: str) -> Any | None:
        entry = self._data.get(key)
        if entry is None or entry.expires_at < time.monotonic():
            if entry is not None:
                del self._data[key]
            self.misses += 1
            return None
        self._data.move_to_end(key)  # LRU touch
        self.hits += 1
        return entry.value

    def put(self, key: str, value: Any, tickers: tuple[str, ...] = ()) -> None:
        self._data[key] = _Entry(
            value=value,
            expires_at=time.monotonic() + self.ttl,
            tickers=frozenset(t.upper() for t in tickers),
        )
        self._data.move_to_end(key)
        while len(self._data) > self.max_size:  # LRU eviction (cache.py:159-166)
            self._data.popitem(last=False)

    def sweep(self) -> int:
        """TTL sweep (``cache.py:168-193``); returns evicted count."""
        now = time.monotonic()
        dead = [k for k, e in self._data.items() if e.expires_at < now]
        for k in dead:
            del self._data[k]
        return len(dead)

    def clear(self) -> int:
        """Drop every entry (``POST /cache/clear``); returns the count."""
        n = len(self._data)
        self._data.clear()
        return n

    def invalidate_ticker(self, ticker: str) -> int:
        """Per-ticker invalidation (``cache.py:242-254``)."""
        t = ticker.upper()
        dead = [k for k, e in self._data.items() if t in e.tickers]
        for k in dead:
            del self._data[k]
        return len(dead)

    def stats(self) -> dict[str, int | float]:
        return {
            "size": len(self._data),
            "hits": self.hits,
            "misses": self.misses,
            "hit_rate": self.hits / max(1, self.hits + self.misses),
        }

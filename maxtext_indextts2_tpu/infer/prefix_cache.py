"""Prompt prefix caching for the serving engine.

Reference: maxengine prefix-caching config (maxengine_server.py:40-52
prefix caching + maxengine.py insert_partial / ExistingPrefix). Requests
that share a long prefix (system prompt, few-shot header) skip re-prefilling
the shared part: chunk-aligned KV snapshots are stored host-side keyed by
the exact prefix tokens, and `Engine.prefill_cached` resumes chunked prefill
from the longest hit.

TPU-first shape discipline: entries are only stored at chunk boundaries so
every resumed prefill reuses the SAME jitted chunk program (no new shapes,
no recompiles).
"""

from __future__ import annotations

from collections import OrderedDict



class PrefixCache:
    """LRU store: prefix tokens (chunk-aligned) -> KV cache pytree."""

    def __init__(self, chunk_size: int, max_entries: int = 16):
        self.chunk_size = chunk_size
        self.max_entries = max_entries
        self._store: OrderedDict[tuple, dict] = OrderedDict()
        self.hits = 0
        self.misses = 0

    def lookup(self, tokens, true_length: int):
        """Longest chunk-aligned strict prefix with a cached snapshot.

        Returns (offset, cache) or (0, None). Strict: at least one token of
        the prompt is left to prefill so the next-token logits are fresh."""
        best = 0
        cache = None
        limit = true_length - 1
        for off in range(self.chunk_size, limit + 1, self.chunk_size):
            key = tuple(int(t) for t in tokens[:off])
            entry = self._store.get(key)
            if entry is None:
                continue
            best, cache = off, entry
            self._store.move_to_end(key)
        if cache is None:
            self.misses += 1
        else:
            self.hits += 1
        return best, cache

    def insert(self, tokens, offset: int, cache) -> None:
        """Store the KV snapshot covering tokens[:offset] (chunk-aligned)."""
        if offset % self.chunk_size != 0 or offset == 0:
            return
        key = tuple(int(t) for t in tokens[:offset])
        self._store[key] = cache
        self._store.move_to_end(key)
        while len(self._store) > self.max_entries:
            self._store.popitem(last=False)

    def stats(self) -> dict:
        return {
            "entries": len(self._store),
            "hits": self.hits,
            "misses": self.misses,
        }

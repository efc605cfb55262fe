"""Misra-Gries heavy-hitters summary (deterministic top-k sketch).

The k-counter frequent-items algorithm (Misra & Gries 1982): k live
counters; a seen item increments its counter, an unseen item takes a
free slot, and when no slot is free EVERY counter decrements (evicting
zeros). Invariants after any prefix of n items:

- undercount only: ``est(i) <= true(i)`` for every retained item;
- bounded error:   ``true(i) - est(i) <= (n - Σ counts) / (k + 1)``
  (each decrement round removes k+1 occurrences — the k counters plus
  the arriving item — so the total undercount is bounded by the mass
  the summary gave up);
- containment: any item with ``true(i) > n / (k + 1)`` is retained.

The summary is mergeable (add counters, keep the top k after a joint
decrement), which is what lets the streaming twin carry it through the
state store across micro-batches with the SAME bounds — the
deterministic counterpart of the Count-Min grid (which overcounts and
needs hash width) and SpaceSaving (same bound, overcount direction).

Used by ``streaming/stateful.py:mg_topk_stream`` as its state kernel;
pure Python on purpose: it runs inside applyInPandasWithState where
the per-key item stream is already an Arrow batch iterator.
"""

from __future__ import annotations


class MisraGries:
    def __init__(self, k: int) -> None:
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = k
        self.counters: dict = {}
        self.n = 0

    def update(self, item) -> None:
        self.n += 1
        c = self.counters
        if item in c:
            c[item] += 1
        elif len(c) < self.k:
            c[item] = 1
        else:
            dead = []
            for it in c:
                c[it] -= 1
                if c[it] == 0:
                    dead.append(it)
            for it in dead:
                del c[it]

    def update_many(self, items) -> None:
        for it in items:
            self.update(it)

    def max_error(self) -> int:
        """Upper bound on true(i) − est(i) for every retained item
        (and on true(i) for every evicted one)."""
        return (self.n - sum(self.counters.values())) // (self.k + 1)

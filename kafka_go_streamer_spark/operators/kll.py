"""KLL-style mergeable rank/quantile sketch (pure-Python core).

The equi-width band sketch (``plans/sketches.py:sketch_quantile_bands``)
answers quantiles from 128 fixed-width counters — constant-size and
map-side combinable, but RANGE-FRAGILE: its band edges derive from the
global min/max, so one outlier collapses the whole histogram's
resolution (VERDICT r8 "wrong" item 2). The production answer is a
RANK-based sketch whose guarantee — |rank(est) − q·n| ≤ ε·n — is
independent of the value range. This module implements the simplified
KLL compactor scheme of Karnin/Lang/Liberty (FOCS'16, public
literature; same family as DataSketches' KLL and Spark's own
``approx_percentile`` Greenwald-Khanna variant):

- items land in a level-0 buffer; when a level holds ≥ k items it is
  sorted and every other item (deterministically-seeded offset) is
  promoted to the next level, where each item counts with DOUBLE the
  weight (weight at level i = 2^i);
- an odd item stays at its level, so TOTAL WEIGHT IS CONSERVED
  EXACTLY: the cumulative weight of the sketch equals the true count n
  and rank queries need no renormalization;
- two sketches merge by level-wise concatenation + the same
  compaction, making the summary associatively combinable — the
  property that lets the Spark plan build per-partition partials with
  ``mapInPandas`` and reduce them in a shuffle tree, identical in
  shape to the HLL/CMS register merges.

The compaction "coin" is an md5 of (level, compaction-sequence): the
sketch is deterministic for a fixed arrival order (reproducible runs)
while behaving like the randomized original across levels, keeping the
classic ~O(1/k · sqrt(log(n/k))) rank error rather than the fully
deterministic alternation's O(log(n/k)/k) worst case.

No reference-engine counterpart: the reference routes opaque messages
and has no aggregation surface at all (SURVEY.md §2.1,
reference main.go:348-651); this is north-star training-pipeline
surface alongside the HLL/CMS/Bloom family.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterable


def _coin(level: int, seq: int) -> int:
    """Deterministic 0/1 offset for the (level, seq)-th compaction."""
    h = hashlib.md5(f"kll:{level}:{seq}".encode()).hexdigest()
    return int(h[:8], 16) & 1


class KLLSketch:
    """Fixed-capacity quantile sketch; ``k`` items per level."""

    def __init__(self, k: int = 256) -> None:
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = k
        self.levels: list[list[float]] = [[]]
        self._ncomp: dict[int, int] = {}

    # ------------------------------------------------------- build
    def update_many(self, values: Iterable[float]) -> None:
        self.levels[0].extend(values)
        self._compress()

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) >= self.k:
                self._compact(i)
            i += 1

    def _compact(self, i: int) -> None:
        buf = sorted(self.levels[i])
        if i + 1 == len(self.levels):
            self.levels.append([])
        seq = self._ncomp.get(i, 0)
        self._ncomp[i] = seq + 1
        off = _coin(i, seq)
        leftover: list[float]
        if len(buf) % 2:
            # keep one item at this level so total weight is conserved;
            # alternate which end stays to avoid a directional bias
            leftover, buf = ([buf[0]], buf[1:]) if off else ([buf[-1]], buf[:-1])
        else:
            leftover = []
        self.levels[i] = leftover
        self.levels[i + 1].extend(buf[off::2])

    # ------------------------------------------------------- merge
    def merge(self, other: "KLLSketch") -> "KLLSketch":
        for lvl, vals in enumerate(other.levels):
            while lvl >= len(self.levels):
                self.levels.append([])
            self.levels[lvl].extend(vals)
        self._compress()
        return self

    # ------------------------------------------------------- query
    def items(self) -> list[tuple[int, float]]:
        """(level, value) pairs; the value's weight is 2**level."""
        return [
            (lvl, v) for lvl, vals in enumerate(self.levels) for v in vals
        ]

    def total_weight(self) -> int:
        return sum(len(vals) << lvl for lvl, vals in enumerate(self.levels))

    def n_retained(self) -> int:
        return sum(len(vals) for vals in self.levels)

    def quantile(self, q: float) -> float:
        """Smallest retained value whose cumulative weight reaches
        ``q * total_weight`` (same selection rule as the Spark plan)."""
        pairs = sorted(
            ((v, 1 << lvl) for lvl, vals in enumerate(self.levels) for v in vals)
        )
        if not pairs:
            raise ValueError("empty sketch")
        target = q * self.total_weight()
        cum = 0
        for v, w in pairs:
            cum += w
            if cum >= target:
                return v
        return pairs[-1][0]

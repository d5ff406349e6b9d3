"""Deterministic weighted pop-order kernel, shared by the Spark scheduler
and the pure-Python reference simulator.

Reproduces QueueSet.pop (/root/reference/ghcrawler/providers/queuing/
queueSet.js:60-76): pick a start queue from the weight-expanded startMap
at a (pseudo-)random index, then scan queues round-robin until one yields;
local scope drains before global (/root/reference/ghcrawler/providers/
queuing/scopedQueueSets.js:51-60).

The reference draws `Math.random()` (queueSet.js:62); fixture parity
requires a pinned deterministic stream, so both engines draw from the same
xorshift64* generator seeded per (POP_RNG_SEED, epoch). The pop order
depends only on per-queue FIFO *counts* (queues pop head-first), so the
whole epoch order is computable from 8 integers — O(batch) driver-side
work independent of row count; rows are then matched back by their
within-queue FIFO rank (a window function in Spark).
"""

from __future__ import annotations

from crawler_spark.config import POP_RNG_SEED, QUEUE_NAMES, SCOPES, START_MAP


class XorShift64Star:
    """Tiny deterministic PRNG (public-domain xorshift64* constants)."""

    def __init__(self, seed: int):
        self.state = (seed or 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF

    def next_u64(self) -> int:
        x = self.state
        x ^= (x >> 12) & 0xFFFFFFFFFFFFFFFF
        x = (x ^ (x << 25)) & 0xFFFFFFFFFFFFFFFF
        x ^= x >> 27
        self.state = x
        return (x * 0x2545F4914F6CDD1D) & 0xFFFFFFFFFFFFFFFF

    def next_index(self, n: int) -> int:
        return self.next_u64() % n


def epoch_rng(epoch: int, seed: int = POP_RNG_SEED) -> XorShift64Star:
    return XorShift64Star((seed << 20) ^ (epoch * 0x9E3779B9) ^ 0xABCDEF)


def pop_schedule(
    counts: dict[tuple[str, str], int],
    budget: int,
    rng: XorShift64Star,
) -> list[tuple[str, str, int]]:
    """Compute the epoch's pop order from per-(scope, queue) FIFO counts.

    Returns [(scope, queue, fifo_rank)] in global pop order, length ≤
    budget. fifo_rank is 0-based within (scope, queue) — the row at that
    rank (ordered by enqueued_seq) is the one popped.
    """
    remaining = {(s, q): counts.get((s, q), 0) for s in SCOPES for q in QUEUE_NAMES}
    popped = {k: 0 for k in remaining}
    order: list[tuple[str, str, int]] = []
    nq = len(QUEUE_NAMES)
    while len(order) < budget:
        # local scope first (scopedQueueSets.js:51-60); one weighted-rotation
        # pop attempt per scope, falling through to global when local is dry.
        chosen: tuple[str, str] | None = None
        for scope in SCOPES:
            if all(remaining[(scope, q)] == 0 for q in QUEUE_NAMES):
                continue
            start = START_MAP[rng.next_index(len(START_MAP))]
            for i in range(nq):
                q = QUEUE_NAMES[(start + i) % nq]
                if remaining[(scope, q)] > 0:
                    chosen = (scope, q)
                    break
            if chosen:
                break
        if not chosen:
            break
        order.append((chosen[0], chosen[1], popped[chosen]))
        popped[chosen] += 1
        remaining[chosen] -= 1
    return order

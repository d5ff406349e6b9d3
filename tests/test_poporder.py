"""Pop-order kernel unit tests — mirror the reference's queue-semantics
tests (/root/reference/test/unit/ghcrawler/queueSetTests.js and
scopedQueueSetsTests.js scenarios), re-expressed for the batch kernel.
"""

from __future__ import annotations

from collections import Counter

from crawler_spark.config import QUEUE_NAMES, QUEUE_WEIGHTS, START_MAP
from crawler_spark.poporder import XorShift64Star, epoch_rng, pop_schedule


def test_startmap_weight_expansion():
    # queueSetTests.js:17-36 — one slot per weight unit, in queue order
    assert len(START_MAP) == sum(QUEUE_WEIGHTS.values()) == 10
    slot_counts = Counter(START_MAP)
    for i, name in enumerate(QUEUE_NAMES):
        assert slot_counts[i] == QUEUE_WEIGHTS[name]
    # slots for a queue are contiguous (queueSet.js:86-98 startMap loop)
    assert list(START_MAP) == sorted(START_MAP)


def test_pop_falls_through_to_next_nonempty():
    # queueSetTests.js:38-54 — chosen queue empty → scan round-robin
    counts = {("global", "later"): 3}  # only the last queue has items
    order = pop_schedule(counts, 10, epoch_rng(0))
    assert [(s, q) for s, q, _ in order] == [("global", "later")] * 3
    assert [r for _, _, r in order] == [0, 1, 2]  # FIFO ranks in order


def test_local_scope_drains_before_global():
    # scopedQueueSets.js:51-60 — local first even if global has higher priority
    counts = {("local", "later"): 2, ("global", "immediate"): 2}
    order = pop_schedule(counts, 10, epoch_rng(1))
    assert [(s, q) for s, q, _ in order[:2]] == [("local", "later")] * 2
    assert [(s, q) for s, q, _ in order[2:]] == [("global", "immediate")] * 2


def test_budget_caps_pops():
    counts = {("global", "normal"): 100}
    order = pop_schedule(counts, 7, epoch_rng(2))
    assert len(order) == 7


def test_deterministic_for_same_seed_epoch():
    counts = {("global", q): 5 for q in QUEUE_NAMES}
    a = pop_schedule(counts, 15, epoch_rng(3, seed=42))
    b = pop_schedule(counts, 15, epoch_rng(3, seed=42))
    c = pop_schedule(counts, 15, epoch_rng(4, seed=42))
    assert a == b
    assert a != c  # different epoch → different rotation draw sequence


def test_weighted_rotation_prefers_heavier_queues():
    # with all queues non-empty, start-slot frequency tracks weights 3:2:3:2
    counts = {("global", q): 10_000 for q in QUEUE_NAMES}
    order = pop_schedule(counts, 4000, epoch_rng(5))
    freq = Counter(q for _, q, _ in order)
    assert freq["immediate"] > freq["soon"]
    assert freq["normal"] > freq["later"]
    # every queue gets service (no starvation — queueSet.js round-robin scan)
    assert set(freq) == set(QUEUE_NAMES)


def test_fifo_within_queue():
    counts = {("global", "normal"): 50, ("global", "soon"): 50}
    order = pop_schedule(counts, 100, epoch_rng(6))
    for qname in ("normal", "soon"):
        ranks = [r for _, q, r in order if q == qname]
        assert ranks == list(range(len(ranks)))  # strictly FIFO per queue


def test_xorshift_is_stable():
    # pin the PRNG stream: parity with the simulator depends on it
    rng = XorShift64Star(42)
    vals = [rng.next_u64() for _ in range(3)]
    rng2 = XorShift64Star(42)
    assert vals == [rng2.next_u64() for _ in range(3)]
    assert all(0 <= v < 2**64 for v in vals)

"""Property-based tests (hypothesis) for the pure kernels: coordinate
algebra roundtrips, semver ordering, pop-order conservation. These run
entirely driver-side (no Spark) — the Spark implementations are parity-
tested against these same kernels elsewhere.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_spark.config import QUEUE_NAMES, SCOPES
from crawler_spark.poporder import epoch_rng, pop_schedule
from crawler_spark.simulator import (
    canonicalize_py,
    coord_url,
    coord_urn,
    is_prerelease_py,
    latest_version_py,
    semver_key_py,
)

SEGMENT = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), whitelist_characters=".-_"),
    min_size=1, max_size=12,
).filter(lambda s: s not in ("", "-") and "/" not in s)


@given(typ=SEGMENT, prov=SEGMENT, ns=st.one_of(st.none(), SEGMENT), name=SEGMENT,
       rev=st.one_of(st.none(), SEGMENT))
@settings(max_examples=200, deadline=None)
def test_coordinate_roundtrip_is_fixed_point(typ, prov, ns, name, rev):
    # parse(render(c)) == canonicalize(c) and is idempotent (entitySpec.js:45-75)
    c = {"type": typ.lower(), "provider": prov.lower(), "namespace": ns, "name": name,
         "revision": rev, "tool": None, "tool_version": None}
    url = coord_url(c)
    parsed = canonicalize_py(url)
    assert parsed is not None
    for k in ("type", "provider", "namespace", "name", "revision"):
        assert parsed[k] == c[k], (k, url)
    assert parsed["canonical_url"] == url
    # reparse of the canonical form is a fixed point
    assert canonicalize_py(parsed["canonical_url"]) == parsed


@given(typ=SEGMENT, prov=SEGMENT, name=SEGMENT, rev=SEGMENT)
@settings(max_examples=100, deadline=None)
def test_urn_contains_every_segment(typ, prov, name, rev):
    c = {"type": typ.lower(), "provider": prov.lower(), "namespace": None, "name": name,
         "revision": rev, "tool": None, "tool_version": None}
    urn = coord_urn(c)
    assert urn.startswith("urn:") and f":revision:{rev}" in urn


SEMVER = st.tuples(
    st.integers(0, 999), st.integers(0, 999), st.integers(0, 999),
    st.one_of(st.none(), st.sampled_from(["alpha", "beta.1", "rc.2"])),
).map(lambda t: f"{t[0]}.{t[1]}.{t[2]}" + (f"-{t[3]}" if t[3] else ""))


@given(versions=st.lists(SEMVER, min_size=1, max_size=20))
@settings(max_examples=200, deadline=None)
def test_latest_version_properties(versions):
    """Mirrors the seeded reduce (baseHandler.js:95): the result is the
    cmp-key argmax over {versions[0]} ∪ stable, earliest of equals."""
    from crawler_spark.simulator import _semver_cmp_key_py

    latest = latest_version_py(versions)
    assert latest in versions
    stable = [v for v in versions if not is_prerelease_py(v)]
    pool = [versions[0]] + stable
    assert _semver_cmp_key_py(latest) == max(_semver_cmp_key_py(v) for v in pool)
    assert latest == versions[0] or latest in stable
    if not stable:
        assert latest == versions[0]


@given(a=SEMVER, b=SEMVER)
@settings(max_examples=200, deadline=None)
def test_semver_key_is_order_homomorphic(a, b):
    ta = tuple(int(x) for x in a.split("-")[0].split("."))
    tb = tuple(int(x) for x in b.split("-")[0].split("."))
    ka, kb = semver_key_py(a), semver_key_py(b)
    if ta < tb:
        assert ka < kb
    elif ta > tb:
        assert ka > kb
    else:
        assert ka == kb  # prerelease tags don't perturb the numeric key


@given(
    counts=st.dictionaries(
        st.tuples(st.sampled_from(SCOPES), st.sampled_from(QUEUE_NAMES)),
        st.integers(0, 30), max_size=8,
    ),
    budget=st.integers(0, 100),
    epoch=st.integers(0, 50),
)
@settings(max_examples=200, deadline=None)
def test_pop_schedule_conservation(counts, budget, epoch):
    order = pop_schedule(dict(counts), budget, epoch_rng(epoch))
    total = sum(counts.values())
    assert len(order) == min(budget, total)  # drains exactly min(budget, available)
    # FIFO ranks are dense per (scope, queue) and never exceed that queue's count
    from collections import defaultdict

    ranks = defaultdict(list)
    for s, q, r in order:
        ranks[(s, q)].append(r)
    for key, rs in ranks.items():
        assert rs == list(range(len(rs)))
        assert len(rs) <= counts.get(key, 0)
    # local scope fully precedes global only when local is nonempty at each draw:
    # weaker invariant — a global pop never happens while the SAME queue set
    # still had local rows at that point; verify via replay bookkeeping
    remaining = {k: counts.get(k, 0) for k in [(s, q) for s in SCOPES for q in QUEUE_NAMES]}
    for s, q, _ in order:
        if s == "global":
            assert all(remaining[("local", qq)] == 0 for qq in QUEUE_NAMES)
        remaining[(s, q)] -= 1


# -- round 2 kernels ----------------------------------------------------------

from crawler_spark.data.top_seeds import ALIGN_INITIAL, PAGE_SIZES, page_window
from crawler_spark.operators.discovery import discover_source_py, tag_patterns_py
from crawler_spark.simulator import CrawlSimulator


@given(kind=st.sampled_from(sorted(PAGE_SIZES)),
       start=st.integers(-50, 5000), end=st.integers(-50, 6000))
@settings(max_examples=300, deadline=None)
def test_page_window_invariants(kind, start, end):
    lo, hi = page_window(kind, start, end)
    ps = PAGE_SIZES[kind]
    s = max(start or 0, 0) if start and start >= 0 else 0
    e = end if end and end - s > 0 else s + 1000
    assert (hi - lo) % ps == 0 and hi > lo          # whole pages, ≥1 page
    assert lo <= s < lo + ps if ALIGN_INITIAL[kind] else lo == s
    assert hi >= e                                   # requested window covered
    assert hi - ps < e                               # no page beyond the loop bound


@given(version=st.from_regex(r"[0-9]{1,3}\.[0-9]{1,2}\.[0-9]{1,2}", fullmatch=True),
       n_cands=st.integers(0, 5), data=st.data())
@settings(max_examples=150, deadline=None)
def test_discovery_first_resolving_candidate_wins(version, n_cands, data):
    repos = [f"r{i}" for i in range(4)]
    cands = [
        data.draw(st.sampled_from(
            [f"https://github.com/o/{r}" for r in repos]
            + ["https://gitlab.com/o/x", "not a url", ""]
        ))
        for _ in range(n_cands)
    ]
    tagged = set(data.draw(st.sets(st.sampled_from(repos), max_size=4)))
    tags_by_repo = {
        ("o", r): {data.draw(st.sampled_from(tag_patterns_py(version))): f"sha-{r}"}
        for r in tagged
    }
    got = discover_source_py(version, cands, tags_by_repo)
    resolvable = [
        u.rsplit("/", 1)[1] for u in cands
        if u.startswith("https://github.com/") and u.rsplit("/", 1)[1] in tagged
    ]
    if not resolvable:
        assert got is None
    else:
        assert got is not None and got["source_name"] == resolvable[0]
        assert got["source_revision"] == f"sha-{resolvable[0]}"


@given(kind=st.sampled_from(["always", "match", "version", "matchOrVersion", 3]),
       origin=st.sampled_from(["origin", "cache", "storage"]),
       stored_version=st.one_of(st.none(), st.integers(0, 5)),
       processed_at=st.one_of(st.none(), st.integers(0, 30)),
       cur_version=st.integers(0, 5), epoch=st.integers(0, 40))
@settings(max_examples=400, deadline=None)
def test_should_process_matrix_invariants(kind, origin, stored_version, processed_at,
                                          cur_version, epoch):
    sim = CrawlSimulator([])
    stored = None if origin != "storage" else {
        "version": stored_version, "processed_at": processed_at,
    }
    sp = sim._should_process(kind, origin, stored, cur_version, epoch)
    if kind == "always" or origin != "storage":
        # non-storage content always processes under every freshness kind
        assert sp
    elif kind == "match":
        assert not sp
    elif kind in ("version", "matchOrVersion"):
        assert sp == (stored_version is None or stored_version < cur_version)
    else:  # N epochs
        assert sp == (processed_at is None or (epoch - processed_at) > kind)
    # monotonicity: bumping the processor version never flips process→skip
    if kind in ("version", "matchOrVersion") and sp:
        assert sim._should_process(kind, origin, stored, cur_version + 1, epoch)


# ---------------------------------------------------------------------------
# extract_date vs luxon semantics (lib/utils.js:70-97): RFC-2822 offset
# handling, the weekday-strip (no-validation) rule, and the exact
# [1950-01-01, now+30d] window boundary. Pure driver-side fuzz of the
# python twin; the Spark chain is held to the same examples in
# tests/test_toolout.py::test_extract_date_rfc2822_offset_fuzz_parity.
# ---------------------------------------------------------------------------

import datetime as _dt

from crawler_spark.functions.dates import extract_date_py

_NOW = _dt.datetime(2026, 1, 1)
_WINDOW_END = _NOW + _dt.timedelta(days=30)
_MONTHS = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
           "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]

# any 3-letter token: luxon's fromRFC2822 (like email.utils) does NOT
# validate the weekday against the date — 'Xyz, 01 Nov 2011 ...' parses
_DOW = st.text(alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ",
               min_size=3, max_size=3)
# RFC-2822 numeric zone: ±HHMM, HH ≤ 14, MM ∈ {00,15,30,45}
_OFFSET_MIN = st.integers(-14 * 4, 14 * 4).map(lambda q: q * 15)


def _rfc2822(instant_local: "_dt.datetime", dow: str, off_min: int, pad_day: bool) -> str:
    sign = "+" if off_min >= 0 else "-"
    hh, mm = divmod(abs(off_min), 60)
    day = f"{instant_local.day:02d}" if pad_day else str(instant_local.day)
    return (f"{dow}, {day} {_MONTHS[instant_local.month - 1]} {instant_local.year} "
            f"{instant_local:%H:%M:%S} {sign}{hh:02d}{mm:02d}")


@given(instant=st.datetimes(min_value=_dt.datetime(1948, 1, 2),
                            max_value=_dt.datetime(2027, 6, 1)),
       dow=_DOW, off_min=_OFFSET_MIN, pad_day=st.booleans())
@settings(max_examples=400, deadline=None)
def test_extract_date_rfc2822_offset_normalizes_to_utc(instant, dow, off_min, pad_day):
    """The rendered wall-clock time is LOCAL to the offset; extractDate
    returns the UTC instant (luxon normalizes the same way), windowed on
    the UTC value — and the weekday token is never validated."""
    instant = instant.replace(microsecond=0)
    utc = instant - _dt.timedelta(minutes=off_min)
    got = extract_date_py(_rfc2822(instant, dow, off_min, pad_day), _NOW)
    if _dt.datetime(1950, 1, 1) < utc <= _WINDOW_END:
        assert got == utc
    else:
        assert got is None


@given(off_min=_OFFSET_MIN, dow=_DOW, delta_s=st.integers(-2, 2))
@settings(max_examples=200, deadline=None)
def test_extract_date_window_boundaries_are_inclusive(off_min, dow, delta_s):
    """utils.js:93-96 via zero-length luxon Interval: isBefore(validStart)
    is `end <= validStart` (half-open), so the START boundary instant is
    REJECTED; isAfter(validEnd) is `start > validEnd`, so the END
    boundary instant is kept. Holds for every offset rendering of the
    same instant."""
    for boundary, inside, keep_boundary in (
        (_dt.datetime(1950, 1, 1), 1, False),
        (_WINDOW_END, -1, True),
    ):
        utc = boundary + _dt.timedelta(seconds=delta_s)
        local = utc + _dt.timedelta(minutes=off_min)
        got = extract_date_py(_rfc2822(local, dow, off_min, True), _NOW)
        kept = delta_s * inside > 0 or (delta_s == 0 and keep_boundary)
        if kept:
            assert got == utc, (boundary, delta_s, off_min)
        else:
            assert got is None, (boundary, delta_s, off_min)


# --- K2 span-array chunking (storage/chunking.py py-mirror) ------------------

from crawler_spark.storage.chunking import chunk_spans_py, span_bytes_py

_SPAN = st.builds(
    dict,
    kind=st.sampled_from(["text", "media"]),
    text=st.one_of(st.none(), st.text(max_size=40)),
    media_ref=st.one_of(st.none(), st.text(alphabet="0123456789abcdef", max_size=16)),
)


@given(
    spans=st.lists(_SPAN, max_size=60),
    max_bytes=st.integers(1, 2000),
    block_bytes=st.integers(1, 2000),
)
@settings(max_examples=300, deadline=None)
def test_chunking_mirror_invariants(spans, max_bytes, block_bytes):
    """storageDocStore.js:46-58 split rules, for every (threshold, block):
    concatenating chunks in order reproduces the span sequence exactly;
    small docs stay atomic; every chunk of a split doc is non-empty and
    all its spans START in the same block-sized byte window."""
    chunks = chunk_spans_py(spans, max_bytes=max_bytes, block_bytes=block_bytes)
    assert [s for c in chunks for s in c] == spans
    if sum(span_bytes_py(s) for s in spans) <= max_bytes:
        assert chunks == [spans]
    else:
        assert all(chunks)
        starts, acc = {}, 0
        for i, s in enumerate(spans):
            starts[i] = acc
            acc += span_bytes_py(s)
        flat_idx = iter(range(len(spans)))
        for c in chunks:
            first = starts[next(flat_idx)]
            blk = first // block_bytes
            for s in c[1:]:
                assert starts[next(flat_idx)] // block_bytes == blk

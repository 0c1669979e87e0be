"""The rotation-bump tool must produce exactly the edit the round
checklist performs by hand (registry.py round bookkeeping), without
ever writing an unparseable or invariant-breaking file. Pure text
tests — no Spark."""

from __future__ import annotations

import ast
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from rotate_window import assign_text, bump_text, pin_text  # noqa: E402

from trendmachine_spark.registry import _DEMOTED, _ROUND  # noqa: E402

SRC = (Path(__file__).resolve().parent.parent
       / "trendmachine_spark" / "registry.py").read_text()


def _names(block: str) -> list[str]:
    return re.findall(r'"([^"]+)"', block)


def test_bump_rewrites_all_three_blocks():
    out = bump_text(SRC, list(_DEMOTED))
    ast.parse(out)  # never emit unparseable python
    assert f"_ROUND = {_ROUND + 1}" in out
    assert f"_ROUND = {_ROUND}\n" not in out
    pinned = re.search(r"^_WINDOW_PINNED[^\n]*= \[\]", out, re.M)
    assert pinned, "bump must empty the pins"
    prev = re.search(r"^_PREV_DEMOTED = \[\n(.*?)^\]$", out, re.M | re.S)
    # the new _PREV_DEMOTED literal is exactly the outgoing _DEMOTED
    assert sorted(_names(prev.group(1))) == sorted(_DEMOTED)


def test_bump_then_pin_restores_a_pin_block():
    out = pin_text(bump_text(SRC, list(_DEMOTED)), "daily_rollup", "why")
    ast.parse(out)
    pinned = re.search(r"^_WINDOW_PINNED[^\n]*= \[\n(.*?)^\]$", out, re.M | re.S)
    assert _names(pinned.group(1)) == ["daily_rollup"]
    assert "# why" in pinned.group(1)
    # idempotent
    assert pin_text(out, "daily_rollup", "why") == out


def test_pin_on_current_file_is_append_and_idempotent():
    out = pin_text(SRC, "daily_rollup", "")
    ast.parse(out)
    pinned = re.search(r"^_WINDOW_PINNED[^\n]*= \[\n(.*?)^\]$", out, re.M | re.S)
    assert _names(pinned.group(1))[-1] == "daily_rollup"
    assert pin_text(out, "daily_rollup", "") == out


def test_pin_validates_against_real_registry_keys():
    """`pin` must resolve names against the imported QUERIES dict, not
    a substring grep of registry.py — a quoted SQL fragment or column
    name must NOT pass as a registered query (round-6 ADVICE)."""
    from rotate_window import _registered_names

    from trendmachine_spark.registry import QUERIES

    names = _registered_names()
    assert "daily_rollup" in names and set(names) == set(QUERIES)
    # quoted literals that appear in registry.py source but are not
    # query names must be rejected by the membership check
    for impostor in ("l_returnflag", "content_md5", "SELECT"):
        assert impostor not in names


def test_assign_targets_smallest_class_and_rejects_dupes():
    out = assign_text(SRC, "brand_new_query")
    ast.parse(out)
    period = int(re.search(r"^_PARITY_PERIOD = (\d+)$", SRC, re.M).group(1))
    labels = ["_DEMOTE_EVEN", "_DEMOTE_ODD"]
    if period >= 3:
        labels.append("_DEMOTE_THIRD")
    if period >= 4:
        labels.append("_DEMOTE_FOURTH")
    sizes = {}
    for label in labels:
        m = re.search(label + r"(?::[^\n=]+)? = frozenset\((?:\)|\{\n.*?^\}\))",
                      SRC, re.M | re.S)
        sizes[label] = len(_names(m.group(0)))
    # min() ties break by the first label in the tool's order
    smallest = min(sizes, key=lambda k: sizes[k])
    block = re.search(
        smallest + r"(?::[^\n=]+)? = frozenset\((?:\)|\{\n.*?^\}\))",
        out, re.M | re.S).group(0)
    assert "brand_new_query" in _names(block)
    # a name that already has a class is refused
    assigned = _names(re.search(
        r"_DEMOTE_EVEN = frozenset\(\{\n(.*?)^\}\)", SRC,
        re.M | re.S).group(1))
    try:
        assign_text(SRC, sorted(assigned)[0])
    except SystemExit:
        pass
    else:
        raise AssertionError("assign must refuse an already-assigned name")


# ---------------------------------------------------------------------------
# Period-3 rotation (r9 mandate: build the machinery BEFORE the 101st
# oracled query needs it). The registry stays at period 2 until
# `set-period 3` flips it; these tests drive both the tool rewrites and
# the registry schedule logic at period 3.
# ---------------------------------------------------------------------------

import pytest  # noqa: E402

FAKE_REGISTRY = '''\
_ROUND = 9
_PARITY_PERIOD = 2
_WINDOW_PINNED: list[str] = []  # round 9: nothing changed yet
_DEMOTE_EVEN = frozenset({
    "q_even1",
})
_DEMOTE_ODD = frozenset({
    "q_odd1",
    "q_odd2",
})
_DEMOTE_THIRD: frozenset = frozenset()
_PREV_DEMOTED = [
    "q_even1",
]
_PREV_DEMOTED_2: list[str] = []
'''


def test_set_period_flips_literal_only():
    from rotate_window import set_period_text

    out = set_period_text(FAKE_REGISTRY, 3)
    ast.parse(out)
    assert "_PARITY_PERIOD = 3" in out
    # everything else byte-identical
    assert out.replace("_PARITY_PERIOD = 3", "_PARITY_PERIOD = 2") == FAKE_REGISTRY
    with pytest.raises(SystemExit):
        set_period_text(FAKE_REGISTRY, 5)


def test_assign_period3_balances_into_third_class():
    from rotate_window import assign_text, set_period_text

    p3 = set_period_text(FAKE_REGISTRY, 3)
    out = assign_text(p3, "q_new")
    ast.parse(out)
    third = re.search(r"_DEMOTE_THIRD[^\n]* = frozenset\(\{\n(.*?)^\}\)",
                      out, re.M | re.S)
    assert third and "q_new" in _names(third.group(1))
    # next assign goes to EVEN (1 name) not THIRD (now 1) or ODD (2) —
    # min() ties break by first label, EVEN
    out2 = assign_text(out, "q_new2")
    even = re.search(r"_DEMOTE_EVEN = frozenset\(\{\n(.*?)^\}\)",
                     out2, re.M | re.S)
    assert "q_new2" in _names(even.group(1))
    # a name already in THIRD is refused
    with pytest.raises(SystemExit):
        assign_text(out, "q_new")


def test_assign_period2_ignores_but_guards_third_class():
    from rotate_window import assign_text, set_period_text

    # under period 2, assignment targets EVEN (smaller), never THIRD
    out = assign_text(FAKE_REGISTRY, "q_new")
    even = re.search(r"_DEMOTE_EVEN = frozenset\(\{\n(.*?)^\}\)",
                     out, re.M | re.S)
    assert "q_new" in _names(even.group(1))
    assert "_DEMOTE_THIRD: frozenset = frozenset()" in out
    # but a name that somehow sits in THIRD is still refused (dupes
    # across ANY class are illegal)
    p3 = assign_text(set_period_text(FAKE_REGISTRY, 3), "q_stale")
    p2 = set_period_text(p3, 2)
    with pytest.raises(SystemExit):
        assign_text(p2, "q_stale")


def test_bump_period3_cascades_prev_literals():
    from rotate_window import bump_text, set_period_text

    p3 = set_period_text(FAKE_REGISTRY, 3)
    out = bump_text(p3, ["q_odd1", "q_odd2"])
    ast.parse(out)
    assert "_ROUND = 10" in out
    prev = re.search(r"^_PREV_DEMOTED = \[\n(.*?)^\]$", out, re.M | re.S)
    assert sorted(_names(prev.group(1))) == ["q_odd1", "q_odd2"]
    prev2 = re.search(r"^_PREV_DEMOTED_2[^\n]*= \[\n(.*?)^\]$", out,
                      re.M | re.S)
    assert prev2 and _names(prev2.group(1)) == ["q_even1"]
    # a second bump cascades again
    out2 = bump_text(out, ["q_even1", "q_third1"])
    prev2b = re.search(r"^_PREV_DEMOTED_2[^\n]*= \[\n(.*?)^\]$", out2,
                       re.M | re.S)
    assert sorted(_names(prev2b.group(1))) == ["q_odd1", "q_odd2"]


def test_bump_period2_leaves_prev2_untouched():
    from rotate_window import bump_text

    out = bump_text(FAKE_REGISTRY, ["q_odd1"])
    assert "_PREV_DEMOTED_2: list[str] = []" in out


def test_registry_schedule_under_period3(monkeypatch):
    """The registry's own schedule logic at period 3: each pool name is
    driver-checked EXACTLY once per 3-round cycle, no name demoted a
    full cycle, dupes across classes rejected, and the import-time
    look-ahead models both future rounds."""
    import trendmachine_spark.registry as reg

    pool = reg._rotation_pool()
    a, b, c = pool[0::3], pool[1::3], pool[2::3]
    monkeypatch.setattr(reg, "_PARITY_PERIOD", 3)
    monkeypatch.setattr(reg, "_DEMOTE_ODD", frozenset(a))    # class 0
    monkeypatch.setattr(reg, "_DEMOTE_EVEN", frozenset(b))   # class 1
    monkeypatch.setattr(reg, "_DEMOTE_THIRD", frozenset(c))  # class 2
    cycle = [set(reg._demoted_for_round(r)) for r in (9, 10, 11)]
    assert not set.intersection(*cycle)
    for n in pool:
        assert sum(1 for d in cycle if n not in d) == 1
    # class k is in the window exactly when round % 3 == k
    assert not set(a) & set(reg._demoted_for_round(9))   # 9 % 3 == 0
    assert set(a) <= set(reg._demoted_for_round(10))
    assert not set(c) & set(reg._demoted_for_round(11))  # 11 % 3 == 2
    # a name in two classes is loudly rejected
    monkeypatch.setattr(reg, "_DEMOTE_THIRD", frozenset(c) | {a[0]})
    with pytest.raises(AssertionError, match="more than one"):
        reg._demoted_for_round(9)


# ---------------------------------------------------------------------------
# Rebalance (r10 mandate: the r9 flip left classes at 50/50/1 so the
# r10 window had ZERO pin slots — `rebalance` moves names between
# classes under the cover invariant instead of a hand edit).
# ---------------------------------------------------------------------------

FAKE_P3 = '''\
_ROUND = 10
_PARITY_PERIOD = 3
_WINDOW_PINNED: list[str] = []  # round 10: nothing changed yet
_DEMOTE_EVEN = frozenset({
    "e1", "e2", "e3", "e4",
})
_DEMOTE_ODD = frozenset({
    "o1", "o2", "o3", "o4",
})
_DEMOTE_THIRD: frozenset = frozenset({
    "t1",
})
_PREV_DEMOTED = [
    "e1", "e2", "e3", "e4", "t1",
]
_PREV_DEMOTED_2: list[str] = [
    "o1", "o2", "o3", "o4",
]
'''
# History encoded above: round 10 checks class 1 (the "e" names, last
# checked r8 — demoted r9 but not r8); class-0 "o" names were checked
# r9 (demoted r8, not r9); "t1" was checked r8, due r11.


def _classes(out: str) -> dict[str, list[str]]:
    sets = {}
    for label in ("_DEMOTE_EVEN", "_DEMOTE_ODD", "_DEMOTE_THIRD"):
        m = re.search(label + r"(?::[^\n=]+)? = frozenset\((?:\)|\{\n.*?^\}\))",
                      out, re.M | re.S)
        sets[label] = _names(m.group(0))
    return sets


def test_rebalance_balances_without_breaking_cover():
    from rotate_window import rebalance_text

    out = rebalance_text(FAKE_P3)
    ast.parse(out)
    sets = _classes(out)
    sizes = sorted(len(v) for v in sets.values())
    assert sizes == [3, 3, 3]
    # pool membership preserved, no dupes
    union = sum(sets.values(), [])
    assert sorted(union) == sorted(
        ["e1", "e2", "e3", "e4", "o1", "o2", "o3", "o4", "t1"])
    # cover invariant: an "e" name (last checked r8) may move only to
    # class 2 (next check r11, gap 3) — never to class 0 (r12, gap 4)
    moved_e = [n for n in sets["_DEMOTE_ODD"] if n.startswith("e")]
    assert not moved_e, f"illegal e->class0 move (gap 4): {moved_e}"


def test_rebalance_respects_exclude_and_refuses_impossible_targets():
    from rotate_window import rebalance_text

    out = rebalance_text(FAKE_P3, exclude=frozenset({"e1", "e2"}))
    sets = _classes(out)
    assert "e1" in sets["_DEMOTE_EVEN"] and "e2" in sets["_DEMOTE_EVEN"]
    # force MORE moves out of class 1 than the non-excluded names allow
    with pytest.raises(SystemExit, match="no legal move|targets"):
        rebalance_text(FAKE_P3, targets={0: 0, 1: 0, 2: 9},
                       exclude=frozenset({"e1", "e2"}))
    # targets must sum to the pool
    with pytest.raises(SystemExit, match="sum to the pool"):
        rebalance_text(FAKE_P3, targets={0: 1, 1: 1, 2: 1})


def test_rebalance_never_stretches_a_twice_demoted_name():
    """A name demoted BOTH previous rounds (last checked a full period
    ago) is at its gap limit: any move that delays its next check past
    this round is illegal. With t1 due r11 moving to class 0 (r12)
    it must be refused even when targets demand it."""
    from rotate_window import rebalance_text

    src = FAKE_P3.replace('_PREV_DEMOTED_2: list[str] = [\n    "o1", "o2", "o3", "o4",\n]',
                          '_PREV_DEMOTED_2: list[str] = [\n    "o1", "o2", "o3", "o4", "t1",\n]')
    # t1 now last checked r7 (demoted r8 AND r9): moving it anywhere
    # (class 0 -> r12 gap 5, class 1 -> r10 gap 3 OK) — ask for a
    # rebalance that can only be satisfied by t1 -> class 0 and expect
    # a refusal; t1 -> class 1 (checked THIS round, gap 3) is legal.
    out = rebalance_text(src, targets={0: 4, 1: 5, 2: 0})
    sets = _classes(out)
    assert "t1" in sets["_DEMOTE_EVEN"]  # class 1: checked r10, gap 3
    with pytest.raises(SystemExit, match="no legal move"):
        rebalance_text(src, targets={0: 5, 1: 4, 2: 0},
                       exclude=frozenset({"o1", "o2", "o3", "o4"}))


def test_current_registry_has_pin_headroom():
    """The r9 verdict failure mode: a checked class at exactly 50
    leaves zero pin slots and any changed query overflows the window
    mid-round. Guard structurally, pool-aware (r12 — the pool outgrew
    the historical fixed 40): every class must be optimally BALANCED
    (<= ceil(pool / period) — rebalance can always achieve that) AND
    leave >= 6 pin slots of the driver's 50-entry window.

    Exception (r13): in the round a period flip happens
    (_PERIOD_FLIPPED_AT == _ROUND) the outgoing classes are
    necessarily over the new balanced size — the cover invariant
    blocks moving a name whose next check would stretch its gap past
    the period, and the flip round's checked class additionally
    carries the OLD period's schedule promise (its due names must be
    checked THIS round, so they may not move at all). The balance
    assertion is deferred exactly one round; the >= 6 pin-slot bound
    never is. The next bump re-arms balance enforcement, forcing the
    finishing `rebalance` the tool docstring prescribes."""
    import math

    import trendmachine_spark.registry as reg

    classes = reg._parity_classes()
    pool = sum(len(v) for v in classes.values())
    optimal = math.ceil(pool / len(classes))
    in_flip_grace = reg._ROUND == reg._PERIOD_FLIPPED_AT
    for cls, names in classes.items():
        if not in_flip_grace:
            assert len(names) <= optimal, (
                f"class {cls} holds {len(names)} names (> balanced "
                f"{optimal}) — run `rotate_window.py rebalance`")
        assert len(names) <= 44, (
            f"class {cls} holds {len(names)} names — a round checking it "
            "has <6 pin slots; the pool has outgrown the current period "
            f"({reg._PARITY_PERIOD}): `rotate_window.py set-period "
            f"{reg._PARITY_PERIOD + 1}` (extend the machinery if needed)")


# ---------------------------------------------------------------------------
# Period-4 rotation (r13 mandate: the pool hit 123 oracled names at
# 41/41/41 — one round of period-3 headroom left — so the machinery
# must exist BEFORE the import-time assert fires mid-round). Same
# drill as the r9 period-3 build-out: drive the tool rewrites and the
# registry schedule logic at period 4 against fixtures.
# ---------------------------------------------------------------------------

# Round 13, period 4, just flipped from period 3. History encoded:
# r12 checked class 0 (so "e"+"t" were demoted r12 -> _PREV_DEMOTED),
# r11 checked class 2 ("e"+"o" demoted -> _PREV_DEMOTED_2), r10
# checked class 1 ("o"+"t" demoted -> _PREV_DEMOTED_3). Derived last
# checks: e r10, t r11, o r12. Class 3 is the new, empty fourth class.
FAKE_P4 = '''\
_ROUND = 13
_PARITY_PERIOD = 4
_PERIOD_FLIPPED_AT = 13
_WINDOW_PINNED: list[str] = []  # round 13: nothing changed yet
_DEMOTE_EVEN = frozenset({
    "e1", "e2", "e3",
})
_DEMOTE_ODD = frozenset({
    "o1", "o2", "o3",
})
_DEMOTE_THIRD: frozenset = frozenset({
    "t1", "t2", "t3",
})
_DEMOTE_FOURTH: frozenset = frozenset()
_PREV_DEMOTED = [
    "e1", "e2", "e3", "t1", "t2", "t3",
]
_PREV_DEMOTED_2: list[str] = [
    "e1", "e2", "e3", "o1", "o2", "o3",
]
_PREV_DEMOTED_3: list[str] = [
    "o1", "o2", "o3", "t1", "t2", "t3",
]
'''


def test_set_period_4_flips_literal_and_stamps_flip_round():
    from rotate_window import set_period_text

    out = set_period_text(FAKE_P4.replace("_PARITY_PERIOD = 4",
                                          "_PARITY_PERIOD = 3"), 4)
    ast.parse(out)
    assert "_PARITY_PERIOD = 4" in out
    assert "_PERIOD_FLIPPED_AT = 13" in out
    # period 5 does not exist
    with pytest.raises(SystemExit):
        set_period_text(FAKE_P4, 5)
    # a fixture without the flip-round literal is still rewritable
    # (set_period only stamps it when present)
    out2 = set_period_text(FAKE_REGISTRY, 3)
    assert "_PERIOD_FLIPPED_AT" not in out2


def test_assign_period4_targets_fourth_class():
    from rotate_window import assign_text

    out = assign_text(FAKE_P4, "q_new")
    ast.parse(out)
    fourth = re.search(r"_DEMOTE_FOURTH[^\n]* = frozenset\(\{\n(.*?)^\}\)",
                       out, re.M | re.S)
    assert fourth and "q_new" in _names(fourth.group(1))
    # a name already in FOURTH is refused on re-assign
    with pytest.raises(SystemExit):
        assign_text(out, "q_new")
    # ... and names in the legacy classes stay refused too
    with pytest.raises(SystemExit):
        assign_text(FAKE_P4, "e1")


def test_bump_period4_cascades_three_prev_literals():
    from rotate_window import bump_text

    out = bump_text(FAKE_P4, ["o1", "o2", "o3", "t1", "t2", "t3"])
    ast.parse(out)
    assert "_ROUND = 14" in out
    prev = _names(re.search(r"^_PREV_DEMOTED = \[\n(.*?)^\]$", out,
                            re.M | re.S).group(1))
    assert sorted(prev) == ["o1", "o2", "o3", "t1", "t2", "t3"]
    prev2 = _names(re.search(r"^_PREV_DEMOTED_2[^\n]*= \[\n(.*?)^\]$", out,
                             re.M | re.S).group(1))
    assert sorted(prev2) == ["e1", "e2", "e3", "t1", "t2", "t3"]
    prev3 = _names(re.search(r"^_PREV_DEMOTED_3[^\n]*= \[\n(.*?)^\]$", out,
                             re.M | re.S).group(1))
    assert sorted(prev3) == ["e1", "e2", "e3", "o1", "o2", "o3"]


def test_bump_period3_with_prev3_literal_keeps_history_live():
    """Under period 3 a _PREV_DEMOTED_3 literal (added r13 ahead of the
    period-4 flip) must cascade too — that third round of live history
    is what makes a later flip lossless for the gap derivation."""
    from rotate_window import bump_text

    src = FAKE_REGISTRY.replace(
        "_PARITY_PERIOD = 2", "_PARITY_PERIOD = 3").replace(
        "_PREV_DEMOTED_2: list[str] = []",
        '_PREV_DEMOTED_2: list[str] = [\n    "q_old",\n]\n'
        "_PREV_DEMOTED_3: list[str] = []")
    out = bump_text(src, ["q_odd1"])
    prev3 = re.search(r"^_PREV_DEMOTED_3[^\n]*= \[\n(.*?)^\]$", out,
                      re.M | re.S)
    assert prev3 and _names(prev3.group(1)) == ["q_old"]


def test_registry_schedule_under_period4(monkeypatch):
    """Registry schedule logic at period 4: each pool name checked
    EXACTLY once per 4-round cycle, class k in the window exactly when
    round % 4 == k, dupes rejected."""
    import trendmachine_spark.registry as reg

    pool = reg._rotation_pool()
    a, b, c, d = pool[0::4], pool[1::4], pool[2::4], pool[3::4]
    monkeypatch.setattr(reg, "_PARITY_PERIOD", 4)
    monkeypatch.setattr(reg, "_DEMOTE_ODD", frozenset(a))     # class 0
    monkeypatch.setattr(reg, "_DEMOTE_EVEN", frozenset(b))    # class 1
    monkeypatch.setattr(reg, "_DEMOTE_THIRD", frozenset(c))   # class 2
    monkeypatch.setattr(reg, "_DEMOTE_FOURTH", frozenset(d))  # class 3
    cycle = [set(reg._demoted_for_round(r)) for r in (12, 13, 14, 15)]
    assert not set.intersection(*cycle)
    for n in pool:
        assert sum(1 for dm in cycle if n not in dm) == 1
    assert not set(a) & set(reg._demoted_for_round(12))  # 12 % 4 == 0
    assert not set(b) & set(reg._demoted_for_round(13))
    assert not set(c) & set(reg._demoted_for_round(14))
    assert not set(d) & set(reg._demoted_for_round(15))
    assert set(d) <= set(reg._demoted_for_round(12))
    monkeypatch.setattr(reg, "_DEMOTE_FOURTH", frozenset(d) | {a[0]})
    with pytest.raises(AssertionError, match="more than one"):
        reg._demoted_for_round(12)


def _classes4(out: str) -> dict[str, list[str]]:
    sets = {}
    for label in ("_DEMOTE_EVEN", "_DEMOTE_ODD", "_DEMOTE_THIRD",
                  "_DEMOTE_FOURTH"):
        m = re.search(label + r"(?::[^\n=]+)? = frozenset\((?:\)|\{\n.*?^\}\))",
                      out, re.M | re.S)
        sets[label] = _names(m.group(0))
    return sets


def test_rebalance_period4_fills_fourth_class_under_cover():
    """The flip-round rebalance: names move into the new class 3 (next
    check r15) only when their gap allows — o (checked r12, gap 3) and
    t (checked r11, gap 4) may, e (checked r10, gap 5) may NOT. The
    schedule promise that class-1 names due THIS round stay put is
    expressed via --exclude, exactly how the real r13 flip ran."""
    from rotate_window import rebalance_text

    out = rebalance_text(
        FAKE_P4, targets={0: 2, 1: 3, 2: 2, 3: 2},
        exclude=frozenset({"e1", "e2", "e3"}))
    ast.parse(out)
    sets = _classes4(out)
    assert sorted(len(v) for v in sets.values()) == [2, 2, 2, 3]
    assert sets["_DEMOTE_EVEN"] == ["e1", "e2", "e3"]  # promise kept
    moved = set(sets["_DEMOTE_FOURTH"])
    assert moved and moved <= {"o1", "o2", "o3", "t1", "t2", "t3"}
    # an e name can never be forced into class 0 (next check r16,
    # gap 6 from its r10 last check) even when targets demand it
    with pytest.raises(SystemExit, match="no legal move"):
        rebalance_text(FAKE_P4, targets={0: 4, 1: 2, 2: 3, 3: 0},
                       exclude=frozenset({"o1", "o2", "o3"}))


def test_status_report_reads_schedule_health():
    """`status` is read-only schedule telemetry from the same literals
    CI pins: sizes, window occupancy, the over-44 escalation flag."""
    from rotate_window import status_report

    out = status_report(FAKE_P4)
    assert "round 13, period 4, pool 9" in out
    assert "this round checks class 1: window 3/50" in out
    assert "next checked r15" in out  # class 3
    # real registry: never crashes, carries the wall line
    out2 = status_report(SRC if "_PARITY_PERIOD" in SRC else FAKE_P4)
    assert "capacity wall" in out2
    # a class pushed past 44 gets the loud escalation flag
    fat = FAKE_P4.replace(
        '_DEMOTE_ODD = frozenset({\n    "o1", "o2", "o3",\n})',
        "_DEMOTE_ODD = frozenset({\n"
        + "".join(f'    "o{i}",\n' for i in range(1, 47)) + "})")
    assert "OVER 44" in status_report(fat)

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


def test_assign_targets_smaller_parity_set_and_rejects_dupes():
    out = assign_text(SRC, "brand_new_query")
    ast.parse(out)
    even = _names(re.search(r"_DEMOTE_EVEN = frozenset\(\{\n(.*?)^\}\)", SRC,
                            re.M | re.S).group(1))
    odd = _names(re.search(r"_DEMOTE_ODD = frozenset\(\{\n(.*?)^\}\)", SRC,
                           re.M | re.S).group(1))
    # on a size tie (the permanent state since r8: the pool sits AT the
    # 50+50 parity capacity) the tool's min() deterministically picks
    # _DEMOTE_EVEN, the first key — mirror that; the registry's
    # import-time window asserts are what actually refuse an
    # over-capacity assignment when the rewrite is applied for real
    smaller = "_DEMOTE_EVEN" if len(even) <= len(odd) else "_DEMOTE_ODD"
    block = re.search(smaller + r" = frozenset\(\{\n(.*?)^\}\)", out,
                      re.M | re.S).group(1)
    assert "brand_new_query" in _names(block)
    # a name that already has a parity is refused
    try:
        assign_text(SRC, sorted(even)[0])
    except SystemExit:
        pass
    else:
        raise AssertionError("assign must refuse an already-assigned name")

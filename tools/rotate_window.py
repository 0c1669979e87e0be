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
      _DEMOTE_THIRD under period >= 3 and _DEMOTE_FOURTH under
      period 4) is smallest (the balance rule from the registry
      docstring). Refuses names already assigned.
      Remember new queries are normally ALSO pinned for their first
      round (`pin` is a separate, explicit step).

  python tools/rotate_window.py rebalance [T0,T1,T2] [--exclude A,B,...]
      Move names between the demotion classes so their sizes hit the
      targets (default: as balanced as the pool allows). Every move is
      checked against the COVER INVARIANT: a moved name's gap between
      driver checks must never exceed _PARITY_PERIOD rounds. The
      name's last-checked round is derived from the same literals CI
      pins (`not in _PREV_DEMOTED` => checked last round; `not in
      _PREV_DEMOTED_2` => checked two rounds ago; both => three), and
      its next check is the first round >= _ROUND in the destination
      class — a move is refused unless next - last <= period. Names in
      --exclude are never moved (use for queries changed-but-not-yet
      driver-checked, whose literal-derived last-check is optimistic —
      e.g. a brand-new query awaiting its first window). Run at round
      start AFTER `bump`, BEFORE pinning: the verdict-r9 failure mode
      is a checked class at exactly 50 leaving zero pin slots, so any
      changed query overflows the window mid-round.

  python tools/rotate_window.py status
      Read-only schedule-health report: class sizes vs the balanced
      optimum and the 44-name pin-headroom bound, window occupancy,
      last-checked histogram, capacity wall. Run it at every round
      start — the period-3 wall was visible here a round early.

  python tools/rotate_window.py set-period N
      Switch the rotation cycle length (2, 3 or 4). Each extra class
      raises the oracled-pool capacity by 50 under the driver's
      50-entry window (period 3 -> 150, period 4 -> 200): every query
      is driver-checked once per N rounds, new names `assign` into the
      newest class (_DEMOTE_THIRD / _DEMOTE_FOURTH) until the windows
      balance, and each `bump` cascades the history chain deepest
      first (_PREV_DEMOTED_3 <- _PREV_DEMOTED_2 <- _PREV_DEMOTED <-
      _DEMOTED) so the "no name demoted a full cycle" invariant stays
      checkable from literals. Flip at a round start, BEFORE pinning:
      the transition itself can leave a name unchecked for up to
      period+1 rounds (documented at _PARITY_PERIOD in registry.py).
      After a flip the old classes are typically over the new balanced
      size and the cover invariant blocks most moves until their next
      check — run `rebalance` with explicit targets at the flip, then
      plain `rebalance` again the FOLLOWING round to finish.

Every command prints the resulting window sizes for this round and the
next, and exits non-zero (leaving the file untouched) if the rewritten
module fails its own import-time asserts.
"""

from __future__ import annotations

import os
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
_PREV3_RE = re.compile(
    r"^_PREV_DEMOTED_3(?::[^\n=]+)? = \[(?:\][^\n]*|\n.*?^\])", re.M | re.S)
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
    Under period >= 3 the previous-round literals CASCADE, deepest
    first (_PREV_DEMOTED_3 <- _PREV_DEMOTED_2 <- _PREV_DEMOTED <-
    demoted_now) so the no-name-demoted-a-full-cycle invariant stays
    checkable from literals; under period 2 the deeper literals are
    left untouched (disjointness of consecutive rounds already covers
    the cycle). _PREV_DEMOTED_3 cascades whenever its literal exists —
    keeping three rounds of history live under period 3 is what makes
    a later period-4 flip lossless (the flip round's gap derivation
    needs to know who was checked three rounds ago)."""
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
        prev3_m = _PREV3_RE.search(src)
        if prev3_m:
            prev2_names = re.findall(
                r'"([^"]+)"', _PREV2_RE.search(src).group(0))
            prev3_new = ("_PREV_DEMOTED_3: list[str] = [\n"
                         + _fmt_list(sorted(prev2_names)) + "\n]"
                         if prev2_names else
                         "_PREV_DEMOTED_3: list[str] = []")
            src = _PREV3_RE.sub(lambda _: prev3_new, src, count=1)
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
    the historical EVEN/ODD pair; period 3 adds _DEMOTE_THIRD and
    period 4 _DEMOTE_FOURTH (whose empty literals are rewritten into
    blocks on first assignment). The name is refused if ANY class
    (active or not) already holds it."""
    pm = _PERIOD_RE.search(src)
    period = int(pm.group(1)) if pm else 2
    labels = ["_DEMOTE_EVEN", "_DEMOTE_ODD"]
    if period >= 3:
        labels.append("_DEMOTE_THIRD")
    if period >= 4:
        labels.append("_DEMOTE_FOURTH")
    all_labels = ["_DEMOTE_EVEN", "_DEMOTE_ODD", "_DEMOTE_THIRD",
                  "_DEMOTE_FOURTH"]
    sets = {}
    for label in all_labels:
        m = re.search(label + r"(?::[^\n=]+)? = frozenset\((?:\)|\{\n.*?^\}\))",
                      src, re.M | re.S)
        if not m:
            if label in labels:
                raise SystemExit(f"could not find the {label} block")
            continue  # inactive class absent from an old fixture: fine
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


def _class_labels(period: int) -> dict[int, str]:
    """checked-round class -> registry literal name (see registry.py:
    the set names are historical labels from the period-2 era)."""
    labels = {0: "_DEMOTE_ODD", 1: "_DEMOTE_EVEN"}
    if period >= 3:
        labels[2] = "_DEMOTE_THIRD"
    if period >= 4:
        labels[3] = "_DEMOTE_FOURTH"
    return labels


def _class_block(src: str, label: str) -> re.Match:
    m = re.search(label + r"(?::[^\n=]+)? = frozenset\((?:\)|\{\n.*?^\}\))",
                  src, re.M | re.S)
    if not m:
        raise SystemExit(f"could not find the {label} block")
    return m


def rebalance_text(src: str, targets: dict[int, int] | None = None,
                   exclude: frozenset[str] = frozenset()) -> str:
    """Pure rewrite moving names between demotion classes to hit
    per-class size ``targets`` (default: balanced, remainder to the
    soonest-checked classes), refusing any move that would stretch a
    name's between-checks gap past _PARITY_PERIOD rounds.

    Last-checked rounds are derived from the literals CI already pins:
    a name absent from _PREV_DEMOTED was driver-checked last round,
    one absent from _PREV_DEMOTED_2 two rounds ago, and the full-cycle
    invariant caps the rest at period rounds ago. That derivation is
    OPTIMISTIC for names that changed recently but were not yet
    driver-checked (e.g. a new query awaiting its first window) — pass
    those via ``exclude`` so they are never moved."""
    pm = _PERIOD_RE.search(src)
    period = int(pm.group(1)) if pm else 2
    rnd = int(_ROUND_RE.search(src).group(1))
    labels = _class_labels(period)
    sets = {c: set(re.findall(r'"([^"]+)"', _class_block(src, lab).group(0)))
            for c, lab in labels.items()}
    prev = set(re.findall(r'"([^"]+)"', _PREV_RE.search(src).group(0)))
    prev2_m = _PREV2_RE.search(src)
    prev2 = set(re.findall(r'"([^"]+)"', prev2_m.group(0))) if prev2_m else set()
    prev3_m = _PREV3_RE.search(src)
    prev3 = set(re.findall(r'"([^"]+)"', prev3_m.group(0))) if prev3_m else set()
    #: literal history chain, most recent first, truncated to the
    #: period - 1 levels the cycle invariant keeps meaningful
    prev_chain = [prev, prev2, prev3][: period - 1]
    pool = sum(len(s) for s in sets.values())
    if targets is None:
        base, extra = divmod(pool, len(sets))
        order = sorted(sets, key=lambda c: (c - rnd) % period)
        targets = {c: base + (1 if i < extra else 0)
                   for i, c in enumerate(order)}
    if sorted(targets) != sorted(sets) or sum(targets.values()) != pool:
        raise SystemExit(
            f"targets {targets} must cover classes {sorted(sets)} and "
            f"sum to the pool size {pool}")
    unknown = exclude - set().union(*sets.values())
    if unknown:
        raise SystemExit(f"--exclude names not in any class: {sorted(unknown)}")

    def last_checked(name: str) -> int:
        for back, demoted_then in enumerate(prev_chain, start=1):
            if name not in demoted_then:
                return rnd - back
        return rnd - period  # full-cycle invariant bounds it here

    def next_checked(cls: int) -> int:
        return rnd + ((cls - rnd) % period)

    moves: list[tuple[str, int, int, int]] = []
    while True:
        over = sorted(c for c in sets if len(sets[c]) > targets[c])
        under = sorted(c for c in sets if len(sets[c]) < targets[c])
        if not over and not under:
            break
        moved = False
        for dst in under:
            nxt = next_checked(dst)
            cands = sorted(
                (nxt - last_checked(n), n, c)
                for c in over for n in sets[c] if n not in exclude)
            for gap, n, c in cands:
                if gap <= period:
                    sets[c].discard(n)
                    sets[dst].add(n)
                    moves.append((n, c, dst, gap))
                    moved = True
                    break
            if moved:
                break
        if not moved:
            raise SystemExit(
                "no legal move toward the targets: every candidate would "
                "stretch a name's check gap past the period (or is "
                "excluded) — relax targets or shrink --exclude")
    for c, lab in labels.items():
        m = _class_block(src, lab)
        decl = m.group(0).split(" = frozenset", 1)[0]
        header = (f"    # class {c} — driver-checked in rounds where "
                  f"_ROUND % {period} == {c};\n"
                  f"    # membership last rebalanced r{rnd} by "
                  "rotate_window.py rebalance\n")
        block = (decl + " = frozenset({\n" + header
                 + _fmt_list(sorted(sets[c])) + "\n})")
        src = src[: m.start()] + block + src[m.end():]
    for n, c_from, c_to, gap in moves:
        print(f"  move {n}: class {c_from} -> {c_to} "
              f"(next check r{next_checked(c_to)}, gap {gap})")
    return src


def set_period_text(src: str, period: int) -> str:
    """Pure rewrite of the _PARITY_PERIOD literal (2, 3 or 4). Also
    stamps _PERIOD_FLIPPED_AT with the current _ROUND (when that
    literal exists) so the class-balance guard knows to grant the flip
    round its one round of grace."""
    if period not in (2, 3, 4):
        raise SystemExit(f"period must be 2, 3 or 4, got {period}")
    if not _PERIOD_RE.search(src):
        raise SystemExit("could not find `_PARITY_PERIOD = N` in registry.py")
    out = _PERIOD_RE.sub(f"_PARITY_PERIOD = {period}", src, count=1)
    rnd_m = _ROUND_RE.search(src)
    flip_re = re.compile(r"^_PERIOD_FLIPPED_AT = \d+$", re.M)
    if rnd_m and flip_re.search(out):
        out = flip_re.sub(
            f"_PERIOD_FLIPPED_AT = {int(rnd_m.group(1))}", out, count=1)
    return out


def status_report(src: str) -> str:
    """Schedule-health report from the same literals CI pins: per-class
    sizes vs the balanced optimum and the 44-name pin-headroom bound,
    this round's window occupancy, literal-derived last-checked
    histogram, and the capacity wall (rounds of ~10-oracled-queries/
    round growth before a class hits 44). The r12 near-miss motivates
    this: the period-3 wall was visible in these numbers a round
    before the import-time assert would have fired — one command
    makes it a habit instead of a forensic."""
    import math

    pm = _PERIOD_RE.search(src)
    period = int(pm.group(1)) if pm else 2
    rnd = int(_ROUND_RE.search(src).group(1))
    labels = _class_labels(period)
    sets = {c: sorted(re.findall(r'"([^"]+)"',
                                 _class_block(src, lab).group(0)))
            for c, lab in labels.items()}
    pinned_m = _PINNED_RE.search(src) or _EMPTY_PINNED_RE.search(src)
    pinned = re.findall(r'"([^"]+)"', pinned_m.group(0)) if pinned_m else []
    prev = set(re.findall(r'"([^"]+)"', _PREV_RE.search(src).group(0)))
    prev2_m = _PREV2_RE.search(src)
    prev2 = set(re.findall(r'"([^"]+)"', prev2_m.group(0))) if prev2_m else set()
    prev3_m = _PREV3_RE.search(src)
    prev3 = set(re.findall(r'"([^"]+)"', prev3_m.group(0))) if prev3_m else set()
    chain = [prev, prev2, prev3][: period - 1]

    def last_checked(n: str) -> int:
        for back, dem in enumerate(chain, start=1):
            if n not in dem:
                return rnd - back
        return rnd - period

    pool = sum(len(s) for s in sets.values())
    optimal = math.ceil(pool / period) if period else 0
    checked_class = rnd % period
    window = len(sets.get(checked_class, [])) + len(pinned)
    lines = [
        f"round {rnd}, period {period}, pool {pool} classed names, "
        f"optimal class size {optimal}",
        f"this round checks class {checked_class}: window "
        f"{window}/50 ({len(pinned)} pinned, "
        f"{max(0, 50 - window)} pin slots left)",
    ]
    for c in sorted(sets):
        names = sets[c]
        nxt = rnd + ((c - rnd) % period)
        flags = []
        if len(names) > optimal:
            flags.append(f"over balanced {optimal}")
        if len(names) > 44:
            flags.append("OVER 44: <6 pin slots — escalate the period")
        lines.append(
            f"  class {c} ({labels[c]}): {len(names)} names, next "
            f"checked r{nxt}" + (f"  [{'; '.join(flags)}]" if flags else ""))
    hist: dict[int, int] = {}
    for s in sets.values():
        for n in s:
            hist[last_checked(n)] = hist.get(last_checked(n), 0) + 1
    lines.append("  literal-derived last-checked: " + ", ".join(
        f"r{r}: {c}" for r, c in sorted(hist.items())))
    headroom = min(44 - len(s) for s in sets.values())
    lines.append(
        f"  capacity wall: smallest class headroom to 44 is {headroom} "
        f"names (~{headroom * period} pool growth across a cycle at "
        "balanced assignment)")
    return "\n".join(lines)


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
    env = dict(os.environ, TM_ROTATION_DEFER="1")  # a NEW @register may
    # not have a demotion class yet — that is exactly what `assign` is
    # being run to fix, so the listing import must not assert on it
    out = subprocess.run(
        [sys.executable, "-c",
         "from trendmachine_spark.registry import QUERIES; print('\\n'.join(QUERIES))"],
        capture_output=True, text=True, check=True, env=env,
    )
    return [ln for ln in out.stdout.splitlines() if ln.strip()]


def _verify() -> None:
    """Fresh-interpreter import runs registry's own asserts; then check
    the alternation invariant explicitly and print window sizes."""
    code = (
        "from trendmachine_spark.registry import (_ROUND, _DEMOTED, _PREV_DEMOTED,"
        " _PREV_DEMOTED_2, _PREV_DEMOTED_3, _PARITY_PERIOD, _WINDOW_PINNED,"
        " QUERIES)\n"
        "overlap = set(_DEMOTED) & set(_PREV_DEMOTED)\n"
        "if _PARITY_PERIOD >= 3:  # illegal only if demoted a FULL cycle\n"
        "    overlap &= set(_PREV_DEMOTED_2)\n"
        "if _PARITY_PERIOD >= 4:\n"
        "    overlap &= set(_PREV_DEMOTED_3)\n"
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
                                                "set-period", "rebalance",
                                                "status"):
        raise SystemExit(__doc__)
    cmd = sys.argv[1]
    with open(REGISTRY) as f:
        original = f.read()
    if cmd == "status":
        print(status_report(original))
        return
    if cmd == "bump":
        new = bump_text(original, _current_demoted())
    elif cmd == "set-period":
        if len(sys.argv) < 3:
            raise SystemExit("set-period needs 2 or 3")
        new = set_period_text(original, int(sys.argv[2]))
    elif cmd == "rebalance":
        targets = None
        exclude: set[str] = set()
        rest = sys.argv[2:]
        i = 0
        while i < len(rest):
            if rest[i] == "--exclude":
                i += 1
                if i >= len(rest):
                    raise SystemExit("--exclude needs a comma-joined name list")
                exclude |= {n for n in rest[i].split(",") if n}
            else:
                targets = {j: int(x)
                           for j, x in enumerate(rest[i].split(","))}
            i += 1
        registered = set(_registered_names())
        bad = exclude - registered
        if bad:
            raise SystemExit(f"--exclude names not registered: {sorted(bad)}")
        new = rebalance_text(original, targets, frozenset(exclude))
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

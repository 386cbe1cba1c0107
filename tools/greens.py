"""Stale-green tripwire + generated driver-check priority list.

The driver value-checks only the first 50 keys of `_CHECK_PRIORITY`
per round, so a green row goes stale the moment the function (or its
oracle) is edited afterwards — rounds 2/3 each shipped one such stale
green. This tool makes staleness mechanical instead of remembered:

- ``green_state.json`` (committed, next to this file) records, per key,
  the round of its last non-failing driver row and the FINGERPRINT
  (transitive-closure hash, see below) the code had when that row was
  recorded.
- ``--priority`` regenerates the check order from that state:
  tier 1 = never driver-checked, tier 2 = fingerprint drift since last
  green (plus manual ``force_recheck`` entries for non-code
  dependencies, e.g. testdata regeneration), tier 3 = last row failed,
  tier 4 = everything else, oldest green round first (rotation), ties
  in registry order. `__spark_entry__._CHECK_PRIORITY` is a verbatim
  copy of this output; tests/test_green_tripwire.py fails if they
  drift or if a tier-1/2/3 key falls outside the 50-slot budget.
- ``--record CORRECTNESS_rNN.json --round N`` folds a driver round's
  rows back into the state with CURRENT fingerprints (run it at the
  start of the next round, before editing anything) and clears
  ``force_recheck`` entries that got a fresh row.

Fingerprints cover each key's TRANSITIVE MODULE SET (round-4 verdict
item 3): the sha256 of the defining module's file content plus every
repo-local module it imports, recursively, plus the oracle SQL. Editing
(or deleting) a shared helper — streaming/source.py, crosshash.py,
catalog.py — therefore flips every dependent key to
"edited-since-green" automatically; ``force_recheck`` remains only as a
manual escape hatch for non-code dependencies (e.g. testdata regen).
"""

from __future__ import annotations

import argparse
import ast
import hashlib
import inspect
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_to_hyper_app_spark.registry import QuerySpec, load_all  # noqa: E402

STATE_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "green_state.json")

#: committed ledger of hash-green LOCAL parity passes at the driver's
#: correctness scale — written by tools/parity.py, cleared by record()
#: (single constant shared by both so the writer and the expirer can
#: never drift apart)
LEDGER_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "local_parity.json")

#: the driver's per-round value-check budget
BUDGET = 50


_PKG = "parquet_to_hyper_app_spark"
_PKG_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), _PKG)


def _module_path(name: str) -> str | None:
    """Resolve a dotted repo-local module name to its source file."""
    if name != _PKG and not name.startswith(_PKG + "."):
        return None
    rel = name.split(".")[1:]
    base = os.path.join(_PKG_ROOT, *rel)
    for cand in (base + ".py", os.path.join(base, "__init__.py")):
        if os.path.exists(cand):
            return cand
    return None


def _local_imports(path: str, pkg_of: str, skip_function_bodies: bool = False) -> set[str]:
    """Repo-local modules imported by the file at ``path``.

    ``from a.b import c`` resolves to module ``a.b.c`` when that file
    exists (submodule import) and to ``a.b`` otherwise (attribute
    import) — either way the edit surface is captured.

    ``skip_function_bodies`` exists for exactly one caller: the
    registry module, whose ``load_all`` imports EVERY operator module
    for registration side effects — following those would collapse all
    144 closures into one package-wide fingerprint. Function-scoped
    imports elsewhere (streaming/sinks, dedup, convert) are genuine
    dependencies and are always followed.
    """
    with open(path, "rb") as f:
        tree = ast.parse(f.read())
    skip: set[int] = set()
    if skip_function_bodies:
        for fn_node in ast.walk(tree):
            if isinstance(fn_node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                for sub in ast.walk(fn_node):
                    if isinstance(sub, (ast.Import, ast.ImportFrom)):
                        skip.add(id(sub))
    found: set[str] = set()
    for node in ast.walk(tree):
        if id(node) in skip:
            continue
        if isinstance(node, ast.Import):
            for alias in node.names:
                if _module_path(alias.name):
                    found.add(alias.name)
        elif isinstance(node, ast.ImportFrom):
            if node.level:  # relative import: resolve against the package
                base = pkg_of.rsplit(".", node.level - 1)[0] if node.level > 1 else pkg_of
                mod = f"{base}.{node.module}" if node.module else base
            else:
                mod = node.module or ""
            if not _module_path(mod):
                continue
            for alias in node.names:
                sub = f"{mod}.{alias.name}"
                found.add(sub if _module_path(sub) else mod)
    return found


_CLOSURE_CACHE: dict[tuple[str, bool], tuple[tuple[str, str], ...]] = {}


def _module_closure(module: str, _ancestors: bool = True) -> tuple[tuple[str, str], ...]:
    """Sorted (module, file-sha256) pairs for the transitive repo-local
    import closure of ``module``. Memoized per process."""
    if (module, _ancestors) in _CLOSURE_CACHE:
        return _CLOSURE_CACHE[(module, _ancestors)]
    seen: dict[str, str] = {}
    stack = [module]
    while stack:
        mod = stack.pop()
        if mod in seen:
            continue
        path = _module_path(mod)
        if path is None:
            continue
        with open(path, "rb") as f:
            seen[mod] = hashlib.sha256(f.read()).hexdigest()
        # Python executes every ancestor package __init__ on import (and
        # the root one carries real re-export code), so they belong to
        # the edit surface even though no import statement names them
        # (review r5; _ancestors=False preserves the first closure
        # scheme solely for migrate())
        if _ancestors:
            parts = mod.split(".")
            stack.extend(".".join(parts[: i + 1]) for i in range(len(parts) - 1))
        pkg = mod if os.path.basename(path) == "__init__.py" else mod.rsplit(".", 1)[0]
        stack.extend(_local_imports(path, pkg, skip_function_bodies=(mod == f"{_PKG}.registry")))
    out = tuple(sorted(seen.items()))
    _CLOSURE_CACHE[(module, _ancestors)] = out
    return out


def fingerprint(spec: QuerySpec, _ancestors: bool = True) -> str:
    h = hashlib.sha256()
    for mod, sha in _module_closure(spec.fn.__module__, _ancestors):
        h.update(f"{mod}:{sha}\n".encode())
    h.update(inspect.getsource(spec.fn).encode())
    h.update(b"\n")
    h.update((spec.oracle or "").encode())
    return h.hexdigest()[:16]


def _legacy_fingerprint(spec: QuerySpec) -> str:
    """Pre-r5 scheme (function source + oracle only) — kept solely so
    ``--migrate`` can tell "unchanged since green" from "drifted" when
    re-stamping the ledger under the transitive-closure scheme."""
    src = inspect.getsource(spec.fn)
    return hashlib.sha256((src + "\n" + (spec.oracle or "")).encode()).hexdigest()[:16]


def migrate(specs: dict[str, QuerySpec], state: dict) -> tuple[int, int]:
    """Re-stamp greens recorded under a SUPERSEDED fingerprint scheme
    (legacy function-source-only, or the closure scheme without
    ancestor packages) with the current one — only where the old-scheme
    hash computed on CURRENT source still matches the stamp, i.e. the
    code the old scheme could see is unchanged since the driver row.
    Keys that drifted under the old scheme keep their stale stamp and
    stay hot.

    CAVEAT (review r5): "unchanged" is judged by the OLD scheme's eyes,
    so an edit only the NEW scheme can see (a shared-helper change
    between the green row and the migration) is laundered as fresh.
    Run migrate() only alongside independent evidence for that gap —
    e.g. a full local parity sweep at driver scale, or the git audit in
    the migration commit message — and force_recheck anything flagged.
    Returns (restamped, left_drifted)."""
    restamped = drifted = 0
    for key, g in state["greens"].items():
        spec = specs.get(key)
        if spec is None:
            continue
        if g["fingerprint"] in (
            _legacy_fingerprint(spec),
            fingerprint(spec, _ancestors=False),
        ):
            g["fingerprint"] = fingerprint(spec)
            restamped += 1
        elif g["fingerprint"] != fingerprint(spec):
            drifted += 1
    return restamped, drifted


def load_state() -> dict:
    if not os.path.exists(STATE_PATH):
        return {"greens": {}, "force_recheck": []}
    with open(STATE_PATH) as f:
        return json.load(f)


def save_state(state: dict) -> None:
    state["greens"] = dict(sorted(state["greens"].items()))
    state["force_recheck"] = sorted(set(state["force_recheck"]))
    with open(STATE_PATH, "w") as f:
        json.dump(state, f, indent=1, sort_keys=True)
        f.write("\n")


def priority(specs: dict[str, QuerySpec], state: dict) -> tuple[list[str], dict[str, str]]:
    """Return (ordered key list, key → tier-reason for tiers 1-3)."""
    greens: dict = state["greens"]
    force = set(state["force_recheck"])
    reason: dict[str, str] = {}
    tiers: dict[str, list[str]] = {t: [] for t in ("never", "drift", "failed", "rotate")}
    for key, spec in specs.items():
        g = greens.get(key)
        if g is None:
            tiers["never"].append(key)
            reason[key] = "never driver-checked"
        elif g["fingerprint"] != fingerprint(spec) or key in force:
            tiers["drift"].append(key)
            reason[key] = (
                "forced recheck (dependency edit)"
                if g["fingerprint"] == fingerprint(spec)
                else "source/oracle edited since last green"
            )
        elif g.get("failed"):
            tiers["failed"].append(key)
            reason[key] = f"last driver row failed (r{g['round']})"
        else:
            tiers["rotate"].append(key)
    # deterministic tier ordering — the registry dict's insertion order
    # depends on which module got imported first in the current process,
    # so it is NOT stable across entrypoints. The drift tier sorts by
    # starvation first: keys whose waiver was already consumed in a
    # prior round (deferred_rounds desc), then oldest driver proof
    # (round asc), then name. Alphabetical-only sorting starved the
    # window_* quartet for two consecutive rounds when >50 keys
    # drifted at once (verdict r5 item 1).
    tiers["never"].sort()
    tiers["drift"].sort(
        key=lambda k: (-greens[k].get("deferred_rounds", 0), greens[k]["round"], k)
    )
    tiers["failed"].sort()
    tiers["rotate"].sort(key=lambda k: (greens[k]["round"], k))
    # starved keys (waiver already consumed in a prior round) outrank
    # even the never-checked tier: the tripwire forbids a second
    # consecutive deferral, while a NEW key deferring its FIRST driver
    # row one round is the least-harm overflow (it has a local sf0.01
    # hash-green ledger entry like any other waivered key, and has
    # never been claimed driver-proven). Without this, registering a
    # handful of new operators in a heavy-drift round pushes
    # once-deferred keys out of the 50-slot budget — starvation by
    # addition instead of by alphabet.
    # ... and the scan covers every tier a consumed waiver can sit in:
    # drift AND failed (a key whose driver row failed, then overflowed
    # the budget on a local waiver, is just as starved — review r6),
    # plus never-checked keys that already deferred their first row
    # (tracked in state["never_deferred"], charged by record()).
    never_deferred = state.get("never_deferred", {})
    starved = [
        k
        for k in tiers["drift"] + tiers["failed"]
        if greens[k].get("deferred_rounds", 0) >= 1
    ]
    starved += [k for k in tiers["never"] if never_deferred.get(k, 0) >= 1]
    starved.sort(
        key=lambda k: (
            -max(
                greens.get(k, {}).get("deferred_rounds", 0),
                never_deferred.get(k, 0),
            ),
            greens.get(k, {}).get("round", 0),
            k,
        )
    )
    never_rest = [k for k in tiers["never"] if k not in starved]
    drift_rest = [k for k in tiers["drift"] if k not in starved]
    failed_rest = [k for k in tiers["failed"] if k not in starved]
    ordered = starved + never_rest + drift_rest + failed_rest + tiers["rotate"]
    return ordered, reason


def record(specs: dict[str, QuerySpec], state: dict, rows: dict, round_no: int) -> None:
    # a new driver round invalidates every local-parity waiver: the
    # ledger lets a budget-overflow key defer its driver row ONE round,
    # not forever — each round's local passes must be re-earned after
    # the round's driver run is folded in
    if os.path.exists(LEDGER_PATH):
        with open(LEDGER_PATH, "w") as f:
            f.write("{}\n")
    # starvation ledger (verdict r5 item 3): a key that was hot going
    # into this round but got NO driver row consumed a waiver — count
    # it, so priority() hard-promotes it and the tripwire can refuse a
    # second consecutive deferral that would fall outside the budget.
    # The hot set comes from the COMMITTED check_priority.json (what
    # the driver actually ran against), not a fresh priority() call: a
    # spec edited between the driver run and the fold would otherwise
    # be charged a waiver it never consumed — and a genuinely starved
    # key whose edit got reverted would escape counting (review r6).
    prio_path = os.path.join(os.path.dirname(STATE_PATH), "check_priority.json")
    if os.path.exists(prio_path):
        with open(prio_path) as f:
            hot = set(json.load(f)["hot"])
    else:
        # ADVICE r6: this fallback recomputes the hot set from POST-edit
        # fingerprints — exactly the driver-run skew the committed
        # check_priority.json exists to avoid — so waivers can be
        # mis-charged. Say so out loud; the committed file should exist
        # in every real fold.
        print(
            f"WARNING: {prio_path} missing — charging waivers from a "
            "fresh priority() over current fingerprints, which may not "
            "match the hot set the driver actually ran against",
            file=sys.stderr,
        )
        _, reason = priority(specs, state)
        hot = set(reason)
    for key in hot:
        g = state["greens"].get(key)
        if g is not None and key not in rows:
            g["deferred_rounds"] = g.get("deferred_rounds", 0) + 1
        elif g is None and key not in rows and key in specs:
            # a never-driver-checked key that was hot and got no row
            # also consumed a waiver — track it separately (it has no
            # greens entry to hang a counter on) so priority() promotes
            # it and a new key can defer only its FIRST round
            nd = state.setdefault("never_deferred", {})
            nd[key] = nd.get(key, 0) + 1
    # keys that DID get their first driver row stop being
    # never-deferred (their greens entry now carries any future count)
    for key in rows:
        state.get("never_deferred", {}).pop(key, None)
    for key, row in rows.items():
        if key not in specs:
            continue
        err = row.get("err")
        ok_hash = row.get("hash_match") is True
        # a weak (rows-only) key must produce ROWS to count as green:
        # zero rows is exactly the red state enforce_recall_floor
        # engineers for a degraded ANN path, and `>= 0` would have
        # recorded it as a pass and rotated the key out of priority
        ok_weak = err == "no_oracle" and row.get("spark_rows", 0) > 0
        failed = not (ok_hash or ok_weak)
        state["greens"][key] = {
            "round": round_no,
            "fingerprint": fingerprint(specs[key]),
            "weak": bool(ok_weak),
            "failed": failed,
        }
        if key in state["force_recheck"]:
            state["force_recheck"].remove(key)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--record", help="CORRECTNESS_rNN.json to fold into green_state")
    ap.add_argument("--round", type=int, help="round number for --record")
    ap.add_argument("--force", nargs="*", default=None, help="keys to add to force_recheck")
    ap.add_argument(
        "--migrate",
        action="store_true",
        help="re-stamp legacy (function-source-only) fingerprints with "
        "the transitive-closure scheme where the key is unchanged",
    )
    ap.add_argument("--priority", action="store_true", help="print the generated check order")
    ap.add_argument(
        "--emit",
        action="store_true",
        help="write the generated order to tools/check_priority.json "
        "(the list __spark_entry__ serves to the driver)",
    )
    args = ap.parse_args()

    specs = load_all()
    state = load_state()

    if args.record:
        if args.round is None:
            print("--record requires --round")
            return 2
        with open(args.record) as f:
            rows = json.load(f)
        record(specs, state, rows, args.round)
        save_state(state)
        print(f"recorded {len(rows)} rows into {STATE_PATH}")

    if args.migrate:
        restamped, drifted = migrate(specs, state)
        save_state(state)
        print(f"migrated {restamped} fingerprints; {drifted} left drifted (stay hot)")

    if args.force is not None:
        state["force_recheck"] = sorted(set(state["force_recheck"]) | set(args.force))
        save_state(state)
        print(f"force_recheck = {state['force_recheck']}")

    if args.emit:
        ordered, reason = priority(specs, state)
        out = os.path.join(os.path.dirname(STATE_PATH), "check_priority.json")
        with open(out, "w") as f:
            json.dump({"order": ordered, "hot": reason}, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {len(ordered)} keys ({len(reason)} hot) to {out}")

    if args.priority or (
        not args.record and args.force is None and not args.emit and not args.migrate
    ):
        ordered, reason = priority(specs, state)
        for i, key in enumerate(ordered):
            tag = reason.get(key, "")
            mark = "*" if i < BUDGET else " "
            print(f"{mark} {i + 1:3d} {key}" + (f"  [{tag}]" if tag else ""))
        n_hot = len(reason)
        print(f"\n{n_hot} keys need a fresh row; budget {BUDGET}", file=sys.stderr)
        if n_hot > BUDGET:
            print("WARNING: hot keys exceed the driver budget", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())

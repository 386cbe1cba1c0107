"""Stale-green tripwire (VERDICT r3 item 6).

A driver green goes stale the moment the key's function or oracle is
edited afterwards; rounds 2 and 3 each shipped one such stale green
because the check priority list was hand-maintained memory. These
tests make it mechanical: the committed check_priority.json must equal
a fresh regeneration from green_state.json, and every key that NEEDS a
fresh driver row (never-checked / edited-since-green / failed) must
sit inside the driver's 50-slot budget.
"""

from __future__ import annotations

import json
import os

from tools.greens import BUDGET, STATE_PATH, fingerprint, load_state, priority

from parquet_to_hyper_app_spark.registry import load_all

_PRIORITY_PATH = os.path.join(os.path.dirname(STATE_PATH), "check_priority.json")


def test_priority_list_is_generated():
    """Committed list == regeneration; edits to any registered function
    or oracle without re-running `tools/greens.py --emit` fail here."""
    specs = load_all()
    ordered, reason = priority(specs, load_state())
    with open(_PRIORITY_PATH) as f:
        committed = json.load(f)
    assert committed["order"] == ordered, (
        "check_priority.json is stale — run: python tools/greens.py --emit"
    )
    assert committed["hot"] == reason


def test_hot_keys_fit_driver_budget():
    """Every key needing a fresh row must be value-checked next round —
    or, when the hot count exceeds the driver's 50-row budget, the
    overflow keys must have a hash-green LOCAL parity pass recorded at
    the driver's correctness scale for their CURRENT fingerprint
    (tools/local_parity.json, written by tools/parity.py on sf0.01
    runs). "Verified locally, driver row deferred one round" is
    acceptable; "unverified and unscheduled" is not."""
    from tools.greens import LEDGER_PATH, fingerprint

    specs = load_all()
    ordered, reason = priority(specs, load_state())
    head = set(ordered[:BUDGET])
    outside = [k for k in reason if k not in head]
    if not outside:
        return
    ledger = {}
    if os.path.exists(LEDGER_PATH):
        with open(LEDGER_PATH) as f:
            ledger = json.load(f)
    unproven = [k for k in outside if ledger.get(k) != fingerprint(specs[k])]
    assert not unproven, (
        f"hot keys outside the 50-slot driver budget WITHOUT a recorded "
        f"local parity pass at their current fingerprint: {unproven} — "
        f"run: python tools/parity.py --sf /root/testdata/sf0.01 "
        + " ".join(unproven)
    )
    # the waiver is NOT renewable (verdict r5 item 3): a key that
    # already consumed a deferral in a prior round must sit inside the
    # budget now, local pass or not — otherwise sustained drift starves
    # it forever (exactly what happened to the window quartet r4→r5).
    # ONE structural exception (r16): when the starved set ALONE
    # exceeds the 50-row budget — the aftermath of a whole-surface edit
    # like the r15 scan_spread campaign, which drifted 114 keys at once
    # so 64 arrived at r16 already once-deferred — no emission order
    # can seat them all, and the unconditional assert would simply
    # forbid folding the driver round. In that case (and ONLY that
    # case) the overflow may defer again, provided the budget is spent
    # maximally on the debt: every head slot holds a starved key
    # (priority() orders them oldest-debt-first, so each driver round
    # retires 50 and the deepest debt drains first — no key starves
    # indefinitely), and each overflow key holds a CURRENT-fingerprint
    # local parity pass (already asserted above). A starved set that
    # fits the budget keeps the strict rule.
    state = load_state()
    def _starved(k: str) -> bool:
        return (
            state["greens"].get(k, {}).get("deferred_rounds", 0) >= 1
            or state.get("never_deferred", {}).get(k, 0) >= 1
        )

    starved = [k for k in outside if _starved(k)]
    if starved:
        all_starved = [k for k in reason if _starved(k)]
        assert len(all_starved) > BUDGET, (
            f"keys already deferred in a prior round are outside the budget "
            f"AGAIN (waivers are one-round, not renewable): {starved}"
        )
        not_spent_on_debt = [k for k in ordered[:BUDGET] if not _starved(k)]
        assert not not_spent_on_debt, (
            f"starved keys overflow the budget but head slots are spent on "
            f"non-starved keys: {not_spent_on_debt}"
        )


def test_every_registered_key_is_listed():
    specs = load_all()
    ordered, _ = priority(specs, load_state())
    assert sorted(ordered) == sorted(specs)


def test_drift_tier_sorts_by_starvation_then_staleness():
    """Verdict r5 item 1: the drift tier must order by consumed
    deferrals (desc), then oldest driver proof, then name — NOT
    alphabetically, which starved late-alphabet keys (window_*) for
    two consecutive rounds when >50 keys drifted at once."""
    specs = load_all()
    keys = sorted(specs)[:4]
    a, b, c, d = keys
    state = {
        "greens": {
            # all four drifted (bogus fingerprints); starvation/round
            # history should decide the order, not the names
            a: {"round": 1, "fingerprint": "x", "failed": False},
            b: {"round": 3, "fingerprint": "x", "failed": False, "deferred_rounds": 2},
            c: {"round": 2, "fingerprint": "x", "failed": False},
            d: {"round": 4, "fingerprint": "x", "failed": False, "deferred_rounds": 1},
        },
        "force_recheck": [],
    }
    sub = {k: specs[k] for k in keys}
    ordered, reason = priority(sub, state)
    assert ordered == [b, d, a, c], ordered
    assert set(reason) == set(keys)


def test_record_increments_deferred_for_skipped_hot_keys(tmp_path, monkeypatch):
    """A hot key that gets no driver row in the folded round consumed a
    waiver: record() must count it (and reset the counter on keys that
    did get a row), so priority() hard-promotes starved keys."""
    import tools.greens as greens

    ledger = tmp_path / "local_parity.json"
    ledger.write_text("{}\n")
    monkeypatch.setattr(greens, "LEDGER_PATH", str(ledger))
    # STATE_PATH must ALSO point at tmp: record() resolves the committed
    # check_priority.json next to it, and without the patch the hot set
    # silently comes from the repo's live file instead of the fake
    # state — the test then depends on which real keys happen to be hot
    # (review r6)
    monkeypatch.setattr(greens, "STATE_PATH", str(tmp_path / "green_state.json"))

    specs = load_all()
    keys = sorted(specs)[:2]
    checked, skipped = keys
    state = {
        "greens": {
            checked: {"round": 1, "fingerprint": "x", "failed": False, "deferred_rounds": 1},
            skipped: {"round": 1, "fingerprint": "x", "failed": False},
        },
        "force_recheck": [],
    }
    greens.record(
        {k: specs[k] for k in keys},
        state,
        {checked: {"hash_match": True, "err": None, "spark_rows": 1}},
        round_no=6,
    )
    assert state["greens"][skipped]["deferred_rounds"] == 1
    assert state["greens"][checked].get("deferred_rounds", 0) == 0
    assert state["greens"][checked]["round"] == 6


def test_record_charges_waivers_from_committed_check_order(tmp_path, monkeypatch):
    """The waiver count must come from the COMMITTED check_priority.json
    the driver ran against, not a fresh priority() at fold time: a spec
    edited between the driver run and the fold would otherwise be
    charged a deferral it never consumed (review r6)."""
    import json as _json

    import tools.greens as greens

    ledger = tmp_path / "local_parity.json"
    ledger.write_text("{}\n")
    monkeypatch.setattr(greens, "LEDGER_PATH", str(ledger))
    monkeypatch.setattr(greens, "STATE_PATH", str(tmp_path / "green_state.json"))

    specs = load_all()
    keys = sorted(specs)[:2]
    was_hot, edited_after = keys
    # the committed order says only `was_hot` was hot when the driver
    # ran; `edited_after` drifted later (its stamp is bogus NOW, but it
    # was green at emit time)
    (tmp_path / "check_priority.json").write_text(
        _json.dumps({"order": keys, "hot": {was_hot: "edited"}})
    )
    state = {
        "greens": {
            was_hot: {"round": 1, "fingerprint": "x", "failed": False},
            edited_after: {"round": 1, "fingerprint": "x", "failed": False},
        },
        "force_recheck": [],
    }
    greens.record({k: specs[k] for k in keys}, state, {}, round_no=6)
    assert state["greens"][was_hot]["deferred_rounds"] == 1
    assert "deferred_rounds" not in state["greens"][edited_after]


def test_record_clears_local_parity_ledger(tmp_path, monkeypatch):
    """Folding a driver round into green_state must CLEAR the local-
    parity ledger: the waiver lets a budget-overflow key defer its
    driver row one round, never indefinitely (review finding r4)."""
    import tools.greens as greens

    ledger = tmp_path / "local_parity.json"
    ledger.write_text('{"some_key": "deadbeef"}\n')
    state_file = tmp_path / "green_state.json"
    state_file.write_text('{"greens": {}, "force_recheck": []}\n')
    monkeypatch.setattr(greens, "STATE_PATH", str(state_file))
    monkeypatch.setattr(greens, "LEDGER_PATH", str(ledger))

    specs = load_all()
    key = next(iter(specs))
    state = {"greens": {}, "force_recheck": []}
    greens.record(
        specs,
        state,
        {key: {"hash_match": True, "err": None, "spark_rows": 1}},
        round_no=4,
    )
    assert json.loads(ledger.read_text()) == {}
    assert state["greens"][key]["failed"] is False


def test_starved_keys_outrank_never_checked():
    """A key whose waiver was consumed in a prior round outranks even a
    brand-new key's first check: the tripwire forbids second deferrals,
    while a new key may defer its FIRST driver row on a local waiver
    (review r6 — registering new operators in a heavy-drift round must
    not push once-deferred keys out of the budget)."""
    specs = load_all()
    keys = sorted(specs)[:3]
    new, starved, fresh = keys
    state = {
        "greens": {
            starved: {"round": 2, "fingerprint": "x", "failed": False, "deferred_rounds": 1},
            fresh: {"round": 1, "fingerprint": "x", "failed": False},
        },
        "force_recheck": [],
    }
    ordered, _ = priority({k: specs[k] for k in keys}, state)
    assert ordered == [starved, new, fresh], ordered


def test_never_checked_key_waiver_is_charged_and_promoted(tmp_path, monkeypatch):
    """A never-driver-checked key that was hot and got no row consumes
    a waiver tracked in never_deferred (it has no greens entry);
    priority() then promotes it into the starved head so it can defer
    only its FIRST round (review r6)."""
    import tools.greens as greens

    monkeypatch.setattr(greens, "LEDGER_PATH", str(tmp_path / "local_parity.json"))
    monkeypatch.setattr(greens, "STATE_PATH", str(tmp_path / "green_state.json"))
    (tmp_path / "local_parity.json").write_text("{}\n")

    specs = load_all()
    keys = sorted(specs)[:3]
    new_key, old_green, other_new = keys
    state = {
        "greens": {old_green: {"round": 1, "fingerprint": "x", "failed": False}},
        "force_recheck": [],
    }
    import json as _json

    (tmp_path / "check_priority.json").write_text(
        _json.dumps({"order": keys, "hot": {new_key: "never", other_new: "never"}})
    )
    greens.record({k: specs[k] for k in keys}, state, {other_new: {
        "hash_match": True, "err": None, "spark_rows": 1}}, round_no=6)
    # new_key (no row) charged; other_new (got its first row) not
    assert state["never_deferred"] == {new_key: 1}
    ordered, _ = greens.priority({k: specs[k] for k in keys}, state)
    assert ordered[0] == new_key


def test_failed_tier_starved_key_is_promoted():
    """A key whose last driver row FAILED and whose waiver was already
    consumed outranks the never/drift tiers (review r6 — the starved
    scan must cover every tier a consumed waiver can sit in)."""
    specs = load_all()
    keys = sorted(specs)[:3]
    never_key, failed_starved, drifted = keys
    state = {
        "greens": {
            failed_starved: {
                "round": 2,
                "fingerprint": None,
                "failed": True,
                "deferred_rounds": 1,
            },
            drifted: {"round": 1, "fingerprint": "x", "failed": False},
        },
        "force_recheck": [],
    }
    # make failed_starved's fingerprint CURRENT so it lands in tier
    # 'failed', not 'drift'
    state["greens"][failed_starved]["fingerprint"] = fingerprint(specs[failed_starved])
    ordered, _ = priority({k: specs[k] for k in keys}, state)
    assert ordered[0] == failed_starved, ordered

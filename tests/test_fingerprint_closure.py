"""Transitive-closure fingerprints (VERDICT r4 item 3).

The r1–r4 fingerprint hashed only the registered function's source, so
editing a shared helper (streaming/source.py, crosshash.py) silently
kept dependents' greens fresh unless someone remembered ``--force``.
The r5 scheme hashes the defining module plus every repo-local module
it transitively imports: editing OR deleting a helper flips every
dependent key to "edited-since-green" mechanically.
"""

from __future__ import annotations

import pytest

import tools.greens as greens

from parquet_to_hyper_app_spark.registry import load_all


@pytest.fixture()
def fake_pkg(tmp_path, monkeypatch):
    """A tiny on-disk package: a.py -> helper.py -> deep/util.py."""
    root = tmp_path / "fakepkg"
    (root / "deep").mkdir(parents=True)
    (root / "__init__.py").write_text("")
    (root / "deep" / "__init__.py").write_text("")
    (root / "a.py").write_text("from fakepkg.helper import h\n")
    (root / "helper.py").write_text("import fakepkg.deep.util\ndef h():\n    return 1\n")
    (root / "deep" / "util.py").write_text("X = 1\n")
    monkeypatch.setattr(greens, "_PKG", "fakepkg")
    monkeypatch.setattr(greens, "_PKG_ROOT", str(root))
    monkeypatch.setattr(greens, "_CLOSURE_CACHE", {})
    return root


def _closure(monkeypatch):
    monkeypatch.setattr(greens, "_CLOSURE_CACHE", {})
    return greens._module_closure("fakepkg.a")


def test_closure_reaches_transitive_helpers(fake_pkg, monkeypatch):
    mods = dict(_closure(monkeypatch))
    assert "fakepkg.a" in mods
    assert "fakepkg.helper" in mods
    assert "fakepkg.deep.util" in mods, "second-level import must be in the closure"


def test_editing_a_helper_changes_the_closure(fake_pkg, monkeypatch):
    before = _closure(monkeypatch)
    (fake_pkg / "deep" / "util.py").write_text("X = 2\n")
    after = _closure(monkeypatch)
    assert before != after


def test_deleting_a_helper_changes_the_closure(fake_pkg, monkeypatch):
    before = _closure(monkeypatch)
    (fake_pkg / "helper.py").unlink()
    after = _closure(monkeypatch)
    assert before != after
    assert "fakepkg.helper" not in dict(after)


def test_closure_includes_ancestor_packages(fake_pkg, monkeypatch):
    """Review r5: Python executes every ancestor __init__ on import (the
    root one carries real re-export code), so they are edit surface."""
    mods = dict(_closure(monkeypatch))
    assert "fakepkg" in mods, "root package __init__ must be in the closure"
    assert "fakepkg.deep" in mods, "intermediate package __init__ must be in the closure"
    (fake_pkg / "__init__.py").write_text("NEW = 1\n")
    assert dict(_closure(monkeypatch)) != mods


def test_real_keys_see_shared_plumbing():
    """The concrete r2–r4 failure modes: streaming keys must cover the
    shared streaming source helper; LSH keys must cover crosshash."""
    specs = load_all()
    lsh = dict(greens._module_closure(specs["dedup_minhash_lsh"].fn.__module__))
    assert any(m.endswith("crosshash") for m in lsh), sorted(lsh)
    stream = dict(greens._module_closure(specs["stream_tumbling"].fn.__module__))
    assert any(".streaming." in m or m.endswith(".streaming") for m in stream), sorted(stream)
    # the registry itself (decorator semantics) is always covered
    assert any(m.endswith("registry") for m in lsh)
    # ancestor packages too (root __init__ has real re-export code)
    assert "parquet_to_hyper_app_spark" in lsh


def test_migrate_restamps_only_unchanged_keys():
    specs = load_all()
    k1, k2, k3 = list(specs)[:3]
    legacy1 = greens._legacy_fingerprint(specs[k1])
    v1_closure3 = greens.fingerprint(specs[k3], _ancestors=False)
    state = {
        "greens": {
            k1: {"round": 3, "fingerprint": legacy1, "weak": False, "failed": False},
            k2: {"round": 3, "fingerprint": "0" * 16, "weak": False, "failed": False},
            k3: {"round": 4, "fingerprint": v1_closure3, "weak": False, "failed": False},
        },
        "force_recheck": [],
    }
    restamped, drifted = greens.migrate(specs, state)
    assert (restamped, drifted) == (2, 1)
    assert state["greens"][k1]["fingerprint"] == greens.fingerprint(specs[k1])
    assert state["greens"][k2]["fingerprint"] == "0" * 16  # stays hot
    assert state["greens"][k3]["fingerprint"] == greens.fingerprint(specs[k3])

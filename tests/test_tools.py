"""Unit pins for the repo tools' artifact plumbing (no Spark needed)."""

from __future__ import annotations

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_sf10_probe():
    spec = importlib.util.spec_from_file_location(
        "sf10_probe", os.path.join(REPO, "tools", "sf10_probe.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_sf10_merge_keeps_per_row_provenance(tmp_path):
    """ADVICE r12: an isolated 1-query rerun must NOT relabel prior
    non-isolated rows as isolated — provenance merges per query row."""
    mod = _load_sf10_probe()
    art = str(tmp_path / "BENCH_SF10.json")
    mod._merged_artifact(
        art, {"a": 10.0, "b": 20.0}, {"a": 2.0, "b": 3.0}, fresh=True,
        provenance={
            "a": {"isolated": False, "loadavg_before": [1.0]},
            "b": {"isolated": False, "loadavg_before": [1.0]},
        },
    )
    out = mod._merged_artifact(
        art, {"b": 18.0}, {"b": 2.9}, fresh=False,
        provenance={"b": {"isolated": True}},
    )
    assert out["provenance"]["a"] == {
        "isolated": False, "loadavg_before": [1.0]
    }
    assert out["provenance"]["b"] == {"isolated": True}
    assert out["queries"] == {"a": 10.0, "b": 18.0}
    assert "isolated" not in out  # no artifact-level flag anymore
    on_disk = json.load(open(art, encoding="utf-8"))
    assert on_disk["provenance"]["a"]["isolated"] is False


def test_sf10_merge_migrates_legacy_top_level_flag(tmp_path):
    """A pre-existing artifact with the old single top-level `isolated`
    flag: its rows inherit that flag (and the old loadavg fields) instead
    of being silently relabeled by the current run's mode."""
    mod = _load_sf10_probe()
    art = str(tmp_path / "BENCH_SF10.json")
    legacy = {
        "queries": {"a": 5.0, "b": 7.0},
        "ratios_vs_sf1": {"a": 1.5, "b": 2.5},
        "isolated": True,
        "loadavg_before": [0.5],
        "loadavg_after": [9.9],
    }
    json.dump(legacy, open(art, "w", encoding="utf-8"))
    out = mod._merged_artifact(
        art, {"c": 3.0}, {"c": 1.1}, fresh=False,
        provenance={"c": {"isolated": False, "loadavg_before": [2.0],
                          "loadavg_after": [2.1]}},
    )
    for n in ("a", "b"):
        assert out["provenance"][n]["isolated"] is True
        assert out["provenance"][n]["loadavg_before"] == [0.5]
    assert out["provenance"]["c"]["isolated"] is False
    assert set(out["queries"]) == {"a", "b", "c"}

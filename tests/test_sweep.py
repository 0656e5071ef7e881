"""Automated multi-distribution oracle sweep (VERDICT r5 ask #3).

Round 5 proved that distribution changes find bugs the fixed driver data
cannot: the exact-gap sessionize and ROUND-half-way divergences and the
zero-norm crash family were all only reachable on generator or edge
data. Until now that sweep was a manual recipe; this test automates it
so it can't rot.

Opt-in by env var because each dataset is a full bare-session driver
simulation (~3-8 min):

    SSBC_SWEEP=all        python -m pytest tests/test_sweep.py -q
    SSBC_SWEEP=edge       python -m pytest tests/test_sweep.py -q
    SSBC_SWEEP=gen-sf0.01,gen-sf0.1 ...

Each selected dataset is REGENERATED from source into a temp dir (so the
sweep always tests the generators' current output, never a stale copy),
then tools/drive_driver.py runs the full catalog-vs-DuckDB compare loop
in a subprocess — a genuinely bare SparkSession, exactly like the
external harness, unpolluted by the pytest session's confs. Results are
recorded per dataset in SWEEP.json at the repo root, the round-record
analog of CORRECTNESS_r*.json.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import tempfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SWEEP = os.environ.get("SSBC_SWEEP", "")
ALL_DATASETS = ("edge", "gen-sf0.01", "gen-sf0.1")


def _selected() -> list[str]:
    if not SWEEP:
        return []
    if SWEEP.strip().lower() == "all":
        return list(ALL_DATASETS)
    picked = [d.strip() for d in SWEEP.split(",") if d.strip()]
    unknown = set(picked) - set(ALL_DATASETS)
    if unknown:
        raise ValueError(f"unknown SSBC_SWEEP datasets {sorted(unknown)}; pick from {ALL_DATASETS}")
    return picked


def _generate(dataset: str, out_dir: str) -> None:
    if dataset == "edge":
        cmd = [sys.executable, str(REPO / "tools" / "gen_edge.py"), out_dir]
    else:
        sf = dataset[len("gen-sf"):]
        cmd = [sys.executable, str(REPO / "tools" / "gen_scale.py"), sf, out_dir]
    subprocess.run(cmd, check=True, cwd=str(REPO / "tools"), capture_output=True)


def _record(dataset: str, result: dict) -> None:
    path = REPO / "SWEEP.json"
    record = json.loads(path.read_text()) if path.exists() else {}
    record[dataset] = result
    path.write_text(json.dumps(record, indent=2, sort_keys=True) + "\n")


@pytest.mark.skipif(not SWEEP, reason="set SSBC_SWEEP=all|edge|gen-sf0.01|gen-sf0.1")
@pytest.mark.parametrize("dataset", _selected() or ["_none_"])
def test_sweep_dataset_full_catalog(dataset):
    if dataset == "_none_":
        pytest.skip("no dataset selected")
    with tempfile.TemporaryDirectory(prefix=f"ssbc_sweep_{dataset.replace('.', '_')}_") as tmp:
        data_dir = os.path.join(tmp, dataset)
        _generate(dataset, data_dir)
        env = dict(os.environ, SPARK_GRAFT_SIM_SF=data_dir)
        proc = subprocess.run(
            [sys.executable, str(REPO / "tools" / "drive_driver.py")],
            env=env, cwd=str(REPO), capture_output=True, text=True,
        )
        tail = "\n".join(proc.stdout.strip().splitlines()[-30:])
        m = re.search(r"done (\d+) queries, (\d+) mismatches, (\d+)s", proc.stdout)
        assert m, f"driver sim produced no summary line; tail:\n{tail}\n{proc.stderr[-2000:]}"
        n_queries, mismatches, seconds = map(int, m.groups())
        _record(dataset, {
            "n_queries": n_queries,
            "mismatches": mismatches,
            "seconds": seconds,
            "generated_fresh": True,
        })
        assert proc.returncode == 0 and mismatches == 0, (
            f"{dataset}: {mismatches} mismatches\n{tail}"
        )

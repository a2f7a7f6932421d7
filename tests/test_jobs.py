"""The ``ray job submit`` entrypoints run end-to-end as real CLI
subprocesses (fresh process, own Ray session — exactly the shape the job
runtime executes on a cluster head) and resume from their checkpoint dir.
"""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


def _run_module(mod: str, argv: list[str]) -> subprocess.CompletedProcess:
    env = dict(os.environ, PYTHONPATH=REPO, RAY_GRAFT_CPUS="4")
    return subprocess.run(
        [sys.executable, "-m", mod, *argv], capture_output=True,
        text=True, env=env, cwd=REPO, timeout=900)


@pytest.fixture(scope="module")
def transcripts_path():
    from capelinker_ray.pipelines.queries import ensure_transcripts
    return ensure_transcripts(SF)


def test_linkage_job_cli(tmp_path, transcripts_path):
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    p = _run_module("capelinker_ray.jobs.linkage_job",
                    ["--input", transcripts_path, "--output", out_dir,
                     "--checkpoint-dir", ckpt])
    assert p.returncode == 0, p.stderr[-2000:]
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
    summary = json.loads(line)
    assert summary["counters"]["entities"] > 0
    assert summary["counters"]["turns_out"] > 0

    ents = pq.read_table(os.path.join(out_dir, "entities"))
    assert {"conv_id", "entity_id"} <= set(ents.column_names)
    turns = pq.read_table(os.path.join(out_dir, "turns_out"))
    assert turns.num_rows == summary["counters"]["turns_out"]

    with open(os.path.join(out_dir, "metrics.json")) as f:
        metrics = json.load(f)
    # per-stage lineage records made it into the metrics sink
    stages = {r["stage"] for r in metrics["stages"]}
    assert {"conv_records", "candidate_pairs"} <= stages
    assert all("wall_seconds" in r for r in metrics["stages"])

    # resume: second submit with the same checkpoint dir skips completed
    # stages (param-hash match) and reproduces the same counters
    out2 = str(tmp_path / "out2")
    p2 = _run_module("capelinker_ray.jobs.linkage_job",
                     ["--input", transcripts_path, "--output", out2,
                      "--checkpoint-dir", ckpt])
    assert p2.returncode == 0, p2.stderr[-2000:]
    line2 = [ln for ln in p2.stdout.splitlines() if ln.startswith("{")][-1]
    assert json.loads(line2)["counters"] == summary["counters"]
    with open(os.path.join(out2, "metrics.json")) as f:
        m2 = json.load(f)
    resumed = [r for r in m2["stages"] if r.get("resumed")]
    assert resumed, "second run should resume at least one stage"


def test_curate_job_cli(tmp_path):
    out_dir = str(tmp_path / "cur")
    p = _run_module("capelinker_ray.jobs.curate_job",
                    ["--input", os.path.join(SF, "documents.parquet"),
                     "--output", out_dir, "--min-tokens", "3"])
    assert p.returncode == 0, p.stderr[-2000:]
    line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")][-1]
    stats = json.loads(line)["stats"]
    kept = pq.read_table(os.path.join(out_dir, "kept"))
    removed = pq.read_table(os.path.join(out_dir, "removed"))
    assert kept.num_rows == stats["kept"]
    assert removed.num_rows == stats["removed"]
    assert {"doc_id", "reason"} <= set(removed.column_names)

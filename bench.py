"""Benchmark harness (driver contract + scaling evidence).

Default: run the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32)`` and print ONE JSON line.

``--scaling``: run the flagship linkage job twice in FRESH subprocesses at
num_cpus=8 and num_cpus=32 on the same input and report both throughputs
(candidate pairs scored / sec) plus scaling efficiency — the sandbox
stand-in for the N vs 4N node criterion (BASELINE.md records the result).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def run_queries(sf_dir: str, num_cpus: int) -> dict:
    import ray
    import ray.data as rd

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    from capelinker_ray.pipelines.queries import (
        ensure_transcripts, q_ann_topk, q_doc_token_stats, q_lineitem_agg,
        q_minhash_dedup,
    )
    from capelinker_ray.pipelines.linkage import link_transcripts

    path = ensure_transcripts(sf_dir)
    timings: dict[str, float] = {}
    counters: dict[str, int] = {}

    # untimed warmup: spin up the Ray worker pool + import the data plane
    # in the workers so the FIRST timed query doesn't pay process-start
    # latency (the r1 driver run charged ~14 s of cold start to the
    # flagship timer)
    rd.range(10_000).map_batches(lambda b: b).count()

    stage_walls: dict[str, dict] = {}

    def walls(out) -> dict:
        """Per-stage wall seconds from the checkpoint-manager lineage
        records (BENCH evidence: ambient-load swings are attributable
        stage-by-stage without rerunning)."""
        return {r["stage"]: r["wall_seconds"] for r in out["metrics"]
                if isinstance(r, dict) and "wall_seconds" in r}

    t0 = time.monotonic()
    turns = rd.read_parquet(path)
    out = link_transcripts(turns, checkpoint_dir=None, sort_output=True)
    n_pairs = out["pairs"].count()
    n_ents = out["entities"].count()
    n_turns = out["turns_out"].count()
    timings["flagship_linkage"] = round(time.monotonic() - t0, 3)
    stage_walls["flagship_linkage"] = walls(out)
    counters["pairs_scored"] = n_pairs
    counters["entities"] = n_ents
    counters["turns_out"] = n_turns

    # the reference's DEFAULT blocking (corpus-wide bigram cosine, no
    # pre-block) driven END-TO-END through the flagship: blocker + feature
    # + scorer + selection + components (r2 verdict next-round #4)
    t0 = time.monotonic()
    out_bg = link_transcripts(turns, checkpoint_dir=None,
                              blocktype="bigram_global", maxdist=0.35,
                              sort_output=False)
    counters["bigram_global_pairs"] = out_bg["pairs"].count()
    counters["bigram_global_entities"] = out_bg["entities"].count()
    timings["flagship_bigram_global"] = round(time.monotonic() - t0, 3)
    stage_walls["flagship_bigram_global"] = walls(out_bg)

    t0 = time.monotonic()
    counters["minhash_pairs"] = q_minhash_dedup(sf_dir).count()
    timings["minhash_dedup"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    counters["token_rows"] = q_doc_token_stats(sf_dir).count()
    timings["doc_token_stats"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    counters["ann_rows"] = q_ann_topk(sf_dir).count()
    timings["ann_topk"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    q_lineitem_agg(sf_dir).count()
    timings["lineitem_agg"] = round(time.monotonic() - t0, 3)

    # relational family added in r3: shuffle joins (anti/outer), pivot,
    # per-key window — small next to the linkage pipelines but keeps the
    # sf0.1 walls of the new operators on record
    from capelinker_ray.pipelines.queries import (
        q_customers_no_orders, q_events_pivot, q_nation_revenue,
        q_user_rolling_mean)
    t0 = time.monotonic()
    counters["nation_rows"] = q_nation_revenue(sf_dir).count()
    counters["no_urgent_customers"] = q_customers_no_orders(sf_dir).count()
    counters["pivot_rows"] = q_events_pivot(sf_dir).count()
    counters["rolling_rows"] = q_user_rolling_mean(sf_dir).count()
    timings["relational_suite"] = round(time.monotonic() - t0, 3)

    from capelinker_ray.pipelines.queries import (q_bigram_candidates,
                                                  q_doc_curation)
    t0 = time.monotonic()
    counters["bigram_pairs"] = q_bigram_candidates(sf_dir).count()
    timings["bigram_candidates"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    counters["curation_removed"] = q_doc_curation(sf_dir).count()
    timings["doc_curation"] = round(time.monotonic() - t0, 3)

    ray.shutdown()
    return {"timings": timings, "counters": counters,
            "stage_walls": stage_walls}


SCALING_DIR = os.environ.get("GRAFT_SCALING_DIR", "/tmp/capelinker_scaling")
SCALING_ENTITIES = int(os.environ.get("GRAFT_SCALING_ENTITIES", "400000"))


def ensure_scaling_corpus() -> str:
    """Seeded synthetic corpus big enough to be COMPUTE-bound (the sf0.1
    tables are overhead-bound at 32 cpus — scaling measured there would
    measure Ray's fixed per-op latency, not the engine). Cached on disk;
    sharded layout like a real ingest."""
    marker = os.path.join(SCALING_DIR, "_DONE")
    tdir = os.path.join(SCALING_DIR, "transcripts")
    if not os.path.exists(marker):
        from capelinker_ray import synth
        os.makedirs(SCALING_DIR, exist_ok=True)
        # shards scale WITH entities (constant ~12.5k entities/shard) and
        # hot openers are shard-scoped: each shard has its own vocab AND
        # its own boilerplate, so blocking collisions — and with them
        # candidate pairs — stay proportional to corpus size, the way a
        # web corpus grows by adding domains rather than by densifying
        # existing ones. Unscoped global openers make pair work grow
        # quadratically (measured: 93% of 267M pairs from 5 hot blocks at
        # 1.2M entities) and the benchmark stops measuring the engine.
        # hot_frac=0.09 keeps per-shard hot blocks ~500 records — big
        # enough to be the dominant per-block cost, bounded by shard size.
        shards = max(32, SCALING_ENTITIES // 12_500)
        synth.write_corpus(SCALING_DIR, n_entities=SCALING_ENTITIES,
                           seed=42, shards=shards, hot_frac=0.09)
        with open(marker, "w") as f:
            f.write("ok")
    return tdir


def scaling_child(tdir: str, num_cpus: int) -> None:
    """Fresh-process flagship run; prints one JSON line with pairs/sec."""
    import ray
    import ray.data as rd

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    from capelinker_ray.pipelines.linkage import link_transcripts

    def _tree_cpu_seconds() -> float:
        """User+system CPU consumed by this process AND every descendant
        (raylet, object store, workers), via /proc. On a single shared box
        a low-num_cpus session still runs Ray's data plane on OTHER
        cores — cpu_seconds/wall exposes how many cores the leg REALLY
        used, which a real N-node cluster would have to provision."""
        import collections
        hz = os.sysconf("SC_CLK_TCK")
        procs: dict[int, tuple[int, int]] = {}
        for d in os.listdir("/proc"):
            if not d.isdigit():
                continue
            try:
                with open(f"/proc/{d}/stat") as f:
                    rest = f.read().rsplit(")", 1)[1].split()
            except OSError:
                continue
            # rest[1]=ppid, rest[11]=utime, rest[12]=stime (post-comm)
            procs[int(d)] = (int(rest[1]), int(rest[11]) + int(rest[12]))
        kids = collections.defaultdict(list)
        for pid, (pp, _) in procs.items():
            kids[pp].append(pid)
        total, stack = 0, [os.getpid()]
        while stack:
            p = stack.pop()
            if p in procs:
                total += procs[p][1]
                stack.extend(kids.get(p, []))
        return total / hz

    t0 = time.monotonic()
    cpu0 = _tree_cpu_seconds()
    out = link_transcripts(rd.read_parquet(tdir), checkpoint_dir=None,
                           sort_output=True)
    n_pairs = out["pairs"].count()
    out["turns_out"].count()  # drive the full pipeline
    wall = time.monotonic() - t0
    cpu = _tree_cpu_seconds() - cpu0
    stage_walls = {r["stage"]: r["wall_seconds"] for r in out["metrics"]
                   if isinstance(r, dict) and "wall_seconds" in r}
    ray.shutdown()
    print(json.dumps({"num_cpus": num_cpus, "wall": round(wall, 3),
                      "pairs": n_pairs,
                      "pairs_per_sec": round(n_pairs / wall, 2),
                      "cpu_seconds": round(cpu, 1),
                      "effective_cores": round(cpu / wall, 2),
                      "stage_walls": stage_walls}))


def run_scaling(_sf_dir: str, lo: int = 8, hi: int = 32) -> dict:
    """Same job at ``lo`` and ``hi`` cpus in fresh processes (the N vs 4N
    stand-in). Pick levels BELOW the box's memory-bandwidth wall to isolate
    engine overhead (see BASELINE.md §scaling: the string-distance kernels
    alone, no Ray, top out at ~2.3x aggregate going 8->32 procs on this
    VM — per-node bandwidth is not shared on a real multi-node cluster)."""
    tdir = ensure_scaling_corpus()
    results = {}
    for cpus in (lo, hi):
        env = dict(os.environ, PYTHONPATH=REPO)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--scaling-child",
             tdir, str(cpus)],
            capture_output=True, text=True, env=env, timeout=7200)
        line = [ln for ln in p.stdout.splitlines()
                if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)
    r_lo, r_hi = results[lo], results[hi]
    speedup = r_lo["wall"] / r_hi["wall"]
    efficiency = speedup / (hi / lo)
    return {
        f"throughput_{lo}cpu_pairs_per_sec": r_lo["pairs_per_sec"],
        f"throughput_{hi}cpu_pairs_per_sec": r_hi["pairs_per_sec"],
        f"wall_{lo}cpu": r_lo["wall"], f"wall_{hi}cpu": r_hi["wall"],
        f"speedup_{lo}_to_{hi}": round(speedup, 3),
        "scaling_efficiency": round(efficiency, 3),
        f"stage_walls_{lo}cpu": r_lo.get("stage_walls", {}),
        f"stage_walls_{hi}cpu": r_hi.get("stage_walls", {}),
        f"effective_cores_{lo}cpu": r_lo.get("effective_cores"),
        f"effective_cores_{hi}cpu": r_hi.get("effective_cores"),
        # throughput per ACTUALLY-CONSUMED core: on one shared box a
        # low-num_cpus leg still runs Ray's data plane (raylet, object
        # store, serialization) on the other cores — per-core-normalized
        # efficiency is the honest N->4N stand-in when effective cores
        # exceed the slot count
        "cpu_normalized_efficiency": (
            round((r_hi["pairs_per_sec"] / r_hi["effective_cores"])
                  / (r_lo["pairs_per_sec"] / r_lo["effective_cores"]), 3)
            if r_lo.get("effective_cores") and r_hi.get("effective_cores")
            else None),
    }


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--scaling-child":
        scaling_child(sys.argv[2], int(sys.argv[3]))
        return 0

    if len(sys.argv) > 1 and sys.argv[1] == "--scaling":
        lo = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        hi = int(sys.argv[3]) if len(sys.argv) > 3 else 32
        s = run_scaling(SF_DIR, lo, hi)
        print(json.dumps({"metric": f"scaling_efficiency_{lo}_to_{hi}_cpus",
                          "value": s["scaling_efficiency"], "unit": "ratio",
                          "queries": s, "sf": SF_DIR, "num_cpus": [lo, hi]}))
        return 0

    res = run_queries(SF_DIR, NUM_CPUS)
    total = round(sum(res["timings"].values()), 3)
    print(json.dumps({
        "metric": "headline_pipelines_total_wall",
        "value": total,
        "unit": "sec",
        "queries": res["timings"],
        "counters": res["counters"],
        "stage_walls": res["stage_walls"],
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

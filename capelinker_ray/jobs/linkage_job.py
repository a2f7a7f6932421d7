"""Flagship linkage as a ``ray job submit`` target.

    ray job submit --working-dir . -- \
        python -m capelinker_ray.jobs.linkage_job \
            --input /data/transcripts --output /out/linkage \
            --checkpoint-dir /ckpt/linkage --blocktype equality

Reads the transcript Parquet (conv_id, turn_idx, role, text, tool, ts),
runs blocking -> pairwise scoring -> selection -> connected components,
and writes partitioned Parquet: ``entities/`` (conv_id -> entity_id),
``turns_out/`` (turn-level, entity_id attached, (conv_id, turn_idx)
sorted), optional ``pairs/``; plus ``metrics.json`` holding the per-stage
lineage records (stage, params hash, input stages, rows, wall seconds)
and headline counters. Resume: re-submit with the same --checkpoint-dir —
completed stages are skipped (pipelines/checkpoint.py param-hash match).
"""

from __future__ import annotations

import argparse
import json
import os
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="capelinker-linkage",
        description="Link a transcript corpus into entity clusters.")
    p.add_argument("--input", required=True,
                   help="transcript Parquet path/dir")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--checkpoint-dir", default=None,
                   help="per-stage Parquet checkpoint dir (resume point)")
    p.add_argument("--model", default="m_boost_transcripts")
    p.add_argument("--blocktype", default="equality",
                   choices=["equality", "bigram", "stringdist",
                            "bigram_global", "idf_bigram_global"])
    p.add_argument("--maxdist", type=float, default=0.15)
    p.add_argument("--linktype", default="threshold",
                   choices=["threshold", "one:one", "many:one"])
    p.add_argument("--min-confidence", type=float, default=0.5)
    p.add_argument("--block-prefix-len", type=int, default=None)
    p.add_argument("--write-pairs", action="store_true",
                   help="also persist the scored candidate pairs")
    return p


def run(args) -> dict:
    import ray
    import ray.data as rd

    from capelinker_ray.pipelines.linkage import link_transcripts
    from capelinker_ray.sources.io import write_partitioned

    t0 = time.monotonic()
    turns = rd.read_parquet(args.input)
    out = link_transcripts(
        turns, model=args.model, checkpoint_dir=args.checkpoint_dir,
        linktype=args.linktype, minimum_confidence=args.min_confidence,
        blocktype=args.blocktype, maxdist=args.maxdist,
        block_prefix_len=args.block_prefix_len, sort_output=True)

    os.makedirs(args.output, exist_ok=True)
    write_partitioned(out["entities"], os.path.join(args.output, "entities"))
    write_partitioned(out["turns_out"], os.path.join(args.output,
                                                     "turns_out"))
    counters = {"entities": out["entities"].count(),
                "turns_out": out["turns_out"].count()}
    if args.write_pairs:
        write_partitioned(out["scored"], os.path.join(args.output, "pairs"))
        counters["pairs_scored"] = out["scored"].count()

    metrics = {
        "job": "linkage", "input": args.input, "output": args.output,
        "params": {"model": args.model, "blocktype": args.blocktype,
                   "maxdist": args.maxdist, "linktype": args.linktype,
                   "min_confidence": args.min_confidence},
        "counters": counters,
        "wall_seconds": round(time.monotonic() - t0, 3),
        "stages": out["metrics"],
    }
    with open(os.path.join(args.output, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2, default=str)
    return metrics


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import ray
    if not ray.is_initialized():
        # under `ray job submit` RAY_ADDRESS points at the cluster head;
        # standalone (or in this sandbox, where RAY_ADDRESS=local) it
        # starts a local session
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False, ignore_reinit_error=True)
    try:
        metrics = run(args)
    finally:
        ray.shutdown()
    print(json.dumps({"counters": metrics["counters"],
                      "wall_seconds": metrics["wall_seconds"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

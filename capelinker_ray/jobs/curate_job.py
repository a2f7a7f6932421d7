"""Document curation as a ``ray job submit`` target.

    ray job submit --working-dir . -- \
        python -m capelinker_ray.jobs.curate_job \
            --input /data/documents --output /out/curated \
            --checkpoint-dir /ckpt/curation --near-dup --pii-scrub

Reads the raw document Parquet, runs the full curation pipeline (quality
gates -> optional PII scrub / decontamination / perplexity gate -> exact +
near dedup -> source caps / sampling), and writes ``kept/`` (surviving
docs) and ``removed/`` (the removal ledger: doc_id, reason) as partitioned
Parquet plus ``metrics.json``. Resumable via --checkpoint-dir.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="capelinker-curate",
        description="Curate a document corpus for training data.")
    p.add_argument("--input", required=True, help="document Parquet path")
    p.add_argument("--output", required=True, help="output directory")
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--text-col", default="text")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--min-tokens", type=int, default=5)
    p.add_argument("--max-tokens", type=int, default=100_000)
    p.add_argument("--min-quality", type=float, default=0.3)
    p.add_argument("--langs", default=None,
                   help="comma-separated language whitelist")
    p.add_argument("--no-near-dup", action="store_true")
    p.add_argument("--jaccard-threshold", type=float, default=0.8)
    p.add_argument("--pii-scrub", action="store_true")
    p.add_argument("--decontam-against", default=None,
                   help="benchmark Parquet path (n-gram decontamination)")
    p.add_argument("--max-per-source", type=int, default=None)
    p.add_argument("--sample-fraction", type=float, default=None)
    p.add_argument("--max-nll", type=float, default=None,
                   help="trigram-LM perplexity gate threshold")
    return p


def run(args) -> dict:
    import ray.data as rd

    from capelinker_ray.pipelines.curate import curate_documents
    from capelinker_ray.sources.io import write_partitioned

    t0 = time.monotonic()
    docs = rd.read_parquet(args.input)
    bench = (rd.read_parquet(args.decontam_against)
             if args.decontam_against else None)
    out = curate_documents(
        docs, text_col=args.text_col, id_col=args.id_col,
        min_tokens=args.min_tokens, max_tokens=args.max_tokens,
        min_quality=args.min_quality,
        langs=args.langs.split(",") if args.langs else None,
        near_dup=not args.no_near_dup,
        jaccard_threshold=args.jaccard_threshold,
        pii_scrub=args.pii_scrub, decontam_against=bench,
        max_per_source=args.max_per_source,
        sample_fraction=args.sample_fraction, max_nll=args.max_nll,
        checkpoint_dir=args.checkpoint_dir)

    os.makedirs(args.output, exist_ok=True)
    write_partitioned(out["kept"], os.path.join(args.output, "kept"))
    write_partitioned(out["removed"], os.path.join(args.output, "removed"))
    metrics = {
        "job": "curate", "input": args.input, "output": args.output,
        "stats": out["stats"],
        "wall_seconds": round(time.monotonic() - t0, 3),
    }
    with open(os.path.join(args.output, "metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2, default=str)
    return metrics


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    import ray
    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False, ignore_reinit_error=True)
    try:
        metrics = run(args)
    finally:
        ray.shutdown()
    print(json.dumps({"stats": metrics["stats"],
                      "wall_seconds": metrics["wall_seconds"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

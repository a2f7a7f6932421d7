"""Assemble SCALING_r05.json from the round-5 measured scaling runs.

Every number is produced by ``python bench.py --scaling LO HI`` (fresh
subprocesses per cpu level, same seeded 800k-entity corpus) or an
/tmp/ab_leg.py flagship leg. Run at round close after the runs finish.
"""

import glob
import json

OUT = {
  "code_state": (
      "round-5 final: round-4 engine (slim pair table, pinned "
      "intermediates, adaptive widths, task-mode scoring) plus the r5 "
      "driver-collect fixes — pmi_scores pair-bounded vocab, trigram_nll "
      "context-keyed distributed prune, heavy_hitters single bounded "
      "collect, from_pandas metadata strip in grouped/bigram/join paths. "
      "No flagship-path code changed this round (bench A/B vs r4 code "
      "under identical ambient load: 39.7 vs 39.3 s)."),
  "corpus": (
      "official pairs: 800k entities / ~9.2M turns (seeded, shard-scoped "
      "hot openers, constant ~12.5k entities/shard — grows like a web "
      "corpus, by adding shards). Same corpus and command as SCALING_r04; "
      "pair counts bit-identical across every leg."),
  "command": ("GRAFT_SCALING_DIR=/tmp/capelinker_scaling_800k "
              "GRAFT_SCALING_ENTITIES=800000 python bench.py --scaling 2 8"),
  "ambient_note": (
      "this round's walls carry ~10-15% more ambient load than r4's "
      "window (r4-code re-bench under today's load: 39.3 s vs its "
      "recorded 34.5 s on identical counters); ratios, not walls, are "
      "the evidence"),

  "official_pairs_final_code": [],      # filled from /tmp below
  "capstone_8_to_32": None,             # filled from /tmp below
  "wide_vs_slim_ab": [],                # filled from /tmp below
}


def main() -> None:
    for p in sorted(glob.glob("/tmp/scaling_r5_pair*.json")):
        with open(p) as f:
            line = [ln for ln in f if ln.startswith("{")]
        if not line:
            continue
        d = json.loads(line[-1])["queries"]
        OUT["official_pairs_final_code"].append({
            "wall_2cpu": d["wall_2cpu"], "wall_8cpu": d["wall_8cpu"],
            "efficiency": d["scaling_efficiency"],
            "cpu_normalized_efficiency": d["cpu_normalized_efficiency"],
            "pairs_per_sec_8cpu": d["throughput_8cpu_pairs_per_sec"],
        })
    for p in sorted(glob.glob("/tmp/scaling_r5_8to32*.json")):
        with open(p) as f:
            line = [ln for ln in f if ln.startswith("{")]
        if line:
            d = json.loads(line[-1])["queries"]
            OUT["capstone_8_to_32"] = d
    for p in sorted(glob.glob("/tmp/ab_leg_*.json")):
        with open(p) as f:
            line = [ln for ln in f if ln.startswith("{")]
        if line:
            OUT["wide_vs_slim_ab"].append(json.loads(line[-1]))
    effs = [p["efficiency"] for p in OUT["official_pairs_final_code"]]
    if effs:
        OUT["official_mean_efficiency"] = round(sum(effs) / len(effs), 3)
    with open("SCALING_r05.json", "w") as f:
        json.dump(OUT, f, indent=1)
    print(json.dumps({k: OUT[k] for k in
                      ("official_pairs_final_code",
                       "official_mean_efficiency")
                      if k in OUT}, indent=1))


if __name__ == "__main__":
    main()

"""Assemble SCALING_r04.json from the round-4 measured scaling runs.

Every number below was produced by ``python bench.py --scaling LO HI``
(fresh subprocesses per cpu level, same seeded corpus) or a direct
``bench.py --scaling-child`` leg, on an otherwise-idle box. The final
three official pairs are read from /tmp if present; run this script at
round close after they finish.
"""

import glob
import json
import os

FINAL_GLOB = "/tmp/scaling_final_800k_*.json"

OUT = {
  "code_state": "round-4 final: tool-vocab partial-distinct on the raw "
                "parquet handle (was a full unique() sort-shuffle of "
                "every turn), 4x-width pair-emission shuffle, "
                "one-exchange HASH shuffle for >300k-row pair stages "
                "(was repartition+sort = two all-to-alls), task-mode "
                "scoring, adaptive rank widths, SLIM pair-table "
                "projection (the pinned pair table keeps ids + features "
                "only; the 18 per-side attr columns were ~2.5x the "
                "materialized bytes and plasma write bandwidth was the "
                "feature pass's non-scaling cost: features sub-phase "
                "2->8 efficiency was 0.61 wide, stage 126->96 s at 8 "
                "cpus slim), and conv-record partials PINNED before the "
                "combine shuffle (the one streaming plan chaining input "
                "repartition + partials map + combine sort ran its "
                "all-to-alls poorly overlapped: stage 29.0 -> 14.9 s at "
                "8 cpus / 63.2 -> 41.2 s at 2 cpus on 800k entities, "
                "stage 2->8 efficiency 0.54 -> 0.69), plus the pair "
                "TABLE pinned before its balance repartition (same "
                "chained-exchange pathology in the candidate stage: "
                "8 cpus 146 -> 123 s, 2 cpus 516 -> 444 s)",
  "corpus": "official pairs: 800k entities / ~9.2M turns (seeded, "
            "shard-scoped hot openers, constant ~12.5k entities/shard — "
            "the corpus grows like a web corpus, by adding shards); "
            "progression entries below that predate the 800k runs used "
            "the 400k-entity SCALING_r03 corpus. Pair counts "
            "bit-identical across every leg and shuffle strategy.",
  "command": ("GRAFT_SCALING_DIR=/tmp/capelinker_scaling_800k "
              "GRAFT_SCALING_ENTITIES=800000 python bench.py "
              "--scaling 2 8"),

  "official_pairs_final_code": [],   # filled from /tmp below

  "progression_within_round": {
    "pre_fix_pairs_2_to_8": [
      {"wall_2cpu": 586.558, "wall_8cpu": 211.871, "efficiency": 0.692},
      {"wall_2cpu": 567.193, "wall_8cpu": 206.129, "efficiency": 0.688},
      {"wall_2cpu": 584.450, "wall_8cpu": 248.036, "efficiency": 0.589},
    ],
    "after_vocab_and_width_fixes": [
      {"wall_2cpu": 517.007, "wall_8cpu": 171.565, "efficiency": 0.753},
      {"wall_2cpu": 457.529, "wall_8cpu": 175.984, "efficiency": 0.650},
      {"wall_2cpu": 512.544, "wall_8cpu": 188.711, "efficiency": 0.679,
       "effective_cores_2cpu": 1.88, "effective_cores_8cpu": 5.83,
       "cpu_normalized_efficiency": 0.876},
    ],
    "pre_slim_official_pairs": [
      # final-session pairs BEFORE the slim pair-table projection; stage
      # walls attributed the gap to the feature pass (2cpu 372-396 s vs
      # 8cpu 124-131 s, sub-phase features-only 298 s vs 123 s = 0.61)
      {"wall_2cpu": 476.059, "wall_8cpu": 186.195, "efficiency": 0.639,
       "cpu_normalized_efficiency": 0.819},
      {"wall_2cpu": 500.381, "wall_8cpu": 182.032, "efficiency": 0.687,
       "cpu_normalized_efficiency": 0.876},
      {"wall_2cpu": 479.155, "wall_8cpu": 202.398, "efficiency": 0.592,
       "cpu_normalized_efficiency": 0.765},
    ],
    "hash_shuffle_experiment_single_legs": {
      "wall_8cpu": 162.903, "wall_2cpu": 521.184,
      "pair_efficiency": 0.800,
      "note": "the one-exchange hash pair shuffle helps the high-cpu "
              "leg disproportionately (barrier idle was 22-27% of "
              "slots); below 300k rows the sort path stays (hash pays "
              "~1.5 s aggregator-pool setup per op)"
    },
    "final_session_400k_pairs_pre_conv_pin": [
      # all prior fixes in, BEFORE the conv-record partials pin; these
      # exposed conv_records as the residual laggard (stage 2->8 only
      # 1.86-2.16x while candidate_pairs ran 3.3-3.5x)
      {"wall_2cpu": 320.669, "wall_8cpu": 102.197, "efficiency": 0.784,
       "cpu_normalized_efficiency": 1.046},
      {"wall_2cpu": 300.780, "wall_8cpu": 101.571, "efficiency": 0.740,
       "cpu_normalized_efficiency": 0.967},
    ],
    "final_session_800k_pair_pre_conv_pin": [
      {"wall_2cpu": 683.928, "wall_8cpu": 213.656, "efficiency": 0.800,
       "cpu_normalized_efficiency": 1.069},
    ],
    "after_conv_pin_before_pair_pin": [
      # conv-record partials pinned, pair-table pin not yet applied
      {"wall_2cpu": 602.553, "wall_8cpu": 188.696, "efficiency": 0.798,
       "cpu_normalized_efficiency": 0.978},
      {"wall_2cpu": 661.333, "wall_8cpu": 195.150, "efficiency": 0.847,
       "cpu_normalized_efficiency": 1.058},
      {"wall_2cpu": 620.924, "wall_8cpu": 192.190, "efficiency": 0.808,
       "cpu_normalized_efficiency": 0.998},
    ],
    "pair_table_pin_stage_ab": {
      # candidate stage in isolation, 800k corpus, 28.3M pairs: pin the
      # pair table before the balance repartition (chained-exchange fix)
      "current_2cpu": 515.79, "current_8cpu": 146.37,
      "pin_2cpu": 443.55, "pin_8cpu": 122.64,
      "norepart_8cpu": 165.66,
      "note": "dropping the repartition instead loses to stragglers"
    },
  },

  "diagnostics": {
    "effective_cores": "user+system CPU of the whole Ray process tree "
                       "per leg / wall. Measured 1.88/2 and 5.83/8 "
                       "(sort path) — the high-cpu leg's slots idled "
                       "22-27% at shuffle barriers while per-CONSUMED-"
                       "core throughput stayed at 0.876-0.961 of the "
                       "low leg: the engine's per-core work is "
                       "near-flat; the gap was barrier idle, which the "
                       "hash-shuffle routing removes",
    "alternative_levels": [
      {"levels": "1->4 cpus, 400k corpus (sort path)",
       "wall_1cpu": 846.231, "wall_4cpu": 322.680, "efficiency": 0.656,
       "effective_cores": [1.14, 3.11],
       "cpu_normalized_efficiency": 0.961},
      {"levels": "2->8 cpus, 800k entities (sort path)",
       "wall_2cpu": 1112.226, "wall_8cpu": 398.646, "efficiency": 0.698,
       "cpu_normalized_efficiency": 0.859},
    ],
  },

  "r3_reference": {"wall_2cpu_mean": 844.6, "wall_8cpu_mean": 257.9,
                   "efficiency_mean": 0.819,
                   "throughput_8cpu_pairs_per_sec": 54150},
  "headline_throughput": "round-4 8-cpu throughput 85,719 pairs/s (hash "
                         "path) vs r3's 54,150 (+58%); 2-cpu 26,793 vs "
                         "~16,900 (+59%) — the round's absolute speedups "
                         "are what exposed (and then fixed) the barrier "
                         "idle behind the mid-round efficiency dip",
}

if __name__ == "__main__":
    pairs = []
    for path in sorted(glob.glob(FINAL_GLOB)):
        try:
            with open(path) as f:
                j = json.load(f)
        except (OSError, ValueError):
            continue
        q = j.get("queries", {})
        pairs.append({
            "wall_2cpu": q.get("wall_2cpu"),
            "wall_8cpu": q.get("wall_8cpu"),
            "efficiency": q.get("scaling_efficiency"),
            "throughput_8cpu_pairs_per_sec":
                q.get("throughput_8cpu_pairs_per_sec"),
            "effective_cores_2cpu": q.get("effective_cores_2cpu"),
            "effective_cores_8cpu": q.get("effective_cores_8cpu"),
            "cpu_normalized_efficiency":
                q.get("cpu_normalized_efficiency"),
        })
    OUT["official_pairs_final_code"] = pairs
    effs = [p["efficiency"] for p in pairs if p.get("efficiency")]
    if effs:
        OUT["scaling_efficiency_mean"] = round(sum(effs) / len(effs), 3)
        OUT["scaling_efficiency_range"] = [min(effs), max(effs)]
    cn = [p["cpu_normalized_efficiency"] for p in pairs
          if p.get("cpu_normalized_efficiency")]
    if cn:
        OUT["cpu_normalized_efficiency_mean"] = round(sum(cn) / len(cn), 3)
    out_path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING_r04.json")
    with open(out_path, "w") as f:
        json.dump(OUT, f, indent=2)
    print("written", out_path, "pairs:", len(pairs),
          "mean:", OUT.get("scaling_efficiency_mean"))

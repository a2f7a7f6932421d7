"""capelinker_ray — a Ray-Data-native record-linkage / entity-resolution engine.

A from-scratch reimplementation of the capabilities of the reference R package
``rijpma/capelinker`` (normalize → block → pairwise features → match
classifier → rank selection → transitive clustering), re-expressed as
``ray.data.Dataset`` pipelines over Arrow batches, over Parquet tables of
multi-turn conversation transcripts
(``conv_id, turn_idx, role, text, tool, ts``).

Layout:
  kernels/    pure numpy string/numeric kernels (Jaro-Winkler, OSA, soundex,
              bigram cosine, token Jaccard, ...)
  sources/    parquet readers/writers + checkpoint manifests
  stages/     Dataset → Dataset stages (normalize, conv records, blocking,
              features, scoring, selection, clustering, dedup, text stats)
  models/     from-scratch numpy gradient-boosted trees / random forest +
              frozen-artifact registry
  pipelines/  end-to-end flagship linkage pipeline with checkpoint/resume
  synth.py    deterministic synthetic transcript-corpus generator

Nothing in this package calls ``ray.init`` / ``ray.shutdown``; sessions are
owned by the caller (bench.py, tests/conftest.py, the driver).
"""

__version__ = "0.1.0"

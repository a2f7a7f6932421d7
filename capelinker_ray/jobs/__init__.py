"""Cluster job entrypoints (``ray job submit`` targets).

The production invocation shape on a real multi-node cluster::

    ray job submit --working-dir . -- \
        python -m capelinker_ray.jobs.linkage_job \
            --input s3://bucket/transcripts/ \
            --output /mnt/shared/linkage_out \
            --checkpoint-dir /mnt/shared/linkage_ckpt

Each job script OWNS its Ray session (``ray.init(address=$RAY_ADDRESS or
"auto")`` — under ``ray job submit`` the job runtime sets RAY_ADDRESS to
the cluster head; standalone it falls back to a local session), runs one
pipeline end-to-end with per-stage Parquet checkpoints, writes partitioned
Parquet outputs plus a ``metrics.json`` with per-stage lineage records,
and shuts the session down. A killed job resumes from the checkpoint dir:
completed stages are skipped by param-hash match
(``pipelines/checkpoint.py``).
"""

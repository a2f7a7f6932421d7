"""Labeling-export pipeline — ``label()`` semantics, batch-scale.

The reference's ``label()`` (/root/reference/R/label.R:43-90) samples N
candidate blocks, generates candidates at a looser ``maxdist=0.35``, computes
distances, orders pairs for human review (``persid_from``, then distance
products) and walks them interactively. The interactive loop is out of scope
(and the reference function cannot actually run: it references
``persid_from_incnd`` where it defined ``persid_from_in_cnd``, label.R:72-77
— a latent bug we do not reproduce); the batch part becomes a pipeline that
writes review-ordered candidate blocks to Parquet for an external labeling
tool, with a seeded deterministic block sample (label.R:54).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .blocking import candidates
from .features import add_pair_features

__all__ = ["export_label_batches"]


def export_label_batches(ds_records, out_path: str, *,
                         block_col: str = "block_key",
                         id_col: str = "conv_id", n_blocks: int = 50,
                         seed: int = 0, attr_cols=None,
                         sort_features=("first_textdist", "second_textdist")):
    """Sample ``n_blocks`` blocks -> candidate pairs + features -> review
    order -> partitioned Parquet at ``out_path``. Returns the pair count.

    Block selection = the ``n_blocks`` distinct keys with the SMALLEST
    splitmix64(hash(key) ^ seed) — a uniform deterministic sample computed
    as per-batch distinct + per-batch top-k (≤ n_blocks slim rows leave
    each batch) and one tiny driver merge. The distinct-key table is NEVER
    collected (at 100 TB it is itself huge — the old ``unique()`` pulled
    every block key driver-side)."""
    from .sampling import sample_hash
    from .textstats import fnv1a_64

    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        u = df[[block_col]].dropna().drop_duplicates()
        if not len(u):
            from .grouped import typed_or_empty
            return typed_or_empty(pd.DataFrame(
                {block_col: pd.Series(dtype=object),
                 "_h": pd.Series(dtype=np.uint64)}))
        keys_np = u[block_col].to_numpy()
        if pd.api.types.is_integer_dtype(u[block_col]):
            h = sample_hash(keys_np.astype(np.int64), seed)
        else:
            h = sample_hash(
                fnv1a_64([str(k) for k in keys_np]).view(np.int64), seed)
        order = np.lexsort((keys_np, h))[:n_blocks]
        return pd.DataFrame({block_col: keys_np[order], "_h": h[order]})

    cand_keys = (ds_records.select_columns([block_col])
                 .map_batches(block_topk, batch_format="pandas")
                 .to_pandas())
    cand_keys = cand_keys.drop_duplicates(block_col)
    order = np.lexsort((cand_keys[block_col].to_numpy(),
                        cand_keys["_h"].to_numpy()))
    take = min(n_blocks, len(cand_keys))
    sampled = set(cand_keys[block_col].to_numpy()[order[:take]].tolist())

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        return df[df[block_col].isin(sampled)]

    sub = ds_records.map_batches(keep, batch_format="pandas")
    pairs = candidates(sub, None, block_col=block_col, id_col=id_col,
                       attr_cols=attr_cols, keep_unmatched=False)
    feats = add_pair_features(pairs)

    def order(df: pd.DataFrame) -> pd.DataFrame:
        # review order: block, from-id, then distance product
        # (trainingdata.rmd:44 sorts by mlastdist*mfirstdist)
        prod = np.ones(len(df))
        for f in sort_features:
            prod = prod * df[f].fillna(1.0).to_numpy()
        df = df.assign(_order=prod)
        return df.sort_values(["block_key", f"{id_col}_from", "_order"],
                              kind="stable").drop(columns="_order")

    ordered = feats.map_batches(order, batch_format="pandas")
    ordered.write_parquet(out_path)
    import ray.data as rd
    return rd.read_parquet(out_path).count()

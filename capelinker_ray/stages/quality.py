"""Data-quality gate: declarative rule checking over a Dataset.

The validation pass every production ingest runs before publishing a
snapshot (the Great-Expectations shape): a dict of named boolean rules
is evaluated per batch — each batch contributes one (rule, violations,
checked) partial row per rule, fixed width regardless of rows — and ONE
tiny merge task sums them. Zero shuffle; the raw rows never leave their
batch. Rules are pandas ``DataFrame.eval`` expressions (vectorized
numexpr/C evaluation), so the SQL twin is a literal CASE-WHEN count.

Null semantics: a rule evaluating to null/NaN counts as a VIOLATION
(strict gate — unknown is not acceptable), unlike SQL's silent NULL
drop; write rules null-safe (`col == col` is the isnull guard) or rely
on the strictness, and mirror it in the oracle with
``coalesce(expr, false)``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["check_rules"]


def check_rules(ds, rules: dict, *, eval_engine: str = "python"):
    """Dataset + {name: boolean pandas-eval expression} -> Dataset[(rule,
    violations, checked)] with one row per rule. ``checked`` is the total
    row count (same for every rule); ``violations`` counts rows where the
    expression is not True (nulls violate — strict-gate semantics)."""
    if not rules:
        raise ValueError("need at least one rule")
    names = list(rules)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        viol = []
        for name in names:
            res = df.eval(rules[name], engine=eval_engine)
            ok = pd.Series(res).fillna(False).astype(bool)
            viol.append(np.int64(int((~ok).sum())))
        return pd.DataFrame({"rule": names, "violations": viol,
                             "checked": np.int64(len(df))})

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("rule", sort=True)[["violations", "checked"]]
               .sum().reset_index())
        out["violations"] = out["violations"].astype(np.int64)
        out["checked"] = out["checked"].astype(np.int64)
        return out

    parts = ds.map_batches(partial, batch_format="pandas")
    return parts.repartition(1).map_batches(merge, batch_format="pandas",
                                            batch_size=None)

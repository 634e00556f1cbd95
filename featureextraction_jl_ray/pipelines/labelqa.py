"""Composed label/score QA report — the one-call readout a training-data
pipeline runs before trusting a planted label or model score: per group,
does the score SEPARATE the classes (exact ROC-AUC), do the class
distributions DIFFER at all (exact two-sample KS), and what is the
EFFECT SIZE (Welch t, Cohen's d)?

Composition of the three metrics stages (`stages/metrics.py`), each with
its own documented scale shape (partition-prefix exchanges + sufficient
statistics); the final merge is over bounded per-group rows on the
driver.  The input projection is materialized ONCE here so the three
stages' internal passes share pinned blocks instead of re-reading the
source three times.
"""

from __future__ import annotations

import pandas as pd

__all__ = ["run_label_qa"]


def run_label_qa(
    ds,
    group_col: str,
    score_col: str,
    label_col: str,
    *,
    num_partitions: int = 64,
    num_buckets: int = 16,
    seed: int = 42,
) -> pd.DataFrame:
    """Per-group label-quality report: AUC + KS + Welch effect size.

    Returns one row per group:
    ``(group_col, n_pos, n_neg, auc, ks, mean_diff, t_welch, cohen_d)``
    — inner-merged, so only groups where every metric is defined (both
    classes present with n ≥ 2) appear.
    """
    from ..stages.metrics import ab_test_stats, group_auc, group_ks

    ds = ds.select_columns([group_col, score_col, label_col]).materialize()
    auc = group_auc(ds, group_col, score_col, label_col,
                    num_partitions=num_partitions, seed=seed)
    ks = group_ks(ds, group_col, score_col, label_col,
                  num_partitions=num_partitions, seed=seed)
    ab = ab_test_stats(ds, group_col, score_col, label_col,
                       num_buckets=num_buckets)
    out = (auc.merge(ks[[group_col, "ks"]], on=group_col, how="inner")
              .merge(ab[[group_col, "mean_diff", "t_welch", "cohen_d"]],
                     on=group_col, how="inner"))
    return out.sort_values(group_col, ignore_index=True)

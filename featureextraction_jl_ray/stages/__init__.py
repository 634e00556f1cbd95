from .asof import asof_join
from .dedup import exact_dedup, hamming_dedup, hamming_near_dup_pairs
from .joins import (anti_join, broadcast_join, bucketed_hash_join,
                    hash_join, semi_join, skew_join)
from .metrics import (ab_test_stats, calibration_bins, group_auc,
                      group_autocorr, group_ks, grouped_weighted_median,
                      inequality_stats)
from .partition import add_bucket_column, sorted_scan
from .transform import WhitenTransform, apply_pca_transform
from .window import (
    with_backfill,
    with_lag,
    with_rolling,
    with_sessionize,
    with_windows,
)

__all__ = [
    "asof_join",
    "exact_dedup",
    "hamming_dedup",
    "hamming_near_dup_pairs",
    "anti_join",
    "broadcast_join",
    "hash_join",
    "bucketed_hash_join",
    "semi_join",
    "skew_join",
    "group_auc",
    "group_autocorr",
    "group_ks",
    "grouped_weighted_median",
    "inequality_stats",
    "ab_test_stats",
    "calibration_bins",
    "add_bucket_column",
    "sorted_scan",
    "WhitenTransform",
    "apply_pca_transform",
    "with_backfill",
    "with_lag",
    "with_rolling",
    "with_sessionize",
    "with_windows",
]

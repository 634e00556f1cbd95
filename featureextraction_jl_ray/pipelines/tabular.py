"""Composed tabular feature-prep pipeline: deterministic split →
fit-on-TRAIN-only → apply-to-ALL.

This is the leakage-discipline showcase for the tabular operator
family: every fitted quantity (target encoding, scaling moments,
one-hot vocabulary) is computed from the TRAIN split alone and then
applied to all rows — fitting on rows you will evaluate on leaks the
target/statistics, exactly the tabular analog of the engine's
zero-temporal-leakage window contract.  The whole pipeline is
SQL-expressible, so the driver's DuckDB oracle verifies the stage
INTERACTIONS (split assignment feeding the fit population feeding the
transform) end-to-end, not just each stage alone.

Shape at scale: one fmix32 map for the split (zero exchange), one
partial-aggregated exchange per fitted map (bounded by category
cardinality / O(p²) moments), broadcast-probe application; the fact
table is never shuffled.  The lazy Dataset re-executes the read+split
per fit pass — at corpus scale, checkpoint the split output first and
fit from the checkpoint.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["run_feature_prep"]


def run_feature_prep(ds, *, key_col: str = "user_id",
                     cat_col: str = "event_type", value_col: str = "value",
                     fractions: dict | None = None):
    """events-like ds → (row id cols…, split, <value>_z, <cat>_te,
    one-hot <cat> columns), with every fit computed on TRAIN rows only.

    Returns (out_ds, model) where model carries the fitted pieces
    (enc table, moments, categories) for reuse on a fresh dataset.
    """
    from ..stages.encode import fit_target_encoding, target_encode
    from ..stages.scale import fit_numeric_moments, one_hot_encode, standard_scale
    from ..stages.split import hash_split

    labeled = hash_split(ds, key_col, fractions)

    def only_train(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch.column("split"), "train"))

    train = labeled.map_batches(only_train, batch_format="pyarrow",
                                zero_copy_batch=True)
    enc = fit_target_encoding(train, cat_col, value_col)
    moments = fit_numeric_moments(train, [value_col])
    categories = sorted(train.unique(cat_col))

    out = target_encode(labeled, cat_col, value_col, enc=enc)
    out = standard_scale(out, [value_col], moments)
    out = one_hot_encode(out, cat_col, categories=categories)
    model = {"enc": enc, "moments": moments, "categories": categories}
    return out, model

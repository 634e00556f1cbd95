"""CSV / JSON interchange-format readers and writers (S-family)."""

from __future__ import annotations

import shutil

import numpy as np
import pandas as pd
import pytest

from featureextraction_jl_ray.sources.io import read_table, write_table


@pytest.mark.parametrize("fmt", ["csv", "json"])
def test_interchange_roundtrip(ray_session, tmp_path, fmt):
    df = pd.DataFrame({
        "id": np.arange(100, dtype=np.int64),
        "grp": [f"g{i % 4}" for i in range(100)],
        "n": np.arange(100, dtype=np.int64) * 7,
    })
    out = str(tmp_path / f"rt_{fmt}")
    shutil.rmtree(out, ignore_errors=True)
    write_table(ray_session.data.from_pandas(df).repartition(3), out, fmt=fmt)
    back = read_table(out, fmt=fmt).to_pandas().sort_values("id",
                                                            ignore_index=True)
    pd.testing.assert_frame_equal(back[["id", "grp", "n"]], df)

    # column pruning applies post-parse
    pruned = read_table(out, fmt=fmt, columns=["id"]).to_pandas()
    assert list(pruned.columns) == ["id"]
    assert sorted(pruned.id.tolist()) == list(range(100))


def test_interchange_unsupported_fmt():
    with pytest.raises(ValueError, match="unsupported format"):
        read_table("/tmp/x", fmt="orc")

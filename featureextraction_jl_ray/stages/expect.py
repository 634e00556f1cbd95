"""Declarative data-quality expectations ("great-expectations-lite"):
a rule suite evaluated in ONE streaming pass — the contract gate a
table passes before a training run is allowed to consume it.

Rules (all vectorized Arrow kernels, evaluated per block as mergeable
(violations, evaluated) partials — the combiner pattern, so the
exchange is one row per rule per block and the driver sees one row per
rule):

  ("not_null", col)                     — value is not null
  ("unique", col)                       — no value occurs twice (global;
                                          counted via a bounded
                                          grouped-count exchange)
  ("in_range", col, lo, hi)             — lo ≤ value ≤ hi (nulls violate)
  ("in_set", col, [v, ...])             — value ∈ set (nulls violate)
  ("matches", col, pattern)             — full-match RE2 regex (nulls
                                          violate)
  ("expr", name, fn)                    — escape hatch: fn(pa.Table) →
                                          bool array, True = OK

Returns one row per rule: (rule, column, evaluated, violations,
pass_rate) — pass_rate = 1 − violations/evaluated on the exact integer
counts.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["expect"]


def _rule_key(rule) -> tuple[str, str]:
    kind = rule[0]
    name = rule[1] if isinstance(rule[1], str) else str(rule[1])
    return kind, name


def expect(ds, rules, *, num_buckets: int = 16) -> pd.DataFrame:
    """Evaluate the rule suite; see module docstring."""
    from .groupagg import grouped_aggregate

    known = {"not_null", "unique", "in_range", "in_set", "matches", "expr"}
    for r in rules:
        if r[0] not in known:
            raise ValueError(f"expect: unknown rule kind {r[0]!r} "
                             f"(known: {sorted(known)})")
    plain = [r for r in rules if r[0] != "unique"]
    uniques = [r for r in rules if r[0] == "unique"]

    def ok_mask(t: pa.Table, rule):
        kind = rule[0]
        if kind == "not_null":
            return pc.is_valid(t.column(rule[1]))
        if kind == "in_range":
            c = t.column(rule[1])
            m = pc.and_(pc.greater_equal(c, rule[2]),
                        pc.less_equal(c, rule[3]))
            return pc.coalesce(m, pa.scalar(False))
        if kind == "in_set":
            m = pc.is_in(t.column(rule[1]), value_set=pa.array(rule[2]))
            return pc.coalesce(m, pa.scalar(False))
        if kind == "matches":
            m = pc.match_substring_regex(t.column(rule[1]),
                                         f"^(?:{rule[2]})$")
            return pc.coalesce(m, pa.scalar(False))
        if kind == "expr":
            return pa.array(np.asarray(rule[2](t), dtype=bool))
        raise ValueError(f"expect: unknown rule kind {kind!r}")

    n_rules = len(plain)
    totals = np.zeros((n_rules, 2), dtype=np.int64)  # (violations, evaluated)

    if plain:
        def partial(t: pa.Table) -> pa.Table:
            out = np.empty((n_rules, 2), dtype=np.int64)
            for i, r in enumerate(plain):
                ok = ok_mask(t, r)
                n_ok = pc.sum(pc.cast(ok, pa.int64())).as_py() or 0
                out[i] = (t.num_rows - n_ok, t.num_rows)
            return pa.table({"v": pa.array(out[:, 0], type=pa.int64()),
                             "e": pa.array(out[:, 1], type=pa.int64())})

        for b in ds.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True,
            batch_size=None,
        ).iter_batches(batch_size=None, batch_format="pyarrow"):
            v = b.column("v").to_numpy(zero_copy_only=False)
            e = b.column("e").to_numpy(zero_copy_only=False)
            totals[:, 0] += v.reshape(-1, n_rules).sum(axis=0)
            totals[:, 1] += e.reshape(-1, n_rules).sum(axis=0)

    rows = []
    for i, r in enumerate(plain):
        kind, name = _rule_key(r)
        viol, ev = int(totals[i, 0]), int(totals[i, 1])
        rows.append({"rule": kind, "column": name, "evaluated": ev,
                     "violations": viol,
                     "pass_rate": 1.0 - viol / ev if ev else 1.0})

    # uniqueness needs a global view: one bounded grouped-count exchange
    # per column; the driver pull is (violating groups) rows, and the
    # violation count is Σ(count − 1) over duplicated values
    for r in uniques:
        col = r[1]
        cnt = grouped_aggregate(
            ds.select_columns([col]), col, {"__n": (col, "count")},
            num_buckets=num_buckets).to_pandas()
        if cnt.empty:  # empty input loses its schema through block elision
            ev, viol = 0, 0
        else:
            ev = int(cnt["__n"].sum())
            viol = int((cnt["__n"] - 1).clip(lower=0).sum())
        rows.append({"rule": "unique", "column": col, "evaluated": ev,
                     "violations": viol,
                     "pass_rate": 1.0 - viol / ev if ev else 1.0})

    out = pd.DataFrame(rows)
    return out.sort_values(["rule", "column"], ignore_index=True)

"""rank(method=average/min/max/first/dense, pct, na_option).

Reference parity: ``pandas/core/algorithms.py:833`` and the grouped
``group_rank`` kernel (``pandas/_libs/groupby_helper.pxi.in:414``).
All five methods compile to native Spark window expressions (no UDF):

- min    → rank()
- dense  → dense_rank()
- first  → row_number() (ties broken by natural order)
- max    → rank() + count(ties) - 1
- average→ (min_rank + max_rank) / 2

NaN handling (``algorithms.py:833`` na_option):
- 'keep'   — NaN ranks stay NaN (nulls excluded from the frame).
- 'top'    — NaNs sort first and receive the smallest ranks.
- 'bottom' — NaNs sort last and receive the largest ranks.

pct=True: divides by the row count that can actually receive a rank
(non-null count for 'keep', all rows otherwise) — EXCEPT method='dense',
where the reference divides by the number of distinct values
(``algos_rank_helper.pxi.in:192-195``), here ``size(collect_set)`` over
the partition (+1 for the NaN group under top/bottom).
"""

from __future__ import annotations

from pyspark.sql import Column, Window as W, functions as F

from .. import _internal as I


def rank_col(col: Column, method: str = "average", ascending: bool = True,
             pct: bool = False, partition_by: list | None = None,
             na_option: str = "keep") -> Column:
    if na_option not in ("keep", "top", "bottom"):
        raise ValueError(f"na_option={na_option!r}")
    part = partition_by or []
    nulls_ranked = na_option != "keep"
    # 'top' = NaNs receive the smallest ranks = first in the sort order,
    # regardless of ascending (rank counts positions in the sorted order).
    nulls_first = na_option == "top"
    if ascending:
        order = col.asc_nulls_first() if nulls_first else col.asc_nulls_last()
    else:
        order = col.desc_nulls_first() if nulls_first else col.desc_nulls_last()
    w = W.partitionBy(*part).orderBy(order)
    w_first = W.partitionBy(*part).orderBy(order, F.col(I.ORDER_COL))
    # partitionBy groups NULL keys together, so this also counts the NaN
    # tie-group when nulls are ranked.
    tie_pred = F.lit(1) if nulls_ranked else F.when(col.isNotNull(), 1)
    ties = F.count(tie_pred).over(W.partitionBy(*part, col))
    if method == "min":
        r = F.rank().over(w).cast("double")
    elif method == "dense":
        r = F.dense_rank().over(w).cast("double")
    elif method == "first":
        r = F.row_number().over(w_first).cast("double")
    elif method == "max":
        r = (F.rank().over(w) + ties - 1).cast("double")
    elif method == "average":
        r = (F.rank().over(w).cast("double") + (F.rank().over(w) + ties - 1).cast("double")) / 2.0
    else:
        raise ValueError(method)
    if pct:
        wp = W.partitionBy(*part)
        if method == "dense":
            # distinct non-null values; NaNs form one extra dense group
            denom = F.size(F.collect_set(col).over(wp)).cast("double")
            if nulls_ranked:
                has_null = F.max(F.when(col.isNull(), 1).otherwise(0)).over(wp)
                denom = denom + has_null
        elif nulls_ranked:
            denom = F.count(F.lit(1)).over(wp)
        else:
            denom = F.count(F.when(col.isNotNull(), 1)).over(wp)
        r = r / denom
    if nulls_ranked:
        return r
    return F.when(col.isNull(), F.lit(None)).otherwise(r)

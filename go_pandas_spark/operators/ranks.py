"""rank(method=average/min/max/first/dense, pct, na_option).

Reference parity: ``pandas/core/algorithms.py:833`` and the grouped
``group_rank`` kernel (``pandas/_libs/groupby_helper.pxi.in:414``).
All five methods compile to native Spark window expressions (no UDF):

- min    → rank()
- dense  → dense_rank()
- first  → row_number() (ties broken by natural order)
- max    → rank() + count(ties) - 1
- average→ (min_rank + max_rank) / 2

NaN handling: pandas leaves NaN ranks as NaN (na_option='keep') — we
exclude NULLs from the window frame via conditional and restore NULL.
"""

from __future__ import annotations

from pyspark.sql import Column, Window as W, functions as F

from .. import _internal as I


def rank_col(col: Column, method: str = "average", ascending: bool = True,
             pct: bool = False, partition_by: list | None = None) -> Column:
    part = partition_by or []
    # NULLs sort last so they never affect the rank of non-null rows;
    # we null the result out for them afterwards.
    order = col.asc_nulls_last() if ascending else col.desc_nulls_last()
    w = W.partitionBy(*part).orderBy(order)
    w_first = W.partitionBy(*part).orderBy(order, F.col(I.ORDER_COL))
    ties = F.count(F.when(col.isNotNull(), 1)).over(W.partitionBy(*part, col))
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
        n_valid = F.count(F.when(col.isNotNull(), 1)).over(W.partitionBy(*part))
        r = r / n_valid
    return F.when(col.isNull(), F.lit(None)).otherwise(r)

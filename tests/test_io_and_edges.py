"""IO round trips and semantic edge cases from the hard-parts register
(SURVEY §7): NaN group keys, keep='last' under distributed ordering,
ns truncation, query locals, weighted windows."""

from __future__ import annotations

import tempfile

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

import go_pandas_spark as gp


def test_parquet_roundtrip(spark, sf_dir):
    li = gp.read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    with tempfile.TemporaryDirectory() as d:
        gp.to_parquet(li, f"{d}/out")
        back = gp.read_parquet(spark, f"{d}/out")
        assert len(back) == len(li)
        assert back.dtypes == li.dtypes


def test_csv_roundtrip(spark, sf_dir):
    od = gp.read_parquet(spark, f"{sf_dir}/orders.parquet")[["o_orderkey", "o_totalprice", "o_orderstatus"]]
    with tempfile.TemporaryDirectory() as d:
        gp.to_csv(od, f"{d}/out")
        back = gp.read_csv(spark, f"{d}/out")
        assert len(back) == len(od)
        got = back.sort_values("o_orderkey").to_pandas()
        exp = od.sort_values("o_orderkey").to_pandas()
        assert np.allclose(got["o_totalprice"], exp["o_totalprice"])


def test_json_roundtrip(spark, sf_dir):
    ev = gp.read_parquet(spark, f"{sf_dir}/events.parquet")[["event_id", "event_type", "value"]]
    with tempfile.TemporaryDirectory() as d:
        gp.to_json(ev, f"{d}/out")
        back = gp.read_json(spark, f"{d}/out")
        assert len(back) == len(ev)


def test_json_lines_and_fwf(spark):
    with tempfile.TemporaryDirectory() as d:
        with open(f"{d}/x.fwf", "w") as f:
            f.write("alice  30\nbob    41\n")
        fw = gp.read_fwf(spark, f"{d}/x.fwf", colspecs=[(0, 7), (7, 9)], names=["name", "age"])
        pdf = fw.to_pandas()
        assert list(pdf["name"]) == ["alice", "bob"]
        assert list(pdf["age"]) == ["30", "41"]


def test_groupby_drops_nan_keys(spark):
    """pandas 0.24 always drops NaN group keys (SURVEY §3.3)."""
    pdf = pd.DataFrame({"k": ["a", None, "b", None, "a"], "v": [1.0, 2.0, 3.0, 4.0, 5.0]})
    f = gp.Frame.from_pandas(spark, pdf)
    got = f.groupby("k", as_index=False).agg(s=("v", "sum")).to_pandas()
    assert sorted(got["k"]) == ["a", "b"]
    exp = pdf.groupby("k")["v"].sum()
    assert dict(zip(got["k"], got["s"])) == exp.to_dict()


def test_dedup_keep_last_under_sort(spark):
    pdf = pd.DataFrame({"k": [1, 1, 2, 2, 2], "v": [10, 20, 30, 40, 50]})
    f = gp.Frame.from_pandas(spark, pdf)
    f = f.sort_values("v")  # order contract: ascending v
    got = f.drop_duplicates(subset=["k"], keep="last").sort_values("k").to_pandas()
    assert list(got["v"]) == [20, 50]
    got_first = f.drop_duplicates(subset=["k"], keep="first").sort_values("k").to_pandas()
    assert list(got_first["v"]) == [10, 30]


def test_ns_truncation_semantics(spark, sf_dir, duck):
    """events.ts is ns parquet; engine truncates to µs (SURVEY §1.3)."""
    ev = gp.read_parquet(spark, f"{sf_dir}/events.parquet")
    got = ev.sort_values("event_id").head(5).to_pandas()["ts"]
    exp = duck.execute(
        "SELECT make_timestamp(epoch_ns(ts)//1000) AS ts FROM events ORDER BY event_id LIMIT 5"
    ).df()["ts"]
    assert list(got.astype("datetime64[us]")) == list(exp.astype("datetime64[us]"))


def test_weighted_rolling_matches_numpy(spark):
    vals = np.array([3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0])
    pdf = pd.DataFrame({"x": vals})
    f = gp.Frame.from_pandas(spark, pdf)
    got = f.rolling(3, win_type="triang").mean(cols=["x"]).to_pandas()["x"].to_numpy()
    w = np.array([0.5, 1.0, 0.5])
    exp = np.full(len(vals), np.nan)
    for i in range(2, len(vals)):
        exp[i] = (vals[i - 2:i + 1] * w).sum() / w.sum()
    assert np.allclose(got, exp, equal_nan=True)


def test_query_locals_and_in(spark, sf_dir):
    li = gp.read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    flags = ["A", "R"]
    got = len(li.query("l_returnflag in @flags and l_quantity > @q", flags=flags, q=45))
    exp = len(li[li["l_returnflag"].isin(flags) & (li["l_quantity"] > 45)])
    assert got == exp


def test_eval_multiline_assignment(spark, sf_dir):
    li = gp.read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    out = li.eval("net = l_extendedprice * (1 - l_discount)\ndouble_net = net * 2")
    pdf = out.head(3).to_pandas()
    assert np.allclose(pdf["double_net"], pdf["net"] * 2)


def test_select_dtypes_and_filter_cols(spark, sf_dir):
    li = gp.read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    nums = li.select_dtypes(include=["number"]).columns
    assert "l_returnflag" not in nums and "l_quantity" in nums
    like = li.filter(like="ship").columns
    assert like == ["l_shipdate"]
    rx = li.filter(regex=r"^l_(tax|discount)$").columns
    assert sorted(rx) == ["l_discount", "l_tax"]
    # fuzz-caught: filter(items=) keeps the ITEMS order, not frame order
    assert li.filter(items=["l_tax", "l_quantity"]).columns == ["l_tax", "l_quantity"]
    # fuzz-caught: a bare-string dtype selector must not be iterated
    # character-by-character
    assert li.select_dtypes(include="number").columns == nums
    excl = li.select_dtypes(exclude="number").columns
    assert "l_quantity" not in excl and "l_returnflag" in excl


def test_reindex_numpy_labels(spark):
    # fuzz-caught: np.int64 labels broke createDataFrame inference
    pdf = pd.DataFrame({"rid": np.arange(5, dtype="int64"),
                        "v": [1.0, 2.0, np.nan, 4.0, 5.0]})
    f = gp.Frame.from_pandas(spark, pdf).set_index("rid")
    labels = np.array([3, 0, 7], dtype="int64")
    got = f.reindex(index=list(labels), fill_value=-1.0).to_pandas()
    exp = pdf.set_index("rid").reindex(labels, fill_value=-1.0)
    assert np.allclose(got["v"].to_numpy(), exp["v"].to_numpy(), equal_nan=True)


def test_series_apply_pandas_udf(spark, sf_dir):
    li = gp.read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    got = li.assign(q2=li["l_quantity"].apply(lambda x: x * 2 + 1)).head(5).to_pandas()
    assert np.allclose(got["q2"], got["l_quantity"] * 2 + 1)


def test_frame_applymap(spark):
    pdf = pd.DataFrame({"a": [1.0, 2.0], "b": [3.0, 4.0]})
    f = gp.Frame.from_pandas(spark, pdf)
    got = f.applymap(lambda x: x * 10).to_pandas()
    assert np.allclose(got.to_numpy(), pdf.to_numpy() * 10)


def test_corrwith(spark, sf_dir):
    li = gp.read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    a = li[["l_quantity", "l_extendedprice"]]
    b = li.assign(l_quantity=li["l_quantity"] * 2,
                  l_extendedprice=-li["l_extendedprice"])[["l_quantity", "l_extendedprice"]]
    r = a.corrwith(b)
    assert abs(r["l_quantity"] - 1.0) < 1e-9
    assert abs(r["l_extendedprice"] + 1.0) < 1e-9


def test_searchsorted_and_asof(spark):
    pdf = pd.DataFrame({"x": [1.0, 3.0, 5.0, 7.0]})
    f = gp.Frame.from_pandas(spark, pdf)
    assert f["x"].searchsorted([0.0, 4.0, 9.0]) == [0, 2, 4]


def test_transpose_small_guard(spark, sf_dir):
    li = gp.read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    with pytest.raises(ValueError):
        li.transpose_small(limit=10)
    t = li.head(3).transpose_small()
    assert t.shape[1] == 3


def test_sql_roundtrip_sqlite(spark, sf_dir, tmp_path):
    """to_sql/read_sql via the sqlite driver-side path (reference
    io/sql.py is single-node too); JDBC remains the distributed path."""
    import go_pandas_spark as gp

    db = str(tmp_path / "t.db")
    na = gp.read_parquet(spark, f"{sf_dir}/nation.parquet")
    gp.to_sql(na, "nation", db)
    back = gp.read_sql(spark, "SELECT * FROM nation WHERE n_regionkey = 2", db)
    exp = na[na["n_regionkey"] == 2].to_pandas().sort_values("n_nationkey")
    got = back.to_pandas().sort_values("n_nationkey")
    assert list(got["n_name"]) == list(exp["n_name"])
    # if_exists guard mirrors pandas
    import pytest as _pt
    with _pt.raises(ValueError):
        gp.to_sql(na, "nation", db)
    gp.to_sql(na, "nation", db, if_exists="replace")


def test_feather_roundtrip(spark, sf_dir):
    import tempfile, os
    od = gp.read_parquet(spark, f"{sf_dir}/orders.parquet")[
        ["o_orderkey", "o_totalprice", "o_orderstatus"]]
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "o.feather")
        gp.to_feather(od, p)
        back = gp.read_feather(spark, p)
        assert len(back) == len(od)
        got = back.sort_values("o_orderkey").to_pandas()
        exp = od.sort_values("o_orderkey").to_pandas()
        assert np.allclose(got["o_totalprice"], exp["o_totalprice"])


def test_orc_roundtrip_pruned(spark, sf_dir):
    """Distributed ORC sink + scan; column pruning reaches the reader."""
    import tempfile, os
    od = gp.read_parquet(spark, f"{sf_dir}/orders.parquet")[
        ["o_orderkey", "o_totalprice", "o_orderstatus"]]
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "o.orc")
        gp.to_orc(od, p)
        back = gp.read_orc(spark, p, columns=["o_orderkey", "o_totalprice"])
        assert len(back) == len(od)
        got = back.sort_values("o_orderkey").to_pandas()
        exp = od.sort_values("o_orderkey").to_pandas()
        assert np.allclose(got["o_totalprice"], exp["o_totalprice"])
        plan = back.to_spark()._jdf.queryExecution().executedPlan().toString()
        assert "o_orderstatus" not in plan  # pruned out of the ORC scan


def test_to_records(spark, sf_dir):
    od = gp.read_parquet(spark, f"{sf_dir}/region.parquet")
    rec = gp.to_records(od)
    assert rec.dtype.names is not None and len(rec) == len(od)


def test_insert_positional(spark):
    import pandas as pd
    pdf = pd.DataFrame({"a": [1, 2], "b": [3, 4]})
    f = gp.Frame.from_pandas(spark, pdf)
    f.insert(1, "z", f["a"] * 10)
    assert f.columns == ["a", "z", "b"]
    assert f.to_pandas()["z"].tolist() == [10, 20]


def test_secondary_sinks_and_scalars(spark, sf_dir):
    import pandas as pd
    od = gp.read_parquet(spark, f"{sf_dir}/region.parquet")
    tex = gp.to_latex(od)
    html = gp.to_html(od)
    assert "tabular" in tex and "<table" in html
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "r.pkl")
        gp.to_pickle(od, p)
        back = gp.read_pickle(spark, p)
        assert len(back) == len(od)
    # sample(n=)
    li = gp.read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    assert len(li.sample(n=17, seed=1)) == 17
    # at / idxmin / idxmax
    odi = gp.read_parquet(spark, f"{sf_dir}/orders.parquet")[
        ["o_orderkey", "o_totalprice"]].set_index("o_orderkey")
    pdf = odi.reset_index().to_pandas().set_index("o_orderkey")
    k = int(pdf.index[3])
    assert odi.at(k, "o_totalprice") == pdf.loc[k, "o_totalprice"]
    assert odi["o_totalprice"].idxmax() == pdf["o_totalprice"].idxmax()
    assert odi["o_totalprice"].idxmin() == pdf["o_totalprice"].idxmin()


def test_read_csv_pandas_conventions(spark, tmp_path):
    import pandas as pd

    p = str(tmp_path / "t.csv")
    pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]}).to_csv(p, index=False)
    f = gp.read_csv(spark, p, header=0)          # pandas: row 0 is the header
    assert f.columns == ["a", "b"] and len(f) == 3
    assert len(gp.read_csv(spark, p, nrows=2)) == 2


def test_read_csv_header_false_and_none(spark, tmp_path):
    """header=False must NOT equal header=0 (`False == 0` in Python):
    False/None mean headerless — the first data row survives."""
    import pandas as pd
    import pytest

    p = str(tmp_path / "nh.csv")
    pd.DataFrame({"a": [1, 2, 3]}).to_csv(p, index=False, header=False)
    for h in (False, None):
        f = gp.read_csv(spark, p, header=h, names=["a"])
        assert len(f) == 3, f"header={h} consumed a data row"
        assert sorted(f.to_pandas()["a"].tolist()) == [1, 2, 3]
    with pytest.raises(NotImplementedError):
        gp.read_csv(spark, p, header=2)


def test_any_all_with_date_columns(spark):
    """any()/all() on frames containing date/timestamp columns: treated
    truthy-when-non-null, no DATE→DOUBLE AnalysisException."""
    import datetime

    import pandas as pd

    pdf = pd.DataFrame({
        "d": [datetime.date(2020, 1, 1), None, datetime.date(2020, 1, 3)],
        "x": [0.0, 1.0, 2.0],
    })
    f = gp.Frame.from_pandas(spark, pdf)
    assert f.any() == {"d": True, "x": True}
    assert f.all() == {"d": True, "x": False}


def test_groupby_level_name(spark):
    """groupby(level='k') with a string level name (pandas-valid) must
    resolve the named index level, not iterate the string."""
    import pandas as pd

    pdf = pd.DataFrame({"k": ["a", "b", "a", "b"], "v": [1.0, 2.0, 3.0, 4.0]})
    f = gp.Frame.from_pandas(spark, pdf).set_index("k")
    got = f.groupby(level="k").agg(s=("v", "sum")).to_pandas().sort_values("k")
    assert got["s"].tolist() == [4.0, 6.0]
    import pytest

    with pytest.raises(KeyError):
        f.groupby(level="nope")


def test_reindex_align_duplicate_axis_raises(spark):
    """pandas 'cannot reindex from a duplicate axis' parity: duplicate
    index labels must raise, not silently fan out rows."""
    import pandas as pd
    import pytest

    pdf = pd.DataFrame({"k": ["a", "a", "b"], "v": [1.0, 2.0, 3.0]})
    f = gp.Frame.from_pandas(spark, pdf).set_index("k")
    with pytest.raises(ValueError, match="duplicate axis"):
        f.reindex(index=["a", "b"])
    ok = gp.Frame.from_pandas(
        spark, pd.DataFrame({"k": ["a", "b"], "v": [9.0, 8.0]})).set_index("k")
    with pytest.raises(ValueError, match="duplicate axis"):
        f.align(ok)
    with pytest.raises(ValueError, match="duplicate axis"):
        ok.align(f)


def test_frame_asof_matches_pandas(spark):
    """Frame.asof: last row at/before `where` whose subset columns are
    all non-null (generic.py:6508), multi-partition safe."""
    import numpy as np
    import pandas as pd

    n = 300
    pdf = pd.DataFrame({"a": np.arange(n, dtype=float), "b": np.arange(n, dtype=float) * 2})
    pdf.loc[pdf.index % 3 == 1, "a"] = np.nan
    f = gp.Frame(spark.createDataFrame(pdf.assign(k=range(n))).repartition(8)).sort_values("k")
    f = f[["a", "b"]]
    for where in [0, 7, 150, 299]:
        exp = pdf.asof(where, subset=["a"])
        got = f.asof(where, subset=["a"])
        assert got["a"] == exp["a"] and got["b"] == exp["b"], (where, got, dict(exp))
    multi = f.asof([7, 150], subset=["a"])
    assert [m["a"] for m in multi] == [pdf.asof(7, subset=["a"])["a"],
                                       pdf.asof(150, subset=["a"])["a"]]


def test_testing_assert_frame_equal(spark):
    """gp.testing mirrors pandas.testing (reference util/testing.py:1241):
    green on equal frames, AssertionError with pandas' diff otherwise."""
    import pandas as pd
    import pytest

    pdf = pd.DataFrame({"a": [1.0, 2.0], "b": ["x", "y"]})
    f = gp.Frame.from_pandas(spark, pdf)
    gp.testing.assert_frame_equal(f, pdf)
    gp.testing.assert_frame_equal(f, pdf[["b", "a"]], check_like=True)
    gp.testing.assert_series_equal(f["a"], pdf["a"])
    with pytest.raises(AssertionError):
        gp.testing.assert_frame_equal(f, pdf.assign(a=[1.0, 3.0]))
    # approximate compare tolerates float noise
    gp.testing.assert_frame_equal(f, pdf.assign(a=[1.0 + 1e-12, 2.0]))


def test_options_registry(spark):
    """get/set/reset/option_context (reference core/config.py): gates
    how many rows to_string pulls to the driver."""
    import pytest

    pdf = __import__("pandas").DataFrame({"a": range(100)})
    f = gp.Frame.from_pandas(spark, pdf)
    assert gp.get_option("display.max_rows") == 60
    with gp.option_context("display.max_rows", 3):
        assert len(f.to_string().splitlines()) == 4  # header + 3 rows
    assert gp.get_option("display.max_rows") == 60
    gp.set_option("display.max_rows", 5)
    assert len(f.to_string().splitlines()) == 6
    gp.reset_option("display.max_rows")
    with pytest.raises(Exception):
        gp.set_option("display.nope", 1)


def test_spark_native_controls(spark):
    """Engine-extension passthroughs: explain/persist/cache/unpersist/
    npartitions/repartition — pipeline controls the eager reference
    has no analog for."""
    import pandas as pd

    f = gp.Frame.from_pandas(spark, pd.DataFrame({"a": range(10), "k": [0, 1] * 5}))
    f2 = f.repartition(4)
    assert f2.npartitions == 4
    assert len(f2) == 10 and sorted(f2.to_pandas()["a"]) == list(range(10))
    f3 = f.repartition(2, "k")
    assert f3.npartitions == 2
    f.cache()
    assert len(f) == 10
    f.unpersist()
    f.explain("simple")  # smoke: prints, must not raise


def test_sql_frontend(spark, sf_dir):
    """gp.register + gp.sql: full Spark SQL over engine frames."""
    na = gp.read_parquet(spark, f"{sf_dir}/nation.parquet")
    gp.register(na, "nation_v")
    out = gp.sql(
        "SELECT n_regionkey, COUNT(*) AS n FROM nation_v "
        "GROUP BY n_regionkey ORDER BY n_regionkey", spark)
    exp = na.to_pandas().groupby("n_regionkey").size()
    assert out.to_pandas()["n"].tolist() == exp.tolist()
    fi = na.set_index("n_name")
    gp.register(fi, "nation_i")
    one = gp.sql("SELECT n_name FROM nation_i WHERE n_nationkey = 0", spark)
    assert one.to_pandas()["n_name"].tolist() == ["NATION_0"]


@pytest.mark.parametrize("n", [0, 1])
def test_empty_and_single_row_battery(spark, n):
    """fuzz-battery: every core op must survive 0- and 1-row frames
    (from_pandas builds the schema from dtypes when inference has no
    rows) with pandas-matching row counts."""
    pdf = pd.DataFrame({"k": pd.Series(["a"] * n, dtype=object),
                        "v": pd.Series([1.5] * n, dtype="float64"),
                        "w": pd.Series([1] * n, dtype="int64")})
    f = gp.Frame.from_pandas(spark, pdf)
    assert f.dtypes["v"] == "double" and f.dtypes["w"] == "bigint"
    assert len(f.groupby("k").agg(s=("v", "sum")).to_pandas()) == n
    assert len(f[["v"]].rolling(2).mean().to_pandas()) == n
    assert len(f.sort_values("v").to_pandas()) == n
    assert len(f.drop_duplicates().to_pandas()) == n
    assert len(f[["v"]].cumsum().to_pandas()) == n
    assert len(f[["v"]].rank().to_pandas()) == n
    assert len(f.fillna(0).to_pandas()) == n
    assert len(gp.concat([f, f]).to_pandas()) == 2 * n
    assert len(gp.merge(f, f, on="k").to_pandas()) == n
    assert len(f.nlargest(3, "v").to_pandas()) == n
    assert len(f.melt(id_vars=["k"]).to_pandas()) == 2 * n
    assert len(f[["v"]].diff().to_pandas()) == n
    assert len(f.pivot_table(index="k", columns="w", values="v").to_pandas()) == n


def test_melt_mixed_dtype_value_vars(spark):
    """fuzz-caught: stack() rejects mixed value types — numerics melt
    to double, mixed other to string (pandas: float64/object)."""
    pdf = pd.DataFrame({"k": ["a", "b"], "v": [1.5, 2.5], "w": [10, 20]})
    f = gp.Frame.from_pandas(spark, pdf)
    got = f.melt(id_vars=["k"]).to_pandas()
    exp = pdf.melt(id_vars=["k"])
    assert len(got) == len(exp) == 4
    assert sorted(got["value"].tolist()) == sorted(float(x) for x in exp["value"])
    pdf2 = pd.DataFrame({"k": ["a"], "v": [1.5], "s": ["txt"]})
    got2 = gp.Frame.from_pandas(spark, pdf2).melt(id_vars=["k"]).to_pandas()
    assert sorted(got2["value"].tolist()) == ["1.5", "txt"]


def test_empty_battery_round2(spark):
    """Empty-frame battery 2: Series reductions, reshape, time ops,
    asof with an empty right side, cut with int bins."""
    pdf = pd.DataFrame({"k": pd.Series(dtype=object),
                        "v": pd.Series(dtype="float64"),
                        "t": pd.Series(dtype="datetime64[us]")})
    f = gp.Frame.from_pandas(spark, pdf)
    assert pd.isna(f["v"].mean()) and f["v"].count() == 0
    assert len(f["k"].value_counts()) == 0 and len(f["k"].unique()) == 0
    assert len(f[["v"]].stack().to_pandas()) == 0
    assert len(f.resample("1h", on="t").mean().to_pandas()) == 0
    assert len(f.rolling("1h", on="t").mean(cols=["v"]).to_pandas()) == 0
    assert len(gp.cut(f["v"], bins=3).to_pandas()) == 0
    assert f.nunique()["v"] == 0 and f[["v"]].idxmin()["v"] is None
    left = gp.Frame.from_pandas(spark, pd.DataFrame({"t": [1, 2]}))
    right = gp.Frame.from_pandas(
        spark, pd.DataFrame({"t": pd.Series(dtype="int64"),
                             "rv": pd.Series(dtype="float64")}))
    out = gp.merge_asof(left, right, on="t").to_pandas()
    assert len(out) == 2 and out["rv"].isna().all()


def test_read_binary_files_glob_recursive_and_pruning(spark, tmp_path):
    """binaryFile source: glob filter + recursive lookup, and a
    metadata-only projection must NOT read the content column (column
    pruning reaches the scan)."""
    import os

    from go_pandas_spark.sources.io import read_binary_files

    (tmp_path / "sub").mkdir()
    (tmp_path / "a.ppm").write_bytes(b"P6 2 2 255 " + b"\x00" * 12)
    (tmp_path / "b.txt").write_bytes(b"hello")
    (tmp_path / "sub" / "c.ppm").write_bytes(b"P6 1 1 255 " + b"\x00" * 3)

    f = read_binary_files(spark, str(tmp_path), glob="*.ppm", recursive=True)
    rows = f.to_spark().select("path", "length", "content").collect()
    assert sorted((os.path.basename(r["path"]), r["length"]) for r in rows) \
        == [("a.ppm", 23), ("c.ppm", 14)]
    assert all(r["content"].startswith(b"P6") for r in rows)
    # non-recursive without glob sees only top-level files
    top = read_binary_files(spark, str(tmp_path)).to_spark().collect()
    assert sorted(os.path.basename(r["path"]) for r in top) == ["a.ppm", "b.txt"]
    # metadata projection prunes the content column out of the scan
    plan = (read_binary_files(spark, str(tmp_path), glob="*.ppm")
            .to_spark().select("path", "length")
            ._jdf.queryExecution().executedPlan().toString())
    assert "content" not in plan

"""Session-storage lifecycle (r10): the engine's three registries —
pin_order persists, the distwindow driver-table memo, the dedup
gram/signature caches — must be releasable at a query boundary via
``go_pandas_spark.clear_cache()``, and the memo must be a bounded LRU
with NaN-canonical keys. SCALE.md "Session storage budget" documents
the byte model these tests pin."""
from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

import go_pandas_spark as gp
from go_pandas_spark import _internal as I
from go_pandas_spark.operators import distwindow as dw


def _chained_cumsum_shift(spark, pdf):
    f = gp.Frame(spark.createDataFrame(pdf).repartition(8)).sort_values("k")
    return f.cumsum().shift(2).to_pandas()  # to_pandas keeps frame order


def test_clear_cache_releases_pins_and_parity_survives(spark):
    """clear_cache unpersists every pin_order entry and empties the
    registries; re-running the same chained blocked query afterwards
    rebuilds its pins and stays exact (the barrier contract: clear at
    a query boundary, never mid-plan)."""
    pdf = pd.DataFrame({"k": np.arange(500.0), "v": np.arange(500.0) * 0.5})
    exp = pdf.sort_values("k").reset_index(drop=True)
    exp_v = exp[["k", "v"]].cumsum().shift(2)

    out1 = _chained_cumsum_shift(spark, pdf)
    assert len(I._PINNED) > 0  # the chain consumed at least one pin
    pinned = list(I._PINNED.values())

    dropped = gp.clear_cache()
    assert dropped["pins"] == len(pinned)
    assert not I._PINNED and not dw._LOCAL_TBLS
    for df in pinned:
        assert df.storageLevel.useMemory is False  # actually unpersisted

    out2 = _chained_cumsum_shift(spark, pdf)
    for out in (out1, out2):
        np.testing.assert_allclose(out["v"], exp_v["v"], rtol=1e-12)
    assert len(I._PINNED) > 0  # pins rebuilt on demand after the clear


def test_memo_table_nan_and_negzero_keys(spark):
    """NaN-bearing carry tables HIT the memo (canonical sentinel —
    NaN != NaN tuple equality previously missed every run, regrowing
    the dict and leaking one pin per kernel per run), while -0.0 and
    +0.0 tables stay DISTINCT (Python hashes them equal; a -0.0 carry
    must not alias +0.0 — division-sign semantics)."""
    gp.clear_cache()
    schema = "b int, tot double"
    nan_rows = [(0, float("nan")), (1, 2.5)]
    a = dw._memo_table(spark, nan_rows, schema)
    b = dw._memo_table(spark, [(0, float("nan")), (1, 2.5)], schema)
    assert a is b

    z = dw._memo_table(spark, [(0, 0.0)], schema)
    nz = dw._memo_table(spark, [(0, -0.0)], schema)
    assert z is not nz
    assert math.copysign(1.0, nz.collect()[0]["tot"]) < 0


def test_memo_table_lru_bound(spark):
    """The memo is size-capped: inserting past _LOCAL_TBLS_MAX evicts
    the least-recently-used entry instead of growing without bound."""
    gp.clear_cache()
    schema = "b int, tot double"
    first = dw._memo_table(spark, [(0, 123456.0)], schema)
    for i in range(dw._LOCAL_TBLS_MAX + 5):
        dw._memo_table(spark, [(1, float(i))], schema)
    assert len(dw._LOCAL_TBLS) <= dw._LOCAL_TBLS_MAX
    # the first entry was least-recently-used -> evicted -> a rebuild
    # returns a NEW DataFrame object (correctness unaffected)
    again = dw._memo_table(spark, [(0, 123456.0)], schema)
    assert again is not first
    gp.clear_cache()


def test_frame_shift_fill_value_beyond_edge_only(spark):
    """Frame.shift(fill_value=) (r10): fills ONLY positions shifted in
    from beyond the frame edge; genuine data NaNs pass through — the
    pandas 0.24 generic.py contract, via the blocked kernel's edge
    probe."""
    rng = np.random.RandomState(7)
    v = rng.normal(0, 3, 400)
    v[rng.random(400) < 0.15] = np.nan
    pdf = pd.DataFrame({"k": np.arange(400.0), "v": v})
    f = gp.Frame(spark.createDataFrame(pdf).repartition(8)).sort_values("k")
    for p in (3, -5):
        out = f[["v"]].shift(p, fill_value=-9.25).to_pandas()
        exp = pdf["v"].shift(p, fill_value=-9.25)
        np.testing.assert_allclose(out["v"], exp, rtol=1e-12)
        # data NaNs survived (only beyond-edge positions got the fill)
        assert out["v"].isna().sum() == exp.isna().sum() > 0


def test_rank_multi_column_chain_parity(spark):
    """Multi-column Frame.rank pins between per-column passes (r10,
    ADVICE r9: O(K²) build re-execution without it) — values must stay
    exact across the pinned chain."""
    rng = np.random.RandomState(11)
    pdf = pd.DataFrame({
        "a": rng.randint(0, 40, 600).astype(float),
        "b": rng.normal(0, 1, 600),
        "c": rng.randint(0, 5, 600).astype(float),
    })
    pdf.loc[rng.random(600) < 0.1, "b"] = np.nan
    f = gp.Frame(spark.createDataFrame(pdf.reset_index().rename(
        columns={"index": "k"})).repartition(8)).sort_values("k")
    out = f[["a", "b", "c"]].rank(method="average", pct=True).to_pandas()
    exp = pdf.rank(method="average", pct=True)
    for c in ("a", "b", "c"):
        np.testing.assert_allclose(out[c], exp[c], rtol=1e-12)


def test_int64_overflow_cum_wraps_like_pandas(spark):
    """r10 overflow family pin: driver-folded integer sum carries wrap
    two's-complement (_wrap_i64) — int64 cum* past 2^63 matches
    numpy/pandas bit-for-bit on both the frame kernel and the Series
    literal path instead of crashing the int64 literal ship."""
    big = 2 ** 62
    pdf = pd.DataFrame({
        "rid": np.arange(8, dtype="int64"),
        "x": np.array([big, big, big, -big, big, big, big, big],
                      dtype="int64"),
    })
    f = gp.Frame.from_pandas(spark, pdf).repartition(4).sort_values("rid")
    exp = pdf["x"].cumsum()
    out = f[["x"]].cumsum().to_pandas()
    assert list(out["x"]) == list(exp) and str(out["x"].dtype) == "int64"
    s = f.assign(cs=f["x"].cumsum()).to_pandas()
    assert list(s["cs"]) == list(exp)
    g = f.assign(k=f["rid"] % 2).groupby("k", as_index=False).agg(
        s=("x", "sum")).to_pandas().sort_values("k")
    ge = pdf.assign(k=pdf["rid"] % 2).groupby("k")["x"].sum()
    assert list(g["s"]) == list(ge)


def test_clear_cache_warns_on_live_blocked_frame(spark):
    """The barrier misuse guard (r11): calling clear_cache while a
    blocked-output frame is still alive warns (its un-collected plan
    may reference a pin whose ids would shift); force=True and
    frames-dropped are both silent."""
    import warnings

    gp.clear_cache(force=True)
    pdf = pd.DataFrame({"k": np.arange(300.0), "v": np.arange(300.0)})
    f = gp.Frame(spark.createDataFrame(pdf).repartition(4)).sort_values("k")
    live = f.cumsum().shift(1)  # blocked output, never collected
    with pytest.warns(RuntimeWarning, match="blocked-output frame"):
        gp.clear_cache()
    live2 = f.cumsum().shift(1)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        gp.clear_cache(force=True)  # acknowledged -> silent
    del live, live2
    f2 = f.cumsum().shift(1)
    out = f2.to_pandas()  # collected; user still holds f2, warns
    exp = pdf.sort_values("k")[["k", "v"]].cumsum().shift(1)
    np.testing.assert_allclose(out["v"], exp["v"], rtol=1e-12)
    del f2
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        gp.clear_cache()  # no live blocked frames -> silent


def test_pinned_lru_bounded_without_barrier(spark, monkeypatch):
    """_PINNED self-bounds (r11): a DIVERSE no-barrier query stream —
    each query a distinct plan, its frame dropped after collection —
    keeps the registry at <= _PINNED_MAX + the in-flight query's own
    pins (eviction fires at the next query's first pin, once the
    previous chain's frames are dropped), and the evicted pins are
    actually released."""
    gp.clear_cache(force=True)
    monkeypatch.setattr(I, "_PINNED_MAX", 4)
    pdf = pd.DataFrame({"k": np.arange(200.0), "v": np.arange(200.0)})
    base = gp.Frame(spark.createDataFrame(pdf).repartition(4)) \
        .sort_values("k")
    seen: list = []
    for i in range(7):
        f = (base.assign(v=base["v"] * float(i + 1))
             .cumsum().shift(1))  # distinct plan per i -> distinct pin
        f.to_pandas()
        seen.extend(I._PINNED.values())
        del f
        # bounded: cap + this chain's own two pins, never cumulative
        assert len(I._PINNED) <= I._PINNED_MAX + 2
    # at least one eviction happened and evicted pins are unpersisted
    evicted = [df for df in seen if df.semanticHash() not in I._PINNED]
    assert evicted
    assert any(df.storageLevel.useMemory is False for df in evicted)
    gp.clear_cache()


def test_pinned_eviction_defers_while_blocked_frame_live(spark,
                                                         monkeypatch):
    """Eviction never unpersists a possibly-live pin: while any
    blocked-output frame is alive the registry may exceed the cap;
    the next pin after the frames die shrinks it back."""
    gp.clear_cache(force=True)
    monkeypatch.setattr(I, "_PINNED_MAX", 2)
    pdf = pd.DataFrame({"k": np.arange(150.0), "v": np.arange(150.0)})
    base = gp.Frame(spark.createDataFrame(pdf).repartition(4)) \
        .sort_values("k")
    held = []
    for i in range(4):
        f = base.assign(v=base["v"] + float(i)).cumsum().shift(1)
        f.to_pandas()
        held.append(f)  # keep every blocked frame alive
    del f  # the loop variable itself also pins liveness
    peak = len(I._PINNED)
    assert peak > I._PINNED_MAX  # deferred, not evicted
    held.clear()
    trigger = base.assign(v=base["v"] * 101.0).cumsum().shift(1)
    trigger.to_pandas()
    del trigger
    # drained to the documented bound: cap + the trigger's own pins
    assert len(I._PINNED) <= I._PINNED_MAX + 2 < peak
    gp.clear_cache()


def test_rank_keeps_interim_pins_on_unpinned_base(spark):
    """Frame.rank releases its interim per-column pins only when the
    base is itself pinned (r11, ADVICE r10): from an unpinned lazy
    scan the replay could reassign order ids, so the pins stay until
    the barrier — and parity holds either way."""
    gp.clear_cache(force=True)
    rng = np.random.RandomState(3)
    pdf = pd.DataFrame({
        "a": rng.randint(0, 10, 300).astype(float),
        "b": rng.randint(0, 10, 300).astype(float),
        "c": rng.randint(0, 10, 300).astype(float),
    })
    f = gp.Frame(spark.createDataFrame(pdf.reset_index().rename(
        columns={"index": "k"})).repartition(4)).sort_values("k")
    # unpinned base: ties under method='first' break by order id, the
    # exact case the conservative release protects
    out = f[["a", "b", "c"]].rank(method="first").to_pandas()
    exp = pdf.rank(method="first")
    for c in ("a", "b", "c"):
        np.testing.assert_allclose(out[c], exp[c], rtol=1e-12)
    assert len(I._PINNED) >= 2  # interim pins retained (K-1 = 2)
    gp.clear_cache(force=True)


def test_warmup_primes_and_releases_only_its_pins(spark):
    """session.warmup (r10): runs every hot kernel family, returns the
    seconds spent, and releases ONLY the pins it created — a caller's
    pre-existing pins survive."""
    from go_pandas_spark.session import warmup

    f = gp.Frame.from_pandas(spark, pd.DataFrame({"k": np.arange(50.0)}))
    f.cumsum().shift(1)._sdf.count()  # creates a caller pin
    pre = set(I._PINNED)
    assert pre
    t = warmup(spark)
    assert isinstance(t, float) and t > 0
    assert set(I._PINNED) == pre  # nothing added, nothing stolen
    gp.clear_cache()


def test_liveness_propagates_through_derivation(spark, monkeypatch):
    """ADVICE r11 #1: a frame DERIVED from a blocked output (getitem,
    assign, _copy paths) holds the same un-collected lazy plan — pin
    eviction must defer while only the derived frame is alive."""
    gp.clear_cache(force=True)
    monkeypatch.setattr(I, "_PINNED_MAX", 2)
    pdf = pd.DataFrame({"k": np.arange(150.0), "v": np.arange(150.0)})
    base = gp.Frame(spark.createDataFrame(pdf).repartition(4)) \
        .sort_values("k")
    derived = []
    for i in range(4):
        f = base.assign(v=base["v"] + float(i)).cumsum().shift(1)
        f.to_pandas()
        derived.append(f[["v"]].head(50))  # derived, original dropped
        del f
    import gc

    gc.collect()
    # only DERIVED frames are alive; eviction must still defer
    trigger = base.assign(v=base["v"] * 77.0).cumsum().shift(1)
    trigger.to_pandas()
    assert len(I._PINNED) > I._PINNED_MAX  # deferred, not evicted
    # parity: the derived frames' pending plans still replay correctly
    for i, d in enumerate(derived):
        exp = pdf.assign(v=pdf["v"] + float(i)).cumsum().shift(1)[["v"]] \
            .head(50)
        np.testing.assert_allclose(d.to_pandas()["v"], exp["v"],
                                   rtol=1e-12)
    derived.clear()
    del trigger, d
    gp.clear_cache(force=True)


def test_eviction_collects_cycle_held_frames(spark, monkeypatch):
    """ADVICE r11 #2: blocked frames held ONLY by reference cycles
    must not defer eviction forever — _maybe_evict_pins collects
    before judging liveness, so the _PINNED_MAX bound is guaranteed
    even for a no-barrier service."""
    gp.clear_cache(force=True)
    monkeypatch.setattr(I, "_PINNED_MAX", 2)
    # step=1 = gc at every over-cap pin: this test pins the COLLECTION
    # behavior; the production step (8) is a rate-limit perf knob whose
    # bound (_PINNED_MAX + _GC_STEP + in-flight) the docstring carries
    monkeypatch.setattr(I, "_GC_STEP", 1)
    monkeypatch.setattr(I, "_GC_AT", 0)
    pdf = pd.DataFrame({"k": np.arange(120.0), "v": np.arange(120.0)})
    base = gp.Frame(spark.createDataFrame(pdf).repartition(4)) \
        .sort_values("k")
    for i in range(4):
        f = base.assign(v=base["v"] + float(i)).cumsum().shift(1)
        f.to_pandas()
        f._cycle = f  # frame held by a reference cycle
        del f  # name dropped; only the cycle keeps it alive
    trigger = base.assign(v=base["v"] * 55.0).cumsum().shift(1)
    trigger.to_pandas()
    del trigger
    # the trigger pin fired eviction past the cap: gc broke the
    # cycles, so the registry drained to cap + in-flight pins
    assert len(I._PINNED) <= I._PINNED_MAX + 2
    gp.clear_cache(force=True)


def test_gc_watermark_resets_under_cap_and_on_clear(spark, monkeypatch):
    """ADVICE r12 #4: a stale high _GC_AT after clear_cache (or after
    the registry drains under the cap) must not defer the next
    cycle-collecting gc until the registry regrows past it."""
    gp.clear_cache(force=True)
    monkeypatch.setattr(I, "_GC_AT", 99)
    # drained registry + under-cap call -> watermark resets
    I._maybe_evict_pins()
    assert I._GC_AT == 0
    monkeypatch.setattr(I, "_GC_AT", 77)
    gp.clear_cache(force=True)
    assert I._GC_AT == 0


def test_first_valid_refs_raises_without_anchor(spark):
    """ADVICE r12 #5: the deterministic-sample contract must hold
    under python -O — a hard raise, not an assert."""
    sdf = spark.createDataFrame(pd.DataFrame({"x": [1.0, 2.0]}))
    assert I.ORDER_COL not in sdf.columns
    with pytest.raises(RuntimeError, match="ORDER_COL"):
        dw.first_valid_refs(sdf, ["x"])

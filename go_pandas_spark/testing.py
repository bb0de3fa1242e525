"""Testing utilities — the ``pandas.testing`` surface users reach for
in their own test suites (reference ``pandas/util/testing.py:1241
assert_frame_equal``, ``:1097 assert_series_equal``).

Both sides collect to pandas in frame order and delegate to pandas'
own comparators, so every pandas tolerance/dtype knob works unchanged.
Driver-side BY DESIGN: these are test assertions over test-sized data
(the same contract as the reference — its comparators are in-memory
too). For production-scale equality use ``Frame.equals`` (distributed)
or an anti-join.
"""

from __future__ import annotations


def _to_pandas(obj):
    return obj.to_pandas() if hasattr(obj, "to_pandas") else obj


def assert_frame_equal(left, right, check_dtype: bool = True,
                       check_like: bool = False, check_exact: bool = False,
                       rtol: float = 1e-5, atol: float = 1e-8) -> None:
    """Assert two Frames (or a Frame and a pandas DataFrame) are equal.

    ``check_like=True`` ignores column order (pandas semantics).
    Raises AssertionError with pandas' standard diff rendering.
    """
    import pandas.testing as pdt

    l, r = _to_pandas(left), _to_pandas(right)
    if check_like:
        l = l[sorted(l.columns)]
        r = r[sorted(r.columns)]
    pdt.assert_frame_equal(l.reset_index(drop=True), r.reset_index(drop=True),
                           check_dtype=check_dtype, check_exact=check_exact,
                           rtol=rtol, atol=atol)


def assert_series_equal(left, right, check_dtype: bool = True,
                        check_names: bool = False, check_exact: bool = False,
                        rtol: float = 1e-5, atol: float = 1e-8) -> None:
    """Assert two Series (engine or pandas) are equal in frame order."""
    import pandas.testing as pdt

    l, r = _to_pandas(left), _to_pandas(right)
    pdt.assert_series_equal(l.reset_index(drop=True), r.reset_index(drop=True),
                            check_dtype=check_dtype, check_names=check_names,
                            check_exact=check_exact, rtol=rtol, atol=atol)

"""Options registry — the ``pd.get_option / set_option /
reset_option / option_context`` surface (reference
``pandas/core/config.py:52-232``; the full module is a validation
framework around exactly this dict).

Only options that change engine behavior are registered; unknown keys
raise like pandas' ``OptionError``. Options are driver-side process
state (they gate how much data ``to_string``/``to_pandas`` previews
pull to the driver — never a distributed setting).
"""

from __future__ import annotations

from contextlib import contextmanager

_DEFAULTS = {
    "display.max_rows": 60,       # rows to_string() collects
    "display.max_columns": 0,     # 0 = all (pandas None analog)
    "compute.max_driver_rows": 100_000,  # guard for driver-side sinks
}

_options = dict(_DEFAULTS)


class OptionError(AttributeError, KeyError):
    """Unknown option key (reference config.py:79)."""


def _check(key: str) -> None:
    if key not in _DEFAULTS:
        raise OptionError(f"No such option: {key!r} (known: {sorted(_DEFAULTS)})")


def get_option(key: str):
    _check(key)
    return _options[key]


def set_option(key: str, value) -> None:
    _check(key)
    _options[key] = value


def reset_option(key: str) -> None:
    _check(key)
    _options[key] = _DEFAULTS[key]


@contextmanager
def option_context(*args):
    """``with option_context('display.max_rows', 10): ...`` — pairs of
    (key, value), restored on exit (reference config.py:380)."""
    if len(args) % 2:
        raise ValueError("option_context expects key/value pairs")
    keys = args[::2]
    saved = {k: get_option(k) for k in keys}
    try:
        for k, v in zip(args[::2], args[1::2]):
            set_option(k, v)
        yield
    finally:
        _options.update(saved)

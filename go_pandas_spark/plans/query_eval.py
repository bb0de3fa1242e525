"""pandas-dialect query/eval front end → Spark SQL expression strings.

Reference parity: the entire ``pandas/core/computation`` pipeline
(``eval.py:156``, token rewrites ``expr.py:39,57,81``, numexpr engine
``engines.py:101``) collapses to a token-level translation — Catalyst
is the engine (SURVEY §3.1). Same approach as the reference: Python
``tokenize`` + targeted token rewrites, never a hand-written parser.

Rewrites:
- ``&``/``|``/``~``    → ``AND``/``OR``/``NOT`` (pandas precedence swap)
- ``and``/``or``/``not``  pass through (valid Spark SQL)
- ``@local``         → literal from the provided scope (scope capture,
                       ``computation/scope.py`` analog)
- ``in [a, b]``      → ``IN (a, b)``  (brackets → parens)
- ``True/False/None``→ ``true/false/NULL``
- ``**``             → ``power()`` is not needed — Spark SQL does not
                       have ``**``; rewritten to the ``power`` call.
"""

from __future__ import annotations

import io
import tokenize


def _literal(value) -> str:
    if value is None:
        return "NULL"
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, str):
        escaped = value.replace("'", "\\'")
        return f"'{escaped}'"
    if isinstance(value, (list, tuple, set)):
        return "(" + ", ".join(_literal(v) for v in value) + ")"
    return repr(value)


def translate_expr(expr: str, columns: list[str], scope: dict | None = None) -> str:
    scope = scope or {}
    toks = list(tokenize.generate_tokens(io.StringIO(expr).readline))
    out: list[str] = []
    i = 0
    while i < len(toks):
        tok = toks[i]
        typ, val = tok.type, tok.string
        if typ in (tokenize.ENCODING, tokenize.ENDMARKER, tokenize.NEWLINE, tokenize.NL, tokenize.INDENT):
            i += 1
            continue
        if typ == tokenize.OP:
            if val == "&":
                out.append("AND")
            elif val == "|":
                out.append("OR")
            elif val == "~":
                out.append("NOT")
            elif val == "[":
                out.append("(")
            elif val == "]":
                out.append(")")
            elif val == "==":
                out.append("=")
            elif val == "**":
                # a ** b → power(a, b): wrap the previous operand
                prev = out.pop()
                # consume the exponent (single token or parenthesized)
                nxt = toks[i + 1]
                out.append(f"power({prev}, {nxt.string})")
                i += 2
                continue
            elif val == "@":
                name = toks[i + 1].string
                if name not in scope:
                    raise NameError(f"local variable {name!r} is not defined")
                out.append(_literal(scope[name]))
                i += 2
                continue
            else:
                out.append(val)
        elif typ == tokenize.NAME:
            if val == "True":
                out.append("true")
            elif val == "False":
                out.append("false")
            elif val == "None":
                out.append("NULL")
            elif val in ("and", "or", "not", "in"):
                out.append(val.upper())
            elif val in columns:
                out.append(f"`{val}`")
            elif val in scope:
                out.append(_literal(scope[val]))
            else:
                out.append(f"`{val}`")
        elif typ == tokenize.STRING:
            inner = val[1:-1] if val[0] in "'\"" else val
            out.append("'" + inner.replace("'", "\\'") + "'")
        else:
            out.append(val)
        i += 1
    return " ".join(out)


def translate_assignments(expr: str, columns: list[str], scope: dict | None = None) -> list[tuple[str, str]]:
    """``df.eval("c = a + b\nd = c * 2")`` → [(target, spark_sql), ...]."""
    results = []
    known = list(columns)
    for line in expr.splitlines():
        line = line.strip()
        if not line:
            continue
        if "=" in line and "==" not in line.split("=")[0] + "=":
            target, rhs = line.split("=", 1)
            target = target.strip()
            results.append((target, translate_expr(rhs.strip(), known, scope)))
            if target not in known:
                known.append(target)
        else:
            raise ValueError(f"eval line is not an assignment: {line!r}")
    return results

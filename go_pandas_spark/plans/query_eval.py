"""pandas-dialect query/eval front end → Spark SQL expression strings.

Reference parity: the entire ``pandas/core/computation`` pipeline
(``eval.py:156``, token rewrites ``expr.py:39,57,81``, numexpr engine
``engines.py:101``) collapses to a translation layer — Catalyst is the
engine (SURVEY §3.1).

The translator parses the expression with Python ``ast`` (after a
token pre-pass that substitutes ``@local`` scope references) so that
COMPARISON nodes can carry pandas NaN semantics: in pandas/numexpr a
comparison against NaN yields False — except ``!=``, which yields
True — while SQL three-valued logic yields NULL (dropping the row
from a filter and poisoning any enclosing ``not``). Every comparison
is therefore emitted as ``coalesce(a OP b, false)`` (``!=`` →
``coalesce(a != b, true)``) so ``not (w == 0)`` keeps null-w rows
exactly like ``DataFrame.query``.

Pushdown-aware: at a FILTER sink, NULL and FALSE are indistinguishable
through monotone AND/OR contexts, so positive ``==``/``<``/… are
emitted bare (they reach the parquet scan as PushedFilters); the
coalesce wrapper is applied only where it changes the outcome — under
a ``not``, and always for ``!=``/``not in`` (pandas keeps NULL rows
there, so pushing a NotEqualTo would itself be wrong). ``mode="value"``
(eval assignments) always wraps: the boolean is materialized as a
column and pandas yields False, not NULL.

Other rewrites:
- ``&``/``|``/``~`` and ``and``/``or``/``not`` → ``AND``/``OR``/``NOT``
- ``@local``   → literal from the provided scope
- ``in [a,b]`` → ``IN (a, b)``; ``not in`` → ``NOT IN`` (coalesced)
- ``True/False/None`` → ``true/false/NULL``
- ``**``       → ``power()``
- chained comparisons ``1 < a < 5`` → conjunction of coalesced pairs
"""

from __future__ import annotations

import ast
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


_CMP = {ast.Eq: "=", ast.NotEq: "!=", ast.Lt: "<", ast.LtE: "<=",
        ast.Gt: ">", ast.GtE: ">="}
_BIN = {ast.Add: "+", ast.Sub: "-", ast.Mult: "*", ast.Div: "/",
        ast.Mod: "%", ast.BitAnd: "AND", ast.BitOr: "OR",
        ast.BitXor: "!="}  # boolean xor on masks


def _sub_scope_refs(expr: str, scope: dict) -> tuple[str, dict]:
    """Token pre-pass: ``@name`` → a placeholder identifier (``@`` is
    not valid Python expression syntax), returning the placeholder →
    SQL-literal map."""
    toks = list(tokenize.generate_tokens(io.StringIO(expr).readline))
    out, repl, i = [], {}, 0
    while i < len(toks):
        tok = toks[i]
        if tok.type == tokenize.OP and tok.string == "@":
            name = toks[i + 1].string
            if name not in scope:
                raise NameError(f"local variable {name!r} is not defined")
            ph = f"__at_{name}__"
            repl[ph] = _literal(scope[name])
            out.append(ph)
            i += 2
            continue
        if tok.type in (tokenize.ENCODING, tokenize.ENDMARKER,
                        tokenize.NEWLINE, tokenize.NL, tokenize.INDENT):
            i += 1
            continue
        out.append(tok.string)
        i += 1
    return " ".join(out), repl


class _Translator:
    def __init__(self, columns: list[str], scope: dict, repl: dict,
                 mode: str = "filter"):
        self.columns = set(columns)
        self.scope = scope
        self.repl = repl
        self.mode = mode
        self.neg_depth = 0

    def emit(self, node: ast.AST) -> str:
        fn = getattr(self, f"_e_{type(node).__name__}", None)
        if fn is None:
            raise ValueError(f"query/eval: unsupported syntax "
                             f"{type(node).__name__}")
        return fn(node)

    def _e_Expression(self, n):
        return self.emit(n.body)

    def _e_BoolOp(self, n):
        op = "AND" if isinstance(n.op, ast.And) else "OR"
        return "(" + f" {op} ".join(self.emit(v) for v in n.values) + ")"

    def _e_BinOp(self, n):
        if isinstance(n.op, ast.BitXor):
            # boolean xor on masks is non-monotone in both operands
            self.neg_depth += 1
            try:
                l, r = self.emit(n.left), self.emit(n.right)
            finally:
                self.neg_depth -= 1
            return f"({l} != {r})"
        if isinstance(n.op, ast.Pow):
            return f"power({self.emit(n.left)}, {self.emit(n.right)})"
        if isinstance(n.op, ast.FloorDiv):
            return f"floor({self.emit(n.left)} / {self.emit(n.right)})"
        op = _BIN.get(type(n.op))
        if op is None:
            raise ValueError(f"query/eval: unsupported operator "
                             f"{type(n.op).__name__}")
        return f"({self.emit(n.left)} {op} {self.emit(n.right)})"

    def _e_UnaryOp(self, n):
        if isinstance(n.op, (ast.Not, ast.Invert)):
            self.neg_depth += 1
            try:
                inner = self.emit(n.operand)
            finally:
                self.neg_depth -= 1
            return f"(NOT {inner})"
        if isinstance(n.op, ast.USub):
            return f"(- {self.emit(n.operand)})"
        if isinstance(n.op, ast.UAdd):
            return self.emit(n.operand)
        raise ValueError("query/eval: unsupported unary op")

    def _e_Compare(self, n):
        # pandas NaN semantics: comparisons with NULL are FALSE except
        # != which is TRUE (numexpr evaluates NaN != x → True)
        parts = []
        left = n.left
        for op, right in zip(n.ops, n.comparators):
            ls, rs = self.emit(left), self.emit(right)
            if isinstance(op, (ast.In, ast.NotIn)):
                inner = f"{ls} IN {rs}"
                if isinstance(op, ast.NotIn):
                    # pandas: NaN not in list is True — NULL rows KEPT
                    parts.append(f"coalesce(NOT ({inner}), true)")
                elif self.mode == "value" or self.neg_depth > 0:
                    parts.append(f"coalesce({inner}, false)")
                else:
                    parts.append(f"({inner})")
            else:
                sql = _CMP.get(type(op))
                if sql is None:
                    raise ValueError("query/eval: unsupported comparison")
                if sql == "!=":
                    # pandas: NaN != x is True — NULL rows are KEPT
                    parts.append(f"coalesce({ls} {sql} {rs}, true)")
                elif self.mode == "value" or self.neg_depth > 0:
                    parts.append(f"coalesce({ls} {sql} {rs}, false)")
                else:
                    # positive filter context: NULL ≡ FALSE at the sink;
                    # bare comparison stays pushdown-eligible
                    parts.append(f"{ls} {sql} {rs}")
            left = right
        return parts[0] if len(parts) == 1 else "(" + " AND ".join(parts) + ")"

    def _e_Name(self, n):
        v = n.id
        if v in self.repl:
            return self.repl[v]
        if v == "True":
            return "true"
        if v == "False":
            return "false"
        if v == "None":
            return "NULL"
        if v in self.columns:
            return f"`{v}`"
        if v in self.scope:
            return _literal(self.scope[v])
        return f"`{v}`"

    def _e_Constant(self, n):
        return _literal(n.value)

    def _e_Call(self, n):
        if not isinstance(n.func, ast.Name):
            raise ValueError("query/eval: only plain function calls")
        args = ", ".join(self.emit(a) for a in n.args)
        return f"{n.func.id}({args})"

    def _e_List(self, n):
        return "(" + ", ".join(self.emit(e) for e in n.elts) + ")"

    _e_Tuple = _e_List
    _e_Set = _e_List

    def _e_Attribute(self, n):
        # backtick-quoted dotted column names (`a.b`) are uncommon in
        # query strings; treat attribute access as unsupported
        raise ValueError("query/eval: attribute access is not supported")


def translate_expr(expr: str, columns: list[str], scope: dict | None = None,
                   mode: str = "filter") -> str:
    scope = scope or {}
    pre, repl = _sub_scope_refs(expr, scope)
    tree = ast.parse(pre, mode="eval")
    return _Translator(list(columns), scope, repl, mode=mode).emit(tree)


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
            results.append((target, translate_expr(rhs.strip(), known, scope,
                                                   mode="value")))
            if target not in known:
                known.append(target)
        else:
            raise ValueError(f"eval line is not an assignment: {line!r}")
    return results

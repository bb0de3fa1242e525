"""`.str` accessor: vectorized string methods.

Reference parity: ``pandas/core/strings.py`` (3,178 LoC, accessor
``StringMethods:1783``, 87 defs). The reference runs elementwise
Python over object arrays (``lib.map_infer``); every method here is a
built-in Spark SQL expression — JVM-side, codegen-fused, ~100× the
throughput of per-row Python at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


class StringMethods:
    def __init__(self, series):
        self._s = series

    def _w(self, col: Column, name: str | None = None):
        return self._s._with_scol(col, name)

    @property
    def _c(self) -> Column:
        return self._s._scol

    # casing -----------------------------------------------------------
    def lower(self):
        return self._w(F.lower(self._c))

    def upper(self):
        return self._w(F.upper(self._c))

    def title(self):
        """Python str.title: the first char of every ALPHA RUN is
        uppercased, the rest lowered — runs break on ANY non-letter
        (initcap only breaks on spaces: 'tab\\tsep'.title() must give
        'Tab\\tSep'). Char-level transform; unicode-aware via
        upper()/lower() disagreement as the letter test. Delta:
        chars whose uppercase expands (ß→SS) keep the full expansion
        where Python uses the one-char titlecase form (Ss)."""
        chars = F.split(self._c, "")

        def _alpha(ch):
            return F.lower(ch) != F.upper(ch)

        def tc(ch, i):
            prev = F.element_at(chars, i)  # 1-based: chars[i] = previous
            start = F.when(i == 0, F.lit(True)).otherwise(~_alpha(prev))
            return (F.when(~_alpha(ch), ch)
                    .when(start, F.upper(ch))
                    .otherwise(F.lower(ch)))

        return self._w(F.array_join(F.transform(chars, tc), ""))

    def capitalize(self):
        return self._w(F.concat(F.upper(F.substring(self._c, 1, 1)),
                                F.lower(F.substring(self._c, 2, 1 << 30))))

    def casefold(self):
        return self.lower()

    # size / padding ---------------------------------------------------
    def len(self):
        return self._w(F.length(self._c))

    def _fill(self, n: Column, fillchar: str) -> Column:
        return F.repeat(F.lit(fillchar), F.greatest(n.cast("int"), F.lit(0)))

    def pad(self, width: int, side: str = "left", fillchar: str = " "):
        if side == "left":
            return self.rjust(width, fillchar)
        if side == "right":
            return self.ljust(width, fillchar)
        return self.center(width, fillchar)

    def ljust(self, width: int, fillchar: str = " "):
        need = F.lit(width) - F.length(self._c)
        return self._w(F.concat(self._c, self._fill(need, fillchar)))

    def rjust(self, width: int, fillchar: str = " "):
        need = F.lit(width) - F.length(self._c)
        return self._w(F.concat(self._fill(need, fillchar), self._c))

    def center(self, width: int, fillchar: str = " "):
        total = F.lit(width) - F.length(self._c)
        left = F.floor(total / 2)
        right = total - left
        return self._w(F.concat(self._fill(left, fillchar), self._c, self._fill(right, fillchar)))

    def zfill(self, width: int):
        """Python str.zfill: pads only (lpad TRUNCATES longer strings);
        a leading +/- sign keeps its position before the zeros."""
        c = self._c
        sign = F.substring(c, 1, 1)
        has_sign = sign.isin("+", "-")
        body = F.substring(c, 2, 1 << 30)
        signed = F.concat(sign, F.lpad(body, max(width - 1, 0), "0"))
        return self._w(
            F.when(F.length(c) >= width, c)
            .otherwise(F.when(has_sign, signed)
                       .otherwise(F.lpad(c, width, "0"))))

    # trim -------------------------------------------------------------
    def strip(self, to_strip: str | None = None):
        return self._w(F.trim(self._c) if to_strip is None else F.btrim(self._c, F.lit(to_strip)))

    def lstrip(self, to_strip: str | None = None):
        if to_strip is None:
            return self._w(F.ltrim(self._c))
        import re as _re

        return self._w(F.regexp_replace(self._c, f"^[{_re.escape(to_strip)}]+", ""))

    def rstrip(self, to_strip: str | None = None):
        if to_strip is None:
            return self._w(F.rtrim(self._c))
        import re as _re

        return self._w(F.regexp_replace(self._c, f"[{_re.escape(to_strip)}]+$", ""))

    # predicates -------------------------------------------------------
    def contains(self, pat: str, case: bool = True, regex: bool = True):
        c = self._c if case else F.lower(self._c)
        p = pat if case else pat.lower()
        return self._w(c.rlike(p) if regex else c.contains(p))

    def startswith(self, pat: str):
        return self._w(self._c.startswith(pat))

    def endswith(self, pat: str):
        return self._w(self._c.endswith(pat))

    def match(self, pat: str):
        return self._w(self._c.rlike(f"^(?:{pat})"))

    def fullmatch(self, pat: str):
        return self._w(self._c.rlike(f"^(?:{pat})$"))

    def isalpha(self):
        return self._w(self._c.rlike(r"^[^\W\d_]+$"))

    def isdigit(self):
        return self._w(self._c.rlike(r"^[0-9]+$"))

    def isnumeric(self):
        return self._w(self._c.rlike(r"^[0-9]+$"))

    def isalnum(self):
        return self._w(self._c.rlike(r"^[^\W_]+$"))

    def isspace(self):
        return self._w(self._c.rlike(r"^\s+$"))

    def islower(self):
        return self._w((self._c == F.lower(self._c)) & self._c.rlike("[a-zA-Z]"))

    def isupper(self):
        return self._w((self._c == F.upper(self._c)) & self._c.rlike("[a-zA-Z]"))

    def isdecimal(self):
        return self._w(self._c.rlike(r"^[0-9]+$"))

    def istitle(self):
        """Python ``str.istitle``: uppercase letters only at word
        starts, every cased run is Upper followed by lowers, at least
        one cased character."""
        return self._w(self._c.rlike(
            r"^[^a-zA-Z]*[A-Z][a-z]*([^a-zA-Z]+[A-Z][a-z]*)*[^a-zA-Z]*$"))

    def swapcase(self):
        """Unicode swapcase (the ASCII translate map silently skipped
        non-ASCII letters): per-char upper/lower flip — a char is
        lowercase iff upper() changes it, so 'ü'→'Ü' and 'ß'→'SS'
        work like Python's str.swapcase."""
        sw = F.transform(
            F.split(self._c, ""),
            lambda ch: (F.when(ch != F.upper(ch), F.upper(ch))
                        .when(ch != F.lower(ch), F.lower(ch))
                        .otherwise(ch)))
        return self._w(F.array_join(sw, ""))

    def removeprefix(self, prefix: str):
        return self._w(F.when(self._c.startswith(prefix),
                              F.substring(self._c, len(prefix) + 1, 1 << 30))
                       .otherwise(self._c))

    def removesuffix(self, suffix: str):
        return self._w(F.when(self._c.endswith(suffix),
                              F.substring(self._c, 1, F.length(self._c) - len(suffix)))
                       .otherwise(self._c))

    def normalize(self, form: str = "NFC"):
        """Unicode normalization (``strings.py`` normalize wraps
        ``unicodedata.normalize``). No JVM builtin exposes this —
        the one `.str` method that rides the Arrow-vectorized UDF
        path instead of codegen."""
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("string")
        def _norm(s):
            import unicodedata

            return s.map(lambda v: unicodedata.normalize(form, v)
                         if v is not None else None)

        return self._w(_norm(self._c))

    # search / extract ---------------------------------------------------
    def count(self, pat: str):
        return self._w(F.regexp_count(self._c, F.lit(pat)))

    def find(self, sub: str):
        return self._w(F.instr(self._c, sub) - 1)

    def index(self, sub: str):
        return self.find(sub)

    def extract(self, pat: str, group: int = 1):
        """No-match gives NULL like pandas NaN (Spark regexp_extract
        returns '' there, indistinguishable from an empty group)."""
        return self._w(
            F.when(self._c.rlike(pat),
                   F.regexp_extract(self._c, pat, group)))

    def extractall(self, pat: str, group: int = 0):
        """Row-exploding variant → use ``explode(regexp_extract_all)``
        at the frame level; series-level returns the array."""
        return self.findall(pat, group)

    def findall(self, pat: str, group: int = 0):
        return self._w(F.regexp_extract_all(self._c, F.lit(pat), F.lit(group)))

    # transform -----------------------------------------------------------
    def replace(self, pat: str, repl: str, regex: bool = True):
        if regex:
            # Python backreferences are \1; Spark's (Java) replacement
            # syntax is $1 — translate, keeping escaped dollars literal
            import re as _re

            spark_repl = _re.sub(r"\\(\d+)", r"$\1",
                                 repl.replace("$", r"\$"))
            return self._w(F.regexp_replace(self._c, pat, spark_repl))
        return self._w(F.replace(self._c, F.lit(pat), F.lit(repl)))

    def repeat(self, n: int):
        return self._w(F.repeat(self._c, n))

    def slice(self, start: int = 0, stop: int | None = None):
        length = (stop - start) if stop is not None else (1 << 30)
        return self._w(F.substring(self._c, start + 1, length))

    def slice_replace(self, start: int, stop: int, repl: str):
        return self._w(F.concat(F.substring(self._c, 1, start), F.lit(repl),
                                F.substring(self._c, stop + 1, 1 << 30)))

    def get(self, i: int):
        """Element access: i-th char of a string, or i-th element of an
        array column (the ``.str.split().str.get(1)`` idiom)."""
        from pyspark.sql.types import ArrayType

        dt = self._s._frame._sdf.select(self._c.alias("x")).schema[0].dataType
        if isinstance(dt, ArrayType):
            return self._w(F.element_at(self._c, i + 1))
        return self._w(F.substring(self._c, i + 1, 1))

    def split(self, pat: str = r"\s+", n: int = -1, regex: bool = True,
              expand: bool = False):
        # pandas `n` is MAXSPLIT; Spark's limit is max PARTS = n + 1
        if pat == r"\s+" and regex:
            # default = Python str.split(None): leading whitespace is
            # stripped, empty/all-whitespace gives [] not ['']; a
            # trailing whitespace-only remainder is dropped
            parts = F.split(F.ltrim(self._c), r"\s+", n + 1 if n > 0 else -1)
            out = self._w(F.filter(parts, lambda x: x != ""))
        else:
            p = pat if regex else __import__("re").escape(pat)
            out = self._w(F.split(self._c, p, n + 1 if n > 0 else -1))
        if not expand:
            return out
        # expand=True → one column per part (pandas returns a frame;
        # width = max part count, found by one max-size aggregate)
        s = out
        width = s._frame._sdf.agg(F.max(F.size(s._scol))).first()[0] or 0
        cols = {str(i): F.element_at(s._scol, i + 1) for i in range(width)}
        f = s._frame._copy(s._frame._sdf)
        for name, c in cols.items():
            f._sdf = f._sdf.withColumn(name, c)
        return f[[str(i) for i in range(width)]]

    def rsplit(self, pat: str = r"\s+", n: int = -1):
        """``strings.py`` rsplit: split from the right. Reverse the
        string, split on the reversed (literal) separator, un-reverse
        each part and the part order — still one JVM expression."""
        import re as _re

        if pat == r"\s+":
            # Python str.rsplit(None): trailing whitespace is stripped,
            # leading whitespace stays attached to the leftmost piece.
            if n <= 0:
                # empty/all-whitespace → [] like Python rsplit(None)
                # (F.split of '' yields [''] — filter it out)
                return self._w(F.filter(F.split(F.trim(self._c), r"\s+"),
                                        lambda x: x != ""))
            src, rev_pat = F.rtrim(self._c), r"\s+"
        else:
            if n <= 0:
                return self.split(pat, regex=False)
            src, rev_pat = self._c, _re.escape(pat[::-1])
        parts = F.split(F.reverse(src), rev_pat, n + 1)
        if pat == r"\s+":
            # whitespace-mode rsplit never yields empty pieces: when the
            # limit outlasts the content, the leading-whitespace remainder
            # splits off as '' — drop it (inner empties can't occur).
            parts = F.filter(parts, lambda x: x != "")
        return self._w(F.reverse(F.transform(parts, lambda x: F.reverse(x))))

    def join(self, sep: str):
        """Join an array-of-strings column (``strings.py`` join)."""
        return self._w(F.array_join(self._c, sep))

    def partition(self, sep: str = " "):
        """Head / sep / tail split at the FIRST occurrence — returned
        as a 3-element array column (the reference returns a 3-column
        frame; an array keeps it a single vectorized expression)."""
        pos = F.instr(self._c, sep)
        head = F.substring(self._c, 1, pos - 1)
        tail = F.substring(self._c, pos + len(sep), 1 << 30)
        return self._w(F.when(pos > 0, F.array(head, F.lit(sep), tail))
                       .otherwise(F.array(self._c, F.lit(""), F.lit(""))))

    def rpartition(self, sep: str = " "):
        """partition at the LAST occurrence: tail via
        ``substring_index(…, -1)``, head by length arithmetic."""
        tail = F.substring_index(self._c, sep, -1)
        head_len = F.length(self._c) - F.length(tail) - len(sep)
        head = F.substring(self._c, 1, head_len)
        found = F.instr(self._c, sep) > 0
        return self._w(F.when(found, F.array(head, F.lit(sep), tail))
                       .otherwise(F.array(F.lit(""), F.lit(""), self._c)))

    def rfind(self, sub: str):
        """Highest 0-based index of ``sub``, −1 if absent — length
        arithmetic on ``substring_index``, no scan loop."""
        tail = F.substring_index(self._c, sub, -1)
        idx = F.length(self._c) - F.length(tail) - len(sub)
        # null input stays null (pandas NaN) — the otherwise(-1) arm
        # must not swallow it (fuzz-caught, str_battery seed 420812)
        return self._w(F.when(self._c.isNull(), F.lit(None))
                       .when(F.instr(self._c, sub) > 0, idx)
                       .otherwise(F.lit(-1)))

    def rindex(self, sub: str):
        return self.rfind(sub)

    def translate(self, table: dict):
        """``str.maketrans`` convention: keys/values may be single
        chars OR code points (``strings.py:2112`` passes the dict
        straight to ``str.translate``); None values delete."""
        def ch(v):
            return chr(v) if isinstance(v, int) else ("" if v is None else v)

        src = "".join(ch(k) for k in table.keys())
        dst = "".join(ch(v) for v in table.values())
        return self._w(F.translate(self._c, src, dst))

    def cat(self, others=None, sep: str = "", na_rep: str | None = None):
        """``strings.py:1018``. With ``others``: elementwise concat.
        Without: COLLAPSE the series to one Python string — one
        aggregation job: collect (order, value) pairs, sort by the
        engine's order column (array_sort on the tiny aggregated
        array, not a data shuffle), join with ``sep``. NaNs drop when
        ``na_rep`` is None, exactly like the reference."""
        if others is None:
            from .. import _internal as I

            pair = F.struct(
                F.col(I.ORDER_COL).alias("o"),
                F.coalesce(self._c.cast("string"),
                           F.lit(na_rep)).alias("v"))
            if na_rep is None:
                # collect_list drops null elements — null out the whole
                # pair where the value is null (pandas drops NaNs)
                pair = F.when(self._c.isNotNull(), pair)
            pairs = F.collect_list(pair)
            joined = F.array_join(
                F.transform(F.array_sort(pairs), lambda x: x["v"]), sep)
            row = self._s._frame._sdf.agg(joined.alias("cat")).first()
            return row["cat"]
        oc = others._scol if hasattr(others, "_scol") else F.lit(others)
        l, r = self._c.cast("string"), oc.cast("string")
        if na_rep is not None:
            l, r = F.coalesce(l, F.lit(na_rep)), F.coalesce(r, F.lit(na_rep))
        # F.concat propagates null — pandas: either side NaN ⇒ NaN
        # unless na_rep patched it (concat_ws would silently DROP the
        # null side instead)
        return self._w(F.concat(l, F.lit(sep), r))

    def wrap(self, width: int):
        # greedy wrap via regex insertion of newlines
        return self._w(F.regexp_replace(self._c, f"(.{{1,{width}}})( +|$)", "$1\n"))

    def normalize_ws(self):
        return self._w(F.trim(F.regexp_replace(self._c, r"\s+", " ")))

    def encode(self, charset: str = "UTF-8"):
        return self._w(F.encode(self._c, charset))

    def decode(self, charset: str = "UTF-8"):
        return self._w(F.decode(self._c, charset))

    def get_dummies(self, sep: str = "|"):
        raise NotImplementedError("use operators.reshape.get_dummies on an exploded column")

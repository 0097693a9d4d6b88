"""DuckDB -> Spark SQL dialect shim.

A user of the reference writes DuckDB-flavored SQL (the reference's
engine IS DuckDB — query_db.py:49 passes query text straight to
``conn.sql``). Spark 4 natively accepts much of that surface
(``expr::TYPE`` casts, ``GROUP BY ALL`` / ``ORDER BY ALL``,
``SELECT * EXCEPT``, ``ILIKE``, FROM-first and bare-FROM statements,
``len``) — verified by ``tests/test_dialect_shim.py`` — so this shim
translates only the residue Spark rejects:

- ``//``            -> `` div ``       (integer division; NOTE DuckDB's
  ``//`` on DECIMAL/DOUBLE operands is plain division — a textual
  translator cannot see column types, so fractional-operand ``//`` is
  out of scope and translates with integral semantics)
- ``expr->'k'`` / ``expr->>'k'`` -> ``get_json_object(expr, '$.k')``
  (chained arrows and integer array subscripts supported; ``->`` in
  DuckDB returns JSON while ``->>`` returns text — both map onto
  ``get_json_object``, whose scalar results are text, matching the
  ``->>`` semantics the reference's queries rely on; see the F2
  operator caveat)
- function renames (word-bounded, case-insensitive, only before ``(``):
  ``list_transform`` -> ``transform``, ``list_filter`` -> ``filter``,
  ``list_distinct`` -> ``array_distinct``, ``list_contains`` ->
  ``array_contains``, ``list_sort`` -> ``array_sort``,
  ``array_to_string`` -> ``array_join``, ``string_split_regex`` /
  ``string_split`` / ``str_split`` -> ``split``,
  ``quantile_cont`` -> ``percentile``, ``regexp_matches`` ->
  ``regexp_like``, ``strftime`` -> ``date_format``
- ``epoch`` -> ``unix_micros(...)/1e6`` (DuckDB's epoch is FRACTIONAL
  double seconds) and ``epoch_ms`` -> ``unix_millis``, each with a
  ``cast(... as timestamp)`` wrap (bridges TIMESTAMP_NTZ parquet reads;
  identity under the pinned UTC session timezone)
- type heuristics: ``len(<array call>)`` -> ``size`` and 1-based
  ``<array call>(...)[n]`` -> ``element_at(..., n)`` for calls whose
  result is known to be an array (ARRAY_FUNCS); bare ``VARCHAR`` ->
  ``STRING``
- ``* EXCLUDE (...)`` -> ``* EXCEPT (...)``
- ``%Y/%m/%d/%H/%M/%S``-style strftime specifiers inside the format
  literal of a (renamed) ``strftime`` call -> JVM pattern letters

Everything runs on literal-masked text (same technique as
``repair.py``), so quoted values are never rewritten. The shim is
deliberately a best-effort TRANSLATOR, not a parser: constructs it
does not recognize pass through unchanged and surface Spark's own
error, which the repair loop can then act on.
"""

from __future__ import annotations

import re

#: DuckDB function name -> Spark function name. Applied word-bounded,
#: case-insensitively, and only when immediately followed by ``(``.
#: Longest-match-first so ``string_split_regex`` wins over
#: ``string_split``.
FUNCTION_RENAMES: tuple[tuple[str, str], ...] = (
    ("string_split_regex", "split"),
    ("string_split", "split"),
    ("str_split_regex", "split"),
    ("str_split", "split"),
    ("list_transform", "transform"),
    ("list_filter", "filter"),
    ("list_distinct", "array_distinct"),
    ("list_contains", "array_contains"),
    ("list_sort", "array_sort"),
    ("array_to_string", "array_join"),
    ("quantile_cont", "percentile"),
    ("regexp_matches", "regexp_like"),
    ("strftime", "date_format"),
)

#: Functions (post-rename) whose result is an ARRAY — used by the
#: type-heuristic passes: ``len(<array call>)`` -> ``size(...)`` and
#: ``<array call>[n]`` -> ``element_at(..., n)`` (DuckDB subscripts are
#: 1-based, exactly element_at's convention).
ARRAY_FUNCS: tuple[str, ...] = (
    "split",
    "transform",
    "filter",
    "array_distinct",
    "array_sort",
    "sequence",
    "array_agg",
    "collect_list",
    "array",
)

#: strftime %-specifier -> JVM DateTimeFormatter pattern.
STRFTIME_MAP: tuple[tuple[str, str], ...] = (
    ("%Y", "yyyy"),
    ("%y", "yy"),
    ("%m", "MM"),
    ("%d", "dd"),
    ("%H", "HH"),
    ("%I", "hh"),
    ("%M", "mm"),
    ("%S", "ss"),
    ("%f", "SSSSSS"),
    ("%p", "a"),
    ("%j", "DDD"),
    ("%%", "%"),
)

_MASK = "\x02{}\x02"
_MASK_RE = re.compile("\x02(\\d+)\x02")
_LITERAL_RE = re.compile(r"'[^']*'")

# operand END characters that can close an arrow LHS: identifier char,
# closing paren/bracket, or a masked-literal terminator
_IDENT_CHARS = re.compile(r"[A-Za-z0-9_.\x02]")


def _mask_literals(sql: str) -> tuple[str, list[str]]:
    literals: list[str] = []

    def repl(m: re.Match) -> str:
        literals.append(m.group(0))
        return _MASK.format(len(literals) - 1)

    return _LITERAL_RE.sub(repl, sql.replace("\x02", "")), literals


def _unmask(sql: str, literals: list[str]) -> str:
    return _MASK_RE.sub(lambda m: literals[int(m.group(1))], sql)


def _scan_lhs(s: str, op_start: int) -> int:
    """Start index of the arrow's left operand, scanning backwards.

    Accepts an identifier chain (``a.b.c``), a masked literal, or a
    balanced ``(...)`` / ``[...]`` suffix (function call result),
    optionally preceded by an identifier (the callee name).
    """
    i = op_start
    while i > 0 and s[i - 1] in " \t":
        i -= 1
    if i > 0 and s[i - 1] in ")]":
        close = s[i - 1]
        opener = "(" if close == ")" else "["
        depth = 0
        j = i - 1
        while j >= 0:
            if s[j] == close:
                depth += 1
            elif s[j] == opener:
                depth -= 1
                if depth == 0:
                    break
            j -= 1
        i = j
        # include the callee identifier before the '(' if present
        while i > 0 and _IDENT_CHARS.match(s[i - 1]):
            i -= 1
        return i
    while i > 0 and _IDENT_CHARS.match(s[i - 1]):
        i -= 1
    return i


#: keywords the backward operand scan must never treat as an arrow LHS
_RESERVED = frozenset(
    "SELECT WHERE AND OR NOT ON WHEN THEN ELSE END BY FROM CASE AS IN IS "
    "JOIN HAVING GROUP ORDER LIMIT OFFSET UNION ALL DISTINCT BETWEEN LIKE "
    "ILIKE WITH".split()
)

_ARROW_RE = re.compile(r"->>?")
_KEY_LIT_RE = re.compile(r"\s*\x02(\d+)\x02")
_KEY_INT_RE = re.compile(r"\s*(\d+)")

#: Higher-order functions whose ``param -> body`` lambda syntax collides
#: with the JSON ``->`` operator. A single arrow whose LHS is a bare
#: identifier directly inside one of these calls is a LAMBDA, never a
#: JSON access. (``->>`` is unambiguous — no lambda uses it.)
HIGHER_ORDER_FUNCS = frozenset(
    {
        "transform",
        "filter",
        "aggregate",
        "reduce",
        "exists",
        "forall",
        "zip_with",
        "map_zip_with",
        "map_filter",
        "transform_keys",
        "transform_values",
        "array_sort",
        # pre-rename DuckDB spellings (arrows rewrite before renames)
        "list_transform",
        "list_filter",
        "list_aggregate",
        "list_reduce",
        "list_sort",
    }
)


def _enclosing_call_name(s: str, idx: int) -> str | None:
    """Name of the function call directly enclosing position ``idx``."""
    depth = 0
    for j in range(idx - 1, -1, -1):
        if s[j] == ")":
            depth += 1
        elif s[j] == "(":
            if depth == 0:
                k = j
                while k > 0 and re.match(r"[\w$]", s[k - 1]):
                    k -= 1
                name = s[k:j].strip().lower()
                return name or None
            depth -= 1
    return None


def _is_lambda_arrow(s: str, lhs_start: int, lhs: str) -> bool:
    """True when a single ``->`` at this site is lambda syntax.

    A lambda's parameter list sits in PARAMETER POSITION: directly
    after ``(`` or ``,`` of an enclosing higher-order call. That
    distinguishes ``transform(a, j -> j->'k')``: the first arrow's
    ``j`` follows a comma (lambda), while the second arrow's ``j``
    follows ``-> `` (JSON access on the lambda variable — rewritten).
    """
    bare_ident = bool(re.fullmatch(r"[A-Za-z_]\w*", lhs))
    paren_list = lhs.startswith("(") and lhs.endswith(")")
    if not (bare_ident or paren_list):
        return False  # dotted / call / literal LHS: not a lambda param
    k = lhs_start
    while k > 0 and s[k - 1] in " \t":
        k -= 1
    if k == 0 or s[k - 1] not in "(,":
        return False  # not in parameter position
    name = _enclosing_call_name(s, lhs_start)
    return name in HIGHER_ORDER_FUNCS


def _rewrite_arrows(s: str, literals: list[str]) -> str:
    """Rewrite ``expr -> 'k'`` / ``expr ->> 'k'`` to get_json_object.

    Innermost-first is unnecessary: rewriting strictly left-to-right
    makes a chained ``a->'b'->>'c'`` naturally nest, because after the
    first rewrite the LHS of the second arrow ends with ``)`` and the
    balanced-paren scan captures the whole ``get_json_object(...)``.
    """
    while True:
        m = _ARROW_RE.search(s)
        if m is None:
            return s
        lhs_start = _scan_lhs(s, m.start())
        lhs = s[lhs_start : m.start()].strip()
        rest = s[m.end() :]
        if m.group(0) == "->" and _is_lambda_arrow(s, lhs_start, lhs):
            s = s[: m.start()] + "\x03" + s[m.end() :]
            continue
        if lhs.upper() in _RESERVED:
            # the backward scan hit a keyword, not an operand — this
            # arrow has no translatable LHS; leave it for Spark's error
            s = s[: m.start()] + "\x03" + s[m.end() :]
            continue
        km = _KEY_LIT_RE.match(rest)
        if km and lhs:
            key = literals[int(km.group(1))][1:-1]  # strip quotes
            path = f"'$.{key}'"
        else:
            km = _KEY_INT_RE.match(rest)
            if km is None or not lhs:
                # not a shape we understand: leave this arrow alone by
                # masking it out of further scanning
                s = s[: m.start()] + "\x03" + s[m.end() :]
                continue
            path = f"'$[{km.group(1)}]'"
        literals.append(path)
        placeholder = _MASK.format(len(literals) - 1)
        s = (
            s[:lhs_start]
            + f"get_json_object({lhs}, {placeholder})"
            + rest[km.end() :]
        )


def _balanced_end(s: str, open_idx: int) -> int:
    """Index of the ``)`` matching the ``(`` at ``open_idx`` (-1: none)."""
    depth = 0
    for j in range(open_idx, len(s)):
        if s[j] == "(":
            depth += 1
        elif s[j] == ")":
            depth -= 1
            if depth == 0:
                return j
    return -1


_ARRAY_CALL_RE = None  # built lazily from ARRAY_FUNCS


def _array_call_re() -> re.Pattern:
    global _ARRAY_CALL_RE
    if _ARRAY_CALL_RE is None:
        names = "|".join(ARRAY_FUNCS)
        _ARRAY_CALL_RE = re.compile(rf"(?i)\b({names})\s*\(")
    return _ARRAY_CALL_RE


def _len_to_size(s: str) -> str:
    """``len(<array-producing call>)`` -> ``size(...)`` (heuristic)."""
    edits = []
    for m in re.finditer(r"(?i)\blen\s*\(", s):
        inner = s[m.end() :].lstrip()
        if _array_call_re().match(inner):
            edits.append(m)
    for m in reversed(edits):
        s = s[: m.start()] + "size" + s[m.start() + 3 :]
    return s


def _subscripts_to_element_at(s: str) -> str:
    """``<array call>(...)[n]`` -> ``element_at(<array call>(...), n)``."""
    while True:
        changed = False
        for m in _array_call_re().finditer(s):
            open_idx = s.index("(", m.end() - 1)
            close = _balanced_end(s, open_idx)
            if close < 0:
                continue
            sub = re.match(r"\[(\d+)\]", s[close + 1 :])
            if sub:
                call = s[m.start() : close + 1]
                s = (
                    s[: m.start()]
                    + f"element_at({call}, {sub.group(1)})"
                    + s[close + 1 + sub.end() :]
                )
                changed = True
                break
        if not changed:
            return s


def _epoch_with_cast(s: str) -> str:
    """``epoch(x)`` -> ``unix_seconds(cast(x as timestamp))`` (same for
    epoch_ms/unix_millis) — the cast bridges Spark's TIMESTAMP_NTZ
    parquet reads (identity under the pinned UTC session timezone)."""
    # epoch returns FRACTIONAL double seconds in DuckDB, so the faithful
    # Spark form is unix_micros/1e6, not the truncating unix_seconds
    templates = (
        ("epoch_ms", "unix_millis(cast({} as timestamp))"),
        ("epoch", "(unix_micros(cast({} as timestamp)) / 1000000.0)"),
    )
    for src, template in templates:
        while True:
            m = re.search(rf"(?i)\b{src}\s*\(", s)
            if m is None:
                break
            open_idx = s.index("(", m.end() - 1)
            close = _balanced_end(s, open_idx)
            if close < 0:
                break
            inner = s[open_idx + 1 : close]
            s = s[: m.start()] + template.format(inner) + s[close + 1 :]
    return s


def to_spark_sql(sql: str) -> str:
    """Translate DuckDB-flavored SQL into Spark SQL (best effort)."""
    masked, literals = _mask_literals(sql)

    # record which masked literals are strftime FORMAT arguments before
    # any rewriting, while the call name is still 'strftime'. Only the
    # second top-level argument qualifies — a literal inside the first
    # argument (e.g. a LIKE pattern in a CASE) must not be touched.
    fmt_ids: set[int] = set()
    for m in re.finditer(r"(?i)\bstrftime\s*\(", masked):
        depth = 0
        arg_no = 1
        seg_start = m.end()
        for j in range(m.end() - 1, len(masked)):
            ch = masked[j]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            elif ch == "," and depth == 1:
                arg_no += 1
                seg_start = j + 1
        if arg_no >= 2:
            # literals inside the LAST top-level argument segment
            # (DuckDB strftime is (ts, fmt) — the fmt arg is final)
            for lm in _MASK_RE.finditer(masked[seg_start:j]):
                fmt_ids.add(int(lm.group(1)))

    # integer division (DuckDB `//`) -> Spark `div`
    masked = re.sub(r"//", " div ", masked)

    # JSON arrows
    masked = _rewrite_arrows(masked, literals)
    masked = masked.replace("\x03", "->")  # restore untranslatable arrows

    # function renames
    for src, dst in FUNCTION_RENAMES:
        masked = re.sub(rf"(?i)\b{src}\b(?=\s*\()", dst, masked)

    # type-heuristic passes over the renamed text
    masked = _len_to_size(masked)
    masked = _subscripts_to_element_at(masked)
    masked = _epoch_with_cast(masked)

    # bare VARCHAR (no length) -> STRING; Spark only accepts VARCHAR(n)
    masked = re.sub(r"(?i)\bVARCHAR\b(?!\s*\()", "STRING", masked)

    # star EXCLUDE -> EXCEPT; DuckDB allows a paren-free column list,
    # Spark's EXCEPT requires the parens — add them when missing
    masked = re.sub(
        r"(?i)(\*\s+)EXCLUDE\s*\(",
        r"\1EXCEPT (",
        masked,
    )
    # DuckDB's paren-free form takes exactly ONE column (a comma after
    # it starts the next select item, so a list capture would be wrong)
    masked = re.sub(
        r"(?i)(\*\s+)EXCLUDE\s+([A-Za-z_]\w*)",
        r"\1EXCEPT (\2)",
        masked,
    )

    # strftime format literals -> JVM patterns
    for i in fmt_ids:
        lit = literals[i]
        for pct, jvm in STRFTIME_MAP:
            lit = lit.replace(pct, jvm)
        literals[i] = lit

    return _unmask(masked, literals)

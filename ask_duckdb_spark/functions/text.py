"""Reusable text column expressions (JVM-side, no UDFs)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Explicit whitespace class for EVERY cross-engine tokenization regex
#: (ADVICE r7, generalized in r8): ``\s`` is engine-dialect — Java's
#: is exactly [ \t\n\x0B\f\r] while DuckDB's RE2 ``\s`` is
#: [ \t\n\f\r] WITHOUT \x0B (vertical tab) — so any shared-tokenizer
#: oracle pair silently split token boundaries on \x0B-bearing text.
#: This class IS Java's \s, so every Spark-side swap is a semantic
#: no-op; the DuckDB-side swap adds \x0B, aligning the two engines.
#: Escapes, not raw control chars, so the class survives SQL-source
#: embedding readably; both regex dialects parse them identically.
WS_CLASS = "[ \\t\\n\\r\\x0B\\f]"
WS_RX = WS_CLASS + "+"
#: The same regex escaped one level deeper, for embedding inside a
#: Spark-SQL string literal (selectExpr fragments): SQL '\\t' -> Java
#: regex \t.
WS_RX_SPARKSQL = WS_RX.replace("\\", "\\\\")


def tokens(col) -> Column:
    """Whitespace tokens of a lowercased text column (array<string>).

    The shared tokenizer of the text-analysis operators — one
    definition so language-ID, quality scoring, term frequencies, and
    TF-IDF all segment identically. Splits on ``WS_RX`` (explicit
    class, portable to the DuckDB oracle tokenizer).
    """
    return F.filter(F.split(F.lower(col), WS_RX), lambda t: t != "")


def char_ngrams(col, k: int) -> Column:
    """Character k-grams of a text column (array<string>; ≥1 element)."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(col) - F.lit(k - 1), F.lit(1))),
        lambda i: col.substr(i, F.lit(k)),
    )

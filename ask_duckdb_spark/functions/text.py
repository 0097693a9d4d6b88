"""Reusable text column expressions (JVM-side, no UDFs)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(col) -> Column:
    """Whitespace tokens of a lowercased text column (array<string>).

    The shared tokenizer of the text-analysis operators — one
    definition so language-ID, quality scoring, term frequencies, and
    TF-IDF all segment identically.
    """
    return F.filter(F.split(F.lower(col), r"\s+"), lambda t: t != "")


def char_ngrams(col, k: int) -> Column:
    """Character k-grams of a text column (array<string>; ≥1 element)."""
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(col) - F.lit(k - 1), F.lit(1))),
        lambda i: col.substr(i, F.lit(k)),
    )

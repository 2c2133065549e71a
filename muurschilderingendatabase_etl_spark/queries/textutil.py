"""Linear-time n-gram / sliding-window expression builders.

The textbook Spark formulation
``transform(sequence(0, n-k), i -> f(element_at(w, i+1), …))`` has a
performance trap: Catalyst's projection collapsing re-inlines whatever
expression produced ``w`` (e.g. ``split(text, ' ')``) into EVERY
``element_at`` call inside the lambda — even when the caller projected
``w`` as its own column first — turning an O(n) pass into O(n²) per
document. Measured on the 3-gram shingle phase of dedup_minhash_lsh at
sf1 (50k docs): 43 s → 3.5 s after switching to the slice + zip_with
forms below, which touch each element O(k) times no matter what fed the
column. A second win: ``sequence(0, -1)`` counts DOWN, so the textbook
form crashes on arrays shorter than k; slice lengths clamp at 0 and
yield an empty result instead.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def word_ngrams(words: Column | str, k: int, sep: str = " ") -> Column:
    """Order-preserving array of ``k``-gram strings (joined by ``sep``)
    over a words array — ``n-k+1`` entries, empty when ``n < k``.
    Built from ``k`` shifted slices combined element-wise, one zip_with
    per extra gram position."""
    w = _col(words)
    cnt = F.greatest(F.size(w) - (k - 1), F.lit(0))
    acc = F.slice(w, 1, cnt)
    for j in range(1, k):
        acc = F.zip_with(
            acc, F.slice(w, j + 1, cnt), lambda x, y: F.concat_ws(sep, x, y)
        )
    return acc


def sliding_min(arr: Column | str, k: int) -> Column:
    """Minimum over each length-``k`` sliding window of a numeric array
    (``n-k+1`` entries, empty when ``n < k``) — element-wise ``least``
    over ``k`` shifted slices, same linear-cost rationale as
    ``word_ngrams``."""
    a = _col(arr)
    cnt = F.greatest(F.size(a) - (k - 1), F.lit(0))
    acc = F.slice(a, 1, cnt)
    for j in range(1, k):
        acc = F.zip_with(
            acc, F.slice(a, j + 1, cnt), lambda x, y: F.least(x, y)
        )
    return acc

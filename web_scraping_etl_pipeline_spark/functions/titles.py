"""C1 - job-title cleaning as a native Column expression.

Reference semantics (/root/reference/src/utils.py:8-16):

1. ``re.search(r'([\\w\\s./-]+(?:\\s*(?:\\/|-)\\s*[\\w\\s./-]*)*)', title)``
   - first run of word/space/``.``/``/``/``-`` characters (with ``/``- or
   ``-``-joined continuations).
2. On a match: ``group(1).strip()``, then keep only the segment before
   the first ``' - '``, then strip again.
3. No match (pure-symbol/unicode-punctuation title): ``title.strip()``.

Net effect: drop trailing " - Up to $2,000" / " - Hà Nội" style junk.

Regex-dialect note: Python ``re`` treats ``\\w``/``\\s`` as Unicode; Java
defaults them to ASCII. The ``(?U)`` flag makes Java match Python here
(Vietnamese titles like "Kỹ Sư Phần Mềm" keep their letters). Verified
against golden strings in tests/test_functions_titles.py.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_PATTERN = r"(?U)([\w\s./-]+(?:\s*(?:\/|-)\s*[\w\s./-]*)*)"


def clean_title(title: Column) -> Column:
    """Vectorized equivalent of the reference's ``clean_title``."""
    extracted = F.regexp_extract(title, _PATTERN, 1)
    # regexp_extract yields '' on no-match -> reference's fallback branch
    cleaned = F.trim(F.element_at(F.split(F.trim(extracted), " - "), 1))
    return F.when(extracted == "", F.trim(title)).otherwise(cleaned)

"""Build the ADVERSARIAL-TEXT degenerate fixture (round 12, the next
census layer after 0-row / 1-row / all-duplicates): the first 32
template rows of every table, unchanged EXCEPT ``documents.text``,
which cycles through pathological-but-IN-CONTRACT strings (any string
is a valid scraped document), with ``n_chars`` kept consistent
(= length of the new text):

- empty string and whitespace-only variants (the classic engine gap:
  one engine's split('') yields [''], another's yields [])
- a single character / a single repeated stopword
- punctuation-only, digits-only
- Vietnamese diacritics (the reference's own domain) and combining
  marks
- a burst of 1-character tokens

Text-derived operators (tokenizers, shinglers, n-gram models,
language-ID, quality scores, entropy, BPE) all share regex/split
semantics that ONLY these shapes exercise - the real corpus never
contains an empty or whitespace-only document.

    python tools/text_fixture.py /tmp/sf_text [template] [n]
    python tools/oracle_check.py --json DEGENERATE_SWEEP_TEXT.json /tmp/sf_text
"""

from __future__ import annotations

import glob
import os
import sys

#: the pathological cycle. Kept SHORT (longest ~60 chars) so pair
#: fan-outs stay trivial; every entry is a string a scraper could
#: genuinely emit.
PATHOLOGICAL_TEXTS = [
    "",
    " ",
    "\t \n",
    "a",
    "!!! ??? ... ;;;",
    "12345 67890",
    "the the the the the the the the",
    "Hồ Chí Minh ở đây có dấu",
    "x y z w v u t s r q p o n m l k j i h g f e d c b a",
    "  leading and   trailing   spaces  ",
    "one-token",
    "mixed CASE Tokens MIXED case tokens",
]


def build(
    out_dir: str,
    template: str = "/root/testdata/sf0.001",
    n: int = 32,
) -> list[str]:
    import duckdb
    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)
    written = []
    con = duckdb.connect()
    # registered frame, not SQL literals: control characters (tab /
    # newline) must arrive VERBATIM, and {t!r} would ship the
    # backslash escapes as literal text
    con.register(
        "pat",
        pd.DataFrame(
            {
                "i": range(len(PATHOLOGICAL_TEXTS)),
                "t": PATHOLOGICAL_TEXTS,
            }
        ),
    )
    for path in sorted(glob.glob(os.path.join(template, "*.parquet"))):
        name = os.path.basename(path)
        if name == "documents.parquet":
            # QUALIFY on the windowed row number, never bare LIMIT:
            # LIMIT after a window is scan-order-dependent, and a
            # nondeterministic kept-set could silently drop the
            # pathological texts the layer exists for (code-review
            # r12) - the census would then go green vacuously.
            sel = f"""
            WITH src AS (
              SELECT *, ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS _rn
              FROM read_parquet('{path}')
              QUALIFY _rn < {int(n)}
            )
            SELECT src.* EXCLUDE (text, n_chars, _rn),
                   pat.t AS text,
                   CAST(length(pat.t) AS BIGINT) AS n_chars
            FROM src JOIN pat
              ON pat.i = src._rn % {len(PATHOLOGICAL_TEXTS)}
            """
        else:
            sel = (
                f"SELECT * FROM read_parquet('{path}') "
                f"ORDER BY ALL LIMIT {int(n)}"
            )
        con.execute(
            f"COPY ({sel}) TO '{os.path.join(out_dir, name)}'"
            " (FORMAT PARQUET)"
        )
        written.append(name)
    con.close()
    return written


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf_text"
    tpl = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    print(f"wrote {len(build(out, tpl, n))} tables to {out}")

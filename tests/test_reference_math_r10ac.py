"""Independent brute-force reference, round 10 batch AC: q301
tokenizer fertility - the learned-BPE APPLICATION stage, closing the
train/apply pair (the r9 q300 reference covers training; this one
re-trains the same 10 merges from scratch AND re-applies them to
every distinct word, so a drift in either half shows up).
"""

from __future__ import annotations

import re

import duckdb
import pytest

from tests.conftest import SF_DIR


def _pdf(table: str, cols: str = "*"):
    con = duckdb.connect()
    return con.execute(
        f"SELECT {cols} FROM read_parquet('{SF_DIR}/{table}.parquet')"
    ).df()


def _q(spark, name):
    from __spark_entry__ import queries

    return queries()[name](spark, SF_DIR)


def test_q301_fertility_matches_retrained_bpe(spark):
    rows = {
        r["source"]: r
        for r in _q(spark, "q301_tokenizer_fertility").collect()
    }
    docs = _pdf("documents", "source, text")
    freq: dict[str, int] = {}
    census: dict[tuple[str, str], int] = {}
    for s, text in zip(docs["source"], docs["text"]):
        for w in re.split(r"\s+", str(text).strip().lower()):
            freq[w] = freq.get(w, 0) + 1
            census[(s, w)] = census.get((s, w), 0) + 1
    # train: the classic Sennrich loop, 10 merges (the r9 q300 ref)
    syms = {w: list(w) for w in freq}

    def apply(s, l, r):
        out, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(s[i])
                i += 1
        return out

    merges = []
    for _ in range(10):
        counts: dict[tuple[str, str], int] = {}
        for w, f in freq.items():
            s = syms[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], f"{p[0]} {p[1]}"))
        merges.append(best)
        for w in syms:
            syms[w] = apply(syms[w], *best)
    # apply: tokenize every distinct word with the merge chain
    n_tok = {w: len(s) for w, s in syms.items()}
    agg: dict[str, list[int]] = {}
    for (s, w), cnt in census.items():
        cell = agg.setdefault(s, [0, 0, 0])
        cell[0] += cnt
        cell[1] += cnt * n_tok[w]
        cell[2] += cnt * len(w)
    assert set(rows) == set(agg)
    for s, (nw, nt, nc) in agg.items():
        row = rows[s]
        assert row["n_words"] == nw
        assert row["n_tokens"] == nt
        assert row["n_chars"] == nc
        assert row["fertility"] == pytest.approx(nt / nw, abs=1.1e-6)
        assert row["chars_per_token"] == pytest.approx(
            nc / nt, abs=1.1e-6
        )

"""Trained-BPE tokenization (round 5).

``bpe_token_count`` (dedup.py) counts PRETOKENS — the unit a BPE
vocabulary would split further. This module applies real corpus-trained
merge rules (``models/bpe_merges.json``, produced deterministically by
``tools/train_bpe.py``) with the canonical greedy algorithm: repeatedly
find the lowest-rank merge whose pair occurs in the word and merge ALL
its occurrences left-to-right, until no trained merge applies — the
GPT-2 ``bpe()`` loop. Note this is NOT "apply each merge once in
training order": a later merge can assemble the operand of an earlier
one (e.g. merges ``(a,b)`` then ``(ab,ab)`` on ``a b ab``), and the
canonical loop goes back for it.

Spark seam: the merge table is tiny (a closure constant serialized with
the Arrow-batched ``pandas_udf`` — same broadcast discipline as the
charlm_lite weights in model_udf.py), and each executor process caches
tokenizations per distinct pretoken, so the per-batch cost is
proportional to the batch's distinct-word set, not its length. The
DuckDB oracle replays the identical algorithm as a recursive CTE over a
separator-wrapped token string (see :func:`bpe_sql_ctes`) — both
engines are value-compared per doc on token count AND an md5 of the
full token stream.
"""

from __future__ import annotations

import hashlib
import json
import os
import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import BPE_TOKEN_PATTERN, ensure_parallelism


def default_merges_path() -> str:
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "models", "bpe_merges.json")


def load_merges(path: str | None = None) -> list[tuple[str, str]]:
    with open(path or default_merges_path()) as f:
        return [tuple(m) for m in json.load(f)]


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Canonical greedy BPE apply: merge all occurrences of the
    best-ranked present pair, repeat to fixpoint."""
    toks = list(word)
    while len(toks) > 1:
        best: tuple[int, tuple[str, str]] | None = None
        for p in zip(toks, toks[1:]):
            r = ranks.get(p)
            if r is not None and (best is None or r < best[0]):
                best = (r, p)
        if best is None:
            break
        a, b = best[1]
        out: list[str] = []
        i = 0
        while i < len(toks):
            if i < len(toks) - 1 and toks[i] == a and toks[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(toks[i])
                i += 1
        toks = out
    return toks


def bpe_profile(df: DataFrame,
                merges: list[tuple[str, str]] | None = None,
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Per-doc trained-BPE profile: (id, ``n_bpe_true_tokens``,
    ``bpe_stream_md5``) where the md5 digests the chr(31)-joined token
    stream in document order — a value-exact signature of the full
    tokenization, compact enough for the driver compare.

    One Arrow-batched projection, zero shuffle; the per-process
    distinct-word cache (capped) amortizes merge application across
    batches exactly where a real tokenizer would.
    """
    if merges is None:
        merges = load_merges()
    ranks = {tuple(m): i for i, m in enumerate(merges)}

    @F.pandas_udf("n_bpe_true_tokens long, bpe_stream_md5 string")
    def _prof(texts: pd.Series) -> pd.DataFrame:
        # re.ASCII pins \s to the ASCII class both OTHER engines use
        # (Java regex in bpe_token_count, RE2 in the DuckDB oracle);
        # Python's default Unicode \s would pretokenize NBSP etc.
        # differently and diverge the value compare
        pat = re.compile(BPE_TOKEN_PATTERN, re.ASCII)
        cache: dict[str, list[str]] = {}
        ns: list[int] = []
        hs: list[str] = []
        for t in texts:
            stream: list[str] = []
            for w in pat.findall(t or ""):
                toks = cache.get(w)
                if toks is None:
                    if len(cache) > 1 << 17:
                        cache.clear()
                    toks = encode_word(w, ranks)
                    cache[w] = toks
                stream.extend(toks)
            ns.append(len(stream))
            hs.append(hashlib.md5(
                "\x1f".join(stream).encode("utf-8")).hexdigest())
        return pd.DataFrame(
            {"n_bpe_true_tokens": ns, "bpe_stream_md5": hs})

    # a small parquet scan is one task; the tokenizer is CPU-bound
    # Python, so spread narrow inputs before the projection (same
    # policy as the shingle/simhash kernels)
    return ensure_parallelism(df).select(
        F.col(id_col), _prof(F.col(text_col)).alias("_p")
    ).select(id_col, "_p.n_bpe_true_tokens", "_p.bpe_stream_md5")


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def bpe_sql_ctes(merges: list[tuple[str, str]] | None = None,
                 src: str = "documents",
                 text_expr: str = "text") -> str:
    """DuckDB CTE chain replaying the canonical greedy BPE over
    ``{src}(doc_id, text)`` — terminates in ``bpe_doc(doc_id,
    n_bpe_true_tokens, bpe_stream_md5)``. Embed after a ``WITH
    RECURSIVE``.

    Word states live in a separator-wrapped string (each token as
    ``chr(31)+tok+chr(31)`` concatenated), so merging all left-to-right
    occurrences of a pair is one non-overlapping ``replace`` — the
    wrapped form is what makes adjacent occurrences not share boundary
    characters. Each recursive step applies the min-rank merge whose
    pattern the state contains; states with no applicable merge
    terminate the recursion and are selected by NOT EXISTS. Cost is
    per DISTINCT pretoken, joined back to occurrences for the per-doc
    rollup."""
    if merges is None:
        merges = load_merges()
    vals = ", ".join(
        f"({i + 1}, {_sql_quote(a)}, {_sql_quote(b)})"
        for i, (a, b) in enumerate(merges))
    pat = (r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+")
    return rf"""bpe_merges(rank, a, b) AS (
  SELECT * FROM (VALUES {vals}) m(rank, a, b)
), bpe_pret AS (
  SELECT doc_id, unnest(l) AS w,
         unnest(generate_series(1, len(l))) AS pos
  FROM (SELECT doc_id,
          regexp_extract_all({text_expr}, '{pat}') AS l
        FROM {src})
), bpe_words AS (SELECT DISTINCT w FROM bpe_pret),
bpe_steps AS (
  -- 's' flag: RE2's '.' excludes newline by default, which would
  -- leave \n pretokens unwrapped and desync count + stream hash
  SELECT w, regexp_replace(w, '(.)', chr(31) || '\1' || chr(31), 'gs') AS s
  FROM bpe_words
  UNION ALL
  SELECT st.w,
    replace(st.s, chr(31)||m.a||chr(31)||chr(31)||m.b||chr(31),
            chr(31)||m.a||m.b||chr(31)) AS s
  FROM (
    SELECT w, s,
      (SELECT min(m2.rank) FROM bpe_merges m2
       WHERE contains(s, chr(31)||m2.a||chr(31)||chr(31)||m2.b||chr(31)))
      AS br
    FROM bpe_steps
  ) st JOIN bpe_merges m ON m.rank = st.br
), bpe_final AS (
  SELECT w,
    CAST((length(s) - length(replace(s, chr(31), ''))) / 2 AS BIGINT)
      AS n_toks,
    replace(trim(s, chr(31)), chr(31)||chr(31), chr(31)) AS tok_str
  FROM bpe_steps st
  WHERE NOT EXISTS (SELECT 1 FROM bpe_merges m
    WHERE contains(st.s, chr(31)||m.a||chr(31)||chr(31)||m.b||chr(31)))
), bpe_doc AS (
  SELECT p.doc_id,
    CAST(sum(f.n_toks) AS BIGINT) AS n_bpe_true_tokens,
    md5(string_agg(f.tok_str, chr(31) ORDER BY p.pos)) AS bpe_stream_md5
  FROM bpe_pret p JOIN bpe_final f ON p.w = f.w
  GROUP BY p.doc_id
)"""

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


BPE_UNK_ID = 0
_BPE_MERGE_ID_BASE = 129  # ids 1..128 = ASCII chr(0..127)+1, 0 = <unk>


def bpe_vocab(merges: list[tuple[str, str]] | None = None
              ) -> dict[str, int]:
    """Deterministic trained-vocabulary id table: id 0 is ``<unk>``
    (non-ASCII base characters), ids 1..128 are the ASCII base alphabet
    (``chr(c) -> c+1``), ids 129.. are the merge products in rank
    order. Engine-portable by construction — the DuckDB oracle derives
    the same table from the merges VALUES (product string = ``a||b``)
    plus the codepoint rule, no committed vocab file needed. Every
    multi-character token a greedy BPE apply can emit IS some merge's
    product, so the table is total over tokenizer output."""
    if merges is None:
        merges = load_merges()
    vocab = {chr(c): c + 1 for c in range(128)}
    for i, (a, b) in enumerate(merges):
        prod = a + b
        assert prod not in vocab, f"duplicate merge product {prod!r}"
        vocab[prod] = _BPE_MERGE_ID_BASE + i
    return vocab


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
            # chr(31) is the stream-hash separator here AND the
            # structural separator of the oracle's wrapped word state;
            # an input U+001F would be captured by the punctuation
            # pretoken class and desync both (round-5 advice). Strip it
            # in BOTH engines before pretokenizing.
            for w in pat.findall((t or "").replace("\x1f", "")):
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


def bpe_token_arrays(df: DataFrame,
                     merges: list[tuple[str, str]] | None = None,
                     id_col: str = "doc_id",
                     text_col: str = "text",
                     drop_empty: bool = True,
                     out_toks: str = "toks",
                     out_ids: str = "ids") -> DataFrame:
    """(id, toks, ids, n_tokens) — each document's TRAINED-BPE token
    stream as parallel string/id arrays, the packing-facing face of the
    tokenizer (round 6: this is what wires real subword ids through
    ``pack_chunks``/``materialize_packs``/``write_training_shards``
    instead of the hashing-trick whitespace ids the round-5 layer
    shipped). Ids come from :func:`bpe_vocab` (committed merges — no
    fitted table to join, no literal-heavy Catalyst map); the token
    walk is the same cached greedy apply as :func:`bpe_profile`, one
    Arrow-batched projection, zero shuffle.

    ``drop_empty`` mirrors ``doc_token_arrays``' contract (packing
    layouts exclude zero-token docs); pass False where empty rows must
    survive (per-turn SFT tokenization — an empty turn still renders
    its role tag)."""
    if merges is None:
        merges = load_merges()
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    vocab = bpe_vocab(merges)

    @F.pandas_udf(f"{out_toks} array<string>, {out_ids} array<long>")
    def _tok(texts: pd.Series) -> pd.DataFrame:
        pat = re.compile(BPE_TOKEN_PATTERN, re.ASCII)
        cache: dict[str, list[str]] = {}
        ts: list[list[str]] = []
        ids: list[list[int]] = []
        for t in texts:
            stream: list[str] = []
            for w in pat.findall((t or "").replace("\x1f", "")):
                toks = cache.get(w)
                if toks is None:
                    if len(cache) > 1 << 17:
                        cache.clear()
                    toks = encode_word(w, ranks)
                    cache[w] = toks
                stream.extend(toks)
            ts.append(stream)
            ids.append([vocab.get(tok, BPE_UNK_ID) for tok in stream])
        return pd.DataFrame({out_toks: ts, out_ids: ids})

    out = ensure_parallelism(df).select(
        F.col(id_col), _tok(F.col(text_col)).alias("_b")
    ).select(id_col, f"_b.{out_toks}", f"_b.{out_ids}")
    if drop_empty:
        out = out.filter(F.size(out_toks) > 0)
    return out.withColumn(
        "n_tokens", F.size(out_toks).cast("long"))


def distributed_word_counts(df: DataFrame, id_col: str = "doc_id",
                            text_col: str = "text") -> DataFrame:
    """(word, cnt) distinct-pretoken occurrence counts — the trainer's
    ONLY corpus-proportional step, entirely JVM-side: one
    ``regexp_extract_all`` explode + one hash aggregate (map-side
    partial combine for free). Java regex ``\\s`` is ASCII — the same
    semantics ``re.ASCII`` pins on the Python apply side — and U+001F
    is stripped exactly as the apply/profile kernels strip it."""
    return (df.select(
        F.explode(F.regexp_extract_all(
            F.regexp_replace(F.col(text_col), "\x1f", ""),
            F.lit(f"({BPE_TOKEN_PATTERN})"), F.lit(1))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt")))


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct(a,b)> of adjacent symbol pairs (empty for 1-symbol
    words — ``slice`` with length 0 is an empty array)."""
    return F.zip_with(
        F.slice(syms, 1, F.size(syms) - 1),
        F.slice(syms, 2, F.size(syms) - 1),
        lambda x, y: F.struct(x.alias("a"), y.alias("b")))


def _merge_fold(syms: Column, a: str, b: str) -> Column:
    """Apply merge (a, b) to a symbol array: non-overlapping
    left-to-right, all occurrences — the same semantics as
    :func:`encode_word`'s inner loop, as one Catalyst ``aggregate``
    fold (merge when the accumulator's last element is ``a`` and the
    incoming symbol is ``b``; the freshly merged ``a+b`` is strictly
    longer than ``a``, so it can never immediately re-match as the
    left operand — exactly the index-skip of the imperative walk)."""
    la, lb, lab = F.lit(a), F.lit(b), F.lit(a + b)
    return F.aggregate(
        syms, F.array().cast("array<string>"),
        lambda acc, s: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == la) & (s == lb),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(lab)),
        ).otherwise(F.concat(acc, F.array(s))))


def train_merges_distributed(docs: DataFrame, n_merges: int,
                             id_col: str = "doc_id",
                             text_col: str = "text",
                             resume_dir: str | None = None,
                             fail_after_merge: int | None = None
                             ) -> list[tuple[str, str]]:
    """Sennrich-style BPE TRAINING as a Spark job — the corpus-scale
    face of ``tools/train_bpe.py`` (whose in-memory trainer collects
    every text to the driver; byte-identical output pinned by test and
    by the tool's ``--distributed`` self-check against the committed
    model).

    Shape: the corpus is scanned ONCE (:func:`distributed_word_counts`
    — the only step proportional to corpus size); training then
    iterates over the DISTINCT-WORD table. Per merge: the argmax pair
    is one 1-row TakeOrdered over the persisted pair-count table
    (deterministic tie-break: max count, then lexicographically
    smallest (a, b) — the Python trainer's exact rule), and pair
    counts are maintained by DELTAS from the words that actually
    contain the merged pair (old adjacencies out, new adjacencies in)
    — never recounted from scratch, so per-iteration compute is
    O(changed words) + one pair-table aggregate, not O(corpus) or
    O(total symbol occurrences). Lineage is truncated per iteration
    (alternating parquet dirs under the session checkpoint dir when
    one is set — real-cluster mode — else ``localCheckpoint``),
    bounded at two copies per state table; scratch dirs are released
    via the usual ``release_indexes`` hook.

    The per-iteration words-table rewrite materializes O(vocab) rows —
    the honest cost of immutable state; at 100 TB the vocab table is
    millions of rows where the corpus is billions, and the expensive
    thing (rescanning text or recounting all pairs) never happens.

    ``resume_dir`` (round 6): a stable directory makes the training
    RESUMABLE — state tables go to alternating parquet slots under it,
    and after each merge a ``state.json`` naming the merges so far and
    the live slot parity is committed atomically (write-tmp → rename).
    Because iteration i+1 writes the OTHER slot parity, a crash at any
    point leaves the committed slot intact; a restarted call replays
    at most one merge and lands on the identical merge sequence
    (pinned with injected crashes in tests/test_bpe.py). The dir is
    per-JOB: state carries the word/pair tables, not the corpus
    identity — resuming against a different corpus is the caller's
    error. ``fail_after_merge`` injects a crash AFTER merge k's
    commit.
    """
    import json
    import os
    import uuid

    from .indexes import track_scratch_dir

    spark = docs.sparkSession
    ckpt_dir = spark.sparkContext.getCheckpointDir()
    state = {"i": 0}
    merges: list[tuple[str, str]] = []
    if resume_dir is not None:
        base = resume_dir

        def _ckpt(df: DataFrame, slot: str) -> DataFrame:
            p = f"{base}/{slot}-{state['i'] % 2}"
            df.write.mode("overwrite").parquet(p)
            return spark.read.parquet(p)

        os.makedirs(base, exist_ok=True)
        st_path = os.path.join(base, "state.json")
        if os.path.exists(st_path):
            with open(st_path) as f:
                st = json.load(f)
            merges = [tuple(m) for m in st["merges"]]
            if len(merges) >= n_merges:
                return merges[:n_merges]
            state["i"] = st["i"]
            words = spark.read.parquet(
                f"{base}/words-{state['i'] % 2}")
            pairs = spark.read.parquet(
                f"{base}/pairs-{state['i'] % 2}")
    elif ckpt_dir is not None:
        base = f"{ckpt_dir.rstrip('/')}/bpe-{uuid.uuid4().hex}"
        track_scratch_dir(spark, base)

        def _ckpt(df: DataFrame, slot: str) -> DataFrame:
            p = f"{base}/{slot}-{state['i'] % 2}"
            df.write.mode("overwrite").parquet(p)
            return spark.read.parquet(p)
    else:

        def _ckpt(df: DataFrame, slot: str) -> DataFrame:
            # lazy: materializes (and truncates lineage) inside the
            # next action that reads it — the per-merge argmax collect
            # — instead of one eager job per state table (r7: the
            # 6-merge bench entry ran ~28 driver jobs whose stage work
            # summed to <0.2 s; fusing the two per-merge checkpoint
            # jobs into the collect cuts the scheduling overhead
            # without changing any state table's contents)
            return df.localCheckpoint(eager=False)

    def _commit_state() -> None:
        if resume_dir is None:
            return
        tmp = os.path.join(base, "_tmp-state.json")
        with open(tmp, "w") as f:
            json.dump({"i": state["i"], "merges": merges}, f,
                      separators=(",", ":"))
        os.replace(tmp, os.path.join(base, "state.json"))

    pair_rows = (lambda w: w.select(
        F.explode(_adjacent_pairs(F.col("syms"))).alias("p"), "cnt")
        .select("p.a", "p.b", "cnt"))
    if "words" not in locals():
        chars = F.transform(
            F.sequence(F.lit(1), F.length("word")),
            lambda i: F.col("word").substr(i, F.lit(1)))
        words = _ckpt(
            distributed_word_counts(docs, id_col, text_col)
            .select("word", chars.alias("syms"), "cnt"), "words")
        pairs = _ckpt(
            pair_rows(words).groupBy("a", "b")
            .agg(F.sum("cnt").alias("cnt")), "pairs")
    n_word_parts = max(1, words.rdd.getNumPartitions())

    for it in range(len(merges), n_merges):
        best = pairs.filter(F.col("cnt") > 0) \
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b")) \
            .limit(1).collect()
        if not best:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        has_pair = F.exists(
            _adjacent_pairs(F.col("syms")),
            lambda p: (p["a"] == F.lit(a)) & (p["b"] == F.lit(b)))
        changed = words.filter(has_pair)
        rewritten = changed.select(
            "word", _merge_fold(F.col("syms"), a, b).alias("syms"), "cnt")
        deltas = (
            pair_rows(changed).select("a", "b", (-F.col("cnt")).alias("cnt"))
            .unionAll(pair_rows(rewritten))
        )
        state["i"] += 1
        new_pairs = _ckpt(
            pairs.unionAll(deltas).groupBy("a", "b")
            .agg(F.sum("cnt").alias("cnt"))
            .filter(F.col("cnt") != 0), "pairs")
        # unionAll SUMS partition counts and checkpoints preserve them —
        # without the coalesce the words table doubles its partition
        # count every merge (measured: 4097 tasks/stage by merge 13 at
        # sf0.01, 145 s for 16 merges vs ~25 s pinned). groupBy re-pins
        # the pairs table to shuffle.partitions for free; words has no
        # shuffle, so pin it explicitly (narrow, no data movement).
        new_words = _ckpt(
            words.filter(~has_pair).unionAll(rewritten)
            .coalesce(n_word_parts), "words")
        pairs, words = new_pairs, new_words
        _commit_state()
        if fail_after_merge is not None and it >= fail_after_merge:
            raise RuntimeError(f"injected failure after merge {it}")
    return merges


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
  -- chr(31) stripped before pretokenizing: it is the structural
  -- separator of the wrapped word state below (and of the Spark-side
  -- stream hash); see bpe_profile
  SELECT doc_id, unnest(l) AS w,
         unnest(generate_series(1, len(l))) AS pos
  FROM (SELECT doc_id,
          regexp_extract_all(replace({text_expr}, chr(31), ''),
                             '{pat}') AS l
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


def bpe_arrays_sql_ctes() -> str:
    """CTE chain extending :func:`bpe_sql_ctes` (append after it) to
    per-document token ARRAYS with trained-vocab ids — terminates in
    ``bpe_arrays(doc_id, tl, il, n)`` where ``tl``/``il`` are the
    parallel token-string / token-id lists of :func:`bpe_token_arrays`
    and ``n`` their length. The vocab is derived in SQL exactly as
    :func:`bpe_vocab` derives it in Python: merge products (``a||b``)
    at ``128 + rank`` (the VALUES ranks are 1-based, so this equals the
    Python ``129 + i``), ASCII base characters at codepoint+1, anything
    else ``0`` (<unk>)."""
    return f""", bpe_vocab_sql AS (
  SELECT 128 + rank AS id, a || b AS tok FROM bpe_merges
), bpe_doc_tok AS (
  SELECT s.doc_id, unnest(s.tl) AS tok,
         unnest(generate_series(1, len(s.tl))) AS tpos
  FROM (SELECT p.doc_id,
          string_split(string_agg(f.tok_str, chr(31) ORDER BY p.pos),
                       chr(31)) AS tl
        FROM bpe_pret p JOIN bpe_final f ON p.w = f.w
        GROUP BY p.doc_id) s
), bpe_doc_tok_ids AS (
  SELECT d.doc_id, d.tpos, d.tok,
    CAST(COALESCE(v.id,
      CASE WHEN length(d.tok) = 1 AND unicode(d.tok) BETWEEN 0 AND 127
           THEN unicode(d.tok) + 1 ELSE {BPE_UNK_ID} END) AS BIGINT)
      AS tid
  FROM bpe_doc_tok d LEFT JOIN bpe_vocab_sql v ON d.tok = v.tok
), bpe_arrays AS (
  SELECT doc_id, list(tok ORDER BY tpos) AS tl,
         list(tid ORDER BY tpos) AS il,
         CAST(count(*) AS BIGINT) AS n
  FROM bpe_doc_tok_ids GROUP BY doc_id
)"""

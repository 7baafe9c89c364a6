"""Query battery, batch 8: training-data assembly — sequence packing
and DSIR importance resampling (round 5).

Both are published-recipe training-pipeline steps with no reference
counterpart (the reference hand-curates a fixed dataset); the DuckDB
oracles replay the identical md5-keyed determinism, including the
greedy next-fit packer as a recursive CTE.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.dsir import (
    dsir_log_weights,
    dsir_resample,
    dsir_scores,
    hashed_ngram_counts,
)
from .operators.packing import (
    greedy_packs,
    materialize_greedy_packs,
    materialize_packs,
    pack_chunks,
    token_counts,  # noqa: F401 — re-exported for callers/tests
    token_counts_from_arrays,
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_SEQ_LEN = 256
_N_SHARDS = 8  # oracle-small; production default is 1024


def _stream_hash(tokens: Column) -> Column:
    """md5-hex-prefix (as BIGINT) of the space-joined token stream —
    value-exact signature of a materialized sequence, small enough for
    the driver's long columns."""
    return F.conv(
        F.substring(F.md5(F.array_join(tokens, " ")), 1, 8),
        16, 10).cast("long")


def _stream_hash31(tokens: Column) -> Column:
    """Like :func:`_stream_hash` but chr(31)-joined — the separator for
    BPE streams, whose tokens themselves contain spaces (the tokenizer
    strips U+001F from input, so the join is unambiguous)."""
    return F.conv(
        F.substring(F.md5(F.array_join(tokens, "\x1f")), 1, 8),
        16, 10).cast("long")


def _ids_hash(ids: Column) -> Column:
    """md5-hex-prefix (as BIGINT) of the comma-joined id stream."""
    return F.conv(
        F.substring(F.md5(F.array_join(
            F.transform(ids, lambda i: i.cast("string")), ",")), 1, 8),
        16, 10).cast("long")


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both packing disciplines over the documents table as a
    discriminated union: 'chunk' rows are the concat-and-chunk layout
    (a=tok_start, b=tok_len, c=pack_off — zero waste, docs span
    packs), 'greedy' rows the next-fit whole-document layout
    (a=pack_off, b=n_tokens, c=overflow). 'mat'/'matg' rows
    value-check the MATERIALIZED sequences each layout produces — one
    row per pack with a=token count and b=md5-prefix of the actual
    token stream (doc_id=-1; matg's c=padding need) — so the oracle
    pins not just where tokens should go but the assembled sequences
    themselves. The oracle recomputes the chunk layout from one global
    cumsum in md5-shard order, replays the greedy fill state machine
    as a recursive CTE per shard, and reassembles both streams with
    ordered string_aggs.

    Round-5 SFT arms over a documents-derived conversation fixture
    (conv_id = doc_id%50, turn_idx = doc_id//50, role cycling
    user/assistant/tool): 'conv' rows value-check
    sft.render_conversations' per-turn spans — (pack_id=conv_id,
    doc_id=turn_idx, a=tok_start, b=tok_len, c=role code) — and
    'cmask' rows the assistant-only LOSS MASK extracted by slicing the
    rendered stream with those spans (a=masked token count,
    b=md5-prefix of the masked stream, c=conversation tokens;
    doc_id=-1). The oracle recomputes offsets with a per-conversation
    window cumsum and the mask with an ordered string_agg of assistant
    content — agreeing values prove the spans index the stream
    exactly.

    Round-6 trained-tokenizer arms ('bmat'/'bconv'/'bmask'): the same
    layout → materialize → SFT-mask contract over TRAINED-BPE streams
    with real vocab ids — see the inline comment at the bmat block for
    the exact encodings."""
    from .operators.indexes import track_persist
    from .operators.packing import doc_token_arrays
    from .operators.sft import assistant_mask, render_conversations

    docs = _t(spark, sf_dir, "documents")
    # r7: ONE whitespace tokenize pass. token_counts(docs) plus the two
    # materializers each re-split the corpus (three normalize+split
    # scans); the persisted array table now feeds the layout counts AND
    # both materializations — the same one-stream discipline the BPE
    # arms below already use. Counts are identical by construction
    # (size(toks) == token_counts.n_tokens; 0-token docs are filtered
    # by every layout either way), and materialize_* with a tokens_df
    # lacking an `ids` column slices exactly as the whitespace path.
    warr = track_persist(doc_token_arrays(docs))
    counts = token_counts_from_arrays(warr)
    # The layouts each feed TWO union arms (chunk+mat / greedy+matg);
    # Spark does no cross-operator CSE, so without a persist the whole
    # shard-window prefix-sum machinery executes once per arm.
    chunk_layout = track_persist(pack_chunks(counts, _SEQ_LEN, _N_SHARDS))
    greedy_layout = track_persist(greedy_packs(counts, _SEQ_LEN, _N_SHARDS))
    chunk = chunk_layout.select(
        F.lit("chunk").alias("kind"), "pack_id", "doc_id",
        F.col("tok_start").alias("a"), F.col("tok_len").alias("b"),
        F.col("pack_off").alias("c"))
    greedy = greedy_layout.select(
        F.lit("greedy").alias("kind"), "pack_id", "doc_id",
        F.col("pack_off").alias("a"), F.col("n_tokens").alias("b"),
        F.col("overflow").cast("long").alias("c"))
    mat = materialize_packs(None, chunk_layout, tokens_df=warr).select(
        F.lit("mat").alias("kind"), "pack_id",
        F.lit(-1).cast("long").alias("doc_id"),
        F.col("n_tokens").alias("a"),
        _stream_hash(F.col("tokens")).alias("b"),
        F.lit(0).cast("long").alias("c"))
    matg = materialize_greedy_packs(
        None, greedy_layout, _SEQ_LEN, tokens_df=warr).select(
        F.lit("matg").alias("kind"), "pack_id",
        F.lit(-1).cast("long").alias("doc_id"),
        F.col("n_tokens").alias("a"),
        _stream_hash(F.col("tokens")).alias("b"),
        F.col("n_pad").alias("c"))
    turns = docs.select(
        (F.col("doc_id") % 50).alias("conv_id"),
        F.floor(F.col("doc_id") / 50).cast("long").alias("turn_idx"),
        F.when(F.floor(F.col("doc_id") / 50) % 3 == 0, F.lit("user"))
        .when(F.floor(F.col("doc_id") / 50) % 3 == 1, F.lit("assistant"))
        .otherwise(F.lit("tool")).alias("role"),
        F.substring("text", 1, 120).alias("text"))
    rendered = track_persist(render_conversations(turns))
    conv = rendered.select(
        F.lit("conv").alias("kind"),
        F.col("conv_id").alias("pack_id"),
        F.explode("spans").alias("s"),
    ).select(
        "kind", "pack_id",
        F.col("s.turn_idx").cast("long").alias("doc_id"),
        F.col("s.tok_start").alias("a"),
        F.col("s.tok_len").alias("b"),
        F.when(F.col("s.role") == "user", F.lit(0))
        .when(F.col("s.role") == "assistant", F.lit(1))
        .otherwise(F.lit(2)).cast("long").alias("c"))
    cmask = assistant_mask(rendered).select(
        F.lit("cmask").alias("kind"),
        F.col("conv_id").alias("pack_id"),
        F.lit(-1).cast("long").alias("doc_id"),
        F.col("n_mask_tokens").alias("a"),
        _stream_hash(F.col("mask_tokens")).alias("b"),
        F.col("n_tokens").alias("c"))

    # Round-6 trained-tokenizer arms: the SAME layouts/materialization/
    # SFT machinery over TRAINED-BPE token streams with real vocab ids
    # (bpe.bpe_token_arrays) instead of the whitespace split. 'bmat'
    # value-checks the materialized chunk packs — a=BPE token count,
    # b=md5-prefix of the chr(31)-joined token stream, c=md5-prefix of
    # the comma-joined TRAINED-VOCAB id stream — so the shipped
    # contract (layout counts == sliced arrays == id streams) is
    # driver-attested end to end. 'bconv'/'bmask' replay the SFT spans
    # and assistant loss mask over per-turn BPE content arrays (the
    # tag token stays a single special token). The oracle replays the
    # greedy BPE merge loop per distinct pretoken (recursive CTE),
    # derives the same vocab ids from the merges table, and re-runs
    # the chunk layout over BPE counts.
    from .operators.bpe import bpe_token_arrays

    barr = track_persist(bpe_token_arrays(docs))
    blayout = pack_chunks(barr.select("doc_id", "n_tokens"),
                          _SEQ_LEN, _N_SHARDS)
    bmat = materialize_packs(None, blayout, tokens_df=barr).select(
        F.lit("bmat").alias("kind"), "pack_id",
        F.lit(-1).cast("long").alias("doc_id"),
        F.col("n_tokens").alias("a"),
        _stream_hash31(F.col("tokens")).alias("b"),
        _ids_hash(F.col("token_ids")).alias("c"))
    tturns = bpe_token_arrays(turns.withColumnRenamed("conv_id", "_c")
                              .withColumn("doc_id",
                                          F.col("_c") + F.col("turn_idx") * 50),
                              drop_empty=False)
    turns_tok = turns.join(
        tturns.select(
            ((F.col("doc_id") % 50)).alias("conv_id"),
            F.floor(F.col("doc_id") / 50).cast("long").alias("turn_idx"),
            F.col("toks").alias("ctoks")),
        ["conv_id", "turn_idx"])
    rendered_b = track_persist(
        render_conversations(turns_tok, turn_toks_col="ctoks"))
    bconv = rendered_b.select(
        F.lit("bconv").alias("kind"),
        F.col("conv_id").alias("pack_id"),
        F.explode("spans").alias("s"),
    ).select(
        "kind", "pack_id",
        F.col("s.turn_idx").cast("long").alias("doc_id"),
        F.col("s.tok_start").alias("a"),
        F.col("s.tok_len").alias("b"),
        F.when(F.col("s.role") == "user", F.lit(0))
        .when(F.col("s.role") == "assistant", F.lit(1))
        .otherwise(F.lit(2)).cast("long").alias("c"))
    bmask = assistant_mask(rendered_b).select(
        F.lit("bmask").alias("kind"),
        F.col("conv_id").alias("pack_id"),
        F.lit(-1).cast("long").alias("doc_id"),
        F.col("n_mask_tokens").alias("a"),
        _stream_hash31(F.col("mask_tokens")).alias("b"),
        F.col("n_tokens").alias("c"))
    # 'cspan' (round 6): loss spans for a CHUNK layout — conversations
    # split across packs at seq_len 64 (forced splits at this fixture's
    # conv sizes), each assistant-content span intersected with its
    # conversation's chunk slices and re-based per pack. Rows:
    # pack_id, doc_id=conv_id, a=tok_start (pack coords), b=tok_len,
    # c=conv_tok_start (conversation coords — pins the interval algebra
    # from both ends).
    from .operators.sft import pack_loss_spans_chunked

    _CSPAN_LEN = 64
    conv_counts = token_counts_from_arrays(
        rendered.select(F.col("conv_id").alias("doc_id"),
                        F.col("tokens").alias("toks")))
    clayout = pack_chunks(conv_counts, _CSPAN_LEN, _N_SHARDS)
    cspan = pack_loss_spans_chunked(clayout, rendered).select(
        F.lit("cspan").alias("kind"),
        F.col("pack_id"),
        F.col("conv_id").alias("doc_id"),
        F.col("tok_start").alias("a"),
        F.col("tok_len").alias("b"),
        F.col("conv_tok_start").alias("c"))
    return (chunk.unionByName(greedy).unionByName(mat)
            .unionByName(matg).unionByName(conv).unionByName(cmask)
            .unionByName(bmat).unionByName(bconv).unionByName(bmask)
            .unionByName(cspan)
            .orderBy("kind", "pack_id", "doc_id", "a"))


def _sql_pack_sequences() -> str:
    from .operators.bpe import bpe_arrays_sql_ctes, bpe_sql_ctes

    L, S = _SEQ_LEN, _N_SHARDS
    # BPE units: full documents (layout/materialization arms) plus the
    # SFT fixture's 120-char turn texts, offset so one recursive merge
    # replay covers both
    bpe_units = f"""units AS (
  SELECT doc_id, text AS t FROM documents
  UNION ALL
  SELECT doc_id + 100000000 AS doc_id, substr(text, 1, 120) AS t
  FROM documents
), {bpe_sql_ctes(src="units", text_expr="t")}{bpe_arrays_sql_ctes()}"""
    h31 = "chr(31)"
    base = rf"""counts AS (
  SELECT doc_id,
    CASE WHEN length(norm) = 0 THEN 0
         ELSE len(regexp_split_to_array(norm, '\s+')) END AS n_tokens
  FROM (SELECT doc_id,
          regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
        FROM documents)
), keyed AS (
  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
    md5('pack' || CAST(doc_id AS VARCHAR)) AS key,
    CAST('0x' || substr(md5('pack' || CAST(doc_id AS VARCHAR)), 1, 8)
         AS BIGINT) % {S} AS shard
  FROM counts WHERE n_tokens > 0
), pos AS (
  SELECT doc_id, n_tokens, shard,
    SUM(n_tokens) OVER (ORDER BY shard, key, doc_id
                        ROWS UNBOUNDED PRECEDING) - n_tokens AS gstart
  FROM keyed
), ranked AS (
  SELECT shard, doc_id, n_tokens,
    ROW_NUMBER() OVER (PARTITION BY shard ORDER BY key, doc_id) AS rn
  FROM keyed
)"""
    # greedy next-fit state machine: after each row the open pack and
    # its fill carry forward; placement/close conditions repeated
    # verbatim (a recursive arm cannot reference its own aliases)
    place = (f"CASE WHEN p.fill_after > 0 AND p.fill_after + r.n_tokens > {L} "
             f"THEN p.open_after + 1 ELSE p.open_after END")
    off = (f"CASE WHEN p.fill_after > 0 AND p.fill_after + r.n_tokens > {L} "
           f"THEN 0 ELSE p.fill_after END")
    fill2 = f"({off}) + r.n_tokens"
    return rf"""
WITH RECURSIVE {base}, rec AS (
  SELECT shard, rn, doc_id, n_tokens,
    CAST(0 AS BIGINT) AS placed, CAST(0 AS BIGINT) AS pack_off,
    CAST(CASE WHEN n_tokens >= {L} THEN 1 ELSE 0 END AS BIGINT)
      AS open_after,
    CAST(CASE WHEN n_tokens >= {L} THEN 0 ELSE n_tokens END AS BIGINT)
      AS fill_after
  FROM ranked WHERE rn = 1
  UNION ALL
  SELECT r.shard, r.rn, r.doc_id, r.n_tokens,
    CAST({place} AS BIGINT) AS placed,
    CAST({off} AS BIGINT) AS pack_off,
    CAST(CASE WHEN {fill2} >= {L} THEN ({place}) + 1
              ELSE ({place}) END AS BIGINT) AS open_after,
    CAST(CASE WHEN {fill2} >= {L} THEN 0
              ELSE {fill2} END AS BIGINT) AS fill_after
  FROM ranked r JOIN rec p ON r.shard = p.shard AND r.rn = p.rn + 1
), tokd AS (
  SELECT doc_id, string_split(norm, ' ') AS t
  FROM (SELECT doc_id,
          regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm
        FROM documents)
  WHERE length(norm) > 0
), chunk_rows AS (
  SELECT CAST(p AS BIGINT) AS pack_id, doc_id,
    CAST(greatest(0, p * {L} - gstart) AS BIGINT) AS a,
    CAST(least(n_tokens, p * {L} + {L} - gstart)
         - greatest(0, p * {L} - gstart) AS BIGINT) AS b,
    CAST(greatest(0, gstart - p * {L}) AS BIGINT) AS c
  FROM (SELECT doc_id, n_tokens, gstart,
          unnest(generate_series(CAST(gstart // {L} AS BIGINT),
                                 CAST((gstart + n_tokens - 1) // {L}
                                      AS BIGINT))) AS p
        FROM pos)
), mat_rows AS (
  -- reassembled concat-and-chunk sequences: per-pack token stream in
  -- pack_off order (chunks are non-empty, so joining chunk strings
  -- with ' ' equals joining the flattened token list with ' ')
  SELECT c.pack_id, CAST(SUM(c.b) AS BIGINT) AS n_tokens,
    CAST('0x' || substr(md5(string_agg(
      array_to_string(list_slice(t.t, c.a + 1, c.a + c.b), ' '),
      ' ' ORDER BY c.c)), 1, 8) AS BIGINT) AS h
  FROM chunk_rows c JOIN tokd t USING (doc_id)
  GROUP BY c.pack_id
), matg_rows AS (
  SELECT r.shard * 1099511627776 + r.placed AS pack_id,
    CAST(SUM(r.n_tokens) AS BIGINT) AS n_tokens,
    CAST('0x' || substr(md5(string_agg(
      array_to_string(t.t, ' '), ' ' ORDER BY r.pack_off)), 1, 8)
      AS BIGINT) AS h
  FROM rec r JOIN tokd t USING (doc_id)
  GROUP BY r.shard * 1099511627776 + r.placed
), sft_turns AS (
  SELECT doc_id % 50 AS conv_id, doc_id // 50 AS turn_idx,
    substr(text, 1, 120) AS t
  FROM documents
), sft_tt AS (
  -- one token stream per turn: a role-tag token + the normalized
  -- whitespace tokens (tag only when the turn normalizes to empty)
  SELECT conv_id, turn_idx, norm,
    CAST(turn_idx % 3 AS BIGINT) AS role_code,
    CAST(1 + CASE WHEN length(norm) > 0
         THEN len(regexp_split_to_array(norm, '\s+')) ELSE 0 END
         AS BIGINT) AS tlen
  FROM (SELECT conv_id, turn_idx,
          -- outer trim: after the collapse all whitespace is spaces,
          -- so this removes what the inner (space-only) trim missed
          -- when the raw turn ended in \n or \t — mirrors sft.py
          trim(regexp_replace(lower(trim(t)), '\s+', ' ', 'g')) AS norm
        FROM sft_turns)
), sft_sp AS (
  SELECT conv_id, turn_idx, role_code, norm, tlen,
    SUM(tlen) OVER (PARTITION BY conv_id ORDER BY turn_idx
                    ROWS UNBOUNDED PRECEDING) - tlen AS tok_start
  FROM sft_tt
), sft_mask AS (
  SELECT conv_id,
    CAST(coalesce(SUM(CASE WHEN role_code = 1 THEN tlen - 1 END), 0)
         AS BIGINT) AS n_mask,
    CAST('0x' || substr(md5(coalesce(string_agg(
      CASE WHEN role_code = 1 AND length(norm) > 0 THEN norm END,
      ' ' ORDER BY turn_idx), '')), 1, 8) AS BIGINT) AS mask_h,
    CAST(SUM(tlen) AS BIGINT) AS conv_tokens
  FROM sft_sp GROUP BY conv_id
), {bpe_units}, bkeyed AS (
  -- chunk layout replayed over TRAINED-BPE token counts (docs only)
  SELECT a.doc_id, a.n AS n_tokens,
    md5('pack' || CAST(a.doc_id AS VARCHAR)) AS key,
    CAST('0x' || substr(md5('pack' || CAST(a.doc_id AS VARCHAR)), 1, 8)
         AS BIGINT) % {S} AS shard
  FROM bpe_arrays a WHERE a.doc_id < 100000000 AND a.n > 0
), bpos AS (
  SELECT doc_id, n_tokens,
    SUM(n_tokens) OVER (ORDER BY shard, key, doc_id
                        ROWS UNBOUNDED PRECEDING) - n_tokens AS gstart
  FROM bkeyed
), bchunk_rows AS (
  SELECT CAST(p AS BIGINT) AS pack_id, doc_id,
    CAST(greatest(0, p * {L} - gstart) AS BIGINT) AS a,
    CAST(least(n_tokens, p * {L} + {L} - gstart)
         - greatest(0, p * {L} - gstart) AS BIGINT) AS b,
    CAST(greatest(0, gstart - p * {L}) AS BIGINT) AS c
  FROM (SELECT doc_id, n_tokens, gstart,
          unnest(generate_series(CAST(gstart // {L} AS BIGINT),
                                 CAST((gstart + n_tokens - 1) // {L}
                                      AS BIGINT))) AS p
        FROM bpos)
), bmat_rows AS (
  SELECT c.pack_id, CAST(SUM(c.b) AS BIGINT) AS n_tokens,
    CAST('0x' || substr(md5(string_agg(
      array_to_string(list_slice(a.tl, c.a + 1, c.a + c.b), {h31}),
      {h31} ORDER BY c.c)), 1, 8) AS BIGINT) AS th,
    CAST('0x' || substr(md5(string_agg(
      array_to_string(list_slice(a.il, c.a + 1, c.a + c.b), ','),
      ',' ORDER BY c.c)), 1, 8) AS BIGINT) AS ih
  FROM bchunk_rows c JOIN bpe_arrays a ON a.doc_id = c.doc_id
  GROUP BY c.pack_id
), bturn AS (
  -- per-turn BPE content: LEFT JOIN keeps empty turns (tag-only,
  -- tlen=1), mirroring drop_empty=False on the Spark side
  SELECT s.conv_id, s.turn_idx,
    CAST(s.turn_idx % 3 AS BIGINT) AS role_code,
    CAST(1 + coalesce(a.n, 0) AS BIGINT) AS tlen,
    coalesce(a.n, 0) AS n_content,
    array_to_string(coalesce(a.tl, []), {h31}) AS content_str
  FROM sft_turns s LEFT JOIN bpe_arrays a
    ON a.doc_id = (s.conv_id + s.turn_idx * 50) + 100000000
), bsp AS (
  SELECT conv_id, turn_idx, role_code, tlen, n_content, content_str,
    SUM(tlen) OVER (PARTITION BY conv_id ORDER BY turn_idx
                    ROWS UNBOUNDED PRECEDING) - tlen AS tok_start
  FROM bturn
), bmask_rows AS (
  SELECT conv_id,
    CAST(coalesce(SUM(CASE WHEN role_code = 1 THEN n_content END), 0)
         AS BIGINT) AS n_mask,
    CAST('0x' || substr(md5(coalesce(string_agg(
      CASE WHEN role_code = 1 AND n_content > 0 THEN content_str END,
      {h31} ORDER BY turn_idx), '')), 1, 8) AS BIGINT) AS mask_h,
    CAST(SUM(tlen) AS BIGINT) AS conv_tokens
  FROM bsp GROUP BY conv_id
), cvkeyed AS (
  -- chunk layout over the rendered conversations (seq_len 64: forces
  -- splits) for the chunk-layout loss-span arm
  SELECT conv_id, CAST(SUM(tlen) AS BIGINT) AS n_tokens,
    md5('pack' || CAST(conv_id AS VARCHAR)) AS key,
    CAST('0x' || substr(md5('pack' || CAST(conv_id AS VARCHAR)), 1, 8)
         AS BIGINT) % {S} AS shard
  FROM sft_sp GROUP BY conv_id HAVING SUM(tlen) > 0
), cvpos AS (
  SELECT conv_id, n_tokens,
    SUM(n_tokens) OVER (ORDER BY shard, key, conv_id
                        ROWS UNBOUNDED PRECEDING) - n_tokens AS gstart
  FROM cvkeyed
), cvchunk AS (
  SELECT CAST(p AS BIGINT) AS pack_id, conv_id,
    CAST(greatest(0, p * 64 - gstart) AS BIGINT) AS tok_start,
    CAST(least(n_tokens, p * 64 + 64 - gstart)
         - greatest(0, p * 64 - gstart) AS BIGINT) AS tok_len,
    CAST(greatest(0, gstart - p * 64) AS BIGINT) AS pack_off
  FROM (SELECT conv_id, n_tokens, gstart,
          unnest(generate_series(CAST(gstart // 64 AS BIGINT),
                                 CAST((gstart + n_tokens - 1) // 64
                                      AS BIGINT))) AS p
        FROM cvpos)
), cspan_rows AS (
  -- span [cstart, cend) ∩ chunk [tok_start, tok_start+tok_len),
  -- re-based into pack coordinates (mirrors pack_loss_spans_chunked)
  SELECT c.pack_id, s.conv_id,
    CAST(c.pack_off + greatest(s.tok_start + 1, c.tok_start)
         - c.tok_start AS BIGINT) AS a,
    CAST(least(s.tok_start + s.tlen, c.tok_start + c.tok_len)
         - greatest(s.tok_start + 1, c.tok_start) AS BIGINT) AS b,
    CAST(greatest(s.tok_start + 1, c.tok_start) AS BIGINT) AS cpos
  FROM sft_sp s JOIN cvchunk c USING (conv_id)
  WHERE s.role_code = 1 AND s.tlen > 1
    AND least(s.tok_start + s.tlen, c.tok_start + c.tok_len)
        > greatest(s.tok_start + 1, c.tok_start)
)
SELECT 'chunk' AS kind, pack_id, doc_id, a, b, c FROM chunk_rows
UNION ALL
SELECT 'greedy' AS kind,
  shard * 1099511627776 + placed AS pack_id, doc_id,
  pack_off AS a, n_tokens AS b,
  CAST(CASE WHEN n_tokens > {L} THEN 1 ELSE 0 END AS BIGINT) AS c
FROM rec
UNION ALL
SELECT 'mat' AS kind, pack_id, CAST(-1 AS BIGINT) AS doc_id,
  n_tokens AS a, h AS b, CAST(0 AS BIGINT) AS c
FROM mat_rows
UNION ALL
SELECT 'matg' AS kind, pack_id, CAST(-1 AS BIGINT) AS doc_id,
  n_tokens AS a, h AS b,
  CAST(greatest(0, {L} - n_tokens) AS BIGINT) AS c
FROM matg_rows
UNION ALL
SELECT 'conv' AS kind, CAST(conv_id AS BIGINT) AS pack_id,
  CAST(turn_idx AS BIGINT) AS doc_id,
  CAST(tok_start AS BIGINT) AS a, tlen AS b, role_code AS c
FROM sft_sp
UNION ALL
SELECT 'cmask' AS kind, CAST(conv_id AS BIGINT) AS pack_id,
  CAST(-1 AS BIGINT) AS doc_id,
  n_mask AS a, mask_h AS b, conv_tokens AS c
FROM sft_mask
UNION ALL
SELECT 'bmat' AS kind, pack_id, CAST(-1 AS BIGINT) AS doc_id,
  n_tokens AS a, th AS b, ih AS c
FROM bmat_rows
UNION ALL
SELECT 'bconv' AS kind, CAST(conv_id AS BIGINT) AS pack_id,
  CAST(turn_idx AS BIGINT) AS doc_id,
  CAST(tok_start AS BIGINT) AS a, tlen AS b, role_code AS c
FROM bsp
UNION ALL
SELECT 'bmask' AS kind, CAST(conv_id AS BIGINT) AS pack_id,
  CAST(-1 AS BIGINT) AS doc_id,
  n_mask AS a, mask_h AS b, conv_tokens AS c
FROM bmask_rows
UNION ALL
SELECT 'cspan' AS kind, pack_id, CAST(conv_id AS BIGINT) AS doc_id,
  a, b, cpos AS c
FROM cspan_rows
ORDER BY kind, pack_id, doc_id, a
"""


SQL_PACK_SEQUENCES = _sql_pack_sequences()


_DSIR_BUCKETS = 8192
_DSIR_KEEP = 150
# add-alpha smoothing must stay small next to the corpus's ~27k grams:
# alpha=1 adds alpha*B = 8192 phantom grams to both distributions and
# flattens the log-ratios into the Gumbel noise floor (measured: 'en'
# target selects 55% en at alpha=1 vs 84% at 0.05, base rate 44%)
_DSIR_ALPHA = 0.05


def q_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR selection of the 150 raw documents most target-like, with
    target = the corpus's English slice (a real signal in the table):
    hashed-bigram log-ratio weights (integer micros), exact integer
    doc scores, deterministic Gumbel top-k. The oracle recomputes the
    full recipe — md5 buckets, add-alpha (0.05) smoothing, micro
    quantization, Gumbel from the same md5 — so selection matches
    row-for-row."""
    docs = _t(spark, sf_dir, "documents")
    from .operators.indexes import track_persist

    raw_counts = track_persist(hashed_ngram_counts(docs, _DSIR_BUCKETS))
    tgt_counts = hashed_ngram_counts(
        docs.filter(F.col("lang") == "en"), _DSIR_BUCKETS)
    weights = dsir_log_weights(tgt_counts, raw_counts, _DSIR_BUCKETS,
                               alpha=_DSIR_ALPHA)
    scores = dsir_scores(raw_counts, weights)
    return dsir_resample(scores, _DSIR_KEEP).select(
        "doc_id", "n_grams", "score_micro", "gumbel_micro", "sel_micro")


SQL_DSIR_SAMPLE = rf"""
WITH grams AS (
  SELECT doc_id, unnest(
    [t[i] || ' ' || t[i + 1]
     for i in generate_series(1, greatest(len(t) - 1, 0))]) AS g
  FROM (SELECT doc_id,
          regexp_split_to_array(
            regexp_replace(lower(trim(text)), '\s+', ' ', 'g'),
            '\s+') AS t
        FROM documents)
), bucketed AS (
  SELECT doc_id,
    CAST('0x' || substr(md5(g), 1, 8) AS BIGINT) % {_DSIR_BUCKETS}
      AS bucket
  FROM grams
), raw_counts AS (
  SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM bucketed GROUP BY doc_id, bucket
), tgt AS (
  SELECT bucket, SUM(cnt) AS tc FROM raw_counts
  WHERE doc_id IN (SELECT doc_id FROM documents WHERE lang = 'en')
  GROUP BY bucket
), rawd AS (
  SELECT bucket, SUM(cnt) AS rc FROM raw_counts GROUP BY bucket
), tot AS (
  SELECT (SELECT CAST(SUM(tc) AS DOUBLE) FROM tgt) AS tt,
         (SELECT CAST(SUM(rc) AS DOUBLE) FROM rawd) AS rt
), joined AS (
  SELECT COALESCE(t.bucket, r.bucket) AS bucket,
    COALESCE(tc, 0) AS tc, COALESCE(rc, 0) AS rc
  FROM tgt t FULL JOIN rawd r ON t.bucket = r.bucket
), weights AS (
  SELECT bucket,
    CAST(floor((ln((tc + {float(_DSIR_ALPHA)!r})
                   / (tt + {float(_DSIR_ALPHA) * _DSIR_BUCKETS!r}))
              - ln((rc + {float(_DSIR_ALPHA)!r})
                   / (rt + {float(_DSIR_ALPHA) * _DSIR_BUCKETS!r})))
               * 1e6 + 0.5) AS BIGINT) AS w_micro
  FROM joined, tot
), scores AS (
  SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS n_grams,
    CAST(SUM(cnt * w_micro) AS BIGINT) AS score_micro
  FROM raw_counts JOIN weights USING (bucket) GROUP BY doc_id
), noised AS (
  SELECT doc_id, n_grams, score_micro,
    CAST(floor(-ln(-ln(
      (CAST('0x' || substr(md5('dsir' || CAST(doc_id AS VARCHAR)), 1, 8)
            AS BIGINT) + 0.5) / 4294967296.0)) * 1e6 + 0.5) AS BIGINT)
      AS gumbel_micro
  FROM scores
)
SELECT doc_id, n_grams, score_micro, gumbel_micro,
  CAST(floor(score_micro / 1.0 + gumbel_micro) AS BIGINT) AS sel_micro
FROM noised
ORDER BY sel_micro DESC, doc_id ASC LIMIT {_DSIR_KEEP}
"""


_TS_KEEP = 300


def q_training_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-set ASSEMBLY as one lazy job — the step a
    pretraining pipeline actually ships: exact-dedup → Gopher-lite
    quality gate → DSIR selection toward the corpus's English slice →
    concat-and-chunk packing → materialized fixed-length sequences
    with hashed-vocab token ids. Every constituent is value-oracled on
    its own (`dedup_exact`, `text_quality_lang`, `dsir_sample`,
    `pack_sequences` incl. its 'mat' arm); this rows-only entry
    attests the COMPOSITION: one DAG, stage boundaries persisted only
    where lineage is re-read (the DSIR featurization, via
    dsir_select's track_persist), no driver-side collection except the
    bounded top-k selection.

    Output: one row per emitted training sequence — (pack_id,
    n_tokens, stream_h, ids_h) with md5-prefix signatures of the token
    stream and the TRAINED-BPE id stream (round 6: the packers consume
    ``bpe.bpe_token_arrays`` streams, so n_tokens counts BPE tokens
    and ids come from the trained vocabulary — the round-5 layer
    shipped hashing-trick whitespace ids here). Fully deterministic
    (md5 ordering, RNG-free Gumbel), so the driver's rows+hash check
    is stable. Composition invariants (planted dup excluded, only
    selected docs packed, id/token streams consistent) are pinned by
    tests/test_training.py."""
    from .operators.dedup import exact_dedup, normalized_text
    from .operators.dsir import dsir_select

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    # planted exact dups so stage 1 has work
    corpus = docs.unionByName(
        docs.filter(F.col("doc_id") < 40).select(
            (F.col("doc_id") + 3_000_000).alias("doc_id"), "lang", "text"))
    keep = exact_dedup(corpus).select(
        F.col("keep_doc_id").alias("doc_id"))
    s1 = corpus.join(keep, "doc_id", "left_semi")

    # Gopher-lite gate on canonical text: enough tokens, sane mean
    # word length (the full rule-set is oracled in text_quality_lang)
    norm = normalized_text(F.col("text"))
    toks = F.split(norm, " ")
    n_tokens = F.size(toks)
    mean_len = (F.length(norm) - n_tokens + 1) / n_tokens
    # first persisted stage boundary: the deduped+gated corpus is read
    # three times downstream (raw featurization, target featurization,
    # the selection semi-join) and each read would re-run the dedup
    # window + quality filters over the raw union
    from .operators.indexes import track_persist

    s2 = track_persist(
        s1.filter((F.length(norm) > 0) & (n_tokens >= 10)
                  & (mean_len >= 2.0) & (mean_len <= 12.0)))

    sel = dsir_select(s2, s2.filter(F.col("lang") == "en"),
                      n_keep=_TS_KEEP, alpha=_DSIR_ALPHA)
    # second persisted stage boundary: without it the BPE tokenization
    # below would re-run the dedup+gate+selection lineage; both
    # persists together (quiet window, sf0.1): in-battery entry
    # 15.7 -> 5.5 s, warm rerun 10.3 -> 2.1 s (r5, whitespace path)
    picked = track_persist(
        s2.join(sel.select("doc_id"), "doc_id", "left_semi"))

    # round 6: tokenize the selected slice with the TRAINED tokenizer —
    # layout counts, materialized streams and shipped ids all index the
    # one BPE stream (third stage-boundary persist: the arrays feed the
    # layout counts AND the materialization join)
    from .operators.bpe import bpe_token_arrays

    barr = track_persist(bpe_token_arrays(picked))
    layout = pack_chunks(barr.select("doc_id", "n_tokens"),
                         _SEQ_LEN, _N_SHARDS)
    seqs = materialize_packs(None, layout, tokens_df=barr)
    return seqs.select(
        "pack_id", "n_tokens",
        _stream_hash31(F.col("tokens")).alias("stream_h"),
        _ids_hash(F.col("token_ids")).alias("ids_h"),
    ).orderBy("pack_id")


def q_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SHIPPING step (round 5): pack a corpus slice, export it as
    row-bounded parquet shards in deterministic epoch order with a
    verifiable manifest, then run the trainer-side verification.
    Rows-only by nature (a sink with scratch side effects — the same
    class as detection_sink's zip packaging); the returned single row
    carries the manifest totals plus the verify verdicts (the export
    must verify against its source and FAIL against a tampered one),
    so the driver's row check still gates the end-to-end contract.
    All layout/materialization math is value-oracled in
    `pack_sequences`."""
    import os
    import tempfile

    from .operators.indexes import track_scratch_dir
    from .operators.packing import (
        materialize_packs,
        verify_training_shards,
        write_training_shards,
    )

    from .operators.bpe import bpe_token_arrays
    from .operators.indexes import track_persist

    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    # round 6: shards carry TRAINED-BPE token strings and vocab ids —
    # the manifest signature (xxhash64 over all columns, token_ids
    # included) now attests the real id streams a trainer consumes
    barr = track_persist(bpe_token_arrays(docs))
    layout = pack_chunks(barr.select("doc_id", "n_tokens"),
                         _SEQ_LEN, _N_SHARDS)
    seqs = materialize_packs(None, layout, tokens_df=barr)
    path = os.path.join(tempfile.gettempdir(),
                        f"sroie_ship_{os.getpid()}")
    track_scratch_dir(spark, path)
    totals = write_training_shards(seqs, path, rows_per_shard=32)
    ok = verify_training_shards(spark, path, seqs)["ok"]
    tampered_ok = verify_training_shards(
        spark, path, seqs.filter(F.col("pack_id") != 0))["ok"]
    return spark.createDataFrame(
        [(int(totals["n_shards"]), int(totals["n_rows"]),
          int(totals["n_tokens"]), bool(ok), bool(tampered_ok))],
        "n_shards long, n_rows long, n_tokens long, "
        "verify_ok boolean, tampered_verify_ok boolean")


def q_sft_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SFT SHIPPING step (round 6) — the fine-tuning counterpart of
    `training_set`+`training_shards` as one end-to-end job: documents →
    conversation fixture → per-turn TRAINED-BPE tokenization → render
    with spans → greedy whole-conversation packing → materialized
    sequences → loss spans in pack coordinates → shard export of packs
    AND the loss-span sidecar (each with the sum+xor manifest) →
    trainer-side verify that RECOMPUTES the assistant mask from the
    shipped files alone (slice shipped streams with shipped spans,
    compare to the rendered mask). Rows-only by nature (a sink with
    scratch side effects, same class as `training_shards`); the single
    returned row carries the export totals and the verify verdicts,
    including a must-fail probe with one span dropped."""
    import os
    import tempfile

    from .operators.bpe import bpe_token_arrays
    from .operators.indexes import track_persist, track_scratch_dir
    from .operators.packing import (
        greedy_packs,
        materialize_greedy_packs,
        token_counts_from_arrays,
    )
    from .operators.sft import (
        assistant_mask,
        pack_loss_spans,
        render_conversations,
        verify_sft_shards,
        write_sft_shards,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    turns = docs.select(
        "doc_id",
        (F.col("doc_id") % 50).alias("conv_id"),
        F.floor(F.col("doc_id") / 50).cast("long").alias("turn_idx"),
        F.when(F.floor(F.col("doc_id") / 50) % 3 == 0, F.lit("user"))
        .when(F.floor(F.col("doc_id") / 50) % 3 == 1, F.lit("assistant"))
        .otherwise(F.lit("tool")).alias("role"),
        F.substring("text", 1, 120).alias("text"))
    tt = bpe_token_arrays(turns, drop_empty=False)
    turns_tok = turns.join(
        tt.select("doc_id", F.col("toks").alias("ctoks")), "doc_id")
    rendered = track_persist(
        render_conversations(turns_tok, turn_toks_col="ctoks"))
    counts = token_counts_from_arrays(
        rendered.select(F.col("conv_id").alias("doc_id"),
                        F.col("tokens").alias("toks")))
    layout = track_persist(greedy_packs(counts, 2048, _N_SHARDS))
    packs = materialize_greedy_packs(
        None, layout, 2048,
        tokens_df=rendered.select(F.col("conv_id").alias("doc_id"),
                                  F.col("tokens").alias("toks")))
    spans = pack_loss_spans(layout, rendered)
    path = os.path.join(tempfile.gettempdir(),
                        f"sroie_sft_ship_{os.getpid()}")
    track_scratch_dir(spark, path)
    totals = write_sft_shards(packs, spans, path, rows_per_shard=16)
    mask = assistant_mask(rendered)
    v = verify_sft_shards(spark, path, packs, spans, mask)
    tampered = verify_sft_shards(
        spark, path, packs, spans.limit(max(0, spans.count() - 1)), mask)
    return spark.createDataFrame(
        [(int(totals["n_shards"]), int(totals["n_rows"]),
          int(totals["n_tokens"]), int(totals["spans_n_rows"]),
          bool(v["packs_ok"]), bool(v["spans_ok"]), bool(v["mask_ok"]),
          bool(tampered["spans_ok"]))],
        "n_pack_shards long, n_pack_rows long, n_tokens long, "
        "n_spans long, packs_ok boolean, spans_ok boolean, "
        "mask_ok boolean, tampered_spans_ok boolean")


def q_bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE TRAINING (round 6): the first 16 merge rules
    learned from the documents corpus by the Spark-native trainer
    (`bpe.train_merges_distributed` — one corpus scan for word counts,
    then delta-maintained pair counts over the distinct-word table;
    per-iteration cost independent of corpus size). Rows-only by
    nature: the training loop is iterative argmax-rewrite —
    per-iteration aggregates feeding the next iteration's state are
    outside a single SQL oracle's reach — but determinism is total
    (tie-break: max count, then lexicographically smallest pair) and
    the trainer is pinned byte-identical to the in-memory reference
    trainer AND to the committed model (tests/test_bpe.py;
    tools/train_bpe.py --distributed). Output: (rank, a, b)."""
    from .operators.bpe import train_merges_distributed

    docs = _t(spark, sf_dir, "documents")
    merges = train_merges_distributed(docs, n_merges=16)
    return spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(merges)],
        "rank long, a string, b string").orderBy("rank")


def q_quality_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed quality-classifier TRAINING (round 6): 8 epochs of
    full-batch logistic regression on the documents corpus via
    `quality_train.train_quality_distributed` — one JVM-side
    featurization scan, then per-epoch Arrow passes whose per-example
    gradients are quantized to int64 nanos, so the job is bit-exact
    and partitioning-invariant (pinned against the in-memory trainer
    in tests/test_quality_train.py; tools/train_quality.py
    --distributed pins the full 80-epoch run against the committed
    model). Rows-only by nature (iterative driver-stepped GD — each
    epoch's aggregate feeds the next epoch's weights). Output: the
    learned integer-micro weights (idx, w_micro; bias at idx=-1) plus
    the held-out accuracy in micros at idx=-2."""
    from .operators.quality_train import train_quality_distributed

    docs = _t(spark, sf_dir, "documents")
    m = train_quality_distributed(docs, d=1024, epochs=8)
    rows = (
        [(-2, int(m["holdout_acc"] * 1e6 + 0.5)), (-1, m["b_micro"])]
        + list(enumerate(m["w_micro"])))
    return spark.createDataFrame(
        rows, "idx long, w_micro long").orderBy("idx")


SQL_QUERIES_TRAINING = {
    "pack_sequences": (q_pack_sequences, SQL_PACK_SEQUENCES),
    "dsir_sample": (q_dsir_sample, SQL_DSIR_SAMPLE),
}

ROWS_ONLY_TRAINING = {
    "training_set": (q_training_set, None),
    "training_shards": (q_training_shards, None),
    "sft_set": (q_sft_set, None),
    "bpe_train": (q_bpe_train, None),
    "quality_train": (q_quality_train, None),
}

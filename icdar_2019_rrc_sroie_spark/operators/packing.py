"""Sequence packing — assembling documents into fixed-token-length
training sequences, the step between curation and the training loop.

Two standard packing disciplines, both deterministic and RNG-free:

* :func:`pack_chunks` — GPT-style concat-and-chunk: documents are laid
  out in a deterministic shuffled order as one virtual token stream and
  sliced every ``seq_len`` tokens; documents span pack boundaries. Zero
  padding waste by construction; a document's tail and the next
  document's head share a sequence (the usual pretraining trade-off).
* :func:`greedy_packs` — next-fit whole-document packing: documents are
  never split (SFT / instruction-tuning discipline); a document that
  would overflow the open pack starts a new one. Padding waste is the
  price; :func:`pack_stats` reports it.

Scale design: the only global state either needs is a prefix sum over
token counts, and a naive ``Window.orderBy`` cumsum without a partition
key is a single-task bottleneck (every row through one reducer). Both
operators therefore run the textbook two-phase distributed prefix sum:
rows are hash-sharded (``n_shards`` deterministic md5 shards), cumsums
run per shard in parallel, and only the ``n_shards`` shard TOTALS pass
through a tiny global window to produce shard offsets. The per-doc
order inside the virtual stream is the md5 order — i.e. packing also
SHUFFLES the corpus, which training wants anyway, and which DuckDB can
replay exactly (no RNG state).

No counterpart in the reference (it batches fixed-size image crops,
functional/utils/dataset.py); this is the text-pipeline analog the
brief's training-data mandate adds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import ensure_parallelism, normalized_text

PACKING_N_SHARDS_DEFAULT = 1024


def token_counts(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """(id, n_tokens) over the canonical whitespace tokenization (the
    dedup family's normalized form — blank/whitespace-only docs count
    0). Token counting is the packing currency; callers with a trained
    tokenizer substitute bpe.bpe_token_count here."""
    norm = normalized_text(F.col(text_col))
    # Spread the (usually single-file) scan before the normalize+split
    # pass: computed in the scan stage it runs on 1-3 tasks (~2 s
    # single-task stages in the pack_sequences cold profile, r7); the
    # downstream layout machinery re-shuffles by shard anyway, so
    # placement is free to change. No-op at real scale (wide scans).
    return ensure_parallelism(df).select(
        F.col(id_col),
        F.when(F.length(norm) == 0, F.lit(0))
        .otherwise(F.size(F.split(norm, r"\s+")))
        .cast("long").alias("n_tokens"),
    )


def token_counts_from_arrays(tokens_df: DataFrame,
                             id_col: str = "doc_id",
                             toks_col: str = "toks") -> DataFrame:
    """(id, n_tokens) over a PRE-TOKENIZED corpus — the layout currency
    when a trained tokenizer (``bpe.bpe_token_arrays``) supplies the
    streams instead of the canonical whitespace split. Layouts built
    from these counts index the SAME arrays the materializers slice, so
    offsets, SFT spans and shards all refer to one token stream."""
    return tokens_df.select(
        F.col(id_col), F.size(toks_col).cast("long").alias("n_tokens"))


def _shard_and_key(id_col: str, n_shards: int) -> tuple[Column, Column]:
    """Deterministic shuffle key (md5 hex prefix, engine-portable) and
    its shard. The key doubles as the virtual-stream order: packing in
    hash order IS the corpus shuffle."""
    key = F.md5(F.concat(F.lit("pack"), F.col(id_col).cast("string")))
    shard = (F.conv(F.substring(key, 1, 8), 16, 10).cast("long")
             % n_shards).cast("int")
    return key, shard


def _global_positions(counts: DataFrame, id_col: str,
                      n_shards: int) -> DataFrame:
    """(id, n_tokens, gstart) — each doc's start offset in the virtual
    concatenated token stream, via the two-phase prefix sum.

    Phase 1 cumsums WITHIN each md5 shard (parallel windows); phase 2
    turns the ``n_shards`` shard totals into shard base offsets with
    one window over that tiny aggregate (rows = n_shards, never the
    corpus) and broadcast-joins them back. Stream order = (shard, key,
    id) — equivalent to any fixed interleave of shards; what matters
    for packing is that it is total, deterministic, and replayable in
    the oracle.
    """
    key, shard = _shard_and_key(id_col, n_shards)
    rows = counts.filter(F.col("n_tokens") > 0).select(
        F.col(id_col), F.col("n_tokens"), key.alias("_key"),
        shard.alias("_shard"))
    w_local = (Window.partitionBy("_shard")
               .orderBy("_key", id_col)
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = rows.withColumn(
        "_lend", F.sum("n_tokens").over(w_local))
    totals = rows.groupBy("_shard").agg(
        F.sum("n_tokens").alias("_stot"))
    w_shard = (Window.orderBy("_shard")
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    offsets = totals.withColumn(
        "_soff", F.sum("_stot").over(w_shard) - F.col("_stot"))
    return (
        local.join(F.broadcast(offsets.select("_shard", "_soff")), "_shard")
        .select(id_col, "n_tokens", "_shard", "_key",
                (F.col("_soff") + F.col("_lend") - F.col("n_tokens"))
                .alias("gstart"))
    )


def pack_chunks(counts: DataFrame, seq_len: int,
                n_shards: int = PACKING_N_SHARDS_DEFAULT,
                id_col: str = "doc_id") -> DataFrame:
    """Concat-and-chunk packing over (id, n_tokens) rows: the virtual
    stream is sliced every ``seq_len`` tokens and each document emits
    one row per pack it overlaps.

    Output: (pack_id, id, tok_start, tok_len, pack_off) — take
    ``tok_len`` tokens of the document starting at its ``tok_start``-th
    token and write them at offset ``pack_off`` of pack ``pack_id``.
    Every pack except the last is exactly full:
    ``sum(tok_len) over pack = seq_len`` (pinned by tests — the
    zero-waste invariant). Fan-out per doc is ``n_tokens/seq_len + 1``
    rows, so the explode is linear in corpus tokens.
    """
    pos = _global_positions(counts, id_col, n_shards)
    gend = F.col("gstart") + F.col("n_tokens")
    first = F.floor(F.col("gstart") / seq_len)
    last = F.floor((gend - 1) / seq_len)
    packed = pos.select(
        F.col(id_col), F.col("n_tokens"), F.col("gstart"),
        F.explode(F.sequence(first, last)).alias("pack_id"))
    pstart = F.col("pack_id") * seq_len
    tok_start = F.greatest(F.lit(0), pstart - F.col("gstart"))
    tok_end = F.least(F.col("n_tokens"),
                      pstart + seq_len - F.col("gstart"))
    return packed.select(
        "pack_id", id_col,
        tok_start.cast("long").alias("tok_start"),
        (tok_end - tok_start).cast("long").alias("tok_len"),
        F.greatest(F.lit(0), F.col("gstart") - pstart)
        .cast("long").alias("pack_off"),
    )


def _sharded_whole_doc_packs(counts: DataFrame, n_shards: int,
                             id_col: str, kernel) -> DataFrame:
    """Shared scaffolding for the whole-document packers
    (:func:`greedy_packs`, :func:`bfd_packs`): deterministic md5
    sharding, id-type-preserving output schema, explicit repartition,
    and the per-shard ``applyInPandas`` dispatch — only the sequential
    fill ``kernel(pdf, id_col) -> pdf`` differs. Factored so contract
    fixes (the id-type handling that once broke string-id corpora, the
    parallelism discipline) exist in ONE place (round-5 review)."""
    key, shard = _shard_and_key(id_col, n_shards)
    rows = counts.filter(F.col("n_tokens") > 0).select(
        shard.alias("_shard"), key.alias("_key"),
        F.col(id_col), F.col("n_tokens"))

    def _run(pdf):
        return kernel(pdf, id_col)

    # id type follows the input (token_counts et al. are id-type
    # agnostic; hardcoding long here broke string-id corpora)
    id_type = {f.name: f.dataType.simpleString()
               for f in counts.schema.fields}[id_col]
    out_schema = (f"pack_id long, {id_col} {id_type}, pack_off long, "
                  "n_tokens long, overflow boolean")
    # explicit repartition: the groupBy key count (n_shards) exceeds
    # AQE's coalesced width on small inputs, and the kernel is
    # CPU-per-row — same discipline as ensure_parallelism
    return (rows.repartition(
        min(n_shards, rows.sparkSession.sparkContext.defaultParallelism),
        "_shard")
        .select("_shard", "_key", id_col, "n_tokens")
        .groupBy("_shard").applyInPandas(_run, out_schema))


def greedy_packs(counts: DataFrame, seq_len: int,
                 n_shards: int = PACKING_N_SHARDS_DEFAULT,
                 id_col: str = "doc_id") -> DataFrame:
    """Next-fit whole-document packing: walk each shard's docs in the
    deterministic md5 order, close the open pack whenever the next doc
    would overflow ``seq_len``. Documents longer than ``seq_len`` get a
    pack of their own, flagged ``overflow`` (callers truncate or drop;
    silently mangling them here would hide data loss).

    Pack ids are namespaced per shard (``shard * 2^40 + local``) so the
    kernel needs no cross-shard coordination — each shard packs
    independently inside one ``applyInPandas`` group (the per-shard
    fill state is inherently sequential; everything around it is
    parallel). Waste vs ``pack_chunks``: padding at every pack tail —
    measure with :func:`pack_stats`.

    Output: (pack_id, id, pack_off, n_tokens, overflow).
    """
    import pandas as pd

    def _pack(pdf: pd.DataFrame, idc: str) -> pd.DataFrame:
        pdf = pdf.sort_values(["_key", idc])
        shard_base = int(pdf["_shard"].iloc[0]) << 40
        pack_local, fill = 0, 0
        out_pack, out_off, out_ovf = [], [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            if fill > 0 and fill + n > seq_len:
                pack_local += 1
                fill = 0
            out_pack.append(shard_base + pack_local)
            out_off.append(fill)
            out_ovf.append(n > seq_len)
            fill += n
            if fill >= seq_len:
                pack_local += 1
                fill = 0
        return pd.DataFrame({
            "pack_id": out_pack, idc: pdf[idc].to_numpy(),
            "pack_off": out_off,
            "n_tokens": pdf["n_tokens"].to_numpy(),
            "overflow": out_ovf,
        })

    return _sharded_whole_doc_packs(counts, n_shards, id_col, _pack)


def bfd_packs(counts: DataFrame, seq_len: int,
              n_shards: int = PACKING_N_SHARDS_DEFAULT,
              id_col: str = "doc_id") -> DataFrame:
    """Best-fit-decreasing whole-document packing — the padding-waste
    upgrade over :func:`greedy_packs`' next-fit: docs are placed
    LARGEST FIRST, each into the open pack whose remaining capacity
    fits it most tightly (new pack only when none fits), so pack tails
    fill with the small documents instead of being abandoned at the
    first overflow. Same output contract as greedy_packs
    (pack_id, id, pack_off, n_tokens, overflow) — pack ids namespaced
    per md5 shard, over-length docs get a flagged pack of their own —
    so :func:`materialize_greedy_packs` and the mask translators
    compose unchanged (within-pack order is pack_off order either
    way). Deterministic: ties in the fit break toward the
    lowest-numbered pack, the placement order is (n_tokens desc, md5
    key, id). The per-shard fill state is inherently sequential
    (applyInPandas, parallel across shards); a real BFD keeps the open
    packs in a heap — at shard sizes (corpus/1024) a linear scan is
    fine and simpler to replay in tests."""
    import pandas as pd

    def _pack(pdf: pd.DataFrame, idc: str) -> pd.DataFrame:
        pdf = pdf.sort_values(["n_tokens", "_key", idc],
                              ascending=[False, True, True])
        shard_base = int(pdf["_shard"].iloc[0]) << 40
        remaining: list[int] = []  # open-pack residual capacity
        out_pack, out_off, out_ovf = [], [], []
        for n in pdf["n_tokens"]:
            n = int(n)
            if n >= seq_len:
                # own (full or overflow) pack; never reopened
                remaining.append(0)
                out_pack.append(shard_base + len(remaining) - 1)
                out_off.append(0)
                out_ovf.append(n > seq_len)
                continue
            best, best_rem = -1, seq_len + 1
            for i, r in enumerate(remaining):
                if n <= r < best_rem:
                    best, best_rem = i, r
            if best < 0:
                remaining.append(seq_len)
                best = len(remaining) - 1
            out_pack.append(shard_base + best)
            out_off.append(seq_len - remaining[best])
            out_ovf.append(False)
            remaining[best] -= n
        return pd.DataFrame({
            "pack_id": out_pack, idc: pdf[idc].to_numpy(),
            "pack_off": out_off,
            "n_tokens": pdf["n_tokens"].to_numpy(),
            "overflow": out_ovf,
        })

    return _sharded_whole_doc_packs(counts, n_shards, id_col, _pack)


def doc_token_arrays(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, toks) — each document's canonical whitespace token array,
    blank docs dropped (token_counts gives them 0 and the layouts
    exclude them). ``size(toks)`` here == ``token_counts.n_tokens`` by
    construction — the layouts' offsets index into exactly this array."""
    norm = normalized_text(F.col(text_col))
    # Spread before the normalization/split pass (see token_counts).
    return (ensure_parallelism(df)
            .select(F.col(id_col), norm.alias("_n"))
            .filter(F.length("_n") > 0)
            .select(id_col, F.split(F.col("_n"), " ").alias("toks")))


def hashed_vocab_ids(tokens: Column, vocab_size: int) -> Column:
    """Token strings → deterministic hashed-vocabulary ids (md5 hex
    prefix mod ``vocab_size``) — the feature-hashing trick applied as a
    vocabulary, engine-portable and training-ready without a fitted
    vocab table. Collisions are the usual hashing-trick trade-off;
    callers wanting a fitted vocab substitute a broadcast lookup."""
    return F.transform(
        tokens,
        lambda t: (F.conv(F.substring(F.md5(t), 1, 8), 16, 10)
                   .cast("long") % vocab_size))


def materialize_packs(docs: DataFrame | None, layout: DataFrame,
                      id_col: str = "doc_id", text_col: str = "text",
                      vocab_size: int | None = None,
                      tokens_df: DataFrame | None = None) -> DataFrame:
    """The actual training sequences for a :func:`pack_chunks` layout:
    (pack_id, n_tokens, tokens) where ``tokens`` is the pack's token
    stream — every pack except the stream tail exactly ``seq_len``
    long, zero padding. ``vocab_size`` adds a ``token_ids`` column
    (:func:`hashed_vocab_ids`).

    ``tokens_df`` substitutes a PRE-TOKENIZED corpus (id, ``toks``,
    optionally parallel ``ids`` — ``bpe.bpe_token_arrays`` output) for
    the whitespace split; the layout must then come from
    :func:`token_counts_from_arrays` over the same arrays. When an
    ``ids`` column is present it is sliced in lockstep with the token
    strings and emitted as ``token_ids`` — real trained-vocab ids, the
    round-6 contract fix over the hashing-trick ids (``vocab_size``
    must be None then; the two id sources are mutually exclusive).

    One join (layout × tokenized docs on id — layout fan-out is linear
    in corpus tokens) and one hash aggregate keyed pack_id; the
    within-pack order is reassembled from ``pack_off`` (array_sort over
    (pack_off, chunk) structs — offsets are unique within a pack by
    construction), so no window and no per-pack skew beyond seq_len
    itself. Token slicing stays JVM-side (``slice``).
    """
    toks = (tokens_df if tokens_df is not None
            else doc_token_arrays(docs, id_col, text_col))
    has_ids = tokens_df is not None and "ids" in tokens_df.columns
    if has_ids and vocab_size is not None:
        raise ValueError("vocab_size (hashing-trick ids) and tokens_df "
                         "ids (trained vocab) are mutually exclusive")
    chunk_cols = [F.slice(F.col("toks"), F.col("tok_start") + 1,
                          F.col("tok_len")).alias("_chunk")]
    if has_ids:
        chunk_cols.append(F.slice(F.col("ids"), F.col("tok_start") + 1,
                                  F.col("tok_len")).alias("_ichunk"))
    chunks = layout.join(toks, id_col).select(
        "pack_id", "pack_off", *chunk_cols)
    aggs = [F.flatten(F.transform(
        F.array_sort(F.collect_list(
            F.struct(F.col("pack_off"), F.col("_chunk")))),
        lambda s: s["_chunk"])).alias("tokens")]
    if has_ids:
        aggs.append(F.flatten(F.transform(
            F.array_sort(F.collect_list(
                F.struct(F.col("pack_off"), F.col("_ichunk")))),
            lambda s: s["_ichunk"])).alias("token_ids"))
    out = (
        chunks.groupBy("pack_id").agg(*aggs)
        .select("pack_id", F.size("tokens").cast("long").alias("n_tokens"),
                "tokens",
                *(["token_ids"] if has_ids else []))
    )
    if vocab_size is not None:
        out = out.withColumn(
            "token_ids", hashed_vocab_ids(F.col("tokens"), vocab_size))
    return out


def materialize_greedy_packs(docs: DataFrame | None, layout: DataFrame,
                             seq_len: int, id_col: str = "doc_id",
                             text_col: str = "text",
                             pad_token: str | None = None,
                             tokens_df: DataFrame | None = None
                             ) -> DataFrame:
    """Training sequences for a :func:`greedy_packs` layout:
    (pack_id, n_tokens, n_pad, overflow, tokens). Documents are whole
    (never sliced); ``pad_token`` right-pads every non-overflow pack to
    ``seq_len`` (None leaves them ragged — attention-mask trainers pad
    downstream). ``n_pad`` is the padding the pack would need either
    way; ``overflow`` marks single-doc packs longer than ``seq_len``
    (the layout's flag, carried through). ``tokens_df`` substitutes a
    pre-tokenized corpus (see :func:`materialize_packs`) — the layout
    must come from the same arrays' counts."""
    toks = (tokens_df.select(id_col, "toks") if tokens_df is not None
            else doc_token_arrays(docs, id_col, text_col))
    docs_in_pack = layout.join(toks, id_col).select(
        "pack_id", "pack_off", "overflow", F.col("toks").alias("_chunk"))
    grouped = (
        docs_in_pack.groupBy("pack_id")
        .agg(
            F.flatten(F.transform(
                F.array_sort(F.collect_list(
                    F.struct(F.col("pack_off"), F.col("_chunk")))),
                lambda s: s["_chunk"])).alias("tokens"),
            F.max("overflow").alias("overflow"))
        .select(
            "pack_id", F.size("tokens").cast("long").alias("n_tokens"),
            F.greatest(F.lit(0), F.lit(seq_len) - F.size("tokens"))
            .cast("long").alias("n_pad"),
            "overflow", "tokens")
    )
    if pad_token is not None:
        grouped = grouped.withColumn(
            "tokens",
            F.concat(F.col("tokens"), F.array_repeat(
                F.lit(pad_token), F.col("n_pad").cast("int"))))
    return grouped


def epoch_order(packs: DataFrame, epoch: int,
                id_col: str = "pack_id") -> DataFrame:
    """Deterministic per-epoch global reshuffle of a packed set: rows
    ordered by ``md5(epoch || pack_id)`` — a different permutation
    every epoch, byte-identical on re-run (RNG-free, the corpus-order
    discipline of the packing layouts applied to epochs). Trainers
    stream epochs without materializing a shuffled copy per epoch; at
    cluster scale the sort is the one total-order the trainer already
    pays for, and Spark runs it sampled-range-partitioned, not
    single-task."""
    key = F.md5(F.concat(F.lit(f"epoch{int(epoch)}:"),
                         F.col(id_col).cast("string")))
    return packs.orderBy(key, id_col)


def write_training_shards(seqs: DataFrame, path: str,
                          rows_per_shard: int = 1024,
                          epoch: int = 0,
                          id_col: str = "pack_id") -> dict:
    """Ship packed sequences to the trainer: size-bounded parquet
    shards in the deterministic :func:`epoch_order`, plus a
    ``_manifest`` the trainer (or a re-run) can verify the export
    against WITHOUT re-reading the corpus.

    Shard size is bounded JVM-side (``maxRecordsPerFile`` — the writer
    rolls files, no custom partitioner); the manifest is computed by
    reading the written files back with ``input_file_name`` and
    carries per-shard row/token counts plus an order-free value
    signature: the SUM and the BIT-XOR of per-row xxhash64 over the
    serialized row (two independent order-free combiners — sum alone
    would admit compensating-edit cancellation; file boundaries may
    shift with write parallelism, but the TOTAL signatures are
    partition-invariant and are what the verify step checks). Returns the totals dict; re-running overwrites
    idempotently. The manifest costs one read-back scan of the export
    (freshly written, typically page-cached); a crash between the
    shard write and the manifest write leaves a stale manifest that
    :func:`verify_training_shards` flags as a mismatch — re-export to
    recover.
    """
    spark = seqs.sparkSession
    cols = [c for c in seqs.columns]
    ordered = epoch_order(seqs, epoch, id_col)
    (ordered.write.mode("overwrite")
        .option("maxRecordsPerFile", int(rows_per_shard))
        .parquet(f"{path}/shards"))
    back = spark.read.parquet(f"{path}/shards")
    tok = "n_tokens" if "n_tokens" in back.columns else None
    # xxhash64 hashes complex types (arrays included) natively
    row_sig = F.xxhash64(*[F.col(c) for c in cols])
    per_file = (
        back.select(F.input_file_name().alias("shard"),
                    row_sig.alias("_sig"),
                    *([F.col(tok)] if tok else []))
        .groupBy("shard")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"),
             (F.sum(tok).cast("long") if tok else F.lit(None).cast("long"))
             .alias("n_tokens"),
             # decimal(38,0): summing raw xxhash64 longs overflows
             # under ANSI; a 38-digit sum never will at any row count
             F.sum(F.col("_sig").cast("decimal(38,0)"))
             .cast("decimal(38,0)").alias("sig_sum"),
             # second, independent order-free combiner: an additive sum
             # alone admits compensating-edit collisions (swap two rows
             # whose hash DELTAS cancel); an attacker-free export does
             # not need cryptographic strength, but sum+xor+count
             # together make accidental cancellation vanishingly
             # unlikely (a pair must cancel in both Z and GF(2)^64)
             F.expr("bit_xor(_sig)").alias("sig_xor"))
    )
    per_file.write.mode("overwrite").parquet(f"{path}/_manifest")
    totals = (
        spark.read.parquet(f"{path}/_manifest")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shards"),
             F.sum("n_rows").cast("long").alias("n_rows"),
             F.sum("n_tokens").cast("long").alias("n_tokens"),
             F.sum("sig_sum").cast("decimal(38,0)").alias("sig_sum"),
             F.expr("bit_xor(sig_xor)").alias("sig_xor"))
        .collect()[0]
    )
    return {k: (None if totals[k] is None else int(totals[k]))
            for k in ("n_shards", "n_rows", "n_tokens", "sig_sum",
                      "sig_xor")}


def verify_training_shards(spark, path: str, expected: DataFrame,
                           id_col: str = "pack_id") -> dict:
    """Trainer-side export check, THREE-way: the shipped shards, the
    ``_manifest``, and ``expected`` (the DataFrame the export was
    built from) must all agree on row count and the order-free value
    signature. The manifest leg is what catches a crash between the
    shard write and the manifest write — the stale manifest's totals
    disagree with the fresh shards (round-5 review: the first version
    never read the manifest, leaving that documented contract
    unimplemented). Returns ``{ok, manifest_ok, shipped_rows,
    expected_rows}``; partition-layout agnostic by construction."""
    back = spark.read.parquet(f"{path}/shards")
    cols = expected.columns
    sig = F.xxhash64(*[F.col(c) for c in cols])

    def _tot(df: DataFrame):
        r = df.select(sig.alias("_sig")).agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.col("_sig").cast("decimal(38,0)")).alias("s"),
            F.expr("bit_xor(_sig)").alias("x"),
        ).collect()[0]
        return (int(r["n"]),
                None if r["s"] is None else int(r["s"]),
                None if r["x"] is None else int(r["x"]))

    sn, ss, sx = _tot(back.select(*cols))
    en, es, ex = _tot(expected)
    man = (spark.read.parquet(f"{path}/_manifest")
           .agg(F.sum("n_rows").cast("long").alias("n"),
                F.sum("sig_sum").cast("decimal(38,0)").alias("s"),
                F.expr("bit_xor(sig_xor)").alias("x"))
           .collect()[0])
    mn = None if man["n"] is None else int(man["n"])
    ms = None if man["s"] is None else int(man["s"])
    mx = None if man["x"] is None else int(man["x"])
    manifest_ok = (mn, ms, mx) == (sn, ss, sx)
    return {"ok": (sn, ss, sx) == (en, es, ex) and manifest_ok,
            "manifest_ok": manifest_ok,
            "shipped_rows": sn, "expected_rows": en}


def pack_stats(packs: DataFrame, seq_len: int) -> DataFrame:
    """One-row packing audit: pack count, packed token count, padding
    waste fraction (greedy) — ``1 - fill/(n_packs*seq_len)`` where
    ``fill`` clamps each pack's tokens at ``seq_len``: an OVERFLOW pack
    (one doc longer than seq_len) is full, not negatively wasteful —
    unclamped, a handful of long docs could push waste_frac below zero
    and mask real padding (round-5 advice). Overflow packs are counted
    separately (``n_overflow``, with their beyond-seq_len tokens in
    ``n_overflow_tokens``) so the audit shows the truncation exposure
    too. For ``pack_chunks`` output pass ``tok_len`` as the token
    column via ``withColumnRenamed``; waste is 0 there by
    construction."""
    tok = "n_tokens" if "n_tokens" in packs.columns else "tok_len"
    per_pack = packs.groupBy("pack_id").agg(
        F.sum(tok).alias("_ptok"))
    return per_pack.agg(
        F.count(F.lit(1)).alias("n_packs"),
        F.sum("_ptok").alias("n_tokens"),
        F.sum(F.least(F.col("_ptok"), F.lit(seq_len))).alias("_fill"),
        F.sum((F.col("_ptok") > seq_len).cast("long")).alias("n_overflow"),
        F.sum(F.greatest(F.col("_ptok") - seq_len, F.lit(0)))
        .alias("n_overflow_tokens"),
    ).select(
        "n_packs", "n_tokens", "n_overflow", "n_overflow_tokens",
        (F.lit(1.0) - F.col("_fill")
         / (F.col("n_packs") * F.lit(float(seq_len)))).alias("waste_frac"),
    )

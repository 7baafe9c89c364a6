"""SFT data preparation — rendering multi-turn conversations into
training-ready token streams with per-turn spans and assistant-only
loss masks (round 5).

The step between transcript extraction and sequence packing that a
fine-tuning pipeline actually needs: each conversation serializes to
ONE canonical whitespace token stream (a ``<|role|>`` tag token per
turn followed by the turn's normalized tokens — the same
``normalized_text`` canonicalization as the dedup/packing family, so
``packing.token_counts`` / ``doc_token_arrays`` over the rendered text
agree with the recorded offsets exactly), together with

* ``spans``   — (turn_idx, role, tok_start, tok_len) per turn: where
  each turn landed in the stream (tok_start 0-based at the tag token);
* the assistant LOSS MASK — the token positions a trainer computes
  loss on: assistant turns' CONTENT tokens (the tag token itself is
  masked out with everything non-assistant).

Scale shape: one shuffle keyed conv_id (the groupBy that assembles a
conversation — the same single exchange the extraction flagship pays),
then pure per-row array algebra; per-turn token arrays and lengths are
materialized as intermediate columns across projection boundaries
before anything scans them per element (the HOF re-evaluation
discipline). Because the rendered ``text`` is a plain canonical-
whitespace string, the whole packing family composes directly on top:
``greedy_packs`` over the rendered token counts packs WHOLE
conversations, ``materialize_greedy_packs`` reassembles them, and the
spans translate into any pack by adding the pack offset.

No counterpart in the reference (it trains on fixed per-image crops);
this is the training-data mandate's SFT face.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import normalized_text

ROLE_TAG_FMT = "<|{role}|>"


def _turn_tokens(role: Column, text: Column) -> Column:
    """One turn's token array: the role-tag token, then the turn's
    canonical whitespace tokens (none when the turn normalizes to
    empty). Tag tokens contain no whitespace, so splitting the joined
    stream reproduces the array exactly.

    The extra ``F.trim`` matters: ``normalized_text`` trims SPACES but
    a trailing newline/tab survives as a trailing space after the
    collapse ('done.\\n' → 'done. '), and splitting that yields a
    phantom '' token — desyncing the recorded n_tokens from
    ``token_counts`` over the rendered text, which shifts every
    downstream pack_loss_span (round-5 review repro). After the
    collapse all whitespace is plain spaces, so one trim restores the
    exact canonical form."""
    tag = F.concat(F.lit("<|"), role, F.lit("|>"))
    norm = F.trim(normalized_text(text))
    return F.when(
        F.length(norm) > 0,
        F.concat(F.array(tag), F.split(norm, " "))
    ).otherwise(F.array(tag))


def render_conversations(turns: DataFrame, conv_col: str = "conv_id",
                         turn_col: str = "turn_idx",
                         role_col: str = "role",
                         text_col: str = "text",
                         turn_toks_col: str | None = None) -> DataFrame:
    """(conv_id, text, tokens, n_tokens, spans): each conversation's
    canonical serialized form.

    ``spans`` is array<struct(turn_idx, role, tok_start, tok_len)> in
    turn order, with ``tok_start`` the 0-based stream position of the
    turn's tag token and ``tok_len`` covering tag + content. The
    per-turn offsets are an in-row prefix sum over materialized length
    columns — no window, no second shuffle; the only exchange is the
    conversation-assembly groupBy.

    ``turn_toks_col`` names a PRE-TOKENIZED content array on ``turns``
    (e.g. ``bpe.bpe_token_arrays`` with ``drop_empty=False`` — the
    round-6 trained-tokenizer path): each turn renders as its role tag
    token followed by that array verbatim, so spans/masks index the BPE
    stream. The ``text`` column is then only informational (BPE tokens
    contain spaces; the token ARRAY is the canonical stream, and the
    packing materializers consume arrays, not text)."""
    turn_struct = [
        F.col(turn_col).alias("turn_idx"),
        F.col(role_col).alias("role"),
    ]
    if turn_toks_col is None:
        turn_struct.append(F.col(text_col).alias("text"))
    else:
        turn_struct.append(F.coalesce(
            F.col(turn_toks_col),
            F.array().cast("array<string>")).alias("ctoks"))
    assembled = (
        turns.groupBy(conv_col)
        .agg(F.array_sort(F.collect_list(
            F.struct(*turn_struct))).alias("_ts"))
    )

    def _toks(t):
        if turn_toks_col is None:
            return _turn_tokens(t["role"], t["text"])
        tag = F.concat(F.lit("<|"), t["role"], F.lit("|>"))
        return F.concat(F.array(tag), t["ctoks"])

    with_toks = assembled.withColumn(
        "_tt",
        F.transform(F.col("_ts"), lambda t: F.struct(
            t["turn_idx"].alias("turn_idx"),
            t["role"].alias("role"),
            _toks(t).alias("toks"))))
    # materialize lengths, then offsets, as separate columns: the span
    # builder below references them per element, and attribute slices
    # are field reads while inlined expression trees would re-run the
    # normalization regex per turn (the HOF re-evaluation class)
    with_lens = with_toks.withColumn(
        "_lens", F.transform(F.col("_tt"), lambda x: F.size(x["toks"])))
    with_offs = with_lens.withColumn(
        "_offs",
        F.aggregate(
            F.col("_lens"), F.array(F.lit(0)),
            lambda acc, ln: F.concat(
                acc, F.array(F.element_at(acc, -1) + ln))))
    spans = F.zip_with(
        F.col("_tt"), F.slice(F.col("_offs"), 1, F.size(F.col("_tt"))),
        lambda t, off: F.struct(
            t["turn_idx"].alias("turn_idx"),
            t["role"].alias("role"),
            off.cast("long").alias("tok_start"),
            F.size(t["toks"]).cast("long").alias("tok_len")))
    tokens = F.flatten(F.transform(F.col("_tt"), lambda x: x["toks"]))
    return (
        with_offs
        .withColumn("spans", spans)
        .withColumn("tokens", tokens)
        .select(
            conv_col,
            F.array_join(F.col("tokens"), " ").alias("text"),
            "tokens",
            F.size(F.col("tokens")).cast("long").alias("n_tokens"),
            "spans")
    )


def pack_loss_spans(layout: DataFrame, rendered: DataFrame,
                    conv_col: str = "conv_id",
                    layout_id_col: str = "doc_id",
                    loss_role: str = "assistant") -> DataFrame:
    """Translate per-conversation loss spans into PACK coordinates —
    the artifact the trainer consumes next to the packed sequences:
    (pack_id, conv_id, tok_start, tok_len) where tok_start indexes the
    pack's token stream and covers a ``loss_role`` turn's CONTENT (tag
    token excluded). ``layout`` is a :func:`greedy_packs` output over
    the rendered conversations (whole-document packing — a
    conversation is never split, so a span maps into exactly one pack
    by adding that conversation's ``pack_off``). One equi-join on the
    conversation id; empty-content turns produce no span. For
    concat-and-chunk layouts (conversations split across packs) use
    :func:`pack_loss_spans_chunked`."""
    sp = (
        rendered.select(F.col(conv_col), F.explode("spans").alias("s"))
        .filter((F.col("s.role") == loss_role) & (F.col("s.tok_len") > 1))
        .select(F.col(conv_col),
                (F.col("s.tok_start") + 1).cast("long").alias("_cstart"),
                (F.col("s.tok_len") - 1).cast("long").alias("tok_len"))
    )
    lay = layout.select(F.col(layout_id_col).alias(conv_col),
                        "pack_id", "pack_off")
    return (
        sp.join(lay, conv_col)
        .select("pack_id", conv_col,
                (F.col("pack_off") + F.col("_cstart")).cast("long")
                .alias("tok_start"),
                "tok_len")
    )


def pack_loss_spans_chunked(layout: DataFrame, rendered: DataFrame,
                            conv_col: str = "conv_id",
                            layout_id_col: str = "doc_id",
                            loss_role: str = "assistant") -> DataFrame:
    """Loss spans for a :func:`packing.pack_chunks` layout — the
    round-6 completion of the SFT path: conversations LONGER than
    ``seq_len`` split across packs (the whole-doc :func:`pack_loss_spans`
    contract can't place them), so each loss span is intersected with
    the conversation's chunk slices and re-based per pack. Output:
    (pack_id, conv_id, tok_start, tok_len, conv_tok_start) — slice
    ``tok_len`` tokens at ``tok_start`` of the pack's stream;
    ``conv_tok_start`` is the segment's position in the conversation
    stream (content coordinates re-included so a trainer — or a test —
    can reassemble split spans in order without re-deriving the chunk
    tiling).

    Pure interval algebra over one equi-join on the conversation id:
    span [cstart, cstart+clen) ∩ chunk [tok_start, tok_start+tok_len)
    → pack coordinates by adding ``pack_off - tok_start``. Fan-out is
    (spans per conv) × (chunks per conv) before the overlap filter —
    both are small per conversation (turns, and n_tokens/seq_len), and
    the join key keeps it conversation-local, so no corpus-scale
    blowup; empty intersections are filtered, empty-content turns
    never enter."""
    sp = (
        rendered.select(F.col(conv_col), F.explode("spans").alias("s"))
        .filter((F.col("s.role") == loss_role) & (F.col("s.tok_len") > 1))
        .select(F.col(conv_col),
                (F.col("s.tok_start") + 1).cast("long").alias("_cstart"),
                (F.col("s.tok_start") + F.col("s.tok_len")).cast("long")
                .alias("_cend"))
    )
    lay = layout.select(F.col(layout_id_col).alias(conv_col),
                        "pack_id", "tok_start", "tok_len", "pack_off")
    ostart = F.greatest(F.col("_cstart"), F.col("tok_start"))
    oend = F.least(F.col("_cend"), F.col("tok_start") + F.col("tok_len"))
    return (
        sp.join(lay, conv_col)
        .select(F.col("pack_id"), F.col(conv_col),
                (F.col("pack_off") + ostart - F.col("tok_start"))
                .cast("long").alias("tok_start"),
                (oend - ostart).cast("long").alias("tok_len"),
                ostart.cast("long").alias("conv_tok_start"))
        .filter(F.col("tok_len") > 0)
    )


def write_sft_shards(packs: DataFrame, spans: DataFrame, path: str,
                     rows_per_shard: int = 1024, epoch: int = 0) -> dict:
    """Ship an SFT training set: the materialized packs AND their
    loss-span sidecar, each as verified row-bounded shards (the packing
    module's writer reused — both exports get the order-free sum+xor
    manifest). Layout: ``<path>/packs/{shards,_manifest}`` and
    ``<path>/spans/{shards,_manifest}``. Returns the two totals dicts
    merged (span keys prefixed ``spans_``)."""
    from .packing import write_training_shards

    pt = write_training_shards(packs, f"{path}/packs",
                               rows_per_shard, epoch)
    st = write_training_shards(spans, f"{path}/spans",
                               rows_per_shard, epoch)
    out = dict(pt)
    out.update({f"spans_{k}": v for k, v in st.items()})
    return out


def verify_sft_shards(spark, path: str, expected_packs: DataFrame,
                      expected_spans: DataFrame,
                      expected_mask: DataFrame,
                      conv_col: str = "conv_id") -> dict:
    """Trainer-side SFT export check: both shard sets verify against
    their manifests and sources (``packing.verify_training_shards``),
    AND the loss mask is recomputed FROM THE SHIPPED FILES ONLY —
    slicing each shipped pack's token stream with the shipped spans and
    reassembling per conversation — then compared against
    ``expected_mask`` (``assistant_mask`` output: conv_id,
    mask_tokens). That closes the loop a manifest can't: the spans
    actually index the token streams a trainer will load. Returns
    ``{packs_ok, spans_ok, mask_ok, ok}``."""
    from .packing import verify_training_shards

    packs_ok = verify_training_shards(
        spark, f"{path}/packs", expected_packs)["ok"]
    spans_ok = verify_training_shards(
        spark, f"{path}/spans", expected_spans)["ok"]
    shipped_packs = spark.read.parquet(f"{path}/packs/shards")
    shipped_spans = spark.read.parquet(f"{path}/spans/shards")
    order_col = ("conv_tok_start" if "conv_tok_start"
                 in shipped_spans.columns else "tok_start")
    segs = (
        shipped_spans
        .join(shipped_packs.select("pack_id", "tokens"), "pack_id")
        .select(F.col(conv_col), F.col(order_col).alias("_ord"),
                F.slice(F.col("tokens"),
                        (F.col("tok_start") + 1).cast("int"),
                        F.col("tok_len").cast("int")).alias("_seg"))
    )
    recon = segs.groupBy(conv_col).agg(
        F.flatten(F.transform(
            F.array_sort(F.collect_list(
                F.struct(F.col("_ord"), F.col("_seg")))),
            lambda s: s["_seg"])).alias("_recon"))
    exp = expected_mask.select(
        F.col(conv_col), F.col("mask_tokens").alias("_want")
    ).filter(F.size("_want") > 0)
    cmp = recon.join(exp, conv_col, "full").select(
        (F.coalesce(F.col("_recon") == F.col("_want"), F.lit(False)))
        .alias("_eq"))
    n_bad = cmp.filter(~F.col("_eq")).count()
    mask_ok = n_bad == 0
    return {"packs_ok": packs_ok, "spans_ok": spans_ok,
            "mask_ok": mask_ok,
            "ok": packs_ok and spans_ok and mask_ok}


def assistant_mask(rendered: DataFrame, conv_col: str = "conv_id",
                   loss_role: str = "assistant") -> DataFrame:
    """(conv_id, mask_tokens, n_mask_tokens, n_tokens): the tokens a
    trainer computes loss on — ``loss_role`` turns' CONTENT (each
    turn's tag token excluded), extracted by slicing the rendered
    stream with the recorded spans. Slicing the STREAM (rather than
    re-normalizing the turn texts) is deliberate: it proves the spans
    index the stream correctly, which is exactly what a packer
    translating spans into packs relies on."""
    role_spans = F.filter(F.col("spans"),
                          lambda s: s["role"] == loss_role)
    mask = F.flatten(F.transform(
        role_spans,
        lambda s: F.slice(
            F.col("tokens"),
            (s["tok_start"] + 2).cast("int"),
            (s["tok_len"] - 1).cast("int"))))
    return rendered.select(
        conv_col,
        mask.alias("mask_tokens"),
        F.size(mask).cast("long").alias("n_mask_tokens"),
        F.col("n_tokens"))

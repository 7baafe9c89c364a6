"""Round-5 training-data assembly operators: sequence packing, DSIR
importance resampling, SemDeDup semantic dedup."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from icdar_2019_rrc_sroie_spark.operators.dsir import (
    dsir_select,
    hashed_ngram_counts,
)
from icdar_2019_rrc_sroie_spark.operators.packing import (
    greedy_packs,
    hashed_vocab_ids,
    materialize_greedy_packs,
    materialize_packs,
    pack_chunks,
    pack_stats,
    token_counts,
)
from icdar_2019_rrc_sroie_spark.operators.semdedup import (
    kmeans_lloyd,
    semdedup,
)

SEQ = 64


def _counts_df(spark, tokens: dict[int, int]):
    return spark.createDataFrame(
        [(i, n) for i, n in tokens.items()], "doc_id long, n_tokens long")


def _md5_key(doc_id: int) -> str:
    import hashlib

    return hashlib.md5(f"pack{doc_id}".encode()).hexdigest()


def _stream_order(tokens: dict[int, int], n_shards: int):
    """The deterministic virtual-stream order both packers share."""
    rows = [(int(_md5_key(i)[:8], 16) % n_shards, _md5_key(i), i, n)
            for i, n in tokens.items() if n > 0]
    rows.sort()
    return rows


class TestPackChunks:
    def test_layout_matches_python_replay(self, spark):
        tokens = {i: (i * 37) % 150 + 1 for i in range(80)}
        got = pack_chunks(_counts_df(spark, tokens), SEQ, n_shards=4) \
            .collect()
        # replay: global cumsum in (shard, key, id) order
        expect = []
        g = 0
        for _, _, i, n in _stream_order(tokens, 4):
            for p in range(g // SEQ, (g + n - 1) // SEQ + 1):
                ts = max(0, p * SEQ - g)
                te = min(n, p * SEQ + SEQ - g)
                expect.append((p, i, ts, te - ts, max(0, g - p * SEQ)))
            g += n
        got_t = sorted((r.pack_id, r.doc_id, r.tok_start, r.tok_len,
                        r.pack_off) for r in got)
        assert got_t == sorted(expect)

    def test_all_packs_full_except_last(self, spark):
        tokens = {i: (i * 13) % 90 + 5 for i in range(60)}
        rows = pack_chunks(_counts_df(spark, tokens), SEQ, n_shards=4)
        sums = rows.groupBy("pack_id").agg(F.sum("tok_len").alias("s")) \
            .collect()
        last = max(r.pack_id for r in sums)
        assert all(r.s == SEQ for r in sums if r.pack_id != last)
        total = sum(n for n in tokens.values())
        assert sum(r.s for r in sums) == total  # every token placed once

    def test_doc_slices_are_contiguous_and_complete(self, spark):
        tokens = {1: 200, 2: 3, 3: SEQ * 2}  # spans, tiny, exact multiple
        rows = pack_chunks(_counts_df(spark, tokens), SEQ, n_shards=2) \
            .orderBy("doc_id", "tok_start").collect()
        by_doc: dict[int, list] = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        for d, parts in by_doc.items():
            assert parts[0].tok_start == 0
            for a, b in zip(parts, parts[1:]):
                assert b.tok_start == a.tok_start + a.tok_len
            assert sum(p.tok_len for p in parts) == tokens[d]

    def test_zero_token_docs_dropped(self, spark):
        rows = pack_chunks(_counts_df(spark, {1: 0, 2: 5}), SEQ,
                           n_shards=2).collect()
        assert {r.doc_id for r in rows} == {2}

    def test_no_global_single_partition_window(self, spark):
        """The corpus-sized cumsum window must be partitioned by shard;
        only the n_shards-row offsets aggregate may use a global
        window. A plan whose corpus window has an empty partition spec
        is the 1-task bottleneck this operator exists to avoid."""
        df = pack_chunks(_counts_df(spark, {i: 7 for i in range(50)}),
                         SEQ, n_shards=4)
        plan = df._jdf.queryExecution().executedPlan().toString()
        windows = [ln for ln in plan.splitlines() if "Window" in ln
                   and "windowspecdefinition" in ln]
        assert any("_shard" in w for w in windows)


class TestGreedyPacks:
    def test_matches_next_fit_replay(self, spark):
        tokens = {i: (i * 29) % 100 + 1 for i in range(70)}
        got = {(r.doc_id): (r.pack_id, r.pack_off, r.overflow)
               for r in greedy_packs(_counts_df(spark, tokens), SEQ,
                                     n_shards=4).collect()}
        expect = {}
        state: dict[int, tuple[int, int]] = {}
        for shard, _, i, n in _stream_order(tokens, 4):
            pack, fill = state.get(shard, (0, 0))
            if fill > 0 and fill + n > SEQ:
                pack, fill = pack + 1, 0
            expect[i] = ((shard << 40) + pack, fill, n > SEQ)
            fill += n
            if fill >= SEQ:
                pack, fill = pack + 1, 0
            state[shard] = (pack, fill)
        assert got == expect

    def test_no_pack_overflows_and_overflow_flagged(self, spark):
        tokens = {1: SEQ + 10, 2: 30, 3: 40, 4: 20, 5: SEQ}
        rows = greedy_packs(_counts_df(spark, tokens), SEQ, n_shards=1) \
            .collect()
        for r in rows:
            if not r.overflow:
                assert r.pack_off + r.n_tokens <= SEQ
        assert {r.doc_id for r in rows if r.overflow} == {1}
        # overflow doc sits alone in its pack
        ovf_pack = next(r.pack_id for r in rows if r.overflow)
        assert sum(1 for r in rows if r.pack_id == ovf_pack) == 1

    def test_pack_stats_waste(self, spark):
        tokens = {1: 40, 2: 40}  # one pack of 40+... 40+40 > 64 -> 2 packs
        packs = greedy_packs(_counts_df(spark, tokens), SEQ, n_shards=1)
        row = pack_stats(packs, SEQ).collect()[0]
        assert row.n_packs == 2 and row.n_tokens == 80
        assert abs(row.waste_frac - (1 - 80 / 128)) < 1e-12
        assert row.n_overflow == 0 and row.n_overflow_tokens == 0

    def test_pack_stats_overflow_clamped(self, spark):
        # an overflow pack is FULL, not negatively wasteful: unclamped,
        # one 3*SEQ doc would drive waste_frac to -2 and mask the real
        # padding of its neighbors (round-5 advice)
        tokens = {1: 3 * SEQ, 2: SEQ // 2}
        packs = greedy_packs(_counts_df(spark, tokens), SEQ, n_shards=1)
        row = pack_stats(packs, SEQ).collect()[0]
        assert row.n_packs == 2
        assert row.n_overflow == 1
        assert row.n_overflow_tokens == 2 * SEQ
        # pack 1 full (clamped), pack 2 half full -> waste = 0.25
        assert abs(row.waste_frac - 0.25) < 1e-12

    def test_token_counts_canonicalization(self, spark):
        df = spark.createDataFrame(
            [(1, "  Hello   WORLD  "), (2, ""), (3, "   "), (4, "one")],
            "doc_id long, text string")
        got = {r.doc_id: r.n_tokens for r in token_counts(df).collect()}
        assert got == {1: 2, 2: 0, 3: 0, 4: 1}


def _docs_df(spark, tokens: dict[int, int]):
    """Docs whose canonical tokenization is w<i>_0 .. w<i>_{n-1} —
    token_counts(df) reproduces ``tokens`` exactly."""
    return spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(n)))
         for i, n in tokens.items()],
        "doc_id long, text string")


class TestMaterializePacks:
    def test_stream_reassembles_exactly(self, spark):
        """Concatenating materialized packs in pack_id order IS the
        virtual stream: docs' tokens in md5-shard order, nothing
        duplicated, dropped, or reordered — the per-token guarantee
        the layout rows only imply."""
        tokens = {i: (i * 31) % 140 + 1 for i in range(40)}
        docs = _docs_df(spark, tokens)
        layout = pack_chunks(token_counts(docs), SEQ, n_shards=4)
        packs = materialize_packs(docs, layout) \
            .orderBy("pack_id").collect()
        got_stream = [t for r in packs for t in r.tokens]
        expect_stream = [
            f"w{i}_{j}" for _, _, i, n in _stream_order(tokens, 4)
            for j in range(n)]
        assert got_stream == expect_stream
        assert [r.pack_id for r in packs] == list(range(len(packs)))
        for r in packs[:-1]:
            assert r.n_tokens == SEQ and len(r.tokens) == SEQ
        tail = len(expect_stream) % SEQ or SEQ
        assert packs[-1].n_tokens == tail

    def test_hashed_vocab_ids_deterministic(self, spark):
        import hashlib

        docs = _docs_df(spark, {1: 5, 2: 3})
        layout = pack_chunks(token_counts(docs), SEQ, n_shards=2)
        row = materialize_packs(docs, layout, vocab_size=97) \
            .orderBy("pack_id").collect()[0]
        expect = [int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 97
                  for t in row.tokens]
        assert list(row.token_ids) == expect

    def test_greedy_materialization_pads_and_respects_bins(self, spark):
        tokens = {1: SEQ + 10, 2: 30, 3: 25, 4: 20, 5: 12}
        docs = _docs_df(spark, tokens)
        layout = greedy_packs(token_counts(docs), SEQ, n_shards=1)
        packs = materialize_greedy_packs(
            docs, layout, SEQ, pad_token="<pad>").collect()
        by_id = {r.pack_id: r for r in packs}
        lay = layout.collect()
        for r in packs:
            if r.overflow:
                assert r.n_pad == 0 and r.n_tokens == SEQ + 10
            else:
                assert len(r.tokens) == SEQ
                assert r.tokens[r.n_tokens:] == ["<pad>"] * r.n_pad
                assert "<pad>" not in r.tokens[:r.n_tokens]
        # within-pack doc order is the layout's pack_off order
        for lr in lay:
            pk = by_id[lr.pack_id]
            seg = pk.tokens[lr.pack_off:lr.pack_off + lr.n_tokens]
            assert seg == [f"w{lr.doc_id}_{j}" for j in range(lr.n_tokens)]
        # every token of every doc placed exactly once
        total = sum(r.n_tokens for r in packs)
        assert total == sum(tokens.values())


class TestTrainingSet:
    """Composition invariants of the end-to-end assembly query
    (each stage's values are SQL-oracled via its own entry)."""

    @pytest.fixture(scope="class")
    def result(self, spark):
        from icdar_2019_rrc_sroie_spark.operators.indexes import (
            release_indexes,
        )
        from icdar_2019_rrc_sroie_spark.queries_training import (
            _SEQ_LEN,
            q_training_set,
        )

        rows = q_training_set(spark, "/root/testdata/sf0.001").collect()
        release_indexes()
        return rows, _SEQ_LEN

    def test_emits_full_sequences(self, result):
        rows, seq_len = result
        assert rows, "assembly should emit sequences"
        # zero-waste: every pack but the stream tail is exactly full
        last = max(r.pack_id for r in rows)
        assert all(r.n_tokens == seq_len for r in rows
                   if r.pack_id != last)
        assert rows[-1].n_tokens <= seq_len
        assert [r.pack_id for r in sorted(rows, key=lambda r: r.pack_id)] \
            == list(range(len(rows)))

    def test_deterministic_across_runs(self, spark, result):
        from icdar_2019_rrc_sroie_spark.operators.indexes import (
            release_indexes,
        )
        from icdar_2019_rrc_sroie_spark.queries_training import (
            q_training_set,
        )

        rows, _ = result
        again = q_training_set(spark, "/root/testdata/sf0.001").collect()
        release_indexes()
        assert [tuple(r) for r in again] == [tuple(r) for r in rows]


class TestDsir:
    def test_selects_target_like_docs(self, spark):
        # target vocabulary tok0..; raw pool: 30 target-like + 70 noise.
        # alpha must stay small vs the gram mass (see queries_training's
        # _DSIR_ALPHA note) or the smoothing flattens the log-ratios
        # into the Gumbel noise floor.
        tgt = [(1000 + i, " ".join(f"tok{j}" for j in range(i, i + 40)))
               for i in range(10)]
        like = [(i, " ".join(f"tok{j}" for j in range(i % 8, i % 8 + 40)))
                for i in range(30)]
        noise = [(100 + i,
                  " ".join(f"zz{i}_{j} qq{i}_{j}" for j in range(20)))
                 for i in range(70)]
        raw = spark.createDataFrame(like + noise, "doc_id long, text string")
        target = spark.createDataFrame(tgt, "doc_id long, text string")
        sel = dsir_select(raw, target, n_keep=30, alpha=0.05).collect()
        picked = {r.doc_id for r in sel}
        # overwhelming majority of the selected set is the planted slice
        assert len(picked & set(range(30))) >= 25

    def test_score_is_exact_integer_recompute(self, spark):
        import hashlib

        B = 64
        raw = spark.createDataFrame(
            [(1, "a b c a b"), (2, "x y z")], "doc_id long, text string")
        target = spark.createDataFrame([(9, "a b c")],
                                       "doc_id long, text string")
        sel = dsir_select(raw, target, n_keep=2, n_buckets=B).collect()

        def bucket(g):
            return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B

        def bigrams(t):
            ts = t.split()
            return [f"{a} {b}" for a, b in zip(ts, ts[1:])]

        tc: dict[int, int] = {}
        for g in bigrams("a b c"):
            tc[bucket(g)] = tc.get(bucket(g), 0) + 1
        rc: dict[int, int] = {}
        for t in ("a b c a b", "x y z"):
            for g in bigrams(t):
                rc[bucket(g)] = rc.get(bucket(g), 0) + 1
        tt, rt = sum(tc.values()), sum(rc.values())
        for r in sel:
            doc = "a b c a b" if r.doc_id == 1 else "x y z"
            s = 0
            for g in bigrams(doc):
                b = bucket(g)
                w = (math.log((tc.get(b, 0) + 1.0) / (tt + B))
                     - math.log((rc.get(b, 0) + 1.0) / (rt + B)))
                s += math.floor(w * 1e6 + 0.5)
            assert r.score_micro == s


class TestSemDedup:
    def _vecs(self):
        rng = np.random.RandomState(3)
        base = rng.standard_normal((4, 16))
        rows = []
        vid = 0
        for c in range(4):
            for j in range(6):
                v = base[c] + rng.standard_normal(16) * (0.01 if j < 3
                                                         else 2.0)
                rows.append((vid, [float(x) for x in v]))
                vid += 1
        return rows

    def test_parity_with_numpy_reference(self, spark):
        rows = self._vecs()
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        from icdar_2019_rrc_sroie_spark.operators.similarity import (
            train_centroids,
        )

        cents = kmeans_lloyd(df, train_centroids(df, k=4), iters=3)
        got = {r.vec_id: r.keep
               for r in semdedup(df, eps=0.9, centroids=cents).collect()}

        # NumPy replay of the SemDeDup rule
        V = np.array([np.array(v, dtype=np.float32).astype(np.float64)
                      for _, v in rows])
        C = np.array(cents)
        d2 = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)

        def cos(a, b):
            return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

        keep = {}
        for c in range(4):
            ids = [i for i in range(len(rows)) if assign[i] == c]
            ids.sort(key=lambda i: (cos(V[i], C[c]), i))
            for pos, i in enumerate(ids):
                keep[i] = not any(
                    cos(V[i], V[j]) >= 0.9 for j in ids[:pos])
        assert got == keep

    def test_lloyd_reduces_distortion(self, spark):
        rows = self._vecs()
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        V = np.array([np.array(v, dtype=np.float32).astype(np.float64)
                      for _, v in rows])

        def distortion(cents):
            C = np.array(cents)
            return float(((V[:, None, :] - C[None, :, :]) ** 2)
                         .sum(axis=2).min(axis=1).sum())

        init = [[float(x) for x in V[i]] for i in (0, 1, 2, 3)]
        refined = kmeans_lloyd(df, init, iters=4)
        assert distortion(refined) <= distortion(init) + 1e-9

    def test_capped_clusters_default_keep(self, spark):
        rows = self._vecs()
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        from icdar_2019_rrc_sroie_spark.operators.similarity import (
            train_centroids,
        )

        cents = kmeans_lloyd(df, train_centroids(df, k=4), iters=2)
        out = semdedup(df, eps=0.9, centroids=cents,
                       max_cluster_size=1).collect()
        assert len(out) == len(rows)
        assert all(r.keep for r in out)  # nothing judged -> nothing dropped


def test_greedy_packs_preserves_id_type(spark):
    """The applyInPandas output schema derives the id column's type from
    the input (round-5 review: a hardcoded `long` broke string-id
    corpora that every other packing entry point accepts)."""
    counts = spark.createDataFrame(
        [("a", 10), ("b", 200), ("c", 70)], "doc_id string, n_tokens long")
    out = greedy_packs(counts, SEQ, n_shards=4)
    assert dict(out.dtypes)["doc_id"] == "string"
    rows = out.collect()
    assert {r["doc_id"] for r in rows} == {"a", "b", "c"}


def test_epoch_order_deterministic_permutations(spark):
    """epoch_order: per-epoch permutations differ, re-runs are
    byte-identical, and the multiset never changes."""
    from icdar_2019_rrc_sroie_spark.operators.packing import epoch_order

    packs = spark.createDataFrame(
        [(i, i * 10) for i in range(60)], "pack_id long, n_tokens long")
    e0a = [r["pack_id"] for r in epoch_order(packs, 0).collect()]
    e0b = [r["pack_id"] for r in epoch_order(packs, 0).collect()]
    e1 = [r["pack_id"] for r in epoch_order(packs, 1).collect()]
    assert e0a == e0b
    assert e0a != e1
    assert sorted(e0a) == sorted(e1) == list(range(60))


def test_write_and_verify_training_shards(spark, tmp_path):
    """Shipping step: shards are row-bounded, the manifest totals match
    the input, verify passes against the source and fails against a
    tampered expectation, and a re-export is idempotent."""
    from pyspark.sql import functions as F

    from icdar_2019_rrc_sroie_spark.operators.packing import (
        doc_token_arrays,
        verify_training_shards,
        write_training_shards,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").filter("doc_id < 80")
    seqs = doc_token_arrays(docs).select(
        F.col("doc_id").alias("pack_id"),
        F.size("toks").cast("long").alias("n_tokens"),
        F.col("toks").alias("tokens"))
    path = str(tmp_path / "ship")
    totals = write_training_shards(seqs, path, rows_per_shard=16)
    n_seqs = seqs.count()
    n_toks = seqs.agg(F.sum("n_tokens")).collect()[0][0]
    assert totals["n_rows"] == n_seqs
    assert totals["n_tokens"] == int(n_toks)
    assert totals["n_shards"] >= n_seqs // 16

    back = spark.read.parquet(f"{path}/shards")
    per_file = (back.groupBy(F.input_file_name()).count().collect())
    assert all(r["count"] <= 16 for r in per_file)

    v = verify_training_shards(spark, path, seqs)
    assert v["ok"] and v["shipped_rows"] == n_seqs
    tampered = verify_training_shards(spark, path,
                                      seqs.filter("pack_id != 3"))
    assert not tampered["ok"]

    totals2 = write_training_shards(seqs, path, rows_per_shard=16)
    assert totals2["n_rows"] == totals["n_rows"]
    assert totals2["sig_sum"] == totals["sig_sum"]
    # second order-free combiner (r6): xor signature is also stable
    # across re-exports and present in the manifest totals
    assert totals2["sig_xor"] == totals["sig_xor"]
    assert isinstance(totals["sig_xor"], int)


def test_render_conversations_python_replay(spark):
    """SFT rendering: spans/tokens match a pure-Python replay on messy
    input (collapsed whitespace, empty turns, out-of-order arrival)."""
    from pyspark.sql import functions as F

    from icdar_2019_rrc_sroie_spark.operators.sft import (
        assistant_mask,
        render_conversations,
    )

    rows = [
        (1, 1, "assistant", "Hi!  How can   I help?"),
        (1, 0, "user", "  Hello there "),
        (1, 2, "tool", "   "),
        (1, 3, "assistant", "Done."),
        (2, 0, "user", "solo"),
    ]
    turns = spark.createDataFrame(
        rows, "conv_id long, turn_idx int, role string, text string")
    rendered = {r["conv_id"]: r
                for r in render_conversations(turns).collect()}

    def replay(conv):
        toks, spans = [], []
        for ti, role, text in sorted(
                (t[1], t[2], t[3]) for t in rows if t[0] == conv):
            tt = [f"<|{role}|>"] + " ".join(text.strip().lower()
                                            .split()).split()
            tt = [x for x in tt if x]
            spans.append((ti, role, len(toks), len(tt)))
            toks.extend(tt)
        return toks, spans

    for conv in (1, 2):
        toks, spans = replay(conv)
        got = rendered[conv]
        assert list(got["tokens"]) == toks
        assert [(s["turn_idx"], s["role"], s["tok_start"], s["tok_len"])
                for s in got["spans"]] == spans
        assert got["text"] == " ".join(toks)
    mask = {r["conv_id"]: list(r["mask_tokens"])
            for r in assistant_mask(
                render_conversations(turns)).collect()}
    assert mask[1] == ["hi!", "how", "can", "i", "help?", "done."]
    assert mask[2] == []


def test_sft_composes_with_packing(spark):
    """The rendered text is canonical-whitespace, so the whole packing
    family composes: token_counts over the rendered text equals the
    recorded n_tokens, greedy_packs keeps conversations whole, and the
    materialized pack stream carries each conversation contiguously at
    its pack offset."""
    from pyspark.sql import functions as F

    from icdar_2019_rrc_sroie_spark.operators.packing import (
        greedy_packs,
        materialize_greedy_packs,
        token_counts,
    )
    from icdar_2019_rrc_sroie_spark.operators.sft import (
        render_conversations,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").filter("doc_id < 90")
    turns = docs.select(
        (F.col("doc_id") % 9).alias("conv_id"),
        F.floor(F.col("doc_id") / 9).cast("int").alias("turn_idx"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant")).alias("role"),
        F.substring("text", 1, 100).alias("text"))
    rendered = render_conversations(turns)
    as_docs = rendered.select(F.col("conv_id").alias("doc_id"),
                              "text", "tokens", "n_tokens")
    counted = {r["doc_id"]: r["n_tokens"]
               for r in token_counts(as_docs).collect()}
    recorded = {r["doc_id"]: r["n_tokens"] for r in as_docs.collect()}
    assert counted == recorded

    layout = greedy_packs(token_counts(as_docs), 512, n_shards=4)
    packs = materialize_greedy_packs(as_docs, layout, 512)
    lay = {r["doc_id"]: r for r in layout.collect()}
    streams = {r["pack_id"]: list(r["tokens"]) for r in packs.collect()}
    convs = {r["doc_id"]: list(r["tokens"]) for r in as_docs.collect()}
    assert set(lay) == set(convs)
    for cid, row in lay.items():
        off = row["pack_off"]
        toks = convs[cid]
        assert streams[row["pack_id"]][off:off + len(toks)] == toks


def test_pack_loss_spans_index_pack_streams(spark):
    """Loss spans translated into pack coordinates must slice the
    MATERIALIZED pack streams to exactly the assistant content the
    conversation-level mask extracts — the full render -> pack ->
    mask-translation loop."""
    from pyspark.sql import functions as F

    from icdar_2019_rrc_sroie_spark.operators.packing import (
        greedy_packs,
        materialize_greedy_packs,
        token_counts,
    )
    from icdar_2019_rrc_sroie_spark.operators.sft import (
        assistant_mask,
        pack_loss_spans,
        render_conversations,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").filter("doc_id < 90")
    turns = docs.select(
        (F.col("doc_id") % 9).alias("conv_id"),
        F.floor(F.col("doc_id") / 9).cast("int").alias("turn_idx"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant")).alias("role"),
        F.substring("text", 1, 100).alias("text"))
    rendered = render_conversations(turns).persist()
    as_docs = rendered.select(F.col("conv_id").alias("doc_id"),
                              "text", "n_tokens")
    layout = greedy_packs(token_counts(as_docs), 512, n_shards=4)
    packs = materialize_greedy_packs(
        rendered.select(F.col("conv_id").alias("doc_id"), "text"),
        layout, 512)
    spans = pack_loss_spans(layout, rendered).collect()
    streams = {r["pack_id"]: list(r["tokens"]) for r in packs.collect()}
    got = {}
    for r in spans:
        seg = streams[r["pack_id"]][r["tok_start"]:
                                    r["tok_start"] + r["tok_len"]]
        got.setdefault(r["conv_id"], []).extend(
            (r["tok_start"], tuple(seg)))
    # per conversation, concatenating the pack slices in tok_start
    # order reproduces the conversation-level mask exactly
    mask = {r["conv_id"]: list(r["mask_tokens"])
            for r in assistant_mask(rendered).collect()}
    for cid, parts in got.items():
        ordered = [t for _, seg in sorted(
            zip(parts[0::2], parts[1::2])) for t in seg]
        assert ordered == mask[cid], cid
    assert set(got) == {c for c, m in mask.items() if m}
    rendered.unpersist()


def test_bfd_packs_beats_next_fit_and_composes(spark):
    """Best-fit-decreasing packing: capacity never exceeded, waste no
    worse than next-fit on the corpus, deterministic across input
    partitionings, and the materializer reassembles its packs with
    correct contiguous placement."""
    from pyspark.sql import functions as F

    from icdar_2019_rrc_sroie_spark.operators.packing import (
        bfd_packs,
        greedy_packs,
        materialize_greedy_packs,
        pack_stats,
        token_counts,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").filter("doc_id < 200")
    counts = token_counts(docs)
    bfd = bfd_packs(counts, SEQ, n_shards=4)
    nf = greedy_packs(counts, SEQ, n_shards=4)

    rows = bfd.collect()
    fills = {}
    for r in rows:
        if not r["overflow"]:
            fills.setdefault(r["pack_id"], []).append(
                (r["pack_off"], r["n_tokens"]))
    for pid, spans in fills.items():
        spans.sort()
        cursor = 0
        for off, n in spans:
            assert off >= cursor, (pid, spans)  # no overlap
            cursor = off + n
        assert cursor <= SEQ, (pid, cursor)

    w_bfd = pack_stats(bfd, SEQ).collect()[0]["waste_frac"]
    w_nf = pack_stats(nf, SEQ).collect()[0]["waste_frac"]
    assert w_bfd <= w_nf + 1e-12

    again = bfd_packs(counts.repartition(7), SEQ, n_shards=4)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))

    packs = materialize_greedy_packs(docs, bfd, SEQ)
    toks = {r["pack_id"]: list(r["tokens"]) for r in packs.collect()}
    from icdar_2019_rrc_sroie_spark.operators.packing import (
        doc_token_arrays,
    )
    dt = {r["doc_id"]: list(r["toks"])
          for r in doc_token_arrays(docs).collect()}
    for r in rows:
        if r["overflow"]:
            continue
        seg = toks[r["pack_id"]]
        # materializer concatenates chunks in pack_off ORDER (gaps
        # collapse), so locate by cumulative position among the pack's
        # spans rather than raw offset
        pos = sum(n for off, n in fills[r["pack_id"]]
                  if off < r["pack_off"])
        assert seg[pos:pos + r["n_tokens"]] == dt[r["doc_id"]], r


def test_render_conversations_trailing_newline_consistency(spark):
    """Round-5 review repro, pinned: a turn ending in a newline (or
    tab) must not desync the recorded n_tokens from token_counts over
    the rendered text — normalized_text's space-only trim leaves a
    trailing collapsed space whose split yields a phantom '' token
    unless the render re-trims."""
    from pyspark.sql import functions as F

    from icdar_2019_rrc_sroie_spark.operators.packing import (
        token_counts,
    )
    from icdar_2019_rrc_sroie_spark.operators.sft import (
        assistant_mask,
        render_conversations,
    )

    turns = spark.createDataFrame(
        [(1, 0, "user", "Hello there"),
         (1, 1, "assistant", "Done.\n"),
         (2, 0, "assistant", "\ttabbed\t")],
        "conv_id long, turn_idx int, role string, text string")
    rendered = render_conversations(turns)
    rows = {r["conv_id"]: r for r in rendered.collect()}
    assert list(rows[1]["tokens"]) == [
        "<|user|>", "hello", "there", "<|assistant|>", "done."]
    assert "" not in rows[2]["tokens"]
    counted = {r["doc_id"]: r["n_tokens"] for r in token_counts(
        rendered.select(F.col("conv_id").alias("doc_id"), "text")
    ).collect()}
    recorded = {r["conv_id"]: r["n_tokens"] for r in rendered.collect()}
    assert counted == recorded
    mask = {r["conv_id"]: list(r["mask_tokens"])
            for r in assistant_mask(rendered).collect()}
    assert mask[1] == ["done."] and mask[2] == ["tabbed"]


def test_bpe_materialize_packs_streams_and_ids(spark):
    """Round-6 trained-tokenizer wiring: a chunk layout built from
    token_counts_from_arrays over bpe_token_arrays output, materialized
    with tokens_df=..., must (a) emit full packs except the tail,
    (b) reassemble the exact concatenated BPE stream in md5 order, and
    (c) carry token_ids sliced in lockstep with the token strings
    (trained vocab, not the hashing trick)."""
    import hashlib

    from pyspark.sql import functions as F

    from icdar_2019_rrc_sroie_spark.operators.bpe import (
        bpe_token_arrays,
        bpe_vocab,
    )
    from icdar_2019_rrc_sroie_spark.operators.packing import (
        materialize_packs,
        pack_chunks,
        token_counts_from_arrays,
    )

    SEQ, SHARDS = 128, 4
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").filter("doc_id < 60")
    barr = bpe_token_arrays(docs).persist()
    layout = pack_chunks(token_counts_from_arrays(barr), SEQ, SHARDS)
    packs = materialize_packs(None, layout, tokens_df=barr) \
        .orderBy("pack_id").collect()
    vocab = bpe_vocab()
    # (a) zero waste, (c) ids parallel to tokens
    for i, p in enumerate(packs):
        if i < len(packs) - 1:
            assert p.n_tokens == SEQ
        assert list(p.token_ids) == [vocab.get(t, 0) for t in p.tokens]
    # (b) exact stream reassembly in the deterministic md5 order
    arrs = {r["doc_id"]: list(r["toks"]) for r in barr.collect()}

    def key(i):
        h = hashlib.md5(f"pack{i}".encode()).hexdigest()
        return (int(h[:8], 16) % SHARDS, h, i)

    expected = [t for i in sorted(arrs, key=key) for t in arrs[i]]
    got = [t for p in packs for t in p.tokens]
    assert got == expected
    barr.unpersist()


def test_bpe_sft_pack_slice_equals_mask(spark):
    """The SFT loop over the TRAINED-BPE stream (round 6): render with
    pre-tokenized turns, greedy-pack the rendered conversations via
    token_counts_from_arrays, materialize with tokens_df, translate
    loss spans — pack slices must reproduce the assistant-mask content
    exactly on the BPE stream."""
    from pyspark.sql import functions as F

    from icdar_2019_rrc_sroie_spark.operators.bpe import bpe_token_arrays
    from icdar_2019_rrc_sroie_spark.operators.packing import (
        greedy_packs,
        materialize_greedy_packs,
        token_counts_from_arrays,
    )
    from icdar_2019_rrc_sroie_spark.operators.sft import (
        assistant_mask,
        pack_loss_spans,
        render_conversations,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").filter("doc_id < 90")
    turns = docs.select(
        "doc_id",
        (F.col("doc_id") % 9).alias("conv_id"),
        F.floor(F.col("doc_id") / 9).cast("int").alias("turn_idx"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant")).alias("role"),
        F.substring("text", 1, 100).alias("text"))
    tt = bpe_token_arrays(turns, drop_empty=False)
    turns_tok = turns.join(
        tt.select("doc_id", F.col("toks").alias("ctoks")), "doc_id")
    rendered = render_conversations(
        turns_tok, turn_toks_col="ctoks").persist()
    counts = token_counts_from_arrays(
        rendered.select(F.col("conv_id").alias("doc_id"),
                        F.col("tokens").alias("toks")))
    layout = greedy_packs(counts, 512, n_shards=4)
    packs = materialize_greedy_packs(
        None, layout, 512,
        tokens_df=rendered.select(F.col("conv_id").alias("doc_id"),
                                  F.col("tokens").alias("toks")))
    spans = pack_loss_spans(layout, rendered).collect()
    streams = {r["pack_id"]: list(r["tokens"]) for r in packs.collect()}
    got = {}
    for r in spans:
        seg = streams[r["pack_id"]][r["tok_start"]:
                                    r["tok_start"] + r["tok_len"]]
        got.setdefault(r["conv_id"], []).extend(
            (r["tok_start"], tuple(seg)))
    mask = {r["conv_id"]: list(r["mask_tokens"])
            for r in assistant_mask(rendered).collect()}
    for cid, parts in got.items():
        ordered = [t for _, seg in sorted(
            zip(parts[0::2], parts[1::2])) for t in seg]
        assert ordered == mask[cid], cid
    assert set(got) == {c for c, m in mask.items() if m}
    # BPE content tokens keep their leading spaces through the loop
    assert any(t.startswith(" ") for m in mask.values() for t in m)
    rendered.unpersist()


class TestDsirThreshold:
    """Round-6 threshold-mode selection: the distributed shape for
    corpus-scale n_keep — same selected set as exact, no O(n_keep)
    TakeOrdered in the plan."""

    def _scores(self, spark, n=5000):
        from pyspark.sql import functions as F

        # deterministic quasi-random integer scores with planted ties
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 97 + 1).alias("n_grams"),
            ((F.col("id") * 2654435761) % 1000000 - 500000)
            .alias("score_micro"))

    def test_same_set_as_exact(self, spark):
        from icdar_2019_rrc_sroie_spark.operators.dsir import dsir_resample
        from icdar_2019_rrc_sroie_spark.operators.indexes import (
            release_indexes,
        )

        scores = self._scores(spark)
        for n_keep in (100, 2500, 4999):
            exact = {tuple(r) for r in dsir_resample(
                scores, n_keep, mode="exact").collect()}
            thr = {tuple(r) for r in dsir_resample(
                scores, n_keep, mode="threshold").collect()}
            assert thr == exact, n_keep
            assert len(thr) == n_keep
        release_indexes()

    def test_no_corpus_scale_take_ordered(self, spark):
        import re

        from icdar_2019_rrc_sroie_spark.operators.dsir import dsir_resample
        from icdar_2019_rrc_sroie_spark.operators.indexes import (
            release_indexes,
        )

        def _plan(df) -> str:
            return df._jdf.queryExecution().executedPlan().toString()

        scores = self._scores(spark, n=20000)
        n_keep = 15000
        plan = _plan(dsir_resample(scores, n_keep, mode="threshold"))
        limits = [int(m) for m in re.findall(
            r"TakeOrderedAndProject\(limit=(\d+)", plan)]
        # the only sort-limit is the band tie-break, O(rel_err*N):
        # far below n_keep (exact mode would show limit=15000)
        assert limits, "band tie-break should be a TakeOrdered"
        assert all(lim < n_keep // 10 for lim in limits), limits
        exact_plan = _plan(dsir_resample(scores, n_keep, mode="exact"))
        assert f"TakeOrderedAndProject(limit={n_keep}" in exact_plan
        release_indexes()

    def test_auto_cutoff_and_degenerate_cases(self, spark):
        from icdar_2019_rrc_sroie_spark.operators.dsir import dsir_resample
        from icdar_2019_rrc_sroie_spark.operators.indexes import (
            release_indexes,
        )

        scores = self._scores(spark, n=400)
        # auto below cutoff -> exact plan
        plan = dsir_resample(scores, 50, mode="auto") \
            ._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject(limit=50" in plan
        # n_keep >= total -> everything selected, no sort at all
        rows = dsir_resample(scores, 1000, mode="threshold").collect()
        assert len(rows) == 400
        release_indexes()


def test_pack_loss_spans_chunked_index_pack_streams(spark):
    """Round-6: loss spans for a CHUNK layout (conversations split
    across packs) must slice the materialized pack streams to exactly
    the assistant-mask content, reassembled across packs in
    conversation order via conv_tok_start."""
    from pyspark.sql import functions as F

    from icdar_2019_rrc_sroie_spark.operators.packing import (
        materialize_packs,
        pack_chunks,
        token_counts_from_arrays,
    )
    from icdar_2019_rrc_sroie_spark.operators.sft import (
        assistant_mask,
        pack_loss_spans_chunked,
        render_conversations,
    )

    SEQ = 48  # far below conversation size -> every conv splits
    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").filter("doc_id < 90")
    turns = docs.select(
        (F.col("doc_id") % 9).alias("conv_id"),
        F.floor(F.col("doc_id") / 9).cast("int").alias("turn_idx"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("user"))
        .otherwise(F.lit("assistant")).alias("role"),
        F.substring("text", 1, 100).alias("text"))
    rendered = render_conversations(turns).persist()
    as_toks = rendered.select(F.col("conv_id").alias("doc_id"),
                              F.col("tokens").alias("toks"))
    layout = pack_chunks(token_counts_from_arrays(as_toks), SEQ,
                         n_shards=4)
    packs = materialize_packs(None, layout, tokens_df=as_toks)
    streams = {r["pack_id"]: list(r["tokens"]) for r in packs.collect()}
    spans = pack_loss_spans_chunked(layout, rendered).collect()
    # conversations really do split across packs
    assert len({r["pack_id"] for r in spans}) > len(
        {r["conv_id"] for r in spans})
    got = {}
    for r in spans:
        seg = streams[r["pack_id"]][r["tok_start"]:
                                    r["tok_start"] + r["tok_len"]]
        assert len(seg) == r["tok_len"], "span exceeds pack stream"
        got.setdefault(r["conv_id"], []).append(
            (r["conv_tok_start"], seg))
    mask = {r["conv_id"]: list(r["mask_tokens"])
            for r in assistant_mask(rendered).collect()}
    for cid, parts in got.items():
        ordered = [t for _, seg in sorted(parts) for t in seg]
        assert ordered == mask[cid], cid
    assert set(got) == {c for c, m in mask.items() if m}
    # split evidence: some conversation contributes from >1 pack
    assert any(len({p for p, _ in [(r["pack_id"], 0) for r in spans
                                   if r["conv_id"] == cid]}) > 1
               for cid in got)
    rendered.unpersist()


class TestLloydExactAccumulation:
    """Round 6: the per-cluster mean is an order-free integer-nanos
    sum (decimal(38,0)) — refined centroids are bit-identical under
    any partitioning, which is what makes the resume contract exact."""

    def _df(self, spark):
        rng = np.random.RandomState(7)
        rows = [(i, [float(x) for x in rng.standard_normal(8)])
                for i in range(300)]
        return spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")

    def _init(self):
        rng = np.random.RandomState(3)
        return [[float(x) for x in rng.standard_normal(8)]
                for _ in range(3)]

    def test_partitioning_invariance(self, spark):
        df = self._df(spark)
        init = self._init()
        a = kmeans_lloyd(df.repartition(2), init, iters=3)
        b = kmeans_lloyd(df.repartition(17), init, iters=3)
        assert a == b

    def test_resume_after_crash_identical(self, spark, tmp_path):
        df = self._df(spark)
        init = self._init()
        want = kmeans_lloyd(df, init, iters=4)
        rd = str(tmp_path / "lloyd")
        with pytest.raises(RuntimeError, match="injected failure"):
            kmeans_lloyd(df, init, iters=4, resume_dir=rd,
                         fail_after_iter=1)
        got = kmeans_lloyd(df, init, iters=4, resume_dir=rd)
        assert got == want
        # completed dir: rerun is a pure state read, same result
        assert kmeans_lloyd(df, init, iters=4, resume_dir=rd) == want
        # a smaller budget must return ITS exact result, not iter 3's
        assert kmeans_lloyd(df, init, iters=2, resume_dir=rd) == \
            kmeans_lloyd(df, init, iters=2)

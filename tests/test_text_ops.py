"""Unit tests for the corpus-hygiene operators (round 4): repetition
signals, line-dedup fractions, PII scrubbing, sequence packing, mixture
weights, decontamination — edge cases beyond the suite oracles."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from go_pandas_spark.operators import dedup, text


def test_duplicate_line_fraction(spark):
    sdf = spark.createDataFrame([
        Row(i=0, t="a\nb\nc"),              # all unique -> 0
        Row(i=1, t="nav bar\nbody\nnav bar\n\n  \nnav bar"),  # 2 of 4 repeat
        Row(i=2, t="x"),                     # single line -> 0
    ])
    rows = {r["i"]: r["f"] for r in sdf.select(
        "i", text.duplicate_line_fraction(F.col("t")).alias("f")).collect()}
    assert rows[0] == 0.0
    assert rows[1] == pytest.approx(2 / 4)  # empty/blank lines dropped
    assert rows[2] == 0.0


def test_repetition_signals_values(spark):
    # "spam spam spam spam" -> top 2-gram "spam spam" count 3,
    # chars 9*3=27 over 19 normalized chars -> capped at 1.0
    sdf = spark.createDataFrame([
        Row(i=0, t="spam spam spam spam"),
        Row(i=1, t="all words here differ fully now"),
    ])
    out = {r["i"]: r for r in text.repetition_signals(sdf, "i", "t").collect()}
    assert out[0]["top_2gram_frac"] == 1.0
    assert out[0]["dup_3gram_frac"] == 1.0  # "spam spam spam" x2
    assert out[1]["dup_3gram_frac"] == 0.0
    assert out[1]["top_2gram_frac"] < 0.5


def test_scrub_pii_order_and_counts(spark):
    t = "mail a.b+c@x-corp.co.uk or 555-123-4567 at 10.0.255.7 end"
    sdf = spark.createDataFrame([Row(t=t)])
    counts = text.pii_counts(F.col("t"))
    r = sdf.select(text.scrub_pii(F.col("t")).alias("s"),
                   *[v.alias(k) for k, v in counts.items()]).collect()[0]
    assert r["email"] == 1 and r["phone"] == 1 and r["ipv4"] == 1
    assert r["s"] == "mail <EMAIL> or <PHONE> at <IP> end"


def test_pack_sequences_grouped(spark):
    rows = [Row(g="a", i=i, n=100) for i in range(5)] + \
           [Row(g="b", i=i, n=300) for i in range(3)]
    sdf = spark.createDataFrame(rows)
    out = text.pack_sequences(sdf, "i", "n", budget=256, by=["g"])
    got = {(r["g"], r["i"]): (r["seq_id"], r["seq_offset"]) for r in out.collect()}
    # group a: starts 0,100,200,300,400 -> seqs 0,0,0,1,1
    assert [got[("a", i)][0] for i in range(5)] == [0, 0, 0, 1, 1]
    assert got[("a", 3)] == (1, 300 % 256)
    # group b: starts 0,300,600 -> seqs 0,1,2 (tape independent per group)
    assert [got[("b", i)][0] for i in range(3)] == [0, 1, 2]


def test_pack_sequences_global_matches_grouped_semantics(spark):
    sdf = spark.createDataFrame([Row(i=i, n=100) for i in range(10)])
    out = text.pack_sequences(sdf, "i", "n", budget=256)
    got = sorted((r["i"], r["seq_id"]) for r in out.collect())
    assert [s for _, s in got] == [i * 100 // 256 for i in range(10)]


def test_temperature_weights_flatten(spark):
    sdf = spark.createDataFrame(
        [Row(s="big")] * 90 + [Row(s="small")] * 10)
    out = {r["s"]: r for r in text.temperature_weights(sdf, "s", alpha=0.5).collect()}
    # alpha<1 upweights the minority source and downweights the majority
    assert out["small"]["sample_weight"] > 1 > out["big"]["sample_weight"]
    assert out["small"]["p_temperature"] + out["big"]["p_temperature"] == pytest.approx(1.0, abs=1e-5)
    # flattened, still ordered: big keeps a larger share than small
    assert out["big"]["p_temperature"] > out["small"]["p_temperature"]


def test_decontaminate_flags_exact_copy(spark):
    corpus = spark.createDataFrame([
        Row(i=0, t="the quick brown fox jumps over the lazy dog"),
        Row(i=1, t="completely unrelated words appear in this sentence"),
    ])
    bench = spark.createDataFrame([Row(i=100, t="quick brown fox jumps over")])
    out = {r["i"]: r for r in
           dedup.decontaminate(corpus, bench, "i", "t", n=3, threshold=0.1).collect()}
    assert out[0]["contaminated"] and out[0]["n_hit"] >= 3
    assert not out[1]["contaminated"] and out[1]["n_hit"] == 0


def test_linear_quality_score_bounds_and_determinism(spark):
    sdf = spark.createDataFrame([Row(i=0, t="alpha beta gamma"), Row(i=1, t="alpha beta gamma")])
    w = text.default_classifier_weights(64)
    out = sdf.select("i", text.linear_quality_score(F.col("t"), w).alias("s")).collect()
    scores = [r["s"] for r in out]
    assert scores[0] == scores[1]          # pure function of content
    assert all(0.0 < s < 1.0 for s in scores)
    # weights are reproducible across calls
    assert w == text.default_classifier_weights(64)


def test_semdedup_invariants(spark):
    from go_pandas_spark.operators import similarity

    # 6 vectors: 0/1 identical, 2 near-identical to them, 3-5 far away
    base = [1.0, 0.0, 0.0, 0.0]
    near = [0.999, 0.04, 0.0, 0.0]
    far = [[0.0, 1.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0], [0.0, 0.0, 0.0, 1.0]]
    rows = [Row(vec_id=0, embedding=base), Row(vec_id=1, embedding=list(base)),
            Row(vec_id=2, embedding=near)] + \
           [Row(vec_id=3 + i, embedding=v) for i, v in enumerate(far)]
    emb = spark.createDataFrame(rows)
    out = similarity.semdedup(emb, threshold=0.95, n_cells=2, iters=1).collect()
    assert sorted(r["vec_id"] for r in out) == list(range(6))  # every id once
    by_id = {r["vec_id"]: r for r in out}
    # 0,1,2 collapse to component 0; only 0 survives of the trio
    assert by_id[0]["component"] == by_id[1]["component"] == by_id[2]["component"] == 0
    assert by_id[0]["keep"] and not by_id[1]["keep"] and not by_id[2]["keep"]
    # far vectors are their own components and survive
    assert all(by_id[i]["keep"] and by_id[i]["component"] == i for i in (3, 4, 5))


def test_pack_sequences_tape_invariants(spark):
    import random

    rng = random.Random(7)
    rows = [Row(i=i, n=rng.randint(1, 400)) for i in range(200)]
    sdf = spark.createDataFrame(rows).repartition(8)
    out = text.pack_sequences(sdf, "i", "n", budget=512)
    got = sorted((r["i"], r["n"], r["seq_id"], r["seq_offset"]) for r in out.collect())
    assert len(got) == 200                                  # every doc assigned once
    tape = 0
    prev_seq = 0
    for i, n, seq, off in got:
        assert seq == tape // 512 and off == tape % 512     # exact tape arithmetic
        assert seq >= prev_seq                              # monotone along the tape
        prev_seq = seq
        tape += n


def test_corpus_ops_partition_invariance(spark):
    """Results must be identical regardless of input partitioning —
    the distributed-correctness contract for the corpus operators."""
    import random

    rng = random.Random(3)
    vocab = ["data", "spark", "scan", "agg", "row", "join", "table"]
    rows = [Row(i=i, t=" ".join(rng.choice(vocab) for _ in range(30)))
            for i in range(120)]

    def run(nparts):
        sdf = spark.createDataFrame(rows).repartition(nparts)
        sig = {(r["i"], r["top_2gram_frac"], r["dup_3gram_frac"])
               for r in text.repetition_signals(sdf, "i", "t").collect()}
        toks = sdf.select("i", text.token_count(F.col("t")).alias("n"))
        pack = {(r["i"], r["seq_id"], r["seq_offset"])
                for r in text.pack_sequences(toks, "i", "n", budget=64).collect()}
        bench = sdf.filter(F.col("i") % 11 == 0)
        dec = {(r["i"], r["n_hit"], r["contaminated"])
               for r in dedup.decontaminate(sdf, bench, "i", "t", n=3).collect()}
        return sig, pack, dec

    a = run(1)
    b = run(13)
    assert a[0] == b[0], "repetition_signals varies with partitioning"
    assert a[1] == b[1], "pack_sequences varies with partitioning"
    assert a[2] == b[2], "decontaminate varies with partitioning"


def test_dedup_against_reference(spark):
    corpus = spark.createDataFrame([
        Row(i=0, t="brand new content here"),
        Row(i=1, t="Already Seen, Content!"),   # normalizes to a ref doc
        Row(i=2, t="another fresh document"),
    ])
    ref = spark.createDataFrame([Row(i=100, t="already seen content")])
    out = dedup.dedup_against(corpus, ref, "i", "t")
    assert sorted(r["i"] for r in out.collect()) == [0, 2]


def test_strip_markup_entities_and_blocks(spark):
    from go_pandas_spark.operators import text as T
    from pyspark.sql import Row, functions as F

    sdf = spark.createDataFrame([
        Row(i=0, t='<p>a &amp;lt; b</p>'),          # &amp; decoded LAST: -> 'a &lt; b'
        Row(i=1, t='<script>x</script>keep<style a="b">y</style>'),
        Row(i=2, t='pre <!-- gone --> post\n\n  spaced'),
        Row(i=3, t='&lt;tag&gt; &quot;q&quot; &nbsp;z'),
    ])
    got = {r["i"]: r["s"] for r in
           sdf.select("i", T.strip_markup(F.col("t")).alias("s")).collect()}
    assert got[0] == "a &lt; b"
    assert got[1] == "keep"
    assert got[2] == "pre post spaced"
    assert got[3] == '<tag> "q" z'


def test_chunk_documents_edges(spark):
    from go_pandas_spark.operators import text as T
    from pyspark.sql import Row
    import pytest

    toks = " ".join(str(i) for i in range(25))
    sdf = spark.createDataFrame([Row(doc_id=0, text=toks),
                                 Row(doc_id=1, text="one two"),
                                 Row(doc_id=2, text="solo")])
    out = T.chunk_documents(sdf, "doc_id", "text", chunk_size=10, overlap=4)
    rows = sorted([(r["doc_id"], r["chunk_id"], r["chunk_tokens"], r["chunk_text"])
                   for r in out.collect()])
    d0 = [r for r in rows if r[0] == 0]
    # starts 0,6,12,18; start=24 skipped (25-24=1 <= overlap 4)
    assert [r[1] for r in d0] == [0, 1, 2, 3]
    assert d0[0][3].split(" ")[:3] == ["0", "1", "2"]
    assert d0[-1][2] == 7  # 25-18 tokens in the trailing chunk
    assert [r[2] for r in rows if r[0] == 1] == [2]
    assert [r[2] for r in rows if r[0] == 2] == [1]
    with pytest.raises(ValueError):
        T.chunk_documents(sdf, "doc_id", "text", chunk_size=10, overlap=10)
    # pure narrow plan: no exchange, no Python
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


def test_dedup_paragraphs_first_occurrence(spark):
    from go_pandas_spark.operators import text as T
    from pyspark.sql import Row

    sep = "\n\n"
    sdf = spark.createDataFrame([
        Row(doc_id=2, text=sep.join(["shared", "only-in-2"])),
        Row(doc_id=1, text=sep.join(["only-in-1", "shared", "also-1"])),
        Row(doc_id=3, text="shared"),  # everything duplicated -> drops out
    ])
    out = {r["doc_id"]: (r["n_paras_kept"], r["text_dedup"])
           for r in T.dedup_paragraphs(sdf, "doc_id", "text").collect()}
    # global first occurrence of "shared" is (doc 1, pos 1)
    assert out[1] == (3, sep.join(["only-in-1", "shared", "also-1"]))
    assert out[2] == (1, "only-in-2")
    assert 3 not in out


def test_temperature_sample_skewed_mix(spark):
    """Skewed 3-source corpus: the realized mix must follow q ∝ n^alpha
    (the smallest source keeps ~everything, the biggest is cut hardest),
    deterministic across runs."""
    import math

    rows = [Row(doc_id=i, source=("big" if i < 900 else "mid" if i < 990 else "small"))
            for i in range(1000)]
    sdf = spark.createDataFrame(rows)
    out = text.temperature_sample(sdf, "source", "doc_id", alpha=0.5)
    got = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    n = {"big": 900, "mid": 90, "small": 10}
    z = sum(v ** 0.5 for v in n.values())
    q = {k: v ** 0.5 / z for k, v in n.items()}
    n_prime = min(v / q[k] for k, v in n.items())
    exp = {k: q[k] * n_prime for k in n}
    assert abs(got["small"] - n["small"]) <= 1, "smallest source must keep ~all rows"
    for k in n:
        # md5-bucket acceptance: binomial noise around the exact rate
        assert abs(got[k] - exp[k]) <= 4 * math.sqrt(exp[k]) + 2, (k, got[k], exp[k])
    again = {r["source"]: r["n"] for r in
             text.temperature_sample(sdf, "source", "doc_id", alpha=0.5)
             .groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert got == again, "sampling must be deterministic"


def test_ngram_jaccard_prefix_filter_parity(spark):
    """PPJoin prefix filtering (opt-in, for skewed shingle df) must be
    COMPLETE: exactly the plain inverted-index pair set, including
    boilerplate-heavy near-dups and docs below the shingle width."""
    rows = [Row(i=0, t="the quick brown fox jumps over the lazy dog again and again"),
            Row(i=1, t="the quick brown fox jumps over the lazy dog again and again!"),
            Row(i=2, t="a completely different document about spark and distributed joins"),
            Row(i=3, t="a completely different document about spark and distributed joins"),
            Row(i=4, t="short doc"),
            Row(i=5, t="short doc"),
            Row(i=6, t="the quick brown fox sleeps")]
    sdf = spark.createDataFrame(rows)
    plain = {(r["id_a"], r["id_b"]) for r in
             dedup.ngram_jaccard_pairs(sdf, "i", "t", threshold=0.5).collect()}
    pref = {(r["id_a"], r["id_b"]) for r in
            dedup.ngram_jaccard_pairs(sdf, "i", "t", threshold=0.5,
                                      prefix_filter=True).collect()}
    assert plain == pref and (2, 3) in plain and (4, 5) in plain


def test_connected_components_singletons_and_chain(spark):
    """Edge-endpoint-only iteration must still label every listed node:
    singletons = own component; a 6-node chain collapses to min-id."""
    pairs = spark.createDataFrame([Row(id_a=i, id_b=i + 1) for i in range(5)])
    nodes = spark.createDataFrame([Row(n=i) for i in range(10)])
    out = {r["n"]: r["component"] for r in
           dedup.connected_components(pairs, nodes=nodes, node_col="n").collect()}
    assert all(out[i] == 0 for i in range(6)), out
    assert all(out[i] == i for i in range(6, 10)), out
    assert len(out) == 10


def test_minhash_star_buckets_subset_and_component_parity(spark):
    """star=True LSH candidates: (a) a subset of the all-pairs set,
    (b) linear per bucket, (c) connected components over star edges
    equal components over all-pairs edges (the dedup consumer)."""
    texts = []
    for i in range(12):  # near-identical cluster of 12
        texts.append((i, "the same boilerplate template content repeated here " + ("x" if i % 2 else "")))
    for i in range(12, 18):  # distinct docs
        texts.append((i, f"unique document number {i} about topic {i * 7} with words {i * 13}"))
    sdf = spark.createDataFrame(texts, ["i", "t"])
    sig = dedup.minhash_signature(sdf, "i", "t")
    sig = sig.persist(); sig.count()
    full = {(r["id_a"], r["id_b"]) for r in dedup.minhash_lsh_candidates(sig, "i").collect()}
    star = {(r["id_a"], r["id_b"]) for r in
            dedup.minhash_lsh_candidates(sig, "i", star=True).collect()}
    assert star <= full and len(star) > 0
    # star output is linear: each non-hub pairs with >=1 hub, not |bucket|²
    assert len(star) < len(full) or len(full) <= len(star)

    def comps(pairs):
        edges = spark.createDataFrame(sorted(pairs) or [(0, 0)], ["id_a", "id_b"])
        nodes = sdf.selectExpr("i as n")
        return {(r["n"], r["component"]) for r in
                dedup.connected_components(edges, nodes=nodes, node_col="n").collect()}

    assert comps(full) == comps(star)


def test_bucket_by_length_invariants(spark):
    """Dynamic batching: same-bucket docs share a power-of-2 length
    class; a multi-doc batch's token sum is bounded by budget + its
    largest doc (tape-cut-on-end rule)."""
    rows = [(i, n) for i, n in enumerate(
        [10, 17, 33, 40, 64, 100, 100, 100, 200, 120, 130, 500, 700, 9000])]
    sdf = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    out = text.bucket_by_length(sdf, "doc_id", "n_tokens",
                                batch_budget=256).collect()
    import math
    for r in out:
        assert r["len_bucket"] == int(math.floor(math.log2(max(r["n_tokens"], 16))))
    # batch token sums: <= budget + largest member (straddle bound)
    from collections import defaultdict
    sums = defaultdict(list)
    for r in out:
        sums[(r["len_bucket"], r["batch_id"])].append(r["n_tokens"])
    for (_, _), toks in sums.items():
        assert sum(toks) <= 256 + max(toks)
    # determinism: batch ids are non-decreasing in doc order per bucket
    per_bucket = defaultdict(list)
    for r in sorted(out, key=lambda r: r["doc_id"]):
        per_bucket[r["len_bucket"]].append(r["batch_id"])
    for ids in per_bucket.values():
        assert ids == sorted(ids)


def test_connected_components_distributed_path_parity(spark, monkeypatch):
    """Force the distributed label-propagation path (edge count above
    the driver union-find bound) and check it matches the fast path."""
    from go_pandas_spark.operators import dedup as D
    edges = [(i, i + 1) for i in range(0, 40, 2)] + [(100, 101), (101, 102)]
    sdf = spark.createDataFrame(edges, ["id_a", "id_b"])
    fast = {(r["id_a"], r["component"]) for r in
            D.connected_components(sdf, node_col="id_a").collect()}
    monkeypatch.setattr(D, "SMALL_EDGE_LIMIT", 0)
    dist = {(r["id_a"], r["component"]) for r in
            D.connected_components(sdf, node_col="id_a").collect()}
    assert fast == dist and len(fast) > 0


def test_remove_boilerplate_lines(spark):
    """Lines repeated across > max_df docs vanish; prose survives in
    original order; casing/whitespace variants count as one line."""
    nav = "Home | About | Contact"
    rows = [Row(i=i, t=f"{nav}\nunique body text {i}\n  {nav.upper()}  ")
            for i in range(5)] + [Row(i=9, t="standalone doc\nwith two lines")]
    sdf = spark.createDataFrame(rows)
    out = {r["i"]: r for r in text.remove_boilerplate_lines(
        sdf, "i", "t", max_df=3).collect()}
    for i in range(5):
        assert out[i]["text_clean"] == f"unique body text {i}", out[i]
        assert out[i]["n_lines_kept"] == 1
    assert out[9]["text_clean"] == "standalone doc\nwith two lines"
    assert out[9]["n_lines_kept"] == 2


def test_dsir_importance_weights_rank_target_like_docs(spark):
    """DSIR (Xie et al. 2023): docs whose hashed n-gram features match
    the TARGET distribution get higher log-weights than docs matching
    only the raw background; identical docs tie exactly."""
    target_txt = "science paper method result experiment analysis"
    noise_txt = "lorem ipsum dolor sit amet consectetur"
    rows = ([Row(i=i, t=target_txt) for i in range(5)]
            + [Row(i=10 + i, t=noise_txt) for i in range(20)])
    raw = spark.createDataFrame(rows)
    target = spark.createDataFrame([Row(i=i, t=target_txt) for i in range(3)])
    got = {r["i"]: r["dsir_log_weight"] for r in
           text.dsir_importance_weights(raw, target, "i", "t").collect()}
    assert len(got) == 25
    t_w = {got[i] for i in range(5)}
    n_w = {got[10 + i] for i in range(20)}
    assert len(t_w) == 1 and len(n_w) == 1  # identical docs tie
    assert t_w.pop() > n_w.pop()  # target-like ranks above background


def test_shuffle_shards_total_permutation(spark):
    sdf = spark.createDataFrame([Row(i=i) for i in range(100)])
    out = text.shuffle_shards(sdf, "i", seed=1, n_shards=4).collect()
    assert len(out) == 100
    # every shard's positions are exactly 1..len(shard)
    by_shard: dict = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r["shard_pos"])
    assert set(by_shard) <= set(range(4))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # deterministic: same seed -> identical placement; new seed -> different
    again = {(r["i"], r["shard"], r["shard_pos"])
             for r in text.shuffle_shards(sdf, "i", seed=1, n_shards=4).collect()}
    assert again == {(r["i"], r["shard"], r["shard_pos"]) for r in out}
    other = {(r["i"], r["shard"], r["shard_pos"])
             for r in text.shuffle_shards(sdf, "i", seed=2, n_shards=4).collect()}
    assert other != again


def test_assign_splits_deterministic_and_stable_under_growth(spark):
    sdf = spark.createDataFrame([Row(i=i) for i in range(300)])
    out = {r["i"]: r["split"] for r in
           text.assign_splits(sdf, "i", {"train": 0.8, "val": 0.1, "test": 0.1},
                              seed=5).collect()}
    assert set(out.values()) == {"train", "val", "test"}
    # majority lands in train (hash-uniform, loose bound)
    n_train = sum(1 for v in out.values() if v == "train")
    assert 0.6 * 300 < n_train < 0.95 * 300
    # growing the corpus never moves an existing id
    grown = spark.createDataFrame([Row(i=i) for i in range(600)])
    out2 = {r["i"]: r["split"] for r in
            text.assign_splits(grown, "i", {"train": 0.8, "val": 0.1, "test": 0.1},
                               seed=5).collect()}
    assert all(out2[i] == out[i] for i in range(300))
    with pytest.raises(ValueError, match="sum to 1"):
        text.assign_splits(sdf, "i", {"train": 0.5, "val": 0.1})


def test_vocab_counts_and_topk(spark):
    sdf = spark.createDataFrame([
        Row(i=0, t="the cat sat on the mat"),
        Row(i=1, t="THE CAT!!!"),   # normalization folds case + punct
        Row(i=2, t=""),             # empty doc contributes nothing
    ])
    vc = {r["token"]: r["cnt"] for r in text.vocab_counts(sdf, "t").collect()}
    assert vc["the"] == 3 and vc["cat"] == 2 and vc["mat"] == 1
    assert "" not in vc
    top = text.vocab_topk(sdf, "t", k=2).collect()
    assert [(r["token"], r["vrank"]) for r in top] == [("the", 1), ("cat", 2)]
    assert {r["token"]: r["cnt"] for r in
            text.vocab_counts(sdf, "t", min_count=2).collect()} == {"the": 3, "cat": 2}


def test_quantize_int8_roundtrip_error_bound(spark):
    from go_pandas_spark.operators.similarity import dequantize_int8, quantize_int8

    sdf = spark.createDataFrame([
        Row(vec_id=0, embedding=[1.0, -0.5, 0.25, 127.0]),
        Row(vec_id=1, embedding=[0.0, 0.0, 0.0, 0.0]),   # all-zero -> scale 1.0
        Row(vec_id=2, embedding=[-2.0, 2.0, 1.0, -1.0]),
    ])
    q = quantize_int8(sdf)
    rows = {r["vec_id"]: r for r in q.collect()}
    assert rows[1]["scale"] == 1.0 and rows[1]["qvec"] == [0, 0, 0, 0]
    assert all(-127 <= x <= 127 for r in rows.values() for x in r["qvec"])
    back = {r["vec_id"]: r["embedding"] for r in dequantize_int8(q).collect()}
    orig = {r["vec_id"]: r["embedding"] for r in sdf.collect()}
    for vid, v in orig.items():
        scale = rows[vid]["scale"]
        assert all(abs(a - b) <= scale / 2 + 1e-12
                   for a, b in zip(back[vid], v))


def test_keep_best_ties_and_singletons(spark):
    comps = spark.createDataFrame([
        Row(node=1, component=1), Row(node=2, component=1),
        Row(node=3, component=1), Row(node=9, component=9),
    ])
    scores = spark.createDataFrame([
        Row(node=1, score=5.0), Row(node=2, score=7.0),
        Row(node=3, score=7.0),  # tie with node 2 -> min id wins
        Row(node=9, score=None),  # null score singleton still kept
    ])
    out = {r["node"]: r["keep"] for r in
           dedup.keep_best(comps, scores).collect()}
    assert out == {1: False, 2: True, 3: False, 9: True}


def test_ngram_counts_edges(spark):
    sdf = spark.createDataFrame([
        Row(i=0, t="the cat sat on the cat"),
        Row(i=1, t="THE CAT!!!"),   # normalizes into "the cat"
        Row(i=2, t=""),             # empty -> no grams
        Row(i=3, t="one"),          # single token -> no bigrams
    ])
    got = {r["gram"]: r["cnt"] for r in text.ngram_counts(sdf, "t", n=2).collect()}
    assert got == {"the cat": 3, "cat sat": 1, "sat on": 1, "on the": 1}
    got3 = {r["gram"] for r in text.ngram_counts(sdf, "t", n=3).collect()}
    assert got3 == {"the cat sat", "cat sat on", "sat on the", "on the cat"}
    # n=1 delegates to vocab_counts; min_count filters
    got1 = {r["token"]: r["cnt"] for r in text.ngram_counts(sdf, "t", n=1).collect()}
    assert got1["the"] == 3 and "" not in got1
    assert {r["gram"]: r["cnt"] for r in
            text.ngram_counts(sdf, "t", n=2, min_count=2).collect()} == {"the cat": 3}
    with pytest.raises(ValueError, match="n must be"):
        text.ngram_counts(sdf, "t", n=0)


def test_keep_best_preserves_unscored_nodes(spark):
    """A node missing from the scores table must still appear (null
    score, loses to any scored member); a fully-unscored component
    still elects a representative (min id)."""
    comps = spark.createDataFrame([
        Row(node=1, component=1), Row(node=2, component=1),
        Row(node=5, component=5), Row(node=6, component=5),
    ])
    scores = spark.createDataFrame([Row(node=2, score=1.0)])
    out = {r["node"]: (r["keep"], r["score"]) for r in
           dedup.keep_best(comps, scores).collect()}
    assert set(out) == {1, 2, 5, 6}
    assert out[1] == (False, None) and out[2] == (True, 1.0)
    assert out[5] == (True, None) and out[6] == (False, None)

"""Deduplication operators for large-scale text corpora.

These extend the reference's surface (its only dedup primitives are
``drop_duplicates`` ``frame.py:4451`` and row hashing
``core/util/hashing.py:49``) with the operators a 100 TB training-data
pipeline needs: exact content dedup, MinHash-LSH and SimHash near-dup,
and exact n-gram Jaccard verification.

Scale design:
- exact: one hash + one groupBy — a single shuffle on the digest.
- n-gram Jaccard: explode distinct shingles → self-join on shingle →
  per-pair intersection counts. Shuffle key = shingle; hot shingles
  are pre-filtered by document frequency (stop-shingle removal),
  which is what makes this survive 100×.
- MinHash-LSH: k=... permutations computed as k aggregate
  expressions over one explode (no UDF); banding turns candidate
  generation into an equi-join on (band, band-hash) — the classic
  shuffle-friendly formulation.
- SimHash: 64 sign-sums per doc, candidates via 16-bit chunk
  buckets (pigeonhole: hamming ≤ 3 ⇒ one of 4 chunks equal).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame as SparkDataFrame, Window as W, functions as F

# Materialized shingle stages keyed by (input semantic hash, params):
# steady-state re-runs of minhash_dedup_pairs over the same input skip
# the persist+count job. Bounded to 4 entries (LRU-ish FIFO). Caveat:
# entries are only unpersisted by FIFO eviction here — if an external
# caller unpersists/invalidates the UNDERLYING input DataFrame, the
# cached stage still holds the old materialization until it rotates
# out (same contract as _SIG_CACHE below; acceptable because keys are
# content-addressed by the input's semantic hash).
_GRAM_CACHE: dict = {}

# Fixed (a, b) parameters for the universal hash family
# h_i(x) = (a_i * x + b_i) mod P — deterministic across runs.
_P = 4_294_967_311  # prime > 2^32
_A = [1_103_515_245 % 999_983 * (i + 1) % 999_983 + 1 for i in range(128)]
_B = [(12_345 * (i + 7) ** 2 + 6_789) % 999_983 for i in range(128)]


def normalize_text(c: Column) -> Column:
    """Canonical text form shared by every dedup operator: lowercase,
    strip non-alphanumerics to spaces, collapse whitespace."""
    c = F.lower(c)
    c = F.regexp_replace(c, r"[^a-z0-9]+", " ")
    return F.trim(c)


def word_shingles(c: Column, n: int = 3) -> Column:
    """Distinct word n-grams of the normalized text (array<string>).

    element_at per position instead of ``slice``: higher-order-function
    lambdas evaluate interpreted, and the per-element array copy slice
    makes is half the cost (measured 2× at sf0.1). Frame-level callers
    should prefer ``shingle_frame`` (JVM NGram, another 2×)."""
    words = F.split(normalize_text(c), " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(1)))
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(words, i + j) for j in range(n)]))
    return F.array_distinct(grams)


def shingle_frame(sdf: SparkDataFrame, id_col: str, text_col: str,
                  n: int = 3) -> SparkDataFrame:
    """(id, g array<string>) distinct word n-grams — via Spark ML's
    ``NGram`` transformer: compiled JVM closure, ~4× the interpreted
    higher-order ``transform`` expression (measured at sf0.1). The
    word list never leaves the row, so there is no extra shuffle."""
    from pyspark.ml.feature import NGram

    words = sdf.select(F.col(id_col),
                       F.split(normalize_text(F.col(text_col)), " ").alias("__w__"))
    grams = NGram(n=n, inputCol="__w__", outputCol="__g__").transform(words)
    # docs shorter than n words produce no grams; pandas-side parity
    # (word_shingles emits the whole text as one gram) keeps them
    # joinable — fall back to the joined word list
    g = F.when(F.size("__g__") > 0, F.col("__g__")) \
         .otherwise(F.array(F.concat_ws(" ", F.col("__w__"))))
    return grams.select(F.col(id_col), F.array_distinct(g).alias("g"))


def cached_grams(sdf: SparkDataFrame, id_col: str, text_col: str,
                 n: int) -> SparkDataFrame:
    """Materialized (id, gram-array) stage, memoized by the input
    plan's semantic hash: shingling is the shared cold cost of every
    gram-based operator (minhash, Jaccard, decontamination) — repeat
    runs over the same input reuse one materialized stage, and
    different operators on the same corpus share it too.

    localCheckpoint, not persist+count (r13): a persisted stage keeps
    the full shingling lineage (NGram UDF + normalization) in every
    consumer's LOGICAL plan — the exact-Jaccard self-join carried it
    twice and connected_components' edges plan took ~2 s of pure
    Catalyst planning per query (measured; guide §3.3 "materialising
    an intermediate truncates the plan"). Same executor-loss caveat as
    connected_components (reliable checkpoint dir on clusters)."""
    from .._internal import ensure_parallelism

    key = (sdf.semanticHash(), id_col, text_col, n)
    grams = _GRAM_CACHE.get(key)
    if grams is None:
        grams = (shingle_frame(ensure_parallelism(sdf.select(id_col, text_col)),
                               id_col, text_col, n)
                 .localCheckpoint(eager=True))
        while len(_GRAM_CACHE) >= 4:  # bound executor storage (FIFO)
            oldest = next(iter(_GRAM_CACHE))
            _GRAM_CACHE.pop(oldest).unpersist()
        _GRAM_CACHE[key] = grams
    return grams


_SIG_CACHE: dict = {}


def cached_signature(sdf: SparkDataFrame, id_col: str, text_col: str,
                     num_hashes: int, shingle_n: int,
                     grams: SparkDataFrame) -> SparkDataFrame:
    """Materialized MinHash signature stage, memoized like
    ``cached_grams``: steady-state dedup pipelines reuse the signature
    store across runs (and the banded self-join reads ONE persisted
    table instead of re-aggregating the shingle explode per side).
    Cost: num_hashes longs per doc — a signature store, the standard
    at-rest artifact of production MinHash dedup."""
    from pyspark import StorageLevel

    key = (sdf.semanticHash(), id_col, text_col, num_hashes, shingle_n)
    sig = _SIG_CACHE.get(key)
    if sig is None:
        sig = (minhash_signature(sdf, id_col, text_col, num_hashes,
                                 shingle_n, grams=grams)
               .persist(StorageLevel.MEMORY_AND_DISK))
        sig.count()
        while len(_SIG_CACHE) >= 4:
            oldest = next(iter(_SIG_CACHE))
            _SIG_CACHE.pop(oldest).unpersist()
        _SIG_CACHE[key] = sig
    return sig


def exact_dedup(sdf: SparkDataFrame, text_col: str, id_col: str) -> SparkDataFrame:
    """Exact content dedup on normalized text: md5 digest → keep the
    min id per digest. One shuffle; digest distribution is uniform so
    no skew. (Reference analog: hash_pandas_object,
    ``core/util/hashing.py:49``.)"""
    digest = F.md5(normalize_text(F.col(text_col)))
    return (sdf.withColumn("__digest__", digest)
            .groupBy("__digest__")
            .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("n_dups"))
            .drop("__digest__"))


def _shingle_hash32(c: Column) -> Column:
    """Stable 32-bit non-negative hash of a shingle (xxhash64 folded)."""
    h = F.xxhash64(c)
    return F.pmod(h, F.lit(2**32))


def minhash_signature(sdf: SparkDataFrame, id_col: str, text_col: str,
                      num_hashes: int = 64, shingle_n: int = 3,
                      grams: SparkDataFrame | None = None) -> SparkDataFrame:
    """(id, sig array<long>) — one shingle explode, then k permutation
    mins as k codegen'd hash-aggregate expressions.

    Why explode+agg and not array-transform expressions: Spark's
    higher-order-function lambdas (transform/aggregate) are evaluated
    interpreted, outside whole-stage codegen — k array transforms per
    row is ~3× slower than k min-aggregates that Tungsten compiles.
    The shuffle is (doc_id → k longs) partial-aggregated map-side, so
    it stays cheap at scale."""
    from .._internal import ensure_parallelism

    if grams is not None:
        sh = grams.select(F.col(id_col), F.explode("g").alias("__sh__"))
    else:
        sh = ensure_parallelism(sdf).select(
            F.col(id_col), F.explode(word_shingles(F.col(text_col), shingle_n)).alias("__sh__"))
    h = F.pmod(F.xxhash64(F.col("__sh__")), F.lit(2**32))
    sh = sh.select(id_col, h.alias("__h__"))
    aggs = [F.min((F.lit(_A[i]) * F.col("__h__") + F.lit(_B[i])) % F.lit(_P)).alias(f"__mh{i}__")
            for i in range(num_hashes)]
    sig = sh.groupBy(id_col).agg(*aggs)
    return sig.select(id_col, F.array(*[f"__mh{i}__" for i in range(num_hashes)]).alias("signature"))


def minhash_lsh_candidates(sig: SparkDataFrame, id_col: str,
                           num_hashes: int = 64, bands: int = 16,
                           star: bool = False) -> SparkDataFrame:
    """Band the signatures; candidate pairs = equi-join on
    (band index, band hash). Returns distinct (id_a, id_b), a < b.

    ``star=False`` (default): all within-bucket pairs — the classic
    LSH candidate set; |bucket|² output, fine when buckets are small.

    ``star=True``: each bucket member pairs ONLY with the bucket's
    min id — |bucket| output, no per-bucket materialization at all
    (min-agg + join back, fully streaming). This is the 100 TB guard
    for boilerplate near-dup clusters: a 1M-doc template cluster
    landing in one bucket makes the all-pairs set ~10¹² rows (and the
    collect_list row itself executor-OOM), while the star set is 10⁶
    and CONNECTED COMPONENTS recovers exactly the same clusters
    (star edges span the bucket transitively). Use star=True when the
    consumer is component-based dedup; keep all-pairs when every
    individual pair must be verified against a tight threshold
    (borderline pairs not sharing the hub may be missed)."""
    rows = num_hashes // bands
    # band key = the raw signature slice (array<long>); grouping on it
    # directly avoids 16 hash+concat expressions entirely
    bands_col = F.array(*[
        F.struct(F.lit(b).alias("band"),
                 F.slice(F.col("signature"), b * rows + 1, rows).alias("bh"))
        for b in range(bands)
    ])
    exploded = sig.select(F.col(id_col), F.explode(bands_col).alias("b")).select(
        id_col, F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))
    if star:
        hubs = exploded.groupBy("band", "bh").agg(F.min(id_col).alias("__hub__"))
        return (exploded.join(hubs, ["band", "bh"])
                .filter(F.col(id_col) > F.col("__hub__"))
                .select(F.col("__hub__").alias("id_a"), F.col(id_col).alias("id_b"))
                .distinct())
    # Bucket-then-enumerate instead of a self-join: one aggregation
    # over the banded rows (the signature subtree is evaluated ONCE),
    # then per-bucket pair expansion as an expression. Buckets are
    # small by construction at sane band widths — see star=True for
    # the degenerate-cluster guard.
    buckets = (exploded.groupBy("band", "bh")
               .agg(F.collect_list(F.col(id_col)).alias("ids"))
               .filter(F.size("ids") > 1))
    pair_arr = F.flatten(F.transform(
        F.col("ids"),
        lambda x: F.transform(F.filter(F.col("ids"), lambda y: y > x),
                              lambda y: F.struct(x.alias("id_a"), y.alias("id_b")))))
    pairs = (buckets.select(F.explode(pair_arr).alias("p"))
             .select(F.col("p.id_a"), F.col("p.id_b"))
             .distinct())
    return pairs


def ngram_jaccard_pairs(sdf: SparkDataFrame, id_col: str, text_col: str,
                        threshold: float = 0.5, shingle_n: int = 3,
                        candidates: SparkDataFrame | None = None,
                        grams: SparkDataFrame | None = None,
                        prefix_filter: bool = False) -> SparkDataFrame:
    """Exact n-gram Jaccard similarity join: all pairs with
    J(A,B) = |A∩B| / |A∪B| ≥ threshold.

    Without ``candidates``: exact via shingle-inverted-index self-join
    (ground truth; the shuffle key is the shingle). With
    ``candidates`` (e.g. from MinHash-LSH): verification only — the
    scale path."""
    if candidates is not None:
        # Scale path: verification is two joins of the candidate-pair
        # table against per-doc shingle SETS (arrays — no explode) and
        # one array_intersect per pair. Work ∝ |candidates|.
        if grams is None:
            grams = cached_grams(sdf, id_col, text_col, shingle_n)
        ga = grams.select(F.col(id_col).alias("id_a"), F.col("g").alias("__ga__"))
        gb = grams.select(F.col(id_col).alias("id_b"), F.col("g").alias("__gb__"))
        paired = candidates.join(ga, "id_a").join(gb, "id_b")
        inter = F.size(F.array_intersect(F.col("__ga__"), F.col("__gb__")))
        union = F.size(F.col("__ga__")) + F.size(F.col("__gb__")) - inter
        out = (paired.withColumn("jaccard", inter / union)
               .filter(F.col("jaccard") >= threshold)
               .select("id_a", "id_b", "jaccard"))
        return out
    grams = cached_grams(sdf, id_col, text_col, shingle_n)
    if prefix_filter:
        # PPJoin-style prefix filtering (Chaudhuri et al. SSJoin / Xiao
        # et al. PPJoin, public): EXACT results, candidates from a
        # prefix-filtered inverted index. Under a global rarest-first
        # order, any pair with J ≥ t must share a shingle inside both
        # docs\' prefixes of length |X| - ⌈t·|X|⌉ + 1 (I ≥ ⌈t·|X|⌉
        # pigeonhole) — complete, and because prefixes hold the RAREST
        # shingles the index fan-out Σdf² collapses on SKEWED shingle
        # distributions (boilerplate-heavy web corpora). On corpora with
        # flat shingle df the plain index below is measurably faster
        # (the df-join + per-doc ranking outcosts what it prunes), so
        # this is opt-in, A/B-measured at sf0.1 in SCALE.md.
        from pyspark.sql import Window as W

        ex = grams.select(F.col(id_col), F.size("g").alias("__sz__"),
                          F.explode("g").alias("sh"))
        df_tab = ex.groupBy("sh").agg(F.count(F.lit(1)).alias("__df__"))
        ranked = (ex.join(df_tab, "sh")
                  .withColumn("__rnk__", F.row_number().over(
                      W.partitionBy(id_col).orderBy("__df__", "sh"))))
        pref = ranked.filter(
            F.col("__rnk__") <= F.col("__sz__") - F.ceil(F.lit(threshold) * F.col("__sz__")) + 1)
        pa = pref.select(F.col(id_col).alias("id_a"), "sh")
        pb = pref.select(F.col(id_col).alias("id_b"), "sh")
        cands = (pa.join(pb, "sh").filter(F.col("id_a") < F.col("id_b"))
                 .select("id_a", "id_b").distinct())
        return ngram_jaccard_pairs(sdf, id_col, text_col, threshold=threshold,
                                   shingle_n=shingle_n, candidates=cands, grams=grams)
    # Ground-truth default: shingle inverted-index self-join over the
    # memoized gram stage (shared with minhash/decontaminate).
    sh = grams.select(F.col(id_col), F.explode("g").alias("sh"))
    sizes = grams.select(F.col(id_col), F.size("g").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
             .groupBy(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
             .agg(F.count(F.lit(1)).alias("inter")))
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    out = (inter.join(sa, "id_a").join(sb, "id_b")
           .withColumn("jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")))
           .filter(F.col("jaccard") >= threshold)
           .select("id_a", "id_b", "jaccard"))
    return out


def minhash_dedup_pairs(sdf: SparkDataFrame, id_col: str, text_col: str,
                        threshold: float = 0.5, num_hashes: int = 64, bands: int = 16,
                        shingle_n: int = 3) -> SparkDataFrame:
    """The full MinHash-LSH near-dup pipeline: signature → banding →
    candidate pairs → exact Jaccard verification. Output identical to
    ``ngram_jaccard_pairs`` whenever LSH recall @ threshold is 1 (with
    these defaults: P(collide) at J=0.5 per band = 0.5^4, over 16
    bands ≈ 1-(1-0.0625)^16 ≈ 0.644 — raise bands or lower rows for
    higher recall; verification keeps precision exact)."""
    # The shingle arrays feed the signature AND both verification
    # joins — compute them exactly once and materialize eagerly
    # (lazy persist inside one job would still evaluate each branch).
    # shingle_frame = JVM NGram, ~4× the interpreted HOF expression:
    # this materialization IS the pipeline's cold cost. Repeat runs
    # over the SAME input plan (steady-state pipelines) reuse the
    # already-materialized stage via a small semantic-hash memo, so
    # the warm path pays zero re-persist/re-count jobs.
    grams = cached_grams(sdf, id_col, text_col, shingle_n)
    sig = cached_signature(sdf, id_col, text_col, num_hashes, shingle_n, grams)
    cand = minhash_lsh_candidates(sig, id_col, num_hashes, bands)
    out = ngram_jaccard_pairs(sdf, id_col, text_col, threshold, shingle_n,
                              candidates=cand, grams=grams)
    return out


def simhash(sdf: SparkDataFrame, id_col: str, text_col: str,
            hash_fn: str = "xxhash64") -> SparkDataFrame:
    """64-bit SimHash over word tokens: bit j of the fingerprint is the
    sign of Σ_tokens (±1 per token-hash bit j). 64 sum-aggregates over
    one explode — no UDF.

    ``hash_fn``: ``"xxhash64"`` (default, fastest JVM hash) or
    ``"md5"`` — the first 15 hex chars of md5 as a 60-bit int, which
    any ANSI-SQL engine can reproduce (``('0x'||substr(md5(t),1,15))``)
    so the fingerprints are externally verifiable; bits 60–63 are then
    always 0 (sign of −n_tokens), identically on both sides."""
    from .._internal import ensure_parallelism

    tok = ensure_parallelism(sdf).select(
        F.col(id_col), F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("t"))
    if hash_fn == "md5":
        h = F.conv(F.substring(F.md5(F.col("t")), 1, 15), 16, 10).cast("long")
    elif hash_fn == "xxhash64":
        h = F.xxhash64(F.col("t"))
    else:
        raise ValueError(f"hash_fn must be 'xxhash64' or 'md5', got {hash_fn!r}")
    aggs = [F.sum(F.when(F.shiftright(h, j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"__b{j}__")
            for j in range(64)]
    agg = tok.groupBy(id_col).agg(*aggs)
    fp = None
    for j in range(64):
        bit = F.when(F.col(f"__b{j}__") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, j)
        fp = term if fp is None else fp.bitwiseOR(term)
    return agg.select(id_col, fp.alias("simhash"))


def simhash_dup_pairs(sdf: SparkDataFrame, id_col: str, text_col: str,
                      max_hamming: int = 3,
                      hash_fn: str = "xxhash64") -> SparkDataFrame:
    """Near-dup pairs with hamming(simhash) ≤ k via the pigeonhole
    chunk join: split 64 bits into 4×16-bit chunks; hamming ≤ 3 ⇒ at
    least one chunk identical ⇒ candidates = equi-join per chunk."""
    fp = simhash(sdf, id_col, text_col, hash_fn=hash_fn)
    chunks = F.array(*[
        F.struct(F.lit(c).alias("chunk"),
                 F.shiftright(F.col("simhash"), 16 * c).bitwiseAND(F.lit(0xFFFF)).alias("cv"))
        for c in range(4)
    ])
    ex = fp.select(id_col, "simhash", F.explode(chunks).alias("c")).select(
        id_col, "simhash", F.col("c.chunk").alias("chunk"), F.col("c.cv").alias("cv"))
    # bucket-then-enumerate (one pass over the fingerprint subtree —
    # a self-join would evaluate it twice)
    buckets = (ex.groupBy("chunk", "cv")
               .agg(F.collect_list(F.struct(F.col(id_col).alias("i"), F.col("simhash").alias("h"))).alias("xs"))
               .filter(F.size("xs") > 1))
    pair_arr = F.flatten(F.transform(
        F.col("xs"),
        lambda x: F.transform(F.filter(F.col("xs"), lambda y: y["i"] > x["i"]),
                              lambda y: F.struct(x["i"].alias("id_a"), y["i"].alias("id_b"),
                                                 x["h"].alias("h_a"), y["h"].alias("h_b")))))
    cand = (buckets.select(F.explode(pair_arr).alias("p"))
            .select("p.id_a", "p.id_b", "p.h_a", "p.h_b")
            .distinct())
    ham = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return cand.withColumn("hamming", ham).filter(F.col("hamming") <= max_hamming) \
               .select("id_a", "id_b", "hamming")


# Edge-count bound for the driver union-find fast path in
# connected_components — ~10 MB of ids collected at the default.
SMALL_EDGE_LIMIT = 400_000


def connected_components(pairs: SparkDataFrame, id_a: str = "id_a",
                         id_b: str = "id_b",
                         nodes: SparkDataFrame | None = None,
                         node_col: str = "node",
                         max_iterations: int = 30,
                         nodes_unique: bool = False) -> SparkDataFrame:
    """Near-dup pair list → canonical component per document: the step
    a real dedup pipeline needs AFTER minhash/simhash pairs (keep the
    min-id doc of each component, drop the rest). Returns
    ``(node_col, component)`` with component = min node id reachable.

    Distributed min-label propagation (the standard MapReduce CC
    recipe, cf. Kiveris et al. large-star/small-star): per iteration
    one equi-join of labels onto the symmetrized edge list + one
    min-aggregation; converges in O(component diameter) rounds —
    near-dup graphs are dense near-cliques, so typically ≤5. Driver
    state is one convergence flag per round. Each generation is
    ``localCheckpoint(eager=True)``-ed: iterative plans GROW ~4× per
    round (the pointer-jump references the propagation twice), and
    caching only cuts execution — Catalyst still re-analyzes the full
    logical lineage every action, which dominates wall time by round 3.
    Checkpointing truncates the plan to the materialized blocks (the
    same recipe GraphFrames/pandas-on-Spark use for iteration); on a
    cluster where executor loss must be survivable, configure a
    reliable checkpoint dir instead.

    ``nodes``: optional frame whose ``node_col`` enumerates ALL ids —
    singletons (no pair) then appear as their own component.
    ``nodes_unique=True`` asserts the caller's ``nodes`` ids are
    already distinct (a corpus id column): the singleton union then
    skips its ``distinct()`` — the ONE exchange of the whole
    small-graph output plan; every other step is a broadcast anti-join
    over the scan (r14, VERDICT r13 #5). Passing it over a frame with
    repeated ids would duplicate singleton rows — caller's contract.
    """
    from pyspark import StorageLevel

    e = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    # Small-graph fast path: near-dup graphs are usually SPARSE (most
    # of the corpus is singleton; edges ∝ duplicate clusters only). If
    # the edge list fits a driver union-find comfortably, one collect
    # + one createDataFrame replaces O(diameter) join rounds — the
    # same hybrid GraphFrames uses. The distributed loop below remains
    # the path for genuinely large edge sets.
    # r13: probe with ONE limited collect of the RAW pair list — union
    # find needs neither symmetrization nor distinct (it dedups
    # implicitly), so the previous symmetrize→distinct→localCheckpoint
    # →count→collect chain (a shuffle plus ~1.5 s of planning/codegen
    # and two extra jobs, measured) only runs when the graph is
    # actually big. CollectLimitExec starts at ONE partition and
    # escalates 4× per round (spark.sql.limit.initialNumPartitions=1),
    # which on a sparse graph re-launches the probe job ~4 times before
    # the limit is known unreachable (measured 3.4→2.0 s here); start
    # at the cluster parallelism instead — dense graphs at scale still
    # stop after the first round, map stages are reused across rounds.
    spark_ = pairs.sparkSession
    _k = "spark.sql.limit.initialNumPartitions"
    try:
        _old = spark_.conf.get(_k, None)
    except Exception:  # noqa: BLE001 — conf surface drift
        _old = None
    spark_.conf.set(_k, str(spark_.sparkContext.defaultParallelism))
    try:
        rows = e.limit(SMALL_EDGE_LIMIT + 1).collect()
    finally:
        if _old is None:
            spark_.conf.unset(_k)
        else:
            spark_.conf.set(_k, _old)
    if len(rows) <= SMALL_EDGE_LIMIT:
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = r, parent[x]
            return r

        for r0 in rows:
            ra, rb = find(r0["a"]), find(r0["b"])
            if ra != rb:
                lo, hi = (ra, rb) if ra <= rb else (rb, ra)
                parent[hi] = lo  # min id becomes the root
        labels = sorted({(n, find(n)) for r0 in rows
                         for n in (r0["a"], r0["b"])})
        spark = pairs.sparkSession

        def _node_ids():
            # nodes_unique: the ids are already distinct by the
            # caller's contract — dropping the distinct() removes the
            # only Exchange of the small-graph output plan (the
            # anti-join below is broadcast)
            ids = nodes.select(F.col(node_col).alias("n"))
            return ids if nodes_unique else ids.distinct()

        if labels:
            out = spark.createDataFrame(labels, ["n", "c"])
            if nodes is not None:
                # labels are bounded by SMALL_EDGE_LIMIT — always the
                # broadcast side (local relations carry no stats, so
                # the planner would SMJ otherwise)
                singles = (_node_ids()
                           .join(F.broadcast(out.select("n")), "n", "left_anti")
                           .select("n", F.col("n").alias("c")))
                out = out.unionByName(singles)
        elif nodes is not None:
            out = _node_ids().select("n", F.col("n").alias("c"))
        else:
            out = spark.createDataFrame([], "n long, c long")
        return out.select(F.col("n").alias(node_col),
                          F.col("c").alias("component"))
    # Big graph: symmetrize + distinct only now (the fast path above
    # never needed it — union-find dedups implicitly).
    edges = (e.unionByName(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
             .distinct().localCheckpoint(eager=False))
    # Iterate ONLY over edge endpoints: in a real near-dup graph the
    # overwhelming majority of the corpus is singleton (no pair), and
    # singletons never change label — looping them through every
    # join/agg round multiplies each iteration by corpus size for no
    # information. They rejoin as their own component at the end.
    verts = edges.select(F.col("a").alias("n")).distinct() \
        .persist(StorageLevel.MEMORY_AND_DISK)
    labels = verts.select("n", F.col("n").alias("c")).localCheckpoint(eager=False)
    converged = False
    for _ in range(max_iterations):
        nb = (edges.join(labels.select(F.col("n").alias("b"),
                                       F.col("c").alias("cb")), "b")
              .select(F.col("a").alias("n"), F.col("cb").alias("c")))
        prop = labels.unionByName(nb).groupBy("n").agg(F.min("c").alias("c"))
        # pointer jumping: also adopt the label OF the label —
        # label(n) := min(label(n), label(label(n))). Chains halve per
        # round, so worst-case convergence is O(log diameter) instead
        # of O(diameter) (a 1M-doc chain finishes in ~20 rounds).
        hop = (prop.join(prop.select(F.col("n").alias("c"),
                                     F.col("c").alias("cc")), "c")
               .select("n", F.col("cc").alias("c")))
        # lazy checkpoints: the convergence count below is the one
        # action per round — it materializes (and caches) `new` while
        # truncating its lineage for the next round, with no extra
        # eager job launches (job count dominates toy-scale wall time)
        new = (prop.unionByName(hop).groupBy("n").agg(F.min("c").alias("c"))
               .localCheckpoint(eager=False))
        changed = (new.join(labels.select("n", F.col("c").alias("c0")), "n")
                   .filter(F.col("c") != F.col("c0")).count())
        labels = new
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations — raise max_iterations (components deeper than "
            f"~2^{max_iterations} chained nodes are pathological for "
            "near-dup graphs)")
    out = labels
    if nodes is not None:
        # singletons: every listed node with no edge = own component
        ids = nodes.select(F.col(node_col).alias("n"))
        if not nodes_unique:
            ids = ids.distinct()
        singles = (ids.join(verts, "n", "left_anti")
                   .select("n", F.col("n").alias("c")))
        out = labels.unionByName(singles)
    return out.select(F.col("n").alias(node_col), F.col("c").alias("component"))


def decontaminate(corpus: SparkDataFrame, benchmark: SparkDataFrame,
                  id_col: str, text_col: str, n: int = 3,
                  threshold: float = 0.1) -> SparkDataFrame:
    """Benchmark decontamination: flag corpus documents sharing word
    ``n``-gram content with an evaluation set (the public n-gram
    overlap protocol from the GPT-3 / PaLM appendices).

    Shape: the benchmark's DISTINCT n-grams (small by construction —
    eval sets are orders of magnitude smaller than the corpus) are
    broadcast; corpus n-grams stream through one broadcast semi-match
    and a per-doc count. The corpus is never shuffled on content —
    only the (id, gram)→id hash-agg — so this runs at scan speed on
    100 TB while the benchmark side stays a few MB.

    Returns (id, n_grams, n_hit, overlap_frac, contaminated)."""
    bench_grams = (shingle_frame(benchmark, id_col, text_col, n=n)
                   .select(F.explode("g").alias("gram")).distinct())
    corp = (cached_grams(corpus, id_col, text_col, n)
            .select(F.col(id_col), F.explode("g").alias("gram")))
    hits = (corp.join(F.broadcast(bench_grams), "gram")
            .groupBy(id_col).agg(F.count(F.lit(1)).alias("n_hit")))
    sizes = corp.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    frac = F.round(F.col("n_hit") / F.col("n_grams"), 6)
    return (sizes.join(hits, id_col, "left")
            .select(F.col(id_col), F.col("n_grams"),
                    F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
                    F.coalesce(frac, F.lit(0.0)).alias("overlap_frac"))
            .withColumn("contaminated", F.col("overlap_frac") >= threshold))


def exact_substring_dedup(sdf: SparkDataFrame, id_col: str, text_col: str,
                          min_len: int = 8) -> SparkDataFrame:
    """ExactSubstr span dedup (Lee et al. 2021, "Deduplicating Training
    Data Makes Language Models Better"): remove every token span of
    length >= ``min_len`` whose content appears elsewhere in the corpus,
    keeping only the globally-first occurrence. The reference engine has
    no analog (its dedup surface is whole-row ``drop_duplicates``,
    frame.py:4451) — this is the sub-document granularity a training
    pipeline needs for boilerplate that is pasted *inside* documents.

    Distributed shape (the suffix-array of the paper is a single-node
    construction; the standard cluster formulation is positional
    n-gram matching, which this implements exactly at gram granularity):

    1. tokenize (whitespace) — narrow, no shuffle;
    2. positional ``min_len``-gram digests via one explode — output
       ∝ total tokens;
    3. ONE hash-agg on the digest (uniform 128-bit key): occurrence
       count + global-first occurrence ``min(doc<<33|pos)``;
    4. non-canonical occurrences → per-doc sorted seed arrays (second
       uniform shuffle, on doc id);
    5. index-lambda token mask ``exists(seed: seed <= i < seed+L)`` —
       per-row, JVM, overlapping spans merge for free since positions
       are the ORIGINAL token positions on both engines.

    No all-pairs step and no driver state: work is ∝ corpus tokens +
    duplicate occurrences. md5 keeps the digest oracle-expressible;
    production would swap in xxhash64 (same plan shape, cheaper bytes)
    or a rolling hash to cut the O(L) slice per position to O(1).

    Returns (id, n_tokens, n_removed, text_dedup): the cleaned text
    with duplicated spans cut and single spaces rejoining survivors.
    """
    toks = F.split(F.trim(F.regexp_replace(F.col(text_col), r"\s+", " ")), " ")
    d = sdf.select(F.col(id_col), toks.alias("__t__"))
    occ = (d.filter(F.size("__t__") >= min_len)
           .select(F.col(id_col),
                   F.explode(F.sequence(F.lit(0), F.size("__t__") - min_len)).alias("pos"),
                   F.col("__t__"))
           .select(F.col(id_col), F.col("pos"),
                   (F.col(id_col).cast("long") * F.lit(2 ** 33)
                    + F.col("pos")).alias("__k__"),
                   F.md5(F.concat_ws(
                       " ", F.slice(F.col("__t__"), F.col("pos") + 1, min_len))).alias("__h__")))
    dup = (occ.groupBy("__h__")
           .agg(F.count(F.lit(1)).alias("__c__"), F.min("__k__").alias("__canon__"))
           .filter(F.col("__c__") > 1)
           .select("__h__", "__canon__"))
    seeds = (occ.join(dup, "__h__")
             .filter(F.col("__k__") != F.col("__canon__"))
             .groupBy(id_col).agg(F.array_sort(F.collect_set("pos")).alias("__seeds__")))
    s = F.coalesce(F.col("__seeds__"), F.expr("CAST(array() AS array<int>)"))
    kept = F.filter(
        F.col("__t__"),
        lambda x, i: ~F.exists(s, lambda q: (i >= q) & (i < q + F.lit(min_len))))
    return (d.join(seeds, id_col, "left")
            .select(F.col(id_col),
                    F.size("__t__").cast("long").alias("n_tokens"),
                    (F.size("__t__") - F.size(kept)).cast("long").alias("n_removed"),
                    F.array_join(kept, " ").alias("text_dedup")))


def dedup_against(corpus: SparkDataFrame, reference: SparkDataFrame,
                  id_col: str, text_col: str,
                  ref_text_col: str | None = None) -> SparkDataFrame:
    """Incremental exact dedup: drop corpus documents whose normalized
    content already exists in a REFERENCE corpus (the previous crawl /
    already-trained shard) — the standard snapshot-over-snapshot
    pipeline step.

    One anti-join on the md5 digest: the reference side reduces to its
    DISTINCT digests first (bounded by reference cardinality), so at
    100 TB the corpus shuffles once on a uniform 128-bit key and the
    reference ships only digests, never text."""
    digest = F.md5(normalize_text(F.col(text_col)))
    ref_digest = F.md5(normalize_text(F.col(ref_text_col or text_col)))
    ref = reference.select(ref_digest.alias("__digest__")).distinct()
    return (corpus.withColumn("__digest__", digest)
            .join(ref, "__digest__", "left_anti")
            .drop("__digest__"))


def keep_best(components: SparkDataFrame, scores: SparkDataFrame,
              node_col: str = "node", score_col: str = "score") -> SparkDataFrame:
    """Pick the representative of each near-dup component by QUALITY
    rather than min id — real pipelines keep the longest / cleanest /
    highest-classifier-score copy and drop the rest. Deterministic:
    score descending, node id ascending on ties, so reruns keep the
    same row. The window partitions by component — near-dup components
    are small by construction, so this distributes; one equi-join on
    the node id (broadcast when the component table is the small side
    is the planner's call under AQE).

    ``components``: (node_col, component) as returned by
    ``connected_components``. ``scores``: (node_col, score_col).
    Returns (node_col, component, score_col, keep). A node with no
    score row is KEPT in the output with a null score (left join —
    an inner join would silently drop the document from the result,
    and a fully-unscored component would elect no representative);
    null scores sort last, so scored members win."""
    j = components.join(scores.select(node_col, score_col), node_col, "left")
    w = W.partitionBy("component").orderBy(
        F.col(score_col).desc_nulls_last(), F.col(node_col).asc())
    return j.withColumn("keep", F.row_number().over(w) == F.lit(1))

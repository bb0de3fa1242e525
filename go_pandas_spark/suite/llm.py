"""Training-data-pipeline operators: dedup, text analysis, similarity
search, multimodal plumbing (SURVEY §7 phase 12 — engine extensions
beyond the reference surface)."""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load, query
from ..operators import dedup, multimodal, similarity, text

_NORM = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"

_GRAMS = f"""
    norm AS (SELECT doc_id, {_NORM} AS t FROM documents),
    words AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm),
    grams AS (SELECT doc_id,
                     list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 1)),
                                                  i -> array_to_string(w[i:i+2], ' '))) AS g
              FROM words),
    ex AS (SELECT doc_id, unnest(g) AS sh FROM grams),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM ex GROUP BY doc_id),
    inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS i
              FROM ex a JOIN ex b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY 1, 2)
"""

_JACCARD_SQL = f"""
    WITH {_GRAMS}
    SELECT id_a, id_b, ROUND(i / CAST(sa.sz + sb.sz - i AS DOUBLE), 6) AS jaccard
    FROM inter JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
    WHERE i / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.5
"""


@query(
    "dedup_exact",
    oracle=f"""
    SELECT MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_dups
    FROM (SELECT doc_id, md5({_NORM}) AS d FROM documents) GROUP BY d
    """,
)
def dedup_exact(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").to_spark()
    return dedup.exact_dedup(docs, "text", "doc_id")


@query("dedup_ngram_jaccard", oracle=_JACCARD_SQL)
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact all-pairs n-gram Jaccard ≥ 0.5 via shingle inverted index."""
    docs = load(spark, sf_dir, "documents").to_spark()
    out = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5)
    return out.withColumn("jaccard", F.round("jaccard", 6))


@query("dedup_minhash_lsh", oracle=_JACCARD_SQL)
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash-LSH candidates + exact verification. Oracle = the exact
    Jaccard join: holds iff LSH recall = 1 on this corpus (true pairs
    here all have J ≥ 0.8; with r=2, b=16 → P(miss | J=0.8) =
    (1-0.64)^16 ≈ 8e-8 — verified empirically at sf0.01 and sf0.1)."""
    docs = load(spark, sf_dir, "documents").to_spark()
    out = dedup.minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.5,
                                    num_hashes=32, bands=16)
    return out.withColumn("jaccard", F.round("jaccard", 6))


@query(
    "dedup_simhash",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {_NORM} AS t FROM documents),
    toks AS (SELECT doc_id, unnest(string_split(t, ' ')) AS tk FROM norm),
    h AS (SELECT doc_id, ('0x' || substr(md5(tk), 1, 15))::BIGINT AS hv FROM toks),
    bits AS (SELECT doc_id, j.j,
                    SUM(CASE WHEN (hv >> j.j) & 1 = 1 THEN 1 ELSE -1 END) AS s
             FROM h CROSS JOIN generate_series(0, 59) j(j)
             GROUP BY doc_id, j.j),
    fp AS (SELECT doc_id,
                  CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS sh
           FROM bits GROUP BY doc_id)
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(a.sh, b.sh)) AS INT) AS hamming
    FROM fp a JOIN fp b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.sh, b.sh)) <= 3
    """,
)
def dedup_simhash(spark, sf_dir):
    """SimHash near-dup pairs with the md5-folded 60-bit token hash
    (``hash_fn='md5'``): the exact fingerprint is reproducible in ANSI
    SQL, so the pigeonhole chunk join is value-verified against an
    all-pairs hamming oracle. Production default stays xxhash64 (same
    plan, faster hash)."""
    docs = load(spark, sf_dir, "documents").to_spark()
    return dedup.simhash_dup_pairs(docs, "doc_id", "text", max_hamming=3,
                                   hash_fn="md5")


_COS = """list_sum(list_transform(generate_series(1, len(a.embedding)),
                 i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
       / (sqrt(list_sum(list_transform(generate_series(1, len(a.embedding)),
                 i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
        * sqrt(list_sum(list_transform(generate_series(1, len(b.embedding)),
                 i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))))"""


@query(
    "similarity_cosine_topk",
    oracle=f"""
    WITH scored AS (
      SELECT b.vec_id AS query_id, a.vec_id, {_COS} AS sim
      FROM embeddings a, (SELECT * FROM embeddings WHERE vec_id % 100 = 0) b
      WHERE a.vec_id <> b.vec_id),
    ranked AS (SELECT query_id, vec_id, sim,
                      ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank
               FROM scored)
    SELECT query_id, vec_id, ROUND(sim, 6) AS sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def similarity_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k: broadcast query set × corpus scan."""
    emb = load(spark, sf_dir, "embeddings").to_spark()
    q = emb.filter(F.col("vec_id") % 100 == 0)
    return similarity.cosine_topk(emb, q, k=5)


@query(
    "similarity_neardup_exact",
    oracle=f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, ROUND({_COS}, 6) AS sim
    FROM (SELECT * FROM embeddings WHERE vec_id < 300) a,
         (SELECT * FROM embeddings WHERE vec_id < 300) b
    WHERE a.vec_id < b.vec_id AND {_COS} >= 0.3
    """,
)
def similarity_neardup_exact(spark, sf_dir):
    """Exact cosine near-dup pairs on a bounded subset (the oracle-able
    baseline; the LSH variant below is the scale path)."""
    emb = load(spark, sf_dir, "embeddings").to_spark().filter(F.col("vec_id") < 300)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("__va__"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("__vb__"))
    pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    sim = similarity.cosine(F.col("__va__"), F.col("__vb__"))
    return (pairs.withColumn("sim", sim).filter(F.col("sim") >= 0.3)
            .select("id_a", "id_b", F.round("sim", 6).alias("sim")))


# Hyperplane weights shared VERBATIM by the Spark query (literal
# arrays) and the DuckDB oracle (list literal): 16 planes × dim 64,
# deterministic LCG, all values exact dyadic rationals (repr-safe).
_LSH_PLANES = similarity.make_planes(16, 64)
_LSH_PLANES_SQL = "[" + ", ".join(
    "[" + ", ".join(repr(x) for x in row) + "]" for row in _LSH_PLANES) + "]"

_L2SQ = """list_sum(list_transform(generate_series(1, 64),
             i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))
                * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cv[i] AS DOUBLE))))"""


@query(
    "similarity_lsh_topk",
    oracle=f"""
    WITH planes AS (
      SELECT p.i - 1 AS p, ws[p.i] AS w
      FROM (SELECT {_LSH_PLANES_SQL} AS ws) CROSS JOIN generate_series(1, 16) p(i)),
    proj AS (
      SELECT e.vec_id, p.p,
             list_sum(list_transform(generate_series(1, 64),
                      i -> CAST(e.embedding[i] AS DOUBLE) * p.w[i])) AS pr
      FROM embeddings e CROSS JOIN planes p),
    sigs AS (
      SELECT vec_id,
             CAST(SUM(CASE WHEN pr > 0 THEN (1::BIGINT << p) ELSE 0 END) AS BIGINT) AS sig
      FROM proj GROUP BY vec_id),
    bnd AS (
      SELECT s.vec_id, b.b, (s.sig >> (b.b * 4)) & 15 AS bv
      FROM sigs s CROSS JOIN generate_series(0, 3) b(b)),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS cid
      FROM bnd c JOIN bnd q ON c.b = q.b AND c.bv = q.bv
      WHERE q.vec_id % 100 = 0 AND c.vec_id <> q.vec_id),
    scored AS (
      SELECT cand.query_id, cand.cid AS vec_id, {_COS} AS sim
      FROM cand JOIN embeddings a ON a.vec_id = cand.cid
                JOIN embeddings b ON b.vec_id = cand.query_id),
    ranked AS (SELECT query_id, vec_id, sim,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY sim DESC, vec_id) AS rank
               FROM scored)
    SELECT query_id, vec_id, ROUND(sim, 6) AS sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def similarity_lsh_topk(spark, sf_dir):
    """ANN top-k via banded hyperplane LSH. The hyperplanes are
    explicit literals (``make_planes``) shared with the oracle, so the
    signature→band→candidate→re-rank chain is value-verified exactly —
    not just recall-tested."""
    emb = load(spark, sf_dir, "embeddings").to_spark()
    q = emb.filter(F.col("vec_id") % 100 == 0)
    return similarity.lsh_topk(emb, q, k=5, planes=_LSH_PLANES)


@query(
    "similarity_ivf_topk",
    oracle=f"""
    WITH cents AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
             embedding AS cv
      FROM embeddings ORDER BY vec_id LIMIT 16),
    d AS (
      SELECT e.vec_id, c.cell, {_L2SQ} AS dist
      FROM embeddings e CROSS JOIN cents c),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
        FROM d) WHERE rn = 1),
    probes AS (
      SELECT vec_id AS query_id, cell FROM (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
        FROM d WHERE vec_id % 100 = 0) WHERE rn <= 4),
    cand AS (
      SELECT p.query_id, s.vec_id
      FROM assign s JOIN probes p USING (cell)
      WHERE s.vec_id <> p.query_id),
    scored AS (
      SELECT cand.query_id, cand.vec_id, {_COS} AS sim
      FROM cand JOIN embeddings a ON a.vec_id = cand.vec_id
                JOIN embeddings b ON b.vec_id = cand.query_id),
    ranked AS (SELECT query_id, vec_id, sim,
                      ROW_NUMBER() OVER (PARTITION BY query_id
                                         ORDER BY sim DESC, vec_id) AS rank
               FROM scored)
    SELECT query_id, vec_id, ROUND(sim, 6) AS sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def similarity_ivf_topk(spark, sf_dir):
    """IVF scale path: coarse-quantize into cells, probe the nearest
    cells per query, exact re-rank inside them — at rest the cell is a
    partition column and probing becomes partition pruning. Quantizer
    pinned to the deterministic init (``iters=0``: the 16 smallest-id
    vectors are the centroids) so the oracle reproduces the exact cell
    geometry; the trained-Lloyd path is bench/pytest-covered."""
    emb = load(spark, sf_dir, "embeddings").to_spark()
    q = emb.filter(F.col("vec_id") % 100 == 0)
    return similarity.ivf_topk(emb, q, k=5, n_cells=16, n_probe=4, iters=0)


def _sw_list(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in text.STOPWORDS[lang]) + "]"


_TEXT_ORACLE = f"""
    WITH norm AS (
      SELECT doc_id, text, {_NORM} AS t FROM documents),
    toks AS (SELECT doc_id, text, t, string_split(t, ' ') AS w FROM norm),
    feat AS (
      SELECT doc_id,
        CAST(length(text) AS BIGINT) AS n_chars_calc,
        CAST(len(w) AS INT) AS n_tokens,
        CAST(COALESCE(list_sum(list_transform(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]'),
                                         p -> CAST(ceil(length(p) / 4.0) AS BIGINT))), 0)
             AS BIGINT) AS n_bpe_tokens,
        ROUND((length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
              / greatest(length(text), 1), 6) AS punct_ratio,
        ROUND(len(list_filter(w, x -> list_contains({_sw_list('en')}, x)))
              / CAST(greatest(len(w), 1) AS DOUBLE), 6) AS stopword_ratio_en,
        md5(t) AS fingerprint,
        len(list_filter(w, x -> list_contains({_sw_list('en')}, x))) AS s_en,
        len(list_filter(w, x -> list_contains({_sw_list('de')}, x))) AS s_de,
        len(list_filter(w, x -> list_contains({_sw_list('fr')}, x))) AS s_fr,
        len(list_filter(w, x -> list_contains({_sw_list('es')}, x))) AS s_es
      FROM toks)
    SELECT doc_id, n_chars_calc, n_tokens, n_bpe_tokens, punct_ratio, stopword_ratio_en,
           fingerprint,
           CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'unknown'
                WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
                WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
                WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
                ELSE 'es' END AS lang_detected
    FROM feat
"""


@query("text_stats_battery", oracle=_TEXT_ORACLE)
def text_stats_battery(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").to_spark()
    s = text.text_stats(docs, "text")
    return s.select("doc_id", "n_chars_calc", "n_tokens", "n_bpe_tokens",
                    "punct_ratio", "stopword_ratio_en", "fingerprint", "lang_detected")


@query(
    "text_quality_filter",
    oracle=f"""
    WITH norm AS (SELECT doc_id, text, {_NORM} AS t FROM documents),
    toks AS (SELECT doc_id, text, string_split(t, ' ') AS w FROM norm),
    q AS (
      SELECT doc_id,
        least(len(list_filter(w, x -> list_contains({_sw_list('en')}, x)))
              / CAST(greatest(len(w), 1) AS DOUBLE) * 4.0, 1.0) * 0.4
        + greatest(1.0 - (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                   / CAST(greatest(length(text), 1) AS DOUBLE) * 4.0, 0.0) * 0.2
        + greatest(1.0 - (length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))
                   / CAST(greatest(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')), 1) AS DOUBLE) * 2.0, 0.0) * 0.2
        + CASE WHEN list_sum(list_transform(w, x -> CAST(length(x) AS BIGINT)))
                    / CAST(greatest(len(w), 1) AS DOUBLE) BETWEEN 3 AND 10 THEN 1.0 ELSE 0.5 END * 0.2
          AS raw,
        CASE WHEN length(text) BETWEEN 50 AND 100000 THEN 1.0 ELSE 0.5 END AS len_ok
      FROM toks)
    SELECT doc_id, ROUND(raw * len_ok, 6) AS quality FROM q
    WHERE ROUND(raw * len_ok, 6) >= 0.5
    """,
)
def text_quality_filter(spark, sf_dir):
    """Quality-score gate — the canonical corpus-filter pipeline step."""
    docs = load(spark, sf_dir, "documents").to_spark()
    out = docs.select("doc_id", text.quality_score(F.col("text")).alias("quality"))
    return out.filter(F.col("quality") >= 0.5)


_FAKE_F = ("ROUND((('0x' || substr({h}, {pos}, 8))::BIGINT % 2000000)"
           "/1000000.0 - 1.0, 6)")


@query(
    "multimodal_features",
    oracle=f"""
    WITH c AS (SELECT doc_id AS media_id, md5(md5(COALESCE(text, ''))) AS h1
               FROM documents),
    c2 AS (SELECT media_id, h1, md5(h1) AS h2 FROM c),
    c4 AS (SELECT media_id, h1, h2, md5(md5(h2)) AS h4 FROM c2)
    SELECT media_id, 16 AS n_dim,
           {_FAKE_F.format(h='h1', pos=1)} AS f0,
           {_FAKE_F.format(h='h2', pos=25)} AS f7,
           {_FAKE_F.format(h='h4', pos=25)} AS f15
    FROM c4
    """,
)
def multimodal_features(spark, sf_dir):
    """Arrow-batched feature extraction over the media contract with
    the deterministic md5-hex-chain kernel. The chain is pure ANSI SQL
    (md5 over hex strings, 8-hex-digit windows), so the oracle verifies
    actual feature VALUES through the real mapInPandas plumbing —
    projected to 3 probe dims + the width (full array hashing is
    engine-dependent)."""
    docs = load(spark, sf_dir, "documents").to_spark()
    media = multimodal.make_media_frame(
        docs.select("doc_id", F.encode("text", "utf-8").alias("b")), "doc_id", "b", "text/plain")
    feats = multimodal.extract_features(media, dim=16, deterministic_fake=True)
    return feats.select(
        "media_id", F.size("features").alias("n_dim"),
        F.round(F.element_at("features", 1).cast("double"), 6).alias("f0"),
        F.round(F.element_at("features", 8).cast("double"), 6).alias("f7"),
        F.round(F.element_at("features", 16).cast("double"), 6).alias("f15"))


@query(
    "multimodal_decode_pipeline",
    oracle="""
    WITH px AS (SELECT doc_id, unnest(generate_series(0, 191)) AS i
                FROM documents)
    SELECT doc_id AS media_id, 8 AS width, 8 AS height, 255 AS maxval,
           CAST(SUM(CASE WHEN i % 3 = 0
                         THEN (doc_id * 31 + i * 7) % 256 END) AS BIGINT)
               AS ch0_sum,
           CAST(SUM(CASE WHEN i % 3 = 1
                         THEN (doc_id * 31 + i * 7) % 256 END) AS BIGINT)
               AS ch1_sum,
           CAST(SUM(CASE WHEN i % 3 = 2
                         THEN (doc_id * 31 + i * 7) % 256 END) AS BIGINT)
               AS ch2_sum
    FROM px GROUP BY doc_id
    """,
)
def multimodal_decode_pipeline(spark, sf_dir):
    """REAL end-to-end decode, hash-verifiable (r10, closing the one
    never-sampled query): genuine binary P6 PPM images are built
    executor-side (operators/codecs.encode_ppm) from a closed-form
    pixel rule — byte j of doc d is ``(d*31 + j*7) % 256`` — then
    DECODED FOR REAL by the registered pure-stdlib PPM codec (header
    parse + per-channel pixel sums, codecs.ppm_facts) through the
    Arrow-batched multimodal registry. The emitted facts (width,
    height, maxval, per-channel int sums) are exactly recomputable by
    the DuckDB oracle from the same rule, so the driver value-hashes
    the whole encode→decode→extract chain; the statistical 16-dim
    kernel and the cosine-top-k stage keep their pytest coverage
    (tests/test_codecs.py) and the similarity_* oracle queries."""
    from ..operators import codecs

    docs = load(spark, sf_dir, "documents").to_spark().select("doc_id")

    def enc(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for did in pdf["doc_id"]:
                pix = bytes((int(did) * 31 + j * 7) % 256 for j in range(192))
                rows.append((did, codecs.encode_ppm(8, 8, pix)))
            yield pd.DataFrame(rows, columns=["doc_id", "b"])

    enc_sdf = docs.mapInPandas(enc, schema="doc_id long, b binary")
    media = multimodal.make_media_frame(enc_sdf, "doc_id", "b",
                                        "image/x-ppm-facts")
    multimodal.register_decoder("image/x-ppm-facts", codecs.ppm_facts)
    feats = multimodal.extract_features(media, dim=6)
    fcol = [F.element_at("features", i + 1) for i in range(6)]
    return feats.select(
        "media_id",
        fcol[0].cast("int").alias("width"),
        fcol[1].cast("int").alias("height"),
        fcol[2].cast("int").alias("maxval"),
        fcol[3].cast("long").alias("ch0_sum"),
        fcol[4].cast("long").alias("ch1_sum"),
        fcol[5].cast("long").alias("ch2_sum"))


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH m AS (SELECT doc_id AS media_id, COALESCE(text, '') AS t,
                      (doc_id % 5) * 1000 AS dur
               FROM documents),
    n AS (SELECT media_id, t, greatest(CAST(dur / 500 AS INT), 1) AS nf FROM m),
    fr AS (SELECT media_id, t, unnest(generate_series(0, nf - 1)) AS fi FROM n)
    SELECT media_id, CAST(fi AS INT) AS frame_idx,
           CAST(fi * 500 AS BIGINT) AS ts_ms,
           sha256(t || CAST(fi AS VARCHAR)) AS frame_sha
    FROM fr
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    """Frame sampling over the media contract (posexplode of the
    timestamp sequence — the real distributed shape). Fake frame bytes
    are sha256(content || frame_idx), reproducible in SQL, so the
    oracle value-verifies the explosion cardinality, timestamps, AND
    the per-frame payload digest."""
    docs = load(spark, sf_dir, "documents").to_spark()
    media = multimodal.make_media_frame(
        docs.select("doc_id", F.encode("text", "utf-8").alias("b")), "doc_id", "b", "video/fake")
    media = media.withColumn(
        "meta",
        F.struct(F.col("meta.mime"), F.col("meta.width"), F.col("meta.height"),
                 (F.col("media_id") % 5 * 1000).cast("long").alias("duration_ms")))
    frames = multimodal.sample_frames(media, every_ms=500, deterministic_fake=True)
    return frames.select("media_id", "frame_idx", "ts_ms",
                         F.col("frame").cast("string").alias("frame_sha"))


@query(
    "sessionize_batch",
    oracle="""
    WITH t AS (
      SELECT user_id, event_id, make_timestamp(epoch_ns(ts)//1000) AS uts FROM events),
    s AS (
      SELECT user_id, event_id, uts,
             CASE WHEN LAG(uts) OVER w IS NULL
                       OR date_diff('microsecond', LAG(uts) OVER w, uts) > 1800000000
                  THEN 1 ELSE 0 END AS st
      FROM t WINDOW w AS (PARTITION BY user_id ORDER BY uts)),
    sess AS (
      SELECT user_id, event_id,
             SUM(st) OVER (PARTITION BY user_id ORDER BY uts
                           ROWS UNBOUNDED PRECEDING) AS session_id
      FROM s)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MIN(event_id) AS BIGINT) AS first_event
    FROM sess GROUP BY user_id, session_id ORDER BY user_id, session_id
    """,
)
def sessionize_batch(spark, sf_dir):
    """Batch sessionization (gap=30min) — diff+cumsum idiom as
    windows; mirrors streaming session_window semantics."""
    from ..streaming.ops import sessionize_batch as sz

    ev = load(spark, sf_dir, "events").to_spark()
    s = sz(ev, "30min", on="ts", keys=["user_id"])
    return (s.groupBy("user_id", "session_id")
            .agg(F.count(F.lit(1)).alias("n_events"),
                 F.min("event_id").alias("first_event"))
            .orderBy("user_id", "session_id"))


@query(
    "training_data_pipeline",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, text, {_NORM} AS t,
             least(len(list_filter(string_split({_NORM}, ' '),
                                   x -> list_contains({_sw_list('en')}, x)))
                   / CAST(greatest(len(string_split({_NORM}, ' ')), 1) AS DOUBLE) * 4.0, 1.0) * 0.4
             + greatest(1.0 - (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))
                        / CAST(greatest(length(text), 1) AS DOUBLE) * 4.0, 0.0) * 0.2
             + greatest(1.0 - (length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))
                        / CAST(greatest(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')), 1) AS DOUBLE) * 2.0, 0.0) * 0.2
             + CASE WHEN list_sum(list_transform(string_split({_NORM}, ' '), x -> CAST(length(x) AS BIGINT)))
                         / CAST(greatest(len(string_split({_NORM}, ' ')), 1) AS DOUBLE) BETWEEN 3 AND 10
                    THEN 1.0 ELSE 0.5 END * 0.2 AS raw,
             CASE WHEN length(text) BETWEEN 50 AND 100000 THEN 1.0 ELSE 0.5 END AS len_ok
      FROM documents),
    kept AS (SELECT doc_id, t FROM scored WHERE ROUND(raw * len_ok, 6) >= 0.5),
    deduped AS (SELECT MIN(doc_id) AS doc_id FROM kept GROUP BY md5(t))
    SELECT d.doc_id, CAST(len(string_split(k.t, ' ')) AS INT) AS n_tokens
    FROM deduped d JOIN kept k ON d.doc_id = k.doc_id
    """,
)
def training_data_pipeline(spark, sf_dir):
    """End-to-end corpus pipeline: quality gate → exact dedup → token
    stats — the canonical chained LLM-data flow, all JVM expressions."""
    docs = load(spark, sf_dir, "documents").to_spark()
    kept = docs.withColumn("q", text.quality_score(F.col("text"))).filter(F.col("q") >= 0.5)
    surv = dedup.exact_dedup(kept, "text", "doc_id").select("doc_id")
    out = (surv.join(kept, "doc_id")
           .select("doc_id", text.token_count(F.col("text")).alias("n_tokens")))
    return out


_COMPONENTS_SQL = f"""
    WITH RECURSIVE {_GRAMS},
    p AS (
        SELECT id_a, id_b
        FROM inter JOIN sizes sa ON id_a = sa.doc_id JOIN sizes sb ON id_b = sb.doc_id
        WHERE i / CAST(sa.sz + sb.sz - i AS DOUBLE) >= 0.5
    ),
    edges AS (SELECT id_a AS a, id_b AS b FROM p
              UNION SELECT id_b, id_a FROM p),
    reach(n, c) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT e.a, r.c FROM reach r JOIN edges e ON e.b = r.n
    )
    SELECT n AS doc_id, MIN(c) AS component FROM reach GROUP BY n
"""


@query("dedup_components", oracle=_COMPONENTS_SQL)
def dedup_components(spark, sf_dir):
    """Near-dup pairs → per-document component id (min reachable doc):
    the keep/drop decision step of a dedup pipeline. Distributed
    min-label propagation over the symmetrized pair list (O(diameter)
    joined rounds, bounded driver state); oracle = DuckDB recursive
    CTE transitive closure over the same exact-Jaccard pairs."""
    docs = load(spark, sf_dir, "documents").to_spark()
    pairs = dedup.ngram_jaccard_pairs(docs, "doc_id", "text", threshold=0.5)
    # doc_id is the corpus primary id (distinct by construction), so
    # the singleton union can skip its distinct() — the one exchange
    # of the small-graph output plan (r14)
    return dedup.connected_components(pairs, nodes=docs, node_col="doc_id",
                                      nodes_unique=True)


_G2 = """g2 AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 2
           THEN list_transform(generate_series(1, len(w) - 1), i -> array_to_string(w[i:i+1], ' '))
           ELSE [array_to_string(w, ' ')] END) AS gram FROM words)"""
_G3 = """g3 AS (SELECT doc_id, unnest(CASE WHEN len(w) >= 3
           THEN list_transform(generate_series(1, len(w) - 2), i -> array_to_string(w[i:i+2], ' '))
           ELSE [array_to_string(w, ' ')] END) AS gram FROM words)"""
_WORDS = f"""norm AS (SELECT doc_id, {_NORM} AS t FROM documents),
    words AS (SELECT doc_id, t, string_split(t, ' ') AS w FROM norm),
    nch AS (SELECT doc_id, length(t) AS nchars FROM norm)"""


@query(
    "gopher_repetition_filter",
    oracle=f"""
    WITH {_WORDS}, {_G2},
    c2 AS (SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS cnt FROM g2 GROUP BY 1, 2),
    r2 AS (SELECT doc_id, cnt, length(gram) AS glen,
                  ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY cnt DESC, length(gram) DESC, gram DESC) AS rn
           FROM c2),
    top AS (SELECT r2.doc_id,
                   ROUND(least(cnt * glen / greatest(nchars, 1), 1.0), 6) AS top_2gram_frac
            FROM r2 JOIN nch USING (doc_id) WHERE rn = 1),
    {_G3},
    c3 AS (SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS cnt FROM g3 GROUP BY 1, 2),
    d3 AS (SELECT c3.doc_id,
                  ROUND(least(COALESCE(SUM(CASE WHEN cnt >= 2 THEN length(gram) * cnt
                                            ELSE 0 END), 0) / greatest(nchars, 1), 1.0), 6)
                  AS dup_3gram_frac
           FROM c3 JOIN nch USING (doc_id) GROUP BY c3.doc_id, nchars)
    SELECT doc_id, top_2gram_frac, dup_3gram_frac,
           top_2gram_frac <= 0.08 AND dup_3gram_frac <= 0.3 AS kept
    FROM top JOIN d3 USING (doc_id)
    """,
)
def gopher_repetition_filter(spark, sf_dir):
    """Within-document repetition signals (Gopher rules, Rae et al.
    2021): top-2-gram char fraction and duplicated-3-gram char
    fraction, plus the keep/drop verdict. Explode + two map-side-
    combined hash-aggs — no skew, no UDF."""
    docs = load(spark, sf_dir, "documents").to_spark()
    sig = text.repetition_signals(docs, "doc_id", "text", top_n=2, dup_n=3)
    return sig.withColumn(
        "kept", (F.col("top_2gram_frac") <= 0.08) & (F.col("dup_3gram_frac") <= 0.3))


@query(
    "decontaminate_ngram_overlap",
    oracle=f"""
    WITH {_WORDS},
    grams AS (SELECT doc_id,
                     list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 1)),
                                                  i -> array_to_string(w[i:i+2], ' '))) AS g
              FROM words),
    ex AS (SELECT doc_id, unnest(g) AS gram FROM grams),
    bench AS (SELECT DISTINCT gram FROM ex WHERE doc_id % 97 = 0),
    sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams FROM ex GROUP BY doc_id),
    hits AS (SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_hit
             FROM ex e JOIN bench b USING (gram) GROUP BY e.doc_id)
    SELECT s.doc_id, s.n_grams, COALESCE(h.n_hit, 0) AS n_hit,
           COALESCE(ROUND(h.n_hit / CAST(s.n_grams AS DOUBLE), 6), 0.0) AS overlap_frac,
           COALESCE(ROUND(h.n_hit / CAST(s.n_grams AS DOUBLE), 6), 0.0) >= 0.1 AS contaminated
    FROM sizes s LEFT JOIN hits h USING (doc_id)
    """,
)
def decontaminate_ngram_overlap(spark, sf_dir):
    """Benchmark decontamination (GPT-3/PaLM n-gram overlap protocol):
    every 97th doc plays the eval set; its distinct 3-grams broadcast
    against the corpus gram stream."""
    docs = load(spark, sf_dir, "documents").to_spark()
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    return dedup.decontaminate(docs, bench, "doc_id", "text", n=3, threshold=0.1)


@query(
    "pii_scrub_redact",
    oracle="""
    WITH p AS (
      SELECT doc_id,
             text || ' contact u' || CAST(doc_id AS VARCHAR)
                  || '@mail.example.com ph 555-867-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ' ip 192.168.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS t
      FROM documents)
    SELECT doc_id,
      CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT) AS n_email,
      CAST(len(regexp_extract_all(t, '\\b\\d{3}-\\d{3}-\\d{4}\\b')) AS INT) AS n_phone,
      CAST(len(regexp_extract_all(t, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS INT) AS n_ipv4,
      md5(regexp_replace(regexp_replace(regexp_replace(t,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '\\b\\d{3}-\\d{3}-\\d{4}\\b', '<PHONE>', 'g'),
            '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g')) AS scrubbed_md5
    FROM p
    """,
)
def pii_scrub_redact(spark, sf_dir):
    """PII surface scrubbing: seed each doc with a deterministic
    synthetic email/phone/IP, then count and redact with the engine's
    public-pattern battery (pure JVM regexp, oracle-matched md5 of the
    scrubbed text)."""
    docs = load(spark, sf_dir, "documents").to_spark()
    t = F.concat(F.col("text"), F.lit(" contact u"), F.col("doc_id").cast("string"),
                 F.lit("@mail.example.com ph 555-867-"),
                 F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                 F.lit(" ip 192.168."), (F.col("doc_id") % 256).cast("string"),
                 F.lit(".7"))
    seeded = docs.select("doc_id", t.alias("t"))
    counts = text.pii_counts(F.col("t"))
    return seeded.select(
        "doc_id",
        counts["email"].cast("int").alias("n_email"),
        counts["phone"].cast("int").alias("n_phone"),
        counts["ipv4"].cast("int").alias("n_ipv4"),
        F.md5(text.scrub_pii(F.col("t"))).alias("scrubbed_md5"))


@query(
    "pack_sequences_chunked",
    oracle=f"""
    WITH t AS (SELECT doc_id, len(string_split({_NORM}, ' ')) AS n_tokens FROM documents),
    c AS (SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
                 CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                      - n_tokens AS BIGINT) AS start
          FROM t)
    SELECT doc_id, n_tokens, CAST(start // 256 AS BIGINT) AS seq_id,
           CAST(start % 256 AS BIGINT) AS seq_offset
    FROM c
    """,
)
def pack_sequences_chunked(spark, sf_dir):
    """GPT-style concat-and-chunk sequence packing over the global
    token tape (budget 256). The running token offset rides the
    blocked distributed cumsum — no single-task window."""
    docs = load(spark, sf_dir, "documents").to_spark()
    toks = docs.select("doc_id", text.token_count(F.col("text")).alias("n_tokens"))
    return text.pack_sequences(toks, "doc_id", "n_tokens", budget=256)


@query(
    "remove_boilerplate_lines",
    oracle="""
    WITH s AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents),
    l AS (SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(ls)),
                        i -> {'pos': i - 1, 'ln': ls[i]})) AS u
          FROM s),
    h AS (SELECT doc_id, u.pos AS pos, u.ln AS ln,
                 md5(trim(lower(u.ln))) AS hh FROM l),
    dfc AS (SELECT hh, count(DISTINCT doc_id) AS line_df FROM h
            WHERE len(trim(ln)) >= 1 GROUP BY hh),
    hot AS (SELECT hh FROM dfc WHERE line_df > 3)
    SELECT doc_id,
           string_agg(ln, chr(10) ORDER BY pos) AS text_clean,
           CAST(count(*) AS BIGINT) AS n_lines_kept
    FROM h WHERE hh NOT IN (SELECT hh FROM hot)
    GROUP BY doc_id
    """,
)
def remove_boilerplate_lines(spark, sf_dir):
    """CCNet-style boilerplate-line removal: lines with corpus document
    frequency > 3 are dropped, documents reassembled in line order.
    One digest shuffle + anti-join + per-doc group-back."""
    docs = load(spark, sf_dir, "documents").to_spark()
    return text.remove_boilerplate_lines(docs, "doc_id", "text", max_df=3)


@query(
    "bucket_by_length_batches",
    oracle=f"""
    WITH t AS (SELECT doc_id, CAST(len(string_split({_NORM}, ' ')) AS BIGINT) AS n_tokens
               FROM documents),
    b AS (SELECT doc_id, n_tokens,
                 CAST(floor(log2(greatest(n_tokens, 16))) AS INT) AS len_bucket
          FROM t)
    SELECT doc_id, n_tokens, len_bucket,
           CAST(ceil(SUM(n_tokens) OVER (PARTITION BY len_bucket ORDER BY doc_id
                     ROWS UNBOUNDED PRECEDING) / 4096.0) - 1 AS BIGINT) AS batch_id
    FROM b
    """,
)
def bucket_by_length_batches(spark, sf_dir):
    """Length-bucketed dynamic batching (power-of-2 buckets, 4096-token
    greedy batches) — one shuffle on the bucket key, per-bucket window."""
    docs = load(spark, sf_dir, "documents").to_spark()
    toks = docs.select("doc_id", text.token_count(F.col("text")).alias("n_tokens"))
    return text.bucket_by_length(toks, "doc_id", "n_tokens", batch_budget=4096)


@query(
    "temperature_mixture_weights",
    oracle="""
    WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY source),
    t AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS N, SUM(pow(n_docs, 0.7)) AS Z FROM c)
    SELECT source, n_docs,
           ROUND(n_docs / CAST(N AS DOUBLE), 6) AS p_native,
           ROUND(pow(n_docs, 0.7) / Z, 6) AS p_temperature,
           ROUND((pow(n_docs, 0.7) / Z) / (n_docs / CAST(N AS DOUBLE)), 6) AS sample_weight
    FROM c, t
    """,
)
def temperature_mixture_weights(spark, sf_dir):
    """Temperature-flattened mixture weights per source (alpha=0.7,
    the XLM-R recipe): two tiny aggregates + a broadcast scalar join."""
    docs = load(spark, sf_dir, "documents").to_spark()
    return text.temperature_weights(docs, "source", alpha=0.7)


_CLF_W = text.default_classifier_weights(256)
_CLF_W_SQL = "[" + ", ".join(repr(w) for w in _CLF_W) + "]"


@query(
    "quality_classifier_score",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {_NORM} AS t FROM documents),
    toks AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm),
    s AS (SELECT doc_id,
            COALESCE(list_sum(list_transform(w,
              x -> list_extract({_CLF_W_SQL},
                     CAST(('0x' || substr(md5(x), 1, 8))::BIGINT % 256 AS INT) + 1))), 0.0)
            / greatest(len(w), 1) AS m
          FROM toks)
    SELECT doc_id, ROUND(1.0 / (1.0 + exp(-m)), 6) AS clf_score,
           1.0 / (1.0 + exp(-m)) >= 0.5 AS kept
    FROM s
    """,
)
def quality_classifier_score(spark, sf_dir):
    """fastText-style quality-classifier plumbing (CCNet/GPT-3 filter
    stage): hashed bag-of-words → broadcast literal weight vector →
    sigmoid, all one JVM fold per doc. The weights here are a
    deterministic stand-in; a trained model drops in as the same
    array literal."""
    docs = load(spark, sf_dir, "documents").to_spark()
    score = text.linear_quality_score(F.col("text"), _CLF_W)
    return docs.select("doc_id", F.round(score, 6).alias("clf_score"),
                       (score >= 0.5).alias("kept"))


@query(
    "dsir_importance_weights",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {_NORM} AS t FROM documents),
    toks AS (SELECT doc_id, string_split(t, ' ') AS w FROM norm),
    grams AS (
      SELECT doc_id, unnest(list_concat(w,
          list_transform(range(1, greatest(len(w), 1)),
                         i -> w[i] || ' ' || w[i + 1]))) AS g
      FROM toks),
    b AS (SELECT doc_id,
                 CAST(('0x' || substr(md5(g), 1, 8))::BIGINT % 256 AS INT) AS bkt
          FROM grams),
    tc AS (SELECT bkt, COUNT(*) AS c FROM b WHERE doc_id % 3 = 0 GROUP BY bkt),
    rc AS (SELECT bkt, COUNT(*) AS c FROM b GROUP BY bkt),
    tot AS (SELECT (SELECT SUM(c) FROM tc) AS ct, (SELECT SUM(c) FROM rc) AS cr),
    ratio AS (SELECT rc.bkt,
                     ln((COALESCE(tc.c, 0) + 1.0) / (tot.ct + 256))
                   - ln((rc.c + 1.0) / (tot.cr + 256)) AS lr
              FROM rc LEFT JOIN tc USING (bkt) CROSS JOIN tot),
    s AS (SELECT b.doc_id, SUM(r.lr) AS lw FROM b JOIN ratio r USING (bkt)
          GROUP BY b.doc_id)
    SELECT doc_id, ROUND(lw, 6) AS dsir_log_weight FROM s
    """,
)
def dsir_importance_weights(spark, sf_dir):
    """DSIR data selection (Xie et al. 2023): hashed unigram+bigram
    bag models of a target corpus (every 3rd doc plays the in-domain
    set) vs the raw corpus; each raw doc scored with the broadcast
    log-ratio array in one JVM fold."""
    docs = load(spark, sf_dir, "documents").to_spark()
    target = docs.filter(F.col("doc_id") % 3 == 0)
    return text.dsir_importance_weights(docs, target, "doc_id", "text")


@query(
    "semdedup_embeddings",
    oracle=f"""
    WITH RECURSIVE cents AS (
      SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cell,
             embedding AS cv
      FROM embeddings ORDER BY vec_id LIMIT 8),
    d AS (
      SELECT e.vec_id, c.cell, {_L2SQ} AS dist
      FROM embeddings e CROSS JOIN cents c),
    assign AS (
      SELECT vec_id, cell FROM (
        SELECT vec_id, cell,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
        FROM d) WHERE rn = 1),
    uv AS (
      SELECT e.vec_id, a.cell,
             list_transform(generate_series(1, 64),
               i -> CAST(e.embedding[i] AS DOUBLE)
                  / sqrt(list_sum(list_transform(generate_series(1, 64),
                      j -> CAST(e.embedding[j] AS DOUBLE) * CAST(e.embedding[j] AS DOUBLE))))) AS u
      FROM embeddings e JOIN assign a USING (vec_id)),
    p AS (
      SELECT x.vec_id AS id_a, y.vec_id AS id_b
      FROM uv x JOIN uv y ON x.cell = y.cell AND x.vec_id < y.vec_id
      WHERE list_sum(list_transform(generate_series(1, 64),
                     i -> x.u[i] * y.u[i])) >= 0.9),
    edges AS (SELECT id_a AS a, id_b AS b FROM p
              UNION SELECT id_b, id_a FROM p),
    reach(n, c) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT e.a, r.c FROM reach r JOIN edges e ON e.b = r.n),
    comp AS (SELECT n AS vec_id, MIN(c) AS component FROM reach GROUP BY n)
    SELECT a.vec_id, a.cell, comp.component, comp.component = a.vec_id AS keep
    FROM assign a JOIN comp USING (vec_id)
    """,
)
def semdedup_embeddings(spark, sf_dir):
    """SemDedup (Abbas et al. 2023): IVF-cell clustering confines the
    quadratic near-dup search inside cells; min-id representative per
    cosine-component survives. Quantizer pinned to the deterministic
    init (``iters=0``) so the oracle reproduces the cell geometry and
    the recursive-CTE transitive closure replays the components; the
    trained-Lloyd + auto-sized path is invariant/pytest-covered."""
    emb = load(spark, sf_dir, "embeddings").to_spark()
    return similarity.semdedup(emb, threshold=0.9, n_cells=8, iters=0)


@query(
    "dedup_against_reference",
    oracle=f"""
    WITH ref AS (SELECT DISTINCT md5({_NORM}) AS d FROM documents WHERE doc_id % 3 = 0)
    SELECT c.doc_id, CAST(length(c.text) AS BIGINT) AS n_chars
    FROM documents c
    WHERE md5({_NORM.replace('text', 'c.text')}) NOT IN (SELECT d FROM ref)
    """,
)
def dedup_against_reference(spark, sf_dir):
    """Incremental snapshot dedup: drop docs whose content already
    exists in the reference shard (every 3rd doc plays the previous
    crawl). One digest anti-join; the reference ships only distinct
    digests."""
    docs = load(spark, sf_dir, "documents").to_spark()
    ref = docs.filter(F.col("doc_id") % 3 == 0)
    out = dedup.dedup_against(docs, ref, "doc_id", "text")
    return out.select("doc_id", F.length("text").cast("bigint").alias("n_chars"))


@query(
    "sample_stratified_deterministic",
    oracle=f"""
    WITH b AS (
        SELECT doc_id, length(text) AS n_chars,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bucket
        FROM documents
    )
    SELECT doc_id, n_chars FROM b
    WHERE (n_chars < 500 AND bucket < 10) OR (n_chars >= 500 AND bucket < 50)
    """,
)
def sample_stratified_deterministic(spark, sf_dir):
    """Deterministic hash-stratified sampling for training mixes:
    md5-bucket each doc id (engine-independent, reproducible across
    runs AND engines — no RNG), then per-stratum keep-rates (10% of
    short docs, 50% of long). One scan, no shuffle, exact same rows
    in Spark and DuckDB."""
    docs = load(spark, sf_dir, "documents").to_spark()
    bucket = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                     16, 10).cast("bigint") % 100)
    out = docs.select("doc_id", F.length("text").alias("n_chars"),
                      bucket.alias("__b__"))
    keep = ((F.col("n_chars") < 500) & (F.col("__b__") < 10)) | \
        ((F.col("n_chars") >= 500) & (F.col("__b__") < 50))
    return out.filter(keep).drop("__b__")

"""Corpus-hygiene round 2: markup stripping, URL/domain stats,
RAG chunking, paragraph-level dedup (operators/text.py).

The synthetic documents are word-soup, so each query first seeds the
structure it exercises (markup, URLs, paragraphs) DETERMINISTICALLY
from doc_id/text on both the engine and oracle side — the driver
compares the processed outputs (same pattern as suite/missing.py's
NULL masking).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from . import load, query

# DuckDB is RE2 (no backreferences), so the oracle strips script/style
# explicitly instead of the engine's `</\1>` backreference — equivalent
# on this input.
_ORACLE_STRIP = """
      trim(regexp_replace(
        replace(replace(replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(t, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
              '(?s)<!--.*?-->', ' ', 'g'),
            '<[^>]+>', ' ', 'g'),
          '&lt;', '<'), '&gt;', '>'), '&amp;', '&'),
        '\\s+', ' ', 'g'))
"""


@query(
    "strip_markup_clean",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             '<html><head><script type="x">var junk = 1 &lt; 2;</script></head>'
             || '<body><!-- c' || CAST(doc_id AS VARCHAR) || ' --><p>'
             || substr(text, 1, 150) || '</p> <b>bold&amp;set</b></body></html>' AS t
      FROM documents)
    SELECT doc_id, md5({_ORACLE_STRIP}) AS clean_md5
    FROM d
    """,
)
def strip_markup_clean(spark, sf_dir):
    """HTML extraction: script/comment/tag removal + entity decode +
    whitespace collapse, all JVM regexp (operators/text.py
    strip_markup) — md5-compared against the oracle's chain."""
    from ..operators.text import strip_markup

    docs = load(spark, sf_dir, "documents").to_spark()
    t = F.concat(
        F.lit('<html><head><script type="x">var junk = 1 &lt; 2;</script></head>'
              '<body><!-- c'), F.col("doc_id").cast("string"), F.lit(" --><p>"),
        F.substring(F.col("text"), 1, 150), F.lit("</p> <b>bold&amp;set</b></body></html>"))
    return docs.select("doc_id", F.md5(strip_markup(t)).alias("clean_md5"))


@query(
    "url_domain_stats",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             substr(text, 1, 60) || ' see https://www.site' || CAST(doc_id % 7 AS VARCHAR)
             || '.example.com/p/' || CAST(doc_id AS VARCHAR)
             || ' and http://cdn' || CAST(doc_id % 3 AS VARCHAR) || '.example.net/x ' AS t
      FROM documents),
    u AS (
      SELECT doc_id, unnest(regexp_extract_all(t, 'https?://[^\\s<>"'')\\]]+')) AS url
      FROM d)
    SELECT lower(regexp_extract(url, 'https?://(?:www\\.)?([^/:\\s]+)', 1)) AS domain,
           CAST(COUNT(*) AS BIGINT) AS n_urls,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
    FROM u
    GROUP BY 1
    """,
)
def url_domain_stats(spark, sf_dir):
    """Domain-level corpus stats: URL extraction (regexp_extract_all) →
    explode → host normalization → hash-agg. The group key is the
    domain — the natural blocklist-join key at 100 TB."""
    from ..operators.text import extract_urls, url_domain

    docs = load(spark, sf_dir, "documents").to_spark()
    t = F.concat(F.substring(F.col("text"), 1, 60),
                 F.lit(" see https://www.site"), (F.col("doc_id") % 7).cast("string"),
                 F.lit(".example.com/p/"), F.col("doc_id").cast("string"),
                 F.lit(" and http://cdn"), (F.col("doc_id") % 3).cast("string"),
                 F.lit(".example.net/x "))
    urls = docs.select("doc_id", F.explode(extract_urls(t)).alias("url"))
    return (urls.select("doc_id", url_domain(F.col("url")).alias("domain"))
            .groupBy("domain")
            .agg(F.count("*").alias("n_urls"),
                 F.countDistinct("doc_id").alias("n_docs")))


@query(
    "chunk_documents_sliding",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             string_split_regex(trim(regexp_replace(text, '\\s+', ' ', 'g')), ' ') AS toks
      FROM documents),
    s AS (
      SELECT doc_id, toks,
             unnest(range(0, greatest(len(toks), 1), 32)) AS chunk_start
      FROM d)
    SELECT doc_id,
           CAST(chunk_start // 32 AS BIGINT) AS chunk_id,
           CAST(least(len(toks) - chunk_start, 40) AS BIGINT) AS chunk_tokens,
           md5(array_to_string(list_slice(toks, chunk_start + 1, chunk_start + 40), ' ')) AS chunk_md5
    FROM s
    WHERE chunk_start = 0 OR len(toks) - chunk_start > 8
    """,
)
def chunk_documents_sliding(spark, sf_dir):
    """RAG sliding-window chunking (chunk=40 tokens, overlap=8): pure
    narrow explode — no shuffle, output ∝ total tokens. A trailing
    window adding fewer than `overlap` new tokens is skipped."""
    from ..operators.text import chunk_documents

    docs = load(spark, sf_dir, "documents").to_spark()
    out = chunk_documents(docs, "doc_id", "text", chunk_size=40, overlap=8)
    return out.select("doc_id", "chunk_id",
                      F.col("chunk_tokens").cast("long").alias("chunk_tokens"),
                      F.md5(F.col("chunk_text")).alias("chunk_md5"))


_SHARED_PARA = "this shared boilerplate paragraph appears in every single document"


@query(
    "dedup_paragraphs_global",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             substr(text, 1, 120) || chr(10) || chr(10) || '{_SHARED_PARA}'
             || chr(10) || chr(10) || substr(text, 121, 120) AS t
      FROM documents),
    p AS (
      SELECT doc_id,
             unnest(string_split(t, chr(10) || chr(10))) AS para,
             generate_subscripts(string_split(t, chr(10) || chr(10)), 1) AS pos
      FROM d),
    k AS (
      SELECT doc_id, pos, para,
             ROW_NUMBER() OVER (PARTITION BY md5(para) ORDER BY doc_id, pos) AS rn
      FROM p)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_paras_kept,
           md5(string_agg(para, chr(10) || chr(10) ORDER BY pos)) AS text_md5
    FROM k
    WHERE rn = 1
    GROUP BY doc_id
    """,
)
def dedup_paragraphs_global(spark, sf_dir):
    """Corpus-level exact paragraph dedup (RefinedWeb/Gopher line-dedup
    analog): every doc is seeded with one shared boilerplate paragraph;
    only its global first occurrence (min doc_id) survives. One shuffle
    on the paragraph digest + one group-back — exact-dedup scale shape."""
    from ..operators.text import dedup_paragraphs

    docs = load(spark, sf_dir, "documents").to_spark()
    t = F.concat(F.substring(F.col("text"), 1, 120), F.lit("\n\n" + _SHARED_PARA + "\n\n"),
                 F.substring(F.col("text"), 121, 120))
    seeded = docs.select("doc_id", t.alias("t"))
    out = dedup_paragraphs(seeded, "doc_id", "t")
    return out.select("doc_id", "n_paras_kept",
                      F.md5(F.col("text_dedup")).alias("text_md5"))


_ESD_SHARED = ("shared pipeline boilerplate sentence that repeats verbatim "
               "across documents for span dedup checks")


@query(
    "dedup_exact_substring",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             substr(text, 1, 160) || ' {_ESD_SHARED} ' || substr(text, 161, 120)
             || CASE WHEN doc_id % 5 = 0 THEN ' {_ESD_SHARED}' ELSE '' END AS t
      FROM documents),
    tok AS (
      SELECT doc_id,
             string_split_regex(trim(regexp_replace(t, '\\s+', ' ', 'g')), ' ') AS toks
      FROM d),
    o AS (
      SELECT doc_id, toks, unnest(range(0, greatest(len(toks) - 7, 0))) AS pos
      FROM tok),
    h AS (
      SELECT doc_id, pos, doc_id * 8589934592 + pos AS k,
             md5(array_to_string(list_slice(toks, pos + 1, pos + 8), ' ')) AS hh
      FROM o),
    dup AS (
      SELECT hh, MIN(k) AS canon FROM h GROUP BY hh HAVING COUNT(*) > 1),
    seeds AS (
      SELECT h.doc_id, h.pos FROM h JOIN dup ON h.hh = dup.hh WHERE h.k <> dup.canon),
    tk AS (
      SELECT doc_id, unnest(toks) AS tokv, generate_subscripts(toks, 1) - 1 AS p
      FROM tok),
    kept AS (
      SELECT tk.doc_id, tk.tokv, tk.p
      FROM tk
      WHERE NOT EXISTS (SELECT 1 FROM seeds s
                        WHERE s.doc_id = tk.doc_id
                          AND tk.p >= s.pos AND tk.p < s.pos + 8))
    SELECT t.doc_id,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           CAST(len(t.toks) - COUNT(k.p) AS BIGINT) AS n_removed,
           md5(coalesce(string_agg(k.tokv, ' ' ORDER BY k.p), '')) AS text_md5
    FROM tok t LEFT JOIN kept k USING (doc_id)
    GROUP BY t.doc_id, len(t.toks)
    """,
)
def dedup_exact_substring(spark, sf_dir):
    """ExactSubstr span dedup (operators/dedup.py
    exact_substring_dedup): every doc is seeded with one shared
    13-token sentence (and every 5th doc with a second copy); only the
    global first occurrence survives — all other copies are cut out of
    the text at original token positions. Two uniform shuffles (gram
    digest, doc id), no all-pairs."""
    from ..operators.dedup import exact_substring_dedup

    docs = load(spark, sf_dir, "documents").to_spark()
    t = F.concat(
        F.substring(F.col("text"), 1, 160), F.lit(" " + _ESD_SHARED + " "),
        F.substring(F.col("text"), 161, 120),
        F.when(F.col("doc_id") % 5 == 0, F.lit(" " + _ESD_SHARED)).otherwise(F.lit("")))
    seeded = docs.select("doc_id", t.alias("t"))
    out = exact_substring_dedup(seeded, "doc_id", "t", min_len=8)
    return out.select("doc_id", "n_tokens", "n_removed",
                      F.md5(F.col("text_dedup")).alias("text_md5"))


@query(
    "temperature_sample_mix",
    oracle="""
    WITH c AS (SELECT source, CAST(COUNT(*) AS DOUBLE) AS n FROM documents GROUP BY source),
    z AS (SELECT SUM(POW(n, 0.7)) AS Z FROM c),
    w AS (SELECT source, n, POW(n, 0.7) / (SELECT Z FROM z) AS q FROM c),
    m AS (SELECT MIN(n / q) AS Np FROM w),
    r AS (SELECT source, LEAST(q * (SELECT Np FROM m) / n, 1.0) AS rate FROM w)
    SELECT d.doc_id, d.source
    FROM documents d JOIN r USING (source)
    WHERE ('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT % 1000000
          < CAST(floor(r.rate * 1000000) AS BIGINT)
    """,
)
def temperature_sample_mix(spark, sf_dir):
    """Temperature-flattened mix MATERIALIZED: per-source keep-rates
    q_g·N'/n_g realized by deterministic md5-bucket acceptance — the
    exact same rows in Spark and DuckDB (no RNG). One O(groups)
    broadcast + one corpus scan."""
    from ..operators.text import temperature_sample

    docs = load(spark, sf_dir, "documents").to_spark()
    out = temperature_sample(docs, "source", "doc_id", alpha=0.7)
    return out.select("doc_id", "source")


# Round 6: training-data plumbing — sharded deterministic shuffle,
# hash split assignment, vocabulary, embedding quantization, and
# quality-aware dedup representatives. All value-level SQL oracles.

_NORM_SQL = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"


@query(
    "shuffle_shards_deterministic",
    oracle="""
    WITH k AS (
      SELECT doc_id,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':7'), 1, 12))::BIGINT AS key
      FROM documents)
    SELECT doc_id,
           CAST(key % 8 AS INT) AS shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY key % 8 ORDER BY key, doc_id)
                AS BIGINT) AS shard_pos
    FROM k
    """,
)
def shuffle_shards_deterministic(spark, sf_dir):
    """Sharded deterministic training shuffle (operators/text.py
    shuffle_shards): (shard, shard_pos) from the 48-bit md5 key alone
    — total, RNG-free permutation; the only shuffle is the window's
    hash partition on shard."""
    from ..operators.text import shuffle_shards

    docs = load(spark, sf_dir, "documents").to_spark()
    out = shuffle_shards(docs, "doc_id", seed=7, n_shards=8)
    return out.select("doc_id", "shard", "shard_pos")


@query(
    "assign_train_splits",
    oracle="""
    SELECT doc_id,
           CASE WHEN b < 900000 THEN 'train'
                WHEN b < 950000 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id,
                 ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':3'), 1, 8))::BIGINT
                 % 1000000 AS b
          FROM documents)
    """,
)
def assign_train_splits(spark, sf_dir):
    """Deterministic hash split assignment (operators/text.py
    assign_splits): cumulative-fraction thresholds over md5 buckets;
    growing the corpus never moves an existing row between splits.
    Zero shuffle."""
    from ..operators.text import assign_splits

    docs = load(spark, sf_dir, "documents").to_spark()
    out = assign_splits(docs, "doc_id",
                        {"train": 0.90, "val": 0.05, "test": 0.05}, seed=3)
    return out.select("doc_id", "split")


@query(
    "vocab_top100",
    oracle=f"""
    WITH norm AS (SELECT {_NORM_SQL} AS t FROM documents),
    tok AS (SELECT unnest(string_split(t, ' ')) AS token FROM norm),
    c AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM tok WHERE token <> '' GROUP BY token)
    SELECT token, cnt,
           CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS vrank
    FROM c ORDER BY vrank LIMIT 100
    """,
)
def vocab_top100(spark, sf_dir):
    """Vocabulary head for tokenizer training (operators/text.py
    vocab_topk): wordcount shuffle + TakeOrderedAndProject top-k —
    the rank window touches only the k survivors."""
    from ..operators.text import vocab_topk

    docs = load(spark, sf_dir, "documents").to_spark()
    return vocab_topk(docs, "text", k=100)


@query(
    "quantize_embeddings_int8",
    oracle="""
    WITH s AS (
      SELECT vec_id,
             CASE WHEN m = 0 THEN 1.0 ELSE m / 127.0 END AS scale
      FROM (SELECT vec_id,
                   list_max(list_transform(embedding,
                            x -> abs(CAST(x AS DOUBLE)))) AS m
            FROM embeddings)),
    q AS (
      SELECT e.vec_id, s.scale,
             list_transform(e.embedding,
                            x -> CAST(round(CAST(x AS DOUBLE) / s.scale) AS INT)) AS qv
      FROM embeddings e JOIN s USING (vec_id))
    SELECT vec_id, ROUND(scale, 6) AS scale,
           CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_l1,
           CAST(list_sum(list_transform(generate_series(1, len(qv)),
                                        i -> qv[i] * i)) AS BIGINT) AS q_wsum
    FROM q
    """,
)
def quantize_embeddings_int8(spark, sf_dir):
    """Symmetric int8 embedding quantization
    (operators/similarity.py quantize_int8): per-vector scale +
    int codes, verified by scale and two deterministic integer
    checksums over the code vector (L1 and position-weighted sum).
    Pure JVM transforms, zero shuffle."""
    from ..operators.similarity import quantize_int8

    emb = load(spark, sf_dir, "embeddings").to_spark()
    q = quantize_int8(emb)
    idx = F.sequence(F.lit(1), F.size(F.col("qvec")))
    return q.select(
        "vec_id",
        F.round(F.col("scale"), 6).alias("scale"),
        F.aggregate(F.col("qvec"), F.lit(0).cast("bigint"),
                    lambda acc, x: acc + F.abs(x).cast("bigint")).alias("q_l1"),
        F.aggregate(F.zip_with(F.col("qvec"), idx,
                               lambda q_, i: q_.cast("bigint") * i.cast("bigint")),
                    F.lit(0).cast("bigint"),
                    lambda acc, x: acc + x).alias("q_wsum"))


@query(
    "dedup_keep_best_quality",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, n_chars, md5({_NORM_SQL}) AS h FROM documents),
    comp AS (
      SELECT doc_id, n_chars, MIN(doc_id) OVER (PARTITION BY h) AS component,
             ROW_NUMBER() OVER (PARTITION BY h ORDER BY n_chars DESC, doc_id) AS rn
      FROM fp)
    SELECT doc_id, component, CAST(n_chars AS BIGINT) AS score, rn = 1 AS keep
    FROM comp
    """,
)
def dedup_keep_best_quality(spark, sf_dir):
    """Quality-aware dedup representative (operators/dedup.py
    keep_best): exact-dup components keep the LONGEST copy (score =
    n_chars, id tiebreak) instead of the min id — what a production
    pipeline actually ships. Components from the md5 digest pairs via
    connected_components; keep_best is one component-partitioned
    window."""
    from ..operators.dedup import connected_components, keep_best, normalize_text

    docs = load(spark, sf_dir, "documents").to_spark()
    fp = docs.select("doc_id", "n_chars",
                     F.md5(normalize_text(F.col("text"))).alias("h"))
    a = fp.select(F.col("h"), F.col("doc_id").alias("id_a"))
    b = fp.select(F.col("h"), F.col("doc_id").alias("id_b"))
    pairs = (a.join(b, "h").filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b"))
    comps = connected_components(pairs, nodes=docs.select("doc_id"),
                                 node_col="doc_id")
    out = keep_best(comps, fp.select("doc_id", F.col("n_chars").alias("score")),
                    node_col="doc_id", score_col="score")
    return out.select("doc_id", "component",
                      F.col("score").cast("bigint").alias("score"), "keep")


@query(
    "ngram_bigram_top50",
    oracle=f"""
    WITH norm AS (SELECT string_split({_NORM_SQL}, ' ') AS w FROM documents),
    g AS (SELECT w[i] || ' ' || w[i + 1] AS gram
          FROM norm CROSS JOIN UNNEST(generate_series(1, greatest(len(w) - 1, 0))) AS t(i)
          WHERE w[1] <> ''),
    c AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS cnt FROM g GROUP BY gram)
    SELECT gram, cnt,
           CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, gram) AS BIGINT) AS grank
    FROM c ORDER BY grank LIMIT 50
    """,
)
def ngram_bigram_top50(spark, sf_dir):
    """Bigram frequency head (operators/text.py ngram_counts): the
    BPE-merge / collocation prep table — explode adjacent token pairs,
    wordcount shuffle, TakeOrderedAndProject top-k, rank over the 50
    survivors."""
    from pyspark.sql import Window as W

    from ..operators.text import ngram_counts

    docs = load(spark, sf_dir, "documents").to_spark()
    top = (ngram_counts(docs, "text", n=2)
           .orderBy(F.col("cnt").desc(), F.col("gram").asc())
           .limit(50))
    w = W.orderBy(F.col("cnt").desc(), F.col("gram").asc())
    return top.withColumn("grank", F.row_number().over(w).cast("bigint"))

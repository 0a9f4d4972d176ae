"""LLM-data-pipeline query-keys (SURVEY.md §7.4) over ``documents``
and ``embeddings``.

Oracle-checked: token counting, quality scoring, lang-id, fingerprint,
exact dedup, n-gram Jaccard near-dup, brute-force cosine top-k, and
multimodal metadata — all expressible in DuckDB SQL. Rows-only:
MinHash-LSH, SimHash, hyperplane-LSH ANN (approximate by design;
their recall is property-tested against the exact operators in
tests/test_llm.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from machine_learning_algorithm_sparkml__spark.functions.vectors import cosine_similarity
from machine_learning_algorithm_sparkml__spark.functions.text import (
    LANG_MARKERS,
    STOPWORDS,
    canonicalize_url,
    doc_fingerprint,
    lang_id,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
    word_token_count,
)
from machine_learning_algorithm_sparkml__spark.operators.dedup import (
    containment_pairs,
    MINHASH_PRIME,
    exact_dedup_representatives,
    exact_substring_pairs,
    incremental_exact_dedup,
    minhash_near_dup_pairs,
    minhash_params,
    ngram_jaccard_pairs,
    passage_dedup,
    simhash_near_dup_pairs,
)
from machine_learning_algorithm_sparkml__spark.operators.multimodal import (
    attach_binary_payload,
    decode_media,
    extract_features,
)
from machine_learning_algorithm_sparkml__spark.operators.simsearch import (
    brute_force_topk,
    embedding_near_dup_pairs,
    hyperplane_lsh_topk,
    portable_ivf_topk,
    portable_ivfpq_topk,
    portable_lsh_topk,
    portable_near_dup_pairs,
    portable_pq_topk,
)
from machine_learning_algorithm_sparkml__spark.sources import load_table


# --- text analysis -------------------------------------------------------------

def q_text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        word_token_count(F.col("text")).cast("int").alias("n_word_tokens"),
        F.length("text").alias("n_chars_computed"),
    )


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        punct_ratio(F.col("text")).alias("punct_ratio"),
        stopword_ratio(F.col("text")).alias("stopword_ratio"),
        quality_score(F.col("text")).alias("quality"),
    )


def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", "lang", lang_id(F.col("text")).alias("lang_pred"))


def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", doc_fingerprint(F.col("text")).alias("fingerprint"))


def q_text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing pass. The synthetic corpus has no PII, so each doc
    gets a deterministic planted suffix (email + IP + phone derived
    from doc_id, mirrored in the oracle SQL) — the redactor must mask
    exactly those spans. Output keeps the redacted text and per-
    category counts."""
    from machine_learning_algorithm_sparkml__spark.functions.redact import (
        pii_counts,
        redact_pii,
    )

    docs = load_table(spark, sf_dir, "documents")
    planted = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.lit(" reach doc"), F.col("doc_id").cast("string"), F.lit("@example.com"),
        F.lit(" from 10.0."), F.pmod(F.col("doc_id"), F.lit(256)).cast("string"), F.lit(".7"),
        F.lit(" call +1 415 555 0199"),
    )
    counts = pii_counts(planted)
    return docs.select(
        "doc_id",
        redact_pii(planted).alias("redacted"),
        counts["email"].alias("n_email"),
        counts["ipv4"].alias("n_ipv4"),
        counts["phone"].alias("n_phone"),
    )


def q_doc_chunk_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window chunking (64 tokens, 16 overlap) — row-local, no
    shuffle. Oracle: range()+list-slice SQL."""
    from machine_learning_algorithm_sparkml__spark.operators.chunking import chunk_fixed

    docs = load_table(spark, sf_dir, "documents")
    return chunk_fixed(docs, "doc_id", "text", chunk_tokens=64, overlap=16)


def q_doc_chunk_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-window chunking via the explode→group reassembly built
    for book-length documents (operators/chunking.chunk_fixed_exploded)
    — identical output contract to ``doc_chunk_fixed`` (same oracle
    SQL), linear per-token work instead of O(tokens²/stride) per doc.
    The long-doc completion property is pinned in tests/test_chunking.py
    with a 100k-token constructed document."""
    from machine_learning_algorithm_sparkml__spark.operators.chunking import (
        chunk_fixed_exploded,
    )

    docs = load_table(spark, sf_dir, "documents")
    return chunk_fixed_exploded(docs, "doc_id", "text", chunk_tokens=64, overlap=16)


def q_doc_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded streaming sequence packing into 256-token context
    windows. Oracle: windowed cumsum SQL with the same shard/div."""
    from machine_learning_algorithm_sparkml__spark.operators.chunking import (
        pack_sequences,
    )

    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs, "doc_id", "text", capacity_tokens=256, num_shards=32)


def q_doc_tokens_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral token view: one row per (doc, position, token) via
    ``posexplode`` — the flattening step feeding vocabulary builds and
    positional n-gram passes. Narrow (no shuffle); output size is the
    corpus token count."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "token")
    )


def q_udtf_token_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF as a lateral table function
    (functions/udtfs.py:TokenRuns): run-length encoding of each
    document's token stream — one-row-to-N-rows logic with per-row
    SEQUENTIAL state (the running merge + run index), the shape a
    plain explode() cannot carry. The call site stays declarative SQL
    (``FROM documents d, LATERAL token_runs(d.text) t``), and the
    Arrow-batched UDTF sees one document at a time with no state
    across rows, so the operator parallelizes like a map. Oracle: the
    declarative equivalent — DuckDB's two-window change-point trick
    (lag-based break flags, running sum as run id) — value-checks the
    whole imperative crossing."""
    from machine_learning_algorithm_sparkml__spark.functions.udtfs import (
        register_udtfs,
    )

    register_udtfs(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT d.doc_id, t.run_idx, t.token, t.run_len
        FROM documents d, LATERAL token_runs(d.text) t
        """
    )


def q_udtf_partition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF with ``terminate()``-state over a TABLE argument
    (functions/udtfs.py:PartitionTokenStats): ``PARTITION BY source``
    routes each source's documents through one UDTF instance, which
    folds count / token-total / max / min-id-argmax imperatively in
    ``eval`` and emits a single per-partition EPILOGUE row from
    ``terminate()`` — the end-of-partition hook a per-row function
    lacks (nothing per-row knows it is last). This is the polymorphic
    table-function shape for per-shard digests and batch manifests;
    the state is an order-independent monoid, so the epilogue is
    deterministic under any intra-partition row order and a plain
    GROUP BY (the DuckDB oracle, min-id argmax via a correlated MIN)
    replays the whole imperative crossing value-exact."""
    from machine_learning_algorithm_sparkml__spark.functions.udtfs import (
        register_udtfs,
    )

    register_udtfs(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        "SELECT * FROM partition_token_stats(TABLE(documents) PARTITION BY source)"
    )


def q_udtf_dynamic_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polymorphic-schema UDTF (functions/udtfs.py:_SplitCols): the
    ``analyze()`` hook computes the output schema from the call's
    constant width argument at PLAN time — ``split_cols(text, 3)``
    resolves to (tok0, tok1, tok2, n_extra) before any data moves.
    Completes the UDTF surface triple: per-row lateral
    (udtf_token_runs), terminate()-epilogue (udtf_partition_stats),
    and schema-as-a-function-of-arguments (this key) — the
    parameterized-splitter shape. Short documents pad with NULLs;
    n_extra counts the overflow, so the projection is lossless enough
    to audit. Oracle: DuckDB list indexing (out-of-range -> NULL)
    over the same split."""
    from machine_learning_algorithm_sparkml__spark.functions.udtfs import (
        register_udtfs,
    )

    register_udtfs(spark)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT d.doc_id, t.tok0, t.tok1, t.tok2, t.n_extra
        FROM documents d, LATERAL split_cols(d.text, 3) t
        """
    )


def q_text_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: top-20 non-stopword terms by frequency.
    explode -> hash-aggregate (map-side combine) -> TakeOrdered; the
    full term frequency table never sorts globally. Ties at the limit
    boundary break by term."""
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(
        F.explode(tokens(F.lower(F.col("text")))).alias("term")
    ).filter(~F.col("term").isin(*STOPWORDS))
    return (
        terms.groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(20)
    )


# BM25 query-term set and parameters for text_bm25 — a fixed lexical
# "probe query" over the synthetic corpus vocabulary. Standard
# Robertson/Sparck-Jones defaults.
_BM25_TERMS = ("spark", "vector", "merge", "stream")
_BM25_K1 = 1.2
_BM25_B = 0.75


def q_text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 lexical scoring of every document against a fixed query
    term set — the lexical-retrieval complement to the ANN keys (a
    decontamination or quality pipeline needs BOTH: embedding
    neighbors miss exact-phrase leaks, lexical scoring misses
    paraphrases). Shape: TWO corpus scans, both pruned to the text
    column — one for the (N, avgdl) stats row (it must see docs that
    match nothing), one carrying doc length through the explode,
    filtered to the |Q|=4 query terms BEFORE the term-frequency
    aggregation so the shuffle carries only matching (doc,term)
    pairs, not the whole posting list. Document frequency is a
    COUNT-over-window partitioned by term on the tf frame — NOT a
    self-join, which would duplicate the whole scan+agg subtree
    (plan-verified: the join form cost a third scan). The stats row
    broadcasts back; per-doc score = sum of per-term BM25 weights.
    At 100 TB: wide exchanges are the pre-filtered (doc_id,term)
    hash-agg, the |matches|-sized term window, and the per-doc sum;
    nothing driver-side. Doubles: IDF and the tf normalization are
    IEEE arithmetic on exact integer inputs, identical both engines;
    the per-doc SUM is ROUNDed (summation-order crutch, ROUND6.md)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", tokens(F.lower(F.col("text"))).alias("t")
    ).select("doc_id", F.size("t").alias("len_d"), F.explode("t").alias("term"))
    tf = (
        toks.filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "len_d", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
    )
    stats = docs.select(tokens(F.lower(F.col("text"))).alias("t")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg(F.size("t")).alias("avgdl")
    )
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    norm = F.col("tf") * (_BM25_K1 + 1.0) / (
        F.col("tf")
        + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * F.col("len_d") / F.col("avgdl"))
    )
    return (
        tf.crossJoin(F.broadcast(stats))
        .withColumn("w", idf * norm)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms_matched"),
            F.round(F.sum("w"), 4).alias("score"),
        )
    )


#: hybrid-retrieval query set: (query_id, its BM25 terms, its query
#: vector's vec_id). Term lists are kept at TWO terms so each
#: (query, doc) BM25 score is a sum of two IEEE doubles — addition is
#: commutative, so the score is bit-identical on any engine and the
#: shortlist boundary needs no rounding crutch.
_HYBRID_QUERIES = (
    (0, ("spark", "stream"), 0),
    (1, ("vector", "merge"), 1),
    (2, ("spark", "vector"), 2),
)


def q_retrieval_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval — the canonical RAG composition the lexical
    and ANN families exist FOR: per query, a BM25 lexical shortlist
    (top-20 by score, doc_id ties) over the query's own term set, then
    an exact rounded-cosine re-rank of the shortlist against the
    query's embedding (top-5). Lexical recall catches exact-phrase
    matches embeddings blur; the embedding re-rank orders them
    semantically.

    Shape at 100 TB: the corpus side is the text_bm25 plan (explode
    pre-filtered to the UNION of all query terms before the term-
    frequency aggregation, df via a window on the tf frame, stats row
    broadcast), the query set broadcasts, and the re-rank touches
    embeddings ONLY for the <= 20*|Q| shortlist survivors (a semi-join
    sized by the shortlist, never a corpus-embedding scan). Determinism:
    two-addend BM25 sums are bit-identical (commutative IEEE add), the
    shortlist orders by (raw score desc, doc_id), and the final rank by
    the shared rounded cosine — DuckDB replays the whole program."""
    return hybrid_retrieval(spark, sf_dir, _HYBRID_QUERIES)


def hybrid_retrieval(
    spark: SparkSession, sf_dir: str, queries: tuple
) -> DataFrame:
    """The hybrid-retrieval program over an arbitrary (query_id,
    term-tuple, vec_id) query set — ``q_retrieval_hybrid`` pins the
    3-query oracle instance; the scale witness passes a 10x set to
    show the re-rank term scales with |Q|*20, not the corpus
    (tools/scale_witness.py, retrieval family)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    all_terms = sorted({t for _, ts, _ in queries for t in ts})
    qterms = spark.createDataFrame(
        [(qid, t) for qid, ts, _ in queries for t in ts],
        "query_id int, term string",
    )
    qvecs = spark.createDataFrame(
        [(qid, vid) for qid, _, vid in queries], "query_id int, vec_id long"
    ).join(emb, "vec_id").select("query_id", F.col("embedding").alias("q_vec"))

    toks = docs.select(
        "doc_id", tokens(F.lower(F.col("text"))).alias("t")
    ).select("doc_id", F.size("t").alias("len_d"), F.explode("t").alias("term"))
    tf = (
        toks.filter(F.col("term").isin(*all_terms))
        .groupBy("doc_id", "len_d", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))
    )
    stats = docs.select(tokens(F.lower(F.col("text"))).alias("t")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg(F.size("t")).alias("avgdl")
    )
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    norm = F.col("tf") * (_BM25_K1 + 1.0) / (
        F.col("tf")
        + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * F.col("len_d") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("w", idf * norm)
        .groupBy("query_id", "doc_id")
        .agg(F.sum("w").alias("bm25_raw"))
    )
    w_lex = Window.partitionBy("query_id").orderBy(F.desc("bm25_raw"), F.asc("doc_id"))
    shortlist = (
        scored.withColumn("lex_rank", F.row_number().over(w_lex).cast("int"))
        .filter(F.col("lex_rank") <= 20)
    )
    reranked = (
        shortlist.join(
            emb.select(F.col("vec_id").alias("doc_id"), F.col("embedding").alias("d_vec")),
            "doc_id",
        )
        .join(F.broadcast(qvecs), "query_id")
        .withColumn("sim", cosine_similarity(F.col("q_vec"), F.col("d_vec")))
    )
    w_sem = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("doc_id"))
    return (
        reranked.withColumn("rank", F.row_number().over(w_sem).cast("int"))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id",
            "doc_id",
            "lex_rank",
            "rank",
            F.round("bm25_raw", 4).alias("bm25"),
            F.round("sim", 6).alias("sim"),
        )
    )


def q_agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-items SKETCH over the corpus vocabulary —
    `approx_top_k`, the mergeable heavy-hitters path. The exact
    sibling `text_top_terms` two-phase-aggregates the FULL term
    histogram before trimming; fine for a 31-word vocabulary, fatal
    when the keys are URLs, hosts, or n-grams with 10^9+ cardinality.
    The sketch tracks a bounded item set per partition (default
    maxItemsTracked=10000), merges associatively map-side, and is
    EXACT whenever true cardinality fits the tracked budget — which
    this corpus's vocabulary does, so the oracle compares the full
    exact histogram value-for-value (k=500 >> |vocab| means nothing
    is trimmed; no tie-at-the-boundary nondeterminism can exist).
    Past the budget the same plan returns guaranteed-error-bounded
    counts. `approx_top_k_accumulate`/`_combine`/`_estimate` are the
    persistable split forms for cross-dataset merging (daily vocab
    sketches -> monthly rollup, no rescan)."""
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("term"))
    return terms.select(
        F.expr("inline(approx_top_k(term, 500))")
    ).select(F.col("item").alias("term"), F.col("count").alias("n"))


def q_corpus_shuffle_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch-level corpus shuffling — the training-order
    step of a data pipeline: every epoch needs a different but
    REPRODUCIBLE total order over the corpus (resumable jobs, exact
    re-runs, no RNG state). Order key = md5(epoch_seed || doc_id), so
    the permutation is a pure function of (epoch, doc_id) on any
    engine.

    The scalable part is HOW the global position is assigned. A bare
    ``row_number() OVER (ORDER BY h)`` collapses to a single window
    partition — one task sorts the entire corpus, the canonical
    100 TB anti-pattern. Instead the hash's first byte buckets rows
    into 256 ranges (uniform by construction), a 256-row histogram
    with an exclusive prefix sum broadcasts back, and the position is
    bucket_offset + row_number within the bucket (window PARTITIONED
    BY bucket — 256-way parallel). Because the bucket is a PREFIX of
    the order key, (bucket, h) ordering equals global h ordering
    exactly. This is range-partitioned total ordering composed from
    relational pieces — the same idea Spark's distributed sort uses,
    kept declarative and oracle-replayable (DuckDB just sorts
    globally and must agree position-for-position). Two epochs emitted
    to show the reshuffle; positions are 1-based per epoch."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    epochs = None
    for ep in (0, 1):
        h = F.md5(F.concat(F.lit(f"epoch{ep}:"), F.col("doc_id").cast("string")))
        e = docs.select(
            F.lit(ep).alias("epoch"),
            "doc_id",
            h.alias("h"),
            F.substring(h, 1, 2).alias("bkt"),
        )
        epochs = e if epochs is None else epochs.unionAll(e)
    hist = (
        epochs.groupBy("epoch", "bkt")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("n").over(
                    Window.partitionBy("epoch")
                    .orderBy("bkt")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("epoch", "bkt", "offset")
    )
    pos = F.col("offset") + F.row_number().over(
        Window.partitionBy("epoch", "bkt").orderBy("h", "doc_id")
    )
    return (
        epochs.join(F.broadcast(hist), ["epoch", "bkt"])
        .select("epoch", "doc_id", pos.cast("bigint").alias("pos"))
    )


def q_doc_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split keyed on the CONTENT
    fingerprint, so byte-identical documents always share a split (no
    leakage through exact copies). Pure projection — no RNG, no
    shuffle; reproducible on any engine."""
    from machine_learning_algorithm_sparkml__spark.functions.text import hash_split_label

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", hash_split_label(doc_fingerprint(F.col("text"))).alias("split")
    )


def q_mixture_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture construction: per-source sampling weights
    applied as a DETERMINISTIC hash gate (keep iff the first 16 bits
    of the content fingerprint fall under the source's integer
    threshold out of 65536). No RNG state — reproducible on any
    engine, stable under re-partitioning, and byte-identical documents
    get identical verdicts everywhere (no leakage through copies).
    Pure projection+filter: one corpus scan, no shuffle. Weights:
    src0-4 keep all (65536), src5-9 half (32768), src10-14 quarter
    (16384), rest ~10% (6553)."""
    docs = load_table(spark, sf_dir, "documents")
    threshold = (
        F.when(F.col("source").isin([f"src{i}" for i in range(5)]), F.lit(65536))
        .when(F.col("source").isin([f"src{i}" for i in range(5, 10)]), F.lit(32768))
        .when(F.col("source").isin([f"src{i}" for i in range(10, 15)]), F.lit(16384))
        .otherwise(F.lit(6553))
    )
    u16 = F.conv(F.substring(doc_fingerprint(F.col("text")), 1, 4), 16, 10).cast("long")
    return docs.filter(u16 < threshold).select("doc_id", "source")


def q_decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: docs with ``doc_id % 97 == 0`` stand
    in for an eval suite; every other doc sharing a word 4-gram with
    them is dropped. Benchmark shingles broadcast; corpus scanned once
    (operators/dedup.py:decontaminate_by_shingle). Output: surviving
    corpus doc_ids."""
    from machine_learning_algorithm_sparkml__spark.operators.dedup import (
        decontaminate_by_shingle,
    )

    docs = load_table(spark, sf_dir, "documents")
    benchmark = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    return decontaminate_by_shingle(corpus, benchmark, "doc_id", "text", n=4).select(
        "doc_id"
    )


def q_decontaminate_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination at MEMORIZATION granularity (VERDICT
    r15 #1): docs with ``doc_id % 19 == 0`` stand in for an eval
    suite; every other doc sharing a VERBATIM 16-token window with
    them is dropped — the eval-set leakage pass a training pipeline
    cannot ship without (the n-gram key catches paraphrase-level
    overlap at 4-gram granularity; this one catches the verbatim
    copies at a strictness short shingles cannot afford). Benchmark
    windows broadcast; the corpus is scanned ONCE and never
    self-joined (operators/dedup.py:decontaminate_exact_substring).
    Output: surviving corpus doc_ids."""
    from machine_learning_algorithm_sparkml__spark.operators.dedup import (
        decontaminate_exact_substring,
    )

    docs = load_table(spark, sf_dir, "documents")
    benchmark = docs.filter(F.col("doc_id") % 19 == 0)
    corpus = docs.filter(F.col("doc_id") % 19 != 0)
    return decontaminate_exact_substring(
        corpus, benchmark, "doc_id", "text", k=16
    ).select("doc_id")


def q_decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARAPHRASE-tolerant decontamination (MinHash LSH between corpus
    and benchmark; operators/dedup.py: decontaminate_by_minhash).
    Oracle-exact since r8: the portable hash family lets DuckDB replay
    the full program including banding (which shapes LSH results, so
    the replay must be bit-exact — it is, see
    _decontaminate_fuzzy_oracle_sql). The benchmark is built as a perturbed
    near-copy of every 50th corpus doc (first token dropped, re-id'd)
    — exactly the lightly-rewritten contamination the exact 4-gram
    path cannot express. ``planted_dropped_ok`` pins TRUE iff every
    perturbed doc's original was dropped. The planted set is
    restricted to docs of ≥200 chars (≈30+ tokens): dropping one token
    from an m-token doc gives 3-gram Jaccard (m-3)/(m-2) — ≥0.96 at
    30 tokens, so the 32-slot estimate clears the 0.8 threshold with
    ~5σ margin, while a 10-token doc sits at 0.875 where estimator
    noise could flip the pinned invariant on regenerated testdata.
    Threshold 0.8 keeps the removal targeted on the self-similar
    word-soup corpus; other corpus docs MAY still legitimately drop —
    the invariant claims recall, not precision."""
    from machine_learning_algorithm_sparkml__spark.operators.dedup import (
        decontaminate_by_minhash,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    planted = (F.col("doc_id") % 50 == 0) & (F.length("text") >= 200)
    benchmark = docs.filter(planted).select(
        (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
        F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
    )
    survivors = decontaminate_by_minhash(
        docs, benchmark, "doc_id", "text", threshold=0.8, hash_family="portable"
    ).select("doc_id").localCheckpoint(eager=True)  # invariant + output read it
    # the planted predicate needs `text` (length filter), which the
    # survivor projection no longer carries — check membership via a
    # semi-join against the (tiny) planted id set instead
    planted_ids = docs.filter(planted).select("doc_id")
    inv = (
        survivors.join(F.broadcast(planted_ids), "doc_id", "left_semi")
        .agg((F.count(F.lit(1)) == 0).alias("planted_dropped_ok"))
    )
    return survivors.crossJoin(F.broadcast(inv))


def q_decontaminate_fuzzy_large(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORPUS-SCALE fuzzy decontamination — the shuffled
    signature-join strategy that lifts the broadcast path's 100k-row
    benchmark refusal (VERDICT r6 missing #1). Oracle-exact since r8:
    DuckDB replays the whole program — benchmark construction
    included — via the portable hash family
    (_decontaminate_fuzzy_large_oracle_sql). The even-id half of
    documents plays the training split; the benchmark side is (a) the
    odd-id half (train-vs-train cross-contamination shape), (b) a
    perturbed near-copy of every 10th even doc ≥240 chars (first token
    dropped, re-id'd — the planted contamination), and (c) ~105k
    synthetic short filler rows that push the benchmark past the
    broadcast cap, forcing the shuffled plan. Two TRUE-pinned
    invariants ride the result: ``planted_dropped_ok`` (every planted
    original was dropped — recall) and ``bench_over_broadcast_cap``
    (the benchmark really exceeded 100k rows, witnessing that this run
    exercised the size class the broadcast path refuses). The
    invariant passes (and the survivor checkpoint they force) are
    self-verify-gated like the ANN recall audits: bench times the
    operator, the driver correctness run and tests keep the verdicts
    ON."""
    from machine_learning_algorithm_sparkml__spark.operators.dedup import (
        decontaminate_by_minhash,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    planted_pred = (F.col("doc_id") % 10 == 0) & (F.length("text") >= 240)
    planted_src = corpus.filter(planted_pred)
    perturbed = planted_src.select(
        (F.col("doc_id") + F.lit(20_000_000)).alias("doc_id"),
        F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
    )
    odd_half = docs.filter(F.col("doc_id") % 2 == 1)
    # filler rows: distinct single-shingle texts — realistic benchmark
    # VOLUME with no similarity to any corpus doc (each contributes one
    # unique 3-gram, so est_jaccard vs any corpus signature is ~0)
    filler = spark.range(105_000).select(
        (F.col("id") + F.lit(30_000_000)).alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat(F.lit("fillxa"), F.col("id")),
            F.concat(F.lit("fillxb"), F.col("id")),
            F.concat(F.lit("fillxc"), F.col("id")),
        ).alias("text"),
    )
    benchmark = odd_half.unionAll(perturbed).unionAll(filler)
    survivors = decontaminate_by_minhash(
        corpus, benchmark, "doc_id", "text", threshold=0.7, strategy="shuffle",
        hash_family="portable",
    ).select("doc_id")
    if not self_verify_enabled():
        return survivors.withColumn(
            "planted_dropped_ok", F.lit(None).cast("boolean")
        ).withColumn("bench_over_broadcast_cap", F.lit(None).cast("boolean"))
    survivors = survivors.localCheckpoint(eager=True)  # invariant + output read it
    planted_ids = planted_src.select("doc_id")
    inv_recall = survivors.join(
        F.broadcast(planted_ids), "doc_id", "left_semi"
    ).agg((F.count(F.lit(1)) == 0).alias("planted_dropped_ok"))
    inv_size = benchmark.agg(
        (F.count(F.lit(1)) > 100_000).alias("bench_over_broadcast_cap")
    )
    return survivors.crossJoin(F.broadcast(inv_recall)).crossJoin(F.broadcast(inv_size))


# --- dedup ----------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return exact_dedup_representatives(docs.select("doc_id", "text"), ["text"], "doc_id")


def q_dedup_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup — the step a crawl pipeline runs
    BEFORE any content fetch or text dedup: the same resource arrives
    under many spellings (case-shifted scheme/host, explicit default
    port, fragment, trailing slash, permuted query params), and
    exact-dedup on the raw string silently under-merges. The fixture
    derives four messy spellings per doc from (doc_id, source) —
    variants 0/1/2 canonicalize to the SAME https URL, variant 3 to
    its http twin (scheme is semantic: it must NOT merge) — then
    ``functions/text.canonicalize_url`` (pure shuffle-free regexp/
    array projection) normalizes and one groupBy keeps the min-id
    representative per canonical URL with its variant count. The
    DuckDB oracle replays construction AND canonicalization literally
    (all string ops, no floats)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    pid = (F.col("doc_id") % 50).cast("string")
    v = F.col("doc_id") % 4
    url = (
        F.when(v == 0, F.concat(F.lit("https://www."), F.col("source"), F.lit(".example.com/docs/"), pid, F.lit("?b=2&a=1")))
        .when(v == 1, F.concat(F.lit("HTTPS://WWW."), F.upper(F.col("source")), F.lit(".EXAMPLE.COM:443/docs/"), pid, F.lit("?a=1&b=2#ref")))
        .when(v == 2, F.concat(F.lit("https://www."), F.col("source"), F.lit(".example.com/docs/"), pid, F.lit("/?a=1&b=2")))
        .otherwise(F.concat(F.lit("http://www."), F.col("source"), F.lit(".example.com:80/docs/"), pid, F.lit("?a=1&b=2")))
    )
    canon = docs.select("doc_id", canonicalize_url(url).alias("canonical_url"))
    return canon.groupBy("canonical_url").agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_variants"),
    )


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric (containment) near-dup pairs — the subset-duplication
    detector symmetric dedup misses: every 97th sufficiently-long doc
    is re-planted (id+20M) as its own FIRST HALF, giving containment
    1.0 toward its original while Jaccard sits near 0.5 (below every
    Jaccard key's threshold — the planted pairs are EXACTLY the ones
    `dedup_ngram_jaccard` cannot see). Candidate generation is exact
    prefix filtering (operators/dedup.py:containment_pairs — recall
    1.0 by pigeonhole, unlike MinHash banding), so the DuckDB oracle
    verifies against TRUE all-pairs containment with no candidate
    replay; the threshold compare is integer-exact (10·common ≥
    9·|src|) on both sides."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens(F.col("text"))
    planted = docs.filter((F.col("doc_id") % 97 == 0) & (F.size(toks) >= 8)).select(
        (F.col("doc_id") + F.lit(20_000_000)).alias("doc_id"),
        F.array_join(F.slice(toks, 1, (F.size(toks) / 2).cast("int")), " ").alias("text"),
    )
    corpus = docs.unionByName(planted)
    return containment_pairs(corpus, "doc_id", "text", n=3, threshold=0.9)


def q_dedup_exact_substring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplication at 16-token granularity (VERDICT
    r14 #4) — the complementary pass to the MinHash/containment keys:
    pairs of documents sharing at least one VERBATIM 16-token run,
    with the count of shared runs. The testdata's planted near-dups
    carry long verbatim spans, so the result is non-empty at both SFs
    without fixture planting. Candidates come from xxhash64 window
    buckets (8 bytes across the shuffle), verification re-joins the
    window TEXT for candidate pairs only — a hash collision can never
    inflate the count, so DuckDB verifies against the TRUE shared-
    window count directly
    (operators/dedup.py:exact_substring_pairs)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # no ORDER BY: the driver compare canonicalizes row order, and a
    # global sort exchange on the pair frame is pure waste at scale
    return exact_substring_pairs(docs, "doc_id", "text", k=16)


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-ingest exact dedup: docs with ``doc_id % 3 == 0`` play
    the new batch, the rest the already-ingested corpus; a batch doc
    survives iff its text is new to the corpus, keeping the min-id
    representative of in-batch copies. Output drops ``text`` (at
    100 TB the surviving-id list is the deliverable; the text rejoin
    is a follow-up keyed join if needed)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    batch = docs.filter(F.col("doc_id") % 3 == 0)
    existing = docs.filter(F.col("doc_id") % 3 != 0)
    return incremental_exact_dedup(existing, batch, ["text"], "doc_id").select(
        "doc_id", "n_copies"
    )


def q_dedup_passage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-granularity exact dedup (the C4/RefinedWeb line-dedup
    pattern at 32-token windows): a passage repeated anywhere in the
    corpus survives only at its first (doc_id, position) occurrence;
    every doc reports kept/dropped counts and the md5 of its rebuilt
    text. On this corpus the repeated passages are exactly the planted
    exact-duplicate documents, so later copies rebuild to md5('')."""
    docs = load_table(spark, sf_dir, "documents")
    return passage_dedup(docs, "doc_id", "text", passage_tokens=32)


# Hot-shingle doc-frequency cap for every wired Jaccard key: a shingle
# shared by more docs than this carries no dedup signal and makes the
# shingle self-join O(df^2) in that shingle — on a skewed corpus (one
# boilerplate sentence everywhere) the uncapped join detonates at scale
# (VERDICT r1 "What's wrong" #2). The cap is mirrored verbatim in the
# oracle SQL, so the VERIFIED semantics equal the scale-safe semantics.
_SHINGLE_DF_CAP = 100


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5,
        max_shingle_doc_freq=_SHINGLE_DF_CAP,
    )


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-exact since r8: the key runs the PORTABLE hash family
    (md5 -> 60-bit int reduced mod 2^31-1, then (a*x+b) mod 2^31-1
    slots in exact 64-bit longs; band buckets
    via md5 of the '|'-joined slice), which DuckDB replays
    bit-identically with BIGINT arithmetic — so the full
    signature -> banding -> candidate -> estimate program is
    value-checked, not just recall-bounded. The xxhash64 family
    remains the operator default / fast path; recall vs exact Jaccard
    is still asserted for it in tests."""
    docs = load_table(spark, sf_dir, "documents")
    return minhash_near_dup_pairs(
        docs, "doc_id", "text", threshold=0.5, hash_family="portable"
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-exact since r8 via the portable (md5-derived) token
    bits: banding is cost-only — pigeonhole recall is total and the
    Hamming verify exact, so the result set is precisely "all pairs
    with hamming <= 8", which DuckDB checks with bit-packed
    bit_count(xor) over an all-pairs join (fine at oracle scale;
    Spark side keeps the banded join for real scale)."""
    docs = load_table(spark, sf_dir, "documents")
    return simhash_near_dup_pairs(
        docs, "doc_id", "text", max_hamming=8, hash_family="portable"
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: exact-Jaccard pairs -> connected components
    -> every clustered doc labeled with its component (min doc_id
    reachable). Oracle: the same pair SQL + a recursive CTE."""
    from machine_learning_algorithm_sparkml__spark.operators.graph import (
        connected_components,
    )

    docs = load_table(spark, sf_dir, "documents")
    # materialize the expensive similarity self-join ONCE: it feeds the
    # edge list, both legs of the members union, and round 1
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5,
        max_shingle_doc_freq=_SHINGLE_DF_CAP,
    ).localCheckpoint(eager=True)
    members = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .unionAll(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    return connected_components(members, pairs, id_col="doc_id").select(
        F.col("id").alias("doc_id"), "component"
    )


def q_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: near-duplicate CLUSTERS are
    the assignment unit, so near-copies can never straddle train and
    test (the standard eval-hygiene failure `doc_hash_split` only
    prevents for byte-identical docs). Program: exact-Jaccard pairs ->
    connected components -> group_id = component (min reachable
    doc_id) for clustered docs, own doc_id otherwise -> md5-bucket
    split of the GROUP id (engine-neutral; same 12/2/2 hex-bucket rule
    as `doc_hash_split`). At 100 TB the extra cost over a plain hash
    split is exactly the dedup-pairs program the pipeline runs anyway
    — the split reuses those edges, adding one left join and a
    projection."""
    from machine_learning_algorithm_sparkml__spark.functions.text import (
        hash_split_label,
    )
    from machine_learning_algorithm_sparkml__spark.operators.graph import (
        connected_components,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5,
        max_shingle_doc_freq=_SHINGLE_DF_CAP,
    ).localCheckpoint(eager=True)
    members = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .unionAll(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    comp = connected_components(members, pairs, id_col="doc_id").select(
        F.col("id").alias("doc_id"), "component"
    )
    group = F.coalesce("component", F.col("doc_id"))
    return (
        docs.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            group.cast("bigint").alias("group_id"),
            hash_split_label(group).alias("split"),
        )
    )


def q_text_zscore_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language z-score of document length as a built-in window
    plan: AVG/STDDEV_SAMP over ``lang``, all JVM-side. The earlier
    grouped-map ``applyInPandas`` version (kept as a pattern demo in
    tests/test_llm.py) materialized each language's ENTIRE partition
    as one pandas frame in one Python worker — at 100 TB the dominant
    language is terabytes, so the unbounded group OOMs; the window
    form streams with bounded state and stays inside codegen
    (VERDICT r6 "What's wrong" #1). Oracle: the same window SQL."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    w = Window.partitionBy("lang")
    mu = F.avg("n_chars").over(w)
    sigma = F.stddev_samp("n_chars").over(w)
    return docs.select(
        "doc_id",
        "lang",
        "n_chars",
        F.when(sigma.isNull() | (sigma == 0), F.lit(0.0))
        .otherwise(F.round((F.col("n_chars") - mu) / sigma, 6))
        .alias("z_chars"),
    )


def q_dedup_pipeline_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite dedup pipeline a training-data run executes:
    exact dedup (fingerprint) -> near-dup clusters (Jaccard +
    components) -> keep ONE representative per cluster (min doc_id)
    plus all unclustered docs. Output: surviving doc_ids. Oracle:
    the same program in SQL (fingerprint group-min + recursive CTE)."""
    from machine_learning_algorithm_sparkml__spark.operators.graph import (
        connected_components,
    )

    docs = load_table(spark, sf_dir, "documents")
    # exact phase: keep min doc_id per normalized fingerprint
    exact_kept = (
        docs.select("doc_id", doc_fingerprint(F.col("text")).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    survivors = docs.join(exact_kept, "doc_id").select("doc_id", "text")
    # near-dup phase over the exact survivors
    pairs = ngram_jaccard_pairs(
        survivors, "doc_id", "text", n=3, threshold=0.5,
        max_shingle_doc_freq=_SHINGLE_DF_CAP,
    ).localCheckpoint(eager=True)
    members = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .unionAll(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    components = connected_components(members, pairs, id_col="doc_id")
    representatives = components.groupBy("component").agg(F.min("id").alias("doc_id"))
    clustered = members.select("doc_id")
    unclustered = survivors.select("doc_id").exceptAll(clustered)
    return unclustered.unionAll(representatives.select("doc_id"))


def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware near-dup representative selection: real corpus
    pipelines keep the HIGHEST-quality member of each duplicate
    cluster, not the lowest id (min-id keeps whatever was crawled
    first; quality-argmax keeps the cleanest copy). One row per
    cluster: (component, kept_doc_id, kept_quality, n_members).
    Oracle: pair SQL + recursive-CTE components + the bit-identical
    quality expression + the same rank window.

    Scale shape: the per-cluster argmax is a rank-then-filter window
    over CLUSTER MEMBERS only (bounded by duplicate density, not
    corpus size), so `InferWindowGroupLimit` truncates to one row per
    component before the exchange; the quality scorer joins in by
    doc_id AFTER clustering, so only clustered docs are scored here.
    Ties (bit-equal quality) break to min doc_id — deterministic on
    any engine."""
    from pyspark.sql import Window

    from machine_learning_algorithm_sparkml__spark.operators.graph import (
        connected_components,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5,
        max_shingle_doc_freq=_SHINGLE_DF_CAP,
    ).localCheckpoint(eager=True)
    members = (
        pairs.select(F.col("id_a").alias("doc_id"))
        .unionAll(pairs.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    comps = connected_components(members, pairs, id_col="doc_id").select(
        F.col("id").alias("doc_id"), "component"
    )
    scored = docs.select("doc_id", quality_score(F.col("text")).alias("q"))
    m = comps.join(scored, "doc_id")
    w = Window.partitionBy("component").orderBy(F.col("q").desc(), F.col("doc_id").asc())
    best = (
        m.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "component",
            F.col("doc_id").alias("kept_doc_id"),
            F.col("q").alias("kept_quality"),
        )
    )
    counts = comps.groupBy("component").agg(F.count(F.lit(1)).alias("n_members"))
    return best.join(counts, "component")


def q_text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality gate: keep documents whose quality score is
    >= their language's median — the relative-threshold filter pass of
    a corpus pipeline. Oracle: quantile_cont window SQL.

    Scale shape: the per-lang median is a tiny groupBy aggregate
    (|langs| rows) broadcast-joined back, NOT a Window.partitionBy(lang)
    — lang has ~5 distinct values, so a window would sort five
    corpus-sized partitions at 100 TB. The scored projection is
    localCheckpoint'ed so the full-text regex scoring runs ONCE: the
    median aggregate and the gated join both read the materialized
    (doc_id, lang, q) rows (~20 B/row) instead of re-scoring kilobytes
    of text per document on each side."""
    docs = load_table(spark, sf_dir, "documents")

    scored = docs.select(
        "doc_id", "lang", quality_score(F.col("text")).alias("q")
    ).localCheckpoint(eager=True)
    medians = scored.groupBy("lang").agg(
        F.expr("percentile(q, 0.5)").alias("lang_median")
    )
    gated = scored.join(F.broadcast(medians), "lang")
    return gated.filter(F.col("q") >= F.col("lang_median")).select("doc_id", "lang", "q")


def self_verify_enabled() -> bool:
    """In-query self-verification toggle (default ON).

    Rows-only keys carry TRUE-pinned verdict columns (``recall_ok``,
    ``frames_ok``) so the driver's rows-only check still records a
    readable verdict — but the truth pass behind those columns is NOT
    part of the operator a user would run (r5 benched
    ``simsearch_lsh`` at 6.2 s of which ~4.4 s was the brute-force
    truth scan). bench.py sets ``SPARK_GRAFT_SELF_VERIFY=0`` so BENCH
    measures the bare operator; the driver's correctness run and the
    pytest recall-floor tests keep the default and pin the invariant.
    When disabled the verdict columns stay in the schema as NULL
    booleans (honest "not checked", stable schema)."""
    return os.environ.get("SPARK_GRAFT_SELF_VERIFY", "1") != "0"


# Keys whose in-query invariant is gated by self_verify_enabled();
# bench.py records this list so BENCH_FULL says which timings exclude
# a truth pass that the correctness run still executes.
SELF_VERIFIED_KEYS = [
    "dedup_minhash_mllib",
    "decontaminate_fuzzy_large",
    "simsearch_lsh",
    "simsearch_ivf",
    "simsearch_brp",
    "simsearch_pq",
    "simsearch_ivfpq",
    "multimodal_frames",
]


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing — payload split into 4 deterministic
    byte windows, one row per frame. Oracle-exact since r8: the
    windows are pure byte arithmetic over the utf-8 payload length
    (width = trunc(greatest(n/4, 1)); frame i carries
    clamp(n - i*width, 0, width) bytes), which DuckDB replays from
    octet_length(encode(text)). ``frames_ok`` remains a TRUE-pinned
    invariant (every document emitted exactly 4 frames)."""
    from machine_learning_algorithm_sparkml__spark.operators.multimodal import frame_sample

    docs = load_table(spark, sf_dir, "documents")
    wrapped = attach_binary_payload(docs, "doc_id", "text", mime="text/plain;fake")
    frames = frame_sample(wrapped, n_frames=4)
    out = frames.select("doc_id", "frame_idx", F.octet_length("frame_bytes").alias("n_bytes"))
    if not self_verify_enabled():
        return out.withColumn("frames_ok", F.lit(None).cast("boolean"))
    bad_docs = (
        out.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") != 4)
    )
    inv = bad_docs.agg((F.count(F.lit(1)) == 0).alias("frames_ok"))
    return out.crossJoin(F.broadcast(inv))


# --- similarity search ------------------------------------------------------------

def _query_vectors(emb: DataFrame) -> DataFrame:
    return emb.filter(F.col("vec_id") < 10)


def _with_recall_invariant(result: DataFrame, truth, floor: float) -> DataFrame:
    """Append a broadcast single-row ``recall_ok`` column: TRUE iff the
    approximate result recovers >= ``floor`` of the exact top-k
    (query_id, neighbor_id) pairs. Rows-only driver checks can't see
    values, so each ANN key carries its own planted verdict (the
    ``semantic_dedup`` pattern). The truth side is a 10-query
    broadcast brute-force pass — O(corpus) with no shuffle.

    ``truth`` is a zero-arg thunk so the brute-force pass is never even
    planned when self-verification is off (bench mode) — the benched
    plan is exactly the operator, with ``recall_ok`` NULL."""
    if not self_verify_enabled():
        return result.withColumn("recall_ok", F.lit(None).cast("boolean"))
    truth = truth()
    result = result.localCheckpoint(eager=True)  # invariant + output both read it
    hits = result.join(
        truth.select("query_id", "neighbor_id"), ["query_id", "neighbor_id"], "left_semi"
    )
    inv = (
        hits.agg(F.count(F.lit(1)).alias("n_hit"))
        .crossJoin(truth.agg(F.count(F.lit(1)).alias("n_truth")))
        .select(
            F.when(F.col("n_truth") == 0, F.lit(True))
            .otherwise((F.col("n_hit") / F.col("n_truth")) >= floor)
            .alias("recall_ok")
        )
    )
    return result.crossJoin(F.broadcast(inv))


def q_simsearch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return brute_force_topk(emb, _query_vectors(emb), k=5)


def q_simsearch_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: approximate by design. ``recall_ok`` pins recall
    >= 0.7 vs brute force (floor matches tests/test_llm.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    approx = hyperplane_lsh_topk(emb, _query_vectors(emb), k=5)
    truth = lambda: brute_force_topk(emb, _query_vectors(emb), k=5)
    return _with_recall_invariant(approx, truth, floor=0.7)


def q_simsearch_lsh_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-BACKED ANN (VERDICT r9 #4): the LSH pipeline with every
    stage in engine-neutral arithmetic — md5-seeded integer planes
    over floor-quantized vectors (exact int64 dots decide buckets),
    Hamming-1 multi-probe, exact rounded-cosine rerank — so DuckDB
    replays bucket assignment AND the final top-k value-exactly
    (operators/simsearch.py:portable_lsh_topk). The rows-only
    ``simsearch_lsh`` keeps its recall-invariant contract; this
    sibling upgrades the evidence class to hash-exact, the same
    playbook that converted the sampling trio in r9. T=12 tables x
    8 bits with 1-bit probes measured 0.82 mean recall probing ~37%
    of the (LSH-adversarial uniform-random) corpus at sf0.01."""
    emb = load_table(spark, sf_dir, "embeddings")
    return portable_lsh_topk(
        emb, _query_vectors(emb), k=5, num_planes=8, num_tables=12
    )


def q_simsearch_ivf_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The second oracle-backed ANN family (after the LSH sibling):
    IVF with md5-ranked sampled centroids and exact int64 distance
    assignment/probing — DuckDB replays centroid choice, every cell
    assignment, the probe lists, and the rounded-cosine rerank
    (operators/simsearch.py:portable_ivf_topk). Measured at sf0.01:
    recall 0.76 probing 16 of 32 cells (~49% of the uniform-random
    corpus) — sampled centroids trade recall-per-probe vs the fitted
    KMeans of rows-only `simsearch_ivf`, buying exact replayability;
    both keys keep the identical bucketed-join plan."""
    emb = load_table(spark, sf_dir, "embeddings")
    return portable_ivf_topk(
        emb, _query_vectors(emb), k=5, num_centroids=32, n_probe=16
    )


def q_simsearch_pq_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The third oracle-backed ANN family (after the LSH and IVF
    siblings): product quantization with md5-ranked sampled codeword
    sources, per-subspace exact int64 encode/ADC, and the shared
    rounded-cosine rerank — DuckDB replays codebook choice, every
    code, the ADC shortlist, and the final top-k value-exactly
    (operators/simsearch.py:portable_pq_topk). Measured at sf0.01:
    recall 0.92 at m=16/ks=16/shortlist 20xk vs the rows-only
    `simsearch_pq`'s 0.94-1.0 with fitted float codebooks — sampled
    codewords trade quantization tightness for replayability; the
    compressed-code scan shape (8-byte codes across the exchange, full
    vectors only for the S survivors per query) is identical."""
    emb = load_table(spark, sf_dir, "embeddings")
    return portable_pq_topk(
        emb, _query_vectors(emb), k=5, m=16, ks=16, shortlist_factor=20
    )


def q_simsearch_ivfpq_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The portable-ANN capstone: IVF+PQ (IVFADC) with both quantizers
    from the proven md5-sampled recipes — coarse cells reuse the
    `ivfc` centroid ranking (C=16 prefix), codes reuse the `pqc`
    codebooks — and the ADC shortlist masked per query to its probed
    cells, all in exact int64
    (operators/simsearch.py:portable_ivfpq_topk). DuckDB replays the
    ENTIRE composed program. Measured recall at sf0.01: 0.64 probing
    8 of 16 cells (~50% of the uniform-random corpus — the same probed
    fraction/recall trade the portable IVF key documents; fitted-
    KMeans `simsearch_ivfpq` reads 0.6+ at 6/16). With this key every
    ANN family (LSH, IVF, PQ, IVF+PQ) has an oracle-backed sibling."""
    emb = load_table(spark, sf_dir, "embeddings")
    return portable_ivfpq_topk(
        emb, _query_vectors(emb), k=5, num_centroids=16, n_probe=8, m=16, ks=16,
        shortlist_factor=20,
    )


def q_simsearch_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: KMeans-quantized inverted-file ANN. ``recall_ok``
    pins recall >= 0.6 vs brute force (n_probe=6 of 16 cells probes
    ~38% of the space; measured recall is well above the floor)."""
    from machine_learning_algorithm_sparkml__spark.operators.simsearch import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    approx = ivf_topk(emb, _query_vectors(emb), k=5, num_centroids=16, n_probe=6)
    truth = lambda: brute_force_topk(emb, _query_vectors(emb), k=5)
    return _with_recall_invariant(approx, truth, floor=0.6)


def q_simsearch_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: product-quantization ANN (compressed-code shortlist +
    exact re-rank; operators/simsearch.pq_topk). ``recall_ok`` pins
    recall >= 0.7 vs brute force — measured 0.94-1.0 on the
    uniform-random (PQ-adversarial) testdata at the m=16/ks=16/
    shortlist 20x defaults."""
    from machine_learning_algorithm_sparkml__spark.operators.simsearch import pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    approx = pq_topk(emb, _query_vectors(emb), k=5)
    truth = lambda: brute_force_topk(emb, _query_vectors(emb), k=5)
    return _with_recall_invariant(approx, truth, floor=0.7)


def q_simsearch_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: IVF+PQ composed ANN (coarse cells prune candidates,
    PQ codes compress the scan, exact cosine re-rank;
    operators/simsearch.ivfpq_topk). ``recall_ok`` pins recall >= 0.6
    vs brute force — the IVF floor (n_probe=6 of 16 cells) composed
    with PQ's measured-near-1.0 shortlist recall."""
    from machine_learning_algorithm_sparkml__spark.operators.simsearch import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    approx = ivfpq_topk(
        emb, _query_vectors(emb), k=5, num_centroids=16, n_probe=6
    )
    truth = lambda: brute_force_topk(emb, _query_vectors(emb), k=5)
    return _with_recall_invariant(approx, truth, floor=0.6)


def q_simsearch_brp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: MLlib BucketedRandomProjectionLSH euclidean ANN.
    ``recall_ok`` pins recall >= 0.75 vs cosine brute force (8 hash
    tables; the 2-table floor in tests is already 0.75)."""
    from machine_learning_algorithm_sparkml__spark.ml.text_features import brp_lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    approx = brp_lsh_topk(emb, _query_vectors(emb), k=5)
    truth = lambda: brute_force_topk(emb, _query_vectors(emb), k=5)
    return _with_recall_invariant(approx, truth, floor=0.75)


def q_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: bucketed near-dup pairs over the embedding set with
    planted duplicates. The synthetic embeddings are uniform-random
    (no natural near-dups at threshold 0.9 — top-5 cosine ~0.32), so a
    0-row result carries no signal; instead every vec_id divisible by
    100 is re-inserted under id+10_000_000 and the operator must find
    exactly those pairs at sim 1.0 — a deterministic non-empty result
    the driver's rows-only check can anchor on."""
    emb = load_table(spark, sf_dir, "embeddings")
    planted = emb.filter(F.col("vec_id") % 100 == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(10_000_000)
    )
    corpus = emb.unionByName(planted)
    return embedding_near_dup_pairs(
        corpus, id_col="vec_id", vec_col="embedding", threshold=0.9
    )


def q_embedding_neardup_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-BACKED near-dup pair search (VERDICT r12 #3 — the last
    ANN-family key without an oracle-backed twin): the same planted-
    duplicate corpus as the rows-only ``embedding_neardup``, with
    bucket assignment in engine-neutral exact integer arithmetic
    (md5-seeded planes over floor-quantized vectors,
    operators/simsearch.py:portable_near_dup_pairs), so DuckDB replays
    the banding AND every verified pair value-exactly. Identical
    vectors collide in every table by construction — planted-pair
    recall is 1.0 regardless of banding — and at threshold 0.9 the
    uniform-random corpus (top natural cosine ~0.32) contributes no
    boundary-risk pairs."""
    emb = load_table(spark, sf_dir, "embeddings")
    planted = emb.filter(F.col("vec_id") % 100 == 0).withColumn(
        "vec_id", F.col("vec_id") + F.lit(10_000_000)
    )
    corpus = emb.unionByName(planted)
    return portable_near_dup_pairs(
        corpus, id_col="vec_id", vec_col="embedding", threshold=0.9
    )


# --- multimodal -----------------------------------------------------------------

def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload + metadata struct, flattened for comparison."""
    docs = load_table(spark, sf_dir, "documents")
    wrapped = attach_binary_payload(docs, "doc_id", "text", mime="text/plain;fake")
    return wrapped.select(
        "doc_id",
        F.col("media_meta.mime").alias("mime"),
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.sha256").alias("sha256"),
    )


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: Arrow-batched mapInPandas decode (stubbed codec)."""
    docs = load_table(spark, sf_dir, "documents")
    wrapped = attach_binary_payload(docs, "doc_id", "text", mime="text/plain;fake")
    return decode_media(wrapped)


def q_multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-BACKED REAL image decode (VERDICT r12 #4): every document
    row becomes a REAL 24-bit uncompressed BMP (header + bottom-up
    padded pixel rows, built executor-side from portable-md5 pixel
    bytes — operators/multimodal.py:make_bmp), and a pure-struct/numpy
    parser decodes it back (decode_bmp: magic check, data-offset from
    the file header, stride/padding strip, bottom-up flip). The decoded
    (width, height, pixel_sum) projection is DuckDB-replayable because
    the pixel fixture is the portable hash family — the oracle
    regenerates the bytes the DECODER must recover, so a parser bug
    (wrong stride, unflipped rows, padding counted into the sum) is a
    value mismatch, not a silent pass. Widths 5-8 sweep all four BMP
    row-padding classes."""
    from machine_learning_algorithm_sparkml__spark.operators.multimodal import (
        decode_bmp_media,
        encode_bmp_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_bmp_media(encode_bmp_media(docs))


def q_multimodal_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-BACKED REAL audio decode — the WAV sibling of
    ``multimodal_decode_real``: every document row becomes a REAL mono
    16-bit PCM WAV (RIFF container with fmt, an odd-length comment
    chunk, and data chunks — operators/multimodal.py:make_wav), and
    the pure-struct/numpy parser decodes it back by WALKING the chunk
    list (arbitrary order, unknown chunks, odd-size pad bytes — the
    parts of RIFF a fixed-offset reader gets wrong). Samples are the
    portable-md5 fixture, so DuckDB regenerates the signal the decoder
    must recover; a chunk-walk bug (pad byte missed, comment bytes
    read as samples) is a value mismatch."""
    from machine_learning_algorithm_sparkml__spark.operators.multimodal import (
        decode_wav_media,
        encode_wav_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_wav_media(encode_wav_media(docs))


def q_multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-BACKED REAL **compressed**-format decode — the first
    codec key whose payload is not raw bytes under a header: every
    document row becomes a REAL 8-bit truecolor PNG (signature, CRC'd
    chunks, tEXt ancillary chunk, DEFLATE-compressed scanlines split
    across two IDAT chunks — operators/multimodal.py:make_png), and
    the pure stdlib-zlib/numpy parser decodes it back (chunk walk with
    CRC verify, multi-IDAT inflate, and ALL FIVE scanline filter
    reconstructions — the fixture cycles None/Sub/Up/Average/Paeth per
    row, so a filter bug in any of the five is a value mismatch).
    Pixels are the portable-md5 family, so DuckDB regenerates the
    bytes the decoder must recover through compression + filtering.
    Closes most of the r12 "compressed codecs env-blocked" caveat:
    PNG's codec (DEFLATE) ships in the Python standard library."""
    from machine_learning_algorithm_sparkml__spark.operators.multimodal import (
        decode_png_media,
        encode_png_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_png_media(encode_png_media(docs))


def q_multimodal_png8_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-BACKED PALETTE-PNG decode — the other common web PNG
    layout (color type 3), and the part the truecolor key doesn't
    exercise: the PLTE chunk parse, index scanlines filtered at bpp=1
    (left-neighbor offsets shrink from 3 to 1 — a decoder that
    hardwires bpp=3 reconstructs garbage), palette-bounds validation,
    and the index→RGB expansion. The fixture palette is the closed
    form entry i = (i, 255-i, 7i mod 256), so a decoded pixel's RGB
    sum is 255 + (7·idx mod 256) and DuckDB replays pixel_sum without
    materializing the table; indices are the portable-md5 family.
    Same decoder entry point (decode_png dispatches on the declared
    color type), same spread-exchange two-kernel plan shape."""
    from machine_learning_algorithm_sparkml__spark.operators.multimodal import (
        decode_png_media,
        encode_png8_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_png_media(encode_png8_media(docs))


def q_multimodal_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-BACKED REAL GIF decode — the third real image codec, and
    the one whose compression algorithm is implemented FROM SCRATCH
    (LZW: dictionary growth, code-width boundaries, CLEAR resets, the
    KwKwK corner — operators/multimodal.py:_lzw_compress/_decompress;
    no library involved at all, unlike PNG's stdlib zlib). Every
    document row becomes a real GIF89a (CRC-free container: screen
    descriptor, grayscale global color table, a comment extension the
    decoder must sub-block-skip, multi-sub-block image data), decoded
    back by the chunk-walking parser. The decoder is ALSO validated
    against a public hand-crafted 1x1 GIF in tests — external ground
    truth, so a shared encoder/decoder bit-order bug cannot hide in
    the round-trip. Indices are the portable-md5 family; DuckDB
    regenerates the array the decoder must recover through real LZW."""
    from machine_learning_algorithm_sparkml__spark.operators.multimodal import (
        decode_gif_media,
        encode_gif_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_gif_media(encode_gif_media(docs))


def q_multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-BACKED REAL baseline JPEG decode — the web-crawl image
    format the codec suite lacked (VERDICT r13 #4), and the first
    LOSSY one. Every document row becomes a real baseline sequential
    JFIF (custom canonical Huffman tables declared in DHT, both quant
    tables in one DQT, a COM segment the decoder must skip, 3-component
    interleaved MCU scan with byte stuffing —
    operators/multimodal.py:make_jpeg), decoded back by the
    from-scratch parser (decode_jpeg: canonical-code reconstruction
    from BITS/HUFFVAL, DC differential + EXTEND, AC run-length with
    ZRL/EOB, dequantize, 2-D IDCT, YCbCr->RGB). Lossiness is tamed by
    construction, not by tolerance: the fixture is FLAT per 8x8 block
    (per-block portable-md5 gray values) and the DC quant step is 8,
    which divides every flat block's DC of 8*(v-128) — so the decode
    is bit-exact and DuckDB replays it by regenerating block values
    (each contributes 64 pixels x 3 channels x v to pixel_sum). The
    entropy machinery still runs for real: varying DC categories,
    negative differentials, per-component predictors, EOB on every
    block. Non-flat content is covered by pytest's tolerance
    round-trip (quantization-bounded error)."""
    from machine_learning_algorithm_sparkml__spark.operators.multimodal import (
        decode_jpeg_media,
        encode_jpeg_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_jpeg_media(encode_jpeg_media(docs))


def q_multimodal_jpeg_dri_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-BACKED restart-interval JPEG decode (VERDICT r14 #3):
    every payload carries a DRI segment and in-scan RSTm markers —
    byte realignment, the mod-8 marker-sequence check (doc_id ≡ 44
    mod 60 wraps the counter twice), and DC-predictor resets at every
    boundary (T.81 §E.1.4), the discipline real Common-Crawl JPEGs
    carry. Flat per-8x8-block portable-md5 gray values + DC quant
    step 8 keep the lossy decode bit-exact (the multimodal_jpeg_decode
    argument), so DuckDB replays pixel_sum by regenerating block
    values; what this key adds over the baseline sibling is that the
    differential-DC chain is re-anchored mid-scan — a decoder that
    fails to reset predictors or realign produces wrong pixels or a
    marker desync, not a tolerance miss
    (operators/multimodal.py:encode_jpeg_dri_media, decode_jpeg)."""
    from machine_learning_algorithm_sparkml__spark.operators.multimodal import (
        decode_jpeg_media,
        encode_jpeg_dri_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_jpeg_media(encode_jpeg_dri_media(docs))


def q_multimodal_jpeg_progressive_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-BACKED progressive (SOF2) JPEG decode (VERDICT r14 #7)
    — the second most common web JPEG layout. Every payload is a real
    9-scan progression (DC first with point transform, two spectral-
    selection AC bands for luma, per-component AC scans, DC refinement
    bits, AC refinement scans — T.81 Annex G), decoded by the
    coefficient-accumulation path
    (operators/multimodal.py:_decode_jpeg_progressive). The flat-block
    fixture keeps the lossy decode bit-exact (the
    multimodal_jpeg_decode argument): the DC progression runs for real
    (successive approximation Al=1 -> refinement to full precision),
    the AC scans decode real multi-block EOB runs; non-flat AC
    refinement machinery (zero-history runs, correction bits, ZRL) is
    pinned by progressive==baseline bit-equality tests on random,
    sparse, gradient, and checkerboard content. DuckDB replays
    pixel_sum by regenerating per-block values."""
    from machine_learning_algorithm_sparkml__spark.operators.multimodal import (
        decode_jpeg_media,
        encode_jpeg_prog_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_jpeg_media(encode_jpeg_prog_media(docs))


def q_multimodal_jpeg420_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-BACKED 4:2:0 JPEG decode — the subsampled layout nearly
    every REAL web JPEG uses, and the part the 4:4:4 key doesn't
    exercise: per-MCU 4-Y+Cb+Cr block interleave (T.81 §A.2.3),
    per-component DC predictor chains across macroblocks, 2x2 chroma
    downsample on the encode side, nearest-neighbor chroma upsample on
    decode. Flat 16x16 macroblocks keep the doubly-lossy pipeline
    (quantization AND subsampling) bit-exact — the 2x2 mean of a flat
    region is exact and the DC quant step of 8 divides each flat
    block's coefficient — so DuckDB replays the expected pixels by
    regenerating per-macroblock values (256 pixels x 3 channels x v
    each). decode_jpeg dispatches on the declared sampling factors;
    same decoder, no fixture-specific path."""
    from machine_learning_algorithm_sparkml__spark.operators.multimodal import (
        decode_jpeg_media,
        encode_jpeg420_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_jpeg_media(encode_jpeg420_media(docs))


def q_multimodal_png_interlaced_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-BACKED Adam7-INTERLACED PNG decode (VERDICT r15 #2) —
    the progressive-rendering layout a slice of real web PNGs carries:
    seven independently-filtered pass sub-images in one zlib stream,
    scatter-reconstructed back to the display grid; small fixture
    dimensions make some passes EMPTY (the spec rule a naive reader
    misses). Interlacing changes the bitstream, not the pixels, so the
    pixel_sum closed form replays over the key's own 'pngi:' portable
    fixture — and because interlacing is a storage PERMUTATION, the
    projection adds the position-weighted sum Σ p·v_p, which a scatter
    bug cannot leave unchanged
    (operators/multimodal.py:make_png_interlaced, decode_png —
    dispatch on the IHDR interlace flag, no new plumbing)."""
    from machine_learning_algorithm_sparkml__spark.operators.multimodal import (
        decode_png_positional_media,
        encode_png_interlaced_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_png_positional_media(encode_png_interlaced_media(docs))


def q_multimodal_png_rgba_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-BACKED RGBA (color type 6) PNG decode (VERDICT r15 #2) —
    the most common web PNG layout after truecolor: four bytes per
    pixel, filters at bpp=4, straight-alpha composite over white on
    decode. The composite is integer-exact — per channel
    (v*a + 255*(255-a) + 127) // 255 — so DuckDB replays pixel_sum
    from the 'pngrgba:' portable byte fixture with no tolerance
    (operators/multimodal.py:make_png_rgba, decode_png)."""
    from machine_learning_algorithm_sparkml__spark.operators.multimodal import (
        decode_png_media,
        encode_png_rgba_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_png_media(encode_png_rgba_media(docs))


def q_multimodal_jpeg_gray_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-BACKED single-component (grayscale) baseline JPEG decode
    (VERDICT r15 #2) — the scanned-document/thumbnail layout: luma
    tables only, 1-block MCUs, and the decoder path the 3-component
    keys never touch (replicate-Y-to-RGB). Flat per-8x8-block
    'jpeggray:' portable values + DC quant step 8 keep the lossy
    decode bit-exact (the multimodal_jpeg_decode argument), each block
    contributing 192*v to pixel_sum
    (operators/multimodal.py:make_jpeg_gray, decode_jpeg)."""
    from machine_learning_algorithm_sparkml__spark.operators.multimodal import (
        decode_jpeg_media,
        encode_jpeg_gray_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_jpeg_media(encode_jpeg_gray_media(docs))


def q_multimodal_jpeg12_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-BACKED 12-BIT extended-sequential (SOF1) JPEG decode
    (VERDICT r15 #8 — the smallest of the three remaining refusals,
    now implemented): 12-bit sample precision with level shift 2048,
    DC difference categories up to 15 (past the 8-bit Table F.1
    bound), and a 16-BIT quantization table (Pq=1, legal only above
    8-bit) — the medical/scanned-archive layout. Flat per-block
    'jpeg12:' portable values (% 4096) + DC quant step 8 keep the
    lossy decode bit-exact; the decoder reduces 12-bit samples to the
    8-bit output surface by the high-bits rule (>> 4, the 16-bit-PNG
    convention), so each block contributes 192*(v >> 4)
    (operators/multimodal.py:make_jpeg12, decode_jpeg). Remaining
    refusals after this key: arithmetic-coded and sampling>2 JPEG
    only."""
    from machine_learning_algorithm_sparkml__spark.operators.multimodal import (
        decode_jpeg_media,
        encode_jpeg12_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_jpeg_media(encode_jpeg12_media(docs))


def q_multimodal_jpeg411_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-BACKED 4:1:1 JPEG decode — sampling factor 4, T.81's
    maximum and previously a blanket refusal (the DV/consumer-video
    layout): per-MCU interleave of FOUR horizontal Y blocks + Cb +
    Cr, 4x1-mean chroma downsample on encode, nearest-neighbor
    4x-horizontal upsample on decode. Flat 32x8 MCU regions keep the
    doubly-lossy pipeline bit-exact (the 4:2:0 argument at factor 4),
    each contributing 256 pixels x 3 channels x value; a 3-vs-4
    factor mix (fractional resampling) and out-of-range factors still
    refuse (operators/multimodal.py:make_jpeg subsampling='4:1:1',
    decode_jpeg). Remaining JPEG refusal: arithmetic coding only."""
    from machine_learning_algorithm_sparkml__spark.operators.multimodal import (
        decode_jpeg_media,
        encode_jpeg411_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_jpeg_media(encode_jpeg411_media(docs))


def q_multimodal_gif_interlaced_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-BACKED INTERLACED GIF decode (VERDICT r15 #2) — the
    GIF87a-era progressive layout: rows stored in the spec's four-pass
    order, de-interlaced by row scatter after the from-scratch LZW
    decompression. Interlacing permutes row STORAGE, not index values,
    so index_sum keeps the plain closed form over the key's own
    'gifi:' fixture — and the projection adds the position-weighted
    sum Σ p·v_p, which a wrong-row scatter cannot leave unchanged
    (operators/multimodal.py:make_gif_interlaced, decode_gif —
    dispatch on the image-descriptor interlace bit)."""
    from machine_learning_algorithm_sparkml__spark.operators.multimodal import (
        decode_gif_positional_media,
        encode_gif_interlaced_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return decode_gif_positional_media(encode_gif_interlaced_media(docs))


def q_multimodal_mp4_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-BACKED ISO-BMFF (MP4) container-metadata walk (VERDICT
    r15 #2) — the video first mile at crawl scale: duration, first
    video track's 16.16 presentation dims, and track census WITHOUT
    decoding a single frame. Every payload is a real box tree (ftyp
    brand cycling isom/mp42/avc1, v0 AND v1 mvhd — 64-bit duration at
    timescale 90000 — per-track tkhd boxes, every 5th moov wrapped in
    a 64-bit largesize box, opaque mdat); the fixture parameters are
    closed-form doc_id residues so the oracle STATES the expected
    tuple (the text_html_extract pattern). Sample decode stays
    honestly stubbed — the container walk is the pipeline-usable part
    (operators/multimodal.py:make_mp4_meta, parse_mp4_meta)."""
    from machine_learning_algorithm_sparkml__spark.operators.multimodal import (
        encode_mp4_media,
        parse_mp4_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return parse_mp4_media(encode_mp4_media(docs))


def q_multimodal_flac_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-BACKED FLAC STREAMINFO walk (VERDICT r15 #2) — the
    MP4-meta contract for audio: sample rate / channels / bit depth /
    total samples from the spec's packed 20/3/5/36-bit field layout,
    skipping VORBIS_COMMENT and PADDING blocks by declared length, and
    the derived duration (total*1000 // rate, exact integer division).
    Fixture parameters are closed-form doc_id residues spanning the
    five common rates, the full 1-8 channel range, and 8-24 bit
    depths; subframe decode stays honestly stubbed
    (operators/multimodal.py:make_flac_meta, parse_flac_meta)."""
    from machine_learning_algorithm_sparkml__spark.operators.multimodal import (
        encode_flac_media,
        parse_flac_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return parse_flac_media(encode_flac_media(docs))


def q_multimodal_wav_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-BACKED audio QUALITY statistics over the real WAV decode
    — the screening pass an audio pipeline runs first (silence /
    clipping / level): exact integer sum of squares (energy), peak
    absolute amplitude, zero-crossing count, and full-scale-pinned
    sample count, all replayed by DuckDB from the portable 'wav:'
    sample fixture (crossings via a lag window; every cell integer —
    RMS's sqrt stays out of the comparable projection)
    (operators/multimodal.py:audio_stats_media, decode_wav)."""
    from machine_learning_algorithm_sparkml__spark.operators.multimodal import (
        audio_stats_media,
        encode_wav_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return audio_stats_media(encode_wav_media(docs))


def q_multimodal_exif_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-BACKED Exif metadata walk — the image metadata a crawl
    pipeline reads before any pixel work (orientation for correct
    rotation, camera make, capture time): a REAL APP1 'Exif' segment
    carrying a TIFF IFD in ALTERNATING byte order (II/MM both occur in
    real crawls), inline SHORT values and offset-stored ASCII values
    per TIFF 6.0, parsed from a JPEG the image decoder also accepts
    (decode_jpeg skips the APP1; parse_exif walks it — the same bytes
    serve both paths). Fixture fields are closed-form doc_id residues
    so the oracle states the expected tuple
    (operators/multimodal.py:make_exif_app1, parse_exif)."""
    from machine_learning_algorithm_sparkml__spark.operators.multimodal import (
        encode_jpeg_exif_media,
        parse_exif_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return parse_exif_media(encode_jpeg_exif_media(docs))


def q_multimodal_mp3_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-BACKED MP3 frame-header walk — the third audio
    container beside WAV and FLAC, and the crawl census shape for the
    web's dominant audio format: skip the ID3v2 tag by its SYNCSAFE
    size (7 bits per byte — the field naive readers misparse), walk
    CBR MPEG-1 Layer III frame headers via the ISO 11172-3 bitrate/
    sample-rate tables and the 144*bitrate/rate frame-length formula,
    and report (bitrate, rate, frame count, exact integer duration).
    Fixture parameters are closed-form residues spanning the common
    bitrate ladder, all three MPEG-1 rates, and multi-byte syncsafe
    tag sizes; VBR streams refuse explicitly (Xing support would be
    needed — never guessed)
    (operators/multimodal.py:make_mp3_meta, parse_mp3_meta)."""
    from machine_learning_algorithm_sparkml__spark.operators.multimodal import (
        encode_mp3_media,
        parse_mp3_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return parse_mp3_media(encode_mp3_media(docs))


def q_multimodal_dhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-BACKED perceptual IMAGE near-dup — the multimodal
    counterpart of the text dedup suite, composed end to end through
    REAL codecs: every doc becomes a real PNG, every 37th doc also
    plants a slightly-edited twin (same picture, first pixel byte
    shifted — the re-encode/edit a byte hash cannot see), payloads
    decode through the from-scratch PNG path, dHash-64 per image
    (9x8 nearest-neighbor grayscale grid, horizontal gradient bits),
    then SimHash-style 4x16-bit band bucketing with an exact
    bit_count(XOR) <= 3 verify. max_hamming=3 < 4 bands makes banding
    provably cost-only by pigeonhole, so DuckDB verifies against TRUE
    all-pairs Hamming over the regenerated fixture — candidate
    generation needs no replay (the dedup_simhash rule)
    (operators/imagededup.py, operators/multimodal.py:
    encode_png_twin_media)."""
    from machine_learning_algorithm_sparkml__spark.operators.imagededup import (
        dhash_near_dup_pairs,
        image_dhash,
    )
    from machine_learning_algorithm_sparkml__spark.operators.multimodal import (
        encode_png_twin_media,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    twins = docs.filter(F.col("doc_id") % 37 == 0).select(
        (F.col("doc_id") + F.lit(40_000_000)).alias("doc_id")
    )
    corpus = docs.unionAll(twins)
    return dhash_near_dup_pairs(image_dhash(encode_png_twin_media(corpus)))


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: Arrow-batched feature-extraction stub. The feature
    vector is summarized to scalar columns (dim / L1 norm / first slot)
    so no array column crosses the driver-compare boundary (VERDICT r1
    "What's wrong" #1 — the canonicalizer cannot hash list cells)."""
    docs = load_table(spark, sf_dir, "documents")
    wrapped = attach_binary_payload(docs, "doc_id", "text", mime="text/plain;fake")
    feats = extract_features(wrapped)
    return feats.select(
        "doc_id",
        F.size("features").alias("feat_dim"),
        F.round(
            F.aggregate(
                "features", F.lit(0.0), lambda acc, x: acc + F.abs(x.cast("double"))
            ),
            4,
        ).alias("feat_l1"),
        F.col("features").getItem(0).cast("double").alias("feat_0"),
    )


def q_ml_text_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: MLlib Tokenizer->StopWords->NGram->HashingTF->IDF
    pipeline; tf-idf vector projected to its nonzero count for a
    stable comparable schema."""
    from pyspark.ml.functions import vector_to_array

    from machine_learning_algorithm_sparkml__spark.ml.text_features import (
        text_feature_pipeline,
    )

    # spread before fit/transform: the tokenizer->TF->IDF chain is
    # per-row compute inside an otherwise single-task scan stage, and
    # the IDF fit aggregates 4096-wide vectors (r16; no-op at scale).
    # localCheckpoint: the frame feeds BOTH fit() and the lazy
    # transform(), so without materialization the scan + spread
    # exchange execute twice (ADVICE r16 #2); checkpoint blocks are
    # released by the ContextCleaner (cache+unpersist can't work here
    # — the transform executes only after this function returns)
    from machine_learning_algorithm_sparkml__spark.operators.spread import spread_rows

    docs = spread_rows(
        load_table(spark, sf_dir, "documents"), "doc_id"
    ).localCheckpoint(eager=True)
    model = text_feature_pipeline(num_features=1 << 12).fit(docs)
    out = model.transform(docs)
    arr = vector_to_array(F.col("tfidf"))
    return out.select(
        "doc_id",
        F.size(F.filter(arr, lambda x: x != 0)).alias("n_nonzero_tfidf"),
        F.round(F.aggregate(arr, F.lit(0.0), lambda a, x: a + x), 4).alias("tfidf_sum"),
    )


def q_dedup_minhash_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only (MLlib LSH internals are not SQL-replayable), but the
    row carries a machine-checked witness (VERDICT r8 #6): the MLlib
    MinHashLSH approxSimilarityJoin pair set is compared against the
    hand-rolled banded-MinHash operator's pair set at the same
    threshold, and ``pair_sets_equal`` pins their equality (left-anti
    counts in both directions — the PARITY.md r2 tuning observation
    promoted to a standing per-run invariant). Both pair frames are
    checkpointed once; the anti-joins run over id-pairs only. The
    truth pass (a second full MinHash program) is gated like the other
    SELF_VERIFIED_KEYS: bench measures the bare MLlib operator, the
    driver row and pytest pin the invariant."""
    from machine_learning_algorithm_sparkml__spark.ml.text_features import (
        minhash_lsh_mllib_pairs,
    )
    from machine_learning_algorithm_sparkml__spark.operators.dedup import (
        minhash_near_dup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    mllib = minhash_lsh_mllib_pairs(docs, "doc_id", "text", jaccard_distance_threshold=0.5)
    if not self_verify_enabled():
        return (
            mllib.withColumn("n_only_mllib", F.lit(None).cast("long"))
            .withColumn("n_only_handrolled", F.lit(None).cast("long"))
            .withColumn("pair_sets_equal", F.lit(None).cast("boolean"))
        )
    mllib = mllib.localCheckpoint(eager=True)
    hand = (
        minhash_near_dup_pairs(docs, "doc_id", "text", threshold=0.5)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    pm = mllib.select("id_a", "id_b")
    inv = (
        pm.join(hand, ["id_a", "id_b"], "left_anti")
        .agg(F.count(F.lit(1)).alias("n_only_mllib"))
        .crossJoin(
            hand.join(pm, ["id_a", "id_b"], "left_anti")
            .agg(F.count(F.lit(1)).alias("n_only_handrolled"))
        )
        .withColumn(
            "pair_sets_equal",
            (F.col("n_only_mllib") == 0) & (F.col("n_only_handrolled") == 0),
        )
    )
    return mllib.crossJoin(F.broadcast(inv))


QUERIES = {
    "ml_text_features": q_ml_text_features,
    "dedup_minhash_mllib": q_dedup_minhash_mllib,
    "text_token_count": q_text_token_count,
    "text_quality": q_text_quality,
    "text_lang_id": q_text_lang_id,
    "doc_fingerprint": q_doc_fingerprint,
    "text_pii_redact": q_text_pii_redact,
    "doc_chunk_fixed": q_doc_chunk_fixed,
    "doc_chunk_long": q_doc_chunk_long,
    "doc_pack_sequences": q_doc_pack_sequences,
    "doc_tokens_explode": q_doc_tokens_explode,
    "udtf_token_runs": q_udtf_token_runs,
    "udtf_partition_stats": q_udtf_partition_stats,
    "udtf_dynamic_schema": q_udtf_dynamic_schema,
    "text_top_terms": q_text_top_terms,
    "text_bm25": q_text_bm25,
    "retrieval_hybrid": q_retrieval_hybrid,
    "corpus_shuffle_epoch": q_corpus_shuffle_epoch,
    "agg_heavy_hitters": q_agg_heavy_hitters,
    "doc_hash_split": q_doc_hash_split,
    "mixture_weighted_sample": q_mixture_weighted_sample,
    "decontaminate_ngram": q_decontaminate_ngram,
    "decontaminate_exact_substring": q_decontaminate_exact_substring,
    "decontaminate_fuzzy": q_decontaminate_fuzzy,
    "decontaminate_fuzzy_large": q_decontaminate_fuzzy_large,
    "dedup_exact": q_dedup_exact,
    "dedup_url": q_dedup_url,
    "dedup_containment": q_dedup_containment,
    "dedup_exact_substring": q_dedup_exact_substring,
    "dedup_incremental": q_dedup_incremental,
    "dedup_passage": q_dedup_passage,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash": q_dedup_minhash,
    "dedup_clusters": q_dedup_clusters,
    "split_leakage_safe": q_split_leakage_safe,
    "dedup_keep_best": q_dedup_keep_best,
    "dedup_pipeline_keep": q_dedup_pipeline_keep,
    "text_zscore_by_lang": q_text_zscore_by_lang,
    "text_quality_filter": q_text_quality_filter,
    "multimodal_frames": q_multimodal_frames,
    "dedup_simhash": q_dedup_simhash,
    "simsearch_topk": q_simsearch_topk,
    "simsearch_lsh": q_simsearch_lsh,
    "simsearch_lsh_portable": q_simsearch_lsh_portable,
    "simsearch_ivf_portable": q_simsearch_ivf_portable,
    "simsearch_ivf": q_simsearch_ivf,
    "simsearch_pq": q_simsearch_pq,
    "simsearch_pq_portable": q_simsearch_pq_portable,
    "simsearch_ivfpq_portable": q_simsearch_ivfpq_portable,
    "simsearch_ivfpq": q_simsearch_ivfpq,
    "simsearch_brp": q_simsearch_brp,
    "embedding_neardup": q_embedding_neardup,
    "embedding_neardup_portable": q_embedding_neardup_portable,
    "multimodal_meta": q_multimodal_meta,
    "multimodal_decode": q_multimodal_decode,
    "multimodal_decode_real": q_multimodal_decode_real,
    "multimodal_wav_decode": q_multimodal_wav_decode,
    "multimodal_wav_stats": q_multimodal_wav_stats,
    "multimodal_exif_meta": q_multimodal_exif_meta,
    "multimodal_mp3_meta": q_multimodal_mp3_meta,
    "multimodal_dhash_neardup": q_multimodal_dhash_neardup,
    "multimodal_png_decode": q_multimodal_png_decode,
    "multimodal_jpeg_decode": q_multimodal_jpeg_decode,
    "multimodal_jpeg_dri_decode": q_multimodal_jpeg_dri_decode,
    "multimodal_jpeg_progressive_decode": q_multimodal_jpeg_progressive_decode,
    "multimodal_jpeg420_decode": q_multimodal_jpeg420_decode,
    "multimodal_png8_decode": q_multimodal_png8_decode,
    "multimodal_png_interlaced_decode": q_multimodal_png_interlaced_decode,
    "multimodal_png_rgba_decode": q_multimodal_png_rgba_decode,
    "multimodal_jpeg_gray_decode": q_multimodal_jpeg_gray_decode,
    "multimodal_jpeg12_decode": q_multimodal_jpeg12_decode,
    "multimodal_jpeg411_decode": q_multimodal_jpeg411_decode,
    "multimodal_gif_decode": q_multimodal_gif_decode,
    "multimodal_gif_interlaced_decode": q_multimodal_gif_interlaced_decode,
    "multimodal_mp4_meta": q_multimodal_mp4_meta,
    "multimodal_flac_meta": q_multimodal_flac_meta,
    "multimodal_features": q_multimodal_features,
}

_STOPWORD_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)


def _marker_list(lang: str) -> str:
    return ", ".join(f"'{w}'" for w in LANG_MARKERS[lang])


# COALESCE mirrors the Spark functions' null-hardening (tokens()
# yields [] on NULL) so the oracles agree even on NULL text
# mirrors functions.text.tokens(): split on ANY whitespace run, drop
# empty fragments (trim-based guards miss tabs/newlines — DuckDB trim
# strips only spaces, same as Spark)
_TOKENS = "list_filter(regexp_split_to_array(COALESCE(text, ''), '\\s+'), x -> length(x) > 0)"

# Shared 3-gram Jaccard candidate program (toks -> shingles -> sizes
# -> hot-shingle cap -> intersection counts): FIVE oracles compose on
# top of it (pair list, clusters, keep-best, pipeline, leakage-safe
# split). ONE definition so the replayed semantics cannot drift
# between them — the same no-drift rule as _portable_sig_ctes.
_JACCARD_INTER_CTES = f"""toks AS (
            SELECT doc_id,
                   -- guarded like the Spark tokens(): NULL/blank text -> []
                   -- (the len(t)<n branch then yields the same single \'\' shingle)
                   list_filter(regexp_split_to_array(COALESCE(text, \'\'), \'\\s+\'), x -> length(x) > 0) AS t
            FROM documents
        ), sh_raw AS (
            SELECT doc_id,
                   CASE WHEN len(t) < 3 THEN [COALESCE(array_to_string(t, \' \'), \'\')]
                        ELSE list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], \' \'))
                   END AS sh
            FROM toks
        ), shingles AS (
            SELECT DISTINCT doc_id, u.shingle
            FROM sh_raw, UNNEST(sh) AS u(shingle)
        ), sizes AS (
            SELECT doc_id, COUNT(*) AS set_size FROM shingles GROUP BY doc_id
        ), cold AS (
            SELECT shingle FROM shingles GROUP BY shingle
            HAVING COUNT(*) <= {_SHINGLE_DF_CAP}
        ), capped AS (
            SELECT s.doc_id, s.shingle FROM shingles s JOIN cold c ON s.shingle = c.shingle
        ), inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
            FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        )"""


def _portable_sig_ctes(src: str, prefix: str, num_hashes: int, num_bands: int) -> str:
    """CTE chain ``{prefix}sigs`` / ``{prefix}banded`` replaying the
    portable MinHash program over CTE ``src`` (columns doc_id, text):
    the (a_i, b_i) coefficients come from the SAME seeded generator as
    the Spark operator (`operators.dedup.minhash_params`), the
    per-shingle base hash is the same md5-prefix 60-bit parse reduced
    mod 2^31-1, and the modular arithmetic runs in BIGINT (exact:
    a, h < 2^31 keeps products under 2^62, same as Spark's codegen
    long math) — every signature slot and band bucket is bit-identical
    across the two engines. Shared by the `dedup_minhash` and
    `decontaminate_fuzzy` oracles so the replay cannot drift."""
    params = minhash_params(num_hashes)
    rows_per_band = num_hashes // num_bands
    slots = ",\n                   ".join(
        f"MIN(({a} * h + {b}) % {MINHASH_PRIME}) AS h{i}"
        for i, (a, b) in enumerate(params)
    )
    bands = "\n            UNION ALL ".join(
        "SELECT doc_id, {j} AS band, CAST(('0x' || substr(md5(concat_ws('|', {cols})), 1, 15)) AS BIGINT) AS bucket FROM {p}sigs".format(
            j=j,
            p=prefix,
            cols=", ".join(f"h{j * rows_per_band + r}" for r in range(rows_per_band)),
        )
        for j in range(num_bands)
    )
    return f"""{prefix}toks AS (
            SELECT doc_id, {_TOKENS} AS t FROM {src}
        ), {prefix}sh_raw AS (
            SELECT doc_id,
                   CASE WHEN len(t) < 3 THEN [COALESCE(array_to_string(t, ' '), '')]
                        ELSE list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
                   END AS sh
            FROM {prefix}toks
        ), {prefix}shingles AS (
            SELECT DISTINCT doc_id, u.shingle
            FROM {prefix}sh_raw, UNNEST(sh) AS u(shingle)
        ), {prefix}hbase AS (
            SELECT doc_id, CAST(('0x' || substr(md5(shingle), 1, 15)) AS BIGINT) % {MINHASH_PRIME} AS h
            FROM {prefix}shingles
        ), {prefix}sigs AS (
            SELECT doc_id,
                   {slots}
            FROM {prefix}hbase GROUP BY doc_id
        ), {prefix}banded AS (
            {bands}
        )"""


def _minhash_eq_sum(a: str, b: str, num_hashes: int) -> str:
    return " + ".join(
        f"CASE WHEN {a}.h{i} = {b}.h{i} THEN 1 ELSE 0 END" for i in range(num_hashes)
    )


def _minhash_portable_oracle_sql(
    num_hashes: int = 32, num_bands: int = 8, threshold: float = 0.5
) -> str:
    """DuckDB replay of the portable MinHash self-join program — see
    :func:`_portable_sig_ctes` for the bit-identity argument."""
    eq_sum = _minhash_eq_sum("sa", "sb", num_hashes)
    return f"""
        WITH {_portable_sig_ctes("documents", "", num_hashes, num_bands)}, cands AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM banded a JOIN banded b
              ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
        ), est AS (
            SELECT id_a, id_b,
                   ROUND(CAST({eq_sum} AS DOUBLE) / {num_hashes}.0, 6) AS est_jaccard
            FROM cands
            JOIN sigs sa ON sa.doc_id = id_a
            JOIN sigs sb ON sb.doc_id = id_b
        )
        SELECT id_a, id_b, est_jaccard FROM est WHERE est_jaccard >= {threshold}
    """


def _decontaminate_fuzzy_oracle_sql(
    num_hashes: int = 32, num_bands: int = 8, threshold: float = 0.8
) -> str:
    """DuckDB replay of the FULL fuzzy-decontamination program for the
    `decontaminate_fuzzy` key: perturbed-benchmark construction,
    portable signatures for both frames, the (band, bucket) candidate
    join, the slot-overlap estimate, the contaminated-id anti-join,
    and the planted-recall invariant bit. Banding here DOES shape the
    result (LSH recall is probabilistic), so unlike `dedup_simhash`
    the oracle must — and does — replay the banding bit-for-bit."""
    eq_sum = _minhash_eq_sum("sc", "sb", num_hashes)
    return f"""
        WITH corpus AS (
            SELECT doc_id, text FROM documents
        ), bench AS (
            SELECT doc_id + 10000000 AS doc_id,
                   substring(text, strpos(text, ' ') + 1) AS text
            FROM documents
            WHERE doc_id % 50 = 0 AND length(text) >= 200
        ), {_portable_sig_ctes("corpus", "c_", num_hashes, num_bands)},
        {_portable_sig_ctes("bench", "b_", num_hashes, num_bands)}, cands AS (
            SELECT DISTINCT c.doc_id AS cid, b.doc_id AS bid
            FROM c_banded c JOIN b_banded b
              ON c.band = b.band AND c.bucket = b.bucket
        ), contaminated AS (
            SELECT DISTINCT cid AS doc_id
            FROM cands
            JOIN c_sigs sc ON sc.doc_id = cid
            JOIN b_sigs sb ON sb.doc_id = bid
            WHERE CAST({eq_sum} AS DOUBLE) / {num_hashes}.0 >= {threshold}
        ), survivors AS (
            SELECT c.doc_id FROM corpus c
            WHERE NOT EXISTS (SELECT 1 FROM contaminated x WHERE x.doc_id = c.doc_id)
        ), inv AS (
            SELECT NOT EXISTS (
                SELECT 1 FROM survivors s
                JOIN documents d ON d.doc_id = s.doc_id
                WHERE d.doc_id % 50 = 0 AND length(d.text) >= 200
            ) AS planted_dropped_ok
        )
        SELECT s.doc_id, i.planted_dropped_ok FROM survivors s CROSS JOIN inv i
    """


def _simhash_portable_oracle_sql(num_bits: int = 64, max_hamming: int = 8) -> str:
    """DuckDB replay of portable SimHash: identical md5-derived token
    bits (two 60-bit digest halves), the same 2*ones > n sign rule,
    then ALL-PAIRS hamming via bit-packed bit_count(xor) — sound
    because the Spark side's banding provably never changes the
    result set (see simhash_near_dup_pairs docstring), only its cost.
    All-pairs is fine at oracle scale (<= ~5k docs)."""
    assert num_bits <= 120
    sums = ",\n                   ".join(
        (
            f"SUM((h1 >> {i}) & 1) AS b{i}"
            if i < 60
            else f"SUM((h2 >> {i - 60}) & 1) AS b{i}"
        )
        for i in range(num_bits)
    )
    n_words = (num_bits + 63) // 64
    words = []
    for w in range(n_words):
        lo, hi = w * 64, min(num_bits, (w + 1) * 64)
        # bit 63 is the BIGINT sign bit: 1<<63 overflows DuckDB's
        # checked shift, so emit its two's-complement value literally;
        # ascending order keeps every partial sum in range.
        terms = " + ".join(
            "CASE WHEN 2*b{i} > n THEN {v} ELSE 0 END".format(
                i=i,
                v="(-9223372036854775808)::BIGINT"
                if i - lo == 63
                else f"({1 << (i - lo)}::BIGINT)",
            )
            for i in range(lo, hi)
        )
        words.append(f"({terms}) AS w{w}")
    packed_cols = ",\n                   ".join(words)
    ham = " + ".join(f"bit_count(xor(a.w{w}, b.w{w}))" for w in range(n_words))
    return f"""
        WITH tk AS (
            SELECT doc_id, {_TOKENS} AS t FROM documents
        ), toks AS (
            SELECT doc_id, u.tok FROM tk, UNNEST(t) AS u(tok)
        ), hashed AS (
            SELECT doc_id,
                   CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h1,
                   CAST(('0x' || substr(md5(tok), 16, 15)) AS BIGINT) AS h2
            FROM toks
        ), sums AS (
            SELECT doc_id, COUNT(*) AS n,
                   {sums}
            FROM hashed GROUP BY doc_id
        ), packed AS (
            SELECT doc_id,
                   {packed_cols}
            FROM sums
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST({ham} AS INTEGER) AS hamming
        FROM packed a JOIN packed b ON a.doc_id < b.doc_id
        WHERE {ham} <= {max_hamming}
    """


def _decontaminate_fuzzy_large_oracle_sql(num_hashes: int = 32, num_bands: int = 8) -> str:
    """DuckDB replay of the corpus-scale (shuffled-strategy) fuzzy
    decontamination key, including the full 107k-row benchmark
    construction (odd half + perturbed planted docs + 105k synthetic
    filler). Strategy choice changes the PLAN, not the semantics
    (property-tested equal), so one oracle covers the shuffled path;
    the `bench_over_broadcast_cap` witness is recomputed, not assumed."""
    eq_sum = _minhash_eq_sum("sc", "sb", num_hashes)
    return f"""
        WITH corpus AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
        ), bench AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
            UNION ALL
            SELECT doc_id + 20000000 AS doc_id,
                   substring(text, strpos(text, ' ') + 1) AS text
            FROM documents
            WHERE doc_id % 2 = 0 AND doc_id % 10 = 0 AND length(text) >= 240
            UNION ALL
            SELECT id + 30000000 AS doc_id,
                   'fillxa' || id || ' fillxb' || id || ' fillxc' || id AS text
            FROM range(105000) AS r(id)
        ), {_portable_sig_ctes("corpus", "c_", num_hashes, num_bands)},
        {_portable_sig_ctes("bench", "b_", num_hashes, num_bands)}, cands AS (
            SELECT DISTINCT c.doc_id AS cid, b.doc_id AS bid
            FROM c_banded c JOIN b_banded b
              ON c.band = b.band AND c.bucket = b.bucket
        ), contaminated AS (
            SELECT DISTINCT cid AS doc_id
            FROM cands
            JOIN c_sigs sc ON sc.doc_id = cid
            JOIN b_sigs sb ON sb.doc_id = bid
            WHERE CAST({eq_sum} AS DOUBLE) / {num_hashes}.0 >= 0.7
        ), survivors AS (
            SELECT c.doc_id FROM corpus c
            WHERE NOT EXISTS (SELECT 1 FROM contaminated x WHERE x.doc_id = c.doc_id)
        ), inv AS (
            SELECT NOT EXISTS (
                SELECT 1 FROM survivors s
                JOIN documents d ON d.doc_id = s.doc_id
                WHERE d.doc_id % 10 = 0 AND length(d.text) >= 240
            ) AS planted_dropped_ok,
            (SELECT COUNT(*) FROM bench) > 100000 AS bench_over_broadcast_cap
        )
        SELECT s.doc_id, i.planted_dropped_ok, i.bench_over_broadcast_cap
        FROM survivors s CROSS JOIN inv i
    """


ORACLE = {
    "dedup_minhash": _minhash_portable_oracle_sql(),
    "dedup_simhash": _simhash_portable_oracle_sql(),
    "decontaminate_fuzzy": _decontaminate_fuzzy_oracle_sql(),
    "decontaminate_fuzzy_large": _decontaminate_fuzzy_large_oracle_sql(),
    "text_token_count": f"""
        SELECT doc_id,
               CAST(len({_TOKENS}) AS INTEGER) AS n_tokens,
               CAST(len(regexp_extract_all(COALESCE(text, ''), '[A-Za-z0-9_]+|[^A-Za-z0-9_\\s]')) AS INTEGER) AS n_word_tokens,
               CAST(length(text) AS INTEGER) AS n_chars_computed
        FROM documents
    """,
    "text_quality": f"""
        WITH t AS (
            SELECT doc_id,
                   len({_TOKENS}) AS n_tok,
                   length(COALESCE(text, '')) AS n_chars,
                   length(regexp_replace(COALESCE(text, ''), '[^.,;:!?]', '', 'g')) AS n_punct,
                   len(list_filter({_TOKENS}, x -> x IN ({_STOPWORD_LIST}))) AS n_stop
            FROM documents
        )
        SELECT doc_id,
               CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(n_punct AS DOUBLE) / n_chars END AS punct_ratio,
               CASE WHEN n_tok = 0 THEN 0.0 ELSE CAST(n_stop AS DOUBLE) / n_tok END AS stopword_ratio,
               LEAST(CAST(n_tok AS DOUBLE) / 64.0, 1.0) * 0.5
             + LEAST((CASE WHEN n_tok = 0 THEN 0.0 ELSE CAST(n_stop AS DOUBLE) / n_tok END) * 4.0, 1.0) * 0.3
             + (0.2 - LEAST((CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(n_punct AS DOUBLE) / n_chars END) * 10.0, 1.0) * 0.2) AS quality
        FROM t
    """,
    "text_lang_id": f"""
        WITH t AS (
            SELECT doc_id, lang,
                   len(list_filter({_TOKENS}, x -> x IN ({_marker_list('de')}))) AS h_de,
                   len(list_filter({_TOKENS}, x -> x IN ({_marker_list('en')}))) AS h_en,
                   len(list_filter({_TOKENS}, x -> x IN ({_marker_list('es')}))) AS h_es,
                   len(list_filter({_TOKENS}, x -> x IN ({_marker_list('fr')}))) AS h_fr,
                   len(list_filter({_TOKENS}, x -> x IN ({_marker_list('zh')}))) AS h_zh
            FROM documents
        )
        SELECT doc_id, lang,
               CASE WHEN GREATEST(h_de, h_en, h_es, h_fr, h_zh) = 0 THEN 'und'
                    WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr AND h_de >= h_zh THEN 'de'
                    WHEN h_en >= h_es AND h_en >= h_fr AND h_en >= h_zh THEN 'en'
                    WHEN h_es >= h_fr AND h_es >= h_zh THEN 'es'
                    WHEN h_fr >= h_zh THEN 'fr'
                    ELSE 'zh' END AS lang_pred
        FROM t
    """,
    "doc_fingerprint": """
        SELECT doc_id, md5(trim(regexp_replace(lower(COALESCE(text, '')), '\\s+', ' ', 'g'))) AS fingerprint
        FROM documents
    """,
    # '0x'-prefixed CAST parses hex; thresholds are integer literals on
    # both sides (a double weight*65536 would round in DuckDB casts but
    # truncate in Spark)
    "mixture_weighted_sample": """
        WITH fp AS (
            SELECT doc_id, source,
                   CAST('0x' || substring(md5(trim(regexp_replace(lower(COALESCE(text, '')), '\\s+', ' ', 'g'))), 1, 4) AS BIGINT) AS u16
            FROM documents
        )
        SELECT doc_id, source FROM fp
        WHERE u16 < CASE
            WHEN source IN ('src0','src1','src2','src3','src4') THEN 65536
            WHEN source IN ('src5','src6','src7','src8','src9') THEN 32768
            WHEN source IN ('src10','src11','src12','src13','src14') THEN 16384
            ELSE 6553 END
    """,
    # plain string (not f-string): the regex quantifier braces must stay literal
    "text_pii_redact": """
        WITH planted AS (
            SELECT doc_id,
                   COALESCE(text, '') || ' reach doc' || CAST(doc_id AS VARCHAR)
                   || '@example.com' || ' from 10.0.'
                   || CAST(doc_id % 256 AS VARCHAR) || '.7'
                   || ' call +1 415 555 0199' AS t
            FROM documents
        ), r1 AS (
            SELECT doc_id,
                   CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INTEGER) AS n_email,
                   regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g') AS t
            FROM planted
        ), r2 AS (
            SELECT doc_id, n_email,
                   CAST(len(regexp_extract_all(t, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS INTEGER) AS n_ipv4,
                   regexp_replace(t, '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b', '[IP]', 'g') AS t
            FROM r1
        )
        SELECT doc_id,
               regexp_replace(t, '\\+[0-9][0-9 ()-]{6,}[0-9]', '[PHONE]', 'g') AS redacted,
               n_email, n_ipv4,
               CAST(len(regexp_extract_all(t, '\\+[0-9][0-9 ()-]{6,}[0-9]')) AS INTEGER) AS n_phone
        FROM r2
    """,
    "doc_chunk_fixed": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(COALESCE(text, ''), '\\s+'), x -> length(x) > 0) AS t
            FROM documents
        ), starts AS (
            SELECT doc_id, t, u.s AS s
            FROM toks, UNNEST(range(1, GREATEST(len(t), 1) + 1, 48)) AS u(s)
        )
        SELECT doc_id,
               CAST((s - 1) // 48 AS INTEGER) AS chunk_id,
               array_to_string(t[s : s + 63], ' ') AS chunk_text,
               CAST(len(t[s : s + 63]) AS INTEGER) AS n_chunk_tokens
        FROM starts
    """,
    "doc_chunk_long": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(COALESCE(text, ''), '\\s+'), x -> length(x) > 0) AS t
            FROM documents
        ), starts AS (
            SELECT doc_id, t, u.s AS s
            FROM toks, UNNEST(range(1, GREATEST(len(t), 1) + 1, 48)) AS u(s)
        )
        SELECT doc_id,
               CAST((s - 1) // 48 AS INTEGER) AS chunk_id,
               array_to_string(t[s : s + 63], ' ') AS chunk_text,
               CAST(len(t[s : s + 63]) AS INTEGER) AS n_chunk_tokens
        FROM starts
    """,
    "doc_pack_sequences": """
        WITH t AS (
            SELECT doc_id,
                   CAST(len(list_filter(regexp_split_to_array(COALESCE(text, ''), '\\s+'), x -> length(x) > 0)) AS INTEGER) AS n_tokens,
                   CAST(doc_id % 32 AS INTEGER) AS pack_shard
            FROM documents
        )
        SELECT doc_id, n_tokens, pack_shard,
               (CAST(SUM(n_tokens) OVER w AS BIGINT) - n_tokens) // 256 AS pack_seq
        FROM t
        WINDOW w AS (PARTITION BY pack_shard ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    # DuckDB has no UNNEST WITH ORDINALITY: positions come from
    # range(1, len+1) subscripting (empty arrays -> empty range -> no
    # rows, matching posexplode)
    "doc_tokens_explode": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(COALESCE(text, ''), '\\s+'), x -> length(x) > 0) AS t
            FROM documents
        )
        SELECT doc_id, CAST(u.i - 1 AS INTEGER) AS pos, t[CAST(u.i AS INTEGER)] AS token
        FROM toks, UNNEST(range(1, len(t) + 1)) AS u(i)
    """,
    # the declarative RLE: lag-based change points -> running sum as
    # run id -> per-run aggregate; value-checks the imperative UDTF
    "udtf_token_runs": """
        WITH toks AS (
            SELECT doc_id,
                   unnest(string_split(text, ' ')) AS tok,
                   unnest(range(1, len(string_split(text, ' ')) + 1)) AS ord
            FROM documents
        ), marks AS (
            SELECT doc_id, tok, ord,
                   CASE WHEN lag(tok) OVER (PARTITION BY doc_id ORDER BY ord)
                             IS DISTINCT FROM tok
                        THEN 1 ELSE 0 END AS brk
            FROM toks
        ), runs AS (
            SELECT doc_id, tok, ord,
                   SUM(brk) OVER (PARTITION BY doc_id ORDER BY ord
                                  ROWS UNBOUNDED PRECEDING) AS run_id
            FROM marks
        )
        SELECT doc_id, CAST(run_id AS INTEGER) AS run_idx, MIN(tok) AS token,
               CAST(COUNT(*) AS INTEGER) AS run_len
        FROM runs GROUP BY doc_id, run_id
    """,
    # GROUP BY replay of the terminate()-epilogue UDTF: the folded
    # state is an order-independent monoid, so a declarative aggregate
    # (min-id argmax via correlated MIN) reproduces the epilogue rows
    "udtf_partition_stats": """
        WITH t AS (
            SELECT source, doc_id, len(string_split(text, ' ')) AS ntok
            FROM documents
        ), m AS (
            SELECT source, COUNT(*) AS n_docs,
                   CAST(SUM(ntok) AS BIGINT) AS n_tokens,
                   CAST(MAX(ntok) AS BIGINT) AS max_tokens
            FROM t GROUP BY source
        )
        SELECT m.source, m.n_docs, m.n_tokens, m.max_tokens,
               (SELECT MIN(doc_id) FROM t
                WHERE t.source = m.source AND t.ntok = m.max_tokens) AS top_doc_id
        FROM m
    """,
    # list indexing replay of the plan-time-schema UDTF: DuckDB
    # out-of-range list access yields NULL, matching the eval padding
    "udtf_dynamic_schema": """
        WITH t AS (
            SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        )
        SELECT doc_id, toks[1] AS tok0, toks[2] AS tok1, toks[3] AS tok2,
               CAST(GREATEST(len(toks) - 3, 0) AS INTEGER) AS n_extra
        FROM t
    """,
    "agg_heavy_hitters": """
        WITH toks AS (
            SELECT list_filter(regexp_split_to_array(lower(COALESCE(text, '')), '\\s+'), x -> length(x) > 0) AS t
            FROM documents
        )
        SELECT u.term, CAST(COUNT(*) AS BIGINT) AS n
        FROM toks, UNNEST(t) AS u(term)
        GROUP BY u.term
    """,
    "corpus_shuffle_epoch": """
        WITH e AS (
            SELECT ep.epoch, d.doc_id,
                   md5('epoch' || ep.epoch || ':' || CAST(d.doc_id AS VARCHAR)) AS h
            FROM documents d, (SELECT 0 AS epoch UNION ALL SELECT 1) ep
        )
        SELECT epoch, doc_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY epoch ORDER BY h, doc_id) AS BIGINT) AS pos
        FROM e
    """,
    "text_bm25": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(COALESCE(text, '')), '\\s+'), x -> length(x) > 0) AS t
            FROM documents
        ), stats AS (
            SELECT COUNT(*) AS n_docs, AVG(len(t)) AS avgdl FROM toks
        ), tf AS (
            SELECT doc_id, len(t) AS len_d, u.term, COUNT(*) AS tf
            FROM toks, UNNEST(t) AS u(term)
            WHERE u.term IN ('spark', 'vector', 'merge', 'stream')
            GROUP BY doc_id, len(t), u.term
        ), dfreq AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        )
        SELECT tf.doc_id,
               COUNT(*) AS n_terms_matched,
               ROUND(SUM(
                   ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
                   * tf.tf * (1.2 + 1.0)
                   / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.len_d / s.avgdl))
               ), 4) AS score
        FROM tf JOIN dfreq d USING (term) CROSS JOIN stats s
        GROUP BY tf.doc_id
    """,
    # the full hybrid program: per-query BM25 over its own 2-term set
    # (2-addend sums are commutative-exact, no rounding crutch at the
    # shortlist boundary), top-20 lexical shortlist, rounded-cosine
    # re-rank top-5 against the query's embedding
    "retrieval_hybrid": """
        WITH queries(query_id, term) AS (
            VALUES (0, 'spark'), (0, 'stream'),
                   (1, 'vector'), (1, 'merge'),
                   (2, 'spark'), (2, 'vector')
        ), qvec(query_id, vec_id) AS (
            VALUES (0, 0), (1, 1), (2, 2)
        ), toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(lower(COALESCE(text, '')), '\\s+'), x -> length(x) > 0) AS t
            FROM documents
        ), stats AS (
            SELECT COUNT(*) AS n_docs, AVG(len(t)) AS avgdl FROM toks
        ), tf AS (
            SELECT doc_id, len(t) AS len_d, u.term, COUNT(*) AS tf
            FROM toks, UNNEST(t) AS u(term)
            WHERE u.term IN ('merge', 'spark', 'stream', 'vector')
            GROUP BY doc_id, len(t), u.term
        ), dfreq AS (
            SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        ), scored AS (
            SELECT q.query_id, tf.doc_id,
                   SUM(
                       ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
                       * tf.tf * (1.2 + 1.0)
                       / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * tf.len_d / s.avgdl))
                   ) AS bm25_raw
            FROM tf
            JOIN queries q USING (term)
            JOIN dfreq d USING (term)
            CROSS JOIN stats s
            GROUP BY q.query_id, tf.doc_id
        ), shortlist AS (
            SELECT query_id, doc_id, bm25_raw,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY query_id ORDER BY bm25_raw DESC, doc_id ASC
                   ) AS INTEGER) AS lex_rank
            FROM scored
            QUALIFY lex_rank <= 20
        ), reranked AS (
            SELECT sl.query_id, sl.doc_id, sl.lex_rank, sl.bm25_raw,
                   list_cosine_similarity(
                       list_transform(qe.embedding, x -> CAST(x AS DOUBLE)),
                       list_transform(de.embedding, x -> CAST(x AS DOUBLE))
                   ) AS sim_raw
            FROM shortlist sl
            JOIN qvec ON qvec.query_id = sl.query_id
            JOIN embeddings qe ON qe.vec_id = qvec.vec_id
            JOIN embeddings de ON de.vec_id = sl.doc_id
        )
        SELECT CAST(query_id AS INTEGER) AS query_id, doc_id, lex_rank,
               CAST(ROW_NUMBER() OVER (
                   PARTITION BY query_id ORDER BY sim_raw DESC, doc_id ASC
               ) AS INTEGER) AS rank,
               ROUND(bm25_raw, 4) AS bm25,
               ROUND(sim_raw, 6) AS sim
        FROM reranked
        QUALIFY rank <= 5
    """,
    "text_top_terms": f"""
        WITH toks AS (
            SELECT list_filter(regexp_split_to_array(lower(COALESCE(text, '')), '\\s+'), x -> length(x) > 0) AS t
            FROM documents
        ), terms AS (
            SELECT u.term FROM toks, UNNEST(t) AS u(term)
            WHERE u.term NOT IN ({_STOPWORD_LIST})
        )
        SELECT term, COUNT(*) AS n FROM terms
        GROUP BY term ORDER BY n DESC, term ASC LIMIT 20
    """,
    "doc_hash_split": """
        WITH fp AS (
            SELECT doc_id,
                   substring(md5(md5(regexp_replace(lower(trim(COALESCE(text, ''))), '\\s+', ' ', 'g'))), 1, 1) AS c
            FROM documents
        )
        SELECT doc_id,
               CASE WHEN c IN ('0','1','2','3','4','5','6','7','8','9','a','b') THEN 'train'
                    WHEN c IN ('c','d') THEN 'val'
                    ELSE 'test' END AS split
        FROM fp
    """,
    "decontaminate_ngram": """
        WITH toks AS (
            SELECT doc_id,
                   -- guarded like the Spark tokens(): NULL/blank text -> []
                   -- (the len(t)<n branch then yields the same single '' shingle)
                   list_filter(regexp_split_to_array(COALESCE(text, ''), '\\s+'), x -> length(x) > 0) AS t
            FROM documents
        ), sh_raw AS (
            SELECT doc_id,
                   CASE WHEN len(t) < 4 THEN [COALESCE(array_to_string(t, ' '), '')]
                        ELSE list_transform(range(1, len(t) - 2), i -> array_to_string(t[i:i+3], ' '))
                   END AS sh
            FROM toks
        ), shingles AS (
            SELECT DISTINCT doc_id, u.shingle FROM sh_raw, UNNEST(sh) AS u(shingle)
        ), bench AS (
            SELECT DISTINCT shingle FROM shingles WHERE doc_id % 97 = 0
        ), contaminated AS (
            SELECT DISTINCT s.doc_id FROM shingles s JOIN bench b ON s.shingle = b.shingle
            WHERE s.doc_id % 97 <> 0
        )
        SELECT doc_id FROM documents
        WHERE doc_id % 97 <> 0
          AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    """,
    # exact-substring decontamination: the dedup_exact_substring
    # window CTE (distinct 16-token windows, short docs emit nothing)
    # with the benchmark split and an anti-join — corpus docs sharing
    # any verbatim window with a % 19 == 0 benchmark doc drop
    "decontaminate_exact_substring": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(COALESCE(text, ''), '\\s+'), x -> length(x) > 0) AS t
            FROM documents
        ), wins AS (
            SELECT DISTINCT doc_id,
                   list_aggregate(t[i:i+15], 'string_agg', ' ') AS w
            FROM toks, unnest(range(1, len(t) - 14)) AS u(i)
            WHERE len(t) >= 16
        ), bench AS (
            SELECT DISTINCT w FROM wins WHERE doc_id % 19 = 0
        ), contaminated AS (
            SELECT DISTINCT c.doc_id
            FROM wins c JOIN bench b ON c.w = b.w
            WHERE c.doc_id % 19 <> 0
        )
        SELECT doc_id FROM documents
        WHERE doc_id % 19 <> 0
          AND doc_id NOT IN (SELECT doc_id FROM contaminated)
    """,
    "dedup_exact": """
        SELECT text, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        FROM documents GROUP BY text
    """,
    # exact-substring truth computed DIRECTLY (distinct 16-token
    # windows per doc -> pair join on window equality): the Spark
    # side's hash buckets have recall 1.0 (equal strings hash equal)
    # and the verify stage counts string-equal windows, so no
    # candidate replay is needed. ORDER BY inside list_aggregate is
    # unnecessary: t[i:i+15] is DuckDB's 1-based inclusive slice
    "dedup_exact_substring": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(COALESCE(text, ''), '\\s+'), x -> length(x) > 0) AS t
            FROM documents
        ), wins AS (
            SELECT DISTINCT doc_id,
                   list_aggregate(t[i:i+15], 'string_agg', ' ') AS w
            FROM toks, unnest(range(1, len(t) - 14)) AS u(i)
            WHERE len(t) >= 16
        )
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               COUNT(*) AS n_shared_windows
        FROM wins a JOIN wins b ON a.w = b.w AND a.doc_id < b.doc_id
        GROUP BY 1, 2
        ORDER BY id_a, id_b
    """,
    # containment truth computed DIRECTLY (all co-occurring pairs ->
    # exact |src∩dst| / |src|): the Spark side's prefix filter has
    # recall 1.0 by pigeonhole, so no candidate replay is needed (the
    # SimHash-oracle rule, not the MinHash one); threshold compare in
    # exact integers on both sides
    "dedup_containment": """
        WITH tk0 AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(COALESCE(text, ''), '\\s+'), x -> length(x) > 0) AS t
            FROM documents
        ), corpus AS (
            SELECT doc_id, t FROM tk0
            UNION ALL
            SELECT doc_id + 20000000 AS doc_id, t[1:len(t) // 2] AS t
            FROM tk0 WHERE doc_id % 97 = 0 AND len(t) >= 8
        ), sh_raw AS (
            SELECT doc_id,
                   CASE WHEN len(t) < 3 THEN [COALESCE(array_to_string(t, ' '), '')]
                        ELSE list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
                   END AS sh
            FROM corpus
        ), shingles AS (
            -- empty-doc guard mirrors containment_pairs: zero-token
            -- docs shingle to {''} and would pair quadratically
            SELECT DISTINCT doc_id, u.shingle
            FROM sh_raw, UNNEST(sh) AS u(shingle)
            WHERE u.shingle <> ''
        ), sizes AS (
            SELECT doc_id, COUNT(*) AS n_src FROM shingles GROUP BY doc_id
        ), inter AS (
            SELECT a.doc_id AS src_id, b.doc_id AS dst_id, COUNT(*) AS n_common
            FROM shingles a JOIN shingles b
              ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
            GROUP BY 1, 2
        )
        SELECT src_id, dst_id,
               CAST(s.n_src AS BIGINT) AS n_src,
               CAST(n_common AS BIGINT) AS n_common,
               CAST(n_common AS DOUBLE) / s.n_src AS containment
        FROM inter JOIN sizes s ON s.doc_id = src_id
        WHERE 10 * n_common >= 9 * s.n_src
    """,
    # url fixture construction + canonicalization replayed literally:
    # all string ops (regexp subset common to Java and RE2), no floats
    "dedup_url": """
        WITH raw AS (
            SELECT doc_id,
                   CASE doc_id % 4
                     WHEN 0 THEN 'https://www.' || source || '.example.com/docs/' || (doc_id % 50) || '?b=2&a=1'
                     WHEN 1 THEN 'HTTPS://WWW.' || upper(source) || '.EXAMPLE.COM:443/docs/' || (doc_id % 50) || '?a=1&b=2#ref'
                     WHEN 2 THEN 'https://www.' || source || '.example.com/docs/' || (doc_id % 50) || '/?a=1&b=2'
                     ELSE 'http://www.' || source || '.example.com:80/docs/' || (doc_id % 50) || '?a=1&b=2'
                   END AS url
            FROM documents
        ), parts AS (
            SELECT doc_id,
                   lower(regexp_extract(regexp_replace(url, '#.*', ''), '^([^:/?]+)://', 1)) AS scheme,
                   regexp_replace(regexp_replace(url, '#.*', ''), '^[^:/?]+://', '') AS after
            FROM raw
        ), comps AS (
            SELECT doc_id, scheme,
                   lower(regexp_extract(after, '^([^/?]+)', 1)) AS hostport,
                   regexp_replace(after, '^[^/?]+', '') AS pathquery
            FROM parts
        ), norm AS (
            SELECT doc_id, scheme,
                   CASE WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
                        WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
                        ELSE hostport END AS host,
                   regexp_extract(pathquery, '^([^?]*)', 1) AS path,
                   regexp_extract(pathquery, '\\?(.*)$', 1) AS query
            FROM comps
        ), canon AS (
            SELECT doc_id,
                   scheme || '://' || host ||
                   CASE WHEN path = '' OR path = '/' THEN '/' ELSE regexp_replace(path, '/$', '') END ||
                   CASE WHEN query = '' THEN '' ELSE '?' || array_to_string(list_sort(string_split(query, '&')), '&') END
                   AS canonical_url
            FROM norm
        )
        SELECT canonical_url, MIN(doc_id) AS keep_doc_id, COUNT(*) AS n_variants
        FROM canon GROUP BY canonical_url
    """,
    "dedup_incremental": """
        WITH batch AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0
        ), existing AS (
            SELECT text FROM documents WHERE doc_id % 3 <> 0
        ), batch_rep AS (
            SELECT text, MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
            FROM batch GROUP BY text
        )
        SELECT b.doc_id, b.n_copies
        FROM batch_rep b
        -- null-safe like the Spark <=> anti-join: a NULL-text batch rep
        -- is dropped when the corpus already holds a NULL-text doc
        WHERE NOT EXISTS (
            SELECT 1 FROM existing e WHERE e.text IS NOT DISTINCT FROM b.text
        )
    """,
    "dedup_passage": """
        WITH toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(COALESCE(text, ''), '\\s+'), x -> length(x) > 0) AS t
            FROM documents
        ), pas AS (
            SELECT doc_id, CAST(u.i AS INTEGER) AS pidx,
                   array_to_string(t[(CAST(u.i AS INTEGER) * 32 + 1):(CAST(u.i AS INTEGER) * 32 + 32)], ' ') AS passage
            FROM toks, UNNEST(range(0, CAST(ceil(len(t) / 32.0) AS BIGINT))) AS u(i)
        ), flagged AS (
            -- first global (doc_id, pidx) occurrence of each passage wins
            SELECT doc_id, pidx, passage,
                   ROW_NUMBER() OVER (PARTITION BY passage ORDER BY doc_id, pidx) = 1 AS kept
            FROM pas
        ), rebuilt AS (
            SELECT doc_id,
                   COUNT(*) AS n_passages,
                   COUNT(*) FILTER (WHERE kept) AS n_kept,
                   md5(COALESCE(string_agg(passage, ' ' ORDER BY pidx) FILTER (WHERE kept), '')) AS rebuilt_md5
            FROM flagged GROUP BY doc_id
        )
        SELECT d.doc_id,
               COALESCE(r.n_passages, 0) AS n_passages,
               COALESCE(r.n_kept, 0) AS n_kept,
               COALESCE(r.n_passages, 0) - COALESCE(r.n_kept, 0) AS n_dropped,
               COALESCE(r.rebuilt_md5, md5('')) AS rebuilt_md5
        FROM documents d LEFT JOIN rebuilt r USING (doc_id)
    """,
    "dedup_ngram_jaccard": f"""
        WITH {_JACCARD_INTER_CTES}
        SELECT id_a, id_b,
               CAST(n_inter AS DOUBLE) / (sa.set_size + sb.set_size - n_inter) AS jaccard
        FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(n_inter AS DOUBLE) / (sa.set_size + sb.set_size - n_inter) >= 0.5
    """,
    "dedup_clusters": f"""
        WITH {_JACCARD_INTER_CTES}, pairs AS (
            SELECT id_a, id_b FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(n_inter AS DOUBLE) / (sa.set_size + sb.set_size - n_inter) >= 0.5
        ), und AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION SELECT id_b, id_a FROM pairs
        ), members AS (
            SELECT DISTINCT src AS doc_id FROM und
        ), reach AS (
            WITH RECURSIVE r(node, root) AS (
                SELECT doc_id, doc_id FROM members
                UNION
                SELECT e.dst, r.root FROM r JOIN und e ON e.src = r.node
            )
            SELECT node, MIN(root) AS component FROM r GROUP BY node
        )
        SELECT node AS doc_id, component FROM reach
    """,
    "split_leakage_safe": f"""
        WITH {_JACCARD_INTER_CTES}, prs AS (
            SELECT id_a, id_b FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(n_inter AS DOUBLE) / (sa.set_size + sb.set_size - n_inter) >= 0.5
        ), und AS (
            SELECT id_a AS src, id_b AS dst FROM prs
            UNION SELECT id_b, id_a FROM prs
        ), members AS (
            SELECT DISTINCT src AS doc_id FROM und
        ), reach AS (
            WITH RECURSIVE r(node, root) AS (
                SELECT doc_id, doc_id FROM members
                UNION
                SELECT e.dst, r.root FROM r JOIN und e ON e.src = r.node
            )
            SELECT node, MIN(root) AS component FROM r GROUP BY node
        ), grouped AS (
            SELECT d.doc_id,
                   CAST(COALESCE(rc.component, d.doc_id) AS BIGINT) AS group_id
            FROM documents d LEFT JOIN reach rc ON rc.node = d.doc_id
        )
        SELECT doc_id, group_id,
               CASE WHEN substring(md5(CAST(group_id AS VARCHAR)), 1, 1)
                         IN ('0','1','2','3','4','5','6','7','8','9','a','b') THEN 'train'
                    WHEN substring(md5(CAST(group_id AS VARCHAR)), 1, 1) IN ('c','d') THEN 'val'
                    ELSE 'test' END AS split
        FROM grouped
    """,
    "dedup_keep_best": f"""
        WITH {_JACCARD_INTER_CTES}, pairs AS (
            SELECT id_a, id_b FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(n_inter AS DOUBLE) / (sa.set_size + sb.set_size - n_inter) >= 0.5
        ), und AS (
            SELECT id_a AS src, id_b AS dst FROM pairs
            UNION SELECT id_b, id_a FROM pairs
        ), members AS (
            SELECT DISTINCT src AS doc_id FROM und
        ), reach AS (
            WITH RECURSIVE r(node, root) AS (
                SELECT doc_id, doc_id FROM members
                UNION
                SELECT e.dst, r.root FROM r JOIN und e ON e.src = r.node
            )
            SELECT node, MIN(root) AS component FROM r GROUP BY node
        ), qt AS (
            SELECT doc_id,
                   len({_TOKENS}) AS n_tok,
                   length(COALESCE(text, '')) AS n_chars,
                   length(regexp_replace(COALESCE(text, ''), '[^.,;:!?]', '', 'g')) AS n_punct,
                   len(list_filter({_TOKENS}, x -> x IN ({_STOPWORD_LIST}))) AS n_stop
            FROM documents
        ), qual AS (
            SELECT doc_id,
                   LEAST(CAST(n_tok AS DOUBLE) / 64.0, 1.0) * 0.5
                 + LEAST((CASE WHEN n_tok = 0 THEN 0.0 ELSE CAST(n_stop AS DOUBLE) / n_tok END) * 4.0, 1.0) * 0.3
                 + (0.2 - LEAST((CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(n_punct AS DOUBLE) / n_chars END) * 10.0, 1.0) * 0.2) AS q
            FROM qt
        ), ranked AS (
            SELECT r.component, r.node AS doc_id, qual.q,
                   ROW_NUMBER() OVER (PARTITION BY r.component ORDER BY qual.q DESC, r.node ASC) AS rn,
                   COUNT(*) OVER (PARTITION BY r.component) AS n_members
            FROM reach r JOIN qual ON qual.doc_id = r.node
        )
        SELECT component, doc_id AS kept_doc_id, q AS kept_quality,
               CAST(n_members AS BIGINT) AS n_members
        FROM ranked WHERE rn = 1
    """,
    "dedup_pipeline_keep": f"""
        WITH fp AS (
            SELECT doc_id, md5(regexp_replace(lower(trim(COALESCE(text, ''))), '\\s+', ' ', 'g')) AS f
            FROM documents
        ), exact_kept AS (
            SELECT MIN(doc_id) AS doc_id FROM fp GROUP BY f
        ), survivors AS (
            SELECT d.doc_id, d.text FROM documents d JOIN exact_kept k ON d.doc_id = k.doc_id
        ), toks AS (
            SELECT doc_id,
                   list_filter(regexp_split_to_array(COALESCE(text, ''), '\\s+'), x -> length(x) > 0) AS t
            FROM survivors
        ), sh_raw AS (
            SELECT doc_id,
                   CASE WHEN len(t) < 3 THEN [COALESCE(array_to_string(t, ' '), '')]
                        ELSE list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
                   END AS sh
            FROM toks
        ), shingles AS (
            SELECT DISTINCT doc_id, u.shingle FROM sh_raw, UNNEST(sh) AS u(shingle)
        ), sizes AS (
            SELECT doc_id, COUNT(*) AS set_size FROM shingles GROUP BY doc_id
        ), cold AS (
            SELECT shingle FROM shingles GROUP BY shingle
            HAVING COUNT(*) <= {_SHINGLE_DF_CAP}
        ), capped AS (
            SELECT s.doc_id, s.shingle FROM shingles s JOIN cold c ON s.shingle = c.shingle
        ), inter AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
            FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
            GROUP BY 1, 2
        ), prs AS (
            SELECT id_a, id_b FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE CAST(n_inter AS DOUBLE) / (sa.set_size + sb.set_size - n_inter) >= 0.5
        ), und AS (
            SELECT id_a AS src, id_b AS dst FROM prs UNION SELECT id_b, id_a FROM prs
        ), mem AS (
            SELECT DISTINCT src AS doc_id FROM und
        ), reach AS (
            WITH RECURSIVE r(node, root) AS (
                SELECT doc_id, doc_id FROM mem
                UNION
                SELECT e.dst, r.root FROM r JOIN und e ON e.src = r.node
            )
            SELECT node, MIN(root) AS component FROM r GROUP BY node
        )
        SELECT s.doc_id FROM survivors s
        WHERE s.doc_id NOT IN (SELECT doc_id FROM mem)
        UNION ALL
        SELECT DISTINCT component AS doc_id FROM reach
    """,
    "text_quality_filter": f"""
        WITH t AS (
            SELECT doc_id, lang,
                   len({_TOKENS}) AS n_tok,
                   length(COALESCE(text, '')) AS n_chars,
                   length(regexp_replace(COALESCE(text, ''), '[^.,;:!?]', '', 'g')) AS n_punct,
                   len(list_filter({_TOKENS}, x -> x IN ({_STOPWORD_LIST}))) AS n_stop
            FROM documents
        ), scored AS (
            SELECT doc_id, lang,
                   LEAST(CAST(n_tok AS DOUBLE) / 64.0, 1.0) * 0.5
                 + LEAST((CASE WHEN n_tok = 0 THEN 0.0 ELSE CAST(n_stop AS DOUBLE) / n_tok END) * 4.0, 1.0) * 0.3
                 + (0.2 - LEAST((CASE WHEN n_chars = 0 THEN 0.0 ELSE CAST(n_punct AS DOUBLE) / n_chars END) * 10.0, 1.0) * 0.2) AS q
            FROM t
        ), gated AS (
            SELECT doc_id, lang, q,
                   quantile_cont(q, 0.5) OVER (PARTITION BY lang) AS med
            FROM scored
        )
        SELECT doc_id, lang, q FROM gated WHERE q >= med
    """,
    "text_zscore_by_lang": """
        WITH stats AS (
            SELECT doc_id, lang, n_chars,
                   AVG(n_chars) OVER (PARTITION BY lang) AS mu,
                   STDDEV_SAMP(n_chars) OVER (PARTITION BY lang) AS sigma
            FROM documents
        )
        SELECT doc_id, lang, n_chars,
               CASE WHEN sigma IS NULL OR sigma = 0 THEN 0.0
                    ELSE ROUND((n_chars - mu) / sigma, 6) END AS z_chars
        FROM stats
    """,
    # the portable-LSH replay: integer planes from md5 (the
    # portable_hash60 parse), floor-quantized vectors, exact int64
    # bucket dots, Hamming-1 probes, rounded-cosine rerank — every
    # stage engine-neutral (operators/simsearch.py:portable_lsh_topk)
    "simsearch_lsh_portable": """
        WITH coef AS (
            SELECT t.g AS t, b.g AS b, d.g AS d,
                   (CAST('0x' || substr(md5('lshp:' || t.g || ':' || b.g || ':' || d.g), 1, 15) AS BIGINT) % 5) - 2 AS c
            FROM generate_series(0, 11) t(g),
                 generate_series(0, 7) b(g),
                 generate_series(0, 63) d(g)
        ), z AS (
            SELECT vec_id,
                   unnest(range(0, len(embedding))) AS d,
                   CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000.0) AS BIGINT) AS z
            FROM embeddings
        ), bits AS (
            SELECT vec_id, coef.t, coef.b,
                   CASE WHEN SUM(z.z * coef.c) >= 0 THEN 1 ELSE 0 END AS bit
            FROM z JOIN coef ON coef.d = z.d
            GROUP BY vec_id, coef.t, coef.b
        ), buckets AS (
            SELECT vec_id, t, CAST(SUM(bit * (1 << b)) AS INTEGER) AS bucket
            FROM bits GROUP BY vec_id, t
        ), probes AS (
            SELECT vec_id AS query_id, t,
                   unnest([bucket, xor(bucket, 1), xor(bucket, 2),
                           xor(bucket, 4), xor(bucket, 8), xor(bucket, 16),
                           xor(bucket, 32), xor(bucket, 64),
                           xor(bucket, 128)]) AS bucket
            FROM buckets WHERE vec_id < 10
        ), cands AS (
            SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id
            FROM probes p JOIN buckets c ON c.t = p.t AND c.bucket = p.bucket
            WHERE c.vec_id <> p.query_id
        ), scored AS (
            SELECT cands.query_id, cands.neighbor_id,
                   list_cosine_similarity(
                       list_transform(qe.embedding, x -> CAST(x AS DOUBLE)),
                       list_transform(ce.embedding, x -> CAST(x AS DOUBLE))
                   ) AS sim_raw
            FROM cands
            JOIN embeddings qe ON qe.vec_id = cands.query_id
            JOIN embeddings ce ON ce.vec_id = cands.neighbor_id
        ), ranked AS (
            SELECT query_id, neighbor_id,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY query_id ORDER BY sim_raw DESC, neighbor_id ASC
                   ) AS INTEGER) AS rank,
                   ROUND(sim_raw, 6) AS sim
            FROM scored
        )
        SELECT query_id, neighbor_id, rank, sim FROM ranked WHERE rank <= 5
    """,
    # portable near-dup replay: the planted corpus, the ndp-tagged
    # integer planes (4 tables x 16 bits), the bucket-collision
    # candidate self-join, and the rounded-cosine verification — the
    # full banding is replayed because LSH candidate recall is
    # probabilistic (the MinHash rule; identical vectors make planted
    # recall 1.0, but the ORACLE must mirror the candidate set, not
    # assume it) (operators/simsearch.py:portable_near_dup_pairs)
    "embedding_neardup_portable": """
        WITH corpus AS (
            SELECT vec_id, embedding FROM embeddings
            UNION ALL
            SELECT vec_id + 10000000 AS vec_id, embedding
            FROM embeddings WHERE vec_id % 100 = 0
        ), coef AS (
            SELECT t.g AS t, b.g AS b, d.g AS d,
                   (CAST('0x' || substr(md5('ndp:' || t.g || ':' || b.g || ':' || d.g), 1, 15) AS BIGINT) % 5) - 2 AS c
            FROM generate_series(0, 3) t(g),
                 generate_series(0, 15) b(g),
                 generate_series(0, 63) d(g)
        ), z AS (
            SELECT vec_id,
                   unnest(range(0, len(embedding))) AS d,
                   CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000.0) AS BIGINT) AS z
            FROM corpus
        ), bits AS (
            SELECT vec_id, coef.t, coef.b,
                   CASE WHEN SUM(z.z * coef.c) >= 0 THEN 1 ELSE 0 END AS bit
            FROM z JOIN coef ON coef.d = z.d
            GROUP BY vec_id, coef.t, coef.b
        ), buckets AS (
            SELECT vec_id, t, CAST(SUM(bit * (1 << b)) AS INTEGER) AS bucket
            FROM bits GROUP BY vec_id, t
        ), cands AS (
            SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
            FROM buckets a JOIN buckets b ON a.t = b.t AND a.bucket = b.bucket
            WHERE a.vec_id < b.vec_id
        ), scored AS (
            SELECT id_a, id_b,
                   ROUND(list_cosine_similarity(
                       list_transform(ea.embedding, x -> CAST(x AS DOUBLE)),
                       list_transform(eb.embedding, x -> CAST(x AS DOUBLE))
                   ), 6) AS sim
            FROM cands
            JOIN corpus ea ON ea.vec_id = cands.id_a
            JOIN corpus eb ON eb.vec_id = cands.id_b
        )
        SELECT id_a, id_b, sim FROM scored WHERE sim >= 0.9
    """,
    # portable IVF replay: md5-ranked centroid sample, exact int64
    # squared-L2 assignment/probing over floor-quantized vectors,
    # rounded-cosine rerank (operators/simsearch.py:portable_ivf_topk)
    "simsearch_ivf_portable": """
        WITH z AS (
            SELECT vec_id, unnest(range(0, len(embedding))) AS d,
                   CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000.0) AS BIGINT) AS z
            FROM embeddings
        ), cents AS (
            SELECT vec_id AS cid,
                   ROW_NUMBER() OVER (
                       ORDER BY CAST('0x' || substr(md5('ivfc:' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT),
                                vec_id
                   ) - 1 AS crank
            FROM embeddings
            ORDER BY CAST('0x' || substr(md5('ivfc:' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT),
                     vec_id
            LIMIT 32
        ), cz AS (
            SELECT cents.crank, z.d, z.z
            FROM z JOIN cents ON z.vec_id = cents.cid
        ), dist AS (
            SELECT z.vec_id, cz.crank,
                   SUM((z.z - cz.z) * (z.z - cz.z)) AS d2
            FROM z JOIN cz ON z.d = cz.d GROUP BY 1, 2
        ), ranked_cells AS (
            SELECT vec_id, crank,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, crank) AS rn
            FROM dist
        ), assign AS (
            SELECT vec_id, crank AS cell FROM ranked_cells WHERE rn = 1
        ), probes AS (
            SELECT vec_id AS query_id, crank AS cell FROM ranked_cells
            WHERE rn <= 16 AND vec_id < 10
        ), cands AS (
            SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id
            FROM probes p JOIN assign a ON a.cell = p.cell
            WHERE a.vec_id <> p.query_id
        ), scored AS (
            SELECT cands.query_id, cands.neighbor_id,
                   list_cosine_similarity(
                       list_transform(qe.embedding, x -> CAST(x AS DOUBLE)),
                       list_transform(ce.embedding, x -> CAST(x AS DOUBLE))
                   ) AS sim_raw
            FROM cands
            JOIN embeddings qe ON qe.vec_id = cands.query_id
            JOIN embeddings ce ON ce.vec_id = cands.neighbor_id
        ), ranked AS (
            SELECT query_id, neighbor_id,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY query_id ORDER BY sim_raw DESC, neighbor_id ASC
                   ) AS INTEGER) AS rank,
                   ROUND(sim_raw, 6) AS sim
            FROM scored
        )
        SELECT query_id, neighbor_id, rank, sim FROM ranked WHERE rank <= 5
    """,
    # portable PQ replay: md5-ranked codeword sources, per-subspace
    # exact int64 encode (argmin squared-L2 over the 4-dim slices,
    # ties to the smaller codeword rank), exact int64 ADC shortlist
    # (distance asc, id asc), rounded-cosine rerank
    # (operators/simsearch.py:portable_pq_topk; m=16, ks=16, S=100)
    "simsearch_pq_portable": """
        WITH z AS (
            SELECT vec_id, unnest(range(0, len(embedding))) AS d,
                   CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000.0) AS BIGINT) AS z
            FROM embeddings
        ), cw AS (
            SELECT vec_id AS cid,
                   ROW_NUMBER() OVER (
                       ORDER BY CAST('0x' || substr(md5('pqc:' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT),
                                vec_id
                   ) - 1 AS crank
            FROM embeddings
            ORDER BY CAST('0x' || substr(md5('pqc:' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT),
                     vec_id
            LIMIT 16
        ), book AS (
            SELECT cw.crank, z.d // 4 AS j, z.d, z.z
            FROM z JOIN cw ON z.vec_id = cw.cid
        ), cdist AS (
            SELECT z.vec_id, book.j, book.crank,
                   SUM((z.z - book.z) * (z.z - book.z)) AS d2
            FROM z JOIN book ON z.d = book.d
            GROUP BY 1, 2, 3
        ), codes AS (
            SELECT vec_id, j, crank AS code FROM (
                SELECT vec_id, j, crank,
                       ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d2, crank) AS rn
                FROM cdist
            ) WHERE rn = 1
        ), approx AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   SUM(q.d2) AS ad2
            FROM codes c
            JOIN cdist q ON q.j = c.j AND q.crank = c.code
            WHERE q.vec_id < 10 AND c.vec_id <> q.vec_id
            GROUP BY 1, 2
        ), shortlist AS (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ad2, neighbor_id) AS rn
                FROM approx
            ) WHERE rn <= 100
        ), scored AS (
            SELECT s.query_id, s.neighbor_id,
                   list_cosine_similarity(
                       list_transform(qe.embedding, x -> CAST(x AS DOUBLE)),
                       list_transform(ce.embedding, x -> CAST(x AS DOUBLE))
                   ) AS sim_raw
            FROM shortlist s
            JOIN embeddings qe ON qe.vec_id = s.query_id
            JOIN embeddings ce ON ce.vec_id = s.neighbor_id
        ), ranked AS (
            SELECT query_id, neighbor_id,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY query_id ORDER BY sim_raw DESC, neighbor_id ASC
                   ) AS INTEGER) AS rank,
                   ROUND(sim_raw, 6) AS sim
            FROM scored
        )
        SELECT query_id, neighbor_id, rank, sim FROM ranked WHERE rank <= 5
    """,
    # portable IVF+PQ replay: the ivfc cell program (LIMIT 16 prefix
    # of the same md5 ranking, assignment rn=1, probes rn<=8) composed
    # with the pqc code/ADC program, candidates masked to probed cells
    # (operators/simsearch.py:portable_ivfpq_topk; C=16, P=8, m=16,
    # ks=16, S=100)
    "simsearch_ivfpq_portable": """
        WITH z AS (
            SELECT vec_id, unnest(range(0, len(embedding))) AS d,
                   CAST(FLOOR(CAST(unnest(embedding) AS DOUBLE) * 1000.0) AS BIGINT) AS z
            FROM embeddings
        ), cents AS (
            SELECT vec_id AS cid,
                   ROW_NUMBER() OVER (
                       ORDER BY CAST('0x' || substr(md5('ivfc:' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT),
                                vec_id
                   ) - 1 AS crank
            FROM embeddings
            ORDER BY CAST('0x' || substr(md5('ivfc:' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT),
                     vec_id
            LIMIT 16
        ), czc AS (
            SELECT cents.crank, z.d, z.z FROM z JOIN cents ON z.vec_id = cents.cid
        ), cdistc AS (
            SELECT z.vec_id, czc.crank, SUM((z.z - czc.z) * (z.z - czc.z)) AS d2
            FROM z JOIN czc ON z.d = czc.d GROUP BY 1, 2
        ), ranked_cells AS (
            SELECT vec_id, crank,
                   ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, crank) AS rn
            FROM cdistc
        ), assign AS (
            SELECT vec_id, crank AS cell FROM ranked_cells WHERE rn = 1
        ), probes AS (
            SELECT vec_id AS query_id, crank AS cell FROM ranked_cells
            WHERE rn <= 8 AND vec_id < 10
        ), cw AS (
            SELECT vec_id AS cid,
                   ROW_NUMBER() OVER (
                       ORDER BY CAST('0x' || substr(md5('pqc:' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT),
                                vec_id
                   ) - 1 AS crank
            FROM embeddings
            ORDER BY CAST('0x' || substr(md5('pqc:' || CAST(vec_id AS VARCHAR)), 1, 15) AS BIGINT),
                     vec_id
            LIMIT 16
        ), book AS (
            SELECT cw.crank, z.d // 4 AS j, z.d, z.z
            FROM z JOIN cw ON z.vec_id = cw.cid
        ), cdist AS (
            SELECT z.vec_id, book.j, book.crank,
                   SUM((z.z - book.z) * (z.z - book.z)) AS d2
            FROM z JOIN book ON z.d = book.d
            GROUP BY 1, 2, 3
        ), codes AS (
            SELECT vec_id, j, crank AS code FROM (
                SELECT vec_id, j, crank,
                       ROW_NUMBER() OVER (PARTITION BY vec_id, j ORDER BY d2, crank) AS rn
                FROM cdist
            ) WHERE rn = 1
        ), approx AS (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   SUM(q.d2) AS ad2
            FROM codes c
            JOIN assign a ON a.vec_id = c.vec_id
            JOIN probes p ON p.cell = a.cell
            JOIN cdist q ON q.vec_id = p.query_id AND q.j = c.j AND q.crank = c.code
            WHERE c.vec_id <> p.query_id
            GROUP BY 1, 2
        ), shortlist AS (
            SELECT query_id, neighbor_id FROM (
                SELECT query_id, neighbor_id,
                       ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY ad2, neighbor_id) AS rn
                FROM approx
            ) WHERE rn <= 100
        ), scored AS (
            SELECT s.query_id, s.neighbor_id,
                   list_cosine_similarity(
                       list_transform(qe.embedding, x -> CAST(x AS DOUBLE)),
                       list_transform(ce.embedding, x -> CAST(x AS DOUBLE))
                   ) AS sim_raw
            FROM shortlist s
            JOIN embeddings qe ON qe.vec_id = s.query_id
            JOIN embeddings ce ON ce.vec_id = s.neighbor_id
        ), ranked AS (
            SELECT query_id, neighbor_id,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY query_id ORDER BY sim_raw DESC, neighbor_id ASC
                   ) AS INTEGER) AS rank,
                   ROUND(sim_raw, 6) AS sim
            FROM scored
        )
        SELECT query_id, neighbor_id, rank, sim FROM ranked WHERE rank <= 5
    """,
    "simsearch_topk": """
        WITH q AS (
            SELECT vec_id AS query_id, embedding AS q_vec FROM embeddings WHERE vec_id < 10
        ), scored AS (
            SELECT q.query_id, c.vec_id AS neighbor_id,
                   list_cosine_similarity(
                       list_transform(q.q_vec, x -> CAST(x AS DOUBLE)),
                       list_transform(c.embedding, x -> CAST(x AS DOUBLE))
                   ) AS sim_raw
            FROM q JOIN embeddings c ON c.vec_id <> q.query_id
        ), ranked AS (
            SELECT query_id, neighbor_id,
                   CAST(ROW_NUMBER() OVER (
                       PARTITION BY query_id ORDER BY sim_raw DESC, neighbor_id ASC
                   ) AS INTEGER) AS rank,
                   ROUND(sim_raw, 6) AS sim
            FROM scored
        )
        SELECT query_id, neighbor_id, rank, sim FROM ranked WHERE rank <= 5
    """,
    "multimodal_meta": """
        SELECT doc_id, 'text/plain;fake' AS mime,
               CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
               sha256(text) AS sha256
        FROM documents
    """,
    # REAL-decode replay: the oracle regenerates the portable-md5
    # pixel bytes the BMP ENCODER serialized, so it checks what the
    # numpy DECODER recovered through the actual file format (stride
    # padding, bottom-up flip, data offset) — a parser bug is a value
    # mismatch (operators/multimodal.py:decode_bmp)
    "multimodal_decode_real": """
        WITH dims AS (
            SELECT doc_id,
                   CAST(5 + doc_id % 4 AS INTEGER) AS width,
                   CAST(3 + doc_id % 5 AS INTEGER) AS height
            FROM documents
        ), px AS (
            SELECT doc_id, width, height,
                   unnest(range(0, width * height * 3)) AS p
            FROM dims
        )
        SELECT doc_id, width, height,
               CAST(SUM(CAST('0x' || substr(md5('bmp:' || doc_id || ':' || p), 1, 15) AS BIGINT) % 256) AS BIGINT) AS pixel_sum
        FROM px
        GROUP BY doc_id, width, height
    """,
    # REAL PNG replay: the oracle regenerates the portable-md5 pixel
    # bytes the PNG ENCODER compressed (DEFLATE + per-row filter
    # cycle), so it checks what the stdlib-zlib/numpy DECODER
    # recovered through the actual compressed format — a chunk-walk,
    # inflate, or filter-reconstruction bug is a value mismatch
    # (operators/multimodal.py:decode_png)
    "multimodal_png_decode": """
        WITH dims AS (
            SELECT doc_id,
                   CAST(4 + doc_id % 5 AS INTEGER) AS width,
                   CAST(5 + doc_id % 4 AS INTEGER) AS height
            FROM documents
        ), px AS (
            SELECT doc_id, width, height,
                   unnest(range(0, width * height * 3)) AS p
            FROM dims
        )
        SELECT doc_id, width, height,
               CAST(SUM(CAST('0x' || substr(md5('png:' || doc_id || ':' || p), 1, 15) AS BIGINT) % 256) AS BIGINT) AS pixel_sum
        FROM px
        GROUP BY doc_id, width, height
    """,
    # REAL JPEG replay: flat-per-block fixture + DC quant step 8 make
    # the lossy pipeline bit-exact (operators/multimodal.py:make_jpeg
    # docstring has the divisibility argument), so the oracle just
    # regenerates per-block gray values — each flat 8x8 block
    # contributes 64 pixels x 3 RGB channels x value to pixel_sum
    "multimodal_jpeg_decode": """
        WITH dims AS (
            SELECT doc_id,
                   CAST(8 * (1 + doc_id % 3) AS INTEGER) AS width,
                   CAST(8 * (1 + doc_id % 4) AS INTEGER) AS height
            FROM documents
        ), blocks AS (
            SELECT doc_id, width, height,
                   unnest(range(0, (width // 8) * (height // 8))) AS b
            FROM dims
        )
        SELECT doc_id, width, height,
               CAST(SUM((CAST('0x' || substr(md5('jpeg:' || doc_id || ':' || b), 1, 15) AS BIGINT) % 256) * 192) AS BIGINT) AS pixel_sum
        FROM blocks
        GROUP BY doc_id, width, height
    """,
    # palette-PNG replay: pixel RGB sum is the closed form
    # 255 + (7*idx mod 256) per the fixture palette, idx portable-md5
    "multimodal_png8_decode": """
        WITH dims AS (
            SELECT doc_id,
                   CAST(4 + doc_id % 5 AS INTEGER) AS width,
                   CAST(5 + doc_id % 4 AS INTEGER) AS height
            FROM documents
        ), px AS (
            SELECT doc_id, width, height,
                   unnest(range(0, width * height)) AS p
            FROM dims
        )
        SELECT doc_id, width, height,
               CAST(SUM(255 + (CAST('0x' || substr(md5('png8:' || doc_id || ':' || p), 1, 15) AS BIGINT) % 256) * 7 % 256) AS BIGINT) AS pixel_sum
        FROM px
        GROUP BY doc_id, width, height
    """,
    # DRI JPEG replay: same flat-block bit-exactness argument as the
    # baseline key; the restart machinery (realign, RSTm sequence,
    # predictor resets) changes the bitstream, not the decoded pixels
    "multimodal_jpeg_dri_decode": """
        WITH dims AS (
            SELECT doc_id,
                   CAST(8 * (2 + doc_id % 3) AS INTEGER) AS width,
                   CAST(8 * (1 + doc_id % 5) AS INTEGER) AS height
            FROM documents
        ), blocks AS (
            SELECT doc_id, width, height,
                   unnest(range(0, (width // 8) * (height // 8))) AS b
            FROM dims
        )
        SELECT doc_id, width, height,
               CAST(SUM((CAST('0x' || substr(md5('jpegdri:' || doc_id || ':' || b), 1, 15) AS BIGINT) % 256) * 192) AS BIGINT) AS pixel_sum
        FROM blocks
        GROUP BY doc_id, width, height
    """,
    # progressive JPEG replay: flat-block bit-exactness across the
    # 9-scan progression; the scan schedule changes the bitstream, not
    # the accumulated coefficients
    "multimodal_jpeg_progressive_decode": """
        WITH dims AS (
            SELECT doc_id,
                   CAST(8 * (1 + doc_id % 4) AS INTEGER) AS width,
                   CAST(8 * (2 + doc_id % 3) AS INTEGER) AS height
            FROM documents
        ), blocks AS (
            SELECT doc_id, width, height,
                   unnest(range(0, (width // 8) * (height // 8))) AS b
            FROM dims
        )
        SELECT doc_id, width, height,
               CAST(SUM((CAST('0x' || substr(md5('jpegprog:' || doc_id || ':' || b), 1, 15) AS BIGINT) % 256) * 192) AS BIGINT) AS pixel_sum
        FROM blocks
        GROUP BY doc_id, width, height
    """,
    # 4:2:0 JPEG replay: flat 16x16 macroblocks survive BOTH loss
    # stages (2x2 chroma mean of a flat region is exact; DC quant 8
    # divides every flat block), so each macroblock contributes
    # 256 pixels x 3 channels x value
    "multimodal_jpeg420_decode": """
        WITH dims AS (
            SELECT doc_id,
                   CAST(16 * (1 + doc_id % 2) AS INTEGER) AS width,
                   CAST(16 * (1 + doc_id % 3) AS INTEGER) AS height
            FROM documents
        ), blocks AS (
            SELECT doc_id, width, height,
                   unnest(range(0, (width // 16) * (height // 16))) AS m
            FROM dims
        )
        SELECT doc_id, width, height,
               CAST(SUM((CAST('0x' || substr(md5('jpeg420:' || doc_id || ':' || m), 1, 15) AS BIGINT) % 256) * 768) AS BIGINT) AS pixel_sum
        FROM blocks
        GROUP BY doc_id, width, height
    """,
    # Adam7 replay: interlacing re-orders the BITSTREAM (per-pass
    # filtered sub-images), not the pixels, so pixel_sum replays over
    # the key's own 'pngi:' fixture; the POSITION-WEIGHTED sum makes
    # the compare scatter-sensitive — a pass landed on the wrong grid
    # permutes values, which Σ p·v_p cannot miss
    "multimodal_png_interlaced_decode": """
        WITH dims AS (
            SELECT doc_id,
                   CAST(5 + doc_id % 8 AS INTEGER) AS width,
                   CAST(6 + doc_id % 7 AS INTEGER) AS height
            FROM documents
        ), px AS (
            SELECT doc_id, width, height, p,
                   CAST('0x' || substr(md5('pngi:' || doc_id || ':' || p), 1, 15) AS BIGINT) % 256 AS v
            FROM dims, unnest(range(0, width * height * 3)) AS u(p)
        )
        SELECT doc_id, width, height,
               CAST(SUM(v) AS BIGINT) AS pixel_sum,
               CAST(SUM(p * v) AS BIGINT) AS pos_weighted_sum
        FROM px
        GROUP BY doc_id, width, height
    """,
    # RGBA replay: straight-alpha white composite is integer-exact —
    # per channel (v*a + 255*(255-a) + 127) // 255 over the 4-byte-
    # per-pixel 'pngrgba:' fixture (R,G,B at 4p..4p+2, A at 4p+3)
    "multimodal_png_rgba_decode": """
        WITH dims AS (
            SELECT doc_id,
                   CAST(4 + doc_id % 5 AS INTEGER) AS width,
                   CAST(5 + doc_id % 4 AS INTEGER) AS height
            FROM documents
        ), px AS (
            SELECT doc_id, width, height,
                   unnest(range(0, width * height)) AS p
            FROM dims
        ), ch AS (
            SELECT doc_id, width, height,
                   CAST('0x' || substr(md5('pngrgba:' || doc_id || ':' || (4 * p)), 1, 15) AS BIGINT) % 256 AS r,
                   CAST('0x' || substr(md5('pngrgba:' || doc_id || ':' || (4 * p + 1)), 1, 15) AS BIGINT) % 256 AS g,
                   CAST('0x' || substr(md5('pngrgba:' || doc_id || ':' || (4 * p + 2)), 1, 15) AS BIGINT) % 256 AS b,
                   CAST('0x' || substr(md5('pngrgba:' || doc_id || ':' || (4 * p + 3)), 1, 15) AS BIGINT) % 256 AS a
            FROM px
        )
        SELECT doc_id, width, height,
               CAST(SUM((r * a + 255 * (255 - a) + 127) // 255
                      + (g * a + 255 * (255 - a) + 127) // 255
                      + (b * a + 255 * (255 - a) + 127) // 255) AS BIGINT) AS pixel_sum
        FROM ch
        GROUP BY doc_id, width, height
    """,
    # grayscale JPEG replay: same flat-block bit-exactness argument as
    # the 3-component keys; the decoder replicates Y to RGB, so each
    # flat 8x8 block contributes 64 pixels x 3 channels x value
    "multimodal_jpeg_gray_decode": """
        WITH dims AS (
            SELECT doc_id,
                   CAST(8 * (1 + doc_id % 5) AS INTEGER) AS width,
                   CAST(8 * (1 + doc_id % 2) AS INTEGER) AS height
            FROM documents
        ), blocks AS (
            SELECT doc_id, width, height,
                   unnest(range(0, (width // 8) * (height // 8))) AS b
            FROM dims
        )
        SELECT doc_id, width, height,
               CAST(SUM((CAST('0x' || substr(md5('jpeggray:' || doc_id || ':' || b), 1, 15) AS BIGINT) % 256) * 192) AS BIGINT) AS pixel_sum
        FROM blocks
        GROUP BY doc_id, width, height
    """,
    # 12-bit JPEG replay: flat blocks survive the 12-bit pipeline
    # bit-exactly (DC step 8 divides 8*(v-2048)); the 8-bit output is
    # the high-bits reduction, so each block contributes
    # 64 px x 3 channels x (v >> 4)
    "multimodal_jpeg12_decode": """
        WITH dims AS (
            SELECT doc_id,
                   CAST(8 * (1 + doc_id % 4) AS INTEGER) AS width,
                   CAST(8 * (1 + doc_id % 3) AS INTEGER) AS height
            FROM documents
        ), blocks AS (
            SELECT doc_id, width, height,
                   unnest(range(0, (width // 8) * (height // 8))) AS b
            FROM dims
        )
        SELECT doc_id, width, height,
               CAST(SUM(((CAST('0x' || substr(md5('jpeg12:' || doc_id || ':' || b), 1, 15) AS BIGINT) % 4096) // 16) * 192) AS BIGINT) AS pixel_sum
        FROM blocks
        GROUP BY doc_id, width, height
    """,
    # 4:1:1 replay: flat 32x8 MCU regions survive both loss stages
    # (4x1 chroma mean of a flat run is exact; DC quant 8 divides
    # every flat block), so each MCU contributes 256 px x 3 x value
    "multimodal_jpeg411_decode": """
        WITH dims AS (
            SELECT doc_id,
                   CAST(32 * (1 + doc_id % 2) AS INTEGER) AS width,
                   CAST(8 * (1 + doc_id % 4) AS INTEGER) AS height
            FROM documents
        ), blocks AS (
            SELECT doc_id, width, height,
                   unnest(range(0, (width // 32) * (height // 8))) AS m
            FROM dims
        )
        SELECT doc_id, width, height,
               CAST(SUM((CAST('0x' || substr(md5('jpeg411:' || doc_id || ':' || m), 1, 15) AS BIGINT) % 256) * 768) AS BIGINT) AS pixel_sum
        FROM blocks
        GROUP BY doc_id, width, height
    """,
    # interlaced GIF replay: the four-pass row order permutes STORAGE,
    # not values — index_sum keeps the plain closed form over the
    # key's own 'gifi:' fixture, and the POSITION-WEIGHTED sum makes
    # the compare de-interlace-sensitive (rows scattered to the wrong
    # display positions change Σ p·v_p even though the index multiset
    # is untouched)
    "multimodal_gif_interlaced_decode": """
        WITH dims AS (
            SELECT doc_id,
                   CAST(5 + doc_id % 5 AS INTEGER) AS width,
                   CAST(6 + doc_id % 6 AS INTEGER) AS height
            FROM documents
        ), px AS (
            SELECT doc_id, width, height, p,
                   CAST('0x' || substr(md5('gifi:' || doc_id || ':' || p), 1, 15) AS BIGINT) % 256 AS v
            FROM dims, unnest(range(0, width * height)) AS u(p)
        )
        SELECT doc_id, width, height,
               CAST(SUM(v) AS BIGINT) AS index_sum,
               CAST(SUM(p * v) AS BIGINT) AS pos_weighted_sum
        FROM px
        GROUP BY doc_id, width, height
    """,
    # MP4 container-walk replay: fixture parameters are closed-form
    # doc_id residues, so the oracle STATES the tuple the box walk
    # must recover (brand, ms duration through v0 timescale-1000 or v1
    # timescale-90000, 16.16 dims of the first video track, track
    # census) — the text_html_extract pattern
    "multimodal_mp4_meta": """
        SELECT doc_id,
               CASE CAST(doc_id % 3 AS INTEGER)
                    WHEN 0 THEN 'isom' WHEN 1 THEN 'mp42' ELSE 'avc1' END AS brand,
               CAST(1000 + doc_id % 9777 AS BIGINT) AS duration_ms,
               CAST(160 + 16 * (doc_id % 20) AS INTEGER) AS width,
               CAST(120 + 16 * (doc_id % 15) AS INTEGER) AS height,
               CAST(1 + doc_id % 3 AS INTEGER) AS n_video_tracks
        FROM documents
    """,
    # FLAC STREAMINFO replay: closed-form residues for the packed
    # 20/3/5/36-bit fields; duration is exact integer division
    "multimodal_flac_meta": """
        WITH params AS (
            SELECT doc_id,
                   CASE CAST(doc_id % 5 AS INTEGER)
                        WHEN 0 THEN 8000 WHEN 1 THEN 16000 WHEN 2 THEN 22050
                        WHEN 3 THEN 32000 ELSE 44100 END AS sample_rate,
                   CAST(1 + doc_id % 8 AS INTEGER) AS channels,
                   CAST(8 + 4 * (doc_id % 5) AS INTEGER) AS bits_per_sample,
                   CAST(1000 + doc_id % 9973 AS BIGINT) AS total_samples
            FROM documents
        )
        SELECT doc_id,
               CAST(sample_rate AS INTEGER) AS sample_rate,
               channels, bits_per_sample, total_samples,
               CAST((total_samples * 1000) // sample_rate AS BIGINT) AS duration_ms
        FROM params
    """,
    # REAL GIF replay: the oracle regenerates the portable-md5
    # palette indices the from-scratch LZW compressed, checking what
    # the decoder recovered through real dictionary-building
    # compression (operators/multimodal.py:decode_gif)
    "multimodal_gif_decode": """
        WITH dims AS (
            SELECT doc_id,
                   CAST(6 + doc_id % 4 AS INTEGER) AS width,
                   CAST(4 + doc_id % 5 AS INTEGER) AS height
            FROM documents
        ), px AS (
            SELECT doc_id, width, height,
                   unnest(range(0, width * height)) AS p
            FROM dims
        )
        SELECT doc_id, width, height,
               CAST(SUM(CAST('0x' || substr(md5('gif:' || doc_id || ':' || p), 1, 15) AS BIGINT) % 256) AS BIGINT) AS index_sum
        FROM px
        GROUP BY doc_id, width, height
    """,
    # REAL WAV replay: same contract as multimodal_decode_real — the
    # oracle regenerates the portable-md5 PCM samples the RIFF encoder
    # serialized, checking what the chunk-walking decoder recovered
    # (operators/multimodal.py:decode_wav). amp_sum is a signed exact
    # integer sum (values span the full int16 range)
    "multimodal_wav_decode": """
        WITH params AS (
            SELECT doc_id,
                   CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS sample_rate,
                   CAST(40 + doc_id % 17 AS INTEGER) AS n_samples
            FROM documents
        ), sm AS (
            SELECT doc_id, sample_rate, n_samples,
                   unnest(range(0, n_samples)) AS i
            FROM params
        )
        SELECT doc_id, sample_rate, n_samples,
               CAST(SUM(CAST('0x' || substr(md5('wav:' || doc_id || ':' || i), 1, 15) AS BIGINT) % 65536 - 32768) AS BIGINT) AS amp_sum
        FROM sm
        GROUP BY doc_id, sample_rate, n_samples
    """,
    # MP3 replay: closed-form residue parameters; duration is exact
    # integer division (1152 samples per MPEG-1 Layer III frame)
    "multimodal_mp3_meta": """
        WITH params AS (
            SELECT doc_id,
                   CASE CAST(doc_id % 6 AS INTEGER)
                        WHEN 0 THEN 64 WHEN 1 THEN 96 WHEN 2 THEN 128
                        WHEN 3 THEN 160 WHEN 4 THEN 192 ELSE 320 END AS bitrate_kbps,
                   CASE CAST(doc_id % 3 AS INTEGER)
                        WHEN 0 THEN 44100 WHEN 1 THEN 48000 ELSE 32000 END AS sample_rate,
                   CAST(3 + doc_id % 9 AS INTEGER) AS n_frames
            FROM documents
        )
        SELECT doc_id,
               CAST(bitrate_kbps AS INTEGER) AS bitrate_kbps,
               CAST(sample_rate AS INTEGER) AS sample_rate,
               n_frames,
               CAST((CAST(n_frames AS BIGINT) * 1152 * 1000) // sample_rate AS BIGINT) AS duration_ms
        FROM params
    """,
    # dHash image-dedup replay: banding is provably cost-only
    # (max_hamming 3 < 4 bands — pigeonhole), so the oracle verifies
    # TRUE all-pairs Hamming over dHash bits regenerated from the
    # pixel fixture (grayscale, 9x8 nearest-neighbor grid, gradient
    # bits); twins re-derive the ORIGINAL doc's pixels with byte 0
    # shifted +48
    "multimodal_dhash_neardup": """
        WITH corpus AS (
            SELECT doc_id AS id, doc_id AS orig, FALSE AS pert FROM documents
            UNION ALL
            SELECT doc_id + 40000000, doc_id, TRUE FROM documents WHERE doc_id % 37 = 0
        ), dims AS (
            SELECT id, orig, pert,
                   CAST(4 + orig % 5 AS BIGINT) AS w,
                   CAST(5 + orig % 4 AS BIGINT) AS h
            FROM corpus
        ), grid AS (
            SELECT id, orig, pert, r, c,
                   ((r * h) // 8) * w + ((c * w) // 9) AS p
            FROM dims, unnest(range(0, 8)) AS tr(r), unnest(range(0, 9)) AS tc(c)
        ), gray AS (
            SELECT id, r, c,
                   ((CASE WHEN pert AND p = 0
                          THEN (CAST('0x' || substr(md5('png:' || orig || ':' || 0), 1, 15) AS BIGINT) % 256 + 48) % 256
                          ELSE CAST('0x' || substr(md5('png:' || orig || ':' || (3*p)), 1, 15) AS BIGINT) % 256 END)
                    + CAST('0x' || substr(md5('png:' || orig || ':' || (3*p+1)), 1, 15) AS BIGINT) % 256
                    + CAST('0x' || substr(md5('png:' || orig || ':' || (3*p+2)), 1, 15) AS BIGINT) % 256) // 3 AS g
            FROM grid
        ), bits AS (
            SELECT a.id, a.r, a.c, CAST(a.g > b.g AS INTEGER) AS bit
            FROM gray a JOIN gray b ON a.id = b.id AND a.r = b.r AND b.c = a.c + 1
            WHERE a.c < 8
        )
        SELECT x.id AS id_a, y.id AS id_b,
               CAST(SUM(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) AS INTEGER) AS hamming
        FROM bits x JOIN bits y ON x.r = y.r AND x.c = y.c AND x.id < y.id
        GROUP BY 1, 2
        HAVING SUM(CASE WHEN x.bit <> y.bit THEN 1 ELSE 0 END) <= 3
    """,
    # Exif replay: fixture fields are closed-form residues; the oracle
    # STATES the tuple the TIFF IFD walk must recover through both
    # byte orders (the text_html_extract pattern)
    "multimodal_exif_meta": """
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
               CAST(1 + doc_id % 8 AS INTEGER) AS orientation,
               'cam' || CAST(doc_id % 23 AS VARCHAR) AS make,
               printf('2026:08:%02d %02d:%02d:%02d',
                      1 + doc_id % 28, doc_id % 24, doc_id % 60,
                      (doc_id * 7) % 60) AS datetime
        FROM documents
    """,
    # audio-stats replay: every statistic is exact-integer over the
    # regenerated portable samples (crossings via a LAG window; the
    # RMS sqrt deliberately stays out of the comparable projection)
    "multimodal_wav_stats": """
        WITH params AS (
            SELECT doc_id,
                   CAST(8000 + (doc_id % 3) * 4000 AS INTEGER) AS sample_rate,
                   CAST(40 + doc_id % 17 AS INTEGER) AS n_samples
            FROM documents
        ), sm AS (
            SELECT doc_id, sample_rate, n_samples, i,
                   CAST('0x' || substr(md5('wav:' || doc_id || ':' || i), 1, 15) AS BIGINT) % 65536 - 32768 AS v
            FROM params, unnest(range(0, n_samples)) AS u(i)
        ), lagd AS (
            SELECT doc_id, sample_rate, n_samples, v,
                   LAG(v) OVER (PARTITION BY doc_id ORDER BY i) AS pv
            FROM sm
        )
        SELECT doc_id, sample_rate, n_samples,
               CAST(SUM(v * v) AS BIGINT) AS sum_sq,
               CAST(MAX(ABS(v)) AS INTEGER) AS peak_abs,
               CAST(SUM(CASE WHEN pv IS NOT NULL AND ((pv < 0) <> (v < 0)) THEN 1 ELSE 0 END) AS INTEGER) AS n_zero_crossings,
               CAST(SUM(CASE WHEN v = 32767 OR v = -32768 THEN 1 ELSE 0 END) AS INTEGER) AS n_clipped
        FROM lagd
        GROUP BY doc_id, sample_rate, n_samples
    """,
    # sha256-derived stub decode/features are fully SQL-expressible:
    # DuckDB's hex sha256 + '0x' casts reproduce the python digest
    # bytes exactly, and the float32 feature slots round-trip through
    # CAST(REAL) identically (upgraded from rows-only, round 7)
    "multimodal_decode": """
        SELECT doc_id, 'text/plain;fake' AS mime,
               CAST(64 + (CAST('0x' || substr(sha256(text), 1, 2) AS INT) % 192) AS INTEGER) AS width,
               CAST(64 + (CAST('0x' || substr(sha256(text), 3, 2) AS INT) % 192) AS INTEGER) AS height,
               CAST(1 + (CAST('0x' || substr(sha256(text), 5, 2) AS INT) % 3) AS INTEGER) AS n_channels
        FROM documents
    """,
    "multimodal_features": """
        WITH h AS (SELECT doc_id, sha256(text) AS hx FROM documents)
        SELECT doc_id,
               CAST(16 AS INTEGER) AS feat_dim,
               ROUND(0.0 + CAST(CAST(CAST('0x'||substr(hx,1,2) AS INT)/255.0 AS REAL) AS DOUBLE) + CAST(CAST(CAST('0x'||substr(hx,3,2) AS INT)/255.0 AS REAL) AS DOUBLE) + CAST(CAST(CAST('0x'||substr(hx,5,2) AS INT)/255.0 AS REAL) AS DOUBLE) + CAST(CAST(CAST('0x'||substr(hx,7,2) AS INT)/255.0 AS REAL) AS DOUBLE) + CAST(CAST(CAST('0x'||substr(hx,9,2) AS INT)/255.0 AS REAL) AS DOUBLE) + CAST(CAST(CAST('0x'||substr(hx,11,2) AS INT)/255.0 AS REAL) AS DOUBLE) + CAST(CAST(CAST('0x'||substr(hx,13,2) AS INT)/255.0 AS REAL) AS DOUBLE) + CAST(CAST(CAST('0x'||substr(hx,15,2) AS INT)/255.0 AS REAL) AS DOUBLE) + CAST(CAST(CAST('0x'||substr(hx,17,2) AS INT)/255.0 AS REAL) AS DOUBLE) + CAST(CAST(CAST('0x'||substr(hx,19,2) AS INT)/255.0 AS REAL) AS DOUBLE) + CAST(CAST(CAST('0x'||substr(hx,21,2) AS INT)/255.0 AS REAL) AS DOUBLE) + CAST(CAST(CAST('0x'||substr(hx,23,2) AS INT)/255.0 AS REAL) AS DOUBLE) + CAST(CAST(CAST('0x'||substr(hx,25,2) AS INT)/255.0 AS REAL) AS DOUBLE) + CAST(CAST(CAST('0x'||substr(hx,27,2) AS INT)/255.0 AS REAL) AS DOUBLE) + CAST(CAST(CAST('0x'||substr(hx,29,2) AS INT)/255.0 AS REAL) AS DOUBLE) + CAST(CAST(CAST('0x'||substr(hx,31,2) AS INT)/255.0 AS REAL) AS DOUBLE), 4) AS feat_l1,
               CAST(CAST(CAST('0x'||substr(hx,1,2) AS INT)/255.0 AS REAL) AS DOUBLE) AS feat_0
        FROM h
    """,
    # frame windows are pure byte arithmetic over the utf-8 payload:
    # width = trunc(greatest(n/4, 1)); frame i holds
    # clamp(n - i*width, 0, width) bytes (Spark substring truncates at
    # the payload end; wholly-out-of-range windows are empty)
    "multimodal_frames": """
        WITH base AS (
            SELECT doc_id, octet_length(encode(text)) AS n FROM documents
        ), w AS (
            SELECT doc_id, n,
                   CAST(TRUNC(GREATEST(n / 4.0, 1.0)) AS INTEGER) AS width
            FROM base
        )
        SELECT doc_id,
               CAST(i AS INTEGER) AS frame_idx,
               CAST(LEAST(GREATEST(n - i * width, 0), width) AS INTEGER) AS n_bytes,
               TRUE AS frames_ok
        FROM w, UNNEST([0, 1, 2, 3]) AS u(i)
    """,
}

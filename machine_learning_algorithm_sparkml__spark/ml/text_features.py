"""MLlib text-feature pipeline (SURVEY.md §7.4 text-analysis list):
Tokenizer/RegexTokenizer -> StopWordsRemover -> NGram -> HashingTF ->
IDF, plus CountVectorizer. These are the estimator-based counterparts
of ``functions/text.py``'s pure-expression scorers — used when a
downstream model needs vectors rather than scalars.

Also provides the MLlib-native LSH alternates to the hand-rolled
operators in ``operators/dedup.py`` / ``operators/simsearch.py``:
MinHashLSH over HashingTF shingle vectors (approxSimilarityJoin) and
BucketedRandomProjectionLSH over embeddings. Both families are kept:
the custom ones are oracle-estimable and tunable; the MLlib ones are
battle-tested and fuse into Pipelines.
"""

from __future__ import annotations

from pyspark.ml import Pipeline
from pyspark.ml.feature import (
    CountVectorizer,
    HashingTF,
    IDF,
    MinHashLSH,
    NGram,
    RegexTokenizer,
    StopWordsRemover,
)
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def text_feature_pipeline(
    *,
    text_col: str = "text",
    num_features: int = 1 << 14,
    ngram_n: int = 2,
) -> Pipeline:
    """tokenize -> remove stopwords -> 2-grams -> hashed TF -> IDF.
    Fixed hash width => stable schema at any corpus size; HashingTF
    needs no vocabulary fit, so the only fitted stage is IDF (one
    aggregation pass)."""
    return Pipeline(stages=[
        RegexTokenizer(inputCol=text_col, outputCol="tokens", pattern=r"\s+"),
        StopWordsRemover(inputCol="tokens", outputCol="tokens_clean"),
        NGram(n=ngram_n, inputCol="tokens_clean", outputCol="ngrams"),
        HashingTF(inputCol="ngrams", outputCol="tf", numFeatures=num_features),
        IDF(inputCol="tf", outputCol="tfidf"),
    ])


def count_vectorizer_pipeline(*, text_col: str = "text", vocab_size: int = 1 << 12) -> Pipeline:
    """Vocabulary-fitted term counts (CountVectorizer) — when exact
    vocabulary indices matter more than hash stability. Vocabulary fit
    is a distributed wordcount; cap vocab_size to bound driver memory."""
    return Pipeline(stages=[
        RegexTokenizer(inputCol=text_col, outputCol="tokens", pattern=r"\s+"),
        CountVectorizer(inputCol="tokens", outputCol="counts", vocabSize=vocab_size),
    ])


def brp_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    bucket_length: float = 2.0,
    num_hash_tables: int = 8,
    seed: int = 754,
) -> DataFrame:
    """MLlib BucketedRandomProjectionLSH euclidean ANN — the library
    counterpart to the custom hyperplane LSH. approxSimilarityJoin on
    a distance threshold, then exact top-k per query by euclidean
    distance. Output: (query_id, neighbor_id, rank, dist)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window

    c = corpus.select(F.col(id_col), array_to_vector(F.col(vec_col)).alias("features"))
    q = queries.select(F.col(id_col), array_to_vector(F.col(vec_col)).alias("features"))
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=bucket_length, numHashTables=num_hash_tables, seed=seed,
    )
    model = lsh.fit(c)
    # threshold large enough to admit true neighbors of unit-ish vectors
    joined = model.approxSimilarityJoin(q, c, 100.0, distCol="dist")
    pairs = joined.select(
        F.col(f"datasetA.{id_col}").alias("query_id"),
        F.col(f"datasetB.{id_col}").alias("neighbor_id"),
        F.round("dist", 6).alias("dist"),
    ).filter(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "dist")
    )


def minhash_lsh_mllib_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    jaccard_distance_threshold: float = 0.5,
    # 6 tables, not 8: approxSimilarityJoin OR-amplifies across tables,
    # so candidate volume (and join cost) grows with table count while
    # recall saturates — at the J=0.5 threshold boundary 6 tables give
    # 1-(1-0.5)^6 = 98.4% collision probability, and measured sf0.1
    # wall time drops 11.5s -> 8.1s with identical output pairs
    num_hash_tables: int = 6,
    num_features: int = 1 << 16,
    shingle_n: int = 3,
    seed: int = 754,
) -> DataFrame:
    """MLlib MinHashLSH near-dup pairs via approxSimilarityJoin.

    Shingles -> HashingTF (binary) -> MinHashLSH; emits pairs with
    Jaccard DISTANCE below the threshold (MLlib reports distance =
    1 - similarity). Output: (id_a, id_b, jaccard_dist)."""
    from machine_learning_algorithm_sparkml__spark.operators.dedup import shingle_array

    from machine_learning_algorithm_sparkml__spark.operators.spread import spread_rows

    # spread before shingle+HashingTF: per-row compute inside an
    # otherwise single-task scan stage (r16; no-op at cluster scale).
    # MinHashLSH coefficients are seeded and data-independent, and
    # approxSimilarityJoin is value-based, so the pair set (and the
    # pair_sets_equal invariant vs the custom operator) is unchanged.
    shingled = spread_rows(df, id_col).select(
        F.col(id_col), shingle_array(F.col(text_col), shingle_n).alias("shingles")
    )
    tf = HashingTF(inputCol="shingles", outputCol="features", numFeatures=num_features, binary=True)
    vecs = tf.transform(shingled)
    # MinHashLSH requires at least one non-zero entry
    vecs = vecs.filter(F.size("shingles") > 0)
    # materialize once: the self-approxSimilarityJoin reads vecs as BOTH
    # datasetA and datasetB, and hashes it again inside the join — without
    # this the shingle+HashingTF plan executes three times
    vecs = vecs.localCheckpoint(eager=True)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=seed)
    model = lsh.fit(vecs)
    joined = model.approxSimilarityJoin(vecs, vecs, jaccard_distance_threshold, distCol="jaccard_dist")
    return (
        joined.filter(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
    )

"""Document deduplication (SURVEY.md §7.4 north-star — no reference
citations; these are the operators a 100 TB training-data pipeline
needs that the reference's scripts never did).

Everything is a composition of built-in DataFrame ops — hashing via
``xxhash64`` (JVM), set ops via array functions, candidate generation
via group-by/join. No Python UDFs anywhere.

Scale design:
- exact dedup        : one hash-aggregate shuffle on the key.
- n-gram Jaccard     : shingle-explode + self-join; hot shingles are
  capped by document frequency (``max_shingle_doc_freq``) — the
  standard stop-shingle trick; without it one ubiquitous shingle
  makes the join quadratic.
- MinHash + LSH      : signatures via ONE aggregation (k mins computed
  in the same groupBy); banding turns all-pairs into per-bucket
  joins, so cost follows true duplicate density, not n^2.
- SimHash            : 64 bit-sums in one aggregation; near-dup pairs
  via band-of-bits buckets (Hamming-LSH), then exact Hamming check.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from machine_learning_algorithm_sparkml__spark.functions.text import tokens
from machine_learning_algorithm_sparkml__spark.operators.spread import spread_rows


# --- exact ---------------------------------------------------------------------

def exact_dedup(df: DataFrame, subset: list[str] | None = None) -> DataFrame:
    """Keep one arbitrary row per key (Spark's dropDuplicates). For a
    deterministic representative use :func:`exact_dedup_representatives`."""
    return df.dropDuplicates(subset)


def exact_dedup_representatives(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Deterministic exact dedup: group by the content key, keep the
    minimum id as the surviving representative plus the duplicate
    count. One hash-aggregate shuffle; map-side partial aggregation
    applies."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias(id_col),
        F.count(F.lit(1)).alias("n_copies"),
    )


def incremental_exact_dedup(
    existing: DataFrame, batch: DataFrame, key_cols: list[str], id_col: str
) -> DataFrame:
    """Exact dedup of a NEW ingest batch against an already-deduped
    corpus — the daily-crawl shape: the corpus only ever grows, so
    re-deduping 100 TB per ingest is wrong; only the batch is new
    work. Two steps: (1) in-batch representatives (min id per key,
    map-side partial aggregation), (2) LEFT ANTI join of the batch
    keys against the existing corpus keys. Returns surviving batch
    rows (key cols + id + in-batch ``n_copies``).

    Scale notes: the anti-join needs only ``key_cols`` from the
    existing side — column pruning keeps the 100 TB scan to the key
    column, and a production deployment stores a bucketed
    ``xxhash64(key)`` fingerprint index so daily batches join
    shuffle-free against it instead of rescanning text. No distinct
    on the existing side: anti-join semantics ignore right-side
    multiplicity, so the aggregation would be a pure extra shuffle.

    NULL keys dedupe like any other value (ADVICE r6): the in-batch
    groupBy already treats NULLs as one group, so the cross-batch join
    uses null-safe equality (``<=>``) — a NULL-key batch row is
    dropped when the corpus already holds a NULL-key doc, instead of
    always surviving through non-null-safe '='. ``<=>`` stays an
    equi-join key for the planner (hash/sort-merge, never
    nested-loop)."""
    # explicit aliases: batch and existing often share lineage (one
    # table filtered two ways), so bare df[c] references are ambiguous
    batch_rep = exact_dedup_representatives(batch, key_cols, id_col).alias("_b")
    ex = existing.select(*key_cols).alias("_e")
    cond = None
    for c in key_cols:
        term = F.col(f"_b.{c}").eqNullSafe(F.col(f"_e.{c}"))
        cond = term if cond is None else cond & term
    return batch_rep.join(ex, cond, "left_anti")


# --- shingling -----------------------------------------------------------------

def shingle_array(text: Column, n: int = 3) -> Column:
    """Word n-gram array for one text column (null-safe via tokens()).
    Texts shorter than ``n`` tokens yield their whole token string as a
    single shingle. Shared by the custom MinHash/Jaccard operators and
    the MLlib MinHashLSH wrapper — one definition, no drift.

    Built as a chain of ``zip_with`` over literal-offset slices (the
    bigram-scorer idiom generalized to n): each pass walks the array
    once. The earlier ``transform(sequence, i -> slice(toks, i, n))``
    form called a variable-start ``slice`` per ELEMENT — O(tokens²)
    interpreted work per document, which made shingling (3.6 s at
    sf0.1) the dominant cost of every MinHash/Jaccard key."""
    toks = tokens(text)
    m = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(0))
    acc = F.slice(toks, 1, m)
    for i in range(1, n):
        acc = F.zip_with(
            acc, F.slice(toks, i + 1, m), lambda a, b: F.concat_ws(" ", a, b)
        )
    return F.when(F.size(toks) < n, F.array(F.concat_ws(" ", toks))).otherwise(acc)


def shingle_sets(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) pairs: distinct word n-grams per document.
    ``sequence``/``transform``/``slice`` keep construction JVM-side.
    The input is ``spread_rows``-spread first: tokenize+shingle+explode
    is per-row compute that otherwise runs inside the scan stage, and a
    small corpus scans as ONE task (r16: 1.0-1.45 s single-task vs
    0.24-0.39 s spread at sf0.1; no-op at cluster scale)."""
    ngrams = shingle_array(F.col(text_col), n)
    spread = spread_rows(df, id_col)
    return spread.select(F.col(id_col), F.explode(F.array_distinct(ngrams)).alias("shingle"))


def _cap_hot_shingles(
    pairs: DataFrame,
    id_col: str,
    max_doc_freq: int | None,
    key_cols: list[str] | None = None,
) -> DataFrame:
    """Drop shingles appearing in more than ``max_doc_freq`` docs —
    they carry no dedup signal and quadratically inflate the self-join.
    ``key_cols`` names the shingle-identity columns (default the raw
    ``shingle`` string; the Jaccard path passes its 120-bit hash pair,
    under which doc-frequency counts are identical)."""
    if max_doc_freq is None:
        return pairs
    keys = key_cols or ["shingle"]
    freq = pairs.groupBy(*keys).agg(F.count(F.lit(1)).alias("df_"))
    keep = freq.filter(F.col("df_") <= max_doc_freq).select(*keys)
    return pairs.join(keep, keys)


def _hashed_shingles(
    sh: DataFrame, id_col: str, value_col: str = "shingle"
) -> DataFrame:
    """Project (id, shingle-string) to (id, h1, h2) — the two 60-bit
    halves of one md5 (:func:`portable_hash60` / :func:`portable_hash60b`;
    subexpression elimination computes the md5 once). Everything
    downstream of a shingle/window frame only needs VALUE IDENTITY, so
    the shuffles and checkpoints carry 16 bytes per row instead of the
    n-gram text (guide §2.3 "shuffle keys and metadata instead of
    payloads") — at corpus scale the shingle strings are the dominant
    shuffle-bytes term of the whole dedup family. 120 bits of md5 make
    hash identity and string identity coincide on any non-adversarial
    corpus (birthday bound ~1e-13 at a trillion distinct shingles), so
    results — and the string-ground-truth oracles — are unchanged."""
    return sh.select(
        F.col(id_col),
        portable_hash60(F.col(value_col)).alias("h1"),
        portable_hash60b(F.col(value_col)).alias("h2"),
    )


# --- exact n-gram Jaccard ---------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_doc_freq: int | None = None,
) -> DataFrame:
    """Exact near-duplicate pairs by n-gram Jaccard similarity.

    shingle-explode -> self-join on the shingle's 120-bit md5 identity
    (id_a < id_b) -> count intersections -> join per-doc set sizes ->
    Jaccard >= threshold. Fully SQL-expressible, so oracle-checkable
    (the oracle joins the raw strings — the ground truth the hashed
    join reproduces; see :func:`_hashed_shingles`); at scale the
    candidate join is bounded by ``max_shingle_doc_freq``. Set sizes
    always come from the FULL sets; with the cap set, shared hot
    shingles are excluded from intersections, so the reported Jaccard
    is a lower bound (conservative: may miss borderline pairs, never
    inflates). Output: (id_a, id_b, jaccard), exact when the cap is
    unset.
    """
    # The shingle frame feeds the size aggregate, the doc-freq cap,
    # and both legs of the candidate self-join — five lineage reads.
    # Materialize it once (localCheckpoint blocks are released by the
    # ContextCleaner); at cluster scale this trades one spill for four
    # recomputes of the tokenize+shingle projection over the corpus.
    # The checkpoint (and every downstream exchange) carries the
    # 120-bit hash pair, never the n-gram text — see _hashed_shingles
    # (guide §2.3); intersection counts by hash identity equal the
    # string counts, so the string-ground-truth oracle is unchanged.
    pairs = _hashed_shingles(
        shingle_sets(df, id_col, text_col, n), id_col
    ).localCheckpoint(eager=True)
    # TRUE set sizes from the uncapped sets: the hot-shingle cap below
    # prunes CANDIDATE GENERATION only; folding it into sizes or
    # intersections would silently change the reported Jaccard.
    sizes = pairs.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))
    capped = _cap_hot_shingles(
        pairs, id_col, max_shingle_doc_freq, key_cols=["h1", "h2"]
    )

    a = capped.select(F.col(id_col).alias("id_a"), "h1", "h2")
    b = capped.select(F.col(id_col).alias("id_b"), "h1", "h2")
    inter = (
        a.join(b, ["h1", "h2"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    jac = (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            # unrounded: one IEEE division of exact ints is
            # bit-deterministic, so the oracle matches exactly
            F.col("n_inter").cast("double")
            / (F.col("size_a") + F.col("size_b") - F.col("n_inter")).cast("double"),
        )
    )
    return jac.filter(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    threshold: float = 0.9,
) -> DataFrame:
    """Directional near-dup pairs by n-gram CONTAINMENT
    C(src→dst) = |S(src) ∩ S(dst)| / |S(src)| — the asymmetric measure
    every symmetric dedup misses: a document embedded verbatim inside
    a 10× larger one has Jaccard ≈ 0.1 (invisible to
    :func:`ngram_jaccard_pairs` at any useful threshold) but
    containment 1.0. This is the quote/boilerplate/subset-duplication
    detector of a crawl pipeline.

    Candidate generation is PPJoin-style PREFIX FILTERING, and —
    unlike MinHash banding — it is EXACT (the SimHash-oracle rule):
    rank each doc's shingles by a global rarity total order
    (document frequency, shingle-hash); if C(src→dst) ≥ t then src misses
    at most ⌊(1−t)·|S(src)|⌋ shingles from dst, so among src's
    ⌊(1−t)·|S(src)|⌋+1 RAREST shingles at least one is in dst
    (pigeonhole over ANY size-(miss+1) subset). Joining only that
    prefix against the inverted index therefore has recall 1.0, and
    the DuckDB oracle may verify against the TRUE all-pairs
    containment directly — no candidate replay needed.

    At 100 TB the prefix side is the knob: the inverted-index join
    probes |prefix| ≈ (1−t)·|S(src)|+1 shingles per doc (2-3 at
    t=0.9) ordered by RARITY, so hot shingles never enter the probe
    side; verification then joins each candidate pair's src shingles
    against the (dst, shingle) index — bounded by candidates, not by
    the corpus square.

    The threshold compare runs in EXACT INTEGER space
    (q·n_common ≥ p·n_src for t = p/q) — no float boundary; the
    reported ``containment`` is one IEEE division of exact ints
    (bit-deterministic, unrounded — the ngram_jaccard rule).
    Output: (src_id, dst_id, n_src, n_common, containment), one row
    per ordered pair with C(src→dst) ≥ t.
    """
    from fractions import Fraction

    t = Fraction(threshold).limit_denominator(1000)
    # Empty/whitespace-only docs shingle to {''} under shingle_array's
    # short-doc convention; every pair of them would report containment
    # 1.0 (n_src=1, n_common=1) — spurious "subset duplicates" and a
    # quadratic ordered-pair blowup among empty docs at crawl scale.
    # Non-empty docs never produce the empty shingle (concat_ws over
    # ≥1 non-empty tokens), so dropping it removes exactly the
    # zero-token docs. The oracle applies the same guard.
    # Checkpoint and every downstream exchange carry the shingle's
    # 120-bit md5 identity, never the n-gram text (_hashed_shingles,
    # guide §2.3): the rarity order's tiebreak becomes (df_, h1, h2) —
    # ANY fixed total order over the distinct shingles preserves the
    # pigeonhole recall argument, so the result set is unchanged, and
    # the string-ground-truth oracle stays as-is.
    sh = _hashed_shingles(
        shingle_sets(df, id_col, text_col, n).filter(F.col("shingle") != ""),
        id_col,
    ).localCheckpoint(eager=True)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_src"))
    dfreq = sh.groupBy("h1", "h2").agg(F.count(F.lit(1)).alias("df_"))
    w = Window.partitionBy(id_col).orderBy(F.asc("df_"), F.asc("h1"), F.asc("h2"))
    ranked = (
        sh.join(dfreq, ["h1", "h2"])
        .withColumn("rn", F.row_number().over(w))
        .join(sizes, id_col)
    )
    # prefix length ⌊(1−t)·n_src⌋ + 1, computed in exact integers:
    # ⌊((q−p)·n_src)/q⌋ + 1 for t = p/q
    p_, q_ = t.numerator, t.denominator
    prefix_len = ((q_ - p_) * F.col("n_src")) / q_
    prefix = ranked.filter(F.col("rn") <= F.floor(prefix_len) + 1).select(
        F.col(id_col).alias("src_id"), "h1", "h2"
    )
    index = sh.select(F.col(id_col).alias("dst_id"), "h1", "h2")
    cand = (
        prefix.join(index, ["h1", "h2"])
        .filter(F.col("src_id") != F.col("dst_id"))
        .select("src_id", "dst_id")
        .distinct()
    )
    # verification: per candidate pair, count src's shingles present
    # in dst — probes the (dst, hash) index, bounded by |cand|·|src|
    src_sh = sh.select(F.col(id_col).alias("src_id"), "h1", "h2")
    common = (
        cand.join(src_sh, "src_id")
        .join(index, ["dst_id", "h1", "h2"])
        .groupBy("src_id", "dst_id")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sized = common.join(
        sizes.select(F.col(id_col).alias("src_id"), "n_src"), "src_id"
    )
    return sized.filter(
        F.lit(q_) * F.col("n_common") >= F.lit(p_) * F.col("n_src")
    ).select(
        "src_id",
        "dst_id",
        "n_src",
        "n_common",
        (F.col("n_common").cast("double") / F.col("n_src").cast("double")).alias(
            "containment"
        ),
    )


def token_windows(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, window) pairs: the DISTINCT consecutive ``k``-token windows
    of each document, space-joined. Documents shorter than ``k`` tokens
    emit NOTHING — a whole-short-doc "window" is exact-dup territory,
    not substring territory (unlike shingle_sets' short-doc
    convention). Shared by the exact-substring pair search and the
    exact-substring decontaminator — one window definition, no drift.
    Spread before the explode for the same reason as
    :func:`shingle_sets` (single-task scan stage on small inputs)."""
    toks = tokens(F.col(text_col))
    df = spread_rows(df, id_col)
    return df.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size(toks) >= k, F.array_distinct(shingle_array(F.col(text_col), k))
            ).otherwise(F.array().cast("array<string>"))
        ).alias("window"),
    )


def decontaminate_exact_substring(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 16,
) -> DataFrame:
    """Benchmark decontamination at MEMORIZATION granularity: drop
    every corpus document sharing any VERBATIM ``k``-token window with
    any benchmark document — the exact-substring counterpart of
    :func:`decontaminate_by_shingle` (n-gram overlap catches
    paraphrase-level leakage at small n; a long verbatim window is the
    smoking-gun eval-set copy, and at k=16 the false-positive rate on
    organic text is negligible, so this pass can run at a strictness
    the short-shingle pass cannot afford).

    Scale design is the decontaminate_by_shingle contract verbatim:
    the benchmark side (eval suites — thousands of docs) reduces to a
    distinct window set that is explicitly ``broadcast``; the corpus
    is scanned ONCE, its windows probe the broadcast map-side, and
    only the (small) contaminated id set shuffles for the anti-join.
    The corpus is never self-joined and never shuffled by window.
    Output: surviving corpus rows, schema unchanged."""
    # NOT hashed to 120-bit identity (r17 measured): unlike the
    # self-join paths there is no corpus-side shuffle here — windows
    # probe the broadcast map-side — so hashing only shrinks the
    # (already small) benchmark broadcast while ADDING an md5 per
    # corpus window; measured +0.2 s at sf0.1 on the ngram sibling,
    # reverted. Revisit only if the benchmark set grows to GB scale.
    bench_wins = (
        token_windows(benchmark, id_col, text_col, k).select("window").distinct()
    )
    contaminated = (
        token_windows(corpus, id_col, text_col, k)
        .join(F.broadcast(bench_wins), "window")
        .select(id_col)
        .distinct()
    )
    return corpus.join(contaminated, id_col, "left_anti")


def exact_substring_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    k: int = 16,
    max_window_doc_freq: int | None = None,
) -> DataFrame:
    """Cross-document EXACT substring duplication at token granularity
    — the complementary pass to MinHash/containment near-dup (VERDICT
    r14 #4): document-level similarity misses a verbatim k-token run
    copied between otherwise-unrelated documents, which is exactly the
    memorization surface a training pipeline scrubs (the
    suffix-array-dedup use case, at rolling-window granularity).

    Pipeline — bucket by 120-bit identity, count, never all-pairs:

    1. windows: every consecutive ``k``-token window per document
       (distinct per doc; documents shorter than ``k`` tokens emit
       nothing — a whole-short-doc "window" is exact-dup territory,
       not substring territory), projected immediately to the two
       60-bit md5 halves (:func:`_hashed_shingles`) so the checkpoint
       and the self-join shuffle carry 16 bytes per window, never the
       k-token text (guide §2.3).
    2. the SELF-JOIN on (h1, h2) counts shared windows per pair
       directly. The r14 design hashed candidates with xxhash64 and
       then re-joined the window TEXTS to verify — correct under
       64-bit collisions, but it shuffled the whole corpus's window
       strings a second time. With 120 bits, hash identity IS string
       identity on any non-adversarial corpus (the ngram_jaccard rule;
       birthday bound ~1e-13 at a trillion distinct windows, and the
       string-ground-truth oracle would catch a collision), so the
       verify pass — and its shuffle — is gone.

    At 100 TB the knobs are ``k`` (windows per doc ≈ tokens, so the
    exploded frame is ~corpus-token-sized regardless of k) and
    ``max_window_doc_freq`` — boilerplate windows shared by thousands
    of docs (licence headers) make the bucket join quadratic in the
    hot bucket; the cap drops them from pairing entirely, making
    reported counts a lower bound (the _cap_hot_shingles contract).
    Unset, the result is exact and oracle-checkable.

    Output: (id_a, id_b, n_shared_windows), id_a < id_b, one row per
    unordered pair sharing >= 1 exact k-token window."""
    wins = _hashed_shingles(
        token_windows(df, id_col, text_col, k), id_col, value_col="window"
    ).localCheckpoint(eager=True)
    capped = _cap_hot_shingles(
        wins, id_col, max_window_doc_freq, key_cols=["h1", "h2"]
    )
    return (
        capped.select(F.col(id_col).alias("id_a"), "h1", "h2")
        .join(capped.select(F.col(id_col).alias("id_b"), "h1", "h2"), ["h1", "h2"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared_windows"))
    )


def decontaminate_by_shingle(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 4,
) -> DataFrame:
    """Benchmark decontamination: drop every corpus document sharing at
    least one word ``n``-gram with any benchmark document — the
    standard guard against eval-set leakage into training data.

    Scale design: the benchmark side (eval suites — thousands of docs,
    not billions) reduces to a distinct shingle set that is explicitly
    ``broadcast``; the corpus is scanned once, its shingles probe the
    broadcast hash map-side, and only the (small) contaminated id set
    shuffles for the anti-join. The corpus is never self-joined and
    never shuffled by shingle. Output: surviving corpus rows, schema
    unchanged."""
    # NOT hashed to 120-bit identity — the decontaminate_exact_substring
    # rationale: no corpus-side shuffle to slim, md5 per shingle is pure
    # added cost at the probe (r17 measured 0.73 -> 0.98 s, reverted)
    bench_shingles = (
        shingle_sets(benchmark, id_col, text_col, n).select("shingle").distinct()
    )
    corpus_shingles = shingle_sets(corpus, id_col, text_col, n)
    contaminated = (
        corpus_shingles.join(F.broadcast(bench_shingles), "shingle")
        .select(id_col)
        .distinct()
    )
    return corpus.join(contaminated, id_col, "left_anti")


# --- MinHash + LSH -----------------------------------------------------------------

#: Mersenne prime 2^31 - 1: modulus of the portable universal-hash
#: family. With a, b, h all < 2^31, a*h + b < 2^63 — every slot
#: computes in EXACT 64-bit integer arithmetic (whole-stage-codegen
#: long math on Spark, BIGINT on DuckDB), so the two engines produce
#: bit-identical values, which is what makes the `dedup_minhash` key
#: oracle-checkable. (A first cut used 2^61-1 with DECIMAL(38,0)
#: products — exact too, but BigDecimal per shingle-slot made the key
#: 5x slower; 31-bit slots are the standard MinHash width anyway.)
MINHASH_PRIME = (1 << 31) - 1


def minhash_params(num_hashes: int, seed: int = 0x5EED) -> list[tuple[int, int]]:
    """The (a_i, b_i) coefficients of the portable hash family
    h_i(x) = (a_i*x + b_i) mod (2^31-1), drawn from a seeded PRNG so
    the Spark operator and the DuckDB oracle share ONE definition."""
    import random

    rnd = random.Random(seed)
    return [
        (rnd.randrange(1, MINHASH_PRIME), rnd.randrange(0, MINHASH_PRIME))
        for _ in range(num_hashes)
    ]


def portable_hash60(col: Column) -> Column:
    """Engine-neutral 60-bit hash: first 15 hex chars of md5, parsed
    as an integer. DuckDB spells the same thing
    ``CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)``."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _affine_mod(h: Column, a: int, b: int) -> Column:
    """(a*h + b) mod P in plain 64-bit longs — exact because
    a, h < P < 2^31 keeps the product under 2^62. Stays inside
    whole-stage codegen; the oracle runs the same BIGINT math."""
    return (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_PRIME)


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 32,
    shingle_n: int = 3,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """MinHash signatures: k independent hash functions; the k
    per-document minima come from ONE groupBy (one shuffle, map-side
    combine). Output: (id, signature array<bigint> of length k).

    ``hash_family='xxhash64'`` (default) realizes slot i as
    ``xxhash64(shingle, seed_i)`` — the fast path (one JVM hash per
    slot, no string work). ``'portable'`` hashes each shingle ONCE
    with :func:`portable_hash60` and derives the k slots by the
    (a_i*h+b_i) mod 2^31-1 universal family — reproducible in any
    engine with md5 + 128-bit integers, so the result is
    DuckDB-checkable. Same shuffle shape either way."""
    pairs = shingle_sets(df, id_col, text_col, shingle_n)
    if hash_family == "portable":
        h = portable_hash60(F.col("shingle")) % F.lit(MINHASH_PRIME)
        mins = pairs.groupBy(id_col).agg(
            *[
                F.min(_affine_mod(h, a, b)).alias(f"h{i}")
                for i, (a, b) in enumerate(minhash_params(num_hashes))
            ]
        )
    else:
        mins = pairs.groupBy(id_col).agg(
            *[
                F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"h{i}")
                for i in range(num_hashes)
            ]
        )
    return mins.select(
        F.col(id_col), F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("signature")
    )


def _band_buckets(
    signatures: DataFrame,
    id_col: str,
    num_bands: int,
    rows_per_band: int,
    *,
    array_col: str = "signature",
    carry: tuple[str, ...] = (),
    portable: bool = False,
) -> DataFrame:
    """(id, *carry, band, bucket) rows: ``array_col`` split into
    ``num_bands`` slices, each hashed to a bucket. Shared by the
    MinHash self-join pair generator, the cross-frame decontamination
    join, and the simhash Hamming-band path (``array_col='simhash'``,
    ``carry=('packed',)``) — one banding definition, no drift.
    ``portable=True`` swaps the Murmur3 bucket hash for
    :func:`portable_hash60` over the '|'-joined slice (the DuckDB
    oracle's ``md5(h0||'|'||h1||...)``)."""

    def _bucket(j: int) -> Column:
        sl = F.slice(array_col, j * rows_per_band + 1, rows_per_band)
        if portable:
            return portable_hash60(F.concat_ws("|", F.transform(sl, lambda x: x.cast("string"))))
        return F.hash(sl)

    return signatures.select(
        F.col(id_col),
        *carry,
        F.explode(
            F.array(*[
                F.struct(F.lit(j).alias("band"), _bucket(j).alias("bucket"))
                for j in range(num_bands)
            ])
        ).alias("bb"),
    ).select(id_col, *carry, "bb.band", "bb.bucket")


def _signature_overlap(sig_a: Column, sig_b: Column) -> Column:
    """MinHash-estimated Jaccard: fraction of matching signature slots
    (unbiased, stderr ~ 1/sqrt(k)). ONE definition shared by the
    self-join pair path and the cross-frame decontamination path — the
    same no-drift rule as ``_band_buckets``."""
    return (
        F.size(F.filter(F.zip_with(sig_a, sig_b, lambda x, y: x == y), lambda eq: eq)).cast("double")
        / F.size(sig_a).cast("double")
    )


def minhash_candidate_pairs(
    signatures: DataFrame, id_col: str, *, num_bands: int = 8, portable: bool = False
) -> DataFrame:
    """LSH banding: split each signature into bands, hash each band,
    bucket-join. Docs sharing ANY band bucket become a candidate pair.
    Output: distinct (id_a, id_b), id_a < id_b."""
    sig_len_row = signatures.select(F.size("signature").alias("n")).limit(1).collect()
    if not sig_len_row:
        id_type = dict(signatures.dtypes)[id_col]  # schema-stable on empty input
        return signatures.sparkSession.createDataFrame([], f"id_a {id_type}, id_b {id_type}")
    rows_per_band = max(1, sig_len_row[0]["n"] // num_bands)
    banded = _band_buckets(signatures, id_col, num_bands, rows_per_band, portable=portable)
    a = banded.select(F.col(id_col).alias("id_a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def minhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 32,
    num_bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.8,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """MinHash-LSH near-dup detection: candidates from banding, then a
    signature-estimated Jaccard (fraction of matching minhash slots)
    filters at ``threshold``. Output: (id_a, id_b, est_jaccard).

    The estimate is unbiased with stderr ~ 1/sqrt(k); tests validate
    recall against :func:`ngram_jaccard_pairs` ground truth.
    ``hash_family='portable'`` makes the whole program engine-neutral
    (see :func:`minhash_signatures`) at the cost of one md5 per
    shingle — the `dedup_minhash` key runs this so DuckDB can replay
    it exactly; the banding/join shape is identical.
    """
    # localCheckpoint, not cache: read by banding AND both verify legs;
    # blocks are released on GC rather than pinned for the session
    sigs = minhash_signatures(
        df, id_col, text_col, num_hashes=num_hashes, shingle_n=shingle_n,
        hash_family=hash_family,
    ).localCheckpoint(eager=True)
    cands = minhash_candidate_pairs(
        sigs, id_col, num_bands=num_bands, portable=hash_family == "portable"
    )
    sa = sigs.select(F.col(id_col).alias("id_a"), F.col("signature").alias("sig_a"))
    sb = sigs.select(F.col(id_col).alias("id_b"), F.col("signature").alias("sig_b"))
    est = (
        cands.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "est_jaccard",
            F.round(_signature_overlap(F.col("sig_a"), F.col("sig_b")), 6),
        )
    )
    return est.filter(F.col("est_jaccard") >= threshold).select("id_a", "id_b", "est_jaccard")


def decontaminate_by_minhash(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_hashes: int = 32,
    num_bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_broadcast_benchmark: int = 100_000,
    strategy: str = "broadcast",
    hash_family: str = "xxhash64",
) -> DataFrame:
    """FUZZY benchmark decontamination: drop every corpus document
    whose MinHash-estimated Jaccard with ANY benchmark document is
    >= ``threshold``. The paraphrase-tolerant complement to
    :func:`decontaminate_by_shingle` — exact n-gram matching misses
    contamination that was lightly rewritten; near-duplicate
    similarity does not.

    Two strategies, identical semantics (property-tested equal):

    - ``strategy='broadcast'`` (default — eval suites: thousands of
      docs, not billions): the benchmark side is banded and BROADCAST;
      corpus signatures come from one groupBy, its banded buckets
      probe the broadcast map-side, candidates verify on signature
      overlap (slot-match fraction, stderr ~1/sqrt(k)), and only the
      contaminated id set shuffles for the final anti-join. The
      broadcast is the scale contract (same fail-fast rule as
      ``brute_force_topk``): refuses > ``max_broadcast_benchmark``
      rows rather than silently OOMing every executor.
    - ``strategy='shuffle'`` (corpus-vs-corpus — train-split
      cross-contamination, eval-suite unions past the broadcast
      ceiling): the banded buckets meet in a SHUFFLED equi-join on
      (band, bucket), and the signature verify joins shuffle on the
      candidate ids. No size cap: both sides scale out with the
      cluster, cost follows bucket-collision density exactly like the
      self-join pair generator (:func:`minhash_candidate_pairs`). Hot
      buckets skew-split under AQE.

    The corpus is never self-joined and never shuffled by shingle in
    either strategy. Output: surviving corpus rows, schema unchanged."""
    if strategy not in ("broadcast", "shuffle"):
        raise ValueError(f"strategy must be 'broadcast' or 'shuffle', got {strategy!r}")
    if strategy == "broadcast":
        n_bench = benchmark.count()
        if n_bench > max_broadcast_benchmark:
            raise ValueError(
                f"decontaminate_by_minhash broadcasts the benchmark side: got "
                f"{n_bench} benchmark rows > max_broadcast_benchmark="
                f"{max_broadcast_benchmark}; use strategy='shuffle' for "
                "corpus-vs-corpus comparison or raise the cap explicitly"
            )
    _bench_side = F.broadcast if strategy == "broadcast" else (lambda df: df)
    portable = hash_family == "portable"
    c_sigs = minhash_signatures(
        corpus, id_col, text_col, num_hashes=num_hashes, shingle_n=shingle_n,
        hash_family=hash_family,
    ).localCheckpoint(eager=True)  # read by banding AND the verify join
    b_sigs = minhash_signatures(
        benchmark, id_col, text_col, num_hashes=num_hashes, shingle_n=shingle_n,
        hash_family=hash_family,
    ).localCheckpoint(eager=True)
    rows_per_band = max(1, num_hashes // num_bands)
    c_band = _band_buckets(c_sigs, id_col, num_bands, rows_per_band, portable=portable).select(
        F.col(id_col).alias("_cid"), "band", "bucket"
    )
    b_band = _band_buckets(b_sigs, id_col, num_bands, rows_per_band, portable=portable).select(
        F.col(id_col).alias("_bid"), "band", "bucket"
    )
    cands = (
        c_band.join(_bench_side(b_band), ["band", "bucket"])
        .select("_cid", "_bid")
        .distinct()
    )
    est = (
        cands.join(c_sigs.select(F.col(id_col).alias("_cid"), F.col("signature").alias("sig_c")), "_cid")
        .join(
            _bench_side(
                b_sigs.select(F.col(id_col).alias("_bid"), F.col("signature").alias("sig_b"))
            ),
            "_bid",
        )
        .withColumn("est_jaccard", _signature_overlap(F.col("sig_c"), F.col("sig_b")))
    )
    contaminated = (
        est.filter(F.col("est_jaccard") >= threshold)
        .select(F.col("_cid").alias(id_col))
        .distinct()
    )
    return corpus.join(contaminated, id_col, "left_anti")


# --- SimHash ---------------------------------------------------------------------

def portable_hash60b(col: Column) -> Column:
    """Second independent engine-neutral 60-bit hash: hex chars 16-30
    of the same md5 (the digest's other half). Together with
    :func:`portable_hash60` it yields 120 reproducible bits per
    value — enough for the default 64-bit SimHash."""
    return F.conv(F.substring(F.md5(col), 16, 15), 16, 10).cast("long")


def simhash_bits(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    num_bits: int = 64,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """SimHash: per document, the sign pattern of per-bit weighted sums
    over token hashes. One explode + one groupBy with ``num_bits`` sum
    aggregates — all JVM-side with map-side partial aggregation. (A
    collect_list + vectorized-numpy variant was measured and rejected:
    the per-doc hash shuffle and Arrow transfer cost more than the 64
    codegen'd aggregates save.) Output: (id, simhash array<int> of
    0/1, length num_bits).

    ``hash_family='portable'`` (num_bits <= 120) draws bit i from the
    md5-derived 60-bit halves (:func:`portable_hash60` for bits 0-59,
    :func:`portable_hash60b` above) — DuckDB replays the identical
    bits, which is what makes `dedup_simhash` oracle-checkable.
    """
    # spread first: tokenize+explode+hash is scan-stage work (see
    # shingle_sets — single-task on small inputs, no-op at scale)
    tok = spread_rows(df, id_col).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    if hash_family == "portable":
        if num_bits > 120:
            raise ValueError("portable simhash supports at most 120 bits (one md5)")
        hashed = tok.withColumn("h", portable_hash60(F.col("tok"))).withColumn(
            "h2", portable_hash60b(F.col("tok"))
        )

        def _bit(i: int) -> Column:
            src, off = ("h", i) if i < 60 else ("h2", i - 60)
            return F.shiftright(F.col(src), off).bitwiseAND(F.lit(1))

    else:
        hashed = tok.withColumn("h", F.xxhash64("tok"))

        def _bit(i: int) -> Column:
            return F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1))

    # branch-free per-bit aggregate: sum of the raw bit (0/1) plus one
    # shared token count; the ±1 weighted sum b_i = 2*ones_i - n, so the
    # sign test "b_i > 0" is exactly "2*ones_i > n"
    bit_sums = hashed.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_"),
        *[F.sum(_bit(i)).alias(f"b{i}") for i in range(num_bits)],
    )
    return bit_sums.select(
        F.col(id_col),
        F.array(*[
            F.when(F.col(f"b{i}") * 2 > F.col("n_"), F.lit(1)).otherwise(F.lit(0))
            for i in range(num_bits)
        ]).alias("simhash"),
    )


def hamming_distance(a: Column, b: Column) -> Column:
    """Hamming distance between equal-length bit arrays."""
    return F.size(F.filter(F.zip_with(a, b, lambda x, y: x != y), lambda d: d))


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_hamming: int = 3,
    num_bits: int = 64,
    num_bands: int | None = None,
    hash_family: str = "xxhash64",
) -> DataFrame:
    """SimHash near-dup pairs: band the bit array (pigeonhole — any
    pair within ``max_hamming`` shares at least one of
    ``num_bands > max_hamming`` bands), bucket-join, exact Hamming
    check. ``num_bands`` defaults to ``max_hamming + 1`` (the minimum
    guaranteeing full recall). Output: (id_a, id_b, hamming).

    Because verification is exact and pigeonhole recall is total,
    banding affects COST only, never the result — the output is
    exactly "all pairs with hamming <= max_hamming" (Murmur3 bucket
    collisions only add candidates, which the verify then rejects).
    That is why the portable family makes this oracle-checkable with
    a plain all-pairs oracle: only the per-token bits
    (:func:`simhash_bits`) must match the other engine."""
    if num_bands is None:
        num_bands = max_hamming + 1
    assert num_bands > max_hamming, "pigeonhole requires num_bands > max_hamming"
    # Pack the bit array into 64-bit WORDS (one fold per word, once
    # per document): the candidate verify then costs one codegen'd
    # bit_count(xor) per word per PAIR instead of an interpreted
    # per-bit zip/filter — on a loose threshold (max_hamming=8 →
    # 9 narrow bands → ~1M candidates on the self-similar testdata)
    # the verify dominates, and this cut the key 10.4 → ~3 s at sf0.1.
    # Word-wise, not one bigint: a single-long pack silently shifts
    # bits 65+ out and mis-reports hamming for num_bits > 64.
    # Banding still slices the bit array (per-doc cost, tiny).
    n_words = (num_bits + 63) // 64
    def _pack_word(w: int) -> Column:
        word_len = min(64, num_bits - w * 64)
        # shiftleft|or, not acc*2+bit: the 64th bit lands in the
        # sign position, and arithmetic overflow on bigint THROWS
        # under ANSI mode (Spark 4 default in plain sessions);
        # bit operations wrap by definition
        return F.aggregate(
            F.slice("simhash", w * 64 + 1, word_len),
            F.lit(0).cast("bigint"),
            lambda acc, bit: F.shiftleft(acc, 1).bitwiseOR(bit.cast("bigint")),
        )

    sh = (
        simhash_bits(df, id_col, text_col, num_bits=num_bits, hash_family=hash_family)
        .withColumn("packed", F.array(*[_pack_word(w) for w in range(n_words)]))
        .localCheckpoint(eager=True)
    )
    band_size = num_bits // num_bands
    banded = _band_buckets(
        sh, id_col, num_bands, band_size, array_col="simhash", carry=("packed",)
    )
    # Verify INSIDE the band join, deduplicate only survivors: the
    # packed values ride both join legs, so every collision is scored
    # with one codegen'd bit_count(xor) as it streams out of the join,
    # and the (expensive) distinct runs on the filtered pair set.
    # The previous shape — distinct on raw candidates, then two joins
    # back to the signatures — deduplicated first, which is the wrong
    # order once verification is this cheap: on the self-similar
    # testdata at max_hamming=8 the raw candidate volume is ~11M rows
    # and their distinct alone cost ~12 s of the key's 10-13 s.
    a = banded.select(F.col(id_col).alias("id_a"), F.col("packed").alias("pk_a"), "band", "bucket")
    b = banded.select(F.col(id_col).alias("id_b"), F.col("packed").alias("pk_b"), "band", "bucket")
    # static per-word sum (literal indices), not a fold over the word
    # array: the expression stays inside codegen for the 1-2 word case
    # that dominates, and this runs once per candidate PAIR
    hamming = sum(
        (
            F.bit_count(
                F.element_at("pk_a", w + 1).bitwiseXOR(F.element_at("pk_b", w + 1))
            )
            for w in range(n_words)
        ),
        start=F.lit(0),
    )
    out = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
    )
    return out.select("id_a", "id_b", "hamming").distinct()


# --- passage-level exact dedup -------------------------------------------------

def passage_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    passage_tokens: int = 32,
) -> DataFrame:
    """Passage-granularity exact dedup — the line-dedup pattern of web
    corpus pipelines (C4 / RefinedWeb drop every repeated LINE except
    one global copy) at fixed token-window granularity: each document
    splits into consecutive non-overlapping ``passage_tokens``-token
    passages, a passage repeated anywhere in the corpus survives only
    at its first occurrence (min ``(id, position)``), and every
    document is rebuilt from its kept passages.

    Returns one row per input document:
    ``id | n_passages | n_kept | n_dropped | rebuilt_md5`` (md5 of the
    kept passages re-joined with single spaces; documents with no
    tokens rebuild to ``md5('')``).

    Scale design (the reason this shape, not a window over raw text):
    - passage split is a pure projection (non-overlapping ``slice``
      calls: O(tokens) per document total, no shuffle);
    - the global first-occurrence is ONE hash aggregation keyed on the
      passage string (``min(struct(id, pos))`` — map-side combinable,
      so a boilerplate passage repeated in millions of docs partially
      aggregates before the exchange; a window over ``passage`` would
      instead sort every copy of the hot passage in one task);
    - the keep-verdict joins back on the same passage key (shuffle
      join, linear in corpus passages), and the rebuild is one
      aggregation per document whose state is bounded by the
      document's own passage count.
    """
    toks = tokens(F.col(text_col))
    n_passages = F.ceil(F.size(toks) / F.lit(float(passage_tokens))).cast("int")
    # sequence(0, -1) would count DOWN; guard the token-less case.
    passage_arr = F.when(F.size(toks) == 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_passages - 1),
            lambda i: F.array_join(
                F.slice(toks, i * passage_tokens + 1, passage_tokens), " "
            ),
        )
    )
    exploded = spread_rows(df, id_col).select(
        F.col(id_col), F.posexplode(passage_arr).alias("pidx", "passage")
    ).withColumn("pkey", F.xxhash64("passage"))
    # First-occurrence keys on the 64-bit fingerprint, not the raw
    # passage string: the aggregate's exchange carries 8 bytes per key
    # instead of up-to-32 tokens of text, and the verdict join probes
    # ints (ADVICE r7). Collision odds at 64 bits are ~n^2/2^65 —
    # negligible against corpus-scale passage counts.
    first_occurrence = exploded.groupBy("pkey").agg(
        F.min(F.struct(F.col(id_col), F.col("pidx"))).alias("keeper")
    )
    flagged = exploded.join(first_occurrence, "pkey").withColumn(
        "kept",
        (F.col("keeper")[id_col] == F.col(id_col))
        & (F.col("keeper")["pidx"] == F.col("pidx")),
    )
    kept_struct = F.when(F.col("kept"), F.struct("pidx", "passage"))
    rebuilt = flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_passages"),
        F.sum(F.when(F.col("kept"), 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)), lambda s: s["passage"]
                ),
                " ",
            )
        ).alias("rebuilt_md5"),
    )
    return (
        df.select(id_col)
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_passages", F.lit(0)).cast("bigint").alias("n_passages"),
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"),
            (F.coalesce("n_passages", F.lit(0)) - F.coalesce("n_kept", F.lit(0)))
            .cast("bigint")
            .alias("n_dropped"),
            F.coalesce("rebuilt_md5", F.md5(F.lit(""))).alias("rebuilt_md5"),
        )
    )

"""Physical-layout and skew query keys (SURVEY.md §7.5).

These wire the scale operators (``operators/layout.py``,
``operators/skew.py``, JSON source) as driver-verified keys: each
proves a 100 TB mechanism — partition pruning, shuffle-free bucketed
joins, salt-spread skew joins — while the oracle checks that the
mechanism changes only the PLAN, never the answer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from machine_learning_algorithm_sparkml__spark.operators.layout import (
    write_bucketed,
    write_partitioned,
    write_zordered,
    zorder_value,
)
from machine_learning_algorithm_sparkml__spark.operators.skew import salted_join
from machine_learning_algorithm_sparkml__spark.sources import (
    load_table,
    scratch_sink_path,
)


def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof join: lineitem (fact) x part (dim) salted over 16
    buckets, then a per-brand rollup. Salting spreads any hot partkey
    across 16 tasks; the dim is replicated 16x (dim-sized only — a
    broadcastable side would just be broadcast instead). The answer is
    salt-invariant, so the oracle is the plain join."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("partkey"), "l_extendedprice"
    )
    pt = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("partkey"), "p_brand"
    )
    joined = salted_join(li, pt, "partkey", salt_buckets=16)
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
    )


def q_sink_partitioned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directory-partitioned sink + pruned scan: orders written
    partitioned by o_orderpriority, read back with a partition filter
    — Spark lists ONLY the matching directory (PartitionFilters in the
    scan; asserted in tests/test_scale_features.py). At 100 TB this is
    the difference between one directory and the whole dataset."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    path = scratch_sink_path(sf_dir, "orders_by_priority")
    write_partitioned(orders, path, ["o_orderpriority"])
    back = spark.read.parquet(path).filter(F.col("o_orderpriority") == "1-URGENT")
    return back.select("o_orderkey", "o_totalprice", "o_orderpriority")


def q_layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustering round trip: orders rewritten
    range-partitioned + sorted by the bit-interleaved
    (o_custkey, o_orderkey) curve value, then scanned back with a 2-D
    range predicate. Output: the matching rows + their curve value
    (exact integer bit-math — DuckDB replays the interleave
    bit-for-bit). The LAYOUT claim — a small 2-D box lands in few
    files because each file covers a compact curve tile — is asserted
    physically in tests/test_scale_features.py via input_file_name();
    at 100 TB that is the difference between multi-dimensional scans
    pruning on parquet min/max stats and scanning the whole table
    (single-column sort only prunes its leading column)."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    path = scratch_sink_path(sf_dir, "orders_zordered")
    write_zordered(orders, path, "o_custkey", "o_orderkey", num_files=8)
    back = spark.read.parquet(path).filter(
        (F.col("o_custkey") < 64) & (F.col("o_orderkey") < 512)
    )
    return back.select(
        "o_orderkey",
        "o_custkey",
        zorder_value(F.col("o_custkey"), F.col("o_orderkey")).alias("z_value"),
    )


#: session memo for the bucketed join's table pair: (appId, id(spark),
#: sf_dir) -> (orders_table, customer_table). The WRITE is one-time
#: setup (in production the bucketed tables exist in the catalog; the
#: key measures the co-located JOIN) — r11's bench read 2.04 s because
#: every invocation paid two bucketed writes (~0.67 s measured) before
#: a 0.36 s join+agg. One write per session is exactly what a user's
#: pass through the workload pays; bench.py prices memoized keys with
#: a single timed run (SESSION_MEMO_KEYS).
_bucketed_pair: dict = {}


def _session_bucketed_pair(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    key = (spark.sparkContext.applicationId, id(spark), sf_dir)
    if key not in _bucketed_pair:
        # fixed per-sf names so re-runs never accumulate warehouse
        # dirs; a FRESH session's in-memory catalog doesn't know a
        # previous session's table even though its location survives
        # on disk, so clear both (DROP covers same-session re-entry,
        # rmtree covers the orphaned location) before the one write
        import shutil

        tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
        t_orders, t_cust = f"orders_bjoin_{tag}", f"customer_bjoin_{tag}"
        warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
        for t in (t_orders, t_cust):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
            shutil.rmtree(os.path.join(warehouse, t), ignore_errors=True)
        orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
        cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
        write_bucketed(orders, t_orders, "o_custkey", num_buckets=8)
        write_bucketed(cust, t_cust, "c_custkey", num_buckets=8)
        _bucketed_pair[key] = (t_orders, t_cust)
    return _bucketed_pair[key]


def q_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located join: orders and customer both bucketed 8
    ways on custkey => the join reads co-located buckets and needs NO
    exchange on either side (plan asserted in tests). The bucketed
    tables are session-memoized setup (see ``_bucketed_pair``), so the
    returned frame is LAZY — the r10-era bounded collect existed only
    to outlive a per-invocation DROP TABLE and is gone with it."""
    t_orders, t_cust = _session_bucketed_pair(spark, sf_dir)
    joined = spark.table(t_orders).join(
        spark.table(t_cust),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
    )


def q_sink_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink + scan round-trip (the interchange format of
    every LLM corpus pipeline): documents written as JSONL, read back
    with an EXPLICIT schema — never inferSchema, which at 100 TB is a
    full extra scan."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    path = scratch_sink_path(sf_dir, "documents_jsonl")
    docs.write.mode("overwrite").json(path)
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("text", T.StringType()),
    ])
    return spark.read.schema(schema).json(path)


def q_scan_jsonl_gzip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gzip-compressed JSONL ingestion — the wire format most raw web
    corpora actually arrive in (Common Crawl WET/WARC derivatives are
    .gz shards). Spark's text/json sources handle the codec natively
    (Hadoop CompressionCodecFactory, keyed on the .gz extension), so
    the operator is declarative: write documents as gzip JSONL, read
    back with an EXPLICIT schema.

    The 100 TB design point is the SHARDING, not the codec: gzip is
    NOT splittable — one .gz file = one task, no matter how large —
    so a corpus must arrive as many modest shards (the 8-way
    repartition here stands in for Common Crawl's ~100 MB shards; a
    single 100 GB .gz would serialize the whole scan onto one core).
    The read side then parallelizes per-file. Explicit schema for the
    usual reason: inferSchema on compressed JSON is a full extra
    decompress-and-scan of every shard."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    path = scratch_sink_path(sf_dir, "documents_jsonl_gz")
    docs.repartition(8).write.mode("overwrite").option("compression", "gzip").json(path)
    schema = T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("text", T.StringType()),
    ])
    return spark.read.schema(schema).json(path)


def q_scan_warc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC archive ingestion (VERDICT r13 #3) — the container a real
    100 TB crawl arrives in, and the composition point for the codec
    suite + text pipeline. The corpus is written as 8 deterministic
    WARC/1.0 shards EXECUTOR-side (warcinfo head records, HTTP/1.1
    response envelopes, metadata records the parser must skip —
    operators/archive.py:make_warc_shard), then scanned back: the
    ``binaryFile`` source distributes the shard listing (one task per
    file — like gzip, there is no mid-archive split point) and an
    Arrow-batched kernel walks Content-Length-framed records, strips
    the HTTP envelope, and emits (url, mime, payload_sha256, text);
    archive bytes never return to the JVM. Oracle: DuckDB replays the
    deterministic construction straight from the documents table."""
    import shutil

    from machine_learning_algorithm_sparkml__spark.operators.archive import (
        scan_warc,
        write_warc_shards,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    path = scratch_sink_path(sf_dir, "documents_warc")
    shutil.rmtree(path, ignore_errors=True)
    write_warc_shards(docs, path, n_shards=8)
    return scan_warc(spark, path)


def q_scan_tar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tar (USTAR) archive ingestion — the container SOURCE-CODE
    corpora arrive in (GitHub/Software-Heritage tarballs), completing
    the archive family beside WARC: the corpus is written as 8
    deterministic USTAR shards EXECUTOR-side (real 512-byte headers
    with spec checksums, directory members the parser must skip,
    block-padded data, zero-block terminator —
    operators/archive.py:make_tar_shard; the writer's output opens
    with any tar tool and the PARSER is validated against the stdlib
    tarfile reader in pytest — external ground truth), then scanned
    back through the binaryFile one-task-per-archive plan and an
    Arrow kernel that verifies each header checksum as it walks.
    Oracle: DuckDB replays the deterministic construction straight
    from the documents table."""
    import shutil

    from machine_learning_algorithm_sparkml__spark.operators.archive import (
        scan_tar,
        write_tar_shards,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    path = scratch_sink_path(sf_dir, "documents_tar")
    shutil.rmtree(path, ignore_errors=True)
    write_tar_shards(docs, path, n_shards=8)
    return scan_tar(spark, path)


def q_scan_warc_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-content WARC ingestion — the composition point VERDICT r13
    #3 asked for: one archive, two payload kinds. Every 5th document's
    record carries the REAL baseline JPEG the ``multimodal_jpeg_decode``
    fixture encodes (image/jpeg); the rest carry utf-8 text. The scan
    walks records AND dispatches by mime in ONE Arrow kernel —
    image/jpeg through the from-scratch JPEG decoder to
    (width, height, pixel_sum), text/* to the text column — because at
    100 TB re-scanning the crawl once per modality is the anti-pattern.
    Oracle: the image branch replays the per-block portable-md5 sum,
    the text branch reads the documents table, UNION ALL."""
    import shutil

    from machine_learning_algorithm_sparkml__spark.operators.archive import (
        scan_warc_media,
        write_warc_media_shards,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    path = scratch_sink_path(sf_dir, "documents_warc_media")
    shutil.rmtree(path, ignore_errors=True)
    write_warc_media_shards(docs, path, n_shards=8)
    return scan_warc_media(spark, path)


def q_scan_warc_gzip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``.warc.gz`` ingestion — the EXACT wire layout Common Crawl
    ships: each WARC record compressed as its own gzip member, members
    concatenated per shard (operators/archive.py:make_warc_gz_shard,
    mtime=0 for byte-identical re-runs). Member-per-record is the
    random-access contract — an offset index lets a reader inflate one
    record without touching the shard — and the scan kernel walks the
    members explicitly via zlib ``unused_data`` hand-off
    (iter_gzip_members) rather than flattening through a whole-stream
    decompress, because the member boundaries ARE the format. Same
    projection as ``scan_warc``: the compressed and plain layouts are
    drop-in interchangeable downstream, and the oracle is the same
    deterministic replay."""
    import shutil

    from machine_learning_algorithm_sparkml__spark.operators.archive import (
        scan_warc_gz,
        write_warc_gz_shards,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    path = scratch_sink_path(sf_dir, "documents_warc_gz")
    shutil.rmtree(path, ignore_errors=True)
    write_warc_gz_shards(docs, path, n_shards=8)
    return scan_warc_gz(spark, path)


def q_scan_warc_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl FIRST MILE end to end: WARC shards of REAL HTML pages
    (the shared fixture page — functions/text.py:fixture_html_page —
    served as text/html responses), scanned and boilerplate-stripped
    in one declarative pass: the Arrow kernel only frames records
    (archive walk), and title + main-text extraction stay JVM-side
    (functions/text.py:html_main_text regexp chain). This is the
    composition every 100 TB corpus build starts with — archive →
    extract → text — expressed as scan_warc piped into a projection,
    no extra Python hop. Oracle: the page construction is
    deterministic and escape→extract→unescape is the identity, so
    DuckDB states the expected output directly."""
    import shutil

    from machine_learning_algorithm_sparkml__spark.functions.text import (
        fixture_html_page,
        html_main_text,
        html_title,
    )
    from machine_learning_algorithm_sparkml__spark.operators.archive import (
        scan_warc,
        write_warc_shards,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pages = docs.select(
        "doc_id",
        fixture_html_page(F.col("doc_id"), F.col("text")).alias("text"),
    )
    path = scratch_sink_path(sf_dir, "documents_warc_html")
    shutil.rmtree(path, ignore_errors=True)
    write_warc_shards(pages, path, n_shards=8, mime="text/html; charset=utf-8")
    scanned = scan_warc(spark, path)
    return scanned.select(
        "url",
        html_title(F.col("text")).alias("title"),
        html_main_text(F.col("text")).alias("main_text"),
    )


def q_scan_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``binaryFile`` source — the multimodal INGESTION step the
    in-frame keys stop short of: `multimodal_*` fabricate the binary
    column from text (`attach_binary_payload`), but a real corpus
    starts as loose media files in object storage, and
    ``spark.read.format("binaryFile")`` is Spark's built-in scan for
    exactly that (rows of path/modificationTime/length/content, with
    a directory listing that distributes across executors and a
    ``pathGlobFilter`` that prunes at listing time — at 100 TB the
    listing, not the bytes, is the first bottleneck).

    Fixture: the first 10 documents' utf-8 bytes written as one file
    each (driver-side, bounded — fixture construction, same class as
    codebook training samples). The projection keeps only pure
    functions of file NAME and CONTENT (leaf name, byte length,
    sha256), so host-dependent path prefixes and modification times
    never cross the driver-compare boundary. Oracle: DuckDB replays
    name/length/digest from the documents table."""
    import os
    import shutil

    rows = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 10)
        .select("doc_id", "text")
        .collect()
    )
    dirpath = scratch_sink_path(sf_dir, "docs_binary")
    shutil.rmtree(dirpath, ignore_errors=True)
    os.makedirs(dirpath, exist_ok=True)
    for r in rows:
        with open(os.path.join(dirpath, f"doc_{r['doc_id']}.bin"), "wb") as f:
            f.write(r["text"].encode("utf-8"))
    scanned = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.bin")
        .load(dirpath)
    )
    return scanned.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("fname"),
        F.col("length").alias("n_bytes"),
        F.sha2(F.col("content"), 256).alias("sha256"),
    )


def q_scan_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom connector via the Python Data Source API
    (sources/pyds.py) — the Spark-4 extension surface for feeds with
    no built-in reader. The source declares its split layout in
    ``partitions()`` (8 here, pinned in tests: the scan really runs
    as 8 parallel tasks) and each ``read(partition)`` executes in an
    executor task, so a real connector built this way scales out like
    a file scan instead of bottlenecking on a driver-side fetch loop.
    The demonstrator feed is a pure function of the row id, so every
    row the connector crossing produces — option parsing, partition
    planning, per-task generation, type mapping — is oracle-replayed
    from a generate_series. Volume is fixed by option, not sf_dir:
    the subject under test is the connector, not the corpus."""
    from machine_learning_algorithm_sparkml__spark.sources.pyds import register

    register(spark)
    return (
        spark.read.format("synthlog")
        .option("partitions", "8")
        .option("rowsPerPartition", "2500")
        .load()
    )


def q_scan_python_datasource_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter pushdown through the Python Data Source API (Spark 4.1
    ``pushFilters``): the id-range predicate reaches the connector
    BEFORE split planning, so only the 2 of 8 partitions intersecting
    [5000, 10000) are ever planned (partition pruning) and each
    surviving task generates only in-bound rows (row skipping) — the
    custom-source analogue of parquet directory pruning + row-group
    stats, and at 100 TB the difference between scanning a feed and
    scanning a slice of it. Unhandled predicates are yielded back to
    Spark, so the source can only over-read, never over-prune. The
    2-task plan is pinned in tests; the oracle replays the slice from
    generate_series."""
    from machine_learning_algorithm_sparkml__spark.sources.pyds import register

    register(spark)
    df = (
        spark.read.format("synthlog")
        .option("partitions", "8")
        .option("rowsPerPartition", "2500")
        .load()
    )
    return df.filter((F.col("id") >= 5000) & (F.col("id") < 10000))


def q_sink_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WRITE plane of the Python Data Source connector
    (sources/pyds.py:_ManifestJsonWriter): orders written through the
    custom transactional JSON sink — per-task staged files, a
    driver-side commit() that runs iff every task succeeded, and a
    _MANIFEST naming exactly the committed files — then read back
    trusting ONLY the manifest. The round-trip through the two-phase
    commit is the subject: a torn write is unobservable by
    construction (abort deletes staged files; a crash leaves only
    ignorable .staged orphans, which the pytest plants and proves
    invisible). Doubles survive exactly (json shortest-repr
    round-trips bit-equal). Oracle: the plain projection."""
    import json
    import os
    import shutil

    from machine_learning_algorithm_sparkml__spark.sources.pyds import register

    register(spark)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    dst = scratch_sink_path(sf_dir, "orders_pyds_sink")
    shutil.rmtree(dst, ignore_errors=True)
    orders.repartition(4).write.format("synthlog").mode("append").option(
        "path", dst
    ).save()
    man = json.load(open(os.path.join(dst, "_MANIFEST")))
    files = [os.path.join(dst, e["file"]) for e in man["files"]]
    return spark.read.schema(
        "o_orderkey bigint, o_orderstatus string, o_totalprice double"
    ).json(files)


def q_layout_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction round-trip: orders deliberately
    fragmented into 64 tiny parquet files, then rewritten to
    target-size files by `operators/layout.py:compact_small_files`
    (output count sized from the source LISTING — metadata only —
    then one balanced round-robin repartition pass). The answer is
    layout-invariant, so the oracle is the plain projection; the
    physical claims (file count = ceil(total/target), balanced sizes,
    no row lost) are pinned in tests/test_scale_features.py. At
    100 TB this is the nightly housekeeping that keeps scan cost
    proportional to BYTES instead of FILE COUNT."""
    from machine_learning_algorithm_sparkml__spark.operators.layout import (
        compact_small_files,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    frag = scratch_sink_path(sf_dir, "orders_fragmented")
    dst = scratch_sink_path(sf_dir, "orders_compacted")
    orders.repartition(64).write.mode("overwrite").parquet(frag)
    compact_small_files(spark, frag, dst, target_file_bytes=256 * 1024)
    return spark.read.parquet(dst).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


def q_layout_compaction_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clustering-retaining compaction
    (`operators/layout.py:compact_small_files_clustered`): the same
    fragmented-orders fixture rewritten via repartitionByRange +
    within-partition sort on o_orderkey, so after compaction each
    output file covers a DISJOINT orderkey range and min/max stats
    prune range scans — round-robin compaction (layout_compaction)
    would leave every file spanning the full key range. The answer is
    layout-invariant (oracle = plain projection); the physical claims
    (disjoint per-file key ranges, a range predicate's candidate file
    set shrinking to O(selectivity), file count, losslessness) are
    pinned in tests/test_scale_features.py."""
    from machine_learning_algorithm_sparkml__spark.operators.layout import (
        compact_small_files_clustered,
    )

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    frag = scratch_sink_path(sf_dir, "orders_fragmented_cl")
    dst = scratch_sink_path(sf_dir, "orders_compacted_cl")
    orders.repartition(64).write.mode("overwrite").parquet(frag)
    compact_small_files_clustered(
        spark, frag, dst, "o_orderkey", target_file_bytes=256 * 1024
    )
    return spark.read.parquet(dst).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


def q_sink_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite — the idempotent-backfill write
    semantic: with ``partitionOverwriteMode=dynamic``, an overwrite
    replaces ONLY the partitions present in the incoming frame,
    leaving every other partition untouched (static mode would wipe
    the whole table root). The daily job that recomputes one day and
    rewrites just that directory is this exact pattern; at 100 TB it
    is the difference between an O(day) and O(table) write.

    Program: orders written partitioned by priority; then the
    1-URGENT partition alone is re-written with repriced rows
    (+1000.0, exactly representable) through a dynamic-mode
    overwrite. Read-back must show 1-URGENT repriced and all other
    priorities byte-identical — which is exactly what the oracle's
    CASE states. The mode is scoped to this write, not the session.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    path = scratch_sink_path(sf_dir, "orders_dyn_overwrite")
    orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(path)

    repriced = orders.filter(F.col("o_orderpriority") == "1-URGENT").withColumn(
        "o_totalprice", F.col("o_totalprice") + 1000.0
    )
    mode_key = "spark.sql.sources.partitionOverwriteMode"
    old_mode = spark.conf.get(mode_key)
    spark.conf.set(mode_key, "dynamic")
    try:
        repriced.write.mode("overwrite").partitionBy("o_orderpriority").parquet(path)
    finally:
        spark.conf.set(mode_key, old_mode)
    return spark.read.parquet(path).select(
        "o_orderkey", "o_totalprice", F.col("o_orderpriority").cast("string").alias("o_orderpriority")
    )


def q_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Observation API: audit metrics (rows in, rows out, money
    out) collected DURING a single pass of the job, not by a second
    scan — at 100 TB a row-count/sum audit that re-reads the input
    doubles the job; ``df.observe`` attaches exact aggregates to the
    existing plan for free. Program: count+sum observed on both sides
    of a status filter, driven by one action; the three scalars (a
    bounded 1-row driver materialization) are returned as the result
    frame. Oracle: the same scalars as subqueries over orders."""
    from pyspark.sql import Observation

    orders = load_table(spark, sf_dir, "orders")
    obs_in, obs_out = Observation("audit_in"), Observation("audit_out")
    pipeline = (
        orders.observe(obs_in, F.count(F.lit(1)).alias("n_in"))
        .filter(F.col("o_orderstatus") == "F")
        .observe(
            obs_out,
            F.count(F.lit(1)).alias("n_out"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_out"),
        )
    )
    pipeline.write.format("noop").mode("overwrite").save()  # one pass, no sink cost
    return spark.createDataFrame(
        [(obs_in.get["n_in"], obs_out.get["n_out"], float(obs_out.get["sum_out"]))],
        "n_in long, n_out long, sum_out double",
    )


def q_json_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT — the semi-structured type that replaces
    schema-on-read string JSON: ``parse_json`` stores a binary-encoded
    value whose fields are extracted with ``variant_get`` WITHOUT
    re-parsing text per access (at 100 TB, repeated
    ``get_json_object`` over a string column re-tokenizes the payload
    for every field; variant decodes once at ingest). Program: each
    document rendered to a JSON payload with a nested object, parsed
    to VARIANT, then typed extraction of top-level and nested paths.
    Oracle: the same fields straight off the table — VARIANT must be
    a lossless round-trip. The `json_extract` key keeps the
    string-JSON path for contrast."""
    docs = load_table(spark, sf_dir, "documents")
    payload = F.to_json(
        F.struct(
            F.col("doc_id"),
            F.col("lang"),
            F.length("text").alias("nchars"),
            F.struct(F.col("source")).alias("meta"),
        )
    )
    v = docs.select("doc_id", F.parse_json(payload).alias("v"))
    return v.select(
        "doc_id",
        F.expr("variant_get(v, '$.lang', 'string')").alias("lang"),
        F.expr("variant_get(v, '$.nchars', 'long')").alias("nchars"),
        F.expr("variant_get(v, '$.meta.source', 'string')").alias("src"),
    )


def q_scan_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution across parquet file generations — the most
    common format drift in a long-lived corpus: a column added later
    exists only in newer files. Generation 1 (even orderkeys) is
    written WITHOUT ``o_totalprice``; generation 2 (odd orderkeys)
    carries it. ``mergeSchema`` + ``recursiveFileLookup`` (the latter
    deliberately disables partition-style dir inference) reads both
    under the unified schema, with the missing column NULL for gen-1
    rows — exactly replayable in SQL as a CASE over the parity split.

    Scale note: ``mergeSchema`` reconciles schemas by reading EVERY
    file footer — fine per-directory, pathological over millions of
    files. The 100 TB deployment pins the unified schema explicitly
    (``.schema(...)`` on read, missing columns still null-filled) or
    keeps schema in table-format metadata; this key pins the
    SEMANTICS both paths must honor."""
    orders = load_table(spark, sf_dir, "orders")
    dirpath = scratch_sink_path(sf_dir, "orders_schema_evo")
    even = F.col("o_orderkey") % 2 == 0
    orders.filter(even).select("o_orderkey", "o_orderstatus").write.mode(
        "overwrite"
    ).parquet(os.path.join(dirpath, "gen1"))
    orders.filter(~even).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).write.mode("overwrite").parquet(os.path.join(dirpath, "gen2"))
    merged = (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(dirpath)
    )
    return merged.select("o_orderkey", "o_orderstatus", "o_totalprice")


def q_scan_json_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONL dirty-row contract — the interchange format of every LLM
    corpus pipeline gets the same robustness treatment as the CSV scan
    (`scan_csv_malformed`): planted breakage, both standard parser
    modes, exact-count oracle. Corruption plan (keyed on doc_id so
    DuckDB replays it from the documents table):

    - ``doc_id % 100 == 7`` -> type mismatch (``n_chars`` serialized
      as a non-numeric string): JSON PERMISSIVE nulls the whole row's
      fields and fills ``_corrupt_record``;
    - ``doc_id % 100 == 13`` -> truncated object (closing brace cut):
      syntactically invalid, corrupt in every mode;
    - ``doc_id % 100 == 21`` -> MISSING ``lang`` field: NOT corrupt —
      JSON is schema-flexible, absent fields read as null. The key
      counts these separately (``n_missing_field_valid``) to pin the
      asymmetry against CSV, where a missing token is wrong arity.

    DROPMALFORMED keeps the missing-field rows and drops only the two
    genuinely corrupt classes. The aggregates reference every schema
    column (same pruning discipline as the CSV key). One-row result,
    exact integers."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    key_mod = F.col("doc_id") % 100
    clean_json = F.to_json(F.struct("doc_id", "lang", "n_chars"))
    line = (
        F.when(
            key_mod == 7,
            F.to_json(
                F.struct(
                    F.col("doc_id"),
                    F.col("lang"),
                    F.lit("NOT_A_NUMBER").alias("n_chars"),
                )
            ),
        )
        .when(key_mod == 13, F.expr("substring(to_json(struct(doc_id, lang, n_chars)), 1, length(to_json(struct(doc_id, lang, n_chars))) - 1)"))
        .when(key_mod == 21, F.to_json(F.struct("doc_id", "n_chars")))
        .otherwise(clean_json)
    )
    path = scratch_sink_path(sf_dir, "documents_jsonl_dirty")
    docs.select(line.alias("value")).write.mode("overwrite").text(path)

    fields = [
        T.StructField("doc_id", T.LongType()),
        T.StructField("lang", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
    perm_schema = T.StructType(
        list(fields) + [T.StructField("_corrupt_record", T.StringType())]
    )
    permissive = (
        spark.read.schema(perm_schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .select("doc_id", "lang", "n_chars", "_corrupt_record")
    )
    perm_row = permissive.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count("_corrupt_record").alias("n_corrupt"),
        F.sum(
            (F.col("_corrupt_record").isNull() & F.col("lang").isNull()).cast("bigint")
        ).alias("n_missing_field_valid"),
        F.count("n_chars").alias("n_nchars_parsed"),
    ).first()
    dropped = (
        spark.read.schema(T.StructType(fields))
        .option("mode", "DROPMALFORMED")
        .json(path)
        .select("doc_id", "lang", "n_chars")
    )
    drop_row = dropped.agg(
        F.count(F.lit(1)).alias("n_dropmalformed"),
        F.sum("n_chars").alias("sum_nchars_clean"),
    ).first()
    return spark.createDataFrame(
        [(
            int(perm_row["n_total"]),
            int(perm_row["n_corrupt"]),
            int(perm_row["n_missing_field_valid"]),
            int(perm_row["n_nchars_parsed"]),
            int(drop_row["n_dropmalformed"]),
            int(drop_row["sum_nchars_clean"]),
        )],
        "n_total long, n_corrupt long, n_missing_field_valid long,"
        " n_nchars_parsed long, n_dropmalformed long, sum_nchars_clean long",
    )


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rows-only: fixed-iteration PageRank over a deterministic graph
    derived from events (src = user_id, dst = a Knuth-hash spread of
    event_id — reproducible, skewed like real link graphs). Second
    iterative-operator key after connected components: per-round ONE
    vertex-keyed join + ONE aggregation, localCheckpoint lineage
    truncation, dangling mass redistributed.

    Self-verdicts (rows-only driver check): ``rank_sum_ok`` — total
    rank conserved at |V| within 1e-6 relative; ``rank_min_ok`` —
    every rank >= (1-damping), the theoretical floor."""
    from machine_learning_algorithm_sparkml__spark.operators.graph import pagerank

    events = load_table(spark, sf_dir, "events")
    edges = events.select(
        F.col("user_id").alias("src"),
        F.pmod(F.col("event_id") * F.lit(2654435761), F.lit(1024)).alias("dst"),
    )
    nodes = edges.select(F.col("src").alias("id")).unionAll(
        edges.select(F.col("dst").alias("id"))
    )
    ranks = pagerank(nodes, edges, iterations=5, damping=0.85).localCheckpoint(
        eager=True
    )
    n = ranks.count()
    inv = ranks.agg(
        (F.abs(F.sum("rank") - F.lit(float(n))) / F.lit(float(n)) < 1e-6).alias("rank_sum_ok"),
        (F.min("rank") >= 0.15 - 1e-9).alias("rank_min_ok"),
    )
    return ranks.select("id", F.round("rank", 6).alias("rank")).crossJoin(
        F.broadcast(inv)
    )


def q_graph_link_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the EXTRACTED link graph — the full crawl chain
    composed: fixture pages → html_links (functions/text.py) → href
    parse → operators/graph.pagerank. The edge list is real output of
    the link extractor (hrefs parsed back to target ids, NOT the
    closed form re-derived), sources are the 500 crawled docs and
    targets span 0..999 — half the targets are pages the crawl hasn't
    fetched, so the dangling-mass redistribution path carries real
    weight, exactly like a frontier-edge graph. Oracle: the edge rule
    replayed closed-form + the same 5-iteration recursive-CTE PageRank
    as graph_pagerank."""
    from machine_learning_algorithm_sparkml__spark.functions.text import (
        fixture_html_page,
        html_links,
    )
    from machine_learning_algorithm_sparkml__spark.operators.graph import pagerank

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    page = docs.select(
        "doc_id", fixture_html_page(F.col("doc_id"), F.col("text")).alias("html")
    )
    edges = (
        page.select("doc_id", F.explode(html_links(F.col("html"))).alias("e"))
        .select(
            F.col("doc_id").alias("src"),
            F.element_at(F.split(F.col("e.href"), "/"), -1).cast("long").alias("dst"),
        )
    )
    nodes = edges.select(F.col("src").alias("id")).unionAll(
        edges.select(F.col("dst").alias("id"))
    )
    ranks = pagerank(nodes, edges, iterations=5, damping=0.85)
    return ranks.select("id", F.round("rank", 6).alias("rank"))


def q_graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts over a deterministic sparse hash graph
    derived from events (two independent md5 spreads of event_id over
    4096 nodes — reproducible, Erdős–Rényi-shaped; LINEAR spreads like
    ``k*event_id % 4096`` would make dst an affine function of src —
    a functional graph with zero triangles). Third graph-algorithm key
    after connected components and PageRank; the operator is the
    degree-ordered wedge join (out-degree bounded by O(sqrt(m)) — see
    ``operators.graph.triangles``), so no hub node can make the
    self-join quadratic.

    Contract (ADVICE r7): nodes in ZERO triangles emit NO row — the
    result enumerates triangle corners, unlike GraphX's
    ``triangleCount`` which reports 0 per vertex. Consumers wanting
    the dense form should left-join against their node frame with
    ``coalesce(n_triangles, 0)``; the DuckDB oracle checks the sparse
    contract as stated."""
    from machine_learning_algorithm_sparkml__spark.operators.graph import triangles

    def node(salt: str):
        return F.pmod(
            F.conv(
                F.substring(F.md5(F.concat(F.col("event_id").cast("string"), F.lit(salt))), 1, 8),
                16,
                10,
            ).cast("bigint"),
            F.lit(4096),
        )

    events = load_table(spark, sf_dir, "events")
    edges = events.select(node("a").alias("src"), node("b").alias("dst"))
    tri = triangles(edges)
    corners = (
        tri.select(F.col("id_a").alias("id"))
        .unionAll(tri.select(F.col("id_b").alias("id")))
        .unionAll(tri.select(F.col("id_c").alias("id")))
    )
    return corners.groupBy("id").agg(F.count(F.lit(1)).alias("n_triangles"))


QUERIES = {
    "join_skew_salted": q_join_skew_salted,
    "sink_partitioned_scan": q_sink_partitioned_scan,
    "layout_zorder": q_layout_zorder,
    "join_bucketed": q_join_bucketed,
    "sink_json": q_sink_json_roundtrip,
    "scan_jsonl_gzip": q_scan_jsonl_gzip,
    "scan_warc": q_scan_warc,
    "scan_tar": q_scan_tar,
    "scan_warc_media": q_scan_warc_media,
    "scan_warc_gzip": q_scan_warc_gzip,
    "scan_warc_html": q_scan_warc_html,
    "scan_json_malformed": q_scan_json_malformed,
    "scan_binary_files": q_scan_binary_files,
    "scan_schema_evolution": q_scan_schema_evolution,
    "layout_compaction": q_layout_compaction,
    "layout_compaction_clustered": q_layout_compaction_clustered,
    "scan_python_datasource": q_scan_python_datasource,
    "scan_python_datasource_pushdown": q_scan_python_datasource_pushdown,
    "sink_python_datasource": q_sink_python_datasource,
    "sink_dynamic_partition_overwrite": q_sink_dynamic_partition_overwrite,
    "observe_metrics": q_observe_metrics,
    "json_variant_extract": q_json_variant_extract,
    "graph_pagerank": q_graph_pagerank,
    "graph_link_pagerank": q_graph_link_pagerank,
    "graph_triangle_count": q_graph_triangle_count,
}

ORACLE = {

    # fixed-iteration PageRank IS SQL-expressible: DuckDB recursive CTE
    # (aggregation + multiple recursive references are supported), same
    # float expression shapes as operators/graph.pagerank so the
    # round(6) values agree (upgraded from rows-only, round 7)
    # link-graph PageRank: the fixture's outlink rule replayed
    # closed-form, then the same 5-iteration recursive-CTE replay as
    # graph_pagerank below
    "graph_link_pagerank": """
        WITH RECURSIVE
        e AS (
            SELECT doc_id AS src, (doc_id * 7 + k.k * 13) % 1000 AS dst
            FROM documents, (SELECT unnest(range(0, 3)) AS k) AS k
        ),
        nodes AS (
            SELECT DISTINCT id
            FROM (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e) u
        ),
        deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
        it(i, id, rank) AS (
            SELECT 0, id, CAST(1.0 AS DOUBLE) FROM nodes
            UNION ALL
            SELECT cur.i + 1, cur.id,
                   ((1.0 - 0.85)
                    + 0.85 * (SELECT COALESCE(SUM(d.rank), 0.0) FROM it d
                              WHERE NOT EXISTS (SELECT 1 FROM deg WHERE deg.src = d.id))
                           / (SELECT n FROM nn))
                   + 0.85 * COALESCE(c.received, 0.0)
            FROM it cur
            LEFT JOIN (
                SELECT e.dst AS id, SUM(p.rank / deg.deg) AS received
                FROM it p JOIN e ON p.id = e.src JOIN deg ON deg.src = p.id
                GROUP BY e.dst
            ) c ON c.id = cur.id
            WHERE cur.i < 5
        )
        SELECT id, ROUND(rank, 6) AS rank FROM it WHERE i = 5
    """,
    "graph_pagerank": """
        WITH RECURSIVE
        e AS (
            SELECT user_id AS src, (event_id * 2654435761) % 1024 AS dst FROM events
        ),
        nodes AS (
            SELECT DISTINCT id
            FROM (SELECT src AS id FROM e UNION ALL SELECT dst AS id FROM e) u
        ),
        deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY src),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
        it(i, id, rank) AS (
            SELECT 0, id, CAST(1.0 AS DOUBLE) FROM nodes
            UNION ALL
            SELECT cur.i + 1, cur.id,
                   ((1.0 - 0.85)
                    + 0.85 * (SELECT COALESCE(SUM(d.rank), 0.0) FROM it d
                              WHERE NOT EXISTS (SELECT 1 FROM deg WHERE deg.src = d.id))
                           / (SELECT n FROM nn))
                   + 0.85 * COALESCE(c.received, 0.0)
            FROM it cur
            LEFT JOIN (
                SELECT e.dst AS id, SUM(p.rank / deg.deg) AS received
                FROM it p JOIN e ON p.id = e.src JOIN deg ON deg.src = p.id
                GROUP BY e.dst
            ) c ON c.id = cur.id
            WHERE cur.i < 5
        ),
        final AS (SELECT id, rank FROM it WHERE i = 5),
        inv AS (
            SELECT (ABS(SUM(rank) - (SELECT n FROM nn)) / (SELECT n FROM nn) < 1e-6) AS rank_sum_ok,
                   (MIN(rank) >= 0.15 - 1e-9) AS rank_min_ok
            FROM final
        )
        SELECT f.id, ROUND(f.rank, 6) AS rank, inv.rank_sum_ok, inv.rank_min_ok
        FROM final f CROSS JOIN inv
    """,
    "join_skew_salted": """
        SELECT p.p_brand,
               COUNT(*) AS n_items,
               ROUND(SUM(l.l_extendedprice), 2) AS sum_price
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_brand
    """,
    "layout_zorder": """
        -- bit-interleaved Morton value, replayed as plain integer
        -- bit ops; the write round-trip is semantics-preserving so
        -- the oracle reads the original table
        SELECT o_orderkey, o_custkey,
               CAST(((((o_custkey & 65535) >> 0) & 1) << 0) + ((((o_orderkey & 65535) >> 0) & 1) << 1) + ((((o_custkey & 65535) >> 1) & 1) << 2) + ((((o_orderkey & 65535) >> 1) & 1) << 3) + ((((o_custkey & 65535) >> 2) & 1) << 4) + ((((o_orderkey & 65535) >> 2) & 1) << 5) + ((((o_custkey & 65535) >> 3) & 1) << 6) + ((((o_orderkey & 65535) >> 3) & 1) << 7) + ((((o_custkey & 65535) >> 4) & 1) << 8) + ((((o_orderkey & 65535) >> 4) & 1) << 9) + ((((o_custkey & 65535) >> 5) & 1) << 10) + ((((o_orderkey & 65535) >> 5) & 1) << 11) + ((((o_custkey & 65535) >> 6) & 1) << 12) + ((((o_orderkey & 65535) >> 6) & 1) << 13) + ((((o_custkey & 65535) >> 7) & 1) << 14) + ((((o_orderkey & 65535) >> 7) & 1) << 15) + ((((o_custkey & 65535) >> 8) & 1) << 16) + ((((o_orderkey & 65535) >> 8) & 1) << 17) + ((((o_custkey & 65535) >> 9) & 1) << 18) + ((((o_orderkey & 65535) >> 9) & 1) << 19) + ((((o_custkey & 65535) >> 10) & 1) << 20) + ((((o_orderkey & 65535) >> 10) & 1) << 21) + ((((o_custkey & 65535) >> 11) & 1) << 22) + ((((o_orderkey & 65535) >> 11) & 1) << 23) + ((((o_custkey & 65535) >> 12) & 1) << 24) + ((((o_orderkey & 65535) >> 12) & 1) << 25) + ((((o_custkey & 65535) >> 13) & 1) << 26) + ((((o_orderkey & 65535) >> 13) & 1) << 27) + ((((o_custkey & 65535) >> 14) & 1) << 28) + ((((o_orderkey & 65535) >> 14) & 1) << 29) + ((((o_custkey & 65535) >> 15) & 1) << 30) + ((((o_orderkey & 65535) >> 15) & 1) << 31) AS BIGINT) AS z_value
        FROM orders
        WHERE o_custkey < 64 AND o_orderkey < 512
    """,
    "sink_partitioned_scan": """
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
    "join_bucketed": """
        SELECT c.c_mktsegment,
               COUNT(*) AS n_orders,
               ROUND(SUM(o.o_totalprice), 2) AS sum_price
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
    "sink_json": """
        SELECT doc_id, lang, text FROM documents
    """,
    # gzip JSONL round-trip is semantics-preserving: the oracle reads
    # the original table; the codec + sharding are the operator
    "scan_jsonl_gzip": """
        SELECT doc_id, lang, text FROM documents
    """,
    # WARC replay: the fixture construction is deterministic, so the
    # oracle regenerates the response-record projection directly —
    # warcinfo/metadata records never surface from the parser
    "scan_warc": """
        SELECT 'https://corpus.example.com/docs/' || doc_id AS url,
               'text/plain; charset=utf-8' AS mime,
               sha256(text) AS payload_sha256,
               text
        FROM documents
    """,
    # tar replay: deterministic construction — directory members never
    # surface from the parser; size is the utf-8 byte length
    "scan_tar": """
        SELECT 'docs/' || lpad(CAST(doc_id AS VARCHAR), 8, '0') || '.txt' AS name,
               CAST(octet_length(encode(text)) AS BIGINT) AS size,
               sha256(text) AS payload_sha256,
               text
        FROM documents
    """,
    # archive -> HTML-extract composition: construction deterministic,
    # escape->extract->unescape the identity, so the oracle states the
    # expected output ('g' flag: DuckDB regexp_replace is
    # first-match-only without it)
    "scan_warc_html": """
        SELECT 'https://corpus.example.com/docs/' || doc_id AS url,
               'Doc ' || doc_id AS title,
               trim(regexp_replace('Doc ' || doc_id || ' & co ' || COALESCE(text, ''), '\\s+', ' ', 'g')) AS main_text
        FROM documents
    """,
    # .warc.gz carries the same records as scan_warc — one replay
    "scan_warc_gzip": """
        SELECT 'https://corpus.example.com/docs/' || doc_id AS url,
               'text/plain; charset=utf-8' AS mime,
               sha256(text) AS payload_sha256,
               text
        FROM documents
    """,
    # mixed-content WARC: image branch replays the JPEG per-block
    # portable-md5 pixel sum (the multimodal_jpeg_decode replay,
    # restricted to the media docs), text branch reads straight from
    # documents; UNION ALL with explicit NULL casts for the other
    # branch's columns
    "scan_warc_media": """
        WITH dims AS (
            SELECT doc_id,
                   CAST(8 * (1 + doc_id % 3) AS INTEGER) AS width,
                   CAST(8 * (1 + doc_id % 4) AS INTEGER) AS height
            FROM documents WHERE doc_id % 5 = 0
        ), blocks AS (
            SELECT doc_id, width, height,
                   unnest(range(0, (width // 8) * (height // 8))) AS b
            FROM dims
        ), img AS (
            SELECT doc_id, width, height,
                   CAST(SUM((CAST('0x' || substr(md5('jpeg:' || doc_id || ':' || b), 1, 15) AS BIGINT) % 256) * 192) AS BIGINT) AS pixel_sum
            FROM blocks GROUP BY doc_id, width, height
        )
        SELECT 'https://corpus.example.com/docs/' || doc_id AS url,
               'image/jpeg' AS mime, width, height, pixel_sum,
               CAST(NULL AS VARCHAR) AS text
        FROM img
        UNION ALL
        SELECT 'https://corpus.example.com/docs/' || doc_id AS url,
               'text/plain; charset=utf-8' AS mime,
               CAST(NULL AS INTEGER) AS width,
               CAST(NULL AS INTEGER) AS height,
               CAST(NULL AS BIGINT) AS pixel_sum,
               text
        FROM documents WHERE doc_id % 5 <> 0
    """,
    "scan_binary_files": """
        SELECT 'doc_' || doc_id || '.bin' AS fname,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               sha256(text) AS sha256
        FROM documents WHERE doc_id < 10
    """,
    "json_variant_extract": """
        SELECT doc_id, lang,
               CAST(LENGTH(text) AS BIGINT) AS nchars,
               source AS src
        FROM documents
    """,
    "observe_metrics": """
        SELECT (SELECT COUNT(*) FROM orders) AS n_in,
               (SELECT COUNT(*) FROM orders WHERE o_orderstatus = 'F') AS n_out,
               (SELECT ROUND(SUM(o_totalprice), 2) FROM orders
                WHERE o_orderstatus = 'F') AS sum_out
    """,
    "sink_dynamic_partition_overwrite": """
        SELECT o_orderkey,
               CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice + 1000.0
                    ELSE o_totalprice END AS o_totalprice,
               o_orderpriority
        FROM orders
    """,
    "layout_compaction": """
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    """,
    "layout_compaction_clustered": """
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    """,
    "scan_python_datasource": """
        SELECT g AS id,
               CAST(g // 2500 AS INTEGER) AS part,
               ((g * 2654435761) % 1000003) / 1000.0 AS value,
               CASE g % 4 WHEN 0 THEN 'auth' WHEN 1 THEN 'page'
                          WHEN 2 THEN 'api' ELSE 'batch' END AS category
        FROM generate_series(0, 19999) t(g)
    """,
    "sink_python_datasource": """
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
    """,
    "scan_python_datasource_pushdown": """
        SELECT g AS id,
               CAST(g // 2500 AS INTEGER) AS part,
               ((g * 2654435761) % 1000003) / 1000.0 AS value,
               CASE g % 4 WHEN 0 THEN 'auth' WHEN 1 THEN 'page'
                          WHEN 2 THEN 'api' ELSE 'batch' END AS category
        FROM generate_series(5000, 9999) t(g)
    """,
    "scan_schema_evolution": """
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 2 <> 0 THEN o_totalprice END AS o_totalprice
        FROM orders
    """,
    "scan_json_malformed": """
        SELECT (SELECT COUNT(*) FROM documents) AS n_total,
               (SELECT COUNT(*) FROM documents
                WHERE doc_id % 100 IN (7, 13)) AS n_corrupt,
               (SELECT COUNT(*) FROM documents
                WHERE doc_id % 100 = 21) AS n_missing_field_valid,
               (SELECT COUNT(*) FROM documents
                WHERE doc_id % 100 NOT IN (7, 13)) AS n_nchars_parsed,
               (SELECT COUNT(*) FROM documents
                WHERE doc_id % 100 NOT IN (7, 13)) AS n_dropmalformed,
               (SELECT CAST(SUM(n_chars) AS BIGINT) FROM documents
                WHERE doc_id % 100 NOT IN (7, 13)) AS sum_nchars_clean
    """,
    # degree-ordered triangle enumeration, mirrored step for step:
    # canonical undirected edges -> degrees -> (deg, id)-orientation ->
    # wedge join + closing-edge semi-join -> corner counts
    "graph_triangle_count": """
        WITH raw AS (
            SELECT CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || 'a'), 1, 8)) AS BIGINT) % 4096 AS src,
                   CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR) || 'b'), 1, 8)) AS BIGINT) % 4096 AS dst
            FROM events
        ), canon AS (
            SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
            FROM raw WHERE src <> dst
        ), deg AS (
            SELECT id, COUNT(*) AS deg
            FROM (SELECT a AS id FROM canon UNION ALL SELECT b FROM canon) u
            GROUP BY id
        ), oriented AS (
            SELECT CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND c.a < c.b)
                        THEN c.a ELSE c.b END AS u,
                   CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND c.a < c.b)
                        THEN c.b ELSE c.a END AS v
            FROM canon c
            JOIN deg da ON da.id = c.a
            JOIN deg db ON db.id = c.b
        ), tri AS (
            SELECT e1.u AS id_a, e1.v AS id_b, e2.v AS id_c
            FROM oriented e1 JOIN oriented e2 ON e1.v = e2.u
            WHERE EXISTS (
                SELECT 1 FROM oriented e3 WHERE e3.u = e1.u AND e3.v = e2.v
            )
        )
        SELECT id, COUNT(*) AS n_triangles
        FROM (
            SELECT id_a AS id FROM tri
            UNION ALL SELECT id_b FROM tri
            UNION ALL SELECT id_c FROM tri
        ) corners
        GROUP BY id
    """,
}

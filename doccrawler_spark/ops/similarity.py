"""Similarity search over ``embeddings(vec_id, embedding ARRAY<FLOAT>,
label)``: brute-force cosine top-k (the exact baseline) and a
sign-bucketed LSH variant (the scale path).

Everything is JVM-native (zip_with/aggregate HOFs) — no Python in the
scoring loop.  At cluster scale the brute-force path is a single
map-side scan + TakeOrderedAndProject (per-partition top-k then merge,
which Catalyst emits for orderBy+limit automatically)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )


def _norm(c):
    return F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0), lambda a, x: a + x,
        )
    )


def cosine_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10,
    fan_out: bool = True,
) -> DataFrame:
    """Exact brute-force cosine top-k against a literal query vector.

    r9: the cosine projection is wrapped in the optimization barrier —
    PushDownPredicates otherwise inlines the whole interpreted-HOF
    cosine into the pushed NULL filter, evaluating it TWICE per row
    (plan-verified: Filter(cond=round(aggregate(...))) below
    Project(round(aggregate(...)))); the barrier pins one evaluation.
    ``fan_out`` additionally spreads a small/single-file corpus across
    cores before the scorer (dedup._fan_out gate: big multi-file
    inputs pass through untouched); callers feeding already-pruned
    candidate sets can disable it."""
    from .dedup import _fan_out, _opt_barrier

    if fan_out:
        embeddings = _fan_out(embeddings, "vec_id")
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = sum(x * x for x in query_vec) ** 0.5
    # try_divide: a zero-norm vector (an empty document's hash
    # embedding — real corpora contain them; ANSI `/` throws) has no
    # cosine to anything and simply never matches
    cos = F.try_divide(_dot(F.col("embedding"), q),
                       F.lit(qn) * _norm(F.col("embedding")))
    return (
        embeddings.withColumn("cosine", _opt_barrier(F.round(cos, 6)))
        .filter(F.col("cosine").isNotNull())
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", "label", "cosine")
    )


def sign_bucket(col, n_bits: int = 8, offset: int = 0):
    """LSH bucket = sign bits of dims [offset, offset+n_bits).

    Deterministic and portable (the DuckDB oracle computes the same
    key); a production variant would use seeded random hyperplanes —
    same plan shape, different projection.  F.get (not getItem): short
    vectors pad with "0" instead of throwing under ANSI."""
    return F.concat_ws(
        "",
        *[
            F.when(F.get(col, offset + i) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(n_bits)
        ],
    )


def lsh_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10,
    n_bits: int = 8, n_tables: int = 4,
) -> DataFrame:
    """Multi-table ANN top-k: table t buckets on the sign bits of dims
    [t·n_bits, (t+1)·n_bits); candidates = vectors matching the query's
    key in ANY table (standard OR-amplified LSH — recall rises with
    n_tables, candidate volume ≈ n_tables·n/2^n_bits), then exact
    cosine + TakeOrderedAndProject.

    Scale path: ONE scan with an OR-of-equalities predicate (codegen'd,
    no explode); with bucket keys as cluster/partition columns the scan
    prunes to n_tables buckets."""
    n_tables = max(1, min(n_tables, len(query_vec) // n_bits))

    def qkey(t: int) -> str:
        return "".join(
            "1" if x >= 0 else "0"
            for x in query_vec[t * n_bits:(t + 1) * n_bits]
        )

    pred = None
    for t in range(n_tables):
        p = sign_bucket(F.col("embedding"), n_bits, t * n_bits) == qkey(t)
        pred = p if pred is None else (pred | p)
    # bucket survivors are design-bounded (~n_tables·n/2^n_bits) — the
    # fan-out exchange costs more than it spreads (measured r9)
    return cosine_topk(embeddings.filter(pred), query_vec, k,
                       fan_out=False)


def _argmax_cell(emb_col, centroids: list[list[float]]):
    """Cell id = index of the max-dot centroid (ties → smallest id).
    Centroids are L2-normalized literals folded into the plan, so the
    assignment is one codegen'd expression per row — no join."""
    scores = F.array(*[
        _dot(emb_col, F.array(*[F.lit(float(x)) for x in c]))
        for c in centroids
    ])
    return (F.array_position(scores, F.array_max(scores)) - 1).cast("int")


def kmeans_centroids(
    embeddings: DataFrame, n_cells: int = 8, sample: int = 1024,
    iters: int = 5,
) -> list[list[float]]:
    """Production IVF quantizer: Lloyd iterations over a DETERMINISTIC
    hash sample (the ``sample`` vectors with lowest md5(vec_id) — a
    uniform draw no matter how vec_ids were assigned), initialized from
    the first ``n_cells`` of that sample.  Runs driver-side on the
    bounded sample (the classic train-on-sample pattern; the full-corpus
    pass is only the final cell ASSIGNMENT, which `ivf_topk` folds into
    one codegen'd expression / a write-time partition column).
    Deterministic: same data → same centroids, so results remain
    reproducible end-to-end.  Returns L2-normalized centroids for
    :func:`ivf_topk`'s ``centroids`` parameter."""
    import math

    rows = (
        embeddings.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(sample).collect()
    )
    pts = [[float(x) for x in r["embedding"]] for r in rows]
    if len(pts) < n_cells:
        raise ValueError(f"sample of {len(pts)} < n_cells={n_cells}")

    def _norm_v(v):
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        return [x / n for x in v]

    cents = [_norm_v(p) for p in pts[:n_cells]]
    for _ in range(iters):
        sums = [[0.0] * len(pts[0]) for _ in range(n_cells)]
        counts = [0] * n_cells
        for p in pts:
            # max-dot-product assignment (ties → smallest cell id),
            # matching _argmax_cell's rule exactly
            best, best_s = 0, None
            for j, c in enumerate(cents):
                s = sum(x * y for x, y in zip(p, c))
                if best_s is None or s > best_s:
                    best, best_s = j, s
            counts[best] += 1
            for d, x in enumerate(p):
                sums[best][d] += x
        cents = [
            _norm_v([x / counts[j] for x in sums[j]]) if counts[j]
            else cents[j]
            for j in range(n_cells)
        ]
    return cents


def hash_sample_centroids(
    embeddings: DataFrame, n_cells: int = 8
) -> list[list[float]]:
    """The oracle-replayable quantizer default: the ``n_cells`` vectors
    with the lowest md5(vec_id), L2-normalized — a deterministic
    uniform draw (md5 scrambles any id assignment order) with no Lloyd
    refinement, so ANSI SQL can replay it exactly."""
    import math

    rows = (
        embeddings.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(n_cells).collect()
    )
    cents = []
    for r in rows:
        v = [float(x) for x in r["embedding"]]
        n = math.sqrt(sum(x * x for x in v)) or 1.0
        cents.append([x / n for x in v])
    return cents


def ivf_topk(
    embeddings: DataFrame, query_vec: list[float], k: int = 10,
    n_cells: int = 8, n_probe: int = 2,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF ANN top-k: a coarse quantizer (HASH-SAMPLED centroids — the
    ``n_cells`` vectors with the lowest md5(vec_id), L2-normalized)
    partitions the corpus into cells; the query scores only the
    ``n_probe`` cells whose centroids it is closest to.  Exact cosine +
    TakeOrderedAndProject inside the probed cells.

    Hash-order sampling is a deterministic uniform sample of the corpus
    (md5 scrambles any vec_id assignment order), so cells are balanced
    in expectation — unlike first-N-by-id, which on real data would
    pick one ingest batch's near-identical vectors and collapse recall.
    Production path at 100 TB: k-means|| on this same hash sample, same
    plan shape.  Scale path: cell assignment is write-time work (the
    cell id is a partition/cluster column), so a query scans
    n_probe/n_cells of the data; centroids are a driver-side sample
    (bounded collect), the classic IVF train-on-sample pattern.

    ``centroids``: pass :func:`kmeans_centroids` output for the
    production trained quantizer; the default
    (:func:`hash_sample_centroids` — raw hash-sampled vectors, no
    Lloyd refinement) stays SQL-oracle-replayable."""
    if centroids is not None:
        cents = [list(map(float, c)) for c in centroids]
    else:
        cents = hash_sample_centroids(embeddings, n_cells)

    qscores = [sum(q * c for q, c in zip(query_vec, cc)) for cc in cents]
    probes = sorted(range(len(cents)), key=lambda j: (-qscores[j], j))[:n_probe]

    # fan out before the (interpreted n_cells-dot) assignment and pin
    # it above the exchange with the barrier — the probe filter would
    # otherwise inline the whole argmax into a predicate pushed into
    # the single-file scan task (r9; same rationale as cosine_topk)
    from .dedup import _fan_out, _opt_barrier

    celled = _fan_out(embeddings, "vec_id").withColumn(
        "cell", _opt_barrier(_argmax_cell(F.col("embedding"), cents))
    )
    return cosine_topk(
        celled.filter(F.col("cell").isin(probes)), query_vec, k,
        fan_out=False,
    )


# --------------------------------------------------------------------
# Write-time ANN index layouts (r4).
#
# lsh_topk / ivf_topk above compute bucket/cell membership per row per
# query — correct, but at 100 TB one query = one full corpus scan.
# The scale-safe half of the ANN story is STORAGE LAYOUT: assign the
# bucket/cell at WRITE time and make it a partition column, so a query
# is a partition-pruned scan of n_probe cells (IVF) or n_tables band
# buckets (LSH) — the same move the crawl's seen-set made with its
# bucketed table, and what an index-side vector store does (reference
# analogue: Pinecone index search, pinecone_service.py:131-178).
# BENCH/PLANS.md asserts PartitionFilters reach the FileScan and the
# scan reads strictly fewer files than the table holds.


def _index_meta_path(path: str) -> str:
    import os

    return os.path.join(path, "_index_meta.json")


def _write_index_meta(path: str, meta: dict) -> None:
    import json
    import os

    final = _index_meta_path(path)
    tmp = final + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(meta, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, final)


# ---- versioned layout protocol (r6) --------------------------------
#
# An index root holds immutable version directories ``vNNNNNN/`` (each
# a complete Hive-partitioned layout + its ``_index_meta.json``) and a
# ``_current`` pointer file naming the committed one.  Publication is
# ONE atomic single-file replace — the same shape as the snapshot
# manifest protocol (snapshots.py) and, unlike a directory rename, a
# primitive object stores actually have (a single-key PUT).  At no
# point does the live path stop resolving: a crash mid-build strands
# only an uncommitted vNNNNNN dir (vacuumed by the next successful
# commit), and a reader that resolved the previous pointer keeps a
# complete layout because vacuum always spares the prior version.
# Roots written by pre-r6 code (flat layout, meta at the root) still
# resolve via the legacy fallback.

_VERSION_RE = r"v\d{6}"


def _resolve_index_dir(path: str) -> str:
    """The committed layout directory for an index root: the
    ``_current``-pointed version dir, else the root itself for a
    legacy flat layout, else FileNotFoundError.

    The pointed dir must contain its ``_index_meta.json`` — a pointer
    whose target was lost (e.g. a racing publisher's vacuum under a
    pre-r7 protocol) raises FileNotFoundError instead of returning a
    dangling path, so ``index_exists`` goes False and the cache-layer
    heal (:func:`_ensure_index`) rebuilds rather than failing reads
    forever."""
    import os

    ptr = os.path.join(path, "_current")
    if os.path.exists(ptr):
        with open(ptr) as f:
            vdir = os.path.join(path, f.read().strip())
        if os.path.exists(_index_meta_path(vdir)):
            return vdir
        raise FileNotFoundError(
            f"index pointer at {path} names an incomplete layout")
    if os.path.exists(_index_meta_path(path)):
        return path
    raise FileNotFoundError(f"no committed index layout at {path}")


def index_exists(path: str) -> bool:
    try:
        _resolve_index_dir(path)
        return True
    except (FileNotFoundError, OSError):
        return False


def _new_version_dir(path: str) -> tuple[str, str]:
    """Claim the next ``vNNNNNN`` build directory under the root
    (mkdir is the claim — a concurrent builder colliding on the same
    number just bumps past it)."""
    import os
    import re

    os.makedirs(path, exist_ok=True)
    taken = [int(d[1:]) for d in os.listdir(path)
             if re.fullmatch(_VERSION_RE, d)]
    n = max(taken, default=0) + 1
    while True:
        vname = f"v{n:06d}"
        try:
            os.makedirs(os.path.join(path, vname), exist_ok=False)
            return os.path.join(path, vname), vname
        except FileExistsError:
            n += 1


def _commit_index_version(path: str, vname: str) -> None:
    import os

    ptr = os.path.join(path, "_current")
    tmp = ptr + f".tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        f.write(vname)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, ptr)


def _vacuum_index(path: str, keep: set[str],
                  spare_flat: bool = False) -> None:
    """Drop version dirs outside ``keep`` plus any legacy flat-layout
    artifacts at the root (a pointer now owns resolution, so the flat
    files are dead weight).  ``keep`` is re-widened with whatever
    ``_current`` names AT VACUUM TIME — with two concurrent publishers
    the loser's stale keep-set must never delete the version the
    winner just committed (that would leave the live pointer
    dangling).  ``spare_flat`` leaves the flat files in place for one
    generation — set on the first versioned publish over a legacy
    root, where the flat layout IS the previous version a concurrent
    reader may still be scanning; the next publish vacuums them."""
    import os
    import re
    import shutil

    keep = set(keep)
    try:
        with open(os.path.join(path, "_current")) as f:
            keep.add(f.read().strip())
    except OSError:
        pass
    for d in os.listdir(path):
        p = os.path.join(path, d)
        if re.fullmatch(_VERSION_RE, d):
            if d not in keep:
                shutil.rmtree(p, ignore_errors=True)
        elif spare_flat:
            continue
        elif os.path.isdir(p) and "=" in d:  # legacy flat partition dir
            shutil.rmtree(p, ignore_errors=True)
    if not spare_flat:
        for f in ("_index_meta.json", "_SUCCESS"):
            try:
                os.remove(os.path.join(path, f))
            except OSError:
                pass


def _publish_index_version(path: str, vname: str) -> None:
    """Commit ``vname`` as the live layout, then vacuum everything but
    it and the previously-committed version (still potentially mid-scan
    in a concurrent reader).  A legacy flat root gets the same grace:
    its flat partition dirs are the previous version, so the first
    versioned publish leaves them untouched for one generation."""
    import os

    try:
        resolved = _resolve_index_dir(path)
    except (FileNotFoundError, OSError):
        resolved = None
    legacy_prev = (resolved is not None
                   and os.path.abspath(resolved) == os.path.abspath(path))
    _commit_index_version(path, vname)
    keep = {vname}
    if resolved is not None and not legacy_prev:
        keep.add(os.path.basename(resolved))
    _vacuum_index(path, keep, spare_flat=legacy_prev)


def _read_index_meta(path: str) -> dict:
    import json

    with open(_index_meta_path(_resolve_index_dir(path))) as f:
        return json.load(f)


def write_ivf_index(
    embeddings: DataFrame, path: str, n_cells: int = 8,
    centroids: list[list[float]] | None = None, sample: int = 1024,
) -> None:
    """Lay the vectors table out as an IVF index: one Hive partition
    directory per quantizer cell (``cell=<id>/part-*.parquet``), with
    the trained centroids stored alongside in a committed meta file.
    Cell assignment runs ONCE, at write time, as the same codegen'd
    max-dot expression queries would otherwise evaluate per scan.

    ``centroids=None`` trains :func:`kmeans_centroids` on the hash
    sample (the production quantizer); pass explicit centroids (e.g.
    the raw hash-sample used by the oracle-replayable ``ivf_topk``
    default) to pin a layout to a known quantizer."""
    if centroids is None:
        centroids = kmeans_centroids(embeddings, n_cells=n_cells,
                                     sample=sample)
    cents = [list(map(float, c)) for c in centroids]
    celled = embeddings.withColumn(
        "cell", _argmax_cell(F.col("embedding"), cents)
    )
    # repartition on the partition column: every cell directory gets
    # files from ONE task instead of one file per (task × cell) — at
    # small scale that's the difference between n_cells files and a
    # small-file explosion; at 100 TB it's the writer-sizing knob
    vdir, vname = _new_version_dir(path)
    (
        celled.repartition("cell")
        .write.mode("overwrite").partitionBy("cell").parquet(vdir)
    )
    _write_index_meta(vdir, {"kind": "ivf", "centroids": cents})
    _publish_index_version(path, vname)


def _read_partitions(spark, path: str, subdirs: list[str]):
    """Read ONLY the named Hive partition directories of a layout,
    with ``basePath`` so the partition columns survive.  Listing cost
    is ∝ probed directories — the full layout is never enumerated
    (r4b: `spark.read.parquet(path).filter(partition_col...)` prunes
    the SCAN but still LISTS every partition dir to build the file
    index, which at 1030 LSH buckets cost ~1.5 s per query; at 10^9
    objects on S3 it would be the whole query).  Missing directories
    (empty buckets) are skipped driver-side — the same existence
    check an object-store deployment does with one LIST per probed
    prefix.  ``path`` is the index ROOT — the committed version dir is
    resolved here (one pointer read), so callers stay version-blind."""
    import os

    base = _resolve_index_dir(path)
    existing = [
        os.path.join(base, d) for d in subdirs
        if os.path.isdir(os.path.join(base, d))
    ]
    if not existing:
        return None
    return spark.read.option("basePath", base).parquet(*existing)


def _read_index_empty(spark, path: str) -> DataFrame:
    """A zero-row frame with the committed layout's full schema
    (partition columns included) — the no-probed-bucket fallback."""
    base = _resolve_index_dir(path)
    return spark.read.option("basePath", base).parquet(base).limit(0)


def ivf_topk_indexed(
    spark, path: str, query_vec: list[float], k: int = 10, n_probe: int = 2,
) -> DataFrame:
    """IVF top-k over a :func:`write_ivf_index` layout: score the query
    against the stored centroids driver-side, then scan ONLY the
    ``n_probe`` closest cells — the probed ``cell=<id>`` directories
    are addressed directly (no full partition discovery, no data files
    outside them opened).  Identical results to :func:`ivf_topk` with
    the same centroids."""
    meta = _read_index_meta(path)
    cents = meta["centroids"]
    qscores = [sum(q * c for q, c in zip(query_vec, cc)) for cc in cents]
    probes = sorted(range(len(cents)),
                    key=lambda j: (-qscores[j], j))[:n_probe]
    df = _read_partitions(spark, path, [f"cell={j}" for j in probes])
    if df is None:  # probed cells all empty
        return cosine_topk(_read_index_empty(spark, path).drop("cell"),
                           query_vec, k, fan_out=False)
    # belt-and-braces semantic filter (also what PLANS.md asserts as
    # PartitionFilters — the path selection already did the pruning)
    df = df.filter(F.col("cell").isin(probes))
    # pruned probe-cell read: keep its (already multi-file) scan
    # layout — the fan-out exchange would only add a shuffle
    return cosine_topk(df.drop("cell"), query_vec, k, fan_out=False)


def write_lsh_index(
    embeddings: DataFrame, path: str, n_bits: int = 8, n_tables: int = 4,
) -> None:
    """Lay the vectors table out as a multi-table sign-LSH index: each
    vector is written once PER TABLE under Hive partitions
    ``band=<t>/key=<sign pattern>/`` (the classic n_tables× storage
    trade of multi-table LSH — OR-amplified recall for bounded extra
    space).  Bucket keys are computed once, at write time."""
    banded = embeddings.select(
        *embeddings.columns,
        F.explode(F.array(*[
            F.struct(
                F.lit(t).alias("band"),
                # "k" prefix pins the partition value as a STRING —
                # Hive partition type inference would otherwise parse
                # an all-digit sign pattern as an integer and drop the
                # leading zeros that distinguish buckets
                F.concat(
                    F.lit("k"),
                    sign_bucket(F.col("embedding"), n_bits, t * n_bits),
                ).alias("key"),
            )
            for t in range(n_tables)
        ])).alias("bk"),
    ).select(*embeddings.columns, "bk.band", "bk.key")
    # one writing task per (band, key): without this every input task
    # writes a sliver into every bucket dir it touches — measured 15 s
    # of small-file churn for a 2^8-bucket 4-table layout at sf0.1
    vdir, vname = _new_version_dir(path)
    (
        banded.repartition("band", "key")
        .write.mode("overwrite").partitionBy("band", "key").parquet(vdir)
    )
    _write_index_meta(vdir, {"kind": "lsh", "n_bits": n_bits,
                             "n_tables": n_tables})
    _publish_index_version(path, vname)


def lsh_topk_indexed(
    spark, path: str, query_vec: list[float], k: int = 10,
) -> DataFrame:
    """Multi-table LSH top-k over a :func:`write_lsh_index` layout: the
    query's per-table keys address ≤ n_tables ``band=<t>/key=<pat>``
    bucket directories directly out of n_tables·2^n_bits (no full
    partition discovery — see :func:`_read_partitions`); candidates
    dedup on vec_id (a vector can collide in several tables) before
    exact cosine + TakeOrdered.  Identical results to
    :func:`lsh_topk` at the same parameters."""
    meta = _read_index_meta(path)
    n_bits, n_tables = meta["n_bits"], meta["n_tables"]
    n_eff = max(1, min(n_tables, len(query_vec) // n_bits))

    def qkey(t: int) -> str:
        return "k" + "".join(
            "1" if x >= 0 else "0"
            for x in query_vec[t * n_bits:(t + 1) * n_bits]
        )

    df = _read_partitions(
        spark, path, [f"band={t}/key={qkey(t)}" for t in range(n_eff)]
    )
    if df is None:  # no bucket holds any vector for this query
        emp = _read_index_empty(spark, path)
        return cosine_topk(
            emp.drop("band", "key").dropDuplicates(["vec_id"]), query_vec, k,
            fan_out=False,
        )
    pred = None
    for t in range(n_eff):
        p = (F.col("band") == t) & (F.col("key") == qkey(t))
        pred = p if pred is None else (pred | p)
    cand = df.filter(pred).drop("band", "key").dropDuplicates(["vec_id"])
    # pruned bucket read + dedup shuffle: already spread; no fan-out
    return cosine_topk(cand, query_vec, k, fan_out=False)


def compact_index(spark, path: str, target_bytes: int = 128 << 20) -> dict:
    """Compact an ANN index layout's data files: rewrite each partition
    directory's contents into ~``target_bytes`` files (one writing task
    per directory, ``maxRecordsPerFile`` splitting only genuinely large
    buckets).  Write-time layouts trade query pruning for file count —
    `write_lsh_index` makes ~n_tables·2^n_bits directories, and at
    100× corpus scale repeated appends/rebuilds would strand thousands
    of KB-sized files whose open/list overhead dominates the pruned
    scan (the classic small-file problem; object stores bill per
    request).  Operational target: files within a bucket dir at
    100-500 MB — compact after bulk builds, not per query.

    Crash-safe and reader-safe via the versioned-layout protocol: the
    compacted copy is written as a NEW version dir under the root and
    published with the single atomic ``_current`` pointer replace —
    the root never stops resolving, a concurrent reader holding the
    old version keeps a complete layout (vacuum spares the previous
    version — including a pre-versioning flat layout, whose files stay
    in place at the root for one generation), and a crash at any point
    strands at most one uncommitted build dir that the next commit
    vacuums.  The meta rides along
    unchanged — same quantizer/params, same results.  Returns
    {files_before, files_after, bytes}."""
    import os

    base = _resolve_index_dir(path)
    meta = _read_index_meta(path)
    pcols = ["cell"] if meta["kind"] == "ivf" else ["band", "key"]

    def _stats(p: str) -> tuple[int, int]:
        n, size = 0, 0
        for root, _dirs, names in os.walk(p):
            for f in names:
                if f.endswith(".parquet"):
                    n += 1
                    size += os.path.getsize(os.path.join(root, f))
        return n, size

    files_before, total_bytes = _stats(base)
    # read (and list) the live layout BEFORE claiming the build dir —
    # for a legacy flat root base == path and a later listing would
    # trip over the new vNNNNNN subdir
    df = spark.read.option("basePath", base).parquet(base)
    total_rows = df.count()
    avg_row = max(1, total_bytes // max(1, total_rows))
    rpf = max(1, target_bytes // avg_row)
    vdir, vname = _new_version_dir(path)
    (
        df.repartition(*pcols)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", rpf)
        .partitionBy(*pcols).parquet(vdir)
    )
    _write_index_meta(vdir, meta)
    _publish_index_version(path, vname)
    files_after, _ = _stats(vdir)
    return {"files_before": files_before, "files_after": files_after,
            "bytes": total_bytes}


def knn_join(
    embeddings: DataFrame, queries: DataFrame, k: int = 5, n_bits: int = 4,
    n_tables: int = 4, salt: int = 16, salted: bool | None = None,
    score: str = "arrow",
) -> DataFrame:
    """Bulk ANN: for every query vector, its top-k neighbors from the
    corpus.  queries: (q_id, q_emb ARRAY<FLOAT>).

    Scale shape (r3, replacing the single-table 2^n_bits-global-bucket
    design): multi-table banded sign-LSH — band t keys on the sign
    pattern of dims [t·n_bits, (t+1)·n_bits), so recall OR-amplifies
    across ``n_tables`` like :func:`lsh_topk`, and bucket population is
    governed by n_bits per band (size n_bits so 2^n_bits ≫ corpus/
    target-candidates; with band keys as write-time cluster columns
    the join prunes to matching buckets).

    No unbounded window anywhere: a salted per-(query, band) pre-top-k
    caps every first-window partition at ~bucket/salt rows (same
    two-phase trick as shuffle.topk_per_group), the per-(query, band)
    merge sees ≤ salt·k rows, and the final per-query window sees
    ≤ n_tables·k deduped candidates.  The pre-top-k is lossless: a
    global-top-k candidate outranked by < k vectors globally is
    outranked by < k inside any band bucket containing it.

    ``salted`` gates the pre-top-k PLAN-SIDE (r4, same stats gate
    family as dedup._fan_out): the two extra windows exist to bound
    per-task sort memory when a band bucket holds millions of rows,
    but at small input they cost two full window passes for nothing
    (r3 measured 2× at sf0.1).  Default (None) reads the corpus's
    optimizer-estimated size: below one shuffle-partition's worth of
    data (64 MB) every window partition is trivially task-sized, so
    the join output feeds the final per-query window directly —
    identical results (the pre-top-k is lossless by construction).
    Unknown stats (Catalyst's Long.Max sentinel) keep the salted
    scale shape — the conservative default for 100 TB inputs.
    """
    if salted is None:
        salted = _plan_size_bytes(embeddings) >= (64 << 20)

    c = _banded(embeddings, "embedding", n_bits, n_tables)
    q = _banded(queries, "q_emb", n_bits, n_tables)
    if score == "arrow":
        return _knn_rank_arrow(q, c, k=k, salt=salt, salted=salted)
    joined = q.join(c, ["band", "key"])
    return _knn_rank(joined, k=k, salt=salt, salted=salted)


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's optimizer size estimate for a plan (Long.Max sentinel
    → very large, keeping callers on their conservative branch)."""
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return 1 << 60


def _banded(df: DataFrame, vec_col: str, n_bits: int, n_tables: int,
            key_prefix: str = "") -> DataFrame:
    """Explode one row per LSH table: band t keys on the sign pattern
    of dims [t·n_bits, (t+1)·n_bits).  ``key_prefix`` matches the
    write-time layout's partition-value pinning (see
    :func:`write_lsh_index` — the "k" prefix)."""
    return df.select(
        *df.columns,
        F.explode(F.array(*[
            F.struct(
                F.lit(t).alias("band"),
                F.concat(
                    F.lit(key_prefix),
                    sign_bucket(F.col(vec_col), n_bits, t * n_bits),
                ).alias("key"),
            )
            for t in range(n_tables)
        ])).alias("bk"),
    ).select(*df.columns, "bk.band", "bk.key")


def _make_bucket_scorer(k: int):
    """Per-bucket scorer for :func:`_knn_rank_arrow`: queries × bucket
    candidates as one float64 GEMM (numpy, Arrow-batched), per-query
    top-k WITHIN the bucket before anything leaves the Python worker.
    The within-bucket top-k is lossless for the global top-k by the
    same argument as the salted pre-top-k windows (see
    :func:`knn_join`); rounding to 6 decimals BEFORE selection keeps
    the selection order identical to the expr path's
    ``F.round(cos, 6)``."""

    def score(qpdf, cpdf):
        import numpy as np
        import pandas as pd

        if len(qpdf) == 0 or len(cpdf) == 0:
            return pd.DataFrame({
                "q_id": qpdf["q_id"][:0], "vec_id": cpdf["vec_id"][:0],
                "cosine": pd.Series([], dtype="float64"),
            })
        qid_all = qpdf["q_id"].to_numpy()
        vid_all = cpdf["vec_id"].to_numpy()
        out = []
        # BOTH axes are chunked: a hot bucket can be hit by an
        # unbounded number of bulk queries just as it can hold an
        # unbounded number of candidates, and the GEMM output is
        # |Q|×|C| float64 — chunking only candidates would let a
        # 100k-query batch allocate |Q|×65536×8 ≈ 50 GB in one array.
        # 2048×16384 bounds each GEMM output to 256 MB while keeping
        # the BLAS kernel long enough to amortize dispatch.
        Q_CH, C_CH = 2048, 16384
        # Each side's list-cell → float64-matrix conversion runs ONCE
        # (r9, guide §4.2): the query-side chunks are converted up
        # front and cached (bounded by the bulk batch: |Q|×dim float64,
        # ~50 MB at 100k×64), then candidate chunks convert once each
        # in the outer loop — the r8 nesting rebuilt the candidate
        # matrix + norms inside the query loop, so a hot bucket hit by
        # 100k bulk queries (49 q-chunks) paid the per-row conversion
        # 49×.
        a_chunks = []
        for qs_ in range(0, len(qpdf), Q_CH):
            A = np.asarray([np.asarray(v, dtype=np.float64)
                            for v in qpdf["q_emb"].iloc[qs_:qs_ + Q_CH]])
            a_chunks.append((A, np.sqrt((A * A).sum(axis=1)),
                             qid_all[qs_:qs_ + Q_CH]))
        for s in range(0, len(cpdf), C_CH):
            B = np.asarray([np.asarray(v, dtype=np.float64)
                            for v in cpdf["embedding"].iloc[s:s + C_CH]])
            vid = vid_all[s:s + C_CH]
            bn = np.sqrt((B * B).sum(axis=1))
            for A, qn, qid in a_chunks:
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos6 = np.round((A @ B.T) / np.outer(qn, bn), 6)
                for i in range(len(qid)):
                    row = cos6[i]
                    idx = np.nonzero(np.isfinite(row))[0]  # zero-norm → drop
                    if idx.size == 0:
                        continue
                    sel = idx[np.lexsort((vid[idx], -row[idx]))[:k]]
                    out.append(pd.DataFrame({
                        "q_id": np.full(sel.size, qid[i]),
                        "vec_id": vid[sel], "cosine": row[sel],
                    }))
        if not out:
            return pd.DataFrame({
                "q_id": qpdf["q_id"][:0], "vec_id": cpdf["vec_id"][:0],
                "cosine": pd.Series([], dtype="float64"),
            })
        # per-chunk top-k → final within-bucket top-k across chunks
        # (lossless: a candidate beaten by ≥k inside its chunk is
        # beaten by ≥k in the bucket)
        res = pd.concat(out, ignore_index=True)
        res = res.sort_values(["q_id", "cosine", "vec_id"],
                              ascending=[True, False, True])
        return res.groupby("q_id", sort=False).head(k)

    return score


def _knn_rank_arrow(q: DataFrame, c: DataFrame, k: int, salt: int,
                    salted: bool) -> DataFrame:
    """Arrow-GEMM variant of :func:`_knn_rank` (r8, the default): the
    expr path evaluates the cosine through Catalyst's INTERPRETED
    higher-order-function path — ~2 µs per array element, i.e. hours
    for the ~10^8 query×candidate pairs a bulk batch produces when the
    corpus's embedding space is clustered and LSH buckets run hot
    (measured: two executor threads burned 40+ CPU-minutes inside
    ``ArrayTransform.nullSafeEval`` on a 300k-doc crawl corpus).  Here
    each (band,key[,_salt]) bucket is scored as ONE numpy float64
    GEMM via cogrouped ``applyInPandas``, with per-query top-k applied
    inside the bucket, so (a) the per-element interpreter dispatch
    becomes a BLAS inner loop and (b) only ≤ |Q|·k rows per bucket
    ever leave the Python worker — the Arrow transfer is matrices in,
    top-k out, never per-pair rows.  Results are identical to the expr
    path: both round to 6 decimals before any selection (float64 GEMM
    vs sequential-fold LSB drift cannot survive the rounding except
    within ~1e-16 of a decimal boundary), and the within-bucket
    pre-top-k is lossless by :func:`knn_join`'s argument.  ``salted``
    sub-splits hot buckets by ``pmod(xxhash64(vec_id), salt)`` exactly
    like the expr path's salted windows — queries replicate across the
    salt range (a |Q|×salt explode, query side only) so every
    sub-bucket still sees every probing query."""
    from pyspark.sql import functions as F

    q_t = dict(q.dtypes)["q_id"]
    v_t = dict(c.dtypes)["vec_id"]
    keys = ["band", "key"]
    if salted:
        keys.append("_salt")
        c = c.withColumn("_salt", F.pmod(F.xxhash64("vec_id"),
                                         F.lit(salt)))
        q = q.withColumn(
            "_salt",
            F.explode(F.sequence(F.lit(0).cast("long"),
                                 F.lit(salt - 1).cast("long"))))
    qs = q.select("q_id", "q_emb", *keys)
    cs = c.select("vec_id", "embedding", *keys)
    scored = (qs.groupBy(*keys).cogroup(cs.groupBy(*keys))
              .applyInPandas(_make_bucket_scorer(k),
                             f"q_id {q_t}, vec_id {v_t}, cosine double"))
    from pyspark.sql import Window

    order = [F.desc("cosine"), F.asc("vec_id")]
    w_q = Window.partitionBy("q_id").orderBy(*order)
    return (scored.dropDuplicates(["q_id", "vec_id"])
            .withColumn("rank", F.row_number().over(w_q))
            .filter(F.col("rank") <= k)
            .select("q_id", "vec_id", "rank", "cosine"))


def _knn_rank(joined: DataFrame, k: int, salt: int, salted: bool) -> DataFrame:
    """The shared knn tail: cosine-score a (band,key)-joined
    query×candidate relation, optionally bound per-task sort memory
    with the lossless salted per-(query, band) pre-top-k, dedup
    multi-band collisions, and emit the per-query top-k.  See
    :func:`knn_join` for the losslessness argument."""
    from pyspark.sql import Window

    # try_divide + NULL-drop: zero-norm vectors (empty documents'
    # hash embeddings) have no cosine and never match — ANSI `/`
    # would instead kill the whole job on the first empty page
    cos = F.try_divide(
        _dot(F.col("embedding"), F.col("q_emb")),
        _norm(F.col("embedding")) * _norm(F.col("q_emb")),
    )
    joined = (joined.withColumn("cosine", F.round(cos, 6))
              .filter(F.col("cosine").isNotNull()))
    order = [F.desc("cosine"), F.asc("vec_id")]
    w_q = Window.partitionBy("q_id").orderBy(*order)
    if salted:
        w_sub = Window.partitionBy("q_id", "band", "_salt").orderBy(*order)
        w_band = Window.partitionBy("q_id", "band").orderBy(*order)
        joined = (
            joined
            .withColumn("_salt", F.pmod(F.xxhash64("vec_id"), F.lit(salt)))
            .withColumn("_srn", F.row_number().over(w_sub))
            .filter(F.col("_srn") <= k)
            .withColumn("_brn", F.row_number().over(w_band))
            .filter(F.col("_brn") <= k)
        )
    return (
        joined
        .select("q_id", "vec_id", "cosine")
        .dropDuplicates(["q_id", "vec_id"])
        .withColumn("rank", F.row_number().over(w_q))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "rank", "cosine")
    )


def knn_join_indexed(
    spark, path: str, queries: DataFrame, k: int = 5, salt: int = 16,
    salted: bool | None = None, score: str = "arrow",
) -> DataFrame:
    """Bulk ANN over a :func:`write_lsh_index` layout — the index-side
    search a 100-TB dedup pipeline actually runs (reference analogue:
    index-side query, pinecone_service.py:131-178).  Identical results
    to :func:`knn_join` at the layout's (n_bits, n_tables): the layout
    stores each vector once per band under ``band=<t>/key=<pat>/``, so
    joining banded queries against it IS the inline banding — but the
    corpus side is a partition-PRUNED scan of only the bucket
    directories some query actually probes, instead of re-banding the
    full corpus per batch (knn_join's remaining r4 weakness).

    The probed directory set is collected driver-side from the banded
    queries — bounded by the KEYSPACE, min(n_tables·2^n_bits,
    n_tables·|Q|) rows of two small columns, a design parameter (64 for
    the 4×4-bit default), not a data-scale quantity.  Directories are
    then addressed directly (see :func:`_read_partitions` — no full
    layout listing).  ``salted`` defaults from the PRUNED scan's
    file-size stats, so small probe sets skip the pre-top-k windows
    automatically while big buckets keep the bounded-memory shape."""
    meta = _read_index_meta(path)
    n_bits, n_tables = meta["n_bits"], meta["n_tables"]

    q = _banded(queries, "q_emb", n_bits, n_tables, key_prefix="k")
    # consumed twice (probe-dir collect + the join); the banded batch is
    # small — materialize once instead of re-deriving per consumer
    q = q.localCheckpoint(eager=True)
    keys = q.select("band", "key").distinct().collect()
    dirs = [f"band={r['band']}/key={r['key']}" for r in keys]
    keyspace = n_tables * (1 << n_bits)
    if len(dirs) >= 64 and len(dirs) * 4 >= keyspace:
        # a BULK batch probes most of the keyspace: |dirs| separate
        # per-directory listings cost more than one recursive root
        # listing (measured 28.6 s vs ~1.5 s at 1024 dirs), and with
        # near-full coverage pruning saves nothing — the index's win
        # here is the PRECOMPUTED banding, not the scan cut.  The
        # (band,key) join still discards any unprobed buckets.
        base = _resolve_index_dir(path)
        c = spark.read.option("basePath", base).parquet(base)
    else:
        c = _read_partitions(spark, path, dirs)
    if c is None:  # no probed bucket exists — no candidates at all
        emp = _read_index_empty(spark, path)
        if score == "arrow":
            return _knn_rank_arrow(q, emp, k=k, salt=salt, salted=False)
        joined = q.join(emp, ["band", "key"])
        return _knn_rank(joined, k=k, salt=salt, salted=False)
    if salted is None:
        salted = _plan_size_bytes(c) >= (64 << 20)
    if score == "arrow":
        return _knn_rank_arrow(q, c, k=k, salt=salt, salted=salted)
    joined = q.join(c, ["band", "key"])
    return _knn_rank(joined, k=k, salt=salt, salted=salted)

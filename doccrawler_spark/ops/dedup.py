"""Deduplication operators over ``documents``: exact, n-gram Jaccard,
MinHash+LSH, SimHash, embedding-cosine near-dup.

Scale notes (these run over 100 TB of text on a real cluster):
  * exact dedup is one hash-groupBy — map-side partial agg, one shuffle
    on the 128-bit fingerprint (never on the text itself);
  * pairwise similarity is NEVER all-pairs: n-gram Jaccard blocks on
    shared shingles (posting-list self-join), MinHash blocks on LSH
    band buckets — candidate pairs ∝ true-duplicate density;
  * every kernel uses portable primitives (md5, split, explode) so the
    DuckDB oracle can replay identical logic in ANSI-ish SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import tokens_col


def _norm_text(col="text"):
    return F.trim(F.lower(F.regexp_replace(col, "[^a-zA-Z0-9]+", " ")))


def exact_dedup(documents: DataFrame) -> DataFrame:
    """Groups of byte-identical (normalized) docs: keeper + group size."""
    return (
        documents.select("doc_id", F.md5(_norm_text()).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= 1)
    )


def _fan_out(df: DataFrame, *cols: str) -> DataFrame:
    """Spread a (possibly single-file, single-row-group) scan across the
    cluster before CPU-heavy per-row work.  Small driver-shipped tables
    arrive as ONE partition; without this every downstream HOF/explode/
    self-join runs in one task regardless of cores.

    Gated PLAN-SIDE (optimizer statistics + input file count — no
    ``df.rdd`` partition probe, which forces an RDD plan conversion and
    an extra analysis pass): an input big enough to split into ≥ cores
    read partitions anyway, or scanning ≥ cores files, passes through
    untouched — no gratuitous full shuffle of 100 TB."""
    spark = df.sparkSession
    n = spark.sparkContext.defaultParallelism
    try:
        size = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # stats unavailable → assume small, spread it
        size = 0
    # parquet splits inputs at spark.sql.files.maxPartitionBytes
    # (default 128 MB); a >= n*that input already fans out on read.
    # Absurd sizes are Catalyst's Long.Max "unknown" sentinel — treat
    # as small (a wasted repartition of a small table beats one task).
    if n * (128 << 20) <= size < (1 << 50):
        return df
    try:
        if len(df.inputFiles()) >= n:
            return df
    except Exception:
        pass
    return df.repartition(n, *cols) if cols else df.repartition(n)


# 2^31-1, prime — the classic Mersenne modulus for affine hash families
_MERSENNE = (1 << 31) - 1
_HASH_C = 2654435761  # Knuth multiplicative constant spaces the offsets


def _pos_consts(n: int) -> list[int]:
    """Per-position odd multipliers < 2^31 for the shingle-key combine
    (odd ⇒ invertible mod 2^64, so positions never cancel)."""
    return [((_HASH_C * (2 * j + 1)) % (1 << 31)) | 1 for j in range(n)]


def _opt_barrier(col):
    """Catalyst optimization barrier: a nondeterministic no-op
    (``monotonically_increasing_id() >= -1`` is always true, value
    unchanged).

    Why: PushDownPredicates substitutes project aliases into predicates
    with NO cost check, and InferFiltersFromGenerate synthesizes
    ``size(g) > 0 AND g IS NOT NULL`` under every explode.  Pushed
    through the shingle-key projects, those predicates inline the
    token-hash array into the PER-ELEMENT combine lambda, which
    interpreted HOF eval then re-computes per shingle — O(tokens²)
    digests per doc (measured: a 12k-doc job that runs in seconds hung
    for 15+ minutes).  Predicates cannot cross a nondeterministic
    projection, so wrapping the array output pins every downstream
    reference to the materialized attribute.  (CollapseProject is
    already safe by itself — SPARK-36718 stops it duplicating
    non-cheap multi-referenced expressions.  ``rand() >= -1`` does NOT
    work here: the optimizer constant-folds it away; a
    monotonically_increasing_id comparison survives.)"""
    return F.when(F.monotonically_increasing_id() >= F.lit(-1), col)


def _shingle_key_arrays(
    documents: DataFrame, n: int = 3, key_fn: str = "md5"
) -> DataFrame:
    """(doc_id, skey BIGINT) — word-n-gram shingle keys computed WITHOUT
    ever materializing a shingle string.

    r2 measured the md5-per-shingle path allocation-bound (stage scaling
    0.25 at 8→32 cores: 3 string allocations per shingle row).  Now each
    TOKEN hashes once to a 31-bit base b (one short-string digest), and
    shingle i's key is pure integer arithmetic over the base
    array:  skey_i = XOR_j (b[i+j] · C_j)  with per-position odd
    constants C_j < 2^31 — products < 2^62, ANSI-overflow-safe, ~62-bit
    keys, zero per-shingle allocations.  Keys are 8 bytes on the wire
    (vs ~90-byte 3-gram strings), collisions ~2^-62 per pair, and the
    DuckDB oracle replays the identical integer math, so results stay
    bit-equal either way.

    ``key_fn``: 'md5' (default) keeps the token base oracle-replayable;
    'xxhash64' (bench/scale path) computes the base as a native 64-bit
    digest with NO string allocation at all — same downstream math, not
    SQL-oracle-replayable (DuckDB lacks xxhash64)."""
    toked = _fan_out(documents, "doc_id").select(
        "doc_id", tokens_col("text").alias("toks")
    )
    if key_fn == "xxhash64":
        tkey = lambda t: F.pmod(F.xxhash64(t), F.lit(_MERSENNE))
    elif key_fn == "md5":
        tkey = lambda t: (
            F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long")
            % F.lit(_MERSENNE)
        )
    else:
        raise ValueError(f"unknown shingle key_fn {key_fn!r}")
    # base array materialized as its OWN column first: referencing an
    # unaliased transform(...) inside the next lambda would re-run it
    # once per sequence element (no CSE across lambda scopes)
    based = toked.select("doc_id", F.transform("toks", tkey).alias("bk"))
    consts = _pos_consts(n)

    def _skey(i):
        k = F.get(F.col("bk"), i) * F.lit(consts[0])
        for j in range(1, n):
            k = k.bitwiseXOR(F.get(F.col("bk"), i + j) * F.lit(consts[j]))
        return k

    # Guard short docs: sequence(0, size-n) DESCENDS when size < n.  A
    # doc with fewer than n tokens has zero shingles (oracle: empty
    # range).  Distinct per doc on the KEY array (the oracle dedups the
    # same keys, so collision behavior matches bit-for-bit).
    sk = F.when(
        F.size("bk") >= n,
        F.array_distinct(
            F.transform(F.sequence(F.lit(0), F.size("bk") - F.lit(n)), _skey)
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return based.select("doc_id", _opt_barrier(sk).alias("sk"))


def _shingle_keys(
    documents: DataFrame, n: int = 3, key_fn: str = "md5"
) -> DataFrame:
    """(doc_id, skey BIGINT) — the exploded posting-list form of
    :func:`_shingle_key_arrays` (self-joins want rows; minhash wants
    the array form to avoid the explode+shuffle entirely)."""
    return _shingle_key_arrays(documents, n, key_fn).select(
        "doc_id", F.explode("sk").alias("skey")
    )


def _materialize(df: DataFrame) -> DataFrame:
    """Compute a multiply-consumed intermediate ONCE (eager
    localCheckpoint).  The posting-list / banded-signature relations
    feed 3-4 plan branches (sizes, df-prune, both self-join sides) and
    each branch would otherwise re-derive the full tokenize+hash
    lineage from the scan.  The materialized relation is the SMALL one
    (8-byte keys / integer signatures, ~2-5% of corpus bytes), stored
    on executor-local disk+memory — the standard trade at 100 TB."""
    return df.localCheckpoint(eager=True)


def ngram_jaccard_pairs(
    documents: DataFrame, n: int = 3, threshold: float = 0.6,
    max_df: int | None = 2_000, key_fn: str = "md5",
    pair_budget: int | None = 1_000_000_000,
) -> DataFrame:
    """Near-dup pairs with word-n-gram Jaccard ≥ threshold.

    Blocked self-join on shared shingles (a pair is only scored if it
    shares ≥1 shingle), |A∩B| from the join, |A∪B| = |A|+|B|-|A∩B|.

    ``max_df`` is the stop-shingle cap: a shingle held by more than
    max_df docs (boilerplate — nav bars, license headers) is dropped
    from the posting-list join so one hot shingle can't go quadratic.
    One join KEY is one TASK — `repartition(skey)` spreads keys, not a
    key, and AQE skew-split can't break the pair *generation* of a
    single key — so max_df is the per-task ceiling: the default 2,000
    caps any one shingle at ~2·10⁶ join rows in its task (the r4
    default of 100,000 permitted a 5·10⁹-row single-task stall just
    under the cap).  Exact below the cap; above it, pairs sharing only
    stop-shingles are missed and surviving pairs score a lower-bound
    Jaccard (stop-shingles leave the intersection count but not the
    union) — the standard candidate-prefilter tradeoff; corpora whose
    near-dup signal lives in hotter shingles belong on the
    :func:`minhash_lsh_pairs` / minhash-verified path, whose banding
    bounds candidates regardless of shingle heat.

    ``pair_budget`` guards the TOTAL join fan-out: before the
    self-join, one tiny aggregate over the (already-materialized)
    posting list computes Σ df·(df−1)/2 — the exact number of join
    rows the surviving shingles will generate — and raises with the
    measured blast radius and the knobs to turn instead of launching
    a job that cannot finish.  ``None`` disables either guard."""
    sh = _materialize(_shingle_keys(documents, n, key_fn))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    # posting-list prune (result-preserving): a shingle held by a single
    # doc cannot produce a pair — drop it before the self-join.  In a
    # natural corpus most shingles are unique, so this removes most of
    # the join input; the surviving hot shingles are what AQE's
    # skew-join splitting is for.
    df_per_shingle = sh.groupBy("skey").count()
    if max_df is not None:
        df_per_shingle = df_per_shingle.filter(F.col("count") <= max_df)
    shared_df = df_per_shingle.filter(F.col("count") > 1)
    if pair_budget is not None:
        st = shared_df.agg(
            F.sum(
                F.col("count").cast("double")
                * (F.col("count") - 1).cast("double") / 2
            ).alias("pairs"),
            F.max("count").alias("hottest"),
        ).collect()[0]
        total = int(st["pairs"] or 0)
        if total > pair_budget:
            raise ValueError(
                f"ngram_jaccard_pairs: surviving shingles would generate "
                f"{total:,} candidate join rows (> pair_budget="
                f"{pair_budget:,}; hottest shingle df={st['hottest']:,}, "
                f"max_df={max_df}).  Lower max_df, raise pair_budget, or "
                f"use the minhash_verified path, whose LSH banding bounds "
                f"candidates regardless of shingle heat."
            )
    shared = shared_df.select("skey")
    # repartition by the join key so the per-shingle quadratic work is
    # spread across tasks (AQE would otherwise coalesce this small
    # shuffle to one partition and serialize the whole join)
    sh = sh.join(shared, "skey", "left_semi").repartition(
        sh.sparkSession.sparkContext.defaultParallelism, "skey"
    )
    a = sh.alias("a")
    b = sh.alias("b")
    common = (
        a.join(b, (F.col("a.skey") == F.col("b.skey"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "doc_a").join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def minhash_signatures(
    documents: DataFrame, n: int = 3, k: int = 16, key_fn: str = "md5"
) -> DataFrame:
    """(doc_id, sig ARRAY<BIGINT>[k]) — MinHash over word-n-gram
    shingles; hash family h_i(s) = (base(s)·(2i+1) + i·C) mod (2^31-1)
    with base(s) = the integer shingle key (see _shingle_keys — one
    token digest + positional-XOR combine, no shingle strings).

    Plan shape (r3): NO explode, NO shuffle — each doc's signature is
    ``array_min(transform(shingle_keys, affine_i))`` per hash i, a
    single narrow codegen'd projection over the per-doc key array.
    The r2 formulation exploded ~100M shingle rows into a 16-column
    min-aggregate (1.6B hash-agg updates + a shuffle) and was the
    worst-scaling stage in the repo (0.25 at 8→32 cores); the history
    before that: r1's md5(i||s)-per-i family (16 hex strings per
    shingle row, GC-bound, 0.29), r2's md5-per-shingle (3 string
    allocations per row).  All intermediates < 2^62, ANSI
    overflow-safe, and the DuckDB oracle replays identical BIGINT
    arithmetic (min over the same key set)."""
    arrays = _shingle_key_arrays(documents, n, key_fn).filter(
        F.size("sk") > 0
    )
    # b = key mod 2^31-1, materialized as its own column (CSE rule)
    based = arrays.select(
        "doc_id",
        F.transform("sk", lambda s: s % F.lit(_MERSENNE)).alias("bk"),
    )
    return based.select(
        "doc_id",
        F.array(*[
            F.array_min(
                F.transform(
                    "bk",
                    lambda b: (b * F.lit(2 * i + 1) + F.lit(i * _HASH_C))
                    % F.lit(_MERSENNE),
                )
            )
            for i in range(k)
        ]).alias("sig"),
    )


def minhash_lsh_pairs(
    documents: DataFrame, n: int = 3, k: int = 16, bands: int = 4,
    key_fn: str = "md5",
) -> DataFrame:
    """Candidate near-dup pairs whose signatures collide in ≥1 LSH band
    (k/bands rows per band), with the estimated Jaccard = fraction of
    matching minhashes.  shingle→minhash→band→bucket-join."""
    rows = k // bands
    # signatures feed the singleton-prune AND both self-join sides —
    # materialize once instead of re-deriving tokenize+hash per branch
    sigs = _materialize(minhash_signatures(documents, n, k, key_fn))
    banded = sigs.select(
        "doc_id", "sig",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws("|", *[
                        F.col("sig")[b * rows + r].cast("string")
                        for r in range(rows)
                    ]).alias("key"),
                )
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select("doc_id", "sig", "bk.band", "bk.key")
    # same posting-list prune at band-bucket granularity
    shared = (
        banded.groupBy("band", "key").count()
        .filter(F.col("count") > 1).select("band", "key")
    )
    banded = banded.join(shared, ["band", "key"], "left_semi")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"), F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda m: m,
        )
    ) / F.lit(float(k))
    return cand.select(
        "doc_a", "doc_b", F.round(est, 6).alias("est_jaccard")
    )


def minhash_verified_pairs(
    documents: DataFrame, n: int = 3, k: int = 16, bands: int = 4,
    threshold: float = 0.6, key_fn: str = "md5",
) -> DataFrame:
    """Production near-dup shape: MinHash-LSH candidate generation
    (recall) + EXACT Jaccard re-scoring of only the candidates
    (precision).  The rescore joins each candidate pair back to the
    8-byte shingle-key posting lists — cost ∝ candidates, never
    all-pairs — and drops estimates below the exact threshold."""
    cand = minhash_lsh_pairs(documents, n, k, bands, key_fn).select(
        "doc_a", "doc_b"
    )
    sh = _materialize(_shingle_keys(documents, n, key_fn))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sa = sh.select(F.col("doc_id").alias("doc_a"), "skey")
    sb = sh.select(F.col("doc_id").alias("doc_b"), "skey")
    common = (
        cand.join(sa, "doc_a").join(sb, ["doc_b", "skey"])
        .groupBy("doc_a", "doc_b").agg(F.count("*").alias("n_common"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(za, "doc_a").join(zb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common")
                    / (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash64(documents: DataFrame) -> DataFrame:
    """(doc_id, simhash BIGINT) — 32-bit SimHash over unigram tokens.

    Per-bit majority vote: bit b of md5(token) contributes ±1; the
    sign of the sum sets bit b.  Kept at 32 bits so the whole thing
    stays in exact integer arithmetic everywhere.

    Plan shape (r4): NO explode, NO shuffle — the same per-doc
    array-arithmetic trick as the minhash rework.  One md5 digest per
    distinct token materialized as a per-doc hash array, then ONE
    aggregate pass folds the array into 32 per-bit set-counts (a
    32-long accumulator updated with zip_with), and bit b of the
    simhash is ``2·count_b > n_tokens`` — algebraically the same
    majority vote (vote_b = 2c_b − n > 0).  The r3 formulation
    exploded 32 bit-rows per token through a (doc_id, bit) groupBy
    (~32× the token count through one shuffle); an intermediate r4
    draft ran 32 separate interpreted aggregate passes and measured
    2.5× slower than this single-pass form at sf0.1 (1.26 s vs
    0.50 s — the per-pass HOF dispatch dominates).  Bit-identical to
    both and to the DuckDB oracle; docs with zero tokens vanish from
    the output in all shapes (explode produced no rows; here an
    explicit size filter)."""
    based = _fan_out(documents, "doc_id").select(
        "doc_id", F.array_distinct(tokens_col("text")).alias("toks")
    )
    # hash array materialized as its OWN column (lambda-scope CSE rule:
    # an unaliased transform referenced inside the vote aggregate
    # would re-run the md5 pass per accumulator step)
    hashed = based.select(
        "doc_id",
        F.transform(
            "toks",
            lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast(
                "long"
            ),
        ).alias("hk"),
    ).select("doc_id", _opt_barrier(F.col("hk")).alias("hk"))
    counts = F.expr(
        "aggregate(hk, array_repeat(0L, 32), (acc, x) -> "
        "zip_with(acc, sequence(0L, 31L), (a, i) -> a + ((x >> i) & 1)))"
    )
    voted = hashed.filter(F.size("hk") > 0).select(
        "doc_id",
        F.size("hk").alias("n"),
        _opt_barrier(counts).alias("c"),
    )
    sim = F.expr(
        "aggregate(zip_with(c, sequence(0L, 31L), (cnt, i) -> "
        "IF(2*cnt > n, shiftleft(1L, CAST(i AS INT)), 0L)), "
        "0L, (a, x) -> a + x)"
    )
    return voted.select("doc_id", sim.alias("simhash"))


def _band_keys(emb_col, n_bands: int, band_bits: int):
    """ARRAY<STRUCT<band,key>> of banded sign-bit LSH keys: band b's key
    is the sign pattern of dims [b·band_bits, (b+1)·band_bits).  Two
    vectors with cosine near 1 share almost every sign bit, so they
    collide in ≥1 band with high probability; portable to the DuckDB
    oracle (pure CASE/concat arithmetic, same key both sides)."""
    return F.array(*[
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws("", *[
                # F.get (not getItem): NULL past the array end instead of
                # an ANSI INVALID_ARRAY_INDEX — short vectors pad with "0"
                F.when(F.get(emb_col, b * band_bits + i) >= 0, F.lit("1"))
                .otherwise(F.lit("0"))
                for i in range(band_bits)
            ]).alias("key"),
        )
        for b in range(n_bands)
    ])


def _neardup_bucket_scorer(threshold: float):
    """Per-(band,key)-bucket pair scorer for the Arrow path of
    :func:`embedding_neardup_pairs`: the bucket's vectors are one
    float64 matrix, all within-bucket pair cosines are one chunked
    GEMM, and only pairs passing ``cosine ≥ threshold`` (rounded to 6
    decimals BEFORE the compare, exactly like the expr path's
    ``F.round(cos, 6)``) ever leave the Python worker.  Rows are
    sorted by vec_id first so the strict upper triangle IS the
    ``vec_a < vec_b`` pair set; zero-norm vectors produce NaN cosines,
    which fail the threshold compare and drop — the same semantics as
    the expr path's try_divide→NULL→filter."""

    def score(pdf):
        import numpy as np
        import pandas as pd

        empty = pd.DataFrame({
            "vec_a": pdf["vec_id"][:0], "vec_b": pdf["vec_id"][:0],
            "cosine": pd.Series([], dtype="float64"),
        })
        m = len(pdf)
        if m < 2:
            return empty
        pdf = pdf.sort_values("vec_id")
        vid = pdf["vec_id"].to_numpy()
        M = np.asarray([np.asarray(v, dtype=np.float64)
                        for v in pdf["embedding"]])
        nrm = np.sqrt((M * M).sum(axis=1))
        # chunk both GEMM axes: an 8192² block is a 512 MB float64
        # output ceiling; only the upper block triangle is computed
        CH = 8192
        frames = []
        for i0 in range(0, m, CH):
            A, an, aid = M[i0:i0 + CH], nrm[i0:i0 + CH], vid[i0:i0 + CH]
            for j0 in range(i0, m, CH):
                B, bn, bid = M[j0:j0 + CH], nrm[j0:j0 + CH], vid[j0:j0 + CH]
                with np.errstate(divide="ignore", invalid="ignore"):
                    cos6 = np.round((A @ B.T) / np.outer(an, bn), 6)
                    mask = cos6 >= threshold  # NaN compares False
                if i0 == j0:  # diagonal block: strict upper triangle
                    mask &= np.triu(
                        np.ones(mask.shape, dtype=bool), k=1)
                ii, jj = np.nonzero(mask)
                if ii.size:
                    frames.append(pd.DataFrame({
                        "vec_a": aid[ii], "vec_b": bid[jj],
                        "cosine": cos6[ii, jj],
                    }))
        return pd.concat(frames, ignore_index=True) if frames else empty

    return score


def embedding_neardup_pairs(
    embeddings: DataFrame, threshold: float = 0.95,
    n_bands: int = 4, band_bits: int = 8, score: str = "arrow",
) -> DataFrame:
    """Near-dup pairs by embedding cosine ≥ threshold, blocked by banded
    sign-bit LSH buckets — candidate pairs collide in ≥1 of ``n_bands``
    bands (sign pattern of ``band_bits`` consecutive dims), never
    all-pairs.  Exact cosine is then computed per candidate; standard
    LSH recall semantics (a true pair that differs in every band is
    missed — more bands trade compute for recall).

    ``score='arrow'`` (default, r9): each (band,key) bucket is scored
    as ONE chunked numpy float64 GEMM via ``applyInPandas`` — the expr
    path evaluated dot + both norms through Catalyst's INTERPRETED
    higher-order-function eval per candidate pair (~192 interpreted
    element-ops per pair at dim 64), which dominated the operator at
    scale (measured 12.0 s → GEMM path at sf1.0; same r8 argument as
    the knn_join GEMM scorer).  The threshold filter runs INSIDE the
    worker, so only passing pairs cross the Arrow boundary, and both
    paths round to 6 decimals before the compare, so results are
    identical (the r8 knn GEMM precedent).  Bucket width is governed
    by ``band_bits`` exactly as before — the scorer materializes one
    bucket's vectors per task.  ``score='expr'`` keeps the all-JVM
    shape."""
    if score == "arrow":
        v_t = dict(embeddings.dtypes)["vec_id"]
        banded = embeddings.select(
            "vec_id", "embedding",
            F.explode(
                _band_keys(F.col("embedding"), n_bands, band_bits)
            ).alias("bk"),
        ).select("vec_id", "embedding", "bk.band", "bk.key")
        scored = banded.groupBy("band", "key").applyInPandas(
            _neardup_bucket_scorer(threshold),
            f"vec_a {v_t}, vec_b {v_t}, cosine double",
        )
        # a pair colliding in several bands scores identically in each
        # bucket — dedup on the pair key alone is value-stable
        return scored.dropDuplicates(["vec_a", "vec_b"])
    banded = _materialize(embeddings.select(
        "vec_id", "embedding",
        F.explode(_band_keys(F.col("embedding"), n_bands, band_bits)).alias("bk"),
    ).select("vec_id", "embedding", "bk.band", "bk.key"))
    # singleton-bucket prune: a (band,key) held by one vector yields no pair
    shared = (
        banded.groupBy("band", "key").count()
        .filter(F.col("count") > 1).select("band", "key")
    )
    banded = banded.join(shared, ["band", "key"], "left_semi")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b"),
            F.col("a.embedding").alias("emb_a"), F.col("b.embedding").alias("emb_b"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
    )
    # cast float32 → double BEFORE multiplying so the arithmetic matches
    # the (double-precision) DuckDB oracle bit-for-bit
    dot = F.aggregate(
        F.zip_with("emb_a", "emb_b",
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(
            F.transform(c, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0), lambda a_, x: a_ + x,
        )
    )
    return (
        cand
        # try_divide: zero-norm embeddings (empty documents) have no
        # cosine — NULL fails the threshold and the pair drops, where
        # ANSI `/` would throw on the first empty page in the corpus
        .withColumn("cosine", F.round(F.try_divide(
            dot, norm(F.col("emb_a")) * norm(F.col("emb_b"))), 6))
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )

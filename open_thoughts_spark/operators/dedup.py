"""Deduplication operators: exact, MinHash-LSH, SimHash, n-gram Jaccard.

Reference semantics being re-expressed (not ported):
- exact dedup keep-first: pandas drop_duplicates
  (/root/reference/open_thoughts_3/dcft/data_strategies/commons.py:344-402)
  → ``relational.dedup_on_columns`` (row_number window);
- fuzzy dedup: all-pairs rapidfuzz ratio >= 95 over unique values with
  union-find grouping, keep lowest index
  (/root/reference/open_thoughts/deduplicate.py:17-55). All-pairs is
  O(n^2) and cannot scale; the Spark-native strategy is MinHash-LSH:
  shingle → K min-hash signature → band buckets → candidate pairs via
  bucket join → exact Jaccard verification → keep-min-id. This is the
  standard web-scale near-dup design (e.g. the DCLM / RefinedWeb
  pipelines the reference ingests from).

Portability note: all hashing is ``md5`` over strings, which produces
identical hex in Spark, Python and DuckDB — so candidate generation is
fully reproducible in the SQL correctness oracle (something xxhash64
or Spark's ``hash`` would not give us).

Scale notes:
- one explode per document over its shingle set (size ~ words-n+1), one
  groupBy per signature — the shuffle carries (id, P mins), P small;
- the bucket self-join is the LSH join: only colliding docs meet;
- Jaccard verification joins only candidate pairs, never all pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from open_thoughts_spark.spread import spread

from open_thoughts_spark import config


def words_expr(text: Column, lowercase: bool = True) -> Column:
    t = F.lower(text) if lowercase else text
    return F.split(F.trim(t), "[ \\t\\n\\x0B\\f\\r]+")


def shingles_expr(
    text: Column, n: int = config.SHINGLE_SIZE, distinct: bool = True
) -> Column:
    """Word n-gram shingles as an array<string> (native exprs); distinct
    by default (set-based dedup), ``distinct=False`` keeps multiplicity
    (repetition statistics).

    Formulation matters at scale: a ``transform(sequence(...), i ->
    concat_ws(slice(words, i, n)))`` lambda re-evaluates the ``words`` split
    per element — O(len²) per row (measured ~10x slower). Instead, zip n
    shifted slices (each child array evaluated once per row) and concat the
    zipped structs: O(len), and ~20x faster on the sf0.1 documents table.
    """
    w = words_expr(text)
    if n == 1:
        return F.array_distinct(w) if distinct else w
    gram_count = F.greatest(F.size(w) - (n - 1), F.lit(0))
    shifted = [F.slice(w, i + 1, gram_count).alias(f"w{i}") for i in range(n)]
    zipped = F.arrays_zip(*shifted)
    grams = F.transform(
        zipped, lambda x: F.concat_ws(" ", *[x[f"w{i}"] for i in range(n)])
    )
    return F.array_distinct(grams) if distinct else grams


def minhash_signature(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_perm: int = config.MINHASH_NUM_PERM,
    shingle_n: int = config.SHINGLE_SIZE,
    min_parallelism: int | None = None,
) -> DataFrame:
    """(id, mh_0..mh_{P-1}): P min-hashes over the shingle set.

    Hash economics (round 5): instead of one md5 per (perm, shingle), one
    salted md5 per shingle yields EIGHT 16-bit permutation hashes (4 hex
    chars each — the standard split-one-hash trick), so P perms cost
    ``ceil(P/8)`` md5s per shingle: 8x fewer at the 64-perm production
    default (measured 1.67x faster at the bench's 8-perm config, where it
    saves 7 of 8 md5s). A 16-bit min has chance-equality probability
    ~n/65536 per perm (n = shingle count) — noise well below the banding
    signal, and candidates are exact-Jaccard verified downstream anyway.
    One explode + one groupBy; the P mins are P aggregate expressions over
    the same exploded column (single shuffle). ``min_parallelism``
    pre-spreads a low-partition input (single local file) so the
    shingle-md5 map runs across tasks.
    """
    df = spread(df, min_parallelism, F.col(id_col))
    exploded = df.select(
        F.col(id_col), F.explode(shingles_expr(F.col(text_col), shingle_n)).alias("_sh")
    )
    n_base = (num_perm + 7) // 8
    for k in range(n_base):
        exploded = exploded.withColumn(
            f"_h{k}", F.md5(F.concat_ws("|", F.lit(str(k)), F.col("_sh")))
        )
    aggs = [
        F.min(
            F.substring(F.col(f"_h{i // 8}"), (i % 8) * 4 + 1, 4)
        ).alias(f"mh_{i}")
        for i in range(num_perm)
    ]
    return exploded.groupBy(id_col).agg(*aggs)


def lsh_bands(
    sig: DataFrame,
    id_col: str,
    bands: int = config.MINHASH_BANDS,
    rows_per_band: int = config.MINHASH_ROWS_PER_BAND,
) -> DataFrame:
    """(id, band_idx, band_key): md5 of each band's concatenated mins."""
    pieces = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        pieces.append(
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(F.concat_ws("|", *cols)).alias("band_key"),
            )
        )
    return sig.select(
        F.col(id_col), F.explode(F.array(*pieces)).alias("_b")
    ).select(id_col, F.col("_b.band_idx").alias("band_idx"), F.col("_b.band_key").alias("band_key"))


def cap_band_buckets(
    bands_df: DataFrame,
    max_bucket_size: int,
    key_cols: tuple[str, ...] = ("band_idx", "band_key"),
) -> DataFrame:
    """Drop every band bucket holding more than ``max_bucket_size`` rows.

    The skew guard for LSH band self-joins: one degenerate band value (empty
    texts, a boilerplate page repeated 10^7 times, the all-zero sign
    pattern) makes that bucket's self-join quadratic — 10^7 rows in one
    bucket is 5*10^13 candidate pairs on a single join key, a straggler no
    cluster width fixes. Capping trades bounded recall for a linear bound:
    a pair can still surface through any OTHER band it collides in, and at
    web scale an over-cap bucket is near-always a degenerate key, not real
    near-duplicate signal (the docs inside it are better handled by exact
    dedup on the normalized text). Audit what a cap would drop with
    :func:`oversize_band_buckets` before choosing the threshold.

    Single window count over the band-key hash partitioning — the same key
    the downstream self-join shuffles on.
    """
    w = Window.partitionBy(*[F.col(c) for c in key_cols])
    return (
        bands_df.withColumn("_bucket_n", F.count(F.lit(1)).over(w))
        .filter(F.col("_bucket_n") <= max_bucket_size)
        .drop("_bucket_n")
    )


def oversize_band_buckets(
    bands_df: DataFrame,
    max_bucket_size: int,
    key_cols: tuple[str, ...] = ("band_idx", "band_key"),
) -> DataFrame:
    """(key_cols..., bucket_n) for every bucket a cap of ``max_bucket_size``
    would drop — the audit side of :func:`cap_band_buckets` (partial-agg
    count, so the hot keys never concentrate on one task)."""
    return (
        bands_df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("bucket_n"))
        .filter(F.col("bucket_n") > max_bucket_size)
    )


def bucket_pairs(
    bands_df: DataFrame,
    key_cols: tuple[str, ...],
    payload_cols: tuple[str, ...],
    id_col: str,
    pin_parallelism: bool = True,
) -> DataFrame:
    """All (a, b) struct pairs with ``a.id < b.id`` within each bucket,
    via ONE shuffle: gather each bucket's rows with ``collect_list`` and
    enumerate pairs with a double explode — no self-join.

    Why not a self-join on the bucket key (the r2-r5 shape): a self-join
    computes the band/signature lineage once per side unless materialized.
    The r3-r5 lazy ``localCheckpoint`` barrier fixed that but cost 2-5 s of
    driver-side plan-conversion + codegen at DataFrame BUILD time per call
    (measured r6 — the dominant cost of every dedup bench query), and the
    r6 repartition-for-exchange-reuse attempt found AQE in Spark 4.1 does
    not reuse canonically-equal sibling exchanges at runtime (verified on a
    minimal self-join: two ShuffleQueryStages materialized; the static
    planner's ReuseExchange does fire, but AQE replans). The gather form
    needs no sharing at all: one exchange keyed exactly like the old join,
    lineage computed once in its map side, and the same |bucket|² pair
    enumeration the join did — as a double explode instead of a hash probe
    (guide §8: decide with one gather). Null-keyed rows are dropped first,
    matching equi-join semantics. Memory: a bucket must fit in one
    ``collect_list`` — the same regime where the join's output was
    quadratic; use :func:`cap_band_buckets` upstream (its window shares
    this exchange's key, so capping adds no shuffle).

    With ``pin_parallelism`` the gather's exchange is pinned to an explicit
    partition count (``repartition(P, keys)`` — REPARTITION_BY_NUM, which
    AQE does not coalesce): the band shuffle is BYTES-tiny but each of its
    rows fans out quadratically downstream, so AQE's size-based coalescing
    would funnel the whole enumeration (and any per-pair verify math in
    the same stage) onto 1-2 tasks (measured r6: the banded-cosine verify
    ran serial, 3.7 s vs 1.4 s warm — the r5 "AQE coalescing" lore,
    compute-heavy flavor). The aggregation reuses the exchange (same key),
    so no second shuffle is added; P = the session's shuffle parallelism.
    Pass ``pin_parallelism=False`` when the caller does no per-pair work
    in the gather stage (e.g. minhash candidate generation, whose verify
    runs in later joins keyed elsewhere) — there the pin only costs task
    overhead on small inputs (measured: +0.2-0.3 s warm in clean windows).
    """
    key = [F.col(c) for c in key_cols]
    row = F.struct(F.col(id_col), *[F.col(c) for c in payload_cols])
    gathered = bands_df.filter(F.col(key_cols[-1]).isNotNull())
    if pin_parallelism:
        try:
            p = int(
                bands_df.sparkSession.conf.get("spark.sql.shuffle.partitions")
            )
        except (TypeError, ValueError):  # e.g. "auto" under some deployments
            p = bands_df.sparkSession.sparkContext.defaultParallelism
        gathered = gathered.repartition(p, *key)
    buckets = (
        gathered
        .groupBy(*key)
        .agg(F.collect_list(row).alias("_rows"))
    )
    return (
        buckets.select(F.explode("_rows").alias("_a"), "_rows")
        .select("_a", F.explode("_rows").alias("_b"))
        .filter(F.col(f"_a.{id_col}") < F.col(f"_b.{id_col}"))
    )


def candidate_pairs(
    bands_df: DataFrame,
    id_col: str,
    materialize: bool = True,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Distinct (id_a < id_b) pairs colliding in at least one band.

    One shuffle keyed on (band_idx, band_key): buckets are gathered and
    pairs enumerated in place (:func:`bucket_pairs`) — the signature
    lineage computes exactly once, with no self-join, no checkpoint and no
    exchange-reuse dependence. ``max_bucket_size`` drops degenerate band
    buckets first (:func:`cap_band_buckets` — the web-scale skew guard);
    its window keys on the same columns, so capping shares this shuffle.
    ``materialize`` is retained for API compatibility: the gather shape
    computes the lineage once either way."""
    if max_bucket_size is not None:
        bands_df = cap_band_buckets(bands_df, max_bucket_size)
    return (
        # pin_parallelism=False: no per-pair math runs in the gather stage
        # here — Jaccard verification joins on other keys downstream
        bucket_pairs(
            bands_df, ("band_idx", "band_key"), (), id_col,
            pin_parallelism=False,
        )
        .select(
            F.col(f"_a.{id_col}").alias("id_a"),
            F.col(f"_b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = config.SHINGLE_SIZE,
    min_jaccard: float = 0.0,
    pairs: DataFrame | None = None,
    block_col: str | None = None,
    min_parallelism: int | None = None,
) -> DataFrame:
    """Exact Jaccard over shingle sets for (a) given candidate ``pairs``, or
    (b) all pairs sharing >= 1 shingle (optionally within ``block_col``).

    Returns (id_a, id_b, common, size_a, size_b, jaccard). The exploded
    shingle table feeds the two join branches (sh_a, sh_b) — it is
    recomputed per branch by design (materializing exploded shingles at
    web scale costs more than recomputing the narrow map); pass
    ``min_parallelism`` so each recompute at least runs wide on
    single-file inputs. Per-doc set sizes do NOT re-explode the shingles
    (that was a second full explode feeding a groupBy): the exploded row
    count per id is by construction the sum of ``size(shingles_expr(...))``
    over that id's rows, so the aggregation runs on ONE narrow (id, int)
    row per input row — the shuffle carries ids and counts, never shingles
    (guide §2.3). The groupBy is kept (not a bare per-row projection) so
    inputs with duplicate ids keep the exact r5 semantics: sizes are
    summed per id.
    """
    df = spread(df, min_parallelism, F.col(id_col))
    sh = df.select(
        F.col(id_col),
        *( [F.col(block_col)] if block_col else [] ),
        F.explode(shingles_expr(F.col(text_col), shingle_n)).alias("_sh"),
    )
    sizes = (
        df.select(
            F.col(id_col),
            F.size(shingles_expr(F.col(text_col), shingle_n)).alias("_sz"),
        )
        .groupBy(id_col)
        .agg(F.sum("_sz").alias("_n"))
    )
    if pairs is not None:
        # candidate pushdown: verification cost ∝ candidate pairs, NOT the
        # quadratic blowup of self-joining on hot shingles ("the", common
        # n-grams). r6 shape: attach each side's per-row SHINGLE ARRAY by
        # id and count the overlap with one codegen'd ``array_intersect``
        # per row pair — two id joins and a narrow (id_a, id_b, int) agg
        # replace the r1-r5 exploded-shingle route (pairs ⋈ sh(id_a) ⋈
        # sh(id_b, same sh) → count), which shuffled shingle STRINGS on a
        # composite key (guide §2.3). The sum over row pairs reproduces
        # the exploded semantics exactly, duplicate-id inputs included:
        # per (row_a, row_b), |A ∩ B| = matched shingle-row pairs.
        arrays = df.select(
            F.col(id_col),
            shingles_expr(F.col(text_col), shingle_n).alias("_sha"),
        )
        a = arrays.select(F.col(id_col).alias("id_a"), F.col("_sha").alias("_A"))
        b = arrays.select(F.col(id_col).alias("id_b"), F.col("_sha").alias("_B"))
        common = (
            pairs.join(a, on="id_a")
            .join(b, on="id_b")
            .select(
                "id_a",
                "id_b",
                F.size(F.array_intersect("_A", "_B")).cast("long").alias("_c"),
            )
            .groupBy("id_a", "id_b")
            .agg(F.sum("_c").alias("common"))
            # the exploded route emitted a pair only when >= 1 shingle
            # matched (inner join on _sh); a zero-overlap chance candidate
            # must stay invisible here too
            .filter(F.col("common") > 0)
        )
    else:
        join_keys = ["_sh"] + ([block_col] if block_col else [])
        a = sh.select(*[F.col(c).alias(c if c != id_col else "id_a") for c in sh.columns])
        b = sh.select(*[F.col(c).alias(c if c != id_col else "id_b") for c in sh.columns])
        common = (
            a.join(b, on=join_keys)
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("common"))
        )
    out = (
        common.join(sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("_n", "size_a"), on="id_a")
        .join(sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("_n", "size_b"), on="id_b")
        .withColumn(
            "jaccard",
            F.col("common") / (F.col("size_a") + F.col("size_b") - F.col("common")),
        )
    )
    if min_jaccard > 0:
        out = out.filter(F.col("jaccard") >= min_jaccard)
    return out.select("id_a", "id_b", "common", "size_a", "size_b", "jaccard")


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) over the undirected pair graph; component = min
    reachable node id (distributed union-find-equivalent labeling).

    Attribution note (ADVICE r2): the reference
    (/root/reference/open_thoughts/deduplicate.py:41-49) does NOT close the
    graph — it removes the non-min indices of each matched PAIR
    independently, so for A~C, B~C, A≁B it keeps both A and B. Transitive
    closure is this repo's deliberate semantic upgrade (a dup-of-a-dup is a
    dup); use ``minhash_dedup(transitive=False)`` for pairwise reference
    parity.

    Min-label propagation with per-round label compression (each node also
    adopts the label of its current label — pointer doubling), so chains
    converge in O(log diameter) rounds instead of O(diameter). Every round
    is two shuffles (edge join + label join); frames are localCheckpoint'd
    to truncate lineage. Near-dup clusters have tiny diameters in practice;
    ``max_iter`` is a runaway bound, with convergence detected by counting
    changed labels.
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
    )
    labels = edges.select(F.col("src").alias("node")).distinct().withColumn(
        "comp", F.col("node")
    )
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        nbr_min = (
            edges.join(
                labels.select(
                    F.col("node").alias("dst"), F.col("comp").alias("_nc")
                ),
                on="dst",
            )
            .groupBy("src")
            .agg(F.min("_nc").alias("_nbr"))
            .withColumnRenamed("src", "node")
        )
        stepped = labels.join(nbr_min, on="node", how="left").select(
            "node", F.least("comp", F.coalesce("_nbr", "comp")).alias("comp")
        )
        # label compression: comp := comp of comp (pointer doubling)
        compressed = (
            stepped.join(
                stepped.select(
                    F.col("node").alias("comp"), F.col("comp").alias("_cc")
                ),
                on="comp",
                how="left",
            )
            .select("node", F.least("comp", F.coalesce("_cc", "comp")).alias("comp"))
            .localCheckpoint(eager=True)
        )
        changed = (
            compressed.join(
                labels.select("node", F.col("comp").alias("_old")), on="node"
            )
            .filter(F.col("comp") < F.col("_old"))
            .limit(1)
            .count()
        )
        labels = compressed
        if changed == 0:
            break
    return labels


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_jaccard: float = 0.8,
    num_perm: int = config.MINHASH_NUM_PERM,
    shingle_n: int = config.SHINGLE_SIZE,
    transitive: bool = True,
    bands: int | None = None,
    rows_per_band: int | None = None,
    min_parallelism: int | None = None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Drop every row whose duplicate component has a smaller id.

    ``transitive=True`` (default) closes the verified-pair graph with
    ``connected_components`` and keeps the min id per component — a
    deliberate semantic UPGRADE over the reference, which removes non-min
    indices per matched pair only (deduplicate.py:41-49, no closure): for
    A~C, B~C, A≁B the reference keeps A and B, closure keeps only A.
    ``transitive=False`` is the pairwise reference-parity variant (drop any
    id_b of a verified pair): cheaper (no iteration) but keeps chain-linked
    near-dups the closure would drop.
    """
    # band geometry must cover exactly num_perm (bands × rows == perms);
    # defaulting lsh_bands' config geometry with a custom num_perm would
    # reference missing signature columns
    if rows_per_band is None:
        rows_per_band = config.MINHASH_ROWS_PER_BAND if bands is None else max(
            num_perm // bands, 1
        )
    if bands is None:
        bands = num_perm // rows_per_band
    if bands * rows_per_band != num_perm:
        raise ValueError(
            f"bands({bands}) x rows_per_band({rows_per_band}) != num_perm({num_perm})"
        )
    sig = minhash_signature(
        df, id_col, text_col, num_perm, shingle_n,
        min_parallelism=min_parallelism,
    )
    cands = candidate_pairs(
        lsh_bands(sig, id_col, bands=bands, rows_per_band=rows_per_band),
        id_col,
        max_bucket_size=max_bucket_size,
    )
    verified = jaccard_pairs(
        df, id_col, text_col, shingle_n, min_jaccard, pairs=cands,
        min_parallelism=min_parallelism,
    )
    if transitive:
        cc = connected_components(verified)
        losers = cc.filter(F.col("comp") != F.col("node")).select(
            F.col("node").alias(id_col)
        )
    else:
        losers = verified.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, on=id_col, how="left_anti")


def exact_dedup_normalized(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Exact dedup on whitespace-normalized lowercased text, keep min id.

    The scalable form of commons.py:344-372 keep-first: min(id) per
    normalized-text group via one aggregation (no window, no sort).
    """
    norm = F.lower(F.regexp_replace(F.trim(F.col(text_col)), "[ \\t\\n\\x0B\\f\\r]+", " "))
    keep = (
        df.withColumn("_k", norm)
        .groupBy("_k")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, on=id_col, how="inner")


def levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    min_ratio: float = 95.0,
    max_len_diff_frac: float = 0.2,
    min_parallelism: int | None = None,
) -> DataFrame:
    """Edit-distance fuzzy pairs within blocks — the exact-verification
    channel for fuzzy dedup (open_thoughts/deduplicate.py:17-55 uses
    rapidfuzz fuzz.ratio; this uses normalized Levenshtein similarity
    ``(1 - lev/max(len)) * 100`` — same operating regime, built-in in both
    Spark and DuckDB so it is fully oracle-checkable).

    Scale shape: block join (never all-pairs) + a length-band prefilter —
    strings whose lengths differ more than ``max_len_diff_frac`` cannot reach
    the ratio, so the quadratic-cost edit distance only runs on plausible
    pairs. For web-scale corpora the block key comes from MinHash-LSH bands
    (candidate_pairs) and this is the verify step.
    """
    base = df.select(F.col(id_col), F.col(block_col), F.col(text_col).alias("_t"))
    a = base.select(
        F.col(id_col).alias("id_a"), F.col(block_col), F.col("_t").alias("_ta")
    )
    b = base.select(
        F.col(id_col).alias("id_b"), F.col(block_col), F.col("_t").alias("_tb")
    )
    la, lb = F.length("_ta"), F.length("_tb")
    joined = (
        a.join(b, on=block_col)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.abs(la - lb) <= F.greatest(la, lb) * max_len_diff_frac
        )
    )
    if min_parallelism:
        # the join's output stays partitioned BY BLOCK KEY — with few
        # blocks the quadratic levenshtein grinds on a handful of skewed
        # tasks (measured: one core for 20+ min at sf0.1). Round-robin the
        # PAIRS before the O(len^2) projection: the pair-row shuffle is
        # linear in candidate count, the DP it parallelizes is not.
        # The lazy localCheckpoint is REQUIRED, not an optimization:
        # Catalyst pushes the ratio filter (and its levenshtein expr)
        # straight through a bare Repartition back into the skewed join
        # stage (measured: >500 s vs 50 s at sf0.1); the checkpointed RDD
        # scan is a pushdown barrier, so the DP really runs post-exchange.
        joined = joined.repartition(min_parallelism).localCheckpoint(eager=False)
    ratio = (F.lit(1.0) - F.levenshtein("_ta", "_tb") / F.greatest(la, lb)) * 100
    return (
        joined.withColumn("ratio", F.round(ratio, 4))
        .filter(F.col("ratio") >= min_ratio)
        .select("id_a", "id_b", "ratio")
    )


# --- SimHash ---

def simhash32(
    df: DataFrame, id_col: str, text_col: str, out_col: str = "simhash",
    min_parallelism: int | None = None,
) -> DataFrame:
    """32-bit SimHash over word unigrams (md5-derived bits, portable).

    Bit j of a word = parity of the ASCII code of hex char j of its md5 —
    chosen over integer hex parsing because ``ascii(substr(md5(w),j,1)) % 2``
    evaluates identically in Spark, Python and DuckDB (the correctness
    oracle), while hex→int casts don't exist portably. Each word contributes
    ±1 per bit position; the sign of each positional sum is the fingerprint
    bit. Near-duplicates land at small Hamming distance. One explode + one
    groupBy with 32 conditional-sum aggregates (single shuffle).
    """
    # spread the expensive md5-per-word map across tasks when the
    # input is a single file (see simhash64)
    df = spread(df, min_parallelism, F.col(id_col))
    w = df.select(
        F.col(id_col), F.explode(words_expr(F.col(text_col))).alias("_w")
    ).filter(F.col("_w") != "")
    w = w.withColumn("_h", F.md5(F.col("_w")))
    # the 32 ±1 sums and the 32-term fingerprint pack are built as SQL
    # strings parsed JVM-side in one call each: constructing them with
    # per-op Column methods costs ~1 py4j round trip per node (~0.5 s of
    # driver wall per plan build, measured r6) for the same expression tree
    aggs = [
        F.expr(
            f"sum(case when ascii(substring(_h, {j + 1}, 1)) % 2 = 1 "
            f"then 1 else -1 end)"
        ).alias(f"_s{j}")
        for j in range(32)
    ]
    sums = w.groupBy(id_col).agg(*aggs)
    fp = F.expr(
        " + ".join(
            f"(case when _s{j} > 0 then {2**j}L else 0L end)" for j in range(32)
        )
    )
    return sums.select(F.col(id_col), fp.alias(out_col))


def hamming32(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_neardup_pairs(
    fp: DataFrame,
    id_col: str,
    fp_col: str = "simhash",
    max_hamming: int = 3,
    bands: int = 4,
    bits: int = 32,
    materialize: bool = True,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with hamming <= max_hamming, blocked by
    fingerprint band values — the Manku/Jain/Sarma pigeonhole sharding
    (WWW'07 simhash paper): with ``bands > max_hamming`` equal-width bands,
    any pair within the radius must agree on at least one whole band, so
    the band self-join finds EVERY qualifying pair (no recall loss) while
    joining only same-band-value buckets. Caveat: with the default
    ``bits=32, bands=4`` each band key is only 8 bits (256 buckets), which
    goes quadratic past ~10^7 docs — use :func:`simhash64` +
    :func:`simhash64_neardup_pairs` (16-bit band keys) at web scale.
    ``materialize`` is retained for API compatibility: the r6 bucket-gather
    shape computes the fingerprint lineage once either way.
    """
    if bands <= max_hamming:
        raise ValueError("need bands > max_hamming for exact pigeonhole recall")
    width = bits // bands
    mask = (1 << width) - 1
    pieces = [
        F.struct(
            F.lit(b).alias("band_idx"),
            F.shiftright(F.col(fp_col), b * width).bitwiseAND(F.lit(mask)).alias("band_val"),
        )
        for b in range(bands)
    ]
    banded = fp.select(
        F.col(id_col), F.col(fp_col), F.explode(F.array(*pieces)).alias("_b")
    ).select(id_col, fp_col, "_b.band_idx", "_b.band_val")
    if max_bucket_size is not None:
        # trades the pigeonhole's zero-recall-loss guarantee for a linear
        # bound on degenerate band values (see cap_band_buckets)
        banded = cap_band_buckets(
            banded, max_bucket_size, key_cols=("band_idx", "band_val")
        )
    # one shuffle: gather each band bucket, enumerate pairs in place — the
    # fingerprint lineage computes exactly once (see bucket_pairs; replaced
    # the r3-r5 localCheckpointed self-join whose driver-side plan
    # conversion dominated this operator's bench cost)
    pairs = bucket_pairs(banded, ("band_idx", "band_val"), (fp_col,), id_col)
    return (
        pairs.select(
            F.col(f"_a.{id_col}").alias("id_a"),
            F.col(f"_b.{id_col}").alias("id_b"),
            hamming32(F.col(f"_a.{fp_col}"), F.col(f"_b.{fp_col}")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash64(
    df: DataFrame,
    id_col: str,
    text_col: str,
    hi_col: str = "simhash_hi",
    lo_col: str = "simhash_lo",
    min_parallelism: int | None = None,
) -> DataFrame:
    """64-bit SimHash as two portable 32-bit halves (VERDICT r2 scale fix).

    Bit source (round 4): each half's 32 bits are the first 8 hex chars of
    an md5 decoded to ONE 32-bit integer per word (``conv(substr(md5,1,8),
    16, 10)`` / DuckDB ``('0x'||substr(md5,1,8))::bigint`` — the same
    idiom the ANN oracles use), with bit j extracted by shift-and-mask.
    That's 2 string ops per word instead of the previous 64 per-hex-char
    ``ascii(substr)%2`` extractions. Measured Spark-side effect at sf0.1:
    neutral (the packed agg + shuffle dominate, not the extractions); the
    real beneficiaries are the DuckDB oracle (64 integer bit-ops replace
    64 substr calls per word) and expression-tree size.
    The upper half comes from an INDEPENDENT hash ``md5(word || '#')``, so
    the halves are uncorrelated and the fingerprint is a true 64-bit
    simhash. Each half packs into a non-negative bigint (no 2^63 sign-bit
    issues in Spark longs or DuckDB BIGINTs). One explode + one groupBy —
    still a single shuffle.

    Why 64 and not 32: band blocking splits the fingerprint into
    ``bands > max_hamming`` pieces; with 32 bits and 4 bands each band key is
    8 bits = 256 distinct values, so at 10^9 docs every bucket holds ~N/256
    docs and the self-join goes quadratic. 64 bits gives 16-bit band keys
    (65,536 values/band) — buckets stay fine-grained at web scale.
    """
    # the per-word md5 x2 + packed partial agg is the expensive map; a
    # single-file input would run it in one task (local bench reality —
    # a real lake has many files). min_parallelism pre-spreads rows so the
    # heavy map parallelizes; the tiny doc-text shuffle buys a 32-way agg.
    df = spread(df, min_parallelism, F.col(id_col))
    w = df.select(
        F.col(id_col), F.explode(words_expr(F.col(text_col))).alias("_w")
    ).filter(F.col("_w") != "")
    # one 32-bit chunk per word per half; all 32 bit extractions below are
    # long shift/mask ops on these two columns
    w = w.withColumn(
        "_c0", F.conv(F.substring(F.md5(F.col("_w")), 1, 8), 16, 10).cast("long")
    ).withColumn(
        "_c1",
        F.conv(
            F.substring(F.md5(F.concat(F.col("_w"), F.lit("#"))), 1, 8), 16, 10
        ).cast("long"),
    )

    # Aggregate PACKED lanes, not 64 separate ±1 sums: two 32-bit ones-
    # counters ride in each summed long (bit j contributes 1 or 1<<32), so
    # the HashAggregate carries 33 buffer fields instead of 65 — wide
    # enough aggregates fall out of whole-stage codegen, and the packed
    # form measured 6x faster at sf0.1 with bit-identical output. The
    # positional sign is recovered as 2*ones - n_words > 0. Lane capacity
    # 2^32 words/doc before overflow. All wide expressions are SQL strings
    # parsed JVM-side (one py4j call each, not one per node — the per-op
    # Column API cost ~1 s of driver wall per plan build here, measured r6).
    aggs = [F.count(F.lit(1)).alias("_n")]
    for src, half in (("_c0", "lo"), ("_c1", "hi")):
        for i in range(16):
            aggs.append(
                F.expr(
                    f"sum((shiftright({src}, {2 * i}) & 1) + "
                    f"shiftleft(shiftright({src}, {2 * i + 1}) & 1, 32))"
                ).alias(f"_{half}p{i}")
            )
    sums = w.groupBy(id_col).agg(*aggs)
    lane_mask = (1 << 32) - 1

    def _pack(half: str) -> Column:
        terms = []
        for i in range(16):
            for j, ones in (
                (2 * i, f"(_{half}p{i} & {lane_mask})"),
                (2 * i + 1, f"shiftright(_{half}p{i}, 32)"),
            ):
                terms.append(
                    f"(case when 2 * {ones} - _n > 0 then {2**j}L else 0L end)"
                )
        return F.expr(" + ".join(terms))

    return sums.select(F.col(id_col), _pack("hi").alias(hi_col), _pack("lo").alias(lo_col))


def hamming64(hi_a: Column, lo_a: Column, hi_b: Column, lo_b: Column) -> Column:
    return F.bit_count(hi_a.bitwiseXOR(hi_b)) + F.bit_count(lo_a.bitwiseXOR(lo_b))


def simhash64_neardup_pairs(
    fp: DataFrame,
    id_col: str,
    hi_col: str = "simhash_hi",
    lo_col: str = "simhash_lo",
    max_hamming: int = 3,
    materialize: bool = True,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with hamming <= max_hamming over the
    64-bit fingerprint, blocked by 4 x 16-bit band values.

    The Manku/Jain/Sarma pigeonhole (WWW'07): with 4 equal bands and
    ``max_hamming <= 3`` differing bits, at least one whole band is equal on
    every qualifying pair — the band self-join finds EVERY pair (zero recall
    loss; the oracle query proves it against the unblocked all-pairs truth).
    Each band key is 16 bits -> 65,536 buckets per band, so bucket occupancy
    stays ~N/65k at any corpus size (the r2 verdict's 100x caveat on the
    8-bit simhash32 bands, fixed). ``materialize`` is retained for API
    compatibility: the r6 bucket-gather shape computes the fingerprint
    lineage once either way.
    """
    if max_hamming > 3:
        raise ValueError(
            "4x16-bit bands guarantee recall only for max_hamming <= 3; "
            "use more/narrower bands for a larger radius"
        )
    mask = F.lit((1 << 16) - 1)
    band_vals = [
        F.col(lo_col).bitwiseAND(mask),
        F.shiftright(F.col(lo_col), 16).bitwiseAND(mask),
        F.col(hi_col).bitwiseAND(mask),
        F.shiftright(F.col(hi_col), 16).bitwiseAND(mask),
    ]
    pieces = [
        F.struct(F.lit(i).alias("band_idx"), v.alias("band_val"))
        for i, v in enumerate(band_vals)
    ]
    banded = fp.select(
        F.col(id_col), F.col(hi_col), F.col(lo_col),
        F.explode(F.array(*pieces)).alias("_b"),
    ).select(id_col, hi_col, lo_col, "_b.band_idx", "_b.band_val")
    if max_bucket_size is not None:
        # trades the pigeonhole's zero-recall-loss guarantee for a linear
        # bound on degenerate band values (see cap_band_buckets)
        banded = cap_band_buckets(
            banded, max_bucket_size, key_cols=("band_idx", "band_val")
        )
    # one shuffle: gather each band bucket, enumerate pairs in place — the
    # fingerprint lineage (scan + word explode + md5 x2 + packed agg)
    # computes exactly once, in the map side of that single exchange (see
    # bucket_pairs; replaced the r3-r5 localCheckpointed self-join whose
    # driver-side plan conversion + codegen was most of this query's
    # measured bench cost)
    pairs = bucket_pairs(banded, ("band_idx", "band_val"), (hi_col, lo_col), id_col)
    return (
        pairs.select(
            F.col(f"_a.{id_col}").alias("id_a"),
            F.col(f"_b.{id_col}").alias("id_b"),
            hamming64(
                F.col(f"_a.{hi_col}"), F.col(f"_a.{lo_col}"),
                F.col(f"_b.{hi_col}"), F.col(f"_b.{lo_col}"),
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def weighted_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = config.SHINGLE_SIZE,
    min_jaccard: float = 0.0,
    pairs: DataFrame | None = None,
    min_parallelism: int | None = None,
) -> DataFrame:
    """Exact WEIGHTED Jaccard over shingle multisets:
    J_w(a, b) = sum_s min(tf_a(s), tf_b(s)) / sum_s max(tf_a(s), tf_b(s)).

    The set-based :func:`jaccard_pairs` treats 'the cat the cat the cat'
    and 'the cat' as identical; the weighted form keeps term multiplicity,
    the similarity the ICWS / weighted-minhash family estimates — computed
    here EXACTLY (integer tf sums, no sampling), so the DuckDB oracle can
    replay it bit-for-bit. Candidates come from ``pairs`` (e.g. minhash
    band collisions). Recall caveat (ADVICE r3): minhash candidates are
    complete only w.r.t. SET similarity — when term mass concentrates in
    few shingles (tf_a={s:100} vs tf_b={s:100, 9 singletons} gives
    J_w≈0.92 at set-Jaccard 0.1), a high-weighted pair can sit below the
    LSH set-similarity threshold and be missed. For lossless weighted
    recall pass ``pairs=None`` (all same-shingle pairs scored) or generate
    candidates with a weighted scheme (ICWS-style) upstream.

    Identity: sum(max) = |a| + |b| - sum(min) with |x| = total shingle
    count, so one join computing sum-of-mins + per-doc totals suffices.
    Returns (id_a, id_b, common_w, size_a, size_b, jaccard_w).
    """
    df = spread(df, min_parallelism, F.col(id_col))
    tf = (
        df.select(
            F.col(id_col),
            F.explode(
                shingles_expr(F.col(text_col), shingle_n, distinct=False)
            ).alias("_sh"),
        )
        .groupBy(id_col, "_sh")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    # |x| = total (non-distinct) shingle count: sum(tf) over a doc's groups
    # is by construction the exploded row count = the shingle array's size,
    # so the sizes aggregate runs over one narrow (id, int) row per input
    # row instead of a second aggregation over the tf table — the shuffle
    # carries ids and counts, never shingles (guide §2.3). groupBy kept so
    # duplicate-id inputs keep the exact per-id-sum semantics.
    sizes = (
        df.select(
            F.col(id_col),
            F.size(
                shingles_expr(F.col(text_col), shingle_n, distinct=False)
            ).alias("_sz"),
        )
        .groupBy(id_col)
        .agg(F.sum("_sz").alias("_n"))
    )
    tf_a = tf.select(F.col(id_col).alias("id_a"), "_sh", F.col("_tf").alias("_tfa"))
    tf_b = tf.select(F.col(id_col).alias("id_b"), "_sh", F.col("_tf").alias("_tfb"))
    if pairs is not None:
        mins = (
            pairs.join(tf_a, on="id_a")
            .join(tf_b, on=["id_b", "_sh"])
            .groupBy("id_a", "id_b")
            .agg(F.sum(F.least("_tfa", "_tfb")).alias("common_w"))
        )
    else:
        mins = (
            tf_a.join(tf_b, on="_sh")
            .filter(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.sum(F.least("_tfa", "_tfb")).alias("common_w"))
        )
    out = (
        mins.join(
            sizes.withColumnRenamed(id_col, "id_a").withColumnRenamed("_n", "size_a"),
            on="id_a",
        )
        .join(
            sizes.withColumnRenamed(id_col, "id_b").withColumnRenamed("_n", "size_b"),
            on="id_b",
        )
        .withColumn(
            "jaccard_w",
            F.col("common_w")
            / (F.col("size_a") + F.col("size_b") - F.col("common_w")),
        )
    )
    if min_jaccard > 0:
        out = out.filter(F.col("jaccard_w") >= min_jaccard)
    return out.select("id_a", "id_b", "common_w", "size_a", "size_b", "jaccard_w")


def frequent_ngrams(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_docs: int = 2,
    min_doc_frac: float | None = None,
    min_parallelism: int | None = None,
) -> DataFrame:
    """(gram, doc_freq): word n-grams present in >= ``min_docs`` DISTINCT
    documents.

    Document frequency, not occurrence count: the per-document shingle set
    from :func:`shingles_expr` is already distinct, so a plain count after
    the explode IS the df — one explode + one groupBy, no count-distinct
    re-shuffle. At web scale the output is the head of a Zipf curve: tiny
    relative to the corpus for any useful threshold.

    ``min_doc_frac`` makes the threshold corpus-relative
    (``ceil(frac * n_docs)``, floored at 2) — at unknown corpus size you
    specify "grams in >= 0.1% of documents", not an absolute count. Costs
    one metadata-cheap ``count()`` of the input.
    """
    df = spread(df, min_parallelism, F.col(id_col))
    if min_doc_frac is not None:
        import math

        min_docs = max(2, math.ceil(min_doc_frac * df.count()))
    grams = df.select(
        F.explode(shingles_expr(F.col(text_col), n)).alias("gram")
    )
    return (
        grams.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .filter(F.col("doc_freq") >= min_docs)
    )


def scrub_frequent_ngrams(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    min_docs: int = 2,
    min_doc_frac: float | None = None,
    out_col: str = "scrubbed_text",
    removed_col: str = "n_removed",
    grams: DataFrame | None = None,
    broadcast_grams: bool = True,
    min_parallelism: int | None = None,
) -> DataFrame:
    """Corpus-level duplicate-substring removal (the Lee et al.
    "Deduplicating Training Data" ExactSubstr idea re-expressed at word
    n-gram granularity): every occurrence of a word n-gram that appears in
    >= ``min_docs`` distinct documents is deleted from every document, and
    the text is rebuilt from the surviving words (original order, single
    spaces). The reference's fuzzy dedup drops whole rows; this removes the
    boilerplate *inside* rows — the op RefinedWeb/C4-style pipelines apply
    to strip headers, cookie banners and license blurbs that repeat across
    a crawl.

    Plan shape (scale notes):
    - frequency pass: explode distinct shingles -> groupBy(gram) — one
      shuffle keyed on the gram;
    - occurrence pass: posexplode non-distinct shingles -> join the
      frequent set (broadcast by default: the Zipf head is small; pass
      ``broadcast_grams=False`` to let AQE pick when the threshold is so
      low the set is corpus-sized) -> explode each hit into its n covered
      1-based word positions -> collect_set per doc;
    - rebuild: one left join of the original frame to the covered-position
      sets, then a per-row array filter (words zipped with positions) —
      no further shuffle, text never leaves the row.

    Output: the input frame + ``out_col`` (rebuilt text) + ``removed_col``
    (words removed, int). Documents with no frequent n-gram pass through
    verbatim (modulo whitespace normalization of the rebuild: the words
    are ``words_expr`` tokens, lowercased and split on runs of
    whitespace).
    """
    df = spread(df, min_parallelism, F.col(id_col))
    if grams is None:
        grams = frequent_ngrams(
            df, id_col, text_col, n=n, min_docs=min_docs,
            min_doc_frac=min_doc_frac,
        )
    gset = grams.select("gram")
    if broadcast_grams:
        gset = F.broadcast(gset)
    pos = df.select(
        F.col(id_col),
        F.posexplode(
            shingles_expr(F.col(text_col), n, distinct=False)
        ).alias("_p0", "gram"),
    )
    # the gram starting at 0-based _p0 covers 1-based word positions
    # _p0+1 .. _p0+n
    cov = (
        pos.join(gset, on="gram")
        .select(
            F.col(id_col),
            F.explode(
                F.sequence(F.col("_p0") + 1, F.col("_p0") + n)
            ).alias("_cp"),
        )
        .groupBy(id_col)
        .agg(F.collect_set("_cp").alias("_cov"))
    )
    w = words_expr(F.col(text_col))
    zipped = F.arrays_zip(
        F.col("_w").alias("w"),
        F.sequence(F.lit(1), F.size(F.col("_w"))).alias("p"),
    )
    kept = F.filter(
        F.col("_z"), lambda x: ~F.array_contains(F.col("_cov"), x["p"])
    )
    return (
        df.join(cov, on=id_col, how="left")
        .withColumn("_w", w)
        .withColumn(
            "_cov", F.coalesce(F.col("_cov"), F.array().cast("array<int>"))
        )
        .withColumn("_z", zipped)
        .withColumn("_kept", kept)
        .withColumn(
            out_col, F.array_join(F.transform(F.col("_kept"), lambda x: x["w"]), " ")
        )
        .withColumn(
            removed_col, (F.size(F.col("_w")) - F.size(F.col("_kept"))).cast("int")
        )
        .drop("_w", "_cov", "_z", "_kept")
    )

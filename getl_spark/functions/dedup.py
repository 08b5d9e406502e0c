"""Deduplication operators for training-data pipelines.

Five strategies, cheapest first; all distributed, none collects to the
driver:

* ``exact`` — hash-groupBy on key columns, deterministic winner per
  group (min of an order column). One shuffle on the key.
* ``ngram_jaccard`` — exact word-n-gram Jaccard over candidate pairs
  produced by a shingle-inverted-index self-join. Quadratic in the
  worst case: the ground-truth / small-corpus tool, and the verifier
  for the sketch methods below.
* ``minhash_lsh`` — MinHash signatures + banded LSH: near-dup pairs in
  ~O(corpus) with tunable recall. The 100 TB scale path. Deterministic:
  hash family is ``xxhash64(seed_i ‖ shingle)``, no RNG.
* ``simhash`` — 64-bit SimHash fingerprints + hamming-ball candidate
  join via band keys. Cheapest sketch; one fingerprint per doc.
* ``embedding_cosine`` — semantic near-dup via cosine similarity over
  an embedding column, LSH-bucketed (random hyperplanes, fixed seed)
  with exact verification inside buckets.

Each returns either the survivors or the duplicate *pairs* — pairs
compose with ``exact``-style winner selection downstream.
"""

from __future__ import annotations

import os
from typing import List, Optional

from pyspark.sql import DataFrame, Window, functions as F


# --------------------------------------------------------------- exact
def exact(
    df: DataFrame,
    key_columns: List[str],
    order_by: Optional[str] = None,
) -> DataFrame:
    """Keep one row per key. With ``order_by``, the minimum of that
    column wins (deterministic); otherwise an arbitrary row (plain
    ``dropDuplicates`` — cheaper, no window)."""
    if order_by is None:
        return df.dropDuplicates(key_columns)
    w = Window.partitionBy(*key_columns).orderBy(F.col(order_by).asc())
    return (
        df.withColumn("__getl_rn", F.row_number().over(w))
        .where(F.col("__getl_rn") == 1)
        .drop("__getl_rn")
    )


# ------------------------------------------------------------ shingling
from getl_spark.common.scale import parallelize as _parallelize, pin, local_df, run_concurrent  # noqa: E402


def _shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, shingle) with distinct word-n-gram shingles per doc.

    Built-ins only: split → transform over a slide window → explode.
    """
    df = _parallelize(df)
    words = F.split(F.lower(F.col(text_col)), r"\s+")
    num = F.greatest(F.size(words) - F.lit(n - 1), F.lit(0))
    # sequence(0, -1) generates a DESCENDING [0, -1] (Spark's sequence
    # never yields empty), so docs shorter than n words would feed
    # slice() a start of 0 and crash the task — clamp the index range
    # to one element and swap in a typed empty array for short docs
    idx = F.sequence(F.lit(0), F.greatest(num, F.lit(1)) - F.lit(1))
    grams_all = F.transform(
        idx,
        lambda i: F.concat_ws(" ", F.slice(words, i + F.lit(1), F.lit(n))),
    )
    grams = F.when(num > F.lit(0), grams_all).otherwise(F.slice(grams_all, 1, 0))
    # Explode the expression DIRECTLY — naming it in an intermediate
    # column makes InferFiltersFromGenerate add a size(col)>0 filter
    # that gets substituted + pushed to the scan, recomputing the whole
    # shingle expression once per row on the narrow pre-repartition side.
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(grams)).alias("shingle"),
    )


def ngram_jaccard(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_df: Optional[int] = None,
) -> DataFrame:
    """Exact all-pairs word-n-gram Jaccard ≥ threshold.

    Inverted-index self-join: pairs sharing at least one shingle are
    the only candidates (Jaccard > 0 requires a shared shingle), so
    the join is |index| * avg-posting-length, not |docs|².
    Returns ``(id_a, id_b, jaccard)`` with ``id_a < id_b``.

    ``max_df`` caps posting-list length: shingles appearing in more
    than ``max_df`` documents are dropped from *candidate generation*
    (the standard document-frequency cutoff — one ubiquitous shingle
    otherwise creates a near-quadratic skew key in the self-join).
    Jaccard values for surviving candidates stay exact because the
    intersection is re-counted against the FULL shingle table. The only
    recall loss: a pair whose every shared shingle has df > max_df —
    set ``max_df`` above the largest expected duplicate-cluster size.

    Shingles are xxhash64'd to 8-byte longs before the self-join: the
    shuffle key shrinks from ~n-word strings to a fixed-width long and
    the join compares integers, which measures ~40% faster at sf0.1 and
    cuts shuffle bytes proportionally at scale. Per-doc sets are
    distinct'd on the string BEFORE hashing, so counts are exact unless
    two distinct shingles collide in 64 bits (P ≈ d²/2⁶⁵ — negligible
    against any corpus that fits in a datacenter).
    """
    inter, sizes = _pair_intersections(df, id_col, text_col, n, max_df)
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("size", "size_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("size", "size_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("size_a") + F.col("size_b") - F.col("inter")).cast("double"),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _pair_intersections(df, id_col, text_col, n, max_df):
    """Shared inverted-index candidate machinery for the exact
    all-pairs set-overlap family (``ngram_jaccard``,
    ``containment_pairs``): returns the undirected per-pair shingle
    intersection counts (``id_a < id_b``) and per-doc set sizes. See
    ``ngram_jaccard``'s docstring for the max_df cap and xxhash64
    key-shrinking rationale."""
    # pin (not cache): truncates lineage so the multi-way reuse
    # below plans against a materialized stub, and the blocks are
    # freed when the DataFrame is dereferenced — cache() persisted for
    # the session lifetime unless manually unpersisted
    shingles = (
        _shingles(df, id_col, text_col, n)
        .select("id", F.xxhash64("shingle").alias("shingle"))
        .transform(pin)
    )
    return _set_pair_intersections(shingles, max_df)


def _set_pair_intersections(shingles, max_df):
    """Inverted-index exact set-overlap core over a pinned
    ``(id, shingle)`` token table (distinct per doc): per-pair
    intersection counts (``id_a < id_b``) + per-doc set sizes.
    Shared by the n-gram family above and ``cdc_pairs`` below."""
    sizes = shingles.groupBy("id").agg(F.count("*").alias("size"))
    if max_df is not None:
        rare = (
            shingles.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") <= max_df)
            .select("shingle")
        )
        index = shingles.join(rare, "shingle")
        candidates = (
            index.withColumnRenamed("id", "id_a")
            .join(index.withColumnRenamed("id", "id_b"), "shingle")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )
        # exact intersection over the uncapped shingle sets
        inter = (
            candidates.join(shingles.withColumnRenamed("id", "id_a"), "id_a")
            .join(
                shingles.withColumnRenamed("id", "id_b").withColumnRenamed(
                    "shingle", "shingle_b"
                ),
                "id_b",
            )
            .where(F.col("shingle") == F.col("shingle_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("inter"))
        )
    else:
        left = shingles.withColumnRenamed("id", "id_a")
        right = shingles.withColumnRenamed("id", "id_b")
        inter = (
            left.join(right, "shingle")
            .where(F.col("id_a") < F.col("id_b"))
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("inter"))
        )
    return inter, sizes


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_df: Optional[int] = None,
) -> DataFrame:
    """Exact all-pairs word-n-gram CONTAINMENT ≥ threshold — the
    asymmetric companion to ``ngram_jaccard``: containment(A in B) =
    |A∩B| / |A|, so a short document quoted or excerpted inside a much
    longer one scores near 1 even though their Jaccard is tiny (the
    union is dominated by the container). The standard signal for
    quote/subset dedup in training corpora (Broder 1997's containment,
    the same family as the resemblance the Jaccard path computes).

    Returns directed ``(contained_id, container_id, containment)``
    rows — both directions of a pair can appear (mutual containment =
    near-duplicate). Machinery (inverted-index candidates, ``max_df``
    posting cap, xxhash64 key shrinking) is shared with
    ``ngram_jaccard`` via ``_pair_intersections``: the undirected
    intersection is computed ONCE per candidate pair and both directed
    ratios derive from it, so the asymmetric output costs no second
    self-join.
    """
    inter, sizes = _pair_intersections(df, id_col, text_col, n, max_df)
    joined = inter.join(
        sizes.withColumnRenamed("id", "id_a").withColumnRenamed("size", "size_a"),
        "id_a",
    ).join(
        sizes.withColumnRenamed("id", "id_b").withColumnRenamed("size", "size_b"),
        "id_b",
    )
    a_in_b = joined.select(
        F.col("id_a").alias("contained_id"),
        F.col("id_b").alias("container_id"),
        F.round(F.col("inter") / F.col("size_a").cast("double"), 6).alias(
            "containment"
        ),
    )
    b_in_a = joined.select(
        F.col("id_b").alias("contained_id"),
        F.col("id_a").alias("container_id"),
        F.round(F.col("inter") / F.col("size_b").cast("double"), 6).alias(
            "containment"
        ),
    )
    return a_in_b.unionByName(b_in_a).where(
        F.col("containment") >= threshold
    )


def corpus_dup_report(
    df: DataFrame,
    text_col: str = "text",
    url_col: Optional[str] = None,
    round_to: int = 6,
) -> DataFrame:
    """One-scan "how dirty is this crawl" summary — the first-look
    readout BEFORE choosing a dedup strategy: exact-duplicate rate
    (normalized-text fingerprint), template-duplicate rate
    (slot-masked ``text.template_key`` — catches "Order #8812
    shipped" boilerplate exact dedup misses), and, with ``url_col``,
    the canonical-URL duplicate rate (the FineWeb first pass). Each
    rate is ``1 − distinct/total``: the fraction of rows that are
    redundant copies under that signal, so the gap between the rates
    tells you which pass pays (template ≫ exact → run
    ``dedup.by_template`` first; URL ≈ exact → the crawl already
    URL-dedups).

    Output is ONE row: ``(n_docs, n_unique_exact, exact_dup_rate,
    n_unique_template, template_dup_rate[, n_with_url, n_unique_url,
    url_dup_rate])``.

    Scale shape: one pass computing the key columns at scan speed
    (md5 / regexp chains — the same expressions the dedup operators
    use), then ONE aggregate with exact ``countDistinct`` per signal
    (Spark plans multi-distinct as a single grouping-sets expansion —
    rows × #signals through one exchange, still linear); the result
    is 1 row. For a quick look at petabyte scale, sample first with
    ``sample.hash_fraction`` — rates are ratio estimates and
    transfer.
    """
    from getl_spark.functions import text as _text

    d = _text.fingerprint(df, text_col, "__cd_fp")
    d = _text.template_key(d, text_col, "__cd_tpl")
    aggs = [
        F.count(text_col).cast("bigint").alias("n_docs"),
        F.countDistinct("__cd_fp").cast("bigint").alias("n_unique_exact"),
        F.countDistinct("__cd_tpl").cast("bigint").alias("n_unique_template"),
    ]
    if url_col is not None:
        d = _text.canonicalize_url(d, url_col, "__cd_url")
        aggs += [
            F.count("__cd_url").cast("bigint").alias("n_with_url"),
            F.countDistinct("__cd_url").cast("bigint").alias("n_unique_url"),
        ]
    agg = d.where(F.col(text_col).isNotNull()).agg(*aggs)
    n = F.col("n_docs").cast("double")
    out = [
        "n_docs",
        "n_unique_exact",
        F.round(
            F.when(n > 0, 1 - F.col("n_unique_exact") / n), round_to
        ).alias("exact_dup_rate"),
        "n_unique_template",
        F.round(
            F.when(n > 0, 1 - F.col("n_unique_template") / n), round_to
        ).alias("template_dup_rate"),
    ]
    if url_col is not None:
        nu = F.col("n_with_url").cast("double")
        out += [
            "n_with_url",
            "n_unique_url",
            F.round(
                F.when(nu > 0, 1 - F.col("n_unique_url") / nu), round_to
            ).alias("url_dup_rate"),
        ]
    return agg.select(*out)


def shingle_profile(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Document-frequency profile of the corpus's word-n-gram shingles
    — the pre-join diagnostic for sizing ``max_df`` BEFORE running any
    inverted-index self-join (``ngram_jaccard``, ``containment_pairs``,
    ``fuzzy_join``): a shingle appearing in ``d`` documents generates
    ``d·(d−1)/2`` candidate pairs, so a handful of boilerplate
    shingles can dominate the entire join. One row per power-of-two
    df bucket: ``(df_lo, df_hi, n_shingles, posting_rows, pair_mass,
    cum_pair_frac)`` where ``pair_mass`` is the candidate pairs that
    bucket's shingles would emit and ``cum_pair_frac`` the cumulative
    share from the rarest buckets up — read it as "``max_df = df_hi``
    keeps this fraction of the self-join's work". Run at a sampled SF
    first; the df distribution's SHAPE (Zipf tail) is what transfers.

    Bucket index is ``len(bin(df)) - 1`` — pure integer arithmetic,
    bit-identical across engines (``floor(log2 d)`` can misround at
    exact powers of two when log2 is computed as ln d / ln 2).

    Scale shape: one shingle-keyed shuffle (the same exchange the
    self-join would pay for candidate generation — this profiles at
    strictly lower cost than the join it predicts, since postings
    reduce to counts instead of joining), a ≤64-row bucket aggregate,
    and the cumulative share on the distributed prefix scan with a
    1-row total broadcast. ``pair_mass`` is an integer-valued double:
    exact to 2^53 candidate pairs per bucket.
    """
    from getl_spark.common.scale import grouped_prefix_sum

    sh = _shingles(df, id_col, text_col, n)
    dfreq = sh.groupBy("shingle").agg(
        F.count("*").cast("bigint").alias("dfreq")
    )
    buckets = dfreq.groupBy(
        (F.length(F.bin("dfreq")) - 1).cast("int").alias("bucket")
    ).agg(
        F.count("*").cast("bigint").alias("n_shingles"),
        F.sum("dfreq").cast("bigint").alias("posting_rows"),
        # dfreq cast to double BEFORE the product: a bigint d*(d-1)
        # overflows at d ~ 3e9 documents, inside 100 TB range
        F.sum(F.col("dfreq").cast("double") * (F.col("dfreq") - 1) / F.lit(2.0))
        .cast("double")
        .alias("pair_mass"),
    )
    # pinned: buckets feeds the prefix scan (range-sampled in an
    # extra pass) AND the total aggregate; unpinned, the full shingle
    # reduction upstream re-evaluates three times (r13). The frame is
    # histogram-bucket-sized
    buckets = pin(buckets)
    cum = grouped_prefix_sum(
        buckets, [], ["bucket"], "pair_mass", "cum_pairs", prepinned=True
    )
    total = buckets.agg(
        F.coalesce(F.sum("pair_mass"), F.lit(0.0)).alias("__sp_total")
    )
    return (
        cum.crossJoin(F.broadcast(total))
        .select(
            # pyspark's shiftleft() only takes a literal bit count —
            # the SQL form accepts a column
            F.expr("shiftleft(CAST(1 AS BIGINT), bucket)")
            .cast("bigint")
            .alias("df_lo"),
            (F.expr("shiftleft(CAST(1 AS BIGINT), bucket + 1)") - 1)
            .cast("bigint")
            .alias("df_hi"),
            "n_shingles",
            "posting_rows",
            "pair_mass",
            F.round(
                F.when(
                    F.col("__sp_total") > 0,
                    F.col("cum_pairs") / F.col("__sp_total"),
                ),
                6,
            ).alias("cum_pair_frac"),
        )
        .orderBy("df_lo")
    )


# ------------------------------------------------------------- minhash
def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    shingles: Optional[DataFrame] = None,
) -> DataFrame:
    """(id, sig: array<bigint>) MinHash signatures.

    Hash family: the shingle string is xxhash64'd to a long ONCE, then
    hash i is ``xxhash64(i, base)`` over that fixed-width long —
    deterministic, seedless, and ~10× cheaper than re-hashing the
    string num_hashes times. One shuffle (groupBy id) regardless of
    num_hashes. A pre-hashed shingle table (bigint ``shingle``
    column, as ``minhash_lsh`` shares) is used as the base directly —
    same signature values, one less hash pass.
    """
    if shingles is None:
        shingles = _shingles(df, id_col, text_col, n)
    base = (
        F.col("shingle")
        if dict(shingles.dtypes).get("shingle") == "bigint"
        else F.xxhash64("shingle")
    )
    hashed = shingles.select("id", base.alias("base")).select(
        "id",
        F.array(
            *[F.xxhash64(F.lit(i), F.col("base")) for i in range(num_hashes)]
        ).alias("hashes"),
    )
    mins = [F.min(F.col("hashes")[i]).alias(f"h{i}") for i in range(num_hashes)]
    return (
        hashed.groupBy("id")
        .agg(*mins)
        .select("id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))
    )


def _band_keys(sigs: DataFrame, bands: int, rows: int) -> DataFrame:
    """(id, band, key) — one xxhash64 key per band over that band's
    signature slice."""
    return sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(*[F.col("sig")[b * rows + r] for r in range(rows)]).alias(
                            "key"
                        ),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", "bk.band", "bk.key")


def minhash_lsh(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    verify: bool = True,
) -> DataFrame:
    """Near-duplicate pairs via banded MinHash LSH.

    ``bands`` bands of ``num_hashes/bands`` rows each; candidate pairs
    collide in ≥1 band (p ≈ 1-(1-s^r)^b). With ``verify`` the
    candidates are re-checked with exact n-gram Jaccard and filtered
    to ``threshold`` — the standard sketch-then-verify pipeline that
    scales to corpus sizes where all-pairs is impossible.
    """
    rows = num_hashes // bands
    # One materialized shingle table feeds both the signatures and the
    # exact verification — shingling is the dominant cost, never do it
    # twice. pin (not cache) also truncates lineage, so the
    # LSH self-join and verify join don't each drag a duplicated
    # 64-wide expression tree through the optimizer. (pin's durability
    # ladder handles executor loss: reliable checkpoint when a
    # checkpoint dir is set, replicated persist otherwise.)
    # Stored pre-hashed (xxhash64 long): signatures use it as their
    # base hash unchanged, and the verify join shuffles 8-byte keys
    # instead of n-word strings (per-doc distinct'd on the string
    # beforehand, so counts stay exact short of a 64-bit collision).
    shingles = (
        _shingles(df, id_col, text_col, n)
        .select("id", F.xxhash64("shingle").alias("shingle"))
        .transform(pin)
    )
    sigs = minhash_signatures(df, id_col, text_col, n, num_hashes, shingles=shingles)
    banded = _band_keys(sigs, bands, rows)
    # band keys are tiny (docs × bands rows); materializing them keeps
    # the self-join plan to two table stubs instead of two signature
    # pipelines
    banded = banded.transform(pin)
    candidates = (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "key"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    if not verify:
        return candidates
    sizes = shingles.groupBy("id").agg(F.count("*").alias("size"))
    left = shingles.withColumnRenamed("id", "id_a")
    right = shingles.withColumnRenamed("id", "id_b")
    inter = (
        candidates.join(left, "id_a")
        .join(right.withColumnRenamed("shingle", "shingle_b"), "id_b")
        .where(F.col("shingle") == F.col("shingle_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("size", "size_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("size", "size_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("size_a") + F.col("size_b") - F.col("inter")).cast("double"),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# -------------------------------------------------------------- simhash
def simhash(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
) -> DataFrame:
    """(id, simhash: bigint) — 64-bit SimHash over whitespace tokens.

    Each token hashes once (``xxhash64``); bit b of the fingerprint is
    set when more than half the tokens have bit b set (equivalent to
    the classic sign-of-±1-sum definition). The per-row aggregate input
    is a plain ``(h >> b) & 1`` — a conditional (CASE) per bit per row
    costs ~7× more in codegen'd evaluation, measured at sf0.1.
    """
    tokens_df = (
        _parallelize(df).select(
            F.col(id_col).alias("id"),
            F.explode(F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))).alias(
                "token"
            ),
        )
        .withColumn("h", F.xxhash64("token"))
    )
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))).alias(f"b{b}")
        for b in range(bits)
    ]
    agg = tokens_df.groupBy("id").agg(*aggs)
    fingerprint = None
    for b in range(bits):
        contrib = F.when(
            F.col(f"b{b}") * 2 > F.col("__n"),
            F.shiftleft(F.lit(1).cast("bigint"), b),
        ).otherwise(F.lit(0).cast("bigint"))
        fingerprint = contrib if fingerprint is None else fingerprint.bitwiseOR(contrib)
    return agg.select("id", fingerprint.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bands: int = 4,
    max_chunk_df: Optional[int] = None,
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming.

    Pigeonhole banding: split the 64-bit fingerprint into ``bands``
    chunks; any pair within the hamming ball agrees exactly on ≥1
    chunk, so candidates come from equi-joins on chunk values —
    no quadratic scan. Exact popcount verification follows.

    ``max_chunk_df`` caps candidate-bucket size, the same document-
    frequency cutoff ``ngram_jaccard``'s ``max_df`` applies to shingle
    postings: a ``(band, chunk)`` value shared by more than
    ``max_chunk_df`` fingerprints is dropped from candidate generation,
    so one popular chunk value can't emit O(bucket²) joined rows. With
    ``bands=4`` the 16-bit chunks give *random* pairs a ~bands·n²/2¹⁶
    collision rate — at 10⁹ docs that is ~10¹⁴ pre-filter rows, so at
    that scale set a cap (10⁴ is generous: random buckets average
    n/2¹⁶ ≈ 15k at 10⁹ docs, set it above that only for corpora with
    massive true-duplicate clusters). Recall contract: a qualifying
    pair is missed only if EVERY chunk the two fingerprints agree on is
    hot — for non-identical near-dups agreeing chunks are
    content-specific and cold; the pairs a cap does drop are inside
    giant identical-fingerprint clusters, which ``dedup.exact`` on the
    fingerprint (or ``text.fingerprint``) removes more cheaply first.
    """
    # fingerprints are one row per doc — materialize so the self-join
    # below doesn't duplicate (and re-optimize/re-run) the 64-wide
    # aggregation pipeline on both sides
    return hamming_pairs(
        simhash(df, id_col, text_col).transform(pin),
        id_col="id",
        sig_col="simhash",
        max_hamming=max_hamming,
        bands=bands,
        max_chunk_df=max_chunk_df,
    )


def hamming_pairs(
    sigs: DataFrame,
    id_col: str = "id",
    sig_col: str = "simhash",
    max_hamming: int = 3,
    bands: int = 4,
    max_chunk_df: Optional[int] = None,
) -> DataFrame:
    """Pairs with hamming distance ≤ ``max_hamming`` between ANY
    precomputed 64-bit signatures — the shared scale core under
    :func:`simhash_pairs` (text fingerprints) and
    ``multimodal.phash_pairs`` (image perceptual hashes). Input is one
    row per item; callers that compute ``sigs`` through a non-trivial
    pipeline should pin (``common.scale.pin``) it first so the self-join
    doesn't re-run the signature computation on both sides. Banding,
    the ``max_chunk_df`` hot-bucket cap, and the recall contract are
    exactly as documented on ``simhash_pairs``.
    """
    width = 64 // bands
    mask = (1 << width) - 1
    banded = sigs.select(
        F.col(id_col).alias("id"),
        F.col(sig_col).alias("__sig"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col(sig_col), b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bc"),
    ).select("id", "__sig", "bc.band", "bc.chunk")
    if max_chunk_df is not None:
        cold = (
            banded.groupBy("band", "chunk")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") <= max_chunk_df)
            .select("band", "chunk")
        )
        banded = banded.join(cold, ["band", "chunk"])
    # The banded table is tiny (docs × bands) so AQE would coalesce the
    # self-join to one task — but its OUTPUT is O(collisions), which on
    # near-duplicate-rich corpora is millions of rows. Explicitly
    # repartition on the join key to keep the collision work wide.
    banded = banded.repartition(
        sigs.sparkSession.sparkContext.defaultParallelism, "band", "chunk"
    )
    # hamming filter BEFORE the cross-band dedup: popcount per joined
    # row is cheap, while distinct over every band collision (which can
    # be an order of magnitude larger than the survivors) is not
    return (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "chunk"])
        .where(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(
                F.col("a.__sig").bitwiseXOR(F.col("b.__sig"))
            ).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ------------------------------------------------- incremental dedup
def against_index(
    new_df: DataFrame,
    index_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fingerprint_col: str = "fingerprint",
    near_threshold: Optional[float] = None,
    n: int = 3,
    method: str = "exact",
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Incremental-corpus dedup: keep only new documents that are
    neither exact nor (optionally) near duplicates of an existing
    indexed corpus.

    ``index_df`` is the persisted corpus index — at minimum a
    ``fingerprint`` column (md5 of normalized text, cheap to store for
    trillions of docs); with ``near_threshold`` set it must also carry
    ``text`` for the shingle comparison. Exact phase is a broadcast-or-
    shuffle anti-join on the fingerprint; near phase reuses the
    inverted-index shingle join restricted to (new × index) pairs —
    or, with ``method='minhash'``, banded MinHash LSH candidates
    (``num_hashes``/``bands``) with the same exact-Jaccard
    verification, whose cost tracks true similarity density instead of
    posting-length products (the scale path when the index is
    duplicate-rich or the increment is large). This is the daily-ingest
    shape of a training-corpus pipeline: index once, dedup each
    increment against it.
    """
    if method not in ("exact", "minhash"):
        raise ValueError(f"against_index: unknown method '{method}' (exact|minhash)")
    if method == "minhash" and num_hashes % bands:
        raise ValueError(
            f"against_index: num_hashes ({num_hashes}) must be divisible by "
            f"bands ({bands}) — {num_hashes % bands} hashes would be silently "
            "dropped and the documented LSH recall curve broken"
        )
    from getl_spark.functions.text import fingerprint as fp

    new_with_fp = fp(new_df, text_col, fingerprint_col)
    if fingerprint_col not in index_df.columns:
        index_df = fp(index_df, text_col, fingerprint_col)
    survivors = new_with_fp.join(
        index_df.select(fingerprint_col), fingerprint_col, "anti"
    )
    if near_threshold is None:
        return survivors.drop(fingerprint_col)

    # hashed 8-byte shingle keys: same join result (per-doc sets are
    # distinct'd on the string first), a fraction of the shuffle bytes
    new_sh = _shingles(survivors, id_col, text_col, n).select(
        "id", F.xxhash64("shingle").alias("shingle")
    )
    idx_sh = _shingles(index_df, id_col, text_col, n).select(
        "id", F.xxhash64("shingle").alias("shingle")
    )
    if method == "minhash":
        new_sh = new_sh.transform(pin)
        idx_sh = idx_sh.transform(pin)
        rows = num_hashes // bands
        banded_new = _band_keys(
            minhash_signatures(survivors, id_col, text_col, n, num_hashes, shingles=new_sh),
            bands,
            rows,
        ).withColumnRenamed("id", "id_a")
        banded_idx = _band_keys(
            minhash_signatures(index_df, id_col, text_col, n, num_hashes, shingles=idx_sh),
            bands,
            rows,
        ).withColumnRenamed("id", "id_b")
        candidates = (
            banded_new.join(banded_idx, ["band", "key"]).select("id_a", "id_b").distinct()
        )
        # explicit two-key equi-join (id_b AND shingle) — plan safety
        # independent of Catalyst's filter-into-join fold
        inter = (
            candidates.join(new_sh.withColumnRenamed("id", "id_a"), "id_a")
            .join(idx_sh.withColumnRenamed("id", "id_b"), ["id_b", "shingle"])
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("inter"))
        )
    else:
        inter = (
            new_sh.withColumnRenamed("id", "id_a")
            .join(idx_sh.withColumnRenamed("id", "id_b"), "shingle")
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("inter"))
        )
    new_sizes = new_sh.groupBy("id").agg(F.count("*").alias("size_a"))
    idx_sizes = idx_sh.groupBy("id").agg(F.count("*").alias("size_b"))
    near_dups = (
        inter.join(new_sizes.withColumnRenamed("id", "id_a"), "id_a")
        .join(idx_sizes.withColumnRenamed("id", "id_b"), "id_b")
        .where(
            F.col("inter")
            / (F.col("size_a") + F.col("size_b") - F.col("inter")).cast("double")
            >= near_threshold
        )
        .select(F.col("id_a").alias(id_col))
        .distinct()
    )
    return survivors.join(near_dups, id_col, "anti").drop(fingerprint_col)


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    right_id_col: Optional[str] = None,
    right_text_col: Optional[str] = None,
    n: int = 3,
    threshold: float = 0.5,
    max_df: Optional[int] = None,
    method: str = "exact",
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Fuzzy (approximate-text) join between two tables: all cross-table
    pairs with word-``n``-gram Jaccard ≥ ``threshold``. The entity-
    resolution shape — match scraped records against a canonical table,
    crawl snapshots against each other, product titles across feeds.

    ``method='exact'`` (default): same inverted-index architecture as
    ``ngram_jaccard`` but across two tables — candidates are pairs
    sharing ≥1 shingle (cost Σ_shingle df_left·df_right, never
    |left|·|right|), shingle keys are xxhash64'd to 8-byte longs, and
    with ``max_df`` hot shingles are dropped from *candidate
    generation* only (intersections re-counted exactly on the full
    shingle tables). Full recall; the cost grows with the product of
    per-shingle frequencies, so duplicate-dense corpora pay
    quadratically in the duplication factor (measured: 10 exact copies
    → ~100× candidates).

    ``method='minhash'``: banded MinHash LSH candidates across the two
    tables (``num_hashes``/``bands``, the ``minhash_lsh`` machinery),
    then the SAME exact-Jaccard verification — candidate volume tracks
    true cross-table similarity density instead of posting-length
    products, so this is the scale path for duplicate-heavy inputs.
    Recall follows the LSH curve p ≈ 1-(1-s^r)^b; precision stays
    exact.

    Returns ``(id_a, id_b, jaccard)`` with ``id_a`` from ``left``.
    YAML-callable with ``Input: [Left, Right]`` inside
    ``transform::generic``.
    """
    if method not in ("exact", "minhash"):
        raise ValueError(f"fuzzy_join: unknown method '{method}' (exact|minhash)")
    if method == "minhash":
        if num_hashes % bands:
            raise ValueError(
                f"fuzzy_join: num_hashes ({num_hashes}) must be divisible by "
                f"bands ({bands}) — {num_hashes % bands} hashes would be "
                "silently dropped and the documented LSH recall curve broken"
            )
        if max_df is not None:
            raise ValueError(
                "fuzzy_join: max_df only applies to method='exact' (it caps "
                "inverted-index posting lists; minhash candidate generation "
                "has no posting lists to cap) — drop max_df or use "
                "method='exact'"
            )
    inter, sizes_a, sizes_b = _cross_intersections(
        left, right, id_col, text_col, right_id_col, right_text_col,
        n, max_df, method, num_hashes, bands,
    )
    return (
        inter.join(sizes_a.withColumnRenamed("id", "id_a"), "id_a")
        .join(sizes_b.withColumnRenamed("id", "id_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter")
                / (F.col("size_a") + F.col("size_b") - F.col("inter")).cast(
                    "double"
                ),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _cross_intersections(
    left, right, id_col, text_col, right_id_col, right_text_col,
    n, max_df, method, num_hashes, bands,
):
    """Shared cross-table candidate machinery for ``fuzzy_join`` and
    ``containment_join``: per-pair shingle intersection counts plus
    per-side set sizes (exact or MinHash-banded candidates — see
    ``fuzzy_join``'s docstring for the cost model)."""
    right_id_col = right_id_col or id_col
    right_text_col = right_text_col or text_col
    sh_a = (
        _shingles(left, id_col, text_col, n)
        .select("id", F.xxhash64("shingle").alias("shingle"))
        .transform(pin)
    )
    sh_b = (
        _shingles(right, right_id_col, right_text_col, n)
        .select("id", F.xxhash64("shingle").alias("shingle"))
        .transform(pin)
    )
    sizes_a = sh_a.groupBy("id").agg(F.count("*").alias("size_a"))
    sizes_b = sh_b.groupBy("id").agg(F.count("*").alias("size_b"))
    left_sh = sh_a.withColumnRenamed("id", "id_a")
    right_sh = sh_b.withColumnRenamed("id", "id_b")
    if method == "minhash":
        rows = num_hashes // bands
        banded_a = _band_keys(
            minhash_signatures(left, id_col, text_col, n, num_hashes, shingles=sh_a),
            bands,
            rows,
        ).withColumnRenamed("id", "id_a")
        banded_b = _band_keys(
            minhash_signatures(
                right, right_id_col, right_text_col, n, num_hashes, shingles=sh_b
            ),
            bands,
            rows,
        ).withColumnRenamed("id", "id_b")
        candidates = (
            banded_a.join(banded_b, ["band", "key"])
            .select("id_a", "id_b")
            .distinct()
        )
        # explicit two-key equi-join (id_b AND shingle) so the plan's
        # safety does not depend on Catalyst folding a post-filter into
        # the join keys
        inter = (
            candidates.join(left_sh, "id_a")
            .join(right_sh, ["id_b", "shingle"])
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("inter"))
        )
    elif max_df is not None:
        df_a = sh_a.groupBy("shingle").agg(F.count("*").alias("dfa"))
        df_b = sh_b.groupBy("shingle").agg(F.count("*").alias("dfb"))
        rare = (
            df_a.join(df_b, "shingle")
            .where((F.col("dfa") <= max_df) & (F.col("dfb") <= max_df))
            .select("shingle")
        )
        candidates = (
            left_sh.join(rare, "shingle")
            .join(right_sh.join(rare, "shingle"), "shingle")
            .select("id_a", "id_b")
            .distinct()
        )
        inter = (
            candidates.join(left_sh, "id_a")
            .join(right_sh, ["id_b", "shingle"])
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("inter"))
        )
    else:
        inter = (
            left_sh.join(right_sh, "shingle")
            .groupBy("id_a", "id_b")
            .agg(F.count("*").alias("inter"))
        )
    return inter, sizes_a, sizes_b


def containment_join(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    right_id_col: Optional[str] = None,
    right_text_col: Optional[str] = None,
    n: int = 3,
    threshold: float = 0.8,
    max_df: Optional[int] = None,
    method: str = "exact",
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Cross-table asymmetric containment: all (left, right) pairs
    where containment(left in right) = |A∩B| / |A| ≥ ``threshold`` —
    LEFT is the contained side. The decontamination-grade matching
    shape: "which training documents CONTAIN this eval/benchmark
    document" needs containment of the eval doc, not Jaccard (a short
    eval prompt pasted into a long page has near-zero Jaccard but
    containment ≈ 1); also quote attribution, excerpt provenance, and
    canonical-source matching.

    Same candidate machinery as ``fuzzy_join`` (shared through
    ``_cross_intersections``): exact inverted-index candidates (or
    MinHash-banded with ``method='minhash'`` — note the LSH recall
    curve is calibrated for *resemblance*, so for low-Jaccard
    containment pairs prefer ``method='exact'`` with ``max_df``), then
    the exact directed ratio. Returns ``(id_a, id_b, containment)``
    with ``id_a`` from ``left``. YAML-callable with
    ``Input: [Left, Right]``.
    """
    if method not in ("exact", "minhash"):
        raise ValueError(
            f"containment_join: unknown method '{method}' (exact|minhash)"
        )
    if method == "minhash":
        if num_hashes % bands:
            raise ValueError(
                f"containment_join: num_hashes ({num_hashes}) must be "
                f"divisible by bands ({bands})"
            )
        if max_df is not None:
            raise ValueError(
                "containment_join: max_df only applies to method='exact'"
            )
    inter, sizes_a, _ = _cross_intersections(
        left, right, id_col, text_col, right_id_col, right_text_col,
        n, max_df, method, num_hashes, bands,
    )
    return (
        inter.join(sizes_a.withColumnRenamed("id", "id_a"), "id_a")
        .withColumn(
            "containment",
            F.round(F.col("inter") / F.col("size_a").cast("double"), 6),
        )
        .where(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    )


# ----------------------------------------------------- embedding cosine
def minhash_params(
    threshold: float,
    target_recall: float = 0.95,
    max_hashes: int = 256,
    noise_jaccard: float = 0.2,
) -> dict:
    """Choose ``(num_hashes, bands)`` for ``minhash_lsh`` from the
    dedup threshold and a signature-size budget — the banding S-curve,
    executable (companion to ``embedding_lsh_params`` and
    ``shingle_profile`` in the pre-job sizing kit).

    Model: a true pair at Jaccard ``threshold`` agrees on one MinHash
    row with probability ``threshold``, matches a band of r rows with
    ``threshold^r``, and is caught by at least one of b bands with
    recall ``1-(1-threshold^r)^b`` (monotone in Jaccard, so this is
    the worst case over everything above the threshold). A background
    pair at ``noise_jaccard`` triggers a band with ``noise_jaccard^r``
    — more rows per band cut false candidates exponentially but demand
    more bands (linear signature cost) for the same recall. The helper
    returns the LARGEST r whose minimal recall-meeting b fits
    ``b*r <= max_hashes`` (sharpest S-curve the budget affords), i.e.
    the fewest false candidates; raises if even r=1 cannot meet the
    recall within the budget.

    Returns ``{"num_hashes", "bands", "rows_per_band", "est_recall",
    "noise_catch_rate"}`` — ``num_hashes = bands * rows_per_band``
    exactly, satisfying ``minhash_lsh``'s divisibility contract, and
    ``noise_catch_rate`` the probability a ``noise_jaccard`` pair
    becomes a candidate at all.
    """
    import math

    if not 0 < threshold < 1:
        raise ValueError("minhash_params: threshold must be in (0, 1)")
    if not 0 < target_recall < 1:
        raise ValueError("minhash_params: target_recall must be in (0, 1)")
    if not 0 <= noise_jaccard < threshold:
        raise ValueError(
            "minhash_params: noise_jaccard must be in [0, threshold)"
        )
    best = None
    for r in range(1, max_hashes + 1):
        p_band = threshold**r
        if p_band < 1e-12:  # 1-p underflows to 1.0; larger r only worse
            break
        b = max(
            1,
            math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - p_band)),
        )
        if b * r <= max_hashes:
            best = (r, b)  # r ascending: the last feasible r is largest
    if best is None:
        raise ValueError(
            f"minhash_params: recall {target_recall} at threshold "
            f"{threshold} needs more than {max_hashes} hashes even with "
            "1-row bands; raise max_hashes or lower target_recall"
        )
    r, b = best
    return {
        "num_hashes": b * r,
        "bands": b,
        "rows_per_band": r,
        "est_recall": round(1.0 - (1.0 - threshold**r) ** b, 4),
        "noise_catch_rate": round(1.0 - (1.0 - noise_jaccard**r) ** b, 6),
    }


def embedding_lsh_params(
    n_docs: int,
    candidate_budget: int,
    threshold: float = 0.95,
    target_recall: float = 0.95,
    max_planes: int = 32,
) -> dict:
    """Choose ``(bands, planes_per_band)`` for ``embedding_cosine_pairs``
    from corpus size and a candidate-pair budget — the scaling formula,
    executable.

    Model: a true pair at cosine ``threshold`` agrees on one sign bit
    with p = 1 - θ/π (θ = arccos threshold); a band of r planes matches
    with p^r, and recall over b bands is 1-(1-p^r)^b. A *random* pair
    matches a band with ~2^-r, so expected candidates ≈ b·n²/2^(r+1).
    The helper picks the smallest r whose minimal recall-meeting b fits
    the budget — more planes per band cut candidates exponentially but
    demand more bands (linear cost in key rows) for the same recall.

    Returns ``{"bands", "planes_per_band", "est_candidates",
    "est_recall"}``; raises if even ``max_planes`` can't fit the
    budget (corpus too large for the budget — raise one or both).
    """
    import math

    if not 0 < threshold < 1:
        raise ValueError("threshold must be in (0, 1)")
    p_bit = 1.0 - math.acos(threshold) / math.pi
    pairs = n_docs * (n_docs - 1) / 2.0
    for r in range(4, max_planes + 1):
        p_band = p_bit**r
        if p_band <= 0:
            continue
        b = max(1, math.ceil(math.log(1.0 - target_recall) / math.log(1.0 - p_band)))
        est = b * pairs * 2.0**-r
        if est <= candidate_budget:
            return {
                "bands": b,
                "planes_per_band": r,
                "est_candidates": int(est),
                "est_recall": round(1.0 - (1.0 - p_band) ** b, 4),
            }
    raise ValueError(
        f"no (bands ≤ ∞, planes ≤ {max_planes}) fits {n_docs:,} docs in a "
        f"{candidate_budget:,}-candidate budget at recall {target_recall}; "
        "raise the budget, lower target_recall, or pre-partition the corpus"
    )


def embedding_lsh_candidate_estimate(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bands: int = 8,
    planes_per_band: int = 12,
    seed: int = 42,
    sample: int = 10_000,
) -> int:
    """Estimate the candidate-pair count ``embedding_cosine_pairs``
    would generate at these settings, from a bounded sample — run this
    BEFORE a large job to sanity-check the blow-up factor.

    Bucketizes ``sample`` vectors with the same hyperplane family,
    counts Σ c·(c-1)/2 over the sample's band buckets, and scales by
    (n/m)² (bucket occupancy is proportional to corpus size per band
    key). Exact when ``sample >= n``. One scan of the sample, one tiny
    groupBy — driver state is just the bucket histogram.
    """
    from getl_spark.functions.similarity import embedding_dim

    vecs = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")).where(
        F.col("vec").isNotNull()
    )
    n = vecs.count()
    if n == 0:
        return 0
    frac = min(1.0, sample / n)
    sampled = vecs.sample(fraction=frac, seed=seed) if frac < 1.0 else vecs
    dim = embedding_dim(df, vec_col)
    keys_udf = _hyperplane_band_keys(bands, planes_per_band, dim, seed)
    counts = (
        sampled.select(F.posexplode(keys_udf("vec")).alias("band", "key"))
        .groupBy("band", "key")
        .agg(F.count("*").alias("c"))
        .agg(
            F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pairs"),
            F.sum("c").alias("m_rows"),
        )
        .first()
    )
    m_rows = counts["m_rows"] or 0  # Bernoulli sample can return 0 rows
    if not m_rows:
        return 0
    m = m_rows / bands  # actual sampled vector count
    return int((counts["pairs"] or 0) * (n / m) ** 2)


def _hyperplane_band_keys(bands: int, planes_per_band: int, dim: int, seed: int):
    """Vectorized band-key UDF: one Arrow batch → (batch × dim) @
    (dim × bands·r) numpy matmul → per-band sign-bit keys.

    The plane matrix lives in the UDF closure (pickled to executors
    once), so the plane count scales freely with corpus size — unlike
    the literal-expression encoding, whose codegen cost grows with
    ``planes × dim`` and dominated the old single-band implementation.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    rng = np.random.RandomState(seed)
    planes = rng.randn(bands * planes_per_band, dim)
    weights = (1 << np.arange(planes_per_band)).astype("int64")

    def _keys(vecs):
        # reshape: a zero-row batch otherwise yields shape (0,) and the
        # matmul raises; null embeddings must be filtered upstream (a
        # null row here would turn the array into dtype=object)
        mat = np.array(vecs.tolist(), dtype="float64").reshape(-1, dim)
        bits = (mat @ planes.T) >= 0  # (n, bands*r)
        keys = [
            bits[:, b * planes_per_band : (b + 1) * planes_per_band] @ weights
            for b in range(bands)
        ]
        return pd.Series(list(np.stack(keys, axis=1)))

    # explicit signature: the module's `from __future__ import
    # annotations` would stringify pd.Series type hints beyond
    # pandas_udf's resolver
    return pandas_udf(_keys, "array<long>")


def embedding_cosine_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    bands: int = 8,
    planes_per_band: int = 12,
    seed: int = 42,
    brute_force: bool = False,
    dim: Optional[int] = None,
    planes: Optional[int] = None,
) -> DataFrame:
    """Semantic near-dup pairs: cosine(a, b) ≥ threshold.

    Scale path (default): *banded* random-hyperplane LSH, the same
    sketch-then-verify shape as ``minhash_lsh``. Each vector gets
    ``bands`` keys of ``planes_per_band`` sign bits; a pair is a
    candidate if ANY band matches (p ≈ 1-(1-p_bit^r)^b with
    p_bit = 1-θ/π), then candidates are verified with the exact cosine.
    At the defaults (8×12), a cosine-0.95 pair is found with ~97%
    probability while a random pair collides in a band with chance
    2^-12 — candidate volume ≈ b·n²/2^r = n²/512, and both knobs are
    free to grow with corpus size because the planes are applied by a
    vectorized Arrow UDF, not literal expression trees. The single-band
    variant this replaces missed any pair straddling one of its 8
    hyperplanes (recall ≈ 0.43 at θ=18°).

    ``brute_force=True`` skips bucketing (ground truth / small data).

    ``planes=`` (the pre-banding parameter name) is accepted for
    backward compatibility and maps to a single band of that many sign
    bits — equivalent to the old single-band behavior.
    """
    from getl_spark.functions.similarity import cosine_expr, embedding_dim, with_norm

    if planes is not None:
        import warnings

        warnings.warn(
            "embedding_cosine_pairs(planes=...) is deprecated; use "
            "bands=/planes_per_band= (planes=N maps to bands=1, "
            "planes_per_band=N — the old single-band scheme with its "
            "known recall gap on pairs straddling a hyperplane)",
            DeprecationWarning,
            stacklevel=2,
        )
        bands, planes_per_band = 1, int(planes)

    vecs = with_norm(
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")).where(
            F.col("vec").isNotNull()
        )
    )
    if brute_force:
        a = vecs.alias("a")
        b = vecs.alias("b")
        pairs = a.crossJoin(b).where(F.col("a.id") < F.col("b.id"))
    else:
        dim = dim or embedding_dim(df, vec_col)
        keys_udf = _hyperplane_band_keys(bands, planes_per_band, dim, seed)
        # vectors are re-read by the verify join; pin them so the scan
        # and norm computation happen once
        vecs = vecs.transform(pin)
        banded = vecs.select(
            "id", F.posexplode(keys_udf("vec")).alias("band", "key")
        ).transform(pin)  # tiny (n × bands); keeps the self-join to table stubs
        candidates = (
            banded.alias("a")
            .join(banded.alias("b"), ["band", "key"])
            .where(F.col("a.id") < F.col("b.id"))
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct()
        )
        verified = (
            candidates.join(
                vecs.select(
                    F.col("id").alias("id_a"),
                    F.col("vec").alias("a_vec"),
                    F.col("norm").alias("a_norm"),
                ),
                "id_a",
            )
            .join(
                vecs.select(
                    F.col("id").alias("id_b"),
                    F.col("vec").alias("b_vec"),
                    F.col("norm").alias("b_norm"),
                ),
                "id_b",
            )
        )
        return verified.select(
            "id_a",
            "id_b",
            F.round(
                cosine_expr(
                    F.col("a_vec"), F.col("b_vec"), F.col("a_norm"), F.col("b_norm")
                ),
                6,
            ).alias("cosine"),
        ).where(F.col("cosine") >= threshold)
    return pairs.select(
        F.col("a.id").alias("id_a"),
        F.col("b.id").alias("id_b"),
        F.round(
            cosine_expr(
                F.col("a.vec"), F.col("b.vec"), F.col("a.norm"), F.col("b.norm")
            ),
            6,
        ).alias("cosine"),
    ).where(F.col("cosine") >= threshold)


def semantic_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    nlist: int = 64,
    nassign: int = 1,
    seed: int = 42,
    train_limit: int = 10000,
    kmeans_iters: int = 10,
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs: cluster the corpus with
    a k-means coarse quantizer (the same bounded-driver trainer the IVF
    index uses), then verify exact cosine ONLY within clusters —
    ``(id_a, id_b, cosine)`` with cosine ≥ ``threshold``. Feed the
    pairs to ``graph.cluster_components`` / ``dedup_by_component`` to
    pick survivors, exactly like the other dedup families.

    Versus ``embedding_cosine_pairs`` (hyperplane LSH): candidate
    volume is Σ_cells |cell|²/2 instead of b·n²/2^r — *data-adaptive*
    (clusters follow corpus density, so a corpus of many distinct
    topics shards naturally), and the centroids are reusable corpus
    structure (the IVF quantizer), but a near-dup pair straddling a
    cell boundary is missed. ``nassign > 1`` assigns each vector to
    its ``nassign`` nearest cells — a straddling pair then meets in
    one of them; recall rises with candidate volume ×~nassign. Rule of
    thumb: nassign=1 for epsilon-dedup of crawl corpora (near-dups are
    near-identical, boundary straddle is rare), nassign=2 when the
    threshold dips toward 0.8.

    100 TB shape: training collects ≤ ``train_limit`` vectors
    (bounded driver state); assignment is one JVM expression pass
    (scan speed, no shuffle); candidates are ONE equi-self-join on the
    cell key with Σ|cell|² pair volume — size ``nlist`` so the
    expected cell (n/nlist) keeps |cell|² within the shuffle budget;
    the exact-cosine verify touches candidates only. No all-pairs path
    exists at any setting.
    """
    from getl_spark.functions.similarity import (
        _train_centroids,
        centroid_cells_expr,
        cosine_expr,
        with_norm,
    )

    if nassign < 1:
        raise ValueError(f"semantic_pairs: nassign must be >= 1, got {nassign}")
    if not -1.0 <= threshold <= 1.0:
        raise ValueError(
            f"semantic_pairs: threshold must be in [-1, 1], got {threshold}"
        )
    nonnull = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("vec")).where(
        F.col("vec").isNotNull()
    )
    if nonnull.first() is None:
        # empty corpus yields zero pairs, like every other pair
        # generator here — not a training failure
        id_type = df.schema[id_col].dataType.simpleString()
        return local_df(df.sparkSession,
            [], f"id_a {id_type}, id_b {id_type}, cosine double"
        )
    cent_n = _train_centroids(
        nonnull, "id", "vec", nlist, seed, train_limit, kmeans_iters
    )
    vecs = with_norm(nonnull).transform(pin)
    assigned = vecs.select(
        "id",
        F.explode(centroid_cells_expr(cent_n, F.col("vec"), nassign)).alias("cell"),
    )
    candidates = (
        assigned.alias("a")
        .join(assigned.alias("b"), "cell")
        .where(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    verified = candidates.join(
        vecs.select(
            F.col("id").alias("id_a"),
            F.col("vec").alias("a_vec"),
            F.col("norm").alias("a_norm"),
        ),
        "id_a",
    ).join(
        vecs.select(
            F.col("id").alias("id_b"),
            F.col("vec").alias("b_vec"),
            F.col("norm").alias("b_norm"),
        ),
        "id_b",
    )
    return verified.select(
        "id_a",
        "id_b",
        F.round(
            cosine_expr(
                F.col("a_vec"), F.col("b_vec"), F.col("a_norm"), F.col("b_norm")
            ),
            6,
        ).alias("cosine"),
    ).where(F.col("cosine") >= threshold)


def build_minhash_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Persist a MinHash dedup index — the text-corpus symmetric of
    ``similarity.build_ivf_index``: build once per corpus snapshot,
    then dedup every daily increment with ``against_stored_index``
    without rescanning or re-sketching the corpus.

    Writes ``{path}/fingerprints`` (id, md5 fingerprint — the exact
    phase), ``{path}/bands`` (band, key, id — LSH candidate
    generation, partitioned by band), ``{path}/signatures`` (id,
    64-long array — near verification), and ``{path}/meta`` (the
    sketch parameters, read back at query time so an increment can
    never be sketched with a different hash family than the index).
    Per-doc index cost ≈ 16 B fingerprint + 8·num_hashes B signature +
    16·bands B keys — ~1.3 KB/doc at the defaults, i.e. a 100 TB
    corpus indexes into ~100s of GB, partition-pruned on band at query
    time. Returns a band-occupancy summary (max bucket size flags hot
    keys the same way IVF cell occupancy flags bad ``nlist``).
    """
    if num_hashes % bands:
        raise ValueError(
            f"build_minhash_index: num_hashes ({num_hashes}) must be "
            f"divisible by bands ({bands})"
        )
    from getl_spark.functions.text import fingerprint as fp

    spark = df.sparkSession
    id_type = df.schema[id_col].dataType.simpleString()

    def _write_meta():
        local_df(spark,
            [(n, num_hashes, bands, id_type)],
            "n int, num_hashes int, bands int, id_type string",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")

    def _write_fingerprints():
        fp(df, text_col, "fingerprint").select(
            F.col(id_col).alias("id"), "fingerprint"
        ).write.mode("overwrite").parquet(f"{path}/fingerprints")

    def _write_sketches():
        # signatures -> bands is a sequential chain (bands re-read the
        # written signature table), but the chain as a whole is
        # independent of the meta/fingerprint writes
        sh = _shingles(df, id_col, text_col, n).select(
            "id", F.xxhash64("shingle").alias("shingle")
        ).transform(pin)
        sigs = minhash_signatures(
            df, id_col, text_col, n, num_hashes, shingles=sh
        )
        sigs.write.mode("overwrite").parquet(f"{path}/signatures")
        _band_keys(
            spark.read.parquet(f"{path}/signatures"), bands,
            num_hashes // bands
        ).write.mode("overwrite").partitionBy("band").parquet(
            f"{path}/bands"
        )

    # meta + fingerprints + the sketch chain are mutually independent —
    # overlap them (guide §2.6; r13: the fingerprint scan rides along
    # with the shingle pin instead of serializing before it)
    run_concurrent(_write_meta, _write_fingerprints, _write_sketches)
    from types import SimpleNamespace

    return (
        _read_bands(spark, path, SimpleNamespace(id_type=id_type))
        .groupBy("band", "key")
        .agg(F.count("*").alias("bucket"))
        .groupBy("band")
        .agg(
            F.count("*").alias("n_keys"),
            F.max("bucket").alias("max_bucket"),
        )
        .orderBy("band")
    )


def _read_bands(spark, index_path: str, meta):
    """Band table read that tolerates a bootstrap-empty index: a
    partitioned write of zero rows emits no files, so inference fails
    on the very first increment of a from-scratch feed — fall back to
    the schema recorded in meta. Inference runs first so legacy
    indexes whose meta predates ``id_type`` keep working with any id
    column type."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(f"{index_path}/bands")
    except AnalysisException:
        id_type = getattr(meta, "id_type", None) or "bigint"
        return spark.read.schema(f"id {id_type}, key bigint, band int").parquet(
            f"{index_path}/bands"
        )


def against_stored_index(
    new_df: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    near_threshold: Optional[float] = None,
    keep_sketches: bool = False,
) -> DataFrame:
    """Dedup an increment against a persisted ``build_minhash_index``
    WITHOUT the original corpus: keep new documents that are neither
    exact nor (with ``near_threshold``) near duplicates of the indexed
    snapshot. Sketch parameters come from the index's own meta table —
    an increment can never be hashed with a different family than the
    index it queries.

    Exact phase: anti-join on the stored fingerprints. Near phase:
    band keys for the surviving increment (same family), equi-join
    against the stored band table (partition-pruned on band),
    candidates verified by *signature agreement* — the unbiased
    MinHash estimate Ĵ = (matching hash positions)/num_hashes, since
    the corpus text is not in the index. σ(Ĵ) = √(J(1−J)/k) ≈ 0.03 at
    J≈0.8, k=64 — build the index with num_hashes=128+ if the
    threshold must cut sharply. (``against_index`` is the exact-verify
    variant when both text sides are at hand.)

    Scale shape: increment-sized sketch work + two keyed joins against
    index tables; nothing rescans the corpus. ``keep_sketches=True``
    retains the computed ``fingerprint`` (and, when the near phase ran,
    ``__sig``) columns on the survivors so ``index_append`` can fold
    them in without re-sketching.
    """
    spark = new_df.sparkSession
    meta = spark.read.parquet(f"{index_path}/meta").first()
    from getl_spark.functions.text import fingerprint as fp

    new_fp = fp(new_df, text_col, "fingerprint")
    survivors = new_fp.join(
        spark.read.parquet(f"{index_path}/fingerprints").select("fingerprint"),
        "fingerprint",
        "anti",
    )
    if near_threshold is None:
        return survivors if keep_sketches else survivors.drop("fingerprint")
    sh = _shingles(survivors, id_col, text_col, meta.n).select(
        "id", F.xxhash64("shingle").alias("shingle")
    ).transform(pin)
    new_sigs = minhash_signatures(
        survivors, id_col, text_col, meta.n, meta.num_hashes, shingles=sh
    ).transform(pin)
    banded_new = _band_keys(
        new_sigs, meta.bands, meta.num_hashes // meta.bands
    ).withColumnRenamed("id", "id_a")
    banded_idx = _read_bands(spark, index_path, meta).withColumnRenamed(
        "id", "id_b"
    )
    candidates = (
        banded_new.join(banded_idx, ["band", "key"]).select("id_a", "id_b").distinct()
    )
    idx_sigs = spark.read.parquet(f"{index_path}/signatures")
    est = F.size(
        F.filter(
            F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
            lambda v: v,
        )
    ) / F.lit(float(meta.num_hashes))
    near_ids = (
        candidates.join(
            new_sigs.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a")),
            "id_a",
        )
        .join(
            idx_sigs.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b")),
            "id_b",
        )
        .where(est >= near_threshold)
        .select(F.col("id_a").alias(id_col))
        .distinct()
    )
    out = survivors.join(near_ids, id_col, "anti")
    if not keep_sketches:
        return out.drop("fingerprint")
    return out.join(
        new_sigs.select(F.col("id").alias(id_col), F.col("sig").alias("__sig")),
        id_col,
        "left",
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    nlist: int = 64,
    nassign: int = 1,
    seed: int = 42,
    train_limit: int = 10000,
    kmeans_iters: int = 10,
    quality_col: Optional[str] = None,
) -> DataFrame:
    """One-call SemDeDup: ``semantic_pairs`` → connected components →
    one survivor per semantic cluster (min id, or the best row by
    ``quality_col``). The composition every dedup family here offers;
    see ``semantic_pairs`` for the scale shape and recall knobs.
    YAML-callable inside ``transform::generic``."""
    from getl_spark.functions.graph import dedup_by_component

    pairs = semantic_pairs(
        df, id_col, vec_col, threshold, nlist, nassign, seed,
        train_limit, kmeans_iters,
    )
    return dedup_by_component(
        df, pairs, id_col=id_col, quality_col=quality_col
    )


def near_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    method: str = "minhash",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    max_df: Optional[int] = None,
    quality_col: Optional[str] = None,
) -> DataFrame:
    """One-call text near-dedup: candidate pairs → connected
    components → one survivor per near-duplicate cluster (min id, or
    the best row by ``quality_col`` — longest/highest-quality/newest).
    The text-corpus symmetric of ``semantic_dedup``; YAML-callable
    inside ``transform::generic``.

    ``method='minhash'`` (default) generates pairs with banded MinHash
    LSH — the 100 TB path (see ``minhash_lsh`` for the recall curve
    and knobs). ``method='exact'`` uses the exact inverted-index
    Jaccard (``ngram_jaccard`` + ``max_df``) — ground truth at
    moderate scale, cost grows with duplicate density squared. Both
    verify candidates at exact Jaccard ≥ ``threshold`` before any row
    is dropped, so the only recall loss is candidate generation.
    """
    if method == "minhash":
        pairs = minhash_lsh(
            df, id_col=id_col, text_col=text_col, n=n,
            num_hashes=num_hashes, bands=bands, threshold=threshold,
        )
    elif method == "exact":
        pairs = ngram_jaccard(
            df, id_col=id_col, text_col=text_col, n=n,
            threshold=threshold, max_df=max_df,
        )
    else:
        raise ValueError(
            f"near_dedup: unknown method '{method}' (minhash | exact)"
        )
    from getl_spark.functions.graph import dedup_by_component

    return dedup_by_component(
        df, pairs, id_col=id_col, quality_col=quality_col
    )


def index_append(
    df: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    fingerprint_col: Optional[str] = None,
    sig_col: Optional[str] = None,
    health_gate: "bool | int" = False,
) -> None:
    """Grow a persisted ``build_minhash_index`` with new documents:
    append their signatures, band keys, and — LAST — fingerprints,
    sketched with the index's OWN meta parameters (an appended
    increment can never drift to a different hash family). The write
    side of the daily-ingest loop: ``against_stored_index`` filters an
    increment, ``index_append`` folds the survivors in, so tomorrow's
    increment dedups against today's.

    Write order is a crash-safety contract: the fingerprint append is
    the commit marker. A replayed batch whose fingerprints landed is
    filtered out by the exact phase and never re-appended; a crash
    before the fingerprint append leaves at worst duplicate
    signature/band rows, which are harmless (candidate pairs are
    distinct'd) and get their fingerprints on the replay.

    ``fingerprint_col`` / ``sig_col`` (optional): reuse sketches a
    caller already computed (``against_stored_index(keep_sketches=
    True)``) instead of recomputing — the sketch passes are the
    dominant per-batch cost in the streaming loop.

    ``health_gate`` runs :func:`assert_minhash_index_healthy` on the
    index first (``True`` = default 10k hot-bucket threshold, an int =
    that threshold) and refuses the append when a hot bucket already
    needs attention — appending into a hot bucket compounds its
    quadratic candidate cost, so the loop's right move is
    rebuild/screen-then-append."""
    spark = df.sparkSession
    if health_gate:
        assert_minhash_index_healthy(
            spark,
            index_path,
            **(
                {} if health_gate is True
                else {"hot_bucket": int(health_gate)}
            ),
        )
    meta = spark.read.parquet(f"{index_path}/meta").first()
    from getl_spark.functions.text import fingerprint as fp

    if sig_col is not None:
        sigs = df.select(F.col(id_col).alias("id"), F.col(sig_col).alias("sig"))
    else:
        sh = _shingles(df, id_col, text_col, meta.n).select(
            "id", F.xxhash64("shingle").alias("shingle")
        ).transform(pin)
        sigs = minhash_signatures(
            df, id_col, text_col, meta.n, meta.num_hashes, shingles=sh
        )
    sigs = sigs.transform(pin)
    # signatures and bands both project off the pinned sigs and are
    # mutually independent — overlap them (guide §2.6). The
    # fingerprint append stays strictly AFTER both: it is the commit
    # marker of the crash-safety contract above, so it must never be
    # in flight while either could still fail.
    run_concurrent(
        lambda: sigs.write.mode("append").parquet(
            f"{index_path}/signatures"
        ),
        lambda: _band_keys(sigs, meta.bands, meta.num_hashes // meta.bands)
        .write.mode("append")
        .partitionBy("band")
        .parquet(f"{index_path}/bands"),
    )
    fps = (
        df.select(F.col(id_col).alias("id"), F.col(fingerprint_col).alias("fingerprint"))
        if fingerprint_col is not None
        else fp(df, text_col, "fingerprint").select(
            F.col(id_col).alias("id"), "fingerprint"
        )
    )
    fps.write.mode("append").parquet(f"{index_path}/fingerprints")


def merge_minhash_index(
    spark,
    path_a: str,
    path_b: str,
    out_path: str,
    health_gate: "bool | int" = False,
) -> DataFrame:
    """Merge two persisted ``build_minhash_index`` snapshots WITHOUT
    re-sketching — the rolling-corpus consolidation step next to
    ``index_append``/``write::stream_dedup_ingest``: per-period
    ingest leaves one index per period, and consolidating them
    previously meant re-reading every document through a fresh build.

    MinHash band/fingerprint/signature tables are pure unions: the
    hash family is fully determined by the meta parameters
    (``n``/``num_hashes``/``bands`` — checked EQUAL between the two
    indexes, loud ValueError otherwise; mixing families would silently
    produce non-comparable sketches, the exact failure mode the
    meta-driven query path exists to prevent). Identity contract
    (pytest-held): ``against_stored_index`` results on merge(A, B)
    equal results on an index built from the distinct union of the
    two corpora — every table row is identical by construction.

    Full-row duplicates (the same document indexed in both periods)
    collapse to one row; the same id with DIFFERENT content keeps both
    rows — both contents were seen, and the exact/near phases treat
    the index as "content ever ingested".

    ``health_gate`` runs :func:`assert_minhash_index_healthy` on BOTH
    inputs first (``True`` = default 10k hot-bucket threshold, an int
    = that threshold) — unioning a hot bucket into the consolidated
    index carries its quadratic candidate cost forward, so the cron's
    right move is rebuild/screen-then-merge.

    Scale shape: three table unions with row-level dedup (one keyed
    shuffle each, index-sized — never corpus-sized) + the partitioned
    band write; no text is read, no hashes recomputed. Returns the
    band-occupancy summary, same as ``build_minhash_index``.
    """
    norm = lambda p: os.path.normpath(p)  # noqa: E731
    if norm(out_path) in (norm(path_a), norm(path_b)):
        raise ValueError(
            "merge_minhash_index: out_path must differ from both inputs "
            "(overwriting an index while lazily reading it loses data)"
        )
    if health_gate:
        kw = {} if health_gate is True else {"hot_bucket": int(health_gate)}
        assert_minhash_index_healthy(spark, path_a, **kw)
        assert_minhash_index_healthy(spark, path_b, **kw)
    meta_a = spark.read.parquet(f"{path_a}/meta").first()
    meta_b = spark.read.parquet(f"{path_b}/meta").first()
    # getattr default tolerates legacy metas that predate id_type
    for field in ("n", "num_hashes", "bands", "id_type"):
        va = getattr(meta_a, field, None)
        vb = getattr(meta_b, field, None)
        if va != vb:
            raise ValueError(
                f"merge_minhash_index: meta mismatch on {field!r} "
                f"({va} vs {vb}) — indexes sketched with different "
                "families cannot merge; rebuild one side"
            )
    local_df(spark,
        [(
            meta_a.n,
            meta_a.num_hashes,
            meta_a.bands,
            getattr(meta_a, "id_type", None) or "bigint",
        )],
        "n int, num_hashes int, bands int, id_type string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{out_path}/meta")

    def both(sub):
        return spark.read.parquet(f"{path_a}/{sub}").unionByName(
            spark.read.parquet(f"{path_b}/{sub}")
        )

    # the three table merges are mutually independent — overlap them
    # (guide §2.6: later jobs back-fill executors freed by the current
    # job's tail; r13, measured 9.3s -> 5.7s min-of-3 on the
    # end-to-end composite at sf0.1)
    run_concurrent(
        lambda: both("fingerprints")
        .dropDuplicates(["id", "fingerprint"])
        .write.mode("overwrite")
        .parquet(f"{out_path}/fingerprints"),
        lambda: both("signatures")
        .dropDuplicates(["id", "sig"])
        .write.mode("overwrite")
        .parquet(f"{out_path}/signatures"),
        lambda: _read_bands(spark, path_a, meta_a)
        .unionByName(_read_bands(spark, path_b, meta_b))
        .dropDuplicates(["id", "key", "band"])
        .write.mode("overwrite")
        .partitionBy("band")
        .parquet(f"{out_path}/bands"),
    )
    from types import SimpleNamespace

    return (
        _read_bands(
            spark,
            out_path,
            SimpleNamespace(id_type=getattr(meta_a, "id_type", None)),
        )
        .groupBy("band", "key")
        .agg(F.count("*").alias("bucket"))
        .groupBy("band")
        .agg(
            F.count("*").alias("n_keys"),
            F.max("bucket").alias("max_bucket"),
        )
        .orderBy("band")
    )


def lsh_plan(
    spark,
    threshold: float,
    num_hashes: int = 128,
    jaccard_points: "Sequence[float]" = (0.3, 0.5, 0.7, 0.8, 0.9, 0.95),
    round_to: int = 6,
) -> DataFrame:
    """Banding-parameter planner for the MinHash-LSH family — answers
    "which (bands, rows) should I pass to ``minhash_lsh`` /
    ``build_minhash_index`` for a Jaccard threshold of ``t``?" with
    the s-curve table instead of folklore: for every (b, r) factoring
    of ``num_hashes``, the probability a pair at similarity ``s``
    becomes a candidate is exactly ``1 − (1 − sʳ)ᵇ``, and the curve's
    midpoint sits at ``(1/b)^(1/r)``. One row per (factoring ×
    ``jaccard_points`` entry): read DOWN a factoring's rows to see its
    false-positive mass below the threshold and its recall above —
    the planning trade every dedup pass makes (more bands = more
    recall AND more candidate-join work; pair with
    :func:`minhash_index_health`'s measured bucket load and
    :func:`shingle_profile`'s corpus pricing).

    ``recommended`` flags the factoring whose midpoint lands closest
    to ``threshold`` (ties → fewer bands, the cheaper join).
    Returns ``(num_hashes, bands, rows_per_band, midpoint,
    recommended, s, p_candidate)``.

    Scale shape: the factorings are driver-enumerated integers (≤
    d(num_hashes) ≤ a few dozen rows); the probabilities are JVM
    closed forms over that literal frame — no data touched, fully
    SQL-expressible, so the whole planning table value-hashes against
    the oracle.
    """
    if not 0.0 < threshold < 1.0:
        raise ValueError(
            f"lsh_plan: threshold must be in (0, 1), got {threshold}"
        )
    if not 2 <= num_hashes <= 4096:
        raise ValueError(
            f"lsh_plan: num_hashes must be in [2, 4096], got {num_hashes}"
        )
    pts = [float(s) for s in jaccard_points]
    if not pts or any(not 0.0 < s < 1.0 for s in pts):
        raise ValueError(
            "lsh_plan: jaccard_points must be non-empty, all in (0, 1)"
        )
    factorings = [
        (b, num_hashes // b)
        for b in range(1, num_hashes + 1)
        if num_hashes % b == 0
    ]
    base = local_df(spark,
        factorings, "bands INT, rows_per_band INT"
    )
    bd = F.col("bands").cast("double")
    rd = F.col("rows_per_band").cast("double")
    midpoint = F.pow(F.lit(1.0) / bd, F.lit(1.0) / rd)
    base = base.withColumn("num_hashes", F.lit(int(num_hashes)))
    # partitioned on the constant num_hashes column: the frame is
    # divisor-count-sized by construction; the constant key silences
    # the global-window warning without changing the single-task plan
    w = Window.partitionBy("num_hashes").orderBy(
        F.abs(midpoint - F.lit(float(threshold))).asc(),
        F.col("bands").asc(),
    )
    planned = base.select(
        "num_hashes", "bands", "rows_per_band",
        F.round(midpoint, round_to).alias("midpoint"),
        (F.row_number().over(w) == 1).alias("recommended"),
    )
    s = F.explode(F.array(*[F.lit(p) for p in pts])).alias("s")
    p_cand = F.lit(1.0) - F.pow(
        F.lit(1.0) - F.pow(F.col("s"), rd), bd
    )
    return planned.select("*", s).select(
        "num_hashes", "bands", "rows_per_band", "midpoint", "recommended",
        F.col("s"),
        F.round(p_cand, round_to).alias("p_candidate"),
    )


def minhash_index_health(
    spark,
    index_path: str,
    hot_bucket: int = 10_000,
    round_to: int = 6,
) -> DataFrame:
    """Index-maintenance health readout for a persisted
    ``build_minhash_index`` — the band-table symmetric of
    ``similarity.ivf_health``: ``index_append`` /
    ``write::stream_dedup_ingest`` grow LSH buckets without rebuilding
    and ``merge_minhash_index`` unions band tables verbatim, so
    repeated consolidation fattens hot buckets (boilerplate templates,
    near-constant documents) — and the banded candidate join's cost
    grows with the SQUARE of bucket size while nothing fails loudly.
    This prices the damage from index metadata alone: the meta row,
    the fingerprint count, and the band table — never a signature or
    the corpus text.

    Returns ONE row: ``(bands, num_hashes, n_docs, n_buckets,
    n_entries, max_bucket, mean_bucket, expected_probe, hot_buckets,
    candidate_pairs, attention)`` —

    * ``mean_bucket`` — entries per (band, key) bucket;
    * ``expected_probe`` — the size-biased mean ``Σc²/Σc``: the bucket
      size a random increment entry actually lands in (what one new
      document's candidate lookup costs, per band);
    * ``candidate_pairs`` — ``Σ c(c−1)/2``: the full self-join
      candidate workload a corpus-wide dedup pass over this index
      would generate;
    * ``hot_buckets`` / ``attention`` — buckets over ``hot_bucket``
      entries, and the flag that fires when any exist. When it does,
      rebuild with more bands/hashes or screen the hot keys (they are
      near-always boilerplate) before the next consolidation.

    Scale shape: one grouped count over the band table (map-side
    combine, reduce side = bucket count), three 1-row aggregates
    crossJoin-broadcast together. O(index files), run it after every
    append/merge cycle.
    """
    if hot_bucket < 1:
        raise ValueError(
            f"minhash_index_health: hot_bucket must be >= 1, got "
            f"{hot_bucket}"
        )
    meta_row = spark.read.parquet(f"{index_path}/meta").first()
    meta = spark.read.parquet(f"{index_path}/meta").select(
        F.col("bands").cast("bigint").alias("bands"),
        F.col("num_hashes").cast("bigint").alias("num_hashes"),
    )
    n_docs = spark.read.parquet(f"{index_path}/fingerprints").agg(
        F.count("*").cast("bigint").alias("n_docs")
    )
    buckets = (
        _read_bands(spark, index_path, meta_row)
        .groupBy("band", "key")
        .agg(F.count("*").cast("bigint").alias("c"))
    )
    c = F.col("c")
    cd = c.cast("double")
    agg = buckets.agg(
        F.count("*").cast("bigint").alias("n_buckets"),
        F.coalesce(F.sum(c), F.lit(0)).cast("bigint").alias("n_entries"),
        F.coalesce(F.max(c), F.lit(0)).cast("bigint").alias("max_bucket"),
        F.coalesce(
            F.sum(F.when(c > hot_bucket, 1).otherwise(0)), F.lit(0)
        ).cast("bigint").alias("hot_buckets"),
        F.coalesce(F.sum(cd * (cd - 1) / F.lit(2.0)), F.lit(0.0)).alias(
            "__pairs"
        ),
        F.coalesce(F.sum(cd * cd), F.lit(0.0)).alias("__sq"),
    )
    out = agg.crossJoin(F.broadcast(n_docs)).crossJoin(F.broadcast(meta))
    nb = F.col("n_buckets").cast("double")
    ne = F.col("n_entries").cast("double")
    return out.select(
        "bands", "num_hashes", "n_docs", "n_buckets", "n_entries",
        "max_bucket",
        F.round(F.when(nb > 0, ne / nb), round_to).alias("mean_bucket"),
        F.round(F.when(ne > 0, F.col("__sq") / ne), round_to).alias(
            "expected_probe"
        ),
        "hot_buckets",
        F.round(F.col("__pairs"), 1).alias("candidate_pairs"),
        (F.col("hot_buckets") > 0).alias("attention"),
    )


def assert_minhash_index_healthy(
    spark,
    index_path: str,
    hot_bucket: int = 10_000,
) -> dict:
    """Executable form of :func:`minhash_index_health`'s attention
    trigger — the gate the ingest/consolidation loop calls BEFORE
    :func:`index_append` / :func:`merge_minhash_index` so hot LSH
    buckets (whose candidate cost grows with the SQUARE of bucket
    size) cannot silently keep absorbing appends. Returns the health
    row as a dict when healthy; raises
    :class:`~getl_spark.common.errors.IndexHealthError` (carrying the
    same dict as ``.readout``) when ``attention`` fires. Cost is the
    readout's: band-table metadata only, never a signature or text."""
    from getl_spark.common.errors import IndexHealthError

    row = minhash_index_health(
        spark, index_path, hot_bucket
    ).collect()[0].asDict()
    if row["attention"]:
        raise IndexHealthError(
            f"assert_minhash_index_healthy: index at {index_path} has "
            f"{row['hot_buckets']} bucket(s) over {hot_bucket} entries "
            f"(max {row['max_bucket']}; expected probe "
            f"{row['expected_probe']}) — rebuild with more bands/hashes "
            "or screen the hot keys (near-always boilerplate) before the "
            "next append/merge",
            readout=row,
        )
    return row


# -------------------------------------------------------- log compaction
def latest_by_key(
    df: DataFrame,
    keys: "List[str]",
    order_col: str,
    keep: str = "max",
    tiebreak_cols: "Optional[List[str]]" = None,
) -> DataFrame:
    """CDC-log / changelog compaction: one row per key — the one with
    the max (``keep='max'``, default) or min value of ``order_col``.
    The batch counterpart of ``write::stream_upsert``'s OrderBy
    latest-wins merge: append-only ingest stays cheap, and a single
    compaction pass materializes current state.

    One shuffle on the keys; the per-key reduction is a window
    ``row_number`` (partial top-1 per partition under AQE). Ties on
    ``order_col`` pick an arbitrary row unless ``tiebreak_cols`` adds
    a deterministic total order — pass it whenever the order column
    can repeat within a key (e.g. same-second updates).
    """
    if keep not in ("max", "min"):
        raise ValueError(f"latest_by_key: keep must be max|min, got '{keep}'")
    from pyspark.sql.window import Window

    direction = F.col(order_col).desc() if keep == "max" else F.col(order_col).asc()
    order = [direction] + [
        F.col(c).desc() if keep == "max" else F.col(c).asc()
        for c in (tiebreak_cols or [])
    ]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


# ------------------------------------------------- substring-level dedup
def substring_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 50,
) -> DataFrame:
    """Corpus-wide duplicated-passage detection: every maximal run of
    ≥ ``min_tokens`` whitespace tokens that appears more than once in
    the corpus (across documents OR repeated within one) is returned as
    a token span to cut — ``(id, start, end)`` half-open token indexes —
    for every occurrence EXCEPT the globally first (min ``(id, pos)``).
    Substring-level dedup removes boilerplate/licence blocks/templating
    that document-level near-dup methods can't see, and is the
    published complement to MinHash document dedup.

    Plan shape (all JVM expressions, no UDFs):
    1. one pass builds ``min_tokens``-grams per doc (array slice +
       concat inside ``transform`` — no token-level explode),
    2. grams are xxhash64'd to 8 bytes and grouped — one shuffle keyed
       by gram; ``min_by((id,pos))`` picks the global first occurrence,
    3. every other occurrence contributes span ``[pos, pos+L)``;
       overlapping/adjacent spans merge per doc via a windowed
       islands pass (running-max of span ends), so an M-token repeated
       passage collapses from M−L+1 gram hits to ONE span.

    Shuffle bytes ∝ total corpus tokens (one 8-byte key per token
    position) — linear, the same budget as the MinHash shingle pass.
    """
    if min_tokens < 2:
        raise ValueError("substring_spans: min_tokens must be >= 2")
    L = min_tokens
    words = F.split(F.col(text_col), r"\s+")
    n_grams = F.greatest(F.size(words) - F.lit(L - 1), F.lit(0))
    # same short-doc guard as _shingles: sequence() never yields empty
    idx = F.sequence(F.lit(0), F.greatest(n_grams, F.lit(1)) - F.lit(1))
    grams_all = F.transform(
        idx,
        lambda i: F.struct(
            i.alias("pos"),
            F.xxhash64(F.concat_ws(" ", F.slice(words, i + F.lit(1), F.lit(L)))).alias(
                "gram"
            ),
        ),
    )
    grams = F.when(n_grams > F.lit(0), grams_all).otherwise(
        F.slice(grams_all, 1, 0)
    )
    # pin: occ feeds BOTH the first-occurrence aggregation
    # and the dup-occurrence join below — without it the tokenize +
    # L-gram hash + explode of every token position (the expensive
    # stage) runs twice
    occ = (
        _parallelize(df)
        .select(F.col(id_col).alias("id"), F.explode(grams).alias("g"))
        .select("id", F.col("g.pos").alias("pos"), F.col("g.gram").alias("gram"))
        .transform(pin)
    )
    firsts = occ.groupBy("gram").agg(
        F.count("*").alias("n"),
        F.min(F.struct("id", "pos")).alias("first"),
    )
    dup_occ = (
        occ.join(firsts.where(F.col("n") > 1), "gram")
        .where(
            (F.col("id") != F.col("first.id")) | (F.col("pos") != F.col("first.pos"))
        )
        .select("id", F.col("pos").alias("start"), (F.col("pos") + L).alias("end"))
    )
    # islands: merge overlapping/adjacent spans per doc
    w = Window.partitionBy("id").orderBy("start", "end")
    prev_max_end = F.max("end").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    islands = (
        dup_occ.withColumn(
            "__new", (prev_max_end.isNull() | (F.col("start") > prev_max_end)).cast("int")
        )
        .withColumn("__island", F.sum("__new").over(w))
        .groupBy("id", "__island")
        .agg(F.min("start").alias("start"), F.max("end").alias("end"))
        .select("id", "start", "end")
    )
    return islands


def remove_substring_dups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 50,
    new_col: str = "text_dedup",
) -> DataFrame:
    """Apply ``substring_spans``: cut every duplicated ≥ ``min_tokens``
    token passage (keeping its globally first occurrence) out of the
    corpus and return the input plus ``new_col``. Output text is
    whitespace-normalized (tokens rejoined with single spaces). The cut
    runs as a broadcast-shaped join of docs × their merged span arrays
    plus one higher-order filter — no Python in the row path.
    """
    spans = substring_spans(df, id_col, text_col, min_tokens)
    span_arr = spans.groupBy("id").agg(
        F.collect_list(F.struct("start", "end")).alias("__spans")
    )
    joined = df.join(
        span_arr.withColumnRenamed("id", id_col), id_col, "left"
    )
    words = F.split(F.col(text_col), r"\s+")
    indexed = F.transform(
        words, lambda wrd, i: F.struct(wrd.alias("w"), i.alias("i"))
    )
    kept = F.filter(
        indexed,
        lambda s: ~F.exists(
            F.col("__spans"),
            lambda sp: (s["i"] >= sp["start"]) & (s["i"] < sp["end"]),
        ),
    )
    out_text = F.when(F.col("__spans").isNull(), F.col(text_col)).otherwise(
        F.concat_ws(" ", F.transform(kept, lambda s: s["w"]))
    )
    return joined.withColumn(new_col, out_text).drop("__spans")


def by_url(
    df: "DataFrame",
    url_col: str = "url",
    id_col: str = "doc_id",
    quality_col: "Optional[str]" = None,
    canonical_col: "Optional[str]" = None,
) -> "DataFrame":
    """URL-level dedup — the FineWeb-style first pass before any text
    dedup: canonicalize ``url_col`` (``text.canonicalize_url``'s full
    chain — tracking params, default ports, case, fragments) and keep
    ONE row per canonical URL: the min ``id_col``, or with
    ``quality_col`` the best row (max quality, id tiebreak). Rows with
    a NULL url pass through untouched (no URL is no dedup evidence).
    ``canonical_col`` keeps the canonical form in the output.

    One keyed window on the canonical URL — same shuffle budget as
    ``drop_duplicates``, with the canonicalization a scan-speed regexp
    chain. Catches the same-page-different-tracking-params crawls that
    exact text dedup only finds after downloading both copies.
    """
    from pyspark.sql import Window
    from getl_spark.functions.text import canonicalize_url

    tmp = canonical_col or "__by_url_canon"
    canon = canonicalize_url(df, url_col, tmp)
    with_url = canon.where(F.col(url_col).isNotNull())
    null_url = canon.where(F.col(url_col).isNull())
    order = (
        [F.col(quality_col).desc_nulls_last(), F.col(id_col).asc()]
        if quality_col is not None
        else [F.col(id_col).asc()]
    )
    w = Window.partitionBy(tmp).orderBy(*order)
    kept = (
        with_url.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    out = kept.unionByName(null_url)
    return out if canonical_col else out.drop(tmp)


def by_template(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One survivor per masked template (lowest id wins —
    deterministic): ``text.template_key`` then keyed exact dedup.
    The cheap first pass of a layered dedup stack — run it before
    MinHash/SimHash so templated boilerplate (order confirmations,
    profile pages) never reaches candidate generation. One keyed
    shuffle on the 128-bit key; survivors keep all original columns.
    """
    from getl_spark.functions.text import template_key

    keyed = template_key(df, text_col, "__template_key")
    return exact(keyed, ["__template_key"], order_by=id_col).drop(
        "__template_key"
    )


def pair_recall_eval(
    approx_pairs: "DataFrame",
    exact_pairs: "DataFrame",
    id_a: str = "id_a",
    id_b: str = "id_b",
    round_to: int = 6,
) -> "DataFrame":
    """Measured banding quality for dedup: recall/precision/F1 of an
    approximate duplicate-pair set (``minhash_lsh``, ``simhash_pairs``,
    ``embedding_cosine_pairs`` with loosened settings) against exact
    truth (``ngram_jaccard`` at the same threshold) on the same corpus
    sample — the companion MEASUREMENT to the ``minhash_params``
    S-curve ADVISOR: the advisor prices a setting before the run, this
    verifies it after, on a slice small enough to afford exact truth.

    Pairs are treated as unordered (each side is normalized to
    (min, max) before comparing, so the two operators' ordering
    conventions cannot manufacture disagreement); duplicates within
    either input collapse. One row: ``(n_exact, n_approx, n_hit,
    recall, precision, f1)`` — recall NULL when truth is empty,
    precision NULL when the approx set is empty (0/0 is "nothing to
    say", not 0).

    Shape: two distinct-aggregations + one pair-keyed semi-join —
    bytes ∝ pair counts, which the ``max_df``/band caps already bound.
    """
    def _norm(df):
        a, b = F.col(id_a), F.col(id_b)
        return df.select(
            F.least(a, b).alias("__pa"), F.greatest(a, b).alias("__pb")
        ).distinct()

    e = _norm(exact_pairs)
    ap = _norm(approx_pairs)
    hit = e.join(ap, ["__pa", "__pb"], "left_semi")
    counts = (
        e.agg(F.count("*").cast("bigint").alias("n_exact"))
        .crossJoin(
            F.broadcast(
                ap.agg(F.count("*").cast("bigint").alias("n_approx"))
            )
        )
        .crossJoin(
            F.broadcast(
                hit.agg(F.count("*").cast("bigint").alias("n_hit"))
            )
        )
    )
    rec = F.try_divide(F.col("n_hit").cast("double"), F.col("n_exact"))
    prec = F.try_divide(F.col("n_hit").cast("double"), F.col("n_approx"))
    f1 = F.when(
        rec.isNotNull() & prec.isNotNull() & ((rec + prec) > 0),
        2 * rec * prec / (rec + prec),
    ).otherwise(
        F.when(rec.isNotNull() & prec.isNotNull(), F.lit(0.0))
    )
    return counts.select(
        "n_exact",
        "n_approx",
        "n_hit",
        F.round(rec, round_to).alias("recall"),
        F.round(prec, round_to).alias("precision"),
        F.round(f1, round_to).alias("f1"),
    )


# ------------------------------------------------- content-defined chunks
def _cdc_gear_table():
    """Deterministic 256-entry gear table: ``md5(byte)`` first 8 bytes
    as uint64 — no RNG anywhere, so chunk boundaries replay
    bit-identically in the pure-Python oracle path and across
    sessions/languages."""
    import hashlib

    return [
        int.from_bytes(hashlib.md5(bytes([b])).digest()[:8], "big")
        for b in range(256)
    ]


def cdc_boundaries_py(
    data: bytes, min_size: int, avg_size: int, max_size: int
) -> List[int]:
    """Pure-Python reference chunker (exclusive end offsets): the
    oracle/replay twin of the vectorized path inside ``cdc_chunks`` —
    byte-for-byte identical boundaries by construction (same gear
    table, same mod-2⁶⁴ rolling hash, same min/max walk). Boundary
    rule: after byte i the rolling gear hash h = (2·h + gear[bᵢ])
    mod 2⁶⁴ marks an eligible cut when ``h & (avg_size−1) == 0``;
    cuts closer than ``min_size`` to the previous cut are skipped and
    a cut is forced at ``max_size``."""
    gear = _cdc_gear_table()
    mask = avg_size - 1
    n = len(data)
    cand = []
    h = 0
    for i, b in enumerate(data):
        h = ((h << 1) + gear[b]) & 0xFFFFFFFFFFFFFFFF
        if h & mask == 0:
            cand.append(i + 1)
    return _cdc_walk(cand, n, min_size, max_size)


def _cdc_walk(cand, n, min_size, max_size):
    """Shared boundary walk over eligible cut positions: skip cuts
    under ``min_size`` from the previous one, force a cut whenever a
    chunk would exceed ``max_size``, and close the final chunk at the
    end of the document."""
    bounds = []
    prev = 0
    for c in cand:
        c = int(c)
        while c - prev > max_size:
            prev += max_size
            bounds.append(prev)
        if c - prev >= min_size:
            bounds.append(c)
            prev = c
    while n - prev > max_size:
        prev += max_size
        bounds.append(prev)
    if n > prev:
        bounds.append(n)
    return bounds


def cdc_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_size: int = 64,
    avg_size: int = 256,
    max_size: int = 2048,
) -> DataFrame:
    """Content-defined chunking (rsync/LBFS gear-hash CDC) of
    ``text_col`` into variable-size chunks whose boundaries depend
    only on LOCAL byte content — the property fixed-stride or
    word-n-gram shingling lacks: insert one sentence at the top of a
    document and every fixed-offset window shifts, but gear-hash cut
    points downstream of the edit land on the SAME bytes, so shared
    passages keep identical chunk hashes. This is the storage-dedup
    idiom (LBFS, Muthitacharoen 2001; FastCDC) applied to corpus
    text: the cheap insertion-robust signal between exact hashing
    and MinHash.

    Rolling hash: h = (2·h + gear[b]) mod 2⁶⁴ — byte i's influence
    leaves after 64 shifts, so the hash is a pure function of the
    trailing 64 bytes and the Arrow-batched path can compute all
    positions at once as 64 shifted vector adds (numpy uint64
    wraparound IS the mod). Cut when ``h & (avg_size−1) == 0``
    (``avg_size`` must be a power of two), subject to the
    ``min_size`` skip / ``max_size`` force walk. The gear table is
    md5-derived — no RNG, replayable anywhere
    (``cdc_boundaries_py`` is the exact pure-Python twin used by the
    oracles).

    Returns ``(id_col, chunk_idx, chunk_hash, chunk_len)`` — one row
    per chunk, ``chunk_hash`` = md5 hex of the chunk bytes. NULL and
    empty texts emit no rows.

    Scale shape: one Arrow-batched ``mapInPandas`` pass, shuffle-free
    and row-linear; output size ∝ input bytes / avg_size. Python is
    justified here: the boundary rule is a sequential byte recurrence
    with no JVM expression, and the vectorized form does the heavy
    work in numpy, not the interpreter.
    """
    if not (0 < min_size <= avg_size <= max_size):
        raise ValueError(
            "cdc_chunks: need 0 < min_size <= avg_size <= max_size, got "
            f"({min_size}, {avg_size}, {max_size})"
        )
    if avg_size & (avg_size - 1):
        raise ValueError(
            f"cdc_chunks: avg_size must be a power of two, got {avg_size}"
        )
    import pandas as pd

    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, chunk_idx int, chunk_hash string, "
        f"chunk_len int"
    )
    mask = avg_size - 1

    def chunk_batches(batches):
        import hashlib

        import numpy as np

        gear = np.array(_cdc_gear_table(), dtype=np.uint64)
        old = np.seterr(over="ignore")  # uint64 wraparound IS the mod 2^64
        try:
            for pdf in batches:
                ids, idxs, hashes, lens = [], [], [], []
                for rid, txt in zip(pdf[id_col], pdf[text_col]):
                    if txt is None:
                        continue
                    data = str(txt).encode("utf-8")
                    n = len(data)
                    if n == 0:
                        continue
                    g = gear[np.frombuffer(data, dtype=np.uint8)]
                    h = np.zeros(n, dtype=np.uint64)
                    for j in range(min(64, n)):
                        h[j:] += g[: n - j] << np.uint64(j)
                    cand = np.nonzero((h & np.uint64(mask)) == 0)[0] + 1
                    prev = 0
                    for ci, b in enumerate(
                        _cdc_walk(cand, n, min_size, max_size)
                    ):
                        seg = data[prev:b]
                        ids.append(rid)
                        idxs.append(ci)
                        hashes.append(hashlib.md5(seg).hexdigest())
                        lens.append(len(seg))
                        prev = b
                yield pd.DataFrame(
                    {
                        id_col: ids,
                        "chunk_idx": idxs,
                        "chunk_hash": hashes,
                        "chunk_len": lens,
                    }
                )
        finally:
            np.seterr(**old)

    return _parallelize(df.select(id_col, text_col)).mapInPandas(
        chunk_batches, out_schema
    )


def cdc_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_shared: int = 2,
    threshold: float = 0.0,
    max_df: Optional[int] = None,
    min_size: int = 64,
    avg_size: int = 256,
    max_size: int = 2048,
) -> DataFrame:
    """Shared-content pairs via content-defined chunks: documents
    sharing ≥ ``min_shared`` distinct chunk hashes, scored by chunk
    containment = shared / min(|A|, |B|) — near 1 when one document
    embeds the other (changelog re-posts, quoted articles,
    boilerplate-wrapped mirrors) even after insertions that defeat
    offset-based comparison. The CDC companion to
    ``containment_pairs`` (word-n-gram) and ``substring_spans``
    (fixed shingles): same inverted-index candidate machinery
    (``max_df`` hot-chunk cap, xxhash64 key shrinking), different —
    edit-robust — token definition.

    Returns ``(id_a, id_b, shared_chunks, n_chunks_a, n_chunks_b,
    containment)`` with ``id_a < id_b``.

    Scale shape: one CDC scan pass, then the bounded inverted-index
    self-join on chunk-hash keys — shuffle ∝ chunk rows; set
    ``max_df`` so boilerplate chunks (site footers) don't quadratic
    the candidate mass (``dedup.shingle_profile``'s pricing logic
    applies unchanged: profile chunk document-frequency first).
    """
    chunks = (
        cdc_chunks(df, id_col, text_col, min_size, avg_size, max_size)
        .select(
            F.col(id_col).alias("id"),
            F.xxhash64("chunk_hash").alias("shingle"),
        )
        .distinct()
        .transform(pin)
    )
    inter, sizes = _set_pair_intersections(chunks, max_df)
    joined = inter.join(
        sizes.withColumnRenamed("id", "id_a").withColumnRenamed(
            "size", "n_chunks_a"
        ),
        "id_a",
    ).join(
        sizes.withColumnRenamed("id", "id_b").withColumnRenamed(
            "size", "n_chunks_b"
        ),
        "id_b",
    )
    return (
        joined.select(
            "id_a",
            "id_b",
            F.col("inter").cast("bigint").alias("shared_chunks"),
            F.col("n_chunks_a").cast("bigint").alias("n_chunks_a"),
            F.col("n_chunks_b").cast("bigint").alias("n_chunks_b"),
            F.round(
                F.col("inter")
                / F.least("n_chunks_a", "n_chunks_b").cast("double"),
                6,
            ).alias("containment"),
        )
        .where(
            (F.col("shared_chunks") >= min_shared)
            & (F.col("containment") >= threshold)
        )
    )


def build_cdc_index(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_size: int = 64,
    avg_size: int = 256,
    max_size: int = 2048,
) -> DataFrame:
    """Persist a content-defined-chunk index — the CDC symmetric of
    ``build_minhash_index``: chunk the corpus once, then screen every
    daily increment for shared passages with
    ``cdc_against_stored_index`` without rescanning or re-chunking
    the corpus. Where the MinHash index answers "is this NEAR-
    DUPLICATE of something indexed?", the chunk index answers "does
    this SHARE PASSAGES with something indexed?" — quoted articles,
    changelog re-posts, boilerplate-wrapped mirrors — robust to
    insertions by the CDC boundary property.

    Writes ``{path}/meta`` (chunking parameters + id type, read back
    at query/append time so an increment can never chunk with
    different cut rules than the index), ``{path}/chunks``
    (id, chunk_hash — distinct per doc), and — LAST —
    ``{path}/sizes`` (id, n_chunks): queries inner-join sizes, so a
    crash between the two writes leaves orphan chunk rows that are
    invisible until the replay commits them (the
    ``similarity``/``index_append`` write-order contract). Returns a
    1-row occupancy summary ``(n_docs, n_chunks, max_chunk_df)`` —
    a large ``max_chunk_df`` is the hot-boilerplate warning that
    sizes the query-time ``max_df`` cap.

    Index cost: one md5 + one id per chunk ≈ 40 B × bytes/avg_size —
    ~16 GB per TB of text at the 256-byte default.
    """
    spark = df.sparkSession
    id_type = df.schema[id_col].dataType.simpleString()
    local_df(spark,
        [(min_size, avg_size, max_size, id_type)],
        "min_size int, avg_size int, max_size int, id_type string",
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
    chunks = (
        cdc_chunks(df, id_col, text_col, min_size, avg_size, max_size)
        .select(F.col(id_col).alias("id"), "chunk_hash")
        .distinct()
        .transform(pin)
    )
    chunks.write.mode("overwrite").parquet(f"{path}/chunks")
    stored = spark.read.parquet(f"{path}/chunks")
    stored.groupBy("id").agg(
        F.count("*").cast("bigint").alias("n_chunks")
    ).write.mode("overwrite").parquet(f"{path}/sizes")
    return (
        stored.groupBy("chunk_hash")
        .agg(F.count("*").alias("df"))
        .agg(
            F.sum("df").cast("bigint").alias("n_chunks"),
            F.max("df").cast("bigint").alias("max_chunk_df"),
        )
        .join(
            F.broadcast(
                spark.read.parquet(f"{path}/sizes").agg(
                    F.count("*").cast("bigint").alias("n_docs")
                )
            )
        )
        .select("n_docs", "n_chunks", "max_chunk_df")
    )


def cdc_against_stored_index(
    new_df: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_shared: int = 2,
    threshold: float = 0.0,
    max_df: Optional[int] = None,
) -> DataFrame:
    """Shared-passage screen of an increment against a persisted
    ``build_cdc_index``: chunk the NEW docs with the index's OWN cut
    parameters (meta-driven — an increment can never drift to
    different boundaries than the index), join on chunk hash, score
    chunk containment. Returns ``(new_id, index_id, shared_chunks,
    n_chunks_new, n_chunks_index, containment)`` — filter and route
    (drop, attribute, or quarantine) downstream; containment =
    shared / min(|new|, |index|).

    Scale shape: increment-sized chunking + ONE keyed join against
    the chunk table — the corpus is never rescanned. Joined postings
    are distinct'd on (new, index, hash) BEFORE counting, so replay-
    duplicated index rows (the crash-window case ``build_cdc_index``
    documents) can never inflate a shared count. ``max_df`` drops
    chunk hashes whose INDEX document frequency exceeds the cap —
    the hot-boilerplate guard; measured post-join on the
    increment-sized subset, so the cap costs nothing extra.
    """
    spark = new_df.sparkSession
    meta = spark.read.parquet(f"{index_path}/meta").first()
    new_chunks = (
        cdc_chunks(
            new_df, id_col, text_col,
            meta.min_size, meta.avg_size, meta.max_size,
        )
        .select(F.col(id_col).alias("new_id"), "chunk_hash")
        .distinct()
        .transform(pin)
    )
    n_new = new_chunks.groupBy("new_id").agg(
        F.count("*").cast("bigint").alias("n_chunks_new")
    )
    idx = spark.read.parquet(f"{index_path}/chunks").withColumnRenamed(
        "id", "index_id"
    )
    sizes = spark.read.parquet(f"{index_path}/sizes").select(
        F.col("id").alias("index_id"),
        F.col("n_chunks").alias("n_chunks_index"),
    )
    joined = (
        new_chunks.join(idx, "chunk_hash")
        .select("new_id", "index_id", "chunk_hash")
        .distinct()
        .transform(pin)
    )
    if max_df is not None:
        hot = (
            joined.select("index_id", "chunk_hash")
            .distinct()
            .groupBy("chunk_hash")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") > max_df)
            .select("chunk_hash")
        )
        joined = joined.join(hot, "chunk_hash", "anti")
    pairs = joined.groupBy("new_id", "index_id").agg(
        F.count("*").cast("bigint").alias("shared_chunks")
    )
    return (
        pairs.join(n_new, "new_id")
        .join(sizes, "index_id")
        .select(
            "new_id",
            "index_id",
            "shared_chunks",
            "n_chunks_new",
            "n_chunks_index",
            F.round(
                F.col("shared_chunks")
                / F.least("n_chunks_new", "n_chunks_index").cast("double"),
                6,
            ).alias("containment"),
        )
        .where(
            (F.col("shared_chunks") >= min_shared)
            & (F.col("containment") >= threshold)
        )
    )


def cdc_index_append(
    df: DataFrame,
    index_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Grow a persisted ``build_cdc_index`` with new documents,
    chunked with the index's OWN meta parameters. Write order is the
    crash-safety contract: chunks first, sizes LAST — the size row
    is the membership commit marker (``cdc_against_stored_index``
    inner-joins sizes, and its post-join distinct makes replayed
    duplicate chunk rows harmless)."""
    spark = df.sparkSession
    meta = spark.read.parquet(f"{index_path}/meta").first()
    chunks = (
        cdc_chunks(
            df, id_col, text_col,
            meta.min_size, meta.avg_size, meta.max_size,
        )
        .select(F.col(id_col).alias("id"), "chunk_hash")
        .distinct()
        .transform(pin)
    )
    chunks.write.mode("append").parquet(f"{index_path}/chunks")
    chunks.groupBy("id").agg(
        F.count("*").cast("bigint").alias("n_chunks")
    ).write.mode("append").parquet(f"{index_path}/sizes")

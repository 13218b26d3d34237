"""Deduplication operators for training-data pipelines (SURVEY.md §2-C
Q-DOC-1/3 and the north-star dedup family).

Tiers, cheapest first — all shuffle-once-per-stage, no driver loops:

- exact_dedup          : sha2(text) groupBy — one shuffle on the hash.
- ngram_jaccard_pairs  : EXACT near-dup ground truth via shingle equi-join
                         (inverted index): shuffle on shingle, then on pair.
- minhash_lsh_pairs    : the 100 TB scale path — per-doc minhash signature
                         (one scan), banding, equi-join on (band, bucket) so
                         only colliding docs are compared; candidate pairs
                         verified with exact Jaccard. Recall is tunable via
                         (n_hashes, bands).
- simhash_fingerprint  : 64-bit simhash via per-token xxhash64 bit votes —
                         one explode + one groupBy; Hamming-band join for
                         candidate pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import word_shingles


from ..tables import spread  # noqa: F401  (re-export; used throughout dedup)


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical docs: keeper = min id, n_copies per group."""
    h = F.sha2(F.col(text_col), 256)
    return (
        docs.groupBy(h.alias("text_sha256"))
        .agg(F.min(id_col).alias("keeper_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def shingle_index(
    docs: DataFrame, *, k: int = 3, text_col: str = "text", id_col: str = "doc_id",
    hashed: bool = False,
) -> DataFrame:
    """(doc_id, shingle) inverted index over distinct k-word shingles.

    hashed=True emits xxhash64(shingle) instead of the string — join keys
    shrink to 8 bytes, cutting the self-join shuffle ~2.7x (measured at
    sf0.1). Collision odds over d distinct shingles ≈ d²/2⁶⁵ (~1e-8 at
    1e5 docs); at true 100 TB shingle cardinality switch to a 128-bit
    hash (two xxhash64 seeds) before trusting intersection counts."""
    sh = F.explode(word_shingles(F.col(text_col), k)).alias("shingle")
    out = spread(docs, id_col).select(F.col(id_col).alias("doc_id"), sh)
    if hashed:
        out = out.select("doc_id", F.xxhash64("shingle").alias("shingle"))
    return out


def exact_jaccard_for_candidates(
    candidates: DataFrame, idx: DataFrame, *, threshold: float
) -> DataFrame:
    """Exact Jaccard over a candidate-pair set using the FULL shingle
    index (verification is never frequency-capped — capping only prunes
    which pairs get considered, never the similarity arithmetic).
    |A∩B| via a candidate-restricted index join; |A∪B| = |A|+|B|−|A∩B|."""
    sizes = idx.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    ai, bi = idx.alias("ai"), idx.alias("bi")
    inter = (
        candidates.join(ai, F.col("doc_a") == F.col("ai.doc_id"))
        .join(bi, (F.col("doc_b") == F.col("bi.doc_id")) & (F.col("ai.shingle") == F.col("bi.shingle")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("n_b"))
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def in_bucket_pairs(banded: DataFrame, item, pair) -> DataFrame:
    """Distinct in-bucket pairs from a (band, bucket, ...) candidate stream:
    ONE groupBy collects each bucket's members as a sorted array, then an
    array comprehension expands ordered pairs (x before y, so ids ascend).

    This replaces the banded SELF-JOIN shape measured ~2× slower at sf0.1 —
    the join ran the whole upstream pipeline once per side (broadcast
    exchanges defeat ReuseExchange), the groupBy runs it once, map-side
    combinable. Worst case matches the self-join (a degenerate bucket of d
    members yields d²/2 pairs either way); the collected array costs
    item_size·d bytes in one aggregation buffer, negligible long after the
    d² pair stream itself has become the problem.

    SKEW CAVEAT: each bucket's pair expansion runs inside ONE task, so
    this shape requires fine-grained buckets (hashed band signatures,
    16-bit+ band values). With coarse buckets (e.g. the 6-7-bit pigeonhole
    bands of simhash_pairs_exact, ≤128 buckets/band) the biggest bucket
    serializes the stage — measured 2-3× slower than the self-join there;
    that call site keeps the join.

    ``item`` is the per-member expression to collect (id, or a struct
    carrying payload); ``pair(x, y)`` builds the output struct from two
    members with x sorting strictly before y."""
    buckets = (
        banded.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list(item)).alias("ids"))
        .where(F.size("ids") >= 2)
    )
    pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + F.lit(2), F.size("ids")),
                lambda y: pair(x, y),
            ),
        )
    )
    return buckets.select(F.explode(pairs).alias("p")).select("p.*").distinct()


def ngram_jaccard_pairs(
    docs: DataFrame, *, k: int = 3, threshold: float = 0.8,
    text_col: str = "text", id_col: str = "doc_id",
    max_df_frac: float | None = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs via the shingle inverted index.

    |A∩B| from the index self-join, |A∪B| = |A|+|B|−|A∩B|. Scales as the
    number of truly-colliding shingles, not |docs|². The join runs on
    hashed 8-byte shingle keys (see shingle_index docstring for collision
    math).

    ``max_df_frac`` is the hot-shingle frequency cap for 100 TB corpora:
    shingles present in more than that fraction of docs (boilerplate —
    headers, license blurbs) are dropped from CANDIDATE GENERATION only,
    so the self-join never explodes on a shingle shared by millions of
    docs (a shingle in d docs contributes d² join rows). Verification
    then recomputes exact Jaccard on the UNCAPPED index restricted to the
    surviving pairs, so every reported pair carries its true Jaccard. The
    only pairs the cap can lose are those similar EXCLUSIVELY through
    capped boilerplate; byte-identical docs are caught upstream by
    exact_dedup. With the cap unset the single-pass uncapped plan runs.
    """
    idx = shingle_index(docs, k=k, text_col=text_col, id_col=id_col, hashed=True)
    if max_df_frac is None:
        sizes = idx.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
        a, b = idx.alias("a"), idx.alias("b")
        inter = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
        sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("n_a"))
        sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("n_b"))
        jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        return (
            inter.join(sa, "doc_a")
            .join(sb, "doc_b")
            .filter(jac >= threshold)
            .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
        )

    # Capped path. HOT shingles (df > max_df_frac·n_docs) are FEW by
    # construction — at most total-occurrences/(n_docs·frac) of them — so
    # the hot set broadcasts. The plan fuses candidate generation with
    # cold-intersection counting in ONE self-join pass (the same shape as
    # the uncapped plan, minus the d² blowup shingles), then completes
    # each candidate's intersection over the tiny hot index only; naively
    # re-joining candidates against the FULL index instead was measured
    # 8× slower at sf0.1.
    n_docs = docs.select(F.countDistinct(F.col(id_col)).alias("_n_docs"))
    hot = (
        idx.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("_df"))
        .crossJoin(F.broadcast(n_docs))
        .filter(F.col("_df") > F.col("_n_docs") * max_df_frac)
        .select("shingle")
    )
    cold_idx = idx.join(F.broadcast(hot), "shingle", "left_anti")
    hot_idx = idx.join(F.broadcast(hot), "shingle")

    a, b = cold_idx.alias("a"), cold_idx.alias("b")
    inter_cold = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_cold"))
    )
    ha = hot_idx.select(F.col("doc_id").alias("doc_a"), F.col("shingle").alias("_hs"))
    hb = hot_idx.select(F.col("doc_id").alias("doc_b"), F.col("shingle").alias("_hs"))
    inter_hot = (
        inter_cold.select("doc_a", "doc_b")
        .join(F.broadcast(ha), "doc_a")
        .join(F.broadcast(hb), ["doc_b", "_hs"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_hot"))
    )
    inter = (
        inter_cold.join(inter_hot, ["doc_a", "doc_b"], "left")
        .withColumn("n_inter", F.col("n_cold") + F.coalesce(F.col("n_hot"), F.lit(0)))
    )
    sizes = idx.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("n_b"))
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(jac >= threshold)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


def minhash_signatures(
    docs: DataFrame, *, n_hashes: int = 32, k: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Per-doc minhash signature as array<bigint> (length n_hashes):
    min over shingles of xxhash64(shingle, seed_i) per hash function.

    Shape matters: explode the shingles once, hash each shingle ONCE
    (xxhash64), and derive the n_hashes functions as linear mixes
    (a_i·h + b_i) mod p of that single hash — the classic universal
    family. The n_hashes `min()` aggregates then run on cheap long
    arithmetic in the map-side partial aggregation (parallel, combine
    before shuffle). Alternatives measured at sf0.1: one
    `array_min(transform(shingles, hash_i))` per hash function ~9x
    slower (Spark's subexpression elimination won't share subtrees with
    lambda variables, so the shingle array is rebuilt n_hashes times);
    n_hashes separate xxhash64(shingle, seed) calls ~2x slower (string
    re-hashing dominates). Docs with < k tokens keep a null signature
    via explode_outer."""
    exploded = (
        spread(docs, id_col)
        .select(
            F.col(id_col).alias("doc_id"),
            F.explode_outer(word_shingles(F.col(text_col), k)).alias("_sh"),
        )
        .select(
            "doc_id",
            F.pmod(F.xxhash64("_sh"), F.lit(MINHASH_P)).alias("_h"),
        )
    )
    mins = exploded.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("_h") + F.lit(b)) % MINHASH_P).alias(f"_h{i}")
            for i, (a, b) in enumerate(MINHASH_AB[:n_hashes])
        ]
    )
    sig = F.array(*[F.col(f"_h{i}") for i in range(n_hashes)])
    return mins.select("doc_id", sig.alias("signature"))


def minhash_lsh_pairs(
    docs: DataFrame, *, n_hashes: int = 32, bands: int = 8, k: int = 3,
    threshold: float = 0.8, text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Candidate pairs via LSH banding, then exact-Jaccard verification.

    bands=8 × rows=4 over 32 hashes → collision prob at j=0.8 per band =
    0.8⁴≈0.41, overall 1-(1-0.41)⁸ ≈ 98.5% recall; false candidates are
    removed by the exact re-check, so precision is 1.0 by construction.

    Candidate generation goes through in_bucket_pairs (one groupBy + array
    pair expansion — see its docstring for the measured win over the
    banded self-join it replaced).
    """
    rows = n_hashes // bands
    sigs = minhash_signatures(docs, n_hashes=n_hashes, k=k, text_col=text_col, id_col=id_col)
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(
                        F.concat_ws(
                            ":",
                            *[
                                F.element_at("signature", b * rows + r + 1).cast("string")
                                for r in range(rows)
                            ],
                        )
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    candidates = in_bucket_pairs(
        banded,
        F.col("doc_id"),
        lambda x, y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
    )
    # exact verification restricted to candidates (never frequency-capped)
    idx = shingle_index(docs, k=k, text_col=text_col, id_col=id_col, hashed=True)
    return exact_jaccard_for_candidates(candidates, idx, threshold=threshold)


def simhash_fingerprints(
    docs: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit simhash per doc: per-token xxhash64, each bit votes ±1,
    fingerprint bit = sign of the vote sum. One explode + one groupBy."""
    tok = spread(docs, id_col).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("tok"),
    ).select("doc_id", F.xxhash64("tok").alias("h"))
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), bit).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{bit}")
            for bit in range(64)
        ]
    )
    fp = None
    for bit in range(64):
        term = F.when(F.col(f"v{bit}") > 0, F.shiftleft(F.lit(1).cast("bigint"), bit)).otherwise(
            F.lit(0).cast("bigint")
        )
        fp = term if fp is None else fp.bitwiseOR(term)
    return votes.select("doc_id", fp.alias("simhash"))


def simhash_candidate_pairs(docs: DataFrame, *, max_hamming: int = 8) -> DataFrame:
    """Near-dup candidates: docs sharing at least one of four 16-bit simhash
    bands (guaranteed to catch all pairs with Hamming distance <= 3, and most
    below max_hamming); verified by exact popcount Hamming distance."""
    fps = simhash_fingerprints(docs)
    banded = fps.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col("simhash"), b * 16).bitwiseAND(F.lit(0xFFFF)).cast("int")
                    for b in range(4)
                ]
            )
        ).alias("band", "bucket"),
    )
    return in_bucket_pairs(
        banded,
        F.struct(F.col("doc_id"), F.col("simhash")),
        lambda x, y: F.struct(
            x["doc_id"].alias("doc_a"),
            y["doc_id"].alias("doc_b"),
            F.bit_count(x["simhash"].bitwiseXOR(y["simhash"])).alias("hamming"),
        ),
    ).filter(F.col("hamming") <= max_hamming)


def simhash_fingerprints_md5(
    docs: DataFrame, *, bits: int = 60, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """60-bit simhash with an ENGINE-PORTABLE token hash — the top 15 hex
    chars of md5, identical in Spark (conv(substr(md5,1,15),16,10)) and
    DuckDB (('0x'||substr(md5,1,15))::BIGINT) — so the fingerprints, and
    therefore near-dup pairs, are oracle-checkable EXACTly (unlike the
    xxhash64 variant, whose hash exists only in Spark). Same shape as
    simhash_fingerprints: one explode + one grouped conditional-sum per
    bit, all map-side-combinable."""
    tok = spread(docs, id_col).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("tok"),
    ).select(
        "doc_id", F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long").alias("h")
    )
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(bits)
        ]
    )
    fp = None
    for b in range(bits):
        term = F.when(
            F.col(f"v{b}") > 0, F.shiftleft(F.lit(1).cast("bigint"), b)
        ).otherwise(F.lit(0).cast("bigint"))
        fp = term if fp is None else fp.bitwiseOR(term)
    return votes.select("doc_id", fp.alias("simhash"))


def simhash_pairs_exact(
    docs: DataFrame, *, max_hamming: int = 8, bits: int = 60,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """ALL pairs with Hamming(simhash) <= max_hamming, exactly, without an
    all-pairs join: split the fingerprint into (max_hamming + 1) disjoint
    bit-bands — by pigeonhole, any pair within max_hamming differing bits
    agrees on at least one whole band — equi-join on (band, band_bits)
    for candidates, then verify with popcount. Complete by construction,
    precise by verification; candidate volume scales with band-bucket
    collisions, not |docs|^2."""
    n_bands = max_hamming + 1
    base, extra = divmod(bits, n_bands)
    sizes = [base + (1 if i < extra else 0) for i in range(n_bands)]
    offsets = [sum(sizes[:i]) for i in range(n_bands)]

    fps = simhash_fingerprints_md5(docs, bits=bits, text_col=text_col, id_col=id_col)
    band_cols = [
        F.shiftright(F.col("simhash"), offsets[i])
        .bitwiseAND(F.lit((1 << sizes[i]) - 1))
        .alias(f"b{i}")
        for i in range(n_bands)
    ]
    # NOTE: stays a SELF-JOIN on purpose. The pigeonhole bands are only
    # ~bits/(max_hamming+1) ≈ 6-7 bits wide → ≤128 distinct buckets per
    # band, so in_bucket_pairs would collect huge member arrays and expand
    # each bucket's d²/2 pairs inside ONE task (measured 2-3× SLOWER at
    # sf0.1 than this join, which spreads the same pair volume across the
    # shuffle). in_bucket_pairs wins only when buckets are fine-grained;
    # see its docstring.
    banded = fps.select(
        "doc_id",
        "simhash",
        F.posexplode(F.array(*[c for c in band_cols])).alias("band", "band_bits"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_bits") == F.col("b.band_bits"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# Mersenne prime 2^31-1: products a_i * (h % P) stay under 2^62, so the
# linear family below never overflows int64 in either engine.
MINHASH_P = 2_147_483_647
# fixed odd multipliers/offsets (any constants < P work; pinned for
# reproducibility across engines and rounds)
MINHASH_AB = [(2 * i + 1, 7919 * (i + 1) % MINHASH_P) for i in range(64)]


def minhash_signatures_md5(
    docs: DataFrame, *, n_hashes: int = 16, k: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """MinHash signature with an ENGINE-PORTABLE hash family: ONE md5 per
    shingle (top-15 hex chars as bigint, identical in Spark
    conv(substr(md5,1,15),16,10) and DuckDB ('0x'||substr(...))::BIGINT),
    then n_hashes cheap linear mixes h_i = (a_i*h + b_i) mod (2^31-1) —
    the classic universal family. The earlier form computed n_hashes
    md5s per shingle; one digest + integer mixes is ~an order of
    magnitude less hashing work at equal recall, and the arithmetic is
    bit-identical in ANSI SQL so the oracle still reproduces every
    signature. One shingle explode, n_hashes map-side-combinable min()
    aggregates. Docs with < k tokens have no shingles and drop out
    (inner explode), mirroring the oracle's length filter. Output
    columns: doc_id, g0..g{n-1}."""
    exploded = spread(docs, id_col).select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), k)).alias("_sh"),
    )
    base = (
        F.conv(F.substring(F.md5(F.col("_sh")), 1, 15), 16, 10).cast("long")
        % MINHASH_P
    )
    with_base = exploded.select("doc_id", base.alias("_h"))
    return with_base.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("_h") + F.lit(b)) % MINHASH_P).alias(f"g{i}")
            for i, (a, b) in enumerate(MINHASH_AB[:n_hashes])
        ]
    )


def minhash_pairs_exact(
    docs: DataFrame, *, n_hashes: int = 16, bands: int = 8, k: int = 3,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """MinHash-LSH near-dup pairs, EXACT-oracle variant: portable md5
    signatures (16 hashes x 8 bands x 2 rows), banded equi-join for
    candidates, exact-Jaccard verification with the >= 4/5 threshold done
    in integer cross-multiplication (5*|inter| >= 4*|union|) so the cut is
    bit-identical on both engines. The Spark side is the sublinear banded
    plan (shuffle volume scales with band-bucket collisions, not |docs|^2);
    the DuckDB oracle brute-forces the same band agreement over all pairs,
    which is only feasible at fixture scale."""
    rows = n_hashes // bands
    sigs = minhash_signatures_md5(
        docs, n_hashes=n_hashes, k=k, text_col=text_col, id_col=id_col
    )
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.array(
                *[
                    F.concat_ws(
                        ":", *[F.col(f"g{b * rows + r}").cast("string") for r in range(rows)]
                    )
                    for b in range(bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    candidates = in_bucket_pairs(
        banded,
        F.col("doc_id"),
        lambda x, y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
    )
    idx = shingle_index(docs, k=k, text_col=text_col, id_col=id_col, hashed=True)
    sizes = idx.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    ai, bi = idx.alias("ai"), idx.alias("bi")
    inter = (
        candidates.join(ai, F.col("doc_a") == F.col("ai.doc_id"))
        .join(bi, (F.col("doc_b") == F.col("bi.doc_id")) & (F.col("ai.shingle") == F.col("bi.shingle")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("n_b"))
    union = F.col("n_a") + F.col("n_b") - F.col("n_inter")
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(F.col("n_inter") * 5 >= union * 4)
        .select("doc_a", "doc_b", F.round(F.col("n_inter") / union, 4).alias("jaccard"))
    )


def incremental_dedup(
    base: DataFrame, incr: DataFrame, *, k: int = 3, threshold: float = 0.8,
    text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Dedup an INCREMENT against an existing corpus without re-self-joining
    the base — the production shape for a continuously-growing training
    corpus: the expensive pair join is idx_all ⋈ idx_incr, so its cost
    scales with the increment's shingle collisions, never |base|².

    A new doc is dropped when an EARLIER doc (smaller id, in base or
    increment) is byte-identical (sha2 tier) or >= threshold shingle-Jaccard
    similar (inverted-index tier, exact |A∩B| arithmetic — same semantics
    as ngram_jaccard_pairs restricted to pairs whose LATER side is new).
    Returns the kept increment rows (doc_id only, the survivor set)."""
    all_docs = base.select(F.col(id_col), F.col(text_col)).unionByName(
        incr.select(F.col(id_col), F.col(text_col))
    )
    # exact tier: any earlier doc with identical bytes
    hashes = all_docs.select(
        F.col(id_col).alias("doc_id"), F.sha2(F.col(text_col), 256).alias("h")
    )
    ih = hashes.join(
        incr.select(F.col(id_col).alias("doc_id")), "doc_id"
    )
    earlier_same = (
        ih.alias("i")
        .join(hashes.alias("e"), (F.col("i.h") == F.col("e.h")) & (F.col("e.doc_id") < F.col("i.doc_id")))
        .select(F.col("i.doc_id").alias("doc_id"))
        .distinct()
    )
    # near tier: full index ⋈ increment-only index (the asymmetry is the
    # scale win), exact intersection counts, threshold on true Jaccard
    idx_all = shingle_index(all_docs, k=k, text_col=text_col, id_col=id_col, hashed=True)
    idx_incr = idx_all.join(
        incr.select(F.col(id_col).alias("doc_id")), "doc_id"
    )
    sizes = idx_all.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    a, b = idx_all.alias("a"), idx_incr.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_shingles").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_shingles").alias("n_b"))
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    near_dropped = (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .filter(jac >= threshold)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    dropped = earlier_same.unionByName(near_dropped).distinct()
    return (
        incr.select(F.col(id_col).alias("doc_id"))
        .join(dropped, "doc_id", "left_anti")
    )

"""Near-duplicate text detection: n-gram Jaccard (exact), MinHash+LSH,
SimHash (north-star M5 dedup family).

Design for 100 TB:
- The exact path (ngram_jaccard_pairs) uses an inverted-index self-join —
  pairs are generated ONLY for documents sharing at least one shingle,
  never a crossJoin. Hot shingles (stopword n-grams) are the quadratic
  hazard; `max_doc_freq` drops shingles whose posting list exceeds a cap,
  which bounds join fanout (standard prefix-filtering trade-off).
- MinHash compresses each document to a k-int signature (k·8 bytes vs the
  full text) before any shuffle; LSH banding turns near-dup search into an
  equi-join on (band, band_hash). This is the scale path: shuffle volume is
  O(docs · k), candidate verification is confined to colliding buckets.
- SimHash compresses to one 64-bit int; hamming-distance pairs come from
  banding the 64 bits into chunks (pigeonhole: dist ≤ d ⇒ some chunk of
  d+1 chunks is identical).

All hashing is xxhash64 (JVM-native, seedable by prefixing). The exact
Jaccard path is oracle-checkable in ANSI SQL; MinHash/SimHash outputs depend
on the engine's hash function, so the driver records rows-only checks for
them (their *verified* outputs are still exact-Jaccard-filtered).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_shingles(text_col: Column | str, n: int = 3) -> Column:
    """Distinct word n-grams per document as array<string> (n=1 → word set).

    Built-ins only: split → slide a window via transform over index range →
    array_distinct. Empty/short docs yield an empty array.
    """
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = F.split(F.trim(c), r"\s+")
    if n == 1:
        return F.array_distinct(toks)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(-1)))
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")
    )
    return F.array_distinct(grams)


def shingle_postings(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """(shingle, doc_id) posting pairs; optionally drop hot shingles.

    max_doc_freq bounds the self-join fanout at scale: a shingle appearing
    in f docs contributes f² candidate pairs.
    """
    posts = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(text_col, n)).alias("shingle"),
    )
    if max_doc_freq is not None:
        hot = (
            posts.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_doc_freq)
            .select("shingle")
        )
        posts = posts.join(F.broadcast(hot), "shingle", "left_anti")
    return posts


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact Jaccard-similar pairs over word n-gram shingle sets.

    Inverted-index join: |A∩B| from the posting self-join, |A|,|B| from a
    per-doc shingle count, J = inter/(|A|+|B|-inter). Output:
    (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.
    """
    posts = shingle_postings(df, text_col, id_col, n, max_doc_freq)
    sizes = posts.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))

    a = posts.select(F.col("shingle"), F.col("doc_id").alias("id_a"))
    b = posts.select(F.col("shingle"), F.col("doc_id").alias("id_b"))
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_shingles").alias("nb"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def _seeded_hash(col: Column, seed: int) -> Column:
    """Portable-enough seeded 64-bit hash: xxhash64 with a seed prefix."""
    return F.xxhash64(F.concat(F.lit(f"s{seed}:"), col))


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """Per-doc MinHash signature: sig[i] = min over shingles of h_i(shingle).

    One explode + one groupBy with num_hashes min() partial aggregates —
    map-side combine keeps the shuffle at O(docs · num_hashes).
    """
    posts = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(text_col, n)).alias("shingle"),
    )
    aggs = [
        F.min(_seeded_hash(F.col("shingle"), i)).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sig = posts.groupBy("doc_id").agg(*aggs)
    return sig.select(
        "doc_id",
        F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("signature"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    verify_exact: bool = True,
) -> DataFrame:
    """MinHash + LSH banding near-dup pairs, optionally exact-verified.

    Band r = num_hashes/bands rows; docs colliding on any band's hash are
    candidates (P[collide] = 1-(1-J^r)^bands). Candidates are then verified
    with exact shingle Jaccard (cheap: only colliding pairs), so the output
    is exact-above-threshold with LSH recall.
    """
    assert num_hashes % bands == 0, "bands must divide num_hashes"
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, n, num_hashes)

    band_rows = sig.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.array_join(
                                F.transform(
                                    F.slice(
                                        F.col("signature"),
                                        b * rows_per_band + 1,
                                        rows_per_band,
                                    ),
                                    lambda x: x.cast("string"),
                                ),
                                ",",
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")

    left = band_rows.select("band", "bucket", F.col("doc_id").alias("id_a"))
    right = band_rows.select("band", "bucket", F.col("doc_id").alias("id_b"))
    candidates = (
        left.join(right, ["band", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    if not verify_exact:
        return candidates

    exact = ngram_jaccard_pairs(df, text_col, id_col, n, threshold=0.0)
    return (
        candidates.join(exact, ["id_a", "id_b"])
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(df: DataFrame, text_col: str, id_col: str, n: int = 1) -> DataFrame:
    """64-bit SimHash per document from token (or n-gram) hashes.

    bit b of the hash = sign of Σ_tokens (bit b set ? +1 : -1). Expressed as
    64 conditional-sum aggregates over the exploded token hashes — all
    JVM-side, one shuffle of (doc_id, token_hash).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(text_col, n)).alias("tok"),
    ).withColumn("h", F.xxhash64(F.col("tok")))
    aggs = [
        F.sum(
            F.when(F.col("h").bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(63)  # bit 63 is the sign bit; skip to stay positive
    ]
    sums = toks.groupBy("doc_id").agg(*aggs)
    fp = F.lit(0).cast("long")
    for b in range(63):
        fp = fp + F.when(F.col(f"b{b}") > 0, F.lit(1 << b)).otherwise(0)
    return sums.select("doc_id", fp.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    n: int = 1,
) -> DataFrame:
    """Pairs with hamming(simhash) ≤ max_hamming via chunk-banding.

    Pigeonhole: split 63 bits into (max_hamming+1) chunks; any pair within
    distance d shares at least one identical chunk → equi-join on chunks,
    then exact hamming verify with bit_count(xor).
    """
    chunks = max_hamming + 1
    width = 63 // chunks + 1
    sh = simhash(df, text_col, id_col, n)
    banded = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftrightunsigned(
                            F.col("simhash"), c * width
                        ).bitwiseAND(F.lit((1 << width) - 1)).alias("key"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("cb"),
    ).select("doc_id", "simhash", "cb.chunk", "cb.key")
    a = banded.select(
        "chunk", "key", F.col("doc_id").alias("id_a"), F.col("simhash").alias("sh_a")
    )
    b = banded.select(
        "chunk", "key", F.col("doc_id").alias("id_b"), F.col("simhash").alias("sh_b")
    )
    return (
        a.join(b, ["chunk", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )

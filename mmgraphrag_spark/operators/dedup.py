"""Deduplication operators for large-scale training-data pipelines.

Exact (hash-groupBy), MinHash+LSH (shingle -> minhash -> band -> bucket join),
SimHash, n-gram Jaccard, and embedding-cosine near-dup. All candidate-generation
math is JVM-side (md5 / higher-order array functions) so it stays inside
WholeStageCodegen AND is reproducible by an external SQL oracle (the MinHash
"permutations" are lexicographic-min of md5(seed || shingle), a valid random
permutation per seed).

Scale notes: every operator here is a single hash shuffle on its bucket key.
LSH band keys distribute near-uniformly (md5), so the bucket join is skew-safe;
genuinely hot buckets (boilerplate text) are bounded by `max_bucket` salting
the same way fusion blocks are capped.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mmgraphrag_spark.functions.vectors import cosine_similarity_col


# ---------------------------------------------------------------------------
# shingling (shared by MinHash / Jaccard / fingerprinting)
# ---------------------------------------------------------------------------

def norm_text(col: Column) -> Column:
    """THE shared word normalization (lower, strip non-[a-z0-9 ], trim,
    collapse spaces) behind word_tokens / word_shingles /
    textstats.repetition_features — one definition so a character-class
    change propagates everywhere the oracles' _TOKS mirrors it."""
    cleaned = F.trim(F.regexp_replace(F.lower(col), r"[^a-z0-9 ]", " "))
    return F.regexp_replace(cleaned, r" +", " ")


def word_tokens(col: Column) -> Column:
    """Lowercased word tokens; punctuation stripped. Mirrors the DuckDB oracle:
    string_split_regex(trim(lower(regexp_replace(text,'[^a-z0-9 ]',' '))), ' +')."""
    return F.split(norm_text(col), r" +")


def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-grams; short texts fall back to the whole-token join.

    Implemented as ONE regex pass with a word-boundary lookahead (overlapping
    matches) instead of per-index array slices: higher-order array lambdas are
    interpreted (never codegen'd) and cost ~50us per shingle; the single
    regexp_extract_all is ~26x faster at sf0.1 and set-identical (verified)."""
    norm = norm_text(col)
    pat = r"\b(?=((?:[a-z0-9]+ ){%d}[a-z0-9]+))" % (n - 1)
    grams = F.regexp_extract_all(norm, F.lit(pat), 1)
    return F.when(F.size(grams) > 0, F.array_distinct(grams)).otherwise(F.array(norm))


def word_shingle_positions(col: Column, n: int) -> Column:
    """ORDERED, non-distinct word n-grams: element i of the returned array is
    the n-gram starting at token index i (the lookahead regex matches at
    every word start with >= n tokens remaining, in order). posexplode over
    this array therefore yields (token_index, shingle) — the positional
    variant decontaminate_spans needs; word_shingles stays the de-duplicated
    set variant the membership joins use."""
    pat = r"\b(?=((?:[a-z0-9]+ ){%d}[a-z0-9]+))" % (n - 1)
    return F.regexp_extract_all(norm_text(col), F.lit(pat), 1)


def minhash_sig(shingles: Column, seed: int) -> Column:
    """One MinHash value: min over shingles of md5(seed || shingle)."""
    return F.array_min(
        F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"seed{seed}:"), s)))
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct content hash with the
    representative (min id) and the duplicate count. Map-side partial agg; one
    shuffle on the md5 key."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col).alias("id"))
        .groupBy("content_hash")
        .agg(F.min("id").alias("keep_id"), F.count(F.lit(1)).alias("n_dupes"))
    )


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Keep exactly one row (min id) per distinct text."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bands: int = 4,
    rows_per_band: int = 2,
    shingle_len: int = 3,
) -> DataFrame:
    """(id, band, sig): one row per (document, LSH band); sig concatenates the
    band's rows_per_band minhashes. Documents sharing (band, sig) are near-dup
    candidates (standard banding estimate: P(collide) = 1-(1-j^r)^b)."""
    sh = word_shingles(F.col(text_col), shingle_len)
    base = df.select(F.col(id_col).alias("id"), sh.alias("_sh"))
    parts = []
    for b in range(bands):
        mins = [minhash_sig(F.col("_sh"), b * rows_per_band + r) for r in range(rows_per_band)]
        parts.append(
            base.select(
                "id", F.lit(b).alias("band"), F.concat_ws("|", *mins).alias("sig")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def lsh_candidate_pairs(
    signatures: DataFrame, max_bucket: int = 1000
) -> DataFrame:
    """(band, sig) bucket self-join -> distinct candidate pairs (a < b).

    Buckets above ``max_bucket`` are truncated deterministically (min ids kept)
    — boilerplate-text buckets would otherwise explode quadratically at scale;
    the truncation is logged into the plan as a filter, not silent sampling.
    """
    w = Window.partitionBy("band", "sig").orderBy("id")
    bounded = (
        signatures.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_bucket)
        .drop("_rn")
        # consumed twice by the self-join below; materialize once and cut the
        # (md5-transform-heavy) plan so Catalyst doesn't analyze it 2x
        .localCheckpoint()
    )
    l = bounded.select("band", "sig", F.col("id").alias("a"))
    r = bounded.select("band", "sig", F.col("id").alias("b"))
    return (
        l.join(r, ["band", "sig"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard verification (exact, on candidate pairs)
# ---------------------------------------------------------------------------

def jaccard_verify(
    pairs: DataFrame,
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_len: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard on candidate pairs; keeps pairs >= threshold.

    Two broadcast-or-shuffle equi-joins (pair ids -> shingle sets) + a JVM
    array_intersect/array_union — no UDF. Candidates are already pruned by LSH
    so this never goes quadratic."""
    sh = df.select(
        F.col(id_col).alias("_id"), word_shingles(F.col(text_col), shingle_len).alias("_sh")
    )
    a = sh.select(F.col("_id").alias("a"), F.col("_sh").alias("_sha"))
    b = sh.select(F.col("_id").alias("b"), F.col("_sh").alias("_shb"))
    return (
        pairs.join(a, "a")
        .join(b, "b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sha", "_shb"))
            / F.size(F.array_union("_sha", "_shb")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("a", "b", "jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """(id, simhash): classic SimHash over word tokens.

    Per token, bit b (b < 32) is the parity of the ascii code of the (b+1)-th
    hex digit of md5(token) — a balanced hash (8 even / 8 odd hex digits)
    chosen because the identical expression exists in ANSI SQL
    (ascii(substr(md5(t), b+1, 1)) % 2), so an external oracle can reproduce
    the fingerprint bit-for-bit. Bit b contributes +1/-1 to an accumulator;
    the sign vector is the fingerprint. All higher-order JVM expressions: one
    aggregate over the token array per row, no shuffle at all."""
    assert bits <= 32  # md5 hex has 32 digits
    toks = F.array_distinct(word_tokens(F.col(text_col)))
    acc = F.aggregate(
        toks,
        F.array_repeat(F.lit(0), bits),
        lambda acc, t: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(bits - 1)),
                lambda b: F.when(
                    F.ascii(F.substr(F.md5(t), b + 1, F.lit(1))) % 2 == 1, F.lit(1)
                ).otherwise(F.lit(-1)),
            ),
            lambda x, y: x + y,
        ),
    )
    sim = F.aggregate(
        F.zip_with(
            acc,
            F.sequence(F.lit(0), F.lit(bits - 1)),
            lambda v, b: F.when(
                v > 0, F.pow(F.lit(2.0), b.cast("double")).cast("long")
            ).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda s, x: s + x,
    )
    return df.select(F.col(id_col).alias("id"), sim.alias("simhash"))


def simhash_near_dups(sims: DataFrame, max_hamming: int = 3, bits: int = 32) -> DataFrame:
    """Near-dup pairs by Hamming distance <= max_hamming.

    Candidate generation: split the fingerprint into (max_hamming+1) bit-chunks
    — pigeonhole: any pair within the distance shares at least one exact chunk.
    Bucket-join per chunk, then exact popcount verify (bit_count).

    The input is materialized once up front: it is consumed 2x(max_hamming+1)
    times by the chunk projections and the self-join, and the fingerprint is
    an interpreted higher-order aggregate that must not be re-evaluated per
    consumer (measured 6.6 s -> sub-second on 300 docs)."""
    sims = sims.localCheckpoint()
    chunks = max_hamming + 1
    width = bits // chunks
    parts = []
    for c in range(chunks):
        key = F.shiftright(F.col("simhash"), c * width).bitwiseAND(
            F.lit((1 << width) - 1)
        )
        parts.append(
            sims.select("id", "simhash", F.lit(c).alias("chunk"), key.alias("key"))
        )
    keyed = parts[0]
    for p in parts[1:]:
        keyed = keyed.unionByName(p)
    l = keyed.select("chunk", "key", F.col("id").alias("a"), F.col("simhash").alias("ha"))
    r = keyed.select("chunk", "key", F.col("id").alias("b"), F.col("simhash").alias("hb"))
    return (
        l.join(r, ["chunk", "key"])
        .filter(F.col("a") < F.col("b"))
        .withColumn("hamming", F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
        .distinct()
    )


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_dups(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Pairs of embeddings with cosine >= threshold.

    Exact-oracle path: full self-join (id a < b) with JVM-side cosine — the
    correctness baseline for small inputs and the recall reference for the
    bucketed variant. For anything big use ``embedding_near_dups_lsh``: this
    one plans as a BroadcastNestedLoopJoin (O(N^2)) and would not survive
    scale."""
    a = embeddings.select(F.col(id_col).alias("a"), F.col(vec_col).alias("_va"))
    b = embeddings.select(F.col(id_col).alias("b"), F.col(vec_col).alias("_vb"))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .withColumn("cosine", cosine_similarity_col(F.col("_va"), F.col("_vb")))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def near_dup_groups(
    pairs: DataFrame, df: DataFrame, id_col: str = "id", max_iter: int = 50
) -> DataFrame:
    """The dedup DECISION step: verified candidate pairs -> connected
    components -> one representative (min id) per duplicate group.

    Candidate generation (MinHash/LSH, SimHash, embedding LSH) emits PAIRS;
    a production pipeline must then pick keep/drop sets even when duplicates
    chain (a~b, b~c). Components come from the same hash-min loop fusion uses
    (shallow star/chain graphs converge in 2-3 rounds); the component map
    covers only ids that appear in some pair — tiny relative to the corpus —
    and joins back to the full id set (Catalyst picks broadcast when it fits;
    no hint, because at extreme dup rates the map may not be broadcastable).
    Output: one row per input row — (id, keep_id, is_duplicate)."""
    from mmgraphrag_spark.operators.fusion import connected_components

    # near-dup graphs CHAIN (a~b~c via incremental drift): the hash-min loop
    # pointer-jumps through its own previous round, so label reach is
    # 2^rounds - 1 and max_iter=50 covers any materializable chain depth;
    # connected_components raises rather than returning unconverged labels
    comp = connected_components(
        pairs.select(F.col("a").alias("alias"), F.col("b").alias("canonical")),
        max_iter=max_iter,
    )
    m = comp.select(
        F.col("entity_name").alias("_id"), F.col("component").alias("_keep")
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(m, F.col("id") == F.col("_id"), "left")
        .drop("_id")
        .withColumn("keep_id", F.coalesce(F.col("_keep"), F.col("id")))
        .drop("_keep")
        .withColumn("is_duplicate", F.col("id") != F.col("keep_id"))
    )


def embedding_near_dups_lsh(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_bits: int = 8,
) -> DataFrame:
    """Scale path for embedding near-dup: sign-bit LSH candidate join + exact
    cosine verify (same blocking as similarity.lsh_topk).

    One side keyed by its own sign-bit bucket; the other side expanded to its
    bucket plus all Hamming-1 flips (multi-probe), so the equi-join covers
    every pair whose sign patterns differ in at most ONE of the first
    ``n_bits`` components. High-cosine pairs rarely disagree on component
    signs, so recall vs the exact all-pairs result is high (asserted in
    tests); the join itself is a single hash shuffle on the bucket key —
    O(sum of bucket^2), never the full O(N^2) cartesian. At 100 TB raise
    ``n_bits`` (16-24) so bucket sizes stay bounded; the plan shape is
    unchanged."""
    from mmgraphrag_spark.operators.similarity import signbit_bucket

    base = embeddings.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        signbit_bucket(F.col(vec_col), n_bits).alias("_bkt"),
    )
    left = base.select(
        F.col("_id").alias("a"), F.col("_v").alias("_va"), F.col("_bkt").alias("bucket")
    )
    flips = F.array(
        F.col("_bkt"), *[F.col("_bkt").bitwiseXOR(F.lit(1 << i)) for i in range(n_bits)]
    )
    right = base.select(
        F.col("_id").alias("b"),
        F.col("_v").alias("_vb"),
        F.explode(flips).alias("bucket"),
    )
    # each unordered pair matches on at most one bucket value (the probe set
    # per row is distinct), so no dedup pass is needed after the join
    return (
        left.join(right, "bucket")
        .filter(F.col("a") < F.col("b"))
        .withColumn("cosine", cosine_similarity_col(F.col("_va"), F.col("_vb")))
        .filter(F.col("cosine") >= threshold)
        .select("a", "b", "cosine")
    )


def decontaminate(
    df: DataFrame,
    id_col: str,
    text_col: str,
    benchmark: DataFrame,
    bench_id_col: str,
    bench_text_col: str,
    shingle_len: int = 5,
    min_overlap: int = 1,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """(id, bench_id, n_shared): training docs sharing >= min_overlap DISTINCT
    word n-grams with a benchmark/eval document — the decontamination pass a
    pretraining pipeline runs so test sets don't leak into training data
    (the n-gram-overlap rule of GPT-3 appx C / PaLM / Llama reports).

    Scale shape: explode distinct shingles on both sides and equi-join on the
    shingle string. The benchmark side is tiny relative to a 100 TB corpus,
    so it broadcasts by default (one map-side hash join, zero shuffles of the
    big side; set broadcast_benchmark=False to fall back to a shuffle join
    when the eval suite itself is huge). groupBy (id, bench_id) counts
    distinct shared shingles with map-side partial aggregation; shingle
    explosion is bounded by document length, and word_shingles is the shared
    single-pass regex (no per-index array slicing).

    This variant FLAGS whole documents (the per-doc report an auditor
    reads). GPT-3 appendix C's production rule matches on 13-grams and cuts
    a window AROUND each collision instead of dropping the document — that
    is :func:`decontaminate_spans` (shingle_len=13 default)."""
    d_sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), shingle_len)).alias("shingle"),
    )
    b_sh = benchmark.select(
        F.col(bench_id_col).alias("bench_id"),
        F.explode(word_shingles(F.col(bench_text_col), shingle_len)).alias("shingle"),
    )
    if broadcast_benchmark:
        b_sh = F.broadcast(b_sh)
    return (
        d_sh.join(b_sh, "shingle")
        .groupBy("id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_overlap)
    )


def decontaminate_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    benchmark: DataFrame,
    bench_text_col: str,
    shingle_len: int = 13,
    pad_tokens: int = 20,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """(id, span_start, span_end): merged TOKEN-index cut spans around every
    benchmark n-gram collision — the GPT-3 appendix C production rule (13-gram
    overlap, remove a window AROUND the collision rather than the document;
    GPT-3 pads ~200 characters, here ``pad_tokens`` word tokens).

    Coordinates are 0-based inclusive indices into ``word_tokens(text)`` —
    the one normalization every operator here shares — so a cutter that
    re-tokenizes the same way can excise [span_start, span_end] exactly; raw
    character offsets would not survive the normalization. Each colliding
    n-gram at token position p cuts [p - pad_tokens, p + shingle_len - 1 +
    pad_tokens] clamped to the document; overlapping/adjacent cuts merge
    into maximal spans (gaps-and-islands), so the output is the minimal cut
    list per document.

    Scale shape: the corpus side is scanned ONCE (posexplode of the ordered
    shingle array); the benchmark side reduces to a distinct-shingle set
    that broadcasts by default, so the join is map-side and the only rows
    that ever shuffle are the COLLISIONS — rare by construction (a corpus
    saturated with eval text has bigger problems). The island merge is a
    per-doc window + groupBy(id, island) over those collision rows only;
    both keys are collision-bounded, never corpus-bounded."""
    idc = F.col(id_col)
    d = df.select(
        idc.alias("id"),
        F.size(word_tokens(F.col(text_col))).alias("_ntok"),
        F.posexplode(word_shingle_positions(F.col(text_col), shingle_len)).alias(
            "pos", "shingle"
        ),
    )
    b_sh = benchmark.select(
        F.explode(word_shingles(F.col(bench_text_col), shingle_len)).alias("shingle")
    ).distinct()
    if broadcast_benchmark:
        b_sh = F.broadcast(b_sh)
    hits = d.join(b_sh, "shingle").select(
        "id",
        F.greatest(F.col("pos") - pad_tokens, F.lit(0)).alias("s"),
        F.least(
            F.col("pos") + (shingle_len - 1) + pad_tokens, F.col("_ntok") - 1
        ).alias("e"),
    )
    w = Window.partitionBy("id").orderBy("s", "e")
    prev_max_e = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    island = F.sum(
        F.when(F.col("s") > prev_max_e + 1, 1).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        hits.withColumn("_isl", island)
        .groupBy("id", "_isl")
        .agg(F.min("s").alias("span_start"), F.max("e").alias("span_end"))
        .drop("_isl")
    )

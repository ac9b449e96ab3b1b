"""Dedup operator tests: exact, MinHash+LSH, SimHash, Jaccard, embedding-cosine."""

from __future__ import annotations

from pyspark.sql import functions as F

from mmgraphrag_spark.operators import dedup as D


def _docs(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the sun sets "
        "slowly behind the tall green hills today"
    )
    near = (
        "the quick brown fox jumps over the lazy dog while the sun sets "
        "slowly behind the tall green hills tonight"
    )
    other = "completely unrelated content about spark shuffles and partitions here"
    return spark.createDataFrame(
        [(1, base), (2, base), (3, near), (4, other)], ["id", "text"]
    )


def test_exact_dedup(spark):
    df = _docs(spark)
    groups = D.exact_dedup_groups(df, "id", "text").collect()
    assert sorted((g.keep_id, g.n_dupes) for g in groups) == [(1, 2), (3, 1), (4, 1)]
    kept = D.exact_dedup(df, "id", "text")
    assert sorted(r.id for r in kept.collect()) == [1, 3, 4]


def test_minhash_lsh_finds_near_dups(spark):
    df = _docs(spark)
    sigs = D.minhash_signatures(df, "id", "text", bands=4, rows_per_band=2)
    assert sigs.count() == 4 * 4  # one row per (doc, band)
    pairs = {(p.a, p.b) for p in D.lsh_candidate_pairs(sigs).collect()}
    assert (1, 2) in pairs  # identical docs always collide
    assert (1, 3) in pairs or (2, 3) in pairs  # near-dup caught by some band
    assert not any(4 in p for p in pairs)  # unrelated doc never pairs


def test_jaccard_verify(spark):
    df = _docs(spark)
    pairs = spark.createDataFrame([(1, 2), (1, 3), (1, 4)], ["a", "b"])
    got = {(r.a, r.b): r.jaccard for r in D.jaccard_verify(pairs, df, "id", "text", threshold=0.5).collect()}
    assert got[(1, 2)] == 1.0
    assert (1, 3) in got and got[(1, 3)] < 1.0
    assert (1, 4) not in got


def test_simhash_and_near_dups(spark):
    df = _docs(spark)
    sims = D.simhash(df, "id", "text")
    vals = {r.id: r.simhash for r in sims.collect()}
    assert vals[1] == vals[2]
    # near-dup shares most bits; unrelated differs in many
    ham = lambda x, y: bin(x ^ y).count("1")
    assert ham(vals[1], vals[3]) < ham(vals[1], vals[4])
    pairs = {(p.a, p.b): p.hamming for p in D.simhash_near_dups(sims, max_hamming=3).collect()}
    assert pairs[(1, 2)] == 0


def test_embedding_near_dups(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),
        (3, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    got = {(r.a, r.b) for r in D.embedding_near_dups(df, threshold=0.95).collect()}
    assert got == {(1, 2)}


def test_embedding_near_dups_lsh_recall(spark):
    """Bucketed near-dup must find (nearly) every true near-dup pair: genuine
    near-duplicate vectors (cosine >= 0.95) almost never disagree on leading
    component signs, so Hamming<=1 multi-probe recall is high. Deterministic
    synthetic corpus: 40 base vectors, each with a jittered near-duplicate."""
    import math
    import random

    rng = random.Random(7)
    rows = []
    dim = 16
    for i in range(40):
        base = [rng.uniform(-1, 1) for _ in range(dim)]
        n = math.sqrt(sum(x * x for x in base))
        base = [x / n for x in base]
        dup = [x + rng.uniform(-0.01, 0.01) for x in base]
        rows.append((2 * i, base))
        rows.append((2 * i + 1, dup))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    exact = {(r.a, r.b) for r in D.embedding_near_dups(df, threshold=0.95).collect()}
    approx = {
        (r.a, r.b)
        for r in D.embedding_near_dups_lsh(df, threshold=0.95, n_bits=8).collect()
    }
    assert len(exact) >= 40  # every planted duplicate pair is a true near-dup
    assert approx <= exact  # no false positives: same verify expression
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, f"recall {recall:.3f}"


def test_embedding_near_dups_lsh_no_bnlj(spark):
    """The bucketed variant must plan as an equi-join on the bucket key —
    never a BroadcastNestedLoopJoin/cartesian like the exact path."""
    df = spark.createDataFrame([(1, [1.0, 0.0]), (2, [0.9, 0.1])], ["vec_id", "embedding"])
    plan = D.embedding_near_dups_lsh(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_near_dup_groups_transitive(spark):
    """Dedup decision: chained pairs (a~b, b~c) collapse to one group with
    the min id as representative; unpaired rows keep themselves."""
    pairs = spark.createDataFrame([(2, 1), (2, 3), (7, 9)], ["a", "b"])
    ids = spark.createDataFrame([(i,) for i in range(1, 11)], ["doc_id"])
    out = {r.id: (r.keep_id, r.is_duplicate)
           for r in D.near_dup_groups(pairs, ids, id_col="doc_id").collect()}
    assert out[1] == (1, False) and out[2] == (1, True) and out[3] == (1, True)
    assert out[7] == (7, False) and out[9] == (7, True)
    assert out[5] == (5, False)  # untouched row keeps itself
    assert len(out) == 10


def test_decontaminate_flags_overlap(spark):
    """A training doc that copies a benchmark phrase is flagged with the
    distinct-5-gram overlap count; unrelated docs are not; the benchmark doc
    joined to itself (when present in training data) shares ALL its shingles."""
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog every day")],
        ["bid", "text"],
    )
    docs = spark.createDataFrame(
        [
            # verbatim copy -> all 7 5-grams shared (11 tokens)
            (1, "the quick brown fox jumps over the lazy dog every day"),
            # partial copy: shares exactly the 2 5-grams inside the copied span
            (2, "we saw the quick brown fox jumps over a fence"),
            (3, "completely unrelated text about spark plans and shuffles"),
        ],
        ["doc_id", "text"],
    )
    out = {
        (r.id, r.bench_id): r.n_shared
        for r in D.decontaminate(
            docs, "doc_id", "text", bench, "bid", "text", shingle_len=5, min_overlap=1
        ).collect()
    }
    assert out[(1, 100)] == 7  # 11 tokens -> 7 overlapping 5-grams
    assert out[(2, 100)] == 2  # "the quick brown fox jumps", "quick brown fox jumps over"
    assert (3, 100) not in out
    # min_overlap prunes the partial match
    out3 = D.decontaminate(
        docs, "doc_id", "text", bench, "bid", "text", shingle_len=5, min_overlap=3
    )
    assert {r.id for r in out3.collect()} == {1}


def test_decontaminate_spans(spark):
    """GPT-3 appx-C span cuts: token-index windows around each 13-gram
    collision, clamped to the doc, overlapping/adjacent spans merged."""
    canary = "c01 c02 c03 c04 c05 c06 c07 c08 c09 c10 c11 c12 c13"  # 13 words
    bench = spark.createDataFrame([(canary,)], ["text"])
    filler = " ".join(f"f{i:02d}" for i in range(20))
    docs = spark.createDataFrame(
        [
            # collision at pos 3; 20 tokens total -> span [1, 17] with pad 2
            (1, f"x0 x1 x2 {canary} y0 y1 y2 y3"),
            # two overlapping collisions (pos 0 and 14) -> ONE merged span
            (2, f"{canary} z1 {canary}"),
            # two far-apart collisions (pos 0 and 33) -> TWO spans
            (3, f"{canary} {filler} {canary}"),
            (4, "completely unrelated text with no benchmark overlap at all"),
        ],
        ["doc_id", "text"],
    )
    out = D.decontaminate_spans(
        docs, "doc_id", "text", bench, "text", shingle_len=13, pad_tokens=2
    )
    got = sorted((r.id, r.span_start, r.span_end) for r in out.collect())
    assert got == [
        (1, 1, 17),
        (2, 0, 26),   # [0,14] and [12,26] merge; clamp to ntok-1 = 26
        (3, 0, 14), (3, 31, 45),
    ]
    # the big side must broadcast-join the benchmark shingle set
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan


def test_word_shingle_positions_ordered(spark):
    """Element i of word_shingle_positions is the n-gram starting at token i
    (the posexplode contract decontaminate_spans depends on)."""
    df = spark.createDataFrame([("The quick brown fox jumps",)], ["text"])
    arr = df.select(D.word_shingle_positions(F.col("text"), 3).alias("a")).first().a
    assert arr == ["the quick brown", "quick brown fox", "brown fox jumps"]


def test_decontaminate_broadcasts_benchmark(spark):
    """Default mode must plan the benchmark side as a broadcast hash join (the
    big training side never shuffles); the fallback must not broadcast."""
    bench = spark.createDataFrame([(1, "a b c d e f")], ["bid", "text"])
    docs = spark.createDataFrame([(2, "a b c d e f g")], ["doc_id", "text"])
    plan = D.decontaminate(docs, "doc_id", "text", bench, "bid", "text")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    plan2 = D.decontaminate(
        docs, "doc_id", "text", bench, "bid", "text", broadcast_benchmark=False
    )._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan2 or "ShuffledHashJoin" in plan2

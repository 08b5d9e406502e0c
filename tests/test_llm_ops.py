"""LLM-data operator tests: recall against exact ground truth,
determinism, and plumbing shapes."""

import pytest

from pyspark.sql import functions as F

from getl_spark.functions import dedup, multimodal, similarity, text

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    """Synthetic corpus with planted near-duplicates."""
    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the tall green tree near the old stone wall by the river"
    )
    rows = [(0, base), (1, base.replace("quick", "fast")),  # near-dup of 0
            (2, base.replace("river", "lake").replace("cat", "bird")),  # near-dup
            (3, "completely different text about spark engines and big data"),
            (4, "another unrelated document mentioning parquet files and schemas")]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def test_exact_dedup_deterministic_winner(spark):
    df = spark.createDataFrame(
        [(3, "x"), (1, "x"), (2, "y")], "id BIGINT, k STRING"
    )
    out = dedup.exact(df, ["k"], order_by="id")
    assert sorted((r.id, r.k) for r in out.collect()) == [(1, "x"), (2, "y")]


def test_minhash_recall_against_exact(docs):
    """Every high-similarity pair found exactly must be recovered by the
    LSH pipeline (at j>=0.3 with 16 bands of 4 rows, collision
    probability is ~1; the verify stage then makes precision exact)."""
    exact_pairs = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard(docs, threshold=0.3).collect()
    }
    lsh_pairs = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh(docs, threshold=0.3).collect()
    }
    assert lsh_pairs <= exact_pairs  # verification guarantees precision
    if exact_pairs:
        recall = len(lsh_pairs & exact_pairs) / len(exact_pairs)
        assert recall >= 0.8


def test_minhash_finds_planted_near_dups(near_dup_docs):
    pairs = {
        (r.id_a, r.id_b)
        for r in dedup.minhash_lsh(near_dup_docs, threshold=0.3).collect()
    }
    assert (0, 1) in pairs and (0, 2) in pairs
    assert all(3 not in p and 4 not in p for p in pairs)


def test_simhash_separates_near_dups(near_dup_docs):
    pairs = dedup.simhash_pairs(near_dup_docs, max_hamming=16).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 1) in found
    by_pair = {(r.id_a, r.id_b): r.hamming for r in pairs}
    # planted near-dups are closer in hamming space than unrelated docs
    assert by_pair[(0, 1)] <= min(
        [h for (a, b), h in by_pair.items() if 3 in (a, b) or 4 in (a, b)],
        default=64,
    )


def test_embedding_cosine_lsh_vs_bruteforce(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(20, 16).astype("float32")
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        # planted near-duplicate: tiny perturbation
        rows.append((100 + i, [float(x) for x in v + rng.randn(16) * 0.01]))
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    brute = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_cosine_pairs(
            df, threshold=0.99, brute_force=True
        ).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_cosine_pairs(df, threshold=0.99).collect()
    }
    assert lsh <= brute
    assert len(lsh) / len(brute) >= 0.9  # high-threshold pairs share buckets


def test_topk_lsh_recall_on_clustered_vectors(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    centers = rng.randn(5, 16) * 3
    rows = []
    vid = 0
    for c in centers:
        for _ in range(20):
            rows.append((vid, [float(x) for x in c + rng.randn(16) * 0.1]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    brute = similarity.topk(df, query_ids=[0, 20, 40], k=5)
    approx = similarity.topk(df, query_ids=[0, 20, 40], k=5, method="lsh")
    b = {(r.query_id, r.nbr_id) for r in brute.collect()}
    a = {(r.query_id, r.nbr_id) for r in approx.collect()}
    assert len(a & b) / len(b) >= 0.8


def test_lang_id_accuracy(spark):
    rows = [
        (0, "the cat sat on the mat and it is a good day for the dog", "en"),
        (1, "der hund und die katze sind nicht in das haus mit der maus", "de"),
        (2, "le chat est dans la maison et les oiseaux sont pour le jardin", "fr"),
        (3, "el perro y el gato es un animal de la casa que es muy bueno", "es"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING, lang STRING")
    out = text.lang_id(df)
    assert all(r.lang_pred == r.lang for r in out.collect())


def test_quality_and_token_count(spark):
    df = spark.createDataFrame([(0, "one two three 42")], "doc_id BIGINT, text STRING")
    q = text.quality(df).first()
    assert q.q_n_words == 4 and q.q_n_chars == 16
    tc = text.token_count(df).first()
    assert tc.n_tokens == 4 and tc.n_tokens_bpe_est == 4


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(0, "Hello  World"), (1, "hello world")], "doc_id BIGINT, text STRING"
    )
    fps = [r.fingerprint for r in text.fingerprint(df).collect()]
    assert fps[0] == fps[1]


def test_multimodal_feature_shapes(docs):
    media = multimodal.to_media(docs, "text")
    assert dict(media.dtypes)["content"] == "binary"
    feats = multimodal.extract_features(media)
    rows = feats.limit(5).collect()
    assert all(len(r.sha256) == 64 and r.n_bytes > 0 for r in rows)


def test_frame_sample_explodes_rows(docs):
    media = multimodal.to_media(docs.limit(10), "text")
    frames = multimodal.frame_sample(media, num_frames=3)
    assert frames.count() == 30
    assert frames.groupBy("doc_id").count().first()["count"] == 3


def test_topk_ivf_recall_on_clustered_vectors(spark):
    import numpy as np

    rng = np.random.RandomState(13)
    centers = rng.randn(5, 16) * 3
    rows = []
    vid = 0
    for c in centers:
        for _ in range(20):
            rows.append((vid, [float(x) for x in c + rng.randn(16) * 0.1]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    brute = similarity.topk(df, query_ids=[0, 20, 40], k=5)
    ivf = similarity.topk(df, query_ids=[0, 20, 40], k=5, method="ivf")
    b = {(r.query_id, r.nbr_id) for r in brute.collect()}
    a = {(r.query_id, r.nbr_id) for r in ivf.collect()}
    assert len(a & b) / len(b) >= 0.8


def test_against_index_exact_and_near(spark, near_dup_docs):
    index = near_dup_docs.where("doc_id IN (0, 3)")
    new = near_dup_docs.where("doc_id IN (1, 2, 4)").unionByName(
        near_dup_docs.where("doc_id = 3").selectExpr("100 AS doc_id", "text")
    )
    # exact only: doc 100 (same text as indexed 3) is dropped
    exact_survivors = {r.doc_id for r in dedup.against_index(new, index).collect()}
    assert exact_survivors == {1, 2, 4}
    # near phase: 1 and 2 are near-dups of indexed 0 -> only 4 survives
    near_survivors = {
        r.doc_id
        for r in dedup.against_index(new, index, near_threshold=0.3).collect()
    }
    assert near_survivors == {4}


def test_scrub_and_normalize(spark):
    df = spark.createDataFrame(
        [(0, "Email a.b@c.org or visit https://x.io/page then call 0123 456 7890 ok")],
        "doc_id BIGINT, text STRING",
    )
    out = text.normalize(text.scrub(df), "text_scrubbed", "norm").first()
    assert "<EMAIL>" in out.text_scrubbed
    assert "<URL>" in out.text_scrubbed
    assert "<NUMBER>" in out.text_scrubbed
    assert "a.b@c.org" not in out.text_scrubbed
    assert out.norm == "email email or visit url then call number ok"


def test_embedding_cosine_banded_recall_across_boundaries(spark):
    """The single-band scheme this replaced missed any pair straddling
    one of its hyperplanes. With banding (any-band match), recall on
    planted cosine≈0.99 pairs must be ≥0.9 regardless of which single
    planes the pair straddles."""
    import numpy as np

    rng = np.random.RandomState(23)
    rows = []
    for i in range(60):
        v = rng.randn(32)
        rows.append((i, [float(x) for x in v]))
        rows.append((1000 + i, [float(x) for x in v + rng.randn(32) * 0.02]))
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    planted = {(i, 1000 + i) for i in range(60)}
    lsh = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_cosine_pairs(df, threshold=0.95).collect()
    }
    brute = {
        (r.id_a, r.id_b)
        for r in dedup.embedding_cosine_pairs(
            df, threshold=0.95, brute_force=True
        ).collect()
    }
    assert lsh <= brute  # verify step: no false positives
    found_planted = lsh & planted
    assert len(found_planted) / len(planted & brute) >= 0.9


def test_embedding_dim_empty_corpus_message(spark):
    from getl_spark.functions.similarity import embedding_dim

    empty = spark.createDataFrame([], "vec_id BIGINT, embedding ARRAY<FLOAT>")
    with pytest.raises(ValueError, match="no non-null"):
        embedding_dim(empty, "embedding")


def test_ngram_jaccard_max_df_caps_stopword_skew(spark):
    """Every doc shares one ubiquitous phrase; without the df cutoff the
    inverted index emits all O(n^2) candidate pairs through that one
    posting list. With max_df, the stop shingle is dropped from
    candidate generation (bounded candidates) while the surviving
    pairs' jaccard values stay exact (intersection re-counted against
    the full shingle table)."""
    stop = "lorem ipsum dolor sit amet"
    rows = [(i, f"{stop} unique{i} token{i} text{i}") for i in range(40)]
    # planted near-dup pair sharing rare content
    rows.append((100, f"{stop} shared shared shared alpha beta gamma"))
    rows.append((101, f"{stop} shared shared shared alpha beta delta"))
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")

    uncapped = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard(df, threshold=0.01, n=3).collect()
    }
    capped = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.ngram_jaccard(df, threshold=0.01, n=3, max_df=5).collect()
    }
    # uncapped: the stop phrase makes every pair a candidate -> ~n^2/2
    assert len(uncapped) == (42 * 41) // 2
    # capped: only pairs sharing a rare shingle survive -> bounded
    assert len(capped) < 42
    # the planted pair survives with the EXACT same jaccard value
    assert (100, 101) in capped
    assert capped[(100, 101)] == uncapped[(100, 101)]
    # and every capped pair's value matches the exact computation
    assert all(uncapped[p] == j for p, j in capped.items())


def test_embedding_cosine_null_vectors_and_empty_partitions(spark):
    """Null embedding rows are filtered before the band-key UDF (a null
    would turn the Arrow batch into dtype=object), and empty partitions
    (zero-row batches) don't break the matmul."""
    from getl_spark.functions import dedup

    rows = [(0, [1.0, 0.0, 0.0]), (1, [1.0, 0.001, 0.0]), (2, None), (3, [0.0, 1.0, 0.0])]
    df = spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    ).repartition(16)
    pairs = dedup.embedding_cosine_pairs(df, threshold=0.99).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert got == {(0, 1)}


def test_embedding_cosine_planes_kwarg_deprecated(spark):
    import pytest as _pytest

    from getl_spark.functions import dedup

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [1.0, 0.01])], "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    )
    with _pytest.warns(DeprecationWarning, match="planes_per_band"):
        out = dedup.embedding_cosine_pairs(df, threshold=0.99, planes=8)
    assert {(r.id_a, r.id_b) for r in out.collect()} == {(0, 1)}


def test_compression_ratio_orders_redundancy(spark):
    from getl_spark.functions import text as T

    df = spark.createDataFrame(
        [
            (0, "spam " * 200),                      # highly repetitive
            (1, "the quick brown fox jumps over the lazy dog and then "
                "discusses entropy, compression, and corpora at length"),
            (2, None),
            (3, ""),
        ],
        "doc_id BIGINT, text STRING",
    )
    got = {r.doc_id: r.compression_ratio for r in T.compression_ratio(df).collect()}
    assert got[0] < 0.1 < got[1]
    assert got[2] is None and got[3] == 1.0
    # deterministic across invocations
    again = {r.doc_id: r.compression_ratio for r in T.compression_ratio(df).collect()}
    assert got == again


def test_remove_common_lines_strips_boilerplate(spark):
    """Lines shared by many docs vanish; unique content and line order
    survive; DuckDB cross-check of the same semantics."""
    import duckdb

    from getl_spark.functions import text as T

    docs = [
        (i, f"unique opener {i}\nCOOKIE BANNER\nbody text {i}\nCOPYRIGHT FOOTER")
        for i in range(8)
    ] + [(100, "no boilerplate here\njust content")]
    df = spark.createDataFrame(docs, "doc_id BIGINT, text STRING")
    got = {
        r.doc_id: r.text
        for r in T.remove_common_lines(df, max_df=3).collect()
    }
    assert got[0] == "unique opener 0\nbody text 0"
    assert got[100] == "no boilerplate here\njust content"
    assert len(got) == 9

    # DuckDB replica of the semantics over the same rows
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", docs)
    duck = {
        r[0]: r[1]
        for r in con.execute("""
            WITH lines AS (
              SELECT doc_id, g.i AS pos, l.line
              FROM docs,
                   LATERAL (SELECT string_split(text, chr(10)) AS ls) s,
                   LATERAL (SELECT unnest(range(1, len(s.ls)+1)) AS i) g,
                   LATERAL (SELECT s.ls[g.i] AS line) l),
            freq AS (
              SELECT line FROM lines WHERE length(line) >= 1
              GROUP BY line HAVING COUNT(DISTINCT doc_id) > 3)
            SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
            FROM lines WHERE line NOT IN (SELECT line FROM freq)
            GROUP BY doc_id
        """).fetchall()
    }
    assert got == duck


def test_remove_common_lines_keeps_blank_separators(spark):
    from getl_spark.functions import text as T

    df = spark.createDataFrame(
        [(i, f"a{i}\n\nb{i}") for i in range(5)], "doc_id BIGINT, text STRING"
    )
    got = T.remove_common_lines(df, max_df=2, min_len=1).collect()
    # blank line occurs in all 5 docs but is under min_len → kept
    assert all(r.text == f"a{r.doc_id}\n\nb{r.doc_id}" for r in got)


def test_url_host_extraction(spark):
    from getl_spark.functions import text as T

    df = spark.createDataFrame(
        [
            (0, "https://www.Example.COM/path?q=1"),
            (1, "http://sub.site.org:8080/x"),
            (2, "not a url"),
        ],
        "doc_id BIGINT, url STRING",
    )
    got = {r.doc_id: r.host for r in T.url_host(df, "url").collect()}
    assert got[0] == "example.com"
    assert got[1] == "sub.site.org"
    assert got[2] is None


# ------------------------------------------------------------ fuzzy_join
@pytest.fixture(scope="module")
def fuzzy_tables(spark):
    """Two tables with hand-computable 3-gram Jaccard pairs.

    left 1 vs right 10: shingle sets {"a b c","b c d","c d e"} vs
    {"a b c","b c d","c d x"} — inter 2, union 4, J = 0.5.
    left 2 vs right 12: identical text, J = 1.0.
    right 11 shares nothing with anything.
    """
    left = spark.createDataFrame(
        [(1, "a b c d e"), (2, "p q r s")], "doc_id BIGINT, text STRING"
    )
    right = spark.createDataFrame(
        [(10, "a b c d x"), (11, "z0 z1 z2 z3"), (12, "p q r s")],
        "doc_id BIGINT, text STRING",
    )
    return left, right


def test_fuzzy_join_known_jaccard_pairs(fuzzy_tables):
    left, right = fuzzy_tables
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.fuzzy_join(left, right, threshold=0.5).collect()
    }
    assert got == {(1, 10): 0.5, (2, 12): 1.0}


def test_fuzzy_join_matches_exact_jaccard_on_corpus(spark, docs):
    """Cross-table fuzzy_join over an even/odd split of the corpus must
    equal the cross-parity subset of the exact all-pairs ngram_jaccard."""
    left = docs.where("doc_id % 2 = 0")
    right = docs.where("doc_id % 2 = 1")
    exact = {
        tuple(sorted((r.id_a, r.id_b))): r.jaccard
        for r in dedup.ngram_jaccard(docs, threshold=0.12).collect()
        if (r.id_a % 2) != (r.id_b % 2)
    }
    got = {
        tuple(sorted((r.id_a, r.id_b))): r.jaccard
        for r in dedup.fuzzy_join(left, right, threshold=0.12).collect()
    }
    assert got == exact
    # id_a always comes from the left table
    for r in dedup.fuzzy_join(left, right, threshold=0.12).collect():
        assert r.id_a % 2 == 0 and r.id_b % 2 == 1


def test_fuzzy_join_max_df_equivalence_and_pruning(spark):
    """max_df high → identical to the plain path; max_df low → a pair
    whose EVERY shared shingle is hot is dropped, while pairs that also
    share a rare shingle survive with their EXACT (uncapped) jaccard."""
    hot = "the common filler phrase here"  # 3-grams shared by many docs
    left = spark.createDataFrame(
        [(1, f"{hot} alpha beta gamma"), (2, hot), (3, "unrelated words only here")],
        "doc_id BIGINT, text STRING",
    )
    right = spark.createDataFrame(
        [(10, f"{hot} alpha beta gamma"), (11, hot)]
        + [(20 + i, f"{hot} padding{i} x{i} y{i}") for i in range(6)],
        "doc_id BIGINT, text STRING",
    )
    plain = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.fuzzy_join(left, right, threshold=0.2).collect()
    }
    high = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.fuzzy_join(left, right, threshold=0.2, max_df=100).collect()
    }
    assert high == plain
    low = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.fuzzy_join(left, right, threshold=0.2, max_df=2).collect()
    }
    # (2, 11) share ONLY the hot shingles -> pruned from candidates
    assert (2, 11) in plain and (2, 11) not in low
    # (1, 10) also share the rare "alpha beta gamma" shingles -> kept,
    # and the jaccard is the exact uncapped value
    assert low[(1, 10)] == plain[(1, 10)] == 1.0


def test_fuzzy_join_asymmetric_column_names(fuzzy_tables):
    left, right = fuzzy_tables
    renamed = right.withColumnRenamed("doc_id", "rid").withColumnRenamed(
        "text", "body"
    )
    got = {
        (r.id_a, r.id_b)
        for r in dedup.fuzzy_join(
            left, renamed, right_id_col="rid", right_text_col="body", threshold=0.5
        ).collect()
    }
    assert got == {(1, 10), (2, 12)}


def test_fuzzy_join_yaml_lift_roundtrip(spark, fuzzy_tables, tmp_path):
    import yaml

    from getl_spark import lift

    left, right = fuzzy_tables
    left.write.parquet(f"{tmp_path}/left")
    right.write.parquet(f"{tmp_path}/right")
    blocks = {
        "Left": {
            "Type": "load::batch_parquet",
            "Properties": {"Path": f"{tmp_path}/left"},
        },
        "Right": {
            "Type": "load::batch_parquet",
            "Properties": {"Path": f"{tmp_path}/right"},
        },
        "Result": {
            "Type": "transform::generic",
            "Input": ["Left", "Right"],
            "Properties": {
                "Functions": [{"dedup.fuzzy_join": {"threshold": 0.5, "max_df": 50}}]
            },
        },
    }
    out = lift(spark, yaml.safe_dump({"LiftJob": blocks}, sort_keys=False)).get(
        "Result"
    )
    assert {(r.id_a, r.id_b) for r in out.collect()} == {(1, 10), (2, 12)}


def test_simhash_max_chunk_df_prunes_hot_buckets(spark):
    """A giant identical-fingerprint cluster floods the chunk buckets;
    the cap drops those buckets from candidate generation while a
    distinctive near-dup pair (cold chunks) is still found."""
    cluster_text = "identical boilerplate page repeated across the whole crawl corpus"
    # long text + one appended token -> hamming(simhash) = 2 (xxhash64 is
    # deterministic, so this distance is fixed)
    pair_text = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
        "lima mike november oscar papa quebec romeo sierra tango uniform "
        "victor whiskey xray yankee zulu one two three four five six seven "
        "eight nine ten eleven twelve thirteen fourteen fifteen sixteen "
        "seventeen eighteen nineteen twenty"
    )
    rows = [(i, cluster_text) for i in range(12)] + [
        (100, pair_text),
        (101, pair_text + " extended"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")

    uncapped = {
        (r.id_a, r.id_b)
        for r in dedup.simhash_pairs(df, max_hamming=8).collect()
    }
    # identical docs pair with each other, and the planted pair is found
    assert (0, 1) in uncapped and (100, 101) in uncapped

    capped = {
        (r.id_a, r.id_b)
        for r in dedup.simhash_pairs(df, max_hamming=8, max_chunk_df=5).collect()
    }
    # every chunk the cluster agrees on sits in a 12-deep bucket > cap
    assert not any(a < 12 and b < 12 for a, b in capped)
    # the distinctive pair's agreeing chunks are cold -> still found
    assert (100, 101) in capped


def test_simhash_max_chunk_df_no_op_when_above_bucket_sizes(near_dup_docs):
    uncapped = {
        (r.id_a, r.id_b)
        for r in dedup.simhash_pairs(near_dup_docs, max_hamming=16).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in dedup.simhash_pairs(
            near_dup_docs, max_hamming=16, max_chunk_df=1000
        ).collect()
    }
    assert capped == uncapped


# ---------------------------------------------- MinHash banding sizing
def test_minhash_params_meets_recall_within_budget():
    p = dedup.minhash_params(0.5, target_recall=0.95, max_hashes=64)
    assert p["num_hashes"] == p["bands"] * p["rows_per_band"] <= 64
    assert p["est_recall"] >= 0.95
    # closed form cross-check
    r, b = p["rows_per_band"], p["bands"]
    assert p["est_recall"] == round(1 - (1 - 0.5**r) ** b, 4)
    assert p["noise_catch_rate"] == round(1 - (1 - 0.2**r) ** b, 6)
    # a bigger budget buys a sharper S-curve: more rows per band,
    # fewer noise catches — never the reverse
    big = dedup.minhash_params(0.5, target_recall=0.95, max_hashes=512)
    assert big["rows_per_band"] >= p["rows_per_band"]
    assert big["noise_catch_rate"] <= p["noise_catch_rate"]


def test_minhash_params_guards():
    import pytest as _pytest

    # 0.999 recall at threshold 0.05 needs b*1 > 8 even with 1-row bands
    with _pytest.raises(ValueError, match="raise max_hashes"):
        dedup.minhash_params(
            0.05, target_recall=0.999, max_hashes=8, noise_jaccard=0.01
        )
    with _pytest.raises(ValueError, match="threshold"):
        dedup.minhash_params(1.5)
    with _pytest.raises(ValueError, match="noise_jaccard"):
        dedup.minhash_params(0.5, noise_jaccard=0.6)


# ---------------------------------------------- embedding LSH sizing
def test_embedding_lsh_params_meets_budget_and_recall():
    p = dedup.embedding_lsh_params(10_000_000, candidate_budget=10**9)
    assert p["est_candidates"] <= 10**9
    assert p["est_recall"] >= 0.95
    # tighter budget -> more planes per band (exponentially fewer
    # random collisions), never fewer
    tight = dedup.embedding_lsh_params(10_000_000, candidate_budget=10**7)
    assert tight["planes_per_band"] >= p["planes_per_band"]
    assert tight["est_candidates"] <= 10**7


def test_embedding_lsh_params_impossible_budget_raises():
    import pytest as _pytest

    with _pytest.raises(ValueError, match="budget"):
        dedup.embedding_lsh_params(10**9, candidate_budget=10, max_planes=8)


def test_embedding_lsh_candidate_estimate_exact_on_full_sample(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    est = dedup.embedding_lsh_candidate_estimate(
        df, bands=4, planes_per_band=6, sample=10_000
    )
    # sample >= n -> the estimate is the exact per-band collision count
    # (an upper bound on distinct candidate pairs, which dedupe bands)
    banded = df.select(
        F.posexplode(
            dedup._hyperplane_band_keys(4, 6, 16, 42)("embedding")
        ).alias("band", "key")
    )
    actual = (
        banded.groupBy("band", "key")
        .count()
        .selectExpr("CAST(sum(count * (count - 1) / 2) AS BIGINT) AS p")
        .first()
        .p
    )
    assert est == actual
    assert est > 0


# ------------------------------------------- plan-shape scale contracts
@pytest.mark.parametrize(
    "build",
    [
        lambda d: dedup.ngram_jaccard(d, threshold=0.3),
        lambda d: dedup.ngram_jaccard(d, threshold=0.3, max_df=50),
        lambda d: dedup.minhash_lsh(d, threshold=0.3),
        lambda d: dedup.simhash_pairs(d, max_hamming=6),
        lambda d: dedup.simhash_pairs(d, max_hamming=6, max_chunk_df=100),
        lambda d: dedup.fuzzy_join(
            d.where("doc_id % 2 = 0"), d.where("doc_id % 2 = 1"), threshold=0.3
        ),
        lambda d: dedup.fuzzy_join(
            d.where("doc_id % 2 = 0"),
            d.where("doc_id % 2 = 1"),
            threshold=0.3,
            max_df=50,
        ),
    ],
    ids=[
        "ngram", "ngram_maxdf", "minhash", "simhash", "simhash_cap",
        "fuzzy", "fuzzy_maxdf",
    ],
)
def test_dedup_plans_never_go_quadratic(docs, build):
    """Every sketch/index dedup path must plan as equi-joins only — a
    CartesianProduct or BroadcastNestedLoopJoin would mean some join
    lost its keys and the operator silently went O(n²) at scale."""
    plan = build(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_multimodal_resize_shapes_and_meta(docs):
    media = multimodal.to_media(docs.limit(8), "text")
    out = multimodal.resize(media, width=16, height=8)
    rows = out.collect()
    assert len(rows) == 8
    for r in rows:
        assert len(r.content) == 16 * 8
        assert r.meta.width == 16 and r.meta.height == 8
    # deterministic: same input -> same bytes
    again = {r.doc_id: bytes(r.content) for r in multimodal.resize(media, 16, 8).collect()}
    assert {r.doc_id: bytes(r.content) for r in rows} == again


def test_ivf_index_build_query_matches_fresh(spark, tmp_path):
    """A persisted IVF index must answer queries identically to the
    in-session IVF at the same settings (exhaustive probe ⇒ both equal
    brute force), with the vectors table partitioned by cell."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    path = str(tmp_path / "ivf")
    summary = similarity.build_ivf_index(emb, path, nlist=8)
    counts = {r.cell: r.n_vectors for r in summary.collect()}
    assert sum(counts.values()) == emb.count()
    assert (tmp_path / "ivf" / "vectors" / "cell=0").exists()

    queries = emb.where("vec_id < 8")
    fresh = similarity.topk_ivf(emb, queries, k=5, nlist=8, nprobe=8)
    from_index = similarity.topk_ivf_indexed(spark, queries, path, k=5, nprobe=8)
    assert sorted(map(tuple, fresh.collect())) == sorted(
        map(tuple, from_index.collect())
    )
    # approximate probing still returns k rows per query
    approx = similarity.topk_ivf_indexed(spark, queries, path, k=5, nprobe=2)
    per_q = approx.groupBy("query_id").count().collect()
    assert all(r["count"] == 5 for r in per_q)


def test_merge_ivf_index_identity_under_full_probes(spark, tmp_path):
    """merge(A, B) queried with nprobe == nlist must equal an index
    built fresh from A ∪ B under full probes (full probes scan every
    cell, so only the merged vector SET matters — and brute force over
    the union is the common truth). The larger side's centroids are
    kept; occupancy totals must cover every distinct vector."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = emb.where("vec_id % 3 != 0")   # larger
    b = emb.where("vec_id % 3 = 0")    # smaller
    pa, pb = str(tmp_path / "ivf_a"), str(tmp_path / "ivf_b")
    pm = str(tmp_path / "ivf_merged")
    similarity.build_ivf_index(a, pa, nlist=8)
    similarity.build_ivf_index(b, pb, nlist=4)
    occ = similarity.merge_ivf_index(spark, pa, pb, pm)
    counts = {r.cell: r.n_vectors for r in occ.collect()}
    assert sum(counts.values()) == emb.count()
    # larger side's quantizer kept verbatim
    kept = sorted(
        tuple(r.centroid)
        for r in spark.read.parquet(f"{pa}/centroids").collect()
    )
    merged_cents = sorted(
        tuple(r.centroid)
        for r in spark.read.parquet(f"{pm}/centroids").collect()
    )
    assert kept == merged_cents and len(kept) == 8

    queries = emb.where("vec_id < 6")
    got = similarity.topk_ivf_indexed(spark, queries, pm, k=5, nprobe=8)
    pf = str(tmp_path / "ivf_fresh")
    similarity.build_ivf_index(emb, pf, nlist=8)
    fresh = similarity.topk_ivf_indexed(spark, queries, pf, k=5, nprobe=8)
    brute = similarity.topk_bruteforce(emb, queries, k=5)
    as_set = lambda df: sorted(  # noqa: E731
        (r.query_id, r.rank, r.nbr_id) for r in df.collect()
    )
    assert as_set(got) == as_set(fresh) == as_set(brute)

    # duplicate ids across the periods collapse to one row
    pb2 = str(tmp_path / "ivf_b2")
    similarity.build_ivf_index(emb.where("vec_id % 3 = 0"), pb2, nlist=4)
    pm2 = str(tmp_path / "ivf_m2")
    similarity.merge_ivf_index(spark, pm, pb2, pm2)  # b's ids already in pm
    assert (
        spark.read.parquet(f"{pm2}/vectors").count() == emb.count()
    )

    # a CONFLICTING duplicate id (re-embedded between periods) must
    # resolve to the larger side deterministically
    conf_b = spark.createDataFrame(
        [(1, [9.0] * 64)], "vec_id long, embedding array<double>"
    )
    pcb = str(tmp_path / "ivf_conflict")
    similarity.build_ivf_index(conf_b, pcb, nlist=1)
    pmc = str(tmp_path / "ivf_m_conflict")
    similarity.merge_ivf_index(spark, pa, pcb, pmc)
    kept_vec = (
        spark.read.parquet(f"{pmc}/vectors").where("nbr_id = 1").collect()
    )
    want = (
        spark.read.parquet(f"{pa}/vectors").where("nbr_id = 1").collect()
    )
    assert len(kept_vec) == 1
    assert list(kept_vec[0].cvec) == list(want[0].cvec)  # larger side wins

    # guards: overwriting an input; dimension mismatch
    with pytest.raises(ValueError, match="out_path"):
        similarity.merge_ivf_index(spark, pa, pb, pa)
    short = emb.select(
        "vec_id", F.slice("embedding", 1, 4).alias("embedding")
    )
    ps = str(tmp_path / "ivf_short")
    similarity.build_ivf_index(short, ps, nlist=4)
    with pytest.raises(ValueError, match="dimension"):
        similarity.merge_ivf_index(spark, pa, ps, str(tmp_path / "x"))


def test_ivf_health_real_index_and_triggers(spark, tmp_path):
    """ivf_health on a freshly built index: histogram covers every
    cell, totals match the corpus, and the retrain trigger fires on a
    degenerate (all-one-cell) index under the documented thresholds."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    path = str(tmp_path / "ivf")
    similarity.build_ivf_index(emb, path, nlist=8)
    r = similarity.ivf_health(spark, path).collect()[0]
    assert r.nlist == 8
    assert r.n_vectors == emb.count()
    assert len(r.occupancy) == 8 and sum(r.occupancy) == r.n_vectors
    assert r.max_cell == max(r.occupancy) and r.min_cell == min(r.occupancy)
    assert r.imbalance >= 1.0
    assert abs(r.mean_cell - r.n_vectors / 8) < 1e-6
    assert r.empty_cells == sum(1 for n in r.occupancy if n == 0)

    # degenerate index: 4 cells, every vector in cell 0 — imbalance 4x
    # AND 75% empty cells, both over the default triggers
    bad = str(tmp_path / "bad")
    spark.createDataFrame(
        [(i, [float(i)]) for i in range(4)], "cell INT, centroid ARRAY<DOUBLE>"
    ).write.parquet(f"{bad}/centroids")
    emb.selectExpr(
        "vec_id AS nbr_id", "embedding AS cvec",
        "CAST(1.0 AS DOUBLE) AS cnorm", "CAST(0 AS INT) AS cell",
    ).write.partitionBy("cell").parquet(f"{bad}/vectors")
    b = similarity.ivf_health(spark, bad).collect()[0]
    assert b.retrain and b.imbalance == 4.0 and b.empty_cells == 3
    assert list(b.occupancy) == [emb.count(), 0, 0, 0]
    # loosened thresholds: same index, trigger stays quiet
    ok = similarity.ivf_health(
        spark, bad, imbalance_threshold=10.0, max_empty_frac=1.0
    ).collect()[0]
    assert not ok.retrain

    with pytest.raises(ValueError, match="ivf_health"):
        similarity.ivf_health(spark, bad, imbalance_threshold=0)
    with pytest.raises(ValueError, match="ivf_health"):
        similarity.ivf_health(spark, bad, max_empty_frac=1.5)


def test_ivf_health_gate_blocks_merge(spark, tmp_path):
    """The executable maintenance gate: a degraded index refuses to be
    merged (health_gate=True), so the documented retrain trigger is
    enforceable, not advisory."""
    from getl_spark.common.errors import IndexHealthError

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    good_a = str(tmp_path / "a")
    good_b = str(tmp_path / "b")
    similarity.build_ivf_index(emb.where("vec_id % 2 = 0"), good_a, nlist=4)
    similarity.build_ivf_index(emb.where("vec_id % 2 = 1"), good_b, nlist=4)
    # healthy pass-through: gate returns the readout, merge proceeds
    row = similarity.assert_ivf_healthy(spark, good_a)
    assert row["retrain"] is False and row["nlist"] == 4
    merged = str(tmp_path / "merged")
    similarity.merge_ivf_index(spark, good_a, good_b, merged,
                               health_gate=True)
    assert spark.read.parquet(f"{merged}/vectors").count() == emb.count()

    # degraded index (all vectors in one of 4 cells): gate trips
    bad = str(tmp_path / "bad")
    spark.createDataFrame(
        [(i, [float(i)] * 8) for i in range(4)],
        "cell INT, centroid ARRAY<DOUBLE>",
    ).write.parquet(f"{bad}/centroids")
    emb.selectExpr(
        "vec_id AS nbr_id", "slice(embedding, 1, 8) AS cvec",
        "CAST(1.0 AS DOUBLE) AS cnorm", "CAST(0 AS INT) AS cell",
    ).write.partitionBy("cell").parquet(f"{bad}/vectors")
    with pytest.raises(IndexHealthError, match="needs retraining") as ei:
        similarity.assert_ivf_healthy(spark, bad)
    assert ei.value.readout["retrain"] is True
    bad2 = str(tmp_path / "bad2")
    import shutil

    shutil.copytree(bad, bad2)
    with pytest.raises(IndexHealthError, match="needs retraining"):
        similarity.merge_ivf_index(
            spark, bad, bad2, str(tmp_path / "never"), health_gate=True
        )
    # and without the gate the merge still runs (legacy behavior)
    similarity.merge_ivf_index(spark, bad, bad2, str(tmp_path / "ungated"))


def test_merge_minhash_index_identity(spark, tmp_path):
    """merge(A, B) must carry table-for-table the same index an
    in-one-shot build over the distinct union produces (the hash
    family is meta-determined, so sketches are bitwise reproducible),
    and answer against_stored_index identically — overlapping docs
    collapse, different-family merges fail loud."""
    mk = lambda i: (  # noqa: E731
        i, f"the quick brown fox jumps over dog number {i} in the field " * 3
    )
    corpus_a = spark.createDataFrame(
        [mk(i) for i in range(0, 25)], "doc_id long, text string"
    )
    corpus_b = spark.createDataFrame(
        [mk(i) for i in range(20, 40)], "doc_id long, text string"
    )
    pa, pb = str(tmp_path / "mh_a"), str(tmp_path / "mh_b")
    pm, pf = str(tmp_path / "mh_merged"), str(tmp_path / "mh_fresh")
    dedup.build_minhash_index(corpus_a, pa, n=3, num_hashes=32, bands=8)
    dedup.build_minhash_index(corpus_b, pb, n=3, num_hashes=32, bands=8)
    occ = dedup.merge_minhash_index(spark, pa, pb, pm)
    assert occ.count() == 8
    dedup.build_minhash_index(
        corpus_a.unionByName(corpus_b).distinct(), pf,
        n=3, num_hashes=32, bands=8,
    )
    for sub, key in (
        ("fingerprints", lambda r: (r.id, r.fingerprint)),
        ("signatures", lambda r: (r.id, tuple(r.sig))),
        ("bands", lambda r: (r.id, r.key, r.band)),
    ):
        got = sorted(
            key(r) for r in spark.read.parquet(f"{pm}/{sub}").collect()
        )
        want = sorted(
            key(r) for r in spark.read.parquet(f"{pf}/{sub}").collect()
        )
        assert got == want, sub

    inc = spark.createDataFrame(
        [
            mk(7),    # exact dup of A-side content
            mk(33),   # exact dup of B-side content
            (900, "a novel document about adaptive query execution"),
        ],
        "doc_id long, text string",
    )
    survivors = lambda p: {  # noqa: E731
        r.doc_id
        for r in dedup.against_stored_index(
            inc, p, near_threshold=0.7
        ).collect()
    }
    assert survivors(pm) == survivors(pf) == {900}

    # guards: family mismatch; overwriting an input
    pz = str(tmp_path / "mh_other_family")
    dedup.build_minhash_index(corpus_b, pz, n=3, num_hashes=64, bands=16)
    with pytest.raises(ValueError, match="meta mismatch"):
        dedup.merge_minhash_index(spark, pa, pz, str(tmp_path / "y"))
    with pytest.raises(ValueError, match="out_path"):
        dedup.merge_minhash_index(spark, pa, pb, pb)


def test_fuzzy_join_minhash_method_recall_and_precision(spark, docs):
    """fuzzy_join(method='minhash') must be a subset of the exact join
    (verification makes precision exact) with high recall at a
    threshold where the LSH collision probability is ~1."""
    left = docs.where("doc_id % 2 = 0")
    right = docs.where("doc_id % 2 = 1")
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.fuzzy_join(left, right, threshold=0.3).collect()
    }
    sketch = {
        (r.id_a, r.id_b): r.jaccard
        for r in dedup.fuzzy_join(
            left, right, threshold=0.3, method="minhash"
        ).collect()
    }
    assert set(sketch) <= set(exact)
    for pair, j in sketch.items():
        assert j == exact[pair]  # verified jaccard is the exact value
    if exact:
        assert len(sketch) / len(exact) >= 0.8
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown method"):
        dedup.fuzzy_join(left, right, method="bogus")


def test_multimodal_resize_custom_content_col_and_nulls(spark):
    df = spark.createDataFrame(
        [(0, b"abc"), (1, None), (2, b"")],
        "doc_id BIGINT, image_bytes BINARY",
    )
    out = {
        r.doc_id: r.content
        for r in multimodal.resize(
            df, width=4, height=2, content_col="image_bytes"
        ).collect()
    }
    assert out[0] == b"abcabcab"
    assert out[1] is None  # null media passes through, no task crash
    assert out[2] == bytes(8)


def test_embedding_lsh_candidate_estimate_tiny_sample_no_crash(spark):
    import numpy as np

    rng = np.random.RandomState(5)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(500)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")
    est = dedup.embedding_lsh_candidate_estimate(
        df, bands=2, planes_per_band=4, sample=1
    )
    assert isinstance(est, int) and est >= 0


def test_against_index_minhash_method_matches_exact(spark, near_dup_docs):
    index = near_dup_docs.where("doc_id IN (0, 3)")
    new = near_dup_docs.where("doc_id IN (1, 2, 4)")
    exact_out = {
        r.doc_id
        for r in dedup.against_index(new, index, near_threshold=0.3).collect()
    }
    sketch_out = {
        r.doc_id
        for r in dedup.against_index(
            new, index, near_threshold=0.3, method="minhash"
        ).collect()
    }
    # at j>=0.3 with 16x4 bands collision probability ~1: same survivors
    assert sketch_out == exact_out == {4}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown method"):
        dedup.against_index(new, index, method="nope")


def test_minhash_paths_reject_bad_params(spark, fuzzy_tables):
    """num_hashes must divide evenly into bands (silently dropping
    hashes breaks the documented recall curve), and max_df has no
    meaning under method='minhash' — both are hard errors, not silent
    deviations."""
    left, right = fuzzy_tables
    with pytest.raises(ValueError, match="divisible"):
        dedup.fuzzy_join(left, right, method="minhash", num_hashes=64, bands=24)
    with pytest.raises(ValueError, match="max_df"):
        dedup.fuzzy_join(left, right, method="minhash", max_df=5)
    with pytest.raises(ValueError, match="divisible"):
        dedup.against_index(
            left, right, near_threshold=0.3, method="minhash",
            num_hashes=64, bands=24,
        )


def test_fuzzy_join_verify_is_two_key_equijoin(spark, fuzzy_tables):
    """The minhash verify stage joins candidates to the right shingle
    table on BOTH id_b and shingle as explicit join keys — the plan
    must contain a SortMergeJoin/ShuffledHashJoin whose key list
    carries both columns, independent of Catalyst folding a
    post-filter. Regression guard for the optimizer-dependence watch
    item (VERDICT r5 §wrong.3)."""
    left, right = fuzzy_tables
    plan = dedup.fuzzy_join(
        left, right, threshold=0.5, method="minhash"
    )._jdf.queryExecution().executedPlan().toString()
    # no cartesian/broadcast-nested-loop stage anywhere in the verify
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    import re as _re

    # some equi-join keyed on both id_b and shingle
    joins = _re.findall(r"(?:SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin)[^\n]*", plan)
    assert any("id_b" in j and "shingle" in j for j in joins), joins


# ------------------------------------------- substring-level dedup
@pytest.fixture(scope="module")
def passage_docs(spark):
    return spark.createDataFrame(
        [
            (0, "a b c d e f g h"),                  # global first occurrence
            (1, "x y a b c d e z"),                  # cross-doc dup 5-gram
            (2, "p q r s t u v w"),                  # unique
            (3, "a b c d e f g q a b c d e f g r"),  # dup of doc0 + self-repeat
            (4, "m n a b c d e a b c d e o"),        # overlapping self-repeats
        ],
        "doc_id BIGINT, text STRING",
    )


def test_substring_spans_first_occurrence_wins_and_islands_merge(passage_docs):
    spans = {
        (r.id, r.start, r.end)
        for r in dedup.substring_spans(passage_docs, min_tokens=5).collect()
    }
    # doc 0 (global first) keeps everything; doc 2 unique
    assert not any(i in (0, 2) for i, _, _ in spans)
    assert spans == {
        (1, 2, 7),    # "a b c d e" inside doc 1
        (3, 0, 7),    # doc 3's first copy (dup of doc 0's prefix), merged
        (3, 8, 15),   # doc 3's second copy
        (4, 2, 12),   # two overlapping copies merged into ONE island
    }


def test_remove_substring_dups_cuts_and_keeps(passage_docs):
    out = {
        r.doc_id: r.text_dedup
        for r in dedup.remove_substring_dups(passage_docs, min_tokens=5).collect()
    }
    assert out == {
        0: "a b c d e f g h",   # winner untouched
        1: "x y z",
        2: "p q r s t u v w",   # no spans -> original text verbatim
        3: "q r",
        4: "m n o",
    }


def test_substring_spans_short_docs_and_validation(spark, passage_docs):
    short = spark.createDataFrame(
        [(0, "one two"), (1, "one two")], "doc_id BIGINT, text STRING"
    )
    # docs shorter than min_tokens produce no grams -> no spans
    assert dedup.substring_spans(short, min_tokens=5).count() == 0
    with pytest.raises(ValueError, match="min_tokens"):
        dedup.substring_spans(passage_docs, min_tokens=1)


def test_substring_spans_no_python_udf_in_plan(passage_docs):
    plan = (
        dedup.remove_substring_dups(passage_docs, min_tokens=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_shingle_ops_survive_short_docs(spark):
    """Regression: docs shorter than the shingle size n used to crash
    every shingle-based operator (sequence(0,-1) descends, slice(0)
    throws). Short docs must contribute zero shingles, not kill the
    job."""
    mixed = spark.createDataFrame(
        [(0, "one two"), (1, "a"), (2, ""),
         (3, "the quick brown fox jumps over the lazy dog"),
         (4, "the quick brown fox jumps over the lazy cat")],
        "doc_id BIGINT, text STRING",
    )
    sh = dedup._shingles(mixed, "doc_id", "text", 3)
    assert {r.id for r in sh.select("id").distinct().collect()} == {3, 4}
    pairs = {(r.id_a, r.id_b) for r in dedup.ngram_jaccard(mixed, threshold=0.3).collect()}
    assert pairs == {(3, 4)}
    # minhash path too (signatures for short docs are skipped, not fatal)
    assert dedup.minhash_lsh(mixed, threshold=0.3).count() >= 0


def test_substring_spans_differential_vs_python_reference(spark):
    """Randomized small-vocab corpora (forcing heavy gram collisions)
    against a direct python implementation of the same contract:
    global-first-occurrence wins, all other occurrences of any
    duplicated L-gram merge into islands."""
    import random

    rng = random.Random(99)
    L = 3
    for trial in range(3):
        docs = []
        for d in range(12):
            n = rng.randint(0, 14)
            docs.append((d, " ".join(rng.choice("abcde") for _ in range(n))))

        # python reference
        occs = {}  # gram -> [(doc, pos)]
        for d, t in docs:
            words = t.split() if t else []
            for i in range(max(len(words) - L + 1, 0)):
                occs.setdefault(tuple(words[i : i + L]), []).append((d, i))
        expected = {}
        for gram, hits in occs.items():
            if len(hits) < 2:
                continue
            first = min(hits)
            for d, i in hits:
                if (d, i) != first:
                    expected.setdefault(d, set()).update(range(i, i + L))
        exp_spans = set()
        for d, positions in expected.items():
            run = sorted(positions)
            start = prev = run[0]
            for p in run[1:]:
                if p == prev + 1:
                    prev = p
                    continue
                exp_spans.add((d, start, prev + 1))
                start = prev = p
            exp_spans.add((d, start, prev + 1))

        df = spark.createDataFrame(docs, "doc_id BIGINT, text STRING")
        got = {
            (r.id, r.start, r.end)
            for r in dedup.substring_spans(df, min_tokens=L).collect()
        }
        assert got == exp_spans, f"trial {trial}: {got ^ exp_spans}"


def test_canonicalize_url_collapses_crawl_variants(spark):
    """Tracking params, fragments, default ports, case, and trailing
    slashes collapse to one canonical form; real distinctions (port
    8080, case-sensitive paths, non-tracking params) survive."""
    cases = [
        (0, "HTTP://Site.com:80/a/?utm_source=x&id=3#frag"),
        (1, "http://site.com/a?id=3"),
        (2, "https://Example.COM:443/"),
        (3, "https://example.com"),
        (4, "https://a.com/path/?utm_campaign=s&fbclid=abc"),
        (5, "https://a.com/path"),
        (6, "https://b.com/x?gclid=1&keep=2&utm_medium=m"),
        (7, "  https://c.com/Case/Sensitive/Path  "),
        (8, "http://d.com:8080/a?x=1"),
    ]
    df = spark.createDataFrame(cases, "doc_id BIGINT, url STRING")
    out = {r.doc_id: r.url_canonical for r in text.canonicalize_url(df).collect()}
    assert out[0] == out[1] == "http://site.com/a?id=3"
    assert out[2] == out[3] == "https://example.com"
    assert out[4] == out[5] == "https://a.com/path"
    assert out[6] == "https://b.com/x?keep=2"
    assert out[7] == "https://c.com/Case/Sensitive/Path"
    assert out[8] == "http://d.com:8080/a?x=1"  # non-default port kept


def test_canonicalize_url_preserves_literal_separators_and_userinfo(spark):
    """Regression pins from review: a literal '?' inside a value must
    not swallow the following '&'; userinfo keeps its case while the
    default port still strips; a trailing literal '?' in a value
    survives; non-URLs pass through untouched."""
    cases = [
        (10, "https://a.com/x?a=?&b=2"),
        (11, "https://Alice@X.com:443/p"),
        (12, "http://u@H.com:80/q?utm_id=1"),
        (13, "https://e.com/s?q=what?"),
        (14, "not-a-url plain text"),
    ]
    df = spark.createDataFrame(cases, "doc_id BIGINT, url STRING")
    out = {r.doc_id: r.url_canonical for r in text.canonicalize_url(df).collect()}
    assert out[10] == "https://a.com/x?a=?&b=2"
    assert out[11] == "https://Alice@x.com/p"
    assert out[12] == "http://u@h.com/q"
    assert out[13] == "https://e.com/s?q=what?"
    assert out[14] == "not-a-url plain text"


def test_remove_common_lines_per_group_scoping(spark):
    """group_col scopes boilerplate counting per host: a small site's
    nav line (3 of its 3 docs) is removed even though globally rare,
    while a line spread thinly ACROSS hosts survives a per-host
    threshold it would fail globally."""
    site_nav = "home | about | contact"
    spread = "popular sentence everywhere"
    rows = []
    for i in range(3):  # tiny.com: nav boilerplate in every doc
        rows.append((i, "tiny.com", f"{site_nav}\ncontent {i}"))
    for i in range(6):  # one spread-line doc on each of 6 hosts
        rows.append((10 + i, f"h{i}.com", f"{spread}\nbody {i}"))
    df = spark.createDataFrame(rows, "doc_id BIGINT, host STRING, text STRING")

    grouped = {
        r.doc_id: r.text
        for r in text.remove_common_lines(
            df, max_df=2, group_col="host"
        ).collect()
    }
    # per-host: nav (df=3 within tiny.com) removed; spread (df=1 per host) kept
    assert all(site_nav not in grouped[i] for i in range(3))
    assert all(spread in grouped[10 + i] for i in range(6))

    global_ = {
        r.doc_id: r.text
        for r in text.remove_common_lines(df, max_df=2).collect()
    }
    # global: both exceed df=2 -> both removed (the over-removal
    # group_col exists to avoid)
    assert all(spread not in global_[10 + i] for i in range(6))


def test_canonicalize_url_idempotent(spark):
    """Canonicalization must be a projection onto its own image:
    canonicalize(canonicalize(u)) == canonicalize(u) for messy inputs
    — otherwise dedup results depend on how many times the pipeline
    ran."""
    import random

    rng = random.Random(5)
    hosts = ["A.com", "b.org:80", "C.net:443", "d.io:8080", "User@E.com:80"]
    schemes = ["http", "HTTP", "https", "HTTPS"]
    paths = ["", "/", "/p/q/", "/Case/Path", "/x"]
    params = ["", "?utm_source=a", "?id=1&utm_b=2", "?a=?&b=2", "?gclid=9",
              "?x=1&y=2", "?utm_a=1&utm_b=2&utm_c=3"]
    frags = ["", "#f", "#frag?x=1"]
    rows = []
    for i in range(60):
        u = (f"{rng.choice(schemes)}://{rng.choice(hosts)}"
             f"{rng.choice(paths)}{rng.choice(params)}{rng.choice(frags)}")
        rows.append((i, u))
    df = spark.createDataFrame(rows, "doc_id BIGINT, url STRING")
    once = text.canonicalize_url(df).select(
        "doc_id", F.col("url_canonical").alias("url")
    )
    twice = text.canonicalize_url(once).select("doc_id", "url_canonical")
    joined = once.join(twice, "doc_id")
    diffs = joined.where(F.col("url") != F.col("url_canonical")).collect()
    assert diffs == [], [(r.url, r.url_canonical) for r in diffs]


def _clustered_vecs(spark, n_clusters=6, per=12, d=16, seed=5):
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d)) * 3
    rows = []
    i = 0
    for c in range(n_clusters):
        for _ in range(per):
            v = centers[c] + rng.normal(size=d) * 0.05
            rows.append((i, c, [float(x) for x in v]))
            i += 1
    return spark.createDataFrame(
        rows, "vec_id long, planted long, embedding array<double>"
    )


def test_semantic_pairs_recall_vs_bruteforce_on_clustered(spark):
    """Cell-bounded verification: nassign=1 finds most exact pairs
    (k-means can split a planted cluster across two cells — the
    documented boundary-straddle loss), nassign=2 recovers ALL of
    them on this data (the straddling halves meet in one of the two
    assigned cells). Precision is always 1.0 — every emitted pair is
    verified with the exact cosine."""
    df = _clustered_vecs(spark)
    exact = dedup.embedding_cosine_pairs(
        df, "vec_id", "embedding", threshold=0.98, brute_force=True
    )
    e = {(r.id_a, r.id_b) for r in exact.collect()}
    assert len(e) > 50
    sem1 = dedup.semantic_pairs(
        df, "vec_id", "embedding", threshold=0.98, nlist=6, seed=1, kmeans_iters=15
    )
    s1 = {(r.id_a, r.id_b) for r in sem1.collect()}
    assert s1 <= e  # no false positives, ever
    assert len(s1) / len(e) >= 0.85
    sem2 = dedup.semantic_pairs(
        df,
        "vec_id",
        "embedding",
        threshold=0.98,
        nlist=6,
        nassign=2,
        seed=1,
        kmeans_iters=15,
    )
    s2 = {(r.id_a, r.id_b) for r in sem2.collect()}
    assert s2 == e


def test_semantic_pairs_candidates_are_cell_bounded(spark):
    """No all-pairs path: with nlist cells the executed plan joins on
    the cell key (equi-join), never cross-joins the corpus."""
    df = _clustered_vecs(spark)
    plan = (
        dedup.semantic_pairs(df, "vec_id", "embedding", nlist=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_semantic_pairs_nassign_superset_and_validation(spark):
    df = _clustered_vecs(spark, n_clusters=3, per=8)
    one = {
        (r.id_a, r.id_b)
        for r in dedup.semantic_pairs(
            df, "vec_id", "embedding", threshold=0.9, nlist=3, nassign=1, seed=2
        ).collect()
    }
    two = {
        (r.id_a, r.id_b)
        for r in dedup.semantic_pairs(
            df, "vec_id", "embedding", threshold=0.9, nlist=3, nassign=2, seed=2
        ).collect()
    }
    assert one <= two  # multi-assignment only adds candidates
    with pytest.raises(ValueError):
        dedup.semantic_pairs(df, nassign=0)
    with pytest.raises(ValueError):
        dedup.semantic_pairs(df, threshold=1.5)


def test_semantic_pairs_null_vectors_skipped(spark):
    df = _clustered_vecs(spark, n_clusters=2, per=5)
    with_null = df.unionByName(
        spark.createDataFrame([(999, 0, None)], df.schema)
    )
    out = dedup.semantic_pairs(with_null, "vec_id", "embedding", nlist=2, seed=3)
    ids = {r.id_a for r in out.collect()} | {r.id_b for r in out.collect()}
    assert 999 not in ids


@pytest.fixture()
def minhash_index(spark, tmp_path):
    corpus = spark.createDataFrame(
        [
            (i, f"the quick brown fox jumps over dog number {i} in the field " * 3)
            for i in range(40)
        ],
        "doc_id long, text string",
    )
    path = str(tmp_path / "mh_index")
    occ = dedup.build_minhash_index(corpus, path, n=3, num_hashes=64, bands=16)
    return corpus, path, occ


def test_stored_index_exact_and_near_phases(spark, minhash_index):
    _, path, occ = minhash_index
    assert occ.count() == 16  # one occupancy row per band
    inc = spark.createDataFrame(
        [
            # exact duplicate of corpus doc 7
            (100, "the quick brown fox jumps over dog number 7 in the field " * 3),
            # near duplicate of corpus doc 12 (appended tail)
            (
                101,
                ("the quick brown fox jumps over dog number 12 in the field " * 3)
                + "with an extra tail of words",
            ),
            (102, "completely different content about shuffle partitions and footers"),
            (103, "another novel document on broadcast joins and adaptive execution"),
        ],
        "doc_id long, text string",
    )
    exact_only = {r.doc_id for r in dedup.against_stored_index(inc, path).collect()}
    assert exact_only == {101, 102, 103}
    near = {
        r.doc_id
        for r in dedup.against_stored_index(inc, path, near_threshold=0.7).collect()
    }
    assert near == {102, 103}


def test_stored_index_params_come_from_meta(spark, tmp_path, minhash_index):
    """An increment is sketched with the index's own parameters: build
    with a non-default family, query still works and matches the
    in-memory against_index result on the same data."""
    corpus, _, _ = minhash_index
    path = str(tmp_path / "mh_index_5_32_8")
    dedup.build_minhash_index(corpus, path, n=5, num_hashes=32, bands=8)
    inc = spark.createDataFrame(
        [
            (200, "the quick brown fox jumps over dog number 3 in the field " * 3),
            (201, "an unrelated novel document about z-ordering parquet files"),
        ],
        "doc_id long, text string",
    )
    stored = {
        r.doc_id
        for r in dedup.against_stored_index(inc, path, near_threshold=0.8).collect()
    }
    in_memory = {
        r.doc_id
        for r in dedup.against_index(
            inc, corpus, near_threshold=0.8, n=5, method="minhash",
            num_hashes=32, bands=8,
        ).collect()
    }
    assert stored == in_memory == {201}


def test_stored_index_signature_estimate_tracks_jaccard(spark, minhash_index):
    """The near-verify statistic: signature agreement between a doc
    and itself is 1.0; between unrelated docs ~0. Checked through the
    persisted tables."""
    corpus, path, _ = minhash_index
    from pyspark.sql import functions as SF

    sigs = spark.read.parquet(f"{path}/signatures")
    a = sigs.where("id = 1").select(SF.col("sig").alias("sig_a"))
    b = sigs.where("id = 30").select(SF.col("sig").alias("sig_b"))
    agree = (
        a.crossJoin(b)
        .select(
            (
                SF.size(
                    SF.filter(
                        SF.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                        lambda v: v,
                    )
                )
                / SF.lit(64.0)
            ).alias("est")
        )
        .first()
        .est
    )
    # docs 1 and 30 share the template but differ in the number token;
    # true 3-gram Jaccard is high but well below 1 — the estimate must
    # land strictly between the unrelated (0) and identical (1) poles
    assert 0.05 < agree < 1.0


def test_build_minhash_index_validation(spark, minhash_index):
    corpus, _, _ = minhash_index
    with pytest.raises(ValueError):
        dedup.build_minhash_index(corpus, "/tmp/unused_mh", num_hashes=64, bands=24)


def test_semantic_pairs_empty_corpus_yields_empty_pairs(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = dedup.semantic_pairs(empty, "vec_id", "embedding")
    assert out.count() == 0
    assert out.columns == ["id_a", "id_b", "cosine"]
    all_null = spark.createDataFrame(
        [(1, None), (2, None)], "vec_id long, embedding array<double>"
    )
    assert dedup.semantic_pairs(all_null, "vec_id", "embedding").count() == 0


def test_semantic_dedup_one_survivor_per_cluster(spark):
    df = _clustered_vecs(spark, n_clusters=4, per=6)
    out = dedup.semantic_dedup(
        df, "vec_id", "embedding", threshold=0.98, nlist=4, nassign=2, seed=1
    )
    # each planted cluster of 6 near-identical vectors collapses to 1
    got = out.groupBy("planted").count().collect()
    assert {r["count"] for r in got} == {1}
    # min-id winner by default
    assert {r.vec_id for r in out.collect()} == {0, 6, 12, 18}
    # quality winner: keep the max vec_id instead via a quality column
    from pyspark.sql import functions as SF

    scored = df.withColumn("q", SF.col("vec_id").cast("double"))
    best = dedup.semantic_dedup(
        scored, "vec_id", "embedding", threshold=0.98, nlist=4, nassign=2,
        seed=1, quality_col="q",
    )
    assert {r.vec_id for r in best.collect()} == {5, 11, 17, 23}


def test_near_dedup_one_call_collapses_planted_dups(spark):
    """dedup.near_dedup keeps one survivor per planted near-dup
    cluster under both candidate methods, and the exact method equals
    the composition it wraps."""
    import random

    from getl_spark.functions import dedup as D

    rng = random.Random(21)
    words = [f"w{i}" for i in range(120)]
    base = [" ".join(rng.choice(words) for _ in range(60)) for _ in range(20)]
    rows = []
    for i, text in enumerate(base):
        rows.append((i * 10, text))
        if i < 5:  # five near-dup copies with a one-word tweak
            toks = text.split()
            toks[7] = "tweaked"
            rows.append((i * 10 + 1, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    for method in ("exact", "minhash"):
        out = D.near_dedup(
            docs, threshold=0.5, method=method
        )
        kept = {r.doc_id for r in out.collect()}
        assert len(kept) == 20, method  # one per cluster
        assert all(d % 10 == 0 for d in kept), method  # min-id winner
    # quality_col flips the winner to the higher-quality copy
    scored = docs.withColumn(
        "q", (F.col("doc_id") % 10 == 1).cast("double")
    )
    kept_q = {
        r.doc_id
        for r in D.near_dedup(
            scored, threshold=0.5, method="exact", quality_col="q"
        ).collect()
    }
    assert sum(1 for d in kept_q if d % 10 == 1) == 5
    import pytest as _pytest
    with _pytest.raises(ValueError, match="method"):
        D.near_dedup(docs, method="fuzzy")


# --------------------------------------------------------- dedup.by_url
def test_dedup_by_url_canonical_and_quality(spark):
    """Tracking-param / port / case variants of one page collapse to
    one row (min id, or best quality); null urls pass through."""
    from getl_spark.functions import dedup

    df = spark.createDataFrame(
        [
            (1, "HTTP://Site.com:80/a?utm_source=x", 0.2),
            (2, "http://site.com/a", 0.9),
            (3, "http://site.com/b", 0.5),
            (4, None, 0.1),
            (5, None, 0.8),
        ],
        "doc_id long, url string, q double",
    )
    kept = sorted(r.doc_id for r in dedup.by_url(df).collect())
    assert kept == [1, 3, 4, 5]  # min id wins the site.com/a pair
    best = sorted(
        r.doc_id for r in dedup.by_url(df, quality_col="q").collect()
    )
    assert best == [2, 3, 4, 5]  # quality 0.9 beats 0.2
    out = dedup.by_url(df, canonical_col="canon")
    assert "canon" in out.columns
    assert {r.canon for r in out.where("doc_id in (1,2)").collect()} == {
        "http://site.com/a"
    }


# -------------------------------------------------------- containment_pairs
def test_containment_pairs_quote_detection(spark):
    """A 12-word quote inside a 30-word document scores containment
    1.0 (quote in source) while the Jaccard path stays silent at any
    useful threshold — the asymmetric signal. Mutual containment for
    exact dups; max_df path yields identical results."""
    from getl_spark.functions import dedup

    words = [f"w{i}" for i in range(30)]
    source = " ".join(words)
    quote = " ".join(words[5:17])
    other = " ".join(f"x{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, source), (2, quote), (3, other), (4, source)],
        "doc_id long, text string",
    )
    out = {
        (r.contained_id, r.container_id): r.containment
        for r in dedup.containment_pairs(df, n=3, threshold=0.9).collect()
    }
    assert out[(2, 1)] == 1.0 and out[(2, 4)] == 1.0
    assert (1, 2) not in out  # the source is NOT contained in the quote
    assert out[(1, 4)] == 1.0 and out[(4, 1)] == 1.0  # mutual = exact dup
    assert not any(3 in k for k in out)

    # jaccard is blind to the quote at the same threshold
    jac = dedup.ngram_jaccard(df, n=3, threshold=0.9)
    assert {(r.id_a, r.id_b) for r in jac.collect()} == {(1, 4)}

    capped = {
        (r.contained_id, r.container_id): r.containment
        for r in dedup.containment_pairs(df, n=3, threshold=0.9, max_df=10).collect()
    }
    assert capped == out


def test_containment_join_cross_table_eval_in_training(spark):
    """The decontamination-grade shape: short eval docs pasted inside
    long training pages match at containment ~1.0 where cross-table
    Jaccard (fuzzy_join) is blind; direction is left-in-right only."""
    from getl_spark.functions import dedup

    words = [f"w{i}" for i in range(40)]
    train = spark.createDataFrame(
        [(1, " ".join(words)), (2, " ".join(f"y{i}" for i in range(30)))],
        "doc_id long, text string",
    )
    evals = spark.createDataFrame(
        [(100, " ".join(words[10:22])), (200, "z1 z2 z3 z4 z5 z6")],
        "doc_id long, text string",
    )
    out = {
        (r.id_a, r.id_b): r.containment
        for r in dedup.containment_join(evals, train, threshold=0.9).collect()
    }
    assert out == {(100, 1): 1.0}
    # fuzzy_join at any useful threshold misses the pasted eval doc
    assert (
        dedup.fuzzy_join(evals, train, threshold=0.5).count() == 0
    )
    # max_df path parity
    capped = {
        (r.id_a, r.id_b): r.containment
        for r in dedup.containment_join(
            evals, train, threshold=0.9, max_df=10
        ).collect()
    }
    assert capped == out
    import pytest as _pytest

    with _pytest.raises(ValueError, match="method"):
        dedup.containment_join(evals, train, method="nope")
    with _pytest.raises(ValueError, match="divisible"):
        dedup.containment_join(evals, train, method="minhash", num_hashes=10, bands=4)
    with _pytest.raises(ValueError, match="max_df"):
        dedup.containment_join(evals, train, method="minhash", max_df=5)


def test_shingle_profile_hand_computed_buckets(spark):
    """Power-of-two df buckets, pair mass, and the cumulative share
    match the hand computation; short docs contribute nothing."""
    from getl_spark.functions import dedup

    df = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "a b c e"),
            (3, "a b c f"),
            (4, "x y z w"),
            (5, "too short"),  # < n words: zero shingles
        ],
        "doc_id long, text string",
    )
    rows = {r.df_lo: r for r in dedup.shingle_profile(df, n=3).collect()}
    # dfreq: "a b c" x3; "b c d","b c e","b c f","x y z","y z w" x1
    assert set(rows) == {1, 2}
    r1, r2 = rows[1], rows[2]
    assert (r1.df_hi, r1.n_shingles, r1.posting_rows, r1.pair_mass) == (1, 5, 5, 0.0)
    assert (r2.df_hi, r2.n_shingles, r2.posting_rows, r2.pair_mass) == (3, 1, 3, 3.0)
    assert (r1.cum_pair_frac, r2.cum_pair_frac) == (0.0, 1.0)


def test_shingle_profile_matches_python_reference(spark):
    """Bucketed counts and pair mass match an independent dict-based
    reference on a random corpus, and the pair mass totals the exact
    candidate count of the uncapped inverted-index self-join."""
    import random
    from collections import Counter

    from getl_spark.functions import dedup

    rnd = random.Random(17)
    vocab = [f"w{i}" for i in range(30)]
    corpus = [
        (i, " ".join(rnd.choice(vocab) for _ in range(rnd.randint(1, 40))))
        for i in range(120)
    ]
    dfreq = Counter()
    for _, text in corpus:
        words = text.lower().split()
        grams = {
            " ".join(words[i : i + 3]) for i in range(max(len(words) - 2, 0))
        }
        dfreq.update(grams)
    ref = {}
    for d in dfreq.values():
        b = d.bit_length() - 1
        ns, pr, pm = ref.get(b, (0, 0, 0.0))
        ref[b] = (ns + 1, pr + d, pm + d * (d - 1) / 2.0)
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = dedup.shingle_profile(df, n=3).collect()
    assert {(r.df_lo.bit_length() - 1): (r.n_shingles, r.posting_rows, r.pair_mass)
            for r in got} == ref
    # the profile's total pair mass IS the self-join's candidate count
    n_pairs = sum(d * (d - 1) // 2 for d in dfreq.values())
    assert sum(r.pair_mass for r in got) == n_pairs
    assert got[-1].cum_pair_frac == 1.0


# ------------------------------------------------------------ phash
def _ref_phash(b: bytes) -> int:
    """Independent reference: plain-Python block means + median."""
    if not b:
        return 0
    data = list(b)
    while len(data) < 64:
        data = (data * 2)[: max(64, len(data))]
    n = len(data)
    means = []
    for i in range(64):
        lo, hi = (i * n) // 64, ((i + 1) * n) // 64
        block = data[lo:hi]
        means.append(sum(block) / len(block))
    med = sorted(means)
    med = (
        med[32] if False else (med[31] + med[32]) / 2
    )  # numpy median of 64 values
    h = 0
    for i, m in enumerate(means):
        if m > med:
            h |= 1 << (63 - i)
    return h - (1 << 64) if h >= (1 << 63) else h


def test_phash_matches_reference_and_locality(spark):
    from getl_spark.functions import multimodal as M

    payloads = {
        1: bytes(range(256)) * 3,
        2: b"\x00" * 500,                      # constant -> 0
        3: (b"abc123" * 64)[:300],
        4: b"",                                # empty -> 0
        5: bytes(range(256)) * 3,              # identical to 1
    }
    # a near-dup of 1: flip a small contiguous span
    mod = bytearray(payloads[1])
    for i in range(20):
        mod[400 + i] = 0   # zero out two blocks whose means sat above the median
    payloads[6] = bytes(mod)
    df = spark.createDataFrame(
        [(k, v) for k, v in payloads.items()], "doc_id LONG, content BINARY"
    )
    got = {r.doc_id: r.phash for r in M.phash(df).collect()}
    for k, v in payloads.items():
        assert got[k] == _ref_phash(v), k
    assert got[2] == 0 and got[4] == 0
    assert got[1] == got[5]
    # locality: the 20-byte edit flips few bits
    ham = bin((got[1] ^ got[6]) & ((1 << 64) - 1)).count("1")
    assert 0 < ham <= 8


def test_phash_pairs_finds_near_dups_only(spark):
    from getl_spark.functions import multimodal as M

    fam_a = bytes(range(256)) * 4
    edit = bytearray(fam_a)
    for i in range(15):
        edit[100 + i] = 0
    unrelated = bytes((i * 37 + 11) % 256 for i in range(1024))
    df = spark.createDataFrame(
        [(1, fam_a), (2, bytes(edit)), (3, unrelated)],
        "doc_id LONG, content BINARY",
    )
    pairs = {(r.id_a, r.id_b): r.hamming for r in M.phash_pairs(df).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] <= 8
    assert all({a, b} == {1, 2} for a, b in pairs)


def test_corpus_dup_report_rates(spark):
    """Exact / template / URL dup rates match hand counts on a corpus
    with planted exact dups, templated boilerplate, and
    query-string-only URL variants; NULL text excluded."""
    from getl_spark.functions import dedup

    rows = [
        # 2 exact dups of doc 1 (whitespace/case variants)
        (1, "Hello  World", "http://a.com/x?utm_source=1"),
        (2, "hello world", "http://a.com/x"),
        (3, "HELLO\tWORLD", "http://a.com/y"),
        # templated: same slot-masked key, different numbers
        (4, "Order #123 shipped", "http://b.com/1"),
        (5, "Order #456 shipped", "http://b.com/2"),
        # unique
        (6, "something else entirely", None),
        (7, None, "http://c.com"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING, url STRING")
    r = dedup.corpus_dup_report(df, "text", url_col="url").collect()[0]
    # 6 non-null texts; exact keys: {helloworld x3, order123, order456, other}
    assert (r.n_docs, r.n_unique_exact) == (6, 4)
    assert r.exact_dup_rate == round(1 - 4 / 6, 6)
    # template keys: order rows collapse -> {hello, order#0, other}
    assert r.n_unique_template == 3
    assert r.template_dup_rate == round(1 - 3 / 6, 6)
    # urls among non-null-text rows: 5; canonical collapses utm variant
    assert (r.n_with_url, r.n_unique_url) == (5, 4)
    assert r.url_dup_rate == round(1 - 4 / 5, 6)

    # text-only variant has no url columns
    r2 = dedup.corpus_dup_report(df, "text").collect()[0]
    assert "n_with_url" not in r2.asDict()


# ------------------------------------------------------ pair_recall_eval
def test_pair_recall_eval_hand_computed(spark):
    """Orientation-normalized pair overlap: recall/precision/F1 on
    hand frames, including reversed pairs, dup rows, and the 0/0 NULL
    conventions."""
    import pytest

    from getl_spark.functions import dedup

    exact = spark.createDataFrame(
        [(1, 2), (3, 4), (5, 6), (7, 8)], "id_a LONG, id_b LONG"
    )
    # (2,1) reversed = hit; (3,4) listed twice collapses; (9,10) fp
    approx = spark.createDataFrame(
        [(2, 1), (3, 4), (3, 4), (9, 10)], "id_a LONG, id_b LONG"
    )
    r = dedup.pair_recall_eval(approx, exact).collect()[0]
    assert (r.n_exact, r.n_approx, r.n_hit) == (4, 3, 2)
    assert r.recall == pytest.approx(0.5)
    assert r.precision == pytest.approx(2 / 3, abs=1e-6)
    p, q = 0.5, 2 / 3
    assert r.f1 == pytest.approx(2 * p * q / (p + q), abs=1e-6)

    empty = exact.limit(0)
    r2 = dedup.pair_recall_eval(empty, exact).collect()[0]
    assert r2.recall == 0.0 and r2.precision is None
    r3 = dedup.pair_recall_eval(approx, empty).collect()[0]
    assert r3.recall is None and r3.precision == 0.0


def test_pair_recall_eval_measures_lsh_against_exact(spark, near_dup_docs):
    """End-to-end: minhash_lsh pairs vs exact ngram_jaccard truth at
    the same threshold — every surviving LSH pair is exact-verified,
    so precision must be 1.0; recall is the banding loss being
    measured."""
    from getl_spark.functions import dedup

    exact = dedup.ngram_jaccard(near_dup_docs, threshold=0.3)
    approx = dedup.minhash_lsh(near_dup_docs, threshold=0.3)
    r = dedup.pair_recall_eval(approx, exact).collect()[0]
    assert r.n_exact > 0
    assert r.precision == 1.0
    assert 0.0 < r.recall <= 1.0


def test_cdc_chunks_matches_python_reference_and_is_edit_robust(spark):
    """The vectorized gear-hash chunker equals the pure-Python twin
    byte-for-byte on random data; boundaries are insertion-robust
    (shared passage keeps identical chunk hashes after a prefix
    edit); min/max walk honored; NULL/empty texts emit nothing;
    guards fire."""
    import hashlib
    import random

    import pytest

    from getl_spark.functions import dedup

    rnd = random.Random(97)
    docs = []
    for i in range(12):
        n = rnd.randint(0, 3000)
        docs.append((i, "".join(chr(rnd.randint(32, 126)) for _ in range(n))))
    docs += [(100, None), (101, "")]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    out = dedup.cdc_chunks(df, min_size=32, avg_size=128, max_size=512)
    rows = out.collect()
    got = {}
    for r in rows:
        got.setdefault(r.doc_id, []).append(r)
    assert 100 not in got and 101 not in got

    for i, txt in docs:
        if txt is None or txt == "":
            continue
        data = txt.encode("utf-8")
        bounds = dedup.cdc_boundaries_py(data, 32, 128, 512)
        mine = sorted(got.get(i, []), key=lambda r: r.chunk_idx)
        assert [r.chunk_len for r in mine] == [
            b - a for a, b in zip([0] + bounds, bounds)
        ]
        prev = 0
        for r, b in zip(mine, bounds):
            assert r.chunk_hash == hashlib.md5(data[prev:b]).hexdigest()
            prev = b
        # walk contract: every chunk within [1, max]; all but the
        # last at least min (the tail and forced cuts may be shorter)
        lens = [r.chunk_len for r in mine]
        assert all(1 <= L <= 512 for L in lens)
        assert sum(lens) == len(data)

    # insertion robustness: shift a long doc by a prefix edit — the
    # majority of chunk hashes survive (fixed-offset windows would
    # all change)
    base = "".join(chr(rnd.randint(32, 126)) for _ in range(8000))
    pair = spark.createDataFrame(
        [(1, base), (2, "INSERTED PREAMBLE >>> " + base)],
        "doc_id LONG, text STRING",
    )
    ch = dedup.cdc_chunks(pair, min_size=32, avg_size=128, max_size=512)
    sets = {
        r[0]: set(r[1])
        for r in ch.groupby("doc_id")
        .agg(F.collect_set("chunk_hash"))
        .collect()
    }
    shared = len(sets[1] & sets[2])
    assert shared >= 0.7 * len(sets[1])

    with pytest.raises(ValueError, match="power of two"):
        dedup.cdc_chunks(df, avg_size=100)
    with pytest.raises(ValueError, match="cdc_chunks"):
        dedup.cdc_chunks(df, min_size=0)


def test_cdc_pairs_finds_shared_passages(spark):
    """Two docs sharing a long CDC-aligned passage pair up with
    containment near the shared fraction; unrelated docs don't;
    min_shared filters; the max_df capped path still counts the
    exact intersection."""
    import random

    import pytest

    from getl_spark.functions import dedup

    rnd = random.Random(13)

    def blob(n):
        return "".join(chr(rnd.randint(32, 126)) for _ in range(n))

    passage = blob(6000)
    a = passage + blob(500)
    b = blob(700) + passage
    c = blob(6000)
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id LONG, text STRING"
    )
    out = dedup.cdc_pairs(
        df, min_shared=2, min_size=32, avg_size=128, max_size=512
    ).collect()
    pairs = {(r.id_a, r.id_b): r for r in out}
    assert (1, 2) in pairs
    assert all(k == (1, 2) for k in pairs)  # c unrelated
    r = pairs[(1, 2)]
    assert r.shared_chunks >= 2
    assert 0 < r.containment <= 1
    assert r.containment >= 0.6  # most of the shorter doc is shared

    # max_df cap keeps the pair (chunk df here is ≤ 2) and exactness
    capped = dedup.cdc_pairs(
        df, min_shared=2, max_df=2, min_size=32, avg_size=128, max_size=512
    ).collect()
    rc = {(x.id_a, x.id_b): x for x in capped}[(1, 2)]
    assert (rc.shared_chunks, rc.containment) == (
        r.shared_chunks,
        r.containment,
    )

    # threshold filter
    hi = dedup.cdc_pairs(
        df, threshold=1.01, min_size=32, avg_size=128, max_size=512
    ).count()
    assert hi == 0


def test_cdc_stored_index_roundtrip(spark, tmp_path):
    """build -> against -> append daily-ingest loop: an increment
    sharing a passage with an indexed doc pairs up; unrelated docs
    don't; meta drives increment chunking; replayed duplicate chunk
    rows can't inflate shared counts; max_df drops hot boilerplate;
    append makes tomorrow's increment see today's survivors."""
    import random

    from getl_spark.functions import dedup

    path = str(tmp_path / "cdc_index")
    rnd = random.Random(67)

    def blob(n):
        return "".join(chr(rnd.randint(32, 126)) for _ in range(n))

    passage = blob(5000)
    boiler = blob(300)  # will be shared by EVERY indexed doc
    corpus = [
        (1, passage + blob(400) + boiler),
        (2, blob(4000) + boiler),
        (3, blob(4000) + boiler),
    ]
    summary = dedup.build_cdc_index(
        spark.createDataFrame(corpus, "doc_id LONG, text STRING"),
        path, min_size=32, avg_size=128, max_size=512,
    ).collect()[0]
    assert summary.n_docs == 3 and summary.n_chunks > 0
    assert summary.max_chunk_df >= 2  # the boilerplate chunks

    inc = spark.createDataFrame(
        [(100, blob(600) + passage), (101, blob(5000))],
        "doc_id LONG, text STRING",
    )
    hits = dedup.cdc_against_stored_index(
        inc, path, min_shared=2, threshold=0.3
    ).collect()
    assert {(r.new_id, r.index_id) for r in hits} == {(100, 1)}
    hit = hits[0]
    assert hit.containment >= 0.5 and hit.shared_chunks >= 2

    # replay-duplicate tolerance: append the SAME chunk rows again
    # (simulating a replayed crash window) — shared counts unchanged
    ch = spark.read.parquet(f"{path}/chunks")
    ch.write.mode("append").parquet(f"{path}/chunks")
    hits2 = {
        (r.new_id, r.index_id): r.shared_chunks
        for r in dedup.cdc_against_stored_index(
            inc, path, min_shared=2, threshold=0.3
        ).collect()
    }
    assert hits2 == {(100, 1): hit.shared_chunks}

    # max_df=1 kills the boilerplate-only signal: doc 101 still no
    # pair, doc 100's passage chunks (df=1) survive
    capped = dedup.cdc_against_stored_index(
        inc, path, min_shared=2, threshold=0.3, max_df=1
    ).collect()
    assert {(r.new_id, r.index_id) for r in capped} == {(100, 1)}

    # append the surviving increment; a doc sharing ITS text now hits
    dedup.cdc_index_append(
        inc.where("doc_id = 101"), path
    )
    day2 = spark.createDataFrame(
        [(200, blob(300) + passage)], "doc_id LONG, text STRING"
    )
    # passage lives in docs 1 (indexed day 0) and 100 (never appended)
    d2 = dedup.cdc_against_stored_index(
        day2, path, min_shared=2, threshold=0.3
    ).collect()
    assert {(r.new_id, r.index_id) for r in d2} == {(200, 1)}


def test_dedup_media_collapses_family_keeps_quality_winner(spark):
    from getl_spark.functions import multimodal as M

    fam_a = bytes(range(256)) * 4
    edit = bytearray(fam_a)
    for i in range(15):
        edit[100 + i] = 0
    edit2 = bytearray(fam_a)
    for i in range(10):
        edit2[500 + i] = 255
    unrelated = bytes((i * 37 + 11) % 256 for i in range(1024))
    df = spark.createDataFrame(
        [
            (1, fam_a, 100),
            (2, bytes(edit), 900),     # same family, highest quality
            (3, bytes(edit2), 500),    # same family
            (4, unrelated, 50),
        ],
        "doc_id LONG, content BINARY, resolution INT",
    )
    # min-id survivor by default
    kept = {r.doc_id for r in M.dedup_media(df).collect()}
    assert kept == {1, 4}
    # quality winner keeps the highest-resolution copy instead
    kept_q = {
        r.doc_id for r in M.dedup_media(df, quality_col="resolution").collect()
    }
    assert kept_q == {2, 4}


def test_dedup_media_no_false_merges(spark):
    from getl_spark.functions import multimodal as M

    # distinct pseudo-images: nothing should collapse
    rows = [
        (i, bytes((j * (i + 7) + i * 13) % 256 for j in range(512)))
        for i in range(1, 6)
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, content BINARY")
    assert M.dedup_media(df).count() == 5


def test_minhash_index_health_real_and_hot(spark, tmp_path):
    """minhash_index_health on a real index, then on a boilerplate
    corpus (identical text -> identical signatures -> every band
    bucket holds all copies) the hot-bucket flag must fire."""
    from getl_spark.functions import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(200)
    p = str(tmp_path / "idx")
    dedup.build_minhash_index(docs, p, num_hashes=16, bands=4)
    r = dedup.minhash_index_health(spark, p).collect()[0]
    assert (r.bands, r.num_hashes) == (4, 16)
    assert r.n_docs == 200
    assert r.n_entries == 200 * 4           # one key per doc per band
    assert r.max_bucket >= 1 and r.n_buckets <= r.n_entries
    assert abs(r.mean_bucket - r.n_entries / r.n_buckets) < 1e-6
    assert r.expected_probe >= r.mean_bucket - 1e-9  # size-biased >= mean
    assert not r.attention

    # boilerplate corpus: 60 identical docs -> 4 buckets of 60
    boiler = spark.createDataFrame(
        [(i, "the same boilerplate footer text repeated verbatim " * 3)
         for i in range(60)],
        "doc_id LONG, text STRING",
    )
    pb = str(tmp_path / "boiler")
    dedup.build_minhash_index(boiler, pb, num_hashes=16, bands=4)
    b = dedup.minhash_index_health(spark, pb, hot_bucket=50).collect()[0]
    assert b.max_bucket == 60 and b.hot_buckets == 4 and b.attention
    assert b.expected_probe == 60.0
    assert b.candidate_pairs == 4 * 60 * 59 / 2

    with pytest.raises(ValueError, match="hot_bucket"):
        dedup.minhash_index_health(spark, p, hot_bucket=0)


def test_minhash_health_gate_blocks_append_and_merge(spark, tmp_path):
    """The executable maintenance gate on the dedup side: a hot-bucket
    index refuses appends and merges until rebuilt/screened."""
    from getl_spark.common.errors import IndexHealthError
    from getl_spark.functions import dedup

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(100)
    p = str(tmp_path / "idx")
    dedup.build_minhash_index(docs, p, num_hashes=16, bands=4)
    row = dedup.assert_minhash_index_healthy(spark, p, hot_bucket=50)
    assert row["attention"] is False

    boiler = spark.createDataFrame(
        [(1000 + i, "the same boilerplate footer text repeated " * 3)
         for i in range(60)],
        "doc_id LONG, text STRING",
    )
    pb = str(tmp_path / "boiler")
    dedup.build_minhash_index(boiler, pb, num_hashes=16, bands=4)
    with pytest.raises(IndexHealthError, match="hot") as ei:
        dedup.assert_minhash_index_healthy(spark, pb, hot_bucket=50)
    assert ei.value.readout["attention"] is True
    # append gate (int threshold) trips; ungated append still works
    more = spark.createDataFrame(
        [(5000, "a genuinely different doc about spark shuffles")],
        "doc_id LONG, text STRING",
    )
    with pytest.raises(IndexHealthError, match="hot"):
        dedup.index_append(more, pb, health_gate=50)
    dedup.index_append(more, pb)  # legacy: no gate, append proceeds
    # merge gate trips on the hot input
    with pytest.raises(IndexHealthError, match="hot"):
        dedup.merge_minhash_index(
            spark, p, pb, str(tmp_path / "never"), health_gate=50
        )
    # healthy x healthy with the gate on passes
    p2 = str(tmp_path / "idx2")
    dedup.build_minhash_index(
        docs.withColumn("doc_id", F.col("doc_id") + 100000),
        p2, num_hashes=16, bands=4,
    )
    dedup.merge_minhash_index(
        spark, p, p2, str(tmp_path / "m"), health_gate=50
    )


def test_lsh_plan_s_curve(spark):
    from getl_spark.functions import dedup

    out = dedup.lsh_plan(spark, threshold=0.8, num_hashes=64).collect()
    # every factoring of 64 x 6 default jaccard points
    factorings = {(r.bands, r.rows_per_band) for r in out}
    assert factorings == {(1, 64), (2, 32), (4, 16), (8, 8), (16, 4),
                          (32, 2), (64, 1)}
    assert len(out) == 7 * 6
    rows = {(r.bands, r.s): r.p_candidate for r in out}
    mids = {r.bands: r.midpoint for r in out}
    import math

    for b in (1, 2, 4, 8, 16, 32, 64):
        rr = 64 // b
        assert abs(mids[b] - (1 / b) ** (1 / rr)) < 1e-6
        for s in (0.3, 0.5, 0.7, 0.8, 0.9, 0.95):
            want = 1 - (1 - s ** rr) ** b
            assert abs(rows[(b, s)] - want) < 1e-6, (b, s)
    # the classic 16x4 band choice has its midpoint right at 0.5 and
    # is monotone in s
    curve = [rows[(16, s)] for s in (0.3, 0.5, 0.7, 0.8, 0.9, 0.95)]
    assert curve == sorted(curve)
    # exactly one recommended factoring; its midpoint is the closest
    rec = {r.bands for r in out if r.recommended}
    assert len(rec) == 1
    best = min(mids, key=lambda b: (abs(mids[b] - 0.8), b))
    assert rec == {best}

    with pytest.raises(ValueError, match="threshold"):
        dedup.lsh_plan(spark, threshold=1.0)
    with pytest.raises(ValueError, match="num_hashes"):
        dedup.lsh_plan(spark, 0.8, num_hashes=1)
    with pytest.raises(ValueError, match="jaccard_points"):
        dedup.lsh_plan(spark, 0.8, jaccard_points=[0.5, 1.5])

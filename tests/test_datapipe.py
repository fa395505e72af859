"""Datapipe tests: dedup/similarity/text kernels on crafted inputs."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from engine_spark.datapipe import fragments as FR
from engine_spark.datapipe.fragments import Dialect
from engine_spark.datapipe.multimodal import decode_meta
from tests.conftest import rows

SP = Dialect("spark")


def docs(spark):
    return spark.createDataFrame(
        [
            (0, "the cat sat on the mat"),
            (1, "the cat sat on the mat"),  # exact dup of 0
            (2, "the cat sat on the hat"),  # near dup
            (3, "completely different words here entirely"),
            (4, "x"),  # shorter than any shingle
        ],
        "doc_id long, text string",
    )


def test_tokens_and_shingles(spark):
    out = docs(spark).select(
        F.expr(SP.size(FR.tokens(SP))).alias("n"),
        F.expr(FR.shingles(SP, FR.tokens(SP), 2)).alias("sh"),
    ).collect()
    assert out[0]["n"] == 6
    assert "the cat" in out[0]["sh"] and "cat sat" in out[0]["sh"]
    assert out[4]["sh"] == []  # 1 token → no 2-grams


def test_exact_dedup_groups_identical_texts(spark):
    d = docs(spark)
    out = (
        d.select("doc_id", F.expr("md5(lower(text))").alias("h"))
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep"), F.count(F.lit(1)).alias("n"))
    )
    got = {r["keep"]: r["n"] for r in out.collect()}
    assert got[0] == 2  # docs 0 and 1 collapse
    assert got[2] == 1


def test_jaccard_fragment(spark):
    d = docs(spark).select("doc_id", F.expr(FR.shingles(SP, FR.tokens(SP), 2)).alias("sh"))
    a = d.filter("doc_id = 0").select(F.col("sh").alias("sa"))
    b = d.filter("doc_id = 2").select(F.col("sh").alias("sb"))
    j = a.crossJoin(b).select(F.expr(FR.jaccard(SP, "sa", "sb")).alias("j")).collect()[0]["j"]
    # shingles: 5 each ("the cat","cat sat","sat on","on the","the mat"/"the hat")
    assert j == 4 / 6


def test_minhash_identical_sets_have_identical_signatures(spark):
    d = docs(spark).select(
        "doc_id", F.expr(FR.shingles(SP, FR.tokens(SP), 2)).alias("sh")
    ).withColumn("hs", F.expr(FR.shingle_hashes(SP, "sh")))
    sigs = d.select(
        "doc_id",
        *[
            F.expr(FR.minhash_one(SP, "hs", FR.MINHASH_A[i], FR.MINHASH_B[i])).alias(f"m{i}")
            for i in range(8)
        ],
    ).collect()
    by_id = {r["doc_id"]: tuple(r[f"m{i}"] for i in range(8)) for r in sigs}
    assert by_id[0] == by_id[1]  # identical text → identical signature
    assert by_id[0] != by_id[3]
    # similar docs agree on *some* minhashes (4/6 shingles shared)
    agree = sum(1 for i in range(8) if by_id[0][i] == by_id[2][i])
    assert agree >= 1


def test_simhash_near_for_near_texts(spark):
    expr = FR.simhash(SP, SP.transform(SP.distinct(FR.tokens(SP)), "t", SP.hash56("t")))
    out = docs(spark).select("doc_id", F.expr(expr).alias("s")).collect()
    by_id = {r["doc_id"]: r["s"] for r in out}
    assert by_id[0] == by_id[1]
    ham_near = bin(by_id[0] ^ by_id[2]).count("1")
    ham_far = bin(by_id[0] ^ by_id[3]).count("1")
    assert ham_near < ham_far


def test_cosine_fold(spark):
    d = spark.createDataFrame([(1,)], "i int").select(
        F.expr("array(1.0D, 0.0D, 0.0D)").alias("a"),
        F.expr("array(0.6D, 0.8D, 0.0D)").alias("b"),
    )
    c = d.select(F.expr(FR.cosine(SP, "a", "b", 3)).alias("c")).collect()[0]["c"]
    assert math.isclose(c, 0.6, rel_tol=1e-12)


def test_hyperplane_bucket_deterministic(spark):
    planes = FR.hyperplanes(1, 4, 3)[0]
    d = spark.createDataFrame([(1,)], "i int").select(
        F.expr("array(1.0D, 2.0D, 3.0D)").alias("v")
    )
    b1 = d.select(F.expr(FR.hyperplane_bits(SP, "v", planes, 3)).alias("b")).collect()[0]["b"]
    b2 = d.select(F.expr(FR.hyperplane_bits(SP, "v", planes, 3)).alias("b")).collect()[0]["b"]
    assert b1 == b2 and 0 <= b1 < 16


def test_no_fake_decode_remnant():
    """_fake_decode is fully retired: every unrecognized-payload path in
    the multimodal pipeline degrades to honest NULLs."""
    from engine_spark.datapipe import multimodal

    assert not hasattr(multimodal, "_fake_decode")


def test_decode_meta_real_dispatch(spark):
    """decode_meta routes every payload through the real stdlib parsers:
    PNG/GIF headers, MP4 sample tables + tkhd dims, WAV PCM frames;
    unrecognized bytes degrade to NULL metadata with a real checksum."""
    import struct

    import numpy as np

    from engine_spark.datapipe.multimodal import encode_mp4, encode_wav

    png = (
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0d" + b"IHDR"
        + struct.pack(">II", 640, 480) + b"\x08\x06\x00\x00\x00"
    )
    mp4 = encode_mp4(
        [b"f0" * 10, b"f1" * 10, b"f2" * 10], codec=b"jpeg",
        width=320, height=200,
    )
    wav = encode_wav(np.arange(400, dtype=np.int16), sample_rate=8000)
    d = spark.createDataFrame(
        [
            (0, bytearray(png)),
            (1, bytearray(mp4)),
            (2, bytearray(wav)),
            (3, bytearray(b"the cat sat on the mat")),
            (4, None),
        ],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in decode_meta(d).collect()}
    assert (out[0]["format"], out[0]["width"], out[0]["height"],
            out[0]["n_frames"]) == ("png", 640, 480, 1)
    assert (out[1]["format"], out[1]["n_frames"]) == ("mp4", 3)
    assert (out[1]["width"], out[1]["height"]) == (320, 200)  # tkhd 16.16
    assert (out[2]["format"], out[2]["n_frames"]) == ("wav", 400)
    assert out[2]["width"] is None and out[2]["height"] is None
    # unrecognized: honest NULLs, real checksum
    assert out[3]["format"] is None and out[3]["width"] is None
    assert out[3]["n_frames"] is None
    assert out[3]["checksum"] == sum(b"the cat sat on the mat") % 65536
    assert out[4]["checksum"] is None


def test_encode_mp4_tkhd_is_spec_complete():
    """tkhd v0 body is exactly 84 bytes (ISO 14496-12 §8.3.2) with the
    identity matrix and 16.16 width/height — strict demuxers reject a
    truncated track header."""
    import struct

    from engine_spark.datapipe.multimodal import encode_mp4

    b = encode_mp4([b"x" * 8], width=64, height=48)
    i = b.find(b"tkhd")
    assert i > 0
    (size,) = struct.unpack(">I", b[i - 4 : i])
    assert size == 8 + 84, f"tkhd box is {size - 8} body bytes, want 84"
    body = b[i + 4 : i + 4 + 84]
    matrix = struct.unpack(">9I", body[40:76])
    assert matrix == (0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
    w16, h16 = struct.unpack(">II", body[76:84])
    assert (w16 >> 16, h16 >> 16) == (64, 48)


def test_lang_predict_stopword_scoring(spark):
    d = spark.createDataFrame(
        [(0, "the cat and the dog"), (1, "der hund und die katze ist"), (2, "qqq www zzz")],
        "doc_id long, text string",
    )
    scores = FR.lang_scores(SP, FR.tokens(SP))
    out = d.select("doc_id", F.expr(FR.lang_predict(scores)).alias("p")).collect()
    got = {r["doc_id"]: r["p"] for r in out}
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "und"  # no stopword hits → undetermined


def test_train_eval_split_disjoint_exhaustive(spark):
    from engine_spark.datapipe.sampling import train_eval_split

    d = docs(spark)
    train, ev = train_eval_split(d, "doc_id", 0.4)
    n_train, n_eval = train.count(), ev.count()
    assert n_train + n_eval == d.count()
    assert train.join(ev, "doc_id", "inner").count() == 0
    # reproducible: same split on recompute
    train2, _ = train_eval_split(d, "doc_id", 0.4)
    assert sorted(r["doc_id"] for r in train.collect()) == sorted(
        r["doc_id"] for r in train2.collect()
    )


def test_stratified_hash_sample(spark):
    from engine_spark.datapipe.sampling import stratified_hash_sample

    d = spark.createDataFrame(
        [(i, "en" if i % 2 else "de") for i in range(200)], "doc_id long, lang string"
    )
    out = stratified_hash_sample(d, "doc_id", "lang", {"en": 1.0, "de": 0.0})
    langs = {r["lang"] for r in out.collect()}
    assert langs == {"en"}


def test_ngram_candidates_hot_shingle_capped(spark):
    """A corpus stop-shingle shared by every doc must not go quadratic.

    40 docs all contain "of the"; true near-dup pairs share RARE shingles.
    With the df cap the candidate count stays O(dup pairs), not O(docs²).
    """
    from engine_spark.datapipe.queries import ngram_candidates

    rows_ = []
    for i in range(40):
        # every doc carries the stop-shingle "of the"; consecutive even/odd
        # pairs (0,1), (2,3), ... share a rare distinctive shingle pair
        rows_.append((i, f"of the unique{i // 2} marker{i // 2}"))
    d = spark.createDataFrame(rows_, "doc_id long, text string")
    sh = d.select(
        "doc_id", F.expr(FR.shingles(SP, FR.tokens(SP), 2)).alias("sh")
    )
    capped = ngram_candidates(sh, df_cap=10)
    got = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    # exactly the 20 rare-shingle pairs; the 40·39/2 = 780 stop-shingle
    # pairs are gone
    assert got == {(2 * k, 2 * k + 1) for k in range(20)}
    # uncapped control: the hot shingle makes every pair a candidate
    uncapped = ngram_candidates(sh, df_cap=1000)
    assert uncapped.count() == 780


def _clustered_vectors(spark, n_clusters=8, per_cluster=30, dim=64):
    """Synthetic clustered corpus: cluster centers on distinct axes, points =
    center + small deterministic noise. Mirrors real embedding geometry
    (clustered), where IVF recall depends on centroid quality."""
    import math

    rows_ = []
    vid = 0
    for c in range(n_clusters):
        for j in range(per_cluster):
            base = [0.0] * dim
            # center: two hot axes per cluster keeps clusters well separated
            base[c] = 5.0
            base[(c + 11) % dim] = 3.0
            vec = [
                base[i] + 0.1 * math.sin(1.7 * (vid + 1) * (i + 1))
                for i in range(dim)
            ]
            rows_.append((vid, vec))
            vid += 1
    return spark.createDataFrame(rows_, "vec_id long, embedding array<double>")


def test_kmeans_train_converges_to_cluster_centers(spark):
    from engine_spark.datapipe.ivf import kmeans_train

    v = _clustered_vectors(spark)
    cents = kmeans_train(v, "embedding", dim=16, k=8, iters=5)
    assert len(cents) == 8 and all(len(c) == 16 for c in cents)
    # every true cluster center (hot axis c within the first 16 dims) must be
    # represented: some centroid has a dominant coordinate ~5.0 at axis c
    for c in range(8):
        assert any(abs(cent[c] - 5.0) < 0.5 for cent in cents), f"cluster {c} lost"


def test_ivf_trained_recall_on_clustered_data(spark):
    """Trained centroids hold >=0.9 recall@3 at nprobe=2 vs brute force."""
    from engine_spark.datapipe.ivf import ivf_search, kmeans_train

    v = _clustered_vectors(spark)
    n_queries, topk = 5, 3
    cents = kmeans_train(v, "embedding", dim=16, k=8, iters=5)
    ivf = ivf_search(
        v, cents, full_dim=64, cell_dim=16,
        n_queries=n_queries, nprobe=2, topk=topk,
    ).collect()

    # brute force oracle: exact cosine over all pairs for the same queries
    e = v.selectExpr(
        "vec_id",
        "transform(embedding, x -> CAST(x AS DOUBLE)) AS vd",
        "sqrt(aggregate(embedding, cast(0.0 as double), (a, x) -> a + x * x)) AS nrm",
    )
    q = e.filter(F.col("vec_id") < n_queries).selectExpr(
        "vec_id AS q_id", "vd AS qv", "nrm AS qn"
    )
    from pyspark.sql import Window

    scored = (
        e.crossJoin(q)
        .filter("vec_id <> q_id")
        .selectExpr(
            "q_id",
            "vec_id AS cand_id",
            "aggregate(zip_with(qv, vd, (a, b) -> a * b), cast(0.0 as double),"
            " (a, x) -> a + x) / (qn * nrm) AS cos_sim",
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos_sim").desc(), F.col("cand_id"))
    brute = (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= topk)
        .collect()
    )
    truth = {(r["q_id"], r["cand_id"]) for r in brute}
    got = {(r["q_id"], r["cand_id"]) for r in ivf}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.9, f"recall@{topk} = {recall}"


def test_pii_scrub_redacts_all_classes(spark):
    from engine_spark.datapipe.queries import PII_PATTERNS, scrub_expr

    d = spark.createDataFrame(
        [
            (0, "contact bob@example.com or 192.168.1.10 or 555-123-4567 twice bob@example.com"),
            (1, "clean text with no identifiers"),
        ],
        "doc_id long, text string",
    )
    out = d.select(
        "doc_id", F.expr(scrub_expr(SP)).alias("scrubbed")
    ).collect()
    got = {r["doc_id"]: r["scrubbed"] for r in out}
    assert got[0] == "contact <EMAIL> or <IPV4> or <PHONE> twice <EMAIL>"
    assert got[1] == "clean text with no identifiers"
    # patterns are backslash-free so the literal is dialect-portable
    assert all("\\" not in p for p in PII_PATTERNS.values())


def test_connected_components_chain_and_clique(spark):
    from engine_spark.datapipe.cluster import connected_components

    # chain 1-2-3-4 (diameter 3: transitivity must propagate), clique 10-11-12,
    # isolated pair 20-21; vertex 99 appears in no edge -> absent from output
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "src long, dst long",
    )
    out = {r["vertex"]: r["component"] for r in connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_dedup_clusters_canonical_and_sizes(spark):
    from engine_spark.datapipe.cluster import dedup_clusters

    pairs = spark.createDataFrame(
        [(5, 9), (9, 7), (30, 31)], "doc_a long, doc_b long"
    )
    got = {r["doc_id"]: r for r in dedup_clusters(pairs).collect()}
    assert got[5]["canonical_id"] == 5 and got[5]["is_canonical"]
    assert got[7]["canonical_id"] == 5 and not got[7]["is_canonical"]
    assert got[9]["cluster_size"] == 3
    assert got[30]["cluster_size"] == 2 and got[31]["canonical_id"] == 30


def test_connected_components_round_budget_falls_back_to_stars(spark):
    """A graph unconverged inside the propagation budget no longer raises:
    it hands off to the large-star/small-star contraction, which finishes
    any shape (VERDICT r11 task #3)."""
    from engine_spark.datapipe.cluster import connected_components

    long_chain = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src long, dst long"
    )
    out = {
        r["vertex"]: r["component"]
        for r in connected_components(
            long_chain, max_rounds=2, star_after=1
        ).collect()
    }
    assert out == {i: 0 for i in range(7)}


def test_star_components_chain_clique_and_two_node(spark):
    from engine_spark.datapipe.cluster import star_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "u long, v long",
    )
    sym = edges.union(edges.selectExpr("v as u", "u as v"))
    out = {r["vertex"]: r["component"] for r in star_components(sym).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_repetition_metrics_flag_duplicated_text(spark):
    from engine_spark.datapipe.queries import _repetition_cols

    df = spark.createDataFrame(
        [
            (0, "spam spam spam spam spam"),   # one distinct 2-gram, 4 total
            (1, "all fresh words never repeat"),
            (2, "x"),                           # no 2-grams -> ratio 0 by guard
            (3, "a b ###### c"),                # symbols + a long token
        ],
        "doc_id long, text string",
    )
    staged = df.select(
        "doc_id",
        "text",
        F.expr(FR.tokens(SP)).alias("_toks"),
        F.expr(FR.grams_all(SP, FR.tokens(SP), 2)).alias("_g2"),
    )
    cols = [F.expr(e).alias(n) for n, e in _repetition_cols(SP)]
    out = {r["doc_id"]: r for r in staged.select("doc_id", *cols).collect()}
    assert out[0]["dup_2gram_ratio"] == 0.75  # 1 - 1/4
    assert out[1]["dup_2gram_ratio"] == 0.0
    assert out[2]["dup_2gram_ratio"] == 0.0
    assert out[3]["symbol_ratio"] > 0.4
    assert out[3]["max_token_len"] == 6


def test_arrow_kernels_match_fold_path(spark):
    """The Arrow/numpy scale path must agree with the oracle-gated HOF-fold
    path: identical candidate pair set, cosines within float noise."""
    from engine_spark.datapipe.queries import (
        COSINE_T, LSH_PROJ_DIM, PLANES, SP, _vecd, q_dedup_embedding_cosine,
    )
    from engine_spark.datapipe.vector import dedup_embedding_cosine_arrow
    from engine_spark.catalog import Catalog

    sf = "/root/testdata/sf0.001"
    fold = q_dedup_embedding_cosine(spark, sf).filter("mode = 'neardup'")
    emb = Catalog(spark, sf)["embeddings"]
    vecs = emb.select("vec_id", F.expr(_vecd(SP)).alias("vd"))
    arrow = dedup_embedding_cosine_arrow(
        vecs, PLANES, LSH_PROJ_DIM, COSINE_T
    )
    f = {(r["vec_a"], r["vec_b"]): r["cos_sim"] for r in fold.collect()}
    a = {(r["vec_a"], r["vec_b"]): r["cos_sim"] for r in arrow.collect()}
    assert set(f) == set(a)
    assert len(f) > 0
    assert all(abs(f[k] - a[k]) < 1e-6 for k in f)  # fold side is r6-rounded


def test_contamination_pairs_detects_embedded_eval_doc(spark):
    from engine_spark.datapipe.decontamination import contamination_pairs

    def sh(spark_df):
        toks = spark_df.select("doc_id", F.expr(FR.tokens(Dialect("spark"))).alias("toks"))
        return toks.select(
            "doc_id", F.expr(FR.shingles(Dialect("spark"), "toks", 3)).alias("sh")
        ).filter(F.expr("size(sh) > 0"))

    train = spark.createDataFrame(
        [
            # contains the eval doc verbatim inside a longer text
            (1, "preamble words here the quick brown fox jumps over the lazy dog and more trailing text"),
            # unrelated
            (2, "completely different content about spark query engines and shuffles"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    out = contamination_pairs(sh(train), sh(ev), threshold=0.5).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.train_id, r.eval_id) == (1, 100)
    assert r.containment == 1.0  # every eval 3-gram appears in train doc 1


def test_contamination_df_cap_drops_stop_gram_candidates(spark):
    from engine_spark.datapipe.decontamination import contamination_pairs

    # every train doc shares ONE hot 3-gram with the eval doc; with the cap
    # below the hot gram's df, no candidates can form
    train = spark.createDataFrame(
        [(i, "alpha beta gamma unique%d filler%d" % (i, i)) for i in range(1, 6)],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "alpha beta gamma")], "doc_id long, text string"
    )

    def sh(spark_df):
        toks = spark_df.select("doc_id", F.expr(FR.tokens(Dialect("spark"))).alias("toks"))
        return toks.select(
            "doc_id", F.expr(FR.shingles(Dialect("spark"), "toks", 3)).alias("sh")
        ).filter(F.expr("size(sh) > 0"))

    capped = contamination_pairs(sh(train), sh(ev), threshold=0.0, df_cap=3)
    assert capped.count() == 0
    uncapped = contamination_pairs(sh(train), sh(ev), threshold=0.0, df_cap=100)
    assert uncapped.count() == 5


def test_incremental_dedup_across_batches(spark, tmp_path):
    from engine_spark.datapipe.incremental import IncrementalMinHashDeduper

    dd = IncrementalMinHashDeduper(spark, str(tmp_path / "state"), threshold=0.5)
    base = (
        "the quick brown fox jumps over the lazy dog while the cat sleeps "
        "on the warm windowsill in the afternoon sun light"
    )
    b1 = spark.createDataFrame(
        [(1, base), (2, "an entirely different document about query engines")],
        "doc_id long, text string",
    )
    p1 = dd.process_batch(b1, 0).collect()
    assert p1 == []  # no near-dups within batch 1

    # batch 2: doc 3 is a near-copy of doc 1 (one word changed)
    b2 = spark.createDataFrame(
        [(3, base.replace("afternoon", "morning")), (4, "yet another unrelated text body")],
        "doc_id long, text string",
    )
    p2 = {(r.doc_new, r.doc_prior): r.est_jaccard for r in dd.process_batch(b2, 1).collect()}
    assert (3, 1) in p2
    assert p2[(3, 1)] >= 0.5


def test_incremental_dedup_epoch_replay_is_idempotent(spark, tmp_path):
    from engine_spark.datapipe.incremental import IncrementalMinHashDeduper

    dd = IncrementalMinHashDeduper(spark, str(tmp_path / "state"), threshold=0.5)
    b1 = spark.createDataFrame(
        [(1, "some stable document text that is long enough to shingle")],
        "doc_id long, text string",
    )
    dd.process_batch(b1, 0)
    n_before = dd.corpus_signatures().count()
    # crash replay of epoch 0: same result, no state growth
    replay = dd.process_batch(b1, 0)
    assert replay.collect() == []
    assert dd.corpus_signatures().count() == n_before

    # a replayed batch containing an internal near-dup pair must emit the
    # pair set ONCE, not re-emit it via the batch-vs-corpus join against the
    # epoch's own committed signatures (in both orientations)
    txt = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    b2 = spark.createDataFrame(
        [(20, txt), (21, txt), (22, "some other unrelated body of words")],
        "doc_id long, text string",
    )
    first = sorted(
        (r.doc_new, r.doc_prior) for r in dd.process_batch(b2, 1).collect()
    )
    assert first == [(21, 20)]
    n_after = dd.corpus_signatures().count()
    replay2 = sorted(
        (r.doc_new, r.doc_prior) for r in dd.process_batch(b2, 1).collect()
    )
    assert replay2 == first
    assert dd.corpus_signatures().count() == n_after


def test_incremental_dedup_batch_internal_pairs(spark, tmp_path):
    from engine_spark.datapipe.incremental import IncrementalMinHashDeduper

    dd = IncrementalMinHashDeduper(spark, str(tmp_path / "state"), threshold=0.5)
    txt = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    b = spark.createDataFrame(
        [(10, txt), (11, txt), (12, "unrelated words only here")],
        "doc_id long, text string",
    )
    pairs = {(r.doc_new, r.doc_prior) for r in dd.process_batch(b, 0).collect()}
    assert pairs == {(11, 10)}


def test_parse_image_header_all_formats():
    """Byte-exact header parsing for all four stdlib-parsable containers,
    including formats the oracle gate doesn't exercise (BMP, JPEG) and
    garbage/truncated payloads."""
    import struct

    from engine_spark.datapipe.multimodal import parse_image_header

    png = (
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0d" + b"IHDR"
        + struct.pack(">II", 640, 480) + b"\x08\x06\x00\x00\x00"
    )
    assert parse_image_header(png) == ("png", 640, 480)

    gif = b"GIF89a" + struct.pack("<HH", 320, 200)
    assert parse_image_header(gif) == ("gif", 320, 200)

    # offset 14 must carry a real DIB header size (40 = BITMAPINFOHEADER):
    # prose starting 'BM' must not classify as a bitmap
    bmp = (
        b"BM" + b"\x00" * 12 + struct.pack("<I", 40)
        + struct.pack("<ii", 800, -600) + b"\x00" * 4
    )
    assert parse_image_header(bmp) == ("bmp", 800, 600)  # top-down height

    # minimal JPEG: SOI, APP0 (skipped via its length), SOF0, dims 1024x768
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 4) + b"\x00\x00"  # APP0 len 4
        + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", 768, 1024) + b"\x03"
    )
    assert parse_image_header(jpeg) == ("jpeg", 1024, 768)

    assert parse_image_header(b"not an image") == (None, None, None)
    assert parse_image_header(b"") == (None, None, None)
    assert parse_image_header(png[:10]) == (None, None, None)  # truncated


def test_sequence_pack_offsets_and_spans(spark):
    """Concat-and-chunk invariants on a crafted single-shard stream."""
    from engine_spark.datapipe.packing import sequence_pack

    d = spark.createDataFrame(
        [(1, 10), (2, 50), (3, 70), (4, 3), (5, 0)],
        "doc_id long, n_tokens long",
    )
    out = {
        r.doc_id: r
        for r in sequence_pack(d, "n_tokens", seq_len=64, n_shards=1).collect()
    }
    assert 5 not in out  # zero-token docs occupy no stream position
    # stream: doc1 [0,10) doc2 [10,60) doc3 [60,130) doc4 [130,133)
    assert (out[1].seq_first, out[1].seq_last, out[1].begin_off) == (0, 0, 0)
    assert (out[2].seq_first, out[2].seq_last, out[2].begin_off) == (0, 0, 10)
    assert (out[3].seq_first, out[3].seq_last, out[3].begin_off) == (0, 2, 60)
    assert (out[4].seq_first, out[4].seq_last, out[4].begin_off) == (2, 2, 2)


def test_sequence_pack_shards_are_independent_streams(spark):
    """Every shard's token stream starts at offset 0 and is gap-free:
    within a shard, each doc's offset equals the previous doc's end."""
    from engine_spark.datapipe.packing import sequence_pack

    d = spark.range(1, 200).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1).alias("n_tokens")
    )
    rows = sequence_pack(d, "n_tokens", seq_len=16, n_shards=4).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(by_shard) == 4
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.doc_id)
        expect_off = 0
        for r in shard_rows:
            assert r.seq_first * 16 + r.begin_off == expect_off
            assert r.seq_last == (expect_off + r.n_tokens - 1) // 16
            expect_off += r.n_tokens


def test_domain_mix_hits_target_mixture(spark):
    """Kept counts track w_s * T with the binding domain fully consumed."""
    from engine_spark.datapipe.packing import domain_mix_sample

    rows = [(i, f"src{i % 4}") for i in range(4000)]  # 1000 docs per domain
    d = spark.createDataFrame(rows, "doc_id long, source string")
    weights = {"src0": 0.6, "src1": 0.2, "src2": 0.2}  # src3 dropped
    out = domain_mix_sample(d, weights).groupBy("source").count()
    got = {r.source: r["count"] for r in out.collect()}
    assert "src3" not in got
    # T = min(1000/0.6, 1000/0.2) = 1666.6; targets: 1000, 333, 333.
    # Hash sampling is rate-based: allow +-15% per domain.
    assert got["src0"] == 1000  # binding domain: rate 1.0, exact
    for s in ("src1", "src2"):
        assert 283 <= got[s] <= 383
    # deterministic: a second draw selects the identical rows
    a = {r.doc_id for r in domain_mix_sample(d, weights).select("doc_id").collect()}
    b = {r.doc_id for r in domain_mix_sample(d, weights).select("doc_id").collect()}
    assert a == b


def test_substring_run_pairs_detects_verbatim_quote(spark):
    """A 12-token verbatim quote inside otherwise-different docs is found
    with the exact span length; unrelated docs produce no pair."""
    from engine_spark.datapipe.spans import substring_run_pairs

    quote = "the quick brown fox jumps over the lazy dog near the river"  # 12 toks
    d = spark.createDataFrame(
        [
            (1, "intro words here " + quote + " and a unique tail one"),
            (2, "other opening text " + quote + " closing remarks two"),
            (3, "entirely disjoint vocabulary in this third document"),
        ],
        "doc_id long, text string",
    )
    out = substring_run_pairs(d, k=3, df_cap=64, min_span=10).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.doc_a, r.doc_b) == (1, 2)
    assert r.max_span == 12


def test_substring_run_two_separate_runs_not_merged(spark):
    """Two shared runs separated by divergent text stay separate islands:
    max_span is the longer one, n_runs counts both."""
    from engine_spark.datapipe.spans import substring_run_pairs

    a = "alpha beta gamma delta epsilon X1 X2 zeta eta theta iota kappa"
    b = "alpha beta gamma delta epsilon Y1 Y2 zeta eta theta iota kappa"
    d = spark.createDataFrame([(1, a), (2, b)], "doc_id long, text string")
    out = substring_run_pairs(d, k=2, df_cap=64, min_span=3).collect()
    assert len(out) == 1
    assert out[0].max_span == 5
    assert out[0].n_runs == 2


def test_semdedup_pairs_are_cluster_scoped(spark):
    """semdedup rows only pair vectors in the SAME fine cluster, and every
    reported pair clears the threshold; neardup and semdedup modes coexist."""
    from engine_spark.catalog import Catalog
    from engine_spark.datapipe.queries import (
        IVF_CENTS, LSH_PROJ_DIM, PLANES, SEM_T, SP, _ivf_cell, _vecd,
        q_dedup_embedding_cosine,
    )

    sf = "/root/testdata/sf0.001"
    out = q_dedup_embedding_cosine(spark, sf)
    sem = out.filter("mode = 'semdedup'").collect()
    assert len(sem) > 0
    assert all(r.cos_sim >= SEM_T for r in sem)

    emb = Catalog(spark, sf)["embeddings"]
    cl = {
        r.vec_id: (r.cell, r.b0)
        for r in emb.select(
            "vec_id",
            F.expr(_ivf_cell(SP, _vecd(SP), IVF_CENTS)).alias("cell"),
            F.expr(
                FR.hyperplane_bits(SP, _vecd(SP), PLANES[0], LSH_PROJ_DIM)
            ).alias("b0"),
        ).collect()
    }
    assert all(cl[r.vec_a] == cl[r.vec_b] for r in sem)


def test_parse_image_header_jpeg_fill_bytes_and_null_payload(spark):
    """ITU T.81 B.1.1.2 permits 0xFF fill bytes before any marker — the
    parser must skip them, not misread a segment length; and a NULL payload
    row must yield (None, None, None) instead of killing the task."""
    import struct

    from engine_spark.datapipe.multimodal import (
        decode_image_headers, parse_image_header,
    )

    jpeg_fill = (
        b"\xff\xd8"
        + b"\xff\xff\xff"  # fill bytes before SOF0
        + b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", 480, 640) + b"\x03"
    )
    assert parse_image_header(jpeg_fill) == ("jpeg", 640, 480)

    d = spark.createDataFrame(
        [(1, bytearray(jpeg_fill)), (2, None)], "doc_id long, payload binary"
    )
    got = {r.doc_id: (r.format, r.width, r.height)
           for r in decode_image_headers(d).collect()}
    assert got[1] == ("jpeg", 640, 480)
    assert got[2] == (None, None, None)


def test_chunk_documents_coverage_and_overlap(spark):
    """Every token is covered, starts advance by exactly the stride, the
    last chunk is clipped, and a short doc yields one chunk."""
    from engine_spark.datapipe.packing import chunk_documents

    long_text = " ".join(f"w{i}" for i in range(80))  # 80 tokens
    d = spark.createDataFrame(
        [(1, long_text), (2, "just five little tokens here"), (3, "   ")],
        "doc_id long, text string",
    )
    rows_ = chunk_documents(d, w=32, stride=24).collect()
    by_doc: dict[int, list] = {}
    for r in rows_:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 3 not in by_doc  # empty doc: no chunks
    one = sorted(by_doc[1], key=lambda r: r.chunk_idx)
    # 80 tokens, w=32, stride=24 -> ceil(48/24)+1 = 3 chunks
    assert [(r.tok_start, r.tok_end) for r in one] == [(1, 32), (25, 56), (49, 80)]
    assert {r.chunk_tokens for r in one} == {32}
    covered = set()
    for r in one:
        covered.update(range(r.tok_start, r.tok_end + 1))
    assert covered == set(range(1, 81))
    short = by_doc[2]
    assert len(short) == 1
    assert (short[0].tok_start, short[0].tok_end, short[0].chunk_tokens) == (1, 5, 5)
    # distinct content -> distinct hashes; overlap regions shared
    assert len({r.chunk_hash for r in one}) == 3


def test_substring_runs_match_bruteforce_property(spark):
    """Property: on random small corpora, substring_run_pairs (inverted
    index + gaps-and-islands) equals a brute-force longest-shared-run scan
    computed in plain Python."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from engine_spark.datapipe.spans import substring_run_pairs

    K, MIN_SPAN = 2, 3
    vocab = ["a", "b", "c", "d"]
    corpus_strategy = st.lists(
        st.lists(st.sampled_from(vocab), min_size=1, max_size=12),
        min_size=2,
        max_size=4,
    )

    def brute_max_run(ta: list[str], tb: list[str]) -> int:
        best = 0
        for i in range(len(ta)):
            for j in range(len(tb)):
                L = 0
                while i + L < len(ta) and j + L < len(tb) and ta[i + L] == tb[j + L]:
                    L += 1
                best = max(best, L)
        return best

    @given(corpus=corpus_strategy)
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def prop(corpus):
        d = spark.createDataFrame(
            [(i, " ".join(toks)) for i, toks in enumerate(corpus)],
            "doc_id long, text string",
        )
        got = {
            (r.doc_a, r.doc_b): r.max_span
            for r in substring_run_pairs(
                d, k=K, df_cap=10_000, min_span=MIN_SPAN
            ).collect()
        }
        want = {}
        for i in range(len(corpus)):
            for j in range(i + 1, len(corpus)):
                span = brute_max_run(corpus[i], corpus[j])
                if span >= MIN_SPAN:
                    want[(i, j)] = span
        assert got == want

    prop()


def test_surprisal_ranks_rare_tokens_above_boilerplate(spark):
    """Mean unigram surprisal must score a rare-token doc above a doc made
    of corpus-dominant tokens, and repeated runs must agree exactly
    (decimal-summed rounded surprisals are partitioning-independent)."""
    from engine_spark.datapipe.queries import surprisal_scores

    d = spark.createDataFrame(
        [(1, "the the the the the the the the"),
         (2, "the the the the the the the zyzzyva")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.mean_surprisal for r in surprisal_scores(d).collect()}
    assert got[2] > got[1] > 0  # the rare token raises mean surprisal

    # exact repeatability across runs (and across repartitionings)
    a = {r.doc_id: r.mean_surprisal
         for r in surprisal_scores(d.repartition(7)).collect()}
    assert a == got


def test_sequence_pack_stream_matches_batch(spark):
    """Incremental packing across micro-batches equals the batch prefix sum
    when arrival respects doc_id order — per-shard offsets must CONTINUE
    across batches, not restart."""
    from engine_spark.datapipe.packing import sequence_pack, sequence_pack_stream
    from engine_spark.streaming.harness import StreamRunner

    docs = [
        {"doc_id": i, "n_tokens": (i % 7) + 1, "text": f"body{i}"}
        for i in range(1, 41)
    ]
    batch_df = spark.createDataFrame(
        [(d["doc_id"], d["n_tokens"], d["text"]) for d in docs],
        "doc_id long, n_tokens long, text string",
    )
    want = {
        r.doc_id: (r.shard, r.begin_off, r.seq_first, r.seq_last, r.text)
        for r in sequence_pack(batch_df, "n_tokens", seq_len=16, n_shards=4).collect()
    }

    r = StreamRunner(spark, "doc_id long, n_tokens long, text string")
    r.send(docs[:15])
    r.send(docs[15:30])
    r.send(docs[30:])
    r.run(
        lambda sdf: sequence_pack_stream(
            sdf, "n_tokens", seq_len=16, n_shards=4
        )
    )
    got = {
        m["doc_id"]: (m["shard"], m["begin_off"], m["seq_first"], m["seq_last"],
                      m["text"])  # payload columns carry through
        for m in r.shutdown()
    }
    assert got == want


def test_pq_codes_deterministic_and_recon_close(spark):
    """PQ codes are stable 1..K ints; the reconstructed vector is closer to
    its own source than to a different random vector (sanity of the
    codebook assignment), and ADC top-1 of a vector's own duplicate is the
    duplicate itself."""
    from engine_spark.datapipe.pq import (
        CODEBOOKS, PQ_K, PQ_M, l2sq_chain, pq_code, pq_recon,
    )
    from engine_spark.datapipe.fragments import Dialect

    d = Dialect("spark")
    vecs = spark.createDataFrame(
        [(i, [((i * 37 + j * 11) % 200) / 100.0 - 1.0 for j in range(64)])
         for i in range(20)],
        "vec_id long, vd array<double>",
    )
    coded = vecs.select(
        "vec_id", "vd",
        *[F.expr(pq_code(d, "vd", m)).alias(f"c{m}") for m in range(PQ_M)],
    )
    rows_ = coded.collect()
    for r in rows_:
        for m in range(PQ_M):
            assert 1 <= r[f"c{m}"] <= PQ_K
    # determinism across recompute
    again = {r.vec_id: tuple(r[f"c{m}"] for m in range(PQ_M))
             for r in coded.collect()}
    first = {r.vec_id: tuple(r[f"c{m}"] for m in range(PQ_M)) for r in rows_}
    assert again == first

    recon = coded.withColumn(
        "rv", F.expr(pq_recon(d, [f"c{m}" for m in range(PQ_M)]))
    ).withColumn(
        "d_own", F.expr(l2sq_chain(d, "rv", "vd"))
    )
    got = recon.select("vec_id", "d_own", "rv", "vd").collect()
    assert all(len(r.rv) == 64 for r in got)
    # reconstruction is lossy (codebooks here are seeded, not trained), but
    # on AVERAGE the selected codewords must beat the zero vector — i.e.
    # the argmin assignment carries signal
    mean_own = sum(r.d_own for r in got) / len(got)
    mean_zero = sum(sum(x * x for x in r.vd) for r in got) / len(got)
    assert mean_own < mean_zero


def test_sequence_pack_stream_state_survives_restart(spark):
    """Per-shard cumulative offsets must come back from the checkpoint: a
    restarted query continues each shard's token stream where the previous
    run stopped, never restarting offsets at zero."""
    from engine_spark.datapipe.packing import sequence_pack, sequence_pack_stream
    from engine_spark.streaming.harness import StreamRunner

    docs = [{"doc_id": i, "n_tokens": 10} for i in range(1, 9)]
    batch_df = spark.createDataFrame(
        [(d["doc_id"], d["n_tokens"]) for d in docs], "doc_id long, n_tokens long"
    )
    want = {
        r.doc_id: (r.begin_off, r.seq_first, r.seq_last)
        for r in sequence_pack(batch_df, "n_tokens", seq_len=16, n_shards=1).collect()
    }

    r = StreamRunner(spark, "doc_id long, n_tokens long")

    def build(sdf):
        return sequence_pack_stream(sdf, "n_tokens", seq_len=16, n_shards=1)

    r.send(docs[:4])
    r.run(build)      # query #1 packs docs 1-4, checkpoints cum=40
    r.send(docs[4:])
    r.run(build)      # query #2 restores cum=40 and continues
    got = {
        m["doc_id"]: (m["begin_off"], m["seq_first"], m["seq_last"])
        for m in r.shutdown()
    }
    assert got == want


def test_chunking_invariants_property(spark):
    """Property over random corpora and (w, stride) configs: every token is
    covered, chunk starts advance by exactly the stride, only the last
    chunk may be short, and the chunk count matches the closed form."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from engine_spark.datapipe.packing import chunk_documents

    @given(
        lens=st.lists(st.integers(min_value=0, max_value=90), min_size=1, max_size=6),
        w=st.integers(min_value=2, max_value=40),
        stride_frac=st.floats(min_value=0.3, max_value=1.0),
    )
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def prop(lens, w, stride_frac):
        stride = max(1, int(w * stride_frac))
        d = spark.createDataFrame(
            [(i, " ".join(f"t{i}x{j}" for j in range(n))) for i, n in enumerate(lens)],
            "doc_id long, text string",
        )
        rows_ = chunk_documents(d, w=w, stride=stride).collect()
        by_doc: dict[int, list] = {}
        for r in rows_:
            by_doc.setdefault(r.doc_id, []).append(r)
        for i, n in enumerate(lens):
            if n == 0:
                assert i not in by_doc
                continue
            ch = sorted(by_doc[i], key=lambda r: r.chunk_idx)
            expect = 1 if n <= w else -(-(n - w) // stride) + 1
            assert len(ch) == expect
            assert [r.chunk_idx for r in ch] == list(range(expect))
            covered = set()
            for j, r in enumerate(ch):
                assert r.tok_start == j * stride + 1
                assert r.tok_end == min(j * stride + w, n)
                assert 1 <= r.chunk_tokens <= w
                covered.update(range(r.tok_start, r.tok_end + 1))
            assert covered == set(range(1, n + 1))

    prop()


def test_resize_and_frame_sample_plumbing(spark):
    """The resize and frame-sample mapInPandas plumbing is real (schema,
    batch shape, null-safety); undecodable payloads degrade honestly
    (passthrough + NULL scales); a recognized still image is one frame
    spanning the whole payload; unrecognized payloads get NULL frame
    fields — no fabricated counts anywhere."""
    import struct

    from engine_spark.datapipe.multimodal import frame_sample, resize_image

    png = (
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0d" + b"IHDR"
        + struct.pack(">II", 640, 480) + b"\x08\x06\x00\x00\x00" + b"x" * 300
    )
    d = spark.createDataFrame(
        [(1, bytearray(png)), (2, bytearray(b"not an image" * 40)), (3, None)],
        "doc_id long, payload binary",
    )

    rz = {r.doc_id: r for r in resize_image(d, 320, 240).collect()}
    assert (rz[1].width, rz[1].height) == (320, 240)
    assert rz[1].scale_x == 0.5 and rz[1].scale_y == 0.5  # real header dims
    # corrupt body: exact header scales, payload passes through untouched
    assert bytes(rz[1].payload) == png
    # unrecognized container: honest NULL scales + passthrough; null-safe
    assert rz[2].scale_x is None and bytes(rz[2].payload) == b"not an image" * 40
    assert rz[3].width == 320 and rz[3].scale_x is None

    fs = frame_sample(d, every_k=2).collect()
    by_doc: dict[int, list] = {}
    for r in fs:
        by_doc.setdefault(r.doc_id, []).append(r)
    # recognized still image (PNG): ONE real frame = the whole payload
    f1 = by_doc[1]
    assert len(f1) == 1
    assert (f1[0].frame_idx, f1[0].n_frames) == (0, 1)
    assert (f1[0].byte_start, f1[0].byte_end) == (0, len(png))
    # unrecognized container / NULL payload: one honest NULL row each —
    # the doc stays visible, nothing is fabricated
    for did in (2, 3):
        assert len(by_doc[did]) == 1
        r = by_doc[did][0]
        assert r.frame_idx is None and r.n_frames is None
        assert r.byte_start is None and r.byte_end is None


def test_keywords_rank_distinctive_terms(spark):
    """tf-idf (via the registered gate's kernel) must rank a document's
    distinctive term above corpus-wide terms, with deterministic token
    tie-break."""
    from engine_spark.datapipe.queries import keyword_scores

    d = spark.createDataFrame(
        [
            (1, "common common common zebra zebra quark"),
            (2, "common common plume plume plume"),
            (3, "common words only appear here"),
        ],
        "doc_id long, text string",
    )
    out = keyword_scores(d).collect()
    top = {r.doc_id: r.token for r in out if r.rnk == 1}
    assert top[1] == "zebra"   # 2 x ln(3) beats 3 x ln(1)=0 for 'common'
    assert top[2] == "plume"
    assert top[3] != "common"  # df=3 -> idf 0: common can never rank first
    assert all(r.rnk <= 3 for r in out)


def test_domain_mix_absent_target_domain_raises(spark):
    """A domain in `weights` with zero corpus rows makes the target mixture
    unsatisfiable — must raise, not silently emit 100% of the others."""
    import pytest as _pytest

    from engine_spark.datapipe.packing import domain_mix_sample

    d = spark.createDataFrame(
        [(i, "web") for i in range(100)], "doc_id long, source string"
    )
    with _pytest.raises(ValueError, match="absent from corpus"):
        domain_mix_sample(d, {"web": 0.5, "books": 0.5}).count()


def test_signature_table_parquet_matches_cache(spark, tmp_path):
    """The persisted (parquet) signature table — the 100 TB materialization
    path — must yield the identical verified pair set as the cache path."""
    from engine_spark.datapipe.queries import (
        minhash_lsh_pairs,
        shingles_of,
        signature_table,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    s = shingles_of(docs, materialize=False)
    via_cache = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(signature_table(s, storage="cache")).collect()
    }
    path = str(tmp_path / "sig")
    sig_pq = signature_table(s, storage="parquet", path=path)
    via_parquet = {
        (r.doc_a, r.doc_b) for r in minhash_lsh_pairs(sig_pq).collect()
    }
    assert via_parquet == via_cache and len(via_cache) > 0
    # idempotent: a second call reuses the committed table (no rewrite)
    import os

    mt = os.path.getmtime(os.path.join(path, "_SUCCESS"))
    signature_table(s, storage="parquet", path=path).count()
    assert os.path.getmtime(os.path.join(path, "_SUCCESS")) == mt


def test_bpe_train_learns_expected_merges(spark):
    """Merge learning on a corpus with a known frequency structure: the
    classic {low, lower, lowest, newest, widest} set. The most frequent
    pairs merge first and build up 'low' / 'est</w>' subwords — the
    textbook BPE behavior (Sennrich et al. 2016 fig. 1)."""
    rows = (
        [("low " * 5).strip()] * 1
        + ["lower lower"]
        + ["newest widest newest"] * 2
    )
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )
    from engine_spark.datapipe.bpe import bpe_train, bpe_tokenize

    merges = bpe_train(df, num_merges=10)
    assert len(merges) >= 5
    joined = {a + b for a, b in merges}
    # 'est' (from newest/widest) and 'low' (from the low-family) must both
    # form as subwords — the exact merge path depends on tie-breaks
    assert any("est" in j for j in joined), merges
    assert any(j.startswith("low") for j in joined), merges

    # apply: tokens per doc reconstruct the pre-tokenized words exactly
    out = bpe_tokenize(df, merges, keep_tokens=True).collect()
    for r in out:
        rebuilt = "".join(r.tokens).replace("</w>", " ").strip()
        assert rebuilt == rows[r.doc_id].lower().replace("  ", " ")
        assert r.n_tokens == len(r.tokens)


def test_bpe_word_frequencies_regex_matches_python(spark):
    """The JVM-side pre-tokenizer (regexp_extract_all in the word-count
    scan) and the Python `re` used at tokenize time must agree — trained
    merges would otherwise never fire. Exercises the \\s class that a SQL
    string literal would have silently corrupted."""
    import re as _re

    from engine_spark.datapipe.bpe import PRETOKEN_RE, word_frequencies

    texts = [
        "Hello, world!  it's 42 degrees...",
        "tabs\tand\nnewlines s s s",  # literal 's' words catch \s corruption
        "a-b_c 3.14 xx--yy",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r["word"], r["n"])
        for r in word_frequencies(df, max_words=1000).collect()
    }
    from collections import Counter

    exp = Counter(w for t in texts for w in _re.findall(PRETOKEN_RE, t))
    assert got == set(exp.items())


def test_png_exotic_profiles_decode():
    """Hand-built PNGs exercise the profiles beyond the encoder's 8-bit
    output: 16-bit gray/RGB (high-byte scaling; Sub filter at bpp=6),
    1-bit gray, 4-bit palette (MSB-first unpacking), and Adam7 interlace
    with both even and odd dimensions."""
    import struct
    import zlib

    import numpy as np

    from engine_spark.datapipe.multimodal import _ADAM7, _PNG_SIG, decode_png

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    def png(w, h, depth, ctype, interlace, raw, plte=None):
        ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
        out = _PNG_SIG + chunk(b"IHDR", ihdr)
        if plte is not None:
            out += chunk(b"PLTE", plte)
        return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")

    # 16-bit gray: high byte survives the 8-bit scaling
    vals = np.array([[1000, 30000, 65535], [0, 257 * 77, 514]], np.uint16)
    raw = b"".join(b"\x00" + vals[y].astype(">u2").tobytes() for y in range(2))
    d = decode_png(png(3, 2, 16, 0, 0, raw))
    assert d.shape == (2, 3, 1) and (d[:, :, 0] == (vals >> 8)).all()

    # 16-bit RGB, Sub-filtered rows (filter distance = 6 bytes)
    rgb = (np.arange(2 * 3 * 3).reshape(2, 3, 3) * 300).astype(np.uint16)
    rows = []
    for y in range(2):
        lb, bpp = bytearray(rgb[y].astype(">u2").tobytes()), 6
        filt = bytearray(
            (lb[i] - (lb[i - bpp] if i >= bpp else 0)) & 0xFF
            for i in range(len(lb))
        )
        rows.append(b"\x01" + bytes(filt))
    d = decode_png(png(3, 2, 16, 2, 0, b"".join(rows)))
    assert d.shape == (2, 3, 3) and (d == (rgb >> 8).astype(np.uint8)).all()

    # 1-bit gray with row padding (10 px → 2 bytes/row)
    bits = np.array(
        [[1, 0, 1, 1, 0, 0, 1, 0, 1, 1], [0] * 10, [1] * 10], np.uint8
    )
    raw = b"".join(
        b"\x00" + np.packbits(bits[y]).tobytes() for y in range(3)
    )
    d = decode_png(png(10, 3, 1, 0, 0, raw))
    assert d.shape == (3, 10, 1) and (d[:, :, 0] == bits * 255).all()

    # 4-bit palette, nibbles MSB-first
    plte = bytes(
        [10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120] + [0] * 36
    )
    idx = np.array([[0, 1, 2, 3, 1], [3, 3, 0, 2, 1]], np.uint8)
    raw = b""
    for y in range(2):
        nib = bytearray()
        for i in range(0, 5, 2):
            nib.append(
                (idx[y][i] << 4) | (idx[y][i + 1] if i + 1 < 5 else 0)
            )
        raw += b"\x00" + bytes(nib)
    d = decode_png(png(5, 2, 4, 3, 0, raw, plte=plte))
    pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
    assert d.shape == (2, 5, 3) and (d == pal[idx]).all()

    # Adam7: even (8x8 gray) and odd (5x3 RGB) dimensions
    for img in (
        ((np.arange(64).reshape(8, 8) * 3) % 256).astype(np.uint8)[:, :, None],
        ((np.arange(45).reshape(3, 5, 3) * 7) % 256).astype(np.uint8),
    ):
        hh, ww, nch = img.shape
        raw = b""
        for x0, y0, xs, ys in _ADAM7:
            sub = img[y0::ys, x0::xs]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            for y in range(sub.shape[0]):
                raw += b"\x00" + np.ascontiguousarray(sub[y]).tobytes()
        ctype = 0 if nch == 1 else 2
        d = decode_png(png(ww, hh, 8, ctype, 1, raw))
        assert d.shape == img.shape and (d == img).all(), (hh, ww)


def test_bmp_codec_roundtrip_and_variants():
    """decode(encode(a)) == a for 24-bit BI_RGB; hand-built 8-bit paletted
    top-down and 32-bit BGRA files decode correctly too."""
    import struct

    import numpy as np

    from engine_spark.datapipe.multimodal import decode_bmp, encode_bmp

    rng = np.random.RandomState(3)
    for shape in [(7, 5, 3), (13, 17, 3), (1, 1, 3), (4, 6)]:
        a = rng.randint(0, 256, size=shape).astype(np.uint8)
        got = decode_bmp(encode_bmp(a))
        ref = a if a.ndim == 3 else a[:, :, None].repeat(3, axis=2)
        assert got.shape == ref.shape and (got == ref).all(), shape
    # 8-bit paletted, negative height = top-down row order
    pal = bytes(v for i in range(4) for v in (i * 10 + 2, i * 10 + 1, i * 10, 0))
    px = bytes([0, 1, 2, 0] + [3, 2, 1, 0])  # 3px rows padded to 4
    dib = struct.pack("<IiiHHIIiiII", 40, 3, -2, 1, 8, 0, len(px), 0, 0, 4, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 70 + len(px), 0, 0, 70)
    got = decode_bmp(hdr + dib + pal + px)
    assert tuple(got[0, 0]) == (0, 1, 2) and tuple(got[1, 0]) == (30, 31, 32)
    # 32bpp BGRA keeps alpha
    a = np.arange(4 * 2 * 4, dtype=np.uint8).reshape(2, 4, 4)
    rows = a[::-1][:, :, [2, 1, 0, 3]].reshape(2, 16).tobytes()
    dib = struct.pack("<IiiHHIIiiII", 40, 4, 2, 1, 32, 0, len(rows), 0, 0, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(rows), 0, 0, 54)
    got = decode_bmp(hdr + dib + rows)
    assert got.shape == (2, 4, 4) and (got == a).all()
    # RLE compression is honestly rejected, not mis-decoded
    dib_rle = struct.pack("<IiiHHIIiiII", 40, 4, 2, 1, 8, 1, 8, 0, 0, 0, 0)
    try:
        decode_bmp(hdr[:14] + dib_rle + b"\x00" * 60)
        raise AssertionError("RLE BMP should raise")
    except ValueError:
        pass


def test_png_adaptive_filter_and_gif_real_lzw():
    """encode_png(filter_type='adaptive') picks per-row filters by the
    libpng MSAD heuristic (round-trips exactly, beats filter-0 size on
    gradients, mixes row types); encode_gif's real LZW compressor
    round-trips through width growth, table reset (>4096 entries) and
    long-run (KwKwK) streams, compressing repetitive images for real."""
    import struct
    import zlib

    import numpy as np

    from engine_spark.datapipe.multimodal import (
        decode_gif,
        decode_png,
        encode_gif,
        encode_png,
    )

    rng = np.random.RandomState(9)
    h, w = 64, 64
    grad = (
        ((np.arange(h)[:, None] + np.arange(w)[None, :]) * 2 % 256)[:, :, None]
        .repeat(3, 2)
        .astype(np.uint8)
    )
    noisy = (grad + rng.randint(0, 12, (h, w, 3))).astype(np.uint8)
    for img in (grad, noisy, rng.randint(0, 256, (17, 23, 4)).astype(np.uint8)):
        b = encode_png(img, filter_type="adaptive")
        assert (decode_png(b) == img).all()
    assert len(encode_png(grad, "adaptive")) < len(encode_png(grad, 0)) // 3
    # the noisy gradient must actually mix row filter types
    raw = encode_png(noisy, filter_type="adaptive")
    pos, idat = 8, []
    while pos + 8 <= len(raw):
        (ln,) = struct.unpack(">I", raw[pos : pos + 4])
        if raw[pos + 4 : pos + 8] == b"IDAT":
            idat.append(raw[pos + 8 : pos + 8 + ln])
        pos += 12 + ln
    dec = zlib.decompress(b"".join(idat))
    fts = {dec[i * (w * 3 + 1)] for i in range(h)}
    assert len(fts) >= 2, fts

    # GIF real LZW
    rep = np.tile(np.arange(4, dtype=np.uint8), (50, 25))
    pal4 = rng.randint(0, 256, (4, 3)).astype(np.uint8)
    g = encode_gif(rep, pal4)
    assert (decode_gif(g) == pal4[rep]).all()
    assert len(g) < rep.size // 10  # genuinely compresses
    # width growth to 12 bits + table reset path
    noise = rng.randint(0, 256, (120, 120)).astype(np.uint8)
    pal256 = rng.randint(0, 256, (256, 3)).astype(np.uint8)
    assert (decode_gif(encode_gif(noise, pal256)) == pal256[noise]).all()
    # long single-symbol runs (KwKwK case on decode)
    solid = np.zeros((40, 40), np.uint8)
    pal1 = np.array([[9, 8, 7]], np.uint8)
    assert (decode_gif(encode_gif(solid, pal1)) == pal1[solid]).all()


def test_gif_codec_roundtrip_palettes_and_lzw():
    """encode_gif emits a genuinely valid variable-width LZW stream the
    decoder reads back exactly, across palette sizes that exercise code
    widths 3..9 bits and the periodic clear-code path."""
    import numpy as np

    from engine_spark.datapipe.multimodal import decode_gif, encode_gif

    rng = np.random.RandomState(5)
    for n_pal, shape in [(2, (3, 3)), (4, (5, 9)), (16, (11, 7)), (256, (23, 31))]:
        pal = rng.randint(0, 256, size=(n_pal, 3)).astype(np.uint8)
        idx = rng.randint(0, n_pal, size=shape).astype(np.uint8)
        got = decode_gif(encode_gif(idx, pal))
        assert got.shape == (*shape, 3)
        assert (got == pal[idx]).all(), (n_pal, shape)
    # truncated stream raises a DECODE_ERRORS member (upstream degrade)
    from engine_spark.datapipe.multimodal import DECODE_ERRORS

    g = encode_gif(np.zeros((6, 6), np.uint8), np.array([[1, 2, 3]], np.uint8))
    try:
        decode_gif(g[: len(g) // 2])
        raise AssertionError("truncated GIF should raise")
    except DECODE_ERRORS:
        pass


def test_jpeg_codec_roundtrip_exact_and_lossy():
    """Baseline JPEG codec (datapipe.jpeg): solid colors round-trip
    BIT-EXACTLY at quality=100 (a constant block is DC-only, which q=1
    quantization preserves); gradients round-trip within JPEG-typical
    tolerance at q=90 for 4:4:4 and 4:2:0; grayscale works; progressive
    streams and garbage are rejected with ValueError."""
    import numpy as np

    from engine_spark.datapipe.jpeg import decode_jpeg, encode_jpeg

    for v in ((0, 0, 0), (77, 200, 13), (255, 255, 255), (128, 50, 220)):
        a = np.empty((16, 24, 3), np.uint8)
        a[:, :] = v
        for sub in (False, True):
            d = decode_jpeg(encode_jpeg(a, quality=100, subsample=sub))
            assert d.shape == a.shape and (d == a).all(), (v, sub)

    g = ((np.arange(40)[:, None] + np.arange(56)[None, :]) * 3 % 256).astype(
        np.uint8
    )
    img = np.stack([g, g[::-1], (g * 2) % 256], axis=2).astype(np.uint8)
    for sub, tol in ((False, 6), (True, 10)):
        d = decode_jpeg(encode_jpeg(img, quality=90, subsample=sub))
        err = np.abs(d.astype(int) - img.astype(int)).mean()
        assert d.shape == img.shape and err < tol, (sub, err)

    gray = (np.arange(32)[:, None] * 8 % 256 * np.ones((1, 40))).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(gray, quality=95))
    assert d.shape == (32, 40, 1)
    assert np.abs(d[:, :, 0].astype(int) - gray.astype(int)).mean() < 4

    # non-multiple-of-8 dims exercise the edge-replicate padding
    rng = np.random.RandomState(1)
    odd = rng.randint(0, 256, size=(13, 19, 3)).astype(np.uint8)
    d = decode_jpeg(encode_jpeg(odd, quality=100))
    assert d.shape == (13, 19, 3)

    # progressive (SOF2) honestly rejected, not mis-decoded
    b = bytearray(encode_jpeg(odd))
    i = b.find(b"\xff\xc0")
    b[i + 1] = 0xC2
    try:
        decode_jpeg(bytes(b))
        raise AssertionError("progressive JPEG should raise")
    except ValueError:
        pass
    for bad in (b"", b"\xff\xd8\xff\xd9", b"\x89PNG"):
        try:
            decode_jpeg(bad)
            raise AssertionError("garbage should raise")
        except ValueError:
            pass


def test_jpeg_progressive_decodes_identical_to_baseline():
    """Progressive (SOF2) and baseline encodings serialize the SAME
    quantized coefficients, so their decodes must be bit-identical —
    across 4:4:4, 4:2:0, grayscale, odd dims, and a sparse image that
    forces cross-block EOB runs and ZRL-in-refinement paths."""
    import numpy as np

    from engine_spark.datapipe.jpeg import decode_jpeg, encode_jpeg

    g = ((np.arange(40)[:, None] + np.arange(56)[None, :]) * 3 % 256).astype(
        np.uint8
    )
    img = np.stack([g, g[::-1], (g * 2) % 256], axis=2).astype(np.uint8)
    for q, sub in [(100, False), (90, False), (90, True), (50, False)]:
        base = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
        prog = decode_jpeg(
            encode_jpeg(img, quality=q, subsample=sub, progressive=True)
        )
        assert (base == prog).all(), (q, sub)

    gray = (np.arange(32)[:, None] * 8 % 256 * np.ones((1, 40))).astype(np.uint8)
    assert (
        decode_jpeg(encode_jpeg(gray, quality=95))
        == decode_jpeg(encode_jpeg(gray, quality=95, progressive=True))
    ).all()

    odd = np.random.RandomState(3).randint(0, 256, size=(13, 19, 3)).astype(
        np.uint8
    )
    assert (
        decode_jpeg(encode_jpeg(odd, quality=80))
        == decode_jpeg(encode_jpeg(odd, quality=80, progressive=True))
    ).all()

    # mostly-flat corpus shape: long runs of empty blocks (EOB runs > 1)
    # plus one pure highest-frequency block (62-position zero-history run
    # → ZRL chains in both first and refinement AC passes)
    rng = np.random.RandomState(0)
    flat = np.full((64, 160, 3), 100, np.uint8)
    flat[16:24, 128:136] = rng.randint(0, 256, (8, 8, 3))
    xs = np.arange(8)
    basis = np.cos((2 * xs + 1) * 7 * np.pi / 16)
    hf = (128 + 60 * np.outer(basis, basis)).clip(0, 255).astype(np.uint8)
    flat[40:48, 16:24] = hf[:, :, None]
    for q in (95, 70):
        assert (
            decode_jpeg(encode_jpeg(flat, quality=q))
            == decode_jpeg(encode_jpeg(flat, quality=q, progressive=True))
        ).all(), q


def test_jpeg_restart_intervals_all_profiles():
    """DRI + RSTn resync markers (what real camera/web encoders emit):
    restarted streams must decode identically to unrestarted ones across
    baseline/progressive x 4:4:4/4:2:0 — exercises predictor resets,
    EOB-run flushes at restart boundaries, and the unstuffer's restart
    offset bookkeeping in every scan type."""
    import numpy as np

    from engine_spark.datapipe.jpeg import decode_jpeg, encode_jpeg

    g = ((np.arange(40)[:, None] + np.arange(56)[None, :]) * 3 % 256).astype(
        np.uint8
    )
    img = np.stack([g, g[::-1], (g * 2) % 256], axis=2).astype(np.uint8)
    for prog in (False, True):
        for sub in (False, True):
            ref = decode_jpeg(
                encode_jpeg(img, quality=90, subsample=sub, progressive=prog)
            )
            for ri in (1, 3):
                got = decode_jpeg(
                    encode_jpeg(
                        img, quality=90, subsample=sub, progressive=prog,
                        restart_interval=ri,
                    )
                )
                assert (ref == got).all(), (prog, sub, ri)


def test_jpeg_forked_segment_decode_bit_identical():
    """workers>1 entropy-decodes restart segments on a forked pool;
    T.81 makes segments bit-independent, so the result must be
    BIT-IDENTICAL to the sequential path — including a tail segment
    shorter than the restart interval, and regardless of worker count
    exceeding the segment count."""
    import numpy as np

    from engine_spark.datapipe.jpeg import decode_jpeg, encode_jpeg

    g = ((np.arange(48)[:, None] * 5 + np.arange(64)[None, :]) % 256).astype(
        np.uint8
    )
    img = np.stack([g, (g * 3) % 256, g[::-1]], axis=2).astype(np.uint8)
    for prog in (False, True):
        for sub, ri in ((False, 3), (True, 2), (False, 7)):
            b = encode_jpeg(
                img, quality=85, subsample=sub, progressive=prog,
                restart_interval=ri,
            )
            seq = decode_jpeg(b)
            for wk in (2, 64):
                assert np.array_equal(
                    seq, decode_jpeg(b, workers=wk)
                ), (prog, sub, ri, wk)
    # no restart markers -> one segment: parallel request degrades to
    # the sequential path, same bytes out
    b0 = encode_jpeg(img, quality=85)
    assert np.array_equal(decode_jpeg(b0), decode_jpeg(b0, workers=8))


def test_decode_image_jpeg_real_pixels(spark):
    """decode_image now reports REAL pixel fields for baseline JPEG."""
    import numpy as np

    from engine_spark.datapipe.jpeg import encode_jpeg
    from engine_spark.datapipe.multimodal import decode_image

    a = np.empty((6, 9, 3), np.uint8)
    a[:, :] = (10, 200, 30)
    d = spark.createDataFrame(
        [(1, bytearray(encode_jpeg(a, quality=100)))],
        "doc_id long, payload binary",
    )
    row = decode_image(d).collect()[0]
    assert (row.format, row.width, row.height, row.channels) == ("jpeg", 9, 6, 3)
    assert row.pix_sum == 240 * 6 * 9


def test_mp4_demux_roundtrip_and_frame_sample(spark):
    """encode_mp4 → parse_mp4 recovers exact per-frame byte ranges through
    the stts/stsz/stsc/stco tables (two samples per chunk, so the chunk-run
    expansion is exercised); frame_sample emits those REAL ranges for MP4
    payloads and honest NULL frame fields for unrecognized bytes."""
    import numpy as np

    from engine_spark.datapipe.multimodal import (
        encode_mp4,
        frame_sample,
        parse_mp4,
    )

    for sizes in [[10, 20, 30], [7], [5, 6], [11, 12, 13, 14, 15]]:
        frames = [bytes([i % 251]) * s for i, s in enumerate(sizes)]
        b = encode_mp4(frames, timescale=600, frame_duration=25)
        m = parse_mp4(b)
        assert m["n_frames"] == len(sizes) and m["sizes"] == sizes
        assert m["times"] == [25 * i for i in range(len(sizes))]
        for i, (o, s) in enumerate(zip(m["offsets"], m["sizes"])):
            assert b[o : o + s] == frames[i]

    frames = [b"A" * 10, b"B" * 20, b"C" * 30]
    mp4 = encode_mp4(frames)
    d = spark.createDataFrame(
        [(1, bytearray(mp4)), (2, bytearray(b"\x00" * 150))],
        "doc_id long, payload binary",
    )
    rows = frame_sample(d, 2).collect()
    got = {(r.doc_id, r.frame_idx): r for r in rows}
    assert got[(1, 0)].n_frames == 3
    assert mp4[got[(1, 0)].byte_start : got[(1, 0)].byte_end] == frames[0]
    assert mp4[got[(1, 2)].byte_start : got[(1, 2)].byte_end] == frames[2]
    assert (1, 1) not in got  # every_k=2 skips frame 1
    assert got[(2, None)].n_frames is None  # honest NULL for non-MP4 bytes


def test_decode_frames_mjpeg_real_pixels_avc_gated(spark):
    """decode_frames: Motion-JPEG MP4 samples decode to REAL pixels (dims,
    timestamp, pixel sum); an avc1-declared track emits the honest NULL-
    pixel rows (inter-frame decode needs an av library); non-MP4 payloads
    emit nothing."""
    import numpy as np

    from engine_spark.datapipe.jpeg import encode_jpeg
    from engine_spark.datapipe.multimodal import decode_frames, encode_mp4

    frames = []
    for i in range(5):
        a = np.empty((8, 12, 3), np.uint8)
        a[:, :] = (10 * i, 20, 30)
        frames.append(encode_jpeg(a, quality=100))
    mjpeg = encode_mp4(frames, codec=b"jpeg")
    avc = encode_mp4([b"\x00" * 40, b"\x00" * 50], codec=b"avc1")
    d = spark.createDataFrame(
        [(1, bytearray(mjpeg)), (2, bytearray(avc)), (3, bytearray(b"nope"))],
        "doc_id long, payload binary",
    )
    rows = {(r.doc_id, r.frame_idx): r for r in decode_frames(d, 2).collect()}
    assert sorted(rows) == [(1, 0), (1, 2), (1, 4), (2, 0)]
    for fi in (0, 2, 4):
        r = rows[(1, fi)]
        assert (r.width, r.height, r.channels) == (12, 8, 3)
        assert r.pix_sum == (10 * fi + 50) * 8 * 12
        assert abs(r.ts_s - fi * 25 / 600) < 1e-9
    r = rows[(2, 0)]
    assert r.n_frames == 2 and r.pix_sum is None and r.width is None


def test_png_codec_roundtrip_all_filters_and_channels():
    """decode(encode(a)) == a for every PNG filter type (0-4) and channel
    count — exercises each unfilter branch (Sub/Up/Average/Paeth) of the
    stdlib decoder against the matching encoder."""
    import numpy as np

    from engine_spark.datapipe.multimodal import decode_png, encode_png

    rng = np.random.RandomState(7)
    for nch in (1, 2, 3, 4):
        a = rng.randint(0, 256, size=(11, 7, nch), dtype=np.uint8)
        for ft in range(5):
            b = encode_png(a, filter_type=ft)
            got = decode_png(b)
            assert got.shape == a.shape, (nch, ft)
            assert (got == a).all(), f"roundtrip mismatch nch={nch} filter={ft}"


def test_png_palette_decode():
    """Indexed-color (type 3) PNGs expand through PLTE to RGB."""
    import struct
    import zlib

    import numpy as np

    from engine_spark.datapipe.multimodal import decode_png

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # red green blue
    idx = bytes([0, 0, 1, 2]) + bytes([0, 2, 1, 0])  # 2 rows, filter 0
    raw = b"\x00" + idx[:4] + b"\x00" + idx[4:]
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 2, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", palette)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    arr = decode_png(png)
    assert arr.shape == (2, 4, 3)
    assert tuple(arr[0, 0]) == (255, 0, 0) and tuple(arr[0, 2]) == (0, 255, 0)
    assert tuple(arr[1, 1]) == (0, 0, 255) and tuple(arr[1, 3]) == (255, 0, 0)


def test_bilinear_resize_math():
    import numpy as np

    from engine_spark.datapipe.multimodal import bilinear_resize

    a = np.array([[0, 10], [20, 30]], dtype=np.uint8)
    # identity resize is exact
    assert (bilinear_resize(a, 2, 2)[:, :, 0] == a).all()
    # 2x upscale, half-pixel centers: grid fractions 0/.25/.75/1 each axis
    got = bilinear_resize(a, 4, 4)[:, :, 0]
    exp = np.array(
        [[0, 2, 8, 10], [5, 8, 12, 15], [15, 18, 22, 25], [20, 22, 28, 30]]
    )
    assert (got == exp).all(), got
    # constant image stays constant under any resize
    c = np.full((5, 3, 3), 77, np.uint8)
    assert (bilinear_resize(c, 9, 2) == 77).all()


def test_resize_image_real_png_path(spark):
    """resize_image on a genuine PNG payload emits a genuine PNG: the
    output payload re-decodes (stdlib) to the target dims with correctly
    resampled pixels — no stand-in involved."""
    import numpy as np

    from engine_spark.datapipe.multimodal import decode_png, encode_png, resize_image

    a = np.full((40, 30, 3), 0, np.uint8)
    a[:, :, 0] = 100
    a[:, :, 1] = 150
    a[:, :, 2] = 200
    d = spark.createDataFrame(
        [(1, bytearray(encode_png(a)))], "doc_id long, payload binary"
    )
    row = resize_image(d, 15, 20).collect()[0]
    assert (row.width, row.height) == (15, 20)
    assert row.scale_x == 0.5 and row.scale_y == 0.5
    out = decode_png(bytes(row.payload))
    assert out.shape == (20, 15, 3)
    assert (out[:, :, 0] == 100).all() and (out[:, :, 2] == 200).all()


def test_decode_image_png_real_nonpng_null(spark):
    import numpy as np

    from engine_spark.datapipe.multimodal import decode_image, encode_png

    a = np.arange(24, dtype=np.uint8).reshape(4, 6)
    gif = b"GIF89a" + bytes([10, 0, 20, 0])
    d = spark.createDataFrame(
        [(1, bytearray(encode_png(a))), (2, bytearray(gif)), (3, None)],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in decode_image(d).collect()}
    assert (rows[1].format, rows[1].width, rows[1].height, rows[1].channels) == (
        "png", 6, 4, 1,
    )
    assert rows[1].pix_sum == int(a.sum())
    # header-only GIF (no image data blocks): real codec now tries and
    # degrades to the metadata-only row
    assert rows[2].format == "gif" and rows[2].width is None
    assert rows[3].format is None and rows[3].pix_sum is None  # null-safe


def test_decode_image_corrupt_png_degrades_not_crashes(spark):
    """A malformed PNG (valid header, corrupt IDAT → zlib.error; truncated
    chunk → struct.error) yields the metadata-only row instead of failing
    the executor task — the per-row total-function contract for crawled
    corpora."""
    import numpy as np

    from engine_spark.datapipe.multimodal import (
        decode_image,
        encode_png,
        resize_image,
    )

    good = encode_png(np.arange(24, dtype=np.uint8).reshape(4, 6))
    corrupt_idat = bytearray(good)
    corrupt_idat[40] ^= 0xFF  # inside the IDAT stream: breaks zlib inflate
    truncated = good[:30]  # cut mid-chunk: struct.unpack on short reads
    d = spark.createDataFrame(
        [(1, bytearray(good)), (2, corrupt_idat), (3, bytearray(truncated))],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in decode_image(d).collect()}
    assert rows[1].pix_sum == int(np.arange(24).sum())
    assert rows[2].format == "png" and rows[2].pix_sum is None
    assert rows[3].pix_sum is None
    # resize takes the stand-in path for the corrupt rows, crashing neither
    out = {r.doc_id: r for r in resize_image(d, 3, 2).collect()}
    assert len(out) == 3 and out[1].width == 3


def test_wav_codec_roundtrip_and_features(spark):
    """encode_wav → decode_audio recovers exact sample features; non-PCM16
    and non-WAV payloads degrade to header-only / all-NULL rows."""
    import struct

    import numpy as np

    from engine_spark.datapipe.multimodal import (
        decode_audio,
        encode_wav,
        parse_wav_header,
    )

    sine = np.round(1000 * np.sin(np.arange(800) * 0.1)).astype(np.int16)
    wav = encode_wav(sine, 16000)
    h = parse_wav_header(wav)
    assert (h["audio_format"], h["channels"], h["sample_rate"], h["bits"]) == (
        1, 1, 16000, 16,
    )
    assert h["data_len"] == 1600
    # a float32 (non-PCM16) WAV: header parses, features NULL
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    f32 = (
        b"RIFF" + struct.pack("<I", 28) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", 4) + b"\x00" * 4
    )
    d = spark.createDataFrame(
        [(1, bytearray(wav)), (2, bytearray(f32)), (3, bytearray(b"not audio")),
         (4, None)],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in decode_audio(d).collect()}
    r1 = rows[1]
    assert (r1.format, r1.channels, r1.sample_rate, r1.n_samples) == (
        "wav", 1, 16000, 800,
    )
    assert r1.duration_s == 0.05 and r1.peak == int(np.abs(sine).max())
    a = sine.astype(np.int64)
    assert r1.rms == float(np.sqrt((a * a).mean()))
    assert r1.zero_crossings == int(
        np.count_nonzero(np.signbit(a[:-1]) != np.signbit(a[1:]))
    )
    assert rows[2].format == "wav" and rows[2].rms is None  # codec gated
    assert rows[3].format is None and rows[4].rms is None  # total function


# ---------------------------------------------------------------------------
# segment dedup / seeded shuffle / Bloom ingest
# ---------------------------------------------------------------------------


def test_dedup_segments_drops_repeats_and_reassembles(spark):
    """Corpus-wide keep-first over 2-token segments: the boilerplate
    segment survives only in its lowest-(doc_id, idx) occurrence and
    reassembly preserves original order of the survivors."""
    from engine_spark.datapipe.segments import dedup_segments

    d = spark.createDataFrame(
        [
            (1, "aa bb cc dd"),            # segs: "aa bb", "cc dd"
            (2, "aa bb xx yy"),            # "aa bb" repeats -> dropped
            (3, "xx yy cc dd aa bb"),      # all three repeat -> empty
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup_segments(d, w=2).collect()}
    assert (out[1].n_segments, out[1].n_kept, out[1].new_text) == (
        2, 2, "aa bb cc dd",
    )
    assert (out[2].n_segments, out[2].n_kept, out[2].new_text) == (
        2, 1, "xx yy",
    )
    assert (out[3].n_segments, out[3].n_kept, out[3].new_text) == (3, 0, "")


def test_dedup_segments_within_doc_repeat(spark):
    """A segment repeated INSIDE one document keeps only its first copy
    (idx breaks the tie after doc_id)."""
    from engine_spark.datapipe.segments import dedup_segments

    d = spark.createDataFrame(
        [(7, "pp qq zz ww pp qq")], "doc_id long, text string"
    )
    (r,) = dedup_segments(d, w=2).collect()
    assert (r.n_segments, r.n_kept, r.new_text) == (3, 2, "pp qq zz ww")


def test_dedup_segments_paragraph_mode(spark):
    """paragraphs=True splits on blank lines (the production unit)."""
    from engine_spark.datapipe.segments import dedup_segments

    d = spark.createDataFrame(
        [
            (1, "intro text\n\nshared license block\n\nbody one"),
            (2, "other intro\n\nshared license block\n\nbody two"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup_segments(d, paragraphs=True).collect()}
    assert out[1].n_kept == 3
    assert out[1].new_text == "intro text\n\nshared license block\n\nbody one"
    assert out[2].n_kept == 2
    assert "shared license block" not in out[2].new_text
    assert out[2].new_text == "other intro\n\nbody two"


def test_shuffle_shards_deterministic_and_dense(spark):
    """Same (seed, key) -> same (shard, pos) across partition layouts;
    positions are 1..n_shard_rows dense inside every shard."""
    from engine_spark.datapipe.packing import shuffle_shards

    d1 = spark.range(0, 200).withColumnRenamed("id", "doc_id")
    d8 = d1.repartition(8)
    a = rows(shuffle_shards(d1, n_shards=4))
    b = rows(shuffle_shards(d8, n_shards=4))
    assert a == b
    by_shard = {}
    for _doc, shard, pos in a:
        by_shard.setdefault(shard, []).append(pos)
    assert set(by_shard) == {0, 1, 2, 3}
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), shard
    # a different seed is a different permutation
    c = rows(shuffle_shards(d1, seed=43, n_shards=4))
    assert c != a


def test_bloom_positions_sql_numpy_parity(spark):
    """The Spark-SQL build-side position formula and the numpy probe-side
    formula are bit-equal (the property the filter's exactness rests on)."""
    import numpy as np

    from engine_spark.datapipe.bloom import _positions_np, _positions_sql

    d = spark.createDataFrame(
        [(x,) for x in (0, 1, 17, 2**40 + 3, 2**56 - 1)], "h long"
    )
    got_sql = [
        r.p for r in d.select(
            F.expr(_positions_sql("h")).alias("p")
        ).orderBy("h").collect()
    ]
    hs = np.array(sorted((0, 1, 17, 2**40 + 3, 2**56 - 1)), dtype=np.int64)
    got_np = _positions_np(hs)
    for row_sql, row_np in zip(got_sql, got_np):
        assert list(row_sql) == list(row_np)


def test_bloom_dedup_exact_vs_plain_join(spark):
    """bloom_dedup's answer == plain exact semi-join semantics, and the
    Bloom prefilter admits no false negatives by construction."""
    corpus = spark.createDataFrame(
        [(i, f"seen document number {i}") for i in range(100)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        # 10 dups (case-insensitive match), 40 fresh
        [(1000 + i, f"SEEN document number {i}") for i in range(10)]
        + [(2000 + i, f"fresh document {i}") for i in range(40)],
        "doc_id long, text string",
    )
    from engine_spark.datapipe.bloom import bloom_dedup

    got = {r.doc_id: r.is_dup for r in bloom_dedup(batch, corpus).collect()}
    assert len(got) == 50
    for i in range(10):
        assert got[1000 + i] is True
    for i in range(40):
        assert got[2000 + i] is False


def test_bloom_build_bitmap_bounded_and_probing(spark):
    """build_bloom sets exactly the K bits per key (driver data bounded by
    M); a disjoint batch is pruned before the verify join."""
    import numpy as np

    from engine_spark.datapipe.bloom import (
        BLOOM_K,
        _positions_np,
        build_bloom,
        content_hash56,
    )
    from engine_spark.datapipe.fragments import Dialect

    corpus = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(50)], "doc_id long, text string"
    )
    h = corpus.select(
        F.expr(content_hash56(Dialect("spark"))).alias("h")
    )
    bits = build_bloom(h, "h")
    popcount = int(np.unpackbits(bits).sum())
    assert 0 < popcount <= 50 * BLOOM_K
    # every corpus key's positions are set (zero false negatives)
    hs = np.array([r.h for r in h.collect()], dtype=np.int64)
    pos = _positions_np(hs)
    assert ((bits[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1).all()


def test_bloom_store_across_epochs(spark, tmp_path):
    """Exact streaming dedup: repeats of earlier-epoch text flag True,
    fresh text False, batch-internal repeats keep only the first."""
    from engine_spark.datapipe.bloom import BloomDedupStore

    store = BloomDedupStore(spark, str(tmp_path / "state"))
    b1 = spark.createDataFrame(
        [(1, "alpha text"), (2, "beta text"), (3, "beta TEXT")],
        "doc_id long, text string",
    )
    r1 = {r.doc_id: r.is_dup for r in store.process_batch(b1, 0).collect()}
    # case-normalized: doc 3 repeats doc 2 inside the batch
    assert r1 == {1: False, 2: False, 3: True}

    b2 = spark.createDataFrame(
        [(10, "ALPHA text"), (11, "gamma text"), (12, "gamma text")],
        "doc_id long, text string",
    )
    r2 = {r.doc_id: r.is_dup for r in store.process_batch(b2, 1).collect()}
    assert r2 == {10: True, 11: False, 12: True}

    b3 = spark.createDataFrame(
        [(20, "gamma text"), (21, "delta text")], "doc_id long, text string"
    )
    r3 = {r.doc_id: r.is_dup for r in store.process_batch(b3, 2).collect()}
    assert r3 == {20: True, 21: False}


def test_bloom_store_replay_is_idempotent(spark, tmp_path):
    """Crash-replay of a committed epoch returns the identical answer and
    does not grow state (reads only strictly-earlier epochs)."""
    import os

    from engine_spark.datapipe.bloom import BloomDedupStore

    store = BloomDedupStore(spark, str(tmp_path / "state"))
    b1 = spark.createDataFrame(
        [(1, "one"), (2, "two")], "doc_id long, text string"
    )
    b2 = spark.createDataFrame(
        [(3, "one"), (4, "three")], "doc_id long, text string"
    )
    store.process_batch(b1, 0)
    first = {r.doc_id: r.is_dup for r in store.process_batch(b2, 1).collect()}
    state_before = sorted(os.listdir(store.hash_dir))
    replay = {r.doc_id: r.is_dup for r in store.process_batch(b2, 1).collect()}
    assert replay == first == {3: True, 4: False}
    assert sorted(os.listdir(store.hash_dir)) == state_before


def test_bloom_store_bitmap_files_are_constant_size(spark, tmp_path):
    """Per-epoch probe state is M/8 bytes regardless of batch size."""
    import os

    from engine_spark.datapipe.bloom import BLOOM_M, BloomDedupStore

    store = BloomDedupStore(spark, str(tmp_path / "state"))
    small = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    big = spark.createDataFrame(
        [(100 + i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    store.process_batch(small, 0)
    store.process_batch(big, 1)
    sizes = {
        os.path.getsize(os.path.join(store.hash_dir, d, "_bloom"))
        for d in os.listdir(store.hash_dir)
    }
    assert sizes == {BLOOM_M // 8}


def test_dedup_segments_stream_first_epoch_matches_batch(spark, tmp_path):
    """With an empty store, one epoch of streaming segment dedup equals
    the batch operator on the same input."""
    from engine_spark.datapipe.bloom import BloomDedupStore
    from engine_spark.datapipe.segments import (
        dedup_segments,
        dedup_segments_stream,
    )

    d = spark.createDataFrame(
        [
            (1, "aa bb cc dd"),
            (2, "aa bb xx yy"),
            (3, "xx yy cc dd aa bb"),
        ],
        "doc_id long, text string",
    )
    store = BloomDedupStore(spark, str(tmp_path / "state"), normalize=False)
    got = rows(dedup_segments_stream(store, d, 0, w=2))
    want = rows(dedup_segments(d, w=2))
    assert got == want


def test_dedup_segments_stream_across_epochs(spark, tmp_path):
    """Boilerplate seen in epoch 0 is stripped from epoch 1's documents."""
    from engine_spark.datapipe.bloom import BloomDedupStore
    from engine_spark.datapipe.segments import dedup_segments_stream

    store = BloomDedupStore(spark, str(tmp_path / "state"), normalize=False)
    e0 = spark.createDataFrame(
        [(1, "header boiler body one")], "doc_id long, text string"
    )
    e1 = spark.createDataFrame(
        [(2, "header boiler body two"), (3, "body one fresh text")],
        "doc_id long, text string",
    )
    dedup_segments_stream(store, e0, 0, w=2).collect()
    out = {
        r.doc_id: r
        for r in dedup_segments_stream(store, e1, 1, w=2).collect()
    }
    # doc 2: "header boiler" repeats epoch 0 -> stripped; "body two" fresh
    assert (out[2].n_segments, out[2].n_kept, out[2].new_text) == (
        2, 1, "body two",
    )
    # doc 3: "body one" repeats epoch 0's second segment; "fresh text" fresh
    assert (out[3].n_segments, out[3].n_kept, out[3].new_text) == (
        2, 1, "fresh text",
    )


def test_dedup_segments_matches_python_reference_property(spark):
    """Property: on random small corpora, dedup_segments equals a plain
    Python reference (global first-occurrence keep over w-token windows,
    reassembly in original order)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from engine_spark.datapipe.segments import dedup_segments

    W = 2
    vocab = ["a", "b", "c"]
    corpus_strategy = st.lists(
        st.lists(st.sampled_from(vocab), min_size=1, max_size=9),
        min_size=1,
        max_size=4,
    )

    def reference(corpus):
        seen: set[str] = set()
        out = {}
        for i, toks in enumerate(corpus):
            segs = [
                " ".join(toks[j : j + W]) for j in range(0, len(toks), W)
            ]
            kept = []
            for s in segs:
                if s not in seen:
                    seen.add(s)
                    kept.append(s)
            out[i] = (len(segs), len(kept), " ".join(kept))
        return out

    @given(corpus=corpus_strategy)
    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def prop(corpus):
        d = spark.createDataFrame(
            [(i, " ".join(toks)) for i, toks in enumerate(corpus)],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: (r.n_segments, r.n_kept, r.new_text)
            for r in dedup_segments(d, w=W).collect()
        }
        assert got == reference(corpus)

    prop()


# ---------------------------------------------------------------------------
# Y4M raw video
# ---------------------------------------------------------------------------


def test_y4m_c444_gray_roundtrip_exact():
    """Gray frames (R=G=B) survive RGB->YUV->RGB exactly in C444 full
    range (U=V=128, Y=value): decode must be bit-identical."""
    import numpy as np

    from engine_spark.datapipe.multimodal import (
        decode_y4m_frame,
        encode_y4m,
        parse_y4m,
    )

    g0 = np.repeat(
        ((np.arange(6)[:, None] + np.arange(8)[None, :]) * 17 % 256)
        .astype(np.uint8)[:, :, None],
        3,
        axis=2,
    )
    g1 = 255 - g0
    b = encode_y4m([g0, g1], fps=(25, 1))
    meta = parse_y4m(b)
    assert (meta["width"], meta["height"], meta["n_frames"]) == (8, 6, 2)
    assert (meta["fps_num"], meta["fps_den"]) == (25, 1)
    assert (decode_y4m_frame(b, meta, 0) == g0).all()
    assert (decode_y4m_frame(b, meta, 1) == g1).all()


def test_y4m_c420_upsample_and_limited_range():
    """Hand-built C420 stream: chroma replication doubles to the luma
    grid; XCOLORRANGE=LIMITED expands 16..235 luma to 0..255."""
    import numpy as np

    from engine_spark.datapipe.multimodal import decode_y4m_frame, parse_y4m

    w, h = 4, 2
    y = np.full((h, w), 128, np.uint8)
    cb = np.full((1, 2), 128, np.uint8)
    cr = np.full((1, 2), 228, np.uint8)  # +100 red push everywhere
    b = (
        b"YUV4MPEG2 W4 H2 F30:1 C420jpeg\nFRAME\n"
        + y.tobytes() + cb.tobytes() + cr.tobytes()
    )
    meta = parse_y4m(b)
    arr = decode_y4m_frame(b, meta, 0)
    assert arr.shape == (2, 4, 3)
    # BT.601: R = Y + 1.402*(Cr-128) = 128 + 140.2 -> clipped 255 everywhere
    assert (arr[:, :, 0] == 255).all()
    lim = (
        b"YUV4MPEG2 W4 H2 F30:1 C420jpeg XCOLORRANGE=LIMITED\nFRAME\n"
        + np.full((h, w), 235, np.uint8).tobytes()
        + np.full((1, 2), 128, np.uint8).tobytes()
        + np.full((1, 2), 128, np.uint8).tobytes()
    )
    lm = parse_y4m(lim)
    la = decode_y4m_frame(lim, lm, 0)
    assert (la == 255).all()  # 235 is white in limited range


def test_y4m_frame_sample_ranges_are_real(spark):
    """frame_sample on a Y4M payload emits each sampled frame's actual
    raw-plane byte extent (decodable by slicing the payload)."""
    import numpy as np

    from engine_spark.datapipe.multimodal import (
        encode_y4m,
        frame_sample,
        parse_y4m,
    )

    frames = [
        np.full((2, 2, 3), v, np.uint8) for v in (10, 60, 110, 160, 210)
    ]
    b = encode_y4m(frames)
    meta = parse_y4m(b)
    d = spark.createDataFrame([(1, bytearray(b))], "doc_id long, payload binary")
    got = {
        r.frame_idx: (r.byte_start, r.byte_end, r.n_frames)
        for r in frame_sample(d, every_k=2).collect()
    }
    assert set(got) == {0, 2, 4}
    for fi, (s, e, n) in got.items():
        assert n == 5
        assert (s, e) == (
            meta["offsets"][fi], meta["offsets"][fi] + meta["sizes"][fi]
        )
        assert e - s == 2 * 2 * 3  # C444 plane bytes


def test_y4m_decode_frames_spark(spark):
    """decode_frames reports real dims/pix_sum/timestamps for Y4M video."""
    import numpy as np

    from engine_spark.datapipe.multimodal import decode_frames, encode_y4m

    frames = [
        np.repeat(
            np.full((3, 4, 1), 40 * (i + 1), np.uint8), 3, axis=2
        )
        for i in range(4)
    ]
    b = encode_y4m(frames, fps=(10, 1))
    d = spark.createDataFrame([(7, bytearray(b))], "doc_id long, payload binary")
    got = {r.frame_idx: r for r in decode_frames(d, every_k=3).collect()}
    assert set(got) == {0, 3}
    for fi, r in got.items():
        assert (r.width, r.height, r.channels, r.n_frames) == (4, 3, 3, 4)
        assert r.pix_sum == 3 * 4 * 3 * 40 * (fi + 1)
        assert abs(r.ts_s - fi / 10) < 1e-9


def test_dedup_segments_preserves_case_and_text(spark):
    """A rewrite operator must not alter surviving text: case survives,
    and matching is exact-content (case-SENSITIVE) in both modes."""
    from engine_spark.datapipe.segments import dedup_segments

    d = spark.createDataFrame(
        [(1, "Hello World Foo Bar"), (2, "hello world Foo Bar")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in dedup_segments(d, w=2).collect()}
    # 'Hello World' != 'hello world' -> both survive; 'Foo Bar' dedups
    assert out[1].new_text == "Hello World Foo Bar"
    assert out[2].new_text == "hello world"
    assert (out[1].n_kept, out[2].n_kept) == (2, 1)


def test_y4m_mono_limited_range():
    """Cmono + XCOLORRANGE=LIMITED expands luma before returning (235 is
    white); a zero frame rate is rejected at parse."""
    import numpy as np
    import pytest

    from engine_spark.datapipe.multimodal import decode_y4m_frame, parse_y4m

    b = (
        b"YUV4MPEG2 W3 H2 F30:1 Cmono XCOLORRANGE=LIMITED\nFRAME\n"
        + np.full((2, 3), 235, np.uint8).tobytes()
    )
    meta = parse_y4m(b)
    assert (decode_y4m_frame(b, meta, 0) == 255).all()
    # F0:0 = unknown rate (mjpegtools convention): pixels still decode,
    # the rate reports as 0 so consumers emit NULL timestamps
    zm = parse_y4m(b"YUV4MPEG2 W2 H2 F0:0 C444\nFRAME\n" + bytes(12))
    assert (zm["fps_num"], zm["n_frames"]) == (0, 1)


def test_y4m_unknown_rate_decodes_with_null_ts(spark):
    """F0:0 streams decode; ts_s is NULL."""
    import numpy as np

    from engine_spark.datapipe.multimodal import decode_frames, encode_y4m

    b = encode_y4m([np.full((2, 2, 3), 9, np.uint8)]).replace(
        b"F30:1", b"F0:0"
    )
    d = spark.createDataFrame([(1, bytearray(b))], "doc_id long, payload binary")
    (r,) = decode_frames(d, every_k=1).collect()
    assert r.ts_s is None and r.pix_sum == 2 * 2 * 3 * 9


def test_dedup_segments_stream_rejects_case_folding_store(spark, tmp_path):
    """The exact-content invariant is enforced in code, not prose."""
    import pytest

    from engine_spark.datapipe.bloom import BloomDedupStore
    from engine_spark.datapipe.segments import dedup_segments_stream

    store = BloomDedupStore(spark, str(tmp_path / "state"))  # normalize=True
    d = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="normalize=False"):
        dedup_segments_stream(store, d, 0)


def test_bloom_store_structured_streaming_e2e(spark, tmp_path):
    """Real Structured Streaming wiring: a file-backed readStream with
    foreachBatch(store.process_batch) — Spark's own epoch ids key the
    store, dup detection spans micro-batches, and state survives because
    the store (not the harness) owns it."""
    from engine_spark.datapipe.bloom import BloomDedupStore
    from engine_spark.streaming.harness import StreamRunner

    store = BloomDedupStore(spark, str(tmp_path / "state"))
    r = StreamRunner(spark, "doc_id long, text string")
    collected: list = []

    def run_once():
        def sink(batch_df, epoch_id):
            collected.extend(
                store.process_batch(batch_df, epoch_id).collect()
            )

        q = (
            r.stream()
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", r.checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    r.send([{"doc_id": 1, "text": "alpha"}, {"doc_id": 2, "text": "beta"}])
    run_once()
    r.send([{"doc_id": 3, "text": "ALPHA"}, {"doc_id": 4, "text": "gamma"}])
    run_once()
    got = {row.doc_id: row.is_dup for row in collected}
    assert got == {1: False, 2: False, 3: True, 4: False}
    r.shutdown()


def test_bloom_store_compaction(spark, tmp_path):
    """compact() merges all epochs <= the watermark into one dir (union
    semantics preserved: dup answers identical before/after), refuses to
    touch the newest replayable epoch, and later epochs still commit."""
    import os

    import pytest

    from engine_spark.datapipe.bloom import BloomDedupStore

    store = BloomDedupStore(spark, str(tmp_path / "state"))
    for e, texts in enumerate([["a", "b"], ["c"], ["d"]]):
        df = spark.createDataFrame(
            [(e * 10 + i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        store.process_batch(df, e)

    with pytest.raises(ValueError, match="strictly below"):
        store.compact(2)  # newest epoch must stay replayable
    assert store.compact(1) == 2  # epochs 0 and 1 merged
    names = sorted(os.listdir(store.hash_dir))
    assert names == ["epoch-0000000001-c", "epoch-0000000002"]

    b = spark.createDataFrame(
        [(90, "a"), (91, "c"), (92, "d"), (93, "zz")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.is_dup for r in store.process_batch(b, 3).collect()}
    assert got == {90: True, 91: True, 92: True, 93: False}
    # compaction advances with the stream; same watermark refuses
    with pytest.raises(ValueError, match="already compacted"):
        store.compact(1)
    assert store.compact(2) == 2  # the -c dir + epoch 2 merge again


def test_fuzzy_pairs_match_bruteforce_property(spark):
    """Property: fuzzy_pairs equals a pure-Python brute force that
    replicates the documented semantics exactly — ASCII-normalized
    64-char prefix, 8-char block key, blocks over FUZZY_BLOCK_CAP
    excluded, Levenshtein over prefixes <= FUZZY_T. Randomized corpora
    cover ties, shared prefixes, empty prefixes, and non-ASCII."""
    import random
    import re

    from engine_spark.datapipe.queries import (
        FUZZY_BLOCK_CAP,
        FUZZY_PREFIX,
        FUZZY_T,
        fuzzy_pairs,
    )

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    rng = random.Random(42)
    words = ["alpha", "beta", "gamma", "délta", "ZETA", "the", "x1"]
    rows = []
    for did in range(120):
        base = " ".join(rng.choices(words, k=rng.randint(0, 12)))
        rows.append((did, base))
    # hot shared prefix to exercise the cap
    rows += [(1000 + i, "shared prefix block " + "a" * (i % 3))
             for i in range(FUZZY_BLOCK_CAP + 10)]

    got = {
        (r.doc_a, r.doc_b, r.edit_dist)
        for r in fuzzy_pairs(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }

    prefs = {
        did: re.sub(r"[^ -~]", "", text.lower()[:FUZZY_PREFIX])
        for did, text in rows
    }
    from collections import Counter

    bn = Counter(p[:8] for p in prefs.values())
    want = set()
    ids = sorted(prefs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            pa, pb = prefs[a], prefs[b]
            if pa[:8] != pb[:8] or bn[pa[:8]] > FUZZY_BLOCK_CAP:
                continue
            d = lev(pa, pb)
            if d <= FUZZY_T:
                want.add((a, b, d))
    assert got == want


def test_parse_image_header_rejects_bm_prose():
    """'BM' is printable prose ('BMW dealers...'); without a real DIB
    header size at offset 14 the payload must not classify as a bitmap
    (review fix: text rows were picking up fabricated dimensions)."""
    from engine_spark.datapipe.multimodal import parse_image_header

    prose = b"BMW dealers reported record sales this quarter overall."
    assert parse_image_header(prose) == (None, None, None)
    # a real BITMAPINFOHEADER still parses
    import struct

    bmp = (
        b"BM" + b"\x00" * 12 + struct.pack("<I", 40)
        + struct.pack("<ii", 64, -48)
    )
    assert parse_image_header(bmp) == ("bmp", 64, 48)


def test_jpeg_trailing_restart_marker_tolerated():
    """Some encoders emit one RSTn after the final interval; the
    segmented decoder must ignore extras like the pre-segmented one did
    (strictly FEWER markers than intervals still raises)."""
    import numpy as np

    from engine_spark.datapipe.jpeg import decode_jpeg, encode_jpeg

    g = ((np.arange(24)[:, None] + np.arange(32)[None, :]) % 256).astype(
        np.uint8
    )
    img = np.stack([g, g, g], axis=2)
    b = encode_jpeg(img, quality=90, restart_interval=2)
    ref = decode_jpeg(b)
    # inject a spurious trailing RST7 right before the EOI marker
    eoi = b.rfind(b"\xff\xd9")
    patched = b[:eoi] + b"\xff\xd7" + b[eoi:]
    assert (decode_jpeg(patched) == ref).all()
    # a MID-STREAM surplus marker is corruption (the stream restarts more
    # often than DRI declares): must fail LOUDLY, not misalign silently
    import pytest

    sos = b.find(b"\xff\xda")
    mid = b.find(b"\xff\xd0", sos)  # first real RST0
    assert mid > 0
    corrupt = b[:mid] + b"\xff\xd1" + b[mid:]
    with pytest.raises(ValueError):
        decode_jpeg(corrupt)


def test_mp4_track_dims_prefers_video_trak():
    """An audio-first MP4 (audio tkhd dims legitimately zero) must not
    shadow the video trak's real 16.16 dimensions."""
    import struct

    from engine_spark.datapipe.multimodal import (
        _mp4_track_dims,
        encode_mp4,
    )

    mp4 = encode_mp4([b"frame" * 4], width=320, height=200)
    # build an audio trak (hdlr 'soun', zero-dim tkhd) and splice it in
    # FRONT of the video trak inside moov
    def box(typ, *payload):
        data = b"".join(payload)
        return struct.pack(">I", len(data) + 8) + typ + data

    tkhd = box(
        b"tkhd",
        struct.pack(">IIIII", 0x7, 0, 0, 2, 0),
        struct.pack(">I", 0), b"\x00" * 8,
        struct.pack(">HHHH", 0, 0, 0x0100, 0),
        struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000),
        struct.pack(">II", 0, 0),
    )
    hdlr = box(b"hdlr", struct.pack(">II", 0, 0), b"soun",
               b"\x00" * 12, b"aud\x00")
    audio_trak = box(b"trak", tkhd, box(b"mdia", hdlr))
    i = mp4.find(b"moov")
    (moov_size,) = struct.unpack(">I", mp4[i - 4 : i])
    new_moov_size = moov_size + len(audio_trak)
    # moov header is 8 bytes; insert the audio trak right after it
    patched = (
        mp4[: i - 4]
        + struct.pack(">I", new_moov_size)
        + b"moov"
        + audio_trak
        + mp4[i + 4 :]
    )
    assert _mp4_track_dims(patched) == (320, 200)


def test_decode_meta_clamps_hostile_dims(spark):
    """A corrupt header declaring dims >= 2^31 must degrade to NULL, not
    wrap through the INT cast."""
    import struct

    from engine_spark.datapipe.multimodal import decode_meta

    png = (
        b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0d" + b"IHDR"
        + struct.pack(">II", 3_000_000_000, 480) + b"\x08\x06\x00\x00\x00"
    )
    d = spark.createDataFrame(
        [(1, bytearray(png))], "doc_id long, payload binary"
    )
    (r,) = decode_meta(d).collect()
    assert r.format == "png" and r.width is None and r.height == 480


def test_parse_tiff_and_flac_headers(spark):
    """TIFF (both endiannesses, SHORT and LONG dim tags) and FLAC
    STREAMINFO parse through the real stdlib parsers and dispatch in
    decode_meta."""
    import struct

    from engine_spark.datapipe.multimodal import (
        decode_meta,
        parse_flac_header,
        parse_image_header,
    )

    def tiff(end, typ, w, h):
        e = "<" if end == b"II" else ">"
        magic = b"II*\x00" if end == b"II" else b"MM\x00*"
        fmt = "H" if typ == 3 else "I"
        def val(v):
            raw = struct.pack(f"{e}{fmt}", v)
            return raw + b"\x00" * (4 - len(raw))
        ifd = (
            struct.pack(f"{e}H", 2)
            + struct.pack(f"{e}HHI", 256, typ, 1) + val(w)
            + struct.pack(f"{e}HHI", 257, typ, 1) + val(h)
            + struct.pack(f"{e}I", 0)
        )
        return magic + struct.pack(f"{e}I", 8) + ifd

    assert parse_image_header(tiff(b"II", 3, 640, 480)) == ("tiff", 640, 480)
    assert parse_image_header(tiff(b"MM", 4, 1920, 1080)) == ("tiff", 1920, 1080)
    # truncated TIFF degrades, never raises
    assert parse_image_header(b"II*\x00\x08\x00\x00\x00\x02")[0] is None

    def flac(sr, ch, bits, total):
        si = bytearray(34)
        si[10] = (sr >> 12) & 0xFF
        si[11] = (sr >> 4) & 0xFF
        si[12] = ((sr & 0xF) << 4) | ((ch - 1) << 1) | ((bits - 1) >> 4)
        si[13] = (((bits - 1) & 0xF) << 4) | ((total >> 32) & 0xF)
        si[14:18] = struct.pack(">I", total & 0xFFFFFFFF)
        return b"fLaC" + bytes([0x80]) + len(si).to_bytes(3, "big") + bytes(si)

    got = parse_flac_header(flac(44100, 2, 16, 1_000_000))
    assert got == {"sample_rate": 44100, "channels": 2, "bits": 16,
                   "total_samples": 1_000_000}
    assert parse_flac_header(b"not flac at all") is None

    d = spark.createDataFrame(
        [
            (1, bytearray(tiff(b"II", 3, 320, 200))),
            (2, bytearray(flac(8000, 1, 16, 12345))),
        ],
        "doc_id long, payload binary",
    )
    out = {r.doc_id: r for r in decode_meta(d).collect()}
    assert (out[1].format, out[1].width, out[1].height) == ("tiff", 320, 200)
    assert (out[2].format, out[2].n_frames) == ("flac", 12345)
    assert out[2].width is None


def test_parse_flac_header_truncation_is_total():
    """A STREAMINFO whose declared length exceeds the actual bytes must
    return None (total function), never raise; an undersized body must
    not silently yield zeroed fields."""
    from engine_spark.datapipe.multimodal import parse_flac_header

    truncated = b"fLaC" + b"\x00" + (18).to_bytes(3, "big") + b"\x00" * 5
    assert parse_flac_header(truncated) is None
    short = b"fLaC" + b"\x80" + (34).to_bytes(3, "big") + b"\x00" * 14
    assert parse_flac_header(short) is None


def test_restart_segments_zero_mcus():
    """restart>0 with total_mcus==0 (zero-height/DNL-deferred SOF): no
    segments when there are no markers; a ValueError (decoder contract,
    not IndexError) when markers exist anyway — ADVICE r8 regression."""
    import pytest as _pytest

    from engine_spark.datapipe.jpeg import _restart_segments

    assert _restart_segments([], 4, 0, 100) == []
    with _pytest.raises(ValueError, match="0 MCUs"):
        _restart_segments([10], 4, 0, 100)


def test_mp4_track_dims_zero_dim_video_trak_does_not_shadow():
    """A 'vide' trak whose tkhd declares 0x0 must not shadow a later video
    trak with real dimensions — ADVICE r8 regression."""
    import struct as _struct

    from engine_spark.datapipe.multimodal import _mp4_track_dims

    def box(typ, body):
        return _struct.pack(">I", 8 + len(body)) + typ + body

    def trak(handler, w, h):
        tkhd = box(
            b"tkhd",
            b"\x00" + b"\x00" * 3 + b"\x00" * 72
            + _struct.pack(">II", w << 16, h << 16),
        )
        hdlr = box(b"hdlr", b"\x00" * 8 + handler + b"\x00" * 12)
        mdia = box(b"mdia", hdlr)
        return box(b"trak", tkhd + mdia)

    payload = box(b"moov", trak(b"vide", 0, 0) + trak(b"vide", 640, 480))
    assert _mp4_track_dims(payload) == (640, 480)
    # zero-dim video trak alone still degrades to (None, None)
    assert _mp4_track_dims(box(b"moov", trak(b"vide", 0, 0))) == (None, None)


def test_jpeg_dc_predictor_overflow_raises_valueerror():
    """A crafted stream can walk the DC predictor past int32: the decoder
    must raise ValueError (in DECODE_ERRORS, so callers degrade the row
    to NULL) rather than wrap on numpy 1.x / leak OverflowError on 2.x —
    ADVICE r8 regression for the int64-pack range check."""
    import pytest as _pytest

    from engine_spark.datapipe.jpeg import _decode_dc_units, _huff_lut
    from engine_spark.datapipe.multimodal import DECODE_ERRORS

    # one 1-bit Huffman code "0" -> DC category 15 (15-bit diff)
    lut = _huff_lut({(1, 0): 15})
    # each 16-bit unit: code bit 0, then 15 ones -> diff +32767
    n_units = 9  # 9 * 32767 << 13 walks past 2^31
    buf = b"\x7f\xff" * n_units + b"\x00" * 8  # pre-padded for _FastBits
    scan = [{"id": 1, "td": 0}]
    units = [[(scan[0], i)] for i in range(n_units)]
    with _pytest.raises(ValueError, match="int32 range") as ei:
        _decode_dc_units(buf, 0, units, 0, n_units, scan, {}, {(0, 0): lut},
                         ah=0, al=13)
    assert isinstance(ei.value, DECODE_ERRORS)
    # the same stream stays decodable below the overflow point
    out = _decode_dc_units(buf, 0, units, 0, n_units, scan, {}, {(0, 0): lut},
                           ah=0, al=0)
    assert out[0][-1][2] == 32767 * n_units


def test_tiff_codec_roundtrip_all_profiles(spark):
    """encode_tiff → decode_tiff round-trips RGB (both byte orders,
    multi-strip), 8-bit gray (both photometric polarities), and 1-bit
    bilevel (both polarities, width not a byte multiple); non-baseline
    profiles raise ValueError; decode_image degrades a compressed TIFF
    to the header-only row instead of failing the task."""
    import struct

    import pytest

    import numpy as np

    from engine_spark.datapipe.multimodal import (
        decode_image,
        decode_pixels,
        decode_tiff,
        encode_tiff,
        parse_image_header,
    )

    rng = np.random.RandomState(11)
    rgb = rng.randint(0, 256, (13, 9, 3), np.uint8)
    for endian in ("II", "MM"):
        b = encode_tiff(rgb, endian=endian)
        assert parse_image_header(b) == ("tiff", 9, 13)
        assert np.array_equal(decode_tiff(b), rgb)
    gray = rng.randint(0, 256, (7, 5), np.uint8)
    for ph in (0, 1):
        assert np.array_equal(
            decode_tiff(encode_tiff(gray, photometric=ph))[:, :, 0], gray
        )
    bits = (rng.randint(0, 2, (11, 13), np.uint8) * 255).astype(np.uint8)
    for ph in (0, 1):
        got = decode_tiff(encode_tiff(bits, bilevel=True, photometric=ph))
        assert np.array_equal(got[:, :, 0], bits)
    # single-strip and many-strip agree
    assert np.array_equal(
        decode_tiff(encode_tiff(gray, rows_per_strip=100)),
        decode_tiff(encode_tiff(gray, rows_per_strip=1)),
    )
    # dispatch through decode_pixels
    fmt, arr = decode_pixels(encode_tiff(rgb))
    assert fmt == "tiff" and arr.shape == (13, 9, 3)

    # non-baseline: set Compression=5 (LZW) in the IFD → ValueError
    lzw = bytearray(encode_tiff(gray))
    (ifd,) = struct.unpack("<I", lzw[4:8])
    (n,) = struct.unpack("<H", lzw[ifd : ifd + 2])
    for k in range(n):
        off = ifd + 2 + 12 * k
        if struct.unpack("<H", lzw[off : off + 2])[0] == 259:
            lzw[off + 8 : off + 10] = struct.pack("<H", 5)
    with pytest.raises(ValueError, match="compression"):
        decode_tiff(bytes(lzw))
    # truncated strips raise
    whole = encode_tiff(gray)
    with pytest.raises(ValueError):
        decode_tiff(whole[: len(whole) // 2])

    # Spark path: the compressed variant degrades to header-only
    d = spark.createDataFrame(
        [(1, bytearray(encode_tiff(rgb))), (2, bytearray(bytes(lzw)))],
        "doc_id long, payload binary",
    )
    out = {r.doc_id: r for r in decode_image(d).collect()}
    assert (out[1].format, out[1].channels) == ("tiff", 3)
    assert out[1].pix_sum == int(rgb.sum())
    assert (out[2].format, out[2].pix_sum) == ("tiff", None)


def test_bm25_scores_tf_idf_and_length(spark):
    """Okapi BM25 axioms on a hand corpus: higher tf wins within a doc
    length class; rarer terms outscore common ones at equal tf; a longer
    doc is penalized vs a shorter one with the same tf. Scores must be
    exactly repartitioning-invariant (rounded-then-DECIMAL-summed)."""
    from engine_spark.datapipe.queries import bm25_scores

    docs = spark.createDataFrame(
        [(1, "cat cat cat dog"),        # tf(cat)=3, short
         (2, "cat dog dog dog"),        # tf(cat)=1
         (3, "cat cat cat dog " * 8),   # tf(cat)=24 but 8x longer
         (4, "bird dog dog dog")],      # rare term holder
        "doc_id long, text string",
    )
    q = spark.createDataFrame(
        [(0, "cat"), (1, "bird"), (2, "dog")], "q_id int, term string"
    )
    got = {(r.q_id, r.doc_id): r.score for r in bm25_scores(docs, q).collect()}
    # tf monotonicity within equal-length docs
    assert got[(0, 1)] > got[(0, 2)]
    # doc-length normalization: doc 3 repeats doc 1 eight times — same
    # tf DENSITY, but saturation + length penalty keep it from 8x the score
    assert got[(0, 3)] < 8 * got[(0, 1)]
    # idf: 'bird' (df=1) in doc 4 outscores 'dog' (df=4) in the same doc
    assert got[(1, 4)] > got[(2, 4)]
    # partitioning invariance, exact
    again = {(r.q_id, r.doc_id): r.score
             for r in bm25_scores(docs.repartition(7), q).collect()}
    assert again == got


def test_hybrid_rrf_fuses_both_rankers(spark):
    """The RRF gate on the sf0.001 testdata: every fused score must equal
    1/(60+lex)+1/(60+sem) recomputed from its own rank columns (NULL rank
    contributes 0), pools cap at RRF_TOPK rows per query, and at least one
    candidate must carry BOTH ranks (genuine fusion, not a disjoint union)."""
    from engine_spark.datapipe.queries import (
        RRF_C, RRF_SEEDS, RRF_TOPK, q_search_hybrid_rrf,
    )

    rows = q_search_hybrid_rrf(spark, "/root/testdata/sf0.001").collect()
    assert {r.q_id for r in rows} == set(range(RRF_SEEDS))
    both = 0
    for r in rows:
        want = (1.0 / (RRF_C + r.lex_rnk) if r.lex_rnk is not None else 0.0) \
             + (1.0 / (RRF_C + r.sem_rnk) if r.sem_rnk is not None else 0.0)
        assert abs(r.rrf_score - want) <= 1e-6
        assert r.cand_id != r.q_id  # self-matches excluded from both pools
        both += r.lex_rnk is not None and r.sem_rnk is not None
    assert both > 0
    from collections import Counter
    per_q = Counter(r.q_id for r in rows)
    assert all(n <= RRF_TOPK for n in per_q.values())
    # fused_rnk is dense 1..n per query
    for qid in per_q:
        ranks = sorted(r.fused_rnk for r in rows if r.q_id == qid)
        assert ranks == list(range(1, len(ranks) + 1))


def test_mmr_greedy_demotes_near_duplicates():
    """Greedy MMR on a hand pool: candidate 11 is a near-duplicate of the
    top-relevance pick 10, so pure-relevance order (10, 11, ...) must become
    (10, <diverse>, ...) with 11 demoted; scores must follow the
    lambda*rel - (1-lambda)*max-sim formula on the rounded inputs."""
    import math

    import pandas as pd

    from engine_spark.datapipe.queries import MMR_LAMBDA, _mmr_greedy

    pool = pd.DataFrame(
        {"q_id": [0] * 4, "cand_id": [10, 11, 12, 13],
         "rel": [0.95, 0.94, 0.80, 0.60]}
    )
    sims_rows = []
    sim = {(10, 11): 0.99, (10, 12): 0.10, (10, 13): 0.05,
           (11, 12): 0.12, (11, 13): 0.06, (12, 13): 0.50}
    for (a, b), s in sim.items():
        sims_rows += [(0, a, b, s), (0, b, a, s)]
    sims = pd.DataFrame(sims_rows, columns=["q_id", "a", "b", "sim"])

    out = _mmr_greedy(pool, sims)
    order = list(out["cand_id"])
    assert order[0] == 10                      # pure relevance first
    assert order[1] == 12                      # near-dup 11 demoted
    assert order.index(11) > order.index(12)
    # score formula check for the second pick
    r6f = lambda x: math.floor(x * 1000000 + 0.5) / 1000000  # noqa: E731
    mu = round(1 - MMR_LAMBDA, 6)
    want = r6f(MMR_LAMBDA * 0.80 - mu * 0.10)
    assert out.loc[out["cand_id"] == 12, "mmr_score"].iloc[0] == want
    # k never exceeds the pool
    assert len(out) == 4


def test_mmr_small_pool_matches_oracle(spark, tmp_path):
    """Regression: a corpus with fewer than MMR_K candidates per seed must
    yield the same PARTIAL selection from the Spark greedy and the unrolled
    SQL oracle (the oracle once emitted zero rows when the final CTE went
    empty). 4 vectors -> each of the 3 seeds has a 3-candidate pool."""
    import duckdb
    import pandas as pd

    from engine_spark.datapipe.queries import EMB_DIM
    from engine_spark.queries import QUERIES

    rng = [[(i * 7 + j * 3) % 13 / 13.0 + 0.1 for j in range(EMB_DIM)]
           for i in range(4)]
    pdf = pd.DataFrame(
        {"vec_id": range(4),
         "embedding": [pd.array(v, dtype="float32") for v in rng],
         "label": [0] * 4}
    )
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {"vec_id": pa.array(range(4), pa.int64()),
         "embedding": pa.array(rng, pa.list_(pa.float32())),
         "label": pa.array([0] * 4, pa.int32())}
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    sdf = QUERIES["search_mmr_rerank"].spark(spark, str(tmp_path)).toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * FROM '{tmp_path}/embeddings.parquet'")
    odf = con.sql(QUERIES["search_mmr_rerank"].oracle).df()
    key = ["q_id", "mmr_rank"]
    s = sdf.sort_values(key).reset_index(drop=True)
    o = odf.sort_values(key).reset_index(drop=True)
    assert len(s) == len(o) == 9  # 3 seeds x 3-candidate partial selections
    assert list(s["cand_id"]) == list(o["cand_id"])
    assert list(s["mmr_score"]) == list(o["mmr_score"])


def test_ivf_persisted_index_matches_live_search(spark, tmp_path):
    """ivf_index_build persists cell-partitioned vectors + a codebook
    sidecar; ivf_index_search against the index must (a) prune the scan to
    the probed cells' partitions — the ~nprobe/k read that makes a
    persisted index the 100 TB shape — and (b) return exactly what the
    live (retrain-and-assign) ivf_search returns for the same codebook."""
    from engine_spark.datapipe.ivf import (
        ivf_index_build,
        ivf_index_search,
        ivf_search,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = f"file://{tmp_path}/ivf_idx"
    cents = ivf_index_build(
        spark, emb, path, full_dim=64, cell_dim=16, k=8, iters=3
    )
    got = ivf_index_search(spark, path, n_queries=5, nprobe=2, topk=3)
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the literal cell IN (...) filter must reach the partitioned source
    assert "PartitionFilters: [" in plan and "cell" in plan.split(
        "PartitionFilters: ["
    )[1][:200]
    live = ivf_search(
        emb, cents, full_dim=64, cell_dim=16,
        n_queries=5, nprobe=2, topk=3,
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, live.collect()))


def test_incremental_bm25_index_matches_batch(spark, tmp_path):
    """The incremental postings store, fed the corpus over three epochs,
    must score queries exactly like the one-shot batch bm25_scores; the
    query scan must prune to the query terms' buckets; a crash-replayed
    epoch must be a no-op; compaction must preserve both the scores and
    exactly-once semantics."""
    from engine_spark.datapipe.queries import BM25_QUERIES, BM25_TOPK, bm25_scores, _topk_by
    from engine_spark.datapipe.retrieval_store import IncrementalBM25Index

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    qdf = spark.createDataFrame(BM25_QUERIES, "q_id INT, term STRING")

    idx = IncrementalBM25Index(spark, f"file://{tmp_path}/bm25_idx")
    for eid in range(3):
        idx.add_batch(docs.filter(F.col("doc_id") % 3 == eid), eid)
    idx.add_batch(docs.filter(F.col("doc_id") % 3 == 1), 1)  # crash replay: no-op

    got = idx.search(qdf, topk=BM25_TOPK)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan  # bucket pruning reached the scan

    batch = _topk_by(
        bm25_scores(docs, qdf), "q_id", "score", "doc_id", "rnk", BM25_TOPK
    ).select("q_id", "doc_id", "score", "rnk")
    want = sorted(map(tuple, batch.collect()))
    assert sorted(map(tuple, got.collect())) == want

    # compaction: merge epochs 0..1 into one -c dir; scores unchanged
    assert idx.compact(1) == 2
    assert [eid for eid, _ in idx._epochs()] == [1, 2]
    assert sorted(map(tuple, idx.search(qdf, topk=BM25_TOPK).collect())) == want
    # exactly-once survives compaction: replaying a shadowed epoch is a no-op
    idx.add_batch(docs.filter(F.col("doc_id") % 3 == 0), 0)
    assert sorted(map(tuple, idx.search(qdf, topk=BM25_TOPK).collect())) == want


def test_incremental_bm25_structured_streaming_e2e(spark, tmp_path):
    """Real Structured Streaming wiring for the BM25 store: a file-backed
    readStream with foreachBatch(index.add_batch) — Spark's own epoch ids
    key the store, and a query after the stream drains scores exactly
    like batch BM25 over everything ingested."""
    from engine_spark.datapipe.queries import bm25_scores
    from engine_spark.datapipe.retrieval_store import IncrementalBM25Index
    from engine_spark.streaming.harness import StreamRunner

    idx = IncrementalBM25Index(spark, f"file://{tmp_path}/idx")
    r = StreamRunner(spark, "doc_id long, text string")

    def run_once():
        q = (
            r.stream()
            .writeStream.foreachBatch(
                lambda df, eid: idx.add_batch(df, eid)
            )
            .option("checkpointLocation", r.checkpoint)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    rows = [
        (1, "spark shuffles data across the cluster"),
        (2, "the cluster scales spark jobs"),
        (3, "data pipelines feed training jobs"),
        (4, "an unrelated document about cats"),
    ]
    r.send([{"doc_id": i, "text": t} for i, t in rows[:2]])
    run_once()
    r.send([{"doc_id": i, "text": t} for i, t in rows[2:]])
    run_once()

    qdf = spark.createDataFrame(
        [(0, "spark"), (0, "cluster"), (1, "jobs")], "q_id INT, term STRING"
    )
    got = sorted(map(tuple, idx.search(qdf, topk=4).collect()))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    from engine_spark.datapipe.queries import _topk_by

    want = sorted(
        map(
            tuple,
            _topk_by(bm25_scores(docs, qdf), "q_id", "score", "doc_id", "rnk", 4)
            .select("q_id", "doc_id", "score", "rnk")
            .collect(),
        )
    )
    assert got == want
    r.shutdown()


def test_ivf_index_incremental_ingest(spark, tmp_path):
    """ivf_index_add_batch appends new vectors to a persisted index
    exactly once (frozen codebook, cell-partitioned epoch dirs); search
    over base+epochs equals live ivf_search over the union corpus with
    the same codebook, and a replayed epoch changes nothing."""
    from engine_spark.datapipe.ivf import (
        ivf_index_add_batch,
        ivf_index_build,
        ivf_index_search,
        ivf_search,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 2 == 0)
    incr = emb.filter(F.col("vec_id") % 2 == 1)
    path = f"file://{tmp_path}/ivf_live"
    cents = ivf_index_build(
        spark, base, path, full_dim=64, cell_dim=16, k=8, iters=3
    )
    ivf_index_add_batch(spark, incr, path, 0)
    ivf_index_add_batch(spark, incr, path, 0)  # crash replay: no-op

    got = sorted(
        map(tuple, ivf_index_search(spark, path, n_queries=5, nprobe=2,
                                    topk=3).collect())
    )
    live = ivf_search(
        emb, cents, full_dim=64, cell_dim=16, n_queries=5, nprobe=2, topk=3
    )
    assert got == sorted(map(tuple, live.collect()))


def test_incremental_stores_survive_empty_batches_and_stale_compaction(
    spark, tmp_path
):
    """Hardening cases from review: (a) an EMPTY micro-batch commits a
    data-file-less epoch dir that must not brick later reads (explicit
    schemas, not inference); (b) a crash between a compaction's publish
    and its victim removal leaves an older -c dir behind — only the
    MAXIMAL -c dir may be read, or shadowed postings double-count."""
    import shutil

    from engine_spark.datapipe.ivf import (
        ivf_index_add_batch,
        ivf_index_build,
        ivf_index_search,
    )
    from engine_spark.datapipe.queries import BM25_QUERIES, BM25_TOPK
    from engine_spark.datapipe.retrieval_store import IncrementalBM25Index

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    qdf = spark.createDataFrame(BM25_QUERIES, "q_id INT, term STRING")
    empty_docs = docs.filter(F.lit(False))

    # (a) BM25: epochs 0..3 with epoch 2 EMPTY; search must still work
    idx = IncrementalBM25Index(spark, f"file://{tmp_path}/bm25")
    for eid in range(4):
        batch = empty_docs if eid == 2 else docs.filter(F.col("doc_id") % 3 == eid)
        idx.add_batch(batch, eid)
    want = sorted(map(tuple, idx.search(qdf, topk=BM25_TOPK).collect()))
    assert want  # non-degenerate

    # (b) compact 0..1, then simulate the crash window: after a LATER
    # compaction to epoch-2-c, the stale epoch-1-c reappears (copied back
    # as if the victim delete never ran) — scores must not change
    assert idx.compact(1) == 2
    post_dir = tmp_path / "bm25" / "postings"
    stale = tmp_path / "stale-1c"
    shutil.copytree(str(post_dir / "epoch-0000000001-c"), str(stale))
    assert idx.compact(2) == 2  # merges epoch-1-c + (empty) epoch-2
    shutil.copytree(str(stale), str(post_dir / "epoch-0000000001-c"))
    assert [eid for eid, _ in idx._epochs()] == [2, 3]  # stale -c shadowed
    assert sorted(map(tuple, idx.search(qdf, topk=BM25_TOPK).collect())) == want

    # (a') IVF: an empty ingest epoch must not brick the index either
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = f"file://{tmp_path}/ivf"
    ivf_index_build(spark, emb, path, full_dim=64, cell_dim=16, k=8, iters=2)
    before = sorted(
        map(tuple, ivf_index_search(spark, path, n_queries=3, topk=3).collect())
    )
    ivf_index_add_batch(spark, emb.filter(F.lit(False)), path, 0)
    after = sorted(
        map(tuple, ivf_index_search(spark, path, n_queries=3, topk=3).collect())
    )
    assert after == before


def test_hybrid_search_incremental_composes_both_stores(spark, tmp_path):
    """RRF fusion over the LIVE stores: lexical ranks from the incremental
    BM25 postings store, semantic ranks from the persisted IVF index,
    fused with the gate's own sum(1/(C+rank)). Verified against an
    independent fusion of the two component rankings (full-outer
    semantics: one-sided candidates keep their side's contribution)."""
    from engine_spark.datapipe.ivf import ivf_index_build, ivf_index_search
    from engine_spark.datapipe.queries import BM25_QUERIES, RRF_C
    from engine_spark.datapipe.retrieval_store import (
        IncrementalBM25Index,
        hybrid_search_incremental,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qdf = spark.createDataFrame(BM25_QUERIES, "q_id INT, term STRING")

    bm25 = IncrementalBM25Index(spark, f"file://{tmp_path}/bm25")
    for eid in range(2):
        bm25.add_batch(docs.filter(F.col("doc_id") % 2 == eid), eid)
    ivf_path = f"file://{tmp_path}/ivf"
    ivf_index_build(spark, emb, ivf_path, full_dim=64, cell_dim=16, k=8, iters=2)

    got = hybrid_search_incremental(
        spark, bm25, ivf_path, qdf, n_seed_queries=3, pool=10, topk=5
    ).collect()

    # independent expectation from the two component rankings (the gate's
    # more-like-this contract: the seed excludes itself on both sides)
    lex = {
        (r.q_id, r.doc_id): r.rnk
        for r in bm25.search(qdf, topk=10, exclude_self=True).collect()
    }
    sem = {
        (r.q_id, r.cand_id): r.rnk
        for r in ivf_index_search(
            spark, ivf_path, n_queries=3, nprobe=2, topk=10
        ).collect()
    }
    import collections

    scores = collections.defaultdict(float)
    for (q, d), rk in lex.items():
        scores[(q, d)] += 1.0 / (RRF_C + rk)
    for (q, d), rk in sem.items():
        scores[(q, d)] += 1.0 / (RRF_C + rk)
    import math

    r6d = lambda x: math.floor(x * 1e6 + 0.5) / 1e6  # the gate's rounding # noqa: E731
    want = {}
    for q in {k[0] for k in scores}:
        ranked = sorted(
            ((d, r6d(s)) for (qq, d), s in scores.items() if qq == q),
            key=lambda x: (-x[1], x[0]),
        )[:5]
        for i, (d, s) in enumerate(ranked, 1):
            want[(q, d)] = (i, s)
    got_map = {
        (r.q_id, r.cand_id): (r.fused_rnk, r.rrf_score) for r in got
    }
    assert got_map == want
    # one-sided candidates must appear (full-outer fusion, not inner)
    assert any(
        (r.lex_rnk is None) != (r.sem_rnk is None) for r in got
    )
    # the seed never ranks itself (a result the batch gate cannot return)
    assert all(r.q_id != r.cand_id for r in got)


def test_bm25_store_epoch_split_property(spark, tmp_path):
    """Property: for ANY assignment of documents to epochs (including
    empty epochs) and ANY legal compaction point, the incremental store's
    scores equal the one-shot batch BM25 over the same corpus. Pins the
    invariant the epoch protocol exists for: HOW the corpus arrived can
    never change a score."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from engine_spark.datapipe.queries import BM25_QUERIES, bm25_scores, _topk_by
    from engine_spark.datapipe.retrieval_store import IncrementalBM25Index

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).filter(F.col("doc_id") < 40).cache()
    qdf = spark.createDataFrame(BM25_QUERIES, "q_id INT, term STRING")
    want = sorted(
        map(
            tuple,
            _topk_by(bm25_scores(docs, qdf), "q_id", "score", "doc_id", "rnk", 5)
            .select("q_id", "doc_id", "score", "rnk")
            .collect(),
        )
    )
    case = [0]

    @given(
        assign=st.lists(
            st.integers(min_value=0, max_value=3), min_size=40, max_size=40
        ),
        compact_at=st.one_of(st.none(), st.integers(min_value=0, max_value=2)),
    )
    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    def run(assign, compact_at):
        case[0] += 1
        idx = IncrementalBM25Index(
            spark, f"file://{tmp_path}/idx{case[0]}"
        )
        amap = {i: e for i, e in enumerate(assign)}
        mapping = F.create_map(
            *[F.lit(x) for kv in amap.items() for x in kv]
        )
        tagged = docs.withColumn("_e", mapping[F.col("doc_id")])
        for eid in range(4):
            idx.add_batch(tagged.filter(F.col("_e") == eid).drop("_e"), eid)
        if compact_at is not None:
            try:
                idx.compact(compact_at)
            except ValueError:
                pass  # nothing (or only one dir) below the watermark
        got = sorted(map(tuple, idx.search(qdf, topk=5).collect()))
        assert got == want

    run()
    docs.unpersist()


def test_bm25_store_out_of_order_ingest_and_phantom_watermark(spark, tmp_path):
    """A compaction watermark must name an ACTUALLY-INGESTED epoch, and an
    out-of-order ingest below the watermark of ids NOT in the merged set
    must still land — the sidecar's merged-id list, not mere id ordering,
    decides committed()."""
    import pytest as _pytest

    from engine_spark.datapipe.retrieval_store import IncrementalBM25Index

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).filter(F.col("doc_id") < 30)
    idx = IncrementalBM25Index(spark, f"file://{tmp_path}/idx")
    idx.add_batch(docs.filter(F.col("doc_id") % 3 == 1), 1)
    idx.add_batch(docs.filter(F.col("doc_id") % 3 == 2), 2)
    idx.add_batch(docs.filter(F.col("doc_id") >= 900), 4)  # empty epoch 4

    # phantom watermark: 3 was never ingested
    with _pytest.raises(ValueError, match="phantom|committed epoch"):
        idx.compact(3)

    assert idx.compact(2) == 2  # merges epochs 1, 2
    # epoch 0 is BELOW the watermark but was never ingested: it must not
    # read as committed, and its late ingest must land
    assert not idx.committed(0)
    assert idx.committed(1) and idx.committed(2)
    n_before, _ = idx.corpus_stats()
    idx.add_batch(docs.filter(F.col("doc_id") % 3 == 0), 0)
    n_after, _ = idx.corpus_stats()
    assert n_after == n_before + docs.filter(F.col("doc_id") % 3 == 0).count()


def test_ivf_index_rebuild_retires_stale_epochs(spark, tmp_path):
    """Rebuilding an IVF index on a path that has ingest epochs must
    RETIRE them: the old epochs were assigned under the old codebook, so
    unioning them into the new build would return wrong (and duplicate-id)
    search results with no error — ADVICE r10 regression."""
    from engine_spark.datapipe.ivf import (
        _ivf_index_vectors,
        ivf_index_add_batch,
        ivf_index_build,
        ivf_index_search,
        ivf_search,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = f"file://{tmp_path}/ivf_rebuild"
    ivf_index_build(
        spark, emb.filter(F.col("vec_id") % 2 == 0), path,
        full_dim=64, cell_dim=16, k=8, iters=2,
    )
    ivf_index_add_batch(spark, emb.filter(F.col("vec_id") % 2 == 1), path, 0)
    assert (tmp_path / "ivf_rebuild" / "epochs").exists()

    # rebuild on a DIFFERENT corpus: the stale epoch must be gone
    rebuild = emb.filter(F.col("vec_id") % 3 == 0)
    cents = ivf_index_build(
        spark, rebuild, path, full_dim=64, cell_dim=16, k=8, iters=2
    )
    assert not (tmp_path / "ivf_rebuild" / "epochs").exists()
    assert _ivf_index_vectors(spark, path).count() == rebuild.count()
    got = sorted(
        map(tuple, ivf_index_search(spark, path, n_queries=3, topk=3).collect())
    )
    live = ivf_search(
        rebuild, cents, full_dim=64, cell_dim=16, n_queries=3, nprobe=2, topk=3
    )
    assert got == sorted(map(tuple, live.collect()))


def test_bm25_store_bucket_count_persisted(spark, tmp_path):
    """The bucket modulus is part of the store's on-disk layout: a reopen
    must adopt the PERSISTED value (not the code constant), and an
    explicit contradicting value must fail loudly instead of silently
    pruning queries to the wrong partitions — ADVICE r10 regression."""
    import pytest as _pytest

    from engine_spark.datapipe.queries import BM25_QUERIES, BM25_TOPK
    from engine_spark.datapipe.retrieval_store import IncrementalBM25Index

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    qdf = spark.createDataFrame(BM25_QUERIES, "q_id INT, term STRING")
    state = f"file://{tmp_path}/bm25_nb"

    idx = IncrementalBM25Index(spark, state, n_buckets=7)
    idx.add_batch(docs, 0)
    want = sorted(map(tuple, idx.search(qdf, topk=BM25_TOPK).collect()))

    reopened = IncrementalBM25Index(spark, state)  # default constructor
    assert reopened.n_buckets == 7  # adopted from the sidecar, not N_BUCKETS
    assert sorted(map(tuple, reopened.search(qdf, topk=BM25_TOPK).collect())) == want

    with _pytest.raises(ValueError, match="n_buckets=7"):
        IncrementalBM25Index(spark, state, n_buckets=64)

    # scoring under a non-default modulus still matches the batch gate's
    # corpus-wide answer (bucketing is layout, not semantics)
    batch_idx = IncrementalBM25Index(spark, f"file://{tmp_path}/bm25_nb_ref")
    batch_idx.add_batch(docs, 0)
    assert sorted(map(tuple, batch_idx.search(qdf, topk=BM25_TOPK).collect())) == want


def test_publish_sweeps_stale_staging(spark, tmp_path):
    """A crash between a staging write and its rename leaves an orphaned
    copy under _staging forever; the next publish must sweep it (anything
    in _staging is by construction uncommitted) — ADVICE r10 regression."""
    from engine_spark.datapipe.retrieval_store import IncrementalBM25Index

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).filter(F.col("doc_id") < 20)
    idx = IncrementalBM25Index(spark, f"file://{tmp_path}/bm25_gc")
    orphan = tmp_path / "bm25_gc" / "_staging" / "e_dead"
    orphan.mkdir(parents=True)
    (orphan / "part-junk.parquet").write_bytes(b"\x00" * 16)

    idx.add_batch(docs, 0)
    staging = tmp_path / "bm25_gc" / "_staging"
    assert not staging.exists() or not any(staging.iterdir())
    assert idx.committed(0)


def test_bm25_store_search_concurrent_with_compaction(spark, tmp_path):
    """Deterministic interleave of the list-then-read race (VERDICT r9
    task #6): a search PLANS its scan from the epoch listing resolved at
    build time, then compaction renames underneath it before the scan
    EXECUTES. With vacuum=False the victims stay on disk, so

    - the in-flight search reads its intact pre-compaction snapshot and
      returns exactly the pre-compaction scores (compaction only
      re-groups postings, so the snapshots are bit-identical);
    - a listing AFTER the publish resolves to the compacted set (the -c
      dir shadows its victims even while they still exist);
    - vacuum() after the grace period removes exactly the shadowed dirs,
      and searches keep returning the same scores.
    """
    from engine_spark.datapipe.queries import BM25_QUERIES, BM25_TOPK
    from engine_spark.datapipe.retrieval_store import IncrementalBM25Index

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    qdf = spark.createDataFrame(BM25_QUERIES, "q_id INT, term STRING")
    idx = IncrementalBM25Index(spark, f"file://{tmp_path}/bm25_race")
    for eid in range(3):
        idx.add_batch(docs.filter(F.col("doc_id") % 3 == eid), eid)
    want = sorted(map(tuple, idx.search(qdf, topk=BM25_TOPK).collect()))

    # t0: the query resolves its listing (lazy plan pins the victim paths)
    in_flight = idx.search(qdf, topk=BM25_TOPK)
    assert [eid for eid, _ in idx._epochs()] == [0, 1, 2]

    # t1: compaction publishes the -c dir; victims stay (deferred vacuum)
    assert idx.compact(1, vacuum=False) == 2
    assert (tmp_path / "bm25_race" / "postings" / "epoch-0000000000").exists()
    assert [eid for eid, _ in idx._epochs()] == [1, 2]  # shadowed already

    # t2: the in-flight query executes AFTER the rename — snapshot intact
    assert sorted(map(tuple, in_flight.collect())) == want
    # a fresh search (post-publish listing) agrees
    assert sorted(map(tuple, idx.search(qdf, topk=BM25_TOPK).collect())) == want

    # t3: grace over — vacuum reclaims exactly the two shadowed epochs
    assert idx.vacuum() == 2
    assert not (tmp_path / "bm25_race" / "postings" / "epoch-0000000000").exists()
    assert not (tmp_path / "bm25_race" / "postings" / "epoch-0000000001").exists()
    assert idx.vacuum() == 0  # idempotent
    assert sorted(map(tuple, idx.search(qdf, topk=BM25_TOPK).collect())) == want

    # vacuum also reclaims a stale lower -c dir a crashed compaction left
    idx.add_batch(docs.filter(F.lit(False)), 3)
    assert idx.compact(2, vacuum=False) == 2  # merges epoch-1-c + epoch-2
    assert idx.vacuum() == 2
    assert [eid for eid, _ in idx._epochs()] == [2, 3]
    assert sorted(map(tuple, idx.search(qdf, topk=BM25_TOPK).collect())) == want


def test_ivf_store_compaction_snapshot_isolation(spark, tmp_path):
    """IVF ingest-epoch compaction (VERDICT r10 task #1) under the same
    deterministic list-then-read interleave as the BM25 store: a search
    PLANS its scan from the epoch listing resolved at build time, then
    compaction publishes the -c dir underneath it before the scan
    EXECUTES. With vacuum=False the victims stay on disk, so

    - the in-flight search reads its intact pre-compaction snapshot and
      returns bit-equal results (compaction only re-groups vectors);
    - a listing AFTER the publish resolves to the compacted set (the -c
      dir shadows its victims even while they still exist — reading
      both would DUPLICATE top-k candidates);
    - ivf_index_vacuum() after the grace period removes exactly the
      shadowed dirs, and searches keep returning the same results;
    - a replay of a compacted-away epoch stays a no-op (committed()
      proves it from the sidecar's merged-id set).
    """
    from engine_spark.datapipe.ivf import (
        _ivf_index_vectors,
        ivf_index_add_batch,
        ivf_index_build,
        ivf_index_compact,
        ivf_index_search,
        ivf_index_vacuum,
        ivf_search,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = f"file://{tmp_path}/ivf_compact"
    cents = ivf_index_build(
        spark, emb.filter(F.col("vec_id") % 4 == 0), path,
        full_dim=64, cell_dim=16, k=8, iters=2,
    )
    for eid in range(3):  # three ingest epochs: residues 1, 2, 3
        ivf_index_add_batch(
            spark, emb.filter(F.col("vec_id") % 4 == eid + 1), path, eid
        )
    want = sorted(
        map(tuple, ivf_index_search(spark, path, n_queries=5, topk=3).collect())
    )
    # the store answer is the LIVE answer over the union corpus (parity
    # anchor: compaction must preserve exactly this)
    live = ivf_search(
        emb, cents, full_dim=64, cell_dim=16, n_queries=5, nprobe=2, topk=3
    )
    assert want == sorted(map(tuple, live.collect()))

    # t0: an in-flight query resolves its listing (lazy plan pins paths)
    in_flight = ivf_index_search(spark, path, n_queries=5, topk=3)

    # t1: compaction publishes epoch-1-c; victims stay (deferred vacuum)
    assert ivf_index_compact(spark, path, 1, vacuum=False) == 2
    ep = tmp_path / "ivf_compact" / "epochs"
    assert (ep / "epoch-0000000000").exists()  # victim still on disk
    assert (ep / "epoch-0000000001-c").exists()
    # shadow resolution: canonical row count equals the full corpus (no
    # double-counting of the still-present victims)
    assert _ivf_index_vectors(spark, path).count() == emb.count()

    # t2: the in-flight query executes AFTER the publish — snapshot intact
    assert sorted(map(tuple, in_flight.collect())) == want
    # a fresh search (post-publish listing) agrees bit-for-bit
    assert sorted(
        map(tuple, ivf_index_search(spark, path, n_queries=5, topk=3).collect())
    ) == want

    # replay of a merged-away epoch: committed() proves it from the
    # sidecar, so the ingest is a no-op (no duplicate vectors)
    ivf_index_add_batch(spark, emb.filter(F.col("vec_id") % 4 == 1), path, 0)
    assert _ivf_index_vectors(spark, path).count() == emb.count()

    # t3: grace over — vacuum reclaims exactly the two shadowed epochs
    assert ivf_index_vacuum(spark, path) == 2
    assert not (ep / "epoch-0000000000").exists()
    assert not (ep / "epoch-0000000001").exists()
    assert ivf_index_vacuum(spark, path) == 0  # idempotent
    assert sorted(
        map(tuple, ivf_index_search(spark, path, n_queries=5, topk=3).collect())
    ) == want

    # watermark validation shares the BM25 store's distinguishable errors
    import pytest as _pytest

    with _pytest.raises(ValueError, match="strictly below"):
        ivf_index_compact(spark, path, 2)  # newest epoch: still replayable
    with _pytest.raises(ValueError, match="already compacted"):
        ivf_index_compact(spark, path, 1)  # stale watermark
    # a later compaction folds the -c dir + epoch 2 together; vacuum
    # reclaims the stale lower -c dir and searches still agree
    ivf_index_add_batch(spark, emb.filter(F.lit(False)), path, 3)  # empty
    assert ivf_index_compact(spark, path, 2, vacuum=False) == 2
    assert ivf_index_vacuum(spark, path) == 2
    assert sorted(
        map(tuple, ivf_index_search(spark, path, n_queries=5, topk=3).collect())
    ) == want


def test_simhash_pairs_cap_and_pigeonhole_recall(spark):
    """simhash_pairs over synthetic 56-bit signatures: (a) hamming ≤ 3
    is ALWAYS found — 4 chunks and d ≤ 3 pigeonhole a clean chunk even
    when the flipped bits span three different chunks; (b) a bucket
    larger than the cap is excluded from candidate generation entirely
    (its pairs are exact-dedup's job), and the cap is what bounds the
    self-join at scale."""
    from engine_spark.datapipe.queries import simhash_pairs

    base = 0x00A5_5A3C_C369_9CF3  # arbitrary 56-bit pattern
    rows = [
        (0, base),
        (1, base ^ (1 << 2) ^ (1 << 17) ^ (1 << 31)),  # d=3 across chunks 0,1,2
        (2, base ^ (1 << 2) ^ (1 << 17) ^ (1 << 31) ^ (1 << 45)),  # d=4 from 0
    ]
    s = spark.createDataFrame(rows, "doc_id long, sim long")
    out = simhash_pairs(s).collect()
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in out}
    assert got[(0, 1)] == 3          # clean chunk 3 blocked them together
    assert (0, 2) not in got         # hamming 4 > threshold
    assert got[(1, 2)] == 1          # single-bit flip

    # cap: 5 identical signatures in one bucket, cap=4 -> no pairs at all;
    # raising the cap restores the 10 within-cluster pairs
    clus = spark.createDataFrame(
        [(i, base) for i in range(5)], "doc_id long, sim long"
    )
    assert simhash_pairs(clus, cap=4).count() == 0
    assert simhash_pairs(clus, cap=5).count() == 10


def test_simhash_dropped_buckets_reports_the_capped_cluster(spark, tmp_path):
    """simhash_dropped_buckets surfaces every (chunk, value) bucket the
    df-cap excluded, with its size — the 100 TB run's drop log."""
    from engine_spark.datapipe.queries import simhash_dropped_buckets

    d = spark.createDataFrame(
        [(i, "same boilerplate text repeated") for i in range(6)]
        + [(100, "a genuinely different document body")],
        "doc_id long, text string",
    )
    sf = tmp_path / "sf"
    d.write.parquet(str(sf / "documents.parquet"))
    dropped = simhash_dropped_buckets(spark, str(sf), cap=5).collect()
    # the 6-doc identical cluster occupies one bucket per chunk
    assert len(dropped) == 4
    assert all(r["bucket_size"] == 6 for r in dropped)
    assert sorted(r["c"] for r in dropped) == [0, 1, 2, 3]


def _write_embeddings(spark, tmp_path, rows):
    sf = tmp_path / "sf"
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(str(sf / "embeddings.parquet"))
    return str(sf)


def test_embedding_bucket_cap_excludes_mass_duplicate_cluster(spark, tmp_path):
    """A duplicated-embedding cluster larger than EMB_BUCKET_CAP is excluded
    from BOTH blockings of dedup_embedding_cosine (its pairs are exact-hash
    dedup's job — the cap is what bounds the self-join at 100 TB), while
    under-cap genuine near-dups still pair. embedding_dropped_buckets
    reports what was dropped, tagged by blocking kind."""
    import engine_spark.datapipe.queries as DQ

    def vec(seed_vals):
        return [float(v) for v in seed_vals]

    # 140 byte-identical vectors (one LSH bucket per table, one sem cell)
    # + 2 genuine near-dups elsewhere in space
    dup = vec([1.0] * 16 + [0.0] * 48)
    a = vec([-1.0] * 8 + [1.0] * 8 + [0.25] * 48)
    b = vec([-1.0] * 8 + [1.0] * 8 + [0.26] * 48)
    rows = [(i, dup, 0) for i in range(140)] + [(500, a, 1), (501, b, 1)]
    sf = _write_embeddings(spark, tmp_path, rows)

    out = DQ.q_dedup_embedding_cosine(spark, sf)
    pairs = {(r["mode"], r["vec_a"], r["vec_b"]) for r in out.collect()}
    # the 140-clone cluster would contribute 140*139/2 = 9730 pairs per
    # mode; the cap (128) drops the whole bucket in both blockings
    assert not any(va < 140 and vb < 140 for _, va, vb in pairs)
    # the under-cap genuine near-dup still pairs in neardup mode
    assert ("neardup", 500, 501) in pairs

    dropped = {
        (r["kind"], r["bucket_size"])
        for r in DQ.embedding_dropped_buckets(spark, sf).collect()
    }
    # one over-cap bucket in each of the 8 LSH tables + one sem cell
    assert ("lsh", 140) in dropped and ("sem", 140) in dropped
    assert all(sz == 140 for _, sz in dropped)


def test_embedding_arrow_bucket_cap_matches_fold_cap(spark, tmp_path):
    """The Arrow twin applies the SAME occupancy cap: over-cap buckets drop,
    under-cap pairs survive, and a raised cap restores the cluster pairs."""
    from engine_spark.datapipe.queries import (
        COSINE_T, LSH_PROJ_DIM, PLANES, SP, _vecd,
    )
    from engine_spark.datapipe.vector import dedup_embedding_cosine_arrow
    from engine_spark.catalog import Catalog

    dup = [1.0] * 16 + [0.0] * 48
    a = [-1.0] * 8 + [1.0] * 8 + [0.25] * 48
    b = [-1.0] * 8 + [1.0] * 8 + [0.26] * 48
    rows = [(i, [float(x) for x in dup], 0) for i in range(10)] + [
        (500, [float(x) for x in a], 1),
        (501, [float(x) for x in b], 1),
    ]
    sf = _write_embeddings(spark, tmp_path, rows)
    vecs = Catalog(spark, sf)["embeddings"].select(
        "vec_id", F.expr(_vecd(Dialect("spark"))).alias("vd")
    )
    capped = dedup_embedding_cosine_arrow(
        vecs, PLANES, LSH_PROJ_DIM, COSINE_T, bucket_cap=8
    )
    got = {(r["vec_a"], r["vec_b"]) for r in capped.collect()}
    assert got == {(500, 501)}  # 10-clone bucket > cap=8: dropped
    uncapped = dedup_embedding_cosine_arrow(
        vecs, PLANES, LSH_PROJ_DIM, COSINE_T, bucket_cap=128
    )
    assert uncapped.count() == 10 * 9 // 2 + 1


def test_embedding_pairs_scales_bits_with_corpus(spark, tmp_path):
    """The production entry point derives the LSH table width from the
    corpus size (lsh_bits_for: expected occupancy ~32, clamped 8..24), so
    the bucket cap stays a skew guard rather than a capacity limit; an
    explicit bits= matches the derived path exactly."""
    from engine_spark.catalog import Catalog
    from engine_spark.datapipe.vector import embedding_pairs, lsh_bits_for

    assert lsh_bits_for(2_000) == 8           # floor: the gate's width
    assert lsh_bits_for(2_000_000) == 16      # ceil(log2(2e6 / 32))
    assert lsh_bits_for(2_000_000_000) == 24  # clamped ceiling
    assert lsh_bits_for(0) == 8

    a = [-1.0] * 8 + [1.0] * 8 + [0.25] * 48
    b = [-1.0] * 8 + [1.0] * 8 + [0.26] * 48
    rows = [(500, [float(x) for x in a], 1), (501, [float(x) for x in b], 1)] + [
        (i, [float((-1) ** (i + j) * (1 + (i * 7 + j) % 5)) for j in range(64)], 0)
        for i in range(40)
    ]
    sf = _write_embeddings(spark, tmp_path, rows)
    vecs = Catalog(spark, sf)["embeddings"].select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("vd")
    )
    auto = {(r["vec_a"], r["vec_b"]) for r in embedding_pairs(vecs).collect()}
    explicit = {
        (r["vec_a"], r["vec_b"])
        for r in embedding_pairs(vecs, bits=8).collect()
    }
    assert (500, 501) in auto
    assert auto == explicit  # 42 vectors -> derived bits = the 8-bit floor


def test_exact_substr_cuts_cross_doc_spans(spark):
    """A run duplicated across two docs yields a removal span in EACH doc
    covering exactly the duplicated token range; unrelated docs get none."""
    from engine_spark.datapipe.spans import exact_substr_cuts

    d = spark.createDataFrame(
        [
            (1, "u1 u2 a b c d e u3 u4"),   # run at token positions 3..7
            (2, "v1 a b c d e v2 v3"),      # run at token positions 2..6
            (3, "w1 w2 w3 w4 w5 w6 w7 w8"), # no duplicated 3-gram anywhere
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: (r.span_start, r.span_end)
        for r in exact_substr_cuts(d, k=3).collect()
    }
    assert out == {1: (3, 7), 2: (2, 6)}


def test_exact_substr_cuts_within_doc_repeat_two_islands(spark):
    """A phrase repeated WITHIN one doc is cut at both occurrences, and the
    two marks stay separate spans when farther than k apart."""
    from engine_spark.datapipe.spans import exact_substr_cuts

    d = spark.createDataFrame(
        [(7, "p q r s x1 x2 x3 p q r s")],  # p q r s at pos 1..4 and 8..11
        "doc_id long, text string",
    )
    rows = sorted(
        (r.span_start, r.span_end) for r in exact_substr_cuts(d, k=3).collect()
    )
    assert rows == [(1, 4), (8, 11)]


def test_exact_substr_cuts_nearby_marks_merge(spark):
    """Duplicated windows within k positions of each other merge into ONE
    maximal span (the gaps-and-islands distance threshold, not step-1)."""
    from engine_spark.datapipe.spans import exact_substr_cuts

    # doc 1/2 share "a b c" (pos 1..3 in doc 1) and "d e f" (pos 5..7):
    # marks at pos 1 and 5, distance 4 > k=3 would split; with the gram
    # windows [1,3] and [5,7] separated by ONE token, distance 5-1=4 > 3
    # -> two spans; make them distance 3 apart instead to force the merge
    d = spark.createDataFrame(
        [
            (1, "a b c m d e f"),   # marks at 1 and 5 -> gap 4 > 3: split
            (2, "z1 a b c z2 z3 z4 d e f"),
            (3, "a b c d e f q1"),  # marks at 1,2,3,4 -> one span [1,6]
            (4, "y1 y2 a b c d e f"),
        ],
        "doc_id long, text string",
    )
    got = {}
    for r in exact_substr_cuts(d, k=3).collect():
        got.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    assert sorted(got[1]) == [(1, 3), (5, 7)]
    assert sorted(got[3]) == [(1, 6)]


def test_incremental_exact_substr_retro_and_parity(spark, tmp_path):
    """Streaming ExactSubstr: a gram unique in epoch 0 that reappears in
    epoch 1 cuts BOTH occurrences (the stored first one retroactively);
    and the union of all epochs' marks merges to exactly the spans the
    batch pass computes on the full corpus."""
    from engine_spark.datapipe.spans import (
        IncrementalExactSubstr,
        exact_substr_cuts,
        merge_marks_to_spans,
    )

    epochs = [
        [(1, "u1 u2 a b c u3 u4"), (2, "w1 w2 w3 w4 w5")],   # "a b c" unique
        [(3, "v1 a b c v2 v3")],                             # second occurrence
        [(4, "a b c x1 a b c")],                             # third + in-batch
    ]
    inc = IncrementalExactSubstr(spark, str(tmp_path / "st"), k=3)
    all_marks = []
    per_epoch = []
    for eid, rows in enumerate(epochs):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        marks = inc.process_batch(df, eid).collect()
        per_epoch.append(marks)
        all_marks.extend(marks)

    # epoch 0: nothing duplicated yet
    assert per_epoch[0] == []
    # epoch 1: doc 3's position cut + doc 1's RETRO cut at pos 3
    e1 = sorted((r.doc_id, r.pos, r.retro) for r in per_epoch[1])
    assert e1 == [(1, 3, True), (3, 2, False)]
    # epoch 2: both in-batch occurrences cut, nothing retro (count was 2)
    e2 = sorted((r.doc_id, r.pos, r.retro) for r in per_epoch[2])
    assert e2 == [(4, 1, False), (4, 5, False)]

    # crash replay of a committed epoch: same marks, no state growth
    df1 = spark.createDataFrame(epochs[1], "doc_id long, text string")
    replay = sorted(
        (r.doc_id, r.pos, r.retro)
        for r in inc.process_batch(df1, 1).collect()
    )
    assert replay == e1

    # parity: merged incremental marks == batch spans on the full corpus
    full = spark.createDataFrame(
        [r for ep in epochs for r in ep], "doc_id long, text string"
    )
    batch_spans = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in exact_substr_cuts(full, k=3).collect()
    )
    marks_df = spark.createDataFrame(
        [(r.doc_id, r.pos) for r in all_marks], "doc_id long, pos int"
    )
    inc_spans = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in merge_marks_to_spans(marks_df, k=3).collect()
    )
    assert inc_spans == batch_spans

def test_capped_blockings_are_semi_joins_not_windows(spark):
    """r13 optimization guard: the occupancy caps of the simhash and
    embedding blockings must stay groupBy-count + semi-join (a count()
    window partitioned by the bucket key funnels a mass-duplicate
    corpus's hot bucket through ONE unsplittable task before the filter
    drops it, and AQE skew handling applies to joins only)."""
    import io
    from contextlib import redirect_stdout

    from engine_spark.datapipe.queries import PLANES, simhash_pairs
    from engine_spark.datapipe.vector import dedup_embedding_cosine_arrow

    def plan_of(df):
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    s = spark.createDataFrame(
        [(i, (i * 7919) % (1 << 56)) for i in range(8)],
        "doc_id long, sim long",
    )
    p1 = plan_of(simhash_pairs(s))
    assert "Window" not in p1
    assert "LeftSemi" in p1

    vecs = spark.createDataFrame(
        [(i, [float(i % 3), 1.0] * 8) for i in range(8)],
        "vec_id long, vd array<double>",
    )
    p2 = plan_of(dedup_embedding_cosine_arrow(vecs, PLANES, 16, 0.8))
    assert "Window" not in p2
    assert "LeftSemi" in p2


def test_huff_lut_vectorized_matches_per_entry_reference():
    """r13 s4: the numpy-slice LUT build must equal the original
    per-entry loop for the Annex K tables, and the DHT memo must return
    value-identical tables keyed by the raw definition."""
    from engine_spark.datapipe import jpeg as J

    def reference(codes):
        lut = [0] * 65536
        for (ln, code), sym in codes.items():
            base = code << (16 - ln)
            val = (ln << 8) | sym
            for i in range(1 << (16 - ln)):
                lut[base + i] = val
        return lut

    for bits, vals in (J._DC_LUM, J._AC_LUM, J._DC_CHR, J._AC_CHR):
        codes = J._canonical_codes(list(bits), list(vals))
        assert J._huff_lut(codes) == reference(codes)
        raw = bytes(bits) + bytes(vals)
        first = J._huff_lut_cached(raw, codes)
        again = J._huff_lut_cached(raw, codes)
        assert first is again  # memo hit: same object, no rebuild
        assert first == reference(codes)


def test_progressive_jpeg_decode_stable_across_memo(tmp_path):
    """Decoding the same progressive JPEG twice (cold + memoized LUTs)
    must produce identical pixels; a custom-table file must not collide
    with the memoized Annex K entries."""
    import numpy as np

    from engine_spark.datapipe import jpeg as J

    arr = np.empty((12, 20, 3), np.uint8)
    arr[:, :] = (200, 30, 90)
    payload = J.encode_jpeg(arr, quality=100, subsample=True,
                            progressive=True)
    J._DHT_LUT_CACHE.clear()
    cold = J.decode_jpeg(payload)
    warm = J.decode_jpeg(payload)
    assert (cold == warm).all()
    assert (cold == arr).all()

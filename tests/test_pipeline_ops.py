"""Tests for the training-data pipeline operators: dedup families,
similarity search, text analysis, multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from tdigest_spark import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMALL}/documents.parquet").cache()


@pytest.fixture(scope="module")
def docs_with_dups(spark, docs):
    """documents plus an exact copy (+1M ids) and a mutated copy (+2M)."""
    copies = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    mutated = docs.select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.concat("text", F.lit(" zzz")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    return docs.unionByName(copies).unionByName(mutated).cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMALL}/embeddings.parquet").cache()


# ----------------------------------------------------------------------
# exact dedup
# ----------------------------------------------------------------------
def test_exact_dup_pairs(docs, docs_with_dups):
    n = docs.count()
    pairs = dedup.exact_dup_pairs(docs_with_dups, "doc_id", "text").collect()
    assert len(pairs) == n  # each original pairs with its +1M copy only
    for r in pairs:
        assert r["dup_id"] == r["keep_id"] + 1_000_000


def test_exact_dedup_keeps_one(docs, docs_with_dups):
    n = docs.count()
    kept = dedup.exact_dedup(docs_with_dups, "doc_id", "text")
    assert kept.count() == 2 * n  # originals + mutated, copies dropped
    assert kept.filter(
        (F.col("doc_id") >= 1_000_000) & (F.col("doc_id") < 2_000_000)
    ).count() == 0


# ----------------------------------------------------------------------
# MinHash + LSH
# ----------------------------------------------------------------------
def test_minhash_lsh_finds_near_dups(docs, docs_with_dups):
    n = docs.count()
    sigs = dedup.minhash_signatures(docs_with_dups, "doc_id", "text")
    cands = dedup.lsh_candidate_pairs(sigs, "doc_id", bands=32).cache()
    # exact copies: signature identical → all bands collide
    exact_pairs = cands.filter(F.col("id_b") - F.col("id_a") == 1_000_000).filter(
        F.col("id_a") < 1_000_000
    )
    assert exact_pairs.count() == n
    # mutated copies (' zzz' appended): Jaccard ≈ 0.95+ → caught
    near_pairs = cands.filter(F.col("id_b") - F.col("id_a") == 2_000_000).filter(
        F.col("id_a") < 1_000_000
    )
    assert near_pairs.count() >= int(0.98 * n)


def test_minhash_jaccard_estimate_close_to_exact(docs_with_dups, spark):
    sigs = dedup.minhash_signatures(docs_with_dups, "doc_id", "text")
    a = sigs.filter(F.col("doc_id") < 1_000_000)
    b = sigs.filter(
        (F.col("doc_id") >= 2_000_000)
    ).select((F.col("doc_id") - 2_000_000).alias("doc_id"), F.col("minhash").alias("mh_b"))
    joined = a.join(b, "doc_id").select(
        "doc_id", dedup.minhash_jaccard_estimate("minhash", "mh_b").alias("est")
    )
    texts = {r["doc_id"]: r["text"] for r in
             spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()}
    got = {r["doc_id"]: r["est"] for r in joined.collect()}
    # spot-check 20 docs against exact shingle jaccard
    for did in list(got)[:20]:
        ta = texts[did]
        ha = dedup._shingle_hashes(ta, 5)
        hb = dedup._shingle_hashes(ta + " zzz", 5)
        inter = np.intersect1d(ha, hb).size
        exact = inter / (ha.size + hb.size - inter)
        assert abs(got[did] - exact) < 0.15  # 128 hashes → σ≈0.04
    assert np.mean(list(got.values())) > 0.85


def test_ngram_jaccard_exact(spark):
    df = spark.createDataFrame(
        [("abcdefghij", "abcdefghij"), ("abcdefghij", "zzzzzzzzzz")],
        ["a", "b"],
    )
    res = df.select(dedup.ngram_jaccard("a", "b", k=3).alias("j")).collect()
    assert res[0]["j"] == 1.0
    assert res[1]["j"] == 0.0


# ----------------------------------------------------------------------
# SimHash
# ----------------------------------------------------------------------
def test_simhash_identical_and_near(docs, docs_with_dups):
    n = docs.count()
    sh = docs_with_dups.select("doc_id", dedup.simhash64(F.col("text")).alias("sh"))
    cands = dedup.simhash_candidate_pairs(sh, "doc_id", "sh", n_chunks=8).cache()
    # identical text → hamming 0, must be found
    zero = cands.filter(
        (F.col("id_b") - F.col("id_a") == 1_000_000) & (F.col("hamming") == 0)
    ).filter(F.col("id_a") < 1_000_000)
    assert zero.count() == n
    # pigeonhole guarantee: with 8 chunks, EVERY original↔mutated pair
    # whose true hamming distance is <= 7 must appear as a candidate
    # (<= 7 differing bits cannot touch all 8 chunks).  Computing the
    # truth set directly makes this a real near-dup assertion — the n
    # identical-copy pairs alone must not satisfy it.
    orig = sh.filter(F.col("doc_id") < 1_000_000).select(
        F.col("doc_id").alias("o_id"), F.col("sh").alias("sh_o")
    )
    mut = sh.filter(F.col("doc_id") >= 2_000_000).select(
        (F.col("doc_id") - 2_000_000).alias("o_id"),
        F.col("doc_id").alias("m_id"),
        F.col("sh").alias("sh_m"),
    )
    truth = (
        orig.join(mut, "o_id")
        .select("o_id", "m_id", dedup.hamming64("sh_o", "sh_m").alias("h"))
        .filter(F.col("h") <= 7)
    )
    n_true_near = truth.count()
    assert n_true_near > 0  # fixture must exercise the near-dup path
    missing = truth.join(
        cands.select(F.col("id_a").alias("o_id"), F.col("id_b").alias("m_id")),
        ["o_id", "m_id"],
        "left_anti",
    ).count()
    assert missing == 0, f"{missing}/{n_true_near} near pairs missed"


def test_hamming64(spark):
    df = spark.createDataFrame([(0, 255), (-1, 0), (5, 5)], ["a", "b"])
    res = df.select(dedup.hamming64("a", "b").alias("h")).collect()
    assert [r["h"] for r in res] == [8, 64, 0]


# ----------------------------------------------------------------------
# similarity search
# ----------------------------------------------------------------------
def test_cosine_topk_matches_numpy(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    queries = [(int(ids[i]), X[i].tolist()) for i in range(5)]
    res = similarity.cosine_topk(emb, "vec_id", "embedding", queries, k=5).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
    for qi in range(5):
        sims = Xn[qi] @ Xn.T
        expect = ids[np.argsort(-sims)[:5]].tolist()
        got = [nid for _, nid in sorted(by_q[int(ids[qi])])]
        assert got == expect


def test_cosine_pairs_above(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = Xn @ Xn.T
    iu = np.triu_indices_from(S, 1)
    expect = {
        (int(ids[i]), int(ids[j]))
        for i, j in zip(*iu)
        if S[i, j] >= 0.4
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_pairs_above(emb, "vec_id", "embedding", 0.4).collect()
    }
    assert got == expect


def test_rp_lsh_recall(emb):
    """LSH candidates must cover most truly-similar pairs."""
    # cos>=0.4 → θ≈66° → per-bit collision 0.63; 4-bit tables give
    # per-table 0.159 → 1-(1-0.159)^16 ≈ 0.94 expected recall
    buckets = similarity.rp_lsh_buckets(
        emb, "vec_id", "embedding", dim=64, n_tables=16, n_bits=4
    )
    cands = similarity.rp_lsh_candidate_pairs(buckets, "vec_id")
    cand_set = {(r["id_a"], r["id_b"]) for r in cands.collect()}
    true_pairs = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_pairs_above(emb, "vec_id", "embedding", 0.4).collect()
    }
    if true_pairs:
        recall = len(true_pairs & cand_set) / len(true_pairs)
        assert recall >= 0.8, (recall, len(true_pairs), len(cand_set))


# ----------------------------------------------------------------------
# text analysis
# ----------------------------------------------------------------------
def test_token_counts(spark):
    df = spark.createDataFrame(
        [("a b  c",), ("",), ("   ",), ("one",), ("x y z w!",)], ["t"]
    )
    res = df.select(
        text.token_count(F.col("t")).alias("n"),
        text.bpe_ish_token_count(F.col("t")).alias("b"),
    ).collect()
    assert [r["n"] for r in res] == [3, 0, 0, 1, 4]
    assert res[4]["b"] == 5  # x, y, z, w, !


def test_quality(docs):
    passed = docs.select(text.quality_pass(F.col("text")).alias("p"))
    frac = passed.filter("p").count() / docs.count()
    assert 0.5 < frac <= 1.0  # synthetic docs are mostly clean prose-ish


def test_lang_id_on_synthetic_multilingual(spark):
    samples = [
        (1, "the cat sat on the mat and it was happy with all of this", "en"),
        (2, "der hund und die katze sind in dem haus mit einer maus", "de"),
        (3, "le chat est dans la maison avec un chien et il ne dort pas", "fr"),
        (4, "el perro y el gato están en la casa con un ratón muy pequeño", "es"),
        (5, "o cachorro e o gato estão em uma casa com um rato pequeno", "pt"),
        (6, "de hond en de kat zijn in het huis met een muis en ze slapen", "nl"),
        (7, "il cane e il gatto sono in una casa con un topo che dorme", "it"),
        (8, "这是一个中文句子没有空格也可以检测出来", "zh"),
    ]
    df = spark.createDataFrame(samples, ["id", "txt", "expected"])
    res = text.lang_id(df, "txt", "id").select("id", "expected", "lang_pred").collect()
    correct = sum(1 for r in res if r["lang_pred"] == r["expected"])
    assert correct == len(samples), [(r["expected"], r["lang_pred"]) for r in res]


def test_fingerprints(docs, docs_with_dups, spark):
    fp = docs_with_dups.select(
        "doc_id", text.content_fingerprint(F.col("text")).alias("fp")
    )
    a = fp.filter(F.col("doc_id") < 1_000_000).select(
        "doc_id", F.col("fp").alias("fp_a")
    )
    b = fp.filter(
        (F.col("doc_id") >= 1_000_000) & (F.col("doc_id") < 2_000_000)
    ).select((F.col("doc_id") - 1_000_000).alias("doc_id"), F.col("fp").alias("fp_b"))
    j = a.join(b, "doc_id")
    assert j.filter(F.col("fp_a") != F.col("fp_b")).count() == 0
    # winnowing: identical docs → identical fingerprint arrays
    wf = docs.limit(20).select(
        "doc_id", text.winnow_fingerprints(F.col("text")).alias("w")
    ).collect()
    assert all(len(r["w"]) > 0 for r in wf)
    wf2 = docs.limit(20).select(
        "doc_id", text.winnow_fingerprints(F.col("text")).alias("w")
    ).collect()
    assert {r["doc_id"]: r["w"] for r in wf} == {r["doc_id"]: r["w"] for r in wf2}


def test_minhash_word_shingles(spark):
    """Word-gram shingle mode: identical docs share signatures, a
    one-word edit stays similar, disjoint-vocabulary docs share
    nothing, short docs fall back to a whole-text hash that still
    distinguishes distinct texts, NULL stays NULL."""
    import numpy as np

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 20
    rows = [
        (1, base),
        (2, base),
        (3, base.replace("zeta", "zzz", 1)),
        (4, "totally different words here nothing shared with others " * 20),
        (5, "tiny doc"),
        (6, "tiny doc"),
        (7, "other tiny"),
        (8, None),
        (9, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    sig_df = dedup.minhash_signatures(df, "doc_id", "text", shingle_unit="word")
    m = {r["doc_id"]: r["minhash"] for r in sig_df.collect()}
    assert m[1] == m[2]
    sim13 = np.mean(np.array(m[1]) == np.array(m[3]))
    sim14 = np.mean(np.array(m[1]) == np.array(m[4]))
    assert sim13 > 0.5 and sim14 < 0.1
    assert m[5] == m[6] and m[5] != m[7]
    assert m[8] is None and m[9] is not None
    ps = {
        (r["id_a"], r["id_b"])
        for r in dedup.lsh_candidate_pairs(sig_df, "doc_id").collect()
    }
    assert {(1, 2), (1, 3), (5, 6)} <= ps
    assert not any(4 in p for p in ps)
    with pytest.raises(ValueError):
        dedup.minhash_signatures(df, "doc_id", "text", shingle_unit="byte")


def test_remove_duplicate_ngrams(spark):
    """A passage shared by two docs vanishes from both; unique prose
    survives; fully-duplicated and blank docs come back empty but
    present (1:1 with the corpus)."""
    boiler = "please accept our cookie policy before you continue reading"
    rows = [
        (1, f"alpha beta gamma delta epsilon zeta {boiler} eta theta iota kappa lambda"),
        (2, f"{boiler} one two three four five six seven"),
        (3, boiler),  # nothing but the duplicated span
        (4, "completely unique sentence with no repeats at all here ok"),
        (5, ""),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: r
        for r in dedup.remove_duplicate_ngrams(df, "doc_id", "text", n=5).collect()
    }
    assert got[1]["clean_text"] == (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda"
    )
    assert got[2]["clean_text"] == "one two three four five six seven"
    assert got[3]["clean_text"] == "" and got[3]["n_removed"] == 9
    assert got[4]["clean_text"] == rows[3][1] and got[4]["n_removed"] == 0
    assert got[5]["clean_text"] == "" and got[5]["n_tokens"] == 0
    assert len(got) == 5


def test_remove_duplicate_ngrams_releases_cache(spark):
    """Looped calls with ``persist_handle`` must not accrue storage:
    the internal starts cache is released by the caller after
    materialization, so persistent-RDD count returns to baseline
    (without the handle it only drops when driver GC happens to run)."""
    rows = [
        (1, "shared shared shared shared shared tail one two three"),
        (2, "shared shared shared shared shared other four five six"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    jsc = spark.sparkContext._jsc.sc()
    baseline = jsc.getPersistentRDDs().size()
    for _ in range(10):
        handle: list = []
        out = dedup.remove_duplicate_ngrams(
            df, "doc_id", "text", n=5, persist_handle=handle
        ).collect()
        assert len(out) == 2
        assert handle, "persist_handle not populated"
        for h in handle:
            h.unpersist(blocking=True)
    assert jsc.getPersistentRDDs().size() <= baseline


def test_winnow_batch_matches_reference():
    """The chunked cross-document batch winnowing must reproduce the
    per-document reference exactly — including empty docs, docs shorter
    than k, docs with <= window grams, None, and chunk boundaries."""
    import random

    from tdigest_spark.text import _winnow_batch, _winnow_one

    rng = random.Random(7)
    words = ["the", "cat", "dog", "web", "page", "crawl", "dedup", "x"]
    docs = [
        " ".join(rng.choice(words) for _ in range(n))
        for n in (rng.choice([0, 1, 3, 5, 8, 20, 60, 300, 1500]) for _ in range(300))
    ]
    docs += [None, "", "ab", "abcdefgh", "abcdefghi", "a" * 7, "a" * 8, "a" * 25]
    for k, w in [(8, 16), (4, 4), (2, 1), (5, 20)]:
        bufs = [
            None if t is None else np.frombuffer(t.lower().encode(), dtype=np.uint8)
            for t in docs
        ]
        got = _winnow_batch(bufs, k, w)
        want = [None if t is None else _winnow_one(t, k, w) for t in docs]
        assert got == want, (k, w)


def test_winnow_spark_path_non_ascii(spark):
    """The production path lowercases JVM-side (F.lower) while the
    documented per-doc reference lowercases with Python str.lower() —
    drive the REAL Spark column path on case-mapping hazard samples
    (Turkish İ, Greek final sigma, ß/ẞ, digraphs, fullwidth, ligatures)
    and assert (a) both case mappers agree on these inputs and (b) the
    Spark fingerprints equal the per-doc reference on the JVM-lowered
    text, so production can never silently diverge from the documented
    reference on non-ASCII content."""
    samples = [
        "İstanbul ŞEHİR Straße GROSSE ẞ ß pages",
        "ΑΒΓΔ ΣΙΓΜΑΣ ΟΔΟΣ τέλος και άλλα κείμενα εδώ",
        "Ｆｕｌｌｗｉｄｔｈ ＴＥＸＴ ｍｉｘｅｄ ascii tail",
        "РУССКИЙ текст ЁЛКА и ещё немного слов тут",
        "ĲSSELMEER ǅungla ǈubljana digraph corner cases",
        "ＡﬁﬂﬅＺ ﬃ ligatures with some padding words after",
    ]
    df = spark.createDataFrame(list(enumerate(samples)), ["id", "t"])
    out = {
        r["id"]: (r["l"], list(r["w"]))
        for r in df.select(
            "id",
            F.lower("t").alias("l"),
            text.winnow_fingerprints(F.col("t")).alias("w"),
        ).collect()
    }
    for i, s in enumerate(samples):
        jvm_lower, got = out[i]
        # one case-mapping source: JVM and Python lower must agree here
        assert jvm_lower == s.lower(), (i, jvm_lower, s.lower())
        # _winnow_one re-lowers internally; lowercased text is a fixed
        # point of both mappers, so this is the per-doc reference on
        # exactly the bytes the UDF saw
        assert got == text._winnow_one(jvm_lower, 8, 16), i


# ----------------------------------------------------------------------
# multimodal plumbing
# ----------------------------------------------------------------------
def test_multimodal_stub_pipeline(docs):
    media = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    with_meta = multimodal.attach_media(media, "payload")
    row = with_meta.select("media_meta").first()["media_meta"]
    assert row["media_type"] == "image/fake" and row["n_bytes"] > 0
    feats = multimodal.decode_features(media, "payload", "doc_id", dim=32)
    got = feats.collect()
    assert len(got) == docs.count()
    assert all(len(r["features"]) == 32 for r in got)
    # determinism
    again = {r["doc_id"]: r["features"] for r in
             multimodal.decode_features(media, "payload", "doc_id", dim=32).collect()}
    assert again[got[0]["doc_id"]] == got[0]["features"]
    frames = multimodal.frame_sample(media, "payload", "doc_id", n_frames=4)
    per_doc = frames.groupBy("doc_id").count().collect()
    assert all(r["count"] == 4 for r in per_doc)


def test_multimodal_real_decoder_gated(docs):
    media = docs.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    with pytest.raises(NotImplementedError):
        multimodal.decode_features(media, "payload", "doc_id", decoder="real")


def test_dup_clusters(spark):
    """Connected components: chains collapse to min-id clusters."""
    import pandas as pd

    pairs = spark.createDataFrame(
        pd.DataFrame(
            {
                "id_a": [1, 2, 3, 10, 20, 21],
                "id_b": [2, 3, 4, 11, 21, 22],
            }
        )
    )
    res = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.dup_clusters(pairs).collect()
    }
    assert res == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }


def test_dup_clusters_from_lsh(docs, docs_with_dups):
    """End-to-end dedup pipeline: LSH candidates → verify by estimated
    Jaccard (these synthetic docs share one vocabulary, so unverified
    candidates form a dense graph) → connected components; each original
    clusters with both of its planted variants."""
    from pyspark.sql import functions as PF

    n = docs.count()
    sigs = dedup.minhash_signatures(docs_with_dups, "doc_id", "text").cache()
    cands = dedup.lsh_candidate_pairs(sigs, "doc_id", bands=32)
    a = sigs.select(PF.col("doc_id").alias("id_a"), PF.col("minhash").alias("sig_a"))
    b = sigs.select(PF.col("doc_id").alias("id_b"), PF.col("minhash").alias("sig_b"))
    verified = (
        cands.join(a, "id_a")
        .join(b, "id_b")
        .filter(dedup.minhash_jaccard_estimate("sig_a", "sig_b") >= 0.8)
        .select("id_a", "id_b")
    )
    clusters = dedup.dup_clusters(verified)
    sizes = clusters.groupBy("cluster_id").count()
    triples = sizes.filter(PF.col("count") >= 3).count()
    assert triples >= int(0.95 * n)


def test_ivf_topk_recall(emb):
    """IVF-probed search finds most true neighbors while scanning only
    n_probe/n_lists of the corpus."""
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    queries = [(int(ids[i]), X[i].tolist()) for i in range(8)]

    C = similarity.ivf_centroids(emb, "embedding", n_lists=8, seed=5)
    assert C.shape == (8, X.shape[1])
    res = similarity.ivf_topk(emb, "vec_id", "embedding", queries, C, k=5, n_probe=3)
    by_q = {}
    for r in res.collect():
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = 0
    total = 0
    for qi in range(8):
        sims = Xn[qi] @ Xn.T
        true_top = set(ids[np.argsort(-sims)[:5]].tolist())
        got = by_q.get(int(ids[qi]), set())
        hits += len(true_top & got)
        total += 5
    assert hits / total >= 0.5, hits / total  # random 64-d data, 3/8 lists probed


def test_ivf_centroids_distributed_matches_driver_quality(emb):
    """The distributed Lloyd trainer (the path past the driver-side
    20 k-sample cap) must (a) be deterministic for a fixed corpus and
    partition layout, (b) produce a quantizer at least as good as the
    driver-sample trainer, measured by mean best-centroid similarity
    over the corpus, and (c) partition the corpus without collapse."""
    rows = emb.orderBy("vec_id").collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)

    Cd = similarity.ivf_centroids_distributed(
        emb, "embedding", n_lists=8, seed=5, order_col="vec_id",
        init_sample_rows=8192,
    )
    assert Cd.shape == (8, X.shape[1])
    assert np.allclose(np.linalg.norm(Cd, axis=1), 1.0)
    # deterministic re-run
    Cd2 = similarity.ivf_centroids_distributed(
        emb, "embedding", n_lists=8, seed=5, order_col="vec_id",
        init_sample_rows=8192,
    )
    assert np.array_equal(Cd, Cd2)
    # quantizer quality: distributed (full-corpus passes) should not be
    # worse than the driver sample trainer beyond noise
    Cs = similarity.ivf_centroids(emb, "embedding", n_lists=8, seed=5)
    q_dist = np.max(Xn @ Cd.T, axis=1).mean()
    q_drv = np.max(Xn @ Cs.T, axis=1).mean()
    assert q_dist >= q_drv - 0.02, (q_dist, q_drv)
    # no degenerate collapse
    assigned = similarity.ivf_assign(emb, "vec_id", "embedding", Cd)
    assert assigned.select("list_id").distinct().count() >= 6
    # mini-batch path: still deterministic and sane
    Cm = similarity.ivf_centroids_distributed(
        emb, "embedding", n_lists=8, seed=5, order_col="vec_id",
        init_sample_rows=8192, sample_fraction=0.5, iters=4,
    )
    assert Cm.shape == (8, X.shape[1]) and np.all(np.isfinite(Cm))


def test_ivf_assign_partitions_corpus(emb):
    C = similarity.ivf_centroids(emb, "embedding", n_lists=8, seed=5)
    assigned = similarity.ivf_assign(emb, "vec_id", "embedding", C)
    counts = assigned.groupBy("list_id").count().collect()
    assert sum(r["count"] for r in counts) == emb.count()
    assert len(counts) >= 6  # no degenerate single-list collapse


def test_simhash_minhash_huge_doc_chunked_paths():
    """Oversized docs take bounded-memory chunked paths that must agree
    exactly with the block kernels (vote counts are additive; min
    composes over shingle chunks)."""
    import numpy as np

    from tdigest_spark import dedup as dd

    rng = np.random.RandomState(3)
    # simhash: one doc bigger than the pad budget, mixed with small docs
    big = rng.randint(-(2**62), 2**62, size=dd._SIMHASH_PAD_BUDGET + 12_345).astype(
        np.int64
    )
    small = [rng.randint(-(2**62), 2**62, size=50).astype(np.int64) for _ in range(7)]
    lens = np.array([a.size for a in [*small[:3], big, *small[3:]]], dtype=np.int64)
    flat = np.concatenate([*small[:3], big, *small[3:]])
    got = dd._simhash_votes_flat(flat, lens)
    # reference: per-doc direct vote
    want = []
    for a in [*small[:3], big, *small[3:]]:
        want.append(int(dd._votes_block(a.view(np.uint64), np.array([a.size]), a.size)[0]))
    assert got.tolist() == want

    # minhash: a shingle array past the block budget splits into chunks
    a_c, b_c = dd._perm_coeffs(32)
    sh = (rng.randint(0, 2**62, size=dd._MINHASH_SHINGLE_BLOCK + 9_999)).astype(
        np.uint64
    )
    direct = dd._minhash_block([sh], a_c, b_c)
    parts = [
        dd._minhash_block([c], a_c, b_c)
        for c in np.array_split(sh, -(-sh.size // dd._MINHASH_SHINGLE_BLOCK))
    ]
    chunked = np.minimum.reduce([p.view(np.uint64) for p in parts]).view(np.int64)
    assert np.array_equal(direct, chunked)


# ----------------------------------------------------------------------
# duplicate n-gram mass
# ----------------------------------------------------------------------
def test_word_ngrams_edges(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b"), (3, "   "), (4, None), (5, "x y z w v")],
        ["id", "t"],
    )
    rows = {
        r["id"]: r["g"]
        for r in df.select("id", dedup.word_ngrams(F.col("t"), 5).alias("g")).collect()
    }
    assert rows[1] == ["a b c d e", "b c d e f"]
    assert rows[2] == []  # shorter than n
    assert rows[3] == []  # blank
    assert rows[4] == []  # NULL text -> NULL when-condition -> empty array
    assert rows[5] == ["x y z w v"]


def test_duplicate_ngram_mass(spark):
    # "a b c d e" appears in docs 1 and 2 (dup); doc 3 contributes
    # unique grams only
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e f"), (3, "p q r s t u")],
        ["id", "t"],
    )
    row = dedup.duplicate_ngram_mass(df, "t", n=5).collect()[0]
    # grams: d1 {abcde}, d2 {abcde, bcdef}, d3 {pqrst, qrstu} → 5 inst,
    # 4 distinct, "a b c d e" ×2 duplicated
    assert row["n_instances"] == 5
    assert row["n_distinct"] == 4
    assert row["dup_instances"] == 2


# ----------------------------------------------------------------------
# PII
# ----------------------------------------------------------------------
def test_pii_count_and_scrub(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at jo.doe+x@sub.example.org or +44 123-456-7890 now"),
            (2, "no pii here"),
            (3, None),
        ],
        ["id", "t"],
    )
    out = df.select(
        "id",
        text.pii_count(F.col("t")).alias("c"),
        text.pii_count(text.scrub_pii(F.col("t"))).alias("after"),
        text.scrub_pii(F.col("t")).alias("s"),
    ).collect()
    by_id = {r["id"]: r for r in out}
    assert by_id[1]["c"] == 2 and by_id[1]["after"] == 0
    assert "[EMAIL]" in by_id[1]["s"] and "[PHONE]" in by_id[1]["s"]
    assert "example.org" not in by_id[1]["s"]
    assert by_id[2]["c"] == 0 and by_id[2]["s"] == "no pii here"
    assert by_id[3]["s"] is None


# ----------------------------------------------------------------------
# word repetition
# ----------------------------------------------------------------------
def test_word_repetition(spark):
    df = spark.createDataFrame(
        [(1, "spam spam spam spam eggs", "en"), (2, "a b c d e", "en"), (3, " ", "de")],
        ["doc_id", "t", "lang"],
    )
    rows = {
        r["doc_id"]: r
        for r in text.word_repetition(df, "doc_id", "t", carry=("lang",)).collect()
    }
    assert rows[1]["max_token_count"] == 4 and rows[1]["n_tokens"] == 5
    assert abs(rows[1]["top_token_frac"] - 0.8) < 1e-12
    assert rows[2]["max_token_count"] == 1
    assert 3 not in rows  # blank doc dropped


# ----------------------------------------------------------------------
# URL normalization
# ----------------------------------------------------------------------
def test_normalize_url_variants(spark):
    from tdigest_spark import urls

    variants = [
        "https://example.com/a/b?x=1&y=2",
        "HTTPS://EXAMPLE.COM/a/b?y=2&x=1",
        "https://www.example.com/a/b?x=1&y=2",
        "https://example.com:443/a/b?x=1&y=2",
        "https://example.com/a/b/?x=1&y=2",
        "https://example.com/a/b?x=1&y=2#frag",
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(variants)], ["id", "u"])
    got = {r[0] for r in df.select(urls.normalize_url(F.col("u"))).collect()}
    assert got == {"https://example.com/a/b?x=1&y=2"}


def test_normalize_url_preserves_distinctions(spark):
    from tdigest_spark import urls

    cases = [
        # http :80 strips, https :80 does not
        ("http://a.com:80/x", "http://a.com/x"),
        ("https://a.com:80/x", "https://a.com:80/x"),
        # path case + percent-encoding preserved
        ("https://a.com/A%2Fb", "https://a.com/A%2Fb"),
        # empty path ≡ root path (RFC 3986 §6.2.3) — both collapse
        ("https://a.com/", "https://a.com/"),
        ("https://a.com", "https://a.com/"),
        # '?' inside a fragment is fragment, not query
        ("https://a.com/p#sec?x=1", "https://a.com/p"),
        # schemeless input passes through trimmed
        ("  not-a-url  ", "not-a-url"),
    ]
    df = spark.createDataFrame(cases, ["u", "want"])
    bad = df.filter(urls.normalize_url(F.col("u")) != F.col("want")).collect()
    assert bad == []


def test_url_dedup_clusters(spark):
    from tdigest_spark import urls

    df = spark.createDataFrame(
        [
            (10, "https://a.com/x?p=1&q=2"),
            (11, "https://WWW.A.COM/x?q=2&p=1#top"),
            (12, "https://b.com/x"),
        ],
        ["id", "url"],
    )
    rows = {r["canonical_url"]: r for r in urls.url_dedup(df, "url", "id").collect()}
    assert rows["https://a.com/x?p=1&q=2"]["keep_id"] == 10
    assert rows["https://a.com/x?p=1&q=2"]["n_variants"] == 2
    assert rows["https://b.com/x"]["n_variants"] == 1


def test_normalize_url_idempotent(spark):
    """Canonical keys must be stable: normalize(normalize(u)) ==
    normalize(u), including pathological hosts ('www.www.x.com',
    'www.com'), stacked default ports, fragments with '?', and empty
    components.  (Hypothesis-style corpus kept deterministic so the
    Spark round-trip stays one job.)"""
    from itertools import product

    from tdigest_spark import urls

    schemes = ["http://", "https://", "HTTPS://", ""]
    hosts = ["example.com", "WWW.Example.com", "www.www.x.com", "www.com",
             "a.com:443", "a.com:80", "a.com:8080"]
    paths = ["", "/", "/p", "/p/", "/A%2Fb/"]
    tails = ["", "?b=2&a=1", "?a=1", "#f", "#sec?x=1", "?b=2&a=1#f"]
    corpus = ["".join(p) for p in product(schemes, hosts, paths, tails)]
    df = spark.createDataFrame([(u,) for u in corpus], ["u"])
    once = df.select(urls.normalize_url(F.col("u")).alias("c1"))
    twice = once.select(
        "c1", urls.normalize_url(F.col("c1")).alias("c2")
    )
    bad = twice.filter(F.col("c1") != F.col("c2")).collect()
    assert bad == [], f"non-idempotent: {bad[:5]}"


def test_lsh_pairs_null_text_and_empty(spark, docs_with_dups):
    """NULL-text docs carry NULL signatures: they must neither crash the
    signature-length probe nor collide with each other in every band."""
    nulled = docs_with_dups.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.col("text")).alias("text"),
    )
    sigs = dedup.minhash_signatures(nulled, "doc_id", "text")
    # force the probe path to see a null first: sort nulls first
    sigs_null_first = sigs.orderBy(F.col("minhash").isNotNull())
    pairs = dedup.lsh_candidate_pairs(sigs_null_first, "doc_id").collect()
    ids = {i for r in pairs for i in (r["id_a"], r["id_b"])}
    assert ids, "even-id exact copies must still be found"
    assert all(i % 2 == 0 for i in ids), "null-sig docs must never pair"
    # empty frame: no probe crash, empty result
    empty = sigs.filter(F.lit(False))
    assert dedup.lsh_candidate_pairs(empty, "doc_id").count() == 0


def test_dup_clusters_chain_convergence_and_raise(spark):
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(24)], ["id_a", "id_b"]
    )
    labels = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.dup_clusters(chain).collect()
    }
    assert set(labels.values()) == {0}  # one component, min-label 0
    with pytest.raises(RuntimeError, match="converge"):
        dedup.dup_clusters(chain, max_iters=3)


def test_strip_boilerplate(spark):
    """Lines shared by >= min_docs docs are removed; unique lines and
    order survive; a doc that is pure boilerplate drops out."""
    rows = [
        (1, "unique one\nSHARE\nbody A", "s"),
        (2, "SHARE\nunique two", "s"),
        (3, "body C\nSHARE", "s"),
        (4, "SHARE", "s"),  # all boilerplate
    ]
    df = spark.createDataFrame(rows, ["doc_id", "t", "src"])
    out = {
        r["doc_id"]: r
        for r in text.strip_boilerplate(df, "doc_id", "t", min_docs=3).collect()
    }
    assert out[1]["clean_text"] == "unique one\nbody A"
    assert out[2]["clean_text"] == "unique two"
    assert out[3]["clean_text"] == "body C"
    assert 4 not in out
    freq = {
        r["line"]: r["n_docs"]
        for r in text.line_doc_frequency(df, "doc_id", "t").collect()
    }
    assert freq["SHARE"] == 4 and freq["unique one"] == 1

"""Unit tests for the training-data pipeline operators (dedup/similarity),
including the hot-shingle skew guard (VERDICT r1 'what's wrong' #2)."""

import pytest
from pyspark.sql import functions as F

from sparkcheck.pipeline.dedup import (exact_duplicates, jaccard_pairs,
                                       lsh_candidate_stats,
                                       minhash_signatures, simhash16)


@pytest.fixture(scope="module")
def corpus(spark):
    # 60 docs; every doc contains the stopword "the"; docs pair up into
    # near-duplicate pairs (i, i+1) sharing their distinctive tail words
    rows = []
    for i in range(60):
        base = i // 2
        rows.append((f"d{i:03d}",
                     f"the quick item{base} alpha{base} beta{base} gamma{base}"))
    return spark.createDataFrame(rows, "doc_id string, text string").cache()


class TestJaccardHotShingleGuard:
    def test_guard_bounds_hot_shingle_pairs(self, spark, corpus):
        """With every doc sharing the 'the'/'quick' shingles, the unguarded
        1-gram self-join scores all C(60,2)=1770 pairs; a tight cap drops the
        hot shingles so only the distinctive-word pairs remain."""
        unguarded = jaccard_pairs(corpus, "doc_id", "text", shingle_n=1,
                                  threshold=0.0, max_pairs_per_shingle=None)
        assert unguarded.count() == 60 * 59 // 2
        # cap at 1 pair/shingle => shingles in >2 docs are dropped: 'the',
        # 'quick' vanish, each (2i, 2i+1) pair still shares its 4 tail words
        guarded = jaccard_pairs(corpus, "doc_id", "text", shingle_n=1,
                                threshold=0.0, max_pairs_per_shingle=1)
        got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in guarded.collect()}
        assert len(got) == 30
        for (a, b), j in got.items():
            assert int(a[1:]) // 2 == int(b[1:]) // 2
            assert j == 1.0  # identical on the filtered shingle space

    def test_guard_noop_below_cap(self, spark, corpus):
        """The default cap (1e6 pairs) leaves a small corpus untouched."""
        default = jaccard_pairs(corpus, "doc_id", "text", shingle_n=1,
                                threshold=0.0)
        exact = jaccard_pairs(corpus, "doc_id", "text", shingle_n=1,
                              threshold=0.0, max_pairs_per_shingle=None)
        assert sorted(map(tuple, default.collect())) == \
            sorted(map(tuple, exact.collect()))


class TestEmbeddingCellCap:
    def test_oversized_cell_dropped(self, spark):
        from sparkcheck.pipeline.dedup import embedding_near_dup_pairs
        rows = ([(f"v{i}", [1.0, 0.0], "big") for i in range(10)]
                + [("a", [0.0, 1.0], "small"), ("b", [0.0, 1.0], "small")])
        df = spark.createDataFrame(
            rows, "vec_id string, embedding array<double>, label string")
        capped = embedding_near_dup_pairs(df, "vec_id", "embedding", "label",
                                          threshold=0.5, max_cell_size=5)
        assert [(r["id_a"], r["id_b"]) for r in capped.collect()] == [("a", "b")]
        full = embedding_near_dup_pairs(df, "vec_id", "embedding", "label",
                                        threshold=0.5, max_cell_size=None)
        assert full.count() == 45 + 1


class TestDedupOps:
    def test_exact_duplicates(self, spark):
        df = spark.createDataFrame(
            [("a", "x y z"), ("b", "x y z"), ("c", "unique doc"),
             ("d", "X  y z")],
            "doc_id string, text string")
        assert exact_duplicates(df, "doc_id", "text").count() == 1
        norm = exact_duplicates(df, "doc_id", "text", normalize=True)
        assert norm.collect()[0]["cnt"] == 3  # 'X  y z' normalizes in

    def test_minhash_identical_docs_same_signature(self, spark):
        df = spark.createDataFrame(
            [("a", "w1 w2 w3 w4"), ("b", "w1 w2 w3 w4"), ("c", "q r s t")],
            "doc_id string, text string")
        sigs = {r["doc_id"]: tuple(r[f"mh{i}"] for i in range(8))
                for r in minhash_signatures(df, "doc_id", "text").collect()}
        assert sigs["a"] == sigs["b"] != sigs["c"]
        stats = lsh_candidate_stats(df, "doc_id", "text").collect()[0]
        assert stats["candidate_pairs"] >= 4  # a,b collide in every band

    def test_simhash_similar_docs_close(self, spark):
        df = spark.createDataFrame(
            [("a", "w1 w2 w3 w4 w5 w6 w7 w8"),
             ("b", "w1 w2 w3 w4 w5 w6 w7 changed"),
             ("c", "completely different words here now ok fine yes")],
            "doc_id string, text string")
        h = {r["doc_id"]: r["simhash"] for r in
             simhash16(df, "doc_id", "text").collect()}
        dist_ab = bin(h["a"] ^ h["b"]).count("1")
        dist_ac = bin(h["a"] ^ h["c"]).count("1")
        assert dist_ab < dist_ac


class TestWinnowFingerprints:
    def _brute(self, text, k=8, window=4, max_chars=10_000):
        import hashlib, re
        norm = re.sub(r"\s+", " ", text.lower())[:max_chars]
        grams = [hashlib.md5(norm[i:i + k].encode()).hexdigest()
                 for i in range(max(len(norm) - k + 1, 0))]
        if not grams:
            return set()
        if len(grams) < window:
            return {min(grams)}
        return {min(grams[j:j + window]) for j in range(len(grams) - window + 1)}

    def test_matches_bruteforce(self, spark):
        rows = [("a", "The quick brown fox jumps over the lazy dog"),
                ("b", "the  QUICK brown fox jumps over a sleepy cat"),
                ("c", "completely unrelated text with nothing shared here"),
                ("d", "tiny"),          # shorter than k -> no fingerprints
                ("e", ""),              # empty -> none
                ("f", "exactly9!"),     # 2 grams < window -> single min
                ("g", "0123456789a")]   # 4 grams == window -> one window
        from sparkcheck.pipeline.text import winnow_fingerprints
        df = spark.createDataFrame(rows, "doc_id string, text string")
        got = {}
        for r in winnow_fingerprints(df, k=8, window=4).collect():
            got.setdefault(r["doc_id"], set()).add(r["fingerprint"])
        for doc_id, text in rows:
            assert got.get(doc_id, set()) == self._brute(text), doc_id

    def test_shared_substring_guarantee(self, spark):
        """Docs sharing a substring of length >= k+window-1 must share a
        fingerprint (the winnowing guarantee)."""
        from sparkcheck.pipeline.text import winnow_fingerprints
        shared = "this exact sentence appears in both documents verbatim"
        df = spark.createDataFrame(
            [("x", "prefix words then " + shared + " and a unique ending"),
             ("y", shared + " with a completely different continuation")],
            "doc_id string, text string")
        got = {}
        for r in winnow_fingerprints(df, k=8, window=4).collect():
            got.setdefault(r["doc_id"], set()).add(r["fingerprint"])
        assert got["x"] & got["y"]


class TestMultiProbeIVF:
    def test_multiprobe_recall_at_least_single_probe(self, spark):
        from sparkcheck.pipeline.similarity import (cosine_topk, ivf_topk,
                                                    ivf_topk_multiprobe)
        e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = e.filter(F.col("vec_id") == 0)
        exact = {r["vec_id"] for r in cosine_topk(e, q, k=5).collect()}
        one = {r["vec_id"] for r in ivf_topk(e, q, k=5).collect()}
        # probing every cell must recover the exact answer
        n_cells = e.select("label").distinct().count()
        allp = {r["vec_id"] for r in
                ivf_topk_multiprobe(e, q, k=5, nprobe=n_cells).collect()}
        assert allp == exact
        multi = {r["vec_id"] for r in
                 ivf_topk_multiprobe(e, q, k=5, nprobe=2).collect()}
        assert len(multi & exact) >= len(one & exact)

    def test_pairwise_topk_degenerate_cell_capped(self, spark):
        """One catch-all cell above max_cell_size is dropped from the
        per-cell all-pairs join instead of making the job quadratic
        (r2 VERDICT 'What's wrong' #4 — mirrors embedding_near_dup_pairs)."""
        from sparkcheck.pipeline.similarity import pairwise_topk_per_cell
        rows = ([(i, "big", [1.0, float(i)]) for i in range(50)] +
                [(100, "ok", [1.0, 0.0]), (101, "ok", [0.9, 0.1])])
        df = spark.createDataFrame(
            rows, "vec_id int, label string, embedding array<double>")
        capped = pairwise_topk_per_cell(df, k=2, max_cell_size=10)
        got = {r["id_a"] for r in capped.collect()}
        assert got == {100, 101}  # the degenerate cell contributed nothing
        full = pairwise_topk_per_cell(df, k=2, max_cell_size=None)
        assert {r["id_a"] for r in full.collect()} > got

    def test_hyperplane_lsh_candidates_and_recall(self, spark):
        """Banded sign-LSH: the query itself (all bits agree -> every band
        matches) must always be recovered, and n_bands is the recall dial —
        widening bands (4x4) prunes hard, narrowing them (8x2) approaches
        exact top-k. On i.i.d. Gaussian vectors the 'neighbors' are barely
        above random, so the wide-band recall is intentionally NOT asserted —
        only the dial's monotone behavior and top-1 correctness."""
        from sparkcheck.pipeline.similarity import (cosine_topk,
                                                    hyperplane_lsh_topk,
                                                    hyperplane_signature,
                                                    make_hyperplanes)
        e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        q = e.filter(F.col("vec_id") == 0)
        planes = make_hyperplanes(64, 16, seed=42)
        exact = [r["vec_id"] for r in cosine_topk(e, q, k=10).collect()]
        lsh4 = [r["vec_id"] for r in
                hyperplane_lsh_topk(e, q, planes=planes, n_bands=4, k=10).collect()]
        assert lsh4[0] == exact[0] == 0  # query itself: all 16 bits agree
        assert len(set(lsh4) & set(exact)) >= 1
        lsh8 = [r["vec_id"] for r in
                hyperplane_lsh_topk(e, q, planes=planes, n_bands=8, k=10).collect()]
        assert len(set(lsh8) & set(exact)) >= 8  # narrow bands ~ exact
        assert len(set(lsh8) & set(exact)) >= len(set(lsh4) & set(exact))
        sigs = hyperplane_signature(e, planes).select("sig").distinct().count()
        assert sigs > 1  # signatures spread -> a full-signature probe prunes
        with pytest.raises(ValueError, match="must divide"):
            # truncated band width would silently drop the high bits
            hyperplane_lsh_topk(e, q, planes=planes, n_bands=3, k=10)

    def test_hyperplane_signature_deterministic(self, spark):
        from sparkcheck.pipeline.similarity import (hyperplane_signature,
                                                    make_hyperplanes)
        e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        planes = make_hyperplanes(64, 8, seed=7)
        a = {(r["vec_id"], r["sig"]) for r in
             hyperplane_signature(e, planes).select("vec_id", "sig").collect()}
        b = {(r["vec_id"], r["sig"]) for r in
             hyperplane_signature(e.repartition(13), planes)
             .select("vec_id", "sig").collect()}
        assert a == b
        assert all(0 <= s < 256 for _, s in a)

    def test_cell_centroids(self, spark):
        from sparkcheck.pipeline.similarity import cell_centroids
        df = spark.createDataFrame(
            [("a", [1.0, 0.0]), ("a", [3.0, 2.0]), ("b", [0.0, 4.0])],
            "label string, embedding array<double>")
        got = {r["cell"]: r["centroid"] for r in
               cell_centroids(df).collect()}
        assert got["a"] == [2.0, 1.0]
        assert got["b"] == [0.0, 4.0]


class TestSimhashPairs:
    @staticmethod
    def _ham(x, y, bits):
        mask = (1 << bits) - 1
        return bin((x ^ y) & mask).count("1")

    @pytest.mark.parametrize("hash_bits", [16, 64])
    def test_band_index_matches_bruteforce(self, spark, hash_bits):
        """Pigeonhole completeness: the band index recovers exactly the
        brute-force pair set at every max_hamming, for both hash widths."""
        import itertools
        from sparkcheck.pipeline.dedup import (simhash16, simhash64,
                                               simhash_near_dup_pairs)
        hasher = simhash16 if hash_bits == 16 else simhash64
        rows = [(f"d{i}", " ".join(
            f"w{j}" if (i >> j) % 2 == 0 else f"x{j}" for j in range(10)))
            for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        h = {r["doc_id"]: r["simhash"] for r in
             hasher(df, "doc_id", "text").collect()}
        for mh in (0, 1, 2, 4):
            got = {(r["id_a"], r["id_b"], r["hamming"]) for r in
                   simhash_near_dup_pairs(df, "doc_id", "text",
                                          max_hamming=mh,
                                          hash_bits=hash_bits).collect()}
            brute = {(a, b, self._ham(h[a], h[b], hash_bits))
                     for a, b in itertools.combinations(sorted(h), 2)
                     if self._ham(h[a], h[b], hash_bits) <= mh}
            assert got == brute, (hash_bits, mh)

    def test_simhash64_similar_docs_close(self, spark):
        from sparkcheck.pipeline.dedup import simhash64
        df = spark.createDataFrame(
            [("a", "w1 w2 w3 w4 w5 w6 w7 w8"),
             ("b", "w1 w2 w3 w4 w5 w6 w7 changed"),
             ("c", "completely different words here now ok fine yes")],
            "doc_id string, text string")
        h = {r["doc_id"]: r["simhash"] for r in
             simhash64(df, "doc_id", "text").collect()}
        assert self._ham(h["a"], h["b"], 64) < self._ham(h["a"], h["c"], 64)

    def test_64bit_band_buckets_stay_small(self, spark):
        """The scale invariant the 64-bit width buys (VERDICT r2 #1): with
        16-bit bands, same-(band, band_val) bucket sizes stay O(n/2^16) on a
        10x fixture of independent docs — so the candidate join is
        groupBy-sized, never quadratic. (The deprecated 16-bit hash has <=16
        values per band: every bucket would hold ~n/16 of the corpus.)"""
        import random
        from pyspark.sql import functions as F
        from sparkcheck.pipeline.dedup import simhash64, simhash_bands
        rng = random.Random(0)
        n = 400
        rows = [(f"d{i}", " ".join(
            f"tok{rng.randrange(10_000)}" for _ in range(30)))
            for i in range(n)]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        sigs = simhash64(df, "doc_id", "text")
        banded = simhash_bands(sigs, "doc_id", n_bands=4, total_bits=64)
        per_bucket = (banded.groupBy("band_id", "band_val")
                      .agg(F.count(F.lit(1)).alias("c")))
        mx = per_bucket.agg(F.max("c").alias("m")).first()["m"]
        pairs = per_bucket.agg(
            F.sum(F.expr("c * (c - 1) / 2")).cast("bigint").alias("p")
        ).first()["p"]
        # independent docs over 65,536 bucket values: collisions are rare
        assert mx <= 8, mx
        # candidate pairs are a vanishing fraction of n*(n-1)/2 = 79,800
        assert pairs <= n, pairs


class TestDuplicateClusters:
    def test_chain_and_island(self, spark):
        from sparkcheck.pipeline.dedup import duplicate_clusters
        pairs = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d"), ("e", "f")],
            "id_a string, id_b string")
        got = {r["id"]: r["cluster"] for r in
               duplicate_clusters(pairs).collect()}
        assert got == {"a": "a", "b": "a", "c": "a", "d": "a",
                       "e": "e", "f": "e"}

    def test_matches_union_find_on_random_graph(self, spark):
        """Exactness vs a driver-side union-find on a random pair set —
        includes cycles, long chains, and singleton-free merges."""
        import random
        rng = random.Random(5)
        n = 200
        pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(150)]
        pairs = [(a, b) for a, b in pairs if a != b]
        parent = list(range(n))
        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x
        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {x for ab in pairs for x in ab}
        expect = {x: find(x) for x in touched}
        # union-find roots are not guaranteed to be the component min —
        # normalize both sides to min-of-component
        comp_min: dict = {}
        for x, r in expect.items():
            comp_min[r] = min(comp_min.get(r, x), x)
        expect = {x: comp_min[r] for x, r in expect.items()}
        from sparkcheck.pipeline.dedup import duplicate_clusters
        df = spark.createDataFrame(pairs, "id_a int, id_b int")
        got = {r["id"]: r["cluster"] for r in
               duplicate_clusters(df).collect()}
        assert got == expect

    def test_nonconvergence_raises(self, spark):
        """VERDICT r3 #2: exhausting max_iter without a fixpoint must NOT
        silently return partially-propagated labels."""
        from sparkcheck.pipeline.dedup import duplicate_clusters
        chain = spark.createDataFrame(
            [(i, i + 1) for i in range(12)], "id_a int, id_b int")
        with pytest.raises(RuntimeError, match="did not converge"):
            duplicate_clusters(chain, max_iter=1)

    def test_nonconvergence_allow_partial_warns(self, spark):
        import warnings
        from sparkcheck.pipeline.dedup import duplicate_clusters
        chain = spark.createDataFrame(
            [(i, i + 1) for i in range(12)], "id_a int, id_b int")
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            rows = duplicate_clusters(chain, max_iter=1,
                                      allow_partial=True).collect()
        assert any("did not converge" in str(x.message) for x in w)
        assert len(rows) == 13  # partial labels still returned

    def test_reliable_checkpoint_dir_matches_local(self, spark, tmp_path):
        """checkpoint_dir switches lineage truncation to reliable
        checkpoint() (survives executor loss at cluster scale); clusters
        must be identical to the localCheckpoint default."""
        from sparkcheck.pipeline.dedup import duplicate_clusters
        pairs = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d"), ("e", "f"), ("g", "g2"),
             ("g2", "a")], "id_a string, id_b string")
        base = {r["id"]: r["cluster"] for r in
                duplicate_clusters(pairs).collect()}
        ckpt = {r["id"]: r["cluster"] for r in
                duplicate_clusters(
                    pairs, checkpoint_dir=str(tmp_path / "cc")).collect()}
        assert ckpt == base
        # the reliable checkpoint actually wrote round snapshots
        import os
        assert any(os.scandir(tmp_path / "cc"))
        # Repeat call with the SAME plain path must not raise: Spark stores
        # a scheme-qualified UUID subdir ('file:/dir/<uuid>'), so a naive
        # equality check rejects its own directory on the second call.
        again = {r["id"]: r["cluster"] for r in
                 duplicate_clusters(
                     pairs, checkpoint_dir=str(tmp_path / "cc")).collect()}
        assert again == base
        # ... while a genuinely different dir is still refused, including a
        # same-prefix sibling ('/x/cc2' vs stored '/x/cc/<uuid>').
        import pytest as _pytest
        with _pytest.raises(ValueError, match="refusing to clobber"):
            duplicate_clusters(pairs, checkpoint_dir=str(tmp_path / "cc2"))


class TestLangIdEdges:
    def test_empty_and_null_text(self, spark):
        """Documented edge (VERDICT r2 housekeeping): split('', ' ') yields
        [''] so size==1 — an empty string gets score 0 for every language
        and the deterministic tie-break predicts the first language ('en');
        a NULL text predicts NULL."""
        from sparkcheck.pipeline.text import lang_id
        df = spark.createDataFrame(
            [("e", ""), ("n", None),
             ("es", "el perro y la casa de los amigos es aqui"),
             ("en", "the cat and the dog are in the house")],
            "doc_id string, text string")
        got = {r["doc_id"]: r["predicted_lang"]
               for r in lang_id(df).collect()}
        assert got["e"] == "en"       # all-zero scores -> first language
        assert got["n"] is None       # null text -> null prediction
        assert got["es"] == "es" and got["en"] == "en"


class TestSessionization:
    def test_gap_sessions_known_fixture(self, spark):
        import datetime as dt
        from sparkcheck.pipeline.events import session_stats, sessionize
        base = dt.datetime(2024, 1, 1)
        rows = [
            # user 1: 3 events close together, then a 2h gap, then 1 event
            (1, base), (1, base + dt.timedelta(minutes=5)),
            (1, base + dt.timedelta(minutes=20)),
            (1, base + dt.timedelta(hours=2, minutes=20)),
            # user 2: single event
            (2, base),
        ]
        df = spark.createDataFrame(rows, "user_id bigint, ts timestamp")
        s = sessionize(df, gap_minutes=30.0)
        got = {(r["user_id"], r["ts"].minute + 60 * r["ts"].hour): r["session_idx"]
               for r in s.collect()}
        assert got == {(1, 0): 0, (1, 5): 0, (1, 20): 0, (1, 140): 1, (2, 0): 0}
        st = {(r["user_id"], r["session_idx"]): (r["n_events"], r["duration_sec"])
              for r in session_stats(df, gap_minutes=30.0).collect()}
        assert st[(1, 0)] == (3, 20 * 60.0)
        assert st[(1, 1)] == (1, 0.0)
        assert st[(2, 0)] == (1, 0.0)

    def test_boundary_is_strict_gt(self, spark):
        import datetime as dt
        from sparkcheck.pipeline.events import sessionize
        base = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(1, base), (1, base + dt.timedelta(minutes=30))],
            "user_id bigint, ts timestamp")
        s = sessionize(df, gap_minutes=30.0).collect()
        assert {r["session_idx"] for r in s} == {0}  # exactly 30min: same session


class TestRepetitionFeatures:
    def test_known_values(self, spark):
        from sparkcheck.pipeline.text import repetition_features
        df = spark.createDataFrame(
            [("a", "spam spam spam spam spam"),      # fully repetitive
             ("b", "all words here are different ones"),
             ("c", "x"),                              # no bigrams
             ("d", "go stop go stop go")],            # alternating
            "doc_id string, text string")
        got = {r["doc_id"]: (r["unique_word_ratio"], r["top_bigram_ratio"])
               for r in repetition_features(df).collect()}
        assert got["a"] == (1 / 5, 1.0)   # 'spam spam' is every bigram
        assert got["b"] == (1.0, 1 / 5)
        assert got["c"] == (1.0, None)
        # 'go stop' x2, 'stop go' x2 -> top 2 of 4
        assert got["d"] == (2 / 5, 0.5)


class TestCanonicalDocs:
    def test_longest_wins_tie_min_id(self, spark):
        from sparkcheck.pipeline.dedup import canonical_docs
        docs = spark.createDataFrame(
            [("a", "x" * 10), ("b", "x" * 20), ("c", "x" * 20),
             ("d", "solo doc")],
            "doc_id string, text string")
        clusters = spark.createDataFrame(
            [("a", "a"), ("b", "a"), ("c", "a")], "id string, cluster string")
        got = {r["id"]: (r["cluster"], r["keep"]) for r in
               canonical_docs(docs, clusters).collect()}
        # b and c tie at 20 chars -> min id b kept; a dropped
        assert got["b"] == ("a", True)
        assert got["c"] == ("a", False)
        assert got["a"] == ("a", False)
        # unclustered doc is its own representative
        assert got["d"] == ("d", True)

    def test_one_keep_per_cluster(self, spark):
        from sparkcheck.pipeline.dedup import (canonical_docs,
                                               duplicate_clusters,
                                               jaccard_pairs)
        rows = [(f"d{i}", f"the quick item{i//2} alpha{i//2} beta{i//2}")
                for i in range(20)]
        docs = spark.createDataFrame(rows, "doc_id string, text string")
        pairs = jaccard_pairs(docs, "doc_id", "text", shingle_n=2,
                              threshold=0.5)
        labels = duplicate_clusters(pairs)
        rep = canonical_docs(docs, labels)
        agg = (rep.groupBy("cluster")
               .agg(F.sum(F.col("keep").cast("int")).alias("kept")).collect())
        assert all(r["kept"] == 1 for r in agg)
        assert rep.count() == 20  # every doc accounted for


class TestQualityFilter:
    def test_rule_booleans(self, spark):
        from sparkcheck.pipeline.text import quality_filter
        docs = spark.createDataFrame(
            [("short", "too few"),
             ("spam", "buy buy buy buy buy buy buy buy buy buy"),
             ("noisy", "@@@ ### $$$ %%% ^^^ &&& *** ((( ))) !!!"),
             ("good", "the quick brown fox jumps over a lazy dog and "
                      "runs to the hill in the morning light again")],
            "doc_id string, text string")
        qf = quality_filter(docs, "text", min_tokens=5,
                            max_nonalpha_ratio=0.2,
                            min_stopword_ratio=0.05,
                            max_top_token_ratio=0.5)
        got = {r["doc_id"]: r.asDict() for r in qf.collect()}
        assert not got["short"]["ok_tokens"]
        assert not got["spam"]["ok_repetition"]  # one token dominates
        assert not got["noisy"]["ok_nonalpha"]
        assert got["good"]["passes"]
        assert not any(got[d]["passes"] for d in ("short", "spam", "noisy"))

    def test_map_side_only(self, spark):
        """The quality gate must stay a streaming filter — no shuffle."""
        from sparkcheck.pipeline.text import quality_filter
        docs = spark.createDataFrame(
            [("a", "the quick brown fox")], "doc_id string, text string")
        plan = quality_filter(docs).sample(1.0)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "Exchange" not in plan

    def test_long_diverse_doc_linear(self, spark):
        """top_share must be the sorted-run fold, not filter-per-distinct:
        a 50k-distinct-token doc is ~2.5e9 lambda evals under the quadratic
        form (minutes) vs one O(n log n) fold (well under the timeout)."""
        import time

        from sparkcheck.pipeline.text import quality_filter
        text = " ".join(f"tok{i}" for i in range(50_000)) + " the and of"
        docs = spark.createDataFrame([("big", text), ("rep", "a a a b")],
                                     "doc_id string, text string")
        t0 = time.monotonic()
        got = {r["doc_id"]: r.asDict()
               for r in quality_filter(docs, min_stopword_ratio=0.0).collect()}
        assert time.monotonic() - t0 < 60
        assert got["big"]["ok_repetition"]      # top share 1/50003
        assert not got["rep"]["ok_repetition"]  # top share 3/4 > 0.5

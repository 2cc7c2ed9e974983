"""Unit tests for training-data ops: dedup family, similarity search,
text analysis, multimodal plumbing."""

from __future__ import annotations

import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from logray.ops import dedup, multimodal, similarity, text as text_ops

DOCS = "/root/testdata/sf0.001/documents.parquet"
EMB = "/root/testdata/sf0.001/embeddings.parquet"


@pytest.fixture()
def docs_table():
    return pq.read_table(DOCS)


def _ds(table):
    import ray.data

    return ray.data.from_arrow(table)


# ------------------------------------------------------------------ text ----

def test_token_counts(ray_session):
    t = pa.table({"text": ["one two  three", "", "a-b c", None]})
    out = text_ops.add_token_counts(t)
    assert out["n_tokens_ws"].to_pylist() == [3, 0, 2, None]
    assert out["n_tokens_bpe"].to_pylist() == [3, 0, 4, None]


def test_fingerprint_matches_md5():
    import hashlib

    t = pa.table({"text": ["Hello World", "x"]})
    out = text_ops.add_fingerprint(t, method="md5")
    assert out["fingerprint"].to_pylist()[0] == hashlib.md5(b"hello world").hexdigest()


def test_fingerprint_default_is_vectorized_rolling():
    """r4: the scale path (rolling hash, hex) is the DEFAULT; md5 is
    the opt-in oracle mode. Case-insensitive, order-sensitive,
    deterministic 16-hex-char output."""
    t = pa.table({"text": ["Hello World", "world hello",
                           "hello  WORLD", "x"]})
    fp = text_ops.add_fingerprint(t)["fingerprint"].to_pylist()
    assert all(len(f) == 16 and set(f) <= set("0123456789abcdef")
               for f in fp)
    assert fp[0] == fp[2]  # lowercased token stream identical
    assert fp[0] != fp[1]  # order-sensitive
    assert fp[0] != fp[3]


def test_rolling_fingerprint_order_sensitive():
    t = pa.table({"text": ["a b c", "c b a", "a b c"]})
    out = text_ops.add_rolling_fingerprint(t)["rolling_fp"].to_pylist()
    assert out[0] != out[1] and out[0] == out[2]


def test_langid():
    t = pa.table({"text": [
        "the cat and the dog went to the park with a ball",
        "der Hund ist nicht mit der Katze und ein Vogel im Haus",
        "el perro y el gato en la casa con una pelota es de madrid",
        "le chien et le chat dans la maison pour une balle qui est",
        "这是一个中文句子用来测试语言识别",
        "zzz qqq kkk",
    ]})
    out = text_ops.LangIdStage()(t)
    assert out["lang_pred"].to_pylist() == ["en", "de", "es", "fr", "zh", "unknown"]


def test_quality_score_ranges(docs_table):
    out = text_ops.add_quality_score(docs_table)
    q = out["quality"].to_pylist()
    assert all(0.0 <= v <= 1.0 for v in q)
    # symbol soup scores below clean prose
    t2 = text_ops.add_quality_score(pa.table({"text": [
        "the quick brown fox jumps over the lazy dog and runs to the hills again "
        "with a friend of the family in tow for a long day of play",
        "@#$%^&*!!! ~~ ??? ###"]}))
    qq = t2["quality"].to_pylist()
    assert qq[0] > qq[1]


# ----------------------------------------------------------------- dedup ----

def test_exact_dedup(ray_session, docs_table):
    dup = docs_table.slice(0, 50)
    dup = dup.set_column(dup.schema.get_field_index("doc_id"), "doc_id",
                         pa.array(np.arange(10_000, 10_050)))
    both = pa.concat_tables([docs_table, dup])
    out = dedup.exact_dedup(_ds(both)).to_pandas()
    assert len(out) == docs_table.num_rows  # originals all unique
    # survivors are the min-id copies
    assert out["doc_id"].max() < 10_000


def test_minhash_lsh_dedup_finds_planted(ray_session, docs_table):
    base = docs_table.slice(0, 100)
    texts = base["text"].to_pylist()
    # plant: two exact copies + one light edit of doc 0
    edited = texts[0].replace(" the ", " thee ", 1) if " the " in texts[0] else texts[0] + " tail"
    extra = pa.table({
        "doc_id": pa.array([9001, 9002, 9003], pa.int64()),
        "text": pa.array([texts[0], texts[1], edited]),
        "lang": pa.array(["en"] * 3), "source": pa.array(["dup"] * 3),
        "n_chars": pa.array([len(texts[0]), len(texts[1]), len(edited)], pa.int64()),
    })
    both = pa.concat_tables([base, extra.select(base.column_names)], promote_options="default")
    out = dedup.minhash_lsh_dedup(_ds(both), threshold=0.7).to_pandas()
    by_id = out.set_index("doc_id")
    assert by_id.loc[9001, "cluster_id"] == by_id.loc[0, "cluster_id"] == 0
    assert by_id.loc[9002, "cluster_id"] == 1
    assert by_id.loc[9003, "cluster_id"] == 0  # light edit clusters with original
    assert bool(by_id.loc[0, "keep"]) and not bool(by_id.loc[9001, "keep"])
    # the testdata has its own planted near-dups: docs 50 and 82 cluster with 0
    assert by_id.loc[50, "cluster_id"] == 0 and by_id.loc[82, "cluster_id"] == 0
    # a genuinely unique doc keeps itself (verified: doc 3 has no partner ≥0.3)
    assert bool(by_id.loc[3, "keep"]) and by_id.loc[3, "cluster_id"] == 3


def test_simhash_dedup_finds_planted(ray_session, docs_table):
    base = docs_table.slice(0, 100)
    texts = base["text"].to_pylist()
    extra = pa.table({
        "doc_id": pa.array([9001], pa.int64()),
        "text": pa.array([texts[3]]),
        "lang": pa.array(["en"]), "source": pa.array(["dup"]),
        "n_chars": pa.array([len(texts[3])], pa.int64()),
    })
    both = pa.concat_tables([base, extra.select(base.column_names)], promote_options="default")
    out = dedup.simhash_dedup(_ds(both)).to_pandas().set_index("doc_id")
    assert out.loc[9001, "cluster_id"] == out.loc[3, "cluster_id"] == 3
    assert not bool(out.loc[9001, "keep"])


def test_minhash_dedup_distributed_cc_path(ray_session, docs_table):
    """High-duplicate-rate corpus with the driver union-find disabled
    (cc_driver_threshold=0): clustering must flow through the distributed
    min-label-propagation path and still produce identical labels."""
    base = docs_table.slice(0, 40)
    texts = base["text"].to_pylist()
    # plant 3 copies of each of the first 10 docs → dup rate ~43%
    n_copies, n_src = 3, 10
    extra = pa.table({
        "doc_id": pa.array([9000 + c * n_src + i for c in range(n_copies)
                            for i in range(n_src)], pa.int64()),
        "text": pa.array([texts[i] for _ in range(n_copies)
                          for i in range(n_src)]),
        "lang": pa.array(["en"] * (n_copies * n_src)),
        "source": pa.array(["dup"] * (n_copies * n_src)),
        "n_chars": pa.array([len(texts[i]) for _ in range(n_copies)
                             for i in range(n_src)], pa.int64()),
    })
    both = pa.concat_tables([base, extra.select(base.column_names)],
                            promote_options="default")
    dist = (dedup.minhash_lsh_dedup(_ds(both), threshold=0.9,
                                    cc_driver_threshold=0)
            .to_pandas().set_index("doc_id").sort_index())
    drv = (dedup.minhash_lsh_dedup(_ds(both), threshold=0.9)
           .to_pandas().set_index("doc_id").sort_index())
    pd.testing.assert_frame_equal(dist, drv)
    # hot_broadcast_threshold=0 forces the fully-distributed semi-join hot
    # filter (no driver collect of bucket keys) — labels must be identical
    semi = (dedup.minhash_lsh_dedup(_ds(both), threshold=0.9,
                                    hot_broadcast_threshold=0)
            .to_pandas().set_index("doc_id").sort_index())
    pd.testing.assert_frame_equal(semi, drv)
    for i in range(n_src):
        for c in range(n_copies):
            assert dist.loc[9000 + c * n_src + i, "cluster_id"] == dist.loc[i, "cluster_id"]
            assert not bool(dist.loc[9000 + c * n_src + i, "keep"])
        assert bool(dist.loc[i, "keep"]) or dist.loc[i, "cluster_id"] < i


def test_ngram_jaccard_pairs(ray_session):
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": ["the quick brown fox jumps", "the quick brown fox jumped",
                 "completely different words here"],
    })
    out = dedup.ngram_jaccard_pairs(_ds(t), threshold=0.5).to_pandas()
    assert len(out) == 1
    assert (out.iloc[0]["a"], out.iloc[0]["b"]) == (1, 2)
    assert out.iloc[0]["jaccard"] > 0.7
    # kernel sanity
    assert dedup.ngram_jaccard("abc", "abc") == 1.0
    assert dedup.ngram_jaccard("abc", "xyz") == 0.0


def test_embedding_neardup(ray_session):
    emb = pq.read_table(EMB)
    V = np.stack(emb["embedding"].to_pandas().to_numpy())
    dup = V[5] * 2.0  # same direction, different norm -> cosine 1.0
    extra = pa.table({
        "vec_id": pa.array([9001], pa.int64()),
        "embedding": pa.array([dup.astype(np.float32)], emb.schema.field("embedding").type),
        "label": pa.array([0], pa.int32()),
    })
    both = pa.concat_tables([emb, extra.select(emb.column_names)], promote_options="default")
    out = dedup.embedding_neardup(_ds(both), threshold=0.98).to_pandas().set_index("vec_id")
    assert out.loc[9001, "cluster_id"] == out.loc[5, "cluster_id"] == 5


# ------------------------------------------------------------ similarity ----

def test_ann_topk_matches_bruteforce(ray_session):
    emb = pq.read_table(EMB)
    V = np.stack(emb["embedding"].to_pandas().to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_pylist()
    Q = V[[0, 7]]
    got = similarity.ann_topk(_ds(emb), Q, k=5)
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    S = Vn @ Qn.T
    for qi in range(2):
        want = [ids[i] for i in np.argsort(-S[:, qi])[:5]]
        sub = got[got["query_id"] == qi].sort_values("rank")["vec_id"].tolist()
        assert sub == want
        assert got[got["query_id"] == qi].iloc[0]["cosine"] == pytest.approx(1.0)


def test_ivf_search_recall(ray_session):
    emb = pq.read_table(EMB)
    V = np.stack(emb["embedding"].to_pandas().to_numpy()).astype(np.float64)
    Q = V[[3, 11, 42]]
    idx = similarity.IvfIndex(n_lists=8).fit(V)
    assigned = _ds(emb).map_batches(idx.assign_stage(), batch_format="pyarrow")
    got = idx.search(assigned, Q, k=5, nprobe=4)
    brute = similarity.ann_topk(_ds(emb), Q, k=5)
    # recall@5 with nprobe=half the lists should be high; self-hit must survive
    for qi in range(3):
        g = set(got[got["query_id"] == qi]["vec_id"])
        b = set(brute[brute["query_id"] == qi]["vec_id"])
        assert len(g & b) >= 3
        assert brute[brute["query_id"] == qi].iloc[0]["vec_id"] in g


# ------------------------------------------------------------- multimodal ---

def test_multimodal_fake_decode(ray_session):
    t = multimodal.make_fake_media_table(20)
    out = _ds(t).map_batches(
        multimodal.DecodeImageStage, fn_constructor_kwargs={"decode": "fake"},
        concurrency=1, batch_size=8, batch_format="pyarrow").to_pandas()
    assert len(out) == 20
    assert out["width"].between(64, 320).all()
    assert out["mean_luma"].between(0, 1).all()
    assert out["phash64"].nunique() == 20
    # determinism
    out2 = multimodal.DecodeImageStage(decode="fake")(t).to_pandas()
    assert (out.sort_values("media_id")["phash64"].to_numpy()
            == out2.sort_values("media_id")["phash64"].to_numpy()).all()


def test_multimodal_real_decode_raises():
    t = multimodal.make_fake_media_table(2)
    with pytest.raises(NotImplementedError):
        multimodal.DecodeImageStage(decode="real")(t)


def test_audio_and_frame_plan():
    t = multimodal.make_fake_media_table(5, kind="audio")
    out = multimodal.AudioFeatureStage(decode="fake")(t)
    assert out["duration_ms"].to_pylist() == [int(len(p) * 1000 / 32000) for p in t["payload"].to_pylist()]
    vid = out.set_column(out.schema.get_field_index("duration_ms"), "duration_ms",
                         pa.array([3500, 900, 0, None, 2000], pa.int32()))
    plan = multimodal.frame_sample_plan(vid, every_ms=1000)
    per = plan.to_pandas().groupby("media_id").size().to_dict()
    assert per[0] == 4 and per[1] == 1 and per[2] == 1 and per[3] == 1 and per[4] == 2


def test_hll_approx_distinct_within_tolerance(ray_session):
    """HLL estimate within ~5% of exact for 10k distinct over 40k rows,
    and exactly mergeable across arbitrary batch splits."""
    import numpy as np
    import ray.data

    from logray.ops.sketch import _hll_estimate, _hll_partial, approx_distinct

    rng = np.random.default_rng(11)
    users = rng.integers(0, 10_000, 40_000)
    types = np.array(["a", "b"])[(users % 2)]
    t = pa.table({"event_type": pa.array(types),
                  "user_id": pa.array(users, pa.int64())})
    out = (approx_distinct(ray.data.from_arrow(t), ["event_type"], "user_id")
           .to_pandas().set_index("event_type"))
    exact_a = len(set(users[users % 2 == 0]))
    exact_b = len(set(users[users % 2 == 1]))
    assert abs(out.loc["a", "n_approx"] - exact_a) / exact_a < 0.05
    assert abs(out.loc["b", "n_approx"] - exact_b) / exact_b < 0.05

    # merge-exactness: sketch of the whole == max-merge of split sketches
    import pandas as pd
    s = pd.Series(users)
    whole = _hll_partial(s, 12)
    merged = np.maximum(_hll_partial(s[:13_000], 12), _hll_partial(s[13_000:], 12))
    assert (whole == merged).all()
    assert _hll_estimate(whole) == _hll_estimate(merged)


# ------------------------------------------------ relational / sketch v2 ----

def test_hash_join_matches_pandas(ray_session):
    import ray.data

    from logray.ops import relational

    rng = np.random.default_rng(3)
    left = pd.DataFrame({"k": rng.integers(0, 200, 5000),
                         "lv": rng.normal(size=5000)})
    right = pd.DataFrame({"k": np.arange(0, 150, dtype=np.int64),
                          "rv": np.arange(150, dtype=np.int64) * 10})
    out = relational.hash_join(
        ray.data.from_pandas(left.copy()), ray.data.from_pandas(right.copy()),
        on="k", num_buckets=7).to_pandas()
    want = left.merge(right, on="k", how="inner")
    key = ["k", "lv", "rv"]
    got = out[key].sort_values(key).reset_index(drop=True)
    want = want[key].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    # int columns must come back int (no null-padding float widening)
    assert out["rv"].dtype.kind == "i"


def test_hash_join_left_outer(ray_session):
    import ray.data

    from logray.ops import relational

    left = pd.DataFrame({"k": [1, 2, 3, 4], "lv": [10, 20, 30, 40]})
    right = pd.DataFrame({"k": [2, 4], "rv": [200, 400]})
    out = relational.hash_join(ray.data.from_pandas(left),
                               ray.data.from_pandas(right),
                               on="k", how="left", num_buckets=3).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == [1, 2, 3, 4]
    assert out["rv"].isna().tolist() == [True, False, True, False]


def test_hash_join_string_key_and_collision_guard(ray_session):
    import ray.data

    from logray.ops import relational

    left = pd.DataFrame({"k": ["a", "b", "c"], "v": [1, 2, 3]})
    right = pd.DataFrame({"k": ["b", "c", "d"], "w": [20, 30, 40]})
    out = relational.hash_join(ray.data.from_pandas(left),
                               ray.data.from_pandas(right), on="k").to_pandas()
    assert sorted(out["k"]) == ["b", "c"]
    bad = pd.DataFrame({"k": ["a"], "v": [9]})
    with pytest.raises(ValueError, match="collision"):
        relational.hash_join(ray.data.from_pandas(left),
                             ray.data.from_pandas(bad), on="k")


def test_stable_hash64_null_does_not_perturb_large_int_keys():
    """Regression: an int64 column containing a null used to widen to
    float64 in to_numpy, rounding |key| > 2^53 before hashing — the same
    key hashed differently depending on its batch's null content, silently
    dropping join matches."""
    from logray.functions.hashing import stable_hash64

    big = 4611686018427400249  # > 2^53: float64 rounds it
    clean = stable_hash64(pa.array([big, 7], pa.int64()))
    dirty = stable_hash64(pa.array([big, None], pa.int64()))
    assert clean[0] == dirty[0] == big
    assert dirty[1] == 0  # nulls map to 0


def test_bloom_null_safe_and_no_false_negatives(ray_session):
    """Regression: null-containing probe batches used to hash large int
    keys differently than the build side (false negatives), and null
    string keys crashed the hash with a NaN fancy-index."""
    import ray.data

    from logray.ops.bloom import BloomFilter, bloom_prune, build_bloom

    big = 4611686018427400249
    f = BloomFilter()
    f.add(pa.array([big, 5], pa.int64()))
    got = f.contains(pa.array([big, None, 5], pa.int64()))
    assert bool(got[0]) and bool(got[2])  # no false negatives with a null present

    sf = BloomFilter()
    sf.add(pa.array(["x", None], pa.string()))
    sgot = sf.contains(pa.array([None, "x", "zzz-not-added"], pa.string()))
    assert bool(sgot[0]) and bool(sgot[1])  # null added => null probes True

    ds = ray.data.from_arrow(pa.table({"k": pa.array([big, None, 5, 99], pa.int64())}))
    bloom = build_bloom(ray.data.from_arrow(
        pa.table({"k": pa.array([big, 5], pa.int64())})), "k")
    kept = bloom_prune(ds, "k", bloom).to_pandas()["k"].tolist()
    assert big in kept and 5 in kept


def test_hash_join_null_int64_keys_route_consistently(ray_session):
    """Large int64 keys must join correctly even when one side's batches
    contain nulls (the stable_hash64 regression surfaced through joins)."""
    import ray.data

    from logray.ops import relational

    big = 4611686018427400249
    left = pa.table({"k": pa.array([big, None, 3], pa.int64()),
                     "v": pa.array([1, 2, 3], pa.int64())})
    right = pa.table({"k": pa.array([big, 4], pa.int64()),
                      "w": pa.array([10, 40], pa.int64())})
    out = relational.hash_join(ray.data.from_arrow(left),
                               ray.data.from_arrow(right), on="k").to_pandas()
    assert out["k"].tolist() == [big] and out["v"].tolist() == [1]


def test_hash_join_unifies_mixed_key_types(ray_session):
    """int32 vs int64 join keys unify to int64 instead of emitting
    schema-mismatched union blocks; an un-unifiable mix raises at plan
    time with a clear message."""
    import ray.data

    from logray.ops import relational

    left = pa.table({"k": pa.array([1, 2, 3], pa.int32()),
                     "v": pa.array([1, 2, 3], pa.int64())})
    right = pa.table({"k": pa.array([2, 3, 4], pa.int64()),
                      "w": pa.array([20, 30, 40], pa.int64())})
    out = relational.hash_join(ray.data.from_arrow(left),
                               ray.data.from_arrow(right), on="k").to_pandas()
    assert sorted(out["k"].tolist()) == [2, 3]
    bad = pa.table({"k": pa.array(["2"], pa.string()), "w": pa.array([1], pa.int64())})
    with pytest.raises(ValueError, match="incompatible types"):
        relational.hash_join(ray.data.from_arrow(left),
                             ray.data.from_arrow(bad), on="k")


def test_skew_join_hot_key_missing_on_right(ray_session):
    """Regression: a hot key detected on the left with zero right-side
    matches used to crash broadcast_join on a column-less empty frame."""
    import ray.data

    from logray.ops import relational

    left = pa.table({"k": pa.array([7] * 50 + [1, 2], pa.int64()),
                     "v": pa.array(range(52), pa.int64())})
    right = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                      "w": pa.array([10, 20, 30], pa.int64())})
    out = relational.skew_join(ray.data.from_arrow(left),
                               ray.data.from_arrow(right), "k",
                               hot_threshold=10).to_pandas()
    assert sorted(out["k"].tolist()) == [1, 2]  # hot key 7 correctly absent


def test_semi_filter(ray_session):
    import ray.data

    from logray.ops import relational

    t = pa.table({"k": pa.array([1, 2, 3, 4, 5], pa.int64())})
    ds = ray.data.from_arrow(t)
    keys = np.array([2, 4, 9], np.int64)
    assert sorted(relational.semi_filter(ds, "k", keys).to_pandas()["k"]) == [2, 4]
    assert sorted(relational.semi_filter(ds, "k", keys, keep=False)
                  .to_pandas()["k"]) == [1, 3, 5]
    assert relational.semi_filter(ds, "k", np.zeros(0, np.int64)).count() == 0


def test_heavy_hitters_finds_skewed_top(ray_session):
    import ray.data

    from logray.ops.sketch import heavy_hitters

    rng = np.random.default_rng(7)
    # zipf-ish: user 0 has 5000 rows, 1..9 have 500, long tail of 1s
    vals = np.concatenate([np.zeros(5000, np.int64),
                           np.repeat(np.arange(1, 10), 500),
                           np.arange(100, 8000)])
    rng.shuffle(vals)
    ds = ray.data.from_arrow(pa.table({"u": pa.array(vals)})).repartition(8)
    out = heavy_hitters(ds, "u", k=10, capacity=40)
    assert int(out.iloc[0]["u"]) == 0
    assert set(out["u"].astype(int)) == set(range(10))
    # MG lower-bound + error-bound invariants
    true_top = 5000
    est = int(out.iloc[0]["est_count"])
    err = int(out.iloc[0]["max_err"])
    assert est <= true_top <= est + err


def test_heavy_hitters_exact_when_capacity_covers(ray_session):
    import ray.data

    from logray.ops.sketch import heavy_hitters

    vals = np.repeat(np.arange(20), np.arange(1, 21))
    ds = ray.data.from_arrow(pa.table({"u": pa.array(vals, pa.int64())})).repartition(4)
    out = heavy_hitters(ds, "u", k=5, capacity=50)
    assert out["max_err"].eq(0).all()
    assert out["est_count"].tolist() == [20, 19, 18, 17, 16]


def test_approx_quantiles_tolerance(ray_session):
    import ray.data

    from logray.ops.sketch import approx_quantiles

    rng = np.random.default_rng(5)
    v = rng.normal(50, 10, 50_000)
    g = np.array(["x", "y"])[(np.arange(50_000) % 2)]
    ds = ray.data.from_arrow(pa.table({"g": pa.array(g), "v": pa.array(v)})).repartition(6)
    out = approx_quantiles(ds, ["g"], "v", [0.5, 0.95], bins=2048).set_index("g")
    width = (v.max() - v.min()) / 2048
    for grp in ("x", "y"):
        sel = v[(g == grp)]
        for q, col in ((0.5, "q0.5"), (0.95, "q0.95")):
            assert abs(out.loc[grp, col] - np.quantile(sel, q)) <= 2 * width


def test_unigram_tokenizer_em_and_viterbi(ray_session):
    """Unigram-LM tokenizer: (1) EM log-likelihood is non-decreasing
    (the EM guarantee — each round's ll is computed under the incoming
    θ); (2) a heavily shared suffix survives pruning as a multi-char
    piece and Viterbi actually uses it (pieces < chars); (3) every
    word's pieces concatenate back to it."""
    import ray.data

    from logray.ops import unigram
    from logray.ops.bpe import word_frequencies

    words = (["darkness", "kindness", "happiness", "unhappiness",
              "sadness", "boldness"] * 30 + ["dark", "kind", "happy",
              "un", "sad", "bold"] * 10)
    rng = np.random.default_rng(3)
    docs = [" ".join(rng.choice(words, size=12)) for _ in range(80)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(80), pa.int64()),
        "text": pa.array(docs)})).repartition(4)

    wf = word_frequencies(ds)
    theta = unigram.seed_vocab(dict(zip(wf["word"], wf["c"])))
    wfd = ray.data.from_pandas(wf).repartition(2)
    lls = []
    for _ in range(3):
        theta, ll = unigram._em_round(wfd, theta, 8)
        lls.append(ll)
    assert lls[1] >= lls[0] - 1e-9 and lls[2] >= lls[1] - 1e-9

    final = unigram.train_unigram(wf, vocab_size=64, em_rounds=2)
    assert any(len(p) > 1 for p in final), "no multi-char piece survived"
    logtheta = {p: float(np.log(v)) for p, v in final.items() if v > 0}
    pieces = unigram.viterbi_encode("unhappiness", logtheta, 8)
    assert "".join(pieces) == "unhappiness"
    assert len(pieces) < len("unhappiness"), "Viterbi never compressed"

    out = unigram.unigram_token_counts(
        ds, vocab_size=64, em_rounds=1).to_pandas()
    assert out["roundtrip_ok"].all()
    assert (out["n_pieces"] >= out["n_words"]).all()


def test_robots_rfc_semantics():
    """RFC 9309 rules pinned case by case: longest match wins, Allow
    wins length ties, wildcards and $ anchors, group selection with an
    exact agent beating '*', empty Disallow is allow-all."""
    from logray.ops.robots import allowed_mask, compile_rules, parse_robots

    txt = ("User-agent: archiver\nDisallow: /\n\n"
           "User-agent: *\nDisallow: /private/\nAllow: /private/ok/\n"
           "Disallow: /*.tmp$\nDisallow: /page/\nAllow: /page/\n")
    rules = compile_rules(parse_robots(txt))
    paths = pa.array(["/page/1", "/private/x", "/private/ok/x",
                      "/a/b.tmp", "/a/b.tmp.bak", "/other"])
    assert allowed_mask(paths, rules).tolist() == [
        True,   # equal-length Allow/Disallow tie → Allow
        False,  # /private/ matches
        True,   # /private/ok/ (len 12) beats /private/ (len 9)
        False,  # /*.tmp$ anchors at end
        True,   # .tmp not at end → $ anchor must not fire
        True,   # no rule
    ]
    # exact agent group beats '*', and its Disallow:/ blocks everything
    arch = compile_rules(parse_robots(txt, agent="archiver"))
    assert allowed_mask(paths, arch).tolist() == [False] * 6
    # empty robots / empty Disallow → allow-all
    assert parse_robots("User-agent: *\nDisallow:\n") == []
    assert parse_robots("# only comments\n") == []


def test_extract_links_hazards():
    from logray.ops.text import extract_links

    t = pa.array([
        '<a href="http://a/1">x</a> mid <a href="/rel">y</a>'
        ' <a href="http://b/2">',   # unterminated anchor tag still parses
        "no links at all",
        '<a href="broken',           # no closing quote → dropped
        None,
        '<a href=""></a>',           # empty target kept (caller filters)
    ])
    assert extract_links(t).to_pylist() == [
        ["http://a/1", "/rel", "http://b/2"], [], [], [], [""]]


def test_canonicalize_urls_hazards():
    from logray.ops.text import canonicalize_urls

    urls = pa.array([
        "HTTPS://EXAMPLE.com:443//a//b/?b=2&a=1&utm_x=9#z",
        "http://h:8080/x",            # non-default port kept
        "http://WWW.Site.example:80/en/doc/5#frag",
        "http://h/p?utm_a=1&utm_b=2",  # all params tracking → no query
        "http://h",                    # empty path → '/'
        "http://h/p?z=1&y=2&z=0",      # duplicate names keep both, sorted
        "not a url",
        None,
    ])
    assert canonicalize_urls(urls).to_pylist() == [
        "https://example.com/a/b?a=1&b=2",
        "http://h:8080/x",
        "http://www.site.example/en/doc/5",
        "http://h/p",
        "http://h/",
        "http://h/p?y=2&z=0&z=1",
        None,
        None,
    ]


def test_link_prediction_hand_graph(ray_session):
    """4-cycle 1-2-3-4-1: the two diagonals (1,3) and (2,4) are the only
    non-adjacent candidate pairs, each closed by two degree-2 middles →
    cn=2, ra_q=2·(1e9//2)=1e9, jaccard=2/(2+2−2)=1 → jac_q=1e6."""
    import ray.data

    from logray.ops.graph import link_prediction

    edges = ray.data.from_arrow(pa.table({
        "u": pa.array([1, 2, 1, 3], pa.int64()),
        "v": pa.array([2, 3, 4, 4], pa.int64())}))
    out = link_prediction(edges, k=10)
    got = {(r.u, r.v): (r.cn, r.ra_q, r.jac_q) for r in out.itertuples()}
    assert got == {(1, 3): (2, 10**9, 10**6), (2, 4): (2, 10**9, 10**6)}
    # hub cap: with max_middle_degree=1 no middle qualifies → no pairs
    assert len(link_prediction(edges, max_middle_degree=1, k=10)) == 0


def test_cooccurrence_min_support(ray_session):
    """Support threshold: pair (1,2) co-occurs in two groups, (1,3) in
    one — min_support=2 keeps only the former."""
    import ray.data

    from logray.ops.graph import cooccurrence_edges

    ds = ray.data.from_arrow(pa.table({
        "g": pa.array([10, 10, 20, 20, 20], pa.int64()),
        "i": pa.array([1, 2, 1, 2, 3], pa.int64())}))
    got = cooccurrence_edges(ds, "g", "i", min_support=2).to_pandas()
    assert sorted(map(tuple, got[["u", "v"]].to_numpy())) == [(1, 2)]
    all_edges = cooccurrence_edges(ds, "g", "i").to_pandas()
    assert sorted(map(tuple, all_edges[["u", "v"]].to_numpy())) == [
        (1, 2), (1, 3), (2, 3)]


def test_tdigest_quantiles_rank_bound(ray_session):
    """t-digest grouped quantiles: realized RANK error stays inside the
    documented post-merge bound 3·2π√(q(1−q))/δ on a heavy-tailed
    distribution, across batch splits (merge path exercised by
    repartition); centroid partials stay ≤ ~δ per group per batch."""
    import ray.data

    from logray.ops.sketch import _tdigest_cluster, tdigest_quantiles

    rng = np.random.default_rng(11)
    n = 60_000
    v = rng.lognormal(0, 2, n)
    g = np.array(["x", "y"])[(np.arange(n) % 2)]
    ds = ray.data.from_arrow(
        pa.table({"g": pa.array(g), "v": pa.array(v)})).repartition(8)
    delta = 256.0
    out = (tdigest_quantiles(ds, ["g"], "v", [0.5, 0.99], delta=delta)
           .to_pandas().set_index("g"))
    for grp in ("x", "y"):
        sel = np.sort(v[g == grp])
        for q, col in ((0.5, "q0.5"), (0.99, "q0.99")):
            est = out.loc[grp, col]
            rank = np.searchsorted(sel, est) / len(sel)
            assert abs(rank - q) <= 3 * 2 * np.pi * np.sqrt(q * (1 - q)) / delta
    # size bound: one clustering pass emits ≤ ~δ centroids (+1 slack)
    m, w = _tdigest_cluster(v, np.ones(n), delta)
    assert len(m) <= delta + 1
    assert abs(w.sum() - n) < 1e-6  # weight conservation


def test_rolling_mean_and_dense_rank(ray_session):
    import ray.data

    from logray.ops import window

    df = pd.DataFrame({
        "k": ["a"] * 5 + ["b"] * 3,
        "o": [1, 2, 3, 4, 5, 1, 2, 3],
        "v": [10.0, 20.0, 30.0, 40.0, 50.0, 5.0, 5.0, 8.0],
    })
    ds = ray.data.from_pandas(df.copy())
    out = (window.rolling_mean(ds, "k", ["o"], "v", 3).to_pandas()
           .sort_values(["k", "o"]).reset_index(drop=True))
    assert out["rolling_mean"].tolist() == [10.0, 15.0, 20.0, 30.0, 40.0, 5.0, 5.0, 6.0]

    rk = (window.dense_rank(ds, "k", "v", descending=True).to_pandas()
          .sort_values(["k", "o"]).reset_index(drop=True))
    assert rk["rnk"].tolist() == [5, 4, 3, 2, 1, 2, 2, 1]


@pytest.mark.parametrize("threshold", [0, 2_000_000],
                         ids=["distributed", "driver_unionfind"])
def test_connected_components_path_and_singletons(ray_session, threshold):
    import ray.data

    from logray.ops import graph

    # path 0-1-2-3-4 (needs multi-round propagation), clique {10,11,12},
    # isolated node 20 (via nodes=), self-contained pair {30,31}
    edges = pd.DataFrame({
        "a": [0, 1, 2, 3, 10, 10, 11, 30],
        "b": [1, 2, 3, 4, 11, 12, 12, 31],
    }).astype("int64")
    nodes = pa.table({"id": pa.array([0, 1, 2, 3, 4, 10, 11, 12, 20, 30, 31],
                                     pa.int64())})
    out = graph.connected_components(
        ray.data.from_pandas(edges), nodes=ray.data.from_arrow(nodes),
        node_col="id",
        driver_threshold=threshold).to_pandas().set_index("node")["cluster_id"]
    assert all(out[i] == 0 for i in range(5))
    assert all(out[i] == 10 for i in (10, 11, 12))
    assert out[20] == 20
    assert out[30] == out[31] == 30


def test_connected_components_no_edges(ray_session):
    import ray.data

    from logray.ops import graph

    edges = ray.data.from_pandas(pd.DataFrame({"a": pd.Series([], dtype="int64"),
                                               "b": pd.Series([], dtype="int64")}))
    nodes = ray.data.from_arrow(pa.table({"id": pa.array([5, 6], pa.int64())}))
    out = graph.connected_components(edges, nodes=nodes, node_col="id").to_pandas()
    assert sorted(out["cluster_id"]) == [5, 6]


def test_ntile_matches_sql_semantics(ray_session):
    import duckdb
    import ray.data

    from logray.ops import window

    rng = np.random.default_rng(11)
    df = pd.DataFrame({"part": rng.choice(["a", "b", "c"], 997),
                       "id": np.arange(997, dtype=np.int64),
                       "v": rng.normal(size=997).round(3)})
    out = window.ntile(ray.data.from_pandas(df.copy()), "part",
                       [("v", False), ("id", False)], 4,
                       num_buckets=3).to_pandas()
    want = duckdb.sql(
        "SELECT id, ntile(4) OVER (PARTITION BY part ORDER BY v, id) AS tile "
        "FROM df").df()
    m = out[["id", "tile"]].merge(want, on="id", suffixes=("_got", "_want"))
    assert len(m) == 997
    assert (m["tile_got"] == m["tile_want"]).all()


def test_sql_ntile_tile_sizes():
    from logray.ops.window import _sql_ntile

    t = _sql_ntile(10, 4)
    # 10 rows / 4 tiles: sizes 3,3,2,2
    assert list(np.bincount(t)[1:]) == [3, 3, 2, 2]
    assert list(_sql_ntile(3, 5)) == [1, 2, 3]
    assert list(np.bincount(_sql_ntile(8, 4))[1:]) == [2, 2, 2, 2]


def test_lead_col(ray_session):
    import ray.data

    from logray.ops import window

    df = pd.DataFrame({"k": ["u", "u", "u", "w"], "o": [1, 2, 3, 1],
                       "v": [10.0, 20.0, 30.0, 5.0]})
    out = (window.lead_col(ray.data.from_pandas(df), "k", ["o"], "v",
                           num_buckets=2, out_col="nxt")
           .to_pandas().sort_values(["k", "o"]).reset_index(drop=True))
    assert out["nxt"].tolist()[:2] == [20.0, 30.0]
    assert np.isnan(out["nxt"].iloc[2]) and np.isnan(out["nxt"].iloc[3])


def test_arg_extreme(ray_session):
    import ray.data

    from logray.ops import relational

    rng = np.random.default_rng(5)
    df = pd.DataFrame({"k": rng.integers(0, 40, 2000),
                       "ord": rng.permutation(2000),
                       "payload": rng.integers(0, 10**6, 2000)})
    ds = ray.data.from_pandas(df.copy())
    got = (relational.arg_extreme(ds, ["k"], "ord", descending=True,
                                  num_buckets=5)
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = (df.sort_values(["k", "ord"], ascending=[True, False])
            .groupby("k").head(1).sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["k", "ord", "payload"]],
                                  want[["k", "ord", "payload"]])


def test_hash_join_full_outer(ray_session):
    import ray.data

    from logray.ops import relational

    left = pd.DataFrame({"k": [1, 2, 3], "lv": [10, 20, 30]})
    right = pd.DataFrame({"k": [2, 3, 4], "rv": [200, 300, 400]})
    out = relational.hash_join(ray.data.from_pandas(left),
                               ray.data.from_pandas(right),
                               on="k", how="outer", num_buckets=3).to_pandas()
    out = out.sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == [1, 2, 3, 4]
    assert out["lv"].isna().tolist() == [False, False, False, True]
    assert out["rv"].isna().tolist() == [True, False, False, False]


# ----------------------------------------------------------------- bloom ----

def test_bloom_no_false_negatives_and_low_fp():
    from logray.ops.bloom import BloomFilter

    keys = np.arange(0, 20_000, 2, dtype=np.int64)         # evens
    probe_absent = np.arange(1, 40_001, 2, dtype=np.int64)  # odds
    f = BloomFilter(m_bits=1 << 18, k=5)
    f.add(keys)
    assert f.contains(keys).all()                # no false negatives, ever
    fp = f.contains(probe_absent).mean()
    # m/n = 26 bits/key, k=5 => theoretical FP ~2e-4; allow slack
    assert fp < 0.01, fp


def test_bloom_merge_equals_single_build():
    from logray.ops.bloom import BloomFilter

    a, b = BloomFilter(1 << 12, 4), BloomFilter(1 << 12, 4)
    both = BloomFilter(1 << 12, 4)
    a.add(np.arange(100, dtype=np.int64))
    b.add(np.arange(100, 200, dtype=np.int64))
    both.add(np.arange(200, dtype=np.int64))
    assert (a.merge(b).bits == both.bits).all()


def test_bloom_string_keys():
    from logray.ops.bloom import BloomFilter

    f = BloomFilter(1 << 14, 4)
    f.add(pa.array(["alpha", "beta", "gamma"]))
    assert f.contains(pa.array(["alpha", "beta", "gamma"])).all()
    assert not f.contains(pa.array(["delta"]))[0] or True  # may FP; no crash


def test_bloom_distributed_build_and_prune(ray_session):
    from logray.ops import bloom as bloom_ops

    keys = pa.table({"k": pa.array(np.arange(0, 1000, 3, dtype=np.int64))})
    probe = pa.table({"k": pa.array(np.arange(1000, dtype=np.int64))})
    flt = bloom_ops.build_bloom(_ds(keys).repartition(4), "k",
                                m_bits=1 << 16, k=5)
    pruned = bloom_ops.bloom_prune(_ds(probe).repartition(3), "k", flt)
    got = set(pa.concat_tables(
        pruned.iter_batches(batch_size=10_000, batch_format="pyarrow")
    )["k"].to_pylist())
    want = set(range(0, 1000, 3))
    assert want <= got                   # every true key survives the prune
    assert len(got - want) < 100         # false positives are rare


# ------------------------------------------------- percent_rank / collect ----

def test_percent_rank_matches_sql_semantics(ray_session):
    from logray.ops import window

    df = pd.DataFrame({
        "grp": ["a"] * 4 + ["b"] * 1 + ["c"] * 3,
        "v":   [10, 20, 20, 30, 5, 1, 1, 1],
    })
    import ray.data

    out = window.percent_rank(ray.data.from_pandas(df), "grp", "v",
                              num_buckets=4).to_pandas()
    out = out.sort_values(["grp", "v"]).reset_index(drop=True)
    # a: ranks 1,2,2,4 over n=4 -> (r-1)/3 ; b singleton -> 0 ; c all ties -> 0
    assert out[out.grp == "a"].pct_rank.tolist() == [0.0, 1/3, 1/3, 1.0]
    assert out[out.grp == "b"].pct_rank.tolist() == [0.0]
    assert out[out.grp == "c"].pct_rank.tolist() == [0.0, 0.0, 0.0]


def test_collect_sorted_distinct(ray_session):
    from logray.ops import window
    import ray.data

    df = pd.DataFrame({"u": [1, 1, 1, 2, 2], "t": ["b", "a", "b", "z", "a"]})
    out = window.collect_sorted(ray.data.from_pandas(df), "u", "t",
                                num_buckets=2, out_col="types").to_pandas()
    got = dict(zip(out.u, out.types))
    assert got == {1: "a,b", 2: "a,z"}


# ------------------------------------------------------------------ pack ----

def test_pack_block_invariants():
    from logray.ops.pack import pack_block

    rng = np.random.default_rng(3)
    ids = np.arange(500, dtype=np.int64)
    toks = rng.integers(1, 400, size=500).astype(np.int64)
    toks[7] = 900                         # oversized doc
    pack_of, order = pack_block(ids, toks, budget=512)
    t_o = toks[order]
    assert len(pack_of) == 500
    sums = np.zeros(pack_of.max() + 1, dtype=np.int64)
    np.add.at(sums, pack_of, t_o)
    for p in range(len(sums)):
        members = t_o[pack_of == p]
        assert sums[p] <= 512 or len(members) == 1   # only oversize singletons
    # FFD density: at most one pack under half-full among multi-doc packs
    under_half = sum(1 for p in range(len(sums))
                     if sums[p] < 256 and (pack_of == p).sum() >= 1
                     and t_o[pack_of == p].max() <= 512)
    assert under_half <= 1, under_half


def test_pack_documents_coverage(ray_session):
    from logray.ops.pack import pack_documents

    t = pa.table({"doc_id": pa.array(np.arange(100, dtype=np.int64)),
                  "n_tok": pa.array((np.arange(100) % 90 + 10).astype(np.int64))})
    out = pa.concat_tables(
        pack_documents(_ds(t).repartition(3), token_col="n_tok",
                       id_col="doc_id", budget=128)
        .iter_batches(batch_size=10_000, batch_format="pyarrow"))
    assert sorted(out["doc_id"].to_pylist()) == list(range(100))  # each doc once
    df = out.to_pandas()
    sums = df.groupby("pack_id").n_tok.sum()
    assert (sums <= 128).all()
    # pack ids are content-derived: min doc_id of the pack
    assert (df.groupby("pack_id").doc_id.min() ==
            df.groupby("pack_id").doc_id.min().index).all()


# ---------------------------------------------------------------- kmeans ----

def test_kmeans_recovers_planted_clusters(ray_session):
    from logray.ops.similarity import kmeans

    rng = np.random.default_rng(11)
    centers = np.eye(4, 8)                       # 4 well-separated directions
    X = np.concatenate([
        c + rng.normal(0, 0.05, size=(50, 8)) for c in centers])
    t = pa.table({"vec_id": pa.array(np.arange(200, dtype=np.int64)),
                  "embedding": pa.array([list(map(float, r)) for r in X],
                                        pa.list_(pa.float32()))})
    ds = _ds(t).repartition(4)
    _, assign = kmeans(ds, k=4, iters=6, vec_col="embedding", sample_frac=0.5)
    out = pa.concat_tables(
        ds.map_batches(assign, batch_format="pyarrow")
        .iter_batches(batch_size=10_000, batch_format="pyarrow")).to_pandas()
    # every planted cluster maps to exactly one label
    lab_of = out.groupby(out.vec_id // 50).cluster_id.agg(
        lambda s: s.value_counts().index[0])
    purity = (out.cluster_id == out.vec_id.floordiv(50).map(lab_of)).mean()
    assert purity > 0.95, purity
    assert lab_of.nunique() == 4


def test_reservoir_sample_exact_and_block_invariant(ray_session):
    """Bottom-k priority sampling: exact k rows, equal to the local
    brute-force bottom-k, and invariant to how the input is blocked
    (the partials must be mergeable)."""
    import hashlib

    import pandas as pd
    import ray.data

    from logray.ops.relational import reservoir_sample

    import pyarrow as pa

    from logray.functions.hashing import stable_hash64
    from logray.ops.bloom import _splitmix64

    df = pd.DataFrame({"event_id": range(1000),
                       "value": [i * 0.5 for i in range(1000)]})
    want_md5 = (df.assign(__pri=df.event_id.astype(str).map(
                    lambda s: hashlib.md5(s.encode()).hexdigest()))
                  .sort_values(["__pri", "event_id"]).head(7)
                  .drop(columns="__pri").reset_index(drop=True))
    pri = _splitmix64(stable_hash64(
        pa.array(df.event_id.to_numpy())).view(np.uint64))
    want_h64 = (df.assign(__pri=pri)
                  .sort_values(["__pri", "event_id"]).head(7)
                  .drop(columns="__pri").reset_index(drop=True))
    # the two priority functions must actually pick different subsets for
    # this test to mean anything
    assert set(want_md5.event_id) != set(want_h64.event_id)
    for nblocks in (1, 4, 37):
        ds = ray.data.from_pandas(df).repartition(nblocks)
        got = reservoir_sample(ds, "event_id", 7, method="md5")
        pd.testing.assert_frame_equal(got, want_md5)
        got = reservoir_sample(ds, "event_id", 7)  # default: vectorized
        pd.testing.assert_frame_equal(got, want_h64)


def test_multimodal_resize_stage(ray_session):
    import ray.data

    t = multimodal.make_fake_media_table(20)
    decoded = multimodal.DecodeImageStage(decode="fake")(t)
    out = ray.data.from_arrow(decoded).map_batches(
        multimodal.ResizeImageStage,
        fn_constructor_kwargs={"decode": "fake", "max_side": 64},
        concurrency=2, batch_size=8, batch_format="pyarrow").to_pandas()
    assert len(out) == 20
    assert (out.width <= 64).all() and (out.height <= 64).all()
    assert (out.width >= 1).all() and (out.height >= 1).all()
    # aspect preserved within integer truncation: longer side hits max_side
    src = decoded.to_pandas()
    m = out.merge(src[["media_id", "width", "height"]], on="media_id",
                  suffixes=("", "_src"))
    assert (m[["width", "height"]].max(axis=1) == 64).all()  # sources all >64
    # payload replaced by a smaller deterministic thumbnail
    assert all(len(p) > 0 for p in out.payload)
    out2 = multimodal.ResizeImageStage(decode="fake", max_side=64)(decoded).to_pandas()
    assert list(out.sort_values("media_id").payload) == \
           list(out2.sort_values("media_id").payload)


def test_multimodal_resize_real_raises():
    t = multimodal.make_fake_media_table(2)
    decoded = multimodal.DecodeImageStage(decode="fake")(t)
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        multimodal.ResizeImageStage(decode="real")(decoded)


def test_hash_join_multikey_and_bucket_mixing(ray_session):
    """Multi-key join correctness + the bucket must mix ALL key columns —
    a low-cardinality first key alone would collapse the bucket space."""
    import ray.data

    from logray.functions.hashing import stable_hash64
    from logray.ops.relational import hash_join

    rng = np.random.default_rng(11)
    left = pd.DataFrame({"day": rng.integers(0, 3, 500),
                         "user_id": rng.integers(0, 200, 500),
                         "v": np.arange(500)})
    right = (left.groupby(["day", "user_id"], as_index=False)["v"].count()
             .rename(columns={"v": "n"}))
    got = hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                    on=["day", "user_id"]).to_pandas()
    want = left.merge(right, on=["day", "user_id"])
    key = ["day", "user_id", "v"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True)[want.columns.tolist()],
        want.sort_values(key).reset_index(drop=True))
    # distribution: mixing day+user spreads well past the 3 live buckets a
    # first-key-only scheme would produce
    h = np.zeros(len(left), np.int64)
    for c in ["day", "user_id"]:
        h = h * np.int64(1000003) + stable_hash64(pa.array(left[c].to_numpy()))
    assert len(np.unique(np.abs(h) % 64)) > 32


def test_stable_hash64_types():
    from logray.functions.hashing import stable_hash64

    s = stable_hash64(pa.array(["a", "b", None, "a"]))
    assert s[0] == s[3] and s[2] == 0 and s[0] != s[1]
    i = stable_hash64(pa.array([1, 2, None], pa.int64()))
    assert i[0] == 1 and i[2] == 0
    ts = stable_hash64(pa.array([1000, None], pa.timestamp("us")))
    assert ts[0] == 1000 and ts[1] == 0
    f = stable_hash64(pa.array([1.5, float("nan")]))
    assert f[1] == 0 and f[0] == np.float64(1.5).view(np.int64)


def test_skew_join_matches_plain_join(ray_session):
    """Skew-split join == plain join, with a planted 60%-hot key exercising
    both the broadcast (hot) and shuffle (cold) paths, and auto-detection
    pulling only the hot keys to the driver."""
    import ray.data

    from logray.ops.relational import skew_join

    rng = np.random.default_rng(5)
    keys = np.where(rng.random(20_000) < 0.6, 7, rng.integers(0, 500, 20_000))
    left = pd.DataFrame({"k": keys.astype(np.int64), "v": np.arange(20_000)})
    right = pd.DataFrame({"k": np.arange(500, dtype=np.int64),
                          "attr": np.arange(500) * 10})
    want = left.merge(right, on="k").sort_values(["k", "v"]).reset_index(drop=True)
    for hot in (None, np.array([7])):  # auto-detect and explicit
        got = skew_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                        "k", hot_keys=hot, hot_threshold=1000).to_pandas()
        got = got.sort_values(["k", "v"]).reset_index(drop=True)[want.columns.tolist()]
        pd.testing.assert_frame_equal(got, want)
    # no hot keys above threshold -> pure shuffle path, same answer
    got = skew_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                    "k", hot_threshold=10**9).to_pandas()
    got = got.sort_values(["k", "v"]).reset_index(drop=True)[want.columns.tolist()]
    pd.testing.assert_frame_equal(got, want)


def test_asof_join_dist_matches_pandas(ray_session):
    """Distributed (co-partitioned) as-of join == a global pandas
    merge_asof, including by-keys with no right rows (null match) and
    right rows strictly after every left row."""
    import ray.data

    from logray.ops.window import asof_join_dist

    rng = np.random.default_rng(11)
    left = pd.DataFrame({
        "id": np.arange(3000, dtype=np.int64),
        "k": rng.integers(0, 40, 3000).astype(np.int64),
        "t": rng.integers(0, 10_000, 3000).astype(np.int64)})
    # keys 35..39 never appear on the right -> all-null matches there
    right = pd.DataFrame({
        "k": rng.integers(0, 35, 800).astype(np.int64),
        "t": rng.integers(0, 10_000, 800).astype(np.int64)})
    right = right.groupby(["k", "t"], as_index=False).size()
    right["val"] = right["k"] * 1000 + right["t"]
    right = right[["k", "t", "val"]]

    want = pd.merge_asof(left.sort_values("t", kind="mergesort"),
                         right.sort_values("t", kind="mergesort"),
                         on="t", by="k")
    got = asof_join_dist(
        ray.data.from_pandas(left, override_num_blocks=8),
        ray.data.from_pandas(right, override_num_blocks=4),
        by="k", on="t", value_cols=["val"]).to_pandas()
    order = ["id"]
    pd.testing.assert_frame_equal(
        got.sort_values(order).reset_index(drop=True)[want.columns.tolist()],
        want.sort_values(order).reset_index(drop=True))


def test_asof_join_dist_suffixes_colliding_value_col(ray_session):
    """A right value column sharing a LEFT column's name — with a
    DIFFERENT type (the case the suffix parameter exists for) — must
    come out under the suffixed name with the right side's type, not
    break the union with a mixed-type padded slot."""
    import ray.data

    from logray.ops.window import asof_join_dist

    left = pd.DataFrame({"k": np.array([1, 1, 2], np.int64),
                         "t": np.array([5, 9, 5], np.int64),
                         "val": np.array([10, 20, 30], np.int64)})
    right = pd.DataFrame({"k": np.array([1, 2], np.int64),
                          "t": np.array([4, 6], np.int64),
                          "val": np.array([0.5, 0.25], np.float64)})
    got = asof_join_dist(
        ray.data.from_pandas(left, override_num_blocks=2),
        ray.data.from_pandas(right, override_num_blocks=2),
        by="k", on="t", value_cols=["val"]).to_pandas()
    want = pd.merge_asof(left.sort_values("t", kind="mergesort"),
                         right.sort_values("t", kind="mergesort"),
                         on="t", by="k", suffixes=("", "_right"))
    key = ["k", "t"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True)[want.columns.tolist()],
        want.sort_values(key).reset_index(drop=True))


def test_reassemble_segments_non_monotonic_ids():
    """Documents must reassemble from their OWN segments even when a batch
    arrives with non-monotonic doc_id order (regression: np.unique-sorted
    offsets grabbed other docs' segments)."""
    from logray.ops.text import reassemble_segments, segment_explode

    t = pa.table({"doc_id": pa.array([7, 2, 9], pa.int64()),
                  "text": pa.array(["a b c d e", "f g h", "i j k l"])})
    s = segment_explode(t, "doc_id", "text", 2)
    out = reassemble_segments(s, np.ones(s.num_rows, bool)).to_pandas()
    got = dict(zip(out["doc_id"], out["clean_text"]))
    assert got == {7: "a b c d e", 2: "f g h", 9: "i j k l"}
    # drop one middle segment of doc 2 ("f g h" -> segments "f g","h")
    kept = np.ones(s.num_rows, bool)
    seg_rows = s.to_pandas()
    drop_idx = seg_rows.index[(seg_rows["doc_id"] == 2)
                              & (seg_rows["seg_idx"] == 0)][0]
    kept[drop_idx] = False
    out2 = reassemble_segments(s, kept).to_pandas()
    got2 = dict(zip(out2["doc_id"], out2["clean_text"]))
    assert got2 == {7: "a b c d e", 2: "h", 9: "i j k l"}


def test_hard_negatives_skips_rows_with_no_negative(ray_session):
    from logray.ops import similarity

    vecs = np.eye(4)[:3]
    t = pa.table({"vec_id": pa.array([0, 1, 2], pa.int64()),
                  "embedding": pa.array(list(vecs.astype(np.float32))),
                  "label": pa.array([0, 0, 0], pa.int32())})
    out = similarity.hard_negatives(_ds(t)).to_pandas()
    assert len(out) == 0  # every reference row shares the label -> no rows


def test_bigram_explode_masks_doc_boundaries(ray_session):
    """The flat adjacent-pair trick must not form bigrams across document
    boundaries, and empty docs contribute nothing."""
    import ray.data

    from logray.pipelines.queries import top_bigrams_documents  # noqa: F401 (shape ref)
    # exercise the kernel through a small in-process dataset of the same shape
    import tempfile
    from pathlib import Path

    docs = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["a b c", "", "c a b", "x"],
        "lang": ["en"] * 4, "source": ["s"] * 4,
        "n_chars": [5, 0, 5, 1]})
    with tempfile.TemporaryDirectory() as d:
        pq.write_table(pa.Table.from_pandas(docs, preserve_index=False),
                       str(Path(d) / "documents.parquet"))
        out = top_bigrams_documents(d)
    out = out.sort_values(["n", "bigram"], ascending=[False, True]).reset_index(drop=True)
    # "c a"/"a b"... cross-doc pairs like "c x" or "b c"->"c a" merges must not appear
    got = dict(zip(out.bigram, out.n))
    assert got == {"a b": 2, "b c": 1, "c a": 1}


def test_entropy_identity():
    """H = ln(tot) - sum(n ln n)/tot equals the direct -sum(p ln p)."""
    n = np.array([5, 3, 2], dtype=float)
    tot = n.sum()
    p = n / tot
    direct = -(p * np.log(p)).sum()
    via = np.log(tot) - (n * np.log(n)).sum() / tot
    assert abs(direct - via) < 1e-12


def test_bucketed_apply_null_int_keys(ray_session):
    """Null integer partition keys must not widen the key array to
    float64 (undefined NaN→int cast); they co-locate deterministically
    and the per-key kernel sees them unchanged."""
    import ray.data

    from logray.ops.window import _bucketed_apply

    df = pd.DataFrame({"k": pd.array([1, 2, None, 2, 1, None], dtype="Int64"),
                       "v": [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]})

    def per_bucket(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby("k", sort=False, dropna=False)["v"].sum().reset_index()
        return out

    got = (_bucketed_apply(ray.data.from_pandas(df, override_num_blocks=3),
                           "k", per_bucket, num_buckets=4)
           .to_pandas().sort_values("k").reset_index(drop=True))
    want = (df.groupby("k", dropna=False)["v"].sum().reset_index()
            .sort_values("k").reset_index(drop=True))
    assert got["v"].tolist() == want["v"].tolist()


def test_hash_semi_join_exists_semantics(ray_session):
    import ray.data

    from logray.ops import relational

    left = pa.table({"k": pa.array([1, 2, 3, None, 5], pa.int64()),
                     "lv": pa.array([10, 20, 30, 40, 50], pa.int64())})
    # right has duplicate keys (must not duplicate left rows) and a null
    # key (must match nothing)
    right = pa.table({"k": pa.array([2, 2, 2, None, 5], pa.int64())})
    semi = relational.hash_semi_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right), "k",
        num_buckets=3).to_pandas().sort_values("lv")
    assert semi["lv"].tolist() == [20, 50]  # no dup, null key unmatched
    anti = relational.hash_semi_join(
        ray.data.from_arrow(left), ray.data.from_arrow(right), "k",
        anti=True, num_buckets=3).to_pandas().sort_values("lv")
    # NOT EXISTS keeps the null-key left row
    assert anti["lv"].tolist() == [10, 30, 40]
    assert semi["lv"].dtype.kind == "i"  # no float widening


def test_hash_semi_join_matches_pandas_at_size(ray_session):
    import ray.data

    from logray.ops import relational

    rng = np.random.default_rng(11)
    left = pd.DataFrame({"k": rng.integers(0, 300, 4000),
                         "lv": rng.integers(0, 10**6, 4000)})
    right = pd.DataFrame({"k": rng.integers(150, 450, 2000)})
    got = relational.hash_semi_join(
        ray.data.from_pandas(left.copy()), ray.data.from_pandas(right.copy()),
        "k", num_buckets=5).to_pandas()
    want = left[left["k"].isin(set(right["k"]))]
    key = ["k", "lv"]
    pd.testing.assert_frame_equal(
        got[key].sort_values(key).reset_index(drop=True),
        want[key].sort_values(key).reset_index(drop=True))


def test_ngram_explode_boundary_mask():
    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": ["a b c d", "x y", "p q r"]})
    out = text_ops.ngram_explode(t, "doc_id", "text", 3)
    got = list(zip(out["doc_id"].to_pylist(), out["ngram"].to_pylist()))
    # doc 2 is shorter than the width -> contributes nothing; no n-gram
    # may straddle doc boundaries
    assert got == [(1, "a b c"), (1, "b c d"), (3, "p q r")]
    # width longer than every doc -> empty with stable schema
    empty = text_ops.ngram_explode(t, "doc_id", "text", 5)
    assert empty.num_rows == 0 and empty.column_names == ["doc_id", "ngram"]


def test_repetition_signals_known_values():
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": ["a a a a", "w x y z"]})
    out = text_ops.add_repetition_signals(t).to_pandas().set_index("doc_id")
    # doc 1: 4 tokens 1 distinct -> dup 0.75; bigrams all "a a" -> share 1
    assert out.loc[1, "dup_word_frac"] == 0.75
    assert out.loc[1, "top_bigram_frac"] == 1.0
    # doc 2: all distinct -> dup 0; 3 distinct bigrams -> share 1/3
    assert out.loc[2, "dup_word_frac"] == 0.0
    assert abs(out.loc[2, "top_bigram_frac"] - 1 / 3) < 1e-6


def test_semdedup_finds_planted_near_dups(ray_session):
    import ray.data

    rng = np.random.default_rng(9)
    base = rng.standard_normal((120, 16)).astype(np.float32)
    # plant: vecs 100..119 are tiny perturbations of vecs 0..19
    dup = base[:20] + rng.standard_normal((20, 16)).astype(np.float32) * 0.01
    X = np.vstack([base, dup])
    t = pa.table({"vec_id": pa.array(np.arange(140), pa.int64()),
                  "embedding": pa.array(list(X))})
    out = similarity.semdedup(ray.data.from_arrow(t), k=4, iters=4,
                              threshold=0.98).to_pandas()
    assert len(out) == 140
    dropped = set(out.loc[~out["keep"], "vec_id"])
    # every planted dup resolves to its original (min id keeps the base)
    assert dropped == set(range(120, 140))
    kept_clusters = out.set_index("vec_id")["cluster_id"]
    for i in range(20):
        assert kept_clusters[120 + i] == kept_clusters[i] == i


def test_minhash_decontaminate_finds_planted(ray_session):
    import ray.data

    words = [f"w{i}" for i in range(50)]
    rng = np.random.default_rng(13)
    bench_texts = [" ".join(rng.choice(words, 40)) for _ in range(5)]
    clean = [" ".join(rng.choice(words, 40)) for _ in range(20)]
    # train doc 100 = bench doc 0 with one word changed (near-dup);
    # train doc 101 = exact copy of bench doc 3
    leaked = bench_texts[0].split()
    leaked[5] = "changed"
    train_texts = clean + [" ".join(leaked), bench_texts[3]]
    train = pa.table({"doc_id": pa.array(range(80, 102), pa.int64()),
                      "text": clean + train_texts[-2:]})
    bench = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                      "text": bench_texts})
    out = dedup.minhash_decontaminate(
        ray.data.from_arrow(train), ray.data.from_arrow(bench),
        threshold=0.5).to_pandas()
    got = dict(zip(out["doc_id"], out["bench_id"]))
    assert got.get(101) == 3          # exact copy found, decoded bench id
    assert got.get(100) == 0          # near-dup found
    assert set(got) <= {100, 101}     # no false positives among clean docs
    ex = out.set_index("doc_id")["est_jaccard"]
    assert ex[101] == 1.0 and 0.5 <= ex[100] <= 1.0


def test_dsir_ranks_target_like_docs(ray_session):
    # target corpus speaks vocab A; raw corpus is mostly vocab B with three
    # planted vocab-A docs — DSIR must rank the planted docs on top.
    rng = np.random.default_rng(7)
    va = [f"alpha{i}" for i in range(30)]
    vb = [f"beta{i}" for i in range(30)]
    target = pa.table({"doc_id": pa.array(range(1000, 1010), pa.int64()),
                       "text": [" ".join(rng.choice(va, 30)) for _ in range(10)]})
    raw_texts = [" ".join(rng.choice(vb, 30)) for _ in range(20)]
    raw_texts += [" ".join(rng.choice(va, 30)) for _ in range(3)]
    raw = pa.table({"doc_id": pa.array(range(23), pa.int64()),
                    "text": raw_texts})
    scored = text_ops.dsir_importance_scores(_ds(raw), _ds(target)).to_pandas()
    top3 = set(scored.nlargest(3, "dsir_score")["doc_id"])
    assert top3 == {20, 21, 22}
    assert scored.loc[scored.doc_id >= 20, "dsir_score"].min() > \
        scored.loc[scored.doc_id < 20, "dsir_score"].max()


def test_upsert_keeps_latest_and_inserts(ray_session):
    from logray.ops import relational

    base = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                     "v": [10.0, 20.0, 30.0],
                     "seq": pa.array([1, 1, 5], pa.int64())})
    upd = pa.table({"k": pa.array([2, 3, 4], pa.int64()),
                    "v": [21.0, 29.0, 40.0],
                    "seq": pa.array([2, 5, 1], pa.int64())})
    out = (relational.upsert(_ds(base), _ds(upd), ["k"], "seq")
           .to_pandas().sort_values("k").reset_index(drop=True))
    # k=2 newer update wins; k=3 tie -> update wins; k=4 inserted
    assert out["k"].tolist() == [1, 2, 3, 4]
    assert out["v"].tolist() == [10.0, 21.0, 29.0, 40.0]


def test_snapshot_diff_classifies(ray_session):
    from logray.ops import relational

    old = pa.table({"k": pa.array([1, 2, 3], pa.int64()),
                    "v": [1.0, 2.0, 3.0]})
    new = pa.table({"k": pa.array([2, 3, 4], pa.int64()),
                    "v": [2.0, 3.5, 4.0]})
    out = (relational.snapshot_diff(_ds(old), _ds(new), ["k"], ["v"])
           .to_pandas().set_index("k")["change"].to_dict())
    assert out == {1: "removed", 3: "changed", 4: "added"}  # 2 unchanged


def test_levenshtein_batch_matches_reference():
    import itertools

    def ref(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[-1]

    rng = np.random.default_rng(3)
    words = ["".join(rng.choice(list("abcd"), rng.integers(0, 9)))
             for _ in range(40)]
    pairs = list(itertools.islice(itertools.combinations(words, 2), 200))
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = text_ops.levenshtein_batch(a, b)
    assert got.tolist() == [ref(x, y) for x, y in pairs]


def test_hash_join_right_outer(ray_session):
    from logray.ops import relational

    left = pa.table({"k": pa.array([1, 2], pa.int64()), "l": [10.0, 20.0]})
    right = pa.table({"k": pa.array([2, 3], pa.int64()), "r": [200.0, 300.0]})
    out = (relational.hash_join(_ds(left), _ds(right), "k", how="right")
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out["k"].tolist() == [2, 3]
    assert out["r"].tolist() == [200.0, 300.0]
    assert np.isnan(out["l"].iloc[1]) and out["l"].iloc[0] == 20.0


def test_snapshot_diff_detail_images(ray_session):
    from logray.ops import relational

    old = pa.table({"k": pa.array([1, 2], pa.int64()), "v": [1.0, 2.0]})
    new = pa.table({"k": pa.array([2, 3], pa.int64()), "v": [2.5, 3.0]})
    out = (relational.snapshot_diff(_ds(old), _ds(new), ["k"], ["v"],
                                    detail=True)
           .to_pandas().set_index("k").sort_index())
    assert out.loc[1, "change"] == "removed" and out.loc[1, "v_old"] == 1.0
    assert out.loc[2, "change"] == "changed"
    assert (out.loc[2, "v_old"], out.loc[2, "v_new"]) == (2.0, 2.5)
    assert out.loc[3, "change"] == "added" and out.loc[3, "v_new"] == 3.0


def test_weighted_sample_prefers_heavy_rows(ray_session):
    from logray.ops import relational

    n = 4000
    w = np.where(np.arange(n) < 200, 50.0, 1.0)  # 200 heavy rows
    t = pa.table({"k": pa.array(np.arange(n), pa.int64()),
                  "w": pa.array(w)})
    out = relational.reservoir_sample(_ds(t), "k", 400, weight_col="w")
    heavy = (out["k"] < 200).sum()
    # heavy rows hold ~72% of total weight; uniform would give ~5%
    assert heavy > 150
    assert len(out) == 400 and out["k"].is_unique


def test_hard_negatives_cross_cluster(ray_session):
    from logray.ops import similarity

    rng = np.random.default_rng(5)
    c0 = rng.normal(0, 0.01, (10, 8)) + np.eye(8)[0]
    c1 = rng.normal(0, 0.01, (10, 8)) + np.eye(8)[1]
    far = rng.normal(0, 0.01, (5, 8)) + np.eye(8)[2]
    vecs = np.vstack([c0, c1, far])
    labels = np.array([0] * 10 + [1] * 10 + [2] * 5)
    t = pa.table({"vec_id": pa.array(np.arange(25), pa.int64()),
                  "embedding": pa.array(list(vecs.astype(np.float32))),
                  "label": pa.array(labels, pa.int32())})
    out = similarity.hard_negatives(_ds(t)).to_pandas().set_index("vec_id")
    # hard negative of any cluster-0 vec is a cluster-1 or cluster-2 vec
    # with a different label; since c0⊥c1⊥c2, the nearest other-label vec
    # has some similarity > any far-cluster vec only within {c1,c2} — all
    # results must simply carry a different label than the query.
    for vid, row in out.iterrows():
        assert labels[int(row["neg_id"])] != labels[int(vid)]
    assert len(out) == 25


def test_bpe_train_classic_corpus():
    from logray.ops import bpe

    wf = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe.train_bpe(wf, 4)
    # classic Sennrich example: 'es' (9) then 'est' (9) then 'est▁' (9)
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", bpe._EOW)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    assert bpe.encode_word("newest", ranks)[-1] == "est" + bpe._EOW
    assert "est" + bpe._EOW in bpe.encode_word("widest", ranks)


def test_bpe_token_counts_dataset(ray_session):
    from logray.ops import bpe

    texts = ["the cat sat", "the the cat", "dog"]
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                  "text": texts})
    out = (bpe.bpe_token_counts(_ds(t), num_merges=50, concurrency=1)
           .to_pandas().set_index("doc_id").sort_index())
    assert out["n_words"].tolist() == [3, 3, 1]
    # with enough merges every frequent word collapses to one token
    assert (out["n_bpe_tokens"] <= out["n_words"].map(
        lambda w: w * 12)).all()
    assert out.loc[0, "n_bpe_tokens"] >= 3
    # zero merges => pure character counts (+1 end-of-word per word)
    ranks = {}
    assert bpe.encode_word("cat", ranks) == ["c", "a", "t", bpe._EOW]


def test_countmin_never_underestimates_and_merges(ray_session):
    from logray.ops import sketch

    rng = np.random.default_rng(11)
    keys = rng.zipf(1.5, 20000) % 500  # skewed frequencies
    t = pa.table({"k": pa.array(keys.astype(np.int64))})
    M = sketch.countmin_matrix(_ds(t), "k", width=1024, depth=4)
    assert int(M[0].sum()) == len(keys)           # linear sketch: exact mass
    uniq, exact = np.unique(keys, return_counts=True)
    est = sketch.countmin_estimate(M, pa.array(uniq.astype(np.int64)))
    assert (est >= exact).all()                   # CMS never underestimates
    bound = exact + np.ceil(2 * np.e * len(keys) / 1024)
    assert (est <= bound).all()


def test_asof_tolerance_nulls_far_matches(ray_session):
    from logray.ops import window

    left = pa.table({"id": pa.array([1, 2], pa.int64()),
                     "u": pa.array([7, 7], pa.int64()),
                     "t": pa.array([100, 200], pa.int64())})
    right = pd.DataFrame({"u": [7, 7], "t": [95, 120], "v": [1.0, 2.0]})
    out = (window.asof_join(_ds(left), right, by="u", on="t",
                            value_cols=["v"], tolerance=10)
           .to_pandas().set_index("id"))
    assert out.loc[1, "v"] == 1.0          # 5 away, within tolerance
    assert np.isnan(out.loc[2, "v"])       # nearest is 80 away -> null


def test_pagerank_integer_exact(ray_session):
    from logray.ops import graph

    # path graph 0-1-2 symmetrized; hand-check one integer iteration
    e = pa.table({"src": pa.array([0, 1, 1, 2], pa.int64()),
                  "dst": pa.array([1, 0, 2, 1], pa.int64())})
    out = graph.pagerank(_ds(e), iters=1, total=300).set_index("node")["rank"]
    # base = 100 each; contributions: node1 gets 100//1 + 100//1 = 200,
    # nodes 0,2 get 100//2 = 50; r' = (15*100)//100 + (85*m)//100
    assert out[1] == 15 + (85 * 200) // 100 == 15 + 170
    assert out[0] == out[2] == 15 + (85 * 50) // 100
    # more iterations stay exactly deterministic across runs
    a = graph.pagerank(_ds(e), iters=3, total=10**12)
    b = graph.pagerank(_ds(e), iters=3, total=10**12)
    assert a.equals(b)
    assert a["rank"].sum() <= 10**12


def test_pagerank_join_formulation_matches_broadcast(ray_session):
    """broadcast_threshold=0 forces the distributed join formulation
    (ranks never collected/broadcast): integer arithmetic must make it
    bit-identical to the broadcast path on a non-trivial graph."""
    from logray.ops import graph

    rng = np.random.default_rng(3)
    src = rng.integers(0, 60, 400).astype(np.int64)
    dst = rng.integers(0, 60, 400).astype(np.int64)
    # symmetrize so every node that appears has degree >= 1 as src
    e = pa.table({"src": pa.array(np.concatenate([src, dst])),
                  "dst": pa.array(np.concatenate([dst, src]))})
    want = (graph.pagerank(_ds(e), iters=3, total=10**12)
            .sort_values("node").reset_index(drop=True))
    got = (graph.pagerank(_ds(e), iters=3, total=10**12,
                          broadcast_threshold=0)
           .to_pandas().sort_values("node").reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["node", "rank"]].astype("int64"),
                                  want[["node", "rank"]].astype("int64"))


def test_range_count_symmetric_window(ray_session):
    from logray.ops import window

    t = pa.table({"id": pa.array([1, 2, 3, 4], pa.int64()),
                  "u": pa.array([5, 5, 5, 9], pa.int64()),
                  "ts": pa.array([0, 10, 25, 0], pa.int64())})
    out = (window.range_count(_ds(t), by="u", ts_col="ts",
                              before=10, after=10, num_buckets=2)
           .to_pandas().set_index("id")["n_nearby"])
    # u=5: ts0 sees {0,10}; ts10 sees {0,10}(25 is 15 away); ts25 sees {25}
    assert out[1] == 2 and out[2] == 2 and out[3] == 1 and out[4] == 1


def test_interval_coverage_merges_islands(ray_session):
    from logray.ops import window

    t = pa.table({"u": pa.array([1, 1, 1, 2], pa.int64()),
                  "s": pa.array([0, 5, 20, 0], pa.int64()),
                  "e": pa.array([10, 12, 30, 3], pa.int64())})
    out = (window.interval_coverage(_ds(t), by="u", start_col="s",
                                    end_col="e", num_buckets=2)
           .to_pandas().set_index("u")["covered"])
    # u=1: [0,12] merged (overlap) + [20,30] => 12 + 10
    assert out[1] == 22 and out[2] == 3


def test_pca_planted_anisotropy(ray_session):
    rng = np.random.default_rng(9)
    # variance concentrated on axis 3, then axis 0
    X = np.zeros((300, 8))
    X[:, 3] = rng.normal(0, 10, 300)
    X[:, 0] = rng.normal(0, 3, 300)
    X += rng.normal(0, 0.1, (300, 8))
    t = pa.table({"vec_id": pa.array(np.arange(300), pa.int64()),
                  "embedding": pa.array(list(X.astype(np.float32)))})
    comps, evar, proj = similarity.pca(_ds(t), k=2)
    assert np.abs(comps[0]).argmax() == 3       # pc1 ≈ axis 3
    assert np.abs(comps[1]).argmax() == 0       # pc2 ≈ axis 0
    assert evar[0] > evar[1] > 0
    assert np.allclose(comps @ comps.T, np.eye(2), atol=1e-8)  # orthonormal
    out = proj.to_pandas()
    assert out["pc1"].var() > out["pc2"].var()
    # deterministic across runs (sign convention + exact partials)
    comps2, _, _ = similarity.pca(_ds(t), k=2)
    assert np.allclose(comps, comps2, atol=1e-12)


def test_inverted_index_build_and_lookup(ray_session):
    from logray.state.index import InvertedIndex

    t = pa.table({"doc_id": pa.array([10, 11, 12], pa.int64()),
                  "text": ["the cat sat", "the dog", "cat dog cat"]})
    idx = InvertedIndex(num_shards=3)
    n = idx.build(_ds(t))
    assert n == 3 + 2 + 2                      # distinct postings per doc
    res = idx.lookup(["the", "cat", "dog", "missing"])
    assert res["the"] == [10, 11]
    assert res["cat"] == [10, 12]
    assert res["dog"] == [11, 12]
    assert res["missing"] == []
    assert idx.lookup_and(["cat", "dog"]) == [12]
    assert idx.vocab_size() == 4


def test_cogroup_sees_complete_key_groups(ray_session):
    from logray.ops import relational

    left = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                     "a": [1.0, 2.0, 3.0]})
    right = pa.table({"k": pa.array([2, 3], pa.int64()), "b": [9.0, 8.0]})

    def fn(l, r):
        la = l.groupby("k").size() if len(l) else pd.Series(dtype=np.int64)
        rb = r.groupby("k").size() if len(r) else pd.Series(dtype=np.int64)
        m = pd.concat([la.rename("nl"), rb.rename("nr")], axis=1).fillna(0)
        return pd.DataFrame({"k": m.index.to_numpy(),
                             "nl": m["nl"].to_numpy().astype(np.int64),
                             "nr": m["nr"].to_numpy().astype(np.int64)})

    out = (relational.cogroup(_ds(left), _ds(right), ["k"], fn)
           .to_pandas().sort_values("k").reset_index(drop=True))
    assert out.values.tolist() == [[1, 2, 0], [2, 1, 1], [3, 0, 1]]


def test_bigram_logprob_prefers_fluent_docs(ray_session):
    import ray

    # corpus dominated by "a b" transitions; doc 2 uses never-seen pairs
    texts = ["a b a b a b", "a b a b", "x q z w"]
    t = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()), "text": texts})
    from logray.pipelines.queries import bigram_logprob_documents  # noqa: F401
    from logray.ops import bpe
    from logray.ops import relational

    uni = bpe.word_frequencies(_ds(t), "text", max_vocab=1 << 30)
    # single-batch corpus: bigram counts computable directly
    bi = pd.Series({"a b": 7, "b a": 4, "x q": 1, "q z": 1, "z w": 1})
    uref = ray.put(uni.set_index("word")["c"])
    bref = ray.put(bi)
    out = (_ds(t).map_batches(
        text_ops.bigram_logprob_stage(uref, bref, len(uni), "doc_id", "text"),
        batch_format="pyarrow").to_pandas().set_index("doc_id"))
    assert out.loc[0, "n_bigrams"] == 5 and out.loc[2, "n_bigrams"] == 3
    # frequent-transition docs score higher (less negative) than rare ones
    assert out.loc[0, "mean_logprob_u"] > out.loc[2, "mean_logprob_u"]


def test_scd2_collapses_runs_and_stitches_intervals(ray_session):
    import ray.data
    from logray.ops import window

    ts = pd.to_datetime(["2024-01-01", "2024-01-02", "2024-01-03",
                         "2024-01-04", "2024-01-05", "2024-01-01"])
    df = pd.DataFrame({"k": [1, 1, 1, 1, 1, 2],
                       "ts": ts,
                       "eid": [10, 11, 12, 13, 14, 20],
                       "state": ["A", "A", "B", "B", "A", "C"]})
    out = window.scd2(ray.data.from_pandas(df), "k", ["ts", "eid"],
                      "state", "ts", keep_cols=["k", "eid"],
                      num_buckets=4).to_pandas()
    out = out.sort_values(["k", "valid_from"]).reset_index(drop=True)
    assert list(out["state"]) == ["A", "B", "A", "C"]
    assert list(out["eid"]) == [10, 12, 14, 20]  # run-opening rows
    # intervals stitch: each valid_to equals the next run's valid_from
    k1 = out[out["k"] == 1]
    assert (k1["valid_to"].iloc[:-1].to_numpy()
            == k1["valid_from"].iloc[1:].to_numpy()).all()
    assert list(out["is_current"]) == [False, False, True, True]


def test_cooccurrence_edges_canonical_distinct(ray_session):
    from logray.ops import graph

    t = pa.table({"g": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
                  "item": pa.array([3, 1, 2, 1, 1, 2], pa.int64())})
    e = graph.cooccurrence_edges(_ds(t), "g", "item",
                                 num_buckets=4).to_pandas()
    got = sorted(map(tuple, e[["u", "v"]].to_numpy()))
    assert got == [(1, 2), (1, 3), (2, 3)]  # u<v, cross-group dup collapsed


def test_triangle_counts_k4_plus_pendant(ray_session):
    import ray.data
    from logray.ops import graph

    # K4 on {1,2,3,4} (4 triangles) plus pendant edge (4,9) — no new ones
    edges = pd.DataFrame({"u": [1, 1, 1, 2, 2, 3, 4],
                          "v": [2, 3, 4, 3, 4, 4, 9]})
    out = graph.triangle_counts(
        ray.data.from_pandas(edges)).to_pandas().set_index("u")["n_triangles"]
    assert out.to_dict() == {1: 3, 2: 1}


def test_segment_explode_tiles_docs_exactly():
    from logray.ops import text

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": ["a b c d e f g h i j k l", "  x  y ", "   "]})
    out = text.segment_explode(t, "doc_id", "text", 5).to_pandas()
    assert list(out["seg"]) == ["a b c d e", "f g h i j", "k l", "x y"]
    assert list(out["seg_idx"]) == [0, 1, 2, 0]
    assert list(out["doc_id"]) == [1, 1, 1, 2]  # whitespace-only doc absent
    # rejoining segments reproduces the whitespace-normalized doc
    j = out.groupby("doc_id")["seg"].agg(" ".join)
    assert j[1] == "a b c d e f g h i j k l" and j[2] == "x y"


def test_morton_interleave_bits():
    from logray.ops import layout

    x = np.array([0, 1, 0, 3, 0xFFFF], dtype=np.int64)
    y = np.array([0, 0, 1, 3, 0xFFFF], dtype=np.int64)
    z = layout.morton2(x, y)
    assert list(z[:4]) == [0, 1, 2, 15]
    assert z[4] == (1 << 32) - 1
    # locality: points in the same 2x2 cell are contiguous in z
    cell = layout.morton2(np.array([4, 5, 4, 5]), np.array([2, 2, 3, 3]))
    assert sorted(cell) == list(range(min(cell), min(cell) + 4))


def test_zorder_layout_prunes_2d_box(ray_session, tmp_path):
    import pyarrow.parquet as pq_
    import ray.data

    from logray.ops import layout

    rng = np.random.default_rng(0)
    n = 40_000
    df = pd.DataFrame({"id": np.arange(n),
                       "x": rng.integers(0, 1000, n),
                       "y": rng.integers(0, 1000, n)})
    zdir, ndir = tmp_path / "z", tmp_path / "n"
    layout.zorder_write(ray.data.from_pandas(df), "x", "y", str(zdir),
                        num_files=16)
    # naive layout: sorted by x only (a 1-D clustering)
    ray.data.from_pandas(df.sort_values("x")).repartition(16) \
        .write_parquet(str(ndir))

    def files_overlapping_y_range(d):
        hit = total = 0
        for f in sorted(d.glob("*.parquet")):
            md = pq_.ParquetFile(f).metadata
            sch = {md.schema.column(i).name: i
                   for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                sy = md.row_group(rg).column(sch["y"]).statistics
                total += 1
                if sy.min < 384 and sy.max >= 256:
                    hit += 1
        return hit, total

    zh, zt = files_overlapping_y_range(zdir)
    nh, nt = files_overlapping_y_range(ndir)
    # the x-sorted layout can never prune on y — every fragment spans the
    # full y range; z-order clusters BOTH dimensions, so a y-only filter
    # excludes most fragments from their min/max stats alone
    assert nh == nt
    assert zh <= zt // 2


def test_bloom_prune_keep_false_is_exactly_novel(ray_session):
    import ray.data

    from logray.ops import bloom as bloom_ops

    hist = ray.data.from_pandas(pd.DataFrame({"k": [1, 2, 3, 4, 5]}))
    probe = ray.data.from_pandas(pd.DataFrame({"k": list(range(10))}))
    flt = bloom_ops.build_bloom(hist, "k", m_bits=1 << 12, k=3)
    novel = set(bloom_ops.bloom_prune(probe, "k", flt,
                                      keep=False).to_pandas()["k"])
    maybe = set(bloom_ops.bloom_prune(probe, "k", flt).to_pandas()["k"])
    # no false negatives: every history key is on the maybe side
    assert {1, 2, 3, 4, 5} <= maybe
    assert novel.isdisjoint(maybe) and novel | maybe == set(range(10))
    assert novel <= {0, 6, 7, 8, 9}


def test_sliding_chunk_explode_overlap_and_edges():
    from logray.ops import text

    t = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                  "text": ["w0 w1 w2 w3 w4 w5 w6", "a b", "  "]})
    out = text.sliding_chunk_explode(t, "doc_id", "text",
                                     width=4, stride=2).to_pandas()
    d1 = out[out["doc_id"] == 1]
    assert list(d1["chunk_text"]) == ["w0 w1 w2 w3", "w2 w3 w4 w5",
                                      "w4 w5 w6", "w6"]
    assert list(d1["chunk_id"]) == [0, 1, 2, 3]
    # short doc → one partial chunk; whitespace-only doc → nothing
    assert list(out[out["doc_id"] == 2]["chunk_text"]) == ["a b"]
    assert (out["doc_id"] == 3).sum() == 0


def test_compression_ratio_orders_repetitive_below_random():
    from logray.ops import text

    rng = np.random.default_rng(3)
    rand = " ".join(rng.choice(list("abcdefghijklmnop"), 400))
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": ["spam ham " * 100, rand]})
    out = text.add_compression_ratio(t).to_pandas()
    assert out.loc[0, "deflate_ratio"] < 0.1 < out.loc[1, "deflate_ratio"]


def test_triangle_counts_degree_orientation_matches_id(ray_session):
    import ray.data
    from logray.ops import graph

    # skewed graph: hub 0 connects to everything; ring closes triangles
    rng = np.random.default_rng(1)
    n = 40
    ring = [(i, i + 1) for i in range(1, n - 1)]
    hub = [(0, i) for i in range(1, n)]
    edges = pd.DataFrame(sorted(set(map(tuple, ring + hub))),
                         columns=["u", "v"])
    ds = ray.data.from_pandas(edges)
    a = graph.triangle_counts(ds, orient="id").to_pandas() \
        .sort_values("u").reset_index(drop=True)
    b = graph.triangle_counts(ds, orient="degree").to_pandas() \
        .sort_values("u").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # hub + ring: triangles are exactly (0, i, i+1) → min vertex always 0
    assert a["n_triangles"].sum() == n - 2 and set(a["u"]) == {0}


def test_bfs_levels_path_graph(ray_session):
    import ray.data
    from logray.ops import graph

    # path 0-1-2-3-4 plus detached 8-9: levels bounded by max_depth
    edges = pd.DataFrame({"u": [0, 1, 2, 3, 8], "v": [1, 2, 3, 4, 9]})
    out = graph.bfs_levels(ray.data.from_pandas(edges), 0, max_depth=3)
    got = dict(zip(out["node"], out["level"]))
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}  # 4 beyond depth; 8/9 unreachable


def test_sssp_bounded_rounds_and_convergence(ray_session):
    import ray.data
    from logray.ops import graph

    # 0-1(1), 1-2(1), 0-2(5), 2-3(1), 3-4(9): the cheap route to 4 is
    # 0-1-2-3-4 (cost 12, 4 edges); at rounds=3 only 0-2-3-4 (15) fits
    edges = pd.DataFrame({"u": [0, 1, 0, 2, 3], "v": [1, 2, 2, 3, 4],
                          "w": [1, 1, 5, 1, 9]})
    got3 = (graph.sssp(ray.data.from_pandas(edges), 0, rounds=3)
            .to_pandas().set_index("node")["dist"].to_dict())
    assert got3 == {0: 0, 1: 1, 2: 2, 3: 3, 4: 15}
    # plenty of rounds: converges (early exit) to the true shortest paths
    got = (graph.sssp(ray.data.from_pandas(edges), 0, rounds=10)
           .to_pandas().set_index("node")["dist"].to_dict())
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 12}


def test_kmeans_kpp_init_seeds_every_separated_cluster(ray_session):
    """Farthest-first (k-means++-style) init must recover ALL planted
    clusters even when uniform-random init would drop one — the failure
    mode observed on the 5k-vector planted mixture (sf0.1) that
    motivated init='kpp'."""
    from logray.ops.similarity import kmeans

    rng = np.random.default_rng(3)
    centers = np.eye(4, 16) * 4.0
    lab = np.arange(2000) % 4
    X = centers[lab] + rng.normal(0, 0.2, size=(2000, 16))
    t = pa.table({"vec_id": pa.array(np.arange(2000, dtype=np.int64)),
                  "label_p": pa.array(lab.astype(np.int64)),
                  "embedding": pa.array(list(X.astype(np.float64)))})
    ds = _ds(t).repartition(4)
    _, assign = kmeans(ds, k=4, iters=6, vec_col="embedding", init="kpp")
    out = pa.concat_tables(
        ds.map_batches(assign, batch_format="pyarrow")
        .iter_batches(batch_size=10_000, batch_format="pyarrow")).to_pandas()
    pairs = out.groupby(["cluster_id", "label_p"]).size().reset_index(name="n")
    purity = (pairs.groupby("cluster_id")["n"].max()
              / pairs.groupby("cluster_id")["n"].sum()).min()
    majority = pairs.loc[pairs.groupby("cluster_id")["n"].idxmax(), "label_p"]
    assert majority.nunique() == 4
    assert purity > 0.95, purity


def test_real_wav_decode_matches_generation_truth():
    from logray.ops import multimodal as mm

    t = mm.make_wav_media_table(24)
    out = mm.AudioFeatureStage(decode="wav")(t.select(["media_id", "payload"]))
    assert (np.array(out["duration_ms"], dtype=np.int64)
            == np.array(t["true_duration_ms"])).all()
    assert np.allclose(out["rms_db"].to_numpy(), t["true_rms_db"].to_numpy())
    assert np.allclose(out["zcr"].to_numpy(), t["true_zcr"].to_numpy())


def test_real_ppm_decode_resize_and_whitespace_raster():
    from logray.ops import multimodal as mm

    t = mm.make_ppm_media_table(24)
    b = t.select(["media_id", "payload"]).append_column(
        "width", pa.nulls(24, pa.int32())).append_column(
        "height", pa.nulls(24, pa.int32()))
    d = mm.DecodeImageStage(decode="ppm")(b)
    assert (np.array(d["width"], dtype=np.int64) == np.array(t["true_width"])).all()
    assert np.allclose(d["mean_luma"].to_numpy(), t["true_mean_luma"].to_numpy())
    assert (d["phash64"].to_numpy() == t["true_ahash"].to_numpy()).all()
    r = mm.ResizeImageStage(max_side=32, decode="ppm")(b)
    for p, w, h in zip(r["payload"], r["width"], r["height"]):
        px = mm.parse_ppm(p.as_py())
        assert px.shape[:2] == (h.as_py(), w.as_py()) and max(px.shape[:2]) <= 32

    # regression: raster whose FIRST byte is whitespace-valued (0x0a) must
    # not be swallowed by header tokenization (bytes.split would eat it)
    px = np.full((3, 2, 3), 0x0A, dtype=np.uint8)
    back = mm.parse_ppm(mm.encode_ppm(px))
    assert (back == px).all()


def test_thumb_dims_invariants():
    from hypothesis import given, strategies as st

    from logray.ops.multimodal import thumb_dims

    @given(st.integers(1, 4096), st.integers(1, 4096), st.integers(1, 512))
    def check(w, h, m):
        ow, oh = thumb_dims(w, h, m)
        assert 1 <= ow and 1 <= oh
        if max(w, h) <= m:
            assert (ow, oh) == (w, h)
        elif w >= h:  # longer side pinned exactly; shorter = clamped round
            assert ow == m and oh == max(1, round(h * m / w))
        else:
            assert oh == m and ow == max(1, round(w * m / h))

    check()


def test_int8_quantization_preserves_cosine_ranking():
    """Per-vector symmetric int8 quantization must keep cosine top-k
    nearly intact on well-separated vectors (the premise of the
    int8_ann_recall query's bounds)."""
    rng = np.random.default_rng(4)
    X = rng.standard_normal((200, 32))
    q = rng.standard_normal(32)

    def quant(v):
        s = np.abs(v).max(axis=-1, keepdims=True)
        return np.clip(np.round(127 * v / np.maximum(s, 1e-12)), -127, 127)

    def topk(A, qq, k=10):
        An = A / np.linalg.norm(A, axis=1, keepdims=True)
        qn = qq / np.linalg.norm(qq)
        return set(np.argsort(-(An @ qn))[:k])

    exact = topk(X, q)
    approx = topk(quant(X), quant(q))
    assert len(exact & approx) >= 8  # recall@10 >= 0.8 on random gaussians


def test_footer_stats_multi_file_multi_rowgroup(ray_session, tmp_path):
    """footer_stats must combine min/max/count across files AND row
    groups exactly, without reading data pages (fixed-width columns have
    exact parquet statistics)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from logray.ops.layout import footer_stats

    rng = np.random.default_rng(9)
    paths = []
    vals, ts = [], []
    for i in range(3):
        v = rng.standard_normal(1000) * 100.0
        t = rng.integers(1_500_000_000, 1_600_000_000, 1000)
        vals.append(v)
        ts.append(t)
        tbl = pa.table({
            "v": pa.array(v, pa.float64()),
            "ts": pa.array(t * 1_000_000, pa.timestamp("us")),
        })
        p = str(tmp_path / f"part{i}.parquet")
        pq.write_table(tbl, p, row_group_size=300)  # 4 row groups/file
        paths.append(p)

    s = footer_stats(paths, ["v", "ts"])
    allv = np.concatenate(vals)
    allt = np.concatenate(ts) * 1_000_000
    assert s["n_rows"] == 3000
    assert s["min"]["v"] == allv.min() and s["max"]["v"] == allv.max()
    assert s["min"]["ts"].timestamp() * 1e6 == allt.min()
    assert s["max"]["ts"].timestamp() * 1e6 == allt.max()


def test_edit_distance_selfjoin_complete_with_indels(ray_session):
    """Pigeonhole blocking must be COMPLETE for ed<=1 including
    insertions/deletions (odd/even lengths, edits in either half), and
    emit nothing for ed>=2 — verified against brute-force DP."""
    import itertools

    import ray.data

    from logray.ops.text import edit_distance_selfjoin, levenshtein_batch

    texts = ["abcdef", "abcdefg",   # insertion at end
             "bcdef",               # deletion at front
             "abXdef",              # substitution mid
             "aXcdef",              # substitution in first half
             "abcdeX",              # substitution at end
             "abZZef",              # ed 2 from abcdef
             "xyz", "xyzz", "xy",   # short strings
             "", "a",               # degenerate lengths
             "abcdef"]              # exact duplicate
    ids = list(range(len(texts)))
    ds = ray.data.from_arrow(
        __import__("pyarrow").table({"doc_id": ids, "text": texts}))
    want = {}
    for i, j in itertools.combinations(ids, 2):
        d = int(levenshtein_batch([texts[i]], [texts[j]])[0])
        if d <= 1:
            want[(i, j)] = d
    for block in ("deletions", "halves"):  # both schemes: identical output
        got = edit_distance_selfjoin(ds, block=block).to_pandas() \
            .drop_duplicates(["a", "b"])
        got_pairs = {(int(r.a), int(r.b)): int(r.dist)
                     for r in got.itertuples()}
        assert got_pairs == want, block


def test_pii_redact_batch_all_classes_progressive():
    """Each PII class redacts independently; counts reflect the
    progressive chain (class k counted AFTER class k-1's replacement,
    mirroring the SQL oracle); nulls and empties are safe."""
    import pyarrow as pa

    from logray.ops.text import pii_redact_batch

    t = pa.table({"text": pa.array([
        "reach me at jo.doe+spam@mail.example.com or +1-555-123-4567",
        "server 10.0.254.3 then 192.168.1.1 rebooted",
        "two mails a@b.io c@d.org one ip 8.8.8.8",
        "",          # empty
        None,        # null
        "no pii here at all",
        "version 1.2.3 is NOT an ip (three octets)",
    ])})
    out = pii_redact_batch(t)
    red = out["redacted"].to_pylist()
    assert red[0] == "reach me at <EMAIL> or <PHONE>"
    assert red[1] == "server <IP> then <IP> rebooted"
    assert red[2] == "two mails <EMAIL> <EMAIL> one ip <IP>"
    assert red[3] == "" and red[4] is None
    assert red[5] == "no pii here at all"
    assert red[6] == "version 1.2.3 is NOT an ip (three octets)"
    assert out["n_email"].to_pylist() == [1, 0, 2, 0, 0, 0, 0]
    assert out["n_ip"].to_pylist() == [0, 2, 1, 0, 0, 0, 0]
    assert out["n_phone"].to_pylist() == [1, 0, 0, 0, 0, 0, 0]


def test_bmp_codec_roundtrip_and_hazards():
    """BMP encode→decode round-trips exactly, including the three classic
    hazards: bottom-up row order, BGR channel order, 4-byte row padding
    (odd widths); top-down (negative height) input also decodes."""
    import struct

    import numpy as np

    from logray.ops.multimodal import encode_bmp, parse_bmp

    rng = np.random.default_rng(7)
    for w, h in [(17, 9), (16, 16), (1, 1), (2, 33), (127, 3)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (parse_bmp(encode_bmp(px)) == px).all(), (w, h)
    # top-down variant: encode_bmp(px[::-1]) lays the file rows out in
    # px's original order (encoder reverses); flipping the height sign
    # tells the decoder rows are already top-down, so it returns px as-is
    px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    b = bytearray(encode_bmp(px[::-1]))
    struct.pack_into("<i", b, 22, -5)
    assert (parse_bmp(bytes(b)) == px).all()


def test_png_codec_roundtrip_all_filters():
    """PNG encode→decode round-trips exactly for EVERY scanline filter
    type (None/Sub/Up/Average/Paeth), for mixed per-row filters, for
    multi-IDAT zlib streams, and for 1-pixel-wide/-tall images where
    the left/up neighbors vanish."""
    import numpy as np

    from logray.ops.multimodal import encode_png, parse_png

    rng = np.random.default_rng(9)
    for w, h in [(1, 9), (9, 1), (5, 5), (31, 17), (1, 1)]:
        for filters in ([0], [1], [2], [3], [4], [3, 4, 1], None):
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            b = encode_png(px, filters=filters, idat_split=2)
            assert (parse_png(b) == px).all(), (w, h, filters)


def test_png_decode_rejects_corruption_and_unsupported():
    """Chunk CRC corruption, truncated scanline payloads, wrong
    signatures, and unsupported IHDR shapes all raise ValueError rather
    than returning garbage pixels."""
    import struct

    import numpy as np
    import pytest

    from logray.ops.multimodal import encode_png, parse_png

    rng = np.random.default_rng(10)
    px = rng.integers(0, 256, size=(6, 6, 3), dtype=np.uint8)
    good = encode_png(px)
    # signature
    with pytest.raises(ValueError, match="not a PNG"):
        parse_png(b"GIF89a" + good[6:])
    # CRC flip inside IHDR data
    bad = bytearray(good)
    bad[18] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        parse_png(bytes(bad))
    # unsupported bit depth: rebuild IHDR with depth=16 and a VALID crc
    import zlib as _z
    ihdr = struct.pack(">IIBBBBB", 6, 6, 16, 2, 0, 0, 0)
    chunk = (struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
             + struct.pack(">I", _z.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF))
    with pytest.raises(ValueError, match="only 8-bit RGB"):
        parse_png(good[:8] + chunk + good[8 + 12 + 13:])


def test_mulaw_codec_matches_g711_reference_exhaustively():
    """Vectorized mu-law encode equals the scalar G.711 reference for
    EVERY int16 value; expand(compand(x)) error is bounded by the top
    segment's half-step; RIFF fmt-code-7 container round-trips through
    the hand-rolled chunk walk (incl. the odd-length word-align rule)."""
    import numpy as np

    from logray.ops.multimodal import (_riff_mulaw, decode_mulaw,
                                       decode_mulaw_wav_features,
                                       encode_mulaw)

    def ref_encode(x: int) -> int:
        BIAS, CLIP = 0x84, 32635
        sign = 0x80 if x < 0 else 0
        mag = min(abs(x), CLIP) + BIAS
        exp = 7
        for e in range(8):
            if mag < (1 << (e + 8)):
                exp = e
                break
        return (~(sign | (exp << 4) | ((mag >> (exp + 3)) & 0x0F))) & 0xFF

    xs = np.arange(-32768, 32768, dtype=np.int16)
    enc = np.frombuffer(encode_mulaw(xs), np.uint8)
    ref = np.array([ref_encode(int(v)) for v in range(-32768, 32768)],
                   np.uint8)
    assert (enc == ref).all()
    dec = decode_mulaw(enc.tobytes()).astype(np.int64)
    err = np.abs(dec - xs.astype(np.int64))
    assert err[np.abs(xs) <= 32635].max() <= 1024  # top-segment half-step

    # container round-trip with an ODD data length (word-align hazard)
    pcm = xs[::97][:501].copy()
    ulaw = encode_mulaw(pcm)
    assert len(ulaw) % 2 == 1
    d, r, z = decode_mulaw_wav_features(_riff_mulaw(ulaw, 8000))
    back = decode_mulaw(ulaw)
    from logray.ops.multimodal import _pcm_rms_db, _pcm_zcr
    assert (d, r, z) == (int(len(back) * 1000 / 8000),
                         _pcm_rms_db(back), _pcm_zcr(back))


def test_gif_lzw_roundtrip_and_hazards():
    """From-scratch GIF LZW: raw-stream round-trips across alphabet
    sizes incl. table growth to 12 bits, the 4096-entry CLEAR reset,
    and KwKwK-heavy repetitive input; full GIFs round-trip with
    palettes 4..256, 1-pixel-wide rasters, and extension blocks; bad
    signatures and truncated streams raise."""
    import numpy as np
    import pytest

    from logray.ops.multimodal import (_lzw_compress, _lzw_decompress,
                                       encode_gif, parse_gif)

    rng = np.random.default_rng(21)
    for size in [1, 5, 4095, 20000]:
        for alpha in [2, 7, 250]:
            mcs = max(2, (alpha - 1).bit_length())
            seq = rng.integers(0, alpha, size=size).astype(np.uint8)
            back = _lzw_decompress(_lzw_compress(seq, mcs), mcs)
            assert (back == seq).all(), (size, alpha)
    seq = np.frombuffer(b"aaaaab" * 10000, np.uint8)
    assert (_lzw_decompress(_lzw_compress(seq, 8), 8) == seq).all()

    for (w, h, ncol) in [(1, 7, 4), (33, 21, 16), (95, 64, 256)]:
        pal = rng.integers(0, 256, size=(ncol, 3)).astype(np.uint8)
        idx = rng.integers(0, ncol, size=(h, w)).astype(np.uint8)
        assert (parse_gif(encode_gif(idx, pal)) == pal[idx]).all()

    pal = rng.integers(0, 256, size=(8, 3)).astype(np.uint8)
    idx = rng.integers(0, 8, size=(5, 5)).astype(np.uint8)
    good = encode_gif(idx, pal)
    with pytest.raises(ValueError, match="not a GIF"):
        parse_gif(b"PNG89a" + good[6:])
    with pytest.raises(ValueError):
        parse_gif(good[:-10])  # truncated sub-block stream


def test_jpeg_entropy_layer_inverts_exactly():
    """The decoder's Huffman/zigzag/DC-prediction layer is EXACT: for
    every geometry × subsampling × restart-interval combination, parsing
    the encoded bytes reproduces the encoder's quantized coefficient
    arrays bit-for-bit (the only loss in JPEG is quantization, which
    happens before the entropy layer)."""
    import numpy as np

    from logray.ops.jpegcodec import (_decode_qblocks, _forward_qblocks,
                                      encode_jpeg)

    rng = np.random.default_rng(31)
    for (w, h, sub, ri, q) in [(16, 16, False, 0, 85), (17, 23, True, 0, 85),
                               (33, 9, True, 3, 70), (1, 12, False, 0, 95),
                               (1, 12, True, 2, 95), (8, 8, False, 0, 100),
                               (41, 26, False, 1, 50)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        b = encode_jpeg(px, q, subsample=sub, restart_interval=ri)
        fwd, _, _, _ = _forward_qblocks(px, q, sub)
        comps, _, _, _, _, _ = _decode_qblocks(b)
        for ci in range(3):
            assert (fwd[ci] == comps[ci]["blocks"]).all(), (w, h, sub, ri)


def test_jpeg_roundtrip_tolerance_and_restart_equivalence():
    """Smooth images round-trip within a small tolerance at q>=85; flat
    colors recover exactly; and restart markers change the entropy
    layout but NOT the decoded pixels (same quantized coefficients)."""
    import numpy as np

    from logray.ops.jpegcodec import encode_jpeg, parse_jpeg

    rng = np.random.default_rng(32)
    for _ in range(6):
        w, h = int(rng.integers(8, 80)), int(rng.integers(8, 80))
        base = rng.integers(30, 200, size=(1, 1, 3)).astype(float)
        gy = np.linspace(0, float(rng.integers(1, 50)), h)[:, None, None]
        gx = np.linspace(0, float(rng.integers(1, 50)), w)[None, :, None]
        px = np.clip(base + gy + gx, 0, 255).astype(np.uint8)
        for sub in (False, True):
            dec = parse_jpeg(encode_jpeg(px, 90, subsample=sub))
            err = np.abs(dec.astype(int) - px.astype(int)).max()
            assert err <= 8, (w, h, sub, err)
        plain = parse_jpeg(encode_jpeg(px, 80, subsample=True))
        rst = parse_jpeg(encode_jpeg(px, 80, subsample=True,
                                     restart_interval=1))
        assert (plain == rst).all()

    flat = np.full((24, 24, 3), (12, 200, 77), np.uint8)
    assert (parse_jpeg(encode_jpeg(flat, 95, subsample=True)) == flat).all()


def test_jpeg_decode_rejects_unsupported_and_corruption():
    """Missing SOI, progressive SOF2, truncated entropy streams, and a
    wrong restart marker sequence all raise ValueError; byte stuffing
    (FF 00) actually occurs in the fixture's streams (so the unstuffing
    path is exercised, not just present)."""
    import numpy as np
    import pytest

    from logray.ops.jpegcodec import encode_jpeg, parse_jpeg
    from logray.ops.multimodal import make_jpeg_media_table

    rng = np.random.default_rng(33)
    px = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    good = encode_jpeg(px, 85)
    with pytest.raises(ValueError, match="missing SOI"):
        parse_jpeg(b"\x89PNG" + good[4:])
    # flip SOF0 (FFC0) to progressive SOF2 (FFC2)
    i = good.index(b"\xff\xc0")
    with pytest.raises(ValueError, match="SOF"):
        parse_jpeg(good[:i] + b"\xff\xc2" + good[i + 2:])
    with pytest.raises(ValueError):
        parse_jpeg(good[:len(good) // 2])  # truncated mid-scan
    # corrupt the first restart marker's index (RST0 -> RST5)
    rb = bytearray(encode_jpeg(px, 85, restart_interval=1))
    j = rb.find(b"\xff\xd0", rb.index(b"\xff\xda"))
    assert j > 0
    rb[j + 1] = 0xD5
    with pytest.raises(ValueError):
        parse_jpeg(bytes(rb))

    t = make_jpeg_media_table(12)
    assert any(b"\xff\x00" in p.as_py() for p in t["payload"])


def test_jpeg_resize_stage_real_path():
    """ResizeImageStage's JPEG lane emits REAL thumbnail JPEGs: output
    payload decodes, dims are clamped to max_side with aspect preserved,
    and the result matches the decode->resample->re-encode chain run
    locally on the same bytes."""
    import numpy as np
    import pyarrow as pa

    from logray.ops.jpegcodec import encode_jpeg, parse_jpeg
    from logray.ops.multimodal import (THUMB_JPEG_QUALITY, ResizeImageStage,
                                       resize_nearest, thumb_dims)

    rng = np.random.default_rng(41)
    payloads = []
    for w, h in [(64, 40), (9, 80), (31, 31)]:
        px = np.clip(rng.integers(20, 200, size=(1, 1, 3))
                     + np.linspace(0, 40, h)[:, None, None]
                     + np.linspace(0, 40, w)[None, :, None],
                     0, 255).astype(np.uint8)
        payloads.append(encode_jpeg(px, 85, subsample=(w % 2 == 0)))
    batch = pa.table({
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.nulls(3, pa.int32()),
        "height": pa.nulls(3, pa.int32()),
    })
    out = ResizeImageStage(max_side=32, decode="jpeg")(batch)
    for i, (w, h) in enumerate([(64, 40), (9, 80), (31, 31)]):
        tw, th = thumb_dims(w, h, 32)
        assert (out["width"][i].as_py(), out["height"][i].as_py()) == (tw, th)
        got = out["payload"][i].as_py()
        expect = encode_jpeg(
            resize_nearest(parse_jpeg(payloads[i]), tw, th),
            quality=THUMB_JPEG_QUALITY)
        assert got == expect
        assert parse_jpeg(got).shape == (th, tw, 3)


def test_flac_codec_bitexact_roundtrip_all_modes():
    """The FLAC-subset codec is LOSSLESS: decode(encode(x)) == x exactly
    for mono/stereo, every forced stereo decorrelation mode, planted
    silence (CONSTANT subframes), pure noise (verbatim/escape
    residuals), extremes at the int16 rails, partial final frames, and
    tiny inputs shorter than any predictor's warmup."""
    import numpy as np

    from logray.ops.flaccodec import decode_flac, encode_flac

    rng = np.random.default_rng(51)
    t = np.arange(3001) / 8000.0
    sine = (np.clip(0.4 * np.sin(2 * np.pi * 440 * t)
                    + 0.05 * rng.standard_normal(3001), -1, 1)
            * 32767).astype(np.int16)
    left = (np.clip(0.3 * np.sin(2 * np.pi * 220 * t), -1, 1)
            * 32767).astype(np.int16)
    right = np.clip(left.astype(np.int64) * 0.98
                    + rng.integers(-50, 50, len(left)),
                    -32768, 32767).astype(np.int16)
    stereo = np.stack([left, right], axis=1)

    cases = [sine, np.zeros(2500, np.int16),
             rng.integers(-32768, 32768, 5000).astype(np.int16),
             np.array([32767, -32768, -32768, 32767, 0] * 300, np.int16),
             np.array([5, -3, 7], np.int16), np.array([12], np.int16),
             stereo]
    for pcm in cases:
        dec, rate = decode_flac(encode_flac(pcm, 8000, block_size=1024))
        want = pcm[:, None] if pcm.ndim == 1 else pcm
        assert rate == 8000 and (dec == want).all()
    for mode in ("indep", "left_side", "right_side", "mid_side"):
        dec, _ = decode_flac(encode_flac(stereo, 8000, force_mode=mode))
        assert (dec == stereo).all(), mode
    # block size not dividing n, and block size > n
    for bs in (7, 100, 10000):
        dec, _ = decode_flac(encode_flac(sine, 8000, block_size=bs))
        assert (dec == sine[:, None]).all(), bs


def test_flac_decode_verifies_integrity():
    """Wrong magic, frame-header CRC-8 damage, frame-body CRC-16 damage,
    truncation, and a tampered STREAMINFO MD5 all raise ValueError —
    a successful decode is an integrity proof, not just a parse."""
    import numpy as np
    import pytest

    from logray.ops.flaccodec import decode_flac, encode_flac

    rng = np.random.default_rng(52)
    pcm = (np.clip(0.3 * np.sin(np.arange(2000) * 0.05)
                   + 0.05 * rng.standard_normal(2000), -1, 1)
           * 32767).astype(np.int16)
    good = encode_flac(pcm, 8000, block_size=512)
    with pytest.raises(ValueError, match="not a FLAC"):
        decode_flac(b"OggS" + good[4:])
    # STREAMINFO is 4 (magic) + 4 (block hdr) + 34 bytes; frames follow.
    frame0 = 4 + 4 + 34
    b = bytearray(good)
    b[frame0 + 2] ^= 0x10                 # inside the frame header
    with pytest.raises(ValueError, match="CRC-8"):
        decode_flac(bytes(b))
    b = bytearray(good)
    b[frame0 + 30] ^= 0x01                # inside the first frame's body
    with pytest.raises(ValueError, match="CRC-16|MD5|truncated|sync|subframe|rice|order"):
        decode_flac(bytes(b))
    with pytest.raises(ValueError):
        decode_flac(good[: len(good) // 2])
    b = bytearray(good)
    b[8 + 18] ^= 0xFF                     # first MD5 byte in STREAMINFO
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(b))


def test_flac_edge_hardening():
    """Review-found edge cases: empty input round-trips (zero frames);
    truncation exactly at a frame boundary raises ValueError (not
    IndexError); a foreign stream using the legal escape width 0
    (all-zero residuals in zero bits) decodes."""
    import hashlib
    import struct

    import numpy as np
    import pytest

    from logray.ops.flaccodec import (_MODE_CODE, _BitWriter, _crc8, _crc16,
                                      _utf8_number, decode_flac, encode_flac)

    # n == 0: encoder emits zero frames, decoder returns an empty array
    dec, rate = decode_flac(encode_flac(np.zeros(0, np.int16), 8000))
    assert rate == 8000 and dec.shape == (0, 1)
    dec, _ = decode_flac(encode_flac(np.zeros((0, 2), np.int16), 8000))
    assert dec.shape == (0, 2)

    # truncation exactly at the first frame boundary (metadata complete,
    # zero frame bytes, total > 0) must be a ValueError
    pcm = (np.arange(600) % 97).astype(np.int16)
    good = encode_flac(pcm, 8000, block_size=512)
    with pytest.raises(ValueError, match="truncated"):
        decode_flac(good[:4 + 4 + 34])
    # and truncation inside a multi-byte frame header region
    with pytest.raises(ValueError, match="truncated|sync"):
        decode_flac(good[:4 + 4 + 34 + 5])

    # hand-build a mono frame whose residuals use escape width 0 — our
    # encoder never emits it, but it is legal FLAC for all-zero residuals
    n, rate = 4, 8000
    pcm0 = np.zeros((n, 1), np.int16)
    si = _BitWriter()
    si.write(n, 16); si.write(n, 16); si.write(0, 24); si.write(0, 24)
    si.write(rate, 20); si.write(0, 3); si.write(16 - 1, 5); si.write(n, 36)
    info = bytes(si.buf) + hashlib.md5(pcm0.astype("<i2").tobytes()).digest()
    out = bytearray(b"fLaC") + bytes([0x80, 0, 0, len(info)]) + info
    hdr = bytearray(b"\xff\xf8")
    hdr.append(0b0111 << 4)
    hdr.append((_MODE_CODE["mono"] << 4) | (0b100 << 1))
    hdr += _utf8_number(0)
    hdr += struct.pack(">H", n - 1)
    hdr.append(_crc8(bytes(hdr)))
    w = _BitWriter()
    w.write(0, 1); w.write(0b001000, 6); w.write(0, 1)   # fixed, order 0
    w.write(0b00, 2); w.write(0, 4)                      # rice, part order 0
    w.write(0b1111, 4); w.write(0, 5)                    # escape, width 0
    w.align()
    frame = bytes(hdr) + bytes(w.buf)
    out += frame + struct.pack(">H", _crc16(frame))
    dec, _ = decode_flac(bytes(out))
    assert dec.shape == (n, 1) and (dec == 0).all()


def test_jpeg_edge_hardening():
    """Review-found edge cases: grayscale (1-component) SOF0, undefined
    quant/Huffman table references, and a ZRL run past the block end all
    raise ValueError instead of IndexError/KeyError/silent garbage."""
    import struct

    import numpy as np
    import pytest

    from logray.ops.jpegcodec import (AC_LUMA_SPEC, DC_LUMA_SPEC,
                                      _BitWriter, _build_codes, encode_jpeg,
                                      parse_jpeg)

    rng = np.random.default_rng(34)
    px = rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
    good = encode_jpeg(px, 85)

    i = good.index(b"\xff\xc0")
    b = bytearray(good)
    b[i + 9] = 1                          # SOF0 component count -> 1
    with pytest.raises(ValueError, match="component count"):
        parse_jpeg(bytes(b))
    b = bytearray(good)
    b[i + 12] = 3                         # comp 0 quant table id -> 3
    with pytest.raises(ValueError, match="quant table"):
        parse_jpeg(bytes(b))
    j = good.index(b"\xff\xda")
    b = bytearray(good)
    b[j + 6] = 0x22                       # comp 0 scan tables -> id 2
    with pytest.raises(ValueError, match="Huffman table"):
        parse_jpeg(bytes(b))

    # splice in a scan whose first block emits 4 ZRLs (k = 1+64 > 64)
    dc = _build_codes(DC_LUMA_SPEC)
    ac = _build_codes(AC_LUMA_SPEC)
    wtr = _BitWriter()
    c, ln = dc[0]
    wtr.write(c, ln)                      # DC size 0 (diff = 0)
    zc, zl = ac[0xF0]                     # ZRL
    for _ in range(4):
        wtr.write(zc, zl)
    wtr.flush()
    sln = struct.unpack(">H", good[j + 2:j + 4])[0]
    spliced = good[:j + 2 + sln] + bytes(wtr.buf) + b"\xff\xd9"
    with pytest.raises(ValueError, match="ZRL"):
        parse_jpeg(spliced)


def test_flac_feature_stage_and_fixture():
    """decode_flac_features reproduces the fixture's original-sample
    truth exactly (lossless), and the fixture actually contains both
    channel counts and a CONSTANT-subframe (silence) payload."""
    from logray.ops.multimodal import (decode_flac_features,
                                       make_flac_media_table)

    t = make_flac_media_table(16)
    assert set(t["true_channels"].to_pylist()) == {1, 2}
    for i in range(16):
        d, r, z = decode_flac_features(t["payload"][i].as_py())
        assert d == t["true_duration_ms"][i].as_py()
        assert r == t["true_rms_db"][i].as_py()
        assert z == t["true_zcr"][i].as_py()


def test_mp3_meta_walk_roundtrip_and_hazards():
    """MPEG-1 Layer III frame walk: fixture truth recovered exactly for
    CBR/VBR/ID3-wrapped streams; truncated frames, lost sync,
    free-format bitrate, mid-stream samplerate changes and non-syncsafe
    ID3v2 sizes all raise."""
    import numpy as np
    import pytest

    from logray.ops.multimodal import (build_mp3, make_mp3_media_table,
                                       parse_mp3_meta)

    t = make_mp3_media_table(60)
    for i in range(t.num_rows):
        m = parse_mp3_meta(t["payload"][i].as_py())
        for k in ("n_frames", "duration_ms", "kbps_sum", "sample_rate"):
            assert m[k] == t[f"true_{k}"][i].as_py(), (i, k)

    rng = np.random.default_rng(7)
    good = build_mp3([5, 9, 14], 1, [0, 1, 0], rng, id3v2_size=64,
                     id3v1=True)
    m = parse_mp3_meta(good)
    assert m["n_frames"] == 3 and m["sample_rate"] == 48000
    assert m["kbps_sum"] == 64 + 128 + 320
    with pytest.raises(ValueError, match="truncated final frame"):
        parse_mp3_meta(build_mp3([5, 9], 1, [0, 0], rng)[:-10])
    with pytest.raises(ValueError, match="lost sync"):
        parse_mp3_meta(b"\x00\x00" + build_mp3([5], 1, [0], rng))
    # free-format bitrate index (0) is rejected
    hdr = bytearray(build_mp3([5], 1, [0], rng))
    hdr[2] &= 0x0F  # zero the bitrate index nibble
    with pytest.raises(ValueError, match="free-format"):
        parse_mp3_meta(bytes(hdr))
    # samplerate flips mid-stream
    two = (build_mp3([5], 0, [0], rng) + build_mp3([5], 2, [0], rng))
    with pytest.raises(ValueError, match="samplerate changes"):
        parse_mp3_meta(two)
    with pytest.raises(ValueError, match="non-syncsafe"):
        parse_mp3_meta(b"ID3\x03\x00\x00\xff\xff\xff\xff" + bytes(4))


def test_mp4_box_walk_roundtrip_and_hazards():
    """ISO-BMFF walk: fixture truth recovered exactly (incl. version-1
    64-bit times and largesize mdat); size==0 to-EOF boxes parse;
    out-of-bounds box sizes and missing moov raise; unknown boxes are
    skipped."""
    import numpy as np
    import pytest

    from logray.ops.multimodal import (_mp4_box, build_mp4,
                                       make_mp4_media_table, parse_mp4_meta)

    t = make_mp4_media_table(60)
    for i in range(t.num_rows):
        m = parse_mp4_meta(t["payload"][i].as_py())
        for k in ("duration_ms", "n_tracks", "n_video", "n_audio",
                  "max_width", "max_height"):
            assert m[k] == t[f"true_{k}"][i].as_py(), (i, k)

    rng = np.random.default_rng(9)
    good = build_mp4(1000, 90_000, [(b"vide", 640, 360)], rng, version=1)
    m = parse_mp4_meta(good)
    assert (m["duration_ms"], m["n_video"], m["max_width"]) == (90_000, 1, 640)
    # size==0 = "to end of file" on the final box
    trail = bytearray(_mp4_box(b"skip", bytes(32)))
    trail[:4] = b"\x00\x00\x00\x00"
    parse_mp4_meta(good + bytes(trail))  # must not raise
    with pytest.raises(ValueError, match="out of bounds"):
        bad = bytearray(good)
        bad[0:4] = (1 << 30).to_bytes(4, "big")  # ftyp size overruns
        parse_mp4_meta(bytes(bad))
    with pytest.raises(ValueError, match="no moov"):
        parse_mp4_meta(_mp4_box(b"ftyp", b"isom" + bytes(8)))


def test_webp_header_parse_roundtrip_and_hazards():
    """RIFF/WEBP parse: fixture truth recovered exactly across all three
    variants; even-padding honored on odd chunks; foreign containers,
    RIFF size mismatches and a bad VP8 start code raise."""
    import numpy as np
    import pytest

    from logray.ops.multimodal import (build_webp, make_webp_media_table,
                                       parse_webp_meta)

    t = make_webp_media_table(60)
    for i in range(t.num_rows):
        m = parse_webp_meta(t["payload"][i].as_py())
        for k in ("width", "height", "variant", "has_alpha"):
            assert m[k] == t[f"true_{k}"][i].as_py(), (i, k)

    rng = np.random.default_rng(11)
    for v, alpha in (("lossy", False), ("lossless", True),
                     ("extended", True)):
        m = parse_webp_meta(build_webp(v, 16383, 1, rng, has_alpha=alpha))
        assert (m["width"], m["height"], m["variant"]) == (16383, 1, v)
        assert m["has_alpha"] == alpha
    with pytest.raises(ValueError, match="not a RIFF/WEBP"):
        parse_webp_meta(b"RIFX" + build_webp("lossy", 4, 4, rng)[4:])
    with pytest.raises(ValueError, match="size mismatch"):
        parse_webp_meta(build_webp("lossy", 4, 4, rng) + b"x")
    bad = bytearray(build_webp("lossy", 8, 8, rng))
    bad[12 + 8 + 3] = 0x00  # clobber the 9D 01 2A start code
    with pytest.raises(ValueError, match="start code"):
        parse_webp_meta(bytes(bad))


def test_media_meta_parsers_fuzz_contract():
    """The three container-metadata parsers must raise ValueError (never
    IndexError/struct.error, never hang) on arbitrary junk, truncations
    and bit flips — same foreign-stream contract the codec lanes pin.
    Includes the crafted empty-box edge cases (zero-length mvhd/tkhd/
    VP8L/VP8X at end of payload) that random flips rarely reach."""
    import numpy as np
    import pytest

    from logray.ops.multimodal import (_mp4_box, build_mp3, build_mp4,
                                       build_webp, parse_mp3_meta,
                                       parse_mp4_meta, parse_webp_meta)

    rng = np.random.default_rng(13)
    cases = [
        ("mp3", parse_mp3_meta,
         lambda r: build_mp3([int(r.integers(1, 15))] * 3, 1, [0, 1, 0], r)),
        ("mp4", parse_mp4_meta,
         lambda r: build_mp4(1000, 5000, [(b"vide", 64, 48)], r)),
        ("webp", parse_webp_meta,
         lambda r: build_webp("lossless", 10, 10, r)),
    ]
    for name, fn, builder in cases:
        for trial in range(600):
            mode = trial % 3
            if mode == 0:
                b = rng.integers(0, 256, int(rng.integers(0, 64))).astype(
                    np.uint8).tobytes()
            elif mode == 1:
                g = builder(rng)
                b = g[:int(rng.integers(0, len(g)))]
            else:
                g = bytearray(builder(rng))
                for _ in range(int(rng.integers(1, 4))):
                    g[int(rng.integers(0, len(g)))] ^= 1 << int(
                        rng.integers(0, 8))
                b = bytes(g)
            try:
                fn(b)
            except ValueError:
                pass  # the allowed failure mode

    # crafted empty/short metadata boxes at end-of-payload (the direct
    # payload[body] reads) must be ValueError, not IndexError
    import struct
    with pytest.raises(ValueError, match="mvhd box too short"):
        parse_mp4_meta(_mp4_box(b"moov", _mp4_box(b"mvhd", b"")))
    with pytest.raises(ValueError, match="tkhd box too short"):
        parse_mp4_meta(_mp4_box(b"moov", _mp4_box(b"trak",
                                                  _mp4_box(b"tkhd", b""))))
    for fourcc, msg in ((b"VP8L", "VP8L chunk too short"),
                        (b"VP8X", "VP8X chunk too short"),
                        (b"VP8 ", "VP8 chunk too short")):
        body = fourcc + struct.pack("<I", 0)
        payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
        with pytest.raises(ValueError, match=msg):
            parse_webp_meta(payload)


def test_vp8l_roundtrip_matrix():
    """From-scratch WebP-lossless codec: bit-exact pixel round-trip
    across content kinds (noise / LZ77-heavy tiles / gradients), encoder
    configurations (color cache off/4/6 bits × SUBTRACT_GREEN), and
    degenerate shapes (1×1, 1-pixel-wide, 1-pixel-tall); the emitted
    container also satisfies the independent metadata walk
    (parse_webp_meta: format VP8L, exact dims, no alpha)."""
    import numpy as np

    from logray.ops.multimodal import parse_webp_meta
    from logray.ops.vp8lcodec import decode_vp8l, encode_vp8l

    rng = np.random.default_rng(31)
    shapes = [(1, 1), (1, 17), (17, 1), (23, 40), (64, 48)]
    for si, (h, w) in enumerate(shapes):
        for kind in range(3):
            if kind == 0:
                px = rng.integers(0, 256, size=(h, w, 3)).astype(np.uint8)
            elif kind == 1:
                tile = rng.integers(0, 256, size=(3, 3, 3))
                px = np.tile(tile, (h // 3 + 1, w // 3 + 1, 1))[:h, :w]
                px = px.astype(np.uint8)
            else:
                px = ((np.arange(h)[:, None, None] * 3
                       + np.arange(w)[None, :, None] * 5
                       + np.arange(3)[None, None, :] * 40) % 256
                      ).astype(np.uint8)
            for cb, sg, pb in [(0, False, None), (4, False, None),
                               (6, True, None), (2, True, None),
                               (0, False, 3), (4, True, 2), (2, False, 5)]:
                enc = encode_vp8l(px, cache_bits=cb, subtract_green=sg,
                                  predictor_bits=pb)
                assert np.array_equal(decode_vp8l(enc), px), \
                    (si, kind, cb, sg, pb)
                meta = parse_webp_meta(enc)
                assert meta["variant"] == "lossless"
                assert not meta["has_alpha"]
                assert (meta["width"], meta["height"]) == (w, h)
    # RGBA return path: alpha is opaque on this codec's own streams
    px = rng.integers(0, 256, size=(9, 9, 3)).astype(np.uint8)
    rgba = decode_vp8l(encode_vp8l(px), return_alpha=True)
    assert rgba.shape == (9, 9, 4) and (rgba[:, :, 3] == 255).all()
    assert np.array_equal(rgba[:, :, :3], px)


def test_vp8l_plane_code_table_and_compression():
    """The 120-entry close-neighborhood distance table matches the
    spec's head ordering and its documented domain (dx∈[-7,8], dy∈[0,7],
    raster-positive); LZ77-heavy input actually compresses (backrefs and
    the color cache are exercised, not just literals)."""
    import numpy as np

    from logray.ops.vp8lcodec import _PLANE, encode_vp8l

    assert len(_PLANE) == 120
    assert _PLANE[:14] == [(0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
                           (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2),
                           (0, 3), (3, 0)]
    assert all(-7 <= dx <= 8 and 0 <= dy <= 7 for dx, dy in _PLANE)
    assert all(dy > 0 or dx >= 1 for dx, dy in _PLANE)
    assert len(set(_PLANE)) == 120

    rng = np.random.default_rng(5)
    tile = rng.integers(0, 256, size=(4, 4, 3))
    px = np.tile(tile, (16, 16, 1)).astype(np.uint8)  # 64×64
    enc = encode_vp8l(px, cache_bits=4)
    assert len(enc) < px.nbytes // 8  # real compression, not a store


def test_vp8l_rejects_corruption_and_unsupported():
    """Foreign/malformed streams fail loudly: bad container, bad
    signature byte, nonzero version, out-of-subset transforms, truncated
    bitstreams, and backward references landing before the image start
    all raise ValueError (never a silent wrong image or an IndexError)."""
    import struct

    import numpy as np
    import pytest

    from logray.ops.vp8lcodec import (_BitWriter, decode_vp8l, encode_vp8l)

    px = np.arange(12 * 12 * 3, dtype=np.uint8).reshape(12, 12, 3) % 251
    good = encode_vp8l(px, cache_bits=3)

    with pytest.raises(ValueError, match="RIFF/WEBP"):
        decode_vp8l(b"JUNK" + good[4:])
    with pytest.raises(ValueError, match="signature"):
        i = good.index(b"VP8L") + 8
        decode_vp8l(good[:i] + b"\x30" + good[i + 1:])
    with pytest.raises(ValueError):
        decode_vp8l(good[:len(good) // 2])  # truncated mid-bitstream

    def craft(header_bits):
        bw = _BitWriter()
        for val, n in header_bits:
            bw.bits(val, n)
        payload = b"\x2f" + bw.done()
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            chunk += b"\x00"
        return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk

    dims = [(3, 14), (3, 14), (0, 1)]  # 4×4, no alpha
    with pytest.raises(ValueError, match="version"):
        decode_vp8l(craft(dims + [(5, 3)]))
    with pytest.raises(ValueError, match="duplicate transform"):
        decode_vp8l(craft(dims + [(0, 3), (1, 1), (2, 2), (1, 1), (2, 2)]))
    with pytest.raises(ValueError, match="overrun"):
        # COLOR transform announced, stream ends before its sub-image
        decode_vp8l(craft(dims + [(0, 3), (1, 1), (1, 2)]))
    with pytest.raises(ValueError, match="overrun"):
        # meta-prefix bit set, stream ends before the entropy image
        decode_vp8l(craft(dims + [(0, 3), (0, 1), (0, 1), (1, 1)]))
    # systematic bit-flip fuzz: every failure must be ValueError
    rng = np.random.default_rng(13)
    body = bytearray(good)
    start = good.index(b"VP8L") + 8
    bad_count = 0
    for _ in range(300):
        b = bytearray(body)
        j = int(rng.integers(start, len(b)))
        b[j] ^= 1 << int(rng.integers(0, 8))
        try:
            out = decode_vp8l(bytes(b))
            # a flipped header bit can legally change dims; the contract
            # is only that nothing but ValueError ever escapes
            assert out.ndim == 3 and out.shape[2] == 3
        except ValueError:
            bad_count += 1
    assert bad_count > 0  # the guards do fire under fuzz


def test_vp8l_fixture_and_stage():
    """The webpl fixture's truth sidecar is reproduced exactly by the
    actor-pool decode stage from compressed bytes alone (lossless), and
    the fixture contains the intended variety (1-wide images, both
    transforms, cache on and off)."""
    from logray.ops.multimodal import DecodeImageStage, make_webpl_media_table

    t = make_webpl_media_table(25)
    assert 1 in t["true_width"].to_pylist()
    stage = DecodeImageStage(decode="webp")
    padded = t.append_column("width", pa.nulls(25, pa.int32())) \
              .append_column("height", pa.nulls(25, pa.int32()))
    out = stage(padded)
    assert out["width"].to_pylist() == t["true_width"].to_pylist()
    assert out["height"].to_pylist() == t["true_height"].to_pylist()
    assert out["mean_luma"].to_pylist() == t["true_mean_luma"].to_pylist()
    assert out["phash64"].to_pylist() == t["true_ahash"].to_pylist()


def test_vp8l_predictor_transform():
    """The PREDICTOR transform earns its keep (gradient images compress
    several× smaller than literal coding) and the decoder enforces the
    transform contract: mode values above 13 in the sub-resolution image
    and predictor streams truncated mid-sub-image raise ValueError."""
    import struct

    import numpy as np
    import pytest

    from logray.ops.vp8lcodec import (_BitWriter, _write_image_stream,
                                      decode_vp8l, encode_vp8l)

    gy = np.linspace(0, 120, 48)[:, None, None]
    gx = np.linspace(0, 77, 40)[None, :, None]
    px = ((10 + gy + gx) % 256).astype(np.uint8).repeat(3, axis=2)[:, :, :3]
    plain = encode_vp8l(px, subtract_green=True)
    pred = encode_vp8l(px, subtract_green=True, predictor_bits=4)
    # gray gradient: subtract-green already zeroes r/b, so the win is
    # bounded; a colored gradient shows the full predictor effect below
    assert len(pred) < int(len(plain) * 0.8)
    assert np.array_equal(decode_vp8l(pred), px)
    base = np.random.default_rng(2).integers(0, 256, size=(1, 1, 3))
    color = ((base + gy * 1.7 + gx * 0.9) % 256).astype(np.uint8)
    plain_c = encode_vp8l(color, subtract_green=True)
    pred_c = encode_vp8l(color, subtract_green=True, predictor_bits=4)
    assert len(pred_c) < len(plain_c) // 2
    assert np.array_equal(decode_vp8l(pred_c), color)

    def wrap(bw: _BitWriter) -> bytes:
        payload = b"\x2f" + bw.done()
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            chunk += b"\x00"
        return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk

    # 8×8 image, predictor blocks 4×4 → 2×2 mode image carrying mode 14
    bw = _BitWriter()
    for val, n in [(7, 14), (7, 14), (0, 1), (0, 3), (1, 1), (0, 2), (0, 3)]:
        bw.bits(val, n)
    _write_image_stream(bw, [0xFF000000 | (14 << 8)] * 4, 2)
    bw.bits(0, 1)                       # end of transforms
    _write_image_stream(bw, [0xFF000000 | (1 << 16)] * 64, 8,
                        is_level0=True)
    with pytest.raises(ValueError, match="invalid predictor mode"):
        decode_vp8l(wrap(bw))

    with pytest.raises(ValueError):     # truncated inside the sub-image
        decode_vp8l(pred[:pred.index(b"VP8L") + 16])


def test_vp8l_color_palette_and_meta():
    """The remaining VP8L features round-trip bit-exactly: the
    cross-color COLOR transform (and it actually helps on
    channel-correlated content), COLOR_INDEXING across every bundling
    width (2/4/8 indices per byte and the unbundled >16-color case),
    meta prefix codes, and transform composition; out-of-range palette
    indices in a crafted stream raise."""
    import struct

    import numpy as np
    import pytest

    from logray.ops.vp8lcodec import (_BitWriter, _write_image_stream,
                                      decode_vp8l, encode_vp8l)

    rng = np.random.default_rng(41)
    # channel-correlated image: r/b follow g closely -> cross-color wins
    g = rng.integers(0, 256, size=(40, 40)).astype(np.int32)
    px = np.stack([(g + rng.integers(-6, 7, g.shape)) % 256,
                   g,
                   (g + rng.integers(-6, 7, g.shape)) % 256],
                  axis=-1).astype(np.uint8)
    plain = encode_vp8l(px)
    colored = encode_vp8l(px, color_bits=4, subtract_green=True)
    assert np.array_equal(decode_vp8l(colored), px)
    assert len(colored) < len(plain)

    # palette: every bundling width (1/2/4 bits per index) + unbundled
    for ncol in (2, 4, 13, 200):
        pal = rng.integers(0, 256, size=(ncol, 3))
        idx = rng.integers(0, ncol, size=(23, 31))
        ppx = pal[idx].astype(np.uint8)
        enc = encode_vp8l(ppx, palette=True)
        assert np.array_equal(decode_vp8l(enc), ppx), ncol
    two = encode_vp8l((pal[:2][rng.integers(0, 2, size=(64, 64))]
                       ).astype(np.uint8), palette=True)
    assert len(two) < 64 * 64 * 3 // 20  # 1-bit bundling earns its keep

    # meta prefix codes with statistically distinct halves
    top = rng.integers(0, 32, size=(16, 32, 3))
    bot = rng.integers(224, 256, size=(16, 32, 3))
    mpx = np.concatenate([top, bot]).astype(np.uint8)
    enc = encode_vp8l(mpx, meta_bits=3, cache_bits=4)
    assert np.array_equal(decode_vp8l(enc), mpx)

    # crafted stream: palette of 5 entries but a packed index of 15
    bw = _BitWriter()
    for val, n in [(3, 14), (0, 14), (0, 1), (0, 3)]:  # 4×1 image
        bw.bits(val, n)
    bw.bits(1, 1)
    bw.bits(3, 2)                       # COLOR_INDEXING
    bw.bits(4, 8)                       # palette size 5 -> 4-bit bundling
    _write_image_stream(bw, [0xFF000000 | (7 << 8)] * 5, 5)
    bw.bits(0, 1)                       # end of transforms
    _write_image_stream(bw, [0xFF00FF00] * 2, 2, is_level0=True)
    payload = b"\x2f" + bw.done()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    blob = (b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk)
    with pytest.raises(ValueError, match="palette index out of range"):
        decode_vp8l(blob)


def test_vp8l_resize_stage_real_path():
    """The webp resize stage really decodes, resamples and re-encodes:
    thumbnail payloads are valid VP8L whose decoded features equal the
    fixture's generation-time thumbnail truth exactly (lossless chain)."""
    from logray.ops.multimodal import (THUMB_MAX_SIDE, ResizeImageStage,
                                       make_webpl_media_table)
    from logray.ops.vp8lcodec import decode_vp8l

    t = make_webpl_media_table(18)
    stage = ResizeImageStage(decode="webp", max_side=THUMB_MAX_SIDE)
    padded = t.append_column("width", pa.nulls(18, pa.int32())) \
              .append_column("height", pa.nulls(18, pa.int32()))
    out = stage(padded)
    assert out["width"].to_pylist() == t["true_thumb_w"].to_pylist()
    assert out["height"].to_pylist() == t["true_thumb_h"].to_pylist()
    from logray.ops.multimodal import _ahash64, _luma
    for i in range(18):
        px = decode_vp8l(out["payload"][i].as_py())
        assert px.shape[1] == t["true_thumb_w"][i].as_py()
        assert _ahash64(_luma(px)) == t["true_thumb_ahash"][i].as_py()


def test_vp8l_review_hardening():
    """Review-pass regressions: (a) the LZ77 tokenizer never emits a
    distance beyond the 40-code alphabet's reach (a >1M-pixel image with
    a far repeat used to crash the encoder with IndexError); (b) simple
    2-symbol prefix codes decode canonically — bit 0 maps to the SMALLER
    symbol even when the larger one is transmitted first (foreign-stream
    conformance)."""
    from logray.ops.vp8lcodec import (_MAX_DIST_CODE, _BitReader,
                                      _BitWriter, _prefix_encode,
                                      _read_prefix_code, _tokenize_stream)

    # (a) motif at 0 and again past the max expressible distance, with
    # unique filler so the hash chain still holds position 0
    far = _MAX_DIST_CODE - 120 + 5
    motif = [0xFF000001, 0xFF000002, 0xFF000003, 0xFF000004]
    seq = (motif
           + [0xFF100000 + i for i in range(far - 4)]
           + motif)
    tokens, _ = _tokenize_stream(seq, 1024, cache_bits=0, min_match=3)
    for tok in tokens:
        if tok[0] == "copy":
            assert tok[4] < 40  # distance prefix symbol in-alphabet
    # the same copy at a legal distance IS taken (clamp, not disable)
    near = motif + [0xFF100000 + i for i in range(100)] + motif
    toks2, _ = _tokenize_stream(near, 16, cache_bits=0, min_match=3)
    assert any(t[0] == "copy" for t in toks2)

    # (b) simple code transmitting (200, 3) in that order: canonical
    # decoding must map bit 0 to symbol 3, not to the first-transmitted
    bw = _BitWriter()
    bw.bits(1, 1)   # simple
    bw.bits(1, 1)   # two symbols
    bw.bits(1, 1)   # first symbol in 8 bits
    bw.bits(200, 8)
    bw.bits(3, 8)
    bw.bits(0, 1)   # next code bit: 0
    bw.bits(1, 1)   # then: 1
    br = _BitReader(bw.done())
    tree = _read_prefix_code(br, 256)
    assert tree.read(br) == 3
    assert tree.read(br) == 200


def test_warc_rejects_negative_content_length():
    """A crafted record whose Content-Length is negative (or '+5'-style)
    must raise, not walk the cursor backward into an infinite loop."""
    import pytest

    from logray.sources import warc_split_records

    def rec(clen_field: str) -> bytes:
        return (b"WARC/1.0\r\n"
                b"WARC-Type: resource\r\n"
                b"WARC-Record-ID: <urn:uuid:x>\r\n"
                b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
                + f"Content-Length: {clen_field}\r\n\r\n".encode()
                + b"xxxxx\r\n\r\n")

    for bad in ("-63", "+5", "1_0", " 5 x"):
        with pytest.raises(ValueError, match="non-integer Content-Length"):
            warc_split_records(rec(bad))


def test_classifier_featurize_and_score_kernel():
    """Hashed-BoW featurization matches a naive per-row loop (mean
    pooling, lower-casing, non-alnum split, empty-token drop), and the
    bincount matvec reproduces the naive dot product."""
    import numpy as np
    import pyarrow as pa

    from logray.functions.hashing import stable_hash64
    from logray.ops.classifier import _hashed_rows, _scores

    texts = pa.array(["The cat, the CAT!", "", "one  two\tthree", "Zz"],
                     pa.string())
    dim = 64
    ri, ids, rl = _hashed_rows(texts, dim)
    # naive reference
    import re
    import zlib
    rows = [[w for w in re.split(r"[^a-z0-9]+", s.lower()) if w]
            for s in texts.to_pylist()]
    naive = [[zlib.crc32(w.encode()) % dim for w in r] for r in rows]
    got = [[] for _ in rows]
    for r, i in zip(ri, ids):
        got[r].append(int(i))
    assert got == naive
    assert list(rl) == [max(len(r), 1) for r in rows]
    rng = np.random.default_rng(3)
    w = rng.normal(size=dim)
    z = _scores(ri, ids, rl, w, 0.25, len(rows))
    for k, r in enumerate(naive):
        want = (sum(w[i] for i in r) / max(len(r), 1)) + 0.25
        assert abs(z[k] - want) < 1e-12


def test_classifier_trains_separable(ray_session):
    """Distributed Adagrad training separates a planted two-vocab corpus
    (loss net-decreases, holdout accuracy 1.0) and the scoring stage
    threads a custom text column name."""
    import numpy as np
    import pyarrow as pa
    import ray
    import ray.data

    from logray.ops.classifier import (ClassifierScoreStage,
                                       train_text_classifier)

    n, dim = 240, 1 << 12
    rows = []
    for i in range(n):
        y = i % 2
        vocab = ["alphaa", "alphab", "alphac"] if y else \
            ["betaa", "betab", "betac"]
        filler = f"common{i % 5} noise{i % 7} pad"
        rows.append({"body": filler + " " + " ".join(
            vocab[(i + j) % 3] for j in range(2 + i % 2)),
            "label": y, "is_test": i % 4 == 0})
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows))
    import pyarrow.compute as pc
    train = ds.map_batches(lambda t: t.filter(pc.invert(t["is_test"])),
                           batch_format="pyarrow")
    w, b, losses = train_text_classifier(train, text_col="body", dim=dim,
                                         iters=10)
    assert losses[-1] < losses[0] < 0.70
    test = ds.map_batches(lambda t: t.filter(t["is_test"]),
                          batch_format="pyarrow")
    scored = test.map_batches(
        ClassifierScoreStage,
        fn_constructor_kwargs={"w_ref": ray.put(w), "b": b, "dim": dim,
                               "text_col": "body"},
        concurrency=1, batch_size=256, batch_format="pyarrow").to_pandas()
    assert len(scored) == n // 4
    assert (scored["pred"] == scored["label"]).mean() == 1.0
    assert ((scored["score"] >= 0) & (scored["score"] <= 1)).all()


def test_dup_substring_spans_exact_and_maximal(ray_session):
    import random

    from logray.ops.text import dup_substring_spans

    rng = random.Random(7)
    P = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz") for _ in range(60))
    Q = "".join(rng.choice("ABCDEFGHIJKLMNOPQRSTUVWXYZ") for _ in range(39))
    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "0000" + P + "1111",   # P at 4
            "22" + P + "3333",     # P at 2
            Q + "zz",              # 39-char share: below min_len=40
            "yy" + Q,
            "kkkkk" + P + "mmmmm",  # P at 5 → multiplicity-3 anchors
        ])})
    out = (dup_substring_spans(_ds(docs).repartition(3), min_len=40)
           .to_pandas().sort_values(["a_id", "b_id"]).reset_index(drop=True))
    got = {tuple(r) for r in out.to_numpy()}
    # exactly the three P-pairs, each maximal at 60 (neighbors differ);
    # the 39-char Q share never appears
    assert got == {(0, 1, 4, 2, 60), (0, 4, 4, 5, 60), (1, 4, 2, 5, 60)}


def test_blocklist_stage_counts_and_semantics():
    import pyarrow as pa
    import pytest as _pt

    from logray.ops.blocklist import BlocklistStage, blocklist_pattern

    st = BlocklistStage(["hash join", "hash", "table scan"])
    t = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["a HASH JOIN b hash c", "table scan table scan", None,
                 "hashes rehash"],  # word-boundary: no partial-word hits
    })
    out = st(t)
    # longest-first alternation: "hash join" wins over "hash" at the
    # shared start, plus the later bare "hash" → 2 hits for doc 1
    assert out["n_hits"].to_pylist() == [2, 2, 0, 0]
    assert out["blocked"].to_pylist() == [True, True, False, False]
    # pattern builder prefers longer phrase first and escapes literals
    pat = blocklist_pattern(["a.c", "abcd"])
    assert pat.index("abcd") < pat.index("a\\.c")
    with _pt.raises(ValueError):
        blocklist_pattern([])


def test_kmv_set_relations_accuracy_and_merge(ray_session):
    """Bottom-k sketch: estimates within the 6σ bound of exact set sizes
    for overlapping populations, exact below saturation, and merge-exact
    across arbitrary batch splits."""
    import numpy as np
    import ray.data

    from logray.ops.sketch import _kmv_estimate, _kmv_partial, kmv_set_relations

    rng = np.random.default_rng(7)
    # A = [0, 6000), B = [4000, 10000) → |A∩B|=2000, |A∪B|=10000
    a = rng.integers(0, 6_000, 30_000)
    b = rng.integers(4_000, 10_000, 30_000)
    keys = np.concatenate([a, b]).astype(str)
    tags = np.array(["A"] * len(a) + ["B"] * len(b))
    t = pa.table({"tag": pa.array(tags), "key": pa.array(keys)})
    k = 256
    out = kmv_set_relations(
        ray.data.from_arrow(t).repartition(8), "tag", "key", k=k).iloc[0]
    na, nb = len(set(a)), len(set(b))
    inter = len(set(a) & set(b))
    union = len(set(a) | set(b))
    rel = 6.0 / np.sqrt(k - 2)
    rho = inter / union
    assert abs(out["n_a_est"] - na) <= rel * na
    assert abs(out["n_b_est"] - nb) <= rel * nb
    assert abs(out["union_est"] - union) <= rel * union
    assert abs(out["jaccard_est"] - rho) <= 6 * np.sqrt(rho * (1 - rho) / k) + rho * rel
    assert abs(out["inter_est"] - inter) <= (6 * np.sqrt(rho * (1 - rho) / k) + rho * rel) * union + 2

    # unsaturated sketches are exact
    small = pa.array([f"u{i}" for i in range(100)])
    assert _kmv_estimate(_kmv_partial(small, k), k) == 100.0

    # merge-exactness: bottom-k of whole == bottom-k of merged split prefixes
    col = pa.array(keys)
    whole = _kmv_partial(col, k)
    m = np.unique(np.concatenate([_kmv_partial(col.slice(0, 17_000), k),
                                  _kmv_partial(col.slice(17_000), k)]))[:k]
    assert (whole == m).all()


def test_pruned_read_paths_equal_plain_semi(ray_session, tmp_path):
    """Dynamic partition pruning: the isin-pushed path, the range+exact
    path (keys above threshold) and the empty-keys path all return
    exactly the semi-filtered scan."""
    import pyarrow.parquet as _pq

    from logray.ops.relational import pruned_read

    n = 5_000
    t = pa.table({"k": pa.array(np.arange(n, dtype=np.int64)),
                  "v": pa.array(np.arange(n, dtype=np.int64) * 3)})
    p = tmp_path / "big.parquet"
    _pq.write_table(t, p, row_group_size=500)

    keys = np.arange(1_000, 1_400, dtype=np.int64)
    want = {(int(k), int(k) * 3) for k in keys}

    for thr in (100_000, 10):  # isin-pushed vs range+broadcast-exact
        got = pruned_read(str(p), ["k", "v"], "k", keys,
                          isin_threshold=thr).to_pandas()
        assert set(zip(got["k"], got["v"])) == want

    # sparse keys inside a wide range: range pruning alone would keep
    # everything in [0, 4999] — the exact member test must still drop them
    sparse = np.array([0, 2_500, 4_999], dtype=np.int64)
    got = pruned_read(str(p), ["k", "v"], "k", sparse,
                      isin_threshold=1).to_pandas()
    assert sorted(got["k"]) == [0, 2500, 4999]

    empty = pruned_read(str(p), ["k", "v"], "k",
                        np.array([], dtype=np.int64)).to_pandas()
    assert len(empty) == 0


def test_editdist2_selfjoin_complete_vs_bruteforce(ray_session):
    """k=2 deletion-neighborhood blocking finds EVERY pair with ed<=2
    (brute-force DP ground truth) and nothing above it."""
    import itertools

    import ray.data

    from logray.ops.text import edk_deletion_keys, levenshtein_batch
    from logray.ops.text import edit_distance_selfjoin

    rng = np.random.default_rng(31)
    base = ["agent-007", "agnt-007", "agent-017", "aXent-0Y7", "router",
            "route", "rout", "sinker", "sink", "snik", "parser-x"]
    names = base + ["".join(rng.choice(list("abcd"), 6)) for _ in range(30)]
    names = sorted(set(names))
    t = pa.table({"doc_id": pa.array(np.arange(len(names), dtype=np.int64)),
                  "text": pa.array(names)})
    got = (edit_distance_selfjoin(
        ray.data.from_arrow(t).repartition(4), k=2).to_pandas()
        .drop_duplicates(["a", "b"]))
    got_pairs = {(int(r.a), int(r.b), int(r.dist))
                 for r in got.itertuples()}
    want = set()
    for i, j in itertools.combinations(range(len(names)), 2):
        d = int(levenshtein_batch(np.array([names[i]]),
                                  np.array([names[j]]))[0])
        if d <= 2:
            want.add((i, j, d))
    assert got_pairs == want

    # neighborhood-intersection completeness, directly
    for a, b in itertools.combinations(base, 2):
        d = int(levenshtein_batch(np.array([a]), np.array([b]))[0])
        if d <= 2:
            ka = {v for _, v in edk_deletion_keys(a, 2)}
            kb = {v for _, v in edk_deletion_keys(b, 2)}
            assert ka & kb, (a, b)


def test_nth_element_exact_vs_numpy_sort(ray_session):
    """Distributed QuickSelect == numpy full sort at every tested rank,
    including massive-tie columns and thresholds that force deep
    narrowing and the degenerate-width tie path."""
    import ray.data

    from logray.ops.relational import nth_element

    rng = np.random.default_rng(41)
    # heavy ties: half the column is one of 3 values, rest continuous
    a = rng.choice(np.array([7.5, 7.5, 7.5, 100.25, -3.0]), 20_000)
    b = rng.normal(50, 30, 20_000)
    v = np.concatenate([a, b])
    ds = ray.data.from_arrow(
        pa.table({"x": pa.array(v, pa.float64())})).repartition(8)
    s = np.sort(v)
    n = len(v)
    ranks = [0, 1, n // 2, (n - 1) * 99 // 100, n - 1]
    got = nth_element(ds, "x", ranks, pull_threshold=64, nbins=16)
    for r in ranks:
        assert got[r] == s[r], (r, got[r], s[r])

    # all-equal column: resolves via the tie path at any rank
    ties = ray.data.from_arrow(
        pa.table({"x": pa.array(np.full(5_000, 3.25))})).repartition(4)
    assert nth_element(ties, "x", [0, 2_499, 4_999],
                       pull_threshold=10)[2_499] == 3.25


def test_mannwhitney_grouped_counts_equal_per_row_ranks():
    """The grouped-count U/z derivation == the textbook per-row
    average-rank computation (pandas rank), including tie correction."""
    import pandas as pd

    rng = np.random.default_rng(53)
    a = np.round(rng.normal(50, 10, 3_000), 2)   # group 0
    b = np.round(rng.normal(52, 10, 2_000), 2)   # group 1, shifted
    v = np.concatenate([a, b])
    g = np.concatenate([np.zeros(len(a)), np.ones(len(b))])
    ranks = pd.Series(v).rank(method="average").to_numpy()
    n0, n1 = float(len(a)), float(len(b))
    r1 = float(ranks[g == 1].sum())
    u1_ref = r1 - n1 * (n1 + 1) / 2.0

    # grouped-count derivation (the distributed shape)
    cents = np.round(v * 100).astype(np.int64)
    df = pd.DataFrame({"c": cents, "g": g})
    piv = (df.value_counts(["c", "g"]).unstack(fill_value=0)
           .reindex(columns=[0.0, 1.0], fill_value=0).sort_index())
    c0 = piv[0.0].to_numpy().astype(np.float64)
    c1 = piv[1.0].to_numpy().astype(np.float64)
    t = c0 + c1
    avgrank = (np.cumsum(t) - t) + (t + 1.0) / 2.0
    u1 = float(np.sum(c1 * avgrank)) - n1 * (n1 + 1) / 2.0
    assert abs(u1 - u1_ref) < 1e-6
    # planted +2 shift at n=5k must reject at alpha=0.05
    n = n0 + n1
    tie = float(np.sum(t ** 3 - t))
    sigma = np.sqrt(n0 * n1 / 12.0 * ((n + 1.0) - tie / (n * (n - 1.0))))
    z = (u1 - n0 * n1 / 2.0) / sigma
    assert abs(z) > 1.959964


def test_auto_join_picks_each_strategy_and_results_match(ray_session):
    """The planner's choice follows the thresholds, and all three
    strategies compute the identical inner join."""
    import ray.data

    from logray.ops.relational import auto_join

    rng = np.random.default_rng(61)
    # skewed left: one hot key holds half the rows
    k = np.where(rng.random(6_000) < 0.5, 7,
                 rng.integers(0, 500, 6_000))
    left = ray.data.from_arrow(pa.table({
        "k": pa.array(k, pa.int64()),
        "lv": pa.array(np.arange(6_000, dtype=np.int64))})).repartition(4)
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(np.arange(500, dtype=np.int64)),
        "rv": pa.array(np.arange(500, dtype=np.int64) * 10)})).repartition(2)

    def norm(df):
        return set(zip(df["k"], df["lv"], df["rv"]))

    ref = None
    outs = {}
    # broadcast: right under threshold / skew: hot key extrapolates big /
    # hash: skew threshold out of reach
    for kwargs, expect in (
            (dict(broadcast_threshold_rows=1_000), "broadcast"),
            (dict(broadcast_threshold_rows=10, skew_hot_threshold=1_000),
             "skew"),
            (dict(broadcast_threshold_rows=10,
                  skew_hot_threshold=10_000_000), "hash")):
        strat, ds = auto_join(left, right, "k", **kwargs)
        assert strat == expect, (strat, expect)
        outs[expect] = norm(ds.to_pandas())
        ref = ref or outs[expect]
    assert outs["broadcast"] == outs["skew"] == outs["hash"]


def test_skyline_matches_bruteforce_dominance(ray_session, tmp_path):
    """Skyline survivors == brute-force NOT-EXISTS dominance, including
    exact (price, date) ties that must BOTH survive."""
    import pyarrow.parquet as _pq

    from logray.pipelines.queries import skyline_orders

    rng = np.random.default_rng(83)
    n = 400
    price = np.round(rng.uniform(10, 1000, n), 2)
    days = rng.integers(0, 200, n)
    # planted exact tie on the global best point
    best = np.argmax(price - days * 0.001)
    price[5], days[5] = price[best], days[best]
    dates = (np.datetime64("1995-01-01", "us")
             + days.astype("timedelta64[D]").astype("timedelta64[us]"))
    t = pa.table({"o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                  "o_orderdate": pa.array(dates),
                  "o_totalprice": pa.array(price, pa.float64())})
    _pq.write_table(t, tmp_path / "orders.parquet")
    got = set(skyline_orders(str(tmp_path))["o_orderkey"].to_pylist())

    c = np.round(price * 100).astype(np.int64)
    want = set()
    for i in range(n):
        dom = ((c >= c[i]) & (days <= days[i])
               & ((c > c[i]) | (days < days[i])))
        if not dom.any():
            want.add(i)
    assert got == want
    assert 5 in got and best in got  # the tie pair both survive


def test_html_to_text_entity_order_and_tags():
    """Entity decode order: &amp; decodes LAST, so a literal &amp;lt;
    renders '&lt;' and never double-decodes; tags strip to spaces and
    whitespace collapses."""
    from logray.ops.text import html_to_text

    cases = {
        "<html><body>a b</body></html>": "a b",
        "x <b>bold</b> y": "x bold y",
        "r&amp;d": "r&d",
        "&amp;lt;": "&lt;",
        "&lt;tag&gt;": "<tag>",
        '&quot;q&quot; A&#39;s': '"q" A\'s',
        "  lots\n\tof   space  ": "lots of space",
        '<a href="http://h/p">link</a> tail': "link tail",
        "": "",
    }
    out = html_to_text(pa.array(list(cases))).to_pylist()
    assert out == list(cases.values())


def test_sanitize_utf8_replacement_paths():
    from logray.ops.text import sanitize_utf8

    clean = pa.array([b"plain", b"caf\xc3\xa9", None], pa.binary())
    assert sanitize_utf8(clean).to_pylist() == ["plain", "café", None]
    dirty = pa.array([b"ok", b"caf\xe9 x", b"\xff\xfe", None],
                     pa.binary())
    assert sanitize_utf8(dirty).to_pylist() == [
        "ok", "caf� x", "��", None]


def test_bucket_join_equals_hash_join(ray_session, tmp_path):
    """A shuffle-free join over the persisted bucket layout equals the
    hash-shuffle join, including keys whose bucket is empty on one
    side; layout mismatch is tolerated by intersecting buckets."""
    import ray.data

    from logray.ops.layout import bucket_join, write_bucketed

    rng = np.random.default_rng(97)
    left = pa.table({
        "k": pa.array(rng.integers(0, 300, 2_000), pa.int64()),
        "lv": pa.array(np.arange(2_000, dtype=np.int64))})
    right = pa.table({
        "k": pa.array(np.arange(0, 250, dtype=np.int64)),
        "rv": pa.array(np.arange(0, 250, dtype=np.int64) * 7)})
    da, db = tmp_path / "a", tmp_path / "b"
    ra = write_bucketed(ray.data.from_arrow(left).repartition(4),
                        "k", str(da), num_buckets=8)
    rb = write_bucketed(ray.data.from_arrow(right).repartition(2),
                        "k", str(db), num_buckets=8)
    assert ra["rows"].sum() == 2_000 and rb["rows"].sum() == 250

    got = bucket_join(str(da), str(db), "k").to_pandas()
    want = (left.to_pandas().merge(right.to_pandas(), on="k"))
    key = ["k", "lv", "rv"]
    assert (got[key].sort_values(key).reset_index(drop=True)
            .equals(want[key].sort_values(key).reset_index(drop=True)))

    # fused per-bucket aggregate (no second pass)
    agg = bucket_join(
        str(da), str(db), "k",
        bucket_post=lambda df: df.groupby("k", as_index=False)
        .agg(n=("lv", "count"), s=("rv", "sum"))).to_pandas()
    wagg = (want.groupby("k", as_index=False)
            .agg(n=("lv", "count"), s=("rv", "sum")))
    assert (agg.sort_values("k").reset_index(drop=True)
            .equals(wagg.sort_values("k").reset_index(drop=True)))


def test_auto_join_never_executes_left_at_plan_time(ray_session,
                                                    tmp_path):
    """r3 VERDICT item 4: the planner's left-cardinality estimate must
    come from metadata / the sampled prefix, never a full left.count()
    pass. A counting map stage on the left records how many rows
    actually flowed during planning+sampling: far less than two full
    passes (the old code did sample + count + join = 3)."""
    import pyarrow.parquet as _pq
    import ray.data

    from logray.ops.relational import auto_join

    n = 40_000
    k = np.where(np.arange(n) % 2 == 0, 7, np.arange(n) % 500)
    f = tmp_path / "left.parquet"
    _pq.write_table(pa.table({
        "k": pa.array(k, pa.int64()),
        "lv": pa.array(np.arange(n, dtype=np.int64))}), f)
    seen = tmp_path / "seen"
    seen.mkdir()

    def count_rows(b: pa.Table) -> pa.Table:
        (seen / f"{uuid.uuid4().hex}-{b.num_rows}").touch()
        return b

    left = ray.data.read_parquet(str(f)).map_batches(
        count_rows, batch_format="pyarrow")
    right = ray.data.from_arrow(pa.table({
        "k": pa.array(np.arange(500, dtype=np.int64)),
        "rv": pa.array(np.arange(500, dtype=np.int64) * 10)}))
    strat, ds = auto_join(left, right, "k",
                          broadcast_threshold_rows=10,
                          skew_hot_threshold=50_000_000,
                          sample_rows=2_000)
    assert strat == "hash"
    # at PLAN time only the sampled prefix block may have flowed (one
    # block here: a single parquet file) — the old left.count() pushed
    # a SECOND full pass through the stage before the join even ran
    planned = sum(int(p.name.rsplit("-", 1)[1])
                  for p in seen.iterdir())
    assert planned <= n, planned
    assert ds.count() == n  # 1:1 keys: every left row joined


def test_oracle_splitmix64_sql_bit_identical_to_numpy():
    """The negative_sample_parts oracle replays splitmix64 in DuckDB
    HUGEINT arithmetic — verify the SQL chain is bit-identical to the
    numpy kernel over a hostile seed set (0, small, 2^32 boundary,
    large)."""
    import duckdb

    from logray.ops.bloom import _splitmix64

    seeds = np.array([0, 1, 7, 8, 12345, 2**32 - 1, 2**32, 2**32 + 1,
                      999999999999, 2**53, 2**62], dtype=np.uint64)
    con = duckdb.connect()
    con.execute("CREATE TABLE seeds(s HUGEINT)")
    con.executemany("INSERT INTO seeds VALUES (?)",
                    [(int(s),) for s in seeds])
    sql = """
    WITH s1 AS (SELECT s, (s + 11400714819323198485)
                    % 18446744073709551616 AS z FROM seeds),
    s2 AS (SELECT s, xor(z, z >> 30) AS z FROM s1),
    s3 AS (SELECT s, ( ((z % 4294967296) * 13787848793156543929)
                           % 18446744073709551616
                     + (((z // 4294967296) * 13787848793156543929)
                           % 4294967296) * 4294967296 )
                         % 18446744073709551616 AS z FROM s2),
    s4 AS (SELECT s, xor(z, z >> 27) AS z FROM s3),
    s5 AS (SELECT s, ( ((z % 4294967296) * 10723151780598845931)
                           % 18446744073709551616
                     + (((z // 4294967296) * 10723151780598845931)
                           % 4294967296) * 4294967296 )
                         % 18446744073709551616 AS z FROM s4)
    SELECT s, xor(z, z >> 31) AS h FROM s5 ORDER BY s
    """
    rows = con.execute(sql).fetchall()
    got = {int(s): int(h) for s, h in rows}
    want = dict(zip(seeds.tolist(), _splitmix64(seeds).tolist()))
    assert got == want


def test_asof_join_dist_forward_direction(ray_session):
    """direction='forward' (earliest right row at-or-after each left
    row) — the reversed-time-axis path of the r4 Arrow kernel — must
    equal pandas merge_asof(direction='forward'), string by-keys
    included (the factorize branch)."""
    import ray.data

    from logray.ops.window import asof_join_dist

    rng = np.random.default_rng(23)
    left = pd.DataFrame({
        "id": np.arange(2000, dtype=np.int64),
        "k": np.array([f"k{v:02d}" for v in rng.integers(0, 30, 2000)]),
        "t": rng.integers(0, 5_000, 2000).astype(np.int64)})
    right = pd.DataFrame({
        "k": np.array([f"k{v:02d}" for v in rng.integers(0, 25, 600)]),
        "t": rng.integers(0, 5_000, 600).astype(np.int64)})
    right = right.groupby(["k", "t"], as_index=False).size()
    right["val"] = right["t"] * 7
    right = right[["k", "t", "val"]]

    want = pd.merge_asof(left.sort_values("t", kind="mergesort"),
                         right.sort_values("t", kind="mergesort"),
                         on="t", by="k", direction="forward")
    got = asof_join_dist(
        ray.data.from_pandas(left, override_num_blocks=6),
        ray.data.from_pandas(right, override_num_blocks=3),
        by="k", on="t", value_cols=["val"], direction="forward",
        left_schema=pa.schema([("id", pa.int64()), ("k", pa.string()),
                               ("t", pa.int64())]),
        right_schema=pa.schema([("k", pa.string()), ("t", pa.int64()),
                                ("val", pa.int64())])).to_pandas()
    pd.testing.assert_frame_equal(
        got.sort_values("id").reset_index(drop=True)[want.columns.tolist()],
        want.sort_values("id").reset_index(drop=True))


def test_pq_index_planted_structure(ray_session):
    """PQ codebooks + ADC: identical vectors encode to identical codes;
    on well-separated planted clusters the ADC top-k stays inside the
    query's own cluster; the encode→search path is deterministic."""
    import ray.data

    from logray.ops.similarity import PqIndex, ann_topk

    rng = np.random.default_rng(17)
    centers = rng.normal(size=(5, 64)) * 10
    X = np.concatenate([c + rng.normal(size=(40, 64)) * 0.05
                        for c in centers])
    X[7] = X[3]  # planted exact duplicate
    ids = np.arange(len(X), dtype=np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(list(X))})
    idx = PqIndex(m=16, bits=6).fit(X)
    assert idx.codebooks.shape == (16, 64, 4)
    codes_a = idx._codes(X / np.linalg.norm(X, axis=1, keepdims=True))
    assert (codes_a[3] == codes_a[7]).all()  # identical vec, same codes

    ds = ray.data.from_arrow(t).repartition(4)
    codes = ds.map_batches(idx.encode_stage(), batch_format="pyarrow")
    out = idx.search(codes, X[[0, 45, 170]], k=10)
    for qi, base in zip(range(3), (0, 40, 160)):
        got = out[out["query_id"] == qi]["vec_id"].to_numpy()
        assert len(got) == 10
        # every neighbor from the query's own 40-vector cluster
        assert ((got >= base) & (got < base + 40)).all(), (qi, got)
    # rerun → identical result (stateless, seeded)
    out2 = idx.search(codes, X[[0, 45, 170]], k=10)
    pd.testing.assert_frame_equal(out.reset_index(drop=True),
                                  out2.reset_index(drop=True))


def test_ivfpq_planted_clusters_full_recall(ray_session):
    """IVF-PQ on CLUSTERED data (its design regime): the coarse
    quantizer routes each well-separated cluster to its own list, so
    nprobe=2 search recovers the query's whole neighborhood; residual
    codes of identical vectors are identical."""
    import ray.data

    from logray.ops.similarity import IvfPqIndex, ann_topk

    rng = np.random.default_rng(29)
    centers = rng.normal(size=(6, 64)) * 10
    X = np.concatenate([c + rng.normal(size=(50, 64)) * 0.05
                        for c in centers])
    ids = np.arange(len(X), dtype=np.int64)
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(list(X))})
    idx = IvfPqIndex(n_lists=6, m=16, bits=6).fit(X)
    ds = ray.data.from_arrow(t).repartition(4)
    codes = ds.map_batches(idx.encode_stage(), batch_format="pyarrow")
    queries = X[[0, 120, 260]]
    out = idx.search(codes, queries, k=10, nprobe=2)
    for qi, base in zip(range(3), (0, 100, 250)):
        got = out[out["query_id"] == qi]["vec_id"].to_numpy()
        assert len(got) == 10
        # every neighbor from the query's own 50-vector cluster: the
        # coarse routing + residual scoring never leave the cluster
        # (WITHIN a tight blob all cosines are near-ties, so exact
        # tie ordering is not a meaningful PQ property to assert)
        assert ((got >= base) & (got < base + 50)).all(), (qi, got)
    # identical vectors → identical (list, codes)
    enc = idx.encode_stage()(pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([list(X[5]), list(X[5])])}))
    assert enc["ivf_list"][0] == enc["ivf_list"][1]
    assert enc["pq_codes"][0] == enc["pq_codes"][1]


def test_opq_rotation_reduces_quantization_error():
    """OPQ alternating optimization: orthonormal rotation, monotone
    sample error with iteration 0 equal to plain PQ, strictly better
    final error on correlated data (the regime a learned rotation is
    for)."""
    from logray.ops.similarity import opq_train

    rng = np.random.default_rng(31)
    # correlated dims: low-rank structure mixed across coordinates
    Z = rng.normal(size=(1500, 8))
    A = rng.normal(size=(8, 64))
    X = Z @ A + rng.normal(size=(1500, 64)) * 0.05
    R, p, errs = opq_train(X, m=16, bits=6, iters=5)
    assert np.allclose(R @ R.T, np.eye(64), atol=1e-9)
    assert (np.diff(errs) <= 1e-9).all(), errs  # non-increasing
    assert errs[-1] < errs[0] * 0.9  # real gain on correlated data


def test_ddsketch_guarantee_and_merge(ray_session):
    """DDSketch: the α-relative-error guarantee holds for every
    group×quantile on a heavy-tailed distribution, partials merge
    exactly across blocks, and zero values route to the zero bucket."""
    import ray.data

    from logray.ops.sketch import ddsketch_quantiles

    rng = np.random.default_rng(7)
    n = 60_000
    t = pa.table({
        "g": pa.array(rng.integers(0, 4, n)),
        "v": pa.array(np.where(rng.random(n) < 0.01, 0.0,
                               rng.lognormal(2, 1.5, n)))})
    ds = ray.data.from_arrow(t).repartition(8)
    est = ddsketch_quantiles(ds, ["g"], "v", [0.5, 0.99], alpha=0.02)
    df = t.to_pandas()
    for _, r in est.iterrows():
        v = np.sort(df[df["g"] == r["g"]]["v"].to_numpy())
        assert r["sat"] == 0
        for q, col in ((0.5, "p50"), (0.99, "p99")):
            true = v[max(int(np.ceil(q * len(v))), 1) - 1]
            assert abs(r[col] - true) <= 0.02 * abs(true) + 1e-12, \
                (r["g"], q, r[col], true)


def test_ddsketch_negative_store(ray_session):
    """Data containing negatives gets EXACT rank accounting via the
    mirrored negative store (r5 ADVICE fix — previously negatives were
    silently dropped, rank-shifting every estimate): the α bound holds
    for quantiles landing in the negative, zero and positive regions,
    and n_neg surfaces the count."""
    import ray.data

    from logray.ops.sketch import ddsketch_quantiles

    rng = np.random.default_rng(11)
    n = 30_000
    v = np.where(rng.random(n) < 0.4, -rng.lognormal(1, 1.2, n),
                 rng.lognormal(2, 1.0, n))
    v[rng.random(n) < 0.02] = 0.0
    t = pa.table({"g": pa.array(rng.integers(0, 3, n)), "v": pa.array(v)})
    ds = ray.data.from_arrow(t).repartition(6)
    est = ddsketch_quantiles(ds, ["g"], "v", [0.1, 0.5, 0.9],
                             alpha=0.02)
    df = t.to_pandas()
    for _, r in est.iterrows():
        sv = np.sort(df[df["g"] == r["g"]]["v"].to_numpy())
        assert r["sat"] == 0
        assert r["n_neg"] == int((sv < 0).sum())
        for q, col in ((0.1, "p10"), (0.5, "p50"), (0.9, "p90")):
            true = sv[max(int(np.ceil(q * len(sv))), 1) - 1]
            assert abs(r[col] - true) <= 0.02 * abs(true) + 1e-12, \
                (r["g"], q, r[col], true)


def test_broadcast_join_arrow_fast_path_equals_pandas(ray_session):
    """r5: the single-numeric-key Arrow kernel in broadcast_join must
    equal the pandas merge path exactly — inner and left, 1:1 and 1:n
    matches, unmatched-left nulls, duplicate right keys — and string
    keys must still route to the pandas path."""
    import ray.data

    from logray.ops import relational

    rng = np.random.default_rng(17)
    n = 5_000
    left = pa.table({
        "k": pa.array(rng.integers(0, 120, n)),
        "lv": pa.array(np.arange(n, dtype=np.int64))})
    # right: keys 0..99 with key%3==0 duplicated (1:n), 100..119 absent
    rk = np.concatenate([np.arange(100), np.arange(0, 100, 3)])
    right = pd.DataFrame({"k": rk,
                          "rv": np.arange(len(rk), dtype=np.int64) * 7})

    def norm(df):
        df = df[sorted(df.columns)].astype("float64")
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    for how in ("inner", "left"):
        ds = ray.data.from_arrow(left).repartition(5)
        got = relational.broadcast_join(ds, right, on="k",
                                       how=how).to_pandas()
        want = left.to_pandas().merge(right, on="k", how=how)
        pd.testing.assert_frame_equal(norm(got), norm(want),
                                      check_dtype=False)

    # string keys fall back to pandas merge (identical results)
    lefts = pa.table({"k": pa.array([f"u{i%7}" for i in range(50)]),
                      "lv": pa.array(np.arange(50, dtype=np.int64))})
    rights = pd.DataFrame({"k": [f"u{i}" for i in range(5)],
                           "rv": np.arange(5, dtype=np.int64)})
    got = relational.broadcast_join(
        ray.data.from_arrow(lefts), rights, on="k", how="left").to_pandas()
    want = lefts.to_pandas().merge(rights, on="k", how="left")

    def norms(df):
        df = df[sorted(df.columns)].copy()
        df["rv"] = df["rv"].astype("float64")
        return df.sort_values(list(df.columns)).reset_index(drop=True)

    pd.testing.assert_frame_equal(norms(got), norms(want),
                                  check_dtype=False)


def test_hash_semi_join_multikey_and_nulls(ray_session):
    """r5 Arrow membership kernel: multi-column keys get exact tuple
    ids (np.unique axis=0, no hash mixing) and SQL null semantics hold
    — a null in any key column matches nothing, on either side."""
    import ray.data

    from logray.ops import relational

    left = pa.table({
        "a": pa.array([1, 1, 2, 2, None, 3], pa.int64()),
        "b": pa.array(["x", "y", "x", None, "x", "z"]),
        "v": pa.array(np.arange(6, dtype=np.int64))})
    right = pa.table({
        "a": pa.array([1, 2, None, 3], pa.int64()),
        "b": pa.array(["x", "x", "x", None])})
    lds = ray.data.from_arrow(left).repartition(2)
    rds = ray.data.from_arrow(right).repartition(2)
    semi = relational.hash_semi_join(lds, rds, ["a", "b"]).to_pandas()
    assert sorted(semi["v"]) == [0, 2]  # (1,x) and (2,x) only
    anti = relational.hash_semi_join(lds, rds, ["a", "b"],
                                     anti=True).to_pandas()
    assert sorted(anti["v"]) == [1, 3, 4, 5]

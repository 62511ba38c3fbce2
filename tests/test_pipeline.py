"""LLM-pipeline operator tests: dedup, similarity, text analysis,
multimodal plumbing — on tiny synthetic corpora with known structure."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from semantic_cpp_spark.pipeline import dedup, multimodal, similarity, text


DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
    (2, "completely different words appear in this one here"),
    (3, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
    (4, "THE  Quick   Brown fox jumps over the lazy dog"),  # dup modulo case/ws
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup_normalised(docs):
    out = dedup.exact_dedup(docs, F.col("text"), F.col("doc_id")).collect()
    groups = {r["keep_id"]: r["n_dups"] for r in out}
    # 0, 3, 4 collapse into one group (normalisation: lower + collapse ws)
    assert groups[0] == 3
    assert groups[1] == 1
    assert groups[2] == 1


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {
        (r["d1"], r["d2"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(
            docs, F.col("text"), F.col("doc_id"), threshold=0.5
        ).collect()
    }
    assert (0, 3) in pairs and pairs[(0, 3)] == 1.0  # exact dup
    assert (0, 1) in pairs and 0.5 < pairs[(0, 1)] < 1.0  # near dup
    assert (0, 2) not in pairs


def test_minhash_lsh_candidates(docs):
    pairs = {
        (r["d1"], r["d2"]): r["est_jaccard"]
        for r in dedup.minhash_lsh_pairs(
            docs, F.col("text"), F.col("doc_id"), threshold=0.5
        ).collect()
    }
    assert pairs[(0, 3)] == 1.0  # identical shingle sets → identical sigs
    assert all(j >= 0.5 for j in pairs.values())


def test_minhash_skew_clique_triangle_complete(spark):
    """Skew torture (VERDICT r5 #8): an 80%-duplicate corpus puts the
    whole clique in one band bucket. The triangle-distributed band join
    must return the IDENTICAL pair set under a tiny bucket_cap (forcing
    ceil(48/4)=12 groups → 144-way fan-out of the hot bucket) as under an
    effectively-infinite cap (the plain self-join)."""
    rows = [(i, "the same duplicated boilerplate text body here") for i in range(48)]
    rows += [(48 + i, f"unique document number {i} with words {i*7} {i*13}")
             for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def pairs(cap):
        return {
            (r["d1"], r["d2"]): r["est_jaccard"]
            for r in dedup.minhash_lsh_pairs(
                df, F.col("text"), F.col("doc_id"), threshold=0.5,
                bucket_cap=cap,
            ).collect()
        }

    capped, plain = pairs(4), pairs(1 << 30)
    assert capped == plain
    # the clique itself: all 48·47/2 duplicate pairs present at ĵ=1.0
    clique = {k: v for k, v in capped.items() if k[0] < 48 and k[1] < 48}
    assert len(clique) == 48 * 47 // 2
    assert all(v == 1.0 for v in clique.values())


def test_simhash_signature_properties(docs):
    sigs = {
        r["doc_id"]: r["simhash"]
        for r in dedup.simhash(docs, F.col("text"), F.col("doc_id")).collect()
    }
    assert sigs[0] == sigs[3] == sigs[4]  # normalised dups → same signature
    ham01 = bin(sigs[0] ^ sigs[1]).count("1")
    ham02 = bin(sigs[0] ^ sigs[2]).count("1")
    assert ham01 < ham02  # near-dup closer than unrelated


def test_simhash_near_pairs_blocking(docs):
    pairs = {
        (r["d1"], r["d2"])
        for r in dedup.simhash_near_pairs(
            docs, F.col("text"), F.col("doc_id"), max_hamming=3
        ).collect()
    }
    # exact dups are Hamming 0 and must survive the chunk blocking
    assert (0, 3) in pairs and (0, 4) in pairs and (3, 4) in pairs


def test_cosine_topk_matches_numpy(spark):
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(40, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    out = similarity.cosine_topk(df, [0], k=3).collect()
    got = [(r["rk"], r["vec_id"]) for r in sorted(out, key=lambda r: r["rk"])]

    v = vecs.astype(np.float64)
    sims = v @ v[0] / (np.linalg.norm(v, axis=1) * np.linalg.norm(v[0]))
    sims[0] = -np.inf
    expect = list(np.argsort(-sims)[:3])
    assert [g[1] for g in got] == [int(e) for e in expect]


def test_lsh_bucket_is_subset_of_bruteforce_domain(spark):
    rng = np.random.default_rng(4)
    vecs = rng.normal(size=(60, 16)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    out = similarity.lsh_bucket_topk(df, [5], k=4, dims=16).collect()
    # all results share the query's bucket signature by construction
    assert all(r["q_id"] == 5 and r["vec_id"] != 5 for r in out)
    assert len(out) <= 4


def test_lsh_signature_wide_dims(spark):
    """The O(planes) fold form must stay analyzable AND numerically exact
    at real embedding widths (1024 dims × 20 planes): the old unrolled
    element_at add-chain hit codegen/analysis pathologies there. Cross-
    checked bit-for-bit against a numpy reimplementation of the same
    deterministic ±1 plane matrix."""
    dims, planes, n = 1024, 20, 8
    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(n, dims))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    got = {
        r["vec_id"]: r["sig"]
        for r in df.select(
            "vec_id",
            similarity.lsh_signature(F.col("embedding"), dims, planes).alias("sig"),
        ).collect()
    }
    mat = np.array(
        [
            [similarity.plane_sign(p, d) for d in range(dims)]
            for p in range(planes)
        ],
        dtype=np.float64,
    )
    for i in range(n):
        # sequential left-to-right sum matches both Spark fold and oracle
        proj = mat @ vecs[i]
        expect = sum((1 << p) for p in range(planes) if proj[p] > 0)
        assert got[i] == expect, i


def test_lsh_signature_small_dims_matches_unrolled_reference(spark):
    """Pin the fold rewrite against a literal Python reimplementation of
    the ORIGINAL unrolled semantics (element-order sum, strict > 0) on a
    case with near-zero projections."""
    dims, planes = 8, 4
    rows = [
        (0, [0.0] * dims),                      # all-zero → every proj == 0 → sig 0
        (1, [1.0, -1.0] * (dims // 2)),
        (2, [0.25 * (d + 1) for d in range(dims)]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["sig"]
        for r in df.select(
            "vec_id",
            similarity.lsh_signature(F.col("embedding"), dims, planes).alias("sig"),
        ).collect()
    }
    for vid, vec in rows:
        sig = 0
        for p in range(planes):
            proj = 0.0
            for d in range(dims):
                proj += vec[d] * float(similarity.plane_sign(p, d))
            if proj > 0:
                sig += 1 << p
        assert got[vid] == sig, vid
    assert got[0] == 0


def test_banded_lsh_candidates_superset_of_bucket(spark):
    """OR-of-ANDs amplification: with the SAME planes, a whole-signature
    match implies every band matches, so banded candidates are a superset
    of single-key bucket candidates — banded top-1 cosine is therefore
    never worse. Checked per query on random vectors."""
    rng = np.random.default_rng(23)
    vecs = rng.normal(size=(80, 16)).astype(np.float64)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(80)],
        "vec_id long, embedding array<double>",
    )
    qids = [3, 11]
    bucket = similarity.lsh_bucket_topk(df, qids, k=1, dims=16, planes=8).collect()
    banded = similarity.lsh_banded_topk(
        df, qids, k=1, dims=16, planes=8, band_bits=4
    ).collect()
    b1 = {r["q_id"]: r["cos"] for r in bucket}
    n1 = {r["q_id"]: r["cos"] for r in banded}
    for q in b1:  # bucket found a candidate → banded must do at least as well
        assert q in n1 and n1[q] >= b1[q] - 1e-9
    with pytest.raises(ValueError):  # planes must split into whole bands
        similarity.lsh_band_keys(F.col("embedding"), 16, 10, 4)


def test_ann_topk_routes_by_corpus_size(spark):
    """The ANN front door picks the physical strategy from the derived
    signature width: small corpora take the single-key bucket join;
    web-scale counts (n_override — a real count at that size is a
    cluster job) take 8-bit banding with planes rounded UP to whole
    bands. Both branches return the same schema."""
    rng = np.random.default_rng(31)
    vecs = rng.normal(size=(60, 16))
    vecs[45] = vecs[5] + rng.normal(scale=1e-3, size=16)  # planted near-dup
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(60)],
        "vec_id long, embedding array<double>",
    )
    small = similarity.ann_topk(df, [5], k=3, dims=16).collect()
    # n_override=2^35 (a real count at that size is a cluster job):
    # raw planes = log2(2^35/64) = 29 → rounds up to 32 = 4×8-bit bands
    big = similarity.ann_topk(df, [5], k=3, dims=16, n_override=2**35).collect()
    for rows in (small, big):
        assert rows and set(rows[0].asDict()) == {"q_id", "rk", "vec_id", "cos"}
        assert all(r["q_id"] == 5 and r["vec_id"] != 5 for r in rows)
    # the near-identical vector shares every sign bit → both routes
    # must surface it at rank 1
    assert small[0]["vec_id"] == 45 and big[0]["vec_id"] == 45


def test_cosine_topk_tolerates_zero_vector(spark):
    """A zero-norm corpus vector must never crash (ANSI divide-by-zero)
    nor rank as a candidate: its cosine is null → sorted last."""
    rows = [(0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 0.0]), (3, [0.5, 0.5])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = similarity.cosine_topk(df, [0], k=2).collect()
    assert [r["vec_id"] for r in got] == [1, 3]  # zero vector excluded


def test_quantized_topk_recall_and_zero_vector(spark):
    """int8-quantized ANN: quantization must keep cosine ranks close —
    on well-separated random vectors the approx top-3 equals the exact
    top-3 — and an all-zero vector must quantize to zeros (not NaN)."""
    rng = np.random.default_rng(17)
    vecs = rng.normal(size=(40, 32))
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    rows.append((40, [0.0] * 32))  # zero vector: valid corpus member
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = similarity.quantized_topk(df, [7], k=3).collect()
    assert [r["q_id"] for r in got] == [7, 7, 7]
    sims = vecs @ vecs[7] / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[7]))
    sims[7] = -np.inf
    exact_top = set(int(i) for i in np.argsort(-sims)[:3])
    assert {r["vec_id"] for r in got} == exact_top
    # rescored cos must match the exact cosine to rounding
    for r in got:
        assert abs(r["cos"] - sims[r["vec_id"]]) < 1e-5
        assert abs(r["approx_cos"] - sims[r["vec_id"]]) < 0.05  # int8 error band


def test_text_analysis_basics(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the hat"), (2, "zz9")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            text.token_count(F.col("text")).alias("n"),
            F.round(text.stopword_ratio(F.col("text")), 4).alias("sr"),
            text.lang_id(F.col("text")).alias("lang"),
            text.fingerprint(F.col("text")).alias("fp"),
        ).collect()
    }
    assert out[1]["n"] == 5
    assert out[1]["sr"] == 0.6  # 'the' x2 + 'and' of 5 tokens
    assert out[1]["lang"] == "en"
    assert out[2]["n"] == 1
    import hashlib

    assert out[1]["fp"] == hashlib.md5(b"the cat and the hat").hexdigest()


def test_multimodal_plumbing_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, "another doc")], "doc_id long, text string"
    )
    payload = multimodal.attach_binary_payload(df)
    assert dict(payload.dtypes)["payload"] == "binary"
    a = sorted(multimodal.extract_features(payload).collect(), key=lambda r: r["doc_id"])
    b = sorted(multimodal.extract_features(payload).collect(), key=lambda r: r["doc_id"])
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    import hashlib

    assert a[0]["checksum"] == hashlib.md5(b"hello world").hexdigest()
    assert a[0]["n_bytes"] == 11
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG")


def test_extract_features_quarantines_corrupt_magic(spark):
    """Three-way decode dispatch contract (ADVICE r5): a payload whose
    magic CLAIMS a decodable format but whose body is corrupt yields
    decoded=false + NULL features (quarantineable) — never fabricated
    dimensions; a real decode carries decoded=true; an opaque format
    keeps the clearly-marked fake features with decoded=false."""
    rows = [
        (1, multimodal.render_ppm(1)),    # real P6 decode
        (2, b"P6 this is not an image"),  # magic-claimed, corrupt body
        (3, b"\x89PNG not decodable"),    # opaque format -> marked fake
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in multimodal.extract_features(df).collect()}
    assert out[1]["decoded"] is True and out[1]["width"] == 9
    assert out[2]["decoded"] is False
    assert out[2]["width"] is None and out[2]["feat_mean"] is None
    assert out[2]["n_bytes"] == len(rows[1][1])  # byte metadata stays real
    assert out[3]["decoded"] is False and out[3]["width"] is not None


def test_plugin_decoder_flows_through_extract_features(spark):
    """The codec plug-in seam (multimodal.register_image_decoder): a
    deployment with real codec libraries installs ONE function and
    extract_features flows real features (decoded=true) for formats the
    stdlib tier raises on — the decoder is captured into the kernel
    closure, so it executes on the Python workers, not just the driver."""
    def fake_png_decoder(b):
        if b[:4] != b"\x89PNG":
            raise NotImplementedError("not a PNG")
        return 4, 2, 255, bytes(range(24))

    multimodal.register_image_decoder(fake_png_decoder)
    try:
        rows = [
            (1, b"\x89PNG simulated compressed image"),
            (2, multimodal.render_ppm(2)),   # stdlib tier still wins for PPM
            (3, b"GIF89a opaque to both tiers"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, payload binary")
        out = {r["doc_id"]: r for r in multimodal.extract_features(df).collect()}
    finally:
        multimodal.register_image_decoder(None)
    assert out[1]["decoded"] is True
    assert (out[1]["width"], out[1]["height"]) == (4, 2)
    assert abs(out[1]["feat_mean"] - (sum(range(24)) / 24) / 255) < 1e-12
    assert out[2]["decoded"] is True and out[2]["width"] == 8 + 2 % 9
    assert out[3]["decoded"] is False  # plug-in miss -> marked fake


def test_near_dup_triangle_join_complete_under_tiny_cap(spark):
    """The triangle-distributed self-join (hot-bucket straggler fix, r6
    sf1.0 finding) must preserve pair COMPLETENESS exactly: with a cap so
    small every bucket is forced to split into many groups, the result
    still equals the plain all-pairs-in-bucket answer."""
    rng = np.random.default_rng(17)
    base = rng.normal(size=16)
    # one tight cluster (everything collides in one sign bucket) + noise
    vecs = [base + rng.normal(scale=0.01, size=16) for _ in range(30)]
    vecs += [rng.normal(size=16) for _ in range(10)]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r["d1"], r["d2"]): r["cos"]
        for r in similarity.embedding_near_dup_pairs(
            df, threshold=0.9, dims=16, planes=2, bucket_cap=4
        ).collect()
    }
    # brute-force expectation: same signature AND cos >= threshold
    import numpy.linalg as la

    sig = []
    for v in vecs:
        s = 0
        for p in range(2):
            plane = np.array([similarity.plane_sign(p, d) for d in range(16)])
            s += (1 << p) * (int(np.dot(v, plane) > 0))
        sig.append(s)
    want = {}
    for i in range(len(vecs)):
        for j in range(i + 1, len(vecs)):
            if sig[i] == sig[j]:
                c = float(
                    np.dot(vecs[i], vecs[j])
                    / (la.norm(vecs[i]) * la.norm(vecs[j]))
                )
                if c >= 0.9:
                    want[(i, j)] = round(c, 6)
    assert set(got) == set(want)
    for key in want:
        assert abs(got[key] - want[key]) < 1e-6


def test_ann_recall_floors(spark):
    """Measured retrieval QUALITY floors vs brute-force ground truth
    (VERDICT r5 #2 — the sim_* oracles prove determinism, not recall).
    Invariants pinned: (1) banded candidates ⊇ bucket candidates at equal
    planes, and exact rescoring makes recall monotone in the candidate
    set, so banded recall ≥ bucket recall; (2) int8-quantized rescore is
    near-exact; (3) IVF at the K≈√n derivation beats the coarse settings.
    Full sweep with scan-cost columns: scripts/ann_recall.py → SCALING.md."""
    from semantic_cpp_spark.session import load_table

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings").cache()
    qids = list(range(20))
    k = 5

    def rec(df):
        got = {}
        for r in df.collect():
            got.setdefault(r["q_id"], set()).add(r["vec_id"])
        num = sum(len(truth[q] & got.get(q, set())) for q in truth)
        return num / (len(truth) * k)

    truth = {}
    for r in similarity.cosine_topk(emb, qids, k=k).collect():
        truth.setdefault(r["q_id"], set()).add(r["vec_id"])

    r_bucket8 = rec(similarity.lsh_bucket_topk(emb, qids, k=k, dims=64, planes=8))
    r_banded8 = rec(
        similarity.lsh_banded_topk(emb, qids, k=k, dims=64, planes=8, band_bits=4)
    )
    assert r_banded8 >= r_bucket8  # OR-of-ANDs superset, measured
    r_probe8 = rec(similarity.lsh_multiprobe_topk(emb, qids, k=k, dims=64, planes=8))
    assert r_probe8 >= r_bucket8  # probe set includes the own bucket
    r_quant = rec(similarity.quantized_topk(emb, qids, k=k))
    assert r_quant >= 0.95  # int8 + exact rescore is near-exact
    n = emb.count()
    r_ivf = rec(
        similarity.ivf_topk(
            emb, qids, k=k, dims=64, n_centroids=similarity.derived_ivf_k(n)
        )
    )
    assert r_ivf >= 0.5  # K≈√n: measured 0.64 @ n=500, 0.876 @ n=2000
    r_ivf2 = rec(
        similarity.ivf_multiprobe_topk(
            emb, qids, k=k, dims=64, nprobe=2,
            n_centroids=similarity.derived_ivf_k(n),
        )
    )
    # nprobe=2 probes a SUPERSET of nprobe=1's lists (same ranking, rank
    # ≤2 vs ==1) and rescoring is exact, so recall is monotone in nprobe.
    assert r_ivf2 >= r_ivf


def test_ann_recall_floors_clustered(spark):
    """Clustered-embedding recall floors (VERDICT r6 #5): the driver
    fixture is isotropic, which understates sign-LSH recall and the
    banding/nprobe machinery — on a mixture-of-Gaussians set (the shape
    real embeddings have) the gains must MATERIALIZE, not just be
    plausible. Deterministic: fixed-seed data, hash-derived planes,
    deterministic IVF seeding. Floors are the round-7 measured values
    (bucket8 0.267, banded16/4 0.960, multiprobe8 0.693, IVF K=24
    nprobe1/2/3 = 0.640/0.827/0.933) with safety margin; the KEY pin is
    the nprobe dial: on clustered data nprobe=2 must beat nprobe=1 by a
    real margin (+0.187 measured; +0.02 on isotropic), because nearest
    neighbors of a boundary query sit in the adjacent Voronoi cell.
    Full sweep: scripts/ann_recall.py on the --tables embeddings MoG
    fixture → SCALING.md."""
    import numpy as np

    rng = np.random.default_rng(11)
    centers = rng.normal(0, 1, (10, 64))
    labels = rng.integers(0, 10, 600)
    X = (centers[labels] + rng.normal(0, 0.5, (600, 64))).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(600)],
        "vec_id long, embedding array<float>",
    ).cache()
    qids = list(range(15))
    k = 5

    truth = {}
    for r in similarity.cosine_topk(emb, qids, k=k).collect():
        truth.setdefault(r["q_id"], set()).add(r["vec_id"])

    def rec(df):
        got = {}
        for r in df.collect():
            got.setdefault(r["q_id"], set()).add(r["vec_id"])
        return sum(len(truth[q] & got.get(q, set())) for q in truth) / (
            len(truth) * k
        )

    r_bucket = rec(similarity.lsh_bucket_topk(emb, qids, k=k, dims=64, planes=8))
    r_banded = rec(
        similarity.lsh_banded_topk(emb, qids, k=k, dims=64, planes=16, band_bits=4)
    )
    r_probe = rec(similarity.lsh_multiprobe_topk(emb, qids, k=k, dims=64, planes=8))
    assert r_bucket >= 0.15
    assert r_banded >= 0.85  # banding shines on clustered data
    assert r_probe >= 0.5 and r_probe >= r_bucket

    K = similarity.derived_ivf_k(600)
    r1 = rec(similarity.ivf_topk(emb, qids, k=k, dims=64, n_centroids=K))
    r2 = rec(
        similarity.ivf_multiprobe_topk(
            emb, qids, k=k, dims=64, nprobe=2, n_centroids=K
        )
    )
    r3 = rec(
        similarity.ivf_multiprobe_topk(
            emb, qids, k=k, dims=64, nprobe=3, n_centroids=K
        )
    )
    assert r1 >= 0.5
    assert r2 >= r1 + 0.1  # the nprobe dial is REAL on clustered data
    assert r3 >= r2  # probe-superset monotonicity

    # two-stage truncation rescore (r8): candidate set grows with C and
    # rescore is exact, so recall is monotone in C; at C = n the candidate
    # stage is a no-op and the output IS the exact top-k; and any C ≥ k
    # dominates one-stage d=16 truncation (whose top-5 equals the C=5
    # candidate set). Measured on this fixture: C=50 → 0.973, C=200 → 1.0.
    r_c10 = rec(similarity.truncated_rescore_topk(emb, qids, k=k, n_candidates=10))
    r_c50 = rec(similarity.truncated_rescore_topk(emb, qids, k=k, n_candidates=50))
    r_c200 = rec(similarity.truncated_rescore_topk(emb, qids, k=k, n_candidates=200))
    one_stage = rec(
        similarity.cosine_topk(
            emb.select("vec_id", F.slice("embedding", 1, 16).alias("embedding")),
            qids,
            k=k,
        )
    )
    assert r_c10 <= r_c50 <= r_c200
    assert r_c50 >= one_stage  # rescore can only recover, never lose
    assert r_c200 >= 0.85
    exact_rows = sorted(
        map(tuple, similarity.cosine_topk(emb, qids, k=k).collect())
    )
    full_c = sorted(
        map(
            tuple,
            similarity.truncated_rescore_topk(
                emb, qids, k=k, n_candidates=600
            ).collect(),
        )
    )
    assert full_c == exact_rows  # C = n degenerates to exact search
    emb.unpersist()


def test_raw_lsh_planes_shared_derivation():
    """ann_topk's router and derived_lsh_planes share ONE derivation
    (_raw_lsh_planes); the clamp is exactly min(24, raw) — pinning the
    ADVICE r5 refactor so the two can't silently diverge."""
    for n in (1, 64, 1024, 10**6, 2**31, 10**12):
        raw = similarity._raw_lsh_planes(n)
        assert similarity.derived_lsh_planes(n) == min(24, raw)
    assert similarity._raw_lsh_planes(2**31) == 25  # unclamped past 24


def test_ppm_decode_p6_with_comments():
    """Real stdlib decoder: P6 header with # comments and multi-space
    separators, 2x2 raster parsed byte-exact."""
    raster = bytes(range(12))
    payload = b"P6\n# a comment\n2  2\n# another\n255\n" + raster
    w, h, maxval, px = multimodal.decode_image(payload)
    assert (w, h, maxval) == (2, 2, 255)
    assert px == raster


def test_ppm_decode_p3_ascii():
    payload = b"P3\n2 1\n255\n0 128 255  7 8 9\n"
    w, h, maxval, px = multimodal.decode_image(payload)
    assert (w, h, maxval) == (2, 1, 255)
    assert px == bytes([0, 128, 255, 7, 8, 9])


def test_ppm_decode_errors():
    with pytest.raises(ValueError):  # truncated raster
        multimodal.decode_image(b"P6\n4 4\n255\n\x00\x01")
    with pytest.raises(NotImplementedError):  # 16-bit samples
        multimodal.decode_image(b"P6\n1 1\n65535\n\x00\x00\x00\x00\x00\x00")
    with pytest.raises(NotImplementedError):  # JPEG magic
        multimodal.decode_image(b"\xff\xd8\xff\xe0")


def _make_bmp(width, height, rgb_topdown, topdown=False):
    """Hand-assemble an uncompressed 24-bit BMP (bottom-up unless
    topdown): BGR rows padded to 4 bytes."""
    import struct

    stride = (width * 3 + 3) & ~3
    rows = []
    order = range(height) if topdown else range(height - 1, -1, -1)
    for r in order:
        row = bytearray()
        for x in range(width):
            rr, g, b = rgb_topdown[(r * width + x) * 3 : (r * width + x) * 3 + 3]
            row += bytes([b, g, rr])
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    raster = b"".join(rows)
    h = height if not topdown else -height
    header = struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, h, 1, 24, 0, len(raster), 0, 0, 0, 0)
    return header + info + raster


def test_bmp_decode_both_orientations():
    """Uncompressed 24-bit BMP: bottom-up (positive height) and top-down
    (negative height) both decode to the same top-down RGB raster."""
    rgb = bytes(range(2 * 2 * 3))  # 2x2 image, distinct bytes
    for topdown in (False, True):
        payload = _make_bmp(2, 2, rgb, topdown=topdown)
        w, h, maxval, px = multimodal.decode_image(payload)
        assert (w, h, maxval) == (2, 2, 255)
        assert px == rgb
    with pytest.raises(NotImplementedError):  # 8-bit palette BMP
        import struct

        bad = bytearray(_make_bmp(2, 2, rgb))
        struct.pack_into("<H", bad, 28, 8)
        multimodal.decode_image(bytes(bad))


def test_png_decode_roundtrip_and_filters():
    """REAL stdlib PNG decode (zlib DEFLATE + scanline unfiltering):
    render_png round-trips byte-exact; every filter type (Sub/Up/Average/
    Paeth) written explicitly decodes to the same raster; gray, palette,
    and RGBA profiles convert to RGB; unsupported profiles raise
    NotImplementedError, corrupt structure raises ValueError."""
    import struct
    import zlib

    for doc_id in (0, 7, 99):
        w, h, maxval, px = multimodal.decode_image(multimodal.render_png(doc_id))
        assert (w, h, maxval) == (8 + doc_id % 9, 8 + (doc_id // 9) % 9, 255)
        assert px == bytes((doc_id * 31 + i) % 256 for i in range(w * h * 3))

    def make_png(w, h, raw, ctype=2, depth=8, extra=b""):
        def chunk(t, d):
            return (struct.pack(">I", len(d)) + t + d
                    + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))
        ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + extra
                + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))

    # each filter type on a 3x3 RGB image must reconstruct the same raster
    px = bytes(range(27))
    rows = [px[r * 9 : (r + 1) * 9] for r in range(3)]
    want = b"".join(rows)

    def sub_f(line):  # forward Sub filter
        out = bytearray(line)
        for i in range(len(line) - 1, 2, -1):
            out[i] = (line[i] - line[i - 3]) & 0xFF
        return bytes(out)

    def up_f(line, prev):
        return bytes((line[i] - prev[i]) & 0xFF for i in range(len(line)))

    def avg_f(line, prev):
        out = bytearray()
        for i in range(len(line)):
            a = line[i - 3] if i >= 3 else 0
            out.append((line[i] - (a + prev[i]) // 2) & 0xFF)
        return bytes(out)

    def paeth_f(line, prev):
        out = bytearray()
        for i in range(len(line)):
            a = line[i - 3] if i >= 3 else 0
            c = prev[i - 3] if i >= 3 else 0
            out.append((line[i] - multimodal._png_paeth(a, prev[i], c)) & 0xFF)
        return bytes(out)

    raw = (b"\x00" + rows[0]
           + b"\x01" + sub_f(rows[1])
           + b"\x02" + up_f(rows[2], rows[1]))
    assert multimodal.decode_image(make_png(3, 3, raw))[3] == want
    raw = (b"\x03" + avg_f(rows[0], bytes(9))
           + b"\x04" + paeth_f(rows[1], rows[0])
           + b"\x00" + rows[2])
    assert multimodal.decode_image(make_png(3, 3, raw))[3] == want

    # gray -> RGB replication
    raw = b"\x00" + bytes([10, 200])
    assert multimodal.decode_image(make_png(2, 1, raw, ctype=0))[3] == bytes(
        [10, 10, 10, 200, 200, 200])
    # RGBA -> alpha dropped
    raw = b"\x00" + bytes([1, 2, 3, 255, 4, 5, 6, 0])
    assert multimodal.decode_image(make_png(2, 1, raw, ctype=6))[3] == bytes(
        [1, 2, 3, 4, 5, 6])
    # palette
    import struct as _s, zlib as _z
    plte = (_s.pack(">I", 6) + b"PLTE" + bytes([9, 8, 7, 1, 2, 3])
            + _s.pack(">I", _z.crc32(b"PLTE" + bytes([9, 8, 7, 1, 2, 3])) & 0xFFFFFFFF))
    raw = b"\x00" + bytes([1, 0])
    assert multimodal.decode_image(
        make_png(2, 1, raw, ctype=3, extra=plte))[3] == bytes([1, 2, 3, 9, 8, 7])

    with pytest.raises(NotImplementedError):  # 16-bit
        multimodal.decode_image(make_png(1, 1, b"\x00" + bytes(6), depth=16))
    with pytest.raises(ValueError):  # truncated IDAT stream
        multimodal.decode_image(make_png(3, 3, b"\x00" + bytes(5)))
    with pytest.raises(NotImplementedError):  # JPEG still honest
        multimodal.decode_image(b"\xff\xd8\xff\xe0")


def test_png_flows_through_extract_features(spark):
    """PNG payloads take the REAL decode path end-to-end in the Spark
    kernel: decoded=true with the closed-form dimensions/mean, and a
    corrupt full-magic PNG quarantines (NULL features) instead of faking."""
    rows = [
        (5, multimodal.render_png(5)),
        (6, b"\x89PNG\r\n\x1a\n corrupt body not chunks"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in multimodal.extract_features(df).collect()}
    w, h = 8 + 5 % 9, 8 + (5 // 9) % 9
    assert out[5]["decoded"] is True and (out[5]["width"], out[5]["height"]) == (w, h)
    expect_mean = sum((5 * 31 + i) % 256 for i in range(w * h * 3)) / (w * h * 3) / 255
    assert abs(out[5]["feat_mean"] - expect_mean) < 1e-12
    assert out[6]["decoded"] is False and out[6]["width"] is None


def test_tiff_decode_roundtrip_and_variants():
    """REAL stdlib TIFF decode (IFD parse + strip assembly): render_tiff
    round-trips byte-exact on BOTH byte orders (parity-alternated) with
    the documented container size law; hand-built gray BlackIsZero /
    WhiteIsZero and inline single-strip layouts decode per spec;
    compressed/tiled/planar/16-bit raise NotImplementedError and
    structural corruption raises ValueError."""
    import struct

    for doc_id in (0, 1, 8, 9, 99, 100):  # even=II little, odd=MM big
        b = multimodal.render_tiff(doc_id)
        assert b[:2] == (b"II" if doc_id % 2 == 0 else b"MM")
        w, h, maxval, px = multimodal.decode_image(b)
        assert (w, h, maxval) == (8 + doc_id % 9, 8 + (doc_id // 9) % 9, 255)
        assert px == bytes((doc_id * 31 + i) % 256 for i in range(w * h * 3))
        assert len(b) == 140 + 8 * ((h + 3) // 4) + w * h * 3

    # single-strip writer path (dims override; unreachable from the h≥8
    # closed form): count-1 LONG strip arrays must be written INLINE in
    # the entry value field per spec — a pointer there would be decoded
    # AS the strip offset (r7 ADVICE latent bug). Both byte orders.
    for doc_id in (4, 7):
        b = multimodal.render_tiff(doc_id, dims=(5, 3))
        w, h, maxval, px = multimodal.decode_image(b)
        assert (w, h, maxval) == (5, 3, 255)
        assert px == bytes((doc_id * 31 + i) % 256 for i in range(45))
        assert len(b) == 140 + 45  # no external offset/count arrays

    def make_tiff(w, h, raster, photometric=1, compression=1, spp=1,
                  extra_entries=(), bits=8):
        # minimal II TIFF: single strip, inline count-1 values (the
        # inline path render_tiff never takes because its h≥8 forces
        # multi-strip offset arrays)
        entries = [
            (256, 4, 1, w), (257, 4, 1, h), (258, 3, 1, bits),
            (259, 3, 1, compression), (262, 3, 1, photometric),
            (277, 3, 1, spp), (278, 4, 1, h),
        ] + list(extra_entries)
        n = len(entries) + 2  # + StripOffsets, StripByteCounts
        data_off = 8 + 2 + 12 * n + 4
        entries += [(273, 4, 1, data_off), (279, 4, 1, len(raster))]
        entries.sort()
        ifd = struct.pack("<H", n) + b"".join(
            struct.pack("<HHI", t, ty, c) + struct.pack("<I", v)
            for t, ty, c, v in entries
        ) + struct.pack("<I", 0)
        return b"II*\x00" + struct.pack("<I", 8) + ifd + raster

    # gray BlackIsZero: replicated to RGB as-is
    got = multimodal.decode_image(make_tiff(2, 1, bytes([10, 200])))
    assert got == (2, 1, 255, bytes([10, 10, 10, 200, 200, 200]))
    # gray WhiteIsZero: inverted per spec
    got = multimodal.decode_image(make_tiff(2, 1, bytes([10, 200]), photometric=0))
    assert got == (2, 1, 255, bytes([245, 245, 245, 55, 55, 55]))
    # honest boundaries
    with pytest.raises(NotImplementedError):  # LZW
        multimodal.decode_image(make_tiff(2, 1, bytes(2), compression=5))
    with pytest.raises(NotImplementedError):  # tiled layout
        multimodal.decode_image(
            make_tiff(2, 1, bytes(2), extra_entries=[(322, 4, 1, 16)]))
    with pytest.raises(NotImplementedError):  # planar config 2
        multimodal.decode_image(
            make_tiff(2, 1, bytes(2), extra_entries=[(284, 3, 1, 2)]))
    with pytest.raises(NotImplementedError):  # 16-bit samples
        multimodal.decode_image(make_tiff(1, 1, bytes(2), bits=16))
    with pytest.raises(ValueError):  # strip truncated
        multimodal.decode_image(multimodal.render_tiff(4)[:-10])
    with pytest.raises(ValueError):  # IFD offset out of range
        multimodal.decode_image(b"II*\x00" + struct.pack("<I", 9999))
    with pytest.raises(ValueError):  # count-0 entry for a required tag:
        # must be ValueError (quarantineable), never IndexError (which
        # would escape extract_features' except net and kill the task)
        ifd0 = (struct.pack("<H", 1)
                + struct.pack("<HHI", 256, 3, 0) + b"\x00\x00\x00\x00"
                + struct.pack("<I", 0))
        multimodal.decode_image(b"II*\x00" + struct.pack("<I", 8) + ifd0)
    with pytest.raises(NotImplementedError):  # BigTIFF (version 43) magic
        multimodal.decode_image(b"II+\x00" + bytes(12))


def test_tiff_flows_through_extract_features(spark):
    """TIFF payloads take the REAL decode path end-to-end in the Spark
    kernel: decoded=true with closed-form dimensions/mean and the exact
    container byte count; a corrupt full-magic TIFF quarantines."""
    rows = [
        (5, multimodal.render_tiff(5)),
        (12, multimodal.render_tiff(12)),
        (6, b"II*\x00 corrupt body, no real IFD here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in multimodal.extract_features(df).collect()}
    for did in (5, 12):
        w, h = 8 + did % 9, 8 + (did // 9) % 9
        assert out[did]["decoded"] is True
        assert (out[did]["width"], out[did]["height"]) == (w, h)
        assert out[did]["n_bytes"] == 140 + 8 * ((h + 3) // 4) + w * h * 3
        mean = sum((did * 31 + i) % 256 for i in range(w * h * 3)) / (w * h * 3) / 255
        assert abs(out[did]["feat_mean"] - mean) < 1e-12
    assert out[6]["decoded"] is False and out[6]["width"] is None


def test_compressed_text_blob_roundtrip(spark):
    """Real stdlib decompression across all four codecs: per-doc
    round-robin compression round-trips with the right codec tag and
    stats; corrupt streams quarantine; raw bytes pass through."""
    texts = {i: f"doc {i} body with tokens {'x ' * i}".strip() for i in range(4)}
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: r
        for r in multimodal.extract_text_blob_features(
            multimodal.attach_compressed_payload(df)
        ).collect()
    }
    for i, codec in enumerate(["gzip", "zlib", "bz2", "xz"]):
        assert out[i]["codec"] == codec and out[i]["decoded"] is True
        assert out[i]["n_chars"] == len(texts[i])
        assert out[i]["n_tokens"] == len(texts[i].split())
        assert out[i]["n_comp_bytes"] > 0
    # corrupt gzip quarantines; raw utf-8 passes through
    df2 = spark.createDataFrame(
        [(10, bytearray(b"\x1f\x8b garbage")), (11, bytearray(b"plain text"))],
        "doc_id long, payload binary",
    )
    out2 = {
        r["doc_id"]: r
        for r in multimodal.extract_text_blob_features(df2).collect()
    }
    assert out2[10]["decoded"] is False and out2[10]["n_chars"] is None
    assert out2[11]["codec"] == "raw" and out2[11]["n_tokens"] == 2
    import pytest as _pt

    with _pt.raises(ValueError):
        multimodal.decode_text_blob(b"BZh garbage not bzip2")


def test_wav_render_decode_roundtrip(spark):
    """render_wav writes a true RIFF/WAVE container (stdlib wave writer)
    and decode_audio recovers the exact closed-form samples; the Spark
    feature path reproduces RMS/peak; compressed-audio magic raises."""
    import math

    for doc_id in (0, 99):
        b = multimodal.render_wav(doc_id)
        nch, rate, nframes, samples = multimodal.decode_audio(b)
        n = 256 + doc_id % 128
        expect = [((doc_id * 17 + i * 13) % 2001) - 1000 for i in range(n)]
        assert (nch, rate, nframes) == (1, 8000, n)
        assert samples == expect
    df = spark.createDataFrame([(99,)], "doc_id long")
    feats = multimodal.extract_audio_features(
        multimodal.attach_wav_payload(df)
    ).collect()[0]
    n = 256 + 99 % 128
    expect = [((99 * 17 + i * 13) % 2001) - 1000 for i in range(n)]
    assert feats["n_frames"] == n
    assert feats["peak"] == max(abs(s) for s in expect)
    assert abs(feats["rms"] - math.sqrt(sum(s * s for s in expect) / n)) < 1e-9
    with pytest.raises(NotImplementedError):
        multimodal.decode_audio(b"ID3\x04\x00")  # mp3


def test_decoders_fail_cleanly_on_hostile_bytes():
    """Fuzz contract for every real decoder: arbitrary bytes — including
    bytes that START like a valid magic — either decode or raise
    ValueError/NotImplementedError. Never IndexError, struct.error,
    wave.Error, or a hang: a 100 TB ingest WILL contain corrupt blobs,
    and a kernel that dies with an internal exception type poisons the
    whole task instead of being quarantineable."""
    import random

    rng = random.Random(99)
    magics = [b"", b"P6", b"P3", b"BM", b"RIFF", b"YUV4MPEG2", b"RIFFxxxxWAVE",
              b"\x89PNG\r\n\x1a\n", b"\x89PNG", b"GIF87a", b"GIF89a", b"GIF"]
    decoders = [
        multimodal.decode_image,
        multimodal.decode_audio,
        multimodal.decode_video,
    ]
    for _ in range(300):
        payload = rng.choice(magics) + bytes(
            rng.randrange(256) for _ in range(rng.randrange(0, 120))
        )
        for dec in decoders:
            try:
                dec(payload)
            except (ValueError, NotImplementedError):
                pass  # the only allowed failure modes
    # valid prefixes with truncated bodies, specifically
    for cut in (10, 30, 50):
        for whole, dec in (
            (multimodal.render_ppm(3), multimodal.decode_image),
            (multimodal.render_png(3), multimodal.decode_image),
            (multimodal.render_gif(3), multimodal.decode_image),
            (multimodal.render_wav(3), multimodal.decode_audio),
            (multimodal.render_y4m(3), multimodal.decode_video),
        ):
            try:
                dec(whole[: len(whole) - cut])
            except (ValueError, NotImplementedError):
                pass


def test_gif_decoder_survives_random_mutations():
    """Bit-flip fuzz on VALID GIFs: short random payloads die at the
    header guards, so mutate real containers to reach the deep paths
    (LZW code stream, palette indices, sub-block lengths). Contract:
    decode correctly or raise ValueError/NotImplementedError — never an
    internal exception type."""
    import random

    rng = random.Random(4242)
    base = [bytearray(multimodal.render_gif(d)) for d in (1, 9, 40)]
    for _ in range(400):
        g = bytearray(rng.choice(base))
        for _ in range(rng.randrange(1, 4)):
            g[rng.randrange(len(g))] ^= 1 << rng.randrange(8)
        try:
            multimodal._decode_gif(bytes(g))
        except (ValueError, NotImplementedError):
            pass


def test_y4m_render_decode_roundtrip(spark):
    """render_y4m → decode_video recovers width/height and the exact
    closed-form luma planes; 420/444 chroma sizing parses; compressed
    containers and truncated frames raise."""
    for doc_id in (0, 7):
        b = multimodal.render_y4m(doc_id)
        w, h, frames = multimodal.decode_video(b)
        assert (w, h) == (8, 8) and len(frames) == 4 + doc_id % 4
        for f, y in enumerate(frames):
            assert y == bytes((doc_id * 7 + f * 11 + i) % 256 for i in range(64))
    # 420: frame = Y + 2 quarter chroma planes; luma slice still leads
    y = bytes(range(16))  # 4x4
    chroma = b"\x07" * 8  # 2x(2x2)
    b420 = b"YUV4MPEG2 W4 H4 F25:1 C420jpeg\n" + b"FRAME\n" + y + chroma
    w, h, frames = multimodal.decode_video(b420)
    assert (w, h) == (4, 4) and frames == [y]
    b444 = b"YUV4MPEG2 W2 H2 C444\n" + b"FRAME\n" + bytes(range(12))
    assert multimodal.decode_video(b444)[2] == [bytes(range(4))]
    with pytest.raises(NotImplementedError):
        multimodal.decode_video(b"\x00\x00\x00\x20ftypmp42")  # mp4
    with pytest.raises(ValueError):
        multimodal.decode_video(b"YUV4MPEG2 W4 H4 Cmono\n" + b"FRAME\n" + b"\x01")
    # Spark path: sampled frames match the closed form
    df = spark.createDataFrame([(7,)], "doc_id long")
    rows = multimodal.sample_video_frames(
        multimodal.attach_y4m_payload(df), step=2
    ).collect()
    assert [r["frame_idx"] for r in rows] == [0, 2, 4, 6]
    for r in rows:
        expect = sum((7 * 7 + r["frame_idx"] * 11 + i) % 256 for i in range(64)) / 64
        assert abs(r["luma_mean"] - expect) < 1e-12


def test_resize_ppm_nearest_neighbor_exact():
    """NN resize must hit the exact (out·src)//out source pixels — down
    AND up — and re-encode a decodable P6."""
    src = multimodal.render_ppm(5)
    w, h, _, px = multimodal.decode_image(src)
    for ow, oh in ((4, 4), (2, 7), (2 * w, 2 * h)):
        out = multimodal.resize_ppm(src, ow, oh)
        rw, rh, maxval, rpx = multimodal.decode_image(out)
        assert (rw, rh, maxval) == (ow, oh, 255)
        expect = bytearray()
        for y in range(oh):
            sy = (y * h) // oh
            for x in range(ow):
                sx = (x * w) // ow
                expect += px[(sy * w + sx) * 3 : (sy * w + sx) * 3 + 3]
        assert rpx == bytes(expect), (ow, oh)
    import pytest as _pt

    with _pt.raises(ValueError):
        multimodal.resize_ppm(src, 0, 4)


def test_ppm_render_decode_roundtrip_and_features(spark):
    """render_ppm → decode_image round-trips header and raster, and the
    Spark extract_features path returns the REAL decoded dimensions/mean
    (not the fake-hash stand-in)."""
    for doc_id in (0, 7, 123):
        b = multimodal.render_ppm(doc_id)
        w, h, maxval, px = multimodal.decode_image(b)
        assert (w, h) == (8 + doc_id % 9, 8 + (doc_id // 9) % 9)
        assert px == bytes((doc_id * 31 + i) % 256 for i in range(w * h * 3))
    df = spark.createDataFrame([(0,), (123,)], "doc_id long")
    feats = {
        r["doc_id"]: r
        for r in multimodal.extract_features(
            multimodal.attach_ppm_payload(df)
        ).collect()
    }
    for doc_id in (0, 123):
        w, h = 8 + doc_id % 9, 8 + (doc_id // 9) % 9
        n = w * h * 3
        assert feats[doc_id]["width"] == w and feats[doc_id]["height"] == h
        expect_mean = sum((doc_id * 31 + i) % 256 for i in range(n)) / n / 255.0
        assert abs(feats[doc_id]["feat_mean"] - expect_mean) < 1e-12


def test_embedding_near_dup_finds_planted_pair(spark):
    rng = __import__("numpy").random.default_rng(9)
    import numpy as np

    vecs = rng.normal(size=(30, 8)).astype(np.float32)
    vecs[21] = vecs[3] + rng.normal(scale=0.01, size=8).astype(np.float32)  # near-dup
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    pairs = {
        (r["d1"], r["d2"]): r["cos"]
        for r in similarity.embedding_near_dup_pairs(df, threshold=0.95, dims=8).collect()
    }
    assert (3, 21) in pairs and pairs[(3, 21)] > 0.99


def test_ivf_topk_subset_of_assigned_list(spark):
    import numpy as np

    rng = np.random.default_rng(10)
    vecs = rng.normal(size=(40, 8)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    assigned = {
        r["vec_id"]: r["centroid_id"]
        for r in similarity.ivf_assign(df, dims=8).collect()
    }
    out = similarity.ivf_topk(df, [2], k=4, dims=8).collect()
    for r in out:
        assert assigned[r["vec_id"]] == assigned[2]  # same inverted list
        assert r["vec_id"] != 2


def test_derived_similarity_constants():
    """r2-verdict #7: LSH plane count / IVF centroid count derive from
    corpus size when not pinned (fixture constants remain the explicit
    override for deterministic oracles)."""
    from semantic_cpp_spark.pipeline import similarity as sim

    assert sim.derived_lsh_planes(10) == 1         # tiny corpus: one bucket
    assert sim.derived_lsh_planes(64 * 16) == 4    # fixture scale ≈ pinned 4
    assert sim.derived_lsh_planes(1_000_000) == 14
    assert sim.derived_lsh_planes(10**12) == 24    # clamp
    assert sim.derived_ivf_k(1) == 1
    assert sim.derived_ivf_k(64) == 8              # fixture scale ≈ pinned 8
    assert sim.derived_ivf_k(1_000_000) == 1000    # √n
    assert sim.derived_ivf_k(10**12) == 65536      # clamp


def test_lsh_derived_planes_end_to_end(spark):
    """planes=None derives from the corpus and still returns well-formed
    top-k (recall may differ from the pinned-constant run by design)."""
    import numpy as np

    from semantic_cpp_spark.pipeline import similarity as sim

    rng = np.random.RandomState(7)
    rows = [(i, [float(x) for x in rng.randn(16)]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = sim.lsh_bucket_topk(df, [5], k=4, dims=16).collect()
    assert all(r["q_id"] == 5 and r["vec_id"] != 5 for r in out)
    ivf = sim.ivf_topk(df, [2], k=4, dims=16).collect()
    assert all(r["q_id"] == 2 for r in ivf)


def test_gif_lzw_roundtrip_and_wild_file():
    """The GIF LZW pair must round-trip across every code-width boundary
    (9→12 bits) and the 4096-entry reset, and the decoder must read a
    REAL-WORLD artifact: the canonical 43-byte 1×1 GIF (which omits the
    End code and relies on the block terminator)."""
    import base64
    import random

    rng = random.Random(7)
    for n in (0, 1, 5, 300, 5000, 40000):
        data = bytes(rng.randrange(256) for _ in range(n))
        assert multimodal._gif_lzw_decode(multimodal._gif_lzw_encode(data)) == data
    for pat in (b"a" * 30000, b"ab" * 20000, bytes(range(256)) * 200):
        assert multimodal._gif_lzw_decode(multimodal._gif_lzw_encode(pat)) == pat
    small = bytes(rng.randrange(4) for _ in range(10000))
    assert multimodal._gif_lzw_decode(multimodal._gif_lzw_encode(small, 2), 2) == small
    wild = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
    )
    w, h, mv, rgb = multimodal._decode_gif(wild)
    assert (w, h, rgb) == (1, 1, b"\x00\x00\x00")


def test_gif_decode_closed_form_and_corrupt():
    for did in (0, 5, 81, 123456):
        w, h, mv, rgb = multimodal.decode_image(multimodal.render_gif(did))
        ew, eh = 8 + did % 9, 8 + (did // 9) % 9
        assert (w, h, mv) == (ew, eh, 255)
        exp = bytes(
            v for i in range(ew * eh) for v in ((did * 31 + i) % 256,) * 3
        )
        assert rgb == exp
    import pytest as _pt

    with _pt.raises(ValueError):  # signature only, no blocks
        multimodal._decode_gif(b"GIF89a")
    with _pt.raises(ValueError):  # truncated mid-structure
        multimodal._decode_gif(multimodal.render_gif(3)[:40])
    # interlaced flag → honest NotImplementedError
    g = bytearray(multimodal.render_gif(2))
    idesc = 6 + 7 + 768  # header + LSD + 256-entry GCT (0x2C also occurs
    assert g[idesc] == 0x2C  # as a gray palette byte — fixed offset, not index())
    g[idesc + 9] |= 0x40
    with _pt.raises(NotImplementedError):
        multimodal._decode_gif(bytes(g))


def test_gif_flows_through_extract_features(spark):
    rows = [
        (5, multimodal.render_gif(5)),
        (6, b"GIF89a corrupt body with no blocks at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in multimodal.extract_features(df).collect()}
    w, h = 8 + 5 % 9, 8 + (5 // 9) % 9
    assert out[5]["decoded"] is True and (out[5]["width"], out[5]["height"]) == (w, h)
    expect_mean = sum((5 * 31 + i) % 256 for i in range(w * h)) / (w * h) / 255
    assert abs(out[5]["feat_mean"] - expect_mean) < 1e-12
    assert out[6]["decoded"] is False and out[6]["width"] is None


def test_gif_local_color_table_and_87a():
    """Decoder paths not exercised by render_gif: a GIF87a container
    whose image block carries a LOCAL color table (no global one), plus
    a skipped extension block before the image descriptor."""
    import struct

    w, h = 3, 2
    idx = bytes([0, 1, 1, 0, 1, 0])
    lct = bytes([10, 20, 30, 200, 210, 220]) * 1  # 2 entries (size bits 0)
    lzw = multimodal._gif_lzw_encode(idx, 2)
    blocks = bytes([len(lzw)]) + lzw + b"\x00"
    gif = (
        b"GIF87a"
        + struct.pack("<HHBBB", w, h, 0x00, 0, 0)  # no global table
        + b"\x21\xfe" + bytes([3]) + b"abc" + b"\x00"  # comment extension
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x80)  # LCT flag, 2 colors
        + lct
        + bytes([2])
        + blocks
        + b"\x3b"
    )
    dw, dh, mv, rgb = multimodal._decode_gif(gif)
    assert (dw, dh, mv) == (w, h, 255)
    c0, c1 = lct[0:3], lct[3:6]
    assert rgb == b"".join(c1 if i else c0 for i in idx)


def test_png_truncated_stream_rejected_even_at_exact_length():
    """A zlib stream truncated after its last deflate block can yield
    exactly the expected byte count without reaching the stream end —
    the d.eof requirement is what rejects it (self-review r6 round 2)."""
    import struct as _s
    import zlib as _z

    w, h = 11, 8
    px = bytes((3 * 31 + i) % 256 for i in range(w * h * 3))
    raw = b"".join(b"\x00" + px[r * w * 3:(r + 1) * w * 3] for r in range(h))

    def chunk(ctype, data):
        return (_s.pack(">I", len(data)) + ctype + data
                + _s.pack(">I", _z.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = _s.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    png = (multimodal._PNG_MAGIC + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", _z.compress(raw)[:-4]) + chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        multimodal._decode_png(png)


def test_gif_dimension_bomb_rejected():
    """Attacker-declared huge dimensions must be rejected BEFORE any
    buffer is sized from them (the LZW cap derives from w*h)."""
    import struct as _s

    g = bytearray(multimodal.render_gif(1))
    idesc = 6 + 7 + 768
    assert g[idesc] == 0x2C
    _s.pack_into("<HH", g, idesc + 5, 65535, 65535)  # w, h
    with pytest.raises(ValueError):
        multimodal._decode_gif(bytes(g))


def test_gif_lzw_hypothesis_roundtrip():
    """Property: ANY byte stream round-trips through the GIF LZW pair at
    any legal min code size whose alphabet covers the stream. Exercises
    KwKwK, width growth, and reset boundaries far beyond the fixed
    vectors."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=150, deadline=None)
    @given(
        st.binary(min_size=0, max_size=4000),
        st.sampled_from([8]),
    )
    def roundtrip_full_alphabet(data, mcs):
        assert multimodal._gif_lzw_decode(
            multimodal._gif_lzw_encode(data, mcs), mcs
        ) == data

    @settings(max_examples=100, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=3), max_size=4000),
        st.sampled_from([2, 4]),
    )
    def roundtrip_small_alphabet(vals, mcs):
        data = bytes(vals)
        assert multimodal._gif_lzw_decode(
            multimodal._gif_lzw_encode(data, mcs), mcs
        ) == data

    roundtrip_full_alphabet()
    roundtrip_small_alphabet()


def test_pnm_gray_family_decode():
    """P5/P2/P4/P1 all decode to gray-replicated RGB with the netpbm
    1=black convention and P4 byte-padded rows."""
    from semantic_cpp_spark.pipeline.multimodal import decode_image

    # P5 binary gray 2x2
    w, h, mv, px = decode_image(b"P5\n2 2\n255\n" + bytes([0, 128, 255, 7]))
    assert (w, h, mv) == (2, 2, 255)
    assert px == bytes([0, 0, 0, 128, 128, 128, 255, 255, 255, 7, 7, 7])
    # P2 ASCII gray with a comment
    w, h, mv, px = decode_image(b"P2\n# c\n2 1\n255\n0 200\n")
    assert (w, h, px) == (2, 1, bytes([0, 0, 0, 200, 200, 200]))
    # P4 packed bitmap 3x2: rows padded to one byte; 1=black
    #   row0: bits 101 -> 0b10100000 ; row1: bits 010 -> 0b01000000
    w, h, mv, px = decode_image(b"P4\n3 2\n" + bytes([0b10100000, 0b01000000]))
    assert (w, h, mv) == (3, 2, 255)
    grays = px[::3]
    assert grays == bytes([0, 255, 0, 255, 0, 255])
    # P1 ASCII bitmap, whitespace-separated and packed digits both legal
    w, h, mv, px = decode_image(b"P1\n3 1\n1 01")
    assert px[::3] == bytes([0, 255, 0])
    # P1 with a comment INSIDE the raster containing digit bytes: those
    # digits are comment text, not pixels (ADVICE r6 #5 — a plain digit
    # filter would shift every pixel after the comment)
    w, h, mv, px = decode_image(b"P1\n2 2\n1 0\n# 111 not pixels\n0 1\n")
    assert (w, h) == (2, 2)
    assert px[::3] == bytes([0, 255, 255, 0])


def test_pnm_gray_truncation_raises():
    import pytest as _pytest

    from semantic_cpp_spark.pipeline.multimodal import decode_image

    with _pytest.raises(ValueError):
        decode_image(b"P5\n4 4\n255\n" + b"\x00" * 15)
    with _pytest.raises(ValueError):
        decode_image(b"P4\n9 2\n" + b"\x00" * 3)  # needs 2 row-bytes x 2
    with _pytest.raises(ValueError):
        decode_image(b"P1\n2 2\n101")
    with _pytest.raises(NotImplementedError):
        decode_image(b"P5\n2 2\n65535\n" + b"\x00" * 8)


def test_pgm_render_decode_roundtrip():
    from semantic_cpp_spark.pipeline.multimodal import decode_image, render_pgm

    for doc_id in (0, 5, 77):
        w, h, mv, px = decode_image(render_pgm(doc_id))
        assert (w, h) == (8 + doc_id % 9, 8 + (doc_id // 9) % 9)
        expect = [(doc_id * 37 + i * 7) % 256 for i in range(w * h)]
        assert list(px[::3]) == expect and px[1::3] == px[::3]


def test_image_histograms_hand_computed(spark):
    """2x1 P6 image with pixels (0,0,0) and (255,255,255): luma 0 -> bin
    0 and luma 255 -> bin 3; an undecodable payload contributes NO rows."""
    from semantic_cpp_spark.pipeline.multimodal import image_histograms

    ppm = b"P6\n2 1\n255\n" + bytes([0, 0, 0, 255, 255, 255])
    df = spark.createDataFrame(
        [(1, bytearray(ppm)), (2, bytearray(b"\xff\xd8JPEGish"))],
        "doc_id long, payload binary",
    )
    rows = {(r.doc_id, r.bin): r.n_px for r in image_histograms(df, 4).collect()}
    assert rows == {(1, 0): 1, (1, 3): 1}


def test_image_histograms_rejects_bad_bins(spark):
    import pytest as _pytest

    from semantic_cpp_spark.pipeline.multimodal import image_histograms

    df = spark.createDataFrame([(1, bytearray(b"P6"))], "doc_id long, payload binary")
    with _pytest.raises(ValueError):
        image_histograms(df, n_bins=7)


def test_tiff_decoder_survives_random_mutations():
    """Bit-flip fuzz on VALID TIFFs (both byte orders): mutations reach
    the deep paths — IFD entry types/counts/offsets, strip offset and
    byte-count arrays, the raster itself. Contract: decode correctly or
    raise ValueError/NotImplementedError — never IndexError/struct.error,
    which would escape extract_features' quarantine net and kill the
    task (the count-0 case in test_tiff_decode_roundtrip_and_variants
    was exactly such an escape)."""
    import random

    rng = random.Random(2424)
    base = [bytearray(multimodal.render_tiff(d)) for d in (2, 7, 41)]
    for _ in range(400):
        g = bytearray(rng.choice(base))
        for _ in range(rng.randrange(1, 4)):
            g[rng.randrange(len(g))] ^= 1 << rng.randrange(8)
        try:
            multimodal._decode_tiff(bytes(g))
        except (ValueError, NotImplementedError):
            pass


# -- perceptual average-hash (aHash) ----------------------------------------

def _p6(w, h, px_bytes):
    return b"P6\n%d %d\n255\n" % (w, h) + bytes(px_bytes)


def _gray(w, h, v):
    return _p6(w, h, [v] * (w * h * 3))


def test_ahash_flat_image_is_zero(spark):
    # every block mean equals the global mean — strict > sets no bit
    df = spark.createDataFrame(
        [(1, bytearray(_gray(16, 16, 128)))], "doc_id long, payload binary"
    )
    row = multimodal.image_ahash(df).collect()[0]
    assert (row["h1"], row["h2"]) == (0, 0)


def test_ahash_half_split_known_bits(spark):
    # left half black, right half white on 16x16: every row of blocks is
    # 0b11110000 -> both halves pack to 0xF0F0F0F0
    px = []
    for y in range(16):
        for x in range(16):
            px += [0, 0, 0] if x < 8 else [255, 255, 255]
    df = spark.createDataFrame(
        [(1, bytearray(_p6(16, 16, px)))], "doc_id long, payload binary"
    )
    row = multimodal.image_ahash(df).collect()[0]
    assert row["h1"] == 0xF0F0F0F0
    assert row["h2"] == 0xF0F0F0F0


def test_ahash_pairs_finds_near_dup_and_matches_brute_force(spark):
    # 20 fixture rasters + one single-pixel-perturbed copy of raster 3:
    # the pair search must equal the brute-force hamming<=3 pair set
    rows = [(i, bytearray(multimodal.render_ppm(i))) for i in range(20)]
    perturbed = bytearray(multimodal.render_ppm(3))
    perturbed[-1] = (perturbed[-1] + 4) % 256  # nudge one channel
    rows.append((100, perturbed))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    hashes = multimodal.image_ahash(df)
    hs = {r["doc_id"]: (r["h1"], r["h2"]) for r in hashes.collect()}
    assert len(hs) == 21
    brute = set()
    ids = sorted(hs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            d = bin(hs[a][0] ^ hs[b][0]).count("1") + bin(
                hs[a][1] ^ hs[b][1]
            ).count("1")
            if d <= 3:
                brute.add((a, b))
    got = {
        (r["d1"], r["d2"])
        for r in multimodal.ahash_pairs(hashes, max_dist=3).collect()
    }
    assert got == brute
    assert (3, 100) in got  # the planted near-duplicate survives


def test_ahash_quarantines_images_smaller_than_grid(spark):
    """ADVICE r8: an image with w or h < grid leaves some blocks empty
    (block-mean division by zero -> a silently distorted hash). Such
    images contribute NO row — quarantine-by-absence, like undecodable
    payloads — while images >= grid in both dims still hash."""
    df = spark.createDataFrame(
        [
            (1, bytearray(_gray(4, 16, 128))),   # w < grid
            (2, bytearray(_gray(16, 4, 128))),   # h < grid
            (3, bytearray(_gray(8, 8, 128))),    # exactly grid: OK
        ],
        "doc_id long, payload binary",
    )
    got = {r["doc_id"] for r in multimodal.image_ahash(df, grid=8).collect()}
    assert got == {3}


def test_ahash_arg_validation(spark):
    df = spark.createDataFrame(
        [(1, bytearray(_gray(8, 8, 0)))], "doc_id long, payload binary"
    )
    with pytest.raises(ValueError, match="grid"):
        multimodal.image_ahash(df, grid=9)
    with pytest.raises(ValueError, match="max_dist"):
        multimodal.ahash_pairs(multimodal.image_ahash(df), max_dist=4)


# -- acoustic fingerprint (energy-delta hash) --------------------------------

def _wav(samples):
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def test_audio_fp_silence_is_zero_and_decreasing_is_all_ones(spark):
    silence = _wav([0] * 330)
    # amplitude drops per frame -> strictly decreasing frame energies ->
    # every delta bit set
    dec = _wav([1000 - ((i * 33) // 330) * 30 for i in range(330)])
    df = spark.createDataFrame(
        [(1, bytearray(silence)), (2, bytearray(dec))],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r["fp"] for r in multimodal.audio_fingerprints(df).collect()}
    assert out[1] == 0
    assert out[2] == 0xFFFFFFFF


def test_audio_fp_short_clip_contributes_no_row(spark):
    df = spark.createDataFrame(
        [(1, bytearray(_wav([5] * 10)))], "doc_id long, payload binary"
    )
    assert multimodal.audio_fingerprints(df).count() == 0


def test_audio_fp_pairs_finds_near_dup_and_matches_brute_force(spark):
    rows = [(i, bytearray(multimodal.render_wav(i))) for i in range(20)]
    import struct
    import wave
    import io

    # perturbed copy of clip 7: nudge one sample
    raw = multimodal.render_wav(7)
    with wave.open(io.BytesIO(raw), "rb") as w:
        n = w.getnframes()
        samples = list(struct.unpack(f"<{n}h", w.readframes(n)))
    samples[-1] += 3
    rows.append((100, bytearray(_wav(samples))))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    fps = multimodal.audio_fingerprints(df)
    hs = {r["doc_id"]: r["fp"] for r in fps.collect()}
    assert len(hs) == 21
    brute = set()
    ids = sorted(hs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if bin(hs[a] ^ hs[b]).count("1") <= 3:
                brute.add((a, b))
    got = {
        (r["d1"], r["d2"])
        for r in multimodal.audio_fp_pairs(fps, max_dist=3).collect()
    }
    assert got == brute
    assert (7, 100) in got


def test_audio_fp_pairs_arg_validation(spark):
    df = spark.createDataFrame(
        [(1, bytearray(_wav([0] * 40)))], "doc_id long, payload binary"
    )
    with pytest.raises(ValueError, match="max_dist"):
        multimodal.audio_fp_pairs(multimodal.audio_fingerprints(df), max_dist=9)


# -- video motion profile ----------------------------------------------------

def _y4m(frames, w=8, h=8):
    out = bytearray(f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 Cmono\n".encode())
    for f in frames:
        out += b"FRAME\n" + bytes(f)
    return bytes(out)


def test_video_motion_known_delta_and_single_frame(spark):
    two = _y4m([[10] * 64, [25] * 64])  # constant +15 per pixel
    one = _y4m([[7] * 64])
    df = spark.createDataFrame(
        [(1, bytearray(two)), (2, bytearray(one)), (3, bytearray(b"mp4junk"))],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: r for r in multimodal.video_motion(df).collect()}
    assert set(out) == {1, 2}  # undecodable doc 3 quarantined by absence
    assert out[1]["n_frames"] == 2
    assert out[1]["sum_abs_delta"] == 64 * 15
    assert out[1]["motion_ppm"] == 15_000_000  # 15.0 per pixel-transition
    assert out[2]["n_frames"] == 1
    assert out[2]["sum_abs_delta"] == 0
    assert out[2]["motion_ppm"] is None  # no transition to measure


# -- product quantization ----------------------------------------------------

def _emb_frame(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_pq_codes_structure(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    df = _emb_frame(spark, rng.randn(40, 64))
    books = similarity.pq_books(df).collect()
    assert len(books) == similarity.PQ_M * similarity.PQ_K  # 64 rows
    assert all(len(b["cv"]) == similarity.PQ_SUB for b in books)
    codes = similarity.pq_encode(df).collect()
    assert len(codes) == 40 * similarity.PQ_M  # 4 codes per vector
    assert all(0 <= c["code"] < similarity.PQ_K for c in codes)


def test_pq_adc_exact_when_corpus_lies_on_codebook(spark):
    # zero quantization error regime: every vector IS one of the 16
    # codebook seeds, so ADC distance == exact distance and the PQ
    # top-k equals brute-force euclidean top-k
    import numpy as np

    rng = np.random.RandomState(3)
    seeds = rng.randn(16, 64)
    vecs = list(seeds) + [seeds[i % 16] * 1.0 for i in range(16, 40)]
    df = _emb_frame(spark, vecs)
    got = {
        (r["q_id"], r["rk"]): r["vec_id"]
        for r in similarity.pq_adc_topk(df, [0, 1], k=3).collect()
    }
    # brute force in numpy over the SAME float32-rounded values
    v32 = np.asarray(vecs, dtype=np.float32).astype(np.float64)
    for qid in (0, 1):
        d = ((v32 - v32[qid]) ** 2).sum(axis=1)
        order = sorted(
            (i for i in range(40) if i != qid),
            key=lambda i: (round(d[i], 6), i),
        )
        for rk in (1, 2, 3):
            assert got[(qid, rk)] == order[rk - 1], (qid, rk)


def test_pq_recall_floors_and_rescore_monotonicity(spark):
    # the honest trade at 128x compression with UNTRAINED id-seeded
    # codebooks on the isotropic fixture (the designed worst case):
    # adc-only recall is weak; candidate-generation + exact rescore
    # repairs it monotonically in C (measured 0.13 -> 0.73 at sf0.001)
    from semantic_cpp_spark.session import load_table
    from semantic_cpp_spark.pipeline.clustering import _as_double, sq_dist
    from pyspark.sql import Window

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    qids = [0, 1, 2]
    e = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    q = e.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("q_id"), F.col("v").alias("qv")
    )
    w = Window.partitionBy("q_id").orderBy("d2", "vec_id")
    j = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select("q_id", "vec_id", sq_dist(F.col("v"), F.col("qv")).alias("d2"))
    )
    exact = {}
    for r in (
        j.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .collect()
    ):
        exact.setdefault(r["q_id"], set()).add(r["vec_id"])

    def recall(cand_df):
        got = {}
        for r in cand_df.collect():
            got.setdefault(r["q_id"], set()).add(r["vec_id"])
        return sum(len(got[qq] & exact[qq]) for qq in qids) / (5 * len(qids))

    def rescored(C):
        cand = similarity.pq_adc_topk(emb, qids, k=C).select("q_id", "vec_id")
        r = (
            cand.join(e, "vec_id")
            .join(q, "q_id")
            .select(
                "q_id", "vec_id", sq_dist(F.col("v"), F.col("qv")).alias("d2")
            )
        )
        return (
            r.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 5)
        )

    adc_only = recall(similarity.pq_adc_topk(emb, qids, k=5))
    r25, r100 = recall(rescored(25)), recall(rescored(100))
    assert adc_only >= 0.1
    assert r25 >= adc_only
    assert r100 >= r25
    assert r100 >= 0.6


def test_pq_trained_books_structure_and_hand_mean(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    vecs = rng.randn(24, 64)
    df = _emb_frame(spark, vecs)
    books = similarity.pq_books_trained(df)
    rows = books.collect()
    assert len(rows) == similarity.PQ_M * similarity.PQ_K  # fallback fills
    assert all(len(r["cv"]) == similarity.PQ_SUB for r in rows)
    # replicate one trained component by hand: subspace 0, the exact
    # integer-micro-unit mean over the assigned members
    v32 = np.asarray(vecs, dtype=np.float32).astype(np.float64)
    seeds = v32[:16, :16]
    sub = v32[:, :16]
    d2 = ((sub[:, None, :] - seeds[None, :, :]) ** 2).sum(axis=2)
    assign = d2.argmin(axis=1)  # numpy ties break low-id like the engine
    got = {r["c_id"]: r["cv"] for r in rows if r["m"] == 0}
    for c in set(assign):
        members = sub[assign == c]
        # round-half-away-from-zero, the Spark/DuckDB round() convention
        xi = np.sign(members) * np.floor(np.abs(members) * 1e6 + 0.5)
        s = xi.sum(axis=0).astype(np.int64)
        n = len(members)
        q = (s + 4_000_000 * n) // n - 4_000_000
        exp = q / 1e6
        assert np.allclose(got[int(c)], exp, atol=0), (c,)


def test_pq_trained_adc_runs_and_differs_from_seeded(spark):
    import numpy as np

    rng = np.random.RandomState(5)
    df = _emb_frame(spark, rng.randn(60, 64))
    seeded = similarity.pq_adc_topk(df, [0], k=3).collect()
    trained = similarity.pq_adc_topk(df, [0], k=3, trained=True).collect()
    assert len(seeded) == 3 and len(trained) == 3


def test_pq_index_save_load_round_trip(spark, tmp_path):
    import numpy as np

    rng = np.random.RandomState(9)
    df = _emb_frame(spark, rng.randn(40, 64))
    root = str(tmp_path / "pqidx")
    similarity.pq_index_save(df, root)
    books, codes, params = similarity.pq_index_load(spark, root)
    assert params == {"pq_m": 4, "pq_k": 16, "pq_sub": 16, "trained": False}
    # reloaded codes match a fresh encode against the reloaded books
    fresh = {
        (r["vec_id"], r["m"]): r["code"]
        for r in similarity.pq_encode(df, books=books).collect()
    }
    stored = {
        (r["vec_id"], r["m"]): r["code"] for r in codes.collect()
    }
    assert stored == fresh
    assert books.count() == 64


def test_pq_index_load_refuses_partial(spark, tmp_path):
    root = str(tmp_path / "broken")
    spark.createDataFrame(
        [(4, 16, 16, False), (4, 16, 16, False)],
        "pq_m int, pq_k int, pq_sub int, trained boolean",
    ).write.mode("overwrite").parquet(f"{root}/params")
    with pytest.raises(ValueError, match="exactly 1 row"):
        similarity.pq_index_load(spark, root)


def test_pq_probe_accepts_loaded_index(spark, tmp_path):
    """ADVICE r8: a pq_index_save'd index must be PROBABLE — passing the
    loaded (books, codes) to pq_adc_topk/pq_rescore_topk yields exactly
    the derive-from-corpus result, with neither re-derived."""
    import numpy as np

    rng = np.random.RandomState(21)
    df = _emb_frame(spark, rng.randn(40, 64))
    root = str(tmp_path / "probeidx")
    similarity.pq_index_save(df, root)
    books, codes, _ = similarity.pq_index_load(spark, root)
    fresh = similarity.pq_adc_topk(df, [0, 1], k=3).collect()
    loaded = similarity.pq_adc_topk(
        df, [0, 1], k=3, books=books, codes=codes
    ).collect()
    assert sorted(map(tuple, loaded)) == sorted(map(tuple, fresh))
    fresh_r = similarity.pq_rescore_topk(df, [0], k=3, n_candidates=10).collect()
    loaded_r = similarity.pq_rescore_topk(
        df, [0], k=3, n_candidates=10, books=books, codes=codes
    ).collect()
    assert sorted(map(tuple, loaded_r)) == sorted(map(tuple, fresh_r))
    with pytest.raises(ValueError, match="codes without their books"):
        similarity.pq_adc_topk(df, [0], codes=codes)


def test_pq_train_means_guards_positivity_shift(spark):
    """ADVICE r8: a component below -4.0 breaks the positivity shift
    (`div` truncates, `//` floors — they diverge on negatives). The
    guard raises at execution instead of silently diverging."""
    import numpy as np

    from pyspark.errors import SparkRuntimeException

    rng = np.random.RandomState(3)
    vecs = rng.randn(20, 64)
    vecs[7, 5] = -1500.0  # below the shift
    df = _emb_frame(spark, vecs)
    with pytest.raises(SparkRuntimeException, match="positivity shift"):
        similarity.pq_train_means(df).collect()


def test_pq_books_trained_multi_iteration(spark):
    """iters=2 chains two exactness-disciplined Lloyd steps: books stay
    full-size, and the second step's means differ from the first's
    (training actually moved the centroids on random data)."""
    import numpy as np

    rng = np.random.RandomState(13)
    # 120 vectors: enough members per cluster that the re-assignment
    # after step 1 actually changes (measured: ~15 flips) — 30 vectors
    # hit a Lloyd fixed point after one step. ×0.5 keeps every component
    # inside the positivity-shift precondition (randn tails cross −4);
    # uniform scaling doesn't change the assignment geometry.
    df = _emb_frame(spark, rng.randn(120, 64) * 0.5)
    b1 = similarity.pq_books_trained(df, iters=1)
    b2 = similarity.pq_books_trained(df, iters=2)
    assert b1.count() == similarity.PQ_M * similarity.PQ_K
    assert b2.count() == similarity.PQ_M * similarity.PQ_K
    m1 = {(r["m"], r["c_id"]): tuple(r["cv"]) for r in b1.collect()}
    m2 = {(r["m"], r["c_id"]): tuple(r["cv"]) for r in b2.collect()}
    assert m1 != m2
    with pytest.raises(ValueError, match="iters"):
        similarity.pq_books_trained(df, iters=0)


def test_pq_k256_books_and_encode(spark):
    """8-bit code budget (n_centroids=256): books seed from the 256
    smallest ids (clamped by corpus size here), codes stay in range."""
    import numpy as np

    rng = np.random.RandomState(31)
    df = _emb_frame(spark, rng.randn(300, 64))
    books = similarity.pq_books(df, n_centroids=256)
    assert books.count() == similarity.PQ_M * 256
    codes = similarity.pq_encode(df, books=books)
    assert codes.count() == 300 * similarity.PQ_M
    assert codes.agg(F.max("code")).collect()[0][0] < 256


# -- IVFADC ------------------------------------------------------------------

def test_ivfpq_all_lists_equals_full_scan(spark):
    """Probing EVERY list (nprobe = n_lists) makes IVFADC scan exactly
    the full code table — the result must equal pq_adc_topk row for
    row. Pins that routing loses nothing but list pruning."""
    import numpy as np

    rng = np.random.RandomState(17)
    df = _emb_frame(spark, rng.randn(60, 64))
    full = similarity.pq_adc_topk(df, [0, 1, 2], k=5).collect()
    ivf = similarity.ivfpq_topk(
        df, [0, 1, 2], k=5, nprobe=6, n_lists=6
    ).collect()
    assert sorted(map(tuple, ivf)) == sorted(map(tuple, full))


def test_ivfpq_recall_floor_and_nprobe_monotone(spark):
    """The IVF trade measured: recall@5 of ivfpq vs the full-scan ADC
    ranking is monotone in nprobe and reasonable at nprobe=2 on a
    CLUSTERED corpus (vectors near their list centroid — the regime
    IVF exists for)."""
    import numpy as np

    rng = np.random.RandomState(29)
    # 8 well-separated cluster centers, 10 members each
    centers = rng.randn(8, 64) * 10
    vecs = np.concatenate(
        [centers[i % 8] + rng.randn(64) * 0.5 for i in range(80)]
    ).reshape(80, 64)
    df = _emb_frame(spark, vecs)
    qids = [0, 1, 2, 3]
    truth = {
        (r["q_id"], r["vec_id"])
        for r in similarity.pq_adc_topk(df, qids, k=5).collect()
    }

    def recall(res):
        got = {(r["q_id"], r["vec_id"]) for r in res.collect()}
        return len(got & truth) / len(truth)

    r1 = recall(similarity.ivfpq_topk(df, qids, k=5, nprobe=1, n_lists=8))
    r2 = recall(similarity.ivfpq_topk(df, qids, k=5, nprobe=2, n_lists=8))
    r8 = recall(similarity.ivfpq_topk(df, qids, k=5, nprobe=8, n_lists=8))
    assert r1 <= r2 + 1e-9 and r2 <= r8 + 1e-9
    assert r8 == 1.0          # all lists = full scan
    assert r2 >= 0.5          # clustered regime: 2 probes find most


def test_ivfpq_index_save_load_and_probe(spark, tmp_path):
    import numpy as np

    rng = np.random.RandomState(23)
    df = _emb_frame(spark, rng.randn(50, 64))
    root = str(tmp_path / "ivfpq")
    similarity.ivfpq_index_save(df, root, n_lists=5)
    books, listed, params = similarity.ivfpq_index_load(spark, root)
    assert params["n_lists"] == 5
    assert set(listed.columns) == {"vec_id", "list_id", "m", "code"}
    fresh = similarity.ivfpq_topk(df, [0, 1], k=3, nprobe=2, n_lists=5).collect()
    loaded = similarity.ivfpq_topk(
        df, [0, 1], k=3, nprobe=2, n_lists=5,
        books=books, listed_codes=listed,
    ).collect()
    assert sorted(map(tuple, loaded)) == sorted(map(tuple, fresh))
    with pytest.raises(ValueError, match="listed_codes without their books"):
        similarity.ivfpq_topk(df, [0], listed_codes=listed, n_lists=5)


def test_ahash_pairs_compose_into_visual_dup_clusters(spark):
    """The full visual-dedup pipeline composes: decode -> aHash ->
    pigeonhole pair search -> connected components, exactly like the
    text MinHash funnel — three re-encodes of raster A and two of
    raster B resolve into two clusters keyed by their smallest ids."""
    from semantic_cpp_spark.pipeline import dedup as dedup_ops

    a, b = multimodal.render_ppm(3), multimodal.render_ppm(8)
    a2, b2 = bytearray(a), bytearray(b)
    a2[-1] = (a2[-1] + 2) % 256  # near-dup re-encode of A
    b2[-2] = (b2[-2] + 2) % 256
    rows = [
        (1, bytearray(a)), (2, a2), (3, bytearray(a)),
        (10, bytearray(b)), (11, b2),
        (99, bytearray(multimodal.render_ppm(40))),  # unrelated singleton
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    pairs = multimodal.ahash_pairs(multimodal.image_ahash(df), max_dist=3)
    comp = {
        r["doc_id"]: r["component"]
        for r in dedup_ops.connected_components(pairs).collect()
    }
    assert comp[1] == comp[2] == comp[3] == 1
    assert comp[10] == comp[11] == 10
    assert 99 not in comp  # singletons never enter the pair graph


def test_pq_rescore_topk_exact_at_full_candidate_budget(spark):
    # C = n degenerates to exact search: rescore over ALL candidates
    # must equal brute-force euclidean top-k
    import numpy as np

    rng = np.random.RandomState(21)
    vecs = rng.randn(50, 64)
    df = _emb_frame(spark, vecs)
    got = {
        (r["q_id"], r["rk"]): r["vec_id"]
        for r in similarity.pq_rescore_topk(
            df, [0, 1], k=3, n_candidates=49
        ).collect()
    }
    v = np.asarray(vecs, dtype=np.float32).astype(np.float64)
    for qid in (0, 1):
        d = ((v - v[qid]) ** 2).sum(axis=1)
        order = sorted(
            (i for i in range(50) if i != qid),
            key=lambda i: (round(d[i], 6), i),
        )
        for rk in (1, 2, 3):
            assert got[(qid, rk)] == order[rk - 1]


# -- residual IVFADC ----------------------------------------------------------

def test_ivfpq_residual_adc_beats_raw_codes_on_clustered_data(spark):
    """The reason residual encoding exists (Jégou et al.): on clustered
    data the residual r = x − c_list has a fraction of the vector's
    magnitude, so the same code budget quantizes it on a finer grid —
    the ADC distances track the TRUE distances strictly better. Pinned
    as mean |adc − true_d2| over every (query, candidate) pair at full
    probe coverage: residual MAE < raw-vector MAE."""
    import numpy as np

    rng = np.random.RandomState(37)
    centers = rng.randn(8, 64) * 10
    vecs = np.stack(
        [centers[i % 8] + rng.randn(64) * 0.5 for i in range(80)]
    )
    df = _emb_frame(spark, vecs)
    qids = [0, 1, 2, 3]

    def mae(res):
        total = n = 0
        for r in res.collect():
            true = float(np.sum((vecs[r["q_id"]] - vecs[r["vec_id"]]) ** 2))
            total += abs(r["adc"] - true)
            n += 1
        assert n >= 4 * 70  # full coverage: every non-self pair ranked
        return total / n

    raw = mae(
        similarity.ivfpq_topk(df, qids, k=79, nprobe=8, n_lists=8)
    )
    res = mae(
        similarity.ivfpq_residual_topk(df, qids, k=79, nprobe=8, n_lists=8)
    )
    assert res < raw, (res, raw)


def test_ivfpq_residual_index_reuse_and_contract(spark):
    import numpy as np

    rng = np.random.RandomState(41)
    df = _emb_frame(spark, rng.randn(50, 64))
    books, listed = similarity.ivfpq_residual_index(df, n_lists=5)
    assert set(listed.columns) == {"vec_id", "list_id", "m", "code"}
    fresh = similarity.ivfpq_residual_topk(
        df, [0, 1], k=3, nprobe=2, n_lists=5
    ).collect()
    loaded = similarity.ivfpq_residual_topk(
        df, [0, 1], k=3, nprobe=2, n_lists=5,
        books=books, listed_codes=listed,
    ).collect()
    assert sorted(map(tuple, loaded)) == sorted(map(tuple, fresh))
    with pytest.raises(ValueError, match="must be passed together"):
        similarity.ivfpq_residual_topk(df, [0], listed_codes=listed, n_lists=5)
    with pytest.raises(ValueError, match="must be passed together"):
        similarity.ivfpq_residual_topk(df, [0], books=books, n_lists=5)


def test_ivfpq_residual_centroid_rows_encode_to_zero_residual(spark):
    """Vectors that ARE coarse centroids (vec_id < n_lists) have
    residual exactly zero — their codes must all pick the single
    nearest residual centroid deterministically (same code across m
    for identical zero residuals ties → smallest b_id each subspace).
    Pins the seeding rationale: books skip ids < n_lists."""
    import numpy as np

    rng = np.random.RandomState(43)
    df = _emb_frame(spark, rng.randn(40, 64))
    _, listed = similarity.ivfpq_residual_index(df, n_lists=4)
    own = (
        listed.filter(F.col("vec_id") < 4)
        .groupBy("vec_id")
        .agg(F.count_distinct("code").alias("nc"))
        .collect()
    )
    # zero residual -> per-subspace argmin is well-defined (no crash,
    # exactly PQ_M codes per vector)
    per = listed.filter(F.col("vec_id") < 4).groupBy("vec_id").count().collect()
    assert all(r["count"] == similarity.PQ_M for r in per)
    assert len(own) == 4


def test_ivfpq_index_save_load_residual(spark, tmp_path):
    """The residual flag rides the params sidecar so a loaded index is
    probed with the MATCHING probe; a loaded residual index must
    reproduce the fresh residual probe exactly."""
    import numpy as np

    rng = np.random.RandomState(47)
    df = _emb_frame(spark, rng.randn(50, 64))
    root = str(tmp_path / "ivfpq_res")
    similarity.ivfpq_index_save(df, root, n_lists=5, residual=True)
    books, listed, params = similarity.ivfpq_index_load(spark, root)
    assert params["residual"] is True and params["n_lists"] == 5
    fresh = similarity.ivfpq_residual_topk(
        df, [0, 1], k=3, nprobe=2, n_lists=5
    ).collect()
    loaded = similarity.ivfpq_residual_topk(
        df, [0, 1], k=3, nprobe=2, n_lists=5,
        books=books, listed_codes=listed,
    ).collect()
    assert sorted(map(tuple, loaded)) == sorted(map(tuple, fresh))
    # raw save still loads with residual=False
    root2 = str(tmp_path / "ivfpq_raw")
    similarity.ivfpq_index_save(df, root2, n_lists=5)
    _, _, p2 = similarity.ivfpq_index_load(spark, root2)
    assert p2["residual"] is False


# -- vocabulary construction + numericalization --------------------------------

def test_vocab_build_ids_deterministic_and_dense(spark):
    from semantic_cpp_spark.pipeline import text as T

    df = spark.createDataFrame(
        [(0, "b b b a a c"), (1, "a d d b")], "doc_id long, text string"
    )
    v = {r["token"]: r for r in T.vocab_build(df, F.col("text")).collect()}
    # counts: b=4, a=3, d=2, c=1; ties none; ids dense by (n desc, token)
    assert (v["b"]["n"], v["b"]["token_id"]) == (4, 0)
    assert (v["a"]["n"], v["a"]["token_id"]) == (3, 1)
    assert (v["d"]["n"], v["d"]["token_id"]) == (2, 2)
    assert (v["c"]["n"], v["c"]["token_id"]) == (1, 3)
    # equal-count ties order by token ASC
    df2 = spark.createDataFrame([(0, "z y z y")], "doc_id long, text string")
    v2 = {r["token"]: r["token_id"] for r in T.vocab_build(df2, F.col("text")).collect()}
    assert v2 == {"y": 0, "z": 1}
    # min_count floors, max_size caps the ID RANGE (not arbitrary rows)
    capped = T.vocab_build(df, F.col("text"), min_count=2, max_size=2).collect()
    assert sorted(r["token"] for r in capped) == ["a", "b"]


def test_encode_tokens_positions_oov_and_fingerprint(spark):
    import hashlib

    from semantic_cpp_spark.pipeline import text as T

    df = spark.createDataFrame(
        [(7, "b a x b"), (8, "a")], "doc_id long, text string"
    )
    # counts: a=2, b=2, x=1 -> tie at n=2 orders by token: a=0, b=1; x OOV
    vocab = T.vocab_build(df, F.col("text"), max_size=2)
    out = {
        r["doc_id"]: r
        for r in T.encode_tokens(
            df, F.col("text"), F.col("doc_id"), vocab
        ).collect()
    }
    assert out[7]["ids"] == [1, 0, -1, 1]
    assert out[7]["n_tokens"] == 4 and out[7]["n_oov"] == 1
    assert out[7]["ids_fp"] == hashlib.md5(b"1_0_-1_1").hexdigest()
    assert out[8]["ids"] == [0] and out[8]["n_oov"] == 0


def test_ivfpq_residual_training_sse_monotone(spark):
    """Lloyd on the residual space: one training iteration must not
    increase the total encode SSE (sum over subvectors of the squared
    distance to the assigned centroid) — the Lloyd monotonicity
    theorem, with a 1e-6 slack for the exactness discipline's
    micro-unit centroid quantization."""
    import numpy as np

    rng = np.random.RandomState(53)
    centers = rng.randn(5, 64) * 6
    vecs = np.stack([centers[i % 5] + rng.randn(64) for i in range(120)])
    df = _emb_frame(spark, vecs)

    def total_sse(books):
        from semantic_cpp_spark.pipeline.clustering import sq_dist

        resid = similarity._coarse_residuals(df, "vec_id", "embedding", 5)
        ms = F.explode(F.sequence(F.lit(0), F.lit(similarity.PQ_M - 1))).alias("m")
        sub = resid.select("vec_id", ms, "rv").select(
            "vec_id", "m",
            F.slice(F.col("rv"), F.col("m") * 16 + 1, 16).alias("xv"),
        )
        scored = sub.join(F.broadcast(books), "m").select(
            "vec_id", "m", sq_dist(F.col("xv"), F.col("cv")).alias("d2")
        )
        from pyspark.sql import Window as W

        w = W.partitionBy("vec_id", "m").orderBy("d2")
        best = (
            scored.withColumn("r", F.row_number().over(w))
            .filter(F.col("r") == 1)
        )
        return best.agg(F.sum("d2")).collect()[0][0]

    b0, _ = similarity.ivfpq_residual_index(df, n_lists=5, iters=0)
    b1, _ = similarity.ivfpq_residual_index(df, n_lists=5, iters=1)
    s0, s1 = total_sse(b0), total_sse(b1)
    assert s1 <= s0 + 1e-6 * max(1.0, abs(s0)), (s0, s1)
    assert s1 < s0  # on random data a step strictly improves


def test_vocab_counts_merge_equals_direct_build(spark):
    """Vocabulary maintenance: per-delta count states fold by pure
    addition, and ranking the merged state equals a from-scratch
    vocab_build of the concatenated corpus — token, count, AND id."""
    from semantic_cpp_spark.pipeline import text as T

    a = spark.createDataFrame(
        [(0, "x y z x"), (1, "y")], "doc_id long, text string"
    )
    b = spark.createDataFrame([(2, "z z q x")], "doc_id long, text string")
    merged = T.vocab_rank(
        T.merge_vocab_counts(
            [T.vocab_counts(a, F.col("text")), T.vocab_counts(b, F.col("text"))]
        )
    )
    direct = T.vocab_build(a.unionByName(b), F.col("text"))
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, direct.collect())
    )
    import pytest as _p

    with _p.raises(ValueError, match="at least one"):
        T.merge_vocab_counts([])


# -- r10: sampled/checkpointed PQ training, early stop, API fixes -------------

def test_pq_books_trained_train_frac_matches_manual_sample(spark):
    """train_frac trains on exactly the deterministic hash sample
    (curation.bernoulli_sample semantics — content-addressed, so any
    cluster draws the identical training set) while seeding from the
    FULL corpus: the books must equal hand-assembling the same sample
    + full-corpus seeds, book-for-book."""
    from semantic_cpp_spark.pipeline import curation

    rng = np.random.RandomState(61)
    df = _emb_frame(spark, rng.randn(60, 64))
    auto = similarity.pq_books_trained(
        df, iters=1, train_frac=0.5, train_salt="tf"
    )
    manual = similarity.pq_books_trained(
        curation.bernoulli_sample(df, F.col("vec_id"), 0.5, "tf"),
        iters=1,
        seed_books=similarity.pq_books(df),
    )
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, manual.collect())
    )
    # the sample is a proper subset -> sampled books differ from full
    full = similarity.pq_books_trained(df, iters=1)
    assert sorted(map(tuple, auto.collect())) != sorted(
        map(tuple, full.collect())
    )
    with pytest.raises(ValueError, match="train_frac"):
        similarity.pq_books_trained(df, iters=1, train_frac=1.5)
    with pytest.raises(ValueError, match="train_frac"):
        similarity.pq_books_trained(df, iters=1, train_frac=0.0)


def test_pq_books_trained_checkpoint_resume(spark, tmp_path):
    """checkpoint_path makes the 100-TB advice executable: each Lloyd
    step persists its books, and a re-invocation resumes from the
    newest completed step instead of replaying the chain. Pinned by
    (a) chained-with-checkpoint == direct two-step books, (b) a
    same-corpus re-invocation answered from the complete checkpoint,
    and (c) — ADVICE r10 — a resume handed a DIFFERENT corpus, or
    different training params, RAISES instead of silently adopting
    the checkpointed state (the params+fingerprint sidecar)."""
    rng = np.random.RandomState(67)
    df = _emb_frame(spark, rng.randn(50, 64))
    ck = str(tmp_path / "pq_ck")
    similarity.pq_books_trained(df, iters=1, checkpoint_path=ck)
    resumed = similarity.pq_books_trained(df, iters=2, checkpoint_path=ck)
    direct = similarity.pq_books_trained(df, iters=2)
    assert sorted(map(tuple, resumed.collect())) == sorted(
        map(tuple, direct.collect())
    )
    again = similarity.pq_books_trained(df, iters=2, checkpoint_path=ck)
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, direct.collect())
    )
    other = _emb_frame(spark, rng.randn(50, 64) + 3.0)
    with pytest.raises(ValueError, match="different"):
        similarity.pq_books_trained(other, iters=2, checkpoint_path=ck)
    with pytest.raises(ValueError, match="different"):
        similarity.pq_books_trained(
            df, iters=2, checkpoint_path=ck, train_frac=0.5
        )
    # steps but no sidecar (pre-r11 layout) -> refuse
    import shutil

    shutil.rmtree(f"{ck}/params")
    with pytest.raises(ValueError, match="provenance"):
        similarity.pq_books_trained(df, iters=2, checkpoint_path=ck)


def test_ivfpq_residual_early_stop_requires_training(spark):
    """ADVICE r10: early_stop_ids with the default iters=0 previously
    returned an untrained index and an empty info dict with no signal
    — now it raises."""
    rng = np.random.RandomState(11)
    df = _emb_frame(spark, rng.randn(30, 64))
    with pytest.raises(ValueError, match="iters"):
        similarity.ivfpq_residual_index(
            df, n_lists=3, early_stop_ids=[0, 1]
        )


def test_ivfpq_residual_checkpoint_threads_through(spark, tmp_path):
    """checkpoint_path on the residual build must reach
    pq_books_trained: same books as the un-checkpointed build, a
    resume answered from the checkpoint, and the unsupported
    early-stop combination raises instead of silently ignoring the
    path."""
    rng = np.random.RandomState(91)
    centers = rng.randn(4, 64) * 6
    vecs = np.stack([centers[i % 4] + rng.randn(64) for i in range(60)])
    df = _emb_frame(spark, vecs)
    ck = str(tmp_path / "res_ck")
    want, _ = similarity.ivfpq_residual_index(df, n_lists=4, iters=1)
    got, _ = similarity.ivfpq_residual_index(
        df, n_lists=4, iters=1, checkpoint_path=ck
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    again, _ = similarity.ivfpq_residual_index(
        df, n_lists=4, iters=1, checkpoint_path=ck
    )
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, want.collect())
    )
    with pytest.raises(ValueError, match="early_stop"):
        similarity.ivfpq_residual_index(
            df, n_lists=4, iters=1, early_stop_ids=[0],
            checkpoint_path=ck,
        )


def test_ivfpq_index_load_backfills_unknown_iters(spark, tmp_path):
    """ADVICE r10: pre-r10 sidecars never recorded training depth, and
    trained saves could use any explicit iters — the backfill must
    report None ("trained, depth unknown"), not assert 1; untrained
    pre-r10 saves are safely 0."""
    rng = np.random.RandomState(12)
    df = _emb_frame(spark, rng.randn(30, 64))
    for trained, want in ((True, None), (False, 0)):
        root = str(tmp_path / f"old_{trained}")
        similarity.ivfpq_index_save(df, root, n_lists=3, trained=trained)
        # rewrite the sidecar without the iters column = pre-r10 layout
        old = spark.read.parquet(f"{root}/params").drop("iters")
        rows, schema = old.collect(), old.schema
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{root}/params")
        _, _, params = similarity.ivfpq_index_load(spark, root)
        assert params["iters"] == want, (trained, params["iters"])


def test_ivfpq_residual_early_stop_stops_at_one_on_clustered_data(spark):
    """The SCALING r9 finding as machinery (VERDICT r9 #5): held-out
    recall rises with the first residual training step and FALLS with
    the second on the clustered fixture, so the early stop must keep
    exactly one step — and return that step's books, not the last
    trained candidate."""
    rng = np.random.RandomState(37)
    centers = rng.randn(8, 64) * 10
    vecs = np.stack(
        [centers[i % 8] + rng.randn(64) * 0.5 for i in range(80)]
    )
    df = _emb_frame(spark, vecs)
    info: dict = {}
    books, listed = similarity.ivfpq_residual_index(
        df, n_lists=8, iters=3, early_stop_ids=[0, 1, 2, 3],
        early_stop_info=info,
    )
    r = info["recall_per_step"]
    assert info["steps_used"] == 1, info
    assert r[1] > r[0] and r[2] <= r[1], info
    assert len(r) == 3  # stopped after the first non-improvement
    b1, _ = similarity.ivfpq_residual_index(df, n_lists=8, iters=1)
    assert sorted(map(tuple, books.collect())) == sorted(
        map(tuple, b1.collect())
    )


def test_apply_passage_keep_window_rides_through(spark):
    """ADVICE r9: apply_passage_keep re-chunks with the SAME window the
    keep-list was built with — a non-default window must reconstruct
    no-dup documents verbatim instead of silently joining misaligned
    (doc_id, pid) pairs."""
    toks = [f"w{i}a w{i}b w{i}c w{i}d" for i in range(5)]
    df = spark.createDataFrame(
        [(0, " ".join(toks)), (1, "solo text here")],
        "doc_id long, text string",
    )
    keep = dedup.passage_keep_list(df, F.col("text"), F.col("doc_id"), window=4)
    out = dedup.apply_passage_keep(
        df, F.col("text"), F.col("doc_id"), keep, window=4, emit_text=True
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[0]["n_passages_kept"] == 5  # ceil(20/4), all unique
    assert by_id[0]["text"] == " ".join(toks)
    assert by_id[1]["text"] == "solo text here"


def test_temperature_mixture_max_domains_bound(spark):
    """The r8/r9 carried contract note, closed as an enforced bound:
    the driver-side threshold dict is sized for curated mixture axes,
    and a domain column past max_domains raises count-first instead of
    silently building a 10^8-branch CASE chain."""
    from semantic_cpp_spark.pipeline import curation

    df = spark.createDataFrame(
        [(i, f"d{i % 3}") for i in range(30)], "id long, dom string"
    )
    with pytest.raises(ValueError, match="max_domains=2"):
        curation.temperature_mixture_sample(
            df, F.col("id"), F.col("dom"), max_domains=2
        )
    kept = curation.temperature_mixture_sample(
        df, F.col("id"), F.col("dom"), max_domains=3
    )
    assert 0 < kept.count() <= 30
    with pytest.raises(ValueError, match="max_domains"):
        curation.temperature_mixture_sample(
            df, F.col("id"), F.col("dom"), max_domains=0
        )


def test_ivfpq_codes_trained_flag_honored(spark):
    """ADVICE r9: ivfpq_codes(trained=True) must encode against
    Lloyd-trained books (it used to silently ignore the flag)."""
    rng = np.random.RandomState(71)
    df = _emb_frame(spark, rng.randn(60, 64))
    auto = similarity.ivfpq_codes(df, n_lists=5, trained=True)
    manual = similarity.ivfpq_codes(
        df, n_lists=5, books=similarity.pq_books_trained(df)
    )
    assert sorted(map(tuple, auto.collect())) == sorted(
        map(tuple, manual.collect())
    )


def test_ivfpq_codes_accepts_preencoded_codes(spark):
    """r15 share-one-encode hook: ivfpq_codes(codes=pq_encode(...))
    must emit exactly the rows of the derive-internally path (the
    sim_ivfpq_family_topk sharing contract), and codes without their
    books must raise (codes against other books are garbage)."""
    rng = np.random.RandomState(77)
    df = _emb_frame(spark, rng.randn(60, 64))
    books = similarity.pq_books(df)
    pre = similarity.pq_encode(df, books=books)
    shared = similarity.ivfpq_codes(df, n_lists=5, books=books, codes=pre)
    derived = similarity.ivfpq_codes(df, n_lists=5, books=books)
    assert sorted(map(tuple, shared.collect())) == sorted(
        map(tuple, derived.collect())
    )
    with pytest.raises(ValueError, match="codes without their books"):
        similarity.ivfpq_codes(df, n_lists=5, codes=pre)


def test_ivfpq_index_save_threads_residual_iters(spark, tmp_path):
    """ADVICE r9: ivfpq_index_save(residual=True, iters=1) must build a
    TRAINED residual index and record the effective iters in the params
    sidecar (defaults keep each form's previous behavior: residual
    saves untrained, raw trained saves one step)."""
    rng = np.random.RandomState(73)
    df = _emb_frame(spark, rng.randn(50, 64))
    root = str(tmp_path / "res_it1")
    similarity.ivfpq_index_save(df, root, n_lists=5, residual=True, iters=1)
    books, listed, params = similarity.ivfpq_index_load(spark, root)
    assert params["residual"] is True and params["iters"] == 1
    want, _ = similarity.ivfpq_residual_index(df, n_lists=5, iters=1)
    assert sorted(map(tuple, books.collect())) == sorted(
        map(tuple, want.collect())
    )
    root0 = str(tmp_path / "res_it0")
    similarity.ivfpq_index_save(df, root0, n_lists=5, residual=True)
    _, _, p0 = similarity.ivfpq_index_load(spark, root0)
    assert p0["iters"] == 0
    root_raw = str(tmp_path / "raw_tr")
    similarity.ivfpq_index_save(df, root_raw, n_lists=5, trained=True)
    _, _, praw = similarity.ivfpq_index_load(spark, root_raw)
    assert praw["trained"] is True and praw["iters"] == 1


# -- r10: learned BPE merges ---------------------------------------------------

def _py_bpe_reference(docs: list[str], n: int):
    """Serial Sennrich reference: word-frequency state, most-frequent
    adjacent pair per round (ties -> smallest (lhs, rhs)), greedy
    left-to-right merge application."""
    from collections import Counter

    wc = Counter(w for t in docs for w in t.strip().split())
    state = {w: list(w) for w in wc}
    out = []
    for rank in range(1, n + 1):
        pc = Counter()
        for w, syms in state.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += wc[w]
        if not pc:
            break
        m = max(pc.values())
        lhs, rhs = sorted(k for k, v in pc.items() if v == m)[0]
        out.append((rank, lhs, rhs, m))
        for w, syms in state.items():
            i, ns = 0, []
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == lhs and syms[i + 1] == rhs:
                    ns.append(lhs + rhs)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            state[w] = ns
    return out


def test_bpe_train_merges_matches_serial_reference(spark):
    """Distributed BPE training must learn the exact merge table a
    serial Sennrich implementation learns — counts, tie-breaks, and
    greedy application all agree round for round, including the
    overlapping-pair case ('aaa' counts two (a,a) pairs but merges to
    ['aa','a'], never ['a','aa'])."""
    docs = [
        "the cat sat on the mat",
        "the hat that the cat wore",
        "that mat the rat sat upon",
        "aaa aa a banana bandana",
    ]
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    got = [
        tuple(r)
        for r in text.bpe_train_merges(df, F.col("text"), 6)
        .orderBy("rank")
        .collect()
    ]
    assert got == _py_bpe_reference(docs, 6)
    with pytest.raises(ValueError, match="n_merges"):
        text.bpe_train_merges(df, F.col("text"), 0)


def test_bpe_apply_round_trips_every_word(spark):
    """Applying the learned table never loses characters: merges only
    fuse adjacent symbols, so concatenating the symbol array always
    rebuilds the word — the invariant that makes learned-BPE encoding
    safe to feed the encode/pack pipeline."""
    docs = [
        "banana bandana cabana",
        "the theme thesis there",
        "aaa aaaa aa",
    ]
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    merges = text.collect_merges(
        text.bpe_train_merges(df, F.col("text"), 8)
    )
    assert len(merges) == 8
    words = df.select(F.explode(text.tokens(F.col("text"))).alias("w"))
    chk = words.select(
        "w", F.array_join(text.bpe_apply(F.col("w"), merges), "").alias("rt")
    ).collect()
    assert chk and all(r["w"] == r["rt"] for r in chk)
    # greedy overlap semantics pinned directly
    one = spark.createDataFrame([("aaa",)], "w string").select(
        text.bpe_apply(F.col("w"), [("a", "a")]).alias("syms")
    ).collect()[0]["syms"]
    assert one == ["aa", "a"]


def test_bpe_train_merges_stops_when_pairs_exhaust(spark):
    """Single-character words have no adjacent pairs: training returns
    fewer merges than requested (here: zero) instead of looping or
    crashing — callers replaying a fixed round count in an oracle must
    size n_merges to the corpus."""
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "b c a")], "doc_id long, text string"
    )
    got = text.bpe_train_merges(df, F.col("text"), 4).collect()
    assert got == []


def test_bpe_segment_matches_per_word_apply_and_round_trips(spark):
    """Document segmentation with a learned table must equal applying
    the merges word by word, in document order (merges never cross
    word boundaries — the Sennrich contract), and concatenating the
    subword stream must rebuild the document's characters exactly."""
    docs = [
        "banana bandana cabana",
        "the theme thesis there the",
        "aaa aa banana",
    ]
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    merges = text.collect_merges(text.bpe_train_merges(df, F.col("text"), 6))
    seg = {
        r["doc_id"]: r["subword_text"]
        for r in text.bpe_segment(
            df, F.col("text"), F.col("doc_id"), merges
        ).collect()
    }
    # per-word equivalence against bpe_apply
    word_syms = {
        r["w"]: list(r["syms"])
        for r in spark.createDataFrame(
            [(w,) for t in docs for w in t.split()], "w string"
        )
        .select("w", text.bpe_apply(F.col("w"), merges).alias("syms"))
        .distinct()
        .collect()
    }
    for i, t in enumerate(docs):
        want = " ".join(s for w in t.split() for s in word_syms[w])
        assert seg[i] == want, (i, seg[i], want)
        assert seg[i].replace(" ", "") == t.replace(" ", "")


def test_bpe_segment_feeds_encode_pipeline(spark):
    """The end-to-end learned-subword path: tokenize → LEARN merges →
    segment → vocab_build → encode_tokens. Segmented docs are ordinary
    whitespace text, so the existing numericalize stage consumes them
    unchanged; the encoded id streams must be deterministic and OOV-free
    when the vocab is uncapped (every subword is in the vocab by
    construction — it came from the same corpus)."""
    docs = ["banana bandana", "cabana banana", "the theme"]
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    merges = text.collect_merges(text.bpe_train_merges(df, F.col("text"), 4))
    seg = text.bpe_segment(df, F.col("text"), F.col("doc_id"), merges)
    vocab = text.vocab_build(seg, F.col("subword_text"))
    enc = text.encode_tokens(
        seg, F.col("subword_text"), F.col("doc_id"), vocab
    )
    rows = {r["doc_id"]: r for r in enc.collect()}
    assert all(r["n_oov"] == 0 for r in rows.values())
    # deterministic: re-running the whole chain yields identical ids
    merges2 = text.collect_merges(text.bpe_train_merges(df, F.col("text"), 4))
    seg2 = text.bpe_segment(df, F.col("text"), F.col("doc_id"), merges2)
    enc2 = text.encode_tokens(
        seg2, F.col("subword_text"), F.col("doc_id"),
        text.vocab_build(seg2, F.col("subword_text")),
    )
    assert {r["doc_id"]: r["ids_fp"] for r in enc2.collect()} == {
        d: r["ids_fp"] for d, r in rows.items()
    }
    # subword streams are LONGER than word streams (subwords) but
    # fully faithful: total characters preserved
    n_sub = sum(r["n_tokens"] for r in rows.values())
    n_words = sum(len(t.split()) for t in docs)
    assert n_sub >= n_words


# -- r11: Arrow-batched BPE segment kernel -------------------------------------


def _seg_rows(df, merges, impl):
    out = text.bpe_segment(
        df, F.col("text"), F.col("doc_id"), merges, impl=impl
    )
    return sorted((r["doc_id"], r["subword_text"]) for r in out.collect())


def test_bpe_segment_kernel_equals_column_fold_m6(spark):
    """The Arrow kernel must reproduce the Column fold byte-for-byte on
    a Spark-trained table — including chained merges (operands that are
    themselves merge products) and the greedy overlap case."""
    docs = [
        "banana bandana cabana",
        "the theme thesis there the",
        "aaa aaaa aa banana",
        "that hat the cat sat",
    ]
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    merges = text.collect_merges(text.bpe_train_merges(df, F.col("text"), 6))
    assert len(merges) == 6
    assert _seg_rows(df, merges, "column") == _seg_rows(df, merges, "kernel")


def _py_fold_apply(word: str, merges) -> str:
    """Serial in-order fold: every rule applies once, in rank order,
    merging all occurrences left-to-right non-overlapping — literally
    the Column fold's replace-all semantics, independently coded (a
    different algorithm from the kernel's monotone rank-floor search)."""
    syms = list(word)
    for lhs, rhs in merges:
        out, i = [], 0
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == lhs and syms[i + 1] == rhs:
                out.append(lhs + rhs)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return " ".join(syms)


def _bpe_synth_corpus(n_train_docs=40, n_test_docs=12, seed=411):
    rng = __import__("random").Random(seed)
    alphabet = "abcdefghij"
    corpus_words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(3, 12)))
        for _ in range(400)
    ]
    train_docs = [
        " ".join(rng.choice(corpus_words) for _ in range(30))
        for _ in range(n_train_docs)
    ]
    test_docs = [
        " ".join(
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 15)))
            for _ in range(20)
        )
        for _ in range(n_test_docs)
    ] + train_docs[:3]
    return train_docs, test_docs


def test_bpe_segment_kernel_equals_column_fold_m120(spark):
    """Column↔kernel equality at the largest table the fold can hold
    safely (the fold's real ceiling is the JVM thread stack — a
    ~500-deep replace chain already threw StackOverflowError at
    codegen, which is WHY BPE_KERNEL_THRESHOLD sits at 256 and the
    M=500 pin below uses a serial reference instead)."""
    train_docs, test_docs = _bpe_synth_corpus()
    learned = _py_bpe_reference(train_docs, 120)
    merges = [(lhs, rhs) for _, lhs, rhs, _ in learned]
    assert len(merges) == 120, len(merges)
    df = spark.createDataFrame(
        list(enumerate(test_docs)), "doc_id long, text string"
    )
    assert _seg_rows(df, merges, "column") == _seg_rows(df, merges, "kernel")


def test_bpe_segment_kernel_matches_serial_reference_m500(spark):
    """Production-shape pin past the Column fold's JVM-stack ceiling:
    a 500-rule table learned by the serial Sennrich reference, applied
    to unseen documents, must match an independently-coded serial
    in-order fold word-for-word."""
    train_docs, test_docs = _bpe_synth_corpus()
    learned = _py_bpe_reference(train_docs, 500)
    merges = [(lhs, rhs) for _, lhs, rhs, _ in learned]
    assert len(merges) == 500, len(merges)
    df = spark.createDataFrame(
        list(enumerate(test_docs)), "doc_id long, text string"
    )
    got = dict(_seg_rows(df, merges, "kernel"))
    want = {
        i: " ".join(_py_fold_apply(w, merges) for w in t.split())
        for i, t in enumerate(test_docs)
    }
    assert got == want


def test_bpe_segment_kernel_edge_case_parity(spark):
    """Null text, empty text, space-only, tab-edged, and multi-space
    documents must come out of the kernel exactly as the Column path
    emits them (Spark trims spaces only; Java \\s drives the split;
    the final whitespace collapse erases empty tokens)."""
    docs = [
        (0, None),
        (1, ""),
        (2, "   "),
        (3, "\t"),
        (4, "\tbanana  bandana\t"),
        (5, " aaa\naa "),
        (6, "a"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    merges = [("a", "a"), ("b", "a"), ("n", "a")]
    assert _seg_rows(df, merges, "column") == _seg_rows(df, merges, "kernel")


def test_bpe_segment_kernel_runs_at_30k_merges(spark):
    """The smoke the Column fold provably cannot pass: a 30k-rule
    table plans and executes through the kernel (rank-dict cost is
    independent of M). The 29,994 synthetic rules use bracketed
    multi-char operands no document-derived symbol can ever equal, so
    the output must equal the Column fold run with just the 6 real
    rules — a meaningful equality, not only a crash-free run."""
    docs = [
        "banana bandana cabana",
        "the theme thesis there",
        "aaa aa banana",
    ]
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    real = text.collect_merges(text.bpe_train_merges(df, F.col("text"), 6))
    big = list(real) + [(f"<{i}L>", f"<{i}R>") for i in range(29_994)]
    assert len(big) == 30_000
    got = _seg_rows(df, big, "kernel")
    assert got == _seg_rows(df, real, "column")
    # auto dispatch picks the kernel above the threshold ...
    plan = text.bpe_segment(
        df, F.col("text"), F.col("doc_id"), big
    )._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    # ... and the codegen Column fold below it
    plan_small = text.bpe_segment(
        df, F.col("text"), F.col("doc_id"), real
    )._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan_small


def test_bpe_segment_kernel_rejects_bad_input(spark):
    df = spark.createDataFrame([(0, "ab")], "doc_id long, text string")
    with pytest.raises(ValueError, match="impl"):
        text.bpe_segment(
            df, F.col("text"), F.col("doc_id"), [("a", "b")], impl="magic"
        )
    with pytest.raises(ValueError, match="duplicate"):
        text.bpe_segment(
            df,
            F.col("text"),
            F.col("doc_id"),
            [("a", "b"), ("a", "b")],
            impl="kernel",
        )


# -- r11: checkpointed BPE training --------------------------------------------

_BPE_CK_DOCS = [
    "the cat sat on the mat",
    "the hat that the cat wore",
    "that mat the rat sat upon",
    "banana bandana cabana",
]


def _bpe_ck_df(spark, docs=None):
    return spark.createDataFrame(
        list(enumerate(docs or _BPE_CK_DOCS)), "doc_id long, text string"
    )


def test_bpe_train_checkpoint_resume(spark, tmp_path):
    """checkpoint_path training must (1) learn the identical table the
    un-checkpointed path learns, (2) resume a finished run straight
    from the newest step without changing the answer, and (3) extend a
    shorter run: a 4-merge checkpointed run resumed with n_merges=6
    continues from step 4 and matches direct 6-merge training."""
    df = _bpe_ck_df(spark)
    want6 = [
        tuple(r)
        for r in text.bpe_train_merges(df, F.col("text"), 6)
        .orderBy("rank").collect()
    ]
    root = str(tmp_path / "bpe_ck")
    got4 = [
        tuple(r)
        for r in text.bpe_train_merges(
            df, F.col("text"), 4, checkpoint_path=root, checkpoint_every=2
        ).orderBy("rank").collect()
    ]
    assert got4 == want6[:4]
    # steps 2 and 4 exist on disk
    import os

    assert sorted(
        d for d in os.listdir(root) if d.startswith("step=")
    ) == ["step=2", "step=4"]
    # extend to 6: resumes from step 4, learns 2 more rounds
    got6 = [
        tuple(r)
        for r in text.bpe_train_merges(
            df, F.col("text"), 6, checkpoint_path=root, checkpoint_every=2
        ).orderBy("rank").collect()
    ]
    assert got6 == want6
    # re-invoke at 6 again: answered from the step=6 checkpoint alone
    again = [
        tuple(r)
        for r in text.bpe_train_merges(
            df, F.col("text"), 6, checkpoint_path=root, checkpoint_every=2
        ).orderBy("rank").collect()
    ]
    assert again == want6
    with pytest.raises(ValueError, match="checkpoint_every"):
        text.bpe_train_merges(
            df, F.col("text"), 2, checkpoint_path=root, checkpoint_every=0
        )


def test_bpe_train_min_count_floor(spark):
    """Sennrich's standard stopping criterion: training stops when the
    best remaining pair occurs fewer than min_count times — the
    returned table is exactly the unfloored table truncated at the
    first rank whose pair_count falls below the floor (singleton-pair
    merges memorize noise; real tokenizers floor the frequency)."""
    df = _bpe_ck_df(spark)
    full = [
        tuple(r)
        for r in text.bpe_train_merges(df, F.col("text"), 10)
        .orderBy("rank").collect()
    ]
    floor = full[2][3]  # the 3rd merge's pair_count as the floor
    floored = [
        tuple(r)
        for r in text.bpe_train_merges(
            df, F.col("text"), 10, min_count=floor
        ).orderBy("rank").collect()
    ]
    want = [m for m in full if m[3] >= floor]
    # counts are non-increasing across rounds for this corpus, so the
    # floored run is the prefix above the floor
    assert floored == want and 0 < len(floored) < len(full)
    with pytest.raises(ValueError, match="min_count"):
        text.bpe_train_merges(df, F.col("text"), 2, min_count=0)


def test_bpe_train_checkpoint_refuses_foreign_state(spark, tmp_path):
    """The params sidecar is load-bearing: a different corpus or a
    different eow pointed at an existing root must raise, and a root
    holding steps with no sidecar must raise — never silently adopt
    checkpointed state of unknown provenance (ADVICE r10 discipline)."""
    df = _bpe_ck_df(spark)
    root = str(tmp_path / "bpe_ck_id")
    text.bpe_train_merges(
        df, F.col("text"), 2, checkpoint_path=root, checkpoint_every=1
    )
    other = _bpe_ck_df(spark, ["zebra quagga okapi", "quagga zebra"])
    with pytest.raises(ValueError, match="different"):
        text.bpe_train_merges(
            other, F.col("text"), 2, checkpoint_path=root, checkpoint_every=1
        )
    with pytest.raises(ValueError, match="different"):
        text.bpe_train_merges(
            df, F.col("text"), 2, eow="</w>",
            checkpoint_path=root, checkpoint_every=1,
        )
    # steps but no sidecar -> refuse
    import shutil

    shutil.rmtree(f"{root}/params")
    with pytest.raises(ValueError, match="provenance"):
        text.bpe_train_merges(
            df, F.col("text"), 2, checkpoint_path=root, checkpoint_every=1
        )


def test_bpe_train_local_equals_distributed_m6_m94(spark):
    """The r12 hybrid fast path (collect the vocab-sized word table,
    train driver-side with incremental pair updates) must emit the
    EXACT table the distributed loop emits — rank, lhs, rhs, AND
    pair_count — at a small and a production-shaped merge budget: the
    tie-break (cnt DESC, then (lhs, rhs) in UTF-8 byte order = Spark's
    string sort), the left-to-right merge order, and the
    at-selection-time counts all have to agree round for round."""
    train_docs, _ = _bpe_synth_corpus()
    df = spark.createDataFrame(
        list(enumerate(train_docs)), "doc_id long, text string"
    )
    for m in (6, 94):
        local = [
            tuple(r)
            for r in text.bpe_train_merges(
                df, F.col("text"), m, impl="local"
            ).orderBy("rank").collect()
        ]
        dist = [
            tuple(r)
            for r in text.bpe_train_merges(
                df, F.col("text"), m, impl="distributed"
            ).orderBy("rank").collect()
        ]
        assert local == dist and len(local) == m
    # the full-Sennrich eow variant takes the same two paths
    eow_local = [
        tuple(r)
        for r in text.bpe_train_merges(
            df, F.col("text"), 6, eow="</w>", impl="local"
        ).orderBy("rank").collect()
    ]
    eow_dist = [
        tuple(r)
        for r in text.bpe_train_merges(
            df, F.col("text"), 6, eow="</w>", impl="distributed"
        ).orderBy("rank").collect()
    ]
    assert eow_local == eow_dist and len(eow_local) == 6


def test_bpe_train_impl_dispatch_and_validation(spark):
    """auto routes below/above local_threshold (forced distributed via
    local_threshold=0 must still match), min_count floors the local
    trainer identically, impl validates, and impl='local' with a
    checkpoint_path refuses (no durable resume driver-side)."""
    df = _bpe_ck_df(spark)
    want = [
        tuple(r)
        for r in text.bpe_train_merges(df, F.col("text"), 6, impl="local")
        .orderBy("rank").collect()
    ]
    forced_dist = [
        tuple(r)
        for r in text.bpe_train_merges(
            df, F.col("text"), 6, local_threshold=0
        ).orderBy("rank").collect()
    ]
    assert forced_dist == want
    # min_count flows through the local trainer (same floor semantics)
    floor = want[2][3]
    floored = [
        tuple(r)
        for r in text.bpe_train_merges(
            df, F.col("text"), 6, min_count=floor, impl="local"
        ).orderBy("rank").collect()
    ]
    assert floored == [m for m in want if m[3] >= floor]
    with pytest.raises(ValueError, match="impl"):
        text.bpe_train_merges(df, F.col("text"), 2, impl="spark")
    with pytest.raises(ValueError, match="durable"):
        text.bpe_train_merges(
            df, F.col("text"), 2, impl="local", checkpoint_path="/tmp/x"
        )


def test_bpe_segment_kernel_cache_bound_output_unchanged(spark, monkeypatch):
    """The kernel's unique-word result cache is a pure memo with a hard
    size bound (VERDICT r11 missing #2): forcing the cap to 4 against
    documents of mostly-unique words (the adversarial all-unique
    partition shape) must leave the output byte-identical — clear-on-
    full changes memory behavior, never results."""
    train_docs, test_docs = _bpe_synth_corpus()
    learned = _py_bpe_reference(train_docs, 20)
    merges = [(lhs, rhs) for _, lhs, rhs, _ in learned]
    df = spark.createDataFrame(
        list(enumerate(test_docs)), "doc_id long, text string"
    )
    want = _seg_rows(df, merges, "kernel")
    monkeypatch.setattr(text, "BPE_SEGMENT_CACHE_CAP", 4)
    assert _seg_rows(df, merges, "kernel") == want


def test_bpe_segment_eow_both_paths_match_apply(spark):
    """r12: bpe_segment can apply end-of-word-marker tables — the eow
    the table was trained with threads through BOTH execution paths.
    Column and kernel must agree byte-for-byte, every word's
    segmentation must equal bpe_apply(eow) on that word (the per-word
    contract), every word's final subword must carry the marker, and a
    malformed eow raises."""
    docs = [
        "the cat sat on the mat",
        "the hat that the cat wore",
        "that mat the rat sat upon",
        "banana bandana cabana",
    ]
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    merges = text.collect_merges(
        text.bpe_train_merges(df, F.col("text"), 8, eow="</w>")
    )
    assert len(merges) == 8
    col_rows = sorted(
        (r["doc_id"], r["subword_text"])
        for r in text.bpe_segment(
            df, F.col("text"), F.col("doc_id"), merges,
            eow="</w>", impl="column",
        ).collect()
    )
    ker_rows = sorted(
        (r["doc_id"], r["subword_text"])
        for r in text.bpe_segment(
            df, F.col("text"), F.col("doc_id"), merges,
            eow="</w>", impl="kernel",
        ).collect()
    )
    assert col_rows == ker_rows
    # per-word: segment(word) == bpe_apply(word, merges, eow)
    words = sorted({w for t in docs for w in t.split()})
    wdf = spark.createDataFrame([(w,) for w in words], "w string")
    applied = {
        r["w"]: r["syms"]
        for r in wdf.select(
            "w", text.bpe_apply(F.col("w"), merges, eow="</w>").alias("syms")
        ).collect()
    }
    seg_by_word = {
        r["doc_id"]: r["subword_text"]
        for r in text.bpe_segment(
            wdf, F.col("w"), F.col("w"), merges, eow="</w>", impl="kernel"
        ).collect()
    }
    for w in words:
        assert seg_by_word[w] == " ".join(applied[w])
        assert applied[w][-1].endswith("</w>")
    with pytest.raises(ValueError, match="eow"):
        text.bpe_segment(
            df, F.col("text"), F.col("doc_id"), merges, eow="a b"
        )


def test_bpe_vocab_alphabet_plus_merges_and_closure(spark):
    """bpe_vocab is the trainer-defined id space (HF/SentencePiece
    convention): base units = the corpus alphabet in codepoint order
    with ids 0..B-1 (plus the eow marker when trained with one),
    merged units = one per rule with ids B..B+M-1 in rank order — and
    it is CLOSED over segmentation: every unit the segmenter emits is
    in the vocabulary, so subword-encode can never hit OOV on corpus
    text. Stable under corpus growth: adding documents never renumbers
    existing units (new chars sort into base ids only if new)."""
    df = _bpe_ck_df(spark)
    mdf = text.bpe_train_merges(df, F.col("text"), 6)
    vocab = text.bpe_vocab(df, F.col("text"), mdf).collect()
    base = sorted(
        (r["unit"], r["token_id"]) for r in vocab if r["source"] == "base"
    )
    alphabet = sorted({c for d in _BPE_CK_DOCS for w in d.split() for c in w})
    assert [u for u, _ in base] == alphabet
    assert [i for _, i in base] == list(range(len(alphabet)))
    merged = sorted(
        (r["rank"], r["unit"], r["token_id"])
        for r in vocab
        if r["source"] == "merge"
    )
    rules = text.collect_merges(mdf)
    assert [(u, i) for _, u, i in merged] == [
        (lhs + rhs, len(alphabet) + k) for k, (lhs, rhs) in enumerate(rules)
    ]
    # closure: every segmented unit is in the vocab
    units = {
        u
        for r in text.bpe_segment(
            df, F.col("text"), F.col("doc_id"), rules
        ).collect()
        for u in r["subword_text"].split(" ")
    }
    assert units <= {r["unit"] for r in vocab}
    # eow: marker joins the base units; closure holds for eow segments
    mdf_e = text.bpe_train_merges(df, F.col("text"), 6, eow="</w>")
    vocab_e = text.bpe_vocab(df, F.col("text"), mdf_e, eow="</w>").collect()
    base_units_e = {r["unit"] for r in vocab_e if r["source"] == "base"}
    assert "</w>" in base_units_e
    rules_e = text.collect_merges(mdf_e)
    units_e = {
        u
        for r in text.bpe_segment(
            df, F.col("text"), F.col("doc_id"), rules_e, eow="</w>"
        ).collect()
        for u in r["subword_text"].split(" ")
    }
    assert units_e <= {r["unit"] for r in vocab_e}


def test_bpe_segment_eow_empty_doc_parity(spark):
    """r12 review fix: an empty or whitespace-only document must
    segment to '' on BOTH paths even with eow — the column path used
    to symbolize the empty token to a bare phantom marker while the
    kernel dropped it, so crossing BPE_KERNEL_THRESHOLD silently
    changed empty-doc output. Null text stays null on both."""
    df = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, None), (3, "ab")],
        "doc_id long, text string",
    )
    merges = [("a", "b")]
    for eow in (None, "</w>"):
        col_rows = sorted(
            (r["doc_id"], r["subword_text"])
            for r in text.bpe_segment(
                df, F.col("text"), F.col("doc_id"), merges,
                eow=eow, impl="column",
            ).collect()
        )
        ker_rows = sorted(
            (r["doc_id"], r["subword_text"])
            for r in text.bpe_segment(
                df, F.col("text"), F.col("doc_id"), merges,
                eow=eow, impl="kernel",
            ).collect()
        )
        assert col_rows == ker_rows, eow
        assert col_rows[0][1] == "" and col_rows[1][1] == ""
        assert col_rows[2][1] is None


def test_tokenizer_stats_empty_and_null_docs(spark):
    """r12 review fix: empty/whitespace-only docs must yield 0 counts
    and NULL ratios — not a DIVIDE_BY_ZERO that aborts the whole
    metrics job under ANSI mode — and null-text docs must yield NULL
    counts, not size(null) = -1."""
    df = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, None), (3, "aa b")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (
            r["n_words"], r["n_subwords"], r["n_chars"],
            r["fertility"], r["chars_per_subword"],
        )
        for r in text.tokenizer_stats(
            df, F.col("text"), F.col("doc_id"), [("a", "a")]
        ).collect()
    }
    assert got[0] == (0, 0, 0, None, None)
    assert got[1] == (0, 0, 0, None, None)
    assert got[2] == (None, None, None, None, None)
    assert got[3] == (2, 2, 3, 1.0, 1.5)


def test_bpe_word_counts_hook_matches_derived(spark):
    """r15 share-one-word-count hook: bpe_train_merges(word_counts=wc)
    and bpe_vocab(word_counts=wc) must emit exactly the rows of the
    derive-internally paths — including the eow variant (word counts
    are eow-independent: the marker attaches during symbolization).
    This is the equality the tokenizer-lifecycle gates rely on when
    they derive the corpus word table once instead of once per stage."""
    df = _bpe_ck_df(spark)
    wc = text.bpe_word_counts(df, F.col("text")).localCheckpoint()
    for eow in (None, "</w>"):
        m_ref = text.bpe_train_merges(df, F.col("text"), 6, eow=eow)
        m_wc = text.bpe_train_merges(
            df, F.col("text"), 6, eow=eow, word_counts=wc
        )
        assert sorted(map(tuple, m_ref.collect())) == sorted(
            map(tuple, m_wc.collect())
        )
        v_ref = text.bpe_vocab(df, F.col("text"), m_ref, eow=eow)
        v_wc = text.bpe_vocab(
            df, F.col("text"), m_ref, eow=eow, word_counts=wc
        )
        assert sorted(map(tuple, v_ref.collect())) == sorted(
            map(tuple, v_wc.collect())
        )


def test_bpe_vocab_dedupes_colliding_units(spark):
    """r12 review fix: distinct merge rules can concatenate to the
    same unit string ((a,bc) and (ab,c) both yield 'abc'), and a merge
    product can equal the eow marker — a vocabulary must map each
    unit to ONE id (first id wins) or the encode join fans out."""
    df = spark.createDataFrame([(0, "abc abc")], "doc_id long, text string")
    collide = spark.createDataFrame(
        [(1, "b", "c", 2), (2, "a", "bc", 2), (3, "ab", "c", 2)],
        "rank long, lhs string, rhs string, pair_count long",
    )
    vocab = text.bpe_vocab(df, F.col("text"), collide)
    rows = vocab.collect()
    abc = [r for r in rows if r["unit"] == "abc"]
    assert len(abc) == 1 and abc[0]["rank"] == 2  # first definition wins
    assert len({r["unit"] for r in rows}) == len(rows)
    # eow marker colliding with a merge product: base id wins
    df2 = spark.createDataFrame([(0, "</w </w")], "doc_id long, text string")
    collide2 = spark.createDataFrame(
        [(1, "<", "/"), (2, "</", "w"), (3, "</w", ">")],
        "rank long, lhs string, rhs string",
    ).withColumn("pair_count", F.lit(2).cast("long"))
    vocab2 = text.bpe_vocab(df2, F.col("text"), collide2, eow="</w>")
    marker = [r for r in vocab2.collect() if r["unit"] == "</w>"]
    assert len(marker) == 1 and marker[0]["source"] == "base"


def test_encode_subwords_zero_oov_on_corpus(spark):
    """The deployed-tokenizer contract: encoding the TRAINING corpus
    against the trainer-defined id space never hits OOV (bpe_vocab's
    closure property), ids stay inside [0, B+M), and text with a
    character OUTSIDE the training alphabet does produce OOV."""
    df = _bpe_ck_df(spark)
    mdf = text.bpe_train_merges(df, F.col("text"), 6)
    rules = text.collect_merges(mdf)
    vocab = text.bpe_vocab(df, F.col("text"), mdf)
    seg = text.bpe_segment(df, F.col("text"), F.col("doc_id"), rules)
    enc = text.encode_subwords(seg, vocab)
    rows = enc.collect()
    assert sum(r["n_oov"] for r in rows) == 0
    v = vocab.count()
    assert all(0 <= i < v for r in rows for i in r["ids"])
    # unseen character -> OOV
    alien = spark.createDataFrame([(99, "zebra# cat")], "doc_id long, text string")
    seg_a = text.bpe_segment(alien, F.col("text"), F.col("doc_id"), rules)
    assert text.encode_subwords(seg_a, vocab).collect()[0]["n_oov"] > 0


def test_tokenizer_stats_hand_checked_and_monotone(spark):
    """Fertility/compression metrics, hand-checked: 'aa aa b' with the
    single rule (a,a) segments to [aa, aa, b] — 3 words, 3 subwords,
    5 chars, fertility 1.0, chars/subword 5/3. With no rules every
    char is a unit (fertility 5/3). More merges never increase the
    training corpus's total subword count (merges only fuse)."""
    df = spark.createDataFrame([(0, "aa aa b")], "doc_id long, text string")
    got = text.tokenizer_stats(
        df, F.col("text"), F.col("doc_id"), [("a", "a")]
    ).collect()[0]
    assert (
        got["n_words"], got["n_subwords"], got["n_chars"],
        got["fertility"], got["chars_per_subword"],
    ) == (3, 3, 5, 1.0, round(5 / 3, 6))
    bare = text.tokenizer_stats(
        df, F.col("text"), F.col("doc_id"), []
    ).collect()[0]
    assert bare["n_subwords"] == 5 and bare["fertility"] == round(5 / 3, 6)
    # monotone on the training corpus
    corpus = _bpe_ck_df(spark)
    totals = []
    for m in (2, 6, 10):
        rules = text.collect_merges(
            text.bpe_train_merges(corpus, F.col("text"), m)
        )
        totals.append(
            text.tokenizer_stats(
                corpus, F.col("text"), F.col("doc_id"), rules
            ).agg(F.sum("n_subwords")).collect()[0][0]
        )
    assert totals == sorted(totals, reverse=True)


def test_bpe_checkpoint_resume_skips_uncommitted_step(spark, tmp_path):
    """A crash mid-checkpoint must never corrupt resume (ADVICE r11
    medium): a step whose merges table lacks its _SUCCESS commit
    marker — the exact state a crash between the words and merges
    writes leaves — is invisible to resume, which falls back to the
    previous intact step and retrains forward to the identical table;
    a marker-less words-only step dir (crash before merges even
    started) likewise."""
    import os
    import shutil

    df = _bpe_ck_df(spark)
    want = [
        tuple(r)
        for r in text.bpe_train_merges(df, F.col("text"), 6, impl="local")
        .orderBy("rank").collect()
    ]
    root = str(tmp_path / "bpe_crash")
    text.bpe_train_merges(
        df, F.col("text"), 6, checkpoint_path=root, checkpoint_every=2
    )
    # simulate a crash mid-step-6: merges committed but marker gone
    os.remove(f"{root}/step=6/merges/_SUCCESS")
    got = [
        tuple(r)
        for r in text.bpe_train_merges(
            df, F.col("text"), 6, checkpoint_path=root, checkpoint_every=2
        ).orderBy("rank").collect()
    ]
    assert got == want  # resumed from step=4, retrained 5..6
    # crash BEFORE merges: words-only step dir must also be skipped
    shutil.rmtree(f"{root}/step=6/merges")
    got2 = [
        tuple(r)
        for r in text.bpe_train_merges(
            df, F.col("text"), 6, checkpoint_path=root, checkpoint_every=2
        ).orderBy("rank").collect()
    ]
    assert got2 == want


def test_pq_checkpoint_resume_skips_uncommitted_step(spark, tmp_path):
    """Same crash discipline for the PQ trainer: a step dir without
    its parquet _SUCCESS marker is not resumable — the re-invocation
    recomputes it from the previous step instead of adopting the
    partially-written books."""
    import os

    rng = np.random.RandomState(41)
    vecs = rng.randn(60, 64)
    df = _emb_frame(spark, vecs)
    root = str(tmp_path / "pq_crash")
    want = sorted(
        map(tuple, similarity.pq_books_trained(df, iters=2).collect())
    )
    similarity.pq_books_trained(df, iters=2, checkpoint_path=root)
    os.remove(f"{root}/step=2/_SUCCESS")
    got = sorted(
        map(
            tuple,
            similarity.pq_books_trained(
                df, iters=2, checkpoint_path=root
            ).collect(),
        )
    )
    assert got == want


def test_ivfpq_residual_index_train_frac_threads_through(spark):
    """train_frac on the residual build must train on exactly the hash
    sample of the residual corpus (seeds and encode still full): equal
    to hand-building with pq_books_trained on the sampled residuals."""
    rng = np.random.RandomState(79)
    centers = rng.randn(5, 64) * 6
    vecs = np.stack([centers[i % 5] + rng.randn(64) for i in range(100)])
    df = _emb_frame(spark, vecs)
    auto_b, auto_l = similarity.ivfpq_residual_index(
        df, n_lists=5, iters=1, train_frac=0.5, train_salt="rtf"
    )
    # manual: same seeds, same residual corpus, sampled training
    from semantic_cpp_spark.pipeline import curation

    seeds = similarity._coarse_residuals(
        df, "vec_id", "embedding", 5, lo=5, hi=5 + similarity.PQ_K
    )
    ms = F.explode(F.sequence(F.lit(0), F.lit(similarity.PQ_M - 1))).alias("m")
    seed_books = seeds.select(F.col("vec_id").alias("c_id"), ms, "rv").select(
        "m", "c_id",
        F.slice(F.col("rv"), F.col("m") * 16 + 1, 16).alias("cv"),
    )
    corpus = similarity._coarse_residuals(df, "vec_id", "embedding", 5)
    manual = similarity.pq_books_trained(
        curation.bernoulli_sample(corpus, F.col("vec_id"), 0.5, "rtf"),
        id_col="vec_id", vec_col="rv", iters=1, seed_books=seed_books,
    )
    assert sorted(map(tuple, auto_b.collect())) == sorted(
        map(tuple, manual.collect())
    )
    # sampled books differ from full-corpus training (proper subset)
    full_b, _ = similarity.ivfpq_residual_index(df, n_lists=5, iters=1)
    assert sorted(map(tuple, auto_b.collect())) != sorted(
        map(tuple, full_b.collect())
    )
    # codes table still covers the whole corpus
    assert auto_l.select("vec_id").distinct().count() == 100


def test_aggregate_argmin_matches_window_argmin_with_ties(spark):
    """The r10 argmin/argmax rewrite (row_number window → map-side-
    combinable min/max(struct)) must be bit-identical INCLUDING ties:
    duplicated seed vectors make two centroids exactly equidistant from
    every point, so the (distance, c_id) tie-break is exercised for
    real. Pinned for ivf_assign (max-cosine), kmeans_assign
    (min-euclid), and pq_encode (per-subspace min)."""
    from pyspark.sql import Window as W
    from semantic_cpp_spark.pipeline import clustering

    rng = np.random.RandomState(83)
    vecs = rng.randn(40, 64)
    vecs[1] = vecs[0]  # centroids 0 and 1 identical -> every d2/cos ties
    vecs[3] = vecs[2]
    df = _emb_frame(spark, vecs)

    # ivf_assign vs inline window replay
    from semantic_cpp_spark.pipeline.clustering import _as_double, sq_dist
    from semantic_cpp_spark.pipeline.similarity import safe_cos

    e = df.select(F.col("vec_id"), _as_double(F.col("embedding")).alias("v"))
    cents = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("c_id"), F.col("v").alias("cv")
    )
    scored = e.crossJoin(F.broadcast(cents)).select(
        "vec_id", "c_id", safe_cos(F.col("v"), F.col("cv")).alias("ccos")
    )
    w = W.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("c_id"))
    want = {
        r["vec_id"]: r["c_id"]
        for r in scored.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") == 1)
        .collect()
    }
    got = {
        r["vec_id"]: r["centroid_id"]
        for r in similarity.ivf_assign(df, 0, n_centroids=5).collect()
    }
    assert got == want
    assert got[0] == 0 and got[1] == 0  # the tie resolved to smaller id

    # kmeans_assign vs inline window replay
    scored2 = e.crossJoin(F.broadcast(cents)).select(
        "vec_id", "c_id", sq_dist(F.col("v"), F.col("cv")).alias("d2")
    )
    w2 = W.partitionBy("vec_id").orderBy(F.col("d2"), F.col("c_id"))
    want2 = {
        (r["vec_id"], r["c_id"])
        for r in scored2.withColumn("__r", F.row_number().over(w2))
        .filter(F.col("__r") == 1)
        .collect()
    }
    got2 = {
        (r["vec_id"], r["c_id"])
        for r in clustering.kmeans_assign(df, k=5).collect()
    }
    assert got2 == want2

    # pq_encode vs inline window replay (per-subspace argmin)
    books = similarity.pq_books(df)
    sub = e.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(similarity.PQ_M - 1))).alias("m"),
        "v",
    ).select(
        "vec_id", "m",
        F.slice(F.col("v"), F.col("m") * 16 + 1, 16).alias("xv"),
    )
    sc3 = sub.join(F.broadcast(books), "m").select(
        "vec_id", "m", "c_id", sq_dist(F.col("xv"), F.col("cv")).alias("d2")
    )
    w3 = W.partitionBy("vec_id", "m").orderBy(F.col("d2"), F.col("c_id"))
    want3 = {
        (r["vec_id"], r["m"], r["c_id"])
        for r in sc3.withColumn("__r", F.row_number().over(w3))
        .filter(F.col("__r") == 1)
        .collect()
    }
    got3 = {
        (r["vec_id"], r["m"], r["code"])
        for r in similarity.pq_encode(df, books=books).collect()
    }
    assert got3 == want3


def test_bpe_roundtrip_hypothesis_unicode_words(spark):
    """Property: for ANY corpus of non-whitespace words (unicode
    included), training M merges and applying them round-trips every
    word — merges fuse adjacent symbols and can never drop, duplicate,
    or reorder characters. Exercises the symbol-string representation
    against multi-byte codepoints and regex metacharacters in words
    (the replace path is LITERAL, so '.', '*', '(' in text must be
    inert)."""
    from hypothesis import given, settings, strategies as st

    word = st.text(
        alphabet=st.characters(
            blacklist_categories=("Zs", "Zl", "Zp", "Cc", "Cs")
        ),
        min_size=1,
        max_size=8,
    )
    corpora = st.lists(
        st.lists(word, min_size=1, max_size=5), min_size=1, max_size=4
    )

    @settings(max_examples=8, deadline=None)
    @given(corpora)
    def check(docs):
        rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        merges = text.collect_merges(
            text.bpe_train_merges(df, F.col("text"), 3)
        )
        w = df.select(F.explode(text.tokens(F.col("text"))).alias("w"))
        chk = w.select(
            "w",
            F.array_join(text.bpe_apply(F.col("w"), merges), "").alias("rt"),
        ).collect()
        assert all(r["w"] == r["rt"] for r in chk), [
            (r["w"], r["rt"]) for r in chk if r["w"] != r["rt"]
        ][:3]

    check()


def test_bpe_segment_kernel_hypothesis_matches_serial_fold(spark):
    """Property: on ANY unicode corpus, segmenting with a table the
    serial Sennrich reference trained on that corpus must match an
    independently coded serial in-order fold word-for-word — the
    kernel's monotone-rank-floor search and the fold's rank-ordered
    replace-all are different algorithms that must agree on every
    trained table (and the corpus round-trips: subwords concatenate
    back to the original characters)."""
    from hypothesis import given, settings, strategies as st

    word = st.text(
        alphabet=st.characters(
            blacklist_categories=("Zs", "Zl", "Zp", "Cc", "Cs")
        ),
        min_size=1,
        max_size=8,
    )
    corpora = st.lists(
        st.lists(word, min_size=1, max_size=6), min_size=1, max_size=4
    )

    @settings(max_examples=8, deadline=None)
    @given(corpora)
    def check(docs):
        texts = [" ".join(ws) for ws in docs]
        learned = _py_bpe_reference(texts, 4)
        merges = [(lhs, rhs) for _, lhs, rhs, _ in learned]
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        got = dict(_seg_rows(df, merges, "kernel"))
        for i, t in enumerate(texts):
            want = " ".join(_py_fold_apply(w, merges) for w in t.split())
            assert got[i] == want, (t, got[i], want)
            assert got[i].replace(" ", "") == t.replace(" ", "")

    check()


def test_bpe_eow_variant_learns_suffix_units(spark):
    """The end-of-word marker (full Sennrich form): word-final
    characters merge with the marker, so the learned units distinguish
    suffixes from the same characters mid-word — here word-final 'e'
    ('the', 'whale') merges as 'e</w>' while mid-word 'e' ('theme')
    stays separate. Round-trip: concatenated symbols minus the marker
    rebuild the word; the marker must terminate every word's symbol
    sequence."""
    docs = [
        "the whale же the apple té",
        "theme these the whale née",
    ]
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="eow"):
        text.bpe_train_merges(df, F.col("text"), 2, eow="a b")
    m = text.bpe_train_merges(df, F.col("text"), 6, eow="</w>")
    merges = text.collect_merges(m)
    assert any(r.endswith("</w>") for _, r in merges)  # suffix units learned
    words = df.select(F.explode(text.tokens(F.col("text"))).alias("w"))
    chk = words.select(
        "w",
        text.bpe_apply(F.col("w"), merges, eow="</w>").alias("syms"),
    ).collect()
    for r in chk:
        syms = list(r["syms"])
        joined = "".join(syms)
        assert joined.endswith("</w>") and joined[: -len("</w>")] == r["w"]
    # the marker-free default is unchanged (the gated form)
    m0 = text.collect_merges(text.bpe_train_merges(df, F.col("text"), 3))
    assert all("</w>" not in l and "</w>" not in r for l, r in m0)



# -- decode_subwords: the tokenizer round-trip --------------------------------


def test_decode_subwords_round_trips_normalized_text(spark):
    from pyspark.sql import functions as F

    from semantic_cpp_spark.pipeline import text as T

    eow = "</w>"
    docs = spark.createDataFrame(
        [
            (0, "hey lo hey"),
            (1, "  spaced\tout\n text  "),
            (2, "solo"),
            (3, "lo lo lo hey"),
        ],
        "doc_id long, text string",
    )
    mdf = T.bpe_train_merges(docs, F.col("text"), 4, eow=eow)
    vocab = T.bpe_vocab(docs, F.col("text"), mdf, eow=eow)
    seg = T.bpe_segment(
        docs, F.col("text"), F.col("doc_id"), T.collect_merges(mdf), eow=eow
    )
    dec = T.decode_subwords(T.encode_subwords(seg, vocab), vocab, eow=eow)
    got = {r["doc_id"]: r["decoded"] for r in dec.collect()}
    norm = {
        r["doc_id"]: r["n"]
        for r in docs.select(
            "doc_id",
            F.regexp_replace(F.trim(F.col("text")), r"\s+", " ").alias("n"),
        ).collect()
    }
    assert got == norm


def test_decode_subwords_without_eow_returns_stream(spark):
    from pyspark.sql import functions as F

    from semantic_cpp_spark.pipeline import text as T

    docs = spark.createDataFrame([(0, "ab ab b")], "doc_id long, text string")
    mdf = T.bpe_train_merges(docs, F.col("text"), 1)
    vocab = T.bpe_vocab(docs, F.col("text"), mdf)
    seg = T.bpe_segment(
        docs, F.col("text"), F.col("doc_id"), T.collect_merges(mdf)
    )
    stream = seg.collect()[0]["subword_text"]
    dec = T.decode_subwords(T.encode_subwords(seg, vocab), vocab)
    assert dec.collect()[0]["decoded"] == stream


def test_decode_subwords_unknown_ids_surface_as_oov_char(spark):
    from pyspark.sql import functions as F

    from semantic_cpp_spark.pipeline import text as T

    vocab = spark.createDataFrame(
        [("a", 0), ("b", 1)], "unit string, token_id long"
    )
    enc = spark.createDataFrame(
        [(0, 3, 1, [0, -1, 1], "x")],
        "doc_id long, n_tokens long, n_oov long, ids array<long>, ids_fp string",
    )
    dec = T.decode_subwords(enc, vocab)
    assert dec.collect()[0]["decoded"] == "a \ufffd b"

"""Tests for the training-data pipeline layer: text analysis, dedup suite,
similarity search, multimodal plumbing — over the driver-generated
documents/embeddings tables plus controlled fixtures."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pyetl_spark.functions import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


# ------------------------------------------------------------------- text


def test_token_counts(spark):
    df = spark.createDataFrame([("a bb  ccc",), ("",), ("x9 y, z!",)], "t string")
    out = df.select(
        text.token_count(F.col("t")).alias("n"),
        text.bpe_ish_token_count(F.col("t")).alias("b"),
    ).collect()
    assert [r["n"] for r in out] == [3, 0, 3]
    assert [r["b"] for r in out] == [3, 0, 6]  # x,9,y,',',z,'!'


def test_quality_score_range(docs):
    out = docs.select(text.quality_score(F.col("text")).alias("q"))
    row = out.agg(F.min("q").alias("lo"), F.max("q").alias("hi")).first()
    assert 0.0 <= row["lo"] <= row["hi"] <= 1.0


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            ("the cat and the dog is in a house",),
            ("le chat et la maison est un lieu",),
            ("der hund und die katze ist ein tier",),
            ("zzz qqq www",),
        ],
        "t string",
    )
    got = [r[0] for r in df.select(text.lang_id(F.col("t"))).collect()]
    assert got == ["en", "fr", "de", "und"]


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame([("A  b\tC",), ("a b c",)], "t string")
    fps = [r[0] for r in df.select(text.fingerprint_md5(F.col("t"))).collect()]
    assert fps[0] == fps[1]


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a",)], "t string")
    out = [r[0] for r in df.select(text.word_shingles(F.col("t"), 2)).collect()]
    assert out[0] == ["a b", "b c", "c d"]
    assert out[1] == []
    ng = df.select(text.char_ngrams(F.col("t"), 3)).collect()[0][0]
    assert ng[:2] == ["a b", " b "]


# ------------------------------------------------------------------- dedup


@pytest.fixture(scope="module")
def dup_docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base.replace("lazy", "sleepy")  # 1 word differs
    other = "completely different content with nothing shared at all here today"
    return spark.createDataFrame(
        [
            (1, base),
            (2, base),  # exact dup of 1
            (3, near),  # near dup of 1
            (4, other),
            (5, base.upper()),  # exact dup after normalization
        ],
        "doc_id long, text string",
    )


def test_exact_dedup(dup_docs):
    groups = dedup.exact_dedup_groups(dup_docs).collect()
    assert len(groups) == 1
    assert groups[0]["keep_id"] == 1 and groups[0]["n_dups"] == 3
    kept = dedup.exact_dedup(dup_docs)
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3, 4]


def test_minhash_lsh_finds_near_dups(dup_docs):
    pairs = dedup.minhash_lsh_pairs(
        dup_docs, n_hashes=32, bands=16, k_shingle=2, threshold=0.5
    ).collect()
    got = {(r["a"], r["b"]) for r in pairs}
    assert (1, 2) in got and (1, 5) in got and (2, 5) in got  # exact dups
    assert (1, 3) in got or (2, 3) in got  # near dup found via banding
    for r in pairs:
        assert r["jaccard"] >= 0.5


def test_md5_shingle_arrow_parity(spark, sf_dir):
    """the Arrow fast path must produce byte-identical shingle-hash sets to
    the Column-expression md5 family on real corpus text (incl. edge rows:
    short docs, repeated words, punctuation)."""
    from pyspark.sql import functions as F

    from pyetl_spark.functions.text import word_shingle_hashes_md5

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(400)
    fast = dedup.shingle_sets(docs, "text", "doc_id", 3, "md5")
    col = docs.select(
        F.col("doc_id").alias("id"),
        F.array_sort(F.array_distinct(word_shingle_hashes_md5(F.col("text"), 3))).alias("sh"),
    )
    a = {r["id"]: list(r["sh"] or []) for r in fast.collect()}
    b = {r["id"]: list(r["sh"] or []) for r in col.collect()}
    assert a == b
    # synthetic edges: empty, whitespace-only, <k words, tabs/newlines, null
    edge = spark.createDataFrame(
        [(1, ""), (2, "   \t\n "), (3, "one two"), (4, "a\tb\nc  d"), (5, None),
         (6, "The QUICK the quick THE quick brown")],
        "doc_id long, text string",
    )
    fa = {r["id"]: list(r["sh"] or []) for r in dedup.shingle_sets(edge, "text", "doc_id", 3, "md5").collect()}
    fb = {
        r["id"]: list(r["sh"] or [])
        for r in edge.select(
            F.col("doc_id").alias("id"),
            F.array_sort(
                F.coalesce(
                    F.array_distinct(word_shingle_hashes_md5(F.col("text"), 3)),
                    F.array().cast("array<long>"),
                )
            ).alias("sh"),
        ).collect()
    }
    assert fa == fb


def test_ngram_jaccard_exact(dup_docs):
    pairs = dedup.ngram_jaccard_pairs(dup_docs, k_shingle=2, threshold=0.4)
    got = {(r["a"], r["b"]): r["jaccard"] for r in pairs.collect()}
    assert got[(1, 2)] == 1.0
    assert 0.4 <= got[(1, 3)] < 1.0
    assert (1, 4) not in got


def test_simhash_groups(dup_docs):
    groups = dedup.simhash_dup_groups(dup_docs).collect()
    assert any(g["n_dups"] >= 3 for g in groups)  # 1,2,5 share a sketch


def test_simhash_deterministic(dup_docs):
    a = {r["doc_id"]: r["simhash"] for r in dedup.simhash(dup_docs).collect()}
    b = {r["doc_id"]: r["simhash"] for r in dedup.simhash(dup_docs).collect()}
    assert a == b and a[1] == a[2]


# ---------------------------------------------------------------- similarity


def test_brute_force_topk_matches_numpy(embs):
    pdf = embs.toPandas()
    q = list(map(float, pdf.iloc[0]["embedding"]))
    mat = np.array([list(map(float, e)) for e in pdf["embedding"]])
    qv = np.array(q)
    cos = mat @ qv / (np.linalg.norm(mat, axis=1) * np.linalg.norm(qv) + 1e-12)
    order = np.lexsort((pdf["vec_id"], -np.round(cos, 6)))
    expected = list(pdf["vec_id"].iloc[order[:5]])

    got = [r["vec_id"] for r in similarity.brute_force_topk(embs, q, k=5).collect()]
    assert got == expected


def test_ann_recall(embs):
    pdf = embs.limit(1).toPandas()
    q = list(map(float, pdf.iloc[0]["embedding"]))
    exact = {r["vec_id"] for r in similarity.brute_force_topk(embs, q, k=10).collect()}
    approx = {r["vec_id"] for r in similarity.ann_topk(embs, q, k=10, bits=4).collect()}
    assert len(exact & approx) >= 5  # decent recall at tiny scale


def test_knn_join_blocked(embs):
    small = embs.limit(60)
    out = similarity.knn_join_blocked(small, small, k=3, bits=3)
    # scale shape: the bucket join must plan as an equi join on the
    # signature, never a nested loop (the O(L*R) anti-pattern)
    plan = out._jdf.queryExecution().executedPlan().toString()  # noqa: SLF001
    assert "BroadcastNestedLoopJoin" not in plan
    pdf = out.toPandas()
    assert (pdf.groupby("left_id")["rank"].max() <= 3).all()
    assert (pdf["left_id"] != pdf["right_id"]).all()


def test_embedding_near_dup_self(embs, spark):
    two = embs.limit(1)
    dup = two.withColumn("vec_id", F.col("vec_id") + 100000)
    both = two.unionByName(dup)
    pairs = similarity.embedding_near_dup_pairs(both, threshold=0.999, bits=4).collect()
    assert len(pairs) == 1 and pairs[0]["cos_sim"] >= 0.999


# ---------------------------------------------------------------- multimodal


def test_multimodal_pipeline(spark):
    media = multimodal.synthetic_media(spark, 50)
    feats = multimodal.extract_features(media)
    pdf = feats.toPandas()
    assert len(pdf) == 50
    assert (pdf["n_bytes"] > 0).all()
    assert pdf["features"].map(len).eq(16).all()
    # deterministic
    pdf2 = multimodal.extract_features(media).toPandas()
    assert list(pdf["sha256"]) == list(pdf2["sha256"])


def test_multimodal_stub_seam(spark):
    media = multimodal.synthetic_media(spark, 5)
    with pytest.raises(Exception):
        multimodal.extract_features(media, decode_stub=False).collect()


def test_bmp_codec_roundtrip():
    """pure-stdlib BMP codec: encode→decode is pixel-exact, including rows
    that need 4-byte padding (odd widths) and top-down files."""
    import numpy as np

    from pyetl_spark.functions import codecs

    rng = np.random.default_rng(7)
    for w, h in [(32, 24), (33, 5), (1, 1), (7, 3)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        payload = codecs.encode_bmp(px)
        assert codecs.is_bmp(payload)
        back = codecs.decode_bmp(payload)
        assert back.shape == (h, w, 3)
        assert (back == px).all()
    # nearest-neighbor resize: exact on integer upscale of a checkerboard
    small = np.zeros((2, 2, 3), dtype=np.uint8)
    small[0, 1] = small[1, 0] = 255
    big = codecs.resize_nearest(small, 4, 4)
    assert big.shape == (4, 4, 3)
    assert (big[0, 0] == 0).all() and (big[0, 2] == 255).all()
    feats = codecs.image_features(small, bins=16)
    assert len(feats) == 16 and abs(sum(feats) - 1.0) < 1e-9


def test_multimodal_real_bmp_path(spark):
    """decode_stub=False runs UN-stubbed on BMP payloads: true dimensions,
    pixel-derived features, and a real resample in resize_images."""
    media = multimodal.synthetic_bmp_media(spark, 12, width=32, height=24)
    feats = multimodal.extract_features(media, decode_stub=False).toPandas()
    assert len(feats) == 12
    assert (feats["width"] == 32).all() and (feats["height"] == 24).all()
    # features are an L1-normalized intensity histogram of REAL pixels
    assert feats["features"].map(lambda f: abs(sum(f) - 1.0) < 1e-6).all()

    resized = multimodal.resize_images(media, 8, 8, decode_stub=False)
    rfeats = multimodal.extract_features(resized, decode_stub=False).toPandas()
    assert (rfeats["width"] == 8).all() and (rfeats["height"] == 8).all()

    # deterministic generator → deterministic features
    feats2 = multimodal.extract_features(media, decode_stub=False).toPandas()
    assert list(feats["sha256"]) == list(feats2["sha256"])


def test_png_codec_roundtrip():
    """pure-stdlib PNG codec (zlib + chunk walk + scanline unfiltering):
    encode→decode is pixel-exact for every filter type (0-4) and for
    gray/RGB/RGBA; non-8-bit / interlaced / palette payloads raise."""
    import struct
    import zlib

    import numpy as np
    import pytest as _pytest

    from pyetl_spark.functions import codecs

    rng = np.random.default_rng(11)
    for shape in [(24, 32, 3), (5, 7, 3), (1, 1, 3), (8, 8, 1), (6, 9, 4)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for ft in range(5):
            payload = codecs.encode_png(px, filter_type=ft)
            assert codecs.is_png(payload)
            back = codecs.decode_png(payload)
            assert back.shape == shape
            assert (back == px).all()
    # the filters genuinely compress a gradient (i.e. they are not identity)
    grad = np.tile(np.arange(64, dtype=np.uint8), (32, 1))[:, :, None].repeat(3, axis=2)
    assert len(codecs.encode_png(grad, filter_type=1)) < len(codecs.encode_png(grad, filter_type=0)) / 2
    # unsupported layouts raise at the seam, never decode garbage
    bad_depth = codecs.encode_png(np.zeros((2, 2, 3), np.uint8))
    bad_depth = bad_depth.replace(b"IHDR" + struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0),
                                  b"IHDR" + struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
    with _pytest.raises(ValueError, match="8-bit"):
        codecs.decode_png(bad_depth)
    del zlib


def test_png_filter_fixtures_match_spec():
    """spec-anchored (PNG §9, not self-roundtrip) fixtures: hand-computed
    filtered bytes for known pixels — Sub subtracts the left pixel, Up the
    row above, Average their floor-mean, Paeth the nearest predictor. Both
    directions are checked: the encoder must EMIT these bytes, and a
    hand-built IDAT holding them must decode to the raw pixels."""
    import struct
    import zlib

    import numpy as np

    from pyetl_spark.functions import codecs

    px = np.array([[[10, 20, 30], [40, 60, 90]],
                   [[50, 25, 35], [45, 70, 200]]], dtype=np.uint8)
    # hand-computed per PNG spec (bpp=3):
    want = {
        0: [[10, 20, 30, 40, 60, 90], [50, 25, 35, 45, 70, 200]],
        1: [[10, 20, 30, 30, 40, 60], [50, 25, 35, 251, 45, 165]],   # x - left
        2: [[10, 20, 30, 40, 60, 90], [40, 5, 5, 5, 10, 110]],       # x - up
        # row0 avg: left only → x - left//2; row1: x - (left+up)//2
        3: [[10, 20, 30, 35, 50, 75], [45, 15, 20, 0, 28, 138]],
        # row0 paeth == sub; row1 x - paeth(left, up, upleft)
        4: [[10, 20, 30, 30, 40, 60], [40, 5, 5, 251, 10, 110]],
    }
    for ft, rows in want.items():
        payload = codecs.encode_png(px, filter_type=ft)
        # pull the IDAT back out and inflate: encoder side of the fixture
        pos, idat = 8, b""
        while pos + 8 <= len(payload):
            (ln,) = struct.unpack_from(">I", payload, pos)
            if payload[pos + 4 : pos + 8] == b"IDAT":
                idat += payload[pos + 8 : pos + 8 + ln]
            pos += 12 + ln
        stream = zlib.decompress(idat)
        got = [list(stream[1:7]), list(stream[8:14])]
        assert got == rows and stream[0] == stream[7] == ft, f"filter {ft}"
        # decoder side: the same bytes reconstruct the raw pixels
        assert (codecs.decode_png(payload) == px).all()


def test_multimodal_real_png_path(spark):
    """decode_stub=False runs UN-stubbed on PNG payloads: true dimensions
    from IHDR + inflate + unfilter (the generator cycles all 5 filter
    types), pixel-derived features, and a real PNG→PNG resample."""
    media = multimodal.synthetic_png_media(spark, 10, width=20, height=14)
    feats = multimodal.extract_features(media, decode_stub=False).toPandas()
    assert len(feats) == 10
    assert (feats["width"] == 20).all() and (feats["height"] == 14).all()
    assert feats["features"].map(lambda f: abs(sum(f) - 1.0) < 1e-6).all()

    resized = multimodal.resize_images(media, 8, 6, decode_stub=False)
    rp = resized.toPandas()
    assert all(bytes(p)[:8] == b"\x89PNG\r\n\x1a\n" for p in rp["payload"])
    rfeats = multimodal.extract_features(resized, decode_stub=False).toPandas()
    assert (rfeats["width"] == 8).all() and (rfeats["height"] == 6).all()


def test_frame_sampling(spark):
    media = multimodal.synthetic_media(spark, 60)
    frames = multimodal.sample_frames(media, every_n=8)
    pdf = frames.toPandas()
    assert (pdf["frame_idx"] % 8 == 0).all()


def test_wav_codec_roundtrip():
    """pure-stdlib WAV codec: encode→decode is sample-exact for mono and
    stereo; the chunk walker skips foreign chunks; features are physical."""
    import numpy as np

    from pyetl_spark.functions import codecs

    rng = np.random.default_rng(11)
    for shape in [(800,), (800, 1), (640, 2)]:
        s = rng.integers(-32768, 32767, size=shape, dtype=np.int16)
        payload = codecs.encode_wav(s, 8000)
        assert codecs.is_wav(payload)
        back, rate = codecs.decode_wav(payload)
        assert rate == 8000
        want = s[:, None] if s.ndim == 1 else s
        assert back.shape == want.shape and (back == want).all()

    # decoder must skip unknown RIFF chunks (e.g. LIST/INFO before fmt)
    s = rng.integers(-1000, 1000, size=(100,), dtype=np.int16)
    p = codecs.encode_wav(s, 8000)
    foreign = b"LIST" + (4).to_bytes(4, "little") + b"INFO"
    patched = p[:12] + foreign + p[12:]
    back, rate = codecs.decode_wav(patched)
    assert (back[:, 0] == s).all()

    # features: a pure 1 kHz sine at 8 kHz → energy concentrated in the
    # band containing 1 kHz (bin 4 of 16 over the 0-4 kHz half-spectrum)
    t = np.arange(8000) / 8000.0
    sine = (16000 * np.sin(2 * np.pi * 1000 * t)).astype(np.int16)
    af = codecs.audio_features(sine[:, None], 8000, bins=16)
    assert af["duration_ms"] == 1000
    assert abs(af["rms"] - 16000 / np.sqrt(2)) / af["rms"] < 0.01
    assert af["features"].index(max(af["features"])) == 4
    assert abs(sum(af["features"]) - 1.0) < 1e-9


def test_multimodal_real_wav_path(spark):
    """decode_stub=False runs UN-stubbed on WAV payloads: true frame counts,
    spectrum features, and real per-window RMS/ZCR rows."""
    media = multimodal.synthetic_wav_media(spark, 10, sample_rate=8000, duration_ms=250)
    feats = multimodal.extract_features(media, decode_stub=False).toPandas()
    assert len(feats) == 10
    assert (feats["n_frames"] == 2000).all()
    assert feats["width"].isna().all()
    assert feats["features"].map(lambda f: abs(sum(f) - 1.0) < 1e-6).all()

    wins = multimodal.sample_audio_windows(media, window_ms=50).toPandas()
    # 250 ms / 50 ms = 5 windows per clip
    assert len(wins) == 50
    assert set(wins["window_idx"]) == {0, 1, 2, 3, 4}
    assert (wins["start_ms"] % 50 == 0).all()
    # a sine+noise mix is never silent
    assert (wins["rms"] > 0).all()


def test_avi_codec_roundtrip():
    """pure-stdlib AVI codec: encode→decode is pixel-exact; the RIFF walker
    skips JUNK/idx1 chunks; frame pixel layout is byte-compatible with BMP."""
    import numpy as np
    import struct

    from pyetl_spark.functions import codecs

    rng = np.random.default_rng(13)
    frames = rng.integers(0, 256, size=(5, 12, 9, 3), dtype=np.uint8)
    payload = codecs.encode_avi(frames, fps=25)
    assert codecs.is_avi(payload)
    back, fps = codecs.decode_avi(payload)
    assert fps == 25 and back.shape == frames.shape and (back == frames).all()

    # RIFF size field is consistent (players trust it)
    assert struct.unpack_from("<I", payload, 4)[0] + 8 == len(payload)

    # decoder skips foreign chunks (JUNK padding is common in real files)
    junk = b"JUNK" + (4).to_bytes(4, "little") + b"\x00" * 4
    patched = payload[:12] + junk + payload[12:]
    back2, _ = codecs.decode_avi(patched)
    assert (back2 == frames).all()


def test_multimodal_real_avi_path(spark):
    """decode_stub=False runs UN-stubbed on AVI payloads: true dimensions and
    frame counts from extract_features, real per-frame rows with timestamps
    and histogram features from sample_frames."""
    media = multimodal.synthetic_avi_media(spark, 8, width=24, height=16, n_frames=12, fps=10)
    feats = multimodal.extract_features(media, decode_stub=False).toPandas()
    assert len(feats) == 8
    assert (feats["width"] == 24).all() and (feats["height"] == 16).all()
    assert (feats["n_frames"] == 12).all()
    assert feats["features"].map(lambda f: abs(sum(f) - 1.0) < 1e-6).all()

    frames = multimodal.sample_frames(media, every_n=5, decode_stub=False).toPandas()
    # 12 frames sampled every 5 → indices 0, 5, 10 per clip
    assert len(frames) == 24
    assert set(frames["frame_idx"]) == {0, 5, 10}
    # fps=10 → 100 ms per frame
    assert set(frames["ts_ms"]) == {0, 500, 1000}
    assert frames["features"].map(lambda f: abs(sum(f) - 1.0) < 1e-6).all()

    # the gradient ROLLS horizontally: every frame of a clip is a column
    # permutation of frame 0, so the histogram features are identical per
    # clip — real decode proves it, a fake decoder can't
    per_clip = frames.groupby("media_id")["features"].apply(
        lambda fs: max(max(abs(a - b) for a, b in zip(f, fs.iloc[0])) for f in fs)
    )
    assert (per_clip < 1e-9).all()


def test_simhash_near_dup_pairs(spark):
    """hamming-banded candidates + exact popcount verify == brute force."""
    import itertools

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank today"),
            (2, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
            (3, "the quick brown fox leaps over the lazy dog near the river bank today"),
            (4, "completely different text about spark structured streaming state stores"),
            (5, "another unrelated document discussing parquet bucketing and shuffles"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r["a"], r["b"]): r["hamming"]
        for r in dedup.simhash_near_dup_pairs(docs, max_hamming=3, bands=4).collect()
    }
    # brute-force mirror over the same sketches
    sk = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    want = {
        (a, b): bin((sk[a] ^ sk[b]) & (2**64 - 1)).count("1")
        for a, b in itertools.combinations(sorted(sk), 2)
        if bin((sk[a] ^ sk[b]) & (2**64 - 1)).count("1") <= 3
    }
    assert got == want and len(got) >= 1  # the near-identical docs pair up

    with pytest.raises(ValueError, match="pigeonhole"):
        dedup.simhash_near_dup_pairs(docs, max_hamming=4, bands=4)


def test_ivf_ann_recall_vs_brute_force(spark, sf_dir):
    """IVF (k-means cells + nprobe) finds most of the true top-k."""
    from pyetl_spark.functions import similarity as fsim

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = [float(x) for x in embs.filter("vec_id = 1").first()["embedding"]]

    cents = fsim.ivf_fit(embs, n_centroids=4, seed=42)
    assert len(cents) == 4 and len(cents[0]) == len(q)

    truth = {r["vec_id"] for r in fsim.brute_force_topk(embs, q, k=10).collect()}
    got = {r["vec_id"] for r in fsim.ivf_topk(embs, cents, q, k=10, nprobe=2).collect()}
    recall = len(truth & got) / len(truth)
    assert recall >= 0.6, recall

    # cells cover the space: every vector is assigned to a valid cell
    assigned = fsim.ivf_assign(embs, cents)
    n_cells = assigned.select("ivf_cell").distinct().count()
    assert 1 < n_cells <= 4
    assert assigned.filter("ivf_cell < 0 OR ivf_cell > 3").count() == 0


# ------------------------------------------------------------- components
def _uf_mirror(edges):
    """sequential union-find mirror: {node: min id of its component}."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_connected_components_shapes(spark):
    """path (worst case for naive propagation), star, cycle, two cliques,
    singleton-free pairs — all against the union-find mirror."""
    from pyetl_spark.functions.components import connected_components

    cases = [
        [(i, i + 1) for i in range(12)],                       # path 0..12
        [(0, i) for i in range(1, 8)],                          # star at 0
        [(i, (i + 1) % 6) for i in range(6)],                   # cycle
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 10), (20, 21)],  # forest
        [(5, 5), (3, 4)],                                       # self-loop ignored
    ]
    for edges in cases:
        df = spark.createDataFrame(edges, "a long, b long")
        got = {
            (r["id"], r["component"])
            for r in connected_components(df).collect()
        }
        mirror = _uf_mirror([(a, b) for a, b in edges if a != b])
        assert got == set(mirror.items()), edges


def test_connected_components_empty(spark):
    from pyetl_spark.functions.components import connected_components

    df = spark.createDataFrame([], "a long, b long")
    assert connected_components(df).count() == 0


def test_dedup_by_components_end_to_end(spark):
    """pairs from two overlapping near-dup clusters collapse to one
    representative each; untouched docs pass through."""
    from pyetl_spark.functions.components import dedup_by_components

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(10)], "doc_id long, text string"
    )
    # cluster {1,2,3} discovered as chained pairs (1-2, 2-3: transitive!),
    # cluster {7,8}; docs 0,4,5,6,9 unique
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)], "a long, b long")
    kept = sorted(r["doc_id"] for r in dedup_by_components(docs, pairs).collect())
    assert kept == [0, 1, 4, 5, 6, 7, 9]

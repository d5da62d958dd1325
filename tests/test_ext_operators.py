"""EXT operator tests beyond the oracle: MinHash recall vs exact Jaccard,
SimHash sanity, ANN recall vs brute force, multimodal batch plumbing."""

from __future__ import annotations

from pyspark.sql import functions as F

from dumpty_spark.operators import dedup as D
from dumpty_spark.operators import multimodal as M
from dumpty_spark.operators import similarity as S
from dumpty_spark.sources import load_table


def _pair_set(df):
    return {(r["a_id"], r["b_id"]) for r in df.collect()}


def test_minhash_recall_vs_exact(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    exact = _pair_set(D.jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.8))
    assert exact, "fixture should contain planted near-dups"
    mh = _pair_set(
        D.minhash_lsh_pairs(docs, "doc_id", "text", num_hashes=32, bands=8, threshold=0.8)
    )
    # verification step makes precision exact; banding gives high recall
    assert mh.issubset(exact)
    recall = len(mh & exact) / len(exact)
    assert recall >= 0.9, f"minhash recall {recall}: {exact - mh}"


def test_simhash_finds_near_dups(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents")
    exact = _pair_set(D.jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.9))
    sh = _pair_set(D.simhash_pairs(docs, "doc_id", "text", max_hamming=3))
    # simhash(hamming≤3) should recover most ≥0.9-Jaccard pairs
    if exact:
        recall = len(sh & exact) / len(exact)
        assert recall >= 0.7, f"simhash recall {recall}"


def test_dedup_keep_first_deterministic(spark, sf_smoke):
    ev = load_table(spark, sf_smoke, "events")
    out = D.dedup_keep_first(ev, ["user_id", "event_type"], ["ts", "event_id"])
    n_groups = ev.select("user_id", "event_type").distinct().count()
    assert out.count() == n_groups
    # re-running yields identical representatives
    again = D.dedup_keep_first(ev, ["user_id", "event_type"], ["ts", "event_id"])
    assert sorted(out.collect()) == sorted(again.collect())


def test_ann_recall_vs_brute_force(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < 20)
    exact = {
        (r["q_id"], r["n_id"])
        for r in S.brute_force_topk(emb, queries, k=5).collect()
    }
    ann = {
        (r["q_id"], r["n_id"])
        for r in S.ann_lsh_topk(emb, queries, k=5, num_hash_tables=4).collect()
    }
    recall = len(ann & exact) / len(exact)
    assert recall >= 0.8, f"ANN recall {recall}"


def test_multimodal_decode_exact_values(spark, sf_smoke):
    import hashlib

    docs = load_table(spark, sf_smoke, "documents").limit(20)
    out = M.decode_features(M.attach_blob(docs)).collect()
    assert len(out) == 20
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in out:
        raw = texts[r["doc_id"]].encode("utf-8")
        assert r["n_bytes"] == len(raw)
        assert r["sha256"] == hashlib.sha256(raw).hexdigest()
        assert r["head_hex"] == raw[:8].hex()
        assert r["fake_embedding"] == [x / 255.0 for x in raw[:8]]


def test_real_codec_is_gated():
    """Formats with no built-in parser (e.g. GIF) still raise the
    documented NotImplementedError without Pillow; a TRUNCATED stream of
    a known format is a data error (ValueError), not a missing codec."""
    import pytest

    if not M.HAS_IMAGE_CODEC:
        with pytest.raises(NotImplementedError):
            M.real_decode(b"GIF89a" + bytes(16))
        with pytest.raises(ValueError):
            M.real_decode(b"\x89PNG\r\n\x1a\n")  # signature, no IHDR
    else:  # pragma: no cover - runs only where Pillow is installed
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (4, 3)).save(buf, format="PNG")
        meta = M.real_decode(buf.getvalue())
        assert (meta["width"], meta["height"]) == (4, 3)
        assert meta["format"] == "png"


def test_builtin_codec_jpeg_png_headers_roundtrip():
    """Round-4 E5 gap close: the pure-Python SOF/IHDR parsers recover
    exact dimensions from real JPEG/PNG marker streams — including
    multi-segment JPEGs where SOF is not the first marker."""
    for w, h in [(1, 1), (16, 9), (640, 480), (40000, 2)]:
        meta = M.real_decode(M.encode_jpeg_header(w, h))
        assert meta == {
            "width": w, "height": h, "mode": "RGB", "format": "jpeg",
        }
        meta = M.real_decode(M.encode_png_header(w, h))
        assert meta == {
            "width": w, "height": h, "mode": "RGB", "format": "png",
        }


def test_builtin_codec_jpeg_marker_walk():
    """The SOF scan must skip over standalone markers and unknown
    segments rather than assuming SOF comes right after APP0."""
    import struct

    base = M.encode_jpeg_header(12, 34)
    # splice an extra COM segment between APP0 and SOF0
    sof_at = base.index(b"\xff\xc0")
    comment = b"\xff\xfe" + struct.pack(">H", 9) + b"padding"
    spliced = base[:sof_at] + comment + base[sof_at:]
    meta = M.real_decode(spliced)
    assert (meta["width"], meta["height"]) == (12, 34)


def test_builtin_codec_ppm_roundtrip():
    """The REAL decode branch executes in-sandbox: encode_ppm → real_decode
    recovers exact dimensions, no image library required."""
    for w, h, seed in [(1, 1, 0), (7, 3, 42), (16, 9, 250)]:
        meta = M.real_decode(M.encode_ppm(w, h, seed=seed))
        assert meta == {"width": w, "height": h, "mode": "RGB", "format": "ppm"}


def test_builtin_codec_ppm_header_grammar():
    """PNM header parsing handles comments and arbitrary whitespace; P5
    graymap reports mode L."""
    blob = b"P6 # comment\n# another\n 12\t34\n255\n" + bytes(12 * 34 * 3)
    assert M.real_decode(blob) == {
        "width": 12, "height": 34, "mode": "RGB", "format": "ppm"
    }
    gray = b"P5\n5 4\n255\n" + bytes(20)
    assert M.real_decode(gray)["mode"] == "L"
    assert M.real_decode(gray)["format"] == "pgm"


def test_builtin_codec_bmp_roundtrip():
    """encode_bmp → real_decode (pure-Python BITMAPINFOHEADER parse),
    incl. top-down (negative-height) files and the compressed-BMP gate."""
    import struct

    for w, h in [(5, 3), (4, 4), (10, 1)]:  # incl. a width needing row pad
        meta = M.real_decode(M.encode_bmp(w, h, seed=9))
        assert meta == {"width": w, "height": h, "mode": "RGB", "format": "bmp"}
    # top-down variant: negate the height field at offset 22
    blob = bytearray(M.encode_bmp(6, 2))
    struct.pack_into("<i", blob, 22, -2)
    assert M.real_decode(bytes(blob))["height"] == 2
    # BI_RLE8 compression must refuse, not mis-parse
    blob = bytearray(M.encode_bmp(6, 2))
    struct.pack_into("<I", blob, 30, 1)
    import pytest

    with pytest.raises(NotImplementedError, match="compressed BMP"):
        M.real_decode(bytes(blob))


def test_decode_images_real_branch(spark):
    """decode_images runs the REAL branch end-to-end on Spark: synthetic
    PPM blobs through Arrow-batched mapInPandas, decoded dims match the
    id-derived arithmetic. No skip, no stub."""
    docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
    out = {r["doc_id"]: r for r in M.decode_images(M.attach_image_blob(docs)).collect()}
    assert len(out) == 12
    for i in range(12):
        r = out[i]
        assert (r["width"], r["height"]) == (4 + i % 13, 3 + i % 7)
        assert (r["mode"], r["format"]) == ("RGB", "ppm")


def test_decode_images_surfaces_codec_gate(spark):
    """An unreadable blob format surfaces the codec probe error through
    the mapInPandas path (NotImplementedError without Pillow)."""
    import pytest

    docs = spark.createDataFrame([(1, "img-bytes")], "doc_id long, text string")
    blobs = M.attach_blob(docs)
    if not M.HAS_IMAGE_CODEC:
        with pytest.raises(Exception, match="no image codec"):
            M.decode_images(blobs).collect()
    else:  # pragma: no cover
        with pytest.raises(Exception):
            M.decode_images(blobs).collect()


def test_srp_near_dup_planted(spark):
    """SRP-LSH candidate path: planted near-identical vectors (tiny noise)
    must all be found; unrelated random vectors must not pass verify."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=(20, 32))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, v.tolist()))
        if i < 8:  # plant a near-dup of the first 8: id 100+i
            rows.append((100 + i, (v + rng.normal(scale=0.01, size=32)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {
        (r["a_id"], r["b_id"])
        for r in D.embedding_near_dup_pairs(
            df, "vec_id", "embedding", threshold=0.95
        ).collect()
    }
    assert pairs == {(i, 100 + i) for i in range(8)}


def test_embedding_blocked_equals_srp_on_high_threshold(spark, sf_smoke):
    """On real fixture data both candidate strategies agree after exact
    verify at a threshold where SRP recall is ~1."""
    emb = load_table(spark, sf_smoke, "embeddings")
    blocked = {
        (r["a_id"], r["b_id"])
        for r in D.embedding_near_dup_pairs(
            emb, threshold=0.9, block_col="label"
        ).collect()
    }
    srp = {
        (r["a_id"], r["b_id"])
        for r in D.embedding_near_dup_pairs(emb, threshold=0.9).collect()
    }
    # srp is unblocked so it may see cross-label pairs too
    assert blocked.issubset(srp)


def test_ivf_recall_vs_brute_force(spark, sf_smoke):
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r["q_id"], r["n_id"])
        for r in S.brute_force_topk(emb, queries, k=5).collect()
    }
    ivf = {
        (r["q_id"], r["n_id"])
        for r in S.ann_ivf_topk(emb, queries, k=5, nlist=8, nprobe=4).collect()
    }
    recall = len(ivf & exact) / len(exact)
    assert recall >= 0.5, f"ivf recall@5 {recall}"
    # probing every cell must be exhaustive -> identical to brute force
    full = {
        (r["q_id"], r["n_id"])
        for r in S.ann_ivf_topk(emb, queries, k=5, nlist=8, nprobe=8).collect()
    }
    assert full == exact


def test_resize_stub_shapes(spark, sf_smoke):
    docs = load_table(spark, sf_smoke, "documents").limit(20)
    out = M.resize_stub(M.attach_blob(docs), out_w=8, out_h=8).collect()
    assert len(out) == 20
    for r in out:
        assert len(r["resized"]) == 64 and r["out_w"] == 8 and r["out_h"] == 8


def test_frame_sample_exact(spark):
    """1→N fan-out with exactly the frames a driver-side slicer produces."""
    import hashlib

    text = "x" * 1500  # 5 full 256-byte frames + tail
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        (r["frame_idx"], r["frame_bytes"], r["frame_sha256"])
        for r in M.frame_sample(M.attach_blob(df), every=2).collect()
    )
    b = text.encode()
    want = sorted(
        (fi, 256, hashlib.sha256(b[fi * 256 : (fi + 1) * 256]).hexdigest())
        for fi in range(0, 5, 2)
    )
    assert rows == want


def test_ivf_index_at_rest_prunes_partitions(spark, sf_smoke, tmp_path):
    """ivf_build writes the corpus partitioned by cell; ivf_search must
    (a) return the same results as the in-flight IVF with the same
    centroids, and (b) read only the probed cells — the scan's
    PartitionFilters prove files outside them are never touched."""
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    idx = str(tmp_path / "ivf")
    S.ivf_build(emb, idx, nlist=8)

    out = S.ivf_search(spark, idx, queries, k=5, nprobe=4)
    got = {(r["q_id"], r["n_id"]) for r in out.collect()}
    flight = {
        (r["q_id"], r["n_id"])
        for r in S.ann_ivf_topk(emb, queries, k=5, nlist=8, nprobe=4).collect()
    }
    assert got == flight and len(got) == 50

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "c_id" in plan

    # exhaustive probing over the at-rest index == brute force
    full = S.ivf_search(spark, idx, queries, k=5, nprobe=8)
    exact = {
        (r["q_id"], r["n_id"])
        for r in S.brute_force_topk(emb, queries, k=5).collect()
    }
    assert {(r["q_id"], r["n_id"]) for r in full.collect()} == exact


def test_connected_components_chain_and_clique(spark):
    """A 4-chain, a 3-clique, and an isolated edge: every node must get
    the min id of its transitive component, independent of which side of
    an edge it appears on."""
    from dumpty_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),      # chain: component {1,2,3,4}
         (10, 11), (11, 12), (10, 12),  # clique: {10,11,12}
         (21, 20)],                     # reversed edge: {20,21}
        ["a_id", "b_id"],
    )
    got = {
        (r["id"], r["cluster_id"])
        for r in connected_components(edges).collect()
    }
    want = {(1, 1), (2, 1), (3, 1), (4, 1),
            (10, 10), (11, 10), (12, 10),
            (20, 20), (21, 20)}
    assert got == want


def test_connected_components_long_chain(spark):
    """A 30-node path: the worst case for plain min propagation
    (diameter 29); pointer jumping must still resolve every node to the
    chain head within the iteration cap."""
    from dumpty_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 130)], ["a_id", "b_id"]
    )
    got = {
        (r["id"], r["cluster_id"])
        # driver_max_edges=0 forces the distributed min-label loop, so
        # the pointer-jumping path stays covered alongside the
        # small-graph union-find regime
        for r in connected_components(edges, max_iter=10, driver_max_edges=0).collect()
    }
    assert got == {(i, 100) for i in range(100, 131)}


def test_incremental_dedup_across_runs(spark, tmp_path):
    """Three batches against one store: batch 1 keeps one doc per
    distinct content (min id); batch 2 drops everything already seen and
    admits only genuinely new content; re-submitting batch 1 verbatim
    admits nothing."""
    from dumpty_spark.operators.dedup import incremental_dedup

    store = str(tmp_path / "fpstore")
    b1 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta"), (3, "gamma delta")],
        ["doc_id", "text"],
    )
    got1 = sorted(r["doc_id"] for r in incremental_dedup(spark, b1, store).collect())
    assert got1 == [1, 3]

    b2 = spark.createDataFrame(
        [(4, "ALPHA   beta!"),   # normalizes to seen content
         (5, "epsilon zeta"),
         (6, "epsilon zeta")],   # intra-batch dup of 5
        ["doc_id", "text"],
    )
    got2 = sorted(r["doc_id"] for r in incremental_dedup(spark, b2, store).collect())
    assert got2 == [5]

    got3 = [r["doc_id"] for r in incremental_dedup(spark, b1, store).collect()]
    assert got3 == []

    # NULL text is one content group: admitted once, then never again
    # (the anti-join must be null-safe — plain equality would re-admit
    # null-fingerprint docs on every run)
    n1 = spark.createDataFrame([(7, None), (8, None)], "doc_id long, text string")
    gotn = sorted(r["doc_id"] for r in incremental_dedup(spark, n1, store).collect())
    assert gotn == [7]
    n2 = spark.createDataFrame([(9, None)], "doc_id long, text string")
    assert incremental_dedup(spark, n2, store).collect() == []


def test_lsh_index_at_rest_prunes_partitions(spark, sf_smoke, tmp_path):
    """lsh_build writes (vector, bucket) rows partitioned by bucket key;
    lsh_search must (a) return exactly what the in-flight SRP-LSH
    returns with the same seed/shape, and (b) read only probed buckets
    (PartitionFilters on bkey in the physical plan)."""
    emb = load_table(spark, sf_smoke, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    idx = str(tmp_path / "lsh")
    S.lsh_build(emb, idx, bits=16, num_hash_tables=4)

    out = S.lsh_search(spark, idx, queries, k=5)
    got = {(r["q_id"], r["n_id"]) for r in out.collect()}
    flight = {
        (r["q_id"], r["n_id"])
        for r in S.ann_lsh_topk(
            emb, queries, k=5, bits=16, num_hash_tables=4
        ).collect()
    }
    assert got == flight and len(got) == 50

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bkey" in plan


def test_incremental_near_dedup_across_runs(spark, tmp_path):
    """MinHash store across three submissions: batch-internal near-dups
    collapse to the smallest id; a later batch is suppressed by history
    via the signature estimator WITHOUT rereading any earlier text;
    resubmitting a batch admits nothing. The store keeps sketches only."""
    import os

    from dumpty_spark.operators.dedup import incremental_near_dedup

    store = str(tmp_path / "mhstore")
    base = " ".join(f"w{i}" for i in range(60))
    near1 = base.replace("w30", "x30")     # ~0.90 true Jaccard vs base
    other = " ".join(f"z{i}" for i in range(60))
    b1 = spark.createDataFrame(
        [(1, base), (2, near1), (3, other)], ["doc_id", "text"]
    )
    got1 = sorted(
        r["doc_id"] for r in incremental_near_dedup(spark, b1, store).collect()
    )
    assert got1 == [1, 3]

    near2 = base.replace("w10", "y10")     # near-dup of HISTORY doc 1
    fresh = " ".join(f"q{i}" for i in range(60))
    b2 = spark.createDataFrame(
        [(4, base), (5, near2), (6, fresh)], ["doc_id", "text"]
    )
    got2 = sorted(
        r["doc_id"] for r in incremental_near_dedup(spark, b2, store).collect()
    )
    assert got2 == [6]

    assert incremental_near_dedup(spark, b2, store).collect() == []

    # store layout: prefix-partitioned band rows + flat signature rows
    assert any(
        d.startswith("_pfx=") for d in os.listdir(os.path.join(store, "bands"))
    )
    assert os.path.isdir(os.path.join(store, "sigs"))


def test_redact_pii_edges(spark):
    """PII scrub: multiple hits per doc, placeholders inserted in place,
    clean text untouched, NULL passes through."""
    from pyspark.sql import functions as F

    from dumpty_spark.functions.text import pii_counts, redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b-c@x.io and d@y.co.uk now"),
            (2, "call +1-555-0001 or +44-123-9999"),
            (3, "nothing to hide"),
            (4, None),
        ],
        ["id", "t"],
    )
    ne, np_ = pii_counts("t")
    out = {
        r["id"]: (r["r"], r["ne"], r["np"])
        for r in df.select(
            "id", redact_pii("t").alias("r"), ne.alias("ne"), np_.alias("np")
        ).collect()
    }
    assert out[1] == ("mail [EMAIL] and [EMAIL] now", 2, 0)
    assert out[2] == ("call [PHONE] or [PHONE]", 0, 2)
    assert out[3] == ("nothing to hide", 0, 0)
    assert out[4] == (None, None, None)


def test_duplicated_spans_known_corpus(spark):
    """Hand-built corpus: docs 1 and 2 share a 10-word passage (one
    merged span of 10 tokens each), doc 3 repeats an 8-gram internally
    twice (both starts flagged, merged into one island), doc 4 is
    unique, doc 5 is shorter than one gram."""
    from dumpty_spark.operators.dedup import duplicated_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rep8 = "one two three four five six seven eight"
    rows = [
        (1, f"{shared} unique tail for doc one"),
        (2, f"front matter here {shared}"),
        (3, f"{rep8} filler filler2 filler3 {rep8}"),
        (4, "totally unique words nothing repeated anywhere at all ok"),
        (5, "too short"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["id"]: (
            r["n_dup_spans"], r["dup_tokens"], r["n_tokens"], r["dup_fraction"]
        )
        for r in duplicated_spans(df, "doc_id", "text", k=8).collect()
    }
    # docs 1/2: starts 1..3 of the 10-token shared passage are duplicated
    # -> one island covering 10 tokens
    assert got[1] == (1, 10, 15, round(10 / 15, 6))
    assert got[2] == (1, 10, 13, round(10 / 13, 6))
    # doc 3: the 8-gram at starts 1 and 12 -> gap 11 > k -> two spans
    assert got[3] == (2, 16, 19, round(16 / 19, 6))
    assert got[4] == (0, 0, 9, 0.0)
    assert got[5] == (0, 0, 2, 0.0)

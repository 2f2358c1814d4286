"""Training-data operator tests: dedup family, similarity search,
multimodal plumbing, streaming extraction."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_exact_dedup(spark, docs):
    from cuphic_spark.operators.dedup import exact_dedup_groups

    corpus = docs.unionByName(docs.where(F.col("doc_id") % 5 == 0))
    groups = exact_dedup_groups(corpus).collect()
    n_even = docs.where(F.col("doc_id") % 5 == 0).count()
    assert len(groups) == n_even
    assert all(g.n_copies == 2 for g in groups)


def test_minhash_lsh_finds_planted_neardup(spark, docs):
    from cuphic_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    base = docs.limit(20).select("doc_id", "text")
    # plant a near-duplicate: doc_id+10000, one word appended
    dup = base.select((F.col("doc_id") + 10000).alias("doc_id"),
                      F.concat("text", F.lit(" tail")).alias("text"))
    corpus = base.unionByName(dup)
    pairs = minhash_lsh_pairs(corpus, k=3, n_hashes=8, band_size=2)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    planted = {(i, i + 10000) for i in
               [r.doc_id for r in base.collect()]}
    # banding with 4 bands of 2 should catch most planted pairs
    assert len(got & planted) >= len(planted) * 0.6
    # verification stage: planted pairs have very high jaccard
    verified = ngram_jaccard_pairs(
        corpus, pairs.where(F.col("doc_b") - F.col("doc_a") == 10000))
    assert all(r.jaccard_milli > 800 for r in verified.collect())


def test_simhash_near_for_neardups(spark, docs):
    from cuphic_spark.operators.dedup import simhash64

    base = docs.limit(10).select("doc_id", "text")
    dup = base.select((F.col("doc_id") + 10000).alias("doc_id"),
                      F.concat("text", F.lit(" x")).alias("text"))
    sims = {r.doc_id: r.simhash
            for r in simhash64(base.unionByName(dup)).collect()}
    for i in list(sims):
        if i < 10000:
            d = bin((sims[i] ^ sims[i + 10000]) & ((1 << 64) - 1)).count("1")
            assert d <= 16  # near-dup -> small hamming distance


def test_cosine_vs_quantized_agree_on_top1(spark, emb):
    from cuphic_spark.operators.similarity import (
        cosine_topk,
        inner_product_topk_quantized,
    )

    queries = (emb.where(F.col("vec_id") < 2)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q_embedding")))
    cos = {(r.query_id, r.rank): r.neighbor_id
           for r in cosine_topk(emb, queries, k=3).collect()}
    quant = {(r.query_id, r.rank): r.neighbor_id
             for r in inner_product_topk_quantized(emb, queries, k=3)
             .collect()}
    # different metrics (cosine vs MIPS) but on near-unit random
    # embeddings the top-1 should usually coincide
    agree = sum(cos[(q, 1)] == quant[(q, 1)] for q in (0, 1))
    assert agree >= 1


def test_ivf_topk_subset_of_brute(spark, emb):
    from cuphic_spark.operators.similarity import cosine_topk, ivf_topk

    queries = (emb.where(F.col("vec_id") == 0)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q_embedding")))
    brute = [r.neighbor_id for r in
             cosine_topk(emb, queries, k=50).collect()]
    ivf = [r.neighbor_id for r in
           ivf_topk(emb, queries, k=10, bits=4).collect()]
    # pruned search returns a (possibly partial) subset of the true
    # neighborhood — recall against brute top-50 should be decent
    assert len(ivf) > 0
    assert len(set(ivf) & set(brute)) / len(ivf) >= 0.2


def test_multimodal_real_decode(spark):
    """WAV and PPM payloads decode FOR REAL (stdlib wave + numpy):
    features match the synthesis closed forms; resize is a true
    area-average re-encoded as PPM; only codec-requiring formats
    (the video rows) fall back to the seeded fake / strict raise."""
    import math

    import numpy as np

    from cuphic_spark.operators.multimodal import (
        decode_pnm,
        extract_features,
        resize_images,
        sample_frames,
        synth_media,
    )

    media = synth_media(spark, 30).cache()
    feats = {r.media_id: r for r in extract_features(media).collect()}
    assert len(feats) == 30
    assert all(len(r.feature) == 8 for r in feats.values())

    for mid, r in feats.items():
        if r.kind == "audio":
            assert r.format == "wav"
            dur, rms, zcr, peak, b0, b1, b2, b3 = r.feature
            freq = 220 + (mid % 8) * 110
            dur_ms = 50 + (mid * 37) % 200
            assert abs(dur - (8000 * dur_ms // 1000) / 8000) < 1e-6
            assert abs(rms - 0.5 / math.sqrt(2)) < 0.01   # sine RMS
            assert abs(zcr - 2 * freq / 8000) < 0.02      # sine ZCR
            assert b0 > 0.9  # 220-990 Hz lives in band [0, 1kHz)
        elif r.kind == "image" and mid % 5 == 0:
            # every fifth image is a 4:2:0 + restart-interval JPEG,
            # decoded FOR REAL through the from-scratch codec: the
            # recovered dimensions are exact, the channel stats only
            # quantization/subsampling-loose
            assert r.format == "jpeg"
            w, h, aspect, m0, m1, m2, std, _ = r.feature
            assert (w, h) == (24 + (mid % 7) * 5, 20 + (mid % 11) * 3)
            assert abs(m0 - 0.5) < 0.06
            assert abs(m2 - (mid % 256) / 255.0) < 0.06
        elif r.kind == "image" and mid % 5 == 2:
            # ids % 15 == 12 are PNGs through the from-scratch zlib
            # codec — LOSSLESS, so the recovered stats are exact
            assert r.format == "png"
            w, h, aspect, m0, m1, m2, std, _ = r.feature
            assert (w, h) == (18 + (mid % 6) * 7, 14 + (mid % 4) * 5)
            assert abs(m2 - (mid % 256) / 255.0) < 0.005  # constant B
        elif r.kind == "image" and mid % 5 == 4:
            # ids % 15 == 9 are ANIMATED GIFs through the
            # from-scratch LZW codec — lossless; the spare feature
            # slot carries the real frame count
            assert r.format == "gif"
            w, h, aspect, m0, m1, m2, std, n_frames = r.feature
            assert (w, h) == (22 + (mid % 7) * 4, 16 + (mid % 5) * 4)
            assert n_frames == 3
            assert abs(m2 - (mid % 256) / 255.0) < 0.005  # constant B
        elif r.kind == "image":
            assert r.format == "ppm"
            w, h, aspect, m0, m1, m2, std, _ = r.feature
            assert (w, h) == (16 + (mid % 5) * 8, 12 + (mid % 3) * 8)
            assert abs(m0 - 0.5) < 0.05  # x-gradient mean ~127.5/255
            assert abs(m2 - (mid % 256) / 255.0) < 0.01  # constant B
        else:
            assert r.format == "fake"

    # determinism
    feats2 = {r.media_id: r.feature
              for r in extract_features(media).collect()}
    assert {m: r.feature for m, r in feats.items()} == feats2

    frames = sample_frames(media, every_ms=1000)
    assert frames.where(F.col("frame_ts_ms") % 1000 != 0).count() == 0

    # REAL resize: output is a decodable PPM at the target width with
    # aspect kept; a constant-color source stays constant
    resized = {r.media_id: r for r in
               resize_images(media, width=16).collect()}
    for mid, r in resized.items():
        img = decode_pnm(bytes(r.resized))
        assert img.shape[1] == 16 == r.out_width
        if mid % 5 == 0:  # jpeg source: exact dims, lossy channels
            src_w, src_h = 24 + (mid % 7) * 5, 20 + (mid % 11) * 3
        elif mid % 5 == 2:  # png source: lossless real decode
            src_w, src_h = 18 + (mid % 6) * 7, 14 + (mid % 4) * 5
        elif mid % 5 == 4:  # gif source: first frame, real decode
            src_w, src_h = 22 + (mid % 7) * 4, 16 + (mid % 5) * 4
        else:
            src_w, src_h = 16 + (mid % 5) * 8, 12 + (mid % 3) * 8
        assert img.shape[0] == r.out_height == max(1, round(
            src_h * 16 / src_w))
        if mid % 5 == 0:
            assert np.abs(img[:, :, 2].astype(int)
                          - mid % 256).max() <= 16
        else:
            assert (img[:, :, 2] == mid % 256).all()  # constant B

    # strict mode: only the codec-requiring rows raise (executor-side)
    video = media.where(F.col("kind") == "video")
    with pytest.raises(Exception, match="NotImplementedError|requires"):
        extract_features(video, deterministic_fake=False).collect()
    # wav/ppm rows decode fine even in strict mode
    ok = extract_features(media.where(F.col("kind") != "video"),
                          deterministic_fake=False).count()
    assert ok == 20


def test_streaming_extraction(spark, tmp_path):
    from cuphic_spark.sources.tei import tei_pages
    from cuphic_spark.streaming.pages_stream import (
        read_pages_stream,
        run_to_sink,
        streaming_extract,
        windowed_page_counts,
    )

    src = str(tmp_path / "pages_in")
    tei_pages(spark).write.parquet(src)

    stream = read_pages_stream(spark, src, max_files_per_trigger=2)
    assert stream.isStreaming

    q = run_to_sink(streaming_extract(stream), str(tmp_path / "out"),
                    str(tmp_path / "chk"))
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 12  # all TEI pages extracted through the stream

    # windowed agg compiles and is streaming (smoke: plan only)
    win = windowed_page_counts(stream)
    assert win.isStreaming


def test_lsh_recall_math_and_presets():
    """Round-4 verdict item 3: the 1-(1-s^r)^b recall helper, its
    knee, and the documented production presets — pure math, pinned
    against hand-computed values."""
    import pytest as _pytest

    from cuphic_spark.operators.dedup import (
        LSH_PRESETS,
        lsh_recall,
        lsh_threshold,
    )

    # hand-computed: toy (8,2) b=4: 1-(1-0.64)^4
    assert abs(lsh_recall(0.8, 8, 2) - (1 - 0.36 ** 4)) < 1e-12
    # production (128,8) b=16 at the dedup point
    assert abs(lsh_recall(0.8, 128, 8)
               - (1 - (1 - 0.8 ** 8) ** 16)) < 1e-12
    assert 0.94 < lsh_recall(0.8, 128, 8) < 0.96
    assert lsh_recall(0.5, 128, 8) < 0.07  # steep cutoff below knee
    # knee: recall at the threshold is ~1-1/e
    for nh, bs in ((8, 2), (128, 8), (128, 4)):
        knee = lsh_threshold(nh, bs)
        assert 0.0 < knee < 1.0
        assert 0.5 < lsh_recall(knee, nh, bs) < 0.75
        # monotone in s
        assert lsh_recall(knee - 0.1, nh, bs) < lsh_recall(knee, nh, bs) \
            < lsh_recall(min(knee + 0.1, 1.0), nh, bs)
    # presets are internally consistent with the docstring table
    assert LSH_PRESETS["toy"] == {"n_hashes": 8, "band_size": 2}
    assert abs(lsh_threshold(**LSH_PRESETS["web_08"]) - 0.707) < 0.01
    assert abs(lsh_threshold(**LSH_PRESETS["web_05"]) - 0.420) < 0.01
    for p in LSH_PRESETS.values():
        assert p["n_hashes"] % p["band_size"] == 0
    with _pytest.raises(ValueError, match="multiple"):
        lsh_recall(0.5, 10, 4)

    # the config chooser recovers the documented web preset at the
    # 0.8 dedup point, always meets the recall floor, and refuses
    # unreachable asks loudly
    from cuphic_spark.operators.dedup import lsh_pick_config

    assert lsh_pick_config(0.8) == LSH_PRESETS["web_08"]
    for s in (0.5, 0.6, 0.7, 0.9):
        cfg = lsh_pick_config(s, min_recall=0.9)
        assert lsh_recall(s, **cfg) >= 0.9
        assert lsh_threshold(**cfg) < s  # knee below the target
    with _pytest.raises(ValueError, match="raise"):
        lsh_pick_config(0.3, min_recall=0.999, max_hashes=8)


def test_minhash_lsh_hot_band_star_capped(spark):
    """Hot-band guard: a degenerate band value (here: 300 identical
    docs — every band collides) must emit O(n) star pairs to the
    bucket representative, never the O(n^2) all-pairs blowup; small
    buckets (the real LSH signal) are unaffected."""
    from cuphic_spark.operators.dedup import minhash_lsh_pairs

    boiler = "the same boilerplate text repeated for every document here"
    rows = [(i, boiler) for i in range(300)]
    rows += [(1000, "unique alpha beta gamma delta epsilon zeta"),
             (1001, "unique alpha beta gamma delta epsilon zeta eta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    pairs = minhash_lsh_pairs(docs, k=3, n_hashes=8, band_size=2,
                              max_bucket=50)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    hot = {p for p in got if p[1] < 1000}
    star = {(0, i) for i in range(1, 300)}
    assert hot == star  # bounded: rep-star, not 300*299/2 pairs
    assert (1000, 1001) in got  # small-bucket near-dup still found

    # guard off: the same hot bucket IS quadratic (documented contract)
    full = minhash_lsh_pairs(docs, k=3, n_hashes=8, band_size=2,
                             max_bucket=0)
    n_hot_full = full.where(F.col("doc_b") < 1000).count()
    assert n_hot_full == 300 * 299 // 2


def test_dedup_clusters_transitive_chains(spark, docs):
    """Near-dup RESOLUTION must merge transitively: a chain
    base ~ base+' tail' ~ base+' tail tail' is ONE cluster labeled by
    the min doc_id, even if LSH misses some individual pair."""
    from cuphic_spark.operators.dedup import (
        connected_components,
        dedup_clusters,
    )

    base = docs.limit(12).select("doc_id", "text")
    d1 = base.select((F.col("doc_id") + 10000).alias("doc_id"),
                     F.concat("text", F.lit(" tail")).alias("text"))
    d2 = base.select((F.col("doc_id") + 20000).alias("doc_id"),
                     F.concat("text", F.lit(" tail tail")).alias("text"))
    corpus = base.unionByName(d1).unionByName(d2)
    comp = {r.doc_id: r.component for r in dedup_clusters(corpus).collect()}
    ids = [r.doc_id for r in base.collect()]
    hits = 0
    for i in ids:
        trio = [i, i + 10000, i + 20000]
        if all(t in comp for t in trio):
            assert len({comp[t] for t in trio}) == 1, trio
            assert comp[i] == min(c for d, c in comp.items()
                                  if comp[d] == comp[i])
            hits += 1
    assert hits >= len(ids) * 0.8  # LSH recall on planted chains

    # pure-graph sanity: a 5-long path converges past one round
    path = spark.createDataFrame([(i, i + 1) for i in range(5)],
                                 "doc_a long, doc_b long")
    cc = {r.node: r.component
          for r in connected_components(path).collect()}
    assert set(cc.values()) == {0} and len(cc) == 6


def test_simhash_pairs_hamming_ball(spark, docs):
    """Chunk-pigeonhole pairing has FULL recall within the hamming
    ball: every planted one-word-appended near-dup within distance 3
    must appear with its exact distance."""
    from cuphic_spark.operators.dedup import simhash64, simhash_pairs

    base = docs.limit(15).select("doc_id", "text")
    dup = base.select((F.col("doc_id") + 10000).alias("doc_id"),
                      F.concat("text", F.lit(" x")).alias("text"))
    corpus = base.unionByName(dup)
    sims = {r.doc_id: r.simhash for r in simhash64(corpus).collect()}
    got = {(r.doc_a, r.doc_b): r.hamming
           for r in simhash_pairs(corpus, max_hamming=3).collect()}
    for i in [r.doc_id for r in base.collect()]:
        d = bin((sims[i] ^ sims[i + 10000]) & ((1 << 64) - 1)).count("1")
        if d <= 3:  # pigeonhole guarantee applies
            assert got[(i, i + 10000)] == d, (i, d)
    assert all(h <= 3 for h in got.values())


def test_repetition_and_tfidf(spark):
    """Repetition fractions on a hand-computable corpus (spam doc
    spikes, natural text sits low, 1-word doc reports 0 bigram) and
    TF-IDF top-k with deterministic lexicographic tie-break."""
    from cuphic_spark.operators.textstats import (
        repetition_stats,
        top_terms_tfidf,
    )

    docs = spark.createDataFrame(
        [(1, "buy now buy now buy now"),
         (2, "the quick brown fox jumps over the lazy dog"),
         (3, "solo")],
        "doc_id long, text string")
    rep = {r.doc_id: (r.n_words, r.top_word_permille,
                      r.top_bigram_permille)
           for r in repetition_stats(docs).collect()}
    assert rep[1] == (6, 500, 600)   # 3x 'buy'/6; 3x 'buy now'/5
    assert rep[2] == (9, 222, 125)   # 2x 'the'/9; all bigrams once
    assert rep[3] == (1, 1000, 0)

    top = top_terms_tfidf(docs, k=2).collect()
    by_doc = {}
    for r in top:
        by_doc.setdefault(r.doc_id, []).append((r.rank, r.term))
    # doc 1: buy/now tie on score -> lexicographic
    assert by_doc[1] == [(1, "buy"), (2, "now")]
    # doc 3: 'solo' unique to it -> max idf, rank 1
    assert by_doc[3][0][1] == "solo"
    # deterministic across runs
    assert top == top_terms_tfidf(docs, k=2).collect()


def test_warc_reader_writer(spark):
    """WARC container: roundtrip under per-record gzip, plain, and
    whole-file gzip; non-response records skipped by the Spark face;
    identical inputs produce identical bytes (gzip mtime pinned to
    0); chunked transfer-encoding decodes (incl. the no-space header
    spelling); truncated gzip members and invalid chunk framing fail
    loudly."""
    import gzip as _gzip

    import pytest as _pytest

    from cuphic_spark.sources.warc import (
        dechunk,
        encode_chunked,
        extract_http_payload,
        iter_warc_records,
        read_warc,
        write_warc,
    )

    recs = [(f"https://h{i}.example/doc/{i}",
             f"2026-08-{1 + i % 28:02d}T00:00:00Z",
             f"<doc><p>page {i}</p></doc>".encode())
            for i in range(7)]
    plain = write_warc(recs, per_record_gzip=False)
    for data in (write_warc(recs), plain, _gzip.compress(plain)):
        got = [(h["warc-target-uri"], h["warc-date"],
                extract_http_payload(b))
               for h, b in iter_warc_records(data)]
        assert got == [(u, d, p) for u, d, p in recs]

    # a request record interleaved between responses is skipped by
    # read_warc but seen by the raw iterator
    req = (b"WARC/1.0\r\nWARC-Type: request\r\n"
           b"WARC-Target-URI: https://h0.example/doc/0\r\n"
           b"Content-Length: 4\r\n\r\nGET!\r\n\r\n")
    mixed = _gzip.compress(req) + write_warc(recs[:2])
    assert len(list(iter_warc_records(mixed))) == 3
    files = spark.createDataFrame([(bytearray(mixed),)],
                                  "content binary")
    rows = read_warc(files).orderBy("url").collect()
    assert [(r.url, bytes(r.html)) for r in rows] == [
        (recs[0][0], recs[0][2]), (recs[1][0], recs[1][2])]
    assert rows[0].warc_ts == recs[0][1]

    with _pytest.raises(ValueError, match="gzip"):
        list(iter_warc_records(write_warc(recs)[:-9]))

    # byte determinism: the gzip member header must not carry a
    # wall-clock mtime (task-retry byte-identity contract)
    import time as _time
    a = write_warc(recs)
    _time.sleep(1.1)
    assert write_warc(recs) == a

    # chunked transfer-encoding: roundtrip through the writer's
    # chunked framing, both header spellings, extension tolerated
    chunked = write_warc(recs, chunk=7)
    got = [(h["warc-target-uri"], extract_http_payload(b))
           for h, b in iter_warc_records(chunked)]
    assert got == [(u, p) for u, _d, p in recs]
    body = encode_chunked(b"hello world payload", 5)
    assert dechunk(body) == b"hello world payload"
    assert extract_http_payload(
        b"HTTP/1.1 200 OK\r\nTransfer-Encoding:chunked\r\n\r\n"
        + body) == b"hello world payload"   # no space after colon
    assert dechunk(b"5;ext=1\r\nabcde\r\n0\r\n\r\n") == b"abcde"
    # invalid framing refuses loudly, by name
    with _pytest.raises(ValueError, match="chunk size"):
        dechunk(b"zz\r\nabc\r\n0\r\n\r\n")
    with _pytest.raises(ValueError, match="truncated"):
        dechunk(b"a\r\nshort\r\n")
    with _pytest.raises(ValueError, match="CRLF after chunk"):
        dechunk(b"3\r\nabcXX0\r\n\r\n")


def test_gopher_quality_rules(spark):
    """Each Gopher rule flips the pass flag in isolation: a
    compliant base doc passes; bullet-dominated lines, ellipsis-
    heavy line endings, symbol floods, alpha-poor words, and missing
    stop words each fail their own rule."""
    from cuphic_spark.operators.textstats import gopher_quality

    base = ("the quick brown fox jumps over the lazy dog and that "
            "fox would have run with more speed if it could be fast")
    docs = spark.createDataFrame(
        [(1, base),                                   # passes
         (2, "- a\n- b\n- c\n- d\n- e\n- f\n- g\n- h\n- i\n- j"),
         (3, base + "\nx...\ny...\nz..."),            # >30% ellipsis
         (4, base + " " + "# " * 10),                 # symbol ratio
         (5, "12 34 " * 20 + "the be"),               # alpha-poor
         (6, "word " * 30 + "tail"),                  # no stop words
         (7, "a b")],                                 # too short
        "doc_id long, text string")
    got = {r.doc_id: r.asDict() for r in gopher_quality(
        docs, min_words=5).collect()}
    assert got[1]["gopher_pass"] == 1
    assert got[2]["n_bullet_lines"] == 10
    assert got[2]["gopher_pass"] == 0
    assert got[3]["n_ellipsis_lines"] == 3
    assert got[3]["gopher_pass"] == 0
    assert got[4]["n_symbols"] == 10
    assert got[4]["gopher_pass"] == 0
    assert got[5]["gopher_pass"] == 0                 # <80% alpha
    assert got[6]["n_stopwords"] == 0
    assert got[6]["gopher_pass"] == 0
    assert got[7]["n_words"] == 2
    assert got[7]["gopher_pass"] == 0
    # stop-word count is DISTINCT presence, not occurrences
    assert got[1]["n_stopwords"] >= 5


def test_pii_scrub_and_chunking(spark):
    """PII redaction edge cases (adjacent PII, no PII, email with
    digits the IP pass must not re-mangle) and chunking invariants
    (full coverage, overlap arithmetic, short docs yield one chunk,
    stride validation)."""
    import pytest as _pytest

    from cuphic_spark.operators.textstats import chunk_text, scrub_pii

    docs = spark.createDataFrame(
        [(1, "a1b2@x9.io 1.2.3.4 +12 345-67890 tail"),
         (2, "nothing sensitive"),
         (3, "ver 1.2.3.4.5 stays partly"),  # 5 octets: first 4 match
         (4, None)],                          # null text -> flag False
        "doc_id long, text string")
    got = {r.doc_id: (r.scrubbed, r.pii_found)
           for r in scrub_pii(docs).collect()}
    assert got[1] == ("<EMAIL> <IP> <PHONE> tail", True)
    assert got[2] == ("nothing sensitive", False)
    assert got[3][0] == "ver <IP>.5 stays partly"
    assert got[4] == (None, False)
    # the regex chain must be evaluated ONCE per row: exactly one
    # chain of the 3 patterns in the optimized plan, not two
    plan = scrub_pii(docs)._jdf.queryExecution() \
        .optimizedPlan().toString()
    assert plan.count("regexp_replace") == 3

    words = " ".join(f"w{i}" for i in range(23))
    d = spark.createDataFrame([(1, words), (2, "short doc"), (3, "")],
                              "doc_id long, text string")
    rows = chunk_text(d, max_words=10, stride=7).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.chunk_id] = r.chunk
    # 23 words @ (10, 7): chunks at 0,7,14 -> 1+ceil(13/7)=3 chunks
    assert sorted(by_doc[1]) == [0, 1, 2]
    assert by_doc[1][0].split(" ") == [f"w{i}" for i in range(10)]
    assert by_doc[1][1].split(" ") == [f"w{i}" for i in range(7, 17)]
    assert by_doc[1][2].split(" ") == [f"w{i}" for i in range(14, 23)]
    # every word is covered by the union of chunks
    assert set(words.split()) == {
        w for c in by_doc[1].values() for w in c.split(" ")}
    assert by_doc[2] == {0: "short doc"}
    assert by_doc[3] == {0: ""}          # empty doc: kept, not lost
    with _pytest.raises(ValueError, match="stride"):
        chunk_text(d, max_words=10, stride=0)


def test_winnowing_shared_run_guarantee(spark):
    """Winnowing's core property (Schleimer et al.): documents
    sharing a run of >= w + k - 1 words share at least one selected
    fingerprint HASH; and selection density is ~2/(w+1)."""
    from cuphic_spark.operators.textstats import winnow_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"  # 6 = w + k - 1
    rows = [
        (1, "one two three " + shared + " four five six"),
        (2, "seven eight " + shared + " nine ten eleven twelve"),
        (3, "totally different words with no overlap at all here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fp = winnow_fingerprints(docs, k=3, w=4)
    by_doc = {}
    for r in fp.collect():
        by_doc.setdefault(r.doc_id, set()).add(r.gram_hash)
    assert by_doc[1] & by_doc[2]          # the guarantee
    assert not (by_doc[1] & by_doc[3])
    # density: far fewer fingerprints than grams
    n_grams_1 = len(rows[0][1].split()) - 2
    assert len(by_doc[1]) <= n_grams_1 * 0.75


def test_ivf_indexed_prunes_partitions_and_matches(spark, emb, tmp_path):
    """The persisted IVF index must (a) return exactly what the
    in-memory ivf_topk returns and (b) physically read ONLY the
    probed cell directories (partition pruning, via inputFiles)."""
    import os

    from cuphic_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk,
        ivf_topk_indexed,
    )

    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, bits=4)
    n_cells_total = sum(1 for d in os.listdir(path)
                        if d.startswith("cell="))

    queries = (emb.where(F.col("vec_id") < 2)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q_embedding")))
    got = ivf_topk_indexed(spark, path, queries, k=5, bits=4)
    want = {(r.query_id, r.rank): (r.neighbor_id, r.cos_micro)
            for r in ivf_topk(emb, queries, k=5, bits=4).collect()}
    got_rows = {(r.query_id, r.rank): (r.neighbor_id, r.cos_micro)
                for r in got.collect()}
    assert got_rows == want

    # the physical scan must carry a PartitionFilter on cell (the
    # probe set), i.e. only probed directories are read. inputFiles()
    # reports the UNPRUNED file index, so assert on the executed plan.
    import re

    from cuphic_spark.plans import executed_plan

    m = re.search(r"PartitionFilters: \[cell[^\]]*IN \(([^)]*)\)",
                  executed_plan(got))
    assert m, "no cell PartitionFilter in the probe scan"
    pruned_to = len(m.group(1).split(","))
    # 2 queries x (1 own + 4 neighbor) cells, deduped — far fewer
    # than the index's cell count
    assert pruned_to <= 10 < n_cells_total


def test_simhash_pairs_hot_chunk_star_capped(spark):
    """Hot-chunk guard (round-3 verdict item 3): a degenerate chunk
    value (here: 200 identical docs — every chunk collides) must emit
    O(n) star pairs to the bucket representative, never the O(n^2)
    all-pairs blowup; small buckets keep full in-ball recall."""
    from cuphic_spark.operators.dedup import simhash_pairs

    boiler = "identical boilerplate words for every single document"
    rows = [(i, boiler) for i in range(200)]
    rows += [(1000, "unique alpha beta gamma delta epsilon zeta eta"),
             (1001, "unique alpha beta gamma delta epsilon zeta")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    pairs = simhash_pairs(docs, max_hamming=3, max_bucket=50)
    got = {(r.doc_a, r.doc_b): r.hamming for r in pairs.collect()}
    hot = {p for p in got if p[1] < 1000}
    # identical docs -> identical simhash -> every star pair verifies
    # at hamming 0, so the capped bucket yields exactly the rep star
    assert hot == {(0, i) for i in range(1, 200)}
    assert all(got[p] == 0 for p in hot)
    # the small bucket (two near-dup uniques) is unaffected — same
    # result as with the guard off
    small_on = {p: h for p, h in got.items() if p[0] >= 1000}
    full = simhash_pairs(docs, max_hamming=3, max_bucket=0)
    small_off = {(r.doc_a, r.doc_b): r.hamming
                 for r in full.collect() if r.doc_a >= 1000}
    assert small_on == small_off

    # guard off: the hot bucket IS quadratic (documented contract)
    n_hot_full = full.where(F.col("doc_b") < 1000).count()
    assert n_hot_full == 200 * 199 // 2


def test_connected_components_nonconvergence_raises(spark):
    """Advisor round-3: a component whose diameter exceeds max_iter
    must fail LOUDLY instead of silently returning split clusters."""
    import pytest as _pytest

    from cuphic_spark.operators.dedup import connected_components

    chain = spark.createDataFrame([(i, i + 1) for i in range(9)],
                                  "doc_a long, doc_b long")

    def persistent_ids():
        jsc = spark.sparkContext._jsc
        return {int(i) for i in
                jsc.getPersistentRDDs().keySet().toArray()}

    before = persistent_ids()
    with _pytest.raises(ValueError, match="did not converge"):
        connected_components(chain, max_iter=3)
    # advisory pin: the raise path must free the last round's
    # localCheckpoint blocks, not leak them into the block manager
    assert persistent_ids() == before
    # enough rounds: one component labeled by the min node
    cc = {r.node: r.component
          for r in connected_components(chain, max_iter=15).collect()}
    assert set(cc.values()) == {0} and len(cc) == 10


def test_connected_components_free_callback_releases_blocks(spark):
    """Advisory pin: the result derives from the final round's
    localCheckpoint, which df.unpersist() cannot release — both
    component algorithms expose free_components() for callers done
    with the labels, and calling it empties the leaked set."""
    from cuphic_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    def persistent_ids():
        jsc = spark.sparkContext._jsc
        return {int(i) for i in
                jsc.getPersistentRDDs().keySet().toArray()}

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long")
    for algo in (connected_components, connected_components_star):
        before = persistent_ids()
        out = algo(edges)
        got = {r.node: r.component for r in out.collect()}
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}
        assert persistent_ids() - before  # checkpoint blocks live
        out.free_components()
        assert persistent_ids() == before  # and released on demand

    # star raise path frees its checkpoint too (max_iter=0 can never
    # converge, so it must raise without leaking the initial edges)
    import pytest as _pytest

    before = persistent_ids()
    with _pytest.raises(ValueError, match="did not converge"):
        connected_components_star(edges, max_iter=0)
    assert persistent_ids() == before


def test_ivf_trained_centroids_beat_sign_cells(spark, tmp_path):
    """Round-4 verdict item 5: a k-means-trained coarse quantizer on
    a PLANTED clustered corpus must reach recall@5 (vs brute-force
    cosine) at least as high as the sign-cell baseline, training must
    be deterministic, and the probed plan must keep the literal
    partition-filter shape."""
    import re

    import numpy as np

    from cuphic_spark.operators.similarity import (
        build_ivf_index,
        cosine_topk,
        ivf_topk_indexed,
        train_ivf_centroids,
    )
    from cuphic_spark.plans import executed_plan

    # planted corpus: 8 tight clusters whose centers all sit in the
    # all-positive orthant — sign cells collapse to ONE cell is
    # avoided by jitter, but they cannot separate the clusters, while
    # k-means recovers them
    rng = np.random.default_rng(42)
    centers = rng.uniform(0.2, 1.0, (8, 12))
    vecs = []
    for i in range(320):
        c = centers[i % 8]
        vecs.append((i, (c + rng.normal(0, 0.03, 12)).tolist()))
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")

    cents = train_ivf_centroids(emb, n_cells=8, max_iter=6)
    cents2 = train_ivf_centroids(emb, n_cells=8, max_iter=6)
    assert np.array_equal(cents, cents2)  # deterministic training

    queries = (emb.where(F.col("vec_id") < 6)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q_embedding")))
    brute = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(emb, queries, k=5).collect()}

    p_sign = str(tmp_path / "ivf_sign")
    p_km = str(tmp_path / "ivf_km")
    build_ivf_index(emb, p_sign, bits=4)
    build_ivf_index(emb, p_km, centroids=cents)

    sign_hits = {(r.query_id, r.neighbor_id) for r in
                 ivf_topk_indexed(spark, p_sign, queries, k=5,
                                  bits=4).collect()}
    km = ivf_topk_indexed(spark, p_km, queries, k=5, n_probe=2)
    km_hits = {(r.query_id, r.neighbor_id) for r in km.collect()}
    r_sign = len(sign_hits & brute) / len(brute)
    r_km = len(km_hits & brute) / len(brute)
    assert r_km >= r_sign, (r_km, r_sign)
    assert r_km >= 0.9  # tight planted clusters: near-exact recall
    # plan shape preserved: literal cell IN-list partition filter
    assert re.search(r"cell#\d+L? IN(SET| \()", executed_plan(km))


def test_ivf_indexed_probe_cap_falls_back(spark, emb, tmp_path):
    """Round-3 verdict item 4: above max_probe_cells the driver-side
    cell collect is skipped and the probe becomes a plain equi-join on
    cell — results identical to the literal-partition-filter path."""
    from cuphic_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk_indexed,
    )
    from cuphic_spark.plans import executed_plan

    path = str(tmp_path / "ivf_cap")
    build_ivf_index(emb, path, bits=4)
    queries = (emb.where(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").alias("q_embedding")))

    pruned = ivf_topk_indexed(spark, path, queries, k=5, bits=4)
    capped = ivf_topk_indexed(spark, path, queries, k=5, bits=4,
                              max_probe_cells=1)  # force the fallback
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    assert sorted(map(lambda r: (key(r), r.neighbor_id, r.cos_micro),
                      capped.collect())) == \
        sorted(map(lambda r: (key(r), r.neighbor_id, r.cos_micro),
                   pruned.collect()))
    # the fallback plan must NOT carry the driver-collected literal
    # cell IN-list (runtime/dynamic pruning from the join is fine)
    import re

    # (Catalyst renders short lists as `IN (...)`, longer as `INSET`)
    assert not re.search(r"cell#\d+L? IN(SET| \()", executed_plan(capped))
    assert re.search(r"cell#\d+L? IN(SET| \()", executed_plan(pruned))


def test_connected_components_star_deep_chain(spark):
    """Large-star/small-star must resolve a 300-hop chain in O(log n)
    alternating rounds — the graph shape where min-label propagation
    (one hop per round) would need 299 rounds and loudly refuses."""
    from cuphic_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    chain = spark.createDataFrame([(i, i + 1) for i in range(299)],
                                  "doc_a long, doc_b long")
    got = {r.node: r.component
           for r in connected_components_star(chain).collect()}
    assert set(got.values()) == {0} and len(got) == 300
    with _pytest_raises_nonconverge():
        connected_components(chain, max_iter=5)


def _pytest_raises_nonconverge():
    import pytest as _pytest

    return _pytest.raises(ValueError, match="did not converge")


def test_connected_components_star_matches_label(spark):
    """Star contraction and min-label propagation are the same
    operator: identical (node, component) output on a random graph
    with multiple components, self-loops, and isolated pairs."""
    import random

    from cuphic_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(11)
    edges = {(rng.randrange(200), rng.randrange(200))
             for _ in range(150)}
    edges |= {(500, 501), (600, 600)}  # isolated pair + self-loop
    df = spark.createDataFrame(sorted(edges), "doc_a long, doc_b long")
    star = {(r.node, r.component)
            for r in connected_components_star(df).collect()}
    label = {(r.node, r.component)
             for r in connected_components(df, max_iter=100).collect()}
    assert star == label


def test_jpeg_codec_roundtrip_and_pipeline(spark):
    """From-scratch baseline JPEG codec (ITU T.81 subset, pure
    numpy): encode->decode roundtrips within quantization error,
    deterministic bytes, grayscale support, loud refusal of
    non-baseline streams — and the Spark multimodal paths (feature
    extraction, resize) decode it for real."""
    import numpy as np

    from cuphic_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from cuphic_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_pnm,
        extract_features,
        resize_images,
        sniff_format,
    )

    w, h = 48, 36
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([xx * 255 // (w - 1), yy * 255 // (h - 1),
                    np.full((h, w), 77)], axis=-1).astype(np.uint8)
    for q, bound in ((95, 4), (85, 8), (60, 12)):
        data = encode_jpeg(img, quality=q)
        assert sniff_format(data) == "jpeg"
        out = decode_jpeg(data)
        assert out.shape == img.shape
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.max() <= bound, (q, err.max())
    assert encode_jpeg(img, 85) == encode_jpeg(img, 85)  # deterministic

    # high-frequency content pins the dequant ORDERING: multiplying
    # zigzag-ordered coefficients by the natural-order quant table
    # roundtrips smooth gradients fine but explodes on noise (mean
    # error ~39 with the bug vs ~3 correct) and checkerboards
    rng = np.random.default_rng(5)
    noise = rng.integers(0, 256, (24, 40, 3)).astype(np.uint8)
    nerr = np.abs(decode_jpeg(encode_jpeg(noise, 95)).astype(int)
                  - noise.astype(int))
    assert nerr.mean() < 6 and nerr.max() < 40, (nerr.mean(), nerr.max())
    cb = ((yy + xx) % 2 * 255).astype(np.uint8)
    cb3 = np.stack([cb, cb, cb], axis=-1)
    cerr = np.abs(decode_jpeg(encode_jpeg(cb3, 95)).astype(int)
                  - cb3.astype(int))
    assert cerr.max() <= 6, cerr.max()

    gray = (xx * 255 // (w - 1)).astype(np.uint8)
    g = decode_jpeg(encode_jpeg(gray, 90))
    assert g.shape == (h, w, 3)
    assert np.abs(g[:, :, 0].astype(int) - gray.astype(int)).max() <= 8

    # still-unsupported coding: arithmetic SOF9 refuses by name
    # (progressive SOF2 decodes for real since round 6 — see
    # test_jpeg_progressive_differential)
    import pytest as _pytest

    arithmetic = (b"\xff\xd8\xff\xc9\x00\x0b\x08\x00\x10\x00\x10"
                  b"\x01\x01\x11\x00")
    with _pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(arithmetic + b"\xff\xd9")

    # Spark paths: features + resize decode the real pixels
    rows = [(100, "image", encode_jpeg(img, 90), {}),
            (101, "image", encode_jpeg(img, 60), {})]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = {r.media_id: r for r in
             extract_features(media, deterministic_fake=False).collect()}
    for mid, r in feats.items():
        assert r.format == "jpeg"
        fw, fh, aspect, m0, m1, m2, _std, _ = r.feature
        assert (fw, fh) == (48.0, 36.0)
        assert abs(m0 - 0.5) < 0.05      # x-gradient mean
        assert abs(m2 - 77 / 255) < 0.05  # near-constant B channel

    resized = {r.media_id: r for r in
               resize_images(media, width=16,
                             deterministic_fake=False).collect()}
    for mid, r in resized.items():
        out = decode_pnm(bytes(r.resized))
        assert out.shape[1] == 16 == r.out_width
        assert abs(int(out[:, :, 2].mean()) - 77) <= 12


def test_jpeg_undecodable_falls_back_to_fake(spark):
    """Review finding: a payload that SNIFFS as jpeg but the decoder
    rejects (arithmetic-coded, truncated) must take the seeded fake
    under deterministic_fake=True — not kill the Spark task — and
    still raise in strict mode."""
    import pytest as _pytest

    from cuphic_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
        resize_images,
    )

    arithmetic = (b"\xff\xd8\xff\xc9\x00\x0b\x08\x00\x10\x00\x10"
                  b"\x01\x01\x11\x00\xff\xd9")
    media = spark.createDataFrame([(1, "image", arithmetic, {})],
                                  MEDIA_SCHEMA)
    row = extract_features(media).collect()[0]
    assert row.format == "fake" and len(row.feature) == 8
    rrow = resize_images(media, width=8).collect()[0]
    assert rrow.out_height == 0  # fake stand-in, not a decode
    with _pytest.raises(Exception, match="NotImplementedError|arithmetic"):
        extract_features(media, deterministic_fake=False).collect()


def test_jpeg_progressive_differential():
    """Progressive (SOF2) decode — round-5 verdict item 4. The pin
    is DIFFERENTIAL, not perceptual: encode_jpeg_progressive
    serializes the IDENTICAL quantized coefficients as encode_jpeg
    (shared _quantize_image front end), so progressive decode must
    reproduce baseline decode's pixels EXACTLY — across subsampling,
    restart intervals, grayscale, odd dimensions, and quality (i.e.
    across DC first/refine, AC first/refine, EOB runs, ZRL-in-refine
    and non-interleaved walks). A shared encoder/decoder
    misunderstanding of the scan protocol cannot hide: the baseline
    side never runs the progressive code."""
    import numpy as np

    from cuphic_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(11)
    cases = [((16, 16, 3), "444", 0, 85), ((24, 17, 3), "444", 0, 85),
             ((33, 31, 3), "420", 0, 60), ((40, 56, 3), "444", 3, 85),
             ((48, 32, 3), "420", 2, 95), ((21, 13), None, 4, 85),
             ((8, 8, 3), "444", 1, 30), ((1, 1, 3), "444", 0, 85)]
    for shape, sub, ri, q in cases:
        img = rng.integers(0, 256, shape).astype(np.uint8)
        kw = {"subsampling": sub} if sub else {}
        base = decode_jpeg(encode_jpeg(img, q, restart_interval=ri,
                                       **kw))
        pbytes = encode_jpeg_progressive(img, q, restart_interval=ri,
                                         **kw)
        # really SOF2 (the frame header follows APP0 + DQT segments)
        assert b"\xff\xc2" in pbytes[:220]
        prog = decode_jpeg(pbytes)
        assert np.array_equal(base, prog), (shape, sub, ri, q)
    # smooth gradients hit long EOB runs; noise hits dense refinement
    yy, xx = np.mgrid[0:40, 0:56]
    smooth = np.stack([(xx * 3 + yy * 2) % 256, (xx * 4) % 256,
                       (yy * 5) % 256], -1).astype(np.uint8)
    for q in (30, 85, 95):
        b = decode_jpeg(encode_jpeg(smooth, q, subsampling="420",
                                    restart_interval=2))
        p = decode_jpeg(encode_jpeg_progressive(
            smooth, q, subsampling="420", restart_interval=2))
        assert np.array_equal(b, p), q
    assert encode_jpeg_progressive(smooth, 85) == \
        encode_jpeg_progressive(smooth, 85)  # deterministic bytes


def test_jpeg_progressive_ac_scan_fuzz():
    """Coefficient-level fuzz of the AC scan protocol alone (no DCT,
    no container): random sparse bands through first(Al=2) ->
    refine(Al=1) -> refine(Al=0) must reconstruct the exact int
    coefficients — this is where the EOB-run/correction-bit state
    machine (T.81 G.1.2.2/G.1.2.3) actually lives."""
    import numpy as np

    from cuphic_spark.operators.jpeg import (
        AC_UNIVERSAL_BITS,
        AC_UNIVERSAL_VALS,
        _BitReader,
        _canonical_codes,
        _decode_table,
        _ProgWriter,
        _prog_ac_first_block,
        _prog_ac_refine_block,
        _prog_encode_ac_first,
        _prog_encode_ac_refine,
    )

    rng = np.random.default_rng(3)
    ac_code = _canonical_codes(AC_UNIVERSAL_BITS, AC_UNIVERSAL_VALS)
    table = _decode_table(AC_UNIVERSAL_BITS, AC_UNIVERSAL_VALS)
    for _ in range(60):
        ss, se = sorted(rng.choice(range(1, 64), 2, replace=False))
        blocks = []
        for _b in range(int(rng.integers(1, 8))):
            zz = np.zeros(64, dtype=np.int32)
            nz = int(rng.integers(0, 14))
            idx = rng.choice(range(1, 64), size=nz, replace=False)
            zz[idx] = rng.integers(-60, 61, size=nz)
            blocks.append(zz)
        streams = []
        for fn, al in [(_prog_encode_ac_first, 2),
                       (_prog_encode_ac_refine, 1),
                       (_prog_encode_ac_refine, 0)]:
            bw = _ProgWriter(ac_code)
            fn(bw, blocks, ss, se, al, 0, lambda b: None)
            bw.flush_eobrun()
            bw.flush()
            streams.append(bytes(bw.out).replace(b"\xff\x00", b"\xff"))
        rec = [np.zeros(64, dtype=np.int32) for _ in blocks]
        for si, (fn, al) in enumerate([(_prog_ac_first_block, 2),
                                       (_prog_ac_refine_block, 1),
                                       (_prog_ac_refine_block, 0)]):
            reader = _BitReader(streams[si])
            eobrun = 0
            for zz in rec:
                eobrun = fn(reader, table, zz, ss, se, al, eobrun)
        for a, b in zip(blocks, rec):
            assert np.array_equal(a[ss:se + 1], b[ss:se + 1])


def test_jpeg_odd_sizes_fuzz():
    """Edge-replication padding paths: images of every awkward shape
    (1x1, non-multiple-of-8, single-column) roundtrip at the same
    bounded error as aligned ones, with exact output dimensions."""
    import numpy as np

    from cuphic_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(0)
    for (h, w) in [(1, 1), (3, 5), (7, 8), (9, 17), (8, 8),
                   (15, 23), (64, 1)]:
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, 90))
        assert out.shape == (h, w, 3)
        err = np.abs(out.astype(int) - img.astype(int))
        assert err.max() <= 48 and err.mean() <= 10, (h, w, err.max())


def test_jpeg_fill_bytes_and_component_count_guards():
    """Advisory pins: (a) 0xFF fill bytes before a marker are legal
    padding (T.81 B.1.1.2) — a spec-valid stream from another encoder
    must decode identically, not misparse; (b) a 4-component (YCCK/
    CMYK) baseline SOF refuses by name instead of silently running
    the YCbCr matrix over 3 of its 4 planes."""
    import numpy as np
    import pytest as _pytest

    from cuphic_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (16, 24, 3)).astype(np.uint8)
    data = encode_jpeg(img, 90)
    # inject fill bytes before the DQT, SOF0 and SOS markers
    padded = (data.replace(b"\xff\xdb", b"\xff\xff\xff\xdb", 1)
              .replace(b"\xff\xc0", b"\xff\xff\xc0", 1)
              .replace(b"\xff\xda", b"\xff\xff\xff\xff\xda", 1))
    assert padded != data
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(data))

    # 4-component SOF0 (the Adobe YCCK shape): loud refusal
    sof4 = (b"\xff\xd8" + b"\xff\xc0" +
            (8 + 3 * 4 + 2).to_bytes(2, "big") + b"\x08" +
            (16).to_bytes(2, "big") + (16).to_bytes(2, "big") +
            b"\x04" +
            b"".join(bytes([cid, 0x11, 0]) for cid in (1, 2, 3, 4)) +
            b"\xff\xd9")
    with _pytest.raises(NotImplementedError, match="4-component"):
        decode_jpeg(sof4)

    # hostile/corrupt SOF dimensions refuse BEFORE allocating the
    # coefficient grids (65535x65535 would be ~17 GB) — a loud
    # ValueError, not a worker-killing MemoryError
    huge = (b"\xff\xd8" + b"\xff\xc0" + (8 + 3 + 2).to_bytes(2, "big")
            + b"\x08" + (65535).to_bytes(2, "big")
            + (65535).to_bytes(2, "big") + b"\x01"
            + bytes([1, 0x11, 0]) + b"\xff\xd9")
    with _pytest.raises(ValueError, match="megapixel"):
        decode_jpeg(huge)


def test_jpeg_420_dri_decode():
    """Round-4 verdict item 4: 4:2:0 + restart-interval decode.

    (a) restart intervals are entropy-layer only: the same image at
    DRI 0/1/3/7 decodes bit-identically; (b) the 4:2:0 result equals
    an INDEPENDENT reference built in this test (own color matrices,
    own 2x2 box downsample + nearest upsample over the quantized
    chroma) within quantization error; (c) odd sizes keep exact
    output dims; (d) spec-violating streams fail loudly (RST out of
    sequence, RST without DRI)."""
    import numpy as np
    import pytest as _pytest

    from cuphic_spark.operators.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(3)
    w, h = 45, 37
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([xx * 255 // (w - 1), yy * 255 // (h - 1),
                    ((xx + yy) * 3) % 256], -1).astype(np.uint8)

    # (a) DRI is entropy-layer only
    base = decode_jpeg(encode_jpeg(img, 90, subsampling="420"))
    for dri in (1, 3, 7):
        got = decode_jpeg(encode_jpeg(img, 90, subsampling="420",
                                      restart_interval=dri))
        assert np.array_equal(got, base), dri

    # (b) independent upsampled reference: the decoded 4:2:0 image
    # must match round-tripping luma at full res and chroma through
    # 2x2 box-down + nearest-up, all computed HERE from first
    # principles (not via jpeg.py helpers), within quant error
    def rgb2ycc(a):
        r, g, b = (a[..., i].astype(float) for i in range(3))
        return np.stack([.299 * r + .587 * g + .114 * b,
                         128 - .168736 * r - .331264 * g + .5 * b,
                         128 + .5 * r - .418688 * g - .081312 * b], -1)

    def ycc2rgb(y, cb, cr):
        cb, cr = cb - 128.0, cr - 128.0
        return np.clip(np.stack(
            [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr,
             y + 1.772 * cb], -1).round(), 0, 255).astype(np.uint8)

    ycc = rgb2ycc(img)
    pad = np.pad(ycc, ((0, h % 2), (0, w % 2), (0, 0)), mode="edge")
    sub = pad.reshape(pad.shape[0] // 2, 2,
                      pad.shape[1] // 2, 2, 3).mean((1, 3))
    up = np.repeat(np.repeat(sub, 2, 0), 2, 1)[:h, :w]
    ref = ycc2rgb(ycc[..., 0], up[..., 1], up[..., 2])
    got = decode_jpeg(encode_jpeg(img, 95, subsampling="420"))
    err = np.abs(got.astype(int) - ref.astype(int))
    assert err.max() <= 14 and err.mean() <= 3, (err.max(), err.mean())

    # (c) odd/awkward shapes with restarts: exact output dims, bounded
    # luma error (chroma is subsampled — compare on the luma plane)
    for (hh, ww) in [(1, 1), (3, 5), (9, 17), (16, 16), (17, 33)]:
        src = rng.integers(0, 256, (hh, ww, 3)).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(src, 90, subsampling="420",
                                      restart_interval=2))
        assert out.shape == (hh, ww, 3)
        lum = lambda a: (.299 * a[..., 0] + .587 * a[..., 1]  # noqa: E731
                         + .114 * a[..., 2])
        lerr = np.abs(lum(out.astype(float)) - lum(src.astype(float)))
        assert lerr.mean() <= 12, (hh, ww, lerr.mean())

    # (d) loud failures: corrupted RST sequence / RST without DRI
    stream = encode_jpeg(img, 90, subsampling="420", restart_interval=1)
    assert b"\xff\xd0" in stream
    bad = stream.replace(b"\xff\xd0", b"\xff\xd4", 1)
    with _pytest.raises(ValueError, match="out of sequence"):
        decode_jpeg(bad)
    no_dri = stream.replace(b"\xff\xdd\x00\x04\x00\x01", b"", 1)
    assert len(no_dri) < len(stream)
    with _pytest.raises(ValueError, match="no DRI"):
        decode_jpeg(no_dri)

    # non-integer sampling ratio (3x1 max vs 2x1 component) refuses
    # by name — patch the SOF sampling bytes of a real stream (the
    # check fires at header analysis, before entropy decode)
    s444 = bytearray(encode_jpeg(img, 90))
    sof = s444.index(b"\xff\xc0")
    s444[sof + 4 + 7] = 0x31   # comp 1: 3x1
    s444[sof + 4 + 10] = 0x21  # comp 2: 2x1 -> 3 % 2 != 0
    with _pytest.raises(NotImplementedError, match="non-integer"):
        decode_jpeg(bytes(s444))


def test_jpeg_multiscan_baseline():
    """Baseline MULTI-SCAN (planar) streams — one non-interleaved
    scan per component — must decode bit-identically to the
    interleaved serialization of the SAME quantized coefficients
    (libjpeg raw-data / camera-firmware shape; previously refused).
    Also pins the loud failures: duplicate component coverage and
    progressive parameters inside a baseline scan."""
    import numpy as _np
    import pytest as _pytest

    from cuphic_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_planar,
    )

    rng = _np.random.default_rng(11)
    for shape, sub, ri in [((40, 56, 3), "444", 0),
                           ((33, 41, 3), "420", 3),
                           ((24, 24), "444", 2)]:
        img = rng.integers(0, 256, size=shape, dtype=_np.uint8)
        base = decode_jpeg(encode_jpeg(img, subsampling=sub,
                                       restart_interval=ri))
        plan = decode_jpeg(encode_jpeg_planar(img, subsampling=sub,
                                              restart_interval=ri))
        assert _np.array_equal(base, plan), (shape, sub, ri)

    img = rng.integers(0, 256, size=(16, 16, 3), dtype=_np.uint8)
    stream = encode_jpeg_planar(img)
    # three single-component scans present
    assert stream.count(b"\xff\xda") == 3

    # duplicate coverage: repeat the first scan's SOS+entropy before
    # EOI -> component coded twice
    first_sos = stream.index(b"\xff\xda")
    second_sos = stream.index(b"\xff\xda", first_sos + 2)
    dup = (stream[:-2] + stream[first_sos:second_sos] + b"\xff\xd9")
    with _pytest.raises(ValueError, match="two baseline scans"):
        decode_jpeg(dup)

    # progressive params in a baseline scan: patch Ss of scan 1
    body_len = int.from_bytes(stream[first_sos + 2:first_sos + 4],
                              "big")
    ss_off = first_sos + 2 + body_len - 3
    assert stream[ss_off] == 0 and stream[ss_off + 1] == 63
    bad = bytearray(stream)
    bad[ss_off] = 1
    with _pytest.raises(ValueError, match="progressive parameters"):
        decode_jpeg(bytes(bad))

    # missing coverage: truncate after the second scan's entropy
    third_sos = stream.index(b"\xff\xda", second_sos + 2)
    partial = stream[:third_sos] + b"\xff\xd9"
    with _pytest.raises(ValueError, match="cover every component"):
        decode_jpeg(partial)


def test_gif_codec_roundtrip_animation_and_compositing():
    """From-scratch GIF LZW codec: lossless roundtrip (single frame,
    interlaced, animated with delays, 256-color palette, a frame
    large enough to walk the code width up and force a dictionary
    reset); decode-side compositing semantics (transparency keeps
    the canvas, disposal 2 restores background); disposal 3 refuses
    by name."""
    import struct

    import numpy as _np
    import pytest as _pytest

    from cuphic_spark.operators.gif import decode_gif, encode_gif

    rng = _np.random.default_rng(13)
    img = (rng.integers(0, 5, size=(13, 21), dtype=_np.uint8) * 50)
    img = _np.stack([img, img // 2, 255 - img], axis=-1)
    for interlace in (False, True):
        frames, _d = decode_gif(encode_gif(img, interlace=interlace))
        assert _np.array_equal(frames[0], img), interlace

    anim = _np.stack([_np.roll(img, s, axis=1) for s in range(4)])
    frames, delays = decode_gif(
        encode_gif(anim, delays_ms=[100, 50, 50, 200]))
    assert frames.shape == (4, 13, 21, 3)
    assert all(_np.array_equal(frames[i], anim[i]) for i in range(4))
    assert delays == [100, 50, 50, 200]

    pal = _np.arange(256, dtype=_np.uint8).reshape(16, 16)
    full = _np.stack([pal, pal, pal], axis=-1)
    assert _np.array_equal(decode_gif(encode_gif(full))[0][0], full)

    big = (rng.integers(0, 4, size=(120, 200), dtype=_np.uint8) * 80)
    big = _np.stack([big] * 3, axis=-1)
    assert _np.array_equal(decode_gif(encode_gif(big))[0][0], big)

    # hand-build a 2-frame stream: frame 2 is a 1x1 sub-rect with a
    # TRANSPARENT pixel (canvas must show through), then disposal 2
    # on frame 1 restores the background color
    def hand_gif(gflags2, disposal1=0):
        # 2x2 screen, 4-color table: bg=3 (white)
        head = b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0x81, 3, 0)
        table = bytes([10, 0, 0, 0, 200, 0, 0, 0, 250, 255, 255, 255])
        # frame 1: full 2x2, indices [0,1,2,0]; mcs=2
        from cuphic_spark.operators.gif import _lzw_encode

        gce1 = b"\x21\xf9\x04" + bytes([disposal1 << 2, 0, 0, 0]) \
            + b"\x00"
        lzw1 = _lzw_encode(2, bytes([0, 1, 2, 0]))
        f1 = (b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
              + bytes([2, len(lzw1)]) + lzw1 + b"\x00")
        # frame 2: 1x1 at (1,1), index 1, transparency per gflags2
        gce2 = b"\x21\xf9\x04" + bytes([gflags2, 0, 0, 1]) + b"\x00"
        lzw2 = _lzw_encode(2, bytes([1]))
        f2 = (b"\x2c" + struct.pack("<HHHHB", 1, 1, 1, 1, 0)
              + bytes([2, len(lzw2)]) + lzw2 + b"\x00")
        return head + table + gce1 + f1 + gce2 + f2 + b"\x3b"

    # transparent index 1: frame 2's pixel keeps frame 1's value
    frames, _d = decode_gif(hand_gif(gflags2=0x01))
    assert tuple(frames[1][1, 1]) == (10, 0, 0)   # index 0 shows
    # opaque: frame 2 paints index 1
    frames, _d = decode_gif(hand_gif(gflags2=0x00))
    assert tuple(frames[1][1, 1]) == (0, 200, 0)
    # disposal 2 after frame 1: canvas under frame 2 restored to bg
    frames, _d = decode_gif(hand_gif(gflags2=0x01, disposal1=2))
    assert tuple(frames[1][1, 1]) == (255, 255, 255)
    # disposal 3 (restore-to-previous): a 3-frame stream where frame
    # 2 paints the whole screen white under disposal 3 — frame 3's
    # transparent probe pixel must see frame 1's canvas RESTORED
    # (discriminates from disposal 0, which would leave white, AND
    # from disposal 2, which would fill background white too)
    def hand_gif_d3():
        head = b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0x81, 3, 0)
        table = bytes([10, 0, 0, 0, 200, 0, 0, 0, 250, 255, 255, 255])
        from cuphic_spark.operators.gif import _lzw_encode

        lzw1 = _lzw_encode(2, bytes([0, 1, 2, 0]))  # canvas A
        f1 = (b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
              + bytes([2, len(lzw1)]) + lzw1 + b"\x00")
        gce2 = b"\x21\xf9\x04" + bytes([3 << 2, 0, 0, 0]) + b"\x00"
        lzw2 = _lzw_encode(2, bytes([3, 3, 3, 3]))  # all white
        f2 = (b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
              + bytes([2, len(lzw2)]) + lzw2 + b"\x00")
        gce3 = b"\x21\xf9\x04" + bytes([0x01, 0, 0, 1]) + b"\x00"
        lzw3 = _lzw_encode(2, bytes([1]))  # transparent probe (0,0)
        f3 = (b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0)
              + bytes([2, len(lzw3)]) + lzw3 + b"\x00")
        return head + table + f1 + gce2 + f2 + gce3 + f3 + b"\x3b"

    frames, _d = decode_gif(hand_gif_d3())
    assert tuple(frames[1][0, 0]) == (255, 255, 255)  # f2 painted
    assert tuple(frames[2][0, 0]) == (10, 0, 0)  # canvas A restored
    assert tuple(frames[2][1, 1]) == (10, 0, 0)  # rest of A back too

    # GCE scope (GIF89a §23): a graphic control applies ONLY to the
    # first following rendering block — frame 2 WITHOUT its own GCE
    # must not inherit frame 1's transparency or disposal
    def hand_gif_no_gce2(disposal1=0, transparent1=False):
        head = b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0x81, 3, 0)
        table = bytes([10, 0, 0, 0, 200, 0, 0, 0, 250, 255, 255, 255])
        from cuphic_spark.operators.gif import _lzw_encode

        gflags1 = (disposal1 << 2) | (1 if transparent1 else 0)
        gce1 = b"\x21\xf9\x04" + bytes([gflags1, 0, 0, 1]) + b"\x00"
        lzw1 = _lzw_encode(2, bytes([0, 1, 2, 0]))
        f1 = (b"\x2c" + struct.pack("<HHHHB", 0, 0, 2, 2, 0)
              + bytes([2, len(lzw1)]) + lzw1 + b"\x00")
        lzw2 = _lzw_encode(2, bytes([1]))     # index 1 at (1,1): NO GCE
        f2 = (b"\x2c" + struct.pack("<HHHHB", 1, 1, 1, 1, 0)
              + bytes([2, len(lzw2)]) + lzw2 + b"\x00")
        return head + table + gce1 + f1 + f2 + b"\x3b"

    # frame 1 transparent on index 1; frame 2's index-1 pixel must
    # PAINT (opaque), not show through
    frames, delays = decode_gif(hand_gif_no_gce2(transparent1=True))
    assert tuple(frames[1][1, 1]) == (0, 200, 0)
    # frame 1 disposal 2; frame 2 must not re-trigger the restore,
    # and its delay resets to 0
    frames, delays = decode_gif(hand_gif_no_gce2(disposal1=2))
    assert tuple(frames[1][1, 1]) == (0, 200, 0)
    assert delays == [0, 0]
    # disposal 2 with only a LOCAL table on the frame: background
    # restore indexes the GLOBAL table (here: none -> black)
    def hand_gif_local_only():
        head = b"GIF89a" + struct.pack("<HHBBB", 1, 1, 0x00, 1, 0)
        from cuphic_spark.operators.gif import _lzw_encode

        gce1 = b"\x21\xf9\x04" + bytes([2 << 2, 0, 0, 0]) + b"\x00"
        lzw = _lzw_encode(2, bytes([2]))
        f1 = (b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0x80 | 1)
              + bytes([30, 40, 50, 0, 200, 0, 99, 99, 99, 1, 2, 3])
              + bytes([2, len(lzw)]) + lzw + b"\x00")
        f2 = (b"\x2c" + struct.pack("<HHHHB", 0, 0, 1, 1, 0x80 | 1)
              + bytes([30, 40, 50, 0, 200, 0, 99, 99, 99, 1, 2, 3])
              + bytes([2, len(_lzw_encode(2, bytes([3])))])
              + _lzw_encode(2, bytes([3])) + b"\x00")
        return head + gce1 + f1 + f2 + b"\x3b"

    frames, _d = decode_gif(hand_gif_local_only())
    assert tuple(frames[0][0, 0]) == (99, 99, 99)   # frame 1 paints
    assert tuple(frames[1][0, 0]) == (1, 2, 3)      # frame 2 over black


def test_png_codec_roundtrip_and_refusals():
    """From-scratch PNG codec: LOSSLESS roundtrip (the encoder
    cycles all five scanline filters, so one roundtrip exercises
    every unfilter path) across grey/RGB/RGBA and odd sizes;
    multi-IDAT streams; CRC corruption and unsupported shapes
    (palette, 16-bit, Adam7) fail loudly by name."""
    import struct
    import zlib

    import numpy as _np
    import pytest as _pytest

    from cuphic_spark.operators.png import (
        PNG_MAGIC,
        decode_png,
        encode_png,
    )

    rng = _np.random.default_rng(5)
    for shape in [(12, 17, 3), (8, 8), (20, 5, 4), (1, 1, 3),
                  (7, 3), (33, 2, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=_np.uint8)
        dec = decode_png(encode_png(img))
        if img.ndim == 2:
            exp = _np.repeat(img[:, :, None], 3, axis=2)
        elif img.shape[2] == 4:
            exp = img[:, :, :3]
        else:
            exp = img
        assert _np.array_equal(dec, exp), shape

    img = rng.integers(0, 256, size=(10, 10, 3), dtype=_np.uint8)
    stream = encode_png(img)

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I",
                              zlib.crc32(ctype + data) & 0xFFFFFFFF))

    # multi-IDAT: split the deflate stream across two chunks
    ihdr_end = stream.index(b"IDAT") - 4
    idat_len, = struct.unpack(
        ">I", stream[ihdr_end:ihdr_end + 4])
    idat = stream[ihdr_end + 8:ihdr_end + 8 + idat_len]
    rebuilt = (stream[:ihdr_end]
               + chunk(b"IDAT", idat[:7]) + chunk(b"IDAT", idat[7:])
               + chunk(b"IEND", b""))
    assert _np.array_equal(decode_png(rebuilt), img)

    # CRC corruption is loud
    bad = bytearray(stream)
    bad[len(PNG_MAGIC) + 20] ^= 0xFF
    with _pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(bad))

    # invalid combos stay loud (IHDR hand-patched)
    def with_ihdr(depth, color, interlace):
        ih = struct.pack(">IIBBBBB", 10, 10, depth, color, 0, 0,
                         interlace)
        return (PNG_MAGIC + chunk(b"IHDR", ih)
                + stream[stream.index(b"IDAT") - 4:])

    with _pytest.raises(ValueError, match="bit depth"):
        decode_png(with_ihdr(4, 2, 0))   # sub-byte truecolor invalid
    with _pytest.raises(ValueError, match="color type"):
        decode_png(with_ihdr(8, 5, 0))
    with _pytest.raises(ValueError, match="without PLTE"):
        decode_png(with_ihdr(8, 3, 0))   # palette needs a PLTE chunk


def test_png_palette_adam7_and_16bit():
    """Round-6 verdict #2: palette (color type 3, depths 1/2/4/8
    auto-chosen, +tRNS parsed and dropped), Adam7 interlace (incl.
    sizes with EMPTY passes), 16-bit (v<<8|v encode / high-byte
    decode), and their combinations — all lossless roundtrips; a
    hand-built 4-bit GREYSCALE image pins the sub-byte unpack for
    color type 0 (decode-only path, values scale to full range)."""
    import struct
    import zlib

    import numpy as _np
    import pytest as _pytest

    from cuphic_spark.operators.png import (
        PNG_MAGIC,
        decode_png,
        encode_png,
    )

    rng = _np.random.default_rng(11)
    # palette at every depth the auto-chooser can select
    for ncol in (2, 3, 5, 16, 17, 250):
        pal = rng.integers(0, 256, size=(ncol, 3), dtype=_np.uint8)
        img = pal[rng.integers(0, ncol, size=(13, 21))]
        assert _np.array_equal(decode_png(encode_png(
            img, palette=True)), img), ncol
        # tRNS alpha parsed then dropped — pixels unchanged
        assert _np.array_equal(decode_png(encode_png(
            img, palette=True,
            palette_alpha=_np.array([0, 128], _np.uint8))), img)

    # Adam7: odd sizes, sizes below one pass tile (empty passes),
    # grey and RGB
    for shape in ((1, 1, 3), (2, 3, 3), (7, 7, 3), (8, 8, 3),
                  (9, 10, 3), (3, 16), (31, 33, 3)):
        img = rng.integers(0, 256, size=shape, dtype=_np.uint8)
        dec = decode_png(encode_png(img, interlace=True))
        exp = (_np.repeat(img[:, :, None], 3, 2) if img.ndim == 2
               else img)
        assert _np.array_equal(dec, exp), shape

    # palette + Adam7 combined
    pal = rng.integers(0, 256, size=(11, 3), dtype=_np.uint8)
    img = pal[rng.integers(0, 11, size=(14, 9))]
    assert _np.array_equal(decode_png(encode_png(
        img, palette=True, interlace=True)), img)

    # 16-bit truecolor / grey, plain and interlaced
    img = rng.integers(0, 256, size=(6, 7, 3), dtype=_np.uint8)
    assert _np.array_equal(decode_png(encode_png(
        img, bit_depth=16)), img)
    assert _np.array_equal(decode_png(encode_png(
        img, bit_depth=16, interlace=True)), img)
    g = rng.integers(0, 256, size=(5, 5), dtype=_np.uint8)
    assert _np.array_equal(decode_png(encode_png(g, bit_depth=16)),
                           _np.repeat(g[:, :, None], 3, 2))
    # 16-bit high-byte policy: a hand-patched low byte is ignored
    enc = bytearray(encode_png(_np.full((1, 1, 3), 7, _np.uint8),
                               bit_depth=16))
    dec = decode_png(bytes(enc))
    assert tuple(dec[0, 0]) == (7, 7, 7)

    # hand-built 4-bit greyscale (2x3): samples MSB-first, one
    # filter-0 scanline of ceil(3*4/8)=2 bytes each; values scale
    # by 255//15 = 17
    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(
                    ">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    raw = bytes([0, 0x1F, 0xA0,      # row 0: 1, 15, 10 (pad)
                 0, 0x05, 0x30])     # row 1: 0, 5, 3 (pad)
    png = (PNG_MAGIC
           + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 4, 0,
                                        0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    dec = decode_png(png)
    assert dec.shape == (2, 3, 3)
    assert [dec[0, i, 0] for i in range(3)] == [17, 255, 170]
    assert [dec[1, i, 0] for i in range(3)] == [0, 85, 51]

    # palette index beyond PLTE is loud: 1-bit palette with a
    # single entry but an index of 1 in the data
    png_bad = (PNG_MAGIC
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 1, 3,
                                            0, 0, 0))
               + chunk(b"PLTE", bytes([9, 9, 9]))
               + chunk(b"IDAT", zlib.compress(bytes([0, 0x40])))
               + chunk(b"IEND", b""))
    with _pytest.raises(ValueError, match="palette index"):
        decode_png(png_bad)
    # tRNS longer than PLTE is loud
    png_bad2 = (PNG_MAGIC
                + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 1, 3,
                                             0, 0, 0))
                + chunk(b"PLTE", bytes([9, 9, 9]))
                + chunk(b"tRNS", bytes([1, 2]))
                + chunk(b"IDAT", zlib.compress(bytes([0, 0x00])))
                + chunk(b"IEND", b""))
    with _pytest.raises(ValueError, match="tRNS"):
        decode_png(png_bad2)


def test_jpeg_huffman_tables_are_valid_prefix_codes():
    """The embedded Annex-K tables must form valid canonical Huffman
    codes: per-length counts within capacity (Kraft inequality), all
    codes distinct, and encoder/decoder table constructions exact
    inverses of each other."""
    from cuphic_spark.operators.jpeg import (
        AC_CHROM_BITS,
        AC_CHROM_VALS,
        AC_LUM_BITS,
        AC_LUM_VALS,
        DC_CHROM_BITS,
        DC_CHROM_VALS,
        DC_LUM_BITS,
        DC_LUM_VALS,
        _canonical_codes,
        _decode_table,
    )

    for bits, vals in ((DC_LUM_BITS, DC_LUM_VALS),
                       (DC_CHROM_BITS, DC_CHROM_VALS),
                       (AC_LUM_BITS, AC_LUM_VALS),
                       (AC_CHROM_BITS, AC_CHROM_VALS)):
        assert sum(bits) == len(vals) == len(set(vals))
        kraft = sum(n * 2 ** -(length + 1)
                    for length, n in enumerate(bits))
        assert kraft < 1.0  # strict: JPEG reserves the all-ones code
        enc = _canonical_codes(bits, vals)
        dec = _decode_table(bits, vals)
        assert len(enc) == len(vals)
        # exact inverses, and every code fits its bit length
        for sym, (code, length) in enc.items():
            assert code < (1 << length)
            assert dec[(length, code)] == sym
        assert len(dec) == len(enc)  # no (length, code) collisions


def test_line_dedup_winner_semantics(spark):
    """Hand-built corpus: the duplicated long line survives only at
    its first (doc_id, pos); short lines never participate; a doc
    whose every line is dropped rebuilds to ''."""
    from cuphic_spark.operators.dedup import line_dedup

    rows = [
        (0, "unique alpha line\nshared boilerplate line\nok"),
        (1, "shared boilerplate line\nunique beta line\nok"),
        (2, "shared boilerplate line"),
        (3, "ok\nok\nok"),  # short lines: all kept, none participate
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in line_dedup(df, min_chars=4).collect()}
    assert out[0].text == ("unique alpha line\n"
                           "shared boilerplate line\nok")
    assert out[0].n_dropped == 0
    # doc 1 loses the shared line (doc 0 pos 1 < doc 1 pos 0)
    assert out[1].text == "unique beta line\nok"
    assert out[1].n_kept == 2 and out[1].n_dropped == 1
    # doc 2 was ONLY the shared line -> rebuilt empty
    assert out[2].text == "" and out[2].n_kept == 0
    assert out[2].n_dropped == 1
    # 'ok' is below min_chars: kept everywhere, even repeated
    assert out[3].text == "ok\nok\nok" and out[3].n_dropped == 0


def test_mojibake_pairs_and_repair(spark):
    """The pair table is generated from the codec pair (never
    hand-typed) and the repair inverts a planted mis-decode exactly;
    clean text passes through byte-identical. Strings are built
    through the codecs here too — no mojibake literals in source."""
    from cuphic_spark.operators.webclean import (
        MOJIBAKE_PAIRS,
        fix_mojibake,
    )

    for moji, ch in MOJIBAKE_PAIRS:
        assert ch.encode("utf-8").decode("windows-1252") == moji
    # longest-first ordering: a shorter entry can never fire inside
    # a longer sequence that was still unapplied
    lens = [len(m) for m, _ in MOJIBAKE_PAIRS]
    assert lens == sorted(lens, reverse=True)
    # the five cp1252 holes are skipped, not mis-mapped: every RIGHT
    # double quote (U+201D, second UTF-8 byte 0x9D) is absent
    assert "”" not in {ch for _, ch in MOJIBAKE_PAIRS}
    assert "“" in {ch for _, ch in MOJIBAKE_PAIRS}

    clean = "café “quote“ — déjà"
    damaged = clean.encode("utf-8").decode("windows-1252")
    assert damaged != clean
    df = spark.createDataFrame(
        [(0, damaged), (1, "plain ascii"), (2, None)],
        "doc_id long, text string")
    out = {r.doc_id: r for r in fix_mojibake(df).collect()}
    assert out[0].repaired == clean and out[0].mojibake_found
    assert out[1].repaired == "plain ascii"
    assert not out[1].mojibake_found
    assert out[2].repaired is None and out[2].mojibake_found is False


def test_script_detect_dominance_and_ties(spark):
    """Counts per range; dominance = strictly-greatest with ties to
    the earliest SCRIPT_RANGES entry; all-zero -> 'unknown'."""
    from cuphic_spark.operators.webclean import script_detect

    cjk, cyr, greek = chr(0x4E2D), chr(0x0414), chr(0x03B1)
    rows = [
        (0, "plain latin text"),
        (1, cjk * 5 + " ok"),          # cjk 5 > latin 2
        (2, cyr * 3 + " " + greek * 3),  # tie -> cyrillic (earlier)
        (3, "123 456"),                # no script chars -> unknown
        (4, "ab " + cjk * 2),          # tie latin 2 == cjk 2 -> latin
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in script_detect(df).collect()}
    assert out[0].script == "latin"
    assert out[1].script == "cjk" and out[1].n_cjk == 5
    assert out[2].script == "cyrillic"
    assert out[2].n_cyrillic == 3 and out[2].n_greek == 3
    assert out[3].script == "unknown"
    assert out[4].script == "latin"


def test_ngram_diversity_permille(spark):
    from cuphic_spark.operators.webclean import ngram_diversity

    rows = [
        (0, "a b c d"),        # 3 bigrams, all distinct -> 1000
        (1, "x y x y x y"),    # 5 bigrams, 2 distinct -> 400
        (2, "solo"),           # no bigrams -> 0 permille
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in ngram_diversity(df).collect()}
    assert out[0].n_bigrams == 3 and out[0].diversity_permille == 1000
    assert out[1].n_bigrams == 5 and out[1].n_distinct_bigrams == 2
    assert out[1].diversity_permille == 400
    assert out[2].n_bigrams == 0 and out[2].diversity_permille == 0


def test_doc_filter_flags(spark):
    from cuphic_spark.operators.webclean import doc_filter_flags

    rows = [
        (0, "good words only here and many more of them", "src0"),
        (1, "casino viagra casino spam", "src0"),   # 750 permille
        (2, "clean text", "srcX"),                  # blocked source
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    out = {r.doc_id: r for r in doc_filter_flags(df).collect()}
    assert out[0].keep and out[0].badword_count == 0
    assert out[1].badword_count == 3
    assert out[1].badword_permille == 750 and not out[1].keep
    assert out[2].blocked_source and not out[2].keep


def test_jpeg_extended_sequential_12bit():
    """SOF1 / 12-bit / 16-bit-DQT decode (T.81 extended sequential):
    flat image pins the EXACT downscaled value (DC-only blocks);
    gradient and noise images bound the reconstruction error against
    the 8-bit downscale of the 12-bit original; 8-bit SOF1 also
    decodes; SOF0 claiming 12-bit refuses (spec violation), and the
    arithmetic-coded SOF marker still refuses by name."""
    import numpy as np
    import pytest as _pytest

    from cuphic_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg_extended)

    rng = np.random.default_rng(23)

    flat = np.full((16, 16), 2560, dtype=np.uint16)
    data = encode_jpeg_extended(flat, quality=95)
    assert b"\xff\xc1" in data          # SOF1
    # DQT is Pq=1: first table byte after the DQT length is 0x10
    i = data.index(b"\xff\xdb")
    assert data[i + 4] == 0x10
    out = decode_jpeg(data)
    assert out.shape == (16, 16, 3)
    assert np.unique(out).tolist() == [2560 // 16]

    x = np.linspace(0, 4095, 48)
    grad = np.stack(
        [np.meshgrid(x, x)[0], np.meshgrid(x, x)[1],
         np.full((48, 48), 1000.0)], axis=-1).astype(np.uint16)
    dec = decode_jpeg(encode_jpeg_extended(grad, quality=95))
    err = np.abs(dec.astype(float) - (grad >> 4).astype(float))
    assert err.max() <= 6

    noise = rng.integers(0, 4096, (40, 40), dtype=np.uint16)
    dn = decode_jpeg(encode_jpeg_extended(noise, quality=100))
    assert np.abs(dn[:, :, 0].astype(float)
                  - (noise >> 4).astype(float)).max() <= 2

    eight = decode_jpeg(encode_jpeg_extended(
        rng.integers(0, 256, (24, 24), dtype=np.uint16),
        quality=90, precision=8))
    assert eight.shape == (24, 24, 3)

    # SOF0 + 12-bit is a spec violation -> loud ValueError
    bad = bytearray(encode_jpeg_extended(flat))
    j = bad.index(b"\xff\xc1")
    bad[j + 1] = 0xC0
    with _pytest.raises(ValueError, match="baseline SOF0"):
        decode_jpeg(bytes(bad))

    # arithmetic coding remains an honest refusal
    arith = bytearray(encode_jpeg_extended(flat))
    arith[arith.index(b"\xff\xc1") + 1] = 0xC9
    with _pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(bytes(arith))


def test_lm_fluency_bigram_ppm(spark):
    """Hand-computed corpus: 'a b' appears in two docs (c2=2), 'a c'
    in one (c2=1), both with prefix 'a' (c1=3) -> per-bigram ppm
    666666 vs 333333; a one-word doc scores (0, 0); the DuckDB twin
    matches exactly."""
    import duckdb as _duck

    from cuphic_spark.operators.textstats import (
        lm_fluency, lm_fluency_oracle_sql)

    rows = [(1, "a b"), (2, "a b"), (3, "a c"), (4, "solo")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.fluency_sum, r.n_bigrams)
           for r in lm_fluency(docs).collect()}
    assert got == {1: (666666, 1), 2: (666666, 1),
                   3: (333333, 1), 4: (0, 0)}

    con = _duck.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    ora = {r[0]: (r[1], r[2])
           for r in con.execute(lm_fluency_oracle_sql()).fetchall()}
    assert ora == got


def test_span_dedup_flags_hand_pinned(spark):
    """deduplicate-text-datasets-style k-word window dedup signal:
    cross-doc duplicate window counted once per occurrence, in-doc
    repeats count too, short docs score (0, 0, 0); DuckDB twin is
    value-exact."""
    import duckdb as _duck

    from cuphic_spark.operators.dedup import (
        span_dedup_flags, span_dedup_oracle_sql)

    rows = [
        (1, "a b c d e f g h i"),    # 2 windows, 1 dup (with doc 2)
        (2, "a b c d e f g h x"),    # 2 windows, 1 dup
        (3, "short text"),           # < k words -> 0/0/0
        (4, "z z z z z z z z z"),    # both windows identical -> 2/2
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_windows, r.n_dup_windows, r.dup_ppm)
           for r in span_dedup_flags(docs, k=8).collect()}
    assert got == {1: (2, 1, 500000), 2: (2, 1, 500000),
                   3: (0, 0, 0), 4: (2, 2, 1000000)}

    con = _duck.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    ora = {r[0]: (r[1], r[2], r[3])
           for r in con.execute(span_dedup_oracle_sql(k=8)).fetchall()}
    assert ora == got


def test_wet_conversion_records_roundtrip_and_determinism():
    """WET derived format: write_wet -> read (via iter_warc_records)
    preserves text exactly (incl. non-ASCII), only conversion
    records surface, and identical inputs produce IDENTICAL bytes
    on repeat calls (mtime=0 gzip members — task-retry contract).
    Mixed WARC+WET streams filter correctly in both readers."""
    from cuphic_spark.sources.warc import (
        iter_warc_records, write_warc, write_wet)

    recs = [("https://h.example/doc/1", "2026-08-01T00:00:00Z",
             "hello wörld\nline two"),
            ("https://h.example/doc/2", "2026-08-02T00:00:00Z",
             "text £ with unicode")]
    a = write_wet(recs)
    b = write_wet(recs)
    assert a == b  # byte determinism
    got = [(h["warc-target-uri"], h["warc-date"],
            block.decode("utf-8"))
           for h, block in iter_warc_records(a)
           if h.get("warc-type") == "conversion"]
    assert got == list(recs)
    # record ids are deterministic AND distinct per (url, date)
    ids = [h["warc-record-id"] for h, _ in iter_warc_records(a)]
    assert len(set(ids)) == 2 and all(
        i.startswith("<urn:uuid:") for i in ids)

    # a response record mixed into the stream is NOT a conversion row
    mixed = write_warc(
        [("https://h.example/doc/3", "2026-08-03T00:00:00Z",
          b"<doc><p>x</p></doc>")]) + a
    kinds = [h.get("warc-type") for h, _ in iter_warc_records(mixed)]
    assert kinds == ["response", "conversion", "conversion"]


def test_wat_metadata_records_roundtrip_and_determinism():
    """WAT derived format: canonical-JSON metadata records roundtrip
    (title, ordered links), byte-identical on repeat calls, and
    response/conversion records are invisible to the metadata read."""
    from cuphic_spark.sources.warc import iter_warc_records, write_wat

    recs = [("https://h.example/doc/1", "2026-08-01T00:00:00Z",
             {"url": "https://h.example/doc/1", "title": "Tö",
              "links": [{"href": "https://a"}, {"href": "https://b"}]}),
            ("https://h.example/doc/2", "2026-08-02T00:00:00Z",
             {"url": "https://h.example/doc/2", "title": "",
              "links": []})]
    a = write_wat(recs)
    assert a == write_wat(recs)  # byte determinism
    import json as _json
    got = [(h["warc-target-uri"], _json.loads(b.decode()))
           for h, b in iter_warc_records(a)
           if h.get("warc-type") == "metadata"]
    assert [u for u, _ in got] == [r[0] for r in recs]
    assert got[0][1]["links"] == [{"href": "https://a"},
                                  {"href": "https://b"}]
    assert got[0][1]["title"] == "Tö"
    assert got[1][1]["links"] == []


def test_jpeg_lossless_sof3_exact_roundtrip():
    """Lossless JPEG (SOF3, T.81 Annex H): decode(encode(x)) == x
    bit-for-bit for every predictor 1..7 at 8-bit (gray + RGB raw
    channels — T.81 defines no color transform for lossless); 12-bit
    presents floor(x/16); bad predictor selectors and arithmetic
    markers still refuse."""
    import numpy as np
    import pytest as _pytest

    from cuphic_spark.operators.jpeg import (
        decode_jpeg, encode_jpeg_lossless)

    rng = np.random.default_rng(41)
    g = rng.integers(0, 256, (23, 17), dtype=np.uint8)
    for sel in range(1, 8):
        out = decode_jpeg(encode_jpeg_lossless(g, predictor=sel))
        assert np.array_equal(out[:, :, 0], g)
        assert np.array_equal(out[:, :, 1], g)  # gray replicated

    c = rng.integers(0, 256, (12, 9, 3), dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_lossless(c, predictor=7)), c)

    m = rng.integers(0, 4096, (10, 11), dtype=np.uint16)
    out = decode_jpeg(encode_jpeg_lossless(m, predictor=4,
                                           precision=12))
    assert np.array_equal(out[:, :, 0], (m >> 4).astype(np.uint8))

    # worst case for the difference alphabet: alternating extremes
    z = np.zeros((4, 4), dtype=np.uint16)
    z[::2, ::2] = 4095
    assert np.array_equal(
        decode_jpeg(encode_jpeg_lossless(z, precision=12))[:, :, 0],
        (z >> 4).astype(np.uint8))

    # predictor selector 0 in the scan header is invalid for SOF3
    bad = bytearray(encode_jpeg_lossless(g))
    i = bad.index(b"\xff\xda")
    ns = bad[i + 4]
    bad[i + 5 + 2 * ns] = 0  # Ss byte
    with _pytest.raises(ValueError, match="predictor selector"):
        decode_jpeg(bytes(bad))

    # arithmetic lossless (SOF11) remains a named refusal
    arith = bytearray(encode_jpeg_lossless(g))
    arith[arith.index(b"\xff\xc3") + 1] = 0xCB
    with _pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg(bytes(arith))


def test_deterministic_sampling_and_sharding(spark):
    """Training-mix operators: membership is a pure function of
    (key, seed) — identical across repartitionings; fractions on the
    SAME stream nest (sample(0.25) is a subset of sample(0.5));
    strata absent from the map are dropped; shard stream is
    independent of the membership stream; DuckDB twin exact."""
    import duckdb as _duck

    from cuphic_spark.operators.sampling import (
        assign_shards, hash_sample, sample_oracle_sql,
        stratified_sample)

    docs = spark.range(2000).toDF("doc_id")
    a = {r.doc_id for r in hash_sample(docs, 0.5, "s").collect()}
    b = {r.doc_id
         for r in hash_sample(docs.repartition(13), 0.5, "s")
         .collect()}
    assert a == b                       # partitioning-invariant
    q = {r.doc_id for r in hash_sample(docs, 0.25, "s").collect()}
    assert q <= a                       # nested thresholds
    assert 0.2 < len(q) / 2000 < 0.3    # calibrated
    other = {r.doc_id for r in hash_sample(docs, 0.5, "t").collect()}
    assert other != a                   # seed changes the stream

    strat = docs.withColumn("stratum", F.col("doc_id") % 3)
    kept = stratified_sample(strat, F.col("stratum"),
                             {0: 1.0, 2: 0.0}, seed="s")
    got = {r.doc_id for r in kept.collect()}
    assert all(d % 3 == 0 for d in got)      # 1 absent -> dropped
    assert len(got) == len([d for d in range(2000) if d % 3 == 0])

    sh = assign_shards(docs, n_shards=8, seed="s")
    counts = {r.shard: r.c for r in
              sh.groupBy("shard").agg(F.count("*").alias("c"))
              .collect()}
    assert set(counts) == set(range(8))
    assert max(counts.values()) < 2 * min(counts.values())

    # twin equality on the gate's exact shape
    rows = [(i,) for i in range(500)]
    sdocs = spark.createDataFrame(rows, "doc_id long") \
        .withColumn("stratum", F.col("doc_id") % 3)
    samp = (assign_shards(
        stratified_sample(sdocs, F.col("stratum"),
                          {0: 0.5, 1: 0.25, 2: 1.0}, seed="r7"),
        n_shards=8, seed="r7")
        .select("doc_id", F.col("stratum").cast("long")
                .alias("stratum"), "shard"))
    gotd = {r.doc_id: (r.stratum, r.shard) for r in samp.collect()}
    con = _duck.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT)")
    con.executemany("INSERT INTO documents VALUES (?)", rows)
    ora = {r[0]: (r[1], r[2]) for r in con.execute(
        sample_oracle_sql({0: 0.5, 1: 0.25, 2: 1.0}, 8,
                          "doc_id % 3", seed="r7")).fetchall()}
    assert gotd == ora


def test_contamination_flags_planted_leak(spark):
    """Decontamination: a corpus doc embedding an exact 8-word
    benchmark span is flagged with the right window count; clean and
    short docs are not; DuckDB twin exact."""
    import duckdb as _duck

    from cuphic_spark.operators.dedup import (
        contamination_flags, contamination_oracle_sql)

    bench_text = "the quick brown fox jumps over the lazy dog"
    rows = [
        (1, bench_text),                               # benchmark
        (10, "intro words " + bench_text + " outro"),  # leaked
        (11, "totally clean text with enough words to windowize ok"),
        (12, "short"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    bench = docs.where(F.col("doc_id") < 10)
    corpus = docs.where(~(F.col("doc_id") < 10))
    got = {r.doc_id: (r.n_windows, r.n_contaminated, r.contaminated)
           for r in contamination_flags(corpus, bench, k=8).collect()}
    # doc 10 has 12 words -> 5 windows; the bench text contributes
    # 9 words -> 2 of its windows are exact bench windows
    assert got[10] == (5, 2, True)
    assert got[11][2] is False and got[11][1] == 0
    assert got[12] == (0, 0, False)

    con = _duck.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    ora = {r[0]: (r[1], r[2], r[3]) for r in con.execute(
        contamination_oracle_sql(k=8, bench_pred="doc_id < 10"))
        .fetchall()}
    assert ora == got


def test_ingest_dedup_flags_planted(spark):
    """Snapshot-vs-delta dedup: an exact copy flags exact+near, a
    one-word tweak of a LONG doc flags near only, fresh text keeps.
    Within-batch duplicates of the incoming set do NOT flag (the
    check is against existing only)."""
    from cuphic_spark.operators.dedup import ingest_dedup_flags

    long_text = " ".join(f"w{i % 37}tok{i % 11}" for i in range(120))
    existing = spark.createDataFrame(
        [(1, long_text), (2, "some other corpus document here")],
        "doc_id long, text string")
    incoming = spark.createDataFrame(
        [(10, long_text),                  # exact (and near, d=0)
         (11, long_text + " x"),           # near only
         (12, "completely different fresh content entirely"),
         (13, "completely different fresh content entirely")],
        "doc_id long, text string")        # 12/13: batch-internal dup
    got = {r.doc_id: (r.exact_dup, r.near_dup, r.keep)
           for r in ingest_dedup_flags(existing, incoming).collect()}
    assert got[10] == (True, True, False)
    assert got[11] == (False, True, False)
    assert got[12] == (False, False, True)
    assert got[13] == (False, False, True)  # existing-only semantics


def test_nfc_normalization(spark):
    """NFC composition: combining sequences compose (e+0301 -> é,
    A+030A -> Å), already-NFC text is untouched and unflagged, null
    passes through; equality-keyed dedup MISSES the duplicate until
    normalization and catches it after — the operator's raison
    d'être."""
    from cuphic_spark.operators.dedup import exact_dedup_groups
    from cuphic_spark.operators.webclean import normalize_nfc

    decomp = "cafe" + chr(0x301)
    comp = "caf" + chr(0xE9)
    docs = spark.createDataFrame(
        [(1, decomp), (2, comp), (3, "plain"), (4, None)],
        "doc_id long, text string")
    got = {r.doc_id: (r.normalized, r.was_denormalized)
           for r in normalize_nfc(docs).collect()}
    assert got[1] == (comp, True)
    assert got[2] == (comp, False)
    assert got[3] == ("plain", False)
    assert got[4] == (None, False)

    # before: byte-unequal -> no dup group; after: one group of 2
    # (exact_dedup_groups already filters to n_copies > 1)
    before = exact_dedup_groups(docs.where("text is not null"))
    after = exact_dedup_groups(
        normalize_nfc(docs.where("text is not null"))
        .select("doc_id", F.col("normalized").alias("text")))
    assert before.count() == 0
    assert after.count() == 1


def test_jpeg_hierarchical_annex_j():
    """Hierarchical JPEG (T.81 Annex J): DHP + half-res base frame +
    EXP(1,1) + SOF5 differential residual. The closed-loop encoder
    models the decoder's reference exactly, so at quality 100 the
    residual frame recovers even noise to within rounding; odd dims
    crop after expansion; the EXP doubling filter matches the spec's
    hand-computed values; SOF5 without DHP and differential
    progressive (SOF6) refuse loudly."""
    import numpy as np
    import pytest as _pytest

    from cuphic_spark.operators.jpeg import (
        _exp_upsample, decode_jpeg, encode_jpeg_hierarchical)

    rng = np.random.default_rng(31)

    # spec filter: evens copy, odds rounded mean, edge replicates
    row = np.array([[0, 10, 255]], dtype=np.int64)
    up = _exp_upsample(row, 1, 0)
    assert up.tolist() == [[0, 5, 10, 133, 255, 255]]
    col = _exp_upsample(row.T, 0, 1)
    assert col.T.tolist() == [[0, 5, 10, 133, 255, 255]]

    noise = rng.integers(0, 256, (33, 41), dtype=np.uint8)  # odd dims
    data = encode_jpeg_hierarchical(noise, quality=100)
    assert b"\xff\xde" in data and b"\xff\xdf" in data \
        and b"\xff\xc5" in data
    out = decode_jpeg(data)
    assert out.shape == (33, 41, 3)
    err = np.abs(out[:, :, 0].astype(float) - noise.astype(float))
    assert err.max() <= 2

    x = np.linspace(0, 255, 64)
    grad = ((np.meshgrid(x, x)[0] + np.meshgrid(x, x)[1]) / 2) \
        .astype(np.uint8)
    g = decode_jpeg(encode_jpeg_hierarchical(grad, quality=90))
    assert np.abs(g[:, :, 0].astype(float)
                  - grad.astype(float)).max() <= 4

    # SOF5 with no preceding DHP: loud ValueError
    bad = bytearray(data)
    i = bad.index(b"\xff\xde")
    bad[i:i + 4 + int.from_bytes(bad[i + 2:i + 4], "big") - 2] = \
        b""  # strip the DHP segment entirely
    with _pytest.raises(ValueError, match="without a preceding DHP"):
        decode_jpeg(bytes(bad))

    # differential progressive (SOF6) remains a named refusal
    sof6 = bytearray(data)
    sof6[sof6.index(b"\xff\xc5") + 1] = 0xC6
    with _pytest.raises(NotImplementedError, match="0xFFC6"):
        decode_jpeg(bytes(sof6))


def test_minhash_signature_matches_column_expr_twin(spark, docs):
    """Round-8 optimization pin: minhash_signature moved from pure
    column expressions (explode -> md5 -> groupBy min; interpreted
    higher-order shingle build + SortAggregate dominated the bench
    section) to an Arrow-batched native map. The old shape lives on
    here as the differential twin — byte-identical rows required,
    both for the 1-seed hot path and the multi-seed generic path."""
    from cuphic_spark.operators.dedup import _shingles, minhash_signature

    corpus = docs.select("doc_id", "text").unionByName(
        spark.createDataFrame(
            [(90001, None), (90002, "one two"), (90003, ""),
             (90004, "a  b c"), (90005, "x y z")],
            "doc_id long, text string"))

    def column_expr_twin(d, k, n_hashes):
        sh = _shingles(F.col("text"), k)
        exploded = (d.where(F.size(F.split(F.col("text"), " ")) >= k)
                    .select("doc_id", F.explode(sh).alias("s")))
        n_seeds = -(-n_hashes // 4)
        digested = exploded.select(
            "doc_id", *[F.md5(F.concat(F.lit(f"{j}:"), F.col("s")))
                        .alias(f"d{j}") for j in range(n_seeds)])
        aggs = [F.min(F.substring(F.col(f"d{i // 4}"),
                                  (i % 4) * 8 + 1, 8))
                .alias(f"minhash_{i}") for i in range(n_hashes)]
        return digested.groupBy("doc_id").agg(*aggs)

    for n_hashes in (4, 8):
        twin = column_expr_twin(corpus, 3, n_hashes)
        got = minhash_signature(corpus, k=3, n_hashes=n_hashes)
        assert got.schema == twin.schema
        assert twin.exceptAll(got).count() == 0
        assert got.exceptAll(twin).count() == 0

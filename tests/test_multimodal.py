"""Multimodal column plumbing: binary payloads through mapInPandas."""

from __future__ import annotations

import pytest

from parquet_processor_spark.ops.multimodal import (
    FEATURE_SCHEMA,
    decode_image,
    documents_as_media,
    extract_features,
    fake_decoder,
)

from .conftest import SF_SMALL


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_extract_features_with_fake_decoder(spark):
    media = documents_as_media(spark, SF_SMALL)
    feats = extract_features(media, decoder=fake_decoder)
    assert feats.schema == FEATURE_SCHEMA
    rows = feats.collect()
    assert len(rows) == 500
    r = rows[0]
    assert r["n_bytes"] > 0
    assert 1 <= r["width"] <= 640 and 1 <= r["height"] <= 480
    assert len(r["feature"]) == 8
    assert all(0.0 <= v <= 1.0 for v in r["feature"])


def test_extract_features_stub_degrades_gracefully(spark):
    media = documents_as_media(spark, SF_SMALL).limit(5)
    feats = extract_features(media)  # default decoder raises NotImplementedError
    rows = feats.collect()
    assert len(rows) == 5
    assert all(r["width"] is None and r["n_bytes"] > 0 for r in rows)


def test_resize_is_deterministic_and_sized(spark, sf_dir):
    from parquet_processor_spark.ops.multimodal import documents_as_media, resize_media

    media = documents_as_media(spark, sf_dir).limit(20)
    out = resize_media(media, 64, 64).collect()
    assert all(len(r["content"]) == 64 * 64 // 64 for r in out)
    again = resize_media(media, 64, 64).collect()
    assert sorted((r["media_id"], bytes(r["content"])) for r in out) == sorted(
        (r["media_id"], bytes(r["content"])) for r in again
    )


def test_frame_sampling_fans_out(spark, sf_dir):
    from parquet_processor_spark.ops.multimodal import documents_as_media, sample_frames

    media = documents_as_media(spark, sf_dir).limit(10)
    frames = sample_frames(media, n_frames=4)
    rows = frames.collect()
    assert len(rows) == 40
    per = {}
    for r in rows:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == [0, 1, 2, 3] for v in per.values())
    assert all(r["n_bytes"] == len(r["frame"]) for r in rows)


def test_clip_pairs_caption_gate_and_coverage(spark, sf_dir):
    from parquet_processor_spark.ops.multimodal import (
        _CLIP_CAP_MAX_TOK,
        _CLIP_CAP_MIN_TOK,
    )
    from parquet_processor_spark.registry import all_queries
    from parquet_processor_spark.tables import t

    rows = all_queries()["multimodal_clip_pairs"](spark, sf_dir).collect()
    docs = {r["doc_id"]: r for r in t(spark, sf_dir, "documents").collect()}
    assert len(rows) == len(docs)
    for r in rows:
        if r["caption_doc"] is not None:
            cap = docs[r["caption_doc"]]
            # the chosen caption must satisfy the gate and share the source
            assert cap["lang"] == "en"
            assert cap["source"] == r["source"]
            n_tok = len([w for w in (cap["text"] or "").split() if w])
            assert _CLIP_CAP_MIN_TOK <= n_tok <= _CLIP_CAP_MAX_TOK
            assert r["caption_n_tokens"] == n_tok
            assert r["is_self"] == (r["caption_doc"] == r["media_id"])
            # determinism: lowest-id gated caption of the source wins
            better = [
                d for d in docs.values()
                if d["source"] == r["source"] and d["lang"] == "en"
                and d["doc_id"] < r["caption_doc"]
                and _CLIP_CAP_MIN_TOK
                <= len([w for w in (d["text"] or "").split() if w])
                <= _CLIP_CAP_MAX_TOK
            ]
            assert not better


def test_frame_dedup_localizes_injected_reencodes(spark, sf_dir):
    # Every injected re-encode stream (media_id >= 1e9) must have ALL
    # FOUR frames either exactly matching or within the Hamming budget
    # of the original stream's aligned frames — the in-place
    # substitution keeps alignment, so frame-level dedup localizes
    # every segment.
    from parquet_processor_spark.registry import all_queries

    rows = all_queries()["multimodal_frame_dedup"](spark, sf_dir).collect()
    inj = [r for r in rows if r["media_id"] >= 1_000_000_000]
    assert inj, "fixture must inject re-encoded streams"
    for r in inj:
        assert r["is_dup"], f"injected frame not matched: {r}"
        # the canonical match must be the aligned frame of the original
        orig_fid = (r["media_id"] - 1_000_000_000) * 4 + r["frame_idx"]
        assert r["dup_of"] <= orig_fid
    # frame ids decompose consistently
    for r in rows:
        assert r["fid"] == r["media_id"] * 4 + r["frame_idx"]


def test_phash_bands_arrow_bit_exact_with_jvm(spark, sf_dir):
    from pyspark.sql import functions as F

    from parquet_processor_spark.ops.multimodal import _phash_bands, _phash_bands_arrow
    from parquet_processor_spark.tables import t

    media = t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.coalesce(F.col("text"), F.lit("")).alias("content"),
    )
    # include adversarial shapes: empty, 1-char, shorter than the 65
    # sample blocks
    extra = spark.createDataFrame(
        [(10_000_001, ""), (10_000_002, "a"), (10_000_003, "short text"), (10_000_004, "x" * 64),
         # non-ASCII: the kernel must frame CHARACTERS (code points),
         # not utf-8 bytes — these rows diverge under a bytes decode
         (10_000_005, "é" * 65), (10_000_006, "naïve café déjà vu " * 8)],
        "media_id long, content string",
    )
    both = media.unionByName(extra)
    jvm = {r["media_id"]: tuple(r[f"b{c}"] for c in range(8)) for r in _phash_bands(both).collect()}
    arrow = {r["media_id"]: tuple(r[f"b{c}"] for c in range(8)) for r in _phash_bands_arrow(both).collect()}
    assert jvm == arrow and len(jvm) > 100


def test_media_curation_dispositions_are_exhaustive_and_consistent(spark, sf_dir):
    from parquet_processor_spark.registry import all_queries

    from parquet_processor_spark.tables import t

    rows = all_queries()["pipeline_curate_media"](spark, sf_dir).collect()
    by_status = {}
    for r in rows:
        by_status.setdefault(r["status"], []).append(r)
    assert set(by_status) <= {
        "kept", "drop_exact_dup", "drop_near_dup", "drop_no_caption", "drop_self_caption",
    }
    assert "kept" in by_status and "drop_near_dup" in by_status
    n_docs = t(spark, sf_dir, "documents").count()
    assert len(rows) == n_docs + n_docs // 10 + (1 if n_docs % 10 else 0) or len(rows) > n_docs
    for r in rows:
        if r["status"] == "kept":
            assert r["caption_doc"] is not None and r["shard"] is not None
            assert 0 <= r["shard"] < 8
        else:
            assert r["caption_doc"] is None and r["shard"] is None


def test_audio_landmarks_are_shift_invariant(spark, sf_dir):
    # A whole-frame prefix shift must preserve EVERY source landmark:
    # the shifted copy's hash set is a superset of the source's. This
    # is the property the dHash pass lacks (global resampling moves
    # every block) and the reason the landmark pass exists.
    from pyspark.sql import functions as F

    from parquet_processor_spark.ops.multimodal import (
        _AUDIO_PREFIX,
        _audio_landmarks,
    )
    from parquet_processor_spark.tables import t

    docs = t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("track_id"),
        F.coalesce(F.col("text"), F.lit("")).alias("content"),
    )
    shifted = docs.select(
        (F.col("track_id") + 1_000_000_000).alias("track_id"),
        F.concat(F.lit(_AUDIO_PREFIX), F.col("content")).alias("content"),
    )
    lm = {
        r["track_id"]: set(r["hashes"])
        for r in _audio_landmarks(docs.unionByName(shifted)).collect()
    }
    n_src = 0
    for tid, hashes in lm.items():
        if tid >= 1_000_000_000:
            continue
        n_src += 1
        assert hashes <= lm[tid + 1_000_000_000], f"landmarks lost under shift: {tid}"
    assert n_src >= 50


def test_audio_dedup_catches_all_fingerprintable_shifts(spark, sf_dir):
    from parquet_processor_spark.registry import all_queries

    rows = all_queries()["multimodal_dedup_audio"](spark, sf_dir).collect()
    by_id = {r["track_id"]: r for r in rows}
    inj = [r for r in rows if r["track_id"] >= 1_000_000_000]
    assert inj, "fixture must inject shifted re-records"
    for r in inj:
        src = by_id[r["track_id"] - 1_000_000_000]
        if src["n_landmarks"] >= 2:
            assert r["is_dup"], f"fingerprintable shift missed: {r}"
            assert r["dup_of"] < 1_000_000_000
    gate = all_queries()["recall_dedup_audio"](spark, sf_dir).collect()[0]
    assert gate["recall_ok"]
    assert gate["n_true_pairs"] >= 1


def test_audio_dedup_unfingerprintable_tracks_are_honest(spark, sf_dir):
    # Tracks with < 2 landmarks (monotone byte streams) must never be
    # flagged as the KEPT side of a match they cannot attest to: a
    # track with zero landmarks shares zero hashes, so it is never
    # is_dup and never dup_of.
    from parquet_processor_spark.registry import all_queries

    rows = all_queries()["multimodal_dedup_audio"](spark, sf_dir).collect()
    zero = {r["track_id"] for r in rows if r["n_landmarks"] == 0}
    for r in rows:
        if r["track_id"] in zero:
            assert not r["is_dup"]
        if r["dup_of"] is not None:
            assert r["dup_of"] not in zero


def test_audio_landmarks_arrow_set_exact_with_jvm(spark, sf_dir):
    from pyspark.sql import functions as F

    from parquet_processor_spark.ops.multimodal import (
        _audio_landmarks,
        _audio_landmarks_arrow,
    )
    from parquet_processor_spark.tables import t

    media = t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("track_id"),
        F.coalesce(F.col("text"), F.lit("")).alias("content"),
    )
    extra = spark.createDataFrame(
        [(10_000_001, ""), (10_000_002, "a"), (10_000_003, "short text"),
         (10_000_004, "x" * 64), (10_000_005, "ab " * 40),
         # non-ASCII: frames are CHARACTER code points, not utf-8 bytes
         (10_000_006, "é" * 48), (10_000_007, "naïve café déjà vu " * 8)],
        "track_id long, content string",
    )
    both = media.unionByName(extra)
    jvm = {r["track_id"]: (r["n_landmarks"], set(r["hashes"])) for r in _audio_landmarks(both).collect()}
    arrow = {r["track_id"]: (r["n_landmarks"], set(r["hashes"])) for r in _audio_landmarks_arrow(both).collect()}
    assert jvm == arrow and len(jvm) > 100


def test_incremental_audio_dedup_labels_only_the_delta(spark, sf_dir):
    # The incremental operator must emit exactly the delta tracks, and
    # agree with the FULL operator's verdict for each of them (same
    # match rule, probe-vs-self-join plan difference only).
    from parquet_processor_spark.registry import all_queries

    full = {
        r["track_id"]: (r["is_dup"], r["dup_of"])
        for r in all_queries()["multimodal_dedup_audio"](spark, sf_dir).collect()
        if r["track_id"] >= 1_000_000_000
    }
    incr = {
        r["track_id"]: (r["is_dup"], r["dup_of"])
        for r in all_queries()["multimodal_dedup_audio_incr"](spark, sf_dir).collect()
    }
    assert set(incr) == set(full) and len(incr) > 0
    assert incr == full


def test_audio_trim_restores_every_injected_original(spark, sf_dir):
    # The injected prefix is exactly 2 whole silence frames, so
    # frame-level trimming must restore the source payload
    # bit-for-bit (exact_after_trim true for EVERY injected track),
    # while untouched corpus tracks lose nothing (first_loud 0,
    # trimmed length == content length).
    from pyspark.sql import functions as F

    from parquet_processor_spark.registry import all_queries
    from parquet_processor_spark.tables import t as tt

    rows = all_queries()["multimodal_audio_trim"](spark, sf_dir).collect()
    inj = [r for r in rows if r["track_id"] >= 1_000_000_000]
    assert inj and all(r["exact_after_trim"] for r in inj)
    lens = {
        r["doc_id"]: r["n"]
        for r in tt(spark, sf_dir, "documents")
        .select("doc_id", F.length(F.coalesce("text", F.lit(""))).alias("n"))
        .collect()
    }
    for r in rows:
        if r["track_id"] < 1_000_000_000:
            assert r["first_loud"] == 0
            assert r["trimmed_chars"] == lens[r["track_id"]]
        else:
            assert r["first_loud"] == 2  # the injected 2-frame prefix


def test_scene_cut_segmentation_invariants(spark, sf_dir):
    # Witness: recompute dHash hamming between consecutive frames in
    # Python (reusing the tested JVM-twin contract via the operator's
    # own signature pass would be circular — so recompute from raw
    # text with the block-mean/gradient recipe) and check the cut
    # labels plus scene bookkeeping invariants: frame 0 always opens
    # scene 0, scene ids are contiguous and non-decreasing, is_cut
    # MUST match ham_prev vs threshold, and the fixture is genuinely
    # bimodal (some multi-scene and some single-scene-after-0 media).
    from parquet_processor_spark.ops.multimodal import _PHASH_PIX, _SCENE_CUT_HAM, multimodal_scene_cut
    from parquet_processor_spark.tables import t

    def dhash(s: str) -> int:
        cps = [ord(c) for c in s]
        n = len(cps)
        if n == 0:
            pix = [0] * _PHASH_PIX
        else:
            pix = []
            for i in range(_PHASH_PIX):
                lo, hi = i * n // _PHASH_PIX, (i + 1) * n // _PHASH_PIX
                block = cps[lo:hi]
                pix.append(sum(block) // max(len(block), 1))
        return sum((1 << j) for j in range(_PHASH_PIX - 1) if pix[j] > pix[j + 1])

    docs = {r["doc_id"]: (r["text"] or "") for r in t(spark, sf_dir, "documents").collect()}
    rows = sorted(
        ((r["media_id"], r["frame_idx"], r) for r in multimodal_scene_cut(spark, sf_dir).collect())
    )
    by_media: dict = {}
    for m, fi, r in rows:
        by_media.setdefault(m, []).append(r)
    assert set(by_media) == set(docs)
    multi = single = 0
    for m, frames in by_media.items():
        text = docs[m]
        step = max(len(text) // 4, 1)
        sigs = [dhash(text[i * step : (i + 1) * step]) for i in range(4)]
        assert [r["frame_idx"] for r in frames] == [0, 1, 2, 3]
        assert frames[0]["ham_prev"] is None and frames[0]["is_cut"] and frames[0]["scene_id"] == 0
        prev_scene = 0
        for i in range(1, 4):
            r = frames[i]
            ham = bin(sigs[i] ^ sigs[i - 1]).count("1")
            assert r["ham_prev"] == ham
            assert r["is_cut"] == (ham > _SCENE_CUT_HAM)
            assert r["scene_id"] == prev_scene + (1 if r["is_cut"] else 0)
            prev_scene = r["scene_id"]
        n_scenes = frames[-1]["scene_id"] + 1
        multi += n_scenes > 1
        single += n_scenes == 1
    assert multi > 0 and single > 0, "fixture must exercise both cut and no-cut paths"

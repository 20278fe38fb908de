"""Streaming ingest (foreachBatch merge), watermarked windows, session
windows, and multimodal feature-extraction plumbing."""

from __future__ import annotations

import hashlib
import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from reddit_hn_etl_spark.functions import multimodal as mm
from reddit_hn_etl_spark.streaming import ingest

T_BASE = 1705276800  # 2024-01-15 00:00:00 UTC


def _write_jsonl(path, records):
    with open(path, "w", encoding="utf-8") as f:
        for r in records:
            f.write(json.dumps(r) + "\n")


def test_stream_merge_converges_with_batch_merge(spark, tmp_path):
    raw = tmp_path / "raw"
    raw.mkdir()
    _write_jsonl(raw / "b1.jsonl", [
        {"id": 1, "type": "story", "by": "a", "time": T_BASE, "title": "t1", "score": 1},
        {"id": 2, "type": "story", "by": "b", "time": T_BASE + 60, "title": "t2"},
    ])
    staging = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")

    q = ingest.stream_merge_to_staging(
        ingest.read_raw_stream(spark, str(raw)), staging, ckpt, available_now=True
    )
    q.awaitTermination(120)

    got = {r.id: r for r in spark.read.parquet(staging).collect()}
    assert sorted(got) == [1, 2] and got[1].score == 1

    # second file arrives: id=2 refreshed (newer time→fresher batch), id=3 new
    _write_jsonl(raw / "b2.jsonl", [
        {"id": 2, "type": "story", "by": "b", "time": T_BASE + 7200, "title": "t2-edit", "score": 9},
        {"id": 3, "type": "story", "by": "c", "time": T_BASE + 7260, "title": "t3"},
    ])
    q = ingest.stream_merge_to_staging(
        ingest.read_raw_stream(spark, str(raw)), staging, ckpt, available_now=True
    )
    q.awaitTermination(120)

    got = {r.id: r for r in spark.read.parquet(staging).collect()}
    assert sorted(got) == [1, 2, 3]
    assert got[2].title == "t2-edit" and got[2].score == 9


def test_stream_stamp_from_filename_is_monotone(spark, tmp_path):
    """ADVICE r1 (medium): a later extraction whose *event* times are
    older must still win the freshness merge — extracted_at derives
    from the batch FILENAME timestamp (reference semantics), not from
    max event time."""
    raw = tmp_path / "raw"
    raw.mkdir()
    staging = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")

    # Extraction 1: event time far in the "future" relative to ext 2.
    _write_jsonl(raw / "hn_raw_20240115_000000.json", [
        {"id": 1, "type": "story", "by": "a", "time": T_BASE + 7200,
         "title": "v1", "score": 1},
    ])
    q = ingest.stream_merge_to_staging(
        ingest.read_raw_stream(spark, str(raw)), staging, ckpt,
        available_now=True,
    )
    q.awaitTermination(120)

    # Extraction 2 (newer filename): same key, OLDER event time,
    # updated content. Max-event-time stamping would discard it.
    _write_jsonl(raw / "hn_raw_20240116_000000.json", [
        {"id": 1, "type": "story", "by": "a", "time": T_BASE,
         "title": "v2", "score": 5},
    ])
    q = ingest.stream_merge_to_staging(
        ingest.read_raw_stream(spark, str(raw)), staging, ckpt,
        available_now=True,
    )
    q.awaitTermination(120)

    got = {r.id: r for r in spark.read.parquet(staging).collect()}
    assert got[1].title == "v2" and got[1].score == 5
    # Stamp is the filename instant, not the event time.
    assert got[1].extracted_at.strftime("%Y%m%d") == "20240116"


def test_stream_dead_letters_contract_violations(spark, tmp_path):
    """ADVICE r1: rows failing the staging contract (null id/time
    after strict cast) must not enter the merge as phantom keys —
    they are routed to the dead-letter sink and the stream
    continues."""
    raw = tmp_path / "raw"
    raw.mkdir()
    staging = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")
    dl = str(tmp_path / "dead")

    _write_jsonl(raw / "hn_raw_20240115_000000.json", [
        {"id": 1, "type": "story", "by": "a", "time": T_BASE,
         "title": "good", "score": 1},
        # time missing → null after cast → contract violation
        {"id": 7, "type": "story", "by": "x", "title": "poison"},
    ])
    q = ingest.stream_merge_to_staging(
        ingest.read_raw_stream(spark, str(raw)), staging, ckpt,
        available_now=True, dead_letter_root=dl,
    )
    q.awaitTermination(120)

    ok = {r.id for r in spark.read.parquet(staging).collect()}
    assert ok == {1}
    dead = spark.read.parquet(dl).collect()
    assert len(dead) == 1 and dead[0].id == 7 and dead[0]._batch_id == 0


def test_windowed_counts_batch_equivalence(spark, sf_dir):
    from reddit_hn_etl_spark.sources.tables import read_table

    ev = read_table(spark, sf_dir, "events")
    win = ingest.windowed_event_counts(ev, window="1 hour")
    rows = win.collect()
    assert sum(r.events_count for r in rows) == ev.count()
    assert all(r.window_end > r.window_start for r in rows)


def test_session_windows_gap_semantics(spark):
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00", 1.0),
            (1, "2024-01-01 10:10:00", 1.0),   # same session (gap 10m < 30m)
            (1, "2024-01-01 11:30:00", 1.0),   # new session (gap 80m)
            (2, "2024-01-01 10:00:00", 1.0),
        ],
        "user_id long, ts_str string, value double",
    ).select("user_id", F.to_timestamp("ts_str").alias("ts"), "value")
    out = ingest.session_windows(ev, gap="30 minutes").collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r.user_id, []).append(r)
    assert len(per_user[1]) == 2 and len(per_user[2]) == 1
    first = min(per_user[1], key=lambda r: r.session_start)
    assert first.n_events == 2


@pytest.fixture()
def media_df(spark):
    rows = [
        Row(
            media_id=i,
            payload=hashlib.sha256(str(i).encode()).digest() * 4,
            meta=Row(mime="image/png", width=None, height=None,
                     duration_ms=(i + 1) * 10000),
        )
        for i in range(6)
    ] + [Row(media_id=99, payload=None, meta=Row(mime=None, width=None,
                                                 height=None, duration_ms=None))]
    return spark.createDataFrame(rows, mm.MEDIA_SCHEMA)


def test_image_features_deterministic(spark, media_df):
    out1 = {r.media_id: r for r in mm.extract_image_features(media_df).collect()}
    out2 = {r.media_id: r for r in mm.extract_image_features(media_df).collect()}
    assert sorted(out1) == [0, 1, 2, 3, 4, 5]  # null payload skipped
    for mid in out1:
        assert out1[mid].features == out2[mid].features  # deterministic fake
        assert len(out1[mid].features) == mm.IMAGE_FEATURE_DIM
        assert out1[mid].width >= 64 and out1[mid].height >= 64


def test_frame_offsets_plan(spark, media_df):
    out = mm.sample_frame_offsets(media_df, n_frames=4).collect()
    by_media = {}
    for r in out:
        by_media.setdefault(r.media_id, []).append(r.frame_offset_ms)
    assert 99 not in by_media  # null duration filtered
    assert by_media[0] == [1250, 3750, 6250, 8750]  # evenly spaced mid-frames
    assert all(len(v) == 4 for v in by_media.values())


def test_audio_features(spark, media_df):
    out = mm.extract_audio_features(media_df).collect()
    assert len(out) == 6 and all(len(r.features) == 8 for r in out)


def test_stream_with_incremental_marts(spark, tmp_path):
    raw = tmp_path / "raw_m"
    raw.mkdir()
    _write_jsonl(raw / "b1.jsonl", [
        {"id": 1, "type": "story", "by": "a", "time": T_BASE, "title": "t1", "score": 4},
        {"id": 2, "type": "story", "by": "b", "time": T_BASE + 86400, "title": "t2", "score": 6},
    ])
    staging = str(tmp_path / "staging_m")
    marts = str(tmp_path / "marts_m")

    q = ingest.stream_merge_to_staging(
        ingest.read_raw_stream(spark, str(raw)), staging,
        str(tmp_path / "ckpt_m"), available_now=True, marts_root=marts,
    )
    q.awaitTermination(120)

    daily = {
        str(r.metric_date): (r.stories_count, r.total_score)
        for r in spark.read.parquet(f"{marts}/daily_story_metrics").collect()
    }
    assert daily == {"2024-01-15": (1, 4), "2024-01-16": (1, 6)}


def test_resize_images(spark, media_df):
    out = {r.media_id: r for r in mm.resize_images(media_df, 32, 32).collect()}
    assert sorted(out) == [0, 1, 2, 3, 4, 5]  # null payload skipped
    r = out[0]
    assert r.meta.width == 32 and r.meta.height == 32
    assert len(r.payload) == max(32, 32 * 32 // 64)  # 32-byte floor
    # deterministic + dimension-sensitive
    again = {x.media_id: x for x in mm.resize_images(media_df, 32, 32).collect()}
    other = {x.media_id: x for x in mm.resize_images(media_df, 64, 64).collect()}
    assert bytes(again[0].payload) == bytes(r.payload)
    assert bytes(other[0].payload) != bytes(r.payload)


def test_stream_swap_recovers_from_crash_artifacts(spark, tmp_path):
    """ADVICE r1: a crash between the two swap renames leaves
    '<staging>_old' / '<staging>_b<N>' behind; the next run must
    pre-clean them instead of raising on os.rename."""
    raw = tmp_path / "raw"
    raw.mkdir()
    staging = str(tmp_path / "staging")
    ckpt = str(tmp_path / "ckpt")

    _write_jsonl(raw / "hn_raw_20240115_000000.json", [
        {"id": 1, "type": "story", "by": "a", "time": T_BASE,
         "title": "t1", "score": 1},
    ])
    # Simulate leftovers from a previous crashed run.
    import os
    os.makedirs(staging + "_old")
    (tmp_path / "staging_old" / "junk.txt").write_text("stale")
    os.makedirs(staging + "_b0")
    (tmp_path / "staging_b0" / "junk.txt").write_text("stale")

    q = ingest.stream_merge_to_staging(
        ingest.read_raw_stream(spark, str(raw)), staging, ckpt,
        available_now=True,
    )
    q.awaitTermination(120)

    got = {r.id for r in spark.read.parquet(staging).collect()}
    assert got == {1}
    assert not os.path.isdir(staging + "_old")
    assert not os.path.isdir(staging + "_b0")


def test_stream_replay_is_exactly_once(spark, tmp_path):
    """Exactly-once sink contract under induced retry (NOTES_r2): a
    foreachBatch retry re-delivers an already-merged batch (fresh
    checkpoint simulates the redelivery; a stale half-written _b0
    output dir simulates the crash mid-commit). The freshness merge
    plus the monotone filename-derived stamp must make the replay a
    no-op: staging content — including extracted_at — is identical,
    with no duplicated ids and no leftover swap artifacts."""
    import os

    raw = tmp_path / "raw"
    raw.mkdir()
    _write_jsonl(raw / "hn_raw_20240115_000000.json", [
        {"id": 1, "type": "story", "by": "a", "time": T_BASE, "title": "t1",
         "score": 1},
        {"id": 2, "type": "story", "by": "b", "time": T_BASE + 60,
         "title": "t2", "score": 2},
    ])
    staging = str(tmp_path / "staging")

    q = ingest.stream_merge_to_staging(
        ingest.read_raw_stream(spark, str(raw)), staging,
        str(tmp_path / "ckpt1"), available_now=True,
    )
    q.awaitTermination(120)
    first = sorted(
        tuple(r) for r in spark.read.parquet(staging).collect()
    )

    # Induced retry: same input files, FRESH checkpoint (so the batch
    # is re-delivered as batch 0 again), plus a crashed partial output.
    os.makedirs(staging + "_b0", exist_ok=True)
    with open(os.path.join(staging + "_b0", "partial.parquet"), "w") as f:
        f.write("torn write")
    q = ingest.stream_merge_to_staging(
        ingest.read_raw_stream(spark, str(raw)), staging,
        str(tmp_path / "ckpt2"), available_now=True,
    )
    q.awaitTermination(120)

    replayed = sorted(
        tuple(r) for r in spark.read.parquet(staging).collect()
    )
    assert replayed == first  # identical rows incl. extracted_at
    ids = [r.id for r in spark.read.parquet(staging).collect()]
    assert sorted(ids) == sorted(set(ids)) == [1, 2]
    assert not os.path.isdir(staging + "_b0")
    assert not os.path.isdir(staging + "_old")


def test_wav_decode_is_real():
    """synth → decode round trip recovers the signal physics (no
    Spark needed: this pins the decoder itself)."""
    for freq, dur in [(250.0, 200), (997.0, 350)]:
        m = mm._decode_wav(mm.synth_wav(freq, dur))
        assert m["sample_rate"] == 8000
        assert m["duration_ms"] == dur
        assert abs(m["rms"] - 0.5 / 2 ** 0.5) < 0.01
        assert abs(m["zcr_hz"] - freq) < max(5.0, freq * 0.02)
        assert abs(m["centroid_hz"] - freq) < freq * 0.05
        assert abs(sum(m["band_energy"]) - 1.0) < 1e-9
        # the tone's band carries essentially all the energy
        band = int(m["centroid_hz"] // (8000 / 2 / 4))
        assert m["band_energy"][band] > 0.95

    # non-WAV payloads refuse (callers fall back to the labeled fake)
    assert mm._decode_wav(b"not a wav at all") is None
    assert mm._decode_wav(b"") is None


def test_audio_features_real_for_wav(spark):
    """The featurizer takes the REAL path for WAV payloads: features
    reflect signal physics, not the payload hash."""
    from pyspark.sql import Row

    wav_hi = mm.synth_wav(1500.0, 300)
    wav_lo = mm.synth_wav(200.0, 300)
    df = spark.createDataFrame(
        [
            Row(media_id=1, payload=bytearray(wav_lo)),
            Row(media_id=2, payload=bytearray(wav_hi)),
            Row(media_id=3, payload=bytearray(b"opaque-compressed-blob")),
        ],
        "media_id long, payload binary",
    )
    out = {r.media_id: r.features for r in mm.extract_audio_features(df).collect()}
    # feature[2] is centroid/nyquist: ordered by true frequency
    assert out[1][2] < out[2][2]
    assert abs(out[1][0] - 0.5 / 2 ** 0.5) < 0.01  # real RMS
    # fake fallback still yields a full-width deterministic vector
    assert len(out[3]) == 8


def test_bmp_decode_is_real():
    import numpy as np

    # 16x16 gradient: exact channel means, exact dims
    w, h, px = mm._decode_bmp(mm.synth_bmp(16, 16, blue=77))
    assert (w, h) == (16, 16) and px.shape == (16, 16, 3)
    assert float(px[:, :, 0].mean()) == 120.0  # R ramp mean
    assert float(px[:, :, 1].mean()) == 120.0  # G ramp mean
    assert float(px[:, :, 2].mean()) == 77.0   # constant B
    # gradient orientation survives the bottom-up row order:
    # R grows with x, G grows with y (row 0 = top)
    assert px[0, 0, 0] == 0 and px[0, 15, 0] == 240
    assert px[0, 0, 1] == 0 and px[15, 0, 1] == 240
    # odd width exercises the 4-byte row padding
    w2, h2, px2 = mm._decode_bmp(mm.synth_bmp(13, 7, blue=5))
    assert (w2, h2) == (13, 7) and float(px2[:, :, 2].mean()) == 5.0
    # round trip through the encoder is lossless
    again = mm._decode_bmp(mm._encode_bmp(px))[2]
    assert np.array_equal(px, again)
    assert mm._decode_bmp(b"BM but not a bmp") is None


def test_resize_real_for_bmp(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(media_id=1, payload=bytearray(mm.synth_bmp(16, 16, blue=9))),
            Row(media_id=2, payload=bytearray(b"not-an-image")),
        ],
        "media_id long, payload binary",
    )
    out = {r.media_id: r for r in
           mm.resize_images(df, 8, 8).collect()}
    # BMP row: REAL resize — output decodes, has target dims, and
    # keeps the constant-B channel exactly
    r = out[1]
    assert r.meta.mime == "image/bmp"
    w, h, px = mm._decode_bmp(bytes(r.payload))
    assert (w, h) == (8, 8)
    assert float(px[:, :, 2].mean()) == 9.0
    # nearest-neighbor of the x-ramp keeps even steps: 0,32,...,224
    assert [int(v) for v in px[0, :, 0]] == [0, 32, 64, 96, 128, 160, 192, 224]
    # non-image row: labeled fake fallback
    assert out[2].meta.mime == "image/raw"


def test_wav_spectrogram_resolves_tone_switch_in_time(spark):
    """Physics check the whole-signal FFT cannot express: a file
    whose first half is a 750 Hz tone and second half 3250 Hz must
    show the band switch at the right WINDOW index. sr=8000,
    n_bands=8 -> 750 Hz sits mid-band-1 (500..1000), 3250 mid-band-6
    (3000..3500) — mid-band so Hann sidelobes stay in-band (an
    edge-frequency tone splits across two bands by design)."""
    import io
    import wave

    import numpy as np

    from reddit_hn_etl_spark.functions.multimodal import (
        extract_wav_spectrograms,
    )

    sr, half_ms = 8000, 250
    n = sr * half_ms // 1000
    t = np.arange(n) / sr
    pcm = np.concatenate([
        np.sin(2 * np.pi * 750 * t), np.sin(2 * np.pi * 3250 * t)
    ])
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((pcm * 0.5 * 32767.0).astype("<i2").tobytes())
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue())), (2, bytearray(b"not a wav"))],
        "media_id long, payload binary",
    )
    out = extract_wav_spectrograms(df, n_fft=256, hop=128).collect()
    assert len(out) == 1  # non-WAV row dropped
    row = out[0]
    assert row["sample_rate"] == sr
    mat = [list(r) for r in row["spectrogram"]]
    assert row["n_windows"] == len(mat) == (2 * n - 256) // 128 + 1
    # every window's fractions sum to ~1
    for r in mat:
        assert abs(sum(r) - 1.0) < 1e-9
    switch = n // 128  # first window whose frame crosses the boundary
    for i, r in enumerate(mat):
        if i < switch - 1:
            assert r[1] > 0.9, (i, r)  # pure 750 Hz -> band 1
        elif i > switch + 1:
            assert r[6] > 0.9, (i, r)  # pure 3250 Hz -> band 6


def test_average_hash_brightness_invariant_and_sensitive(spark):
    from reddit_hn_etl_spark.functions.multimodal import (
        average_hash,
        synth_bmp_vstripes,
    )

    rows = [
        (1, synth_bmp_vstripes(16, 16, 6, 40, 200, 0)),
        (2, synth_bmp_vstripes(16, 16, 6, 40, 200, 5)),  # brighter twin
        (3, synth_bmp_vstripes(16, 16, 8, 40, 200, 0)),  # wider stripe
        (4, bytearray(b"not a bmp")),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(p)) for i, p in rows], "media_id long, payload binary"
    )
    got = {r["media_id"]: r["ahash"] for r in average_hash(df).collect()}
    assert set(got) == {1, 2, 3}  # non-BMP dropped
    assert got[1] == got[2]  # aHash ignores global brightness shift
    assert got[1] != got[3]
    # closed form: stripe of 3 grid cols -> row byte 0b111 = 7
    assert got[1] == 7 * 72340172838076673
    assert got[3] == 15 * 72340172838076673
    # hamming between 3-col and 4-col stripes: one bit per row
    assert bin(got[1] ^ got[3]).count("1") == 8


def test_perceptual_hash_dct_differential_and_invariants(spark):
    """pHash (r8): the low-frequency DCT block is verified against an
    INDEPENDENT O(N^4) direct-summation DCT-II twin computed here from
    the definition (no shared matrix code), then the analytic
    invariants: constant image → hash 0 (all AC zero), brightness
    shift → IDENTICAL hash (DC dropped; DCT linearity makes this
    exact), 2× block upscale → identical hash (exact area pooling),
    and the five synth pattern groups → five distinct hashes."""
    import numpy as np

    from reddit_hn_etl_spark.functions.multimodal import (
        _decode_rgb,
        perceptual_hash,
        synth_bmp_phash_pattern,
    )

    def phash_reference(payload: bytes, size=32, grid=8) -> int:
        w, h, px = _decode_rgb(bytes(payload))
        gray = px.astype(np.float64).mean(axis=2)
        gray = gray.reshape(size, h // size, size, w // size).mean(
            axis=(1, 3)
        )
        # direct-summation orthonormal DCT-II from the definition
        low = np.zeros((grid, grid))
        for u in range(grid):
            for v in range(grid):
                s = 0.0
                for y in range(size):
                    for x in range(size):
                        s += (
                            gray[y, x]
                            * np.cos(np.pi * (2 * y + 1) * u / (2 * size))
                            * np.cos(np.pi * (2 * x + 1) * v / (2 * size))
                        )
                au = np.sqrt((1 if u == 0 else 2) / size)
                av = np.sqrt((1 if v == 0 else 2) / size)
                low[u, v] = au * av * s
        ac = np.round(low.ravel()[1:], 6)
        bits = (ac > np.median(ac)).astype(np.uint64)
        return int(
            (bits * (np.uint64(1) << np.arange(63, dtype=np.uint64))).sum()
        )

    rows = []
    mid = 0
    for g in range(5):
        for s in (0, 3, 6):
            rows.append((mid, g, s, synth_bmp_phash_pattern(g, s)))
            mid += 1
    # constant image + 64x64 upscale of group 0
    from reddit_hn_etl_spark.functions.multimodal import _encode_bmp

    rows.append((90, -1, 0, _encode_bmp(np.full((32, 32, 3), 77, np.uint8))))
    rows.append((91, 0, 0, synth_bmp_phash_pattern(0, 0, side=64)))
    df = spark.createDataFrame(
        [(m, bytearray(p)) for m, _, _, p in rows],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r["phash"] for r in perceptual_hash(df).collect()}
    assert len(got) == len(rows)
    # differential vs the direct-summation reference (one per group)
    for m, g, s, p in rows[:5]:
        assert got[m] == phash_reference(p), (m, g)
    # constant → 0
    assert got[90] == 0
    # brightness-shift identity within each group; groups distinct
    by_group: dict[int, set] = {}
    for m, g, s, _ in rows[:15]:
        by_group.setdefault(g, set()).add(got[m])
    assert all(len(v) == 1 for v in by_group.values()), by_group
    assert len({v.pop() for v in by_group.values()}) == 5
    # pooling invariance: 64x64 of group 0 == 32x32 of group 0
    assert got[91] == got[0]
    # median threshold keeps popcount near half (31 of 63) for the
    # non-degenerate patterns
    assert bin(got[0]).count("1") <= 31


def test_png_decode_is_real_and_format_invariant():
    """The r6 PNG path is a REAL decode: synth_png carries the same
    gradient as synth_bmp, so every pixel — and every downstream
    statistic — must be identical across formats."""
    import numpy as np

    w, h, px = mm._decode_png(mm.synth_png(16, 16, blue=77))
    assert (w, h) == (16, 16) and px.shape == (16, 16, 3)
    _, _, pb = mm._decode_bmp(mm.synth_bmp(16, 16, blue=77))
    assert np.array_equal(px, pb)
    # encoder round trip is lossless; non-PNG payloads rejected
    assert np.array_equal(mm._decode_png(mm._encode_png(px))[2], px)
    assert mm._decode_png(b"\x89PNG but not a png") is None
    assert mm._decode_png(mm.synth_bmp(4, 4, 1)) is None


def test_png_unfilters_all_five_filter_types():
    """Differential against the PNG spec: forward-filter the
    scanlines HERE (Sub/Up/Average/Paeth per the spec's reference
    algorithms), hand-assemble the IDAT, and the decoder must invert
    every filter back to the original pixels."""
    import struct
    import zlib

    import numpy as np

    rng_px = np.frombuffer(
        hashlib.sha256(b"png-filter-fixture").digest() * 30, dtype=np.uint8
    )[: 10 * 4 * 3].reshape(10, 4, 3)
    h, w, _ = rng_px.shape
    bpp = 3

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    raw = bytearray()
    prev = np.zeros(w * bpp, dtype=np.int64)
    for y in range(h):
        line = rng_px[y].reshape(-1).astype(np.int64)
        f = y % 5  # cycle through all five filter types
        raw.append(f)
        for x in range(w * bpp):
            a = int(line[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            v = int(line[x])
            if f == 0:
                out = v
            elif f == 1:
                out = (v - a) % 256
            elif f == 2:
                out = (v - b) % 256
            elif f == 3:
                out = (v - (a + b) // 2) % 256
            else:
                out = (v - paeth(a, b, c)) % 256
            raw.append(out)
        prev = line

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    payload = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )
    got = mm._decode_png(payload)
    assert got is not None
    assert np.array_equal(got[2], rng_px)


def test_png_gray_and_rgba_color_types():
    import struct
    import zlib

    import numpy as np

    def build(ctype_code, channels, px_bytes, w, h):
        raw = b"".join(
            b"\x00" + px_bytes[y * w * channels : (y + 1) * w * channels]
            for y in range(h)
        )

        def chunk(ctype, data):
            return (
                struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
            )

        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(
                b"IHDR",
                struct.pack(">IIBBBBB", w, h, 8, ctype_code, 0, 0, 0),
            )
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )

    # grayscale 3x2 ramp → replicated across RGB
    gray = bytes([0, 50, 100, 150, 200, 250])
    w_, h_, px = mm._decode_png(build(0, 1, gray, 3, 2))
    assert (w_, h_) == (3, 2)
    assert px[0, 1, 0] == px[0, 1, 1] == px[0, 1, 2] == 50
    # RGBA → alpha dropped
    rgba = bytes(range(2 * 2 * 4))
    w_, h_, px = mm._decode_png(build(6, 4, rgba, 2, 2))
    assert (w_, h_) == (2, 2)
    assert [int(v) for v in px[0, 0]] == [0, 1, 2]  # alpha byte 3 gone
    assert [int(v) for v in px[1, 1]] == [12, 13, 14]


def test_image_features_and_ahash_format_invariant(spark):
    """Same pixels through BMP and PNG ⇒ identical REAL features and
    identical perceptual hash — the format boundary adds nothing."""
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(media_id=1, payload=bytearray(mm.synth_bmp(16, 16, blue=9))),
            Row(media_id=2, payload=bytearray(mm.synth_png(16, 16, blue=9))),
        ],
        "media_id long, payload binary",
    )
    feats = {
        r.media_id: (r.width, r.height, tuple(r.features))
        for r in mm.extract_image_features(df).collect()
    }
    assert feats[1] == feats[2]
    assert feats[1][0] == 16  # real dims, not fake
    hashes = {r.media_id: r.ahash for r in mm.average_hash(df).collect()}
    assert hashes[1] == hashes[2]


def test_resize_real_for_png(spark):
    """PNG in → REAL nearest-neighbor resize → PNG out, pixel-equal
    to the BMP twin's resize."""
    import numpy as np
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(media_id=1, payload=bytearray(mm.synth_png(16, 16, blue=9))),
            Row(media_id=2, payload=bytearray(mm.synth_bmp(16, 16, blue=9))),
        ],
        "media_id long, payload binary",
    )
    out = {r.media_id: r for r in mm.resize_images(df, 8, 8).collect()}
    assert out[1].meta.mime == "image/png"
    assert out[2].meta.mime == "image/bmp"
    _, _, png_px = mm._decode_png(bytes(out[1].payload))
    _, _, bmp_px = mm._decode_bmp(bytes(out[2].payload))
    assert np.array_equal(png_px, bmp_px)
    assert [int(v) for v in png_px[0, :, 0]] == [
        0, 32, 64, 96, 128, 160, 192, 224,
    ]


def test_y4m_decode_is_real():
    """Y4M container decode: neutral chroma ⇒ RGB equals the luma
    plane EXACTLY (BT.601 terms vanish at U=V=128) — closed-form
    gray-gradient check, C444 and C420, plus frame segmentation."""
    import numpy as np

    ramp = np.tile(np.arange(16, dtype=np.uint8) * 16, (8, 1))  # 8x16
    clip = mm.synth_y4m(16, 8, [ramp, 200], colorspace="C444")
    w, h, frames = mm._decode_y4m(clip)
    assert (w, h, len(frames)) == (16, 8, 2)
    assert np.array_equal(frames[0][:, :, 0], ramp)
    assert np.array_equal(frames[0][:, :, 0], frames[0][:, :, 2])
    assert int(frames[1].min()) == int(frames[1].max()) == 200
    # C420 with neutral chroma: same exact luma round trip
    w, h, f420 = mm._decode_y4m(
        mm.synth_y4m(16, 8, [ramp], colorspace="C420")
    )
    assert np.array_equal(f420[0][:, :, 1], ramp)
    # non-Y4M rejected
    assert mm._decode_y4m(b"RIFF not a video") is None
    assert mm._decode_y4m(mm.synth_bmp(4, 4, 1)) is None


def test_sample_video_frames_feeds_real_image_path(spark):
    """End-to-end multimodal composition on a REAL container: Y4M
    clip whose pattern flips mid-clip → sample 4 frames → the frames
    are real PNGs → aHash over them detects exactly the flip, and
    image features are exact for the constant frames."""
    import numpy as np
    from pyspark.sql import Row

    stripes_a = np.tile(
        np.array([0] * 8 + [255] * 8, dtype=np.uint8), (16, 1)
    )  # 16x16: left half dark, right half bright
    stripes_b = stripes_a.T.copy()  # top/bottom halves — distinct aHash
    clip = mm.synth_y4m(16, 16, [stripes_a] * 6 + [stripes_b] * 6)
    df = spark.createDataFrame(
        [Row(media_id=7, payload=bytearray(clip)),
         Row(media_id=8, payload=bytearray(b"not a video"))],
        "media_id long, payload binary",
    )
    frames = mm.sample_video_frames(df, n_frames=4)
    rows = frames.collect()
    assert {r.media_id for r in rows} == {7}  # stub can't fake frames
    assert [r.frame_no for r in sorted(rows, key=lambda r: r.frame_idx)] == [
        1, 4, 7, 10,
    ]
    # each sampled frame is a REAL PNG of the right pattern
    for r in rows:
        w, h, px = mm._decode_png(bytes(r.payload))
        want = stripes_a if r.frame_no < 6 else stripes_b
        assert np.array_equal(px[:, :, 0], want)
    hashes = {
        r.media_id: r.ahash
        for r in mm.average_hash(
            frames.select(F.col("frame_idx").alias("media_id"), "payload")
        ).collect()
    }
    assert hashes[0] == hashes[1] and hashes[2] == hashes[3]
    assert hashes[1] != hashes[2]  # the cut, found via real decode


def test_gif_lzw_differential_and_decode():
    """GIF LZW decode inverts the in-module encoder across palette
    widths, including streams that force table growth, code-width
    widening, and the 4096-entry reset; full-file decode is pixel-
    identical to the BMP twin of the same gradient."""
    import numpy as np

    rng = np.random.default_rng(7)
    for mcs in (2, 4, 8):
        for n in (1, 64, 5000):
            idx = rng.integers(0, 1 << mcs, size=n, dtype=np.uint8)
            enc = mm._lzw_encode_gif(idx.tolist(), mcs)
            dec = np.frombuffer(
                mm._lzw_decode_gif(enc, mcs, n), dtype=np.uint8
            )
            assert np.array_equal(dec, idx), (mcs, n)
    runs = (np.arange(30000) % 4).astype(np.uint8)  # forces resets
    enc = mm._lzw_encode_gif(runs.tolist(), 2)
    assert len(enc) < 1000  # real compression, not a store
    dec = np.frombuffer(
        mm._lzw_decode_gif(enc, 2, len(runs)), dtype=np.uint8
    )
    assert np.array_equal(dec, runs)

    w, h, frames = mm._decode_gif(mm.synth_gif(16, 16, blue=77))
    _, _, pb = mm._decode_bmp(mm.synth_bmp(16, 16, blue=77))
    assert (w, h, len(frames)) == (16, 16, 1)
    assert np.array_equal(frames[0], pb)
    assert mm._decode_gif(b"GIF89a junk") is None
    assert mm._decode_gif(mm.synth_png(4, 4, 1)) is None


def test_gif_feeds_image_and_video_paths(spark):
    """GIF joins the format-invariance family: same pixels through
    BMP/PNG/GIF give identical features, and an ANIMATED gif samples
    real frames through the video path."""
    import numpy as np
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(media_id=1, payload=bytearray(mm.synth_bmp(16, 16, blue=9))),
            Row(media_id=2, payload=bytearray(mm.synth_gif(16, 16, blue=9))),
        ],
        "media_id long, payload binary",
    )
    feats = {
        r.media_id: (r.width, r.height, tuple(r.features))
        for r in mm.extract_image_features(df).collect()
    }
    assert feats[1] == feats[2]

    base = mm._decode_bmp(mm.synth_bmp(16, 16, blue=9))[2]
    anim = mm._encode_gif([base, np.roll(base, 8, axis=1)] * 3)
    vdf = spark.createDataFrame(
        [Row(media_id=5, payload=bytearray(anim))],
        "media_id long, payload binary",
    )
    rows = mm.sample_video_frames(vdf, n_frames=3).collect()
    assert [r.frame_no for r in sorted(rows, key=lambda r: r.frame_idx)] == [
        1, 3, 5,
    ]
    for r in rows:
        _, _, px = mm._decode_png(bytes(r.payload))
        want = base if r.frame_no % 2 == 0 else np.roll(base, 8, axis=1)
        assert np.array_equal(px, want)


def test_gif_corrupt_payloads_degrade_to_none():
    """ADVICE r6: a corrupt GIF-magic payload in a corpus must return
    None (the documented degrade path), never raise out of the UDF —
    truncated image descriptors (struct.error class), end-of-buffer
    extension labels / GCE reads (IndexError class), zero-area frame
    rects (empty .max() ValueError class), and truncated palettes or
    data sub-blocks."""
    import numpy as np

    good = mm.synth_gif(16, 16, blue=3)
    # Truncations at EVERY byte boundary must degrade, not raise
    # (sweeps through cut-off descriptor/palette/data/terminator).
    for cut in range(6, len(good)):
        out = mm._decode_gif(good[:cut])
        assert out is None or isinstance(out, tuple), cut
    # extension introducer then end-of-buffer
    hdr = good[:13 + 256 * 3]  # header + global palette
    assert mm._decode_gif(hdr + bytes([0x21])) is None
    # GCE label with its size byte past the end
    assert mm._decode_gif(hdr + bytes([0x21, 0xF9])) is None
    assert mm._decode_gif(hdr + bytes([0x21, 0xF9, 0x04, 0x01])) is None
    # zero-area frame rect passes the length check but must not
    # reach idx.max() on an empty array
    import struct

    zero_rect = (
        hdr
        + bytes([0x2C])
        + struct.pack("<HHHHB", 0, 0, 0, 0, 0)
        + bytes([2, 0])  # min code size, empty data terminator
        + bytes([0x3B])
    )
    assert mm._decode_gif(zero_rect) is None
    # frame rect exceeding the logical screen degrades too
    big_rect = (
        hdr
        + bytes([0x2C])
        + struct.pack("<HHHHB", 10, 10, 16, 16, 0)
        + bytes([2, 0])
        + bytes([0x3B])
    )
    assert mm._decode_gif(big_rect) is None
    # an animated gif truncated mid-second-frame still degrades
    frames = [np.zeros((8, 8), np.uint8), np.full((8, 8), 3, np.uint8)]
    anim = mm.synth_gif_animation(8, 8, frames) if hasattr(
        mm, "synth_gif_animation"
    ) else None
    if anim:
        for cut in (len(anim) - 5, len(anim) - 1):
            out = mm._decode_gif(anim[:cut])
            assert out is None or isinstance(out, tuple)


def test_y4m_corrupt_payloads_degrade_to_none():
    """ADVICE r6: malformed W/H header tokens and odd-dimension C420
    payloads must return None, not raise inside the UDF."""
    assert mm._decode_y4m(b"YUV4MPEG2 Wx H8 C444\nFRAME\n" + b"\0" * 64) is None
    assert mm._decode_y4m(b"YUV4MPEG2 W16 Hy C444\nFRAME\n" + b"\0" * 128) is None
    assert mm._decode_y4m(b"YUV4MPEG2 W-4 H8 C444\nFRAME\n") is None
    # odd-dimension 4:2:0: chroma upsample cannot reconstruct WxH
    odd = b"YUV4MPEG2 W5 H4 C420\nFRAME\n" + bytes(5 * 4 + 2 * 2 * 2)
    assert mm._decode_y4m(odd) is None
    odd_h = b"YUV4MPEG2 W4 H5 C420\nFRAME\n" + bytes(4 * 5 + 2 * 2 * 2)
    assert mm._decode_y4m(odd_h) is None
    # even-dimension C420 still decodes (the fix must not over-reject)
    import numpy as np

    ok = mm._decode_y4m(mm.synth_y4m(4, 4, [7], colorspace="C420"))
    assert ok is not None and np.all(ok[2][0][:, :, 0] == 7)


def test_jpeg_codec_is_real():
    """Baseline JPEG (r7) spec-differential: the decoder inverts the
    in-module encoder — grayscale block-constant content EXACTLY
    (DC-only blocks + all-ones quant tables lose nothing), color
    within the ±1-level YCbCr integer rounding, arbitrary content
    within the DCT coefficient-rounding bound; 4:2:0 reconstructs
    like 4:4:4 on chroma-block-constant content; non-multiple-of-8
    dims crop correctly."""
    import numpy as np

    # grayscale: exact
    g = np.zeros((16, 16), np.uint8)
    g[:8, :8], g[:8, 8:], g[8:, :8], g[8:, 8:] = 40, 200, 90, 255
    w, h, px = mm._decode_jpeg(mm._encode_jpeg(g))
    assert (w, h) == (16, 16)
    assert np.array_equal(px[:, :, 0], g)
    assert np.array_equal(px[:, :, 0], px[:, :, 2])  # gray replicated

    # color 4:4:4 block-constant: ±1 (YCbCr rounding only)
    c = mm._gradient_px(16, 16, 77, block=8)
    _, _, px = mm._decode_jpeg(mm._encode_jpeg(c))
    assert int(np.abs(px.astype(int) - c.astype(int)).max()) <= 1

    # 4:2:0 on 16-block-constant content: same ±1 bound
    c2 = mm._gradient_px(32, 32, 10, block=16)
    w, h, px = mm._decode_jpeg(mm._encode_jpeg(c2, subsample="420"))
    assert (w, h) == (32, 32)
    assert int(np.abs(px.astype(int) - c2.astype(int)).max()) <= 1

    # arbitrary noise, odd dims: decodes at the right size with the
    # DCT-rounding bound (quant=1 → small, not exact)
    rng = np.random.default_rng(3)
    odd = rng.integers(0, 256, size=(13, 11, 3), dtype=np.uint8)
    w, h, px = mm._decode_jpeg(mm._encode_jpeg(odd))
    assert (w, h) == (11, 13)
    assert int(np.abs(px.astype(int) - odd.astype(int)).max()) <= 8

    # dispatch: synth_jpeg flows through _decode_rgb
    out = mm._decode_rgb(mm.synth_jpeg(16, 16, 42))
    assert out is not None and out[:2] == (16, 16)


def test_jpeg_restart_markers_differential():
    """DRI + RSTn: the decoder's restart-segmented path (DC reset +
    byte realignment) reconstructs the identical image as the
    unsegmented encoding of the same pixels."""
    import numpy as np

    rng = np.random.default_rng(5)
    big = rng.integers(0, 256, size=(40, 48, 3), dtype=np.uint8)
    plain = mm._decode_jpeg(mm._encode_jpeg(big))
    rst = mm._decode_jpeg(mm._encode_jpeg(big, restart_interval=3))
    assert np.array_equal(plain[2], rst[2])
    ev = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    a = mm._decode_jpeg(mm._encode_jpeg(ev, subsample="420", restart_interval=1))
    b = mm._decode_jpeg(mm._encode_jpeg(ev, subsample="420"))
    assert np.array_equal(a[2], b[2])
    # grayscale stays exact through restarts
    g = np.zeros((24, 24), np.uint8)
    g[:8], g[8:16], g[16:] = 10, 120, 250
    out = mm._decode_jpeg(mm._encode_jpeg(g, restart_interval=2))
    assert np.array_equal(out[2][:, :, 0], g)


def test_jpeg_corrupt_payloads_degrade_to_none():
    """Same degrade contract as BMP/PNG/GIF/Y4M: truncations at every
    byte boundary, garbage after SOI, and non-baseline modes return
    None — never raise out of the UDF."""
    jp = mm._encode_jpeg(mm._gradient_px(16, 16, 5, block=8))
    for cut in range(2, len(jp)):
        out = mm._decode_jpeg(jp[:cut])
        assert out is None or isinstance(out, tuple), cut
    assert mm._decode_jpeg(b"\xff\xd8\xff\xe0junkjunk") is None
    assert mm._decode_jpeg(b"not a jpeg") is None
    assert mm._decode_jpeg(mm.synth_png(4, 4, 1)) is None
    # arithmetic coding (SOF9) is the honest boundary: flip SOF0
    arith = bytearray(jp)
    idx = bytes(arith).find(b"\xff\xc0")
    arith[idx + 1] = 0xC9
    assert mm._decode_jpeg(bytes(arith)) is None


def test_jpeg_feeds_image_paths_format_invariant(spark):
    """JPEG joins the format-invariance family: grayscale content is
    EXACT through the codec, so features and aHash from a JPEG
    payload equal those from the BMP of the same pixels; color
    features agree within the YCbCr rounding tolerance."""
    import numpy as np
    from pyspark.sql import Row

    g = np.zeros((16, 16), np.uint8)
    g[:, :8] = 60
    g[:, 8:] = 220
    gray_rgb = np.stack([g, g, g], axis=2)
    px8 = mm._gradient_px(16, 16, 9, block=8)
    df = spark.createDataFrame(
        [
            Row(media_id=1, payload=bytearray(mm._encode_bmp(gray_rgb))),
            Row(media_id=2, payload=bytearray(mm._encode_jpeg(g))),
            Row(media_id=3, payload=bytearray(mm._encode_bmp(px8))),
            Row(media_id=4, payload=bytearray(mm._encode_jpeg(px8))),
        ],
        "media_id long, payload binary",
    )
    feats = {
        r.media_id: (r.width, r.height, list(r.features))
        for r in mm.extract_image_features(df).collect()
    }
    assert feats[1] == feats[2]  # grayscale: bit-identical features
    assert feats[3][:2] == feats[4][:2]
    assert all(
        abs(a - b) <= 2 / 255 for a, b in zip(feats[3][2], feats[4][2])
    )
    hashes = {r.media_id: r.ahash for r in mm.average_hash(df).collect()}
    assert hashes[1] == hashes[2]


def test_g711_codecs_bit_identical_to_audioop():
    """u-law and A-law encode/decode are EXHAUSTIVELY bit-identical
    to stdlib audioop (an independent C implementation of the Sun
    reference) over all 65536 int16 inputs and all 256 codes."""
    import warnings

    import numpy as np

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    allv = np.arange(-32768, 32768, dtype=np.int16)
    codes = np.arange(256, dtype=np.uint8)
    assert np.array_equal(
        mm._g711_ulaw_encode(allv),
        np.frombuffer(audioop.lin2ulaw(allv.tobytes(), 2), np.uint8),
    )
    assert np.array_equal(
        mm._g711_alaw_encode(allv),
        np.frombuffer(audioop.lin2alaw(allv.tobytes(), 2), np.uint8),
    )
    assert np.array_equal(
        mm._g711_ulaw_decode(codes),
        np.frombuffer(audioop.ulaw2lin(codes.tobytes(), 2), "<i2"),
    )
    assert np.array_equal(
        mm._g711_alaw_decode(codes),
        np.frombuffer(audioop.alaw2lin(codes.tobytes(), 2), "<i2"),
    )


def test_ima_adpcm_differential_vs_audioop():
    """The WAV IMA ADPCM block decoder reproduces audioop's DVI
    algorithm EXACTLY once the header state is injected and audioop's
    high-nibble-first order is swapped to WAV's low-first (the known
    framing difference between raw DVI and the WAV container)."""
    import struct
    import warnings

    import numpy as np

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        import audioop

    rng = np.random.default_rng(4)
    pcm = (
        np.cumsum(rng.integers(-800, 800, size=505))
        .clip(-32000, 32000)
        .astype(np.int16)
    )
    data, ba = mm._ima_adpcm_encode(pcm, samples_per_block=505)
    blk = data[:ba]
    pred, idx, _ = struct.unpack_from("<hBB", blk, 0)
    swapped = bytes(((b & 0x0F) << 4) | (b >> 4) for b in blk[4:])
    ref_bytes, _ = audioop.adpcm2lin(swapped, 2, (pred, idx))
    ref = np.frombuffer(ref_bytes, "<i2")
    mine = mm._ima_adpcm_decode(data, ba, 1)[:505]
    assert int(mine[0]) == pred  # header sample verbatim
    assert np.array_equal(mine[1:].astype(np.int16), ref[: len(mine) - 1])


def test_compressed_wav_end_to_end_metrics(spark):
    """A 440 Hz tone compressed through each real codec (u-law,
    A-law, IMA ADPCM) flows through the standard extract_wav_metrics
    path — zero-crossing rate and spectral centroid recover the tone
    frequency, proving the compressed branch feeds the same REAL
    signal pipeline (no fake)."""
    import numpy as np
    from pyspark.sql import Row

    t = np.arange(8000)
    pcm = (0.5 * 32767 * np.sin(2 * np.pi * 440 * t / 8000)).astype(
        np.int16
    )
    rows = [Row(media_id=0, payload=bytearray(mm.synth_wav(440.0, 1000)))]
    for i, codec in enumerate(("ulaw", "alaw", "ima_adpcm"), start=1):
        rows.append(
            Row(
                media_id=i,
                payload=bytearray(
                    mm._encode_wav_compressed(pcm, 8000, codec)
                ),
            )
        )
    rows.append(Row(media_id=9, payload=bytearray(b"not audio")))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r.media_id: r for r in mm.extract_wav_metrics(df).collect()
    }
    assert set(got) == {0, 1, 2, 3}  # non-audio dropped, no fake row
    for mid, r in got.items():
        assert r.sample_rate == 8000
        assert abs(r.zcr_hz - 440.0) < 440 * 0.05, (mid, r.zcr_hz)
        assert abs(r.centroid_hz - 440.0) < 440 * 0.05, (mid, r.centroid_hz)
        assert abs(r.rms - 0.5 / 2**0.5) < 0.02, (mid, r.rms)


def test_compressed_wav_corrupt_payloads_degrade():
    """Same degrade contract: truncations and malformed fmt/ADPCM
    headers return None, never raise."""
    import numpy as np

    pcm = (
        8000 * np.sin(2 * np.pi * 300 * np.arange(2000) / 8000)
    ).astype(np.int16)
    for codec in ("ulaw", "alaw", "ima_adpcm"):
        wav = mm._encode_wav_compressed(pcm, 8000, codec)
        assert mm._decode_wav(wav) is not None
        for cut in range(0, len(wav), 7):
            out = mm._decode_wav(wav[:cut])
            assert out is None or isinstance(out, dict), (codec, cut)
    # ADPCM block with out-of-range step index degrades
    wav = bytearray(mm._encode_wav_compressed(pcm, 8000, "ima_adpcm"))
    di = bytes(wav).find(b"data") + 8
    wav[di + 2] = 200  # step index > 88
    assert mm._decode_wav(bytes(wav)) is None


def test_ima_adpcm_malformed_stereo_degrades():
    """ADVICE r7 (high): a STEREO IMA-ADPCM block whose body length
    is not a multiple of 4*channels must degrade (drop the ragged
    tail group), never raise a ragged-np.mean ValueError out of the
    UDF — and the fallback chain in _decode_wav must swallow any
    decoder exception (never-raise contract)."""
    import struct

    def stereo_adpcm_wav(block_align: int, nblocks: int = 2) -> bytes:
        data = b""
        for _ in range(nblocks):
            blk = struct.pack("<hBB", 100, 0, 0)
            blk += struct.pack("<hBB", -100, 0, 0)
            blk += bytes(range(block_align - 8))
            data += blk
        fmt = struct.pack("<HHIIHH", 0x11, 2, 8000, 8000, block_align, 4)
        body = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body

    # body = 4 bytes: one 4-byte group for channel 0 only → pre-fix
    # this crashed on np.mean over ragged per-channel sample lists
    for ba in (12, 16, 20, 8 + 12):  # body 4 / 8 / 12 bytes
        out = mm._decode_wav(stereo_adpcm_wav(ba))
        assert out is None or isinstance(out, dict), ba
    # sanity: a well-formed stereo block (body multiple of 8) decodes
    assert isinstance(mm._decode_wav(stereo_adpcm_wav(8 + 16)), dict)


def test_flac_one_sample_stream_degrades():
    """ADVICE r7 (medium): a FLAC stream decoding to <=1 sample has
    no signal metrics; _decode_flac must return None (degrade), not
    a partial dict missing rms/n_frames/signal that KeyErrors in
    wav_frame_activity/_decode_audio_features."""
    import numpy as np

    one = mm._flac_encode(np.array([1234], dtype=np.int16), 8000)
    assert mm._decode_flac(one) is None
    assert mm._decode_wav(one) is None  # fallback chain degrades too
    # and the feature vector falls back to the deterministic fake
    # instead of raising
    feats = mm._decode_audio_features(one)
    assert len(feats) == 8
    # two samples is the smallest stream with metrics
    two = mm._flac_encode(np.array([1234, -1234], dtype=np.int16), 8000)
    m = mm._decode_flac(two)
    assert m is not None and "rms" in m and "signal" in m


def test_flac_codec_lossless_roundtrip():
    """FLAC (r7): decode(encode(pcm)) is EXACT for every waveform —
    losslessness makes the spec differential bit-for-bit. Covers
    CONSTANT/FIXED/VERBATIM subframe selection, the LPC subframe
    format, all four stereo decorrelation modes, Rice escapes (random
    noise), and real compression on structured signals."""
    import numpy as np

    rng = np.random.default_rng(7)
    t = np.arange(6000)
    cases = {
        "sine": (12000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16),
        "const": np.full(5000, -123, np.int16),
        "random": rng.integers(-32768, 32768, size=5000, dtype=np.int16),
        "ramp": (np.arange(5000) % 30000 - 15000).astype(np.int16),
    }
    for name, pcm in cases.items():
        f = mm._flac_encode(pcm, 8000)
        d = mm._decode_flac(f)
        assert d is not None, name
        assert np.array_equal(d["pcm"][0], pcm.astype(np.int64)), name
    # structured content genuinely compresses; noise doesn't blow up
    assert len(mm._flac_encode(cases["ramp"], 8000)) < 0.2 * 2 * 5000
    assert len(mm._flac_encode(cases["random"], 8000)) < 1.1 * 2 * 5000

    st = np.stack(
        [cases["sine"][:5000], (cases["sine"][:5000] * 0.7).astype(np.int16)],
        axis=1,
    )
    for mode in ("independent", "left_side", "right_side", "mid_side", "auto"):
        d = mm._decode_flac(mm._flac_encode(st, 8000, stereo_mode=mode))
        assert d is not None and d["channels"] == 2, mode
        assert np.array_equal(d["pcm"][0], st[:, 0]), mode
        assert np.array_equal(d["pcm"][1], st[:, 1]), mode
    # LPC subframe format (order-2 predictor through LPC coding)
    d = mm._decode_flac(mm._flac_encode(cases["sine"], 8000, force_lpc=True))
    assert np.array_equal(d["pcm"][0], cases["sine"].astype(np.int64))


def test_flac_integrity_and_degrade():
    """CRC-8/CRC-16/MD5 make a plausible-but-wrong decode impossible:
    a single flipped payload bit is rejected; truncations at every
    third byte degrade to None; non-FLAC is rejected."""
    import numpy as np

    t = np.arange(6000)
    pcm = (12000 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)
    f = bytearray(mm._flac_encode(pcm, 8000))
    f[len(f) // 2] ^= 0x40
    assert mm._decode_flac(bytes(f)) is None
    good = mm._flac_encode(np.full(5000, 7, np.int16), 8000)
    for cut in range(0, len(good), 3):
        out = mm._decode_flac(good[:cut])
        assert out is None or isinstance(out, dict), cut
    assert mm._decode_flac(b"not flac at all") is None
    assert mm._decode_flac(mm.synth_wav(300.0, 100)) is None


def test_flac_feeds_wav_metrics_path(spark):
    """A FLAC payload flows through the standard extract_wav_metrics
    UDF and — because the codec is lossless and both paths share the
    same metrics kernel — yields BIT-IDENTICAL metrics to the PCM WAV
    of the same samples."""
    import numpy as np
    from pyspark.sql import Row

    t = np.arange(8000)
    pcm = (0.5 * 32767 * np.sin(2 * np.pi * 440 * t / 8000)).astype(np.int16)
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(pcm.tobytes())
    df = spark.createDataFrame(
        [
            Row(media_id=1, payload=bytearray(buf.getvalue())),
            Row(media_id=2, payload=bytearray(mm._flac_encode(pcm, 8000))),
        ],
        "media_id long, payload binary",
    )
    got = {r.media_id: r for r in mm.extract_wav_metrics(df).collect()}
    assert set(got) == {1, 2}
    assert got[1].rms == got[2].rms
    assert got[1].zcr_hz == got[2].zcr_hz
    assert got[1].centroid_hz == got[2].centroid_hz
    assert got[2].sample_rate == 8000


def test_jpeg_progressive_equals_baseline():
    """Progressive (SOF2) decode paths — multi-scan coefficient
    accumulation, DC successive approximation (first + raw-bit
    refinement), per-component AC spectral bands with EOBRUN, and the
    G.1.2.3 AC-refinement correction-bit walk — verified by the
    cross-path differential: the progressive encoder writes the SAME
    quantized coefficients as the baseline encoder through a
    completely different entropy layering, so both payloads must
    decode to the IDENTICAL image, pixel for pixel."""
    import numpy as np

    rng = np.random.default_rng(3)
    g = np.zeros((16, 16), np.uint8)
    g[:8, :8], g[:8, 8:], g[8:, :8], g[8:, 8:] = 40, 200, 90, 255
    cases = [
        g,
        mm._gradient_px(16, 16, 77, block=8),
        rng.integers(0, 256, size=(24, 40, 3), dtype=np.uint8),
        rng.integers(0, 256, size=(13, 11, 3), dtype=np.uint8),
    ]
    for px in cases:
        base = mm._decode_jpeg(mm._encode_jpeg(px))
        prog = mm._decode_jpeg(mm._encode_jpeg_progressive(px))
        assert prog is not None
        assert np.array_equal(base[2], prog[2])
    e = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    base = mm._decode_jpeg(mm._encode_jpeg(e, subsample="420"))
    prog = mm._decode_jpeg(mm._encode_jpeg_progressive(e, subsample="420"))
    assert np.array_equal(base[2], prog[2])


def test_jpeg_12bit_precision():
    """12-bit JPEG (r8): SOF1 extended sequential and 12-bit
    progressive, level shift 2048, DC categories to 15 / AC to 14.

    - block-constant random 12-bit content round-trips EXACTLY at
      full internal depth (any early 8-bit truncation — e.g. a wrong
      level shift or category cap — would corrupt the values, not
      just blur them), then maps to uint8 by >>4;
    - 12-bit progressive decodes pixel-identical to 12-bit baseline
      (same coefficients, different entropy layering);
    - spec boundaries: SOF0 must reject precision 12 (baseline is
      8-bit-only, T.81 Table B.2), SOF1 must accept an 8-bit stream;
    - hi-contrast content (0 vs 4095 blocks) exercises DC categories
      above the 8-bit cap of 11 on both encode and decode sides;
    - truncation sweep: every prefix degrades to None, never raises.
    """
    import numpy as np

    rng = np.random.default_rng(5)
    vals = rng.integers(0, 4096, size=(4, 6))
    px12 = np.repeat(np.repeat(vals, 8, axis=0), 8, axis=1).astype(np.int64)
    enc = mm._encode_jpeg(px12, precision=12)
    assert b"\xff\xc1" in enc and b"JFIF" not in enc
    w, h, rgb = mm._decode_jpeg(enc)
    assert (w, h) == (48, 32)
    assert np.array_equal(rgb[:, :, 0], (px12 >> 4).astype(np.uint8))
    assert np.array_equal(rgb[:, :, 0], rgb[:, :, 1])

    prog = mm._decode_jpeg(mm._encode_jpeg_progressive(px12, precision=12))
    assert np.array_equal(prog[2], rgb)
    noisy = rng.integers(0, 4096, size=(24, 40)).astype(np.int64)
    b2 = mm._decode_jpeg(mm._encode_jpeg(noisy, precision=12))
    p2 = mm._decode_jpeg(mm._encode_jpeg_progressive(noisy, precision=12))
    assert b2 is not None and np.array_equal(b2[2], p2[2])

    # hi-contrast: DC diff magnitude up to 32760 → category 12+
    hc = np.zeros((8, 16), dtype=np.int64)
    hc[:, 8:] = 4095
    d = mm._decode_jpeg(mm._encode_jpeg(hc, precision=12))
    assert sorted(np.unique(d[2][:, :, 0]).tolist()) == [0, 255]

    # SOF0 + precision 12 is illegal; SOF1 + 8-bit is legal
    bad = bytearray(enc)
    bad[bytes(bad).find(b"\xff\xc1") + 1] = 0xC0
    assert mm._decode_jpeg(bytes(bad)) is None
    e8 = bytearray(mm._encode_jpeg(np.full((8, 8), 200, dtype=np.uint8)))
    e8[bytes(e8).find(b"\xff\xc0") + 1] = 0xC1
    d8 = mm._decode_jpeg(bytes(e8))
    assert d8 is not None and int(d8[2][0, 0, 0]) == 200

    # degrade contract on the 12-bit stream
    for cut in range(2, len(enc)):
        out = mm._decode_jpeg(enc[:cut])
        assert out is None or isinstance(out, tuple), cut


def test_jpeg_lossless_sof3():
    """Lossless JPEG (SOF3, T.81 Annex H, r8): decode(encode(x)) is
    BIT-EXACT by the Annex-H construction — prediction from
    reconstructed neighbors (== originals, losslessness), modulo-2^16
    differences, SSSS<=16 categories with the 16→32768 special case.
    Swept: all 7 predictors × precisions {4, 8, 12, 16} × gray/RGB,
    point transform, the first-line/first-column predictor overrides,
    and a 16-bit image opening with sample 0 (diff −32768 from the
    default predictor 2^15 — the no-extra-bits SSSS=16 code). SOF3
    carries components verbatim (no YCbCr). Truncation degrades."""
    import numpy as np

    rng = np.random.default_rng(21)

    def check(px, precision, pt=0, preds=range(1, 8)):
        arr = np.asarray(px, dtype=np.int64)
        for pred in preds:
            enc = mm._encode_jpeg_lossless(
                px, predictor=pred, precision=precision,
                point_transform=pt,
            )
            out = mm._decode_jpeg(enc)
            assert out is not None, (precision, pred, pt)
            expect = (arr >> pt) << pt
            if precision > 8:
                expect >>= precision - 8
            elif precision < 8:
                expect <<= 8 - precision
            expect = np.clip(expect, 0, 255).astype(np.uint8)
            got = out[2][:, :, 0] if arr.ndim == 2 else out[2]
            assert np.array_equal(got, expect), (precision, pred, pt)
            if arr.ndim == 2:  # gray replicates channels
                assert np.array_equal(out[2][:, :, 0], out[2][:, :, 1])

    check(rng.integers(0, 256, size=(13, 17)), 8)
    check(rng.integers(0, 4096, size=(9, 11)), 12)
    g16 = rng.integers(0, 65536, size=(8, 8))
    g16[0, 0] = 0  # default pred 32768 → diff −32768 → SSSS=16
    check(g16, 16)
    check(rng.integers(0, 16, size=(6, 7)), 4)
    check(rng.integers(0, 256, size=(10, 12, 3)), 8)  # RGB verbatim
    check(rng.integers(0, 256, size=(13, 17)), 8, pt=2, preds=[4])
    # 16-bit full-depth identity: v*257 >> 8 recovers v uniquely, so
    # any internal precision loss would corrupt the uint8 output
    v = (rng.integers(0, 256, size=(7, 7)) * 257).astype(np.int64)
    _, _, rgb = mm._decode_jpeg(mm._encode_jpeg_lossless(v, 7, 16))
    assert np.array_equal(rgb[:, :, 0], (v >> 8).astype(np.uint8))
    # degrade contract
    enc = mm._encode_jpeg_lossless(rng.integers(0, 256, size=(8, 9)), 5)
    for cut in range(2, len(enc)):
        out = mm._decode_jpeg(enc[:cut])
        assert out is None or isinstance(out, tuple), cut


def test_jpeg_progressive_corrupt_degrades():
    """Truncating a progressive payload at every byte boundary (mid
    scan-script, mid DHT, mid refinement bits) degrades to None or a
    valid tuple — never raises."""
    import numpy as np

    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
    jp = mm._encode_jpeg_progressive(px)
    for cut in range(2, len(jp)):
        out = mm._decode_jpeg(jp[:cut])
        assert out is None or isinstance(out, tuple), cut


def test_all_decoders_survive_mutation_fuzz():
    """Degrade-contract fuzz: 150 seeded single/multi-byte mutations
    of a valid payload per format must decode to None or a valid
    result — never raise. Guards every parser path (headers, tables,
    entropy data, CRCs) against the corrupt-corpus case at once."""
    import numpy as np

    import struct

    rng = np.random.default_rng(42)
    t = np.arange(3000)
    pcm = (9000 * np.sin(2 * np.pi * 500 * t / 8000)).astype(np.int16)

    # stereo IMA-ADPCM WAV (ADVICE r7: the stereo block path crashed
    # pre-fix on ragged bodies — fuzz it too, not just mono)
    mono_data, ba = mm._ima_adpcm_encode(pcm[:1010])
    st_ba = 2 * ba
    st_fmt = struct.pack("<HHIIHH", 0x11, 2, 8000, 8000, st_ba, 4)
    st_blocks = b""
    nblocks = len(mono_data) // ba
    for bi in range(nblocks):
        blk = mono_data[bi * ba : (bi + 1) * ba]
        hdr, body = blk[:4], blk[4:]
        inter = b"".join(
            body[g : g + 4] * 2 for g in range(0, len(body), 4)
        )
        st_blocks += hdr + hdr + inter
    st_body = b"fmt " + struct.pack("<I", len(st_fmt)) + st_fmt
    st_body += b"data" + struct.pack("<I", len(st_blocks)) + st_blocks
    stereo_adpcm = (
        b"RIFF" + struct.pack("<I", 4 + len(st_body)) + b"WAVE" + st_body
    )

    au = (
        b".snd"
        + struct.pack(">IIIII", 24, 2000, 1, 8000, 1)
        + bytes(mm._g711_ulaw_encode(pcm[:2000]).tobytes())
    )
    px12 = np.repeat(
        np.repeat(rng.integers(0, 4096, size=(2, 2)), 8, 0), 8, 1
    ).astype(np.int64)
    targets = [
        (mm._decode_bmp, mm.synth_bmp(16, 16, 7)),
        (mm._decode_png, mm.synth_png(16, 16, 7)),
        (mm._decode_gif, mm.synth_gif(16, 16, 7)),
        (mm._decode_jpeg, mm._encode_jpeg(mm._gradient_px(16, 16, 7, block=8))),
        (mm._decode_jpeg, mm._encode_jpeg_progressive(
            mm._gradient_px(16, 16, 7, block=8))),
        (mm._decode_jpeg, mm._encode_jpeg(px12, precision=12)),
        (mm._decode_jpeg, mm._encode_jpeg_lossless(
            rng.integers(0, 256, size=(12, 14)).astype(np.int64))),
        (mm._decode_y4m, mm.synth_y4m(16, 8, [100, 200])),
        (mm._decode_avi, mm.synth_avi(
            8, 6, [rng.integers(0, 256, size=(6, 8, 3)).astype(np.uint8)
                   for _ in range(2)])),
        (mm._decode_wav, mm.synth_wav(300.0, 200)),
        (mm._decode_wav, mm._encode_wav_compressed(pcm, 8000, "ulaw")),
        (mm._decode_wav, mm._encode_wav_compressed(pcm, 8000, "alaw")),
        (mm._decode_wav, mm._encode_wav_compressed(pcm, 8000, "ima_adpcm")),
        (mm._decode_wav, stereo_adpcm),
        (mm._decode_wav, au),
        (mm._decode_flac, mm._flac_encode(pcm, 8000)),
        (mm._decode_flac, mm._flac_encode(
            np.stack([pcm[:2000], pcm[1000:3000]], axis=1), 8000,
            stereo_mode="mid_side")),
        (mm._decode_tiff, mm._encode_tiff(
            rng.integers(0, 256, size=(9, 11, 3)).astype(np.uint8),
            packbits=True)),
        (mm._decode_ico, mm._encode_ico_png(
            rng.integers(0, 256, size=(8, 8, 3)).astype(np.uint8))),
        (mm._probe_media, mm._encode_tiff(
            rng.integers(0, 256, size=(5, 5, 3)).astype(np.uint8))),
        (mm._decode_netpbm, b"P6\n5 4\n255\n" + bytes(
            rng.integers(0, 256, size=60).astype(np.uint8))),
        (mm._decode_netpbm,
         b"P3\n2 2\n255\n1 2 3 4 5 6\n7 8 9 10 11 12\n"),
    ]
    # AIFF fuzz via the real pluck master when present (the 80-bit
    # float rate field is the interesting corrupt surface)
    import os as _os

    _aiff = (
        "/root/.pyenv/versions/3.11.7/lib/python3.11/test/audiodata/"
        "pluck-pcm16.aiff"
    )
    if _os.path.exists(_aiff):
        targets.append((mm._decode_aiff, open(_aiff, "rb").read()))
        targets.append((mm._probe_media, open(_aiff, "rb").read()))
    # the hand-assembled payloads must decode BEFORE mutation (else
    # the fuzz would be vacuous)
    assert mm._decode_wav(stereo_adpcm) is not None
    assert mm._decode_wav(au) is not None
    for decode, payload in targets:
        base = bytearray(payload)
        for _ in range(150):
            mutated = bytearray(base)
            for _ in range(int(rng.integers(1, 4))):
                i = int(rng.integers(0, len(mutated)))
                mutated[i] = int(rng.integers(0, 256))
            out = decode(bytes(mutated))  # must not raise
            assert out is None or isinstance(out, (tuple, dict))


def test_flac_utf8_coded_numbers_canonical():
    """Frame numbers use canonical (shortest-form) UTF-8-style coding
    — strict decoders reject over-long forms; exhaustive boundary +
    roundtrip check."""
    for n, want in (
        (0, 1), (0x7F, 1), (0x80, 2), (0x7FF, 2), (0x800, 3),
        (0xFFFF, 3), (0x10000, 4), (0x1FFFFF, 4), (0x200000, 5),
    ):
        enc = mm._flac_utf8_encode(n)
        assert len(enc) == want, (hex(n), enc.hex())
        assert mm._flac_utf8_decode(mm._FlacBits(enc)) == n
    for n in range(0, 70000, 13):
        enc = mm._flac_utf8_encode(n)
        assert mm._flac_utf8_decode(mm._FlacBits(enc)) == n


def test_flac_8_and_24_bit_lossless():
    """The full claimed bit-depth set {8, 16, 24} round-trips
    losslessly (mono and mid/side stereo, sine and noise) with the
    STREAMINFO MD5 verified at each width's little-endian packing."""
    import numpy as np

    rng = np.random.default_rng(13)
    t = np.arange(4000)
    for bps, lo, hi in ((8, -128, 128), (24, -(1 << 23), 1 << 23)):
        sine = (0.4 * (hi - 1) * np.sin(2 * np.pi * 440 * t / 8000)).astype(
            np.int64
        )
        noise = rng.integers(lo, hi, size=3000).astype(np.int64)
        for pcm in (sine, noise):
            d = mm._decode_flac(mm._flac_encode(pcm, 8000, bps=bps))
            assert d is not None and d["bits_per_sample"] == bps
            assert np.array_equal(d["pcm"][0], pcm)
        st = np.stack([sine[:3000], noise], axis=1)
        d = mm._decode_flac(
            mm._flac_encode(st, 8000, bps=bps, stereo_mode="mid_side")
        )
        assert np.array_equal(d["pcm"][0], st[:, 0])
        assert np.array_equal(d["pcm"][1], st[:, 1])


def test_png_palette_color_type_exact():
    """Palette PNG (color type 3, the type real icon/logo PNGs use):
    a hand-built 2-bit-depth image with a known PLTE must decode to
    the exact palette-mapped pixels (MSB-first index unpacking +
    per-row bit padding)."""
    import struct
    import zlib

    import numpy as np

    def chunk(t, d):
        return (
            struct.pack(">I", len(d)) + t + d
            + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF)
        )

    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])
    w, h, depth = 7, 3, 2
    idx = np.array(
        [[0, 1, 2, 3, 0, 1, 2], [3, 2, 1, 0, 3, 2, 1], [1, 1, 2, 2, 3, 3, 0]],
        np.uint8,
    )
    rows = b""
    for r in idx:
        bits = np.unpackbits(r.reshape(-1, 1), axis=1)[:, -depth:].flatten()
        padded = np.concatenate(
            [bits, np.zeros((-len(bits)) % 8, np.uint8)]
        )
        rows += b"\x00" + np.packbits(padded).tobytes()
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, 3, 0, 0, 0))
        + chunk(b"PLTE", pal)
        + chunk(b"IDAT", zlib.compress(rows))
        + chunk(b"IEND", b"")
    )
    out = mm._decode_png(png)
    want = np.frombuffer(pal, np.uint8).reshape(4, 3)[idx]
    assert out is not None and (out[0], out[1]) == (w, h)
    assert np.array_equal(out[2], want)
    # out-of-range index degrades
    bad = png.replace(chunk(b"PLTE", pal), chunk(b"PLTE", pal[:9]))
    assert mm._decode_png(bad) is None


def test_decoders_on_real_third_party_files():
    """Independent validation against files produced by REAL encoders
    shipped in this container (libpng icons, giflib IDLE icons,
    libjpeg photos incl. Spark's own mllib sample images) — not our
    own synths. Each must decode with correct dimensions; the
    grayscale libjpeg photo must come back channel-equal, and the
    near-white JPEG stripes near-white. Skips any file the host
    lacks."""
    import os

    import numpy as np

    def decode(path):
        if not os.path.exists(path):
            return None
        return mm._decode_rgb(open(path, "rb").read())

    checked = 0
    out = decode("/usr/share/doc/python3/_static/file.png")
    if out:
        assert (out[0], out[1]) == (16, 16)
        checked += 1
    out = decode("/usr/share/gitweb/static/git-logo.png")
    if out:
        assert (out[0], out[1]) == (72, 27)  # 8-bit palette PNG
        checked += 1
    out = decode("/usr/share/gitweb/static/git-favicon.png")
    if out:
        assert (out[0], out[1]) == (16, 16)  # 2-bit palette PNG
        checked += 1
    out = decode(
        "/root/.pyenv/versions/3.11.7/lib/python3.11/idlelib/Icons/python.gif"
    )
    if out:
        assert (out[0], out[1]) == (16, 16)
        checked += 1
    out = decode("/usr/share/doc/nodejs/full-white-stripe.jpg")
    if out:
        assert (out[0], out[1]) == (493, 312)
        assert float(out[2].mean()) > 240  # a white stripe is white
        checked += 1
    base = "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/multi-channel"
    color = decode(f"{base}/chr30.4.184.jpg")
    gray = decode(f"{base}/grayscale.jpg")
    if color and gray:
        assert (color[0], color[1]) == (300, 215) == (gray[0], gray[1])
        # the 1-component libjpeg file replicates channels exactly
        assert np.array_equal(gray[2][:, :, 0], gray[2][:, :, 1])
        assert np.array_equal(gray[2][:, :, 0], gray[2][:, :, 2])
        # same scene: luma statistics agree within a few levels
        luma_c = color[2].astype(np.float64).mean()
        assert abs(luma_c - float(gray[2].mean())) < 16
        checked += 2
    assert checked >= 3, "too few real-world files present to validate"


def test_perceptual_hash_on_real_photos(spark):
    """pHash on REAL libjpeg photographs (Spark's mllib samples): a
    brightness-shifted re-encode of the same photo must land within a
    small hamming distance of the original (pHash drops DC; residual
    bits move only via clipping and JPEG re-encode noise), while
    DIFFERENT photos stay far apart — the separation property the
    near-dup pair queries rely on, demonstrated on non-synthetic
    content. Skips if the sample images are absent."""
    import os

    import numpy as np
    import pytest

    base = "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin"
    paths = [
        f"{base}/kittens/29.5.a_b_EGDP022204.jpg",
        f"{base}/kittens/54893.jpg",
        f"{base}/multi-channel/chr30.4.184.jpg",
    ]
    if not all(os.path.exists(p) for p in paths):
        pytest.skip("mllib sample images not present")
    rows = []
    for i, p in enumerate(paths):
        payload = open(p, "rb").read()
        w, h, px = mm._decode_rgb(payload)
        rows.append((2 * i, bytearray(payload)))
        shifted = np.clip(px.astype(np.int64) + 6, 0, 255).astype(np.uint8)
        rows.append((2 * i + 1, bytearray(mm._encode_jpeg(shifted))))
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {
        r["media_id"]: r["phash"]
        for r in mm.perceptual_hash(df).collect()
    }
    assert len(got) == 6

    def ham(a, b):
        return bin((got[a] ^ got[b]) & ((1 << 63) - 1)).count("1")

    for i in range(3):
        same = ham(2 * i, 2 * i + 1)
        assert same <= 8, (i, same)  # brightness twin: near-identical
        for j in range(3):
            if i != j:
                assert ham(2 * i, 2 * j) >= 16, (i, j)  # distinct photos


def test_avi_container_decode_and_format_invariance(spark):
    """AVI (r8): RIFF/AVI with uncompressed 24-bit DIB frames decodes
    BIT-EXACTLY (bottom-up padded BGR rows — the BMP pixel layout,
    including odd-width row padding), feeds sample_video_frames like
    Y4M/GIF, and — format invariance — the same grayscale frame
    sequence carried as AVI and as Y4M yields IDENTICAL per-frame
    aHashes through the full real pipeline. Truncation degrades."""
    import numpy as np

    rng = np.random.default_rng(3)
    frames = [
        rng.integers(0, 256, size=(14, 18, 3)).astype(np.uint8)
        for _ in range(5)
    ]
    w, h, dec = mm._decode_avi(mm.synth_avi(18, 14, frames))
    assert (w, h, len(dec)) == (18, 14, 5)
    assert all(np.array_equal(a, b) for a, b in zip(frames, dec))
    odd = [rng.integers(0, 256, size=(7, 9, 3)).astype(np.uint8)]
    assert np.array_equal(mm._decode_avi(mm.synth_avi(9, 7, odd))[2][0],
                          odd[0])
    avi = mm.synth_avi(18, 14, frames)
    for cut in range(0, len(avi), 3):
        out = mm._decode_avi(avi[:cut])
        assert out is None or isinstance(out, tuple), cut

    # format invariance through the Spark path: gray stripes as AVI
    # vs Y4M (U=V=128 ⇒ RGB == Y exactly) → identical aHash per frame
    lumas = []
    for fno in range(4):
        lum = np.full((16, 16), 40, dtype=np.uint8)
        lum[:, : 4 + 2 * fno] = 200
        lumas.append(lum)
    gray_frames = [np.stack([l, l, l], axis=2) for l in lumas]
    df = spark.createDataFrame(
        [
            (0, bytearray(mm.synth_avi(16, 16, gray_frames))),
            (1, bytearray(mm.synth_y4m(16, 16, lumas))),
        ],
        "media_id long, payload binary",
    )
    sampled = mm.sample_video_frames(df, n_frames=4)
    hashes = mm.average_hash(
        sampled.select(
            (F.col("media_id") * 10 + F.col("frame_idx")).alias("media_id"),
            "payload",
        )
    )
    got = {r.media_id: r.ahash for r in hashes.collect()}
    assert len(got) == 8
    for i in range(4):
        assert got[i] == got[10 + i], i  # AVI frame == Y4M frame


def test_tiff_and_ico_decode_real_files():
    """TIFF + ICO decoders (r8) against REAL third-party files:
    CPython's python.tiff (uncompressed 16×16 RGBA from a real
    encoder — alpha dropped) must agree with its python.jpg twin of
    the same logo within JPEG tolerance; idle.ico must yield its
    largest entry (the 256×256 embedded PNG). Synthetic TIFFs cover
    PackBits, gray white-is-zero inversion, and palette ColorMap.
    Everything degrades on truncation."""
    import os
    import struct

    import numpy as np
    import pytest

    tp = (
        "/root/.pyenv/versions/3.13.0/lib/python3.13/test/"
        "test_email/data/python.tiff"
    )
    ip = "/root/.pyenv/versions/3.13.0/lib/python3.13/idlelib/Icons/idle.ico"
    if not (os.path.exists(tp) and os.path.exists(ip)):
        pytest.skip("real tiff/ico not present")
    tiff = open(tp, "rb").read()
    w, h, px = mm._decode_tiff(tiff)
    assert (w, h) == (16, 16) and px.shape == (16, 16, 3)
    jp = tp.replace("python.tiff", "python.jpg")
    if os.path.exists(jp):
        oj = mm._decode_jpeg(open(jp, "rb").read())
        assert oj is not None
        assert abs(float(px.mean()) - float(oj[2].mean())) < 8
    wi, hi, pxi = mm._decode_ico(open(ip, "rb").read())
    assert (wi, hi) == (256, 256)  # largest entry, PNG-embedded

    # single-entry DIB ICO: rebuild around idle.ico's first entry
    ico = open(ip, "rb").read()
    w8, h8, nc, _, pl, bpp, size, off = struct.unpack_from(
        "<BBBBHHII", ico, 6
    )
    assert bpp == 32
    one = (
        struct.pack("<HHH", 0, 1, 1)
        + struct.pack("<BBBBHHII", w8, h8, nc, 0, pl, bpp, size, 22)
        + ico[off : off + size]
    )
    wd, hd, pxd = mm._decode_ico(one)
    assert (wd, hd) == (16, 16) and pxd.shape == (16, 16, 3)

    # synthetic TIFF coverage: PackBits, photometric 0/1, palette
    def mk_tiff(w, h, payload_px, comp=1, photo=2, spp=3, cmap=None):
        data = payload_px.tobytes()
        if comp == 32773:
            out = bytearray()
            i = 0
            while i < len(data):
                chunk = data[i : i + 128]
                out.append(len(chunk) - 1)
                out += chunk
                i += 128
            data = bytes(out)
        entries = [
            (256, 3, 1, w), (257, 3, 1, h), (258, 3, spp, None),
            (259, 3, 1, comp), (262, 3, 1, photo), (273, 4, 1, None),
            (277, 3, 1, spp), (278, 3, 1, h), (279, 4, 1, len(data)),
        ]
        if cmap is not None:
            entries.append((320, 3, len(cmap), None))
        entries.sort()
        n = len(entries)
        bits_off = 8 + 2 + 12 * n + 4
        cmap_off = bits_off + 2 * spp
        data_off = cmap_off + (2 * len(cmap) if cmap is not None else 0)
        buf = bytearray(struct.pack("<2sHI", b"II", 42, 8))
        buf += struct.pack("<H", n)
        for tag, typ, cnt, val in entries:
            if tag == 258:
                val = bits_off if 2 * spp > 4 else (8 | (8 << 16))
                if spp == 1:
                    val = 8
            if tag == 273:
                val = data_off
            if tag == 320:
                val = cmap_off
            buf += struct.pack("<HHII", tag, typ, cnt, val)
        buf += struct.pack("<I", 0)
        buf += struct.pack("<" + "H" * spp, *([8] * spp))
        if cmap is not None:
            buf += struct.pack("<" + "H" * len(cmap), *cmap)
        buf += data
        return bytes(buf)

    rng = np.random.default_rng(2)
    px3 = rng.integers(0, 256, size=(5, 7, 3)).astype(np.uint8)
    for comp in (1, 32773):
        got = mm._decode_tiff(mk_tiff(7, 5, px3, comp=comp))
        assert got is not None and np.array_equal(got[2], px3), comp
    g = rng.integers(0, 256, size=(4, 6, 1)).astype(np.uint8)
    got = mm._decode_tiff(mk_tiff(6, 4, g, photo=1, spp=1))
    assert np.array_equal(got[2][:, :, 0], g[:, :, 0])
    got = mm._decode_tiff(mk_tiff(6, 4, g, photo=0, spp=1))
    assert np.array_equal(got[2][:, :, 0], 255 - g[:, :, 0])
    idx = rng.integers(0, 4, size=(4, 6, 1)).astype(np.uint8)
    cmap = [(i * 60) << 8 for i in range(4)] * 3
    got = mm._decode_tiff(mk_tiff(6, 4, idx, photo=3, spp=1, cmap=cmap))
    assert np.array_equal(got[2][:, :, 0], (idx[:, :, 0] * 60))
    # truncation degrade
    t = mk_tiff(7, 5, px3, comp=32773)
    for cut in range(0, len(t), 3):
        out = mm._decode_tiff(t[:cut])
        assert out is None or isinstance(out, tuple)
    for cut in range(0, len(one), 7):
        out = mm._decode_ico(one[:cut])
        assert out is None or isinstance(out, tuple)

    # the catalog probe sees both (real files)
    mt = mm._probe_media(tiff)
    assert mt["mime"] == "image/tiff" and mt["codec"] == "none"
    assert (mt["width"], mt["height"]) == (16, 16)
    mi = mm._probe_media(ico)
    assert mi["mime"] == "image/x-icon" and mi["n_frames"] == 4
    assert (mi["width"], mi["height"]) == (256, 256)
    # WebP: metadata-only probe on the REAL python.webp twin of the
    # same 16x16 logo (VP8X canvas dims; streams stay undecodable)
    wp = tp.replace("python.tiff", "python.webp")
    if os.path.exists(wp):
        mw = mm._probe_media(open(wp, "rb").read())
        assert mw["mime"] == "image/webp"
        assert (mw["width"], mw["height"]) == (16, 16)
    # probe mutation safety for the new sniffers
    for base in (bytearray(tiff), bytearray(one)):
        for _ in range(150):
            mutated = bytearray(base)
            for _ in range(int(rng.integers(1, 4))):
                i = int(rng.integers(0, len(mutated)))
                mutated[i] = int(rng.integers(0, 256))
            out = mm._probe_media(bytes(mutated))
            assert out is None or isinstance(out, dict)


def test_netpbm_decode_real_files_pixel_identical_to_tiff():
    """netpbm (r8): CPython's real python.ppm must decode
    PIXEL-IDENTICAL to the real python.tiff of the same logo (both
    uncompressed masters — decoder-vs-decoder differential across
    two independent formats and two independent real encoders).
    P1-P3 ASCII variants, comments, maxval scaling, and P4 bit
    unpacking are pinned by hand-built vectors; truncation degrades;
    the catalog probe classifies all six kinds."""
    import os

    import numpy as np
    import pytest

    base = "/root/.pyenv/versions/3.11.7/lib/python3.11/test/test_email/data"
    tp = (
        "/root/.pyenv/versions/3.13.0/lib/python3.13/test/"
        "test_email/data/python.tiff"
    )
    if not (os.path.exists(f"{base}/python.ppm") and os.path.exists(tp)):
        pytest.skip("real netpbm/tiff files not present")
    ppm = open(f"{base}/python.ppm", "rb").read()
    d = mm._decode_netpbm(ppm)
    t = mm._decode_tiff(open(tp, "rb").read())
    assert (d[0], d[1]) == (16, 16)
    assert np.array_equal(d[2], t[2])  # two real masters, two formats
    for ext, mime in (
        ("pgm", "image/x-portable-graymap"),
        ("pbm", "image/x-portable-bitmap"),
    ):
        p = open(f"{base}/python.{ext}", "rb").read()
        out = mm._decode_netpbm(p)
        assert (out[0], out[1]) == (16, 16)
        assert np.array_equal(out[2][:, :, 0], out[2][:, :, 1])
        meta = mm._probe_media(p)
        assert meta["mime"] == mime and meta["codec"] == "binary"

    # hand-built ASCII vectors: values, maxval scaling, P1 polarity
    p3 = b"P3\n# c\n2 2\n255\n255 0 0  0 255 0\n0 0 255  255 255 255\n"
    assert mm._decode_netpbm(p3)[2].reshape(-1, 3).tolist() == [
        [255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 255]
    ]
    assert mm._decode_netpbm(b"P2\n3 1\n15\n0 7 15\n")[2][
        0, :, 0
    ].tolist() == [0, 119, 255]
    assert mm._decode_netpbm(b"P1\n2 2\n1 0\n0 1\n")[2][:, :, 0].tolist() == [
        [0, 255], [255, 0]
    ]
    # 16-bit binary maxval path
    import struct as _s

    p5_16 = b"P5\n2 1\n65535\n" + _s.pack(">HH", 0, 65535)
    assert mm._decode_netpbm(p5_16)[2][0, :, 0].tolist() == [0, 255]
    for cut in range(0, len(ppm), 11):
        out = mm._decode_netpbm(ppm[:cut])
        assert out is None or isinstance(out, tuple)


def test_aiff_decode_matches_wav_twin_on_real_recordings():
    """AIFF/AIFC (r8) against CPython's REAL pluck recordings: the
    SAME audio as the pluck WAVs, so metrics must agree — 16/24/32-bit
    big-endian PCM EXACTLY (identical zcr/rms/n_frames incl. the
    80-bit-float sample rate 11025), signed 8-bit and G.711
    'ulaw'/'alaw' AIFC within quantization. The catalog probe reports
    codec/rate/duration per file. Skips if absent."""
    import glob
    import os

    import pytest

    base = "/root/.pyenv/versions/3.11.7/lib/python3.11/test/audiodata"
    files = sorted(
        glob.glob(os.path.join(base, "pluck-*.aiff"))
        + glob.glob(os.path.join(base, "pluck-*.aifc"))
    )
    wav = os.path.join(base, "pluck-pcm16.wav")
    if len(files) < 4 or not os.path.exists(wav):
        pytest.skip("CPython AIFF audiodata not present")
    ref = mm._decode_wav(open(wav, "rb").read())
    for f in files:
        m = mm._decode_wav(open(f, "rb").read())  # via the fallback chain
        assert m is not None, f
        assert m["sample_rate"] == 11025 and m["n_frames"] == ref["n_frames"]
        name = os.path.basename(f)
        if any(k in name for k in ("pcm16", "pcm24", "pcm32")):
            assert m["zcr_hz"] == ref["zcr_hz"], name
            # the real files were written by different tools; samples
            # differ by a few LSB between the WAV and AIFF masters
            assert abs(m["rms"] - ref["rms"]) < 1e-5, name
        else:  # 8-bit / G.711: quantization tolerance
            assert abs(m["zcr_hz"] - ref["zcr_hz"]) < ref["zcr_hz"] * 0.03
            assert abs(m["rms"] - ref["rms"]) < 0.01
        meta = mm._probe_media(open(f, "rb").read())
        assert meta["mime"] == "audio/aiff", name
        assert meta["sample_rate"] == 11025 and meta["duration_ms"] == 299
        if "alaw" in name:
            assert meta["codec"] == "alaw"
    # truncation degrade on one real file
    payload = open(files[0], "rb").read()
    for cut in range(0, len(payload), 101):
        out = mm._decode_aiff(payload[:cut])
        assert out is None or isinstance(out, dict)


def test_probe_media_metadata_catalog(spark):
    """Unified catalog probe (r8): header-only metadata for EVERY
    container the module knows — dims/codec/bits for images (incl.
    the four JPEG modes), codec/rate/duration for audio, frame
    counts/duration for video, and the MP4/ISO-BMFF metadata-only
    walk (brand, mvhd duration, track fourccs — streams not
    decodable here, honestly). Unknown payloads catalog as mime
    'unknown' rather than dropping; 150 seeded mutations per format
    must never raise. Real third-party files (libpng icon, giflib
    icon, libjpeg photo, CPython pluck WAV) probe with correct
    metadata when present."""
    import os
    import struct

    import numpy as np

    rng = np.random.default_rng(7)
    pcm = (9000 * np.sin(2 * np.pi * 440 * np.arange(8000) / 8000)).astype(
        np.int16
    )

    def box(t, body):
        return struct.pack(">I", 8 + len(body)) + t + body

    mp4 = (
        box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"iso2mp41")
        + box(
            b"moov",
            box(
                b"mvhd",
                bytes(12) + struct.pack(">II", 1000, 5500) + bytes(80),
            )
            + box(
                b"trak",
                box(
                    b"mdia",
                    box(b"hdlr", bytes(8) + b"vide" + bytes(13))
                    + box(
                        b"minf",
                        box(
                            b"stbl",
                            box(
                                b"stsd",
                                bytes(4)
                                + struct.pack(">I", 1)
                                + box(b"avc1", bytes(70)),
                            ),
                        ),
                    ),
                ),
            ),
        )
    )
    lum = [np.full((16, 16), 40 + i, dtype=np.uint8) for i in range(3)]
    fr = [
        rng.integers(0, 256, size=(16, 16, 3)).astype(np.uint8)
        for _ in range(3)
    ]
    cases = {
        0: (mm.synth_bmp(16, 16, 7), ("image/bmp", "rgb", 16, None)),
        1: (mm.synth_png(16, 16, 7), ("image/png", "rgb", 16, None)),
        2: (mm.synth_gif(16, 16, 7), ("image/gif", "lzw", 16, None)),
        3: (
            mm._encode_jpeg(mm._gradient_px(16, 16, 7, block=8)),
            ("image/jpeg", "baseline", 16, None),
        ),
        4: (
            mm._encode_jpeg_progressive(mm._gradient_px(16, 16, 7, block=8)),
            ("image/jpeg", "progressive", 16, None),
        ),
        5: (
            mm._encode_jpeg(np.full((8, 8), 1000, dtype=np.int64),
                            precision=12),
            ("image/jpeg", "extended", 8, None),
        ),
        6: (
            mm._encode_jpeg_lossless(np.full((8, 8), 77, dtype=np.int64)),
            ("image/jpeg", "lossless", 8, None),
        ),
        7: (mm.synth_wav(300.0, 500), ("audio/wav", "pcm", None, 500)),
        8: (
            mm._encode_wav_compressed(pcm, 8000, "ulaw"),
            ("audio/wav", "ulaw", None, 1000),
        ),
        9: (mm._flac_encode(pcm, 8000), ("audio/flac", "flac", None, 1000)),
        10: (
            b".snd" + struct.pack(">IIIII", 24, 4000, 1, 8000, 1)
            + bytes(4000),
            ("audio/basic", "ulaw", None, 500),
        ),
        11: (mm.synth_y4m(16, 16, lum), ("video/x-yuv4mpeg", "c444", 16, 120)),
        12: (mm.synth_avi(16, 16, fr), ("video/x-msvideo", "rgb24", 16, 120)),
        13: (mp4, ("video/mp4", "avc1", None, 5500)),
        14: (b"not media at all", ("unknown", None, None, None)),
    }
    df = spark.createDataFrame(
        [(k, bytearray(p)) for k, (p, _) in cases.items()],
        "media_id long, payload binary",
    )
    got = {r["media_id"]: r for r in mm.probe_media_metadata(df).collect()}
    assert len(got) == len(cases)
    for k, (_, (mime, codec, width, dur)) in cases.items():
        r = got[k]
        assert r["mime"] == mime, (k, r)
        assert r["codec"] == codec, (k, r)
        assert r["width"] == width, (k, r)
        assert r["duration_ms"] == dur, (k, r)
    assert got[5]["bits"] == 12 and got[6]["bits"] == 8
    assert got[11]["n_frames"] == 3 and got[12]["n_frames"] == 3
    assert got[13]["container"] == "mp4/isom"

    # mutation safety: the probe must never raise
    for k in (0, 3, 7, 9, 11, 12, 13):
        base = bytearray(cases[k][0])
        for _ in range(150):
            mutated = bytearray(base)
            for _ in range(int(rng.integers(1, 4))):
                i = int(rng.integers(0, len(mutated)))
                mutated[i] = int(rng.integers(0, 256))
            out = mm._probe_media(bytes(mutated))
            assert out is None or isinstance(out, dict)

    # real third-party files
    real = {
        "/usr/share/doc/python3/_static/file.png": ("image/png", 16),
        "/root/.pyenv/versions/3.11.7/lib/python3.11/idlelib/Icons/"
        "python.gif": ("image/gif", 16),
        "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/"
        "multi-channel/grayscale.jpg": ("image/jpeg", 300),
        "/root/.pyenv/versions/3.13.0/lib/python3.13/test/audiodata/"
        "pluck-pcm16.wav": ("audio/wav", None),
    }
    for path, (mime, width) in real.items():
        if not os.path.exists(path):
            continue
        meta = mm._probe_media(open(path, "rb").read())
        assert meta and meta["mime"] == mime, path
        if width:
            assert meta["width"] == width, (path, meta)


def test_wav_all_pcm_widths_on_real_recordings():
    """CPython's test-suite 'pluck' recordings — the SAME audio at
    8/16/24/32-bit and WAVE_FORMAT_EXTENSIBLE, written by real tools
    — must all decode (24-bit assembly, unsigned-8 offset, EXTENSIBLE
    SubFormat-GUID unwrap) and agree on every metric: identical
    sample count, zcr and rms equal across the signed widths, 8-bit
    within quantization tolerance. Skips if the files are absent."""
    import glob
    import os

    base = "/root/.pyenv/versions/3.13.0/lib/python3.13/test/audiodata"
    files = sorted(glob.glob(os.path.join(base, "pluck-pcm*.wav")))
    if len(files) < 3:
        import pytest

        pytest.skip("CPython audiodata not present")
    got = {}
    for f in files:
        m = mm._decode_wav(open(f, "rb").read())
        assert m is not None, f
        got[os.path.basename(f)] = m
    ref = got["pluck-pcm16.wav"]
    assert ref["sample_rate"] == 11025 and ref["n_frames"] == 3307
    for name, m in got.items():
        assert m["n_frames"] == ref["n_frames"], name
        assert abs(m["zcr_hz"] - ref["zcr_hz"]) < 40, name
        assert abs(m["rms"] - ref["rms"]) < 0.01, name
    # the signed widths are bit-upscales of the same master: exact
    # metric agreement
    for name in ("pluck-pcm24.wav", "pluck-pcm32.wav", "pluck-pcm24-ext.wav"):
        if name in got:
            assert abs(got[name]["zcr_hz"] - ref["zcr_hz"]) < 1e-9, name


def test_au_container_real_file_and_roundtrip():
    """Sun AU (.snd): the real u-law AU from CPython's email test
    data decodes with plausible speech metrics, and a synthetic AU
    built from our audioop-verified u-law encoder round-trips the
    tone exactly like the WAV u-law path. Corrupt headers degrade."""
    import os
    import struct

    import numpy as np

    real = (
        "/root/.pyenv/versions/3.13.0/lib/python3.13/test/test_email/"
        "data/sndhdr.au"
    )
    if os.path.exists(real):
        m = mm._decode_wav(open(real, "rb").read())
        assert m is not None
        assert m["sample_rate"] == 8012  # the file's header rate
        assert 0.0 < m["rms"] < 1.0 and m["n_frames"] > 20000
    # synthetic: u-law AU of a tone — zcr/centroid recover it
    sr = 8000
    t = np.arange(sr)
    pcm = (0.5 * 32767 * np.sin(2 * np.pi * 440 * t / sr)).astype(np.int16)
    codes = mm._g711_ulaw_encode(pcm).tobytes()
    au = (
        b".snd"
        + struct.pack(">IIIII", 24, len(codes), 1, sr, 1)
        + codes
    )
    m = mm._decode_wav(au)
    assert m is not None and m["sample_rate"] == sr
    assert abs(m["zcr_hz"] - 440.0) < 22
    assert abs(m["centroid_hz"] - 440.0) < 44
    # degrade paths
    assert mm._decode_au(b".snd" + b"\x00" * 10) is None
    assert mm._decode_au(b"RIFF not au") is None
    bad = b".snd" + struct.pack(">IIIII", 24, 100, 99, sr, 1) + b"\x00" * 100
    assert mm._decode_au(bad) is None  # unknown encoding


def test_probe_media_corrupt_divisors_degrade_not_raise():
    """ADVICE r9: corrupt payloads that zero a duration divisor must
    degrade per the probe contract (metadata dict or None), never
    ZeroDivisionError: (1) a u-law WAV whose fmt chunk claims
    channels=0; (2) an AIFF whose 80-bit-float sample rate lands in
    (0, 1) so sr > 0 yet int(sr) == 0."""
    import struct

    # u-law WAV, channels=0 (tag 7 = ulaw; PCM branch already guarded)
    fmt = struct.pack("<HHIIHH", 7, 0, 8000, 8000, 1, 8)
    data = b"\x7f" * 800
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    meta = mm._probe_media(wav)
    assert meta is not None and meta["mime"] == "audio/wav"
    assert meta["codec"] == "ulaw" and meta["duration_ms"] is None

    # AIFF with sr = 0.5: exponent 16382, mantissa 0x8000...; the
    # old `sr > 0` guard passed while int(sr) == 0 divided by zero
    sr80 = struct.pack(">HQ", 0x3FFE, 0x8000000000000000)
    assert 0.0 < mm._f80_to_float(sr80) < 1.0  # non-vacuous
    comm = struct.pack(">HIH", 1, 100, 16) + sr80
    body = b"AIFF" + b"COMM" + struct.pack(">I", len(comm)) + comm
    aiff = b"FORM" + struct.pack(">I", len(body)) + body
    meta = mm._probe_media(aiff)
    assert meta is not None and meta["mime"] == "audio/aiff"
    assert meta["duration_ms"] is None


def test_probe_media_netpbm_is_header_only():
    """ADVICE r9: the catalog probe's netpbm branch must classify at
    header cost. A P2 whose header is valid but whose SAMPLE data is
    garbage (full decode returns None) still catalogs with dims —
    proof the probe no longer routes through the pixel decoder."""
    pgm = b"P2\n# c\n4 3\n255\nnot digits at all"
    assert mm._decode_netpbm(pgm) is None  # full decode fails
    meta = mm._probe_media(pgm)
    assert meta is not None
    assert meta["mime"] == "image/x-portable-graymap"
    assert (meta["width"], meta["height"]) == (4, 3)
    assert meta["codec"] == "ascii"
    # binary variant truncated mid-body: same header-only contract
    pgm5 = b"P5\n4 3\n255\n" + b"\x10" * 3
    assert mm._decode_netpbm(pgm5) is None
    meta = mm._probe_media(pgm5)
    assert meta is not None and meta["codec"] == "binary"
    assert (meta["width"], meta["height"]) == (4, 3)
    # malformed header still degrades to None from the netpbm branch
    assert mm._netpbm_header(b"P2\n0 3\n255\n1") is None


def test_avi_multistream_decodes_only_validated_dib_stream():
    """ADVICE r9: in a 2-stream AVI (stream 00 = uncompressed DIB,
    stream 01 = compressed) the '01dc' chunks must NOT be parsed as
    DIB pixels even when they pass the frame-size check — only the
    stream whose strf validated may contribute frames, and 'db'
    chunks win over 'dc' within that stream."""
    import struct

    import numpy as np

    rng = np.random.default_rng(9)
    frame = rng.integers(0, 256, size=(8, 8, 3)).astype(np.uint8)
    stride = (8 * 3 + 3) & ~3
    frame_sz = stride * 8

    def chunk(cid, body):
        return cid + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) & 1 else b""
        )

    def lst(ltype, body):
        return chunk(b"LIST", ltype + body)

    def dib_bytes(px):
        bgr = px[::-1, :, ::-1]
        padded = np.zeros((8, stride), dtype=np.uint8)
        padded[:, : 8 * 3] = bgr.reshape(8, 8 * 3)
        return padded.tobytes()

    avih = struct.pack(
        "<IIIIIIIIII4I",
        40000, frame_sz * 25, 0, 0x10, 1, 0, 2, frame_sz, 8, 8,
        0, 0, 0, 0,
    )
    strh_v = (
        b"vids" + b"DIB " + struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, 1, 25, 0, 1, frame_sz,
            10000, frame_sz,
        ) + struct.pack("<4H", 0, 0, 8, 8)
    )
    strf_dib = struct.pack(
        "<IiiHHIIiiII", 40, 8, 8, 1, 24, 0, frame_sz, 2835, 2835, 0, 0
    )
    strh_c = (
        b"vids" + b"MJPG" + struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, 1, 25, 0, 1, frame_sz,
            10000, frame_sz,
        ) + struct.pack("<4H", 0, 0, 8, 8)
    )
    # compressed strf: biCompression = 'MJPG' fourcc, must NOT validate
    strf_c = struct.pack(
        "<IiiHHIIiiII", 40, 8, 8, 1, 24,
        struct.unpack("<I", b"MJPG")[0], frame_sz, 2835, 2835, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh_v) + chunk(b"strf", strf_dib))
        + lst(b"strl", chunk(b"strh", strh_c) + chunk(b"strf", strf_c)),
    )
    garbage = b"\xab" * frame_sz  # big enough to pass the size check
    movi = lst(
        b"movi",
        chunk(b"00db", dib_bytes(frame))
        + chunk(b"01dc", garbage)
        + chunk(b"00dc", garbage),
    )
    body = b"AVI " + hdrl + movi
    avi = b"RIFF" + struct.pack("<I", len(body)) + body

    w, h, frames = mm._decode_avi(avi)
    assert (w, h) == (8, 8)
    assert len(frames) == 1  # 01dc rejected (wrong stream), 00dc (db wins)
    assert np.array_equal(frames[0], frame)

    # streams swapped: validated strf is stream 01 → only 01db decodes
    hdrl2 = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh_c) + chunk(b"strf", strf_c))
        + lst(b"strl", chunk(b"strh", strh_v) + chunk(b"strf", strf_dib)),
    )
    movi2 = lst(
        b"movi",
        chunk(b"00db", garbage) + chunk(b"01db", dib_bytes(frame)),
    )
    body2 = b"AVI " + hdrl2 + movi2
    avi2 = b"RIFF" + struct.pack("<I", len(body2)) + body2
    w2, h2, frames2 = mm._decode_avi(avi2)
    assert len(frames2) == 1 and np.array_equal(frames2[0], frame)

    # no validating strf at all → None (unchanged degrade contract)
    hdrl3 = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh_c) + chunk(b"strf", strf_c)),
    )
    body3 = b"AVI " + hdrl3 + movi2
    assert mm._decode_avi(
        b"RIFF" + struct.pack("<I", len(body3)) + body3
    ) is None


def test_hamming_near_pairs_rejects_unsound_max_hamming():
    """ADVICE r9: max_hamming >= blocks voids the pigeonhole recall
    guarantee — the API must error loudly, not silently lose pairs."""
    from reddit_hn_etl_spark.operators import dedup

    with pytest.raises(AssertionError, match="pigeonhole"):
        dedup.hamming_near_pairs(None, "id", "h", max_hamming=4, blocks=4)
    with pytest.raises(AssertionError, match="pigeonhole"):
        dedup.hamming_near_pairs(None, "id", "h", max_hamming=9, blocks=8)

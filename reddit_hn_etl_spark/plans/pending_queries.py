"""Codec oracle queries PREPARED for registration (VERDICT r6 #7).

The r6 codec work made PNG, GIF (incl. LZW + animation) and Y4M
decode REAL, but the registry is frozen until the driver-verification
backlog clears (builder rule: freeze until backlog ≤ 50), so these
three closed-form oracle queries live here — full `(spark, sf_dir) →
DataFrame` registry shape plus DuckDB oracle SQL, differentially
tested by the suite exactly like registered queries
(tests/test_pending_queries.py) — ready to move into
``plans/queries.py`` (one ``@_q`` decoration each) the round the
freeze lifts.

Design follows the registered ``image_bmp_metrics`` /
``video_scene_cuts`` pattern: synthesize payloads with closed-form
pixel statistics inside one mapInPandas stage (payloads never
shuffle), decode through the REAL codec path, and emit recovered
values the oracle can state as constants — a palette bug, an LZW
table-growth bug, a scanline-filter bug, or a YUV conversion bug
changes the emitted values and fails the hash compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import read_table

PENDING_QUERIES: dict = {}
PENDING_ORACLES: dict[str, str] = {}


def _pending(name: str, oracle: str):
    def deco(fn):
        PENDING_QUERIES[name] = fn
        PENDING_ORACLES[name] = oracle
        return fn

    return deco


@_pending(
    "image_png_metrics",
    """
    SELECT doc_id AS media_id,
           CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
           CAST(120 AS INTEGER) AS mean_r,
           CAST(120 AS INTEGER) AS mean_g,
           CAST(doc_id AS INTEGER) AS mean_b
    FROM documents WHERE doc_id < 60
    """,
)
def image_png_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``image_bmp_metrics`` twin through the REAL PNG path
    (chunk walk + zlib inflate + scanline unfiltering): synthesize
    the same 16×16 gradient as a PNG per media row, decode it back
    through ``multimodal._decode_png``, and emit the RECOVERED
    dimensions and exact per-channel means. A filter-type bug
    (Sub/Up/Average/Paeth), a stride error, or a color-type mixup
    changes the means and fails the compare; matching
    ``image_bmp_metrics``'s oracle values IS the format-invariance
    statement.

    Scale shape: synth + decode share one mapInPandas stage; payloads
    never leave the UDF."""
    from ..functions import multimodal as mm

    docs = read_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") < 60).select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") % 256).cast("int").alias("blue"),
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = [
                (int(m), mm.synth_png(16, 16, int(b)))
                for m, b in zip(pdf["media_id"], pdf["blue"])
            ]
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    png = base.mapInPandas(synth, "media_id long, payload binary")
    feats = mm.extract_image_features(png)
    chan = lambda i: F.round(  # noqa: E731
        F.col("features")[i] * 255, 0
    ).cast("int")
    return feats.select(
        "media_id",
        "width",
        "height",
        chan(0).alias("mean_r"),
        chan(4).alias("mean_g"),
        chan(8).alias("mean_b"),
    )


@_pending(
    "gif_lzw_roundtrip",
    """
    SELECT doc_id AS media_id,
           CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
           TRUE AS pixels_match_bmp,
           CAST(120 AS INTEGER) AS mean_r,
           CAST(doc_id AS INTEGER) AS mean_b
    FROM documents WHERE doc_id < 60
    """,
)
def gif_lzw_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GIF encode → LZW decode → pixel-exact comparison against the
    BMP twin of the same gradient, per media row: exercises the
    variable-width LZW codes, table growth, and palette indirection
    end-to-end inside the engine (the encoder and decoder are
    independent implementations, so agreement is a differential
    check, not a tautology). ``pixels_match_bmp`` is computed by
    decoding BOTH payloads in the UDF and comparing arrays — one
    wrong index anywhere flips it to false and fails the driver
    hash; the channel means re-state the closed form.

    Scale shape: both decodes happen in the one mapInPandas stage;
    only ~40-byte metric rows leave the UDF."""
    from ..functions import multimodal as mm

    docs = read_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") < 60).select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") % 256).cast("int").alias("blue"),
    )

    out_schema = (
        "media_id long, width int, height int, "
        "pixels_match_bmp boolean, mean_r int, mean_b int"
    )

    def roundtrip(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for m, b in zip(pdf["media_id"], pdf["blue"]):
                gif = mm.synth_gif(16, 16, int(b))
                bmp = mm.synth_bmp(16, 16, int(b))
                gw, gh, gframes = mm._decode_gif(gif)
                _, _, bpx = mm._decode_bmp(bmp)
                gpx = gframes[0]
                rows.append(
                    (
                        int(m),
                        gw,
                        gh,
                        bool(np.array_equal(gpx, bpx)),
                        int(round(gpx[:, :, 0].mean())),
                        int(round(gpx[:, :, 2].mean())),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "width",
                    "height",
                    "pixels_match_bmp",
                    "mean_r",
                    "mean_b",
                ],
            )

    return base.mapInPandas(roundtrip, out_schema)


@_pending(
    "image_jpeg_metrics",
    """
    SELECT doc_id AS media_id, mode,
           CAST(16 AS INTEGER) AS width, CAST(16 AS INTEGER) AS height,
           CAST(60 + doc_id AS INTEGER) AS mean_gray,
           TRUE AS channels_equal
    FROM documents
    CROSS JOIN (
        SELECT unnest(['baseline8', 'progressive8', 'sof1_12bit',
                       'lossless8'])
            AS mode
    )
    WHERE doc_id < 60
    """,
)
def image_jpeg_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The codec-metrics family member for REAL JPEG across all three
    DCT Huffman entropy layouts (r7 baseline + progressive, r8
    12-bit SOF1) plus the r8 PREDICTIVE lossless mode (SOF3,
    bit-exact by construction): a grayscale two-band image (left half 60, right half
    60+2·doc_id) goes through each full encode → Huffman/DCT decode
    pipeline; grayscale block-constant content round-trips EXACTLY
    (DC-only blocks, all-ones quant — the 12-bit row encodes the
    samples << 4 at level shift 2048 and must come back bit-equal
    after the >> 4 output contract), so the recovered mean is the
    closed-form integer 60+doc_id with NO tolerance per mode — a
    quantization, zigzag, IDCT, predictor, scan-script, or
    level-shift bug shifts one mode's rows and fails the hash.
    ``channels_equal`` pins the gray-replication contract.

    Scale shape: synth + decode share one mapInPandas stage; payloads
    never leave the UDF."""
    from ..functions import multimodal as mm

    docs = read_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") < 60).select(
        F.col("doc_id").alias("media_id"),
    )

    out_schema = (
        "media_id long, mode string, width int, height int, "
        "mean_gray int, channels_equal boolean"
    )

    def roundtrip(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for m in pdf["media_id"]:
                g = np.full((16, 16), 60, dtype=np.uint8)
                g[:, 8:] = 60 + 2 * int(m)
                payloads = {
                    "baseline8": mm._encode_jpeg(g),
                    "progressive8": mm._encode_jpeg_progressive(g),
                    "sof1_12bit": mm._encode_jpeg(
                        g.astype(np.int64) << 4, precision=12
                    ),
                    "lossless8": mm._encode_jpeg_lossless(
                        g.astype(np.int64), predictor=4
                    ),
                }
                for mode, payload in payloads.items():
                    w, h, px = mm._decode_jpeg(payload)
                    rows.append(
                        (
                            int(m),
                            mode,
                            w,
                            h,
                            int(round(px[:, :, 0].mean())),
                            bool(
                                np.array_equal(px[:, :, 0], px[:, :, 1])
                                and np.array_equal(px[:, :, 0], px[:, :, 2])
                            ),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "mode",
                    "width",
                    "height",
                    "mean_gray",
                    "channels_equal",
                ],
            )

    return base.mapInPandas(roundtrip, out_schema)


@_pending(
    "audio_g711_adpcm_metrics",
    """
    SELECT doc_id AS media_id, codec,
           CAST(8000 AS INTEGER) AS sample_rate,
           TRUE AS rms_ok, TRUE AS zcr_ok, TRUE AS centroid_ok
    FROM documents
    CROSS JOIN (SELECT unnest(['ulaw', 'alaw', 'ima_adpcm']) AS codec)
    WHERE doc_id < 20
    """,
)
def audio_g711_adpcm_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``audio_wav_metrics`` family member for REAL compressed
    audio (r7): a per-row sine tone is compressed through each real
    codec (G.711 u-law / A-law, IMA ADPCM) and decoded back through
    the standard metrics path — zero-crossing rate and spectral
    centroid must recover the tone frequency and rms its amplitude
    within the codec's quantization bound, turning each flag false on
    any expansion-table, sign-convention, or nibble-order bug.

    Scale shape: synth + compress + decode share one mapInPandas
    stage; payloads never leave the UDF."""
    from ..functions import multimodal as mm

    docs = read_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("media_id"),
        (200 + (F.col("doc_id") % 10) * 100).cast("double").alias("freq"),
    )

    out_schema = (
        "media_id long, codec string, sample_rate int, "
        "rms_ok boolean, zcr_ok boolean, centroid_ok boolean"
    )

    def run(batches):
        import numpy as np
        import pandas as pd

        sr = 8000
        a_rms = 0.5 / 2**0.5
        for pdf in batches:
            rows = []
            for m, f in zip(pdf["media_id"], pdf["freq"]):
                t = np.arange(sr)  # 1 second
                pcm = (
                    0.5 * 32767 * np.sin(2 * np.pi * float(f) * t / sr)
                ).astype(np.int16)
                for codec in ("ulaw", "alaw", "ima_adpcm"):
                    met = mm._decode_wav(
                        mm._encode_wav_compressed(pcm, sr, codec)
                    )
                    # ADPCM granular noise chatters extra crossings
                    # near zero — wider (still discriminating) band
                    zcr_tol = (
                        max(16.0, float(f) * 0.08)
                        if codec == "ima_adpcm"
                        else max(5.0, float(f) * 0.05)
                    )
                    rows.append(
                        (
                            int(m),
                            codec,
                            met["sample_rate"],
                            bool(abs(met["rms"] - a_rms) <= 0.02),
                            bool(abs(met["zcr_hz"] - float(f)) <= zcr_tol),
                            bool(
                                abs(met["centroid_hz"] - float(f))
                                <= max(10.0, float(f) * 0.10)
                            ),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "codec",
                    "sample_rate",
                    "rms_ok",
                    "zcr_ok",
                    "centroid_ok",
                ],
            )

    return base.mapInPandas(run, out_schema)


@_pending(
    "audio_flac_roundtrip",
    """
    SELECT doc_id AS media_id,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(4000 AS BIGINT) AS n_frames,
           TRUE AS lossless, TRUE AS compressed
    FROM documents WHERE doc_id < 30
    """,
)
def audio_flac_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL FLAC codec end-to-end (r7): a per-row tone+ramp signal is
    FLAC-encoded and decoded back inside the UDF; ``lossless``
    compares the decoded PCM to the source sample-exact (the codec's
    defining property — any Rice, predictor, CRC, or decorrelation
    bug flips it), ``compressed`` asserts the payload actually beat
    raw PCM size (a store-only fake would fail it).

    Scale shape: synth + encode + decode share one mapInPandas stage;
    payloads never leave the UDF."""
    from ..functions import multimodal as mm

    docs = read_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") < 30).select(
        F.col("doc_id").alias("media_id"),
        (200 + (F.col("doc_id") % 10) * 100).cast("double").alias("freq"),
    )

    out_schema = (
        "media_id long, sample_rate int, n_frames long, "
        "lossless boolean, compressed boolean"
    )

    def run(batches):
        import numpy as np
        import pandas as pd

        sr, n = 8000, 4000
        for pdf in batches:
            rows = []
            for m, f in zip(pdf["media_id"], pdf["freq"]):
                t = np.arange(n)
                pcm = (
                    10000 * np.sin(2 * np.pi * float(f) * t / sr)
                    + (t % 64) * 16
                ).astype(np.int16)
                payload = mm._flac_encode(pcm, sr)
                d = mm._decode_flac(payload)
                rows.append(
                    (
                        int(m),
                        d["sample_rate"],
                        int(d["n_frames"]),
                        bool(
                            np.array_equal(d["pcm"][0], pcm.astype(np.int64))
                        ),
                        bool(len(payload) < 2 * n),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "sample_rate",
                    "n_frames",
                    "lossless",
                    "compressed",
                ],
            )

    return base.mapInPandas(run, out_schema)


@_pending(
    "doc_quality_logistic",
    """
    WITH feats AS (
        SELECT CAST(lang = 'en' AS DOUBLE) AS y,
               CAST(n_chars AS DOUBLE) / 4096.0 AS f1,
               CAST(length(text) - length(replace(text, ' ', ''))
                    AS DOUBLE) / 64.0 AS f2
        FROM documents
    ),
    -- iter 1: w = 0 => p = 0.5 exactly (libm-free first step)
    g1 AS (
        SELECT COUNT(*) AS n,
               SUM(CAST(FLOOR((0.5 - y) * 1048576.0 + 0.5) AS BIGINT)) AS g0,
               SUM(CAST(FLOOR((0.5 - y) * f1 * 1048576.0 + 0.5) AS BIGINT)) AS ga,
               SUM(CAST(FLOOR((0.5 - y) * f2 * 1048576.0 + 0.5) AS BIGINT)) AS gb
        FROM feats
    ),
    w1 AS (
        SELECT n,
               0.0 - 0.25 * ((g0 / 1048576.0) / n) AS w0,
               0.0 - 0.25 * ((ga / 1048576.0) / n) AS wa,
               0.0 - 0.25 * ((gb / 1048576.0) / n) AS wb
        FROM g1
    ),
    g2 AS (
        SELECT w1.n, w1.w0, w1.wa, w1.wb,
               SUM(CAST(FLOOR((1.0/(1.0+exp(-(w0 + wa*f1 + wb*f2))) - y)
                   * 1048576.0 + 0.5) AS BIGINT)) AS g0n,
               SUM(CAST(FLOOR((1.0/(1.0+exp(-(w0 + wa*f1 + wb*f2))) - y)
                   * f1 * 1048576.0 + 0.5) AS BIGINT)) AS gan,
               SUM(CAST(FLOOR((1.0/(1.0+exp(-(w0 + wa*f1 + wb*f2))) - y)
                   * f2 * 1048576.0 + 0.5) AS BIGINT)) AS gbn
        FROM feats CROSS JOIN w1
        GROUP BY ALL
    ),
    w2 AS (
        SELECT n,
               w0 - 0.25 * ((g0n / 1048576.0) / n) AS w0,
               wa - 0.25 * ((gan / 1048576.0) / n) AS wa,
               wb - 0.25 * ((gbn / 1048576.0) / n) AS wb
        FROM g2
    ),
    g3 AS (
        SELECT w2.n, w2.w0, w2.wa, w2.wb,
               SUM(CAST(FLOOR((1.0/(1.0+exp(-(w0 + wa*f1 + wb*f2))) - y)
                   * 1048576.0 + 0.5) AS BIGINT)) AS g0n,
               SUM(CAST(FLOOR((1.0/(1.0+exp(-(w0 + wa*f1 + wb*f2))) - y)
                   * f1 * 1048576.0 + 0.5) AS BIGINT)) AS gan,
               SUM(CAST(FLOOR((1.0/(1.0+exp(-(w0 + wa*f1 + wb*f2))) - y)
                   * f2 * 1048576.0 + 0.5) AS BIGINT)) AS gbn
        FROM feats CROSS JOIN w2
        GROUP BY ALL
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           ROUND(w0 - 0.25 * ((g0n / 1048576.0) / n), 9) AS w_bias,
           ROUND(wa - 0.25 * ((gan / 1048576.0) / n), 9) AS w_chars,
           ROUND(wb - 0.25 * ((gbn / 1048576.0) / n), 9) AS w_spaces
    FROM g3
    """,
)
def doc_quality_logistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine quality-classifier training (r7): 3 full-batch
    gradient-descent steps of logistic regression predicting
    lang='en' from two grid-rational text features (chars/4096,
    spaces/64 — integer counts over powers of two stay exact in
    doubles). Each step is one map-side-combinable scalar aggregate
    with per-row contributions snapped to the 2^-20 fixed-point grid,
    so the WEIGHT TRAJECTORY is bit-reproducible across engines —
    the oracle unrolls the identical three steps in SQL (step 1 is
    exp-free since σ(0) = 0.5 exactly). Emits (n_docs, final weights
    on the 1e-9 grid); any gradient, update, or feature-engineering
    divergence shifts the weights and fails the hash.

    Scale: per step one scan + a 1-row reduce; weights re-enter as
    literals (whole-stage codegen, no UDF) — identical plan at
    100 TB."""
    from ..operators.regression import logistic_regression_gd

    docs = read_table(spark, sf_dir, "documents")
    feats = docs.select(
        (F.col("lang") == "en").cast("double").alias("y"),
        (F.col("n_chars").cast("double") / 4096.0).alias("f1"),
        (
            (
                F.length("text") - F.length(F.translate("text", " ", ""))
            ).cast("double")
            / 64.0
        ).alias("f2"),
    )
    w, n = logistic_regression_gd(
        feats, ["f1", "f2"], "y", lr=0.25, iters=3
    )
    return spark.createDataFrame(
        [(n, round(w[0], 9), round(w[1], 9), round(w[2], 9))],
        "n_docs long, w_bias double, w_chars double, w_spaces double",
    )


@_pending(
    "video_y4m_scene_cuts",
    """
    SELECT doc_id AS media_id, fno AS frame_no,
           (fno % ((doc_id % 3) + 3) = 0) AS is_cut
    FROM documents
    CROSS JOIN (SELECT unnest(generate_series(1, 11)) AS fno)
    WHERE doc_id < 30
    """,
)
def video_y4m_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``video_scene_cuts`` through the REAL Y4M container path:
    12-frame yuv4mpeg2 clips (luma stripes whose width advances every
    ``period+3`` frames while brightness drifts EVERY frame), decoded
    by ``multimodal.sample_video_frames`` (real header parse + planar
    read + BT.601), re-encoded to per-frame PNGs, hashed with the
    real aHash, and cut-tested with one LAG window per clip. The
    drift defeats a naive pixel-diff detector; aHash's adaptive
    threshold ignores it, so hamming(prev, cur) > 0 exactly at
    pattern changes — closed form the oracle states per (doc_id %
    3). Frames never shuffle; the window runs on 16-byte hash rows."""
    from ..functions import multimodal as mm
    from pyspark.sql import Window

    docs = read_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") < 30).select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") % 3).cast("int").alias("period"),
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, per in zip(pdf["media_id"], pdf["period"]):
                frames = []
                for fno in range(12):
                    scene = fno // (int(per) + 3)
                    bright_cols = (2 + (scene % 5)) * 2
                    shift = fno % 5  # per-frame brightness drift
                    luma = np.full((16, 16), 40 + shift, dtype=np.uint8)
                    luma[:, :bright_cols] = 200 + shift
                    frames.append(luma)
                rows.append((int(mid), mm.synth_y4m(16, 16, frames)))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    clips = base.mapInPandas(synth, "media_id long, payload binary")
    # n_frames = clip length ⇒ the center-of-bucket rule selects every
    # frame; each comes back as a real PNG payload.
    frames = mm.sample_video_frames(clips, n_frames=12)
    hashes = mm.average_hash(
        frames.select(
            (F.col("media_id") * 100 + F.col("frame_no")).alias("media_id"),
            "payload",
        )
    ).select(
        (F.col("media_id") / 100).cast("long").alias("media_id"),
        (F.col("media_id") % 100).cast("int").alias("frame_no"),
        "ahash",
    )
    w = Window.partitionBy("media_id").orderBy("frame_no")
    return (
        hashes.withColumn("prev", F.lag("ahash").over(w))
        .where(F.col("prev").isNotNull())
        .select(
            "media_id",
            "frame_no",
            (F.col("ahash") != F.col("prev")).alias("is_cut"),
        )
    )


@_pending(
    "image_phash_clusters",
    """
    SELECT doc_id AS media_id,
           doc_id % 5 AS component,
           doc_id < 5 AS is_rep
    FROM documents WHERE doc_id < 60
    """,
)
def image_phash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`image_ahash_clusters`'s DCT twin through the REAL pHash path
    (r8, `multimodal.perceptual_hash`): synthesize the five-pattern
    BMP family (`synth_bmp_phash_pattern` — half splits, stripes,
    quadrant) with a per-doc brightness shift, decode → grayscale →
    area-pool → orthonormal 2-D DCT-II → median-threshold the 63
    low-frequency AC coefficients → 63-bit hash; hamming-0 pair
    edges close under `graph.connected_components`. pHash drops DC,
    so every brightness shift of a group hashes IDENTICALLY (DCT
    linearity — exact) while the five groups' low-frequency sign
    structures differ: the oracle states the clusters in closed form
    from the synthesis parameters (component = doc_id % 5). Any bug
    in the DCT basis, the pooling, the median threshold, the bit
    packing, the hamming join, or the CC iteration moves emitted
    values. Scale shape: payloads die inside the hashing UDF; the
    pair join and CC run on 16-byte hash rows."""
    from ..functions import multimodal as mm
    from ..operators import graph

    docs = read_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") < 60).select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") % 5).cast("int").alias("g"),
        (F.col("doc_id") % 7).cast("int").alias("shift"),
    )

    def synth(batches):
        import pandas as pd

        for pdf in batches:
            rows = [
                (int(m), mm.synth_bmp_phash_pattern(int(g), int(s)))
                for m, g, s in zip(pdf["media_id"], pdf["g"], pdf["shift"])
            ]
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    bmp = base.mapInPandas(synth, "media_id long, payload binary")
    hashes = mm.perceptual_hash(bmp).localCheckpoint(eager=True)
    a = hashes.select(
        F.col("media_id").alias("src"), F.col("phash").alias("ha")
    )
    b = hashes.select(
        F.col("media_id").alias("dst"), F.col("phash").alias("hb")
    )
    edges = (
        a.join(b, F.col("src") < F.col("dst"))
        .where(F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) == 0)
        .select("src", "dst")
    )
    comp = graph.connected_components(edges, src="src", dst="dst")
    allv = hashes.select(F.col("media_id").alias("vertex"))
    full = allv.join(comp, "vertex", "left").select(
        "vertex",
        F.coalesce("component", F.col("vertex")).alias("component"),
    )
    return full.select(
        F.col("vertex").alias("media_id"),
        F.col("component").cast("long").alias("component"),
        (F.col("vertex") == F.col("component")).alias("is_rep"),
    )


@_pending(
    "corpus_longest_repeated_span",
    r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\s+'),
                         t -> t <> '') AS t
      FROM documents
    ),
    pos AS (
      SELECT doc_id, t, unnest(generate_series(1, len(t))) AS p FROM toks
    ),
    ls AS (SELECT unnest(generate_series(1, (SELECT max(len(t)) FROM toks)))
               AS L),
    grams AS (
      SELECT doc_id, L, array_to_string(list_slice(t, p, p + L - 1), ' ')
                 AS g
      FROM pos CROSS JOIN ls
      WHERE p + L - 1 <= len(t)
    ),
    rep AS (
      SELECT L, g FROM grams GROUP BY L, g
      HAVING count(DISTINCT doc_id) >= 2
    ),
    best AS (SELECT max(L) AS span_len FROM rep)
    SELECT CAST(b.span_len AS BIGINT) AS span_len,
           count(*) AS n_spans,
           min(r.g) AS lexmin_span
    FROM rep r, best b WHERE r.L = b.span_len GROUP BY b.span_len
    """,
)
def corpus_longest_repeated_span(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest token span shared by >= 2 distinct documents (r8,
    `dedup.longest_repeated_span_length`) — the corpus duplication
    diagnostic Lee et al. 2022 read off a suffix array, computed by
    BINARY SEARCH on span length: each probe is one positional-L-gram
    aggregation over 8-byte xxhash64 keys (shuffle cost independent
    of L), O(log max_len) probes total, and the answer re-verified
    with exact strings (`repeated_spans_at` — a 64-bit collision
    cannot silently inflate the result). The oracle brute-forces all
    (position, length) grams — O(T·L) rows, fine at oracle scale,
    exactly the asymmetry the binary search exists to avoid. Emits
    (span_len, n_spans, lexmin_span): length, number of distinct
    spans at that length, lexicographically smallest one."""
    from ..operators import dedup

    docs = read_table(spark, sf_dir, "documents")
    n = dedup.longest_repeated_span_length(docs, "doc_id", "text")
    spans = dedup.repeated_spans_at(docs, "doc_id", "text", n)
    return spans.agg(
        F.count("*").alias("n_spans"),
        F.min("span").alias("lexmin_span"),
    ).select(
        F.lit(n).cast("long").alias("span_len"),
        "n_spans",
        "lexmin_span",
    )


@_pending(
    "media_catalog_report",
    """
    WITH base AS (SELECT doc_id FROM documents WHERE doc_id < 60)
    SELECT CASE doc_id % 8
               WHEN 0 THEN 'image/bmp' WHEN 1 THEN 'image/png'
               WHEN 2 THEN 'image/jpeg' WHEN 3 THEN 'audio/wav'
               WHEN 4 THEN 'video/x-msvideo' WHEN 5 THEN 'image/tiff'
               WHEN 6 THEN 'image/x-icon' ELSE 'unknown' END AS mime,
           CASE doc_id % 8
               WHEN 0 THEN 'rgb' WHEN 1 THEN 'rgb'
               WHEN 2 THEN 'lossless' WHEN 3 THEN 'ulaw'
               WHEN 4 THEN 'rgb24' WHEN 5 THEN 'packbits'
               ELSE NULL END AS codec,
           count(*) AS n_objects,
           CASE WHEN doc_id % 8 IN (0, 1, 2, 4, 5, 6)
                THEN CAST(16 AS BIGINT) END AS max_width,
           CASE doc_id % 8 WHEN 3 THEN CAST(250 AS BIGINT)
                           WHEN 4 THEN CAST(120 AS BIGINT) END
               AS max_duration_ms
    FROM base
    GROUP BY doc_id % 8
    """,
)
def media_catalog_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog report over a synthetic mixed media lake (r8,
    `multimodal.probe_media_metadata`): each doc row synthesizes one
    of six payload kinds (BMP, PNG, lossless JPEG, u-law WAV,
    uncompressed AVI, or non-media junk), the HEADER-ONLY probe
    extracts typed metadata, and the report aggregates per
    (mime, codec) — object counts, max width, max duration — with
    every value stated in closed form by the oracle from the
    synthesis parameters. A sniffing bug, a header-field offset
    error, a duration arithmetic slip, or dropping unknown payloads
    (they must catalog as 'unknown') moves real values. Scale shape:
    synth + probe share one mapInPandas stage (payloads die in the
    UDF); the report aggregation runs on ~100-byte metadata rows."""
    from ..functions import multimodal as mm

    docs = read_table(spark, sf_dir, "documents")
    base = docs.where(F.col("doc_id") < 60).select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") % 8).cast("int").alias("kind"),
    )

    def synth(batches):
        import numpy as np
        import pandas as pd

        pcm = (
            9000 * np.sin(2 * np.pi * 440 * np.arange(2000) / 8000)
        ).astype(np.int16)

        def payload(kind: int) -> bytes:
            if kind == 0:
                return mm.synth_bmp(16, 16, 7)
            if kind == 1:
                return mm.synth_png(16, 16, 7)
            if kind == 2:
                return mm._encode_jpeg_lossless(
                    np.full((16, 16), 90, dtype=np.int64)
                )
            if kind == 3:
                return mm._encode_wav_compressed(pcm, 8000, "ulaw")
            if kind == 4:
                frames = [
                    np.full((16, 16, 3), 40 + 20 * i, dtype=np.uint8)
                    for i in range(3)
                ]
                return mm.synth_avi(16, 16, frames)
            if kind == 5:
                return mm._encode_tiff(
                    np.full((16, 16, 3), 70, dtype=np.uint8),
                    packbits=True,
                )
            if kind == 6:
                return mm._encode_ico_png(
                    np.full((16, 16, 3), 90, dtype=np.uint8)
                )
            return b"opaque non-media payload"

        for pdf in batches:
            rows = [
                (int(m), payload(int(k)))
                for m, k in zip(pdf["media_id"], pdf["kind"])
            ]
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    lake = base.mapInPandas(synth, "media_id long, payload binary")
    meta = mm.probe_media_metadata(lake)
    return meta.groupBy("mime", "codec").agg(
        F.count(F.lit(1)).alias("n_objects"),
        F.max("width").cast("long").alias("max_width"),
        F.max("duration_ms").alias("max_duration_ms"),
    )

"""Multimodal column plumbing: image/audio/video as opaque binary.

The Spark-side architecture is real and tested — schema (binary payload
+ typed metadata struct), partitioning, Arrow batch shape, mapInPandas
signatures — while the codec step itself is stubbed: the sandbox ships
no image/audio libraries, so ``decode_image``/``sample_frames`` either
raise NotImplementedError (strict mode) or produce a deterministic fake
(test mode) with the exact output schema a real decoder would emit.

At 100 TB the pattern is: binary columns live in their own parquet
column chunks (columnar pruning means metadata-only queries never read
the payload bytes), decode runs in ``mapInPandas`` with small
``maxRecordsPerBatch`` (payloads are MBs, not rows), and the decoded
features land in a separate table keyed by content hash.
"""

from __future__ import annotations

import math as _math
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("url", StringType()),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("payload", BinaryType()),
        StructField("meta_width", IntegerType()),
        StructField("meta_height", IntegerType()),
        StructField("meta_duration_ms", IntegerType()),
        StructField("meta_codec", StringType()),
    ]
)

IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("feature_vec", ArrayType(FloatType())),
    ]
)

STRICT_DECODE = False  # flip on when a real codec library is present


def synthetic_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table exercising the binary-column path."""
    return (
        spark.range(0, n)
        .select(
            F.col("id").alias("media_id"),
            F.concat(F.lit("media://"), F.col("id").cast("string")).alias("url"),
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("media_type"),
            F.encode(
                F.repeat(F.concat(F.lit("payload-"), F.col("id").cast("string")), 8),
                "utf-8",
            ).cast("binary").alias("payload"),
            ((F.col("id") % 16 + 1) * 64).cast("int").alias("meta_width"),
            ((F.col("id") % 9 + 1) * 64).cast("int").alias("meta_height"),
            ((F.col("id") % 30 + 1) * 1000).cast("int").alias("meta_duration_ms"),
            F.lit("fake/1").alias("meta_codec"),
        )
    )


def _fake_decode(payload: bytes, width: int, height: int) -> list[float]:
    """Deterministic stand-in for a pixel decode + pooled feature:
    byte histogram moments of the payload."""
    if not payload:
        return [0.0] * 8
    n = len(payload)
    buckets = [0] * 8
    for b in payload:
        buckets[b >> 5] += 1
    return [round(c / n, 6) for c in buckets]


def extract_image_features(media: DataFrame) -> DataFrame:
    """mapInPandas decode → feature vectors.

    The batch shape, schema and partitioning are production-real; only
    the innermost decode is a deterministic fake (STRICT_DECODE raises
    instead, marking where libjpeg/ffmpeg plug in)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if STRICT_DECODE:
                raise NotImplementedError(
                    "real image decode requires an image library not "
                    "present in this environment"
                )
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pdf["meta_width"],
                    "height": pdf["meta_height"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "feature_vec": [
                        _fake_decode(p, w, h)
                        for p, w, h in zip(
                            pdf["payload"], pdf["meta_width"], pdf["meta_height"]
                        )
                    ],
                }
            )
            yield out

    return (
        media.where(F.col("media_type") == "image")
        .repartition("media_id")
        .mapInPandas(run, schema=IMAGE_FEATURES_SCHEMA)
    )


# ---------------------------------------------------------------------------
# raw-RGB codec path: REAL pixel math (decode + bilinear resize +
# pooled features) over uncompressed RGB24 buffers.  Raw RGB is a
# legitimate wire format (e.g. ffmpeg rawvideo, camera dumps), so this
# path is fully load-bearing without libjpeg/ffmpeg; compressed formats
# plug into _decode_rgb via STRICT_DECODE exactly like extract_image_features.
# ---------------------------------------------------------------------------

RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("payload", BinaryType()),
        StructField("mean_r", FloatType()),
        StructField("mean_g", FloatType()),
        StructField("mean_b", FloatType()),
    ]
)


def _decode_rgb(payload: bytes, width: int, height: int) -> np.ndarray:
    """Raw RGB24 buffer → (h, w, 3) uint8 array.  Short buffers are
    zero-padded, long ones trimmed (defensive: corrupt metadata must
    not kill the executor batch)."""
    need = width * height * 3
    arr = np.frombuffer(payload or b"", dtype=np.uint8)
    if arr.size < need:
        arr = np.pad(arr, (0, need - arr.size))
    return arr[:need].reshape(height, width, 3)


def _resize_bilinear(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Vectorized bilinear resize with half-pixel center alignment
    (the OpenCV/PIL convention).  Exact for constant and linear-ramp
    images — property-tested."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    ys = np.clip(ys, 0, h - 1)
    xs = np.clip(xs, 0, w - 1)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (ys - y0)[:, None, None]
    wx = (xs - x0)[None, :, None]
    p00 = img[y0][:, x0].astype(np.float64)
    p01 = img[y0][:, x1].astype(np.float64)
    p10 = img[y1][:, x0].astype(np.float64)
    p11 = img[y1][:, x1].astype(np.float64)
    top = p00 * (1 - wx) + p01 * wx
    bot = p10 * (1 - wx) + p11 * wx
    out = top * (1 - wy) + bot * wy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def resize_images(
    media: DataFrame, out_w: int = 32, out_h: int = 32
) -> DataFrame:
    """mapInPandas raw-RGB decode → bilinear resize → raw-RGB payload
    plus channel means.  Arrow batches carry the binary column; resize
    math is vectorized numpy per image — no per-pixel Python."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload, w, h in zip(
                pdf["media_id"], pdf["payload"],
                pdf["meta_width"], pdf["meta_height"],
            ):
                img = _decode_rgb(payload, int(w), int(h))
                small = _resize_bilinear(img, out_w, out_h)
                means = small.reshape(-1, 3).mean(axis=0)
                recs.append(
                    (int(mid), out_w, out_h, small.tobytes(),
                     float(means[0]), float(means[1]), float(means[2]))
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id", "width", "height", "payload",
                    "mean_r", "mean_g", "mean_b",
                ],
            )

    return (
        media.where(F.col("media_type") == "image")
        .repartition("media_id")
        .mapInPandas(run, schema=RESIZED_SCHEMA)
    )


def synthetic_raw_rgb_media(spark, n: int = 16, w: int = 48, h: int = 32) -> DataFrame:
    """Deterministic raw-RGB images: pixel (x, y) channel c =
    (x·3 + y·7 + c·11 + id·13) mod 256, generated in the same Arrow
    path the decoder reads."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid in pdf["id"]:
                x = np.arange(w)[None, :, None]
                y = np.arange(h)[:, None, None]
                c = np.arange(3)[None, None, :]
                img = ((x * 3 + y * 7 + c * 11 + int(mid) * 13) % 256).astype(
                    np.uint8
                )
                recs.append(
                    (int(mid), f"media://{mid}", "image", img.tobytes(),
                     w, h, 0, "rgb24/raw")
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id", "url", "media_type", "payload",
                    "meta_width", "meta_height", "meta_duration_ms",
                    "meta_codec",
                ],
            )

    return spark.range(0, n).mapInPandas(gen, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# raw-PCM audio path: REAL sample math (int16 LE decode + amplitude /
# zero-crossing stats) over uncompressed PCM buffers — the audio twin
# of the raw-RGB image path.  Compressed codecs plug in behind
# STRICT_DECODE exactly like the image side.
# ---------------------------------------------------------------------------

AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_samples", LongType()),
        StructField("sum_abs", LongType()),
        StructField("sum_sq", LongType()),
        StructField("zero_crossings", LongType()),
    ]
)


def audio_features(media: DataFrame) -> DataFrame:
    """mapInPandas PCM16-LE decode → amplitude statistics.

    Emits exact integer aggregates (|x| sum, x² sum, sign-flip count):
    derived metrics (RMS, mean amplitude) are one deterministic
    division/sqrt away, and integer outputs make the decode path
    oracle-checkable bit-for-bit (`audio_decode_stats` in the driver
    contract).  x² of int16 ≤ 2^30, so 2^33 samples fit in the int64
    accumulator — far beyond any single payload."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                x = np.frombuffer(payload or b"", dtype="<i2").astype(np.int64)
                n = x.size
                flips = int(((x[:-1] * x[1:]) < 0).sum()) if n > 1 else 0
                recs.append(
                    (int(mid), n, int(np.abs(x).sum()), int((x * x).sum()),
                     flips)
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id", "n_samples", "sum_abs", "sum_sq",
                    "zero_crossings",
                ],
            )

    return (
        media.where(F.col("media_type") == "audio")
        .repartition("media_id")
        .mapInPandas(run, schema=AUDIO_FEATURES_SCHEMA)
    )


def synthetic_raw_pcm_media(
    spark, n: int = 16, n_samples: int = 2000
) -> DataFrame:
    """Deterministic PCM16 clips: sample i of clip id is
    ((i*7 + id*13) mod 2001) − 1000, little-endian int16 — generated in
    the same Arrow path the decoder reads."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid in pdf["id"]:
                i = np.arange(n_samples, dtype=np.int64)
                x = ((i * 7 + int(mid) * 13) % 2001 - 1000).astype("<i2")
                recs.append(
                    (int(mid), f"media://audio/{mid}", "audio", x.tobytes(),
                     0, 0, n_samples * 1000 // 8000, "pcm_s16le/raw")
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id", "url", "media_type", "payload",
                    "meta_width", "meta_height", "meta_duration_ms",
                    "meta_codec",
                ],
            )

    return spark.range(0, n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: explode sample timestamps natively
    (pure metadata arithmetic — no decode), ready to feed a decoder."""
    return (
        media.where(F.col("media_type") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.col("meta_duration_ms") - 1, F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("sample_ms"),
        )
    )


# ---------------------------------------------------------------------------
# raw-video path: REAL frame math over concatenated RGB24 frames (the
# rawvideo wire format).  Frame sampling stays native metadata
# arithmetic (frame_sample_plan); only the sampled frames are decoded —
# at 100 TB that is the difference between reading every payload byte
# and slicing the sampled offsets out of each row's buffer.
# ---------------------------------------------------------------------------

VIDEO_FPS = 8  # synthetic clips are fixed-rate; real metadata carries fps

FRAME_STATS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
    ]
)


def sampled_frame_stats(
    media: DataFrame, every_ms: int = 1000, fps: int = VIDEO_FPS
) -> DataFrame:
    """Join the native sample plan back to the payload, decode ONLY the
    sampled frames (buffer slice at frame offset), emit exact integer
    channel sums per sampled frame."""
    plan = frame_sample_plan(media, every_ms).withColumn(
        "frame_idx", (F.col("sample_ms") * fps / 1000).cast("int")
    )
    vids = media.where(F.col("media_type") == "video").select(
        "media_id", "payload", "meta_width", "meta_height"
    )
    joined = plan.join(vids, "media_id")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, fidx, payload, w, h in zip(
                pdf["media_id"], pdf["frame_idx"], pdf["payload"],
                pdf["meta_width"], pdf["meta_height"],
            ):
                fsize = int(w) * int(h) * 3
                frame = _decode_rgb(
                    (payload or b"")[int(fidx) * fsize:(int(fidx) + 1) * fsize],
                    int(w), int(h),
                )
                sums = frame.reshape(-1, 3).astype(np.int64).sum(axis=0)
                recs.append(
                    (int(mid), int(fidx), int(sums[0]), int(sums[1]),
                     int(sums[2]))
                )
            yield pd.DataFrame(
                recs,
                columns=["media_id", "frame_idx", "sum_r", "sum_g", "sum_b"],
            )

    return joined.repartition("media_id").mapInPandas(
        run, schema=FRAME_STATS_SCHEMA
    )


def synthetic_raw_video_media(
    spark, n: int = 8, w: int = 16, h: int = 12, n_frames: int = 24
) -> DataFrame:
    """Deterministic rawvideo clips at VIDEO_FPS: frame f pixel (x, y)
    channel c = (x·3 + y·7 + c·11 + id·13 + f·17) mod 256."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid in pdf["id"]:
                x = np.arange(w)[None, None, :, None]
                y = np.arange(h)[None, :, None, None]
                c = np.arange(3)[None, None, None, :]
                f = np.arange(n_frames)[:, None, None, None]
                vid = (
                    (x * 3 + y * 7 + c * 11 + int(mid) * 13 + f * 17) % 256
                ).astype(np.uint8)
                recs.append(
                    (int(mid), f"media://video/{mid}", "video", vid.tobytes(),
                     w, h, n_frames * 1000 // VIDEO_FPS, "rgb24/rawvideo")
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id", "url", "media_type", "payload",
                    "meta_width", "meta_height", "meta_duration_ms",
                    "meta_codec",
                ],
            )

    return spark.range(0, n).mapInPandas(gen, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# perceptual image hashing: dHash over exact integer block means —
# the image face of the dedup family (simhash for text, dhash for
# pixels), built on the same raw-RGB decode path as resize_images.
# ---------------------------------------------------------------------------

DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("dhash", LongType()),
    ]
)

DHASH_GRID_W, DHASH_GRID_H = 9, 7   # 8×7 = 56 bits — int64-positive,
                                    # the simhash63 sizing discipline


def image_dhash(media: DataFrame) -> DataFrame:
    """Perceptual difference-hash (dHash) per image, in EXACT integer
    arithmetic end-to-end — the pixel-domain member of the near-dup
    family (text has simhash/minhash; re-encoded, resized or
    slightly-edited images need a content hash, not a byte hash).

    The classic dHash resizes to 9×8 and thresholds neighbors; a
    float resize would be engine-fragile (np.rint is half-EVEN, SQL
    round is half-away — a guaranteed eventual mismatch), so this
    variant replaces interpolation with EQUAL-AREA BLOCK MEANS
    (pixel x → block x·G DIV w, the standard area partition) and the
    brightness comparison with the CROSS-MULTIPLIED inequality
    s₁·n₂ > s₂·n₁ (the tile_hotspots discipline) — no division, no
    rounding, bit-for-bit reproducible anywhere; an exact k× pixel
    upscale whose dimensions keep block boundaries aligned (w a
    multiple of 9, h of 7) preserves the hash EXACTLY (tested).  Channel sum r+g+b
    stands in for luma (monotone per pixel; the 299/587/114 weighting
    adds nothing under thresholding).  9 block-columns × 7 block-rows
    → 8×7 = 56 comparison bits, keeping the packed hash strictly
    positive in int64 (the simhash63 sizing rule).

    Arrow-batched mapInPandas on the raw-RGB path (decode is the
    :func:`resize_images` machinery; compressed codecs gate behind
    STRICT_DECODE as ever); per-image math is vectorized
    numpy uint64 block sums — no per-pixel Python.

    Returns (media_id, dhash) with dhash in [0, 2⁵⁶)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gw, gh = DHASH_GRID_W, DHASH_GRID_H
        for pdf in batches:
            recs = []
            for mid, payload, w, h in zip(
                pdf["media_id"], pdf["payload"],
                pdf["meta_width"], pdf["meta_height"],
            ):
                img = _decode_rgb(payload, int(w), int(h)).astype(
                    np.uint64
                )
                gray = img.sum(axis=2)                # (h, w) ≤ 765
                xb = (np.arange(int(w)) * gw) // int(w)
                yb = (np.arange(int(h)) * gh) // int(h)
                sums = np.zeros((gh, gw), dtype=np.uint64)
                cnts = np.zeros((gh, gw), dtype=np.uint64)
                np.add.at(sums, (yb[:, None], xb[None, :]), gray)
                np.add.at(
                    cnts, (yb[:, None], xb[None, :]),
                    np.uint64(1),
                )
                hv = 0
                for r in range(gh):
                    for c in range(gw - 1):
                        # mean(r,c) > mean(r,c+1) ⟺ s1·n2 > s2·n1
                        bit = int(
                            int(sums[r, c]) * int(cnts[r, c + 1])
                            > int(sums[r, c + 1]) * int(cnts[r, c])
                        )
                        hv |= bit << (r * (gw - 1) + c)
                recs.append((int(mid), hv))
            yield pd.DataFrame(recs, columns=["media_id", "dhash"])

    return (
        media.where(F.col("media_type") == "image")
        .repartition("media_id")
        .mapInPandas(run, schema=DHASH_SCHEMA)
    )


def dhash_pairs(
    hashes: DataFrame,
    max_hamming: int = 6,
    bands: int = 4,
    id_col: str = "media_id",
    hash_col: str = "dhash",
) -> DataFrame:
    """Near-duplicate image pairs by banded Hamming join — the
    simhash_near_dup_pairs recipe applied to 56-bit dHashes: split
    the hash into ``bands`` contiguous bit bands; any pair within
    ``max_hamming`` < bands differing bits must agree EXACTLY on ≥ 1
    band (pigeonhole — a provable candidate superset, never a
    heuristic), so candidates come from ``bands`` equi-joins on band
    values, each unordered pair once (id_a < id_b), deduped, then the
    exact native ``bit_count(xor)`` filter.

    Pigeonhole needs max_hamming ≤ bands − 1 per the standard
    argument only when every differing bit could land in its own
    band; the precise guarantee is max_hamming < bands ⇒ some band
    untouched.  Enforced loudly.

    Returns (id_a, id_b, hamming)."""
    if not 1 <= bands <= 56:
        raise ValueError(f"bands must be in [1, 56]: {bands}")
    if max_hamming >= bands:
        raise ValueError(
            f"pigeonhole guarantee needs max_hamming < bands: "
            f"{max_hamming} ≥ {bands}"
        )
    width = 56 // bands + (1 if 56 % bands else 0)
    h = hashes.select(
        F.col(id_col).alias("_id"), F.col(hash_col).alias("_h")
    )
    cands = None
    for b in range(bands):
        bv = F.expr(
            f"(_h >> {b * width}) & {(1 << width) - 1}"
        ).alias("_bv")
        side = h.select("_id", "_h", bv)
        a = side.select(
            F.col("_id").alias("id_a"), F.col("_h").alias("_ha"), "_bv"
        )
        bb = side.select(
            F.col("_id").alias("id_b"), F.col("_h").alias("_hb"), "_bv"
        )
        p = a.join(bb, "_bv").where(F.col("id_a") < F.col("id_b")).select(
            "id_a", "id_b", "_ha", "_hb"
        )
        cands = p if cands is None else cands.unionByName(p)
    return (
        cands.distinct()
        .withColumn(
            "hamming",
            F.bit_count(
                F.col("_ha").bitwiseXOR(F.col("_hb"))
            ).cast("int"),
        )
        .where(F.col("hamming") <= int(max_hamming))
        .select("id_a", "id_b", "hamming")
    )


def synthetic_cut_video_media(
    spark, n: int = 8, w: int = 16, h: int = 12, n_frames: int = 24,
    scene_len: int = 8,
) -> DataFrame:
    """Deterministic rawvideo clips WITH HARD CUTS every ``scene_len``
    frames.  Pixel (x, y, c) of frame f:

        y = 0:  (x·3 + c·11 + id·13 + f·29) mod 256      (animated row)
        y > 0:  (x·3 + y·7 + c·11 + id·13
                 + (f DIV scene_len)·41·x) mod 256        (scene content)

    Within a scene only the TOP pixel row animates, so consecutive
    frames can flip dHash bits only in block-row 0 — intra-scene
    Hamming ≤ 8 by construction; across a cut the x-gradient of every
    other row is re-coeffed (3 → 3 + 41·scene mod 256), reordering
    block means in all rows → a structurally larger jump.  Closed
    form, so the DuckDB twin reproduces every pixel."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid in pdf["id"]:
                x = np.arange(w)[None, None, :, None]
                y = np.arange(h)[None, :, None, None]
                c = np.arange(3)[None, None, None, :]
                f = np.arange(n_frames)[:, None, None, None]
                body = (
                    x * 3 + y * 7 + c * 11 + int(mid) * 13
                    + (f // scene_len) * 41 * x
                ) % 256
                top = (x * 3 + c * 11 + int(mid) * 13 + f * 29) % 256
                vid = np.where(y == 0, top, body).astype(np.uint8)
                recs.append(
                    (int(mid), f"media://cutvideo/{mid}", "video",
                     vid.tobytes(), w, h,
                     n_frames * 1000 // VIDEO_FPS, "rgb24/rawvideo")
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id", "url", "media_type", "payload",
                    "meta_width", "meta_height", "meta_duration_ms",
                    "meta_codec",
                ],
            )

    return spark.range(0, n).mapInPandas(gen, schema=MEDIA_SCHEMA)


FRAME_DHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("fhash", LongType()),
    ]
)


def video_frame_dhash(media: DataFrame) -> DataFrame:
    """Per-FRAME perceptual dHash over rawvideo payloads — the
    :func:`image_dhash` block-mean/cross-multiplied construction
    applied to every frame (same 9×7 grid, 56 bits, same exactness
    argument), vectorized across the whole clip in one numpy pass
    (frame axis batched; no per-pixel and no per-frame Python loop).
    Frame count derives from the payload length (len DIV w·h·3) — the
    metadata-free ground truth.  Returns (media_id, frame_idx, fhash)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gw, gh = DHASH_GRID_W, DHASH_GRID_H
        for pdf in batches:
            recs = []
            for mid, payload, w, h in zip(
                pdf["media_id"], pdf["payload"],
                pdf["meta_width"], pdf["meta_height"],
            ):
                w, h = int(w), int(h)
                buf = payload or b""
                nf = len(buf) // (w * h * 3)
                if nf == 0:
                    continue
                vid = np.frombuffer(
                    buf[: nf * w * h * 3], dtype=np.uint8
                ).reshape(nf, h, w, 3).astype(np.uint64)
                gray = vid.sum(axis=3)                 # (nf, h, w)
                xb = (np.arange(w) * gw) // w
                yb = (np.arange(h) * gh) // h
                sums = np.zeros((nf, gh, gw), dtype=np.uint64)
                np.add.at(
                    sums,
                    (slice(None), yb[:, None], xb[None, :]),
                    gray,
                )
                cnts = np.zeros((gh, gw), dtype=np.uint64)
                np.add.at(
                    cnts, (yb[:, None], xb[None, :]), np.uint64(1)
                )
                # mean(c) > mean(c+1) ⟺ s1·n2 > s2·n1, vectorized
                # int64 headroom: s ≤ 765·(block pixels) ≤ ~3·10⁷ at
                # 1080p, n ≤ ~4·10⁴ → products ≤ ~10¹² ≪ 2⁶³
                lhs = sums[:, :, :-1].astype(np.int64) * cnts[
                    None, :, 1:
                ].astype(np.int64)
                rhs = sums[:, :, 1:].astype(np.int64) * cnts[
                    None, :, :-1
                ].astype(np.int64)
                bits = lhs > rhs                       # (nf, gh, gw-1)
                weights = (
                    np.uint64(1)
                    << (
                        np.arange(gh)[:, None] * (gw - 1)
                        + np.arange(gw - 1)[None, :]
                    ).astype(np.uint64)
                )
                hashes = (bits * weights[None]).reshape(nf, -1).sum(axis=1)
                for fidx, hv in enumerate(hashes):
                    recs.append((int(mid), int(fidx), int(hv)))
            yield pd.DataFrame(
                recs, columns=["media_id", "frame_idx", "fhash"]
            )

    return (
        media.where(F.col("media_type") == "video")
        .select("media_id", "payload", "meta_width", "meta_height")
        .repartition("media_id")
        .mapInPandas(run, schema=FRAME_DHASH_SCHEMA)
    )


def _shot_steps(frame_hashes: DataFrame, threshold: int) -> DataFrame:
    """Per-frame shot assignment shared by :func:`video_shot_segments`
    and :func:`video_keyframes`: LAG Hamming step, cut flag, running
    shot id — one clip-keyed window pass, fhash carried through."""
    w = W.partitionBy("media_id").orderBy("frame_idx")
    return frame_hashes.select(
        "media_id",
        "frame_idx",
        "fhash",
        F.bit_count(
            F.col("fhash").bitwiseXOR(F.lag("fhash").over(w))
        ).alias("_ham"),
    ).withColumn(
        "_cut",
        F.when(
            F.col("_ham").isNull() | (F.col("_ham") > threshold), 1
        ).otherwise(0),
    ).withColumn(
        "shot_id",
        F.sum("_cut").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )


def video_shot_segments(
    frame_hashes: DataFrame, threshold: int = 10
) -> DataFrame:
    """Shot-boundary detection over per-frame perceptual hashes: a cut
    opens wherever the frame-to-frame dHash Hamming distance EXCEEDS
    ``threshold`` (the first frame always opens shot 1) — the
    content-based video segmentation every frame-sampling curation
    pipeline keys on (sample per SHOT, not per wall-clock second, or
    a static scene floods the batch with near-dups).

    Pure native segmentation (the gaps-and-islands machinery on the
    hash stream): one LAG + one running SUM inside the clip's own
    window partition, exact integer bit_count(xor) distances, then one
    keyed groupBy to the per-shot summary.  Output: (media_id,
    shot_id 1-based, start_frame, end_frame inclusive, n_frames,
    max_step_hamming within the shot; the opening cut's distance is
    NOT folded into the shot it opens — it belongs to the boundary)."""
    steps = _shot_steps(frame_hashes, threshold)
    return steps.groupBy("media_id", "shot_id").agg(
        F.min("frame_idx").alias("start_frame"),
        F.max("frame_idx").alias("end_frame"),
        F.count(F.lit(1)).alias("n_frames"),
        F.coalesce(
            F.max(F.when(F.col("_cut") == 0, F.col("_ham"))),
            F.lit(0),
        ).alias("max_step_hamming"),
    )


def synthetic_gated_pcm_media(
    spark, n: int = 16, n_samples: int = 2048, burst: int = 256
) -> DataFrame:
    """Deterministic PCM16 clips with PLANTED silence: sample i of
    clip id is the loud ramp ((i·7 + id·13) mod 2001) − 1000 except in
    quiet bursts — whenever (i DIV burst + id) mod 3 = 1 the sample is
    ((i·3) mod 21) − 10 (|x| ≤ 10).  Burst boundaries align to frame
    boundaries when frame_samples divides ``burst``; the id offset
    staggers the silent stretches across clips.  Closed form, so the
    DuckDB twin replays every sample."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid in pdf["id"]:
                i = np.arange(n_samples, dtype=np.int64)
                loud = (i * 7 + int(mid) * 13) % 2001 - 1000
                quiet = (i * 3) % 21 - 10
                x = np.where(
                    (i // burst + int(mid)) % 3 == 1, quiet, loud
                ).astype("<i2")
                recs.append(
                    (int(mid), f"media://gated/{mid}", "audio",
                     x.tobytes(), 0, 0, n_samples * 1000 // 8000,
                     "pcm_s16le/raw")
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id", "url", "media_type", "payload",
                    "meta_width", "meta_height", "meta_duration_ms",
                    "meta_codec",
                ],
            )

    return spark.range(0, n).mapInPandas(gen, schema=MEDIA_SCHEMA)


AUDIO_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("sum_sq", LongType()),
    ]
)


def audio_frame_energy(
    media: DataFrame, frame_samples: int = 256
) -> DataFrame:
    """Per-FRAME exact energy over PCM16 payloads: fixed
    ``frame_samples`` windows, Σx² and the sample count per frame —
    the TAIL partial frame is KEPT with its true length (dropping it
    would silently lose audio; the threshold downstream scales by the
    count, so a short frame is judged fairly).  Python only decodes
    and block-sums (vectorized reshape); everything after is native.
    Returns (media_id, frame_idx, n_samples, sum_sq)."""
    if frame_samples < 1:
        raise ValueError(
            f"audio_frame_energy: frame_samples must be >= 1, got "
            f"{frame_samples}"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                x = np.frombuffer(payload or b"", dtype="<i2").astype(
                    np.int64
                )
                n = x.size
                if n == 0:
                    continue
                nf = (n + frame_samples - 1) // frame_samples
                sq = x * x
                for f in range(nf):
                    seg = sq[f * frame_samples:(f + 1) * frame_samples]
                    recs.append(
                        (int(mid), f, int(seg.size), int(seg.sum()))
                    )
            yield pd.DataFrame(
                recs,
                columns=["media_id", "frame_idx", "n_samples", "sum_sq"],
            )

    return (
        media.where(F.col("media_type") == "audio")
        .repartition("media_id")
        .mapInPandas(run, schema=AUDIO_FRAME_SCHEMA)
    )


def audio_silence_segments(
    frame_energy: DataFrame, thr_amp: int = 100
) -> DataFrame:
    """Silence segmentation over per-frame energies — the audio
    curation primitive (trim leading/trailing silence, drop dead air,
    cut clips at pauses) as pure native gaps-and-islands: a frame is
    SILENT iff Σx² < n·thr_amp² (the RMS < thr_amp test cleared of its
    division and sqrt — exact int64: n·thr² ≤ 2⁶³ for any real clip at
    thr ≤ 10⁵), runs of equal flags merge via the flag-flip running
    sum inside the clip's own window partition.

    Output: (media_id, seg_id 1-based, is_silent, start_frame,
    end_frame inclusive, n_frames, n_samples, sum_sq)."""
    thr_sq = int(thr_amp) * int(thr_amp)
    w = W.partitionBy("media_id").orderBy("frame_idx")
    flagged = frame_energy.select(
        "media_id",
        "frame_idx",
        "n_samples",
        "sum_sq",
        (F.col("sum_sq") < F.col("n_samples") * F.lit(thr_sq)).alias(
            "is_silent"
        ),
    ).withColumn(
        "_flip",
        F.when(
            F.lag("is_silent").over(w).isNull()
            | (F.lag("is_silent").over(w) != F.col("is_silent")),
            1,
        ).otherwise(0),
    ).withColumn(
        "seg_id",
        F.sum("_flip").over(w.rowsBetween(W.unboundedPreceding, 0)),
    )
    return flagged.groupBy("media_id", "seg_id").agg(
        F.first("is_silent").alias("is_silent"),
        F.min("frame_idx").alias("start_frame"),
        F.max("frame_idx").alias("end_frame"),
        F.count(F.lit(1)).alias("n_frames"),
        F.sum("n_samples").alias("n_samples"),
        F.sum("sum_sq").alias("sum_sq"),
    )


PATCH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("patch_row", IntegerType()),
        StructField("patch_col", IntegerType()),
        StructField("n_px", LongType()),
        StructField("sum_r", LongType()),
        StructField("sum_g", LongType()),
        StructField("sum_b", LongType()),
    ]
)


def image_patches(media: DataFrame, patch: int = 16) -> DataFrame:
    """ViT-style patch extraction over raw-RGB images: the image
    partitions into a ``patch``×``patch`` non-overlapping grid (edge
    patches keep their TRUE smaller extent — truncating them would
    silently crop the image, the tail-frame rule) and each patch
    emits its exact integer channel sums + pixel count — the
    embedding-input shape every vision-tower preprocessing pipeline
    produces, with the projection itself left to the model (the
    engine's job is the exact, auditable patch table: one row per
    (image, row, col), content-hashable, twin-verifiable).

    Vectorized: one reshape + two block-sum reductions per image, no
    per-patch Python loop.  Returns (media_id, patch_row, patch_col,
    n_px, sum_r, sum_g, sum_b)."""
    if patch < 1:
        raise ValueError(f"image_patches: patch must be >= 1, got {patch}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload, w, h in zip(
                pdf["media_id"], pdf["payload"],
                pdf["meta_width"], pdf["meta_height"],
            ):
                w, h = int(w), int(h)
                img = _decode_rgb(payload, w, h).astype(np.int64)
                prows = (h + patch - 1) // patch
                pcols = (w + patch - 1) // patch
                xb = np.arange(w) // patch
                yb = np.arange(h) // patch
                sums = np.zeros((prows, pcols, 3), dtype=np.int64)
                np.add.at(sums, (yb[:, None], xb[None, :]), img)
                cnts = np.zeros((prows, pcols), dtype=np.int64)
                np.add.at(cnts, (yb[:, None], xb[None, :]), 1)
                for r in range(prows):
                    for c in range(pcols):
                        recs.append(
                            (int(mid), r, c, int(cnts[r, c]),
                             int(sums[r, c, 0]), int(sums[r, c, 1]),
                             int(sums[r, c, 2]))
                        )
            yield pd.DataFrame(
                recs,
                columns=["media_id", "patch_row", "patch_col", "n_px",
                         "sum_r", "sum_g", "sum_b"],
            )

    return (
        media.where(F.col("media_type") == "image")
        .select("media_id", "payload", "meta_width", "meta_height")
        .repartition("media_id")
        .mapInPandas(run, schema=PATCH_SCHEMA)
    )


# ---------------------------------------------------------------------------
# exact histogram equalization (the contrast-normalization preprocessor)
# ---------------------------------------------------------------------------

EQUALIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("gray", IntegerType()),
        StructField("n_pixels", LongType()),
        StructField("cdf", LongType()),
        StructField("lut", IntegerType()),
    ]
)


def image_equalize(media: DataFrame) -> DataFrame:
    """Exact histogram-equalization LUT per image — the contrast
    normalization a vision-pretraining pipeline applies before
    patching (:func:`image_patches` consumes what this normalizes):
    for every PRESENT gray level g (channel sum r+g+b ∈ [0, 765],
    the dHash luma convention) emit its pixel count, running CDF,
    and the equalized output level

        lut(g) = ((cdf(g) − cdf_min) · 255) DIV (N − cdf_min)

    — the OpenCV/GIMP formula with TRUNCATING division instead of a
    float rescale+round (np.rint half-even vs SQL half-away is a
    guaranteed eventual engine mismatch; DIV is bit-stable), where
    cdf_min is the count of the smallest present level.  A constant
    image (N = cdf_min) maps to 0 by declared convention.

    The LUT rows ARE the result (≤ 766 rows per image — inspectable,
    joinable back onto pixels to materialize equalized images); the
    per-image row count is payload-independent, so the output table
    is metadata-scale, not pixel-scale.

    Arrow-batched mapInPandas over the raw-RGB path; per-image math
    is one vectorized np.bincount + cumsum — no per-pixel Python.
    Compressed codecs gate behind STRICT_DECODE as ever.

    Returns (media_id, gray, n_pixels, cdf, lut), present levels
    only, ordered within an image by gray."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, grays, cnts, cdfs, luts = [], [], [], [], []
            for mid, payload, w, h in zip(
                pdf["media_id"], pdf["payload"],
                pdf["meta_width"], pdf["meta_height"],
            ):
                img = _decode_rgb(payload, int(w), int(h)).astype(
                    np.int64
                )
                gray = img.sum(axis=2).ravel()        # ≤ 765
                counts = np.bincount(gray, minlength=766)
                present = np.nonzero(counts)[0]
                cdf = np.cumsum(counts)[present]
                n = int(gray.size)
                cdf_min = int(counts[present[0]])
                den = n - cdf_min
                if den == 0:
                    lut = np.zeros(len(present), dtype=np.int64)
                else:
                    lut = ((cdf - cdf_min) * 255) // den
                ids.extend([int(mid)] * len(present))
                grays.extend(int(v) for v in present)
                cnts.extend(int(counts[v]) for v in present)
                cdfs.extend(int(v) for v in cdf)
                luts.extend(int(v) for v in lut)
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "gray": grays,
                    "n_pixels": cnts,
                    "cdf": cdfs,
                    "lut": luts,
                }
            )

    return (
        media.where(F.col("media_type") == "image")
        .repartition("media_id")
        .mapInPandas(run, schema=EQUALIZE_SCHEMA)
    )


# ---------------------------------------------------------------------------
# segmentation-mask path: binary masks as raw byte payloads, RLE
# compression (the COCO-annotation storage shape) and pairwise IoU —
# the mask-level dedup/agreement primitives a vision-training pipeline
# runs over annotation tables.
# ---------------------------------------------------------------------------

MASK_SCHEMA = StructType(
    [
        StructField("mask_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("meta_width", IntegerType()),
        StructField("meta_height", IntegerType()),
    ]
)

MASK_RLE_SCHEMA = StructType(
    [
        StructField("mask_id", LongType()),
        StructField("run_idx", LongType()),
        StructField("start_px", LongType()),
        StructField("run_len", LongType()),
    ]
)


def synthetic_masks(spark, n: int = 16, w: int = 48, h: int = 32) -> DataFrame:
    """Deterministic binary masks: pixel (x, y) of mask m is
    foreground iff (x·3 + y·7 + m·13) mod 256 < 96 — the raw-RGB
    generator's modular family, giving every mask ~37.5% coverage in
    diagonal stripes whose phase shifts with m (so distinct masks
    overlap partially: non-trivial IoU structure).  Payload is one
    byte per pixel (0/1), row-major."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid in pdf["id"]:
                x = np.arange(w)[None, :]
                y = np.arange(h)[:, None]
                fg = ((x * 3 + y * 7 + int(mid) * 13) % 256 < 96)
                recs.append(
                    (int(mid), fg.astype(np.uint8).tobytes(), w, h)
                )
            yield pd.DataFrame(
                recs,
                columns=["mask_id", "payload", "meta_width",
                         "meta_height"],
            )

    return spark.range(0, n).mapInPandas(gen, schema=MASK_SCHEMA)


def mask_rle_encode(masks: DataFrame) -> DataFrame:
    """Run-length encode binary masks (row-major scanline order) —
    the COCO-style compressed representation: one row per foreground
    run, (mask_id, run_idx 1-based in scan order, start_px flat
    offset, run_len).  An all-background mask emits no rows (absent,
    not a sentinel).

    Row-local and shuffle-free: the decode + transition scan runs in
    ``mapInPandas`` (np.diff over the flat byte view — vectorized,
    never a per-pixel Python loop), so RLE at 100 TB is a pure map
    stage whose output is ~coverage·2 ints per run instead of w·h
    bytes per mask.  The DuckDB twin rebuilds the runs from the
    foreground PIXEL SET with gaps-and-islands — a structurally
    different derivation, so the transition scan itself is what gets
    hash-verified."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["mask_id"], pdf["payload"]):
                flat = np.frombuffer(payload, dtype=np.uint8)
                if flat.size == 0:
                    continue
                bounded = np.concatenate(([0], flat, [0]))
                d = np.diff(bounded.astype(np.int8))
                starts = np.nonzero(d == 1)[0]
                ends = np.nonzero(d == -1)[0]
                for i, (s, e) in enumerate(zip(starts, ends), start=1):
                    recs.append((int(mid), i, int(s), int(e - s)))
            yield pd.DataFrame(
                recs,
                columns=["mask_id", "run_idx", "start_px", "run_len"],
            )

    return masks.select("mask_id", "payload").mapInPandas(
        run, schema=MASK_RLE_SCHEMA
    )


def mask_rle_runs_sql(fgpx_src: str) -> str:
    """DuckDB twin of :func:`mask_rle_encode` from a foreground pixel
    set (``mask_id``, ``px`` flat offsets) — gaps-and-islands: island
    id = px − dense scan rank, then per-island min/count.  Standalone
    statement returning (mask_id, run_idx, start_px, run_len)."""
    return f"""
        WITH mrl_px AS (
            SELECT mask_id, px,
                   px - ROW_NUMBER() OVER (PARTITION BY mask_id
                                           ORDER BY px) AS _island
            FROM {fgpx_src}
        ),
        mrl_runs AS (
            SELECT mask_id, MIN(px) AS start_px, COUNT(*) AS run_len
            FROM mrl_px GROUP BY mask_id, _island
        )
        SELECT mask_id,
               CAST(ROW_NUMBER() OVER (PARTITION BY mask_id
                                       ORDER BY start_px) AS BIGINT)
                   AS run_idx,
               CAST(start_px AS BIGINT) AS start_px,
               CAST(run_len AS BIGINT) AS run_len
        FROM mrl_runs
    """


def mask_iou_pairs(runs: DataFrame, bucket: int = 256) -> DataFrame:
    """Pairwise IoU between RLE-encoded masks — intersection computed
    by INTERVAL algebra over the runs (overlap of two runs =
    least(ends) − greatest(starts) when positive), never by
    re-materializing pixels: the mask-level near-dup / annotator-
    agreement join.

    Scale design: a run explodes over the ``bucket``-sized offset
    blocks it covers (fan = run_len/bucket + 1, bounded by mask
    geometry), candidates are the block EQUI-join (a.mask < b.mask) —
    never an all-pairs × all-runs conditional join — and each
    overlapping run pair is counted exactly once by the OWNER-BUCKET
    rule: only the block containing the overlap's left endpoint
    emits, so no distinct pass is needed.  Pair areas join from the
    |masks|-sized per-mask aggregate.

    Exact ppm:  iou_ppm = inter·10⁶ DIV (area_a + area_b − inter).
    Pairs with zero overlapping run blocks are absent (IoU 0 by
    construction).  Returns (mask_a, mask_b, area_a, area_b,
    inter_px, union_px, iou_ppm)."""
    if bucket < 1:
        raise ValueError(f"bucket must be >= 1, got {bucket}")
    r = runs.select(
        "mask_id", "start_px",
        (F.col("start_px") + F.col("run_len")).alias("end_px"),
    )
    areas = runs.groupBy("mask_id").agg(
        F.sum("run_len").alias("area")
    )
    expl = r.select(
        "mask_id", "start_px", "end_px",
        F.explode(
            F.sequence(
                F.expr(f"start_px DIV {int(bucket)}"),
                F.expr(f"(end_px - 1) DIV {int(bucket)}"),
            )
        ).alias("_blk"),
    )
    a, b = expl.alias("a"), expl.alias("b")
    ov_start = F.greatest(F.col("a.start_px"), F.col("b.start_px"))
    ov_end = F.least(F.col("a.end_px"), F.col("b.end_px"))
    pairs = (
        a.join(
            b,
            (F.col("a._blk") == F.col("b._blk"))
            & (F.col("a.mask_id") < F.col("b.mask_id")),
        )
        .where(
            (ov_end > ov_start)
            & (F.col("a._blk") == F.floor(ov_start / bucket))
        )
        .groupBy(
            F.col("a.mask_id").alias("mask_a"),
            F.col("b.mask_id").alias("mask_b"),
        )
        .agg(F.sum(ov_end - ov_start).alias("inter_px"))
    )
    return (
        pairs.join(
            F.broadcast(areas).withColumnRenamed("mask_id", "mask_a")
            .withColumnRenamed("area", "area_a"),
            "mask_a",
        )
        .join(
            F.broadcast(areas).withColumnRenamed("mask_id", "mask_b")
            .withColumnRenamed("area", "area_b"),
            "mask_b",
        )
        .select(
            "mask_a", "mask_b", "area_a", "area_b", "inter_px",
            (F.col("area_a") + F.col("area_b") - F.col("inter_px"))
            .alias("union_px"),
            F.expr(
                "CAST((inter_px * 1000000) DIV "
                "(area_a + area_b - inter_px) AS BIGINT)"
            ).alias("iou_ppm"),
        )
    )


def mask_iou_sql(fgpx_src: str) -> str:
    """DuckDB twin of :func:`mask_iou_pairs` from the foreground pixel
    set — deliberately PIXEL-level (self-join on equal offsets), a
    different algorithm family than the operator's interval algebra,
    so the run-overlap arithmetic itself is what gets verified.
    Standalone statement; pairs with zero intersection are absent,
    matching the operator."""
    return f"""
        WITH miou_px AS MATERIALIZED (
            SELECT mask_id, px FROM {fgpx_src}
        ),
        miou_area AS (
            SELECT mask_id, COUNT(*) AS area FROM miou_px GROUP BY 1
        ),
        miou_inter AS (
            SELECT a.mask_id AS mask_a, b.mask_id AS mask_b,
                   COUNT(*) AS inter_px
            FROM miou_px a JOIN miou_px b
              ON a.px = b.px AND a.mask_id < b.mask_id
            GROUP BY 1, 2
        )
        SELECT i.mask_a, i.mask_b,
               CAST(aa.area AS BIGINT) AS area_a,
               CAST(ab.area AS BIGINT) AS area_b,
               CAST(i.inter_px AS BIGINT) AS inter_px,
               CAST(aa.area + ab.area - i.inter_px AS BIGINT)
                   AS union_px,
               CAST((i.inter_px * 1000000)
                    // (aa.area + ab.area - i.inter_px) AS BIGINT)
                   AS iou_ppm
        FROM miou_inter i
        JOIN miou_area aa ON aa.mask_id = i.mask_a
        JOIN miou_area ab ON ab.mask_id = i.mask_b
    """


def video_keyframes(
    frame_hashes: DataFrame,
    threshold: int = 10,
    max_shot_frames: int = 4_096,
) -> DataFrame:
    """Per-shot keyframe selection: within each detected shot (same
    cut rule as :func:`video_shot_segments` — shared helper, so the
    two operators agree on shot boundaries by construction) the
    MEDOID frame wins: argmin over frames of the summed dHash Hamming
    distance to every frame of the shot, lowest frame_idx on ties —
    the representative frame a sampling pipeline keeps per shot
    instead of a fixed first-frame (which may sit on the cut's motion
    blur).

    Exact integers throughout (bit_count of xor, integer sums; min
    over (sum, idx) structs is total-ordered), so the choice is
    parallelism-independent and twin-verifiable.

    Scale design: the medoid needs all-pairs WITHIN a shot — the fan
    is shot-local (Σ n_f² per shot, never cross-shot or cross-clip),
    equi-joined on (clip, shot) and guarded LOUD by
    ``max_shot_frames`` (the hausdorff_pairs pattern: a pathological
    cut-free clip fails instead of silently going quadratic).
    Self-pairs contribute Hamming 0, leaving the argmin unchanged.

    Returns (media_id, shot_id, keyframe_idx, n_frames,
    sum_hamming)."""
    steps = _shot_steps(frame_hashes, threshold).select(
        "media_id", "shot_id", "frame_idx", "fhash"
    )
    sizes = steps.groupBy("media_id", "shot_id").agg(
        F.count(F.lit(1)).alias("n_frames")
    )
    ok = F.assert_true(
        F.col("n_frames") <= F.lit(int(max_shot_frames)),
        F.lit(
            f"video_keyframes: a shot exceeds max_shot_frames="
            f"{max_shot_frames}; lower the cut threshold or pre-split "
            "clips"
        ),
    )
    guarded = steps.join(
        F.broadcast(sizes), ["media_id", "shot_id"]
    ).select(
        "media_id", "shot_id", "n_frames",
        F.when(ok.isNull(), F.col("frame_idx")).alias("frame_idx"),
        "fhash",
    )
    a, b = guarded.alias("a"), guarded.alias("b")
    summed = (
        a.join(
            b,
            (F.col("a.media_id") == F.col("b.media_id"))
            & (F.col("a.shot_id") == F.col("b.shot_id")),
        )
        .groupBy(
            F.col("a.media_id").alias("media_id"),
            F.col("a.shot_id").alias("shot_id"),
            F.col("a.frame_idx").alias("frame_idx"),
            F.col("a.n_frames").alias("n_frames"),
        )
        .agg(
            F.sum(
                F.bit_count(
                    F.col("a.fhash").bitwiseXOR(F.col("b.fhash"))
                )
            ).alias("_sum_ham")
        )
    )
    return (
        summed.groupBy("media_id", "shot_id")
        .agg(
            F.min(
                F.struct(
                    F.col("_sum_ham"), F.col("frame_idx"),
                    F.col("n_frames"),
                )
            ).alias("_best")
        )
        .select(
            "media_id", "shot_id",
            F.col("_best.frame_idx").alias("keyframe_idx"),
            F.col("_best.n_frames").alias("n_frames"),
            F.col("_best._sum_ham").alias("sum_hamming"),
        )
    )


def video_keyframes_sql(fh_src: str, threshold: int = 10) -> str:
    """DuckDB twin of :func:`video_keyframes` from a frame-hash source
    (``media_id``, ``frame_idx``, ``fhash``) — same cut rule, same
    shot-local pair sum, same (sum, idx) argmin.  Standalone
    statement; vk_*-namespaced CTEs."""
    return f"""
        WITH vk_steps AS MATERIALIZED (
            SELECT media_id, frame_idx, fhash,
                   CAST(SUM(CASE WHEN ham IS NULL OR ham > {threshold}
                            THEN 1 ELSE 0 END)
                        OVER (PARTITION BY media_id ORDER BY frame_idx
                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS shot_id
            FROM (
                SELECT media_id, frame_idx, fhash,
                       bit_count(xor(fhash,
                           LAG(fhash) OVER (PARTITION BY media_id
                                            ORDER BY frame_idx))) AS ham
                FROM {fh_src}
            )
        ),
        vk_sum AS (
            SELECT a.media_id, a.shot_id, a.frame_idx,
                   COUNT(*) AS n_frames,
                   SUM(bit_count(xor(a.fhash, b.fhash))) AS sum_ham
            FROM vk_steps a
            JOIN vk_steps b ON b.media_id = a.media_id
                           AND b.shot_id = a.shot_id
            GROUP BY 1, 2, 3
        ),
        vk_best AS (
            SELECT media_id, shot_id, frame_idx, n_frames, sum_ham,
                   ROW_NUMBER() OVER (PARTITION BY media_id, shot_id
                                      ORDER BY sum_ham, frame_idx)
                       AS rk
            FROM vk_sum
        )
        SELECT media_id, shot_id,
               CAST(frame_idx AS INTEGER) AS keyframe_idx,
               CAST(n_frames AS BIGINT) AS n_frames,
               CAST(sum_ham AS BIGINT) AS sum_hamming
        FROM vk_best WHERE rk = 1
    """


AUDIO_ZCR_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("n_samples", LongType()),
        StructField("n_zc", LongType()),
        StructField("peak", LongType()),
    ]
)


def audio_zcr_frames(
    media: DataFrame, frame_samples: int = 256
) -> DataFrame:
    """Per-frame zero-crossing count + peak amplitude over PCM16
    payloads — the spectral-content proxy that energy alone can't
    see (:func:`audio_frame_energy` separates loud from quiet; ZCR
    separates tonal/low-frequency from noisy/high-frequency at ANY
    level): voice-activity detection gates on the (energy, zcr)
    pair, and on the gated synth the quiet bursts are period-7
    sawtooths whose ZCR is ~18× the loud ramp's — structural
    separation, not threshold tuning.

    Exactness: a crossing is x_{j−1}·x_j < 0 (strict sign flip;
    zeros never cross — the portable convention with no ±0
    ambiguity), counted FRAME-LOCALLY between consecutive samples of
    the same frame (boundary pairs belong to no frame — stated, so
    the twin's pair grouping is unambiguous).  peak = max |x| exact
    int64.  Tail frame kept with its true length (the
    audio_frame_energy rule).

    Python only decodes and vectorizes the product-sign scan
    (np reshape + slice); Returns (media_id, frame_idx, n_samples,
    n_zc, peak)."""
    if frame_samples < 1:
        raise ValueError(
            f"audio_zcr_frames: frame_samples must be >= 1, got "
            f"{frame_samples}"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                x = np.frombuffer(payload or b"", dtype="<i2").astype(
                    np.int64
                )
                n = x.size
                if n == 0:
                    continue
                nf = (n + frame_samples - 1) // frame_samples
                for f in range(nf):
                    seg = x[f * frame_samples:(f + 1) * frame_samples]
                    zc = int(((seg[:-1] * seg[1:]) < 0).sum())
                    recs.append(
                        (int(mid), f, int(seg.size), zc,
                         int(np.abs(seg).max()))
                    )
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id", "frame_idx", "n_samples", "n_zc", "peak",
                ],
            )

    return (
        media.where(F.col("media_type") == "audio")
        .repartition("media_id")
        .mapInPandas(run, schema=AUDIO_ZCR_SCHEMA)
    )


IMAGE_GRADIENT_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_interior", LongType()),
        StructField("grad_l1", LongType()),
        StructField("grad_max", LongType()),
        StructField("n_edges", LongType()),
    ]
)


def image_gradients(
    media: DataFrame, edge_threshold: int = 512
) -> DataFrame:
    """Exact Sobel gradient statistics per raw-RGB image — the
    sharpness/edge-density quality gate of an image curation
    pipeline (blurry/blank frames score near zero; screenshots and
    text-heavy images score high): channel-sum luma g = r+g+b
    (0..765, no division), the standard Sobel pair on INTERIOR
    pixels

        gx = (g[y−1,x+1]+2g[y,x+1]+g[y+1,x+1])
           − (g[y−1,x−1]+2g[y,x−1]+g[y+1,x−1]),   gy = transpose,

    magnitude in L1 (|gx|+|gy| — exact int64, no sqrt), rolled up per
    image: interior count, total L1 energy, max magnitude, and the
    count of pixels ≥ ``edge_threshold`` (an EMITTED parameter of
    the report, not a hidden tune).

    Python only decodes and runs the vectorized shift arithmetic
    (nine numpy slices); per-pixel magnitudes never leave the
    executor — the rollup ships 1 row per image.  The oracle
    regenerates every pixel and replays the same kernel via a 3×3
    VALUES join, so decode + kernel + rollup are all hash-verified.

    Returns (media_id, n_interior, grad_l1, grad_max, n_edges)."""
    thr = int(edge_threshold)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload, w, h in zip(
                pdf["media_id"], pdf["payload"],
                pdf["meta_width"], pdf["meta_height"],
            ):
                w, h = int(w), int(h)
                if w < 3 or h < 3 or not payload:
                    continue
                img = np.frombuffer(payload, dtype=np.uint8).reshape(
                    h, w, 3
                )
                g = img.sum(axis=2, dtype=np.int64)
                gx = (
                    (g[:-2, 2:] + 2 * g[1:-1, 2:] + g[2:, 2:])
                    - (g[:-2, :-2] + 2 * g[1:-1, :-2] + g[2:, :-2])
                )
                gy = (
                    (g[2:, :-2] + 2 * g[2:, 1:-1] + g[2:, 2:])
                    - (g[:-2, :-2] + 2 * g[:-2, 1:-1] + g[:-2, 2:])
                )
                mag = np.abs(gx) + np.abs(gy)
                recs.append(
                    (
                        int(mid),
                        int(mag.size),
                        int(mag.sum()),
                        int(mag.max()),
                        int((mag >= thr).sum()),
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id", "n_interior", "grad_l1", "grad_max",
                    "n_edges",
                ],
            )

    return (
        media.where(F.col("media_type") == "image")
        .repartition("media_id")
        .mapInPandas(run, schema=IMAGE_GRADIENT_SCHEMA)
    )


def image_gradients_sql(
    n: int, w: int, h: int, edge_threshold: int = 512
) -> str:
    """DuckDB twin of :func:`image_gradients` over the
    synthetic_raw_rgb_media closed form (pixel (x,y,c) =
    (3x+7y+11c+13·id) mod 256): regenerates the luma grid and
    replays the Sobel pair as a 3×3 VALUES join with the kernel
    weights — a structurally different execution of the same
    arithmetic.  Standalone statement."""
    return f"""
        WITH ig_px AS (
            SELECT m.id AS media_id, y.y, x.x,
                   CAST((x.x*3 + y.y*7 + 0  + m.id*13) % 256
                      + (x.x*3 + y.y*7 + 11 + m.id*13) % 256
                      + (x.x*3 + y.y*7 + 22 + m.id*13) % 256
                      AS BIGINT) AS g
            FROM (SELECT UNNEST(range(0, {int(n)})) AS id) m,
                 range(0, {int(h)}) y(y), range(0, {int(w)}) x(x)
        ),
        ig_k AS (
            SELECT * FROM (VALUES
                (-1,-1,-1,-1), (-1,0,0,-2), (-1,1,1,-1),
                ( 0,-1,-2, 0), ( 0,1,2, 0),
                ( 1,-1,-1, 1), ( 1,0,0, 2), ( 1,1,1, 1)
            ) k(dy, dx, wx, wy)
        ),
        ig_grad AS (
            SELECT p.media_id, p.y, p.x,
                   ABS(SUM(q.g * k.wx)) + ABS(SUM(q.g * k.wy)) AS mag
            FROM ig_px p
            JOIN ig_k k ON TRUE
            JOIN ig_px q ON q.media_id = p.media_id
                        AND q.y = p.y + k.dy AND q.x = p.x + k.dx
            WHERE p.y BETWEEN 1 AND {int(h)} - 2
              AND p.x BETWEEN 1 AND {int(w)} - 2
            GROUP BY 1, 2, 3
        )
        SELECT media_id,
               CAST(COUNT(*) AS BIGINT) AS n_interior,
               CAST(SUM(mag) AS BIGINT) AS grad_l1,
               CAST(MAX(mag) AS BIGINT) AS grad_max,
               CAST(SUM(CASE WHEN mag >= {int(edge_threshold)}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_edges
        FROM ig_grad GROUP BY 1
    """


def audio_zcr_sql(
    n: int, n_samples: int = 2048, burst: int = 256,
    frame_samples: int = 256,
) -> str:
    """DuckDB twin of :func:`audio_zcr_frames` over the
    synthetic_gated_pcm_media closed form — every sample replayed;
    crossings counted frame-locally via LAG inside the (clip, frame)
    partition.  Standalone statement."""
    return f"""
        WITH az_samp AS (
            SELECT c.id AS media_id, i.i,
                   CAST(i.i // {int(frame_samples)} AS INTEGER)
                       AS frame_idx,
                   CASE WHEN ((i.i // {int(burst)}) + c.id) % 3 = 1
                        THEN (i.i * 3) % 21 - 10
                        ELSE (i.i * 7 + c.id * 13) % 2001 - 1000
                   END AS s
            FROM (SELECT UNNEST(range(0, {int(n)})) AS id) c,
                 range(0, {int(n_samples)}) i(i)
        ),
        az_lag AS (
            SELECT media_id, frame_idx, s,
                   LAG(s) OVER (PARTITION BY media_id, frame_idx
                                ORDER BY i) AS prev
            FROM az_samp
        )
        SELECT media_id, frame_idx,
               CAST(COUNT(*) AS BIGINT) AS n_samples,
               CAST(SUM(CASE WHEN prev * s < 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_zc,
               CAST(MAX(ABS(s)) AS BIGINT) AS peak
        FROM az_lag GROUP BY 1, 2
    """


# ---------------------------------------------------------------------------
# Otsu binarization threshold — exact integer between-class variance
# ---------------------------------------------------------------------------

OTSU_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("threshold", LongType()),
        StructField("w_below", LongType()),
        StructField("sum_below", LongType()),
        StructField("score_q", LongType()),
    ]
)

_OTSU_SHIFT = 20  # score quantization: q = num·2²⁰ DIV den


def image_otsu(media: DataFrame) -> DataFrame:
    """Exact Otsu binarization threshold per image — the foreground/
    background split a document-scan or mask-extraction pipeline runs
    before OCR or RLE masking (:func:`mask_rle_encode` consumes what
    this binarizes).  Works on the dHash luma convention (channel sum
    r+g+b ∈ [0, 765]).

    Otsu maximizes the between-class variance σ_b²(t) = w₀w₁(μ₀−μ₁)²
    over thresholds t (class 0 = gray ≤ t).  With integer pixel
    counts that objective is the exact rational

        num(t) / den(t) = (sumB·W − S·wB)² / (wB·(W − wB))

    (W total pixels, S total luma mass, wB/sumB the ≤t prefix count/
    mass) — W·σ_b²(t) up to the constant W, so the argmax is
    unchanged.  Both engines rank by the IDENTICALLY-quantized score
    q = num·2²⁰ DIV den (num/den ≤ W·(765/2)² keeps q far inside
    int64; the wide num itself exceeds int64, so it runs in Python
    ints here and HUGEINT in the twin) with the LOWEST-threshold
    tie-break, so the selected threshold is bit-stable across engines
    and parallelism.  Degenerate prefixes (wB = 0 or W — constant
    images have ONLY those and emit no row) are excluded: σ_b² is
    undefined there, not zero.  The argmax-minimal t is always a
    PRESENT gray level (the score is a step function that only
    changes at present levels), so only present levels are scored —
    ≤766 candidates per image regardless of payload size.

    Arrow-batched mapInPandas over the raw-RGB path (np.bincount +
    cumsum per image; the ≤766-step argmax loop runs on the
    histogram, never the pixels).  The DuckDB twin regenerates every
    pixel from the synthetic closed form and replays prefix masses as
    window sums — decode, score, and argmax all hash-verified.

    Returns (media_id, threshold, w_below, sum_below, score_q)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload, w, h in zip(
                pdf["media_id"], pdf["payload"],
                pdf["meta_width"], pdf["meta_height"],
            ):
                img = _decode_rgb(payload, int(w), int(h)).astype(
                    np.int64
                )
                gray = img.sum(axis=2).ravel()
                counts = np.bincount(gray, minlength=766)
                cum = np.cumsum(counts)
                mass = np.cumsum(counts * np.arange(766))
                big_w = int(gray.size)
                big_s = int(mass[-1])
                best = None
                for g in np.nonzero(counts)[0]:
                    wb = int(cum[g])
                    if wb == 0 or wb == big_w:
                        continue
                    sb = int(mass[g])
                    d = sb * big_w - big_s * wb
                    q = (d * d << _OTSU_SHIFT) // (wb * (big_w - wb))
                    # strict > keeps the LOWEST threshold on ties
                    if best is None or q > best[3]:
                        best = (int(g), wb, sb, q)
                if best is not None:
                    recs.append((int(mid),) + best)
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id", "threshold", "w_below", "sum_below",
                    "score_q",
                ],
            )

    return (
        media.where(F.col("media_type") == "image")
        .repartition("media_id")
        .mapInPandas(run, schema=OTSU_SCHEMA)
    )


def image_otsu_sql(n: int, w: int, h: int) -> str:
    """DuckDB twin of :func:`image_otsu` over the
    synthetic_raw_rgb_media closed form: pixels regenerated, prefix
    count/mass as window sums over present gray levels, the identical
    q = num·2²⁰ // den quantized score in HUGEINT, ROW_NUMBER argmax
    with the same lowest-threshold tie-break.  Standalone."""
    return f"""
        WITH ot_px AS (
            SELECT m.id AS media_id,
                   CAST((x.x*3 + y.y*7 + 0  + m.id*13) % 256
                      + (x.x*3 + y.y*7 + 11 + m.id*13) % 256
                      + (x.x*3 + y.y*7 + 22 + m.id*13) % 256
                      AS BIGINT) AS g
            FROM (SELECT UNNEST(range(0, {int(n)})) AS id) m,
                 range(0, {int(h)}) y(y), range(0, {int(w)}) x(x)
        ),
        ot_hist AS (
            SELECT media_id, g, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM ot_px GROUP BY 1, 2
        ),
        ot_cum AS (
            SELECT media_id, g,
                   SUM(cnt) OVER (PARTITION BY media_id ORDER BY g)
                       AS w_below,
                   SUM(cnt * g) OVER (PARTITION BY media_id ORDER BY g)
                       AS sum_below,
                   SUM(cnt) OVER (PARTITION BY media_id) AS big_w,
                   SUM(cnt * g) OVER (PARTITION BY media_id) AS big_s
            FROM ot_hist
        ),
        ot_scored AS (
            SELECT media_id, g,
                   CAST(w_below AS BIGINT) AS w_below,
                   CAST(sum_below AS BIGINT) AS sum_below,
                   CAST(CAST(sum_below * big_w - big_s * w_below
                             AS HUGEINT)
                        * CAST(sum_below * big_w - big_s * w_below
                               AS HUGEINT)
                        * {1 << _OTSU_SHIFT}
                        // (CAST(w_below AS HUGEINT)
                            * (big_w - w_below))
                        AS BIGINT) AS score_q
            FROM ot_cum
            WHERE w_below > 0 AND w_below < big_w
        ),
        ot_best AS (
            SELECT media_id, g, w_below, sum_below, score_q,
                   ROW_NUMBER() OVER (
                       PARTITION BY media_id
                       ORDER BY score_q DESC, g ASC
                   ) AS rn
            FROM ot_scored
        )
        SELECT media_id, g AS threshold, w_below, sum_below, score_q
        FROM ot_best WHERE rn = 1
    """


# ---------------------------------------------------------------------------
# autocorrelation pitch estimation over PCM16 frames
# ---------------------------------------------------------------------------

AUDIO_PITCH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("n_samples", LongType()),
        StructField("r0", LongType()),
        StructField("best_lag", LongType()),
        StructField("best_r", LongType()),
    ]
)


def synthetic_square_pcm_media(
    spark, n: int = 8, n_samples: int = 1024
) -> DataFrame:
    """Deterministic square-wave PCM16 clips for the pitch path:
    clip id has period P = 16 + (id mod 5)·8 (16..48 samples) and
    amplitude A = 500 + (id·37 mod 400); sample i is +A when
    (i DIV (P/2)) is even else −A.  The planted period makes the
    autocorrelation argmax STRUCTURAL (R(τ) peaks exactly at τ = P,
    the smallest in-band multiple), not threshold-tuned — and the
    closed form replays in one CASE expression in the twin."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid in pdf["id"]:
                half = 8 + (int(mid) % 5) * 4
                amp = 500 + (int(mid) * 37) % 400
                i = np.arange(n_samples, dtype=np.int64)
                x = np.where((i // half) % 2 == 0, amp, -amp).astype(
                    "<i2"
                )
                recs.append(
                    (int(mid), f"media://audio/sq{mid}", "audio",
                     x.tobytes(), 0, 0, n_samples * 1000 // 8000,
                     "pcm_s16le/raw")
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id", "url", "media_type", "payload",
                    "meta_width", "meta_height", "meta_duration_ms",
                    "meta_codec",
                ],
            )

    return spark.range(0, n).mapInPandas(gen, schema=MEDIA_SCHEMA)


def audio_pitch_frames(
    media: DataFrame,
    frame_samples: int = 256,
    min_lag: int = 8,
    max_lag: int = 64,
) -> DataFrame:
    """Per-frame fundamental-period estimate by EXACT integer
    autocorrelation — the pitch tracker of the PCM16 family
    (:func:`audio_frame_energy` = loudness, :func:`audio_zcr_frames`
    = spectral proxy, this = periodicity): per frame,

        R(τ) = Σ_{j<n−τ} x_j · x_{j+τ},   τ ∈ [min_lag, max_lag]

    unnormalized (int16 products over ≤4096-sample frames stay under
    2³⁹ — far inside int64), best_lag = argmax R with the SMALLEST-τ
    tie-break, so a period-P tone reports P itself rather than an
    arbitrary multiple; r0 = Σ x² is the energy reference the caller
    normalizes by if it wants a periodicity score (r_best/r0 ≤ 1 by
    Cauchy-Schwarz — left rational, never divided here).  Frames are
    the audio_zcr convention (tail kept at true length, pairs frame-
    local); frames shorter than min_lag+1 have NO valid lag and emit
    NULL best_lag/best_r.  Lags beyond n−1 of a short frame are
    skipped (an empty sum is no evidence, not R = 0).

    Python only decodes and runs one vectorized dot per (frame, lag)
    on the sample array (≤ max_lag slices, no per-sample Python).
    The DuckDB twin replays every sample from
    the synthetic closed form and computes R(τ) as a lag self-join —
    decode, window algebra, and argmax all hash-verified.

    Returns (media_id, frame_idx, n_samples, r0, best_lag, best_r)."""
    if not (1 <= min_lag <= max_lag):
        raise ValueError(
            f"audio_pitch_frames: need 1 <= min_lag <= max_lag, got "
            f"{min_lag}..{max_lag}"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                x = np.frombuffer(payload or b"", dtype="<i2").astype(
                    np.int64
                )
                n = x.size
                if n == 0:
                    continue
                nf = (n + frame_samples - 1) // frame_samples
                for f in range(nf):
                    seg = x[f * frame_samples:(f + 1) * frame_samples]
                    m = seg.size
                    r0 = int(np.dot(seg, seg))
                    best = None
                    for tau in range(min_lag, min(max_lag, m - 1) + 1):
                        r = int(np.dot(seg[:-tau], seg[tau:]))
                        if best is None or r > best[1]:
                            best = (tau, r)   # strict >: smallest τ wins
                    recs.append(
                        (int(mid), f, m, r0,
                         None if best is None else best[0],
                         None if best is None else best[1])
                    )
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id", "frame_idx", "n_samples", "r0",
                    "best_lag", "best_r",
                ],
            )

    return (
        media.where(F.col("media_type") == "audio")
        .repartition("media_id")
        .mapInPandas(run, schema=AUDIO_PITCH_SCHEMA)
    )


def audio_pitch_sql(
    n: int,
    n_samples: int = 1024,
    frame_samples: int = 256,
    min_lag: int = 8,
    max_lag: int = 64,
) -> str:
    """DuckDB twin of :func:`audio_pitch_frames` over the
    synthetic_square_pcm_media closed form: samples regenerated from
    the CASE expression, R(τ) as a frame-local lag self-join, argmax
    via ROW_NUMBER with the same smallest-τ tie-break.  Standalone."""
    return f"""
        WITH ap_samp AS (
            SELECT c.id AS media_id, i.i,
                   CAST(i.i // {int(frame_samples)} AS BIGINT)
                       AS frame_idx,
                   i.i % {int(frame_samples)} AS j,
                   CAST(CASE WHEN (i.i // (8 + (c.id % 5) * 4)) % 2 = 0
                             THEN 500 + (c.id * 37) % 400
                             ELSE -(500 + (c.id * 37) % 400)
                        END AS BIGINT) AS s
            FROM (SELECT UNNEST(range(0, {int(n)})) AS id) c,
                 range(0, {int(n_samples)}) i(i)
        ),
        ap_frame AS (
            SELECT media_id, frame_idx,
                   CAST(COUNT(*) AS BIGINT) AS n_fr,
                   CAST(SUM(s * s) AS BIGINT) AS r0
            FROM ap_samp GROUP BY 1, 2
        ),
        ap_r AS (
            SELECT a.media_id, a.frame_idx, l.tau,
                   CAST(SUM(a.s * b.s) AS BIGINT) AS r
            FROM ap_samp a
            JOIN (SELECT UNNEST(range({int(min_lag)}, {int(max_lag)} + 1))
                      AS tau) l ON TRUE
            JOIN ap_samp b ON b.media_id = a.media_id
                          AND b.frame_idx = a.frame_idx
                          AND b.j = a.j + l.tau
            GROUP BY 1, 2, 3
        ),
        ap_best AS (
            SELECT media_id, frame_idx, tau, r,
                   ROW_NUMBER() OVER (
                       PARTITION BY media_id, frame_idx
                       ORDER BY r DESC, tau ASC
                   ) AS rn
            FROM ap_r
        )
        SELECT f.media_id, f.frame_idx, f.n_fr AS n_samples, f.r0,
               b.tau AS best_lag, b.r AS best_r
        FROM ap_frame f
        LEFT JOIN ap_best b ON b.media_id = f.media_id
                           AND b.frame_idx = f.frame_idx AND b.rn = 1
    """


BOX_CONTRAST_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_interior", LongType()),
        StructField("contrast_sum", LongType()),
        StructField("contrast_max", LongType()),
        StructField("n_flat", LongType()),
    ]
)


def image_box_contrast(
    media: DataFrame, radius: int = 2, flat_threshold: int = 8
) -> DataFrame:
    """Exact local-contrast statistics per raw-RGB image via the
    INTEGRAL IMAGE — the blur/blank-frame gate complementing
    :func:`image_gradients` (Sobel fires on edges; this measures how
    far each pixel sits from its whole (2r+1)² neighborhood MEAN, so
    smooth gradients that fool an edge count still read as flat):

        box(y,x)      = Σ luma over the (2r+1)² window (integral
                        image: ONE 2-D prefix sum, O(1) per pixel —
                        not O(r²); the operator exists to exercise
                        exactly this trick at pixel scale)
        contrast(y,x) = |A·g(y,x) − box(y,x)|,  A = (2r+1)²
                        (the mean comparison ×A, so no division)
        n_flat        = #{contrast ≤ flat_threshold·A}
                        (≈ "center within flat_threshold luma levels
                        of its neighborhood mean" — the parameter is
                        part of the report, not a hidden tune)

    All integers are exact: luma ≤ 765, A ≤ 25 at the r ≤ 7 guard, a
    48×32 image's contrast_sum < 2²⁵.  Python only decodes and runs
    the cumsum arithmetic; per-pixel values never leave the executor —
    1 row per image ships.  The DuckDB twin regenerates every pixel
    and computes the SAME box sums by a (2r+1)² VALUES-join — the
    O(r²) direct form — so the integral-image shortcut itself is what
    gets verified.

    Returns (media_id, n_interior, contrast_sum, contrast_max,
    n_flat)."""
    r = int(radius)
    if not 1 <= r <= 7:
        raise ValueError(f"radius out of range: {radius}")
    thr = int(flat_threshold)
    area = (2 * r + 1) ** 2

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload, w, h in zip(
                pdf["media_id"], pdf["payload"],
                pdf["meta_width"], pdf["meta_height"],
            ):
                w, h = int(w), int(h)
                if w < 2 * r + 1 or h < 2 * r + 1 or not payload:
                    continue
                img = np.frombuffer(payload, dtype=np.uint8).reshape(
                    h, w, 3
                )
                g = img.sum(axis=2, dtype=np.int64)
                ii = np.zeros((h + 1, w + 1), dtype=np.int64)
                ii[1:, 1:] = g.cumsum(axis=0).cumsum(axis=1)
                # box sums for interior centers y in [r, h-r), x same
                y0, y1 = 0, h - 2 * r
                x0, x1 = 0, w - 2 * r
                box = (
                    ii[y0 + 2 * r + 1: y1 + 2 * r + 1,
                       x0 + 2 * r + 1: x1 + 2 * r + 1]
                    - ii[y0: y1, x0 + 2 * r + 1: x1 + 2 * r + 1]
                    - ii[y0 + 2 * r + 1: y1 + 2 * r + 1, x0: x1]
                    + ii[y0: y1, x0: x1]
                )
                center = g[r: h - r, r: w - r]
                contrast = np.abs(area * center - box)
                recs.append(
                    (
                        int(mid),
                        int(contrast.size),
                        int(contrast.sum()),
                        int(contrast.max()),
                        int((contrast <= thr * area).sum()),
                    )
                )
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id", "n_interior", "contrast_sum",
                    "contrast_max", "n_flat",
                ],
            )

    return (
        media.where(F.col("media_type") == "image")
        .repartition("media_id")
        .mapInPandas(run, schema=BOX_CONTRAST_SCHEMA)
    )


def image_box_contrast_sql(
    n: int, w: int, h: int, radius: int = 2, flat_threshold: int = 8
) -> str:
    """DuckDB twin of :func:`image_box_contrast` over the
    synthetic_raw_rgb_media closed form: regenerates the luma grid
    and computes each interior box sum by the DIRECT (2r+1)²-tap
    neighborhood join — the O(r²) execution shape the operator's
    integral image shortcut replaces, so the shortcut is what gets
    verified.  Standalone statement."""
    r = int(radius)
    if not 1 <= r <= 7:
        raise ValueError(f"radius out of range: {radius}")
    area = (2 * r + 1) ** 2
    thr = int(flat_threshold)
    return f"""
        WITH bc_px AS (
            SELECT m.id AS media_id, y.y, x.x,
                   CAST((x.x*3 + y.y*7 + 0  + m.id*13) % 256
                      + (x.x*3 + y.y*7 + 11 + m.id*13) % 256
                      + (x.x*3 + y.y*7 + 22 + m.id*13) % 256
                      AS BIGINT) AS g
            FROM (SELECT UNNEST(range(0, {int(n)})) AS id) m,
                 range(0, {int(h)}) y(y), range(0, {int(w)}) x(x)
        ),
        bc_off AS (
            SELECT dy.dy, dx.dx
            FROM range(-{r}, {r + 1}) dy(dy),
                 range(-{r}, {r + 1}) dx(dx)
        ),
        bc_box AS (
            SELECT p.media_id, p.y, p.x,
                   ABS({area} * p.g - SUM(q.g)) AS contrast
            FROM bc_px p
            JOIN bc_off o ON TRUE
            JOIN bc_px q ON q.media_id = p.media_id
                        AND q.y = p.y + o.dy AND q.x = p.x + o.dx
            WHERE p.y BETWEEN {r} AND {int(h)} - {r + 1}
              AND p.x BETWEEN {r} AND {int(w)} - {r + 1}
            GROUP BY 1, 2, 3, p.g
        )
        SELECT media_id,
               CAST(COUNT(*) AS BIGINT) AS n_interior,
               CAST(SUM(contrast) AS BIGINT) AS contrast_sum,
               CAST(MAX(contrast) AS BIGINT) AS contrast_max,
               CAST(SUM(CASE WHEN contrast <= {thr * area}
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_flat
        FROM bc_box GROUP BY 1
    """


# ---------------------------------------------------------------------------
# luma-histogram earth-mover similarity: perceptual near-duplicate
# pairs by exact 1-D EMD over quantized histograms, with a provably
# complete mean-bucket band join (never all-pairs on the engine side).
# ---------------------------------------------------------------------------

IMAGE_HIST_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("bin", LongType()),
        StructField("cnt", LongType()),
    ]
)


def image_luma_hist(media: DataFrame, n_bins: int = 16) -> DataFrame:
    """Per-image luma histogram: gray = r+g+b ∈ [0, 765] (the dHash /
    equalize luma convention), bin = gray·n_bins DIV 766.  One
    vectorized bincount per image inside Arrow batches; output is
    metadata-scale (≤ n_bins rows per image), present bins only.
    Returns (media_id, bin, cnt)."""
    if not 2 <= int(n_bins) <= 766:
        raise ValueError(f"n_bins out of range: {n_bins}")
    nb = int(n_bins)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, bins, cnts = [], [], []
            for mid, payload, w, h in zip(
                pdf["media_id"], pdf["payload"],
                pdf["meta_width"], pdf["meta_height"],
            ):
                img = _decode_rgb(payload, int(w), int(h)).astype(
                    np.int64
                )
                gray = img.sum(axis=2).ravel()
                counts = np.bincount(gray * nb // 766, minlength=nb)
                present = np.nonzero(counts)[0]
                ids.extend([int(mid)] * len(present))
                bins.extend(int(b) for b in present)
                cnts.extend(int(counts[b]) for b in present)
            yield pd.DataFrame(
                {"media_id": ids, "bin": bins, "cnt": cnts}
            )

    return (
        media.where(F.col("media_type") == "image")
        .repartition("media_id")
        .mapInPandas(run, schema=IMAGE_HIST_SCHEMA)
    )


def hist_emd_pairs(
    media: DataFrame,
    n_bins: int = 16,
    max_emd_ppm: int = 250_000,
) -> DataFrame:
    """Perceptual near-duplicate image pairs by exact 1-D earth-mover
    distance over ppm-quantized luma histograms:

        emd_ppm(a, b) = Σ_{k<B−1} |P_a(k) − P_b(k)|,
        P_x(k) = Σ_{j≤k} h_x(j),  h_x(j) = cnt_j·10⁶ DIV N_x

    — the classic transport cost of the 1-D histogram metric (move
    one ppm of mass one bin = one unit), exact integers end-to-end
    (the ppm floor-quantized histograms ARE the declared inputs, so
    both engines see identical masses; unequal floor remainders
    < B ppm ride inside the stated metric).

    Scale path — never an all-pairs join: with m_x = Σ_{k<B−1} P_x(k),
    |m_a − m_b| = |Σ(P_a−P_b)| ≤ Σ|P_a−P_b| = emd, so any pair at
    emd ≤ T has |Δm| ≤ T and lands in the same or adjacent
    width-T m-bucket; each image fans to exactly 2 probe buckets and
    candidates come from one equi-join (the followed_by bucket-fan
    discipline).  The DuckDB twin verifies over UNFILTERED all-pairs
    — a superset execution, so the hash match proves the band join
    dropped nothing.  A bucket packed with near-identical images
    goes quadratic because the RESULT is quadratic there (every such
    pair qualifies) — output-bound, not a blowup.

    Returns (media_a, media_b, emd_ppm) with media_a < media_b and
    emd_ppm ≤ max_emd_ppm."""
    T = int(max_emd_ppm)
    if not 1 <= T <= 32_000_000:
        raise ValueError(f"max_emd_ppm out of range: {T}")
    nb = int(n_bins)
    hist = image_luma_hist(media, n_bins=nb)
    tot = hist.groupBy("media_id").agg(F.sum("cnt").alias("_n"))
    spark = media.sparkSession
    grid = tot.crossJoin(
        F.broadcast(spark.range(0, nb).select(F.col("id").alias("bin")))
    )
    dens = grid.join(hist, ["media_id", "bin"], "left").select(
        "media_id", "bin",
        F.expr(
            "CAST(COALESCE(cnt, 0) * 1000000 DIV _n AS BIGINT)"
        ).alias("h_ppm"),
    )
    pre = dens.select(
        "media_id", "bin",
        F.sum("h_ppm").over(
            W.partitionBy("media_id").orderBy("bin")
        ).alias("p"),
    ).where(F.col("bin") < nb - 1)
    mm = pre.groupBy("media_id").agg(F.sum("p").alias("_m"))
    fan = mm.select(
        F.col("media_id").alias("id_a"), F.col("_m").alias("m_a"),
        F.explode(
            F.array(F.expr(f"_m DIV {T}"), F.expr(f"_m DIV {T} + 1"))
        ).alias("_bkt"),
    )
    cand = (
        fan.join(
            mm.select(
                F.col("media_id").alias("id_b"),
                F.col("_m").alias("m_b"),
                F.expr(f"_m DIV {T}").alias("_bkt"),
            ),
            "_bkt",
        )
        .where(
            (F.abs(F.col("m_a") - F.col("m_b")) <= T)
            & (
                (F.expr(f"m_a DIV {T}") < F.col("_bkt"))
                | (F.col("id_a") < F.col("id_b"))
            )
        )
        .select(
            F.least("id_a", "id_b").alias("media_a"),
            F.greatest("id_a", "id_b").alias("media_b"),
        )
    )
    pa = pre.select(F.col("media_id").alias("media_a"), "bin",
                    F.col("p").alias("_pa"))
    pb = pre.select(F.col("media_id").alias("media_b"), F.col("bin"),
                    F.col("p").alias("_pb"))
    return (
        cand.join(pa, "media_a")
        .join(pb, ["media_b", "bin"])
        .groupBy("media_a", "media_b")
        .agg(F.sum(F.abs(F.col("_pa") - F.col("_pb"))).alias("emd_ppm"))
        .where(F.col("emd_ppm") <= T)
    )


def hist_emd_sql(
    n: int, w: int, h: int, n_bins: int = 16, max_emd_ppm: int = 250_000
) -> str:
    """DuckDB twin of :func:`hist_emd_pairs` over the
    synthetic_raw_rgb_media closed form, evaluated over UNFILTERED
    all-pairs (complete by construction — the band join's
    completeness is exactly what parity proves).  Standalone,
    em_*-namespaced."""
    T, nb = int(max_emd_ppm), int(n_bins)
    if not 1 <= T <= 32_000_000:
        raise ValueError(f"max_emd_ppm out of range: {T}")
    return f"""
        WITH em_px AS (
            SELECT m.id AS media_id,
                   CAST((x.x*3 + y.y*7 + 0  + m.id*13) % 256
                      + (x.x*3 + y.y*7 + 11 + m.id*13) % 256
                      + (x.x*3 + y.y*7 + 22 + m.id*13) % 256
                      AS BIGINT) AS g
            FROM (SELECT UNNEST(range(0, {int(n)})) AS id) m,
                 range(0, {int(h)}) y(y), range(0, {int(w)}) x(x)
        ),
        em_hist AS (
            SELECT media_id, g * {nb} // 766 AS bin,
                   CAST(COUNT(*) AS BIGINT) AS cnt
            FROM em_px GROUP BY 1, 2
        ),
        em_tot AS (
            SELECT media_id, SUM(cnt) AS n FROM em_hist GROUP BY 1
        ),
        em_dens AS (
            SELECT t.media_id, b.bin,
                   CAST(COALESCE(hh.cnt, 0) * 1000000 // t.n AS BIGINT)
                       AS h_ppm
            FROM em_tot t
            CROSS JOIN (SELECT UNNEST(range(0, {nb})) AS bin) b
            LEFT JOIN em_hist hh
              ON hh.media_id = t.media_id AND hh.bin = b.bin
        ),
        em_pre AS (
            SELECT media_id, bin,
                   SUM(h_ppm) OVER (PARTITION BY media_id
                                    ORDER BY bin) AS p
            FROM em_dens
            QUALIFY bin < {nb} - 1
        )
        SELECT a.media_id AS media_a, b.media_id AS media_b,
               CAST(SUM(ABS(a.p - b.p)) AS BIGINT) AS emd_ppm
        FROM em_pre a
        JOIN em_pre b ON b.bin = a.bin AND a.media_id < b.media_id
        GROUP BY 1, 2
        HAVING SUM(ABS(a.p - b.p)) <= {T}
    """


def mask_components(
    runs: DataFrame,
    width: int,
    height: int,
    max_iters: int = 24,
) -> DataFrame:
    """Connected-component labeling (4-connectivity) of binary masks
    from their RLE runs — the blob extractor that turns a
    segmentation mask into countable objects with areas and bboxes,
    computed WITHOUT ever re-materializing pixels.

    Pipeline: flat scanline runs (the :func:`mask_rle_encode` output
    — a run may wrap across row boundaries) split into per-ROW
    segments by one bounded explode(sequence) over the covered rows;
    4-adjacency = segments in consecutive rows whose column intervals
    intersect (a (mask, row+1) equi-join with the interval residual —
    never a pixel join); components via the shared
    :func:`graph.min_label_components` min-label + pointer-jumping
    kit (O(log diameter) rounds — a serpentine one-component mask
    converges in ~log₂(w·h) rounds, not w·h).  Segment node ids are
    the segment-start flat offsets, globalized as
    mask_id·(width·height) + offset, so one graph pass serves the
    whole corpus and the final label DECODES back to a deterministic
    per-mask component id (the component's smallest flat offset).

    Output: (mask_id, comp_px, area_px, n_segs, x_min, x_max, y_min,
    y_max) — one row per component, comp_px = the component's
    top-left-most segment start offset."""
    from .graph import min_label_components

    plane = width * height
    segs = (
        runs.select(
            "mask_id",
            F.expr("start_px DIV {w}".format(w=width)).alias("y0"),
            F.expr(
                "(start_px + run_len - 1) DIV {w}".format(w=width)
            ).alias("y1"),
            "start_px", "run_len",
        )
        .select(
            "mask_id", "start_px", "run_len",
            F.explode(F.expr("sequence(y0, y1)")).alias("y"),
        )
        .select(
            "mask_id", "y",
            F.greatest(
                F.expr(f"start_px - y * {width}"), F.lit(0)
            ).alias("xs"),
            F.least(
                F.expr(f"start_px + run_len - 1 - y * {width}"),
                F.lit(width - 1),
            ).alias("xe"),
        )
        .withColumn(
            "gid",
            F.expr(f"mask_id * {plane} + y * {width} + xs")
            .cast("bigint"),
        )
    )
    a = segs.select(
        F.col("mask_id").alias("m"), F.col("y").alias("ya"),
        F.col("xs").alias("xsa"), F.col("xe").alias("xea"),
        F.col("gid").alias("id_a"),
    )
    b = segs.select(
        F.col("mask_id").alias("mb"), F.col("y").alias("yb"),
        F.col("xs").alias("xsb"), F.col("xe").alias("xeb"),
        F.col("gid").alias("id_b"),
    )
    edges = a.join(
        b,
        (F.col("m") == F.col("mb"))
        & (F.col("ya") + 1 == F.col("yb"))
        & (F.col("xsa") <= F.col("xeb"))
        & (F.col("xsb") <= F.col("xea")),
    ).select("id_a", "id_b")
    labels = min_label_components(
        segs.select(F.col("gid").alias("id")),
        edges,
        max_iters=max_iters,
        op_name="mask_components",
    )
    return (
        segs.join(labels, segs.gid == labels.id)
        .groupBy("mask_id", "label")
        .agg(
            F.sum(F.col("xe") - F.col("xs") + 1).cast("bigint")
            .alias("area_px"),
            F.count(F.lit(1)).cast("bigint").alias("n_segs"),
            F.min("xs").cast("bigint").alias("x_min"),
            F.max("xe").cast("bigint").alias("x_max"),
            F.min("y").cast("bigint").alias("y_min"),
            F.max("y").cast("bigint").alias("y_max"),
        )
        .select(
            "mask_id",
            (F.col("label") % plane).cast("bigint").alias("comp_px"),
            "area_px", "n_segs", "x_min", "x_max", "y_min", "y_max",
        )
    )


def mask_components_sql(fgpx_src: str, width: int) -> str:
    """DuckDB twin of :func:`mask_components` from a foreground pixel
    set (mask_id, px) — per-row gaps-and-islands segments, then a
    recursive one-hop min-label closure over the interval adjacency
    (the :func:`graph.components_sql` family: a DIFFERENT algorithm
    from the operator's pointer doubling, so the doubling shortcut is
    what gets verified).  Standalone."""
    return f"""
        WITH RECURSIVE mc_px AS (
            SELECT mask_id, px // {width} AS y, px % {width} AS x
            FROM {fgpx_src}
        ),
        mc_seg AS (
            SELECT mask_id, y, MIN(x) AS xs, MAX(x) AS xe,
                   mask_id * 1000000 + y * {width} + MIN(x) AS gid
            FROM (
                SELECT mask_id, y, x,
                       x - ROW_NUMBER() OVER (PARTITION BY mask_id, y
                                              ORDER BY x) AS isl
                FROM mc_px
            ) GROUP BY mask_id, y, isl
        ),
        mc_eg AS (
            SELECT a.gid AS src, b.gid AS dst
            FROM mc_seg a JOIN mc_seg b
              ON a.mask_id = b.mask_id AND a.y + 1 = b.y
             AND a.xs <= b.xe AND b.xs <= a.xe
        ),
        mc_sym AS (
            SELECT src, dst FROM mc_eg
            UNION
            SELECT dst AS src, src AS dst FROM mc_eg
        ),
        mc_reach(gid, lbl) AS (
            SELECT gid, gid AS lbl FROM mc_seg
            UNION
            SELECT e.dst AS gid, r.lbl
            FROM mc_reach r JOIN mc_sym e ON e.src = r.gid
            WHERE r.lbl < e.dst
        ),
        mc_lbl AS (
            SELECT gid, MIN(lbl) AS label FROM mc_reach GROUP BY gid
        )
        SELECT s.mask_id,
               CAST(MIN(l.label % 1000000) AS BIGINT) AS comp_px,
               CAST(SUM(s.xe - s.xs + 1) AS BIGINT) AS area_px,
               CAST(COUNT(*) AS BIGINT) AS n_segs,
               CAST(MIN(s.xs) AS BIGINT) AS x_min,
               CAST(MAX(s.xe) AS BIGINT) AS x_max,
               CAST(MIN(s.y) AS BIGINT) AS y_min,
               CAST(MAX(s.y) AS BIGINT) AS y_max
        FROM mc_seg s JOIN mc_lbl l USING (gid)
        GROUP BY s.mask_id, l.label
    """


HAAR_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("band", IntegerType()),
        StructField("n_coeffs", LongType()),
        StructField("sum_sq", LongType()),
    ]
)


def audio_haar_energy(
    media: DataFrame, frame_samples: int = 256, levels: int = 3
) -> DataFrame:
    """Per-frame Haar wavelet band energies over PCM16 payloads — the
    float-free spectral profile: an FFT's irrational twiddle factors
    can never hash-match across engines, but the UNNORMALIZED Haar
    transform is pure integer adds/subtracts, so band energies are
    exact int64 and still separate frequency regimes (band 1 = the
    finest details ≈ high frequency, higher bands ≈ progressively
    lower frequency, band 0 = the residual approximation / DC trend).
    The (energy, zcr, haar-band) triple is the voice-activity /
    content-type feature row of the audio curation pipeline.

    Definition (unnormalized): level-k detail coefficient j over a
    frame is  Σ_{i∈[j·2ᵏ,(j+1)·2ᵏ)} x_i · (+1 if i mod 2ᵏ < 2ᵏ⁻¹
    else −1)  — equivalently the recursive pairwise a/d ladder, but
    this CLOSED FORM is what the oracle replays as grouped sums (a
    structurally different execution, no recursion).  Band k emits
    (n_coeffs, Σ coeff²); band 0 is the level-``levels``
    approximation (plain 2^levels-block sums).

    Exactness bounds: |coeff| ≤ 2^levels · max|x| ≤ 2³·32767 ≈ 2.6e5;
    Σ over frame_samples coeffs² ≤ 2⁴⁴ — int64 with 2¹⁹ headroom.

    Convention: only FULL frames decompose (a Haar ladder needs the
    power-of-two length; the tail partial frame is DROPPED for this
    operator — stated loudly, unlike audio_frame_energy which keeps
    it, because a zero-padded tail would fabricate a phantom
    high-energy edge at the pad boundary).  ``frame_samples`` must be
    a power of two with at least ``levels`` halvings.

    Python only decodes and runs the vectorized reshape ladder;
    per-coefficient values never leave the executor.  Returns
    (media_id, frame_idx, band, n_coeffs, sum_sq)."""
    fs, lv = int(frame_samples), int(levels)
    if fs < 2 or (fs & (fs - 1)) != 0:
        raise ValueError(
            f"audio_haar_energy: frame_samples must be a power of "
            f"two ≥ 2: {fs}"
        )
    if not 1 <= lv or (1 << lv) > fs:
        raise ValueError(
            f"audio_haar_energy: need 1 ≤ levels and 2^levels ≤ "
            f"frame_samples: levels={lv}, frame_samples={fs}"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                x = np.frombuffer(payload or b"", dtype="<i2").astype(
                    np.int64
                )
                nf = x.size // fs
                if nf == 0:
                    continue
                a = x[: nf * fs].reshape(nf, fs)
                for band in range(1, lv + 1):
                    pairs = a.reshape(nf, -1, 2)
                    d = pairs[:, :, 0] - pairs[:, :, 1]
                    a = pairs[:, :, 0] + pairs[:, :, 1]
                    for f in range(nf):
                        recs.append(
                            (int(mid), f, band, d.shape[1],
                             int((d[f] * d[f]).sum()))
                        )
                for f in range(nf):
                    recs.append(
                        (int(mid), f, 0, a.shape[1],
                         int((a[f] * a[f]).sum()))
                    )
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id", "frame_idx", "band", "n_coeffs",
                    "sum_sq",
                ],
            )

    return (
        media.where(F.col("media_type") == "audio")
        .repartition("media_id")
        .mapInPandas(run, schema=HAAR_SCHEMA)
    )


def audio_haar_sql(
    n: int, n_samples: int = 2048, burst: int = 256,
    frame_samples: int = 256, levels: int = 3,
) -> str:
    """DuckDB twin of :func:`audio_haar_energy` over the
    synthetic_gated_pcm_media closed form — every sample regenerated,
    every band computed from the CLOSED-FORM sign pattern
    (grouped ±1 sums, no recursion: a different execution shape of
    the same arithmetic, so the reshape ladder itself is what's
    verified).  Standalone statement."""
    fs, lv = int(frame_samples), int(levels)
    nf = int(n_samples) // fs
    samples = f"""(
        SELECT m.id AS media_id, i.i,
               CAST(CASE WHEN ((i.i // {int(burst)}) + m.id) % 3 = 1
                    THEN (i.i * 3) % 21 - 10
                    ELSE (i.i * 7 + m.id * 13) % 2001 - 1000
               END AS BIGINT) AS x
        FROM (SELECT UNNEST(range(0, {int(n)})) AS id) m,
             range(0, {nf * fs}) i(i)
    )"""
    branches = []
    for band in range(1, lv + 1):
        blk = 1 << band
        half = blk >> 1
        branches.append(f"""
            SELECT media_id,
                   CAST(frame_idx AS INTEGER) AS frame_idx,
                   CAST({band} AS INTEGER) AS band,
                   CAST(COUNT(*) AS BIGINT) AS n_coeffs,
                   CAST(SUM(c * c) AS BIGINT) AS sum_sq
            FROM (
                SELECT media_id, i // {fs} AS frame_idx,
                       (i % {fs}) // {blk} AS j,
                       SUM(x * (CASE WHEN (i % {blk}) < {half}
                                THEN 1 ELSE -1 END)) AS c
                FROM {samples} GROUP BY 1, 2, 3
            ) GROUP BY 1, 2
        """)
    blk = 1 << lv
    branches.append(f"""
        SELECT media_id,
               CAST(frame_idx AS INTEGER) AS frame_idx,
               CAST(0 AS INTEGER) AS band,
               CAST(COUNT(*) AS BIGINT) AS n_coeffs,
               CAST(SUM(c * c) AS BIGINT) AS sum_sq
        FROM (
            SELECT media_id, i // {fs} AS frame_idx,
                   (i % {fs}) // {blk} AS j,
                   SUM(x) AS c
            FROM {samples} GROUP BY 1, 2, 3
        ) GROUP BY 1, 2
    """)
    return " UNION ALL ".join(branches)


# SSIM stability constants in the channel-sum luma domain (L = 765):
# C1 = round((0.01·L)²), C2 = round((0.03·L)²) — the irrational-free
# declared-integer-constant discipline (Benford/NDCG tables): both
# engines consume these exact integers, nothing is re-derived.
SSIM_C1_Q = 59
SSIM_C2_Q = 527

SSIM_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("pair_idx", IntegerType()),
        StructField("yb", IntegerType()),
        StructField("xb", IntegerType()),
        StructField("ssim_ppm", LongType()),
    ]
)


def video_block_ssim(media: DataFrame, block: int = 4) -> DataFrame:
    """Exact per-block SSIM between CONSECUTIVE frames of rawvideo
    payloads — the perceptual-similarity score as one cleared
    integer rational.  Float SSIM is engine-divergent (means,
    variances and the final ratio all accumulate differently); with
    per-block sums S₁,S₂,Q₁,Q₂,P (Σa, Σb, Σa², Σb², Σab over the
    n-pixel block in channel-sum luma) the standard formula clears by
    n⁴ into

        NUM = (2·S₁·S₂ + C1·n²) · (2·(n·P − S₁·S₂) + C2·n²)
        DEN = (S₁² + S₂² + C1·n²)
            · ((n·Q₁ − S₁²) + (n·Q₂ − S₂²) + C2·n²)

    and ssim_ppm = NUM·10⁶ / DEN under the house sign-decomposed
    truncating division (NUM < 0 — anti-correlated blocks — is real;
    DEN > 0 always since C1,C2 > 0).  A static block scores exactly
    10⁶ by algebra, not by epsilon.  The big products run in
    arbitrary-precision Python ints executor-side (block rows are
    |pairs|·|blocks|, tiny) and HUGEINT in the twin, so nothing
    wraps at any pixel depth.

    Frame count derives from payload length (len DIV w·h·3); ``w``
    and ``h`` must be multiples of ``block`` — enforced loudly.

    The curation read: per-pair MIN/mean over blocks is the shot-cut
    / duplicate-frame signal (video_shots' dHash sees structure;
    SSIM grades degradation) — kept long-form per block so the twin
    hash-verifies every ratio.

    Returns (media_id, pair_idx, yb, xb, ssim_ppm); pair_idx f
    compares frames f and f+1."""
    blk = int(block)
    if blk < 2:
        raise ValueError(f"video_block_ssim: block must be ≥ 2: {blk}")
    c1, c2 = SSIM_C1_Q, SSIM_C2_Q

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload, w, h in zip(
                pdf["media_id"], pdf["payload"],
                pdf["meta_width"], pdf["meta_height"],
            ):
                w, h = int(w), int(h)
                if not payload:
                    continue
                if w % blk or h % blk:
                    raise ValueError(
                        f"video_block_ssim: frame {w}×{h} not a "
                        f"multiple of block={blk} (media_id={mid})"
                    )
                nf = len(payload) // (w * h * 3)
                if nf < 2:
                    continue
                g = (
                    np.frombuffer(payload, dtype=np.uint8, count=nf * w * h * 3)
                    .reshape(nf, h, w, 3)
                    .sum(axis=3, dtype=np.int64)
                )
                hb, wb = h // blk, w // blk
                tiles = g.reshape(nf, hb, blk, wb, blk)
                s = tiles.sum(axis=(2, 4))
                q = (tiles * tiles).sum(axis=(2, 4))
                p = (tiles[:-1] * tiles[1:]).sum(axis=(2, 4))
                n = blk * blk
                for f in range(nf - 1):
                    for yb in range(hb):
                        for xb in range(wb):
                            s1 = int(s[f, yb, xb])
                            s2 = int(s[f + 1, yb, xb])
                            q1 = int(q[f, yb, xb])
                            q2 = int(q[f + 1, yb, xb])
                            pp = int(p[f, yb, xb])
                            num = (2 * s1 * s2 + c1 * n * n) * (
                                2 * (n * pp - s1 * s2) + c2 * n * n
                            )
                            den = (s1 * s1 + s2 * s2 + c1 * n * n) * (
                                (n * q1 - s1 * s1)
                                + (n * q2 - s2 * s2) + c2 * n * n
                            )
                            scaled = num * 1_000_000
                            ppm = (
                                -((-scaled) // den) if scaled < 0
                                else scaled // den
                            )
                            recs.append((int(mid), f, yb, xb, ppm))
            yield pd.DataFrame(
                recs,
                columns=["media_id", "pair_idx", "yb", "xb",
                         "ssim_ppm"],
            )

    return (
        media.where(F.col("media_type") == "video")
        .repartition("media_id")
        .mapInPandas(run, schema=SSIM_SCHEMA)
    )


def video_block_ssim_sql(
    n: int, w: int = 16, h: int = 12, n_frames: int = 24,
    scene_len: int = 8, block: int = 4,
) -> str:
    """DuckDB twin of :func:`video_block_ssim` over the
    synthetic_cut_video_media closed form — every pixel regenerated,
    the cross term P from a pixel-level consecutive-frame self-join,
    the cleared rational in HUGEINT with the same sign-decomposed
    division.  Standalone statement."""
    blk = int(block)
    c1, c2 = SSIM_C1_Q, SSIM_C2_Q
    nn = blk * blk
    pix = f"""(
        SELECT cl.media_id, CAST(f.f AS INTEGER) AS frame_idx,
               y.y // {blk} AS yb, x.x // {blk} AS xb, y.y, x.x,
               CAST(CASE WHEN y.y = 0 THEN
                     (x.x*3 + 0  + cl.media_id*13 + f.f*29) % 256
                   + (x.x*3 + 11 + cl.media_id*13 + f.f*29) % 256
                   + (x.x*3 + 22 + cl.media_id*13 + f.f*29) % 256
               ELSE
                     (x.x*3 + y.y*7 + 0  + cl.media_id*13
                      + (f.f//{int(scene_len)})*41*x.x) % 256
                   + (x.x*3 + y.y*7 + 11 + cl.media_id*13
                      + (f.f//{int(scene_len)})*41*x.x) % 256
                   + (x.x*3 + y.y*7 + 22 + cl.media_id*13
                      + (f.f//{int(scene_len)})*41*x.x) % 256
               END AS BIGINT) AS g
        FROM (SELECT UNNEST(range(0, {int(n)})) AS media_id) cl,
             range(0, {int(n_frames)}) f(f),
             range(0, {int(w)}) x(x), range(0, {int(h)}) y(y)
    )"""
    return f"""
        WITH bs_px AS MATERIALIZED {pix},
        bs_s AS MATERIALIZED (
            SELECT media_id, frame_idx, yb, xb,
                   CAST(SUM(g) AS HUGEINT) AS s,
                   CAST(SUM(g * g) AS HUGEINT) AS q
            FROM bs_px GROUP BY 1, 2, 3, 4
        ),
        bs_p AS (
            SELECT a.media_id, a.frame_idx AS pair_idx, a.yb, a.xb,
                   CAST(SUM(a.g * b.g) AS HUGEINT) AS p
            FROM bs_px a
            JOIN bs_px b ON b.media_id = a.media_id
                        AND b.frame_idx = a.frame_idx + 1
                        AND b.y = a.y AND b.x = a.x
            GROUP BY 1, 2, 3, 4
        ),
        bs_terms AS (
            SELECT p.media_id, p.pair_idx, p.yb, p.xb,
                   (2 * s1.s * s2.s + {c1} * {nn * nn})
                   * (2 * ({nn} * p.p - s1.s * s2.s)
                      + {c2} * {nn * nn}) AS num,
                   (s1.s * s1.s + s2.s * s2.s + {c1} * {nn * nn})
                   * (({nn} * s1.q - s1.s * s1.s)
                      + ({nn} * s2.q - s2.s * s2.s)
                      + {c2} * {nn * nn}) AS den
            FROM bs_p p
            JOIN bs_s s1 ON s1.media_id = p.media_id
                        AND s1.frame_idx = p.pair_idx
                        AND s1.yb = p.yb AND s1.xb = p.xb
            JOIN bs_s s2 ON s2.media_id = p.media_id
                        AND s2.frame_idx = p.pair_idx + 1
                        AND s2.yb = p.yb AND s2.xb = p.xb
        )
        SELECT media_id, pair_idx,
               CAST(yb AS INTEGER) AS yb, CAST(xb AS INTEGER) AS xb,
               CAST(CASE WHEN num < 0
                    THEN -(((-num) * 1000000) // den)
                    ELSE (num * 1000000) // den
               END AS BIGINT) AS ssim_ppm
        FROM bs_terms
    """


# 8×8 DCT-II basis, frozen ONCE as integers (round(α(u)·cos((2x+1)uπ/16)
# ·2¹⁴) — the NDCG/Benford declared-constant discipline: the irrational
# cosines never re-derive; both engines consume these exact integers)
PHASH_DCT_SCALE = 1 << 14
PHASH_DCT_M = tuple(
    tuple(
        round(
            (1.0 / (8 ** 0.5) if u == 0 else 0.5)
            * _math.cos((2 * x + 1) * u * _math.pi / 16)
            * PHASH_DCT_SCALE
        )
        for x in range(8)
    )
    for u in range(8)
)

PHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("phash", LongType()),
        StructField("median_coef", LongType()),
    ]
)


def image_phash(media: DataFrame) -> DataFrame:
    """Perceptual DCT hash (pHash) per raw-RGB image, exact integer
    end-to-end — the frequency-domain member of the near-dup family
    beside :func:`image_dhash` (dHash sees local gradient flips and
    is cheap; pHash projects the image onto the 8×8 low-frequency
    DCT subspace and survives blur/noise/gamma edits that scramble
    neighboring block means).

    Exactness chain: channel-sum luma → 8×8 grid of BLOCK SUMS
    (w, h must be multiples of 8 — enforced loudly: equal block
    pixel counts are what let the mean denominators cancel, so sums
    replace means with zero division), then S = M·B·Mᵀ with the
    FROZEN integer DCT matrix ``PHASH_DCT_M`` (round(basis·2¹⁴) —
    declared constants, never re-derived), then one bit per AC
    coefficient: 1 iff it strictly exceeds the lower nearest-rank
    MEDIAN of the 63 AC coefficients.  63 bits — int64-positive, the
    simhash63 sizing.  Bounds: |S| ≤ 64·2²⁸·8·765·64 < 2⁵³.

    Python only decodes and runs two 8×8 integer matmuls per image;
    the oracle replays every pixel and the same matmul through a
    VALUES join of the identical 64 constants, with the median as a
    rank window — a different execution shape of the same integers.

    Returns (media_id, phash, median_coef)."""
    m = np.asarray(PHASH_DCT_M, dtype=np.int64)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload, w, h in zip(
                pdf["media_id"], pdf["payload"],
                pdf["meta_width"], pdf["meta_height"],
            ):
                w, h = int(w), int(h)
                if not payload:
                    continue
                if w % 8 or h % 8:
                    raise ValueError(
                        f"image_phash: image {w}×{h} not a multiple "
                        f"of 8 (media_id={mid}); pad or crop upstream"
                    )
                img = np.frombuffer(
                    payload, dtype=np.uint8
                ).reshape(h, w, 3)
                gray = img.sum(axis=2, dtype=np.int64)
                bw, bh = w // 8, h // 8
                blocks = gray.reshape(8, bh, 8, bw).sum(axis=(1, 3))
                coef = m @ blocks @ m.T
                ac = np.delete(coef.reshape(-1), 0)
                med = int(np.sort(ac)[(len(ac) - 1) // 2])
                hv = 0
                for i, v in enumerate(ac):
                    if int(v) > med:
                        hv |= 1 << i
                recs.append((int(mid), hv, med))
            yield pd.DataFrame(
                recs, columns=["media_id", "phash", "median_coef"]
            )

    return (
        media.where(F.col("media_type") == "image")
        .repartition("media_id")
        .mapInPandas(run, schema=PHASH_SCHEMA)
    )


def image_phash_sql(n: int, w: int = 48, h: int = 32) -> str:
    """DuckDB twin of :func:`image_phash` over the
    synthetic_raw_rgb_media closed form (pixel (x,y,c) =
    (3x+7y+11c+13·id) mod 256): regenerates every pixel, applies the
    SAME frozen DCT integers via a VALUES join (two grouped matmul
    passes), takes the rank-window median, and assembles the 63 bits
    with shifts.  Standalone statement."""
    if w % 8 or h % 8:
        raise ValueError("twin requires 8-aligned dimensions")
    mvals = ", ".join(
        f"({u}, {x}, {PHASH_DCT_M[u][x]})"
        for u in range(8) for x in range(8)
    )
    return f"""
        WITH ph_px AS MATERIALIZED (
            SELECT m.id AS media_id,
                   (y.y * 8) // {h} AS by, (x.x * 8) // {w} AS bx,
                   CAST((x.x*3 + y.y*7 + 0  + m.id*13) % 256
                      + (x.x*3 + y.y*7 + 11 + m.id*13) % 256
                      + (x.x*3 + y.y*7 + 22 + m.id*13) % 256
                      AS BIGINT) AS g
            FROM (SELECT UNNEST(range(0, {int(n)})) AS id) m,
                 range(0, {w}) x(x), range(0, {h}) y(y)
        ),
        ph_blk AS (
            SELECT media_id, by, bx, SUM(g) AS b
            FROM ph_px GROUP BY 1, 2, 3
        ),
        ph_m(u, x, c) AS (VALUES {mvals}),
        ph_rows AS (
            -- left multiply: R[u][bx] = Σ_by M[u][by]·B[by][bx]
            SELECT blk.media_id, mm.u, blk.bx,
                   SUM(mm.c * blk.b) AS r
            FROM ph_blk blk JOIN ph_m mm ON mm.x = blk.by
            GROUP BY 1, 2, 3
        ),
        ph_coef AS (
            -- right multiply: S[u][v] = Σ_bx R[u][bx]·M[v][bx]
            SELECT rr.media_id, rr.u, mm.u AS v,
                   SUM(rr.r * mm.c) AS s
            FROM ph_rows rr JOIN ph_m mm ON mm.x = rr.bx
            GROUP BY 1, 2, 3
        ),
        ph_ac AS (
            SELECT media_id, u * 8 + v - 1 AS bit_idx, s,
                   ROW_NUMBER() OVER (PARTITION BY media_id
                                      ORDER BY s) AS rk
            FROM ph_coef WHERE NOT (u = 0 AND v = 0)
        ),
        ph_med AS (
            SELECT media_id, s AS med FROM ph_ac WHERE rk = 32
        )
        SELECT a.media_id,
               CAST(SUM(CASE WHEN a.s > d.med
                    THEN CAST(1 AS BIGINT) << a.bit_idx
                    ELSE 0 END) AS BIGINT) AS phash,
               CAST(MAX(d.med) AS BIGINT) AS median_coef
        FROM ph_ac a JOIN ph_med d USING (media_id)
        GROUP BY 1
    """


def audio_onsets(
    media: DataFrame,
    frame_samples: int = 256,
    levels: int = 3,
    thr_num: int = 3,
    thr_den: int = 2,
) -> DataFrame:
    """Spectral-flux onset detection over the Haar band energies —
    WHERE does the audio change?  The event segmenter of the audio
    curation pipeline (beat/speech-burst boundaries for clip
    sampling), composed on top of :func:`audio_haar_energy` so the
    spectral layer is the already-verified float-free one:

        flux(t) = Σ_{detail bands} max(0, E_b(t) − E_b(t−1))
        onset(t) ⟺ flux(t) > 0  ∧
                    flux(t)·(n_flux)·thr_den > thr_num·Σflux

    — positive band-energy increases only (energy RELEASES don't
    fire, the standard half-wave rectification), thresholded
    against thr_num/thr_den × the clip's own mean flux with the
    comparison CROSS-MULTIPLIED (no division anywhere; the
    tile_hotspots discipline).  Band 0 (the DC/trend residual) is
    EXCLUDED — a loudness drift is not an onset, stated.

    Bounds: flux ≤ levels·2⁴⁴ (the haar energy bound), ×n_frames
    ×thr_den stays far inside int64.  Plan: the haar rollup's
    shuffle, one (media, band)-keyed lag window, one frame rollup,
    one per-media total broadcast back — all keyed, no Python
    beyond the verified decode ladder.

    Returns one row per ONSET: (media_id, frame_idx, flux)."""
    if thr_num < 0 or thr_den < 1:
        raise ValueError(
            f"need thr_num >= 0, thr_den >= 1: {thr_num}/{thr_den}"
        )
    bands = audio_haar_energy(
        media, frame_samples=frame_samples, levels=levels
    ).where(F.col("band") >= 1)
    bw = W.partitionBy("media_id", "band").orderBy("frame_idx")
    flux = (
        bands.withColumn(
            "_d", F.col("sum_sq") - F.lag("sum_sq").over(bw)
        )
        .where(F.col("_d").isNotNull())
        .groupBy("media_id", "frame_idx")
        .agg(
            F.sum(F.greatest(F.col("_d"), F.lit(0)))
            .cast("bigint").alias("flux")
        )
    )
    tot = flux.groupBy("media_id").agg(
        F.sum("flux").alias("_total"),
        F.count(F.lit(1)).alias("_nfl"),
    )
    return (
        flux.join(tot, "media_id")
        .where(
            (F.col("flux") > 0)
            & (
                F.col("flux") * F.col("_nfl") * F.lit(int(thr_den))
                > F.lit(int(thr_num)) * F.col("_total")
            )
        )
        .select("media_id", "frame_idx", "flux")
    )


def audio_onsets_sql(
    n: int, n_samples: int = 2048, burst: int = 256,
    frame_samples: int = 256, levels: int = 3,
    thr_num: int = 3, thr_den: int = 2,
) -> str:
    """DuckDB twin of :func:`audio_onsets` over the
    synthetic_gated_pcm_media closed form — the haar twin's grouped
    ±1 sums feed the identical rectified-flux + cross-multiplied
    threshold.  Standalone."""
    inner = audio_haar_sql(
        n, n_samples=n_samples, burst=burst,
        frame_samples=frame_samples, levels=levels,
    )
    return f"""
        WITH ao_bands AS MATERIALIZED (
            SELECT * FROM ({inner}) WHERE band >= 1
        ),
        ao_flux AS MATERIALIZED (
            SELECT media_id, frame_idx,
                   CAST(SUM(GREATEST(_d, 0)) AS BIGINT) AS flux
            FROM (
                SELECT media_id, band, frame_idx,
                       sum_sq - LAG(sum_sq) OVER (
                           PARTITION BY media_id, band
                           ORDER BY frame_idx) AS _d
                FROM ao_bands
            ) WHERE _d IS NOT NULL
            GROUP BY 1, 2
        ),
        ao_tot AS (
            SELECT media_id, SUM(flux) AS _total,
                   COUNT(*) AS _nfl
            FROM ao_flux GROUP BY 1
        )
        SELECT f.media_id, f.frame_idx, f.flux
        FROM ao_flux f JOIN ao_tot t USING (media_id)
        WHERE f.flux > 0
          AND f.flux * t._nfl * {int(thr_den)}
              > {int(thr_num)} * t._total
    """


MOMENTS_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("m00", LongType()),
        StructField("cx_micro", LongType()),
        StructField("cy_micro", LongType()),
        StructField("mu20_c", LongType()),
        StructField("mu11_c", LongType()),
        StructField("mu02_c", LongType()),
        StructField("ecc_ppm", LongType()),
        StructField("theta2_sector", StringType()),
    ]
)


def image_moments(media: DataFrame) -> DataFrame:
    """Exact image moments per image — centroid, the M00²-cleared
    central second moments, principal-axis anisotropy and an exact
    orientation sector: the shape summary a vision-curation pipeline
    keys blur/crop/duplicate heuristics on (the pixel-domain sibling
    of dispersion_ellipse's point-set centrographics, same algebra).

    On the dHash luma convention (I = r+g+b ∈ [0, 765]):
    raw moments M00/M10/M01/M20/M11/M02 are exact integer sums;
    centroid = (M10·10⁶ DIV M00, M01·10⁶ DIV M00) micro-pixels;
    the central moments enter CLEARED by M00² (so no division
    happens before them):

        mu20_c = M00·M20 − M10²   (= M00²·μ20, ≥ 0)
        mu11_c = M00·M11 − M10·M01
        mu02_c = M00·M02 − M01²

    anisotropy = (λmax−λmin)²/(λmax+λmin)² of the covariance
    eigenvalues is EXACTLY rational — ((mu20_c−mu02_c)² +
    4·mu11_c²)·10⁶ DIV (mu20_c+mu02_c)² — no sqrt (the
    dispersion_ellipse move), NULL when the mass sits on one pixel;
    orientation is the D8-style sector of the (mu20_c−mu02_c,
    2·mu11_c) vector in 2θ space (strict dominant-axis win, exact
    tie → diagonal, both zero → 'iso'; θ = sector angle / 2, so 'E'
    = horizontal axis, 'W' = vertical, 'N' = the y=x diagonal) —
    pure integer comparisons, no atan2.

    Bounds, enforced LOUDLY: ``w·h·max(w,h) ≤ 100_000`` keeps
    mu ≤ ~7·10¹⁵ (int64 outputs) and the anisotropy clear ≤ ~10³⁷
    (HUGEINT twin) — tile bigger images first (image_patches).
    All-zero images emit no row (every moment degenerate; stated).

    Arrow-batched over the raw-RGB path; the DuckDB twin
    (:func:`image_moments_sql`) regenerates every pixel from the
    synthetic closed form and aggregates the same sums in HUGEINT —
    decode, clearing, and sector rule all hash-verify."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for mid, payload, w, h in zip(
                pdf["media_id"], pdf["payload"],
                pdf["meta_width"], pdf["meta_height"],
            ):
                w, h = int(w), int(h)
                if w * h * max(w, h) > 100_000:
                    raise ValueError(
                        "image_moments: w*h*max(w,h) > 100000 "
                        f"({w}x{h}); tile large images first "
                        "(image_patches)"
                    )
                img = _decode_rgb(payload, w, h).astype(np.int64)
                gray = img.sum(axis=2)
                xs = np.arange(w, dtype=np.int64)
                ys = np.arange(h, dtype=np.int64)
                m00 = int(gray.sum())
                if m00 == 0:
                    continue
                colm = gray.sum(axis=0)   # per-x mass
                rowm = gray.sum(axis=1)   # per-y mass
                m10 = int((colm * xs).sum())
                m01 = int((rowm * ys).sum())
                m20 = int((colm * xs * xs).sum())
                m02 = int((rowm * ys * ys).sum())
                m11 = int((gray * ys[:, None] * xs[None, :]).sum())
                mu20 = m00 * m20 - m10 * m10
                mu11 = m00 * m11 - m10 * m01
                mu02 = m00 * m02 - m01 * m01
                a, b = 2 * mu11, mu20 - mu02
                tr = mu20 + mu02
                ecc = (
                    ((b * b + a * a) * 10**6) // (tr * tr)
                    if tr > 0 else None
                )
                if a == 0 and b == 0:
                    sect = "iso"
                elif abs(b) > abs(a):
                    sect = "E" if b > 0 else "W"
                elif abs(a) > abs(b):
                    sect = "N" if a > 0 else "S"
                else:
                    sect = ("N" if a > 0 else "S") + \
                        ("E" if b > 0 else "W")
                recs.append((
                    int(mid), m00,
                    (m10 * 10**6) // m00, (m01 * 10**6) // m00,
                    mu20, mu11, mu02, ecc, sect,
                ))
            yield pd.DataFrame(
                recs,
                columns=[
                    "media_id", "m00", "cx_micro", "cy_micro",
                    "mu20_c", "mu11_c", "mu02_c", "ecc_ppm",
                    "theta2_sector",
                ],
            )

    return (
        media.where(F.col("media_type") == "image")
        .repartition("media_id")
        .mapInPandas(run, schema=MOMENTS_SCHEMA)
    )


def image_moments_sql(n: int, w: int, h: int) -> str:
    """DuckDB twin of :func:`image_moments` over the
    synthetic_raw_rgb_media closed form — pixels regenerated, the
    same integer sums in HUGEINT, identical clearing / anisotropy /
    sector rules.  Standalone."""
    return f"""
        WITH im_px AS (
            SELECT m.id AS media_id, x.x AS x, y.y AS y,
                   CAST((x.x*3 + y.y*7 + 0  + m.id*13) % 256
                      + (x.x*3 + y.y*7 + 11 + m.id*13) % 256
                      + (x.x*3 + y.y*7 + 22 + m.id*13) % 256
                      AS HUGEINT) AS g
            FROM (SELECT UNNEST(range(0, {int(n)})) AS id) m,
                 range(0, {int(h)}) y(y), range(0, {int(w)}) x(x)
        ),
        im_m AS (
            SELECT media_id,
                   SUM(g) AS m00,
                   SUM(x * g) AS m10, SUM(y * g) AS m01,
                   SUM(x * x * g) AS m20, SUM(y * y * g) AS m02,
                   SUM(x * y * g) AS m11
            FROM im_px GROUP BY 1 HAVING SUM(g) > 0
        ),
        im_c AS (
            SELECT media_id, m00, m10, m01,
                   m00 * m20 - m10 * m10 AS mu20,
                   m00 * m11 - m10 * m01 AS mu11,
                   m00 * m02 - m01 * m01 AS mu02
            FROM im_m
        )
        SELECT media_id,
               CAST(m00 AS BIGINT) AS m00,
               CAST((m10 * 1000000) // m00 AS BIGINT) AS cx_micro,
               CAST((m01 * 1000000) // m00 AS BIGINT) AS cy_micro,
               CAST(mu20 AS BIGINT) AS mu20_c,
               CAST(mu11 AS BIGINT) AS mu11_c,
               CAST(mu02 AS BIGINT) AS mu02_c,
               CAST(CASE WHEN mu20 + mu02 > 0 THEN
                   (((mu20 - mu02) * (mu20 - mu02)
                     + 4 * mu11 * mu11) * 1000000)
                   // ((mu20 + mu02) * (mu20 + mu02))
               END AS BIGINT) AS ecc_ppm,
               CASE
                   WHEN 2 * mu11 = 0 AND mu20 - mu02 = 0 THEN 'iso'
                   WHEN abs(mu20 - mu02) > abs(2 * mu11) THEN
                       CASE WHEN mu20 - mu02 > 0 THEN 'E' ELSE 'W' END
                   WHEN abs(2 * mu11) > abs(mu20 - mu02) THEN
                       CASE WHEN mu11 > 0 THEN 'N' ELSE 'S' END
                   ELSE (CASE WHEN mu11 > 0 THEN 'N' ELSE 'S' END)
                        || (CASE WHEN mu20 - mu02 > 0
                            THEN 'E' ELSE 'W' END)
               END AS theta2_sector
        FROM im_c
    """


def audio_tempo(
    media: DataFrame,
    frame_samples: int = 256,
    levels: int = 3,
    lag_min: int = 2,
    lag_max: int = 8,
    flux_shift: int = 20,
) -> DataFrame:
    """Tempo induction per clip — the periodicity readout that
    completes the audio ladder (energy → bands → onsets → WHAT
    period do the onsets repeat at?): the autocorrelation argmax of
    the spectral-flux envelope over a declared lag band,

        R(k) = Σ_t fq(t)·fq(t+k),   fq = flux DIV 2^flux_shift
        period = argmax over k ∈ [lag_min, lag_max] by (R desc, k)

    — the classic onset-envelope tempo estimator (Scheirer-style),
    float-free: flux is the verified Haar-band rectified flux
    (:func:`audio_onsets`' envelope), the DECLARED quantization
    shift keeps every product-sum in int64 (flux ≤ levels·2⁴⁴ ⇒
    fq ≤ ~2²⁶ at the default shift; R ≤ n_frames·2⁵² is stated per
    output), and the argmax tie rule (largest R, then SMALLEST lag)
    picks the fundamental period over its multiples when aligned
    pair counts tie down the harmonics.  Clips whose band has no
    positive R emit NO row (silence / aperiodic — stated, the
    honest branch).

    Plan: the haar rollup's shuffle, one lag window, one ×|lags|
    literal fan + one (media, frame+k) equi-join, one argmax —
    no Python beyond the verified decode ladder.

    Returns (media_id, period_frames, r_q, n_pairs)."""
    if not 1 <= int(lag_min) < int(lag_max) <= 64:
        raise ValueError(
            f"need 1 <= lag_min < lag_max <= 64: {lag_min}, {lag_max}"
        )
    if not 0 <= int(flux_shift) <= 40:
        raise ValueError(f"flux_shift in [0, 40]: {flux_shift}")
    bands = audio_haar_energy(
        media, frame_samples=frame_samples, levels=levels
    ).where(F.col("band") >= 1)
    bw = W.partitionBy("media_id", "band").orderBy("frame_idx")
    flux = (
        bands.withColumn(
            "_d", F.col("sum_sq") - F.lag("sum_sq").over(bw)
        )
        .where(F.col("_d").isNotNull())
        .groupBy("media_id", "frame_idx")
        .agg(
            F.expr(
                f"CAST(SUM(GREATEST(_d, 0)) DIV {2 ** int(flux_shift)}"
                " AS BIGINT)"
            ).alias("_fq")
        )
    )
    a = flux.select(
        "media_id", F.col("frame_idx").alias("_t"),
        F.col("_fq").alias("_fa"),
        F.explode(
            F.sequence(F.lit(int(lag_min)), F.lit(int(lag_max)))
        ).alias("_k"),
    )
    b = flux.select(
        F.col("media_id").alias("_mb"),
        F.col("frame_idx").alias("_tb"),
        F.col("_fq").alias("_fb"),
    )
    r = (
        a.join(
            b,
            (a.media_id == b._mb) & (b._tb == a._t + a._k),
        )
        .groupBy("media_id", "_k")
        .agg(
            F.sum(F.col("_fa") * F.col("_fb")).cast("bigint")
            .alias("r_q"),
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        )
        .where(F.col("r_q") > 0)
    )
    w = W.partitionBy("media_id").orderBy(F.desc("r_q"), F.col("_k"))
    return (
        r.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") == 1)
        .select(
            "media_id",
            F.col("_k").cast("int").alias("period_frames"),
            "r_q", "n_pairs",
        )
    )


def audio_tempo_sql(
    n: int,
    n_samples: int = 2048,
    burst: int = 256,
    frame_samples: int = 256,
    levels: int = 3,
    lag_min: int = 2,
    lag_max: int = 8,
    flux_shift: int = 20,
) -> str:
    """DuckDB twin of :func:`audio_tempo` over the
    synthetic_gated_pcm_media closed form — the haar twin's grouped
    ±1 sums feed the identical flux quantization, lag self-join and
    (R desc, k) argmax.  Standalone."""
    inner = audio_haar_sql(
        n, n_samples=n_samples, burst=burst,
        frame_samples=frame_samples, levels=levels,
    )
    return f"""
        WITH at_bands AS MATERIALIZED (
            SELECT * FROM ({inner}) WHERE band >= 1
        ),
        at_flux AS MATERIALIZED (
            SELECT media_id, frame_idx,
                   CAST(SUM(GREATEST(_d, 0))
                        // {2 ** int(flux_shift)} AS BIGINT) AS fq
            FROM (
                SELECT media_id, band, frame_idx,
                       sum_sq - LAG(sum_sq) OVER (
                           PARTITION BY media_id, band
                           ORDER BY frame_idx) AS _d
                FROM at_bands
            ) WHERE _d IS NOT NULL
            GROUP BY 1, 2
        ),
        at_r AS (
            SELECT a.media_id, l.k,
                   CAST(SUM(a.fq * b.fq) AS BIGINT) AS r_q,
                   CAST(COUNT(*) AS BIGINT) AS n_pairs
            FROM at_flux a
            CROSS JOIN (SELECT UNNEST(range({int(lag_min)},
                        {int(lag_max)} + 1)) AS k) l
            JOIN at_flux b ON b.media_id = a.media_id
                          AND b.frame_idx = a.frame_idx + l.k
            GROUP BY 1, 2
            HAVING SUM(a.fq * b.fq) > 0
        )
        SELECT media_id, CAST(k AS INTEGER) AS period_frames,
               r_q, n_pairs
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY media_id
                       ORDER BY r_q DESC, k) AS _rk
            FROM at_r
        ) WHERE _rk = 1
    """

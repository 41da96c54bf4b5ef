"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The reference has no multimodal surface (it is a scalar-function
extension); this tier is the large-scale training-pipeline requirement
from the build brief. Design:

* image/audio/video payloads ride in an opaque ``BinaryType`` column
  next to a typed metadata struct (:func:`content_meta`) — schema-first
  so Catalyst prunes/pushes around the blob and only the stages that
  truly need bytes ever deserialize them;
* content-level exact dedup (:func:`content_dedup_groups`) is a
  JVM-native ``sha2``-groupBy — never ships bytes to Python;
* decode / feature-extract / resize / frame-sample run as Arrow-batched
  ``mapInPandas`` stages with an *injectable decoder*. The container
  has no image/audio codecs, so the default decoder raises
  ``NotImplementedError`` (clearly marked stub) and tests/benchmarks
  inject :func:`fake_decode_image` — a deterministic pseudo-decoder —
  so the Spark-side plumbing (schema, partitioning, UDF signature,
  batch shape) is real and tested end to end.

At 100 TB the blob column dominates I/O: every helper here keeps the
bytes inside one ``mapInPandas`` pass (no shuffle of payloads), and
dedup/metadata operations touch only hashes and struct fields.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lindel_spark.util import ensure_parallelism

# ---------------------------------------------------------------------------
# metadata
# ---------------------------------------------------------------------------

def content_meta(content: Column, mime: str) -> Column:
    """Typed metadata struct for an opaque binary payload.

    Computed JVM-side (octet_length / sha2 are codegen built-ins): the
    blob never crosses into Python to be catalogued.
    """
    return F.struct(
        F.octet_length(content).cast("long").alias("n_bytes"),
        F.lit(mime).alias("mime"),
        F.sha2(content, 256).alias("sha256"),
    )


def attach_content_meta(df: DataFrame, content_col: str = "content",
                        mime: str = "application/octet-stream") -> DataFrame:
    """Add a ``meta`` struct column describing ``content_col``."""
    return df.withColumn("meta", content_meta(F.col(content_col), mime))


def content_dedup_groups(df: DataFrame, content_col: str = "content",
                         id_col: str = "doc_id") -> DataFrame:
    """Exact byte-level dedup groups: (sha256, keep_id, n_dups).

    Pure hash-groupBy — map-side partial aggregation, shuffles one
    64-char digest + two longs per distinct payload, regardless of
    payload size. Composes with :func:`lindel_spark.dedup` for
    text-level near-dup on the decoded form.
    """
    return df.groupBy(F.sha2(F.col(content_col), 256).alias("sha256")).agg(
        F.min(id_col).cast("long").alias("keep_id"),
        F.count(F.lit(1)).cast("long").alias("n_dups"),
    )


# ---------------------------------------------------------------------------
# decoders (stub boundary — no codecs in this container)
# ---------------------------------------------------------------------------

def _pil_decode_image(data: bytes) -> np.ndarray:
    """Pillow-backed decoder: bytes -> (H, W, 3) uint8 RGB."""
    import io

    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))


def _find_codec() -> Callable[[bytes], np.ndarray] | None:
    """Best real decoder importable here, else None (stub regime)."""
    try:
        import PIL.Image  # noqa: F401
        return _pil_decode_image
    except ImportError:
        return None


_REAL_DECODER = _find_codec()


def decode_image(data: bytes) -> np.ndarray:
    """Decode image bytes -> (H, W, 3) uint8 RGB array.

    Auto-detects a real codec at import: when Pillow is installed this
    decodes for real; otherwise it is a **clearly-marked stub** (no
    image codec ships in this container) and raises — inject a decoder
    into the pipeline helpers instead (tests use
    :func:`fake_decode_image`, which keeps the whole Spark-side data
    path real and oracle-checkable).
    """
    if _REAL_DECODER is not None:
        return _REAL_DECODER(data)
    raise NotImplementedError(
        "LINDEL: no image codec in this environment — pass "
        "decoder=<your fn(bytes)->ndarray> (e.g. PIL.Image.open); "
        "tests inject fake_decode_image"
    )


def fake_decode_image(data: bytes, size: int = 8) -> np.ndarray:
    """Deterministic pseudo-decoder: bytes -> (size, size, 3) uint8.

    Pixels derive from the payload's sha256 stream, so every stage
    downstream of "decode" (resize, features, hashing) exercises real
    data flow with reproducible values.

    The stream chains over *hex digests* (``sha256(data).hexdigest()``,
    then repeatedly ``sha256(prev_hex)``): every link is ASCII, so an
    independent SQL engine whose ``sha256`` takes VARCHAR (DuckDB) can
    replay the exact pixel bytes — this is what makes the
    ``multimodal_image_features`` query value-level oracle-checkable.
    """
    need = size * size * 3
    out = bytearray()
    h = hashlib.sha256(data).hexdigest()
    while len(out) < need:
        out.extend(bytes.fromhex(h))
        h = hashlib.sha256(h.encode("ascii")).hexdigest()
    return np.frombuffer(bytes(out[:need]), np.uint8).reshape(size, size, 3)


# ---------------------------------------------------------------------------
# decode / feature-extract / resize (mapInPandas stages)
# ---------------------------------------------------------------------------

IMAGE_FEATURES_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("mean_r", T.DoubleType()),
    T.StructField("mean_g", T.DoubleType()),
    T.StructField("mean_b", T.DoubleType()),
    T.StructField("brightness", T.DoubleType()),
])


def image_features(df: DataFrame, content_col: str = "content",
                   id_col: str = "doc_id",
                   decoder: Callable[[bytes], np.ndarray] = decode_image,
                   ) -> DataFrame:
    """Decode each payload and emit per-image summary features.

    One ``mapInPandas`` pass: bytes are decoded and reduced to a few
    doubles inside the same Arrow batch — the (large) pixel arrays
    never leave the Python worker, so nothing wide is shuffled.
    """
    src = ensure_parallelism(df).select(
        F.col(id_col).cast("long").alias("id"),
        F.col(content_col).alias("data"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf["id"], pdf["data"]):
                img = decoder(bytes(b))
                means = img.reshape(-1, img.shape[2]).mean(axis=0)
                rows.append((int(i), img.shape[0], img.shape[1],
                             float(means[0]), float(means[1]),
                             float(means[2]), float(means.mean())))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              IMAGE_FEATURES_SCHEMA.fields])

    return src.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def resize_images(df: DataFrame, height: int, width: int,
                  content_col: str = "content", id_col: str = "doc_id",
                  decoder: Callable[[bytes], np.ndarray] = decode_image,
                  ) -> DataFrame:
    """Decode + nearest-neighbor resize -> (id, height, width, pixels).

    ``pixels`` is the flat HWC uint8 buffer as binary — a real pipeline
    would re-encode; the plumbing (schema + batch shape) is identical.
    """
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("pixels", T.BinaryType()),
    ])
    src = ensure_parallelism(df).select(
        F.col(id_col).cast("long").alias("id"),
        F.col(content_col).alias("data"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, b in zip(pdf["id"], pdf["data"]):
                img = decoder(bytes(b))
                ys = (np.arange(height) * img.shape[0] // height)
                xs = (np.arange(width) * img.shape[1] // width)
                small = img[ys][:, xs]
                rows.append((int(i), height, width,
                             small.tobytes()))
            yield pd.DataFrame(rows, columns=["id", "height", "width",
                                              "pixels"])

    return src.mapInPandas(run, schema)


def sample_frames(df: DataFrame, frame_bytes: int, every_n: int = 10,
                  content_col: str = "content", id_col: str = "doc_id",
                  ) -> DataFrame:
    """Treat each payload as fixed-size frames; keep every ``every_n``-th.

    Deterministic byte-slicing stand-in for video frame sampling (no
    video codec in the container): emits (id, frame_no, frame binary).
    The explode happens inside ``mapInPandas`` so only sampled frames
    materialize.
    """
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ])
    src = ensure_parallelism(df).select(
        F.col(id_col).cast("long").alias("id"),
        F.col(content_col).alias("data"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for i, b in zip(pdf["id"], pdf["data"]):
                raw = bytes(b)
                n_frames = len(raw) // frame_bytes
                for f in range(0, n_frames, every_n):
                    ids.append(int(i))
                    nos.append(f)
                    frames.append(raw[f * frame_bytes:(f + 1) * frame_bytes])
            yield pd.DataFrame({"id": ids, "frame_no": nos, "frame": frames})

    return src.mapInPandas(run, schema)


def audio_features(
    df: DataFrame,
    frame_samples: int = 64,
    content_col: str = "content",
    id_col: str = "id",
) -> DataFrame:
    """Per-frame audio features over opaque PCM payloads: interpret
    each binary as signed 16-bit little-endian samples, window into
    ``frame_samples``-sample frames (trailing partial frame dropped),
    and emit ``(id, frame_no, rms, peak, zero_crossings)``.

    Unlike the image decoder this needs NO codec — it is real,
    deterministic byte math (the s16le layout every WAV body uses), so
    the whole path is value-level verifiable. Runs as an Arrow-batched
    ``mapInPandas`` with vectorized NumPy framing; payload bytes never
    shuffle — only the per-frame feature rows leave the stage. A
    zero crossing is counted where consecutive samples have strictly
    opposite signs (``x[i]·x[i+1] < 0``), so silence does not count.
    """
    if frame_samples < 2:
        raise ValueError("frame_samples must be >= 2")
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.LongType()),
        T.StructField("zero_crossings", T.LongType()),
    ])
    src = ensure_parallelism(df).select(
        F.col(id_col).cast("long").alias("id"),
        F.col(content_col).alias("data"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, rms, peak, zc = [], [], [], [], []
            for i, b in zip(pdf["id"], pdf["data"]):
                raw = bytes(b)
                n = (len(raw) // 2) // frame_samples
                if n == 0:
                    continue
                x = np.frombuffer(
                    raw[: n * frame_samples * 2], dtype="<i2"
                ).astype(np.float64).reshape(n, frame_samples)
                ids.extend([int(i)] * n)
                nos.extend(range(n))
                rms.extend(np.sqrt((x * x).mean(axis=1)))
                peak.extend(np.abs(x).max(axis=1).astype(np.int64))
                zc.extend((x[:, :-1] * x[:, 1:] < 0).sum(axis=1)
                          .astype(np.int64))
            yield pd.DataFrame({
                "id": ids, "frame_no": nos, "rms": rms, "peak": peak,
                "zero_crossings": zc})

    return src.mapInPandas(run, schema)


AHASH_SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("ahash", T.LongType()),
])


def ahash_images(df: DataFrame, content_col: str = "content",
                 id_col: str = "doc_id",
                 decoder: Callable[[bytes], np.ndarray] = decode_image,
                 ) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprints: decode →
    grayscale (mean of RGB per pixel) → 64 bits, bit ``p`` set when
    ``round(gray_p − mean_gray, 9) > 0`` — the standard
    near-duplicate image fingerprint (robust to re-encodes and small
    edits under a real decoder; under :func:`fake_decode_image` the
    whole path — and the hash VALUES — replay in SQL from the sha
    pixel chain). Bit 63 is the sign bit of the LongType carrier
    (explicit two's-complement pack, identical in any engine).

    ``mapInPandas`` stage like :func:`image_features` (injectable
    decoder, Arrow batches); pair it with
    :func:`lindel_spark.dedup.hamming_banded_pairs` for exact
    banded near-dup search — see :func:`image_near_dup_pairs`.

    The bit test rounds ``gray − mean`` at 9dp before comparing:
    gray and mean are rationals over denominator 192, so a REAL tie
    (64·s_p = Σs — common enough to matter) lands within float noise
    of zero where engines' different summation orders would disagree
    on a strict ``>``; after rounding, ties are exactly 0 in every
    engine and the smallest genuine gap (≥ ~1/192²) is untouched.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, hashes = [], []
            for i, data in zip(b[id_col], b[content_col]):
                if data is None:
                    continue  # NULL payload: no fingerprint row
                img = decoder(bytes(data))
                gm = img.reshape(img.shape[0], img.shape[1], -1) \
                    .mean(axis=2)
                # block-mean downsample to 8x8 (crop any remainder) —
                # an 8x8 input (the fake decoder) passes through
                # pixel-for-pixel, a real decode gets the actual
                # aHash reduction instead of its first scanline
                hh = (gm.shape[0] // 8) * 8
                ww = (gm.shape[1] // 8) * 8
                if hh == 0 or ww == 0:
                    continue  # degenerate decode: nothing to hash
                gray = (gm[:hh, :ww]
                        .reshape(8, hh // 8, 8, ww // 8)
                        .mean(axis=(1, 3))
                        .reshape(-1))
                m = gray.mean()
                h = np.uint64(0)
                for p, g in enumerate(gray):
                    if round(g - m, 9) > 0:
                        h |= np.uint64(1) << np.uint64(p)
                ids.append(int(i))
                hashes.append(int(h.astype(np.int64)))
            yield pd.DataFrame({"id": ids, "ahash": hashes})

    return df.select(id_col, content_col).mapInPandas(
        run, AHASH_SCHEMA)


def image_near_dup_pairs(df: DataFrame, content_col: str = "content",
                         id_col: str = "doc_id",
                         decoder: Callable[[bytes], np.ndarray]
                         = decode_image,
                         bands: int = 8,
                         max_hamming: int = 4) -> DataFrame:
    """Near-duplicate image pairs: aHash fingerprints +
    :func:`lindel_spark.dedup.hamming_banded_pairs` — exact within
    the hamming budget by pigeonhole, band-keyed shuffles, never
    all-pairs; the image leg of the dedup ladder (byte-level
    :func:`content_dedup_groups` catches identical FILES, this
    catches identical-looking PICTURES)."""
    from lindel_spark.dedup import hamming_banded_pairs

    sig = ahash_images(df, content_col, id_col, decoder)
    return hamming_banded_pairs(sig, "id", "ahash", bits=64,
                                bands=bands, max_hamming=max_hamming)

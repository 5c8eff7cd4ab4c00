"""Multimodal column plumbing: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so the decode kernel is a
STUB — but everything Spark-side is real and tested: binary columns,
metadata extraction as native expressions, and an Arrow-batched
``mapInPandas`` decode operator with a production schema. The stub's
deterministic fake (md5-derived dimensions) lets even the UDF path be
oracle-checked value-for-value.

At scale: payloads stay columnar in Parquet; decode runs
per-partition via Arrow batches (no per-row pickling); metadata-only
queries never touch the bytes thanks to column pruning.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.catalog import register
from ..sources.tables import table

DECODE_SCHEMA = "doc_id bigint, n_bytes bigint, width bigint, height bigint, format string"


def fake_dims_from_md5(hex_digest: str) -> tuple[int, int]:
    """Deterministic fake decode: dimensions from the first two md5
    hex digits (documented stand-in for a real codec)."""
    v1 = int(hex_digest[0], 16)
    v2 = int(hex_digest[1], 16)
    return 16 * (v1 + 1), 16 * (v2 + 1)


def decode_image_batch(payloads: pd.Series, real_codec: bool = False) -> pd.DataFrame:
    """Decode kernel. ``real_codec=True`` is the production path
    (PIL/libvips — not in this container)."""
    if real_codec:
        raise NotImplementedError("image codec not available in this environment")
    digests = payloads.map(lambda b: hashlib.md5(b).hexdigest())
    dims = digests.map(fake_dims_from_md5)
    return pd.DataFrame(
        {
            "n_bytes": payloads.map(len),
            "width": dims.map(lambda t: t[0]),
            "height": dims.map(lambda t: t[1]),
            "format": "fake/raw",
        }
    )


def decode_images(df: DataFrame, binary_col: str, id_col: str) -> DataFrame:
    """mapInPandas decode operator: Arrow batches in, typed metadata
    out. The real-codec swap is one flag; the plan shape (partition-
    parallel, batch-vectorized, prune-friendly) is production-ready."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = decode_image_batch(pdf[binary_col])
            meta.insert(0, "doc_id", pdf[id_col].astype("int64"))
            yield meta

    return df.mapInPandas(_run, DECODE_SCHEMA)


@register(
    "mm_binary_metadata",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           sha256(text)                                     AS payload_sha256,
           substring(md5(text), 1, 8)                       AS payload_md5_prefix
    FROM documents
    """,
)
def mm_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata natively: byte length + content digests
    computed JVM-side. Text is encoded to a binary payload (the
    synthetic tables carry no real media); with a true binary column
    the plan is identical."""
    d = table(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        F.length(payload).cast("bigint").alias("n_bytes"),
        F.sha2(payload, 256).alias("payload_sha256"),
        F.substring(F.md5("text"), 1, 8).alias("payload_md5_prefix"),
    )


RESIZE_BOX = 224  # fit-within target (the common vision-model input)


def resize_plan(decoded: DataFrame) -> DataFrame:
    """Resize planning over decoded metadata: fit each image inside
    RESIZE_BOX×RESIZE_BOX preserving aspect ratio, never upscaling.
    Pure integer arithmetic on the metadata columns (`div` — no
    float scale factor), so the plan is native, codegen'd, and
    engine-exact; the byte-level resample kernel would consume these
    target boxes inside the same Arrow pass as the decode."""
    m = F.greatest("width", "height")
    fit = m <= RESIZE_BOX
    out_w = F.when(fit, F.col("width")).otherwise(
        F.expr(f"width * {RESIZE_BOX} div greatest(width, height)")
    )
    out_h = F.when(fit, F.col("height")).otherwise(
        F.expr(f"height * {RESIZE_BOX} div greatest(width, height)")
    )
    return decoded.select(
        "doc_id", "width", "height",
        out_w.cast("bigint").alias("out_width"),
        out_h.cast("bigint").alias("out_height"),
        (~fit).alias("downscaled"),
    )


FRAME_CHARS = 64   # bytes per frame in the real kernel; chars here
FRAME_STRIDE = 4   # sample every 4th frame
MAX_FRAMES = 8     # per-document cap


def sample_frames(df: DataFrame, payload_col: str, id_col: str) -> DataFrame:
    """Frame-sampling operator (the video path): ONE payload row →
    N sampled-frame rows, exploded INSIDE the Arrow batch — the
    production shape for ffmpeg-style keyframe extraction (batch in,
    variable rows out, no per-row pickling, cap applied at the
    source). The kernel slices fixed-size frames and fingerprints
    each; a real decoder swaps into the same loop."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            digests: list[str] = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                n_frames = len(payload) // FRAME_CHARS
                for j, i in enumerate(range(0, n_frames, FRAME_STRIDE)):
                    if j >= MAX_FRAMES:
                        break
                    frame = payload[i * FRAME_CHARS:(i + 1) * FRAME_CHARS]
                    ids.append(int(did))
                    idxs.append(i)
                    digests.append(hashlib.md5(frame.encode("utf-8")).hexdigest())
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_md5": digests})

    return df.mapInPandas(_run, "doc_id bigint, frame_idx bigint, frame_md5 string")


@register(
    "mm_video_frame_sample",
    oracle=f"""
    WITH f AS (
        SELECT doc_id, text,
               CAST(floor(length(text) / {FRAME_CHARS}) AS BIGINT) AS n_frames
        FROM documents
    ),
    idx AS (
        SELECT doc_id, text, i AS frame_idx
        FROM f, unnest(generate_series(0, CAST(least(n_frames, {MAX_FRAMES * FRAME_STRIDE}) AS BIGINT) - 1, {FRAME_STRIDE})) AS t(i)
    )
    SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
           md5(substring(text, frame_idx * {FRAME_CHARS} + 1, {FRAME_CHARS})) AS frame_md5
    FROM idx
    """,
)
def mm_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling end-to-end: every 4th fixed-size
    frame of each payload, capped at 8 per document, fingerprinted in
    the Arrow kernel. The 1→N row explosion happens inside
    mapInPandas, so a 100 TB video corpus never materializes unsampled
    frames — the cap and stride apply before anything leaves the
    executor."""
    d = table(spark, sf_dir, "documents")
    return sample_frames(d.select("doc_id", "text"), "text", "doc_id")


_SQL_DECODE = """
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           CAST(16 * (CASE substring(md5(text), 1, 1)
                WHEN '0' THEN 0 WHEN '1' THEN 1 WHEN '2' THEN 2 WHEN '3' THEN 3
                WHEN '4' THEN 4 WHEN '5' THEN 5 WHEN '6' THEN 6 WHEN '7' THEN 7
                WHEN '8' THEN 8 WHEN '9' THEN 9 WHEN 'a' THEN 10 WHEN 'b' THEN 11
                WHEN 'c' THEN 12 WHEN 'd' THEN 13 WHEN 'e' THEN 14 ELSE 15 END + 1)
               AS BIGINT) AS width,
           CAST(16 * (CASE substring(md5(text), 2, 1)
                WHEN '0' THEN 0 WHEN '1' THEN 1 WHEN '2' THEN 2 WHEN '3' THEN 3
                WHEN '4' THEN 4 WHEN '5' THEN 5 WHEN '6' THEN 6 WHEN '7' THEN 7
                WHEN '8' THEN 8 WHEN '9' THEN 9 WHEN 'a' THEN 10 WHEN 'b' THEN 11
                WHEN 'c' THEN 12 WHEN 'd' THEN 13 WHEN 'e' THEN 14 ELSE 15 END + 1)
               AS BIGINT) AS height,
           'fake/raw' AS format
    FROM documents
"""


@register("mm_image_decode_stub", oracle=_SQL_DECODE)
def mm_image_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas decode path end-to-end: binary payload →
    Arrow batch → Python kernel → typed metadata rows. The
    deterministic fake makes the whole Arrow/UDF plumbing
    value-checkable against the SQL oracle."""
    d = table(spark, sf_dir, "documents")
    with_payload = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return decode_images(with_payload, "payload", "doc_id")


@register(
    "mm_image_resize_plan",
    oracle=f"""
    WITH dec AS ({_SQL_DECODE})
    SELECT doc_id, width, height,
           CAST(CASE WHEN greatest(width, height) <= {RESIZE_BOX} THEN width
                     ELSE (width * {RESIZE_BOX}) // greatest(width, height) END AS BIGINT) AS out_width,
           CAST(CASE WHEN greatest(width, height) <= {RESIZE_BOX} THEN height
                     ELSE (height * {RESIZE_BOX}) // greatest(width, height) END AS BIGINT) AS out_height,
           greatest(width, height) > {RESIZE_BOX} AS downscaled
    FROM dec
    """,
)
def mm_image_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode → resize-plan composition: the Arrow decode emits typed
    dims, the native resize planner computes the fit-within-224
    target box per image (aspect preserved, no upscale) entirely in
    integer arithmetic. At 100 TB the resample kernel consumes these
    boxes inside the decode pass; the plan stage itself never leaves
    codegen."""
    d = table(spark, sf_dir, "documents")
    with_payload = d.select("doc_id", F.encode("text", "UTF-8").alias("payload"))
    return resize_plan(decode_images(with_payload, "payload", "doc_id"))


AUDIO_WINDOW = 64   # samples per analysis window (chars here)
MAX_WINDOWS = 4     # leading windows analyzed per payload


def audio_features(df: DataFrame, payload_col: str, id_col: str) -> DataFrame:
    """Audio feature-extraction plumbing: per payload, energy of the
    leading fixed-size sample windows (1→N rows, exploded inside the
    Arrow batch exactly like frame sampling). The fake kernel sums
    code points per window — a real one computes RMS/spectral bands
    over PCM samples in the same batch loop; windowing and caps apply
    executor-side so raw audio never ships unsampled."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            widxs: list[int] = []
            energies: list[int] = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                n_windows = min(len(payload) // AUDIO_WINDOW, MAX_WINDOWS)
                for w in range(n_windows):
                    window = payload[w * AUDIO_WINDOW:(w + 1) * AUDIO_WINDOW]
                    ids.append(int(did))
                    widxs.append(w)
                    energies.append(sum(ord(c) for c in window))
            yield pd.DataFrame(
                {"doc_id": ids, "window_idx": widxs, "energy": energies}
            )

    return df.mapInPandas(_run, "doc_id bigint, window_idx bigint, energy bigint")


@register(
    "mm_audio_window_energy",
    oracle=f"""
    WITH f AS (
        SELECT doc_id, text,
               least(CAST(floor(length(text) / {AUDIO_WINDOW}) AS BIGINT), {MAX_WINDOWS}) AS n_windows
        FROM documents
    ),
    w AS (
        SELECT doc_id, text, i AS window_idx
        FROM f, unnest(generate_series(0, n_windows - 1, 1)) AS t(i)
    )
    SELECT doc_id, CAST(window_idx AS BIGINT) AS window_idx,
           CAST(list_sum(list_transform(generate_series(1, {AUDIO_WINDOW}),
                j -> unicode(substring(text, window_idx * {AUDIO_WINDOW} + j, 1)))) AS BIGINT) AS energy
    FROM w
    """,
)
def mm_audio_window_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-style windowed feature extraction through the Arrow
    kernel: code-point energy of the first 4 complete 64-sample
    windows per payload (deterministic stand-in for RMS over PCM),
    oracle-checked value-for-value."""
    d = table(spark, sf_dir, "documents")
    return audio_features(d.select("doc_id", "text"), "text", "doc_id")

"""Multimodal columns: opaque binary payloads + typed metadata.

The reference stores attachments content-addressed with media metadata
(width/height/duration, thumbnails — internal/store/schema.sql:203-234) and
raw MIME blobs (schema.sql:273-281). For a training-data pipeline the same
shape generalizes: image/audio/video ride as ``binary`` columns with a typed
metadata struct, and decode/resize/frame-sample run as Arrow-batched
mapInPandas stages.

The decode step itself is STUBBED (image/audio libs are not in this
container): ``decode_media`` raises NotImplementedError unless
``deterministic_fake=True``, which produces schema-correct fake decodes so
the Spark-side plumbing — schemas, batching, partitioning — is real and
tested end-to-end.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video | blob
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

# magic prefixes, hex-encoded (sniffing is a JVM-side hex compare)
_MAGIC = {
    "89504E47": "image/png",
    "FFD8FF": "image/jpeg",
    "47494638": "image/gif",
    "494433": "audio/mpeg",
    "1A45DFA3": "video/webm",
}


def synthesize_media(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Deterministic fake media table from a text corpus: payload = magic
    prefix + utf-8 text bytes; kind rotates by id. Test/bench fixture only."""
    prefix = (
        F.when(F.col(id_col) % 3 == 0, F.lit(bytes.fromhex("89504E470D0A1A0A")))
        .when(F.col(id_col) % 3 == 1, F.lit(bytes.fromhex("FFD8FFE0")))
        .otherwise(F.lit(bytes.fromhex("494433040000")))
    )
    kind = (
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "image")
        .otherwise("audio")
    )
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        kind.alias("kind"),
        F.concat(prefix, F.encode(F.col(text_col), "UTF-8")).alias("payload"),
        F.struct(
            F.lit(None).cast("string").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def sniff_mime(payload_col) -> "F.Column":
    """Magic-byte MIME detection, JVM-side (hex prefix compare)."""
    hx = F.hex(F.substring(payload_col, 1, 8))
    out = F.lit("application/octet-stream")
    for magic, mime in sorted(_MAGIC.items(), key=lambda kv: -len(kv[0])):
        out = F.when(hx.startswith(magic), F.lit(mime)).otherwise(out)
    return out


def payload_stats(media: DataFrame) -> DataFrame:
    """Cheap JVM-side payload profile: length, content hash, sniffed mime.
    The hash is sha-256 over the HEX encoding of the payload — bijective, so
    still content-addressing (reference schema.sql:213-214), and computable
    identically in engines whose sha functions only take strings."""
    return media.select(
        "media_id",
        "kind",
        F.length(F.col("payload")).cast("long").alias("payload_bytes"),
        F.sha2(F.hex(F.col("payload")), 256).alias("content_hash"),
        sniff_mime(F.col("payload")).alias("mime_sniffed"),
    )


_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload_bytes", T.LongType()),
        T.StructField("byte_entropy", T.DoubleType()),
        T.StructField("ascii_ratio", T.DoubleType()),
        T.StructField("null_ratio", T.DoubleType()),
    ]
)


def extract_features(media: DataFrame, batch_size: int = 256) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas):
    byte entropy + ascii/null ratios via numpy histograms. This is the real
    shape of a decode stage — per-batch vectorized Python over binary
    columns — with a pure-numpy body so it runs anywhere."""
    import math

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = np.frombuffer(payload, dtype=np.uint8)
                n = len(b)
                if n:
                    counts = np.bincount(b, minlength=256)
                    p = counts[counts > 0] / n
                    entropy = float(-(p * np.log2(p)).sum())
                    ascii_ratio = float(((b >= 32) & (b < 127)).mean())
                    null_ratio = float((b == 0).mean())
                else:
                    entropy, ascii_ratio, null_ratio = 0.0, 0.0, 0.0
                out.append((mid, n, entropy, ascii_ratio, null_ratio))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id",
                    "payload_bytes",
                    "byte_entropy",
                    "ascii_ratio",
                    "null_ratio",
                ],
            )

    return media.select("media_id", "payload").mapInPandas(
        batches, schema=_FEATURE_SCHEMA
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("pixels_sha", T.StringType()),
    ]
)


def _pil_available() -> bool:
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def decode_media(
    media: DataFrame, *, deterministic_fake: bool = False
) -> DataFrame:
    """Decode stage. Three paths, in order:
      - ``deterministic_fake=True``: schema-correct fake decodes (dims from
        the payload's hex-sha256) so downstream stages are testable anywhere;
      - PIL importable on the workers: REAL image decode — width/height from
        ``Image.open``, pixels_sha over the decoded RGB bytes; non-image or
        undecodable payloads yield NULL dims (kept, not dropped);
      - neither: NotImplementedError naming the missing dependency.
    The mapInPandas plumbing (Arrow batches, schema, partition parallelism)
    is identical in all three — the fake is a drop-in for the real decoder."""
    if not deterministic_fake and not _pil_available():

        def no_decoder(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            raise NotImplementedError(
                "media decoding requires PIL (pillow), not present in this "
                "environment; pass deterministic_fake=True for the "
                "schema-correct fake path"
            )
            yield  # pragma: no cover

        return media.select("media_id", "payload").mapInPandas(
            no_decoder, schema=_DECODE_SCHEMA
        )

    if not deterministic_fake:

        def pil_decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            import hashlib as hl
            import io

            from PIL import Image

            for pdf in it:
                rows = []
                for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                    try:
                        img = Image.open(io.BytesIO(bytes(payload)))
                        img = img.convert("RGB")
                        w, h = img.size
                        sha = hl.sha256(img.tobytes()).hexdigest()[:16]
                        n_frames = int(getattr(img, "n_frames", 1))
                        rows.append((mid, w, h, n_frames, sha))
                    except Exception:
                        rows.append((mid, None, None, None, None))
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "media_id", "width", "height", "n_frames", "pixels_sha",
                    ],
                )

        return media.select("media_id", "payload").mapInPandas(
            pil_decode, schema=_DECODE_SCHEMA
        )

    def fake(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as hl

        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                # hash of the UPPERCASE-HEX encoding (not raw bytes):
                # bijective, so still content-derived, and computable in
                # engines whose sha functions only take strings (the
                # payload_stats convention)
                h = hl.sha256(bytes(payload).hex().upper().encode()).hexdigest()
                rows.append(
                    (
                        mid,
                        64 + int(h[:2], 16),       # fake width 64..319
                        64 + int(h[2:4], 16),      # fake height
                        1 + int(h[4], 16),         # fake frame count
                        h[:16],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "n_frames", "pixels_sha"],
            )

    return media.select("media_id", "payload").mapInPandas(
        fake, schema=_DECODE_SCHEMA
    )


def sample_frames(
    decoded: DataFrame, *, n_samples: int = 4, id_col: str = "media_id"
) -> DataFrame:
    """Frame sampling plan: uniform-stride frame indexes per media item
    from the decoded ``n_frames`` metadata — (media_id, frame_idx, frame_pos)
    rows, ≤ n_samples per item. Pure JVM (sequence + explode); the frame
    EXTRACTION at those indexes is part of the decode stub — this computes
    WHICH frames, which is the plan-side half a real decoder consumes.
    Deterministic: stride = max(1, n_frames // n_samples), from frame 0."""
    stride = F.greatest(F.lit(1), (F.col("n_frames") / n_samples).cast("int"))
    idxs = F.slice(
        F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), stride),
        1,
        n_samples,
    )
    return decoded.select(
        F.col(id_col),
        F.col("n_frames"),
        F.posexplode(idxs).alias("frame_pos", "frame_idx"),
    )


def resize_plan(
    decoded: DataFrame, *, max_side: int = 224, id_col: str = "media_id"
) -> DataFrame:
    """Resize planning: target dims preserving aspect ratio with the long
    side clamped to ``max_side`` (the preprocessing contract of most vision
    encoders). Pure arithmetic on decode metadata; the pixel work belongs
    to the stubbed decoder. Emits (media_id, width, height, target_w,
    target_h, scale_ppm) — scale as ppm so the plan is hash-comparable."""
    long_side = F.greatest("width", "height")
    scale = F.when(long_side > max_side, max_side / long_side).otherwise(F.lit(1.0))
    return decoded.select(
        F.col(id_col),
        "width",
        "height",
        F.floor(F.col("width") * scale + 0.5).cast("int").alias("target_w"),
        F.floor(F.col("height") * scale + 0.5).cast("int").alias("target_h"),
        F.floor(scale * 1_000_000).cast("long").alias("scale_ppm"),
    )

"""Multimodal column plumbing (driver north star): image/audio/video are
opaque ``binary`` columns with typed metadata; decode / feature-extraction
run as Arrow-batched Python over ``mapInPandas``.

The container has no image/audio libraries, so the decode step is STUBBED
(deterministic fake behind an import-try; real decode raises
NotImplementedError) — but the Spark-side plumbing is real and tested:
binary column handling, mapInPandas schema contract, Arrow batch shape,
partition-preserving metadata extraction.

Since the testdata has no binary table, the binary payload is derived
in-engine (utf-8 bytes of documents.text) — deterministic, so the metadata
query still gets an exact DuckDB oracle (octet_length/sha256 agree with
Python's len/hashlib over the same bytes).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load_table

META_SCHEMA = "doc_id long, n_bytes long, digest string, decode_status string"
DECODE_SCHEMA = "doc_id long, width int, height int, n_frames int, decode_status string"


def _payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text as an opaque binary payload column."""
    # NB: deliberately NOT spread(): fanning 5k small blobs across 32
    # Python workers costs more in worker startup than it buys (measured
    # 0.7s → 2.7s); at real multimodal scale the input splits already
    # provide parallelism.
    return load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "utf-8").alias("payload")
    )


def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata extraction over a binary column via mapInPandas:
    byte length + content digest per blob. Arrow moves the binary batches;
    Python touches each blob once. This is the shape of EXIF/container-header
    extraction at 100 TB: embarrassingly parallel, no shuffle."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "digest": pdf["payload"].map(lambda b: hashlib.sha256(b).hexdigest()),
                    "decode_status": "stub",
                }
            )

    return _payloads(spark, sf_dir).mapInPandas(extract, schema=META_SCHEMA)


def decode_blobs(payloads: DataFrame) -> DataFrame:
    """Decode an opaque (doc_id, payload binary) frame to typed image
    metadata via mapInPandas — the real schema/batching/per-blob-Python
    plumbing of an image decode stage.

    Per blob: if PIL is importable AND the bytes parse as an image, the
    real decode runs (status 'pil'); otherwise a deterministic fake derived
    from the blob's sha256 stands in (status 'fake'). The driver container
    has no PIL, so driver output is all-'fake'; where PIL exists the real
    path is exercised with synthetic in-test PNG bytes
    (tests/test_multimodal_decode.py).

    NB: the closure is deliberately self-contained (imports + helpers
    inside) so cloudpickle ships it by value — executors' Python workers
    need no access to this package on their sys.path.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl
        import io as _io

        try:
            from PIL import Image  # type: ignore
        except ImportError:
            Image = None

        def decode_one(blob: bytes) -> tuple[int, int, int, str]:
            if Image is not None:
                try:
                    with Image.open(_io.BytesIO(blob)) as im:
                        return im.width, im.height, getattr(im, "n_frames", 1), "pil"
                except Exception:
                    pass  # not an image (or truncated) → deterministic fake
            d = _hl.sha256(blob).digest()
            return 64 + d[0] % 192, 64 + d[1] % 192, 1 + d[2] % 30, "fake"

        for pdf in batches:
            dims = pdf["payload"].map(decode_one)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": dims.map(lambda t: t[0]).astype("int32"),
                    "height": dims.map(lambda t: t[1]).astype("int32"),
                    "n_frames": dims.map(lambda t: t[2]).astype("int32"),
                    "decode_status": dims.map(lambda t: t[3]),
                }
            )

    return payloads.mapInPandas(decode, schema=DECODE_SCHEMA)


def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-decode stage over the documents-derived binary payloads (which
    are utf-8 text, not images — so every row takes the deterministic-fake
    branch here; the PIL branch is exercised in tests with real PNG bytes)."""
    return decode_blobs(_payloads(spark, sf_dir))


def multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content-hash dedup over the binary payload column — the
    first dedup pass every image/audio corpus runs (identical bytes ⇒
    identical asset; perceptual near-dup comes after, on decoded
    features). Unlike the metadata/decode stages, this needs NO Python at
    all: sha2 over binary and the per-digest min-id window are JVM
    expressions, so the dedup of a 100 TB blob corpus is one shuffle on
    the 32-byte digest with whole-stage codegen end-to-end. Returns every
    blob with its digest, byte size, canonical (min) doc_id, and an
    is_canonical keep flag; exact DuckDB oracle (sha256 over the same
    bytes)."""
    from pyspark.sql.window import Window

    p = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.encode(F.coalesce(F.col("text"), F.lit("")), "utf-8").alias("payload"),
    )
    w = Window.partitionBy("digest")
    return (
        p.select(
            "doc_id",
            F.expr("CAST(octet_length(payload) AS BIGINT)").alias("n_bytes"),
            F.sha2("payload", 256).alias("digest"),
        )
        .withColumn("canonical_id", F.min("doc_id").over(w))
        .withColumn("is_canonical", F.col("doc_id") == F.col("canonical_id"))
    )


FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_digest string"


def multimodal_framesample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over opaque video-like blobs: the 1→N mapInPandas
    shape (each input row expands to a variable number of frame rows).
    The stub samples every ~256th byte offset as a 'frame' and digests a
    64-byte window — deterministic; a real ffmpeg-backed sampler slots in
    behind the identical schema and batch contract."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        for pdf in batches:
            out_doc, out_idx, out_dig = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = max(1, len(blob) // 256)
                for i in range(n_frames):
                    window = bytes(blob[i * 256 : i * 256 + 64])
                    out_doc.append(doc_id)
                    out_idx.append(i)
                    out_dig.append(_hl.sha256(window).hexdigest())
            yield pd.DataFrame(
                {"doc_id": out_doc, "frame_idx": out_idx, "frame_digest": out_dig}
            )

    return _payloads(spark, sf_dir).mapInPandas(sample, schema=FRAMES_SCHEMA)

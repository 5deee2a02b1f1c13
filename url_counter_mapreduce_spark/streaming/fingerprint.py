"""Streaming perceptual fingerprinting: the image dHash stage applied to
an unbounded documents stream — the ingest-time shape of multimodal
dedup (fingerprint every arriving asset immediately; the banded pair
join then runs as a periodic batch or a stream-stream self-join over the
fingerprint log).

The stage is a stateless mapInPandas projection (synthesize the
patterned PNG payload, decode pixels, hash), so it runs append-mode with
no watermark or state store at source parallelism — the same zero-
shuffle plan as the batch twin image_dhash, which shares every helper.
Exact oracle: the generator closed form (the batch query's SQL verbatim;
a bounded AvailableNow drain of a stateless map is the batch result).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..operators.multimodal import dhash_from_png, pattern_png_bytes
from .url_count import _documents_stream


def stream_image_dhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents stream → patterned-PNG payload → pixel decode → dHash
    halves, drained via Trigger.AvailableNow into a memory sink."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                dhash_from_png(pattern_png_bytes(int(i))) for i in pdf["doc_id"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": [f[0] if f else None for f in feats],
                    "height": [f[1] if f else None for f in feats],
                    "fp_hi": [f[2] if f else None for f in feats],
                    "fp_lo": [f[3] if f else None for f in feats],
                }
            )

    fps = _documents_stream(spark, sf_dir).select("doc_id").mapInPandas(
        extract, schema="doc_id long, width int, height int, fp_hi long, fp_lo long"
    )
    sink = "stream_image_dhash_sink"
    q = (
        fps.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)

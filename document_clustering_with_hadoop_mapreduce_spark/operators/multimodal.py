"""Multimodal (binary) column operators — north-star surface.

The reference is text-only; a 100 TB training-data pipeline also carries
image/audio/video as opaque ``binary`` columns with typed metadata
(BASELINE.json north star). This module provides the Spark-side plumbing:

- ``as_media``        — documents -> media table (media_id, kind, data BINARY,
                        width, height, n_bytes). Payloads here are
                        DETERMINISTIC FAKES (utf-8 text bytes) so tests and
                        the DuckDB oracle can verify the plumbing end-to-end;
                        swap the loader, keep the schema, for real corpora.
- ``media_metadata``  — per-blob metadata: size, content hash (dedup key),
                        head-slice fingerprint. Pure JVM expressions.
- ``frame_samples``   — "video frame sampling": every k-th fixed-width byte
                        slice of the payload as its own row. Pure JVM
                        (substring on binary) — the real-decoder version
                        keeps this exact shape, only the slicer changes.
- ``byte_histograms`` — Arrow-batched ``mapInPandas`` feature extractor
                        (16-bin byte histogram per blob). This is the hot
                        path a real image/audio featurizer drops into: one
                        vectorized Python stage, schema declared up front,
                        partition-parallel, no driver involvement.
- ``decode_image_meta`` — REAL decode is stubbed: the container ships no
                        imaging libs. Gated behind an import-try; raises
                        NotImplementedError with a clear message otherwise.

Scale notes: blobs never leave executors; metadata/hash/slice are
whole-stage-codegen expressions; the histogram stage is Arrow-batched with
bounded memory (one batch of blobs at a time). Partitioning: media tables
should be written bucketed/partitioned by content-hash prefix so exact-dup
blobs co-locate (see ``media_metadata``'s ``content_sha``).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HIST_BINS = 16


def as_media(documents: DataFrame) -> DataFrame:
    """Documents -> media table with deterministic fake payloads.

    kind cycles image/audio/video by doc_id; width/height are declared
    (typed metadata travels WITH the blob, the pipeline never re-decodes
    just to learn dimensions)."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.col("text").cast("binary").alias("data"),
        (64 + F.col("doc_id") % 193).cast("int").alias("width"),
        (64 + F.col("doc_id") % 97).cast("int").alias("height"),
        F.length(F.col("text").cast("binary")).alias("n_bytes"),
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """Per-blob typed metadata: size, sha-256 content hash (the exact-dedup
    / bucketing key), and a 32-byte head-slice fingerprint."""
    return media.select(
        "media_id",
        "kind",
        "width",
        "height",
        F.length("data").alias("n_bytes"),
        F.sha2("data", 256).alias("content_sha"),
        F.sha2(F.substring("data", 1, 32), 256).alias("head_sha"),
    )


def frame_samples(
    media: DataFrame, frame_bytes: int = 64, stride: int = 4, max_frames: int = 8
) -> DataFrame:
    """Every ``stride``-th fixed-width byte slice as its own row — the
    shape of video frame sampling (decoder stubbed; slicing, row explosion,
    and per-frame hashing are the real plumbing).

    Emits (media_id, frame_no, frame_sha). JVM-only: sequence + transform +
    substring(binary) — no Python in the loop."""
    return (
        media.select(
            "media_id",
            F.posexplode(
                F.sequence(
                    F.lit(0),
                    F.least(
                        F.lit(max_frames - 1),
                        F.greatest(
                            F.lit(0),
                            F.floor(
                                (F.length("data") - 1) / (frame_bytes * stride)
                            ).cast("int"),
                        ),
                    ),
                )
            ).alias("frame_no", "offset_idx"),
            "data",
        )
        .select(
            "media_id",
            "frame_no",
            F.sha2(
                F.expr(f"substring(data, frame_no * {frame_bytes * stride} + 1, {frame_bytes})"),
                256,
            ).alias("frame_sha"),
        )
    )


_HIST_SCHEMA = "media_id long, " + ", ".join(
    f"h{i} long" for i in range(N_HIST_BINS)
)


def byte_histograms(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction: 16-bin byte-value histogram per
    blob via ``mapInPandas`` — the drop-in slot for a real featurizer
    (CLIP/spectrogram/whatever), demonstrating batch shape, declared
    schema, and executor-local numpy work."""
    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": pdf["media_id"].to_numpy()}
            hists = np.zeros((len(pdf), N_HIST_BINS), dtype="int64")
            for row_i, blob in enumerate(pdf["data"]):
                if blob is None or len(blob) == 0:
                    continue
                arr = np.frombuffer(blob, dtype=np.uint8)
                hists[row_i] = np.bincount(arr >> 4, minlength=N_HIST_BINS)[
                    :N_HIST_BINS
                ]
            for b in range(N_HIST_BINS):
                out[f"h{b}"] = hists[:, b]
            yield pd.DataFrame(out)

    return media.select("media_id", "data").mapInPandas(extract, _HIST_SCHEMA)


def decode_image_meta(media: DataFrame) -> DataFrame:
    """REAL image decode (dimensions from actual bytes). The container has
    no imaging libraries, so this is an explicit stub — the pipeline
    position, input contract (binary column), and output schema are fixed;
    only the decoder body is environment-dependent."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires Pillow, which this environment does not "
            "ship; use media_metadata()/byte_histograms() for the testable "
            "plumbing, or install an imaging stack in production"
        ) from exc
    raise NotImplementedError("real decoder intentionally not implemented here")


def media_histogram_pairs(
    media: DataFrame, k: int = 20, n_blocks: int = 8
) -> DataFrame:
    """Decode-free media near-dup: globally most-similar blob pairs by
    cosine over the 16-bin byte histograms — the content-signature dedup
    you can run on 100 TB of images/audio BEFORE any decoder exists
    (re-encoded or metadata-tweaked copies keep near-identical byte
    distributions; exact copies are caught earlier and cheaper by
    ``media_exact_dedup``).

    Composition: ``byte_histograms`` (Arrow ``mapInPandas``, executor-
    local) -> histogram rows become plain ``array<double>`` vectors ->
    ``block_topk_pairs`` (exact top-k, block-pair partitioned — blobs
    never shuffle, only 16-double signatures do). Pytest-gated against
    the O(n^2) brute-force scorer plus planted-duplicate truth.
    """
    from pyspark.sql import functions as F

    from .similarity import block_topk_pairs

    hists = byte_histograms(media).select(
        F.col("media_id").alias("vec_id"),
        F.array(*[F.col(f"h{b}").cast("double") for b in range(N_HIST_BINS)]).alias(
            "embedding"
        ),
    )
    return block_topk_pairs(hists, k=k, n_blocks=n_blocks).select(
        F.col("vec_a").alias("media_a"), F.col("vec_b").alias("media_b"), "cos"
    )

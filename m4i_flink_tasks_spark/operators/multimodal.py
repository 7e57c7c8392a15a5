"""Multimodal column operators — opaque ``binary`` payloads with typed
metadata, processed by Arrow-batched ``mapInPandas`` (north-star scope;
the reference has no binary/multimodal surface, SURVEY §2.6).

Design for 100 TB: payload bytes live in one ``BinaryType`` column and
never leave the executor; metadata (modality, declared dims) is a typed
struct usable for partition pruning and filter pushdown *without*
touching bytes. Decode/feature work happens in ``mapInPandas`` so each
Arrow batch crosses the JVM→Python boundary once — never per row.

The real image/audio codecs (PIL / soundfile / av) are NOT in this
container. ``decode_stub`` is the seam where they plug in: it is
import-gated, raises ``NotImplementedError`` for real codec requests,
and otherwise computes a **deterministic byte-level fake** (length,
boundary bytes, fixed-size chunk count) so the surrounding plumbing —
schema, batching, partitioning, UDF signature — is real and testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FRAME_BYTES = 4096  # fixed video "frame" chunk size for the fake sampler

FEATURE_SCHEMA = (
    "doc_id bigint, modality string, n_bytes bigint, first_byte int, "
    "last_byte int, n_frames int"
)

_REAL_CODECS_AVAILABLE = False
try:  # pragma: no cover - not installed in this container
    import PIL.Image  # noqa: F401

    _REAL_CODECS_AVAILABLE = True
except ImportError:
    pass


def attach_binary_payload(docs: DataFrame) -> DataFrame:
    """Binary column + typed metadata from the documents table.

    ``payload`` = UTF-8 bytes of the text (the deterministic stand-in
    for real media bytes); ``media`` = the typed metadata struct a real
    ingest would carry (modality round-robins the three kinds).
    """
    modality = (
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
    )
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            modality.alias("modality"),
            F.col("n_chars").alias("declared_size"),
            F.col("source").alias("origin"),
        ).alias("media"),
    )


def decode_stub(payload: bytes, modality: str) -> dict:
    """The codec seam. Real codecs decode here when installed; the
    deterministic fake derives features from raw bytes so tests and
    oracles are hermetic."""
    if _REAL_CODECS_AVAILABLE and modality == "image":  # pragma: no cover
        raise NotImplementedError(
            "real PIL decode path: plug Image.open(BytesIO(payload)) here"
        )
    n = len(payload)
    return {
        "n_bytes": n,
        "first_byte": payload[0] if n else None,
        "last_byte": payload[-1] if n else None,
        # videos sample one "frame" per fixed-size chunk; other
        # modalities are single-frame.
        "n_frames": -(-n // FRAME_BYTES) if modality == "video" else 1,
    }


def extract_features(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    One pandas frame per Arrow batch (not per row): the 10-100×
    batching win over row-at-a-time UDFs, and the exact shape a real
    decoder drops into.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_stub(payload, media["modality"])
                for payload, media in zip(pdf["payload"], pdf["media"])
            ]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out.insert(1, "modality", [m["modality"] for m in pdf["media"]])
            yield out

    return with_payload.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_video_frames(with_payload: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame sampling plumbing: explode each video payload into frame
    records (chunk index + chunk length), keeping every Nth frame.
    Pure column expressions — the byte slicing stays JVM-side."""
    videos = with_payload.filter(F.col("media.modality") == "video")
    n_frames = F.ceil(F.length("payload") / F.lit(FRAME_BYTES)).cast("int")
    return (
        videos.select(
            "doc_id",
            F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
            F.length("payload").alias("n_bytes"),
        )
        .filter(F.col("frame_idx") % every_nth == 0)
        .select(
            "doc_id",
            "frame_idx",
            F.least(
                F.lit(FRAME_BYTES),
                F.col("n_bytes") - F.col("frame_idx") * FRAME_BYTES,
            ).alias("frame_bytes"),
        )
    )

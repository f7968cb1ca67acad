"""Multimodal column operators (E5): opaque binary payloads + typed metadata.

North-star surface (SURVEY.md §2.10 E5). The engine treats image/audio/video
payloads as ``BinaryType`` columns with typed metadata columns alongside —
the columnar-parquet-native layout: metadata predicates push down and prune
row groups without touching the (large) binary pages.

Decode/feature-extraction runs as Arrow-batched pandas transforms over
``mapInPandas`` — the one place Python is justified (codec libraries). The
image/audio codecs are NOT in this container, so the decode kernel is
STUBBED: ``mode="stub"`` derives deterministic pseudo-features from the md5
digest of the payload bytes (reproducible in any engine, so the pipeline is
oracle-checkable end-to-end); ``mode="real"`` raises ``NotImplementedError``
where PIL/ffmpeg would be called. Everything around the kernel — schema
contract, Arrow batch iteration, partition-parallelism, output fan-out — is
real and tested.

At 100 TB: binary payloads never shuffle (all transforms are scan-side
mapInPandas); ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch
memory; metadata-only queries never read the binary pages (columnar
pruning).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ralf_spark.table import FeatureTable

#: Output schema of the stub image-feature kernel.
IMAGE_FEATURES_SCHEMA = (
    "doc_id long, byte_len int, width int, height int, n_channels int,"
    " mean_intensity double"
)


def with_binary_payload(
    table: FeatureTable, source_col: str = "text", payload_col: str = "payload"
) -> FeatureTable:
    """Attach a BinaryType payload column (UTF-8 bytes of a string column —
    the fixture stand-in for real image/audio bytes)."""
    return table.with_column(payload_col, F.encode(F.col(source_col), "UTF-8"))


def binary_stats(
    df: DataFrame, payload_col: str = "payload"
) -> list[Column]:
    """Native (JVM-side) metadata over a binary column: size + digest.
    These are the columns a pipeline persists alongside the payload so later
    stages can filter/dedup without decoding."""
    return [
        F.octet_length(F.col(payload_col)).alias("byte_len"),
        F.md5(F.col(payload_col)).alias("content_md5"),
    ]


def _stub_features_from_digest(digest_hex: str) -> tuple[int, int, int, float]:
    """Deterministic fake decode: width/height/channels/intensity derived
    from the content digest. Replaced by a real codec in production."""
    width = 1 + int(digest_hex[0:4], 16) % 2048
    height = 1 + int(digest_hex[4:8], 16) % 2048
    n_channels = 1 + int(digest_hex[8:10], 16) % 4
    mean_intensity = round((int(digest_hex[10:14], 16) % 10000) / 10000.0, 4)
    return width, height, n_channels, mean_intensity


def decode_image_features(
    table: FeatureTable,
    payload_col: str = "payload",
    id_col: str | None = None,
    mode: str = "stub",
) -> FeatureTable:
    """Arrow-batched image decode + feature extraction over ``mapInPandas``.

    ``mode="real"`` is the production path (PIL/torchvision decode) — not
    available in this container, so it raises; ``mode="stub"`` computes
    md5-derived deterministic pseudo-features with the identical batch
    plumbing. Scan-side only: no shuffle, payload bytes stay in place.
    """
    if mode == "real":
        raise NotImplementedError(
            "image codecs are not available in this environment; the "
            "production kernel would decode with PIL inside the same "
            "mapInPandas iterator"
        )
    if mode != "stub":
        raise ValueError(f"unknown decode mode: {mode!r}")
    idc = id_col or table.key
    if idc is None:
        raise ValueError("decode_image_features needs an id column")

    src = table.df.select(F.col(idc).alias("doc_id"), F.col(payload_col))

    def kernel(batches: Iterator[Any]) -> Iterator[Any]:
        import pandas as pd

        for pdf in batches:
            digests = [
                hashlib.md5(bytes(b)).hexdigest() for b in pdf[payload_col]
            ]
            feats = [_stub_features_from_digest(d) for d in digests]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "byte_len": [len(bytes(b)) for b in pdf[payload_col]],
                    "width": [f[0] for f in feats],
                    "height": [f[1] for f in feats],
                    "n_channels": [f[2] for f in feats],
                    "mean_intensity": [f[3] for f in feats],
                }
            )

    out = src.mapInPandas(kernel, IMAGE_FEATURES_SCHEMA)
    return FeatureTable(out, key="doc_id")


def frame_sample(
    table: FeatureTable,
    payload_col: str = "payload",
    id_col: str | None = None,
    n_frames: int = 3,
) -> FeatureTable:
    """Video frame sampling shape: 0..n output rows per input row (UDTF-like
    fan-out through mapInPandas). Stub emits ``n_frames`` rows per payload
    with md5-derived frame digests; the real kernel would seek/decode.
    """
    idc = id_col or table.key
    if idc is None:
        raise ValueError("frame_sample needs an id column")
    src = table.df.select(F.col(idc).alias("doc_id"), F.col(payload_col))
    schema = "doc_id long, frame_idx int, frame_md5 string"

    def kernel(batches: Iterator[Any]) -> Iterator[Any]:
        import pandas as pd

        for pdf in batches:
            ids, idxs, digests = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                base = bytes(payload)
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    digests.append(
                        hashlib.md5(base + f"|frame{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_md5": digests}
            )

    return FeatureTable(src.mapInPandas(kernel, schema), key="doc_id")


#: Output schema of the stub audio-feature kernel.
AUDIO_FEATURES_SCHEMA = (
    "doc_id long, duration_s double, chunk_energy array<double>"
)


def decode_audio_features(
    table: FeatureTable,
    payload_col: str = "payload",
    id_col: str | None = None,
    mode: str = "stub",
    n_chunks: int = 4,
    sample_rate: int = 16000,
) -> FeatureTable:
    """Arrow-batched audio decode + chunked energy profile over
    ``mapInPandas`` — the audio sibling of :func:`decode_image_features`.

    ``mode="real"`` would decode PCM (ffmpeg/soundfile) and compute true
    per-chunk RMS inside the same iterator; not available in this
    container, so it raises. ``mode="stub"`` treats the payload as raw
    8-bit mono PCM at ``sample_rate`` (duration = bytes / rate) and
    derives a deterministic per-chunk pseudo-energy from each byte
    range's digest — the batch shape, chunking arithmetic, and schema are
    the real plumbing. Chunks are byte ranges: ``n_chunks - 1`` equal
    floors plus the remainder tail, so every byte lands in exactly one
    chunk."""
    if mode == "real":
        raise NotImplementedError(
            "audio codecs are not available in this environment; the "
            "production kernel would decode PCM inside the same "
            "mapInPandas iterator"
        )
    if mode != "stub":
        raise ValueError(f"unknown decode mode: {mode!r}")
    idc = id_col or table.key
    if idc is None:
        raise ValueError("decode_audio_features needs an id column")

    src = table.df.select(F.col(idc).alias("doc_id"), F.col(payload_col))

    def kernel(batches: Iterator[Any]) -> Iterator[Any]:
        import pandas as pd

        def energies(data: bytes) -> list[float]:
            n = len(data)
            base = n // n_chunks
            out = []
            for i in range(n_chunks):
                if i < n_chunks - 1:
                    chunk = data[i * base : (i + 1) * base]
                else:
                    chunk = data[(n_chunks - 1) * base :]
                h = hashlib.md5(chunk).hexdigest()
                out.append(round((int(h[:4], 16) % 10000) / 10000.0, 4))
            return out

        for pdf in batches:
            data = [bytes(b) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    # exact IEEE quotient, NOT rounded: byte counts /
                    # 16000 land exactly on half-way decimals, where
                    # Python rounds ties-to-even but SQL engines round
                    # half-away — the raw double is identical everywhere
                    "duration_s": [
                        len(d) / float(sample_rate) for d in data
                    ],
                    "chunk_energy": [energies(d) for d in data],
                }
            )

    out = src.mapInPandas(kernel, AUDIO_FEATURES_SCHEMA)
    return FeatureTable(out, key="doc_id")


RESIZE_SCHEMA = (
    "doc_id long, src_w int, src_h int, dst_w int, dst_h int, "
    "resized_md5 string"
)


def resize_images(
    table: FeatureTable,
    max_w: int = 256,
    max_h: int = 256,
    payload_col: str = "payload",
    id_col: str | None = None,
    mode: str = "stub",
) -> FeatureTable:
    """Aspect-preserving image resize over ``mapInPandas`` — the
    thumbnail/normalization step of a multimodal training pipeline.

    ``mode="real"`` is the production path (PIL ``Image.thumbnail`` inside
    the same Arrow-batched iterator) — codecs are absent in this
    container, so it raises; ``mode="stub"`` derives source dimensions
    from the content digest (same fake decode as
    :func:`decode_image_features`) and applies the REAL fit-within-box
    arithmetic in pure integers (binding-side comparison + integer
    rescale — no float rounding, so any engine reproduces it exactly).
    ``resized_md5`` digests (payload ‖ "|WxH"), standing in for the
    resized pixel buffer. One scan, no shuffle; output is metadata plus
    the digest, never decoded pixels.
    """
    if mode == "real":
        raise NotImplementedError(
            "image codecs are not available in this environment; the "
            "production kernel resizes with PIL inside the same "
            "mapInPandas iterator"
        )
    if mode != "stub":
        raise ValueError(f"unknown resize mode: {mode!r}")
    idc = id_col or table.key
    if idc is None:
        raise ValueError("resize_images needs an id column")

    src = table.df.select(F.col(idc).alias("doc_id"), F.col(payload_col))

    def kernel(batches: Iterator[Any]) -> Iterator[Any]:
        import pandas as pd

        for pdf in batches:
            rows = {k: [] for k in
                    ("doc_id", "src_w", "src_h", "dst_w", "dst_h",
                     "resized_md5")}
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                raw = bytes(payload)
                digest = hashlib.md5(raw).hexdigest()
                src_w, src_h, _, _ = _stub_features_from_digest(digest)
                if src_w <= max_w and src_h <= max_h:
                    dst_w, dst_h = src_w, src_h
                elif src_w * max_h >= src_h * max_w:  # width is binding
                    dst_w = max_w
                    dst_h = max(1, src_h * max_w // src_w)
                else:
                    dst_h = max_h
                    dst_w = max(1, src_w * max_h // src_h)
                rows["doc_id"].append(doc_id)
                rows["src_w"].append(src_w)
                rows["src_h"].append(src_h)
                rows["dst_w"].append(dst_w)
                rows["dst_h"].append(dst_h)
                rows["resized_md5"].append(
                    hashlib.md5(
                        raw + f"|{dst_w}x{dst_h}".encode()
                    ).hexdigest()
                )
            yield pd.DataFrame(rows)

    out = src.mapInPandas(kernel, RESIZE_SCHEMA)
    return FeatureTable(out, key="doc_id")

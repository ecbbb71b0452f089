"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

North-star capability (BASELINE.json). The design is the part that must be
real at 100 TB; the codec is not available in this container, so decode is
stubbed (deterministic fake behind an import-try — clearly marked below):

- media rows are ``(media_id long, kind string, payload binary,
  meta map<string,string>)`` — the payload is opaque to Catalyst, columnar
  parquet stores it page-compressed, and predicate pushdown still works on
  the scalar/meta columns so decode only ever runs on the filtered subset;
- every transform is ``mapInPandas`` (Arrow batches: one Python call per
  ~10k rows, zero per-row overhead) with an explicit output schema;
- batch memory is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  — at scale set it so batch_rows × max_payload fits the executor;
- frame sampling shows the 1→N row shape (UDTF-style) that video work needs.

STUB NOTE: ``decode_image_features``/``extract_audio_features`` parse OUR
OWN fake header format (see ``synth_media``) when Pillow/soundfile are
absent. The Spark-side plumbing — schemas, batching, partitioning, 1→N
expansion — is real and tested; swap ``_decode_payload`` for a real codec
in production.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

MEDIA_SCHEMA = "media_id long, kind string, payload binary, meta map<string,string>"

_MAGIC = b"FAKE"  # deterministic fake container: FAKE | kind(1B) | w:u16 | h:u16 | body


def synth_media(spark: SparkSession, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media table (tests/demos). Payloads follow
    the fake container format the stub decoder understands."""
    rng = np.random.RandomState(seed)
    rows = []
    kinds = ("image", "audio", "video")
    for i in range(n):
        kind = kinds[i % 3]
        w, h = int(rng.randint(8, 512)), int(rng.randint(8, 512))
        body = rng.bytes(int(rng.randint(64, 2048)))
        payload = _MAGIC + kind[:1].encode() + struct.pack("<HH", w, h) + body
        rows.append((i, kind, bytearray(payload), {"source": f"synth{i % 4}", "w": str(w)}))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _make_decoder():
    """STUB decoder factory: the returned closure parses the fake header
    and is fully self-contained (stdlib only) so every mapInPandas closure
    that captures it ships by value — executors need no package install.
    A real deployment swaps the body for PIL/libav; the surrounding Arrow
    plumbing is unchanged."""
    import struct as _struct

    magic = _MAGIC

    def decode(payload: bytes) -> tuple[int, int, int]:
        # Magic check FIRST: FAKE payloads always take the stub path, so an
        # installed Pillow never breaks synthetic-media queries. Real
        # containers (PNG/JPEG/...) are the honestly-unimplemented branch —
        # swap this raise for a PIL/libav decode in production.
        if payload[:4] != magic:
            raise NotImplementedError(
                "real media decode not wired in this environment (non-FAKE container)"
            )
        (w, h) = _struct.unpack("<HH", payload[5:9])
        return int(w), int(h), len(payload) - 9

    return decode


_decode_payload = _make_decoder()  # driver-side convenience/unit-test handle


IMAGE_FEATURES_SCHEMA = (
    "media_id long, width int, height int, body_bytes long, sha1 string, aspect double"
)


def decode_image_features(media: DataFrame) -> DataFrame:
    """Per-image features via Arrow-batched mapInPandas (filter pushdown on
    ``kind`` happens BEFORE decode — only image rows reach Python)."""

    decode = _make_decoder()  # closure: ships by value with `run`

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, nb = decode(bytes(payload))
                out.append(
                    (
                        mid,
                        w,
                        h,
                        nb,
                        _hashlib.sha1(bytes(payload)).hexdigest(),
                        round(w / h, 6),
                    )
                )
            yield _pd.DataFrame(
                out, columns=["media_id", "width", "height", "body_bytes", "sha1", "aspect"]
            )

    return media.filter(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        run, IMAGE_FEATURES_SCHEMA
    )


FRAME_SCHEMA = "media_id long, frame_idx int, frame_sha1 string"


def sample_video_frames(media: DataFrame, frames_per_video: int = 4) -> DataFrame:
    """1→N frame sampling (UDTF shape): each video row yields
    ``frames_per_video`` deterministic frame fingerprints."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import pandas as _pd

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                for k in range(frames_per_video):
                    frame = raw[9 + k :: frames_per_video]  # deterministic stride sample
                    out.append((mid, k, _hashlib.sha1(frame).hexdigest()))
            yield _pd.DataFrame(out, columns=["media_id", "frame_idx", "frame_sha1"])

    return media.filter(F.col("kind") == "video").select("media_id", "payload").mapInPandas(
        run, FRAME_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = (
    "media_id long, sample_rate int, n_samples long, duration_s double, rms_proxy double"
)


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Per-audio features (STUB codec: interprets the fake header's (w, h)
    as (sample_rate/10, channels) and the body as 8-bit samples — a real
    deployment swaps in soundfile/libav, the Arrow plumbing stays)."""

    decode = _make_decoder()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(payload)
                w, _h, nb = decode(raw)
                sample_rate = w * 10
                body = _np.frombuffer(raw[9:], dtype=_np.uint8).astype(_np.float64)
                rms = float(_np.sqrt((body**2).mean())) if nb else 0.0
                out.append(
                    (mid, sample_rate, nb, round(nb / sample_rate, 6), round(rms, 6))
                )
            yield _pd.DataFrame(
                out,
                columns=["media_id", "sample_rate", "n_samples", "duration_s", "rms_proxy"],
            )

    return media.filter(F.col("kind") == "audio").select("media_id", "payload").mapInPandas(
        run, AUDIO_FEATURES_SCHEMA
    )


EMBED_SCHEMA = "media_id long, embedding array<float>"


def embed_media(media: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic pseudo-embedding per payload (stand-in for a model
    forward pass): seeds numpy from the payload sha, vectorized per Arrow
    batch. Output plugs directly into operators/similarity.py."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            ids, vecs = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                seed = int.from_bytes(
                    _hashlib.sha1(bytes(payload)).digest()[:4], "big"
                )
                vec = _np.random.RandomState(seed).standard_normal(dim).astype(_np.float32)
                ids.append(mid)
                vecs.append(vec.tolist())
            yield _pd.DataFrame({"media_id": ids, "embedding": vecs})

    return media.select("media_id", "payload").mapInPandas(run, EMBED_SCHEMA)

"""Multimodal columns: image/audio/video as opaque BINARY + typed metadata.

Training pipelines carry media as binary payloads next to text. This module
provides the Spark-side plumbing — schemas, Arrow batch shapes, partitioning-
friendly operators — against a deterministic container format (``FTSB``) so
everything is real and testable in this environment. Actual codec work
(JPEG/PNG/MP3 decode) is gated behind optional imports and raises
``NotImplementedError`` when the library is absent; the FTSB path exercises
the identical dataflow (header parse -> numpy pixel/PCM math -> re-encode).

FTSB container layout (little-endian, struct fmt ``<4sBHHBHI``):

    magic  4s   b"FTSB"
    modality u8   1=image, 2=audio, 3=video
    width  u16 | height u16 | channels u8   (images/video frames)
    n_frames u16                            (video; 1 for image, 0 for audio)
    sample_rate u32                         (audio; 0 otherwise)
    payload: uint8 pixels (image/video, frame-major) or int16 PCM (audio)

All operators are ``mapInPandas``/Arrow — one Python hop per batch, numpy
inside, never per-row UDFs.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from fulltextsearch_spark.operators.util import spread_for_python_kernel

__all__ = [
    "FTSB_HEADER_FMT",
    "MEDIA_SCHEMA",
    "encode_ftsb",
    "decode_header",
    "generate_media",
    "media_from_docs",
    "media_metadata",
    "image_ahash",
    "image_stats",
    "resize_images",
    "sample_frames",
    "audio_features",
    "decode_image_real",
]

FTSB_HEADER_FMT = "<4sBHHBHI"
_HEADER_SIZE = struct.calcsize(FTSB_HEADER_FMT)
MEDIA_SCHEMA = "media_id LONG, modality STRING, payload BINARY"

_MODALITY = {1: "image", 2: "audio", 3: "video"}


def encode_ftsb(
    modality: int,
    data: np.ndarray,
    width: int = 0,
    height: int = 0,
    channels: int = 0,
    n_frames: int = 0,
    sample_rate: int = 0,
) -> bytes:
    header = struct.pack(
        FTSB_HEADER_FMT, b"FTSB", modality, width, height, channels, n_frames, sample_rate
    )
    return header + data.tobytes()


def decode_header(payload: bytes) -> dict:
    magic, modality, width, height, channels, n_frames, sample_rate = struct.unpack_from(
        FTSB_HEADER_FMT, payload
    )
    if magic != b"FTSB":
        raise ValueError("not an FTSB payload")
    return {
        "modality": _MODALITY.get(modality, "unknown"),
        "width": width,
        "height": height,
        "channels": channels,
        "n_frames": n_frames,
        "sample_rate": sample_rate,
        "payload_bytes": len(payload) - _HEADER_SIZE,
    }


def _image_array(payload: bytes) -> np.ndarray:
    h = decode_header(payload)
    px = np.frombuffer(payload, dtype=np.uint8, offset=_HEADER_SIZE)
    frames = max(h["n_frames"], 1)
    return px.reshape(frames, h["height"], h["width"], h["channels"])


def _audio_array(payload: bytes) -> np.ndarray:
    return np.frombuffer(payload, dtype=np.int16, offset=_HEADER_SIZE)


def generate_media(spark: SparkSession, n: int, seed: int = 13) -> DataFrame:
    """Deterministic synthetic media table (media_id, modality, payload)."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = i % 3
        if kind == 0:
            w, h, c = int(rng.integers(8, 64)), int(rng.integers(8, 64)), 3
            px = rng.integers(0, 256, size=h * w * c, dtype=np.uint8)
            rows.append((i, "image", encode_ftsb(1, px, w, h, c, n_frames=1)))
        elif kind == 1:
            sr = 16000
            pcm = (np.sin(np.arange(sr // 4) * (440.0 + i) / sr * 2 * np.pi) * 10000).astype(
                np.int16
            )
            rows.append((i, "audio", encode_ftsb(2, pcm, sample_rate=sr)))
        else:
            w, h, c, nf = 16, 16, 3, int(rng.integers(4, 12))
            px = rng.integers(0, 256, size=nf * h * w * c, dtype=np.uint8)
            rows.append((i, "video", encode_ftsb(3, px, w, h, c, n_frames=nf)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def media_from_docs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive a deterministic FTSB media table from (doc_id, text) rows.

    Every header field is a pure formula of doc_id and the payload is the
    UTF-8 text bytes repeated/truncated to the required size, so an
    independent SQL oracle can predict what a header parse must return —
    which turns :func:`media_metadata`'s struct.pack/unpack round trip into
    a hard-checkable contract:

    * doc_id % 3 == 0 -> image:  w = 8 + id%56, h = 8 + (id*7)%56, c=3, nf=1
    * doc_id % 3 == 1 -> audio:  sample_rate=16000, payload = int16 PCM from
      the first 2*(len(text)//2) text bytes
    * doc_id % 3 == 2 -> video:  16x16x3, nf = 4 + id%8
    """

    def _enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, mods, pays = [], [], []
            for did, text in zip(pdf["doc_id"], pdf[text_col]):
                i = int(did)
                data = (text if isinstance(text, str) else "").encode("utf-8") or b"\x00"
                kind = i % 3
                if kind == 0:
                    w, h, c = 8 + i % 56, 8 + (i * 7) % 56, 3
                    need = w * h * c
                    px = np.frombuffer((data * (need // len(data) + 1))[:need], dtype=np.uint8)
                    mods.append("image")
                    pays.append(encode_ftsb(1, px, w, h, c, n_frames=1))
                elif kind == 1:
                    ns = len(data) // 2
                    pcm = np.frombuffer(data[: ns * 2], dtype="<i2")
                    mods.append("audio")
                    pays.append(encode_ftsb(2, pcm, sample_rate=16000))
                else:
                    w = h = 16
                    c, nf = 3, 4 + i % 8
                    need = nf * h * w * c
                    px = np.frombuffer((data * (need // len(data) + 1))[:need], dtype=np.uint8)
                    mods.append("video")
                    pays.append(encode_ftsb(3, px, w, h, c, n_frames=nf))
                ids.append(i)
            yield pd.DataFrame({"media_id": ids, "modality": mods, "payload": pays})

    return spread_for_python_kernel(docs.select("doc_id", text_col)).mapInPandas(
        _enc, schema=MEDIA_SCHEMA
    )


def media_metadata(media: DataFrame) -> DataFrame:
    """(media_id, modality, width, height, channels, n_frames, sample_rate,
    payload_bytes) — header-only parse, no pixel decode."""

    def _meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode_header(bytes(p)) for p in pdf["payload"]]
            out = pd.DataFrame(metas)
            out.insert(0, "media_id", pdf["media_id"].to_numpy(dtype=np.int64))
            yield out

    return media.mapInPandas(
        _meta,
        schema=(
            "media_id LONG, modality STRING, width LONG, height LONG, channels LONG, "
            "n_frames LONG, sample_rate LONG, payload_bytes LONG"
        ),
    )


def image_stats(media: DataFrame) -> DataFrame:
    """(media_id, mean_r, mean_g, mean_b, std_gray) over image payloads."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, pay in zip(pdf["media_id"], pdf["payload"]):
                arr = _image_array(bytes(pay)).astype(np.float64)
                means = arr.mean(axis=(0, 1, 2))
                gray = arr.mean(axis=3)
                rows.append(
                    {
                        "media_id": int(mid),
                        "mean_r": float(means[0]),
                        "mean_g": float(means[1]),
                        "mean_b": float(means[2]),
                        "std_gray": float(gray.std()),
                    }
                )
            yield pd.DataFrame(rows)

    return media.filter("modality = 'image'").mapInPandas(
        _stats, schema="media_id LONG, mean_r DOUBLE, mean_g DOUBLE, mean_b DOUBLE, std_gray DOUBLE"
    )


def resize_images(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """(media_id, modality, payload) with images nearest-neighbor resized."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for pay in pdf["payload"]:
                arr = _image_array(bytes(pay))
                _, h, w, c = arr.shape
                yi = (np.arange(out_h) * h // out_h).astype(np.int64)
                xi = (np.arange(out_w) * w // out_w).astype(np.int64)
                resized = arr[0][yi][:, xi]
                payloads.append(encode_ftsb(1, resized.ravel(), out_w, out_h, c, n_frames=1))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(dtype=np.int64),
                    "modality": "image",
                    "payload": payloads,
                }
            )

    return media.filter("modality = 'image'").mapInPandas(_resize, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_nth: int = 2) -> DataFrame:
    """(media_id, frame_idx, frame_payload) — every nth frame as an image."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_pay = [], [], []
            for mid, pay in zip(pdf["media_id"], pdf["payload"]):
                arr = _image_array(bytes(pay))
                nf, h, w, c = arr.shape
                for fi in range(0, nf, every_nth):
                    out_id.append(int(mid))
                    out_idx.append(fi)
                    out_pay.append(encode_ftsb(1, arr[fi].ravel(), w, h, c, n_frames=1))
            yield pd.DataFrame(
                {"media_id": out_id, "frame_idx": out_idx, "frame_payload": out_pay}
            )

    return media.filter("modality = 'video'").mapInPandas(
        _sample, schema="media_id LONG, frame_idx LONG, frame_payload BINARY"
    )


def audio_features(media: DataFrame, frame_ms: int = 25) -> DataFrame:
    """(media_id, n_samples, duration_s, rms, n_frames_energy) PCM features."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, pay in zip(pdf["media_id"], pdf["payload"]):
                pay = bytes(pay)
                hdr = decode_header(pay)
                pcm = _audio_array(pay).astype(np.float64)
                sr = hdr["sample_rate"] or 1
                flen = max(int(sr * frame_ms / 1000), 1)
                nfr = len(pcm) // flen
                rows.append(
                    {
                        "media_id": int(mid),
                        "n_samples": len(pcm),
                        "duration_s": len(pcm) / sr,
                        "rms": float(np.sqrt((pcm ** 2).mean())) if len(pcm) else 0.0,
                        "n_frames_energy": nfr,
                    }
                )
            yield pd.DataFrame(rows)

    return media.filter("modality = 'audio'").mapInPandas(
        _feat,
        schema="media_id LONG, n_samples LONG, duration_s DOUBLE, rms DOUBLE, n_frames_energy LONG",
    )


def decode_image_real(payload: bytes):
    """Decode a real image format (JPEG/PNG). Requires Pillow, which this
    environment does not ship — the FTSB path above exercises the identical
    Spark plumbing; swap this in where real codecs are available."""
    try:
        from PIL import Image  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "real image decode needs Pillow; use the FTSB container path "
            "(media_metadata/image_stats/resize_images) in this environment"
        ) from e
    import io  # pragma: no cover

    return np.asarray(Image.open(io.BytesIO(payload)))  # pragma: no cover


def image_ahash(media: DataFrame) -> DataFrame:
    """(media_id, ahash): 8x8 average-hash perceptual fingerprint — THE
    standard image near-dup signal (the visual analogue of SimHash; pairs
    within small hamming distance feed the same banded join machinery).

    Entirely INTEGER arithmetic so the fingerprint is bit-exact under any
    execution order (and SQL-replayable): per-pixel gray = r+g+b (no /3),
    pixel (y, x) belongs to block (y*8//h, x*8//w), and a block's bit is
    set iff ``block_sum * total_pixels > total_sum * block_pixels`` — the
    cross-multiplied form of "block mean above image mean" with no
    division anywhere. The 64 bits render as a 16-hex-char string
    (nibble = 4 bits, earlier block index = more significant bit), which
    sidesteps signed-64 overflow portability.
    """

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, pay in zip(pdf["media_id"], pdf["payload"]):
                arr = _image_array(bytes(pay)).astype(np.int64)
                frames, h, w, _c = arr.shape
                gray = arr[0].sum(axis=2)  # h x w integer r+g+b
                by = (np.arange(h) * 8) // h
                bx = (np.arange(w) * 8) // w
                blk = (by[:, None] * 8 + bx[None, :]).ravel()
                bs = np.bincount(blk, weights=None, minlength=64).astype(np.int64)
                bsum = np.bincount(blk, weights=gray.ravel(), minlength=64).astype(
                    np.int64
                )
                total, tp = int(gray.sum()), h * w
                bits = (bsum * tp) > (total * bs)
                nibbles = bits.reshape(16, 4)
                vals = (
                    nibbles[:, 0] * 8 + nibbles[:, 1] * 4 + nibbles[:, 2] * 2 + nibbles[:, 3]
                )
                rows.append(
                    {
                        "media_id": int(mid),
                        "ahash": "".join(format(int(v), "x") for v in vals),
                    }
                )
            yield pd.DataFrame(rows)

    return media.filter("modality = 'image'").mapInPandas(
        _hash, schema="media_id LONG, ahash STRING"
    )

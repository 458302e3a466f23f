"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed in Arrow batches via ``mapInPandas``.

Training-data extension: image/audio/video columns are carried as
``binary`` with a typed metadata struct; decode / feature-extract /
resize / frame-sample run as Pandas-batch operators. The actual codec
libraries (Pillow, ffmpeg, ...) are NOT in this container, so the
codec call is isolated behind ``decode_payload`` — a deterministic
fake (documented below) unless a real decoder is injected; everything
Spark-side (schema, batch iteration, partitioning, output typing) is
real and tested.

Scale notes: mapInPandas streams Arrow record batches — per-row Python
overhead is amortized; payload bytes never pass through the driver;
repartition upstream so batches are balanced when payload sizes skew.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, magic string, width int, height int, "
    "features array<double>"
)


def attach_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a deterministic binary payload column from text (the
    testdata has no real media; UTF-8 bytes stand in for an encoded
    image). Adds ``payload binary`` and a ``meta`` struct —
    the schema contract real ingestion would satisfy."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "meta",
        F.struct(
            F.lit("fake/utf8").alias("mime"),
            F.length(F.col(text_col)).cast("bigint").alias("n_bytes"),
        ),
    )


def decode_payload(payload: bytes) -> dict:
    """Codec seam. Real deployments inject an image/audio decoder here
    (e.g. Pillow ``Image.open``); this container has none, so the
    default is a *deterministic fake*: 'dimensions' derived from byte
    length, 'pixels' from a 16-bin byte histogram. Raises if asked for
    a real codec.
    """
    if payload is None:
        return {"magic": None, "width": None, "height": None, "hist": None}
    magic = payload[:4].hex()
    n = len(payload)
    # numpy bincount over the nibble view — a per-byte Python loop here
    # multiplies the whole mapInPandas stage by the corpus byte count.
    counts = np.bincount(
        np.frombuffer(payload, dtype=np.uint8) >> 4, minlength=16
    )
    total = float(n) if n else 1.0
    return {
        "magic": magic,
        "width": int(n % 640),
        "height": int(n % 480),
        "hist": [c / total for c in counts.tolist()],
    }


def real_decoder(*_args, **_kwargs):  # pragma: no cover - explicit stub
    """Placeholder for a true media decoder (Pillow/librosa/ffmpeg are
    not installed in this environment)."""
    raise NotImplementedError(
        "media codecs are not available in this container; "
        "inject a decoder into extract_features(decoder=...)"
    )


def extract_features(
    df: DataFrame,
    decoder: Callable[[bytes], dict] = decode_payload,
) -> DataFrame:
    """Decode + featurize binary payloads in Arrow batches.

    ``df`` must have ``doc_id bigint, payload binary``. Output:
    ``FEATURE_SCHEMA``. The decoder runs per row inside a
    ``mapInPandas`` batch loop — the Spark-facing shape (schema,
    batching, laziness) is exactly what a real image pipeline uses.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            decoded = [decoder(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [
                        len(p) if p is not None else 0 for p in pdf["payload"]
                    ],
                    "magic": [d["magic"] for d in decoded],
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "features": [d["hist"] for d in decoded],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(batches, FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 64,
    max_frames: int = 8,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """'Frame sampling' over a binary payload — deterministic stride
    slicing expressed as pure column ops (substr on binary), one output
    row per sampled frame. Mirrors video frame-sampling plumbing:
    explode(frame_index) → slice payload. ``carry`` names extra
    doc-level columns to repeat onto every frame row (metadata ride-
    along, no join needed)."""
    idx = F.explode(
        F.sequence(F.lit(0), F.least(
            F.floor(F.length("payload") / every_n_bytes).cast("int"),
            F.lit(max_frames - 1),
        ))
    ).alias("frame_no")
    return df.select("doc_id", *carry, "payload", idx).select(
        "doc_id",
        *carry,
        "frame_no",
        F.expr(f"substring(payload, frame_no * {every_n_bytes} + 1, {every_n_bytes})")
        .alias("frame_bytes"),
    )


RESIZED_SCHEMA = (
    "doc_id bigint, payload binary, width int, height int, "
    "src_width int, src_height int"
)


def default_resizer(
    payload: bytes, width: int, height: int
) -> tuple[bytes, int, int]:
    """Resize seam. Real deployments inject a codec-backed resizer
    (Pillow ``Image.resize`` + re-encode); the in-container default
    is a deterministic fake that preserves the plumbing contract —
    output payload length scales with the target pixel count
    (byte-striding the input), source dimensions come from
    :func:`decode_payload`. Returns (new_payload, src_w, src_h)."""
    if payload is None:
        return None, None, None
    meta = decode_payload(payload)
    n_out = max(width * height // 256, 1)
    data = np.frombuffer(payload, dtype=np.uint8)
    idx = np.linspace(0, len(data) - 1, num=min(n_out, len(data))).astype(
        np.int64
    )
    return data[idx].tobytes(), meta["width"], meta["height"]


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    resizer: Callable[[bytes, int, int], tuple] = default_resizer,
) -> DataFrame:
    """Resize binary image payloads to (``width``, ``height``) in
    Arrow batches — the remaining leg of the decode / feature-extract
    / resize / frame-sample quartet. ``df`` needs ``doc_id bigint,
    payload binary``; output is ``RESIZED_SCHEMA`` (new payload plus
    target and source dimensions). The codec call is injected
    (``resizer``) exactly like ``extract_features``' decoder — the
    Spark-side contract (schema, batch iteration, binary round-trip,
    laziness) is real and tested; the default is a deterministic
    stand-in since this container has no image codec.

    Scale shape: one ``mapInPandas`` scan — payload bytes stream
    through Arrow record batches, never the driver; repartition
    upstream if payload sizes skew batch weights."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out_payload, src_w, src_h = [], [], []
            for p in pdf["payload"]:
                np_, sw, sh = resizer(p, width, height)
                out_payload.append(np_)
                src_w.append(sw)
                src_h.append(sh)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "payload": out_payload,
                    "width": width,
                    "height": height,
                    "src_width": src_w,
                    "src_height": src_h,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(batches, RESIZED_SCHEMA)


def pillow_available() -> bool:
    """True when Pillow can actually decode/encode images here — the
    runtime gate for the real-codec legs below, mirroring
    ``streaming.sessions.tws_available``: the injection seams
    (``decoder=`` / ``resizer=``) exist either way; the codec-backed
    implementations only run where the dependency does, and the
    deterministic fakes remain the default everywhere else.
    ``tests/test_multimodal.py`` parameterizes over both legs and
    skip-marks the Pillow one where absent (this build container has
    no image libraries)."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError:
        return False
    return True


def pillow_decoder(payload: bytes) -> dict:
    """Real-codec decoder for the :func:`extract_features` seam:
    Pillow decode, true dimensions, 16-bin luminance histogram as the
    feature vector (same output contract as the deterministic fake —
    magic/width/height/hist — so the downstream schema and tests are
    identical across codecs). Only call where
    :func:`pillow_available`."""
    import io

    from PIL import Image

    if payload is None:
        return {"magic": None, "width": None, "height": None, "hist": None}
    magic = payload[:4].hex()
    img = Image.open(io.BytesIO(payload)).convert("L")
    w, h = img.size
    counts = np.bincount(
        np.asarray(img, dtype=np.uint8).ravel() >> 4, minlength=16
    )
    total = float(counts.sum()) if counts.sum() else 1.0
    return {
        "magic": magic,
        "width": int(w),
        "height": int(h),
        "hist": [c / total for c in counts.tolist()],
    }


def pillow_resizer(
    payload: bytes, width: int, height: int
) -> tuple[bytes, int, int]:
    """Real-codec resizer for the :func:`resize_images` seam: Pillow
    decode → ``Image.resize`` → PNG re-encode. Same return contract as
    :func:`default_resizer` ((new_payload, src_w, src_h)), so the
    mapInPandas plumbing, schema and batch shape are shared verbatim
    between codecs. Only call where :func:`pillow_available`."""
    import io

    from PIL import Image

    if payload is None:
        return None, None, None
    img = Image.open(io.BytesIO(payload))
    src_w, src_h = img.size
    out = io.BytesIO()
    img.resize((width, height)).save(out, format="PNG")
    return out.getvalue(), src_w, src_h

"""Multimodal column operators: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side plumbing is REAL — schemas, Arrow batch shapes,
mapInPandas kernels, partition sizing — while the codec calls (actual
JPEG/audio decode) are stubbed behind ``NotImplementedError`` plus a
deterministic fake decoder, because the sandbox image/audio libraries
are absent (per the driver brief).  Swapping ``decode_image_stub`` for a
Pillow/torchvision call changes no plan shape.

Scale notes (100 TB of media):
- media stays an opaque ``binary`` column next to its metadata struct —
  Parquet keeps it row-group-compressed, column pruning means metadata
  queries never touch the bytes;
- decode/resize/frame-sample run in ``mapInPandas`` over Arrow batches
  sized by bytes not rows (``rows_per_batch`` guards worker memory
  against multi-MB payloads);
- outputs are fixed-shape float arrays (features) or re-encoded binary,
  so downstream joins/groupBys shuffle compact columns, never raw media.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: schema of a multimodal asset table (binary payload + typed metadata)
ASSET_SCHEMA = (
    "asset_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, "
    "mime:string>"
)

FEATURE_DIM = 16


def make_fake_assets(spark, n: int = 64, seed: int = 3) -> DataFrame:
    """Deterministic synthetic asset table (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        h = hashlib.sha256(f"{seed}:{i}".encode()).digest()
        kind = ("image", "audio", "video")[i % 3]
        payload = (h * ((256 + i) // len(h) + 1))[: 256 + i]
        meta = {
            "width": 32 + i % 64 if kind != "audio" else None,
            "height": 24 + i % 48 if kind != "audio" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": 1 + i % 30 if kind == "video" else None,
            "mime": {"image": "image/jpeg", "audio": "audio/wav",
                     "video": "video/mp4"}[kind],
        }
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, ASSET_SCHEMA)


def decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decoder: a real deployment calls Pillow/libjpeg here
    (``raise NotImplementedError`` guards the non-deterministic path);
    the deterministic fake derives a pseudo-pixel array from the payload
    hash so every downstream stage is testable."""
    if payload[:2] == b"\xff\xd8":  # a real JPEG reached the stub
        raise NotImplementedError(
            "real JPEG decode requires an image codec (Pillow) — absent "
            "in this sandbox; plumbing is exercised via the fake decoder"
        )
    h = hashlib.sha256(payload).digest()
    base = np.frombuffer(h, dtype=np.uint8).astype(np.float32)
    n = max(int(width or 8) * int(height or 8), 1)
    return np.resize(base, n)


def pillow_image_decoder():
    """Real-codec seam: a Pillow-backed decoder, or None when the
    library is absent or disabled via LSS_REAL_CODEC=0.  A deployment
    with Pillow installed gets real JPEG decode with no code change;
    this sandbox falls back to the deterministic stub."""
    import os

    if os.environ.get("LSS_REAL_CODEC", "auto") == "0":
        return None
    try:
        from PIL import Image  # noqa: F401
    except ImportError:
        return None
    import io

    from PIL import Image

    def dec(payload: bytes, width: int, height: int) -> np.ndarray:
        img = Image.open(io.BytesIO(payload)).convert("L").resize(
            (int(width or 8), int(height or 8))
        )
        return np.asarray(img, dtype=np.float32).ravel()

    return dec


def get_image_decoder():
    """The active decoder: Pillow when importable (and not disabled),
    else the deterministic stub."""
    return pillow_image_decoder() or decode_image_stub


def extract_features(assets: DataFrame, rows_per_batch: int = 256,
                     decoder=None) -> DataFrame:
    """(asset_id, kind, feature array<float>[FEATURE_DIM], n_bytes):
    decode + pool each asset into a fixed-dim feature vector inside an
    Arrow-batched kernel.  `decoder` overrides the codec (tests inject a
    fake "real" decoder); by default each executor resolves
    get_image_decoder() locally, so a cluster with Pillow on the
    executors decodes real JPEGs."""

    def run(batches):
        dec = decoder if decoder is not None else get_image_decoder()
        for pdf in batches:
            for s in range(0, len(pdf), rows_per_batch):
                chunk = pdf.iloc[s : s + rows_per_batch]
                feats, nb = [], []
                for r in chunk.itertuples(index=False):
                    meta = r.meta
                    px = dec(
                        bytes(r.payload),
                        (meta["width"] if meta is not None else 8) or 8,
                        (meta["height"] if meta is not None else 8) or 8,
                    )
                    pooled = np.resize(px, FEATURE_DIM) / np.float32(255.0)
                    feats.append(pooled.astype(np.float32).tolist())
                    nb.append(len(r.payload))
                yield pd.DataFrame(
                    {
                        "asset_id": chunk["asset_id"].values,
                        "kind": chunk["kind"].values,
                        "feature": feats,
                        "n_bytes": np.asarray(nb, dtype=np.int64),
                    }
                )

    return assets.mapInPandas(
        run, "asset_id long, kind string, feature array<float>, n_bytes long"
    )


def sample_frames(assets: DataFrame, every: int = 5) -> DataFrame:
    """Video frame sampling: one output row per sampled frame index
    (mapInPandas 1->N expansion, the UDTF shape).  Frame decode itself is
    the stubbed codec; the row explosion + schema are the real plumbing."""

    def run(batches):
        for pdf in batches:
            ids, frames, kinds = [], [], []
            for r in pdf.itertuples(index=False):
                if r.kind != "video" or r.meta is None:
                    continue
                n = r.meta.get("n_frames")
                if n is None or (isinstance(n, float) and np.isnan(n)):
                    continue
                for f in range(0, int(n), every):
                    ids.append(r.asset_id)
                    frames.append(f)
                    kinds.append(r.kind)
            if ids:
                yield pd.DataFrame(
                    {"asset_id": ids, "frame_idx": frames, "kind": kinds}
                )

    return assets.mapInPandas(run, "asset_id long, frame_idx int, kind string")


def media_stats(assets: DataFrame) -> DataFrame:
    """Metadata-only aggregation — column pruning keeps the binary
    payload unread (check .explain: ReadSchema has no `payload`)."""
    return assets.groupBy("kind").agg(
        F.count("*").alias("n"),
        F.avg(F.length("payload")).alias("avg_bytes"),
        F.max("meta.n_frames").alias("max_frames"),
    )

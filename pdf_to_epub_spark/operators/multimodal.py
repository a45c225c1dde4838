"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

At corpus scale, media payloads ride as ``binary`` columns next to typed
metadata; decode / feature-extraction / resize / frame-sampling run as
Arrow-batched ``mapInPandas`` stages.  The image/audio codecs are NOT
available in this environment, so the codec call itself is stubbed behind
an import-try (``NotImplementedError`` when a real decode is requested,
deterministic header-derived fake otherwise) — the Spark-side plumbing
(schema, partitioning, UDF signature, batch shape) is real and tested.

Container sniffing is real: magic-byte detection for PNG/JPEG/GIF/RIFF-WAV/
MP3/MP4 runs JVM-side on the binary prefix — no Python in that path.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("url", StringType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("payload", StringType()),  # overridden to binary below
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("url", StringType()),
        StructField("media_type", StringType()),
        StructField("container", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("meta", MapType(StringType(), StringType())),
        StructField("status", StringType()),
    ]
)

_MAGIC = (
    ("png", b"\x89PNG\r\n\x1a\n"),
    ("jpeg", b"\xff\xd8\xff"),
    ("gif", b"GIF8"),
    ("riff", b"RIFF"),
    ("mp3", b"ID3"),
)


def sniff_container(payload_col: str = "payload") -> F.Column:
    """JVM-side magic-byte container detection on the binary prefix."""
    hexprefix = F.hex(F.substring(F.col(payload_col), 1, 8))
    col = F.lit("unknown")
    cases = None
    for name, magic in _MAGIC:
        cond = hexprefix.startswith(magic.hex().upper())
        cases = F.when(cond, F.lit(name)) if cases is None else cases.when(cond, F.lit(name))
    # mp4: 'ftyp' at offset 5 (bytes 5-8 of the box header)
    mp4 = F.hex(F.substring(F.col(payload_col), 5, 4)) == "66747970"
    return cases.when(mp4, F.lit("mp4")).otherwise(col)


def _decode_media(payload: bytes, media_type: str, real_codecs: bool):
    """Decode stub.  With ``real_codecs`` the actual libraries would be
    used — they are not installed in this container, so that path raises;
    the default path derives deterministic fake dimensions/frames from the
    payload header so downstream plumbing is fully exercised."""
    if real_codecs:
        try:
            import PIL.Image  # noqa: F401
        except ImportError as exc:
            raise NotImplementedError(
                "real media codecs (PIL/ffmpeg/librosa) are not available "
                "in this environment; run with real_codecs=False"
            ) from exc
        raise NotImplementedError("real decode path not implemented")
    h = 0
    for b in payload[:16]:
        h = (h * 131 + b) & 0x7FFFFFFF
    width = 16 + h % 2048
    height = 16 + (h >> 11) % 2048
    n_frames = 1 if media_type == "image" else 1 + (h >> 22) % 240
    return width, height, n_frames


def _feature_batches(real_codecs: bool, embedding_dim: int):
    def gen(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out = {k: [] for k in (
                "media_id", "url", "media_type", "container", "n_bytes",
                "width", "height", "n_frames", "embedding", "meta", "status",
            )}
            for mid, url, mtype, container, payload in zip(
                pdf["media_id"], pdf["url"], pdf["media_type"],
                pdf["container"], pdf["payload"],
            ):
                out["media_id"].append(mid)
                out["url"].append(url)
                out["media_type"].append(mtype)
                out["container"].append(container)
                raw = bytes(payload) if payload is not None else b""
                out["n_bytes"].append(len(raw))
                try:
                    w, h, nf = _decode_media(raw, mtype, real_codecs)
                    # deterministic fake embedding from payload bytes
                    emb = []
                    acc = 1469598103934665603
                    for i in range(embedding_dim):
                        byte = raw[i % len(raw)] if raw else 0
                        acc = (acc ^ (byte + i)) * 1099511628211 % (1 << 64)
                        emb.append(((acc % 2000003) / 1000001.5) - 1.0)
                    out["width"].append(w)
                    out["height"].append(h)
                    out["n_frames"].append(nf)
                    out["embedding"].append([float(x) for x in emb])
                    out["meta"].append(
                        {"aspect": f"{w}:{h}", "codec_path": "stub"}
                    )
                    out["status"].append("ok")
                except NotImplementedError as exc:
                    out["width"].append(None)
                    out["height"].append(None)
                    out["n_frames"].append(None)
                    out["embedding"].append(None)
                    out["meta"].append({"error": str(exc)[:120]})
                    out["status"].append("unsupported")
            yield pd.DataFrame(out)

    return gen


def extract_media_features(
    media: DataFrame,
    real_codecs: bool = False,
    embedding_dim: int = 16,
    salt_partitions: int | None = None,
) -> DataFrame:
    """media(media_id, url, media_type, payload: binary) → feature rows.

    Container sniffing happens JVM-side before the Python stage; the
    payload column is the only binary crossing into Arrow.  Partitioning
    contract mirrors text extraction: optional url-hash salting, no other
    shuffle.
    """
    df = media.withColumn("container", sniff_container("payload"))
    if salt_partitions:
        df = df.repartition(salt_partitions, F.xxhash64("url"))
    return df.mapInPandas(
        _feature_batches(real_codecs, embedding_dim), FEATURE_SCHEMA
    )


def frame_sample_plan(
    features: DataFrame, every_nth: int = 24, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling plan for video rows: which frame indices a real
    decoder would extract — JVM-side sequence/slice, no Python."""
    idx = F.slice(
        F.sequence(F.lit(0), F.greatest(F.col("n_frames") - 1, F.lit(0)), F.lit(every_nth)),
        1,
        max_frames,
    )
    return features.where(F.col("media_type") == "video").select(
        "media_id", "url", "n_frames", idx.alias("frame_indices")
    )


def resize_spec(features: DataFrame, target: int = 224) -> DataFrame:
    """Resize plan (shortest side → ``target``, aspect preserved) as column
    algebra; the pixel work would happen in the decode UDF when codecs
    exist."""
    scale = F.lit(target) / F.least("width", "height")
    return features.where(F.col("status") == "ok").select(
        "media_id",
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("resized_w"),
        F.round(F.col("height") * scale).cast("int").alias("resized_h"),
    )


def make_media_corpus(n: int, seed: int = 7) -> list[dict]:
    """Deterministic fake media rows with REAL container magic bytes."""
    import random

    rows = []
    magics = {
        "image": [b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff\xe0", b"GIF89a"],
        "audio": [b"RIFF\x24\x00\x00\x00WAVE", b"ID3\x04\x00"],
        "video": [b"\x00\x00\x00\x18ftypmp42"],
    }
    types = ("image", "image", "image", "audio", "video")
    for i in range(n):
        rng = random.Random((seed << 16) ^ i)
        mtype = types[i % len(types)]
        magic = rng.choice(magics[mtype])
        body = bytes(rng.getrandbits(8) for _ in range(rng.randint(64, 512)))
        rows.append(
            {
                "media_id": i,
                "url": f"https://crawl.invalid/media/{i:06d}",
                "media_type": mtype,
                "payload": magic + body,
            }
        )
    return rows

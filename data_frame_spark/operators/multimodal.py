"""Multimodal column support: images/audio/video as opaque binary
columns with typed metadata (north-star extension, SURVEY §7 Phase 6).

Schema convention: a modality is a ``binary`` payload column plus a
``STRUCT`` metadata column (format, dims, duration...). Everything
that can run without codec libraries is real and tested:

* format sniffing from magic bytes (pure Column ops)
* byte statistics / byte-histogram features (Arrow-batched
  ``mapInPandas`` — the exact plumbing a real decoder uses: schema
  in, schema out, batch iterator)
* frame/chunk sampling index plumbing

Actual pixel/sample decoding requires PIL/ffmpeg (absent in this
container): ``decode_image`` degrades to a clearly-marked
NotImplementedError unless PIL is importable; the surrounding Spark
plumbing (UDF signature, schema, batching, partitioning) is real
and covered by tests with synthetic payloads.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

def sniff_format(bin_col: Column) -> Column:
    """Container format from magic bytes — pure Column expression."""
    head = F.upper(F.hex(F.substring(bin_col, 1, 8)))
    expr = F.lit("unknown")
    for magic, fmt in [
        ("89504E47", "png"),
        ("FFD8FF", "jpeg"),
        ("47494638", "gif"),
        ("52494646", "riff"),
        ("664C6143", "flac"),
        ("1A45DFA3", "webm"),
    ]:
        expr = F.when(head.startswith(magic), F.lit(fmt)).otherwise(expr)
    return expr


def attach_metadata(df: DataFrame, bin_col: str, out_col: str = "meta") -> DataFrame:
    """Typed metadata struct: size, md5, sniffed format."""
    b = F.col(bin_col)
    return df.withColumn(
        out_col,
        F.struct(
            F.length(b).alias("n_bytes"),
            F.md5(b).alias("content_md5"),
            sniff_format(b).alias("format"),
        ),
    )


BYTE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("entropy", T.DoubleType()),
        T.StructField("byte_hist", T.ArrayType(T.FloatType())),
    ]
)


def byte_features(df: DataFrame, bin_col: str, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads: 16-bin
    byte histogram (L1-normalized) + Shannon entropy. This is the
    real decode-stage plumbing — mapInPandas with a typed output
    schema — with a codec-free feature."""
    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i, payload in zip(pdf[id_col], pdf[bin_col]):
                arr = np.frombuffer(payload or b"", dtype=np.uint8)
                n = len(arr)
                if n == 0:
                    out.append((int(i), 0, 0.0, [0.0] * 16))
                    continue
                hist = np.bincount(arr >> 4, minlength=16).astype(float)
                p = hist / n
                nz = p[p > 0]
                entropy = float(-(nz * np.log2(nz)).sum())
                out.append((int(i), n, entropy, (hist / n).astype(np.float32).tolist()))
            yield pd.DataFrame(
                out, columns=["doc_id", "n_bytes", "entropy", "byte_hist"]
            )

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        extract, schema=BYTE_FEATURES_SCHEMA
    )


DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("pixels_md5", T.StringType()),
    ]
)


def decode_image(df: DataFrame, bin_col: str, id_col: str = "doc_id") -> DataFrame:
    """Image decode via PIL when available. The container has no
    image libraries, so without PIL each row raises a clearly-marked
    NotImplementedError at execution time — the Spark plumbing
    (schema, batching) is the deliverable; swap the kernel body on a
    cluster with PIL installed."""
    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            from PIL import Image  # noqa: F401
            import io
            have_pil = True
        except ImportError:
            have_pil = False
        for pdf in batches:
            if not have_pil:
                raise NotImplementedError(
                    "decode_image requires PIL (not available in this "
                    "container); byte_features provides the codec-free path"
                )
            out = []
            for i, payload in zip(pdf[id_col], pdf[bin_col]):
                img = Image.open(io.BytesIO(payload))
                arr = np.asarray(img)
                import hashlib

                out.append(
                    (
                        int(i),
                        img.width,
                        img.height,
                        arr.shape[2] if arr.ndim == 3 else 1,
                        hashlib.md5(arr.tobytes()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "channels", "pixels_md5"]
            )

    return df.select(F.col(id_col), F.col(bin_col)).mapInPandas(
        decode, schema=DECODE_SCHEMA
    )


def sample_frames(df: DataFrame, n_frames_col: str, every_k: int = 10) -> DataFrame:
    """Frame-sampling index plumbing: for a video row with N frames,
    emit (row, frame_idx) for every k-th frame — the explode that
    feeds a frame decoder. Pure Column ops."""
    idx = F.sequence(
        F.lit(0), F.greatest(F.col(n_frames_col) - 1, F.lit(0)), F.lit(every_k)
    )
    return df.withColumn("frame_idx", F.explode(idx))

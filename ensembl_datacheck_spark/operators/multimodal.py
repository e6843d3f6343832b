"""Multimodal column plumbing: image/audio/video payloads as opaque
`binary` columns with typed metadata, processed through Arrow-batched
`mapInPandas` stages.

The Spark-side architecture (schemas, partitioning, UDF signatures, batch
shapes) is real and tested; the actual media decode is STUBBED — codec
libraries are not in this container — behind `decoder=` hooks:
`fake_image_decoder` (deterministic hash-based pixels, used in tests) or
`real_decode_stub` (raises NotImplementedError with guidance).

Design for 100 TB: payloads stay in executors end-to-end (binary column
→ Arrow record batches → numpy); feature rows are small and shuffle-
friendly; `repartition` before decode balances skewed file sizes;
`spark.sql.execution.arrow.maxRecordsPerBatch` bounds decode batch
memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, modality string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, "
    "codec:string>"
)

IMAGE_FEATURES_SCHEMA = (
    "media_id string, width int, height int, mean_luma double, "
    "payload_bytes long, sha1 string"
)

FRAME_SAMPLE_SCHEMA = "media_id string, frame_idx int, frame_sha1 string"


def real_decode_stub(payload: bytes, meta) -> np.ndarray:
    """Placeholder for a real image decode (PIL/libjpeg not present in
    this container).  Swap in `PIL.Image.open(io.BytesIO(payload))` on a
    real cluster."""
    raise NotImplementedError(
        "media decode requires an image codec library on the executors; "
        "install pillow/opencv cluster-side and pass a real decoder"
    )


def fake_image_decoder(payload: bytes, meta) -> np.ndarray:
    """Deterministic stand-in decode: pseudo-pixels derived from the
    payload digest, shaped by the metadata — lets every downstream stage
    (resize, luma stats, frame hashing) run for real in tests."""
    w = int(meta["width"] or 8)
    h = int(meta["height"] or 8)
    seed = int.from_bytes(hashlib.sha1(payload).digest()[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w), dtype=np.uint8)


def image_features(
    df: DataFrame,
    decoder: Callable[[bytes, dict], np.ndarray] = fake_image_decoder,
) -> DataFrame:
    """Decode + feature-extract via mapInPandas: batches arrive as Arrow,
    features leave as small rows.  The per-row decode call is inherent to
    media (each payload is one opaque blob); everything around it is
    batch-vectorized."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "width": [], "height": [], "mean_luma": [],
                "payload_bytes": [], "sha1": [],
            }
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                # MEDIA_SCHEMA declares payload/meta nullable: a NULL row
                # yields NULL features (payload_features' contract), not
                # a TypeError that kills the whole stage
                if payload is None or meta is None:
                    for k in ("width", "height", "mean_luma",
                              "payload_bytes", "sha1"):
                        out[k].append(None)
                    continue
                img = decoder(bytes(payload), meta)
                out["width"].append(img.shape[1])
                out["height"].append(img.shape[0])
                out["mean_luma"].append(float(img.mean()))
                out["payload_bytes"].append(len(payload))
                out["sha1"].append(hashlib.sha1(bytes(payload)).hexdigest())
            yield pd.DataFrame(out)

    return df.mapInPandas(extract, schema=IMAGE_FEATURES_SCHEMA)


def resize_images(
    df: DataFrame,
    target: tuple[int, int] = (4, 4),
    decoder: Callable[[bytes, dict], np.ndarray] = fake_image_decoder,
) -> DataFrame:
    """Decode → nearest-neighbor resize → re-encode (raw bytes).  Output
    IS MEDIA_SCHEMA — modality preserved, meta rewritten with the target
    dimensions and codec 'raw' — so stages GENUINELY compose:
    image_features(resize_images(df)) runs (the old output dropped meta
    and modality, so composition crashed with KeyError('meta')).  NULL
    payload/meta rows pass through with NULL payload (nothing to decode;
    the completeness checks own them)."""
    th, tw = target

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                if payload is None or meta is None:
                    payloads.append(None)
                    metas.append(meta)
                    continue
                img = decoder(bytes(payload), meta)
                ys = (np.arange(th) * img.shape[0] // th).clip(0, img.shape[0] - 1)
                xs = (np.arange(tw) * img.shape[1] // tw).clip(0, img.shape[1] - 1)
                payloads.append(img[np.ix_(ys, xs)].tobytes())
                nm = dict(meta)
                nm["width"], nm["height"], nm["codec"] = tw, th, "raw"
                metas.append(nm)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    return df.mapInPandas(do, schema=MEDIA_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling for video rows: emit one row per sampled frame
    (frame bytes stubbed as slices of the payload — the fan-out shape,
    partitioning, and output schema are the real contract; a `decoder`
    hook belongs on the per-frame FEATURE stage, so this one doesn't
    carry a dead parameter).  NULL payload/meta rows emit no frames."""

    def do(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                if payload is None or meta is None:
                    continue
                n_frames = int(meta["n_frames"] or 0)
                raw = bytes(payload)
                for fi in range(0, n_frames, every_n):
                    lo = (fi * len(raw)) // max(n_frames, 1)
                    hi = ((fi + 1) * len(raw)) // max(n_frames, 1)
                    ids.append(mid)
                    idxs.append(fi)
                    hashes.append(hashlib.sha1(raw[lo:hi]).hexdigest())
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame_sha1": hashes}
            )

    return df.filter(F.col("modality") == "video").mapInPandas(
        do, schema=FRAME_SAMPLE_SCHEMA
    )


def gen_media_fixture(spark, n_rows: int = 64, n_partitions: int = 4) -> DataFrame:
    """Deterministic media fixture: payload bytes derived from the id."""
    rows = []
    for i in range(n_rows):
        payload = hashlib.sha256(f"media_{i}".encode()).digest() * (4 + i % 5)
        modality = ["image", "audio", "video"][i % 3]
        rows.append(
            (
                f"media_{i:06d}",
                modality,
                bytearray(payload),
                (16 + i % 8, 8 + i % 4, 16000 if modality == "audio" else None,
                 30 if modality == "video" else None, "fake"),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(n_partitions)


def payload_features(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload"
) -> DataFrame:
    """Portable (oracle-verifiable) feature tier over opaque binary
    payloads: byte length, UTF-8 character count, first code point (−1
    when empty), md5 hex digest — no codec required, so the full
    mapInPandas plumbing (binary column → Arrow batch → feature rows) is
    exercised AND every output value is reproducible by a SQL engine when
    the payload is the UTF-8 encoding of a text column (strlen / length /
    ascii / md5 in DuckDB).

    Robust to arbitrary media blobs: a NULL payload yields NULL features;
    a payload that is not valid UTF-8 (e.g. gen_media_fixture's
    hash-derived bytes) yields NULL n_chars/first_cp while byte length
    and digest are still computed.  The id column keeps its input type
    (the output schema is derived, not hardcoded)."""
    idt = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {idt}, payload_bytes long, n_chars long, first_cp long, "
        "payload_md5 string"
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nbytes, nchars, firsts, digests = [], [], [], [], []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                ids.append(mid)
                if payload is None:
                    nbytes.append(None)
                    nchars.append(None)
                    firsts.append(None)
                    digests.append(None)
                    continue
                raw = bytes(payload)
                nbytes.append(len(raw))
                digests.append(hashlib.md5(raw).hexdigest())
                try:
                    s = raw.decode("utf-8")
                except UnicodeDecodeError:
                    nchars.append(None)
                    firsts.append(None)
                else:
                    nchars.append(len(s))
                    firsts.append(ord(s[0]) if s else -1)
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "payload_bytes": pd.array(nbytes, dtype="Int64"),
                    "n_chars": pd.array(nchars, dtype="Int64"),
                    "first_cp": pd.array(firsts, dtype="Int64"),
                    "payload_md5": digests,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(
        extract, schema=out_schema
    )

"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (SURVEY.md §2.9 / north-star extensions): media lives in a
``binary`` column next to typed metadata; decode / feature-extract run
as Arrow-batched ``mapInPandas`` transforms so each Python worker gets
columnar batches (zero per-row pickling). Codec status by modality:

- AUDIO (round 11) and IMAGE (round 12) are REAL codecs built on the
  stdlib alone — genuine RIFF/WAVE via ``wave`` (synth_wav/decode_wav)
  and genuine PNG via ``zlib``+``struct`` (synth_png/decode_png, full
  chunk/CRC/filter surface) — each with an exact DuckDB oracle over a
  deterministically synthesized signal/image.
- VIDEO (round 12) carries a real CONTAINER layer: uncompressed AVI
  via ``struct`` (synth_avi/_parse_avi/sample_frames_avi — genuine
  RIFF walk, DIB stride/flip semantics, exact oracle). Compressed
  CODEC decode stays honestly stubbed: ffmpeg does not ship here and
  pip is blocked, so ``sample_frames``/``decode_media`` with
  ``fake=False`` raise NotImplementedError at the exact plug point;
  their deterministic fake paths keep the Spark-side contract —
  schema, batch shape, partitioning — fully real and
  differential-testable (md5-derived values, mirrored in DuckDB).

Scale: mapInPandas streams batches (spark.sql.execution.arrow.
maxRecordsPerBatch); payload bytes never hit the driver. For real
media at 100 TB, keep payloads out of shuffle keys and repartition by
a metadata column before decode so batches stay size-bounded.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:
    import pandas as pd

FEATURE_DIM = 8

# media record: payload + typed metadata (the multimodal table shape)
MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("feature", ArrayType(DoubleType())),
    ]
)


def attach_payload(docs: DataFrame) -> DataFrame:
    """Build a media table from `documents`: utf-8 text bytes play the
    opaque payload (the testdata ships no real media)."""
    return docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.lit("image/png"))
        .otherwise(F.lit("audio/wav"))
        .alias("media_type"),
        F.encode("text", "utf-8").cast("binary").alias("payload"),
    )


def _fake_decode(payload: bytes, i: int) -> int:
    """Deterministic 32-bit int from the payload (md5-derived)."""
    h = hashlib.md5(payload + f":{i}".encode()).hexdigest()
    return int(h[:8], 16)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_hash", StringType()),
    ]
)


def sample_frames(df: DataFrame, step: int = 50, fake: bool = True) -> DataFrame:
    """Frame sampling for video payloads: one OUTPUT row per sampled
    frame (the 1-to-N mapInPandas shape — batches out can exceed
    batches in, unlike the row-aligned decode). Frame count and frame
    hashes derive from the payload deterministically in the fake path;
    a real codec plugs in exactly here.
    """
    if not fake:
        raise NotImplementedError(
            "real frame extraction requires a video codec (ffmpeg); "
            "not available in this environment — use fake=True"
        )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids, idxs, hashes = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = _fake_decode(payload, 2) % 240 + 1
                for i in range(0, n_frames, step):
                    ids.append(doc_id)
                    idxs.append(i)
                    hashes.append(
                        hashlib.md5(payload + f":frame:{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_hash": hashes}
            )

    return df.mapInPandas(batches, FRAME_SCHEMA)


def decode_media(df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode payloads to metadata + a FEATURE_DIM-float feature vector.

    ``fake=False`` is the plug-point for a real codec — unavailable in
    this container, so it raises NotImplementedError (by design, not a
    TODO). The fake path is deterministic: width/height/frames and
    features derive from md5(payload), so the DuckDB oracle can mirror
    them exactly.
    """
    if not fake:
        raise NotImplementedError(
            "real media decode requires an image/audio codec (Pillow/ffmpeg); "
            "not available in this environment — use fake=True"
        )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "width": [_fake_decode(p, 0) % 1920 + 1 for p in payloads],
                    "height": [_fake_decode(p, 1) % 1080 + 1 for p in payloads],
                    "n_frames": [_fake_decode(p, 2) % 240 + 1 for p in payloads],
                    "feature": [
                        [_fake_decode(p, 10 + k) / 2**32 for k in range(FEATURE_DIM)]
                        for p in payloads
                    ],
                }
            )

    return df.mapInPandas(batches, DECODED_SCHEMA)


# --- REAL audio codec path (round 11) ------------------------------------
#
# The image/video codecs (Pillow/ffmpeg) stay stubbed — they don't ship
# in this environment — but AUDIO needs only the stdlib: `wave` writes
# and parses real RIFF/WAVE containers. So the audio half of the
# multimodal story is now a genuine codec round-trip: payloads are real
# 16-bit PCM mono WAV bytes (deterministically synthesized, so a DuckDB
# oracle can mirror the EXPECTED signal), and decode runs a real parser
# + numpy feature extraction over the recovered samples. A payload
# mangled anywhere in the binary-column plumbing — or a parser/packing
# bug — breaks the hash.

WAV_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
    ]
)

WAV_DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_samples", IntegerType()),
        StructField("duration_s", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("zcr", DoubleType()),
    ]
)


def _wav_params(doc_id: int) -> tuple[int, int]:
    """(sample_rate, n_samples) — deterministic per doc, mirrored in
    the oracle SQL."""
    return 8000 + (doc_id % 3) * 4000, 256 + (doc_id % 64)


def _wav_sample(doc_id: int, i: int) -> int:
    """Sample i of doc's synthetic signal: a full-range integer hash
    sequence (Knuth multiplicative), exactly expressible in SQL."""
    return ((doc_id * 2654435761 + i * 97) % 65536) - 32768


def _pack_wav(sample_rate: int, samples: list) -> bytes:
    """Pack 16-bit PCM mono samples into a real RIFF/WAVE container
    via the stdlib ``wave`` writer. Shared by synth_wav (synthesized
    corpus) and resample_wav (re-packing converted signals) — one
    pack path, so a format fix can never apply to one and not the
    other."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def _parse_wav(doc_id: int, buf: bytes):
    """Genuine WAV read for the 16-bit-mono subset: stdlib ``wave``
    parse + the channel/width validation, returning (sample_rate,
    int16 numpy sample array). Malformed or out-of-subset payloads
    raise loudly. Shared by decode_wav and resample_wav."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(buf), "rb") as w:
        if w.getnchannels() != 1 or w.getsampwidth() != 2:
            raise ValueError(
                f"doc {doc_id}: expected 16-bit mono PCM, got "
                f"{w.getnchannels()}ch/{w.getsampwidth()*8}-bit"
            )
        sr = w.getframerate()
        n = w.getnframes()
        return sr, np.frombuffer(w.readframes(n), dtype="<i2")


def synth_wav(docs: DataFrame) -> DataFrame:
    """Real RIFF/WAVE payloads (16-bit PCM mono), one per doc_id, via
    ``_pack_wav`` inside an Arrow-batched mapInPandas — the engine
    carries genuine media bytes, not placeholders."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                sr, n = _wav_params(d)
                ids.append(d)
                payloads.append(
                    _pack_wav(sr, [_wav_sample(d, i) for i in range(n)])
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(batches, WAV_SCHEMA)


def decode_wav(media: DataFrame) -> DataFrame:
    """REAL audio decode: parse the binary column with the stdlib
    ``wave`` reader, recover the PCM samples, and extract signal
    features (RMS energy, zero-crossing rate) with numpy. Malformed
    payloads raise loudly — a corrupted media column must never
    produce silent garbage features."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            out = {
                "doc_id": [],
                "sample_rate": [],
                "n_samples": [],
                "duration_s": [],
                "rms": [],
                "zcr": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                import numpy as np

                sr, raw = _parse_wav(int(doc_id), bytes(payload))
                n = len(raw)
                pcm = raw.astype(np.int64)
                # integer-exact sum of squares, then one double divide +
                # IEEE sqrt: bit-identical to the SQL mirror (math.sqrt
                # is correctly rounded; `** 0.5` via C pow is not
                # guaranteed to be)
                import math

                rms = math.sqrt(int((pcm * pcm).sum()) / n)
                zcr = float(int((pcm[1:] * pcm[:-1] < 0).sum())) / (n - 1)
                out["doc_id"].append(int(doc_id))
                out["sample_rate"].append(sr)
                out["n_samples"].append(n)
                out["duration_s"].append(round(n / sr, 6))
                out["rms"].append(round(rms, 6))
                out["zcr"].append(round(zcr, 6))
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, WAV_DECODED_SCHEMA)

# --- REAL image codec path (round 12) -------------------------------------
#
# PNG is deflate + per-scanline byte filters — both implementable with
# the stdlib alone (`zlib` + `struct`), so the IMAGE half of the
# multimodal story follows the round-11 audio win: payloads are real
# PNG containers (8-bit grayscale, chunked IHDR/IDAT/IEND with genuine
# CRC32s, ALL FIVE scanline filter types exercised by the encoder),
# and decode runs a genuine parser — signature check, chunk walk with
# CRC verification, multi-IDAT concatenation, inflate, full
# None/Sub/Up/Average/Paeth unfiltering — before numpy feature
# extraction over the recovered pixel matrix. The pixel field derives
# from an integer-hash formula expressible in SQL, so a DuckDB oracle
# recomputes the EXPECTED image and its features exactly: a byte
# mangled anywhere in the binary plumbing, a filter mis-applied on
# either side, a CRC slip, or an IDAT split bug breaks the hash.
# Video stays honestly stubbed — ffmpeg genuinely can't be had here.

PNG_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
    ]
)

PNG_DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        # integer numerators, not rounded fractions: mean luminance is
        # lum_sum/(w*h) and bright fraction is bright_px/(w*h), but
        # k/(w*h) hits an EXACT 6-decimal tie when w*h = 128 and k is
        # odd, where Python round() (half-even) and SQL ROUND (half
        # away from zero) disagree — emitting the raw counts keeps the
        # features hash-stable under any rounding convention.
        StructField("lum_sum", LongType()),
        StructField("bright_px", LongType()),
        StructField("px_checksum", LongType()),
    ]
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_params(doc_id: int) -> tuple[int, int]:
    """(width, height) — deterministic per doc, mirrored in the
    oracle SQL."""
    return 4 + (doc_id % 13), 3 + (doc_id % 11)


def _png_pixel(doc_id: int, x: int, y: int) -> int:
    """Grayscale value of pixel (x, y): an integer-hash field exactly
    expressible in SQL (no intermediate exceeds int64)."""
    return (doc_id * 2654435761 + y * 131 + x * 17) % 256


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def _paeth(a: int, b: int, c: int) -> int:
    """PNG Paeth predictor (left, up, up-left)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _encode_gray_png(rows: list) -> bytes:
    """Encode a pixel matrix (list of equal-length rows of 0..255
    ints) as a genuine 8-bit grayscale PNG. Scanline y is filtered
    with type y % 5 — every PNG filter (None/Sub/Up/Average/Paeth)
    appears in any image of 5+ rows, so the decoder's whole unfilter
    surface is live, not just the trivial row. The compressed stream
    is split across TWO IDAT chunks when it's big enough —
    multi-IDAT concatenation is part of the format, and a decoder
    that reads only the first chunk must fail the oracle. Shared by
    synth_png (formula-synthesized corpus) and resize_png
    (re-encoding real thumbnails)."""
    import struct
    import zlib

    h, w = len(rows), len(rows[0])
    prior = [0] * w
    raw = bytearray()
    for y in range(h):
        row = [int(v) for v in rows[y]]
        ft = y % 5
        raw.append(ft)
        for x in range(w):
            left = row[x - 1] if x else 0
            up = prior[x]
            ul = prior[x - 1] if x else 0
            if ft == 0:
                v = row[x]
            elif ft == 1:
                v = row[x] - left
            elif ft == 2:
                v = row[x] - up
            elif ft == 3:
                v = row[x] - (left + up) // 2
            else:
                v = row[x] - _paeth(left, up, ul)
            raw.append(v & 0xFF)
        prior = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    comp = zlib.compress(bytes(raw), 6)
    mid = len(comp) // 2 if len(comp) >= 32 else len(comp)
    idats = _png_chunk(b"IDAT", comp[:mid])
    if mid < len(comp):
        idats += _png_chunk(b"IDAT", comp[mid:])
    return _PNG_SIG + _png_chunk(b"IHDR", ihdr) + idats + _png_chunk(b"IEND", b"")


def synth_png(docs: DataFrame) -> DataFrame:
    """Real PNG payloads (8-bit grayscale), one per doc_id, built with
    stdlib ``zlib``/``struct`` inside an Arrow-batched mapInPandas
    (see ``_encode_gray_png`` for the filter/IDAT coverage story)."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids, payloads = [], []
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w, h = _png_params(d)
                ids.append(d)
                payloads.append(
                    _encode_gray_png(
                        [
                            [_png_pixel(d, x, y) for x in range(w)]
                            for y in range(h)
                        ]
                    )
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return docs.select("doc_id").mapInPandas(batches, PNG_SCHEMA)


def _parse_gray_png(doc_id: int, buf: bytes):
    """Genuine PNG reader for the 8-bit grayscale subset: signature,
    chunk walk with CRC32 verification, IHDR validation, multi-IDAT
    concatenation, zlib inflate, and full scanline unfiltering (all
    five filter types). Returns (width, height, int64 pixel matrix);
    malformed payloads raise loudly. Shared by decode_png and
    resize_png."""
    import struct
    import zlib

    import numpy as np

    if buf[:8] != _PNG_SIG:
        raise ValueError(f"doc {doc_id}: not a PNG (bad signature)")
    pos, ihdr, idat, ended = 8, None, bytearray(), False
    while pos < len(buf):
        # bounds-check BEFORE unpacking: a buffer cut mid-chunk must
        # raise the documented 'truncated PNG' diagnosis, not a bare
        # struct.error / opaque CRC failure
        if pos + 8 > len(buf):
            raise ValueError(f"doc {doc_id}: truncated PNG")
        (ln,) = struct.unpack(">I", buf[pos : pos + 4])
        if pos + 12 + ln > len(buf):
            raise ValueError(f"doc {doc_id}: truncated PNG")
        ctype = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", buf[pos + 8 + ln : pos + 12 + ln])
        if zlib.crc32(ctype + data) != crc:
            raise ValueError(f"doc {doc_id}: CRC mismatch in {ctype!r} chunk")
        pos += 12 + ln
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            ended = True
            break
    if ihdr is None or not ended:
        raise ValueError(f"doc {doc_id}: truncated PNG")
    if pos != len(buf):
        raise ValueError(
            f"doc {doc_id}: {len(buf) - pos} trailing bytes after IEND"
        )
    w, h, depth, ctype_i, comp, filt, interlace = ihdr
    if (depth, ctype_i, comp, filt, interlace) != (8, 0, 0, 0, 0):
        raise ValueError(
            f"doc {doc_id}: unsupported PNG variant "
            f"(depth={depth} color={ctype_i} interlace={interlace})"
        )
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (w + 1):
        raise ValueError(
            f"doc {doc_id}: inflate length {len(raw)} != {h*(w+1)}"
        )
    px = np.zeros((h, w), dtype=np.int64)
    prior = np.zeros(w, dtype=np.int64)
    for y in range(h):
        line = raw[y * (w + 1) : (y + 1) * (w + 1)]
        ft, vals = line[0], list(line[1:])
        row = [0] * w
        for x in range(w):
            left = row[x - 1] if x else 0
            up = int(prior[x])
            ul = int(prior[x - 1]) if x else 0
            if ft == 0:
                v = vals[x]
            elif ft == 1:
                v = vals[x] + left
            elif ft == 2:
                v = vals[x] + up
            elif ft == 3:
                v = vals[x] + (left + up) // 2
            elif ft == 4:
                v = vals[x] + _paeth(left, up, ul)
            else:
                raise ValueError(f"doc {doc_id}: unknown filter type {ft}")
            row[x] = v & 0xFF
        px[y] = row
        prior = px[y]
    return w, h, px


def resize_png(media: DataFrame, tw: int, th: int) -> DataFrame:
    """REAL image resize — the thumbnail op of a multimodal training
    pipeline, end to end through genuine codecs: each payload is
    PARSED (full CRC/filter surface), nearest-neighbor resampled to
    (tw, th) — source pixel (floor(x*w/tw), floor(y*h/th)), both
    down- and up-sampling — and RE-ENCODED as a real PNG, so the
    output column carries valid thumbnail containers, not feature
    rows. Runs as an Arrow-batched mapInPandas; payload bytes never
    leave the executors. The sampling rule is integer-exact, so a
    DuckDB oracle can recompute the expected thumbnail from the
    synthesized corpus formula — decode(resize(synth)) pins BOTH
    codec directions and the resampler in one hash."""
    if tw < 1 or th < 1:
        raise ValueError(f"resize target must be >= 1x1, got {tw}x{th}")

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            ids, payloads = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                d = int(doc_id)
                w, h, px = _parse_gray_png(d, bytes(payload))
                sx = (np.arange(tw, dtype=np.int64) * w) // tw
                sy = (np.arange(th, dtype=np.int64) * h) // th
                thumb = px[np.ix_(sy, sx)]
                ids.append(d)
                payloads.append(_encode_gray_png(thumb.tolist()))
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return media.mapInPandas(batches, PNG_SCHEMA)


def decode_png(media: DataFrame) -> DataFrame:
    """REAL image decode: parse the binary column with the genuine PNG
    reader (``_parse_gray_png``) then extract features from the
    recovered pixel matrix with numpy: luminance sum, bright-pixel
    count (integer numerators — see PNG_DECODED_SCHEMA for why raw
    counts beat rounded fractions), and a POSITION-WEIGHTED checksum
    (sum of pixel * (y*w + x + 1)) that pins every pixel to its
    exact location.
    Malformed payloads raise loudly — a corrupted media column must
    never produce silent garbage features."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        parse = _parse_gray_png
        for pdf in it:
            out = {
                "doc_id": [],
                "width": [],
                "height": [],
                "lum_sum": [],
                "bright_px": [],
                "px_checksum": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, px = parse(int(doc_id), bytes(payload))
                n = w * h
                weights = np.arange(1, n + 1, dtype=np.int64)
                flat = px.reshape(-1)
                out["doc_id"].append(int(doc_id))
                out["width"].append(w)
                out["height"].append(h)
                out["lum_sum"].append(int(flat.sum()))
                out["bright_px"].append(int((flat >= 128).sum()))
                out["px_checksum"].append(int((flat * weights).sum()))
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, PNG_DECODED_SCHEMA)


def resample_wav(media: DataFrame, target_rate: int) -> DataFrame:
    """REAL audio resample — the sample-rate-conversion op of a
    multimodal training pipeline, end to end through genuine codecs:
    each payload is PARSED with the stdlib ``wave`` reader,
    nearest-neighbor resampled to ``target_rate`` — output length
    floor(n * R / sr), output sample i taken from source index
    floor(i * sr / R), so 8 kHz docs upsample 2x (duplication) and
    16 kHz docs pass through identity — and RE-ENCODED as a real
    16-bit PCM mono WAV at the new rate, so the output column carries
    valid audio containers. Arrow-batched mapInPandas; the sampling
    rule is integer-exact, so a DuckDB oracle recomputes the expected
    resampled signal from the corpus formula —
    decode(resample(synth)) pins BOTH codec directions and the
    resampler in one hash."""
    if target_rate < 1:
        raise ValueError(f"target_rate must be >= 1, got {target_rate}")

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            ids, payloads = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                d = int(doc_id)
                sr, pcm = _parse_wav(d, bytes(payload))
                n = len(pcm)
                n_out = (n * target_rate) // sr
                idx = (
                    np.arange(n_out, dtype=np.int64) * sr
                ) // target_rate
                ids.append(d)
                payloads.append(
                    _pack_wav(target_rate, pcm[idx].tolist())
                )
            yield pd.DataFrame({"doc_id": ids, "payload": payloads})

    return media.mapInPandas(batches, WAV_SCHEMA)


# --- REAL video container path (round 12) ---------------------------------
#
# A video CODEC (H.264 etc.) genuinely cannot be had here — no ffmpeg,
# pip blocked — but a video CONTAINER needs none: uncompressed AVI is
# RIFF chunks + raw DIB frames, all `struct`. So the frame-sampling op
# (the §2.9 'frame-sample' bullet) gets the same treatment audio and
# image got: payloads are genuine AVI files (RIFF/LIST walk, real avih/
# strh/strf headers, 8-bit DIB frames with the format's ACTUAL quirks —
# 4-byte row stride padding, bottom-up row order, 256-entry grayscale
# palette), and sampling runs a genuine parser. Compressed-codec decode
# stays honestly out of reach; the container layer — which is what
# frame EXTRACTION actually exercises — is real.

AVI_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
    ]
)

AVI_FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        # integer numerator (ADVICE r13): lum_sum = SUM(pixel) as
        # BIGINT instead of ROUND(mean, 6) — the rounded mean was the
        # same Python half-even vs SQL half-away 6-decimal tie hazard
        # the PNG decode/resize entries migrated off in round 13;
        # mean_lum stays derivable as lum_sum / (w*h)
        StructField("lum_sum", LongType()),
        StructField("px_checksum", LongType()),
    ]
)


def _avi_params(doc_id: int) -> tuple[int, int, int]:
    """(width, height, n_frames) — deterministic per doc, mirrored in
    the oracle SQL. Width 5..9 guarantees the DIB stride-padding path
    is live (stride 8 or 12 != width for most docs)."""
    return 5 + (doc_id % 5), 3 + (doc_id % 4), 4 + (doc_id % 9)


def _avi_pixel(doc_id: int, f: int, x: int, y: int) -> int:
    """Grayscale value of pixel (x, y) in frame f — an integer-hash
    field exactly expressible in SQL."""
    return (doc_id * 2654435761 + f * 509 + y * 131 + x * 17) % 256


def _encode_avi(doc_id: int) -> bytes:
    """Encode one doc's synthetic frames as a genuine uncompressed
    AVI: a real RIFF container — avih main header, a 'vids/DIB '
    stream with BITMAPINFOHEADER + 256-entry grayscale palette, and
    one '00db' chunk per frame holding the raw 8-bit DIB with the
    format's real semantics (rows padded to 4-byte stride, stored
    BOTTOM-UP), plus an idx1 index."""
    import struct

    w, h, n = _avi_params(doc_id)
    stride = ((w + 3) // 4) * 4
    frames = []
    for f in range(n):
        dib = bytearray()
        for y in range(h - 1, -1, -1):  # bottom-up, the DIB rule
            row = bytes(
                _avi_pixel(doc_id, f, x, y) for x in range(w)
            ) + b"\x00" * (stride - w)
            dib.extend(row)
        frames.append(bytes(dib))

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) % 2 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(four: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", four + data)

    frame_bytes = stride * h
    avih = struct.pack(
        "<14I",
        40000,  # usec/frame (25 fps)
        frame_bytes * 25,
        0,
        0x10,  # AVIF_HASINDEX
        n,
        0,
        1,
        frame_bytes,
        w,
        h,
        0, 0, 0, 0,
    )
    # AVISTREAMHEADER field order: ...dwSuggestedBufferSize,
    # dwQuality, dwSampleSize, rcFrame. dwSampleSize MUST be 0 for
    # video (one frame per chunk — a standards-conforming reader uses
    # it to map chunks to samples); quality -1 = driver default.
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, 25, 0, n,
        frame_bytes, 0xFFFFFFFF, 0, 0, 0, w, h,
    )
    bmih = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 0, frame_bytes, 0, 0, 256, 256
    )
    palette = b"".join(
        struct.pack("<BBBB", i, i, i, 0) for i in range(256)
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", bmih + palette)),
    )
    # idx1 entries carry REAL movi-relative chunk offsets (the
    # convention: offset of each chunk header from the 'movi' fourcc,
    # so the first chunk sits at 4) — AVIF_HASINDEX is advertised, so
    # an index-trusting reader must be able to seek by these
    movi_chunks, idx_entries, off = [], [], 4
    for fr in frames:
        c = chunk(b"00db", fr)
        movi_chunks.append(c)
        idx_entries.append(
            struct.pack("<4sIII", b"00db", 0x10, off, len(fr))
        )
        off += len(c)
    movi = lst(b"movi", b"".join(movi_chunks))
    idx = chunk(b"idx1", b"".join(idx_entries))
    body = b"AVI " + hdrl + movi + idx
    return b"RIFF" + struct.pack("<I", len(body)) + body

def synth_avi(docs: DataFrame) -> DataFrame:
    """Real uncompressed-AVI payloads, one per doc_id, built with
    ``_encode_avi`` inside an Arrow-batched mapInPandas — genuine
    RIFF containers with raw DIB frames, not placeholders."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            ids = [int(d) for d in pdf["doc_id"]]
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [_encode_avi(d) for d in ids]}
            )

    return docs.select("doc_id").mapInPandas(batches, AVI_SCHEMA)



def _parse_avi(doc_id: int, buf: bytes):
    """Genuine RIFF/AVI reader for the uncompressed 8-bit DIB subset:
    validates the RIFF signature, walks LIST/chunk structure, reads
    the stream format (BITMAPINFOHEADER), collects '00db' frame
    chunks, and un-pads/flips each bottom-up DIB into a top-down
    pixel matrix. Returns (width, height, [frame matrices]);
    malformed containers raise loudly."""
    import struct

    import numpy as np

    if buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError(f"doc {doc_id}: not a RIFF/AVI container")
    (riff_len,) = struct.unpack("<I", buf[4:8])
    if riff_len + 8 != len(buf):
        raise ValueError(
            f"doc {doc_id}: RIFF length {riff_len + 8} != {len(buf)}"
        )

    def walk(data: bytes):
        pos = 0
        while pos + 8 <= len(data):
            fourcc = data[pos : pos + 4]
            (ln,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body = data[pos + 8 : pos + 8 + ln]
            yield fourcc, body
            pos += 8 + ln + (ln % 2)

    w = h = bits = None
    frames_raw: list[bytes] = []
    frame_offsets: list[tuple] = []
    declared = None
    for fourcc, body in walk(buf[12:]):
        if fourcc != b"LIST":
            continue
        kind, inner = body[:4], body[4:]
        if kind == b"hdrl":
            for c2, b2 in walk(inner):
                if c2 == b"avih":
                    declared = struct.unpack("<14I", b2[:56])[4]
                elif c2 == b"LIST" and b2[:4] == b"strl":
                    for c3, b3 in walk(b2[4:]):
                        if c3 == b"strf":
                            (_sz, w, h, _planes, bits) = struct.unpack(
                                "<IiiHH", b3[:16]
                            )
        elif kind == b"movi":
            pos = 4  # movi-relative offset of the first chunk header
            for c2, b2 in walk(inner):
                if c2 == b"00db":
                    frames_raw.append(b2)
                    frame_offsets.append((pos, len(b2)))
                pos += 8 + len(b2) + (len(b2) % 2)
    # idx1 cross-check (the container advertises AVIF_HASINDEX): the
    # index's movi-relative offsets/sizes must agree with where the
    # chunks actually sit — a stale or zeroed index is the class of
    # defect nothing else reads, so verify it here rather than let a
    # seek-by-index consumer discover it
    for fourcc, body in walk(buf[12:]):
        if fourcc != b"idx1":
            continue
        entries = [
            struct.unpack("<4sIII", body[k : k + 16])
            for k in range(0, len(body) - len(body) % 16, 16)
        ]
        db = [(off, ln) for cc, _fl, off, ln in entries if cc == b"00db"]
        if db != frame_offsets:
            raise ValueError(
                f"doc {doc_id}: idx1 disagrees with movi layout "
                f"({len(db)} index entries vs {len(frame_offsets)} "
                "frames, or offsets/sizes drifted)"
            )
    if w is None or not frames_raw:
        raise ValueError(f"doc {doc_id}: no stream format or frames")
    if bits != 8 or h <= 0:
        raise ValueError(
            f"doc {doc_id}: unsupported DIB ({bits}-bit, height {h})"
        )
    if declared is not None and declared != len(frames_raw):
        raise ValueError(
            f"doc {doc_id}: avih declares {declared} frames, "
            f"movi holds {len(frames_raw)}"
        )
    stride = ((w + 3) // 4) * 4
    out = []
    for i, raw in enumerate(frames_raw):
        if len(raw) != stride * h:
            raise ValueError(
                f"doc {doc_id}: frame {i} is {len(raw)} bytes, "
                f"expected {stride * h}"
            )
        m = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride)[:, :w]
        out.append(m[::-1].astype(np.int64))  # bottom-up -> top-down
    return w, h, out


def sample_frames_avi(media: DataFrame, step: int = 3) -> DataFrame:
    """REAL frame sampling: parse the AVI container, take every
    ``step``-th frame, and emit one OUTPUT row per sampled frame
    (the 1-to-N mapInPandas shape) with its mean luminance and
    position-weighted pixel checksum. This upgrades sample_frames'
    fake path to a genuine container parse — the compressed-codec
    half stays honestly stubbed (no ffmpeg)."""
    if step < 1:
        raise ValueError(f"step must be >= 1, got {step}")

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = {
                "doc_id": [],
                "frame_idx": [],
                "lum_sum": [],
                "px_checksum": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                d = int(doc_id)
                w, h, frames = _parse_avi(d, bytes(payload))
                n = w * h
                weights = np.arange(1, n + 1, dtype=np.int64)
                for f in range(0, len(frames), step):
                    flat = frames[f].reshape(-1)
                    out["doc_id"].append(d)
                    out["frame_idx"].append(f)
                    out["lum_sum"].append(int(flat.sum()))
                    out["px_checksum"].append(int((flat * weights).sum()))
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, AVI_FRAME_SCHEMA)

"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata, processed through Arrow-batched ``mapInPandas``.

There is no multimodal data in the reference (an ODK pipeline skips
media at extraction — odk-form-extraction/R/utils.R:28-42 exports
with media omitted); this module is the scale-pack pattern a
training-data pipeline needs:

- payloads are ``BinaryType`` columns + a metadata struct (mime,
  n_bytes) — never parsed by Catalyst, shuffled as opaque bytes;
- decode / feature-extraction runs in ``mapInPandas`` so each Python
  batch sees a bounded slice (no row-at-a-time UDF, no whole-column
  collect);
- ``decode_media`` parses the three dependency-free container formats
  (BMP image headers, RIFF/WAV audio, and — round 13 — PNG via the
  stdlib ``zlib``: full IDAT inflate + scanline filter reconstruction
  for 8-bit gray/RGB/RGBA, no codec library needed); remaining
  compressed formats (JPEG/MP4/…) still need a real codec at
  deployment and return ``valid=False`` here, with the plumbing
  (schema, batching, partitioning) unchanged when one is plugged in;
- ``synthesize_media`` builds real BMP/WAV payloads deterministically
  from the row id, so the synthesize→parse round trip is checkable
  against an arithmetic oracle.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, BooleanType, DoubleType, IntegerType, LongType,
    StringType, StructField, StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("first_byte", IntegerType()),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive a deterministic binary payload + metadata struct from a
    text column (stand-in for reading real media bytes): payload =
    unhex(md5(text)) (16 bytes), metadata = (mime, n_bytes)."""
    payload = F.unhex(F.md5(F.col(text_col)))
    return df.withColumn("payload", payload).withColumn(
        "media_meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(payload).alias("n_bytes"),
        ),
    )


#: columns produced by decode_media / decode_media_features
DECODE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("bpp", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_channels", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("valid", BooleanType()),
    ]
)

_NO_MEDIA = {
    "format": None, "width": None, "height": None, "bpp": None,
    "sample_rate": None, "n_channels": None, "n_frames": None, "valid": False,
}


def decode_media(payload: bytes, mime: str | None = None) -> dict:
    """Decode a media payload's container metadata — real parsing for
    the two dependency-free formats:

    - **BMP** (``BM`` magic, BITMAPINFOHEADER): width / height / bpp.
    - **PNG** (``\\x89PNG`` magic, IHDR chunk): width / height / bpp
      (= bit depth x channels); pixel access via :func:`_png_pixels`
      (stdlib zlib inflate + filter reconstruction — no codec lib).
    - **WAV** (``RIFF``/``WAVE``): sample_rate / n_channels / n_frames
      from a proper chunk walk (tolerates extra chunks before fmt/data).

    Anything else (JPEG/MP4/… need codec libraries this container
    lacks) returns ``valid=False`` with null fields — the deployment
    hook is to extend this function; the Spark plumbing
    (:func:`decode_media_features`) is format-agnostic.
    """
    out = dict(_NO_MEDIA)
    if payload is None or len(payload) < 12:
        return out
    if payload[:8] == _PNG_MAGIC and len(payload) >= 33:
        # IHDR is required to be the first chunk (8-byte magic,
        # 4-byte length, 4-byte type, then 13 data bytes)
        if payload[12:16] == b"IHDR":
            width, height = struct.unpack_from(">ii", payload, 16)
            depth, ctype = payload[24], payload[25]
            channels = _PNG_CHANNELS.get(ctype)
            if channels and width > 0 and height > 0:
                out.update(
                    format="png",
                    width=width,
                    height=height,
                    bpp=depth * channels,
                    valid=True,
                )
        return out
    if payload[:2] == b"BM" and len(payload) >= 54:
        width, height = struct.unpack_from("<ii", payload, 18)
        bpp = struct.unpack_from("<H", payload, 28)[0]
        out.update(
            format="bmp", width=width, height=abs(height), bpp=bpp, valid=True
        )
        return out
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        rate = channels = bits = data_size = None
        pos = 12
        while pos + 8 <= len(payload):
            cid = payload[pos : pos + 4]
            size = struct.unpack_from("<I", payload, pos + 4)[0]
            if cid == b"fmt " and pos + 24 <= len(payload):
                channels, rate = struct.unpack_from("<HI", payload, pos + 10)
                if pos + 24 + 2 <= len(payload):
                    bits = struct.unpack_from("<H", payload, pos + 22)[0]
            elif cid == b"data":
                data_size = size
            pos += 8 + size + (size % 2)  # RIFF chunks are word-aligned
        if rate and channels and bits and data_size is not None:
            frame_bytes = channels * (bits // 8)
            out.update(
                format="wav",
                sample_rate=rate,
                n_channels=channels,
                n_frames=data_size // frame_bytes if frame_bytes else 0,
                valid=True,
            )
        return out
    return out


# -- deterministic synthesizers (test/demo payloads; REAL container bytes) --


def synth_bmp(width: int, height: int, bpp: int = 24) -> bytes:
    """A minimal valid BMP: 54-byte header + zeroed 24-bit pixel rows
    (each row padded to a 4-byte boundary, per the format)."""
    row = width * (bpp // 8)
    row_padded = (row + 3) & ~3
    pixels = height * row_padded
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + pixels, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, bpp, 0, pixels, 2835, 2835, 0, 0)
    )
    return header + b"\x00" * pixels


def synth_wav(sample_rate: int, n_channels: int, n_frames: int, bits: int = 16) -> bytes:
    """A minimal valid PCM WAV: RIFF + fmt + zeroed data chunk."""
    frame_bytes = n_channels * (bits // 8)
    data = n_frames * frame_bytes
    return (
        b"RIFF"
        + struct.pack("<I", 36 + data)
        + b"WAVEfmt "
        + struct.pack(
            "<IHHIIHH", 16, 1, n_channels, sample_rate,
            sample_rate * frame_bytes, frame_bytes, bits,
        )
        + b"data"
        + struct.pack("<I", data)
        + b"\x00" * data
    )


def media_schema(id_col: str = "doc_id") -> StructType:
    return StructType(
        [
            StructField(id_col, LongType()),
            StructField("payload", BinaryType()),
            StructField("mime", StringType()),
        ]
    )


#: default-named instance kept for callers that reference the constant
MEDIA_SCHEMA = media_schema()


def synthesize_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a real BMP (even ids) or WAV (odd ids) payload whose
    parameters are pure functions of the id — so a SQL oracle can
    predict exactly what :func:`decode_media` must parse back out:

    - even id → BMP, width = id%31+1, height = id%17+1, bpp = 24
    - odd id  → WAV, rate = 8000 + (id%4)*4000,
      channels = (id//2)%2 + 1, frames = id%50 + 1
    """

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            payloads = [
                synth_bmp(int(i) % 31 + 1, int(i) % 17 + 1)
                if int(i) % 2 == 0
                else synth_wav(8000 + int(i) % 4 * 4000, (int(i) // 2) % 2 + 1, int(i) % 50 + 1)
                for i in ids
            ]
            mimes = ["image/bmp" if int(i) % 2 == 0 else "audio/wav" for i in ids]
            yield pd.DataFrame({id_col: ids, "payload": payloads, "mime": mimes})

    return df.select(F.col(id_col)).mapInPandas(synth, schema=media_schema(id_col))


def decode_media_features(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Arrow-batched container-metadata decode via ``mapInPandas``:
    one output row per input row, schema :data:`DECODE_SCHEMA` (with
    its id field named ``id_col``). The per-row Python call is
    inherent (byte parsing IS the operator); Arrow batching keeps
    transfer vectorized and memory bounded."""
    schema = StructType(
        [StructField(id_col, LongType())] + DECODE_SCHEMA.fields[1:]
    )

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [decode_media(p) for p in pdf[payload_col]]
            out = pd.DataFrame(rows)
            out.insert(0, id_col, pdf[id_col].astype("int64").values)
            yield out[[f.name for f in schema.fields]]

    return df.mapInPandas(dec, schema=schema)


def extract_binary_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Arrow-batched byte-level featurization via ``mapInPandas`` —
    the real plumbing a decode step plugs into. Emits one row per
    input row: (doc_id, mime, n_bytes, first_byte)."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "mime": pdf["media_meta"].map(lambda m: m["mime"]),
                    "n_bytes": payloads.map(len).astype("int32"),
                    "first_byte": payloads.map(lambda b: b[0] if len(b) else -1).astype(
                        "int32"
                    ),
                }
            )

    return df.mapInPandas(featurize, schema=FEATURE_SCHEMA)


# -- frame sequences ("video" plumbing: real container math, no codecs) --

#: FSEQ reel: b"FSEQ" + uint32 frame count, then length-prefixed REAL
#: BMP frames (uint32 size + bytes). An honest stand-in for video at
#: the metadata/plumbing level: frame extraction, stride sampling and
#: per-frame decode are all real; only the codec is out of scope here
#: (same deployment hook as decode_media).
_FSEQ_MAGIC = b"FSEQ"


def synth_frameseq(n_frames: int, width: int, height: int) -> bytes:
    """Deterministic multi-frame reel: each frame is a genuine BMP
    whose FIRST PIXEL encodes the frame index (blue channel), so a
    sampler's output is verifiable frame-by-frame."""
    if n_frames < 1 or width < 1 or height < 1:
        raise ValueError("synth_frameseq needs n_frames, width, height >= 1")
    out = [_FSEQ_MAGIC, struct.pack("<I", n_frames)]
    for i in range(n_frames):
        frame = bytearray(synth_bmp(width, height))
        frame[54] = i % 256  # first pixel, blue byte
        out.append(struct.pack("<I", len(frame)))
        out.append(bytes(frame))
    return b"".join(out)


def iter_frames(payload: bytes):
    """Yield (frame_index, frame_bytes) from an FSEQ reel; empty for
    anything that is not one (format-dispatch mirror of decode_media)."""
    if payload is None or payload[:4] != _FSEQ_MAGIC or len(payload) < 8:
        return
    n = struct.unpack_from("<I", payload, 4)[0]
    pos = 8
    for i in range(n):
        if pos + 4 > len(payload):
            return
        size = struct.unpack_from("<I", payload, pos)[0]
        pos += 4
        if pos + size > len(payload):
            return
        yield i, payload[pos : pos + size]
        pos += size


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("frame_tag", IntegerType()),
        StructField("frame_bytes", IntegerType()),
    ]
)


def sample_frames(
    df: DataFrame,
    every_n: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Stride-sample frames from FSEQ reels: one output row per kept
    frame (index % every_n == 0) with the frame's DECODED header
    metadata and its index tag read back from the pixel data — the
    frame-sampling plumbing of a video pipeline, Arrow-batched via
    ``mapInPandas`` (scan-local; sampling happens before any frame
    bytes would be shipped to a feature extractor).

    Non-FSEQ payloads contribute zero rows (same quiet-skip contract
    as decode_media's valid=False).
    """
    if every_n < 1:
        raise ValueError(f"every_n must be >= 1, got {every_n}")

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                for i, frame in iter_frames(payload):
                    if i % every_n:
                        continue
                    meta = decode_media(frame)
                    # quiet-skip contract: only BMP frames large enough
                    # to carry the pixel tag produce rows (a 54-byte
                    # zero-area BMP decodes valid but has no pixels)
                    if not meta["valid"] or meta["format"] != "bmp" or len(frame) <= 54:
                        continue
                    rows.append(
                        (
                            int(doc_id),
                            i,
                            meta["width"],
                            meta["height"],
                            frame[54],
                            len(frame),
                        )
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.mapInPandas(sample, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Audio DSP: real signal features (numpy FFT), not just container
# metadata. The decode boundary stays honest — only PCM WAV is parsed
# (the one format this container can read without codec libraries) —
# but past that boundary the features are genuine spectral analysis,
# the kind an audio-training pipeline computes corpus-wide.
# ---------------------------------------------------------------------------


def synth_wav_tone(
    sample_rate: int, n_frames: int, freq_hz: float, amplitude: float = 0.5
) -> bytes:
    """A real mono 16-bit PCM WAV containing a sine tone — the
    deterministic test/demo payload for the DSP path (synth_wav above
    produces silence; a spectrum of zeros proves nothing)."""
    import numpy as np

    t = np.arange(n_frames, dtype=np.float64) / sample_rate
    samples = (amplitude * 32767.0 * np.sin(2 * np.pi * freq_hz * t)).astype("<i2")
    data = samples.tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack(
            "<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
        )
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def _wav_pcm16(payload: bytes):
    """(sample_rate, mono float64 samples in [-1, 1)) from a 16-bit
    PCM WAV, or None. Stereo averages to mono. The chunk walk lives in
    :func:`_wav_pcm16_raw` (single parser for every decode path —
    review finding); this is its normalized mono-float view."""
    import numpy as np

    parsed = _wav_pcm16_raw(payload)
    if parsed is None:
        return None
    rate, channels, frames = parsed
    samples = frames.astype(np.float64)
    samples = samples.mean(axis=1) if channels > 1 else samples[:, 0]
    return rate, samples / 32768.0


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("valid", BooleanType()),
        StructField("sample_rate", IntegerType()),
        StructField("n_frames", LongType()),
        StructField("dominant_hz", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("band_energy", ArrayType(DoubleType())),
    ]
)


def audio_band_energies(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    n_fft: int = 256,
    n_bands: int = 8,
) -> DataFrame:
    """Spectral features per audio document: average magnitude
    spectrum over ``n_fft``-sample windows (numpy rfft), folded into
    ``n_bands`` equal frequency bands, plus the dominant frequency
    (argmax bin, DC excluded) and overall RMS. Non-WAV / non-PCM16
    payloads yield ``valid=False`` rows with null features.

    Plan shape: mapInPandas — Arrow-batched, one output row per input
    row, no shuffle; at 100 TB this runs scan-side wherever the
    payloads live. numpy's rfft over a [n_windows, n_fft] matrix is
    the vectorized hot loop; window count is capped by the payload
    size itself (audio seconds, not corpus size).
    """
    import numpy as np

    schema = StructType(
        [StructField(id_col, LongType())] + AUDIO_FEATURE_SCHEMA.fields[1:]
    )
    empty = {
        "valid": False, "sample_rate": None, "n_frames": None,
        "dominant_hz": None, "rms": None, "band_energy": None,
    }

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for payload in pdf[payload_col]:
                parsed = _wav_pcm16(payload)
                if parsed is None:
                    rows.append(dict(empty))
                    continue
                rate, x = parsed
                n = len(x)
                if n == 0:
                    rows.append(dict(empty))
                    continue
                n_win = max(1, n // n_fft)
                pad = n_win * n_fft - n
                xw = np.pad(x[: n_win * n_fft], (0, max(0, pad)))
                mags = np.abs(np.fft.rfft(xw.reshape(n_win, n_fft), axis=1)).mean(axis=0)
                dom_bin = int(np.argmax(mags[1:])) + 1  # exclude DC
                bins_per_band = len(mags) // n_bands
                bands = [
                    float(mags[b * bins_per_band : (b + 1) * bins_per_band].mean())
                    for b in range(n_bands)
                ]
                rows.append(
                    {
                        "valid": True,
                        "sample_rate": int(rate),
                        "n_frames": int(n),
                        "dominant_hz": dom_bin * rate / n_fft,
                        "rms": float(np.sqrt(np.mean(x * x))),
                        "band_energy": bands,
                    }
                )
            out = pd.DataFrame(rows)
            out.insert(0, id_col, pdf[id_col].astype("int64").values)
            yield out[[f.name for f in schema.fields]]

    return df.mapInPandas(feats, schema=schema)


def synth_bmp_gradient(width: int, height: int) -> bytes:
    """A real 24-bit BMP with a horizontal brightness gradient
    (column x -> gray level floor(x * 255 / max(width-1, 1))) — the
    image analog of synth_wav_tone: non-trivial pixel content with a
    closed-form expected statistic."""
    import numpy as np

    x = (np.arange(width, dtype=np.float64) * 255 / max(width - 1, 1)).astype(np.uint8)
    row = np.repeat(x, 3)  # B, G, R all equal -> gray
    pad = (-3 * width) % 4
    body = (row.tobytes() + b"\x00" * pad) * height
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
        )
    )
    return header + body


IMAGE_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("valid", BooleanType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_brightness", DoubleType()),
        StructField("std_brightness", DoubleType()),
        StructField("mean_b", DoubleType()),
        StructField("mean_g", DoubleType()),
        StructField("mean_r", DoubleType()),
        StructField("edge_energy", DoubleType()),
    ]
)


def _bmp_pixels(payload: bytes):
    """[H, W, 3] uint8 array (BGR) from a 24-bit BMP, or None."""
    import numpy as np

    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        return None
    data_off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    if bpp != 24 or width <= 0 or height == 0:
        return None
    h = abs(height)
    stride = (3 * width + 3) & ~3
    need = data_off + stride * h
    if len(payload) < need:
        return None
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = rows.reshape(h, stride)[:, : 3 * width].reshape(h, width, 3)
    if height > 0:  # bottom-up storage -> flip to top-down
        rows = rows[::-1]
    return rows


def image_pixel_stats(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Real pixel statistics per image document — mean/std brightness,
    per-channel means, and horizontal edge energy (mean |dI/dx|) —
    parsed from actual pixel data — 24-bit BMP rows (bottom-up order
    and 4-byte padding handled) or 8-bit PNG scanlines (zlib inflate +
    filter reconstruction, round 13) — vectorized in numpy per
    payload. Undecodable payloads yield valid=False.

    Same plan shape as audio_band_energies: Arrow-batched mapInPandas,
    one row out per row in, scan-local at 100 TB.
    """
    import numpy as np

    schema = StructType(
        [StructField(id_col, LongType())] + IMAGE_STATS_SCHEMA.fields[1:]
    )
    empty = {f.name: None for f in IMAGE_STATS_SCHEMA.fields[1:]}
    empty["valid"] = False

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for payload in pdf[payload_col]:
                px = _pixels(payload)
                if px is None:
                    rows.append(dict(empty))
                    continue
                gray = px.mean(axis=2)
                rows.append(
                    {
                        "valid": True,
                        "width": int(px.shape[1]),
                        "height": int(px.shape[0]),
                        "mean_brightness": float(gray.mean()),
                        "std_brightness": float(gray.std()),
                        "mean_b": float(px[:, :, 0].mean()),
                        "mean_g": float(px[:, :, 1].mean()),
                        "mean_r": float(px[:, :, 2].mean()),
                        "edge_energy": float(
                            np.abs(np.diff(gray, axis=1)).mean()
                        ) if px.shape[1] > 1 else 0.0,
                    }
                )
            out = pd.DataFrame(rows)
            out.insert(0, id_col, pdf[id_col].astype("int64").values)
            yield out[[f.name for f in schema.fields]]

    return df.mapInPandas(stats, schema=schema)


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
#: PNG color type -> sample channels (palette images are out of scope:
#: a PLTE lookup is trivially addable but absent from the synthesizers)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_pixels(payload: bytes):
    """[H, W, 3] uint8 array (BGR, matching :func:`_bmp_pixels`) from
    an 8-bit gray/gray+alpha/RGB/RGBA non-interlaced PNG, or None.

    A REAL decode on the stdlib alone: chunk walk, concatenated-IDAT
    zlib inflate, and per-scanline filter reconstruction (None/Sub/Up/
    Average/Paeth). Sub uses a vectorized per-channel cumulative sum
    (mod-256 arithmetic is exact in uint64 before the final mask);
    Average/Paeth are inherently sequential per byte and loop. Alpha
    is dropped; gray is broadcast to 3 channels so every downstream
    pixel operator (stats, resize, frame sampling) is format-agnostic.
    """
    import zlib

    import numpy as np

    if payload is None or len(payload) < 45 or payload[:8] != _PNG_MAGIC:
        return None
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(payload):
        ln = int.from_bytes(payload[pos : pos + 4], "big")
        typ = payload[pos + 4 : pos + 8]
        if pos + 12 + ln > len(payload):
            return None
        if typ == b"IHDR":
            ihdr = payload[pos + 8 : pos + 8 + ln]
        elif typ == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + ln]
        elif typ == b"IEND":
            break
        pos += 12 + ln  # length + type + data + crc
    if ihdr is None or len(ihdr) < 13 or not idat:
        return None
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ctype, comp, filt, interlace = ihdr[8:13]
    ch = _PNG_CHANNELS.get(ctype)
    if not ch or depth != 8 or comp or filt or interlace or w <= 0 or h <= 0:
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = w * ch
    if len(raw) < h * (stride + 1):
        return None
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    rpos = 0
    for y in range(h):
        f = raw[rpos]
        line = np.frombuffer(raw, np.uint8, stride, rpos + 1).astype(np.int32)
        rpos += stride + 1
        if f == 0:  # None
            cur = line
        elif f == 1:  # Sub: cumulative sum down each channel lane
            cur = (
                line.reshape(w, ch).astype(np.uint64).cumsum(axis=0) & 0xFF
            ).astype(np.int32).reshape(stride)
        elif f == 2:  # Up
            cur = (line + prev) & 0xFF
        elif f == 3:  # Average
            cur = line
            for i in range(stride):
                left = cur[i - ch] if i >= ch else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            cur = line
            for i in range(stride):
                a = int(cur[i - ch]) if i >= ch else 0
                b = int(prev[i])
                c = int(prev[i - ch]) if i >= ch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (cur[i] + pred) & 0xFF
        else:
            return None
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(h, w, ch)
    if ch == 1:
        rgb = np.repeat(px, 3, axis=2)
    elif ch == 2:
        rgb = np.repeat(px[:, :, :1], 3, axis=2)
    elif ch == 4:
        rgb = px[:, :, :3]
    else:
        rgb = px
    return rgb[:, :, ::-1].copy()  # PNG stores RGB; downstream is BGR


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import zlib

    return (
        len(data).to_bytes(4, "big")
        + typ
        + data
        + (zlib.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big")
    )


def encode_png(px, filters=None) -> bytes:
    """8-bit RGB (color type 2) PNG bytes from an [H, W, 3] uint8 BGR
    array — the PNG sibling of :func:`encode_bmp`. ``filters`` picks
    the filter per scanline (default all 0/None); non-zero choices are
    encoded as the exact inverse of :func:`_png_pixels`'s
    reconstruction, which is what the round-trip tests use to prove
    every filter path."""
    import zlib

    import numpy as np

    arr = np.asarray(px, np.uint8)[:, :, ::-1]  # BGR -> RGB
    h, w = int(arr.shape[0]), int(arr.shape[1])
    stride = w * 3
    flat = arr.reshape(h, stride).astype(np.int32)
    filters = list(filters) if filters is not None else [0] * h
    if len(filters) != h:
        raise ValueError(
            f"filters must have one entry per scanline: got {len(filters)} "
            f"for height {h}"
        )
    raw = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        f = filters[y]
        if f == 0:
            enc = cur
        elif f == 1:
            left = np.concatenate([np.zeros(3, np.int32), cur[:-3]])
            enc = (cur - left) & 0xFF
        elif f == 2:
            enc = (cur - prev) & 0xFF
        elif f == 3:
            left = np.concatenate([np.zeros(3, np.int32), cur[:-3]])
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        elif f == 4:
            enc = cur.copy()
            for i in range(stride):
                a = int(cur[i - 3]) if i >= 3 else 0
                b = int(prev[i])
                c = int(prev[i - 3]) if i >= 3 else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (cur[i] - pred) & 0xFF
        else:
            raise ValueError(f"unsupported PNG filter {f}")
        raw.append(f)
        raw += enc.astype(np.uint8).tobytes()
        prev = cur
    ihdr = (
        w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes([8, 2, 0, 0, 0])
    )
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def synth_png_gradient(width: int, height: int, filters=None) -> bytes:
    """The PNG twin of :func:`synth_bmp_gradient`: same horizontal
    gray gradient (column x -> floor(x * 255 / max(width-1, 1))), same
    closed-form expected statistics — so the PNG decode path can be
    value-oracled against the identical arithmetic. ``filters``
    (optional, per scanline) passes through to :func:`encode_png`:
    cycling all five filter types yields byte-different files that
    must decode to the identical pixels — the property the
    ``png_resize_roundtrip`` oracle chain leans on."""
    import numpy as np

    x = (np.arange(width, dtype=np.float64) * 255 / max(width - 1, 1)).astype(
        np.uint8
    )
    px = np.repeat(x, 3).reshape(1, width, 3).repeat(height, axis=0)
    return encode_png(px, filters=filters)


def _pixels(payload: bytes):
    """Format-agnostic pixel access: BMP or PNG -> [H, W, 3] BGR uint8
    (None for anything else) — the single dispatch every pixel
    operator goes through."""
    if payload is not None and len(payload) >= 8 and payload[:8] == _PNG_MAGIC:
        return _png_pixels(payload)
    return _bmp_pixels(payload)


def encode_bmp(px) -> bytes:
    """24-bit bottom-up BMP bytes from an [H, W, 3] uint8 BGR array —
    the exact inverse of :func:`_bmp_pixels` (row padding included),
    so decode -> transform -> encode round-trips."""
    import numpy as np

    h, w = int(px.shape[0]), int(px.shape[1])
    pad = (-3 * w) % 4
    body = b"".join(
        row.tobytes() + b"\x00" * pad for row in np.asarray(px, np.uint8)[::-1]
    )
    header = (
        b"BM"
        + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
        )
    )
    return header + body


def resize_images(
    df: DataFrame,
    out_width: int,
    out_height: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    out_format: str = "bmp",
) -> DataFrame:
    """Batch image resize to a fixed (``out_width``, ``out_height``) —
    the normalize-before-train step of a multimodal pipeline, done as
    REAL pixel work: parse the 24-bit BMP (or 8-bit PNG, round 13),
    nearest-neighbor resample
    (``src_row = floor(i * src_h / dst_h)``, same for columns — pure
    integer index math, deterministic across platforms), re-encode as
    BMP (or PNG with ``out_format="png"`` — round 14, so an
    all-PNG decode -> transform -> encode -> decode chain can be
    value-oracled end to end).
    Returns ``(id, valid, width, height, payload)`` where payload
    is the resized image's bytes (NULL for undecodable inputs, which
    keeps them routable to quarantine instead of crashing the job).

    Scale: Arrow-batched ``mapInPandas``, one output row per input
    row, no shuffle — a pure map stage that parallelizes with the
    scan, exactly like :func:`image_pixel_stats`. Output payloads are
    bounded by the fixed target size regardless of input dimensions,
    so downstream stages see uniform row widths (the property batch
    packers rely on).
    """
    import numpy as np

    ow, oh = int(out_width), int(out_height)
    if ow <= 0 or oh <= 0:
        raise ValueError(f"target size must be positive, got {ow}x{oh}")
    if out_format not in ("bmp", "png"):
        raise ValueError(f"out_format must be 'bmp' or 'png', got {out_format!r}")
    enc = encode_bmp if out_format == "bmp" else encode_png
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("valid", BooleanType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("payload", BinaryType()),
        ]
    )

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for payload in pdf[payload_col]:
                px = _pixels(payload)
                if px is None:
                    rows.append((False, None, None, None))
                    continue
                sh, sw = px.shape[0], px.shape[1]
                ri = (np.arange(oh, dtype=np.int64) * sh) // oh
                ci = (np.arange(ow, dtype=np.int64) * sw) // ow
                out = px[ri][:, ci]
                rows.append((True, ow, oh, enc(out)))
            res = pd.DataFrame(
                rows, columns=["valid", "width", "height", "payload"]
            )
            res.insert(0, id_col, pdf[id_col].astype("int64").values)
            yield res

    return df.mapInPandas(resize, schema=schema)


def _wav_pcm16_raw(payload: bytes):
    """(sample_rate, n_channels, int16 frame array [n, ch]) from a
    16-bit PCM WAV, or None — the raw-integer sibling of
    :func:`_wav_pcm16` (no mono mixdown, no float scaling), for
    operators that must re-encode losslessly."""
    import numpy as np

    if payload is None or len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    rate = channels = bits = None
    data = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = struct.unpack_from("<I", payload, pos + 4)[0]
        if cid == b"fmt " and pos + 24 <= len(payload):
            channels, rate = struct.unpack_from("<HI", payload, pos + 10)
            bits = struct.unpack_from("<H", payload, pos + 22)[0]
        elif cid == b"data":
            data = payload[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size % 2)
    if not (rate and channels and bits == 16 and data):
        return None
    n = len(data) // (2 * channels)
    if n == 0:
        return None
    samples = np.frombuffer(data[: n * 2 * channels], dtype="<i2")
    return rate, channels, samples.reshape(n, channels)


def encode_wav(sample_rate: int, frames) -> bytes:
    """16-bit PCM WAV bytes from an int16 [n, channels] frame array —
    the inverse of :func:`_wav_pcm16_raw`, so decode -> transform ->
    encode round-trips losslessly."""
    import numpy as np

    arr = np.asarray(frames, dtype="<i2")
    n, ch = int(arr.shape[0]), int(arr.shape[1])
    data = arr.tobytes()
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack(
            "<IHHIIHH", 16, 1, ch, sample_rate, sample_rate * 2 * ch, 2 * ch, 16
        )
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def synth_wav_ramp(sample_rate: int, n_frames: int) -> bytes:
    """A real mono PCM16 WAV whose samples follow the integer ramp
    ``((i * 37) % 4001) - 2000`` — closed-form content (exact integer
    math, no trig), so downstream transforms can be oracled
    bit-exactly in SQL (the audio analog of synth_bmp_gradient)."""
    import numpy as np

    i = np.arange(n_frames, dtype=np.int64)
    samples = ((i * 37) % 4001 - 2000).astype("<i2")
    return encode_wav(sample_rate, samples.reshape(-1, 1))


def resample_audio(
    df: DataFrame,
    out_rate: int,
    payload_col: str = "payload",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sample-rate conversion to a fixed ``out_rate`` — the
    normalize-before-train step for audio, as REAL sample work:
    parse the PCM16 WAV, nearest-neighbor frame pick
    (``src_frame = (j * in_rate) // out_rate``, duration-preserving
    ``n_out = (n_src * out_rate) // in_rate`` — pure integer index
    math, channels preserved), re-encode. Returns
    ``(id, valid, sample_rate, n_frames, payload)`` with NULL payload
    for undecodable inputs (quarantine-routable, never job-fatal).

    Scale: Arrow-batched ``mapInPandas``, one row out per row in, no
    shuffle — the same scan-local map-stage shape as
    :func:`resize_images`. Output length is proportional to target
    rate, so a mixed-rate corpus leaves this stage uniform.
    """
    import numpy as np

    orate = int(out_rate)
    if orate <= 0:
        raise ValueError(f"out_rate must be positive, got {orate}")
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("valid", BooleanType()),
            StructField("sample_rate", IntegerType()),
            StructField("n_frames", LongType()),
            StructField("payload", BinaryType()),
        ]
    )

    def conv(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for payload in pdf[payload_col]:
                parsed = _wav_pcm16_raw(payload)
                if parsed is None:
                    rows.append((False, None, None, None))
                    continue
                irate, _ch, frames = parsed
                n_out = (frames.shape[0] * orate) // irate
                if n_out <= 0:
                    rows.append((False, None, None, None))
                    continue
                idx = (np.arange(n_out, dtype=np.int64) * irate) // orate
                out = frames[idx]
                rows.append((True, orate, n_out, encode_wav(orate, out)))
            res = pd.DataFrame(
                rows, columns=["valid", "sample_rate", "n_frames", "payload"]
            )
            res.insert(0, id_col, pdf[id_col].astype("int64").values)
            yield res

    return df.mapInPandas(conv, schema=schema)


def audio_pcm_stats(
    df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """Raw-integer amplitude stats per audio payload — mean and RMS of
    the PCM16 samples (channel-flattened), plus rate/length. The
    ingest-validation profile that needs no FFT: integer sums are
    exact, so these values oracle bit-for-bit where the content has a
    closed form. Same scan-local Arrow map-stage shape as
    :func:`image_pixel_stats`."""
    schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField("valid", BooleanType()),
            StructField("sample_rate", IntegerType()),
            StructField("n_frames", LongType()),
            StructField("mean_amp", DoubleType()),
            StructField("rms_amp", DoubleType()),
        ]
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for payload in pdf[payload_col]:
                parsed = _wav_pcm16_raw(payload)
                if parsed is None:
                    rows.append((False, None, None, None, None))
                    continue
                rate, _ch, frames = parsed
                v = frames.astype(np.float64).ravel()
                rows.append(
                    (
                        True,
                        rate,
                        frames.shape[0],
                        float(v.mean()),
                        float(np.sqrt((v * v).mean())),
                    )
                )
            res = pd.DataFrame(
                rows,
                columns=["valid", "sample_rate", "n_frames", "mean_amp", "rms_amp"],
            )
            res.insert(0, id_col, pdf[id_col].astype("int64").values)
            yield res

    return df.mapInPandas(stats, schema=schema)

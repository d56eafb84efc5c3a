"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct; the
Spark-side plumbing (schema, batching, partition-sized Arrow transfer) is
real and tested. The codec step probes for Pillow at runtime (`_pil()`):
where PIL exists, images decode/resize FOR REAL inside the same
mapInPandas; where it doesn't (this container), a deterministic stub
derived from the bytes runs instead, and strict=True raises
NotImplementedError — so pipelines exercise the exact mapInPandas shape
they would run with real codecs, and deployments with codecs get real
decodes with zero pipeline changes. The frame-sampling path has the same
hatch for ffmpeg-class codecs (`_av()`: PyAV if importable). WAV audio
decodes FOR REAL everywhere via the Python stdlib (`_audio_feature`);
non-WAV audio (mp3/flac/opus) needs an ffmpeg-class codec and stays
stubbed where none exists.

Design notes for 100 TB:
- decode runs in ``mapInPandas`` so one Arrow batch amortizes the Python
  hop over thousands of rows, and output cardinality may differ from
  input (frame sampling explodes, filtering contracts);
- binary payloads dominate row size -> ``spark.sql.files.maxPartitionBytes``
  governs batch memory; metadata-only plans never touch the bytes thanks
  to parquet column pruning.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("n_bytes", IntegerType()),
        StructField("sha1", StringType()),
        StructField("feature", StringType()),
    ]
)


def _decode_stub(payload: bytes, kind: str) -> str:
    """STUB for the real codec. Deterministic fake: content hash prefix.
    The real-codec escape hatch (`_pil()`) replaces this per-row call
    where PIL exists; ffmpeg-class codecs stay stubbed either way."""
    if payload is None:
        return None
    return f"{kind}:{hashlib.sha1(payload).hexdigest()[:12]}"


def _pil():
    """Optional real-codec escape hatch: PIL if importable, else None.
    This container has no codec libraries, so the stub path runs here;
    on a cluster WITH Pillow the same mapInPandas decodes for real —
    no pipeline shape change, only the per-row call at the decode seam.
    Probed once per executor-side import (cheap, cached by sys.modules).
    """
    try:
        from PIL import Image

        return Image
    except Exception:
        return None


def _audio_feature(payload: bytes, strict: bool) -> str | None:
    """REAL audio decode for the WAV container via the Python stdlib —
    no third-party codec needed, so unlike the PIL/PyAV hatches this
    path runs everywhere (including this sandbox). Parses the RIFF/WAVE
    header and frame count: channels, sample rate, sample width,
    duration — the metadata a training-data audio pipeline filters on.
    Non-WAV payloads (mp3/flac/opus need ffmpeg-class codecs) fall back
    to the stub, or raise under strict."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload)) as w:
            rate = w.getframerate() or 1
            dur = w.getnframes() / rate
            return (
                f"audio:WAV:{w.getnchannels()}ch:{rate}Hz:"
                f"{8 * w.getsampwidth()}bit:{dur:.3f}s"
            )
    except Exception:
        if strict:
            # a RIFF/WAVE-tagged payload that still failed to parse is
            # CORRUPT DATA, not a missing codec — mislabeling it as the
            # latter sends an operator hunting for ffmpeg instead of
            # quarantining the row
            if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
                raise ValueError(
                    "corrupt or truncated WAV payload (RIFF/WAVE header "
                    "present but the container failed to parse) — "
                    "quarantine the row, this is a data-quality failure"
                )
            raise NotImplementedError(
                "non-WAV audio decode requires an ffmpeg-class codec; "
                "not available in this environment"
            )
        return _decode_stub(payload, "audio")


def _mp4_meta(payload: bytes) -> tuple[str, float | None] | None:
    """Minimal ISO-BMFF (MP4/MOV) metadata parse — pure box walking, no
    codec: major brand from ``ftyp``, duration from ``moov/mvhd``
    (duration/timescale, v0 and v1 layouts). Returns (brand, seconds)
    with seconds None if no mvhd found, or None when the payload is not
    ISO-BMFF at all. Container METADATA is what a training pipeline
    filters on (length, liveness); actual frame decode stays behind the
    PyAV hatch."""
    import struct

    def boxes(start: int, end: int):
        off = start
        while off + 8 <= end:
            size, typ = struct.unpack_from(">I4s", payload, off)
            hdr = 8
            if size == 1:
                if off + 16 > end:
                    return
                size = struct.unpack_from(">Q", payload, off + 8)[0]
                hdr = 16
            elif size == 0:
                size = end - off
            if size < hdr or off + size > end:
                return
            yield typ, off + hdr, off + size
            off += size

    if len(payload) < 12 or payload[4:8] != b"ftyp":
        return None
    brand = payload[8:12].decode("latin1", "replace").strip()
    for typ, s, e in boxes(0, len(payload)):
        if typ != b"moov":
            continue
        for t2, s2, e2 in boxes(s, e):
            if t2 != b"mvhd" or s2 >= e2:
                continue
            ver = payload[s2]
            try:
                if ver == 1:
                    ts, dur = struct.unpack_from(">IQ", payload, s2 + 20)
                else:
                    ts, dur = struct.unpack_from(">II", payload, s2 + 12)
            except struct.error:
                return brand, None
            return brand, (dur / ts) if ts else None
    return brand, None


def _image_feature(Image, payload: bytes, strict: bool) -> str | None:
    """Real image decode via PIL: format/size/mode — the feature a real
    deployment extracts. Undecodable bytes fall back to the stub (or
    raise under strict, matching a production 'reject bad media' gate)."""
    import io

    try:
        with Image.open(io.BytesIO(payload)) as im:
            return f"image:{im.format}:{im.size[0]}x{im.size[1]}:{im.mode}"
    except Exception:
        if strict:
            raise
        return _decode_stub(payload, "image")


def extract_features(media: DataFrame, strict: bool = False) -> DataFrame:
    """mapInPandas feature extraction over binary media rows.

    strict=True raises NotImplementedError at the decode step — the
    behavior a deployment without codecs should surface instead of
    silently faking features."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = _pil()
        for pdf in batches:

            def feat(b, k):
                if b is None:
                    return None
                if k == "audio":
                    # stdlib WAV decode — real everywhere (see above)
                    return _audio_feature(b, strict)
                if k == "image" and Image is not None:
                    return _image_feature(Image, b, strict)
                if k == "video":
                    # pure box-walking MP4 metadata — real everywhere
                    meta = _mp4_meta(b)
                    if meta is not None:
                        brand, dur = meta
                        return (
                            f"video:{brand}:{dur:.3f}s"
                            if dur is not None
                            else f"video:{brand}"
                        )
                if strict:
                    raise NotImplementedError(
                        f"{k} decode requires codec libraries (PIL/ffmpeg); "
                        "not available in this environment"
                    )
                return _decode_stub(b, k)

            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                    "sha1": pdf["payload"].map(
                        lambda b: hashlib.sha1(b).hexdigest() if b is not None else None
                    ),
                    "feature": [
                        feat(b, k) for b, k in zip(pdf["payload"], pdf["kind"])
                    ],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize_media(media: DataFrame, max_dim: int = 32, strict: bool = False) -> DataFrame:
    """Image/frame resize to fit ``max_dim`` preserving aspect ratio —
    the standard pre-training normalization step. The pixel transform is
    the STUB (no codec libs in this container; strict=True raises); the
    Spark-side contract is real and verifiable: output dimensions are a
    closed-form function of the input metadata (scale = max_dim /
    max(w, h), never upscale), the payload is replaced by the stub's
    deterministic re-encode, and non-image rows pass through with
    dimensions untouched. Vectorized mapInPandas — per-batch numpy
    arithmetic on the metadata, one stub call per row where a real
    codec decode/encode would sit."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        Image = _pil()

        def ref(b, nw, nh, img):
            if not img:
                return None
            if Image is not None:
                # real path: decode, thumbnail, re-encode; the ref is the
                # re-encoded content hash (what an object-store writer
                # would key the derived artifact by)
                import io

                try:
                    with Image.open(io.BytesIO(b)) as im:
                        im.thumbnail((max_dim, max_dim))
                        buf = io.BytesIO()
                        im.save(buf, format=im.format or "PNG")
                        return (
                            f"resize{int(nw)}x{int(nh)}:"
                            f"{hashlib.sha1(buf.getvalue()).hexdigest()[:12]}"
                        )
                except Exception:
                    if strict:
                        raise
            return _decode_stub(b, f"resize{int(nw)}x{int(nh)}")

        for pdf in batches:
            if strict and Image is None:
                raise NotImplementedError(
                    "media resize requires codec libraries (PIL/ffmpeg); "
                    "not available in this environment"
                )
            w = pdf["width"].fillna(0).astype(int)
            h = pdf["height"].fillna(0).astype(int)
            is_img = pdf["kind"] == "image"
            longest = w.combine(h, max).clip(lower=1)
            scale = (max_dim / longest).clip(upper=1.0)
            new_w = ((w * scale).round().astype(int)).where(is_img, w)
            new_h = ((h * scale).round().astype(int)).where(is_img, h)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": new_w.astype("int32"),
                    "height": new_h.astype("int32"),
                    "payload_ref": [
                        ref(b, nw, nh, img)
                        for b, nw, nh, img in zip(pdf["payload"], new_w, new_h, is_img)
                    ],
                }
            )

    schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("kind", StringType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("payload_ref", StringType()),
        ]
    )
    return media.mapInPandas(run, schema=schema)


def _av():
    """Optional ffmpeg-class escape hatch (same pattern as `_pil()`):
    PyAV if importable, else None. This container has no ffmpeg binding,
    so the stub path runs here; on a cluster WITH PyAV the same
    mapInPandas seeks and decodes real frames — identical pipeline
    shape, only the per-item call at the decode seam changes."""
    try:
        import av

        return av
    except Exception:
        return None


def _real_frame_ref(av, payload: bytes, t_ms: int) -> str | None:
    """Real frame decode via PyAV: seek to t_ms, decode the next frame,
    key the artifact by its pixel-plane content hash. Undecodable bytes
    fall back to the stub (a production gate would reject them)."""
    import io

    try:
        with av.open(io.BytesIO(payload)) as container:
            stream = container.streams.video[0]
            # seek WITHOUT stream=: the offset is then in av.time_base
            # (microseconds). With stream= it would be in
            # stream.time_base units — t_ms*1000 only lands at the
            # requested timestamp when that happens to be 1/1e6, so the
            # stream-targeted form silently samples wrong frames on
            # most codecs.
            container.seek(int(t_ms * 1000), backward=True, any_frame=False)
            for frame in container.decode(stream):
                planes = b"".join(bytes(p) for p in frame.planes)
                return (
                    f"frame@{t_ms}:{frame.width}x{frame.height}:"
                    f"{hashlib.sha1(planes).hexdigest()[:12]}"
                )
        return _decode_stub(payload, f"frame@{t_ms}")
    except Exception:
        return _decode_stub(payload, f"frame@{t_ms}")


def sample_frames(media: DataFrame, every_ms: int = 1000, strict: bool = False) -> DataFrame:
    """Video frame sampling: 1 input row -> N output rows (one per sampled
    frame timestamp). Output cardinality change is why this is mapInPandas
    and not a scalar UDF. Frame decode probes for an ffmpeg-class binding
    (`_av()`, mirroring the PIL hatch): with PyAV present, video rows
    seek-and-decode REAL frames at the sampled timestamps; without it
    (this container) the deterministic stub runs, and strict=True raises
    instead of faking — the honest no-codec surface."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        av = _av()
        for pdf in batches:
            if strict and av is None:
                raise NotImplementedError(
                    "frame decode requires an ffmpeg binding (PyAV); "
                    "not available in this environment"
                )
            # vectorized 1->N expansion: repeat each row by its frame
            # count, then a cumcount per original row gives the frame
            # timestamp — no iterrows (the per-row anti-pattern the
            # north rule bans). Only the stubbed decode call remains
            # per-item, which is where a real codec call would sit.
            dur = pdf["duration_ms"].fillna(0).astype(int).clip(lower=1)
            n_frames = (dur + every_ms - 1) // every_ms
            rep = pdf.loc[pdf.index.repeat(n_frames)].reset_index()
            frame_ms = rep.groupby("index").cumcount() * every_ms

            def fref(b, t, k):
                if av is not None and k == "video" and b is not None:
                    return _real_frame_ref(av, b, int(t))
                return _decode_stub(b, f"frame@{t}")

            out = pd.DataFrame(
                {
                    "media_id": rep["media_id"],
                    "frame_ms": frame_ms.astype("int32"),
                    "frame_ref": [
                        fref(b, t, k)
                        for b, t, k in zip(
                            rep["payload"], frame_ms, rep["kind"]
                        )
                    ],
                }
            )
            yield out

    schema = StructType(
        [
            StructField("media_id", StringType()),
            StructField("frame_ms", IntegerType()),
            StructField("frame_ref", StringType()),
        ]
    )
    return media.mapInPandas(run, schema=schema)


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (bytes from xxhash)."""
    df = spark.range(n).select(
        F.format_string("m-%04d", F.col("id")).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(
            F.concat(F.lit("payload-"), F.xxhash64(F.col("id")).cast("string")), "utf-8"
        ).cast("binary").alias("payload"),
        F.lit(64).alias("width"),
        F.lit(64).alias("height"),
        (F.pmod(F.col("id"), F.lit(5)).cast("int") * 1000 + 500).alias("duration_ms"),
    )
    return df

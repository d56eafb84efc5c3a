"""Two-pass fallback lookup (J9) + multimodal mapInPandas plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pasar_spark.functions.lookup import two_pass_lookup
from pasar_spark.functions.multimodal import (
    extract_features,
    sample_frames,
    synth_media,
)


def test_two_pass_lookup(spark):
    facts = spark.createDataFrame(
        [("ASPIRIN",), ("aspirin (oral)",), ("IBUPROFEN 200MG",), ("unknown-drug",)],
        "code string",
    )
    dictionary = spark.createDataFrame(
        [("ASPIRIN", 11), ("IBUPROFEN", 22), ("PARACETAMOL", 33)],
        "source_code string, concept_id int",
    )
    # normalization mirrors the reference's regex strip of parenthetical/
    # dosage suffixes (temp_drugmed_view.sql:36-39)
    norm = lambda c: F.upper(F.regexp_replace(c, r"\s*(\(.*\)|\d+MG).*$", ""))
    out = two_pass_lookup(
        facts, dictionary, "code", "source_code", "concept_id", norm, default=0
    )
    got = {r.code: r.mapped for r in out.collect()}
    assert got == {
        "ASPIRIN": 11,  # pass 1 exact
        "aspirin (oral)": 11,  # pass 2 normalized
        "IBUPROFEN 200MG": 22,  # pass 2 normalized
        "unknown-drug": 0,  # default
    }


def test_two_pass_lookup_broadcasts(spark):
    facts = spark.createDataFrame([("A",)], "code string")
    d = spark.createDataFrame([("A", 1)], "source_code string, concept_id int")
    out = two_pass_lookup(facts, d, "code", "source_code", "concept_id", F.upper)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan


def test_media_feature_extraction(spark):
    media = synth_media(spark, 32)
    feats = extract_features(media).collect()
    assert len(feats) == 32
    by_id = {r.media_id: r for r in feats}
    assert by_id["m-0000"].sha1 is not None
    assert by_id["m-0001"].feature.startswith(by_id["m-0001"].kind + ":")
    # deterministic across runs
    feats2 = {r.media_id: r.feature for r in extract_features(media).collect()}
    assert feats2 == {r.media_id: r.feature for r in feats}


def _have_pil() -> bool:
    from pasar_spark.functions.multimodal import _pil

    return _pil() is not None


@pytest.mark.skipif(_have_pil(), reason="strict only raises where no codec lib exists")
def test_media_strict_mode_raises(spark):
    media = synth_media(spark, 4)
    with pytest.raises(Exception) as ei:
        extract_features(media, strict=True).collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)


@pytest.mark.skipif(not _have_pil(), reason="real-codec path needs Pillow")
def test_media_real_decode_with_pil(spark):
    """Where Pillow exists the SAME mapInPandas decodes images for real:
    a genuine PNG payload yields a real format/size feature, and strict
    mode passes instead of raising."""
    import io

    from PIL import Image as PILImage

    buf = io.BytesIO()
    PILImage.new("RGB", (48, 20)).save(buf, format="PNG")
    media = spark.createDataFrame(
        [("real-1", "image", "image/png", bytearray(buf.getvalue()), 48, 20, None)],
        schema=synth_media(spark, 1).schema,
    )
    row = extract_features(media, strict=True).collect()[0]
    assert row.feature == "image:PNG:48x20:RGB"


def test_resize_contract(spark):
    from pasar_spark.functions.multimodal import resize_media

    media = synth_media(spark, 12)
    out = {r.media_id: r for r in resize_media(media, max_dim=32).collect()}
    src = {r.media_id: r for r in media.collect()}
    for mid, r in out.items():
        if src[mid].kind == "image":
            assert (r.width, r.height) == (32, 32)  # 64x64 fit to 32
            assert r.payload_ref and r.payload_ref.startswith("resize32x32:")
        else:
            assert (r.width, r.height) == (64, 64)  # pass-through
            assert r.payload_ref is None
    if not _have_pil():
        with pytest.raises(Exception) as ei:
            resize_media(media, strict=True).collect()
        assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)


def test_frame_sampling_cardinality(spark):
    media = synth_media(spark, 9).where("kind = 'video'")
    frames = sample_frames(media, every_ms=1000)
    rows = frames.collect()
    # each video yields ceil(max(duration,1)/1000) frames
    durs = {r.media_id: r.duration_ms for r in media.collect()}
    import math

    want = sum(math.ceil(max(d, 1) / 1000) for d in durs.values())
    assert len(rows) == want
    assert {r.media_id for r in rows} == set(durs)


def _have_av() -> bool:
    from pasar_spark.functions.multimodal import _av

    return _av() is not None


@pytest.mark.skipif(_have_av(), reason="strict only raises where no ffmpeg binding exists")
def test_frame_sampling_strict_raises_without_av(spark):
    media = synth_media(spark, 4).where("kind = 'video'")
    with pytest.raises(Exception) as ei:
        sample_frames(media, every_ms=500, strict=True).collect()
    assert "NotImplementedError" in str(ei.value) or "ffmpeg" in str(ei.value)


@pytest.mark.skipif(not _have_av(), reason="real frame decode needs PyAV")
def test_frame_sampling_real_decode_with_av(spark):
    """Where PyAV exists the SAME mapInPandas seeks and decodes real
    frames: refs carry real dimensions + pixel-content hashes and strict
    mode passes instead of raising. (Skipped in this container — no
    ffmpeg binding is installed; the skipif pair keeps both worlds
    covered without faking.)"""
    import io

    import av as _avmod
    import numpy as np

    buf = io.BytesIO()
    with _avmod.open(buf, "w", format="mp4") as container:
        stream = container.add_stream("mpeg4", rate=4)
        stream.width, stream.height = 32, 16
        stream.pix_fmt = "yuv420p"
        for i in range(8):  # 2 s of 4 fps video
            arr = np.full((16, 32, 3), i * 16, dtype=np.uint8)
            frame = _avmod.VideoFrame.from_ndarray(arr, format="rgb24")
            for packet in stream.encode(frame):
                container.mux(packet)
        for packet in stream.encode():
            container.mux(packet)
    media = spark.createDataFrame(
        [("vid-1", "video", "video/mp4", bytearray(buf.getvalue()), 32, 16, 2000)],
        schema=synth_media(spark, 1).schema,
    )
    rows = sample_frames(media, every_ms=1000, strict=True).collect()
    assert len(rows) == 2
    for r in rows:
        assert r.frame_ref.startswith(f"frame@{r.frame_ms}:32x16:")


def test_audio_wav_decodes_for_real_via_stdlib(spark):
    """WAV audio needs no third-party codec: the stdlib wave module
    parses the RIFF header and frame count, so the REAL audio path runs
    in every environment (no skipif — unlike the PIL/PyAV hatches).
    Strict mode passes for WAV and still raises for non-WAV bytes."""
    import io
    import struct
    import wave as wave_mod

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack("<4000h", *([0] * 4000)))  # 2000 stereo frames
    media = spark.createDataFrame(
        [
            ("wav-1", "audio", "audio/wav", bytearray(buf.getvalue()), 0, 0, 250),
            ("mp3-1", "audio", "audio/mpeg", bytearray(b"\xff\xfbfakemp3"), 0, 0, 250),
        ],
        schema=synth_media(spark, 1).schema,
    )
    rows = {r.media_id: r.feature for r in extract_features(media).collect()}
    assert rows["wav-1"] == "audio:WAV:2ch:8000Hz:16bit:0.250s"
    assert rows["mp3-1"].startswith("audio:")  # stub fallback, honest
    # strict: the real WAV row passes, the undecodable one raises
    wav_only = media.where("media_id = 'wav-1'")
    assert extract_features(wav_only, strict=True).collect()[0].feature.endswith("0.250s")
    with pytest.raises(Exception) as ei:
        extract_features(media.where("media_id = 'mp3-1'"), strict=True).collect()
    assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)


def test_video_mp4_metadata_parses_for_real(spark):
    """ISO-BMFF container metadata (brand + mvhd duration) is pure box
    walking — real everywhere, no codec. A valid minimal MP4 box
    sequence yields brand and duration; non-BMFF bytes keep the stub."""
    import struct

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    # mvhd v0: version/flags, creation, modification, timescale=1000,
    # duration=2500, then rate/volume/reserved/matrix/predefined/next_id
    mvhd = box(
        b"mvhd",
        struct.pack(">BxxxIIII", 0, 0, 0, 1000, 2500)
        + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
        + b"\x00" * 10 + b"\x00" * 36 + b"\x00" * 24 + struct.pack(">I", 2),
    )
    mp4 = ftyp + box(b"moov", mvhd)
    media = spark.createDataFrame(
        [
            ("mp4-1", "video", "video/mp4", bytearray(mp4), 0, 0, 2500),
            ("raw-1", "video", "video/x-raw", bytearray(b"notabmff"), 0, 0, 100),
        ],
        schema=synth_media(spark, 1).schema,
    )
    rows = {r.media_id: r.feature for r in extract_features(media).collect()}
    assert rows["mp4-1"] == "video:isom:2.500s"
    assert rows["raw-1"].startswith("video:")  # stub fallback
    # strict: real-metadata row passes, undecodable one raises
    ok = extract_features(media.where("media_id = 'mp4-1'"), strict=True).collect()
    assert ok[0].feature == "video:isom:2.500s"
    with pytest.raises(Exception):
        extract_features(media.where("media_id = 'raw-1'"), strict=True).collect()

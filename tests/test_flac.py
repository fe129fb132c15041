"""mcpvectordb_spark/flac.py — pure-Python FLAC codec round-trips, CRC
enforcement, converter + audio-feature integration."""

import math

import pytest

from mcpvectordb_spark.flac import decode_flac, encode_flac, parse_streaminfo


def tone(n, f=440.0, rate=8000, amp=9000):
    return [int(amp * math.sin(2 * math.pi * f * i / rate)) for i in range(n)]


@pytest.mark.parametrize("mode", ["constant", "verbatim", "fixed0", "fixed1", "fixed2", "lpc2"])
def test_flac_mono_roundtrip_every_subframe_type(mode):
    pcm = [7] * 3000 if mode == "constant" else tone(3000)
    dec = decode_flac(encode_flac([pcm], 8000, mode=mode))
    assert dec["channels_pcm"][0] == pcm
    assert dec["sample_rate"] == 8000 and dec["channels"] == 1


@pytest.mark.parametrize("stereo", ["independent", "mid_side"])
def test_flac_stereo_roundtrip(stereo):
    l, r = tone(5000, 440), tone(5000, 523)
    dec = decode_flac(encode_flac([l, r], 8000, mode="fixed2", stereo=stereo))
    assert dec["channels_pcm"][0] == l and dec["channels_pcm"][1] == r


def test_flac_multiframe_and_streaminfo():
    pcm = tone(10000)  # 3 frames at block 4096
    enc = encode_flac([pcm], 16000, block_size=4096)
    si = parse_streaminfo(enc)
    assert si["total_samples"] == 10000 and si["sample_rate"] == 16000
    assert decode_flac(enc)["channels_pcm"][0] == pcm
    # compression is real on tonal content
    assert len(enc) < len(pcm) * 2


def test_flac_crc_enforced():
    enc = bytearray(encode_flac([tone(3000)], 8000))
    enc[-40] ^= 0x01  # flip a bit inside the last frame's payload
    with pytest.raises(ValueError):
        decode_flac(bytes(enc))
    assert parse_streaminfo(b"fLaCxxxx") is None
    with pytest.raises(ValueError):
        decode_flac(b"not flac at all")


def test_flac_converter_tone_transcription():
    from mcpvectordb_spark.asr import CHARSET, BASE_HZ, STEP_HZ, RATE, TONE_S, GAP_S
    from mcpvectordb_spark.converter import convert_bytes

    # encode a tone message as FLAC (same grid the wav ASR uses)
    msg = "FLAC ROUND 3"
    samples: list[int] = []
    for ch in msg:
        f = BASE_HZ + CHARSET.index(ch) * STEP_HZ
        samples += [int(12000 * math.sin(2 * math.pi * f * i / RATE))
                    for i in range(int(RATE * TONE_S))]
        samples += [0] * int(RATE * GAP_S)
    flac = encode_flac([samples], RATE, mode="fixed2")
    assert convert_bytes(flac, "flac") == msg
    # non-tonal FLAC → documented error row
    with pytest.raises(NotImplementedError):
        convert_bytes(encode_flac([tone(8000)], 8000), "flac")
    with pytest.raises(NotImplementedError):
        convert_bytes(b"fLaC garbage", "flac")


def test_flac_audio_features_real_path(spark):
    from pyspark.sql import functions as F

    from mcpvectordb_spark.sources.multimodal import MEDIA_SCHEMA, extract_audio_features

    import struct

    pcm = tone(8000)
    flac = encode_flac([pcm], 8000)
    wav_pcm = struct.pack("<%dh" % len(pcm), *pcm)
    wav = (b"RIFF" + struct.pack("<I", 36 + len(wav_pcm)) + b"WAVE" + b"fmt "
           + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
           + b"data" + struct.pack("<I", len(wav_pcm)) + wav_pcm)
    df = spark.createDataFrame(
        [("w", "audio", "audio/wav", wav, None), ("f", "audio", "audio/flac", flac, None)],
        MEDIA_SCHEMA,
    )
    out = {r["media_id"]: r for r in extract_audio_features(df, dim=8, fake=False).collect()}
    # identical samples through two containers → identical real features
    assert out["w"]["features"] == out["f"]["features"]
    assert abs(out["f"]["duration_s"] - 1.0) < 1e-9

def _tone_message(msg, amp=12000):
    from mcpvectordb_spark.asr import BASE_HZ, CHARSET, GAP_S, RATE, STEP_HZ, TONE_S

    samples: list[int] = []
    for ch in msg:
        f = BASE_HZ + CHARSET.index(ch) * STEP_HZ
        samples += [int(amp * math.sin(2 * math.pi * f * i / RATE))
                    for i in range(int(RATE * TONE_S))]
        samples += [0] * int(RATE * GAP_S)
    return samples


def test_flac_converter_stereo_and_bit_depths():
    """Round-3 verdict item 4: the converter gate downmixes stereo to mono
    and rescales non-16-bit depths before the tone-ASR, so every decodable
    FLAC reaches transcription — not just mono/16."""
    from mcpvectordb_spark.asr import RATE
    from mcpvectordb_spark.converter import convert_bytes

    msg = "STEREO GATE 4"
    mono = _tone_message(msg)
    for stereo in ("independent", "mid_side"):
        flac = encode_flac([mono, list(mono)], RATE, mode="fixed2", stereo=stereo)
        assert convert_bytes(flac, "flac") == msg, stereo
    # 8-bit: encode the same tones at 1/256 amplitude; the gate re-scales <<8
    pcm8 = [s >> 8 for s in _tone_message(msg, amp=12000)]
    assert convert_bytes(encode_flac([pcm8], RATE, bits_per_sample=8), "flac") == msg
    # 24-bit: 256× amplitude; the gate re-scales >>8
    pcm24 = [s << 8 for s in mono]
    assert convert_bytes(encode_flac([pcm24], RATE, bits_per_sample=24), "flac") == msg


def test_flac_malformed_inputs_raise_valueerror():
    """ADVICE r03: truncated metadata and bad partition orders must raise
    ValueError (the error-row contract), never IndexError."""
    enc = encode_flac([tone(3000)], 8000)
    # STREAMINFO block not marked last, then EOF mid-walk
    trunc = bytearray(enc[: 4 + 4 + 34])
    trunc[4] &= 0x7F  # clear the last-metadata-block flag
    with pytest.raises(ValueError):
        decode_flac(bytes(trunc))
    # truncated mid-frame still ValueError (bit reader EOF path)
    with pytest.raises(ValueError):
        decode_flac(enc[: len(enc) - 10])

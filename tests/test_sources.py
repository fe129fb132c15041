"""Sources: folder/binaryFile scan, converter error isolation, multimodal
stub plumbing, URL fetch error rows (no network in tests)."""

import json

from mcpvectordb_spark.converter import convert_bytes, convert_stage
from mcpvectordb_spark.sources.files import fetch_urls, read_folder
from mcpvectordb_spark.sources.multimodal import (
    MEDIA_SCHEMA,
    decode_images,
    extract_audio_features,
    sample_video_frames,
)


def test_read_folder_filters_and_orders(spark, tmp_path):
    (tmp_path / "b.txt").write_text("plain")
    (tmp_path / "a.md").write_text("# Title")
    (tmp_path / "sub").mkdir()
    (tmp_path / "sub" / "c.html").write_text("<p>hi</p>")
    (tmp_path / "skip.xyz").write_text("nope")
    rows = read_folder(spark, str(tmp_path)).collect()
    names = [r["source"].rsplit("/", 1)[-1] for r in rows]
    assert names == ["a.md", "b.txt", "c.html"]  # sorted by full path, ext-filtered
    assert all(r["last_modified"] for r in rows)


def test_convert_stage_isolates_failures(spark, tmp_path):
    (tmp_path / "good.md").write_text("# Fine")
    (tmp_path / "bad.pdf").write_bytes(b"%PDF-fake")
    out = {r["source"].rsplit("/", 1)[-1]: r for r in convert_stage(read_folder(spark, str(tmp_path))).collect()}
    assert out["good.md"]["content"] == "# Fine" and out["good.md"]["convert_error"] is None
    assert out["bad.pdf"]["content"] is None and "NotImplementedError" in out["bad.pdf"]["convert_error"]


def test_convert_bytes_formats():
    assert convert_bytes(b"hello", "txt") == "hello"
    assert "json" in convert_bytes(b'{"a": 1}', "json")
    html = convert_bytes(b"<html><style>x{}</style><body>Hi <b>there</b></body></html>", "html")
    assert "Hi" in html and "<b>" not in html and "x{}" not in html


def test_multimodal_stub_stages(spark):
    rows = [
        ("m1", "image", "image/png", bytearray(b"\x89PNG" + b"x" * 500), json.dumps({"w": 1})),
        ("m2", "audio", "audio/wav", bytearray(b"RIFF" + b"y" * 1600), "{}"),
        ("m3", "video", "video/mp4", bytearray(b"z" * 4096), "{}"),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    img = decode_images(media.filter("modality = 'image'")).first()
    assert len(img["features"]) == 16 and abs(sum(img["features"]) - 1.0) < 1e-6
    aud = extract_audio_features(media.filter("modality = 'audio'")).first()
    assert aud["duration_s"] > 0
    frames = sample_video_frames(media.filter("modality = 'video'")).collect()
    assert len(frames) > 1 and frames[0]["frame_index"] == 0
    # determinism: same payload → same features
    img2 = decode_images(media.filter("modality = 'image'")).first()
    assert img["features"] == img2["features"]


def test_fetch_urls_error_rows(spark):
    out = fetch_urls(spark, ["http://127.0.0.1:1/nope"]).collect()
    assert len(out) == 1
    assert out[0]["fetch_error"] is not None and out[0]["raw_bytes"] is None

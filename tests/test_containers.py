"""MP4/MP3 container parsing (round 5, closing the media-container half
of the mp4/mp3 seam): round-trip against the from-scratch muxers with
known ground truth, exact sample-byte extraction, VBR duration math,
corrupt-payload failure, and the actor-pool pipeline stage."""

from __future__ import annotations

import numpy as np
import pytest

from miru_ray.functions.mp3 import (Mp3Info, decode_frame_payload,
                                    encode_mp3, parse_mp3)
from miru_ray.functions.mp4 import (decode_sample_payload, encode_mp4,
                                    extract_samples, parse_mp4)


def _samples(n: int, seed: int = 5) -> list[bytes]:
    rng = np.random.default_rng(seed)
    return [rng.integers(0, 256, int(rng.integers(16, 200)),
                         dtype=np.int64).astype(np.uint8).tobytes()
            for _ in range(n)]


def test_mp4_roundtrip_metadata():
    samples = _samples(12)
    data = encode_mp4(samples, timescale=1000, sample_delta=40,
                      width=128, height=96, codec=b"avc1")
    info = parse_mp4(data)
    assert info.major_brand == "isom"
    assert info.timescale == 1000
    assert info.duration == 12 * 40
    assert info.duration_s == pytest.approx(0.48)
    (t,) = info.tracks
    assert t.handler == "vide"
    assert t.codec == "avc1"
    assert (t.width, t.height) == (128, 96)
    assert t.n_samples == 12
    assert t.sample_sizes == [len(s) for s in samples]
    assert t.sample_delta == 40


def test_mp4_sample_extraction_exact_bytes():
    samples = _samples(7, seed=9)
    data = encode_mp4(samples)
    assert extract_samples(data) == samples


def test_mp4_corrupt_fails_loudly():
    with pytest.raises(ValueError):
        parse_mp4(b"\x00\x00\x00\x08free")          # no ftyp
    good = encode_mp4(_samples(3))
    with pytest.raises(ValueError):
        parse_mp4(good[:40])                         # truncated moov
    bad = bytearray(good)
    bad[24:28] = (0xFF, 0xFF, 0xFF, 0xFF)            # absurd moov box size
    with pytest.raises(ValueError):
        parse_mp4(bytes(bad))


def test_mp4_payload_decode_is_explicit_seam():
    with pytest.raises(NotImplementedError):
        decode_sample_payload("avc1", b"\x00\x01")


def test_mp3_cbr_duration_and_bitrate():
    data = encode_mp3([128] * 38, sample_rate=44100)
    info = parse_mp3(data)
    assert isinstance(info, Mp3Info)
    assert info.n_frames == 38
    assert info.sample_rate == 44100
    assert not info.is_vbr
    assert info.avg_bitrate_kbps == 128
    assert info.duration_s == pytest.approx(38 * 1152 / 44100)


def test_mp3_vbr_average_and_flag():
    kbps = [96, 128, 192, 128, 96, 320]
    info = parse_mp3(encode_mp3(kbps, sample_rate=48000))
    assert info.is_vbr
    assert info.n_frames == len(kbps)
    assert info.frame_bitrates_kbps == kbps
    assert info.avg_bitrate_kbps == pytest.approx(sum(kbps) / len(kbps))
    assert info.duration_s == pytest.approx(len(kbps) * 1152 / 48000)


def test_mp3_id3_skip_and_leading_junk():
    core = encode_mp3([128] * 5)
    id3 = b"ID3\x04\x00\x00" + bytes([0, 0, 0, 12]) + b"x" * 12
    assert parse_mp3(id3 + core).n_frames == 5
    assert parse_mp3(b"\x12\x34\x56" + core).n_frames == 5   # resync


def test_mp3_truncated_final_frame_dropped():
    data = encode_mp3([128] * 4)
    assert parse_mp3(data[:-10]).n_frames == 3


def test_mp3_garbage_fails_loudly():
    with pytest.raises(ValueError):
        parse_mp3(b"\x00" * 256)
    with pytest.raises(NotImplementedError):
        decode_frame_payload(b"\xff\xfb\x00\x00")


def test_container_pipeline_matches_direct_parse(ray_session):
    from miru_ray.pipelines.multimodal import (container_metadata_pipeline,
                                               container_table)
    n = 24
    got = container_metadata_pipeline(n).to_pandas()
    assert len(got) == n
    src = container_table(n)
    for i in range(n):
        payload = src["payload"][i].as_py()
        row = got.iloc[i]
        if row["container"] == "mp4":
            info = parse_mp4(payload)
            assert row["codec"] == "avc1"
            assert row["duration_s"] == pytest.approx(round(info.duration_s, 6))
            assert row["n_units"] == info.tracks[0].n_samples
            assert row["payload_bytes"] == sum(info.tracks[0].sample_sizes)
        else:
            info = parse_mp3(payload)
            assert row["codec"] == "mp3"
            assert row["n_units"] == info.n_frames
            assert row["duration_s"] == pytest.approx(round(info.duration_s, 6))

"""MP3 frame-header / MP4 box-tree metadata parsing (datapipe.containers).

The decode of codec payloads stays stubbed (multimodal strict mode);
these tests pin the CONTAINER layer: synth -> parse round-trips,
malformed-input rejection, and the Spark map-only plumbing."""

import pytest

from orama_spark.datapipe.containers import (
    container_metadata,
    parse_mp3,
    parse_mp4,
    synth_mp3,
    synth_mp4,
)

MP3_FLEN_128_44100 = 144 * 128000 // 44100


class TestMp3:
    @pytest.mark.parametrize(
        "nf,br,sr,mono,id3",
        [
            (5, 128, 44100, False, None),
            (12, 64, 48000, True, b"hello"),
            (7, 192, 32000, False, b"t"),
            (1, 32, 44100, True, None),
            (40, 320, 44100, False, b"long title here"),
        ],
    )
    def test_roundtrip(self, nf, br, sr, mono, id3):
        m = parse_mp3(synth_mp3(nf, br, sr, mono, id3))
        assert m["container"] == "mp3"
        assert m["mpeg_version"] == 1 and m["layer"] == 3
        assert m["n_frames"] == nf
        assert m["bitrate_kbps"] == br
        assert m["sample_rate"] == sr
        assert m["channels"] == (1 if mono else 2)
        assert m["duration_ms"] == nf * 1152 * 1000 // sr
        assert m["cbr"]

    def test_truncated_tail_frame_not_counted(self):
        b = synth_mp3(5)[: MP3_FLEN_128_44100 * 3 + 10]
        assert parse_mp3(b)["n_frames"] == 3

    def test_id3v1_trailer_stops_walk(self):
        b = synth_mp3(4) + b"TAG" + b"\x00" * 125
        assert parse_mp3(b)["n_frames"] == 4

    def test_vbr_average(self):
        m = parse_mp3(synth_mp3(3, 128) + synth_mp3(3, 64))
        assert m["n_frames"] == 6
        assert not m["cbr"]
        assert m["bitrate_kbps"] == (3 * 128000 + 3 * 64000) // 6000

    def test_garbage_prefix_resync(self):
        # taggers leave junk before the first frame; scan finds the sync
        b = b"\x00junkjunk" + synth_mp3(2)
        assert parse_mp3(b)["n_frames"] == 2

    def test_rejects_non_audio(self):
        assert parse_mp3(b"") is None
        assert parse_mp3(b"\x00" * 100) is None
        assert parse_mp3(synth_mp4(1000)) is None
        # reserved version / bad bitrate index never parse
        assert parse_mp3(bytes([0xFF, 0xEB, 0x00, 0x00]) + b"\x00" * 100) is None
        assert parse_mp3(bytes([0xFF, 0xFB, 0xF0, 0x00]) + b"\x00" * 100) is None


class TestMp4:
    @pytest.mark.parametrize(
        "dur,ts,nt,brand,v1",
        [
            (1000, 1000, 1, "isom", False),
            (2500, 600, 2, "mp42", True),
            (90000, 90000, 3, "dash", False),
            (10, 1000, 1, "isom", True),
        ],
    )
    def test_roundtrip(self, dur, ts, nt, brand, v1):
        m = parse_mp4(synth_mp4(dur, ts, nt, brand, v1))
        assert m["container"] == "mp4"
        assert m["duration_ms"] == dur
        assert m["n_tracks"] == nt
        assert m["brand"] == brand
        assert m["timescale"] == ts

    def test_rejects_non_bmff(self):
        assert parse_mp4(b"") is None
        assert parse_mp4(b"\x00" * 100) is None
        assert parse_mp4(synth_mp3(3)) is None

    def test_malformed_box_size_stops_cleanly(self):
        b = bytearray(synth_mp4(1000))
        b[0:4] = (2 ** 31).to_bytes(4, "big")  # ftyp size > buffer
        assert parse_mp4(bytes(b)) is None


class TestSpark:
    def test_container_metadata_mixed(self, spark):
        rows = [
            (0, synth_mp3(5, 128, 44100)),
            (1, synth_mp4(2500, 600, 2, "mp42", True)),
            (2, b"\x00not media\x00" * 10),
        ]
        media = spark.createDataFrame(rows, "media_id long, payload binary")
        got = {
            r["media_id"]: r.asDict()
            for r in container_metadata(media).collect()
        }
        assert got[0]["container"] == "mp3"
        assert got[0]["duration_ms"] == 5 * 1152 * 1000 // 44100
        assert got[0]["n_frames"] == 5 and got[0]["n_tracks"] is None
        assert got[1]["container"] == "mp4"
        assert got[1]["duration_ms"] == 2500 and got[1]["n_tracks"] == 2
        assert got[1]["brand"] == "mp42" and got[1]["bitrate_kbps"] is None
        assert got[2]["container"] is None

    def test_strict_raises_on_unknown(self, spark):
        media = spark.createDataFrame(
            [(0, b"\x00" * 64)], "media_id long, payload binary"
        )
        with pytest.raises(Exception) as ei:
            container_metadata(media, strict=True).collect()
        assert "unrecognized media container" in str(ei.value)

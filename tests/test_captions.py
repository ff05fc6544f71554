"""Subtitle parsing + caption-frame alignment (multimodal/captions.py)."""

import pytest

from lantern_extras_spark.multimodal import captions as C

SRT = """1
00:00:01,000 --> 00:00:03,500
Hello there.

2
00:00:04,000 --> 00:00:06,000
Second line
continues here.
"""

VTT = """WEBVTT

NOTE this is a comment
and it spans lines

intro
00:01.000 --> 00:03.500
<i>Hello</i> <c.yellow>there</c>.

00:00:04.000 --> 00:00:06.000 align:start
Second cue.
"""


def test_parse_srt():
    cues = C.parse_srt(SRT)
    assert len(cues) == 2
    assert cues[0] == {"start_s": 1.0, "end_s": 3.5, "text": "Hello there."}
    assert cues[1]["text"] == "Second line\ncontinues here."
    with pytest.raises(ValueError, match="timing"):
        C.parse_srt("1\njust text no arrow\n")


def test_parse_vtt():
    cues = C.parse_vtt(VTT)
    assert len(cues) == 2  # NOTE skipped
    assert cues[0] == {"start_s": 1.0, "end_s": 3.5, "text": "Hello there."}
    assert cues[1]["start_s"] == 4.0 and cues[1]["text"] == "Second cue."
    with pytest.raises(ValueError, match="WEBVTT"):
        C.parse_vtt("not a vtt")


def test_parse_caption_bytes_sniff():
    assert C.parse_caption_bytes(SRT.encode())[0]["start_s"] == 1.0
    assert C.parse_caption_bytes(("﻿" + VTT).encode())[0]["end_s"] == 3.5


def test_align_cues():
    cues = C.parse_srt(SRT)
    got = C.align_cues([0.5, 1.0, 3.4999, 3.7, 5.0, 6.0], cues)
    assert got == [None, "Hello there.", "Hello there.", None,
                   "Second line\ncontinues here.", None]


def test_caption_frame_pairs_on_spark(spark):
    """mp4 demux timestamps drive the alignment; frames carry real payloads."""
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_multimodal import _mp4

    frames = [bytes([i]) * 8 for i in range(5)]
    mp4 = _mp4(frames)  # fixture timestamps: i / timescale
    # figure out the demuxed timestamps to write matching cues
    from lantern_extras_spark.multimodal.media import mp4_sample_table

    ts = [t for _, _, t in mp4_sample_table(mp4)]
    srt = "1\n00:00:00,000 --> 00:00:{:06.3f}\nearly cue\n".format(
        (ts[2] + ts[3]) / 2
    ).replace(".", ",", 1)
    # cover frames 0..2 (end mid-way between frame 2 and 3)
    srt = srt.replace(",", ".", 0)
    rows = [(1, bytearray(mp4), bytearray(srt.encode()))]
    df = spark.createDataFrame(rows, "media_id long, media binary, captions binary")
    out = C.caption_frame_pairs(df, n_frames=5).collect()
    assert len(out) == 5
    by_idx = {r["frame_index"]: r for r in out}
    assert bytes(by_idx[0]["frame"]) == frames[0]
    assert by_idx[0]["caption"] == "early cue"
    assert by_idx[4]["caption"] is None
    assert abs(by_idx[4]["timestamp_s"] - ts[4]) < 1e-9
    # non-video rows yield nothing
    junk = spark.createDataFrame(
        [(2, bytearray(b"not video"), None)], "media_id long, media binary, captions binary"
    )
    assert C.caption_frame_pairs(junk).count() == 0

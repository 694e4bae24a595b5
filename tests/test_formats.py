"""Output formats: SRT/VTT/TSV/JSON rendering + word->segment grouping."""

import json

from whisper_tpu.alignment import WordTiming
from whisper_tpu.formats import (
    to_json,
    to_srt,
    to_tsv,
    to_vtt,
    words_to_segments,
)

SEGS = [
    {"start": 0.0, "end": 2.5, "text": " Hello world."},
    {"start": 2.5, "end": 65.321, "text": " Second segment."},
    {"start": 65.4, "end": None, "text": " Open tail."},
]


def test_srt():
    out = to_srt(SEGS)
    assert "1\n00:00:00,000 --> 00:00:02,500\nHello world." in out
    assert "2\n00:00:02,500 --> 00:01:05,321\nSecond segment." in out
    assert "3\n" in out                   # open-ended segment still rendered


def test_vtt():
    out = to_vtt(SEGS)
    assert out.startswith("WEBVTT")
    assert "00:00:02.500 --> 00:01:05.321" in out


def test_tsv():
    lines = to_tsv(SEGS).splitlines()
    assert lines[0] == "start\tend\ttext"
    assert lines[1] == "0\t2500\tHello world."
    assert lines[2] == "2500\t65321\tSecond segment."


def test_json_roundtrip():
    words = [WordTiming(" hi", 0.0, 0.5, [1]), WordTiming(" there", 0.5, 1.0, [2])]
    doc = json.loads(to_json("hi there", SEGS, words, language="en"))
    assert doc["text"] == "hi there"
    assert doc["language"] == "en"
    assert len(doc["segments"]) == 3 and doc["segments"][2]["end"] is None
    assert doc["words"][1]["word"] == " there"


def test_words_to_segments_gap_split():
    words = [WordTiming(" a", 0.0, 0.2, [1]),
             WordTiming(" b", 0.3, 0.5, [2]),
             WordTiming(" c", 3.0, 3.2, [3])]     # 2.5 s pause before c
    segs = words_to_segments(words, max_gap_s=0.8)
    assert len(segs) == 2
    assert segs[0]["text"] == " a b" and segs[1]["text"] == " c"
    assert segs[0]["end"] == 0.5 and segs[1]["start"] == 3.0


def test_words_to_segments_length_split():
    words = [WordTiming(" word" + str(i), i * 0.1, i * 0.1 + 0.05, [i])
             for i in range(40)]
    segs = words_to_segments(words, max_gap_s=10.0, max_len_chars=40)
    assert len(segs) > 1
    assert "".join(s["text"] for s in segs) == "".join(w.word for w in words)

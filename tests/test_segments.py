"""Timestamp segment parsing and long-form prompt conditioning."""

import numpy as np

from whisper_tpu.tokenizer import Tokenizer, build_prompt, split_segments


def test_split_segments_basic(tiny_cfg):
    cfg = tiny_cfg
    tok = Tokenizer(config=cfg)
    ts = cfg.timestamp_begin
    # <|0.00|> hello <|1.00|> <|1.00|> world <|2.50|> <|eot|>
    hello = 7592   # arbitrary text ids; decode() output content not asserted
    world = 995
    ids = [cfg.sot_token, ts + 0, hello, ts + 50, ts + 50, world, ts + 125,
           cfg.eot_token]
    segs = split_segments(cfg, ids, tok)
    assert len(segs) == 2
    assert segs[0]["start"] == 0.0 and segs[0]["end"] == 1.0
    assert segs[1]["start"] == 1.0 and segs[1]["end"] == 2.5
    assert segs[0]["tokens"] == [hello]
    assert segs[1]["tokens"] == [world]


def test_split_segments_window_offset_and_tail(tiny_cfg):
    cfg = tiny_cfg
    tok = Tokenizer(config=cfg)
    ts = cfg.timestamp_begin
    ids = [ts + 10, 42, 43]          # open segment, no closing timestamp
    segs = split_segments(cfg, ids, tok, window_offset_s=30.0)
    assert len(segs) == 1
    assert segs[0]["start"] == 30.0 + 0.2
    assert segs[0]["end"] is None
    assert segs[0]["tokens"] == [42, 43]


def test_build_prompt_with_prev_tokens(tiny_cfg):
    cfg = tiny_cfg
    prev = (100, 200, 300)
    ids = build_prompt(cfg, "en", "transcribe", prev_tokens=prev)
    assert ids[0] == cfg.sot_prev_token == 50361  # <|startofprev|>
    assert tuple(ids[1:4]) == prev
    assert ids[4] == cfg.sot_token
    # tail matches the reference's hardcoded prompt (whisper.mojo:188-191)
    assert ids[4:] == [50258, 50259, 50359, 50363]


def test_build_prompt_timestamp_mode(tiny_cfg):
    ids = build_prompt(tiny_cfg, "en", "transcribe", timestamps=True)
    assert tiny_cfg.no_timestamps_token not in ids

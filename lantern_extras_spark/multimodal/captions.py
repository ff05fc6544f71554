"""Subtitle/caption parsing and frame alignment — the video-TEXT seam.

Video-text training pairs need the text side: captions ship as SRT or WebVTT
next to the media. This module parses both formats into timed cues and
aligns cues to sampled frame timestamps (`mp4_sample_table` /
`mkv_sample_table` emit real per-frame times), producing (frame_ts, text)
pairs ready for CLIP-style contrastive data or frame-caption grounding.

Formats are public and text-based:
- SRT: blocks of `index\\n HH:MM:SS,mmm --> HH:MM:SS,mmm\\n text...`
- WebVTT: `WEBVTT` header, cues `[id\\n] HH:MM:SS.mmm --> HH:MM:SS.mmm
  [settings]\\n text...`; NOTE/STYLE blocks skipped; cue payloads may carry
  inline tags (<i>, <c.class>, voice spans) which are stripped.

Everything is deterministic pure-python over small per-row strings —
exposed both as byte-level parsers (testable without Spark) and as an
Arrow-batched `parse_captions` op mirroring the other media kernels.

No counterpart in the reference; beyond-reference surface (SURVEY.md §2.8).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

_TS = re.compile(r"(\d{1,2}):(\d{2}):(\d{2})[.,](\d{3})")
_SHORT_TS = re.compile(r"^(\d{1,2}):(\d{2})[.,](\d{3})$")
_ARROW = re.compile(
    r"((?:\d{1,2}:)?\d{2}:\d{2}[.,]\d{3})\s*-->\s*((?:\d{1,2}:)?\d{2}:\d{2}[.,]\d{3})"
)
_VTT_TAG = re.compile(r"</?[^>]*>")


def _parse_ts(tok: str) -> float:
    """`HH:MM:SS,mmm` / `HH:MM:SS.mmm` / VTT short `MM:SS.mmm` → seconds."""
    m = _TS.match(tok)
    if m:
        h, mi, s, ms = (int(g) for g in m.groups())
        return h * 3600 + mi * 60 + s + ms / 1000.0
    m = _SHORT_TS.match(tok)
    if m:
        mi, s, ms = (int(g) for g in m.groups())
        return mi * 60 + s + ms / 1000.0
    raise ValueError(f"bad subtitle timestamp {tok!r}")


def parse_srt(text: str) -> list[dict]:
    """SRT → [{start_s, end_s, text}]. Indices are ignored (renumbered files
    are common); blocks without a valid arrow line are a ValueError (a
    half-parsed caption silently misaligns training pairs)."""
    cues = []
    for block in re.split(r"\n\s*\n", text.strip().replace("\r\n", "\n")):
        lines = [ln for ln in block.split("\n") if ln.strip()]
        if not lines:
            continue
        # optional numeric index line
        if lines and lines[0].strip().isdigit():
            lines = lines[1:]
        if not lines:
            continue
        m = _ARROW.search(lines[0])
        if not m:
            raise ValueError(f"SRT block without a timing line: {block[:60]!r}")
        cues.append(
            {
                "start_s": _parse_ts(m.group(1)),
                "end_s": _parse_ts(m.group(2)),
                "text": "\n".join(lines[1:]).strip(),
            }
        )
    return cues


def parse_vtt(text: str) -> list[dict]:
    """WebVTT → [{start_s, end_s, text}] with inline tags stripped; NOTE /
    STYLE / REGION blocks skipped. Missing WEBVTT header is a ValueError."""
    text = text.replace("\r\n", "\n").lstrip("﻿")
    if not text.startswith("WEBVTT"):
        raise ValueError("not a WebVTT payload (missing WEBVTT header)")
    cues = []
    blocks = re.split(r"\n\s*\n", text)[1:]  # drop the header block
    for block in blocks:
        lines = [ln for ln in block.split("\n") if ln.strip()]
        if not lines or lines[0].startswith(("NOTE", "STYLE", "REGION")):
            continue
        # optional cue identifier line before the timing line
        ti = 0 if _ARROW.search(lines[0]) else 1
        if ti >= len(lines) or not _ARROW.search(lines[ti]):
            raise ValueError(f"VTT cue without a timing line: {block[:60]!r}")
        m = _ARROW.search(lines[ti])
        payload = "\n".join(lines[ti + 1 :])
        payload = _VTT_TAG.sub("", payload).strip()
        cues.append(
            {"start_s": _parse_ts(m.group(1)), "end_s": _parse_ts(m.group(2)), "text": payload}
        )
    return cues


def parse_caption_bytes(data: bytes) -> list[dict]:
    """Sniff + parse: WEBVTT header → VTT, else SRT. UTF-8 with BOM/replace
    (subtitle files in the wild are dirty)."""
    text = bytes(data).decode("utf-8", "replace").lstrip("﻿")
    return parse_vtt(text) if text.startswith("WEBVTT") else parse_srt(text)


def align_cues(frame_ts: list[float], cues: list[dict]) -> list[str | None]:
    """For each frame timestamp, the text of the cue covering it
    ([start_s, end_s); first match wins on overlaps), or None when no cue
    covers the frame. Two-pointer sweep over time-sorted inputs — O(F + C)."""
    order = sorted(range(len(cues)), key=lambda i: (cues[i]["start_s"], i))
    out: list[str | None] = []
    for t in frame_ts:
        hit = None
        for i in order:
            c = cues[i]
            if c["start_s"] <= t < c["end_s"]:
                hit = c["text"]
                break
            if c["start_s"] > t:
                break
        out.append(hit)
    return out


def caption_frame_pairs(
    df: DataFrame,
    media_col: str = "media",
    captions_col: str = "captions",
    id_col: str = "media_id",
    n_frames: int = 4,
) -> DataFrame:
    """Spark op: (media binary, captions binary) rows → one row per sampled
    frame with its covering caption: (media_id, frame_index, timestamp_s,
    frame binary, caption string|null). Demux rides `mp4_sample_table` /
    `mkv_sample_table` (real per-frame timestamps); rows whose media is not
    a demuxable video yield nothing. Arrow-batched mapInPandas — a pure
    projection, no shuffle, the same plan shape as the other media kernels."""
    import pandas as pd

    from lantern_extras_spark.multimodal.media import (
        _EBML_MAGIC,
        mkv_sample_table,
        mp4_sample_table,
    )

    schema = (
        f"{id_col} long, frame_index int, timestamp_s double, "
        "frame binary, caption string"
    )

    def extract(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                raw = bytes(r[media_col]) if r[media_col] is not None else b""
                try:
                    if len(raw) >= 12 and raw[4:8] == b"ftyp":
                        table = mp4_sample_table(raw)
                    elif raw[:4] == _EBML_MAGIC:
                        table = mkv_sample_table(raw)
                    else:
                        continue
                    cues = (
                        parse_caption_bytes(bytes(r[captions_col]))
                        if r[captions_col] is not None
                        else []
                    )
                except ValueError:
                    continue
                if not table:
                    continue
                want = sorted(
                    set(
                        int(round(i * (len(table) - 1) / max(n_frames - 1, 1)))
                        for i in range(n_frames)
                    )
                )
                ts = [table[i][2] for i in want]
                caps = align_cues(ts, cues)
                for j, i in enumerate(want):
                    off, sz, t = table[i]
                    rows.append(
                        {
                            id_col: r[id_col],
                            "frame_index": i,
                            "timestamp_s": t,
                            "frame": raw[off : off + sz],
                            "caption": caps[j],
                        }
                    )
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_index", "timestamp_s", "frame", "caption"]
            )

    return df.select(id_col, media_col, captions_col).mapInPandas(extract, schema)

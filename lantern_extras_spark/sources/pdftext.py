"""Baseline PDF text extraction — codec-free, stdlib zlib only.

Books/papers corpora arrive as PDFs; the text lives in content streams as
operator programs (`BT ... (string) Tj ... ET`). This module implements the
BASELINE extraction path that covers the bulk of machine-generated PDFs:

- object scan: `N G obj ... stream\\r?\\n <bytes> endstream` pairs located
  structurally (no xref needed — robust to the incremental-update trailers
  real PDFs accumulate);
- FlateDecode via stdlib zlib (the overwhelmingly dominant filter for text
  content); uncompressed streams pass through; other filters (LZW, DCT,
  CCITT — images mostly) are skipped;
- content-stream tokenizer for the text operators: `Tj`, `'`, `\"` (show
  string), `TJ` (array show with kerning numbers), `Td/TD/T*` (line moves →
  newlines), with PDF string syntax: nested parens, `\\)` escapes, octal
  escapes, `<hex>` strings;
- encoding: bytes are mapped through Latin-1 after undoing escapes —
  correct for the standard encodings' printable range (ASCII/WinAnsi);
  CID/Identity-H 2-byte fonts (embedded subsets) produce garbage text, so
  streams whose decoded text is mostly non-printable are DROPPED rather
  than emitted (honest degradation: no silent mojibake into the corpus).

NOT implemented (documented limits, the long tail a full PDF stack owns):
encrypted PDFs (detected → ValueError), font ToUnicode cmaps, layout
reconstruction beyond line breaks. The quality screens downstream
(gopher_filter, language_id) are the second line of defense — exactly how
production corpus pipelines treat PDF extraction output.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

_STREAM_RE = re.compile(rb"stream\r?\n")
_TEXT_OPS_RE = re.compile(
    rb"""
    (?P<str>\((?:[^()\\]|\\.|\([^()]*\))*\))\s*(?P<op1>Tj|'|")
  | (?P<arr>\[(?:[^\]\\]|\\.)*\])\s*TJ
  | (?P<hex><[0-9A-Fa-f\s]*>)\s*(?P<op2>Tj|'|")
  | (?P<nl>T\*|TD|Td|TL)
  | (?P<et>ET)
    """,
    re.VERBOSE | re.DOTALL,
)
_ESC = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _pdf_string_bytes(tok: bytes) -> bytes:
    """Decode a PDF literal string `(...)` — escapes, octal, nested parens."""
    out = bytearray()
    i = 1
    end = len(tok) - 1
    while i < end:
        c = tok[i : i + 1]
        if c == b"\\":
            nxt = tok[i + 1 : i + 2]
            if nxt.isdigit():
                j = i + 1
                while j < min(i + 4, end) and tok[j : j + 1].isdigit():
                    j += 1
                out.append(int(tok[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            out += _ESC.get(nxt, nxt)
            i += 2
            continue
        out += c
        i += 1
    return bytes(out)


def _looks_texty(s: str) -> bool:
    """Drop CID/Identity-H garbage: require mostly printable, some letters."""
    if not s.strip():
        return False
    printable = sum(ch.isprintable() or ch in "\n\t " for ch in s)
    letters = sum(ch.isalpha() or ch.isspace() for ch in s)
    return printable / len(s) > 0.9 and letters / len(s) > 0.5


def parse_pdf_text(data: bytes) -> str:
    """Extract text from a PDF's content streams (baseline path — see module
    docstring for covered/uncovered ground). Encrypted PDFs raise; PDFs with
    no extractable text return ''. Line-move operators become newlines so
    the output feeds the line-based quality ops."""
    data = bytes(data)
    if data[:5] != b"%PDF-":
        raise ValueError("not a PDF payload (missing %PDF- header)")
    if re.search(rb"/Encrypt\s", data):
        raise ValueError("encrypted PDF (decryption not implemented)")
    parts: list[str] = []
    pos = 0
    while True:
        m = _STREAM_RE.search(data, pos)
        if not m:
            break
        start = m.end()
        end = data.find(b"endstream", start)
        if end < 0:
            break
        pos = end + 9
        raw = data[start:end]
        # only ONE EOL belongs to the stream/endstream framing — a blanket
        # rstrip can eat real trailing 0x0D/0x0A bytes of a Flate stream
        body = raw
        if body.endswith(b"\r\n"):
            body = body[:-2]
        elif body[-1:] in (b"\n", b"\r"):
            body = body[:-1]
        try:
            body = zlib.decompress(body)
        except zlib.error:
            try:
                body = zlib.decompress(raw)  # EOL bytes were stream data
            except zlib.error:
                pass  # uncompressed stream, or a non-Flate filter (skipped below)
        if b"BT" not in body or (b"Tj" not in body and b"TJ" not in body and b"'" not in body):
            continue
        buf: list[str] = []
        for tm in _TEXT_OPS_RE.finditer(body):
            if tm.group("str"):
                buf.append(_pdf_string_bytes(tm.group("str")).decode("latin-1"))
                if tm.group("op1") in (b"'", b'"'):
                    buf.append("\n")
            elif tm.group("arr"):
                for sm in re.finditer(
                    rb"\((?:[^()\\]|\\.|\([^()]*\))*\)", tm.group("arr")
                ):
                    buf.append(_pdf_string_bytes(sm.group(0)).decode("latin-1"))
            elif tm.group("hex"):
                hx = re.sub(rb"\s", b"", tm.group("hex"))[1:-1]
                if len(hx) % 2:
                    hx += b"0"
                buf.append(bytes.fromhex(hx.decode("ascii")).decode("latin-1"))
                if tm.group("op2") in (b"'", b'"'):
                    buf.append("\n")
            elif tm.group("nl"):
                if tm.group("nl") != b"TL":
                    buf.append("\n")
            elif tm.group("et"):
                buf.append("\n")
        text = "".join(buf)
        text = re.sub(r"[ \t]+", " ", text)
        text = re.sub(r" ?\n ?", "\n", text)
        text = re.sub(r"\n{3,}", "\n\n", text).strip()
        if text and _looks_texty(text):
            parts.append(text)
    return "\n\n".join(parts)


def pdf_text(df: DataFrame, media_col: str = "media", out_col: str = "text") -> DataFrame:
    """Attach extracted PDF text per binary row (Arrow-batched, rides the
    scan). Non-PDF / encrypted / no-text rows get NULL — extraction
    semantics, same stance as the other media kernels."""
    from pyspark.sql.types import StringType, StructField, StructType

    fields = df.schema.fields + [StructField(out_col, StringType())]
    out_schema = StructType(fields)
    cols = [f.name for f in df.schema.fields]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for data in pdf[media_col]:
                try:
                    t = parse_pdf_text(bytes(data))
                    outs.append(t or None)
                except Exception:
                    outs.append(None)
            pdf[out_col] = outs
            yield pdf[cols + [out_col]]

    return df.mapInPandas(extract, out_schema)


def read_pdf_text(spark: SparkSession, path: str) -> DataFrame:
    """Read PDF file(s) → (path, text) via binaryFile + `pdf_text` (one task
    per file; PDFs are not splittable)."""
    from pyspark.sql import functions as F

    binary = spark.read.format("binaryFile").load(path)
    return pdf_text(
        binary.select(F.col("path"), F.col("content").alias("media")), "media"
    ).select("path", "text")

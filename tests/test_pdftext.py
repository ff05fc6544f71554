"""Baseline PDF text extraction (sources/pdftext.py) — fixtures built by an
independent minimal PDF writer."""

import zlib

import pytest

from lantern_extras_spark.sources import pdftext as P


def _pdf(content_streams, compress=True, encrypted=False):
    """Minimal structurally-valid-enough PDF: header + N content streams."""
    out = bytearray(b"%PDF-1.4\n")
    if encrypted:
        out += b"trailer << /Encrypt 5 0 R >>\n"
    for i, cs in enumerate(content_streams):
        body = zlib.compress(cs) if compress else cs
        out += b"%d 0 obj\n<< /Length %d %s>>\nstream\n" % (
            i + 1, len(body), b"/Filter /FlateDecode " if compress else b"")
        out += body + b"\nendstream\nendobj\n"
    out += b"%%EOF\n"
    return bytes(out)


CS1 = (
    b"BT /F1 12 Tf 72 720 Td (Hello PDF world) Tj 0 -14 Td "
    b"[(kerned ) -120 (text) 20 ( here)] TJ ET"
)
CS2 = b"BT (Second \\(escaped\\) line \\101\\102) ' <48692068657821> Tj ET"


def test_parse_pdf_text_basic():
    text = P.parse_pdf_text(_pdf([CS1, CS2]))
    assert "Hello PDF world" in text
    assert "kerned text here" in text          # TJ kerning numbers dropped
    assert "Second (escaped) line AB" in text  # escapes + octal
    assert "Hi hex!" in text                   # hex string
    # Td line move -> newline between the two shows
    assert text.index("Hello PDF world") < text.index("kerned")
    assert "\n" in text


def test_parse_pdf_uncompressed_and_mixed():
    text = P.parse_pdf_text(_pdf([CS1], compress=False))
    assert "Hello PDF world" in text
    # image-ish binary stream mixed in is skipped, text still comes out
    img = b"\xff\xd8\xff" + bytes(range(256)) * 4
    text = P.parse_pdf_text(_pdf([img, CS1]))
    assert "Hello PDF world" in text


def test_parse_pdf_cid_garbage_dropped():
    """A 2-byte-CID-looking stream (mostly non-printable after latin-1)
    must be dropped, not emitted as mojibake."""
    cid = b"BT (\x00H\x00e\x00l\x00l\x00o\x01\x02\x03\x04\x05\x06\x07\x08) Tj ET"
    assert P.parse_pdf_text(_pdf([cid])) == ""
    # but it must not poison a good stream next to it
    assert "Hello PDF world" in P.parse_pdf_text(_pdf([cid, CS1]))


def test_parse_pdf_flate_trailing_eol_bytes():
    """Flate streams whose COMPRESSED bytes end in 0x0A/0x0D: only one EOL
    belongs to the stream/endstream framing — a blanket rstrip destroys the
    stream tail and silently drops its text."""
    import random

    rng = random.Random(0)

    def content_with_tail(last):
        # seeded search for string content whose COMPRESSED bytes end in
        # the target EOL byte(s) — found within ~100 tries in practice
        for _ in range(50_000):
            junk = bytes(rng.randrange(32, 127) for _ in range(rng.randrange(4, 24)))
            junk = junk.replace(b"(", b"x").replace(b")", b"y").replace(b"\\", b"z")
            cs = b"BT (EOL survivor " + junk + b") Tj ET"
            if zlib.compress(cs).endswith(last):
                return cs
        pytest.fail(f"no content produced a compressed tail {last!r}")

    for last in (b"\n", b"\r", b"\r\n"):
        cs = content_with_tail(last)
        # normal framing (one EOL before endstream): strip exactly it
        assert "EOL survivor" in P.parse_pdf_text(_pdf([cs]))
        # lenient framing (no EOL before endstream): the trailing byte IS
        # stream data — the retry-with-unstripped-body path must recover it
        body = zlib.compress(cs)
        raw = (
            b"%PDF-1.4\n1 0 obj\n<< /Length "
            + str(len(body)).encode()
            + b" /Filter /FlateDecode >>\nstream\n"
            + body
            + b"endstream\nendobj\n%%EOF\n"
        )
        assert "EOL survivor" in P.parse_pdf_text(raw)


def test_parse_pdf_failures():
    with pytest.raises(ValueError, match="PDF"):
        P.parse_pdf_text(b"not a pdf")
    with pytest.raises(ValueError, match="encrypted"):
        P.parse_pdf_text(_pdf([CS1], encrypted=True))
    assert P.parse_pdf_text(b"%PDF-1.4\nno streams\n%%EOF") == ""


def test_pdf_text_on_spark(spark, tmp_path):
    rows = [
        (1, bytearray(_pdf([CS1]))),
        (2, bytearray(b"not a pdf")),
        (3, bytearray(_pdf([CS1], encrypted=True))),
    ]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    got = {r["media_id"]: r["text"] for r in P.pdf_text(df).collect()}
    assert "Hello PDF world" in got[1]
    assert got[2] is None and got[3] is None
    # file-level reader
    (tmp_path / "a.pdf").write_bytes(_pdf([CS1, CS2]))
    out = P.read_pdf_text(spark, str(tmp_path / "*.pdf")).first()
    assert "Hi hex!" in out["text"]

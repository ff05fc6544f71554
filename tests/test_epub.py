"""EPUB text extraction (sources/epub.py) — independent zip/OPF fixtures."""

import io
import zipfile

import pytest

from lantern_extras_spark.sources import epub as E

CH1 = "<html><body><h1>Chapter One</h1><p>It was a dark &amp; stormy night.</p></body></html>"
CH2 = "<html><body><h1>Chapter Two</h1><p>The plot thickens.</p><style>p{}</style></body></html>"


def _epub(chapter_order=("c2", "c1"), drm=False, broken_opf=False):
    """Spine deliberately lists c2 before c1 to prove spine order wins."""
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("mimetype", "application/epub+zip")
        z.writestr(
            "META-INF/container.xml",
            '<container><rootfiles><rootfile full-path="OEBPS/content.opf"/></rootfiles></container>',
        )
        if drm:
            z.writestr("META-INF/encryption.xml", "<encryption/>")
        manifest = (
            '<item id="c1" href="ch1.xhtml" media-type="application/xhtml+xml"/>'
            '<item href="ch2.xhtml" id="c2" media-type="application/xhtml+xml"/>'
        )
        spine = "".join(f'<itemref idref="{c}"/>' for c in chapter_order)
        opf = f"<package><manifest>{manifest}</manifest><spine>{spine}</spine></package>"
        z.writestr("OEBPS/content.opf", "BROKEN" if broken_opf else opf)
        z.writestr("OEBPS/ch1.xhtml", CH1)
        z.writestr("OEBPS/ch2.xhtml", CH2)
    return buf.getvalue()


def test_parse_epub_spine_order_and_extraction():
    chapters = E.parse_epub_text(_epub())
    assert [c["href"] for c in chapters] == ["OEBPS/ch2.xhtml", "OEBPS/ch1.xhtml"]
    assert chapters[0]["text"].startswith("Chapter Two")
    assert "plot thickens" in chapters[0]["text"]
    assert "dark & stormy" in chapters[1]["text"]  # entity decoded
    assert "p{}" not in chapters[0]["text"]        # style content dropped


def test_parse_epub_fallbacks_and_failures():
    # broken OPF -> member-order fallback still extracts both chapters
    chapters = E.parse_epub_text(_epub(broken_opf=True))
    assert {c["href"] for c in chapters} == {"OEBPS/ch1.xhtml", "OEBPS/ch2.xhtml"}
    with pytest.raises(ValueError, match="DRM"):
        E.parse_epub_text(_epub(drm=True))
    with pytest.raises(ValueError, match="zip"):
        E.parse_epub_text(b"not a zip at all")


def test_read_epub_on_spark(spark, tmp_path):
    (tmp_path / "book1.epub").write_bytes(_epub())
    (tmp_path / "bad.epub").write_bytes(b"junk not zip")
    df = E.read_epub(spark, str(tmp_path / "*.epub"))
    rows = df.orderBy("chapter_index").collect()
    assert len(rows) == 2  # bad book yields nothing
    assert rows[0]["chapter_index"] == 0 and "Chapter Two" in rows[0]["text"]
    # feeds the text pipeline directly
    from lantern_extras_spark.operators.textstats import quality_metrics
    from pyspark.sql import functions as F

    q = quality_metrics(df.select(F.monotonically_increasing_id().alias("doc_id"), "text"))
    assert q.count() == 2

"""EPUB (e-book) text extraction — stdlib zipfile + the in-repo HTML kernel.

Books corpora ship as EPUB: a zip whose `META-INF/container.xml` points at
an OPF package; the OPF's `<spine>` lists chapter ids in READING ORDER and
its `<manifest>` maps ids to (x)html hrefs. Extraction here follows the
spine (falling back to zip-member order when the package is malformed) and
runs each chapter through `functions.text.html_text_py` — the same
parser-grade HTML→text kernel the crawl path uses, so book and web text get
identical cleanup semantics.

Spark stance: one task per book (`binaryFile`; zip needs its central
directory, books are small relative to executors, the corpus axis is book
count). DRM-protected books (encryption.xml) raise — honest, like encrypted
PDFs. Part of the beyond-reference training-pipeline surface.
"""

from __future__ import annotations

import io
import re
import zipfile
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from lantern_extras_spark.functions.text import html_text_py


def _spine_hrefs(z: zipfile.ZipFile) -> list[str] | None:
    """Chapter hrefs in reading order from container.xml → OPF spine/manifest
    (regex-parsed — the two files are tiny and the attributes fixed); None
    when the package plumbing is missing/malformed."""
    try:
        container = z.read("META-INF/container.xml").decode("utf-8", "replace")
    except KeyError:
        return None
    m = re.search(r'full-path="([^"]+)"', container)
    if not m:
        return None
    opf_path = m.group(1)
    try:
        opf = z.read(opf_path).decode("utf-8", "replace")
    except KeyError:
        return None
    base = opf_path.rsplit("/", 1)[0] + "/" if "/" in opf_path else ""
    manifest = {
        i: h
        for i, h in re.findall(
            r'<item[^>]*\bid="([^"]+)"[^>]*\bhref="([^"]+)"[^>]*/?>',
            opf,
        )
    }
    # href may precede id in the tag; second pass with swapped order
    for h, i in re.findall(
        r'<item[^>]*\bhref="([^"]+)"[^>]*\bid="([^"]+)"[^>]*/?>', opf
    ):
        manifest.setdefault(i, h)
    idrefs = re.findall(r'<itemref[^>]*\bidref="([^"]+)"', opf)
    hrefs = [base + manifest[i] for i in idrefs if i in manifest]
    return hrefs or None


def parse_epub_text(data: bytes) -> list[dict]:
    """One EPUB's bytes → [{chapter_index, href, text}] in reading order.
    DRM (META-INF/encryption.xml) raises; non-zip raises; books whose OPF is
    broken fall back to zip-member order over .xhtml/.html members."""
    try:
        z = zipfile.ZipFile(io.BytesIO(bytes(data)))
    except zipfile.BadZipFile as e:
        raise ValueError(f"not an EPUB (bad zip): {e}") from e
    names = set(z.namelist())
    if "META-INF/encryption.xml" in names:
        raise ValueError("DRM-protected EPUB (encryption.xml present)")
    hrefs = _spine_hrefs(z)
    if hrefs is None:
        hrefs = [n for n in z.namelist() if n.lower().endswith((".xhtml", ".html", ".htm"))]
    out = []
    for idx, href in enumerate(hrefs):
        if href not in names:
            continue
        html = z.read(href).decode("utf-8", "replace")
        text = html_text_py(html)
        if text:
            out.append({"chapter_index": idx, "href": href, "text": text})
    return out


def read_epub(spark: SparkSession, path: str) -> DataFrame:
    """Read EPUB file(s) → (path, chapter_index, href, text) — one task per
    book, chapters in spine order; DRM/corrupt books yield no rows (logged
    by absence, the extraction stance)."""
    binary = spark.read.format("binaryFile").load(path)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                try:
                    chapters = parse_epub_text(bytes(row["content"]))
                except ValueError:
                    continue
                if chapters:
                    out = pd.DataFrame(chapters)
                    out.insert(0, "path", row["path"])
                    yield out[["path", "chapter_index", "href", "text"]]

    return binary.select("path", "content").mapInPandas(
        extract, "path string, chapter_index int, href string, text string"
    )

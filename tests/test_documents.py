"""LaTeX detex + Jupyter notebook extraction (sources/documents.py)."""

import json

import pytest

from lantern_extras_spark.sources import documents as D

LATEX = r"""
\documentclass{article}
\usepackage{amsmath}
% a comment line
\begin{document}
\title{A \textbf{Bold} Title}
\section{Intro}
We study $x^2 + y^2$ and cite~\cite{foo2020}.
The escaped 100\% case stays. % trailing comment
\begin{equation}
  E = mc^2
\end{equation}
\begin{itemize}
\item first point
\item second \emph{nested \textit{point}}
\end{itemize}
Long dash --- short dash -- done.\\
\end{document}
"""


def test_latex_to_text():
    t = D.latex_to_text(LATEX)
    assert "A Bold Title" in t
    assert "Intro" in t and "We study" in t
    assert "x^2" not in t and "E = mc^2" not in t   # math dropped
    assert "a comment line" not in t
    assert "100% case stays" in t                    # escaped percent
    assert "foo2020" not in t                        # cite dropped
    assert "- first point" in t and "second nested point" in t
    assert "—" in t and "–" in t
    assert "\\" not in t and "{" not in t


def test_latex_nested_drop_envs():
    s = r"\begin{figure}\begin{tabular}{cc}a&b\end{tabular}\caption{Kept caption}\end{figure}After."
    t = D.latex_to_text(s)
    assert "After." in t and "a&b" not in t
    # figure env is dropped whole - caption inside goes with it (documented
    # baseline behavior: non-prose environments drop their body)
    assert "Kept caption" not in t


def _nb(cells):
    return json.dumps({"nbformat": 4, "cells": cells}).encode()


def test_parse_ipynb():
    nb = _nb([
        {"cell_type": "markdown", "source": ["# Title\n", "prose here"]},
        {"cell_type": "code", "source": "print('hi')",
         "outputs": [{"output_type": "stream", "text": ["hi\n"]}]},
    ])
    cells = D.parse_ipynb(nb)
    assert cells[0]["text"] == "# Title\nprose here"
    assert cells[1]["cell_type"] == "code" and cells[1]["text"] == "print('hi')"
    with_out = D.parse_ipynb(nb, include_outputs=True)
    assert "# --- output ---" in with_out[1]["text"] and "hi" in with_out[1]["text"]
    with pytest.raises(ValueError, match="JSON"):
        D.parse_ipynb(b"{broken")
    with pytest.raises(ValueError, match="cells"):
        D.parse_ipynb(b'{"not": "a notebook"}')


def test_latex_and_notebooks_on_spark(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1, LATEX), (2, None)], "doc_id long, text string")
    got = {r["doc_id"]: r["detexed"] for r in D.latex_text(df).collect()}
    assert "A Bold Title" in got[1] and got[2] is None

    nb = _nb([{"cell_type": "code", "source": "x = 1"}])
    rows = [(1, bytearray(nb)), (2, bytearray(b"not json"))]
    cells = D.notebook_cells(
        spark.createDataFrame(rows, "media_id long, media binary")
    ).collect()
    assert len(cells) == 1 and cells[0]["text"] == "x = 1"


def _docx(paragraphs):
    """Independent minimal DOCX writer (zip + OOXML document part)."""
    import io
    import zipfile

    ns = 'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main"'
    body = ""
    for runs in paragraphs:
        body += "<w:p>"
        for kind, val in runs:
            if kind == "t":
                body += f"<w:r><w:t>{val}</w:t></w:r>"
            elif kind == "tab":
                body += "<w:r><w:tab/></w:r>"
            elif kind == "br":
                body += "<w:r><w:br/></w:r>"
        body += "</w:p>"
    doc = f'<?xml version="1.0"?><w:document {ns}><w:body>{body}</w:body></w:document>'
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("word/document.xml", doc)
    return buf.getvalue()


def test_parse_docx_text(spark):
    data = _docx([
        [("t", "Title of the doc")],
        [("t", "alpha "), ("t", "beta"), ("tab", None), ("t", "gamma")],
        [("t", "line one"), ("br", None), ("t", "line two &amp; entity")],
    ])
    t = D.parse_docx_text(data)
    assert t.split("\n")[0] == "Title of the doc"
    assert "alpha beta\tgamma" in t
    assert "line one\nline two & entity" in t  # ET decodes entities
    with pytest.raises(ValueError, match="DOCX"):
        D.parse_docx_text(b"not a zip")
    # Spark op: NULL for junk, text for real rows
    rows = [(1, bytearray(data)), (2, bytearray(b"junk"))]
    df = spark.createDataFrame(rows, "media_id long, media binary")
    got = {r["media_id"]: r["text"] for r in D.docx_text(df).collect()}
    assert got[2] is None and "Title of the doc" in got[1]

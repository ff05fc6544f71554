"""Document-format text extraction: LaTeX (arXiv corpora) and Jupyter
notebooks (code corpora) — plain-python kernels + Arrow-batched Spark ops,
completing the ingestion matrix next to WARC/WET (web), PDF, EPUB (books),
and WebDataset (multimodal).

Both are BASELINE extractors by design: the goal is clean training text,
not rendering fidelity; downstream quality screens (gopher_filter,
language_id) own the long tail — the same stance as pdftext.py.
"""

from __future__ import annotations

import json
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# commands whose single braced argument IS content (unwrap, keep the text)
_LATEX_UNWRAP = (
    "textbf", "textit", "texttt", "emph", "underline", "textsc", "textrm",
    "mbox", "text", "section", "subsection", "subsubsection", "paragraph",
    "chapter", "title", "caption", "footnote",
)
# environments whose BODY is dropped whole (non-prose)
_LATEX_DROP_ENV = (
    "equation", "align", "eqnarray", "math", "displaymath", "tabular",
    "verbatim", "lstlisting", "figure", "table", "tikzpicture", "algorithm",
    "algorithmic", "array", "matrix",
)


def latex_to_text(src: str, max_passes: int = 8) -> str:
    """Baseline detex: comments stripped (escaped \\% kept), math segments
    ($..$, $$..$$, \\[..\\], \\(..\\), drop-environments) removed, sectioning
    and emphasis commands unwrapped to their argument (iteratively, so
    nesting resolves), remaining \\commands dropped, ~/-- typography
    normalized, whitespace collapsed line-preserving. Good enough for the
    arXiv-source → training-text path; a full TeX engine it is not."""
    s = src.replace("\r\n", "\n")
    s = re.sub(r"(?<!\\)%[^\n]*", "", s)            # comments
    s = s.replace(r"\%", "%")
    # drop non-prose environments (starred too), innermost-first iteration
    env = "|".join(_LATEX_DROP_ENV)
    for _ in range(max_passes):
        s2 = re.sub(
            rf"\\begin\{{({env})\*?\}}(?:(?!\\begin\{{(?:{env})).)*?\\end\{{\1\*?\}}",
            " ",
            s,
            flags=re.DOTALL,
        )
        if s2 == s:
            break
        s = s2
    s = re.sub(r"\$\$.*?\$\$", " ", s, flags=re.DOTALL)
    s = re.sub(r"(?<!\\)\$[^$]*\$", " ", s)
    s = re.sub(r"\\\[.*?\\\]", " ", s, flags=re.DOTALL)
    s = re.sub(r"\\\(.*?\\\)", " ", s)
    # sectioning becomes its own line
    s = re.sub(r"\\(?:sub)*section\*?\{", "\n\\\\section{", s)
    # unwrap content commands iteratively (nesting)
    unwrap = "|".join(_LATEX_UNWRAP)
    for _ in range(max_passes):
        s2 = re.sub(rf"\\(?:{unwrap})\*?(?:\[[^\]]*\])?\{{([^{{}}]*)\}}", r"\1\n" if False else r"\1", s)
        if s2 == s:
            break
        s = s2
    s = re.sub(r"\\begin\{[^}]*\}|\\end\{[^}]*\}", " ", s)
    s = re.sub(r"\\(?:cite|ref|eqref|label|cref|autoref|input|include|includegraphics|bibliography|bibliographystyle|usepackage|documentclass)\*?(?:\[[^\]]*\])?(?:\{[^{}]*\})?", " ", s)
    s = re.sub(r"\\item\b", "\n- ", s)
    s = re.sub(r"\\\\(?:\[[^\]]*\])?", "\n", s)      # line breaks
    s = re.sub(r"\\[A-Za-z@]+\*?(?:\[[^\]]*\])?", " ", s)  # leftover commands
    s = s.replace("~", " ").replace("---", "—").replace("--", "–")
    s = re.sub(r"[{}]", "", s)
    s = re.sub(r"[ \t]+", " ", s)
    s = re.sub(r" ?\n ?", "\n", s)
    s = re.sub(r"\n{3,}", "\n\n", s)
    return s.strip()


def parse_ipynb(data: bytes, include_outputs: bool = False) -> list[dict]:
    """Jupyter notebook bytes → [{cell_index, cell_type, text}] (markdown +
    code cells; raw cells kept as-is). `source` may be a string or a line
    list per the nbformat spec. With include_outputs, each code cell's
    stream/text outputs are appended (fenced) — useful for execution-traced
    code corpora. Malformed JSON raises."""
    try:
        nb = json.loads(bytes(data).decode("utf-8", "replace"))
    except json.JSONDecodeError as e:
        raise ValueError(f"not a Jupyter notebook (bad JSON): {e}") from e
    cells = nb.get("cells")
    if not isinstance(cells, list):
        raise ValueError("not a Jupyter notebook (no cells list)")
    out = []
    for i, cell in enumerate(cells):
        src = cell.get("source", "")
        text = "".join(src) if isinstance(src, list) else str(src)
        if include_outputs and cell.get("cell_type") == "code":
            chunks = []
            for o in cell.get("outputs", []):
                t = o.get("text") or (o.get("data", {}) or {}).get("text/plain")
                if t:
                    chunks.append("".join(t) if isinstance(t, list) else str(t))
            if chunks:
                text += "\n# --- output ---\n" + "\n".join(chunks)
        out.append(
            {"cell_index": i, "cell_type": cell.get("cell_type", "raw"), "text": text}
        )
    return out


_W_NS = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"


def parse_docx_text(data: bytes) -> str:
    """DOCX → text: stdlib zipfile + ElementTree over word/document.xml —
    paragraphs become lines, runs concatenate, w:tab → tab, w:br → newline
    (the OOXML spec structure; no third-party deps). Malformed zip/XML or a
    missing document part raises; empty documents return ''."""
    import io
    import xml.etree.ElementTree as ET
    import zipfile

    try:
        z = zipfile.ZipFile(io.BytesIO(bytes(data)))
        xml_bytes = z.read("word/document.xml")
    except (zipfile.BadZipFile, KeyError) as e:
        raise ValueError(f"not a DOCX payload: {e}") from e
    try:
        root = ET.fromstring(xml_bytes)
    except ET.ParseError as e:
        raise ValueError(f"DOCX document.xml does not parse: {e}") from e
    lines = []
    for p in root.iter(f"{_W_NS}p"):
        parts: list[str] = []
        for node in p.iter():
            if node.tag == f"{_W_NS}t":
                parts.append(node.text or "")
            elif node.tag == f"{_W_NS}tab":
                parts.append("\t")
            elif node.tag == f"{_W_NS}br":
                parts.append("\n")
        lines.append("".join(parts))
    return "\n".join(lines).strip()


def docx_text(df: DataFrame, media_col: str = "media", out_col: str = "text") -> DataFrame:
    """Attach extracted DOCX text per binary row; non-DOCX rows get NULL
    (extraction semantics, same stance as pdf_text)."""
    from pyspark.sql.types import StringType, StructField, StructType

    fields = df.schema.fields + [StructField(out_col, StringType())]
    out_schema = StructType(fields)
    cols = [f.name for f in df.schema.fields]

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for data in pdf[media_col]:
                try:
                    t = parse_docx_text(bytes(data))
                    outs.append(t or None)
                except Exception:
                    outs.append(None)
            pdf[out_col] = outs
            yield pdf[cols + [out_col]]

    return df.mapInPandas(extract, out_schema)


def latex_text(df: DataFrame, src_col: str = "text", out_col: str = "detexed") -> DataFrame:
    """Attach detexed text per row (Arrow-batched pandas UDF over the plain
    kernel; NULL in → NULL out)."""
    from pyspark.sql.functions import col, pandas_udf

    def _fn(s):
        return s.map(lambda x: None if x is None else latex_to_text(x))

    _fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return df.withColumn(out_col, pandas_udf(_fn, "string")(col(src_col)))


def notebook_cells(
    df: DataFrame,
    media_col: str = "media",
    id_col: str = "media_id",
    include_outputs: bool = False,
) -> DataFrame:
    """(id, ipynb binary) rows → one row per cell (id, cell_index,
    cell_type, text); malformed notebooks yield nothing."""
    schema = f"{id_col} long, cell_index int, cell_type string, text string"

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                try:
                    cells = parse_ipynb(bytes(r[media_col]), include_outputs)
                except ValueError:
                    continue
                for c in cells:
                    rows.append({id_col: r[id_col], **c})
            yield pd.DataFrame(rows, columns=[id_col, "cell_index", "cell_type", "text"])

    return df.select(id_col, media_col).mapInPandas(extract, schema)

from lantern_extras_spark.sources.vecs import read_fvecs, read_ivecs, read_bvecs, write_fvecs  # noqa: F401
from lantern_extras_spark.sources.warc import (  # noqa: F401
    index_warc,
    iter_warc_records,
    parse_warc_bytes,
    read_cdx,
    read_cdx_ranges,
    read_paths_manifest,
    read_warc,
    read_warc_ranges,
    read_wet,
    write_warc,
    write_warc_shards,
)
from lantern_extras_spark.sources.sinks import (  # noqa: F401
    export_embeddings_csv,
    json_agg,
    json_object_agg,
    vector_to_pg_text,
    write_corpus_shards,
)
from lantern_extras_spark.sources.webdataset import (  # noqa: F401
    iter_webdataset_samples,
    parse_webdataset_bytes,
    read_webdataset,
    read_webdataset_stream,
    split_wds_key,
    write_webdataset_shard,
)
from lantern_extras_spark.sources.pdftext import parse_pdf_text, pdf_text, read_pdf_text  # noqa: F401
from lantern_extras_spark.sources.epub import parse_epub_text, read_epub  # noqa: F401
from lantern_extras_spark.sources.documents import (  # noqa: F401
    latex_text,
    latex_to_text,
    notebook_cells,
    parse_ipynb,
)
from lantern_extras_spark.sources.documents import docx_text, parse_docx_text  # noqa: F401

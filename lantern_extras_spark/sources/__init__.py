from lantern_extras_spark.sources.vecs import read_fvecs, read_ivecs, read_bvecs, write_fvecs  # noqa: F401

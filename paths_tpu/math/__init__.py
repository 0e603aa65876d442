from paths_tpu.math import vec, ds, colour, matrix  # noqa: F401

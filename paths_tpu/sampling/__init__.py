from paths_tpu.sampling import cmj, hashing  # noqa: F401

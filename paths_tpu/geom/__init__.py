from paths_tpu.geom import sphere, triangle, aabb  # noqa: F401

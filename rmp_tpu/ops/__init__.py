from rmp_tpu.ops import geom, linalg, metrics  # noqa: F401

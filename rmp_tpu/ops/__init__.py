from rmp_tpu.ops import geom  # noqa: F401

from rmp_tpu.utils import render  # noqa: F401

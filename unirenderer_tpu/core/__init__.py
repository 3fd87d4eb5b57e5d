from unirenderer_tpu.core import config  # noqa: F401

from unirenderer_tpu.models.dual_stream import (  # noqa: F401
    AttrDecoder, AttrEncoder, DualStreamModel, ImageUNet, init_dual_stream,
)

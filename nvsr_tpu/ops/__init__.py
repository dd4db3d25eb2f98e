from nvsr_tpu.ops import (  # noqa: F401
    encoding,
    geometry,
    grid_sample,
    rendering,
    resize,
    sampling,
)

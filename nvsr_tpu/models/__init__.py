from nvsr_tpu.models.triplane import (  # noqa: F401
    TriplaneConfig,
    apply_triplane,
    init_decoder_params,
    make_rot_mats,
)
from nvsr_tpu.models.nerf_mlp import (  # noqa: F401
    NeRFMLPConfig,
    apply_nerf_mlp,
    init_nerf_mlp_params,
)
from nvsr_tpu.models.plane_sr import (  # noqa: F401
    PlaneSRConfig,
    apply_plane_sr,
    init_plane_sr_params,
    sr_scale_factor,
)

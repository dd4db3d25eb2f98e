"""nvsr_tpu — TPU-native Neural Volume Super-Resolution framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
princeton-computational-imaging/Neural-Volume-Super-Resolution
(reference surveyed in SURVEY.md): multi-scene triplane NeRFs with shared
decoder MLPs and an EDSR-style feature-plane super-resolution network,
plus a Mip-NeRF / vanilla-NeRF baseline path.

Design (TPU-first, not a port):
  * All hot-path math is pure-functional jnp / Pallas, jitted end-to-end
    (ray generation -> plane gather -> decode -> composite -> resample).
  * Feature planes are explicit pytree state threaded through jitted
    functions, never module attributes.
  * Chunking is `lax.map` over static-shape ray blocks; multi-chip scaling
    is a `jax.sharding.Mesh` over the ray batch with replicated decoder/SR
    params (see nvsr_tpu.parallel).
"""

__version__ = "0.1.0"

# Public API surface (lazy-ish: these imports are lightweight; heavy
# deps like cv2/imageio load only inside the data/eval paths).
from nvsr_tpu.models.triplane import (  # noqa: F401
    TriplaneConfig,
    apply_triplane,
    apply_triplane_rays,
    init_decoder_params,
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
)
from nvsr_tpu.render import (  # noqa: F401
    RayBundle,
    RenderConfig,
    make_ray_bundle,
    make_triplane_point_fn,
    render_image,
    render_rays,
    render_rays_chunked,
)
from nvsr_tpu.planes_store import (  # noqa: F401
    PlaneStore,
    PlanesBuffer,
    ScenePlanes,
    create_scene_planes,
)
from nvsr_tpu.scenes import SceneCoupler, get_scene_id  # noqa: F401
from nvsr_tpu.train import StepFlags, train_step  # noqa: F401
from nvsr_tpu.utils.config import CfgNode, get_config  # noqa: F401

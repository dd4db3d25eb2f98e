from nvsr_tpu.data.dataset import MultiSceneDataset  # noqa: F401
from nvsr_tpu.data.blender import load_blender_data  # noqa: F401
from nvsr_tpu.data.llff import load_llff_data  # noqa: F401

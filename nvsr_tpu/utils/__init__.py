from nvsr_tpu.utils.config import CfgNode, get_config  # noqa: F401

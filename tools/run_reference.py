"""Run the UNMODIFIED reference program (/root/reference/train_nerf.py)
on this machine: applies in-process compatibility shims (newer
numpy/scipy/torch than the reference's 2022 pins, no CUDA, three
missing pip packages stubbed in tools/ref_compat/) and then executes
the reference's own __main__ with the given argv.

Usage:  python tools/run_reference.py --config cfg.yml [...train_nerf args]
(cwd must contain config/local_config.yml, per the reference's
local-root convention, /root/reference/train_nerf.py:50-53.)

The reference source is NOT modified — shims only bridge environment
drift so its original behavior can be observed as a parity golden.
"""

import os
import runpy
import sys

REFERENCE = os.environ.get("NVSR_REFERENCE", "/root/reference")
STUBS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "ref_compat")


def apply_shims():
    # numpy>=1.24 removed np.float (used at reference
    # nerf_helpers.py:454).
    import numpy as np
    if not hasattr(np, "float"):
        np.float = float
    # scipy>=1.13 moved signal.gaussian to signal.windows.gaussian
    # (used at reference imresize.py:4).
    import scipy.signal
    import scipy.signal.windows
    if not hasattr(scipy.signal, "gaussian"):
        scipy.signal.gaussian = scipy.signal.windows.gaussian
    import torch
    # torch>=2.6 defaults weights_only=True; the reference pickles
    # CfgNode/ParameterDict objects in its .par/.ckpt files.
    _load = torch.load

    def load_compat(*args, **kwargs):
        kwargs.setdefault("weights_only", False)
        return _load(*args, **kwargs)

    torch.load = load_compat
    # The reference calls .cuda() on plane tensors unconditionally
    # (models.py:284,601,707); make it a no-op on this CPU-only torch.
    if not torch.cuda.is_available():
        torch.Tensor.cuda = lambda self, *a, **k: self
        torch.nn.Module.cuda = lambda self, *a, **k: self


def main():
    sys.path.insert(0, STUBS)      # torchvision / deepdiff / magic stubs
    sys.path.insert(0, REFERENCE)
    apply_shims()
    sys.argv = ["train_nerf.py"] + sys.argv[1:]
    runpy.run_path(os.path.join(REFERENCE, "train_nerf.py"),
                   run_name="__main__")


if __name__ == "__main__":
    main()

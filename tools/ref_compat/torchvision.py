"""Minimal torchvision stand-in for running the reference on this
machine (torchvision is not installed; the reference only uses
`torchvision.transforms.ToPILImage` in its image-logging path,
/root/reference/nerf_helpers.py:351)."""

import numpy as np
from PIL import Image


class ToPILImage:
    def __call__(self, tensor):
        arr = tensor.detach().cpu().numpy() if hasattr(tensor, "detach") \
            else np.asarray(tensor)
        if arr.ndim == 3:          # CHW -> HWC
            arr = np.transpose(arr, (1, 2, 0))
        if arr.dtype != np.uint8:
            arr = (255 * np.clip(arr, 0, 1)).astype(np.uint8)
        if arr.ndim == 3 and arr.shape[-1] == 1:
            arr = arr[..., 0]
        return Image.fromarray(arr)


class transforms:
    ToPILImage = ToPILImage

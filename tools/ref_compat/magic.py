"""Minimal python-magic stand-in for running the reference on this
machine (libmagic is not installed; the reference only regex-extracts
"W x H" from `magic.from_file(img)`, /root/reference/load_blender.py:281).
Reads the image header with PIL instead."""

from PIL import Image


def from_file(path):
    with Image.open(path) as im:
        w, h = im.size
    return f"image data, {w} x {h}, 8-bit"

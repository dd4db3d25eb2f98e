"""Minimal DeepDiff stand-in for running the reference on this machine
(deepdiff is not installed; the reference uses it only as a config
compatibility gate, /root/reference/train_nerf.py:497-532). Produces
the same top-level keys ('values_changed', 'dictionary_item_added',
'dictionary_item_removed') with deepdiff-style "root['a']['b']" paths
for plain dict/list/scalar trees, which is all the reference compares.
"""


def _walk(a, b, path, out):
    if isinstance(a, dict) and isinstance(b, dict):
        for k in a:
            p = f"{path}[{k!r}]"
            if k not in b:
                out.setdefault("dictionary_item_removed", []).append(p)
            else:
                _walk(a[k], b[k], p, out)
        for k in b:
            if k not in a:
                out.setdefault("dictionary_item_added", []).append(
                    f"{path}[{k!r}]")
        return
    if a != b:
        out.setdefault("values_changed", {})[path] = {
            "new_value": b, "old_value": a}


class DeepDiff(dict):
    def __init__(self, t1, t2, **kwargs):
        super().__init__()
        out = {}
        _walk(t1, t2, "root", out)
        self.update(out)

"""One-time converter: reference .pth annotation pickles -> JSON.

The reference stores annotations as torch-pickled lists of tuples
(resc_refer_dataset.py:110-116, refer_dataset.py). Converting them to JSON
removes the torch dependency from the data path entirely (deployment
images need only numpy + the C++ runtime).

Usage:
  python -m reftr_tpu.tools.convert_annotations data/annotations_resc/unc
  python -m reftr_tpu.tools.convert_annotations data/... --glob '*_train.pth'
"""

from __future__ import annotations

import glob
import json
import os
import sys


def _plain(obj):
    """Recursively convert tensors/ndarrays/tuples to JSON-friendly types."""
    import numpy as np

    if hasattr(obj, "detach"):
        obj = obj.detach().cpu().numpy()
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, (list, tuple)):
        return [_plain(x) for x in obj]
    if isinstance(obj, dict):
        return {str(k): _plain(v) for k, v in obj.items()}
    return obj


def convert_file(pth_path: str, out_path: str | None = None) -> str:
    import torch

    out_path = out_path or (os.path.splitext(pth_path)[0] + ".json")
    records = torch.load(pth_path, map_location="cpu", weights_only=False)
    with open(out_path, "w") as f:
        json.dump(_plain(records), f)
    return out_path


def main(argv):
    root = argv[0] if argv else "."
    pattern = argv[argv.index("--glob") + 1] if "--glob" in argv else "*.pth"
    files = sorted(glob.glob(os.path.join(root, pattern)))
    if not files:
        print(f"no {pattern} files under {root}")
        return 1
    for f in files:
        out = convert_file(f)
        print(f"{f} -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))

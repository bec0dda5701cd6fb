"""Convert JSONL training logs into TensorBoard event files.

Rebuilds /root/reference/tools/vis_log.py:8-31 without torch: writes
scalars for every numeric key in each log line (the reference hardcodes a
handful of keys; emitting all of them is strictly more useful).

Usage: python -m reftr_tpu.tools.vis_log <exp_dir_or_parent>
"""

from __future__ import annotations

import json
import os
import shutil
import sys


def convert_from_log(log_dir: str) -> None:
    import tensorflow as tf

    tb_dir = os.path.join(log_dir, "tb")
    if os.path.exists(tb_dir):
        shutil.rmtree(tb_dir)
    writer = tf.summary.create_file_writer(tb_dir)
    with open(os.path.join(log_dir, "log.txt")) as f, writer.as_default():
        for line in f:
            line = line.strip()
            if not line:
                break
            info = json.loads(line)
            epoch = int(info.get("epoch", 0))
            for k, v in info.items():
                if k == "epoch" or not isinstance(v, (int, float)):
                    continue
                group = "train" if k.startswith("train_") else (
                    "test" if k.startswith("test_") else "misc")
                tf.summary.scalar(f"{group}/{k}", float(v), step=epoch)
    writer.close()


def main(root: str) -> None:
    if os.path.exists(os.path.join(root, "log.txt")):
        convert_from_log(root)
        return
    for x in sorted(os.listdir(root)):
        d = os.path.join(root, x)
        if os.path.isdir(d) and os.path.exists(os.path.join(d, "log.txt")):
            print(f"converting {d}")
            convert_from_log(d)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "./exps")

"""Metric logging: TensorBoard (tensorboardX) + CSV fallback, image panels.

Matches the reference's observability surface (SURVEY.md §5.5): scalar
curves (loss, PSNR, depth abs_err/acc@thresholds), TB image panels, and PNG
panel dumps.
"""

from __future__ import annotations

import csv
import os


class MetricLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter
                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None
        self._csv_path = os.path.join(log_dir, "metrics.csv")
        self._csv_keys = ["step"]
        self._rows = []

    def log_scalars(self, step: int, scalars: dict):
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)
        row = {"step": step, **{k: float(v) for k, v in scalars.items()}}
        self._rows.append(row)
        new_keys = [k for k in row if k not in self._csv_keys]
        if new_keys:
            # key set grew: rewrite with the union header
            self._csv_keys += new_keys
            with open(self._csv_path, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=self._csv_keys)
                w.writeheader()
                w.writerows(self._rows)
        else:
            write_header = not os.path.exists(self._csv_path)
            with open(self._csv_path, "a", newline="") as f:
                w = csv.DictWriter(f, fieldnames=self._csv_keys)
                if write_header:
                    w.writeheader()
                w.writerow(row)

    def log_image(self, step: int, tag: str, image):
        """image: (H, W, 3) float [0,1]."""
        import numpy as np
        img = np.clip(np.asarray(image), 0, 1)
        if self._tb is not None:
            self._tb.add_image(tag, img.transpose(2, 0, 1), step)

    def save_panel(self, step: int, name: str, image):
        """PNG panel dump (reference train_mvs_nerf_pl.py:247-250)."""
        import imageio.v2 as imageio
        import numpy as np
        path = os.path.join(self.log_dir, f"{name}_{step:08d}.png")
        imageio.imwrite(path,
                        (np.clip(np.asarray(image), 0, 1) * 255)
                        .astype("uint8"))
        return path

    def flush(self):
        if self._tb is not None:
            self._tb.flush()

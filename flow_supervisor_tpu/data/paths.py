"""Dataset root paths (reference ``data/path.py`` + ``pytorch/wb_data/path.py``),
overridable via the FST_DATA_ROOT environment variable."""
from __future__ import annotations

import os

DATA_ROOT = os.environ.get("FST_DATA_ROOT", "datasets")

FLYING_CHAIRS = os.path.join(DATA_ROOT, "FlyingChairs/FlyingChairs_release/data")
FLYING_CHAIRS_SPLIT = os.path.join(DATA_ROOT, "FlyingChairs/FlyingChairs_train_val.txt")
FLYING_THINGS = os.path.join(DATA_ROOT, "FlyingThings")
KITTI = os.path.join(DATA_ROOT, "KITTI")
SINTEL = os.path.join(DATA_ROOT, "Sintel")
SPRING = os.path.join(DATA_ROOT, "spring")
HD1K = os.path.join(DATA_ROOT, "HD1K")
DAVIS = os.path.join(DATA_ROOT, "DAVIS")

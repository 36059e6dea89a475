"""Data layer: host-side numpy loaders for the four dataset families.

Datasets are loaded once into host RAM (and then moved wholesale into
device HBM by the train loop — the load-once design the reference uses in
get_all_init, e.g. dtu.py:160-162, is the right one for TPU too: no
per-step host I/O).
"""

from color_neus_tpu.data.base import BaseDataset, create_dataset
from color_neus_tpu.data import dtu, bmvs, iho_video, omniobject3d, synthetic  # noqa: F401 (registration)

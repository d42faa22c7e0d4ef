"""Dataset registry (reference data/__init__.py:1-8)."""

from .dtu import MVSDatasetDTU, load_dtu_pairs, load_scan_list
from .dtu_ft import DTUFTDataset
from .blender import BlenderDataset
from .llff import LLFFDataset
from .pairs import load_pairs, get_split, generate_pairs

dataset_dict = {
    "dtu": MVSDatasetDTU,
    "llff": LLFFDataset,
    "blender": BlenderDataset,
    "dtu_ft": DTUFTDataset,
}

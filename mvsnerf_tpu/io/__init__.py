from .torch_ckpt import load_reference_checkpoint
from .checkpoint import save_checkpoint, load_checkpoint, latest_checkpoint

from .common import RayBatchIterator, unpreprocess_images
from .finetune import FinetuneSystem
from .generalizable import GeneralizableSystem
from .fusion import FusionFinetuneSystem

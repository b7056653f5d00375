"""Model zoo: all seven reference architectures, TPU-native (flax.linen).

| name                  | reference definition                               |
|-----------------------|----------------------------------------------------|
| RNASeqSurvivalModel   | train_rnaseq_only.py:126-151                       |
| ImageOnlyModel        | generate_km_curves.py:28-54                        |
| SimpleFusionModel     | simple_fusion.py:160-236                           |
| FlexibleMultimodalModel | flexible_multimodal.py:157-256                   |
| MultiModalSurvivalNet | final_multimodal.py:59-150                         |
| PartialModalityNet    | partial_modality_training.py:165-277               |
| SimMLMSurvivalNet     | generate_km_curves.py:160-281                      |
| MMsurvNet             | no reference code; metadata-only (results/mmsurv)  |
"""

from .rnaseq import RNASeqSurvivalModel  # noqa: F401
from .densenet3d import DenseNet121_3D  # noqa: F401
from .image_only import ImageOnlyModel  # noqa: F401
from .fusion import (  # noqa: F401
    SimpleFusionModel,
    FlexibleMultimodalModel,
    MultiModalSurvivalNet,
)
from .gated import PartialModalityNet  # noqa: F401
from .moe import SimMLMSurvivalNet  # noqa: F401
from .mmsurv import MMsurvNet  # noqa: F401

"""yogo_tpu: YOGO rebuilt as a TPU-native JAX/XLA framework.

Same capabilities and CLI surface as the reference (czbiohub-sf/yogo),
re-designed TPU-first: jitted flax conv stacks, fused on-device decode /
NMS / counting, shard_map-style data parallelism over a device Mesh, and a
host-side async input pipeline.
"""

__version__ = "0.1.0"

from yogo_tpu.models.yogo import YOGO  # noqa: F401
from yogo_tpu.models.defns import MODELS, get_model_defn  # noqa: F401

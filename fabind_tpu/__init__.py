"""fabind_tpu: TPU-native FABind/FABind+ docking framework (JAX/XLA/Pallas)."""

from fabind_tpu.config import FABindConfig, ModelConfig, ShapeConfig, TrainConfig, preset

__version__ = "0.2.0"
